"""Event-time windowed aggregation — batch and Structured Streaming forms.

The reference checker is batch-only (pandas over a loaded frame); a
continuously-landing corpus needs the same per-window health metrics the
batch engine computes, incrementally. This module gives the canonical
Spark shape for that:

  batch:     groupBy(window(ts, size), keys).agg(...)       — one shuffle,
             partial-aggregated map-side; window() is a plain expression so
             Catalyst treats it like any other group key
  streaming: withWatermark(ts, late) -> identical agg        — bounded state
             (windows older than the watermark are finalized and evicted),
             append mode emits each window exactly once

The SAME aggregation expressions are shared between both forms, so the
streaming test can assert row-for-row parity with the batch plan on the
same input — the Structured Streaming guarantee this module leans on.
(streaming.streaming_quality_metrics is the engine-metrics flavor of the
same shape; this module is the generic, oracle-replayable one, and its
tests pin the APPEND-mode contract — finalized windows emitted exactly
once — where the metrics test runs in complete mode.)

Tumbling hour/minute windows align to the epoch in both Spark (session tz
is pinned to UTC in session.get_spark) and DuckDB (`date_trunc`), which is
what makes the batch form oracle-replayable.

Scale notes: the shuffle carries (window, key) partial aggregates, not raw
rows; state size in streaming is O(open windows × keys), bounded by the
watermark horizon. Skewed keys behave like any aggregation skew (AQE
handles the batch side; streaming state is per-key and small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DURATION_US = {
    "second": 1_000_000,
    "seconds": 1_000_000,
    "minute": 60_000_000,
    "minutes": 60_000_000,
    "hour": 3_600_000_000,
    "hours": 3_600_000_000,
}


def _duration_us(spec: str) -> int:
    """Parse a Spark-style duration string ('30 minutes') to microseconds."""
    n, _, unit = spec.strip().partition(" ")
    try:
        return int(n) * _DURATION_US[unit.strip()]
    except (KeyError, ValueError):
        raise ValueError(f"unsupported duration spec: {spec!r}") from None


def _window_aggs() -> list:
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    ]


def windowed_stats(
    df: DataFrame,
    ts_col: str = "ts",
    size: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
    exact_users: bool = False,
) -> DataFrame:
    """Per-(tumbling window, keys) event statistics over a batch frame.

    ``exact_users`` swaps the HyperLogLog user count for an exact
    count_distinct — used by the oracle query (HLL estimates are
    engine-specific); the default approx form is the at-scale path
    (mergeable sketch, no extra shuffle).
    """
    aggs = _window_aggs()
    if exact_users:
        aggs[3] = F.count_distinct(F.col("user_id")).alias("n_users")
    return (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.window(ts_col, size).alias("w"), *keys)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            *[c for c in ("n_events", "sum_value", "avg_value")],
            F.col("n_users" if exact_users else "approx_users"),
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Assign a per-user session sequence number to every event.

    Gaps-and-islands: within each user (one exchange on ``user_col``), an
    event opens a new session iff it arrives strictly more than ``gap``
    after the previous event — the same boundary rule as Spark's
    ``session_window``, which spans ``[ts, ts+gap]`` with an INCLUSIVE end
    (probed empirically: an event at exactly ``prev + gap`` merges;
    test_session_boundary_exact_gap pins it). ``order_cols`` breaks
    timestamp ties deterministically so the running sum is reproducible at
    any parallelism.

    Output = input columns + ``session_seq`` (1-based per user, in event-time
    order). Rows with NULL user or timestamp are excluded (no session
    identity). This exact recurrence is what makes the op oracle-replayable:
    lag + cumulative sum is ANSI SQL, unlike the session_window agg.

    Scale: one hash exchange on the user key + an in-partition sort; the
    running sum is a streaming frame (no buffering beyond the sort). Hot
    users are real skew here — at 10^12 events, pre-filter bot-grade users
    or bound sessions with :func:`session_stats`'s agg method, where partial
    merging keeps map-side state small.
    """
    src = df.where(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(user_col).orderBy(*order)
    us = _micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    new_s = F.when(prev.isNull() | (us - prev > F.lit(_duration_us(gap))), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return src.withColumn("session_seq", F.sum(new_s).over(run))


def _micros(col):
    # parquet event times are TIMESTAMP_NTZ; unix_micros wants TIMESTAMP, and
    # the session tz is pinned to UTC so the cast is value-preserving
    return F.unix_micros(col.cast("timestamp"))


def _session_aggs(ts_col: str) -> list:
    return [
        F.count(F.lit(1)).alias("n_events"),
        (_micros(F.max(ts_col)) - _micros(F.min(ts_col))).alias("duration_us"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    ]


def session_stats(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    method: str = "agg",
) -> DataFrame:
    """Per-(user, session) rollup: start/end, event count, duration, value sum.

    Two equivalent physical strategies (tested identical):

    - ``method='agg'`` (default, the scale path): ``groupBy(user,
      session_window(ts, gap))`` — Spark's native session aggregation.
      Partial sessions merge map-side, so the exchange carries per-session
      partials, not raw events.
    - ``method='window'`` (the oracle-replayable path): :func:`sessionize`
      then ``groupBy(user, session_seq)`` — pure ANSI constructs an external
      engine can replay bit-for-bit.

    Both emit ``session_seq`` (1-based per user in start order) so outputs
    are directly comparable.
    """
    if method == "window":
        s = sessionize(df, ts_col=ts_col, user_col=user_col, gap=gap)
        out = s.groupBy(user_col, "session_seq").agg(
            F.min(ts_col).alias("session_start"), *_session_aggs(ts_col)
        )
    elif method == "agg":
        out = (
            df.where(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
            .groupBy(user_col, F.session_window(ts_col, gap).alias("sw"))
            .agg(*_session_aggs(ts_col))
            .select(
                user_col,
                F.col("sw.start").alias("session_start"),
                "n_events",
                "duration_us",
                "sum_value",
            )
            .withColumn(
                "session_seq",
                F.row_number().over(
                    Window.partitionBy(user_col).orderBy(F.col("session_start").asc())
                ),
            )
        )
    else:
        raise ValueError(f"unknown method: {method!r}")
    return out.select(
        user_col, "session_seq", "session_start", "n_events", "duration_us", "sum_value"
    )


def streaming_session_stats(
    stream_df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    late: str = "30 minutes",
) -> DataFrame:
    """Streaming sessionization: watermarked ``session_window`` aggregation.

    Append mode — a session's row is emitted exactly once, when the
    watermark passes its close (last event + gap). State is O(open sessions)
    and evicted at the watermark, the Structured Streaming contract for
    session windows. ``session_seq`` is omitted: a global per-user ordinal
    is unknowable incrementally (an earlier-closing session may still
    arrive); downstream joins key on (user, session_start) instead.
    """
    return (
        stream_df.where(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .withWatermark(ts_col, late)
        .groupBy(user_col, F.session_window(ts_col, gap).alias("sw"))
        .agg(*_session_aggs(ts_col))
        .select(
            user_col,
            F.col("sw.start").alias("session_start"),
            "n_events",
            "duration_us",
            "sum_value",
        )
    )


def streaming_windowed_stats(
    stream_df: DataFrame,
    ts_col: str = "ts",
    size: str = "1 hour",
    late: str = "30 minutes",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Streaming form of :func:`windowed_stats`: identical aggregation over a
    watermarked stream. Append-mode semantics — a window's row is emitted
    once, when the watermark passes ``window_end + late``; rows later than
    the watermark are dropped (the documented late-data contract).
    """
    return (
        stream_df.where(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, late)
        .groupBy(F.window(ts_col, size).alias("w"), *keys)
        .agg(*_window_aggs())
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
            "avg_value",
            "approx_users",
        )
    )
