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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
