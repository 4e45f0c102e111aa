"""Temperature-mixture sampling (ops/sampling.py) and event-time windowed
aggregation (ops/windows.py): target math, determinism, prefilter parity,
batch/streaming parity, and the append-mode finalized-window contract."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.ops.sampling import temperature_mixture
from ultragendataset_datachecker_spark.ops.windows import (
    session_stats,
    sessionize,
    streaming_session_stats,
    streaming_windowed_stats,
    windowed_stats,
)


def _rows(df):
    return sorted(map(tuple, df.select("source", "doc_id", "sample_rank").collect()))


@pytest.fixture(scope="module")
def mix_df(spark):
    # strata sizes 400 / 100 / 16 -> isqrt weights 20 / 10 / 4
    rows = (
        [(i, "big") for i in range(400)]
        + [(1000 + i, "mid") for i in range(100)]
        + [(2000 + i, "small") for i in range(16)]
    )
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_temperature_mixture_integer_targets(mix_df):
    # a = (20, 10, 4), sum 34; n_target=68 -> targets 40 / 20 / 8 exactly
    out = temperature_mixture(mix_df, "source", n_target=68, alpha=0.5)
    per = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per == {"big": 40, "mid": 20, "small": 8}
    # alpha flattens: natural share of 'big' is 400/516 = 0.78, sampled 40/68 = 0.59
    # and every stratum's ranks are the contiguous prefix 1..t_s
    ranks = {}
    for s, _, r in _rows(out):
        ranks.setdefault(s, []).append(r)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in ranks.values())


def test_temperature_mixture_caps_at_stratum_size(mix_df):
    # n_target far above the corpus: every stratum capped at its own size
    out = temperature_mixture(mix_df, "source", n_target=10_000, alpha=0.5)
    per = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per == {"big": 400, "mid": 100, "small": 16}


def test_temperature_mixture_alpha1_is_proportional(mix_df):
    out = temperature_mixture(mix_df, "source", n_target=129, alpha=1.0)
    per = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # floor(129 * c/516) per stratum
    assert per == {"big": 129 * 400 // 516, "mid": 129 * 100 // 516, "small": 129 * 16 // 516}


def test_temperature_mixture_deterministic_and_prefilter_parity(mix_df):
    exact = _rows(temperature_mixture(mix_df, "source", 68))
    again = _rows(temperature_mixture(mix_df.repartition(13), "source", 68))
    fast = _rows(temperature_mixture(mix_df, "source", 68, scale_prefilter=True))
    assert exact == again == fast


def test_temperature_mixture_float_alpha(mix_df):
    out = temperature_mixture(mix_df, "source", n_target=60, alpha=0.3)
    per = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    a = {s: c ** 0.3 for s, c in [("big", 400), ("mid", 100), ("small", 16)]}
    tot = sum(a.values())
    assert per == {s: min(c, math.floor(60 * a[s] / tot)) for s, c in [("big", 400), ("mid", 100), ("small", 16)]}


# ---------------------------------------------------------------------------
# windowed stats
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def event_rows():
    base = datetime.datetime(2026, 3, 1)
    rows = []
    for i in range(120):
        rows.append(
            (
                base + datetime.timedelta(minutes=13 * i),
                ["click", "view"][i % 2],
                float(i) if i % 7 else None,
                i % 11,
            )
        )
    return rows


def test_windowed_stats_batch(spark, event_rows):
    df = spark.createDataFrame(event_rows, "ts timestamp, event_type string, value double, user_id long")
    out = windowed_stats(df, size="1 hour", exact_users=True)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["n_users"])
        for r in out.collect()
    }
    exp = {}
    for ts, et, v, u in event_rows:
        key = (ts.replace(minute=0, second=0), et)
        n, users = exp.get(key, (0, set()))
        users = set(users) | {u}
        exp[key] = (n + 1, users)
    assert got == {k: (n, len(u)) for k, (n, u) in exp.items()}


def test_streaming_windowed_append_emits_only_finalized_windows(spark, tmp_path, event_rows):
    """Append mode + watermark: after one availableNow run, emitted windows
    are exactly those closed by the final watermark (max ts - late), each
    exactly once, with values equal to the batch plan's."""
    inp = str(tmp_path / "ev")
    df = spark.createDataFrame(event_rows, "ts timestamp, event_type string, value double, user_id long")
    df.coalesce(2).write.parquet(inp)

    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double, user_id long"
    ).parquet(inp)
    agg = streaming_windowed_stats(stream, size="1 hour", late="30 minutes")
    q = (
        agg.writeStream.format("memory").queryName("sws")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from sws").collect()
    }
    assert len(got) == len(spark.sql("select * from sws").collect())  # no dup emission

    max_ts = max(r[0] for r in event_rows)
    watermark = max_ts - datetime.timedelta(minutes=30)
    batch = windowed_stats(df, size="1 hour")
    exp = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
        if r["window_start"] + datetime.timedelta(hours=1) <= watermark
    }
    assert got == exp and 0 < len(exp)
    # the open (last) windows were withheld, not dropped-and-forgotten
    assert len(exp) < batch.count()

# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------

def _sess(df, **kw):
    return sorted(
        map(tuple, session_stats(df, **kw).select(
            "user_id", "session_seq", "session_start", "n_events", "duration_us", "sum_value"
        ).collect())
    )


@pytest.fixture(scope="module")
def session_df(spark):
    base = datetime.datetime(2026, 4, 1)
    rows = []
    eid = 0
    for u in range(7):
        t = base + datetime.timedelta(minutes=u)
        for i in range(40):
            # gaps cycle through 5m / 20m / 45m / 90m -> the 45/90 gaps split
            t = t + datetime.timedelta(minutes=[5, 20, 45, 90][(u + i) % 4])
            rows.append((eid, u, t, float(i % 9)))
            eid += 1
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")


def test_session_methods_agree(session_df):
    assert _sess(session_df, method="agg") == _sess(session_df, method="window")


def test_session_partitioning_invariance(session_df):
    assert _sess(session_df, method="window") == _sess(
        session_df.repartition(17), method="window"
    )


def test_session_boundary_exact_gap(spark):
    """An event at exactly prev + gap MERGES (session_window's inclusive end);
    one microsecond later it opens a new session — in BOTH methods."""
    base = datetime.datetime(2026, 4, 1)
    rows = [
        (1, 9, base, 1.0),
        (2, 9, base + datetime.timedelta(minutes=30), 1.0),                      # == gap: merge
        (3, 9, base + datetime.timedelta(minutes=60, microseconds=1), 1.0),      # gap+1us: split
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    for m in ("agg", "window"):
        got = [
            (r["session_seq"], r["n_events"])
            for r in session_stats(df, method=m).orderBy("session_seq").collect()
        ]
        assert got == [(1, 2), (2, 1)], m


def test_sessionize_null_rows_excluded(spark):
    base = datetime.datetime(2026, 4, 1)
    rows = [(1, 1, base, 1.0), (2, None, base, 1.0), (3, 1, None, 1.0)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    out = sessionize(df)
    assert [r["event_id"] for r in out.collect()] == [1]


def test_streaming_session_stats_parity(spark, tmp_path, session_df):
    """Append-mode streaming sessions equal the batch agg for every session
    closed by the final watermark, each emitted exactly once."""
    inp = str(tmp_path / "sess")
    session_df.coalesce(2).write.parquet(inp)
    stream = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp, value double"
    ).parquet(inp)
    agg = streaming_session_stats(stream, gap="30 minutes", late="1 hour")
    q = (
        agg.writeStream.format("memory").queryName("ssess")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = sorted(
        (r["user_id"], r["session_start"], r["n_events"], r["duration_us"], r["sum_value"])
        for r in spark.sql("select * from ssess").collect()
    )
    assert len(got) == len(set(got))  # exactly-once
    max_ts = session_df.agg(F.max("ts")).first()[0]
    watermark = max_ts - datetime.timedelta(hours=1)
    batch = session_stats(session_df, gap="30 minutes", method="agg")
    exp = sorted(
        (r["user_id"], r["session_start"], r["n_events"], r["duration_us"], r["sum_value"])
        for r in batch.collect()
        # a session closes when its last event + gap passes the watermark
        if r["session_start"] + datetime.timedelta(microseconds=r["duration_us"])
        + datetime.timedelta(minutes=30) <= watermark
    )
    assert got == exp and 0 < len(exp) < batch.count()
