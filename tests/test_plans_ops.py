"""Physical-plan assertions for the round-3 operators: the shapes PLANS.md
claims are locked in here so a regression to a worse plan fails CI, not a
benchmark. (tests/test_resume.py has the same style of assertion for
partition pruning.)"""

import datetime

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def events(spark):
    base = datetime.datetime(2026, 7, 1)
    rows = [
        (i, i % 5, base + datetime.timedelta(minutes=i), ["view", "click"][i % 2], float(i))
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


def test_asof_join_plan_has_no_join_operator(events):
    from ultragendataset_datachecker_spark.ops.asof import asof_join

    left = events.where(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    right = events.where(F.col("event_type") == "click").select("user_id", "ts", "value")
    plan = _plan(asof_join(left, right))
    assert "Join" not in plan  # union+window, never a join
    assert "Window" in plan and "Union" in plan
    # exactly one exchange: the window's key partitioning
    assert plan.count("Exchange hashpartitioning") == 1


def test_interval_join_plan_is_hash_join_not_nested_loop(events):
    from ultragendataset_datachecker_spark.ops.intervals import point_in_interval_join

    pts = events.select("user_id", "ts", F.col("event_id").alias("point_id"))
    ivs = events.select(
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end"),
        F.col("event_id").alias("iv_id"),
    )
    plan = _plan(point_in_interval_join(pts, ivs))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # the range predicate became an equi-join (hash or sort-merge) keyed on
    # (bucket, user_id) with the BETWEEN as a residual condition
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_repeated_spans_candidate_set_broadcasts(spark, tmp_path):
    from ultragendataset_datachecker_spark.ops.spans import repeated_spans

    # a FILE source so the planner has size stats (in-memory relations plan
    # SortMergeJoin statically and rely on AQE) — same shape the driver
    # query gets from the parquet testdata
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, list(range(i % 3, i % 3 + 12))) for i in range(40)],
        "doc_id long, tokens array<long>",
    ).write.parquet(path)
    plan = _plan(repeated_spans(spark.read.parquet(path), k=4))
    # corpus occurrences must not shuffle for the match: the dup-hash set is
    # the build side of a broadcast join over the kernel output
    assert "BroadcastHashJoin" in plan
    assert "MapInPandas" in plan


def test_session_stats_agg_single_user_exchange(events):
    from ultragendataset_datachecker_spark.ops.windows import session_stats

    plan = _plan(session_stats(events, method="agg"))
    # session_window agg: exchanges only on the user key (partial-session
    # merge map-side), plus no join anywhere
    assert "Join" not in plan
    assert "sessionwindow" in plan.lower() or "session_window" in plan