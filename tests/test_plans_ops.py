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

def test_corr_matrix_plan_is_single_pass_no_shuffle_of_rows(spark):
    from ultragendataset_datachecker_spark.ops.profile import correlation_matrix

    df = spark.range(1000).select(
        (F.col("id") * 1.0).alias("a"),
        (F.col("id") * 2.0).alias("b"),
        (F.col("id") % 7 * 1.0).alias("c"),
    )
    plan = _plan(correlation_matrix(df, ["a", "b", "c"]))
    # one partial + one final aggregate; the only exchange is the
    # O(1)-row single-partition merge of the partials
    assert plan.count("HashAggregate") == 2
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan


def test_funcdep_plan_is_single_aggregation(spark):
    from ultragendataset_datachecker_spark.ops.profile import functional_dependencies

    df = spark.range(1000).select(
        F.col("id").alias("a"), (F.col("id") % 10).alias("b")
    )
    plan = _plan(functional_dependencies(df, ["a", "b"]))
    # count_distincts expand + aggregate, but never a per-pair job or join
    assert "Join" not in plan


def test_sliding_chunks_plan_has_zero_exchanges(spark):
    from ultragendataset_datachecker_spark.ops.packing import sliding_chunks

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.sequence(F.lit(1), (F.pmod(F.col("id"), F.lit(50)) + 1).cast("int")).alias("tokens"),
    )
    plan = _plan(sliding_chunks(df, "tokens", size=8, stride=6))
    # pure per-row codegen: explode + project, no shuffle anywhere
    assert "Exchange" not in plan
    assert "Generate" in plan  # the posexplode


def test_group_covariance_pair_plan_is_one_aggregation_over_one_scan(spark):
    from ultragendataset_datachecker_spark.ops.similarity import group_covariance

    df = spark.range(500).select(
        (F.col("id") % 3).alias("label"),
        F.array(*[(F.col("id") * (i + 1)).cast("float") for i in range(4)]).alias("embedding"),
    )
    plan = _plan(group_covariance(df, dims=[0, 1, 2], group_col="label"))
    # groupBy(label) agg: partial + final, exactly one exchange on the
    # group key — element_at projections stay inside the scan stage
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_bucketed_join_has_zero_exchanges(spark):
    from ultragendataset_datachecker_spark.io import save_bucketed

    left = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    right = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("attr")
    )
    save_bucketed(left, "bk_left", ["k"], num_buckets=8, sort_cols=["k"])
    save_bucketed(right, "bk_right", ["k"], num_buckets=8, sort_cols=["k"])
    # defeat broadcast: the point is the large-x-large shape, where only the
    # bucket layout can remove the exchange
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bk_left").join(spark.table("bk_right"), "k")
        plan = _plan(j)
        assert "Exchange" not in plan  # co-located by construction
        assert "Bucketed: true" in plan
        assert j.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")
