"""ops/errors.py — error-message clustering (reference app.py:1262-1307)."""

from ultragendataset_datachecker_spark.ops.errors import (
    cluster_error_messages,
    error_cluster_summary,
)


ROWS = [
    # cluster A: "connection timeout ..." family (Jaccard of keyword sets > 0.3)
    (1, "connection timeout while reading shard alpha", "io_error"),
    (2, "connection timeout while reading shard beta", "io_error"),
    (3, "connection timeout while writing shard alpha", "io_error"),
    # cluster B: schema mismatch family
    (4, "schema mismatch expected int32 found int64", "schema_error"),
    (5, "schema mismatch expected utf8 found int64", "schema_error"),
    # singleton: shares no 4+-char keyword set strongly with others
    (6, "disk full", "io_error"),
    # empty keyword set (all words shorter than 4 chars) -> singleton
    (7, "a b c", "misc"),
]


def _clusters(spark, **kw):
    df = spark.createDataFrame(ROWS, ["err_id", "message", "error_type"])
    out = cluster_error_messages(df, "err_id", "message", **kw)
    return {r["err_id"]: r["cluster_id"] for r in out.collect()}


def test_cluster_families_and_singletons(spark):
    c = _clusters(spark)
    assert len(c) == 7
    # families co-cluster, keyed by min id (reference: Jaccard > 0.3)
    assert c[1] == c[2] == c[3] == 1
    assert c[4] == c[5] == 4
    # families do not merge
    assert c[1] != c[4]
    # singletons keep their own id (reference seeds a new cluster)
    assert c[6] == 6
    assert c[7] == 7


def test_threshold_is_strict(spark):
    # keyword sets {aaaa,bbbb} vs {aaaa,cccc}: Jaccard = 1/3; strictly > 1/3
    # must NOT link (reference app.py:1281 uses >)
    import pyspark.sql.functions as F  # noqa: F401

    df = spark.createDataFrame(
        [(1, "aaaa bbbb"), (2, "aaaa cccc")], ["err_id", "message"]
    )
    out = cluster_error_messages(df, "err_id", "message", threshold=1 / 3)
    got = {r["err_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {1: 1, 2: 2}
    out2 = cluster_error_messages(df, "err_id", "message", threshold=0.32)
    got2 = {r["err_id"]: r["cluster_id"] for r in out2.collect()}
    assert got2 == {1: 1, 2: 1}


def test_max_word_freq_bounds_candidates(spark):
    # one ubiquitous keyword across 40 messages + one real pair; cap=2
    # removes the hot word (df=40) from the index while the real pair's
    # shared words (df=2) survive, so only the real pair links
    rows = [(i, f"ubiquitous filler{i} pad{i}") for i in range(10, 50)]
    rows += [(1, "exact same wording here"), (2, "exact same wording here")]
    df = spark.createDataFrame(rows, ["err_id", "message"])
    out = cluster_error_messages(df, "err_id", "message", max_word_freq=2)
    got = {r["err_id"]: r["cluster_id"] for r in out.collect()}
    assert got[1] == got[2] == 1
    assert all(got[i] == i for i in range(10, 50))


def test_summary_counts_and_example(spark):
    df = spark.createDataFrame(ROWS, ["err_id", "message", "error_type"])
    out = error_cluster_summary(df, "err_id", "message", type_col="error_type")
    rows = out.collect()
    # ranked by descending size
    assert [r["n_messages"] for r in rows] == sorted(
        [r["n_messages"] for r in rows], reverse=True
    )
    top = rows[0]
    assert top["cluster_id"] == 1 and top["n_messages"] == 3
    assert top["example"].startswith("connection timeout while reading shard alpha")
    assert top["n_types"] == 1


def test_summary_weighted_by_count(spark):
    # pre-collapsed distinct messages carrying occurrence counts
    df = spark.createDataFrame(
        [(1, "connection timeout reading alpha", 100),
         (2, "connection timeout reading beta", 50),
         (3, "disk full", 7)],
        ["err_id", "message", "n_seen"],
    )
    out = error_cluster_summary(df, "err_id", "message", count_col="n_seen")
    got = {r["cluster_id"]: r["n_messages"] for r in out.collect()}
    assert got == {1: 150, 3: 7}
