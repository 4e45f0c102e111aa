"""Sequence-packing tests: chunk and greedy strategies vs python references,
budget invariants, and partitioning invariance."""

import hashlib

import pyspark.sql.functions as F
import pytest

from ultragendataset_datachecker_spark.ops.packing import pack_documents


def _ref_order(rows):
    return sorted(rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]))


def _ref_chunk(rows, budget):
    out, before = {}, 0
    for did, sz in _ref_order(rows):
        out[did] = (before // budget, before % budget)
        before += sz
    return out


def _ref_greedy(rows, budget):
    out, pack, fill = {}, 0, 0
    for did, sz in _ref_order(rows):
        if fill > 0 and fill + sz > budget:
            pack, fill = pack + 1, 0
        out[did] = (pack, fill)
        fill += sz
    return out


@pytest.fixture(scope="module")
def sizes_df(spark):
    import random

    rng = random.Random(3)
    rows = [(i, rng.randrange(10, 900)) for i in range(200)]
    return rows, spark.createDataFrame(rows, "doc_id long, sz long")


@pytest.mark.parametrize("strategy,ref", [("chunk", _ref_chunk), ("greedy", _ref_greedy)])
def test_packing_matches_python_reference(sizes_df, strategy, ref):
    rows, df = sizes_df
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_documents(df, "sz", 1000, num_buckets=1, strategy=strategy).collect()
    }
    assert got == ref(rows, 1000)


def test_greedy_packs_respect_budget(sizes_df):
    rows, df = sizes_df
    out = pack_documents(df, "sz", 1000, num_buckets=4, strategy="greedy")
    per_pack = (
        out.groupBy("bucket", "pack_id").agg(F.sum("sz").alias("tot"), F.count("*").alias("n"))
    ).collect()
    # every multi-doc pack fits the budget; only single oversized docs may exceed
    assert all(r["tot"] <= 1000 or r["n"] == 1 for r in per_pack)


def test_packing_partitioning_invariance(sizes_df):
    rows, df = sizes_df
    a = sorted(map(tuple, pack_documents(df, "sz", 500, num_buckets=4).collect()))
    b = sorted(map(tuple, pack_documents(df.repartition(11), "sz", 500, num_buckets=4).collect()))
    assert a == b


def test_packing_oversized_doc_gets_own_pack(spark):
    df = spark.createDataFrame(
        [(1, 50), (2, 5000), (3, 60)], "doc_id long, sz long"
    )
    out = {
        r["doc_id"]: r["pack_id"]
        for r in pack_documents(df, "sz", 100, num_buckets=1, strategy="greedy").collect()
    }
    # doc 2 (5000 > budget) sits alone in its own pack
    packs = {}
    for did, p in out.items():
        packs.setdefault(p, []).append(did)
    assert [2] in packs.values()


def test_packing_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, 10)], "doc_id long, sz long")
    with pytest.raises(ValueError):
        pack_documents(df, "sz", 0)
    with pytest.raises(ValueError):
        pack_documents(df, "sz", 10, strategy="nope")


def test_packing_excludes_null_sizes(spark):
    df = spark.createDataFrame(
        [(1, 50), (2, None), (3, 60)], "doc_id long, sz long"
    )
    out = pack_documents(df, "sz", 100, num_buckets=1, strategy="greedy").collect()
    assert sorted(r["doc_id"] for r in out) == [1, 3]
