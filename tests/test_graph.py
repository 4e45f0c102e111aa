"""Connected-components / duplicate-cluster resolution tests."""

import pyspark.sql.functions as F
import pytest

from ultragendataset_datachecker_spark.ops.graph import (
    connected_components,
    duplicate_clusters,
    keep_one_per_cluster,
)


def _cc(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    return {r["vertex"]: r["component"] for r in connected_components(edges, **kw).collect()}


def test_cc_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (5, 6)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_cc_chain_diameter(spark):
    # path graph 0-1-2-...-9: min label must travel the full diameter
    got = _cc(spark, [(i, i + 1) for i in range(9)])
    assert got == {i: 0 for i in range(10)}


def test_cc_self_loop_and_duplicate_edges(spark):
    got = _cc(spark, [(4, 4), (1, 2), (2, 1), (1, 2)])
    assert got == {4: 4, 1: 1, 2: 1}


def test_cc_partitioning_invariance(spark):
    pairs = [(i, i + 1) for i in range(0, 40, 2)] + [(i, i + 2) for i in range(0, 20, 4)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    a = sorted(map(tuple, connected_components(edges).collect()))
    b = sorted(map(tuple, connected_components(edges.repartition(7)).collect()))
    assert a == b


def test_cc_max_iter_raises(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(9)], "src long, dst long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=2)


def test_keep_one_per_cluster(spark):
    df = spark.range(1, 7).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    kept = sorted(r["doc_id"] for r in keep_one_per_cluster(df, pairs).collect())
    assert kept == [1, 4, 5]


def test_duplicate_clusters_representative_is_min(spark):
    pairs = spark.createDataFrame([(9, 3), (3, 7)], "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert got == {3: 3, 7: 3, 9: 3}


def _union_find_components(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to roots, then map each vertex to the min id of its root set
    comp = {}
    for v in list(parent):
        comp.setdefault(find(v), []).append(v)
    return {v: min(members) for members in comp.values() for v in members}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_matches_union_find_on_random_graphs(spark, seed):
    import random

    rng = random.Random(seed)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {r["vertex"]: r["component"] for r in connected_components(edges).collect()}
    assert got == _union_find_components(pairs)


def test_keep_best_per_cluster(spark):
    from ultragendataset_datachecker_spark.ops.graph import keep_best_per_cluster

    df = spark.createDataFrame(
        [(1, 10.0), (2, 30.0), (3, 20.0), (4, 5.0), (5, None), (9, 1.0)],
        "doc_id long, quality double",
    )
    # cluster {1,2,3}: keep 2 (highest quality); cluster {4,5}: keep 4
    # (non-null beats NULL); 9 never paired -> passes through
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    kept = sorted(r["doc_id"] for r in keep_best_per_cluster(df, pairs, "quality").collect())
    assert kept == [2, 4, 9]
    # ascending=True keeps the LOWEST score (perplexity semantics)
    kept_asc = sorted(
        r["doc_id"]
        for r in keep_best_per_cluster(df, pairs, "quality", ascending=True).collect()
    )
    assert kept_asc == [1, 4, 9]  # min quality in {1,2,3} is doc 1
    # tie -> lowest id survives
    tie = spark.createDataFrame([(7, 1.0), (8, 1.0)], "doc_id long, quality double")
    tp = spark.createDataFrame([(7, 8)], "id_a long, id_b long")
    assert [r["doc_id"] for r in keep_best_per_cluster(tie, tp, "quality").collect()] == [7]
