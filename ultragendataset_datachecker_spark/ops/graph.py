"""Duplicate-cluster resolution — distributed connected components over a
near-duplicate pair graph.

Every dedup operator in ops/dedup.py emits PAIRS (id_a, id_b, similarity).
A real pipeline needs clusters: if A~B and B~C, then {A, B, C} is one
duplicate group and exactly one representative survives. Pairs alone
over-delete (drop both ends) or under-delete (keep C because it never paired
with A). This module closes that gap.

Algorithm: iterative min-label propagation (the hash-join formulation of
connected components, cf. Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — the simple-union variant):

    label(v) <- min(label(v), min_{u ~ v} label(u))   until fixpoint

Each iteration is one equi-join (edges x labels) + one groupBy(vertex) min —
both algebraic, partial-aggregated, AQE-handled. Convergence takes
O(diameter) iterations; near-dup graphs are unions of tiny dense clusters
(diameter 2-4 in practice), so 3-5 iterations is typical regardless of
corpus size. Each iteration is localCheckpoint()ed to cut the exponential
lineage growth of iterative plans (on a cluster, prefer
``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` for
fault-tolerant truncation; localCheckpoint trades lineage for executor-local
blocks, which is the right call in single-JVM local mode).

Scale shape: the graph is O(duplicate pairs) — orders of magnitude smaller
than the corpus — so even at 100 TB the iteration state is a skinny
(vertex, label) table. The hot-key risk (one mega-cluster) is absorbed by
map-side partial min aggregation: a 10^6-member cluster's label updates
collapse per task before the shuffle.

The component id is the MINIMUM vertex id of the component, so the id is
simultaneously the canonical surviving representative for keep-first dedup:
``drop rows where vertex != component`` implements keep-one-per-cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Exact connected components of the undirected graph given by ``edges``.

    Returns (vertex, component): one row per distinct endpoint, component =
    min vertex id reachable. Deterministic, partitioning-invariant. Raises
    if the fixpoint is not reached within ``max_iter`` (diameter bound).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("v"))
        .distinct()
        .withColumn("component", F.col("v"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = sym.join(
            labels.select(F.col("v").alias("b"), F.col("component").alias("nl")), "b"
        ).select(F.col("a").alias("v"), F.col("nl").alias("component"))
        new = (
            labels.unionByName(nbr)
            .groupBy("v")
            .agg(F.min("component").alias("new_component"))
        )
        # ONE action per iteration: the sum aggregate both materializes the
        # lazy localCheckpoint (truncating iterative lineage) and returns
        # the convergence test — the earlier form paid a second
        # limit(1).count() job per round over the checkpointed frame
        joined = (
            labels.join(new, "v")
            .withColumn(
                "_chg",
                (F.col("new_component") < F.col("component")).cast("long"),
            )
            .localCheckpoint(eager=False)
        )
        changed = joined.agg(F.coalesce(F.sum("_chg"), F.lit(0))).first()[0]
        labels = joined.select("v", F.col("new_component").alias("component"))
        if changed == 0:
            return labels.select(F.col("v").alias("vertex"), "component")
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def duplicate_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Resolve a dedup pair list into clusters: (doc_id, cluster_id) for every
    document that appears in at least one pair. cluster_id is the minimum
    doc_id of the cluster == the canonical keep-first representative."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.select(F.col("vertex").alias("doc_id"), F.col("component").alias("cluster_id"))


def keep_one_per_cluster(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    id_a: str = "id_a", id_b: str = "id_b",
) -> DataFrame:
    """Keep-first dedup by cluster: drop every row whose id belongs to a
    duplicate cluster and is not the cluster's canonical (minimum-id)
    representative. Rows never seen in a pair pass through untouched.

    The drop list is O(duplicates) and joins broadcast-small against the
    corpus in the common regime; Spark falls back to a shuffled join
    automatically when it is not."""
    clusters = duplicate_clusters(pairs, id_a, id_b)
    drop = clusters.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return df.join(
        drop.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )


def losers_per_cluster(
    df: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    ascending: bool = False,
) -> DataFrame:
    """(doc_id) frame of every cluster member EXCEPT the best-scored one —
    the drop list behind :func:`keep_best_per_cluster`, exposed so pipelines
    that need both the survivors and an audit trail (curate's dropped/
    output) compute it once instead of reconstructing it by anti-joining the
    survivor set.

    Winner per cluster = best score (max by default, min when ``ascending``;
    NULL scores lose to any non-null, matching desc_nulls_last), ties broken
    by ascending id. Window-free: two algebraic aggregates over the
    O(pair-members) cluster frame (best score per cluster, then min id among
    rows tying it) — a 10^6-member boilerplate mega-cluster collapses in
    map-side partials instead of serializing into one window task."""
    clusters = duplicate_clusters(pairs, id_a, id_b)
    scored = clusters.join(
        df.select(F.col(id_col).alias("doc_id"), F.col(score_col).alias("_s")),
        "doc_id",
    )
    best = F.min("_s") if ascending else F.max("_s")
    best_per = scored.groupBy("cluster_id").agg(best.alias("_ws"))
    winners = (
        scored.join(best_per, "cluster_id")
        # null-safe: a cluster whose every score is NULL has _ws NULL and
        # all members tie; min/max ignore nulls so a mixed cluster's NULL
        # rows never match a non-null _ws
        .where(F.col("_s").eqNullSafe(F.col("_ws")))
        .groupBy("cluster_id")
        .agg(F.min("doc_id").alias("_wid"))
    )
    return (
        scored.join(winners, "cluster_id")
        .where(F.col("doc_id") != F.col("_wid"))
        .select("doc_id")
    )


def keep_best_per_cluster(
    df: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    ascending: bool = False,
) -> DataFrame:
    """Quality-aware cluster dedup: within each duplicate cluster keep the
    row with the BEST score (highest by default; ``ascending=True`` keeps the
    lowest, e.g. for perplexity), ties broken by ascending id. Real pipelines
    keep the highest-quality duplicate, not an arbitrary one — compose with
    ops/quality or ops/lm scores.

    Cost shape matches keep_one_per_cluster: the cluster membership frame is
    O(rows that appear in a pair), the loser resolution is window-free
    partial aggregation (see :func:`losers_per_cluster`), and the final
    anti-join is broadcast-small in the common regime."""
    losers = losers_per_cluster(
        df, pairs, score_col, id_col=id_col, id_a=id_a, id_b=id_b,
        ascending=ascending,
    )
    return df.join(losers.withColumnRenamed("doc_id", id_col), id_col, "left_anti")
