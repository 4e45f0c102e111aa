"""Isolation-forest multivariate outliers (SURVEY A18) — grouped Arrow UDF.

The reference fits sklearn's IsolationForest(contamination=0.1) on every
numeric column of the whole in-memory table
(/root/reference/dataset_checker/checks/outliers.py:84-107). sklearn is not
available here, and a single whole-table fit doesn't distribute anyway — so
this is the §2.8-prescribed shape: ``applyInPandas`` (grouped map), one
independent model per partition group, with the algorithm itself
re-implemented in ~80 lines of numpy from the published method (Liu, Ting,
Zhou, "Isolation Forest", ICDM 2008): random-feature/random-threshold trees
on small subsamples, anomaly score 2^(−E[path]/c(n)), threshold at the
contamination quantile.

Scale shape: the fit cost per group is O(n_trees · max_samples) regardless of
group size; scoring is one vectorized pass per tree. Groups are Iceberg
partitions, so the whole check is embarrassingly parallel with no shuffle
beyond the groupBy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _c_factor(n: int) -> float:
    """Average unsuccessful-search path length in a BST of n nodes (the
    normalizer c(n) from the paper, eq. 1)."""
    if n <= 1:
        return 0.0
    h = np.log(n - 1) + np.euler_gamma
    return 2.0 * h - 2.0 * (n - 1) / n


def _build_tree(X: np.ndarray, rng: np.random.RandomState, depth_limit: int):
    """One iTree as nested tuples: (feature, threshold, left, right) or
    (None, size, None, None) for an external node."""
    n = X.shape[0]
    if n <= 1 or depth_limit <= 0:
        return (None, n, None, None)
    f = rng.randint(X.shape[1])
    col = X[:, f]
    lo, hi = col.min(), col.max()
    if lo == hi:
        return (None, n, None, None)
    t = rng.uniform(lo, hi)
    mask = col < t
    return (
        f, t,
        _build_tree(X[mask], rng, depth_limit - 1),
        _build_tree(X[~mask], rng, depth_limit - 1),
    )


def _path_lengths(X: np.ndarray, tree, depth: int = 0) -> np.ndarray:
    """Vectorized scoring: recursively route index subsets through the tree."""
    f, t, left, right = tree
    out = np.empty(X.shape[0], dtype=np.float64)
    if f is None:
        out[:] = depth + _c_factor(int(t))
        return out
    mask = X[:, f] < t
    out[mask] = _path_lengths(X[mask], left, depth + 1)
    out[~mask] = _path_lengths(X[~mask], right, depth + 1)
    return out


def iforest_scores(
    X: np.ndarray, n_trees: int = 100, max_samples: int = 256, seed: int = 17
) -> np.ndarray:
    """Anomaly scores in (0, 1]; higher = more anomalous (paper eq. 2)."""
    rng = np.random.RandomState(seed)
    n = X.shape[0]
    sub = min(max_samples, n)
    depth_limit = int(np.ceil(np.log2(max(sub, 2))))
    paths = np.zeros(n, dtype=np.float64)
    for _ in range(n_trees):
        idx = rng.choice(n, size=sub, replace=False)
        tree = _build_tree(X[idx], rng, depth_limit)
        paths += _path_lengths(X, tree)
    avg = paths / n_trees
    return np.power(2.0, -avg / _c_factor(sub))


def outlier_count_for(n: int, contamination: float) -> int:
    """Number of rows flagged in a group of n scored rows. Equals the count
    of values STRICTLY ABOVE the linear-interpolated (1-c) quantile of a
    tie-free score vector: (n-1) - floor((n-1)*(1-c)) — a pure function of n,
    which is what makes the check's output SQL-verifiable by an external
    oracle (the driver replays this exact formula in DuckDB; keep the
    float arithmetic shape identical on both sides)."""
    if n <= 1:
        return 0
    return int((n - 1) - np.floor((n - 1) * (1.0 - contamination)))


def isolation_forest_outliers(
    df: DataFrame,
    columns: list[str],
    id_col: str = "doc_id",
    group_col: str = "part",
    contamination: float = 0.1,
    n_trees: int = 100,
    max_samples: int = 256,
    seed: int = 17,
    group_dtype: str = "int",
) -> DataFrame:
    """Per-group isolation-forest outliers. Returns
    (group_col, id_col, score:double, is_outlier:boolean); rows with any null
    feature are excluded (the reference fits on data.dropna-selected numeric
    columns). Deterministic: the per-group RandomState seeds from
    (seed, group value).

    is_outlier marks exactly outlier_count_for(n, contamination) rows — the
    top scores with a deterministic (score desc, id asc) tiebreak. For
    tie-free scores this is identical to the classic `score > quantile(1-c)`
    threshold; under ties (duplicate feature vectors) the threshold form's
    count becomes data-dependent while this stays exact and deterministic —
    which keeps the flagged count reproducible across runs, parallelism
    levels, and external SQL replay."""
    schema = f"{group_col} {group_dtype}, {id_col} string, score double, is_outlier boolean"
    cols = list(columns)

    def fit_score(key, pdf):
        # the subsample draw indexes into row positions, so make the row
        # order canonical — group input order varies with partitioning
        pdf = pdf.dropna(subset=cols).sort_values(id_col, kind="mergesort")
        if len(pdf) == 0:
            return pd.DataFrame(columns=[group_col, id_col, "score", "is_outlier"])
        X = pdf[cols].to_numpy(dtype=np.float64)
        import zlib

        gseed = (seed * 1_000_003 + zlib.crc32(str(key[0]).encode())) % (2**31 - 1)
        scores = iforest_scores(X, n_trees=n_trees, max_samples=max_samples, seed=gseed)
        k = outlier_count_for(len(scores), contamination)
        is_out = np.zeros(len(scores), dtype=bool)
        if k > 0:
            # pdf is id-sorted, so stable argsort on -score breaks ties by id
            order = np.argsort(-scores, kind="mergesort")
            is_out[order[:k]] = True
        return pd.DataFrame({
            group_col: pdf[group_col].to_numpy(),
            id_col: pdf[id_col].to_numpy(),
            "score": scores,
            "is_outlier": is_out,
        })

    return df.select(group_col, id_col, *cols).groupBy(group_col).applyInPandas(
        fit_score, schema=schema
    )


def isolation_forest_violations(
    df: DataFrame, columns: list[str], cfg=None, **kw
) -> DataFrame:
    """Violation-row adapter: (part, doc_id, check_name, observed, expected),
    same schema as the engine's other checks."""
    out = isolation_forest_outliers(df, columns, **kw)
    return out.where(F.col("is_outlier")).select(
        F.col("part"),
        F.col("doc_id"),
        F.lit("multivariate_outlier_iforest").alias("check_name"),
        F.concat(F.lit("score="), F.round(F.col("score"), 4).cast("string")).alias("observed"),
        F.lit("isolation-forest score below contamination threshold").alias("expected"),
    )
