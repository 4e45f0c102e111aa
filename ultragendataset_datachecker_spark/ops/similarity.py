"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k as a crossJoin + window — exact, O(n·q),
fine when the query set is small (it's a broadcast). Scale path: LSH
bucketing by deterministic random hyperplanes (signature join prunes the
candidate set), or IVF-style coarse quantization where centroids come from a
sampled k-means — both verify exact cosine on the pruned candidates only.

Hot-path vector math is Arrow-batched numpy (measured on this stack:
higher-order-function lambdas — aggregate/zip_with folds — are interpreted
per element with no codegen, ~0.5µs/element; a numpy matmul over an Arrow
batch is 10-100× faster for wide vectors). The expression-fold forms are kept
for small exact queries where the deterministic left-to-right summation order
is part of the contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential fold — deterministic summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_udf():
    """Arrow-batched exact cosine kernel for candidate verification —
    the numpy replacement for cosine_expr in the scale paths (one einsum per
    batch instead of an interpreted per-element fold)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        ma = np.stack(a.to_numpy()).astype("float64")
        mb = np.stack(b.to_numpy()).astype("float64")
        num = np.einsum("ij,ij->i", ma, mb)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(den > 0, num / den, 0.0)
        return pd.Series(out)

    return _cos


def hyperplane_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic (dim, n_planes) Gaussian plane matrix — the shared
    constant between the Spark kernel and any external re-implementation
    (tests / SQL oracles inline the same values)."""
    return np.random.RandomState(seed).standard_normal((dim, n_planes))


def hyperplane_bucket_udf(n_planes: int, seed: int, planes: np.ndarray | None = None):
    """Arrow-batched random-hyperplane LSH signature kernel: bucket =
    n_planes sign bits of X @ P, P derived from RandomState(seed) (identical
    on every executor; generated lazily from the batch's vector width when
    not supplied). One matmul per Arrow batch — replaces n_planes interpreted
    zip_with+aggregate folds per row."""
    from pyspark.sql.functions import pandas_udf

    fixed = None if planes is None else np.asarray(planes, dtype="float64")
    weights = (np.int64(1) << np.arange(n_planes, dtype=np.int64))

    @pandas_udf("long")
    def _bucket(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        m = np.stack(vs.to_numpy()).astype("float64")
        p = fixed if fixed is not None else hyperplane_planes(m.shape[1], n_planes, seed)
        signs = (m @ p) > 0
        return pd.Series((signs.astype(np.int64) * weights).sum(axis=1))

    return _bucket


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
    Self-matches excluded. Deterministic tiebreak on neighbor id.
    NULL vectors are dropped from both sides (they have no cosine)."""
    queries = queries.where(F.col(vec_col).isNotNull())
    corpus = corpus.where(F.col(vec_col).isNotNull())
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
    candidates only — both the signature and the verify are Arrow/numpy
    kernels, no interpreted per-element folds. Returns
    (query_id, neighbor_id, cosine, rank).
    NULL vectors are dropped from both sides before the Arrow kernels
    (np.stack over a batch containing None crashes the executor)."""
    queries = queries.where(F.col(vec_col).isNotNull())
    corpus = corpus.where(F.col(vec_col).isNotNull())
    bucket = hyperplane_bucket_udf(n_planes, seed)
    cos = cosine_udf()
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")).withColumn(
        "bucket", bucket(F.col("cv"))
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).withColumn(
        "bucket", bucket(F.col("qv"))
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cos(F.col("cv"), F.col("qv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _batch_topk_rows(ids, qids, sims, k: int, round_decimals: int | None):
    """Per-batch candidate pruning for the brute-force top-k kernels.

    The naive kernels emit corpus × n_queries scored rows into a window
    partitioned by query_id — n_queries tasks each sorting a corpus-sized
    partition, which serializes at web scale. Global top-k is a prefix of
    every batch's local order, so each Arrow batch only needs to emit rows
    that can still REACH the global top-k:

      keep row r for query q  iff  sims[r,q] >= kth_q - eps,

    where kth_q is the batch's k-th largest (self-matches excluded) and
    eps = 2*10^-round_decimals. Proof a dropped row never enters the global
    top-k: at least k rows in this batch score >= kth_q unrounded; for a
    dropped r, round(sims_r) <= sims_r + 0.5*10^-d < kth_q - 1.5*10^-d
    <= round(kth_q) - 10^-d, strictly below k rows' rounded scores, so no
    rounding-tie + neighbor_id tiebreak can promote it. With
    round_decimals=None, eps=0 and the argument is the plain strict
    inequality. The epsilon band keeps boundary TIES, so the final window
    (which still applies the documented round + tiebreak order) returns
    bit-identical results to the unpruned form while seeing only
    ~(k + ties) * n_queries rows per batch.
    """
    self_mask = ids[:, None] == qids[None, :]
    masked = np.where(self_mask, -np.inf, sims)
    kk = min(k, masked.shape[0])
    eps = 0.0 if round_decimals is None else 2.0 * 10.0 ** (-round_decimals)
    kth = np.partition(masked, masked.shape[0] - kk, axis=0)[masked.shape[0] - kk, :]
    keep = (masked >= (kth[None, :] - eps)) & np.isfinite(masked)
    rows, cols = np.nonzero(keep)
    return pd.DataFrame({
        "neighbor_id": ids[rows],
        "query_id": qids[cols],
        "cosine": sims[rows, cols],
    })


def brute_force_topk_pandas(
    corpus: DataFrame,
    queries_pdf,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_decimals: int | None = None,
) -> DataFrame:
    """Arrow-batched variant: numpy matmul per batch against the broadcast
    query matrix — wins over the expression fold for wide vectors / many
    queries. queries_pdf: pandas DataFrame with (id_col, vec_col).
    round_decimals rounds the cosine BEFORE ranking so ties (and therefore
    the deterministic neighbor_id tiebreak) are reproducible by an external
    oracle computing the same similarity in a different summation order."""
    import numpy as np
    import pandas as pd

    queries_pdf = queries_pdf[queries_pdf[vec_col].notna()]
    if len(queries_pdf) == 0:
        raise ValueError("queries_pdf has no non-null query vectors")
    corpus = corpus.where(F.col(vec_col).isNotNull())
    qids = queries_pdf[id_col].to_numpy()
    qm = np.stack(queries_pdf[vec_col].to_numpy()).astype("float64")

    def _unit(m):
        # zero-norm vectors score cosine 0 against everything — the same
        # den>0 guard as quantized_topk. (The pre-round-5 form divided by
        # the zero norm, and the NaN cosines sorted GREATEST in the window,
        # surfacing an all-zero vector as every query's rank-1 neighbor.)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        return np.divide(m, n, out=np.zeros_like(m), where=n > 0)

    qm_norm = _unit(qm)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            m = _unit(np.stack(pdf[vec_col].to_numpy()).astype("float64"))
            sims = m @ qm_norm.T  # (batch, n_queries)
            yield _batch_topk_rows(ids, qids, sims, k, round_decimals)

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, schema="neighbor_id long, query_id long, cosine double"
    )
    if round_decimals is not None:
        scored = scored.withColumn("cosine", F.round(F.col("cosine"), round_decimals))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def train_ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    train_size: int = 4096,
    n_iters: int = 10,
    seed: int = 13,
) -> np.ndarray:
    """IVF coarse quantizer: spherical k-means on a bounded, deterministic
    hash-ordered sample (TakeOrdered by xxhash64(id) — no full shuffle, no
    data-dependent driver memory: at most train_size × dim floats). The
    centroid matrix is tiny (n_centroids × dim) and broadcast to every
    executor; training cost is independent of corpus size, which is the
    whole point of IVF at 10^10 vectors."""
    sample = (
        corpus.where(F.col(vec_col).isNotNull())
        .select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(train_size)
        .collect()
    )
    m = np.stack([np.asarray(r["v"], dtype="float64") for r in sample])
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    rs = np.random.RandomState(seed)
    k = min(n_centroids, len(m))
    cents = m[rs.choice(len(m), size=k, replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for j in range(k):
            members = m[assign == j]
            if len(members):
                c = members.sum(axis=0)
                cents[j] = c / max(np.linalg.norm(c), 1e-12)
    return cents


def _centroid_assign_udf(cents: np.ndarray, nprobe: int = 1):
    """Arrow-batched nearest-centroid assignment: one matmul per batch,
    top-nprobe centroid ids per vector (ascending-id tiebreak via stable
    argsort on negated similarity)."""
    from pyspark.sql.functions import pandas_udf

    c = np.asarray(cents, dtype="float64")

    @pandas_udf("array<int>")
    def _assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        m = np.stack(vs.to_numpy()).astype("float64")
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ c.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype("int32")))

    return _assign


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_size: int = 4096,
    seed: int = 13,
    centroids: np.ndarray | None = None,
    round_decimals: int | None = None,
) -> DataFrame:
    """ANN top-k via IVF coarse quantization — the k-means sibling of
    lsh_topk (similarity search scale path, SURVEY §2 mandate). Corpus rows
    live in exactly one inverted list (their nearest centroid); each query
    probes its nprobe nearest lists, so the candidate join is an equi-join on
    the centroid id with the (small) query side exploded × nprobe and
    broadcast. Exact cosine on candidates only, via the Arrow kernel. Recall
    grows with nprobe (nprobe = n_centroids is exhaustive). Returns
    (query_id, neighbor_id, cosine, rank).
    NULL vectors are dropped from both sides before the Arrow kernels."""
    queries = queries.where(F.col(vec_col).isNotNull())
    corpus = corpus.where(F.col(vec_col).isNotNull())
    cents = centroids if centroids is not None else train_ivf_centroids(
        corpus, id_col, vec_col, n_centroids, train_size, seed=seed
    )
    assign1 = _centroid_assign_udf(cents, nprobe=1)
    assignp = _centroid_assign_udf(cents, nprobe=nprobe)
    cos = cosine_udf()
    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        .withColumn("cell", assign1(F.col("cv")).getItem(0))
    )
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .withColumn("cell", F.explode(assignp(F.col("qv"))))
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cos(F.col("cv"), F.col("qv")))
    )
    if round_decimals is not None:
        # round BEFORE ranking so the neighbor_id tiebreak is reproducible
        # by an external oracle summing in a different order
        scored = scored.withColumn("cosine", F.round(F.col("cosine"), round_decimals))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def group_centroid_drift(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "label",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-distribution drift per group: cosine similarity and L2
    distance between each group's centroid and the POOLED centroid — the
    embedding-modality analogue of the KL/PSI/KS checks (a source whose
    embedding mass moved shows up as cosine < 1 long before any scalar
    column drifts).

    Scale shape: NEVER posexplode the corpus (that is a dim× row blowup
    through the shuffle). One mapInPandas pass accumulates per-group
    (sum_vec, count) partials per TASK in numpy — the shuffle then carries
    O(tasks × groups) rows of dim doubles. The partials are posexploded
    (tiny frame), combined per (group, dim), and the two centroids +
    cosine/L2 are pure Column math on O(groups × dim) rows.

    Returns (group_col, n, cosine, l2) — one row per group, cosine in
    [-1, 1] (1.0 = group centroid parallel to pooled centroid).
    """
    from pyspark.sql import types as T

    src = df.where(F.col(group_col).isNotNull() & F.col(vec_col).isNotNull()).select(
        F.col(group_col).alias("_g"), F.col(vec_col).alias("_v")
    )
    g_dtype = src.schema["_g"].dataType

    part_schema = T.StructType([
        T.StructField("_g", g_dtype),
        T.StructField("_sum", T.ArrayType(T.DoubleType())),
        T.StructField("_cnt", T.LongType()),
    ])

    def _partials(batches):
        sums: dict = {}
        counts: dict = {}
        for pdf in batches:
            for g, sub in pdf.groupby("_g", sort=False):
                m = np.stack(sub["_v"].to_numpy()).astype("float64")
                s = m.sum(axis=0)
                if g in sums:
                    sums[g] += s
                    counts[g] += len(sub)
                else:
                    sums[g] = s
                    counts[g] = len(sub)
        if sums:
            yield pd.DataFrame(
                {"_g": list(sums), "_sum": [s.tolist() for s in sums.values()],
                 "_cnt": [counts[g] for g in sums]}
            )

    partials = src.mapInPandas(_partials, schema=part_schema)
    # tiny from here on: O(tasks x groups) rows -> O(groups x dim)
    per_dim = (
        partials.select("_g", "_cnt", F.posexplode("_sum").alias("_d", "_x"))
        .groupBy("_g", "_d")
        .agg(F.sum("_x").alias("_sx"), F.sum("_cnt").alias("_n"))
    )
    pooled = per_dim.groupBy("_d").agg(
        F.sum("_sx").alias("_tx"), F.sum("_n").alias("_tn")
    )
    j = per_dim.join(F.broadcast(pooled), on="_d")
    cg = F.col("_sx") / F.col("_n")
    cp = F.col("_tx") / F.col("_tn")
    return (
        j.groupBy(F.col("_g").alias(group_col))
        .agg(
            # _n repeats the group's total count once per dim — max is exact
            F.max("_n").alias("n"),
            (
                F.sum(cg * cp)
                / (F.sqrt(F.sum(cg * cg)) * F.sqrt(F.sum(cp * cp)))
            ).alias("cosine"),
            F.sqrt(F.sum(F.pow(cg - cp, F.lit(2.0)))).alias("l2"),
        )
    )


def group_covariance(
    df: DataFrame,
    dims: list[int],
    vec_col: str = "embedding",
    group_col: str = "label",
    round_dp: int = 6,
) -> DataFrame:
    """Per-group covariance/correlation between embedding dimensions — the
    second-moment complement of ``group_centroid_drift`` (a source whose
    embedding CLOUD changed shape while its centroid stayed put shows up
    here: collapsed modes, duplicated clusters, encoder regressions).

    ``dims`` selects which dimension pairs to profile (all unordered pairs
    of the given 0-based indices). Every pair's ``covar_pop``/``corr``
    aggregate runs in ONE pass over the corpus — ``element_at`` projects the
    scalars inside whole-stage codegen, partial aggregation collapses
    map-side, and the shuffle carries O(groups × pairs) scalars, never
    vectors. For a FULL d×d matrix at high dim prefer an Arrow outer-product
    kernel (same partial-sum shape as ``group_centroid_drift``); the pair
    form is the oracle-replayable profile for monitoring a chosen subspace.

    Returns one row per (group, dim_i, dim_j), i < j:
      (group_col, dim_i, dim_j, n, cov, corr) — doubles rounded to
    ``round_dp`` so accumulation order cannot flip a value hash.
    """
    pairs = [(a, b) for i, a in enumerate(dims) for b in dims[i + 1:]]
    if not pairs:
        raise ValueError("dims must contain at least two indices")
    src = df.where(F.col(group_col).isNotNull() & F.col(vec_col).isNotNull())

    def at(i: int):
        # element_at is 1-based; cast float32 -> double (exact widening)
        return F.element_at(F.col(vec_col), i + 1).cast("double")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for a, b in pairs:
        aggs.append(F.round(F.covar_pop(at(a), at(b)), round_dp).alias(f"_cov:{a}:{b}"))
        aggs.append(F.round(F.corr(at(a), at(b)), round_dp).alias(f"_cor:{a}:{b}"))
    row = src.groupBy(F.col(group_col)).agg(*aggs)
    structs = [
        F.struct(
            F.lit(a).alias("dim_i"),
            F.lit(b).alias("dim_j"),
            F.col("_n").alias("n"),
            F.col(f"`_cov:{a}:{b}`").alias("cov"),
            F.col(f"`_cor:{a}:{b}`").alias("corr"),
        )
        for a, b in pairs
    ]
    return row.select(
        group_col, F.explode(F.array(*structs)).alias("p")
    ).select(group_col, "p.*")


def group_covariance_full(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "label",
    dim: int | None = None,
    round_dp: int | None = None,
) -> DataFrame:
    """FULL d×d per-group covariance/correlation matrix via Arrow
    outer-product partials — the scale path ``group_covariance``'s docstring
    points at (that form compiles one aggregate per pair, fine for a chosen
    subspace; at d=768 that is 294k aggregate expressions — this kernel
    instead accumulates the whole matrix in one numpy ``X.T @ X`` per batch).

    Scale shape: ONE mapInPandas pass emits per-(task, group) partials —
    count, per-dim sums, and the flattened upper triangle of X^T X
    (d(d+1)/2 doubles). The corpus itself is never shuffled; the shuffle
    carries O(tasks × groups) partial rows. Partials are posexploded (tiny
    frame), combined per (group, cell), and cov/corr are Column math with a
    broadcast join of the diagonal for normalization.

    Returns (group_col, dim_i, dim_j, n, cov, corr) for every i ≤ j —
    population covariance (ddof=0), matching ``group_covariance``.
    """
    from pyspark.sql import types as T

    src = df.where(F.col(group_col).isNotNull() & F.col(vec_col).isNotNull()).select(
        F.col(group_col).alias("_g"), F.col(vec_col).alias("_v")
    )
    if dim is None:
        first = src.select(F.size("_v").alias("d")).first()
        if first is None:
            raise ValueError("input has no rows with a non-null vector")
        dim = int(first["d"])
    d = dim
    iu, ju = np.triu_indices(d)

    g_dtype = src.schema["_g"].dataType
    part_schema = T.StructType([
        T.StructField("_g", g_dtype),
        T.StructField("_cnt", T.LongType()),
        T.StructField("_sum", T.ArrayType(T.DoubleType())),
        T.StructField("_xtx", T.ArrayType(T.DoubleType())),
    ])

    def _partials(batches):
        cnt: dict = {}
        sums: dict = {}
        xtx: dict = {}
        for pdf in batches:
            for g, sub in pdf.groupby("_g", sort=False):
                m = np.stack(sub["_v"].to_numpy()).astype("float64")
                if m.shape[1] != d:
                    raise ValueError(
                        f"vector of dim {m.shape[1]} != declared dim {d}"
                    )
                p = m.T @ m
                if g in cnt:
                    cnt[g] += len(sub)
                    sums[g] += m.sum(axis=0)
                    xtx[g] += p
                else:
                    cnt[g] = len(sub)
                    sums[g] = m.sum(axis=0)
                    xtx[g] = p
        if cnt:
            yield pd.DataFrame({
                "_g": list(cnt),
                "_cnt": [cnt[g] for g in cnt],
                "_sum": [sums[g].tolist() for g in cnt],
                "_xtx": [xtx[g][iu, ju].tolist() for g in cnt],
            })

    partials = src.mapInPandas(_partials, schema=part_schema)

    # tiny from here on: O(tasks × groups) partial rows
    per_dim = (
        partials.select("_g", "_cnt", F.posexplode("_sum").alias("_d", "_x"))
        .groupBy("_g", "_d")
        .agg(F.sum("_x").alias("_sx"), F.sum("_cnt").alias("_n"))
    )
    # flat upper-tri index → (i, j): a literal lookup frame, broadcast
    spark = df.sparkSession
    idx_map = spark.createDataFrame(
        [(int(k), int(i), int(j)) for k, (i, j) in enumerate(zip(iu, ju))],
        "_k int, _i int, _j int",
    )
    cells = (
        partials.select("_g", F.posexplode("_xtx").alias("_k", "_p"))
        .groupBy("_g", "_k")
        .agg(F.sum("_p").alias("_sp"))
        .join(F.broadcast(idx_map), on="_k")
    )
    mean_i = per_dim.select(
        "_g", F.col("_d").alias("_i"),
        (F.col("_sx") / F.col("_n")).alias("_mi"), F.col("_n"),
    )
    mean_j = per_dim.select(
        "_g", F.col("_d").alias("_j"), (F.col("_sx") / F.col("_n")).alias("_mj")
    )
    cov = (
        cells.join(mean_i, on=["_g", "_i"]).join(mean_j, on=["_g", "_j"])
        .select(
            "_g", "_i", "_j", "_n",
            (F.col("_sp") / F.col("_n") - F.col("_mi") * F.col("_mj")).alias("cov"),
        )
    )
    diag = cov.where(F.col("_i") == F.col("_j")).select(
        "_g", F.col("_i").alias("_dd"), F.col("cov").alias("var")
    )
    out = (
        cov.join(F.broadcast(diag.withColumnRenamed("_dd", "_i")
                 .withColumnRenamed("var", "_vi")), on=["_g", "_i"])
        .join(F.broadcast(diag.withColumnRenamed("_dd", "_j")
              .withColumnRenamed("var", "_vj")), on=["_g", "_j"])
        .select(
            F.col("_g").alias(group_col),
            F.col("_i").alias("dim_i"),
            F.col("_j").alias("dim_j"),
            F.col("_n").alias("n"),
            "cov",
            F.when(
                (F.col("_vi") > 0) & (F.col("_vj") > 0),
                F.col("cov") / F.sqrt(F.col("_vi") * F.col("_vj")),
            ).alias("corr"),
        )
    )
    if round_dp is not None:
        out = out.select(
            group_col, "dim_i", "dim_j", "n",
            F.round("cov", round_dp).alias("cov"),
            F.round("corr", round_dp).alias("corr"),
        )
    return out


# ---------------------------------------------------------------------------
# int8 quantization — the memory/bandwidth scale path
# ---------------------------------------------------------------------------

def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q_vec",
    scale_col: str = "q_scale",
    impl: str = "arrow",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x|/127,
    q_i = round-half-away-from-zero(x_i/scale) clamped to [-127, 127].

    At 10^12 vectors the float32 embedding column dominates scan, shuffle and
    cache bytes; int8 cuts all three 4x while cosine ranking degrades only
    marginally (quantify with :func:`quantized_topk` recall vs the exact
    path). Cosine is SCALE-INVARIANT per vector, so the symmetric per-vector
    scale cancels out of dot(q_a,q_b)/(|q_a||q_b|) — quantized cosine needs
    only the int8 vectors, and integer dot products are exact, making the
    ranking bit-reproducible across engines (the DuckDB oracle replays it).

    Rounding is spelled floor(y+0.5)/ceil(y-0.5) explicitly because
    round-half-to-even vs half-up differs across engines; this form is
    deterministic everywhere. All-zero vectors quantize to all zeros with
    scale 0. Zero shuffle either way.

    ``impl="arrow"`` (default) computes the same math in a numpy kernel:
    Spark evaluates array-HOF lambdas INTERPRETED, one closure call per
    element (~10s per 10^6 vectors of dim 64 in one task), which dwarfs the
    quantization arithmetic. The float64 division/floor/ceil sequence is
    the same IEEE-754 op order as the SQL form, so outputs are
    bit-identical for every finite input, including null/empty/all-zero
    vectors (asserted in tests); ``impl="sql"`` keeps the pure
    Column-expression form external SQL engines replay verbatim. The one
    divergence is corrupt input — a vector CONTAINING a non-finite value:
    arrow yields NULL scale + NULL elements (explicit "unquantizable"),
    while the SQL expression yields NaN scale with engine-dependent
    element results (Spark: 0s) — silently plausible-looking garbage.
    """
    if impl == "arrow":
        from pyspark.sql.functions import pandas_udf

        @pandas_udf(f"struct<{scale_col}: double, {out_col}: array<tinyint>>")
        def qk(vecs: pd.Series) -> pd.DataFrame:
            scales = np.empty(len(vecs), dtype=np.float64)
            outs = []
            for i, v in enumerate(vecs):
                if v is None:
                    scales[i] = np.nan
                    outs.append(None)
                    continue
                x = np.asarray(v, dtype=np.float64)
                if x.size == 0:
                    scales[i] = np.nan  # exposed as NULL (SQL: array_max([]) IS NULL)
                    outs.append(np.zeros(0, dtype=np.int8))
                    continue
                s = np.abs(x).max() / 127.0
                scales[i] = s
                if s == 0.0:
                    outs.append(np.zeros(x.size, dtype=np.int8))
                    continue
                if not np.isfinite(s):
                    # SQL parity: NaN scale -> every element NULL after cast
                    outs.append([None] * x.size)
                    continue
                y = x / s
                q = np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5))
                outs.append(np.clip(q, -127.0, 127.0).astype(np.int8))
            return pd.DataFrame({scale_col: scales, out_col: outs})

        st = qk(F.col(vec_col))
        empty_or_null = F.col(vec_col).isNull() | (F.size(F.col(vec_col)) == 0)
        return df.withColumn("_q", st).select(
            "*",
            F.when(~empty_or_null, F.col(f"_q.{scale_col}")).alias(scale_col),
            F.col(f"_q.{out_col}").alias(out_col),
        ).drop("_q")
    if impl != "sql":
        raise ValueError(f"impl must be 'arrow' or 'sql', got {impl!r}")
    vec = F.col(vec_col)
    ax = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    scale = (ax / F.lit(127.0)).alias(scale_col)
    s = F.col(scale_col)
    y = lambda x: x.cast("double") / s  # noqa: E731
    q = F.transform(
        vec,
        lambda x: F.least(
            F.greatest(
                F.when(s == 0, F.lit(0.0))
                .when(y(x) >= 0, F.floor(y(x) + F.lit(0.5)))
                .otherwise(F.ceil(y(x) - F.lit(0.5))),
                F.lit(-127.0),
            ),
            F.lit(127.0),
        ).cast("tinyint"),
    )
    return df.withColumn(scale_col, scale).withColumn(out_col, q)


def quantized_topk(
    corpus: DataFrame,
    queries_pdf,
    id_col: str = "vec_id",
    qvec_col: str = "q_vec",
    k: int = 10,
    round_decimals: int | None = 5,
) -> DataFrame:
    """Brute-force cosine top-k over int8-quantized vectors.

    Same shape as :func:`brute_force_topk_pandas` (broadcast query matrix,
    one matmul per Arrow batch, per-query window rank) but the matmul is
    int8 x int8 -> int32 — a quarter of the memory traffic and eligible for
    SIMD int paths. Dots and squared norms are exact integers, so the cosine
    doubles are identical on every engine; ``round_decimals`` rounds BEFORE
    ranking so the deterministic neighbor_id tiebreak is oracle-reproducible.

    queries_pdf: pandas DataFrame with (id_col, qvec_col) — the already-
    quantized query vectors.

    NULL vectors (quantize_embeddings passes a NULL embedding through as a
    NULL q_vec) are dropped from both sides before the kernel — np.stack
    over a batch containing None dies with an opaque numpy error on the
    executor otherwise.
    """
    queries_pdf = queries_pdf[queries_pdf[qvec_col].notna()]
    if len(queries_pdf) == 0:
        raise ValueError("queries_pdf has no non-null query vectors")
    corpus = corpus.where(F.col(qvec_col).isNotNull())
    qids = queries_pdf[id_col].to_numpy()
    qm = np.stack(queries_pdf[qvec_col].to_numpy()).astype("int32")
    q_norm = np.sqrt((qm.astype("int64") * qm.astype("int64")).sum(axis=1).astype("float64"))

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            m = np.stack(pdf[qvec_col].to_numpy()).astype("int32")
            dots = (m @ qm.T).astype("float64")  # exact ints <= 127^2 * dim
            c_norm = np.sqrt((m.astype("int64") * m.astype("int64")).sum(axis=1).astype("float64"))
            den = c_norm[:, None] * q_norm[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = np.where(den > 0, dots / den, 0.0)
            yield _batch_topk_rows(ids, qids, sims, k, round_decimals)

    scored = corpus.select(id_col, qvec_col).mapInPandas(
        score, schema="neighbor_id long, query_id long, cosine double"
    )
    if round_decimals is not None:
        scored = scored.withColumn("cosine", F.round(F.col("cosine"), round_decimals))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
