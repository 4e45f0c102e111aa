"""Deduplication operators for text / token corpora at scale.

The reference's duplicate machinery is an O(n²) pairwise scan
(/root/reference/dataset_checker/checks/duplicates.py:52-63 exact pairing;
:73-122 TF-IDF + dense cosine matrix for fuzzy) — none of it survives past a
few tens of thousands of rows. These are the scale-appropriate Spark forms:

- exact:        hash-groupBy on a content fingerprint (one narrow shuffle)
- MinHash+LSH:  shingle → K minhashes → B bands → band-bucket self-join →
                exact Jaccard verify on candidates only
- SimHash:      64-bit weighted-feature hash; near-dups share the hash value
                (or differ in few bits — banded by 16-bit quarters)
- n-gram Jaccard: candidate pairs from a shared-shingle inverted index, exact
                Jaccard on candidates (no all-pairs)
- embedding cosine: see ops/similarity.py (LSH-bucketed)

Everything is pure DataFrame ops: shuffles are narrow (ids + hashes, never
full text/arrays), joins are equi-joins Catalyst can plan, skewed buckets are
handled by AQE.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------- exact

def exact_duplicates(df: DataFrame, key_cols: list[str], id_col: str,
                     order_cols: list[str] | None = None) -> DataFrame:
    """Keep-first exact dedup detection: every occurrence past rank 1 of the
    key is a duplicate (deterministic total order — Spark's dropDuplicates
    does not guarantee which row survives; ref duplicates.py:46 keep='first').
    Returns (id, first_id, *key_cols)."""
    order = order_cols or [id_col]
    keep = list(dict.fromkeys([id_col, *key_cols, *order]))
    w = Window.partitionBy(*key_cols).orderBy(*order)
    ranked = df.select(*keep).withColumn("_rn", F.row_number().over(w)).withColumn(
        "_first", F.first(id_col).over(w)
    )
    return ranked.where(F.col("_rn") > 1).select(
        F.col(id_col).alias("id"), F.col("_first").alias("first_id"), *key_cols
    )


def dedup_keep_first(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """Deterministic keep-first dedup (SURVEY W1)."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


# ---------------------------------------------------------------- shingles

def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct) from a text column — pure SQL:
    normalized whitespace split + sliding window via transform over indices."""
    words = F.split(F.trim(F.regexp_replace(text, r"\s+", " ")), " ")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.array_distinct(grams)


# ---------------------------------------------------------------- MinHash LSH

_MERSENNE_P = (1 << 61) - 1


def hashed_shingles(text: Column, n: int = 3) -> Column:
    """Shingle set reduced to 64-bit hashes — ONE higher-order pass over the
    strings; all downstream signature math runs on longs."""
    return F.transform(shingles(text, n), lambda s: F.xxhash64(s))


def _minhash_sig_udf(num_hashes: int, seed: int):
    """Arrow-batched signature kernel: K universal-hash minima per row,
    vectorized in numpy ((a_k*h + b_k) mod (2^61-1), min over shingles).
    Deterministic: params from a fixed-seed RandomState. This is the
    'grouped pandas/Arrow UDF' shape the engine uses wherever per-element
    JVM lambdas would be interpreted (measured ~0.5µs/element there)."""
    from pyspark.sql.functions import pandas_udf

    rs = np.random.RandomState(seed)
    a = rs.randint(1, _MERSENNE_P, size=num_hashes, dtype=np.int64)
    b = rs.randint(0, _MERSENNE_P, size=num_hashes, dtype=np.int64)

    @pandas_udf("array<long>")
    def sig(hs: pd.Series) -> pd.Series:
        out = []
        au = a.astype(np.uint64)
        bu = b.astype(np.uint64)
        for arr in hs:
            h = np.asarray(arr, dtype=np.uint64)
            # (a*h + b) mod p in uint64 (wrap-around is part of the family)
            m = (au[:, None] * h[None, :] + bu[:, None]) % np.uint64(_MERSENNE_P)
            out.append(m.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return sig


def minhash_lsh_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    seed: int = 42,
    persist_shingles: bool = True,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    Scale path: rows→(id, shingles) [one scan, persisted: reused by band
    generation AND candidate verification] → explode B band-hashes
    [B rows/doc, nothing else carried through the explode] → self-join on
    (band, band_hash) [the only big shuffle; bucket sizes are small by
    construction] → exact Jaccard verify on candidate pairs only.

    Shingle strings are hashed to longs ONCE (one JVM pass); the K-hash
    signature is an Arrow-batched numpy kernel (universal hashing), and the
    exact Jaccard verify runs on the hashed shingle sets with native
    array_intersect/array_union — no interpreted per-element lambdas anywhere
    in the hot path.
    """
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(hashed_shingles(F.col(text_col), shingle_n)).alias("hs"),
    ).where(F.size("hs") > 0)
    if persist_shingles:
        # NOTE: the cache lives until the caller's session ends (the returned
        # DataFrame is lazy, so this function cannot unpersist it); pass
        # persist_shingles=False for repeated invocations in one session —
        # shingles are then recomputed per consuming pass instead of cached
        base = base.persist()

    sig_udf = _minhash_sig_udf(num_hashes, seed)
    sigf = base.select("id", sig_udf(F.col("hs")).alias("sig"))
    band_arr = F.array(*[
        F.xxhash64(F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band), F.lit(b))
        for b in range(bands)
    ])
    banded = sigf.select("id", F.posexplode(band_arr).alias("band", "bh"))

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(right, on=["band", "bh"], how="inner")
        .where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact Jaccard verify on hashed shingle sets, candidates only
    cand = (
        cand.join(base.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a")
        .join(base.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
    )
    inter = F.size(F.array_intersect("hs_a", "hs_b")).cast("double")
    union = F.size(F.array_union("hs_a", "hs_b")).cast("double")
    return (
        cand.withColumn("jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0)))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------- SimHash

def _simhash_udf(seed: int = 7):
    """Arrow-batched SimHash kernel: per row, for each of 64 bit positions,
    sign of Σ over features of ±1 — vectorized with numpy bit tricks."""
    from pyspark.sql.functions import pandas_udf

    shifts = np.arange(64, dtype=np.uint64)

    @pandas_udf("long")
    def sim(hs: pd.Series) -> pd.Series:
        out = np.empty(len(hs), dtype=np.int64)
        for i, arr in enumerate(hs):
            h = np.asarray(arr, dtype=np.uint64)
            if h.size == 0:
                out[i] = 0
                continue
            bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            packed = ((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
            out[i] = packed.astype(np.int64)  # wrap-around view: bit 63 = sign
        return pd.Series(out)

    return sim


def simhash_duplicates(df: DataFrame, id_col: str, text_col: str,
                       shingle_n: int = 2, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit hash into 4×16-bit chunks —
    any pair within Hamming distance 3 must agree on ≥1 chunk (pigeonhole) —
    join on (chunk_idx, chunk) then verify exact Hamming distance.
    Feature hashing is one JVM pass; the 64-bit vote is an Arrow kernel."""
    hs = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(hashed_shingles(F.col(text_col), shingle_n)).alias("hs"),
    ).where(F.size("hs") > 0)
    h = hs.select("id", _simhash_udf()(F.col("hs")).alias("sh64"))
    chunks = F.explode(
        F.array(*[
            F.struct(F.lit(i).alias("ci"),
                     F.shiftrightunsigned(F.col("sh64"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("cv"))
            for i in range(4)
        ])
    )
    banded = h.select("id", "sh64", chunks.alias("c")).select(
        "id", "sh64", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv")
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(r, on=["ci", "cv"]).where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                F.col("l.sh64").alias("ha"), F.col("r.sh64").alias("hb"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.withColumn("hamming", hamming).where(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


# ---------------------------------------------------------------- n-gram Jaccard

def ngram_jaccard_duplicates(df: DataFrame, id_col: str, text_col: str,
                             shingle_n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs without all-pairs: inverted index
    (shingle → doc ids) generates candidate pairs that share >=1 shingle;
    shared-shingle counts come from the join itself (group by pair), so the
    exact Jaccard needs only each doc's shingle *count*, not a second pass:
    |A∩B| = shared, |A∪B| = |A|+|B|−shared."""
    base = df.select(F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_n).alias("sh"))
    sizes = base.select("id", F.size("sh").alias("n_sh")).where(F.col("n_sh") > 0)
    inv = base.select("id", F.explode("sh").alias("g"))
    l, r = inv.alias("l"), inv.alias("r")
    shared = (
        l.join(r, on="g").where(F.col("l.id") < F.col("r.id"))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ja = shared.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
    ja = ja.join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
    jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return ja.withColumn("jaccard", jac.cast("double")).where(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


# ---------------------------------------------------------------- embedding near-dup

def embedding_near_duplicates(df: DataFrame, id_col: str, vec_col: str,
                              cosine_threshold: float = 0.95,
                              n_planes: int = 12, seed: int = 11) -> DataFrame:
    """Near-dup pairs by embedding cosine, LSH-bucketed: random-hyperplane
    signature (n_planes sign bits from deterministic hash-derived planes) →
    bucket self-join → exact cosine verify on candidates."""
    from ultragendataset_datachecker_spark.ops.similarity import cosine_expr, hyperplane_bucket

    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    b = base.withColumn("bucket", hyperplane_bucket(F.col("v"), n_planes, seed))
    l, r = b.alias("l"), b.alias("r")
    cand = (
        l.join(r, on="bucket").where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                F.col("l.v").alias("va"), F.col("r.v").alias("vb"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("cosine", cosine_expr(F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= cosine_threshold)
        .select("id_a", "id_b", "cosine")
    )
