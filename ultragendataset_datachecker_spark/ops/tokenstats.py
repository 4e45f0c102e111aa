"""Token-ID distribution analytics — the payload-level counterpart of the
engine's scalar checks (n_tok length stats, tok_min/tok_max range checks).

A tokenized corpus can pass every per-sequence check and still be broken at
the distribution level: a tokenizer version bump reshuffles ID mass, a bad
shard floods one vocabulary region, a truncation bug clips high IDs. These
operators histogram the token IDs themselves per group and compare
snapshots with the same KL/PSI formulation the scalar drift checks use.

Scale shape: the corpus is ~n_rows × seq_len token instances (10^12 × 512 =
5·10^14 at the north-star scale) — the one table where per-item processing
cost dominates everything. The default ``arrow`` implementation concatenates
each Arrow batch's arrays and takes ONE ``np.bincount`` per (batch, group);
the shuffle carries O(tasks × groups × buckets) partial rows, never token
instances. The ``sql`` implementation (explode → bucket → count) is kept as
the plan-transparent reference — asserted identical in tests (exact integer
counts, so the implementations agree bit-for-bit).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

INVALID_BUCKET = -1  # token id < 0


def token_id_histogram(
    df: DataFrame,
    vocab_size: int,
    num_buckets: int = 64,
    tokens_col: str = "tokens",
    group_col: str = "part",
    impl: str = "arrow",
) -> DataFrame:
    """Per-group histogram of token IDs over ``num_buckets`` contiguous
    vocabulary ranges: bucket = (id · num_buckets) // vocab_size for
    0 ≤ id < vocab_size (integer math — engine-exact and oracle-replayable).
    Out-of-vocabulary IDs are diagnostic buckets of their own: -1 for
    negative IDs, ``num_buckets`` for id ≥ vocab_size.

    Returns (group_col, bucket, n_tokens); absent buckets are absent rows
    (join with a bucket spine or use the drift op, which outer-joins).
    """
    if vocab_size <= 0 or num_buckets <= 0:
        raise ValueError("vocab_size and num_buckets must be positive")
    if impl not in ("arrow", "sql"):
        raise ValueError(f"impl must be 'arrow' or 'sql', got {impl!r}")
    src = df.where(
        F.col(group_col).isNotNull() & F.col(tokens_col).isNotNull()
    ).select(F.col(group_col).alias("_g"), F.col(tokens_col).alias("_t"))
    g_dtype = src.schema["_g"].dataType

    if impl == "sql":
        tok = F.col("_tok").cast("long")
        # `div` = exact integer division: the double-division form
        # ((tok*B)/V then cast) can round a product above ~2^53 into the
        # wrong bucket, breaking the asserted bit-for-bit parity with the
        # arrow impl's integer `//` at large vocab sizes
        bucket = (
            F.when(tok < 0, F.lit(INVALID_BUCKET))
            .when(tok >= vocab_size, F.lit(num_buckets))
            .otherwise(F.expr(
                f"CAST(_tok AS BIGINT) * {int(num_buckets)} div {int(vocab_size)}"
            ))
            .cast("int")
        )
        out = (
            src.select("_g", F.explode("_t").alias("_tok"))
            .groupBy(F.col("_g"), bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_tokens"))
        )
        return out.select(F.col("_g").alias(group_col), "bucket", "n_tokens")

    part_schema = T.StructType([
        T.StructField("_g", g_dtype),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("n_tokens", T.LongType()),
    ])
    B, V = num_buckets, vocab_size

    def _partials(batches):
        acc: dict = {}
        for pdf in batches:
            for g, sub in pdf.groupby("_g", sort=False):
                arrs = [np.asarray(a, dtype=np.int64) for a in sub["_t"] if len(a)]
                if not arrs:
                    continue
                ids = np.concatenate(arrs)
                neg = int((ids < 0).sum())
                over = int((ids >= V).sum())
                in_vocab = ids[(ids >= 0) & (ids < V)]
                # exact integer bucketing, same arithmetic as the sql impl
                counts = np.bincount((in_vocab * B) // V, minlength=B)
                prev = acc.get(g)
                if prev is None:
                    acc[g] = [neg, over, counts]
                else:
                    prev[0] += neg
                    prev[1] += over
                    prev[2] = prev[2] + counts
        rows = {"_g": [], "bucket": [], "n_tokens": []}
        for g, (neg, over, counts) in acc.items():
            for b in np.nonzero(counts)[0]:
                rows["_g"].append(g)
                rows["bucket"].append(int(b))
                rows["n_tokens"].append(int(counts[b]))
            if neg:
                rows["_g"].append(g); rows["bucket"].append(INVALID_BUCKET); rows["n_tokens"].append(neg)
            if over:
                rows["_g"].append(g); rows["bucket"].append(B); rows["n_tokens"].append(over)
        if rows["_g"]:
            yield pd.DataFrame(rows)

    partials = src.mapInPandas(_partials, schema=part_schema)
    return (
        partials.groupBy("_g", "bucket")
        .agg(F.sum("n_tokens").alias("n_tokens"))
        .select(F.col("_g").alias(group_col), "bucket", "n_tokens")
    )


def token_id_drift(
    current: DataFrame,
    baseline: DataFrame,
    vocab_size: int,
    num_buckets: int = 64,
    tokens_col: str = "tokens",
    group_col: str = "part",
    eps: float = 1e-6,
    round_dp: int = 6,
    impl: str = "arrow",
) -> DataFrame:
    """Token-ID distribution drift between two corpus snapshots, per group —
    KL divergence and PSI over the bucketed vocabulary histograms (the same
    smoothing-and-sum formulation as checks/drift.py's scalar histograms,
    applied to the token payload itself).

    Both sides histogram in one pass each; the comparison outer-joins the
    O(groups × buckets) histogram frames — a bucket present on one side only
    is floored at ``eps`` rather than dropped (mass appearing from or
    vanishing to nowhere is exactly the drift signal).

    Returns (group_col, n_cur, n_base, kl, psi).
    """
    cur = token_id_histogram(
        current, vocab_size, num_buckets, tokens_col, group_col, impl
    )
    base = token_id_histogram(
        baseline, vocab_size, num_buckets, tokens_col, group_col, impl
    )
    return histogram_drift(cur, base, group_col=group_col, eps=eps, round_dp=round_dp)


def histogram_drift(
    cur_hist: DataFrame,
    base_hist: DataFrame,
    group_col: str = "part",
    eps: float = 1e-6,
    round_dp: int = 6,
) -> DataFrame:
    """KL/PSI drift between two already-computed (group, bucket, n_tokens)
    histogram frames — the comparison half of ``token_id_drift``, exposed so
    the engine can drift a fresh run's histogram against a PERSISTED
    baseline histogram (one corpus pass per snapshot lifetime, not per
    comparison). Input frames are O(groups × buckets)."""
    cur = cur_hist.withColumnRenamed("n_tokens", "n_cur_b")
    base = base_hist.withColumnRenamed("n_tokens", "n_base_b")
    j = cur.join(base, on=[group_col, "bucket"], how="full_outer").fillna(
        0, ["n_cur_b", "n_base_b"]
    )
    totals = j.groupBy(group_col).agg(
        F.sum("n_cur_b").alias("n_cur"), F.sum("n_base_b").alias("n_base")
    )
    j = j.join(F.broadcast(totals), on=group_col)
    # a group with ZERO tokens on one side (new source, vanished source) is
    # all-eps on that side — maximal drift signal, never a division error
    p = F.greatest(
        F.when(F.col("n_cur") > 0, F.col("n_cur_b") / F.col("n_cur")).otherwise(F.lit(0.0)),
        F.lit(eps),
    )
    q = F.greatest(
        F.when(F.col("n_base") > 0, F.col("n_base_b") / F.col("n_base")).otherwise(F.lit(0.0)),
        F.lit(eps),
    )
    return (
        j.groupBy(group_col)
        .agg(
            F.max("n_cur").alias("n_cur"),
            F.max("n_base").alias("n_base"),
            F.round(F.sum(p * F.log2(p / q)), round_dp).alias("kl"),
            F.round(F.sum((p - q) * F.log(p / q)), round_dp).alias("psi"),
        )
    )


DEFAULT_REPETITION_THRESHOLDS = {
    # conservative defaults for real BPE vocabularies; callers tune per
    # tokenizer (a tiny synthetic vocab naturally concentrates mass)
    "max_top_token_frac": 0.20,
    "max_run": 20,
    "min_distinct_frac": 0.05,
}


def token_repetition(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    thresholds: dict | None = None,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-sequence degenerate-repetition signals over the token IDs —
    the payload-level counterpart of ops/quality.py's word-level Gopher
    rules. Catches looped decoding, pad flooding and stuck-token shards
    that length/range checks miss:

    - ``n_tok``             sequence length
    - ``distinct_frac``     |unique ids| / n
    - ``top_token_frac``    occurrences of the most frequent id / n
    - ``max_run``           longest run of one id (pad/loop detector)
    - ``token_entropy``     Shannon entropy (bits) of the in-sequence id
                            distribution = log2(n) − Σ c·log2 c / n
    - ``repetition_pass``   all thresholds satisfied

    One Arrow kernel pass (np.unique + run-length via np.diff per sequence;
    token instances never shuffle and never cross the JVM boundary row-wise)
    — ZERO shuffle, scales as a pure map like the quality filters. Empty /
    null sequences get NULL signals and repetition_pass = NULL.

    ``carry_cols`` are copied through the kernel unchanged (e.g. the engine
    threads its partition column through so violations need no join back).
    """
    th = dict(DEFAULT_REPETITION_THRESHOLDS)
    th.update(thresholds or {})
    id_dtype = df.schema[id_col].dataType
    out_schema = T.StructType([
        *[T.StructField(c, df.schema[c].dataType) for c in carry_cols],
        T.StructField("_id", id_dtype),
        T.StructField("n_tok", T.LongType()),
        T.StructField("distinct_frac", T.DoubleType()),
        T.StructField("top_token_frac", T.DoubleType()),
        T.StructField("max_run", T.LongType()),
        T.StructField("token_entropy", T.DoubleType()),
    ])

    def kernel(batches):
        for pdf in batches:
            ids, n_tok, dfrac, tfrac, mrun, ent = [], [], [], [], [], []
            for rid, toks in zip(pdf["_id"], pdf["_t"]):
                ids.append(rid)
                if toks is None or len(toks) == 0:
                    n_tok.append(0 if toks is not None else None)
                    dfrac.append(None); tfrac.append(None)
                    mrun.append(None); ent.append(None)
                    continue
                t = np.asarray(toks, dtype=np.int64)
                n = t.shape[0]
                _, counts = np.unique(t, return_counts=True)
                change = np.flatnonzero(np.diff(t) != 0)
                edges = np.concatenate(([-1], change, [n - 1]))
                n_tok.append(int(n))
                dfrac.append(float(len(counts)) / n)
                tfrac.append(float(counts.max()) / n)
                mrun.append(int(np.diff(edges).max()))
                ent.append(float(np.log2(n) - (counts * np.log2(counts)).sum() / n))
            yield pd.DataFrame({
                **{c: pdf[c] for c in carry_cols},
                "_id": ids, "n_tok": pd.array(n_tok, dtype="Int64"),
                "distinct_frac": pd.array(dfrac, dtype="float64"),
                "top_token_frac": pd.array(tfrac, dtype="float64"),
                "max_run": pd.array(mrun, dtype="Int64"),
                "token_entropy": pd.array(ent, dtype="float64"),
            })

    sig = df.select(
        *[F.col(c) for c in carry_cols],
        F.col(id_col).alias("_id"),
        F.col(tokens_col).alias("_t"),
    ).mapInPandas(kernel, schema=out_schema)
    ok = (
        (F.col("top_token_frac") <= th["max_top_token_frac"])
        & (F.col("max_run") <= th["max_run"])
        & (F.col("distinct_frac") >= th["min_distinct_frac"])
    )
    return sig.select(
        *carry_cols,
        F.col("_id").alias(id_col), "n_tok", "distinct_frac", "top_token_frac",
        "max_run", "token_entropy",
    ).withColumn("repetition_pass", ok)
