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

from contextlib import contextmanager

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ------------------------------------------------- candidate-cache lifecycle
#
# The LSH/ANN paths persist their candidate-pair frames (O(candidate pairs),
# ids only — consumed twice: id-set prune + pair join). The ContextCleaner
# reclaims them when the plan is GC'd, but a long session issuing many dedup
# calls would accumulate cache entries until then — so each op registers its
# persisted intermediates on the frame it returns, and callers release them
# deterministically once the output is materialized.

def _register_intermediate(out: DataFrame, cached: DataFrame) -> DataFrame:
    out._ugd_cached = [*getattr(out, "_ugd_cached", []), cached]
    return out


def unpersist_intermediates(df: DataFrame) -> int:
    """Release the persisted candidate frames behind a dedup/ANN result.
    Call AFTER materializing the result (write/collect/count) — unpersisting
    earlier just recomputes candidates on next use. Returns #released."""
    n = 0
    for c in getattr(df, "_ugd_cached", []):
        try:
            # blocking: the default async unpersist leaves the entry in the
            # storage list for a beat — callers (and the release test) rely
            # on deterministic reclamation
            c.unpersist(blocking=True)
            n += 1
        except Exception:
            pass
    df._ugd_cached = []
    return n


@contextmanager
def released(df: DataFrame):
    """Context manager form: `with released(minhash_lsh_duplicates(...)) as
    pairs: pairs.write...` — intermediates drop on exit."""
    try:
        yield df
    finally:
        unpersist_intermediates(df)


# ---------------------------------------------------------------- exact

def _null_safe_key_cond(left: DataFrame, right: DataFrame, key_cols: list[str]):
    """Join condition matching groupBy's null handling: groupBy puts all
    null-keyed rows in ONE group, so the join-back must treat NULL = NULL
    (a plain equi-join would silently drop null-keyed duplicate groups)."""
    cond = None
    for c in key_cols:
        piece = left[c].eqNullSafe(right[c])
        cond = piece if cond is None else (cond & piece)
    return cond


def _hash_candidate_split(df: DataFrame, key_cols: list[str]):
    """(candidate_rows, pass_through_rows) split by 64-bit key-hash
    frequency — the detect-then-verify stage shared by the exact dedup
    forms (same design as checks/uniqueness.fused_duplicate_violations).

    The corpus-sized exchange carries only xxhash64 over the key tuple
    (8 B + count partials) instead of the full key/order/row payload the
    downstream aggregates need; those aggregates then run on the candidate
    rows only. Hash groups are a SUPERSET of true duplicate-key groups
    (identical tuples always share a hash; collisions only ADD false
    candidates), so callers keep their exact regroup on the true keys and
    collision singletons fall out there. The candidate-hash frame is
    defect-sized under the same rare-duplicates assumption the join-backs
    already make; AQE broadcasts it when small and falls back to a shuffle
    join when a heavy-dup corpus makes it large.
    """
    if "_kh" in df.columns:
        raise ValueError(
            "_hash_candidate_split: input already has a `_kh` column "
            "(reserved internal name) — rename it first"
        )
    kh = F.xxhash64(*[F.col(c) for c in key_cols])
    with_h = df.withColumn("_kh", kh)
    cand_h = (
        with_h.groupBy("_kh")
        .agg(F.count(F.lit(1)).alias("_hc"))
        .where(F.col("_hc") > 1)
        .select("_kh")
    )
    pruned = with_h.join(cand_h, "_kh").drop("_kh")
    passthrough = with_h.join(cand_h, "_kh", "left_anti").drop("_kh")
    return pruned, passthrough


def exact_duplicates(df: DataFrame, key_cols: list[str], id_col: str,
                     order_cols: list[str] | None = None) -> DataFrame:
    """Keep-first exact dedup detection: every occurrence past rank 1 of the
    key is a duplicate (deterministic total order — Spark's dropDuplicates
    does not guarantee which row survives; ref duplicates.py:46 keep='first').
    Returns (id, first_id, *key_cols).

    Window-free (hot-key safe): the first occurrence per key is
    min(struct(*order_cols, id)) — an algebraic aggregate whose map-side
    partial collapses even a key duplicated 10^8 times per task, where the
    old row_number() window serialized the whole key into one task (same
    pattern as checks/uniqueness.py). The defect-sized duplicate-key frame
    then joins back (AQE broadcasts it), so the fact side never shuffles on
    the key. Output is identical to the window form wherever (order_cols)
    is a total order within a key; under order ties it is the DETERMINISTIC
    refinement (ties broken by id, where the window's tie order was
    partition-layout dependent)."""
    order = order_cols or [id_col]
    ord_t = F.struct(
        *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order)],
        F.col(id_col).alias("_oid"),
    )
    # detect-then-verify: the corpus-sized exchange groups on the 8-byte key
    # hash; the exact (key, min-order) aggregate below runs on candidate
    # rows only, and its _cnt>1 filter discards hash-collision singletons.
    # pruned is consumed twice (dup_keys aggregate + the join-back probe) —
    # persist it so an expensive upstream pipeline isn't recomputed per
    # consumer; it is defect-sized (rows in multi-occupancy hash buckets),
    # and the dup_keys broadcast job populates the cache before the probe
    # reads it. Registered on the output: release via released()/
    # unpersist_intermediates after materializing.
    pruned, _ = _hash_candidate_split(df, key_cols)
    pruned = pruned.persist()
    dup_keys = (
        pruned.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_cnt"), F.min(ord_t).alias("_first"))
        .where(F.col("_cnt") > 1)
        .select(*key_cols, "_first")
    )
    base = pruned.select(id_col, *order, *key_cols).alias("b")
    dk = dup_keys.alias("d")
    out = (
        base.join(dk, on=_null_safe_key_cond(base, dk, key_cols), how="inner")
        .where(F.col(f"b.{id_col}") != F.col("d._first._oid"))
        .select(
            F.col(f"b.{id_col}").alias("id"),
            F.col("d._first._oid").alias("first_id"),
            *[F.col(f"b.{c}").alias(c) for c in key_cols],
        )
    )
    return _register_intermediate(out, pruned)


def dedup_keep_first(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """Deterministic keep-first dedup (SURVEY W1): one surviving row per key,
    minimal by (order_cols, full row).

    Window-free (hot-key safe): survivors of duplicated keys come straight
    out of min(struct(*order_cols, struct(<row>))) — partial-aggregated, so
    a boilerplate key duplicated 10^8 times collapses map-side instead of
    serializing into one window task — and detect-then-verify (see
    _hash_candidate_split): rows whose 64-bit key hash is unique pass
    straight through, so the corpus-sized exchange carries 8-byte hashes
    instead of whole rows; candidate rows take the exact min(row) aggregate
    and a null-safe anti-join against the defect-sized duplicate-key frame
    (AQE broadcasts it; the fact side never shuffles). Ties on order_cols are
    broken by the remaining columns' values (deterministic), where the old
    row_number() form's tie winner was partition-layout dependent. Requires
    orderable column types (no maps) — same constraint the window form had
    on order_cols, extended to the whole row only when order ties occur."""
    cols = df.columns
    ord_t = F.struct(
        *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_cols)],
        F.struct(*[F.col(c) for c in cols]).alias("_row"),
    )
    # detect-then-verify: rows whose key hash is unique pass straight
    # through (ZERO bytes of row payload cross the corpus-sized exchange —
    # it carries only the 8-byte key hash); the min(whole-row) aggregate
    # runs on the candidate rows only, where the exact-key _cnt>1 filter
    # drops hash-collision singletons into the anti-join pass-through.
    # pruned feeds both the dup_keys aggregate and the uniq anti-join —
    # persist the defect-sized frame so an expensive upstream pipeline
    # (e.g. curate's filtered docs) isn't recomputed per consumer; the
    # dup_keys broadcast job populates the cache before the probe reads it.
    # Registered on the output: release via released()/
    # unpersist_intermediates after materializing.
    pruned, passthrough = _hash_candidate_split(df, key_cols)
    pruned = pruned.persist()
    dup_keys = (
        pruned.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_cnt"), F.min(ord_t).alias("_first"))
        .where(F.col("_cnt") > 1)
    )
    dup_survivors = dup_keys.select("_first._row.*").select(*cols)
    base = pruned.alias("b")
    dk = dup_keys.select(*key_cols).alias("d")
    uniq = base.join(
        dk, on=_null_safe_key_cond(base, dk, key_cols), how="left_anti"
    ).select(*cols)
    out = passthrough.select(*cols).unionByName(uniq).unionByName(dup_survivors)
    return _register_intermediate(out, pruned)


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


def _shingle_hash_kernel(n: int, method: str):
    """Arrow-batched shingle+hash kernel: text → sorted array of distinct
    hashed word n-grams. Replaces the nested interpreted-HOF form
    (transform(sequence...) + transform(xxhash64) — measured ~15µs per
    shingle element, it was the single hottest stage of the LSH bench
    queries) with one vectorized pass per Arrow batch.

    method="fast64" hashes every distinct WORD in the batch once through
    pandas' C siphash (hash_array, categorize=True — Zipfian word counts
    mean the unique set is small), then combines the n word hashes of each
    gram with a numpy polynomial rolling hash in uint64 wrap-around
    arithmetic. Zero per-gram Python: the per-row work is numpy slicing.
    The hash VALUES differ from the old per-gram blake2b form — documented
    as internal; every consumer (min-signature, majority vote,
    intersect/union Jaccard) only needs self-consistency within a run.

    method="md5_60" is BIT-IDENTICAL to the SQL form
    conv(substring(md5(gram),1,15),16,10) that the DuckDB oracles replay —
    kept on the per-gram hashlib path precisely because external engines
    must be able to recompute it.

    Output is sorted so the intermediate arrays are deterministic; every
    consumer is order-invariant anyway."""
    from pyspark.sql.functions import pandas_udf

    if method == "md5_60":

        @pandas_udf("array<long>")
        def sh(texts: pd.Series) -> pd.Series:
            import hashlib

            out = []
            for t in texts:
                if t is None:
                    out.append([])
                    continue
                w = t.split()
                grams = {" ".join(w[i:i + n]) for i in range(max(len(w) - n + 1, 0))}
                out.append(sorted(
                    int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
                ))
            return pd.Series(out)

        return sh

    # fast64: vectorized polynomial hash over batch-hashed word ids
    _MULT = np.uint64(0x9E3779B97F4A7C15)  # odd 64-bit multiplier (golden ratio)

    @pandas_udf("array<long>")
    def sh(texts: pd.Series) -> pd.Series:
        from pandas.util import hash_array

        words_per = [t.split() if t is not None else [] for t in texts]
        lens = np.fromiter((len(w) for w in words_per), dtype=np.int64,
                           count=len(words_per))
        flat = [w for ws in words_per for w in ws]
        if flat:
            # hash each DISTINCT word once (siphash is a pure function of the
            # string, so values agree across batches/executors), then gather
            codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
            wh = hash_array(np.asarray(uniq, dtype=object), categorize=False)[codes]
        else:
            wh = np.empty(0, dtype=np.uint64)
        offs = np.concatenate(([0], np.cumsum(lens)))
        out = []
        for i in range(len(words_per)):
            h = wh[offs[i]:offs[i + 1]]
            k = h.size - n + 1
            if k <= 0:
                out.append([])
                continue
            acc = h[:k].copy()
            for j in range(1, n):
                acc = acc * _MULT + h[j:j + k]  # uint64 wrap-around
            out.append(np.unique(acc.view(np.int64)))
        return pd.Series(out)

    return sh


def hashed_shingles(text: Column, n: int = 3, method: str = "fast64") -> Column:
    """Shingle set reduced to integer hashes; all downstream signature math
    runs on longs.

    method="fast64": 64-bit blake2b via the Arrow kernel (the fast default —
    hash choice is internal, every consumer only needs self-consistency).
    method="md5_60": first 60 bits of md5 via the Arrow kernel — replayable
    in any SQL engine with md5 (the DuckDB correctness oracles recompute it),
    so an external system can verify the whole LSH pipeline bit-for-bit.
    method="xxhash64": legacy pure-JVM expression form (interpreted HOF —
    slow; kept for callers that need a Column with no Python worker)."""
    if method in ("fast64", "md5_60"):
        return _shingle_hash_kernel(n, method)(text)
    if method == "xxhash64":
        return F.transform(shingles(text, n), lambda s: F.xxhash64(s))
    raise ValueError(f"unknown hash method: {method}")


def _minhash_params(num_hashes: int, seed: int):
    """Deterministic universal-hash family params (fixed-seed RandomState)."""
    rs = np.random.RandomState(seed)
    a = rs.randint(1, _MERSENNE_P, size=num_hashes, dtype=np.int64)
    b = rs.randint(0, _MERSENNE_P, size=num_hashes, dtype=np.int64)
    return a, b


def _sig_minima(h: np.ndarray, au: np.ndarray, bu: np.ndarray) -> np.ndarray:
    """K universal-hash minima over one row's shingle hashes:
    min over h of (a_k*h + b_k) mod (2^61-1), uint64 wrap-around."""
    m = (au[:, None] * h[None, :] + bu[:, None]) % np.uint64(_MERSENNE_P)
    return m.min(axis=1).astype(np.int64)


def _text_sig_kernel(n: int, method: str, num_hashes: int, seed: int):
    """Fused shingle+signature Arrow kernel: text → K-minhash signature in
    ONE Python worker pass (null/empty-shingle rows → empty array, filtered
    by the caller). Value-identical to hashed_shingles → _minhash_sig_udf —
    the same distinct-shingle hash set feeds the same universal-hash minima
    — but the (large) per-row shingle arrays never cross Arrow: the round-4
    bench profile showed the chained-UDF form paying two JVM↔Python
    round-trips of the hs arrays per signature."""
    from pyspark.sql.functions import pandas_udf

    a, b = _minhash_params(num_hashes, seed)
    au, bu = a.astype(np.uint64), b.astype(np.uint64)

    if method == "md5_60":

        @pandas_udf("array<long>")
        def tsig(texts: pd.Series) -> pd.Series:
            import hashlib

            out = []
            for t in texts:
                w = t.split() if t is not None else []
                grams = {" ".join(w[i:i + n]) for i in range(max(len(w) - n + 1, 0))}
                if not grams:
                    out.append([])
                    continue
                h = np.fromiter(
                    (int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams),
                    dtype=np.uint64, count=len(grams),
                )
                out.append(_sig_minima(h, au, bu))
            return pd.Series(out)

        return tsig

    _MULT = np.uint64(0x9E3779B97F4A7C15)

    @pandas_udf("array<long>")
    def tsig(texts: pd.Series) -> pd.Series:
        from pandas.util import hash_array

        words_per = [t.split() if t is not None else [] for t in texts]
        lens = np.fromiter((len(w) for w in words_per), dtype=np.int64,
                           count=len(words_per))
        flat = [w for ws in words_per for w in ws]
        if flat:
            codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
            wh = hash_array(np.asarray(uniq, dtype=object), categorize=False)[codes]
        else:
            wh = np.empty(0, dtype=np.uint64)
        offs = np.concatenate(([0], np.cumsum(lens)))
        out = []
        for i in range(len(words_per)):
            h = wh[offs[i]:offs[i + 1]]
            k = h.size - n + 1
            if k <= 0:
                out.append([])
                continue
            acc = h[:k].copy()
            for j in range(1, n):
                acc = acc * _MULT + h[j:j + k]
            out.append(_sig_minima(np.unique(acc), au, bu))
        return pd.Series(out)

    return tsig


def _minhash_sig_udf(num_hashes: int, seed: int):
    """Arrow-batched signature kernel: K universal-hash minima per row,
    vectorized in numpy ((a_k*h + b_k) mod (2^61-1), min over shingles).
    Deterministic: params from a fixed-seed RandomState. This is the
    'grouped pandas/Arrow UDF' shape the engine uses wherever per-element
    JVM lambdas would be interpreted (measured ~0.5µs/element there)."""
    from pyspark.sql.functions import pandas_udf

    a, b = _minhash_params(num_hashes, seed)
    au, bu = a.astype(np.uint64), b.astype(np.uint64)

    @pandas_udf("array<long>")
    def sig(hs: pd.Series) -> pd.Series:
        return pd.Series(
            [_sig_minima(np.asarray(arr, dtype=np.uint64), au, bu) for arr in hs]
        )

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
    hash_method: str = "fast64",
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    Scale path: rows→(id, hashed shingles)→signature [one scan] → explode B
    band-hashes [B rows/doc, nothing else carried through the explode] →
    self-join on (band, band_hash) [the only big shuffle; bucket sizes are
    small by construction] → exact Jaccard verify on candidate pairs only.

    The verify step semi-joins the raw table down to candidate ids FIRST and
    recomputes hashed shingles for that sliver only — candidates are rare, so
    this avoids both caching the full hashed-shingle corpus for the session
    and re-shuffling it twice (the two joins below touch candidate rows only
    and broadcast under AQE). Net cost: one extra pruned scan of the text
    column, which at 100 TB beats a 100 TB cache by construction.

    Shingle strings are hashed to longs in one JVM pass; the K-hash signature
    is an Arrow-batched numpy kernel (universal hashing); the exact Jaccard
    verify uses native array_intersect/array_union — no interpreted
    per-element lambdas anywhere in the hot path.
    """
    rows_per_band = num_hashes // bands
    raw = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))

    def _hs(frame: DataFrame) -> DataFrame:
        return frame.select(
            "id",
            F.array_distinct(hashed_shingles(F.col("_txt"), shingle_n, hash_method)).alias("hs"),
        ).where(F.size("hs") > 0)

    # ONE fused Arrow pass text→signature (the shingle arrays never cross
    # Arrow), persisted: the band self-join consumes the frame on BOTH
    # sides and Catalyst does not ReuseExchange across ArrowEvalPython
    # subplans (round-4 plan audit: the signature pipeline ran twice plus
    # once per verify join — 34 Arrow evals, 12 scans). The persisted frame
    # is corpus-sized but NARROW — id + K longs, ~0.3-3% of the text bytes
    # — MEMORY_AND_DISK spillable, registered for released() cleanup.
    tsig_udf = _text_sig_kernel(shingle_n, hash_method, num_hashes, seed)
    sigf = (
        raw.select("id", tsig_udf(F.col("_txt")).alias("sig"))
        .where(F.size("sig") > 0)
        .persist()
    )
    # EAGER: a lazy persist races — the band self-join's two shuffle map
    # stages run inside one job and each computes the signature kernel
    # before the cache populates (measured at 2M docs / 4 executors: the
    # candidate stage took 229s cold vs 25s with sigf pre-materialized).
    # One count materializes the cache; every later consumer reads it.
    sigf.count()
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
    # The candidate frame is consumed twice below (id set + pair join); cache
    # it so the signature pipeline runs once. Unlike round 1's full-corpus
    # shingle cache this is O(candidate pairs) — ids only, rare by
    # construction — and the ContextCleaner drops it when the plan is GC'd.
    cand = cand.persist()
    cand.count()  # eager — consumed by cand_ids AND the pair join below
    # exact Jaccard verify: prune raw → candidate rows only → shingle sets.
    # cand_hs feeds TWO joins (id_a and id_b sides) — persist + eager count
    # so the shingle kernel and the pruned text scan run once, not once
    # per side (lazy persists race inside the final job; see sigf above).
    cand_ids = cand.select(F.col("id_a").alias("id")).union(
        cand.select(F.col("id_b").alias("id"))
    ).distinct()
    cand_hs = _hs(raw.join(cand_ids, on="id", how="left_semi")).persist()
    cand_hs.count()
    pairs = (
        cand.join(cand_hs.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a")
        .join(cand_hs.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
    )
    inter = F.size(F.array_intersect("hs_a", "hs_b")).cast("double")
    union = F.size(F.array_union("hs_a", "hs_b")).cast("double")
    out = (
        pairs.withColumn("jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0)))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    out = _register_intermediate(out, cand)
    out = _register_intermediate(out, cand_hs)
    return _register_intermediate(out, sigf)


# ---------------------------------------------------------------- SimHash

def _simhash_udf(n_bits: int = 64):
    """Arrow-batched SimHash kernel: per row, for each of n_bits bit
    positions, sign of Σ over features of ±1 — vectorized with numpy bit
    tricks. n_bits < 64 keeps the packed value inside a signed long's
    positive range (needed when an external SQL oracle replays the vote)."""
    from pyspark.sql.functions import pandas_udf

    shifts = np.arange(n_bits, dtype=np.uint64)

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


def simhash_band_widths(n_bits: int, bands: int) -> list[int]:
    """Split n_bits into `bands` contiguous non-empty chunks (widths differ by
    at most 1). All chunks non-empty is what makes the pigeonhole recall
    guarantee hold: a pair within Hamming distance h < bands cannot differ in
    every one of the `bands` chunks."""
    if not (0 < bands <= n_bits):
        raise ValueError(f"bands must be in [1, {n_bits}], got {bands}")
    q, r = divmod(n_bits, bands)
    return [q + 1] * r + [q] * (bands - r)


def simhash_duplicates(df: DataFrame, id_col: str, text_col: str,
                       shingle_n: int = 2, max_hamming: int = 3,
                       bands: int | None = None,
                       hash_method: str = "fast64",
                       max_bucket_freq: int | None = 10_000) -> DataFrame:
    """Near-dup pairs by SimHash with a RECALL GUARANTEE: the hash is banded
    into `bands` contiguous chunks with bands >= max_hamming + 1, so any pair
    within Hamming distance max_hamming must agree on at least one whole
    chunk (pigeonhole) and is generated as a candidate. Candidates are then
    verified with exact bit_count(xor). Feature hashing is one JVM pass; the
    bit vote is an Arrow kernel.

    bands defaults to max_hamming + 1 (the minimum that guarantees recall);
    more bands trade a bigger candidate join for nothing here, fewer would
    silently drop pairs — a bands <= max_hamming request raises.
    hash_method="md5_60" makes the whole pipeline replayable in external SQL
    (60-bit feature hashes + 60-bit simhash).

    max_bucket_freq is the scale guard: band values are only
    n_bits/bands wide (~15-16 bits at the defaults), so expected bucket
    occupancy grows LINEARLY with corpus size — at 10^9 docs a band value
    collects ~30k docs and its self-join alone emits ~10^9 candidate pairs
    (quadratic per bucket). With the cap, candidate generation skips
    (band, value) buckets whose document frequency exceeds it, bounding any
    bucket's join to max_bucket_freq² pairs. Recall contract under the cap:
    the output is exactly the pairs with Hamming <= max_hamming that agree
    on AT LEAST ONE band whose bucket is under the cap (pigeonhole preserved
    for them); pairs whose every agreeing band is a hot bucket are dropped.
    Hot buckets are dominated by boilerplate mega-clusters, which belong in
    exact dedup (exact_duplicates / dedup_clusters), not a pairwise
    expansion that is quadratic in cluster size by definition. Pass
    max_bucket_freq=None for the uncapped exact pair set ("the output is
    EXACTLY the set of pairs with simhash-Hamming <= max_hamming") — safe
    only when n_docs << 2^(n_bits/bands)."""
    n_bits = 60 if hash_method == "md5_60" else 64
    if bands is None:
        bands = max_hamming + 1
    if bands <= max_hamming:
        raise ValueError(
            f"bands={bands} cannot guarantee recall at max_hamming={max_hamming}; "
            f"need bands >= max_hamming + 1"
        )
    widths = simhash_band_widths(n_bits, bands)
    offsets = [sum(widths[:i]) for i in range(bands)]

    hs = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(hashed_shingles(F.col(text_col), shingle_n, hash_method)).alias("hs"),
    ).where(F.size("hs") > 0)
    h = hs.select("id", _simhash_udf(n_bits)(F.col("hs")).alias("sh"))
    def _chunk(i: int):
        shifted = F.shiftrightunsigned(F.col("sh"), offsets[i])
        if widths[i] >= 64:  # single full-width band: mask would overflow long
            return shifted
        return shifted.bitwiseAND(F.lit((1 << widths[i]) - 1))

    chunks = F.explode(
        F.array(*[
            F.struct(F.lit(i).alias("ci"), _chunk(i).alias("cv"))
            for i in range(bands)
        ])
    )
    banded = h.select("id", "sh", chunks.alias("c")).select(
        "id", "sh", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv")
    )
    if max_bucket_freq is not None:
        # prune hot (band, value) buckets BEFORE the self-join: one partial-
        # aggregated groupBy over (ci, cv) — O(distinct buckets) rows — then a
        # semi-join that AQE broadcasts. Bounds every bucket's candidate
        # contribution to max_bucket_freq² pairs.
        cold = (
            banded.groupBy("ci", "cv")
            .agg(F.count(F.lit(1)).alias("_bf"))
            .where(F.col("_bf") <= max_bucket_freq)
            .select("ci", "cv")
        )
        banded = banded.join(cold, on=["ci", "cv"], how="left_semi")
    # banded feeds the cold-bucket aggregate plus BOTH self-join sides, and
    # Catalyst does not ReuseExchange across ArrowEvalPython subplans — the
    # persisted frame is corpus×bands NARROW rows (id, sh, ci, cv); without
    # it the shingle+simhash pipeline runs up to 3x. Registered for
    # released() cleanup.
    #
    # The explicit repartition on the band key is load-bearing: the
    # self-join's OUTPUT is quadratic in bucket occupancy while its INPUT
    # is corpus×bands narrow rows, so AQE — which plans from input bytes —
    # coalesces the join down to a couple of tasks and the ~bucket²
    # expansion runs nearly serially (measured at 50k docs/60-bit bands:
    # ~120M joined rows through 2 tasks, 68s of a 76s query). A
    # user-specified repartition is exempt from AQE coalescing, and the
    # cached hash partitioning serves BOTH join sides with no further
    # exchange.
    p = max(df.sparkSession.sparkContext.defaultParallelism, 2 * bands)
    banded = banded.repartition(p, "ci", "cv").persist()
    # EAGER: lazy persists race — both self-join sides would run the
    # shingle+simhash pipeline inside the first action's job before the
    # cache populates (same failure mode as minhash's sigf)
    banded.count()
    l, r = banded.alias("l"), banded.alias("r")
    # Verify Hamming BEFORE dropDuplicates: narrow band values make the
    # self-join output quadratic in bucket occupancy (at 50k docs / 9
    # bands of 60 bits it is ~10^8 rows), and AQE coalesces the distinct's
    # exchange from the PRE-join size estimate, funneling all of it through
    # a couple of tasks. bit_count(xor) is codegen and filters map-side
    # inside the join stage, so the distinct only ever sees true pairs
    # (each at most `bands` times — once per agreeing band).
    hamming = F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh")))
    cand = (
        l.join(r, on=["ci", "cv"]).where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
    return _register_intermediate(cand.select("id_a", "id_b", "hamming"), banded)


# ---------------------------------------------------------------- n-gram Jaccard

def ngram_jaccard_duplicates(df: DataFrame, id_col: str, text_col: str,
                             shingle_n: int = 3, threshold: float = 0.5,
                             max_doc_freq: int | None = 64) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs without all-pairs: inverted index
    (shingle → doc ids) generates candidate pairs that share >=1 shingle.

    max_doc_freq is the scale knob: a shingle shared by k docs emits k²
    candidate rows, and common word n-grams push k toward corpus size —
    quadratic blowup. With the cap, candidates are generated ONLY from
    shingles with document frequency <= max_doc_freq, and the Jaccard for
    surviving pairs is then computed EXACTLY from the full (hashed) shingle
    sets via array_intersect/array_union — so every emitted pair's value is
    exact; what's traded away is recall for pairs whose every shared shingle
    is hotter than the cap (such pairs are mostly stop-phrase overlap, not
    near-duplicates). When the cap binds nowhere the output is identical to
    the uncapped path.

    The cap DEFAULTS ON (64): the capped path is the only shape that
    survives a web corpus — near-dup pairs at threshold >= 0.5 share mostly
    *rare* shingles, so candidate recall loss from skipping stop-phrase
    shingles is negligible while the uncapped join is quadratic in the
    hottest shingle's document frequency. Pass max_doc_freq=None to opt in
    to the exact uncapped inverted-index join (safe only when every shingle
    is known to be cold, e.g. post-filtered or small corpora).

    Uncapped path (opt-in): shared-shingle counts come from the join itself
    (group by pair), so the exact Jaccard needs only each doc's shingle
    count: |A∩B| = shared, |A∪B| = |A|+|B|−shared."""
    # hashed shingles (Arrow kernel): the inverted index explodes/joins on
    # longs instead of shingle strings — same Jaccard (distinct sets), no
    # interpreted HOF pass, and a narrower shuffle key
    # persisted + EAGER: the shingle kernel's output feeds the df-frequency
    # aggregate, BOTH inverted-index join sides, and the exact verify — a
    # lazy persist races all of them through the kernel inside one job
    # (see minhash's sigf); with the cache they are cheap explode/probe
    # scans of the (id, sh) frame. Registered for released() cleanup.
    base = df.select(
        F.col(id_col).alias("id"), hashed_shingles(F.col(text_col), shingle_n).alias("sh")
    ).persist()
    base.count()
    sizes = base.select("id", F.size("sh").alias("n_sh")).where(F.col("n_sh") > 0)
    inv = base.select("id", F.explode("sh").alias("g"))

    if max_doc_freq is None:
        l, r = inv.alias("l"), inv.alias("r")
        shared = (
            l.join(r, on="g").where(F.col("l.id") < F.col("r.id"))
            .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("shared"))
        )
        ja = shared.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
        ja = ja.join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
        jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
        out = ja.withColumn("jaccard", jac.cast("double")).where(
            F.col("jaccard") >= threshold
        ).select("id_a", "id_b", "jaccard")
        return _register_intermediate(out, base)

    # capped path: candidates from cold shingles only, exact verify on sets
    cold = inv.groupBy("g").agg(F.count(F.lit(1)).alias("_df")).where(
        F.col("_df") <= max_doc_freq
    ).select("g")
    inv_c = inv.join(cold, on="g", how="left_semi")
    l, r = inv_c.alias("l"), inv_c.alias("r")
    cand = (
        l.join(r, on="g").where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact verify reads the cached (id, sh) frame — the kernel output is
    # already distinct, so no re-shingling and no array_distinct pass
    hs = base.select("id", F.col("sh").alias("hs"))
    cand = cand.persist()  # O(candidate pairs); consumed twice below
    cand.count()
    cand_ids = cand.select(F.col("id_a").alias("id")).union(
        cand.select(F.col("id_b").alias("id"))
    ).distinct()
    # candidate-sized, consumed by TWO joins — persist + eager count so
    # the cache probe runs once, not once per side
    cand_hs = hs.join(cand_ids, on="id", how="left_semi").persist()
    cand_hs.count()
    pairs = (
        cand.join(cand_hs.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a")
        .join(cand_hs.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
    )
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size(F.array_union("hs_a", "hs_b"))
    jac = inter / union
    out = pairs.withColumn("jaccard", jac.cast("double")).where(
        F.col("jaccard") >= threshold
    ).select("id_a", "id_b", "jaccard")
    out = _register_intermediate(out, cand)
    out = _register_intermediate(out, cand_hs)
    return _register_intermediate(out, base)


# ---------------------------------------------------------------- embedding near-dup

def embedding_near_duplicates(df: DataFrame, id_col: str, vec_col: str,
                              cosine_threshold: float = 0.95,
                              n_planes: int = 12, seed: int = 11,
                              n_tables: int = 1,
                              planes=None) -> DataFrame:
    """Near-dup pairs by embedding cosine, LSH-bucketed: random-hyperplane
    signature (n_planes sign bits, Gaussian planes from RandomState(seed)) →
    bucket self-join → exact cosine verify on candidates. Signature and
    verify are Arrow/numpy kernels (no interpreted per-element folds).

    Recall is probabilistic: a pair at angle θ collides in one table w.p.
    (1−θ/π)^n_planes; n_tables independent tables (seed+i) union their
    candidates, recall = 1−(1−p)^L. Every emitted pair is exact-verified, so
    precision is 1.0 by construction. `planes` (shape (dim, n_planes)) pins
    table 0's planes explicitly — used by tests/oracles that replay the
    bucket computation outside Spark."""
    from ultragendataset_datachecker_spark.ops.similarity import (
        cosine_udf, hyperplane_bucket_udf,
    )

    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    # With 2^n_planes buckets, bucket occupancy — and so each self-join's
    # OUTPUT — grows linearly with the corpus while the join INPUT stays
    # narrow (id, bucket), the same shape that serialized the SimHash band
    # join under AQE coalescing. The explicit repartition on the bucket key
    # is exempt from AQE coalescing and the cached frame serves both join
    # sides, so each table's bucket kernel runs once and the quadratic
    # expansion stays spread across the cluster.
    p = max(df.sparkSession.sparkContext.defaultParallelism, 2 ** n_planes)
    bucketed = []
    cand = None
    for t in range(n_tables):
        bucket = hyperplane_bucket_udf(
            n_planes, seed + t, planes=planes if t == 0 else None
        )
        b = (
            base.select("id", bucket(F.col("v")).alias("bucket"))
            .repartition(p, "bucket")
            .persist()
        )
        b.count()  # eager: both self-join sides read it in one job
        bucketed.append(b)
        l, r = b.alias("l"), b.alias("r")
        c = (
            l.join(r, on="bucket").where(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        )
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.dropDuplicates(["id_a", "id_b"]).persist()  # O(candidate pairs)

    # exact cosine verify on pruned candidate rows only
    cand_ids = cand.select(F.col("id_a").alias("id")).union(
        cand.select(F.col("id_b").alias("id"))
    ).distinct()
    # candidate-sized, consumed by TWO joins — persist so the semi-join
    # prune of the vector column runs once
    vecs = base.join(cand_ids, on="id", how="left_semi").persist()
    pairs = (
        cand.join(vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a")
        .join(vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b")
    )
    out = (
        pairs.withColumn("cosine", cosine_udf()(F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= cosine_threshold)
        .select("id_a", "id_b", "cosine")
    )
    out = _register_intermediate(out, cand)
    out = _register_intermediate(out, vecs)
    for b in bucketed:
        out = _register_intermediate(out, b)
    return out


def cross_snapshot_duplicates(
    current: DataFrame,
    base: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Incremental-ingestion dedup: rows of ``current`` whose (normalized)
    text content already exists in ``base`` — the cross-VERSION counterpart
    of exact_duplicates (new crawl vs the corpus already trained on).

    Returns (id_col, fingerprint, n_base_matches). The join carries only
    (id, hash) — at 100 TB the base side reduces to its DISTINCT fingerprint
    set (one partial-aggregated groupBy), and the equi-join shuffles
    16-byte-ish rows, never text. ``hash_method='md5'`` keeps the
    fingerprint ANSI-replayable for the oracle; the xxhash64 default is the
    cheaper production path (same plan shape).
    """
    if hash_method == "md5":
        def fp(c: Column) -> Column:
            return F.md5(c)
    elif hash_method == "xxhash64":
        def fp(c: Column) -> Column:
            return F.xxhash64(c).cast("string")
    else:
        raise ValueError(f"unknown hash_method {hash_method!r}")

    def norm(c: Column) -> Column:
        if not normalize:
            return c
        return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))

    cur = current.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), fp(norm(F.col(text_col))).alias("fingerprint")
    )
    seen = (
        base.where(F.col(text_col).isNotNull())
        .select(fp(norm(F.col(text_col))).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_base_matches"))
    )
    return cur.join(seen, "fingerprint", "inner").select(
        id_col, "fingerprint", "n_base_matches"
    )
