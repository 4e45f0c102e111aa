"""Repeated-span detection over token sequences (substring-level dedup).

Document-level dedup (ops/dedup.py) removes whole near-duplicate documents;
what it cannot catch is the boilerplate CASE — the same k-token span
(license header, nav bar, disclaimer) pasted into millions of otherwise
distinct documents. Training-data work removes those at the substring
level ("Deduplicating Training Data Makes Language Models Better", Lee et
al. 2022, arXiv:2107.06499 — their ExactSubstr dedup). The reference
checker (pandas, row-wise) has no counterpart; this is a tokens-payload
add-on over the engine's native input shape (doc_id, tokens:array<int>).

The suffix-array machinery of the paper is a single-machine batch design;
the Spark-native equivalent is a rolling-hash candidate pattern:

  1. `span_hashes` — one map stage (Arrow kernel, no shuffle): every
     k-token window of every document -> (doc_id, pos, span_hash) where
     span_hash is a degree-k polynomial hash in uint64 (wrap-around mod
     2**64). Vectorized: numpy sliding_window_view x coefficient vector,
     no per-token Python.
  2. `repeated_spans` — ONE shuffle on span_hash. Per-hash occurrence
     count + rank; only hashes with >= min_count occurrences survive.
  3. `repeated_span_ranges` — per-doc gaps-and-islands merge of the
     surviving positions into maximal [start,end] token ranges to cut
     (keep_first leaves the globally-first occurrence intact, the paper's
     cut rule).

Scale notes: stage 1 emits ~n_tok rows/doc, so the span_hash shuffle
carries ~(token count) x 24 B — the same order as a tokens-column shuffle
and the irreducible cost of exact substring matching (the suffix array
costs the same memory on one machine). Partial aggregation collapses
same-partition repeats map-side; the post-filter candidate set (duplicated
hashes only) is tiny, and every later stage — rank window, range merge —
runs on candidates, never the corpus. AQE turns the candidate join into a
broadcast when the dup set is small. Hash collisions: 2**-64 per pair;
for a verify-exact variant, re-compare token slices of colliding spans
(not done here — the paper also accepts hash equality).

Determinism: negative token ids wrap to uint64 two's-complement (stable
within Spark); for EXTERNAL replay parity (the driver oracle) ids must be
non-negative so signed/HUGEINT arithmetic agrees — vocab ids always are.
The driver oracle replays the full pipeline in DuckDB bit-for-bit.

`cut_repeated_text_spans` is the text-level wrapper (tokenize words ->
ranges -> rebuild text without the cut words) the curation CLI uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

SPAN_HASH_BASE = 1_000_003
_U64 = 1 << 64


def span_coefficients(k: int) -> list[int]:
    """B^(k-1-j) mod 2**64 for j in 0..k-1 — the polynomial-hash weights.

    Exposed so external replayers (the DuckDB oracle, tests) use the exact
    constants the kernel multiplies with.
    """
    return [pow(SPAN_HASH_BASE, k - 1 - j, _U64) for j in range(k)]


def span_hashes(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """(id, pos, span_hash) for every k-token window of every document.

    ``pos`` is 1-based; ``span_hash`` is the uint64 polynomial hash
    reinterpreted as a signed int64 (bit-identical across engines). One
    Arrow map stage, zero shuffles; documents shorter than ``k`` tokens
    emit nothing.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    import numpy as np
    import pandas as pd

    coeffs = np.array(span_coefficients(k), dtype=np.uint64)
    id_field = df.schema[id_col]
    out_schema = StructType(
        [id_field, StructField("pos", LongType()), StructField("span_hash", LongType())]
    )

    def kernel(batches):
        for pdf in batches:
            ids, poss, hashes = [], [], []
            for did, toks in zip(pdf[id_col], pdf[tokens_col]):
                # pandas renders a NULL id as NaN for numeric dtypes
                if pd.isna(did) or toks is None or len(toks) < k:
                    continue
                # int64 first: negative ids (e.g. xxhash64 tokens) wrap to
                # uint64 two's-complement instead of raising OverflowError
                t = np.asarray(toks, dtype=np.int64).astype(np.uint64)
                w = np.lib.stride_tricks.sliding_window_view(t, k)
                h = (w * coeffs).sum(axis=1, dtype=np.uint64)
                ids.append(np.full(len(h), did, dtype=object))
                poss.append(np.arange(1, len(h) + 1, dtype=np.int64))
                hashes.append(h.view(np.int64))
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: np.concatenate(ids),
                        "pos": np.concatenate(poss),
                        "span_hash": np.concatenate(hashes),
                    }
                )

    return df.select(id_col, tokens_col).mapInPandas(kernel, out_schema)


def repeated_spans(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Occurrences of k-token spans that appear >= min_count times corpus-wide.

    Output: (id, pos, span_hash, n_occurrences, occ_rank) — ``occ_rank`` is
    the 1-based position of this occurrence in (id, pos) order within its
    hash group, so ``occ_rank == 1`` is the globally-first (kept) copy.

    Candidate pattern (the repo's dedup shape): the count aggregate ships
    (hash, partial count) pairs — never occurrence rows — and only hashes
    passing ``min_count`` survive as the candidate set, which AQE broadcasts
    back when small (the normal case: boilerplate is a sliver of all
    spans), so corpus occurrences reach a shuffle only in the final
    candidate-only rank window. A pathologically hot span (one hash in
    millions of docs) concentrates its occurrences in one window task —
    same profile as a hot key in any dedup; cap upstream or pre-filter
    known boilerplate. The kernel is evaluated twice (count side + probe
    side of the self-join); persist :func:`span_hashes` first if the
    source scan dominates the kernel cost.
    """
    hashes = span_hashes(df, tokens_col=tokens_col, id_col=id_col, k=k)
    counts = hashes.groupBy("span_hash").agg(F.count(F.lit(1)).alias("n_occurrences"))
    dup = counts.where(F.col("n_occurrences") >= min_count)
    occ = hashes.join(dup, "span_hash")
    rank_w = Window.partitionBy("span_hash").orderBy(F.col(id_col).asc(), F.col("pos").asc())
    return occ.withColumn("occ_rank", F.row_number().over(rank_w))


def repeated_span_ranges(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
    keep_first: bool = True,
) -> DataFrame:
    """Maximal per-document token ranges covered by repeated spans.

    The cut list: (id, start_pos, end_pos, n_spans) where [start_pos,
    end_pos] (1-based, inclusive) is a maximal run of overlapping/adjacent
    repeated k-spans — the positions a substring-dedup pass would drop.
    ``keep_first`` exempts each span's globally-first occurrence (Lee et
    al.'s rule: every repeated substring keeps exactly one copy).

    The merge is gaps-and-islands over the candidate positions (already
    O(duplicated occurrences)): consecutive pos values extend a run; a gap
    starts a new one; a run of positions [p..q] covers tokens [p..q+k-1].
    """
    occ = repeated_spans(df, tokens_col=tokens_col, id_col=id_col, k=k, min_count=min_count)
    if keep_first:
        occ = occ.where(F.col("occ_rank") > 1)
    w = Window.partitionBy(id_col).orderBy(F.col("pos").asc())
    new_run = F.when(F.lag("pos").over(w) == F.col("pos") - 1, 0).otherwise(1)
    run_id = F.sum(new_run).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        occ.withColumn("_run", run_id)
        .groupBy(id_col, "_run")
        .agg(
            F.min("pos").alias("start_pos"),
            (F.max("pos") + F.lit(k - 1)).alias("end_pos"),
            F.count(F.lit(1)).alias("n_spans"),
        )
        .drop("_run")
    )


def cut_repeated_text_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Remove all-but-first occurrences of repeated k-word spans from text.

    The curation-pipeline form of substring dedup: tokenize each document's
    words (whitespace split, xxhash64 ids — internal, no external-replay
    contract), find maximal repeated ranges via
    :func:`repeated_span_ranges` (keep-first), and rebuild ``text_col``
    without the cut words. All other columns pass through; a
    ``spans_cut`` column counts ranges removed per document (0 for
    untouched docs).

    Plan shape: the range list is O(duplicated occurrences); the rebuild
    explodes words once (shuffle by id to reassemble), anti-joining the cut
    ranges — ``doc_id`` equi-key plus a pos-between predicate, so it stays
    a hash join with a residual filter, never a cartesian.
    """
    words_arr = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = F.transform(words_arr, lambda w: F.xxhash64(w))
    base = df.where(F.col(id_col).isNotNull())
    ranges = repeated_span_ranges(
        base.select(id_col, toks.alias("tokens")),
        id_col=id_col, k=k, min_count=min_count,
    )

    words = base.select(
        id_col, F.posexplode(words_arr).alias("_pos0", "_word")
    ).withColumn("_pos", F.col("_pos0") + 1)
    kept = words.join(
        ranges,
        (words[id_col] == ranges[id_col])
        & (F.col("_pos") >= F.col("start_pos"))
        & (F.col("_pos") <= F.col("end_pos")),
        "left_anti",
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_word"))),
                lambda s: s["_word"],
            ),
            " ",
        ).alias("_new_text")
    )
    n_cut = ranges.groupBy(id_col).agg(F.count(F.lit(1)).alias("spans_cut"))
    out = (
        base.join(rebuilt, id_col, "left")
        .join(n_cut, id_col, "left")
        .withColumn(
            text_col,
            # a doc whose every word was cut vanishes from `kept`: empty text
            F.when(F.col("spans_cut").isNotNull(), F.coalesce("_new_text", F.lit("")))
            .otherwise(F.col(text_col)),
        )
        .withColumn("spans_cut", F.coalesce("spans_cut", F.lit(0)))
        .drop("_new_text")
    )
    return out.select(*df.columns, "spans_cut")
