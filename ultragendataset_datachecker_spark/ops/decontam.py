"""Benchmark decontamination — flag training documents that share word
n-grams with a held-out evaluation/benchmark set.

The standard LLM-pipeline hygiene step (GPT-3 used 13-gram overlap, PaLM and
Llama use similar windows): any training document containing an n-gram that
also appears in a benchmark document is flagged as contaminated so it can be
dropped or audited before training.

Scale shape (the part that matters at 100 TB):

- the BENCHMARK side is small (eval sets are MBs, not TBs) — its distinct
  n-grams are collected into a broadcast hash relation, so the corpus side
  is matched map-side with ZERO corpus shuffle;
- the corpus side explodes per-document DISTINCT n-grams (array_distinct
  before explode bounds the fan-out to unique grams) and streams through the
  broadcast join; only MATCHED rows — a tiny fraction — reach the final
  groupBy(doc_id), so the one shuffle in the plan is O(contaminated grams),
  not O(corpus tokens);
- with ``hash_grams=True`` the join key is xxhash64(gram) (8 bytes instead
  of the gram string), shrinking the broadcast and the exploded rows; the
  plain-string variant exists for cross-engine oracle parity (DuckDB has no
  xxhash64).

Beyond-reference operator (the reference has no notion of a benchmark set);
complements ops/dedup.py which dedups the corpus against itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .quality import _words


def _distinct_gram_rows(
    df: DataFrame, text_col: str, id_cols: list[str], n: int
) -> DataFrame:
    """(id_cols..., gram) rows — per-document DISTINCT space-joined word
    n-grams. Uses pyspark.ml.feature.NGram (compiled Scala) for the gram
    build: the equivalent transform(sequence, concat_ws) HOF is interpreted
    one closure call per element and measured ~27x slower on the same input
    (11.0s vs 0.4s for 5k docs / 256k grams at local[32])."""
    from pyspark.ml.feature import NGram

    w = df.where(F.col(text_col).isNotNull()).select(
        *id_cols, _words(F.col(text_col)).alias("_w")
    )
    g = NGram(n=n, inputCol="_w", outputCol="_g").transform(w)
    return g.select(*id_cols, F.explode(F.array_distinct("_g")).alias("gram"))


def flag_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    hash_grams: bool = True,
) -> DataFrame:
    """Return (id_col, n_shared_ngrams) for every corpus document sharing at
    least one word n-gram with any benchmark document.

    n_shared_ngrams counts DISTINCT grams of the document that occur anywhere
    in the benchmark set. Documents with zero overlap are absent (callers
    left-anti-join to drop contaminated docs, or left-join to annotate).
    """
    key = (lambda c: F.xxhash64(c)) if hash_grams else (lambda c: c)

    bench_grams = (
        _distinct_gram_rows(benchmark, text_col, [], n)
        .select(key(F.col("gram")).alias("gram_key"))
        .distinct()
    )
    corpus_grams = _distinct_gram_rows(corpus, text_col, [id_col], n).select(
        id_col, key(F.col("gram")).alias("gram_key")
    )

    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram_key")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_shared_ngrams"))
    )
