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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .quality import _word_ngrams, _words


def _distinct_grams(text: Column, n: int) -> Column:
    return F.array_distinct(_word_ngrams(_words(text), n))


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
        benchmark.select(F.explode(_distinct_grams(F.col(text_col), n)).alias("gram"))
        .select(key(F.col("gram")).alias("gram_key"))
        .distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(_distinct_grams(F.col(text_col), n)).alias("gram")
    ).select(id_col, key(F.col("gram")).alias("gram_key"))

    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram_key")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_shared_ngrams"))
    )
