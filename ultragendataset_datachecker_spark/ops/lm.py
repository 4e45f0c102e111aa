"""Corpus n-gram language-model scoring (CCNet-style quality proxy).

Published web-scale pipelines (CCNet, Wenzek et al. 2020; RedPajama; Dolma)
score every document with a small language model trained on a trusted corpus
and filter/bucket by perplexity. This module is the Spark-native analogue
with an add-k-smoothed bigram model — exact, deterministic, and fully
ANSI-replayable so the DuckDB oracle can verify it bit-for-bit (a neural LM
would be neither, and the env has no such libs).

Scale shape:

- TRAIN: one explode of the trusted subset's word stream -> two partial-
  aggregated groupBys (unigrams, bigrams). The model is vocabulary-sized,
  independent of corpus size, and prunable (``min_count``) — at 100 TB the
  trusted subset is a sample and the model still fits in a broadcast.
- SCORE: one explode of the scored corpus joined to the model. The model
  side is broadcast (bounded size), so the corpus NEVER shuffles — the only
  wide exchange is the per-doc re-aggregation of log-probs, keyed by doc_id
  (uniform key, no skew). With a non-broadcastable model, Spark falls back
  to a hash join on the bigram key; AQE handles hot function words.

The per-bigram log-probability is ln((c(w1,w2)+k) / (c(w1)+k*V)) — unseen
bigrams and unseen context words degrade smoothly to the uniform floor.
``avg_logp`` is the mean over a document's bigrams; ``ppx = exp(-avg_logp)``
is the document perplexity under the model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _words(text: Column) -> Column:
    return F.split(F.trim(F.regexp_replace(text, r"\s+", " ")), " ")


def _bigram_stream(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent word pair. Documents with fewer
    than two words contribute nothing (and score NULL downstream)."""
    w = _words(F.col(text_col))
    pairs = F.zip_with(
        F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return df.select(F.col(id_col).alias("_id"), F.explode(pairs).alias("p")).select(
        "_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def train_bigram_lm(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> tuple[DataFrame, DataFrame, int]:
    """Count model from a trusted corpus.

    Returns (unigrams ``(w1, c_uni)``, bigrams ``(w1, w2, c_big)``,
    vocab_size). ``min_count`` prunes rare bigrams to bound model size; the
    unigram table keeps every context word so smoothing denominators stay
    exact. vocab_size is the one scalar collected to the driver.
    """
    w = _words(F.col(text_col))
    toks = df.select(F.explode(w).alias("w1"))
    unigrams = toks.groupBy("w1").agg(F.count(F.lit(1)).alias("c_uni"))
    bigrams = (
        _bigram_stream(df, text_col, df.columns[0])
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_big"))
    )
    if min_count > 1:
        bigrams = bigrams.filter(F.col("c_big") >= min_count)
    vocab_size = unigrams.count()
    return unigrams, bigrams, vocab_size


def score_documents(
    df: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document add-k bigram log-likelihood.

    Output: (id_col, n_bigrams, avg_logp, ppx). Documents with < 2 words get
    n_bigrams=0 and NULL scores. The model side is broadcast by default —
    the corpus-side stream never shuffles on a text key.
    """
    uni = unigrams.select("w1", "c_uni")
    big = bigrams.select("w1", "w2", "c_big")
    if broadcast_model:
        uni, big = F.broadcast(uni), F.broadcast(big)

    stream = _bigram_stream(df, text_col, id_col)
    joined = stream.join(big, ["w1", "w2"], "left").join(uni, ["w1"], "left")
    logp = F.log(
        (F.coalesce(F.col("c_big"), F.lit(0)) + F.lit(float(k)))
        / (F.coalesce(F.col("c_uni"), F.lit(0)) + F.lit(float(k) * vocab_size))
    )
    scored = joined.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.avg(logp).alias("avg_logp")
    )
    base = df.select(F.col(id_col).alias("_id")).distinct()
    return (
        base.join(scored, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.col("avg_logp").cast("double").alias("avg_logp"),
            F.exp(-F.col("avg_logp")).cast("double").alias("ppx"),
        )
    )


def lm_quality_buckets(
    scored: DataFrame, n_buckets: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """CCNet's head/middle/tail split: rank documents by perplexity and cut
    into ``n_buckets`` equal-frequency buckets (1 = lowest perplexity =
    cleanest). Exact ``ntile(n_buckets) OVER (ORDER BY ppx NULLS LAST, id)``
    semantics, bit-replayable by an external SQL engine.

    Distributed exact ntile — the naive unpartitioned ntile window funnels
    the whole scored corpus through ONE task; instead:

      1. range-repartition by the sort key (global order ACROSS partitions),
      2. row_number within each range partition (each task sorts ~1/P of
         the rows),
      3. collect per-partition counts (O(P) rows) -> cumulative offsets,
         broadcast-joined back; global_rank = offset + local rank,
      4. bucket from the closed-form ntile formula on (global_rank, n).

    (ppx, id_col) must be unique per row (id_col is an id), so the global
    rank — and therefore every bucket — is independent of where the range
    partitioner happens to place its boundaries. The scored frame is
    persisted across the two consumptions (counts + output) so the upstream
    scoring pipeline runs once; callers that materialize the result can
    release it via ops.dedup.unpersist_intermediates."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    from ultragendataset_datachecker_spark.ops.dedup import _register_intermediate

    spark = scored.sparkSession
    order = [F.col("ppx").asc_nulls_last(), F.col(id_col).asc()]
    d = (
        scored.repartitionByRange(*order)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = sorted(
        (r["_pid"], r["n"]) for r in
        d.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    n = sum(c for _, c in counts)
    offsets, acc = [], 0
    for pid, c in counts:
        offsets.append((pid, acc))
        acc += c
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")

    w = Window.partitionBy("_pid").orderBy(*order)
    ranked = (
        d.withColumn("_lrn", F.row_number().over(w))
        .join(F.broadcast(off_df), on="_pid", how="left")
        .withColumn("_grn", F.col("_off") + F.col("_lrn"))
    )
    # SQL ntile over n rows / b buckets: q,r = divmod(n,b); buckets 1..r get
    # q+1 rows, buckets r+1..b get q rows
    b = int(n_buckets)
    q, r = divmod(int(n), b)
    big = r * (q + 1)
    if q == 0:  # fewer rows than buckets: row i -> bucket i
        bucket = F.col("_grn")
    else:
        bucket = F.when(
            F.col("_grn") <= big,
            ((F.col("_grn") - 1) - (F.col("_grn") - 1) % (q + 1)) / (q + 1) + 1,
        ).otherwise(
            r + ((F.col("_grn") - big - 1) - (F.col("_grn") - big - 1) % q) / q + 1
        )
    out = ranked.withColumn("lm_bucket", bucket.cast("int")).drop(
        "_pid", "_lrn", "_off", "_grn"
    )
    return _register_intermediate(out, d)
