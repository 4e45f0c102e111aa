"""Sequence packing — assign documents to fixed-token-budget packs, the
standard pre-training data op (concatenate the corpus, emit one training
sequence per `budget` tokens; Raffel et al. 2020 §2.2, GPT-style pipelines).

Determinism contract: packing must be reproducible across runs, partitionings
and engines, so the stream order is content-derived (bucket by id, order by
md5(id) within bucket — same keys the stratified sampler uses), never
physical row order.

Two strategies:

- ``chunk`` (default): model the concatenate-then-chunk pipeline exactly —
  a document belongs to the pack where its FIRST token lands:
  ``pack_id = floor(prefix_sum_before / budget)``. Pure window cumsum,
  SQL-expressible (the DuckDB oracle replays it), documents may straddle
  pack boundaries exactly as the real concat pipeline's sequences do.
- ``greedy``: no straddling — close the pack when the next document would
  overflow the budget (a document larger than the budget gets its own
  pack). This is a sequential recurrence, not a cumsum, so it runs as an
  applyInPandas kernel per bucket; verified against a python reference.

Scale shape: ONE shuffle by bucket, then a per-bucket sort (chunk: window
cumsum; greedy: kernel). ``num_buckets`` bounds every sort/kernel partition
to corpus_size/buckets regardless of total scale — packing is
embarrassingly parallel across buckets by construction, which is how real
pipelines shard it (each worker packs its own shard of the stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_documents(
    df: DataFrame,
    size_col: str,
    budget: int,
    id_col: str = "doc_id",
    num_buckets: int = 16,
    strategy: str = "chunk",
    bucket_expr=None,
) -> DataFrame:
    """Returns (id_col, size_col, bucket, pack_id, pack_offset).

    pack_id is local to its bucket; (bucket, pack_id) is the pack key.
    pack_offset is the document's starting token offset within its pack.
    ``bucket_expr`` overrides the default xxhash64 bucketing Column (e.g.
    ``pmod(doc_id, k)`` when an external system must replay the sharding —
    xxhash64 is JVM-only).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if size_col == id_col:
        raise ValueError("size_col must differ from id_col")
    if bucket_expr is not None:
        bucket = bucket_expr
    elif num_buckets > 1:
        bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_buckets))
    else:
        bucket = F.lit(0)
    # cross-engine deterministic stream order within the bucket
    okey = F.md5(F.col(id_col).cast("string"))
    # NULL-size docs have no defined token footprint — excluded from packing
    # rather than silently treated as 0 (callers impute or drop them first)
    base = df.where(F.col(size_col).isNotNull()).select(
        F.col(id_col),
        F.col(size_col).cast("long").alias("_sz"),
        bucket.cast("int").alias("bucket"),
        okey.alias("_okey"),
    )

    if strategy == "chunk":
        w = Window.partitionBy("bucket").orderBy("_okey", id_col)
        before = F.coalesce(
            F.sum("_sz").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        )
        return base.select(
            id_col,
            F.col("_sz").alias(size_col),
            "bucket",
            F.floor(before / budget).cast("long").alias("pack_id"),
            (before - F.floor(before / budget) * budget).cast("long").alias("pack_offset"),
        )

    if strategy != "greedy":
        raise ValueError(f"strategy must be 'chunk' or 'greedy', got {strategy!r}")

    out_schema = (
        f"{id_col} long, {size_col} long, bucket int, pack_id long, pack_offset long"
    )

    def kernel(pdf):
        pdf = pdf.sort_values(["_okey", id_col], kind="mergesort")
        packs, offsets = [], []
        pack, fill = 0, 0
        for sz in pdf["_sz"]:
            if fill > 0 and fill + sz > budget:
                pack += 1
                fill = 0
            packs.append(pack)
            offsets.append(fill)
            fill += sz
        pdf = pdf.assign(pack_id=packs, pack_offset=offsets)
        return pdf[[id_col, "_sz", "bucket", "pack_id", "pack_offset"]].rename(
            columns={"_sz": size_col}
        )

    return base.groupBy("bucket").applyInPandas(kernel, out_schema)


def sliding_chunks(
    df: DataFrame,
    tokens_col: str,
    id_col: str = "doc_id",
    size: int = 512,
    stride: int | None = None,
    min_tail: int = 1,
) -> DataFrame:
    """Split each document's token array into fixed-size training chunks with
    optional overlap — the per-document counterpart of ``pack_documents``
    (long-context pipelines chunk WITH stride so no span is only ever seen
    truncated; stride < size gives overlapping windows).

    Chunk plan per document of n tokens: starts 0, stride, 2·stride, … while
    start < n; chunk_len = min(size, n − start); trailing chunks shorter
    than ``min_tail`` are dropped UNLESS they are the document's only chunk
    (a short document still yields one chunk). Empty/NULL arrays yield no
    chunks.

    Scale shape: ``posexplode`` over an arithmetically-generated index
    sequence + ``slice`` — pure per-row JVM codegen, ZERO shuffles; output
    size is corpus_tokens/stride rows, produced streaming per input split.

    Returns (id_col, chunk_idx, start, chunk_len, chunk). ``start`` is
    0-based; ``chunk`` is the sliced token array.
    """
    if size <= 0:
        raise ValueError("size must be positive")
    stride = size if stride is None else stride
    if stride <= 0:
        raise ValueError("stride must be positive")
    toks = F.col(tokens_col)
    n = F.size(toks)
    n_chunks = F.when(n > 0, F.floor((n - 1) / stride) + 1).otherwise(F.lit(0))
    idx = F.sequence(F.lit(0), n_chunks - 1)
    exploded = df.where(toks.isNotNull() & (n > 0)).select(
        F.col(id_col),
        n.alias("_n"),
        toks.alias("_toks"),
        F.posexplode(idx).alias("chunk_idx", "_k"),
    )
    start = F.col("_k") * stride
    chunk_len = F.least(F.lit(size), F.col("_n") - start)
    return (
        exploded.select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            start.cast("int").alias("start"),
            chunk_len.cast("int").alias("chunk_len"),
            F.slice(F.col("_toks"), start + 1, chunk_len).alias("chunk"),
        )
        # keep sub-min_tail tails only when they are the document's chunk 0
        .where((F.col("chunk_len") >= min_tail) | (F.col("chunk_idx") == 0))
    )


def length_bucket_stats(
    df: DataFrame,
    len_col: str = "n_tok",
    group_col: str | None = None,
    max_bucket: int = 1 << 20,
) -> DataFrame:
    """Power-of-two length bucketing with padding-efficiency accounting.

    Batch schedulers group sequences into length buckets and pad each batch
    to the bucket ceiling; the padding fraction is wasted compute. This op
    assigns ``bucket = 2^ceil(log2(len))`` (len<=1 -> 1) and reports, per
    bucket (optionally per group): sequence count, token sum, padded token
    sum (count * bucket ceiling), and ``pad_frac`` = wasted/padded.

    One partial-aggregated groupBy; the shuffle carries O(groups x ~40
    buckets) rows. Integer-exact except the final ratio, so the DuckDB
    oracle replays it verbatim.
    """
    ln = F.col(len_col).cast("long")
    bucket = F.when(ln <= 1, F.lit(1)).otherwise(
        F.pow(F.lit(2.0), F.ceil(F.log2(ln.cast("double")))).cast("long")
    )
    bucket = F.least(bucket, F.lit(int(max_bucket)))
    keys = ([group_col] if group_col else []) + ["bucket"]
    return (
        df.where(ln.isNotNull() & (ln > 0))
        .withColumn("bucket", bucket)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum(ln).alias("n_tokens"),
        )
        .withColumn("n_padded", (F.col("n_seqs") * F.col("bucket")).cast("long"))
        .withColumn(
            "pad_frac",
            ((F.col("n_padded") - F.col("n_tokens"))
             / F.col("n_padded")).cast("double"),
        )
    )
