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
