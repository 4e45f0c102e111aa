"""Deterministic global training-order shuffle, materialized as shards.

Training runs consume the corpus in pseudo-random order; at 10^12 sequences
that order has to be *materialized* (a streaming reader can't seek randomly
into 100 TB), and it has to be deterministic so a preempted run resumes at
the same position. The reference has no analogue (its datasets fit in one
pandas frame and `sample(frac=1)` suffices); this is the beyond-reference
pipeline step that turns a validated corpus into a training-ready layout.

Design (the standard petabyte-shuffle shape):
  * permutation key: md5(seed || doc_id) — content-addressed, so the order
    is stable across runs, partitionings, and engines (the DuckDB oracle
    replays the arithmetic exactly), and a NEW seed (e.g. the epoch number)
    yields an independent permutation without touching the data.
  * shard = u32(hash chars 1-8) mod n_shards — one hash exchange, no
    sampled range boundaries (repartitionByRange samples, which is
    nondeterministic across runs; mod-sharding is pure arithmetic).
  * position within shard = rank by u32(hash chars 9-16) with doc_id as the
    total-order tiebreak — a SECOND, independent slice of the digest, so
    within-shard order does not correlate with shard assignment.

Scale shape: the only shuffle is the hash exchange on ``shard``; the
row_number window sorts WITHIN one shard only, so choosing
``n_shards ≈ corpus_rows / 10^6`` bounds every sort task to ~1M rows
regardless of corpus size. Nothing global is ever sorted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _u32(hex_col, start: int):
    """Uniform u32 from 8 hex chars of an md5 digest (1-based start)."""
    return F.conv(F.substring(hex_col, start, 8), 16, 10).cast("long")


def shuffled_shards(
    df: DataFrame,
    n_shards: int,
    seed: str = "epoch-0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Append ``shard`` (int) and ``pos`` (1-based int within shard) giving a
    deterministic pseudo-random total order: epoch order = shards ascending,
    ``pos`` ascending within each. All original columns are carried through.

    ``seed`` names the permutation — pass the epoch id to get a fresh
    independent order per epoch from the same materialized input.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    clash = {"shard", "pos", "_hd"} & set(df.columns)
    if clash:
        raise ValueError(
            f"shuffled_shards: input already has reserved column(s) {sorted(clash)} "
            "(shard/pos are the outputs, _hd is internal) — rename them first"
        )
    # null ids would hash to a null digest and land in a null shard
    # (__HIVE_DEFAULT_PARTITION__ on write) — fail fast instead, per row,
    # inside codegen (no extra pass)
    checked_id = F.when(
        F.col(id_col).isNull(),
        F.raise_error(F.lit(f"shuffled_shards: null {id_col} — ids must be non-null")),
    ).otherwise(F.col(id_col).cast("string"))
    digest = F.md5(F.concat(F.lit(seed), F.lit("\x1f"), checked_id))
    out = df.withColumn("_hd", digest)
    out = out.withColumn("shard", F.pmod(_u32(F.col("_hd"), 1), F.lit(n_shards)).cast("int"))
    w = Window.partitionBy("shard").orderBy(_u32(F.col("_hd"), 9), F.col(id_col))
    return out.withColumn("pos", F.row_number().over(w)).drop("_hd")


def write_shuffled(
    df: DataFrame,
    path: str,
    n_shards: int,
    seed: str = "epoch-0",
    id_col: str = "doc_id",
) -> None:
    """Materialize the shuffled layout: one directory per shard, rows stored
    in epoch order (``pos`` ascending). A training reader streams shards
    ``shard=0..n_shards-1`` in turn and gets the full deterministic
    permutation with purely sequential I/O.

    Partition count is 4×n_shards: ``repartition(_, "shard")`` HASHES the
    shard value, so at exactly n_shards partitions birthday collisions
    co-locate several shards in one task (2-3× skew on the ~1M-rows-per-
    sort-task bound) while other tasks sit empty. Over-partitioning spreads
    the collisions; each shard value still hashes to exactly ONE partition,
    so every shard directory keeps a single fully-sorted file and the
    epoch-order contract is unchanged (``partitionBy`` owns the directory
    split, not the task layout)."""
    (
        shuffled_shards(df, n_shards, seed=seed, id_col=id_col)
        .repartition(n_shards * 4, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
