"""Key-uniqueness and exact-duplicate detection — the shuffle-bearing checks.

Replaces the reference's O(n²) duplicate pairing
(/root/reference/dataset_checker/checks/duplicates.py:46-63: ``duplicated()``
mask then a nested full scan to find each duplicate's first occurrence) with a
hash shuffle + window: ``row_number() over (partition by key order by <total
order>)`` — occurrences ranked deterministically, everything past rank 1 is a
violation, and ``min(...) over`` supplies the first-occurrence pairing in the
same window (SURVEY A3/A4/W1).

Scale design (10^12 rows):
- **doc_id uniqueness** shuffles only a narrow (part, doc_id, tiebreak)
  projection — never the token arrays.
- **token-array duplicates** (the token-array-equality invariant) never
  shuffle arrays either: a first narrow pass shuffles two independent 64-bit
  hashes of the array (128 bits total → collision-free in practice, verified
  exactly afterwards); only rows whose hash pair collides (actual duplicates +
  ~0 false pairs) are pulled with their arrays via a semi-join and verified
  with true array equality, so the expensive exact comparison runs on a
  vanishingly small candidate set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.config import EngineConfig


def _tok_hashes(df: DataFrame) -> DataFrame:
    """Two independent 64-bit content hashes of the token array."""
    return df.withColumn("_h1", F.xxhash64("tokens")).withColumn(
        "_h2", F.xxhash64(F.reverse(F.col("tokens")), F.lit(0x9E3779B9))
    )


def doc_id_duplicate_violations(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Violation rows for non-unique doc_id.

    Deterministic keep-first semantics (ref duplicates.py:46 keep='first'):
    the reference's order is row position; a distributed table has no stable
    position, so the engine defines the total order (part, n_tok, tokens-hash)
    — documented contract, stable across parallelism levels.
    Emits one violation per extra occurrence, plus occurrence count.
    """
    narrow = df.where(F.col("doc_id").isNotNull()).select(
        cfg.partition_col, "doc_id", "n_tok", F.xxhash64("tokens").alias("_th")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col(cfg.partition_col), F.col("n_tok").asc_nulls_last(), F.col("_th")
    )
    wall = Window.partitionBy("doc_id")
    ranked = narrow.select(
        F.col(cfg.partition_col).alias("part"),
        "doc_id",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wall).alias("_cnt"),
    )
    return ranked.where(F.col("_rn") > 1).select(
        "part",
        "doc_id",
        F.lit("doc_id_duplicate").alias("check_name"),
        F.concat(F.lit("occurrences="), F.col("_cnt").cast("string")).alias("observed"),
        F.lit("unique doc_id").alias("expected"),
    )


def token_duplicate_violations(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Violation rows for exact token-array duplicates (content dedup).

    Spark-first replacement for the reference's exact-duplicate path
    (duplicates.py:46-63) under the token-array-equality invariant.
    Empty/null arrays are excluded (they are flagged by their own checks).
    """
    base = df.where(F.col("tokens").isNotNull() & (F.size("tokens") > 0))
    narrow = _tok_hashes(base.select(cfg.partition_col, "doc_id", "tokens")).select(
        cfg.partition_col, "doc_id", "_h1", "_h2"
    )
    # stage 1: hash-pair occurrence counts (shuffles 3 longs per row; heavy
    # partial agg — duplicates are rare so the shuffle output is tiny)
    cand_keys = (
        narrow.groupBy("_h1", "_h2").count().where(F.col("count") > 1).select("_h1", "_h2")
    )
    # stage 2: pull candidate rows WITH arrays and verify true equality.
    # AQE turns this into a broadcast join when the candidate set is small.
    cand_rows = _tok_hashes(base).join(cand_keys, on=["_h1", "_h2"], how="left_semi")
    w = Window.partitionBy("_h1", "_h2").orderBy("doc_id", cfg.partition_col)
    verified = cand_rows.select(
        F.col(cfg.partition_col).alias("part"),
        "doc_id",
        "tokens",
        "_h1",
        "_h2",
        F.row_number().over(w).alias("_rn"),
        F.first("tokens").over(w).alias("_first_tokens"),
        F.first("doc_id").over(w).alias("_first_doc"),
    )
    return verified.where(
        (F.col("_rn") > 1) & (F.col("tokens") == F.col("_first_tokens"))
    ).select(
        "part",
        "doc_id",
        F.lit("duplicate_tokens").alias("check_name"),
        F.concat(F.lit("duplicate_of="), F.col("_first_doc")).alias("observed"),
        F.lit("unique token sequence").alias("expected"),
    )
