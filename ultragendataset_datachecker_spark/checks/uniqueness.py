"""Key-uniqueness and exact-duplicate detection — the shuffle-bearing checks.

Replaces the reference's O(n²) duplicate pairing
(/root/reference/dataset_checker/checks/duplicates.py:46-63: ``duplicated()``
mask then a nested full scan to find each duplicate's first occurrence) with a
hash shuffle + window: ``row_number() over (partition by key order by <total
order>)`` — occurrences ranked deterministically, everything past rank 1 is a
violation, and ``first(...) over`` supplies the first-occurrence pairing in
the same window (SURVEY A3/A4/W1).

Scale design (10^12 rows): both checks run off the NARROW projection
(prepare.narrow_projection) — the shuffle carries a few scalars per row,
never token arrays. Token-array duplicates use the two independent 64-bit
content hashes (128 bits combined → collision odds ~1e-15 at 10^12 rows);
``cfg.verify_token_dups_exactly`` optionally re-verifies candidate groups
with true array equality via a semi-join back to the fact table — the exact
comparison then touches only actual-duplicate rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.config import EngineConfig
from ultragendataset_datachecker_spark.prepare import H2_SALT


def doc_id_duplicate_violations(narrow: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Violation rows for non-unique doc_id.

    Deterministic keep-first semantics (ref duplicates.py:46 keep='first'):
    the reference's order is row position; a distributed table has no stable
    position, so the engine defines the total order (part, n_tok, content
    hash) — documented contract, stable across parallelism levels.
    Emits one violation per extra occurrence, plus occurrence count.
    """
    base = narrow.where(F.col("doc_id").isNotNull()).select(
        cfg.partition_col, "doc_id", "n_tok", "h1"
    )
    # candidate pattern: a partial-agg groupBy finds the (rare) duplicated
    # keys; the window sort then runs over candidates only. Cheaper than a
    # window over the full table (no full-width shuffle, no global sort) and
    # the candidate join broadcasts under AQE.
    dup_keys = base.groupBy("doc_id").count().where(F.col("count") > 1)
    cand = base.join(dup_keys.withColumnRenamed("count", "_cnt"), on="doc_id", how="inner")
    w = Window.partitionBy("doc_id").orderBy(
        F.col(cfg.partition_col), F.col("n_tok").asc_nulls_last(), F.col("h1").asc_nulls_last()
    )
    ranked = cand.select(
        F.col(cfg.partition_col).alias("part"),
        "doc_id",
        "_cnt",
        F.row_number().over(w).alias("_rn"),
    )
    return ranked.where(F.col("_rn") > 1).select(
        "part",
        "doc_id",
        F.lit("doc_id_duplicate").alias("check_name"),
        F.concat(F.lit("occurrences="), F.col("_cnt").cast("string")).alias("observed"),
        F.lit("unique doc_id").alias("expected"),
    )


def token_duplicate_violations(
    narrow: DataFrame, cfg: EngineConfig, fact: DataFrame | None = None
) -> DataFrame:
    """Violation rows for exact token-array duplicates (content dedup).

    Spark-first replacement for the reference's exact-duplicate path
    (duplicates.py:46-63) under the token-array-equality invariant.
    Empty/null arrays are excluded (they are flagged by their own checks).

    When ``cfg.verify_token_dups_exactly`` and ``fact`` is given, candidate
    groups are re-verified with true array equality (semi-join pulls arrays
    for candidates only). Otherwise the 128-bit hash pair IS the equality.
    """
    base = narrow.where(F.col("h1").isNotNull()).select(
        cfg.partition_col, "doc_id", "h1", "h2"
    )
    # stage 1: hash-pair occurrence counts (map-side partial agg; duplicates
    # are rare so the shuffle output is tiny)
    cand_keys = (
        base.groupBy("h1", "h2").count().where(F.col("count") > 1).select("h1", "h2")
    )

    if cfg.verify_token_dups_exactly and fact is not None:
        # pull candidate rows WITH arrays; AQE broadcasts the (tiny) key set
        tokens = F.col("tokens")
        fact_h = fact.where(tokens.isNotNull() & (F.size(tokens) > 0)).select(
            cfg.partition_col, "doc_id", "tokens",
            F.xxhash64(tokens).alias("h1"),
            F.xxhash64(F.reverse(tokens), F.lit(H2_SALT)).alias("h2"),
        )
        cand_rows = fact_h.join(cand_keys, on=["h1", "h2"], how="left_semi")
        w = Window.partitionBy("h1", "h2").orderBy("doc_id", cfg.partition_col)
        verified = cand_rows.select(
            F.col(cfg.partition_col).alias("part"),
            "doc_id",
            F.row_number().over(w).alias("_rn"),
            F.first("doc_id").over(w).alias("_first_doc"),
            (F.col("tokens") == F.first("tokens").over(w)).alias("_eq"),
        )
        dups = verified.where((F.col("_rn") > 1) & F.col("_eq"))
    else:
        cand_rows = base.join(cand_keys, on=["h1", "h2"], how="left_semi")
        w = Window.partitionBy("h1", "h2").orderBy("doc_id", cfg.partition_col)
        dups = cand_rows.select(
            F.col(cfg.partition_col).alias("part"),
            "doc_id",
            F.row_number().over(w).alias("_rn"),
            F.first("doc_id").over(w).alias("_first_doc"),
        ).where(F.col("_rn") > 1)

    return dups.select(
        "part",
        "doc_id",
        F.lit("duplicate_tokens").alias("check_name"),
        F.concat(F.lit("duplicate_of="), F.col("_first_doc")).alias("observed"),
        F.lit("unique token sequence").alias("expected"),
    )
