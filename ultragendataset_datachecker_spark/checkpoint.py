"""Checkpoint manifest: resumable validation runs.

The Spark generalization of the reference's check → fix → re-check loop
(/root/reference/main.py:117-133 reloads the fixed file and re-runs all
checks): instead of redoing everything, the engine records one manifest row
per validated partition — lineage (snapshot id, check versions), verdict, and
the metrics blob — and a re-run prunes already-validated partitions from the
scan (partition pruning happens at the source because ``part`` is the physical
partition column).

Manifest schema (FIXTURES.md §4):
    part:int, snapshot_id:string, check_versions:map<string,string>,
    verdict:string, metrics_json:string, validated_at:timestamp
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "part int, snapshot_id string, check_versions map<string,string>, "
    "verdict string, metrics_json string, validated_at timestamp"
)


def read_manifest(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def validated_parts(
    spark: SparkSession,
    path: str,
    snapshot_id: str,
    check_version: str,
    only_passed: bool = False,
) -> list[int]:
    """Partitions already validated for this (snapshot, check-version) pair.
    "Validated" means CHECKED, not necessarily passed — failed partitions are
    skipped on re-run too by default (their results are durable; re-checking
    unchanged data cannot flip them). Pass ``only_passed=True``
    (cfg.resume_revalidates_failed) to re-check failures, e.g. after a fix
    pass rewrote the data in place under the same snapshot id.
    Tiny table → collect is safe (one row per partition, not per record)."""
    m = read_manifest(spark, path)
    if m is None:
        return []
    matched = m.where(
        (F.col("snapshot_id") == snapshot_id)
        & (F.element_at(F.col("check_versions"), "engine") == check_version)
    )
    if only_passed:
        # a part counts as validated only if its LATEST manifest row passed
        latest = (
            matched.groupBy("part")
            .agg(F.max_by("verdict", "validated_at").alias("verdict"))
            .where(F.col("verdict") == "pass")
        )
        rows = latest.select("part").collect()
    else:
        rows = matched.select("part").distinct().collect()
    return [r["part"] for r in rows]


def stored_digests(
    spark: SparkSession,
    path: str,
    check_version: str,
    only_passed: bool = False,
) -> DataFrame | None:
    """Latest per-partition content digest recorded in the manifest for this
    engine version, across ALL snapshots — the lookup side of
    ``cfg.resume_by_content``. Returns (part, part_digest) or None when the
    manifest is absent; rows whose metrics_json predates the digest column
    parse to NULL and simply never match (old manifests stay revalidated).

    ``only_passed`` mirrors validated_parts/resume_revalidates_failed: when
    set, a digest only counts if the partition's latest run passed."""
    m = read_manifest(spark, path)
    if m is None:
        return None
    latest = (
        m.where(F.element_at(F.col("check_versions"), "engine") == check_version)
        .groupBy("part")
        .agg(
            F.max_by("metrics_json", "validated_at").alias("metrics_json"),
            F.max_by("verdict", "validated_at").alias("verdict"),
        )
    )
    if only_passed:
        latest = latest.where(F.col("verdict") == "pass")
    return latest.select(
        "part",
        F.from_json("metrics_json", "part_digest decimal(38,0)")["part_digest"].alias(
            "part_digest"
        ),
    ).where(F.col("part_digest").isNotNull())


def write_manifest(
    verdicts: DataFrame,
    metrics: DataFrame,
    path: str,
    snapshot_id: str,
    check_version: str,
    partition_col: str = "part",
) -> None:
    """Append one manifest row per newly-validated partition."""
    metrics_json = metrics.select(
        F.col(partition_col).alias("part"),
        F.to_json(F.struct(*[c for c in metrics.columns if c != partition_col])).alias(
            "metrics_json"
        ),
    )
    rows = (
        verdicts.where(F.col("part") >= 0)
        .select("part", "verdict")
        .join(metrics_json, on="part", how="left")
        .select(
            "part",
            F.lit(snapshot_id).alias("snapshot_id"),
            F.create_map(F.lit("engine"), F.lit(check_version)).alias("check_versions"),
            "verdict",
            "metrics_json",
            F.current_timestamp().alias("validated_at"),
        )
    )
    rows.write.mode("append").parquet(path)
