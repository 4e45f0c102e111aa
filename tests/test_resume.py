"""Checkpoint-manifest resume tests (FIXTURES.md §4, SURVEY §3.2 lifecycle)."""

import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark import EngineConfig, ValidationEngine
from ultragendataset_datachecker_spark.checkpoint import read_manifest, validated_parts


@pytest.fixture()
def cfg(gen_spec):
    return EngineConfig(vocab_size=gen_spec.vocab_size, allowed_sources=tuple(gen_spec.sources))


def test_full_resume_skips_everything(sequences_df, cfg, tmp_path):
    manifest = str(tmp_path / "manifest")
    eng = ValidationEngine(cfg)
    r1 = eng.run(sequences_df, manifest_path=manifest, snapshot_id="snapA", persist=False)
    parts1 = sorted(r["part"] for r in r1.verdicts.where("part >= 0").select("part").collect())
    assert parts1 == [0, 1, 2, 3]

    r2 = eng.run(sequences_df, manifest_path=manifest, snapshot_id="snapA", persist=False)
    assert r2.skipped_parts == (0, 1, 2, 3)
    assert r2.verdicts.where("part >= 0").count() == 0


def test_new_snapshot_revalidates(sequences_df, cfg, tmp_path):
    manifest = str(tmp_path / "manifest")
    eng = ValidationEngine(cfg)
    eng.run(sequences_df, manifest_path=manifest, snapshot_id="snapA", persist=False).verdicts.count()
    r2 = eng.run(sequences_df, manifest_path=manifest, snapshot_id="snapB", persist=False)
    assert r2.skipped_parts == ()
    assert r2.verdicts.where("part >= 0").count() == 4


def test_partial_resume_validates_remaining(sequences_df, cfg, tmp_path):
    manifest = str(tmp_path / "manifest")
    eng = ValidationEngine(cfg)
    # validate only parts 0,1 first
    subset = sequences_df.where(F.col("part") < 2)
    eng.run(subset, manifest_path=manifest, snapshot_id="snapA", persist=False).verdicts.count()
    assert sorted(validated_parts(sequences_df.sparkSession, manifest, "snapA", cfg.check_version)) == [0, 1]

    r2 = eng.run(sequences_df, manifest_path=manifest, snapshot_id="snapA", persist=False)
    assert r2.skipped_parts == (0, 1)
    done = sorted(r["part"] for r in r2.verdicts.where("part >= 0").select("part").collect())
    assert done == [2, 3]
    # manifest now covers all four
    assert sorted(validated_parts(sequences_df.sparkSession, manifest, "snapA", cfg.check_version)) == [0, 1, 2, 3]


def test_manifest_rows_carry_lineage(sequences_df, cfg, tmp_path):
    manifest = str(tmp_path / "manifest")
    ValidationEngine(cfg).run(
        sequences_df, manifest_path=manifest, snapshot_id="snapZ", persist=False
    ).verdicts.count()
    m = read_manifest(sequences_df.sparkSession, manifest)
    rows = {r["part"]: r for r in m.collect()}
    assert set(rows) == {0, 1, 2, 3}
    for r in rows.values():
        assert r["snapshot_id"] == "snapZ"
        assert r["check_versions"]["engine"] == cfg.check_version
        assert r["verdict"] in ("pass", "fail")
        assert r["metrics_json"] and '"row_count"' in r["metrics_json"]
        assert r["validated_at"] is not None


def test_resume_prunes_partitions_at_source(sequences_df, cfg, tmp_path):
    """The resume filter must reach the scan as a partition filter (the table
    is partitioned by `part`), not a post-scan filter."""
    manifest = str(tmp_path / "manifest")
    eng = ValidationEngine(cfg)
    spark = sequences_df.sparkSession
    path = str(tmp_path / "seq_parquet")
    sequences_df.write.mode("overwrite").partitionBy("part").parquet(path)
    disk_df = spark.read.parquet(path)
    eng.run(disk_df.where(F.col("part") < 3), manifest_path=manifest, snapshot_id="s", persist=False).verdicts.count()

    done = validated_parts(spark, manifest, "s", cfg.check_version)
    pruned = disk_df.where(~F.col("part").isin(done))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert pruned.select(F.countDistinct("part")).first()[0] == 1


def test_resume_report_merges_manifest_verdicts(sequences_df, cfg, tmp_path):
    """On a partial resume the report covers ALL partitions: skipped parts'
    durable verdicts come back from the manifest, the partial-global flag
    stays set, and dataset_verdict gates on the full partition set."""
    from ultragendataset_datachecker_spark.report import build_report, render_report_html, summary_text

    manifest = str(tmp_path / "manifest")
    eng = ValidationEngine(cfg)
    subset = sequences_df.where(F.col("part") < 2)
    eng.run(subset, manifest_path=manifest, snapshot_id="snapA", persist=False).verdicts.count()

    r2 = eng.run(sequences_df, manifest_path=manifest, snapshot_id="snapA", persist=False)
    assert r2.skipped_parts == (0, 1)
    m = read_manifest(sequences_df.sparkSession, manifest)
    rep = build_report(r2, "unit", manifest=m, snapshot_id="snapA")

    assert set(rep["partitions"]) == {"0", "1", "2", "3"}
    assert rep["partitions"]["0"]["from_manifest"] is True
    assert rep["partitions"]["2"].get("from_manifest") is None
    assert rep["coverage"]["merged_from_manifest"] == 2
    assert rep["coverage"]["global_is_partial"] is True
    expected = (
        "pass"
        if all(p["verdict"] == "pass" for p in rep["partitions"].values())
        else "fail"
    )
    assert rep["dataset_verdict"] == expected

    txt = summary_text(rep)
    assert "from manifest" in txt and "Dataset verdict" in txt
    html = render_report_html(rep)
    assert "(manifest)" in html


def test_report_without_manifest_has_dataset_verdict(sequences_df, cfg):
    from ultragendataset_datachecker_spark.report import build_report

    res = ValidationEngine(cfg).run(sequences_df, persist=False)
    rep = build_report(res, "unit")
    assert rep["dataset_verdict"] in ("pass", "fail")
    assert "merged_from_manifest" not in rep["coverage"]
