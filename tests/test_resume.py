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


# ---- content-addressed resume (cfg.resume_by_content) ---------------------


@pytest.fixture()
def content_cfg(gen_spec):
    return EngineConfig(
        vocab_size=gen_spec.vocab_size,
        allowed_sources=tuple(gen_spec.sources),
        resume_by_content=True,
    )


def test_unchanged_content_skips_across_snapshots(sequences_df, content_cfg, tmp_path):
    """A NEW snapshot id over IDENTICAL data skips every partition when
    resume_by_content is on (test_new_snapshot_revalidates shows the default
    revalidates)."""
    manifest = str(tmp_path / "manifest")
    eng = ValidationEngine(content_cfg)
    eng.run(sequences_df, manifest_path=manifest, snapshot_id="snapA", persist=False).verdicts.count()
    r2 = eng.run(sequences_df, manifest_path=manifest, snapshot_id="snapB", persist=False)
    assert r2.skipped_parts == (0, 1, 2, 3)
    assert r2.verdicts.where("part >= 0").count() == 0


def test_changed_partition_revalidated_others_skipped(sequences_df, content_cfg, tmp_path):
    """Drop one row from part 2 under a new snapshot: ONLY part 2 re-runs."""
    manifest = str(tmp_path / "manifest")
    eng = ValidationEngine(content_cfg)
    eng.run(sequences_df, manifest_path=manifest, snapshot_id="snapA", persist=False).verdicts.count()

    victim = sequences_df.where("part = 2 AND doc_id IS NOT NULL").select("doc_id").first()["doc_id"]
    mutated = sequences_df.where(
        (F.col("part") != 2) | F.col("doc_id").isNull() | (F.col("doc_id") != victim)
    )
    r2 = eng.run(mutated, manifest_path=manifest, snapshot_id="snapB", persist=False)
    assert r2.skipped_parts == (0, 1, 3)
    done = [r["part"] for r in r2.verdicts.where("part >= 0").select("part").collect()]
    assert done == [2]


def test_digest_prepass_never_reads_tokens(sequences_df, content_cfg, tmp_path):
    """The digest pre-pass must be a column-pruned scan: with
    digest_include_tokens=False its ReadSchema excludes the tokens column."""
    from ultragendataset_datachecker_spark.prepare import row_digest_expr

    spark = sequences_df.sparkSession
    path = str(tmp_path / "seq_parquet")
    sequences_df.write.mode("overwrite").partitionBy("part").parquet(path)
    disk_df = spark.read.parquet(path)
    cur = disk_df.groupBy("part").agg(F.sum(row_digest_expr(False)).alias("part_digest"))
    plan = cur._jdf.queryExecution().executedPlan().toString()
    import re
    read_schema = re.search(r"ReadSchema: ([^\n]*)", plan).group(1)
    assert "tokens" not in read_schema, read_schema
    assert "doc_id" in read_schema and "n_tok" in read_schema


def test_scalar_digest_misses_token_edit_full_digest_catches_it(
    sequences_df, gen_spec, tmp_path
):
    """Documented tradeoff: a token mutation that preserves (doc_id, n_tok,
    source) is invisible to the scalar digest but caught when
    digest_include_tokens=True."""
    mutated = sequences_df.withColumn(
        "tokens",
        F.when(
            (F.col("part") == 1) & F.col("tokens").isNotNull() & (F.size("tokens") > 0),
            F.concat(F.slice(F.reverse("tokens"), 1, F.greatest(F.size("tokens") - 1, F.lit(1))),
                     F.slice("tokens", 1, 1)),
        ).otherwise(F.col("tokens")),
    )
    base = dict(vocab_size=gen_spec.vocab_size, allowed_sources=tuple(gen_spec.sources),
                resume_by_content=True)

    for include, expect_skipped in ((False, (0, 1, 2, 3)), (True, (0, 2, 3))):
        manifest = str(tmp_path / f"manifest_{include}")
        eng = ValidationEngine(EngineConfig(digest_include_tokens=include, **base))
        eng.run(sequences_df, manifest_path=manifest, snapshot_id="sA", persist=False).verdicts.count()
        r2 = eng.run(mutated, manifest_path=manifest, snapshot_id="sB", persist=False)
        assert r2.skipped_parts == expect_skipped, f"include_tokens={include}"


def test_old_manifest_without_digest_just_revalidates(sequences_df, cfg, content_cfg, tmp_path):
    """Manifest rows written before the digest column existed parse to NULL
    digests: content resume degrades to revalidation, never a false skip."""
    import json

    manifest = str(tmp_path / "manifest")
    ValidationEngine(cfg).run(
        sequences_df, manifest_path=manifest, snapshot_id="sA", persist=False
    ).verdicts.count()
    spark = sequences_df.sparkSession
    # strip part_digest from the stored metrics blobs (simulate an old run)
    m = read_manifest(spark, manifest).toPandas()
    m["metrics_json"] = m["metrics_json"].map(
        lambda s: json.dumps({k: v for k, v in json.loads(s).items() if k != "part_digest"})
    )
    from ultragendataset_datachecker_spark.checkpoint import MANIFEST_SCHEMA

    spark.createDataFrame(m, schema=MANIFEST_SCHEMA).write.mode("overwrite").parquet(manifest)

    r2 = ValidationEngine(content_cfg).run(
        sequences_df, manifest_path=manifest, snapshot_id="sB", persist=False
    )
    assert r2.skipped_parts == ()
    assert r2.verdicts.where("part >= 0").count() == 4
