"""Cross-run metric regression vs manifest history (checks/regression.py)."""

import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark import EngineConfig, ValidationEngine
from ultragendataset_datachecker_spark.checkpoint import read_manifest
from ultragendataset_datachecker_spark.checks.regression import metric_regression


@pytest.fixture(scope="module")
def cfg(gen_spec):
    return EngineConfig(
        vocab_size=gen_spec.vocab_size, allowed_sources=tuple(gen_spec.sources)
    )


@pytest.fixture(scope="module")
def history(sequences_df, cfg, tmp_path_factory):
    """Three identical runs under snapshots s1..s3, manifest accumulating."""
    manifest = str(tmp_path_factory.mktemp("reg") / "manifest")
    eng = ValidationEngine(cfg)
    for snap in ("s1", "s2", "s3"):
        eng.run(sequences_df, manifest_path=manifest, snapshot_id=snap, persist=False)
    return manifest


def test_stable_history_produces_no_flags(history, sequences_df, cfg, spark):
    res = ValidationEngine(cfg).run(sequences_df, persist=False)
    reg = metric_regression(
        read_manifest(spark, history), res.metrics, cfg, snapshot_id="s4"
    )
    rows = reg.collect()
    assert rows, "regression frame should cover every (part, metric)"
    assert all(r["flag"] is False for r in rows), [
        (r["part"], r["metric"]) for r in rows if r["flag"]
    ]
    # identical runs: hist stats match the current value
    for r in rows:
        assert r["hist_n"] == 3
        assert r["value"] == pytest.approx(r["hist_mean"], rel=1e-12)


def test_mutated_partition_is_flagged(history, sequences_df, cfg, spark):
    """Drop ~60% of one partition's rows: row_count / token_total regress."""
    target = 2
    mutated = sequences_df.where(
        (F.col("part") != target) | (F.xxhash64("doc_id") % 5 < 2)
    )
    res = ValidationEngine(cfg).run(mutated, persist=False)
    reg = metric_regression(
        read_manifest(spark, history), res.metrics, cfg, snapshot_id="s4"
    )
    flagged = {(r["part"], r["metric"]) for r in reg.collect() if r["flag"]}
    assert (target, "row_count") in flagged
    assert (target, "token_total") in flagged
    assert all(p == target for p, _ in flagged), flagged


def test_min_history_gate_emits_null_flags(sequences_df, cfg, spark, tmp_path):
    """With a single prior run, flags must be NULL (insufficient evidence)."""
    manifest = str(tmp_path / "m1")
    eng = ValidationEngine(cfg)
    eng.run(sequences_df, manifest_path=manifest, snapshot_id="only", persist=False)
    res = ValidationEngine(cfg).run(sequences_df, persist=False)
    reg = metric_regression(
        read_manifest(spark, manifest), res.metrics, cfg, snapshot_id="next",
        min_history=2,
    )
    assert all(r["flag"] is None and r["hist_n"] == 1 for r in reg.collect())


def test_current_snapshot_excluded_from_its_own_baseline(history, sequences_df, cfg, spark):
    """Baselining s3 against history that CONTAINS s3 rows must not use them."""
    res = ValidationEngine(cfg).run(sequences_df, persist=False)
    reg = metric_regression(
        read_manifest(spark, history), res.metrics, cfg, snapshot_id="s3"
    )
    assert all(r["hist_n"] == 2 for r in reg.collect())
