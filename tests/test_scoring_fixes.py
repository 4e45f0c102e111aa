"""Regression tests for the round-2 correctness fixes:

1. GLOBAL rollup row (part=-1) gets true dataset-wide duplicate/outlier
   counts (previously coalesced to 0 → scores pinned at 1.0).
2. ``max_violation_examples`` caps only the emitted example rows; scores,
   verdicts and reported counts come from the uncapped frame.
3. Balance entropy uses exact value_counts classes (two distinct rogue
   sources are two classes, not one merged ``__other__``).
4. Manifest commit ordering: ``commit_manifest=False`` defers the append
   until ``result.commit_manifest()``.
5. ``resume_revalidates_failed``: failed partitions re-checked on resume.
"""

import math

import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark import EngineConfig, ValidationEngine
from ultragendataset_datachecker_spark import oracle
from ultragendataset_datachecker_spark.checkpoint import read_manifest, validated_parts
from ultragendataset_datachecker_spark.checks.column_stats import GLOBAL_PART


@pytest.fixture(scope="module")
def cfg(gen_spec):
    return EngineConfig(
        vocab_size=gen_spec.vocab_size,
        allowed_sources=tuple(gen_spec.sources),
        exact_quantiles=True,
    )


@pytest.fixture(scope="module")
def result(sequences_df, cfg):
    res = ValidationEngine(cfg).run(sequences_df)
    yield res
    res.unpersist()


def _verdicts(res):
    return {r["part"]: r.asDict() for r in res.verdicts.collect()}


def _counts(res):
    return {
        (r["part"], r["check_name"]): r["n"] for r in res.violation_counts.collect()
    }


def test_global_row_duplicates_score_uses_dataset_totals(result, sequences_pdf):
    """The headline overall_score row must see true dup/outlier totals
    (ADVICE: scoring.py pivot never matched part=-1)."""
    v = _verdicts(result)[GLOBAL_PART]
    n_rows = len(sequences_pdf)
    glob_dups = oracle.duplicate_count_on_tokens(sequences_pdf)
    assert glob_dups > 0, "fixture must plant duplicates"
    assert v["score_duplicates"] == pytest.approx(1.0 - glob_dups / n_rows, rel=1e-9)
    assert v["score_duplicates"] < 1.0


def test_global_row_outliers_score_sums_partition_counts(result):
    """Outlier detection is per-partition by design (per-part bounds); the
    global row aggregates the detected violation total across partitions."""
    counts = _counts(result)
    total_z = sum(n for (p, c), n in counts.items() if c == "ntok_outlier_zscore" and p != GLOBAL_PART)
    assert total_z > 0, "fixture must plant outliers"
    v = _verdicts(result)[GLOBAL_PART]
    n_rows = v["row_count"]
    assert v["score_outliers"] == pytest.approx(1.0 - total_z / n_rows, rel=1e-9)
    assert v["score_outliers"] < 1.0


def test_violation_cap_does_not_change_scores(sequences_df, cfg):
    from dataclasses import replace

    capped_cfg = replace(cfg, max_violation_examples=1)
    full = ValidationEngine(cfg).run(sequences_df, persist=False)
    capped = ValidationEngine(capped_cfg).run(sequences_df, persist=False)

    vf, vc = _verdicts(full), _verdicts(capped)
    assert set(vf) == set(vc)
    for part in vf:
        for k, val in vf[part].items():
            got = vc[part][k]
            if isinstance(val, float):
                assert got == pytest.approx(val, rel=1e-12), (part, k)
            else:
                assert got == val, (part, k)

    # uncapped counts identical; emitted example rows actually capped
    assert _counts(full) == _counts(capped)
    per_pc = (
        capped.violations.groupBy("part", "check_name").count().collect()
    )
    assert per_pc, "violations expected"
    assert all(r["count"] <= 1 for r in per_pc)


def test_balance_entropy_counts_each_rogue_source_as_a_class(spark, cfg):
    """Two distinct disallowed sources must be two entropy classes
    (reference value_counts semantics, data_balance.py:31-58)."""
    import pandas as pd

    rows = []
    for i in range(40):
        src = cfg.allowed_sources[0] if i < 20 else ("rogueA" if i < 30 else "rogueB")
        rows.append(
            {"doc_id": f"doc_{i:010d}", "tokens": [1, 2, 3], "n_tok": 3, "source": src, "part": 0}
        )
    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(pdf).select(
        "doc_id",
        F.col("tokens").cast("array<int>").alias("tokens"),
        F.col("n_tok").cast("int"),
        "source",
        F.col("part").cast("int"),
    )
    res = ValidationEngine(cfg).run(df, persist=False)
    got = _verdicts(res)[0]["score_data_balance"]
    exp = oracle.balance_entropy(pdf["source"])
    # 3 classes (20/10/10), NOT 2 (20/20)
    assert exp != pytest.approx(1.0)
    assert got == pytest.approx(exp, rel=1e-9)


def test_manifest_commit_deferred(sequences_df, cfg, tmp_path):
    manifest = str(tmp_path / "manifest")
    eng = ValidationEngine(cfg)
    res = eng.run(
        sequences_df, manifest_path=manifest, snapshot_id="s1",
        persist=False, commit_manifest=False,
    )
    res.verdicts.count()  # run executed, outputs computed
    assert read_manifest(sequences_df.sparkSession, manifest) is None
    assert res.commit_manifest() is True
    assert sorted(validated_parts(sequences_df.sparkSession, manifest, "s1", cfg.check_version)) == [0, 1, 2, 3]
    assert res.commit_manifest() is False  # idempotent


def test_resume_revalidates_failed_parts(sequences_df, cfg, tmp_path):
    from dataclasses import replace

    manifest = str(tmp_path / "manifest")
    eng = ValidationEngine(cfg)
    r1 = eng.run(sequences_df, manifest_path=manifest, snapshot_id="s1", persist=False)
    verdicts = {r["part"]: r["verdict"] for r in r1.verdicts.where("part >= 0").collect()}
    failed = sorted(p for p, v in verdicts.items() if v == "fail")
    passed = sorted(p for p, v in verdicts.items() if v == "pass")

    # default: everything checked is skipped
    r2 = eng.run(sequences_df, manifest_path=manifest, snapshot_id="s1", persist=False)
    assert sorted(r2.skipped_parts) == sorted(verdicts)

    # revalidate-failed mode: only passing parts are skipped
    eng_rv = ValidationEngine(replace(cfg, resume_revalidates_failed=True))
    r3 = eng_rv.run(sequences_df, manifest_path=manifest, snapshot_id="s1", persist=False)
    assert sorted(r3.skipped_parts) == passed
    redone = sorted(r["part"] for r in r3.verdicts.where("part >= 0").select("part").collect())
    assert redone == failed


def test_report_counts_uncapped_and_partial_flag(sequences_df, cfg, tmp_path):
    from dataclasses import replace

    from ultragendataset_datachecker_spark.report import build_report, summary_text

    capped_cfg = replace(cfg, max_violation_examples=1)
    res = ValidationEngine(capped_cfg).run(sequences_df, persist=False)
    rep = build_report(res)
    assert rep["coverage"]["global_is_partial"] is False
    # reported counts must exceed the cap where defects are planted
    assert any(v > 1 for v in rep["violation_counts"].values())

    # resumed run → global flagged partial
    manifest = str(tmp_path / "manifest")
    eng = ValidationEngine(cfg)
    eng.run(
        sequences_df.where(F.col("part") < 2), manifest_path=manifest,
        snapshot_id="s", persist=False,
    )
    r2 = eng.run(sequences_df, manifest_path=manifest, snapshot_id="s", persist=False)
    rep2 = build_report(r2)
    assert rep2["coverage"]["global_is_partial"] is True
    assert "PARTIAL" in summary_text(rep2)
    assert not math.isnan(rep2["overall_score"])


def test_balance_entropy_exact_with_custom_dimension(spark, cfg):
    """A caller-supplied referential dimension that disagrees with
    cfg.allowed_sources must not corrupt the entropy: the fast path (rogue
    counts from violation rows) only applies to the default dimension, and
    the fallback recomputes rogue counts from the corpus — entropy is
    value_counts-exact either way."""
    import pandas as pd

    rows = []
    for i in range(60):
        src = cfg.allowed_sources[0] if i < 30 else ("rogueA" if i < 45 else "rogueB")
        rows.append(
            {"doc_id": f"doc_{i:010d}", "tokens": [1, 2, 3], "n_tok": 3,
             "source": src, "part": 0}
        )
    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(pdf).select(
        "doc_id",
        F.col("tokens").cast("array<int>").alias("tokens"),
        F.col("n_tok").cast("int"),
        "source",
        F.col("part").cast("int"),
    )
    # dimension deliberately different from cfg.allowed_sources: it admits
    # rogueA (so rogueA emits NO rogue_source violations) and omits the
    # allowed source
    dim = spark.createDataFrame(
        pd.DataFrame({"source": ["rogueA"]})
    )
    res = ValidationEngine(cfg).run(df, allowed_sources=dim, persist=False)
    got = _verdicts(res)[0]["score_data_balance"]
    exp = oracle.balance_entropy(pdf["source"])
    assert got == pytest.approx(exp, rel=1e-9)


def test_hot_duplicate_key_no_window(spark, cfg):
    """Skew hardening: a single doc_id (and one content hash) duplicated en
    masse must flow through the window-free aggregate path — correct counts,
    correct occurrence labels, and no per-key serialization. 50k copies keeps
    the test fast; the shape is what matters (the aggregates are partial-agg
    so the hot key collapses per task)."""
    import pandas as pd

    n_hot = 50_000
    rows = [
        {"doc_id": "doc_0000000001", "tokens": [7, 8, 9], "n_tok": 3,
         "source": cfg.allowed_sources[0], "part": i % 4}
        for i in range(n_hot)
    ]
    rows.append(
        {"doc_id": "doc_0000000002", "tokens": [1, 2, 3], "n_tok": 3,
         "source": cfg.allowed_sources[0], "part": 0}
    )
    df = spark.createDataFrame(pd.DataFrame(rows)).select(
        "doc_id",
        F.col("tokens").cast("array<int>").alias("tokens"),
        F.col("n_tok").cast("int"),
        "source",
        F.col("part").cast("int"),
    )
    res = ValidationEngine(cfg).run(df, persist=False)
    vc = {
        r["check_name"]: r["n"]
        for r in res.violation_counts.groupBy("check_name")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    # all copies except the single first occurrence are violations
    assert vc["doc_id_duplicate"] == n_hot - 1
    assert vc["duplicate_tokens"] == n_hot - 1
    obs = (
        res.violations.where(F.col("check_name") == "doc_id_duplicate")
        .select("observed").distinct().collect()
    )
    assert [r["observed"] for r in obs] == [f"occurrences={n_hot}"]
