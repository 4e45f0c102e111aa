"""KL/PSI drift detection vs a baseline snapshot (FIXTURES.md §3)."""

import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark import EngineConfig, ValidationEngine
from ultragendataset_datachecker_spark.checks.drift import build_baseline, drift_scores, histograms_long


@pytest.fixture(scope="module")
def cfg(gen_spec):
    return EngineConfig(vocab_size=gen_spec.vocab_size, allowed_sources=tuple(gen_spec.sources))


@pytest.fixture(scope="module")
def run(sequences_df, cfg, gen_spec):
    eng = ValidationEngine(cfg)
    first = eng.run(sequences_df, persist=False)
    drifted = gen_spec.drifted_part
    baseline = build_baseline(first.metrics, cfg, "base", exclude_parts=[drifted])
    res = eng.run(sequences_df, baseline=baseline, persist=False)
    return res, drifted


def test_histograms_long_probs_sum_to_one(sequences_df, cfg):
    res = ValidationEngine(cfg).run(sequences_df, persist=False)
    hl = histograms_long(res.metrics, cfg)
    sums = hl.groupBy("part", "check_name").agg(F.sum("prob").alias("s")).collect()
    for r in sums:
        assert r["s"] == pytest.approx(1.0, abs=1e-9), (r["part"], r["check_name"])


def test_drifted_partition_flagged(run):
    res, drifted = run
    flags = {r["part"]: r["drift_flag"] for r in res.verdicts.where("part >= 0").collect()}
    assert flags[drifted] is True
    assert all(v is False for p, v in flags.items() if p != drifted)


def test_psi_magnitudes(run, cfg):
    res, drifted = run
    psis = {(r["part"], r["check_name"]): r["psi"] for r in res.drift.collect()}
    # drifted partition: n_tok shifted by +200 and source mix collapsed
    assert psis[(drifted, "n_tok_hist")] > 1.0
    assert psis[(drifted, "source_hist")] > cfg.psi_fail_threshold
    for (p, c), v in psis.items():
        if p != drifted:
            assert v < cfg.psi_fail_threshold, (p, c, v)


def test_oracle_psi_for_drifted_ntok(run, sequences_pdf, cfg, gen_spec):
    """Independent numpy recomputation of the drifted partition's n_tok PSI."""
    import math

    res, drifted = run
    edges = list(cfg.ntok_bucket_edges)
    labels = ([f"(-inf,{edges[0]})"]
              + [f"[{lo},{hi})" for lo, hi in zip(edges[:-1], edges[1:])]
              + [f"[{edges[-1]},inf)"])

    def hist(pdf):
        counts = dict.fromkeys(labels, 0)
        for v in pdf["n_tok"].dropna():
            if v < edges[0]:
                counts[labels[0]] += 1
                continue
            for lo, hi, lab in zip(edges[:-1], edges[1:], labels[1:-1]):
                if lo <= v < hi:
                    counts[lab] += 1
                    break
            else:
                counts[labels[-1]] += 1
        total = sum(counts.values())
        return {k: v / total for k, v in counts.items()}

    eps = cfg.drift_smoothing_eps
    p = hist(sequences_pdf[sequences_pdf.part == drifted])
    q = hist(sequences_pdf[sequences_pdf.part != drifted])
    exp_psi = sum(
        ((p[k] + eps) - (q[k] + eps)) * math.log((p[k] + eps) / (q[k] + eps)) for k in labels
    )
    got = {r["check_name"]: r["psi"] for r in res.drift.where(F.col("part") == drifted).collect()}
    assert got["n_tok_hist"] == pytest.approx(exp_psi, rel=1e-9)