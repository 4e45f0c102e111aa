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

# ---- KS / W1 / chi2 family (checks/drift.ks_chi2_scores, ecdf_drift) ------

def test_ks_chi2_shapes_and_bounds(run, cfg):
    from ultragendataset_datachecker_spark.checks.drift import ks_chi2_scores, build_baseline

    res, drifted = run
    baseline = build_baseline(res.metrics, cfg, "b")
    out = ks_chi2_scores(res.metrics, baseline, cfg).collect()
    n_buckets = {"n_tok_hist": len(cfg.ntok_bucket_edges) + 1,
                 "source_hist": len(cfg.allowed_sources) + 1}
    seen = set()
    for r in out:
        seen.add(r["check_name"])
        assert r["chi2"] >= 0.0
        assert r["dof"] == n_buckets[r["check_name"]] - 1
        if r["check_name"] == "n_tok_hist":
            assert 0.0 <= r["ks"] <= 1.0
            assert r["w1_buckets"] >= r["ks"]  # W1 sums the gaps KS maxes over
        else:  # categorical: ordered stats are NULL by design
            assert r["ks"] is None and r["w1_buckets"] is None
    assert seen == {"n_tok_hist", "source_hist"}


def test_ks_chi2_flags_the_drifted_partition(run, cfg):
    from ultragendataset_datachecker_spark.checks.drift import ks_chi2_scores, build_baseline

    res, drifted = run
    baseline = build_baseline(res.metrics, cfg, "b", exclude_parts=[drifted])
    rows = ks_chi2_scores(res.metrics, baseline, cfg).where(
        F.col("check_name") == "n_tok_hist").collect()
    ks = {r["part"]: r["ks"] for r in rows}
    chi = {r["part"]: r["chi2"] for r in rows}
    others_ks = max(v for p, v in ks.items() if p != drifted)
    assert ks[drifted] > 5 * others_ks
    assert chi[drifted] > 10 * max(v for p, v in chi.items() if p != drifted)


def test_ks_zero_against_own_distribution(spark, cfg, sequences_df):
    """A single-partition table's global baseline IS its distribution:
    KS and W1 must be exactly 0 and chi2 ~ 0 (eps smoothing only)."""
    from ultragendataset_datachecker_spark.checks.drift import ks_chi2_scores, build_baseline

    one = sequences_df.where(F.col("part") == 0)
    res = ValidationEngine(cfg).run(one, persist=False)
    baseline = build_baseline(res.metrics, cfg, "self")
    rows = ks_chi2_scores(res.metrics, baseline, cfg).collect()
    n_rows = one.count()
    for r in rows:
        if r["check_name"] == "n_tok_hist":
            assert r["ks"] == 0.0 and r["w1_buckets"] == 0.0
        # eps smoothing adds ~n*eps per EMPTY bucket ((0 - n*eps)^2/(n*eps));
        # with o == n*q everywhere the exact chi2 is bounded by n*eps*B
        assert 0.0 <= r["chi2"] <= n_rows * 1e-6 * (r["dof"] + 1) * 1.01


def test_ecdf_drift_matches_numpy_two_sample(spark, sequences_pdf):
    """ecdf_drift vs a direct numpy two-sample computation per group."""
    import numpy as np
    from ultragendataset_datachecker_spark.checks.drift import ecdf_drift

    pdf = sequences_pdf[["source", "n_tok"]].dropna()
    df = spark.createDataFrame(pdf).select(
        "source", F.col("n_tok").cast("int").alias("n_tok"))
    got = {r["source"]: r for r in ecdf_drift(df, "n_tok", "source").collect()}

    pooled_vals = np.sort(pdf["n_tok"].unique())
    pooled = pdf["n_tok"].to_numpy()
    for src, grp in pdf.groupby("source"):
        x = grp["n_tok"].to_numpy()
        cdf_g = np.searchsorted(np.sort(x), pooled_vals, side="right") / len(x)
        cdf_p = np.searchsorted(np.sort(pooled), pooled_vals, side="right") / len(pooled)
        diff = np.abs(cdf_g - cdf_p)
        exp_ks = diff.max()
        exp_w1 = float((diff[:-1] * np.diff(pooled_vals)).sum())
        cnt = {v: c for v, c in zip(*np.unique(x, return_counts=True))}
        pool_cnt = {v: c for v, c in zip(*np.unique(pooled, return_counts=True))}
        e = np.array([len(x) * pool_cnt[v] / len(pooled) for v in pooled_vals])
        o = np.array([cnt.get(v, 0) for v in pooled_vals])
        exp_chi2 = float(((o - e) ** 2 / e).sum())
        r = got[src]
        assert r["ks"] == pytest.approx(exp_ks, rel=1e-12)
        assert r["w1"] == pytest.approx(exp_w1, rel=1e-9)
        assert r["chi2"] == pytest.approx(exp_chi2, rel=1e-9)
        assert r["dof"] == len(pooled_vals) - 1
        assert r["n"] == len(x)


def test_ecdf_drift_two_identity_and_numpy(spark, sequences_pdf):
    """cur == base → ks = w1 = 0 exactly and chi2 within the eps bound;
    a disjoint split cross-checks against direct numpy computation."""
    import numpy as np
    from ultragendataset_datachecker_spark.checks.drift import ecdf_drift_two

    pdf = sequences_pdf[["source", "n_tok"]].dropna()
    df = spark.createDataFrame(pdf).select(
        "source", F.col("n_tok").cast("int").alias("n_tok"))

    same = {r["source"]: r for r in
            ecdf_drift_two(df, df, "n_tok", group_col="source").collect()}
    for src, r in same.items():
        n = int((pdf["source"] == src).sum())
        assert r["ks"] == 0.0 and r["w1"] == 0.0
        assert 0.0 <= r["chi2"] <= n * 1e-6 * (r["dof"] + 1) * 1.01
        assert r["n_cur"] == r["n_base"] == n

    cur_pdf = pdf.iloc[::2]
    base_pdf = pdf.iloc[1::2]
    cur = spark.createDataFrame(cur_pdf).select("source", F.col("n_tok").cast("int").alias("n_tok"))
    base = spark.createDataFrame(base_pdf).select("source", F.col("n_tok").cast("int").alias("n_tok"))
    got = {r["source"]: r for r in
           ecdf_drift_two(cur, base, "n_tok", group_col="source").collect()}
    for src in got:
        x = cur_pdf[cur_pdf["source"] == src]["n_tok"].to_numpy()
        y = base_pdf[base_pdf["source"] == src]["n_tok"].to_numpy()
        vals = np.sort(np.unique(np.concatenate([x, y])))
        cx = np.searchsorted(np.sort(x), vals, side="right") / len(x)
        cy = np.searchsorted(np.sort(y), vals, side="right") / len(y)
        diff = np.abs(cx - cy)
        r = got[src]
        assert r["ks"] == pytest.approx(diff.max(), rel=1e-12)
        assert r["w1"] == pytest.approx(float((diff[:-1] * np.diff(vals)).sum()), rel=1e-9)
        cnt_x = {v: c for v, c in zip(*np.unique(x, return_counts=True))}
        cnt_y = {v: c for v, c in zip(*np.unique(y, return_counts=True))}
        e = np.array([len(x) * (cnt_y.get(v, 0) / len(y) + 1e-6) for v in vals])
        o = np.array([cnt_x.get(v, 0) for v in vals])
        assert r["chi2"] == pytest.approx(float(((o - e) ** 2 / e).sum()), rel=1e-9)
        assert r["n_cur"] == len(x) and r["n_base"] == len(y)
