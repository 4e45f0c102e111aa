"""Shapiro-Wilk opt-in (checks/normality.py, SURVEY A13; reference
data_distribution.py:98-114) — numpy re-derivation of Royston's AS R94
approximation, verified behaviorally: calibration under H0, power against
planted non-normal data, and the reference's skip semantics."""

import numpy as np
import pytest

from ultragendataset_datachecker_spark.checks import normality


def test_norm_ppf_matches_known_quantiles():
    # textbook standard-normal quantiles
    got = normality._norm_ppf(np.array([0.5, 0.975, 0.025, 0.841344746, 0.999]))
    np.testing.assert_allclose(
        got, [0.0, 1.959963985, -1.959963985, 1.0, 3.090232306], atol=1e-7
    )


def test_w_in_unit_interval_and_normal_scores_high():
    rng = np.random.RandomState(1)
    w, p = normality.shapiro_wilk(rng.normal(0, 1, 500))
    assert 0 < w <= 1
    assert w > 0.99
    assert p > 0.01


def test_power_against_nonnormal():
    rng = np.random.RandomState(2)
    w_exp, p_exp = normality.shapiro_wilk(rng.exponential(1.0, 500))
    assert p_exp < 1e-6 and w_exp < 0.95
    w_uni, p_uni = normality.shapiro_wilk(rng.uniform(0, 1, 1000))
    assert p_uni < 1e-3
    # heavier deviation → lower W
    assert w_exp < w_uni


def test_pvalue_calibration_under_h0():
    """Under H0 (normal data) the rejection rate at alpha=0.05 must be near
    0.05 — this pins the Royston p-value approximation, not just W."""
    rng = np.random.RandomState(3)
    rejected = sum(
        normality.shapiro_wilk(rng.normal(0, 1, 100))[1] < 0.05 for _ in range(400)
    )
    assert 0.005 <= rejected / 400 <= 0.12, rejected


def test_outlier_lowers_w():
    rng = np.random.RandomState(4)
    x = rng.normal(0, 1, 200)
    w0, _ = normality.shapiro_wilk(x)
    w1, _ = normality.shapiro_wilk(np.append(x, 25.0))
    assert w1 < w0


def test_bounds_raise():
    with pytest.raises(ValueError):
        normality.shapiro_wilk(np.arange(5))  # n < 12
    with pytest.raises(ValueError):
        normality.shapiro_wilk(np.arange(6000))  # n > 5000 (reference skips too)
    with pytest.raises(ValueError):
        normality.shapiro_wilk(np.full(50, 3.0))  # constant


def test_grouped_shapiro_spark(spark):
    import pandas as pd

    rng = np.random.RandomState(5)
    pdf = pd.concat([
        pd.DataFrame({"part": 0, "v": rng.normal(10, 2, 400)}),
        pd.DataFrame({"part": 1, "v": rng.exponential(1.0, 400)}),
        pd.DataFrame({"part": 2, "v": rng.normal(0, 1, 5)}),  # below min n
    ], ignore_index=True)
    df = spark.createDataFrame(pdf)
    out = {r["part"]: r for r in normality.shapiro_normality(df, "v").collect()}
    assert out[0]["normal"] is True and out[0]["w"] > 0.99
    assert out[1]["normal"] is False and out[1]["p_value"] < 1e-6
    assert out[2]["w"] is None and out[2]["normal"] is None  # reference skip path
    assert out[2]["n_sampled"] == 5

    # partitioning invariance: identical results at different parallelism
    out2 = {
        r["part"]: r
        for r in normality.shapiro_normality(df.repartition(13), "v").collect()
    }
    for part in (0, 1):
        assert out2[part]["w"] == out[part]["w"]
        assert out2[part]["p_value"] == out[part]["p_value"]
