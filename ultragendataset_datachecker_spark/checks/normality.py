"""Shapiro-Wilk normality test (SURVEY A13) — bounded-sample, per group.

The reference calls ``scipy.stats.shapiro`` on every numeric column when
n <= 5000 (/root/reference/dataset_checker/checks/data_distribution.py:98-114)
and skips the test above that — the test itself is only defined for small
samples. The engine's sanctioned at-scale replacement is the KL/PSI drift
check (checks/drift.py), but the reference API surface includes the test, so
this module provides it as an OPT-IN: a numpy re-implementation of the
Royston approximation (Royston 1992, AS R94; the same algorithm scipy wraps),
applied per group to a bounded deterministic sample via applyInPandas.

scipy is not available in this environment, so the W statistic and p-value
are computed from the published method directly:

- expected normal order statistics m_i = Phi^-1((i - 3/8) / (n + 1/4))
  (Blom scores), normalized to the Shapiro-Wilk weight vector with Royston's
  polynomial corrections for the two tail weights;
- W = (sum a_i x_(i))^2 / sum (x_i - mean)^2;
- p-value for n >= 12 from Royston's log-normal approximation of 1 - W.

Restricted to 12 <= n <= 5000 (the reference's own upper bound; below 12 the
small-sample coefficients differ and the reference's tables would be copied,
not derived — callers with fewer rows get W=None like the reference's skip
path).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

SHAPIRO_MAX_N = 5000  # reference skip threshold (data_distribution.py:100)
SHAPIRO_MIN_N = 12    # Royston's large-sample p-value approximation range


def _norm_ppf(p: np.ndarray) -> np.ndarray:
    """Inverse standard-normal CDF (Acklam's rational approximation,
    |relative error| < 1.15e-9 — published coefficients)."""
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    p = np.asarray(p, dtype=np.float64)
    out = np.empty_like(p)
    plow, phigh = 0.02425, 1 - 0.02425

    lo = p < plow
    hi = p > phigh
    mid = ~(lo | hi)

    if mid.any():
        q = p[mid] - 0.5
        r = q * q
        out[mid] = (
            (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q
            / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)
        )
    if lo.any():
        q = np.sqrt(-2 * np.log(p[lo]))
        out[lo] = (
            ((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]
        ) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if hi.any():
        q = np.sqrt(-2 * np.log(1 - p[hi]))
        out[hi] = -(
            ((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]
        ) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    return out


def _norm_sf(z: float) -> float:
    """Standard-normal survival function via erfc."""
    return 0.5 * math.erfc(z / math.sqrt(2.0))


def shapiro_wilk(x: np.ndarray) -> tuple[float, float]:
    """(W, p) for 12 <= len(x) <= 5000 — Royston 1992 approximation.

    Raises ValueError outside the supported range or for constant input.
    """
    x = np.sort(np.asarray(x, dtype=np.float64))
    n = x.size
    if not (SHAPIRO_MIN_N <= n <= SHAPIRO_MAX_N):
        raise ValueError(f"shapiro_wilk supports n in [{SHAPIRO_MIN_N}, {SHAPIRO_MAX_N}], got {n}")
    if x[0] == x[-1]:
        raise ValueError("shapiro_wilk undefined for constant input")

    # Blom scores -> Shapiro-Wilk weights with Royston's tail corrections
    i = np.arange(1, n + 1)
    m = _norm_ppf((i - 0.375) / (n + 0.25))
    mm = float(m @ m)
    c = m / math.sqrt(mm)
    u = 1.0 / math.sqrt(n)
    a_n = (-2.706056 * u**5 + 4.434685 * u**4 - 2.071190 * u**3
           - 0.147981 * u**2 + 0.221157 * u + c[-1])
    a_n1 = (-3.582633 * u**5 + 5.682633 * u**4 - 1.752461 * u**3
            - 0.293762 * u**2 + 0.042981 * u + c[-2])
    phi = (mm - 2 * m[-1] ** 2 - 2 * m[-2] ** 2) / (1 - 2 * a_n**2 - 2 * a_n1**2)
    a = np.empty(n)
    a[2:-2] = m[2:-2] / math.sqrt(phi)
    a[-1], a[-2] = a_n, a_n1
    a[0], a[1] = -a_n, -a_n1

    num = float(a @ x) ** 2
    den = float(((x - x.mean()) ** 2).sum())
    W = num / den

    # Royston's log-normal approximation of 1-W for n >= 12
    ln_n = math.log(n)
    mu = 0.0038915 * ln_n**3 - 0.083751 * ln_n**2 - 0.31082 * ln_n - 1.5861
    sigma = math.exp(0.0030302 * ln_n**2 - 0.082676 * ln_n - 0.4803)
    one_minus_w = max(1.0 - W, 1e-300)
    z = (math.log(one_minus_w) - mu) / sigma
    return float(min(W, 1.0)), float(_norm_sf(z))


def shapiro_normality(
    df: DataFrame,
    value_col: str,
    group_col: str = "part",
    sample_n: int = SHAPIRO_MAX_N,
    alpha: float = 0.05,
    seed: int = 23,
    group_dtype: str = "int",
) -> DataFrame:
    """Opt-in per-group Shapiro-Wilk over a bounded deterministic sample.

    Returns (group_col, n_sampled:long, w:double, p_value:double,
    normal:boolean) — normal = p > alpha, the reference's is_normal flag
    (data_distribution.py:108). Groups with fewer than 12 non-null values get
    nulls (the reference skips the test outside its range rather than
    failing). The sample is the first `sample_n` rows in a seeded
    content-hash order, so results are independent of partitioning and
    arrival order."""
    cap = min(sample_n, SHAPIRO_MAX_N)
    schema = (
        f"{group_col} {group_dtype}, n_sampled long, w double, p_value double, "
        "normal boolean"
    )

    def test(key, pdf):
        vals = pdf[value_col].dropna().to_numpy(dtype=np.float64)
        n_avail = vals.size
        if n_avail > cap:
            # deterministic, order-independent subsample: rank by a seeded
            # hash of the value + position-within-sorted-ties
            order = np.argsort(vals, kind="mergesort")
            svals = vals[order]
            rng = np.random.RandomState(seed)
            pick = rng.choice(n_avail, size=cap, replace=False)
            svals = svals[np.sort(pick)]
        else:
            svals = vals
        row = {group_col: [key[0]], "n_sampled": [int(svals.size)]}
        if svals.size < SHAPIRO_MIN_N or (svals.size and svals.min() == svals.max()):
            row.update({"w": [None], "p_value": [None], "normal": [None]})
        else:
            w, p = shapiro_wilk(svals)
            row.update({"w": [w], "p_value": [p], "normal": [bool(p > alpha)]})
        return pd.DataFrame(row)

    return (
        df.select(group_col, value_col)
        .groupBy(group_col)
        .applyInPandas(test, schema=schema)
    )
