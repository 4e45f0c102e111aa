"""Isolation-forest multivariate outliers (checks/isoforest.py, SURVEY A18;
reference outliers.py:84-107) — numpy reimplementation of Liu/Ting/Zhou 2008
fitted per partition group via applyInPandas."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.checks import isoforest


def _planted_pdf(part: int, seed: int, n: int = 400, n_out: int = 6):
    rng = np.random.RandomState(seed)
    x = rng.normal(0, 1, (n, 2))
    outs = rng.uniform(8, 12, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    X = np.vstack([x, outs])
    return pd.DataFrame({
        "part": part,
        "doc_id": [f"doc_{part}_{i:06d}" for i in range(len(X))],
        "a": X[:, 0], "b": X[:, 1],
    })


def test_numpy_iforest_separates_planted_outliers():
    pdf = _planted_pdf(0, 3)
    X = pdf[["a", "b"]].to_numpy()
    scores = isoforest.iforest_scores(X, n_trees=100, max_samples=128, seed=5)
    assert scores.shape == (len(pdf),)
    assert np.all((scores > 0) & (scores <= 1))
    planted = set(range(400, 406))
    top = set(np.argsort(-scores)[:6])
    assert top == planted  # far points isolate fastest


def test_grouped_outliers_per_partition(spark):
    pdf = pd.concat([_planted_pdf(0, 3), _planted_pdf(1, 4)], ignore_index=True)
    df = spark.createDataFrame(pdf)
    out = isoforest.isolation_forest_outliers(
        df, ["a", "b"], contamination=0.02, n_trees=100, max_samples=128
    ).toPandas()
    assert set(out["part"]) == {0, 1}
    for part in (0, 1):
        grp = out[out.part == part]
        flagged = set(grp[grp.is_outlier]["doc_id"])
        planted = {f"doc_{part}_{i:06d}" for i in range(400, 406)}
        assert planted <= flagged
        # contamination bounds the flag rate
        assert len(flagged) <= int(len(grp) * 0.02) + 1


def test_deterministic_across_runs(spark):
    pdf = _planted_pdf(0, 9)
    df = spark.createDataFrame(pdf)
    a = isoforest.isolation_forest_outliers(df, ["a", "b"]).toPandas().sort_values("doc_id")
    b = isoforest.isolation_forest_outliers(df, ["a", "b"]).toPandas().sort_values("doc_id")
    np.testing.assert_array_equal(a["score"].to_numpy(), b["score"].to_numpy())


def test_violation_adapter_schema(spark):
    df = spark.createDataFrame(_planted_pdf(2, 1))
    v = isoforest.isolation_forest_violations(df, ["a", "b"], contamination=0.02)
    assert v.columns == ["part", "doc_id", "check_name", "observed", "expected"]
    rows = v.collect()
    assert rows and all(r["check_name"] == "multivariate_outlier_iforest" for r in rows)


def test_null_rows_excluded(spark):
    pdf = _planted_pdf(0, 2)
    pdf.loc[:9, "a"] = None
    df = spark.createDataFrame(pdf)
    out = isoforest.isolation_forest_outliers(df, ["a", "b"]).toPandas()
    assert len(out) == len(pdf) - 10
