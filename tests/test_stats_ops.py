"""Tests for the round-3 statistics/profiling operators: one-pass correlation
matrix, mutual information, functional-dependency discovery, Zipf fit,
sliding-window chunking, and per-group embedding covariance — each verified
against an independent numpy/python reference on the same data."""

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from ultragendataset_datachecker_spark.ops.packing import sliding_chunks
from ultragendataset_datachecker_spark.ops.profile import (
    correlation_matrix,
    functional_dependencies,
    mutual_information,
)
from ultragendataset_datachecker_spark.ops.similarity import group_covariance, group_covariance_full
from ultragendataset_datachecker_spark.ops.textstats import zipf_fit


# ---- correlation_matrix ----------------------------------------------------

def test_corr_matrix_vs_numpy(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(size=400)
    y = 2.0 * x + rng.normal(scale=0.5, size=400)
    z = rng.normal(size=400)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double",
    )
    got = {
        (r["col_x"], r["col_y"]): (r["corr"], r["n"])
        for r in correlation_matrix(df, ["x", "y", "z"], round_dp=9).collect()
    }
    assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}
    cols = {"x": x, "y": y, "z": z}
    for (a, b), (corr, n) in got.items():
        ref = np.corrcoef(cols[a], cols[b])[0, 1]
        assert n == 400
        assert corr == pytest.approx(ref, abs=1e-6)
    assert got[("x", "y")][0] > 0.9


def test_corr_matrix_null_pair_count(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, None), (None, 3.0), (4.0, 4.0), (5.0, 5.0)],
        "a double, b double",
    )
    row = correlation_matrix(df, ["a", "b"]).collect()[0]
    # n counts rows where BOTH are non-null — what corr actually consumed
    assert row["n"] == 3
    assert row["corr"] == pytest.approx(1.0, abs=1e-9)


# ---- mutual_information ----------------------------------------------------

def _mi_reference(pairs):
    from collections import Counter

    n = len(pairs)
    cxy, cx, cy = Counter(pairs), Counter(p[0] for p in pairs), Counter(p[1] for p in pairs)
    return sum(
        (c / n) * math.log2(c * n / (cx[x] * cy[y])) for (x, y), c in cxy.items()
    )


def test_mutual_information_vs_python(spark):
    rng = np.random.default_rng(3)
    xs = rng.choice(["a", "b", "c"], size=600)
    # y depends on x for half the rows -> MI strictly between 0 and H(X)
    ys = np.where(rng.random(600) < 0.5, xs, rng.choice(["a", "b", "c"], size=600))
    pairs = list(zip(xs.tolist(), ys.tolist()))
    df = spark.createDataFrame(pairs, "x string, y string")
    out = mutual_information(df, "x", "y", round_dp=9).collect()
    mi = sum(r["mi_contrib"] for r in out)
    assert mi == pytest.approx(_mi_reference(pairs), abs=1e-6)
    assert mi > 0.05
    # marginals are consistent: sum of n_xy over y equals n_x on every row's x
    for r in out:
        assert r["n_tot"] == 600


def test_mutual_information_independent_is_zero(spark):
    # constant y: knowing x tells you nothing -> every contribution is 0
    df = spark.createDataFrame([("a", "k"), ("b", "k"), ("c", "k")] * 50, "x string, y string")
    out = mutual_information(df, "x", "y", round_dp=9).collect()
    assert all(r["mi_contrib"] == pytest.approx(0.0, abs=1e-12) for r in out)


# ---- functional_dependencies ------------------------------------------------

def test_funcdep_detects_dependency(spark):
    # city -> country holds; country -> city does not
    rows = [
        ("paris", "fr"), ("paris", "fr"), ("lyon", "fr"),
        ("berlin", "de"), ("munich", "de"), ("munich", "de"),
    ]
    df = spark.createDataFrame(rows, "city string, country string")
    got = {
        (r["determinant"], r["dependent"]): r
        for r in functional_dependencies(df, ["city", "country"]).collect()
    }
    assert got[("city", "country")]["holds"] is True
    assert got[("country", "city")]["holds"] is False
    assert got[("city", "country")]["n_distinct_det"] == 4
    assert got[("country", "city")]["n_distinct_pair"] == 4


def test_funcdep_null_dependent_breaks_fd(spark):
    # same determinant mapping to a value AND to NULL is two images -> not an FD
    df = spark.createDataFrame(
        [("k1", "v"), ("k1", None), ("k2", "w")], "a string, b string"
    )
    got = {
        (r["determinant"], r["dependent"]): r["holds"]
        for r in functional_dependencies(df, ["a", "b"]).collect()
    }
    assert got[("a", "b")] is False


# ---- zipf_fit ---------------------------------------------------------------

def test_zipf_fit_recovers_planted_exponent(spark):
    # corpus with term i repeated round(1000 / i) times: slope of
    # ln(count) vs ln(rank) is exactly -1 up to integer rounding
    docs = []
    for i in range(1, 41):
        docs.extend([f"w{i:02d}"] * round(1000 / i))
    text = " ".join(docs)
    df = spark.createDataFrame([(text,)], "text string")
    row = zipf_fit(df, k=40, round_dp=9).collect()[0]
    assert row["n_terms"] == 40
    # numpy OLS reference over the same ranked counts
    counts = sorted((round(1000 / i) for i in range(1, 41)), reverse=True)
    ln_r = np.log(np.arange(1, 41, dtype=float))
    ln_c = np.log(np.array(counts, dtype=float))
    slope_ref = np.polyfit(ln_r, ln_c, 1)[0]
    assert row["slope"] == pytest.approx(slope_ref, abs=1e-6)
    assert row["slope"] == pytest.approx(-1.0, abs=0.05)
    assert row["r2"] > 0.99


# ---- sliding_chunks ----------------------------------------------------------

def _chunk_reference(n, size, stride, min_tail):
    out = []
    k = 0
    while k * stride < n:
        start = k * stride
        clen = min(size, n - start)
        if clen >= min_tail or k == 0:
            out.append((k, start, clen))
        k += 1
    return out


@pytest.mark.parametrize(
    "n,size,stride,min_tail",
    [(10, 4, 3, 1), (10, 4, 4, 1), (3, 8, 8, 1), (100, 32, 24, 8), (32, 32, 24, 8), (1, 4, 2, 3)],
)
def test_sliding_chunks_plan_matches_reference(spark, n, size, stride, min_tail):
    toks = list(range(n))
    df = spark.createDataFrame([(1, toks)], "doc_id long, tokens array<int>")
    got = sorted(
        (r["chunk_idx"], r["start"], r["chunk_len"], list(r["chunk"]))
        for r in sliding_chunks(
            df, "tokens", size=size, stride=stride, min_tail=min_tail
        ).collect()
    )
    ref = [
        (k, s, c, toks[s:s + c]) for k, s, c in _chunk_reference(n, size, stride, min_tail)
    ]
    assert got == ref


def test_sliding_chunks_overlap_covers_every_token(spark):
    df = spark.createDataFrame([(1, list(range(57)))], "doc_id long, tokens array<int>")
    rows = sliding_chunks(df, "tokens", size=16, stride=8, min_tail=1).collect()
    covered = set()
    for r in rows:
        covered.update(r["chunk"])
    assert covered == set(range(57))


def test_sliding_chunks_skips_null_and_empty(spark):
    df = spark.createDataFrame(
        [(1, None), (2, []), (3, [7])], "doc_id long, tokens array<int>"
    )
    rows = sliding_chunks(df, "tokens", size=4, stride=4).collect()
    assert [(r["doc_id"], list(r["chunk"])) for r in rows] == [(3, [7])]


def test_sliding_chunks_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, [1])], "doc_id long, tokens array<int>")
    with pytest.raises(ValueError):
        sliding_chunks(df, "tokens", size=0)
    with pytest.raises(ValueError):
        sliding_chunks(df, "tokens", size=4, stride=-1)


# ---- group_covariance ---------------------------------------------------------

def test_group_covariance_vs_numpy(spark):
    rng = np.random.default_rng(11)
    rows = []
    mats = {}
    for label in (0, 1):
        m = rng.normal(size=(200, 4)).astype("float32")
        m[:, 1] += 0.8 * m[:, 0]  # plant a correlation
        mats[label] = m.astype("float64")
        rows.extend((label, v.tolist()) for v in m)
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    out = group_covariance(df, dims=[0, 1, 2], group_col="label", round_dp=9).collect()
    assert len(out) == 2 * 3  # 2 labels x C(3,2) pairs
    for r in out:
        m = mats[r["label"]]
        a, b = m[:, r["dim_i"]], m[:, r["dim_j"]]
        assert r["n"] == 200
        assert r["cov"] == pytest.approx(float(np.cov(a, b, ddof=0)[0, 1]), abs=1e-6)
        assert r["corr"] == pytest.approx(float(np.corrcoef(a, b)[0, 1]), abs=1e-6)


def test_group_covariance_requires_two_dims(spark):
    df = spark.createDataFrame([(0, [1.0])], "label int, embedding array<float>")
    with pytest.raises(ValueError):
        group_covariance(df, dims=[0])


# ---- group_covariance_full -------------------------------------------------

def test_group_covariance_full_vs_numpy_and_pair_form(spark):
    rng = np.random.default_rng(23)
    rows = []
    mats = {}
    for label in (0, 1, 2):
        m = rng.normal(size=(150, 6)).astype("float32")
        m[:, 2] -= 0.6 * m[:, 5]
        mats[label] = m.astype("float64")
        rows.extend((label, v.tolist()) for v in m)
    df = spark.createDataFrame(rows, "label int, embedding array<float>")

    full = group_covariance_full(df, group_col="label").collect()
    assert len(full) == 3 * (6 * 7 // 2)  # full upper triangle incl. diagonal
    for r in full:
        m = mats[r["label"]]
        a, b = m[:, r["dim_i"]], m[:, r["dim_j"]]
        assert r["n"] == 150
        assert r["cov"] == pytest.approx(float(np.cov(a, b, ddof=0)[0, 1]), abs=1e-9)
        if r["dim_i"] != r["dim_j"]:
            assert r["corr"] == pytest.approx(float(np.corrcoef(a, b)[0, 1]), abs=1e-9)

    # off-diagonal cells agree with the per-pair aggregate form
    pair = {
        (r["label"], r["dim_i"], r["dim_j"]): r
        for r in group_covariance(df, dims=[0, 2, 5], group_col="label", round_dp=9).collect()
    }
    for r in full:
        key = (r["label"], r["dim_i"], r["dim_j"])
        if key in pair:
            assert r["cov"] == pytest.approx(pair[key]["cov"], abs=1e-6)
            assert r["corr"] == pytest.approx(pair[key]["corr"], abs=1e-6)


def test_group_covariance_full_partitioning_invariance(spark):
    rng = np.random.default_rng(5)
    rows = [(int(i % 2), rng.normal(size=4).tolist()) for i in range(80)]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")

    def snap(d):
        return sorted(
            (r["label"], r["dim_i"], r["dim_j"], r["n"], round(r["cov"], 9))
            for r in group_covariance_full(d, group_col="label", round_dp=9).collect()
        )

    assert snap(df.repartition(1)) == snap(df.repartition(7))


def test_group_covariance_full_constant_dim_null_corr(spark):
    # zero-variance dimension: corr must be NULL, never a divide-by-zero inf
    rows = [(0, [1.0, float(i)]) for i in range(10)]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    got = {
        (r["dim_i"], r["dim_j"]): r
        for r in group_covariance_full(df, group_col="label").collect()
    }
    assert got[(0, 1)]["cov"] == pytest.approx(0.0, abs=1e-9)
    assert got[(0, 1)]["corr"] is None
    assert got[(1, 1)]["corr"] == pytest.approx(1.0, abs=1e-9)


def test_sliding_chunks_random_sweep_vs_reference(spark):
    # property sweep in ONE job: 200 random docs, every chunk row checked
    # against the python reference (sizes 1..120 around the 32/24 plan)
    rng = np.random.default_rng(31)
    docs = [(int(i), rng.integers(0, 100, size=int(n)).tolist())
            for i, n in enumerate(rng.integers(1, 121, size=200))]
    df = spark.createDataFrame(docs, "doc_id long, tokens array<int>")
    got = {}
    for r in sliding_chunks(df, "tokens", size=32, stride=24, min_tail=8).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start"], r["chunk_len"], list(r["chunk"]))
        )
    for doc_id, toks in docs:
        ref = [
            (k, s, c, toks[s:s + c])
            for k, s, c in _chunk_reference(len(toks), 32, 24, 8)
        ]
        assert sorted(got.get(doc_id, [])) == ref, f"doc {doc_id}"
