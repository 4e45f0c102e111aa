"""Row-for-row parity between the Spark engine and the pandas oracle
(reference formulas), per partition — the BASELINE.json correctness gate."""

import math

import pytest

from ultragendataset_datachecker_spark import EngineConfig, ValidationEngine
from ultragendataset_datachecker_spark import oracle
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


@pytest.fixture(scope="module")
def metrics_by_part(result):
    return {r["part"]: r.asDict() for r in result.metrics.collect()}


@pytest.fixture(scope="module")
def verdicts_by_part(result):
    return {r["part"]: r.asDict() for r in result.verdicts.collect()}


@pytest.fixture(scope="module")
def oracle_by_part(sequences_pdf, gen_spec):
    out = {}
    for part, pdf in sequences_pdf.groupby("part"):
        out[part] = oracle.partition_report(pdf, gen_spec.vocab_size)
    out[GLOBAL_PART] = oracle.partition_report(sequences_pdf, gen_spec.vocab_size)
    return out


REL = 1e-9


def test_row_counts(metrics_by_part, sequences_pdf):
    for part, pdf in sequences_pdf.groupby("part"):
        assert metrics_by_part[part]["row_count"] == len(pdf)
    assert metrics_by_part[GLOBAL_PART]["row_count"] == len(sequences_pdf)


def test_null_counts(metrics_by_part, oracle_by_part):
    for part, exp in oracle_by_part.items():
        m = metrics_by_part[part]
        for col, cnt in exp["missing"]["missing_count"].items():
            assert m[f"null_{col}"] == cnt, (part, col)


def test_distribution_stats(metrics_by_part, oracle_by_part):
    for part, exp in oracle_by_part.items():
        m = metrics_by_part[part]
        d = exp["dist"]
        assert m["ntok_mean"] == pytest.approx(d["mean"], rel=REL)
        assert m["ntok_std"] == pytest.approx(d["std"], rel=REL)
        assert m["ntok_std_pop"] == pytest.approx(d["std_pop"], rel=REL)
        assert m["ntok_min"] == d["min"]
        assert m["ntok_max"] == d["max"]
        q = m["ntok_quantiles"]
        assert q[0] == pytest.approx(d["q1"], rel=REL)
        assert q[1] == pytest.approx(d["median"], rel=REL)
        assert q[2] == pytest.approx(d["q3"], rel=REL)
        # moments: Spark population skew / excess kurtosis vs oracle raw moments
        assert m["ntok_skew"] == pytest.approx(d["skew"], rel=1e-6)
        assert m["ntok_kurt"] == pytest.approx(d["kurt"], rel=1e-6)


def test_format_issue_counts(metrics_by_part, oracle_by_part):
    for part, exp in oracle_by_part.items():
        m = metrics_by_part[part]
        for k, v in exp["fmt"].items():
            assert m[k] == v, (part, k)


def test_duplicate_counts(result, oracle_by_part):
    counts = {
        (r["part"], r["check_name"]): r["n"]
        for r in result.violations.groupBy("part", "check_name").count().withColumnRenamed("count", "n").collect()
    }
    # fixture property: n_rows//2 % n_parts == 0, so every planted duplicate
    # lands in the same partition as its source row → per-part counts match
    # the per-partition oracle exactly
    for part, exp in oracle_by_part.items():
        if part == GLOBAL_PART:
            continue
        got_tok = counts.get((part, "duplicate_tokens"), 0)
        got_id = counts.get((part, "doc_id_duplicate"), 0)
        assert got_tok == exp["dup_tokens"], part
        assert got_id == exp["doc_id_dups"], part
    glob = oracle_by_part[GLOBAL_PART]
    assert sum(v for (p, c), v in counts.items() if c == "duplicate_tokens") == glob["dup_tokens"]
    assert sum(v for (p, c), v in counts.items() if c == "doc_id_duplicate") == glob["doc_id_dups"]


def test_outlier_counts(result, oracle_by_part):
    counts = {
        (r["part"], r["check_name"]): r["n"]
        for r in result.violations.groupBy("part", "check_name").count().withColumnRenamed("count", "n").collect()
    }
    for part, exp in oracle_by_part.items():
        if part == GLOBAL_PART:
            continue
        got_z = counts.get((part, "ntok_outlier_zscore"), 0)
        got_i = counts.get((part, "ntok_outlier_iqr"), 0)
        assert got_z == exp["zscore_outliers"], part
        assert got_i == exp["iqr_outliers"], part


def test_entropy_and_scores(verdicts_by_part, oracle_by_part):
    for part, exp in oracle_by_part.items():
        if part == GLOBAL_PART:
            continue
        v = verdicts_by_part[part]
        assert v["score_data_balance"] == pytest.approx(exp["entropy"], rel=1e-9)
        assert v["score_missing_values"] == pytest.approx(exp["scores"]["missing_values"], rel=REL)
        assert v["score_outliers"] == pytest.approx(exp["scores"]["outliers"], rel=REL)
        assert v["score_data_format"] == pytest.approx(exp["scores"]["data_format"], rel=REL)
        assert v["score_data_distribution"] == pytest.approx(
            exp["scores"]["data_distribution"], rel=1e-6
        )


def test_overall_score_weighted_mean(verdicts_by_part, oracle_by_part):
    """Overall = Σ w·s / Σ w with reference weights; verdict threshold 0.8.
    Duplicates score differs between engine (global attribution) and per-part
    oracle, so recompute expected overall from the engine's own six scores."""
    weights = {
        "missing_values": 1.0, "outliers": 0.8, "duplicates": 0.9,
        "data_format": 0.7, "data_balance": 0.6, "data_distribution": 0.5,
    }
    for part, v in verdicts_by_part.items():
        scores = {k: v[f"score_{k}"] for k in weights}
        exp = sum(scores[k] * weights[k] for k in weights) / sum(weights.values())
        assert v["overall_score"] == pytest.approx(exp, rel=1e-12)
        assert v["verdict"] == ("pass" if v["overall_score"] >= 0.8 else "fail")
        assert not math.isnan(v["overall_score"])
