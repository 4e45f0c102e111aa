"""Metric-history anomaly detection (anomaly.py) — strategy semantics,
tri-state evaluability, latest-run gating, verdicts, and the one-exchange
plan shape. The reference's only cross-run signal is drift vs one pinned
baseline (/root/reference/dataset_checker/checks/drift.py); this is the
longitudinal complement, so truth here is hand-computed series math.
"""

import math

import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.anomaly import (
    A,
    AnomalyStrategy,
    anomaly_verdicts,
    detect_anomalies,
    latest_anomalies,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def history(spark):
    # two series; series 'm' is flat 100s with one 200 spike at r6 and a
    # zero at r7 (exercises relative-change's zero-denominator rule on r8);
    # series 'n' is a 2-point series (never reaches zscore min_history).
    rows = [
        ("p0", "m", "r1", 100.0),
        ("p0", "m", "r2", 101.0),
        ("p0", "m", "r3", 99.0),
        ("p0", "m", "r4", 100.0),
        ("p0", "m", "r5", 101.0),
        ("p0", "m", "r6", 200.0),
        ("p0", "m", "r7", 0.0),
        ("p0", "m", "r8", 100.0),
        ("p0", "n", "r1", 5.0),
        ("p0", "n", "r2", 50.0),
    ]
    return spark.createDataFrame(
        rows, "grp string, check_name string, run_id string, observed double"
    )


STRATS = [
    A.absolute_change(10.0),
    A.relative_change(0.5, level="warning"),
    A.zscore(3.0, window=4, min_history=3),
]


@pytest.fixture(scope="module")
def result(history):
    df = detect_anomalies(history, STRATS).persist()
    df.count()
    yield df
    df.unpersist()


def _idx(result):
    return {
        (r["check_name"], r["run_id"], r["strategy"]): r for r in result.collect()
    }


def test_absolute_change(result):
    r = _idx(result)
    k = "absolute_change(10.0)"
    assert r[("m", "r1", k)]["is_anomaly"] is None  # no previous run
    assert r[("m", "r2", k)]["is_anomaly"] == 0  # |101-100| <= 10
    assert r[("m", "r6", k)]["is_anomaly"] == 1  # |200-101| > 10
    assert r[("m", "r6", k)]["baseline"] == 101.0
    assert r[("m", "r6", k)]["band"] == 10.0
    assert r[("n", "r2", k)]["is_anomaly"] == 1  # |50-5| > 10


def test_relative_change(result):
    r = _idx(result)
    k = "relative_change(0.5)"
    assert r[("m", "r1", k)]["is_anomaly"] is None
    assert r[("m", "r2", k)]["is_anomaly"] == 0  # 1% move
    assert r[("m", "r6", k)]["is_anomaly"] == 1  # ~2x move
    assert r[("m", "r8", k)]["is_anomaly"] is None  # prev == 0: undefined
    assert r[("m", "r8", k)]["band"] is None
    assert r[("m", "r6", k)]["level"] == "warning"


def test_zscore(result):
    r = _idx(result)
    k = "zscore(3.0,w=4)"
    # r1/r2/r3 have < min_history=3 prior points
    for run in ("r1", "r2", "r3"):
        assert r[("m", run, k)]["is_anomaly"] is None
    # r4: prior {100,101,99} mean=100, sd=1 -> |100-100| <= 3
    assert r[("m", "r4", k)]["is_anomaly"] == 0
    assert r[("m", "r4", k)]["baseline"] == 100.0
    assert r[("m", "r4", k)]["band"] == 3.0
    # r6: prior {101,99,100,101} mean=100.25, sd(ddof=1)~0.9574
    row = r[("m", "r6", k)]
    assert row["is_anomaly"] == 1
    assert row["baseline"] == 100.25
    assert abs(row["band"] - round(3.0 * math.sqrt(11 / 12), 6)) < 1e-9
    # series 'n' never reaches min_history
    assert r[("n", "r2", k)]["is_anomaly"] is None


def test_zscore_trailing_window_slides(result):
    r = _idx(result)
    k = "zscore(3.0,w=4)"
    # r8's trailing-4 window covers r4..r7: {100, 101, 200, 0}
    row = r[("m", "r8", k)]
    prior = [100.0, 101.0, 200.0, 0.0]
    mean = sum(prior) / 4
    sd = math.sqrt(sum((x - mean) ** 2 for x in prior) / 3)
    assert row["baseline"] == round(mean, 6)
    assert abs(row["band"] - round(3.0 * sd, 6)) < 1e-9


def test_latest_anomalies(result):
    latest = latest_anomalies(result)
    runs = {(r["check_name"], r["run_id"]) for r in latest.collect()}
    assert runs == {("m", "r8"), ("n", "r2")}
    assert latest.count() == 2 * len(STRATS)


def test_verdicts(result):
    v = {
        (r["check_name"], r["run_id"]): r
        for r in anomaly_verdicts(result).collect()
    }
    # r6: absolute (error) + zscore (error) + relative (warning) all flag
    assert v[("m", "r6")]["n_error_anomalies"] == 2
    assert v[("m", "r6")]["n_warning_anomalies"] == 1
    assert v[("m", "r6")]["run_passed"] == 0
    # r2: clean run
    assert v[("m", "r2")]["run_passed"] == 1
    # n/r1: nothing evaluable -> no anomalies counted -> passes
    assert v[("n", "r1")]["n_error_anomalies"] == 0
    assert v[("n", "r1")]["run_passed"] == 1


def test_single_exchange_plan(history):
    # distinct params from the module fixture so the persisted `result`
    # cache can't substitute its InMemoryRelation for this plan
    strats = [A.absolute_change(7.0), A.relative_change(0.25), A.zscore(2.0, window=5)]
    plan = _plan(detect_anomalies(history, strats))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_strategy_validation(history):
    with pytest.raises(ValueError, match="window must be >= 2"):
        A.zscore(window=1)
    with pytest.raises(ValueError, match="min_history"):
        A.zscore(window=4, min_history=1)
    with pytest.raises(ValueError, match="negative tolerance"):
        A.absolute_change(-1.0)
    with pytest.raises(ValueError, match="level"):
        AnomalyStrategy(name="x", kind="absolute", param=1.0, level="fatal")
    with pytest.raises(ValueError, match="empty strategy"):
        detect_anomalies(history, [])
    with pytest.raises(ValueError, match="duplicate strategy"):
        detect_anomalies(history, [A.zscore(), A.zscore()])
    with pytest.raises(ValueError, match="reserved"):
        detect_anomalies(history.withColumn("baseline", F.lit(1)), STRATS)


def test_job_cli_anomaly_history(spark, tmp_path, capsys):
    """Three sequential validation runs gating constraint metrics against
    their own history: runs 1-2 establish the trend on identical data, run 3
    validates a table whose n_tok mean jumped 10x -> relative_change flags
    it (warning level); zscore has only 2 prior points (< min_history=3) so
    no error anomalies. A re-run of snapshot 3 overwrites its own history
    partition instead of duplicating it."""
    import json as _json

    from ultragendataset_datachecker_spark import job

    spec_path = tmp_path / "suite.json"
    spec_path.write_text(_json.dumps({
        "name": "trend",
        "constraints": [
            {"type": "completeness", "col": "doc_id"},
            {"type": "mean_between", "col": "n_tok", "lo": 0, "hi": 1e12},
        ],
    }))
    seq, hist = str(tmp_path / "seq"), str(tmp_path / "hist")

    def run(snap: str, inp: str) -> dict:
        rc = job.main([
            "--input", inp, "--output", str(tmp_path / f"out_{snap}"),
            "--snapshot-id", snap, "--constraints", str(spec_path),
            "--anomaly-history", hist,
        ])
        assert rc == 0
        line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
        return _json.loads(line)["constraints"]["anomalies"]

    rc = job.main([
        "--generate", "4000", "--generate-parts", "4",
        "--input", seq, "--output", str(tmp_path / "out_r0001"),
        "--snapshot-id", "r0001", "--constraints", str(spec_path),
        "--anomaly-history", hist,
    ])
    assert rc == 0
    a1 = _json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    )["constraints"]["anomalies"]
    assert a1 == {"history_runs": 1, "error_anomalies": 0, "warning_anomalies": 0}

    a2 = run("r0002", seq)  # same data -> same metrics -> nothing flagged
    assert a2["history_runs"] == 2
    assert a2["error_anomalies"] == 0 and a2["warning_anomalies"] == 0

    from pyspark.sql import functions as F

    shifted = str(tmp_path / "seq_shifted")
    spark.read.parquet(seq).withColumn(
        "n_tok", (F.col("n_tok") * 10).cast("int")
    ).write.parquet(shifted)
    a3 = run("r0003", shifted)
    assert a3["history_runs"] == 3
    assert a3["error_anomalies"] == 0  # zscore not evaluable from 2 priors
    # mean(n_tok) jumped 10x in every group (4 parts + __all__)
    assert a3["warning_anomalies"] == 5

    back = spark.read.parquet(str(tmp_path / "out_r0003" / "anomalies"))
    flagged = back.where("is_anomaly = 1").select("check_name").distinct().collect()
    assert {r["check_name"] for r in flagged} == {"mean(n_tok)"}

    # re-running the same snapshot overwrites its partition, not duplicates
    a3b = run("r0003", shifted)
    assert a3b["history_runs"] == 3 and a3b["warning_anomalies"] == 5


def test_quantization_stability(spark):
    # values differing only at ~1e-12 (FP merge-order scale) quantize to the
    # same 6-dp metric, so verdicts cannot flip across parallelism
    rows = [("g", "c", "r1", 100.0), ("g", "c", "r2", 100.0 + 1e-12)]
    h = spark.createDataFrame(
        rows, "grp string, check_name string, run_id string, observed double"
    )
    out = detect_anomalies(h, [A.absolute_change(0.0)])
    r = {x["run_id"]: x for x in out.collect()}
    assert r["r2"]["observed"] == 100.0
    assert r["r2"]["is_anomaly"] == 0


def test_verdicts_all_null_group_counts_zero(spark):
    # a (series, run) whose EVERY strategy is non-evaluable (is_anomaly all
    # NULL) must report 0 counts and pass — a bare SUM over all-NULL input
    # is NULL and used to leak NULL n_error_anomalies / run_passed
    rows = [
        ("g", "m", "r1", "error", None),
        ("g", "m", "r1", "warning", None),
    ]
    df = spark.createDataFrame(
        rows, "grp string, check_name string, run_id string, level string, is_anomaly int"
    )
    [v] = anomaly_verdicts(df).collect()
    assert v["n_error_anomalies"] == 0
    assert v["n_warning_anomalies"] == 0
    assert v["run_passed"] == 1
