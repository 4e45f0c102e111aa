"""Structured Streaming surface: incremental validation (foreachBatch over
the batch engine) and watermarked windowed quality metrics."""

import datetime

import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark import EngineConfig
from ultragendataset_datachecker_spark.datagen import DefectSpec, GenSpec, generate_sequences
from ultragendataset_datachecker_spark.streaming import (
    streaming_quality_metrics,
    validate_stream,
)


@pytest.fixture(scope="module")
def cfg(gen_spec):
    return EngineConfig(
        vocab_size=gen_spec.vocab_size, allowed_sources=tuple(gen_spec.sources)
    )


def _land_batch(spark, path: str, seed: int) -> None:
    df = generate_sequences(
        spark, GenSpec(n_rows=400, n_parts=2, seed=seed, defects=DefectSpec())
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_validate_stream_incremental(spark, cfg, tmp_path):
    """Two landings into a growing directory: the second run consumes ONLY
    the new files (streaming checkpoint), and each micro-batch's verdicts
    land stamped with its batch_id."""
    inp = str(tmp_path / "inp")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _land_batch(spark, inp, seed=1)
    q = validate_stream(spark, inp, out, ckpt, cfg=cfg)
    q.awaitTermination(300)

    v1 = spark.read.parquet(f"{out}/verdicts")
    batches1 = {r["batch_id"] for r in v1.select("batch_id").distinct().collect()}
    assert len(batches1) == 1
    n1 = v1.count()
    assert n1 >= 3  # 2 parts + GLOBAL rollup
    assert spark.read.parquet(f"{out}/violations").count() > 0

    _land_batch(spark, inp, seed=2)
    q = validate_stream(spark, inp, out, ckpt, cfg=cfg)
    q.awaitTermination(300)

    v2 = spark.read.parquet(f"{out}/verdicts")
    batches2 = {r["batch_id"] for r in v2.select("batch_id").distinct().collect()}
    assert len(batches2) == 2  # batch 1 NOT re-validated
    # second landing added exactly one batch worth of verdict rows
    assert v2.count() == n1 + v2.where(~F.col("batch_id").isin(list(batches1))).count()
    for r in v2.where(F.col("part") == -1).collect():  # GLOBAL rows per batch
        assert r["verdict"] in ("pass", "fail")


def test_streaming_quality_metrics_matches_batch(spark, tmp_path):
    """The windowed streaming rollup over a bounded file stream equals the
    same aggregation run in batch (algebraic aggs + tumbling windows)."""
    base = datetime.datetime(2026, 1, 1)
    rows = [
        (base + datetime.timedelta(minutes=7 * i), ["web", "api"][i % 2],
         float(i) if i % 5 else None)
        for i in range(60)
    ]
    pdf_path = str(tmp_path / "events")
    df = spark.createDataFrame(rows, "ts timestamp, source string, v double")
    df.coalesce(2).write.parquet(pdf_path)

    stream = spark.readStream.schema("ts timestamp, source string, v double").parquet(pdf_path)
    agg = streaming_quality_metrics(
        stream, ts_col="ts", window="30 minutes", watermark="1 hour",
        group_col="source", numeric_cols=("v",), check_cols=("v",),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sqm")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["window"]["start"], r["source"]): (r["n_rows"], r["null_v"], r["mean_v"])
        for r in spark.sql("select * from sqm").collect()
    }
    exp = {
        (r["window"]["start"], r["source"]): (r["n_rows"], r["null_v"], r["mean_v"])
        for r in (
            df.groupBy(F.window("ts", "30 minutes").alias("window"), "source")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("v").isNull().cast("long")).alias("null_v"),
                F.avg("v").alias("mean_v"),
            )
            .collect()
        )
    }
    assert got == exp and len(got) >= 8


def test_running_source_stats_accumulates_across_restarts(spark, tmp_path):
    """applyInPandasWithState accumulator: lifetime totals survive across
    separate availableNow runs through the streaming checkpoint, and equal
    the batch-computed totals over all landed data."""
    from ultragendataset_datachecker_spark.streaming import running_source_stats

    inp = str(tmp_path / "inp")
    ckpt = str(tmp_path / "ckpt")

    def land(seed):
        rows = [
            (["web", "api", "app"][i % 3], float(i) if (i + seed) % 4 else None)
            for i in range(90)
        ]
        spark.createDataFrame(rows, "source string, v double").coalesce(1) \
            .write.mode("append").parquet(inp)

    def run_once(qname):
        # foreachBatch sink: unlike the memory sink it supports restarting
        # from the checkpoint, which is the point of this test
        got: dict = {}

        def capture(batch_df, _bid):
            for r in batch_df.collect():
                got[r["source"]] = (r["n_rows_total"], r["null_v_total"])

        stream = spark.readStream.schema("source string, v double").parquet(inp)
        agg = running_source_stats(stream, group_col="source", check_cols=("v",))
        q = (
            agg.writeStream.foreachBatch(capture)
            .option("checkpointLocation", ckpt)
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination(300)
        return got

    land(0)
    first = run_once("rss1")
    assert set(first) == {"web", "api", "app"}
    assert sum(v[0] for v in first.values()) == 90

    land(1)  # second landing: only the new file is consumed, state carries over
    second = run_once("rss2")
    total_rows = sum(v[0] for v in second.values())
    assert total_rows == 180  # lifetime totals, not per-batch
    df = spark.read.parquet(inp)
    exp = {
        r["source"]: (r["n"], r["nn"])
        for r in df.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("v").isNull().cast("long")).alias("nn"))
        .collect()
    }
    assert second == exp


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicates arriving within the watermark are suppressed; each key
    survives exactly once (bounded seen-keys state)."""
    import datetime as _dt

    from ultragendataset_datachecker_spark.streaming import streaming_dedup

    base = _dt.datetime(2026, 1, 1)
    rows = []
    for i in range(30):
        ts = base + _dt.timedelta(minutes=i)
        rows.append((f"k{i % 10}", ts, i))        # every key lands 3 times
    inp = str(tmp_path / "inp")
    spark.createDataFrame(rows, "k string, ts timestamp, v int").coalesce(1).write.parquet(inp)

    stream = spark.readStream.schema("k string, ts timestamp, v int").parquet(inp)
    dedup = streaming_dedup(stream, ("k",), ts_col="ts", watermark="2 hours")
    q = (
        dedup.writeStream.format("memory").queryName("sdd")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    out = spark.sql("select * from sdd").collect()
    assert sorted(r["k"] for r in out) == sorted(f"k{i}" for i in range(10))


def test_quality_signals_compose_with_streaming(spark, tmp_path):
    """The Gopher quality filter is a stateless per-row projection, so it
    drops into a Structured Streaming pipeline unchanged — same expressions,
    same results as batch over the same files."""
    from ultragendataset_datachecker_spark.ops.quality import quality_signals

    good = ("the quick brown fox jumps over a lazy dog and then runs far away "
            "into the green hills of a quiet valley where many small streams flow")
    rows = [(1, good), (2, "spam " * 30), (3, "short text")]
    src = str(tmp_path / "qdocs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        quality_signals(stream)
        .select("doc_id", "gopher_pass")
        .writeStream.format("memory")
        .queryName("qsig")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r["doc_id"]: r["gopher_pass"] for r in spark.sql("select * from qsig").collect()}
    batch = {
        r["doc_id"]: r["gopher_pass"]
        for r in quality_signals(spark.read.parquet(src)).select("doc_id", "gopher_pass").collect()
    }
    assert got == batch == {1: True, 2: False, 3: False}


def test_streaming_drift_flags_drifted_window_and_matches_batch(
    spark, cfg, sequences_df, gen_spec, tmp_path
):
    """streaming_drift: the event-time window holding the drifted partition's
    rows is flagged; clean windows are not; and every KL/PSI number equals
    the batch drift_scores formula recomputed over the same window slices."""
    import math

    from ultragendataset_datachecker_spark import ValidationEngine
    from ultragendataset_datachecker_spark.checks.drift import build_baseline
    from ultragendataset_datachecker_spark.streaming import streaming_drift

    drifted = gen_spec.drifted_part
    res = ValidationEngine(cfg).run(sequences_df, persist=False)
    baseline = build_baseline(res.metrics, cfg, "base", exclude_parts=[drifted])

    # drifted part's rows land in the 10:00 window, clean rows in 09:00
    base = datetime.datetime(2026, 3, 1, 9, 0)
    timed = sequences_df.withColumn(
        "ts",
        F.when(F.col("part") == drifted, F.lit(base + datetime.timedelta(hours=1)))
        .otherwise(F.lit(base)),
    )
    inp = str(tmp_path / "timed_seq")
    timed.write.parquet(inp)

    stream = spark.readStream.schema(timed.schema).parquet(inp)
    out = streaming_drift(
        stream, baseline, cfg, ts_col="ts", window="1 hour", watermark="2 hours"
    )
    q = (
        out.writeStream.format("memory").queryName("sdrift")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    rows = {r["window"]["start"].hour: r for r in spark.sql("select * from sdrift").collect()}
    assert set(rows) == {9, 10}
    assert rows[10]["drift_flag"] is True
    assert rows[9]["drift_flag"] is False
    assert rows[10]["psi_n_tok_hist"] > 1.0
    assert rows[9]["psi_n_tok_hist"] < cfg.psi_fail_threshold

    # batch parity: recompute the PSI formula per window slice in plain python
    from ultragendataset_datachecker_spark.checks.column_stats import (
        ntok_bucket_conditions, source_bucket_conditions,
    )

    qmap = {
        (r["check_name"], r["bucket"]): r["prob"]
        for r in baseline.collect()
    }
    eps = cfg.drift_smoothing_eps
    for hour, part_filter in ((9, F.col("part") != drifted), (10, F.col("part") == drifted)):
        sl = timed.where(part_filter)
        for check, conds in (
            ("n_tok_hist", ntok_bucket_conditions(cfg)),
            ("source_hist", source_bucket_conditions(cfg)),
        ):
            counts = sl.agg(
                *[F.sum(c.cast("long")).alias(str(i)) for i, c in enumerate(conds.values())]
            ).first()
            tot = sum(counts)
            exp_psi = sum(
                ((cnt / tot + eps) - (qmap.get((check, lab), 0.0) + eps))
                * math.log((cnt / tot + eps) / (qmap.get((check, lab), 0.0) + eps))
                for lab, cnt in zip(conds.keys(), counts)
            )
            assert rows[hour][f"psi_{check}"] == pytest.approx(exp_psi, rel=1e-9), (hour, check)


def test_streaming_drift_supports_append_mode(spark, cfg, sequences_df, gen_spec, tmp_path):
    """The whole point of inlining the baseline as literals: ONE stateful
    aggregation, so append mode is accepted (a second groupBy for PSI would
    throw 'Multiple streaming aggregations' at start). Closed windows emit."""
    from ultragendataset_datachecker_spark import ValidationEngine
    from ultragendataset_datachecker_spark.checks.drift import build_baseline
    from ultragendataset_datachecker_spark.streaming import streaming_drift

    res = ValidationEngine(cfg).run(sequences_df, persist=False)
    baseline = build_baseline(res.metrics, cfg, "base")
    base = datetime.datetime(2026, 3, 1, 9, 0)
    timed = sequences_df.withColumn(
        "ts",
        F.when(F.col("part") == 0, F.lit(base + datetime.timedelta(hours=3)))
        .otherwise(F.lit(base)),
    )
    inp = str(tmp_path / "timed_seq_append")
    timed.write.parquet(inp)
    stream = spark.readStream.schema(timed.schema).parquet(inp)
    out = streaming_drift(stream, baseline, cfg, ts_col="ts",
                          window="1 hour", watermark="1 hour")
    q = (
        out.writeStream.format("memory").queryName("sdrift_append")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select * from sdrift_append").collect()
    # the 09:00 window closed under the final watermark (12:00 - 1h); the
    # last window stays open and is correctly withheld in append mode
    assert [r["window"]["start"].hour for r in rows] == [9]


def test_job_cli_stream_catchup(spark, tmp_path, capsys):
    """--stream-catchup: bounded incremental validation via the job CLI —
    second invocation after a new landing consumes ONLY the new files, and
    a caught-up invocation processes zero batches."""
    import json

    from ultragendataset_datachecker_spark import job

    inp, out = str(tmp_path / "grow"), str(tmp_path / "sout")

    def run():
        rc = job.main(["--input", inp, "--output", out, "--stream-catchup"])
        assert rc == 0
        line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    _land_batch(spark, inp, seed=11)
    s1 = run()
    assert s1["mode"] == "stream_catchup" and s1["batches_processed"] == 1
    assert set(s1["parts"]) == {"0", "1"}

    _land_batch(spark, inp, seed=12)
    s2 = run()
    assert s2["batches_processed"] == 1  # only the new landing

    s3 = run()
    assert s3["batches_processed"] == 0 and s3["parts"] == {}


def test_streaming_constraints_matches_batch(spark, tmp_path):
    """Per-window constraint verdicts over a bounded file stream equal the
    same suite evaluated in batch per window — identical constraint
    objects, identical 6-dp quantization, both pass/fail branches hit."""
    from ultragendataset_datachecker_spark.constraints import C, ConstraintSuite
    from ultragendataset_datachecker_spark.streaming import streaming_constraints

    base = datetime.datetime(2026, 1, 1)
    rows = [
        (
            base + datetime.timedelta(minutes=7 * i),
            ["web", "api"][i % 2],
            # window 0..: positive values; later windows plant nulls + a
            # negative so completeness and non_negative fail per-window
            None if (i > 30 and i % 3 == 0) else float(i - 40),
        )
        for i in range(60)
    ]
    path = str(tmp_path / "cstream")
    df = spark.createDataFrame(rows, "ts timestamp, source string, v double")
    df.coalesce(2).write.parquet(path)

    suite = ConstraintSuite(
        [
            C.completeness("v", min_ratio=0.9),
            C.non_negative("v"),
            C.mean_between("v", -50, 50),
            C.row_count_between(1, None),
        ]
    )
    stream = spark.readStream.schema("ts timestamp, source string, v double").parquet(path)
    out = streaming_constraints(
        stream, suite, ts_col="ts", window="30 minutes", watermark="1 hour",
        group_col="source",
    )
    q = (
        out.writeStream.format("memory").queryName("sconstraints")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        (r["window"]["start"], r["source"], r["check_name"]): (r["observed"], r["passed"])
        for r in spark.sql("select * from sconstraints").collect()
    }
    batch_aggd = (
        df.groupBy(F.window("ts", "30 minutes").alias("window"), "source")
        .agg(*suite.aliased_metrics())
    )
    exp = {
        (r["window"]["start"], r["source"], r["check_name"]): (r["observed"], r["passed"])
        for r in suite.unpivot(batch_aggd, keep=["window", "source"]).collect()
    }
    assert got == exp and len(got) > 0
    passes = {v[1] for v in got.values()}
    assert passes == {0, 1}  # both verdict branches exercised


def test_streaming_constraints_rejects_distinct_metrics(spark, tmp_path):
    from ultragendataset_datachecker_spark.constraints import C, ConstraintSuite
    from ultragendataset_datachecker_spark.streaming import streaming_constraints

    path = str(tmp_path / "cstream2")
    spark.createDataFrame(
        [(datetime.datetime(2026, 1, 1), 1.0)], "ts timestamp, v double"
    ).write.parquet(path)
    stream = spark.readStream.schema("ts timestamp, v double").parquet(path)
    suite = ConstraintSuite([C.unique("v"), C.distinctness("v", 0.5)])
    with pytest.raises(ValueError, match="unique"):
        streaming_constraints(stream, suite)
    # the HLL distinctness alone is streamable
    ok = streaming_constraints(stream, ConstraintSuite([C.distinctness("v", 0.5)]))
    assert "check_name" in ok.columns
