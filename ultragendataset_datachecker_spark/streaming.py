"""Structured Streaming surface (§2.7 — beyond the strictly-batch reference).

The reference re-reads the whole file per run (main.py:103-133); incremental
arrival is not modeled. At 100 TB a validation engine must consume a growing
dataset without re-scanning history, so two streaming entry points wrap the
batch engine:

- :func:`validate_stream` — incremental validation of a growing directory.
  The file source's streaming checkpoint tracks which files were already
  consumed (exactly-once per file across restarts); each micro-batch runs
  the SAME fused batch engine via ``foreachBatch`` and appends its
  verdicts/violations keyed by ``batch_id``. This is the idiomatic Spark
  shape for "validate what just landed": no separate streaming
  implementation of the checks to drift out of sync with the batch one.

- :func:`streaming_quality_metrics` — a watermarked tumbling-window quality
  rollup (row counts, null rates, per-column means) for event-timed data.
  Every aggregate is algebraic (count/sum/min/max), so state merges
  incrementally and the watermark bounds state size for late data.

Both run identically under ``trigger(availableNow=True)`` (bounded catch-up,
used in tests) and a continuous micro-batch trigger on a real cluster.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.config import EngineConfig
from ultragendataset_datachecker_spark.engine import ValidationEngine
from ultragendataset_datachecker_spark.io import SEQUENCE_SCHEMA


def validate_stream(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: EngineConfig | None = None,
    schema=SEQUENCE_SCHEMA,
    fmt: str = "parquet",
    baseline: DataFrame | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    on_batch: Callable[[int, DataFrame], None] | None = None,
):
    """Incrementally validate a growing dataset directory.

    Returns the started StreamingQuery. Output layout (all append-mode
    parquet, each row stamped with the micro-batch id):

        {output_dir}/verdicts/    one row per (batch, partition) + GLOBAL
        {output_dir}/violations/  example rows (capped per cfg)

    Exactly-once: the streaming checkpoint commits the consumed-file log
    atomically with the batch id; on restart a half-processed batch is
    re-run with the same batch_id, so downstream readers dedupe on
    (batch_id, part) — the standard foreachBatch idempotence contract.

    ``on_batch`` is a test/metrics hook called with (batch_id, verdicts_df)
    after the writes."""
    cfg = cfg or EngineConfig()
    engine = ValidationEngine(cfg)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.format(fmt).load(input_path)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        res = engine.run(batch_df, baseline=baseline, persist=True)
        stamped_v = res.verdicts.withColumn("batch_id", F.lit(batch_id))
        stamped_v.write.mode("append").parquet(f"{output_dir}/verdicts")
        res.violations.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(f"{output_dir}/violations")
        if on_batch is not None:
            on_batch(batch_id, stamped_v)
        res.unpersist()

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_dedup(
    stream_df: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming KEEP-ONE dedup — the W1 operator's live-feed analogue. One
    row per key survives, but which occurrence is NOT guaranteed:
    dropDuplicates/dropDuplicatesWithinWatermark keep whichever row their
    state sees first under arrival/partition order (the same caveat that
    makes batch dedup_keep_first define a total order and take the
    min(struct) per key instead, ops/dedup.py).
    For a stream this is the honest contract — "first" by event time would
    need unbounded waiting. With an event-time column, state is BOUNDED:
    a key's entry expires once the watermark passes it, which is the only
    dedup contract that survives an unbounded stream (duplicates in real
    pipelines arrive close together — retries, replays). Without a time
    column, falls back to exact dropDuplicates (state grows with distinct
    keys; fine for bounded catch-up runs)."""
    if ts_col is not None:
        return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    return stream_df.dropDuplicates(list(key_cols))


def running_source_stats(
    stream_df: DataFrame,
    group_col: str = "source",
    check_cols: tuple[str, ...] = (),
):
    """Custom stateful operator via ``applyInPandasWithState``: a running
    per-group quality accumulator (total rows + per-column null counts)
    that survives across micro-batches AND restarts (state lives in the
    streaming checkpoint). Each trigger emits the updated lifetime totals
    for every group that received data — the streaming analogue of the
    engine's per-partition null-rate metrics, without re-reading history.

    State is O(groups) regardless of stream length: the accumulator is
    algebraic (counts only), which is what makes the operator safe at any
    scale. Output rows: (group, n_rows_total, null_<col>_total...)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_fields = [f"{group_col} string", "n_rows_total long"] + [
        f"null_{c}_total long" for c in check_cols
    ]
    out_schema = ", ".join(out_fields)
    state_schema = ", ".join(
        ["n long"] + [f"nn_{c} long" for c in check_cols]
    )

    def update(key, pdfs, state):
        n = 0
        nulls = [0] * len(check_cols)
        for pdf in pdfs:
            n += len(pdf)
            for i, c in enumerate(check_cols):
                nulls[i] += int(pdf[c].isna().sum())
        if state.exists:
            prev = state.get
            n += prev[0]
            nulls = [a + b for a, b in zip(nulls, prev[1:])]
        state.update((n, *nulls))
        yield pd.DataFrame(
            [[key[0], n, *nulls]],
            columns=[group_col, "n_rows_total"] + [f"null_{c}_total" for c in check_cols],
        )

    return stream_df.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_quality_metrics(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    group_col: str | None = "source",
    numeric_cols: tuple[str, ...] = (),
    check_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Watermarked tumbling-window quality rollup over an event-timed stream.

    Per (window[, group_col]): row count, per-column null counts/rates, and
    mean/min/max of each numeric column. All aggregates are algebraic so the
    stateful operator merges partial state per key; the watermark lets Spark
    drop window state once no more late rows can arrive — bounded state at
    any stream length. Use output mode 'append' in production (emit each
    window once, on close) or 'complete'/'update' for dashboards."""
    keys = [F.window(F.col(ts_col), window).alias("window")]
    if group_col:
        keys.append(F.col(group_col))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in check_cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        )
        aggs.append(
            F.avg(F.col(c).isNull().cast("double")).alias(f"null_rate_{c}")
        )
    for c in numeric_cols:
        aggs += [
            F.avg(c).alias(f"mean_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(*aggs)
    )


def streaming_drift(
    stream_df: DataFrame,
    baseline: DataFrame,
    cfg: EngineConfig | None = None,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    group_col: str | None = None,
) -> DataFrame:
    """Per event-time window: KL/PSI of the n_tok and source distributions
    vs a baseline histogram snapshot — live drift detection on the stream
    that feeds the table, instead of after-the-fact batch validation.

    Append-mode shape matters here: Spark allows ONE stateful aggregation
    per append-mode query, so the histogram is the only agg (the same fixed
    sum(when) bucket columns the batch engine uses — algebraic, watermark-
    bounded state) and the KL/PSI fold is a CLOSED-FORM column expression
    over that single output row, with the baseline probabilities inlined as
    literals (the baseline is O(buckets), collected once on the driver).
    No second groupBy, no stream-stream join, no state beyond the windows.

    Returns (window[, group_col], n_rows, kl_n_tok_hist, psi_n_tok_hist,
    kl_source_hist, psi_source_hist, drift_flag) — flag TRUE when either
    PSI exceeds cfg.psi_fail_threshold. Numbers match the batch
    drift_scores formula exactly (same eps smoothing, same buckets).
    """
    from functools import reduce

    from ultragendataset_datachecker_spark.checks.column_stats import (
        ntok_bucket_conditions,
        source_bucket_conditions,
    )

    cfg = cfg or EngineConfig()
    eps = cfg.drift_smoothing_eps
    q = {
        (r["check_name"], r["bucket"]): float(r["prob"])
        for r in baseline.select("check_name", "bucket", "prob").collect()
    }

    conds = {
        "n_tok_hist": ntok_bucket_conditions(cfg),
        "source_hist": source_bucket_conditions(cfg),
    }
    keys = [F.window(F.col(ts_col), window).alias("window")]
    if group_col:
        keys.append(F.col(group_col))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for check, cmap in conds.items():
        for i, cond in enumerate(cmap.values()):
            aggs.append(F.sum(cond.cast("long")).alias(f"_h:{check}:{i}"))
    agg = stream_df.withWatermark(ts_col, watermark).groupBy(*keys).agg(*aggs)

    sel = [F.col("window")] + ([F.col(group_col)] if group_col else []) + [F.col("n_rows")]
    psi_cols = []
    for check, cmap in conds.items():
        cnt_cols = [F.col(f"_h:{check}:{i}") for i in range(len(cmap))]
        tot = reduce(lambda a, b: a + b, cnt_cols).cast("double")
        kl_terms, psi_terms = [], []
        for i, label in enumerate(cmap.keys()):
            p = cnt_cols[i] / F.when(tot > 0, tot)  # NULL window-total → NULL scores
            qv = F.lit(q.get((check, label), 0.0))
            pe, qe = p + F.lit(eps), qv + F.lit(eps)
            lr = F.log(pe / qe)
            kl_terms.append(pe * lr)
            psi_terms.append((pe - qe) * lr)
        kl = reduce(lambda a, b: a + b, kl_terms)
        psi = reduce(lambda a, b: a + b, psi_terms)
        sel += [kl.alias(f"kl_{check}"), psi.alias(f"psi_{check}")]
        psi_cols.append(f"psi_{check}")
    out = agg.select(*sel)
    flag = reduce(
        lambda a, b: a | b,
        [F.col(c) > F.lit(cfg.psi_fail_threshold) for c in psi_cols],
    )
    return out.withColumn("drift_flag", flag)


def streaming_constraints(
    stream_df: DataFrame,
    suite,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    group_col: str | None = None,
) -> DataFrame:
    """Evaluate a declarative :class:`constraints.ConstraintSuite` per
    event-time window on a stream — continuous data quality gating with
    the exact same constraint objects (and verdict semantics, incl. the
    6-dp quantization) the batch :meth:`ConstraintSuite.evaluate` uses.

    One watermarked tumbling-window aggregation carries every constraint's
    metric (all built-in metrics are algebraic or mergeable sketches, so
    state merges incrementally and the watermark bounds it); the unpivot
    into (window[, group_col], check_name, level, observed, threshold,
    passed) rows is a stateless projection of the O(windows·groups) agg
    output. Append mode emits each window's verdict once, on close.

    Constraints whose metric needs a DISTINCT aggregate (``unique``,
    ``distinctness(exact=True)``) are not executable inside a streaming
    aggregation — rejected here by name; use the HLL form
    (``C.distinctness(col)``) on streams.
    """
    bad = [c.name for c in suite.constraints if not c.streamable]
    if bad:
        raise ValueError(
            f"constraints not streamable (DISTINCT aggregate): {bad}; "
            "use C.distinctness(col) (HLL) instead of unique/exact forms"
        )
    keys = [F.window(F.col(ts_col), window).alias("window")]
    keep = ["window"]
    if group_col:
        keys.append(F.col(group_col))
        keep.append(group_col)
    aggd = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(*suite.aliased_metrics())
    )
    return suite.unpivot(aggd, keep=keep)
