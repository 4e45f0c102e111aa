"""Cross-run metric regression: flag partitions whose metrics deviate from
their own manifest history.

The reference re-checks a dataset in isolation every time (main.py:34-133
has no memory between runs). At a 10^12-row table fed by a pipeline, the
highest-value signal is often LONGITUDINAL: "partition 7 suddenly has 40%
fewer rows / a shorter mean sequence than its last five snapshots" — even
when every within-run check still passes. The checkpoint manifest already
records the full metrics blob per (part, snapshot, time)
(checkpoint.write_manifest), so this check costs zero extra corpus passes:
it parses the O(parts × runs) manifest, computes each metric's trailing
mean/std per partition, and z-scores the current run against it.

Everything here is tiny-frame DataFrame math (no corpus scan, no collect of
row-level data); it composes with resume because history rows are keyed by
snapshot_id and the current snapshot is excluded from its own baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.config import EngineConfig

# numeric per-partition metrics worth tracking longitudinally by default
DEFAULT_TRACKED_METRICS = (
    "row_count",
    "ntok_mean",
    "ntok_std",
    "token_total",
    "null_doc_id",
    "null_tokens",
    "doc_id_approx_distinct",
)


def metric_regression(
    manifest: DataFrame,
    current_metrics: DataFrame,
    cfg: EngineConfig,
    snapshot_id: str,
    tracked: tuple[str, ...] = DEFAULT_TRACKED_METRICS,
    z_threshold: float = 3.0,
    min_history: int = 2,
) -> DataFrame:
    """Per (part, metric): current value vs manifest-history trailing stats.

    History = manifest rows for the SAME engine check_version whose
    snapshot_id differs from ``snapshot_id`` (a re-run never baselines
    against itself). Partitions/metrics with fewer than ``min_history``
    prior runs are emitted with ``flag = NULL`` (insufficient evidence),
    mirroring how the scoring layer marks partial results rather than
    guessing.

    Returns (part, metric, value, hist_n, hist_mean, hist_std, z,
    pct_change, flag) — flag TRUE when |z| > z_threshold with hist_std > 0,
    or when hist_std == 0 and the value changed at all (a constant metric
    moving is always reportable).
    """
    pc = cfg.partition_col
    schema = ", ".join(f"`{m}` double" for m in tracked)
    hist = (
        manifest.where(
            (F.element_at(F.col("check_versions"), "engine") == cfg.check_version)
            & (F.col("snapshot_id") != snapshot_id)
        )
        .select("part", F.from_json("metrics_json", schema).alias("m"))
        .select(
            "part",
            F.explode(
                F.map_from_arrays(
                    F.array(*[F.lit(m) for m in tracked]),
                    F.array(*[F.col(f"m.`{m}`") for m in tracked]),
                )
            ).alias("metric", "value"),
        )
        .where(F.col("value").isNotNull())
        .groupBy("part", "metric")
        .agg(
            F.count(F.lit(1)).alias("hist_n"),
            F.mean("value").alias("hist_mean"),
            F.stddev_pop("value").alias("hist_std"),
        )
    )
    cur = current_metrics.where(F.col(pc) >= 0).select(
        F.col(pc).alias("part"),
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(m) for m in tracked]),
                F.array(*[F.col(m).cast("double") for m in tracked]),
            )
        ).alias("metric", "value"),
    )
    j = cur.join(hist, on=["part", "metric"], how="left")
    # identical history runs should give std == 0 exactly, but the merged
    # variance can come out ~1e-16; clamp sub-noise stds to the "constant
    # history" branch so z never explodes on FP dust
    noise = F.lit(1e-9) * F.greatest(F.abs(F.col("hist_mean")), F.lit(1.0))
    real_std = F.col("hist_std") > noise
    z = (F.col("value") - F.col("hist_mean")) / F.col("hist_std")
    pct = F.when(
        F.col("hist_mean") != 0,
        (F.col("value") - F.col("hist_mean")) / F.abs(F.col("hist_mean")),
    )
    enough = F.col("hist_n") >= F.lit(min_history)
    flag = F.when(
        ~enough | F.col("hist_n").isNull(), F.lit(None).cast("boolean")
    ).otherwise(
        F.when(real_std, F.abs(z) > F.lit(z_threshold)).otherwise(
            F.abs(F.col("value") - F.col("hist_mean")) > noise
        )
    )
    return j.select(
        "part",
        "metric",
        "value",
        F.coalesce(F.col("hist_n"), F.lit(0)).alias("hist_n"),
        "hist_mean",
        "hist_std",
        F.when(real_std, z).alias("z"),
        pct.alias("pct_change"),
        flag.alias("flag"),
    )
