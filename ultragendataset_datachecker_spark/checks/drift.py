"""KL / PSI distribution-drift checks against a baseline histogram snapshot.

Generalizes the reference's distribution + balance checks
(/root/reference/dataset_checker/checks/data_distribution.py:98-114 normality
test; checks/data_balance.py:52-58 entropy) into the scale-appropriate form:
per-partition histograms with *fixed, versioned* bucket edges compared to a
baseline snapshot by equi-join on (check_name, bucket) — deterministic,
pure-SQL, and O(parts × buckets) after the fused metrics pass (the histogram
counts ride along in the single scan; see checks/column_stats.py).

Baseline snapshot schema (FIXTURES.md §3):
    (check_name:string, bucket:string, prob:double, snapshot_id:string)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.config import EngineConfig
from ultragendataset_datachecker_spark.checks.column_stats import GLOBAL_PART


HIST_CHECKS = ("n_tok_hist", "source_hist")
_PREFIX = {"n_tok_hist": "ntok_hist:", "source_hist": "source_hist:"}


def histograms_long(metrics: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Unpivot the metrics frame's histogram columns to
    (part, check_name, bucket, count, prob). Tiny frame — no scan of the fact
    table."""
    hist_cols = [c for c in metrics.columns if c.startswith(("ntok_hist:", "source_hist:"))]
    pieces = []
    for check, prefix in _PREFIX.items():
        cols = [c for c in hist_cols if c.startswith(prefix)]
        stack_expr = F.array(*[
            F.struct(
                F.lit(check).alias("check_name"),
                F.lit(c[len(prefix):]).alias("bucket"),
                F.coalesce(F.col(f"`{c}`"), F.lit(0)).cast("long").alias("count"),
            )
            for c in cols
        ])
        pieces.append(
            metrics.select(F.col(cfg.partition_col).alias("part"), F.explode(stack_expr).alias("h"))
            .select("part", "h.check_name", "h.bucket", "h.count")
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    wsum = F.sum("count").over(Window.partitionBy("part", "check_name"))
    return out.withColumn("prob", F.when(wsum > 0, F.col("count") / wsum).otherwise(F.lit(0.0)))


def build_baseline(metrics: DataFrame, cfg: EngineConfig, snapshot_id: str,
                   exclude_parts: list[int] | None = None) -> DataFrame:
    """Build a baseline snapshot from the GLOBAL rollup row (or from all
    non-excluded partitions summed)."""
    hl = histograms_long(metrics, cfg)
    if exclude_parts:
        hl = hl.where(~F.col("part").isin(exclude_parts) & (F.col("part") != GLOBAL_PART))
        hl = hl.groupBy("check_name", "bucket").agg(F.sum("count").alias("count"))
        hl = hl.withColumn(
            "prob", F.col("count") / F.sum("count").over(Window.partitionBy("check_name"))
        )
    else:
        hl = hl.where(F.col("part") == GLOBAL_PART)
    return hl.select(
        "check_name", "bucket", F.col("prob").cast("double").alias("prob"),
        F.lit(snapshot_id).alias("snapshot_id"),
    )


def drift_scores(metrics: DataFrame, baseline: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Per (part, check_name): KL divergence and PSI vs the baseline.

    KL  = Σ p·ln(p/q);  PSI = Σ (p−q)·ln(p/q), with ε-smoothing on both sides
    (fixed buckets ⇒ the join is a tiny equi-join on (check_name, bucket)).
    """
    eps = cfg.drift_smoothing_eps
    cur = histograms_long(metrics, cfg).where(F.col("part") != GLOBAL_PART)
    j = cur.join(
        F.broadcast(baseline.select("check_name", "bucket", F.col("prob").alias("q"))),
        on=["check_name", "bucket"],
        how="left",
    )
    p = F.col("prob") + F.lit(eps)
    q = F.coalesce(F.col("q"), F.lit(0.0)) + F.lit(eps)
    lr = F.log(p / q)
    return (
        j.groupBy("part", "check_name")
        .agg(
            F.sum(p * lr).alias("kl"),
            F.sum((p - q) * lr).alias("psi"),
        )
        .select("part", "check_name", "kl", "psi")
    )
