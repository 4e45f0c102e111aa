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
from ultragendataset_datachecker_spark.checks.column_stats import GLOBAL_PART, ntok_bucket_labels


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


def ks_chi2_scores(metrics: DataFrame, baseline: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Per (part, check_name): two-sample KS statistic, bucket-index
    Wasserstein-1, and chi-squared homogeneity statistic vs the baseline —
    the classical complements to KL/PSI (data_distribution.py:98-114 uses a
    normality TEST; at scale the testable question is current-vs-baseline
    homogeneity, and KS/chi2 are its standard statistics).

    Everything runs on the already-aggregated histogram frame
    (O(parts × buckets) rows): ZERO additional passes over the corpus.
    KS/W1 need a bucket ORDER, so they are emitted only for ``n_tok_hist``
    (NULL for the categorical ``source_hist``); W1 uses unit bucket-index
    spacing (the edges are config-fixed, so the index metric is stable and
    comparable across runs — documented as bucket-granularity W1).
    chi-squared uses eps-smoothed baseline mass like the KL/PSI path and
    emits ``dof`` = buckets − 1 alongside the statistic.
    """
    eps = cfg.drift_smoothing_eps
    cur = histograms_long(metrics, cfg).where(F.col("part") != GLOBAL_PART)
    j = cur.join(
        F.broadcast(baseline.select("check_name", "bucket", F.col("prob").alias("q"))),
        on=["check_name", "bucket"],
        how="left",
    ).withColumn("q", F.coalesce(F.col("q"), F.lit(0.0)))
    # deterministic bucket order: ntok buckets by their config position,
    # source buckets lexicographic (order only matters for the ordered stats)
    ntok_order = F.array(*[F.lit(b) for b in ntok_bucket_labels(cfg)])
    j = j.withColumn(
        "_idx",
        F.when(
            F.col("check_name") == "n_tok_hist",
            F.array_position(ntok_order, F.col("bucket")).cast("int"),
        ).otherwise(F.lit(None).cast("int")),
    )
    w = (
        Window.partitionBy("part", "check_name")
        .orderBy(F.coalesce(F.col("_idx"), F.lit(0)), "bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tot = F.sum("count").over(Window.partitionBy("part", "check_name"))
    e = n_tot * (F.col("q") + F.lit(eps))
    j = (
        j.withColumn("_cum_p", F.sum("prob").over(w))
        .withColumn("_cum_q", F.sum("q").over(w))
        .withColumn("_chi", F.pow(F.col("count") - e, F.lit(2.0)) / e)
    )
    ordered = F.col("check_name") == "n_tok_hist"
    gap = F.abs(F.col("_cum_p") - F.col("_cum_q"))
    return (
        j.groupBy("part", "check_name")
        .agg(
            F.max(F.when(ordered, gap)).alias("ks"),
            F.sum(F.when(ordered, gap)).alias("w1_buckets"),
            F.sum("_chi").alias("chi2"),
            (F.count(F.lit(1)) - 1).cast("int").alias("dof"),
        )
        .select("part", "check_name", "ks", "w1_buckets", "chi2", "dof")
    )


def ecdf_drift(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """EXACT per-group two-sample KS / Wasserstein-1 / chi-squared of an
    integer-valued column's distribution against the pooled (global)
    distribution — the distinct-VALUE analogue of the fixed-bucket
    ``ks_chi2_scores`` (no bucketing error).

    Scale shape: ONE corpus pass (groupBy(group, value) with map-side partial
    aggregation — the shuffle carries distinct (group, value) pairs, never
    rows); the global histogram, totals, dense group×value grid, window
    cumsums and the three statistics are all computed on that aggregated
    frame, O(|groups| × |distinct values|). For token-length-like columns
    |distinct values| is a few thousand regardless of corpus size.

    KS is exact because both ECDFs are right-continuous step functions that
    jump only at observed values: on each interval between consecutive
    merged values the difference is constant, so evaluating post-jump at
    every value in the union set covers the whole line. W1 integrates
    |ECDF_g − ECDF_pool| with true value gaps (the classic CDF form of
    earth-mover distance). chi2 expects e = n_g · pooled_mass (no smoothing
    needed: the pooled set contains every observed value, so e > 0).

    Returns (group, ks, w1, chi2, dof, n) — dof = |values| − 1.
    """
    v = F.col(value_col)
    g = F.col(group_col)
    base = df.where(g.isNotNull() & v.isNotNull()).select(
        g.alias("_g"), v.alias("_v")
    )
    counts = base.groupBy("_g", "_v").agg(F.count(F.lit(1)).alias("_c"))
    pooled = counts.groupBy("_v").agg(F.sum("_c").alias("_pool"))
    group_tot = counts.groupBy("_g").agg(F.sum("_c").alias("_t"))
    grand_tot = pooled.agg(F.sum("_pool").alias("_tt"))
    grid = (
        group_tot.crossJoin(F.broadcast(pooled))
        .join(counts, on=["_g", "_v"], how="left")
        .withColumn("_c", F.coalesce(F.col("_c"), F.lit(0)))
        .crossJoin(F.broadcast(grand_tot))
    )
    cum = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt = F.lead("_v").over(Window.partitionBy("_g").orderBy("_v"))
    # integer cumsums; the ONLY float ops are the final divisions — both
    # engines (Spark / any ANSI oracle) reproduce them bit-for-bit
    grid = (
        grid.withColumn("_cum_c", F.sum("_c").over(cum))
        .withColumn("_cum_pool", F.sum("_pool").over(cum))
        .withColumn("_nv", nxt)
    )
    diff = F.abs(
        F.col("_cum_c") / F.col("_t") - F.col("_cum_pool") / F.col("_tt")
    )
    e = F.col("_t") * F.col("_pool") / F.col("_tt")
    grid = (
        grid.withColumn("_diff", diff)
        .withColumn("_gap", (F.col("_nv") - F.col("_v")).cast("double"))
        .withColumn("_chi", F.pow(F.col("_c") - e, F.lit(2.0)) / e)
    )
    return (
        grid.groupBy(F.col("_g").alias(group_col))
        .agg(
            F.max("_diff").alias("ks"),
            F.sum(F.col("_diff") * F.coalesce(F.col("_gap"), F.lit(0.0))).alias("w1"),
            F.sum("_chi").alias("chi2"),
            (F.count(F.lit(1)) - 1).cast("int").alias("dof"),
            F.max("_t").alias("n"),
        )
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


def ecdf_drift_two(
    cur: DataFrame,
    base: DataFrame,
    value_col: str,
    group_col: str | None = None,
    eps: float = 1e-6,
) -> DataFrame:
    """Two-SNAPSHOT exact drift: per group, KS / Wasserstein-1 / chi-squared
    between the current table's distribution of ``value_col`` and a baseline
    table's — the distinct-value-precision form of the engine's
    histogram-vs-baseline check (no bucketing error), for when both
    snapshots are queryable (Iceberg time travel, a retained copy).

    Same scale shape as ecdf_drift: each side is reduced by ONE
    groupBy(group, value) pass (map-side partial agg; the shuffle carries
    distinct pairs, never rows); the merged value grid is the full outer
    join of the two count frames, and the statistics run on
    O(groups × merged values) rows. chi-squared expects
    e = n_cur · (baseline mass + eps) — eps-smoothed like drift_scores,
    because a value unseen in the baseline has zero expected mass.

    Returns (group_col?, ks, w1, chi2, dof, n_cur, n_base).
    """
    def counts(df: DataFrame, side: str) -> DataFrame:
        g = F.col(group_col) if group_col else F.lit(0)
        v = F.col(value_col)
        return (
            df.where(v.isNotNull() & (g.isNotNull() if group_col else F.lit(True)))
            .groupBy(g.alias("_g"), v.alias("_v"))
            .agg(F.count(F.lit(1)).alias(f"_c_{side}"))
        )

    cc = counts(cur, "cur")
    cb = counts(base, "base")
    grid = (
        cc.join(cb, on=["_g", "_v"], how="full_outer")
        .withColumn("_c_cur", F.coalesce(F.col("_c_cur"), F.lit(0)))
        .withColumn("_c_base", F.coalesce(F.col("_c_base"), F.lit(0)))
    )
    tots = grid.groupBy("_g").agg(
        F.sum("_c_cur").alias("_t_cur"), F.sum("_c_base").alias("_t_base")
    )
    grid = grid.join(F.broadcast(tots), on="_g")
    w = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt = F.lead("_v").over(Window.partitionBy("_g").orderBy("_v"))
    grid = (
        grid.withColumn("_cum_cur", F.sum("_c_cur").over(w))
        .withColumn("_cum_base", F.sum("_c_base").over(w))
        .withColumn("_nv", nxt)
    )
    diff = F.abs(
        F.col("_cum_cur") / F.col("_t_cur") - F.col("_cum_base") / F.col("_t_base")
    )
    e = F.col("_t_cur") * (F.col("_c_base") / F.col("_t_base") + F.lit(eps))
    grid = (
        grid.withColumn("_diff", diff)
        .withColumn("_gap", (F.col("_nv") - F.col("_v")).cast("double"))
        .withColumn("_chi", F.pow(F.col("_c_cur") - e, F.lit(2.0)) / e)
    )
    out = grid.groupBy("_g").agg(
        F.max("_diff").alias("ks"),
        F.sum(F.col("_diff") * F.coalesce(F.col("_gap"), F.lit(0.0))).alias("w1"),
        F.sum("_chi").alias("chi2"),
        (F.count(F.lit(1)) - 1).cast("int").alias("dof"),
        F.max("_t_cur").alias("n_cur"),
        F.max("_t_base").alias("n_base"),
    )
    if group_col:
        return out.withColumnRenamed("_g", group_col)
    return out.drop("_g")
