"""Per-partition quality scores + verdicts — the reference's report math.

Reference formulas (each cited; computed here as Column expressions over the
tiny metrics frame, so scoring costs zero scans of the fact table):

- missing score  = 1 − total_missing / (rows × n_checked_cols)
  (/root/reference/dataset_checker/checks/missing_values.py:50-51)
- duplicates score = 1 − duplicate_pct/100, duplicate_pct = dups/rows×100
  (checks/duplicates.py:127-132)
- outliers score = 1 − total_outliers / (rows × n_numeric_cols); the token
  table has one numeric check column (n_tok) (checks/outliers.py:109-111);
  the reference default method is zscore (checker.py:165), so the z-score
  count feeds the score and IQR rows are reported as violations only.
- format score  = 1 − total_issues / (rows × n_rules) (checks/data_format.py:57-59)
- balance score = normalized entropy of the source distribution
  (checks/data_balance.py:52-61)
- distribution score = 1 − (0.7·min(|skew|/3,1) + 0.3·min(|kurt|/5,1))
  (checks/data_distribution.py:116-130); constant columns score 0-penalty
  (skew=kurt=0, data_distribution.py:83-87)
- overall = Σ wᵢ·scoreᵢ / Σ wᵢ with weights missing 1.0, outliers 0.8,
  duplicates 0.9, format 0.7, balance 0.6, distribution 0.5
  (report.py:48-70); verdict PASS ⇔ overall ≥ 0.8 (main.py:89, config.py:52)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.checks.column_stats import GLOBAL_PART
from ultragendataset_datachecker_spark.config import EngineConfig

N_FORMAT_RULES = 4  # fmt_ntok_mismatch, fmt_token_range, fmt_empty_tokens, fmt_doc_id


def _entropy_expr(metrics: DataFrame, cfg: EngineConfig) -> Column:
    """Normalized Shannon entropy of the source histogram columns (balance
    score). Matches data_balance.py:52-58: probabilities over non-null values,
    normalized by log2(n_classes_present); single class or empty → 0.0 with
    imbalance handling per :43-45 (entropy 0 when n_classes <= 1)."""
    cols = [F.coalesce(F.col(f"`source_hist:{b}`"), F.lit(0)).cast("double")
            for b in list(cfg.allowed_sources) + ["__other__"]]
    total = sum(cols[1:], cols[0])
    terms = []
    nclasses = None
    for c in cols:
        p = c / total
        term = F.when(c > 0, -p * F.log2(p)).otherwise(F.lit(0.0))
        terms.append(term)
        ind = F.when(c > 0, 1).otherwise(0)
        nclasses = ind if nclasses is None else nclasses + ind
    ent = sum(terms[1:], terms[0])
    return (
        F.when((total > 0) & (nclasses > 1), ent / F.log2(nclasses.cast("double")))
        .otherwise(F.lit(0.0))
    )


def compute_scores(
    metrics: DataFrame,
    violation_counts: DataFrame,
    cfg: EngineConfig,
    class_entropy: DataFrame | None = None,
) -> DataFrame:
    """metrics: output of compute_metrics (per part + global rollup row).
    violation_counts: (part, check_name, n) from the violations table.
    class_entropy: optional (part, balance_entropy) frame with the EXACT
    value_counts entropy (reference semantics, data_balance.py:31-58); when
    absent, falls back to the fixed-bucket histogram entropy (allowed sources
    + one merged __other__ class — diverges from the reference only when a
    partition holds >1 distinct disallowed source).
    Returns one row per part with all six scores + overall + verdict."""
    pc = cfg.partition_col

    # Violations carry real part ids only; the GLOBAL rollup metrics row
    # (part = GLOBAL_PART) must see dataset-wide counts or its duplicates /
    # outliers scores degenerate to 1.0 (reference computes the whole-dataset
    # weighted score over true totals, report.py:48-70). Union in a global
    # aggregate before pivoting.
    vc_base = violation_counts.select("part", "check_name", "n")
    global_counts = (
        vc_base.groupBy("check_name")
        .agg(F.sum("n").alias("n"))
        .select(F.lit(GLOBAL_PART).alias("part"), "check_name", "n")
    )
    violation_counts = vc_base.unionByName(global_counts)

    # pivot the relevant violation counts onto the metrics rows
    needed = {"duplicate_tokens": "dup_rows", "ntok_outlier_zscore": "zscore_outliers"}
    vc = (
        violation_counts.where(F.col("check_name").isin(list(needed)))
        .groupBy("part")
        .pivot("check_name", list(needed))
        .sum("n")
    )
    for src, dst in needed.items():
        vc = vc.withColumnRenamed(src, dst)

    m = metrics.join(vc, metrics[pc] == vc["part"], "left").drop(vc["part"])
    if class_entropy is not None:
        ce = class_entropy.select(
            F.col("part").alias("_ce_part"), F.col("balance_entropy").alias("_ce_ent")
        )
        m = m.join(ce, m[pc] == ce["_ce_part"], "left").drop("_ce_part")
    rows = F.col("row_count").cast("double")
    dup_rows = F.coalesce(F.col("dup_rows"), F.lit(0)).cast("double")
    z_out = F.coalesce(F.col("zscore_outliers"), F.lit(0)).cast("double")

    total_missing = sum(
        (F.coalesce(F.col(f"null_{c}"), F.lit(0)) for c in cfg.checked_columns[1:]),
        F.coalesce(F.col(f"null_{cfg.checked_columns[0]}"), F.lit(0)),
    ).cast("double")
    n_cols = len(cfg.checked_columns)

    fmt_issues = (
        F.coalesce(F.col("fmt_ntok_mismatch"), F.lit(0))
        + F.coalesce(F.col("fmt_token_range"), F.lit(0))
        + F.coalesce(F.col("fmt_empty_tokens"), F.lit(0))
        + F.coalesce(F.col("fmt_doc_id"), F.lit(0))
    ).cast("double")

    skew = F.coalesce(F.col("ntok_skew"), F.lit(0.0))
    kurt = F.coalesce(F.col("ntok_kurt"), F.lit(0.0))
    dist_penalty = 0.7 * F.least(F.abs(skew) / 3, F.lit(1.0)) + 0.3 * F.least(
        F.abs(kurt) / 5, F.lit(1.0)
    )

    scores = {
        "missing_values": F.when(rows > 0, 1.0 - total_missing / (rows * n_cols)).otherwise(F.lit(1.0)),
        "duplicates": F.when(rows > 0, 1.0 - dup_rows / rows).otherwise(F.lit(1.0)),
        "outliers": F.when(rows > 0, 1.0 - z_out / rows).otherwise(F.lit(1.0)),
        "data_format": F.when(rows > 0, 1.0 - fmt_issues / (rows * N_FORMAT_RULES)).otherwise(F.lit(1.0)),
        "data_balance": (
            F.coalesce(F.col("_ce_ent"), F.lit(0.0))
            if class_entropy is not None
            else _entropy_expr(m, cfg)
        ),
        "data_distribution": 1.0 - dist_penalty,
    }
    w = cfg.score_weights
    total_w = sum(w[k] for k in scores)

    # scores are quantized to 12 dp: floating-point aggregation merges
    # (skewness/stddev partial-agg trees) differ in the last ~2 ulps across
    # parallelism levels; quantization makes verdicts byte-identical at
    # local[8] vs local[32] (BASELINE.md protocol step 5) without touching
    # any digit a consumer could care about
    out = m.select(
        F.col(pc).alias("part"),
        F.col("row_count"),
        *[F.round(expr, 12).alias(f"score_{name}") for name, expr in scores.items()],
    )
    names = list(scores)
    overall = sum(
        (F.col(f"score_{k}") * F.lit(w[k]) for k in names[1:]),
        F.col(f"score_{names[0]}") * F.lit(w[names[0]]),
    ) / F.lit(total_w)
    out = out.withColumn("overall_score", F.round(overall, 12))
    return out.withColumn(
        "verdict",
        F.when(F.col("overall_score") >= cfg.pass_threshold, F.lit("pass")).otherwise(F.lit("fail")),
    )
