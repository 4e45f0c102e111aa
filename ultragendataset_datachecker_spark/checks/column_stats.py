"""The fused single multi-aggregate pass.

Replaces the reference's one-full-column-pass-per-check-per-column execution
(/root/reference/dataset_checker/checker.py:100-116 runs six sequential
checks; loops at checks/missing_values.py:39-47 and
checks/data_distribution.py:51-114) with ONE ``rollup("part").agg(...)``:
null counts (missing_values.py:40), descriptive stats + moments
(data_distribution.py:60-96), format-issue counts (data_format.py:43-59),
outlier prep stats (outliers.py:55-82), distinct counts (HLL++), and the
fixed-bucket histograms that feed the KL/PSI drift check — all computed in a
single scan with map-side partial aggregation, yielding one tiny row per
partition plus one global rollup row.

Scale notes:
- every aggregate here is algebraic/mergeable (count/sum/min/max, Spark's
  stable central-moment accumulators for stddev/skewness/kurtosis, HLL++ for
  distinct), so partial aggregation happens before the shuffle and the
  shuffled data is O(parts), not O(rows);
- histograms use *fixed* bucket edges from config, emitted as one
  ``sum(when(...))`` column per bucket — no second groupBy, no extra shuffle;
- quantiles: exact ``percentile`` for oracle parity at test scale,
  ``percentile_approx`` (mergeable KLL-like sketch) on the 10^12-row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.config import EngineConfig
from ultragendataset_datachecker_spark.prepare import row_digest_expr


GLOBAL_PART = -1  # rollup row marker in the metrics output


def _nnul(c: str) -> Column:
    return F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")


def format_issue_conditions(cfg: EngineConfig) -> dict[str, Column]:
    """Row-level format predicates over the NARROW projection (True =
    violation). Nulls count as valid, matching the reference
    (data_format.py:52 ``if pd.notnull(x) else True``).

    The four rules are the token-table analogue of the reference's format
    registry (email/phone/date/... at data_format.py:145-158):
      - declared-count consistency  n_tok == size(tokens)
      - token element range         all t in [0, vocab) — via array_min/max
        (NOT exists/forall: higher-order lambdas are interpreted per element
        and were the top cost in profiling)
      - non-empty sequence          size(tokens) > 0   (text min-length
        analogue, /root/reference/dataset_checker.py:72-76)
      - doc_id format               ^doc_\\d{10}$
    """
    has = F.col("tok_size").isNotNull()
    return {
        "fmt_ntok_mismatch": has & F.col("n_tok").isNotNull()
        & (F.col("tok_size") != F.col("n_tok")),
        "fmt_token_range": has
        & ((F.col("tok_min") < 0) | (F.col("tok_max") >= F.lit(cfg.vocab_size))),
        "fmt_empty_tokens": has & (F.col("tok_size") == F.lit(0)),
        "fmt_doc_id": F.col("doc_id").isNotNull()
        & ~F.col("doc_id").rlike(cfg.doc_id_pattern),
    }


def ntok_bucket_labels(cfg: EngineConfig) -> list[str]:
    edges = list(cfg.ntok_bucket_edges)
    labels = [f"[{lo},{hi})" for lo, hi in zip(edges[:-1], edges[1:])]
    return [f"(-inf,{edges[0]})"] + labels + [f"[{edges[-1]},inf)"]


def ntok_bucket_conditions(cfg: EngineConfig) -> dict[str, Column]:
    """Fixed-edge histogram membership predicates for n_tok (nulls excluded)."""
    n = F.col("n_tok")
    edges = list(cfg.ntok_bucket_edges)
    out: dict[str, Column] = {}
    labels = ntok_bucket_labels(cfg)
    out[labels[0]] = n.isNotNull() & (n < F.lit(edges[0]))
    for i, (lo, hi) in enumerate(zip(edges[:-1], edges[1:])):
        out[labels[i + 1]] = n.isNotNull() & (n >= F.lit(lo)) & (n < F.lit(hi))
    out[labels[-1]] = n.isNotNull() & (n >= F.lit(edges[-1]))
    return out


def source_bucket_conditions(cfg: EngineConfig) -> dict[str, Column]:
    """Source histogram buckets: one per allowed source + __other__ (fixed,
    config-derived — keeps the histogram inside the single agg pass)."""
    s = F.col("source")
    out = {src: s.isNotNull() & (s == F.lit(src)) for src in cfg.allowed_sources}
    out["__other__"] = s.isNotNull() & ~s.isin(list(cfg.allowed_sources))
    return out


def _hist_aggs(prefix: str, conds: dict[str, Column]) -> list[Column]:
    return [F.sum(c.cast("long")).alias(f"{prefix}:{label}") for label, c in conds.items()]


def metrics_aggregates(cfg: EngineConfig) -> list[Column]:
    """The full aggregate-expression list for the fused pass."""
    n = F.col("n_tok")
    qs = [0.25, 0.5, 0.75]
    if cfg.exact_quantiles:
        quant = F.percentile(n, F.lit(qs)).alias("ntok_quantiles")
    else:
        quant = F.percentile_approx(n, F.lit(qs), F.lit(cfg.approx_quantile_accuracy)).alias(
            "ntok_quantiles"
        )

    aggs: list[Column] = [
        F.count(F.lit(1)).alias("row_count"),
        # missing (ref missing_values.py:39-47); tokens-null ≡ tok_size-null
        _nnul("doc_id"),
        F.sum(F.col("tok_size").isNull().cast("long")).alias("null_tokens"),
        _nnul("n_tok"), _nnul("source"),
        # descriptive stats (ref data_distribution.py:60-68; std is sample
        # ddof=1 like pandas .std)
        F.count(n).alias("ntok_count"),
        F.mean(n).alias("ntok_mean"),
        F.stddev_samp(n).alias("ntok_std"),
        F.stddev_pop(n).alias("ntok_std_pop"),   # scipy zscore default ddof=0
        F.min(n).alias("ntok_min"),
        F.max(n).alias("ntok_max"),
        quant,
        # moments (ref data_distribution.py:91-96: scipy skew/kurtosis with
        # bias=True == Spark's population skewness / excess kurtosis)
        F.skewness(n).alias("ntok_skew"),
        F.kurtosis(n).alias("ntok_kurt"),
        # distinct counts (HLL++; SURVEY A24)
        F.approx_count_distinct("doc_id").alias("doc_id_approx_distinct"),
        F.approx_count_distinct("source").alias("source_approx_distinct"),
        # token-level aggregate: total tokens in the partition
        F.sum(F.coalesce(F.col("tok_size"), F.lit(0)).cast("long")).alias("token_total"),
        # order-independent partition content digest (prepare.row_digest_expr)
        # — rides along for free; persisted in the manifest metrics_json so
        # cfg.resume_by_content can skip unchanged partitions across snapshots
        F.sum(
            row_digest_expr(cfg.digest_include_tokens, h1=F.col("h1"))
        ).alias("part_digest"),
    ]
    for name, cond in format_issue_conditions(cfg).items():
        aggs.append(F.sum(cond.cast("long")).alias(name))
    aggs += _hist_aggs("ntok_hist", ntok_bucket_conditions(cfg))
    aggs += _hist_aggs("source_hist", source_bucket_conditions(cfg))
    return aggs


def compute_metrics(narrow: DataFrame, cfg: EngineConfig) -> DataFrame:
    """One pass over the NARROW projection (see prepare.narrow_projection) →
    per-partition metrics rows + one global rollup row (part = GLOBAL_PART).
    GROUPING SETS keeps it a single pass."""
    out = narrow.rollup(cfg.partition_col).agg(*metrics_aggregates(cfg))
    return out.withColumn(
        cfg.partition_col,
        F.coalesce(F.col(cfg.partition_col), F.lit(GLOBAL_PART)).cast("int"),
    )
