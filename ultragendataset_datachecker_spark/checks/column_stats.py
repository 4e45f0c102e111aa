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


def _agg_spec(cfg: EngineConfig) -> list[tuple[str, Column, str | None, bool]]:
    """The full aggregate spec: (alias, expression, global_merge, imperative).

    ``global_merge`` says how the GLOBAL rollup value derives EXACTLY from
    the per-partition values ("sum" / "min" / "max" — exact for integer and
    decimal aggregates) or ``None`` when it cannot (float accumulators,
    sketches) and the global value must be re-aggregated over the rows.
    ``imperative`` marks TypedImperativeAggregate functions
    (percentile/percentile_approx, HLL++): ONE of them in an Aggregate
    forces the whole operator to ObjectHashAggregateExec — no whole-stage
    codegen for every other aggregate in the same pass — so compute_metrics
    runs them in their own pass (guide §1/§4: measured 8.2s fused vs
    2.3s + 1.5s split per 20M rows)."""
    n = F.col("n_tok")
    qs = [0.25, 0.5, 0.75]
    if cfg.exact_quantiles:
        quant = F.percentile(n, F.lit(qs))
    else:
        quant = F.percentile_approx(n, F.lit(qs), F.lit(cfg.approx_quantile_accuracy))

    spec: list[tuple[str, Column, str | None, bool]] = [
        ("row_count", F.count(F.lit(1)), "sum", False),
        # missing (ref missing_values.py:39-47); tokens-null ≡ tok_size-null
        ("null_doc_id", F.sum(F.col("doc_id").isNull().cast("long")), "sum", False),
        ("null_tokens", F.sum(F.col("tok_size").isNull().cast("long")), "sum", False),
        ("null_n_tok", F.sum(F.col("n_tok").isNull().cast("long")), "sum", False),
        ("null_source", F.sum(F.col("source").isNull().cast("long")), "sum", False),
        # descriptive stats (ref data_distribution.py:60-68; std is sample
        # ddof=1 like pandas .std)
        ("ntok_count", F.count(n), "sum", False),
        ("ntok_mean", F.mean(n), None, False),
        ("ntok_std", F.stddev_samp(n), None, False),
        ("ntok_std_pop", F.stddev_pop(n), None, False),  # scipy zscore ddof=0
        ("ntok_min", F.min(n), "min", False),
        ("ntok_max", F.max(n), "max", False),
        ("ntok_quantiles", quant, None, True),
        # moments (ref data_distribution.py:91-96: scipy skew/kurtosis with
        # bias=True == Spark's population skewness / excess kurtosis)
        ("ntok_skew", F.skewness(n), None, False),
        ("ntok_kurt", F.kurtosis(n), None, False),
        # distinct counts (HLL++; SURVEY A24)
        ("doc_id_approx_distinct", F.approx_count_distinct("doc_id"), None, True),
        ("source_approx_distinct", F.approx_count_distinct("source"), None, True),
        # token-level aggregate: total tokens in the partition
        ("token_total", F.sum(F.coalesce(F.col("tok_size"), F.lit(0)).cast("long")), "sum", False),
        # order-independent partition content digest (prepare.row_digest_expr)
        # — rides along for free; persisted in the manifest metrics_json so
        # cfg.resume_by_content can skip unchanged partitions across
        # snapshots. Decimal sums are associative and exact, so summing the
        # per-partition digests IS the global digest.
        ("part_digest", F.sum(row_digest_expr(cfg.digest_include_tokens, h1=F.col("h1"))), "sum", False),
    ]
    for name, cond in format_issue_conditions(cfg).items():
        spec.append((name, F.sum(cond.cast("long")), "sum", False))
    for prefix, conds in (
        ("ntok_hist", ntok_bucket_conditions(cfg)),
        ("source_hist", source_bucket_conditions(cfg)),
    ):
        for label, c in conds.items():
            spec.append((f"{prefix}:{label}", F.sum(c.cast("long")), "sum", False))
    return spec


def metrics_aggregates(cfg: EngineConfig) -> list[Column]:
    """The full aggregate-expression list for a fused single pass (kept for
    callers that want the one-Aggregate form; compute_metrics itself splits
    the pass — see _agg_spec)."""
    return [expr.alias(name) for name, expr, _, _ in _agg_spec(cfg)]


def _group_key(cfg: EngineConfig) -> Column:
    """Per-partition grouping key: a genuinely-NULL partition value folds
    into GLOBAL_PART exactly like the rollup+coalesce form did, and the
    join key is never null (equi-joins drop null keys)."""
    return F.coalesce(F.col(cfg.partition_col), F.lit(GLOBAL_PART)).cast("int").alias(
        cfg.partition_col
    )


def imp_per_part_frame(source: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Per-partition frame of the imperative (sketch) aggregates —
    percentile/percentile_approx + the two HLL++ distinct counts.

    ``source`` may be the narrow projection OR any frame with the same row
    multiset carrying (partition_col, doc_id, n_tok, source): the sketch
    aggregates touch no derived column, so the engine feeds them the
    column-pruned FACT scan and overlaps this pass with the narrow-store
    build (guide §2.6) — the parquet reader decodes 3 scalar columns
    instead of re-reading full narrow rows.

    Two ``_b_``-prefixed n_tok moment columns (mean, population std) ride
    along so the engine can derive the outlier-bounds frame for the
    row-violation pass from THIS phase-0 frame instead of waiting for the
    full metrics frame (guide §2.6 — it unserializes the pass-2 scan from
    the declarative metrics scan). They add two float accumulators to an
    aggregation that already exists — no extra pass — and compute_metrics's
    final column select drops them, so the metrics output is unchanged.
    The values agree with the metrics frame's ntok_mean/ntok_std_pop to
    FP merge-order noise (~1e-15 rel), which the engine's 9-dp bound
    quantization absorbs by design (engine._outlier_stats)."""
    n = F.col("n_tok")
    spec = _agg_spec(cfg)
    imp = [expr.alias(name) for name, expr, _, is_imp in spec if is_imp]
    imp += [
        F.mean(n).alias("_b_ntok_mean"),
        F.stddev_pop(n).alias("_b_ntok_std_pop"),
    ]
    return source.groupBy(_group_key(cfg)).agg(*imp)


def glob_rest_frame(source: DataFrame, cfg: EngineConfig) -> DataFrame:
    """One-row frame of the global non-mergeable aggregates (float moment
    accumulators + sketches) — same whole-input accumulation the rollup's
    global cell performed. Same source contract as imp_per_part_frame."""
    spec = _agg_spec(cfg)
    return source.agg(
        *[expr.alias(name) for name, expr, merge, _ in spec if merge is None]
    )


def compute_metrics(
    narrow: DataFrame,
    cfg: EngineConfig,
    cache_registry: list | None = None,
    imp_per_part: DataFrame | None = None,
    glob_rest: DataFrame | None = None,
) -> DataFrame:
    """Per-partition metrics rows + one global rollup row (part =
    GLOBAL_PART) over the NARROW projection (prepare.narrow_projection).

    Output is column-for-column the round-5 ``rollup(part).agg(...)`` form,
    restructured for CPU (guide §1.2 step 2 — the pass is compute-bound, no
    shuffle of substance):

    - the rollup's Expand fed every row through the aggregates TWICE (once
      for its partition group, once for the global group) — the global
      values of all integer/decimal aggregates are instead derived EXACTLY
      by merging the per-partition results (sums of longs/decimals, min of
      mins, max of maxs: associative), and only the float accumulators and
      sketches re-aggregate over the rows;
    - percentile/HLL++ are TypedImperativeAggregates: one of them in an
      Aggregate downgrades the whole operator to ObjectHashAggregateExec
      (no codegen for the other ~40 aggregates). They run in their own
      small pass; the declarative pass keeps whole-stage codegen.

    Per-partition float/sketch values use the same accumulators on the same
    rows as the rollup form; global float/sketch values re-aggregate the
    same rows the rollup's global cell saw. All three aggregates hang off
    one action, so the scheduler overlaps them across the cached scan.

    ``imp_per_part`` / ``glob_rest`` optionally inject pre-materialized
    copies of the sketch-bearing sub-frames (imp_per_part_frame /
    glob_rest_frame over the column-pruned fact scan): those passes read no
    derived column, so the engine computes them CONCURRENTLY with the
    narrow-store build and hands the cached results in here. Same
    expressions over the same row multiset — output identical.
    """
    pc = cfg.partition_col
    spec = _agg_spec(cfg)
    order = [name for name, _, _, _ in spec]
    decl = [expr.alias(name) for name, expr, _, imp in spec if not imp]

    gkey = _group_key(cfg)
    per_decl = narrow.groupBy(gkey).agg(*decl)
    per_imp = imp_per_part if imp_per_part is not None else imp_per_part_frame(narrow, cfg)
    per_part = per_decl.join(per_imp, on=pc, how="inner")
    if cache_registry is not None:
        # The global-merge aggregate below re-reads per_part; without a
        # cache Catalyst re-plans the whole per-partition aggregate subtree
        # under it (a fourth full scan+agg of the narrow store, visible in
        # the r6 plan audit). per_part is O(partitions) rows; the eager
        # count materializes it in ONE job whose decl and imp aggregate
        # stages the scheduler overlaps. Caller owns unpersist via the
        # registry (ValidationResult.unpersist).
        from pyspark.storagelevel import StorageLevel

        per_part = per_part.persist(StorageLevel.MEMORY_AND_DISK)
        cache_registry.append(per_part)
        per_part.count()

    # GLOBAL row: exact merge of the mergeable per-partition values...
    merge_exprs: list[Column] = []
    for name, _, merge, imp in spec:
        if merge == "sum":
            e = F.sum(F.col(f"`{name}`"))
            if name in ("row_count", "ntok_count"):
                # rollup's global count over an empty input is 0, not null
                e = F.coalesce(e, F.lit(0))
        elif merge == "min":
            e = F.min(F.col(f"`{name}`"))
        elif merge == "max":
            e = F.max(F.col(f"`{name}`"))
        else:
            continue
        merge_exprs.append(e.alias(name))
    glob_merged = per_part.agg(*merge_exprs)
    # ...and a direct whole-input aggregate for the rest (float
    # accumulators + sketches — same accumulation the rollup's global cell
    # performed)
    if glob_rest is None:
        glob_rest = glob_rest_frame(narrow, cfg)
    glob = glob_merged.crossJoin(glob_rest)

    # same column order and part typing as the rollup form
    out_cols = [F.col(f"`{c}`") for c in order]
    return per_part.select(F.col(pc), *out_cols).unionByName(
        glob.select(F.lit(GLOBAL_PART).cast("int").alias(pc), *out_cols)
    )
