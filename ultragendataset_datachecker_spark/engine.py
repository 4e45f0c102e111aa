"""ValidationEngine — orchestrates the full per-partition validation run.

The Spark lifecycle (SURVEY.md §3.4) replacing the reference's eager
sequential method chain (/root/reference/dataset_checker/checker.py:67-118):

  scan (partition-pruned by the checkpoint manifest)
    → pass 1: ONE fused rollup aggregate (metrics per partition + global)
    → pass 2: ONE fused violation scan (row-local + referential + outlier
      checks; per-partition outlier bounds come from pass 1 via broadcast)
    → narrow-projection shuffles for doc_id uniqueness & token-array dedup
    → driver-free scoring/drift on the tiny metrics frame
    → verdicts + manifest append

Only metrics/verdict rows (O(partitions)) and violation rows (O(defects))
leave the executors; no row-level collect() anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ultragendataset_datachecker_spark import checkpoint as ckpt
from ultragendataset_datachecker_spark.checks import column_stats, drift as drift_mod, schema as schema_mod, uniqueness, violations as viol_mod
from ultragendataset_datachecker_spark.checks.column_stats import GLOBAL_PART
from ultragendataset_datachecker_spark.config import EngineConfig
from ultragendataset_datachecker_spark.datagen import allowed_sources_df
from ultragendataset_datachecker_spark.prepare import narrow_projection
from ultragendataset_datachecker_spark.scoring import compute_scores


@dataclass
class ValidationResult:
    metrics: DataFrame     # one row per partition + global rollup (part = -1)
    violations: DataFrame  # (part, doc_id, check_name, observed, expected) — capped
                           # to cfg.max_violation_examples per (part, check) if set
    verdicts: DataFrame    # per-partition scores, overall_score, verdict
    violation_counts: DataFrame | None = None  # (part, check_name, n) — UNCAPPED
    drift: DataFrame | None = None  # (part, check_name, kl, psi) when baseline given
    token_hist: DataFrame | None = None   # (part, bucket, n_tokens) when cfg.token_hist_buckets
    token_drift: DataFrame | None = None  # (part, n_cur, n_base, kl, psi) when token_baseline given
    skipped_parts: tuple[int, ...] = ()
    _narrow: DataFrame | None = None
    _aux_caches: tuple = ()  # small intermediate frames persisted by checks
    _violations_full: DataFrame | None = None
    _pending_manifest: tuple | None = None  # (path, snapshot_id, check_version, pc)

    def commit_manifest(self) -> bool:
        """Append the manifest rows for this run. The job CLI calls this AFTER
        metrics/violations/verdicts are durably written, so a crash mid-run
        never leaves partitions marked validated whose outputs were lost
        (write-outputs-then-commit ordering). Returns True if rows were
        written, False if the run had no manifest path or already committed."""
        if self._pending_manifest is None:
            return False
        path, snapshot_id, check_version, pc = self._pending_manifest
        ckpt.write_manifest(self.verdicts, self.metrics, path, snapshot_id, check_version, pc)
        self._pending_manifest = None
        return True

    def unpersist(self) -> None:
        for df in (self.metrics, self._violations_full, self.violations, self._narrow, *self._aux_caches):
            if df is None:
                continue
            try:
                df.unpersist()
            except Exception:
                pass
            # a localCheckpoint'ed frame (narrow_store="checkpoint") holds
            # its rows in RDD block storage, which DataFrame.unpersist does
            # not touch — release via the LogicalRDD's underlying RDD
            try:
                plan = df._jdf.queryExecution().analyzed()
                if plan.getClass().getSimpleName() == "LogicalRDD":
                    plan.rdd().unpersist(False)
            except Exception:
                pass


class ValidationEngine:
    def __init__(self, config: EngineConfig | None = None):
        self.cfg = config or EngineConfig()

    # ---- derived inputs -------------------------------------------------
    def _outlier_stats(self, metrics: DataFrame) -> DataFrame:
        """Tiny per-partition bounds frame for the fused outlier checks.
        z-score uses population std (scipy zscore ddof=0, ref outliers.py:58);
        IQR bounds Q1/Q3 ∓/± t·IQR (ref outliers.py:66-78)."""
        cfg = self.cfg
        q1 = F.col("ntok_quantiles")[0]
        q3 = F.col("ntok_quantiles")[2]
        iqr = q3 - q1
        # bounds quantized to 9 dp: FP merge-order noise (~1e-15 rel) must not
        # flip a boundary comparison between parallelism levels
        return metrics.where(F.col(cfg.partition_col) != GLOBAL_PART).select(
            cfg.partition_col,
            F.round(F.col("ntok_mean"), 9).alias("_zs_mean"),
            F.round(F.col("ntok_std_pop"), 9).alias("_zs_std"),
            F.round(q1 - F.lit(cfg.iqr_threshold) * iqr, 9).alias("_iqr_lo"),
            F.round(q3 + F.lit(cfg.iqr_threshold) * iqr, 9).alias("_iqr_hi"),
        )

    def _outlier_stats_from_imp(self, imp_per_part: DataFrame) -> DataFrame:
        """The same bounds frame derived from the phase-0 imperative frame
        (column_stats.imp_per_part_frame), which carries the quantiles plus
        ``_b_``-prefixed n_tok moments over the identical row multiset —
        available before the declarative metrics pass runs, so the
        row-violation pass need not wait for it (guide §2.6). Moment values
        agree with the metrics frame's to FP merge-order noise (~1e-15
        rel); the shared 9-dp quantization in _outlier_stats absorbs that
        by design (it exists because even one pass's own merge order is
        nondeterministic across runs/parallelism levels)."""
        return self._outlier_stats(imp_per_part.select(
            self.cfg.partition_col,
            F.col("_b_ntok_mean").alias("ntok_mean"),
            F.col("_b_ntok_std_pop").alias("ntok_std_pop"),
            F.col("ntok_quantiles"),
        ))

    def _balance_entropy(
        self,
        metrics: DataFrame,
        rogue_rows: DataFrame | None = None,
        narrow_fallback: DataFrame | None = None,
    ) -> DataFrame:
        """Exact normalized class entropy of the `source` column per partition
        + global row — value_counts semantics like the reference
        (data_balance.py:31-58), NOT the fixed allowed+__other__ buckets the
        drift histogram uses (merging several rogue sources into one class
        would understate the class count).

        Cost model (the round-2 version re-aggregated the FULL corpus by
        (part, source) — an extra map-side hash over every row): each allowed
        source already has its OWN bucket in the pass-1 histogram
        (column_stats.source_bucket_conditions), so those class counts — per
        part AND the global rollup row — are free from `metrics`. Rows whose
        source is outside the allowed set are exactly the `rogue_source`
        violation rows (one per row, `observed` = the source value), so their
        per-distinct-source counts come from the already-persisted violations
        frame — O(defects), ZERO extra passes over the corpus. The fold
        -Σp·log2 p = log2(T) − Σ c·log2 c / T needs no window."""
        cfg = self.cfg
        pc = cfg.partition_col
        allowed = list(cfg.allowed_sources)
        # (a) allowed-source class counts: unpivot pass-1 histogram columns
        # (metrics is O(parts) rows and already includes the GLOBAL row)
        amap = F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(s) for s in allowed]),
                F.array(*[F.col(f"source_hist:{s}") for s in allowed]),
            )
        )
        allowed_counts = (
            metrics.select(F.col(pc).cast("int").alias(pc), amap.alias("source", "cnt"))
            .where(F.col("cnt") > 0)  # absent classes are not value_counts classes
        )
        # (b) rogue-source counts. Fast path: the rogue_source violation rows
        # (one per row outside the allowed set, observed = source) — valid
        # only when the violation pass's dimension IS cfg.allowed_sources
        # (the default); a caller-supplied dimension can disagree with the
        # cfg-derived histogram buckets, so that path falls back to a
        # filtered corpus aggregate (still rogue-sliver-sized).
        if rogue_rows is not None:
            rogue = (
                rogue_rows
                .groupBy(F.col("part").cast("int").alias(pc), F.col("observed").alias("source"))
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
        else:
            rogue = (
                narrow_fallback.where(
                    F.col("source").isNotNull() & ~F.col("source").isin(allowed)
                )
                .groupBy(F.col(pc).cast("int").alias(pc), "source")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
        rogue_glob = (
            rogue.groupBy("source")
            .agg(F.sum("cnt").alias("cnt"))
            .select(F.lit(GLOBAL_PART).cast("int").alias(pc), "source", "cnt")
        )
        all_counts = allowed_counts.unionByName(rogue).unionByName(rogue_glob)
        per = all_counts.groupBy(pc).agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("cnt").alias("tot"),
            F.sum(F.col("cnt") * F.log2(F.col("cnt").cast("double"))).alias("sum_clogc"),
        )
        ent = F.log2(F.col("tot").cast("double")) - F.col("sum_clogc") / F.col("tot")
        return per.select(
            F.col(pc).alias("part"),
            F.when(F.col("n_classes") > 1, ent / F.log2(F.col("n_classes").cast("double")))
            .otherwise(F.lit(0.0))
            .alias("balance_entropy"),
        )

    # ---- main entry ------------------------------------------------------
    def run(
        self,
        df: DataFrame,
        allowed_sources: DataFrame | None = None,
        baseline: DataFrame | None = None,
        token_baseline: DataFrame | None = None,
        manifest_path: str | None = None,
        snapshot_id: str = "snapshot-0",
        persist: bool = True,
        extra_checks: list | None = None,
        commit_manifest: bool = True,
    ) -> ValidationResult:
        cfg = self.cfg
        spark = df.sparkSession
        if cfg.enforce_schema:
            # driver-side metadata check, zero Spark jobs: fail fast with ONE
            # message listing every contract deviation (checks/schema.py)
            schema_mod.validate_schema(df, cfg)
        # track whether the referential dimension IS cfg.allowed_sources —
        # the entropy fast path reads rogue counts off the violation rows,
        # which is only sound when both derive from the same set
        default_dimension = allowed_sources is None
        if allowed_sources is None:
            allowed_sources = allowed_sources_df(spark, list(cfg.allowed_sources))
        # literal membership predicate for the violation pass when the
        # dimension IS the cfg list (checks/violations.py: the string-keyed
        # broadcast probe measured 10x the isin chain); a caller-supplied
        # dimension frame keeps the broadcast-join form
        allowed_literal = list(cfg.allowed_sources) if default_dimension else None

        skipped: tuple[int, ...] = ()
        if manifest_path:
            done = set(ckpt.validated_parts(
                spark, manifest_path, snapshot_id, cfg.check_version,
                only_passed=cfg.resume_revalidates_failed,
            ))
            if done:
                # partition-pruning filter: `part` is the physical partition
                # column, so this prunes at the source, not post-scan
                df = df.where(~F.col(cfg.partition_col).isin(list(done)))
            if cfg.resume_by_content:
                # content-addressed resume: a NEW snapshot id does not force
                # revalidation — compare each remaining partition's content
                # digest (column-pruned (doc_id, n_tok, source) scan, a few %
                # of a token table's bytes) against the last manifest row and
                # skip the unchanged ones. O(partitions) collect.
                stored = ckpt.stored_digests(
                    spark, manifest_path, cfg.check_version,
                    only_passed=cfg.resume_revalidates_failed,
                )
                if stored is not None:
                    from ultragendataset_datachecker_spark.prepare import row_digest_expr

                    cur = df.groupBy(F.col(cfg.partition_col).alias("part")).agg(
                        F.sum(row_digest_expr(cfg.digest_include_tokens)).alias("part_digest")
                    )
                    unchanged = [
                        r["part"]
                        for r in cur.join(stored, on=["part", "part_digest"], how="left_semi")
                        .select("part").collect()
                    ]
                    if unchanged:
                        done |= set(unchanged)
                        df = df.where(~F.col(cfg.partition_col).isin(unchanged))
            if done:
                skipped = tuple(sorted(done))

        # small intermediate frames persisted by checks; unpersisted via
        # ValidationResult.unpersist
        aux_caches: list = []

        # pass 0: ONE scan of the fact table → narrow derived projection
        # (~3% width: scalars + content hashes); stored across every
        # downstream pass so the heavy tokens column is decoded exactly once
        def _build_narrow():
            narrow = narrow_projection(df, cfg)
            if persist and cfg.cache_narrow:
                if cfg.narrow_store == "checkpoint":
                    # eager row-format block store (cfg.narrow_store docs):
                    # skips InMemoryRelation's per-row columnar build, which
                    # profiled at ~10s per 20M rows vs ~1s of block copies;
                    # every downstream pass scans it at cache speed. Blocks
                    # are released by ValidationResult.unpersist.
                    narrow = narrow.localCheckpoint()
                else:
                    narrow = narrow.persist(StorageLevel.MEMORY_AND_DISK)
            return narrow

        # Scheduling (persist path, guide §2.6 — actions are only sequential
        # because driver code calls them sequentially; every job below is
        # over the SAME row multiset, so results are identical and only job
        # scheduling changes):
        #
        #   phase 0 (4 driver threads): the narrow-store build uses only
        #     ~half the task slots (it is parquet-decode + hash bound), and
        #     three whole passes need NO derived column — the imperative
        #     sketch aggregates (percentile/HLL), the global float/sketch
        #     re-aggregate, and the doc_id hash-candidate detection read
        #     just (part, doc_id, n_tok, source). They run off the
        #     column-pruned FACT scan concurrently with the build, so the
        #     scheduler back-fills the idle slots (r6 event-log audit: the
        #     build left ~16 of 32 cores idle for ~6s while these three
        #     passes later ran serially after it).
        #   phase 1 (2 threads): declarative metrics (needs narrow) joined
        #     to the cached sketch frame ∥ fused dup detection (needs
        #     h1/h2) seeded with the cached doc-candidate frame.
        #
        # The persist=False path stays sequential and builds everything
        # from the narrow projection (all-lazy, nothing to overlap).
        def _build_dup(narrow, cand_doc=None):
            if cfg.verify_token_dups_exactly:
                dup_id_v = uniqueness.doc_id_duplicate_violations(narrow, cfg)
                dup_tok_v = uniqueness.token_duplicate_violations(narrow, cfg, fact=df)
                return dup_id_v.unionByName(dup_tok_v)
            # hash-equality dedup path: both dup checks fused into ONE
            # candidate shuffle + ONE broadcast probe (tuple-identical
            # output, tests/test_violations.py parity test)
            return uniqueness.fused_duplicate_violations(
                narrow, cfg, cache_registry=(aux_caches if persist else None),
                cand_doc=cand_doc,
            )

        if persist:
            from concurrent.futures import ThreadPoolExecutor

            scalar_source = df.select(cfg.partition_col, "doc_id", "n_tok", "source")

            def _mat(frame):
                frame = frame.persist(StorageLevel.MEMORY_AND_DISK)
                aux_caches.append(frame)
                frame.count()
                return frame

            with ThreadPoolExecutor(max_workers=6) as pool:
                narrow_f = pool.submit(_build_narrow)
                imp_f = pool.submit(
                    lambda: _mat(column_stats.imp_per_part_frame(scalar_source, cfg))
                )
                glob_f = pool.submit(
                    lambda: _mat(column_stats.glob_rest_frame(scalar_source, cfg))
                )
                cand_doc_f = (
                    pool.submit(lambda: _mat(uniqueness.doc_hash_candidates(scalar_source)))
                    if not cfg.verify_token_dups_exactly
                    else None
                )
                narrow = narrow_f.result()

                # Phase 1: THREE independent chains over the narrow store,
                # each from its own thread so the scheduler packs their
                # scans together (guide §2.6). The row-violation pass's
                # only non-narrow input is the tiny outlier-bounds frame,
                # which derives from the phase-0 imperative frame
                # (_outlier_stats_from_imp) — NOT from the metrics frame,
                # so it no longer serializes behind the declarative
                # metrics scan (r6: that dependency made phase 1 two
                # sequential scans per thread; event log showed the decl
                # scan and the row_v scan back-to-back in one thread).
                def _metrics():
                    return column_stats.compute_metrics(
                        narrow, cfg, cache_registry=aux_caches,
                        imp_per_part=imp_f.result(), glob_rest=glob_f.result(),
                    ).persist(StorageLevel.MEMORY_AND_DISK)

                def _row_v():
                    return _mat(viol_mod.compute_row_violations(
                        narrow, cfg, allowed_sources,
                        self._outlier_stats_from_imp(imp_f.result()),
                        extra_checks=extra_checks, allowed_literal=allowed_literal,
                    ))

                met_f = pool.submit(_metrics)
                rowv_f = pool.submit(_row_v)
                dup_f = pool.submit(
                    lambda: _build_dup(
                        narrow, cand_doc_f.result() if cand_doc_f is not None else None
                    )
                )
                metrics = met_f.result()
                row_v = rowv_f.result()
                dup_v = dup_f.result()
        else:
            narrow = _build_narrow()
            metrics = column_stats.compute_metrics(narrow, cfg)
            dup_v = _build_dup(narrow)
            # pass 2: fused violation pass joins the broadcast outlier bounds
            row_v = viol_mod.compute_row_violations(
                narrow, cfg, allowed_sources, self._outlier_stats(metrics),
                extra_checks=extra_checks, allowed_literal=allowed_literal,
            )
        violations_full = row_v.unionByName(dup_v)
        if cfg.repetition_check:
            # the one opt-in per-token check: a second fact scan through the
            # Arrow repetition kernel (everything else reads narrow scalars)
            violations_full = violations_full.unionByName(
                viol_mod.repetition_violations(df, cfg)
            )
        if persist:
            # EAGER count, same reason as the pruned frame in uniqueness:
            # a lazy persist races its consumers — violation_counts, the
            # entropy rogue slice, and the caller's violations action each
            # re-ran the full row-violation pass (the r6 event-log audit
            # showed the pass executing twice, ~3s per extra run at 20M
            # rows) instead of reading the cache one of them populated.
            violations_full = violations_full.persist(StorageLevel.MEMORY_AND_DISK)
            violations_full.count()

        # Counts feed scores/verdicts/manifest and MUST come from the
        # uncapped frame: capping first would clamp dup/outlier counts to the
        # example cap and inflate scores toward 1.0 exactly at the scale the
        # cap exists for. The cap applies only to the emitted example rows.
        violation_counts = violations_full.groupBy("part", "check_name").agg(
            F.count(F.lit(1)).alias("n")
        )

        violations = violations_full
        if cfg.max_violation_examples:
            from pyspark.sql import Window

            # Salted two-phase top-K (cfg.salt_buckets): a hot (part, check)
            # cell — one check failing for most of a partition — would put
            # every one of its violation rows into a single window task.
            # Phase 1 ranks within (part, check, salt(doc_id)) so each task
            # sorts ~1/salt_buckets of the cell and keeps at most K rows;
            # phase 2 ranks the <= K*salt_buckets survivors. Top-K by doc_id
            # of per-bucket top-Ks == global top-K, so the output is
            # identical to the single-window form. (Rows with NULL doc_id
            # share one salt bucket, but those are constant tuples — any K
            # of them is the same output.)
            cap = cfg.max_violation_examples
            sb = max(int(cfg.salt_buckets), 1)
            salted = violations_full.withColumn(
                "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(sb))
            )
            w1 = Window.partitionBy("part", "check_name", "_salt").orderBy("doc_id")
            pre = (
                salted.withColumn("_rn", F.row_number().over(w1))
                .where(F.col("_rn") <= cap)
            )
            w2 = Window.partitionBy("part", "check_name").orderBy("doc_id")
            violations = (
                pre.withColumn("_rn2", F.row_number().over(w2))
                .where(F.col("_rn2") <= cap)
                .drop("_rn", "_rn2", "_salt")
            )

        verdicts = compute_scores(
            metrics, violation_counts, cfg,
            class_entropy=self._balance_entropy(
                metrics,
                rogue_rows=(
                    violations_full.where(F.col("check_name") == "rogue_source")
                    if default_dimension
                    else None
                ),
                narrow_fallback=narrow,
            ),
        )

        drift = None
        if baseline is not None:
            drift = drift_mod.drift_scores(metrics, baseline, cfg)
            if cfg.drift_ks_chi2:
                # classical complements (KS / W1 / chi2) joined onto the tiny
                # (part, check_name) drift frame — zero extra corpus passes
                drift = drift.join(
                    drift_mod.ks_chi2_scores(metrics, baseline, cfg),
                    on=["part", "check_name"],
                    how="left",
                )
            psi_flags = (
                drift.groupBy("part")
                .agg(F.max("psi").alias("max_psi"))
                .select(
                    "part",
                    "max_psi",
                    (F.col("max_psi") > cfg.psi_fail_threshold).alias("drift_flag"),
                )
            )
            verdicts = verdicts.join(psi_flags, on="part", how="left")

        token_hist = None
        token_drift = None
        if cfg.token_hist_buckets:
            # payload-level distribution check (ops/tokenstats): one extra
            # pass over the tokens column — np.bincount per Arrow batch, the
            # token instances never shuffle. Runs on the partition-pruned df
            # so resume semantics apply to this check too.
            from ultragendataset_datachecker_spark.ops import tokenstats

            token_hist = tokenstats.token_id_histogram(
                df, vocab_size=cfg.vocab_size,
                num_buckets=cfg.token_hist_buckets,
                tokens_col="tokens", group_col=cfg.partition_col,
            ).withColumnRenamed(cfg.partition_col, "part")
            if token_baseline is not None:
                token_drift = tokenstats.histogram_drift(
                    token_hist, token_baseline, group_col="part"
                )

        result = ValidationResult(
            metrics=metrics,
            violations=violations,
            verdicts=verdicts,
            violation_counts=violation_counts,
            drift=drift,
            token_hist=token_hist,
            token_drift=token_drift,
            skipped_parts=skipped,
            _narrow=narrow,
            _aux_caches=tuple(aux_caches),
            _violations_full=violations_full,
            _pending_manifest=(
                (manifest_path, snapshot_id, cfg.check_version, cfg.partition_col)
                if manifest_path
                else None
            ),
        )
        # Library convenience: commit eagerly by default. Callers that write
        # outputs to durable storage (the job CLI) pass commit_manifest=False
        # and call result.commit_manifest() AFTER the writes succeed.
        if manifest_path and commit_manifest:
            result.commit_manifest()
        return result
