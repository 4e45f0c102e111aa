"""Phase-attribution profiler for the validate_full bench path (guide §1).

Mirrors bench.py's timed region (ValidationEngine.run(persist=True) +
verdicts.count() + violations.count()) but materializes each phase in the
engine's own execution order with its own timer and job description, so the
wall cost of validate_full decomposes into:

  narrow   — fact scan -> narrow projection persist (parquet decode + hashes)
  dup      — fused dup detection (explode/groupBy exchange + probe + pruned persist)
  metrics  — fused rollup agg over the cached narrow projection
  violfull — row-violation pass + union + violations_full persist (via count)
  verdicts — violation_counts + entropy + scoring joins -> verdicts.count()
  capped   — salted two-phase top-K example cap -> violations.count()

Usage: python tools/profile_engine.py [rows] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from ultragendataset_datachecker_spark.config import EngineConfig
    from ultragendataset_datachecker_spark.engine import ValidationEngine
    from ultragendataset_datachecker_spark.session import get_spark
    from ultragendataset_datachecker_spark import checkpoint as _  # noqa
    from ultragendataset_datachecker_spark.checks import (
        column_stats, uniqueness, violations as viol_mod,
    )
    from ultragendataset_datachecker_spark.datagen import allowed_sources_df
    from ultragendataset_datachecker_spark.prepare import narrow_projection
    from ultragendataset_datachecker_spark.scoring import compute_scores

    evdir = os.environ.get("PROFILE_EVENT_DIR")
    extra = {}
    if evdir:
        os.makedirs(evdir, exist_ok=True)
        extra = {"spark.eventLog.enabled": "true", "spark.eventLog.dir": evdir}
    spark = get_spark(app_name="profile_engine", master=f"local[{cpus}]", extra_conf=extra)
    sc = spark.sparkContext
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seq_path = os.path.join(root, ".bench_cache", f"seq_{rows}_16")
    assert os.path.exists(os.path.join(seq_path, "_SUCCESS")), seq_path

    cfg = EngineConfig(exact_quantiles=False, verify_token_dups_exactly=False)
    df = spark.read.parquet(seq_path)

    # warmup identical in spirit to bench.py
    from ultragendataset_datachecker_spark.datagen import GenSpec, generate_sequences
    warm = generate_sequences(spark, GenSpec(n_rows=20_000, n_parts=4), 8)
    wres = ValidationEngine(cfg).run(warm, persist=False)
    wres.verdicts.count(); wres.violations.count()

    all_runs = []
    for it in range(repeats):
        t: dict[str, float] = {}
        t0_all = time.time()

        def phase(name):
            sc.setJobDescription(f"profile:{name}")

        # --- narrow projection store (mirrors engine: cfg.narrow_store) ---
        phase("narrow")
        t0 = time.time()
        if cfg.narrow_store == "checkpoint":
            narrow = narrow_projection(df, cfg).localCheckpoint()
        else:
            narrow = narrow_projection(df, cfg).persist(StorageLevel.MEMORY_AND_DISK)
        n_narrow = narrow.count()
        t["narrow"] = time.time() - t0

        # --- fused dup detection (includes its own pruned.count()) ---
        phase("dup")
        aux = []
        t0 = time.time()
        dup_v = uniqueness.fused_duplicate_violations(narrow, cfg, cache_registry=aux)
        t["dup_detect"] = time.time() - t0  # pruned.count() happens inside

        # --- metrics rollup ---
        phase("metrics")
        t0 = time.time()
        metrics = column_stats.compute_metrics(narrow, cfg).persist(StorageLevel.MEMORY_AND_DISK)
        metrics.count()
        t["metrics"] = time.time() - t0

        eng = ValidationEngine(cfg)
        part_stats = eng._outlier_stats(metrics)

        # --- violations_full persist (row pass + dup emit) ---
        phase("violfull")
        t0 = time.time()
        allowed = allowed_sources_df(spark, list(cfg.allowed_sources))
        row_v = viol_mod.compute_row_violations(narrow, cfg, allowed, part_stats)
        violations_full = row_v.unionByName(dup_v).persist(StorageLevel.MEMORY_AND_DISK)
        n_viol = violations_full.count()
        t["violfull"] = time.time() - t0

        # --- verdicts (counts + entropy + scoring) ---
        phase("verdicts")
        t0 = time.time()
        violation_counts = violations_full.groupBy("part", "check_name").agg(
            F.count(F.lit(1)).alias("n"))
        verdicts = compute_scores(
            metrics, violation_counts, cfg,
            class_entropy=eng._balance_entropy(
                metrics,
                rogue_rows=violations_full.where(F.col("check_name") == "rogue_source"),
                narrow_fallback=narrow,
            ),
        )
        n_verd = verdicts.count()
        t["verdicts"] = time.time() - t0

        # --- capped example rows (cfg.max_violation_examples is None in the
        # bench config, so bench counts violations_full directly) ---
        phase("capped")
        t0 = time.time()
        n_v2 = violations_full.count()
        t["capped_or_recount"] = time.time() - t0

        t["TOTAL"] = time.time() - t0_all
        sc.setJobDescription(None)
        for d in (narrow, metrics, violations_full, *aux):
            d.unpersist()
            try:  # free localCheckpoint blocks (plain unpersist skips them)
                plan = d._jdf.queryExecution().analyzed()
                if plan.getClass().getSimpleName() == "LogicalRDD":
                    plan.rdd().unpersist(False)
            except Exception:
                pass
        all_runs.append({k: round(v, 3) for k, v in t.items()})
        print(json.dumps({"iter": it, "rows": n_narrow, "violations": n_viol,
                          "verdicts": n_verd, **all_runs[-1]}), flush=True)

    print(json.dumps({"rows": rows, "runs": all_runs}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
