"""Decompose the narrow-projection build cost (guide §1.4 noop isolation).

  decode  — parquet scan + tokens decode only (size(tokens) to noop)
  scalars — scan without tokens (doc_id, n_tok, source to noop)
  exprs   — full narrow projection to noop (decode + size/min/max + h1 + h2)
  exprs1h — narrow projection with h2 dropped (isolate the 2nd hash pass)
  store   — narrow localCheckpoint + count (adds the block-store write)

Usage: python tools/probe_narrow.py [rows] [repeats]
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

    from ultragendataset_datachecker_spark.config import EngineConfig
    from ultragendataset_datachecker_spark.prepare import narrow_projection
    from ultragendataset_datachecker_spark.session import get_spark

    spark = get_spark(app_name="probe_narrow", master=f"local[{cpus}]")
    sc = spark.sparkContext
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seq_path = os.path.join(root, ".bench_cache", f"seq_{rows}_16")
    assert os.path.exists(os.path.join(seq_path, "_SUCCESS")), seq_path
    cfg = EngineConfig(exact_quantiles=False, verify_token_dups_exactly=False)
    df = spark.read.parquet(seq_path)

    def noop(frame):
        frame.write.format("noop").mode("overwrite").save()

    # warmup
    noop(df.limit(50_000).select(F.size("tokens")))

    for it in range(repeats):
        t = {}
        sc.setJobDescription("probe:decode")
        t0 = time.time(); noop(df.select(F.size("tokens").alias("s"))); t["decode"] = time.time() - t0
        sc.setJobDescription("probe:scalars")
        t0 = time.time(); noop(df.select("doc_id", "n_tok", "source")); t["scalars"] = time.time() - t0
        sc.setJobDescription("probe:exprs")
        t0 = time.time(); noop(narrow_projection(df, cfg)); t["exprs"] = time.time() - t0
        sc.setJobDescription("probe:exprs1h")
        t0 = time.time(); noop(narrow_projection(df, cfg).drop("h2")); t["exprs1h"] = time.time() - t0
        sc.setJobDescription("probe:store")
        t0 = time.time()
        n = narrow_projection(df, cfg).localCheckpoint()
        n.count()
        t["store"] = time.time() - t0
        try:
            plan = n._jdf.queryExecution().analyzed()
            if plan.getClass().getSimpleName() == "LogicalRDD":
                plan.rdd().unpersist(False)
        except Exception:
            pass
        sc.setJobDescription(None)
        print(json.dumps({"iter": it, **{k: round(v, 3) for k, v in t.items()}}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
