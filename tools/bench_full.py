"""Run EVERY registered query once at a given testdata dir and record
per-query wall + row count as one JSON line.

The driver bench times the 7 headline queries at sf0.1; many operators
(error_clusters, mi_categorical, repeated_spans, shuffle_order, ivf_topk,
...) had only ever run at sf0.01-0.1. Sweeping the whole registry at a
larger scale (tools/gen_scaled.py inflates sf0.1 by 10x into .scratch/sf1)
catches any operator whose constant factors blow up super-linearly before
a user does: compare two sweeps' walls — a healthy query's sf1/sf0.1
ratio stays near the 10x data ratio or below (fixed overheads dominate at
these sizes); pathological ones show >>10x.

Usage: python tools/bench_full.py [SF_DIR] [OUT_JSON]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entrymod
    from ultragendataset_datachecker_spark.session import get_spark

    spark = get_spark(app_name="bench-full", master=f"local[{cpus}]")
    qs = entrymod.queries()

    # warmup: JVM JIT + codegen + Arrow worker pool on tiny inputs
    entrymod.q_minhash_dedup(spark, "/root/testdata/sf0.001").count()
    entrymod.q_column_stats(spark, "/root/testdata/sf0.001").count()

    walls: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
        except Exception as exc:  # record, keep sweeping
            walls[name] = -1.0
            rows[name] = -1
            print(f"ERR {name}: {exc}", file=sys.stderr)
            continue
        walls[name] = round(time.time() - t0, 3)
        rows[name] = n
        print(f"{name}: {walls[name]}s rows={n}", file=sys.stderr)

    result = {
        "metric": "full_query_sweep_wall",
        "value": round(sum(w for w in walls.values() if w > 0), 3),
        "unit": "sec",
        "sf_dir": sf_dir,
        "cpus": int(cpus),
        "n_queries": len(walls),
        "n_err": sum(1 for w in walls.values() if w < 0),
        "queries": walls,
        "rows": rows,
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
