"""Hardware-calibration probes for the scaling bench (BENCH/BASELINE.md).

Two microbenchmarks bracket what the sandbox box can scale AT ALL between
two parallelism levels, independent of the engine's workload:

  cpu   — avg of xxhash64 over spark.range: embarrassingly parallel,
          whole-stage-codegen, registers only, zero memory traffic.
          Measures the hypervisor/turbo core-scaling ceiling.
  scan  — full parquet scan of the 32M-row bench sequences table with the
          tokens column decoded + hashed: no joins, no Python, no shuffle
          beyond the 1-row aggregate. Measures the DRAM/decode ceiling the
          validation engine's own scan is subject to.

Usage:
    python tools/scaling_probes.py cpu 8
    python tools/scaling_probes.py scan 32 [parquet_path]

Run each probe at both parallelism levels in FRESH processes (JVM flags are
fixed at startup) and compare rows/sec. Measured on the round-3 host
(32-core single-socket Xeon, single NUMA node) on TWO days — the spread is
the hypervisor/turbo state moving, and is why engine ratios must be read
against same-day probes (BENCH/BASELINE.md):

  cpu  2→8: 1.016 / 0.835   8→32: 0.697 / 0.615
  scan 2→8: 0.879 / 0.777   8→32: 0.436 / 0.465
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ultragendataset_datachecker_spark.session import get_spark  # noqa: E402

DEFAULT_TABLE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench_cache", "seq_32000000_16",
)


def probe_cpu(cores: int, n: int = 16_000_000_000) -> dict:
    spark = get_spark(app_name=f"probe-cpu-{cores}", master=f"local[{cores}]")
    df = spark.range(0, n, 1, cores * 4)
    # avg, not sum: ANSI mode rejects the int64 random-walk overflow of
    # summing ~2^63-range hashes
    expr = F.avg(F.xxhash64(F.col("id")).bitwiseXOR(F.xxhash64(F.col("id"), F.lit(7))))
    df.limit(10_000_000).select(expr).collect()  # warmup: codegen + JIT
    best = None
    for _ in range(2):
        t0 = time.time()
        df.select(expr).collect()
        w = time.time() - t0
        best = w if best is None else min(best, w)
    return {"probe": "cpu", "cores": cores, "wall": round(best, 3),
            "rows_per_sec": round(n / best)}


def probe_scan(cores: int, path: str = DEFAULT_TABLE) -> dict:
    spark = get_spark(app_name=f"probe-scan-{cores}", master=f"local[{cores}]")
    df = spark.read.parquet(path)
    df.limit(100_000).select(F.avg(F.xxhash64("tokens"))).collect()  # warmup
    best = None
    for _ in range(2):
        t0 = time.time()
        df.select(F.avg(F.xxhash64("tokens")), F.avg("n_tok")).collect()
        w = time.time() - t0
        best = w if best is None else min(best, w)
    return {"probe": "scan", "cores": cores, "wall": round(best, 3), "path": path}


if __name__ == "__main__":
    kind, cores = sys.argv[1], int(sys.argv[2])
    if kind == "cpu":
        out = probe_cpu(cores)
    elif kind == "scan":
        out = probe_scan(cores, sys.argv[3] if len(sys.argv) > 3 else DEFAULT_TABLE)
    else:
        raise SystemExit(f"unknown probe {kind!r} (cpu|scan)")
    print(json.dumps(out))
