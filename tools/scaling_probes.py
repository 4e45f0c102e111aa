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
    python tools/scaling_probes.py cpu 8                           # local[8]
    python tools/scaling_probes.py scan 32 [parquet_path]
    python tools/scaling_probes.py cpu "local-cluster[4,1,8192]"   # executors protocol

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


def _master_and_cores(spec: str) -> tuple[str, int]:
    """'8' -> ('local[8]', 8); 'local-cluster[4,1,8192]' passes through with
    total cores = n_execs * cores_per_exec (executors-protocol calibration)."""
    if spec.isdigit():
        return f"local[{spec}]", int(spec)
    if spec.startswith("local-cluster["):
        n, c, _m = spec[len("local-cluster["):-1].split(",")
        return spec, int(n) * int(c)
    raise SystemExit(f"bad parallelism spec {spec!r}")


def _probe_session(name: str, master: str):
    extra = {}
    if master.startswith("local-cluster"):
        mem = master[len("local-cluster["):-1].split(",")[2]
        extra["spark.executor.memory"] = f"{mem}m"
    return get_spark(app_name=name, master=master, extra_conf=extra)


def probe_cpu(spec: str, n: int | None = None) -> dict:
    if n is None:
        n = int(os.environ.get("PROBE_CPU_N", 16_000_000_000))
    master, cores = _master_and_cores(spec)
    spark = _probe_session(f"probe-cpu-{cores}", master)
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
    return {"probe": "cpu", "master": master, "cores": cores,
            "wall": round(best, 3), "rows_per_sec": round(n / best)}


def probe_scan(spec: str, path: str = DEFAULT_TABLE) -> dict:
    master, cores = _master_and_cores(spec)
    spark = _probe_session(f"probe-scan-{cores}", master)
    df = spark.read.parquet(path)
    df.limit(100_000).select(F.avg(F.xxhash64("tokens"))).collect()  # warmup
    best = None
    for _ in range(2):
        t0 = time.time()
        df.select(F.avg(F.xxhash64("tokens")), F.avg("n_tok")).collect()
        w = time.time() - t0
        best = w if best is None else min(best, w)
    return {"probe": "scan", "master": master, "cores": cores,
            "wall": round(best, 3), "path": path}


if __name__ == "__main__":
    kind, spec = sys.argv[1], sys.argv[2]
    if kind == "cpu":
        out = probe_cpu(spec)
    elif kind == "scan":
        out = probe_scan(spec, sys.argv[3] if len(sys.argv) > 3 else DEFAULT_TABLE)
    else:
        raise SystemExit(f"unknown probe {kind!r} (cpu|scan)")
    print(json.dumps(out))
