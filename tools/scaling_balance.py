"""Two-cluster-size scaling pair for fix_balance's DISTRIBUTED exact
per-class rank — same executors protocol as bench_scaling.py /
scaling_libop.py.

The round-4 verdict flagged exact balance as the last one-task-per-class
funnel; the distributed rank replaced it. This records the north-rule
pair for that path on its worst case — one class owning 90% of the
corpus — at 1 vs 4 REAL executor JVMs (local-cluster: own heaps, GC,
shuffle servers; 1 core, constant memory per executor), with the kept-id
multiset hash asserted identical across legs.
exact_window_threshold=0 forces the distributed path at this row count.

Usage:
    python tools/scaling_balance.py          # orchestrates both legs
    python tools/scaling_balance.py --worker --master <m> --cores <n> --path <p>
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = int(os.environ.get("BAL_ROWS", "16000000"))
REPEATS = int(os.environ.get("BAL_REPEATS", "2"))
EXEC_MEM_MB = int(os.environ.get("BAL_EXEC_MEM_MB", "8192"))
EXECS = (1, 4)


def ensure_input() -> str:
    path = os.path.join(REPO, ".scratch", f"scaling_balance_{N_ROWS}", "rows.parquet")
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        import duckdb

        # 90% 'hot', 9% 'warm', 1% 'cold' — deterministic ids; undersample
        # auto pulls hot+warm down to the cold count, so the giant class
        # must be exactly ranked across many range partitions.
        duckdb.sql(f"""
            COPY (
              SELECT range AS id,
                     CASE WHEN range % 100 < 90 THEN 'hot'
                          WHEN range % 100 < 99 THEN 'warm'
                          ELSE 'cold' END AS cls
              FROM range({N_ROWS})
            ) TO '{path}' (FORMAT PARQUET, ROW_GROUP_SIZE 500000)
        """)
    return path


def worker(master: str, total_cores: int, path: str) -> None:
    from pyspark.sql import Window, functions as F

    from ultragendataset_datachecker_spark import fixes
    from ultragendataset_datachecker_spark.ops.dedup import unpersist_intermediates
    from ultragendataset_datachecker_spark.session import get_spark

    calibrate = bool(os.environ.get("BAL_CALIBRATE"))

    extra = {}
    if master.startswith("local-cluster"):
        extra["spark.executor.memory"] = f"{EXEC_MEM_MB}m"
    spark = get_spark(
        app_name=f"balance-scaling-{total_cores}", master=master,
        shuffle_partitions=max(total_cores * 4, 8), extra_conf=extra,
    )
    df = spark.read.parquet(path)

    # warmup: same plan shapes, tiny slice
    warm, _ = fixes.fix_balance(
        df.limit(20000), "cls", method="undersample",
        order_columns=["id"], hash_order=False, exact_window_threshold=0,
    )
    warm.count()
    unpersist_intermediates(warm)

    n_rows = df.count()
    best = None
    out_hash = None
    n_kept = None
    for i in range(REPEATS):
        t0 = time.time()
        if calibrate:
            # bare dominant kernel: range shuffle + per-partition sort —
            # what the box's memory system allows this job shape, with no
            # balance logic, persist, counts collect, or broadcast join.
            # max(_lrn) forces the window; the hashed outputs exclude it
            # (ranks depend on boundary placement, the row set doesn't).
            order = [F.col("cls").asc(), F.col("id").asc()]
            w = Window.partitionBy("_pid").orderBy(*order)
            kept = (
                df.repartitionByRange(*order)
                .withColumn("_pid", F.spark_partition_id())
                .withColumn("_lrn", F.row_number().over(w))
            )
            extra_agg = [F.max("_lrn").alias("_mx")]
        else:
            kept, _ = fixes.fix_balance(
                df, "cls", method="undersample",
                order_columns=["id"], hash_order=False, exact_window_threshold=0,
            )
            extra_agg = []
        agg = kept.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("id").alias("id_sum"),
            F.sum(F.pmod(F.xxhash64("cls", "id"), F.lit(1_000_000_007))).alias("h"),
            *extra_agg,
        ).collect()[0]
        wall = time.time() - t0
        unpersist_intermediates(kept)
        if best is None or wall < best:
            best = wall
        if i == 0:
            n_kept = agg["n"]
            out_hash = hashlib.sha256(
                repr((agg["n"], agg["id_sum"], agg["h"])).encode()
            ).hexdigest()[:16]
    print(json.dumps({
        "master": master,
        "total_cores": total_cores,
        "rows": n_rows,
        "kept": n_kept,
        "wall_sec": round(best, 3),
        "throughput": round(n_rows / best, 1),
        "kept_hash": out_hash,
    }))


def _run_leg(master: str, cores: int, path: str) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEMORY", "8g")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker",
         "--master", master, "--cores", str(cores), "--path", path],
        capture_output=True, text=True, timeout=7200, env=env,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-4000:] + "\n" + out.stderr[-4000:] + "\n")
        raise RuntimeError(f"leg {master} produced no result line")
    print(lines[-1])
    return json.loads(lines[-1])


def orchestrate() -> int:
    path = ensure_input()
    with open(path, "rb") as f:          # warm the OS page cache
        while f.read(1 << 24):
            pass

    results = {}
    for n in EXECS:
        master = f"local-cluster[{n},1,{EXEC_MEM_MB}]"
        results[n] = _run_leg(master, n, path)

    lo, hi = EXECS
    tlo, thi = results[lo]["throughput"], results[hi]["throughput"]
    eff = (thi / tlo) / (hi / lo)
    summary = {
        "op": (
            "CALIBRATION: bare range-shuffle + per-partition sort"
            if os.environ.get("BAL_CALIBRATE")
            else "fix_balance exact undersample (distributed per-class rank)"
        ),
        "mode": "executors",
        "rows": results[lo]["rows"],
        f"executors{lo}": results[lo],
        f"executors{hi}": results[hi],
        "scaling_efficiency": round(eff, 3),
        "meets_0.8_criterion": eff >= 0.8,
        "outputs_identical_across_parallelism": (
            results[lo]["kept_hash"] == results[hi]["kept_hash"]
            and results[lo]["kept"] == results[hi]["kept"]
        ),
    }
    stamp = time.strftime("%m%d_%H%M")
    tag = "calib_" if os.environ.get("BAL_CALIBRATE") else ""
    out_path = os.path.join(REPO, "BENCH", f"scaling_balance_{tag}{stamp}.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    print(f"wrote {out_path}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--master")
    ap.add_argument("--cores", type=int)
    ap.add_argument("--path")
    args = ap.parse_args()
    if args.worker:
        worker(args.master, args.cores, args.path)
        return 0
    return orchestrate()


if __name__ == "__main__":
    raise SystemExit(main())
