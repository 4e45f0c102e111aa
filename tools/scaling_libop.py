"""Two-cluster-size scaling pair for the heaviest LIBRARY operator
(minhash_lsh_duplicates) — same executors protocol as bench_scaling.py.

All prior executor-protocol evidence is the validation engine
(validate_full); this records the north-rule pair for a library op: the
identical MinHash+LSH dedup job on the identical inflated documents table
at 1 vs 4 REAL executor JVMs (local-cluster — own heaps, GC, shuffle
servers, netty transfer; 1 core and constant memory per executor), with
output-hash identity asserted across legs.

Usage:
    python tools/scaling_libop.py            # orchestrates both legs
    python tools/scaling_libop.py --worker --master <m> --cores <n> --path <p>
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

COPIES = int(os.environ.get("LIBOP_COPIES", "40"))  # 40 x 5000 = 200k docs
REPEATS = int(os.environ.get("LIBOP_REPEATS", "2"))
EXEC_MEM_MB = int(os.environ.get("LIBOP_EXEC_MEM_MB", "8192"))
EXECS = (1, 4)


def ensure_input() -> str:
    path = os.path.join(REPO, ".scratch", f"scaling_docs_{COPIES}", "documents.parquet")
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        import duckdb

        from tools.gen_scaled import tagged_text_sql

        # same inflation contract as tools/gen_scaled.py: per-word copy tags
        # (stopwords kept) preserve within-copy near-dup structure with no
        # meaningful cross-copy overlap
        tt = tagged_text_sql()
        duckdb.sql(f"""
            COPY (
              SELECT doc_id + c*100000000 AS doc_id,
                     {tt} AS text,
                     lang, source, length({tt}) AS n_chars
              FROM read_parquet('/root/testdata/sf0.1/documents.parquet'),
                   (SELECT range AS c FROM range({COPIES}))
            ) TO '{path}' (FORMAT PARQUET, ROW_GROUP_SIZE 20000)
        """)
    return path


def worker(master: str, total_cores: int, path: str) -> None:
    from pyspark.sql import functions as F

    from ultragendataset_datachecker_spark.ops.dedup import (
        minhash_lsh_duplicates, released,
    )
    from ultragendataset_datachecker_spark.session import get_spark

    extra = {}
    if master.startswith("local-cluster"):
        extra["spark.executor.memory"] = f"{EXEC_MEM_MB}m"
    spark = get_spark(
        app_name=f"libop-scaling-{total_cores}", master=master,
        shuffle_partitions=max(total_cores * 4, 8), extra_conf=extra,
    )
    df = spark.read.parquet(path).repartition(max(total_cores * 4, 8), "doc_id")

    # warmup: same plan shapes, tiny input
    warm = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with released(minhash_lsh_duplicates(
            warm, "doc_id", "text", shingle_n=2, num_hashes=40, bands=10,
            jaccard_threshold=0.5)) as wp:
        wp.count()

    n_rows = df.count()
    best = None
    out_hash = None
    n_pairs = None
    for i in range(REPEATS):
        t0 = time.time()
        with released(minhash_lsh_duplicates(
                df, "doc_id", "text", shingle_n=2, num_hashes=40, bands=10,
                jaccard_threshold=0.5)) as pairs:
            rows = pairs.select(
                "id_a", "id_b", F.round(F.col("jaccard"), 9).alias("j")
            ).collect()
        wall = time.time() - t0
        if best is None or wall < best:
            best = wall
        if i == 0:
            canon = sorted((r.id_a, r.id_b, r.j) for r in rows)
            out_hash = hashlib.sha256(repr(canon).encode()).hexdigest()[:16]
            n_pairs = len(canon)
    print(json.dumps({
        "master": master,
        "total_cores": total_cores,
        "rows": n_rows,
        "pairs": n_pairs,
        "wall_sec": round(best, 3),
        "throughput": round(n_rows / best, 1),
        "pairs_hash": out_hash,
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
    # warm the OS page cache so the first leg doesn't pay cold-disk IO
    with open(path, "rb") as f:
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
        "op": "minhash_lsh_duplicates",
        "mode": "executors",
        "copies": COPIES,
        "rows": results[lo]["rows"],
        f"executors{lo}": results[lo],
        f"executors{hi}": results[hi],
        "scaling_efficiency": round(eff, 3),
        "meets_0.8_criterion": eff >= 0.8,
        "outputs_identical_across_parallelism": (
            results[lo]["pairs_hash"] == results[hi]["pairs_hash"]
            and results[lo]["pairs"] == results[hi]["pairs"]
        ),
    }
    stamp = time.strftime("%m%d_%H%M")
    out_path = os.path.join(REPO, "BENCH", f"scaling_libop_minhash_{stamp}.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--master")
    p.add_argument("--cores", type=int, default=1)
    p.add_argument("--path")
    a = p.parse_args()
    if a.worker:
        worker(a.master, a.cores, a.path)
    else:
        raise SystemExit(orchestrate())
