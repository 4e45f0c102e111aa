"""End-to-end curation-pipeline bench + determinism stamp.

Runs the full curate CLI chain (quality -> ngram near-dup clusters ->
keep-best -> PII redaction -> split column -> deterministic shard shuffle)
TWICE at different parallelism levels on the same inflated documents table,
records wall + per-stage rows, and asserts the kept/ output is
content-identical in shard order across the two runs — the artifact a real
data team evaluates first: same corpus in, byte-for-byte the same training
order out, regardless of cluster width.

Identity check: per shard, an md5 over the row digests in pos order
(parquet footer bytes can legitimately differ between writes; the contract
is the ordered row CONTENT). dropped/ is compared as an unordered multiset.

Usage: python tools/bench_curate.py [DOCS_PARQUET] [OUT_JSON]
Defaults: .scratch/sf1curate/documents.parquet BENCH/curate_r05.json
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def shard_digest(kept_dir: str) -> dict:
    """{shard: md5 over md5(row-json) in pos order}, plus row count."""
    con = duckdb.connect()
    rows = con.execute(f"""
        SELECT shard,
               count(*) AS n,
               md5(string_agg(md5(concat_ws('\x1f', doc_id, text, lang, source,
                                            n_chars, split)), '|' ORDER BY pos)) AS dig
        FROM read_parquet('{kept_dir}/shard=*/*.parquet', hive_partitioning=1)
        GROUP BY shard ORDER BY shard
    """).fetchall()
    return {int(s): (int(n), d) for s, n, d in rows}


def dropped_digest(dropped_dir: str) -> tuple:
    con = duckdb.connect()
    n, dig = con.execute(f"""
        SELECT count(*),
               md5(string_agg(md5(concat_ws('\x1f', doc_id, drop_stage)), '|'
                              ORDER BY md5(concat_ws('\x1f', doc_id, drop_stage))))
        FROM read_parquet('{dropped_dir}/*.parquet')
    """).fetchone()
    return int(n), dig


def run_once(docs: str, out: str, master: str, capture: dict) -> float:
    # fresh process per leg: SparkSession.getOrCreate ignores a different
    # master on the second call in one process, which would silently run
    # both legs at the first leg's parallelism
    import subprocess

    argv = [
        sys.executable, "-m", "ultragendataset_datachecker_spark.curate",
        "--input", docs, "--output", out,
        "--quality", "--dedup-ngram", "0.3", "--dedup-keep-best", "n_chars",
        "--redact-pii", "--split", "train:0.9,val:0.1",
        "--shuffle-shards", "8", "--shuffle-seed", "epoch-0",
        "--master", master,
    ]
    t0 = time.time()
    proc = subprocess.run(argv, capture_output=True, text=True, timeout=3600)
    wall = time.time() - t0
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
    assert proc.returncode == 0 and lines, (
        f"curate failed rc={proc.returncode}: {proc.stderr[-2000:]}")
    capture.update(json.loads(lines[-1]))
    return wall


def main() -> int:
    docs = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scratch", "sf1curate", "documents.parquet")
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BENCH", "curate_r05.json")

    n_in = duckdb.sql(f"SELECT count(*) FROM read_parquet('{docs}')").fetchone()[0]

    out_a, out_b = os.path.join(REPO, ".scratch", "curate_a"), os.path.join(
        REPO, ".scratch", "curate_b")
    sum_a: dict = {}
    sum_b: dict = {}
    wall_a = run_once(docs, out_a, "local[32]", sum_a)
    wall_b = run_once(docs, out_b, "local[8]", sum_b)

    dig_a, dig_b = shard_digest(f"{out_a}/kept"), shard_digest(f"{out_b}/kept")
    drop_a, drop_b = dropped_digest(f"{out_a}/dropped"), dropped_digest(f"{out_b}/dropped")
    identical = dig_a == dig_b and drop_a == drop_b

    result = {
        "metric": "curate_pipeline_wall",
        "value": round(wall_a, 3),
        "unit": "sec",
        "docs_in": int(n_in),
        "stages": sum_a.get("stages"),
        "docs_kept": sum_a.get("docs_kept"),
        "wall_local32": round(wall_a, 3),
        "wall_local8": round(wall_b, 3),
        "job_wall_local32": sum_a.get("wall_sec"),
        "job_wall_local8": sum_b.get("wall_sec"),
        "deterministic_across_parallelism": identical,
        "shards": {str(s): n for s, (n, _) in dig_a.items()},
    }
    line = json.dumps(result)
    print(line)
    with open(out_json, "w") as f:
        f.write(line + "\n")
    assert identical, "kept/dropped output differs across parallelism levels"
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
