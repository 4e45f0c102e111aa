"""Run the bench's validate_full timed region once with the event log on.

Mirrors bench.py exactly (same cfg, same warmup, persist=True, verdicts +
violations counts) so tools/parse_eventlog.py can attribute the REAL
engine timeline (with the thread-pool overlap) job by job.

Usage: PROFILE_EVENT_DIR=/tmp/evlog python tools/bench_engine_evlog.py [rows] [repeats]
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
    evdir = os.environ.get("PROFILE_EVENT_DIR", "/tmp/evlog")
    os.makedirs(evdir, exist_ok=True)

    from ultragendataset_datachecker_spark.config import EngineConfig
    from ultragendataset_datachecker_spark.engine import ValidationEngine
    from ultragendataset_datachecker_spark.session import get_spark

    spark = get_spark(
        app_name="bench_evlog", master=f"local[{cpus}]",
        extra_conf={"spark.eventLog.enabled": "true", "spark.eventLog.dir": evdir},
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seq_path = os.path.join(root, ".bench_cache", f"seq_{rows}_16")
    assert os.path.exists(os.path.join(seq_path, "_SUCCESS")), seq_path

    cfg = EngineConfig(exact_quantiles=False, verify_token_dups_exactly=False)
    df = spark.read.parquet(seq_path)

    from ultragendataset_datachecker_spark.datagen import GenSpec, generate_sequences

    warm = generate_sequences(spark, GenSpec(n_rows=20_000, n_parts=4), 8)
    wres = ValidationEngine(cfg).run(warm, persist=False)
    wres.verdicts.count(); wres.violations.count()

    for it in range(repeats):
        spark.sparkContext.setJobDescription(f"engine:iter{it}")
        t0 = time.time()
        res = ValidationEngine(cfg).run(df, persist=True)
        n_verdicts = res.verdicts.count()
        n_viol = res.violations.count()
        wall = time.time() - t0
        res.unpersist()
        print(json.dumps({"iter": it, "wall": round(wall, 3),
                          "verdicts": n_verdicts, "violations": n_viol}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
