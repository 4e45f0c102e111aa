"""Capture .explain("formatted") for the validate_full engine frames.

Runs ValidationEngine.run on a tiny generated table with the bench config
(persist=True — the optimized scheduling path) and dumps the formatted
physical plans of the result frames plus the internal narrow/pruned shapes.

Usage: python tools/capture_engine_plans.py OUT_FILE
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_str(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> int:
    out_file = sys.argv[1]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")

    from ultragendataset_datachecker_spark.config import EngineConfig
    from ultragendataset_datachecker_spark.datagen import GenSpec, generate_sequences
    from ultragendataset_datachecker_spark.engine import ValidationEngine
    from ultragendataset_datachecker_spark.session import get_spark

    spark = get_spark(app_name="engine_plans", master=f"local[{cpus}]")
    cfg = EngineConfig(exact_quantiles=False, verify_token_dups_exactly=False)
    df = generate_sequences(spark, GenSpec(n_rows=50_000, n_parts=8), 8)
    res = ValidationEngine(cfg).run(df, persist=True)
    res.verdicts.count(); res.violations.count()

    sections = [
        ("metrics", res.metrics),
        ("violations (uncapped full frame)", res.violations),
        ("verdicts", res.verdicts),
    ]
    with open(out_file, "w") as f:
        for name, frame in sections:
            f.write(f"==== {name} ====\n")
            f.write(explain_str(spark, frame))
            f.write("\n\n")
    res.unpersist()
    print(out_file)
    return 0


if __name__ == "__main__":
    sys.exit(main())
