"""spark-submit entry point for a full validation run.

Usage (cluster):
    spark-submit --py-files engine.zip -m ultragendataset_datachecker_spark.job \
        --input <parquet/iceberg path> --output <dir> \
        [--baseline <baseline parquet>] [--manifest <manifest parquet>] \
        [--snapshot-id <id>] [--allowed-sources a,b,c]

Local smoke:
    python -m ultragendataset_datachecker_spark.job --generate 100000 \
        --input /tmp/seq --output /tmp/val_out

The CLI analogue of the reference's ``main.py --check-only`` lifecycle
(/root/reference/main.py:34-133): load → run all checks → write report —
with the check→fix→re-check loop generalized into checkpoint-manifest resume.
Outputs: <output>/metrics, <output>/violations, <output>/verdicts as parquet,
plus a one-line JSON run summary on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Token-sequence validation run")
    p.add_argument("--input", required=True, help="sequences table path")
    p.add_argument("--input-format", default="parquet",
                   choices=["parquet", "json", "csv", "arrow"],
                   help="sequences table format (io.load_dataset)")
    p.add_argument("--output", required=True, help="output directory for metrics/violations/verdicts")
    p.add_argument("--baseline", help="baseline histogram snapshot parquet (enables drift checks)")
    p.add_argument("--manifest", help="checkpoint manifest path (enables resume)")
    p.add_argument("--snapshot-id", default="snapshot-0")
    p.add_argument("--allowed-sources", help="comma-separated allowed source values")
    p.add_argument("--vocab-size", type=int, default=50_000)
    p.add_argument("--bos-id", type=int, default=None,
                   help="require every non-empty sequence to start with this token id")
    p.add_argument("--eos-id", type=int, default=None,
                   help="require every non-empty sequence to end with this token id")
    p.add_argument("--repetition-check", action="store_true",
                   help="flag degenerate-repetition sequences (looped/pad-flooded) "
                        "as token_repetition violations (one extra Arrow pass)")
    p.add_argument("--approx-quantiles", action="store_true",
                   help="use mergeable percentile_approx (the at-scale default)")
    p.add_argument("--generate", type=int, metavar="N_ROWS",
                   help="first generate a synthetic sequences table of N rows at --input")
    p.add_argument("--generate-parts", type=int, default=16)
    p.add_argument("--build-baseline", metavar="PATH",
                   help="after the run, write the global histogram snapshot to PATH "
                        "(use it as --baseline on later runs for drift checks)")
    p.add_argument("--exclude-parts", help="comma-separated parts to exclude from --build-baseline")
    p.add_argument("--resume-by-content", action="store_true",
                   help="with --manifest: skip partitions whose content digest matches "
                        "the last manifest row even under a NEW --snapshot-id "
                        "(cfg.resume_by_content; column-pruned digest pre-pass)")
    p.add_argument("--digest-include-tokens", action="store_true",
                   help="fold the token-content hash into the digest (catches token "
                        "edits, but the digest pre-pass then reads the tokens column)")
    p.add_argument("--regression-check", action="store_true",
                   help="with --manifest: z-score this run's per-partition metrics "
                        "against prior snapshots' manifest history and write "
                        "<output>/regression (checks/regression.py)")
    p.add_argument("--token-hist", type=int, metavar="BUCKETS",
                   help="also histogram the token IDs themselves per partition over "
                        "BUCKETS vocabulary ranges (cfg.token_hist_buckets; one extra "
                        "pass over the tokens column) and write <output>/token_hist")
    p.add_argument("--token-baseline", metavar="PATH",
                   help="with --token-hist: KL/PSI drift of the token-id histogram "
                        "vs this persisted histogram parquet; writes <output>/token_drift "
                        "(use a prior run's <output>/token_hist)")
    p.add_argument("--report-json", metavar="PATH", help="write the quality report JSON here")
    p.add_argument("--report-html", metavar="PATH", help="write the quality report HTML here")
    p.add_argument("--report-csv", metavar="PATH", help="write the quality report CSV here")
    p.add_argument("--report-pdf", metavar="PATH", help="write the quality report PDF here")
    p.add_argument("--fix", action="store_true",
                   help="after the check run, auto-fix the table (drop unfixable rows, "
                        "recompute n_tok, dedup) into <output>/fixed_data and RE-CHECK it "
                        "(the reference's check->fix->re-check loop, main.py:103-133)")
    p.add_argument("--stream-catchup", action="store_true",
                   help="treat --input as a GROWING directory: consume only files not "
                        "yet seen by the streaming checkpoint at <output>/_stream_ckpt "
                        "(exactly-once per file), validate each micro-batch with the "
                        "same engine, append batch-stamped verdicts/violations, exit "
                        "when caught up (streaming.validate_stream, availableNow)")
    p.add_argument("--constraints", metavar="SPEC_JSON",
                   help="JSON constraint-suite spec (constraints.suite_from_spec); "
                        "evaluated per partition + globally in one fused pass, "
                        "results land in <output>/constraints")
    p.add_argument("--anomaly-history", metavar="PATH",
                   help="with --constraints: append this run's observed constraint "
                        "metrics to a run_id=<snapshot-id>-partitioned history at "
                        "PATH (re-runs of a snapshot overwrite their own partition), "
                        "then flag THIS run against each series' trailing history "
                        "(anomaly.detect_anomalies: zscore(3.0, w=10) error + "
                        "relative_change(0.5) warning); writes <output>/anomalies. "
                        "Snapshot ids must sort in run order (zero-padded counters "
                        "or date stamps)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)
    if args.anomaly_history and not args.constraints:
        p.error("--anomaly-history requires --constraints")
    if args.stream_catchup:
        # --stream-catchup returns after the streaming pass; flags that run
        # on the batch result would be silently ignored — reject instead
        incompatible = [
            ("--constraints", args.constraints),
            ("--anomaly-history", args.anomaly_history),
            ("--fix", args.fix),
            ("--build-baseline", args.build_baseline),
            ("--regression-check", args.regression_check),
            ("--report-json", args.report_json),
            ("--report-html", args.report_html),
            ("--report-csv", args.report_csv),
            ("--report-pdf", args.report_pdf),
        ]
        bad = [flag for flag, v in incompatible if v]
        if bad:
            p.error(f"--stream-catchup does not run the batch post-passes; remove {', '.join(bad)}")

    from ultragendataset_datachecker_spark.config import EngineConfig
    from ultragendataset_datachecker_spark.engine import ValidationEngine
    from ultragendataset_datachecker_spark.session import get_spark

    spark = get_spark(app_name="sequence-validation", master=args.master)

    if args.generate:
        from ultragendataset_datachecker_spark.datagen import GenSpec, write_sequences

        spec = GenSpec(n_rows=args.generate, n_parts=args.generate_parts)
        write_sequences(spark, args.input, spec)

    cfg_kwargs: dict = {
        "vocab_size": args.vocab_size,
        "exact_quantiles": not args.approx_quantiles,
        "resume_by_content": args.resume_by_content,
        "digest_include_tokens": args.digest_include_tokens,
        "token_hist_buckets": args.token_hist,
        "bos_id": args.bos_id,
        "eos_id": args.eos_id,
        "repetition_check": args.repetition_check,
    }
    if args.allowed_sources:
        cfg_kwargs["allowed_sources"] = tuple(args.allowed_sources.split(","))
    cfg = EngineConfig(**cfg_kwargs)

    from ultragendataset_datachecker_spark.io import load_dataset

    baseline = spark.read.parquet(args.baseline) if args.baseline else None

    if args.stream_catchup:
        from pyspark.sql import functions as F

        from ultragendataset_datachecker_spark.streaming import validate_stream

        t0 = time.time()
        batches: list[int] = []
        q = validate_stream(
            spark, args.input, args.output, f"{args.output}/_stream_ckpt",
            cfg=cfg, baseline=baseline,
            on_batch=lambda bid, _v: batches.append(bid),
        )
        q.awaitTermination()
        wall = time.time() - t0
        new_v = (
            spark.read.parquet(f"{args.output}/verdicts")
            .where(F.col("batch_id").isin(batches))
            if batches else None
        )
        print(json.dumps({
            "mode": "stream_catchup",
            "wall_sec": round(wall, 3),
            "batches_processed": len(batches),
            "parts": (
                {str(r["part"]): r["verdict"]
                 for r in new_v.where("part >= 0").select("part", "verdict").collect()}
                if new_v is not None else {}
            ),
        }))
        return 0

    df = load_dataset(spark, args.input, fmt=args.input_format)

    t0 = time.time()
    res = ValidationEngine(cfg).run(
        df,
        baseline=baseline,
        token_baseline=(
            spark.read.parquet(args.token_baseline) if args.token_baseline else None
        ),
        manifest_path=args.manifest,
        snapshot_id=args.snapshot_id,
        commit_manifest=False,  # commit AFTER the outputs below are durable
    )
    res.metrics.write.mode("overwrite").parquet(f"{args.output}/metrics")
    res.violations.write.mode("overwrite").parquet(f"{args.output}/violations")
    res.verdicts.write.mode("overwrite").parquet(f"{args.output}/verdicts")
    if res.drift is not None:
        res.drift.write.mode("overwrite").parquet(f"{args.output}/drift")
    if res.token_hist is not None:
        res.token_hist.write.mode("overwrite").parquet(f"{args.output}/token_hist")
    if res.token_drift is not None:
        res.token_drift.write.mode("overwrite").parquet(f"{args.output}/token_drift")
    # outputs are durable — now mark the partitions validated; a crash before
    # this line re-validates them on the next run instead of losing results
    res.commit_manifest()

    regression_flags = None
    if args.regression_check and args.manifest:
        from pyspark.sql import functions as F

        from ultragendataset_datachecker_spark.checkpoint import read_manifest
        from ultragendataset_datachecker_spark.checks.regression import metric_regression

        hist = read_manifest(spark, args.manifest)
        if hist is not None:
            reg = metric_regression(hist, res.metrics, cfg, args.snapshot_id)
            reg.write.mode("overwrite").parquet(f"{args.output}/regression")
            flagged = reg.where(F.col("flag")).select("part", "metric", "value", "hist_mean")
            regression_flags = [
                {"part": int(r["part"]), "metric": r["metric"],
                 "value": r["value"], "hist_mean": r["hist_mean"]}
                for r in flagged.collect()
            ]

    if args.build_baseline:
        from ultragendataset_datachecker_spark.checks.drift import build_baseline

        excl = [int(x) for x in args.exclude_parts.split(",")] if args.exclude_parts else None
        build_baseline(res.metrics, cfg, args.snapshot_id, exclude_parts=excl).write.mode(
            "overwrite"
        ).parquet(args.build_baseline)

    if args.report_json or args.report_html or args.report_csv or args.report_pdf:
        from ultragendataset_datachecker_spark.report import build_report, write_report_json

        manifest_df = None
        if args.manifest and res.skipped_parts:
            from ultragendataset_datachecker_spark.checkpoint import read_manifest

            manifest_df = read_manifest(spark, args.manifest)
        rep = build_report(
            res, dataset_name=args.input,
            manifest=manifest_df, snapshot_id=args.snapshot_id,
            check_version=cfg.check_version,
        )
        if args.report_json:
            write_report_json(rep, args.report_json)
        if args.report_html:
            from ultragendataset_datachecker_spark.report import write_report_html

            write_report_html(rep, args.report_html)
        if args.report_csv:
            from ultragendataset_datachecker_spark.report import write_report_csv

            write_report_csv(rep, args.report_csv)
        if args.report_pdf:
            from ultragendataset_datachecker_spark.report import write_report_pdf

            write_report_pdf(rep, args.report_pdf)

    constraint_summary = None
    if args.constraints:
        from pyspark.sql import functions as F

        from ultragendataset_datachecker_spark.constraints import suite_from_spec

        with open(args.constraints) as fh:
            suite = suite_from_spec(json.load(fh))
        c_res = suite.evaluate(df, group_col=cfg.partition_col)
        c_res.write.mode("overwrite").parquet(f"{args.output}/constraints")
        c_back = spark.read.parquet(f"{args.output}/constraints")
        fails = (
            c_back.where(F.col("passed") == 0)
            .groupBy("level")
            .count()
            .collect()
        )
        by_level = {r["level"]: int(r["count"]) for r in fails}
        constraint_summary = {
            "suite": suite.name,
            "n_constraints": len(suite.constraints),
            "error_failures": by_level.get("error", 0),
            "warning_failures": by_level.get("warning", 0),
        }

        if args.anomaly_history:
            from ultragendataset_datachecker_spark.anomaly import A, detect_anomalies

            # run_id-partitioned history: dynamic overwrite replaces only
            # THIS run's partition, so a re-validation of the same snapshot
            # updates its rows instead of duplicating them (duplicate run
            # ids would make the window ordering nondeterministic)
            (
                c_back.select(
                    "grp", "check_name", "observed",
                    F.lit(args.snapshot_id).alias("run_id"),
                )
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("run_id")
                .parquet(args.anomaly_history)
            )
            hist = spark.read.parquet(args.anomaly_history)
            anom = detect_anomalies(
                hist,
                [
                    A.zscore(3.0, window=10, min_history=3),
                    A.relative_change(0.5, level="warning"),
                ],
            ).where(F.col("run_id") == args.snapshot_id)
            anom.write.mode("overwrite").parquet(f"{args.output}/anomalies")
            a_back = spark.read.parquet(f"{args.output}/anomalies")
            a_lv = {
                r["level"]: int(r["count"])
                for r in a_back.where(F.col("is_anomaly") == 1)
                .groupBy("level").count().collect()
            }
            constraint_summary["anomalies"] = {
                "history_runs": int(hist.select("run_id").distinct().count()),
                "error_anomalies": a_lv.get("error", 0),
                "warning_anomalies": a_lv.get("warning", 0),
            }

    fixed_summary = None
    if args.fix:
        from ultragendataset_datachecker_spark.fixes import fix_sequences

        fixed_df, _plan = fix_sequences(df, cfg)
        fixed_path = f"{args.output}/fixed_data"
        fixed_df.write.mode("overwrite").partitionBy(cfg.partition_col).parquet(fixed_path)
        # re-check the durably-written fixed table (main.py:117-133 reloads
        # the fixed file and re-runs all checks)
        refixed = spark.read.parquet(fixed_path)
        res2 = ValidationEngine(cfg).run(refixed, baseline=baseline)
        res2.metrics.write.mode("overwrite").parquet(f"{args.output}/fixed_metrics")
        res2.violations.write.mode("overwrite").parquet(f"{args.output}/fixed_violations")
        res2.verdicts.write.mode("overwrite").parquet(f"{args.output}/fixed_verdicts")
        fixed_summary = {
            "rows": int(refixed.count()),
            "parts": {
                str(r["part"]): r["verdict"]
                for r in res2.verdicts.where("part >= 0").select("part", "verdict").collect()
            },
            "violations": int(res2.violations.count()),
        }
        res2.unpersist()
    wall = time.time() - t0

    verdicts = {r["part"]: r["verdict"] for r in res.verdicts.select("part", "verdict").collect()}
    n_rows = sum(r["row_count"] for r in res.metrics.where("part >= 0").select("row_count").collect())
    summary = {
        "rows_validated": int(n_rows),
        "wall_sec": round(wall, 3),
        "sequences_per_sec": round(n_rows / wall, 1) if wall > 0 else None,
        "parts": {str(k): v for k, v in sorted(verdicts.items()) if k >= 0},
        "skipped_parts": list(res.skipped_parts),
        "violations": int(res.violations.count()),
    }
    if fixed_summary is not None:
        summary["fixed"] = fixed_summary
    if constraint_summary is not None:
        summary["constraints"] = constraint_summary
    if regression_flags is not None:
        summary["regression_flags"] = regression_flags
    print(json.dumps(summary))
    res.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
