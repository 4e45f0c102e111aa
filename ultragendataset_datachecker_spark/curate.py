"""spark-submit entry point for corpus curation — the training-data pipeline
the ops/ modules exist for, as one composable CLI:

    quality filter -> benchmark decontamination -> near-dup cluster dedup
                   -> repeated-span cut -> per-source stratified sample
                   -> PII redaction -> split assignment -> write survivors

Usage:
    python -m ultragendataset_datachecker_spark.curate \
        --input <documents parquet> --output <dir> \
        [--quality] [--decontam <benchmark parquet>] [--dedup-ngram T] \
        [--sample-per-source K] [--master local[8]]

Each stage is optional and they compose in the order above (the order real
pipelines use: cheap per-doc filters first so the expensive pairwise stages
see a smaller corpus). Outputs:
    <output>/kept         surviving documents (parquet)
    <output>/dropped      (doc_id, drop_stage) audit trail (parquet)
plus a one-line JSON summary on stdout.

Every stage is the library operator; this module only wires them:
ops/quality.quality_signals, ops/decontam.flag_contamination,
ops/dedup.ngram_jaccard_duplicates + ops/graph.keep_one_per_cluster,
ops/spans.cut_repeated_text_spans, ops/sampling.stratified_sample.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _positive_int(s: str) -> int:
    """argparse type: int >= 1 (0 would silently no-op a falsy flag check;
    negatives would surface as a ValueError traceback from shuffled_shards)."""
    v = int(s)
    if v < 1:
        raise argparse.ArgumentTypeError(f"must be >= 1, got {v}")
    return v


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Corpus curation pipeline")
    p.add_argument("--input", required=True, help="documents table path (parquet)")
    p.add_argument("--output", required=True, help="output directory (kept/, dropped/)")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--quality", action="store_true",
                   help="drop documents failing the Gopher/C4 quality rules")
    p.add_argument("--decontam", metavar="BENCH_PATH",
                   help="drop documents sharing a word n-gram with this benchmark parquet")
    p.add_argument("--decontam-n", type=int, default=8,
                   help="n-gram window for decontamination (default 8)")
    p.add_argument("--dedup-ngram", type=float, metavar="THRESHOLD",
                   help="near-dup cluster dedup: ngram-Jaccard >= THRESHOLD pairs -> "
                        "connected components -> keep the min-id doc per cluster")
    p.add_argument("--dedup-keep-best", metavar="SCORE_COL",
                   help="with --dedup-ngram: keep each cluster's highest-SCORE_COL "
                        "member instead of the min-id one")
    p.add_argument("--cut-spans", type=int, metavar="K",
                   help="substring-level dedup: cut all-but-first occurrences of "
                        "repeated K-word spans from surviving docs' text")
    p.add_argument("--sample-per-source", type=int, metavar="K",
                   help="deterministic stratified sample: keep K docs per source")
    p.add_argument("--strata-col", default="source")
    p.add_argument("--redact-pii", action="store_true",
                   help="replace emails/phones/IPs/SSNs/cards in surviving docs' "
                        "text with typed placeholder tokens")
    p.add_argument("--split", metavar="SPEC",
                   help="append a deterministic content-hash split column, e.g. "
                        "'train:0.9,val:0.05,test:0.05'")
    p.add_argument("--pack", type=int, metavar="BUDGET",
                   help="assign surviving docs to fixed-budget packs "
                        "(greedy strategy over --pack-size-col)")
    p.add_argument("--pack-size-col", default="n_chars")
    p.add_argument("--shuffle-shards", type=_positive_int, metavar="N",
                   help="write kept/ as a deterministic pseudo-random training "
                        "order: N shard directories (N >= 1), rows stored in "
                        "epoch order (ops/ordering.write_shuffled)")
    p.add_argument("--shuffle-seed", default="epoch-0",
                   help="permutation name for --shuffle-shards (e.g. the epoch "
                        "id; a new seed gives an independent order)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)
    if args.dedup_keep_best and args.dedup_ngram is None:
        p.error("--dedup-keep-best requires --dedup-ngram (it selects WHICH "
                "member of each near-dup cluster survives)")

    from pyspark.sql import functions as F

    from ultragendataset_datachecker_spark.session import get_spark

    spark = get_spark(app_name="curate", master=args.master or "local[*]")
    t0 = time.time()

    docs = spark.read.parquet(args.input)
    id_c, text_c = args.id_col, args.text_col
    stages: list[tuple[str, int]] = []
    dropped_parts = []  # DataFrames of (doc_id, drop_stage)
    n_in = docs.count()

    if args.quality:
        from ultragendataset_datachecker_spark.ops.quality import quality_signals

        scored = quality_signals(docs, text_col=text_c)
        bad = scored.where(~F.col("gopher_pass")).select(
            F.col(id_c), F.lit("quality").alias("drop_stage")
        )
        dropped_parts.append(bad)
        docs = scored.where(F.col("gopher_pass")).select(*docs.columns)
        stages.append(("quality", docs.count()))

    if args.decontam:
        from ultragendataset_datachecker_spark.ops.decontam import flag_contamination

        bench = spark.read.parquet(args.decontam)
        hits = flag_contamination(
            docs, bench, text_col=text_c, id_col=id_c, n=args.decontam_n
        ).select(id_c)
        dropped_parts.append(hits.select(F.col(id_c), F.lit("decontam").alias("drop_stage")))
        docs = docs.join(hits, id_c, "left_anti")
        stages.append(("decontam", docs.count()))

    if args.dedup_ngram is not None:
        from ultragendataset_datachecker_spark.ops.dedup import ngram_jaccard_duplicates
        from ultragendataset_datachecker_spark.ops.graph import duplicate_clusters

        pairs = ngram_jaccard_duplicates(
            docs, id_c, text_c, shingle_n=2, threshold=args.dedup_ngram
        )
        if args.dedup_keep_best:
            from ultragendataset_datachecker_spark.ops.graph import losers_per_cluster

            losers = losers_per_cluster(
                docs, pairs, args.dedup_keep_best, id_col=id_c
            ).withColumnRenamed("doc_id", id_c)
        else:
            clusters = duplicate_clusters(pairs)
            losers = clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
                F.col("doc_id").alias(id_c)
            )
        dropped_parts.append(
            losers.select(F.col(id_c), F.lit("dedup").alias("drop_stage"))
        )
        docs = docs.join(losers, id_c, "left_anti")
        stages.append(("dedup", docs.count()))

    n_docs_cut = None
    if args.cut_spans is not None:
        from ultragendataset_datachecker_spark.ops.spans import cut_repeated_text_spans

        docs = cut_repeated_text_spans(
            docs, text_col=text_c, id_col=id_c, k=args.cut_spans
        )
        n_docs_cut = docs.where(F.col("spans_cut") > 0).count()
        docs = docs.drop("spans_cut")
        stages.append(("cut_spans", docs.count()))  # doc count unchanged; text shrinks

    if args.sample_per_source is not None:
        from ultragendataset_datachecker_spark.ops.sampling import stratified_sample

        sampled = stratified_sample(
            docs, args.strata_col, args.sample_per_source, id_col=id_c,
            scale_prefilter=True,
        ).drop("sample_rank")
        losers = docs.select(id_c).join(sampled.select(id_c), id_c, "left_anti")
        dropped_parts.append(
            losers.select(F.col(id_c), F.lit("sample").alias("drop_stage"))
        )
        docs = sampled
        stages.append(("sample", docs.count()))

    n_pii_redacted = None
    if args.redact_pii:
        # late in the chain on purpose: redact only what survives filtering,
        # and never before dedup (masking must not merge distinct docs)
        from ultragendataset_datachecker_spark.ops.pii import redact_pii, scan_pii

        n_pii_redacted = (
            scan_pii(docs, text_c).where(F.col("n_pii_total") > 0).count()
        )
        cols = docs.columns
        docs = (
            redact_pii(docs, text_c, out_col="__redacted")
            .withColumn(text_c, F.col("__redacted"))
            .select(*cols)
        )
        stages.append(("redact_pii", docs.count()))  # doc count unchanged

    if args.split:
        from ultragendataset_datachecker_spark.ops.sampling import hash_split

        weights = {}
        for part in args.split.split(","):
            name, _, w = part.partition(":")
            weights[name.strip()] = float(w)
        docs = hash_split(docs, weights, id_col=id_c)

    if args.pack is not None:
        from ultragendataset_datachecker_spark.ops.packing import pack_documents

        assignment = pack_documents(
            docs, args.pack_size_col, args.pack, id_col=id_c, strategy="greedy"
        ).select(id_c, "bucket", "pack_id", "pack_offset")
        docs = docs.join(assignment, id_c)

    if args.shuffle_shards is not None:
        from ultragendataset_datachecker_spark.ops.ordering import write_shuffled

        write_shuffled(
            docs, f"{args.output}/kept", args.shuffle_shards,
            seed=args.shuffle_seed, id_col=id_c,
        )
    else:
        docs.write.mode("overwrite").parquet(f"{args.output}/kept")
    if dropped_parts:
        audit = dropped_parts[0]
        for d in dropped_parts[1:]:
            audit = audit.unionByName(d)
        audit.write.mode("overwrite").parquet(f"{args.output}/dropped")

    n_kept = spark.read.parquet(f"{args.output}/kept").count()
    summary = {
        "docs_in": n_in,
        "docs_kept": n_kept,
        "stages": {name: n for name, n in stages},
        "wall_sec": round(time.time() - t0, 3),
    }
    if n_docs_cut is not None:
        summary["docs_span_cut"] = n_docs_cut
    if n_pii_redacted is not None:
        summary["docs_pii_redacted"] = n_pii_redacted
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
