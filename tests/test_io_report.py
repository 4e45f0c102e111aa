"""Sources/sinks round-trips (S1-S10) + report model."""

import json

import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark import EngineConfig, ValidationEngine
from ultragendataset_datachecker_spark.io import load_dataset, save_dataset
from ultragendataset_datachecker_spark.report import build_report, summary_text, write_report_json


@pytest.fixture(scope="module")
def small(sequences_df):
    return sequences_df.limit(200)


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_roundtrip(spark, small, tmp_path_factory, fmt):
    path = str(tmp_path_factory.mktemp("io") / f"ds_{fmt}")
    save_dataset(small, path, fmt=fmt)
    back = load_dataset(spark, path, fmt=fmt)
    assert back.count() == 200
    cols = set(back.columns)
    assert {"doc_id", "tokens", "n_tok", "source", "part"} <= cols
    # content check on a sortable projection (CSV loses null-vs-empty nuance
    # for arrays; compare on non-null token rows)
    a = {r["doc_id"]: (list(r["tokens"]) if r["tokens"] is not None else None, r["n_tok"])
         for r in small.collect()}
    b = {r["doc_id"]: (list(r["tokens"]) if r["tokens"] is not None else None, r["n_tok"])
         for r in back.collect()}
    matched = sum(1 for k in a if a[k] == b.get(k))
    assert matched >= (200 if fmt != "csv" else 190)


def test_text_sink(spark, small, tmp_path):
    path = str(tmp_path / "txt")
    save_dataset(small.select(F.col("doc_id").alias("value")), path, fmt="text")
    back = load_dataset(spark, path, fmt="text")
    assert back.count() == 200


def test_report_model(sequences_df, gen_spec, tmp_path):
    cfg = EngineConfig(vocab_size=gen_spec.vocab_size, allowed_sources=tuple(gen_spec.sources))
    res = ValidationEngine(cfg).run(sequences_df, persist=False)
    rep = build_report(res, "unit")
    assert rep["overall_score"] is not None
    assert set(rep["partitions"]) == {"0", "1", "2", "3"}
    for p in rep["partitions"].values():
        assert set(p["scores"]) == {
            "missing_values", "duplicates", "outliers",
            "data_format", "data_balance", "data_distribution",
        }
        assert p["verdict"] in ("pass", "fail")
    txt = summary_text(rep)
    assert "Overall Quality Score" in txt and "part 0" in txt
    out = tmp_path / "r.json"
    write_report_json(rep, str(out))
    assert json.loads(out.read_text())["dataset"] == "unit"


def test_report_html(sequences_df, gen_spec, tmp_path):
    from ultragendataset_datachecker_spark.report import write_report_html

    cfg = EngineConfig(vocab_size=gen_spec.vocab_size, allowed_sources=tuple(gen_spec.sources))
    res = ValidationEngine(cfg).run(sequences_df, persist=False)
    rep = build_report(res, "unit")
    out = tmp_path / "r.html"
    write_report_html(rep, str(out))
    html = out.read_text()
    assert html.startswith("<!DOCTYPE html>")
    assert "Dataset quality report" in html and "Per-partition scores" in html
    for part in rep["partitions"]:
        assert f"<td>{part}</td>" in html
    if rep["overall_score"] is not None:
        assert f"{rep['overall_score']:.3f}" in html


def test_arrow_ipc_load_multifile(spark, small, tmp_path):
    """S4: sharded Arrow IPC (file + stream flavors) loads distributed with
    schema sniffed from the first shard; values round-trip exactly."""
    import pyarrow as pa
    import pyarrow.ipc as pa_ipc

    pdf = small.toPandas()
    d = tmp_path / "arrow_ds"
    d.mkdir()
    third = len(pdf) // 3
    shards = [pdf.iloc[:third], pdf.iloc[third:2 * third], pdf.iloc[2 * third:]]
    for i, shard in enumerate(shards):
        table = pa.Table.from_pandas(shard.reset_index(drop=True), preserve_index=False)
        path = d / f"shard_{i}.arrow"
        if i == 2:  # one stream-format shard: both IPC flavors must decode
            with pa_ipc.new_stream(str(path), table.schema) as w:
                w.write_table(table)
        else:
            with pa_ipc.new_file(str(path), table.schema) as w:
                w.write_table(table)

    back = load_dataset(spark, str(d), fmt="arrow")
    assert back.count() == len(pdf)
    assert back.rdd.getNumPartitions() >= 2  # one task per shard, not a driver read
    a = {r["doc_id"]: (list(r["tokens"]) if r["tokens"] is not None else None, r["n_tok"])
         for r in small.collect()}
    b = {r["doc_id"]: (list(r["tokens"]) if r["tokens"] is not None else None, r["n_tok"])
         for r in back.collect()}
    assert a == b


def test_webdataset_load_multishard(spark, tmp_path):
    """S7: sharded WebDataset tar loads one-task-per-shard; adjacent members
    sharing a key group into one sample map; text fields project out."""
    import io as _io
    import tarfile

    from ultragendataset_datachecker_spark.io import webdataset_column

    d = tmp_path / "wds"
    d.mkdir()
    n_samples, per_shard = 12, 4
    for s in range(n_samples // per_shard):
        with tarfile.open(d / f"shard-{s:04d}.tar", "w") as tar:
            for i in range(s * per_shard, (s + 1) * per_shard):
                for ext, payload in (
                    ("txt", f"document {i}".encode()),
                    ("cls", str(i % 3).encode()),
                    ("bin", bytes([i % 251] * 16)),
                ):
                    body = _io.BytesIO(payload)
                    info = tarfile.TarInfo(name=f"sample{i:06d}.{ext}")
                    info.size = len(payload)
                    tar.addfile(info, body)

    wds = load_dataset(spark, str(d), fmt="webdataset")
    assert wds.count() == n_samples
    assert wds.rdd.getNumPartitions() >= 2  # shard = parallel unit
    rows = {r["__key__"]: r for r in webdataset_column(wds, "txt", as_text=True).collect()}
    assert len(rows) == n_samples
    for i in range(n_samples):
        r = rows[f"sample{i:06d}"]
        assert r["txt"] == f"document {i}"
        assert set(r["data"].keys()) == {"txt", "cls", "bin"}
        assert bytes(r["data"]["cls"]) == str(i % 3).encode()
        assert bytes(r["data"]["bin"]) == bytes([i % 251] * 16)
        assert r["__shard__"] == f"shard-{i // 4:04d}.tar"


def test_penalty_score_reference_semantics():
    """A23: the app.py Report class's 0-100 penalty score (app.py:1825-1831)."""
    from ultragendataset_datachecker_spark.report import penalty_score

    assert penalty_score(0, 0) == 100.0
    assert penalty_score(1, 0) == 90.0
    assert penalty_score(0, 1) == 98.0
    assert penalty_score(3, 5) == 100 - 30 - 10
    assert penalty_score(100, 0) == 20.0   # error penalty capped at 80
    assert penalty_score(0, 100) == 80.0   # warning penalty capped at 20
    assert penalty_score(100, 100) == 0.0


def test_penalty_score_in_report(sequences_df, gen_spec):
    from ultragendataset_datachecker_spark import EngineConfig, ValidationEngine
    from ultragendataset_datachecker_spark.report import penalty_score

    cfg = EngineConfig(vocab_size=gen_spec.vocab_size, allowed_sources=tuple(gen_spec.sources))
    res = ValidationEngine(cfg).run(sequences_df, persist=False)
    rep = build_report(res, "unit")
    fails = sum(1 for p in rep["partitions"].values() if p["verdict"] == "fail")
    warns = sum(1 for p in rep["partitions"].values() if p.get("drift_flag"))
    assert rep["penalty_score"] == penalty_score(fails, warns)


def test_job_cli_input_format_json(spark, small, tmp_path, capsys):
    """--input-format routes the job through the multi-format loader."""
    from ultragendataset_datachecker_spark import job

    save_dataset(small, str(tmp_path / "seq_json"), fmt="json")
    rc = job.main([
        "--input", str(tmp_path / "seq_json"), "--input-format", "json",
        "--output", str(tmp_path / "out_json"),
    ])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["rows_validated"] == 200


def test_report_csv(sequences_df, gen_spec, tmp_path):
    """S10 CSV sink — reference Report.to_csv shape (app.py:1861-1895): one
    row per error/warning with message_type + dataset metadata columns, and
    a single info row for a clean report."""
    import csv

    from ultragendataset_datachecker_spark.report import report_csv_rows, write_report_csv

    cfg = EngineConfig(vocab_size=gen_spec.vocab_size, allowed_sources=tuple(gen_spec.sources))
    res = ValidationEngine(cfg).run(sequences_df, persist=False)
    rep = build_report(res, "unit")
    out = tmp_path / "r.csv"
    write_report_csv(rep, str(out))
    with open(out, newline="") as f:
        rows = list(csv.DictReader(f))
    assert rows and all(r["dataset_name"] == "unit" for r in rows)
    assert all(r["message_type"] in ("error", "warning") for r in rows)
    # every uncapped violation count appears as an error row
    assert len([r for r in rows if r["message_type"] == "error"]) == len(
        rep["violation_counts"]
    )

    clean = {
        "dataset": "empty", "generated_at": "t", "overall_score": 1.0,
        "violation_counts": {}, "partitions": {},
    }
    info = report_csv_rows(clean)
    assert len(info) == 1 and info[0]["message_type"] == "info"
    assert info[0]["message"] == "No errors or warnings found"


def test_report_pdf(sequences_df, gen_spec, tmp_path):
    """S10 PDF sink (reference Report.to_pdf analogue): parseable header,
    valid xref offsets, the verdict lines present as page text."""
    from ultragendataset_datachecker_spark.report import render_report_pdf, write_report_pdf

    cfg = EngineConfig(vocab_size=gen_spec.vocab_size, allowed_sources=tuple(gen_spec.sources))
    res = ValidationEngine(cfg).run(sequences_df, persist=False)
    rep = build_report(res, "unit")
    out = tmp_path / "r.pdf"
    write_report_pdf(rep, str(out))
    data = out.read_bytes()
    assert data.startswith(b"%PDF-1.4")
    assert data.rstrip().endswith(b"%%EOF")
    # startxref points at the xref table; every offset points at its object
    tail = data.rstrip().rsplit(b"startxref", 1)[1]
    xref_at = int(tail.split(b"%%EOF")[0].strip())
    assert data[xref_at:xref_at + 4] == b"xref"
    import re as _re
    offsets = _re.findall(rb"(\d{10}) 00000 n", data[xref_at:])
    assert len(offsets) >= 5
    for i, off in enumerate(offsets, start=1):
        assert data[int(off):int(off) + len(f"{i} 0 obj")] == f"{i} 0 obj".encode()
    # content: the summary's headline + a verdict line (escaped text stream
    # is plain latin-1 for this report, so substring match is valid on the
    # uncompressed stream bytes)
    assert b"Dataset Quality Report for 'unit'" in data
    assert render_report_pdf(rep) == data
