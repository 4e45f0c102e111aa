"""Quality report (S10): JSON + text renderings of a validation run.

One coherent report model replacing the reference's two disagreeing Report
classes (/root/reference/dataset_checker/report.py vs /root/reference/app.py
Report — app.py:389-404 calls to_csv/to_pdf/error_count that exist only on
the other class; SURVEY §3.1). Summary format mirrors
dataset_checker/report.py:72-137 (overall score, quality level, per-check
lines); quality-level bands from report.py:89-93.

Everything here consumes the tiny metrics/verdicts frames — no scan of the
fact table.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.checks.column_stats import GLOBAL_PART
from ultragendataset_datachecker_spark.engine import ValidationResult


def _quality_level(score: float) -> str:
    # ref report.py:89-93
    if score >= 0.9:
        return "Excellent"
    if score >= 0.8:
        return "Good"
    if score >= 0.7:
        return "Fair"
    if score >= 0.6:
        return "Poor"
    return "Problematic"


def penalty_score(error_count: int, warning_count: int) -> float:
    """A23: the *other* reference Report class's 0-100 penalty score
    (app.py:1825-1831): 100 when clean, else errors cost 10 points each
    (capped at 80) and warnings 2 points each (capped at 20), floored at 0.
    Kept alongside the weighted overall_score so both reference scoring
    models are available; in build_report errors = partitions failing the
    verdict gate, warnings = partitions with a drift flag."""
    if error_count + warning_count == 0:
        return 100.0
    return float(
        max(0, 100 - min(error_count * 10, 80) - min(warning_count * 2, 20))
    )


def build_report(
    result: ValidationResult,
    dataset_name: str = "dataset",
    manifest: "DataFrame | None" = None,
    snapshot_id: str | None = None,
    check_version: str | None = None,
) -> dict:
    """Report model. On a manifest resume, pass the manifest DataFrame (and
    optionally the snapshot id) to merge the skipped partitions' durable
    verdicts back in: the per-partition table then covers the WHOLE dataset
    and ``dataset_verdict`` is the all-parts gate. The GLOBAL score itself
    stays partial-flagged — finalized stats (stddev/quantiles) are not
    mergeable post-hoc, so we report the honest thing rather than a
    recomputed approximation."""
    verdicts = [r.asDict() for r in result.verdicts.orderBy("part").collect()]
    # uncapped counts when available — the per-(part,check) example cap must
    # not deflate the reported totals
    counts_df = (
        result.violation_counts
        if result.violation_counts is not None
        else result.violations.groupBy("part", "check_name").agg(F.count(F.lit(1)).alias("n"))
    )
    vio_counts = {f"{r['part']}:{r['check_name']}": r["n"] for r in counts_df.collect()}
    glob = next((v for v in verdicts if v["part"] == GLOBAL_PART), None)
    parts = [v for v in verdicts if v["part"] != GLOBAL_PART]
    report = {
        "dataset": dataset_name,
        "generated_at": datetime.now(timezone.utc).isoformat(),
        "overall_score": glob["overall_score"] if glob else None,
        "quality_level": _quality_level(glob["overall_score"]) if glob else None,
        "verdict": glob["verdict"] if glob else None,
        "partitions": {
            str(v["part"]): {
                "row_count": v["row_count"],
                "scores": {k.removeprefix("score_"): v[k] for k in v if k.startswith("score_")},
                "overall_score": v["overall_score"],
                "verdict": v["verdict"],
                **({"max_psi": v["max_psi"], "drift_flag": v["drift_flag"]} if "max_psi" in v else {}),
            }
            for v in parts
        },
        "violation_counts": vio_counts,
        "penalty_score": penalty_score(
            sum(1 for v in parts if v["verdict"] == "fail"),
            sum(1 for v in parts if v.get("drift_flag")),
        ),
        "skipped_parts": list(result.skipped_parts),
        # On a manifest resume the GLOBAL rollup covers only newly-validated
        # partitions; flag it so a partial run is never read as dataset-wide
        "coverage": {
            "validated_parts": len(parts),
            "skipped_parts": len(result.skipped_parts),
            "global_is_partial": bool(result.skipped_parts),
        },
    }
    if result.skipped_parts and manifest is not None:
        hist = manifest.where(F.col("part").isin(list(result.skipped_parts)))
        if snapshot_id is not None:
            hist = hist.where(F.col("snapshot_id") == snapshot_id)
        if check_version is not None:
            # same filter the resume path applies (checkpoint.validated_parts):
            # a verdict produced by another engine version is not current
            hist = hist.where(
                F.element_at(F.col("check_versions"), "engine") == check_version
            )
        latest = hist.groupBy("part").agg(
            F.max_by("verdict", "validated_at").alias("verdict")
        )
        merged = latest.collect()
        for r in merged:
            report["partitions"][str(r["part"])] = {
                "verdict": r["verdict"],
                "from_manifest": True,
            }
        report["coverage"]["merged_from_manifest"] = len(merged)
    # dataset_verdict is the all-parts gate — only meaningful when the
    # partition table actually covers every skipped partition (manifest
    # merge supplied their durable verdicts). A resume without the manifest
    # covers a subset, and an all-pass over that subset must not read as a
    # dataset-wide pass while a skipped partition previously failed.
    covered = set(report["partitions"])
    skipped = {str(p) for p in result.skipped_parts}
    report["dataset_verdict_partial"] = not skipped <= covered
    all_verdicts = [p["verdict"] for p in report["partitions"].values()]
    report["dataset_verdict"] = (
        "pass" if all_verdicts and all(v == "pass" for v in all_verdicts) else "fail"
    )
    return report


def summary_text(report: dict) -> str:
    """Human summary, mirroring QualityReport.summary (ref report.py:72-137)."""
    lines = [
        f"Dataset Quality Report for '{report['dataset']}'",
        f"Generated on: {report['generated_at']}",
        "",
    ]
    if report["overall_score"] is not None:
        partial = (
            " [PARTIAL: covers newly-validated partitions only; "
            f"{report['coverage']['skipped_parts']} skipped via manifest]"
            if report.get("coverage", {}).get("global_is_partial")
            else ""
        )
        lines.append(
            f"Overall Quality Score: {report['overall_score']:.2f} - {report['quality_level']}{partial}"
        )
        lines.append("")
    lines.append("Per-partition verdicts:")
    for part, p in report["partitions"].items():
        if p.get("from_manifest"):
            lines.append(f"- part {part}: {p['verdict']} (previously validated; from manifest)")
        else:
            lines.append(
                f"- part {part}: {p['verdict']} (score {p['overall_score']:.3f}, rows {p['row_count']})"
            )
    fails = [p for p in report["partitions"].values() if p["verdict"] == "fail"]
    lines.append("")
    lines.append(f"{len(fails)} of {len(report['partitions'])} partitions fail the 0.8 gate.")
    if "dataset_verdict" in report:
        scope = (
            "validated partitions only — skipped partitions' verdicts not merged"
            if report.get("dataset_verdict_partial")
            else "all partitions"
        )
        lines.append(f"Dataset verdict ({scope}): {report['dataset_verdict']}")
    return "\n".join(lines)


def write_report_json(report: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(report, f, indent=2, default=str)


def report_csv_rows(report: dict) -> list[dict]:
    """The reference Report.to_csv shape (app.py:1861-1895): one row per
    error/warning message with a message_type column plus dataset metadata
    on every row; a single info row when the run is clean. Errors here are
    per-(part, check) violation counts; warnings are per-part drift flags.
    Driver-side only — consumes the already-collected report dict."""
    meta = {
        "dataset_name": report["dataset"],
        "timestamp": report["generated_at"],
        "overall_score": report["overall_score"],
    }
    rows: list[dict] = []
    for key, n in sorted(report.get("violation_counts", {}).items()):
        part, check = key.split(":", 1)
        rows.append({
            "message_type": "error", "part": part, "check_name": check,
            "count": n, **meta,
        })
    for part, p in report.get("partitions", {}).items():
        if p.get("drift_flag"):
            rows.append({
                "message_type": "warning", "part": part, "check_name": "drift_psi",
                "count": 1, **meta,
            })
    if not rows:
        rows.append({
            "message_type": "info", "part": "", "check_name": "",
            "count": 0, **meta,
            "message": "No errors or warnings found",
        })
    return rows


def write_report_csv(report: dict, path: str) -> None:
    """S10 CSV sink — reference Report.to_csv analogue."""
    import csv

    rows = report_csv_rows(report)
    fields = ["message_type", "part", "check_name", "count",
              "dataset_name", "timestamp", "overall_score"]
    if any("message" in r for r in rows):
        fields.append("message")
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)


_LEVEL_COLORS = {  # ref report.py:241-248 band colors, same thresholds
    "Excellent": "#2e7d32", "Good": "#558b2f", "Fair": "#f9a825",
    "Poor": "#ef6c00", "Problematic": "#c62828",
}


def render_report_html(report: dict) -> str:
    """HTML rendering of the report dict — the S10 HTML sink
    (ref dataset_checker/report.py:202-441: header with overall score badge,
    per-check score table, recommendations-style summary). Driver-side only:
    consumes the already-collected report dict, never a DataFrame."""
    glob_score = report.get("overall_score")
    level = report.get("quality_level") or ""
    color = _LEVEL_COLORS.get(level, "#555")
    head = f"""<!DOCTYPE html><html><head><meta charset="utf-8">
<title>Quality report — {report['dataset']}</title>
<style>
 body {{ font-family: system-ui, sans-serif; margin: 2rem; color: #222; }}
 .badge {{ display: inline-block; padding: .3rem .8rem; border-radius: .5rem;
          color: #fff; background: {color}; font-weight: 600; }}
 table {{ border-collapse: collapse; margin: 1rem 0; }}
 th, td {{ border: 1px solid #ccc; padding: .35rem .7rem; text-align: right; }}
 th {{ background: #f4f4f4; }} td:first-child, th:first-child {{ text-align: left; }}
 .fail {{ color: #c62828; font-weight: 600; }} .pass {{ color: #2e7d32; }}
</style></head><body>
<h1>Dataset quality report — {report['dataset']}</h1>
<p>Generated: {report['generated_at']}</p>"""
    parts = []
    if glob_score is not None:
        partial = ""
        if report.get("coverage", {}).get("global_is_partial"):
            partial = (
                f" <em>(partial: {report['coverage']['skipped_parts']} partitions "
                "skipped via manifest)</em>"
            )
        parts.append(
            f"<p>Overall score: <span class='badge'>{glob_score:.3f} — {level}</span>"
            f" · verdict <b class='{report['verdict']}'>{report['verdict']}</b>{partial}</p>"
        )
    score_names = sorted(
        {k for p in report["partitions"].values() for k in p.get("scores", {})}
    )
    rows = ["<tr><th>part</th><th>rows</th>"
            + "".join(f"<th>{s}</th>" for s in score_names)
            + "<th>overall</th><th>verdict</th></tr>"]
    for part, p in report["partitions"].items():
        if p.get("from_manifest"):
            cells = "".join("<td>—</td>" for _ in score_names)
            rows.append(
                f"<tr><td>{part}</td><td>—</td>{cells}<td>—</td>"
                f"<td class='{p['verdict']}'>{p['verdict']} (manifest)</td></tr>"
            )
            continue
        cells = "".join(f"<td>{p['scores'][s]:.4f}</td>" for s in score_names)
        rows.append(
            f"<tr><td>{part}</td><td>{p['row_count']}</td>{cells}"
            f"<td>{p['overall_score']:.4f}</td>"
            f"<td class='{p['verdict']}'>{p['verdict']}</td></tr>"
        )
    parts.append("<h2>Per-partition scores</h2><table>" + "".join(rows) + "</table>")
    if report.get("violation_counts"):
        vrows = ["<tr><th>partition : check</th><th>violations</th></tr>"] + [
            f"<tr><td>{k}</td><td>{v}</td></tr>"
            for k, v in sorted(report["violation_counts"].items())
        ]
        parts.append("<h2>Violation counts</h2><table>" + "".join(vrows) + "</table>")
    return head + "".join(parts) + "</body></html>"


def write_report_html(report: dict, path: str) -> None:
    with open(path, "w") as f:
        f.write(render_report_html(report))


def render_report_pdf(report: dict) -> bytes:
    """S10 PDF sink — reference Report.to_pdf analogue
    (/root/reference/app.py:2081-2105, fpdf there). No PDF lib in this
    environment, so this writes the raw PDF 1.4 object graph directly:
    catalog -> pages -> one page object per 54 summary lines, each with a
    Helvetica text-stream content object and a correct xref table. The
    content is summary_text plus the violation-count table — the same
    information the text/CSV/HTML sinks carry. Driver-side only (consumes
    the collected report dict)."""
    lines = summary_text(report).split("\n")
    vc = report.get("violation_counts") or {}
    if vc:
        lines += ["", "Violation counts:"] + [
            f"- {k}: {v}" for k, v in sorted(vc.items())
        ]

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    per_page = 54  # 10pt font, 12pt leading inside a 720pt -> 72pt column
    pages = [lines[i:i + per_page] for i in range(0, len(lines), per_page)] or [[""]]

    # objects: 1 catalog, 2 pages, 3 font, then (page, content) per page
    objs: dict[int, bytes] = {}
    page_ids = [4 + 2 * i for i in range(len(pages))]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (f"<< /Type /Pages /Kids [{kids}] /Count {len(pages)} >>").encode()
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for pid, page_lines in zip(page_ids, pages):
        body = "BT /F1 10 Tf 12 TL 72 720 Td\n" + "\n".join(
            f"({esc(ln)}) Tj T*" for ln in page_lines
        ) + "\nET"
        stream = body.encode("latin-1", "replace")
        objs[pid] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> "
            + f"/Contents {pid + 1} 0 R >>".encode()
        )
        objs[pid + 1] = (
            f"<< /Length {len(stream)} >>\nstream\n".encode() + stream + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n_objs = max(objs) + 1
    out += f"xref\n0 {n_objs}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, n_objs):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n_objs} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def write_report_pdf(report: dict, path: str) -> None:
    with open(path, "wb") as f:
        f.write(render_report_pdf(report))
