"""Pure-pandas oracle: an independent re-implementation of the reference
checker's formulas, run on the same rows at test scale to pin the Spark
engine's semantics (FIXTURES.md §5). Each function cites the reference
formula it mirrors; none of this code runs in production.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

CHECKED_COLUMNS = ["doc_id", "tokens", "n_tok", "source"]


def missing_stats(pdf: pd.DataFrame, columns=CHECKED_COLUMNS) -> dict:
    """Ref checks/missing_values.py:34-51."""
    total_missing = 0
    missing_count = {}
    for col in columns:
        cnt = int(pdf[col].isna().sum())
        missing_count[col] = cnt
        total_missing += cnt
    total_cells = len(pdf) * len(columns)
    score = 1.0 - (total_missing / total_cells) if total_cells > 0 else 1.0
    return {"total_missing": total_missing, "missing_count": missing_count, "score": score}


def distribution_stats(series: pd.Series) -> dict:
    """Ref checks/data_distribution.py:60-96: pandas describe-style stats
    (std is sample ddof=1), scipy skew/kurtosis with bias=True (population
    Fisher-Pearson skew, excess kurtosis) — computed here from raw moments to
    avoid importing scipy."""
    s = series.dropna().astype(float)
    if len(s) == 0:
        return {}
    m = s.mean()
    d = s - m
    m2 = float((d**2).mean())
    m3 = float((d**3).mean())
    m4 = float((d**4).mean())
    skew = m3 / m2**1.5 if m2 > 0 else 0.0
    kurt = m4 / m2**2 - 3.0 if m2 > 0 else 0.0
    return {
        "mean": float(m),
        "std": float(s.std(ddof=1)),
        "std_pop": float(s.std(ddof=0)),
        "min": float(s.min()),
        "max": float(s.max()),
        "q1": float(s.quantile(0.25)),
        "median": float(s.quantile(0.5)),
        "q3": float(s.quantile(0.75)),
        "skew": float(skew),
        "kurt": float(kurt),
    }


def zscore_outlier_count(series: pd.Series, threshold: float = 3.0) -> int:
    """Ref checks/outliers.py:55-64 (scipy zscore ddof=0, nan omitted)."""
    s = series.dropna().astype(float)
    std = s.std(ddof=0)
    if len(s) == 0 or std == 0:
        return 0
    z = np.abs((s - s.mean()) / std)
    return int((z > threshold).sum())


def iqr_outlier_count(series: pd.Series, threshold: float = 1.5) -> int:
    """Ref checks/outliers.py:66-82."""
    s = series.dropna().astype(float)
    if len(s) == 0:
        return 0
    q1, q3 = s.quantile(0.25), s.quantile(0.75)
    iqr = q3 - q1
    return int(((s < q1 - threshold * iqr) | (s > q3 + threshold * iqr)).sum())


def duplicate_count_on_tokens(pdf: pd.DataFrame) -> int:
    """Ref checks/duplicates.py:46-47 with subset=[tokens] under the
    token-array-equality invariant; null/empty arrays excluded (they're
    separate checks)."""
    t = pdf["tokens"]
    mask = t.notna()
    keys = t[mask].map(lambda a: tuple(a) if a is not None else None)
    keys = keys[keys.map(len) > 0]
    return int(keys.duplicated(keep="first").sum())


def doc_id_duplicate_count(pdf: pd.DataFrame) -> int:
    """duplicated(keep='first') on doc_id (ref duplicates.py:46-47)."""
    d = pdf["doc_id"].dropna()
    return int(d.duplicated(keep="first").sum())


def balance_entropy(series: pd.Series) -> float:
    """Ref checks/data_balance.py:31-61: normalized entropy over non-null
    class counts; <=1 class → 0.0."""
    counts = series.dropna().value_counts()
    n_classes = len(counts)
    if n_classes <= 1:
        return 0.0
    probs = counts.values / counts.values.sum()
    ent = -np.sum(probs * np.log2(probs))
    return float(ent / np.log2(n_classes))


def format_issue_counts(pdf: pd.DataFrame, vocab_size: int) -> dict:
    """The engine's four format rules with reference null semantics
    (nulls valid, ref data_format.py:52)."""
    tokens = pdf["tokens"]
    n_tok = pdf["n_tok"]
    doc_id = pdf["doc_id"]
    has_tok = tokens.notna()
    size = tokens.map(lambda a: len(a) if a is not None else -1)
    mismatch = int((has_tok & n_tok.notna() & (size != n_tok)).sum())
    out_of_range = int(
        (
            has_tok
            & tokens.map(
                lambda a: any((t < 0) or (t >= vocab_size) for t in a) if a is not None else False
            )
        ).sum()
    )
    empty = int((has_tok & (size == 0)).sum())
    import re

    pat = re.compile(r"^doc_\d{10}$")
    bad_id = int(doc_id.dropna().map(lambda s: not bool(pat.match(s))).sum())
    return {
        "fmt_ntok_mismatch": mismatch,
        "fmt_token_range": out_of_range,
        "fmt_empty_tokens": empty,
        "fmt_doc_id": bad_id,
    }


def distribution_score(skew: float, kurt: float) -> float:
    """Ref checks/data_distribution.py:116-130."""
    penalty = 0.7 * min(abs(skew) / 3, 1) + 0.3 * min(abs(kurt) / 5, 1)
    return 1.0 - penalty


def overall_score(scores: dict[str, float]) -> float:
    """Ref report.py:48-70 weighted mean."""
    weights = {
        "missing_values": 1.0,
        "outliers": 0.8,
        "duplicates": 0.9,
        "data_format": 0.7,
        "data_balance": 0.6,
        "data_distribution": 0.5,
    }
    num = sum(scores[k] * weights[k] for k in scores)
    den = sum(weights[k] for k in scores)
    return num / den if den else None


def partition_report(pdf: pd.DataFrame, vocab_size: int, zscore_t=3.0) -> dict:
    """Run the full oracle on one partition's rows → expected scores dict,
    mirroring DatasetChecker.run_quality_check + QualityReport
    (ref checker.py:67-118, report.py:48-70)."""
    miss = missing_stats(pdf)
    dist = distribution_stats(pdf["n_tok"])
    fmt = format_issue_counts(pdf, vocab_size)
    n_rows = len(pdf)
    dup = duplicate_count_on_tokens(pdf)
    z_out = zscore_outlier_count(pdf["n_tok"], zscore_t)
    scores = {
        "missing_values": miss["score"],
        "duplicates": 1.0 - (dup / n_rows) if n_rows else 1.0,
        "outliers": 1.0 - (z_out / n_rows) if n_rows else 1.0,
        "data_format": 1.0 - sum(fmt.values()) / (n_rows * 4) if n_rows else 1.0,
        "data_balance": balance_entropy(pdf["source"]),
        "data_distribution": distribution_score(dist.get("skew", 0.0), dist.get("kurt", 0.0)),
    }
    return {
        "missing": miss,
        "dist": dist,
        "fmt": fmt,
        "dup_tokens": dup,
        "doc_id_dups": doc_id_duplicate_count(pdf),
        "zscore_outliers": z_out,
        "iqr_outliers": iqr_outlier_count(pdf["n_tok"]),
        "entropy": scores["data_balance"],
        "scores": scores,
        "overall": overall_score(scores),
    }
