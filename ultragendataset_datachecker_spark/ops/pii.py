"""PII detection and redaction for LLM training-data curation.

Web-scale corpora leak emails, phone numbers, IP addresses and government /
card identifiers; every production pipeline (C4, RefinedWeb, Dolma) runs a
regex PII pass before training. This module implements that pass as a pure
per-row map over the text column — ZERO shuffle, whole-stage-codegen
`regexp_count` / `regexp_replace`, no Python in the hot path — so it scales
linearly and survives a 100x scale-up unchanged, exactly like ops/quality.py.

The reference engine validates *formats* of structured columns (emails,
phones, IPs at /root/reference/data_format.py:145-300); this module is the
free-text counterpart: find those same entities INSIDE document text and
count / redact them. The patterns reuse the reference's entity classes but
are deliberately written in the common subset of Java regex (Spark) and RE2
(DuckDB) — no lookarounds, no backreferences — so the DuckDB oracle replays
them verbatim.

Redaction replaces each match with a typed placeholder token
(``<EMAIL>`` etc.), the convention used by published pipelines so the
tokenizer sees a stable symbol instead of a hole.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered dict: redaction applies patterns in this order, so overlapping
# classes resolve deterministically (credit-card before phone: a 16-digit
# grouped number must not be half-eaten by the phone pattern).
PII_PATTERNS: dict[str, str] = {
    # local-part@domain.tld — same class as reference data_format.py email rule
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # 4x4 digit groups separated by - or space
    "credit_card": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
    # US SSN shape ddd-dd-dddd
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # ddd-ddd-dddd / ddd.ddd.dddd phone shape
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    # dotted-quad IPv4
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

REDACTION_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "credit_card": "<CARD>",
    "ssn": "<SSN>",
    "phone": "<PHONE>",
    "ipv4": "<IP>",
}


def pii_counts(text: Column, patterns: dict[str, str] | None = None) -> list[Column]:
    """One `regexp_count` Column per PII class, aliased ``n_<class>``.

    All counts evaluate in a single codegen stage over one pass of the
    string column; adding classes adds expressions, not jobs.
    """
    patterns = patterns or PII_PATTERNS
    return [
        F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat in patterns.items()
    ]


def scan_pii(
    df: DataFrame, text_col: str = "text", patterns: dict[str, str] | None = None
) -> DataFrame:
    """Append per-document PII counts and ``n_pii_total``.

    Pure map — at 10^12 rows this is one scan with predicate/column pruning
    intact; the counts feed either a filter (drop documents with identifiers)
    or :func:`redact_pii` (keep the text, mask the identifiers).

    ``n_pii_total`` is the SUM of the per-class counts: a span matched by
    two classes (e.g. a 4x4-digit group is both a credit_card and, sliced
    differently, phone-shaped) counts once per class, not once per span —
    the classes are counted independently in one codegen pass, which is what
    keeps this a zero-shuffle map.

    Raises on output-column collisions (an existing ``n_<class>`` /
    ``n_pii_total`` column would make every downstream reference ambiguous).
    """
    patterns = patterns or PII_PATTERNS
    out_names = [f"n_{name}" for name in patterns] + ["n_pii_total"]
    clash = sorted(set(out_names) & set(df.columns))
    if clash:
        raise ValueError(
            f"scan_pii output column(s) {clash} already exist in the input; "
            "rename or drop them first"
        )
    counted = df.select("*", *pii_counts(F.col(text_col), patterns))
    total = None
    for name in patterns:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return counted.withColumn("n_pii_total", total.cast("long"))


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
    patterns: dict[str, str] | None = None,
    tokens: dict[str, str] | None = None,
) -> DataFrame:
    """Append ``out_col`` = text with every PII match replaced by its typed
    placeholder. A chain of `regexp_replace` in PII_PATTERNS order — still a
    single codegen map stage, order fixed so overlapping classes are
    deterministic."""
    patterns = patterns or PII_PATTERNS
    tokens = tokens or REDACTION_TOKENS
    col: Column = F.col(text_col)
    for name, pat in patterns.items():
        col = F.regexp_replace(col, F.lit(pat), F.lit(tokens.get(name, "<PII>")))
    return df.withColumn(out_col, col)


def pii_rates(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-group PII incidence: doc counts, docs with any PII, per-class match
    totals. One partial-aggregated groupBy over the scanned frame — the
    shuffle carries O(groups x classes) longs."""
    patterns = patterns or PII_PATTERNS
    scanned = scan_pii(df, text_col, patterns)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_pii_total") > 0).cast("long")).alias("n_docs_with_pii"),
        F.sum("n_pii_total").alias("n_pii_total"),
    ]
    aggs += [F.sum(f"n_{name}").alias(f"n_{name}") for name in patterns]
    return scanned.groupBy(group_col).agg(*aggs)
