"""Generic semantic format validators (SURVEY §2.6 F1–F8) — the reference's
most-used surface, rebuilt as Column-predicate builders.

Reference registry: /root/reference/dataset_checker/checks/data_format.py:145-158
maps format name → per-value Python predicate run through ``Series.apply``
(the per-row anti-pattern, :52). Here each validator is a builder returning a
Column predicate (True = VALID) that stays inside whole-stage codegen
(rlike / try_cast / try_to_timestamp), so a million-row validation is one
scan, no Python.

Null semantics follow the reference (:52 ``if pd.notnull(x) else True``):
nulls are VALID for format purposes — missingness is its own check. The
``*_issue`` helpers apply that rule.

Each validator cites the reference implementation it mirrors. Deliberate
divergences (documented):
- date: reference tries 9 strptime formats (:183-205); strptime '%d' accepts
  a non-padded day while Java's 'dd' does not — single-digit-day inputs in
  the non-ISO formats may differ. ISO dates and clear garbage agree.
- number/integer/float/boolean: the reference checks PYTHON types
  (:276-300); a string column in Spark maps to parseability (try_cast), the
  SURVEY-documented translation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.checks.violations import RowCheck

# ---------------------------------------------------------------- validators

EMAIL_RE = r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$"
URL_RE = r"^(https?|ftp)://[^\s/$.?#].[^\s]*$"
ZIP_US_RE = r"^\d{5}(-\d{4})?$"
ZIP_CA_RE = r"^[A-Za-z]\d[A-Za-z][ -]?\d[A-Za-z]\d$"
ZIP_UK_RE = r"^[A-Za-z]{1,2}\d[A-Za-z\d]?[ ]?\d[A-Za-z]{2}$"
ZIP_GENERIC_RE = r"^[A-Za-z0-9]{4,10}$"
IPV6_RE = r"^([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}$"

# reference date formats (data_format.py:192-196), strptime → Java patterns
DATE_FORMATS = [
    "yyyy-MM-dd", "dd/MM/yyyy", "MM/dd/yyyy", "yyyy/MM/dd",
    "dd-MM-yyyy", "MM-dd-yyyy", "yyyyMMdd",
    "dd MMM yyyy", "dd MMMM yyyy",
]


def email_valid(c: Column) -> Column:
    """data_format.py:160-166."""
    return c.rlike(EMAIL_RE)


def phone_valid(c: Column) -> Column:
    """data_format.py:168-181: strip [\\s\\-.()] separators, then all-digits
    with length 7-15 ('+' intentionally not stripped, as in the reference)."""
    stripped = F.regexp_replace(c.cast("string"), r"[\s\-\.()]+", "")
    return stripped.rlike(r"^[0-9]{7,15}$")


def date_valid(c: Column) -> Column:
    """data_format.py:183-205: any of the 9 formats parses. Timestamp/date
    typed columns are valid by type (:185-186) — callers pass strings here."""
    parsed = F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)) for fmt in DATE_FORMATS])
    return parsed.isNotNull()


def url_valid(c: Column) -> Column:
    """data_format.py:225-232."""
    return c.rlike(URL_RE)


def zipcode_valid(c: Column) -> Column:
    """data_format.py:234-258: US ZIP(+4) | Canadian | UK | generic 4-10
    alphanumerics."""
    s = c.cast("string")
    return (
        s.rlike(ZIP_US_RE) | s.rlike(ZIP_CA_RE) | s.rlike(ZIP_UK_RE) | s.rlike(ZIP_GENERIC_RE)
    )


def ip_valid(c: Column) -> Column:
    """data_format.py:260-274: IPv4 with per-octet 0-255 range check, or the
    simplified full-form IPv6. Octet range via try_cast on the split parts —
    no Python."""
    parts = F.split(c, r"\.")
    ipv4_shape = c.rlike(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")
    octet_ok = None
    for i in range(4):
        o = F.try_element_at(parts, F.lit(i + 1)).try_cast("int")
        ok = o.isNotNull() & (o >= 0) & (o <= 255)
        octet_ok = ok if octet_ok is None else (octet_ok & ok)
    return (ipv4_shape & octet_ok) | c.rlike(IPV6_RE)


def number_valid(c: Column) -> Column:
    """data_format.py:276-278 (is a number) → parseable as double."""
    return c.try_cast("double").isNotNull()


def integer_valid(c: Column) -> Column:
    """data_format.py:280-286 (int, or integer-valued float)."""
    d = c.try_cast("double")
    return d.isNotNull() & (d == F.floor(d))


def float_valid(c: Column) -> Column:
    """data_format.py:288-290 → parseable as double (Spark has no
    int-vs-float storage distinction for strings)."""
    return c.try_cast("double").isNotNull()


BOOL_STRINGS = ["true", "false", "yes", "no", "t", "f", "y", "n", "1", "0"]


def boolean_valid(c: Column) -> Column:
    """data_format.py:292-300: bool / 0-1 numeric / the 10 string forms."""
    s = F.lower(F.trim(c.cast("string")))
    d = c.try_cast("double")
    return s.isin(BOOL_STRINGS) | (d.isNotNull() & d.isin(0.0, 1.0))


FORMAT_VALIDATORS = {
    "email": email_valid,
    "phone": phone_valid,
    "date": date_valid,
    "url": url_valid,
    "zipcode": zipcode_valid,
    "ip": ip_valid,
    "number": number_valid,
    "integer": integer_valid,
    "float": float_valid,
    "boolean": boolean_valid,
}


# ---------------------------------------------------------------- check API

def format_issue_expr(col: str, fmt: str) -> Column:
    """True = violation (invalid AND non-null; nulls valid per the reference,
    data_format.py:52)."""
    c = F.col(col)
    return c.isNotNull() & ~FORMAT_VALIDATORS[fmt](c)


def format_issue_counts(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """The reference's check_data_format aggregate (data_format.py:43-59) in
    ONE fused pass: per-rule issue counts + the format score
    1 − total_issues / (rows × n_rules). Returns a single row."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, fmt in rules.items():
        aggs.append(F.sum(format_issue_expr(col, fmt).cast("long")).alias(f"issues_{col}"))
    out = df.agg(*aggs)
    issue_cols = [F.col(f"issues_{c}") for c in rules]
    total = sum(issue_cols[1:], issue_cols[0])
    n_rules = len(rules)
    return out.withColumn("total_issues", total.cast("long")).withColumn(
        "format_score",
        F.when(
            F.col("n_rows") > 0,
            1.0 - F.col("total_issues") / (F.col("n_rows") * F.lit(float(n_rules))),
        ).otherwise(F.lit(1.0)),
    )


def format_row_checks(rules: dict[str, str]) -> list[RowCheck]:
    """Prebuilt RowChecks (one per declared rule) for fusing the generic
    validators into the engine's single violations pass — the ready-made
    library the round-1 registry lacked."""
    return [
        RowCheck(
            name=f"format_{fmt}_{col}",
            condition=format_issue_expr(col, fmt),
            observed=F.col(col),
            expected=f"valid {fmt}",
        )
        for col, fmt in rules.items()
    ]


# ---------------------------------------------------------------- inference

NAME_HINTS = [  # data_format.py:86-100: column-NAME matching, first hit wins
    ("email", ["email"]),
    ("phone", ["phone", "tel"]),
    ("date", ["date", "time"]),
    ("url", ["url", "website", "link"]),
    ("zipcode", ["zip", "postal"]),
]


def infer_format_rules(
    df: DataFrame, sample_n: int = 10, vote: float = 0.5, seed: int = 42
) -> dict[str, str]:
    """The reference's two-stage inference (data_format.py:70-129): column
    NAME matching first, then content sampling (≤ sample_n non-null values,
    ≥ vote fraction must validate) for date/email/url — in that priority
    order, as the reference does. The sample is bounded and the vote runs in
    ONE collected pass per candidate column (driver-side on ≤ sample_n
    values), never on the full table."""
    rules: dict[str, str] = {}
    content_cols: list[str] = []
    for f in df.schema.fields:
        low = f.name.lower()
        named = None
        for fmt, hints in NAME_HINTS:
            if any(h in low for h in hints):
                if fmt == "ip":
                    continue
                named = fmt
                break
        if named is None and ("address" in low and "ip" in low or low == "ip"):
            named = "ip"
        if named:
            rules[f.name] = named
        elif f.dataType.simpleString() == "string":
            content_cols.append(f.name)

    if not content_cols:
        return rules

    # ONE bounded scan and ONE Spark job for every candidate column at once
    # (a 500-string-column table must not mean 500 sequential jobs): limit a
    # single row sample, then vote all (column, format) pairs through the
    # SAME Column validators inside one fused aggregate. Each column's vote
    # denominator is its own non-null count within the sample.
    sample = df.select(*content_cols).limit(sample_n * 20)
    aggs: list[Column] = []
    for col in content_cols:
        aggs.append(F.count(F.col(col)).alias(f"n::{col}"))
        aggs += [
            F.sum(FORMAT_VALIDATORS[fmt](F.col(col)).cast("int")).alias(f"{fmt}::{col}")
            for fmt in ("date", "email", "url")
        ]
    votes = sample.agg(*aggs).first()
    for col in content_cols:
        n = votes[f"n::{col}"]
        if not n:
            continue
        for fmt in ("date", "email", "url"):  # reference priority order (:110-127)
            v = votes[f"{fmt}::{col}"]
            if v is not None and v >= n * vote:
                rules[col] = fmt
                break
    return rules
