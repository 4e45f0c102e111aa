"""Fix / repair surface — the reference's second half, Spark-first.

Reference implementations mirrored (cited per function):
- imputation: /root/reference/dataset_checker/checks/missing_values.py:62-133
  (drop / mean / median / mode / constant / skew-aware auto)
- outlier handling: /root/reference/dataset_checker/checks/outliers.py:140-180
  (remove / cap at Q1-1.5·IQR..Q3+1.5·IQR recomputed at fix time / mean /
  median replacement)
- format fixes: /root/reference/dataset_checker/checks/data_format.py:330-386
  (null-on-fail for email/url/ip, coercion for date/number/integer/boolean,
  phone normalization)
- text fixes: /root/reference/auto_fixer.py:52-69 (whitespace normalize,
  truncate to max, drop below min)
- the check → fix → re-check lifecycle: /root/reference/main.py:103-133,
  exposed via the job CLI's --fix flag.

Shapes: every fix is a declarative Column transformation or filter — one scan
per fix application, stats gathered in ONE aggregate pass and folded in as
literals (no windows over the full table, no Python). DataFrames are
immutable, so "fix" returns a new frame + a plan dict (what the reference's
in-place mutation and fix-results dict become).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

from ultragendataset_datachecker_spark.checks.formats import (
    BOOL_STRINGS, DATE_FORMATS, FORMAT_VALIDATORS,
)
from ultragendataset_datachecker_spark.config import EngineConfig


def _numeric_cols(df: DataFrame, columns: list[str] | None) -> list[str]:
    cols = columns or df.columns
    return [
        f.name for f in df.schema.fields
        if f.name in cols and isinstance(f.dataType, NumericType)
    ]


# ---------------------------------------------------------------- imputation

def impute_missing(
    df: DataFrame,
    strategy: str = "auto",
    columns: list[str] | None = None,
    fill_values: dict | None = None,
    skew_threshold: float = 1.0,
) -> tuple[DataFrame, dict]:
    """fix_missing (missing_values.py:62-133). Strategies:
    drop / mean / median / mode / constant / auto (numeric: median if
    |skew| > 1 else mean; non-numeric: mode). Numeric stats come from ONE
    aggregate pass; mode is a per-column top-1 with the pandas tiebreak
    (most frequent, then smallest value — mode()[0] on a sorted index).
    Returns (fixed_df, plan) where plan maps column → fill description."""
    valid = {"auto", "mean", "median", "mode", "constant", "drop"}
    if strategy not in valid:
        raise ValueError(f"Invalid strategy: {strategy}. Valid options are: {sorted(valid)}")
    if strategy == "drop":
        return df.na.drop(subset=columns), {"strategy": "drop"}

    cols = columns or df.columns
    fill_values = dict(fill_values or {})
    plan: dict = {"strategy": strategy, "fills": {}}
    nums = _numeric_cols(df, cols)

    fills: dict = {}
    if strategy == "constant":
        fills = {c: v for c, v in fill_values.items() if c in cols}
        plan["fills"] = {c: ("constant", v) for c, v in fills.items()}
        return df.na.fill(fills), plan

    # one fused stats pass for every numeric column involved
    stat_cols: dict[str, dict] = {}
    if nums and strategy in ("auto", "mean", "median"):
        aggs = []
        for c in nums:
            aggs += [
                F.mean(c).alias(f"{c}__mean"),
                F.percentile(F.col(c), F.lit(0.5)).alias(f"{c}__median"),
                F.skewness(c).alias(f"{c}__skew"),
            ]
        row = df.agg(*aggs).first()
        for c in nums:
            stat_cols[c] = {
                "mean": row[f"{c}__mean"],
                "median": row[f"{c}__median"],
                "skew": row[f"{c}__skew"],
            }

    def _mode(c: str):
        # pandas mode()[0]: most frequent, smallest value on ties
        r = (
            df.where(F.col(c).isNotNull())
            .groupBy(c).count()
            .orderBy(F.desc("count"), F.asc(c))
            .first()
        )
        return None if r is None else r[c]

    for c in cols:
        if c in fill_values:
            fills[c] = fill_values[c]
            plan["fills"][c] = ("constant", fill_values[c])
        elif strategy == "auto":
            if c in stat_cols:
                s = stat_cols[c]
                skewed = s["skew"] is not None and abs(s["skew"]) > skew_threshold
                v = s["median"] if skewed else s["mean"]
                if v is not None:
                    fills[c] = v
                    plan["fills"][c] = ("median" if skewed else "mean", v)
            else:
                v = _mode(c)
                if v is not None:
                    fills[c] = v
                    plan["fills"][c] = ("mode", v)
        elif strategy == "mean" and c in stat_cols:
            if stat_cols[c]["mean"] is not None:
                fills[c] = stat_cols[c]["mean"]
                plan["fills"][c] = ("mean", fills[c])
        elif strategy == "median" and c in stat_cols:
            if stat_cols[c]["median"] is not None:
                fills[c] = stat_cols[c]["median"]
                plan["fills"][c] = ("median", fills[c])
        elif strategy == "mode":
            v = _mode(c)
            if v is not None:
                fills[c] = v
                plan["fills"][c] = ("mode", v)
    return df.na.fill(fills) if fills else df, plan


# ---------------------------------------------------------------- outliers

def fix_outliers(
    df: DataFrame,
    columns: list[str] | None = None,
    strategy: str = "cap",
    detect: str = "iqr",
    zscore_threshold: float = 3.0,
    iqr_threshold: float = 1.5,
) -> tuple[DataFrame, dict]:
    """fix_outliers (outliers.py:140-180). Strategies: remove / cap / mean /
    median. Detection: iqr (Q1/Q3 ± t·IQR) or zscore (|z| > t, ddof=0).
    Reference quirk preserved: the CAP bounds are always Q1/Q3 ± 1.5·IQR
    recomputed at fix time, regardless of the detection threshold
    (outliers.py:173-177). One stats pass, then one declarative scan."""
    valid = {"remove", "cap", "mean", "median"}
    if strategy not in valid:
        raise ValueError(f"Invalid strategy: {strategy}. Valid options are: {sorted(valid)}")
    nums = _numeric_cols(df, columns)
    if not nums:
        return df, {"strategy": strategy, "columns": {}}

    aggs = []
    for c in nums:
        aggs += [
            F.mean(c).alias(f"{c}__mean"),
            F.stddev_pop(c).alias(f"{c}__std"),
            F.percentile(F.col(c), F.lit([0.25, 0.5, 0.75])).alias(f"{c}__q"),
        ]
    row = df.agg(*aggs).first()

    plan: dict = {"strategy": strategy, "detect": detect, "columns": {}}
    out = df
    remove_cond = None
    for c in nums:
        mu, sd = row[f"{c}__mean"], row[f"{c}__std"]
        q1, med, q3 = row[f"{c}__q"]
        if q1 is None or mu is None:
            continue
        iqr = q3 - q1
        if detect == "zscore":
            if not sd:
                continue
            is_out = F.col(c).isNotNull() & (F.abs((F.col(c) - F.lit(mu)) / F.lit(sd)) > zscore_threshold)
        else:
            lo_d, hi_d = q1 - iqr_threshold * iqr, q3 + iqr_threshold * iqr
            is_out = F.col(c).isNotNull() & ((F.col(c) < F.lit(lo_d)) | (F.col(c) > F.lit(hi_d)))
        # fix-time cap bounds: ALWAYS 1.5 (reference outliers.py:173-177)
        lo_c, hi_c = q1 - 1.5 * iqr, q3 + 1.5 * iqr
        plan["columns"][c] = {"cap_bounds": [lo_c, hi_c]}
        if strategy == "remove":
            remove_cond = is_out if remove_cond is None else (remove_cond | is_out)
        elif strategy == "cap":
            clipped = F.least(F.greatest(F.col(c), F.lit(lo_c)), F.lit(hi_c))
            out = out.withColumn(c, F.when(is_out, clipped).otherwise(F.col(c)))
        elif strategy == "mean":
            out = out.withColumn(c, F.when(is_out, F.lit(mu)).otherwise(F.col(c)))
        elif strategy == "median":
            out = out.withColumn(c, F.when(is_out, F.lit(med)).otherwise(F.col(c)))
    if strategy == "remove" and remove_cond is not None:
        out = out.where(~F.coalesce(remove_cond, F.lit(False)))
    return out, plan


# ---------------------------------------------------------------- formats

def fix_format(
    df: DataFrame, rules: dict[str, str], strategy: str = "auto"
) -> tuple[DataFrame, dict]:
    """fix_format_issues (data_format.py:330-386). strategy='remove' (or
    'auto' for email/url/ip): invalid → null. strategy='convert' (or 'auto'
    for the rest): date → coalesce of the 9 formats (null on fail), number /
    float → try_cast double, integer → try_cast long via integral double,
    boolean → the reference bool_map (null otherwise), phone → strip
    separators then null-on-invalid."""
    plan: dict = {"strategy": strategy, "columns": {}}
    out = df
    for col, fmt in rules.items():
        if fmt not in FORMAT_VALIDATORS:
            continue
        c = F.col(col)
        invalid = c.isNotNull() & ~FORMAT_VALIDATORS[fmt](c)
        if strategy == "remove" or (strategy == "auto" and fmt in ("email", "url", "ip")):
            out = out.withColumn(col, F.when(invalid, F.lit(None)).otherwise(c))
            plan["columns"][col] = "nulled_invalid"
        elif strategy in ("convert", "auto"):
            if fmt == "date":
                conv = F.coalesce(*[F.try_to_timestamp(c, F.lit(f)) for f in DATE_FORMATS])
                out = out.withColumn(col, conv)
            elif fmt in ("number", "float"):
                out = out.withColumn(col, c.try_cast("double"))
            elif fmt == "integer":
                d = c.try_cast("double")
                conv = F.when(d == F.floor(d), d.cast("long")).otherwise(F.lit(None))
                out = out.withColumn(col, conv)
            elif fmt == "boolean":
                s = F.lower(F.trim(c.cast("string")))
                truthy = ["true", "yes", "t", "y", "1"]
                falsy = ["false", "no", "f", "n", "0"]
                conv = (
                    F.when(s.isin(truthy), F.lit(True))
                    .when(s.isin(falsy), F.lit(False))
                    .otherwise(F.lit(None))
                )
                out = out.withColumn(col, conv)
            elif fmt == "phone":
                stripped = F.regexp_replace(c.cast("string"), r"[\s\-\.()]+", "")
                conv = F.when(stripped.rlike(r"^[0-9]{7,15}$"), stripped).otherwise(F.lit(None))
                out = out.withColumn(col, conv)
            else:  # zipcode and friends: no canonical conversion → null invalid
                out = out.withColumn(col, F.when(invalid, F.lit(None)).otherwise(c))
            plan["columns"][col] = f"converted_{fmt}"
    return out, plan


# ---------------------------------------------------------------- text

def fix_text(
    df: DataFrame, col: str, min_length: int = 1, max_length: int | None = None
) -> tuple[DataFrame, dict]:
    """auto_fixer.fix_text (auto_fixer.py:52-69): whitespace-normalize,
    truncate to max_length, DROP rows whose normalized text is shorter than
    min_length (the reference returns None → sample skipped)."""
    c = F.col(col)
    norm = F.regexp_replace(F.trim(c), r"\s+", " ")
    if max_length is not None:
        norm = F.substring(norm, 1, max_length)
    out = df.withColumn(col, F.when(c.isNotNull(), norm).otherwise(c))
    out = out.where(F.col(col).isNull() | (F.length(F.col(col)) >= min_length))
    return out, {"column": col, "min_length": min_length, "max_length": max_length}


# ---------------------------------------------------------------- sequences

def fix_sequences(df: DataFrame, cfg: EngineConfig | None = None) -> tuple[DataFrame, dict]:
    """The token-table auto-fix: repairs exactly what the engine's checks
    flag, in the order drop-invalid → repair → dedup (the distributed form of
    the reference's per-sample fix-or-skip loop, auto_fixer.py:82-125):

    - recompute n_tok := size(tokens) (repairs ntok_mismatch)
    - drop rows with null/empty tokens, out-of-range token ids, null/bad
      doc_id, or a source outside the allowed set (unfixable rows are
      skipped, as the reference does)
    - deterministic keep-first dedup on doc_id and on the token content
      hash (same total order as the engine's duplicate checks)

    A re-run of ValidationEngine on the result passes every row-level check
    by construction (outlier/drift/balance scores remain data-dependent)."""
    cfg = cfg or EngineConfig()
    tokens = F.col("tokens")
    plan = {"steps": ["recompute_n_tok", "drop_invalid", "dedup_doc_id", "dedup_tokens"]}

    valid = (
        F.col("doc_id").isNotNull()
        & F.col("doc_id").rlike(r"^doc_\d{10}$")
        & tokens.isNotNull()
        & (F.size(tokens) > 0)
        & (F.array_min(tokens) >= 0)
        & (F.array_max(tokens) < cfg.vocab_size)
        & F.col("source").isNotNull()
        & F.col("source").isin(list(cfg.allowed_sources))
    )
    fixed = df.where(valid).withColumn("n_tok", F.size(tokens).cast("int"))

    h1 = F.xxhash64(tokens)
    w_id = Window.partitionBy("doc_id").orderBy(
        F.col(cfg.partition_col), F.col("n_tok"), h1.asc_nulls_last()
    )
    fixed = fixed.withColumn("_rn", F.row_number().over(w_id)).where(F.col("_rn") == 1).drop("_rn")
    w_tok = Window.partitionBy(h1).orderBy("doc_id", cfg.partition_col)
    fixed = fixed.withColumn("_rn", F.row_number().over(w_tok)).where(F.col("_rn") == 1).drop("_rn")
    return fixed, plan
