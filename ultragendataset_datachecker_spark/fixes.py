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
from pyspark.sql import types as T
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


# ------------------------------------------------------- distribution (F13/F14)

# profile-likelihood grid for the power-transform lambda (scipy optimizes the
# same LL with Brent; a fixed grid keeps the whole estimation inside ONE
# distributed aggregate pass). Range matches scipy.stats.boxcox_normmax's
# default bracket.
TRANSFORM_LAMBDA_GRID = [round(-2.0 + i * 0.1, 2) for i in range(41)]


def _boxcox_col(c, lam: float):
    """(x^λ - 1)/λ, λ→0: ln x. Box & Cox 1964 eq. (1)."""
    if abs(lam) < 1e-12:
        return F.log(c)
    return (F.pow(c, F.lit(lam)) - 1.0) / F.lit(lam)


def _yeojohnson_col(c, lam: float):
    """Yeo & Johnson 2000 eq. (2.1), piecewise on sign(x)."""
    if abs(lam) < 1e-12:
        pos = F.log1p(c)
    else:
        pos = (F.pow(c + 1.0, F.lit(lam)) - 1.0) / F.lit(lam)
    if abs(lam - 2.0) < 1e-12:
        neg = -F.log1p(-c)
    else:
        neg = -(F.pow(1.0 - c, F.lit(2.0 - lam)) - 1.0) / F.lit(2.0 - lam)
    return F.when(c >= 0, pos).otherwise(neg)


def transform_distribution(
    df: DataFrame,
    columns: list[str] | None = None,
    method: str = "auto",
    skew_threshold: float = 1.0,
    lambda_grid: list[float] | None = None,
) -> tuple[DataFrame, dict]:
    """fix_distribution (data_distribution.py:167-253): log (log1p), sqrt,
    boxcox, yeojohnson, or 'auto' (reference rules: skew > 1 → log if all
    positive else YJ; skew < -1 → YJ; else boxcox if all positive else YJ).
    Columns where the chosen transform is undefined (non-positive for
    log/boxcox, negative for sqrt) are skipped, as the reference does.

    The power-transform λ is the profile-likelihood MLE, estimated by GRID
    SEARCH folded into aggregate passes: for each candidate λ the LL needs
    only n, Σy, Σy² of the transformed values plus a fixed Jacobian term
    (Σln x for Box-Cox, Σ sign(x)·ln(|x|+1) for Yeo-Johnson) — all plain JVM
    Column aggregates. scipy runs a per-column Brent optimization over the
    same LL, which would mean a driver-side iteration with one job per step;
    the grid gets λ within 0.05 in exactly two scans (one for skew/min
    selection, one for all λ candidates of all columns fused), zero per-row
    Python — the shape that survives 10^12 rows."""
    valid = {"auto", "log", "sqrt", "boxcox", "yeojohnson"}
    if method not in valid:
        raise ValueError(f"Invalid method: {method}. Valid options are: {sorted(valid)}")
    grid = lambda_grid or TRANSFORM_LAMBDA_GRID
    nums = _numeric_cols(df, columns)
    plan: dict = {"method": method, "columns": {}}
    if not nums:
        return df, plan

    # pass 1: per-column skew (method selection) + min (domain checks)
    aggs = []
    for c in nums:
        aggs += [F.skewness(c).alias(f"{c}__skew"), F.min(c).alias(f"{c}__min")]
    row = df.agg(*aggs).first()

    chosen: dict[str, str] = {}
    for c in nums:
        mn, skew = row[f"{c}__min"], row[f"{c}__skew"]
        if mn is None:
            continue  # all-null column: nothing to transform
        non_positive = mn <= 0
        if method == "auto":
            # data_distribution.py:203-218
            if skew is not None and skew > skew_threshold:
                m = "log" if not non_positive else "yeojohnson"
            elif skew is not None and skew < -skew_threshold:
                m = "yeojohnson"
            else:
                m = "boxcox" if not non_positive else "yeojohnson"
        else:
            m = method
        if m in ("log", "boxcox") and non_positive:
            continue  # reference: can't apply → skip column
        if m == "sqrt" and mn < 0:
            continue
        chosen[c] = m

    # pass 2 (only if any power transform): fused profile-LL grid.
    # LL(λ) = -n/2·ln(Var_pop(y_λ)) + (λ-1)·J  with J the Jacobian sum.
    lam_star: dict[str, float] = {}
    power_cols = [c for c, m in chosen.items() if m in ("boxcox", "yeojohnson")]
    if power_cols:
        aggs = []
        for c in power_cols:
            x = F.col(c).cast("double")
            if chosen[c] == "boxcox":
                jac = F.sum(F.log(x))
            else:
                jac = F.sum(F.signum(x) * F.log1p(F.abs(x)))
            aggs += [F.count(x).alias(f"{c}__n"), jac.alias(f"{c}__jac")]
            for i, lam in enumerate(grid):
                y = (
                    _boxcox_col(x, lam)
                    if chosen[c] == "boxcox"
                    else _yeojohnson_col(x, lam)
                )
                aggs += [
                    F.sum(y).alias(f"{c}__s{i}"),
                    F.sum(y * y).alias(f"{c}__ss{i}"),
                ]
        r2 = df.agg(*aggs).first()
        import math

        for c in power_cols:
            n, jac = r2[f"{c}__n"], r2[f"{c}__jac"]
            if not n or n < 2 or jac is None:
                chosen.pop(c, None)  # reference: transform failed → skip
                continue
            best, best_ll = None, None
            for i, lam in enumerate(grid):
                s, ss = r2[f"{c}__s{i}"], r2[f"{c}__ss{i}"]
                if s is None or ss is None or not math.isfinite(ss):
                    continue
                var = ss / n - (s / n) ** 2
                if var <= 0 or not math.isfinite(var):
                    continue
                ll = -n / 2.0 * math.log(var) + (lam - 1.0) * jac
                if best_ll is None or ll > best_ll:
                    best, best_ll = lam, ll
            if best is None:
                chosen.pop(c, None)
                continue
            lam_star[c] = best

    out = df
    for c, m in chosen.items():
        x = F.col(c).cast("double")
        if m == "log":
            t = F.log1p(x)  # reference uses np.log1p
        elif m == "sqrt":
            t = F.sqrt(x)
        elif m == "boxcox":
            t = _boxcox_col(x, lam_star[c])
        else:
            t = _yeojohnson_col(x, lam_star[c])
        out = out.withColumn(c, F.when(x.isNotNull(), t).otherwise(F.lit(None)))
        plan["columns"][c] = {"method": m, **({"lambda": lam_star[c]} if c in lam_star else {})}
    return out, plan


# ---------------------------------------------------------------- balance

def _per_class_exact_rank(df: DataFrame, target_column: str, rank_cols) -> DataFrame:
    """Exact 1-based per-class rank (`_rn`) without partitioning a window by
    class (which funnels each class through ONE task — fatal for a giant
    label at corpus scale). Same construction as ops/lm.lm_quality_buckets'
    distributed ntile, generalized per class:

      1. repartitionByRange by (class, rank order): globally sorted across
         partitions, a big class spans many range partitions;
      2. row_number within each range partition (each task sorts its slice);
      3. per-(partition, class) counts -> the class's cumulative count in
         earlier partitions (O(partitions · classes) rows on the driver),
         broadcast-joined back: _rn = offset + local rank.

    Rank ties must be fully identical rows (callers order by all columns or
    a unique key), so the rank multiset is invariant to where the range
    partitioner places its boundaries. Returns (ranked, cached): the
    shuffled frame stays persisted across its two consumptions (counts +
    output); the caller registers `cached` on its final result so
    ops.dedup.unpersist_intermediates can release it after materializing."""
    from pyspark.storagelevel import StorageLevel

    for reserved in ("_pid", "_off", "_rn"):
        if reserved in df.columns:
            raise ValueError(f"fix_balance: input already has a {reserved!r} column")
    spark = df.sparkSession
    order = [F.col(target_column).asc()] + list(rank_cols)
    d = (
        df.repartitionByRange(*order)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Per-(partition, class) counts, in the global sort order — Spark's own
    # orderBy supplies the class ordering (no Python re-implementation of
    # Spark comparison semantics). Within a partition the local row_number
    # runs across classes, so the joined offset is
    #   (class rows in earlier partitions) - (rows of earlier classes in
    #    this partition)
    # making _off + _lrn the exact 1-based per-class rank.
    rows = (
        d.groupBy("_pid", target_column).agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("_pid").asc(), F.col(target_column).asc())
        .collect()
    )
    offsets, seen = [], {}
    before_in_pid, cur_pid = 0, None
    for r in rows:
        cls = r[target_column]
        if r["_pid"] != cur_pid:
            cur_pid, before_in_pid = r["_pid"], 0
        offsets.append((r["_pid"], cls, seen.get(cls, 0) - before_in_pid))
        seen[cls] = seen.get(cls, 0) + r["n"]
        before_in_pid += r["n"]
    cls_type = df.schema[target_column].dataType
    off_df = spark.createDataFrame(
        offsets or [(0, None, 0)],
        T.StructType([
            T.StructField("_pid", T.IntegerType()),
            T.StructField(target_column, cls_type),
            T.StructField("_off", T.LongType()),
        ]),
    )
    w = Window.partitionBy("_pid").orderBy(*order)
    ranked = (
        d.withColumn("_lrn", F.row_number().over(w))
        .join(F.broadcast(off_df), on=["_pid", target_column], how="left")
        .withColumn("_rn", F.col("_off") + F.col("_lrn"))
        .drop("_pid", "_off", "_lrn")
    )
    return ranked, d


def fix_balance(
    df: DataFrame,
    target_column: str,
    method: str = "undersample",
    sampling_strategy: str | dict = "auto",
    order_columns: list[str] | None = None,
    exact: bool = True,
    hash_order: bool = True,
    exact_window_threshold: int = 5_000_000,
) -> tuple[DataFrame, dict]:
    """fix_balance (data_balance.py:60-205): per-class under/oversampling to
    the minority/majority count (or an explicit per-class dict). 'smote'
    synthesizes minority samples by within-class neighbor interpolation
    (see smote_oversample) when the frame has numeric feature columns, and
    falls back to plain oversampling otherwise — the same fallback the
    reference takes when imblearn is absent (data_balance.py:135-155).

    Spark-first determinism instead of the reference's sample(random_state):
    rows are ranked inside each class by xxhash64 of the order columns, so
    the selected/replicated row set is identical at any parallelism.

    - exact=True (default): exact per-class ranks and counts. The class
      counts are already on the driver, so the rank strategy is adaptive:
      when every class fits one sort task (max class count <=
      exact_window_threshold) the classic per-class window runs — one
      shuffle, no extra jobs; when a class is bigger, ranks switch to the
      DISTRIBUTED construction (_per_class_exact_rank: range-repartition
      by (class, rank order) so a giant class spans many sort tasks,
      row_number within each range partition, a broadcast-joined offset
      from per-(partition, class) counts). Identical selections either
      way (test-pinned), so exact mode holds at 10^12 rows with a handful
      of labels without paying the distributed overhead at dim scale.
    hash_order=False ranks purely by order_columns (pass a unique key) —
    useful when the selection must be replayable by an external system (the
    DuckDB oracle does exactly this); the default hashes first so selection
    is unbiased w.r.t. key order.

    - exact=False: the 10^12-row path — a pure FILTER keeping rows whose
      hash falls under count·(n_target/n_class) of the 2^63 hash space
      (undersample), or sequence-explode + hash-threshold remainder
      (oversample). No shuffle at all, deterministic, class counts within
      sampling noise of the target."""
    valid = {"undersample", "oversample", "smote"}
    if method not in valid:
        raise ValueError(f"Invalid method: {method}. Valid options are: {sorted(valid)}")
    plan: dict = {"method": method, "classes": {}}
    if method == "smote":
        feats = [c for c in _numeric_cols(df, None) if c != target_column]
        if feats:
            return smote_oversample(
                df, target_column, feature_columns=feats,
                sampling_strategy=sampling_strategy,
            )
        plan["note"] = "smote->oversample fallback (no numeric features; reference falls back the same way without imblearn, data_balance.py:150-155)"
        method = "oversample"

    counts = {
        r[target_column]: r["n"]
        for r in df.where(F.col(target_column).isNotNull())
        .groupBy(target_column).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if len(counts) <= 1:
        return df, plan  # reference: cannot balance a single class
    if sampling_strategy == "auto":
        bound = min(counts.values()) if method == "undersample" else max(counts.values())
        targets = {
            cls: (min(n, bound) if method == "undersample" else max(n, bound))
            for cls, n in counts.items()
        }
    elif isinstance(sampling_strategy, dict):
        # reference parity (data_balance.py:163-210): oversample never removes
        # rows (target below the class count keeps the class whole) and
        # undersample never replicates — clamp dict targets accordingly
        clamp = min if method == "undersample" else max
        targets = {cls: clamp(sampling_strategy.get(cls, n), n) for cls, n in counts.items()}
    else:
        raise ValueError(
            "sampling_strategy must be 'auto' or a per-class dict "
            f"(got {sampling_strategy!r})"
        )
    plan["classes"] = {
        str(cls): {"before": counts[cls], "target": targets[cls]} for cls in counts
    }

    tgt = F.col(target_column)
    order_cols = order_columns or [c for c in df.columns if c != target_column]
    h = F.xxhash64(*[F.col(c) for c in order_cols])
    rank_cols = ([h.asc()] if hash_order else []) + [F.col(c).asc() for c in order_cols]
    # per-class target count as a tiny literal map (O(classes), broadcast)
    n_target = None
    n_class = None
    for cls, t in targets.items():
        cond = tgt == F.lit(cls)
        n_target = F.when(cond, F.lit(t)) if n_target is None else n_target.when(cond, F.lit(t))
        n_class = (
            F.when(cond, F.lit(counts[cls]))
            if n_class is None
            else n_class.when(cond, F.lit(counts[cls]))
        )
    n_target = n_target.otherwise(F.lit(None))
    n_class = n_class.otherwise(F.lit(None))

    # reference parity: rows with a null class label are dropped (class_counts
    # is built over dropna() and only class rows are concatenated back,
    # data_balance.py:108,156-210).
    big_class = max(counts.values()) > exact_window_threshold

    if method == "undersample":
        if exact and big_class:
            from ultragendataset_datachecker_spark.ops.dedup import _register_intermediate

            ranked, cached = _per_class_exact_rank(
                df.where(tgt.isNotNull()), target_column, rank_cols)
            kept = _register_intermediate(
                ranked.where(F.col("_rn") <= n_target).drop("_rn"), cached)
        elif exact:
            w = Window.partitionBy(target_column).orderBy(*rank_cols)
            kept = (
                df.where(tgt.isNotNull())
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= n_target)
                .drop("_rn")
            )
        else:
            # shuffle-free: keep iff hash < 2^63 · target/class_count
            # pmod into [0, 2^31) — abs() would overflow on Long.MIN under
            # ANSI; frac == 1.0 then keeps every row exactly
            frac = n_target.cast("double") / n_class.cast("double")
            kept = df.where(tgt.isNotNull()).where(
                F.pmod(h, F.lit(2**31)).cast("double") < frac * F.lit(float(2**31))
            )
        return kept, plan

    # oversample: full copies + deterministic remainder pick
    base = df.where(tgt.isNotNull())
    copies = F.floor(n_target / n_class).cast("int")
    rem = (n_target % n_class).cast("long")
    cached = None
    if exact and big_class:
        base, cached = _per_class_exact_rank(base, target_column, rank_cols)
        reps = (copies + F.when(F.col("_rn") <= rem, 1).otherwise(0)).cast("int")
    elif exact:
        w = Window.partitionBy(target_column).orderBy(*rank_cols)
        base = base.withColumn("_rn", F.row_number().over(w))
        reps = (copies + F.when(F.col("_rn") <= rem, 1).otherwise(0)).cast("int")
    else:
        frac = rem.cast("double") / n_class.cast("double")
        extra = F.when(
            F.pmod(h, F.lit(2**31)).cast("double") < frac * F.lit(float(2**31)), 1
        ).otherwise(0)
        reps = (copies + extra).cast("int")
    # sequence(1, 0) would step BACKWARDS ([1, 0]); explode of an empty array
    # emits no rows, which is the correct "keep 0 copies" for dict targets
    # below the class count.
    rep_seq = F.when(reps >= 1, F.sequence(F.lit(1), reps)).otherwise(
        F.array().cast("array<int>")
    )
    out = base.withColumn("_rep", F.explode(rep_seq)).drop("_rep", "_rn")
    if cached is not None:
        from ultragendataset_datachecker_spark.ops.dedup import _register_intermediate

        out = _register_intermediate(out, cached)
    return out, plan


def smote_oversample(
    df: DataFrame,
    target_column: str,
    feature_columns: list[str],
    sampling_strategy: str | dict = "auto",
    seed: int = 42,
    tiebreak_columns: list[str] | None = None,
) -> tuple[DataFrame, dict]:
    """SMOTE-style synthetic oversampling, distributed (reference:
    data_balance.py:135-155 delegates to imblearn.SMOTE — exact kNN on a
    single node, infeasible at 10^12 rows). The scalable analogue here:

    1. project the feature vector onto a deterministic random direction
       (seeded weights, one JVM expression) — rows adjacent in projection
       order are near in feature space along that direction;
    2. rank each class by the projection (window) and pair every row with
       its successor (wrap-around join on rn within the class);
    3. emit the class's n_extra synthetic rows as convex combinations
       x + u·(x_next − x) with u ∈ (0,1) derived from a per-sample hash —
       deterministic at any parallelism, no per-row Python.

    Non-feature columns are copied from the anchor row. Rows with any null
    feature stay in the output but are excluded from anchor/neighbor roles
    (imblearn rejects NaN outright). Synthetic rows interpolate every
    feature column; the result is originals ∪ synthetics with class counts
    at the majority count (or dict targets, clamped like oversample)."""
    counts = {
        r[target_column]: r["n"]
        for r in df.where(F.col(target_column).isNotNull())
        .groupBy(target_column).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    plan: dict = {"method": "smote", "classes": {}}
    if len(counts) <= 1:
        return df, plan
    if sampling_strategy == "auto":
        mx = max(counts.values())
        targets = {cls: mx for cls in counts}
    elif isinstance(sampling_strategy, dict):
        targets = {cls: max(sampling_strategy.get(cls, n), n) for cls, n in counts.items()}
    else:
        raise ValueError(
            f"sampling_strategy must be 'auto' or a per-class dict (got {sampling_strategy!r})"
        )
    plan["classes"] = {
        str(cls): {"before": counts[cls], "target": targets[cls]} for cls in counts
    }

    import numpy as np

    w = np.random.RandomState(seed).standard_normal(len(feature_columns))
    proj = None
    for wi, c in zip(w, feature_columns):
        term = F.col(c).cast("double") * float(wi)
        proj = term if proj is None else proj + term

    tgt = F.col(target_column)
    feat_ok = None
    for c in feature_columns:
        nn = F.col(c).isNotNull()
        feat_ok = nn if feat_ok is None else (feat_ok & nn)
    pool = df.where(tgt.isNotNull() & feat_ok)

    # rank tiebreak: row hash by default; explicit columns when the caller
    # needs the ordering replayable by an external engine (the DuckDB oracle)
    if tiebreak_columns:
        ties = [F.col(c).asc() for c in tiebreak_columns]
    else:
        ties = [F.xxhash64(*[F.col(c) for c in df.columns]).asc()]
    wdw = Window.partitionBy(target_column).orderBy(proj.asc(), *ties)
    ranked = pool.withColumn("_rn", F.row_number().over(wdw))
    # per-class pool size (anchor-eligible rows) for wrap-around + quotas
    psize = ranked.groupBy(target_column).agg(F.max("_rn").alias("_pn"))
    ranked = ranked.join(F.broadcast(psize), on=target_column)

    # n_extra per class as a literal map (O(classes))
    n_extra = None
    for cls, t in targets.items():
        cond = tgt == F.lit(cls)
        e = t - counts[cls]
        n_extra = F.when(cond, F.lit(e)) if n_extra is None else n_extra.when(cond, F.lit(e))
    n_extra = n_extra.otherwise(F.lit(0))

    nbr = ranked.select(
        F.col(target_column).alias("_t"),
        F.col("_rn").alias("_nrn"),
        *[F.col(c).alias(f"_nb_{c}") for c in feature_columns],
    )
    anchors = ranked.withColumn("_next", F.pmod(F.col("_rn"), F.col("_pn")) + 1)
    paired = anchors.join(
        nbr,
        (anchors[target_column] == nbr["_t"]) & (anchors["_next"] == nbr["_nrn"]),
    ).drop("_t", "_nrn", "_next")

    # quota: row rn emits floor(extra/pool) synthetics (+1 for rn <= remainder)
    k = (F.floor(n_extra / F.col("_pn")) + F.when(
        F.col("_rn") <= n_extra % F.col("_pn"), 1).otherwise(0)).cast("int")
    synth = paired.withColumn(
        "_j", F.explode(F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
            F.array().cast("array<int>")))
    )
    u = (F.pmod(F.xxhash64(F.col("_rn"), tgt, F.col("_j"), F.lit(seed)),
                F.lit(1_000_000)).cast("double") + 0.5) / 1_000_000.0
    for c in feature_columns:
        x = F.col(c).cast("double")
        synth = synth.withColumn(c, (x + u * (F.col(f"_nb_{c}") - x)).cast(df.schema[c].dataType))
    synth = synth.select(*df.columns)
    return df.unionByName(synth), plan


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
        & F.col("doc_id").rlike(cfg.doc_id_pattern)
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
