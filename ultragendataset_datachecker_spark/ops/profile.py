"""Generic table profiler — per-column stats over ANY DataFrame schema.

The reference's checks run over arbitrary pandas DataFrames
(/root/reference/dataset_checker/checker.py:120-233 iterate ``data.columns``
column by column — one pandas pass per column per check). The engine's
fused metrics pass is specialized to the token-sequence contract; this
operator is the generic counterpart: ONE Spark aggregation computes every
column's profile simultaneously (null count, exact distinct count, min/max,
and mean/std for numerics), then the single 1-row result is exploded into
one tidy row per column — the profile never costs more than one scan no
matter how wide the table is (vs the reference's pass-per-column).

Scale notes: exact ``count_distinct`` keeps the output oracle-replayable;
at 10^12 rows pass ``exact_distinct=False`` to use HLL++
(``approx_count_distinct``) — same single-pass shape, mergeable sketch.
min/max are emitted as strings so one schema covers every column type
(numeric formatting is normalized via DOUBLE for floats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
    round_dp: int = 6,
) -> DataFrame:
    """One-pass per-column profile.

    Returns one row per profiled column:
      (column, dtype, n_rows, n_null, n_distinct, mean, std, min_str, max_str)
    mean/std are NULL for non-numeric columns; complex-typed columns
    (arrays/maps/structs) profile null counts only (distinct/min/max NULL —
    there is no total order to take a min over, and hashing arrays for a
    distinct count is better served by the dedup operators).
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    per_col: dict[str, dict[str, str]] = {}
    for name in cols:
        dt = df.schema[name].dataType
        c = F.col(f"`{name}`")
        key = name.replace("`", "")
        per_col[key] = {"dtype": dt.simpleString()}
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"_null:{key}"))
        simple = not isinstance(dt, (T.ArrayType, T.MapType, T.StructType, T.BinaryType))
        if simple:
            distinct = (
                F.count_distinct(c) if exact_distinct else F.approx_count_distinct(c)
            )
            aggs.append(distinct.alias(f"_dist:{key}"))
            aggs.append(F.min(c).cast("string").alias(f"_min:{key}"))
            aggs.append(F.max(c).cast("string").alias(f"_max:{key}"))
        if isinstance(dt, _NUMERIC):
            d = c.cast("double")
            aggs.append(F.round(F.mean(d), round_dp).alias(f"_mean:{key}"))
            aggs.append(F.round(F.stddev_samp(d), round_dp).alias(f"_std:{key}"))

    row = df.agg(*aggs)

    def _get(prefix: str, key: str, cast: str):
        # the agg row's schema is known statically; absent stats are NULL
        col = f"{prefix}:{key}"
        if col in row.columns:
            return F.col(f"`{col}`").cast(cast)
        return F.lit(None).cast(cast)

    structs = [
        F.struct(
            F.lit(key).alias("column"),
            F.lit(meta["dtype"]).alias("dtype"),
            F.col("_n").alias("n_rows"),
            F.col(f"`_null:{key}`").alias("n_null"),
            _get("_dist", key, "long").alias("n_distinct"),
            _get("_mean", key, "double").alias("mean"),
            _get("_std", key, "double").alias("std"),
            _get("_min", key, "string").alias("min_str"),
            _get("_max", key, "string").alias("max_str"),
        )
        for key, meta in per_col.items()
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def correlation_matrix(
    df: DataFrame,
    columns: list[str],
    round_dp: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlation of numeric columns in ONE aggregation.

    The reference computes correlations with pandas ``df.corr()`` — a
    column-pair-at-a-time pass over an in-memory frame. Here every pair's
    ``corr`` aggregate runs inside a single Spark aggregate over one scan
    (partial aggregation map-side, O(k²) scalars shuffled — never rows), so
    a 100 TB table pays exactly one read no matter how many pairs.

    Returns one tidy row per unordered pair (col_x < col_y by list order):
      (col_x, col_y, corr, n) — ``n`` the count of rows where BOTH are
    non-null (what Pearson on that pair actually saw). Doubles rounded to
    ``round_dp`` so accumulation order can't flip a value hash.
    """
    aggs = []
    for i, a in enumerate(columns):
        for b in columns[i + 1:]:
            ca, cb = F.col(a).cast("double"), F.col(b).cast("double")
            aggs.append(F.round(F.corr(ca, cb), round_dp).alias(f"_corr:{a}:{b}"))
            aggs.append(
                F.count(F.when(ca.isNotNull() & cb.isNotNull(), 1)).alias(f"_n:{a}:{b}")
            )
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(a).alias("col_x"),
            F.lit(b).alias("col_y"),
            F.col(f"`_corr:{a}:{b}`").alias("corr"),
            F.col(f"`_n:{a}:{b}`").alias("n"),
        )
        for i, a in enumerate(columns)
        for b in columns[i + 1:]
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def mutual_information(
    df: DataFrame,
    col_x: str,
    col_y: str,
    round_dp: int = 6,
) -> DataFrame:
    """Mutual information between two categorical columns, cell by cell.

    One corpus pass: groupBy(x, y) with map-side partial aggregation — the
    shuffle is contingency-table sized (|X|·|Y| rows), never corpus sized.
    Marginals and the total re-aggregate the TINY counts frame (broadcast
    joins), so the fact table is read exactly once.

    Returns one row per observed (x, y) cell:
      (x, y, n_xy, n_x, n_y, n_tot, pmi, mi_contrib)
    where pmi = log2(n_xy·n_tot / (n_x·n_y)) and mi_contrib =
    (n_xy/n_tot)·pmi — sum(mi_contrib) is the table's mutual information.
    NULL category values participate as their own class (matching pandas
    ``value_counts(dropna=False)`` semantics would — here they are dropped,
    like the reference's dropna-first balance pass). Doubles rounded.
    """
    x, y = F.col(col_x), F.col(col_y)
    cells = (
        df.where(x.isNotNull() & y.isNotNull())
        .groupBy(x.alias("x"), y.alias("y"))
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    mx = cells.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
    my = cells.groupBy("y").agg(F.sum("n_xy").alias("n_y"))
    tot = cells.agg(F.sum("n_xy").alias("n_tot"))
    j = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
    )
    pmi = F.log2(
        F.col("n_xy").cast("double") * F.col("n_tot")
        / (F.col("n_x").cast("double") * F.col("n_y"))
    )
    return j.select(
        "x", "y", "n_xy", "n_x", "n_y", "n_tot",
        F.round(pmi, round_dp).alias("pmi"),
        F.round((F.col("n_xy") / F.col("n_tot")) * pmi, round_dp).alias("mi_contrib"),
    )


def functional_dependencies(
    df: DataFrame,
    columns: list[str],
    exact: bool = True,
) -> DataFrame:
    """Candidate functional-dependency discovery across column pairs.

    For every ordered pair (A, B): A → B holds exactly when
    ``count_distinct(A) == count_distinct(A, B)`` (each A value maps to one
    B value). All pairs are tested in ONE aggregation over one scan —
    O(k²) count-distinct sketches computed simultaneously, map-side partial
    aggregation, never a row-level shuffle per pair.

    ``exact=False`` swaps in ``approx_count_distinct`` (HLL++): at 10^12
    rows the exact distincts each keep a hash set per pair, while the
    sketches are fixed-size and mergeable — the verdicts become
    probabilistic (document downstream as "candidate FDs to verify").

    Returns (determinant, dependent, n_distinct_det, n_distinct_pair, holds).
    NULLs: count_distinct ignores NULL keys, and a composite with a NULL
    member still counts distinct combinations — pairs are filtered to rows
    where the determinant is non-null for a clean "maps to one value" read.
    """
    cnt = F.count_distinct if exact else F.approx_count_distinct
    aggs = []
    for a in columns:
        aggs.append(cnt(F.col(a)).alias(f"_d:{a}"))
        for b in columns:
            if b == a:
                continue
            pair = F.when(
                F.col(a).isNotNull(),
                F.struct(F.col(a), F.coalesce(F.col(b).cast("string"), F.lit("\x00NULL"))),
            )
            aggs.append(cnt(pair).alias(f"_p:{a}:{b}"))
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(a).alias("determinant"),
            F.lit(b).alias("dependent"),
            F.col(f"`_d:{a}`").alias("n_distinct_det"),
            F.col(f"`_p:{a}:{b}`").alias("n_distinct_pair"),
            (F.col(f"`_d:{a}`") == F.col(f"`_p:{a}:{b}`")).alias("holds"),
        )
        for a in columns
        for b in columns
        if b != a
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
