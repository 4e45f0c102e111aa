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
