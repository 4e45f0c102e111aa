"""As-of (point-in-time) join — the time-series join Spark's API lacks.

"For each left row, attach the most recent right row at or before its
timestamp, per key" — joining events to slowly-changing dimensions
(config versions, rate tables), or telemetry to its last preceding
marker event ("time since last login"). The reference checker has no
temporal joins at all; databases ship it natively (DuckDB `ASOF JOIN`,
which is exactly what the driver oracle uses to validate this
implementation's semantics).

The naive formulation — non-equi join on ``l.ts >= r.ts`` + keep the max
— is a range join that degenerates to a per-key cartesian. The
Spark-native shape used here does ZERO joins:

    union(left-tagged, right-tagged)
      -> window per key, ordered by (ts, side)
      -> last_value(right-payload-struct, ignoreNulls) carries the most
         recent right row forward onto each left row

One exchange on the key columns, one in-partition sort — the same cost
as a groupBy over the combined tables, independent of how many left rows
each right row serves. The right payload travels as a single STRUCT so
row semantics are preserved (a right row whose value column is NULL
still matches; ``ignoreNulls`` skips only rows from the other side).

Tie rule: at equal timestamps the right row sorts FIRST, so a left row
matches a simultaneous right row (DuckDB ASOF ``>=`` semantics). Pass
``tolerance`` to null out matches staler than a maximum age — rows keep
their left columns, match columns become NULL (left-join semantics
throughout).

Skew note: keys are user/entity ids — the natural partitioning; a hot
key concentrates its rows in one window task, the same profile as any
per-entity window. The window frame is running (no buffering beyond the
sort); state never exceeds one payload struct per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    value_cols: tuple[str, ...] | None = None,
    suffix: str = "_asof",
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: most recent right row with ``r.ts <= l.ts`` per key.

    Output = every left row + for each of ``value_cols`` a
    ``<col><suffix>`` column from the matched right row, plus
    ``<ts_col><suffix>`` (the matched right timestamp; NULL when no match
    or staler than ``tolerance``, e.g. ``'1 hour'``).

    If several right rows share (key, ts), the match among them is
    unspecified — pre-aggregate the right side to one row per (key, ts)
    for determinism (the driver query does).
    """
    if value_cols is None:
        value_cols = tuple(c for c in right.columns if c not in (*by, ts_col))
    rts = f"{ts_col}{suffix}"

    payload = F.struct(
        F.col(ts_col).alias(rts), *[F.col(c).alias(f"{c}{suffix}") for c in value_cols]
    )
    r = right.select(
        *by,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        payload.alias("_rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns
          if c not in (*by, ts_col)],
    )
    l = left.select(
        *by,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        *[c for c in left.columns if c not in (*by, ts_col)],
    )

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    if tolerance is not None:
        fresh = F.col(ts_col).cast("timestamp") - F.expr(f"INTERVAL {tolerance}") <= F.col(
            f"_m.{rts}"
        ).cast("timestamp")
        matched = matched.withColumn("_m", F.when(fresh, F.col("_m")))
    return matched.select(
        *by,
        ts_col,
        *[c for c in left.columns if c not in (*by, ts_col)],
        F.col(f"_m.{rts}").alias(rts),
        *[F.col(f"_m.{c}{suffix}").alias(f"{c}{suffix}") for c in value_cols],
    )
