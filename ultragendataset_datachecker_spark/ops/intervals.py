"""Interval joins — point-in-interval and interval-overlap, bucketized.

Spark executes a raw range predicate (``p.ts BETWEEN i.start AND i.end``)
as a broadcast-nested-loop or per-key cartesian — quadratic in the hot
key. The classic fix (used by every production range-join implementation,
e.g. Databricks' range-join optimization) is bucketing:

  - choose a bucket width ``W`` (>= the typical interval length);
  - an interval [s, e] is exploded to every bucket it touches
    (floor(s/W) .. floor(e/W) — ceil((e-s)/W)+1 rows);
  - a point belongs to exactly ONE bucket;
  - equi-join on (keys..., bucket) + the exact predicate as a residual
    filter.

The join becomes a plain hash join whose build side grows by the
explosion factor (~2x when W matches interval length), and each
candidate pair is produced exactly once for points (a point has one
bucket). For interval-interval overlap both sides explode, so a pair
can meet in several buckets; the standard dedup assigns each pair to the
single bucket containing ``max(s1, s2)`` — emitted iff the meeting
bucket IS that bucket, no distinct pass needed.

Intervals are CLOSED ([s, e], overlap iff s1 <= e2 AND s2 <= e1) —
matching SQL BETWEEN so the DuckDB oracle is a literal inequality join.

Scale notes: one exchange per side on (keys, bucket); AQE's skew-join
split handles a hot (key, bucket). Pick W via the interval-length
distribution (p95 length is a good default): too small explodes the
interval side, too large degrades toward the per-key cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col, width_s: int):
    return F.floor(F.unix_micros(col.cast("timestamp")) / F.lit(width_s * 1_000_000))


def _and(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    by: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval (same keys) containing it.

    Output = point columns + the interval's non-key columns. Many-to-many:
    a point inside three intervals yields three rows. ``how='left_outer'``
    keeps unmatched points with NULL interval columns (points with a NULL
    timestamp are excluded either way).
    """
    from ultragendataset_datachecker_spark.ops.windows import _duration_us

    width_s = _duration_us(bucket_width) // 1_000_000
    if width_s <= 0:
        raise ValueError("bucket_width must be at least 1 second")

    b0 = _bucket(F.col(start_col), width_s)
    b1 = _bucket(F.col(end_col), width_s)
    iv = intervals.where(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(start_col) <= F.col(end_col))
    ).withColumn("_b", F.explode(F.sequence(b0, b1)))
    pt = points.where(F.col(ts_col).isNotNull()).withColumn(
        "_b", _bucket(F.col(ts_col), width_s)
    )

    cond = [pt["_b"] == iv["_b"]]
    for k in by:
        cond.append(pt[k] == iv[k])
    cond.append(pt[ts_col] >= iv[start_col])
    cond.append(pt[ts_col] <= iv[end_col])
    joined = pt.join(iv, _and(cond), how)
    ival_cols = [c for c in intervals.columns if c not in by]
    return joined.select(
        *[pt[c] for c in points.columns], *[iv[c] for c in ival_cols]
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    by: tuple[str, ...] = ("user_id",),
    start_col: str = "start",
    end_col: str = "end",
    bucket_width: str = "1 hour",
    suffix: str = "_right",
) -> DataFrame:
    """Pairs of (left, right) intervals (same keys) that overlap.

    Closed-interval overlap: ``l.start <= r.end AND r.start <= l.end``.
    Both sides explode to their buckets; each overlapping pair meets in
    every shared bucket but is EMITTED only from the bucket containing
    ``greatest(l.start, r.start)`` — exactly-once without a distinct pass
    (that bucket is shared: both intervals cover max(s1,s2)).
    """
    from ultragendataset_datachecker_spark.ops.windows import _duration_us

    width_s = _duration_us(bucket_width) // 1_000_000
    if width_s <= 0:
        raise ValueError("bucket_width must be at least 1 second")

    def explode_side(df):
        b0 = _bucket(F.col(start_col), width_s)
        b1 = _bucket(F.col(end_col), width_s)
        return df.where(
            F.col(start_col).isNotNull()
            & F.col(end_col).isNotNull()
            & (F.col(start_col) <= F.col(end_col))
        ).withColumn("_b", F.explode(F.sequence(b0, b1)))

    l, r = explode_side(left), explode_side(right)
    cond = [l["_b"] == r["_b"]]
    for k in by:
        cond.append(l[k] == r[k])
    cond.append(l[start_col] <= r[end_col])
    cond.append(r[start_col] <= l[end_col])
    # exactly-once: emit from the bucket holding the later of the two starts
    anchor = F.greatest(l[start_col], r[start_col])
    cond.append(l["_b"] == _bucket(anchor, width_s))
    joined = l.join(r, _and(cond), "inner")
    rcols = [c for c in right.columns if c not in by]
    return joined.select(
        *[l[c] for c in left.columns],
        *[r[c].alias(f"{c}{suffix}") for c in rcols],
    )
