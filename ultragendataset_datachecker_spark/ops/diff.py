"""Snapshot diff — row-level change detection between two table versions.

The north-rule invariant for this engine is token-array equality per row;
between two snapshots of a 10^12-row sequence table the question "what
changed" is a full-outer comparison. The at-scale trick is to DIGEST
before joining: each side reduces to (id, xxhash64(compare columns)), so
the full-outer shuffle carries ~16 bytes/row instead of the multi-KB
token arrays — the same reason the engine's duplicate checks shuffle
content hashes, not content (checks/uniqueness.py).

``method='digest'`` (default) accepts the 2**-64 per-row collision odds
(a collision reports 'unchanged' for a changed row — the standard
content-hash tradeoff, same as every dedup path here). ``method='exact'``
ships the compare columns through the join for guaranteed answers on
small tables; a test pins digest == exact, and the driver oracle compares
the REAL values (DuckDB ``IS DISTINCT FROM``), independently validating
the digest's verdicts end-to-end.

Output: (id, change) with change in {'added','removed','changed'} —
'unchanged' rows are dropped unless ``include_unchanged``. NULL-safe:
a NULL compare value differs from a non-NULL one and equals NULL
(IS DISTINCT FROM semantics; xxhash64 folds NULL deterministically).

Scale: one exchange per side on the id (co-partitioned equi-join); ids
are unique per side, so no skew beyond hash imbalance. On Iceberg this
pairs with snapshot ids from the checkpoint manifest (README §Iceberg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    compare_cols: tuple[str, ...] = ("tokens",),
    method: str = "digest",
    include_unchanged: bool = False,
) -> DataFrame:
    """(id, change) for every row added, removed, or changed between snapshots."""
    if method == "digest":
        o = old.select(id_col, F.xxhash64(*compare_cols).alias("_o"))
        n = new.select(id_col, F.xxhash64(*compare_cols).alias("_n"))
        o = o.withColumn("_o_present", F.lit(True))
        n = n.withColumn("_n_present", F.lit(True))
        differs = ~F.col("_o").eqNullSafe(F.col("_n"))
    elif method == "exact":
        o = old.select(
            id_col, F.struct(*compare_cols).alias("_o"), F.lit(True).alias("_o_present")
        )
        n = new.select(
            id_col, F.struct(*compare_cols).alias("_n"), F.lit(True).alias("_n_present")
        )
        differs = ~F.col("_o").eqNullSafe(F.col("_n"))
    else:
        raise ValueError(f"unknown method: {method!r}")

    j = o.join(n, id_col, "full_outer")
    change = (
        F.when(F.col("_o_present").isNull(), F.lit("added"))
        .when(F.col("_n_present").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(id_col, change.alias("change"))
    if not include_unchanged:
        out = out.where(F.col("change") != "unchanged")
    return out
