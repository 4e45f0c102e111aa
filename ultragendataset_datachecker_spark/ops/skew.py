"""Skew-hardened join utilities.

The engine handles its own hot-source skew internally (histograms as
``sum(when)`` columns inside the partition-keyed aggregate, salted two-phase
violation capping — engine.py); this module exposes the same discipline as a
reusable operator for caller joins whose key distribution is hostile.

``salted_join`` is the classic replicate-and-salt pattern for a large,
skew-keyed fact joined to a dimension that is too big to broadcast but small
enough to replicate ``salt_buckets`` times: one boilerplate key holding 10^8
fact rows would otherwise hash every one of them into a single shuffle
partition (AQE's skew-join split only helps sort-merge joins reading shuffle
files, and only when statistics catch it — explicit salting is the
deterministic fix).

Semantics: the join RESULT is identical to the unsalted join, row for row —
the salt only routes fact rows across ``salt_buckets`` partitions per key,
and the dimension side is replicated to every bucket, so each fact row still
meets exactly the dimension rows its key matches. The fact-side salt can
therefore be non-deterministic (``rand``) without affecting output: any
routing yields the same multiset, and a task retry that re-rolls salts still
joins each row to the same matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Join ``fact`` (large, skewed keys) to ``dim`` (replicable) on the
    equi-key columns ``on``, spreading each hot key over ``salt_buckets``
    shuffle partitions.

    Cost model: the dim-side shuffle grows ×salt_buckets (explode before the
    exchange — each replica row carries its own salt); the fact side
    shuffles once, unchanged. Pick salt_buckets ≈ (hot-key row count /
    target partition size). For a dim small enough to broadcast, use
    ``F.broadcast`` instead — no shuffle at all beats a salted one.

    ``how`` supports 'inner' and 'left' (the shapes where the fact side
    dominates; a right/full join's null-side semantics would need dedup of
    the replicated unmatched dim rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt_buckets < 1:
        raise ValueError("salt_buckets must be >= 1")
    for c in (fact.columns, dim.columns):
        if SALT_COL in c:
            raise ValueError(f"{SALT_COL} column already present")
    fact_s = fact.withColumn(
        SALT_COL, F.floor(F.rand(seed) * salt_buckets).cast("int")
    )
    dim_s = dim.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0).cast("int"), F.lit(salt_buckets - 1).cast("int"))),
    )
    return fact_s.join(dim_s, on=[*on, SALT_COL], how=how).drop(SALT_COL)
