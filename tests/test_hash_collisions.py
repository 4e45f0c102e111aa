"""Planted-collision coverage for the detect-then-verify dedup paths.

The round-4 redesign (checks/uniqueness.fused_duplicate_violations,
ops/dedup._hash_candidate_split) groups the corpus-sized exchange on a
64-bit xxhash64 of the key; hash groups are a SUPERSET of true duplicate
groups, and collision-merged singletons are discarded by the exact-key
``_cnt > 1`` regroup. Real 64-bit collisions never occur on test-sized
data, so until now that discard branch never executed.

These tests force it: ``pyspark.sql.functions.xxhash64`` is monkeypatched
to ``pmod(xxhash64(...), M)`` for a tiny modulus M, so (a) almost every
row lands in a multi-occupancy hash bucket and flows into the pruned
candidate frame, and (b) each bucket merges many DISTINCT keys. Column
expressions capture the hash at construction time, so patching around the
operator call coarsens exactly the detect stage and nothing built earlier
(e.g. narrow_projection's h1/h2 content hashes). Every assertion is
"output identical to the unpatched run" — collisions may only add false
candidates, never change results.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.config import EngineConfig


@pytest.fixture()
def coarse_hash(monkeypatch):
    """Patch F.xxhash64 -> pmod(xxhash64, 2): two hash buckets total, so
    every key collides with ~half of all other keys."""
    orig = F.xxhash64

    def coarse(*cols):
        return F.pmod(orig(*cols), F.lit(2))

    monkeypatch.setattr(F, "xxhash64", coarse)
    return coarse


def _keyed_df(spark):
    """120 rows: 100 distinct singleton keys + key k5 x3 + k7 x2 + a null-key
    pair (groupBy treats NULL keys as one group; the null-safe join-back must
    keep them)."""
    rows = [(i, f"k{i}", i) for i in range(100)]
    rows += [(100, "k5", 100), (101, "k5", 101), (102, "k7", 102)]
    rows += [(103, None, 103), (104, None, 104)]
    pdf = pd.DataFrame(rows, columns=["id", "key", "ord"])
    return spark.createDataFrame(pdf, schema="id long, key string, ord long").repartition(8)


def test_hash_candidate_split_superset_under_collisions(spark, coarse_hash):
    """With a 2-bucket hash, pruned must contain (nearly) the whole corpus —
    proof the collision path is live — and candidates must still be a
    superset of the true duplicate rows."""
    from ultragendataset_datachecker_spark.ops.dedup import _hash_candidate_split

    df = _keyed_df(spark)
    pruned, passthrough = _hash_candidate_split(df, ["key"])
    n_pruned, n_pass = pruned.count(), passthrough.count()
    assert n_pruned + n_pass == 105
    # 105 rows into 2 buckets: both buckets are multi-occupancy, so every
    # row is a candidate — far more than the 5 true duplicate-group rows.
    assert n_pruned == 105 and n_pass == 0


def test_exact_duplicates_discards_collision_singletons(spark, coarse_hash):
    from ultragendataset_datachecker_spark.ops.dedup import exact_duplicates

    df = _keyed_df(spark)
    out = sorted(
        (r["id"], r["first_id"], r["key"])
        for r in exact_duplicates(df, ["key"], "id", ["ord"]).collect()
    )
    # exactly the planted extras: k5 ids 100/101 after first=5, k7 id 102
    # after first=7, null-key id 104 after first=103 — no collision-merged
    # singleton (k0..k99) may leak a spurious pair
    assert out == [
        (100, 5, "k5"),
        (101, 5, "k5"),
        (102, 7, "k7"),
        (104, 103, None),
    ]


def test_dedup_keep_first_identical_under_collisions(spark):
    from ultragendataset_datachecker_spark.ops.dedup import dedup_keep_first

    df = _keyed_df(spark)
    baseline = sorted(map(tuple, dedup_keep_first(df, ["key"], ["ord"]).collect()))

    orig = F.xxhash64
    try:
        F.xxhash64 = lambda *cols: F.pmod(orig(*cols), F.lit(2))
        coarse = sorted(map(tuple, dedup_keep_first(df, ["key"], ["ord"]).collect()))
    finally:
        F.xxhash64 = orig

    assert coarse == baseline
    assert len(coarse) == 101  # one survivor per key group: k0..k99 + the null-key group


def test_fused_dup_checks_identical_under_collisions(spark, gen_spec, sequences_df):
    """fused_duplicate_violations on the planted-defect corpus must emit the
    exact same violation multiset when every (kt, kh) bucket is collision-
    merged down to pmod 2 — the true-key regroup is the correctness
    boundary, the hash stage only prunes."""
    from ultragendataset_datachecker_spark.checks.uniqueness import (
        fused_duplicate_violations,
    )
    from ultragendataset_datachecker_spark.prepare import narrow_projection

    cfg = EngineConfig(
        vocab_size=gen_spec.vocab_size,
        allowed_sources=tuple(gen_spec.sources),
        verify_token_dups_exactly=False,
    )
    # narrow built UNPATCHED: its h1/h2 content-hash expressions must stay
    # real (coarsening them would manufacture true duplicates, not collisions)
    narrow = narrow_projection(sequences_df, cfg)

    def rows_of(df):
        return sorted(tuple(str(x) for x in r) for r in df.collect())

    baseline = rows_of(fused_duplicate_violations(narrow, cfg))

    orig = F.xxhash64
    try:
        F.xxhash64 = lambda *cols: F.pmod(orig(*cols), F.lit(2))
        coarse = rows_of(fused_duplicate_violations(narrow, cfg))
    finally:
        F.xxhash64 = orig

    assert len(baseline) > 0
    assert coarse == baseline
