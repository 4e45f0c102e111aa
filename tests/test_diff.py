"""Snapshot diff (ops/diff.py): planted add/remove/change recovery, digest
== exact method parity, NULL semantics, and include_unchanged."""

import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.ops.diff import snapshot_diff


@pytest.fixture(scope="module")
def snapshots(spark):
    old = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, [4, 5]), (3, [6]), (4, None), (5, [7, 8])],
        "doc_id long, tokens array<long>",
    )
    new = spark.createDataFrame(
        [(1, [1, 2, 3]),        # unchanged
         (2, [4, 5, 9]),        # changed
         (4, None),             # unchanged (NULL == NULL)
         (5, None),             # changed (value -> NULL)
         (6, [10])],            # added; doc 3 removed
        "doc_id long, tokens array<long>",
    )
    return old, new


def test_snapshot_diff_digest(snapshots):
    old, new = snapshots
    got = {r["doc_id"]: r["change"] for r in snapshot_diff(old, new).collect()}
    assert got == {2: "changed", 3: "removed", 5: "changed", 6: "added"}


def test_snapshot_diff_exact_equals_digest(snapshots):
    old, new = snapshots
    d = sorted(map(tuple, snapshot_diff(old, new, method="digest").collect()))
    e = sorted(map(tuple, snapshot_diff(old, new, method="exact").collect()))
    assert d == e


def test_snapshot_diff_include_unchanged(snapshots):
    old, new = snapshots
    got = {r["doc_id"]: r["change"] for r in
           snapshot_diff(old, new, include_unchanged=True).collect()}
    assert got[1] == "unchanged" and got[4] == "unchanged" and len(got) == 6


def test_snapshot_diff_multi_column(spark):
    old = spark.createDataFrame([(1, "a", 1), (2, "b", 2)], "doc_id long, t string, v int")
    new = spark.createDataFrame([(1, "a", 1), (2, "b", 3)], "doc_id long, t string, v int")
    got = {r["doc_id"]: r["change"] for r in
           snapshot_diff(old, new, compare_cols=("t", "v")).collect()}
    assert got == {2: "changed"}
