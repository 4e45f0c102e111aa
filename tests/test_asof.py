"""As-of join (ops/asof.py): random-data parity with a direct python
reference, tie/tolerance/no-match semantics, NULL-payload row semantics,
and partitioning invariance."""

import datetime
import random

import pytest

from ultragendataset_datachecker_spark.ops.asof import asof_join

BASE = datetime.datetime(2026, 5, 1)


def _t(minutes):
    return BASE + datetime.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def random_sides(spark):
    rng = random.Random(3)
    left = [
        (u, _t(rng.randrange(0, 500)), i)
        for i, u in enumerate(rng.choices(range(12), k=200))
    ]
    # right: unique (user, ts) by construction
    right_keys = {(u, rng.randrange(0, 500)) for u in range(10) for _ in range(30)}
    right = [(u, _t(m), float(u * 1000 + m)) for u, m in right_keys]
    ldf = spark.createDataFrame(left, "user_id long, ts timestamp, event_id long")
    rdf = spark.createDataFrame(right, "user_id long, ts timestamp, value double")
    return left, right, ldf, rdf


def _py_asof(left, right):
    exp = {}
    for u, ts, eid in left:
        cands = [(rts, v) for (ru, rts, v) in right if ru == u and rts <= ts]
        exp[eid] = max(cands) if cands else (None, None)
    return exp


def test_asof_join_matches_python_reference(random_sides):
    left, right, ldf, rdf = random_sides
    got = {
        r["event_id"]: (r["ts_asof"], r["value_asof"])
        for r in asof_join(ldf, rdf).collect()
    }
    assert got == _py_asof(left, right)
    assert len(got) == len(left)  # every left row survives (left-join)


def test_asof_join_partitioning_invariance(random_sides):
    _, _, ldf, rdf = random_sides
    a = sorted(map(tuple, asof_join(ldf, rdf).collect()))
    b = sorted(map(tuple, asof_join(ldf.repartition(7), rdf.repartition(5)).collect()))
    assert a == b


def test_asof_join_tie_and_no_match(spark):
    ldf = spark.createDataFrame(
        [(1, _t(10), 100), (1, _t(5), 101), (2, _t(10), 102)],
        "user_id long, ts timestamp, event_id long",
    )
    rdf = spark.createDataFrame(
        [(1, _t(10), 7.0), (1, _t(8), 5.0)], "user_id long, ts timestamp, value double"
    )
    got = {r["event_id"]: (r["ts_asof"], r["value_asof"]) for r in asof_join(ldf, rdf).collect()}
    assert got[100] == (_t(10), 7.0)   # equal ts MATCHES (>= semantics)
    assert got[101] == (None, None)    # nothing at or before t+5
    assert got[102] == (None, None)    # user 2 has no right rows at all


def test_asof_join_tolerance(spark):
    ldf = spark.createDataFrame(
        [(1, _t(30), 100), (1, _t(200), 101)], "user_id long, ts timestamp, event_id long"
    )
    rdf = spark.createDataFrame([(1, _t(0), 1.0)], "user_id long, ts timestamp, value double")
    got = {
        r["event_id"]: (r["ts_asof"], r["value_asof"])
        for r in asof_join(ldf, rdf, tolerance="1 hour").collect()
    }
    assert got[100] == (_t(0), 1.0)    # 30 min old: fresh
    assert got[101] == (None, None)    # 200 min old: staler than 1 hour


def test_asof_join_null_payload_row_semantics(spark):
    """A matched right row with a NULL value column must NOT be skipped in
    favor of an older non-NULL row — the ROW matches, its value is NULL."""
    ldf = spark.createDataFrame([(1, _t(20), 100)], "user_id long, ts timestamp, event_id long")
    rdf = spark.createDataFrame(
        [(1, _t(5), 3.0), (1, _t(10), None)], "user_id long, ts timestamp, value double"
    )
    [r] = asof_join(ldf, rdf).collect()
    assert r["ts_asof"] == _t(10) and r["value_asof"] is None
