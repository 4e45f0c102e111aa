"""Interval joins (ops/intervals.py): random-data parity with naive python
references, bucket-boundary behavior, exactly-once pair emission for the
overlap join, and outer-join semantics."""

import datetime
import random

import pytest

from ultragendataset_datachecker_spark.ops.intervals import (
    interval_overlap_join,
    point_in_interval_join,
)

BASE = datetime.datetime(2026, 6, 1)


def _t(minutes):
    return BASE + datetime.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def random_pts_ivs(spark):
    rng = random.Random(5)
    pts = [
        (u, _t(rng.randrange(0, 600)), i)
        for i, u in enumerate(rng.choices(range(8), k=150))
    ]
    ivs = []
    for j in range(80):
        u = rng.randrange(0, 8)
        s = rng.randrange(0, 600)
        ivs.append((u, _t(s), _t(s + rng.randrange(0, 180)), 1000 + j))
    pdf = spark.createDataFrame(pts, "user_id long, ts timestamp, point_id long")
    idf = spark.createDataFrame(ivs, "user_id long, start timestamp, end timestamp, iv_id long")
    return pts, ivs, pdf, idf


def test_point_in_interval_matches_reference(random_pts_ivs):
    pts, ivs, pdf, idf = random_pts_ivs
    for width in ("30 minutes", "2 hours", "6 hours"):
        got = sorted(
            (r["point_id"], r["iv_id"])
            for r in point_in_interval_join(pdf, idf, bucket_width=width).collect()
        )
        exp = sorted(
            (pid, ivid)
            for (u, ts, pid) in pts
            for (iu, s, e, ivid) in ivs
            if u == iu and s <= ts <= e
        )
        assert got == exp and len(exp) > 0, width


def test_point_in_interval_left_outer(spark):
    pdf = spark.createDataFrame(
        [(1, _t(10), 1), (1, _t(500), 2)], "user_id long, ts timestamp, point_id long"
    )
    idf = spark.createDataFrame(
        [(1, _t(0), _t(60), 10)], "user_id long, start timestamp, end timestamp, iv_id long"
    )
    got = {
        r["point_id"]: r["iv_id"]
        for r in point_in_interval_join(pdf, idf, how="left_outer").collect()
    }
    assert got == {1: 10, 2: None}


def test_point_in_interval_bucket_spanning(spark):
    # a 5-hour interval with 1-hour buckets: points in every covered bucket
    # each match exactly ONCE (a point has one bucket)
    pdf = spark.createDataFrame(
        [(1, _t(m), m) for m in (0, 59, 150, 299, 301)],
        "user_id long, ts timestamp, point_id long",
    )
    idf = spark.createDataFrame(
        [(1, _t(0), _t(300), 7)], "user_id long, start timestamp, end timestamp, iv_id long"
    )
    got = sorted(
        (r["point_id"], r["iv_id"])
        for r in point_in_interval_join(pdf, idf, bucket_width="1 hour").collect()
    )
    assert got == [(0, 7), (59, 7), (150, 7), (299, 7)]  # 301 outside [0,300]


def test_interval_overlap_matches_reference_exactly_once(random_pts_ivs):
    _, ivs, _, idf = random_pts_ivs
    spark = idf.sparkSession
    rng = random.Random(9)
    other = []
    for j in range(60):
        u = rng.randrange(0, 8)
        s = rng.randrange(0, 600)
        other.append((u, _t(s), _t(s + rng.randrange(0, 240)), 5000 + j))
    odf = spark.createDataFrame(
        other, "user_id long, start timestamp, end timestamp, iv_id long"
    )
    got = [
        (r["iv_id"], r["iv_id_right"])
        for r in interval_overlap_join(idf, odf, bucket_width="1 hour").collect()
    ]
    exp = sorted(
        (a_id, b_id)
        for (au, as_, ae, a_id) in ivs
        for (bu, bs, be, b_id) in other
        if au == bu and as_ <= be and bs <= ae
    )
    assert sorted(got) == exp and len(exp) > 0
    assert len(got) == len(set(got))  # exactly-once, no distinct pass needed


def test_interval_overlap_touching_is_overlap(spark):
    # closed intervals: [0,60] and [60,120] share the point t=60
    a = spark.createDataFrame(
        [(1, _t(0), _t(60), 1)], "user_id long, start timestamp, end timestamp, iv_id long"
    )
    b = spark.createDataFrame(
        [(1, _t(60), _t(120), 2), (1, _t(61), _t(120), 3)],
        "user_id long, start timestamp, end timestamp, iv_id long",
    )
    got = sorted(
        (r["iv_id"], r["iv_id_right"])
        for r in interval_overlap_join(a, b, bucket_width="30 minutes").collect()
    )
    assert got == [(1, 2)]  # touching overlaps; disjoint does not
