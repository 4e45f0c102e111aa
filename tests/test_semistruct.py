"""Tests for ops/semistruct.json_key_profile."""

import pytest

from ultragendataset_datachecker_spark.ops.semistruct import (
    MALFORMED_KEY,
    json_key_profile,
)


@pytest.fixture(scope="module")
def json_df(spark):
    rows = [
        (1, '{"a": 1, "b": "x"}'),
        (2, '{"a": 2.5}'),
        (3, '{"a": "oops", "c": null}'),
        (4, "not json at all"),
        (5, "{broken"),
        (6, None),  # null rows are excluded from the denominator
        (7, '{"b": "x", "nested": {"deep": 1}}'),
    ]
    return spark.createDataFrame(rows, "id long, props string")


def test_json_key_profile(json_df):
    got = {r["key"]: r.asDict() for r in json_key_profile(json_df, "props").collect()}
    # 6 non-null rows in the denominator
    a = got["a"]
    assert a["n_present"] == 3 and a["presence_rate"] == pytest.approx(3 / 6)
    assert a["n_numeric"] == 2          # 1, 2.5 numeric; "oops" not
    assert a["n_distinct"] == 3
    b = got["b"]
    assert b["n_present"] == 2 and b["n_distinct"] == 1 and b["n_numeric"] == 0
    # JSON null value -> key present, value NULL (not numeric, not distinct)
    c = got["c"]
    assert c["n_present"] == 1 and c["n_numeric"] == 0
    # nested object profiles as a present non-numeric string value
    n = got["nested"]
    assert n["n_present"] == 1 and n["n_numeric"] == 0 and n["n_distinct"] == 1
    m = got[MALFORMED_KEY]
    assert m["n_present"] == 2 and m["n_distinct"] == 2
    assert m["presence_rate"] == pytest.approx(2 / 6)


def test_json_key_profile_all_clean(spark):
    df = spark.createDataFrame([(1, '{"k": 1}'), (2, '{"k": 2}')], "id long, p string")
    got = {r["key"]: r.asDict() for r in json_key_profile(df, "p").collect()}
    assert set(got) == {"k"}  # no __malformed__ row when nothing is malformed
    assert got["k"]["n_present"] == 2 and got["k"]["n_numeric"] == 2
