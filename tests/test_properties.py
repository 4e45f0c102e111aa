"""Hypothesis property tests for the pure scoring/oracle kernels — these run
without Spark, so they sweep far more of the input space than the planted
fixtures can."""

import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ultragendataset_datachecker_spark.oracle import (
    balance_entropy,
    distribution_score,
    overall_score,
)
from ultragendataset_datachecker_spark.report import penalty_score


@given(st.integers(min_value=0, max_value=10_000), st.integers(min_value=0, max_value=10_000))
def test_penalty_score_bounds(errors, warnings):
    s = penalty_score(errors, warnings)
    assert 0.0 <= s <= 100.0
    # clean is the unique way to reach 100
    assert (s == 100.0) == (errors + warnings == 0)


@given(
    st.integers(min_value=0, max_value=100),
    st.integers(min_value=0, max_value=100),
    st.integers(min_value=1, max_value=100),
)
def test_penalty_score_monotone_nonincreasing(errors, warnings, more):
    base = penalty_score(errors, warnings)
    assert penalty_score(errors + more, warnings) <= base
    assert penalty_score(errors, warnings + more) <= base


@given(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        min_size=0,
        max_size=200,
    )
)
def test_balance_entropy_in_unit_interval(values):
    e = balance_entropy(pd.Series(values, dtype="object"))
    assert 0.0 <= e <= 1.0 + 1e-12
    # uniform multi-class maximum: entropy 1 when classes are equal-sized
    classes = set(values)
    if len(classes) > 1 and len({values.count(c) for c in classes}) == 1:
        assert e == pytest_approx_one()


def pytest_approx_one():
    import pytest

    return pytest.approx(1.0, abs=1e-9)


@given(
    st.floats(min_value=-50, max_value=50, allow_nan=False),
    st.floats(min_value=-50, max_value=50, allow_nan=False),
)
def test_distribution_score_unit_interval(skew, kurt):
    s = distribution_score(skew, kurt)
    assert 0.0 <= s <= 1.0
    assert not math.isnan(s)


@given(
    st.dictionaries(
        st.sampled_from(
            ["missing_values", "duplicates", "outliers",
             "data_format", "data_balance", "data_distribution"]
        ),
        st.floats(min_value=0, max_value=1, allow_nan=False),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=200)
def test_overall_score_is_convex_combination(scores):
    s = overall_score(scores)
    assert min(scores.values()) - 1e-12 <= s <= max(scores.values()) + 1e-12


# ----------------------------------------------- PNM parser (pure function)

from ultragendataset_datachecker_spark.ops.multimodal import (  # noqa: E402
    decode_pnm,
    encode_pnm,
    pnm_pixels,
)


@given(st.binary(min_size=0, max_size=512))
def test_decode_pnm_never_raises(payload):
    r = decode_pnm(payload)
    assert r is None or (len(r) == 5 and isinstance(r[4], bool))


@given(
    st.integers(min_value=1, max_value=32),
    st.integers(min_value=1, max_value=32),
    st.integers(min_value=0, max_value=255),
)
def test_pnm_roundtrip(w, h, value):
    import numpy as np

    img = np.full((h, w), value, dtype="u1")
    payload = encode_pnm(img)
    got = decode_pnm(payload)
    assert got == (w, h, 1, "pgm", False)
    assert (pnm_pixels(payload) == img).all()


@given(
    st.integers(min_value=2, max_value=16),
    st.integers(min_value=2, max_value=16),
    st.integers(min_value=1, max_value=32),
)
def test_pnm_truncation_flags_corrupt(w, h, cut):
    import numpy as np

    payload = encode_pnm(np.zeros((h, w), dtype="u1"))
    cut = min(cut, w * h)
    got = decode_pnm(payload[:-cut])
    assert got is not None and got[4] is True
