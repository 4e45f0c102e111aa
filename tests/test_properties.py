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


# ---- hash_split: python replay of the exact lane arithmetic ----

@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=40,
             unique=True),
    st.lists(st.floats(min_value=0.01, max_value=10.0, allow_nan=False),
             min_size=2, max_size=4),
)
@settings(max_examples=20, deadline=None)
def test_hash_split_matches_python_replay(ids, weights):
    import hashlib

    from ultragendataset_datachecker_spark.ops.sampling import hash_split
    from ultragendataset_datachecker_spark.session import get_spark

    spark = get_spark(app_name="prop", master="local[2]", shuffle_partitions=2)
    names = [f"lane{i}" for i in range(len(weights))]
    w = dict(zip(names, weights))
    got = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            spark.createDataFrame([(i,) for i in ids], "doc_id long"), w
        ).collect()
    }
    # python replay with the same float arithmetic
    total = float(sum(w.values()))
    cum, bounds = 0.0, []
    for n in names[:-1]:
        cum += float(w[n]) / total
        bounds.append(int((1 << 32) * cum))
    for i in ids:
        u = int(hashlib.md5(f"split{i}".encode()).hexdigest()[:8], 16)
        expect = names[-1]
        for n, b in zip(reversed(names[:-1]), reversed(bounds)):
            if u < b:
                expect = n
        assert got[i] == expect


# ---- int8 quantization: dequantization error bound ----

@given(
    st.lists(st.floats(min_value=-1e3, max_value=1e3, allow_nan=False,
                       width=32), min_size=1, max_size=32),
)
@settings(max_examples=25, deadline=None)
def test_quantize_dequantize_error_bound(vec):
    from ultragendataset_datachecker_spark.ops.similarity import quantize_embeddings
    from ultragendataset_datachecker_spark.session import get_spark

    spark = get_spark(app_name="prop", master="local[2]", shuffle_partitions=2)
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
    r = quantize_embeddings(df).collect()[0]
    s, q = r["q_scale"], list(r["q_vec"])
    assert all(-127 <= v <= 127 for v in q)
    if all(x == 0 for x in vec):
        assert s == 0.0 and all(v == 0 for v in q)
        return
    assert s > 0
    # float32 storage rounds the input; compare against the stored values
    import numpy as np
    stored = np.asarray(vec, dtype="float32").astype("float64")
    assert max(abs(v) for v in (stored / s)) <= 127.0000001
    for x, v in zip(stored, q):
        assert abs(x - v * s) <= s / 2 + 1e-9


# ---- shuffled_shards: python replay of the md5 shard/pos arithmetic ----

@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=40,
             unique=True),
    st.integers(min_value=1, max_value=7),
    st.text(alphabet="abcdef0123456789-", min_size=1, max_size=12),
)
@settings(max_examples=15, deadline=None)
def test_shuffled_shards_matches_python_replay(ids, n_shards, seed):
    import hashlib

    from ultragendataset_datachecker_spark.ops.ordering import shuffled_shards
    from ultragendataset_datachecker_spark.session import get_spark

    spark = get_spark(app_name="prop", master="local[2]", shuffle_partitions=2)
    got = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shuffled_shards(
            spark.createDataFrame([(i,) for i in ids], "doc_id long"),
            n_shards, seed=seed,
        ).collect()
    }
    # python replay: shard = u32(md5 chars 1-8) mod n, pos = rank within
    # shard by (u32(chars 9-16), doc_id)
    def digest(i):
        return hashlib.md5(f"{seed}\x1f{i}".encode()).hexdigest()

    expect = {}
    per_shard: dict[int, list] = {}
    for i in ids:
        d = digest(i)
        shard = int(d[:8], 16) % n_shards
        per_shard.setdefault(shard, []).append((int(d[8:16], 16), i))
    for shard, rows in per_shard.items():
        for pos, (_, i) in enumerate(sorted(rows), start=1):
            expect[i] = (shard, pos)
    assert got == expect
