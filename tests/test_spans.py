"""Repeated-span detection (ops/spans.py): kernel hash replay vs a direct
python reference, planted-boilerplate recovery, keep-first semantics,
maximal-range merging, and partitioning invariance."""

import random

import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.ops.spans import (
    SPAN_HASH_BASE,
    repeated_span_ranges,
    repeated_spans,
    span_coefficients,
    span_hashes,
)


def _py_span_hashes(tokens, k):
    """Direct reference: polynomial hash mod 2**64 per k-window, 1-based pos."""
    coeffs = span_coefficients(k)
    out = []
    for p in range(len(tokens) - k + 1):
        h = sum(tokens[p + j] * coeffs[j] for j in range(k)) % (1 << 64)
        if h >= 1 << 63:
            h -= 1 << 64
        out.append((p + 1, h))
    return out


def test_span_hashes_match_python_reference(spark):
    rng = random.Random(7)
    rows = [
        (i, [rng.randrange(0, 2**31) for _ in range(rng.randrange(0, 40))])
        for i in range(30)
    ]
    for k in (2, 5, 8):
        got = {
            (r["doc_id"], r["pos"]): r["span_hash"]
            for r in span_hashes(
                spark.createDataFrame(rows, "doc_id long, tokens array<long>"), k=k
            ).collect()
        }
        exp = {
            (i, p): h for i, toks in rows for p, h in _py_span_hashes(toks, k)
        }
        assert got == exp, k


def test_span_hashes_skips_null_and_short(spark):
    rows = [(1, [1, 2, 3]), (2, None), (None, [1, 2, 3, 4, 5]), (3, [9, 8, 7, 6])]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<long>")
    got = [(r["doc_id"], r["pos"]) for r in span_hashes(df, k=4).collect()]
    assert got == [(3, 1)]


@pytest.fixture(scope="module")
def boiler_df(spark):
    # docs 1-3 share the 6-token boilerplate [100..105] at different offsets;
    # doc 4 is unrelated
    boiler = [100, 101, 102, 103, 104, 105]
    rows = [
        (1, [1, 2] + boiler + [3, 4]),
        (2, boiler + [5, 6, 7, 8]),
        # boilerplate twice in one doc; distinct separators (9, 17) so the
        # separator-crossing spans do NOT form a second duplicate group
        (3, [9] + boiler + [17] + boiler),
        (4, [20, 21, 22, 23, 24, 25, 26, 27]),
    ]
    return spark.createDataFrame(rows, "doc_id long, tokens array<long>")


def test_repeated_spans_keep_first_rank(boiler_df):
    occ = repeated_spans(boiler_df, k=6).collect()
    # the exact-boilerplate 6-span appears at (1,3), (2,1), (3,2), (3,9):
    hits = sorted((r["doc_id"], r["pos"], r["occ_rank"]) for r in occ)
    assert hits == [(1, 3, 1), (2, 1, 2), (3, 2, 3), (3, 9, 4)]
    assert all(r["n_occurrences"] == 4 for r in occ)


def test_repeated_span_ranges_cut_list(boiler_df):
    got = sorted(
        (r["doc_id"], r["start_pos"], r["end_pos"], r["n_spans"])
        for r in repeated_span_ranges(boiler_df, k=6).collect()
    )
    # first occurrence (doc 1) kept; docs 2 and 3 get 6-token cut ranges
    assert got == [(2, 1, 6, 1), (3, 2, 7, 1), (3, 9, 14, 1)]
    # keep_first=False also cuts doc 1's copy
    all_got = sorted(
        (r["doc_id"], r["start_pos"], r["end_pos"])
        for r in repeated_span_ranges(boiler_df, k=6, keep_first=False).collect()
    )
    assert all_got == [(1, 3, 8), (2, 1, 6), (3, 2, 7), (3, 9, 14)]


def test_repeated_span_ranges_merge_overlapping(spark):
    # two docs share a 10-token run; with k=6 that is 5 overlapping spans
    # whose cut positions 1..5 must merge into ONE maximal range [1, 10]
    shared = list(range(500, 510))
    df = spark.createDataFrame(
        [(1, shared + [1]), (2, shared + [2])], "doc_id long, tokens array<long>"
    )
    got = [
        (r["doc_id"], r["start_pos"], r["end_pos"], r["n_spans"])
        for r in repeated_span_ranges(df, k=6).collect()
    ]
    assert got == [(2, 1, 10, 5)]


def test_repeated_spans_partitioning_invariance(spark):
    rng = random.Random(11)
    vocab = list(range(8))  # tiny vocab: 8^4 4-gram space -> natural repeats
    rows = [
        (i, [rng.choice(vocab) for _ in range(30)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<long>")
    a = sorted(map(tuple, repeated_span_ranges(df, k=4).collect()))
    b = sorted(map(tuple, repeated_span_ranges(df.repartition(13), k=4).collect()))
    assert a == b and len(a) > 0


def test_cut_repeated_text_spans(spark):
    from ultragendataset_datachecker_spark.ops.spans import cut_repeated_text_spans

    boiler = "all rights reserved by the example corp legal team"  # 9 words
    rows = [
        (1, f"alpha beta {boiler} gamma delta"),
        (2, f"{boiler} epsilon zeta eta theta"),
        (3, "iota kappa lam mu nu xi omicron pi rho"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["text"], r["spans_cut"]) for r in
           cut_repeated_text_spans(df, k=9).collect()}
    # doc 1 holds the first occurrence -> untouched
    assert out[1] == (rows[0][1], 0)
    # doc 2 loses exactly the boilerplate words
    assert out[2] == ("epsilon zeta eta theta", 1)
    # doc 3 has no repeats
    assert out[3] == (rows[2][1], 0)


def test_cut_repeated_text_spans_passthrough_columns(spark):
    from ultragendataset_datachecker_spark.ops.spans import cut_repeated_text_spans

    shared = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, shared, "s0"), (2, shared, "s1")], "doc_id long, text string, source string"
    )
    out = cut_repeated_text_spans(df, k=10)
    assert out.columns == ["doc_id", "text", "source", "spans_cut"]
    got = {r["doc_id"]: (r["text"], r["source"], r["spans_cut"]) for r in out.collect()}
    assert got == {1: (shared, "s0", 0), 2: ("", "s1", 1)}
