"""Tests for int8 embedding quantization + quantized cosine top-k."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.ops.similarity import (
    brute_force_topk_pandas,
    quantize_embeddings,
    quantized_topk,
)


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((200, 32)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
    rows.append((500, [0.0] * 32))  # all-zero vector
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_quantize_hand_values(spark):
    df = spark.createDataFrame(
        [(1, [127.0, -127.0, 63.5, -63.5, 0.0])], "vec_id long, embedding array<float>"
    )
    r = quantize_embeddings(df).collect()[0]
    assert r["q_scale"] == pytest.approx(1.0)
    # 63.5 rounds half-away-from-zero: -> 64 / -64
    assert list(r["q_vec"]) == [127, -127, 64, -64, 0]


def test_quantize_zero_vector_and_bounds(emb_df):
    got = quantize_embeddings(emb_df).collect()
    by_id = {r["vec_id"]: r for r in got}
    assert list(by_id[500]["q_vec"]) == [0] * 32 and by_id[500]["q_scale"] == 0.0
    for r in got:
        assert all(-127 <= v <= 127 for v in r["q_vec"])
        # the max-|x| element must hit exactly +-127
        if r["vec_id"] != 500:
            assert max(abs(v) for v in r["q_vec"]) == 127


def test_quantized_cosine_error_bound(emb_df):
    """Quantized cosine within ~2/127 of the exact float cosine (symmetric
    int8 error bound for unit-ish Gaussian vectors at dim 32)."""
    qdf = quantize_embeddings(emb_df)
    q_pdf = qdf.where(F.col("vec_id") < 3).select("vec_id", "q_vec").toPandas()
    f_pdf = emb_df.where(F.col("vec_id") < 3).select("vec_id", "embedding").toPandas()
    quant = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in quantized_topk(qdf, q_pdf, k=200, round_decimals=None).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in brute_force_topk_pandas(emb_df, f_pdf, k=200).collect()
    }
    # exclude the all-zero vector: the float path yields NaN there (0/0),
    # the quantized path defines it as 0.0
    diffs = [
        abs(quant[k] - exact[k])
        for k in exact
        if k in quant and k[1] != 500 and exact[k] is not None
    ]
    assert len(diffs) > 500
    assert max(diffs) < 0.03


def test_quantized_topk_recall(emb_df):
    qdf = quantize_embeddings(emb_df)
    q_pdf = qdf.where(F.col("vec_id") < 10).select("vec_id", "q_vec").toPandas()
    f_pdf = emb_df.where(F.col("vec_id") < 10).select("vec_id", "embedding").toPandas()
    quant = quantized_topk(qdf, q_pdf, k=10).collect()
    exact = brute_force_topk_pandas(emb_df, f_pdf, k=10).collect()
    q_sets = {}
    for r in quant:
        q_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = tot = 0
    for r in exact:
        tot += 1
        hits += r["neighbor_id"] in q_sets[r["query_id"]]
    assert hits / tot >= 0.8  # int8 recall@10 vs exact float ranking


def test_quantized_topk_partitioning_invariant(emb_df):
    qdf = quantize_embeddings(emb_df)
    q_pdf = qdf.where(F.col("vec_id") < 3).select("vec_id", "q_vec").toPandas()
    a = sorted(map(tuple, quantized_topk(qdf.repartition(1), q_pdf, k=5).collect()))
    b = sorted(map(tuple, quantized_topk(qdf.repartition(13), q_pdf, k=5).collect()))
    assert a == b


def test_quantize_arrow_sql_parity(spark, emb_df):
    """Arrow kernel must be bit-identical to the SQL expression form on all
    finite inputs, including the null/empty/all-zero edges."""
    a = quantize_embeddings(emb_df, impl="arrow").select("vec_id", "q_scale", "q_vec")
    s = quantize_embeddings(emb_df, impl="sql").select("vec_id", "q_scale", "q_vec")
    assert a.exceptAll(s).count() == 0 and s.exceptAll(a).count() == 0

    edge = spark.createDataFrame(
        [(1, None), (2, []), (3, [0.0, 0.0]), (4, [1.5, -2.5, 63.5])],
        "vec_id long, embedding array<float>",
    )
    ea = sorted(map(tuple, quantize_embeddings(edge, impl="arrow")
                    .select("vec_id", "q_scale", "q_vec").collect()))
    es = sorted(map(tuple, quantize_embeddings(edge, impl="sql")
                    .select("vec_id", "q_scale", "q_vec").collect()))
    assert ea == es


def test_topk_batch_pruning_matches_unpruned_window(emb_df):
    """The per-batch top-k prune must be invisible: tiny batches (many
    local top-k boundaries) vs one batch (no pruning effect) give identical
    rows, including rounded-cosine ties resolved by neighbor_id."""
    f_pdf = emb_df.where(F.col("vec_id") < 4).select("vec_id", "embedding").toPandas()
    one = sorted(map(tuple, brute_force_topk_pandas(
        emb_df.coalesce(1), f_pdf, k=7, round_decimals=3).collect()))
    many = sorted(map(tuple, brute_force_topk_pandas(
        emb_df.repartition(37), f_pdf, k=7, round_decimals=3).collect()))
    assert one == many and len(one) > 0
