"""Tests for token-ID distribution analytics (ops/tokenstats.py) and the
skew-salted join utility (ops/skew.py)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from ultragendataset_datachecker_spark.ops.skew import salted_join
from ultragendataset_datachecker_spark.ops.tokenstats import (
    token_id_drift,
    token_id_histogram,
)


def _tok_df(spark, seed=0, n=300, vocab=100, with_bad=True):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        toks = rng.integers(0, vocab, size=rng.integers(1, 40)).tolist()
        if with_bad and i % 17 == 0:
            toks.append(-3)          # negative id
            toks.append(vocab + 5)   # overflow id
        rows.append((i % 4, toks))
    rows.append((0, None))
    rows.append((1, []))
    return spark.createDataFrame(rows, "part int, tokens array<int>")


# ---- token_id_histogram ------------------------------------------------------

def _hist_reference(rows, vocab, buckets):
    ref = {}
    for part, toks in rows:
        if toks is None:
            continue
        for t in toks:
            if t < 0:
                b = -1
            elif t >= vocab:
                b = buckets
            else:
                b = (t * buckets) // vocab
            ref[(part, b)] = ref.get((part, b), 0) + 1
    return ref


@pytest.mark.parametrize("impl", ["arrow", "sql"])
def test_token_histogram_vs_python(spark, impl):
    df = _tok_df(spark, seed=1)
    rows = [(r["part"], r["tokens"]) for r in df.collect()]
    got = {
        (r["part"], r["bucket"]): r["n_tokens"]
        for r in token_id_histogram(df, vocab_size=100, num_buckets=8, impl=impl).collect()
    }
    assert got == _hist_reference(rows, 100, 8)
    assert any(b == -1 for _, b in got)   # negative-id diagnostic bucket
    assert any(b == 8 for _, b in got)    # overflow diagnostic bucket


def test_token_histogram_impl_parity_and_partitioning(spark):
    df = _tok_df(spark, seed=2, n=500)

    def snap(d, impl):
        return sorted(
            (r["part"], r["bucket"], r["n_tokens"])
            for r in token_id_histogram(d, vocab_size=100, num_buckets=16, impl=impl).collect()
        )

    arrow = snap(df.repartition(7), "arrow")
    assert arrow == snap(df.repartition(1), "sql")
    assert arrow == snap(df.repartition(3), "arrow")


def test_token_histogram_rejects_bad_args(spark):
    df = _tok_df(spark)
    with pytest.raises(ValueError):
        token_id_histogram(df, vocab_size=0)
    with pytest.raises(ValueError):
        token_id_histogram(df, vocab_size=10, impl="pandas")


# ---- token_id_drift ----------------------------------------------------------

def test_token_drift_identical_corpus_is_zero(spark):
    df = _tok_df(spark, seed=3)
    out = token_id_drift(df, df, vocab_size=100, num_buckets=8).collect()
    assert len(out) == 4
    for r in out:
        assert r["kl"] == pytest.approx(0.0, abs=1e-9)
        assert r["psi"] == pytest.approx(0.0, abs=1e-9)
        assert r["n_cur"] == r["n_base"]


def test_token_drift_detects_shifted_vocabulary(spark):
    base = _tok_df(spark, seed=4, with_bad=False)
    # shift every id into the top half of the vocab: mass moves buckets
    cur = base.select(
        "part", F.transform("tokens", lambda t: t / 2 + 50).cast("array<int>").alias("tokens")
    )
    out = {r["part"]: r for r in token_id_drift(cur, base, vocab_size=100, num_buckets=8).collect()}
    assert all(r["psi"] > 0.5 for r in out.values())
    assert all(r["kl"] > 0.5 for r in out.values())


# ---- salted_join --------------------------------------------------------------

def _skewed(spark):
    # one hot key carrying 90% of the fact rows
    fact = spark.createDataFrame(
        [(("hot" if i % 10 else f"k{i}"), i) for i in range(1000)], "k string, v long"
    )
    dim = spark.createDataFrame(
        [("hot", 1), ("k10", 2), ("k20", 3), ("missing", 4)], "k string, attr int"
    )
    return fact, dim


def test_salted_join_inner_equals_plain_join(spark):
    fact, dim = _skewed(spark)
    plain = sorted((r["k"], r["v"], r["attr"]) for r in fact.join(dim, "k").collect())
    salted = sorted(
        (r["k"], r["v"], r["attr"])
        for r in salted_join(fact, dim, ["k"], salt_buckets=8).collect()
    )
    assert salted == plain and len(plain) > 900


def test_salted_join_left_equals_plain_join(spark):
    fact, dim = _skewed(spark)
    plain = sorted(
        (r["k"], r["v"], r["attr"]) for r in fact.join(dim, "k", "left").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["attr"])
        for r in salted_join(fact, dim, ["k"], how="left", salt_buckets=8).collect()
    )
    assert salted == plain and len(plain) == 1000


def test_salted_join_plan_joins_on_salt(spark):
    fact, dim = _skewed(spark)
    plan = salted_join(fact, dim, ["k"], salt_buckets=4)._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # the salt is a real join key, not a dead column


def test_salted_join_rejects_bad_args(spark):
    fact, dim = _skewed(spark)
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], how="full")
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], salt_buckets=0)
    with pytest.raises(ValueError):
        salted_join(fact.withColumn("__salt", F.lit(1)), dim, ["k"])


def test_token_drift_one_sided_group_is_max_drift_not_error(spark):
    base = _tok_df(spark, seed=6, with_bad=False)
    cur = base.where(F.col("part") != 2)  # group 2 vanished from current
    out = {r["part"]: r for r in token_id_drift(cur, base, vocab_size=100, num_buckets=8).collect()}
    assert out[2]["n_cur"] == 0 and out[2]["n_base"] > 0
    assert out[2]["psi"] > 1.0  # all-eps side: maximal drift, no divide-by-zero


# ---- engine integration (cfg.token_hist_buckets) -----------------------------

def test_engine_token_hist_matches_direct_op(spark, sequences_df):
    from ultragendataset_datachecker_spark.config import EngineConfig
    from ultragendataset_datachecker_spark.engine import ValidationEngine

    cfg = EngineConfig(exact_quantiles=False, token_hist_buckets=16)
    res = ValidationEngine(cfg).run(sequences_df, persist=False)
    assert res.token_hist is not None
    got = sorted(
        (r["part"], r["bucket"], r["n_tokens"]) for r in res.token_hist.collect()
    )
    direct = sorted(
        (r["part"], r["bucket"], r["n_tokens"])
        for r in token_id_histogram(
            sequences_df, vocab_size=cfg.vocab_size, num_buckets=16
        ).collect()
    )
    assert got == direct and len(got) > 0
    # off by default: no extra pass unless asked for
    res2 = ValidationEngine(EngineConfig(exact_quantiles=False)).run(
        sequences_df, persist=False
    )
    assert res2.token_hist is None and res2.token_drift is None


def test_engine_token_drift_vs_persisted_baseline(spark, sequences_df, tmp_path):
    from ultragendataset_datachecker_spark.config import EngineConfig
    from ultragendataset_datachecker_spark.engine import ValidationEngine

    cfg = EngineConfig(exact_quantiles=False, token_hist_buckets=16)
    base_res = ValidationEngine(cfg).run(sequences_df, persist=False)
    bpath = str(tmp_path / "token_baseline")
    base_res.token_hist.write.parquet(bpath)

    res = ValidationEngine(cfg).run(
        sequences_df, token_baseline=spark.read.parquet(bpath), persist=False
    )
    rows = res.token_drift.collect()
    assert len(rows) > 0
    for r in rows:  # same corpus vs its own baseline: zero drift everywhere
        assert r["kl"] == pytest.approx(0.0, abs=1e-9)
        assert r["psi"] == pytest.approx(0.0, abs=1e-9)


def test_token_repetition_hand_computed(spark):
    from ultragendataset_datachecker_spark.ops.tokenstats import token_repetition

    rows = [
        (1, [5, 5, 5, 5]),            # one id: run 4, distinct 1/4, top 1.0, ent 0
        (2, [1, 2, 3, 4]),            # all distinct: run 1, ent log2(4)=2
        (3, [1, 1, 2, 1, 1, 1]),      # max run 3, top 5/6
        (4, []),                      # empty
        (5, None),                    # null
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    got = {r["doc_id"]: r.asDict() for r in token_repetition(df).collect()}
    assert got[1]["max_run"] == 4 and got[1]["top_token_frac"] == 1.0
    assert got[1]["distinct_frac"] == 0.25 and got[1]["token_entropy"] == 0.0
    assert got[1]["repetition_pass"] is False
    assert got[2]["max_run"] == 1 and got[2]["token_entropy"] == 2.0
    assert got[2]["distinct_frac"] == 1.0 and got[2]["top_token_frac"] == 0.25
    assert got[3]["max_run"] == 3
    assert got[3]["top_token_frac"] == pytest.approx(5 / 6)
    import math
    exp_ent = math.log2(6) - (5 * math.log2(5) + 1 * math.log2(1)) / 6
    assert got[3]["token_entropy"] == pytest.approx(exp_ent)
    assert got[4]["n_tok"] == 0 and got[4]["max_run"] is None
    assert got[4]["repetition_pass"] is None
    assert got[5]["n_tok"] is None and got[5]["repetition_pass"] is None


def test_token_repetition_partitioning_invariant(spark):
    from ultragendataset_datachecker_spark.ops.tokenstats import token_repetition

    import numpy as np
    rng = np.random.RandomState(3)
    rows = [(i, [int(x) for x in rng.randint(0, 50, size=rng.randint(1, 64))])
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    a = sorted(map(tuple, token_repetition(df.repartition(1)).collect()))
    b = sorted(map(tuple, token_repetition(df.repartition(17)).collect()))
    assert a == b
