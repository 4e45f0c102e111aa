"""Tests for ops/pii.py (PII detect/redact), ops/lm.py (bigram LM scoring),
ops/packing.length_bucket_stats, and ops/sampling.hash_split."""

import math

import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.ops.lm import (
    lm_quality_buckets,
    score_documents,
    train_bigram_lm,
)
from ultragendataset_datachecker_spark.ops.packing import length_bucket_stats
from ultragendataset_datachecker_spark.ops.pii import (
    PII_PATTERNS,
    pii_rates,
    redact_pii,
    scan_pii,
)
from ultragendataset_datachecker_spark.ops.sampling import hash_split


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (1, "mail me at alice.smith+x@example.co.uk please", "a"),
        (2, "server at 192.168.1.254 and 10.0.0.1 are up", "a"),
        (3, "call 555-123-4567 or 555.987.6543", "b"),
        (4, "ssn 123-45-6789 card 4111 1111 1111 1111", "b"),
        (5, "perfectly clean text with no identifiers at all", "b"),
        (6, None, "b"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_scan_pii_counts(pii_df):
    got = {r["doc_id"]: r.asDict() for r in scan_pii(pii_df).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_pii_total"] == 1
    assert got[2]["n_ipv4"] == 2 and got[2]["n_pii_total"] == 2
    assert got[3]["n_phone"] == 2 and got[3]["n_pii_total"] == 2
    assert got[4]["n_ssn"] == 1 and got[4]["n_credit_card"] == 1
    assert got[4]["n_pii_total"] == 2
    assert got[5]["n_pii_total"] == 0
    assert got[6]["n_pii_total"] is None  # null text stays null, not fake-zero


def test_redact_then_rescan_is_clean(pii_df):
    red = redact_pii(pii_df, "text")
    # scanning the REDACTED text must find nothing in any class
    rescan = scan_pii(red.select(F.col("doc_id"), F.col("text_redacted").alias("text")))
    tot = rescan.where(F.col("n_pii_total") > 0).count()
    assert tot == 0
    texts = {r["doc_id"]: r["text_redacted"] for r in red.collect()}
    assert "<EMAIL>" in texts[1]
    assert texts[2].count("<IP>") == 2
    assert "<PHONE>" in texts[3]
    assert "<SSN>" in texts[4] and "<CARD>" in texts[4]
    assert texts[5] == "perfectly clean text with no identifiers at all"


def test_redaction_order_card_before_phone(spark):
    # a grouped 16-digit card must become ONE <CARD>, not be half-eaten by
    # the phone/ssn patterns (PII_PATTERNS order guarantees this)
    df = spark.createDataFrame([(1, "pay 1234 5678 9012 3456 now")], ["doc_id", "text"])
    out = redact_pii(df, "text").collect()[0]["text_redacted"]
    assert out == "pay <CARD> now"


def test_pii_rates_aggregation(pii_df):
    got = {r["source"]: r.asDict() for r in pii_rates(pii_df, group_col="source").collect()}
    assert got["a"]["n_docs"] == 2 and got["a"]["n_docs_with_pii"] == 2
    assert got["a"]["n_email"] == 1 and got["a"]["n_ipv4"] == 2
    # null-text doc counts toward n_docs but not n_docs_with_pii
    assert got["b"]["n_docs"] == 4 and got["b"]["n_docs_with_pii"] == 2


def test_pii_patterns_are_re2_safe():
    # the oracle replays these in DuckDB (RE2): no lookarounds/backrefs allowed
    for pat in PII_PATTERNS.values():
        assert "(?=" not in pat and "(?!" not in pat and "\\1" not in pat


@pytest.fixture(scope="module")
def lm_corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "the dog sat"),
        (4, "zz qq vv"),  # out-of-domain
        (5, "one"),  # single word -> no bigrams
        (6, None),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bigram_lm_hand_computed(spark):
    trusted = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], ["doc_id", "text"]
    )
    uni, big, v = train_bigram_lm(trusted)
    # unigrams: a:3 b:3 c:1 -> V=3
    assert v == 3
    got_uni = {r["w1"]: r["c_uni"] for r in uni.collect()}
    assert got_uni == {"a": 3, "b": 3, "c": 1}
    got_big = {(r["w1"], r["w2"]): r["c_big"] for r in big.collect()}
    assert got_big == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}

    scored = score_documents(
        spark.createDataFrame([(10, "a b")], ["doc_id", "text"]), uni, big, v, k=1.0
    ).collect()[0]
    # P(b|a) = (3+1)/(3+1*3) = 4/6
    assert scored["n_bigrams"] == 1
    assert abs(scored["avg_logp"] - math.log(4 / 6)) < 1e-12
    assert abs(scored["ppx"] - 6 / 4) < 1e-9


def test_lm_score_separates_in_domain(lm_corpus):
    trusted = lm_corpus.where(F.col("doc_id").isin(1, 2, 3))
    uni, big, v = train_bigram_lm(trusted)
    scored = score_documents(lm_corpus.where(F.col("text").isNotNull()), uni, big, v)
    got = {r["doc_id"]: r.asDict() for r in scored.collect()}
    assert got[1]["avg_logp"] > got[4]["avg_logp"]  # in-domain beats gibberish
    assert got[4]["ppx"] > got[1]["ppx"]
    assert got[5]["n_bigrams"] == 0 and got[5]["avg_logp"] is None


def test_lm_buckets_rank_by_perplexity(lm_corpus):
    trusted = lm_corpus.where(F.col("doc_id").isin(1, 2, 3))
    uni, big, v = train_bigram_lm(trusted)
    scored = score_documents(lm_corpus.where(F.col("text").isNotNull()), uni, big, v)
    b = {r["doc_id"]: r["lm_bucket"] for r in lm_quality_buckets(scored, 2).collect()}
    assert b[1] == 1  # cleanest doc in head bucket
    assert b[4] == 2 or b[5] == 2  # gibberish / null-scored in tail


def test_length_bucket_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 5), (4, 8), (5, 9), (6, 0), (7, None)],
        ["id", "n_tok"],
    )
    got = {r["bucket"]: r.asDict() for r in length_bucket_stats(df, "n_tok").collect()}
    # n=1 -> bucket 1; n=2 -> 2; n=5,8 -> 8; n=9 -> 16; 0/None dropped
    assert set(got) == {1, 2, 8, 16}
    assert got[8]["n_seqs"] == 2 and got[8]["n_tokens"] == 13
    assert got[8]["n_padded"] == 16
    assert abs(got[8]["pad_frac"] - 3 / 16) < 1e-12
    assert got[1]["pad_frac"] == 0.0 and got[2]["pad_frac"] == 0.0


def test_hash_split_deterministic_and_growth_stable(spark):
    big = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    small = big.where(F.col("doc_id") < 500)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in hash_split(big, w).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(small, w).collect()}
    # growth stability: the same doc gets the same split in the subset run
    assert all(a[k] == v for k, v in b.items())
    # rough proportions on 2000 uniform hashes
    n_train = sum(1 for v in a.values() if v == "train")
    n_val = sum(1 for v in a.values() if v == "val")
    assert 0.74 <= n_train / 2000 <= 0.86
    assert 0.06 <= n_val / 2000 <= 0.14
    # every row got exactly one known lane
    assert set(a.values()) <= {"train", "val", "test"}


def test_hash_split_validates_weights(spark):
    df = spark.range(1).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_split(df, {})
    with pytest.raises(ValueError):
        hash_split(df, {"a": 0.0})
