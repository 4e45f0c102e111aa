"""Round-2 dedup/LSH fixes:

- SimHash banding derives from max_hamming (pigeonhole recall guarantee):
  banded output == brute-force all-pairs Hamming filter, including h > 3.
- ngram Jaccard document-frequency cap: identical output when the cap does
  not bind; completes and stays exact on a hot-shingle corpus.
- MinHash verify prune: output unchanged by the restructure (precision 1.0,
  exact values), no session-lifetime persist.
- Embedding near-dup: exact-verified precision; multi-table recall.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.ops import dedup, similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


# ---------------------------------------------------------------- simhash

def _brute_hamming_pairs(spark, docs, shingle_n, max_hamming, hash_method="fast64"):
    n_bits = 60 if hash_method == "md5_60" else 64
    hs = docs.select(
        F.col("doc_id").alias("id"),
        F.array_distinct(
            dedup.hashed_shingles(F.col("text"), shingle_n, hash_method)
        ).alias("hs"),
    ).where(F.size("hs") > 0)
    h = hs.select("id", dedup._simhash_udf(n_bits)(F.col("hs")).alias("sh"))
    l, r = h.alias("l"), h.alias("r")
    return {
        (x["id_a"], x["id_b"]): x["hamming"]
        for x in l.crossJoin(r)
        .where(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .collect()
    }


@pytest.mark.parametrize("h", [3, 8])
def test_simhash_banded_equals_bruteforce(spark, docs, h):
    """Pigeonhole guarantee: banded candidates recover EVERY pair within
    Hamming h (the round-1 fixed 4x16 banding silently dropped distance 4-8
    pairs when called with max_hamming=8)."""
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_duplicates(docs, "doc_id", "text", 2, max_hamming=h).collect()
    }
    exp = _brute_hamming_pairs(spark, docs, 2, h)
    assert got == exp
    if h == 8:
        assert any(d > 3 for d in exp.values()), "fixture should have pairs at distance 4-8"


def test_simhash_insufficient_bands_raises(docs):
    with pytest.raises(ValueError, match="recall"):
        dedup.simhash_duplicates(docs, "doc_id", "text", 2, max_hamming=8, bands=4)


def test_simhash_band_widths_partition():
    for n_bits in (60, 64):
        for bands in (1, 3, 9, 17, n_bits):
            w = dedup.simhash_band_widths(n_bits, bands)
            assert len(w) == bands and sum(w) == n_bits and min(w) >= 1


def test_simhash_md5_matches_python_reimplementation(spark):
    """hash_method='md5_60' is the externally-replayable path: an
    independent Python md5 implementation reproduces the exact simhash."""
    import hashlib

    texts = ["the cat sat on the mat", "the cat sat on a mat", "completely different words here"]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0, 1, 2], "text": texts}))
    hs = df.select(
        "doc_id",
        F.array_distinct(dedup.hashed_shingles(F.col("text"), 2, "md5_60")).alias("hs"),
    )
    got = {r["doc_id"]: r["hs"] for r in hs.collect()}
    sh = df.select(
        "doc_id",
        dedup._simhash_udf(60)(
            F.array_distinct(dedup.hashed_shingles(F.col("text"), 2, "md5_60"))
        ).alias("sh"),
    )
    got_sh = {r["doc_id"]: r["sh"] for r in sh.collect()}

    for i, t in enumerate(texts):
        w = " ".join(t.split()).split(" ")
        grams = list(dict.fromkeys(" ".join(w[j:j + 2]) for j in range(len(w) - 1)))
        feats = sorted({int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams})
        assert sorted(got[i]) == feats, i
        votes = [0] * 60
        for f in feats:
            for b in range(60):
                votes[b] += 1 if (f >> b) & 1 else -1
        exp_sh = sum(1 << b for b in range(60) if votes[b] > 0)
        assert got_sh[i] == exp_sh, i


# ---------------------------------------------------------------- ngram cap

def test_ngram_cap_not_binding_identical(docs):
    uncapped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_duplicates(docs, "doc_id", "text", 2, 0.3).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_duplicates(
            docs, "doc_id", "text", 2, 0.3, max_doc_freq=10**6
        ).collect()
    }
    assert set(capped) == set(uncapped)
    for k in uncapped:
        assert capped[k] == pytest.approx(uncapped[k], rel=1e-12)


def test_ngram_hot_shingle_capped_stays_exact(spark):
    """A shingle shared by every doc would emit n² candidates uncapped; with
    the cap, pairs found via cold shingles still get their EXACT Jaccard
    (computed from full sets, hot shingles included)."""
    n = 200
    rows = []
    for i in range(n):
        # every doc shares 'common phrase everywhere' (hot); each pair
        # (2k, 2k+1) additionally shares a rare tail (cold)
        rows.append({"doc_id": i, "text": f"common phrase everywhere rare{i // 2} token{i // 2}"})
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = dedup.ngram_jaccard_duplicates(
        df, "doc_id", "text", 2, threshold=0.9, max_doc_freq=5
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in got}
    # each planted pair has identical text → jaccard exactly 1.0, found via
    # its rare shingles even though the hot ones are dropped from the index
    assert set(pairs) == {(2 * k, 2 * k + 1) for k in range(n // 2)}
    assert all(j == 1.0 for j in pairs.values())


# ---------------------------------------------------------------- minhash

def test_minhash_prune_restructure_output_unchanged(docs):
    """Same contract as round 1 (exact-verified pairs), now with the
    candidate-id semi-join prune and no session persist."""
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_duplicates(docs, "doc_id", "text", 2, 0.3).collect()
    }
    found = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_duplicates(
            docs, "doc_id", "text", shingle_n=2, num_hashes=32, bands=16,
            jaccard_threshold=0.3,
        ).collect()
    }
    assert set(found) <= set(exact)  # precision 1.0 (exact verify)
    strong = {k for k, j in exact.items() if j >= 0.7}
    assert strong <= set(found)  # miss prob (1-j²)^16 < 1e-3 at j=0.7
    for k, j in found.items():
        assert j == pytest.approx(exact[k], rel=1e-12)


def test_minhash_caches_only_candidate_pairs(spark, docs):
    """Round 1 cached the FULL hashed-shingle corpus for the session; now only
    the tiny candidate-pair id frame may be cached (O(near-dups), reclaimed by
    the ContextCleaner). Assert the cached-bytes delta is candidate-sized, not
    corpus-sized."""
    sc = spark.sparkContext._jsc.sc()

    def cached_bytes():
        return sum(i.memSize() + i.diskSize() for i in sc.getRDDStorageInfo())

    before = cached_bytes()
    dedup.minhash_lsh_duplicates(
        docs, "doc_id", "text", shingle_n=2, num_hashes=32, bands=16, jaccard_threshold=0.5
    ).count()
    delta = cached_bytes() - before
    corpus_text_bytes = docs.select(F.sum(F.length("text"))).first()[0]
    assert delta < max(corpus_text_bytes // 10, 64 * 1024), (delta, corpus_text_bytes)


# ---------------------------------------------------------------- embedding

def test_embedding_neardup_exact_verified_and_multitable_recall(spark):
    """Planted high-cosine pairs: multi-table LSH recovers them all;
    every emitted pair's cosine is exact (numpy check)."""
    rng = np.random.RandomState(7)
    base_vecs = rng.standard_normal((50, 16)).astype("float32")
    rows = []
    for i, v in enumerate(base_vecs):
        rows.append({"vec_id": i, "embedding": v.tolist()})
        # planted near-dup: tiny perturbation → cosine ~0.999
        rows.append({"vec_id": 1000 + i, "embedding": (v + 0.01 * rng.standard_normal(16).astype("float32")).tolist()})
    df = spark.createDataFrame(pd.DataFrame(rows)).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    got = dedup.embedding_near_duplicates(
        df, "vec_id", "embedding", cosine_threshold=0.98, n_planes=8, n_tables=6, seed=3
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in got}
    # exact ground truth
    m = {r["vec_id"]: np.asarray(r["embedding"], dtype="float64") for _, r in pd.DataFrame(rows).iterrows()}
    exp = set()
    ids = sorted(m)
    mn = {k: v / np.linalg.norm(v) for k, v in m.items()}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if float(mn[a] @ mn[b]) >= 0.98:
                exp.add((a, b))
    assert exp, "fixture must plant near-dups"
    assert found <= exp or all(  # precision: every emitted pair is truly >= t
        float(mn[a] @ mn[b]) >= 0.98 - 1e-12 for a, b in found
    )
    recall = len(found & exp) / len(exp)
    assert recall >= 0.95  # 6 tables x 8 planes at cosine ~0.999
    for r in got:
        a, b = r["id_a"], r["id_b"]
        assert r["cosine"] == pytest.approx(float(mn[a] @ mn[b]), rel=1e-9)


def test_unpersist_intermediates_releases_candidate_caches(spark, docs):
    """Each LSH/ANN op registers its persisted candidate frames on the result;
    unpersist_intermediates (or the `released` context manager) drops them
    deterministically — repeated library calls in one session must not
    accumulate cache entries until the ContextCleaner gets around to them."""
    sc = spark.sparkContext._jsc.sc()

    def n_cached():
        return len([i for i in sc.getRDDStorageInfo()])

    base = n_cached()
    # params differ from every other test in this module: Spark's cache
    # manager reuses an existing InMemoryRelation for an identical plan, which
    # would make the count deltas invisible
    out = dedup.minhash_lsh_duplicates(
        docs, "doc_id", "text", shingle_n=2, num_hashes=24, bands=12,
        jaccard_threshold=0.5,
    )
    out.count()
    assert n_cached() > base  # candidate frame is cached while in use
    assert dedup.unpersist_intermediates(out) >= 1
    assert n_cached() == base

    # shingle_n=3 is unique within this module: ngram's persisted `base`
    # (id, shingles) plan depends only on (docs, shingle_n), so reusing
    # shingle_n=2 would share the InMemoryRelation of an earlier unreleased
    # test call — releasing here would then drop that shared entry and the
    # count would land BELOW base.
    with dedup.released(
        dedup.ngram_jaccard_duplicates(
            docs, "doc_id", "text", shingle_n=3, threshold=0.31, max_doc_freq=63
        )
    ) as pairs:
        pairs.count()
        assert n_cached() > base
    assert n_cached() == base


def test_cross_snapshot_duplicates(spark):
    from ultragendataset_datachecker_spark.ops.dedup import cross_snapshot_duplicates

    base = spark.createDataFrame(
        [(1, "The quick   brown fox"), (2, "totally unique base doc"),
         (3, "the quick brown fox"), (4, None)],
        "doc_id long, text string",
    )
    cur = spark.createDataFrame(
        [(10, "THE QUICK BROWN   FOX"),   # normalized match (x2 in base)
         (11, "fresh new content here"),  # no match
         (12, None)],                     # null text -> excluded
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_base_matches"]
           for r in cross_snapshot_duplicates(cur, base).collect()}
    assert got == {10: 2}
    # normalize=False: case/whitespace differences no longer match
    raw = cross_snapshot_duplicates(cur, base, normalize=False).collect()
    assert raw == []
    # md5 and xxhash64 fingerprints flag the same id set
    md5_ids = {r["doc_id"]
               for r in cross_snapshot_duplicates(cur, base, hash_method="md5").collect()}
    assert md5_ids == {10}


# ------------------------------------------- round-4 scale-default hardening

def test_ngram_default_is_capped(docs):
    """The library DEFAULT is now the capped (scale-safe) path: identical to
    an explicit max_doc_freq=64 call, and still identical to uncapped on a
    corpus where no shingle is that hot."""
    default = {(r["id_a"], r["id_b"]): r["jaccard"]
               for r in dedup.ngram_jaccard_duplicates(docs, "doc_id", "text", 2, 0.3).collect()}
    explicit = {(r["id_a"], r["id_b"]): r["jaccard"]
                for r in dedup.ngram_jaccard_duplicates(
                    docs, "doc_id", "text", 2, 0.3, max_doc_freq=64).collect()}
    uncapped = {(r["id_a"], r["id_b"]): r["jaccard"]
                for r in dedup.ngram_jaccard_duplicates(
                    docs, "doc_id", "text", 2, 0.3, max_doc_freq=None).collect()}
    assert default == explicit == uncapped


def test_simhash_hot_bucket_guard(spark):
    """Skewed corpus: a 300-doc identical-text mega-cluster makes every one
    of its band buckets hot. With the cap, its quadratic pair expansion is
    dropped while pairs whose buckets stay cold keep the pigeonhole
    guarantee (found by the capped run iff found uncapped)."""
    rows = [{"doc_id": i, "text": "boiler plate legal footer repeated verbatim on every page"}
            for i in range(300)]
    rows += [{"doc_id": 1000 + i,
              "text": f"distinctive article number {i} about owls lakes and migration patterns"}
             for i in range(40)]
    df = spark.createDataFrame(pd.DataFrame(rows)).repartition(8)
    uncapped = {(r["id_a"], r["id_b"])
                for r in dedup.simhash_duplicates(
                    df, "doc_id", "text", 2, max_hamming=3, max_bucket_freq=None).collect()}
    capped = {(r["id_a"], r["id_b"])
              for r in dedup.simhash_duplicates(
                  df, "doc_id", "text", 2, max_hamming=3, max_bucket_freq=100).collect()}
    cluster = {p for p in uncapped if p[0] < 300 and p[1] < 300}
    assert len(cluster) == 300 * 299 // 2  # identical docs: all pairs, hamming 0
    # guard drops exactly the hot-bucket (mega-cluster) expansion
    assert capped == uncapped - cluster
    # default cap (10k) does not bind at this size
    deflt = {(r["id_a"], r["id_b"])
             for r in dedup.simhash_duplicates(df, "doc_id", "text", 2, max_hamming=3).collect()}
    assert deflt == uncapped


# ------------------------------------------- window-free keep-first (W1/A3)

def test_keep_first_hot_key_window_free(spark):
    """One key duplicated 50k times: the min(struct) partial agg collapses it
    map-side (the old row_number() window serialized the whole key into one
    task). Output: exactly one survivor, minimal by order."""
    n = 50_000
    hot = spark.range(n).select(
        F.lit("k0").alias("k"), (F.col("id") % 97).cast("int").alias("o"), F.col("id").alias("rid"))
    cold = spark.createDataFrame(
        [("k1", 5, 900001), ("k1", 3, 900002), ("k2", 7, 900003)],
        "k string, o int, rid long")
    df = hot.unionByName(cold).repartition(16)

    kept = dedup.dedup_keep_first(df, ["k"], ["o", "rid"])
    assert "row_number" not in kept._jdf.queryExecution().executedPlan().toString()
    rows = {r["k"]: (r["o"], r["rid"]) for r in kept.collect()}
    assert rows == {"k0": (0, 0), "k1": (3, 900002), "k2": (7, 900003)}

    dups = dedup.exact_duplicates(df, ["k"], "rid", order_cols=["o", "rid"])
    hotd = dups.where(F.col("k") == "k0")
    assert hotd.count() == n - 1
    assert hotd.where(F.col("first_id") != 0).count() == 0
    assert {r["id"] for r in dups.where(F.col("k") == "k1").collect()} == {900001}


def test_keep_first_null_keys_one_group(spark):
    """NULL keys form ONE group (groupBy semantics, matching the old window
    partitionBy and pandas keep='first') — the null-safe join-back must not
    leak extra null-keyed rows through the anti-join."""
    df = spark.createDataFrame(
        [(None, 2, "a"), (None, 1, "b"), ("x", 1, "c"), ("x", 0, "d"), ("y", 5, "e")],
        "k string, o int, rid string")
    kept = dedup.dedup_keep_first(df, ["k"], ["o", "rid"])
    assert {r["rid"] for r in kept.collect()} == {"b", "d", "e"}
    dups = dedup.exact_duplicates(df, ["k"], "rid", order_cols=["o", "rid"])
    got = {(r["id"], r["first_id"]) for r in dups.collect()}
    assert got == {("a", "b"), ("c", "d")}
