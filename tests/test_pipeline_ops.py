"""Tests for the round-3 training-data-pipeline operators: Gopher/C4 quality
filters, benchmark decontamination, deterministic stratified sampling, and
corpus vocabulary heavy hitters."""

import pyspark.sql.functions as F
import pytest

from ultragendataset_datachecker_spark.ops.decontam import flag_contamination
from ultragendataset_datachecker_spark.ops.quality import quality_signals
from ultragendataset_datachecker_spark.ops.sampling import stratified_sample
from ultragendataset_datachecker_spark.ops.textstats import vocab_top_terms


@pytest.fixture(scope="module")
def docs(spark):
    good = (
        "the quick brown fox jumps over a lazy dog and then runs far away "
        "into the green hills of a quiet valley where many small streams flow"
    )
    rows = [
        (1, good),                              # passes every rule
        (2, "spam " * 40),                      # one word repeated: top_unigram_frac 1.0
        (3, "too short to pass"),               # fails min_words
        (4, " ".join(f"w{i}" for i in range(30))),  # no stopwords
        (5, good + " " + good),                 # heavy internal 4-gram repetition
    ]
    return spark.createDataFrame([(i, t.strip()) for i, t in rows], "doc_id long, text string")


def test_quality_signals_verdicts(docs):
    out = {r["doc_id"]: r.asDict() for r in quality_signals(docs).collect()}
    assert out[1]["gopher_pass"] is True
    assert out[2]["top_unigram_frac"] == 1.0 and out[2]["gopher_pass"] is False
    assert out[3]["n_words"] == 4 and out[3]["gopher_pass"] is False
    assert out[4]["stopword_distinct"] == 0 and out[4]["gopher_pass"] is False
    # doc 5 duplicates every 4-gram of `good` at least once
    assert out[5]["dup_4gram_frac"] > 0.15 and out[5]["gopher_pass"] is False


def test_quality_signals_single_word_doc(spark):
    out = quality_signals(
        spark.createDataFrame([(1, "lonely")], "doc_id long, text string")
    ).collect()[0]
    assert out["n_words"] == 1
    assert out["top_bigram_frac"] == 0.0 and out["dup_4gram_frac"] == 0.0
    assert out["top_unigram_frac"] == 1.0


def test_quality_mean_word_len(docs):
    row = quality_signals(docs.filter("doc_id = 2")).collect()[0]
    assert row["mean_word_len"] == 4.0  # 'spam'


def test_decontam_flags_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "prefix alpha beta gamma delta suffix"),      # shares 1 distinct 4-gram
            (2, "alpha beta gamma delta epsilon other"),      # shares 2
            (3, "nothing in common with the benchmark here"),  # clean
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_shared_ngrams"] for r in flag_contamination(corpus, bench).collect()}
    assert got == {1: 1, 2: 2}


def test_decontam_hash_and_string_keys_agree(spark):
    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit("t"), ((F.col("id") * 7 + i) % 13).cast("string")) for i in range(12)],
        ).alias("text"),
    )
    bench = docs.filter("doc_id % 10 = 0")
    corpus = docs.filter("doc_id % 10 != 0")
    a = sorted(map(tuple, flag_contamination(corpus, bench, hash_grams=True).collect()))
    b = sorted(map(tuple, flag_contamination(corpus, bench, hash_grams=False).collect()))
    assert a == b and len(a) > 0


def _sample_rows(df):
    return sorted(map(tuple, df.select("source", "doc_id", "sample_rank").collect()))


@pytest.fixture(scope="module")
def strat_df(spark):
    return spark.range(900).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
    )


def test_stratified_sample_exact_counts_and_determinism(strat_df):
    out = stratified_sample(strat_df, "source", 7)
    rows = _sample_rows(out)
    assert len(rows) == 21
    per = {}
    for s, _, r in rows:
        per.setdefault(s, []).append(r)
    assert all(sorted(v) == list(range(1, 8)) for v in per.values())
    # invariant to physical partitioning
    rows2 = _sample_rows(stratified_sample(strat_df.repartition(13), "source", 7))
    assert rows == rows2


def test_stratified_sample_prefilter_matches_exact(strat_df):
    exact = _sample_rows(stratified_sample(strat_df, "source", 7))
    fast = _sample_rows(stratified_sample(strat_df, "source", 7, scale_prefilter=True))
    assert exact == fast


def test_stratified_sample_small_stratum_returns_all(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, source string"
    )
    out = stratified_sample(df, "source", 5, scale_prefilter=True)
    assert out.count() == 3


def test_vocab_top_terms(spark):
    df = spark.createDataFrame(
        [(1, "b a a c"), (2, "a b B"), (3, "c b")], "doc_id long, text string"
    )
    got = [tuple(r) for r in vocab_top_terms(df, k=2).collect()]
    # a:3, b:4 (case-folded), c:2 -> top2 = b then a
    assert got == [("b", 4), ("a", 3)]


def test_quality_signals_match_python_reference(spark):
    """Batch cross-check: 50 random word-soup docs through the Spark HOF
    pipeline vs a direct python computation of every signal."""
    import collections
    import random

    rng = random.Random(7)
    vocab = ["the", "a", "of", "cat", "dog", "tree", "run", "blue", "x", "yy", "zzz"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 60))))
        for i in range(50)
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in quality_signals(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    for i, text in docs:
        w = text.split(" ")
        n = len(w)
        grams2 = [" ".join(w[j : j + 2]) for j in range(n - 1)]
        grams4 = [" ".join(w[j : j + 4]) for j in range(n - 3)]
        r = out[i]
        assert r["n_words"] == n
        assert r["mean_word_len"] == pytest.approx(sum(map(len, w)) / n)
        assert r["stopword_distinct"] == len({"the", "a", "of"} & set(w))
        assert r["top_unigram_frac"] == pytest.approx(
            collections.Counter(w).most_common(1)[0][1] / n
        )
        exp_bi = (
            collections.Counter(grams2).most_common(1)[0][1] / len(grams2)
            if grams2
            else 0.0
        )
        assert r["top_bigram_frac"] == pytest.approx(exp_bi)
        exp_d4 = (len(grams4) - len(set(grams4))) / len(grams4) if grams4 else 0.0
        assert r["dup_4gram_frac"] == pytest.approx(exp_d4)


def test_curate_cli_end_to_end(spark, tmp_path, capsys):
    import json

    from ultragendataset_datachecker_spark import curate

    good = (
        "the quick brown fox jumps over a lazy dog and then runs far away "
        "into the green hills of a quiet valley where many small streams flow"
    )
    rows = (
        [(i, good + f" tail{i}", "s0") for i in range(6)]       # near-dup cluster
        + [(10 + i, f"w{i} " * 10, "s1") for i in range(4)]     # fail quality
        + [
            (20 + i, "the a of " + " ".join(f"uniq{i}word{j}" for j in range(24)), "s1")
            for i in range(4)
        ]                                                        # unique, pass
    )
    src = str(tmp_path / "docs")
    (
        spark.createDataFrame(rows, "doc_id long, text string, source string")
        .withColumn("n_chars", F.length("text"))
        .write.parquet(src)
    )
    out = str(tmp_path / "out")
    rc = curate.main(
        ["--input", src, "--output", out, "--quality", "--dedup-ngram", "0.5",
         "--sample-per-source", "10", "--pack", "200",
         "--master", "local[4]"]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["docs_in"] == 14
    # quality drops the 4 repetitive docs; dedup keeps one of the 6 near-dups
    assert summary["stages"]["quality"] == 10
    assert summary["stages"]["dedup"] == 5
    kept = spark.read.parquet(f"{out}/kept")
    dropped = spark.read.parquet(f"{out}/dropped")
    assert kept.count() == summary["docs_kept"] == 5
    assert dropped.count() == 14 - 5
    assert set(r["drop_stage"] for r in dropped.collect()) == {"quality", "dedup"}
    # --pack appended pack assignment columns to every kept row
    assert {"bucket", "pack_id", "pack_offset"} <= set(kept.columns)
    assert kept.where(F.col("pack_id").isNull()).count() == 0


def test_curate_cli_cut_spans(spark, tmp_path, capsys):
    import json

    from ultragendataset_datachecker_spark import curate

    boiler = " ".join(f"legal{j}" for j in range(8))
    rows = [
        (1, f"alpha beta {boiler}", "s0"),
        (2, f"{boiler} gamma delta", "s0"),
        (3, "unrelated words only here now today maybe", "s0"),
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.parquet(src)
    out = str(tmp_path / "out")
    rc = curate.main(
        ["--input", src, "--output", out, "--cut-spans", "8", "--master", "local[4]"]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["docs_span_cut"] == 1 and summary["docs_kept"] == 3
    kept = {r["doc_id"]: r["text"] for r in spark.read.parquet(f"{out}/kept").collect()}
    assert kept[1] == rows[0][1]          # first occurrence kept verbatim
    assert kept[2] == "gamma delta"       # boilerplate cut
    assert kept[3] == rows[2][1]


def test_curate_cli_redact_and_split(spark, tmp_path, capsys):
    import json

    from ultragendataset_datachecker_spark import curate

    rows = [
        (1, "reach me at bob@example.com for details", "s0"),
        (2, "server 10.0.0.1 answered", "s0"),
        (3, "nothing sensitive in this one", "s0"),
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.parquet(src)
    out = str(tmp_path / "out")
    rc = curate.main(
        ["--input", src, "--output", out, "--redact-pii",
         "--split", "train:0.5,test:0.5", "--master", "local[4]"]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["docs_pii_redacted"] == 2 and summary["docs_kept"] == 3
    kept = {r["doc_id"]: r for r in spark.read.parquet(f"{out}/kept").collect()}
    assert "<EMAIL>" in kept[1]["text"] and "bob@example.com" not in kept[1]["text"]
    assert "<IP>" in kept[2]["text"]
    assert kept[3]["text"] == rows[2][1]
    assert set(r["split"] for r in kept.values()) <= {"train", "test"}


def test_term_distribution_psi(spark):
    from ultragendataset_datachecker_spark.ops.textstats import term_distribution_psi

    a = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(10)], "doc_id long, text string"
    )
    # identical distributions -> psi 0 for every term
    same = term_distribution_psi(a, a).collect()
    assert len(same) == 4 and all(abs(r["psi_term"]) < 1e-12 for r in same)
    # shifted distribution -> positive psi on the shifted terms
    b = spark.createDataFrame(
        [(i, "alpha alpha alpha beta") for i in range(10)], "doc_id long, text string"
    )
    drift = {r["term"]: r for r in term_distribution_psi(a, b).collect()}
    assert drift["alpha"]["psi_term"] > 0.1          # 0.25 -> 0.75
    assert drift["gamma"]["q_freq"] == 1e-6          # vanished, floored
    assert drift["gamma"]["psi_term"] > 1.0


def test_quality_signals_arrow_equals_sql(spark):
    """The Arrow kernel and the Column/HOF form must be row-for-row identical,
    including NULL / empty / whitespace-only / tab-newline edge texts."""
    import random

    rng = random.Random(11)
    vocab = ["the", "a", "of", "dog", "run", "x", "longword"]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 40)))) for i in range(40)]
    rows += [(100, None), (101, ""), (102, "   "), (103, "a\tb\nc  d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cols = ["doc_id", "n_words", "mean_word_len", "stopword_distinct",
            "top_unigram_frac", "top_bigram_frac", "dup_4gram_frac", "gopher_pass"]
    a = sorted(map(tuple, quality_signals(df, impl="arrow").select(cols).collect()))
    s = sorted(map(tuple, quality_signals(df, impl="sql").select(cols).collect()))
    assert a == s


def test_stratified_sample_numeric_strata_prefilter(spark):
    df = spark.range(300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("grp")
    )
    exact = sorted(
        map(tuple, stratified_sample(df, "grp", 4, scale_prefilter=False).collect())
    )
    fast = sorted(
        map(tuple, stratified_sample(df, "grp", 4, scale_prefilter=True).collect())
    )
    assert exact == fast and len(exact) == 12


def test_curate_cli_dedup_keep_best(spark, tmp_path, capsys):
    import json

    from ultragendataset_datachecker_spark import curate

    base = "the quick brown fox jumps over the lazy dog near a quiet stream"
    rows = [
        (1, base + " x", "s0"),
        (2, base + " and then it kept on running far beyond the hills", "s0"),  # longest
        (3, base + " y", "s0"),
        (9, "entirely different words live in this unrelated document", "s0"),
    ]
    src = str(tmp_path / "docs")
    (
        spark.createDataFrame(rows, "doc_id long, text string, source string")
        .withColumn("n_chars", F.length("text"))
        .write.parquet(src)
    )
    out = str(tmp_path / "out")
    rc = curate.main(
        ["--input", src, "--output", out, "--dedup-ngram", "0.5",
         "--dedup-keep-best", "n_chars", "--master", "local[4]"]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kept = sorted(r["doc_id"] for r in spark.read.parquet(f"{out}/kept").collect())
    assert kept == [2, 9]  # longest cluster member survives, not min-id
    assert summary["stages"]["dedup"] == 2
