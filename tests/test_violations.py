"""Planted-defect tests: exact violation sets per FIXTURES.md §1."""

import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark import EngineConfig, ValidationEngine


@pytest.fixture(scope="module")
def cfg(gen_spec):
    return EngineConfig(vocab_size=gen_spec.vocab_size, allowed_sources=tuple(gen_spec.sources))


@pytest.fixture(scope="module")
def result(sequences_df, cfg):
    res = ValidationEngine(cfg).run(sequences_df)
    yield res
    res.unpersist()


@pytest.fixture(scope="module")
def viol_sets(result):
    rows = result.violations.collect()
    out = {}
    for r in rows:
        out.setdefault(r["check_name"], set()).add(r["doc_id"])
    return out


def _expected(gen_spec):
    return gen_spec.defects.doc_ids(gen_spec.n_rows)


def test_null_tokens(viol_sets, gen_spec):
    assert viol_sets["null_tokens"] == set(_expected(gen_spec)["null_tokens"])


def test_null_source(viol_sets, gen_spec):
    assert viol_sets["null_source"] == set(_expected(gen_spec)["null_source"])


def test_rogue_source(viol_sets, gen_spec):
    assert viol_sets["rogue_source"] == set(_expected(gen_spec)["rogue_source"])


def test_ntok_mismatch(viol_sets, gen_spec):
    assert viol_sets["ntok_mismatch"] == set(_expected(gen_spec)["ntok_mismatch"])


def test_token_out_of_range(viol_sets, gen_spec):
    assert viol_sets["token_out_of_range"] == set(_expected(gen_spec)["token_out_of_range"])


def test_empty_tokens(viol_sets, gen_spec):
    assert viol_sets["empty_tokens"] == set(_expected(gen_spec)["empty_tokens"])


def test_doc_id_duplicates(viol_sets, gen_spec):
    exp = set(_expected(gen_spec)["dup_doc_id_exact"]) | set(_expected(gen_spec)["dup_doc_id_diff"])
    assert viol_sets["doc_id_duplicate"] == exp


def test_token_duplicates(viol_sets, gen_spec):
    assert viol_sets["duplicate_tokens"] == set(_expected(gen_spec)["dup_doc_id_exact"])


def test_ntok_outliers_contain_planted(viol_sets, gen_spec):
    planted = set(_expected(gen_spec)["ntok_outlier"])
    assert planted <= viol_sets["ntok_outlier_zscore"]
    assert planted <= viol_sets["ntok_outlier_iqr"]


def test_violation_schema(result):
    assert [f.name for f in result.violations.schema.fields] == [
        "part", "doc_id", "check_name", "observed", "expected",
    ]


def test_no_spurious_referential_violations(result, gen_spec):
    rogue = result.violations.where(F.col("check_name") == "rogue_source")
    observed = {r["observed"] for r in rogue.collect()}
    assert observed == {"__rogue__"}


def test_parallelism_invariance(spark, gen_spec, cfg):
    """Verdicts and violations are byte-identical across parallelism levels
    (BASELINE.md bench protocol step 5)."""
    from ultragendataset_datachecker_spark.datagen import generate_sequences

    a = ValidationEngine(cfg).run(generate_sequences(spark, gen_spec, num_range_partitions=3), persist=False)
    b = ValidationEngine(cfg).run(generate_sequences(spark, gen_spec, num_range_partitions=48), persist=False)
    va = sorted([tuple(r) for r in a.violations.collect()])
    vb = sorted([tuple(r) for r in b.violations.collect()])
    assert va == vb
    da = sorted([tuple(r) for r in a.verdicts.collect()])
    db = sorted([tuple(r) for r in b.verdicts.collect()])
    assert da == db


def test_doc_id_pattern_configurable(spark, gen_spec):
    """EngineConfig.doc_id_pattern drives the doc_id_format check: a table
    whose ids follow another scheme passes with its own pattern and fails
    wholesale with the default (the reference's format rules are
    caller-declared, data_format.py:145-158)."""
    import pandas as pd

    rows = [
        {"doc_id": f"seq-{i:04d}", "tokens": [1, 2, 3], "n_tok": 3,
         "source": gen_spec.sources[0], "part": 0}
        for i in range(20)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows)).select(
        "doc_id",
        F.col("tokens").cast("array<int>").alias("tokens"),
        F.col("n_tok").cast("int"),
        "source",
        F.col("part").cast("int"),
    )
    base = dict(vocab_size=gen_spec.vocab_size, allowed_sources=tuple(gen_spec.sources))

    custom = ValidationEngine(EngineConfig(doc_id_pattern=r"^seq-\d{4}$", **base)).run(
        df, persist=False
    )
    assert custom.violations.where(F.col("check_name") == "doc_id_format").count() == 0

    default = ValidationEngine(EngineConfig(**base)).run(df, persist=False)
    bad = default.violations.where(F.col("check_name") == "doc_id_format")
    assert bad.count() == 20
    assert bad.select("expected").first()[0] == r"^doc_\d{10}$"


def test_dup_checks_survive_pathological_hot_key(spark, gen_spec):
    """Skew stress for the window-free dup checks: ONE doc_id (and one token
    sequence) duplicated 50k times across partitions. The checks must emit
    exactly n-1 violations for the hot key with the correct first-occurrence
    attribution — and no single task ever sorts the whole key (the
    window-free min(struct) form; plan pinned in tests/test_plans_ops.py)."""
    import pandas as pd

    from ultragendataset_datachecker_spark.checks.uniqueness import (
        doc_id_duplicate_violations,
        token_duplicate_violations,
    )
    from ultragendataset_datachecker_spark.prepare import narrow_projection

    n_hot = 50_000
    hot = pd.DataFrame({
        "doc_id": ["doc_0000000001"] * n_hot,
        "n_tok": [3] * n_hot,
        "source": ["web"] * n_hot,
        "part": [i % 8 for i in range(n_hot)],
    })
    hot["tokens"] = [[1, 2, 3]] * n_hot
    cold = pd.DataFrame({
        "doc_id": [f"doc_{i:010d}" for i in range(2, 1002)],
        "n_tok": [4] * 1000,
        "source": ["web"] * 1000,
        "part": [i % 8 for i in range(1000)],
    })
    cold["tokens"] = [[9, 9, 9, i] for i in range(1000)]
    df = spark.createDataFrame(pd.concat([hot, cold]), schema=(
        "doc_id string, n_tok int, source string, part int, tokens array<int>"
    )).repartition(32)

    cfg = EngineConfig()
    narrow = narrow_projection(df, cfg)

    dv = doc_id_duplicate_violations(narrow, cfg)
    assert dv.count() == n_hot - 1
    assert dv.where(F.col("doc_id") != "doc_0000000001").count() == 0
    obs = dv.select("observed").distinct().collect()
    assert [r["observed"] for r in obs] == [f"occurrences={n_hot}"]

    tv = token_duplicate_violations(narrow, cfg, fact=df)
    hot_tok = tv.where(F.col("observed") == "duplicate_of=doc_0000000001")
    assert hot_tok.count() == n_hot - 1
    assert tv.count() == n_hot - 1  # cold rows are all unique sequences


def test_special_token_checks_opt_in(spark, gen_spec):
    """cfg.bos_id/eos_id: O(1) first/last-token probes. Default-off: no
    missing_bos/missing_eos rows and no extra narrow columns."""
    from ultragendataset_datachecker_spark.prepare import narrow_projection

    rows = [
        # (part, doc_id, tokens, n_tok, source)
        (0, "doc_0000000001", [1, 5, 2], 3, "src0"),   # ok: bos=1, eos=2
        (0, "doc_0000000002", [7, 5, 2], 3, "src0"),   # missing bos
        (0, "doc_0000000003", [1, 5, 9], 3, "src0"),   # missing eos
        (1, "doc_0000000004", [9, 9], 2, "src0"),      # missing both
        (1, "doc_0000000005", [], 0, "src0"),          # empty: no bos/eos rows
        (1, "doc_0000000006", None, None, "src0"),     # null: no bos/eos rows
        (1, "doc_0000000007", [1], 1, "src0"),         # single token 1: eos fails
    ]
    df = spark.createDataFrame(
        rows, "part int, doc_id string, tokens array<int>, n_tok int, source string"
    )
    cfg = EngineConfig(bos_id=1, eos_id=2, allowed_sources=("src0",))
    res = ValidationEngine(cfg).run(df, persist=False)
    got = {}
    for r in res.violations.collect():
        got.setdefault(r["check_name"], set()).add(r["doc_id"])
    assert got["missing_bos"] == {"doc_0000000002", "doc_0000000004"}
    assert got["missing_eos"] == {"doc_0000000003", "doc_0000000004", "doc_0000000007"}
    # observed/expected payloads carry the actual and required ids
    bos_row = [r for r in res.violations.collect()
               if r["check_name"] == "missing_bos" and r["doc_id"] == "doc_0000000002"][0]
    assert bos_row["observed"] == "7" and bos_row["expected"] == "tokens[0] == 1"

    # default-off: no special-token rows, narrow schema unchanged
    cfg_off = EngineConfig(allowed_sources=("src0",))
    res_off = ValidationEngine(cfg_off).run(df, persist=False)
    names = {r["check_name"] for r in res_off.violations.collect()}
    assert not names & {"missing_bos", "missing_eos"}
    assert "tok_first" not in narrow_projection(df, cfg_off).columns
    assert "tok_last" not in narrow_projection(df, cfg_off).columns


def test_repetition_check_opt_in(spark):
    """cfg.repetition_check: degenerate sequences become token_repetition
    violations; healthy and empty/null sequences do not."""
    looped = [7] * 100                       # run 100, top 1.0
    padded = list(range(40)) + [0] * 60      # run 60
    healthy = list(range(100))               # distinct, no runs
    rows = [
        (0, "doc_0000000001", looped, 100, "src0"),
        (0, "doc_0000000002", padded, 100, "src0"),
        (0, "doc_0000000003", healthy, 100, "src0"),
        (1, "doc_0000000004", [], 0, "src0"),
        (1, "doc_0000000005", None, None, "src0"),
    ]
    df = spark.createDataFrame(
        rows, "part int, doc_id string, tokens array<int>, n_tok int, source string"
    )
    cfg = EngineConfig(repetition_check=True, allowed_sources=("src0",))
    res = ValidationEngine(cfg).run(df, persist=False)
    rep = {r["doc_id"]: r for r in res.violations.collect()
           if r["check_name"] == "token_repetition"}
    assert set(rep) == {"doc_0000000001", "doc_0000000002"}
    assert "top=1.0" in rep["doc_0000000001"]["observed"]
    assert "run=60" in rep["doc_0000000002"]["observed"]
    # counts flow into the uncapped violation_counts frame
    vc = {(r["part"], r["check_name"]): r["n"]
          for r in res.violation_counts.collect()}
    assert vc[(0, "token_repetition")] == 2

    # custom thresholds: loosen max_run so only the fully-looped doc fails
    cfg2 = EngineConfig(
        repetition_check=True, allowed_sources=("src0",),
        repetition_thresholds={"max_run": 80, "min_distinct_frac": 0.0,
                               "max_top_token_frac": 0.9},
    )
    res2 = ValidationEngine(cfg2).run(df, persist=False)
    rep2 = {r["doc_id"] for r in res2.violations.collect()
            if r["check_name"] == "token_repetition"}
    assert rep2 == {"doc_0000000001"}

    # default-off: no token_repetition rows
    res3 = ValidationEngine(EngineConfig(allowed_sources=("src0",))).run(df, persist=False)
    assert not any(r["check_name"] == "token_repetition"
                   for r in res3.violations.collect())


def test_repetition_check_planted_fixture(spark):
    """FIXTURES-style exact planted set: DefectSpec.looped_tokens plants
    whole-sequence single-id loops; the opt-in engine check flags EXACTLY
    those docs (length/range/dup checks cannot see them — the loops are
    length-clean and in-vocabulary)."""
    from ultragendataset_datachecker_spark.datagen import (
        DefectSpec,
        GenSpec,
        generate_sequences,
    )

    spec = GenSpec(n_rows=4_000, n_parts=4, seed=42,
                   defects=DefectSpec(looped_tokens=12))
    df = generate_sequences(spark, spec)
    cfg = EngineConfig(vocab_size=spec.vocab_size,
                       allowed_sources=tuple(spec.sources),
                       repetition_check=True)
    res = ValidationEngine(cfg).run(df, persist=False)
    got = {r["doc_id"] for r in res.violations.collect()
           if r["check_name"] == "token_repetition"}
    expected = set(spec.defects.doc_ids(spec.n_rows)["looped_tokens"])
    assert got == expected
    # default generator (looped_tokens=0): random in-vocab sequences never
    # false-positive under the default thresholds
    base = generate_sequences(spark, GenSpec(n_rows=4_000, n_parts=4, seed=42))
    res0 = ValidationEngine(cfg).run(base, persist=False)
    assert not any(r["check_name"] == "token_repetition"
                   for r in res0.violations.collect())


def test_fused_dup_checks_tuple_identical(spark, gen_spec, sequences_df):
    """fused_duplicate_violations (one shuffle, one probe) must emit EXACTLY
    the same violation multiset as the two separate window-free checks, on
    the planted-defect corpus (hash path — the config the fused form serves)
    AND on a corpus with ties at the minimum order tuple."""
    import pandas as pd

    from ultragendataset_datachecker_spark.checks.uniqueness import (
        doc_id_duplicate_violations,
        fused_duplicate_violations,
        token_duplicate_violations,
    )
    from ultragendataset_datachecker_spark.prepare import narrow_projection

    cfg = EngineConfig(
        vocab_size=gen_spec.vocab_size,
        allowed_sources=tuple(gen_spec.sources),
        verify_token_dups_exactly=False,
    )

    def rows_of(df):
        return sorted(tuple(str(x) for x in r) for r in df.collect())

    narrow = narrow_projection(sequences_df, cfg)
    sep = rows_of(
        doc_id_duplicate_violations(narrow, cfg).unionByName(
            token_duplicate_violations(narrow, cfg)
        )
    )
    fused = rows_of(fused_duplicate_violations(narrow, cfg))
    assert fused == sep and len(sep) > 0

    # tie corpus: same doc_id with IDENTICAL (part, n_tok, tokens) rows ->
    # ties at min for both checks' order tuples; plus a null doc_id dup pair
    tie = pd.DataFrame({
        "doc_id": ["doc_0000000001"] * 4 + ["doc_0000000002", None, None],
        "n_tok": [3] * 7,
        "source": ["web"] * 7,
        "part": [2, 2, 2, 2, 0, 1, 1],
    })
    tie["tokens"] = [[1, 2, 3]] * 5 + [[4, 5, 6]] * 2
    tdf = spark.createDataFrame(tie, schema=(
        "doc_id string, n_tok int, source string, part int, tokens array<int>"
    )).repartition(8)
    tnarrow = narrow_projection(tdf, cfg)
    sep_t = rows_of(
        doc_id_duplicate_violations(tnarrow, cfg).unionByName(
            token_duplicate_violations(tnarrow, cfg)
        )
    )
    fused_t = rows_of(fused_duplicate_violations(tnarrow, cfg))
    assert fused_t == sep_t and len(sep_t) > 0


def test_isin_literal_matches_broadcast_join(spark, sequences_df, gen_spec, cfg):
    """r6 continuation: with the default dimension, compute_row_violations
    compiles the allowed-sources membership test to a literal isin predicate
    instead of the broadcast left join. The emitted violation multiset must
    be identical under both forms (the planted corpus has rogue AND null
    sources, exercising the NULL-for-nonmember semantics)."""
    from ultragendataset_datachecker_spark.checks import column_stats, violations as viol_mod
    from ultragendataset_datachecker_spark.datagen import allowed_sources_df
    from ultragendataset_datachecker_spark.engine import ValidationEngine
    from ultragendataset_datachecker_spark.prepare import narrow_projection

    narrow = narrow_projection(sequences_df, cfg)
    allowed = allowed_sources_df(spark, list(cfg.allowed_sources))
    eng = ValidationEngine(cfg)
    scalar = sequences_df.select(cfg.partition_col, "doc_id", "n_tok", "source")
    bounds = eng._outlier_stats_from_imp(column_stats.imp_per_part_frame(scalar, cfg))

    def rows_of(df):
        return sorted(tuple(str(x) for x in r) for r in df.collect())

    joined = rows_of(viol_mod.compute_row_violations(narrow, cfg, allowed, bounds))
    literal = rows_of(viol_mod.compute_row_violations(
        narrow, cfg, allowed, bounds, allowed_literal=list(cfg.allowed_sources)
    ))
    assert literal == joined and len(joined) > 0
    assert any(r[2] == "rogue_source" for r in joined)


def test_bounds_from_imp_match_metrics_bounds(sequences_df, gen_spec, cfg):
    """r6 continuation: the outlier-bounds frame derived from the phase-0
    imperative frame (_outlier_stats_from_imp) must agree with the
    metrics-derived frame (_outlier_stats) after the shared 9-dp
    quantization on the same corpus."""
    from ultragendataset_datachecker_spark.checks import column_stats
    from ultragendataset_datachecker_spark.engine import ValidationEngine
    from ultragendataset_datachecker_spark.prepare import narrow_projection

    eng = ValidationEngine(cfg)
    narrow = narrow_projection(sequences_df, cfg)
    metrics = column_stats.compute_metrics(narrow, cfg)
    scalar = sequences_df.select(cfg.partition_col, "doc_id", "n_tok", "source")
    imp = column_stats.imp_per_part_frame(scalar, cfg)

    def rows_of(df):
        return sorted(tuple(str(x) for x in r) for r in df.collect())

    assert rows_of(eng._outlier_stats(metrics)) == rows_of(eng._outlier_stats_from_imp(imp))
