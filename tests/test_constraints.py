"""Declarative constraint suite (constraints.py) — semantics, both verdict
branches, null policy, grouped rollup, and the one-pass plan shape. The
reference's quality gates are imperative per-check pass criteria
(/root/reference/dataset_checker/checker.py:100-116); the suite generalizes
them into declared (metric, bounds) pairs fused into ONE aggregate pass.
"""

import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.constraints import (
    GLOBAL_GROUP,
    C,
    Constraint,
    ConstraintSuite,
    engine_contract_suite,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        # id, grp, email, score; one null email in grp 'b', one dup id
        (1, "a", "x@y.com", 10.0),
        (2, "a", "q@z.org", 20.0),
        (3, "a", "r@z.org", 30.0),
        (4, "b", None, 40.0),
        (5, "b", "s@z.org", -1.0),
        (5, "b", "t@z.org", 60.0),
    ]
    return spark.createDataFrame(rows, "id long, grp string, email string, score double")


def _by_name(results):
    return {(r["grp"], r["check_name"]): r for r in results.collect()}


class TestEvaluate:
    def test_global_pass_and_fail_branches(self, people):
        suite = ConstraintSuite(
            [
                C.completeness("email", min_ratio=0.8),  # 5/6 ≈ 0.833 → pass
                C.unique("id"),  # 5 distinct / 6 → fail
                C.non_negative("score"),  # min −1 → fail
                C.row_count_between(1, 10),  # 6 → pass
            ]
        )
        res = _by_name(suite.evaluate(people))
        g = GLOBAL_GROUP
        assert res[(g, "completeness(email)")]["passed"] == 1
        assert res[(g, "completeness(email)")]["observed"] == pytest.approx(5 / 6, abs=1e-6)
        assert res[(g, "unique(id)")]["passed"] == 0
        assert res[(g, "non_negative(score)")]["passed"] == 0
        assert res[(g, "row_count")]["passed"] == 1
        assert res[(g, "row_count")]["observed"] == 6.0

    def test_grouped_rollup_emits_groups_plus_global(self, people):
        suite = ConstraintSuite([C.row_count_between(1, None)])
        res = _by_name(suite.evaluate(people, group_col="grp"))
        assert set(k[0] for k in res) == {"a", "b", GLOBAL_GROUP}
        assert res[("a", "row_count")]["observed"] == 3.0
        assert res[("b", "row_count")]["observed"] == 3.0
        assert res[(GLOBAL_GROUP, "row_count")]["observed"] == 6.0

    def test_null_metric_fails(self, spark):
        df = spark.createDataFrame([(None,), (None,)], "v double")
        suite = ConstraintSuite([C.mean_between("v", 0, 1)])
        [row] = suite.evaluate(df).collect()
        assert row["passed"] == 0 and row["observed"] is None

    def test_ratio_constraints(self, people):
        g = GLOBAL_GROUP
        res = _by_name(
            ConstraintSuite(
                [
                    C.contained_in("grp", ["a"], min_ratio=0.4),  # 3/6 → pass
                    C.matches("email", r"@z\.org$", min_ratio=0.5),  # 4/5 non-null → pass
                    C.satisfies(F.col("score") > 0, "pos", min_ratio=0.9),  # 5/6 → fail
                ]
            ).evaluate(people)
        )
        assert res[(g, "contained_in(grp)")]["passed"] == 1
        assert res[(g, "contained_in(grp)")]["observed"] == pytest.approx(0.5)
        assert res[(g, "matches(email)")]["passed"] == 1
        assert res[(g, "matches(email)")]["observed"] == pytest.approx(0.8)
        assert res[(g, "satisfies(pos)")]["passed"] == 0
        # same metric, tighter bound → the fail branch of contained_in
        [tight] = (
            ConstraintSuite([C.contained_in("grp", ["a"], min_ratio=0.6)])
            .evaluate(people)
            .collect()
        )
        assert tight["passed"] == 0

    def test_stat_and_quantile_bounds(self, people):
        suite = ConstraintSuite(
            [
                C.mean_between("score", 20, 30),  # 26.5 → pass
                C.min_between("score", 0, None),  # −1 → fail
                C.max_between("score", None, 60),  # 60 inclusive → pass
                C.sum_between("score", 150, 200),  # 159 → pass
                C.stddev_between("score", 0, 100, level="warning"),
                C.quantile_between("score", 0.5, 20, 40, exact=True),  # 25 → pass
            ]
        )
        res = _by_name(suite.evaluate(people))
        g = GLOBAL_GROUP
        assert res[(g, "mean(score)")]["passed"] == 1
        assert res[(g, "min(score)")]["passed"] == 0
        assert res[(g, "max(score)")]["passed"] == 1
        assert res[(g, "sum(score)")]["passed"] == 1
        assert res[(g, "quantile(score,0.5)")]["observed"] == pytest.approx(25.0)
        assert res[(g, "stddev(score)")]["level"] == "warning"

    def test_quantization_shields_fp_noise(self, spark):
        # an observed value 1e-9 below the bound rounds up to exactly 1.0
        df = spark.createDataFrame([(1.0 - 1e-9,)], "v double")
        suite = ConstraintSuite([C.mean_between("v", 1.0, None)])
        [row] = suite.evaluate(df).collect()
        assert row["passed"] == 1 and row["observed"] == 1.0


class TestVerdicts:
    def test_error_fails_suite_warning_does_not(self, people):
        suite = ConstraintSuite(
            [
                C.non_negative("score"),  # error-level fail in grp b only
                C.stddev_between("score", 0, 0.001, level="warning"),  # fails everywhere
            ]
        )
        res, verd = suite.run(people, group_col="grp")
        v = {r["grp"]: r for r in verd.collect()}
        assert v["a"]["suite_passed"] == 1 and v["a"]["n_warning_failures"] == 1
        assert v["b"]["suite_passed"] == 0 and v["b"]["n_error_failures"] == 1
        assert v[GLOBAL_GROUP]["suite_passed"] == 0


class TestConstruction:
    def test_rejects_empty_dup_names_bad_level_no_bounds(self):
        with pytest.raises(ValueError, match="empty"):
            ConstraintSuite([])
        with pytest.raises(ValueError, match="duplicate"):
            ConstraintSuite([C.row_count_between(1), C.row_count_between(2)])
        with pytest.raises(ValueError, match="level"):
            C.completeness("x", level="fatal")
        with pytest.raises(ValueError, match="bounds"):
            Constraint(name="x", value=F.count(F.lit(1)))


class TestPlanShape:
    def test_one_pass_one_scan_one_exchange(self, people):
        """The whole suite is ONE rollup aggregate: a single scan of the
        input and a single hash exchange (partial → final agg), however
        many constraints it holds — the 100-TB contract of this module."""
        suite = ConstraintSuite(
            [
                C.completeness("email"),
                C.contained_in("grp", ["a", "b"]),
                C.mean_between("score", 0, 100),
                C.row_count_between(1),
            ]
        )
        plan = _plan(suite.evaluate(people, group_col="grp"))
        assert plan.count("Scan ") == 1
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Expand" in plan  # the rollup grouping-sets expand
        assert "Join" not in plan and "Window" not in plan


class TestSuggest:
    @pytest.fixture(scope="class")
    def typed(self, spark):
        rows = [
            (1, "a", 5.0, "x1", None),
            (2, "b", -2.5, "x2", [1, 2]),
            (3, "a", 7.25, "x3", [3]),
            (4, None, 7.25, "x4", None),
        ]
        return spark.createDataFrame(
            rows, "id long, cat string, v double, label string, arr array<int>"
        )

    def test_emission_rules(self, typed):
        from ultragendataset_datachecker_spark.constraints import suggest_constraints

        sugg, suite = suggest_constraints(typed, max_categories=3)
        got = {(r["col_name"], r["rule"]): r for r in sugg.collect()}
        # id: no nulls, unique, min 1 >= 0 → all five rules minus contained_in
        assert got[("id", "completeness")]["lo"] == 1.0
        assert got[("id", "completeness")]["level"] == "error"
        assert ("id", "unique") in got and ("id", "non_negative") in got
        assert got[("id", "range")]["lo"] == 1.0 and got[("id", "range")]["hi"] == 4.0
        # cat: one null → warning completeness floored to 0.75, 2 categories
        assert got[("cat", "completeness")]["lo"] == 0.75
        assert got[("cat", "completeness")]["level"] == "warning"
        assert got[("cat", "contained_in")]["param"] == "a,b"
        assert ("cat", "unique") not in got  # 2 distinct / 3 non-null
        # v: negative min → range but no non_negative; dup 7.25 → no unique
        assert ("v", "non_negative") not in got and ("v", "unique") not in got
        assert got[("v", "range")]["lo"] == -2.5 and got[("v", "range")]["hi"] == 7.25
        # label: 4 distinct > max_categories → no contained_in; unique holds
        assert ("label", "contained_in") not in got and ("label", "unique") in got
        # arr (complex type): completeness only
        assert [k[1] for k in got if k[0] == "arr"] == ["completeness"]
        assert got[("arr", "completeness")]["lo"] == 0.5

    def test_suggested_suite_passes_on_origin(self, typed):
        """The self-consistency contract: the originating table satisfies
        every constraint suggested from it (6-dp range rounding matches
        evaluate()'s 6-dp observed quantization exactly)."""
        from ultragendataset_datachecker_spark.constraints import suggest_constraints

        _, suite = suggest_constraints(typed, max_categories=3)
        res = suite.evaluate(typed)
        failed = [r["check_name"] for r in res.collect() if r["passed"] == 0]
        assert failed == []

    def test_empty_table_suggests_nothing(self, spark):
        from ultragendataset_datachecker_spark.constraints import suggest_constraints

        empty = spark.createDataFrame([], "id long, s string")
        sugg, suite = suggest_constraints(empty)
        assert sugg.count() == 0 and suite is None

    def test_integer_floor_is_exact(self, spark):
        """1485/1500 non-null must floor to exactly 0.99 — the float path
        floor(0.99·100) is representation-sensitive; the integer path
        (100·1485)//1500 = 99 is not."""
        from ultragendataset_datachecker_spark.constraints import suggest_constraints

        df = spark.range(1500).select(
            F.when(F.col("id") % 100 == 0, None).otherwise(F.col("id")).alias("v")
        )
        sugg, _ = suggest_constraints(df)
        [comp] = [r for r in sugg.collect() if r["rule"] == "completeness"]
        assert comp["lo"] == 0.99 and comp["level"] == "warning"


class TestSpecLoader:
    def test_spec_roundtrip(self, people):
        from ultragendataset_datachecker_spark.constraints import suite_from_spec

        spec = {
            "name": "people-contract",
            "constraints": [
                {"type": "completeness", "col": "email", "min_ratio": 0.8},
                {"type": "unique", "col": "id"},
                {"type": "contained_in", "col": "grp", "allowed": ["a", "b"]},
                {"type": "satisfies", "predicate": "score > 0", "name": "pos",
                 "min_ratio": 0.8, "level": "warning"},
                {"type": "mean_between", "col": "score", "lo": 0, "hi": 100},
                {"type": "row_count_between", "lo": 1},
            ],
        }
        suite = suite_from_spec(spec)
        assert suite.name == "people-contract"
        res = _by_name(suite.evaluate(people))
        g = GLOBAL_GROUP
        assert res[(g, "completeness(email)")]["passed"] == 1
        assert res[(g, "unique(id)")]["passed"] == 0
        assert res[(g, "contained_in(grp)")]["passed"] == 1
        assert res[(g, "satisfies(pos)")]["level"] == "warning"

    def test_spec_errors_point_at_entry(self):
        from ultragendataset_datachecker_spark.constraints import suite_from_spec

        with pytest.raises(ValueError, match="'constraints'"):
            suite_from_spec(["not", "a", "dict"])
        with pytest.raises(ValueError, match=r"constraints\[0\]: unknown type 'frobnicate'"):
            suite_from_spec({"constraints": [{"type": "frobnicate", "col": "x"}]})
        with pytest.raises(ValueError, match=r"constraints\[1\] \(completeness\)"):
            suite_from_spec({"constraints": [
                {"type": "row_count_between", "lo": 1},
                {"type": "completeness", "col": "x", "bogus_kw": 1},
            ]})


def test_job_cli_constraints_flag(spark, tmp_path, capsys):
    import json as _json

    from ultragendataset_datachecker_spark import job

    spec = {
        "name": "seq-contract",
        "constraints": [
            {"type": "completeness", "col": "doc_id"},
            {"type": "unique", "col": "doc_id"},  # planted dups → error fail
            {"type": "satisfies", "predicate": "n_tok >= 0",
             "name": "nonneg_ntok", "min_ratio": 0.5, "level": "warning"},
            {"type": "row_count_between", "lo": 1},
        ],
    }
    spec_path = tmp_path / "suite.json"
    spec_path.write_text(_json.dumps(spec))
    rc = job.main([
        "--generate", "4000", "--generate-parts", "4",
        "--input", str(tmp_path / "seq"), "--output", str(tmp_path / "out"),
        "--constraints", str(spec_path),
    ])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    summary = _json.loads(line)
    cs = summary["constraints"]
    assert cs["suite"] == "seq-contract" and cs["n_constraints"] == 4
    assert cs["error_failures"] >= 1  # unique(doc_id) fails somewhere
    back = spark.read.parquet(str(tmp_path / "out" / "constraints"))
    # per-part groups + the __all__ rollup row, one row per constraint
    grps = {r["grp"] for r in back.select("grp").distinct().collect()}
    assert "__all__" in grps and len(grps) == 5
    assert back.count() == 5 * 4


class TestEngineContract:
    def test_contract_suite_on_narrow_projection(self, sequences_df):
        from ultragendataset_datachecker_spark.config import EngineConfig
        from ultragendataset_datachecker_spark.prepare import narrow_projection

        cfg = EngineConfig()
        narrow = narrow_projection(sequences_df, cfg)
        suite = engine_contract_suite(cfg)
        res, verd = suite.run(narrow)
        rows = {r["check_name"]: r for r in res.collect()}
        assert len(rows) == len(suite.constraints)
        # datagen plants dup doc_ids (DefectSpec.dup_doc_id_*) but never a
        # null doc_id, so completeness holds while uniqueness fails
        assert rows["row_count"]["passed"] == 1
        assert rows["completeness(doc_id)"]["passed"] == 1
        assert rows["unique(doc_id)"]["passed"] == 0
        [v] = verd.collect()
        assert v["suite_passed"] == 0


class TestNullGroupDisambiguation:
    def test_null_group_value_not_merged_into_rollup_total(self, spark):
        # a genuinely NULL group value must stay its own group (grp NULL),
        # never fold into the '__all__' rollup total (which would merge the
        # two groups' verdicts)
        rows = [(1, "a", 10.0), (2, "a", 20.0), (3, None, -5.0)]
        df = spark.createDataFrame(rows, "id long, grp string, score double")
        suite = ConstraintSuite([C.min_between("score", 0, None)], name="s")
        res = suite.evaluate(df, group_col="grp")
        by_grp = {r["grp"]: r for r in res.collect()}
        assert set(by_grp) == {"a", None, GLOBAL_GROUP}
        # the null group holds the negative score; group 'a' passes on its
        # own; the total sees the global min
        assert by_grp["a"]["passed"] == 1
        assert by_grp[None]["passed"] == 0
        assert by_grp[GLOBAL_GROUP]["passed"] == 0
        assert by_grp[GLOBAL_GROUP]["observed"] == -5.0


class TestSuggestUniqueReverify:
    def test_approx_unique_false_positive_suppressed(self, spark, monkeypatch):
        # with exact_distinct=False the profile's HLL distinct count can
        # claim distinct == non_null for a near-unique column; the unique
        # suggestion must survive only an exact re-count
        from ultragendataset_datachecker_spark import constraints as cmod
        from ultragendataset_datachecker_spark.ops import profile as pmod

        df = spark.createDataFrame(
            [(1, "x"), (2, "y"), (2, "y"), (3, "z")], "id long, name string"
        )
        real = pmod.profile_table

        def fake_profile(frame, columns=None, exact_distinct=True):
            out = real(frame, columns, exact_distinct=True)
            # forge the HLL overestimate: claim every column fully distinct
            return out.withColumn("n_distinct", F.col("n_rows") - F.col("n_null"))

        monkeypatch.setattr(pmod, "profile_table", fake_profile)
        sugg, suite = cmod.suggest_constraints(df, exact_distinct=False)
        rules = {(r["col_name"], r["rule"]) for r in sugg.collect()}
        # id (2 occurs twice) and name ('y' twice) are NOT unique — the
        # exact re-verify must drop both forged suggestions
        assert ("id", "unique") not in rules
        assert ("name", "unique") not in rules
        # contract: the originating table passes every suggested constraint
        if suite is not None:
            res = suite.evaluate(df)
            assert all(r["passed"] == 1 for r in res.collect())
