"""Fix/repair surface (fixes.py) vs reference semantics
(missing_values.py:62-133, outliers.py:140-180, data_format.py:330-386,
auto_fixer.py:52-69) + the check→fix→re-check lifecycle (main.py:103-133)."""

import json

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark import EngineConfig, ValidationEngine, fixes
from ultragendataset_datachecker_spark.datagen import DefectSpec, GenSpec, generate_sequences


# ---------------------------------------------------------------- imputation

@pytest.fixture(scope="module")
def impute_pdf():
    rng = np.random.RandomState(0)
    normal = rng.normal(100, 10, 200)
    skewed = np.exp(rng.normal(0, 1, 200)) * 10  # lognormal, |skew| > 1
    pdf = pd.DataFrame({
        "normal_col": normal, "skewed_col": skewed,
        "cat": (["a"] * 120 + ["b"] * 60 + ["c"] * 20),
    })
    pdf.loc[::10, "normal_col"] = None
    pdf.loc[::7, "skewed_col"] = None
    pdf.loc[::5, "cat"] = None
    return pdf


def test_impute_auto_skew_aware(spark, impute_pdf):
    df = spark.createDataFrame(impute_pdf)
    fixed, plan = fixes.impute_missing(df, strategy="auto")
    assert plan["fills"]["normal_col"][0] == "mean"
    assert plan["fills"]["skewed_col"][0] == "median"
    assert plan["fills"]["cat"][0] == "mode"
    assert plan["fills"]["cat"][1] == "a"  # most frequent
    out = fixed.toPandas()
    assert out["normal_col"].isna().sum() == 0
    assert out["skewed_col"].isna().sum() == 0
    assert out["cat"].isna().sum() == 0
    # fill values match the pandas formulas
    assert plan["fills"]["normal_col"][1] == pytest.approx(impute_pdf["normal_col"].mean())
    assert plan["fills"]["skewed_col"][1] == pytest.approx(impute_pdf["skewed_col"].median())


def test_impute_strategies(spark, impute_pdf):
    df = spark.createDataFrame(impute_pdf)
    dropped, _ = fixes.impute_missing(df, strategy="drop")
    assert dropped.count() == len(impute_pdf.dropna())
    med, plan = fixes.impute_missing(df, strategy="median", columns=["normal_col"])
    assert plan["fills"]["normal_col"][1] == pytest.approx(impute_pdf["normal_col"].median())
    const, plan = fixes.impute_missing(
        df, strategy="constant", fill_values={"cat": "zz"}
    )
    assert const.where(F.col("cat") == "zz").count() == impute_pdf["cat"].isna().sum()
    with pytest.raises(ValueError, match="Invalid strategy"):
        fixes.impute_missing(df, strategy="bogus")


# ---------------------------------------------------------------- outliers

@pytest.fixture(scope="module")
def outlier_pdf():
    rng = np.random.RandomState(1)
    v = rng.normal(50, 5, 300)
    v[:5] = [500, -400, 300, 250, -200]  # planted outliers
    return pd.DataFrame({"v": v, "k": range(300)})


def test_fix_outliers_cap(spark, outlier_pdf):
    df = spark.createDataFrame(outlier_pdf)
    fixed, plan = fixes.fix_outliers(df, columns=["v"], strategy="cap", detect="iqr")
    lo, hi = plan["columns"]["v"]["cap_bounds"]
    q1, q3 = outlier_pdf["v"].quantile(0.25), outlier_pdf["v"].quantile(0.75)
    assert lo == pytest.approx(q1 - 1.5 * (q3 - q1))
    assert hi == pytest.approx(q3 + 1.5 * (q3 - q1))
    out = fixed.toPandas()
    assert out["v"].min() >= lo - 1e-9 and out["v"].max() <= hi + 1e-9
    assert len(out) == 300  # cap never drops rows


def test_fix_outliers_remove_and_replace(spark, outlier_pdf):
    df = spark.createDataFrame(outlier_pdf)
    removed, _ = fixes.fix_outliers(df, columns=["v"], strategy="remove", detect="zscore")
    s = outlier_pdf["v"]
    z = (s - s.mean()).abs() / s.std(ddof=0)
    assert removed.count() == int((z <= 3.0).sum())
    meaned, _ = fixes.fix_outliers(df, columns=["v"], strategy="mean", detect="zscore")
    got = meaned.toPandas().sort_values("k")["v"].to_numpy()
    exp = s.where(z <= 3.0, s.mean()).to_numpy()
    np.testing.assert_allclose(got, exp, rtol=1e-12)


# ---------------------------------------------------------------- formats

def test_fix_format_conversions(spark):
    pdf = pd.DataFrame({
        "d": ["2024-03-28", "28/03/2024", "garbage", None],
        "n": ["42", "3.5", "junk", None],
        "i": ["7", "7.0", "7.5", None],
        "b": ["yes", "0", "maybe", None],
        "p": ["555-867-5309", "12345", "(02) 1234 5678", None],
        "e": ["a@b.co", "bad-email", "c@d.org", None],
    })
    df = spark.createDataFrame(pdf)
    fixed, _ = fixes.fix_format(df, {
        "d": "date", "n": "number", "i": "integer", "b": "boolean",
        "p": "phone", "e": "email",
    }, strategy="auto")
    out = {r: list(fixed.select(r).toPandas()[r]) for r in pdf.columns}
    assert pd.isna(out["d"][2]) and out["d"][0] is not None and out["d"][1] is not None
    assert out["n"][:2] == [42.0, 3.5] and pd.isna(out["n"][2])
    assert out["i"][:2] == [7, 7] and pd.isna(out["i"][2])
    assert out["b"][:2] == [True, False] and pd.isna(out["b"][2])
    assert out["p"][:3] == ["5558675309", None, "0212345678"]
    assert out["e"][:3] == ["a@b.co", None, "c@d.org"]  # auto → nulled
    # nulls stay null everywhere
    assert all(pd.isna(out[c][3]) for c in pdf.columns)


def test_fix_text_normalize_truncate_drop(spark):
    pdf = pd.DataFrame({"t": ["  a   lot \t of   space  ", "x" * 100, "ab", None]})
    df = spark.createDataFrame(pdf)
    fixed, _ = fixes.fix_text(df, "t", min_length=3, max_length=20)
    vals = [r["t"] for r in fixed.collect()]
    assert "a lot of space" in vals
    assert "x" * 20 in vals
    assert "ab" not in vals       # below min → dropped
    assert None in vals           # nulls pass through (missingness is separate)
    assert len(vals) == 3


# ---------------------------------------------------------------- sequences

def test_fix_sequences_then_recheck_clean(spark):
    spec = GenSpec(n_rows=8_000, n_parts=4, seed=11, defects=DefectSpec())
    df = generate_sequences(spark, spec)
    cfg = EngineConfig(vocab_size=spec.vocab_size, allowed_sources=tuple(spec.sources))

    before = ValidationEngine(cfg).run(df, persist=False)
    row_checks = {
        "null_doc_id", "null_tokens", "null_n_tok", "null_source", "ntok_mismatch",
        "token_out_of_range", "empty_tokens", "doc_id_format", "rogue_source",
        "doc_id_duplicate", "duplicate_tokens",
    }
    n_before = before.violations.where(F.col("check_name").isin(list(row_checks))).count()
    assert n_before > 0, "fixture must plant row-level defects"

    fixed, plan = fixes.fix_sequences(df, cfg)
    after = ValidationEngine(cfg).run(fixed, persist=False)
    n_after = after.violations.where(F.col("check_name").isin(list(row_checks))).count()
    assert n_after == 0
    # every surviving row is intact and unique
    assert fixed.count() == fixed.select("doc_id").distinct().count()
    assert fixed.where(F.col("n_tok") != F.size("tokens")).count() == 0


def test_job_cli_fix_flag(spark, tmp_path, capsys):
    from ultragendataset_datachecker_spark import job

    rc = job.main([
        "--generate", "6000", "--generate-parts", "4",
        "--input", str(tmp_path / "seq"), "--output", str(tmp_path / "out"),
        "--fix", "--report-html", str(tmp_path / "report.html"),
    ])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["fixed"]["rows"] > 0
    assert summary["fixed"]["rows"] <= summary["rows_validated"]
    # fixed run emits strictly fewer violations
    assert summary["fixed"]["violations"] < summary["violations"]
    html = (tmp_path / "report.html").read_text()
    assert "Overall score" in html and "Per-partition scores" in html
    import pyspark.sql

    fixed_tbl = spark.read.parquet(str(tmp_path / "out" / "fixed_data"))
    assert fixed_tbl.count() == summary["fixed"]["rows"]


# ------------------------------------------- distribution transforms (F13/F14)

def _np_boxcox(x, lam):
    return np.log(x) if abs(lam) < 1e-12 else (x ** lam - 1.0) / lam


def _np_yeojohnson(x, lam):
    out = np.empty_like(x, dtype=float)
    pos, neg = x >= 0, x < 0
    out[pos] = np.log1p(x[pos]) if abs(lam) < 1e-12 else ((x[pos] + 1) ** lam - 1) / lam
    out[neg] = (
        -np.log1p(-x[neg]) if abs(lam - 2) < 1e-12
        else -(((1 - x[neg]) ** (2 - lam)) - 1) / (2 - lam)
    )
    return out


def _np_best_lambda(x, grid, kind):
    """Independent brute-force profile-LL maximizer (Box & Cox 1964 eq. 8 /
    Yeo & Johnson 2000 §3) — the oracle for the fused-aggregate grid search."""
    x = x[~np.isnan(x)]
    n = len(x)
    jac = np.sum(np.log(x)) if kind == "boxcox" else np.sum(np.sign(x) * np.log1p(np.abs(x)))
    best, best_ll = None, -np.inf
    for lam in grid:
        y = _np_boxcox(x, lam) if kind == "boxcox" else _np_yeojohnson(x, lam)
        var = y.var()  # population
        if var <= 0 or not np.isfinite(var):
            continue
        ll = -n / 2.0 * np.log(var) + (lam - 1.0) * jac
        if ll > best_ll:
            best, best_ll = lam, ll
    return best


@pytest.fixture(scope="module")
def transform_pdf():
    rng = np.random.RandomState(7)
    return pd.DataFrame({
        "lognorm_pos": np.exp(rng.normal(0, 1, 400)) + 0.5,   # right-skewed, >0
        "with_negs": rng.normal(0, 5, 400) ** 3 / 25.0,        # skewed, mixed sign
        "mild_pos": rng.gamma(20, 1.0, 400) + 1.0,             # mild skew, >0
    })


def test_transform_log_sqrt_exact(spark, transform_pdf):
    df = spark.createDataFrame(transform_pdf)
    logged, plan = fixes.transform_distribution(df, columns=["lognorm_pos"], method="log")
    assert plan["columns"]["lognorm_pos"]["method"] == "log"
    got = np.sort(logged.select("lognorm_pos").toPandas()["lognorm_pos"].to_numpy())
    want = np.sort(np.log1p(transform_pdf["lognorm_pos"].to_numpy()))
    np.testing.assert_allclose(got, want, rtol=1e-12)

    rooted, _ = fixes.transform_distribution(df, columns=["mild_pos"], method="sqrt")
    got = np.sort(rooted.select("mild_pos").toPandas()["mild_pos"].to_numpy())
    np.testing.assert_allclose(got, np.sort(np.sqrt(transform_pdf["mild_pos"])), rtol=1e-12)


def test_transform_auto_selection_matches_reference_rules(spark, transform_pdf):
    df = spark.createDataFrame(transform_pdf)
    _, plan = fixes.transform_distribution(df, method="auto")
    # data_distribution.py:203-218: skew>1 & positive -> log; mixed sign -> YJ;
    # moderate & positive -> boxcox
    assert plan["columns"]["lognorm_pos"]["method"] == "log"
    assert plan["columns"]["with_negs"]["method"] == "yeojohnson"
    assert plan["columns"]["mild_pos"]["method"] == "boxcox"


def test_transform_lambda_matches_bruteforce_mle(spark, transform_pdf):
    df = spark.createDataFrame(transform_pdf)
    grid = fixes.TRANSFORM_LAMBDA_GRID
    bc, plan_bc = fixes.transform_distribution(df, columns=["mild_pos"], method="boxcox")
    want = _np_best_lambda(transform_pdf["mild_pos"].to_numpy(), grid, "boxcox")
    assert plan_bc["columns"]["mild_pos"]["lambda"] == pytest.approx(want)
    got = np.sort(bc.select("mild_pos").toPandas()["mild_pos"].to_numpy())
    np.testing.assert_allclose(
        got, np.sort(_np_boxcox(transform_pdf["mild_pos"].to_numpy(), want)), rtol=1e-9)

    yj, plan_yj = fixes.transform_distribution(df, columns=["with_negs"], method="yeojohnson")
    want = _np_best_lambda(transform_pdf["with_negs"].to_numpy(), grid, "yeojohnson")
    assert plan_yj["columns"]["with_negs"]["lambda"] == pytest.approx(want)
    got = np.sort(yj.select("with_negs").toPandas()["with_negs"].to_numpy())
    np.testing.assert_allclose(
        got, np.sort(_np_yeojohnson(transform_pdf["with_negs"].to_numpy(), want)),
        rtol=1e-9, atol=1e-9)


def test_transform_reduces_skew_and_skips_invalid(spark, transform_pdf):
    pdf = transform_pdf.copy()
    pdf.loc[::13, "lognorm_pos"] = None
    df = spark.createDataFrame(pdf)
    out, plan = fixes.transform_distribution(df, method="auto")
    res = out.toPandas()
    # nulls preserved at the same rate
    assert res["lognorm_pos"].isna().sum() == pdf["lognorm_pos"].isna().sum()
    for c in ["lognorm_pos", "with_negs"]:
        before = abs(pd.Series(transform_pdf[c]).skew())
        after = abs(res[c].skew())
        assert after < before, f"{c}: skew {before} -> {after}"
    # log/boxcox refused on a non-positive column (reference: skip, unchanged)
    unchanged, plan2 = fixes.transform_distribution(df, columns=["with_negs"], method="log")
    assert "with_negs" not in plan2["columns"]
    pd.testing.assert_frame_equal(
        unchanged.toPandas().sort_index(axis=1), df.toPandas().sort_index(axis=1))


# ---------------------------------------------------------------- balance fix

@pytest.fixture(scope="module")
def balance_df(spark):
    rows = (
        [("a", i, float(i)) for i in range(100)]
        + [("b", 1000 + i, float(i)) for i in range(40)]
        + [("c", 2000 + i, float(i)) for i in range(10)]
        + [(None, 9000, 0.0)]
    )
    return spark.createDataFrame(rows, "cls string, id long, x double").persist()


def test_balance_undersample_auto(spark, balance_df):
    out, plan = fixes.fix_balance(balance_df, "cls", method="undersample")
    counts = {r["cls"]: r["n"] for r in out.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 10, "b": 10, "c": 10}  # min class; null labels dropped
    assert plan["classes"]["a"] == {"before": 100, "target": 10}


def test_balance_oversample_auto_and_dict(spark, balance_df):
    out, _ = fixes.fix_balance(balance_df, "cls", method="oversample")
    counts = {r["cls"]: r["n"] for r in out.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 100, "b": 100, "c": 100}
    # dict targets, including one BELOW the class count (keeps reps=0 rows out)
    out2, _ = fixes.fix_balance(
        balance_df, "cls", method="oversample", sampling_strategy={"a": 30, "b": 55, "c": 25})
    counts2 = {r["cls"]: r["n"] for r in out2.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    # reference semantics: oversample never removes rows (n < count -> keep all)
    assert counts2 == {"a": 100, "b": 55, "c": 25}


def test_balance_deterministic_across_parallelism(spark, balance_df):
    a = fixes.fix_balance(balance_df.repartition(1), "cls", method="undersample")[0]
    b = fixes.fix_balance(balance_df.repartition(16), "cls", method="undersample")[0]
    ids_a = sorted(r["id"] for r in a.select("id").collect())
    ids_b = sorted(r["id"] for r in b.select("id").collect())
    assert ids_a == ids_b


def test_balance_approx_path_is_shuffle_free(spark, balance_df):
    out, _ = fixes.fix_balance(balance_df, "cls", method="undersample", exact=False)
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    counts = {r["cls"]: r["n"] for r in out.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    assert counts.get("c", 0) == 10  # target == class count -> kept in full
    assert 0 < counts.get("a", 0) <= 40  # ~10 expected of 100 at frac 0.1


def test_balance_smote_interpolates(spark, balance_df):
    out, plan = fixes.fix_balance(balance_df, "cls", method="smote")
    assert plan["method"] == "smote" and "note" not in plan
    res = out.toPandas()
    counts = res["cls"].value_counts(dropna=True).to_dict()
    assert counts == {"a": 100, "b": 100, "c": 100}
    # originals all survive; synthetics are convex combinations, so every x
    # stays inside its class's [min, max] envelope
    base = balance_df.toPandas()
    for cls, lo, hi in [("b", 0.0, 39.0), ("c", 0.0, 9.0)]:
        got_ids = set(res[res.cls == cls]["id"])
        assert set(base[base.cls == cls]["id"]) <= got_ids
        xs = res[res.cls == cls]["x"]
        assert xs.between(lo, hi).all()
        assert xs.nunique() > base[base.cls == cls]["x"].nunique()  # truly new values
    # deterministic across parallelism
    out2, _ = fixes.fix_balance(balance_df.repartition(16), "cls", method="smote")
    lab = res[res.cls.notna()]
    lab2 = out2.toPandas().pipe(lambda p: p[p.cls.notna()])
    a = sorted(map(tuple, lab[["cls", "x"]].to_numpy().tolist()))
    b2 = sorted(map(tuple, lab2[["cls", "x"]].to_numpy().tolist()))
    assert a == b2


def test_balance_smote_fallback_and_single_class_noop(spark, balance_df):
    # no numeric features -> reference-style fallback to plain oversampling
    strings_only = balance_df.select("cls", F.col("id").cast("string").alias("sid"))
    out, plan = fixes.fix_balance(strings_only, "cls", method="smote")
    assert "fallback" in plan["note"]
    counts = {r["cls"]: r["n"] for r in out.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 100, "b": 100, "c": 100}
    single = balance_df.where(F.col("cls") == "a")
    same, _ = fixes.fix_balance(single, "cls")
    assert same.count() == single.count()


def test_balance_exact_rank_is_distributed_and_hot_class_correct(spark):
    # One giant class + two small ones, forced across many range
    # partitions: with exact_window_threshold=0 (any class counts as big)
    # exact mode must (a) never partition a window by the class column
    # alone (the one-task-per-class funnel the distributed rank replaces),
    # (b) select exactly the lowest-ranked ids per class, identically to
    # the small-scale window path.
    rows = (
        [("hot", i) for i in range(5000)]
        + [("warm", 100_000 + i) for i in range(40)]
        + [("cold", 200_000 + i) for i in range(7)]
    )
    df = spark.createDataFrame(rows, "cls string, id long").repartition(16)
    out, plan = fixes.fix_balance(
        df, "cls", method="undersample", order_columns=["id"], hash_order=False,
        exact_window_threshold=0)
    by_cls = {}
    for r in out.collect():
        by_cls.setdefault(r["cls"], []).append(r["id"])
    assert sorted(by_cls["hot"]) == list(range(7))        # lowest 7 ids
    assert sorted(by_cls["warm"]) == list(range(100_000, 100_007))
    assert sorted(by_cls["cold"]) == list(range(200_000, 200_007))
    plan_str = out._jdf.queryExecution().executedPlan().toString()
    # the window is partitioned by the range-partition id (_pid leads the
    # windowspecdefinition), never by the class column alone
    assert "_pid" in plan_str
    assert "windowspecdefinition(cls" not in plan_str

    # both exact paths must make the SAME selection
    windowed, _ = fixes.fix_balance(
        df, "cls", method="undersample", order_columns=["id"], hash_order=False)
    assert sorted(r["id"] for r in windowed.collect()) == \
        sorted(i for ids in by_cls.values() for i in ids)

    # oversample on the same frame: exact targets, replicated multiset
    over, _ = fixes.fix_balance(
        df, "cls", method="oversample", order_columns=["id"], hash_order=False,
        exact_window_threshold=0)
    counts = {r["cls"]: r["n"]
              for r in over.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    assert counts == {"hot": 5000, "warm": 5000, "cold": 5000}
    # cold: 7 rows -> 714 full copies (5000 // 7) + remainder 2 on the two
    # lowest-ranked ids
    cold = over.where(F.col("cls") == "cold").groupBy("id").agg(
        F.count("*").alias("n")).collect()
    reps = {r["id"]: r["n"] for r in cold}
    assert reps[200_000] == 715 and reps[200_001] == 715
    assert all(v == 714 for k, v in reps.items() if k >= 200_002)
