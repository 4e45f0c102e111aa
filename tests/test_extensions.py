"""User check-registry extension (ref validator registry, SURVEY §2.8)."""

from pyspark.sql import functions as F

from ultragendataset_datachecker_spark import EngineConfig, ValidationEngine
from ultragendataset_datachecker_spark.checks.violations import RowCheck


def test_extra_row_check_fused_into_violations(sequences_df, gen_spec):
    cfg = EngineConfig(vocab_size=gen_spec.vocab_size, allowed_sources=tuple(gen_spec.sources))
    check = RowCheck(
        name="ntok_over_1000",
        condition=F.col("n_tok").isNotNull() & (F.col("n_tok") > 1000),
        observed=F.col("n_tok"),
        expected="n_tok <= 1000",
    )
    res = ValidationEngine(cfg).run(sequences_df, persist=False, extra_checks=[check])
    got = {r["doc_id"] for r in res.violations.where(F.col("check_name") == "ntok_over_1000").collect()}
    # exactly the planted extreme outliers (n_tok = 5120) exceed 1000
    expected = set(gen_spec.defects.doc_ids(gen_spec.n_rows)["ntok_outlier"])
    assert got == expected
    # built-in checks unaffected
    names = {r["check_name"] for r in res.violations.select("check_name").distinct().collect()}
    assert "null_tokens" in names and "ntok_over_1000" in names
