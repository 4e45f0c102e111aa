"""Schema contract validation (checks/schema.py).

The reference finds a missing column only when a check touches it
(data_format.py:33-36); the engine must find every deviation up front,
driver-side, with zero Spark jobs.
"""

import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.checks.schema import (
    ColumnContract,
    SchemaValidationError,
    default_contract,
    schema_violations,
    validate_schema,
)
from ultragendataset_datachecker_spark.config import EngineConfig
from ultragendataset_datachecker_spark.engine import ValidationEngine


def test_contract_passes_on_generated_sequences(sequences_df):
    cfg = EngineConfig()
    assert validate_schema(sequences_df, cfg) == []


def test_missing_column_reported(sequences_df):
    cfg = EngineConfig()
    broken = sequences_df.drop("source")
    v = schema_violations(broken, default_contract(cfg))
    assert v == [{
        "check_name": "missing_column", "column": "source",
        "observed": "absent", "expected": "string",
    }]
    with pytest.raises(SchemaValidationError, match="missing_column.*source"):
        validate_schema(broken, cfg)


def test_all_deviations_reported_in_one_error(sequences_df):
    """One message lists EVERY deviation — not just the first."""
    cfg = EngineConfig()
    broken = sequences_df.drop("source").withColumn(
        "tokens", F.col("tokens").cast("array<string>")
    )
    with pytest.raises(SchemaValidationError) as ei:
        validate_schema(broken, cfg)
    names = {(x["check_name"], x["column"]) for x in ei.value.violations}
    assert names == {("missing_column", "source"), ("type_mismatch", "tokens")}


def test_lenient_integral_accepts_wider_ints(sequences_df):
    """Iceberg int32 vs Spark/Parquet int64: lenient (default) accepts both."""
    cfg = EngineConfig()
    widened = sequences_df.withColumn("n_tok", F.col("n_tok").cast("long")).withColumn(
        "tokens", F.col("tokens").cast("array<long>")
    )
    assert validate_schema(widened, cfg) == []
    strict = [
        ColumnContract(c.name, c.dtype, lenient_integral=False)
        for c in default_contract(cfg)
    ]
    v = schema_violations(widened, strict)
    assert {(x["check_name"], x["column"]) for x in v} == {
        ("type_mismatch", "n_tok"), ("type_mismatch", "tokens"),
    }


def test_extra_columns_flagged_only_when_disallowed(sequences_df):
    cfg = EngineConfig()
    extra = sequences_df.withColumn("debug_blob", F.lit("x"))
    assert validate_schema(extra, cfg) == []
    v = schema_violations(extra, default_contract(cfg), allow_extra_columns=False)
    assert v == [{
        "check_name": "extra_column", "column": "debug_blob",
        "observed": "string", "expected": "column not in contract",
    }]


def test_engine_fails_fast_before_any_scan(sequences_df, gen_spec):
    """ValidationEngine.run raises SchemaValidationError (not a mid-scan
    AnalysisException) on a contract break; enforce_schema=False opts out."""
    cfg = EngineConfig(
        vocab_size=gen_spec.vocab_size, allowed_sources=tuple(gen_spec.sources)
    )
    broken = sequences_df.drop("n_tok")
    with pytest.raises(SchemaValidationError, match="n_tok"):
        ValidationEngine(cfg).run(broken, persist=False)


def test_contract_respects_custom_partition_col(sequences_df, gen_spec):
    cfg = EngineConfig(partition_col="shard")
    renamed = sequences_df.withColumnRenamed("part", "shard")
    assert validate_schema(renamed, cfg) == []
    assert schema_violations(sequences_df, default_contract(cfg)) == [{
        "check_name": "missing_column", "column": "shard",
        "observed": "absent", "expected": "int",
    }]
