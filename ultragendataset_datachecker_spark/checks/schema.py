"""Table-level schema contract validation — fail fast before any scan.

The reference validates column EXISTENCE lazily inside each check
(/root/reference/dataset_checker/checks/data_format.py:33-36 raises
``ValueError("Column ... not found")``; checker.py re-raises per check).
At 10^12 rows that is the wrong time to find out: a missing/mistyped column
should abort BEFORE the engine launches a multi-hour scan, with one message
listing every deviation — not the first AnalysisException Catalyst happens
to hit.

This check is pure metadata (``df.schema``): zero Spark jobs, zero cost at
any scale. The contract mirrors BASELINE's input hint — an Iceberg table of
``(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)`` plus
the physical partition column — but Iceberg/Parquet writers legitimately
widen integers (int32 vs int64) and Spark reads both, so the default
contract accepts any integral width ("lenient"); ``strict=True`` pins the
exact Iceberg types.

Violations reuse the engine's violation-row shape (check_name/observed/
expected) with ``doc_id=NULL, part=NULL`` so report sinks can carry them
alongside row violations.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ultragendataset_datachecker_spark.config import EngineConfig

# integral widths Iceberg/Parquet/Spark interchange freely
_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


@dataclass(frozen=True)
class ColumnContract:
    """One column's expected shape.

    ``dtype`` is a Spark DDL type string (``"string"``, ``"array<int>"``).
    ``lenient_integral=True`` widens every integral position in the type
    (top-level or array element) to accept byte/short/int/long.
    """

    name: str
    dtype: str
    required: bool = True
    lenient_integral: bool = True


class SchemaValidationError(ValueError):
    """Raised by validate_schema(strict-mode) — message lists EVERY deviation."""

    def __init__(self, violations: list[dict]):
        self.violations = violations
        lines = "; ".join(
            f"{v['check_name']}({v['column']}): got {v['observed']}, want {v['expected']}"
            for v in violations
        )
        super().__init__(f"input schema violates the contract: {lines}")


def default_contract(cfg: EngineConfig) -> list[ColumnContract]:
    """The engine's input contract (BASELINE input_hint + partition col)."""
    return [
        ColumnContract("doc_id", "string"),
        ColumnContract("tokens", "array<int>"),
        ColumnContract("n_tok", "int"),
        ColumnContract("source", "string"),
        ColumnContract(cfg.partition_col, "int"),
    ]


def _type_matches(actual: T.DataType, expected: T.DataType, lenient: bool) -> bool:
    if lenient and isinstance(expected, _INTEGRAL):
        return isinstance(actual, _INTEGRAL)
    if isinstance(expected, T.ArrayType):
        return isinstance(actual, T.ArrayType) and _type_matches(
            actual.elementType, expected.elementType, lenient
        )
    if isinstance(expected, T.StructType):
        if not isinstance(actual, T.StructType) or len(actual) != len(expected):
            return False
        return all(
            a.name == e.name and _type_matches(a.dataType, e.dataType, lenient)
            for a, e in zip(actual.fields, expected.fields)
        )
    return actual == expected


def schema_violations(
    df: DataFrame,
    contract: list[ColumnContract],
    allow_extra_columns: bool = True,
) -> list[dict]:
    """Compare ``df.schema`` against the contract. Driver-side metadata only.

    Returns one dict per deviation:
      {"check_name": "missing_column"|"type_mismatch"|"extra_column",
       "column": str, "observed": str, "expected": str}
    """
    actual = {f.name: f.dataType for f in df.schema.fields}
    out: list[dict] = []
    for c in contract:
        want = T._parse_datatype_string(c.dtype)
        if c.name not in actual:
            if c.required:
                out.append({
                    "check_name": "missing_column", "column": c.name,
                    "observed": "absent", "expected": c.dtype,
                })
            continue
        if not _type_matches(actual[c.name], want, c.lenient_integral):
            out.append({
                "check_name": "type_mismatch", "column": c.name,
                "observed": actual[c.name].simpleString(), "expected": c.dtype,
            })
    if not allow_extra_columns:
        declared = {c.name for c in contract}
        for name, dt in actual.items():
            if name not in declared:
                out.append({
                    "check_name": "extra_column", "column": name,
                    "observed": dt.simpleString(), "expected": "column not in contract",
                })
    return out


def validate_schema(
    df: DataFrame,
    cfg: EngineConfig,
    contract: list[ColumnContract] | None = None,
    allow_extra_columns: bool = True,
    raise_on_violation: bool = True,
) -> list[dict]:
    """Validate the input table's schema against the engine contract.

    Called by ``ValidationEngine.run`` before the first scan when
    ``cfg.enforce_schema`` — one driver-side metadata pass so a contract
    break surfaces as ONE complete SchemaValidationError instead of an
    AnalysisException deep in pass 1 (or a silently-wrong column pick).
    """
    v = schema_violations(df, contract or default_contract(cfg), allow_extra_columns)
    if v and raise_on_violation:
        raise SchemaValidationError(v)
    return v
