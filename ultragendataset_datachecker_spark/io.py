"""Sources and sinks (SURVEY §2.1 S1-S10).

The reference's multi-format loader/saver
(/root/reference/app.py:183-332: json/csv/parquet/arrow/txt + media folders)
re-expressed as Spark readers/writers. Arrow IPC is subsumed by parquet
(S4); media folders are ops/multimodal.read_binary_folder (S6); WebDataset
tar (S7) is out of scope for the token engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEQUENCE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
    T.StructField("part", T.IntegerType()),
])

_FORMATS = ("parquet", "json", "csv", "text")


def load_dataset(spark: SparkSession, path: str, fmt: str = "parquet",
                 schema: T.StructType | None = None) -> DataFrame:
    """S1/S2/S3/S5. CSV/JSON get the explicit sequence schema by default —
    inference would re-scan and guess types (the reference relies on pandas
    inference, SURVEY §1.3; at scale the schema is declared)."""
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "json":
        return spark.read.schema(schema or SEQUENCE_SCHEMA).json(path)
    if fmt == "csv":
        # tokens arrays are not CSV-native; accept a |-joined string column
        raw = spark.read.option("header", True).csv(path)
        if "tokens" in raw.columns:
            raw = raw.withColumn(
                "tokens",
                F.when(F.col("tokens").isNotNull() & (F.col("tokens") != ""),
                       F.split(F.col("tokens"), r"\|").cast("array<int>")),
            )
        for c, t in (("n_tok", "int"), ("part", "int")):
            if c in raw.columns:
                raw = raw.withColumn(c, F.col(c).cast(t))
        return raw
    if fmt == "text":
        return spark.read.text(path)
    raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")


def save_dataset(df: DataFrame, path: str, fmt: str = "parquet",
                 mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """S8/S9."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "json":
        w.json(path)
    elif fmt == "csv":
        out = df
        if "tokens" in df.columns:
            out = df.withColumn("tokens", F.array_join("tokens", "|"))
            w = out.write.mode(mode)
            if partition_by:
                w = w.partitionBy(*partition_by)
        w.option("header", True).csv(path)
    elif fmt == "text":
        w.text(path)
    else:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
