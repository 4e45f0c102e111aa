"""Sources and sinks (SURVEY §2.1 S1-S10).

The reference's multi-format loader/saver
(/root/reference/app.py:183-332: json/csv/parquet/arrow/txt + media folders)
re-expressed as Spark readers/writers. Arrow IPC (S4) is a distributed
binaryFile scan + per-file pyarrow decode (one task per .arrow file — the
reference reads one feather file driver-side, app.py:212-214); media folders
are ops/multimodal.read_binary_folder (S6); WebDataset tar (S7) is a
binaryFile scan of .tar shards with a stdlib-tarfile decode per shard
(load_webdataset — the reference iterates one wds.WebDataset on the driver
and materializes every sample into a pandas frame, app.py:276-288).
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

_FORMATS = ("parquet", "json", "csv", "text", "arrow", "webdataset")


def load_arrow_ipc(spark: SparkSession, path: str,
                   schema: T.StructType | None = None) -> DataFrame:
    """S4: Arrow IPC / Feather files, distributed. The reference calls
    ``pyarrow.feather.read_feather`` on one file on the driver
    (app.py:212-214); here each .arrow/.feather file is a binaryFile row
    decoded by pyarrow inside mapInPandas, so a directory of IPC shards
    loads in parallel with no driver materialization. Files must share the
    target schema (pass ``schema`` or it is sniffed from the first file —
    one tiny driver-side read of a single file's header).

    One task per file: Arrow IPC has no footer-split metadata standard the
    Spark reader could use, so the parallel unit is the shard — write many
    shards (as every Arrow-emitting pipeline does) and the scan scales."""
    import glob as _glob
    import os as _os

    import pyarrow as pa
    import pyarrow.ipc as pa_ipc

    if schema is None:
        # sniff the schema from one file header driver-side (metadata only)
        pattern = path if _os.path.isfile(path) else _os.path.join(path, "*")
        files = sorted(
            f for f in _glob.glob(pattern)
            if f.endswith((".arrow", ".feather", ".ipc"))
        ) or sorted(_glob.glob(pattern))
        if not files:
            raise FileNotFoundError(f"no Arrow IPC files under {path!r}")
        with open(files[0], "rb") as fh:
            try:
                rdr = pa_ipc.open_file(fh)
            except pa.ArrowInvalid:
                fh.seek(0)
                rdr = pa_ipc.open_stream(fh)
            arrow_schema = rdr.schema
        from pyspark.sql.pandas.types import from_arrow_schema

        schema = from_arrow_schema(arrow_schema)

    bin_df = spark.read.format("binaryFile").load(path)

    def decode(batches):
        import pandas as pd  # noqa: F401 (arrow->pandas conversion)

        for pdf in batches:
            for content in pdf["content"]:
                buf = pa.BufferReader(content)
                try:
                    table = pa_ipc.open_file(buf).read_all()
                except pa.ArrowInvalid:
                    buf.seek(0)
                    table = pa_ipc.open_stream(buf).read_all()
                yield table.to_pandas()

    return bin_df.select("content").mapInPandas(decode, schema=schema)


def load_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """S7: WebDataset tar shards, distributed. The reference loops a
    ``wds.WebDataset`` iterator on the driver and builds one pandas frame of
    sample dicts (app.py:276-288) — single-node, whole-dataset-in-memory.
    Here each ``.tar`` shard is one binaryFile row decoded by the stdlib
    ``tarfile`` module inside mapInPandas, so a directory of shards loads
    with one task per shard and nothing ever lands on the driver.

    WebDataset convention: a *sample* is the group of adjacent tar members
    sharing a key (member name up to the first dot of the basename); the
    part after that dot is the field extension. Output schema is stable at
    any corpus (a per-row map, not per-extension columns):

        __key__ string, __shard__ string, data map<string, binary>

    Use :func:`webdataset_column` to project one extension out of the map
    as a typed column. The parallel unit is the shard — exactly how
    WebDataset is sharded in practice (tar files of ~1 GB), so scan
    parallelism equals shard count just like the Arrow source."""
    import io as _io
    import os as _os
    import tarfile

    # pathGlobFilter (not a driver-side isdir check) so remote storage paths
    # (s3://, hdfs://) get the same *.tar filtering as local directories —
    # an os.path probe returns False for those and would let non-tar files
    # (_SUCCESS markers, checkpoints) reach tarfile.open in executor tasks.
    # The filter applies to file names only, so direct .tar paths still load.
    bin_df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
    )

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for shard_path, content in zip(pdf["path"], pdf["content"]):
                shard = _os.path.basename(shard_path)
                keys, maps = [], []
                with tarfile.open(fileobj=_io.BytesIO(content)) as tar:
                    cur_key, cur = None, {}
                    for member in tar:
                        if not member.isfile():
                            continue
                        base = _os.path.basename(member.name)
                        if "." in base:
                            stem, ext = base.split(".", 1)
                        else:
                            stem, ext = base, ""
                        key = _os.path.join(_os.path.dirname(member.name), stem)
                        if key != cur_key and cur_key is not None:
                            keys.append(cur_key)
                            maps.append(cur)
                            cur = {}
                        cur_key = key
                        cur[ext] = tar.extractfile(member).read()
                    if cur_key is not None:
                        keys.append(cur_key)
                        maps.append(cur)
                yield pd.DataFrame(
                    {"__key__": keys, "__shard__": [shard] * len(keys), "data": maps}
                )

    return bin_df.select("path", "content").mapInPandas(
        decode, schema="__key__ string, __shard__ string, data map<string, binary>"
    )


def webdataset_column(df: DataFrame, ext: str, as_text: bool = False) -> DataFrame:
    """Project one WebDataset field extension out of the sample map as a
    column named after the extension (``cls``/``txt``/``json`` are the usual
    text-bearing fields; images/audio stay binary for ops/multimodal)."""
    col = F.col("data").getItem(ext)
    if as_text:
        col = col.cast("string")
    return df.withColumn(ext.replace(".", "_"), col)


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
    if fmt == "arrow":
        return load_arrow_ipc(spark, path, schema)
    if fmt == "webdataset":
        return load_webdataset(spark, path)
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


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) catalog table —
    the layout play for repeated large-×-large joins at 10^12 rows.

    Two tables bucketed on the SAME columns with the SAME bucket count
    hash-partition their files identically at WRITE time, so an equi-join on
    the bucket columns needs NO exchange on either side at read time (and no
    sort either, when ``sort_cols`` covers the join keys): the terabytes
    move once when written instead of on every join. This is the persisted
    counterpart of `ops/skew.salted_join`'s one-shot mitigation — use
    bucketing for dimension/fact layouts that are joined repeatedly, salting
    for ad-hoc skewed joins.

    Bucketed tables require the session catalog (`saveAsTable`), not a bare
    path — Spark records the bucket spec in the catalog and trusts it at
    plan time (asserted in tests/test_plans_ops.py: the bucketed-join plan
    contains zero Exchange operators).
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)
