"""Semi-structured (JSON string) column profiling.

Event/metadata tables carry JSON blobs next to the typed columns (the
testdata's ``events.props``); production training-data pipelines validate
them like any other payload: which keys exist, how often, with what value
types, and how many rows are malformed. The reference engine validates typed
columns only; this is the semi-structured extension of its format checks
(/root/reference/data_format.py:145-300 class of rules applied INSIDE a JSON
column).

Scale shape: parse once per row with `from_json` into ``map<string,string>``
(JVM JSON parser, no Python), explode the map entries, and aggregate per key
— the shuffle is key-vocabulary-sized with map-side partial aggregation,
never row-sized. Malformed rows (parser returns NULL on non-NULL input) are
counted in the same pass and reported as the reserved key ``__malformed__``.
A deep nested-schema inference would need spark.read.json over a sample;
this profile is the always-on cheap pass that tells you whether you need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MALFORMED_KEY = "__malformed__"


def json_key_profile(df: DataFrame, json_col: str = "props") -> DataFrame:
    """Per-key profile of a JSON-string column.

    Returns (key, n_present, presence_rate, n_numeric, n_distinct):
      - ``n_present``     rows where the key exists (top level)
      - ``presence_rate`` n_present / non-null rows
      - ``n_numeric``     values castable to double
      - ``n_distinct``    exact distinct values (string form)
    plus one ``__malformed__`` row counting non-null strings the JSON parser
    rejects (its n_distinct = distinct malformed payloads).

    Top-level values are profiled in string form (map<string,string>), which
    is what a format-rule pass needs; nested objects arrive as their JSON
    text and simply profile as non-numeric.
    """
    src = df.select(F.col(json_col).alias("_j")).where(F.col("_j").isNotNull())
    parsed = src.select("_j", F.from_json("_j", "map<string,string>").alias("_m"))

    totals = parsed.agg(
        F.count(F.lit(1)).alias("_total"),
        F.sum(F.col("_m").isNull().cast("long")).alias("_bad"),
    )

    keyed = (
        parsed.where(F.col("_m").isNotNull())
        .select(F.explode("_m").alias("key", "val"))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_present"),
            F.sum(F.col("val").try_cast("double").isNotNull().cast("long")).alias("n_numeric"),
            F.countDistinct("val").alias("n_distinct"),
        )
    )
    bad = (
        parsed.where(F.col("_m").isNull())
        .agg(
            F.count(F.lit(1)).alias("n_present"),
            F.lit(0).cast("long").alias("n_numeric"),
            F.countDistinct("_j").alias("n_distinct"),
        )
        .select(F.lit(MALFORMED_KEY).alias("key"), "n_present", "n_numeric", "n_distinct")
        .where(F.col("n_present") > 0)
    )
    out = keyed.unionByName(bad).crossJoin(F.broadcast(totals))
    return out.select(
        "key",
        "n_present",
        (F.col("n_present") / F.col("_total")).alias("presence_rate"),
        "n_numeric",
        "n_distinct",
    )
