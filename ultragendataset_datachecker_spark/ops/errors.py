"""Error-message clustering (the reference's "error learning" analyzer).

Reference semantics (app.py:1262-1307 ``_cluster_similar_errors``): each
error message is reduced to its keyword set — lowercase whitespace tokens
strictly longer than 3 characters (app.py:1269-1270) — and greedily
assigned to the first existing cluster whose accumulated keyword set has
Jaccard similarity > 0.3 (app.py:1279-1283), else it seeds a new cluster.

That algorithm is ORDER-DEPENDENT (cluster keyword unions grow as messages
stream in), which makes it both non-deterministic under Spark's partitioning
and impossible to compute without a serial pass. The Spark-first
re-expression below keeps the same notion of similarity — keyword-set
Jaccard with the same tokenization and the same strict > threshold — but
replaces the greedy online assignment with the transitive closure of the
pairwise-similarity graph (connected components), which is deterministic,
partitioning-invariant, and a strictly coarser grouping than ANY greedy
order (two messages the reference would co-cluster are always Jaccard-linked
through the cluster's keyword union, so they land in one component here).

Scale shape: error logs repeat the same rendered message millions of times,
so the corpus is first collapsed to DISTINCT normalized messages (exact
hash-groupBy, carrying a count) and only distinct templates enter the
pairwise stage. The pairwise stage is the inverted-index pattern from
ops/dedup.py — (word -> message) index, self-join inside a word, count
intersections — never an all-pairs cross join; ``max_word_freq`` caps the
document frequency a word may have and still generate candidates (a word
shared by k messages emits k^2 candidate rows), trading recall on
ubiquitous words ("value", "invalid") for a hard quadratic bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ultragendataset_datachecker_spark.ops.graph import connected_components

__all__ = ["error_keywords", "cluster_error_messages", "error_cluster_summary"]


def error_keywords(
    df: DataFrame,
    id_col: str,
    message_col: str,
    min_word_len: int = 4,
) -> DataFrame:
    """(id, word) exploded keyword rows + (id, n_kw) set sizes.

    Tokenization matches the reference (app.py:1269-1270): lowercase,
    whitespace split, keep words of length >= ``min_word_len`` (the
    reference's ``len(w) > 3``), set semantics (distinct per message).
    """
    words = F.array_distinct(
        F.filter(
            F.split(F.lower(F.trim(F.col(message_col))), r"\s+"),
            lambda w: F.length(w) >= min_word_len,
        )
    )
    return df.select(F.col(id_col).alias("_id"), words.alias("_kw"))


def cluster_error_messages(
    df: DataFrame,
    id_col: str,
    message_col: str,
    threshold: float = 0.3,
    min_word_len: int = 4,
    max_word_freq: int | None = 256,
) -> DataFrame:
    """Cluster error messages by keyword-set Jaccard similarity.

    Returns one row per input id: (id_col, cluster_id) where cluster_id is
    the minimum id of the message's similarity component. Messages similar
    to nothing (including empty-keyword messages — the reference's
    ``similarity = 0`` branch, app.py:1279) form singleton clusters keyed by
    their own id.

    Jaccard uses the strict ``> threshold`` of the reference
    (app.py:1281). ``max_word_freq=None`` opts into uncapped candidates
    (quadratic in the hottest word's message frequency).
    """
    kw = error_keywords(df, id_col, message_col, min_word_len).persist()
    sizes = kw.select("_id", F.size("_kw").alias("_n"))
    index = kw.select("_id", F.explode("_kw").alias("_w"))

    if max_word_freq is not None:
        hot = (
            index.groupBy("_w")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= max_word_freq)
            .select("_w")
        )
        index = index.join(hot, "_w")

    left = index.select(F.col("_w"), F.col("_id").alias("id_a"))
    right = index.select(F.col("_w"), F.col("_id").alias("id_b"))
    inter = (
        left.join(right, "_w")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_inter"))
    )
    pairs = (
        inter.join(sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb")), "id_b")
        .withColumn(
            "_jac",
            F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter")),
        )
        .where(F.col("_jac") > threshold)
        .select("id_a", "id_b")
    )

    cc = connected_components(pairs, src="id_a", dst="id_b")
    out = (
        df.select(F.col(id_col).alias("_id"))
        .join(cc.withColumnRenamed("vertex", "_id"), "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("component"), F.col("_id")).alias("cluster_id"),
        )
    )
    kw.unpersist()
    return out


def error_cluster_summary(
    df: DataFrame,
    id_col: str,
    message_col: str,
    type_col: str | None = None,
    count_col: str | None = None,
    threshold: float = 0.3,
    min_word_len: int = 4,
    max_word_freq: int | None = 256,
) -> DataFrame:
    """Ranked cluster report: (cluster_id, n_messages, n_types?, example).

    Mirrors the reference's report shape (app.py:1506-1513: per-cluster
    count, error-type histogram, an example message) ranked by descending
    count (app.py:1574-1576). ``count_col`` lets a pre-collapsed distinct-
    message frame carry exact occurrence counts; absent, every row counts 1.
    The example is the message of the minimum id — deterministic, unlike
    the reference's "last seen".
    """
    clusters = cluster_error_messages(
        df, id_col, message_col, threshold, min_word_len, max_word_freq
    )
    joined = df.join(clusters, id_col)
    weight = F.col(count_col) if count_col else F.lit(1)
    aggs = [
        F.sum(weight).cast("long").alias("n_messages"),
        F.min(F.struct(F.col(id_col), F.col(message_col))).alias("_first"),
    ]
    if type_col:
        aggs.append(F.countDistinct(F.col(type_col)).alias("n_types"))
    out = joined.groupBy("cluster_id").agg(*aggs)
    cols = ["cluster_id", "n_messages"] + (["n_types"] if type_col else []) + [
        F.col(f"_first.{message_col}").alias("example")
    ]
    return out.select(*cols).orderBy(F.desc("n_messages"), "cluster_id")
