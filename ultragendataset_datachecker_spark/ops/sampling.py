"""Deterministic stratified sampling — exactly k rows per stratum, stable
across runs, partitionings, and engines.

Sampling for training-data curation (per-source caps, eval-set carving,
balanced subset extraction) must be reproducible: re-running the pipeline on
the same input must pick the SAME rows. Random sampling with seeds is not
stable across partitionings, so the order key here is content-derived:
md5(id) — uniform, deterministic, and computable identically in any engine
(the DuckDB oracle replays it exactly).

Scale shape: the naive plan is a window over the full table partitioned by
stratum — correct, but it sorts every row of every stratum (and a hot
stratum becomes one giant sort partition). ``scale_prefilter=True`` keeps
the window exact while shrinking its input by orders of magnitude:

1. one narrow count per stratum (partial-aggregated; O(strata) to driver),
2. keep only rows whose hash falls in the lowest ``prefilter_mult * k / n``
   fraction for their stratum — a map-side filter, no shuffle,
3. verify each stratum still has min(k, n) survivors (one tiny count; a
   shortfall needs fewer than k of n uniform hashes below 8k/n — a Chernoff
   tail around exp(-3k), i.e. already ~1e-9 at k=7 — but the check makes
   the operator EXACT, not probabilistic),
4. run the exact window on the surviving ~mult*k rows per stratum.

The survivor set is O(strata * mult * k) regardless of corpus size, so the
sort that was the scale bottleneck becomes negligible. Falls back to the
full window on shortfall.

Beyond-reference operator (the reference's sampling is pandas
DataFrame.sample at app.py scale); SURVEY W4's seeded-sampling analogue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_U32 = 1 << 32


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
    scale_prefilter: bool = False,
    prefilter_mult: float = 8.0,
) -> DataFrame:
    """Exactly min(k, stratum size) rows per stratum, deterministically.

    Output = input columns + ``sample_rank`` (1-based within stratum, by
    ascending md5(id) with id tiebreak).
    """
    key = F.md5(F.col(id_col).cast("string"))
    src = df

    if scale_prefilter:
        # u32 view of the top of the hash: lexicographic order on the full
        # hex string refines numeric order on the first 8 hex chars, so a
        # threshold on u keeps a PREFIX of the final sort order per stratum.
        u = F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
        counts = df.groupBy(strata_col).count().collect()  # O(strata) rows
        thr = {
            r[strata_col]: min(_U32, int(_U32 * prefilter_mult * k / r["count"]) + 1)
            if r["count"] > k
            else _U32
            for r in counts
            if r[strata_col] is not None
        }
        if thr:
            from pyspark.sql.types import LongType, StructField, StructType

            strata_type = df.schema[strata_col].dataType
            thr_df = df.sparkSession.createDataFrame(
                [(s, t) for s, t in thr.items()],
                schema=StructType(
                    [StructField(strata_col, strata_type), StructField("_thr", LongType())]
                ),
            )
            survivors = (
                df.join(F.broadcast(thr_df), strata_col, "left")
                .filter(u <= F.coalesce(F.col("_thr"), F.lit(_U32)))
                .drop("_thr")
                .select(*df.columns)
            )
            surv = {
                r[strata_col]: r["count"] for r in survivors.groupBy(strata_col).count().collect()
            }
            need = {r[strata_col]: min(k, r["count"]) for r in counts}
            if all(surv.get(s, 0) >= n for s, n in need.items()):
                src = survivors
            # else: fall through with src = df (exactness over speed)

    w = Window.partitionBy(strata_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        src.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )
