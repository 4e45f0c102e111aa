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


def temperature_mixture(
    df: DataFrame,
    strata_col: str,
    n_target: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    scale_prefilter: bool = False,
    prefilter_mult: float = 8.0,
) -> DataFrame:
    """Temperature-scaled mixture sampling across strata (data mixing).

    The standard multilingual / multi-source mixing rule (e.g. XLM-R §3.1,
    arXiv:1911.02116): sample stratum *s* in proportion to ``c_s**alpha``
    normalized over strata, so ``alpha=1`` keeps the natural distribution and
    ``alpha -> 0`` flattens it toward uniform, up-weighting small sources.
    Per-stratum target ``t_s = min(c_s, floor(n_target * w_s))``; exactly
    ``t_s`` rows are then drawn deterministically per stratum by ascending
    ``md5(id)`` (same content-derived order as :func:`stratified_sample`, so
    re-runs and re-partitionings pick the same rows).

    Cross-engine determinism: for the default ``alpha=0.5`` the weights are
    computed in pure *integer* arithmetic — ``a_s = isqrt(c_s)``,
    ``t_s = (n_target * a_s) div sum(a_s)`` — so an external replayer (the
    DuckDB oracle) lands on bit-identical targets; float ``alpha`` paths are
    documented as engine-internal (last-ulp boundary sensitivity in the
    normalizing sum).

    Scale shape: the target frame is O(strata) and broadcast; the per-stratum
    rank uses the same hash-prefilter trick as :func:`stratified_sample` when
    ``scale_prefilter`` is set (threshold ``mult * t_s / c_s`` per stratum),
    so the window never sorts more than ~``mult * t_s`` rows per stratum.

    Output = input columns + ``sample_rank`` (1-based within stratum).
    Rows with NULL stratum are excluded (no principled weight).
    """
    if n_target <= 0:
        raise ValueError("n_target must be positive")
    src = df.where(F.col(strata_col).isNotNull())
    counts = src.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_cnt"))
    if alpha == 0.5:
        # integer path: floor(sqrt(c)) == isqrt(c) for c < 2^52 (sqrt is
        # correctly rounded), replayable exactly in any engine
        a = F.floor(F.sqrt(F.col("_cnt").cast("double"))).cast("long")
    elif alpha == 1.0:
        a = F.col("_cnt").cast("long")
    else:
        a = F.pow(F.col("_cnt").cast("double"), F.lit(float(alpha)))
    weighted = counts.select(strata_col, "_cnt", a.alias("_a"))
    tot = weighted.agg(F.sum("_a").alias("_tot"))
    if alpha in (0.5, 1.0):
        tgt = F.expr(f"CAST({n_target} AS BIGINT) * _a DIV _tot")
    else:
        tgt = F.floor(F.lit(float(n_target)) * F.col("_a") / F.col("_tot")).cast("long")
    targets = weighted.crossJoin(F.broadcast(tot)).select(
        strata_col, "_cnt", F.least(F.col("_cnt"), tgt).alias("_tgt")
    )

    key = F.md5(F.col(id_col).cast("string"))
    ranked_src = src
    if scale_prefilter:
        rows = targets.collect()  # O(strata)
        thr = {
            r[strata_col]: min(_U32, int(_U32 * prefilter_mult * r["_tgt"] / r["_cnt"]) + 1)
            if r["_cnt"] > r["_tgt"]
            else _U32
            for r in rows
        }
        if thr:
            from pyspark.sql.types import LongType, StructField, StructType

            u = F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
            strata_type = df.schema[strata_col].dataType
            thr_df = df.sparkSession.createDataFrame(
                [(s, t) for s, t in thr.items()],
                schema=StructType(
                    [StructField(strata_col, strata_type), StructField("_thr", LongType())]
                ),
            )
            survivors = (
                src.join(F.broadcast(thr_df), strata_col, "left")
                .filter(u <= F.coalesce(F.col("_thr"), F.lit(_U32)))
                .drop("_thr")
                .select(*src.columns)
            )
            surv = {
                r[strata_col]: r["count"]
                for r in survivors.groupBy(strata_col).count().collect()
            }
            if all(surv.get(r[strata_col], 0) >= min(r["_tgt"], r["_cnt"]) for r in rows):
                ranked_src = survivors
            # else fall through to the full window (exactness over speed)

    w = Window.partitionBy(strata_col).orderBy(key.asc(), F.col(id_col).asc())
    ranked = ranked_src.withColumn("sample_rank", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(targets.select(strata_col, "_tgt")), strata_col, "inner")
        .filter(F.col("sample_rank") <= F.col("_tgt"))
        .drop("_tgt")
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/validation/test assignment by content hash.

    Appends ``split`` — each row lands in a named split with probability
    proportional to its weight, decided purely by md5(salt || id): stable
    across runs, partitionings, engines (the DuckDB oracle replays the
    arithmetic exactly), and across corpus GROWTH — adding documents never
    moves an existing document between splits, which seeded ``randomSplit``
    cannot guarantee. Zero shuffle: one codegen map stage.

    The hash's first 8 hex chars give a uniform u32; cumulative integer
    thresholds (floor of the running weight fraction) cut [0, 2^32) into
    half-open lanes, so every u32 maps to exactly one split.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    names = list(weights)
    cum, bounds = 0.0, []
    for name in names[:-1]:
        cum += float(weights[name]) / total
        bounds.append(int(_U32 * cum))
    expr = F.lit(names[-1])
    for name, b in zip(reversed(names[:-1]), reversed(bounds)):
        expr = F.when(u < F.lit(b), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)
