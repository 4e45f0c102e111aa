"""Metric-history anomaly detection — flag runs whose metrics broke trend.

The reference validates one snapshot at a time; its only cross-run signal
is the drift check against ONE pinned baseline
(/root/reference/dataset_checker/checks/drift.py via checker.py:100-116).
This module adds the longitudinal complement (the Deequ
``AnomalyDetection`` shape, re-expressed Spark-first): given a HISTORY of
metric observations — one row per (series, run) where a series is e.g.
(partition, check_name) and runs are validation executions over time —
flag the runs whose value broke from the series' own trailing history.

Strategy set (built via the :class:`A` factories, mirroring
``constraints.C``):

- ``absolute_change(max_delta)``  — |v_t − v_{t−1}| ≤ max_delta
- ``relative_change(max_ratio)``  — |v_t / v_{t−1} − 1| ≤ max_ratio
- ``zscore(threshold, window)``   — |v_t − mean(prior w)| ≤ threshold ·
  stddev_samp(prior w), evaluated only once ``min_history`` prior points
  exist

Scale notes (the 10^12-row plan): the history frame is METADATA-sized —
O(runs × partitions × metrics), never O(corpus rows) — but at 10^6 Iceberg
partitions × dozens of metrics × hundreds of runs it is still a billions-row
frame no driver should hold. Everything here is window functions over ONE
hash exchange on the series key (many distinct (grp, check_name) keys →
well-spread; each window partition is O(runs), trivially in-memory);
every strategy reuses the same partitioning+sort, so extra strategies add
Window operators but no extra shuffle. No collect anywhere.

Determinism: rows inside a window are ordered by ``run_col``, so run ids
must be UNIQUE per series (append-once history; re-validations should
overwrite their run's rows) — with ties the lag/frame contents would be
nondeterministic. Observed values are quantized to 6 dp BEFORE the window
statistics (and baselines/bands to 6 dp before the band comparison), the
same FP merge-order policy as ``ConstraintSuite.evaluate``.

Null policy (tri-state ``is_anomaly``): a run with insufficient history
(no previous point / fewer than ``min_history`` trailing points / zero or
null denominator) is NOT evaluable — ``is_anomaly`` is null there, never a
silent pass or fail.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_LEVELS = ("error", "warning")


@dataclass(frozen=True)
class AnomalyStrategy:
    """One detection rule over a metric series. Build via :class:`A`."""

    name: str
    kind: str  # "absolute" | "relative" | "zscore"
    param: float
    window: int = 0  # trailing points for zscore
    min_history: int = 1
    level: str = "error"

    def __post_init__(self) -> None:
        if self.level not in _LEVELS:
            raise ValueError(f"level must be one of {_LEVELS}, got {self.level!r}")
        if self.kind in ("absolute", "relative") and self.param < 0:
            raise ValueError(f"{self.name}: negative tolerance {self.param}")
        if self.kind == "zscore":
            if self.window < 2:
                raise ValueError(f"{self.name}: zscore window must be >= 2")
            if not 2 <= self.min_history <= self.window:
                raise ValueError(
                    f"{self.name}: min_history must be in [2, window={self.window}]"
                )


class A:
    """Strategy factories (the public construction surface)."""

    @staticmethod
    def absolute_change(max_delta: float, level: str = "error") -> AnomalyStrategy:
        """|v_t − v_{t−1}| ≤ max_delta (not evaluable on the first run)."""
        return AnomalyStrategy(
            name=f"absolute_change({max_delta})", kind="absolute",
            param=float(max_delta), level=level,
        )

    @staticmethod
    def relative_change(max_ratio: float, level: str = "error") -> AnomalyStrategy:
        """|v_t / v_{t−1} − 1| ≤ max_ratio (not evaluable on the first run
        or when the previous value is 0)."""
        return AnomalyStrategy(
            name=f"relative_change({max_ratio})", kind="relative",
            param=float(max_ratio), level=level,
        )

    @staticmethod
    def zscore(
        threshold: float = 3.0, window: int = 10, min_history: int = 3,
        level: str = "error",
    ) -> AnomalyStrategy:
        """|v_t − mean(prior ≤window)| ≤ threshold · stddev_samp(prior) once
        ``min_history`` prior points exist (sample stddev — ddof=1, the
        engine's convention throughout)."""
        return AnomalyStrategy(
            name=f"zscore({threshold},w={window})", kind="zscore",
            param=float(threshold), window=int(window),
            min_history=int(min_history), level=level,
        )


def _q6(col):
    return F.round(col.cast("double"), 6)


def detect_anomalies(
    history: DataFrame,
    strategies: list[AnomalyStrategy],
    run_col: str = "run_id",
    series_cols: tuple[str, ...] = ("grp", "check_name"),
    value_col: str = "observed",
) -> DataFrame:
    """Evaluate every strategy over every (series, run) of the history.

    Returns one row per (series, run, strategy)::

        (*series_cols, run_col, strategy, level,
         observed double, baseline double, band double, is_anomaly int)

    ``baseline`` is the reference value the run was compared against
    (previous value for change strategies, trailing mean for zscore);
    ``band`` is the allowed absolute deviation around it; ``is_anomaly``
    is 1/0, or null where the strategy was not evaluable (see module
    docstring). One hash exchange on the series key total; every strategy
    shares it.
    """
    if not strategies:
        raise ValueError("empty strategy list")
    names = [s.name for s in strategies]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(f"duplicate strategy names: {sorted(dupes)}")
    reserved = {"strategy", "level", "baseline", "band", "is_anomaly"}
    clash = reserved & set(history.columns)
    if clash:
        raise ValueError(f"history already has reserved columns: {sorted(clash)}")

    keys = [F.col(c) for c in series_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(run_col))
    v = F.col("_v")

    # each distinct window aggregate lands ONCE as a named column (referencing
    # the raw expressions from several struct fields would expand each into
    # its own window expression — N copies of every frame walk); one shared
    # lag serves every change strategy, one (count, avg, stddev) triple per
    # distinct zscore frame
    wcols: dict[str, Column] = {}
    need_lag = any(s.kind in ("absolute", "relative") for s in strategies)
    if need_lag:
        wcols["_prev"] = F.lag(v).over(w)
    zframes: dict[int, tuple[str, str, str]] = {}
    for s in strategies:
        if s.kind == "zscore" and s.window not in zframes:
            trail = w.rowsBetween(-s.window, -1)
            names = (f"_np{s.window}", f"_mu{s.window}", f"_sd{s.window}")
            wcols[names[0]] = F.count(v).over(trail)
            wcols[names[1]] = F.avg(v).over(trail)
            wcols[names[2]] = F.stddev_samp(v).over(trail)
            zframes[s.window] = names
    staged = history.select(
        *series_cols, run_col, _q6(F.col(value_col)).alias("_v")
    ).select("*", *[c.alias(n) for n, c in wcols.items()])

    structs = []
    for s in strategies:
        if s.kind in ("absolute", "relative"):
            prev = F.col("_prev")
            if s.kind == "absolute":
                baseline, band = prev, F.lit(s.param)
            else:
                baseline = prev
                # zero previous value → relative change undefined → null band
                band = F.when(prev != 0, F.abs(prev) * F.lit(s.param))
        else:  # zscore
            np_, mu, sd = (F.col(n) for n in zframes[s.window])
            baseline = F.when(np_ >= s.min_history, mu)
            band = F.lit(s.param) * sd
        baseline6, band6 = _q6(baseline), _q6(band)
        is_anom = F.when(
            baseline6.isNotNull() & band6.isNotNull(),
            (F.abs(v - baseline6) > band6).cast("int"),
        )
        structs.append(
            F.struct(
                F.lit(s.name).alias("strategy"),
                F.lit(s.level).alias("level"),
                baseline6.alias("baseline"),
                band6.alias("band"),
                is_anom.alias("is_anomaly"),
            )
        )

    return staged.select(
        *series_cols, run_col, v.alias("observed"), F.array(*structs).alias("_s")
    ).select(
        *series_cols, run_col, "observed", F.explode("_s").alias("_r")
    ).select(*series_cols, run_col, "observed", "_r.*")


def latest_anomalies(
    result: DataFrame,
    run_col: str = "run_id",
    series_cols: tuple[str, ...] = ("grp", "check_name"),
) -> DataFrame:
    """Restrict a :func:`detect_anomalies` frame to each series' LATEST run
    — the "gate the run that just finished" view. Reuses the same series
    partitioning (max over a window, then filter); no extra action."""
    w = Window.partitionBy(*[F.col(c) for c in series_cols])
    return (
        result.withColumn("_max_run", F.max(F.col(run_col)).over(w))
        .where(F.col(run_col) == F.col("_max_run"))
        .drop("_max_run")
    )


def anomaly_verdicts(
    result: DataFrame,
    run_col: str = "run_id",
    series_cols: tuple[str, ...] = ("grp", "check_name"),
) -> DataFrame:
    """Per-(series, run) verdict: pass iff no error-level strategy flagged
    (warnings counted separately; not-evaluable strategies count as
    neither). Same rollup contract as ``ConstraintSuite.verdicts``."""
    # coalesce: a (series, run) group whose every strategy is non-evaluable
    # (is_anomaly all NULL) must count 0 anomalies and pass — a bare SUM
    # over all-NULL inputs is NULL, which leaked NULL counts/verdicts
    err = F.coalesce(
        F.sum(((F.col("level") == "error") & (F.col("is_anomaly") == 1)).cast("long")),
        F.lit(0),
    )
    warn = F.coalesce(
        F.sum(((F.col("level") == "warning") & (F.col("is_anomaly") == 1)).cast("long")),
        F.lit(0),
    )
    return result.groupBy(*series_cols, run_col).agg(
        err.alias("n_error_anomalies"),
        warn.alias("n_warning_anomalies"),
        (err == 0).cast("int").alias("run_passed"),
    )
