"""Declarative constraint suite — table-level assertions in ONE fused pass.

The reference expresses its quality gates imperatively: each check module
hard-codes its own pass criteria and the runner chains them sequentially
(/root/reference/dataset_checker/checker.py:100-116; the single global gate
is overall score >= 0.8, /root/reference/main.py:89, config.py:52). This
module generalizes that into a user-DECLARED suite (the Deequ-style
"unit tests for data" shape, re-expressed Spark-first): each
:class:`Constraint` is a (metric aggregate, bounds over the metric) pair,
and :class:`ConstraintSuite.evaluate` folds every constraint's aggregate
into one single ``rollup(group_col).agg(...)`` — one scan of the input,
map-side partial aggregation, an O(groups) exchange — then unpivots the
aggregated row into one result row per (group, constraint).

Scale notes (the 10^12-row plan):
- the whole suite costs ONE pass over the input regardless of how many
  constraints it holds (the reference pays one full pass per check);
- every built-in metric is algebraic/mergeable: count/sum/min/max/avg/
  stddev, ``approx_count_distinct`` (HLL++), ``percentile_approx``
  (mergeable sketch). ``exact=True`` on :meth:`C.distinctness` /
  :meth:`C.quantile_between` swaps in the exact forms for oracle parity at
  test scale (``count_distinct`` plans an Expand over the agg input —
  fine at dimension scale, opt-in at corpus scale);
- the unpivot (explode of a per-constraint struct array) runs on the
  O(groups) aggregated frame, never on the corpus;
- observed values are quantized to 6 dp BEFORE the bound comparison so
  floating-point merge-order noise (~1e-15 rel across parallelism levels)
  can never flip a verdict between cluster sizes — same policy as the
  engine's outlier bounds (engine.py:_outlier_stats).

Null semantics: a null metric (e.g. ``mean`` of an all-null column) FAILS
the constraint — absence of evidence is not a pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GLOBAL_GROUP = "__all__"  # rollup row marker in the result frame

_LEVELS = ("error", "warning")


@dataclass(frozen=True)
class Constraint:
    """One declarative assertion: an aggregate metric plus inclusive bounds.

    ``value`` must be a pure AGGREGATE Column expression (it is evaluated
    inside the suite's single ``agg``); ``lo``/``hi`` are inclusive bounds
    (None = unbounded on that side). ``passed`` is computed on the 6-dp
    quantized metric. Build instances via the :class:`C` factories.
    """

    name: str
    value: Column = field(repr=False)
    lo: float | None = None
    hi: float | None = None
    threshold: str = ""
    level: str = "error"
    # False when the metric uses a DISTINCT aggregate (disallowed inside a
    # streaming aggregation); streaming_constraints rejects those by name.
    streamable: bool = True

    def __post_init__(self) -> None:
        if self.level not in _LEVELS:
            raise ValueError(f"level must be one of {_LEVELS}, got {self.level!r}")
        if self.lo is None and self.hi is None:
            raise ValueError(f"constraint {self.name!r} has no bounds")

    def passed_expr(self, value6: Column) -> Column:
        ok = F.lit(True)
        if self.lo is not None:
            ok = ok & (value6 >= F.lit(float(self.lo)))
        if self.hi is not None:
            ok = ok & (value6 <= F.lit(float(self.hi)))
        return F.when(value6.isNull(), F.lit(False)).otherwise(ok)


def _frac(num: Column, den: Column) -> Column:
    """num/den as double; 0/0 -> null (fails, per the null policy)."""
    return F.when(den > 0, num.cast("double") / den.cast("double"))


class C:
    """Constraint factories (the public construction surface).

    Ratio metrics are fractions in [0, 1]; ``min_ratio``/``max_ratio`` bound
    them. Aggregate metrics bound the statistic directly.
    """

    # ---- ratio constraints ------------------------------------------------
    @staticmethod
    def completeness(col: str, min_ratio: float = 1.0, level: str = "error") -> Constraint:
        """Fraction of rows with a non-null ``col`` >= min_ratio
        (ref missing_values.py:39-47 counts the same numerator)."""
        return Constraint(
            name=f"completeness({col})",
            value=_frac(F.count(F.col(col)), F.count(F.lit(1))),
            lo=min_ratio, threshold=f">={min_ratio}", level=level,
        )

    @staticmethod
    def distinctness(
        col: str, min_ratio: float = 1.0, exact: bool = False, level: str = "error"
    ) -> Constraint:
        """distinct(col)/count(non-null col) >= min_ratio. HLL++ by default
        (mergeable, ~2% rel error); ``exact=True`` for oracle-grade answers
        at dimension scale."""
        d = F.count_distinct(F.col(col)) if exact else F.approx_count_distinct(col)
        return Constraint(
            name=f"distinctness({col})",
            value=_frac(d, F.count(F.col(col))),
            lo=min_ratio, threshold=f">={min_ratio}", level=level,
            streamable=not exact,
        )

    @staticmethod
    def unique(col: str, level: str = "error") -> Constraint:
        """Every non-null value occurs exactly once (exact count_distinct ==
        non-null count; at ratio 1.0 distinctness and exactly-once
        uniqueness coincide)."""
        c = C.distinctness(col, min_ratio=1.0, exact=True, level=level)
        return Constraint(name=f"unique({col})", value=c.value, lo=1.0,
                          threshold=">=1.0", level=level, streamable=False)

    @staticmethod
    def contained_in(
        col: str, allowed: list[str], min_ratio: float = 1.0, level: str = "error"
    ) -> Constraint:
        """Fraction of NON-NULL values inside the allowed set >= min_ratio
        (the suite form of the engine's referential check,
        checks/violations.py rogue_source)."""
        vals = [str(v) for v in allowed]
        hit = F.sum(F.col(col).isin(vals).cast("long"))
        return Constraint(
            name=f"contained_in({col})",
            value=_frac(hit, F.count(F.col(col))),
            lo=min_ratio, threshold=f">={min_ratio}", level=level,
        )

    @staticmethod
    def matches(
        col: str, pattern: str, min_ratio: float = 1.0, level: str = "error"
    ) -> Constraint:
        """Fraction of NON-NULL values matching the regex >= min_ratio
        (ref data_format.py validator registry, generalized)."""
        hit = F.sum(F.col(col).rlike(pattern).cast("long"))
        return Constraint(
            name=f"matches({col})",
            value=_frac(hit, F.count(F.col(col))),
            lo=min_ratio, threshold=f">={min_ratio}", level=level,
        )

    @staticmethod
    def satisfies(
        predicate: Column | str, name: str, min_ratio: float = 1.0, level: str = "error"
    ) -> Constraint:
        """Fraction of ALL rows where the predicate holds >= min_ratio
        (null predicate counts as not satisfied). ``predicate`` may be a
        Column or a SQL boolean expression string."""
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        hit = F.sum(F.coalesce(pred, F.lit(False)).cast("long"))
        return Constraint(
            name=f"satisfies({name})",
            value=_frac(hit, F.count(F.lit(1))),
            lo=min_ratio, threshold=f">={min_ratio}", level=level,
        )

    # ---- aggregate-bound constraints ---------------------------------------
    @staticmethod
    def row_count_between(
        lo: int | None = 1, hi: int | None = None, level: str = "error"
    ) -> Constraint:
        return Constraint(
            name="row_count", value=F.count(F.lit(1)).cast("double"),
            lo=lo, hi=hi, threshold=f"[{lo},{hi}]", level=level,
        )

    @staticmethod
    def _stat(fn, stat: str, col: str, lo, hi, level: str) -> Constraint:
        return Constraint(
            name=f"{stat}({col})", value=fn(F.col(col)).cast("double"),
            lo=lo, hi=hi, threshold=f"[{lo},{hi}]", level=level,
        )

    @staticmethod
    def mean_between(col: str, lo=None, hi=None, level: str = "error") -> Constraint:
        return C._stat(F.mean, "mean", col, lo, hi, level)

    @staticmethod
    def min_between(col: str, lo=None, hi=None, level: str = "error") -> Constraint:
        return C._stat(F.min, "min", col, lo, hi, level)

    @staticmethod
    def max_between(col: str, lo=None, hi=None, level: str = "error") -> Constraint:
        return C._stat(F.max, "max", col, lo, hi, level)

    @staticmethod
    def sum_between(col: str, lo=None, hi=None, level: str = "error") -> Constraint:
        return C._stat(F.sum, "sum", col, lo, hi, level)

    @staticmethod
    def stddev_between(col: str, lo=None, hi=None, level: str = "error") -> Constraint:
        """Sample stddev (pandas .std ddof=1, like the engine's ntok_std)."""
        return C._stat(F.stddev_samp, "stddev", col, lo, hi, level)

    @staticmethod
    def quantile_between(
        col: str, q: float, lo=None, hi=None,
        exact: bool = False, accuracy: int = 10_000, level: str = "error",
    ) -> Constraint:
        """Bound an exact (interpolated, = DuckDB quantile_cont) or
        approx (mergeable sketch — the corpus-scale path) quantile."""
        c = F.col(col)
        val = (
            F.percentile(c, F.lit(float(q)))
            if exact
            else F.percentile_approx(c, F.lit(float(q)), F.lit(accuracy))
        )
        return Constraint(
            name=f"quantile({col},{q})", value=val.cast("double"),
            lo=lo, hi=hi, threshold=f"[{lo},{hi}]", level=level,
        )

    @staticmethod
    def non_negative(col: str, level: str = "error") -> Constraint:
        c = C.min_between(col, lo=0.0, level=level)
        return Constraint(name=f"non_negative({col})", value=c.value, lo=0.0,
                          threshold=">=0", level=level)


class ConstraintSuite:
    """A named, ordered set of constraints evaluated in one fused pass."""

    def __init__(self, constraints: list[Constraint], name: str = "suite"):
        if not constraints:
            raise ValueError("empty constraint suite")
        names = [c.name for c in constraints]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            raise ValueError(f"duplicate constraint names: {sorted(dupes)}")
        self.name = name
        self.constraints = list(constraints)

    # ---- evaluation --------------------------------------------------------
    def evaluate(self, df: DataFrame, group_col: str | None = None) -> DataFrame:
        """ONE ``rollup(group_col).agg(...)`` (plain global agg when
        ``group_col`` is None) → one row per (group, constraint):

            (grp:string, check_name, level, observed:double, threshold, passed:int)

        ``grp`` is the group value as string; the rollup/global row is
        ``__all__``. ``passed`` is int 0/1 (portable across SQL engines)."""
        aliased = self.aliased_metrics()
        if group_col is None:
            aggd = df.agg(*aliased).withColumn("grp", F.lit(GLOBAL_GROUP))
        else:
            # GROUPING() disambiguates the rollup total from a genuinely
            # NULL group value: only the total row is labeled __all__; a
            # null group keeps grp NULL (its own group, matching the
            # GROUPING()-based SQL replay). The earlier coalesce folded a
            # null-group row INTO __all__, silently merging its verdicts
            # with the global ones.
            aggd = (
                df.rollup(group_col)
                .agg(*aliased, F.grouping(group_col).alias("_istotal"))
                .withColumn(
                    "grp",
                    F.when(F.col("_istotal") == 1, F.lit(GLOBAL_GROUP))
                    .otherwise(F.col(group_col).cast("string")),
                )
                .drop("_istotal")
            )
        return self.unpivot(aggd, keep=["grp"])

    def aliased_metrics(self) -> list[Column]:
        """The suite's metrics as positional ``_c{i}`` aggregate aliases —
        the agg list for any grouping shape (rollup, window, global)."""
        return [c.value.alias(f"_c{i}") for i, c in enumerate(self.constraints)]

    def unpivot(self, aggd: DataFrame, keep: list[str]) -> DataFrame:
        """Explode an aggregated ``_c{i}`` frame into one row per
        (keep-cols, constraint) — runs on the O(groups) frame, never the
        corpus. Shared by batch evaluate and streaming_constraints."""
        structs = []
        for i, c in enumerate(self.constraints):
            v6 = F.round(F.col(f"_c{i}").cast("double"), 6)
            structs.append(
                F.struct(
                    F.lit(c.name).alias("check_name"),
                    F.lit(c.level).alias("level"),
                    v6.alias("observed"),
                    F.lit(c.threshold).alias("threshold"),
                    c.passed_expr(v6).cast("int").alias("passed"),
                )
            )
        return aggd.select(
            *keep, F.explode(F.array(*structs)).alias("_r")
        ).select(*keep, "_r.*")

    def verdicts(self, results: DataFrame) -> DataFrame:
        """Per-group suite verdict from an :meth:`evaluate` frame: pass iff
        every error-level constraint passed (warnings only counted)."""
        err_fail = F.sum(((F.col("level") == "error") & (F.col("passed") == 0)).cast("long"))
        warn_fail = F.sum(((F.col("level") == "warning") & (F.col("passed") == 0)).cast("long"))
        return results.groupBy("grp").agg(
            err_fail.alias("n_error_failures"),
            warn_fail.alias("n_warning_failures"),
            (err_fail == 0).cast("int").alias("suite_passed"),
        )

    def run(self, df: DataFrame, group_col: str | None = None) -> tuple[DataFrame, DataFrame]:
        """Convenience: (results, verdicts) in one call; still one pass over
        ``df`` plus an O(groups·constraints) rollup of the result frame."""
        res = self.evaluate(df, group_col)
        return res, self.verdicts(res)


# factories addressable from a declarative (JSON/YAML-parsed) spec
_SPEC_TYPES = (
    "completeness", "distinctness", "unique", "contained_in", "matches",
    "satisfies", "row_count_between", "mean_between", "min_between",
    "max_between", "sum_between", "stddev_between", "quantile_between",
    "non_negative",
)


def suite_from_spec(spec: dict) -> ConstraintSuite:
    """Build a :class:`ConstraintSuite` from a plain-data spec (the parsed
    form of a JSON/YAML config file) — the declared-rules surface SURVEY
    §1.3 maps from the reference's ``format_rules``/``CHECKER_CONFIG``
    (checker.py:192-211, config.py:79-87), generalized to every constraint
    factory::

        {"name": "orders-contract",
         "constraints": [
           {"type": "completeness", "col": "o_custkey"},
           {"type": "contained_in", "col": "o_orderstatus",
            "allowed": ["F", "O", "P"]},
           {"type": "satisfies", "predicate": "o_totalprice > 0",
            "name": "positive_price", "min_ratio": 0.99},
           {"type": "mean_between", "col": "o_totalprice",
            "lo": 50000, "hi": 300000, "level": "warning"}]}

    ``type`` selects the :class:`C` factory; every other key is passed as a
    keyword argument (``satisfies`` predicates are SQL boolean expression
    strings — JSON-safe). Unknown types and bad arguments raise with the
    offending entry's index so a config typo points at its own line.
    """
    if not isinstance(spec, dict) or "constraints" not in spec:
        raise ValueError("spec must be a dict with a 'constraints' list")
    cons: list[Constraint] = []
    for i, entry in enumerate(spec["constraints"]):
        kwargs = dict(entry)
        ctype = kwargs.pop("type", None)
        if ctype not in _SPEC_TYPES:
            raise ValueError(
                f"constraints[{i}]: unknown type {ctype!r}; one of {_SPEC_TYPES}"
            )
        try:
            cons.append(getattr(C, ctype)(**kwargs))
        except TypeError as e:
            raise ValueError(f"constraints[{i}] ({ctype}): {e}") from e
    return ConstraintSuite(cons, name=spec.get("name", "spec-suite"))


_NUMERIC_DTYPES = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def _is_numeric_dtype(simple: str) -> bool:
    return simple in _NUMERIC_DTYPES or simple.startswith("decimal")


def suggest_constraints(
    df: DataFrame,
    columns: list[str] | None = None,
    max_categories: int = 32,
    exact_distinct: bool = True,
) -> tuple[DataFrame, "ConstraintSuite | None"]:
    """Deequ-style constraint suggestion: profile the table, emit the suite
    the data itself satisfies (the reference's inference analogue is the
    format-rule sampler, dataset_checker/checks/data_format.py:86-127 —
    name match then a 10-value content vote; this is the table-level
    generalization over ALL column properties, not just formats).

    Two bounded passes, both Spark-side:
      1. :func:`ops.profile.profile_table` — ONE fused aggregation for
         every column's null/distinct/min/max stats; O(columns) collected.
      2. only for string columns whose (pass-1) distinct count is within
         ``max_categories``: ONE ``sort_array(collect_set(...))`` agg —
         driver state is O(columns · max_categories) by construction,
         never O(rows).

    Deterministic emission rules (each row of the returned frame; the
    DuckDB oracle replays them 1:1):
      - ``completeness`` — every column; ``lo`` = completeness ratio
        floored to 2 dp via INTEGER arithmetic ((100·non_null)//n / 100 —
        float floor(x·100) would be representation-sensitive); level
        ``error`` when the column has no nulls, else ``warning``.
      - ``unique`` — distinct == non-null count > 0 (simple types only).
      - ``contained_in`` — string column with 1..max_categories distinct
        values; ``param`` = the sorted values comma-joined.
      - ``non_negative`` — numeric column, non-null > 0, min >= 0.
      - ``range`` — numeric column, non-null > 0; ``lo``/``hi`` = observed
        min/max rounded to 6 dp (warning level — ranges drift).

    Returns ``(suggestions, suite)``: a tidy frame
    ``(col_name, rule, param, lo, hi, level)`` plus the equivalent
    :class:`ConstraintSuite` ready to evaluate — by construction the
    originating table passes every suggested constraint (the 6-dp
    quantization in :meth:`ConstraintSuite.evaluate` matches the 6-dp
    rounding of the range bounds exactly).
    """
    from ultragendataset_datachecker_spark.ops.profile import profile_table

    prof = profile_table(df, columns, exact_distinct=exact_distinct).collect()
    cat_cols = [
        r["column"]
        for r in prof
        if r["dtype"] == "string"
        and r["n_distinct"] is not None
        and 1 <= r["n_distinct"] <= max_categories
    ]
    cats: dict[str, list[str]] = {}
    if cat_cols:
        row = df.agg(
            *[F.sort_array(F.collect_set(F.col(f"`{c}`"))).alias(c) for c in cat_cols]
        ).collect()[0]
        cats = {c: [str(v) for v in row[c]] for c in cat_cols}

    # With exact_distinct=False the profile's distinct counts are HLL
    # approximations: a merely-near-unique column can profile as distinct ==
    # non_null and would get a `unique` suggestion that then FAILS at
    # evaluate() (which uses exact count_distinct) — breaking the documented
    # "the originating table passes every suggested constraint" contract.
    # Re-verify exactly the columns the approximation would flag with one
    # bounded exact-count aggregate (O(near-unique columns), not O(rows)).
    exact_unique: dict[str, int] = {}
    if not exact_distinct:
        cand = [
            r["column"]
            for r in prof
            if r["n_distinct"] is not None
            and (r["n_rows"] - r["n_null"]) > 0
            and r["n_distinct"] == r["n_rows"] - r["n_null"]
        ]
        if cand:
            row = df.agg(
                *[F.count_distinct(F.col(f"`{c}`")).alias(c) for c in cand]
            ).collect()[0]
            exact_unique = {c: row[c] for c in cand}

    rows: list[tuple] = []
    cons: list[Constraint] = []
    for r in prof:
        col, n, n_null = r["column"], r["n_rows"], r["n_null"]
        if n == 0:
            continue
        non_null = n - n_null
        lo = (100 * non_null) // n / 100
        level = "error" if n_null == 0 else "warning"
        rows.append((col, "completeness", "", float(lo), None, level))
        cons.append(C.completeness(col, min_ratio=lo, level=level))
        n_dist = r["n_distinct"]
        if not exact_distinct:
            n_dist = exact_unique.get(col)  # None unless re-verified above
        if n_dist is not None and non_null > 0 and n_dist == non_null:
            rows.append((col, "unique", "", 1.0, None, "error"))
            cons.append(C.unique(col))
        if col in cats:
            rows.append((col, "contained_in", ",".join(cats[col]), 1.0, None, "error"))
            cons.append(C.contained_in(col, cats[col]))
        if _is_numeric_dtype(r["dtype"]) and non_null > 0:
            mn = round(float(r["min_str"]), 6)
            mx = round(float(r["max_str"]), 6)
            if mn >= 0:
                rows.append((col, "non_negative", "", 0.0, None, "error"))
                cons.append(C.non_negative(col))
            rows.append((col, "range", "", mn, mx, "warning"))
            cons.append(C.min_between(col, lo=mn, level="warning"))
            cons.append(C.max_between(col, hi=mx, level="warning"))

    schema = "col_name string, rule string, param string, lo double, hi double, level string"
    sugg = df.sparkSession.createDataFrame(rows, schema=schema)
    return sugg, (ConstraintSuite(cons, name="suggested") if cons else None)


def engine_contract_suite(cfg=None) -> ConstraintSuite:
    """The engine's own input contract (BASELINE.json input_hint) as a
    declarative suite over the NARROW projection (prepare.narrow_projection
    columns: part, doc_id, source, n_tok, tok_size, tok_min, tok_max, ...):
    the same invariants the fused violation pass enforces row-by-row,
    restated as table-level gates — useful as a cheap pre-flight before a
    full validation run, or as a per-partition admission check."""
    from ultragendataset_datachecker_spark.config import EngineConfig

    cfg = cfg or EngineConfig()
    return ConstraintSuite(
        [
            C.completeness("doc_id"),
            C.completeness("n_tok"),
            C.completeness("source", min_ratio=0.99, level="warning"),
            C.unique("doc_id"),
            C.contained_in("source", list(cfg.allowed_sources), min_ratio=0.95),
            C.matches("doc_id", cfg.doc_id_pattern),
            C.satisfies(
                (F.col("tok_size").isNotNull()) & (F.col("tok_size") == F.col("n_tok")),
                "n_tok_consistent", min_ratio=0.99,
            ),
            C.satisfies(
                (F.col("tok_min") >= 0) & (F.col("tok_max") < cfg.vocab_size),
                "token_range", min_ratio=0.99,
            ),
            C.row_count_between(lo=1),
        ],
        name="engine-contract",
    )
