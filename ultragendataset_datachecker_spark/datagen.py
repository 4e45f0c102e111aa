"""Deterministic synthetic sequences-table generator (the ``input_hint`` shape).

Spark-native: built from ``spark.range(n)`` with pure column expressions —
every cell is a pure function of the row id and the seed (hash-derived
pseudo-randomness via ``xxhash64``), so the output is byte-identical at any
parallelism level and the generator scales to arbitrary row counts with no
driver-side data.

Mirrors the reference's seeded defect-planting demo
(/root/reference/dataset_checker/examples/basic_usage.py:10-54, seed at :13):
a right-skewed numeric column (income → here ``n_tok`` lognormal-ish), an
imbalanced categorical with one hot class (→ ``source``, exercising salting),
planted nulls (:29-30), invalid formats (:36-37), outliers (:47-48) and
duplicated rows (:51-52) — each confined to *known id ranges* so tests assert
exact violation sets.

Schema (BASELINE.json input_hint + FIXTURES.md §1):
    doc_id:string, tokens:array<int>, n_tok:int, source:string, part:int
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class DefectSpec:
    """Exact planted-defect counts (FIXTURES.md §1 table).

    Defects occupy the *tail* of the id space in this fixed order, one block
    per defect class, so each defect's doc_id set is known in closed form.
    """

    null_tokens: int = 10
    null_source: int = 10
    dup_doc_id_exact: int = 12      # same doc_id AND identical token array
    dup_doc_id_diff: int = 8        # same doc_id, different token array
    ntok_mismatch: int = 10         # n_tok != size(tokens)
    token_out_of_range: int = 10    # one element < 0, one >= vocab
    empty_tokens: int = 6
    rogue_source: int = 10          # source not in allowed_sources
    ntok_outlier: int = 8           # n_tok ~ 10x the clean max
    # one token id repeated for the whole sequence (degenerate repetition —
    # only flagged when cfg.repetition_check is on). Default 0 keeps every
    # previously recorded table, hash, and violation count byte-identical.
    looped_tokens: int = 0

    ORDER = (
        "null_tokens", "null_source", "dup_doc_id_exact", "dup_doc_id_diff",
        "ntok_mismatch", "token_out_of_range", "empty_tokens", "rogue_source",
        "ntok_outlier", "looped_tokens",
    )

    def total(self) -> int:
        return sum(getattr(self, name) for name in self.ORDER)

    def blocks(self, n_rows: int) -> dict[str, tuple[int, int]]:
        """Map defect name -> [start_id, end_id) in the tail of 0..n_rows."""
        out: dict[str, tuple[int, int]] = {}
        cursor = n_rows - self.total()
        for name in self.ORDER:
            k = getattr(self, name)
            out[name] = (cursor, cursor + k)
            cursor += k
        return out

    def doc_ids(self, n_rows: int) -> dict[str, list[str]]:
        """Defect name -> the exact doc_id strings planted (duplicate rows
        carry their *source* row's doc_id, i.e. id - n_rows//2)."""
        blocks = self.blocks(n_rows)
        out: dict[str, list[str]] = {}
        for name, (lo, hi) in blocks.items():
            if name in ("dup_doc_id_exact", "dup_doc_id_diff"):
                out[name] = [_fmt_doc_id(i - n_rows // 2) for i in range(lo, hi)]
            else:
                out[name] = [_fmt_doc_id(i) for i in range(lo, hi)]
        return out


def _fmt_doc_id(i: int) -> str:
    return f"doc_{i:010d}"


@dataclass(frozen=True)
class GenSpec:
    n_rows: int = 10_000
    n_parts: int = 8
    seed: int = 42
    vocab_size: int = 50_000
    min_len: int = 1
    max_len: int = 512
    # hot source gets ~60% of mass (FIXTURES.md: exercise skew/salting)
    sources: tuple[str, ...] = (
        "common_crawl", "wikipedia", "github", "books", "arxiv",
        "stackexchange", "news", "forums",
    )
    hot_source_mass: float = 0.60
    drift_part: int | None = None   # partition with shifted n_tok + source mix
    drift_ntok_shift: int = 200
    defects: DefectSpec = field(default_factory=DefectSpec)

    @property
    def drifted_part(self) -> int:
        return self.n_parts - 1 if self.drift_part is None else self.drift_part


def _u(idc: Column, tag: str, seed: int) -> Column:
    """Deterministic uniform double in [0,1) derived from the row id."""
    big = 1 << 40
    return (F.pmod(F.xxhash64(idc, F.lit(tag), F.lit(seed)), F.lit(big)) / F.lit(float(big)))


def _zish(idc: Column, tag: str, seed: int) -> Column:
    """Approximately standard-normal via Irwin-Hall (sum of 6 uniforms)."""
    s = None
    for k in range(6):
        u = _u(idc, f"{tag}_{k}", seed)
        s = u if s is None else s + u
    return (s - F.lit(3.0)) / F.lit((6 / 12.0) ** 0.5)


def _part_of(idc: Column, spec: GenSpec) -> Column:
    return F.pmod(idc, F.lit(spec.n_parts)).cast("int")


def _clean_ntok(idc: Column, spec: GenSpec) -> Column:
    """Right-skewed token count: round(exp(mu + sigma*z)) clipped to
    [min_len, max_len] — the ``income`` analogue (basic_usage.py:22).
    Includes the drifted-partition shift: a pure function of the id, so a
    duplicate row regenerating from its source id reproduces it exactly."""
    z = _zish(idc, "ntok", spec.seed)
    raw = F.exp(F.lit(4.5) + F.lit(0.7) * z)
    n = F.least(F.greatest(F.round(raw).cast("int"), F.lit(spec.min_len)), F.lit(spec.max_len))
    in_drift = _part_of(idc, spec) == F.lit(spec.drifted_part)
    return F.when(in_drift, n + F.lit(spec.drift_ntok_shift)).otherwise(n)


def _clean_source(idc: Column, spec: GenSpec) -> Column:
    """Categorical with one hot class; drifted partition collapses 90% of its
    mass onto the hot source. Pure function of the id."""
    u = _u(idc, "src", spec.seed)
    hot = spec.hot_source_mass
    rest = spec.sources[1:]
    width = (1.0 - hot) / max(len(rest), 1)
    out = F.when(u < F.lit(hot), F.lit(spec.sources[0]))
    for j, s in enumerate(rest):
        out = out.when(u < F.lit(hot + (j + 1) * width), F.lit(s))
    base = out.otherwise(F.lit(rest[-1] if rest else spec.sources[0]))
    in_drift = _part_of(idc, spec) == F.lit(spec.drifted_part)
    return F.when(in_drift & (_u(idc, "dsrc", spec.seed) < F.lit(0.9)),
                  F.lit(spec.sources[0])).otherwise(base)


def _tokens_for(idc: Column, ntok: Column, spec: GenSpec) -> Column:
    """array<int> of ntok pseudo-random tokens in [0, vocab)."""
    return F.transform(
        F.sequence(F.lit(1), ntok),
        lambda i: F.pmod(F.xxhash64(idc, i, F.lit(spec.seed)), F.lit(spec.vocab_size)).cast("int"),
    )


def generate_sequences(spark: SparkSession, spec: GenSpec | None = None,
                       num_range_partitions: int | None = None,
                       id_range: tuple[int, int] | None = None) -> DataFrame:
    """Build the sequences DataFrame. Deterministic: independent of
    parallelism, shuffles, and task scheduling.

    ``id_range=(lo, hi)`` materializes only that slice of the global id space
    — every cell is a pure function of the global id and spec, so slices are
    mutually consistent (used for chunked/resumable generation of very large
    bench tables)."""
    spec = spec or GenSpec()
    n = spec.n_rows
    blocks = spec.defects.blocks(n)

    lo, hi = id_range if id_range else (0, n)
    df = spark.range(lo, hi, 1, num_range_partitions or max(spec.n_parts * 4, 32))
    idc = F.col("id")

    def in_block(name: str) -> Column:
        lo, hi = blocks[name]
        return (idc >= F.lit(lo)) & (idc < F.lit(hi))

    is_dup_exact = in_block("dup_doc_id_exact")
    is_dup_diff = in_block("dup_doc_id_diff")
    # duplicate rows take their *source* row's identity; id - n//2 is always a
    # clean front-half row — cf. basic_usage.py:51-52 row copies
    src_id = F.when(is_dup_exact | is_dup_diff, idc - F.lit(n // 2)).otherwise(idc)

    # values are pure functions of src_id → exact dups reproduce the source
    # row (token-array equality invariant) even when it sits in the drifted part
    ntok = _clean_ntok(src_id, spec)
    tokens = _tokens_for(src_id, ntok, spec)
    source = _clean_source(src_id, spec)
    doc_id = F.format_string("doc_%010d", src_id)

    # dup_diff: same doc_id but *own* (different) token array
    ntok = F.when(is_dup_diff, _clean_ntok(idc, spec)).otherwise(ntok)
    tokens = F.when(is_dup_diff, _tokens_for(idc, ntok, spec)).otherwise(tokens)

    # ---- plant the remaining defect blocks (tail id ranges) ----
    tokens = F.when(in_block("null_tokens"), F.lit(None)).otherwise(tokens)
    source = F.when(in_block("null_source"), F.lit(None)).otherwise(source)
    source = F.when(in_block("rogue_source"), F.lit("__rogue__")).otherwise(source)

    # n_tok != size(tokens)
    ntok = F.when(in_block("ntok_mismatch"), ntok + F.lit(5)).otherwise(ntok)

    # one token below range, one above
    tokens = F.when(
        in_block("token_out_of_range"),
        F.concat(F.array(F.lit(-1).cast("int"), F.lit(spec.vocab_size + 7).cast("int")),
                 F.slice(tokens, 3, F.greatest(F.size(tokens) - 2, F.lit(0)))),
    ).otherwise(tokens)

    tokens = F.when(in_block("empty_tokens"), F.array().cast("array<int>")).otherwise(tokens)
    ntok = F.when(in_block("empty_tokens"), F.lit(0)).otherwise(ntok)

    # extreme n_tok outliers (~10x clean max), arrays kept consistent
    out_len = F.lit(spec.max_len * 10)
    tokens = F.when(in_block("ntok_outlier"), _tokens_for(idc, out_len, spec)).otherwise(tokens)
    ntok = F.when(in_block("ntok_outlier"), out_len).otherwise(ntok)

    # degenerate repetition: ONE id repeated ntok times (length/range-clean —
    # only the opt-in repetition check can see it)
    loop_id = F.pmod(F.xxhash64(idc, F.lit("loop"), F.lit(spec.seed)), F.lit(spec.vocab_size)).cast("int")
    tokens = F.when(in_block("looped_tokens"), F.array_repeat(loop_id, ntok)).otherwise(tokens)

    return df.select(
        doc_id.alias("doc_id"),
        tokens.cast("array<int>").alias("tokens"),
        ntok.cast("int").alias("n_tok"),
        source.alias("source"),
        _part_of(idc, spec).alias("part"),
    )


def allowed_sources_df(spark: SparkSession, sources) -> DataFrame:
    """Tiny broadcast-side dimension (FIXTURES.md §2); analogue of the
    reference's allowed-values config (/root/reference/config.py:83).

    Built JVM-natively (range + element_at literal array), NOT via
    ``createDataFrame(list)``: the Python-list path plans as
    ``Scan ExistingRDD`` whose first evaluation spins up the Python worker
    pool (~25s one-time) — a trap for tiny dims in the hot path."""
    return small_string_dim(spark, list(sources), "source")


def small_string_dim(spark: SparkSession, values: list[str], colname: str) -> DataFrame:
    arr = F.array(*[F.lit(v) for v in values])
    return spark.range(len(values)).select(
        F.element_at(arr, (F.col("id") + 1).cast("int")).alias(colname)
    )


def write_sequences(spark: SparkSession, path: str, spec: GenSpec | None = None,
                    files_per_part: int = 8) -> None:
    """Write partitioned by `part` with several files per partition: a single
    75MB+ file is one parquet row group = one scan task, which caps scan
    parallelism at n_parts and starves wide executors (a 1000-executor
    cluster wants thousands of splits; so does local[32])."""
    spec = spec or GenSpec()
    df = generate_sequences(spark, spec)
    df = df.repartition(
        spec.n_parts * files_per_part,
        F.col("part"), F.pmod(F.xxhash64("doc_id"), F.lit(files_per_part)),
    )
    df.write.mode("overwrite").partitionBy("part").parquet(path)
