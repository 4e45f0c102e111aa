"""The narrow derived projection — computed in ONE scan of the fact table.

Every check the engine runs needs only a handful of *derived scalars* per
row, never the token array itself (except exact dup verification on the tiny
candidate set). Deriving them once and persisting the ~3%-width projection
means: one parquet decode of the heavy ``tokens`` column per run instead of
five, and zero higher-order-function (lambda) evaluation in the hot path —
``array_min``/``array_max`` replace ``exists``/``forall``, which are
interpreted per-element and dominated the profile (15s vs <1s per 2M rows).

Columns:
    part, doc_id, source, n_tok          (carried through)
    tok_size  int   size(tokens), null when tokens null
    tok_min   int   array_min(tokens)    (range check)
    tok_max   int   array_max(tokens)
    h1, h2    long  two independent 64-bit content hashes (dup detection)

h2 hashes the SAME forward array under a salted seed chain —
``xxhash64(lit(salt), tokens)`` evaluates as hash(tokens,
seed=hash(salt, 42)), i.e. the same function family as h1 with a different
seed, so (h1, h2) equality is a 128-bit content test. Earlier rounds hashed
``reverse(tokens)`` for independence, which allocated a reversed copy of
every token array in the hottest scan; the salt-first form is
allocation-free and equally independent (a salted *trailing* column would
NOT be: xxhash64(tokens, salt) = f(xxhash64(tokens)) is a pure function of
h1, collapsing the pair to 64 bits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.config import EngineConfig

H2_SALT = 0x9E3779B9


def content_h1_expr() -> Column:
    """The h1 token-content hash exactly as narrow_projection derives it —
    shared so content digests computed on the RAW table agree with digests
    computed on the narrow projection."""
    tokens = F.col("tokens")
    return F.when(
        tokens.isNotNull() & (F.size(tokens) > 0), F.xxhash64(tokens)
    )


def row_digest_expr(include_tokens: bool, h1: Column | None = None) -> Column:
    """Per-row digest input for the partition content digest.

    xxhash64 over the scalar identity columns (doc_id, n_tok, source) —
    Catalyst prunes the scan to those columns, so the digest pre-pass reads
    a few % of a token-table's bytes. ``include_tokens=True`` folds in the
    h1 token-content hash (pass the narrow projection's ``h1`` column, or
    leave None to derive it — which forces the scan to read ``tokens``).

    Cast to decimal(38,0): a SUM of 10^12 64-bit values cannot overflow
    (max ~1e31 < 1e38), stays exact, and is order-independent — the digest
    is invariant to row order and partitioning but sensitive to any row
    added, removed, duplicated, or changed.
    """
    parts = [F.col("doc_id"), F.col("n_tok"), F.col("source")]
    if include_tokens:
        parts.append(h1 if h1 is not None else content_h1_expr())
    return F.xxhash64(*parts).cast("decimal(38,0)")


def narrow_projection(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    tokens = F.col("tokens")
    has = tokens.isNotNull()
    nonempty = has & (F.size(tokens) > 0)
    cols = [
        F.col(cfg.partition_col),
        F.col("doc_id"),
        F.col("source"),
        F.col("n_tok"),
        F.when(has, F.size(tokens)).alias("tok_size"),
        F.when(has, F.array_min(tokens)).alias("tok_min"),
        F.when(has, F.array_max(tokens)).alias("tok_max"),
        F.when(nonempty, F.xxhash64(tokens)).alias("h1"),
        F.when(nonempty, F.xxhash64(F.lit(H2_SALT), tokens)).alias("h2"),
    ]
    # special-token probes only when the opt-in checks are on — O(1) array
    # element reads, and the default narrow width is unchanged
    if cfg.bos_id is not None:
        cols.append(F.when(nonempty, F.element_at(tokens, 1)).alias("tok_first"))
    if cfg.eos_id is not None:
        cols.append(F.when(nonempty, F.element_at(tokens, -1)).alias("tok_last"))
    return df.select(*cols)
