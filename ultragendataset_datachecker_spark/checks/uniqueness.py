"""Key-uniqueness and exact-duplicate detection — the shuffle-bearing checks.

Replaces the reference's O(n²) duplicate pairing
(/root/reference/dataset_checker/checks/duplicates.py:46-63: ``duplicated()``
mask then a nested full scan to find each duplicate's first occurrence) with
pure aggregates (SURVEY A3/A4/W1).

Scale design (10^12 rows): both checks run off the NARROW projection
(prepare.narrow_projection) — the shuffle carries a few scalars per row,
never token arrays. Token-array duplicates use the two independent 64-bit
content hashes (128 bits combined → collision odds ~1e-15 at 10^12 rows);
``cfg.verify_token_dups_exactly`` optionally re-verifies candidate groups
with true array equality via a semi-join back to the fact table — the exact
comparison then touches only actual-duplicate rows.

Round-3 skew hardening: earlier rounds ranked candidate rows with
``row_number() over (partition by key)`` — correct, but ONE pathologically
hot key (a boilerplate document duplicated 10^8 times is realistic in web
corpora) serializes into a single window task. The checks' outputs are
actually derivable without any window:

  - first occurrence per key  = min(struct(<total order>))     (partial agg)
  - per-row violations        = candidate rows whose order tuple > min
  - tied-at-min copies        = (count of rows equal to min) - 1 replicas,
                                synthesized by explode(sequence(...))

Every aggregation is algebraic (map-side combine collapses the hot key per
task before the shuffle), the candidate joins broadcast under AQE, and no
single task ever holds a whole key's occurrence list. Output is
tuple-for-tuple identical to the window form: the emitted multiset is "all
candidate rows minus one minimum-order row per key" either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ultragendataset_datachecker_spark.config import EngineConfig
from ultragendataset_datachecker_spark.prepare import H2_SALT


def doc_id_duplicate_violations(narrow: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Violation rows for non-unique doc_id.

    Deterministic keep-first semantics (ref duplicates.py:46 keep='first'):
    the reference's order is row position; a distributed table has no stable
    position, so the engine defines the total order (part, n_tok, content
    hash) — documented contract, stable across parallelism levels.
    Emits one violation per extra occurrence, plus occurrence count.
    """
    pc = cfg.partition_col
    base = narrow.where(F.col("doc_id").isNotNull()).select(
        pc, "doc_id", "n_tok", "h1"
    )
    # Total order as a comparable struct. The window form used
    # asc_nulls_last on n_tok/h1; struct min() would sort NULL fields first,
    # so coalesce them to the type's max — same deterministic order.
    ord_t = F.struct(
        F.col(pc).alias("o1"),
        F.coalesce(F.col("n_tok"), F.lit(2147483647)).alias("o2"),
        F.coalesce(F.col("h1"), F.lit(9223372036854775807)).alias("o3"),
    )
    # one partial-agg pass: occurrence count + minimum order tuple per key
    keys = (
        base.select("doc_id", ord_t.alias("_ord"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.min("_ord").alias("_first"),
        )
        .where(F.col("_cnt") > 1)
    )
    if cfg.broadcast_dup_candidates:
        keys = F.broadcast(keys)
    cand = base.select(pc, "doc_id", ord_t.alias("_ord")).join(
        keys, on="doc_id", how="inner"
    )
    viol = F.struct(
        F.lit("doc_id_duplicate").alias("check_name"),
        F.concat(F.lit("occurrences="), F.col("_cnt").cast("string")).alias("observed"),
        F.lit("unique doc_id").alias("expected"),
    )
    # rows strictly after the first occurrence — one violation each, carrying
    # the row's own partition
    after_first = cand.where(F.col("_ord") > F.col("_first")).select(
        F.col(pc).alias("part"), "doc_id", viol.alias("v")
    )
    # rows tied WITH the first occurrence (identical order tuple — same
    # partition by construction): k tied copies mean k-1 extra occurrences,
    # synthesized without ever sorting the key's rows in one task
    tied = (
        cand.where(F.col("_ord") == F.col("_first"))
        .groupBy("doc_id", "_cnt", F.col("_first").getField("o1").alias("part"))
        .agg(F.count(F.lit(1)).alias("_nmin"))
        .where(F.col("_nmin") > 1)
        .select(
            "part", "doc_id", "_cnt",
            F.explode(F.sequence(F.lit(2), F.col("_nmin"))).alias("_i"),
        )
        .select("part", "doc_id", viol.alias("v"))
    )
    out = after_first.unionByName(tied)
    return out.select(
        "part", "doc_id",
        F.col("v.check_name").alias("check_name"),
        F.col("v.observed").alias("observed"),
        F.col("v.expected").alias("expected"),
    )


def doc_hash_candidates(rows: DataFrame) -> DataFrame:
    """Stage-1 doc_id hash-candidate detection: the kh values with more than
    one occurrence. ``rows`` may be the narrow projection or any frame with
    the same row multiset carrying doc_id — the aggregate is an exact
    integer count over xxhash64(doc_id), so the result is source- and
    partitioning-independent. The engine feeds it the column-pruned fact
    scan and runs it CONCURRENTLY with the narrow-store build (guide §2.6).
    """
    return (
        rows.where(F.col("doc_id").isNotNull())
        .groupBy(F.xxhash64(F.col("doc_id")).alias("kh"))
        .agg(F.count(F.lit(1)).alias("_hc"))
        .where(F.col("_hc") > 1)
        .select("kh")
    )


def fused_duplicate_violations(
    narrow: DataFrame,
    cfg: EngineConfig,
    cache_registry: list | None = None,
    cand_doc: DataFrame | None = None,
) -> DataFrame:
    """Both shuffle-bearing dup checks (doc_id uniqueness + 128-bit-hash
    token dedup) fused over the shared narrow store — output
    tuple-identical to doc_id_duplicate_violations ∪
    token_duplicate_violations (hash path).

    The separate wide forms each shuffled full key strings + order structs;
    here candidate DETECTION shuffles only ``xxhash64(true key)`` per row
    (two fixed-width single-long-key aggregates, one per key space), and
    the pruned candidate rows from the two broadcast probe joins are
    unioned into one frame so the exact-key regroup and both checks'
    violation emission still run once over a single tiny frame.

    DETECT-THEN-VERIFY key encoding: the corpus-sized candidate exchanges
    group on ``xxhash64(true key)`` — a fixed-width ~16 B/row shuffle
    instead of ~90 B/row of string keys + order structs (at the
    multi-executor legs this exchange crosses netty between processes; the
    wide form was the engine's weakest-scaling stage, eff 0.71 vs 1.04 for
    the metrics rollup). Detection runs as TWO single-long-key aggregates
    (one per key space) rather than the round-5 form's 2x-row
    explode(array_compact(array(struct,struct))) feeding one (kt, kh)
    aggregate: the explode generator alone measured 6.3s per 20M rows and
    pushed the fused aggregate to 10.3s, while two plain
    ``groupBy(xxhash64(key)).count`` passes over the cheap cached scan run
    fully codegen in 2.3s total with the same bytes exchanged (BENCH note,
    r6). Hash-candidate groups are a SUPERSET of true duplicate groups (a
    64-bit collision can merge two distinct keys), so the pruned candidate
    rows — O(rows in duplicate groups), tiny whenever dups are rare — are
    regrouped on the TRUE keys (kt=0: the doc_id string; kt=1: the
    (h1, h2) 128-bit pair) with the same ``_cnt > 1`` filter, which
    silently discards collision-merged singletons: the emitted violations
    are exactly the wide form's (parity test asserts tuple identity).
    Unused key fields are CONSTANTS per kt (k2=k3=0 for doc_id rows,
    k1='' for token rows) — kt separates the key spaces, so sentinels
    cannot collide with real values, and no join key is nullable (Spark
    equi-joins are null-unsafe). The order tuple is one struct shape
    serving both checks' documented total orders (doc_id check:
    (part, n_tok, h1) with nulls coalesced to type-max; token check:
    (doc_id, part)) — built only for pruned rows, never in the hot scan.
    """
    pc = cfg.partition_col
    max_int, max_long = 2147483647, 9223372036854775807
    # stage 1: hash-candidate detection — the only corpus-sized exchanges.
    # Two fixed-width single-long-key aggregates (codegen HashAggregate);
    # same total rows/bytes shuffled as one fused (kt, kh) aggregate, no
    # explode in the hot path.
    doc_rows = narrow.where(F.col("doc_id").isNotNull())
    tok_rows = narrow.where(F.col("h1").isNotNull())
    if cand_doc is None:
        cand_doc = doc_hash_candidates(doc_rows)
    cand_tok = (
        tok_rows.groupBy(F.xxhash64(F.col("h1"), F.col("h2")).alias("kh"))
        .agg(F.count(F.lit(1)).alias("_hc"))
        .where(F.col("_hc") > 1)
        .select("kh")
    )
    cand_doc = cand_doc.select(F.col("kh").alias("_khd"))
    cand_tok = cand_tok.select(F.col("kh").alias("_kht"))
    if cfg.broadcast_dup_candidates:
        cand_doc = F.broadcast(cand_doc)
        cand_tok = F.broadcast(cand_tok)
    # stage 2: exact keys + order tuples built on the PRUNED rows only
    doc_ord = F.struct(
        F.lit("").alias("os"),
        F.col(pc).alias("on1"),
        F.coalesce(F.col("n_tok"), F.lit(max_int)).alias("on2"),
        F.coalesce(F.col("h1"), F.lit(max_long)).alias("on3"),
    )
    tok_ord = F.struct(
        F.col("doc_id").alias("os"),
        F.col(pc).alias("on1"),
        F.lit(max_int).alias("on2"),
        F.lit(max_long).alias("on3"),
    )
    # ONE probe scan for both key spaces (was: two full scans of the narrow
    # store, one per broadcast probe — 2x 3.2 GB of block reads per 20M
    # rows, r6 event-log audit). Both candidate sets are broadcast; two
    # LEFT probes ride the same scan, a row is kept iff either hit, and the
    # per-keyspace candidate rows are emitted by exploding a compacted
    # 2-slot array — the generator runs only on hit rows (rare), unlike the
    # round-5 explode-everything form. Null prefilters fold into the hit
    # conditions (xxhash64(NULL) is a seed constant that could spuriously
    # probe-match, so each hit requires its key to be non-null — exactly
    # the doc_rows/tok_rows prefilters of the two-scan form). Output rows
    # are tuple-identical to the unioned two-scan form.
    hit_d = F.col("doc_id").isNotNull() & F.col("_khd").isNotNull()
    hit_t = F.col("h1").isNotNull() & F.col("_kht").isNotNull()
    cand_struct = F.array(
        F.when(hit_d, F.struct(
            F.lit(0).alias("kt"),
            F.col("doc_id").alias("k1"),
            F.lit(0).cast("long").alias("k2"),
            F.lit(0).cast("long").alias("k3"),
            doc_ord.alias("_ord"),
        )),
        F.when(hit_t, F.struct(
            F.lit(1).alias("kt"),
            F.lit("").alias("k1"),
            F.col("h1").alias("k2"),
            F.col("h2").alias("k3"),
            tok_ord.alias("_ord"),
        )),
    )
    pruned = (
        narrow
        .join(cand_doc, F.xxhash64(F.col("doc_id")) == F.col("_khd"), "left")
        .join(cand_tok, F.xxhash64(F.col("h1"), F.col("h2")) == F.col("_kht"), "left")
        .where(hit_d | hit_t)
        .select(pc, "doc_id", F.explode(F.array_compact(cand_struct)).alias("_c"))
        .select(pc, "doc_id", "_c.kt", "_c.k1", "_c.k2", "_c.k3", "_c._ord")
    )
    if cache_registry is not None:
        # The exact-key regroup below AND both output branches read
        # `pruned`; without a cache each consumer re-runs both full
        # probe scans (and the hash aggs feeding the broadcasts).
        # `pruned` is O(rows in hash-candidate groups): tiny whenever dups
        # are rare, and never wider than the narrow projection, so caching
        # it is safe at any scale. The count() materializes it EAGERLY: a
        # lazy persist still races every consumer through the probe inside
        # one job before any populates the cache. Caller owns unpersist via
        # the registry (ValidationResult.unpersist).
        pruned = pruned.persist(StorageLevel.MEMORY_AND_DISK)
        cache_registry.append(pruned)
        pruned.count()
    keys = ["kt", "k1", "k2", "k3"]
    cand = (
        pruned.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_cnt"), F.min("_ord").alias("_first"))
        .where(F.col("_cnt") > 1)
    )
    if cfg.broadcast_dup_candidates:
        cand = F.broadcast(cand)
    joined = pruned.join(cand, on=keys, how="inner")

    kt0 = F.col("kt") == 0
    first_os = F.col("_first").getField("os")
    first_on1 = F.col("_first").getField("on1")
    check_name = F.when(kt0, F.lit("doc_id_duplicate")).otherwise(
        F.lit("duplicate_tokens")
    )
    observed = F.when(
        kt0, F.concat(F.lit("occurrences="), F.col("_cnt").cast("string"))
    ).otherwise(F.concat(F.lit("duplicate_of="), first_os))
    expected = F.when(kt0, F.lit("unique doc_id")).otherwise(
        F.lit("unique token sequence")
    )

    after = joined.where(F.col("_ord") > F.col("_first")).select(
        F.col(pc).alias("part"),
        F.col("doc_id"),
        check_name.alias("check_name"),
        observed.alias("observed"),
        expected.alias("expected"),
    )
    # ties at the minimum order tuple: k tied copies = k-1 extra occurrences,
    # synthesized without sorting the key's rows in one task (same replica
    # construction as the separate forms — doc_id-check replicas carry the
    # key's doc_id and the min row's part; token-check replicas carry the min
    # row's doc_id and part, against which the duplicate_of self-reference
    # holds trivially)
    tied = (
        joined.where(F.col("_ord") == F.col("_first"))
        .groupBy(*keys, "_cnt", first_os.alias("_fos"), first_on1.alias("_fon1"))
        .agg(F.count(F.lit(1)).alias("_nmin"))
        .where(F.col("_nmin") > 1)
        .select(
            "kt", "k1", "_cnt", "_fos", "_fon1",
            F.explode(F.sequence(F.lit(2), F.col("_nmin"))).alias("_i"),
        )
        .select(
            F.col("_fon1").alias("part"),
            F.when(kt0, F.col("k1")).otherwise(F.col("_fos")).alias("doc_id"),
            check_name.alias("check_name"),
            F.when(
                kt0, F.concat(F.lit("occurrences="), F.col("_cnt").cast("string"))
            ).otherwise(F.concat(F.lit("duplicate_of="), F.col("_fos"))).alias("observed"),
            expected.alias("expected"),
        )
    )
    return after.unionByName(tied)


def token_duplicate_violations(
    narrow: DataFrame, cfg: EngineConfig, fact: DataFrame | None = None
) -> DataFrame:
    """Violation rows for exact token-array duplicates (content dedup).

    Spark-first replacement for the reference's exact-duplicate path
    (duplicates.py:46-63) under the token-array-equality invariant.
    Empty/null arrays are excluded (they are flagged by their own checks).

    When ``cfg.verify_token_dups_exactly`` and ``fact`` is given, candidate
    groups are re-verified with true array equality (semi-join pulls arrays
    for candidates only). Otherwise the 128-bit hash pair IS the equality.

    Window-free like doc_id_duplicate_violations: first occurrence per
    content key = min(struct(doc_id, part)); the exact-verify path compares
    each candidate's array against the first row's array carried by
    ``min_by`` (still only over candidate rows).
    """
    pc = cfg.partition_col
    base = narrow.where(F.col("h1").isNotNull()).select(pc, "doc_id", "h1", "h2")
    # stage 1: hash-pair occurrence counts (map-side partial agg; duplicates
    # are rare so the shuffle output is tiny)
    ord_t = F.struct(F.col("doc_id").alias("o1"), F.col(pc).alias("o2"))

    if cfg.verify_token_dups_exactly and fact is not None:
        cand_keys = (
            base.groupBy("h1", "h2").agg(F.count(F.lit(1)).alias("_cnt"))
            .where(F.col("_cnt") > 1).select("h1", "h2")
        )
        if cfg.broadcast_dup_candidates:
            cand_keys = F.broadcast(cand_keys)
        # pull candidate rows WITH arrays; AQE broadcasts the (tiny) key set
        tokens = F.col("tokens")
        fact_h = fact.where(tokens.isNotNull() & (F.size(tokens) > 0)).select(
            pc, "doc_id", "tokens",
            F.xxhash64(tokens).alias("h1"),
            F.xxhash64(F.lit(H2_SALT), tokens).alias("h2"),
        )
        cand = fact_h.join(cand_keys, on=["h1", "h2"], how="left_semi").select(
            pc, "doc_id", "tokens", "h1", "h2", ord_t.alias("_ord")
        )
        firsts = cand.groupBy("h1", "h2").agg(
            F.min("_ord").alias("_first"),
            F.min_by("tokens", "_ord").alias("_first_tokens"),
        )
        if cfg.broadcast_dup_candidates:
            firsts = F.broadcast(firsts)
        joined = cand.join(firsts, on=["h1", "h2"], how="inner")
        eq = F.col("tokens") == F.col("_first_tokens")
        after = joined.where((F.col("_ord") > F.col("_first")) & eq)
        tied_src = joined.where(F.col("_ord") == F.col("_first"))
    else:
        agg = base.select("h1", "h2", pc, "doc_id", ord_t.alias("_ord")).groupBy(
            "h1", "h2"
        ).agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.min("_ord").alias("_first"),
        ).where(F.col("_cnt") > 1)
        if cfg.broadcast_dup_candidates:
            agg = F.broadcast(agg)
        joined = base.select(pc, "doc_id", "h1", "h2", ord_t.alias("_ord")).join(
            agg, on=["h1", "h2"], how="inner"
        )
        after = joined.where(F.col("_ord") > F.col("_first"))
        tied_src = joined.where(F.col("_ord") == F.col("_first"))

    first_doc = F.col("_first").getField("o1")
    after_rows = after.select(
        F.col(pc).alias("part"), "doc_id", first_doc.alias("_first_doc")
    )
    # order tuple here is (doc_id, part): ties at min share BOTH, so replicas
    # carry the min row's doc_id/part. (Exact-verify ties are by definition
    # hash-equal rows with the same doc_id — array equality holds trivially
    # against themselves.)
    tied_rows = (
        tied_src.groupBy(
            "h1", "h2",
            first_doc.alias("doc_id"),
            F.col("_first").getField("o2").alias("part"),
        )
        .agg(F.count(F.lit(1)).alias("_nmin"))
        .where(F.col("_nmin") > 1)
        .select(
            "part", "doc_id",
            F.col("doc_id").alias("_first_doc"),
            F.explode(F.sequence(F.lit(2), F.col("_nmin"))).alias("_i"),
        )
        .select("part", "doc_id", "_first_doc")
    )
    dups = after_rows.unionByName(tied_rows)
    return dups.select(
        "part",
        "doc_id",
        F.lit("duplicate_tokens").alias("check_name"),
        F.concat(F.lit("duplicate_of="), F.col("_first_doc")).alias("observed"),
        F.lit("unique token sequence").alias("expected"),
    )
