"""Engine configuration.

Analogue of the reference's ``CHECKER_CONFIG`` dict
(/root/reference/config.py:79-87) plus the quality-score weights
(/root/reference/dataset_checker/report.py:50-58) and pass threshold
(/root/reference/main.py:89, /root/reference/config.py:52) — lifted into one
typed config object.  Histogram bucket edges for drift are *fixed constants*
stored here (never data-dependent) so KL/PSI is deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Reference score weights: /root/reference/dataset_checker/report.py:51-58
SCORE_WEIGHTS: dict[str, float] = {
    "missing_values": 1.0,
    "outliers": 0.8,
    "duplicates": 0.9,
    "data_format": 0.7,
    "data_balance": 0.6,
    "data_distribution": 0.5,
}

# Pass threshold: /root/reference/main.py:89 (overall_score >= 0.8 passes)
PASS_THRESHOLD = 0.8

DEFAULT_ALLOWED_SOURCES = [
    "common_crawl",
    "wikipedia",
    "github",
    "books",
    "arxiv",
    "stackexchange",
    "news",
    "forums",
]

# Fixed, versioned n_tok histogram bucket edges (left-closed); bucket i covers
# [edges[i], edges[i+1]).  Values < edges[0] land in bucket 0's underflow and
# values >= edges[-1] in the overflow bucket.  Versioned with the baseline
# snapshot so drift joins are deterministic (FIXTURES.md §3).
DEFAULT_NTOK_BUCKET_EDGES = [
    0, 16, 32, 64, 96, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048, 4096,
]


@dataclass
class EngineConfig:
    """All knobs for one validation run.

    ``exact_quantiles`` flips between exact ``percentile`` (test parity with
    the pandas oracle — pandas linear interpolation, ref
    checks/data_distribution.py:65-67) and the mergeable
    ``percentile_approx`` sketch for the 10^12-row path.
    """

    vocab_size: int = 50_000
    # Opt-in special-token structure checks for tokenized-sequence payloads:
    # when set, every non-empty token array must start with bos_id / end
    # with eos_id. O(1) element_at probes per row — no per-token work, so
    # the narrow projection stays narrow (the columns are only added when
    # the knob is on).
    bos_id: int | None = None
    eos_id: int | None = None
    # Opt-in degenerate-repetition check (ops/tokenstats.token_repetition
    # thresholds): flags looped decoding / pad flooding / stuck-token
    # sequences as `token_repetition` violations. Costs ONE extra Arrow
    # kernel pass over the tokens column when on (the only per-token check
    # in the engine — every other check reads pre-derived scalars).
    repetition_check: bool = False
    repetition_thresholds: dict | None = None
    allowed_sources: tuple[str, ...] = tuple(DEFAULT_ALLOWED_SOURCES)
    ntok_bucket_edges: tuple[int, ...] = tuple(DEFAULT_NTOK_BUCKET_EDGES)

    # Outlier detection (ref checks/outliers.py:55-82).  zscore uses the
    # population std (scipy stats.zscore default ddof=0); iqr uses
    # Q1/Q3 ± threshold*IQR with linear-interpolated quantiles.
    zscore_threshold: float = 3.0
    iqr_threshold: float = 1.5

    # Drift thresholds on the per-partition KL / PSI vs the baseline
    # histogram snapshot (generalization of ref check_distribution score).
    psi_fail_threshold: float = 0.2
    drift_smoothing_eps: float = 1e-6
    # also emit KS / bucket-index W1 / chi-squared per (part, check) in
    # result.drift (checks/drift.ks_chi2_scores) — O(parts x buckets) extra
    # window work on the already-aggregated histogram frame, no corpus pass
    drift_ks_chi2: bool = True

    # Scoring
    score_weights: dict[str, float] = field(default_factory=lambda: dict(SCORE_WEIGHTS))
    pass_threshold: float = PASS_THRESHOLD

    # Physical knobs
    exact_quantiles: bool = True          # True: percentile (test scale); False: percentile_approx
    approx_quantile_accuracy: int = 10_000
    # True: candidate token-dup groups are re-verified with true array
    # equality (one extra semi-join scan). False: trust the 128-bit hash pair
    # (collision odds ~1e-15 even at 10^12 rows) — the at-scale default.
    verify_token_dups_exactly: bool = True
    # persist the narrow derived projection (part, doc_id, n_tok, source,
    # tok_size/min/max, content hashes) across the engine's passes
    cache_narrow: bool = True
    # How the narrow projection is stored across the passes:
    #   "checkpoint" — localCheckpoint(eager): rows go straight into block
    #     storage (MEMORY_AND_DISK). ~2.5x cheaper to build than the
    #     columnar cache (the per-row column-append + compression encoders
    #     of InMemoryRelation measured ~10s per 20M rows vs ~1s of block
    #     copies), equally fast to scan. Tradeoff: the lineage is
    #     truncated, so on a cluster a lost executor fails the run instead
    #     of recomputing the lost blocks.
    #   "cache" — classic persist(MEMORY_AND_DISK) InMemoryRelation:
    #     blocks recompute from lineage on loss; pay the columnar build.
    # Runs that must survive executor loss (very long 100 TB jobs) set
    # "cache"; the default favors the 2x-per-run build savings.
    narrow_store: str = "checkpoint"
    max_violation_examples: int | None = None  # optional cap per (part, check) at scale
    # Resume semantics: by default a manifest row means "checked under this
    # (snapshot, check-version)" and the partition is skipped on re-run
    # regardless of verdict. Set True to re-validate partitions whose last
    # verdict was 'fail' — the distributed analogue of the reference's
    # check→fix→re-check loop (/root/reference/main.py:117-133).
    resume_revalidates_failed: bool = False
    # Content-addressed resume: skip a partition when its CONTENT digest
    # matches the last manifest row even under a NEW snapshot id. The digest
    # rides along in the metrics agg (free); the re-run pays only a
    # column-pruned (doc_id, n_tok, source) digest pre-pass over
    # not-yet-skipped partitions — a few % of a token table's bytes — and
    # full validation runs only where data actually changed.
    resume_by_content: bool = False
    # fold the h1 token-content hash into the digest: catches token edits
    # that preserve (doc_id, n_tok, source), but the digest pre-pass must
    # then read the tokens column (full-width scan). Off by default.
    digest_include_tokens: bool = False
    salt_buckets: int = 8                 # salt fan-out for hot-key aggregations
    # Broadcast the duplicate-candidate key frames (keys with count > 1)
    # into the dup checks' candidate joins. Duplicate keys are defect-rate
    # sized, so the build side is tiny and the explicit hint removes the
    # base-side exchange+sort the static planner otherwise schedules (AQE
    # converts to broadcast only AFTER materializing the probe-side shuffle
    # files — measured 2x slower). Disable for pathological inputs where
    # MOST keys are duplicated (the frame is then O(n) and would OOM the
    # driver); the checks fall back to the AQE-planned join, same output.
    broadcast_dup_candidates: bool = True
    # Token-PAYLOAD distribution check: when set, the engine also emits a
    # per-partition histogram of the token IDs themselves over this many
    # contiguous vocabulary buckets (ops/tokenstats — np.bincount per Arrow
    # batch; -1/overflow diagnostic buckets), and KL/PSI drift against a
    # persisted baseline histogram when one is supplied. Off by default:
    # it is one extra full pass over the tokens column — the scalar checks
    # read tokens once via the narrow projection, and this check cannot
    # ride that scan (it needs every id, not per-row scalars).
    token_hist_buckets: int | None = None
    checked_columns: tuple[str, ...] = ("doc_id", "tokens", "n_tok", "source")
    # doc_id format rule (Java regex, used via rlike). Caller-declared like
    # the reference's format registry (data_format.py:145-158) — tables whose
    # ids follow another scheme set their own pattern instead of silently
    # failing the doc_id_format check.
    doc_id_pattern: str = r"^doc_\d{10}$"

    # Validate the input table's schema against the engine contract
    # (checks/schema.py) BEFORE the first scan — a missing/mistyped column
    # aborts with one complete error instead of a mid-scan AnalysisException.
    enforce_schema: bool = True

    partition_col: str = "part"
    check_version: str = "v1"
