"""Pin the persist-path scheduling restructure (r6) to the sequential path.

The persist=True engine runs phase-0 passes (imperative sketch aggregates,
global re-aggregate, doc_id hash-candidate detection) over the
column-pruned source concurrently with the narrow-store build, fuses both
dup probe joins into one scan, and overlaps the row-violation pass with
the dup chain. None of that may change a single output tuple: this test
runs the SAME planted-defect corpus through persist=True and persist=False
under the at-scale config (hash dedup, approx quantiles) and asserts the
violations multiset is identical and the verdict rows agree after the
engine's own 6-dp quantization.
"""

from __future__ import annotations

from ultragendataset_datachecker_spark.config import EngineConfig
from ultragendataset_datachecker_spark.engine import ValidationEngine


def _viol_rows(res):
    return sorted(tuple(str(x) for x in r) for r in res.violations.collect())


def _verdict_rows(res):
    rows = []
    for r in res.verdicts.collect():
        d = r.asDict()
        rows.append(tuple(
            (k, round(v, 6) if isinstance(v, float) else str(v))
            for k, v in sorted(d.items())
        ))
    return sorted(rows)


def test_persist_schedule_matches_sequential(spark, gen_spec, sequences_df):
    cfg = EngineConfig(
        vocab_size=gen_spec.vocab_size,
        allowed_sources=tuple(gen_spec.sources),
        exact_quantiles=False,
        verify_token_dups_exactly=False,
    )
    res_p = ValidationEngine(cfg).run(sequences_df, persist=True)
    res_s = ValidationEngine(cfg).run(sequences_df, persist=False)
    try:
        assert _viol_rows(res_p) == _viol_rows(res_s)
        assert _verdict_rows(res_p) == _verdict_rows(res_s)
        assert len(_viol_rows(res_p)) > 0
    finally:
        res_p.unpersist()


def test_persist_schedule_exact_verify_config(spark, gen_spec, sequences_df):
    """The verify_token_dups_exactly=True persist path (no candidate
    pre-materialization, separate dup forms) must also match its
    sequential form."""
    cfg = EngineConfig(
        vocab_size=gen_spec.vocab_size,
        allowed_sources=tuple(gen_spec.sources),
        verify_token_dups_exactly=True,
    )
    res_p = ValidationEngine(cfg).run(sequences_df, persist=True)
    res_s = ValidationEngine(cfg).run(sequences_df, persist=False)
    try:
        assert _viol_rows(res_p) == _viol_rows(res_s)
    finally:
        res_p.unpersist()
