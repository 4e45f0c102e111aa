"""Generator invariants: determinism across parallelism, schema, defect sets."""

import pyspark.sql.types as T

from ultragendataset_datachecker_spark.datagen import GenSpec, generate_sequences


def test_schema(sequences_df):
    s = sequences_df.schema
    assert s["doc_id"].dataType == T.StringType()
    assert s["tokens"].dataType == T.ArrayType(T.IntegerType(), True)
    assert s["n_tok"].dataType == T.IntegerType()
    assert s["source"].dataType == T.StringType()
    assert s["part"].dataType == T.IntegerType()


def test_row_count(sequences_df, gen_spec):
    assert sequences_df.count() == gen_spec.n_rows


def test_deterministic_across_partitioning(spark, gen_spec):
    a = generate_sequences(spark, gen_spec, num_range_partitions=2)
    b = generate_sequences(spark, gen_spec, num_range_partitions=37)
    # identical content regardless of parallelism
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_planted_dup_rows_are_exact_copies(sequences_pdf, gen_spec):
    blocks = gen_spec.defects.blocks(gen_spec.n_rows)
    lo, hi = blocks["dup_doc_id_exact"]
    by_doc = sequences_pdf.set_index(sequences_pdf.index)
    for i in range(lo, hi):
        src = i - gen_spec.n_rows // 2
        doc = f"doc_{src:010d}"
        rows = sequences_pdf[sequences_pdf.doc_id == doc]
        assert len(rows) == 2, doc
        toks = rows.tokens.tolist()
        assert toks[0] == toks[1], f"{doc} copies differ"


def test_planted_dup_diff_rows_differ(sequences_pdf, gen_spec):
    blocks = gen_spec.defects.blocks(gen_spec.n_rows)
    lo, hi = blocks["dup_doc_id_diff"]
    for i in range(lo, hi):
        src = i - gen_spec.n_rows // 2
        doc = f"doc_{src:010d}"
        rows = sequences_pdf[sequences_pdf.doc_id == doc]
        assert len(rows) == 2
        toks = rows.tokens.tolist()
        assert toks[0] != toks[1]


def test_hot_source_skew(sequences_pdf, gen_spec):
    counts = sequences_pdf.source.value_counts(normalize=True)
    assert counts.iloc[0] > 0.5  # hot source dominates (skew fixture)
    assert counts.index[0] == gen_spec.sources[0]
