import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ultragendataset_datachecker_spark.session import get_spark  # noqa: E402
from ultragendataset_datachecker_spark.datagen import DefectSpec, GenSpec, generate_sequences  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest-engine", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def gen_spec():
    return GenSpec(n_rows=4_000, n_parts=4, seed=42, defects=DefectSpec())


@pytest.fixture(scope="session")
def sequences_df(spark, gen_spec):
    df = generate_sequences(spark, gen_spec).persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="session")
def sequences_pdf(sequences_df):
    pdf = sequences_df.toPandas()
    # arrays arrive as numpy arrays / lists; normalize to tuples-compatible lists
    pdf["tokens"] = pdf["tokens"].map(lambda a: None if a is None else list(a))
    return pdf
