"""Deterministic global training shuffle (ops/ordering.py)."""

import os

from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.ops.ordering import shuffled_shards, write_shuffled


def _docs(spark, n=500):
    return spark.range(n).select(
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("doc_id"),
        (F.col("id") % 7).alias("payload"),
    )


def test_total_order_bijection(spark):
    d = _docs(spark)
    out = shuffled_shards(d, n_shards=8, seed="epoch-0").persist()
    try:
        n = out.count()
        assert n == 500
        # (shard, pos) is a key: one row per position, no gaps per shard
        assert out.select("shard", "pos").distinct().count() == n
        per = out.groupBy("shard").agg(
            F.count("*").alias("n"), F.min("pos").alias("lo"), F.max("pos").alias("hi")
        ).collect()
        assert {r["lo"] for r in per} == {1}
        assert all(r["hi"] == r["n"] for r in per)
        # every original column carried through
        assert set(out.columns) == {"doc_id", "payload", "shard", "pos"}
    finally:
        out.unpersist()


def test_deterministic_across_runs_and_partitionings(spark):
    d = _docs(spark)
    a = shuffled_shards(d, n_shards=4).orderBy("shard", "pos").collect()
    b = shuffled_shards(d.repartition(13), n_shards=4).orderBy("shard", "pos").collect()
    assert a == b


def test_seed_changes_permutation_not_membership(spark):
    d = _docs(spark)
    a = shuffled_shards(d, n_shards=4, seed="epoch-0")
    b = shuffled_shards(d, n_shards=4, seed="epoch-1")
    # same documents, different order
    assert a.select("doc_id").subtract(b.select("doc_id")).count() == 0
    diff = (
        a.select("doc_id", "shard", "pos")
        .exceptAll(b.select("doc_id", "shard", "pos"))
        .count()
    )
    assert diff > 400  # nearly every row moves under a fresh seed


def test_order_is_shuffled_not_input_order(spark):
    d = _docs(spark)
    out = shuffled_shards(d, n_shards=1)
    rows = [r["doc_id"] for r in out.orderBy("pos").collect()]
    assert rows != sorted(rows)
    assert rows != [f"doc-{i}" for i in range(500)]


def test_write_shuffled_roundtrip(spark, tmp_path):
    d = _docs(spark, n=200)
    path = os.path.join(str(tmp_path), "shuffled")
    write_shuffled(d, path, n_shards=4, seed="epoch-0")
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert back.select("shard").distinct().count() == 4
    # layout matches the logical operator exactly
    expect = shuffled_shards(d, n_shards=4, seed="epoch-0")
    assert (
        back.select("doc_id", "shard", "pos")
        .exceptAll(expect.select("doc_id", "shard", "pos"))
        .count()
        == 0
    )


def test_curate_cli_shuffle_shards(spark, tmp_path, capsys):
    import json

    from ultragendataset_datachecker_spark import curate

    rows = [(i, f"document body {i} with plain text", "s0") for i in range(60)]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.parquet(src)
    out = str(tmp_path / "out")
    rc = curate.main(
        ["--input", src, "--output", out, "--shuffle-shards", "4",
         "--shuffle-seed", "epoch-7", "--master", "local[4]"]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["docs_kept"] == 60
    kept = spark.read.parquet(f"{out}/kept")
    assert kept.count() == 60
    assert set(kept.columns) >= {"doc_id", "shard", "pos"}
    assert kept.select("shard").distinct().count() == 4
    # layout matches the logical operator under the same seed
    expect = shuffled_shards(
        spark.read.parquet(src), n_shards=4, seed="epoch-7"
    ).select("doc_id", "shard", "pos")
    assert kept.select("doc_id", "shard", "pos").exceptAll(expect).count() == 0


def test_reserved_columns_rejected(spark):
    import pytest

    df = _docs(spark).withColumn("shard", F.lit(1))
    with pytest.raises(ValueError, match="reserved column"):
        shuffled_shards(df, 4)
    df2 = _docs(spark).withColumn("_hd", F.lit("x"))
    with pytest.raises(ValueError, match="reserved column"):
        shuffled_shards(df2, 4)


def test_null_ids_fail_fast(spark):
    import pytest
    from py4j.protocol import Py4JJavaError

    df = _docs(spark, 50).withColumn(
        "doc_id", F.when(F.col("payload") == 3, F.lit(None)).otherwise(F.col("doc_id"))
    )
    # count() would let Catalyst prune the guarded column — force shard eval
    with pytest.raises(Exception, match="null doc_id") as exc:
        shuffled_shards(df, 4).select(F.max("shard")).collect()
    assert isinstance(exc.value, Py4JJavaError) or "null doc_id" in str(exc.value)


def test_curate_cli_shuffle_shards_zero_rejected(tmp_path, capsys):
    import pytest

    from ultragendataset_datachecker_spark import curate

    for bad in ("0", "-2"):
        with pytest.raises(SystemExit) as exc:
            curate.main(["--input", "x", "--output", str(tmp_path / "o"),
                         "--shuffle-shards", bad])
        assert exc.value.code == 2
        assert "must be >= 1" in capsys.readouterr().err


def test_write_shuffled_one_sorted_file_per_shard(spark, tmp_path):
    """Over-partitioning (4x n_shards) must never split one shard across
    files — each shard directory keeps a single fully-sorted parquet file."""
    import glob

    out = str(tmp_path / "sharded")
    write_shuffled(_docs(spark, 400), out, n_shards=8)
    for s in range(8):
        files = glob.glob(f"{out}/shard={s}/*.parquet")
        assert len(files) == 1, f"shard {s} split across {len(files)} files"
    back = spark.read.parquet(out)
    assert back.count() == 400
    assert back.select("shard").distinct().count() == 8
