"""Targeted delete (sources/tables.apply_deletes): completeness,
survivor fidelity, file-level pruning (untouched files are not
rewritten), and the no-op fast path."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.sources import tables as T


def _write_ranged(spark, path, n=400, files=8):
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    df.repartitionByRange(files, "k").write.mode("overwrite").parquet(path)
    return df


def test_delete_completeness_and_survivors(spark, tmp_path):
    path = os.path.join(str(tmp_path), "ds")
    _write_ranged(spark, path)
    deletes = spark.range(37).select(F.col("id").alias("k"))
    stats = T.apply_deletes(spark, path, deletes, "k")
    assert stats["rows_deleted"] == 37
    after = spark.read.parquet(path)
    assert after.count() == 400 - 37
    assert after.where(F.col("k") < 37).count() == 0
    # survivors keep their payload
    bad = after.where(F.col("v") != F.col("k") * 2).count()
    assert bad == 0


def test_untouched_files_not_rewritten(spark, tmp_path):
    path = os.path.join(str(tmp_path), "ds")
    _write_ranged(spark, path, n=400, files=8)
    before = {
        f: os.path.getmtime(f.removeprefix("file:"))
        for f in spark.read.parquet(path).inputFiles()
    }
    # clustered delete list -> lives in ~1 of 8 range partitions
    deletes = spark.range(30).select(F.col("id").alias("k"))
    stats = T.apply_deletes(spark, path, deletes, "k")
    assert 0 < stats["files_rewritten"] < stats["files_total"]
    after_files = set(spark.read.parquet(path).inputFiles())
    untouched = {
        f for f in before if f in after_files
    }
    # at least one original file survived byte-for-byte (same mtime)
    assert untouched
    for f in untouched:
        assert os.path.getmtime(f.removeprefix("file:")) == before[f]


def test_noop_when_no_match(spark, tmp_path):
    path = os.path.join(str(tmp_path), "ds")
    _write_ranged(spark, path, n=100, files=4)
    before = sorted(spark.read.parquet(path).inputFiles())
    deletes = spark.createDataFrame([(10_000,), (10_001,)], "k long")
    stats = T.apply_deletes(spark, path, deletes, "k")
    assert stats == {
        "files_total": 4,
        "files_rewritten": 0,
        "rows_deleted": 0,
    }
    assert sorted(spark.read.parquet(path).inputFiles()) == before


def test_duplicate_delete_keys_are_deduped(spark, tmp_path):
    path = os.path.join(str(tmp_path), "ds")
    _write_ranged(spark, path, n=50, files=2)
    deletes = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    stats = T.apply_deletes(spark, path, deletes, "k")
    assert stats["rows_deleted"] == 2
    assert spark.read.parquet(path).count() == 48
