"""File-stats skipping index (sources/tables.write_stats_index /
read_with_skipping): pruned reads equal full-scan filters, fewer
files are opened on clustered layouts, and empty-prune returns a
typed empty frame."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.sources import tables as T


def _dataset(spark, path):
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("m"),
        (F.col("id") * 1.5).alias("v"),
    )
    # range-partitioned on k -> tight per-file k ranges
    df.repartitionByRange(10, "k").write.mode("overwrite").parquet(path)
    return df


def test_skipping_equals_full_filter(spark, tmp_path):
    path = os.path.join(str(tmp_path), "ds")
    _dataset(spark, path)
    T.write_stats_index(spark, path, ["k", "v"])
    got = T.read_with_skipping(spark, path, {"k": (150, 249)})
    want = (
        spark.read.parquet(path)
        .where((F.col("k") >= 150) & (F.col("k") <= 249))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # clustered layout: the 100-key range lives in ~1-2 of 10 files
    assert len(got.inputFiles()) < len(spark.read.parquet(path).inputFiles())


def test_multi_column_bounds(spark, tmp_path):
    path = os.path.join(str(tmp_path), "ds")
    _dataset(spark, path)
    T.write_stats_index(spark, path, ["k", "v"])
    got = T.read_with_skipping(
        spark, path, {"k": (None, 300), "v": (150.0, None)}
    )
    want = spark.read.parquet(path).where(
        (F.col("k") <= 300) & (F.col("v") >= 150.0)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_empty_prune_returns_typed_empty(spark, tmp_path):
    path = os.path.join(str(tmp_path), "ds")
    _dataset(spark, path)
    T.write_stats_index(spark, path, ["k"])
    got = T.read_with_skipping(spark, path, {"k": (5000, 6000)})
    assert got.count() == 0
    assert dict(got.dtypes)["k"] == "bigint"


def test_residual_filter_is_exact(spark, tmp_path):
    """Skipping is file-granular; rows outside the bound inside a
    surviving file must still be filtered out."""
    path = os.path.join(str(tmp_path), "ds")
    _dataset(spark, path)
    T.write_stats_index(spark, path, ["k"])
    got = T.read_with_skipping(spark, path, {"k": (105, 107)})
    assert sorted(r["k"] for r in got.collect()) == [105, 106, 107]


def test_unclustered_column_skips_nothing_but_stays_correct(spark, tmp_path):
    path = os.path.join(str(tmp_path), "ds")
    _dataset(spark, path)
    T.write_stats_index(spark, path, ["m"])
    # m = id % 7 spans 0..6 in EVERY file -> no pruning possible
    got = T.read_with_skipping(spark, path, {"m": (3, 3)})
    assert got.count() == spark.read.parquet(path).where("m = 3").count()
    assert len(got.inputFiles()) == len(
        spark.read.parquet(path).inputFiles()
    )


def test_stale_index_falls_back_to_full_scan(spark, tmp_path):
    """A rewrite without an index rebuild must not lose rows: drift
    between the manifest and the live file list disables pruning."""
    path = os.path.join(str(tmp_path), "ds")
    _dataset(spark, path)
    T.write_stats_index(spark, path, ["k"])
    # rewrite: delete the rows 0..29 via the targeted-delete path,
    # which rewrites one file under a new name
    deletes = spark.range(30).select(F.col("id").alias("k"))
    T.apply_deletes(spark, path, deletes, "k")
    got = T.read_with_skipping(spark, path, {"k": (0, 199)})
    want = spark.read.parquet(path).where(
        (F.col("k") >= 0) & (F.col("k") <= 199)
    )
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in want.collect()
    )
    # drift detected -> no pruning
    assert len(got.inputFiles()) == len(
        spark.read.parquet(path).inputFiles()
    )
    # rebuilding the index restores pruning
    T.write_stats_index(spark, path, ["k"])
    again = T.read_with_skipping(spark, path, {"k": (150, 199)})
    assert len(again.inputFiles()) < len(
        spark.read.parquet(path).inputFiles()
    )
