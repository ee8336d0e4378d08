"""Versioned snapshot publishing (sources/tables.publish_snapshot):
readers always see a complete version, the pointer flips atomically,
old versions survive until pruned, and pruning never deletes the
pointed-to version."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.sources import tables as T


def _df(spark, n, tag):
    return spark.range(n).select(
        F.col("id").alias("k"), F.lit(tag).alias("tag")
    )


def test_publish_and_read_latest(spark, tmp_path):
    base = os.path.join(str(tmp_path), "serve")
    v1 = T.publish_snapshot(_df(spark, 10, "one"), base)
    assert v1 == 1
    got = T.read_latest_snapshot(spark, base)
    assert got.count() == 10 and got.first()["tag"] == "one"
    v2 = T.publish_snapshot(_df(spark, 25, "two"), base)
    assert v2 == 2
    got = T.read_latest_snapshot(spark, base)
    assert got.count() == 25 and got.first()["tag"] == "two"


def test_old_version_remains_readable(spark, tmp_path):
    base = os.path.join(str(tmp_path), "serve")
    T.publish_snapshot(_df(spark, 5, "one"), base)
    # a long-running reader binds to v=1 ...
    old = spark.read.parquet(os.path.join(base, "v=1"))
    T.publish_snapshot(_df(spark, 9, "two"), base)
    # ... and still completes its scan after the pointer moved
    assert old.count() == 5


def test_read_before_any_publish_raises(spark, tmp_path):
    base = os.path.join(str(tmp_path), "serve")
    try:
        T.read_latest_snapshot(spark, base)
        raise AssertionError("expected FileNotFoundError")
    except FileNotFoundError:
        pass


def test_prune_keeps_latest(spark, tmp_path):
    base = os.path.join(str(tmp_path), "serve")
    for i in range(4):
        T.publish_snapshot(_df(spark, i + 1, f"t{i}"), base)
    deleted = T.prune_snapshots(spark, base, keep=2)
    assert deleted == 2
    left = sorted(
        d for d in os.listdir(base) if d.startswith("v=")
    )
    assert left == ["v=3", "v=4"]
    assert T.read_latest_snapshot(spark, base).count() == 4
