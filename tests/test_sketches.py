"""Approximate aggregates (come free with Spark per SURVEY §2.4 note;
no exact-match oracle possible across engines, so accuracy-bound
tests): HLL distinct counts and t-digest quantiles must land within
their documented error of the exact answers, and streaming
dropDuplicatesWithinWatermark must dedup inside the horizon."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.plans.catalog import load
from tests.conftest import SF_SMOKE


def test_approx_count_distinct_within_rsd(spark):
    orders = load(spark, SF_SMOKE, "orders")
    exact = orders.select(
        F.countDistinct("o_custkey").alias("n")
    ).first()["n"]
    approx = orders.select(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n")
    ).first()["n"]
    assert abs(approx - exact) <= 0.06 * exact, (approx, exact)


def test_percentile_approx_within_bound(spark):
    li = load(spark, SF_SMOKE, "lineitem")
    exact = li.select(
        F.expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.5D)").alias("m")
    ).first()["m"]
    approx = li.select(
        F.percentile_approx(
            F.col("l_extendedprice").cast("double"), 0.5, 10000
        ).alias("m")
    ).first()["m"]
    assert abs(approx - exact) / exact < 0.01, (approx, exact)


def test_drop_duplicates_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)

    def write(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for rid, ts in rows:
                f.write(json.dumps({"id": rid, "ts": ts}) + "\n")

    # same id twice within the watermark horizon -> second dropped
    write(
        "f1.json",
        [("a", "2024-01-01 10:00:00"), ("a", "2024-01-01 10:01:00"),
         ("b", "2024-01-01 10:02:00")],
    )
    stream = (
        spark.readStream.schema("id string, ts string")
        .option("maxFilesPerTrigger", "1")
        .json(src)
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ddw_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        ids = [r.id for r in spark.table("ddw_sink").collect()]
        assert sorted(ids) == ["a", "b"], ids
    finally:
        q.stop()


def test_sketch_profile_certifies_and_matches(spark, duck):
    from news_clustering_and_summarization_spark.operators.profiling import (
        sketch_profile,
    )
    from tests.conftest import assert_matches_oracle

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = sketch_profile(docs, "source", "text", rsd=0.05)
    assert_matches_oracle(
        out,
        duck,
        """
        SELECT source, count(*) AS n_rows,
               count(DISTINCT text) AS n_distinct, true AS sketch_ok
        FROM documents GROUP BY source
        """,
    )


def test_sketch_profile_assert_fires_on_impossible_tolerance(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    from news_clustering_and_summarization_spark.operators.profiling import (
        sketch_profile,
    )
    import pytest as _pytest

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    bad = sketch_profile(
        docs, "source", "text", rsd=0.05, tolerance_mult=0.0
    )
    with _pytest.raises(SparkRuntimeException):
        bad.collect()
