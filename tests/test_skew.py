"""Salted join must be row-for-row identical to the plain join and
must actually spread a hot key across salt buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators.skew import (
    adaptive_salted_join,
    salted_join,
)
from news_clustering_and_summarization_spark.plans.catalog import load
from tests.conftest import SF_SMOKE


def test_salted_inner_equals_plain(spark):
    li = load(spark, SF_SMOKE, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_quantity"
    )
    orders = load(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    salted = salted_join(li, orders, on="okey", salt=8)
    plain = li.join(orders, "okey")
    assert sorted(salted.columns) == sorted(plain.columns)
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_left_keeps_unmatched(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(100)] + [("orphan", -1)], ["k", "v"]
    )
    small = spark.createDataFrame([("hot", "H")], ["k", "tag"])
    out = salted_join(big, small, on="k", salt=4, how="left")
    assert out.count() == 101
    assert out.where("k = 'orphan' AND tag IS NULL").count() == 1


def test_adaptive_salted_equals_plain(spark):
    # one hot key (400 rows), many cold keys, plus an orphan
    big = spark.createDataFrame(
        [("hot", i) for i in range(400)]
        + [(f"cold{i}", i) for i in range(50)]
        + [("orphan", -1)],
        ["k", "v"],
    )
    small = spark.createDataFrame(
        [("hot", "H")] + [(f"cold{i}", f"C{i}") for i in range(50)],
        ["k", "tag"],
    )
    for how in ("inner", "left"):
        got = adaptive_salted_join(
            big, small, on="k", salt=4, hot_threshold=100, how=how
        )
        want = big.join(small, "k", how)
        assert got.exceptAll(want).count() == 0, how
        assert want.exceptAll(got).count() == 0, how


def test_hot_key_spreads_over_salt_buckets(spark):
    big = spark.createDataFrame([("hot", i) for i in range(500)], ["k", "v"])
    buckets = (
        big.withColumn(
            "_salt", F.pmod(F.xxhash64("k", "v"), F.lit(8)).cast("int")
        )
        .select("_salt")
        .distinct()
        .count()
    )
    assert buckets == 8


def test_aqe_splits_skewed_bare_join(spark):
    """AQE's OptimizeSkewedJoin splits the hot partition when the join
    is shuffle-terminal; a downstream groupBy suppresses it (extra
    shuffle) — which is exactly when operators/skew.py's salted joins
    earn their keep."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = (
            spark.range(200_000)
            .select(F.lit(0).alias("k"), F.col("id").alias("v"))
            .union(
                spark.range(2_000).select(
                    (F.col("id") % 100 + 1).alias("k"),
                    F.col("id").alias("v"),
                )
            )
        )
        right = spark.range(101).select(
            F.col("id").alias("k"), F.lit("x").alias("tag")
        )
        j = left.join(right, "k")
        assert j.count() == 202_000
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan, plan
        assert "skewed" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
