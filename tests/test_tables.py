"""Storage-layer scale features: bucketed tables must join without
any Exchange (co-located buckets), and partitioned writes must prune
non-matching directories at scan time."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.plans.catalog import load
from news_clustering_and_summarization_spark.sources import tables as T
from tests.conftest import SF_SMOKE


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_exchange_free(spark):
    o = T.write_bucketed(
        load(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderpriority"),
        "t_orders_bkt",
        4,
        "o_orderkey",
        sort_cols=["o_orderkey"],
    )
    l = T.write_bucketed(
        load(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity"),
        "t_lineitem_bkt",
        4,
        "l_orderkey",
        sort_cols=["l_orderkey"],
    )
    # at fixture scale Catalyst would broadcast; the merge hint forces
    # the large-large strategy this demo is about
    joined = spark.table(l).hint("merge").join(
        spark.table(o), F.col("l_orderkey") == F.col("o_orderkey")
    )
    plan = _physical_plan(joined)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Bucketed: true" in plan, plan
    # same rows as joining the raw parquet
    raw = load(spark, SF_SMOKE, "lineitem").join(
        load(spark, SF_SMOKE, "orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    assert joined.count() == raw.count()


def test_bucketed_groupby_reuses_bucketing(spark):
    l = T.write_bucketed(
        load(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity"),
        "t_lineitem_bkt2",
        4,
        "l_orderkey",
    )
    agg = spark.table(l).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    assert "Exchange" not in _physical_plan(agg)


def test_partitioned_write_prunes(spark):
    # load() already surfaces ts as a proper timestamp (nanos handled)
    ev = load(spark, SF_SMOKE, "events").withColumn("day", F.to_date("ts"))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "events_by_day")
        T.write_partitioned(ev, path, "day")
        back = spark.read.parquet(path)
        days = [r.day for r in back.select("day").distinct().collect()]
        assert len(days) > 1, "fixture must span multiple days"
        one = back.where(F.col("day") == days[0])
        # input_file_name() reflects the files actually opened after
        # partition pruning (inputFiles() ignores filters)
        read = [
            r[0]
            for r in one.select(F.input_file_name()).distinct().collect()
        ]
        total = back.inputFiles()
        assert 0 < len(read) < len(total), (len(read), len(total))
        assert all(f"day={days[0]}" in f for f in read)
        plan = _physical_plan(one)
        assert "PartitionFilters" in plan and "day" in plan
        assert one.count() == ev.where(F.col("day") == days[0]).count()
