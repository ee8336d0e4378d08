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


def test_compact_parquet_reduces_files_keeps_rows(spark):
    li = load(spark, SF_SMOKE, "lineitem")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "li")
        li.repartition(20).write.parquet(path)  # fragment: 20 files
        before = spark.read.parquet(path)
        n_rows = before.count()
        total = before.agg(F.sum("l_quantity")).first()[0]
        assert len(before.inputFiles()) == 20
        n_files = T.compact_parquet(spark, path, target_files=2)
        after = spark.read.parquet(path)
        assert n_files == len(after.inputFiles()) == 2
        assert after.count() == n_rows
        assert abs(after.agg(F.sum("l_quantity")).first()[0] - total) < 1e-6


def test_compact_with_sort_clusters_ranges(spark):
    """repartitionByRange compaction leaves each file covering a
    disjoint key range (footer min/max become useful for pruning)."""
    li = load(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "li")
        li.repartition(10).write.parquet(path)
        T.compact_parquet(spark, path, target_files=4, sort_by=["l_orderkey"])
        after = spark.read.parquet(path)
        spans = (
            after.groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi")
            )
            .collect()
        )
        spans = sorted([(r.lo, r.hi) for r in spans])
        for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
            assert hi_prev <= lo_next, spans


def test_read_evolved_merges_added_column(spark):
    with tempfile.TemporaryDirectory() as d:
        v1 = os.path.join(d, "p1")
        v2 = os.path.join(d, "p2")
        spark.createDataFrame(
            [("a", "hello")], ["id", "text"]
        ).write.parquet(v1)
        spark.createDataFrame(
            [("b", "welt", "de")], ["id", "text", "lang"]
        ).write.parquet(v2)
        df = T.read_evolved(spark, v1, v2)
        assert set(df.columns) == {"id", "text", "lang"}
        rows = {r.id: r.lang for r in df.collect()}
        assert rows == {"a": None, "b": "de"}


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


def test_zorder_key_matches_reference_interleave(spark):
    from news_clustering_and_summarization_spark.sources.tables import (
        zorder_key,
    )

    def ref_key(cells, bits):
        d, key = len(cells), 0
        for j in range(bits):
            for i, c in enumerate(cells):
                key |= ((c >> j) & 1) << (j * d + (d - 1 - i))
        return key

    bits = 4
    n = 1 << bits
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x int, y int")
    # min=0, max=n: value v lands in cell v exactly (span n, * 2^bits)
    got = df.select(
        "x", "y",
        zorder_key(
            [F.col("x"), F.col("y")], [0.0, 0.0], [float(n), float(n)],
            bits=bits,
        ).alias("z"),
    ).collect()
    for r in got:
        assert r["z"] == ref_key([r["x"], r["y"]], bits), r


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    import random

    from news_clustering_and_summarization_spark.sources.tables import (
        write_zordered,
    )

    rng = random.Random(7)
    rows = [(rng.random() * 100, rng.random() * 100) for _ in range(20000)]
    df = spark.createDataFrame(rows, "x double, y double").repartition(16)

    zpath = str(tmp_path / "zordered")
    ranges = write_zordered(df, zpath, ["x", "y"], num_files=16)
    assert [round(r[0]) for r in ranges] == [0, 0]

    def mean_bbox_area(path):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("x") - F.min("x")).alias("dx"),
                (F.max("y") - F.min("y")).alias("dy"),
            )
            .select(F.avg(F.col("dx") * F.col("dy")).alias("a"))
            .collect()
        )
        return per_file[0]["a"]

    rpath = str(tmp_path / "random_layout")
    df.write.parquet(rpath)

    za, ra = mean_bbox_area(zpath), mean_bbox_area(rpath)
    # random layout: every file spans ~the whole 100x100 space
    # (area ~10000); z-order files cover tight cells — well under half
    assert za < ra * 0.5, (za, ra)
