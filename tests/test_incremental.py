"""Incremental aggregate maintenance (operators/incremental.py):
merge == full recompute, composition over repeated refreshes, new /
absent key handling, and the plan shape (delta partials combine
map-side; history is never re-scanned)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators.incremental import (
    finalize_aggregates,
    merge_aggregate_state,
    partial_aggregate,
)


@pytest.fixture(scope="module")
def batches(spark):
    b1 = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 5.0)], "k string, v double"
    )
    b2 = spark.createDataFrame(
        [("a", 30.0), ("c", 7.0)], "k string, v double"
    )
    b3 = spark.createDataFrame(
        [("b", 1.0), ("c", 2.0), ("c", 100.0)], "k string, v double"
    )
    return b1, b2, b3


def _final(state):
    return {
        r["k"]: r
        for r in finalize_aggregates(state, ["k"]).collect()
    }


def test_merge_equals_full_recompute(spark, batches):
    b1, b2, b3 = batches
    state = partial_aggregate(b1, ["k"], "v")
    for b in (b2, b3):
        state = merge_aggregate_state(
            state, partial_aggregate(b, ["k"], "v"), ["k"]
        )
    want = _final(
        partial_aggregate(b1.union(b2).union(b3), ["k"], "v")
    )
    got = _final(state)
    assert got.keys() == want.keys()
    for k in want:
        for c in ("n", "total_value", "avg_value", "min_value", "max_value"):
            assert got[k][c] == want[k][c], (k, c, got[k], want[k])


def test_new_and_absent_keys(spark, batches):
    b1, b2, _ = batches
    state = merge_aggregate_state(
        partial_aggregate(b1, ["k"], "v"),
        partial_aggregate(b2, ["k"], "v"),
        ["k"],
    )
    rows = _final(state)
    # 'c' arrived only in the delta; 'b' only in history — both present
    assert rows["c"]["n"] == 1 and rows["c"]["total_value"] == 7.0
    assert rows["b"]["n"] == 1 and rows["b"]["total_value"] == 5.0
    assert rows["a"]["n"] == 3 and rows["a"]["total_value"] == 60.0
    assert rows["a"]["min_value"] == 10.0
    assert rows["a"]["max_value"] == 30.0


def test_null_key_merges_with_null_key(spark):
    # eqNullSafe join: a NULL group key is a real group and must merge,
    # not fan out into two rows
    h = spark.createDataFrame([(None, 1.0), ("x", 2.0)], "k string, v double")
    d = spark.createDataFrame([(None, 3.0)], "k string, v double")
    state = merge_aggregate_state(
        partial_aggregate(h, ["k"], "v"),
        partial_aggregate(d, ["k"], "v"),
        ["k"],
    )
    rows = {r["k"]: r for r in state.collect()}
    assert len(rows) == 2
    assert rows[None]["n"] == 2 and float(rows[None]["sum_value"]) == 4.0


def test_delta_partials_combine_map_side(spark, batches):
    """The delta aggregation must plan as partial -> exchange -> final
    hash aggregate (shuffle carries combined rows, not raw data)."""
    b1, _, _ = batches
    plan = (
        partial_aggregate(b1, ["k"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("HashAggregate") >= 2, plan
