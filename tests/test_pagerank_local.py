"""r12 driver-local pagerank path: beneath LOCAL_PR_EDGES the power
iteration runs on one collected edge list. Every step is exact int64
arithmetic, so local must be BIT-identical to the distributed loop —
pinned here by running both paths on the same graphs (ints AND string
node ids, dangling nodes, iterations=0)."""

import numpy as np
import pytest

from news_clustering_and_summarization_spark.operators import graph as G


def _both_paths(spark, rows, schema, iterations):
    e = spark.createDataFrame(rows, schema)
    local = {
        tuple(r)
        for r in G.pagerank_fixed_point(e, iterations=iterations).collect()
    }
    saved = G.LOCAL_PR_EDGES
    G.LOCAL_PR_EDGES = -1  # force the distributed loop
    try:
        dist = {
            tuple(r)
            for r in G.pagerank_fixed_point(
                e, iterations=iterations
            ).collect()
        }
    finally:
        G.LOCAL_PR_EDGES = saved
    return local, dist


@pytest.mark.parametrize("iterations", [0, 1, 3])
def test_local_bit_equals_distributed_int_ids(spark, iterations):
    rng = np.random.RandomState(3)
    rows = list(
        {
            (int(a), int(b))
            for a, b in rng.randint(0, 60, size=(400, 2))
            if a != b
        }
    )
    local, dist = _both_paths(
        spark, rows, "src bigint, dst bigint", iterations
    )
    assert local == dist


def test_local_bit_equals_distributed_string_ids_dangling(spark):
    # w3 is dangling (no out-edges): keeps teleport-only rank
    rows = [("w1", "w2"), ("w2", "w1"), ("w1", "w3"), ("w4", "w3")]
    local, dist = _both_paths(spark, rows, "src string, dst string", 3)
    assert local == dist
    ranks = dict(local)
    assert ranks["w3"] > ranks["w4"]  # w3 gathers, w4 only teleports


def test_local_empty_graph(spark):
    e = spark.createDataFrame([], "src bigint, dst bigint")
    assert G.pagerank_fixed_point(e, iterations=2).collect() == []
