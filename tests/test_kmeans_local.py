"""r12 driver-local Lloyd path: beneath LOCAL_KMEANS_CELLS the
iterations run on one collected matrix. These tests pin the ONLY
contract that matters — the local path returns exactly the centroids
the distributed path returns (same init, same fold arithmetic, same
HALF_UP 9dp rounding) — plus the rounding replica against Spark's own
round()."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators import kmeans as KM


def _dist_path_centroids(df, id_col, vec_col, k, n_iter, dim):
    """The distributed loop, forced (bypass the local gate)."""
    init = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    if not init:
        return []
    centroids = [(i, list(r[vec_col])) for i, r in enumerate(init)]
    for _ in range(n_iter):
        assigned = KM.assign_to_centroids(df, vec_col, centroids)
        rows = (
            assigned.select(
                "cluster", F.posexplode(F.col(vec_col)).alias("_i", "_x")
            )
            .groupBy("cluster", "_i")
            .agg(F.round(F.avg("_x"), 9).alias("_m"))
            .collect()
        )
        by = {}
        for r in rows:
            by.setdefault(r["cluster"], [0.0] * dim)[r["_i"]] = r["_m"]
        centroids = sorted((c, v) for c, v in by.items())
    return centroids


@pytest.mark.parametrize("k,n_iter", [(4, 2), (16, 3), (7, 0)])
def test_local_equals_distributed(spark, k, n_iter):
    rng = np.random.RandomState(7)
    dim = 16
    rows = [
        (int(i), [float(x) for x in rng.uniform(-3, 3, dim)])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, v array<double>")
    local = KM.lloyd_centroids(df, "vec_id", "v", k, n_iter, dim)
    dist = _dist_path_centroids(df, "vec_id", "v", k, n_iter, dim)
    assert local == dist  # exact doubles, not approx


def test_local_gate_handles_empty_and_degenerate(spark):
    empty = spark.createDataFrame([], "vec_id bigint, v array<double>")
    assert KM.lloyd_centroids(empty, "vec_id", "v", 4, 2, 8) == []
    # k > n: every row its own centroid after init
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [5.0, 6.0])], "vec_id bigint, v array<double>"
    )
    got = KM.lloyd_centroids(df, "vec_id", "v", 5, 1, 2)
    assert [c for c, _ in got] == [0, 1]


def test_round_half_up_9_matches_spark(spark):
    vals = [
        0.1234567885,
        -0.1234567885,
        1.0000000005,
        -1.0000000005,
        0.1,
        -2.5e-9,
        2.5e-9,
        123456.123456789499,
        -0.9999999995,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    want = [r["r"] for r in df.select(F.round("x", 9).alias("r")).collect()]
    got = [KM._round_half_up_9(v) for v in vals]
    assert got == want


def test_round_half_up_9_fuzz_matches_spark(spark):
    rng = np.random.RandomState(11)
    vals = [float(x) for x in rng.uniform(-2, 2, 2000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    want = [r["r"] for r in df.select(F.round("x", 9).alias("r")).collect()]
    got = [KM._round_half_up_9(v) for v in vals]
    assert got == want
