"""Lloyd's k-means (operators/kmeans.py): planted-cluster recovery,
determinism, shuffle-free assignment plan, and edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators.kmeans import (
    assign_to_centroids,
    lloyd_kmeans,
)


@pytest.fixture(scope="module")
def planted(spark):
    # 3 tight blobs in 4-d, 8 points each, ids interleaved so the
    # first-k init picks points from distinct blobs
    centers = [
        [0.0, 0.0, 0.0, 0.0],
        [10.0, 10.0, 0.0, 0.0],
        [0.0, 0.0, 10.0, 10.0],
    ]
    rows = []
    for j in range(8):
        for b, c in enumerate(centers):
            jitter = ((j * 7 + b * 3) % 5) * 0.01
            rows.append(
                (j * 3 + b, [x + jitter for x in c], b)
            )
    return spark.createDataFrame(
        rows, "id long, v array<double>, truth int"
    )


def test_recovers_planted_blobs(spark, planted):
    out = lloyd_kmeans(planted, "id", "v", k=3, n_iter=3, dim=4)
    joined = out.join(planted.select("id", "truth"), "id").collect()
    by_truth = {}
    for r in joined:
        by_truth.setdefault(r["truth"], set()).add(r["cluster"])
    # each blob lands in exactly one cluster, blobs don't merge
    assert all(len(v) == 1 for v in by_truth.values()), by_truth
    assert len({next(iter(v)) for v in by_truth.values()}) == 3
    # tight blobs -> tiny final sqdist
    assert all(r["sqdist"] < 0.01 for r in joined)


def test_deterministic_across_runs(spark, planted):
    a = sorted(
        lloyd_kmeans(planted, "id", "v", k=3, n_iter=2, dim=4).collect()
    )
    b = sorted(
        lloyd_kmeans(planted, "id", "v", k=3, n_iter=2, dim=4).collect()
    )
    assert a == b


def test_assignment_is_shuffle_free(spark, planted):
    cents = [(0, [0.0] * 4), (1, [10.0, 10.0, 0.0, 0.0])]
    out = assign_to_centroids(planted, "v", cents)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_argmin_tiebreak_low_cluster(spark):
    # a point equidistant from two centroids goes to the lower id
    df = spark.createDataFrame([(1, [5.0])], "id long, v array<double>")
    out = assign_to_centroids(
        df, "v", [(0, [0.0]), (1, [10.0])]
    ).collect()[0]
    assert out["cluster"] == 0 and out["sqdist"] == 25.0


def test_n_iter_zero_assigns_to_init(spark, planted):
    out = lloyd_kmeans(planted, "id", "v", k=3, n_iter=0, dim=4)
    # init centroids are the first 3 ids (one per blob by layout),
    # so every point still lands with its blob-mate
    joined = out.join(planted.select("id", "truth"), "id").collect()
    clusters_per_truth = {}
    for r in joined:
        clusters_per_truth.setdefault(r["truth"], set()).add(r["cluster"])
    assert all(len(v) == 1 for v in clusters_per_truth.values())


def test_bad_params_rejected(spark, planted):
    with pytest.raises(ValueError):
        lloyd_kmeans(planted, "id", "v", k=0, n_iter=1, dim=4)


def test_duplicate_init_centroids_collapse(spark):
    """If two init centroids are identical (duplicate first-k
    vectors), the tie goes to the lower cluster id and the higher one
    empties and drops out after one iteration — in both engines the
    groupBy simply produces no row for it."""
    from pyspark.sql import functions as F  # noqa: F401

    rows = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),   # duplicate of id 0 -> duplicate centroid
        (2, [9.0, 9.0]),
        (3, [9.1, 9.0]),
        (4, [0.1, 0.0]),
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = lloyd_kmeans(df, "id", "v", k=3, n_iter=2, dim=2)
    got = {r["id"]: r["cluster"] for r in out.collect()}
    # cluster 1 (the duplicate centroid) captured nothing and vanished
    assert set(got.values()) == {0, 2}
    assert got[0] == got[1] == got[4] == 0
    assert got[2] == got[3] == 2


def test_k_larger_than_n(spark):
    df = spark.createDataFrame(
        [(0, [0.0]), (1, [5.0])], "id long, v array<double>"
    )
    out = lloyd_kmeans(df, "id", "v", k=5, n_iter=1, dim=1)
    got = {r["id"]: r["cluster"] for r in out.collect()}
    assert got == {0: 0, 1: 1}


def test_empty_input_returns_typed_empty(spark):
    df = spark.createDataFrame([], "id long, v array<double>")
    out = lloyd_kmeans(df, "id", "v", k=3, n_iter=2, dim=4)
    assert out.count() == 0
    assert dict(out.dtypes) == {
        "id": "bigint", "cluster": "int", "sqdist": "double"
    }
