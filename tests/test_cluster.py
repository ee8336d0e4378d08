"""Clustering operator tests: DBSCAN(min_samples=2) == ε-graph
connected components, verified three ways — hand-built micro cases, a
DuckDB recursive-CTE oracle on the real embeddings table, and the
reference-faithful incremental semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.functions import vectors as V
from news_clustering_and_summarization_spark.operators import cluster as C
from tests.conftest import SF_SMOKE, assert_matches_oracle


def test_connected_components_micro(spark):
    vertices = spark.createDataFrame([(i,) for i in range(7)], "row_id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (5, 5)], "l_id long, r_id long"
    )
    got = {
        r["row_id"]: r["component"]
        for r in C.connected_components(vertices, edges).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5, 6: 6}


def test_connected_components_chain(spark):
    # worst-case diameter: a path graph, min label must travel end-to-end
    n = 12
    vertices = spark.createDataFrame([(i,) for i in range(n)], "row_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "l_id long, r_id long"
    )
    got = C.connected_components(vertices, edges).collect()
    assert all(r["component"] == 0 for r in got)


def test_brute_force_pairs_symmetric_and_thresholded(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.999, 0.04471]),  # ~0.001 cosine distance from 1
            (3, [0.0, 1.0]),
        ],
        "row_id long, centroid array<double>",
    )
    pairs = C.brute_force_pairs(df, df, eps=0.10).collect()
    got = {(r["l_id"], r["r_id"]) for r in pairs}
    assert got == {(1, 2), (2, 1)}


def test_cluster_batch_matches_duckdb_recursive_oracle(spark, duck):
    """Full ε-graph clustering on the real sf0.001 embeddings table vs a
    DuckDB WITH RECURSIVE min-label-propagation oracle."""
    # the synthetic vectors are near-orthogonal (min pair dist ~0.52),
    # so a large eps is needed for non-trivial components
    eps = 0.8
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    got = C.cluster_batch(
        emb, id_col="vec_id", vec_col="embedding", eps=eps, strategy="cross"
    ).select("vec_id", "cluster_rep", "is_cluster")
    dist = V.cosine_distance_sql("a.embedding", "b.embedding")
    oracle = f"""
    WITH RECURSIVE edges AS (
      SELECT a.vec_id AS src, b.vec_id AS dst
      FROM embeddings a JOIN embeddings b
        ON a.vec_id <> b.vec_id AND {dist} <= {eps}
    ),
    reach AS (
      SELECT vec_id AS id, vec_id AS comp FROM embeddings
      UNION
      SELECT e.dst AS id, r.comp
      FROM reach r JOIN edges e ON e.src = r.id
    ),
    comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
    SELECT c.id AS vec_id, c.component AS cluster_rep,
           (cnt.n >= 2) AS is_cluster
    FROM comp c
    JOIN (SELECT component, count(*) AS n FROM comp GROUP BY component) cnt
      ON cnt.component = c.component
    """
    assert_matches_oracle(got, duck, oracle)


def test_cluster_batch_recovers_planted_groups(spark):
    """Vectors planted in three tight groups + noise singletons must
    come back as exactly those components (golden DBSCAN semantics)."""
    import math
    import random

    rng = random.Random(42)
    rows = []
    centers = [
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [0.0, 0.0, 1.0],
    ]
    gid = 0
    for ci, c in enumerate(centers):
        for _ in range(5):
            v = [x + rng.uniform(-0.02, 0.02) for x in c]
            n = math.sqrt(sum(x * x for x in v))
            rows.append((gid, ci, [x / n for x in v]))
            gid += 1
    # far-away singletons
    for ci, v in enumerate(
        [[0.577, -0.577, 0.577], [-0.577, 0.577, 0.577]], start=len(centers)
    ):
        rows.append((gid, ci, v))
        gid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, truth int, embedding array<double>"
    )
    assigned = C.cluster_batch(
        df, id_col="vec_id", vec_col="embedding", eps=0.10, strategy="cross"
    )
    joined = assigned.join(df.select("vec_id", "truth"), "vec_id").collect()
    by_truth = {}
    for r in joined:
        by_truth.setdefault(r["truth"], set()).add(r["cluster_rep"])
    # each planted group collapses to exactly one component
    for ci in range(3):
        assert len(by_truth[ci]) == 1, by_truth
    assert {r["is_cluster"] for r in joined if r["truth"] < 3} == {True}
    # noise rows are singleton non-clusters
    assert {r["is_cluster"] for r in joined if r["truth"] >= 3} == {False}
    # groups are distinct components
    reps = [next(iter(by_truth[ci])) for ci in range(3)]
    assert len(set(reps)) == 3


def test_lsh_pairs_subset_of_exact(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(200)
    exact = {
        (r["l_id"], r["r_id"])
        for r in C.brute_force_pairs(
            emb, emb, 0.8, id_col="vec_id", vec_col="embedding"
        ).collect()
    }
    lsh = {
        (r["l_id"], r["r_id"])
        for r in C.lsh_candidate_pairs(
            emb, emb, 0.8, id_col="vec_id", vec_col="embedding",
            probe_radius=3,
        ).collect()
    }
    assert lsh <= exact
    # with 8 tables recall should be decent on this data
    assert len(lsh) >= 0.7 * len(exact)


def test_incremental_update_absorbs_singletons(spark):
    state = spark.createDataFrame(
        [
            (1, "cl-a", ["a1", "a2"], True, [1.0, 0.0]),
            (2, "s-b", ["b1"], False, [0.0, 1.0]),
        ],
        "row_id long, cluster_id string, article_ids array<string>, "
        "is_cluster boolean, centroid array<double>",
    )
    batch = spark.createDataFrame(
        [("n1", [1.0, 0.001]), ("n2", [0.0, 0.0, ])],
        "id string, embedding array<double>",
    ).where("size(embedding) = 2")
    batch = spark.createDataFrame(
        [("n1", [1.0, 0.001]), ("n2", [-1.0, 0.0])],
        "id string, embedding array<double>",
    )
    res = C.incremental_cluster_update(state, batch, eps=0.10, strategy="cross")
    new_state = {r["row_id"]: r for r in res["state"].collect()}
    # n1 joins cluster row 1 (absorbed); n2 is a new singleton
    assert new_state[1]["article_ids"] == ["a1", "a2", "n1"]
    assert new_state[1]["is_cluster"] is True
    assert 2 in new_state  # untouched singleton survives
    singles = [r for r in new_state.values() if r["article_ids"] == ["n2"]]
    assert len(singles) == 1 and singles[0]["is_cluster"] is False
    # absorbed row purged: no pool row carries just n1
    assert not [r for r in new_state.values() if r["article_ids"] == ["n1"]]
    ups = res["updates"].collect()
    assert len(ups) == 1 and ups[0]["op"] == "MODIFY"
    assert ups[0]["number_of_articles"] == 3


def test_incremental_update_insert_op_for_newly_formed_cluster(spark):
    """A cluster whose rep was a pre-existing SINGLETON row must emit
    op=INSERT (no metadata row exists yet in the serving store) —
    row_id existence alone is not cluster existence."""
    state = spark.createDataFrame(
        [(1, "s-a", ["a1"], False, [1.0, 0.0])],
        "row_id long, cluster_id string, article_ids array<string>, "
        "is_cluster boolean, centroid array<double>",
    )
    batch = spark.createDataFrame(
        [("n1", [1.0, 0.001])], "id string, embedding array<double>"
    )
    res = C.incremental_cluster_update(state, batch, eps=0.10, strategy="cross")
    ups = res["updates"].collect()
    assert len(ups) == 1
    assert ups[0]["op"] == "INSERT"
    assert ups[0]["number_of_articles"] == 2


def test_incremental_update_keeps_linked_clusters_separate(spark):
    """Reference quirk: two existing clusters linked by a new point do
    NOT merge — only non-cluster rows are absorbed
    (process_records.py:386-416)."""
    state = spark.createDataFrame(
        [
            (1, "cl-a", ["a1", "a2"], True, [1.0, 0.0]),
            (2, "cl-b", ["b1", "b2"], True, [0.96, 0.28]),
        ],
        "row_id long, cluster_id string, article_ids array<string>, "
        "is_cluster boolean, centroid array<double>",
    )
    batch = spark.createDataFrame(
        [("n1", [0.995, 0.0998])],  # close to both centroids
        "id string, embedding array<double>",
    )
    res = C.incremental_cluster_update(state, batch, eps=0.10, strategy="cross")
    rows = {r["cluster_id"]: r for r in res["state"].collect()}
    assert rows["cl-a"]["article_ids"] == ["a1", "a2", "n1"]
    assert rows["cl-b"]["article_ids"] == ["b1", "b2"]  # kept, unmerged
    assert len(rows) == 2


def test_dbscan_full_hand_case(spark):
    """2-D unit vectors on a 30°-spaced arc, eps=0.3 (Δθ <= ~45.6°):
    the three middle points have two ε-neighbors each (core at
    min_samples=3), the arc ends have one (border, attached to the
    min-labeled core), and the far point has none (noise). One
    cluster, labeled by the minimum core id."""
    import math

    from news_clustering_and_summarization_spark.operators.cluster import (
        dbscan,
    )

    def v(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    rows = [
        (1, v(0)), (2, v(30)), (3, v(60)), (4, v(90)), (5, v(120)),
        (6, v(178)),
    ]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    got = {
        r["id"]: (r["role"], r["cluster"])
        for r in dbscan(
            df, id_col="id", vec_col="embedding", eps=0.3, min_samples=3
        ).collect()
    }
    assert got == {
        1: ("border", 2),
        2: ("core", 2),
        3: ("core", 2),
        4: ("core", 2),
        5: ("border", 2),
        6: ("noise", None),
    }
