"""Internal cluster-quality indexes (operators/cluster_metrics.py):
silhouette and Davies-Bouldin, squared-distance variants — hand
cases, sklearn-convention pins, degenerate inputs, SQL twins."""

from __future__ import annotations

import duckdb

from news_clustering_and_summarization_spark.operators.cluster_metrics import (
    davies_bouldin,
    davies_bouldin_sql,
    silhouette_by_label,
    silhouette_by_label_sql,
)


def _duck(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings (vec_id BIGINT, embedding DOUBLE[], "
        "label INTEGER)"
    )
    con.executemany("INSERT INTO embeddings VALUES (?, ?, ?)", rows)
    return con


TIGHT = [
    # two tight, well-separated 2-d clusters
    (1, [0.0, 0.0], 0),
    (2, [0.1, 0.0], 0),
    (3, [10.0, 10.0], 1),
    (4, [10.0, 10.1], 1),
]


def test_silhouette_separated_clusters_near_one(spark):
    df = spark.createDataFrame(TIGHT, ["vec_id", "embedding", "label"])
    out = {r["label"]: r for r in silhouette_by_label(df).collect()}
    assert set(out) == {0, 1}
    for r in out.values():
        assert r["n_members"] == 2
        # a2 tiny vs b2 huge -> mean silhouette ~ 1e6
        assert r["mean_sil_q"] > 990_000


def test_silhouette_singleton_pins_zero_and_sql_twin(spark):
    rows = TIGHT + [(5, [5.0, 5.0], 2)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = sorted(tuple(r) for r in silhouette_by_label(df).collect())
    by_label = {t[0]: t for t in got}
    assert by_label[2] == (2, 1, 0)  # singleton -> s = 0 (sklearn pin)
    want = sorted(
        tuple(r)
        for r in _duck(rows)
        .execute(silhouette_by_label_sql("embeddings"))
        .fetchall()
    )
    assert got == want


def test_silhouette_single_cluster_is_zero(spark):
    df = spark.createDataFrame(TIGHT[:2], ["vec_id", "embedding", "label"])
    out = silhouette_by_label(df).collect()
    assert len(out) == 1 and out[0]["mean_sil_q"] == 0  # k=1: b2 undefined


def test_davies_bouldin_hand_case_and_sql_twin(spark):
    df = spark.createDataFrame(TIGHT, ["vec_id", "embedding", "label"])
    got = davies_bouldin(df).collect()[0]
    assert got["n_clusters"] == 2
    # sig2_i = 2500 (quantized half-spread 0.05 -> 50000², mean of two
    # 2.5e9/1e6... compute: xq = ±50000 off the centroid per cluster
    # -> d2 = 50000² = 2.5e9 per point, sig2 = 2.5e9;
    # cd2 = (10e6)² + (10.05e6·...)" — just pin vs the SQL twin and
    # check the magnitude is plausible (positive, far below 1e6 = R<1)
    assert 0 < got["db_q"] < 1_000_000
    want = _duck(TIGHT).execute(davies_bouldin_sql("embeddings")).fetchone()
    assert (got["n_clusters"], got["db_q"]) == want


def test_davies_bouldin_degenerates(spark):
    # k = 1 -> NULL
    one = spark.createDataFrame(TIGHT[:2], ["vec_id", "embedding", "label"])
    row = davies_bouldin(one).collect()[0]
    assert row["n_clusters"] == 1 and row["db_q"] is None
    # coinciding centroids of distinct labels -> textbook +inf -> NULL
    co = [
        (1, [1.0, 1.0], 0),
        (2, [3.0, 3.0], 0),
        (3, [1.0, 1.0], 1),
        (4, [3.0, 3.0], 1),
    ]
    df = spark.createDataFrame(co, ["vec_id", "embedding", "label"])
    got = davies_bouldin(df).collect()[0]
    assert got["n_clusters"] == 2 and got["db_q"] is None
    want = _duck(co).execute(davies_bouldin_sql("embeddings")).fetchone()
    assert (got["n_clusters"], got["db_q"]) == want


def test_cluster_metrics_null_labels_excluded(spark):
    """r09 review: NULL labels (unassigned points) are excluded by
    documented contract in BOTH engines — no crash, no phantom
    cluster."""
    rows = TIGHT + [(9, [4.0, 4.0], None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = sorted(tuple(r) for r in silhouette_by_label(df).collect())
    want_no_null = sorted(
        tuple(r)
        for r in silhouette_by_label(
            spark.createDataFrame(
                TIGHT, "vec_id long, embedding array<double>, label int"
            )
        ).collect()
    )
    assert got == want_no_null
    sql_rows = sorted(
        tuple(r)
        for r in _duck(rows)
        .execute(silhouette_by_label_sql("embeddings"))
        .fetchall()
    )
    assert got == sql_rows


def test_davies_bouldin_k1_sql_twin_agrees(spark):
    """r09 review: the single-cluster degenerate must read
    (n_clusters=1, NULL) in BOTH engines (the twin counted per_i —
    empty at k=1 — and reported 0 clusters)."""
    rows = TIGHT[:2]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = tuple(davies_bouldin(df).collect()[0])
    want = _duck(rows).execute(davies_bouldin_sql("embeddings")).fetchone()
    assert got == tuple(want) == (1, None)
