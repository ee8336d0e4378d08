"""Pool-maintenance compaction (operators/cluster.compact_pool +
ClusteringPipeline.compact_pool, r11): merges the split clusters and
strays that approximate candidate joins accumulate — the per-batch
reference semantics keep is_cluster rows forever, so a formation-time
LSH miss is otherwise permanent (the 500k soak measured 41.6k pool
rows for 20k planted families)."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators import cluster as C
from news_clustering_and_summarization_spark.schemas import CLUSTER_STATE_SCHEMA


def _state(spark, rows):
    return spark.createDataFrame(rows, CLUSTER_STATE_SCHEMA)


def _vec(direction, d=8, off=0.0):
    return [1.0 if j == direction else off for j in range(d)]


def test_compact_merges_split_clusters_and_strays(spark):
    # family A split into two clusters + one stray singleton (all
    # within eps of each other); family B untouched
    rows = [
        (1, "c-a1", ["a1", "a2"], True, _vec(0, off=0.001)),
        (4, "c-a4", ["a4", "a5"], True, _vec(0, off=0.002)),
        (7, "c-a7", ["a7"], False, _vec(0, off=0.003)),
        (2, "c-b1", ["b1", "b2"], True, _vec(3)),
    ]
    res = C.compact_pool(_state(spark, rows), eps=0.10, strategy="cross")
    state = {r["row_id"]: r for r in res["state"].collect()}
    assert set(state) == {1, 2}
    merged = state[1]
    # representative = lowest row_id; articles concatenated in
    # row_id order (rep's own first)
    assert merged["cluster_id"] == "c-a1"
    assert merged["article_ids"] == ["a1", "a2", "a4", "a5", "a7"]
    assert merged["is_cluster"] is True
    # centroid = mean of the member POOL-ROW vectors (one vote each)
    assert abs(merged["centroid"][1] - (0.001 + 0.002 + 0.003) / 3) < 1e-12
    # family B untouched, bit-identical
    assert state[2]["article_ids"] == ["b1", "b2"]
    remaps = {(r["old_pk"], r["new_pk"]) for r in res["remaps"].collect()}
    assert remaps == {("c-a4", "c-a1"), ("c-a7", "c-a1")}
    ups = {r["PK"]: r for r in res["updates"].collect()}
    assert set(ups) == {"c-a1"}
    assert ups["c-a1"]["number_of_articles"] == 5


def test_compact_is_idempotent(spark):
    rows = [
        (1, "c-a1", ["a1"], False, _vec(0, off=0.001)),
        (4, "c-a4", ["a4"], False, _vec(0, off=0.002)),
        (2, "c-b1", ["b1", "b2"], True, _vec(3)),
    ]
    once = C.compact_pool(_state(spark, rows), eps=0.10, strategy="cross")
    state1 = once["state"].localCheckpoint(eager=True)
    twice = C.compact_pool(state1, eps=0.10, strategy="cross")
    assert twice["remaps"].count() == 0
    a = sorted(map(tuple, state1.collect()))
    b = sorted(map(tuple, twice["state"].collect()))
    assert a == b


def test_compact_ivf_strategy_matches_cross(spark):
    # the >LSH_THRESHOLD path dispatches to the IVF exact-verified
    # self-join; on well-separated families it must produce the same
    # merged state as the exact cross
    rows = []
    for fam in range(6):
        for m in range(4):
            rid = fam * 10 + m + 1
            rows.append(
                (rid, f"c-{rid}", [f"x{rid}"], m == 0,
                 _vec(fam, d=16, off=0.001 * (m + 1)))
            )
    st = _state(spark, rows)
    a = sorted(
        map(tuple, C.compact_pool(st, 0.10, strategy="cross")["state"]
            .select("row_id", "cluster_id", "article_ids").collect())
    )
    b = sorted(
        map(tuple, C.compact_pool(st, 0.10, strategy="ivf")["state"]
            .select("row_id", "cluster_id", "article_ids").collect())
    )
    assert a == b
    assert len(a) == 6  # one row per family


def test_pipeline_compact_repairs_serving_tables(spark, tmp_path):
    from news_clustering_and_summarization_spark.streaming.pipeline import (
        ClusteringPipeline,
        _atomic_overwrite,
    )

    pipe = ClusteringPipeline(
        spark, str(tmp_path / "state"), batch_size=4, embed_dim=8
    )
    # two batches through the normal (exact) path build coherent
    # serving tables: family A (direction 0) and family B (direction 3)
    def _batch(rows):
        return spark.createDataFrame(
            rows,
            "id string, title string, summary string, text string, "
            "publication_date string, embedding array<double>",
        ).select(
            "id", "title", "summary", "text", "publication_date",
            "embedding",
        )

    pipe._run_clustering(_batch([
        ("a1", "t", "s", "x", "2024-01-01", _vec(0, off=0.001)),
        ("b1", "t", "s", "x", "2024-01-01", _vec(3, off=0.001)),
    ]))
    pipe._run_clustering(_batch([
        ("a2", "t", "s", "x", "2024-01-02", _vec(0, off=0.002)),
        ("b2", "t", "s", "x", "2024-01-02", _vec(3, off=0.002)),
    ]))
    # inject a SPLIT: a third family-A row that the (simulated) lossy
    # join failed to link at formation — its own is_cluster row
    pool = pipe.pool().collect()
    max_row = max(r["row_id"] for r in pool)
    split = spark.createDataFrame(
        [(max_row + 1, "c-a9", ["a9"], True, _vec(0, off=0.003))],
        CLUSTER_STATE_SCHEMA,
    )
    _atomic_overwrite(pipe.pool().unionByName(split), pipe.pool_path)
    from news_clustering_and_summarization_spark.operators import (
        cluster_tables as CT,
    )

    upd = split.select(
        F.col("cluster_id").alias("PK"),
        F.size("article_ids").cast("long").alias("number_of_articles"),
        "article_ids",
    )
    _atomic_overwrite(
        CT.merge_cluster_metadata(pipe.clusters(), upd), pipe.clusters_path
    )
    items = CT.build_article_items(
        CT.assignments_from_updates(upd),
        _batch([("a9", "t", "s", "x", "2024-01-03", _vec(0, off=0.003))]),
    )
    _atomic_overwrite(
        CT.merge_cluster_articles(pipe.cluster_articles(), items),
        pipe.articles_path,
    )
    assert pipe.pool().count() == 3
    assert pipe.clusters().count() == 3

    stats = pipe.compact_pool()
    assert stats == {"pool_before": 3, "pool_after": 2, "merged": 1}
    pool = {r["cluster_id"]: r for r in pipe.pool().collect()}
    assert len(pool) == 2
    merged = [r for r in pool.values() if "a9" in r["article_ids"]]
    assert len(merged) == 1 and set(merged[0]["article_ids"]) == {
        "a1", "a2", "a9",
    }
    # absorbed metadata row deleted; rep re-counted
    clus = {r["PK"]: r for r in pipe.clusters().collect()}
    assert "c-a9" not in clus
    assert clus[merged[0]["cluster_id"]]["number_of_articles"] == 3
    # article item re-pointed to the surviving rep, no duplicates
    arts = pipe.cluster_articles().collect()
    a9 = [r for r in arts if r["SK"] == "ARTICLE#a9"]
    assert len(a9) == 1 and a9[0]["PK"] == merged[0]["cluster_id"]
