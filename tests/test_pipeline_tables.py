"""Golden pipeline test over the serving-store operators: cluster
updates -> metadata MERGE -> article items -> threshold trigger ->
deterministic summarize -> serving query."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators import (
    cluster_tables as CT,
    serving as SV,
    summarize as SM,
)
from news_clustering_and_summarization_spark.schemas import (
    CLUSTERS_SCHEMA,
    CLUSTER_ARTICLES_SCHEMA,
)


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def _articles(spark):
    rows = [
        (f"a{i}", f"Title {i}", f"summary text {i}", f"body {i}",
         f"2024-03-0{(i % 7) + 1} 10:00:0{i % 10}")
        for i in range(8)
    ]
    return spark.createDataFrame(
        rows, "id string, title string, summary string, text string, publication_date string"
    )


def test_metadata_merge_insert_then_update(spark):
    clusters = _empty(spark, CLUSTERS_SCHEMA)
    upd1 = spark.createDataFrame(
        [("c1", 6, ["a0", "a1", "a2", "a3", "a4", "a5"])],
        "PK string, number_of_articles long, article_ids array<string>",
    )
    merged = CT.merge_cluster_metadata(clusters, upd1)
    row = merged.collect()[0]
    assert row["SK"] == "#METADATA#c1"
    assert row["number_of_articles"] == 6
    assert row["summary_count"] == 0 and row["generated_summary"] == ""

    upd2 = spark.createDataFrame(
        [("c1", 8, ["a6", "a7"]), ("c2", 3, ["b0", "b1", "b2"])],
        "PK string, number_of_articles long, article_ids array<string>",
    )
    merged2 = CT.merge_cluster_metadata(merged, upd2)
    got = {r["PK"]: r for r in merged2.collect()}
    assert got["c1"]["number_of_articles"] == 8
    assert got["c1"]["created_at"] == CT.FIXED_NOW  # preserved
    assert got["c2"]["number_of_articles"] == 3
    assert len(got) == 2


def test_article_items_and_thin_fallback(spark):
    assign = spark.createDataFrame(
        [("c1", "a0"), ("c1", "ghost")], "PK string, article_id string"
    )
    items = CT.build_article_items(assign, _articles(spark))
    got = {r["article_id"]: r for r in items.collect()}
    assert got["a0"]["SK"] == "ARTICLE#a0" and got["a0"]["title"] == "Title 0"
    # None-payload fallback -> thin item (process_records.py:256-263)
    assert got["ghost"]["title"] is None and got["ghost"]["type"] == "article"


def test_merge_cluster_articles_idempotent(spark):
    store = _empty(spark, CLUSTER_ARTICLES_SCHEMA)
    assign = spark.createDataFrame(
        [("c1", "a0"), ("c1", "a1")], "PK string, article_id string"
    )
    items = CT.build_article_items(assign, _articles(spark))
    once = CT.merge_cluster_articles(store, items)
    twice = CT.merge_cluster_articles(once, items)  # redelivery
    assert once.count() == twice.count() == 2


def test_threshold_trigger_reference_semantics(spark):
    # trigger_sfn.py:45-55 — T=5, cap=15 unless never summarized
    cases = [
        (5, 0, False),   # n == T*(c+1): lower fails
        (6, 0, True),    # lower ok, upper ok
        (14, 1, True),   # 14 > 10, < 15
        (15, 1, False),  # upper fails, c>0
        (16, 0, True),   # upper fails but never summarized
        (16, 2, False),  # 16 > 15 fails lower too? 16 > 5*3=15 ok; upper fails, c>0
        (40, 7, False),  # 40 == 5*8: lower fails
    ]
    df = spark.createDataFrame(
        [(i, n, c) for i, (n, c, _) in enumerate(cases)],
        "i int, number_of_articles long, summary_count long",
    )
    got = {
        r["i"]: r["fire"]
        for r in df.select(
            "i",
            SM.should_summarize(
                "number_of_articles", "summary_count"
            ).alias("fire"),
        ).collect()
    }
    for i, (n, c, want) in enumerate(cases):
        assert got[i] == want, f"n={n} c={c}: got {got[i]} want {want}"


def test_summarize_end_to_end_and_serving(spark):
    clusters = _empty(spark, CLUSTERS_SCHEMA)
    updates = spark.createDataFrame(
        [("c1", 6, ["a0", "a1", "a2", "a3", "a4", "a5"]),
         ("c2", 2, ["a6", "a7"])],
        "PK string, number_of_articles long, article_ids array<string>",
    )
    clusters = CT.merge_cluster_metadata(clusters, updates)
    items = CT.build_article_items(
        CT.assignments_from_updates(updates), _articles(spark)
    )
    store = CT.merge_cluster_articles(
        _empty(spark, CLUSTER_ARTICLES_SCHEMA), items
    )

    cand = clusters.where(
        SM.should_summarize("number_of_articles", "summary_count")
    )
    assert [r["PK"] for r in cand.collect()] == ["c1"]

    summaries = SM.summarize_clusters(cand, clusters, store)
    s = summaries.collect()[0]
    assert s["PK"] == "c1" and s["summary_count"] == 1
    # deterministic extractive output: first title in chrono order
    assert s["description"] == "Title 0"
    assert s["generated_summary"].startswith("title: Title 0")
    assert s["earliest_date"] == "2024-03-01 10:00:00"
    assert s["latest_date"] == "2024-03-06 10:00:05"
    assert s["most_common_location"] == ""  # no entity lists in fixture

    clusters2 = SM.apply_summary_updates(clusters, summaries)
    got = {r["PK"]: r for r in clusters2.collect()}
    assert got["c1"]["generated_summary"] != ""
    assert got["c1"]["summary_count"] == 1
    assert got["c2"]["generated_summary"] == ""

    listed = SV.cluster_list(clusters2, store).collect()
    assert [r["PK"] for r in listed] == ["c1"]
    assert listed[0]["article_count"] == 6
    det = SV.cluster_detail(clusters2, store, "c1").collect()
    assert [r["article_id"] for r in det][:2] == ["a0", "a1"]


def test_mode_aggregate_with_entities(spark):
    rows = [
        ("c1", "ARTICLE#x1", "article", "x1", None, None, None,
         ["OrgA", "OrgB"], ["Paris", "Lyon"], "2024-01-01 00:00:00", "t"),
        ("c1", "ARTICLE#x2", "article", "x2", None, None, None,
         ["OrgA"], ["Paris"], "2024-01-02 00:00:00", "t"),
        ("c1", "ARTICLE#x3", "article", "x3", None, None, None,
         None, ["Lyon"], None, "t"),
    ]
    store = spark.createDataFrame(rows, CLUSTER_ARTICLES_SCHEMA)
    agg = SM.cluster_aggregates(store).collect()[0]
    assert agg["most_common_organization"] == "OrgA"
    # Paris/Lyon tie at 2: reference Counter.most_common keeps insertion
    # order (not reproducible distributed); ours deterministically takes
    # the lexically-first value.
    assert agg["most_common_location"] == "Lyon"
    assert agg["earliest_date"] == "2024-01-01 00:00:00"
    assert agg["latest_date"] == "2024-01-02 00:00:00"
