"""Serving-layer queries (SURVEY §2.1 S13, §2.3 J6, §2.4 A6-A7,
§2.2 P10; reference iac/roots/main/templates/ClusterList-js.template).

The reference UI scans the whole DynamoDB table every 5 s, groups
article items by cluster, filters displayable clusters, and sorts by
size. Here that is one declarative query over the two serving tables —
Catalyst broadcasts the (small) metadata side and prunes columns at
the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_DISPLAY_ARTICLES = 2  # ClusterList-js.template:103-110


def displayable_clusters(clusters: DataFrame) -> DataFrame:
    """P10 (ClusterList-js.template:103-110): is_cluster AND a
    non-empty summary AND more than 2 articles."""
    return clusters.where(
        F.col("is_cluster")
        & (F.col("generated_summary") != "")
        & (F.col("number_of_articles") > MIN_DISPLAY_ARTICLES)
    )


def cluster_list(
    clusters: DataFrame, cluster_articles: DataFrame
) -> DataFrame:
    """J6 + A6 + O2: the UI's cluster list — displayable clusters with
    their live article count, sorted by size desc
    (ClusterList-js.template:89-120)."""
    counts = cluster_articles.groupBy("PK").agg(
        F.count("*").alias("article_count")
    )
    return (
        displayable_clusters(clusters)
        .join(counts, "PK", "left")
        .select(
            "PK",
            "description",
            "generated_summary",
            "number_of_articles",
            F.coalesce("article_count", F.lit(0)).alias("article_count"),
            "most_common_location",
            "most_common_organization",
            "earliest_date",
            "latest_date",
        )
        .orderBy(F.desc("article_count"), F.asc("PK"))
    )


def top_k_clusters(
    clusters: DataFrame, cluster_articles: DataFrame, k: int = 10
) -> DataFrame:
    """A7: top-K clusters by size (notebook cell 6 / UI sort)."""
    return cluster_list(clusters, cluster_articles).limit(k)


def serving_totals(
    clusters: DataFrame, cluster_articles: DataFrame
) -> DataFrame:
    """A6: UI header totals — total articles and displayable cluster
    count (ClusterList-js.template:89-120, 183)."""
    n_clusters = displayable_clusters(clusters).count()
    return cluster_articles.agg(
        F.count("*").alias("total_articles"),
        F.lit(n_clusters).alias("displayable_clusters"),
    )


def cluster_detail(
    clusters: DataFrame, cluster_articles: DataFrame, pk: str
) -> DataFrame:
    """ClusterModal view: one cluster's articles in date order
    (front_end/src/components/ClusterModal.js:15-24)."""
    return (
        cluster_articles.where(F.col("PK") == pk)
        .select("PK", "article_id", "title", "summary", "publication_date")
        .orderBy("publication_date", "article_id")
    )
