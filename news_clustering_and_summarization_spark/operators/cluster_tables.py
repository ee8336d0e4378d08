"""Cluster serving-table maintenance (SURVEY §2.1 S9-S11, §2.3 J1-J3,
§2.4 A1, §2.2 P13).

The reference upserts into a DynamoDB single-table design
(process_records.py:181-273): batch-get existing metadata (S9), split
update-vs-insert by key existence (J3), build a last-writer-wins
(PK, SK) -> item map (P13), batch-write (S10). Here the store is a
pair of normalized parquet tables (`clusters`, `cluster_articles`) and
the whole upsert is one MERGE expressed as joins + unionByName inside
``foreachBatch`` — idempotent on (PK, SK), so at-least-once delivery
collapses to effectively-once (SURVEY §2.7 ST4).

Scale notes: the incoming batch is small (one micro-batch of touched
clusters), so both joins hit the broadcast path; the read-modify-
overwrite of the parquet table is the local stand-in for a Delta/
Iceberg MERGE — the operator's dataflow is identical, only the sink
commit protocol differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FIXED_NOW = "2024-01-01T00:00:00"  # deterministic stand-in for now()


def last_writer_wins(df: DataFrame, keys: list[str], order_col: str | None = None) -> DataFrame:
    """P13 (process_records.py:150-178): the reference keeps the LAST
    item written per (PK, SK) via dict overwrite. With an order column
    we keep max(order); without, dropDuplicates (any-wins, used where
    the reference raises on true dupes)."""
    if order_col is None:
        return df.dropDuplicates(keys)
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def split_existing_missing(
    incoming: DataFrame, existing: DataFrame, key: str = "PK"
) -> tuple[DataFrame, DataFrame]:
    """J3/S9 (process_records.py:99-147): requested-vs-found keys as
    semi/anti joins instead of a driver-side set difference."""
    found = incoming.join(F.broadcast(existing.select(key)), key, "left_semi")
    missing = incoming.join(F.broadcast(existing.select(key)), key, "left_anti")
    return found, missing


def merge_cluster_metadata(
    clusters: DataFrame,
    updates: DataFrame,
    now: str = FIXED_NOW,
) -> DataFrame:
    """MERGE of cluster metadata (process_records.py:190-232).

    updates: (PK, number_of_articles, article_ids) per touched cluster
    (output of incremental_cluster_update). Matched rows get the new
    article count; unmatched get fresh metadata rows with the
    reference's init fields (created_at, summary fields empty).
    """
    upd = updates.select(
        "PK",
        F.col("number_of_articles").alias("_n_new"),
    )
    matched = (
        clusters.join(F.broadcast(upd), "PK", "inner")
        .withColumn("number_of_articles", F.col("_n_new"))
        .drop("_n_new")
    )
    untouched = clusters.join(F.broadcast(upd.select("PK")), "PK", "left_anti")
    fresh = (
        upd.join(clusters.select("PK"), "PK", "left_anti")
        .select(
            "PK",
            F.concat(F.lit("#METADATA#"), F.col("PK")).alias("SK"),
            F.lit("metadata").alias("type"),
            F.lit(now).alias("created_at"),
            F.col("_n_new").alias("number_of_articles"),
            F.lit("").alias("generated_summary"),
            F.lit(0).cast("long").alias("summary_count"),
            F.lit("").alias("description"),
            F.lit(True).alias("is_cluster"),
            F.lit("").alias("most_common_location"),
            F.lit("").alias("most_common_organization"),
            F.lit("").alias("earliest_date"),
            F.lit("").alias("latest_date"),
        )
    )
    return untouched.unionByName(matched).unionByName(fresh)


def build_article_items(
    assignments: DataFrame,
    articles: DataFrame,
    now: str = FIXED_NOW,
) -> DataFrame:
    """J1 + S10 article-item construction (process_records.py:237-263).

    assignments: (PK, article_id); articles: full payloads keyed by id.
    Left join tolerates missing payloads — the reference's None-payload
    fallback writes a thin item (:256-263).
    """
    payload = articles.select(
        F.col("id").alias("article_id"),
        "title",
        "summary",
        "text",
        "publication_date",
    )
    return (
        assignments.join(payload, "article_id", "left")
        .select(
            "PK",
            F.concat(F.lit("ARTICLE#"), F.col("article_id")).alias("SK"),
            F.lit("article").alias("type"),
            "article_id",
            "title",
            "summary",
            "text",
            F.lit(None).cast("array<string>").alias("organizations"),
            F.lit(None).cast("array<string>").alias("locations"),
            "publication_date",
            F.lit(now).alias("entry_creation_date"),
        )
    )


def merge_cluster_articles(
    cluster_articles: DataFrame, new_items: DataFrame
) -> DataFrame:
    """Idempotent append of article items: existing (PK, SK) rows win
    (re-delivered articles don't duplicate — ST4)."""
    fresh = new_items.join(
        cluster_articles.select("PK", "SK"), ["PK", "SK"], "left_anti"
    )
    return cluster_articles.unionByName(fresh)


def assignments_from_updates(updates: DataFrame) -> DataFrame:
    """(PK, article_ids array) -> one row per (PK, article_id) (J2)."""
    return updates.select(
        "PK", F.explode("article_ids").alias("article_id")
    ).dropDuplicates(["PK", "article_id"])
