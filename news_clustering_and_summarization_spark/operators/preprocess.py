"""Preprocess stage (SURVEY §2.2 P1-P8; reference
pre_process_docs.py:85-132).

One declarative projection — Catalyst fuses the whole stage into the
scan, so at 100 TB this is a single pass with column pruning and no
intermediate materialization (the reference needed an S3 staging
bucket between Lambdas; we don't).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX
from ..schemas import VENDOR_DROP_COLUMNS


def drop_vendor_columns(df: DataFrame) -> DataFrame:
    """P1 (pre_process_docs.py:85-111). df.drop ignores absent names,
    matching the reference's key-filter over whatever dict arrives."""
    return df.drop(*VENDOR_DROP_COLUMNS)


def enrich(df: DataFrame, use_udf_html_strip: bool = False) -> DataFrame:
    """P2-P4 (pre_process_docs.py:108-118):
    title    := clean_text(title)
    summary  := clean_text(text)   (public-data shim: no vendor summary)
    text     := remove_tags(text)
    publication_date := remove_tags(date)
    """
    strip = TX.remove_tags_udf if use_udf_html_strip else TX.strip_tags_expr
    return (
        df.withColumn("summary", TX.clean_text(F.col("text")))
        .withColumn("publication_date", strip(F.col("date")))
        .withColumn("title", TX.clean_text(F.col("title")))
        .withColumn("text", strip(F.col("text")))
    )


def extract_entities(df: DataFrame) -> DataFrame:
    """P5 (pre_process_docs.py:23-79, wired off at :120-130): the
    vendor-path entity-threshold extractors as derived columns."""
    return (
        df.withColumn("subjects_str", TX.extract_top_subjects("subjects"))
        .withColumn("industries_str", TX.extract_top_industries("industries"))
        .withColumn(
            "organizations_str", TX.extract_top_organizations("organizations")
        )
        .withColumn("people_str", TX.get_names("people"))
        .withColumn("locations_str", TX.get_locations("locations"))
    )


def with_embed_text(df: DataFrame) -> DataFrame:
    """P6 (embed_docs.py:10-20, 30-42): newline-join of the fields fed
    to the embedding model."""
    return df.withColumn(
        "embed_text", TX.concat_embed_text("title", "summary", "text")
    )


def drop_malformed(df: DataFrame) -> DataFrame:
    """P7 parse guard (process_records.py:69-76): skip rows whose JSON
    failed to parse. Readers surface those as ``corrupt_record`` !=
    NULL with all article fields NULL (the reference routes them to a
    DLQ, eventbridge.tf:22-31); without this cut a NULL-id row would
    flow into embed/cluster."""
    if "corrupt_record" in df.columns:
        df = df.where(F.col("corrupt_record").isNull()).drop("corrupt_record")
    return df.where(F.col("id").isNotNull())


def dedup_by_id(df: DataFrame) -> DataFrame:
    """P7 (process_records.py:69-96): in-batch first-writer-wins by id."""
    return df.dropDuplicates(["id"])


def filter_oversize(df: DataFrame) -> DataFrame:
    """P8 (embed_docs.py:100-102): drop rows whose JSON payload exceeds
    the 256 KiB SQS ceiling."""
    return df.where(TX.payload_size_ok(F.struct(*df.columns)))


def preprocess(df: DataFrame, use_udf_html_strip: bool = False) -> DataFrame:
    """Full preprocess stage: P7-guard -> P1 -> P2-P4 -> P7-dedup."""
    return dedup_by_id(
        enrich(drop_vendor_columns(drop_malformed(df)), use_udf_html_strip)
    )
