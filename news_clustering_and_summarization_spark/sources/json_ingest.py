"""Ingest decoding (SURVEY §2.1 S1-S5, §2.8 M6).

The reference's transport is Kinesis records carrying base64-encoded
JSON *lists* of articles (data/put_records.py:40-71,
pre_process_docs.py:139-143). Here that is one declarative chain —
``unbase64 -> from_json(array<struct>) -> explode`` — that Catalyst
fuses with downstream projection; malformed records are retained in a
``corrupt_record`` column instead of killing the batch (the reference
routes them to a DLQ, eventbridge.tf:22-31).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import ARTICLE_SCHEMA


def decode_article_records(
    records: DataFrame,
    payload_col: str = "data",
    schema: T.StructType = ARTICLE_SCHEMA,
) -> DataFrame:
    """base64(JSON list of articles) -> one row per article.

    Rows whose payload fails to parse come back with all article
    fields NULL and the raw payload in ``corrupt_record``.
    """
    decoded = records.withColumn(
        "_json", F.unbase64(F.col(payload_col)).cast("string")
    )
    parsed = decoded.withColumn(
        "_docs", F.from_json("_json", T.ArrayType(schema))
    )
    good = (
        parsed.where(F.col("_docs").isNotNull())
        .select(F.explode("_docs").alias("doc"))
        .select("doc.*")
        .withColumn("corrupt_record", F.lit(None).cast("string"))
    )
    bad = (
        parsed.where(F.col("_docs").isNull())
        .select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in schema.fields],
            F.col("_json").alias("corrupt_record"),
        )
    )
    return good.unionByName(bad)


def read_articles_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType = ARTICLE_SCHEMA,
) -> DataFrame:
    """JSON-lines article reader with corrupt-record capture.

    Reads raw text and parses with ``from_json`` + an explicit corrupt
    column rather than the data source's internal ``_corrupt_record``:
    Spark forbids queries that reference only that internal column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which
    breaks the natural "count the corrupt rows" query on the result.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField("corrupt_record", T.StringType())]
    )
    parsed = spark.read.text(path).select(
        F.from_json(
            "value",
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "corrupt_record"},
        ).alias("doc")
    )
    return parsed.select("doc.*")


def read_articles_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = ARTICLE_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming file source standing in for Kinesis (S1/S2); rate is
    controlled with maxFilesPerTrigger like the reference's
    prep_for_streaming ticks (clustering.py:121-131)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)
