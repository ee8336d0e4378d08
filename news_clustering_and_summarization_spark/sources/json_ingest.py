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


def _parse_article_lists(
    decoded: DataFrame, schema: T.StructType, corrupt_col: str = "_json"
) -> DataFrame:
    """``_json`` column holding a JSON list of articles -> one row per
    article; unparseable payloads yield a single all-NULL row with
    ``corrupt_col`` in ``corrupt_record`` (DLQ semantics, S8/ST8)."""
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
            F.col(corrupt_col).alias("corrupt_record"),
        )
    )
    return good.unionByName(bad)


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
    return _parse_article_lists(decoded, schema)


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


# Schema of rows produced by Spark's Kafka source (public
# spark-sql-kafka-0-10 connector) — the contract articles_from_kafka
# programs against, and what tests inject without a live broker.
KAFKA_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    options: dict | None = None,
) -> DataFrame:
    """Raw Kafka record stream — the live-transport analogue of the
    reference's Kinesis entry (iac/roots/main/main.tf:128-147). Uses
    the public spark-sql-kafka-0-10 connector; in production submit
    with ``--packages org.apache.spark:spark-sql-kafka-0-10_<scala>:
    <spark-version>`` (the jar is not bundled with pyspark). Rows
    follow KAFKA_SOURCE_SCHEMA; feed them to articles_from_kafka."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


# Kinesis-shaped record schema: what the third-party Structured
# Streaming Kinesis connectors (e.g. the Qubole/AWS
# spark-streaming-sql-kinesis connector) produce per record.
KINESIS_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField("streamName", T.StringType()),
        T.StructField("partitionKey", T.StringType()),
        T.StructField("sequenceNumber", T.StringType()),
        T.StructField("approximateArrivalTimestamp", T.TimestampType()),
    ]
)


def read_kinesis_stream(
    spark: SparkSession,
    stream_name: str,
    region: str,
    endpoint_url: str | None = None,
    options: dict | None = None,
) -> DataFrame:
    """Interface stub for the reference's native transport
    (iac/roots/main/main.tf:128-147 ingests via Kinesis).

    Apache Spark ships no Kinesis Structured Streaming source, so this
    engine's supported live transport is Kafka (read_kafka_stream) —
    same at-least-once, same base64(JSON list) payload decode. A user
    who must stay on Kinesis has two working routes:

    * attach a third-party Kinesis connector jar at submit time and
      pass its output (KINESIS_SOURCE_SCHEMA-shaped) to
      ``articles_from_kinesis`` below — the decode/DLQ chain is
      transport-agnostic from there;
    * or bridge Kinesis -> S3 via Firehose and use the file/S3 source
      (read_articles_stream), which needs no extra jars.

    This function exists so the substitution is explicit instead of
    silent; it always raises.
    """
    raise NotImplementedError(
        "no Kinesis connector ships with Apache Spark; attach a "
        "third-party connector and feed its stream to "
        "articles_from_kinesis, or bridge via Firehose->S3 and use "
        "read_articles_stream (see docstring)"
    )


def articles_from_kinesis(
    records: DataFrame,
    schema: T.StructType = ARTICLE_SCHEMA,
    payload_encoding: str = "base64",
) -> DataFrame:
    """Kinesis-shaped records (KINESIS_SOURCE_SCHEMA) -> article rows.

    Adapts the connector's (data, partitionKey, sequenceNumber, ...)
    shape onto the same decode path as Kafka — the reference's wire
    format is identical on both transports (base64(JSON list),
    data/put_records.py:40-71) — so poison records land in
    ``corrupt_record`` and every downstream operator is shared."""
    adapted = records.select(
        F.col("data").alias("value"),
        F.lit(None).cast("binary").alias("key"),
        F.col("streamName").alias("topic"),
        F.lit(0).alias("partition"),
        F.lit(0).cast("long").alias("offset"),
        F.col("approximateArrivalTimestamp").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    return articles_from_kafka(adapted, schema, payload_encoding)


def articles_from_kafka(
    records: DataFrame,
    schema: T.StructType = ARTICLE_SCHEMA,
    payload_encoding: str = "base64",
) -> DataFrame:
    """Kafka-shaped records (KAFKA_SOURCE_SCHEMA) -> article rows.

    ``payload_encoding="base64"`` mirrors the reference's wire format —
    each record value is base64(JSON list of articles)
    (data/put_records.py:40-71); ``"json"`` accepts plain JSON-list
    values. Both route through the same corrupt-record capture as the
    file and S3 paths, so a poison message lands in ``corrupt_record``
    instead of killing the stream. NULL-value records (compacted-topic
    tombstones — deletions, not articles) are dropped up front: they
    would otherwise surface as all-NULL rows with a NULL
    corrupt_record, indistinguishable from good rows to the
    corrupt-record filter."""
    records = records.where(F.col("value").isNotNull())
    payload = F.col("value").cast("string")
    if payload_encoding == "base64":
        # try_to_binary, not unbase64: Spark 4's unbase64 RAISES on
        # malformed base64, which would let one poison message kill the
        # stream; try_to_binary degrades it to NULL -> corrupt_record.
        decoded = records.select(payload.alias("_raw")).withColumn(
            "_json",
            F.try_to_binary(F.col("_raw"), F.lit("base64")).cast("string"),
        )
        return _parse_article_lists(decoded, schema, corrupt_col="_raw")
    if payload_encoding == "json":
        decoded = records.select(payload.alias("_json"))
        return _parse_article_lists(decoded, schema)
    raise ValueError(
        f"payload_encoding must be 'base64' or 'json', "
        f"got {payload_encoding!r}"
    )


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


def read_delimited(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """CSV/TSV reader with the same corrupt-record discipline as the
    JSON path: malformed lines land in ``corrupt_record`` instead of
    being dropped (DROPMALFORMED would silently lose data) or killing
    the job (FAILFAST). Engine extension — the reference ingests JSON
    only, but batch corpus drops commonly arrive as TSV.

    Schema is REQUIRED: inferSchema at 100 TB means scanning the data
    twice and trusting sampled types; a declared schema plans one scan
    with typed pushdown.
    """
    full = T.StructType(
        list(schema.fields)
        + [T.StructField("corrupt_record", T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "corrupt_record")
        .csv(path)
    )
