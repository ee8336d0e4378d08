"""Ingest decoding + parse-guard tests (SURVEY §2.1 S3, §2.2 P7).

Reference behavior: malformed JSON is skipped, not fatal
(process_records.py:69-76; DLQ wiring eventbridge.tf:22-31).
"""

import json

from news_clustering_and_summarization_spark.operators.preprocess import (
    drop_malformed,
    preprocess,
)
from news_clustering_and_summarization_spark.sources.json_ingest import (
    read_articles_json,
)


def _write_jsonl(tmp_path, docs, corrupt_lines=0):
    p = tmp_path / "articles.jsonl"
    with open(p, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
        for _ in range(corrupt_lines):
            f.write("{this is not json\n")
    return str(p)


def test_reader_captures_corrupt_lines(spark, tmp_path):
    docs = [
        {"id": "a", "title": "t", "text": "x", "date": "2024-01-01 00:00:00"}
    ]
    path = _write_jsonl(tmp_path, docs, corrupt_lines=2)
    raw = read_articles_json(spark, path)
    assert raw.where("corrupt_record IS NOT NULL").count() == 2
    assert raw.where("corrupt_record IS NULL").count() == 1


def test_preprocess_drops_malformed_rows(spark, tmp_path):
    """A corrupt line must not reach downstream stages as a NULL-id
    row (it would poison the similarity-join id comparisons)."""
    docs = [
        {"id": "a", "title": "t", "text": "x", "date": "2024-01-01 00:00:00"},
        {"id": "b", "title": "u", "text": "y", "date": "2024-01-01 00:00:00"},
    ]
    path = _write_jsonl(tmp_path, docs, corrupt_lines=1)
    out = preprocess(read_articles_json(spark, path))
    rows = out.collect()
    assert sorted(r["id"] for r in rows) == ["a", "b"]
    assert "corrupt_record" not in out.columns


def test_drop_malformed_without_corrupt_column(spark):
    """Guard also applies to plain DataFrames: NULL ids are skipped."""
    df = spark.createDataFrame(
        [("a", "t"), (None, "bad")], "id string, title string"
    )
    assert [r["id"] for r in drop_malformed(df).collect()] == ["a"]


def _kafka_rows(payloads, encoding="base64"):
    """Kafka-source-shaped rows whose value carries each payload."""
    import base64

    rows = []
    for i, p in enumerate(payloads):
        body = p if isinstance(p, str) else json.dumps(p)
        if encoding == "base64":
            body = base64.b64encode(body.encode()).decode()
        rows.append(
            (None, body.encode(), "articles", 0, i, None, 0)
        )
    return rows


def test_articles_from_kafka_base64(spark):
    from news_clustering_and_summarization_spark.sources.json_ingest import (
        KAFKA_SOURCE_SCHEMA,
        articles_from_kafka,
    )

    good = [
        {"id": "a", "title": "t1", "text": "x", "date": "2024-01-01 00:00:00"},
        {"id": "b", "title": "t2", "text": "y", "date": "2024-01-01 00:00:00"},
    ]
    df = spark.createDataFrame(
        _kafka_rows([good, "{not json"]), KAFKA_SOURCE_SCHEMA
    )
    out = articles_from_kafka(df)
    assert sorted(
        r["id"] for r in out.where("corrupt_record IS NULL").collect()
    ) == ["a", "b"]
    # poison message -> corrupt_record row, stream survives
    assert out.where("corrupt_record IS NOT NULL").count() == 1


def test_articles_from_kafka_plain_json(spark):
    from news_clustering_and_summarization_spark.sources.json_ingest import (
        KAFKA_SOURCE_SCHEMA,
        articles_from_kafka,
    )

    good = [{"id": "c", "title": "t", "text": "z", "date": "2024-01-01 00:00:00"}]
    df = spark.createDataFrame(
        _kafka_rows([good], encoding="json"), KAFKA_SOURCE_SCHEMA
    )
    out = articles_from_kafka(df, payload_encoding="json")
    assert [r["id"] for r in out.collect()] == ["c"]


def test_articles_from_kinesis_adapter(spark):
    """The Kinesis adapter maps connector-shaped records onto the
    shared decode path: same wire format, same corrupt-record DLQ
    semantics; the reader itself is an explicit stub (no connector in
    Apache Spark)."""
    import base64

    import pytest as _pytest

    from news_clustering_and_summarization_spark.sources.json_ingest import (
        KINESIS_SOURCE_SCHEMA,
        articles_from_kinesis,
        read_kinesis_stream,
    )

    good = [
        {"id": "k1", "title": "t", "text": "x", "date": "2024-01-01 00:00:00"},
        {"id": "k2", "title": "t", "text": "y", "date": "2024-01-01 00:00:00"},
    ]
    payload = base64.b64encode(json.dumps(good).encode()).decode()
    rows = [
        (payload.encode(), "articles", "pk-0", "seq-1", None),
        (b"%%%poison%%%", "articles", "pk-0", "seq-2", None),
    ]
    df = spark.createDataFrame(rows, KINESIS_SOURCE_SCHEMA)
    out = articles_from_kinesis(df)
    assert sorted(
        r["id"] for r in out.where("corrupt_record IS NULL").collect()
    ) == ["k1", "k2"]
    assert out.where("corrupt_record IS NOT NULL").count() == 1

    with _pytest.raises(NotImplementedError, match="Kinesis"):
        read_kinesis_stream(spark, "articles", "us-east-1")


def test_kafka_tombstones_dropped(spark):
    """Compacted-topic tombstones (value=NULL) are deletions, not
    articles — they must not surface as all-NULL 'good' rows that
    slip past the corrupt_record filter."""
    from news_clustering_and_summarization_spark.sources.json_ingest import (
        KAFKA_SOURCE_SCHEMA,
        articles_from_kafka,
    )

    good = [{"id": "a", "title": "t", "text": "x", "date": "2024-01-01 00:00:00"}]
    rows = _kafka_rows([good])
    rows.append((None, None, "articles", 0, 99, None, 0))  # tombstone
    df = spark.createDataFrame(rows, KAFKA_SOURCE_SCHEMA)
    out = articles_from_kafka(df).collect()
    assert [r["id"] for r in out] == ["a"]  # tombstone gone entirely


def test_read_delimited_quarantines_bad_rows(spark, tmp_path):
    from pyspark.sql import types as T

    from news_clustering_and_summarization_spark.sources.json_ingest import (
        read_delimited,
    )

    p = tmp_path / "data.tsv"
    p.write_text(
        "id\tn\ttext\n"
        "1\t10\tfirst row\n"
        "2\tnot_a_number\tbad type\n"
        "3\t30\tthird row\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = read_delimited(spark, str(p), schema, sep="\t")
    good = df.where("corrupt_record IS NULL").collect()
    bad = df.where("corrupt_record IS NOT NULL").collect()
    assert sorted(r["id"] for r in good) == [1, 3]
    assert len(bad) == 1 and "not_a_number" in bad[0]["corrupt_record"]
