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
