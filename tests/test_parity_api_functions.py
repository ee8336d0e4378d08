"""Direct tests for public helper functions that had no verification
surface of their own (r07 package-wide orphan sweep): vector algebra
(l2_normalize, centroid_of — A2, process_records.py:396-400), the
hamming SQL twin, the S3 base64 decode entry (decode_article_records,
SURVEY S3/M6), and the catalog utility table_exists."""

from __future__ import annotations

import base64
import json

from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.functions.hashing import (
    SIMHASH_BITS,
    hamming_distance_sql,
)
from news_clustering_and_summarization_spark.functions.vectors import (
    centroid_of,
    l2_normalize,
)
from news_clustering_and_summarization_spark.sources.json_ingest import (
    decode_article_records,
)
from news_clustering_and_summarization_spark.sources.tables import (
    table_exists,
)


def test_hamming_distance_sql_popcount():
    import duckdb

    a, b = 0b1011001, 0b0011100
    expect = bin(a ^ b).count("1")
    got = duckdb.sql(
        f"SELECT {hamming_distance_sql(str(a), str(b))} AS h"
    ).fetchone()[0]
    assert got == expect
    # identical inputs -> 0; full-width check stays in range
    assert (
        duckdb.sql(
            f"SELECT {hamming_distance_sql('5', '5')} AS h"
        ).fetchone()[0]
        == 0
    )
    assert SIMHASH_BITS >= 32


def test_l2_normalize_and_centroid(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], ["v"])
    out = df.select(
        l2_normalize("v").alias("n"),
        centroid_of(F.array(F.col("v"), F.array(F.lit(1.0), F.lit(0.0)))).alias(
            "c"
        ),
    ).collect()[0]
    assert out["n"] == [0.6, 0.8]
    assert out["c"] == [2.0, 2.0]  # mean of (3,4) and (1,0)


def test_decode_article_records_good_and_corrupt(spark):
    payload = base64.b64encode(
        json.dumps(
            [
                {"id": "a1", "title": "T1", "text": "body one"},
                {"id": "a2", "title": "T2", "text": "body two"},
            ]
        ).encode()
    ).decode()
    bad = base64.b64encode(b"{not json").decode()
    df = spark.createDataFrame([(payload,), (bad,)], ["data"])
    rows = decode_article_records(df).collect()
    good = sorted(r["id"] for r in rows if r["id"] is not None)
    assert good == ["a1", "a2"]
    corrupt = [r for r in rows if r["id"] is None]
    assert len(corrupt) == 1
    assert corrupt[0]["corrupt_record"] is not None


def test_table_exists(spark):
    assert not table_exists(spark, "no_such_table_xyz")
    spark.createDataFrame([(1,)], ["x"]).createOrReplaceTempView(
        "parity_api_tmp_view"
    )
    assert table_exists(spark, "parity_api_tmp_view")
