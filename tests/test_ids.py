"""stable_ids must equal the row_number formulation for any partition
count and be invariant to the input's physical layout."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators.ids import stable_ids
from news_clustering_and_summarization_spark.plans.catalog import load
from tests.conftest import SF_SMOKE


def _expected(df, key):
    return df.withColumn(
        "stable_id", F.row_number().over(Window.orderBy(key)) - 1
    )


def test_matches_row_number(spark):
    docs = load(spark, SF_SMOKE, "documents").select("doc_id")
    got = stable_ids(docs, ["doc_id"], num_partitions=8)
    want = _expected(docs, "doc_id")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_invariant_to_partition_count_and_layout(spark):
    docs = load(spark, SF_SMOKE, "documents").select("doc_id")
    a = stable_ids(docs, ["doc_id"], num_partitions=3).collect()
    b = stable_ids(
        docs.repartition(17), ["doc_id"], num_partitions=11
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_dense_zero_based(spark):
    docs = load(spark, SF_SMOKE, "documents").select("doc_id")
    n = docs.count()
    ids = stable_ids(docs, ["doc_id"], num_partitions=5).select("stable_id")
    stats = ids.agg(
        F.min("stable_id"), F.max("stable_id"), F.countDistinct("stable_id")
    ).first()
    assert tuple(stats) == (0, n - 1, n)
