"""IVF ε-pair index (operators/cluster.ivf_epsilon_pairs, r09
verdict item 1): recall vs brute force, zero false positives, exact
fold-order distances, deterministic tie handling, contract edges.
The full DuckDB bit-replay lives in the catalog oracle
(cluster_ivf / cluster_ivf_verify); these tests cover the operator
surface directly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators import cluster as C
from news_clustering_and_summarization_spark.testing import inflate_vectors


@pytest.fixture(scope="module")
def corpus(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    return inflate_vectors(emb, 10).localCheckpoint(eager=True)


def _pairs(df):
    return {(r["l_id"], r["r_id"]): r["dist"] for r in df.collect()}


def test_ivf_recall_and_zero_fp_vs_brute(spark, corpus):
    eps = 0.10
    ivf = _pairs(
        C.ivf_epsilon_pairs(
            corpus, eps, id_col="vec_id", vec_col="embedding",
            sample_mod=64, nprobe=8,
        )
    )
    brute = _pairs(
        C.brute_force_pairs(
            corpus, corpus, eps, id_col="vec_id", vec_col="embedding"
        )
    )
    extra = set(ivf) - set(brute)
    assert not extra, f"false positives: {sorted(extra)[:5]}"
    recall = len(set(ivf) & set(brute)) / len(brute)
    assert recall >= 0.95, recall  # measured ~0.99+; 0.7 is the bar


def test_ivf_dist_matches_engine_fold_exactly(spark, corpus):
    # emitted dist must equal the Catalyst cosine_distance expression
    # BIT-FOR-BIT (the property the full value oracle depends on)
    from news_clustering_and_summarization_spark.functions import (
        vectors as V,
    )

    eps = 0.10
    ivf = C.ivf_epsilon_pairs(
        corpus, eps, id_col="vec_id", vec_col="embedding",
        sample_mod=64, nprobe=8,
    ).where(F.col("l_id") < F.col("r_id"))
    vecs = corpus.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    joined = (
        ivf.join(vecs.withColumnRenamed("vec_id", "l_id")
                     .withColumnRenamed("e", "le"), "l_id")
        .join(vecs.withColumnRenamed("vec_id", "r_id")
                  .withColumnRenamed("e", "re"), "r_id")
        .withColumn("engine_dist",
                    V.cosine_distance(F.col("le"), F.col("re")))
    )
    bad = joined.where(F.col("dist") != F.col("engine_dist")).count()
    assert bad == 0


def test_ivf_both_directions_no_self_pairs(spark, corpus):
    out = C.ivf_epsilon_pairs(
        corpus, 0.10, id_col="vec_id", vec_col="embedding",
        sample_mod=64,
    )
    rows = out.collect()
    pairs = {(r["l_id"], r["r_id"]) for r in rows}
    assert len(pairs) == len(rows)  # no duplicate rows
    assert all(l != r for l, r in pairs)
    assert all((r, l) in pairs for l, r in pairs)  # mirrored


def test_ivf_deterministic_across_runs(spark, corpus):
    kw = dict(id_col="vec_id", vec_col="embedding", sample_mod=32,
              nprobe=4)
    a = _pairs(C.ivf_epsilon_pairs(corpus, 0.10, **kw))
    b = _pairs(C.ivf_epsilon_pairs(corpus, 0.10, **kw))
    assert a == b


def test_ivf_duplicate_vectors_tie_handling(spark):
    # identical vectors -> d2 TIES everywhere (including at the
    # argpartition boundary); all true pairs must still surface, each
    # exactly once per direction
    base = [
        (i, [1.0 if j == i // 4 else 0.0 for j in range(8)])
        for i in range(32)
    ]
    df = spark.createDataFrame(
        base, "vec_id long, embedding array<double>"
    )
    out = C.ivf_epsilon_pairs(
        df, 0.01, id_col="vec_id", vec_col="embedding",
        sample_mod=4, nprobe=2,
    )
    rows = out.where(F.col("l_id") < F.col("r_id")).collect()
    got = {(r["l_id"], r["r_id"]) for r in rows}
    want = {
        (a, b)
        for a in range(32)
        for b in range(32)
        if a < b and a // 4 == b // 4
    }
    assert got == want
    assert len(rows) == len(got)
    assert all(r["dist"] == 0.0 for r in rows)


def test_ivf_string_ids(spark):
    df = spark.createDataFrame(
        [(f"d{i:03d}", [float(i % 3 == j) for j in range(4)])
         for i in range(12)],
        "vec_id string, embedding array<double>",
    )
    out = C.ivf_epsilon_pairs(
        df, 0.05, id_col="vec_id", vec_col="embedding", sample_mod=3
    )
    assert dict(out.dtypes)["l_id"] == "string"
    got = {(r["l_id"], r["r_id"]) for r in out.collect()}
    assert ("d000", "d003") in got  # same one-hot direction


def test_ivf_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert C.ivf_epsilon_pairs(
        df, 0.1, id_col="vec_id", vec_col="embedding"
    ).count() == 0


def test_similarity_pairs_ivf_strategy(spark, corpus):
    out = C.similarity_pairs(
        corpus, corpus, 0.10, id_col="vec_id", vec_col="embedding",
        strategy="ivf",
    )
    assert out.count() > 0


def test_brute_force_right_blocking_matches_unblocked(spark, corpus):
    # r10: the kernel blocks the right side (an unblocked
    # batch x right sim matrix OOMed the sf10 recall leg). A tiny
    # block budget must produce the identical pair set.
    eps = 0.10
    a = _pairs(
        C.brute_force_pairs(
            corpus, corpus, eps, id_col="vec_id", vec_col="embedding"
        )
    )
    b = _pairs(
        C.brute_force_pairs(
            corpus, corpus, eps, id_col="vec_id", vec_col="embedding",
            block_cells=2048,  # forces many sub-512-col blocks per batch
        )
    )
    assert a == b
