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


def test_ivf_two_level_active_path_exact_on_clustered_data(spark):
    # r11: routing is two-level (coarse = isqrt(k)-stride over the
    # codebook). Force the ACTIVE two-level path — cprobe < kc — with
    # sample_mod=1 (every row a cell: k=120, cstride=10, kc=12 > 4).
    # Families are tight angular cones 30° apart with members 0.1°
    # apart, ids contiguous per family, so the stride lands EXACTLY
    # one coarse centroid inside each family and every member's
    # nearest coarse group is unambiguously its own family — on such
    # data the margin cap makes the index EXACT: the pair set must
    # equal brute force, dist and all. (One-hot near-orthogonal
    # families would NOT give this: there the coarse ranking is
    # noise-driven and recall is only a measured quantity.)
    import math as m

    rows = [
        (
            i,
            [
                m.cos(m.radians(30.0 * (i // 10) + 0.1 * (i % 10))),
                m.sin(m.radians(30.0 * (i // 10) + 0.1 * (i % 10))),
                0.0,
                0.0,
            ],
        )
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).localCheckpoint(eager=True)
    eps = 0.001  # intra-family cos-dist <= 1-cos(0.9°) ~ 1.2e-4
    ivf = _pairs(
        C.ivf_epsilon_pairs(
            df, eps, id_col="vec_id", vec_col="embedding",
            sample_mod=1, nprobe=10, cprobe=4,
        )
    )
    brute = _pairs(
        C.brute_force_pairs(
            df, df, eps, id_col="vec_id", vec_col="embedding"
        )
    )
    assert set(ivf) == set(brute)
    assert len(brute) == 12 * 10 * 9  # every intra-family ordered pair
    # dists agree to float noise (ivf emits the exact fold-order
    # cosine — pinned bit-for-bit vs Catalyst in
    # test_ivf_dist_matches_engine_fold_exactly — while brute's
    # kernel uses a BLAS matmul: last-ulp differences are expected)
    assert all(abs(ivf[p] - brute[p]) < 1e-12 for p in brute)


def test_ivf_cprobe_monotone_and_saturated_is_one_level(spark, corpus):
    # cprobe >= kc probes every group — the fine ranking then runs
    # over ALL cells, i.e. the r10 one-level semantics; any two
    # saturated values must agree exactly. Below saturation the
    # coarse cut only PRUNES candidate cells (same margin, same
    # nprobe rank over a subset), so the default-cprobe answer must
    # be a subset of the saturated one, and on this corpus (k=83,
    # kc=10 > 8: active two-level) the measured loss stays small.
    eps = 0.10
    kw = dict(
        id_col="vec_id", vec_col="embedding", sample_mod=64, nprobe=8,
        both_directions=False,
    )
    a = _pairs(C.ivf_epsilon_pairs(corpus, eps, cprobe=10**6, **kw))
    a2 = _pairs(C.ivf_epsilon_pairs(corpus, eps, cprobe=10, **kw))
    assert a == a2  # kc == 10: both saturated, bit-identical
    b = _pairs(C.ivf_epsilon_pairs(corpus, eps, cprobe=8, **kw))
    # NOT a subset relation: pruning groups improves surviving cells'
    # ranks past the nprobe cut (and loosens the d2_home margin), so
    # each side can hold pairs the other misses — but every emitted
    # dist is exact-verified (identical where both found the pair)
    # and the overlap stays high even on this near-orthogonal corpus
    assert all(a[p] == b[p] for p in set(a) & set(b))
    assert len(set(a) & set(b)) >= 0.95 * len(a)
    assert 0.95 * len(a) <= len(b) <= 1.05 * len(a)


def test_similarity_pairs_ivf_rejects_distinct_right(spark, corpus):
    other = corpus.where(F.col("vec_id") % 2 == 0)
    with pytest.raises(ValueError, match="self-join"):
        C.similarity_pairs(
            corpus, other, 0.10, id_col="vec_id", vec_col="embedding",
            strategy="ivf",
        )
