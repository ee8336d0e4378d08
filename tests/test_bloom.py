"""Bloom filter operator (operators/bloom.py): build/probe bit
arithmetic, no-false-negative guarantee, dense vs sparse probe parity,
and exact anti-join semantics of dedup_against_corpus."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from news_clustering_and_summarization_spark.operators import bloom as B


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(2000).selectExpr("concat('key-', id) AS k")


def test_bloom_params_sizing():
    m, k = B.bloom_params(1000, 0.01)
    assert m % 64 == 0
    # textbook optimum for p=0.01 is ~9.585 bits/key, k ~ 7
    assert 9 * 1000 <= m <= 11 * 1000
    assert 6 <= k <= 8
    # degenerate input doesn't divide by zero
    assert B.bloom_params(0, 0.01)[0] > 0


def test_no_false_negatives(spark, corpus):
    m, k = B.bloom_params(2000, 0.01)
    words = B.bloom_build(corpus, "k", m, k)
    probed = B.bloom_probe(corpus, "k", words, m, k)
    assert probed.where(~F.col("bloom_maybe")).count() == 0


def test_false_positive_rate_near_design(spark, corpus):
    m, k = B.bloom_params(2000, 0.01)
    words = B.bloom_build(corpus, "k", m, k)
    absent = spark.range(2000, 12000).selectExpr("concat('key-', id) AS k")
    fp = (
        B.bloom_probe(absent, "k", words, m, k)
        .where(F.col("bloom_maybe"))
        .count()
    )
    # design fpp 1%; allow generous slack (10k trials)
    assert fp / 10000 < 0.03


def test_dense_sparse_probe_parity(spark, corpus):
    m, k = B.bloom_params(2000, 0.01)
    words = B.bloom_build(corpus, "k", m, k)
    probe = spark.range(1000, 3000).selectExpr("concat('key-', id) AS k")
    dense = B._probe_dense(probe, "k", words, m, k, "maybe")
    sparse = B._probe_sparse(probe, "k", words, m, k, "maybe")
    d = {r["k"]: r["maybe"] for r in dense.collect()}
    s = {r["k"]: r["maybe"] for r in sparse.collect()}
    assert d == s


def test_dedup_against_corpus_is_exact_anti_join(spark, corpus):
    new = spark.range(1500, 4000).selectExpr("concat('key-', id) AS k")
    out = B.dedup_against_corpus(new, corpus, "k", 2000)
    got = sorted(r["k"] for r in out.collect())
    want = sorted(f"key-{i}" for i in range(2000, 4000))
    assert got == want


def test_dedup_with_prebuilt_filter(spark, corpus):
    m, k = B.bloom_params(2000, 0.01)
    words = B.bloom_build(corpus, "k", m, k)
    new = spark.range(1990, 2010).selectExpr("concat('key-', id) AS k")
    out = B.dedup_against_corpus(
        new, corpus, "k", 2000, bloom_words=words
    )
    assert out.count() == 10


def test_null_keys_ignored_in_build(spark):
    src = spark.createDataFrame(
        [("a",), (None,), ("b",)], "k string"
    )
    m, k = B.bloom_params(2, 0.01)
    words = B.bloom_build(src, "k", m, k)
    # only non-null keys contribute bits: <= 2*k set bits total
    n_bits = words.selectExpr("sum(bit_count(word)) AS n").collect()[0]["n"]
    assert 0 < n_bits <= 2 * k


def test_bloom_merge_equals_direct_build(spark):
    a = spark.range(0, 700).selectExpr("concat('k', id) AS k")
    b = spark.range(700, 1400).selectExpr("concat('k', id) AS k")
    full = spark.range(0, 1400).selectExpr("concat('k', id) AS k")
    m, k = B.bloom_params(1400, 0.01)
    merged = B.bloom_merge(
        B.bloom_build(a, "k", m, k), B.bloom_build(b, "k", m, k)
    )
    direct = B.bloom_build(full, "k", m, k)
    mm = {r["word_idx"]: r["word"] for r in merged.collect()}
    dd = {r["word_idx"]: r["word"] for r in direct.collect()}
    assert mm == dd


def test_incremental_daily_flow(spark, tmp_path):
    """Day 1 builds + persists the filter; day 2 probes the parquet
    round-trip without touching day-1 data."""
    m, k = B.bloom_params(1000, 0.01)
    day1 = spark.range(1000).selectExpr("concat('k', id) AS k")
    path = str(tmp_path / "bloom_words")
    B.bloom_build(day1, "k", m, k).write.parquet(path)
    words = spark.read.parquet(path)
    day2 = spark.range(900, 1100).selectExpr("concat('k', id) AS k")
    novel = B.dedup_against_corpus(
        day2, day1, "k", 1000, bloom_words=words
    )
    assert novel.count() == 100
    # fold day-2 novelties in; day 3 sees them as known
    words2 = B.bloom_merge(words, B.bloom_build(novel, "k", m, k))
    again = B.bloom_probe(day2, "k", words2, m, k)
    assert again.where("NOT bloom_maybe").count() == 0


def test_bloom_equals_anti_join_on_random_sets(spark):
    """Property check over several randomized corpus/batch overlaps:
    dedup_against_corpus must equal the plain anti-join regardless of
    overlap shape, fpp pressure, or duplicate keys in the batch."""
    import random

    rng = random.Random(7)
    for trial in range(4):
        n_corpus = rng.randrange(1, 400)
        corpus_keys = rng.sample(range(1000), n_corpus)
        batch_keys = [rng.randrange(1000) for _ in range(rng.randrange(1, 300))]
        corpus = spark.createDataFrame(
            [(f"k{i}",) for i in corpus_keys], "k string"
        )
        batch = spark.createDataFrame(
            [(f"k{i}",) for i in batch_keys], "k string"
        )
        # deliberately undersized filter (high fpp) on odd trials:
        # correctness must not depend on the sizing
        n_hint = n_corpus if trial % 2 == 0 else max(1, n_corpus // 20)
        got = sorted(
            r["k"]
            for r in B.dedup_against_corpus(
                batch, corpus, "k", n_hint
            ).collect()
        )
        want = sorted(
            f"k{i}" for i in batch_keys if i not in set(corpus_keys)
        )
        assert got == want, (trial, n_corpus, len(batch_keys))


def test_dense_probe_plan_is_shuffle_free(spark, corpus):
    m, k = B.bloom_params(2000, 0.01)
    words = B.bloom_build(corpus, "k", m, k)
    probe = spark.range(100).selectExpr("concat('key-', id) AS k")
    plan = (
        B._probe_dense(probe, "k", words, m, k, "maybe")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # membership test is an Arrow-batched projection against a
    # broadcast variable: no hash Exchange anywhere
    assert "Exchange hashpartitioning" not in plan
    assert "ArrowEvalPython" in plan


def test_empty_corpus_everything_novel(spark):
    corpus = spark.createDataFrame([], "k string")
    new = spark.range(5).selectExpr("concat('k', id) AS k")
    out = B.dedup_against_corpus(new, corpus, "k", 100)
    assert out.count() == 5


def test_empty_batch_empty_result(spark, corpus):
    new = spark.createDataFrame([], "k string")
    out = B.dedup_against_corpus(new, corpus, "k", 2000)
    assert out.count() == 0
