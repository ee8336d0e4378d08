"""Deterministic sampling operators: membership must be content-
addressed (stable under repartitioning and corpus growth), splits
disjoint+exhaustive, stratified sizes exact."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators import sampling as S
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_hash_sample_partition_independent(spark):
    docs = _docs(spark)
    a = {r.doc_id for r in S.hash_sample(docs, "doc_id", 0.2).collect()}
    b = {
        r.doc_id
        for r in S.hash_sample(docs.repartition(7), "doc_id", 0.2).collect()
    }
    assert a == b and a


def test_hash_sample_stable_under_growth(spark):
    """A row's membership doesn't change when other rows appear."""
    docs = _docs(spark)
    full = {r.doc_id for r in S.hash_sample(docs, "doc_id", 0.2).collect()}
    half_input = docs.where(F.col("n_chars") % 2 == 0)
    half = {
        r.doc_id for r in S.hash_sample(half_input, "doc_id", 0.2).collect()
    }
    kept_ids = {r.doc_id for r in half_input.select("doc_id").collect()}
    assert half == full & kept_ids


def test_train_test_split_disjoint_exhaustive(spark):
    docs = _docs(spark)
    n = docs.count()
    split = S.train_test_split(docs, "doc_id", test_fraction=0.25)
    counts = dict(
        split.groupBy("split").count().rdd.map(tuple).collect()
    )
    assert counts.get("test", 0) + counts.get("train", 0) == n
    # hash buckets approximate the fraction; 3-sigma binomial bound
    sigma = math.sqrt(n * 0.25 * 0.75)
    assert abs(counts.get("test", 0) - 0.25 * n) < 4 * sigma


def test_stratified_sample_exact_per_group(spark):
    # events.parquet carries TIMESTAMP(NANOS); catalog.load sets the
    # nanosAsLong conf the plain reader lacks
    from news_clustering_and_summarization_spark.plans.catalog import load

    ev = load(spark, SF_SMOKE, "events")
    totals = dict(
        ev.groupBy("event_type").count().rdd.map(tuple).collect()
    )
    got = dict(
        S.stratified_sample(ev, "event_type", "event_id", 0.1)
        .groupBy("event_type")
        .count()
        .rdd.map(tuple)
        .collect()
    )
    for k, n in totals.items():
        assert got.get(k, 0) == math.ceil(n * 0.1), (k, n, got.get(k))


def test_mix_datasets_rates_and_epochs(spark):
    from news_clustering_and_summarization_spark.operators.sampling import (
        mix_datasets,
    )

    n = 2000
    a = spark.range(n).withColumnRenamed("id", "k")
    b = spark.range(n, 2 * n).withColumnRenamed("id", "k")
    out = mix_datasets([(a, 2.5), (b, 0.1)], key_col="k").toPandas()
    a_rows = out[out.k < n]
    b_rows = out[out.k >= n]
    # every A row appears exactly twice at epochs 0/1, plus ~half at 2
    assert set(a_rows.mix_epoch.unique()) == {0, 1, 2}
    assert (a_rows.groupby("k").size() >= 2).all()
    frac_a = (a_rows.mix_epoch == 2).sum() / n
    assert 0.4 < frac_a < 0.6
    # B kept at ~10%, epoch 0 only
    assert set(b_rows.mix_epoch.unique()) == {0}
    assert 0.05 < len(b_rows) / n < 0.15
    # determinism: second run identical
    out2 = mix_datasets([(a, 2.5), (b, 0.1)], key_col="k").toPandas()
    assert sorted(map(tuple, out.values.tolist())) == sorted(
        map(tuple, out2.values.tolist())
    )


def test_mix_datasets_rejects_bad_input(spark):
    import pytest as _pytest

    from news_clustering_and_summarization_spark.operators.sampling import (
        mix_datasets,
    )

    a = spark.range(5).withColumnRenamed("id", "k")
    with _pytest.raises(ValueError):
        mix_datasets([(a, -0.5)], key_col="k")
    with _pytest.raises(ValueError):
        mix_datasets([], key_col="k")


def test_leakage_safe_split_groups_never_straddle(spark):
    from news_clustering_and_summarization_spark.operators.sampling import (
        leakage_safe_split,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and once"),
        (3, "completely different content about spark query engines at scale"),
        (4, "unrelated text regarding weather patterns in northern regions"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(df, test_fraction=0.5, seed=3).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 5  # exhaustive, 1:1
    # docs 0,1,2 form one near-dup group -> identical canonical + split
    group = {by_id[i]["split"] for i in (0, 1, 2)}
    assert len(group) == 1
    assert len({by_id[i]["canonical_id"] for i in (0, 1, 2)}) == 1
    # determinism across invocations
    again = {r["doc_id"]: r["split"]
             for r in leakage_safe_split(df, test_fraction=0.5, seed=3).collect()}
    assert again == {k: v["split"] for k, v in by_id.items()}


def test_select_token_budget_greedy_prefix(spark):
    from news_clustering_and_summarization_spark.operators.sampling import (
        select_token_budget,
    )

    rows = [  # (id, shard, tokens, quality)
        (1, "en", 500, 0.9),
        (2, "en", 400, 0.8),
        (3, "en", 300, 0.7),   # cum 1200 > 1000 -> excluded
        (4, "de", 999, 0.1),
        (5, "de", 2, 0.99),
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, lang string, n_tok int, q double"
    )
    out = select_token_budget(
        df, budget=1000, tokens_col="n_tok", quality_col="q",
        id_col="doc_id", shard_col="lang",
    )
    got = sorted((r["doc_id"], r["cum_tokens"]) for r in out.collect())
    # en: 1(500), 2(900); de: 5(2) then 4 would hit 1001 -> out
    assert got == [(1, 500), (2, 900), (5, 2)]


def test_select_token_budget_tie_break_on_id(spark):
    from news_clustering_and_summarization_spark.operators.sampling import (
        select_token_budget,
    )

    df = spark.createDataFrame(
        [(2, 10, 1.0), (1, 10, 1.0)], "doc_id int, n_tok int, q double"
    )
    out = select_token_budget(
        df, budget=10, tokens_col="n_tok", quality_col="q",
        id_col="doc_id",
    )
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_select_token_budget_empty_input(spark):
    from news_clustering_and_summarization_spark.operators.sampling import (
        select_token_budget,
    )

    df = spark.createDataFrame([], "doc_id int, n_tok int, q double")
    out = select_token_budget(
        df, budget=100, tokens_col="n_tok", quality_col="q",
        id_col="doc_id",
    )
    assert out.count() == 0


def test_weighted_sample_extremes_and_stability(spark):
    from news_clustering_and_summarization_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.range(500).select(
        F.col("id").alias("k"),
        (F.col("id") % 2 == 0).cast("double").alias("w"),  # 0.0 or 1.0
    )
    kept = weighted_sample(df, "k", "w")
    ids = sorted(r["k"] for r in kept.collect())
    # weight 1 rows always survive, weight 0 rows never do
    assert ids == list(range(0, 500, 2))
    # partition-layout invariance: same survivors at any parallelism
    again = weighted_sample(df.repartition(13), "k", "w")
    assert sorted(r["k"] for r in again.collect()) == ids


def test_weighted_sample_rate_tracks_weight(spark):
    from news_clustering_and_summarization_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.range(4000).select(
        F.col("id").alias("k"), F.lit(0.3).alias("w")
    )
    n = weighted_sample(df, "k", "w").count()
    assert 0.25 <= n / 4000 <= 0.35


def test_dsir_weights_rank_target_like_docs_first(spark):
    # target speaks "alpha beta"; source docs that share that bigram
    # vocabulary must outweigh the off-domain ones
    from news_clustering_and_summarization_spark.operators.sampling import (
        dsir_importance_weights,
    )

    source = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta alpha beta"),
            (2, "alpha beta gamma delta"),
            (3, "gamma delta epsilon zeta gamma delta"),
        ],
        ["id", "text"],
    )
    target = spark.createDataFrame(
        [(10, "alpha beta alpha beta"), (11, "beta alpha beta alpha")],
        ["id", "text"],
    )
    w = {
        r["id"]: r["dsir_weight"]
        for r in dsir_importance_weights(
            source, target, "id", "text", 256
        ).collect()
    }
    assert w[1] > w[2] > w[3], w
    assert w[3] < 0, "off-domain doc scores below the uniform prior"


def test_temperature_mix_flattens_domains(spark):
    from news_clustering_and_summarization_spark.operators.sampling import (
        temperature_mix,
    )

    # 900 'big' rows vs 100 'small': at T=2 the small domain's rate
    # must exceed its natural share; at T~inf rates converge
    rows = [(i, "big") for i in range(900)] + [
        (i + 1000, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["id", "dom"])
    out = temperature_mix(df, "dom", "id", target_total=200, temperature=2.0)
    rates = {
        r["dom"]: r["domain_rate"]
        for r in out.select("dom", "domain_rate").distinct().collect()
    }
    assert rates["small"] > rates["big"], rates
    # sampled size lands near the target (hash-bucket variance)
    n = out.count()
    assert 140 <= n <= 260, n
    # determinism: same inputs -> identical selection
    again = temperature_mix(df, "dom", "id", 200, 2.0)
    assert sorted(r["id"] for r in out.collect()) == sorted(
        r["id"] for r in again.collect()
    )


def test_dsir_returns_row_for_bigramless_docs(spark):
    from news_clustering_and_summarization_spark.operators.sampling import (
        dsir_importance_weights,
    )

    source = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "solo"), (3, "")],
        ["id", "text"],
    )
    target = spark.createDataFrame([(9, "alpha beta")], ["id", "text"])
    out = {
        r["id"]: r["dsir_weight"]
        for r in dsir_importance_weights(
            source, target, "id", "text", 64
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[2] is None and out[3] is None
    assert out[1] is not None


# --- dup_weighted_sample (round 6) -----------------------------------


def test_dup_weighted_sample_weights_and_determinism(spark):
    from news_clustering_and_summarization_spark.operators.sampling import (
        SAMPLE_BUCKETS,
        dup_weighted_sample,
    )

    dup = "alpha beta gamma delta epsilon zeta"
    rows = [(i, dup) for i in range(3)] + [
        (10 + i, " ".join(f"u{i}w{j}" for j in range(6))) for i in range(4)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["cluster_size"], r["weight_q"], r["sampled"])
        for r in dup_weighted_sample(docs, threshold=0.5).collect()
    }
    assert len(out) == 7
    for i in range(3):
        assert out[i][0] == 3 and out[i][1] == SAMPLE_BUCKETS // 3
    for i in range(4):
        assert out[10 + i] == (1, SAMPLE_BUCKETS, True)  # singletons kept
    # deterministic: re-run is identical
    again = {
        r["doc_id"]: (r["cluster_size"], r["weight_q"], r["sampled"])
        for r in dup_weighted_sample(docs, threshold=0.5).collect()
    }
    assert again == out


def test_doremi_weights_direction_and_normalization(spark):
    """Domains with above-average chars-per-token upweight; weights
    stay normalized and smoothing pulls toward uniform."""
    from news_clustering_and_summarization_spark.operators.sampling import (
        doremi_domain_weights,
    )

    rows = [("verbose", "aaaaaaaaaa bbbbbbbbbb cccccccccc")] * 4 + [
        ("terse", "a b c")
    ] * 4
    df = spark.createDataFrame(rows, ["source", "text"])
    out = {
        r["domain"]: r
        for r in doremi_domain_weights(df, "source", "text").collect()
    }
    assert out["verbose"]["excess_q"] > 0 > out["terse"]["excess_q"]
    assert out["verbose"]["w_q"] > 500_000 > out["terse"]["w_q"]
    total = sum(r["w_q"] for r in out.values())
    assert abs(total - 1_000_000) <= 2  # integer rounding only
    # smoothing moves both toward uniform (500k at k=2)
    assert out["verbose"]["w_smooth_q"] < out["verbose"]["w_q"]
    assert out["terse"]["w_smooth_q"] > out["terse"]["w_q"]


def test_doremi_weights_uniform_corpus(spark):
    from news_clustering_and_summarization_spark.operators.sampling import (
        doremi_domain_weights,
    )

    rows = [("a", "xx yy zz"), ("b", "xx yy zz"), ("c", "xx yy zz")]
    df = spark.createDataFrame(rows, ["source", "text"])
    out = doremi_domain_weights(df, "source", "text").collect()
    assert all(r["excess_q"] == 0 for r in out)
    assert all(abs(r["w_q"] - 333_333) <= 1 for r in out)


def test_stratified_kfold_balance_and_determinism(spark):
    """Every stratum spreads across all k folds with sizes differing
    by <= 1; the assignment is identical under a different input
    partitioning (pure function of the data)."""
    from news_clustering_and_summarization_spark.operators.sampling import (
        stratified_kfold,
        stratified_kfold_summary,
        stratified_kfold_summary_sql,
    )
    import duckdb

    rows = [(i, f"s{i % 3}") for i in range(101)]
    df = spark.createDataFrame(rows, ["id", "stratum"])
    out = stratified_kfold(df, "id", "stratum", k=5).collect()
    sizes = {}
    for r in out:
        sizes.setdefault(r["stratum"], {}).setdefault(r["fold"], 0)
        sizes[r["stratum"]][r["fold"]] += 1
    for strat, folds in sizes.items():
        assert set(folds) == {0, 1, 2, 3, 4}, strat
        assert max(folds.values()) - min(folds.values()) <= 1
    again = stratified_kfold(
        df.repartition(7, "id"), "id", "stratum", k=5
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    got = sorted(
        tuple(r)
        for r in stratified_kfold_summary(df, "id", "stratum", 5).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, stratum VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        con.execute(
            stratified_kfold_summary_sql("t", "id", "stratum", 5)
        ).fetchall()
    )
    assert got == want


def test_dsir_target_predicate_matches_two_frame_path(spark):
    """r11: target_predicate (one materialized bigram pass) must give
    exactly the weights of tokenizing target = source.where(pred)."""
    from pyspark.sql import functions as F

    from news_clustering_and_summarization_spark.operators.sampling import (
        dsir_importance_weights,
    )

    source = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta alpha beta", "en"),
            (2, "alpha beta gamma delta", "en"),
            (3, "gamma delta epsilon zeta gamma delta", "de"),
            (4, None, "en"),
            (5, "solo", None),
        ],
        ["id", "text", "lang"],
    )
    target = source.where(F.col("lang") == "en")
    two_frame = sorted(
        map(
            tuple,
            dsir_importance_weights(source, target, "id", "text", 64).collect(),
        )
    )
    pred = sorted(
        map(
            tuple,
            dsir_importance_weights(
                source,
                target,
                "id",
                "text",
                64,
                target_predicate=F.col("lang") == "en",
            ).collect(),
        )
    )
    assert two_frame == pred
