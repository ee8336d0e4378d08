"""ANN operators: brute-force exactness vs a DuckDB oracle; IVF recall
floor vs brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.functions import vectors as V
from news_clustering_and_summarization_spark.operators import similarity as S
from tests.conftest import SF_SMOKE, assert_matches_oracle


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def _queries(emb, n=5):
    return emb.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )


def test_brute_force_topk_oracle(spark, emb, duck):
    got = S.brute_force_topk(_queries(emb), emb, k=5).withColumn(
        "cosine", F.round("cosine", 6)
    )
    cos = V.dot_sql("q.embedding", "c.embedding")
    nrm = f"({V.norm_sql('q.embedding')} * {V.norm_sql('c.embedding')})"
    oracle = f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {cos} / {nrm} AS cosine
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 5
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
      ) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
    FROM ranked WHERE rank <= 5
    """
    assert_matches_oracle(got, duck, oracle)


def test_brute_force_self_neighbor_excluded(spark, emb):
    got = S.brute_force_topk(_queries(emb, 3), emb, k=3).collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in got)
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())


def test_ivf_recall_floor(spark, emb):
    q = _queries(emb, 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(q, emb, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ivf_topk(q, emb, k=10, nlist=8, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall {recall:.2f}"


def test_ivf_more_probes_higher_recall(spark, emb):
    q = _queries(emb, 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(q, emb, k=10).collect()
    }
    cents = S.train_ivf_centroids(emb, nlist=8)
    r_low = len(exact & {
        (r["query_id"], r["neighbor_id"])
        for r in S.ivf_topk(q, emb, cents, k=10, nprobe=1).collect()
    })
    r_high = len(exact & {
        (r["query_id"], r["neighbor_id"])
        for r in S.ivf_topk(q, emb, cents, k=10, nprobe=8).collect()
    })
    assert r_high >= r_low
    # probing every cell == exact
    assert r_high == len(exact)


def test_lsh_recall_floor(spark, emb):
    q = _queries(emb, 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(q, emb, k=10).collect()
    }
    # the synthetic embeddings are near-orthogonal random vectors —
    # the worst case for LSH (no neighborhood structure), so probe a
    # generous fraction and assert a conservative floor
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in S.lsh_topk(
            q, emb, dim=64, k=10, nbits=6, probe_radius=2
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.35, f"LSH recall {recall:.2f}"


def test_lsh_candidates_subset_and_exact_rerank(spark, emb):
    """Every returned pair's cosine must equal the exact cosine (the
    rerank is exact; only the candidate set is approximate)."""
    q = _queries(emb, 5)
    got = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in S.lsh_topk(
            q, emb, dim=64, k=10, nbits=6, probe_radius=2
        ).collect()
    }
    exact_all = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in S.brute_force_topk(q, emb, k=len(emb.collect())).collect()
    }
    for pair, cos in got.items():
        assert abs(cos - exact_all[pair]) < 1e-9, pair


def test_ivf_index_partition_pruning(spark, tmp_path):
    """The materialized IVF layout must (1) agree with the in-memory
    ivf_topk given the same centroids, and (2) plan the probe with a
    PartitionFilters entry so only probed cells' files are read."""
    from news_clustering_and_summarization_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_from_index,
        train_ivf_centroids,
        write_ivf_index,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = (
        emb.where("vec_id % 100 = 0")
        .selectExpr("vec_id AS query_id", "embedding AS query_vec")
    )
    cents = train_ivf_centroids(emb, nlist=8)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, cents, path)

    out_idx = ivf_topk_from_index(
        queries, path, cents, k=5, nprobe=2
    )
    out_mem = ivf_topk(
        queries, emb, centroids=cents, k=5, nprobe=2
    )
    rows_idx = sorted(map(tuple, out_idx.collect()))
    rows_mem = sorted(map(tuple, out_mem.collect()))
    assert [r[:3] for r in rows_idx] == [r[:3] for r in rows_mem]

    plan = out_idx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    # the scan must list fewer partition dirs than nlist when the
    # query batch probes a strict subset of cells
    import re as _re

    filters = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    # several scans appear (queries, index); the index scan must carry
    # a non-empty partition filter on cell
    assert any("cell" in f for f in filters), filters


def test_ivf_index_incremental_append(spark, tmp_path):
    """Index written in two installments must answer identically to
    the index written in one shot."""
    from news_clustering_and_summarization_spark.operators.similarity import (
        append_ivf_index,
        ivf_topk_from_index,
        train_ivf_centroids,
        write_ivf_index,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cents = train_ivf_centroids(emb, nlist=8)
    queries = (
        emb.where("vec_id % 100 = 7")
        .selectExpr("vec_id AS query_id", "embedding AS query_vec")
    )
    one_shot = str(tmp_path / "full")
    write_ivf_index(emb, cents, one_shot)
    staged = str(tmp_path / "staged")
    write_ivf_index(emb.where("vec_id % 2 = 0"), cents, staged)
    append_ivf_index(emb.where("vec_id % 2 = 1"), cents, staged)
    a = sorted(map(tuple, ivf_topk_from_index(
        queries, one_shot, cents, k=5, nprobe=3).collect()))
    b = sorted(map(tuple, ivf_topk_from_index(
        queries, staged, cents, k=5, nprobe=3).collect()))
    assert a == b and len(a) > 0


def test_mine_triplets_picks_hardest_pairs(spark):
    from news_clustering_and_summarization_spark.operators.similarity import (
        mine_triplets,
    )

    # anchor 1 (label A): same-label 2 is close, 3 is far -> hard
    # positive is 3; different-label 4 is closer than 5 -> hard
    # negative is 4; margin = cos(1,4) - cos(1,3)
    rows = [
        (1, [1.0, 0.0, 0.0], "A"),
        (2, [0.9, 0.1, 0.0], "A"),
        (3, [0.0, 1.0, 0.0], "A"),
        (4, [0.8, 0.0, 0.6], "B"),
        (5, [0.0, 0.0, 1.0], "B"),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = mine_triplets(df.where("vec_id = 1"), df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["hard_positive_id"] == 3
    assert r["hard_negative_id"] == 4
    assert r["margin"] == r["neg_cosine"] - r["pos_cosine"] > 0


def test_lsh_bucket_udf_matches_fold_and_planes(spark):
    """The Arrow-matmul bucket and the pure-Column quantized fold must
    agree bit-for-bit (both feed oracles that replay buckets in SQL)."""
    from pyspark.sql import functions as F

    from news_clustering_and_summarization_spark.operators.similarity import (
        lsh_bucket_col,
        lsh_bucket_udf,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    v = F.col("embedding").cast("array<double>")
    df = emb.select(
        "vec_id",
        lsh_bucket_udf(64, 18, 42)(v).alias("b_udf"),
        lsh_bucket_col(v, 64, 18, 42).alias("b_col"),
    )
    assert df.where(F.col("b_udf") != F.col("b_col")).count() == 0


def test_mmr_rerank_prefers_diversity(spark):
    """Three near-identical top vectors + one distinct: plain top-2
    would take two clones; MMR's second pick must be the distinct
    direction. The unrolled SQL twin is bit-identical."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.similarity import (
        mmr_rerank,
        mmr_rerank_sql,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),          # query
        (1, [0.99, 0.14, 0.0]),        # clone A (closest)
        (2, [0.99, 0.141, 0.0]),       # clone B
        (3, [0.99, 0.139, 0.0]),       # clone C
        (4, [0.7, -0.71, 0.0]),        # distinct direction
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = [
        tuple(r)
        for r in mmr_rerank(df, query_id=0, pool_k=4, k=3).collect()
    ]
    order = [t[1] for t in got]
    # first pick = highest query cosine (clone with the smallest
    # off-axis component relative to its norm = id 3); second pick
    # MUST be the distinct direction (clones pay ~1e6 similarity
    # penalty to the selected clone, id 4 pays ~0.6e6)
    assert order[0] == 3
    assert order[1] == 4
    assert got[0][3] == 0  # rank-1 max_sim_q convention
    assert all(t[4] == 1 * t[2] - 1 * t[3] for t in got)  # λ=½ identity
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings (vec_id BIGINT, embedding DOUBLE[])"
    )
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    want = [
        tuple(r)
        for r in con.execute(
            mmr_rerank_sql("embeddings", query_id=0, pool_k=4, k=3)
        ).fetchall()
    ]
    assert got == want


def test_mmr_rerank_missing_query_is_empty(spark):
    from news_clustering_and_summarization_spark.operators.similarity import (
        mmr_rerank,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], ["vec_id", "embedding"]
    )
    assert mmr_rerank(df, query_id=99).collect() == []
