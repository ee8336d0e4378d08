"""On-disk IVF ε-pair index (operators/eps_index.py, r10 verdict
item 6): index-read == in-memory join, append == rebuild against the
frozen codebook, incremental new×(pool∪new) semantics, and static
partition pruning of the history scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators import cluster as C
from news_clustering_and_summarization_spark.operators import eps_index as X
from news_clustering_and_summarization_spark.testing import inflate_vectors

EPS = 0.10
KW = dict(id_col="vec_id", vec_col="embedding")
IDX_KW = dict(sample_mod=64, nprobe=8, cprobe=8, n_buckets=16, **KW)


@pytest.fixture(scope="module")
def corpus(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    return inflate_vectors(emb, 10).localCheckpoint(eager=True)


def _pairs(df):
    return {(r["l_id"], r["r_id"]): r["dist"] for r in df.collect()}


def test_index_read_equals_in_memory_join(spark, corpus, tmp_path):
    p = str(tmp_path / "idx")
    X.write_eps_index(corpus, p, EPS, **IDX_KW)
    from_idx = _pairs(X.eps_pairs_from_index(spark, p))
    in_mem = _pairs(
        C.ivf_epsilon_pairs(
            corpus, EPS, sample_mod=64, nprobe=8, cprobe=8,
            both_directions=False, **KW,
        )
    )
    assert from_idx == in_mem  # identical pairs AND exact dists


def test_append_equals_rebuild_with_frozen_codebook(spark, corpus, tmp_path):
    from news_clustering_and_summarization_spark.functions import (
        hashing as H,
    )

    split = H.hash64(F.col("vec_id").cast("string")) % 10 == 0
    base = corpus.where(~split).localCheckpoint(eager=True)
    batch = corpus.where(split).localCheckpoint(eager=True)
    assert batch.count() > 0

    p_app = str(tmp_path / "appended")
    X.write_eps_index(base, p_app, EPS, **IDX_KW)
    X.append_eps_index(batch, p_app, **KW)

    # rebuild over base∪batch INJECTING base's codebook (a fresh
    # stride over the union is a different index by definition)
    cb = (
        spark.read.parquet(p_app + "/_codebook")
        .select(F.col("_id").alias("vec_id"),
                F.col("_v").alias("embedding"))
    )
    p_reb = str(tmp_path / "rebuilt")
    X.write_eps_index(corpus, p_reb, EPS, codebook=cb, **IDX_KW)

    a = _pairs(X.eps_pairs_from_index(spark, p_app))
    b = _pairs(X.eps_pairs_from_index(spark, p_reb))
    assert a == b


def test_incremental_matches_full_delta(spark, corpus, tmp_path):
    from news_clustering_and_summarization_spark.functions import (
        hashing as H,
    )

    split = H.hash64(F.col("vec_id").cast("string")) % 10 == 0
    base = corpus.where(~split).localCheckpoint(eager=True)
    batch = corpus.where(split).localCheckpoint(eager=True)
    new_ids = {r["vec_id"] for r in batch.select("vec_id").collect()}

    p = str(tmp_path / "idx")
    X.write_eps_index(base, p, EPS, **IDX_KW)
    inc = _pairs(X.eps_pairs_incremental(batch, p, **KW))
    # every incremental pair involves >= 1 new endpoint
    assert all(
        (lid in new_ids) or (rid in new_ids) for lid, rid in inc
    )
    # and equals the delta of the appended index vs the base index:
    # full(appended) - full(base) (same frozen codebook throughout)
    before = _pairs(X.eps_pairs_from_index(spark, p))
    X.append_eps_index(batch, p, **KW)
    after = _pairs(X.eps_pairs_from_index(spark, p))
    delta = {k: v for k, v in after.items() if k not in before}
    assert inc == delta


def test_incremental_scan_is_partition_pruned(spark, corpus, tmp_path):
    p = str(tmp_path / "idx")
    X.write_eps_index(corpus, p, EPS, **IDX_KW)
    batch = corpus.limit(20).localCheckpoint(eager=True)
    plan = X.eps_pairs_incremental(
        batch, p, **KW
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell_bucket" in plan
    import re

    filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("cell_bucket" in f and "IN" in f.upper() for f in filters)


def test_query_rejects_quant_mismatch(spark, corpus, tmp_path):
    import json
    import os

    p = str(tmp_path / "idx")
    X.write_eps_index(corpus.limit(100), p, EPS, **IDX_KW)
    pp = os.path.join(p, "_params.json")
    with open(pp) as f:
        params = json.load(f)
    params["quant"] = 1 << 10
    with open(pp, "w") as f:
        json.dump(params, f)
    with pytest.raises(ValueError, match="quant"):
        X.eps_pairs_from_index(spark, p)


def test_append_rejects_id_type_mismatch(spark, corpus, tmp_path):
    p = str(tmp_path / "idx")
    X.write_eps_index(corpus, p, EPS, **IDX_KW)
    bad = corpus.limit(5).select(
        F.col("vec_id").cast("string").alias("vec_id"), "embedding"
    )
    with pytest.raises(ValueError, match="id_type"):
        X.append_eps_index(bad, p, **KW)


def test_empty_corpus_index_roundtrip(spark, tmp_path):
    p = str(tmp_path / "idx")
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    X.write_eps_index(empty, p, EPS, **IDX_KW)
    assert X.eps_pairs_from_index(spark, p).count() == 0
