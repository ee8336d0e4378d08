"""Product quantization (operators/pq.py): codebook members encode
losslessly, ADC equals the exact distance on quantized points,
shuffle-free encode plan, and parameter validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators.pq import (
    pq_adc_scores,
    pq_codebooks,
    pq_encode,
)


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (i, [float((i * 7 + j * 3) % 10) for j in range(8)])
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_codebook_members_encode_losslessly(spark, vectors):
    cbs = pq_codebooks(vectors, "vec_id", "v", m=4, k=8, dim=8)
    coded = pq_encode(vectors, "v", cbs)
    sampled = {r["vec_id"]: r for r in coded.where("vec_id < 8").collect()}
    for i, r in sampled.items():
        # vector i seeded codebook entry i in every subspace
        assert r["recon_err"] == 0.0, (i, r)
        assert list(r["codes"]) == [i] * 4


def test_recon_err_positive_for_non_members(spark, vectors):
    cbs = pq_codebooks(vectors, "vec_id", "v", m=4, k=8, dim=8)
    coded = pq_encode(vectors, "v", cbs)
    outside = coded.where("vec_id >= 8").collect()
    # the fixture's stride-7 pattern repeats mod 10 but not mod the
    # codebook sample, so most non-members quantize with some error
    assert any(r["recon_err"] > 0 for r in outside)
    assert all(r["recon_err"] >= 0 for r in outside)


def test_adc_exact_on_quantized_points(spark, vectors):
    """For a query that IS a codebook centroid in every subspace, ADC
    to a losslessly-encoded row equals the true squared distance."""
    cbs = pq_codebooks(vectors, "vec_id", "v", m=4, k=8, dim=8)
    coded = pq_encode(vectors, "v", cbs)
    rows = {r["vec_id"]: list(r["v"]) for r in vectors.collect()}
    q = rows[3]  # codebook member -> its subvectors are centroids
    scored = {
        r["vec_id"]: r["adc_dist"]
        for r in pq_adc_scores(
            coded.select("vec_id", "codes"), q, cbs
        ).collect()
    }
    for i in range(8):  # losslessly-encoded rows
        true = sum((a - b) ** 2 for a, b in zip(q, rows[i]))
        assert abs(scored[i] - true) < 1e-9, (i, scored[i], true)
    assert scored[3] == 0.0


def test_encode_plan_is_shuffle_free(spark, vectors):
    cbs = pq_codebooks(vectors, "vec_id", "v", m=4, k=8, dim=8)
    plan = (
        pq_encode(vectors, "v", cbs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_bad_params_rejected(spark, vectors):
    with pytest.raises(ValueError):
        pq_codebooks(vectors, "vec_id", "v", m=3, k=8, dim=8)
    with pytest.raises(ValueError):
        pq_codebooks(vectors, "vec_id", "v", m=4, k=100, dim=8)


def test_ivf_pq_composition(spark):
    """The full faiss-style index composition: IVF coarse cells
    (similarity.assign_cells) partition the corpus, PQ codes compress
    it, and a query probes its nearest cell(s) then ranks by ADC —
    touching only the probed cells' code columns. On well-separated
    blobs the composed search returns the true nearest neighbor."""
    from news_clustering_and_summarization_spark.operators.similarity import (
        assign_cells,
        train_ivf_centroids,
    )

    blobs = [  # direction-separated (cells are cosine-based)
        [10.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
        [1.0, 10.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
        [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 10.0, 10.0],
    ]
    rows = []
    for i in range(24):
        b = blobs[i % 3]
        rows.append((i, [x + ((i * 5) % 7) * 0.05 for x in b]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = train_ivf_centroids(corpus, nlist=3, corpus_vec="embedding")
    celled = assign_cells(corpus, cents, "embedding", "vec_id", n_cells=1)

    cbs = pq_codebooks(corpus, "vec_id", "embedding", m=4, k=16, dim=8)
    coded = pq_encode(celled, "embedding", cbs).select(
        "vec_id", "cell", "codes"
    )

    # query: a point near vec_id 3 (blob 0)
    q = [x + 0.01 for x in rows[3][1]]
    qcell = (
        assign_cells(
            spark.createDataFrame([(0, q)], "qid long, embedding array<double>"),
            cents, "embedding", "qid", n_cells=1,
        ).collect()[0]["cell"]
    )
    probed = coded.where(F.col("cell") == qcell)
    # probed partition excludes the other blobs entirely
    probed_ids = {r["vec_id"] for r in probed.select("vec_id").collect()}
    assert probed_ids == {i for i in range(24) if i % 3 == 0}

    top = (
        pq_adc_scores(probed, q, cbs)
        .orderBy("adc_dist", "vec_id")
        .limit(1)
        .collect()[0]
    )
    true_best = min(
        probed_ids,
        key=lambda i: sum((a - b) ** 2 for a, b in zip(q, rows[i][1])),
    )
    assert top["vec_id"] == true_best == 3
