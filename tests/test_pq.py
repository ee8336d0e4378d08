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
