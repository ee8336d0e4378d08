"""Embedding compression: JL projection distance preservation and
int8 quantization round-trip error."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from news_clustering_and_summarization_spark.functions import vectors as V
from tests.conftest import SF_SMOKE


def test_rademacher_signs_deterministic_and_balanced():
    a = V.rademacher_signs(64, 16, seed=42)
    b = V.rademacher_signs(64, 16, seed=42)
    assert a == b
    assert all(s in (1.0, -1.0) for row in a for s in row)
    # roughly balanced signs (md5 uniformity): within 3 sigma
    total = sum(s for row in a for s in row)
    assert abs(total) < 3 * math.sqrt(64 * 16)
    assert V.rademacher_signs(64, 16, seed=1) != a


def test_jl_projection_preserves_distances(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    signs = V.rademacher_signs(64, 16)
    v = F.col("embedding").cast("array<double>")
    out = emb.select(
        "vec_id", v.alias("v"), V.project_jl(v, signs).alias("p")
    ).limit(60).collect()
    orig = {r["vec_id"]: np.array(r["v"]) for r in out}
    proj = {r["vec_id"]: np.array(r["p"]) for r in out}
    ids = sorted(orig)[:40]
    ratios = []
    for i in range(0, len(ids) - 1, 2):
        a, b = ids[i], ids[i + 1]
        d0 = np.linalg.norm(orig[a] - orig[b])
        d1 = np.linalg.norm(proj[a] - proj[b])
        if d0 > 1e-9:
            ratios.append(d1 / d0)
    # JL with k=16: individual pairs are noisy, the mean ratio is ~1
    assert 0.7 < float(np.mean(ratios)) < 1.3


def test_quantize_roundtrip_error_bound(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    v = F.col("embedding").cast("array<double>")
    scale, q = V.quantize_int8(v)
    rows = emb.select(
        v.alias("v"), scale.alias("s"), q.alias("q")
    ).limit(100).collect()
    for r in rows:
        vv = np.array(r["v"])
        back = np.array(r["q"], dtype=float) * r["s"]
        # symmetric quantization error <= scale/2 per element
        assert float(np.max(np.abs(vv - back))) <= r["s"] / 2 + 1e-12
        assert max(abs(x) for x in r["q"]) <= 127


def test_quantize_all_zero_vector(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0, 0.0],)], "v array<double>"
    )
    scale, q = V.quantize_int8(F.col("v"))
    r = df.select(scale.alias("s"), q.alias("q")).collect()[0]
    assert r["s"] == 0.0 and r["q"] == [0, 0, 0]
