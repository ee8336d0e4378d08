"""inflate_vectors internals: the r11 mapInArrow kernel must be
bit-identical to the documented LCG expression on every path —
including null vectors (the Arrow slow path) and the float32 input
widening — and to the DuckDB SQL twin the cluster_lsh oracles replay.
"""

import duckdb
import numpy as np
import pytest

from news_clustering_and_summarization_spark.testing import (
    _LCG_A,
    _LCG_C,
    _LCG_M,
    _MIX_B,
    inflate_vectors,
    inflate_vectors_sql,
)


def _expected(vec, inflated_id, dim, noise=0.05, seed=42):
    """Scalar replay of the documented LCG perturbation."""
    out = []
    for j in range(1, dim + 1):
        s1 = (inflated_id + seed) % _LCG_M
        s2 = (s1 * _LCG_A + _LCG_C) % _LCG_M
        s3 = (s2 * _LCG_A + j * _MIX_B) % _LCG_M
        v = s3 % 2001 - 1000
        out.append(np.float64(vec[j - 1]) + (v / 1000.0) * noise)
    return out


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (7, [0.25, -1.5, 3.0]),
        (11, None),  # null vector: Arrow slow path
        (12, [0.0, 0.0, 0.0]),
        (1_000_003, [1e-3, -2.5e2, 0.125]),
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def test_inflate_bit_identical_to_lcg_replay(spark, emb):
    got = {
        r["vec_id"]: r["embedding"]
        for r in inflate_vectors(emb, 3).collect()
    }
    assert len(got) == 12
    for base_id, vec in [
        (7, [0.25, -1.5, 3.0]),
        (12, [0.0, 0.0, 0.0]),
        (1_000_003, [1e-3, -2.5e2, 0.125]),
    ]:
        for c in range(3):
            rid = base_id * 3 + c
            exp = _expected(vec, rid, 3)
            assert got[rid] == exp, rid  # exact doubles, not approx
    for c in range(3):
        assert got[11 * 3 + c] is None


def test_inflate_matches_duckdb_twin(spark, emb):
    non_null = emb.where("embedding is not null")
    got = sorted(
        (r["vec_id"], tuple(r["embedding"]))
        for r in inflate_vectors(non_null, 4).collect()
    )
    con = duckdb.connect()
    pdf = non_null.toPandas()
    con.register("embeddings", pdf)
    sql = inflate_vectors_sql("embeddings", 4, dim=3)
    exp = sorted(
        (int(r[0]), tuple(float(x) for x in r[1]))
        for r in con.execute(sql).fetchall()
    )
    assert got == exp


def test_inflate_float32_input_widens_exactly(spark):
    emb32 = spark.createDataFrame(
        [(3, [0.1, 0.2])], "vec_id bigint, embedding array<float>"
    )
    got = {
        r["vec_id"]: r["embedding"]
        for r in inflate_vectors(emb32, 2).collect()
    }
    base = [float(np.float32(0.1)), float(np.float32(0.2))]
    for c in range(2):
        assert got[3 * 2 + c] == _expected(base, 3 * 2 + c, 2)


def test_inflate_ragged_divisible_takes_slow_path(spark):
    """r12 advice fix: mixed-dim rows whose total flattened length
    divides n (dims [2, 4] with n=2 -> 6 values) must NOT take the
    zero-copy reshape; the offsets-based width check routes them to
    the per-row slow path, which reproduces each row at its own dim."""
    emb = spark.createDataFrame(
        [(1, [0.5, 1.5]), (2, [2.5, 3.5, 4.5, 5.5])],
        "vec_id bigint, embedding array<double>",
    ).coalesce(1)  # one Arrow batch -> the ragged-divisible shape
    got = {
        r["vec_id"]: r["embedding"]
        for r in inflate_vectors(emb, 2).collect()
    }
    assert got[1 * 2 + 0] == _expected([0.5, 1.5], 2, 2)
    assert got[2 * 2 + 1] == _expected([2.5, 3.5, 4.5, 5.5], 5, 4)


def test_arrow_vec_matrix_rejects_ragged_divisible():
    """r12 advice fix: _arrow_vec_matrix must raise on ragged input
    even when the flattened length divides n."""
    import pyarrow as pa

    from news_clustering_and_summarization_spark.operators.cluster import (
        _arrow_vec_matrix,
    )

    ragged = pa.array([[1.0, 2.0], [3.0, 4.0, 5.0, 6.0]])
    with pytest.raises(ValueError, match="ragged"):
        _arrow_vec_matrix(ragged, 2, np)
    sliced = pa.array([[9.0], [1.0, 2.0], [3.0, 4.0]]).slice(1, 2)
    assert _arrow_vec_matrix(sliced, 2, np).tolist() == [
        [1.0, 2.0],
        [3.0, 4.0],
    ]
