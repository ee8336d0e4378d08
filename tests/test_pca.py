"""top_component: exact power stepping + convergence on gapped
spectra (see operators/pca.py convergence contract)."""

import numpy as np
import pytest


def _planted(n=120, dim=16, seed=7):
    """Vectors = strong direction * coef + small noise: a spectrum
    with a real gap, where 3 power steps converge."""
    rng = np.random.RandomState(seed)
    v = rng.randn(dim)
    v /= np.linalg.norm(v)
    coefs = rng.randn(n) * 5.0
    noise = rng.randn(n, dim) * 0.3
    X = np.outer(coefs, v) + noise
    return X, v


def test_top_component_converges_on_gapped_spectrum(spark):
    from news_clustering_and_summarization_spark.operators.pca import (
        top_component,
    )

    X, v = _planted()
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    out = top_component(df, dim=16, iters=3).collect()
    assert [r["dim"] for r in out] == list(range(16))
    est = np.array([r["v_q"] for r in out], dtype=np.float64)
    est /= np.linalg.norm(est)
    # compare against the exact centered top right-singular vector
    Xc = X - X.mean(axis=0)
    true = np.linalg.svd(Xc, full_matrices=False)[2][0]
    assert abs(float(est @ true)) > 0.999
    # sign convention: the max-|coordinate| entry is positive
    assert est[int(np.argmax(np.abs(est)))] > 0


def test_top_component_matches_duckdb_replay(spark, duck):
    """Spark and the unrolled-CTE oracle agree bit-for-bit on the
    planted data (the cross-engine fixed-point contract)."""
    from news_clustering_and_summarization_spark.operators.pca import (
        top_component,
        top_component_sql,
    )

    X, _ = _planted(n=60, dim=8, seed=3)
    rows = [(i, [float(x) for x in r]) for i, r in enumerate(X)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [
        (r["dim"], r["mu_q"], r["v_q"])
        for r in top_component(df, dim=8, iters=3).collect()
    ]
    duck.execute("CREATE OR REPLACE TABLE _pca_t (vec_id BIGINT, embedding DOUBLE[])")
    duck.executemany("INSERT INTO _pca_t VALUES (?, ?)", rows)
    want = duck.sql(
        top_component_sql("_pca_t", dim=8, iters=3)
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_top_component_mean_is_exact(spark):
    from news_clustering_and_summarization_spark.operators.pca import (
        top_component,
    )

    rows = [(1, [1.0, -2.0]), (2, [3.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["dim"]: r["mu_q"] for r in top_component(df, dim=2, iters=1).collect()}
    assert out == {0: 2_000_000, 1: -1_000_000}


def test_gram_matrix_hand_case_and_twin(spark):
    """2-D vectors with known Gram: E = [[1,2],[3,4]] -> EᵀE =
    [[10,14],[14,20]] at quant² scale; upper triangle only; twin
    matches on a float corpus."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.pca import (
        GRAM_QUANT,
        gram_matrix,
        gram_matrix_sql,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], ["vec_id", "embedding"]
    )
    got = {
        (r["i"], r["j"]): int(r["g_q"])
        for r in gram_matrix(df).collect()
    }
    s = GRAM_QUANT * GRAM_QUANT
    assert got == {
        (0, 0): 10 * s,
        (0, 1): 14 * s,
        (1, 1): 20 * s,
    }

    import hashlib

    rows = []
    for i in range(40):
        h = hashlib.md5(f"gm|{i}".encode()).hexdigest()
        rows.append(
            (i, [
                (int(h[j * 3 : j * 3 + 3], 16) - 2048) / 4096.0
                for j in range(8)
            ])
        )
    df2 = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got2 = sorted(tuple(r) for r in gram_matrix(df2).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings (vec_id BIGINT, embedding DOUBLE[])"
    )
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(gram_matrix_sql("embeddings")).fetchall()
    )
    assert got2 == want
