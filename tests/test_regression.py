"""OLS sufficient-statistics operator tests."""

import duckdb

from news_clustering_and_summarization_spark.operators.regression import (
    ols_fit,
    ols_fit_sql,
)


def test_ols_exact_line(spark):
    """Points exactly on y = 3x + 2: slope 3, intercept 2, R² = 1."""
    pts = [("a", x, 3 * x + 2) for x in range(10)]
    df = spark.createDataFrame(pts, ["g", "x", "y"])
    rows = ols_fit(df, "g", "x", "y").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["slope_q"] == 3_000_000
    assert r["intercept_q"] == 2_000_000
    assert r["r2_q"] == 1_000_000


def test_ols_group_gates_and_constant_y(spark):
    """Groups below min_n or with zero x-variance drop; constant-y
    groups get slope 0 and R² defined as 1."""
    pts = (
        [("tiny", 1, 5), ("tiny", 2, 6)]          # n=2 < min_n
        + [("novar", 7, i) for i in range(5)]      # den = 0
        + [("const", x, 9) for x in range(5)]      # deny = 0
    )
    df = spark.createDataFrame(pts, ["g", "x", "y"])
    rows = {r["g"]: r for r in ols_fit(df, "g", "x", "y").collect()}
    assert set(rows) == {"const"}
    assert rows["const"]["slope_q"] == 0
    assert rows["const"]["intercept_q"] == 9_000_000
    assert rows["const"]["r2_q"] == 1_000_000


def test_ols_matches_duckdb_twin_and_known_regression(spark):
    """Noisy deterministic data: Spark == DuckDB bit-for-bit, and
    both match the closed-form slope computed in Python."""
    import hashlib

    pts = []
    for g in ("p", "q"):
        for i in range(50):
            h = int(
                hashlib.md5(f"{g}|{i}".encode()).hexdigest()[:6], 16
            )
            pts.append((g, i, 2 * i + (h % 7)))
    df = spark.createDataFrame(pts, ["g", "x", "y"])
    got = sorted(tuple(r) for r in ols_fit(df, "g", "x", "y").collect())
    values = ", ".join(f"('{g}', {x}, {y})" for g, x, y in pts)
    sql = ols_fit_sql(
        f"SELECT * FROM (VALUES {values}) t(g, x, y)", "g", "x", "y"
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
    for g in ("p", "q"):
        sub = [(x, y) for gg, x, y in pts if gg == g]
        n = len(sub)
        sx = sum(x for x, _ in sub)
        sy = sum(y for _, y in sub)
        sxy = sum(x * y for x, y in sub)
        sxx = sum(x * x for x, _ in sub)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        row = [r for r in got if r[0] == g][0]
        assert abs(row[2] / 1e6 - slope) < 2e-6
