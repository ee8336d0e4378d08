"""Skyline (Pareto frontier) operator tests."""

import duckdb
import hashlib

from news_clustering_and_summarization_spark.operators.skyline import (
    skyline_2d,
    skyline_2d_sql,
)


def _run(spark, pts, n_buckets=4):
    df = spark.createDataFrame(pts, ["id", "mn", "mx"])
    return sorted(
        tuple(r)
        for r in skyline_2d(
            df, "id", "mn", "mx", n_buckets=n_buckets
        ).collect()
    )


def test_skyline_hand_cases(spark):
    # classic staircase: (1,10) (2,20) dominated by nothing;
    # (3,15) dominated by (2,20); (2,5) dominated by (2,20)
    pts = [(1, 1, 10), (2, 2, 20), (3, 3, 15), (4, 2, 5)]
    assert _run(spark, pts) == [(1, 1, 10), (2, 2, 20)]
    # co-optimal duplicates both survive (no STRICT dominator)
    pts = [(1, 1, 10), (2, 1, 10)]
    assert _run(spark, pts) == [(1, 1, 10), (2, 1, 10)]
    # single point
    assert _run(spark, [(7, 5, 5)]) == [(7, 5, 5)]
    # same min_axis: only the max survives
    pts = [(1, 1, 10), (2, 1, 11), (3, 1, 9)]
    assert _run(spark, pts) == [(2, 1, 11)]


def test_skyline_matches_not_exists_oracle(spark):
    """Seeded random points, several bucket counts — the two-phase
    window frontier must equal the NOT-EXISTS definition."""
    pts = []
    for i in range(300):
        h = hashlib.md5(f"sky|{i}".encode()).hexdigest()
        pts.append((i, int(h[:4], 16) % 50, int(h[4:8], 16) % 50))
    values = ", ".join(f"({a}, {b}, {c})" for a, b, c in pts)
    sql = skyline_2d_sql(
        f"SELECT * FROM (VALUES {values}) t(id, mn, mx)",
        "id",
        "mn",
        "mx",
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    for nb in (1, 4, 32):
        assert _run(spark, pts, n_buckets=nb) == want
