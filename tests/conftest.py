"""Shared fixtures: one SparkSession per test session, a DuckDB
connection with the testdata tables registered as views (mirroring the
driver's harness), and an order-insensitive compare helper."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from news_clustering_and_summarization_spark.session import get_spark

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = os.path.join(TESTDATA, "sf0.001")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def rows_match(spark_df, duck_rel, sort=True) -> tuple[bool, str]:
    """Order-insensitive, column-name-sorted comparison like the
    driver's value-hash check (floats rounded to 6 places)."""
    scols = sorted(spark_df.columns)
    srows = [
        tuple(_canon(r[c]) for c in scols) for r in spark_df.collect()
    ]
    dcols_all = [d[0] for d in duck_rel.description]
    assert sorted(dcols_all) == scols, (
        f"column mismatch: spark={scols} duck={sorted(dcols_all)}"
    )
    idx = [dcols_all.index(c) for c in scols]
    drows = [
        tuple(_canon(row[i]) for i in idx) for row in duck_rel.fetchall()
    ]
    if sort:
        srows, drows = sorted(srows, key=repr), sorted(drows, key=repr)
    if srows == drows:
        return True, ""
    diff = [
        f"spark={a!r} duck={b!r}"
        for a, b in zip(srows, drows)
        if a != b
    ][:5]
    if len(srows) != len(drows):
        diff.append(f"rowcount spark={len(srows)} duck={len(drows)}")
    return False, "\n".join(diff)


def assert_matches_oracle(spark_df, duck_con, sql):
    ok, msg = rows_match(spark_df, duck_con.sql(sql))
    assert ok, msg
