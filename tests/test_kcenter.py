"""kcenter_coreset at large k (r09 verdict item 6): the greedy
Gonzalez recurrence accumulates one nested `least(...)` per center,
so k past ~16 needs a lineage cut (localCheckpoint every 16 rounds,
the pagerank discipline) to keep plan analysis bounded. These tests
pin selection parity with the DuckDB unrolled-recurrence oracle at
k=20 — crossing the first cut at r=16 — so the cut provably does not
change results, and extend the oracled depth past the catalog's k=8."""

from __future__ import annotations

import os

import duckdb
import pytest

from news_clustering_and_summarization_spark.operators.sampling import (
    kcenter_coreset,
    kcenter_coreset_sql,
)
from tests.conftest import TESTDATA, rows_match

SF001 = os.path.join(TESTDATA, "sf0.01")


@pytest.mark.parametrize("k", [16, 20])
def test_kcenter_large_k_matches_oracle_across_lineage_cut(spark, k):
    # k=16 is the punch-list tier; k=20 crosses the r=16 lineage cut
    sdf = kcenter_coreset(
        spark.read.parquet(os.path.join(SF001, "embeddings.parquet")),
        k=k,
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF001}/embeddings.parquet')"
    )
    ok, msg = rows_match(sdf, con.sql(kcenter_coreset_sql(k=k)))
    con.close()
    assert ok, msg


def test_kcenter_radius_curve_decreasing(spark):
    # the k-center coverage radius is non-increasing by construction
    rows = kcenter_coreset(
        spark.read.parquet(os.path.join(SF001, "embeddings.parquet")),
        k=20,
    ).collect()
    radii = [r["radius_q"] for r in rows if r["radius_q"] is not None]
    assert len(rows) == 20
    assert all(a >= b for a, b in zip(radii, radii[1:]))
