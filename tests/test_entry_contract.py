"""Replicates the driver's correctness gate: every queries() entry
with an oracle must hash-match DuckDB at sf0.001 (driver uses sf0.01;
same code path, smaller data for test speed). Also smoke-checks
entry() and the no-oracle queries."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE, rows_match

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0  # driver contract: runs + stable schema
    assert df.columns == ["cluster_rep", "n_members"]


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    got = QUERIES[name](spark, SF_SMOKE)
    ok, msg = rows_match(got, duck.sql(ORACLES[name]))
    assert ok, f"{name}:\n{msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_no_oracle_queries_run(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.count() >= 0


def test_catalog_registry_consistency():
    """Every oracle belongs to a query, and every query has a full
    value oracle — since r05 the ANN/LSH family replays exactly in
    DuckDB (md5-derived Rademacher hyperplanes), so the rows-only
    set is empty."""
    from news_clustering_and_summarization_spark.plans import catalog

    assert set(catalog.ORACLES) <= set(catalog.QUERIES)
    rows_only = set(catalog.QUERIES) - set(catalog.ORACLES)
    assert rows_only == set()
    # every oracle is non-trivial SQL text
    assert all(
        isinstance(s, str) and "SELECT" in s.upper()
        for s in catalog.ORACLES.values()
    )
