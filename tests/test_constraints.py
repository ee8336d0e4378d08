"""Declarative constraint suite (operators/constraints.py): planted
violations, strict NULL semantics, uniqueness accounting, and the
one-scan plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators.constraints import (
    check_constraints,
    row_rule,
    unique_rule,
)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", -5.0),     # violates price_positive
            (3, None, 20.0),    # violates name_not_null AND name_shape (NULL -> violation)
            (3, "c", 30.0),     # duplicate id
            (4, "dd", 40.0),
        ],
        "id long, name string, price double",
    )


def _by_rule(df):
    return {r["rule"]: r for r in df.collect()}

def test_planted_violations(spark, frame):
    out = _by_rule(
        check_constraints(
            frame,
            [
                row_rule("name_not_null", F.col("name").isNotNull()),
                row_rule("price_positive", F.col("price") > 0),
                unique_rule("id_unique", "id"),
                row_rule("name_shape", F.length("name") <= 1),
            ],
        )
    )
    assert out["name_not_null"]["n_violations"] == 1
    assert not out["name_not_null"]["passed"]
    assert out["price_positive"]["n_violations"] == 1
    # NULL predicate counts as a violation (strict CHECK reading):
    # row 3 has NULL name -> length(NULL)<=1 is NULL -> violation,
    # plus 'dd' -> 2 violations
    assert out["name_shape"]["n_violations"] == 2
    assert out["id_unique"]["n_violations"] == 1
    assert all(r["n_rows"] == 5 for r in out.values())


def test_all_green_suite(spark, frame):
    out = _by_rule(
        check_constraints(
            frame,
            [
                row_rule("id_not_null", F.col("id").isNotNull()),
                unique_rule("row_unique", "id", "name"),
            ],
        )
    )
    assert all(r["passed"] and r["n_violations"] == 0 for r in out.values())


def test_unique_ignores_null_keys(spark):
    # two NULL keys are not counted as duplicates of each other:
    # violations = count(non-null) - count(distinct non-null)
    df = spark.createDataFrame(
        [(None,), (None,), (1,), (1,), (2,)], "k int"
    )
    out = _by_rule(check_constraints(df, [unique_rule("k_unique", "k")]))
    assert out["k_unique"]["n_violations"] == 1


def test_one_scan_plan(spark, frame):
    """Row rules alone must stay a single-aggregate plan: exactly one
    scan of the source and no Expand fan-out (the melt's Expand runs
    on the 1-row aggregate, which Spark collapses to a local node)."""
    out = check_constraints(
        frame,
        [
            row_rule("a", F.col("price") > 0),
            row_rule("b", F.col("name").isNotNull()),
            row_rule("c", F.col("id") < 100),
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ExistingRDD") + plan.count("Scan") <= 2
    assert "HashAggregate" in plan


def test_empty_rules_rejected(spark, frame):
    with pytest.raises(ValueError):
        check_constraints(frame, [])


def test_empty_relation_passes_all_rules(spark):
    df = spark.createDataFrame([], "id long, name string, price double")
    out = _by_rule(
        check_constraints(
            df,
            [
                row_rule("price_positive", F.col("price") > 0),
                unique_rule("id_unique", "id"),
            ],
        )
    )
    for r in out.values():
        assert r["n_rows"] == 0
        assert r["n_violations"] == 0
        assert r["passed"]
