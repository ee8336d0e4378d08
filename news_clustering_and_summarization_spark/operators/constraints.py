"""Declarative data-quality constraint suite — ONE scan, one job.

Every corpus build gates ingestion on a validation pass (null checks,
key uniqueness, domain membership, range checks). The reference's only
data-quality surface is its duplicate-key guards and the SQS size
guard (process_records.py:108-112, embed_docs.py:100-102) — this
generalizes that into a Deequ-style declarative suite, evaluated
without a per-rule scan:

* row-level rules (predicates) become conditional aggregates — all of
  them fold into a single partial-aggregated scan, so at 100 TB the
  cost is exactly one pass over the data regardless of rule count;
* uniqueness rules need a distinct count, which Spark plans as an
  Expand + two-phase hash aggregate INSIDE the same job — still one
  scan of the source.

The wide 1-row aggregate is melted to one row per rule with a
zero-shuffle Expand (same shape as profiling.profile_columns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["row_rule", "unique_rule", "check_constraints"]


def row_rule(name: str, predicate: Column) -> dict:
    """A rule satisfied row-by-row: ``predicate`` must hold (NULL
    counts as a violation — a rule you cannot evaluate is not
    satisfied, matching SQL CHECK semantics would instead pass NULLs,
    so we pin the stricter reading and document it)."""
    return {"kind": "row", "name": name, "predicate": predicate}


def unique_rule(name: str, *cols: str) -> dict:
    """A rule over the whole relation: the (non-null) combination of
    ``cols`` must be unique. Violations = n_non_null_rows -
    n_distinct_combinations (0 when unique)."""
    return {"kind": "unique", "name": name, "cols": list(cols)}


def check_constraints(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` in one aggregation job.

    Returns one row per rule, in the caller's rule order:
    ``(rule, n_rows, n_violations, passed)``.
    """
    if not rules:
        raise ValueError("at least one rule required")
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for i, r in enumerate(rules):
        if r["kind"] == "row":
            aggs.append(
                F.coalesce(
                    F.sum(
                        # NULL predicate -> violation (strict reading)
                        F.when(r["predicate"], 0).otherwise(1)
                    ),
                    # empty relation: zero rows violate (sum is NULL)
                    F.lit(0),
                ).alias(f"__v{i}")
            )
        elif r["kind"] == "unique":
            key = (
                F.col(r["cols"][0])
                if len(r["cols"]) == 1
                else F.struct(*[F.col(c) for c in r["cols"]])
            )
            non_null = F.count(key).alias(f"__nn{i}")
            distinct = F.countDistinct(key).alias(f"__nd{i}")
            aggs += [non_null, distinct]
        else:  # pragma: no cover - guarded by the two constructors
            raise ValueError(f"unknown rule kind {r['kind']!r}")
    wide = df.agg(*aggs)

    structs = []
    for i, r in enumerate(rules):
        if r["kind"] == "row":
            viol = F.col(f"__v{i}")
        else:
            viol = F.col(f"__nn{i}") - F.col(f"__nd{i}")
        structs.append(
            F.struct(
                F.lit(r["name"]).alias("rule"),
                F.col("__n_rows").alias("n_rows"),
                viol.cast("long").alias("n_violations"),
                (viol == 0).alias("passed"),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("r")).select("r.*")
