"""Distributed 2-D skyline (Pareto frontier) — the multi-objective
filter a curation pipeline runs when two quality signals trade off
(e.g. "shortest documents at each quality level", "cheapest part at
each size"): keep every row not DOMINATED by another (other is
better-or-equal on both axes, strictly better on one).

Börzsönyi, Kossmann & Stocker (ICDE 2001) introduced the operator;
the distributed shape used here is the standard two-phase
partition/merge (skyline is DISTRIBUTIVE: a globally non-dominated
point is non-dominated inside any subset containing it, so
frontier(S) ⊆ ∪ frontier(partition_i)):

1. **Local frontiers** — per hash bucket, a window partitioned by
   bucket ordered by the minimized axis: a row is dominated iff the
   running max of the maximized axis over STRICTLY-cheaper rows
   reaches it (integer RANGE frame ending at -1), or a same-price
   row strictly beats it (max over the (bucket, price) peer group).
   No self-join, no quadratic term — one sort per bucket.
2. **Global merge** — the same window over the union of local
   frontiers. That candidate set is at most Σ|local frontier|
   (frontiers of random partitions of n points have expected size
   O(log n) per bucket for independent axes) — the ONE global
   window in the plan runs over a provably reduced input, the same
   bounded-global-window pattern as vocab_coverage's top-k.

Determinism: both axes are exact integers (the minimized axis is
pre-quantized by the caller, e.g. price cents via
floor(x*100 + 0.5) on identical IEEE doubles), so dominance is
integer comparison — bit-identical on any engine. The oracle
deliberately uses the INDEPENDENT NOT-EXISTS formulation, so a
green hash certifies the window algebra against the definition
itself, not a replayed plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["skyline_2d"]

N_BUCKETS = 32


def _frontier(df: DataFrame, *, bucketed: bool) -> DataFrame:
    part = ["b"] if bucketed else []
    w_cheaper = (
        Window.partitionBy(*part)
        .orderBy("min_axis")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_peers = Window.partitionBy(*(part + ["min_axis"]))
    best_cheaper = F.max("max_axis").over(w_cheaper)
    best_peer = F.max("max_axis").over(w_peers)
    return df.withColumn("_bc", best_cheaper).withColumn(
        "_bp", best_peer
    ).where(
        (F.col("_bc").isNull() | (F.col("_bc") < F.col("max_axis")))
        & (F.col("_bp") == F.col("max_axis"))
    ).drop("_bc", "_bp")


def skyline_2d(
    df: DataFrame,
    id_col: str,
    min_col: str,
    max_col: str,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Pareto frontier of ``df`` minimizing ``min_col`` and
    maximizing ``max_col`` (both integer-valued columns).

    Output: (id, min_axis, max_axis) ordered by (min_axis, id);
    ties on both axes keep every co-optimal row (no strict
    dominator exists)."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(min_col).cast("long").alias("min_axis"),
        F.col(max_col).cast("long").alias("max_axis"),
        (F.crc32(F.col(id_col).cast("string")) % n_buckets).alias("b"),
    )
    local = _frontier(base, bucketed=True).select(
        "id", "min_axis", "max_axis"
    )
    return _frontier(local, bucketed=False).select(
        "id", "min_axis", "max_axis"
    ).orderBy("min_axis", "id")


def skyline_2d_sql(
    table_cte: str, id_col: str, min_col: str, max_col: str
) -> str:
    """DuckDB oracle: the NOT-EXISTS dominance definition (an
    independent formulation — see module docstring)."""
    return f"""
WITH pts AS MATERIALIZED (
  SELECT {id_col} AS id, {min_col} AS min_axis, {max_col} AS max_axis
  FROM ({table_cte})
)
SELECT p.id, p.min_axis::BIGINT AS min_axis,
       p.max_axis::BIGINT AS max_axis
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE (q.min_axis < p.min_axis AND q.max_axis >= p.max_axis)
     OR (q.min_axis = p.min_axis AND q.max_axis > p.max_axis)
)
ORDER BY min_axis, id
"""
