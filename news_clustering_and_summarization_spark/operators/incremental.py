"""Incremental aggregate maintenance: merge a new batch's partial
aggregates into a persisted per-key aggregate state instead of
re-scanning history.

The reference recomputes its per-cluster counters by re-reading
DynamoDB state each batch (process_records.py:271-338); here the same
idea is generalized to arbitrary keyed aggregates the way a
materialized view is maintained: the historical corpus is never
re-scanned — each refresh costs O(|delta| + |state|), with the delta
pre-aggregated map-side before it ever shuffles, and the state join
keyed so both sides hash-partition on the group key.

All supported aggregates are decomposable (count/sum/min/max — avg is
derived sum/count at read time), so merge(state, partial(delta)) ==
aggregate(history ∪ delta) exactly. Sums ride DECIMAL(18,4) so the
merge is order-free and replayable bit-for-bit in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["partial_aggregate", "merge_aggregate_state", "finalize_aggregates"]

_DEC = "decimal(18,4)"


def partial_aggregate(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Per-key decomposable partials of ``value_col``:
    (keys..., n, sum_value DECIMAL(18,4), min_value, max_value).
    This is the map-side-combinable shape — Spark plans it as
    partial_hashagg -> exchange -> final_hashagg, so the shuffle
    carries one row per (partition, key), not the raw data."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast(_DEC)).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def merge_aggregate_state(
    state: DataFrame, delta_partial: DataFrame, keys: list[str]
) -> DataFrame:
    """Merge two partial-aggregate states (full outer on ``keys``):
    counts and sums add, min/max take least/greatest. New keys appear,
    absent keys pass through unchanged. Output schema == input schema,
    so the merge composes (day -> week -> month rollups, or repeated
    streaming refreshes)."""
    s = state.alias("s")
    d = delta_partial.alias("d")
    cond = [F.col(f"s.{k}").eqNullSafe(F.col(f"d.{k}")) for k in keys]
    joined = s.join(d, cond, "full_outer")
    key_cols = [
        F.coalesce(F.col(f"s.{k}"), F.col(f"d.{k}")).alias(k) for k in keys
    ]
    zero = F.lit(0).cast("long")
    zdec = F.lit(0).cast(_DEC)
    return joined.select(
        *key_cols,
        (
            F.coalesce(F.col("s.n"), zero) + F.coalesce(F.col("d.n"), zero)
        ).alias("n"),
        (
            F.coalesce(F.col("s.sum_value"), zdec)
            + F.coalesce(F.col("d.sum_value"), zdec)
        ).cast(_DEC).alias("sum_value"),
        F.least(F.col("s.min_value"), F.col("d.min_value")).alias(
            "min_value"
        ),
        F.greatest(F.col("s.max_value"), F.col("d.max_value")).alias(
            "max_value"
        ),
    )


def finalize_aggregates(state: DataFrame, keys: list[str]) -> DataFrame:
    """Read-time view over the state: rounds the exact decimal sum to
    2 places as a double and derives the average as ONE IEEE division
    (exact-decimal sum / count), the catalog's cross-engine-stable
    formulation."""
    return state.select(
        *keys,
        F.col("n"),
        F.round(F.col("sum_value").cast("double"), 2).alias("total_value"),
        F.round(
            F.col("sum_value").cast("double") / F.col("n"), 6
        ).alias("avg_value"),
        F.col("min_value"),
        F.col("max_value"),
    )
