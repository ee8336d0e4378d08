"""Dataset profiling: per-column statistics in ONE scan.

The ANALYZE-style pass every corpus build runs before training: row
counts, null fractions, distinct counts, min/max — computed for all
requested columns in a single aggregation (one job, one scan; the
per-column results are then melted to long form with a zero-shuffle
Expand). No reference analogue (its only data-quality surface is the
duplicate-key guards, SURVEY §2.2 P13) — engine extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled column:
    (column, n, n_null, n_distinct, min_value, max_value) — min/max
    rendered as strings so heterogeneous column types coexist."""
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__n"),
            F.sum(
                F.when(F.col(c).isNull(), 1).otherwise(0)
            ).alias(f"{c}__n_null"),
            F.countDistinct(c).alias(f"{c}__n_distinct"),
            # min/max on the NATIVE type, cast the result — casting
            # first would turn numeric order into lexicographic order
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__n_null").alias("n_null"),
            F.col(f"{c}__n_distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
