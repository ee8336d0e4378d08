"""Shared column-expression helpers (text / hashing / vectors)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a DataFrame up to cluster parallelism when it
    arrives under-partitioned (a small parquet file scans as ONE
    partition, which would serialize every expensive per-row
    expression downstream — shingling, hashing, embedding UDFs).
    No-op when the input is already wide enough; round-robin, so
    results of order-insensitive operators are unchanged."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
