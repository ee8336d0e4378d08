"""Managed-table writers: bucketing and date-partitioning.

At 100 TB the dominant cost of the big fact-fact joins is the shuffle
of both sides. Spark's answer is *bucketed tables*: write each side
``bucketBy(n, key)`` once, and every later equi-join or aggregation on
that key reads co-located buckets — the planner drops the Exchange
entirely (and with ``sortBy`` the sort too). The reference has no
storage layer to express this (DynamoDB's hash key is the analogue,
iac/roots/main/main.tf:50-87); for our engine it's the standing
physical design for `articles`/`cluster_articles` at scale.

Partitioned writes are the other half: date-partitioned sinks give
partition pruning on time-ranged queries (the serving scans, S13) so
a day's query reads a day's files, not the corpus.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def _safe_name(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", name)


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    *bucket_cols: str,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> str:
    """Persist ``df`` as a managed parquet table bucketed (and
    optionally sorted) on ``bucket_cols``. Returns the table name.

    Joins/aggregations between tables bucketed the same way on the
    same keys run shuffle-free; with matching ``sort_cols`` the
    sort-merge join also skips its sort.
    """
    table = _safe_name(table)
    spark = df.sparkSession
    # overwrite must also clear an orphaned location (a managed-table
    # dir left by a previous session the in-memory catalog forgot)
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        _delete_path(
            spark, f"{spark.conf.get('spark.sql.warehouse.dir')}/{table}"
        )
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
    return table


def write_partitioned(
    df: DataFrame,
    path: str,
    *partition_cols: str,
    mode: str = "overwrite",
) -> None:
    """Write a parquet dataset partitioned by ``partition_cols``
    (hive-style directories). Filters on those columns later prune at
    the directory level — the scan never opens non-matching files."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def table_exists(spark: SparkSession, table: str) -> bool:
    return spark.catalog.tableExists(_safe_name(table))


def _delete_path(spark: SparkSession, path: str) -> None:
    """Delete a filesystem path through the Hadoop FS API (works for
    any scheme the cluster can reach, not just local disk)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        fs.delete(hpath, True)
