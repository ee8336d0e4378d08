"""Shared catalog plumbing: table loader, scan-width floor and the
money/decimal determinism helpers every family module uses (split out
of the former catalog monolith in r08 — same names, re-exported
through plans.catalog so the driver contract and every existing
import keep working)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet has shipped with ts as TIMESTAMP(NANOS) (which
        # Spark's parquet reader rejects without the legacy flag) in
        # some generator versions and TIMESTAMP(MICROS) in others.
        # Enable the nanos-as-long fallback, then rebuild a micros
        # timestamp only if ts actually arrived as a long.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer division, not `/`: float division of ~1.7e18-ns
            # longs loses precision (double has 53 mantissa bits) and
            # can truncate 1us low vs DuckDB's exact epoch_us
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type == "timestamp_ntz":
            # TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as NTZ;
            # the session timezone is pinned to UTC (session.py:33), so
            # this cast is a pure type change, not a clock shift —
            # downstream unix_micros()/window() calls need TIMESTAMP.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def widen(spark: SparkSession, df: DataFrame, parts: int | None = None) -> DataFrame:
    """Scan-width floor for queries whose FIRST stage does heavy
    per-row compute (tokenize / shingle / md5 / explode). At real
    scale a table arrives as thousands of file splits and this is a
    no-op; a small single-row-group parquet file (the bench inputs)
    arrives as ONE unsplittable task, serializing the whole compute
    stage on one core while 31 idle. One cheap round-robin exchange
    of the raw rows buys cores-wide parallelism — gated on the
    actual scan partitioning so a wide source is never reshuffled
    (the 100 TB case must not pay a corpus shuffle for this).
    Predicate pushdown and column pruning pass through the exchange
    (verified: PushedFilters reaches the scan under repartition —
    r08 plan audit)."""
    parts = parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= parts:
        return df
    return df.repartition(parts)


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,4)")


def _money(c: F.Column) -> F.Column:
    return F.round(c, 2).cast("double")


