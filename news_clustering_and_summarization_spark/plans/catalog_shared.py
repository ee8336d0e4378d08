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


# Session-scoped TABLE METADATA cache (r12, guide §6 — the same class
# of caching a catalog table or filesourcePartitionFileCache gives
# you): plan-time parquet schema inference costs ~0.1s per
# spark.read.parquet call, and the bench's 39 queries x (warmup + 3
# reps) re-open the same ~10 tables >200 times. Keyed by
# (applicationId, sf_dir, table) so a new session (or different data
# dir) always re-infers; values are SCHEMAS (+ the scan partition
# count widen() probes), never rows or results — every action still
# scans the parquet data.
_META_CACHE: dict[tuple[str, str, str], dict] = {}


def _meta(spark: SparkSession, sf_dir: str, name: str) -> dict:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    ent = _META_CACHE.get(key)
    if ent is None:
        if len(_META_CACHE) > 256:  # bound: a few sessions' tables
            _META_CACHE.clear()
        ent = _META_CACHE[key] = {}
    return ent


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet has shipped with ts as TIMESTAMP(NANOS) (which
        # Spark's parquet reader rejects without the legacy flag) in
        # some generator versions and TIMESTAMP(MICROS) in others.
        # Enable the nanos-as-long fallback, then rebuild a micros
        # timestamp only if ts actually arrived as a long.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    meta = _meta(spark, sf_dir, name)
    raw_schema = meta.get("schema")
    if raw_schema is None:
        df = spark.read.parquet(path)
        meta["schema"] = df.schema
    else:
        # explicit schema -> no plan-time footer inference; the scan
        # itself (row groups, data pages) is unchanged
        df = spark.read.schema(raw_schema).parquet(path)
    df._graft_src = (sf_dir, name)  # widen()'s scan-partition cache key
    if name == "events":
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
        df._graft_src = (sf_dir, name)  # re-attach past the withColumn
    return df


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
    # The .rdd partition probe costs ~50-100ms of physical planning
    # per call; every widen() site wraps load() directly, and a
    # table's scan partitioning is fixed per (session, file), so the
    # probe result is cached in the same metadata cache load() uses
    # (r12 — same gate, same number, paid once per table per session).
    src = getattr(df, "_graft_src", None)
    if src is not None:
        meta = _meta(spark, src[0], src[1])
        n = meta.get("scan_partitions")
        if n is None:
            n = meta["scan_partitions"] = df.rdd.getNumPartitions()
    else:
        n = df.rdd.getNumPartitions()
    if n >= parts:
        return df
    return df.repartition(parts)


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,4)")


def _money(c: F.Column) -> F.Column:
    return F.round(c, 2).cast("double")


