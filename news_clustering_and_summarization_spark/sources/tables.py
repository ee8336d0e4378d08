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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


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


TARGET_FILE_BYTES = 128 * 1024 * 1024  # match a default HDFS/scan block


def dataset_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under a dataset path (Hadoop FS contentSummary)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_files: int | None = None,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet dataset into ~TARGET_FILE_BYTES files.

    The small-files problem: a streaming sink or fine-grained merge
    leaves thousands of KB-scale files, and at scale the scan pays a
    task + open() per file. Compaction reads once, repartitions to
    size (or range-partitions by ``sort_by``, which also clusters the
    data for later predicate pruning via min/max footer stats), and
    atomically swaps the directory (write temp -> delete old ->
    rename), so concurrent readers see either the old or the new
    dataset, never a partial one. Returns the new file count.
    """
    df = spark.read.parquet(path)
    if target_files is None:
        target_files = max(1, dataset_bytes(spark, path) // TARGET_FILE_BYTES)
    if sort_by:
        out = df.repartitionByRange(int(target_files), *sort_by)
    else:
        out = df.repartition(int(target_files))
    tmp = path.rstrip("/") + ".compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(tmp)
    dst = jvm.org.apache.hadoop.fs.Path(path)
    fs = dst.getFileSystem(conf)
    fs.delete(dst, True)
    fs.rename(src, dst)
    return len(
        [f for f in spark.read.parquet(path).inputFiles()]
    )


def read_evolved(
    spark: SparkSession, *paths: str, merge_schema: bool = True
):
    """Read parquet written under evolving schemas (columns added over
    corpus versions): ``mergeSchema`` unions the footers' schemas and
    back-fills missing columns with NULL — append-only evolution
    without rewriting old data. Column renames/drops still require a
    rewrite (parquet has no rename metadata); keep additions
    append-only."""
    return (
        spark.read.option("mergeSchema", str(merge_schema).lower())
        .parquet(*paths)
    )


# --- Z-order clustering ---------------------------------------------


def zorder_key(
    cols: list[Column], mins: list[float], maxs: list[float], bits: int = 8
) -> Column:
    """Morton (Z-order) key over up to ~4 numeric columns: each value
    is uniform-bucketed to ``2^bits`` cells inside [min, max], then the
    cells' bits are interleaved (col 0 owns the most-significant bit of
    each group). Pure integer Column arithmetic — JVM codegen, no UDF.
    """
    d = len(cols)
    if not (len(mins) == len(maxs) == d):
        raise ValueError("cols/mins/maxs length mismatch")
    cells = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = (hi - lo) or 1.0
        cell = F.floor((c.cast("double") - F.lit(lo)) / F.lit(span) * (1 << bits))
        cells.append(
            F.least(F.greatest(cell, F.lit(0)), F.lit((1 << bits) - 1)).cast(
                "long"
            )
        )
    key = F.lit(0).cast("long")
    for j in range(bits):
        for i, cell in enumerate(cells):
            bit = F.shiftright(cell, j).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, j * d + (d - 1 - i)).cast("long")
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int = 16,
) -> list[tuple[float, float]]:
    """Write ``df`` range-partitioned and sorted by the Morton key of
    ``cols`` — multi-dimensional clustering so a selective filter on
    ANY of the columns touches few files (tight per-file min/max
    ranges let parquet row-group stats and file-level skipping prune).

    Column ranges come from one tiny min/max aggregate (a driver
    round-trip over d columns, not a global sort); the data path is
    repartitionByRange(zkey) + sortWithinPartitions — the same
    machinery as a global sort's first phase, one shuffle. Returns the
    (min, max) per column used for the bucketing, which a reader needs
    to recompute keys.
    """
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    ranges = [
        (stats[f"lo_{i}"], stats[f"hi_{i}"]) for i in range(len(cols))
    ]
    key = zorder_key(
        [F.col(c) for c in cols],
        [r[0] for r in ranges],
        [r[1] for r in ranges],
        bits=bits,
    )
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    return ranges


# --- Targeted delete (right-to-be-forgotten) ------------------------


def apply_deletes(
    spark: SparkSession,
    path: str,
    delete_keys: DataFrame,
    key_col: str,
) -> dict:
    """Delete every row whose ``key_col`` appears in ``delete_keys``,
    rewriting ONLY the files that contain a matching key.

    The GDPR/right-to-be-forgotten primitive every corpus store needs:
    at 100 TB a delete list of a few thousand ids must not trigger a
    full-table rewrite. Two passes, both pruned:

    1. *Locate*: scan ``(key, _metadata.file_path)`` — column-pruned to
       the key column — and broadcast-semi-join the delete list to get
       the distinct set of affected files (driver-sized: a file list,
       not rows).
    2. *Rewrite*: read only the affected files, broadcast-anti-join
       the delete list, and write the survivors into the dataset dir
       under a fresh ``part-del-*`` prefix; then drop the old affected
       files. Untouched files are never read or written.

    Readers see old-or-new per file (same non-transactional contract
    as compact_parquet's swap — a table format's commit log is the
    upgrade path, not a different rewrite strategy). Returns
    ``{"files_total", "files_rewritten", "rows_deleted"}``.
    """
    keys = delete_keys.select(F.col(key_col)).distinct()
    df = spark.read.parquet(path)
    affected = [
        r["__file"]
        for r in (
            df.select(
                F.col(key_col), F.col("_metadata.file_path").alias("__file")
            )
            .join(F.broadcast(keys), key_col, "left_semi")
            .select("__file")
            .distinct()
            .collect()
        )
    ]
    files_total = len(df.inputFiles())
    if not affected:
        return {
            "files_total": files_total,
            "files_rewritten": 0,
            "rows_deleted": 0,
        }
    sub = spark.read.parquet(*affected)
    kept = sub.join(F.broadcast(keys), key_col, "left_anti")
    n_before = sub.count()
    tmp = path.rstrip("/") + ".delete_tmp"
    kept.write.mode("overwrite").parquet(tmp)
    n_after = spark.read.parquet(tmp).count()

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    moved = 0
    for f in fs.listStatus(jvm.org.apache.hadoop.fs.Path(tmp)):
        name = f.getPath().getName()
        if not name.startswith("part-"):
            continue
        fs.rename(
            f.getPath(),
            jvm.org.apache.hadoop.fs.Path(
                path.rstrip("/") + f"/part-del-{moved:05d}-{name[5:]}"
            ),
        )
        moved += 1
    for old in affected:
        fs.delete(jvm.org.apache.hadoop.fs.Path(old), False)
    fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
    return {
        "files_total": files_total,
        "files_rewritten": len(affected),
        "rows_deleted": n_before - n_after,
    }


# --- File-stats skipping index (manifest-style pruning) -------------


def _canon_uri(f: str) -> str:
    """Spark spells the same file 'file:///x' in inputFiles() and
    'file:/x' in _metadata.file_path — collapse scheme slashes so the
    drift comparison sees one spelling."""
    if ":" not in f:
        return f
    scheme, rest = f.split(":", 1)
    return scheme + ":/" + rest.lstrip("/")


def write_stats_index(spark: SparkSession, path: str, cols: list[str]) -> str:
    """Build a per-file min/max/count stats table for ``cols`` — the
    manifest a table format (Iceberg/Delta) would maintain, computed
    here with one column-pruned scan keyed on ``_metadata.file_path``.
    Written next to the dataset (``<path>_stats``) so the dataset dir
    stays a plain parquet table. Pairs with write_zordered: clustering
    makes per-file ranges tight, the index makes them consultable
    WITHOUT opening any data file footer.

    At 100 TB the stats table is one row per file (~10⁵ rows for 128MB
    files) — a driver/broadcast-scale object that turns a selective
    range query into an O(matching-files) read instead of an
    O(all-footers) metadata storm.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    stats_path = path.rstrip("/") + "_stats"
    (
        spark.read.parquet(path)
        .select(
            F.col("_metadata.file_path").alias("file"),
            *[F.col(c) for c in cols],
        )
        .groupBy("file")
        .agg(*aggs)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(stats_path)
    )
    return stats_path


def read_with_skipping(
    spark: SparkSession,
    path: str,
    ranges: dict[str, tuple],
) -> DataFrame:
    """Read only the files whose stats interval intersects every
    ``col: (lo, hi)`` bound (None = unbounded), then re-apply the
    exact predicate as a residual filter — skipping is a superset
    optimization, the filter is the contract. Returns an empty,
    correctly-typed DataFrame when every file prunes away.

    Staleness guard: if the dataset's file list has drifted from the
    manifest (a rewrite — apply_deletes, compaction — without an index
    rebuild), pruning against the stale manifest could DROP rows from
    files the manifest never saw. On any drift the read falls back to
    the plain filtered scan (correct, just unpruned) — the same
    one-sided degradation contract as every sketch in this repo.
    """
    stats = spark.read.parquet(path.rstrip("/") + "_stats")
    indexed = {
        _canon_uri(r["file"]) for r in stats.select("file").collect()
    }
    current = {
        _canon_uri(f) for f in spark.read.parquet(path).inputFiles()
    }
    if indexed != current:
        out = spark.read.parquet(path)
        for c, (lo, hi) in ranges.items():
            if lo is not None:
                out = out.where(F.col(c) >= F.lit(lo))
            if hi is not None:
                out = out.where(F.col(c) <= F.lit(hi))
        return out
    cond = F.lit(True)
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            cond = cond & (F.col(f"max_{c}") >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(f"min_{c}") <= F.lit(hi))
    files = [r["file"] for r in stats.where(cond).select("file").collect()]
    base = spark.read.parquet(*files) if files else (
        spark.read.parquet(path).limit(0)
    )
    out = base
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            out = out.where(F.col(c) >= F.lit(lo))
        if hi is not None:
            out = out.where(F.col(c) <= F.lit(hi))
    return out


# --- Versioned snapshot publishing ----------------------------------


def publish_snapshot(df: DataFrame, base: str) -> int:
    """Publish ``df`` as the next immutable snapshot version of a
    serving dataset: write to a temp dir, rename into ``<base>/v=N``,
    then atomically flip the ``_LATEST`` pointer (write-temp + rename
    — the only atomic primitive object stores and HDFS share).

    Readers (read_latest_snapshot) always see a COMPLETE version:
    either the old pointer or the new one, never a half-written
    directory — the multi-file analogue of compact_parquet's swap, and
    the serving-layer pattern for the reference's "UI re-reads the
    whole table every 5s" loop (BASELINE.md: ClusterList template) at
    sizes where a half-visible write would corrupt a refresh. Old
    versions stay until pruned, so long-running readers finish their
    scan on the version they started with. Returns the new version."""
    spark = df.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    bpath = jvm.org.apache.hadoop.fs.Path(base)
    fs = bpath.getFileSystem(conf)
    fs.mkdirs(bpath)
    version = _latest_version(spark, base) + 1
    tmp = f"{base.rstrip('/')}/.v_tmp_{version}"
    df.write.mode("overwrite").parquet(tmp)
    final = jvm.org.apache.hadoop.fs.Path(f"{base.rstrip('/')}/v={version}")
    fs.delete(final, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), final)
    # pointer flip: temp file + rename (rename is atomic per-FS)
    ptr_tmp = jvm.org.apache.hadoop.fs.Path(
        f"{base.rstrip('/')}/._LATEST_tmp"
    )
    out = fs.create(ptr_tmp, True)
    out.write(str(version).encode("ascii"))
    out.close()
    ptr = jvm.org.apache.hadoop.fs.Path(f"{base.rstrip('/')}/_LATEST")
    fs.delete(ptr, False)
    fs.rename(ptr_tmp, ptr)
    return version


def _latest_version(spark: SparkSession, base: str) -> int:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    ptr = jvm.org.apache.hadoop.fs.Path(f"{base.rstrip('/')}/_LATEST")
    fs = ptr.getFileSystem(conf)
    if not fs.exists(ptr):
        return 0
    stream = fs.open(ptr)
    try:
        data = bytes(
            stream.readAllBytes()
        ) if hasattr(stream, "readAllBytes") else None
        if data is None:  # pragma: no cover - Hadoop version fallback
            buf = bytearray()
            b = stream.read()
            while b != -1:
                buf.append(b)
                b = stream.read()
            data = bytes(buf)
    finally:
        stream.close()
    return int(data.decode("ascii").strip() or 0)


def read_latest_snapshot(spark: SparkSession, base: str) -> DataFrame:
    """Read the version the ``_LATEST`` pointer names."""
    v = _latest_version(spark, base)
    if v == 0:
        raise FileNotFoundError(f"no published snapshot under {base}")
    return spark.read.parquet(f"{base.rstrip('/')}/v={v}")


def prune_snapshots(spark: SparkSession, base: str, keep: int = 2) -> int:
    """Delete all but the newest ``keep`` versions (the maintenance
    job; never deletes the pointed-to version). Returns deleted count.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    bpath = jvm.org.apache.hadoop.fs.Path(base)
    fs = bpath.getFileSystem(conf)
    latest = _latest_version(spark, base)
    versions = sorted(
        int(f.getPath().getName().split("=", 1)[1])
        for f in fs.listStatus(bpath)
        if f.getPath().getName().startswith("v=")
    )
    doomed = [v for v in versions[:-keep] if v != latest] if keep else []
    for v in doomed:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(f"{base.rstrip('/')}/v={v}"), True
        )
    return len(doomed)
