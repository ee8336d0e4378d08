"""SparkSession factory.

Local-mode defaults follow the task environment (single JVM,
``local[N]`` threads). Settings that matter for oracle parity:
UTC session timezone (DuckDB timestamps are UTC-naive) and Arrow
execution for pandas UDFs. AQE is on so that at real cluster scale
the same code path gets runtime shuffle coalescing / skew-join
handling for free.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def auto_driver_mem(data_dir: str | None, cpus: int) -> str:
    """Driver-heap sizing for the single-JVM local harness, from the
    input tier instead of the operator's memory (r08 verdict item 7:
    the 8g default OOMs at the 10x rehearsal tier — SCALE.md's
    memory-per-core lesson says >= 1.5 GB/core above sf0.1).

    An explicit ``SPARK_DRIVER_MEM`` always wins. Otherwise: inputs
    up to ~100 MB of parquet keep the 8g default; anything larger
    gets 1.5 GB/core, floored at 8 GB (small-core boxes) — local
    executors share the driver JVM, so the bound scales with
    parallelism, not data."""
    explicit = os.environ.get("SPARK_DRIVER_MEM")
    if explicit:
        return explicit
    size = 0
    if data_dir and os.path.isdir(data_dir):
        for root, _dirs, files in os.walk(data_dir):
            size += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if not f.startswith((".", "_"))
            )
    if size <= 100 * 1024 * 1024:
        return "8g"
    # Clamp to a fraction of physical RAM: 1.5 GB/core on a many-core
    # box with modest memory (32 cores / 32 GB) would request a 48g
    # heap the JVM can't start (r09 advisor finding). 70% of detected
    # RAM leaves room for Python workers + page cache; the 8 GB floor
    # still wins on small boxes because a floor above RAM is the
    # pre-existing explicit-knob territory (SPARK_DRIVER_MEM).
    want = int(1.5 * cpus)
    total_gb = _physical_ram_gb()
    if total_gb:
        want = min(want, max(4, int(0.7 * total_gb)))
    return f"{max(8, want)}g"


def _physical_ram_gb() -> int | None:
    """Total physical RAM in GiB (Linux /proc/meminfo), None if unknown."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return int(line.split()[1]) // (1024 * 1024)
    except OSError:
        pass
    return None


def local_df(spark: SparkSession, rows, schema: str):
    """Driver-local rows -> DataFrame via the Arrow/pandas path.

    ``createDataFrame(list)`` builds a pickled Python RDD with
    defaultParallelism partitions, and EVERY downstream action then
    pays a Python-worker round trip per partition (~0.1s each at
    local[32] — measured 3-4s per action in r11, with ``coalesce(1)``
    serializing all of them into one task). Routing through a pandas
    DataFrame keeps the rows in the JVM as one Arrow-backed local
    relation: one conversion at build time, zero Python workers at
    action time. Use only for simple schemas (ints / floats /
    strings / arrays thereof) with no None in numeric columns — the
    pandas path would coerce those to NaN."""
    import pandas as pd
    from pyspark.sql.types import _parse_datatype_string

    parsed = _parse_datatype_string(schema)
    names = [f.name for f in parsed.fields]
    pdf = pd.DataFrame.from_records(list(rows), columns=names)
    return spark.createDataFrame(pdf, schema=parsed)


def get_spark(
    app_name: str = "news_clustering_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    # The preloading worker daemon (worker_daemon.py) must be
    # importable by the bare `python -m` the JVM spawns — put this
    # package's parent on PYTHONPATH before the gateway starts, so
    # neither the daemon nor cloudpickle's import-by-reference of UDF
    # modules depends on the driver's cwd.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    py_path = os.environ.get("PYTHONPATH", "")
    if repo_root not in py_path.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + py_path if py_path else "")
        )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # managed-table location (bucketed tables, sources/tables.py);
        # keep it out of the repo tree and per-process — concurrent
        # drivers (pytest + bench on one box) must not race on the
        # same table locations
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE",
                f"/tmp/news_clustering_warehouse_{os.getpid()}",
            ),
        )
    )
    # fork workers from a daemon that has numpy/pandas/pyarrow already
    # imported (worker_daemon.py): new workers inherit the stack via
    # fork COW instead of each paying the full import (guide §4.5 —
    # heavyweight init once per daemon, not per worker; measured as
    # the dominant worker-side cost in r11). Guarded to local masters
    # (r11 advice): on a real cluster the executor Pythons may not be
    # able to import this package (driver PYTHONPATH does not
    # propagate), and a missing daemon module fails EVERY worker —
    # remote deployments get the stock daemon unless the operator
    # opts in via SPARK_GRAFT_PY_DAEMON (set it to "pyspark.daemon"
    # to disable the preload even locally — the fork-hang rollback).
    daemon_mod = os.environ.get("SPARK_GRAFT_PY_DAEMON")
    if daemon_mod is None and master.startswith("local"):
        daemon_mod = "news_clustering_and_summarization_spark.worker_daemon"
    if daemon_mod:
        builder = builder.config("spark.python.daemon.module", daemon_mod)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def enable_runtime_filters(
    spark: SparkSession, force_for_small_scans: bool = False
) -> None:
    """Turn on Spark's runtime Bloom-filter join pruning: a selective
    filter on one join side builds a bloom filter that is pushed into
    the other side's scan, cutting shuffle input before the join — at
    100 TB this is the difference between shuffling the whole fact
    table and shuffling the ~matching slice.

    Defaults only engage when the application side scans >= 10 GB
    (`...applicationSideScanSizeThreshold`), i.e. exactly the regime
    this engine targets; ``force_for_small_scans`` zeroes the
    threshold so local tests can observe the injected
    ``bloom_filter_agg`` / ``might_contain`` operators.
    """
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    if force_for_small_scans:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
