#!/usr/bin/env python3
"""Time individual catalog queries in isolation (guide §1.4): one
warm-up execution, then N reps of the chosen action, reporting every
rep + median. Defaults to the bench's own action (.count()) so the
numbers line up with bench.py; --noop uses the noop sink to force
every column of every row.

Usage: python tools/time_query.py name [name ...] [--reps N] [--noop]
       [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from news_clustering_and_summarization_spark.plans import catalog  # noqa: E402
from news_clustering_and_summarization_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    reps = 3
    noop = False
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    if "--noop" in args:
        noop = True
        args.remove("--noop")
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]
    names = args
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    from news_clustering_and_summarization_spark.session import auto_driver_mem

    # same driver-heap sizing as bench.py, or GC pressure skews A/Bs
    os.environ.setdefault("SPARK_DRIVER_MEM", auto_driver_mem(sf, cpus))
    spark = get_spark(
        "time-query",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py: parquet footers + Arrow/Python workers
    catalog.load(spark, sf, "region").count()
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(s):
        return s * 1.0

    spark.range(256).select(_warm(F.col("id").cast("double"))).count()

    def run(name: str) -> None:
        fn = catalog.QUERIES[name]

        def action():
            # t0 BEFORE fn(): plan construction includes eager work
            # (localCheckpoint(eager=True), index writes, codebook
            # collects) that bench.py's timing also includes
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            df = fn(spark, sf)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            return time.time() - t0

        warm = action()
        xs = sorted(action() for _ in range(reps))
        med = xs[len(xs) // 2] if reps % 2 else (
            xs[reps // 2 - 1] + xs[reps // 2]
        ) / 2
        print(
            f"{name}: median={med:.3f} warm={warm:.3f} "
            f"runs={[round(x, 3) for x in xs]}",
            flush=True,
        )

    for name in names:
        run(name)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
