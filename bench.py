#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ...}

Each query is executed to completion (count) after a warm-up of the
session; IO + compute are both measured, matching how the reference's
wall-clock envelope is defined (BASELINE.md interpretation note).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from news_clustering_and_summarization_spark.plans import catalog  # noqa: E402
from news_clustering_and_summarization_spark.session import get_spark  # noqa: E402

# Headline set: the flagship clustering pipeline + one representative
# per operator family (join/agg, window, dedup, ANN, text analysis).
BENCH_QUERIES = [
    "pipeline_e2e",        # preprocess -> embed UDF -> cluster (the reference dataflow)
    "cluster_serving",     # ε-graph components + serving view
    "pricing_summary",     # scan-heavy multi-agg
    "top_customers",       # broadcast join + top-k
    "running_total",       # window
    "sessionize",          # lag window + agg
    "dedup_minhash",       # shingle -> LSH -> verify
    "dedup_embedding",     # similarity self-join
    "cluster_lsh",         # sign-LSH ε-pairs on 50k vectors (> LSH_THRESHOLD)
    "ann_topk",            # brute-force top-k
    "quality_score",       # text heuristics
    "token_counts",        # token stats
    "lang_id",             # language ID
    "window_counts",       # event-time tumbling windows
    "bucketed_join",       # bucketed write + shuffle-free join
    "skew_join",           # salted hot-key join
    "sample_stratified",   # exact per-stratum sampling
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    # warm the JVM + parquet footers with a trivial action
    catalog.load(spark, sf_dir, "region").count()

    # warm the Python/Arrow UDF path too: daemon + worker spin-up and
    # first Arrow batch cost ~2-7s that otherwise lands entirely on
    # whichever UDF query runs first (pd imported at module level —
    # pandas_udf type-hint resolution requires it)
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(s: pd.Series) -> pd.Series:
        return s * 1.0

    spark.range(256).select(_warm(F.col("id").cast("double"))).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = catalog.QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
