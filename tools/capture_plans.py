#!/usr/bin/env python3
"""Capture .explain("formatted") for bench (or named) queries into
plans/r11/<query>_<tag>.txt — the optimization round's evidence that
plan-shape claims (Exchange counts, join strategies, PushedFilters)
match the committed code.

Usage: python tools/capture_plans.py TAG [name ...]
  TAG is 'before' or 'after'; default query set = bench.BENCH_QUERIES.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from news_clustering_and_summarization_spark.plans import catalog  # noqa: E402
from news_clustering_and_summarization_spark.session import get_spark  # noqa: E402


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        from bench import BENCH_QUERIES

        names = list(BENCH_QUERIES)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = catalog.QUERIES[name]
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 - record, keep sweeping
            plan = f"EXPLAIN FAILED: {exc!r}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: exchanges={n_ex} len={len(plan)}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
