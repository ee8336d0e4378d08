#!/usr/bin/env python3
"""Run selected catalog queries against their DuckDB oracles.

Usage: python tools/check_query.py name [name ...] [--sf DIR]
Defaults to /root/testdata/sf0.001 for a fast inner loop.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from news_clustering_and_summarization_spark.plans import catalog  # noqa: E402
from news_clustering_and_summarization_spark.session import get_spark  # noqa: E402
from tools.full_correctness import run_sweep  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]
    names = args or list(catalog.QUERIES)
    keep_q = {n: catalog.QUERIES[n] for n in names}
    saved_q, saved_o = catalog.QUERIES, catalog.ORACLES
    catalog.QUERIES = keep_q
    spark = get_spark("check-query")
    try:
        _, bad = run_sweep(spark, sf)
    finally:
        catalog.QUERIES, catalog.ORACLES = saved_q, saved_o
        spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
