#!/usr/bin/env python3
"""Resume an interrupted full_correctness sweep: load the partial
JSON, run only the catalog queries without a row yet, merge, and
clear the partial flag when the catalog is covered.

Usage: python tools/resume_sweep.py SF_DIR OUT_JSON [--oracle-timeout S]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from news_clustering_and_summarization_spark.plans import catalog  # noqa: E402
from news_clustering_and_summarization_spark.session import get_spark  # noqa: E402
from tools.full_correctness import run_sweep  # noqa: E402


def main() -> int:
    args = list(sys.argv[1:])
    oracle_timeout = None
    if "--oracle-timeout" in args:
        i = args.index("--oracle-timeout")
        oracle_timeout = float(args[i + 1])
        del args[i: i + 2]
    sf, out_path = args[0], args[1]
    done: dict = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            done = json.load(f).get("results", {})
    # A flush checkpoint from a previously interrupted *resume* run
    # holds rows the main artifact doesn't — merge it in so they are
    # not re-run (advice r10: the flush was written but never read).
    if os.path.exists(out_path + ".resume"):
        with open(out_path + ".resume") as f:
            done.update(json.load(f).get("results", {}))

    def _is_failed(r: dict) -> bool:
        return bool(
            r.get("err")
            or r.get("rows_match") is False
            or r.get("hash_match") is False
        )

    # Re-run failures, not just missing rows: a row stamped FAILED by
    # a run that predates a fix must not survive into the final
    # artifact (advice r10: stale embedding_outliers fail at sf1).
    retry = sorted(n for n, r in done.items() if _is_failed(r))
    for n in retry:
        del done[n]
    todo = {n: q for n, q in catalog.QUERIES.items() if n not in done}
    print(
        f"resume: {len(done)} done, {len(todo)} to run"
        + (f" (retrying {len(retry)} failed: {retry})" if retry else "")
    )
    # Persist the merged seed NOW: run_sweep's flush file only holds
    # rows from THIS run, so rows salvaged from an older .resume
    # checkpoint would live solely in memory until the final write —
    # an interrupt would lose them. Stamp partial:true so a seed is
    # never mistaken for a completed sweep.
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf, "results": done, "partial": True}, f, indent=1)
    saved = catalog.QUERIES
    catalog.QUERIES = todo
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        "resume-sweep", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        flush = out_path + ".resume"
        results, bad = run_sweep(
            spark, sf, oracle_timeout=oracle_timeout, flush_path=flush
        )
    finally:
        catalog.QUERIES = saved
        spark.stop()
    done.update(results)
    payload = {"sf_dir": sf, "results": done}
    missing = [n for n in catalog.QUERIES if n not in done]
    if missing:
        payload["partial"] = True
        payload["missing"] = missing
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    if os.path.exists(out_path + ".resume"):
        os.remove(out_path + ".resume")
    n_to = sum(1 for r in done.values() if r.get("oracle_timeout"))
    n_bad = sum(
        1 for r in done.values()
        if r.get("err") or r.get("rows_match") is False
        or r.get("hash_match") is False
    )
    print(
        f"total {len(done)}/{len(catalog.QUERIES)}: "
        f"{len(done) - n_bad - n_to} green, {n_to} oracle-timeout, "
        f"{n_bad} fail -> {out_path}"
    )
    return 1 if n_bad else (2 if n_to else 0)


if __name__ == "__main__":
    sys.exit(main())
