#!/usr/bin/env python3
"""Scale rehearsal (r08 verdict item 1): execute the most expensive
catalog queries at sf0.1 AND at the 10x inflated sf1 set
(tools/gen_scale_data.py), recording wall-clock and total shuffle
write bytes per query, and print the sf0.1 -> sf1 scaling ratios.

A plan that is linear in the input should land near 10x in shuffle
bytes (or far below, for sketch/sufficient-statistics shapes whose
shuffles are domain-bounded) and <= ~10x wall on a box with spare
cores; anything super-linear gets a named cause in SCALE.md.

Shuffle bytes come from the Spark UI REST API (per-stage
shuffleWriteBytes summed over the app, sampled before/after each
query) — the same numbers the History Server shows, no listener
plumbing needed.

Usage: python tools/scale_rehearsal.py [sf1_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from news_clustering_and_summarization_spark.plans import catalog  # noqa: E402
from news_clustering_and_summarization_spark.session import get_spark  # noqa: E402

TARGETS = [
    "cluster_lsh",
    "source_jaccard_kmv",
    "pagerank",
    "semdedup",
    "corpus_build",
    "bpe_merges",
    "dedup_minhash",
    "kmeans_assign",
]


def _shuffle_bytes(ui: str) -> int:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]
    total = 0
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    for st in stages:
        total += st.get("shuffleWriteBytes", 0)
    return total


def main() -> int:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    out_path = (
        sys.argv[2] if len(sys.argv) > 2
        else os.path.join(REPO, "SCALE_REHEARSAL.json")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        "scale-rehearsal",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # the shared session default disables the UI; the REST
            # stage metrics need it up for this tool only
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"

    results: dict[str, dict] = {}
    # JIT/codegen warm at the small sf so neither scale pays the
    # first-execution cost
    for name in TARGETS:
        catalog.QUERIES[name](spark, "/root/testdata/sf0.01").count()
    for sf_label, sf_dir in [("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1)]:
        for name in TARGETS:
            before = _shuffle_bytes(ui)
            t0 = time.time()
            n = catalog.QUERIES[name](spark, sf_dir).count()
            wall = time.time() - t0
            sb = _shuffle_bytes(ui) - before
            results.setdefault(name, {})[sf_label] = {
                "wall_sec": round(wall, 2),
                "shuffle_mb": round(sb / 1e6, 2),
                "rows": n,
            }
            print(
                f"{sf_label:6s} {name:20s} {wall:7.2f}s "
                f"shuffle={sb/1e6:9.2f}MB rows={n}",
                flush=True,
            )
    spark.stop()

    print(f"\n{'query':20s} {'wall x':>8s} {'shuffle x':>10s}")
    for name, r in results.items():
        a, b = r["sf0.1"], r["sf1"]
        wx = b["wall_sec"] / max(a["wall_sec"], 1e-9)
        sx = b["shuffle_mb"] / max(a["shuffle_mb"], 1e-9)
        r["wall_ratio"] = round(wx, 2)
        r["shuffle_ratio"] = round(sx, 2)
        print(f"{name:20s} {wx:8.2f} {sx:10.2f}")
    with open(out_path, "w") as f:
        json.dump(
            {"factor": 10, "cpus": cpus, "results": results}, f, indent=1
        )
    print(f"-> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
