#!/usr/bin/env python3
"""Scale rehearsal (r08 verdict item 1, widened to 100x in r09):
execute the most expensive catalog queries at sf0.1 AND at inflated
sets from tools/gen_scale_data.py (default: the 10x sf1 set; pass
more label=dir pairs for the 100x sf10 sweep), recording wall-clock
and total shuffle write bytes per query, and printing scaling ratios
vs the sf0.1 baseline.

A plan that is linear in the input should land near 10x in shuffle
bytes (or far below, for sketch/sufficient-statistics shapes whose
shuffles are domain-bounded) and <= ~10x wall on a box with spare
cores; anything super-linear gets a named cause in SCALE.md.

Shuffle bytes come from the Spark UI REST API (per-stage
shuffleWriteBytes summed over the app, sampled before/after each
query) — the same numbers the History Server shows, no listener
plumbing needed.

Usage:
  python tools/scale_rehearsal.py [sf1_dir] [out_json]
  python tools/scale_rehearsal.py --scales sf1=DIR1:10 sf10=DIR2:100 \
         [--out out.json] [--targets q1,q2,...]
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
from news_clustering_and_summarization_spark.session import (  # noqa: E402
    auto_driver_mem,
    get_spark,
)

# top-20 by cost (r08 verdict item 2: every heavy family needs
# empirical scaling data, not just the original 8)
TARGETS = [
    "cluster_lsh",          # production path (r09 split)
    "cluster_lsh_verify",   # + recall/zero-FP certificate legs
    "source_jaccard_kmv",
    "pagerank",
    "semdedup",
    "corpus_build",
    "bpe_merges",
    "dedup_minhash",
    "kmeans_assign",
    "setsim_join",          # AllPairs prefix filter
    "keyword_textrank",
    "dedup_components",     # CC contraction under growing components
    "golden_record",
    "record_linkage",
    "ctfidf_labels",
    "skew_join",
    "bucketed_join",
    "dbscan_full",          # cross-strategy: the quadratic regime, measured honestly
    "bpe_encode",
    "dsir_select",
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
    args = sys.argv[1:]
    targets = list(TARGETS)
    base_dir = "/root/testdata/sf0.1"
    if args and args[0] == "--scales":
        scales = []
        out_path = os.path.join(REPO, "SCALE_REHEARSAL.json")
        i = 1
        while i < len(args):
            if args[i] == "--out":
                out_path = args[i + 1]; i += 2
            elif args[i] == "--targets":
                targets = args[i + 1].split(","); i += 2
            elif args[i] == "--base":
                base_dir = args[i + 1]; i += 2
            else:
                label, rest = args[i].split("=", 1)
                d, factor = rest.rsplit(":", 1)
                scales.append((label, d, int(factor)))
                i += 1
    else:
        sf1 = args[0] if args else "/tmp/spark_graft_sf1"
        out_path = (
            args[1] if len(args) > 1
            else os.path.join(REPO, "SCALE_REHEARSAL.json")
        )
        scales = [("sf1", sf1, 10)]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    # size the driver heap from the LARGEST rehearsal tier
    # (session.auto_driver_mem; r08 verdict item 7 — the 8g default
    # OOMed at sf1 and nothing but the operator's memory said so)
    biggest = max(
        [base_dir] + [d for _label, d, _f in scales],
        key=lambda d: sum(
            os.path.getsize(os.path.join(r, f))
            for r, _ds, fs in os.walk(d)
            for f in fs
        ) if os.path.isdir(d) else 0,
    )
    os.environ.setdefault("SPARK_DRIVER_MEM", auto_driver_mem(biggest, cpus))
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
    # JIT/codegen warm at the small sf so no scale pays the
    # first-execution cost
    for name in targets:
        catalog.QUERIES[name](spark, "/root/testdata/sf0.01").count()
    points = [("sf0.1", base_dir)] + [
        (label, d) for label, d, _f in scales
    ]
    for sf_label, sf_dir in points:
        for name in targets:
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

    for label, _d, factor in scales:
        print(f"\n[{label} = {factor}x] "
              f"{'query':20s} {'wall x':>8s} {'shuffle x':>10s}")
        for name, r in results.items():
            if label not in r:
                continue
            a, b = r["sf0.1"], r[label]
            wx = b["wall_sec"] / max(a["wall_sec"], 1e-9)
            sx = b["shuffle_mb"] / max(a["shuffle_mb"], 1e-9)
            r[f"wall_ratio_{label}"] = round(wx, 2)
            r[f"shuffle_ratio_{label}"] = round(sx, 2)
            if label == "sf1":  # legacy keys kept for SCALE.md refs
                r["wall_ratio"] = round(wx, 2)
                r["shuffle_ratio"] = round(sx, 2)
            print(f"{name:20s} {wx:8.2f} {sx:10.2f}")
    with open(out_path, "w") as f:
        json.dump(
            {
                "factors": {label: f for label, _d, f in scales},
                "cpus": cpus,
                "results": results,
            },
            f,
            indent=1,
        )
    print(f"-> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
