#!/usr/bin/env python3
"""LSH similarity-join scale probe (r09): the catalog's cluster_lsh
query PINS nbits=18 so its DuckDB oracle can replay it — at 100x data
a fixed bucket count is quadratic BY CONSTRUCTION (bucket occupancy
grows with N, the within-bucket join with N²). The production path is
signlsh_params, which re-sizes nbits with the corpus so expected
bucket load stays ~constant. This probe runs lsh_candidate_pairs with
AUTO-SIZED parameters over the inflated embeddings at sf0.1 / sf1 /
sf10 (50k / 500k / 5M vectors after the query's own 25x inflation)
and records wall, shuffle-write bytes, chosen (nbits, probe_radius),
candidate count and verified ε-pairs — the evidence that the flagship
similarity join's SCALE PATH is linear where the oracle-pinned
variant is not.

Usage: python tools/lsh_scale_probe.py [out_json]
  (expects /tmp/spark_graft_sf1 and /tmp/spark_graft_sf10 from
  tools/gen_scale_data.py; skips scales whose dir is missing)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from news_clustering_and_summarization_spark.operators import cluster as C  # noqa: E402
from news_clustering_and_summarization_spark.session import (  # noqa: E402
    auto_driver_mem,
    get_spark,
)
from news_clustering_and_summarization_spark.testing import inflate_vectors  # noqa: E402

EPS = 0.10
INFLATE = 25  # the cluster_lsh query's own inflation factor

SCALES = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/tmp/spark_graft_sf1"),
    ("sf10", "/tmp/spark_graft_sf10"),
]


def _shuffle_bytes(ui: str) -> int:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]
    return sum(
        st.get("shuffleWriteBytes", 0)
        for st in json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
        )
    )


def main() -> int:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "LSH_SCALE_PROBE.json")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    # the sf10 leg BROADCASTS a ~2.5 GB vector map (see
    # vec_broadcast_bytes below) — an 8g driver heap OOMs building
    # it; size from the largest present tier (r08 verdict item 7)
    os.environ.setdefault(
        "SPARK_DRIVER_MEM",
        auto_driver_mem("/tmp/spark_graft_sf10", cpus),
    )
    spark = get_spark(
        "lsh-scale-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
            # the sf10 broadcast build collects a ~2.7 GB vector
            # relation through task results — the 1g default
            # maxResultSize kills it (third distinct failure mode of
            # this leg; each one documented in SCALE.md)
            "spark.driver.maxResultSize": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"

    only = os.environ.get("LSH_PROBE_SCALES")
    scales = [
        s for s in SCALES if only is None or s[0] in only.split(",")
    ]
    results: dict[str, dict] = {}
    for label, sf_dir in scales:
        path = os.path.join(sf_dir, "embeddings.parquet")
        if not os.path.exists(path):
            print(f"{label}: missing {path}, skipped")
            continue
        emb = spark.read.parquet(path)
        n_base = emb.count()
        n_rows = n_base * INFLATE
        nbits, radius = C.signlsh_params(EPS, n_rows)
        tables = C.signlsh_tables(EPS, nbits, radius)
        inflated = (
            inflate_vectors(emb, INFLATE)
            .repartition(spark.sparkContext.defaultParallelism)
            .localCheckpoint(eager=True)
        )
        before = _shuffle_bytes(ui)
        t0 = time.time()
        pairs = C.lsh_candidate_pairs(
            inflated,
            inflated,
            EPS,
            id_col="vec_id",
            vec_col="embedding",
            nbits=nbits,
            probe_radius=radius,
            dim=64,
            n_rows=n_rows,
            symmetric=True,
            n_tables=tables,
            # memory-vs-disk knob (cluster.py vec_broadcast_bytes):
            # this box has 128 GB RAM and ~80 GB free disk — at 5M
            # vectors the verify's shuffle-carry attach needs ~60 GB
            # of disk (answer-volume-bound) while the broadcast map
            # is 2.5 GB of memory; the first sf10 probe run filled
            # the disk and died. 4 GiB gate = broadcast through sf10.
            vec_broadcast_bytes=4 << 30,
        )
        n_pairs = pairs.count()
        wall = time.time() - t0
        sb = _shuffle_bytes(ui) - before
        results[label] = {
            "n_vectors": n_rows,
            "nbits": nbits,
            "probe_radius": radius,
            "n_tables": tables,
            "wall_sec": round(wall, 2),
            "shuffle_mb": round(sb / 1e6, 2),
            "eps_pairs": n_pairs,
        }
        print(
            f"{label:6s} n={n_rows:>9,} nbits={nbits} r={radius} "
            f"L={tables} "
            f"{wall:7.2f}s shuffle={sb / 1e6:9.2f}MB pairs={n_pairs:,}",
            flush=True,
        )
    spark.stop()
    base = results.get("sf0.1")
    if base:
        for label, r in results.items():
            r["shuffle_ratio_vs_sf0.1"] = round(
                r["shuffle_mb"] / max(base["shuffle_mb"], 1e-9), 2
            )
            r["wall_ratio_vs_sf0.1"] = round(
                r["wall_sec"] / max(base["wall_sec"], 1e-9), 2
            )
    with open(out_path, "w") as f:
        json.dump(
            {"eps": EPS, "inflate": INFLATE, "cpus": cpus,
             "results": results},
            f,
            indent=1,
        )
    print(f"-> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
