#!/usr/bin/env python3
"""IVF ε-pair index scale probe (r09 verdict item 1 'done' evidence):
runs operators/cluster.ivf_epsilon_pairs over the SAME corpus as
tools/lsh_scale_probe.py (25x-inflated embeddings at sf0.1 / sf1 /
sf10 = 50k / 500k / 5M vectors, eps=0.10) and records wall,
shuffle-write bytes, verified ε-pairs, and SAMPLED RECALL vs a
brute-forced 2% subset.

What the numbers must show vs LSH_SCALE_PROBE.json:
- recall holds with NO growing knob (sign-LSH needed tables L=2→3→8
  across the two decades and is capped at 8 — cluster.py:230 'past
  ~8 the honest answer is a different index'; this is that index:
  probe depths nprobe AND cprobe stay FIXED at every scale because
  cells shrink only like k^(-1/dim)),
- shuffle grows ~linearly in answer+data (the route shuffle carries
  fan-out x corpus vectors; the kernel emits only verified pairs),
- WALL tracks the shuffle ratio (r10 verdict item 1: one-level
  routing was n·k·dim total FLOPs with k ∝ n — the r10 probe showed
  the quadratic term as wall x72 at data x100 while shuffle stayed
  exactly linear; two-level routing is (1+cprobe)·√k·dim per point,
  so the CPU axis must now scale like the shuffle axis does).

Usage: python tools/ivf_scale_probe.py [out_json]
  (expects /tmp/spark_graft_sf1 and /tmp/spark_graft_sf10 from
  tools/gen_scale_data.py; skips scales whose dir is missing;
  IVF_PROBE_SCALES=sf0.1,sf1 limits the run)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from news_clustering_and_summarization_spark.functions import hashing as H  # noqa: E402
from news_clustering_and_summarization_spark.operators import cluster as C  # noqa: E402
from news_clustering_and_summarization_spark.session import get_spark  # noqa: E402
from news_clustering_and_summarization_spark.testing import inflate_vectors  # noqa: E402

EPS = 0.10
INFLATE = 25  # lsh_scale_probe's factor — identical corpus, comparable answers
SAMPLE_MOD = 512  # cells of ~512 expected members at every scale
NPROBE = 8  # FIXED across scales — the no-growing-knob claim
CPROBE = int(os.environ.get("IVF_PROBE_CPROBE", "16"))  # coarse-group probe depth (two-level routing) — FIXED across scales
RECALL_MOD = 50  # ~2% node sample for the brute-force recall floor

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
        else os.path.join(REPO, "IVF_SCALE_PROBE.json")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    # 24g, NOT auto_driver_mem's 48g: the IVF route broadcast is ~5 MB
    # (codebook), so unlike the LSH probe there is no multi-GB
    # broadcast to build — a 48g heap OOM-killed the first sf10 run.
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    only = os.environ.get("IVF_PROBE_SCALES")
    scales = [
        s for s in SCALES if only is None or s[0] in only.split(",")
    ]
    results: dict[str, dict] = {}
    for label, sf_dir in scales:
        path = os.path.join(sf_dir, "embeddings.parquet")
        if not os.path.exists(path):
            print(f"{label}: missing {path}, skipped")
            continue
        # ONE SESSION PER TIER: long-lived reused python workers
        # accumulate allocator fragmentation across tiers (the second
        # sf10 OOM showed ~12 workers at 5.5 GB after the sf0.1+sf1
        # legs; a fresh-session sf10 run stays at ~0.5 GB/worker) —
        # stopping the session retires the worker pool between tiers
        spark = get_spark(
            f"ivf-scale-probe-{label}",
            master=f"local[{cpus}]",
            shuffle_partitions=cpus,
            extra_conf={
                "spark.ui.showConsoleProgress": "false",
                "spark.ui.enabled": "true",
                # the sf10 recall leg broadcasts a ~100k-vector sample
                # (51 MB) and brute_force_pairs collects it through
                # task results — headroom over the 1g default
                "spark.driver.maxResultSize": "8g",
            },
        )
        spark.sparkContext.setLogLevel("ERROR")
        ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"
        # JIT/codegen/worker-spawn warm-up inside THIS session so the
        # per-tier isolation doesn't bill ~50s of cold-start to the
        # first measured wall (the lsh probe ran one warm session;
        # same methodology, now per tier)
        warm = inflate_vectors(
            spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
            INFLATE,
        ).localCheckpoint(eager=True)
        C.ivf_epsilon_pairs(
            warm, EPS, id_col="vec_id", vec_col="embedding",
            sample_mod=SAMPLE_MOD, nprobe=NPROBE, cprobe=CPROBE,
            both_directions=False,
        ).count()
        emb = spark.read.parquet(path)
        n_rows = emb.count() * INFLATE
        inflated = (
            inflate_vectors(emb, INFLATE)
            .repartition(spark.sparkContext.defaultParallelism)
            .localCheckpoint(eager=True)
        )
        before = _shuffle_bytes(ui)
        t0 = time.time()
        # canonical half only (l < r): the mirrored union would both
        # double the materialized set and re-run the verify kernel
        # per branch — the first sf10 attempt OOMed exactly there
        pairs = C.ivf_epsilon_pairs(
            inflated,
            EPS,
            id_col="vec_id",
            vec_col="embedding",
            sample_mod=SAMPLE_MOD,
            nprobe=NPROBE,
            cprobe=CPROBE,
            both_directions=False,
        ).localCheckpoint(eager=True)
        n_pairs = 2 * pairs.count()  # both-directions count, same basis as LSH probe
        wall = time.time() - t0
        sb = _shuffle_bytes(ui) - before
        # sampled recall vs brute force on a ~2% node subset
        sample = inflated.where(
            H.hash64(F.col("vec_id").cast("string")) % RECALL_MOD == 0
        )
        exact = C.brute_force_pairs(
            sample, sample, EPS, id_col="vec_id", vec_col="embedding",
            upper_only=True, with_dist=False,
        ).localCheckpoint(eager=True)
        n_exact = exact.count()
        n_hits = exact.join(
            pairs.select("l_id", "r_id"), ["l_id", "r_id"], "left_semi"
        ).count()
        recall = round(n_hits / n_exact, 4) if n_exact else 1.0
        results[label] = {
            "n_vectors": n_rows,
            "sample_mod": SAMPLE_MOD,
            "nprobe": NPROBE,
            "cprobe": CPROBE,
            "wall_sec": round(wall, 2),
            "shuffle_mb": round(sb / 1e6, 2),
            "eps_pairs": n_pairs,
            "sampled_recall": recall,
            "n_sample_pairs": n_exact,
        }
        print(
            f"{label:6s} n={n_rows:>9,} nprobe={NPROBE} "
            f"{wall:7.2f}s shuffle={sb / 1e6:9.2f}MB pairs={n_pairs:,} "
            f"recall={recall} ({n_hits}/{n_exact})",
            flush=True,
        )
        spark.stop()
    base = results.get("sf0.1")
    if base:
        for r in results.values():
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
