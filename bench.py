#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ...}

Each query is executed to completion (count) after a warm-up of the
session; IO + compute are both measured, matching how the reference's
wall-clock envelope is defined (BASELINE.md interpretation note).

Each query runs $SPARK_GRAFT_BENCH_REPS times (default 3) and the
MEDIAN is recorded — round 3's apparent regression was pure box-load
noise (BENCH_r03 ran minutes after an 81-query correctness sweep), so
single-shot wall-times are not trustworthy evidence.  The 1-min load
average before and after the run is emitted as `load_before`/
`load_after` so a contaminated run is visible in the JSON itself.
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
from news_clustering_and_summarization_spark.session import (  # noqa: E402
    auto_driver_mem,
    get_spark,
)

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
    "cluster_lsh",         # sign-LSH ε-pairs, production path (candidates+verify)
    "cluster_lsh_verify",  # + recall/zero-FP certificates — the soak stays benched
    "cluster_ivf",         # IVF ε-pairs (r10): the scale-stable flagship index
    "cluster_ivf_index",   # on-disk ε-pair index lifecycle: build+append+read (r11)
    "ann_topk",            # brute-force top-k
    "quality_score",       # text heuristics
    "token_counts",        # token stats
    "lang_id",             # language ID
    "window_counts",       # event-time tumbling windows
    "bucketed_join",       # bucketed write + shuffle-free join
    "skew_join",           # salted hot-key join
    "sample_stratified",   # exact per-stratum sampling
    "dedup_bloom",         # Bloom-filter incremental corpus dedup (r4)
    "corpus_build",        # full preprocessing chain in one plan (r4)
    "constraint_check",    # one-scan declarative validation suite (r4)
    "heavy_hitters",       # count-min sketch build + certified top-k (r4)
    "kmeans_assign",       # iterative ML: 2x Lloyd over embeddings (r4)
    "hll_distinct",        # HLL register build + certified estimate (r4)
    "pagerank",            # 3 fixed-point power iterations (r4)
    "bpe_merges",          # 3 vocab-bounded merge iterations (r4)
    "lm_perplexity",       # bigram LM train + broadcast-join scoring (r4)
    "semdedup",            # k-means-partitioned semantic dedup (r4)
    "winnow_candidates",   # MOSS winnowing fingerprint matching (r4)
    "dsir_select",         # hashed-bigram importance resampling (r4)
    "span_corruption",     # T5 denoising pair generation (r4)
    "record_linkage",      # blocked Fellegi-Sunter entity resolution (r4)
    "bpe_encode",          # BPE train + zero-shuffle corpus encode (r6)
    "keyword_textrank",    # TextRank keywords via fixed-point pagerank (r6)
    "source_jaccard_kmv",  # corpus-pair overlap, KMV sketches (r7; exact variant kept for audits)
    "attribution",         # carry-forward last-touch window per user (r6)
    "weighted_median",     # per-group cumulative-weight window (r6)
]


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2.0


def _mem_bw_gbps() -> float:
    """Single-thread streaming-read bandwidth probe (GB/s). The r11
    session-2 box showed host-level memory-bandwidth throttling (7.7
    -> 0.3 GB/s at unchanged CPU clock) that inflated memory-heavy
    queries 2-10x while CPU-bound work was unaffected — like
    load_before/after, this marker makes a contaminated run visible
    in the recorded payload itself."""
    import numpy as np

    buf = np.ones(50_000_000)  # 400 MB
    t0 = time.time()
    buf.sum()
    return round(0.4 / max(time.time() - t0, 1e-9), 2)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    load_before = round(os.getloadavg()[0], 2)
    bw_before = _mem_bw_gbps()
    # size the driver heap from the input tier (session.auto_driver_mem;
    # r08 verdict item 7) — pointing SPARK_GRAFT_SF_DIR at an inflated
    # set must not require remembering SPARK_DRIVER_MEM by hand
    os.environ.setdefault(
        "SPARK_DRIVER_MEM", auto_driver_mem(sf_dir, cpus)
    )
    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        # the driver parses the FINAL stdout line as JSON; the console
        # progress bar's carriage-return redraws were corrupting it
        # (BENCH_r04 "parsed": null — round-4 verdict item 7)
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM + parquet footers with a trivial action
    catalog.load(spark, sf_dir, "region").count()

    # warm the Python/Arrow UDF path too: daemon + worker spin-up and
    # first Arrow batch cost ~2-7s that otherwise lands entirely on
    # whichever UDF query runs first (pd imported at module level —
    # pandas_udf type-hint resolution requires it).
    # r11 measurement-bug fix (declared in OPTIMIZATION_r11.md): the
    # old `.select(_warm(...)).count()` let Catalyst PRUNE the UDF
    # column — count() needs no columns, so no Python worker was ever
    # spawned and the "warmup" was a no-op (verified by process
    # inspection: zero pyspark.daemon children after the job). The
    # noop sink computes every column (guide §1.4), so this now
    # actually spins up one worker per core before the discarded
    # rep -1 sweep. Timed queries and their action are unchanged.
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(s: pd.Series) -> pd.Series:
        return s * 1.0

    (
        spark.range(256 * cpus, numPartitions=cpus)
        .select(_warm(F.col("id").cast("double")).alias("x"))
        .write.format("noop").mode("overwrite").save()
    )

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    warmup: dict[str, float] = {}
    # Round-robin across reps (q1 q2 ... qN, q1 q2 ...) rather than
    # back-to-back per query, so a transient load spike degrades one
    # rep of many queries instead of every rep of one query — the
    # median then discards it everywhere. Rep -1 is a DISCARDED
    # warmup sweep: first-execution JIT/codegen-cache cost (2-6s on
    # the heavy queries) otherwise pollutes the recorded medians
    # (r07 verdict item 2); it is kept separately as warmup_runs so
    # the JIT cost stays visible without skewing the statistics.
    for rep in range(-1, reps):
        for name in BENCH_QUERIES:
            fn = catalog.QUERIES[name]
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = time.time() - t0
            if rep < 0:
                warmup[name] = dt
            else:
                runs.setdefault(name, []).append(dt)
    for name, xs in runs.items():
        timings[name] = round(_median(xs), 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    load_after = round(os.getloadavg()[0], 2)
    full_payload = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "reps": reps,
            "agg": "median",
            "load_before": load_before,
            "load_after": load_after,
            "mem_bw_before": bw_before,
            "mem_bw_after": _mem_bw_gbps(),
            "all_runs": {
                k: [round(x, 3) for x in v] for k, v in runs.items()
            },
            "warmup_runs": {k: round(v, 3) for k, v in warmup.items()},
        }
    )
    # The driver keeps only the LAST 2000 chars of stdout (BENCH_r04/
    # r05 both truncated mid-JSON) — print a compact line (2dp query
    # medians, no all_runs/load markers) and keep the full payload in
    # BENCH_LOCAL.json.
    compact = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in timings.items()},
            "sf": sf,
        },
        separators=(",", ":"),
    )
    # Stop Spark BEFORE emitting the result so JVM shutdown chatter
    # cannot land after the JSON; quiesce stderr, then print the JSON
    # alone on a fresh line (the driver parses the final stdout line).
    spark.stop()
    sys.stderr.flush()
    with open(os.path.join(REPO, "BENCH_LOCAL.json"), "w") as f:
        f.write(full_payload + "\n")
    sys.stdout.write("\n" + compact + "\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
