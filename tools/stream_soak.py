#!/usr/bin/env python3
"""Streaming soak at scale (r09 verdict item 3): all prior scale
evidence is batch-side; this drives the two stateful streaming
families over sf1-derived corpora for >= 50 real micro-batches each
and records the per-batch trajectories that prove state stays
bounded.

Soak A — ClusteringPipeline (the reference's own job): 50 x 1000
embedded articles through the count-triggered foreachBatch
(incremental ε-graph clustering + serving-table merges + summarize
gate). The corpus is family-structured (25 near-copies per base
vector) and HASH-SHUFFLED so family members arrive spread across
batches — the worst case for incremental merging. The invariant
under test is centroid collapse: each family folds into ONE pool
row, so the pool must stay O(#families + recent singletons), NOT
O(rows ingested); per-batch wall must not trend with total rows.

Soak B — MinhashDedupStream: 50 x 1000 sf1 documents through the
epoch-state near-dup stream, compact() every 10 batches (crash-safe
folding under live load). State (bands/shingles) must grow linearly
in DOCS SEEN (it is the index, linear by design) while wall stays
~flat per batch; pairs grow with the true answer. Ends with the
stream==batch equality check: detect() must equal batch
minhash_near_duplicates over the union of everything streamed.

Usage: python tools/stream_soak.py [out_json]
  (expects /tmp/spark_graft_sf1 from tools/gen_scale_data.py;
  SOAK_BATCHES / SOAK_BATCH_ROWS override the 50 x 1000 default)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from news_clustering_and_summarization_spark.functions import hashing as H  # noqa: E402
from news_clustering_and_summarization_spark.session import get_spark  # noqa: E402
from news_clustering_and_summarization_spark.streaming.dedup import (  # noqa: E402
    MinhashDedupStream,
)
from news_clustering_and_summarization_spark.streaming.pipeline import (  # noqa: E402
    ClusteringPipeline,
)
from news_clustering_and_summarization_spark.testing import inflate_vectors  # noqa: E402

SF1 = "/tmp/spark_graft_sf1"
N_BATCHES = int(os.environ.get("SOAK_BATCHES", "50"))
BATCH_ROWS = int(os.environ.get("SOAK_BATCH_ROWS", "1000"))
WORK = "/tmp/spark_graft_stream_soak"


def _rows(spark, path: str) -> int:
    if not os.path.exists(path):
        return 0
    try:
        return spark.read.parquet(path).count()
    except Exception:
        return 0



def _emit_file(spark, pdf_chunk, schema, src: str, name: str) -> None:
    """Write one micro-batch as a SINGLE parquet file directly in the
    stream source dir (the file source does not recurse into nested
    batch directories): write to a scratch dir, move the part file."""
    import glob

    scratch = os.path.join(WORK, "_scratch")
    shutil.rmtree(scratch, ignore_errors=True)
    sdf = spark.createDataFrame(pdf_chunk, schema=schema)
    sdf.coalesce(1).write.mode("overwrite").parquet(scratch)
    part = glob.glob(os.path.join(scratch, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(src, name))


def soak_clustering(spark) -> dict:
    src = os.path.join(WORK, "articles_src")
    state = os.path.join(WORK, "cluster_state")
    ckpt = os.path.join(WORK, "cluster_ckpt")
    total = N_BATCHES * BATCH_ROWS
    n_base = total // 25
    emb = (
        spark.read.parquet(os.path.join(SF1, "embeddings.parquet"))
        .orderBy("vec_id")
        .limit(n_base)
    )
    corpus = (
        inflate_vectors(emb, 25)
        .select(
            F.concat(F.lit("a"), F.col("vec_id").cast("string")).alias("id"),
            F.concat(F.lit("title "), F.col("vec_id").cast("string")).alias(
                "title"
            ),
            F.lit("summary").alias("summary"),
            F.lit("body text").alias("text"),
            F.lit("2024-01-01").alias("publication_date"),
            F.array(F.col("embedding").cast("array<float>")).alias(
                "concat_embedding"
            ),
            # hash-shuffled arrival: family members land in different
            # micro-batches — incremental merging, not same-batch CC
            H.hash64(F.col("vec_id").cast("string")).alias("_ord"),
        )
        .orderBy("_ord")
        .drop("_ord")
        .localCheckpoint(eager=True)
    )
    pipe = ClusteringPipeline(
        spark, state, batch_size=BATCH_ROWS, embed_dim=64
    )
    os.makedirs(src, exist_ok=True)
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream.writeStream.foreachBatch(pipe.process_batch).option(
        "checkpointLocation", ckpt
    ).outputMode("update").start()

    pdf = corpus.toPandas()
    batches = []
    seen = 0
    for b in range(N_BATCHES):
        chunk = pdf.iloc[b * BATCH_ROWS: (b + 1) * BATCH_ROWS]
        if chunk.empty:
            break
        _emit_file(spark, chunk, corpus.schema, src, f"b{b:04d}.parquet")
        t0 = time.time()
        q.processAllAvailable()
        wall = time.time() - t0
        seen += len(chunk)
        row = {
            "batch": b,
            "rows_seen": seen,
            "wall_sec": round(wall, 2),
            "pool_rows": _rows(spark, pipe.pool_path),
            "clusters_rows": _rows(spark, pipe.clusters_path),
            "articles_rows": _rows(spark, pipe.articles_path),
            "pending_rows": _rows(spark, pipe.pending_path),
        }
        # SOAK_COMPACT_EVERY=N runs the r11 pool-maintenance sweep
        # mid-stream (ClusteringPipeline.compact_pool): above
        # LSH_THRESHOLD the approximate join accumulates permanent
        # split clusters, so a periodic sweep is the production
        # posture — the trajectory then shows the pool RE-PINNING at
        # the family count under live load, not just post-hoc
        compact_every = int(os.environ.get("SOAK_COMPACT_EVERY", "0"))
        if compact_every and (b + 1) % compact_every == 0:
            row["compaction"] = pipe.compact_pool()
            row["pool_rows_after_compact"] = row["compaction"]["pool_after"]
        batches.append(row)
        if b % 10 == 0 or b == N_BATCHES - 1:
            print(
                f"cluster b{b:03d} seen={seen:>7,} wall={wall:6.2f}s "
                f"pool={row['pool_rows']:,} "
                f"clusters={row['clusters_rows']:,}",
                flush=True,
            )
    q.stop()
    pool_final = batches[-1]["pool_rows"]
    return {
        "n_batches": len(batches),
        "rows_ingested": seen,
        "pool_final": pool_final,
        "pool_over_ingested": round(pool_final / max(seen, 1), 4),
        "wall_first10_avg": round(
            sum(r["wall_sec"] for r in batches[:10]) / 10, 2
        ),
        "wall_last10_avg": round(
            sum(r["wall_sec"] for r in batches[-10:]) / 10, 2
        ),
        "batches": batches,
    }


def soak_minhash(spark) -> dict:
    src = os.path.join(WORK, "docs_src")
    state = os.path.join(WORK, "minhash_state")
    ckpt = os.path.join(WORK, "minhash_ckpt")
    total = N_BATCHES * BATCH_ROWS
    docs = (
        spark.read.parquet(os.path.join(SF1, "documents.parquet"))
        .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
        .orderBy(H.hash64(F.col("doc_id")))
        .limit(total)
        .localCheckpoint(eager=True)
    )
    ded = MinhashDedupStream(spark, state, id_col="doc_id", text_col="text")
    os.makedirs(src, exist_ok=True)
    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ded.start(stream, ckpt)

    pdf = docs.toPandas()
    batches = []
    seen = 0
    for b in range(N_BATCHES):
        chunk = pdf.iloc[b * BATCH_ROWS: (b + 1) * BATCH_ROWS]
        if chunk.empty:
            break
        _emit_file(
            spark, chunk, "doc_id string, text string", src,
            f"b{b:04d}.parquet",
        )
        t0 = time.time()
        q.processAllAvailable()
        wall = time.time() - t0
        compacted = False
        if b and b % 10 == 0:
            ded.compact()
            compacted = True
        seen += len(chunk)
        row = {
            "batch": b,
            "docs_seen": seen,
            "wall_sec": round(wall, 2),
            "band_rows": _rows(spark, ded.bands_path),
            "shingle_rows": _rows(spark, ded.shingles_path),
            "pair_rows": _rows(spark, ded.pairs_path),
            "compacted": compacted,
        }
        batches.append(row)
        if b % 10 == 0 or b == N_BATCHES - 1:
            print(
                f"minhash b{b:03d} seen={seen:>7,} wall={wall:6.2f}s "
                f"bands={row['band_rows']:,} pairs={row['pair_rows']:,}",
                flush=True,
            )
    q.stop()

    # stream == batch: the soak's correctness leg
    from news_clustering_and_summarization_spark.operators.dedup import (
        minhash_near_duplicates,
    )

    t0 = time.time()
    batch_pairs = {
        (r["l_id"], r["r_id"])
        for r in minhash_near_duplicates(
            spark.createDataFrame(pdf.iloc[:seen]), id_col="doc_id"
        ).collect()
    }
    stream_pairs = {
        (r["l_id"], r["r_id"]) for r in ded.detect().collect()
    }
    eq_wall = time.time() - t0
    return {
        "n_batches": len(batches),
        "docs_ingested": seen,
        "stream_pairs": len(stream_pairs),
        "batch_pairs": len(batch_pairs),
        "stream_eq_batch": stream_pairs == batch_pairs,
        "equality_check_sec": round(eq_wall, 2),
        "wall_first10_avg": round(
            sum(r["wall_sec"] for r in batches[:10]) / 10, 2
        ),
        "wall_last10_avg": round(
            sum(r["wall_sec"] for r in batches[-10:]) / 10, 2
        ),
        "batches": batches,
    }


def soak_phash(spark) -> dict:
    """Streaming media near-dup dedup (PhashDedupStream) soak: a
    corpus of REAL image bytes with planted tight near-dup families
    — each family is ONE 8x8-cell pattern re-encoded through four
    different codecs (BMP/PNG/JPEG/GIF; block means survive lossy
    compression, so members are hamming-0 of each other) — members
    hash-scattered ACROSS batches so dedup must hit history, not
    just the in-flight batch. Invariants checked at the end, both
    order-independent: |accepted| == n_families + n_singletons (one
    representative each), and the accepted set is itself near-dup
    FREE (phash_duplicates over the accepted assets returns zero
    pairs)."""
    import hashlib

    import numpy as np
    import pandas as pd

    from news_clustering_and_summarization_spark.functions import (
        bmp as fbmp,
        gif as fgif,
        jpeg as fjpeg,
        png as fpng,
    )
    from news_clustering_and_summarization_spark.operators import (
        multimodal as MMOD,
    )
    from news_clustering_and_summarization_spark.streaming.dedup import (
        PhashDedupStream,
    )

    src = os.path.join(WORK, "media_src")
    state = os.path.join(WORK, "phash_state")
    ckpt = os.path.join(WORK, "phash_ckpt")
    total = N_BATCHES * BATCH_ROWS

    def pattern(tag: str) -> np.ndarray:
        bits = hashlib.md5(tag.encode()).digest()[:8]
        cells = np.unpackbits(np.frombuffer(bits, np.uint8)) * 235 + 10
        img = np.repeat(np.repeat(cells.reshape(8, 8), 8, 0), 8, 1)
        return np.repeat(
            img.astype(np.uint8)[:, :, None], 3, axis=2
        )

    encoders = [
        lambda im: fbmp.encode_bmp(im),
        lambda im: fpng.encode_png(im),
        lambda im: fjpeg.encode_jpeg(im, quality=88),
        lambda im: fgif.encode_gif(im),
    ]
    rows = []
    n_fam = n_single = 0
    for j in range(total):
        grp, member = j // 5, j % 5
        if member < 4:  # family of 4, one per codec
            img = pattern(f"fam{grp}")
            payload = encoders[member](img)
            if member == 0:
                n_fam += 1
        else:  # singleton with its own pattern
            img = pattern(f"solo{grp}")
            payload = encoders[j % len(encoders)](img)
            n_single += 1
        rows.append({"asset_id": f"a{j:07d}", "payload": payload})
    # hash-scatter across batches: family members land in DIFFERENT
    # micro-batches, so rejection must come from persisted history
    rows.sort(
        key=lambda r: hashlib.md5(r["asset_id"].encode()).hexdigest()
    )
    pdf = pd.DataFrame(rows, columns=["asset_id", "payload"])
    payload_by_id = {r["asset_id"]: r["payload"] for r in rows}

    ded = PhashDedupStream(spark, state, max_hamming=3)
    os.makedirs(src, exist_ok=True)
    stream = (
        spark.readStream.schema("asset_id string, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ded.start(stream, ckpt)
    batches = []
    seen = 0
    for b in range(N_BATCHES):
        chunk = pdf.iloc[b * BATCH_ROWS: (b + 1) * BATCH_ROWS]
        if chunk.empty:
            break
        _emit_file(
            spark, chunk, "asset_id string, payload binary", src,
            f"b{b:04d}.parquet",
        )
        t0 = time.time()
        q.processAllAvailable()
        wall = time.time() - t0
        compacted = False
        if b and b % 10 == 0:
            ded.compact()
            compacted = True
        seen += len(chunk)
        row = {
            "batch": b,
            "assets_seen": seen,
            "wall_sec": round(wall, 2),
            "accepted_rows": _rows(spark, ded.accepted_path),
            "compacted": compacted,
        }
        batches.append(row)
        if b % 10 == 0 or b == N_BATCHES - 1:
            print(
                f"phash b{b:03d} seen={seen:>7,} wall={wall:6.2f}s "
                f"accepted={row['accepted_rows']:,}",
                flush=True,
            )
    q.stop()

    accepted_ids = sorted(
        r["asset_id"] for r in ded.accepted().collect()
    )
    expected = n_fam + n_single
    # independent-set check: the accepted corpus must contain zero
    # remaining near-dup pairs
    t0 = time.time()
    acc_media = spark.createDataFrame(
        pd.DataFrame(
            [{"asset_id": a, "payload": payload_by_id[a]}
             for a in accepted_ids],
            columns=["asset_id", "payload"],
        )
    )
    residual = MMOD.phash_duplicates(
        acc_media, max_hamming=3, pixel_fn=MMOD.real_pixels
    ).count()
    eq_wall = time.time() - t0
    return {
        "n_batches": len(batches),
        "assets_ingested": seen,
        "planted_families": n_fam,
        "planted_singletons": n_single,
        "accepted": len(accepted_ids),
        "accepted_eq_expected": len(accepted_ids) == expected,
        "residual_neardup_pairs": residual,
        "independent_set_ok": residual == 0,
        "equality_check_sec": round(eq_wall, 2),
        "wall_first10_avg": round(
            sum(r["wall_sec"] for r in batches[:10])
            / max(1, min(10, len(batches))), 2
        ),
        "wall_last10_avg": round(
            sum(r["wall_sec"] for r in batches[-10:])
            / max(1, min(10, len(batches))), 2
        ),
        "batches": batches,
    }


def main() -> int:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "STREAM_SOAK.json")
    )
    if not os.path.isdir(SF1):
        print(f"missing {SF1}; run tools/gen_scale_data.py first")
        return 1
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        "stream-soak", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    # SOAK_ONLY=cluster|minhash runs a single family; with SOAK_LABEL
    # the result lands under "<family>_<label>" MERGED into the
    # existing JSON — so a next-decade trajectory (e.g. the r11
    # 500k-row clustering soak, SOAK_BATCHES=100 SOAK_BATCH_ROWS=5000
    # SOAK_ONLY=cluster SOAK_LABEL=500k) sits beside the standing
    # 50k evidence instead of replacing it.
    only = os.environ.get("SOAK_ONLY")
    label = os.environ.get("SOAK_LABEL")
    out: dict = {}
    if label and os.path.exists(out_path):
        with open(out_path) as f:
            out = json.load(f)
    out.setdefault("batches_per_soak", N_BATCHES)
    out.setdefault("batch_rows", BATCH_ROWS)
    suffix = f"_{label}" if label else ""
    ok = True
    msgs = []
    if only in (None, "cluster"):
        t0 = time.time()
        cluster_res = soak_clustering(spark)
        cluster_res["n_batches_cfg"] = N_BATCHES
        cluster_res["batch_rows_cfg"] = BATCH_ROWS
        out[f"clustering{suffix}"] = {
            **cluster_res, "total_sec": round(time.time() - t0, 1)
        }
        msgs.append(
            f"clustering{suffix}: pool {cluster_res['pool_final']:,} / "
            f"{cluster_res['rows_ingested']:,} ingested "
            f"(ratio {cluster_res['pool_over_ingested']})"
        )
    if only in (None, "minhash"):
        t1 = time.time()
        minhash_res = soak_minhash(spark)
        minhash_res["n_batches_cfg"] = N_BATCHES
        minhash_res["batch_rows_cfg"] = BATCH_ROWS
        out[f"minhash{suffix}"] = {
            **minhash_res, "total_sec": round(time.time() - t1, 1)
        }
        ok = minhash_res["stream_eq_batch"]
        msgs.append(f"minhash{suffix} stream==batch: {ok}")
    if only == "phash":
        t2 = time.time()
        phash_res = soak_phash(spark)
        phash_res["n_batches_cfg"] = N_BATCHES
        phash_res["batch_rows_cfg"] = BATCH_ROWS
        out[f"phash{suffix}"] = {
            **phash_res, "total_sec": round(time.time() - t2, 1)
        }
        ok = (
            phash_res["accepted_eq_expected"]
            and phash_res["independent_set_ok"]
        )
        msgs.append(
            f"phash{suffix}: accepted {phash_res['accepted']:,} == "
            f"planted {phash_res['planted_families'] + phash_res['planted_singletons']:,}: "
            f"{phash_res['accepted_eq_expected']}; independent-set: "
            f"{phash_res['independent_set_ok']}"
        )
    spark.stop()
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print("; ".join(msgs) + f" -> {out_path}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
