#!/usr/bin/env python3
"""Real-codec media-path throughput probe (r11).

The multimodal path now decodes genuine bytes (JPEG/PNG/BMP images,
WAV audio, MJPEG-AVI video). This probe answers the 100 TB question
for it: is per-asset decode cost FLAT as the corpus grows (the path
is a pure map — zero shuffle, so wall must track rows ~linearly on
fixed cores), and what is the per-core decode rate a 1000-executor
cluster would multiply out?

Method: build n synthetic assets fully distributed (mapInPandas
encodes a deterministic 64x64 JPEG per id — unique pixels per asset;
every 10th asset is instead a 4-frame MJPEG AVI so the container
walk + per-frame decode is in the measured mix), localCheckpoint to
pin the bytes, then time decode_media(real) + a frame-level
extract_frames pass. Scales 10k / 100k (x10): a linear path shows
wall ratio ~= row ratio; super-linear would mean hidden driver or
skew terms.

Writes MEDIA_SCALE_PROBE.json. Run on an idle box (bench.py rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_assets(spark, n: int):
    from pyspark.sql import functions as F

    ids = spark.range(n).repartition(CPUS)

    def enc(batches):
        import numpy as np
        import pandas as pd

        from news_clustering_and_summarization_spark.functions import (
            avi,
            jpeg,
        )

        y, x = np.mgrid[0:64, 0:64]
        base = ((x // 16 + y // 16) % 2).astype(np.uint8)
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                i = int(i)
                img = np.repeat(
                    ((base * ((i * 37) % 200 + 30) + (i % 29))
                     .astype(np.uint8))[:, :, None],
                    3,
                    axis=2,
                )
                if i % 10 == 0:
                    frames = [
                        jpeg.encode_jpeg(
                            np.roll(img, f * 8, axis=1), quality=85
                        )
                        for f in range(4)
                    ]
                    payload = avi.encode_avi(frames, 64, 64)
                    mt = "video"
                else:
                    payload = jpeg.encode_jpeg(img, quality=85)
                    mt = "image"
                out.append(
                    {"asset_id": str(i), "media_type": mt,
                     "payload": payload}
                )
            yield pd.DataFrame(
                out, columns=["asset_id", "media_type", "payload"]
            )

    df = ids.mapInPandas(
        enc, schema="asset_id string, media_type string, payload binary"
    ).localCheckpoint(eager=True)
    total_bytes = df.select(
        F.sum(F.length("payload")).alias("b")
    ).collect()[0]["b"]
    return df, int(total_bytes)


def probe(spark, n: int) -> dict:
    from pyspark.sql import functions as F

    from news_clustering_and_summarization_spark.operators import (
        multimodal as MM,
    )

    t0 = time.time()
    assets, total_bytes = build_assets(spark, n)
    build_wall = round(time.time() - t0, 2)
    t0 = time.time()
    dec = (
        MM.decode_media(assets)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("n_ok"),
            F.sum("n_frames").alias("frames"),
        )
        .collect()[0]
    )
    decode_wall = round(time.time() - t0, 2)
    t0 = time.time()
    n_frames_ext = MM.extract_frames(assets, every_nth=1).count()
    extract_wall = round(time.time() - t0, 2)
    assert dec["n"] == n and dec["n_ok"] == n, dec
    return {
        "n_assets": n,
        "mb_encoded": round(total_bytes / 1e6, 1),
        "build_wall_sec": build_wall,
        "decode_wall_sec": decode_wall,
        "decode_assets_per_sec": round(n / decode_wall, 1),
        "decoded_frames": int(dec["frames"]),
        "extract_frames_wall_sec": extract_wall,
        "extracted_frames": int(n_frames_ext),
    }


def main() -> int:
    from news_clustering_and_summarization_spark.session import get_spark

    scales = [int(s) for s in (sys.argv[1:] or ["10000", "100000"])]
    spark = get_spark(
        "media-probe", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    out = {"cpus": CPUS, "results": {}}
    base_key = None
    for n in scales:
        r = probe(spark, n)
        key = f"n{n}"
        if base_key is None:
            base_key = key
        base = out["results"].get(base_key, r)
        r["row_ratio"] = round(n / base["n_assets"], 2)
        r["decode_wall_ratio"] = round(
            r["decode_wall_sec"] / base["decode_wall_sec"], 2
        )
        out["results"][key] = r
        print(json.dumps({key: r}))
    path = os.path.join(REPO, "MEDIA_SCALE_PROBE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
