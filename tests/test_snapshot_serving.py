"""System test: the clustering pipeline's serving view published as
atomic snapshots (sources/tables.publish_snapshot) — the scale-safe
version of the reference UI's re-read-the-table-every-5s loop
(BASELINE.md: ClusterList-js.template full-table scan). A reader
bound to an old version survives a concurrent publish; the pointer
always names a complete version."""

from __future__ import annotations

import json
import os

from news_clustering_and_summarization_spark.operators.serving import (
    cluster_list,
)
from news_clustering_and_summarization_spark.sources import tables as T
from news_clustering_and_summarization_spark.streaming.pipeline import (
    ClusteringPipeline,
    start_ingest_embed_stream,
)

STORIES = {
    "alpha": "the central bank raised interest rates again today",
    "beta": "the championship final went to extra time last night",
}


def _write_articles(path, story_range):
    os.makedirs(path, exist_ok=True)
    for s, txt in STORIES.items():
        with open(os.path.join(path, f"{s}-{story_range}.json"), "w") as f:
            for i in story_range:
                f.write(
                    json.dumps(
                        {
                            "id": f"{s}-{i}",
                            "title": f"{s} headline {i}",
                            "text": f"{txt} detail {i}",
                            "date": f"2024-03-01 10:{i % 60:02d}:00",
                        }
                    )
                    + "\n"
                )


def test_pipeline_serving_via_snapshots(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "embedded")
    serve = str(tmp_path / "serve")
    _write_articles(src, range(0, 6))
    q = start_ingest_embed_stream(
        spark, src, out, str(tmp_path / "ckpt1")
    )
    q.processAllAvailable()
    q.stop()
    pipe = ClusteringPipeline(
        spark, str(tmp_path / "state"), batch_size=4, eps=0.35,
        strategy="cross",
    )
    sq = pipe.start(out, str(tmp_path / "ckpt2"))
    sq.processAllAvailable()
    sq.stop()
    pipe.flush()

    v1 = T.publish_snapshot(
        cluster_list(pipe.clusters(), pipe.cluster_articles()), serve
    )
    ui1 = T.read_latest_snapshot(spark, serve)
    counts1 = {r["PK"]: r["article_count"] for r in ui1.collect()}
    assert len(counts1) == 2 and all(c == 6 for c in counts1.values())

    # a dashboard holds version 1 open while more articles arrive...
    old_reader = spark.read.parquet(os.path.join(serve, "v=1"))

    _write_articles(src, range(6, 12))
    q = start_ingest_embed_stream(
        spark, src, out, str(tmp_path / "ckpt1")
    )
    q.processAllAvailable()
    q.stop()
    sq = pipe.start(out, str(tmp_path / "ckpt2"))
    sq.processAllAvailable()
    sq.stop()
    pipe.flush()
    v2 = T.publish_snapshot(
        cluster_list(pipe.clusters(), pipe.cluster_articles()), serve
    )
    assert (v1, v2) == (1, 2)

    ui2 = T.read_latest_snapshot(spark, serve)
    counts2 = {r["PK"]: r["article_count"] for r in ui2.collect()}
    assert {tuple(sorted(counts2.values()))} == {(12, 12)}
    # the old reader still completes on its own complete version
    assert {r["article_count"] for r in old_reader.collect()} == {6}
    # maintenance prune keeps the pointed-to version readable
    T.prune_snapshots(spark, serve, keep=1)
    assert T.read_latest_snapshot(spark, serve).count() == 2
