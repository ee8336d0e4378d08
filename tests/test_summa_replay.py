"""S14 made concrete: replay a checked-in SUMMA-shaped labeled sample
through the full reference dataflow and hold a clustering-quality
floor against the ground-truth `cluster` labels.

The reference pulls the real SUMMA clustering corpus over FTP
(data/download_public_data.sh:1-2) and feeds it through Kinesis in
JSON-list batches of 5 (data/put_records.py:11-41); this sandbox has
no network, so tests/fixtures/summa_sample.json is a synthetic sample
in exactly that dataset shape (the example_article.json fields,
including event_id/duplicate/bag_id/cluster ground truth) — 6 labeled
events x 6 articles, 2 exact duplicates flagged duplicate=true, and 2
singleton stories. The replay path is the real one: JSON-list batches
-> base64 payloads -> articles_from_kafka decode -> preprocess ->
embed -> cluster -> clustering_quality.
"""

from __future__ import annotations

import base64
import json
import os

from pyspark.sql import functions as F

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures",
    "summa_sample.json",
)


def test_summa_sample_replay_quality_floor(spark):
    from news_clustering_and_summarization_spark.operators.cluster import (
        cluster_batch,
    )
    from news_clustering_and_summarization_spark.operators.embed import (
        embed_articles,
        unwrap_embedding,
    )
    from news_clustering_and_summarization_spark.operators.evaluation import (
        clustering_quality,
    )
    from news_clustering_and_summarization_spark.operators.preprocess import (
        preprocess,
        with_embed_text,
    )
    from news_clustering_and_summarization_spark.sources.json_ingest import (
        KAFKA_SOURCE_SCHEMA,
        articles_from_kafka,
    )

    with open(FIXTURE) as f:
        arts = json.load(f)
    assert len(arts) == 40

    # the producer's wire format: JSON-list batches of 5, base64
    rows = []
    for off, i in enumerate(range(0, len(arts), 5)):
        payload = base64.b64encode(
            json.dumps(arts[i : i + 5]).encode()
        ).decode()
        rows.append((None, payload.encode(), "articles", 0, off, None, 0))
    raw = spark.createDataFrame(rows, KAFKA_SOURCE_SCHEMA)

    decoded = articles_from_kafka(raw)
    assert decoded.where("corrupt_record IS NOT NULL").count() == 0
    articles = decoded.drop("corrupt_record")

    embedded = embed_articles(with_embed_text(preprocess(articles)))
    vec = embedded.select(
        "id",
        "cluster",
        "duplicate",
        unwrap_embedding("concat_embedding")
        .cast("array<double>")
        .alias("embedding"),
    ).localCheckpoint(eager=True)

    # eps calibrated to the deterministic embedder on this sample the
    # same way the reference calibrates on real SUMMA embeddings
    # (its notebook sweeps eps files): 0.25 shatters one event,
    # 0.35 merges two — 0.30 recovers the labels exactly
    assigned = cluster_batch(
        vec, eps=0.30, id_col="id", vec_col="embedding", strategy="cross"
    )
    joined = assigned.join(vec.select("id", "cluster"), "id")
    q = clustering_quality(
        joined, pred_col="cluster_rep", truth_col="cluster"
    ).collect()[0]

    # distinct-vocabulary events must separate cleanly: no merged
    # events (homogeneity) and no shattered events (completeness)
    assert q["n"] == 40
    assert q["homogeneity"] >= 0.95, q
    assert q["completeness"] >= 0.95, q

    # the flagged exact duplicates must land in their source article's
    # cluster (they are copies — same embedding, same component)
    rep_by_id = {r["id"]: r["cluster_rep"] for r in assigned.collect()}
    dup_src = {
        a["id"]: [
            b["id"]
            for b in arts
            if not b["duplicate"] and b["text"] == a["text"]
        ][0]
        for a in arts
        if a["duplicate"]
    }
    assert dup_src  # fixture carries flagged duplicates
    for dup_id, src_id in dup_src.items():
        assert rep_by_id[dup_id] == rep_by_id[src_id]

    # singletons stay unclustered
    flags = {r["id"]: r["is_cluster"] for r in assigned.collect()}
    assert flags["3000"] is False and flags["3001"] is False
