"""Streaming assembly tests: file-source replay at a paced rate,
count-based batching, restart/restore equivalence, redelivery
idempotence (SURVEY §5 test plan items 4)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.streaming.pipeline import (
    ClusteringPipeline,
    start_ingest_embed_stream,
)


def _write_articles(path: str, start: int, count: int, story: str, text: str):
    os.makedirs(path, exist_ok=True)
    fn = os.path.join(path, f"{story}-{start}.json")
    with open(fn, "w") as f:
        for i in range(start, start + count):
            f.write(
                json.dumps(
                    {
                        "id": f"{story}-{i}",
                        "title": f"{story} headline {i}",
                        "text": f"{text} detail {i}",
                        "date": f"2024-03-01 10:{i % 60:02d}:00",
                    }
                )
                + "\n"
            )


STORIES = {
    "quake": "a strong earthquake shook the coastal city damaging bridges and buildings",
    "cup": "the national team won the cup final after a dramatic penalty shootout",
}


def test_ingest_embed_stream(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for s, txt in STORIES.items():
        _write_articles(inp, 0, 3, s, txt)
    q = start_ingest_embed_stream(spark, inp, out, ckpt, max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 6
    row = got.where("id = 'quake-0'").collect()[0]
    assert row["embed_text"].startswith("quake headline 0")
    assert len(row["concat_embedding"]) == 1  # wrapped wire format
    assert len(row["concat_embedding"][0]) == 64

    # restart with no new files -> no duplicates (checkpoint replay)
    q2 = start_ingest_embed_stream(spark, inp, out, ckpt, max_files_per_trigger=1)
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out).count() == 6


def test_count_trigger_spools_until_threshold(spark, tmp_path):
    pipe = ClusteringPipeline(
        spark, str(tmp_path / "state"), batch_size=5, eps=0.35,
        strategy="cross",
    )
    emb = spark.createDataFrame(
        [(f"a{i}", f"t{i}", f"s{i}", f"x{i}", "2024-01-01 00:00:00",
          [[1.0 if j == i else 0.0 for j in range(4)]])
         for i in range(3)],
        "id string, title string, summary string, text string, "
        "publication_date string, concat_embedding array<array<double>>",
    )
    pipe.process_batch(emb)
    # below threshold: spooled, nothing clustered
    assert pipe.pending().count() == 3
    assert pipe.pool().count() == 0

    # crash-replay: the SAME micro-batch delivered again must not
    # double-spool (foreachBatch at-least-once)
    pipe.process_batch(emb)
    assert pipe.pending().count() == 3

    emb2 = spark.createDataFrame(
        [(f"b{i}", f"t{i}", f"s{i}", f"x{i}", "2024-01-01 00:00:00",
          [[0.5, 0.5, 0.0, 0.0]]) for i in range(2)],
        "id string, title string, summary string, text string, "
        "publication_date string, concat_embedding array<array<double>>",
    )
    pipe.process_batch(emb2)
    # threshold reached: spool drained, pool populated. b0/b1 sit at
    # cosine dist ~0.29 from a0 AND a1, so {a0,a1,b0,b1} merge into one
    # pool row (absorbed singletons purged) and a2 stays singleton.
    assert pipe.pending().count() == 0
    pool = pipe.pool().collect()
    total_articles = sum(len(r["article_ids"]) for r in pool)
    assert total_articles == 5
    sizes = sorted(len(r["article_ids"]) for r in pool)
    assert sizes == [1, 4]


def test_clustering_stream_end_to_end_with_restart(spark, tmp_path):
    """Full §3.2 path via the streaming entrypoint, killed and
    restarted halfway: final state equals uninterrupted processing."""
    inp = str(tmp_path / "in")
    out = str(tmp_path / "embedded")
    for s, txt in STORIES.items():
        _write_articles(inp, 0, 6, s, txt)
    q = start_ingest_embed_stream(
        spark, inp, out, str(tmp_path / "ckpt1")
    )
    q.processAllAvailable()
    q.stop()

    state_dir = str(tmp_path / "state")
    pipe = ClusteringPipeline(
        spark, state_dir, batch_size=4, eps=0.35, strategy="cross"
    )
    # paced replay: one file per trigger (ST7 rate simulation)
    sq = pipe.start(out, str(tmp_path / "ckpt2"), max_files_per_trigger=1)
    sq.processAllAvailable()
    sq.stop()
    pipe.flush()

    pool = pipe.pool().collect()
    stories = {r["cluster_id"]: sorted(r["article_ids"]) for r in pool}
    # both stories fully clustered (6 articles each)
    sizes = sorted(len(v) for v in stories.values())
    assert sizes == [6, 6], stories
    clusters = {r["PK"]: r for r in pipe.clusters().collect()}
    assert all(r["number_of_articles"] == 6 for r in clusters.values())
    # ST6 fired at T=5: summaries generated
    assert all(r["generated_summary"] != "" for r in clusters.values())
    assert pipe.cluster_articles().count() == 12

    # restart the pipeline object from disk only (ST5 restore)
    pipe2 = ClusteringPipeline(
        spark, state_dir, batch_size=4, eps=0.35, strategy="cross"
    )
    assert pipe2.pool().count() == pipe.pool().count()
    # re-delivering the same embedded data must not change the store
    sq2 = pipe2.start(out, str(tmp_path / "ckpt3"), max_files_per_trigger=2)
    sq2.processAllAvailable()
    sq2.stop()
    pipe2.flush()
    clusters2 = {r["PK"]: r for r in pipe2.clusters().collect()}
    assert {k: v["number_of_articles"] for k, v in clusters2.items()} == {
        k: v["number_of_articles"] for k, v in clusters.items()
    }
    assert pipe2.cluster_articles().count() == 12


def test_kafka_transport_full_dataflow(spark, tmp_path):
    """The complete reference dataflow over the Kafka transport:
    kafka-shaped records (base64 JSON-list payloads + one poison
    message) -> ingest/embed stream -> ClusteringPipeline -> serving
    tables. Output must be identical to the file-transport run over
    the same articles."""
    import base64

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # same articles as the file path, but packed into kafka payloads
    arts = []
    for s, txt in STORIES.items():
        for i in range(6):
            arts.append(
                {
                    "id": f"{s}-{i}",
                    "title": f"{s} headline {i}",
                    "text": f"{txt} detail {i}",
                    "date": f"2024-03-01 10:{i % 60:02d}:00",
                }
            )
    kin = tmp_path / "kafka-in"
    kin.mkdir()
    payload = base64.b64encode(json.dumps(arts).encode()).decode()
    with open(kin / "records.json", "w") as f:
        f.write(json.dumps({"value": payload, "topic": "articles",
                            "partition": 0, "offset": 0}) + "\n")
        f.write(json.dumps({"value": "%%%poison%%%", "topic": "articles",
                            "partition": 0, "offset": 1}) + "\n")
    raw_schema = T.StructType(
        [
            T.StructField("value", T.StringType()),
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
        ]
    )
    kframe = (
        spark.readStream.schema(raw_schema).json(str(kin))
        .withColumn("key", F.lit(None).cast("binary"))
        .withColumn("value", F.col("value").cast("binary"))
        .withColumn("timestamp", F.lit(None).cast("timestamp"))
        .withColumn("timestampType", F.lit(0))
    )
    out = str(tmp_path / "embedded")
    q = start_ingest_embed_stream(
        spark, None, out, str(tmp_path / "ckpt1"),
        source="kafka", raw_kafka_frame=kframe,
    )
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == 12  # poison dropped

    pipe = ClusteringPipeline(
        spark, str(tmp_path / "state"), batch_size=4, eps=0.35,
        strategy="cross",
    )
    sq = pipe.start(out, str(tmp_path / "ckpt2"))
    sq.processAllAvailable()
    sq.stop()
    pipe.flush()
    pool = pipe.pool().collect()
    sizes = sorted(len(r["article_ids"]) for r in pool)
    assert sizes == [6, 6]  # both stories fully clustered, like file path
    clusters = pipe.clusters().collect()
    assert all(r["number_of_articles"] == 6 for r in clusters)
    assert all(r["generated_summary"] != "" for r in clusters)


def test_kafka_poison_dlq_and_metric(spark, tmp_path):
    """ST8: poison kafka messages are not silently lost — they land
    verbatim in the dead-letter parquet dir when dlq_path is set, and
    the kafka_decode observed metric counts them either way."""
    import base64

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    arts = [
        {"id": f"a{i}", "title": f"t{i}", "text": f"story text {i}",
         "date": "2024-03-01 10:00:00"}
        for i in range(4)
    ]
    kin = tmp_path / "kafka-in"
    kin.mkdir()
    payload = base64.b64encode(json.dumps(arts).encode()).decode()
    with open(kin / "records.json", "w") as f:
        f.write(json.dumps({"value": payload, "topic": "articles",
                            "partition": 0, "offset": 0}) + "\n")
        f.write(json.dumps({"value": "%%%poison-one%%%", "topic": "articles",
                            "partition": 0, "offset": 1}) + "\n")
        f.write(json.dumps({"value": "%%%poison-two%%%", "topic": "articles",
                            "partition": 0, "offset": 2}) + "\n")
    raw_schema = T.StructType(
        [
            T.StructField("value", T.StringType()),
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
        ]
    )
    kframe = (
        spark.readStream.schema(raw_schema).json(str(kin))
        .withColumn("key", F.lit(None).cast("binary"))
        .withColumn("value", F.col("value").cast("binary"))
        .withColumn("timestamp", F.lit(None).cast("timestamp"))
        .withColumn("timestampType", F.lit(0))
    )
    out = str(tmp_path / "embedded")
    dlq = str(tmp_path / "dlq")
    q = start_ingest_embed_stream(
        spark, None, out, str(tmp_path / "ckpt"),
        source="kafka", raw_kafka_frame=kframe, dlq_path=dlq,
    )
    q.processAllAvailable()
    progress = q.recentProgress
    q.stop()
    # good articles embedded, poison quarantined — nothing lost
    assert spark.read.parquet(out).count() == 4
    dlq_rows = spark.read.parquet(dlq).collect()
    assert sorted(r["corrupt_record"] for r in dlq_rows) == [
        "%%%poison-one%%%", "%%%poison-two%%%",
    ]
    # the observed metric exposes the drop rate to operators
    observed = [
        p["observedMetrics"]["kafka_decode"]
        for p in progress
        if "kafka_decode" in p.get("observedMetrics", {})
    ]
    assert sum(m["n_corrupt"] for m in observed) == 2
    assert sum(m["n_records"] for m in observed) == 6


def test_full_system_with_bloom_dedup_front(spark, tmp_path):
    """Whole-system composition: content-hash Bloom dedup in front of
    ingest -> embed -> cluster. A redelivered day-2 drop repeats half
    of day 1's articles verbatim; only novel content reaches the
    embedder and the cluster store counts each article once."""
    import pyspark.sql.functions as F

    from news_clustering_and_summarization_spark.sources.json_ingest import (
        read_articles_json,
    )
    from news_clustering_and_summarization_spark.streaming.dedup import (
        BloomDedupStream,
    )

    day1 = str(tmp_path / "day1")
    day2 = str(tmp_path / "day2")
    for s, txt in STORIES.items():
        _write_articles(day1, 0, 4, s, txt)
        _write_articles(day2, 2, 4, s, txt)  # ids 2..5: overlap 2,3

    ded = BloomDedupStream(
        spark, str(tmp_path / "dstate"), "content_hash", n_expected=10_000
    )

    def keyed(path):
        return (
            read_articles_json(spark, path)
            .where("corrupt_record IS NULL")
            .withColumn("content_hash", F.md5("text"))
        )

    ded.process_batch(keyed(day1), 0)
    ded.process_batch(keyed(day2), 1)
    accepted = ded.accepted()
    # 8 day-1 articles + 4 genuinely new day-2 articles
    assert accepted.count() == 12
    ids = sorted(r["id"] for r in accepted.select("id").collect())
    assert len(set(ids)) == 12

    # novel articles flow into the standard embed -> cluster path
    from news_clustering_and_summarization_spark.operators.cluster import (
        cluster_batch,
    )
    from news_clustering_and_summarization_spark.operators.embed import (
        embed_articles,
        unwrap_embedding,
    )
    from news_clustering_and_summarization_spark.operators.preprocess import (
        preprocess, with_embed_text,
    )

    emb = embed_articles(
        with_embed_text(preprocess(accepted.drop("epoch")))
    ).withColumn("embedding", unwrap_embedding("concat_embedding"))
    cl = cluster_batch(emb, eps=0.35)
    reps = {}
    for r in cl.collect():
        reps.setdefault(r["cluster_rep"], []).append(r["id"])
    sizes = sorted(len(v) for v in reps.values())
    assert sizes == [6, 6], reps  # each story: ids 0..5, once each
