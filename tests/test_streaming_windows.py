"""Watermarked event-time windows: append-mode streams must finalize
a window exactly once after the watermark passes its end, and drop
late rows that arrive beyond the watermark."""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from news_clustering_and_summarization_spark.streaming.windows import (
    windowed_counts,
)

SCHEMA = StructType(
    [StructField("id", StringType()), StructField("ts", StringType())]
)


def _write(path, name, rows):
    with open(os.path.join(path, name), "w") as f:
        for i, ts in enumerate(rows):
            f.write(json.dumps({"id": f"{name}-{i}", "ts": ts}) + "\n")


def test_watermark_finalizes_and_drops_late(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 1: three rows in the 10:00-10:05 window, plus one at 10:20
    # that advances max event time (watermark -> 10:10 after batch 1)
    _write(
        src,
        "f1.json",
        [
            "2024-01-01 10:00:30",
            "2024-01-01 10:01:00",
            "2024-01-01 10:02:00",
            "2024-01-01 10:20:00",
        ],
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    agg = windowed_counts(
        stream, "ts", window_size="5 minutes", watermark="10 minutes"
    )
    sink = f"win_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE row for the already-closed 10:00 window
        # (watermark is 10:10 > 10:05 close) and an on-time row
        _write(
            src, "f2.json", ["2024-01-01 10:01:30", "2024-01-01 10:21:00"]
        )
        q.processAllAvailable()
        rows = {
            r.window_start.strftime("%H:%M"): r.n
            for r in spark.table(sink).collect()
        }
        # 10:00 window finalized with the 3 on-time rows only — the
        # late 10:01:30 arrival was dropped by the watermark
        assert rows.get("10:00") == 3, rows
        # the 10:20 window is still open (watermark hasn't passed it)
        assert "10:20" not in rows, rows
    finally:
        q.stop()


def test_window_state_survives_restart(spark, tmp_path):
    """Open-window state must live in the checkpoint: rows arrive in
    run 1 with no emission (watermark hasn't passed the window); run 2
    restarts from the checkpoint, sees the watermark advance, and must
    finalize the window with run 1's rows."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)
    _write(
        src,
        "f1.json",
        ["2024-01-01 10:00:30", "2024-01-01 10:01:00", "2024-01-01 10:02:00"],
    )

    def start():
        # memory sink can't recover from a checkpoint — use the
        # fault-tolerant file sink for the restart scenario
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(src)
            .withColumn("ts", F.to_timestamp("ts"))
        )
        agg = windowed_counts(
            stream, "ts", window_size="5 minutes", watermark="10 minutes"
        )
        return (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start()
    q1.processAllAvailable()
    q1.stop()

    _write(src, "f2.json", ["2024-01-01 10:20:00"])
    q2 = start()
    try:
        q2.processAllAvailable()
        rows = {
            r.window_start.strftime("%H:%M"): r.n
            for r in spark.read.parquet(out).collect()
        }
        assert rows.get("10:00") == 3, rows
    finally:
        q2.stop()


def test_windowed_counts_batch_mode(spark):
    """Same operator works on a batch frame (no watermark applied)."""
    df = spark.createDataFrame(
        [("a", "2024-01-01 10:00:10"), ("b", "2024-01-01 10:07:00")],
        SCHEMA,
    ).withColumn("ts", F.to_timestamp("ts"))
    out = windowed_counts(df, "ts", window_size="5 minutes")
    got = {
        r.window_start.strftime("%H:%M"): r.n for r in out.collect()
    }
    assert got == {"10:00": 1, "10:05": 1}


def test_stream_static_broadcast_join(spark, tmp_path):
    """Stream-static equi-join: each micro-batch joins against a
    static dim (broadcast — no stream-side shuffle), the standard
    enrichment shape for a streaming ingest pipeline."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(src, "f1.json", ["2024-01-01 10:00:00", "2024-01-01 10:01:00"])
    static = spark.createDataFrame(
        [("f1.json-0", "en"), ("f1.json-1", "de")], ["id", "lang"]
    )
    stream = (
        spark.readStream.schema(SCHEMA).json(src)
        .join(F.broadcast(static), "id", "left")
    )
    sink = f"ss_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {r.id: r.lang for r in spark.table(sink).collect()}
        assert rows == {"f1.json-0": "en", "f1.json-1": "de"}, rows
    finally:
        q.stop()


def test_session_window_stream_finalizes_sessions(spark, tmp_path):
    from news_clustering_and_summarization_spark.streaming.windows import (
        session_counts,
    )

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    # one user: a 3-event burst, then silence > gap, then a far-future
    # event that pushes the watermark past the first session's close
    _write(
        src,
        "f1.json",
        [
            "2024-01-01 10:00:00",
            "2024-01-01 10:03:00",
            "2024-01-01 10:06:00",
            "2024-01-01 12:00:00",
        ],
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
        .withColumn("ts", F.to_timestamp("ts"))
        .withColumn("user", F.lit("u1"))
    )
    agg = session_counts(
        stream, "ts", gap="10 minutes", watermark="5 minutes", keys=["user"]
    )
    sink = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {
            r.session_start.strftime("%H:%M"): r.n
            for r in spark.table(sink).collect()
        }
        # burst merged into ONE session (gaps of 3 min < 10 min gap),
        # finalized once the 12:00 event moved the watermark past its
        # end; the 12:00 session itself is still open -> not emitted
        assert rows == {"10:00": 3}, rows
    finally:
        q.stop()


def test_stream_stream_interval_join(spark, tmp_path):
    from news_clustering_and_summarization_spark.streaming.windows import (
        interval_join_streams,
    )

    lsrc, rsrc = str(tmp_path / "arts"), str(tmp_path / "clicks")
    os.makedirs(lsrc)
    os.makedirs(rsrc)
    with open(os.path.join(lsrc, "a.json"), "w") as f:
        f.write(json.dumps({"id": "k1", "ts": "2024-01-01 10:00:00"}) + "\n")
        f.write(json.dumps({"id": "k2", "ts": "2024-01-01 11:00:00"}) + "\n")
    with open(os.path.join(rsrc, "c.json"), "w") as f:
        # in-window for k1 (+5 min), out-of-window for k2 (+30 min)
        f.write(json.dumps({"id": "k1", "ts": "2024-01-01 10:05:00"}) + "\n")
        f.write(json.dumps({"id": "k2", "ts": "2024-01-01 11:30:00"}) + "\n")

    def read(src):
        return (
            spark.readStream.schema(SCHEMA)
            .json(src)
            .withColumn("ts", F.to_timestamp("ts"))
        )

    joined = interval_join_streams(
        read(src=lsrc).alias("l"),
        read(src=rsrc).withColumnRenamed("ts", "click_ts").alias("r"),
        key="id",
        left_ts="ts",
        right_ts="click_ts",
        tolerance="15 minutes",
    ).select("l.id", "click_ts")
    sink = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = [(r.id, r.click_ts.strftime("%H:%M"))
                for r in spark.table(sink).collect()]
        assert rows == [("k1", "10:05")], rows
    finally:
        q.stop()


def test_training_data_ops_compose_in_streaming(spark, tmp_path):
    """The curation operators are stateless Column expressions, so the
    batch-tested pipeline (quality score -> filter -> chunk) runs
    unchanged as a structured stream."""
    from news_clustering_and_summarization_spark.operators.chunking import (
        chunk_documents,
    )
    from news_clustering_and_summarization_spark.operators.text_analysis import (
        quality_score,
    )

    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    good = "the quick brown fox jumps over the lazy dog " * 4
    with open(os.path.join(src, "d1.json"), "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": good}) + "\n")
        f.write(json.dumps({"doc_id": 2, "text": "x"}) + "\n")  # too short

    stream = spark.readStream.schema("doc_id long, text string").json(src)
    curated = quality_score(stream, "text").where("quality_score >= 0.5")
    chunks = chunk_documents(curated, chunk_tokens=16, overlap=4)
    sink_dir = str(tmp_path / "chunk_sink")
    q = (
        chunks.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", str(tmp_path / "chunk_ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(sink_dir)
    assert out.where("doc_id = 2").count() == 0  # filtered by quality
    n_tokens = len(good.split())
    got = sorted(
        r["chunk_text"] for r in out.where("doc_id = 1").collect()
    )
    assert len(got) == len(range(0, n_tokens, 12))  # stride 12
    assert all(len(c.split()) <= 16 for c in got)
