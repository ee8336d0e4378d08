"""Structured-streaming assembly (SURVEY §2.7 ST1-ST8, §3.1-3.3).

Two queries, mirroring the reference's two long-lived processes:

1. ``start_ingest_embed_stream`` — readStream(json) -> preprocess ->
   embed -> parquet sink. The reference's four Lambda/S3/SQS hops
   (§3.1) fuse into one fully-pipelined streaming query; the staging
   buckets disappear.

2. ``ClusteringPipeline`` — foreachBatch around the incremental
   cluster update (§3.2). State (the cluster pool) is a durable
   parquet table rewritten atomically per processed batch; the
   serving tables are merged in the same foreachBatch, making the
   whole step idempotent (ST4: effectively-once on top of Spark's
   at-least-once replay).

Count-based trigger (ST1): the reference buffers SQS messages until
>= 500 before clustering (process_records.py:556-608). Spark triggers
are time-based, so the foreachBatch appends small micro-batches to a
pending spool and only runs the clustering step once the spool
reaches ``batch_size`` rows (or on ``flush()`` at end of stream) —
same batching semantics, expressed at the operator level.

Checkpointing (ST5): Spark's streaming checkpoint (source offsets) +
the state table itself are the restart story; ``restore()`` just
reads the last committed state parquet — the reference's S3-pickle
restore (process_records.py:518-553) with stronger guarantees.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import cluster as C
from ..operators import cluster_tables as CT
from ..operators import summarize as SM
from ..operators.embed import EmbeddingBackend, embed_articles, unwrap_embedding
from ..operators.preprocess import preprocess, with_embed_text
from ..schemas import (
    ARTICLE_SCHEMA,
    CLUSTERS_SCHEMA,
    CLUSTER_ARTICLES_SCHEMA,
    CLUSTER_STATE_SCHEMA,
)
from ..sources.json_ingest import read_articles_stream

DEFAULT_BATCH_SIZE = 500  # reference process_records.py:558


def start_ingest_embed_stream(
    spark: SparkSession,
    input_path: str | None,
    output_path: str,
    checkpoint_path: str,
    backend: EmbeddingBackend | None = None,
    max_files_per_trigger: int | None = None,
    source: str = "file",
    kafka_bootstrap_servers: str | None = None,
    kafka_topic: str | None = None,
    kafka_payload_encoding: str = "base64",
    kafka_options: dict | None = None,
    raw_kafka_frame=None,
    dlq_path: str | None = None,
):
    """Streaming query #1: raw articles -> embedded parquet.

    ``source="file"`` replays JSON files from ``input_path``;
    ``source="kafka"`` subscribes to a live topic (parity with the
    reference's Kinesis entry, main.tf:128-147) whose record values
    carry the reference's base64(JSON list) payload — both feed the
    identical preprocess -> embed chain and parquet/checkpoint sink.
    ``raw_kafka_frame`` injects a pre-built Kafka-shaped streaming
    DataFrame (KAFKA_SOURCE_SCHEMA) so tests can drive the kafka
    decode path without a broker or the connector jar.

    Poison messages (undecodable payloads) never kill the stream: on
    the kafka path they are counted in the ``kafka_decode`` observed
    metric (query.lastProgress["observedMetrics"]) and, when
    ``dlq_path`` is set, teed verbatim to a parquet dead-letter dir
    via a foreachBatch sink; without ``dlq_path`` they are DROPPED
    after the metric — operators watch n_corrupt, not row counts.
    The DLQ variant is at-least-once on crash-replay (foreachBatch
    re-runs an uncommitted epoch), matching the reference's
    at-least-once delivery; the default path keeps the parquet sink's
    exactly-once epoch log.

    Returns the StreamingQuery; callers drive it with
    processAllAvailable() in tests or leave it running in production.
    """
    if source == "file":
        raw = read_articles_stream(
            spark, input_path, ARTICLE_SCHEMA, max_files_per_trigger
        )
    elif source == "kafka":
        from ..sources.json_ingest import articles_from_kafka, read_kafka_stream

        kafka_raw = (
            raw_kafka_frame
            if raw_kafka_frame is not None
            else read_kafka_stream(
                spark,
                kafka_bootstrap_servers,
                kafka_topic,
                options=kafka_options,
            )
        )
        decoded = articles_from_kafka(
            kafka_raw, ARTICLE_SCHEMA, kafka_payload_encoding
        ).observe(
            "kafka_decode",
            F.sum(
                F.when(F.col("corrupt_record").isNotNull(), 1).otherwise(0)
            ).alias("n_corrupt"),
            F.count(F.lit(1)).alias("n_records"),
        )
        if dlq_path is not None:
            def _split_sink(batch_df, _epoch_id):
                # evaluate the batch once (embed UDF upstream), then
                # route corrupt rows to the DLQ and the rest onward
                batch_df = batch_df.localCheckpoint(eager=True)
                bad = batch_df.where(
                    F.col("corrupt_record").isNotNull()
                ).select("corrupt_record")
                if bad.limit(1).count() > 0:
                    bad.write.mode("append").parquet(dlq_path)
                good = batch_df.where(
                    F.col("corrupt_record").isNull()
                ).drop("corrupt_record")
                embed_articles(
                    with_embed_text(preprocess(good)), backend=backend
                ).write.mode("append").parquet(output_path)

            return (
                decoded.writeStream.foreachBatch(_split_sink)
                .option("checkpointLocation", checkpoint_path)
                .outputMode("append")
                .start()
            )
        raw = decoded.where(
            F.col("corrupt_record").isNull()
        ).drop("corrupt_record")
    else:
        raise ValueError(f"source must be 'file' or 'kafka', got {source!r}")
    embedded = embed_articles(
        with_embed_text(preprocess(raw)), backend=backend
    )
    return (
        embedded.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .start()
    )


def _read_or_empty(spark: SparkSession, path: str, schema) -> DataFrame:
    # crash recovery: if the live dir is missing but the aside copy
    # from an interrupted swap exists, restore it first
    old = path + ".old"
    if not os.path.exists(path) and os.path.exists(old):
        os.replace(old, path)
    if os.path.exists(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)


def _atomic_overwrite(df: DataFrame, path: str) -> None:
    """Write-new, rename-old-aside, swap, drop-aside — there is no
    instant at which neither the old nor the new state exists, so a
    crash at any point leaves a readable table (_read_or_empty
    restores the aside copy). A Delta/Iceberg MERGE would make this a
    transactional commit; the dataflow is identical."""
    tmp = path + ".tmp"
    old = path + ".old"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.replace(path, old)
    os.replace(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


class ClusteringPipeline:
    """Streaming query #2: embedded articles -> cluster pool + serving
    tables, with the reference's count-based batching."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        batch_size: int = DEFAULT_BATCH_SIZE,
        eps: float = C.DEFAULT_EPS,
        strategy: str = "auto",
        summarize_backend=None,
        embed_dim: int | None = None,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.batch_size = batch_size
        self.eps = eps
        self.strategy = strategy
        self.summarize_backend = summarize_backend
        # known embedding width lets the LSH path skip the dim-probe
        # driver job on every micro-batch (cluster.lsh_candidate_pairs)
        self.embed_dim = embed_dim
        os.makedirs(state_dir, exist_ok=True)

    # paths
    @property
    def pool_path(self) -> str:
        return os.path.join(self.state_dir, "cluster_state")

    @property
    def clusters_path(self) -> str:
        return os.path.join(self.state_dir, "clusters")

    @property
    def articles_path(self) -> str:
        return os.path.join(self.state_dir, "cluster_articles")

    @property
    def pending_path(self) -> str:
        return os.path.join(self.state_dir, "pending")

    # state accessors -------------------------------------------------
    def pool(self) -> DataFrame:
        return _read_or_empty(self.spark, self.pool_path, CLUSTER_STATE_SCHEMA)

    def clusters(self) -> DataFrame:
        return _read_or_empty(self.spark, self.clusters_path, CLUSTERS_SCHEMA)

    def cluster_articles(self) -> DataFrame:
        return _read_or_empty(
            self.spark, self.articles_path, CLUSTER_ARTICLES_SCHEMA
        )

    def _pending_schema(self):
        return T.StructType(
            [
                T.StructField("id", T.StringType()),
                T.StructField("title", T.StringType()),
                T.StructField("summary", T.StringType()),
                T.StructField("text", T.StringType()),
                T.StructField("publication_date", T.StringType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        )

    def pending(self) -> DataFrame:
        return _read_or_empty(
            self.spark, self.pending_path, self._pending_schema()
        )

    # the foreachBatch body ------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int = 0) -> None:
        """Append to the spool; run clustering when the spool reaches
        batch_size (ST1 count trigger)."""
        incoming = batch_df.select(
            "id",
            "title",
            "summary",
            "text",
            "publication_date",
            unwrap_embedding("concat_embedding")
            .cast("array<double>")
            .alias("embedding"),
        ).dropDuplicates(["id"])  # P7 in-batch dedup
        # dedup across the spool too: foreachBatch replay after a crash
        # re-appends the same epoch, and double rows would survive the
        # pool's known-id filter (it only checks already-pooled ids)
        spooled = self.pending().unionByName(incoming).dropDuplicates(["id"])
        n = spooled.count()
        if n == 0:
            return
        if n < self.batch_size:
            _atomic_overwrite(spooled, self.pending_path)
            return
        self._run_clustering(spooled)
        _atomic_overwrite(
            self.spark.createDataFrame([], self._pending_schema()),
            self.pending_path,
        )

    def flush(self) -> None:
        """Process whatever is spooled regardless of count (end-of-
        stream / shutdown path)."""
        spooled = self.pending()
        if spooled.count() == 0:
            return
        self._run_clustering(spooled)
        _atomic_overwrite(
            self.spark.createDataFrame([], self._pending_schema()),
            self.pending_path,
        )

    def _run_clustering(self, batch: DataFrame) -> None:
        batch = batch.localCheckpoint(eager=True)
        res = C.incremental_cluster_update(
            self.pool(),
            batch.select("id", "embedding"),
            eps=self.eps,
            strategy=self.strategy,
            dim=self.embed_dim,
        )
        new_state = res["state"].localCheckpoint(eager=True)
        updates = res["updates"].localCheckpoint(eager=True)

        # serving-table merge (S9/S10/J1-J3/A1)
        clusters = CT.merge_cluster_metadata(self.clusters(), updates)
        items = CT.build_article_items(
            CT.assignments_from_updates(updates),
            batch.select("id", "title", "summary", "text", "publication_date"),
        )
        articles = CT.merge_cluster_articles(self.cluster_articles(), items)
        clusters = clusters.localCheckpoint(eager=True)
        articles = articles.localCheckpoint(eager=True)

        # ST6: summarize clusters crossing the threshold
        cand = clusters.where(
            SM.should_summarize("number_of_articles", "summary_count")
        )
        if cand.limit(1).count() > 0:
            summaries = SM.summarize_clusters(
                cand, clusters, articles, backend=self.summarize_backend
            )
            clusters = SM.apply_summary_updates(clusters, summaries)
            clusters = clusters.localCheckpoint(eager=True)

        _atomic_overwrite(new_state, self.pool_path)
        _atomic_overwrite(clusters, self.clusters_path)
        _atomic_overwrite(articles, self.articles_path)

    def compact_pool(self) -> dict:
        """Pool-maintenance sweep (C.compact_pool): merge the split
        clusters and strays that approximate per-batch candidate
        joins accumulate (a formation-time LSH miss is otherwise a
        PERMANENT split — the reference never revisits is_cluster
        rows), then repair the serving tables: absorbed clusters'
        metadata rows are deleted, their article items re-pointed to
        the surviving representative (idempotent on (PK, SK)), and
        rep rows re-counted. Run every N batches or offline; the
        pool is O(clusters), so the sweep is seconds even when the
        corpus is not. Returns {pool_before, pool_after, merged}."""
        pool = self.pool().localCheckpoint(eager=True)
        pool_before = pool.count()
        res = C.compact_pool(
            pool, eps=self.eps, strategy=self.strategy, dim=self.embed_dim
        )
        new_state = res["state"].localCheckpoint(eager=True)
        remaps = res["remaps"].localCheckpoint(eager=True)
        updates = res["updates"].localCheckpoint(eager=True)
        n_remaps = remaps.count()
        if n_remaps:
            clusters = self.clusters().join(
                F.broadcast(remaps.select(F.col("old_pk").alias("PK"))),
                "PK",
                "left_anti",
            )
            clusters = CT.merge_cluster_metadata(clusters, updates)
            articles = (
                self.cluster_articles()
                .join(
                    F.broadcast(remaps.withColumnRenamed("old_pk", "PK")),
                    "PK",
                    "left",
                )
                .withColumn("PK", F.coalesce("new_pk", "PK"))
                .drop("new_pk")
                .dropDuplicates(["PK", "SK"])
            )
            _atomic_overwrite(new_state, self.pool_path)
            _atomic_overwrite(
                clusters.localCheckpoint(eager=True), self.clusters_path
            )
            _atomic_overwrite(
                articles.localCheckpoint(eager=True), self.articles_path
            )
        return {
            "pool_before": pool_before,
            "pool_after": new_state.count(),
            "merged": n_remaps,
        }

    # streaming entrypoint -------------------------------------------
    def start(
        self,
        embedded_path: str,
        checkpoint_path: str,
        max_files_per_trigger: int | None = None,
    ):
        from ..schemas import ARTICLE_EMBEDDED_SCHEMA

        reader = self.spark.readStream.schema(ARTICLE_EMBEDDED_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", max_files_per_trigger
            )
        stream = reader.parquet(embedded_path)
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_path)
            .outputMode("update")
            .start()
        )
