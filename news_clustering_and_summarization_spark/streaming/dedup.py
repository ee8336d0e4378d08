"""Streaming incremental dedup against the cumulative corpus, built
on the Bloom filter of operators/bloom.py.

Every micro-batch: probe the persisted filter (fast reject of known
keys), exact-verify only the ``maybe`` candidates against the accepted
key store, emit the novel rows, and fold their keys back into the
filter. The 100 TB history is never rescanned — per batch, work is
O(|batch|) probe + O(|candidates|) verify.

Exactly-once layout (foreachBatch is at-least-once on crash replay):

  * accepted rows land in ``out/epoch=<id>/`` — REPLACED atomically on
    replay of the same epoch, never appended;
  * the verify step reads accepted keys from every epoch EXCEPT the
    current one, so a replayed batch recomputes the same novelty set
    even when the crash happened after this epoch's output (or its
    filter merge) was written;
  * the Bloom word table may transiently include the replayed epoch's
    keys — harmless, Bloom errors are one-sided: extra ``maybe``
    candidates go to the exact verify and come back novel;
  * the filter merge is a bitwise OR — idempotent under replay.

State files are plain parquet managed with the same atomic-swap
discipline as the clustering pipeline (pipeline._atomic_overwrite); a
Delta/Iceberg MERGE would make them transactional commits with the
identical dataflow.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import bloom as B
from .pipeline import _atomic_overwrite, _read_or_empty

WORDS_SCHEMA = "word_idx long, word long"


class BloomDedupStream:
    """foreachBatch sink deduplicating a stream against all history.

    ``n_expected`` sizes the filter for the corpus's expected lifetime
    cardinality (overestimating only lowers the false-positive rate —
    it does NOT break correctness, which the exact verify guarantees
    regardless).
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        key_col: str,
        n_expected: int = 1_000_000,
        fpp: float = 0.01,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.key_col = key_col
        self.m_bits, self.k = B.bloom_params(n_expected, fpp)
        os.makedirs(state_dir, exist_ok=True)

    @property
    def words_path(self) -> str:
        return os.path.join(self.state_dir, "bloom_words")

    @property
    def out_path(self) -> str:
        return os.path.join(self.state_dir, "accepted")

    def _accepted_keys_before(self, epoch_id: int) -> DataFrame:
        """Keys accepted in every epoch but ``epoch_id`` — the replay
        guard: a redelivered batch must not see its own prior output."""
        if not os.path.exists(self.out_path):
            return self.spark.createDataFrame([], f"{self.key_col} string")
        return (
            self.spark.read.option("basePath", self.out_path)
            .parquet(self.out_path)
            .where(F.col("epoch") != epoch_id)
            .select(self.key_col)
        )

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        key = self.key_col
        batch = batch_df.dropDuplicates([key])
        words = _read_or_empty(self.spark, self.words_path, WORDS_SCHEMA)
        prior = self._accepted_keys_before(epoch_id)
        probed = B.bloom_probe(batch, key, words, self.m_bits, self.k)
        novel = (
            probed.where(~F.col("bloom_maybe"))
            .drop("bloom_maybe")
            .unionByName(
                probed.where(F.col("bloom_maybe"))
                .drop("bloom_maybe")
                .join(prior, key, "left_anti")
            )
            # materialize BEFORE state files are swapped underneath
            .localCheckpoint(eager=True)
        )
        # 1. output, keyed by epoch: replay replaces, never duplicates.
        # epoch lives in the directory name only — reading with
        # basePath re-infers it as a partition column.
        novel.write.mode("overwrite").parquet(
            os.path.join(self.out_path, f"epoch={int(epoch_id)}")
        )
        # 2. fold novel keys into the filter (OR — idempotent)
        merged = B.bloom_merge(
            words, B.bloom_build(novel, key, self.m_bits, self.k)
        )
        _atomic_overwrite(merged, self.words_path)

    def start(self, stream_df: DataFrame, checkpoint: str):
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
            .start()
        )

    def accepted(self) -> DataFrame:
        """All accepted (novel-at-arrival) rows across epochs."""
        if not os.path.exists(self.out_path):
            return self.spark.createDataFrame([], f"{self.key_col} string")
        return self.spark.read.option("basePath", self.out_path).parquet(
            self.out_path
        )
