"""Streaming count-min sketch: cumulative token-frequency tracking
over a stream, exactly-once under foreachBatch crash replay.

Counter merges are ADDITIVE, so the Bloom stream's "OR is idempotent"
trick does not apply — a replayed batch would double-count. The epoch
layout solves it the same way the dedup stream's output does: each
micro-batch writes its OWN d×w sketch to ``cells/epoch=<id>/`` with
overwrite semantics (replaying epoch N replaces epoch N, never adds),
and the queryable cumulative sketch is the cell-wise SUM across epoch
directories — associative, so the read is one tiny groupBy over
(n_epochs × d × w) rows. ``compact()`` folds finished epochs into a
single base epoch when the directory count grows (the same
maintenance cadence as small-file compaction).

At 100 TB of stream history the state never grows with the data:
d×w counters per epoch, epochs compacted away — this is the whole
point of sketching the frequency table instead of materializing it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.frequent import CMS_SEEDS, cms_build, cms_estimate

CELLS_SCHEMA = "row int, bucket long, cnt long"


class CMSStream:
    """foreachBatch sink accumulating a count-min sketch of a token
    stream. Input rows must carry one token instance per row in
    ``token_col`` (explode upstream)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        token_col: str,
        width: int = 8192,
        seeds: tuple[int, ...] = CMS_SEEDS,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.token_col = token_col
        self.width = width
        self.seeds = seeds
        os.makedirs(state_dir, exist_ok=True)

    @property
    def cells_path(self) -> str:
        return os.path.join(self.state_dir, "cells")

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        sketch = cms_build(
            batch_df, self.token_col, self.width, seeds=self.seeds
        )
        # overwrite-per-epoch: crash replay of the same epoch REPLACES
        # this directory, so counts are never added twice
        sketch.write.mode("overwrite").parquet(
            os.path.join(self.cells_path, f"epoch={int(epoch_id)}")
        )

    def sketch(self) -> DataFrame:
        """Cumulative sketch: cell-wise sum across epochs."""
        from . import epoch_state

        # self-heal an interrupted compaction before reading —
        # otherwise answers silently miss already-folded epochs
        # until a maintenance compact() runs (r07 review)
        epoch_state.recover_staging(self.cells_path)
        if not os.path.exists(self.cells_path):
            return self.spark.createDataFrame([], CELLS_SCHEMA)
        return (
            self.spark.read.option("basePath", self.cells_path)
            .parquet(self.cells_path)
            .groupBy("row", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )

    def estimate(self, queries: DataFrame, token_col: str) -> DataFrame:
        return cms_estimate(
            queries, token_col, self.sketch(), self.width, seeds=self.seeds
        )

    def compact(self) -> None:
        """Fold finished epochs into the base epoch via the shared
        crash-safe protocol — newest epoch excluded, write-then-swap
        with an atomic recovery manifest (streaming/epoch_state.py
        documents the full decision table)."""
        from . import epoch_state

        epoch_state.compact_store(
            self.spark,
            self.cells_path,
            lambda df: df.groupBy("row", "bucket")
            .agg(F.sum("cnt").alias("cnt")),
        )

    def start(self, stream_df: DataFrame, checkpoint: str):
        from . import epoch_state

        # epoch ids come from this checkpoint's batch numbering; a
        # different checkpoint would restart them at 0 and clobber
        # existing epoch state (r09 advisor finding)
        epoch_state.freeze_checkpoint(self.state_dir, checkpoint)
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
            .start()
        )
