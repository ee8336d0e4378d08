"""Streaming CUSUM change-point detection: cumulative per-series
drift monitoring over an event stream, exactly-once under
foreachBatch crash replay (r07 verdict item 6 — streaming parity for
the r6 analytics family).

Daily count merges are ADDITIVE (like the CMS stream's counters), so
replay protection is the same epoch layout: each micro-batch writes
its OWN (series, day, count) delta table to ``daily/epoch=<id>/``
with overwrite semantics — replaying epoch N replaces epoch N, never
adds — and the queryable daily table is the cell-wise SUM across
epoch directories. ``detect()`` then runs operators/temporal.
cusum_from_daily — the exact closed form the batch operator uses
(s_i = p_i − min(0, running-min p), all-integer, k = series mean) —
over that summed table, so stream == batch is true by construction:
both paths execute the same plan over the same daily counts.

State never grows with data volume: one row per (series, day) per
epoch, epochs folded by ``compact()`` — the calendar dimension, not
the corpus, bounds it. At 100 TB of stream history the detector's
working set is (series × days) rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import cusum_from_daily

DAILY_SCHEMA = "g string, d date, x long"


class CusumStream:
    """foreachBatch sink accumulating zero-fill-ready daily counts
    per series and serving CUSUM alarms over the cumulative state."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        type_col: str = "event_type",
        ts_col: str = "ts",
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.type_col = type_col
        self.ts_col = ts_col
        os.makedirs(state_dir, exist_ok=True)

    @property
    def daily_path(self) -> str:
        return os.path.join(self.state_dir, "daily")

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        delta = batch_df.groupBy(
            F.col(self.type_col).alias("g"),
            F.to_date(self.ts_col).alias("d"),
        ).agg(F.count(F.lit(1)).cast("long").alias("x"))
        # overwrite-per-epoch: crash replay of the same epoch REPLACES
        # this directory, so a day's count is never added twice
        delta.write.mode("overwrite").parquet(
            os.path.join(self.daily_path, f"epoch={int(epoch_id)}")
        )

    def daily(self) -> DataFrame:
        """Cumulative daily counts: cell-wise sum across epochs."""
        from . import epoch_state

        # self-heal an interrupted compaction before reading —
        # otherwise answers silently miss already-folded epochs
        # until a maintenance compact() runs (r07 review)
        epoch_state.recover_staging(self.daily_path)
        if not os.path.exists(self.daily_path):
            return self.spark.createDataFrame([], DAILY_SCHEMA)
        return (
            self.spark.read.option("basePath", self.daily_path)
            .parquet(self.daily_path)
            .groupBy("g", "d")
            .agg(F.sum("x").cast("long").alias("x"))
        )

    def detect(self, alarm_mult: int = 3) -> DataFrame:
        """CUSUM table over everything streamed so far — the same
        closed form, plan and output contract as the batch
        cusum_daily over the union of all events."""
        return cusum_from_daily(
            self.daily(), type_col=self.type_col, alarm_mult=alarm_mult
        )

    def compact(self) -> None:
        """Fold finished epochs into the base epoch via the shared
        crash-safe protocol — newest epoch excluded, write-then-swap
        with an atomic recovery manifest (streaming/epoch_state.py
        documents the full decision table)."""
        from . import epoch_state

        epoch_state.compact_store(
            self.spark,
            self.daily_path,
            lambda df: df.groupBy("g", "d")
            .agg(F.sum("x").cast("long").alias("x")),
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
