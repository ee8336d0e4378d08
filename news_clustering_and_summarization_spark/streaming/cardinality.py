"""Streaming HyperLogLog: cumulative distinct counting over a
stream, exactly-once under foreachBatch crash replay.

Unlike the CMS (streaming/frequent.py), HLL merge is MAX — idempotent
and commutative — so replay safety needs no epoch bookkeeping at all
in principle; a replayed batch max-merges to the same registers. The
epoch layout is kept anyway for operational symmetry (overwrite per
epoch, compact when directories pile up): it makes the state
browsable per batch and lets `compact()` fold history exactly like
the CMS and dedup streams.

State never grows with the data: m registers per group per epoch,
folded to m on compaction — distinct-counting 100 TB of stream
history in kilobytes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cardinality import hll_build, hll_estimate

REGS_SCHEMA = "bucket long, r int"


class HLLStream:
    """foreachBatch sink accumulating HLL registers of a value
    stream. Input rows carry one value per row in ``value_col``."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        value_col: str,
        m: int = 1024,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.value_col = value_col
        self.m = m
        os.makedirs(state_dir, exist_ok=True)

    @property
    def regs_path(self) -> str:
        return os.path.join(self.state_dir, "regs")

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        regs = hll_build(batch_df, self.value_col, self.m)
        # overwrite-per-epoch: replaying an epoch replaces its file;
        # max-merge would tolerate duplication anyway (idempotent)
        regs.write.mode("overwrite").parquet(
            os.path.join(self.regs_path, f"epoch={int(epoch_id)}")
        )

    def registers(self) -> DataFrame:
        """Cumulative registers: bucket-wise max across epochs."""
        from . import epoch_state

        # self-heal an interrupted compaction before reading —
        # otherwise answers silently miss already-folded epochs
        # until a maintenance compact() runs (r07 review)
        epoch_state.recover_staging(self.regs_path)
        if not os.path.exists(self.regs_path):
            return self.spark.createDataFrame([], REGS_SCHEMA)
        return (
            self.spark.read.option("basePath", self.regs_path)
            .parquet(self.regs_path)
            .groupBy("bucket")
            .agg(F.max("r").alias("r"))
        )

    def estimate(self) -> float:
        """Current distinct-count estimate over everything seen."""
        row = hll_estimate(self.registers(), self.m).first()
        return 0.0 if row is None else float(row["hll_estimate"])

    def compact(self) -> None:
        """Fold finished epochs into the base epoch via the shared
        crash-safe protocol — newest epoch excluded, write-then-swap
        with an atomic recovery manifest (streaming/epoch_state.py
        documents the full decision table)."""
        from . import epoch_state

        epoch_state.compact_store(
            self.spark,
            self.regs_path,
            lambda df: df.groupBy("bucket")
            .agg(F.max("r").alias("r")),
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
