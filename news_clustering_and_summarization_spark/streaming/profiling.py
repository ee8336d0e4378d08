"""Streaming grid-histogram with quantile readout: cumulative value
distribution monitoring over a stream, exactly-once under
foreachBatch crash replay — the percentile companion to the CUSUM
stream (same r07 streaming-parity push).

Bin counts are ADDITIVE, so replay protection is the established
epoch layout (CMSStream / CusumStream): each micro-batch writes its
OWN (bin, count) delta to ``bins/epoch=<id>/`` with overwrite
semantics, the queryable histogram is the bin-wise SUM across epoch
directories, and ``compact()`` folds finished epochs. State is the
GRID (value range / bin width), never the data: a quantile read is a
window over the bin table.

``quantiles()`` returns exact order statistics OF THE GRID: the
returned value is the lower edge of the bin holding the ceil(p·n)-th
sample, so the error is bounded by one bin width by construction —
the same contract a fixed-width monitoring histogram gives at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

BINS_SCHEMA = "bin long, cnt long"


class HistogramStream:
    """foreachBatch sink accumulating fixed-width value bins and
    serving rank-exact grid quantiles over the cumulative state."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        value_col: str,
        lo: float = 0.0,
        width: float = 1.0,
        n_bins: int = 1024,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.value_col = value_col
        self.lo = lo
        self.width = width
        self.n_bins = n_bins
        os.makedirs(state_dir, exist_ok=True)

    @property
    def bins_path(self) -> str:
        return os.path.join(self.state_dir, "bins")

    def _bin(self):
        return F.least(
            F.lit(self.n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col(self.value_col) - F.lit(self.lo))
                    / F.lit(self.width)
                ).cast("long"),
            ),
        )

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        delta = batch_df.groupBy(self._bin().alias("bin")).agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        delta.write.mode("overwrite").parquet(
            os.path.join(self.bins_path, f"epoch={int(epoch_id)}")
        )

    def histogram(self) -> DataFrame:
        """Cumulative histogram: bin-wise sum across epochs."""
        from . import epoch_state

        # self-heal an interrupted compaction before reading —
        # otherwise answers silently miss already-folded epochs
        # until a maintenance compact() runs (r07 review)
        epoch_state.recover_staging(self.bins_path)
        if not os.path.exists(self.bins_path):
            return self.spark.createDataFrame([], BINS_SCHEMA)
        return (
            self.spark.read.option("basePath", self.bins_path)
            .parquet(self.bins_path)
            .groupBy("bin")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )

    def quantiles(self, ps: list[float]) -> DataFrame:
        """Grid quantiles: for each p, the lower edge of the bin
        holding the ceil(p·n)-th sample — rank-exact, value error
        bounded by one bin width. The epoch directories are read
        ONCE (the n_bins-row histogram is localCheckpointed), and
        all requested ps resolve in a single conditional-min
        aggregate over it — not one pass per p (r07 review
        finding). The cumulative window runs over the bin table,
        never the data.

        Every p must satisfy 0 < p <= 1: p <= 0 would silently
        return the minimum bin and p > 1 NULL-valued rows (r08
        advisor finding) — both caller typos, so raise instead."""
        bad = [p for p in ps if not 0.0 < float(p) <= 1.0]
        if bad:
            raise ValueError(
                f"percentiles must be in (0, 1], got {bad!r}"
            )
        hist = self.histogram().localCheckpoint(eager=True)
        w = Window.orderBy("bin").rowsBetween(
            Window.unboundedPreceding, 0
        )
        cum = hist.withColumn("cum", F.sum("cnt").over(w)).crossJoin(
            F.broadcast(hist.agg(F.sum("cnt").alias("n")))
        )
        aggs = [
            F.min(
                F.when(
                    F.col("cum")
                    >= F.ceil(F.lit(float(p)) * F.col("n")).cast("long"),
                    F.col("bin"),
                )
            ).alias(f"_b{i}")
            for i, p in enumerate(ps)
        ]
        one = cum.agg(*aggs, F.max("n").alias("n"))
        qs = [
            F.struct(
                F.lit(float(p)).alias("p"),
                (
                    F.lit(self.lo) + F.col(f"_b{i}") * F.lit(self.width)
                ).alias("value"),
                F.col("n").alias("n"),
            )
            for i, p in enumerate(ps)
        ]
        return (
            one.select(F.explode(F.array(*qs)).alias("q"))
            .select("q.*")
            .where(F.col("n").isNotNull())  # empty store -> no rows
        )

    def compact(self) -> None:
        """Fold finished epochs into the base epoch via the shared
        crash-safe protocol — newest epoch excluded, write-then-swap
        with an atomic recovery manifest (streaming/epoch_state.py
        documents the full decision table)."""
        from . import epoch_state

        epoch_state.compact_store(
            self.spark,
            self.bins_path,
            lambda df: df.groupBy("bin")
            .agg(F.sum("cnt").cast("long").alias("cnt")),
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
