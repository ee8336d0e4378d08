"""Streaming PSI drift monitoring (r08 verdict item 5): the daily
production guardrail — "has the live distribution shifted off the
reference?" — as a foreachBatch accumulator, exactly-once under
crash replay.

The split of work mirrors how PSI is operated in practice: the
REFERENCE distribution is fixed at deployment time, so its decile
edges are computed ONCE (operators/evaluation.psi_drift's
order-statistic prefix-sum shape, restricted to reference rows) and
persisted as a 1-row parquet in the state dir; each micro-batch then
only bins its CURRENT rows against the broadcast edges and writes a
(bucket, cur_n) delta — kilobytes of state per epoch, nothing
corpus-scale ever streams twice. Bin-count merges are ADDITIVE, so
replay protection is the shared epoch layout (overwrite-per-epoch,
cell-wise sum across epochs, crash-safe compaction via
streaming/epoch_state.py).

``detect()`` feeds the accumulated (bucket, ref_n, cur_n) table to
operators/evaluation.psi_from_bucket_counts — the IDENTICAL tail the
batch operator runs — so stream == batch holds by construction: a
batch psi_drift over (reference UNION everything-streamed) and this
stream's detect() execute the same expressions over the same bucket
counts. (Guaranteed because reference deciles depend only on the
reference slice — edge_j = min v with ref-cumulative >= ceil(j·n/k)
is a reference order statistic — verified by
tests/test_streaming_drift.py's stream-vs-batch equality.)

The reference must be NON-EMPTY: batch psi_drift pins a documented
degenerate behavior for an empty reference (edges collapse to the
corpus min, which depends on current rows), and a stream cannot
reproduce a current-dependent edge without re-binning history —
so PsiStream refuses the degenerate setup instead.

State never grows with data volume: n_buckets rows per epoch.

``KsStream`` (below) is the rank-based companion on the same layout:
frozen reference per-VALUE counts, per-epoch current value-count
deltas (bounded by the integer value grid, not stream volume), and a
detect() that runs the batch operator's factored
ks_from_value_counts tail — the same shared-code equality guarantee.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.evaluation import psi_from_bucket_counts

BINS_SCHEMA = "bucket long, cur_n long"


class PsiStream:
    """foreachBatch sink accumulating per-bucket counts of a value
    stream against fixed reference decile edges."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        reference: DataFrame,
        value_col: str,
        n_buckets: int = 10,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.value_col = value_col
        self.n_buckets = n_buckets
        os.makedirs(state_dir, exist_ok=True)
        # completeness is judged by the LAST artifact _init_reference
        # writes (ref_counts), not the first — a crash between the
        # edges write and the counts write must re-init on the next
        # construction, not brick detect() forever (r08 review)
        if not os.path.exists(self._ref_counts_path):
            self._init_reference(reference)

    @property
    def _edges_path(self) -> str:
        return os.path.join(self.state_dir, "ref_edges")

    @property
    def _ref_counts_path(self) -> str:
        return os.path.join(self.state_dir, "ref_counts")

    @property
    def bins_path(self) -> str:
        return os.path.join(self.state_dir, "bins")

    def _init_reference(self, reference: DataFrame) -> None:
        """Compute and persist the reference decile edges (the batch
        operator's conditional-min order statistics over per-value
        counts — one aggregate row, no collect of data rows) and the
        reference's own bucket counts."""
        k = self.n_buckets
        per_v = (
            reference.select(
                F.col(self.value_col).cast("long").alias("v")
            )
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        if per_v.isEmpty():
            raise ValueError(
                "PsiStream requires a non-empty reference: empty-"
                "reference deciles are current-dependent (see batch "
                "psi_drift's pinned degenerate case) and cannot be "
                "frozen as stream state"
            )
        from pyspark.sql import Window

        w = Window.orderBy("v").rowsBetween(
            Window.unboundedPreceding, 0
        )
        cum = per_v.select(
            "v", F.sum("c").over(w).alias("ca")
        ).crossJoin(
            F.broadcast(per_v.agg(F.sum("c").cast("long").alias("n_a")))
        )
        from ..operators.evaluation import psi_edge_aggs

        edges = cum.groupBy().agg(*psi_edge_aggs(k))
        edges.coalesce(1).write.mode("overwrite").parquet(
            self._edges_path
        )
        ref_binned = self._bin(reference).withColumnRenamed(
            "cur_n", "ref_n"
        )
        ref_binned.coalesce(1).write.mode("overwrite").parquet(
            self._ref_counts_path
        )

    def _bin(self, df: DataFrame) -> DataFrame:
        """(bucket, cur_n) counts of ``df`` under the frozen edges —
        the batch operator's exact bucket expression."""
        from ..operators.evaluation import psi_bucket_col

        edges = self.spark.read.parquet(self._edges_path)
        bucket = psi_bucket_col(self.n_buckets)
        return (
            df.select(F.col(self.value_col).cast("long").alias("v"))
            .crossJoin(F.broadcast(edges))
            .select(bucket.cast("long").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("cur_n"))
        )

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        # overwrite-per-epoch: crash replay REPLACES this epoch's
        # bucket deltas, never adds them twice
        self._bin(batch_df).write.mode("overwrite").parquet(
            os.path.join(self.bins_path, f"epoch={int(epoch_id)}")
        )

    def current_counts(self) -> DataFrame:
        from . import epoch_state

        epoch_state.recover_staging(self.bins_path)
        if not os.path.exists(self.bins_path):
            return self.spark.createDataFrame([], BINS_SCHEMA)
        return (
            self.spark.read.option("basePath", self.bins_path)
            .parquet(self.bins_path)
            .groupBy("bucket")
            .agg(F.sum("cur_n").cast("long").alias("cur_n"))
        )

    def detect(self) -> DataFrame:
        """The full PSI table over everything streamed so far — the
        batch operator's exact output contract:
        (bucket, ref_n, cur_n, term_q, psi_q)."""
        ref = self.spark.read.parquet(self._ref_counts_path)
        per_bucket_raw = (
            ref.join(self.current_counts(), "bucket", "full")
            .select(
                "bucket",
                F.coalesce("ref_n", F.lit(0)).cast("long").alias("ref_n"),
                F.coalesce("cur_n", F.lit(0)).cast("long").alias("cur_n"),
            )
        )
        return psi_from_bucket_counts(
            self.spark, per_bucket_raw, self.n_buckets
        )

    def compact(self) -> None:
        from . import epoch_state

        epoch_state.compact_store(
            self.spark,
            self.bins_path,
            lambda df: df.groupBy("bucket").agg(
                F.sum("cur_n").cast("long").alias("cur_n")
            ),
        )

    def start(self, stream_df: DataFrame, checkpoint: str):
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
            .start()
        )


KS_SCHEMA = "v long, b_c long"


class KsStream:
    """Streaming two-sample Kolmogorov-Smirnov drift (r08): the
    rank-based companion of PsiStream on the same crash-safe layout.
    The REFERENCE side's per-value counts are computed once and
    frozen; each micro-batch writes its own per-value count delta
    (overwrite-per-epoch, replay-idempotent); ``detect()`` feeds the
    accumulated (v, a_c, b_c) table to operators/evaluation.
    ks_from_value_counts — the IDENTICAL two-phase prefix-sum tail
    the batch operator runs, so stream == batch by shared code.

    State is bounded by the VALUE GRID's cardinality (``value_col``
    must be an integer grid, the batch operator's contract), not by
    stream volume — quantize continuous metrics upstream exactly as
    for batch KS."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        reference: DataFrame,
        value_col: str,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.value_col = value_col
        os.makedirs(state_dir, exist_ok=True)
        if not os.path.exists(self._ref_counts_path):
            (
                reference.select(
                    F.col(value_col).cast("long").alias("v")
                )
                .groupBy("v")
                .agg(F.count(F.lit(1)).cast("long").alias("a_c"))
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(self._ref_counts_path)
            )

    @property
    def _ref_counts_path(self) -> str:
        return os.path.join(self.state_dir, "ref_value_counts")

    @property
    def bins_path(self) -> str:
        return os.path.join(self.state_dir, "value_counts")

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.select(
                F.col(self.value_col).cast("long").alias("v")
            )
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("b_c"))
            .write.mode("overwrite")
            .parquet(os.path.join(self.bins_path, f"epoch={int(epoch_id)}"))
        )

    def current_counts(self) -> DataFrame:
        from . import epoch_state

        epoch_state.recover_staging(self.bins_path)
        if not os.path.exists(self.bins_path):
            return self.spark.createDataFrame([], KS_SCHEMA)
        return (
            self.spark.read.option("basePath", self.bins_path)
            .parquet(self.bins_path)
            .groupBy("v")
            .agg(F.sum("b_c").cast("long").alias("b_c"))
        )

    def detect(self) -> DataFrame:
        """One row (n_a, n_b, d_num, d_q) — the batch ks_two_sample
        output contract over reference vs everything streamed."""
        from ..operators.evaluation import ks_from_value_counts

        ref = self.spark.read.parquet(self._ref_counts_path)
        per_v = (
            ref.join(self.current_counts(), "v", "full")
            .select(
                "v",
                F.coalesce("a_c", F.lit(0)).cast("long").alias("a_c"),
                F.coalesce("b_c", F.lit(0)).cast("long").alias("b_c"),
            )
        )
        return ks_from_value_counts(per_v)

    def compact(self) -> None:
        from . import epoch_state

        epoch_state.compact_store(
            self.spark,
            self.bins_path,
            lambda df: df.groupBy("v").agg(
                F.sum("b_c").cast("long").alias("b_c")
            ),
        )

    def start(self, stream_df: DataFrame, checkpoint: str):
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
            .start()
        )
