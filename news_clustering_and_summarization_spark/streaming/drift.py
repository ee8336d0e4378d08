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


def _parquet_committed(path: str) -> bool:
    """True iff ``path`` holds a COMMITTED parquet write: Spark drops
    a _SUCCESS marker on job commit, so a directory that exists
    without one is a crashed half-write that must be rebuilt, not
    trusted (r08 second-review finding — bare existence checks brick
    the store after an init crash)."""
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _read_summed(spark, path: str, key_col: str, cnt_col: str, schema: str):
    """Shared read side of the per-epoch additive stores: self-heal
    an interrupted compaction, then cell-wise sum across epoch
    directories (empty store → empty frame)."""
    from . import epoch_state

    epoch_state.recover_staging(path)
    if not os.path.exists(path):
        return spark.createDataFrame([], schema)
    return (
        spark.read.option("basePath", path)
        .parquet(path)
        .groupBy(key_col)
        .agg(F.sum(cnt_col).cast("long").alias(cnt_col))
    )


def _compact_summed(spark, path: str, key_col: str, cnt_col: str) -> None:
    """Shared maintenance side: fold finished epochs with the same
    cell-wise sum, via the crash-safe epoch_state protocol."""
    from . import epoch_state

    epoch_state.compact_store(
        spark,
        path,
        lambda df: df.groupBy(key_col).agg(
            F.sum(cnt_col).cast("long").alias(cnt_col)
        ),
    )


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
        # construction, not brick detect() forever (r08 review) —
        # and by its COMMIT marker, not bare directory existence
        # (a crash mid-write leaves a dir without _SUCCESS)
        if not _parquet_committed(self._ref_counts_path):
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
        return _read_summed(
            self.spark, self.bins_path, "bucket", "cur_n", BINS_SCHEMA
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
        _compact_summed(self.spark, self.bins_path, "bucket", "cur_n")

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
        # commit-marker check, not bare existence — see PsiStream
        # (r08 second-review finding). An EMPTY reference is allowed
        # here, unlike PSI: batch KS pins d_q = NULL for a one-sided
        # sample, and the frozen empty side reproduces exactly that.
        if not _parquet_committed(self._ref_counts_path):
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
        return _read_summed(
            self.spark, self.bins_path, "v", "b_c", KS_SCHEMA
        )

    def detect(self) -> DataFrame:
        """One row (n_a, n_b, d_num, d_q) — the batch ks_two_sample
        output contract over reference vs everything streamed."""
        from ..operators.evaluation import ks_from_value_counts

        # union-then-groupBy, NOT a full outer join on v: the batch
        # operator's groupBy merges NULL values into ONE per_v row,
        # while a join on v would split them (NULL keys never match)
        # into two tying rows whose window order — and therefore the
        # running cumulative and d_num — is nondeterministic (r08
        # second-review finding)
        ref = self.spark.read.parquet(self._ref_counts_path)
        per_v = (
            ref.select("v", "a_c", F.lit(0).cast("long").alias("b_c"))
            .unionByName(
                self.current_counts().select(
                    "v", F.lit(0).cast("long").alias("a_c"), "b_c"
                )
            )
            .groupBy("v")
            .agg(
                F.sum("a_c").cast("long").alias("a_c"),
                F.sum("b_c").cast("long").alias("b_c"),
            )
        )
        return ks_from_value_counts(per_v)

    def compact(self) -> None:
        _compact_summed(self.spark, self.bins_path, "v", "b_c")

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
