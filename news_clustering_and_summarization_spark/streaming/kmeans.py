"""Streaming mini-batch k-means: cluster a vector stream with
replay-safe additive centroid state.

The batch operator (operators/kmeans.py) re-scans the corpus per
iteration; a stream cannot. Mini-batch k-means is the standing
answer: each micro-batch is assigned against the CURRENT centroids,
and its per-cluster (count, sum-vector) contributions fold into the
state — the running centroid is total-sum / total-count, i.e. the
mean over every point ever assigned to the cluster, weighted by the
centroids in force when each batch arrived (the classic
Lloyd-with-momentum behavior of streaming k-means).

Contributions are ADDITIVE, so the state uses the same epoch layout
as the streaming count-min sketch (streaming/frequent.py): each epoch
writes its OWN (cluster, n, sum[dim]) rows to ``updates/epoch=<id>/``
with overwrite semantics, and the effective centroids are the
epoch-sum — crash replay of an epoch replaces its contribution
instead of double-counting. Reading centroids for epoch N excludes
epoch N itself (the dedup stream's replay guard,
streaming/dedup.py:_accepted_keys_before), so a replayed batch
re-assigns against exactly the state it saw the first time — byte-
identical output, idempotent state.

Init: the first k rows (by id) of the first batch — the batch
operator's determinism contract carried over.

State is k rows × (dim+2) values per epoch — independent of stream
volume; compact by summing epochs, same maintenance as the CMS.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.kmeans import assign_to_centroids

__all__ = ["KMeansStream"]


class KMeansStream:
    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str,
        vec_col: str,
        k: int,
        dim: int,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.id_col = id_col
        self.vec_col = vec_col
        self.k = k
        self.dim = dim
        os.makedirs(state_dir, exist_ok=True)

    @property
    def updates_path(self) -> str:
        return os.path.join(self.state_dir, "updates")

    @property
    def out_path(self) -> str:
        return os.path.join(self.state_dir, "assigned")

    def _centroids_before(self, epoch_id: int | None):
        """Fold all epoch contributions EXCEPT ``epoch_id`` into
        (cluster_id, centroid) pairs. Driver-side fold over
        n_epochs × k tiny rows; deterministic (sorted by epoch,
        cluster)."""
        if not os.path.exists(self.updates_path):
            return None
        df = self.spark.read.option("basePath", self.updates_path).parquet(
            self.updates_path
        )
        if epoch_id is not None:
            df = df.where(F.col("epoch") != epoch_id)
        rows = df.select("epoch", "cluster", "n", "s").collect()
        if not rows:
            return None
        acc: dict[int, tuple[int, list[float]]] = {}
        for r in sorted(rows, key=lambda r: (r["epoch"], r["cluster"])):
            n0, s0 = acc.get(r["cluster"], (0, [0.0] * self.dim))
            acc[r["cluster"]] = (
                n0 + r["n"],
                [a + b for a, b in zip(s0, r["s"])],
            )
        return sorted(
            (cid, [x / n for x in s]) for cid, (n, s) in acc.items() if n > 0
        )

    def centroids(self):
        """Current effective centroids (all epochs)."""
        return self._centroids_before(None)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        cents = self._centroids_before(epoch_id)
        if cents is None:
            init = (
                batch_df.select(self.id_col, self.vec_col)
                .orderBy(self.id_col)
                .limit(self.k)
                .collect()
            )
            cents = [(i, list(r[self.vec_col])) for i, r in enumerate(init)]
        assigned = assign_to_centroids(batch_df, self.vec_col, cents)
        contrib = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"),
            F.array(
                *[
                    F.sum(F.element_at(F.col(self.vec_col), i + 1))
                    for i in range(self.dim)
                ]
            ).alias("s"),
        )
        # overwrite-per-epoch: replay replaces this epoch's state
        # contribution and its output partition, never duplicates
        contrib.write.mode("overwrite").parquet(
            os.path.join(self.updates_path, f"epoch={int(epoch_id)}")
        )
        assigned.select(self.id_col, "cluster").write.mode(
            "overwrite"
        ).parquet(os.path.join(self.out_path, f"epoch={int(epoch_id)}"))

    def assigned(self) -> DataFrame:
        if not os.path.exists(self.out_path):
            return self.spark.createDataFrame(
                [], f"{self.id_col} long, cluster int, epoch int"
            )
        return self.spark.read.option("basePath", self.out_path).parquet(
            self.out_path
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
