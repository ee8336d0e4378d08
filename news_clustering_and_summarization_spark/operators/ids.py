"""Stable surrogate-id assignment at scale.

``row_number() OVER (ORDER BY key)`` funnels the whole table through
ONE partition — the canonical scale cliff. The scalable shape is
range-partition + in-partition sort + partition-size offsets: every
partition numbers its own rows independently, and a tiny driver-side
cumulative sum of partition sizes (one long per partition) turns local
indexes into the exact global rank. Two light jobs, no global sort,
identical output to the window formulation for any total order —
which is why the `stable_ids` catalog query can be oracle-gated
against DuckDB's ``row_number()``.

``monotonically_increasing_id`` is NOT this: its values depend on the
physical partitioning (gaps, non-reproducible), which is useless for
content-addressed pipelines that must reproduce ids across runs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def stable_ids(
    df: DataFrame,
    order_by: list[str],
    id_col: str = "stable_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a dense 0-based global rank by ``order_by`` (must be a
    total order — include a unique key) without a global sort.

    Job 1 counts rows per range partition; job 2 numbers rows with the
    broadcast offsets. Output equals
    ``row_number() OVER (ORDER BY order_by) - 1``.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *order_by).sortWithinPartitions(
        *order_by
    )
    # PIN one materialization of the range partitioning: the size
    # job and the numbering job would otherwise evaluate
    # repartitionByRange twice, and its boundaries are not guaranteed
    # identical across executions (boundary sampling + AQE) — the
    # sf0.1 sweep caught offsets shifted by a few rows between the
    # two jobs (r09: 4402/5000 ids off by a per-block constant).
    # The checkpoint also saves the full recompute of the input scan.
    parted = parted.localCheckpoint(eager=True)
    with_pid = parted.withColumn("_pid", F.spark_partition_id())
    sizes = {
        r["_pid"]: r["cnt"]
        for r in with_pid.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    schema = StructType(
        list(with_pid.schema.fields) + [StructField(id_col, LongType())]
    )

    def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # mapInPandas preserves in-partition order; all batches of one
        # call belong to one partition, so one running index suffices
        i = None
        for pdf in batches:
            if i is None:
                i = offsets.get(int(pdf["_pid"].iloc[0]), 0) if len(pdf) else 0
            pdf[id_col] = range(i, i + len(pdf))
            i += len(pdf)
            yield pdf

    return with_pid.mapInPandas(number, schema=schema).drop("_pid")
