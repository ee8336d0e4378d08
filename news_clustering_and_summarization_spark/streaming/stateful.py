"""Per-key stateful streaming operators (applyInPandasWithState).

The global cluster pool deliberately lives in ``foreachBatch``
(SURVEY §2.7 ST2 — the state is one shared graph, not keyed). But two
pieces of the reference ARE naturally per-key, and for those Spark's
keyed-state operator is the idiomatic, horizontally-scalable home:
state is sharded by key across executors, checkpointed with the
query, and never collected anywhere.

* Cross-batch first-seen dedup (ST4). The reference dedups only
  within a batch (process_records.py:77-83) and accepts duplicate
  work on SQS redelivery. Keyed state keyed by article id upgrades
  that to exactly-once emission across the whole stream for the
  price of one boolean per key (TTL-bounded).

* Summarize trigger gate (ST6, trigger_sfn.py:45-55). The reference
  keeps ``summary_count`` on the DynamoDB metadata item and races
  concurrent Lambda invocations for it; here it is per-cluster
  operator state: emit a summarize command when
  ``n > T*(summary_count+1) and (n < 3T or summary_count == 0)``,
  then bump the count — serialized per key by construction.

At 100 TB both scale with *keys held in state*, not corpus bytes:
dedup state is bounded by the TTL horizon, gate state by the number
of live clusters (already collapsed by the pool invariant).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Reference constants: threshold T (iac/roots/main/lambda.tf:138),
# hard cap 3T (trigger_sfn.py:49-55).
SUMMARIZE_THRESHOLD = 5
SUMMARIZE_CAP_FACTOR = 3


def streaming_first_seen(
    df: DataFrame,
    id_col: str = "id",
    order_col: str | None = None,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Emit each key's first-ever row across all micro-batches.

    ``order_col`` breaks ties within the first batch a key appears in
    (arrival order inside a batch is not deterministic under
    repartition). ``ttl_minutes`` bounds state: after that long
    without seeing a key again its marker is dropped — the horizon
    within which redelivery is suppressed (processing-time TTL; the
    reference's SQS redelivery window is minutes, so a small TTL
    covers it with O(live keys) state).
    """
    out_schema = df.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes
        else GroupStateTimeout.NoTimeout
    )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        already = state.exists
        if ttl_minutes:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if already:
            # Not error suppression: applyInPandasWithState requires
            # the input-batch iterator to be fully consumed before the
            # function returns, even when the batches are ignored.
            for _ in pdfs:
                pass
            return
        first = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = (
                pdf.sort_values(order_col).iloc[[0]]
                if order_col
                else pdf.iloc[[0]]
            )
            if first is None:
                first = cand
            elif order_col is not None:
                first = (
                    pd.concat([first, cand])
                    .sort_values(order_col)
                    .iloc[[0]]
                )
        state.update((True,))
        if first is not None:
            yield first

    return df.groupBy(id_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


def streaming_summarize_gate(
    updates: DataFrame,
    cluster_col: str = "PK",
    count_col: str = "number_of_articles",
    threshold: int = SUMMARIZE_THRESHOLD,
    cap_factor: int = SUMMARIZE_CAP_FACTOR,
) -> DataFrame:
    """ST6 as a keyed-state operator over the cluster-updates stream.

    Input rows: (cluster_col, count_col) — one per cluster growth
    event. Output rows: (cluster_col, count_col, summary_count) — one
    per *fired* trigger, where summary_count is the value BEFORE the
    bump (what the prompt assembly reads, summarization.py:130-135).

    Within a micro-batch only the largest count is evaluated (the
    reference processes DynamoDB stream records one at a time but the
    gate is monotone in n, so coalescing to the max fires iff any
    individual event would have — and at most once per batch, which
    is the dedup the reference approximates with its cap clause).
    """
    out_schema = T.StructType(
        [
            T.StructField(cluster_col, T.StringType()),
            T.StructField(count_col, T.LongType()),
            T.StructField("summary_count", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("summary_count", T.LongType())]
    )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            m = int(pdf[count_col].max())
            n = m if n is None else max(n, m)
        if n is None:
            return
        (sc,) = state.get if state.exists else (0,)
        fire = n > threshold * (sc + 1) and (
            n < cap_factor * threshold or sc == 0
        )
        if fire:
            yield pd.DataFrame(
                {
                    cluster_col: [key[0]],
                    count_col: [n],
                    "summary_count": [sc],
                }
            )
            state.update((sc + 1,))

    return updates.groupBy(cluster_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )
