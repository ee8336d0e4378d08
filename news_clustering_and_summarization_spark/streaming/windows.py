"""Event-time windowed aggregation with watermarks.

The reference has NO event-time processing — arrival order wins and
late data is clustered whenever it shows up (SURVEY §2.7 ST3, absence
at process_records.py:469-494). For an engine that must also serve
training-data pipelines, event-time analytics (article volume per
source per hour, late-arrival tolerance) is table stakes, so this
module adds the canonical Structured Streaming shape:

    withWatermark(ts, delay) -> groupBy(window(ts, size, slide), keys)

State stays bounded: Spark drops window state once the watermark
passes the window end, and append-mode sinks emit each window exactly
once, finalized. Late rows beyond the watermark are discarded — the
deliberate, bounded-memory trade the reference never makes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    df: DataFrame,
    ts_col: str,
    window_size: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is given) event-time
    window aggregation. Works identically on a streaming or a batch
    DataFrame; on a stream the watermark bounds state and late data.

    Output: window_start, window_end, *keys, n (+ any extra ``aggs``).
    """
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window_size, slide or window_size)
    out = df.groupBy(win.alias("w"), *(keys or [])).agg(
        F.count("*").alias("n"), *(aggs or [])
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def session_counts(
    df: DataFrame,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Native session windows: events from the same key belong to one
    session while each arrives within ``gap`` of the session's end
    (Spark merges on event_time < session_end, i.e. a new session
    starts at diff >= gap). Streaming-ready — with a watermark the
    session state is finalized and dropped once no earlier event can
    arrive; in batch mode it is a plain aggregation.

    Output: *keys, session_start, session_end (= last event + gap), n.
    """
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    out = df.groupBy(win.alias("w"), *(keys or [])).agg(
        F.count("*").alias("n"), *(aggs or [])
    )
    return out.select(
        *(keys or []),
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *[c for c in out.columns if c != "w" and c not in (keys or [])],
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: str = "15 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: pair rows sharing ``key``
    where the right event lands within ``[left_ts, left_ts +
    tolerance]`` — e.g. attach engagement events to the article that
    just published. The two watermarks plus the explicit time-range
    predicate are what let Spark age join state out instead of
    buffering both streams forever; without the range condition a
    stream-stream join is unbounded-state and rejected in append mode.

    Works on batch DataFrames too (the condition is ordinary SQL).
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = (
        right.withWatermark(right_ts, watermark)
        if right.isStreaming
        else right
    )
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (
            rw[right_ts]
            <= lw[left_ts] + F.expr(f"INTERVAL {tolerance}")
        )
    )
    return lw.join(rw, cond, "inner")
