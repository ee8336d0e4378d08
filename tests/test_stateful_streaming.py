"""Keyed-state streaming operators (applyInPandasWithState):
cross-batch first-seen dedup (ST4) and the summarize trigger gate
(ST6, trigger_sfn.py:45-55 semantics) — state must survive across
micro-batches within one query."""

from __future__ import annotations

import json
import os

from news_clustering_and_summarization_spark.streaming.stateful import (
    streaming_first_seen,
    streaming_summarize_gate,
)


def _write_jsonl(
    path: str, name: str, rows: list[dict], mtime: int | None = None
) -> None:
    """Write one batch file. The file source orders ties on the
    ms-granular mtime arbitrarily, so batch order is only guaranteed
    by setting distinct mtimes explicitly."""
    os.makedirs(path, exist_ok=True)
    fn = os.path.join(path, name)
    with open(fn, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    if mtime is not None:
        os.utime(fn, (mtime, mtime))


def _run_stream(spark, inp, schema, transform, tmp_path, sink_name):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(inp)
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ck-{sink_name}"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {sink_name}")


def test_first_seen_dedups_across_batches(spark, tmp_path):
    inp = str(tmp_path / "in")
    # batch files ingest one per trigger; lexicographic file order is
    # not guaranteed across triggers, so make each file self-contained
    _write_jsonl(
        inp,
        "b0.json",
        mtime=1000000000,
        rows=[
            {"id": "a", "seq": 2, "body": "a-late"},
            {"id": "a", "seq": 1, "body": "a-first"},
            {"id": "b", "seq": 1, "body": "b-first"},
        ],
    )
    df = _run_stream(
        spark,
        inp,
        "id string, seq long, body string",
        lambda s: streaming_first_seen(s, id_col="id", order_col="seq"),
        tmp_path,
        "first_seen_sink",
    )
    # in-batch: lowest seq wins per key
    got = {r["id"]: r["body"] for r in df.collect()}
    assert got == {"a": "a-first", "b": "b-first"}

    # redelivery in a later batch must be suppressed by state
    _write_jsonl(
        inp,
        "b1.json",
        mtime=1000000100,
        rows=[
            {"id": "a", "seq": 3, "body": "a-redelivered"},
            {"id": "c", "seq": 1, "body": "c-first"},
        ],
    )
    df2 = _run_stream(
        spark,
        inp,
        "id string, seq long, body string",
        lambda s: streaming_first_seen(s, id_col="id", order_col="seq"),
        tmp_path,
        "first_seen_sink2",
    )
    got2 = {r["id"]: r["body"] for r in df2.collect()}
    assert got2 == {"a": "a-first", "b": "b-first", "c": "c-first"}


def test_summarize_gate_reference_semantics(spark, tmp_path):
    inp = str(tmp_path / "in")
    # T=5: fire at n>5 with sc=0; next fire needs n>10; cap n>=15
    # unless never summarized (trigger_sfn.py:45-55).
    _write_jsonl(
        inp,
        "b0.json",
        mtime=1000000000,
        rows=[
            {"PK": "c1", "number_of_articles": 6},
            {"PK": "c2", "number_of_articles": 4},
        ],
    )
    _write_jsonl(
        inp,
        "b1.json",
        mtime=1000000100,
        rows=[
            # c1 grew but 8 <= 5*(1+1): no re-fire
            {"PK": "c1", "number_of_articles": 8},
            # c2 crosses the first threshold now
            {"PK": "c2", "number_of_articles": 7},
            # c3 appears huge and never summarized: cap waived, fires
            {"PK": "c3", "number_of_articles": 40},
        ],
    )
    _write_jsonl(
        inp,
        "b2.json",
        mtime=1000000200,
        rows=[
            # c1 crosses the second threshold (11 > 10, below cap 15)
            {"PK": "c1", "number_of_articles": 11},
            # c3 at sc=1 is over the cap 15: suppressed forever after
            {"PK": "c3", "number_of_articles": 60},
        ],
    )
    df = _run_stream(
        spark,
        inp,
        "PK string, number_of_articles long",
        streaming_summarize_gate,
        tmp_path,
        "gate_sink",
    )
    fired = sorted(
        (r["PK"], r["number_of_articles"], r["summary_count"])
        for r in df.collect()
    )
    assert fired == [
        ("c1", 6, 0),
        ("c1", 11, 1),
        ("c2", 7, 0),
        ("c3", 40, 0),
    ]
