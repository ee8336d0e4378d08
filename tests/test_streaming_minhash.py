"""Streaming MinHash near-dup dedup (streaming/dedup.py
MinhashDedupStream): stream == batch equivalence over micro-batches,
replay idempotence (overwrite-per-epoch), crash-safe compaction, and
the frozen-parameter contract."""

from __future__ import annotations

import json
import os

import pytest

from news_clustering_and_summarization_spark.operators.dedup import (
    minhash_near_duplicates,
)
from news_clustering_and_summarization_spark.streaming.dedup import (
    MinhashDedupStream,
)

# Three micro-batches with near-dup structure WITHIN and ACROSS
# batches: d1/d2 verbatim dup in b0; d5 appends one token to d1
# (Jaccard 8/9 across b0->b1); d6/d7 verbatim dup in b1; d9 verbatim
# copy of d6 across b1->b2; the rest share no shingles with anything.
_BASE_A = "the quick brown fox jumps over the lazy sleeping dog today"
_BASE_B = "market prices rose sharply after the central bank rate decision"
BATCHES = [
    [
        ("d1", _BASE_A),
        ("d2", _BASE_A),
        ("d3", _BASE_B),
        ("d4", "completely unrelated text about gardening tulip bulbs in spring soil"),
    ],
    [
        ("d5", _BASE_A + " again"),
        ("d6", "senate committee hearing on energy policy adjourned without any vote"),
        ("d7", "senate committee hearing on energy policy adjourned without any vote"),
        ("d8", "short doc"),  # < n tokens: no shingle, must drop out
    ],
    [
        ("d9", "senate committee hearing on energy policy adjourned without any vote"),
        ("da", "recipe for sourdough bread with a long cold overnight fermentation"),
    ],
]
ALL_DOCS = [d for b in BATCHES for d in b]


def _docs_df(spark, docs):
    return spark.createDataFrame(docs, "doc_id string, text string")


def _write_batch(path: str, name: str, docs):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, f"{name}.json"), "w") as f:
        for doc_id, text in docs:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _batch_pairs(spark, docs):
    return sorted(
        (r["l_id"], r["r_id"], round(r["jaccard"], 9))
        for r in minhash_near_duplicates(_docs_df(spark, docs)).collect()
    )


def _stream_pairs(ms):
    return sorted(
        (r["l_id"], r["r_id"], round(r["jaccard"], 9))
        for r in ms.detect().collect()
    )


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    for i, b in enumerate(BATCHES):
        _write_batch(src, f"b{i}", b)
    ms = MinhashDedupStream(spark, str(tmp_path / "state"))
    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = ms.start(stream, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    got = _stream_pairs(ms)
    assert got == _batch_pairs(spark, ALL_DOCS)
    # the fixture's planted structure was actually found: verbatim
    # dups within batch (d1,d2), (d6,d7); across batches (d6,d9),
    # (d7,d9); near-dup across batches (d1,d5), (d2,d5)
    ids = {(l, r) for l, r, _ in got}
    assert {("d1", "d2"), ("d6", "d7"), ("d6", "d9"), ("d7", "d9")} <= ids
    assert ("d1", "d5") in ids and ("d2", "d5") in ids


def test_epoch_replay_is_idempotent(spark, tmp_path):
    ms = MinhashDedupStream(spark, str(tmp_path / "state"))
    ms.process_batch(_docs_df(spark, BATCHES[0]), epoch_id=0)
    ms.process_batch(_docs_df(spark, BATCHES[1]), epoch_id=1)
    before = _stream_pairs(ms)
    ms.process_batch(_docs_df(spark, BATCHES[1]), epoch_id=1)  # replay
    assert _stream_pairs(ms) == before
    assert before == _batch_pairs(spark, BATCHES[0] + BATCHES[1])
    # a genuinely new epoch extends the pair set
    ms.process_batch(_docs_df(spark, BATCHES[2]), epoch_id=2)
    assert _stream_pairs(ms) == _batch_pairs(spark, ALL_DOCS)


def test_compaction_preserves_pairs_and_index(spark, tmp_path):
    ms = MinhashDedupStream(spark, str(tmp_path / "state"))
    for e, b in enumerate(BATCHES):
        ms.process_batch(_docs_df(spark, b), epoch_id=e)
    before = _stream_pairs(ms)
    ms.compact()
    for path in (ms.bands_path, ms.shingles_path, ms.pairs_path):
        dirs = sorted(d for d in os.listdir(path) if d.startswith("epoch="))
        assert dirs == ["epoch=-1", "epoch=2"]  # newest never folded
    assert _stream_pairs(ms) == before
    # the folded index still serves new batches: a verbatim copy of a
    # batch-0 doc must still be caught through epoch=-1
    ms.process_batch(
        _docs_df(spark, [("dz", _BASE_A)]), epoch_id=3
    )
    ids = {(l, r) for l, r, _ in _stream_pairs(ms)}
    assert ("d1", "dz") in ids and ("d2", "dz") in ids


def test_params_are_frozen(spark, tmp_path):
    state = str(tmp_path / "state")
    MinhashDedupStream(spark, state, threshold=0.7)
    MinhashDedupStream(spark, state, threshold=0.7)  # same: fine
    with pytest.raises(ValueError, match="frozen"):
        MinhashDedupStream(spark, state, threshold=0.5)


def test_interrupted_compaction_self_heals(spark, tmp_path):
    """A crashed compaction (staging dir, no manifest, dead-writer
    BEGIN marker) must be discarded by the next read — detect() and
    process_batch history reads call epoch_state.recover_staging."""
    ms = MinhashDedupStream(spark, str(tmp_path / "state"))
    for e, b in enumerate(BATCHES[:2]):
        ms.process_batch(_docs_df(spark, b), epoch_id=e)
    want = _stream_pairs(ms)
    # simulate the crash window: staging exists, manifest never
    # committed, writer pid long dead
    staging = os.path.join(ms.pairs_path, "_compact_staging")
    os.makedirs(staging)
    with open(os.path.join(staging, "_BEGIN"), "w") as f:
        f.write("999999999")  # no such pid
    assert _stream_pairs(ms) == want          # read self-heals
    assert not os.path.exists(staging)        # staging reaped
    ms.process_batch(_docs_df(spark, BATCHES[2]), epoch_id=2)
    assert _stream_pairs(ms) == _batch_pairs(spark, ALL_DOCS)
