"""Streaming PSI (streaming/drift.py): stream == batch equivalence
over micro-batches, replay idempotence (overwrite-per-epoch),
compaction, and the non-empty-reference precondition."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators.evaluation import (
    psi_drift,
)
from news_clustering_and_summarization_spark.streaming.drift import (
    PsiStream,
)

# reference: values clustered low; current stream drifts high across
# micro-batches (the production "distribution moved" case)
REF = [3, 4, 4, 5, 5, 5, 6, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
B0 = [4, 5, 6, 7, 8]
B1 = [14, 15, 16, 17, 18, 19]
B2 = [20, 21, 22, 23, 24, 25, 26]


def _ref_df(spark):
    return spark.createDataFrame([(v,) for v in REF], "v long")


def _cur_df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v long")


def _write_batch(path: str, name: str, vals):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, f"{name}.json"), "w") as f:
        for v in vals:
            f.write(json.dumps({"v": v}) + "\n")


def _batch_psi(spark, cur_vals):
    union = _ref_df(spark).withColumn("is_ref", F.lit(True)).unionByName(
        _cur_df(spark, cur_vals).withColumn("is_ref", F.lit(False))
    )
    return sorted(map(tuple, psi_drift(union, "v", "is_ref").collect()))


def test_stream_matches_batch_psi(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(src, "b0", B0)
    _write_batch(src, "b1", B1)
    _write_batch(src, "b2", B2)
    ps = PsiStream(spark, str(tmp_path / "state"), _ref_df(spark), "v")
    stream = (
        spark.readStream.schema("v long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = ps.start(stream, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    streamed = sorted(map(tuple, ps.detect().collect()))
    assert streamed == _batch_psi(spark, B0 + B1 + B2)
    assert len(streamed) == 10
    # the upward drift scores above the 0.25 action threshold
    assert streamed[0][4] > 250_000_000


def test_epoch_replay_does_not_double_count(spark, tmp_path):
    ps = PsiStream(spark, str(tmp_path / "state"), _ref_df(spark), "v")
    ps.process_batch(_cur_df(spark, B0), epoch_id=3)
    before = sorted(map(tuple, ps.detect().collect()))
    ps.process_batch(_cur_df(spark, B0), epoch_id=3)  # crash replay
    after = sorted(map(tuple, ps.detect().collect()))
    assert before == after == _batch_psi(spark, B0)
    ps.process_batch(_cur_df(spark, B0), epoch_id=4)  # genuinely new
    assert sorted(map(tuple, ps.detect().collect())) == _batch_psi(
        spark, B0 + B0
    )


def test_compaction_preserves_psi(spark, tmp_path):
    ps = PsiStream(spark, str(tmp_path / "state"), _ref_df(spark), "v")
    for e, b in enumerate([B0, B1, B2]):
        ps.process_batch(_cur_df(spark, b), epoch_id=e)
    before = sorted(map(tuple, ps.detect().collect()))
    ps.compact()
    dirs = sorted(
        d for d in os.listdir(ps.bins_path) if d.startswith("epoch=")
    )
    assert dirs == ["epoch=-1", "epoch=2"]  # newest never folded
    assert sorted(map(tuple, ps.detect().collect())) == before


def test_reference_is_frozen_and_reloaded(spark, tmp_path):
    """A second PsiStream over the same state dir reuses the
    persisted edges/ref counts — the reference argument is only
    consulted on first initialization."""
    state = str(tmp_path / "state")
    ps = PsiStream(spark, state, _ref_df(spark), "v")
    ps.process_batch(_cur_df(spark, B1), epoch_id=0)
    expect = sorted(map(tuple, ps.detect().collect()))
    ps2 = PsiStream(
        spark, state, _cur_df(spark, [999]), "v"  # would-be new ref
    )
    assert sorted(map(tuple, ps2.detect().collect())) == expect


def test_empty_reference_refused(spark, tmp_path):
    with pytest.raises(ValueError, match="non-empty reference"):
        PsiStream(
            spark, str(tmp_path / "state"), _cur_df(spark, []), "v"
        )


def test_crash_between_init_writes_reinitializes(spark, tmp_path):
    """r08 review: a crash after ref_edges but before ref_counts must
    re-run init on the next construction (completeness judged by the
    LAST artifact), not brick detect() forever."""
    import shutil

    state = str(tmp_path / "state")
    ps = PsiStream(spark, state, _ref_df(spark), "v")
    want = sorted(map(tuple, ps.detect().collect()))
    # simulate the crash window: counts gone, edges still present
    shutil.rmtree(ps._ref_counts_path)
    ps2 = PsiStream(spark, state, _ref_df(spark), "v")
    assert sorted(map(tuple, ps2.detect().collect())) == want


def _batch_ks(spark, cur_vals):
    from pyspark.sql import functions as F

    from news_clustering_and_summarization_spark.operators.evaluation import (
        ks_two_sample,
    )

    union = _ref_df(spark).withColumn("g", F.lit("ref")).unionByName(
        _cur_df(spark, cur_vals).withColumn("g", F.lit("cur"))
    )
    return sorted(
        map(tuple, ks_two_sample(union, "v", "g", "ref", "cur").collect())
    )


def test_ks_stream_matches_batch(spark, tmp_path):
    from news_clustering_and_summarization_spark.streaming.drift import (
        KsStream,
    )

    ks = KsStream(spark, str(tmp_path / "state"), _ref_df(spark), "v")
    for e, b in enumerate([B0, B1, B2]):
        ks.process_batch(_cur_df(spark, b), epoch_id=e)
    got = sorted(map(tuple, ks.detect().collect()))
    assert got == _batch_ks(spark, B0 + B1 + B2)
    # replay idempotence + compaction preserve the statistic
    ks.process_batch(_cur_df(spark, B2), epoch_id=2)
    assert sorted(map(tuple, ks.detect().collect())) == got
    ks.compact()
    assert sorted(map(tuple, ks.detect().collect())) == got
    import os as _os

    dirs = sorted(
        d for d in _os.listdir(ks.bins_path) if d.startswith("epoch=")
    )
    assert dirs == ["epoch=-1", "epoch=2"]


def test_ks_stream_live_writestream_and_nulls(spark, tmp_path):
    """r08 second review: drive KsStream through the REAL
    readStream -> foreachBatch path (not process_batch by hand), with
    NULL values on both sides — the union-then-groupBy detect() must
    merge NULLs into one per_v row exactly like batch ks_two_sample."""
    from pyspark.sql import functions as F

    from news_clustering_and_summarization_spark.operators.evaluation import (
        ks_two_sample,
    )
    from news_clustering_and_summarization_spark.streaming.drift import (
        KsStream,
    )

    ref_vals = [3, 4, 5, None, None, 6]
    cur_vals = [14, None, 15, 16]
    ref = spark.createDataFrame([(v,) for v in ref_vals], "v long")
    src = str(tmp_path / "src")
    _write_batch(src, "b0", cur_vals)
    ks = KsStream(spark, str(tmp_path / "state"), ref, "v")
    stream = (
        spark.readStream.schema("v long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = ks.start(stream, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    got = sorted(map(tuple, ks.detect().collect()))
    union = ref.withColumn("g", F.lit("ref")).unionByName(
        spark.createDataFrame(
            [(v,) for v in cur_vals], "v long"
        ).withColumn("g", F.lit("cur"))
    )
    want = sorted(
        map(tuple, ks_two_sample(union, "v", "g", "ref", "cur").collect())
    )
    assert got == want


def test_ks_stream_init_crash_reinitializes(spark, tmp_path):
    """r08 second review: a half-written reference directory (no
    _SUCCESS commit marker) must be rebuilt on the next construction,
    and a committed one must be REUSED (frozen reference)."""
    import os as _os
    import shutil

    from news_clustering_and_summarization_spark.streaming.drift import (
        KsStream,
    )

    state = str(tmp_path / "state")
    ks = KsStream(spark, state, _ref_df(spark), "v")
    ks.process_batch(_cur_df(spark, B0), epoch_id=0)
    want = sorted(map(tuple, ks.detect().collect()))
    # committed reference is frozen: a new instance ignores its arg
    ks2 = KsStream(spark, state, _cur_df(spark, [999]), "v")
    assert sorted(map(tuple, ks2.detect().collect())) == want
    # simulate the init crash: directory present, no _SUCCESS
    _os.remove(_os.path.join(ks.ref_counts_path, "_SUCCESS")) if hasattr(
        ks, "ref_counts_path"
    ) else _os.remove(_os.path.join(ks._ref_counts_path, "_SUCCESS"))
    ks3 = KsStream(spark, state, _ref_df(spark), "v")
    assert sorted(map(tuple, ks3.detect().collect())) == want
    shutil.rmtree(str(tmp_path / "ckpt"), ignore_errors=True)
