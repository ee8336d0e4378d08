"""Epoch-state compaction protocol (streaming/epoch_state.py):
newest-epoch exclusion, write-then-swap staging, and crash recovery
from both failure windows (incomplete write, interrupted swap)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.streaming import epoch_state


def _write_epoch(spark, path, n, rows):
    df = spark.createDataFrame(rows, "bin long, cnt long")
    df.write.mode("overwrite").parquet(os.path.join(path, f"epoch={n}"))


def _totals(spark, path):
    return {
        r["bin"]: r["cnt"]
        for r in spark.read.option("basePath", path)
        .parquet(path)
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }


def test_fold_excludes_newest_epoch(spark, tmp_path):
    path = str(tmp_path / "bins")
    for e in range(3):
        _write_epoch(spark, path, e, [(1, 10)])
    fold = epoch_state.fold_sources(path)
    assert [os.path.basename(d) for d in fold] == ["epoch=0", "epoch=1"]
    merged = spark.read.parquet(*fold).groupBy("bin").agg(
        F.sum("cnt").alias("cnt")
    )
    assert epoch_state.compact_epochs(path, merged, fold)
    assert sorted(os.listdir(path)) == ["epoch=-1", "epoch=2"]
    assert _totals(spark, path) == {1: 30}


def test_two_epochs_is_a_noop(spark, tmp_path):
    path = str(tmp_path / "bins")
    for e in range(2):
        _write_epoch(spark, path, e, [(1, 10)])
    assert epoch_state.fold_sources(path) is None
    assert sorted(os.listdir(path)) == ["epoch=0", "epoch=1"]


def test_recovery_from_incomplete_write(spark, tmp_path):
    """Staging without a manifest = the merged write never finished:
    it holds nothing authoritative and is discarded; all source
    epochs are intact."""
    path = str(tmp_path / "bins")
    for e in range(3):
        _write_epoch(spark, path, e, [(1, 10)])
    staging = os.path.join(path, epoch_state.STAGING)
    os.makedirs(staging)
    with open(os.path.join(staging, "part-000.parquet"), "w") as f:
        f.write("garbage-partial-write")
    epoch_state.recover_staging(path)
    assert not os.path.exists(staging)
    assert _totals(spark, path) == {1: 30}


def test_recovery_from_interrupted_swap(spark, tmp_path):
    """Staging WITH a manifest = the merge is complete and
    authoritative for the listed sources: recovery removes whatever
    sources remain (here one was already deleted, one was not) and
    installs the base — totals identical, nothing double-counted."""
    path = str(tmp_path / "bins")
    for e in range(3):
        _write_epoch(spark, path, e, [(1, 10)])
    fold = epoch_state.fold_sources(path)
    staging = os.path.join(path, epoch_state.STAGING)
    merged = spark.read.parquet(*fold).groupBy("bin").agg(
        F.sum("cnt").alias("cnt")
    )
    merged.write.mode("overwrite").parquet(staging)
    with open(os.path.join(staging, epoch_state.MANIFEST), "w") as f:
        f.write("epoch=0\nepoch=1\n")
    # simulate a crash halfway through source removal
    shutil.rmtree(os.path.join(path, "epoch=0"))
    epoch_state.recover_staging(path)
    assert sorted(os.listdir(path)) == ["epoch=-1", "epoch=2"]
    assert _totals(spark, path) == {1: 30}


def test_recovery_discards_empty_manifest(spark, tmp_path):
    """An empty _FOLDED (the crash window the atomic temp-name rename
    closes; simulated here directly) must read as 'merge never
    committed' — discard staging, keep every source intact, never
    double-count."""
    path = str(tmp_path / "bins")
    for e in range(3):
        _write_epoch(spark, path, e, [(1, 10)])
    staging = os.path.join(path, epoch_state.STAGING)
    os.makedirs(staging)
    open(os.path.join(staging, epoch_state.MANIFEST), "w").close()
    epoch_state.recover_staging(path)
    assert not os.path.exists(staging)
    assert _totals(spark, path) == {1: 30}


def test_reads_self_heal_interrupted_swap(spark, tmp_path):
    """A store read completes an interrupted swap instead of serving
    undercounted state until maintenance runs."""
    from pyspark.sql import functions as SF

    from news_clustering_and_summarization_spark.streaming.profiling import (
        HistogramStream,
    )

    hs = HistogramStream(
        spark, str(tmp_path / "state"), "v", lo=0.0, width=1.0, n_bins=8
    )
    batch = spark.createDataFrame([(float(i % 8),) for i in range(16)], "v double")
    for e in range(3):
        hs.process_batch(batch, epoch_id=e)
    expect = sorted(map(tuple, hs.histogram().collect()))
    # simulate the interrupted swap: merged epochs 0+1 staged with a
    # manifest, epoch=0 already removed, rename never happened
    fold = epoch_state.fold_sources(hs.bins_path)
    staging = os.path.join(hs.bins_path, epoch_state.STAGING)
    merged = spark.read.parquet(*fold).groupBy("bin").agg(
        SF.sum("cnt").alias("cnt")
    )
    merged.write.mode("overwrite").parquet(staging)
    with open(os.path.join(staging, epoch_state.MANIFEST), "w") as f:
        f.write("epoch=0\nepoch=1\n")
    shutil.rmtree(os.path.join(hs.bins_path, "epoch=0"))
    # a plain READ self-heals and returns the full counts
    assert sorted(map(tuple, hs.histogram().collect())) == expect
    assert sorted(
        d for d in os.listdir(hs.bins_path) if d.startswith("epoch=")
    ) == ["epoch=-1", "epoch=2"]


def test_reader_leaves_live_writers_staging_alone(spark, tmp_path):
    """The r08 advisor race: a reader's recover_staging must NOT reap
    a manifest-less staging while another live process is mid-merge.
    The _BEGIN marker (fresh mtime + live pid) is the signal; a
    subprocess stands in for the concurrent writer."""
    import subprocess
    import sys

    path = str(tmp_path / "bins")
    for e in range(3):
        _write_epoch(spark, path, e, [(1, 10)])
    staging = os.path.join(path, epoch_state.STAGING)
    os.makedirs(staging)
    writer = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    try:
        with open(os.path.join(staging, epoch_state.BEGIN), "w") as f:
            f.write(str(writer.pid))
        with open(os.path.join(staging, "part-000.parquet"), "w") as f:
            f.write("writer-still-writing")
        epoch_state.recover_staging(path)
        assert os.path.isdir(staging)  # left for the live writer
    finally:
        writer.kill()
        writer.wait()
    # writer died without committing: now reapable
    epoch_state.recover_staging(path)
    assert not os.path.exists(staging)
    assert _totals(spark, path) == {1: 30}


def test_stale_begin_marker_is_reaped(spark, tmp_path):
    """A _BEGIN marker naming a DEAD pid no longer protects the
    staging, whatever its age (r08 review: liveness, not marker age,
    is the signal — the mtime is set once and a long merge must not
    be reaped at an arbitrary cutoff)."""
    path = str(tmp_path / "bins")
    for e in range(2):
        _write_epoch(spark, path, e, [(1, 10)])
    staging = os.path.join(path, epoch_state.STAGING)
    os.makedirs(staging)
    marker = os.path.join(staging, epoch_state.BEGIN)
    # a GUARANTEED-dead pid: spawn-and-reap a child (os.getpid()+1
    # was flaky — when this file runs alone, +1 is the fixture's
    # freshly-spawned JVM, a very live writer)
    import subprocess
    import sys

    child = subprocess.Popen([sys.executable, "-c", "pass"])
    child.wait()
    with open(marker, "w") as f:
        f.write(str(child.pid))
    old = os.path.getmtime(marker) - epoch_state.BEGIN_STALE_SECONDS - 10
    os.utime(marker, (old, old))
    epoch_state.recover_staging(path)
    assert not os.path.exists(staging)


def test_compact_store_end_to_end_with_marker(spark, tmp_path):
    """compact_store under the new protocol: the _BEGIN marker is
    written before the parquet write (append mode preserves it),
    rides along into epoch=-1, and Spark reads ignore it — totals
    exact, nothing double-counted."""
    from pyspark.sql import functions as SF

    path = str(tmp_path / "bins")
    for e in range(4):
        _write_epoch(spark, path, e, [(1, 10), (2, 5)])

    def merge(df):
        return df.groupBy("bin").agg(SF.sum("cnt").alias("cnt"))

    assert epoch_state.compact_store(spark, path, merge)
    assert sorted(
        d for d in os.listdir(path) if d.startswith("epoch=")
    ) == ["epoch=-1", "epoch=3"]
    assert os.path.exists(
        os.path.join(path, "epoch=-1", epoch_state.BEGIN)
    )
    assert _totals(spark, path) == {1: 40, 2: 20}
    assert epoch_state.fold_sources(path) is None


def test_same_process_thread_does_not_reap_active_merge(spark, tmp_path):
    """r08 review: a reader THREAD in the writer's own process must
    not reap a registered in-progress merge (the old pid==getpid() →
    'crashed prior attempt' rule ignored threads); once deregistered,
    the same marker IS a crashed prior attempt and gets reaped."""
    path = str(tmp_path / "bins")
    for e in range(3):
        _write_epoch(spark, path, e, [(1, 10)])
    staging = os.path.join(path, epoch_state.STAGING)
    os.makedirs(staging)
    with open(os.path.join(staging, epoch_state.BEGIN), "w") as f:
        f.write(str(os.getpid()))
    epoch_state._ACTIVE.add(staging)
    try:
        epoch_state.recover_staging(path)
        assert os.path.isdir(staging)  # live sibling-thread merge
    finally:
        epoch_state._ACTIVE.discard(staging)
    epoch_state.recover_staging(path)
    assert not os.path.exists(staging)  # crashed prior attempt


def test_toctou_manifest_recheck_completes_commit(spark, tmp_path):
    """r08 review: if a non-empty manifest lands after the first
    manifest check (simulated by planting it with a dead-pid marker),
    recovery must COMPLETE the merge, not reap it."""
    path = str(tmp_path / "bins")
    for e in range(3):
        _write_epoch(spark, path, e, [(1, 10)])
    # build a committed staging: real parquet + manifest, dead pid
    staging = os.path.join(path, epoch_state.STAGING)
    spark.createDataFrame([(1, 20)], "bin long, cnt long").coalesce(
        1
    ).write.mode("overwrite").parquet(staging)
    with open(os.path.join(staging, epoch_state.MANIFEST), "w") as f:
        f.write("epoch=0\nepoch=1\n")
    epoch_state.recover_staging(path)
    assert sorted(
        d for d in os.listdir(path) if d.startswith("epoch=")
    ) == ["epoch=-1", "epoch=2"]
    assert _totals(spark, path) == {1: 30}


def test_zero_pid_marker_treated_as_unreadable(spark, tmp_path):
    """r08 advisor: a _BEGIN marker whose content parses to pid <= 0
    (empty file rounds to 0 via the old `or "0"`; os.kill(0, 0)
    signals our own process group and always succeeds) must fall to
    the mtime grace window, not pin the staging forever: fresh ->
    protected, stale -> reaped."""
    path = str(tmp_path / "bins")
    for e in range(2):
        _write_epoch(spark, path, e, [(1, 10)])
    staging = os.path.join(path, epoch_state.STAGING)
    marker = os.path.join(staging, epoch_state.BEGIN)
    for content in ("0", "-7", ""):
        os.makedirs(staging, exist_ok=True)
        with open(marker, "w") as f:
            f.write(content)
        epoch_state.recover_staging(path)
        assert os.path.isdir(staging), content  # fresh: protected
        old = os.path.getmtime(marker) - epoch_state.BEGIN_STALE_SECONDS - 5
        os.utime(marker, (old, old))
        epoch_state.recover_staging(path)
        assert not os.path.exists(staging), content  # stale: reaped
    assert _totals(spark, path) == {1: 20}


def test_freeze_checkpoint_binds_and_conflicts(tmp_path):
    sd = str(tmp_path / "state")
    epoch_state.freeze_checkpoint(sd, str(tmp_path / "ckpt_a"))
    # same binding: idempotent
    epoch_state.freeze_checkpoint(sd, str(tmp_path / "ckpt_a"))
    import pytest

    with pytest.raises(ValueError, match="bound to checkpoint"):
        epoch_state.freeze_checkpoint(sd, str(tmp_path / "ckpt_b"))


def test_freeze_checkpoint_race_loser_detects_conflict(tmp_path, monkeypatch):
    # r10 advisor: check-then-write missed the CONCURRENT case. Force
    # the race window — the exists() probe says no binding, but by
    # link time another stream has won — and require the loser to
    # re-read the winner's binding and raise instead of clobbering.
    import json

    import pytest

    sd = str(tmp_path / "state")
    os.makedirs(sd)
    path = os.path.join(sd, "_checkpoint.json")
    real_exists = os.path.exists

    def racing_exists(p):
        if p == path:
            # winner lands its binding AFTER the probe returns False
            if not real_exists(p):
                with open(p, "w") as f:
                    json.dump(
                        {"checkpoint": os.path.abspath(
                            str(tmp_path / "ckpt_winner"))},
                        f,
                    )
            return False
        return real_exists(p)

    monkeypatch.setattr(os.path, "exists", racing_exists)
    with pytest.raises(ValueError, match="bound to checkpoint"):
        epoch_state.freeze_checkpoint(sd, str(tmp_path / "ckpt_loser"))
    monkeypatch.undo()
    # the winner's binding survived untouched and still validates
    epoch_state.freeze_checkpoint(sd, str(tmp_path / "ckpt_winner"))
    # no temp litter left behind
    assert [f for f in os.listdir(sd) if ".tmp" in f] == []
