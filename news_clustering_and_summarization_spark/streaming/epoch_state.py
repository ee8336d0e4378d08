"""Shared epoch-state layout for the overwrite-per-epoch stream
stores (CMS / HLL / CUSUM / histogram): crash-safe compaction and the
read-side recovery hook.

Two r07 review findings drove this out of the per-class copies, and a
second review pass hardened the protocol:

1. **Never fold the newest epoch.** The highest numeric epoch may not
   be committed to the stream checkpoint yet; if it were folded into
   the base and then replayed after a crash, its counts would land
   twice. Compaction folds every OTHER committed epoch into
   ``epoch=-1`` and leaves the newest directory untouched.
2. **Write-then-swap with an atomic recovery marker.** The merged
   base is written to a staging directory INSIDE the store (prefixed
   ``_`` so Spark's partition discovery ignores it); the ``_FOLDED``
   manifest naming the source directories is written to a temp name
   and **renamed into place** (atomic — a crash mid-write can never
   leave a short/empty manifest that recovery would trust); only then
   are the sources removed (``ignore_errors=False`` — a failed delete
   must raise here, where the manifest protocol makes it recoverable,
   rather than silently double-count) and the staging renamed to
   ``epoch=-1``.
3. **Reads self-heal.** Every store's read path calls
   ``recover_staging`` first (a no-op stat in the normal case), so an
   interrupted swap is completed by the NEXT READ — answers are never
   served from a store missing already-folded epochs until some
   future maintenance call happens by.

Recovery decision table for a staging directory found on disk:
no manifest (or empty) → the merge never committed; sources are all
intact; discard staging — UNLESS a fresh ``_BEGIN`` marker names a
live writer process, in which case the merge is in progress and the
reader must leave the staging alone (reaping it under the writer
could let the writer commit a manifest over a half-deleted base —
silent data loss; r08 advisor finding). Manifest present → the merge
is authoritative for exactly the listed sources; remove whichever
still exist and install the base.

Concurrency contract: compaction is SINGLE-WRITER (one maintenance
process per store path — the Structured Streaming driver). Readers
in other processes never corrupt or lose state: the ``_BEGIN``
liveness marker keeps them from reaping an in-progress merge, and
the manifest rename keeps them from completing a half-written one.
One transient read window remains (r08 advisor note): between the
writer's fold-dir deletions and the staging rename, a reader whose
Spark job lists files in that instant can momentarily see folded
epochs gone with epoch=-1 not yet installed — a transient
undercount or FileNotFound, never a permanent loss; such a reader
should retry once on missing-file errors if it needs a consistent
point-in-time count.
"""

from __future__ import annotations

import os
import shutil
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

STAGING = "_compact_staging"
MANIFEST = "_FOLDED"
BEGIN = "_BEGIN"
# Grace window for an UNREADABLE _BEGIN marker only (writer caught
# between marker create and flush). A readable marker is judged by
# writer LIVENESS, never age — a long parquet write must not be
# reaped at an arbitrary cutoff (r08 review finding).
BEGIN_STALE_SECONDS = 900.0


# staging paths with a compaction ACTIVE in this very process —
# lets a reader THREAD in the writer's own process distinguish "our
# pid, merge running on a sibling thread" (leave it) from "our pid,
# crashed prior run of this same pid" (reapable). Set mutations are
# GIL-atomic. (r08 review finding: the old pid==getpid() → reap rule
# ignored threads, so a monitoring thread could reap a live merge.)
_ACTIVE: set[str] = set()


def freeze_checkpoint(state_dir: str, checkpoint: str) -> None:
    """Bind ``state_dir`` to one stream checkpoint identity.

    The epoch replay guard (overwrite ``epoch=e``, exclude ``e``
    from history) assumes epoch ids are unique per state_dir — true
    only while the SAME Structured Streaming checkpoint numbers the
    batches. Restarting against the same state_dir with a FRESH
    checkpoint restarts epochs at 0 and silently clobbers/excludes
    the newest historical epoch (r09 advisor finding). So the first
    ``start()`` freezes the checkpoint location next to the state
    (``_checkpoint.json``) and any later start with a different
    location raises instead of corrupting.

    Written atomically with CREATE-EXCLUSIVE semantics (temp +
    os.link, which fails if the target exists — unlike rename, which
    silently replaces): two streams starting concurrently against
    the same state_dir cannot both win the race; the loser re-reads
    the winner's binding and raises on conflict (r10 advisor
    finding: check-then-rename left exactly the concurrent case the
    guard exists for undetected)."""
    import json

    path = os.path.join(state_dir, "_checkpoint.json")
    mine = {"checkpoint": os.path.abspath(checkpoint)}

    def _check(frozen: dict) -> None:
        if frozen != mine:
            raise ValueError(
                f"state_dir {state_dir!r} is bound to checkpoint "
                f"{frozen['checkpoint']!r} but this stream uses "
                f"{mine['checkpoint']!r}; a fresh checkpoint restarts "
                "epoch ids at 0 and would clobber existing epoch "
                "state — reuse the original checkpoint or use a new "
                "state_dir"
            )

    if os.path.exists(path):
        with open(path) as f:
            _check(json.load(f))
        return
    os.makedirs(state_dir, exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(mine, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
    except FileExistsError:
        # lost the race — validate against the winner's binding
        with open(path) as f:
            _check(json.load(f))
    finally:
        os.remove(tmp)


def _writer_in_progress(staging: str) -> bool:
    """True when ``staging``'s ``_BEGIN`` marker names a writer that
    is plausibly still mid-merge: a LIVE process (liveness, not
    marker age, is the primary signal — a long parquet write must
    not get reaped at an arbitrary age cutoff; r08 review finding),
    or our own process with the compaction registered on another
    thread. ``BEGIN_STALE_SECONDS`` only bounds the UNREADABLE-marker
    grace window; a dead writer's staging is reaped immediately, and
    a recycled pid merely defers the reap to the next compact_epochs
    (which clears staging itself as the writer)."""
    marker = os.path.join(staging, BEGIN)
    try:
        with open(marker) as f:
            pid = int(f.read().strip())
    except (ValueError, OverflowError):
        # unreadable content (empty = writer caught between marker
        # create and flush, or garbage): give a FRESH marker the
        # benefit of the doubt, reap an old one. pid <= 0 lands here
        # too (below) — os.kill(0, 0) signals our own process group
        # and always succeeds, which would pin the staging as a live
        # writer's forever (r08 advisor finding).
        pid = None
    except OSError:
        return False  # no marker: old layout or pre-marker crash
    if pid is None or pid <= 0:
        try:
            age = time.time() - os.path.getmtime(marker)
        except OSError:
            return False
        return age < BEGIN_STALE_SECONDS
    if pid == os.getpid():
        return staging in _ACTIVE
    try:
        os.kill(pid, 0)
    except PermissionError:
        # EPERM: the process EXISTS but belongs to another uid —
        # that is a live writer, not a dead one (r08 review finding)
        return True
    except OSError:
        return False  # writer process is gone
    return True


def _epoch_dirs(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for d in os.listdir(path):
        if d.startswith("epoch="):
            out.append(int(d.split("=", 1)[1]))
    return sorted(out)


def recover_staging(path: str) -> None:
    """Finish (or discard) an interrupted compaction. Safe and cheap
    to call from every read — a no-op when no staging exists."""
    staging = os.path.join(path, STAGING)
    manifest = os.path.join(staging, MANIFEST)
    if not os.path.isdir(staging):
        return
    folded: list[str] = []
    if os.path.exists(manifest):
        with open(manifest) as f:
            folded = [line.strip() for line in f if line.strip()]
    if not folded:
        # no manifest, or an empty one: the merge never committed
        # (the manifest is renamed into place atomically AFTER a full
        # write, so a trusted manifest is never empty) — staging holds
        # nothing authoritative and every source is intact. BUT if a
        # live writer's _BEGIN marker is present, the merge is in
        # progress in another process: leave it alone.
        if _writer_in_progress(staging):
            return
        # TOCTOU guard (r08 review finding): the writer may have
        # renamed the manifest in between our manifest check and this
        # point — re-check RIGHT BEFORE the destructive step, and if
        # a NON-EMPTY manifest appeared, take the manifest path
        # instead of reaping a just-committed merge out from under
        # the writer. (A still-empty manifest was empty on the first
        # read too — no recursion, discard as before.)
        try:
            with open(manifest) as f:
                reread = [line.strip() for line in f if line.strip()]
        except OSError:
            reread = []
        if reread:
            recover_staging(path)
            return
        shutil.rmtree(staging, ignore_errors=True)
        return
    for d in folded:
        src = os.path.join(path, d)
        if os.path.exists(src):
            shutil.rmtree(src)  # raise on failure: see module doc
    # the manifest stays inside the directory across the rename —
    # removing it first would make a crash-before-rename look like an
    # incomplete write and discard real state; Spark ignores
    # underscore-prefixed files, so it rides along harmlessly
    os.rename(staging, os.path.join(path, "epoch=-1"))


def fold_sources(path: str) -> list[str] | None:
    """The epoch directories a compaction would fold: all but the
    newest numeric epoch. None when fewer than two would fold."""
    recover_staging(path)
    nums = _epoch_dirs(path)
    if not nums:
        return None
    newest = nums[-1] if nums[-1] >= 0 else None
    fold = [n for n in nums if n != newest]
    if len(fold) < 2:
        return None
    return [os.path.join(path, f"epoch={n}") for n in fold]


def compact_epochs(
    path: str, merged: DataFrame, fold: list[str]
) -> bool:
    """Fold the ``fold`` epoch directories (the caller's
    ``fold_sources(path)`` result — passed through verbatim so the
    manifest always names exactly the directories ``merged``
    aggregated, never a re-derived list that a concurrent write
    could skew) into ``epoch=-1``. Returns False when there is
    nothing to fold."""
    if not fold:
        return False
    staging = os.path.join(path, STAGING)
    shutil.rmtree(staging, ignore_errors=True)
    # _BEGIN liveness marker FIRST, then the (long) parquet write in
    # append mode so the marker survives it — concurrent readers'
    # recover_staging sees a live writer and leaves the staging alone.
    # Underscore-prefixed, so Spark reads ignore it wherever it rides.
    os.makedirs(staging)
    with open(os.path.join(staging, BEGIN), "w") as f:
        f.write(str(os.getpid()))
        f.flush()
        os.fsync(f.fileno())
    _ACTIVE.add(staging)  # same-process reader threads: merge is live
    try:
        merged.write.mode("append").parquet(staging)
        # the manifest commits the fold set; it is written to a temp
        # name and renamed into place so it is ATOMICALLY
        # all-or-nothing — everything before it lands is discardable,
        # everything after is completable (recover_staging)
        tmp = os.path.join(staging, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            f.write("\n".join(os.path.basename(d) for d in fold) + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(staging, MANIFEST))
        for d in fold:
            shutil.rmtree(d)  # raise on failure: see module doc
        os.rename(staging, os.path.join(path, "epoch=-1"))
    finally:
        _ACTIVE.discard(staging)
    return True


def compact_store(
    spark: SparkSession,
    path: str,
    merge: Callable[[DataFrame], DataFrame],
) -> bool:
    """The whole maintenance step the four stores share: recover,
    pick the fold set, apply the store's merge aggregate over exactly
    those directories, and swap. ``merge`` receives the raw union of
    the fold directories' rows."""
    fold = fold_sources(path)
    if fold is None:
        return False
    return compact_epochs(path, merge(spark.read.parquet(*fold)), fold)
