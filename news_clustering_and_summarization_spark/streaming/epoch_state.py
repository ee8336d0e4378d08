"""Shared epoch-state compaction for the overwrite-per-epoch stream
stores (CMS / HLL / CUSUM / histogram).

Two r07 review findings drove this out of the per-class copies:

1. **Never fold the newest epoch.** The highest numeric epoch may not
   be committed to the stream checkpoint yet; if it were folded into
   the base and then replayed after a crash, its counts would land
   twice. Compaction folds every OTHER committed epoch into
   ``epoch=-1`` and leaves the newest directory untouched.
2. **Write-then-swap with a recovery marker.** The old copies did
   ``rmtree(state); write(merged)`` — a driver crash or failed write
   in between lost the entire accumulated state (the localCheckpoint
   backing the merged frame dies with the session). Now the merged
   base is written to a staging directory INSIDE the store (prefixed
   ``_`` so Spark's partition discovery ignores it) together with a
   ``_FOLDED`` manifest naming the source directories; only then are
   the sources removed and the staging renamed to ``epoch=-1``. A
   crash at any point is recovered by the next ``compact()`` call:
   the manifest says exactly which directories are already merged
   into staging, so recovery removes the stragglers and completes
   the rename — state is never lost and never double-counted.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

STAGING = "_compact_staging"
MANIFEST = "_FOLDED"


def _epoch_dirs(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for d in os.listdir(path):
        if d.startswith("epoch="):
            out.append(int(d.split("=", 1)[1]))
    return sorted(out)


def recover_staging(path: str) -> None:
    """Finish (or discard) an interrupted compaction. Safe to call
    when no staging exists."""
    staging = os.path.join(path, STAGING)
    manifest = os.path.join(staging, MANIFEST)
    if not os.path.isdir(staging):
        return
    if not os.path.exists(manifest):
        # write never completed — staging holds nothing authoritative
        shutil.rmtree(staging, ignore_errors=True)
        return
    with open(manifest) as f:
        folded = [line.strip() for line in f if line.strip()]
    for d in folded:
        shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    # the manifest stays inside the directory across the rename —
    # removing it first would make a crash-before-rename look like an
    # incomplete write and discard real state; Spark ignores
    # underscore-prefixed files, so it rides along harmlessly
    os.rename(staging, os.path.join(path, "epoch=-1"))


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
    merged.write.mode("overwrite").parquet(staging)
    # the manifest commits the fold set; everything before this line
    # is discardable, everything after is completable (recover_staging)
    with open(os.path.join(staging, MANIFEST), "w") as f:
        f.write("\n".join(os.path.basename(d) for d in fold) + "\n")
    for d in fold:
        shutil.rmtree(d, ignore_errors=True)
    os.rename(staging, os.path.join(path, "epoch=-1"))
    return True


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
