"""Streaming incremental dedup against the cumulative corpus, built
on the Bloom filter of operators/bloom.py.

Every micro-batch: probe the persisted filter (fast reject of known
keys), exact-verify only the ``maybe`` candidates against the accepted
key store, emit the novel rows, and fold their keys back into the
filter. The 100 TB history is never rescanned — per batch, work is
O(|batch|) probe + O(|candidates|) verify.

Exactly-once layout (foreachBatch is at-least-once on crash replay):

  * accepted rows land in ``out/epoch=<id>/`` — REPLACED atomically on
    replay of the same epoch, never appended;
  * the verify step reads accepted keys from every epoch EXCEPT the
    current one, so a replayed batch recomputes the same novelty set
    even when the crash happened after this epoch's output (or its
    filter merge) was written;
  * the Bloom word table may transiently include the replayed epoch's
    keys — harmless, Bloom errors are one-sided: extra ``maybe``
    candidates go to the exact verify and come back novel;
  * the filter merge is a bitwise OR — idempotent under replay.

State files are plain parquet managed with the same atomic-swap
discipline as the clustering pipeline (pipeline._atomic_overwrite); a
Delta/Iceberg MERGE would make them transactional commits with the
identical dataflow.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import bloom as B
from .pipeline import _atomic_overwrite, _read_or_empty

WORDS_SCHEMA = "word_idx long, word long"


class BloomDedupStream:
    """foreachBatch sink deduplicating a stream against all history.

    ``n_expected`` sizes the filter for the corpus's expected lifetime
    cardinality (overestimating only lowers the false-positive rate —
    it does NOT break correctness, which the exact verify guarantees
    regardless).
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        key_col: str,
        n_expected: int = 1_000_000,
        fpp: float = 0.01,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.key_col = key_col
        self.m_bits, self.k = B.bloom_params(n_expected, fpp)
        os.makedirs(state_dir, exist_ok=True)

    @property
    def words_path(self) -> str:
        return os.path.join(self.state_dir, "bloom_words")

    @property
    def out_path(self) -> str:
        return os.path.join(self.state_dir, "accepted")

    def _accepted_keys_before(self, epoch_id: int) -> DataFrame:
        """Keys accepted in every epoch but ``epoch_id`` — the replay
        guard: a redelivered batch must not see its own prior output."""
        if not os.path.exists(self.out_path):
            return self.spark.createDataFrame([], f"{self.key_col} string")
        return (
            self.spark.read.option("basePath", self.out_path)
            .parquet(self.out_path)
            .where(F.col("epoch") != epoch_id)
            .select(self.key_col)
        )

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        key = self.key_col
        batch = batch_df.dropDuplicates([key])
        words = _read_or_empty(self.spark, self.words_path, WORDS_SCHEMA)
        prior = self._accepted_keys_before(epoch_id)
        probed = B.bloom_probe(batch, key, words, self.m_bits, self.k)
        novel = (
            probed.where(~F.col("bloom_maybe"))
            .drop("bloom_maybe")
            .unionByName(
                probed.where(F.col("bloom_maybe"))
                .drop("bloom_maybe")
                .join(prior, key, "left_anti")
            )
            # materialize BEFORE state files are swapped underneath
            .localCheckpoint(eager=True)
        )
        # 1. output, keyed by epoch: replay replaces, never duplicates.
        # epoch lives in the directory name only — reading with
        # basePath re-infers it as a partition column.
        novel.write.mode("overwrite").parquet(
            os.path.join(self.out_path, f"epoch={int(epoch_id)}")
        )
        # 2. fold novel keys into the filter (OR — idempotent)
        merged = B.bloom_merge(
            words, B.bloom_build(novel, key, self.m_bits, self.k)
        )
        _atomic_overwrite(merged, self.words_path)

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

    def accepted(self) -> DataFrame:
        """All accepted (novel-at-arrival) rows across epochs."""
        if not os.path.exists(self.out_path):
            return self.spark.createDataFrame([], f"{self.key_col} string")
        return self.spark.read.option("basePath", self.out_path).parquet(
            self.out_path
        )


# --- streaming MinHash near-dup -------------------------------------


class MinhashDedupStream:
    """Streaming MinHash near-duplicate detection against the
    cumulative corpus, on the shared crash-safe epoch-state layout
    (streaming/epoch_state.py) — the near-dup companion of
    BloomDedupStream (which is exact first-seen only) and the last
    gap between the batch and streaming dedup stories.

    State per epoch — all pure INSERTS (band rows are
    content-addressed, shingle hashes are per-doc), so compaction's
    merge is the plain union:

      * ``bands/epoch=<e>/``    (id, band, bucket) — the persisted
        LSH index; every future batch equi-joins against it without
        ever re-signing history;
      * ``shingles/epoch=<e>/`` (id, shh array<long>) — 60-bit hashed
        shingle arrays, exactly what the exact-Jaccard verify reads
        (operators/dedup.hashed_shingles);
      * ``pairs/epoch=<e>/``    (l_id, r_id, jaccard) — the emitted
        near-dup matches, the stream's output.

    Per micro-batch the work is O(|batch| + |candidates|),
    independent of corpus size: shingle + sign the batch once,
    equi-join its band rows against the standing index, verify only
    candidates.

    Exactly-once under crash replay (foreachBatch is at-least-once):
    every per-epoch directory is REPLACED on replay of the same
    epoch, and every history read EXCLUDES the current epoch, so a
    redelivered batch recomputes the identical pair set and state
    rows. The newest epoch is never folded by compaction
    (epoch_state invariant), so the excluded epoch can never hide
    inside ``epoch=-1``.

    stream == batch by construction: band rows come from the same
    minhash_band_table, shingles from the same shingle_arrays, and
    the verify from the same jaccard_on_hashed expressions as batch
    minhash_near_duplicates; cross-epoch pairs are normalized to
    (least, greatest) so ``detect()`` over the whole stream equals
    the batch operator over the union of all batches row-for-row
    (tests/test_streaming_minhash.py). Doc ids are assumed unique
    across the stream (in-batch duplicates are dropped, matching
    BloomDedupStream's contract).

    LSH parameters are FROZEN at first construction (persisted to
    ``_params.json``): band rows computed under different (n, k,
    bands) are not comparable, so a restart with different
    parameters raises instead of silently mixing indexes.
    """

    PARAMS = "_params.json"

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        threshold: float = 0.7,
        k: int | None = None,
        bands: int | None = None,
    ):
        from ..operators import dedup as D

        self.spark = spark
        self.state_dir = state_dir
        self.id_col = id_col
        self.text_col = text_col
        self.n = n
        self.threshold = threshold
        self.k = D.MINHASH_K if k is None else k
        self.bands = D.MINHASH_BANDS if bands is None else bands
        os.makedirs(state_dir, exist_ok=True)
        self._freeze_params()

    def _freeze_params(self) -> None:
        import json

        path = os.path.join(self.state_dir, self.PARAMS)
        mine = {
            "n": self.n,
            "threshold": self.threshold,
            "k": self.k,
            "bands": self.bands,
        }
        if os.path.exists(path):
            with open(path) as f:
                frozen = json.load(f)
            if frozen != mine:
                raise ValueError(
                    f"MinhashDedupStream params {mine} differ from the "
                    f"store's frozen {frozen}; band rows computed under "
                    "different LSH parameters are not comparable"
                )
            return
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(mine, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)

    @property
    def bands_path(self) -> str:
        return os.path.join(self.state_dir, "bands")

    @property
    def shingles_path(self) -> str:
        return os.path.join(self.state_dir, "shingles")

    @property
    def pairs_path(self) -> str:
        return os.path.join(self.state_dir, "pairs")

    def _history(
        self, path: str, epoch_id: int, like: DataFrame
    ) -> DataFrame:
        """All epochs of ``path`` EXCEPT ``epoch_id`` (the replay
        guard), self-healing an interrupted compaction first. The
        empty store borrows ``like``'s schema so id types follow the
        stream's, not a hardcoded guess."""
        from . import epoch_state

        epoch_state.recover_staging(path)
        if not os.path.exists(path):
            return self.spark.createDataFrame([], like.schema)
        return (
            self.spark.read.option("basePath", path)
            .parquet(path)
            .where(F.col("epoch") != epoch_id)
            .drop("epoch")
        )

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        from ..operators import dedup as D

        e = int(epoch_id)
        batch = batch_df.dropDuplicates([self.id_col])
        # docs shorter than n tokens have no shingle and drop out of
        # signatures in the batch operator; keep them out of the
        # stores too (parity + no dead state rows)
        shingled = (
            D.shingle_arrays(batch, self.id_col, self.text_col, self.n)
            .where(F.size("sh") > 0)
            .localCheckpoint(eager=True)
        )
        hashed = D.hashed_shingles(shingled).localCheckpoint(eager=True)
        bands = D.minhash_band_table(
            shingled.select("id", F.col("sh").alias("text")),
            id_col="id", text_col="text",
            n=self.n, k=self.k, bands=self.bands, preshingled=True,
        ).localCheckpoint(eager=True)
        hist_bands = self._history(self.bands_path, e, bands)
        hist_sh = self._history(self.shingles_path, e, hashed)
        # in-batch leg: the batch operator's self-join, l < r
        in_cands = (
            bands.alias("a")
            .join(bands.alias("b"), ["band", "bucket"])
            .where(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("l_id"), F.col("b.id").alias("r_id")
            )
            .distinct()
        )
        in_pairs = D.jaccard_on_hashed(
            in_cands, hashed, hashed, self.threshold
        )
        # cross leg: batch vs the standing corpus through the
        # persisted index — history is never re-signed
        cr_cands = (
            bands.alias("a")
            .join(hist_bands.alias("b"), ["band", "bucket"])
            .where(F.col("a.id") != F.col("b.id"))
            .select(
                F.col("a.id").alias("l_id"), F.col("b.id").alias("r_id")
            )
            .distinct()
        )
        cr_pairs = D.jaccard_on_hashed(
            cr_cands, hashed, hist_sh, self.threshold
        ).select(
            # normalize orientation to the batch operator's l < r
            F.least("l_id", "r_id").alias("l_id"),
            F.greatest("l_id", "r_id").alias("r_id"),
            "jaccard",
        )
        # materialize BEFORE the state writes swap files underneath
        pairs = in_pairs.unionByName(cr_pairs).localCheckpoint(eager=True)
        for df, path in (
            (pairs, self.pairs_path),
            (bands, self.bands_path),
            (hashed, self.shingles_path),
        ):
            df.write.mode("overwrite").parquet(
                os.path.join(path, f"epoch={e}")
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

    def detect(self) -> DataFrame:
        """All near-dup pairs found so far — equals batch
        minhash_near_duplicates over the union of every batch."""
        from . import epoch_state

        epoch_state.recover_staging(self.pairs_path)
        if not os.path.exists(self.pairs_path):
            return self.spark.createDataFrame(
                [], "l_id string, r_id string, jaccard double"
            )
        return (
            self.spark.read.option("basePath", self.pairs_path)
            .parquet(self.pairs_path)
            .drop("epoch")
        )

    def compact(self) -> None:
        """Fold finished epochs of all three stores via the shared
        crash-safe protocol. Rows are pure inserts, so the merge is
        the identity (plain union of the folded directories)."""
        from . import epoch_state

        for path in (self.bands_path, self.shingles_path, self.pairs_path):
            epoch_state.compact_store(self.spark, path, lambda df: df)


# --- streaming perceptual-hash media dedup ---------------------------


class PhashDedupStream:
    """Streaming near-dup IMAGE dedup against the cumulative corpus —
    the multimodal twin of MinhashDedupStream, composed from pieces
    that already exist: real codec decode (multimodal.real_pixels →
    BMP/PNG/JPEG/GIF bytes), integer-exact aHash fingerprints, the
    4x15-bit pigeonhole banding join (lossless at hamming <= 3), and
    the epoch-partitioned exactly-once layout of BloomDedupStream.

    Per micro-batch of media rows (asset_id, payload): fingerprint
    the batch, band-join it against accepted-fingerprint history ∪
    itself, exact-hamming-verify, and accept an asset iff it has NO
    history neighbor and no SMALLER-id batch neighbor (deterministic
    min-id representative per within-batch near-dup group — replay
    recomputes the same set because history excludes the replayed
    epoch). Accepted (asset_id, phash) rows land in
    ``accepted/epoch=<id>/`` — overwritten, never appended, on
    replay; rejected pairs land beside them for audit.

    100 TB shape: history is touched only through the banding
    equi-join on 4 keys per fingerprint (shuffle ∝ batch + matched
    candidates, never a history scan); fingerprints are 8 bytes per
    asset. ``compact()`` folds finished epochs via the shared
    crash-safe protocol."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        max_hamming: int = 3,
        pixel_fn=None,
    ):
        from ..operators import multimodal as MM

        if not 0 <= max_hamming <= 3:
            raise ValueError(
                "banding is lossless only for max_hamming <= 3"
            )
        self.spark = spark
        self.state_dir = state_dir
        self.max_hamming = max_hamming
        self.pixel_fn = pixel_fn or MM.real_pixels
        os.makedirs(state_dir, exist_ok=True)

    @property
    def accepted_path(self) -> str:
        return os.path.join(self.state_dir, "accepted")

    @property
    def pairs_path(self) -> str:
        return os.path.join(self.state_dir, "pairs")

    def _accepted_before(self, epoch_id: int) -> DataFrame:
        if not os.path.exists(self.accepted_path):
            return self.spark.createDataFrame(
                [], "asset_id string, phash long"
            )
        return (
            self.spark.read.option("basePath", self.accepted_path)
            .parquet(self.accepted_path)
            .where(F.col("epoch") != epoch_id)
            .select("asset_id", "phash")
        )

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        from ..functions import hashing as H
        from ..operators import multimodal as MM
        from ..operators.dedup import _block_candidates

        fps = (
            MM.ahash_fingerprints(
                self.pixel_fn(batch_df.dropDuplicates(["asset_id"]))
            )
            .localCheckpoint(eager=True)
        )
        prior = self._accepted_before(epoch_id)
        pool = fps.unionByName(prior).select(
            F.col("asset_id").alias("id"), F.col("phash").alias("fp")
        )
        cand = _block_candidates(pool)
        pairs = cand.where(
            H.hamming_distance(F.col("l_fp"), F.col("r_fp"))
            <= F.lit(self.max_hamming)
        )
        hist_ids = prior.select(F.col("asset_id").alias("_h"))
        # an asset is rejected if near a HISTORY asset (either side)
        # or near a SMALLER-id asset of its own batch
        rej_hist = (
            pairs.join(
                hist_ids, pairs["l_id"] == hist_ids["_h"], "inner"
            ).select(F.col("r_id").alias("asset_id"))
            .unionByName(
                pairs.join(
                    hist_ids, pairs["r_id"] == hist_ids["_h"], "inner"
                ).select(F.col("l_id").alias("asset_id"))
            )
        )
        rej_batch = (
            pairs.join(hist_ids, pairs["l_id"] == hist_ids["_h"],
                       "left_anti")
            .join(hist_ids, pairs["r_id"] == hist_ids["_h"], "left_anti")
            # _block_candidates guarantees l_id < r_id: r loses
            .select(F.col("r_id").alias("asset_id"))
        )
        rejected = rej_hist.unionByName(rej_batch).distinct()
        accepted = fps.join(rejected, "asset_id", "left_anti")
        accepted.write.mode("overwrite").parquet(
            os.path.join(self.accepted_path, f"epoch={int(epoch_id)}")
        )
        pairs.select("l_id", "r_id").write.mode("overwrite").parquet(
            os.path.join(self.pairs_path, f"epoch={int(epoch_id)}")
        )

    def start(self, stream_df: DataFrame, checkpoint: str):
        from . import epoch_state

        epoch_state.freeze_checkpoint(self.state_dir, checkpoint)
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
            .start()
        )

    def accepted(self) -> DataFrame:
        if not os.path.exists(self.accepted_path):
            return self.spark.createDataFrame(
                [], "asset_id string, phash long"
            )
        return self.spark.read.option(
            "basePath", self.accepted_path
        ).parquet(self.accepted_path)

    def compact(self) -> None:
        from . import epoch_state

        for path in (self.accepted_path, self.pairs_path):
            if os.path.exists(path):
                epoch_state.compact_store(self.spark, path, lambda df: df)
