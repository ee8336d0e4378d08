"""Deduplication operators for large-scale training-data pipelines.

Five strategies, all shuffle-conscious and all (except the embedding
variant's candidate stage) reproducible by a DuckDB SQL oracle via the
md5-based primitives in functions.hashing:

  * exact            — md5(normalized text) groupBy. One shuffle on a
                       16-byte key; keeps the lowest doc id per group.
  * minhash LSH      — shingle -> k-minhash signature -> band buckets ->
                       bucket equi-join -> exact-Jaccard verify. The
                       classic web-scale near-dup path: candidate
                       generation is an equi-join on (band, band-hash),
                       never an n² compare.
  * simhash          — 60-bit fingerprint; near-dups = hamming ≤ r on
                       bucket-joined candidates (here: exact-match
                       buckets on rotated halves for r≤3-style recall,
                       plus a verify).
  * n-gram Jaccard   — exact Jaccard over word shingles for pairs
                       sharing ≥1 shingle (inverted-index join).
  * embedding cosine — near-dup = cosine distance ≤ eps on embedding
                       vectors; reuses cluster.similarity_pairs (cross
                       below LSH_THRESHOLD, sign-LSH multiprobe above).

The reference's own near-dup stage is J5 (TF-IDF cosine > 0.9 inside
each cluster, summarization notebook cell 7 `remove_dup_article`,
"keep the earlier article"); `tfidf_near_duplicates` reproduces it
with MLlib HashingTF/IDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import fan_out
from ..functions import hashing as H
from ..functions import vectors as V
from . import cluster as C

# --- exact -----------------------------------------------------------


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical texts. Output: one row per duplicate
    document (id, canonical_id, content_hash); canonical = min id."""
    hashed = df.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("content_hash")
    )
    w = Window.partitionBy("content_hash")
    return (
        hashed.withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("_n", F.count("*").over(w))
        .where(F.col("_n") >= 2)
        .select(id_col, "canonical_id", "content_hash")
    )


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the lowest-id representative of each exact-duplicate group
    (single shuffle on the hash)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# --- n-gram Jaccard --------------------------------------------------


def ngram_candidate_pairs(
    shingled: DataFrame, max_shingle_df: int | None = None
) -> DataFrame:
    """Candidate (l_id, r_id) pairs sharing >=1 indexed shingle, from a
    ``(id, sh array<string>)`` frame. The self-join is quadratic
    *within* each shingle's posting list, so ``max_shingle_df`` drops
    shingles whose document frequency exceeds the cap before the join
    (a stop-word trigram present in 1e5 docs would otherwise emit 1e10
    candidate rows — the classic inverted-index hot-key blowup; MinHash
    banding avoids it by construction, this is the equivalent guard for
    the exact path). ``inter`` counts co-occurrences over *indexed*
    shingles only — exact when uncapped, a lower bound when capped."""
    inv = shingled.select("id", F.explode("sh").alias("s"))
    if max_shingle_df is not None:
        keep = (
            inv.groupBy("s")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= max_shingle_df)
            .select("s")
        )
        # shuffle on s either way — the posting-list self-join below
        # needs that partitioning, so the cap adds no extra exchange
        inv = inv.join(keep, "s")
    return (
        inv.alias("a")
        .join(inv.alias("b"), "s")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("l_id"), F.col("b.id").alias("r_id"))
        .agg(F.count("*").alias("inter"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.7,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard similarity over distinct word n-grams for all
    pairs sharing at least one shingle (inverted-index equi-join on
    the shingle — no cross join). Output: (l_id, r_id, jaccard) with
    l_id < r_id and jaccard >= threshold.

    ``max_shingle_df`` (recommended at corpus scale) caps the document
    frequency of shingles used for *candidate generation* — see
    ngram_candidate_pairs. Jaccard is then re-verified exactly over the
    full shingle sets of each surviving pair, so reported scores are
    identical to the uncapped path; the only recall loss is pairs whose
    entire overlap is hot shingles (which MinHash banding would also
    miss, and whose Jaccard is necessarily low for any non-trivial
    document)."""
    shingled = (
        fan_out(df)
        # tokens materialized in their own projection: Catalyst does
        # not CSE inside the shingle transform's lambda, so an
        # inlined tokenizer tree re-runs per array index
        .select(F.col(id_col).alias("id"), H.tokens(text_col).alias("_tok"))
        .select(
            "id",
            F.array_distinct(
                H.word_shingles(F.col("_tok"), n)
            ).alias("sh"),
        )
        .where(F.size("sh") > 0)
        # materialized once: the sizes branch is scanned twice (l/r
        # joins) and the inverted index once — tokenize+shingle is the
        # expensive expression tree
        .localCheckpoint(eager=True)
    )
    co = ngram_candidate_pairs(shingled, max_shingle_df)
    if max_shingle_df is None:
        # uncapped: inter is the exact intersection size, finish with
        # the cheap size-only joins (no shingle arrays shuffled)
        sizes = shingled.select("id", F.size("sh").alias("n_sh"))
        return (
            co.join(sizes.withColumnRenamed("id", "l_id"), "l_id")
            .withColumnRenamed("n_sh", "l_n")
            .join(sizes.withColumnRenamed("id", "r_id"), "r_id")
            .withColumnRenamed("n_sh", "r_n")
            .select(
                "l_id",
                "r_id",
                (
                    F.col("inter")
                    / (F.col("l_n") + F.col("r_n") - F.col("inter"))
                ).alias("jaccard"),
            )
            .where(F.col("jaccard") >= threshold)
        )
    # capped: inter undercounts pairs that also share hot shingles —
    # verify exactly against the full shingle sets (candidate volume is
    # already bounded by cap^2 per posting list, so this join is small)
    return (
        co.select("l_id", "r_id")
        .join(
            shingled.select(
                F.col("id").alias("l_id"), F.col("sh").alias("l_sh")
            ),
            "l_id",
        )
        .join(
            shingled.select(
                F.col("id").alias("r_id"), F.col("sh").alias("r_sh")
            ),
            "r_id",
        )
        .select(
            "l_id",
            "r_id",
            (
                F.size(F.array_intersect("l_sh", "r_sh"))
                / F.size(F.array_union("l_sh", "r_sh"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# --- MinHash + LSH ---------------------------------------------------

MINHASH_K = 16
MINHASH_BANDS = 4  # 4 rows per band


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = MINHASH_K,
    preshingled: bool = False,
) -> DataFrame:
    """MinHash signatures computed the columnar way: explode distinct
    shingles (one md5 each, JVM-native), then k affine-permutation
    ``min`` aggregates — everything whole-stage-codegen, one shuffle
    on the doc id. Docs with no shingle (shorter than n tokens) drop
    out, matching the expression variant's NULL-filter.
    Output: (id, sig array<long>). With ``preshingled`` the text
    column already holds the distinct shingle array."""
    params = H.minhash_params(k)
    if preshingled:
        base = fan_out(df).select(
            F.col(id_col).alias("id"), F.col(text_col).alias("_sharr")
        )
    else:
        base = fan_out(df).select(
            F.col(id_col).alias("id"), H.tokens(text_col).alias("_tok")
        ).select(
            "id",
            F.array_distinct(
                H.word_shingles(F.col("_tok"), n)
            ).alias("_sharr"),
        )
    exploded = base.select(
        "id", F.explode("_sharr").alias("s")
    ).withColumn("h31", H.shingle_hash31(F.col("s")))
    aggs = [
        F.min(
            (F.lit(a) * F.col("h31") + F.lit(b)) % F.lit(H.MINHASH_PRIME)
        ).alias(f"_mh{i}")
        for i, (a, b) in enumerate(params)
    ]
    return (
        exploded.groupBy("id")
        .agg(*aggs)
        .select("id", F.array(*[f"_mh{i}" for i in range(k)]).alias("sig"))
    )


def minhash_band_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    preshingled: bool = False,
) -> DataFrame:
    """The persistable LSH index: (id, band, bucket) — one row per
    document per band. Write it as parquet once over the corpus and
    every future batch joins against it WITHOUT re-signing history;
    after accepting a batch, append its band rows (pure insert — band
    keys are content-addressed, so the table unions trivially).
    Shared by the one-shot candidate path and the incremental path so
    the two cannot diverge."""
    rows = k // bands
    sig = minhash_signatures(df, id_col, text_col, n, k, preshingled)
    return sig.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.md5(
                    F.array_join(
                        F.transform(
                            F.slice(sig.sig, b * rows + 1, rows),
                            lambda v: v.cast("string"),
                        ),
                        ",",
                    )
                ),
            )
        ).alias("band", "bucket"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    preshingled: bool = False,
) -> DataFrame:
    """Candidate pairs whose signatures collide in >= 1 band.

    Banding: signature split into `bands` slices of k/bands values;
    bucket key = (band index, md5 of joined slice). The join is a plain
    equi-join on the bucket key — the 100 TB-safe path.
    Output: (l_id, r_id) distinct, l_id < r_id.
    """
    banded = minhash_band_table(
        df, id_col, text_col, n, k, bands, preshingled
    )
    return (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("l_id"), F.col("b.id").alias("r_id"))
        .distinct()
    )


def shingle_arrays(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id, sh): the distinct word n-shingle array per document — the
    shared front of every MinHash path. Factored out so the batch
    operator (minhash_near_duplicates) and the streaming accumulator
    (streaming/dedup.MinhashDedupStream) run the SAME expressions and
    stream == batch holds by construction."""
    return fan_out(df).select(
        F.col(id_col).alias("id"), H.tokens(text_col).alias("_tok")
    ).select(
        "id",
        F.array_distinct(
            H.word_shingles(F.col("_tok"), n)
        ).alias("sh"),
    )


def hashed_shingles(shingled: DataFrame) -> DataFrame:
    """(id, shh): shingle arrays mapped to 60-bit hashes — what the
    exact-Jaccard verify actually joins. Intersect/union SIZES — all
    exact Jaccard needs — are identical on a collision-free hash
    (md5-60bit, the repo-wide exactness assumption; ~2^-60 / pair),
    and int64 arrays shuffle 3-4x smaller than marker-laden shingle
    strings. At bench scales the verify side broadcasts and this is
    invisible; at sf10 (600k docs) the join flips to sort-merge and
    the string arrays were the query's dominant shuffle (r09 100x
    rehearsal: 557 MB of the 1.2 GB total). The oracle keeps
    verifying on raw strings — same sizes, same output, and the
    green hash doubles as the collision-freeness check."""
    return shingled.select(
        "id",
        F.transform(F.col("sh"), lambda s: H.hash64(s)).alias("shh"),
    )


def jaccard_on_hashed(
    cands: DataFrame,
    l_hashed: DataFrame,
    r_hashed: DataFrame,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verify of (l_id, r_id) candidates against two
    hashed_shingles frames. Shared by the batch and streaming paths."""
    return (
        cands.join(
            l_hashed.select(
                F.col("id").alias("l_id"), F.col("shh").alias("l_sh")
            ),
            "l_id",
        )
        .join(
            r_hashed.select(
                F.col("id").alias("r_id"), F.col("shh").alias("r_sh")
            ),
            "r_id",
        )
        .select(
            "l_id",
            "r_id",
            (
                F.size(F.array_intersect("l_sh", "r_sh"))
                / F.size(F.array_union("l_sh", "r_sh"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.7,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard (no false positives;
    recall bounded by the banding curve). Output like
    ngram_jaccard_pairs.

    The shingle arrays are materialized once (localCheckpoint) —
    signatures, candidate generation, and both sides of the verify
    join all read them, and tokenize+shingle is the expensive part.
    """
    shingled = shingle_arrays(df, id_col, text_col, n).localCheckpoint(
        eager=True
    )
    cands = minhash_lsh_candidates(
        shingled.select("id", F.col("sh").alias("text")),
        id_col="id",
        text_col="text",
        n=n,
        k=k,
        bands=bands,
        preshingled=True,
    )
    hashed = hashed_shingles(shingled)
    return jaccard_on_hashed(cands, hashed, hashed, threshold)


def minhash_incremental_near_duplicates(
    new_batch: DataFrame,
    history: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.7,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    band_table: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicates of a NEW batch against the standing corpus —
    the incremental companion of minhash_near_duplicates, and the
    near-dup analogue of bloom.dedup_against_corpus.

    Only the batch gets signed; history is consulted through its
    persisted band table (pass ``band_table`` read back from parquet
    to skip re-signing — built here from ``history`` otherwise). The
    exact-Jaccard verify re-shingles ONLY the history docs that
    appear as candidates (semi-join first), so per-batch cost is
    O(|batch| + |candidates|), independent of corpus size.

    Output: (l_id from the batch, r_id from history, jaccard >=
    threshold). Batch-internal pairs are minhash_near_duplicates'
    job; run it on the batch separately.
    """
    if band_table is None:
        band_table = minhash_band_table(
            history, id_col, text_col, n, k, bands
        )
    new_bands = minhash_band_table(new_batch, id_col, text_col, n, k, bands)
    cands = (
        new_bands.alias("a")
        .join(band_table.alias("b"), ["band", "bucket"])
        .where(F.col("a.id") != F.col("b.id"))
        .select(F.col("a.id").alias("l_id"), F.col("b.id").alias("r_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def shingles_of(df: DataFrame, alias: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(alias), H.tokens(text_col).alias("_tok")
        ).select(
            alias,
            F.array_distinct(
                H.word_shingles(F.col("_tok"), n)
            ).alias(f"{alias[:1]}_sh"),
        )

    l_sh = shingles_of(new_batch, "l_id").join(
        cands.select("l_id").distinct(), "l_id", "left_semi"
    )
    r_sh = shingles_of(history, "r_id").join(
        cands.select("r_id").distinct(), "r_id", "left_semi"
    )
    return (
        cands.join(l_sh, "l_id")
        .join(r_sh, "r_id")
        .select(
            "l_id",
            "r_id",
            (
                F.size(F.array_intersect("l_sh", "r_sh"))
                / F.size(F.array_union("l_sh", "r_sh"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# --- SimHash ---------------------------------------------------------


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """SimHash the columnar way: explode tokens (duplicates kept — the
    fingerprint weights by frequency), one native md5 per token, then
    60 conditional-sum aggregates (one per bit) and a final bit
    reassembly — all inside whole-stage codegen, one shuffle.
    Token-less docs get fingerprint 0 (the empty-input convention of
    the expression variant)."""
    exploded = fan_out(df).select(
        F.col(id_col).alias("_id"),
        F.explode(H.tokens(text_col)).alias("t"),
    ).withColumn(
        "h",
        F.conv(
            F.substring(F.md5("t"), 1, H.HASH_HEX_CHARS), 16, 10
        ).cast("long"),
    )
    bit_sums = [
        F.sum(
            F.when(
                (F.col("h") % F.lit(1 << (j + 1))) >= F.lit(1 << j), 1
            ).otherwise(-1)
        ).alias(f"_b{j}")
        for j in range(H.SIMHASH_BITS)
    ]
    fp = (
        exploded.groupBy("_id")
        .agg(*bit_sums)
        .select(
            "_id",
            sum(
                [
                    F.when(F.col(f"_b{j}") > 0, F.lit(1 << j)).otherwise(0)
                    for j in range(H.SIMHASH_BITS)
                ],
                F.lit(0),
            ).cast("long").alias("simhash"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(fp, F.col(id_col) == fp._id, "left")
        .select(id_col, F.coalesce("simhash", F.lit(0)).alias("simhash"))
    )


def _block_candidates(fp: DataFrame, fp_col: str = "fp") -> DataFrame:
    """Pigeonhole candidate join shared by simhash_duplicates and
    multimodal.phash_duplicates: split the 60-bit fingerprint into
    4 x 15-bit blocks; hamming <= 3 ⇒ at least one block identical,
    so an equi-join per block finds every qualifying pair (lossless
    at that threshold). block b = (fp % 2^((b+1)*15)) -
    (fp % 2^(b*15)) — exact integer ops on longs only.

    Input: (id, fp). Output: (l_id, l_fp, r_id, r_fp), l_id < r_id,
    deduplicated across blocks."""
    blocks = 4
    bits_per = H.SIMHASH_BITS // blocks  # 15
    keyed = fp.select(
        "id",
        fp_col,
        F.posexplode(
            F.array(
                *[
                    (
                        (F.col(fp_col) % F.lit(1 << ((b + 1) * bits_per)))
                        - (F.col(fp_col) % F.lit(1 << (b * bits_per)))
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("block", "key"),
    )
    return (
        keyed.alias("a")
        .join(keyed.alias("b"), ["block", "key"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("l_id"),
            F.col(f"a.{fp_col}").alias("l_fp"),
            F.col("b.id").alias("r_id"),
            F.col(f"b.{fp_col}").alias("r_fp"),
        )
        .distinct()
    )


def simhash_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dups by simhash: candidates share an identical quarter of
    the fingerprint (pigeonhole: hamming <= 3 over 4 blocks ⇒ at least
    one block identical), then verified by exact hamming distance.
    Output: (l_id, r_id, hamming), l_id < r_id."""
    fp = simhash_fingerprints(df, id_col, text_col).select(
        F.col(id_col).alias("id"), F.col("simhash").alias("fp")
    )
    cands = _block_candidates(fp)
    return (
        cands.withColumn(
            "hamming", H.hamming_distance(F.col("l_fp"), F.col("r_fp"))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("l_id", "r_id", "hamming")
    )


# --- embedding cosine ------------------------------------------------


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 0.05,
    strategy: str = "auto",
) -> DataFrame:
    """Near-dup pairs by embedding cosine distance <= eps.
    Output: (l_id, r_id, dist), l_id < r_id."""
    pairs = C.similarity_pairs(
        df, df, eps, id_col=id_col, vec_col=vec_col, strategy=strategy
    )
    return pairs.where(F.col("l_id") < F.col("r_id"))


# --- reference J5: TF-IDF near-dup within clusters -------------------


def tfidf_near_duplicates(
    df: DataFrame,
    group_col: str = "cluster",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
    num_features: int = 1 << 16,
) -> DataFrame:
    """J5 (summarization notebook cell 7): within each group, TF-IDF
    cosine similarity > threshold marks the later doc a duplicate.
    MLlib Tokenizer/StopWordsRemover/HashingTF/IDF, then a same-group
    pair join. Output: (group, l_id, r_id, cosine) with l_id < r_id —
    r_id is the one the reference drops."""
    from pyspark.ml.feature import (
        HashingTF,
        IDF,
        StopWordsRemover,
        Tokenizer,
    )
    from pyspark.ml.functions import vector_to_array

    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        F.lower(F.coalesce(F.col(text_col), F.lit(""))).alias("doc"),
    )
    tokened = Tokenizer(inputCol="doc", outputCol="words").transform(base)
    filtered = StopWordsRemover(
        inputCol="words", outputCol="filtered"
    ).transform(tokened)
    tf = HashingTF(
        inputCol="filtered", outputCol="tf", numFeatures=num_features
    ).transform(filtered)
    idf = IDF(inputCol="tf", outputCol="tfidf").fit(tf).transform(tf)
    vecs = idf.select(
        "grp", "id", vector_to_array("tfidf").alias("v")
    )
    pairs = (
        vecs.alias("a")
        .join(vecs.alias("b"), "grp")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("grp").alias(group_col),
            F.col("a.id").alias("l_id"),
            F.col("b.id").alias("r_id"),
            V.cosine_similarity(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .where(F.col("cosine") > threshold)
    )
    return pairs


CONTAIN_QUANT = 1_000_000  # containment quantization denominator


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """ASYMMETRIC shingle containment C(A in B) = |S(A) ∩ S(B)| /
    |S(A)| — the sub-document duplication signal Jaccard misses when
    sizes differ (a paragraph quoted inside a long article has high
    containment but low Jaccard; Broder 1997 distinguishes exactly
    these two resemblance measures). Candidates come from the same
    inverted-index equi-join as the Jaccard path (never a cross
    join); when ``max_shingle_df`` caps hot shingles, the surviving
    pairs are re-verified exactly against full shingle sets.

    Containment is an INTEGER quotient (inter * 1e6 div size) so both
    engines agree bit-for-bit with no rounding discipline. Output:
    (l_id, r_id, inter, l_n, r_n, cont_l_q, cont_r_q) with l_id <
    r_id, where cont_l_q = containment of the LEFT doc's shingles in
    the right (scaled 1e6); keeps pairs with either direction >=
    threshold."""
    shingled = (
        fan_out(df)
        .select(F.col(id_col).alias("id"), H.tokens(text_col).alias("_tok"))
        .select(
            "id",
            F.array_distinct(
                H.word_shingles(F.col("_tok"), n)
            ).alias("sh"),
        )
        .where(F.size("sh") > 0)
        .localCheckpoint(eager=True)
    )
    co = ngram_candidate_pairs(shingled, max_shingle_df)
    if max_shingle_df is None:
        sizes = shingled.select("id", F.size("sh").alias("n_sh"))
        base = (
            co.join(sizes.withColumnRenamed("id", "l_id"), "l_id")
            .withColumnRenamed("n_sh", "l_n")
            .join(sizes.withColumnRenamed("id", "r_id"), "r_id")
            .withColumnRenamed("n_sh", "r_n")
        )
    else:
        base = (
            co.select("l_id", "r_id")
            .join(
                shingled.select(
                    F.col("id").alias("l_id"), F.col("sh").alias("l_sh")
                ),
                "l_id",
            )
            .join(
                shingled.select(
                    F.col("id").alias("r_id"), F.col("sh").alias("r_sh")
                ),
                "r_id",
            )
            .select(
                "l_id",
                "r_id",
                F.size(F.array_intersect("l_sh", "r_sh"))
                .cast("long")
                .alias("inter"),
                F.size("l_sh").cast("long").alias("l_n"),
                F.size("r_sh").cast("long").alias("r_n"),
            )
        )
    thr_q = int(round(threshold * CONTAIN_QUANT))
    return (
        base.select(
            "l_id",
            "r_id",
            F.col("inter").cast("long").alias("inter"),
            F.col("l_n").cast("long").alias("l_n"),
            F.col("r_n").cast("long").alias("r_n"),
            F.expr(f"(inter * {CONTAIN_QUANT}) DIV l_n").alias("cont_l_q"),
            F.expr(f"(inter * {CONTAIN_QUANT}) DIV r_n").alias("cont_r_q"),
        )
        .where(
            F.greatest("cont_l_q", "cont_r_q") >= F.lit(thr_q)
        )
    )


def containment_pairs_sql(
    table: str,
    id_col: str,
    text_expr: str,
    n: int = 5,
    threshold: float = 0.5,
) -> str:
    """Uncapped oracle twin (the catalog query runs uncapped; the
    capped path re-verifies to the same values by construction)."""
    tok = H.tokens_sql(text_expr)
    sh = H.word_shingles_sql(tok, n)
    thr_q = int(round(threshold * CONTAIN_QUANT))
    return f"""
WITH shingled AS (
  SELECT {id_col} AS id, list_distinct({sh}) AS sh FROM {table}
  WHERE len(list_distinct({sh})) > 0
),
inv AS (SELECT id, unnest(sh) AS s FROM shingled),
co AS (
  SELECT a.id AS l_id, b.id AS r_id, count(*)::BIGINT AS inter
  FROM inv a JOIN inv b ON a.s = b.s AND a.id < b.id
  GROUP BY a.id, b.id
),
sizes AS (SELECT id, len(sh)::BIGINT AS n_sh FROM shingled)
SELECT l_id, r_id, inter, ls.n_sh AS l_n, rs.n_sh AS r_n,
       (inter * {CONTAIN_QUANT}) // ls.n_sh AS cont_l_q,
       (inter * {CONTAIN_QUANT}) // rs.n_sh AS cont_r_q
FROM co JOIN sizes ls ON co.l_id = ls.id
        JOIN sizes rs ON co.r_id = rs.id
WHERE greatest((inter * {CONTAIN_QUANT}) // ls.n_sh,
               (inter * {CONTAIN_QUANT}) // rs.n_sh) >= {thr_q}
"""


TFIDF_W_QUANT = 1000  # weight quantization: w = round(tf*idf*1000)


def tfidf_exact_pairs(
    df: DataFrame,
    group_col: str = "cluster",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """J5's TF-IDF cosine near-dup with EXACT cross-engine arithmetic
    and the scalable sparse formulation (the MLlib variant above keeps
    reference-API parity; this one is the 100 TB / oracle-replayable
    path).

    Shape: explode tokens once -> per-(doc, term) tf -> corpus df ->
    smooth idf ln((N+1)/(df+1))+1, weight quantized to int64
    (round(tf*idf*1000)) so per-doc norms and pair dots are INTEGER
    sums (order-free, exact in both engines). Candidate pairs come
    from the inverted-index equi-join on (group, term) — never an n²
    dense crossJoin; terms with df > max_df_frac*N are pruned first
    (stopword-style), which is what bounds the hot-term fan-out.
    cosine = dot / (sqrt(norm_a)*sqrt(norm_b)) — one IEEE double op
    per pair, deterministic.

    Output: (group_col, l_id, r_id, dot_q, cosine) with l_id < r_id,
    cosine >= threshold.
    """
    base = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(id_col).alias("id"),
            F.explode(H.tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("grp", "id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = df.select(id_col).agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = base.groupBy("term").agg(
        F.countDistinct("id").alias("df")
    )
    weighted = (
        base.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("df") <= F.col("n_docs") * F.lit(max_df_frac))
        .select(
            "grp",
            "id",
            "term",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                )
                * F.lit(float(TFIDF_W_QUANT))
            )
            .cast("long")
            .alias("w"),
        )
        .localCheckpoint(eager=False)
    )
    norms = weighted.groupBy("id").agg(
        F.sum(F.col("w") * F.col("w")).alias("norm2")
    )
    a, b = weighted.alias("a"), weighted.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.grp") == F.col("b.grp"))
            & (F.col("a.term") == F.col("b.term"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.grp").alias("grp"),
            F.col("a.id").alias("l_id"),
            F.col("b.id").alias("r_id"),
        )
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot_q"))
    )
    na, nb = norms.alias("na"), norms.alias("nb")
    return (
        dots.join(na, dots.l_id == F.col("na.id"))
        .join(nb, dots.r_id == F.col("nb.id"))
        .select(
            F.col("grp").alias(group_col),
            "l_id",
            "r_id",
            "dot_q",
            F.round(
                F.col("dot_q")
                / (
                    F.sqrt(F.col("na.norm2").cast("double"))
                    * F.sqrt(F.col("nb.norm2").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def tfidf_exact_pairs_sql(
    table: str,
    group_expr: str,
    id_col: str,
    text_expr: str,
    threshold: float = 0.5,
    max_df_frac: float = 0.5,
) -> str:
    tok = H.tokens_sql(text_expr)
    return f"""
WITH base AS (
  SELECT grp, id, term, count(*)::BIGINT AS tf
  FROM (SELECT {group_expr} AS grp, {id_col} AS id,
               unnest({tok}) AS term FROM {table})
  GROUP BY grp, id, term
),
nd AS (SELECT count(*)::BIGINT AS n_docs FROM {table}),
dfreq AS (SELECT term, count(DISTINCT id)::BIGINT AS df
          FROM base GROUP BY term),
weighted AS (
  SELECT grp, id, term,
         CAST(round(tf * (ln((nd.n_docs + 1.0) / (dfreq.df + 1.0))
              + 1.0) * {TFIDF_W_QUANT}.0) AS BIGINT) AS w
  FROM base JOIN dfreq USING (term) CROSS JOIN nd
  WHERE dfreq.df <= nd.n_docs * {max_df_frac!r}
),
norms AS (SELECT id, CAST(sum(w * w) AS BIGINT) AS norm2
          FROM weighted GROUP BY id),
dots AS (
  SELECT a.grp, a.id AS l_id, b.id AS r_id,
         CAST(sum(a.w * b.w) AS BIGINT) AS dot_q
  FROM weighted a JOIN weighted b
    ON a.grp = b.grp AND a.term = b.term AND a.id < b.id
  GROUP BY a.grp, a.id, b.id
)
SELECT dots.grp, l_id, r_id, dot_q,
       round(dot_q / (sqrt(na.norm2::DOUBLE) * sqrt(nb.norm2::DOUBLE)),
             6) AS cosine
FROM dots JOIN norms na ON dots.l_id = na.id
          JOIN norms nb ON dots.r_id = nb.id
WHERE round(dot_q / (sqrt(na.norm2::DOUBLE) * sqrt(nb.norm2::DOUBLE)),
            6) >= {threshold!r}
"""


# --- benchmark decontamination --------------------------------------


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Flag training documents sharing word n-grams with a benchmark
    ("test") set — the standard pre-training decontamination check.

    Output per train doc: ``(doc_id, n_ngrams, n_hit_ngrams,
    contamination_frac, contaminated)`` where ``n_hit_ngrams`` counts
    the doc's distinct n-grams that occur anywhere in the test set.

    Scale: the benchmark side is tiny relative to a 100 TB train
    corpus, so its distinct n-gram set is broadcast; the train side is
    exploded once and the only shuffles are the two per-doc groupBys
    (both partial-aggregated map-side). No cross join, no driver
    collect.
    """

    def shingle(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col), H.tokens(text_col).alias("_tok")
        ).select(
            id_col,
            F.array_distinct(
                H.word_shingles(F.col("_tok"), n)
            ).alias("sh"),
        )

    train_sh = shingle(fan_out(train)).where(F.size("sh") > 0)
    test_grams = (
        shingle(test)
        .select(F.explode("sh").alias("g"))
        .distinct()
    )
    inv = train_sh.select(id_col, F.explode("sh").alias("g"))
    hits = (
        inv.join(F.broadcast(test_grams), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_ngrams"))
    )
    return (
        train_sh.select(id_col, F.size("sh").alias("n_ngrams"))
        .join(hits, id_col, "left")
        .select(
            id_col,
            "n_ngrams",
            F.coalesce("n_hit_ngrams", F.lit(0)).alias("n_hit_ngrams"),
            F.round(
                F.coalesce("n_hit_ngrams", F.lit(0))
                / F.col("n_ngrams").cast("double"),
                6,
            ).alias("contamination_frac"),
            F.when(F.coalesce("n_hit_ngrams", F.lit(0)) > 0, 1)
            .otherwise(0)
            .alias("contaminated"),
        )
    )


# --- corpus-level dedup: pair graph -> components -------------------


def dedup_components(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    method: str = "minhash",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Corpus-level near-duplicate resolution: pair edges from the
    chosen detector, connected components over them (transitive
    closure — A~B, B~C dedups all three together), and the min-id
    member as each group's canonical representative.

    Output: (doc_id, canonical_id, is_duplicate) for EVERY input doc —
    ``is_duplicate`` marks rows a dedup pass would drop
    (``doc_id != canonical_id``). Reuses the clustering engine's graph
    contraction CC, so the same code path that scales the ε-graph
    clustering scales this.
    """
    from .cluster import connected_components

    if method == "minhash":
        pairs = minhash_near_duplicates(
            df, id_col=id_col, text_col=text_col, n=n, threshold=threshold
        )
    elif method == "ngram":
        # at corpus scale pass max_shingle_df — the exact-path hot-key
        # guard (minhash banding needs none; it never joins a full
        # posting list)
        pairs = ngram_jaccard_pairs(
            df, id_col=id_col, text_col=text_col, n=n,
            threshold=threshold, max_shingle_df=max_shingle_df,
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    vertices = df.select(F.col(id_col).alias("_v"))
    comp = connected_components(
        vertices, pairs.select("l_id", "r_id"), id_col="_v"
    )
    return comp.select(
        F.col("_v").alias(id_col),
        F.col("component").alias("canonical_id"),
        (F.col("_v") != F.col("component")).alias("is_duplicate"),
    )


# --- semantic (SemDeDup-style) ---------------------------------------


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    tau: float,
    n_iter: int = 2,
    dim: int = 64,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    k-means partitions the embedding space so the quadratic cosine
    compare runs per cluster, never corpus-wide — choose k ~ N/1000
    and each cluster's self-join touches ~10^6 pairs regardless of
    corpus size, the paper's exact scale argument. A row is dropped
    when a SMALLER-id row in its cluster has cosine similarity >= tau
    (greedy min-id survivor — deterministic, and an anti-join rather
    than a transitive closure, matching the paper's one-pass pruning).

    Determinism contract for the SQL oracle: assignments come from
    lloyd_kmeans (index-ordered folds, per-iteration 9-decimal
    centroid rounding, operators/kmeans.py), and the cosine uses the
    same left-fold dot products in both engines with the pair fixed in
    (smaller id, larger id) orientation, so threshold compares see
    identical doubles.

    r11 shape (guide §2.4, measured): assignment is attached as a
    centroid-literal projection instead of lloyd_kmeans + a
    vecs-to-assignment id join — one exchange fewer ahead of the
    cluster self-join. (An applyInPandas per-cluster NumPy prune
    kernel was also A/B'd here: ~1s SLOWER at bench scale — the
    cluster exchange + Arrow round trip outweighs vectorizing ~3e5
    interpreted pair folds; numbers in OPTIMIZATION_r11.md.)

    Returns (id_col, cluster, keep) over every input row.
    """
    from .kmeans import assign_to_centroids, lloyd_centroids

    vecs = df.select(id_col, vec_col)
    id_type = dict(vecs.dtypes)[id_col]
    centroids = lloyd_centroids(
        vecs, id_col, vec_col, k=k, n_iter=n_iter, dim=dim
    )
    if not centroids:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, cluster int, keep boolean"
        )
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(F.col(vec_col), F.col(vec_col), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    sided = assign_to_centroids(vecs, vec_col, centroids).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        norm.alias("_n"),
        "cluster",
    )
    a, b = sided.alias("a"), sided.alias("b")
    # zero-norm vectors (empty docs embedded to zeros) have no cosine:
    # guard the division so they never match anything (NULL predicate
    # filters the pair) instead of erroring under ANSI or — worse —
    # NaN-matching everything with ANSI off
    cos = F.when(
        (F.col("a._n") > 0) & (F.col("b._n") > 0),
        F.aggregate(
            F.zip_with(F.col("a._v"), F.col("b._v"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        / (F.col("a._n") * F.col("b._n")),
    )
    # per-cluster self-join: both sides shuffle on the cluster key and
    # the compare stays inside each (bounded) cluster
    dropped = (
        a.join(b, "cluster")
        .where(F.col("a._id") < F.col("b._id"))
        .where(cos >= F.lit(tau))
        .select(F.col("b._id").alias("_drop"))
        .distinct()
    )
    return (
        sided.join(dropped, sided["_id"] == dropped["_drop"], "left")
        .select(
            F.col("_id").alias(id_col),
            "cluster",
            F.col("_drop").isNull().alias("keep"),
        )
    )


# --- maximal duplicated-span audit (exact substring dedup) ------------


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_span: int = 8,
) -> DataFrame:
    """Maximal duplicated-SPAN detection — the distributed shape of
    exact substring deduplication (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", which removes
    repeated substrings >= 50 tokens via a suffix array; a suffix
    array is not a cluster-friendly structure, so this uses the
    standard n-gram-anchor reformulation: a token is part of a
    duplicated span iff it is covered by an n-gram occurring in >= 2
    distinct documents, and maximal spans are runs of overlapping
    duplicated anchors).

    Pipeline: positional n-grams (token array materialized once) ->
    gram document frequency (map-side-combined count distinct) ->
    semi-join positions whose gram is shared -> per-doc
    gaps-and-islands (lag window: a new island starts when the next
    duplicated anchor position jumps by > n, i.e. coverage no longer
    overlaps or touches) -> island spans [min_pos, max_pos + n - 1],
    kept at >= ``min_span`` tokens. Islands are disjoint by
    construction so per-doc duplicated-token totals never
    double-count.

    Scale: the anchor explode is the corpus token stream (the same
    volume every TF pass moves); the window partitions per doc_id.
    Unlike pair-forming dedup there is NO candidate join at all —
    cost is linear in corpus size, which is exactly why the
    substring formulation is the one that runs at 100 TB.

    Output: (id, n_tok, n_spans, dup_tokens, dup_frac_q) for docs
    with at least one qualifying span; positions are 0-based."""
    from ..functions.exact import half_away_div

    grams = (
        fan_out(df)
        .select(
            F.col(id_col).alias("id"), H.tokens(F.col(text_col)).alias("_tok")
        )
        .select(
            "id",
            F.size("_tok").cast("long").alias("n_tok"),
            F.posexplode(H.word_shingles(F.col("_tok"), n)).alias(
                "pos", "g"
            ),
        )
    )
    shared = (
        grams.groupBy("g")
        .agg(F.countDistinct("id").alias("_df"))
        .where(F.col("_df") >= 2)
        .select("g")
    )
    dup_pos = grams.join(shared, "g", "left_semi").select(
        "id", "n_tok", "pos"
    )
    w = Window.partitionBy("id").orderBy("pos")
    islands = (
        dup_pos.withColumn(
            "_new",
            F.when(
                F.lag("pos").over(w).isNull()
                | (F.col("pos") - F.lag("pos").over(w) > n),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "_island",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("id", "n_tok", "_island")
        .agg(
            (F.max("pos") - F.min("pos") + n).cast("long").alias("_span_len")
        )
        .where(F.col("_span_len") >= min_span)
    )
    return (
        islands.groupBy("id", "n_tok")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum("_span_len").cast("long").alias("dup_tokens"),
        )
        .select(
            "id",
            "n_tok",
            "n_spans",
            "dup_tokens",
            half_away_div("1000000 * dup_tokens", "n_tok")
            .cast("long")
            .alias("dup_frac_q"),
        )
        .orderBy("id")
    )


def duplicate_spans_sql(
    table: str,
    id_col: str = "doc_id",
    text_expr: str = "text",
    n: int = 5,
    min_span: int = 8,
) -> str:
    """DuckDB twin of duplicate_spans (same 0-based anchor positions,
    same island rule)."""
    from ..functions.exact import half_away_div_sql
    from ..functions.hashing import tokens_sql, word_shingles_sql

    return f"""
WITH tok AS (
  SELECT {id_col} AS id, {tokens_sql(text_expr)} AS t FROM {table}
),
grams AS (
  SELECT id, len(t)::BIGINT AS n_tok,
         unnest(range(0, len(sh))) AS pos, unnest(sh) AS g
  FROM (SELECT id, t, {word_shingles_sql('t', n)} AS sh FROM tok)
),
shared AS (
  SELECT g FROM grams GROUP BY g HAVING count(DISTINCT id) >= 2
),
dup_pos AS (
  SELECT id, n_tok, pos FROM grams WHERE g IN (SELECT g FROM shared)
),
flagged AS (
  SELECT id, n_tok, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                   OR pos - lag(pos) OVER w > {n}
              THEN 1 ELSE 0 END AS new_island
  FROM dup_pos
  WINDOW w AS (PARTITION BY id ORDER BY pos)
),
islands AS (
  SELECT id, n_tok,
         sum(new_island) OVER (PARTITION BY id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS island,
         pos
  FROM flagged
),
spans AS (
  SELECT id, n_tok,
         (max(pos) - min(pos) + {n})::BIGINT AS span_len
  FROM islands GROUP BY id, n_tok, island
  HAVING max(pos) - min(pos) + {n} >= {min_span}
)
SELECT id, n_tok, count(*)::BIGINT AS n_spans,
       CAST(sum(span_len) AS BIGINT) AS dup_tokens,
       {half_away_div_sql('CAST(sum(span_len) AS BIGINT) * 1000000',
                          'n_tok')}::BIGINT AS dup_frac_q
FROM spans GROUP BY id, n_tok ORDER BY id
"""


def source_jaccard(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Corpus-level pairwise Jaccard between SOURCES over word
    n-gram shingle sets — the dedup-planning view ("how much does
    crawl A overlap crawl B?") that decides which corpus pairs are
    worth a document-level near-dup pass at all.

    Exact, not sketched: distinct (source, shingle-hash) is one
    shuffle keyed on the hash; pair intersections come from a
    self-join ON THE SHINGLE KEY (rows per shingle = #sources
    containing it, so the blowup is sources-per-shingle², bounded
    by the source count — never documents²); set sizes broadcast
    back. jaccard_q = one IEEE division of exact ints, half-up
    quantized.

    Output: (src_a, src_b, inter, size_a, size_b, jaccard_q)."""
    from ..functions import hashing as H

    sh = (
        df.select(
            F.col(source_col).alias("src"),
            F.explode(
                H.word_shingles(H.tokens(text_col), shingle_n)
            ).alias("g"),
        )
        .select("src", H.hash64(F.col("g")).alias("sh"))
        .distinct()
        .localCheckpoint(eager=True)  # feeds sizes AND the pair join
    )
    sizes = sh.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    a = sh.select(F.col("src").alias("src_a"), "sh")
    b = sh.select(F.col("src").alias("src_b"), "sh")
    inter = (
        a.join(b, "sh")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    out = (
        inter.join(
            F.broadcast(sizes.withColumnRenamed("src", "src_a")
                        .withColumnRenamed("sz", "size_a")),
            "src_a",
        )
        .join(
            F.broadcast(sizes.withColumnRenamed("src", "src_b")
                        .withColumnRenamed("sz", "size_b")),
            "src_b",
        )
    )
    union_sz = (
        F.col("size_a") + F.col("size_b") - F.col("inter")
    ).cast("double")
    return out.select(
        "src_a",
        "src_b",
        "inter",
        "size_a",
        "size_b",
        F.floor(
            F.col("inter").cast("double") / union_sz * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("jaccard_q"),
    ).orderBy("src_a", "src_b")


def _kmv_short_sources(taus: DataFrame, filtered: DataFrame, k: int) -> DataFrame:
    """Lossless-ness audit for the KMV τ-prefilter: a source whose
    threshold actually cut (τ < 2^60) must retain ≥ k distinct
    survivors, else its true bottom-k may have been clipped — those
    sources get recomputed unfiltered (expected never; #sources-row
    action). Driven from ``taus`` (EVERY source), not from
    ``filtered``: a source whose τ cut ALL its hashes has zero
    survivor rows and would be invisible to a survivors-only scan
    (r08 advisor finding) — the left join + coalesce(0) catches it.

    ``taus``: (src, _tau); ``filtered``: (src, h, _tau) survivors.
    Returns a one-column (src) frame of sources needing recompute."""
    maxh = 1 << 60
    survivors = filtered.groupBy("src").agg(F.count(F.lit(1)).alias("_n"))
    return (
        taus.join(survivors, "src", "left")
        .select(
            "src",
            F.coalesce(F.col("_n"), F.lit(0)).alias("_n"),
            "_tau",
        )
        .where((F.col("_n") < k) & (F.col("_tau") < F.lit(maxh)))
        .select("src")
    )


def source_jaccard_kmv(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = 512,
    prefilter_margin: int | None = 4,
) -> DataFrame:
    """Sketched source-pair Jaccard: the planning variant of
    [[source_jaccard]] (r07 verdict item 3). The exact operator's
    shingle-key self-join fans out #sources² rows per universal
    shingle and its distinct-shingle table is corpus-sized; for the
    stated use — "which corpus pairs are worth a document-level
    near-dup pass" — a per-source KMV bottom-k sketch answers the
    same question at a fixed, corpus-size-independent pair cost.

    Shape: ONE map-side-combinable distinct over (source, shingle
    hash) — the only corpus-scale pass, no self-join — then a
    per-source bottom-k window (k rows per source survive). All
    pair math runs on the #sources·k-row sketch table: kilobytes at
    ANY corpus size. Jaccard estimate is the Beyer et al. 2007
    combined-sketch estimator: matches/k' where k' = |bottom-k of
    the sketch union| and matches counts hashes present in both
    sides (closed under the KMV merge property, so the estimate is
    EXACT whenever the true union fits in k).

    Determinism: md5-derived 60-bit hashes; divisions are single
    IEEE ops on exact integers, half-up quantized — the
    kmv_distinct pattern.

    ``prefilter_margin`` (r08 verdict item 3) removes the one
    corpus-scale SHUFFLE: only hashes that can possibly land in a
    source's bottom-k need to reach the distinct + window, so a
    per-source static threshold τ_s = 2^60 · margin·k / d̂_s (d̂_s
    from one map-side-combinable ``approx_count_distinct`` pass —
    kilobytes of HLL sketch shuffle, never rows) broadcast-filters
    the exploded stream before the distinct. LOSSLESS by
    construction: if ≥ k distinct survivors exist below τ_s, the
    true bottom-k all sit below τ_s; any source that comes up short
    (or whose τ_s saturated at 2^60, i.e. nothing was cut) is
    detected from the per-source survivor counts and recomputed
    unfiltered — margin 4 over a 2%-rsd HLL makes that a ~34σ
    event. Cost shape at 100 TB: the filtered distinct shuffles
    ~#sources·margin·k rows instead of every distinct corpus
    shingle; the price is one extra compute-only pass over the
    exploded shingles. ``prefilter_margin=None`` keeps the direct
    single-pass path (used by the oracle-shape tests).

    Output: (src_a, src_b, k_ab, matches, union_est, inter_est,
    jaccard_q) for ALL source pairs — zero-overlap pairs included,
    unlike the exact variant's inner join, because "no overlap" is
    the planning answer that skips a near-dup pass entirely."""
    from ..functions import hashing as H

    MAXH = 1 << 60
    exploded = df.select(
        F.col(source_col).alias("src"),
        F.explode(
            H.word_shingles(H.tokens(text_col), shingle_n)
        ).alias("g"),
    )
    hashed = exploded.select("src", H.hash64(F.col("g")).alias("h"))
    if prefilter_margin is None:
        sh = hashed.distinct()
    else:
        budget = prefilter_margin * k
        # r11 (guide §1.2 "don't compute things you throw away"): the
        # τ pass only needs a per-source distinct ESTIMATE, so it runs
        # approx_count_distinct straight on the shingle strings (HLL
        # xxhash64-hashes its input internally) instead of first
        # computing the md5-derived sketch hash for every shingle —
        # the md5 leg is now paid once, in the filtered pass below.
        # τ shifts by the estimator's hash-dependent wobble only; the
        # shortfall detector + redo keep the output exact regardless.
        taus = exploded.groupBy("src").agg(
            F.when(
                F.approx_count_distinct("g", 0.02) <= F.lit(budget),
                F.lit(MAXH),
            )
            .otherwise(
                F.least(
                    F.lit(MAXH),
                    F.ceil(
                        F.lit(float(MAXH))
                        / F.approx_count_distinct("g", 0.02)
                        * F.lit(budget)
                    ),
                )
            )
            .cast("long")
            .alias("_tau")
        )
        # r11 (guide §1.2): taus feeds BOTH the broadcast prefilter
        # join and the shortfall detector; un-checkpointed, the
        # detector's join re-ran the whole explode+HLL corpus pass a
        # second time. #sources rows — the checkpoint is free.
        taus = taus.localCheckpoint(eager=True)
        filtered = (
            hashed.join(F.broadcast(taus), "src")
            .where(F.col("h") < F.col("_tau"))
            .select("src", "h", "_tau")
            .distinct()
            .localCheckpoint(eager=True)
        )
        bad = [r.src for r in _kmv_short_sources(taus, filtered, k).collect()]
        sh = filtered.select("src", "h")
        if bad:
            redo = (
                hashed.where(F.col("src").isin(bad))
                .distinct()
            )
            sh = sh.where(~F.col("src").isin(bad)).unionByName(redo)
    w = Window.partitionBy("src").orderBy("h")
    sk = (
        sh.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("src", "h")
        .localCheckpoint(eager=True)
    )
    srcs = sk.select("src").distinct()
    # #sources² pair frame — source-dimension bounded, kilobytes at
    # any corpus scale (whitelisted non-equi join, like hash_ring)
    pairs = (
        srcs.select(F.col("src").alias("src_a"))
        .join(
            F.broadcast(srcs.select(F.col("src").alias("src_b"))),
            F.col("src_a") < F.col("src_b"),
        )
    )
    ua = pairs.join(
        sk.withColumnRenamed("src", "src_a"), "src_a"
    ).select("src_a", "src_b", "h")
    ub = pairs.join(
        sk.withColumnRenamed("src", "src_b"), "src_b"
    ).select("src_a", "src_b", "h")
    u = (
        ua.unionAll(ub)
        .groupBy("src_a", "src_b", "h")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    wp = Window.partitionBy("src_a", "src_b").orderBy("h")
    comb = u.withColumn("_rn", F.row_number().over(wp)).where(
        F.col("_rn") <= k
    )
    agg = comb.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).cast("long").alias("k_ab"),
        F.max("h").alias("_kth"),
        F.sum((F.col("_n") == 2).cast("long")).cast("long").alias("matches"),
    )
    union_est = F.when(
        F.col("k_ab") < F.lit(k), F.col("k_ab")
    ).otherwise(
        F.floor(
            (F.col("k_ab") - F.lit(1)).cast("double")
            * (F.lit(float(1 << 60)) / F.col("_kth").cast("double"))
            + F.lit(0.5)
        ).cast("long")
    )
    out = agg.withColumn("union_est", union_est)
    jac = F.col("matches").cast("double") / F.col("k_ab").cast("double")
    return out.select(
        "src_a",
        "src_b",
        "k_ab",
        "matches",
        "union_est",
        F.floor(jac * F.col("union_est").cast("double") + F.lit(0.5))
        .cast("long")
        .alias("inter_est"),
        F.floor(jac * F.lit(1e6) + F.lit(0.5)).cast("long").alias("jaccard_q"),
    ).orderBy("src_a", "src_b")


def source_jaccard_kmv_sql(
    table: str = "documents",
    source_col: str = "source",
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = 512,
) -> str:
    """DuckDB twin of source_jaccard_kmv."""
    from ..functions import hashing as H

    tok = H.tokens_sql(text_col)
    shg = H.word_shingles_sql(tok, shingle_n)
    hh = H.hash64_sql("g")
    return f"""
WITH sh AS MATERIALIZED (
  SELECT DISTINCT {source_col} AS src, {hh} AS h
  FROM (SELECT {source_col}, unnest({shg}) AS g FROM {table})
),
sk AS MATERIALIZED (
  SELECT src, h FROM (
    SELECT src, h, row_number() OVER (PARTITION BY src ORDER BY h) AS rn
    FROM sh
  ) WHERE rn <= {k}
),
srcs AS (SELECT DISTINCT src FROM sk),
pairs AS (
  SELECT a.src AS src_a, b.src AS src_b
  FROM srcs a JOIN srcs b ON a.src < b.src
),
u AS (
  SELECT src_a, src_b, h, count(*) AS n FROM (
    SELECT p.src_a, p.src_b, s.h
    FROM pairs p JOIN sk s ON s.src = p.src_a
    UNION ALL
    SELECT p.src_a, p.src_b, s.h
    FROM pairs p JOIN sk s ON s.src = p.src_b
  ) GROUP BY 1, 2, 3
),
comb AS (
  SELECT * FROM (
    SELECT src_a, src_b, h, n,
           row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
    FROM u
  ) WHERE rn <= {k}
),
agg AS (
  SELECT src_a, src_b,
         count(*)::BIGINT AS k_ab,
         max(h) AS kth,
         sum(CASE WHEN n = 2 THEN 1 ELSE 0 END)::BIGINT AS matches
  FROM comb GROUP BY 1, 2
),
est AS (
  SELECT src_a, src_b, k_ab, matches,
         CASE WHEN k_ab < {k} THEN k_ab
              ELSE floor((k_ab - 1)::DOUBLE
                         * ({float(1 << 60)} / kth::DOUBLE) + 0.5)::BIGINT
         END AS union_est
  FROM agg
)
SELECT src_a, src_b, k_ab, matches, union_est,
       floor((matches::DOUBLE / k_ab::DOUBLE) * union_est::DOUBLE
             + 0.5)::BIGINT AS inter_est,
       floor((matches::DOUBLE / k_ab::DOUBLE) * 1e6 + 0.5)::BIGINT
         AS jaccard_q
FROM est
ORDER BY src_a, src_b
"""


def source_jaccard_sql(
    table: str = "documents",
    source_col: str = "source",
    text_col: str = "text",
    shingle_n: int = 3,
) -> str:
    """DuckDB twin of source_jaccard."""
    from ..functions import hashing as H

    tok = H.tokens_sql(text_col)
    sh = H.word_shingles_sql(tok, shingle_n)
    hh = H.hash64_sql("g")
    return f"""
WITH sh AS MATERIALIZED (
  SELECT DISTINCT {source_col} AS src, {hh} AS sh
  FROM (SELECT {source_col}, unnest({sh}) AS g FROM {table})
),
sizes AS (SELECT src, count(*)::BIGINT AS sz FROM sh GROUP BY src),
inter AS (
  SELECT a.src AS src_a, b.src AS src_b, count(*)::BIGINT AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.src < b.src
  GROUP BY 1, 2
)
SELECT i.src_a, i.src_b, i.inter,
       sa.sz AS size_a, sb.sz AS size_b,
       floor(i.inter::DOUBLE
             / (sa.sz + sb.sz - i.inter)::DOUBLE * 1e6 + 0.5)::BIGINT
         AS jaccard_q
FROM inter i
JOIN sizes sa ON sa.src = i.src_a
JOIN sizes sb ON sb.src = i.src_b
ORDER BY src_a, src_b
"""


def setsim_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_num: int = 1,
    threshold_den: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """EXACT all-pairs set-similarity self-join at Jaccard >=
    num/den via prefix filtering (Chaudhuri-Ganti-Kaushik 2006 /
    Bayardo-Ma-Srikant AllPairs 2007) — the deterministic
    complement to MinHash LSH: no bands, no probability of a miss.

    The theorem: order the universe by GLOBAL token frequency
    (rarest first); if J(A,B) >= t then A and B must share a token
    within their first |s| - ceil(t·|s|) + 1 ordered tokens. So the
    candidate join keys only on PREFIX tokens — the frequent tokens
    that would explode a naive token join never enter the join, by
    construction (rare tokens have tiny postings). Verification is
    an exact integer intersect on the candidate pairs only, and the
    threshold test den·|∩| >= num·|∪| never touches a float.

    Shape: one token groupBy (frequencies), one per-doc rank window
    (prefix pick), one equi-join on prefix tokens, array-intersect
    verify. 100 TB: postings of prefix tokens are the only fan-out,
    bounded by rare-token frequencies.

    Output: (id_a, id_b, inter, union_sz, jaccard_q)."""
    from ..functions import hashing as HH

    # similarity universe: word n-gram shingles (shingle_n=1 = plain
    # tokens). Shingles are far more discriminative than tokens on a
    # shared-vocabulary corpus, and their frequency skew is exactly
    # what makes the prefix filter selective
    unit = (
        F.explode(HH.word_shingles(HH.tokens(text_col), shingle_n))
        if shingle_n > 1
        else F.explode(HH.tokens(text_col))
    )
    toks = (
        df.select(F.col(id_col).alias("id"), unit.alias("t"))
        .distinct()
        .localCheckpoint(eager=True)  # freq, prefix AND set legs
    )
    freq = toks.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    keyed = toks.join(freq, "t").select(
        "id",
        "t",
        F.concat(
            F.lpad(F.col("f").cast("string"), 12, "0"), F.col("t")
        ).alias("k"),
    )
    wsz = Window.partitionBy("id")
    wrk = Window.partitionBy("id").orderBy("k")
    ranked = keyed.withColumn(
        "sz", F.count(F.lit(1)).over(wsz).cast("long")
    ).withColumn("rk", F.row_number().over(wrk).cast("long"))
    # prefix length p = sz - ceil(t*sz) + 1
    ceil_t = F.expr(
        f"({threshold_num} * sz + {threshold_den} - 1)"
        f" DIV {threshold_den}"
    )
    prefix = ranked.where(
        F.col("rk") <= F.col("sz") - ceil_t + F.lit(1)
    ).select("id", "t")
    cand = (
        prefix.select(F.col("id").alias("id_a"), "t")
        .join(prefix.select(F.col("id").alias("id_b"), "t"), "t")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sets = toks.groupBy("id").agg(
        F.sort_array(F.collect_set("t")).alias("ts"),
        F.count(F.lit(1)).cast("long").alias("sz"),
    )
    joined = (
        cand.join(
            sets.select(
                F.col("id").alias("id_a"),
                F.col("ts").alias("ts_a"),
                F.col("sz").alias("sz_a"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col("id").alias("id_b"),
                F.col("ts").alias("ts_b"),
                F.col("sz").alias("sz_b"),
            ),
            "id_b",
        )
        .withColumn(
            "inter",
            F.size(F.array_intersect("ts_a", "ts_b")).cast("long"),
        )
        .withColumn(
            "union_sz", F.col("sz_a") + F.col("sz_b") - F.col("inter")
        )
        .where(
            F.lit(threshold_den) * F.col("inter")
            >= F.lit(threshold_num) * F.col("union_sz")
        )
    )
    return joined.select(
        "id_a",
        "id_b",
        "inter",
        "union_sz",
        F.floor(
            F.col("inter").cast("double")
            / F.col("union_sz").cast("double")
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("jaccard_q"),
    ).orderBy("id_a", "id_b")


def setsim_join_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_num: int = 1,
    threshold_den: int = 2,
    shingle_n: int = 3,
) -> str:
    """DuckDB oracle — deliberately the INDEPENDENT quadratic
    formulation (exact Jaccard over all pairs), so a green hash
    certifies the prefix filter is LOSSLESS, not just replayed."""
    from ..functions import hashing as HH

    tok = HH.tokens_sql(text_col)
    unit = (
        HH.word_shingles_sql(tok, shingle_n) if shingle_n > 1 else tok
    )
    return f"""
WITH sets AS MATERIALIZED (
  SELECT {id_col} AS id, list_sort(list(DISTINCT t)) AS ts,
         count(DISTINCT t)::BIGINT AS sz
  FROM (SELECT {id_col}, unnest({unit}) AS t FROM {table})
  GROUP BY {id_col}
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         len(list_intersect(a.ts, b.ts))::BIGINT AS inter,
         (a.sz + b.sz - len(list_intersect(a.ts, b.ts)))::BIGINT
           AS union_sz
  FROM sets a JOIN sets b ON a.id < b.id
)
SELECT id_a, id_b, inter, union_sz,
       floor(inter::DOUBLE / union_sz::DOUBLE * 1e6 + 0.5)::BIGINT
         AS jaccard_q
FROM pairs
WHERE {threshold_den} * inter >= {threshold_num} * union_sz
ORDER BY id_a, id_b
"""
