"""Dedup suite (exact, canonical, MinHash, SimHash, embedding, components).

Split out of the former plans/catalog.py monolith (r08 verdict item
6) — function bodies unchanged; plans.catalog re-exports every name,
so the driver contract, tests and tools are untouched."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from ..functions import hashing as H
from ..functions import vectors as V
from ..operators import bloom as BL
from ..operators import dedup as D
from .catalog_shared import (  # noqa: F401
    load,
    widen,
)

# ---------------------------------------------------------------------
# Dedup suite
# ---------------------------------------------------------------------


def q_dedup_exact(spark, sf):
    docs = load(spark, sf, "documents")
    w = Window.partitionBy("content_hash")
    return (
        docs.select("doc_id", F.md5("text").alias("content_hash"))
        .withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("group_size", F.count("*").over(w))
    )


ORACLE_DEDUP_EXACT = """
SELECT doc_id, md5(text) AS content_hash,
       min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
       count(*) OVER (PARTITION BY md5(text)) AS group_size
FROM documents
"""


def q_dedup_bloom(spark, sf):
    """Incremental corpus dedup: "today's batch" (doc_id % 5 == 4)
    deduped against the standing corpus (the rest) through a
    distributed Bloom filter + exact verify (operators/bloom.py).

    Semantics are EXACTLY the plain anti-join (the verify step removes
    Bloom false positives; Bloom filters have no false negatives), so
    the oracle is a straight NOT IN — the sketch is a pure
    performance device. At 100 TB the filter is built once, persisted,
    and each day's batch probes it instead of shuffling the corpus.
    """
    docs = load(spark, sf, "documents").where(F.col("text").isNotNull())
    keyed = docs.select("doc_id", F.md5("text").alias("content_hash"))
    new_batch = keyed.where(F.col("doc_id") % 5 == 4)
    corpus = keyed.where(F.col("doc_id") % 5 != 4)
    # Filter sizing needs the corpus cardinality; a real pipeline
    # carries this as running metadata. Here: parquet row count
    # (metadata-only scan) as an upper bound — overestimating only
    # lowers the false-positive rate.
    n_corpus = load(spark, sf, "documents").count()
    return BL.dedup_against_corpus(
        new_batch, corpus, "content_hash", n_corpus_keys=n_corpus
    )


ORACLE_DEDUP_BLOOM = """
WITH d AS (
  SELECT doc_id, md5(text) AS content_hash
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, content_hash
FROM d
WHERE doc_id % 5 = 4
  AND content_hash NOT IN
      (SELECT content_hash FROM d WHERE doc_id % 5 <> 4)
"""


# Candidate generation caps shingle document-frequency at this value;
# the oracle below encodes the same cap, so both engines drop the same
# hot posting lists (pairs overlapping ONLY on hot shingles are out of
# scope in both — the documented scale guard, not a divergence).
NGRAM_SHINGLE_DF_CAP = 100


def q_dedup_ngram_jaccard(spark, sf):
    docs = load(spark, sf, "documents")
    return D.ngram_jaccard_pairs(
        docs, n=3, threshold=0.5, max_shingle_df=NGRAM_SHINGLE_DF_CAP
    ).withColumn("jaccard", F.round("jaccard", 6))


def oracle_ngram_jaccard() -> str:
    tok = H.tokens_sql("text")
    sh = H.word_shingles_sql(tok, 3)
    return f"""
WITH s AS MATERIALIZED (
  SELECT doc_id AS id, list_distinct({sh}) AS sh FROM documents
  WHERE len({sh}) > 0
),
inv AS MATERIALIZED (SELECT id, unnest(sh) AS g FROM s),
keep AS (SELECT g FROM inv GROUP BY g
         HAVING count(*) <= {NGRAM_SHINGLE_DF_CAP}),
inv2 AS MATERIALIZED (SELECT inv.id, inv.g FROM inv JOIN keep USING (g)),
co AS (
  SELECT a.id AS l_id, b.id AS r_id
  FROM inv2 a JOIN inv2 b ON a.g = b.g AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT co.l_id, co.r_id,
       round(len(list_intersect(sa.sh, sb.sh))::DOUBLE
             / len(list_distinct(sa.sh || sb.sh)), 6) AS jaccard
FROM co
JOIN s sa ON sa.id = co.l_id
JOIN s sb ON sb.id = co.r_id
WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE
      / len(list_distinct(sa.sh || sb.sh)) >= 0.5
"""


def q_dedup_components(spark, sf):
    """Corpus-level dedup resolution: n-gram Jaccard pairs →
    connected components (transitive closure) → min-id canonical
    representative per dup group. The oracle rebuilds the same edge
    set and closes it with a recursive CTE."""
    docs = load(spark, sf, "documents")
    return D.dedup_components(docs, n=3, threshold=0.5, method="ngram")


def oracle_dedup_components() -> str:
    tok = H.tokens_sql("text")
    sh = H.word_shingles_sql(tok, 3)
    return f"""
WITH RECURSIVE s AS MATERIALIZED (
  SELECT doc_id AS id, list_distinct({sh}) AS sh FROM documents
  WHERE len({sh}) > 0
),
inv AS MATERIALIZED (SELECT id, unnest(sh) AS g FROM s),
co AS MATERIALIZED (
  SELECT a.id AS l_id, b.id AS r_id, count(*) AS inter
  FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id
  GROUP BY a.id, b.id
),
pair AS MATERIALIZED (
  SELECT co.l_id, co.r_id
  FROM co
  JOIN (SELECT id, len(sh) AS n FROM s) la ON la.id = co.l_id
  JOIN (SELECT id, len(sh) AS n FROM s) lb ON lb.id = co.r_id
  WHERE inter::DOUBLE / (la.n + lb.n - inter) >= 0.5
),
edges AS MATERIALIZED (
  SELECT l_id AS src, r_id AS dst FROM pair
  UNION ALL SELECT r_id, l_id FROM pair
),
reach AS (
  SELECT doc_id AS id, doc_id AS comp FROM documents
  UNION
  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id, min(comp) AS canonical FROM reach GROUP BY id)
SELECT id AS doc_id, canonical AS canonical_id,
       (id <> canonical) AS is_duplicate
FROM comp
"""


def q_split_leakage_safe(spark, sf):
    """Leakage-safe train/test split: near-duplicate groups (same
    transitive closure as dedup_components) split by the hash bucket
    of their canonical id, so a test document's near-copies can never
    land in train. Oracle reuses the closure and the content-addressed
    bucket, both already hash-verified on their own."""
    from ..operators.sampling import leakage_safe_split

    docs = load(spark, sf, "documents")
    return leakage_safe_split(
        docs, test_fraction=0.2, seed=7, method="ngram", threshold=0.5
    ).select("doc_id", "canonical_id", "split")


def oracle_split_leakage_safe() -> str:
    from ..operators.sampling import SAMPLE_BUCKETS, bucket_sql

    cut = int(round(0.2 * SAMPLE_BUCKETS))
    base = oracle_dedup_components().strip()
    return f"""
WITH base AS ({base})
SELECT doc_id, canonical_id,
       CASE WHEN {bucket_sql("canonical_id", 7)} < {cut}
            THEN 'test' ELSE 'train' END AS split
FROM base
"""


def q_dedup_minhash(spark, sf):
    """Full LSH path: banded candidates verified with exact Jaccard."""
    docs = widen(spark, load(spark, sf, "documents"))
    return D.minhash_near_duplicates(
        docs, n=3, threshold=0.5, k=16, bands=4
    ).withColumn("jaccard", F.round("jaccard", 6))


def oracle_minhash() -> str:
    tok = H.tokens_sql("text")
    sh = H.word_shingles_sql(tok, 3)
    sig = H.minhash_signature_sql("sh", 16)
    return f"""
WITH s AS (
  SELECT doc_id AS id, list_distinct({sh}) AS sh FROM documents
),
sigs AS (
  SELECT id, sh, {sig} AS sig FROM s
  WHERE len(sh) > 0
),
banded AS (
  SELECT id, b AS band,
         md5(array_to_string(list_transform(
           list_slice(sig, b * 4 + 1, b * 4 + 4), x -> x::VARCHAR), ','))
           AS bucket
  FROM sigs, range(0, 4) r(b)
),
cand AS (
  SELECT DISTINCT a.id AS l_id, b.id AS r_id
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
)
SELECT c.l_id, c.r_id,
       round(len(list_intersect(sa.sh, sb.sh))::DOUBLE /
             len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
FROM cand c
JOIN s sa ON sa.id = c.l_id
JOIN s sb ON sb.id = c.r_id
WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE /
      len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5
"""


SEARCH_TERMS = ["spark", "table", "window"]  # in-vocab for the corpus
BM25_K1 = 1.2
BM25_B = 0.75


def q_keyword_search(spark, sf):
    """BM25-shaped keyword retrieval (the RAG-curation serving query):
    per-term saturation tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) times a
    rational idf lift (N-df+0.5)/(df+0.5) — same monotone ranking as
    BM25, no libm log. Determinism: each query term gets its own
    conditional aggregate column and the final score adds them in
    FIXED order (t1+t2+t3), so cross-engine partial-agg order can't
    perturb the floats. Top-20, tiebreak doc_id."""
    docs = load(spark, sf, "documents")
    tok = docs.select(
        "doc_id", F.explode(H.tokens("text")).alias("token")
    )
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.avg("dl").alias("_avgdl"), F.count("*").alias("_n")
    )
    tf = (
        tok.where(F.col("token").isin(SEARCH_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            (
                (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * (
                F.col("tf") * (BM25_K1 + 1)
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1 - BM25_B + BM25_B * F.col("dl") / F.col("_avgdl"))
                )
            ),
        )
    )
    per_term = scored.groupBy("doc_id").agg(
        *[
            F.max(
                F.when(F.col("token") == t, F.col("contrib"))
            ).alias(f"_t{i}")
            for i, t in enumerate(SEARCH_TERMS)
        ]
    )
    score = F.lit(0.0)
    for i in range(len(SEARCH_TERMS)):
        score = score + F.coalesce(F.col(f"_t{i}"), F.lit(0.0))
    return (
        per_term.withColumn("score", F.round(score, 6))
        .select("doc_id", "score")
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


def oracle_keyword_search() -> str:
    tok = H.tokens_sql("text")
    terms = ", ".join(f"'{t}'" for t in SEARCH_TERMS)
    per_term_cols = ", ".join(
        f"max(CASE WHEN token = '{t}' THEN contrib END) AS t{i}"
        for i, t in enumerate(SEARCH_TERMS)
    )
    add_chain = " + ".join(
        f"coalesce(t{i}, 0.0)" for i in range(len(SEARCH_TERMS))
    )
    # ((0.0 + t0) + t1) + t2 matches the Spark fold order exactly
    return f"""
WITH tokens AS MATERIALIZED (
  SELECT doc_id, unnest({tok}) AS token FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM tokens GROUP BY doc_id),
stats AS (SELECT avg(dl) AS avgdl, count(*) AS n FROM dl),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tokens
  WHERE token IN ({terms}) GROUP BY doc_id, token
),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id, tf.token,
         ((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5)) *
         (tf.tf * ({BM25_K1} + 1) /
          (tf.tf + {BM25_K1} *
           (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))) AS contrib
  FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id)
  CROSS JOIN stats
),
per_term AS (
  SELECT doc_id, {per_term_cols} FROM scored GROUP BY doc_id
)
SELECT doc_id, round(0.0 + {add_chain}, 6) AS score
FROM per_term
ORDER BY score DESC, doc_id
LIMIT 20
"""


def q_dedup_minhash_incremental(spark, sf):
    """Near-dup dedup of "today's batch" (doc_id % 5 == 4) against the
    standing corpus via the persisted band-table path
    (dedup.minhash_incremental_near_duplicates): only the batch is
    signed, history is consulted through its LSH index, and the exact
    verify re-shingles candidates only. The near-dup analogue of
    dedup_bloom."""
    docs = load(spark, sf, "documents")
    batch = docs.where(F.col("doc_id") % 5 == 4)
    history = docs.where(F.col("doc_id") % 5 != 4)
    return D.minhash_incremental_near_duplicates(
        batch, history, n=3, threshold=0.5, k=16, bands=4
    ).withColumn("jaccard", F.round("jaccard", 6))


def oracle_minhash_incremental() -> str:
    tok = H.tokens_sql("text")
    sh = H.word_shingles_sql(tok, 3)
    sig = H.minhash_signature_sql("sh", 16)
    return f"""
WITH s AS (
  SELECT doc_id AS id, list_distinct({sh}) AS sh FROM documents
),
sigs AS (
  SELECT id, sh, {sig} AS sig FROM s
  WHERE len(sh) > 0
),
banded AS (
  SELECT id, b AS band,
         md5(array_to_string(list_transform(
           list_slice(sig, b * 4 + 1, b * 4 + 4), x -> x::VARCHAR), ','))
           AS bucket
  FROM sigs, range(0, 4) r(b)
),
cand AS (
  SELECT DISTINCT a.id AS l_id, b.id AS r_id
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket
   AND a.id % 5 = 4 AND b.id % 5 <> 4
)
SELECT c.l_id, c.r_id,
       round(len(list_intersect(sa.sh, sb.sh))::DOUBLE /
             len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
FROM cand c
JOIN s sa ON sa.id = c.l_id
JOIN s sb ON sb.id = c.r_id
WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE /
      len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5
"""


def q_dedup_crosstab(spark, sf):
    """WHERE duplication comes from: MinHash near-dup pairs rolled up
    to an unordered source-pair matrix — the triage view that decides
    which feeds to de-prioritize in a 100 TB crawl. Reuses the gated
    minhash path; adds two dimension joins and one groupBy."""
    docs = load(spark, sf, "documents")
    pairs = D.minhash_near_duplicates(docs, n=3, threshold=0.5, k=16, bands=4)
    src = docs.select("doc_id", "source")
    sa = src.select(
        F.col("doc_id").alias("l_id"), F.col("source").alias("_sa")
    )
    sb = src.select(
        F.col("doc_id").alias("r_id"), F.col("source").alias("_sb")
    )
    return (
        pairs.join(sa, "l_id")
        .join(sb, "r_id")
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_pairs"))
    )


def oracle_dedup_crosstab() -> str:
    return f"""
WITH pairs AS ({oracle_minhash()}),
src AS (SELECT doc_id, source FROM documents)
SELECT least(sa.source, sb.source) AS source_a,
       greatest(sa.source, sb.source) AS source_b,
       count(*) AS n_pairs
FROM pairs p
JOIN src sa ON sa.doc_id = p.l_id
JOIN src sb ON sb.doc_id = p.r_id
GROUP BY 1, 2
"""


def q_distinctive_terms(spark, sf):
    """Per-source distinctive terms (the corpus-scale analogue of the
    reference's most-common-entities serving view, A3): source-level
    tf × (n_sources / source-df) — tf-idf with a rational lift in
    place of the libm log (monotone in df for fixed tf, exact in both
    engines). Top-5 per source, total order (score desc, token)."""
    docs = load(spark, sf, "documents")
    tok = docs.select(
        "source", F.explode(H.tokens("text")).alias("token")
    )
    tf = tok.groupBy("source", "token").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("token").agg(
        F.count("*").alias("df")
    )  # tf rows are distinct per (source, token)
    # O(1)-row broadcast instead of a driver-side count job — one
    # plan, same pattern as collocations' corpus total
    n_src = docs.agg(
        F.countDistinct("source").cast("double").alias("_nsrc")
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("score"), F.col("token")
    )
    return (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n_src))
        .withColumn(
            "score",
            F.round(
                F.col("tf").cast("double")
                * F.col("_nsrc")
                / F.col("df").cast("double"),
                6,
            ),
        )
        .drop("_nsrc")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
        .select("source", "token", "tf", "df", "score", "rank")
    )


def oracle_distinctive_terms() -> str:
    tok = H.tokens_sql("text")
    return f"""
WITH tf AS MATERIALIZED (
  SELECT source, token, count(*) AS tf
  FROM (SELECT source, unnest({tok}) AS token FROM documents)
  GROUP BY source, token
),
dfx AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
nsrc AS (SELECT count(DISTINCT source)::DOUBLE AS n FROM documents),
scored AS (
  SELECT tf.source, tf.token, tf.tf, dfx.df,
         round(tf.tf::DOUBLE * nsrc.n / dfx.df::DOUBLE, 6) AS score
  FROM tf JOIN dfx USING (token) CROSS JOIN nsrc
)
SELECT source, token, tf, df, score,
       row_number() OVER (PARTITION BY source
                          ORDER BY score DESC, token) AS rank
FROM scored
QUALIFY rank <= 5
"""


def q_dedup_simhash(spark, sf):
    docs = load(spark, sf, "documents")
    return D.simhash_fingerprints(docs)


def oracle_simhash() -> str:
    # the hashed-token list must be MATERIALIZED: DuckDB inlines both
    # plain CTEs and subquery projections, re-tokenizing + re-hashing
    # the document once per simhash bit otherwise (64x)
    tok = H.tokens_sql("text")
    return f"""
WITH h AS MATERIALIZED (
  SELECT doc_id, {H.token_hashes_sql(tok)} AS hv FROM documents
)
SELECT doc_id, {H.simhash_from_hashes_sql('hv')} AS simhash FROM h
"""


def q_dedup_embedding(spark, sf):
    emb = load(spark, sf, "embeddings")
    return D.embedding_near_duplicates(
        emb, eps=0.6, strategy="cross"
    ).withColumn("dist", F.round("dist", 6))


def oracle_embedding_neardup() -> str:
    d = V.cosine_distance_sql("a.embedding", "b.embedding")
    return f"""
SELECT a.vec_id AS l_id, b.vec_id AS r_id, round({d}, 6) AS dist
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {d} <= 0.6
"""


def q_embedding_outliers(spark, sf):
    """Distance-to-centroid z-scores per label over the embeddings
    table — the mislabeled-row / off-distribution cleaning signal."""
    from ..operators.evaluation import embedding_outlier_scores

    emb = load(spark, sf, "embeddings")
    return embedding_outlier_scores(emb)


def oracle_embedding_outliers() -> str:
    """Twin of the r10 exact-integer formulation: quantized centroid
    means, integer micro-unit distances, DECIMAL/HUGEINT power sums,
    and the z-score's division order pinned to the Spark expression
    (the old avg/stddev twin hash-diverged at sf1 — unordered double
    sums drift by ulps at 10x group sizes)."""
    d = V.cosine_distance_sql("e.embedding", "c.centroid")
    return f"""
WITH c AS (
  SELECT label, list(m ORDER BY dim) AS centroid FROM (
    -- dims fixed at 64 (TESTDATA embeddings); literal bounds because
    -- this DuckDB build lacks lateral column params in range()
    SELECT label, r.i AS dim,
           sum(floor(embedding[r.i]::DOUBLE * 1e6 + 0.5)::HUGEINT)::DOUBLE
           / (count(*) * 1000000.0) AS m
    FROM embeddings CROSS JOIN range(1, 65) r(i)
    GROUP BY label, r.i
  ) GROUP BY label
),
d AS (
  SELECT e.label, e.vec_id,
         floor({d} * 1e6 + 0.5)::BIGINT AS dq
  FROM embeddings e JOIN c ON e.label = c.label
),
s AS (
  SELECT label, sum(dq::HUGEINT) AS s1,
         sum((dq::HUGEINT) * (dq::HUGEINT)) AS s2,
         count(*)::BIGINT AS n_members
  FROM d GROUP BY label
)
SELECT d.label, d.vec_id, s.n_members,
       d.dq::DOUBLE / 1e6 AS dist,
       round(CASE WHEN (s.n_members::HUGEINT * s.s2 - s.s1 * s.s1) > 0
                  THEN (s.n_members::HUGEINT * d.dq::HUGEINT - s.s1)::DOUBLE
                       / (s.n_members::DOUBLE
                          * sqrt((s.n_members::HUGEINT * s.s2
                                  - s.s1 * s.s1)::DOUBLE
                                 / (s.n_members
                                    * (s.n_members - 1))::DOUBLE))
                  ELSE 0.0 END, 3) + 0.0 AS zscore
FROM d JOIN s ON d.label = s.label
"""


