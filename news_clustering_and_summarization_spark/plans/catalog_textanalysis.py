"""Text analysis, sampling and linkage queries.

Split out of the former plans/catalog.py monolith (r08 verdict item
6) — function bodies unchanged; plans.catalog re-exports every name,
so the driver contract, tests and tools are untouched."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from ..functions import hashing as H
from ..functions import vectors as V
from ..operators import chunking as CH
from ..operators import dedup as D
from ..operators import text_analysis as TA
from .catalog_shared import (  # noqa: F401
    load,
    widen,
)

# ---------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------


def q_lang_id(spark, sf):
    docs = load(spark, sf, "documents")
    return docs.select(
        "doc_id", "lang", TA.language_id("text").alias("lang_pred")
    )


def oracle_lang_id() -> str:
    return (
        "SELECT doc_id, lang, "
        f"{TA.language_id_sql('text')} AS lang_pred FROM documents"
    )


def q_quality_score(spark, sf):
    docs = load(spark, sf, "documents")
    return TA.quality_score(docs, "text").select(
        "doc_id", "n_tokens", "quality_score"
    )


def oracle_quality() -> str:
    tok = H.tokens_sql("text")
    return (
        f"SELECT doc_id, len({tok}) AS n_tokens, "
        f"{TA.quality_score_sql('text')} AS quality_score FROM documents"
    )


def q_token_counts(spark, sf):
    docs = load(spark, sf, "documents")
    return TA.token_counts(docs, "text").select(
        "doc_id", "ws_token_count", "bpe_token_estimate"
    )


def oracle_token_counts() -> str:
    ws, bpe = TA.token_counts_sql("text")
    return (
        f"SELECT doc_id, {ws} AS ws_token_count, "
        f"{bpe} AS bpe_token_estimate FROM documents"
    )


def q_fingerprint(spark, sf):
    docs = load(spark, sf, "documents")
    return TA.document_fingerprints(docs)


def oracle_fingerprint() -> str:
    tok = H.tokens_sql("text")
    return f"""
SELECT doc_id, {H.fingerprint_sql(tok)} AS rolling_fp,
       md5(coalesce(text, '')) AS content_md5
FROM documents
"""


def q_scrub_pii(spark, sf):
    """PII redaction (email -> IPv4 -> phone placeholder chain) over
    documents with deterministically injected PII — the fixture corpus
    is clean, so both engines append the same synthetic contact block
    before scrubbing and the oracle hash proves pattern + order parity
    across the Java and RE2 regex dialects."""
    docs = load(spark, sf, "documents")
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 (555) 867-53"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        # datetime survives the phone scrub via the guard (varies by
        # row so the hash proves guard parity across regex dialects)
        F.lit(".7 seen 2026-08-14 0"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit(":22:59 end"),
    )
    return docs.select(
        "doc_id",
        TA.scrub_pii(injected).alias("scrubbed"),
    ).withColumn(
        # count the placeholder tokens specifically — a bare '<' in
        # the source text (residual HTML) must not count as a redaction
        "n_redacted",
        F.size(F.split("scrubbed", "<EMAIL>|<IP>|<PHONE>")) - 1,
    )


def oracle_scrub_pii() -> str:
    injected = (
        "text || ' contact user' || doc_id::VARCHAR || "
        "'@example.com or +1 (555) 867-53' || "
        "lpad((doc_id % 100)::VARCHAR, 2, '0') || "
        "' from 10.0.' || (doc_id % 256)::VARCHAR || "
        "'.7 seen 2026-08-14 0' || (doc_id % 10)::VARCHAR || "
        "':22:59 end'"
    )
    return f"""
SELECT doc_id,
       {TA.scrub_pii_sql(injected)} AS scrubbed,
       len(string_split_regex({TA.scrub_pii_sql(injected)},
           '<EMAIL>|<IP>|<PHONE>')) - 1 AS n_redacted
FROM documents
"""


def q_dedup_paragraphs(spark, sf):
    """Intra-document paragraph dedup (first occurrence kept, order
    preserved) — crawled-page boilerplate removal. The fixture text is
    single-paragraph, so both engines assemble the same 4-paragraph
    document (text twice + a prefix + text again) and the dedup must
    collapse it to 2 paragraphs."""
    docs = load(spark, sf, "documents")
    prefix = F.substring("text", 1, 40)
    doc = F.concat_ws("\n\n", "text", "text", prefix, "text")
    return docs.select(
        "doc_id",
        F.size(F.split(doc, "\n\n")).alias("n_paras_before"),
        F.size(
            F.split(TA.dedup_paragraphs(doc), "\n\n")
        ).alias("n_paras_after"),
        F.length(TA.dedup_paragraphs(doc)).alias("len_after"),
    )


ORACLE_DEDUP_PARAGRAPHS = """
WITH d AS MATERIALIZED (
  SELECT doc_id,
         text || chr(10) || chr(10) || text || chr(10) || chr(10) ||
         substr(text, 1, 40) || chr(10) || chr(10) || text AS doc
  FROM documents
),
p AS (
  SELECT doc_id,
         unnest(string_split(doc, chr(10) || chr(10))) AS para,
         unnest(range(1, len(string_split(doc, chr(10) || chr(10))) + 1))
           AS pos
  FROM d
),
k AS (
  SELECT doc_id, para, pos,
         row_number() OVER (
           PARTITION BY doc_id, trim(para) ORDER BY pos) AS rn
  FROM p
),
agg AS (
  SELECT doc_id,
         count(*) FILTER (WHERE rn = 1)::BIGINT AS n_after,
         string_agg(para, chr(10) || chr(10) ORDER BY pos)
           FILTER (WHERE rn = 1) AS joined
  FROM k GROUP BY doc_id
)
SELECT d.doc_id,
       len(string_split(d.doc, chr(10) || chr(10)))::INT AS n_paras_before,
       agg.n_after::INT AS n_paras_after,
       len(agg.joined)::INT AS len_after
FROM agg JOIN d USING (doc_id)
"""


def q_repetition_signals(spark, sf):
    docs = load(spark, sf, "documents")
    return TA.repetition_signals(docs)


def oracle_repetition() -> str:
    tok = H.tokens_sql("text")
    big = H.word_shingles_sql("t", 2)
    return f"""
WITH tok AS (SELECT doc_id, {tok} AS t FROM documents),
tc AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest(t) AS g FROM tok) GROUP BY doc_id, g
),
ta AS (
  SELECT doc_id, sum(c)::BIGINT AS n, count(*) AS d, max(c) AS m
  FROM tc GROUP BY doc_id
),
bc AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest({big}) AS g FROM tok) GROUP BY doc_id, g
),
ba AS (
  SELECT doc_id, sum(c)::BIGINT AS n, count(*) AS d, max(c) AS m
  FROM bc GROUP BY doc_id
)
SELECT docs.doc_id,
       round(coalesce((ta.n - ta.d)::DOUBLE / ta.n, 0), 6) AS dup_token_frac,
       round(coalesce(ta.m::DOUBLE / ta.n, 0), 6) AS top_token_frac,
       round(coalesce((ba.n - ba.d)::DOUBLE / ba.n, 0), 6) AS dup_bigram_frac,
       round(coalesce(ba.m::DOUBLE / ba.n, 0), 6) AS top_bigram_frac
FROM documents docs
LEFT JOIN ta ON ta.doc_id = docs.doc_id
LEFT JOIN ba ON ba.doc_id = docs.doc_id
"""


def q_skipgram_pairs(spark, sf):
    """word2vec training pairs (operators/chunking.skipgram_pairs):
    (center, context) co-occurrences within a ±2 window, with
    Mikolov frequency subsampling decided content-addressed (keep
    rates quantized to 1e-6 per word, membership by position hash —
    no RNG, identical pairs under any partitioning). The context
    expansion is in-row (offset array explode + equi-join on
    position), never a self-join over the token stream. Oracle
    replays counts, rates, the hash gate, and the window expansion.
    Top 100 pairs by count."""
    from ..operators.chunking import skipgram_pairs

    docs = load(spark, sf, "documents")
    return (
        skipgram_pairs(docs, window=2, subsample_t=1e-3)
        .orderBy(F.desc("pair_count"), "center", "context")
        .limit(100)
    )


def oracle_skipgram_pairs(
    window: int = 2, subsample_t: float = 1e-3
) -> str:
    from ..operators.chunking import SKIPGRAM_QUANT, SKIPGRAM_SEED

    tok = H.tokens_sql("text")
    h = H.hash64_sql(
        "(doc_id::VARCHAR || '|' || pos::VARCHAR)", SKIPGRAM_SEED
    )
    offs = ", ".join(
        str(o) for o in range(-window, window + 1) if o != 0
    )
    return f"""
WITH toks AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS w
  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
        FROM (SELECT doc_id, {tok} AS t FROM documents))
),
wc AS (SELECT w, count(*) AS wn FROM toks GROUP BY w),
tot AS (SELECT sum(wn) AS n FROM wc),
rates AS (
  SELECT w, cast(round(least(1.0,
    sqrt({subsample_t} / (wn::DOUBLE / n))) * {SKIPGRAM_QUANT})
    AS BIGINT) AS keep_q
  FROM wc CROSS JOIN tot
),
kept AS (
  SELECT toks.doc_id, toks.pos, toks.w AS center
  FROM toks JOIN rates ON toks.w = rates.w
  WHERE {h} % {SKIPGRAM_QUANT} < rates.keep_q
),
expanded AS (
  SELECT doc_id, center, pos + o AS cpos
  FROM kept, unnest([{offs}]) AS t(o)
)
SELECT e.center, c.w AS context, count(*) AS pair_count
FROM expanded e JOIN toks c
  ON e.doc_id = c.doc_id AND e.cpos = c.pos
GROUP BY 1, 2
ORDER BY pair_count DESC, center, context
LIMIT 100
"""


def q_gopher_filter(spark, sf):
    """Gopher-style composite quality gate (Rae et al. 2021 §A1.1
    adapted to the engine's columnar signals): token count, bigram
    repetition, single-token dominance, and the heuristic quality
    score vote per document; failures are NAMED (a comma-joined
    reason list in fixed rule order) so curation is debuggable, not
    just a boolean. Pure composition of existing zero-/one-shuffle
    signal operators joined on doc_id — the preset a corpus build
    actually runs, kept as one declarative plan."""
    docs = load(spark, sf, "documents")
    rep = TA.repetition_signals(docs).select(
        "doc_id", "dup_bigram_frac", "top_token_frac"
    )
    qs = TA.quality_score(docs, "text").select(
        "doc_id", "quality_score"
    )
    tc = TA.token_counts(docs, "text").select(
        "doc_id", "ws_token_count"
    )
    j = tc.join(rep, "doc_id").join(qs, "doc_id")
    reasons = F.filter(
        F.array(
            F.when(F.col("ws_token_count") < 10, F.lit("too_short")),
            F.when(
                F.col("dup_bigram_frac") > 0.3, F.lit("repetitive")
            ),
            F.when(
                F.col("top_token_frac") > 0.3, F.lit("dominated")
            ),
            F.when(
                F.col("quality_score") < 0.5, F.lit("low_quality")
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return j.select(
        "doc_id",
        "ws_token_count",
        "dup_bigram_frac",
        "top_token_frac",
        "quality_score",
        (F.size(reasons) == 0).alias("keep"),
        F.array_join(reasons, ",").alias("fail_reasons"),
    ).orderBy("doc_id")


def oracle_gopher_filter() -> str:
    rep = oracle_repetition()
    ws, _ = TA.token_counts_sql("text")
    q = TA.quality_score_sql("text")
    return f"""
WITH rep AS ({rep}),
base AS (
  SELECT d.doc_id, {ws} AS ws_token_count, {q} AS quality_score
  FROM documents d
),
j AS (
  SELECT base.doc_id, base.ws_token_count, rep.dup_bigram_frac,
         rep.top_token_frac, base.quality_score,
         list_filter([
           CASE WHEN base.ws_token_count < 10 THEN 'too_short' END,
           CASE WHEN rep.dup_bigram_frac > 0.3 THEN 'repetitive' END,
           CASE WHEN rep.top_token_frac > 0.3 THEN 'dominated' END,
           CASE WHEN base.quality_score < 0.5 THEN 'low_quality' END
         ], x -> x IS NOT NULL) AS reasons
  FROM base JOIN rep ON base.doc_id = rep.doc_id
)
SELECT doc_id, ws_token_count, dup_bigram_frac, top_token_frac,
       quality_score,
       len(reasons) = 0 AS keep,
       coalesce(array_to_string(reasons, ','), '') AS fail_reasons
FROM j
ORDER BY doc_id
"""


def q_record_linkage(spark, sf):
    """Fellegi–Sunter record linkage (operators/linkage.py) on a
    planted dirty copy of the customer table: copy B perturbs every
    3rd name (char dropped) and every 2nd balance band (drifted by one),
    then blocking on the nation key feeds candidate pairs to integer
    agreement scoring — the equi-join-not-all-pairs shape that makes
    entity resolution survive at scale. Output = pairs clearing the
    match threshold with their agreement vector, exact integer score,
    and the ground-truth same_entity flag (true pairs whose name AND
    phone were both perturbed fall below threshold — the recall cost
    of these weights, visible in the result). Oracle replays
    perturbations, blocking, agreements, and scores."""
    from ..operators.linkage import FieldRule, link_records

    cust = widen(spark, load(spark, sf, "customer")).select(
        "c_custkey",
        "c_nationkey",
        "c_name",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 100).cast("long").alias("band"),
    )
    a = cust.select(
        F.concat(F.lit("a"), F.col("c_custkey")).alias("rec_id"),
        F.col("c_custkey").alias("entity"),
        "c_nationkey",
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        "band",
    )
    b = cust.select(
        F.concat(F.lit("b"), F.col("c_custkey")).alias("rec_id"),
        F.col("c_custkey").alias("entity"),
        "c_nationkey",
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(
                F.substring(F.col("c_name"), 1, 2),
                F.substring(F.col("c_name"), 4, 1000),
            ),
        )
        .otherwise(F.col("c_name"))
        .alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.when(
            F.col("c_custkey") % 2 == 0, F.col("band") + 1
        )
        .otherwise(F.col("band"))
        .alias("band"),
    )
    # weights reflect u-probabilities: names are near-unique (strong
    # evidence), the 5-value segment is weak, the ~110-value band is
    # moderate
    rules = [
        FieldRule("name", 40, -15),
        FieldRule("segment", 10, -10),
        FieldRule("band", 15, -10),
    ]
    linked = link_records(
        a, b, ["c_nationkey"], rules, threshold=30
    )
    truth = (
        a.select(F.col("rec_id").alias("left_id"), F.col("entity").alias("_le"))
    )
    truth_r = (
        b.select(F.col("rec_id").alias("right_id"), F.col("entity").alias("_re"))
    )
    return (
        linked.where("is_match")
        .join(truth, "left_id")
        .join(truth_r, "right_id")
        .select(
            "left_id",
            "right_id",
            "name_agree",
            "segment_agree",
            "band_agree",
            "score",
            (F.col("_le") == F.col("_re")).alias("same_entity"),
        )
        .orderBy("left_id", "right_id")
    )


ORACLE_RECORD_LINKAGE = """
WITH cust AS (
  SELECT c_custkey, c_nationkey, c_name, c_mktsegment,
         cast(floor(c_acctbal / 100) AS BIGINT) AS band
  FROM customer
),
a AS (
  SELECT 'a' || c_custkey AS rec_id, c_custkey AS entity,
         c_nationkey, c_name AS name, c_mktsegment AS segment, band
  FROM cust
),
b AS (
  SELECT 'b' || c_custkey AS rec_id, c_custkey AS entity,
         c_nationkey,
         CASE WHEN c_custkey % 3 = 0
              THEN substr(c_name, 1, 2) || substr(c_name, 4)
              ELSE c_name END AS name,
         c_mktsegment AS segment,
         CASE WHEN c_custkey % 2 = 0 THEN band + 1 ELSE band
         END AS band
  FROM cust
),
scored AS (
  SELECT a.rec_id AS left_id, b.rec_id AS right_id,
         a.name IS NOT DISTINCT FROM b.name AS name_agree,
         a.segment IS NOT DISTINCT FROM b.segment AS segment_agree,
         a.band IS NOT DISTINCT FROM b.band AS band_agree,
         a.entity = b.entity AS same_entity
  FROM a JOIN b ON a.c_nationkey IS NOT DISTINCT FROM b.c_nationkey
)
SELECT left_id, right_id, name_agree, segment_agree, band_agree,
       (CASE WHEN name_agree THEN 40 ELSE -15 END
        + CASE WHEN segment_agree THEN 10 ELSE -10 END
        + CASE WHEN band_agree THEN 15 ELSE -10 END) AS score,
       same_entity
FROM scored
WHERE (CASE WHEN name_agree THEN 40 ELSE -15 END
       + CASE WHEN segment_agree THEN 10 ELSE -10 END
       + CASE WHEN band_agree THEN 15 ELSE -10 END) >= 30
ORDER BY left_id, right_id
"""


REPEATED_PASSAGE_N = 5
REPEATED_PASSAGE_MIN_DOCS = 2


def q_repeated_passages(spark, sf):
    """Cross-document repeated-passage audit (text_analysis.
    repeated_passages): fraction of each doc's distinct 5-grams that
    occur in >= 2 distinct documents corpus-wide."""
    docs = load(spark, sf, "documents")
    return TA.repeated_passages(
        docs, n=REPEATED_PASSAGE_N, min_docs=REPEATED_PASSAGE_MIN_DOCS
    )


def q_quality_classifier(spark, sf):
    """Hashing-trick linear quality scorer (text_analysis.
    hashed_linear_score) with the deterministic demo weight table —
    the fasttext-shaped filter pass of a corpus build. Exact
    fixed-point arithmetic so both engines agree bit-for-bit."""
    docs = load(spark, sf, "documents")
    weights = TA.demo_weights(spark, 1024)
    return TA.hashed_linear_score(docs, weights, n_buckets=1024)


JL_SIGNS = V.rademacher_signs(64, 16, seed=42)


def q_embedding_project(spark, sf):
    """Johnson-Lindenstrauss random projection 64 -> 16 dims
    (vectors.project_jl): Rademacher sign matrix generated driver-side
    from md5 and embedded as literals, order-pinned float chains —
    bit-identical in any engine. Zero-shuffle projection."""
    emb = load(spark, sf, "embeddings")
    v = F.col("embedding").cast("array<double>")
    # exploded to (vec_id, dim, proj) scalars for the driver's pandas
    # canonicalizer (arrays are unhashable there); +0.0 kills -0.0.
    proj = F.transform(
        V.project_jl(v, JL_SIGNS), lambda x: F.round(x, 6) + F.lit(0.0)
    )
    return emb.select(
        "vec_id", F.posexplode(proj).alias("dim", "proj")
    ).select(
        "vec_id", (F.col("dim") + 1).cast("long").alias("dim"), "proj"
    )


def oracle_embedding_project() -> str:
    proj = V.project_jl_sql("v", JL_SIGNS)
    n_out = len(JL_SIGNS)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (SELECT vec_id, {proj} AS pr FROM e)
SELECT vec_id, r.i AS dim, round(pr[r.i], 6) + 0.0 AS proj
FROM p CROSS JOIN range(1, {n_out + 1}) r(i)
"""


def q_embedding_quantize(spark, sf):
    """Symmetric int8 quantization (vectors.quantize_int8):
    scale = max|v|/127, round-half-up via exact floor(x+0.5) — no
    banker's-rounding divergence. 4x storage cut for the embedding
    store; zero-shuffle."""
    emb = load(spark, sf, "embeddings")
    v = F.col("embedding").cast("array<double>")
    scale, q = V.quantize_int8(v)
    # exploded to (vec_id, scale, dim, q) scalars for the driver's
    # pandas canonicalizer; q cast long to match DuckDB BIGINT dtype.
    return emb.select(
        "vec_id",
        (F.round(scale, 6) + F.lit(0.0)).alias("scale"),
        F.posexplode(q).alias("dim", "q"),
    ).select(
        "vec_id",
        "scale",
        (F.col("dim") + 1).cast("long").alias("dim"),
        F.col("q").cast("long").alias("q"),
    )


def oracle_embedding_quantize() -> str:
    scale, q = V.quantize_int8_sql("v")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qq AS (SELECT vec_id, round({scale}, 6) + 0.0 AS scale, {q} AS ql FROM e)
SELECT vec_id, scale, r.i AS dim, ql[r.i]::BIGINT AS q
FROM qq CROSS JOIN range(1, 65) r(i)
"""


def q_collocations(spark, sf):
    """Collocation mining (text_analysis.collocations): top-50 word
    bigrams by lift (= exp PMI), exact integer counts, order-pinned
    double expression for the score — no libm log in either engine."""
    docs = load(spark, sf, "documents")
    return TA.collocations(docs, min_count=5, top_k=50)


def q_select_token_budget(spark, sf):
    """Budgeted corpus selection (sampling.select_token_budget):
    highest-quality-first greedy prefix per language shard under a
    20k-char budget, n_chars standing in for both the quality key and
    the token cost on the synthetic corpus."""
    from ..operators.sampling import select_token_budget

    docs = load(spark, sf, "documents")
    return select_token_budget(
        docs.select("doc_id", "lang", "n_chars"),
        budget=20_000,
        tokens_col="n_chars",
        quality_col="n_chars",
        id_col="doc_id",
        shard_col="lang",
    )


ORACLE_TOKEN_BUDGET = """
SELECT doc_id, lang, n_chars, cum_tokens FROM (
  SELECT doc_id, lang, n_chars,
         CAST(sum(n_chars) OVER (
           PARTITION BY lang ORDER BY n_chars DESC, doc_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM documents)
WHERE cum_tokens <= 20000
"""


CORPUS_BUILD_BUDGET = 50_000


def q_corpus_build(spark, sf):
    """Flagship composition: the whole training-corpus preprocessing
    chain as ONE Spark plan — quality scoring, language ID, exact
    dedup (min-id canonical), quality-first token-budget selection per
    source, and the final per-source accounting. Each stage is an
    operator that is ALSO individually oracle-gated elsewhere in this
    catalog; here the full chain is replayed as one DuckDB query to
    certify the composition, not just the parts."""
    from ..operators.sampling import select_token_budget

    docs = widen(spark, load(spark, sf, "documents")).where(F.col("text").isNotNull())
    # r11: one shared tokenization for every signal (corpus_signals),
    # and a lazy lineage cut so the quality/lang predicate below is not
    # pushed into the projection chain (predicate pushdown substitutes
    # aliases without a cost guard — the before-plan's Filter evaluated
    # split(lower(text)) 97x per row; measured 3.97s -> 1.15s, same
    # rows). The checkpoint is per-invocation (no cross-run reuse).
    scored = TA.corpus_signals(docs).localCheckpoint(eager=False)
    filtered = scored.where(
        (F.col("quality_score") >= 0.5) & (F.col("lang_pred") == "en")
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        filtered.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    budgeted = select_token_budget(
        deduped,
        budget=CORPUS_BUILD_BUDGET,
        tokens_col="bpe_token_estimate",
        quality_col="quality_score",
        id_col="doc_id",
        shard_col="source",
    )
    return budgeted.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("bpe_token_estimate").cast("long").alias("total_tokens"),
    )


def oracle_corpus_build() -> str:
    lang = TA.language_id_sql("text")
    quality = TA.quality_score_sql("text")
    _, bpe = TA.token_counts_sql("text")
    return f"""
WITH scored AS MATERIALIZED (
  SELECT doc_id, source, md5(text) AS h,
         {quality} AS q, {lang} AS lang_pred, {bpe} AS n_tok
  FROM documents WHERE text IS NOT NULL
),
dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
    FROM scored WHERE q >= 0.5 AND lang_pred = 'en')
  WHERE rn = 1
),
budgeted AS (
  SELECT * FROM (
    SELECT *, sum(n_tok) OVER (
      PARTITION BY source ORDER BY q DESC, doc_id
      ROWS UNBOUNDED PRECEDING) AS cum
    FROM dedup)
  WHERE cum <= {CORPUS_BUILD_BUDGET}
)
SELECT source, count(*) AS n_docs, sum(n_tok)::BIGINT AS total_tokens
FROM budgeted GROUP BY source
"""


def q_mix_datasets(spark, sf):
    """Weighted corpus mixture: even-id docs oversampled at 1.5x
    (one whole copy + a content-addressed half sample), odd-id docs
    downsampled to 0.25x. Pure pushed-down filters + UnionExec."""
    from ..operators.sampling import mix_datasets

    docs = load(spark, sf, "documents").select("doc_id", "lang")
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    return mix_datasets([(a, 1.5), (b, 0.25)], key_col="doc_id")


def oracle_mix_datasets() -> str:
    from ..operators.sampling import bucket_sql

    return f"""
SELECT doc_id, lang, 0 AS mix_epoch FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id, lang, 1 AS mix_epoch FROM documents
WHERE doc_id % 2 = 0 AND {bucket_sql('doc_id', 42)} < 500000
UNION ALL
SELECT doc_id, lang, 0 AS mix_epoch FROM documents
WHERE doc_id % 2 = 1 AND {bucket_sql('doc_id', 43)} < 250000
"""


def q_chunk_documents(spark, sf):
    """Fixed-token chunking with overlap — shuffle-free posexplode
    fan-out, preserves input partitioning."""
    docs = load(spark, sf, "documents")
    return CH.chunk_documents(docs, chunk_tokens=32, overlap=8)


def q_pack_sequences(spark, sf):
    """Offset packing into 256-token training sequences, windowed per
    language shard so the cumsum parallelizes."""
    docs = load(spark, sf, "documents")
    return CH.pack_sequences(docs, budget=256, shard_col="lang")


def q_decontaminate(spark, sf):
    """Benchmark decontamination: train docs (doc_id % 13 != 0) that
    share word 3-grams with the held-out "benchmark" slice
    (doc_id % 13 == 0). The benchmark n-gram set is broadcast."""
    docs = load(spark, sf, "documents")
    train = docs.where(F.col("doc_id") % 13 != 0)
    test = docs.where(F.col("doc_id") % 13 == 0)
    return D.decontaminate(train, test, n=3)


def oracle_decontaminate() -> str:
    tok = H.tokens_sql("text")
    sh = H.word_shingles_sql(tok, 3)
    return f"""
WITH s AS (SELECT doc_id, list_distinct({sh}) AS sh FROM documents),
train AS (SELECT * FROM s WHERE doc_id % 13 <> 0 AND len(sh) > 0),
test_g AS (
  SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % 13 = 0
),
hits AS (
  SELECT t.doc_id, count(*) AS n_hit
  FROM (SELECT doc_id, unnest(sh) AS g FROM train) t
  JOIN test_g USING (g) GROUP BY t.doc_id
)
SELECT tr.doc_id, len(tr.sh) AS n_ngrams,
       coalesce(h.n_hit, 0) AS n_hit_ngrams,
       round(coalesce(h.n_hit, 0)::DOUBLE / len(tr.sh), 6)
         AS contamination_frac,
       CASE WHEN coalesce(h.n_hit, 0) > 0 THEN 1 ELSE 0 END AS contaminated
FROM train tr LEFT JOIN hits h ON h.doc_id = tr.doc_id
"""




def q_golden_record(spark, sf):
    """Survivorship merge after linkage (operators/linkage.
    golden_record, r08): the planted dirty customer copies from
    q_record_linkage are linked (same blocking + Fellegi-Sunter
    scores, threshold 30), duplicate groups are the match-pair
    components, and each group's golden record is assembled by rule —
    longest name, max balance band, modal segment, min record id.
    Pairs whose perturbations drove the score below threshold stay
    unlinked, so their two records each survive as singleton goldens
    (the recall cost of the weights, visible here as extra rows).
    The oracle replays linkage, a recursive-CTE closure, and every
    survivorship window."""
    from ..operators.linkage import FieldRule, golden_record, link_records

    cust = widen(spark, load(spark, sf, "customer")).select(
        "c_custkey",
        "c_nationkey",
        "c_name",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 100).cast("long").alias("band"),
    )
    a = cust.select(
        F.concat(F.lit("a"), F.col("c_custkey")).alias("rec_id"),
        "c_nationkey",
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        "band",
    )
    b = cust.select(
        F.concat(F.lit("b"), F.col("c_custkey")).alias("rec_id"),
        "c_nationkey",
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(
                F.substring(F.col("c_name"), 1, 2),
                F.substring(F.col("c_name"), 4, 1000),
            ),
        )
        .otherwise(F.col("c_name"))
        .alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("c_custkey") % 2 == 0, F.col("band") + 1)
        .otherwise(F.col("band"))
        .alias("band"),
    )
    rules = [
        FieldRule("name", 40, -15),
        FieldRule("segment", 10, -10),
        FieldRule("band", 15, -10),
    ]
    linked = link_records(a, b, ["c_nationkey"], rules, threshold=30)
    pairs = linked.where("is_match").select(
        F.col("left_id").alias("l_id"), F.col("right_id").alias("r_id")
    )
    records = a.unionByName(b).select("rec_id", "name", "segment", "band")
    return golden_record(
        records,
        pairs,
        id_col="rec_id",
        longest_cols=("name",),
        max_cols=("band",),
        mode_cols=("segment",),
    ).orderBy("golden_id")


ORACLE_GOLDEN_RECORD = """
WITH RECURSIVE cust AS (
  SELECT c_custkey, c_nationkey, c_name, c_mktsegment,
         cast(floor(c_acctbal / 100) AS BIGINT) AS band
  FROM customer
),
a AS (
  SELECT 'a' || c_custkey AS rec_id, c_nationkey, c_name AS name,
         c_mktsegment AS segment, band
  FROM cust
),
b AS (
  SELECT 'b' || c_custkey AS rec_id, c_nationkey,
         CASE WHEN c_custkey % 3 = 0
              THEN substr(c_name, 1, 2) || substr(c_name, 4)
              ELSE c_name END AS name,
         c_mktsegment AS segment,
         CASE WHEN c_custkey % 2 = 0 THEN band + 1 ELSE band
         END AS band
  FROM cust
),
recs AS MATERIALIZED (
  SELECT * FROM a UNION ALL SELECT * FROM b
),
matched AS MATERIALIZED (
  SELECT a.rec_id AS l_id, b.rec_id AS r_id
  FROM a JOIN b ON a.c_nationkey IS NOT DISTINCT FROM b.c_nationkey
  WHERE (CASE WHEN a.name IS NOT DISTINCT FROM b.name
              THEN 40 ELSE -15 END
         + CASE WHEN a.segment IS NOT DISTINCT FROM b.segment
                THEN 10 ELSE -10 END
         + CASE WHEN a.band IS NOT DISTINCT FROM b.band
                THEN 15 ELSE -10 END) >= 30
),
sym AS (
  SELECT l_id AS src, r_id AS dst FROM matched
  UNION ALL SELECT r_id, l_id FROM matched
),
reach AS (
  SELECT rec_id AS id, rec_id AS comp FROM recs
  UNION
  SELECT s.dst AS id, r.comp FROM reach r JOIN sym s ON s.src = r.id
),
comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id),
base AS MATERIALIZED (
  SELECT c.component, r.* FROM recs r JOIN comp c ON r.rec_id = c.id
),
heads AS (
  SELECT component, min(rec_id) AS golden_id,
         count(*)::BIGINT AS n_members, max(band) AS band
  FROM base GROUP BY component
),
name_pick AS (
  SELECT component, name FROM (
    SELECT component, name,
           row_number() OVER (
             PARTITION BY component
             ORDER BY length(name) DESC, name ASC, rec_id ASC) AS rn
    FROM base) WHERE rn = 1
),
seg_pick AS (
  SELECT component, segment FROM (
    SELECT component, segment,
           row_number() OVER (
             PARTITION BY component
             ORDER BY n DESC, segment ASC) AS rn
    FROM (SELECT component, segment, count(*) AS n
          FROM base GROUP BY 1, 2)) WHERE rn = 1
)
SELECT h.golden_id, h.n_members, np.name, h.band, sp.segment
FROM heads h
JOIN name_pick np USING (component)
JOIN seg_pick sp USING (component)
ORDER BY h.golden_id
"""
