"""Corpus-curation operators (round-5 engine extension): PII
redaction, per-domain caps, BM25 retrieval, vocabulary coverage, and
n-gram novelty scoring — the C4/RefinedWeb-style cleanup stages that
sit between raw crawl and training mix.

All pure DataFrame expressions with exact DuckDB oracle twins:
regexes stay inside the RE2-safe subset (no lookaround/backrefs) so
Java and RE2 agree; every cross-row float sum is quantized to int64
first (order-free, exact — see functions/exact.py conventions).

Scale notes (100 TB): pii_redact / ngram features are zero-shuffle
projections; domain_cap is one window per source partition (hot
domains are the skew risk — cap rank runs on (source) which is
exactly the partitioning the ingest already has); bm25_search
broadcasts the per-term df table (|query| rows) and never shuffles
the corpus; vocab_coverage is a classic two-level count aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing as H

# --- PII redaction ----------------------------------------------------
# RE2-safe patterns (Java regex agrees on this subset). Order of
# application is part of the contract: EMAIL first (an email contains
# digit runs a PHONE pattern could eat), then IP, then PHONE.

PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+?\d[\d\- ]{7,14}\d", "[PHONE]"),
]


def pii_redact(df: DataFrame, text_col: str) -> DataFrame:
    """Count and redact PII spans. Adds ``n_<kind>`` per pattern plus
    ``redacted`` text; counts are taken on the text each pattern
    actually sees (post prior redactions), matching the oracle."""
    cur = F.col(text_col)
    counts = []
    for kind, pat, token in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{kind}")
        )
        cur = F.regexp_replace(cur, pat, token)
    return df.select("*", *counts, cur.alias("redacted"))


def pii_redact_sql(text_expr: str) -> tuple[list[str], str]:
    """(count exprs aliased n_<kind>, redacted expr) for DuckDB."""
    cur = text_expr
    counts = []
    for kind, pat, token in PII_PATTERNS:
        # DuckDB standard '...' literals pass backslashes through
        # verbatim — escape ONLY quotes, or RE2 sees doubled
        # backslashes and rejects classes like [\d\- ].
        esc = pat.replace("'", "''")
        counts.append(
            f"len(regexp_extract_all({cur}, '{esc}'))::BIGINT AS n_{kind}"
        )
        cur = f"regexp_replace({cur}, '{esc}', '{token}', 'g')"
    return counts, cur


# --- per-domain caps (C4-style) ---------------------------------------


def domain_cap(
    df: DataFrame,
    source_col: str,
    id_col: str,
    quality_col: str,
    cap: int,
    salt_buckets: int = 1,
) -> DataFrame:
    """Keep at most ``cap`` documents per source, best-first by
    (quality DESC, id) — the anti-domination guard every web-crawl
    corpus applies before mixing. One shuffle on source; the output is
    the survivors, so nothing ever concentrates on the driver.

    Hot-domain skew (100 TB): a single mega-domain serializes one
    window partition under the plain plan. ``salt_buckets > 1``
    switches to the EXACT two-phase top-k: rank within (source,
    hash-salt) buckets first and keep each bucket's top ``cap`` (every
    globally-top-cap row survives its bucket, as do all its
    predecessors), then re-rank the <= salt_buckets*cap survivors per
    source — the second window's input is bounded regardless of domain
    size. Identical output to the single-phase plan (see
    tests/test_curation.py::test_domain_cap_salted_equals_plain)."""
    order = (F.col(quality_col).desc(), F.col(id_col))
    if salt_buckets > 1:
        wb = Window.partitionBy(
            source_col, F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
        ).orderBy(*order)
        df = (
            df.withColumn("_brank", F.row_number().over(wb))
            .where(F.col("_brank") <= cap)
            .drop("_brank")
        )
    w = Window.partitionBy(source_col).orderBy(*order)
    return (
        df.withColumn("domain_rank", F.row_number().over(w).cast("long"))
        .where(F.col("domain_rank") <= cap)
    )


# --- BM25 retrieval ---------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUANT = 1_000_000


def bm25_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    top_k: int = 20,
) -> DataFrame:
    """Okapi BM25 over the shared tokenizer. Per-(doc, term) scores
    are quantized to int64 and SUMMED AS INTEGERS, so the corpus-wide
    aggregation is order-free and replays exactly in SQL (the lm.py
    convention). df/N/avgdl are corpus aggregates broadcast into the
    scoring projection — the tokenized per-doc term counts are
    localCheckpoint'd so the corpus is tokenized ONCE (stats pass
    reuses the materialized batch), shuffled never.

    Output: (id_col, score_q, score) top_k by (score_q DESC, id)."""
    terms = sorted(set(query_terms))
    tok_col = F.col("_tok")

    def _tf(word):
        # single-arg lambda: a two-arg lambda would make F.filter pass
        # (element, index) and shadow the captured word
        return F.size(F.filter(tok_col, lambda t: t == F.lit(word)))

    # tokenize ONCE into a column; inlining the tokenizer expression
    # would re-run it per tf_i reference
    base = (
        df.select(F.col(id_col), H.tokens(F.col(text_col)).alias("_tok"))
        .select(
            F.col(id_col),
            F.size(tok_col).alias("dl"),
            *[_tf(w).alias(f"tf_{i}") for i, w in enumerate(terms)],
        )
        .localCheckpoint(eager=False)
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("total_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs")
    parts = []
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
            + F.lit(1.0)
        )
        s = idf * (
            tf
            * (BM25_K1 + 1.0)
            / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / avgdl))
        )
        parts.append(
            F.round(s * F.lit(float(BM25_QUANT))).cast("long")
        )
    score_q = parts[0]
    for p in parts[1:]:
        score_q = score_q + p
    return (
        scored.select(
            id_col,
            score_q.alias("score_q"),
        )
        .where(F.col("score_q") > 0)
        .withColumn(
            "score",
            F.round(F.col("score_q") / F.lit(float(BM25_QUANT)), 6),
        )
        .orderBy(F.col("score_q").desc(), id_col)
        .limit(top_k)
    )


def bm25_search_sql(
    text_expr: str,
    id_col: str,
    table: str,
    query_terms: list[str],
    top_k: int = 20,
) -> str:
    tok = H.tokens_sql(text_expr)
    terms = sorted(set(query_terms))
    tf_cols = ", ".join(
        f"len(list_filter({tok}, t -> t = '{w}'))::BIGINT AS tf_{i}"
        for i, w in enumerate(terms)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df_{i}"
        for i in range(len(terms))
    )
    score_terms = []
    for i in range(len(terms)):
        idf = (
            f"ln((s.n_docs - s.df_{i} + 0.5) / (s.df_{i} + 0.5) + 1.0)"
        )
        tf = f"b.tf_{i}::DOUBLE"
        score_terms.append(
            f"CAST(round({idf} * ({tf} * {BM25_K1 + 1.0!r} / ({tf} + "
            f"{BM25_K1!r} * (1.0 - {BM25_B!r} + {BM25_B!r} * b.dl / "
            f"(s.total_dl::DOUBLE / s.n_docs)))) * {BM25_QUANT}.0) "
            "AS BIGINT)"
        )
    score_q = " + ".join(score_terms)
    return f"""
WITH b AS (
  SELECT {id_col}, len({tok})::BIGINT AS dl, {tf_cols}
  FROM {table}
),
s AS (
  SELECT count(*)::BIGINT AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl,
         {df_cols}
  FROM b
)
SELECT {id_col}, score_q,
       round(score_q / {BM25_QUANT}.0, 6) AS score
FROM (SELECT b.{id_col}, CAST({score_q} AS BIGINT) AS score_q
      FROM b CROSS JOIN s)
WHERE score_q > 0
ORDER BY score_q DESC, {id_col}
LIMIT {top_k}
"""


# --- vocabulary coverage (Zipf head) ----------------------------------


def vocab_coverage(
    df: DataFrame, text_col: str, top_k: int = 100
) -> DataFrame:
    """Rank-frequency head of the corpus vocabulary with cumulative
    coverage — the Zipf curve every tokenizer/vocab decision reads.
    Integer counts and an integer running sum (exact); one shuffle to
    count terms, one single-partition window over only top_k rows.

    Output: (rank, term, freq, cum_freq, cum_share)."""
    tok = H.tokens(F.col(text_col))
    counts = (
        df.select(F.explode(tok).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
    )
    total = counts.agg(
        F.sum("freq").cast("long").alias("_total")
    )
    top = (
        counts.orderBy(F.col("freq").desc(), "term")
        .limit(top_k)
        .crossJoin(F.broadcast(total))
    )
    w = (
        Window.orderBy(F.col("freq").desc(), "term")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.col("freq").desc(), "term"))
        .cast("long")
        .alias("rank"),
        "term",
        "freq",
        F.sum("freq").over(w).cast("long").alias("cum_freq"),
        F.round(
            F.sum("freq").over(w).cast("double") / F.col("_total"), 6
        ).alias("cum_share"),
    )


def vocab_coverage_sql(text_expr: str, table: str, top_k: int = 100) -> str:
    tok = H.tokens_sql(text_expr)
    return f"""
WITH c AS (
  SELECT term, count(*)::BIGINT AS freq
  FROM (SELECT unnest({tok}) AS term FROM {table})
  GROUP BY term
),
tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM c),
top AS (
  SELECT term, freq,
         row_number() OVER (ORDER BY freq DESC, term) AS rank
  FROM c ORDER BY freq DESC, term LIMIT {top_k}
)
SELECT rank, term, freq,
       CAST(sum(freq) OVER (ORDER BY rank
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_freq,
       round(CAST(sum(freq) OVER (ORDER BY rank
            ROWS UNBOUNDED PRECEDING) AS BIGINT)::DOUBLE
            / tot.total, 6) AS cum_share
FROM top CROSS JOIN tot
"""


# --- n-gram novelty ---------------------------------------------------


def ngram_novelty(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """Per-document novelty = fraction of its distinct word n-grams
    that appear in NO other document (the memorization-exposure score
    from the dedup literature, per-doc instead of per-passage).
    Shape: explode distinct (doc, gram-hash) pairs once, count docs
    per gram (one shuffle), semi-aggregate back — candidates only,
    never quadratic.

    Output: (id_col, n_grams, n_shared, novelty); docs with fewer than
    ``n`` tokens have n_grams = 0 and novelty 1.0."""
    grams = df.select(
        F.col(id_col), H.tokens(F.col(text_col)).alias("_tok")
    ).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(
                    H.word_shingles(F.col("_tok"), n),
                    lambda s: H.hash64(s),
                )
            )
        ).alias("g"),
    )
    gdf = grams.groupBy("g").agg(
        F.countDistinct(id_col).alias("_docs")
    )
    per_doc = (
        grams.join(gdf, "g")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum((F.col("_docs") > 1).cast("long")).alias("n_shared"),
        )
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
        F.round(
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                1.0
                - F.coalesce("n_shared", F.lit(0)).cast("double")
                / F.col("n_grams"),
            ).otherwise(F.lit(1.0)),
            6,
        ).alias("novelty"),
    )


def ngram_novelty_sql(
    text_expr: str, id_col: str, table: str, n: int = 8
) -> str:
    tok = H.tokens_sql(text_expr)
    sh = H.word_shingles_sql(tok, n)
    g = H.hash64_sql("s")
    return f"""
WITH grams AS (
  SELECT DISTINCT {id_col}, {g} AS g
  FROM (SELECT {id_col}, unnest({sh}) AS s FROM {table})
),
gdf AS (SELECT g, count(DISTINCT {id_col})::BIGINT AS docs
        FROM grams GROUP BY g),
per_doc AS (
  SELECT grams.{id_col},
         count(*)::BIGINT AS n_grams,
         CAST(sum(CASE WHEN gdf.docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shared
  FROM grams JOIN gdf USING (g) GROUP BY grams.{id_col}
)
SELECT t.{id_col},
       coalesce(p.n_grams, 0)::BIGINT AS n_grams,
       coalesce(p.n_shared, 0)::BIGINT AS n_shared,
       round(CASE WHEN coalesce(p.n_grams, 0) > 0
                  THEN 1.0 - coalesce(p.n_shared, 0)::DOUBLE / p.n_grams
                  ELSE 1.0 END, 6) AS novelty
FROM {table} t LEFT JOIN per_doc p USING ({id_col})
"""


# --- Positional phrase search -----------------------------------------


def phrase_matches(
    df: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact multi-word phrase query — the positional complement to
    the term-level retrieval ops (bm25_search scores bags of words;
    a phrase query needs token ADJACENCY).

    Formulation: for a document table (text stored per row, no
    pre-built index) the optimal plan is a single in-row scan — the
    token array is materialized once (no-CSE-inside-lambda rule) and
    a filter over start offsets checks all k phrase terms by index.
    ZERO shuffles, zero explodes: at 100 TB this is one codegen'd
    pass over the corpus, strictly cheaper than the classic
    posting-list self-join (k-1 shuffles of (doc, pos) pairs) which
    only wins when an inverted index is already materialized — that
    shape is covered by bm25_search's df/posting build.

    Output: (id, n_matches, first_pos, last_pos) for matching docs
    only, positions 1-based token offsets."""
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("empty phrase")
    # terms are embedded in expression text on both engines; the
    # tokenizer alphabet is [a-z0-9] so anything else can never match
    # anyway — reject instead of quoting
    import re as _re

    if not all(_re.fullmatch(r"[a-z0-9]+", t) for t in terms):
        raise ValueError(f"phrase terms must be [a-z0-9]+: {terms!r}")
    k = len(terms)
    # element_at is 1-based like DuckDB's t[i]; Spark's arr[i] is NOT
    cond = " AND ".join(
        f"element_at(_tok, i + {j - 1}) = '{t}'"
        for j, t in enumerate(terms, 1)
    )
    hits = (
        df.select(
            F.col(id_col).alias("id"), H.tokens(F.col(text_col)).alias("_tok")
        )
        .select(
            "id",
            F.expr(
                f"CASE WHEN size(_tok) < {k} THEN array()"
                f" ELSE filter(sequence(1, size(_tok) - {k} + 1),"
                f" i -> {cond}) END"
            ).alias("_pos"),
        )
        .where(F.size("_pos") > 0)
    )
    return hits.select(
        "id",
        F.size("_pos").cast("long").alias("n_matches"),
        F.element_at("_pos", 1).cast("long").alias("first_pos"),
        F.element_at("_pos", -1).cast("long").alias("last_pos"),
    ).orderBy("id")


def phrase_matches_sql(
    table: str,
    phrase: str,
    id_col: str = "doc_id",
    text_expr: str = "text",
) -> str:
    """DuckDB twin of phrase_matches (same 1-based offsets)."""
    import re as _re

    terms = [t for t in phrase.lower().split() if t]
    if not all(_re.fullmatch(r"[a-z0-9]+", t) for t in terms):
        raise ValueError(f"phrase terms must be [a-z0-9]+: {terms!r}")
    k = len(terms)
    cond = " AND ".join(
        f"t[i + {j - 1}] = '{t}'" for j, t in enumerate(terms, 1)
    )
    return f"""
WITH tok AS (
  SELECT {id_col} AS id, {H.tokens_sql(text_expr)} AS t FROM {table}
),
hits AS (
  SELECT id,
         CASE WHEN len(t) < {k} THEN []
              ELSE list_filter(range(1, len(t) - {k} + 2), i -> {cond})
         END AS pos
  FROM tok
)
SELECT id, len(pos)::BIGINT AS n_matches,
       pos[1]::BIGINT AS first_pos,
       pos[-1]::BIGINT AS last_pos
FROM hits WHERE len(pos) > 0 ORDER BY id
"""


# --- hybrid retrieval fusion ------------------------------------------

RRF_K = 60
RRF_QUANT = 10**9


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = RRF_K,
    top_k: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of
    two ranked retrieval lists — the standard hybrid-search combiner
    (lexical BM25 leg + embedding leg) that needs no score
    calibration because only RANKS enter:
    RRF(d) = Σ_legs 1/(k + rank_leg(d)).

    Each term quantizes 1e9/(k+rank) — ONE division of exact ints,
    half-up rounded — and the fused score is an integer sum, so
    the hash-compared output is exact. Full-outer join on the doc
    id over two ≤top-k lists: driver-scale inputs by construction.

    Output: (id, rank_a, rank_b, rrf_q) top_k by (rrf_q DESC, id)."""

    def leg(df, out):
        term = F.floor(
            F.lit(float(RRF_QUANT))
            / (F.lit(k) + F.col(rank_col)).cast("double")
            + F.lit(0.5)
        ).cast("long")
        return df.select(
            F.col(id_col).alias("id"),
            F.col(rank_col).alias(f"rank_{out}"),
            term.alias(f"q_{out}"),
        )
    a = leg(ranked_a, "a")
    b = leg(ranked_b, "b")
    fused = a.join(b, "id", "full_outer").select(
        "id",
        "rank_a",
        "rank_b",
        (
            F.coalesce(F.col("q_a"), F.lit(0))
            + F.coalesce(F.col("q_b"), F.lit(0))
        ).alias("rrf_q"),
    )
    return fused.orderBy(F.col("rrf_q").desc(), "id").limit(top_k)


def rrf_fuse_sql(
    leg_a_cte: str,
    leg_b_cte: str,
    k: int = RRF_K,
    top_k: int = 20,
) -> str:
    """DuckDB twin of rrf_fuse. Each leg CTE must yield (id, rank)."""
    q = float(RRF_QUANT)
    return f"""
WITH la AS MATERIALIZED ({leg_a_cte}),
lb AS MATERIALIZED ({leg_b_cte}),
fused AS (
  SELECT coalesce(la.id, lb.id) AS id, la.rank AS rank_a,
         lb.rank AS rank_b,
         coalesce(floor({q!r} / ({k} + la.rank)::DOUBLE + 0.5)::BIGINT,
                  0)
         + coalesce(floor({q!r} / ({k} + lb.rank)::DOUBLE + 0.5)::BIGINT,
                    0) AS rrf_q
  FROM la FULL OUTER JOIN lb ON la.id = lb.id
)
SELECT id, rank_a, rank_b, rrf_q
FROM fused ORDER BY rrf_q DESC, id LIMIT {top_k}
"""
