"""Text-analysis operators for training-data curation (engine
extension): language ID, quality scoring, token counting, document
fingerprinting. All pure Column expressions (JVM-side, codegen) with
exact DuckDB oracle equivalents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions.exact import sql_str_lit

# --- language ID (stopword-hit heuristic) ----------------------------
# Tiny per-language function-word lists; score = fraction of tokens
# that are language stopwords; argmax with deterministic tie-break on
# language code. 'und' when nothing matches.

LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "como", "para"],
    "fr": ["le", "la", "les", "des", "est", "dans", "que", "pour", "une", "sur"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"],
}


def _lang_score(tok: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    hits = F.size(F.filter(tok, lambda t: F.array_contains(arr, t)))
    return hits / F.greatest(F.size(tok), F.lit(1))


def language_id(text_col: Column | str) -> Column:
    tok = H.tokens(text_col)
    scores = [(lang, _lang_score(tok, ws)) for lang, ws in sorted(LANG_MARKERS.items())]
    best = scores[0]
    # fold: keep the max score, earlier (lexically-first) language wins ties
    lang_expr, score_expr = F.lit(best[0]), best[1]
    for lang, sc in scores[1:]:
        lang_expr = F.when(sc > score_expr, F.lit(lang)).otherwise(lang_expr)
        score_expr = F.when(sc > score_expr, sc).otherwise(score_expr)
    return F.when(score_expr > 0, lang_expr).otherwise(F.lit("und"))


def corpus_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All per-document curation signals (quality features + score,
    language prediction, token counts) computed from ONE shared
    tokenization.

    The naive composition (quality_score ∘ language_id ∘ token_counts,
    each calling ``H.tokens`` afresh, plus the argmax when-fold
    duplicating every score subtree) evaluates ``split(lower(text))``
    ~97× per row once a downstream predicate is pushed into it (r11
    corpus_build before-plan). Here each expensive alias lives in its
    own projection and is referenced as a plain attribute: tokens once,
    each language score once, the argmax over cheap column refs. Same
    expressions, same values — only the evaluation count changes.

    NOTE for callers that filter on the outputs: predicate pushdown
    substitutes aliases without a cost guard, re-inlining the whole
    tree into the pushed Filter. Cut lineage first
    (``df.localCheckpoint(eager=False)``) when filtering on
    quality_score/lang_pred directly above this (q_corpus_build does).
    """
    d = df.withColumn("__tok", H.tokens(text_col))
    d = quality_features(d, text_col, tokens_col="__tok")
    d = token_counts(d, text_col, tokens_col="__tok")
    langs = sorted(LANG_MARKERS.items())
    d = d.withColumns(
        {f"__s_{lang}": _lang_score(F.col("__tok"), ws) for lang, ws in langs}
    )
    len_ok = F.when(
        (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 1.0
    ).otherwise(0.25)
    wl_ok = F.when(
        (F.col("mean_word_len") >= 2.0) & (F.col("mean_word_len") <= 12.0), 1.0
    ).otherwise(0.5)
    stop_ok = F.when(F.col("stopword_ratio") >= 0.05, 1.0).otherwise(0.5)
    punct_ok = F.when(F.col("punct_ratio") <= 0.2, 1.0).otherwise(0.5)
    lang_expr, score_expr = F.lit(langs[0][0]), F.col(f"__s_{langs[0][0]}")
    for lang, _ in langs[1:]:
        sc = F.col(f"__s_{lang}")
        lang_expr = F.when(sc > score_expr, F.lit(lang)).otherwise(lang_expr)
        score_expr = F.when(sc > score_expr, sc).otherwise(score_expr)
    d = d.withColumns(
        {
            "quality_score": F.round(
                (len_ok * wl_ok * stop_ok * punct_ok).cast("double"), 6
            ),
            "lang_pred": F.when(score_expr > 0, lang_expr).otherwise(
                F.lit("und")
            ),
        }
    )
    return d.drop("__tok", *[f"__s_{lang}" for lang, _ in langs])


def language_id_sql(expr: str) -> str:
    tok = H.tokens_sql(expr)
    parts_score = []
    for lang, ws in sorted(LANG_MARKERS.items()):
        arr = "[" + ", ".join(sql_str_lit(w) for w in ws) + "]"
        parts_score.append(
            (
                lang,
                "(len(list_filter({t}, x -> list_contains({a}, x)))::DOUBLE"
                " / greatest(len({t}), 1))".format(t=tok, a=arr),
            )
        )
    lang_expr, score_expr = f"'{parts_score[0][0]}'", parts_score[0][1]
    for lang, sc in parts_score[1:]:
        lang_expr = (
            f"CASE WHEN {sc} > {score_expr} THEN '{lang}' ELSE {lang_expr} END"
        )
        score_expr = (
            f"CASE WHEN {sc} > {score_expr} THEN {sc} ELSE {score_expr} END"
        )
    return f"CASE WHEN {score_expr} > 0 THEN {lang_expr} ELSE 'und' END"


# --- quality scoring -------------------------------------------------
# length / punctuation-density / stopword-ratio heuristics in the
# Gopher/C4 style, combined into one [0,1] score.

_STOPWORDS_EN = LANG_MARKERS["en"]


def quality_features(
    df: DataFrame, text_col: str = "text", tokens_col: str | None = None
) -> DataFrame:
    """When ``tokens_col`` is None the token array is materialized once
    in its own projection (r11: the three token-derived features would
    otherwise each re-evaluate the regex split per row — CollapseProject
    keeps a non-cheap, multi-referenced alias in its own Project)."""
    drop_tok = tokens_col is None
    if tokens_col is None:
        tokens_col = "__qf_tok"
        df = df.withColumn(tokens_col, H.tokens(text_col))
    tok = F.col(tokens_col)
    c = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(c)
    n_tokens = F.size(tok)
    arr = F.array(*[F.lit(w) for w in _STOPWORDS_EN])
    stop_hits = F.size(F.filter(tok, lambda t: F.array_contains(arr, t)))
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    mean_word_len = F.when(n_tokens > 0,
        F.aggregate(tok, F.lit(0), lambda a, t: a + F.length(t)) / n_tokens
    ).otherwise(F.lit(0.0))
    out = df.withColumns(
        {
            "n_chars": n_chars.cast("long"),
            "n_tokens": n_tokens.cast("long"),
            "stopword_ratio": (
                stop_hits / F.greatest(n_tokens, F.lit(1))
            ).cast("double"),
            "punct_ratio": (
                n_punct / F.greatest(n_chars, F.lit(1))
            ).cast("double"),
            "mean_word_len": mean_word_len.cast("double"),
        }
    )
    return out.drop("__qf_tok") if drop_tok else out


def quality_score(
    df: DataFrame, text_col: str = "text", tokens_col: str | None = None
) -> DataFrame:
    """Composite [0,1] quality score: in-range length, sane mean word
    length, some stopwords, low punctuation density (C4/Gopher-style
    rules re-expressed as smooth penalties)."""
    feats = quality_features(df, text_col, tokens_col=tokens_col)
    len_ok = F.when(
        (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 1.0
    ).otherwise(0.25)
    wl_ok = F.when(
        (F.col("mean_word_len") >= 2.0) & (F.col("mean_word_len") <= 12.0), 1.0
    ).otherwise(0.5)
    stop_ok = F.when(F.col("stopword_ratio") >= 0.05, 1.0).otherwise(0.5)
    punct_ok = F.when(F.col("punct_ratio") <= 0.2, 1.0).otherwise(0.5)
    return feats.withColumn(
        "quality_score",
        F.round((len_ok * wl_ok * stop_ok * punct_ok).cast("double"), 6),
    )


QUALITY_SQL_FRAGMENTS = {
    # mirrors quality_features/quality_score for the oracle; {t} = text expr
    "n_chars": "length(coalesce({t}, ''))",
    "n_tokens": "len({tok})",
}


def quality_score_sql(text_expr: str) -> str:
    tok = H.tokens_sql(text_expr)
    t = f"coalesce({text_expr}, '')"
    arr = "[" + ", ".join(sql_str_lit(w) for w in _STOPWORDS_EN) + "]"
    n_chars = f"length({t})"
    n_tokens = f"len({tok})"
    stop_ratio = (
        f"(len(list_filter({tok}, x -> list_contains({arr}, x)))::DOUBLE"
        f" / greatest({n_tokens}, 1))"
    )
    punct_ratio = (
        f"(({n_chars} - length(regexp_replace({t}, '[^\\w\\s]', '', 'g')))::DOUBLE"
        f" / greatest({n_chars}, 1))"
    )
    mean_wl = (
        f"CASE WHEN {n_tokens} > 0 THEN "
        f"list_reduce(list_prepend(0, list_transform({tok}, x -> length(x))), (a, v) -> a + v)::DOUBLE / {n_tokens} "
        f"ELSE 0.0 END"
    )
    # the ::DOUBLE casts keep DuckDB from inferring DECIMAL from the
    # 1.0/0.25 literals (schema parity with Spark's double)
    return (
        "round(("
        f"(CASE WHEN {n_tokens} BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.25 END) * "
        f"(CASE WHEN {mean_wl} BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * "
        f"(CASE WHEN {stop_ratio} >= 0.05 THEN 1.0 ELSE 0.5 END) * "
        f"(CASE WHEN {punct_ratio} <= 0.2 THEN 1.0 ELSE 0.5 END)"
        ")::DOUBLE, 6)"
    )


# --- token counting --------------------------------------------------


def token_counts(
    df: DataFrame, text_col: str = "text", tokens_col: str | None = None
) -> DataFrame:
    """Whitespace tokens plus a BPE-ish subword estimate: words are
    split every 4 characters (ceil(len/4) pieces), digits/punctuation
    count singly — a deterministic stand-in for a real tokenizer's
    piece count, good enough for budget accounting."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    ws_tokens = F.size(
        F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))
    )
    tok = F.col(tokens_col) if tokens_col else H.tokens(text_col)
    bpe_est = F.aggregate(
        tok,
        F.lit(0),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("int"),
    )
    return df.withColumns(
        {
            "ws_token_count": ws_tokens.cast("long"),
            "bpe_token_estimate": bpe_est.cast("long"),
        }
    )


def token_counts_sql(text_expr: str) -> tuple[str, str]:
    t = f"coalesce({text_expr}, '')"
    tok = H.tokens_sql(text_expr)
    ws = (
        f"len(list_filter(regexp_split_to_array({t}, '\\s+'), x -> x <> ''))"
    )
    bpe = (
        f"list_reduce(list_prepend(0, list_transform({tok}, "
        f"x -> ceil(length(x) / 4.0)::INT)), (a, v) -> a + v)::BIGINT"
    )
    return ws, bpe


# --- fingerprinting --------------------------------------------------


def document_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Order-sensitive polynomial rolling hash over the token stream
    (functions.hashing.fingerprint) + the order-free content md5 —
    the pair distinguishes reordered from identical documents."""
    from ..functions import fan_out

    df = fan_out(df)
    return df.select(
        F.col(id_col),
        H.fingerprint(H.tokens(text_col)).alias("rolling_fp"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("content_md5"),
    )


# --- repetition signals (Gopher-style) -------------------------------


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition metrics in the Gopher/MassiveText
    style: duplicate-token fraction, most-common-token fraction, and
    the same two over word bigrams. High values mark boilerplate and
    degenerate (repeated-phrase) documents.

    Computed as explode + two-level groupBy aggregates (partial
    map-side combine, shuffle keyed on (doc, gram) then doc) rather
    than per-row higher-order-function loops — the aggregate path
    vectorizes in codegen and spreads a single huge document across
    tasks instead of pinning it to one row.
    """
    base = df.select(
        F.col(id_col), H.tokens(text_col).alias("tok")
    )

    def stats(col: Column, prefix: str) -> DataFrame:
        counted = (
            base.select(F.col(id_col), F.explode(col).alias("g"))
            .groupBy(id_col, "g")
            .agg(F.count("*").alias("c"))
        )
        return counted.groupBy(id_col).agg(
            F.sum("c").alias(f"{prefix}_n"),
            F.count("*").alias(f"{prefix}_distinct"),
            F.max("c").alias(f"{prefix}_top"),
        )

    tok_stats = stats(F.col("tok"), "tok")
    big_stats = stats(H.word_shingles(F.col("tok"), 2), "big")

    def frac(num: Column, den: str) -> Column:
        return F.round(
            F.coalesce(num / F.col(den).cast("double"), F.lit(0.0)), 6
        )

    return (
        base.select(id_col)
        .join(tok_stats, id_col, "left")
        .join(big_stats, id_col, "left")
        .select(
            F.col(id_col),
            frac(F.col("tok_n") - F.col("tok_distinct"), "tok_n").alias(
                "dup_token_frac"
            ),
            frac(F.col("tok_top"), "tok_n").alias("top_token_frac"),
            frac(F.col("big_n") - F.col("big_distinct"), "big_n").alias(
                "dup_bigram_frac"
            ),
            frac(F.col("big_top"), "big_n").alias("top_bigram_frac"),
        )
    )


# --- cleaning transforms (training-data pipeline) --------------------

# PII patterns kept deliberately simple and auditable. Order matters:
# datetime guard first (see below), then emails (so address digits
# never half-match), then bare IPv4 (before phone, or a long IP like
# 192.168.100.100 reads as a digit run), then phone-like runs of >=10
# digits with separators (>=10 so ISO dates' 8 digits escape). Each
# replacement token is distinct so downstream counts can attribute
# what was removed. Both regex dialects in play (Java on the Spark
# side, RE2 in DuckDB) parse these identically — which rules out
# lookarounds (RE2 has none), hence the guard trick.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
# leading '+' or digit, then optional separators before each further
# digit: >=10 digits with any mix of space/().- between them
# ("+1 (555) 867-5309" works; an 8-digit ISO date does not; the match
# never starts on a separator, so "call 555-867-5309" keeps its space)
PII_PHONE_RE = r"\+?\d(?:[\s().-]*\d){9,}"
# 'YYYY-MM-DD HH:MM:SS' is 10+ digits bridged by -/space before the
# first colon, so the phone pattern would eat the date + hour. No
# lookahead in RE2, so instead: temporarily swap the date→time space
# for a control char outside the phone separator class, scrub, swap
# back. The middle date field is 1-2 digits (month/day), which keeps
# real phones like 555-867-5309 (middle group 3 digits) unguarded.
PII_DATETIME_GUARD_RE = r"(\d{1,4}[-.]\d{1,2}[-.]\d{1,4}) (\d{1,2}:)"
_GUARD = "\u001f"  # ASCII unit separator: never in the phone class


def scrub_pii(col) -> Column:
    """Redact emails, IPv4 addresses, and phone-like numbers with
    typed placeholder tokens. Pure regexp_replace chain — whole-stage
    codegen, replayable in any SQL engine (the oracle uses the same
    patterns in the same order). Datetime strings ('2026-08-14
    00:22:59') survive intact via the guard described above."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, PII_DATETIME_GUARD_RE, "$1" + _GUARD + "$2")
    c = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, PII_IPV4_RE, "<IP>")
    c = F.regexp_replace(c, PII_PHONE_RE, "<PHONE>")
    return F.translate(c, _GUARD, " ")


def scrub_pii_sql(expr: str) -> str:
    guarded = (
        "regexp_replace({e}, '{guard_re}', '\\1{guard}\\2', 'g')"
    ).format(e=expr, guard_re=PII_DATETIME_GUARD_RE, guard=_GUARD)
    scrubbed = (
        "regexp_replace(regexp_replace(regexp_replace({e}, "
        "'{email}', '<EMAIL>', 'g'), "
        "'{ip}', '<IP>', 'g'), "
        "'{phone}', '<PHONE>', 'g')"
    ).format(
        e=guarded, email=PII_EMAIL_RE, ip=PII_IPV4_RE, phone=PII_PHONE_RE
    )
    return "replace({e}, '{guard}', ' ')".format(e=scrubbed, guard=_GUARD)


def dedup_paragraphs(col, sep: str = "\n\n") -> Column:
    """Drop repeated paragraphs within one document, keeping first
    occurrences in order — boilerplate/navigation blocks repeat
    verbatim inside crawled pages. Column-only: split, keep positions
    whose trimmed text has no earlier identical paragraph, rejoin.
    Shuffle-free (per-row array ops). ``sep`` is treated as a literal
    string on both the split and the rejoin (F.split takes a regex, so
    it is escaped here — '. ' or '|' separators work as written)."""
    import re

    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, re.escape(sep))
    idx = F.sequence(F.lit(1), F.size(parts))
    kept = F.filter(
        idx,
        lambda i: ~F.exists(
            F.slice(parts, F.lit(1), i - 1),
            lambda prev: F.trim(prev) == F.trim(F.element_at(parts, i)),
        ),
    )
    return F.array_join(
        F.transform(kept, lambda i: F.element_at(parts, i)), sep
    )


# --- cross-document repeated passages --------------------------------


def repeated_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-level repeated-passage audit (the signal behind exact
    substring dedup in Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", arXiv:2107.06499): a word n-gram
    occurring in >= ``min_docs`` DISTINCT documents is a repeated
    passage — boilerplate, licence blocks, syndicated copy.

    Output, one row per document:
      (id, n_passages, n_repeated, repeated_frac)
    where n_passages counts the document's DISTINCT n-grams and
    n_repeated how many of those are corpus-hot. Use as a filter
    (drop docs above a repeated_frac threshold) or to route docs into
    the span-removal path.

    Scale shape: distinct shingles per doc (array op, no shuffle),
    then one explode keyed on the 60-bit shingle hash (longs, not
    strings, cross the wire), a count aggregate with map-side partial
    combine, a semi-join of the inverted index against the hot set,
    and a count back per doc. Unlike candidate-pair generation there
    is no quadratic term anywhere — this audit is safe on arbitrarily
    duplicate-ridden corpora, which is exactly when it matters.
    """
    base = df.select(
        F.col(id_col), H.tokens(text_col).alias("_tok")
    ).select(
        id_col,
        F.array_distinct(
            H.word_shingles(F.col("_tok"), n)
        ).alias("sh"),
    )
    inv = base.select(
        F.col(id_col), F.explode("sh").alias("g")
    ).select(F.col(id_col), H.hash64(F.col("g")).alias("gh"))
    # per-doc shingles are distinct, so count(*) = distinct-doc count
    hot = (
        inv.groupBy("gh")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_docs)
        .select("gh")
    )
    per_doc_hot = (
        inv.join(hot, "gh", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_repeated"))
    )
    return (
        base.select(
            F.col(id_col), F.size("sh").cast("long").alias("n_passages")
        )
        .join(per_doc_hot, id_col, "left")
        .select(
            F.col(id_col),
            "n_passages",
            F.coalesce("n_repeated", F.lit(0)).cast("long").alias(
                "n_repeated"
            ),
            F.round(
                F.coalesce("n_repeated", F.lit(0))
                / F.greatest("n_passages", F.lit(1)).cast("double"),
                6,
            ).alias("repeated_frac"),
        )
    )


def repeated_passages_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
) -> str:
    sh = H.word_shingles_sql(H.tokens_sql(text_col), n)
    gh = H.hash64_sql("g")
    return f"""
WITH s AS MATERIALIZED (
  SELECT {id_col} AS id, list_distinct({sh}) AS sh FROM {table}
),
inv AS MATERIALIZED (
  SELECT id, {gh} AS gh
  FROM (SELECT id, unnest(sh) AS g FROM s)
),
hot AS (SELECT gh FROM inv GROUP BY gh HAVING count(*) >= {min_docs}),
per_doc AS (
  SELECT id, count(*) AS n_repeated
  FROM inv JOIN hot USING (gh) GROUP BY id
)
SELECT s.id AS {id_col},
       len(s.sh)::BIGINT AS n_passages,
       coalesce(p.n_repeated, 0)::BIGINT AS n_repeated,
       round(coalesce(p.n_repeated, 0) /
             greatest(len(s.sh), 1)::DOUBLE, 6) AS repeated_frac
FROM s LEFT JOIN per_doc p ON s.id = p.id
"""


# --- hashed-feature linear quality classifier ------------------------
# The fasttext-shaped scoring path every big corpus build runs (e.g.
# CCNet / LLaMA-style "page quality" filters): tokens -> hashing-trick
# buckets -> learned weight per bucket -> per-doc linear score. The
# weights here are a DataFrame (bucket, weight) broadcast into the
# join, so a real model exported from any trainer drops in unchanged;
# the engine contract is the lookup + aggregation shape, not the
# values. Weights are INTEGER (fixed-point) so the per-doc sum is
# exact and order-free — both engines agree bit-for-bit; the single
# float division happens once at the edge.

CLASSIFIER_SEED = 7


def token_buckets(text_col: Column | str, n_buckets: int) -> Column:
    """Hashing-trick feature ids: 60-bit md5 token hash mod buckets
    (cross-engine reproducible via functions/hashing.py)."""
    return F.transform(
        H.tokens(text_col),
        lambda t: H.hash64(t, seed=CLASSIFIER_SEED) % n_buckets,
    )


def token_buckets_sql(expr: str, n_buckets: int) -> str:
    h = H.hash64_sql("t", seed=CLASSIFIER_SEED)
    return (
        f"list_transform({H.tokens_sql(expr)}, t -> {h} % {n_buckets})"
    )


def demo_weights(spark, n_buckets: int) -> DataFrame:
    """Deterministic stand-in weight table (fixed-point ints in
    [-6, 6]); replace with a trained model's export in production."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        ((F.col("id") % 13) - 6).cast("long").alias("weight"),
    )


DEMO_WEIGHTS_SQL = """
SELECT range AS bucket, (range % 13) - 6 AS weight
FROM range({n})
"""


def hashed_linear_score(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    scale: float = 6.0,
) -> DataFrame:
    """Score = sum(weight[bucket(token)]) over token INSTANCES
    (bag-of-words with multiplicity), normalized by scale*n_tokens.

    Output: (id, n_tokens, score_raw, score, keep) with
    keep = score_raw >= 0.

    Plan: explode buckets -> broadcast-join the weight table (a
    hashing-trick model is n_buckets rows — a few MB even at fasttext
    scale) -> one groupBy(id). The raw sum is integer, so partial
    aggregation order cannot perturb the result.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(token_buckets(text_col, n_buckets)).alias("bucket"),
    )
    scored = (
        toks.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("weight").alias("score_raw"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("score_raw", F.lit(0)).cast("long").alias(
                "score_raw"
            ),
            F.round(
                F.coalesce("score_raw", F.lit(0))
                / (
                    F.lit(scale)
                    * F.greatest(
                        F.coalesce("n_tokens", F.lit(0)), F.lit(1)
                    )
                ),
                6,
            ).alias("score"),
            (F.coalesce("score_raw", F.lit(0)) >= 0).alias("keep"),
        )
    )


def hashed_linear_score_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    scale: float = 6.0,
) -> str:
    buckets = token_buckets_sql(text_col, n_buckets)
    weights = DEMO_WEIGHTS_SQL.format(n=n_buckets)
    return f"""
WITH w AS MATERIALIZED ({weights}),
toks AS (
  SELECT {id_col} AS id, unnest({buckets}) AS bucket FROM {table}
),
scored AS (
  SELECT id, count(*) AS n_tokens, sum(w.weight) AS score_raw
  FROM toks JOIN w USING (bucket) GROUP BY id
)
SELECT d.{id_col},
       coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(s.score_raw, 0)::BIGINT AS score_raw,
       round(coalesce(s.score_raw, 0) /
             ({scale} * greatest(coalesce(s.n_tokens, 0), 1)), 6) AS score,
       coalesce(s.score_raw, 0) >= 0 AS keep
FROM {table} d LEFT JOIN scored s ON d.{id_col} = s.id
"""


# --- collocation mining ----------------------------------------------


def collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Corpus collocations: consecutive word bigrams ranked by lift
    (= exp(PMI)): N * c(w1 w2) / (c(w1) * c(w2)). The phrase-mining
    scan used to seed tokenizer merges and multi-word expressions.

    Determinism: counts are exact integers; the score is one fixed
    expression tree of IEEE double ops (((c12*N)/c1)/c2 — multiplies
    and divides are order-pinned, unlike sums), so both engines agree
    bit-for-bit before the final round. No log: log is monotone, so
    ranking by lift IS ranking by PMI, without trusting libm parity.

    Plan: two explode+count aggregations (map-side partial combine,
    token-keyed shuffles), two hash joins of bigrams against the
    unigram table, a broadcast of the O(1)-row corpus total, and a
    TakeOrdered for the top-k — no global sort.
    """
    tok = df.select(H.tokens(text_col).alias("t"))
    uni = (
        tok.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    total = uni.agg(F.sum("c").cast("double").alias("n_total"))
    big = (
        tok.select(F.explode(H.word_shingles(F.col("t"), 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("c12"))
        .where(F.col("c12") >= min_count)
        .withColumn("w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
        .withColumn("w2", F.split_part(F.col("bg"), F.lit(" "), F.lit(2)))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (
        big.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "bg",
            "c12",
            "c1",
            "c2",
            F.round(
                F.col("c12").cast("double")
                * F.col("n_total")
                / F.col("c1").cast("double")
                / F.col("c2").cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "bg")
        .limit(top_k)
    )


def collocations_sql(
    table: str = "documents",
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> str:
    tok = H.tokens_sql(text_col)
    big = H.word_shingles_sql("t", 2)
    return f"""
WITH tok AS MATERIALIZED (SELECT {tok} AS t FROM {table}),
uni AS MATERIALIZED (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w
),
total AS (SELECT sum(c)::DOUBLE AS n_total FROM uni),
big AS (
  SELECT bg, count(*) AS c12,
         split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2
  FROM (SELECT unnest({big}) AS bg FROM tok)
  GROUP BY bg HAVING count(*) >= {min_count}
)
SELECT bg, c12, u1.c AS c1, u2.c AS c2,
       round(c12::DOUBLE * total.n_total / u1.c::DOUBLE / u2.c::DOUBLE, 6)
         AS lift
FROM big
JOIN uni u1 ON big.w1 = u1.w
JOIN uni u2 ON big.w2 = u2.w
CROSS JOIN total
ORDER BY lift DESC, bg
LIMIT {top_k}
"""


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, the
    MOSS algorithm): hash every word k-gram, slide a window of ``w``
    consecutive hashes, keep the minimum of each FULL window. The
    guarantee that makes winnowing the standard over random sampling:
    any shared substring of >= w+k-1 words between two documents
    shares at least one selected fingerprint, at an expected density
    of only 2/(w+1). (Tie-break: leftmost minimum via min over
    (hash, position) structs — deterministic in any engine; the
    original picks rightmost, which changes selection, not the
    guarantee.)

    Plan: the whole selection runs in the ARRAY domain — shingle
    hashes are a projection, and the per-window min is a transform
    over each document's own hash array, so no shuffle happens before
    the final distinct (r11; the window formulation shuffled every
    shingle row twice). The per-doc array_distinct collapses the
    ~2/(w+1)-density selection before the explode; the trailing
    row-level distinct only guards duplicate-``id_col`` inputs.
    Output: one row per selected fingerprint (id_col, fp_hash,
    fp_pos).
    """
    hashed = df.select(
        F.col(id_col), H.tokens(F.col(text_col)).alias("_tok")
    ).select(
        id_col,
        F.transform(
            H.word_shingles(F.col("_tok"), k), lambda s: H.hash64(s)
        ).alias("_hs"),
    )
    # `_hs` must stay a materialized column reference inside the
    # nested lambdas (same CollapseProject reasoning as
    # textrank_edges: an inlined expression would re-run the
    # tokenizer per array index)
    sel = (
        f"CASE WHEN size(_hs) < {w} THEN "
        f"cast(array() AS array<struct<h bigint, pos int>>) "
        f"ELSE array_distinct(transform(sequence(0, size(_hs) - {w}), "
        f"i -> array_min(transform(sequence(i, i + {w - 1}), "
        f"j -> struct(_hs[j] AS h, j AS pos))))) END"
    )
    return (
        hashed.select(id_col, F.explode(F.expr(sel)).alias("_sel"))
        .select(
            id_col,
            F.col("_sel.h").alias("fp_hash"),
            F.col("_sel.pos").alias("fp_pos"),
        )
        .distinct()
    )


# --- character-distribution entropy (round 6) ------------------------

ENT_LOG_QUANT = 10**9
_LN2_LIT = "0.6931471805599453"


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document character-distribution entropy in bits — the
    compression-ratio-style quality signal (gibberish and boilerplate
    sit at the entropy extremes; RefinedWeb/CCNet filter on exactly
    this family). H = -Σ (n_c/N)·log2(n_c/N) over character classes.

    Exactness: each class contributes the INTEGER term
    n_c · round(ln(n_c/N)·1e9) — n_c and N are integers, ln of their
    ratio is computed once per class (no cross-row float sums), so
    the per-doc total is an order-free integer sum and the single
    final division is one IEEE double op. Shape: one explode + two
    map-side-combinable groupBys; N is length(text), carried through
    the explode (no second pass).

    Output: (id_col, n_chars, ent_q, entropy_bits); empty docs get
    entropy 0."""
    chars = df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        F.explode(
            # Spark's sequence(1, 0) counts DOWN — empty docs need an
            # explicit empty-array branch (the word_shingles gotcha)
            F.expr(
                f"CASE WHEN length({text_col}) < 1 "
                f"THEN cast(array() AS array<string>) "
                f"ELSE transform(sequence(1, length({text_col})), "
                f"i -> substr({text_col}, i, 1)) END"
            )
        ).alias("ch"),
    )
    counts = chars.groupBy(id_col, "n_chars", "ch").agg(
        F.count(F.lit(1)).alias("n_c")
    )
    per = counts.groupBy(id_col, "n_chars").agg(
        F.sum(
            F.col("n_c")
            * F.round(
                F.log(F.col("n_c") / F.col("n_chars"))
                * F.lit(float(ENT_LOG_QUANT))
            ).cast("long")
        ).alias("ent_q")
    )
    return (
        df.select(F.col(id_col))
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chars", F.lit(0)).cast("long").alias("n_chars"),
            F.coalesce("ent_q", F.lit(0)).cast("long").alias("ent_q"),
            F.expr(
                "round(-coalesce(ent_q, 0) / cast(greatest("
                "coalesce(n_chars, 0), 1) as double) / "
                f"{float(ENT_LOG_QUANT)!r} / {_LN2_LIT}, 6)"
            ).alias("entropy_bits"),
        )
    )


def char_entropy_sql(
    table: str, id_col: str = "doc_id", text_expr: str = "text"
) -> str:
    return f"""
WITH chars AS (
  SELECT {id_col}, length({text_expr})::BIGINT AS n_chars,
         unnest(list_transform(range(1, length({text_expr}) + 1),
                               i -> {text_expr}[i]::VARCHAR)) AS ch
  FROM {table}
),
counts AS (
  SELECT {id_col}, n_chars, ch, count(*)::BIGINT AS n_c
  FROM chars GROUP BY {id_col}, n_chars, ch
),
per AS (
  SELECT {id_col}, n_chars,
         CAST(sum(n_c * CAST(round(ln(n_c / n_chars::DOUBLE)
              * {float(ENT_LOG_QUANT)!r}) AS BIGINT)) AS BIGINT) AS ent_q
  FROM counts GROUP BY {id_col}, n_chars
)
SELECT d.{id_col},
       coalesce(p.n_chars, 0)::BIGINT AS n_chars,
       coalesce(p.ent_q, 0)::BIGINT AS ent_q,
       round(-coalesce(p.ent_q, 0) / greatest(coalesce(p.n_chars, 0),
             1)::DOUBLE / {float(ENT_LOG_QUANT)!r} / {_LN2_LIT}, 6)
         AS entropy_bits
FROM {table} d LEFT JOIN per p USING ({id_col})
"""


# --- corpus-level distribution statistics -----------------------------

ZIPF_TOPK = 1000
ZIPF_LOG_QUANT = 10**6


def zipf_slope(
    df: DataFrame, text_col: str = "text", top_k: int = ZIPF_TOPK
) -> DataFrame:
    """Zipf's-law slope of the corpus frequency distribution —
    log-log OLS of frequency on rank over the top-k head (the
    standard corpus-health statistic: natural text sits near −1;
    boilerplate-heavy or deduplicated-to-death corpora drift off).

    One token groupBy builds the frequency table; the head comes
    from an exact TakeOrdered top-k (never a global sort of the
    vocabulary); the ONLY window runs over those ≤top_k rows to
    assign ranks. Each (ln rank, ln freq) is quantized to an
    integer ONCE (the mutual_information/char_entropy log
    discipline), then the OLS sufficient statistics accumulate in
    DECIMAL(38,0) — the q-products pass int64 at top_k ≈ 1e3 with
    ln·1e6 quantization, so the decimal accumulator is the
    100 TB-proof choice (corr_matrix rationale).

    Output: ONE row (n_fit, slope_q, intercept_q, r2_q), _q at 1e6.
    """
    freqs = (
        df.select(F.explode(H.tokens(text_col)).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .orderBy(F.col("freq").desc(), "t")
        .limit(top_k)
    )
    w = Window.orderBy(F.col("freq").desc(), "t")
    lq = float(ZIPF_LOG_QUANT)
    ranked = freqs.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select(
        F.round(F.log(F.col("rank").cast("double")) * F.lit(lq))
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("freq").cast("double")) * F.lit(lq))
        .cast("long")
        .alias("y"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    stats = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d("x")).alias("sx"),
        F.sum(d("y")).alias("sy"),
        F.sum(
            F.col("x").cast("decimal(19,0)")
            * F.col("y").cast("decimal(19,0)")
        ).alias("sxy"),
        F.sum(
            F.col("x").cast("decimal(19,0)")
            * F.col("x").cast("decimal(19,0)")
        ).alias("sxx"),
        F.sum(
            F.col("y").cast("decimal(19,0)")
            * F.col("y").cast("decimal(19,0)")
        ).alias("syy"),
    )
    n38 = F.col("n").cast("decimal(38,0)")
    num = (n38 * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (n38 * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (n38 * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") / F.lit(lq)
        - slope * F.col("sx").cast("double") / F.lit(lq)
    ) / F.col("n").cast("double")
    r2 = (num * num) / (den * deny)

    def q(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")

    return stats.select(
        F.col("n").alias("n_fit"),
        q(slope).alias("slope_q"),
        q(intercept).alias("intercept_q"),
        q(r2).alias("r2_q"),
    )


def zipf_slope_sql(
    table: str = "documents",
    text_col: str = "text",
    top_k: int = ZIPF_TOPK,
) -> str:
    """DuckDB twin of zipf_slope."""
    tok = H.tokens_sql(text_col)
    lq = float(ZIPF_LOG_QUANT)
    return f"""
WITH freqs AS (
  SELECT t, count(*)::BIGINT AS freq
  FROM (SELECT unnest({tok}) AS t FROM {table})
  GROUP BY t ORDER BY freq DESC, t LIMIT {top_k}
),
ranked AS (
  SELECT round(ln((row_number() OVER (ORDER BY freq DESC, t))::DOUBLE)
               * {lq!r})::BIGINT AS x,
         round(ln(freq::DOUBLE) * {lq!r})::BIGINT AS y
  FROM freqs
),
stats AS (
  SELECT count(*)::BIGINT AS n,
         sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
         sum(x::HUGEINT * y::HUGEINT) AS sxy,
         sum(x::HUGEINT * x::HUGEINT) AS sxx,
         sum(y::HUGEINT * y::HUGEINT) AS syy
  FROM ranked
),
derived AS (
  SELECT n,
         (n::HUGEINT * sxy - sx * sy)::DOUBLE AS num,
         (n::HUGEINT * sxx - sx * sx)::DOUBLE AS den,
         (n::HUGEINT * syy - sy * sy)::DOUBLE AS deny,
         sx::DOUBLE AS sxd, sy::DOUBLE AS syd, n::DOUBLE AS nd
  FROM stats
)
SELECT n AS n_fit,
       floor(num / den * 1e6 + 0.5)::BIGINT AS slope_q,
       floor((syd / {lq!r} - (num / den) * sxd / {lq!r}) / nd
             * 1e6 + 0.5)::BIGINT AS intercept_q,
       floor((num * num) / (den * deny) * 1e6 + 0.5)::BIGINT AS r2_q
FROM derived
"""


def shannon_diversity(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Token-type Shannon diversity per corpus slice — the lexical
    richness profile (a slice whose H collapses is boilerplate or a
    dedup bug; Pielou's evenness J = H/ln(V) normalizes out
    vocabulary size).

    H = ln N − (Σ n_t·ln n_t)/N over type counts. Each type
    contributes the INTEGER term n_t · round(ln(n_t)·1e9) — counts
    exact, one log per TYPE (never per row), summed in
    DECIMAL(38,0) (the n_t·ln n_t products pass int64 around 1e8
    occurrences of a single type). Two shuffles: (group, type)
    counts, then per-group aggregate.

    Output: (group, n_tokens, vocab, h_q, evenness_q), _q at 1e6."""
    lq = 1e9
    types = (
        df.select(
            F.col(group_col).alias("grp"),
            F.explode(H.tokens(text_col)).alias("t"),
        )
        .groupBy("grp", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("n_t"))
    )
    term = (
        F.col("n_t").cast("decimal(19,0)")
        * F.round(F.log(F.col("n_t").cast("double")) * F.lit(lq))
        .cast("decimal(19,0)")
    )
    per_grp = types.groupBy("grp").agg(
        F.sum("n_t").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(term).alias("s_nlogn"),
    )
    h = F.log(F.col("n_tokens").cast("double")) - (
        F.col("s_nlogn").cast("double")
        / F.lit(lq)
        / F.col("n_tokens").cast("double")
    )
    even = h / F.log(F.col("vocab").cast("double"))

    def q(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")

    return per_grp.select(
        F.col("grp").alias(group_col),
        "n_tokens",
        "vocab",
        q(h).alias("h_q"),
        q(F.when(F.col("vocab") > 1, even).otherwise(F.lit(0.0))).alias(
            "evenness_q"
        ),
    ).orderBy(group_col)


def shannon_diversity_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
) -> str:
    """DuckDB twin of shannon_diversity."""
    tok = H.tokens_sql(text_col)
    return f"""
WITH types AS (
  SELECT {group_col} AS grp, t, count(*)::BIGINT AS n_t
  FROM (SELECT {group_col}, unnest({tok}) AS t FROM {table})
  GROUP BY 1, 2
),
per_grp AS (
  SELECT grp, sum(n_t)::BIGINT AS n_tokens, count(*)::BIGINT AS vocab,
         sum(n_t::HUGEINT *
             round(ln(n_t::DOUBLE) * 1e9)::HUGEINT) AS s_nlogn
  FROM types GROUP BY grp
),
derived AS (
  SELECT grp, n_tokens, vocab,
         ln(n_tokens::DOUBLE)
           - (s_nlogn::DOUBLE / 1e9 / n_tokens::DOUBLE) AS h
  FROM per_grp
)
SELECT grp AS {group_col}, n_tokens, vocab,
       floor(h * 1e6 + 0.5)::BIGINT AS h_q,
       floor((CASE WHEN vocab > 1 THEN h / ln(vocab::DOUBLE)
              ELSE 0.0 END) * 1e6 + 0.5)::BIGINT AS evenness_q
FROM derived ORDER BY {group_col}
"""


def rake_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 30,
    max_phrase_len: int = 4,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the corpus —
    the degree/frequency keyphrase ranker next to [[keyword_textrank]]
    (no graph iteration: one pass of aggregations, which is why RAKE
    is the scale-default and TextRank the quality upgrade).

    Candidate phrases are maximal stopword-free token runs, found
    with gaps-and-islands (per-doc window on token position — the
    dup_spans pattern), capped at ``max_phrase_len`` words. Word
    score = degree/frequency where degree sums the lengths of every
    phrase containing the word; phrase score sums its member word
    scores. Determinism: degree and frequency are exact ints, the
    word score is ONE integer division (×1e6, Spark DIV / DuckDB //)
    and phrase scores are sums of those integers — order-free.

    Shape: tokenize+posexplode (corpus-scale, zero shuffle), one
    doc-keyed window, one phrase groupBy, one word groupBy, one
    word-keyed join back, TakeOrdered top-k. Nothing global except
    the final k-row limit.

    Output: (phrase, n_words, n_occurrences, score_q) top-k by
    score desc, ties broken by phrase text."""
    sw = F.array(
        *[F.lit(w) for w in (stopwords or _STOPWORDS_EN)]
    )
    tok = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(H.tokens(text_col)).alias("pos", "w"),
    ).where(~F.array_contains(sw, F.col("w")))
    w_doc = Window.partitionBy("_id").orderBy("pos")
    islands = tok.withColumn(
        "_isl", F.col("pos") - F.row_number().over(w_doc)
    )
    phrases = (
        islands.groupBy("_id", "_isl")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("w")))
                ),
                lambda x: x["w"],
            ).alias("_ws")
        )
        .where(F.size("_ws") <= max_phrase_len)
        .select(
            F.array_join("_ws", " ").alias("phrase"),
            F.size("_ws").alias("n_words"),
            F.explode("_ws").alias("w"),
        )
    )
    word_stats = phrases.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("n_words").cast("long").alias("deg"),
    )
    word_score = word_stats.select(
        "w", F.expr("deg * 1000000 DIV freq").cast("long").alias("wscore")
    )
    scored = (
        phrases.join(word_score, "w")
        .groupBy("phrase")
        .agg(
            F.max("n_words").cast("long").alias("n_words"),
            F.sum("wscore").alias("_tot"),
            F.count(F.lit(1)).alias("_wrows"),
        )
    )
    # _wrows counts (occurrence, word) rows, so occurrences =
    # _wrows / n_words exactly, and _tot summed the phrase's word
    # scores once PER occurrence — divide it back out
    return (
        scored.select(
            "phrase",
            "n_words",
            F.expr("_wrows DIV n_words").cast("long").alias(
                "n_occurrences"
            ),
            F.expr("_tot DIV (_wrows DIV n_words)")
            .cast("long")
            .alias("score_q"),
        )
        .orderBy(F.desc("score_q"), F.asc("phrase"))
        .limit(top_k)
    )


def rake_keywords_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 30,
    max_phrase_len: int = 4,
    stopwords: list[str] | None = None,
) -> str:
    """DuckDB twin of rake_keywords."""
    tok = H.tokens_sql(text_col)
    sw = "[" + ", ".join(
        sql_str_lit(w) for w in (stopwords or _STOPWORDS_EN)
    ) + "]"
    return f"""
WITH rk_tok AS MATERIALIZED (
  SELECT id, i - 1 AS pos, w FROM (
    SELECT {id_col} AS id,
           generate_subscripts({tok}, 1) AS i,
           unnest({tok}) AS w
    FROM {table}
  ) WHERE NOT list_contains({sw}, w)
),
rk_isl AS MATERIALIZED (
  SELECT id, pos, w,
         pos - row_number() OVER (PARTITION BY id ORDER BY pos) AS isl
  FROM rk_tok
),
rk_ph AS MATERIALIZED (
  SELECT string_agg(w, ' ' ORDER BY pos) AS phrase,
         count(*)::BIGINT AS n_words,
         list(w ORDER BY pos) AS ws
  FROM rk_isl GROUP BY id, isl
  HAVING count(*) <= {max_phrase_len}
),
rk_pw AS MATERIALIZED (
  SELECT phrase, n_words, unnest(ws) AS w FROM rk_ph
),
rk_wstats AS (
  SELECT w, count(*)::BIGINT AS freq, sum(n_words)::BIGINT AS deg
  FROM rk_pw GROUP BY w
),
rk_wscore AS (
  SELECT w, (deg * 1000000 // freq)::BIGINT AS wscore FROM rk_wstats
),
rk_scored AS (
  SELECT p.phrase,
         max(p.n_words)::BIGINT AS n_words,
         sum(s.wscore)::BIGINT AS tot,
         count(*)::BIGINT AS wrows
  FROM rk_pw p JOIN rk_wscore s ON s.w = p.w
  GROUP BY p.phrase
)
SELECT phrase, n_words,
       (wrows // n_words)::BIGINT AS n_occurrences,
       (tot // (wrows // n_words))::BIGINT AS score_q
FROM rk_scored
ORDER BY score_q DESC, phrase
LIMIT {top_k}
"""


def heaps_vocab_growth(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Heaps'-law vocabulary growth fit (r08): V = K·N^β across
    corpus slices — log-log OLS of per-slice vocabulary size on
    per-slice token count. The corpus-health companion to
    [[zipf_slope]]: natural text grows vocabulary at β ≈ 0.4–0.6;
    β near 0 means the slices are re-treading one vocabulary
    (template/boilerplate corpora), β near 1 means near-random
    token streams — both red flags before a tokenizer or dedup run.

    One (slice, token) distinct + one count pair per slice, then the
    zipf_slope OLS discipline: each (ln N, ln V) quantized to an
    integer ONCE, sufficient statistics in DECIMAL(38,0), single
    quantized divisions at the edge. Output: ONE row
    (n_slices, beta_q, lnk_q, r2_q), _q at 1e6.
    """
    lq = float(ZIPF_LOG_QUANT)
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(H.tokens(text_col)).alias("t"),
    )
    per_slice = toks.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok"),
        F.countDistinct("t").cast("long").alias("vocab"),
    )
    pts = per_slice.select(
        F.round(F.log(F.col("n_tok").cast("double")) * F.lit(lq))
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("vocab").cast("double")) * F.lit(lq))
        .cast("long")
        .alias("y"),
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    stats = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(d19("x") * d19("y")).alias("sxy"),
        F.sum(d19("x") * d19("x")).alias("sxx"),
        F.sum(d19("y") * d19("y")).alias("syy"),
    )
    n38 = F.col("n").cast("decimal(38,0)")
    num = (n38 * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (n38 * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (n38 * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    beta = num / den
    lnk = (
        F.col("sy").cast("double") / F.lit(lq)
        - beta * F.col("sx").cast("double") / F.lit(lq)
    ) / F.col("n").cast("double")
    r2 = (num * num) / (den * deny)

    def q(c):
        # den = 0 (single slice, or zero x-variance) has no defined
        # fit: emit NULL in both engines instead of a NaN that casts
        # divergently (r08 review)
        return F.when(
            den != F.lit(0.0),
            F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long"),
        )

    return stats.select(
        F.col("n").alias("n_slices"),
        q(beta).alias("beta_q"),
        q(lnk).alias("lnk_q"),
        # r2 additionally divides by the y-variance: identical-vocab
        # slices (deny = 0) are NULL too
        F.when(
            deny != F.lit(0.0), q(r2)
        ).alias("r2_q"),
    )


def heaps_vocab_growth_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
) -> str:
    """DuckDB twin of heaps_vocab_growth."""
    tok = H.tokens_sql(text_col)
    lq = float(ZIPF_LOG_QUANT)
    return f"""
WITH toks AS (
  SELECT {group_col} AS grp, unnest({tok}) AS t FROM {table}
),
per_slice AS (
  SELECT grp, count(*)::BIGINT AS n_tok,
         count(DISTINCT t)::BIGINT AS vocab
  FROM toks GROUP BY grp
),
pts AS (
  SELECT round(ln(n_tok::DOUBLE) * {lq!r})::BIGINT AS x,
         round(ln(vocab::DOUBLE) * {lq!r})::BIGINT AS y
  FROM per_slice
),
stats AS (
  SELECT count(*)::BIGINT AS n,
         sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
         sum(x::HUGEINT * y::HUGEINT) AS sxy,
         sum(x::HUGEINT * x::HUGEINT) AS sxx,
         sum(y::HUGEINT * y::HUGEINT) AS syy
  FROM pts
),
derived AS (
  SELECT n,
         (n::HUGEINT * sxy - sx * sy)::DOUBLE AS num,
         (n::HUGEINT * sxx - sx * sx)::DOUBLE AS den,
         (n::HUGEINT * syy - sy * sy)::DOUBLE AS deny,
         sx::DOUBLE AS sxd, sy::DOUBLE AS syd, n::DOUBLE AS nd
  FROM stats
)
SELECT n AS n_slices,
       CASE WHEN den <> 0 THEN
         floor(num / den * 1e6 + 0.5)::BIGINT END AS beta_q,
       CASE WHEN den <> 0 THEN
         floor((syd / {lq!r} - (num / den) * sxd / {lq!r}) / nd
               * 1e6 + 0.5)::BIGINT END AS lnk_q,
       CASE WHEN den <> 0 AND deny <> 0 THEN
         floor((num * num) / (den * deny) * 1e6 + 0.5)::BIGINT
       END AS r2_q
FROM derived
"""


def ctfidf_top_terms(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Class-based TF-IDF cluster labeling (r08; Grootendorst's
    BERTopic c-TF-IDF, 2022): the terms that CHARACTERIZE each
    group — term count within the group weighted by how few groups
    contain the term at all. This is the label-generation step a
    news-clustering UI runs on every cluster ("what is this cluster
    about?"), applied per corpus slice.

        score(t, g) = tf(t, g) · ln(N_groups / df_groups(t))

    Exactness: tf and df are exact integer counts; the idf log is
    quantized ONCE per term (×1e6, the zipf/shannon discipline) and
    multiplied by the integer tf, so scores and the (score desc,
    term asc) top-k order are engine-identical. Terms present in
    every group score exactly 0 (ln 1) and still rank — ties broken
    by term.

    Shape: one (group, term) count groupBy, one term-keyed df
    groupBy (both map-side combinable), a ONE-ROW group-count
    broadcast, and a rank window PARTITIONED BY GROUP. Work is
    bounded by groups × vocabulary, never corpus rows, after the
    first count pass. Output: (group, term, tf, df_groups, score_q,
    rank), rank <= k."""
    lq = 1e6
    tf = (
        df.select(
            F.col(group_col).alias("grp"),
            F.explode(H.tokens(text_col)).alias("t"),
        )
        .groupBy("grp", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("df_groups")
    )
    n_groups = tf.select("grp").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_groups")
    )
    scored = (
        tf.join(dfreq, "t")
        .crossJoin(F.broadcast(n_groups))
        .select(
            "grp",
            "t",
            "tf",
            "df_groups",
            (
                F.col("tf")
                * F.round(
                    F.log(
                        F.col("n_groups").cast("double")
                        / F.col("df_groups").cast("double")
                    )
                    * F.lit(lq)
                ).cast("long")
            ).alias("score_q"),
        )
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("score_q").desc(), F.col("t").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            F.col("grp").alias(group_col),
            F.col("t").alias("term"),
            "tf",
            "df_groups",
            "score_q",
            "rank",
        )
    )


def ctfidf_top_terms_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
    k: int = 5,
) -> str:
    """DuckDB twin of ctfidf_top_terms."""
    tok = H.tokens_sql(text_col)
    return f"""
WITH tf AS MATERIALIZED (
  SELECT {group_col} AS grp, t, count(*)::BIGINT AS tf
  FROM (SELECT {group_col}, unnest({tok}) AS t FROM {table})
  GROUP BY 1, 2
),
dfreq AS (
  SELECT t, count(*)::BIGINT AS df_groups FROM tf GROUP BY 1
),
ng AS (SELECT count(DISTINCT grp)::BIGINT AS n_groups FROM tf),
scored AS (
  SELECT tf.grp, tf.t, tf.tf, dfreq.df_groups,
         tf.tf * round(ln(ng.n_groups::DOUBLE / dfreq.df_groups::DOUBLE)
                       * 1000000.0)::BIGINT AS score_q
  FROM tf JOIN dfreq ON tf.t = dfreq.t CROSS JOIN ng
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY grp ORDER BY score_q DESC, t ASC) AS rank
  FROM scored
)
SELECT grp AS {group_col}, t AS term, tf, df_groups, score_q,
       rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}
"""


def flesch_readability(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch Reading Ease per document (Flesch 1948) — the classic
    readability gate a curation pipeline files next to the
    length/stopword heuristics of quality_score:

        206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)

    Deterministic cross-engine surrogate for syllables: vowel-GROUP
    count per token ([aeiouy]+ runs, floor 1 — all-consonant and
    digit tokens count one), the standard dictionary-free
    approximation. Sentences = [.!?]+ run count, floor 1. Words =
    the repo tokenizer (functions/hashing.tokens), so counts match
    token_counts' universe. All three counts are exact integers;
    the score is one fixed-order double expression over two exact
    divisions, quantized half-up at 1e-4. Zero-word docs emit NULL.
    One projection — no shuffle, no UDF."""
    toks = H.tokens(text_col)
    n_words = F.size(toks)
    n_syll = F.aggregate(
        F.transform(
            toks,
            lambda t: F.greatest(
                F.lit(1), F.regexp_count(t, F.lit("[aeiouy]+"))
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    n_sent = F.greatest(
        F.lit(1), F.regexp_count(F.col(text_col), F.lit("[.!?]+"))
    )
    score = (
        F.lit(206.835)
        - F.lit(1.015)
        * (n_words.cast("double") / n_sent.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double"))
    )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_sent.cast("long").alias("n_sentences"),
        n_syll.cast("long").alias("n_syllables"),
        F.when(
            n_words > 0,
            F.floor(score * F.lit(1e4) + F.lit(0.5)).cast("long"),
        ).alias("flesch_q"),
    ).orderBy(id_col)


def flesch_readability_sql(
    table: str, id_expr: str = "doc_id", text_expr: str = "text"
) -> str:
    """DuckDB twin of flesch_readability (same tokenizer via
    tokens_sql, same fixed-order double expression)."""
    toks = H.tokens_sql(text_expr)
    return f"""
WITH counts AS (
  SELECT {id_expr} AS id,
         len({toks})::BIGINT AS n_words,
         greatest(1, len(regexp_extract_all({text_expr}, '[.!?]+')))::BIGINT
             AS n_sentences,
         coalesce(list_sum(list_transform({toks},
             t -> greatest(1, len(regexp_extract_all(t, '[aeiouy]+'))))),
             0)::BIGINT AS n_syllables
  FROM {table}
)
SELECT id AS {id_expr}, n_words, n_sentences, n_syllables,
       CASE WHEN n_words > 0 THEN
         floor((206.835
                - 1.015 * (n_words::DOUBLE / n_sentences::DOUBLE)
                - 84.6 * (n_syllables::DOUBLE / n_words::DOUBLE))
               * 1e4 + 0.5)::BIGINT
       END AS flesch_q
FROM counts
ORDER BY {id_expr}
"""
