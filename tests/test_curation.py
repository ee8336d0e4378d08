"""Hand-case unit tests for the curation operators (round-6 verdict
item 4 — curation.py was the only operator module without dedicated
tests; the r05 pii_redact oracle-escaping bug would have been caught
here)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators import curation as C
from tests.conftest import rows_match

# --- pii_redact -------------------------------------------------------

PII_ROWS = [
    # email whose local part is a long digit run: if phone ran before
    # email (or email's digits survived), n_phone would double-count
    (0, "mail a12345678901@example.com now"),
    (1, "call +1 555-123-4567 or 555 123 4567"),
    (2, "server 192.168.1.1 and 10.0.0.255"),
    (3, "mixed: bob.smith99@sub.example.org, 192.168.0.1, +44 20-7946-0958"),
    (4, "nothing to redact here"),
    (5, ""),
]


def _pii_df(spark):
    return spark.createDataFrame(PII_ROWS, "i int, text string")


def test_pii_counts_and_order(spark):
    out = {
        r["i"]: (r["n_email"], r["n_ip"], r["n_phone"], r["redacted"])
        for r in C.pii_redact(_pii_df(spark), "text").collect()
    }
    # email redacted FIRST -> its digit run can't be phone-counted
    assert out[0][:3] == (1, 0, 0)
    assert out[0][3] == "mail [EMAIL] now"
    assert out[1][:3] == (0, 0, 2)
    assert out[1][3] == "call [PHONE] or [PHONE]"
    assert out[2][:3] == (0, 2, 0)
    assert out[2][3] == "server [IP] and [IP]"
    assert out[3][:3] == (1, 1, 1)
    assert out[3][3] == "mixed: [EMAIL], [IP], [PHONE]"
    assert out[4][:3] == (0, 0, 0)
    assert out[5][:3] == (0, 0, 0)


def test_pii_sql_parses_and_matches(spark, duck):
    """The r05 bug class: the oracle's escaping must yield patterns
    RE2 both PARSES and agrees with Java on (curation.py:59)."""
    counts, redacted = C.pii_redact_sql("text")
    values = ", ".join(
        "({}, '{}')".format(i, t.replace("'", "''")) for i, t in PII_ROWS
    )
    sql = (
        f"SELECT i, {', '.join(counts)}, {redacted} AS redacted "
        f"FROM (VALUES {values}) AS t(i, text)"
    )
    got = C.pii_redact(_pii_df(spark), "text").drop("text")
    ok, msg = rows_match(got, duck.sql(sql))
    assert ok, msg


# --- domain_cap -------------------------------------------------------


def test_domain_cap_tiebreak_at_boundary(spark):
    rows = [
        # source a: four docs, two tie on quality=10 AT the cap edge —
        # the lower id must survive
        ("a", 1, 10),
        ("a", 2, 10),
        ("a", 3, 50),
        ("a", 4, 5),
        # source b: under the cap, everything survives
        ("b", 5, 1),
    ]
    df = spark.createDataFrame(rows, "source string, id long, q long")
    out = C.domain_cap(df, "source", "id", "q", cap=2)
    kept = {(r["source"], r["id"], r["domain_rank"]) for r in out.collect()}
    assert kept == {("a", 3, 1), ("a", 1, 2), ("b", 5, 1)}


def test_domain_cap_salted_equals_plain(spark):
    """Skewed fixture: one mega-domain (900 rows) vs tiny ones. The
    salted two-phase plan must be row-identical (ranks included) to
    the single-phase window — it is an exact algorithm, not an
    approximation."""
    rows = [("hot", i, i % 13) for i in range(900)] + [
        ("cold%d" % (i % 7), 1000 + i, i % 5) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "source string, id long, q long")
    plain = C.domain_cap(df, "source", "id", "q", cap=20)
    salted = C.domain_cap(df, "source", "id", "q", cap=20, salt_buckets=8)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b and len(a) > 0


# --- bm25_search ------------------------------------------------------


def test_bm25_hand_computed(spark):
    rows = [
        (1, "cat cat dog bird"),
        (2, "dog dog dog fish"),
        (3, "bird fish tree"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["score"]
        for r in C.bm25_search(df, "doc_id", "text", ["cat", "dog"]).collect()
    }

    def idf(dfreq, n=3):
        return math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)

    def term(tf, dl, avgdl=11.0 / 3.0):
        k1, b = C.BM25_K1, C.BM25_B
        return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    exp1 = idf(1) * term(2.0, 4) + idf(2) * term(1.0, 4)  # doc 1
    exp2 = idf(2) * term(3.0, 4)                          # doc 2
    assert set(out) == {1, 2}  # doc 3 has neither term
    assert abs(out[1] - exp1) < 2e-6
    assert abs(out[2] - exp2) < 2e-6


# --- vocab_coverage ---------------------------------------------------


def test_vocab_coverage_tiny_corpus(spark):
    df = spark.createDataFrame(
        [(0, "a a a b b c")], "i int, text string"
    )
    rows = sorted(
        C.vocab_coverage(df, "text", top_k=10).collect(),
        key=lambda r: r["rank"],
    )
    got = [
        (r["rank"], r["term"], r["freq"], r["cum_freq"], r["cum_share"])
        for r in rows
    ]
    assert got == [
        (1, "a", 3, 3, 0.5),
        (2, "b", 2, 5, round(5 / 6, 6)),
        (3, "c", 1, 6, 1.0),
    ]


def test_vocab_coverage_topk_truncates(spark):
    df = spark.createDataFrame([(0, "x y z w")], "i int, text string")
    assert C.vocab_coverage(df, "text", top_k=2).count() == 2


# --- ngram_novelty ----------------------------------------------------


def test_ngram_novelty_short_and_shared(spark):
    long_a = " ".join(f"w{i}" for i in range(10))
    rows = [
        (1, "too few tokens"),       # < n tokens -> 0 grams, novelty 1
        (2, long_a),                 # duplicated below -> novelty 0
        (3, long_a),
        (4, " ".join(f"u{i}" for i in range(10))),  # unique -> novelty 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_grams"], r["n_shared"], r["novelty"])
        for r in C.ngram_novelty(df, "doc_id", "text", n=8).collect()
    }
    assert out[1] == (0, 0, 1.0)
    assert out[2] == (3, 3, 0.0)  # 10 tokens -> 3 distinct 8-grams
    assert out[3] == (3, 3, 0.0)
    assert out[4] == (3, 0, 1.0)


def test_ngram_novelty_counts_distinct_grams(spark):
    # 9 tokens with an internal repeat: 8-gram list has 2 entries but
    # they differ; a doc repeating the SAME window only counts once
    text = " ".join(["a"] * 9)  # every 8-gram identical -> 1 distinct
    df = spark.createDataFrame(
        [(1, text)], "doc_id long, text string"
    )
    r = C.ngram_novelty(df, "doc_id", "text", n=8).collect()[0]
    assert (r["n_grams"], r["n_shared"], r["novelty"]) == (1, 0, 1.0)


def test_phrase_matches_positions_and_overlap(spark):
    from news_clustering_and_summarization_spark.operators.curation import (
        phrase_matches,
    )

    df = spark.createDataFrame(
        [
            (1, "x slow hash y slow hash"),   # matches at pos 2 and 5
            (2, "a a a"),                     # overlapping 'a a': pos 1, 2
            (3, "slow x hash"),               # adjacency broken: no match
            (4, "hash slow"),                 # wrong order: no match
        ],
        ["doc_id", "text"],
    )
    out = {r["id"]: r for r in phrase_matches(df, "slow hash").collect()}
    assert set(out) == {1}
    assert out[1]["n_matches"] == 2
    assert out[1]["first_pos"] == 2 and out[1]["last_pos"] == 5
    aa = {r["id"]: r for r in phrase_matches(df, "a a").collect()}
    assert aa[2]["n_matches"] == 2
    assert aa[2]["first_pos"] == 1 and aa[2]["last_pos"] == 2


def test_phrase_matches_three_terms_and_validation(spark):
    import pytest

    from news_clustering_and_summarization_spark.operators.curation import (
        phrase_matches,
    )

    df = spark.createDataFrame(
        [(1, "the Big Order scan runs"), (2, "big scan order")],
        ["doc_id", "text"],
    )
    out = phrase_matches(df, "Big order SCAN").collect()  # case-folds
    assert [(r["id"], r["first_pos"]) for r in out] == [(1, 2)]
    with pytest.raises(ValueError):
        phrase_matches(df, "bad'quote term")
    with pytest.raises(ValueError):
        phrase_matches(df, "   ")


def test_rrf_fuse_semantics(spark):
    """RRF: a doc ranked #1 in both legs beats a doc #1 in only one;
    docs in a single leg still fuse (coalesce 0); k dampens rank
    differences; twin matches."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.curation import (
        rrf_fuse,
        rrf_fuse_sql,
    )

    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], ["doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [(10, 1), (40, 2)], ["doc_id", "rank"]
    )
    got = [tuple(r) for r in rrf_fuse(a, b, top_k=10).collect()]
    ids = [g[0] for g in got]
    assert ids[0] == 10                  # in both legs at rank 1
    assert set(ids) == {10, 20, 30, 40}
    both = dict((g[0], g[3]) for g in got)
    assert both[10] == 2 * round(1e9 / 61)
    assert both[40] == round(1e9 / 62)

    sql = rrf_fuse_sql(
        "SELECT * FROM (VALUES (10, 1), (20, 2), (30, 3)) t(id, rank)",
        "SELECT * FROM (VALUES (10, 1), (40, 2)) t(id, rank)",
        top_k=10,
    )
    want = [tuple(r) for r in duckdb.sql(sql).fetchall()]
    assert got == want
