"""Cross-engine regex conformance (round-6 verdict item 5).

The r05 bug class was "a pattern means different things to Java regex
(Spark) and RE2 (DuckDB)" — the pii_redact oracle shipped a pattern
RE2 couldn't even parse. For EVERY regex the oracles embed, assert
both engines agree on per-row match counts over a fixture table of
adversarial strings; that catches parse failures AND semantic
divergence (escaping, \\s/\\d class meaning, anchors, char-class
ranges) in one place. New oracle regexes must be added to PATTERNS.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.functions import hashing as H
from news_clustering_and_summarization_spark.functions import text as TX
from news_clustering_and_summarization_spark.operators.curation import (
    PII_PATTERNS,
)

# Every regex an oracle embeds: (name, raw pattern). Kept RE2-safe by
# construction (no lookaround / backrefs) — this test enforces it.
PATTERNS: list[tuple[str, str]] = [
    *[(f"pii_{kind}", pat) for kind, pat, _ in PII_PATTERNS],
    ("clean_text_class", TX._CLEAN_KEEP_NEGATED),
    ("strip_tags", r"<[^>]*>"),
    ("trailing_z", r"Z+$"),
    ("token_split", H.TOKEN_SPLIT_RE),
]

# Adversarial fixture strings: digit runs inside emails, dashes at
# char-class edges, unicode, entities, empty, tags, timestamps.
FIXTURES = [
    "plain text with nothing special",
    "a12345678901@example.com",
    "call +1 555-123-4567 or 555 123 4567 now",
    "ips 192.168.1.1 10.0.0.255 999.999.999.999",
    "mixed bob.smith99@sub.example.org, 192.168.0.1, +44 20-7946-0958",
    'he said &quot;hello&quot; don\'t-stop: ok',
    "<p>tag <b>soup</b></p> < not a tag",
    "2024-01-02T03:04:05Z and ZZZ and endZ",
    "unicode café naïve 中文 emoji \U0001f600",
    "dashes -a-b- [x-y] and spaces   tabs\there",
    "",
    "edge@x.io.",
    "+123456789012345678 too long for phone?",
]


def _escape_sql(s: str) -> str:
    return s.replace("'", "''")


@pytest.mark.parametrize("name,pat", PATTERNS, ids=[p[0] for p in PATTERNS])
def test_match_counts_agree(spark, duck, name, pat):
    df = spark.createDataFrame(
        list(enumerate(FIXTURES)), "i int, s string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select(
            "i",
            F.size(F.regexp_extract_all("s", F.lit(pat), F.lit(0))).alias(
                "n"
            ),
        ).collect()
    }
    values = ", ".join(
        f"({i}, '{_escape_sql(s)}')" for i, s in enumerate(FIXTURES)
    )
    # single-quote escaping ONLY — DuckDB standard literals pass
    # backslashes through verbatim (the r05 lesson)
    esc = _escape_sql(pat)
    want = dict(
        duck.sql(
            f"SELECT i, len(regexp_extract_all(s, '{esc}'))::BIGINT "
            f"FROM (VALUES {values}) AS t(i, s)"
        ).fetchall()
    )
    assert got == want, f"{name}: spark={got} duck={want}"


@pytest.mark.parametrize("name,pat", PATTERNS, ids=[p[0] for p in PATTERNS])
def test_replacement_agrees(spark, duck, name, pat):
    """regexp_replace with a fixed token must yield identical strings
    (match POSITIONS, not just counts)."""
    df = spark.createDataFrame(
        list(enumerate(FIXTURES)), "i int, s string"
    )
    got = {
        r["i"]: r["r"]
        for r in df.select(
            "i", F.regexp_replace("s", pat, "#").alias("r")
        ).collect()
    }
    values = ", ".join(
        f"({i}, '{_escape_sql(s)}')" for i, s in enumerate(FIXTURES)
    )
    esc = _escape_sql(pat)
    want = dict(
        duck.sql(
            f"SELECT i, regexp_replace(s, '{esc}', '#', 'g') "
            f"FROM (VALUES {values}) AS t(i, s)"
        ).fetchall()
    )
    assert got == want, f"{name}: diverging replacements"
