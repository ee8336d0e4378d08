"""P2/P3/P5/P11/P12 scalar text operators vs reference semantics and
the DuckDB oracle fragments."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.functions import text as TX
from tests.conftest import assert_matches_oracle


def ref_clean_text(text: str) -> str:
    # reference pre_process_docs.py:16-20 semantics
    text = text.replace("&quot;", '"')
    return re.sub(r'[^:a-zA-Z0-9\s"\'-]', "", text)


CASES = [
    "Hello, &quot;World&quot;! — em-dash; semi:colon",
    "tabs\tand\nnewlines stay",
    "número ünïcode 字",
    "plain",
    "",
]


def test_clean_text_matches_reference(spark):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)], "i int, s string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", TX.clean_text("s").alias("c")).collect()
    }
    for i, c in enumerate(CASES):
        assert got[i] == ref_clean_text(c), f"case {i}: {got[i]!r}"


def test_clean_text_matches_duckdb(spark, duck):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)], "i int, s string")
    duck.execute("CREATE OR REPLACE TABLE _ct(i INT, s VARCHAR)")
    for i, c in enumerate(CASES):
        duck.execute("INSERT INTO _ct VALUES (?, ?)", [i, c])
    assert_matches_oracle(
        df.select("i", TX.clean_text("s").alias("c")),
        duck,
        f"SELECT i, {TX.clean_text_sql('s')} AS c FROM _ct",
    )


def test_strip_tags_expr_and_udf(spark):
    rows = [
        (0, "<p>Hello <b>world</b></p>", "Hello world"),
        (1, "no tags", "no tags"),
        (2, "<a href='x'>link</a> tail", "link tail"),
        (3, None, None),
    ]
    df = spark.createDataFrame(rows, "i int, s string, want string")
    got = df.select(
        "i",
        "want",
        TX.strip_tags_expr("s").alias("expr"),
        TX.remove_tags_udf(F.col("s")).alias("udf"),
    ).collect()
    for r in got:
        assert r["expr"] == r["want"]
        assert r["udf"] == r["want"]


def test_remove_tags_udf_decodes_entities(spark):
    df = spark.createDataFrame([(1, "a &amp; b &lt;c&gt;")], "i int, s string")
    [r] = df.select(TX.remove_tags_udf(F.col("s")).alias("t")).collect()
    assert r["t"] == "a & b <c>"


ENTITIES = [
    (
        1,
        [("Alpha", 0.9), ("Beta", 0.8), ("Gamma", 0.5)],
        [("OrgA", 0.6), ("OrgB", 0.3)],
        [("P One", 0.5), ("P Two", 0.9)],
        [("Loc", 0.8), ("Loc2", 0.81)],
    ),
    (2, [], [], [], []),
]


def test_entity_extractors_reference_semantics(spark):
    df = spark.createDataFrame(
        ENTITIES,
        "i int, subjects array<struct<long_name:string,relevance:double>>, "
        "organizations array<struct<name:string,relevance:double>>, "
        "people array<struct<name:string,relevance:double>>, "
        "locations array<struct<long_name:string,relevance:double>>",
    )
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            TX.extract_top_subjects("subjects").alias("subj"),
            TX.extract_top_organizations("organizations").alias("orgs"),
            TX.get_names("people").alias("people"),
            TX.get_locations("locations").alias("locs"),
        ).collect()
    }
    # subjects: >= 0.8, prefix always emitted (pre_process_docs.py:23-29)
    assert got[1]["subj"] == "StorySubjects: Alpha, Beta"
    assert got[2]["subj"] == "StorySubjects: "
    # organizations: >= 0.6, '' when empty (pre_process_docs.py:42-50)
    assert got[1]["orgs"] == "RelevantOrganizations: OrgA"
    assert got[2]["orgs"] == ""
    # people: strict > 0.5 (pre_process_docs.py:59-65)
    assert got[1]["people"] == "PeopleOfInterest: P Two"
    # locations: strict > 0.8 (pre_process_docs.py:68-78)
    assert got[1]["locs"] == "Location: Loc2"


def test_parse_summary_response(spark):
    rows = [
        (1, "junk <title>T</title> mid <summary>S</summary> end"),
        (2, "<title>A</title><title>B</title><summary>S2</summary>"),
        (3, "no tags at all"),
    ]
    df = spark.createDataFrame(rows, "i int, res string")
    t, s = TX.parse_summary_response("res")
    got = {r["i"]: r for r in df.select("i", t.alias("t"), s.alias("s")).collect()}
    assert got[1]["t"] == "T" and got[1]["s"] == "S"
    # python split('<title>')[-1] takes text after the LAST open tag
    assert got[2]["t"] == "B" and got[2]["s"] == "S2"
    # fallback: whole text when no tags (summarization.py:121-127)
    assert got[3]["t"] == "no tags at all" and got[3]["s"] == "no tags at all"


def test_truncation_and_prompt(spark):
    df = spark.createDataFrame([(1, "x" * 5000)], "i int, s string")
    [r] = df.select(
        F.length(TX.truncate("s", TX.SUMMARY_LIMIT_FIRST)).alias("n")
    ).collect()
    assert r["n"] == 2000
