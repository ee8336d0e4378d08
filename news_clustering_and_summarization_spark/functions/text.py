"""Scalar text operators (SURVEY §2.2 P1-P15).

All hot-path ops are Column expressions (JVM-side, whole-stage
codegen). The only Python UDF is the full HTML stripper (P3), which
needs entity decoding; a pure-expression variant ``strip_tags_expr``
covers the tag-removal subset and is what oracle-checked queries use.
"""

from __future__ import annotations

import html as _html
import re as _re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- P2: clean_text (reference pre_process_docs.py:16-20) -------------
# `&quot;` -> `"`, then strip every char not in [:a-zA-Z0-9\s"'-].
_CLEAN_KEEP_NEGATED = r"""[^:a-zA-Z0-9\s"'-]"""


def clean_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(c, F.lit("&quot;"), F.lit('"')),
        F.lit(_CLEAN_KEEP_NEGATED),
        F.lit(""),
    )


# SQL fragment usable verbatim in a DuckDB oracle (same RE2/Java regex
# subset; both engines treat \s and the literal trailing '-' the same).
def clean_text_sql(expr: str) -> str:
    return (
        "regexp_replace(replace({e}, '&quot;', '\"'), "
        "'[^:a-zA-Z0-9\\s\"''-]', '', 'g')"
    ).format(e=expr)


# --- P3: remove_tags ---------------------------------------------------
# Reference uses BeautifulSoup.get_text() (pre_process_docs.py:54-56).
# Expression variant: drop <...> tags then collapse entities we care
# about. Full-fidelity variant is a pandas UDF with stdlib html.


def strip_tags_expr(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, F.lit(r"<[^>]*>"), F.lit(""))


def strip_tags_sql(expr: str) -> str:
    return "regexp_replace({e}, '<[^>]*>', '', 'g')".format(e=expr)


_TAG_RE = _re.compile(r"<[^>]*>")


@F.pandas_udf(T.StringType())
def remove_tags_udf(s: pd.Series) -> pd.Series:
    """HTML -> visible text: strip tags, decode entities (P3)."""
    return s.map(
        lambda x: _html.unescape(_TAG_RE.sub("", x)) if x is not None else None
    )


# --- P5: entity threshold extractors (pre_process_docs.py:23-79) ------
# From array<struct{name|long_name, relevance}> keep entries above a
# threshold and join into a labeled string. Reference quirks preserved:
# subjects always emits its prefix (even when empty); the others emit
# '' when nothing passes; subjects/industries/organizations use >=,
# people/locations use strict >.


def _extract(
    col: Column | str,
    prefix: str,
    name_field: str,
    threshold: float,
    strict: bool,
    empty_prefix: bool,
) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    pred = (
        (lambda e: e["relevance"] > F.lit(threshold))
        if strict
        else (lambda e: e["relevance"] >= F.lit(threshold))
    )
    joined = F.array_join(
        F.transform(F.filter(c, pred), lambda e: e[name_field]), ", "
    )
    labeled = F.concat(F.lit(prefix), joined)
    if empty_prefix:
        return labeled
    return F.when(joined == "", F.lit("")).otherwise(labeled)


def extract_top_subjects(col, threshold: float = 0.8) -> Column:
    return _extract(col, "StorySubjects: ", "long_name", threshold, False, True)


def extract_top_industries(col, threshold: float = 0.8) -> Column:
    return _extract(
        col, "RelevantIndustries: ", "long_name", threshold, False, False
    )


def extract_top_organizations(col, threshold: float = 0.6) -> Column:
    return _extract(
        col, "RelevantOrganizations: ", "name", threshold, False, False
    )


def get_names(col, threshold: float = 0.5) -> Column:
    return _extract(col, "PeopleOfInterest: ", "name", threshold, True, False)


def get_locations(col, threshold: float = 0.8) -> Column:
    return _extract(col, "Location: ", "long_name", threshold, True, False)


# --- P6: embed-text concat (embed_docs.py:10-20, 30-42) ---------------
# Join string-typed fields with '\n'; nulls skipped (concat_ws drops
# nulls, matching the reference's isinstance(str) guard).


def concat_embed_text(*cols: Column | str) -> Column:
    return F.concat_ws("\n", *cols)


# --- P8: oversize-payload guard (embed_docs.py:100-102) ---------------
SQS_MAX_BYTES = 262_144


def payload_size_ok(df_cols: Column) -> Column:
    """True when the JSON-serialized row fits the 256 KiB limit."""
    return F.octet_length(F.to_json(df_cols)) <= F.lit(SQS_MAX_BYTES)


# --- P11: truncation budgets (summarization.py:132-146) ---------------
SUMMARY_LIMIT_FIRST = 2000
SUMMARY_LIMIT_LATER = 1500
PROMPT_LIMIT = 12000


def truncate(col: Column | str, n: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, n)


# --- P12: LLM tag parsing (summarization.py:121-127) ------------------
# Python semantics: res.split("<title>")[-1].split("</title>")[0] —
# i.e. text after the LAST opening tag, up to the next closing tag
# (whole remainder if no closing tag). Fallback title "<Title>",
# fallback summary = whole response.


def parse_tag(col: Column | str, tag: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    after_open = F.element_at(F.split(c, F.lit(f"<{tag}>"), -1), -1)
    return F.element_at(F.split(after_open, F.lit(f"</{tag}>"), 2), 1)


def parse_summary_response(col: Column | str) -> tuple[Column, Column]:
    c = F.col(col) if isinstance(col, str) else col
    title = parse_tag(c, "title")
    summary = parse_tag(c, "summary")
    title = F.when(c.isNull(), F.lit("<Title>")).otherwise(title)
    summary = F.when(c.isNull(), F.lit("")).otherwise(summary)
    return title, summary


# --- P14: date parsing/formatting (summarization.py:33-35, 59-60) -----
DATE_FMT = "yyyy-MM-dd HH:mm:ss"


def parse_pub_date(col: Column | str) -> Column:
    """ISO-ish string -> timestamp; tolerates trailing 'Z'
    (reference rstrip('Z'), summarization.py:33-35)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(F.regexp_replace(c, "Z+$", ""))


def format_date(col: Column) -> Column:
    return F.date_format(col, DATE_FMT)


# --- P15: instruction prompt template (summarization.py:136-143) ------
SUMMARY_INSTRUCTIONS = (
    "You will be provided with multiple sets of titles and summaries "
    "from different articles in <context> tag, and the current title "
    "and summary for a story in <story> tag. Compile, summarize and "
    "update the current title and summary for the story. The summary "
    "should be less than 100 words. Put the generated context inside "
    "<title> and <summary> tag. Do not hallucinate or make up "
    "content.\n\n"
)


def article_prompt_line(title: Column, summary: Column, limit: Column) -> Column:
    """One `title: ..., summary: ...` context line (summarization.py:137-142)."""
    return F.concat(
        F.lit("title: "),
        F.coalesce(title, F.lit("")),
        F.lit(", summary: "),
        F.substring(F.coalesce(summary, F.lit("")), F.lit(1), limit),
    )


def assemble_prompt(previous_summary: Column, context_lines: Column) -> Column:
    """Full prompt from previous summary + pre-joined context block."""
    return F.substring(
        F.concat(
            F.lit(SUMMARY_INSTRUCTIONS),
            F.lit(" <story> \n"),
            F.coalesce(previous_summary, F.lit("")),
            F.lit(" </story> \n\n <context>\n"),
            context_lines,
            F.lit("\n</context>\n"),
        ),
        1,
        PROMPT_LIMIT,
    )
