"""Text / preprocess parity queries (SURVEY §2 P2-P6, P11-P12).

Split out of the former plans/catalog.py monolith (r08 verdict item
6) — function bodies unchanged; plans.catalog re-exports every name,
so the driver contract, tests and tools are untouched."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from ..functions import text as TX
from .catalog_shared import (  # noqa: F401
    load,
)

# ---------------------------------------------------------------------
# Text / preprocess (P2-P6, P11-P12)
# ---------------------------------------------------------------------


def q_clean_text(spark, sf):
    docs = load(spark, sf, "documents")
    return docs.select(
        "doc_id",
        TX.clean_text(F.col("text")).alias("cleaned"),
        TX.strip_tags_expr(F.col("text")).alias("stripped"),
        F.length(TX.concat_embed_text("source", "lang", "text"))
        .cast("long")
        .alias("embed_text_len"),
    )


def oracle_clean_text() -> str:
    return f"""
SELECT doc_id,
       {TX.clean_text_sql('text')} AS cleaned,
       {TX.strip_tags_sql('text')} AS stripped,
       length(concat_ws(chr(10), source, lang, text)) AS embed_text_len
FROM documents
"""


def q_tag_parse(spark, sf):
    """P12: wrap text in tags, parse back with last-open-tag
    semantics."""
    docs = load(spark, sf, "documents")
    tagged = docs.select(
        "doc_id",
        F.concat(
            F.lit("preamble <title>"),
            F.col("source"),
            F.lit("</title> body <summary>"),
            F.substring("text", 1, 40),
            F.lit("</summary> tail"),
        ).alias("res"),
    )
    return tagged.select(
        "doc_id",
        TX.parse_tag("res", "title").alias("title"),
        TX.parse_tag("res", "summary").alias("summary"),
    )


ORACLE_TAG_PARSE = """
WITH t AS (
  SELECT doc_id,
         'preamble <title>' || source || '</title> body <summary>' ||
         substr(text, 1, 40) || '</summary> tail' AS res
  FROM documents
)
SELECT doc_id,
       string_split(string_split(res, '<title>')[-1], '</title>')[1] AS title,
       string_split(string_split(res, '<summary>')[-1], '</summary>')[1]
         AS summary
FROM t
"""


def q_oversize_filter(spark, sf):
    """P8 semantics: payload-size guard (byte length on the text
    column; the real operator measures the JSON row)."""
    docs = load(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        (F.octet_length("text") <= F.lit(TX.SQS_MAX_BYTES)).alias("fits"),
    )


ORACLE_OVERSIZE = f"""
SELECT doc_id, strlen(text) AS n_bytes,
       strlen(text) <= {TX.SQS_MAX_BYTES} AS fits
FROM documents
"""


def q_decode_fanout(spark, sf):
    """S3 + M6: base64(JSON list) -> unbase64 -> from_json -> explode,
    the reference's Kinesis wire format (pre_process_docs.py:139-143),
    exercised round-trip on real rows."""
    from pyspark.sql import types as T

    docs = load(spark, sf, "documents")
    b64 = docs.select(
        "doc_id",
        F.base64(
            F.concat(
                F.lit('[{"id":"'),
                F.col("doc_id").cast("string"),
                F.lit('-a"},{"id":"'),
                F.col("doc_id").cast("string"),
                F.lit('-b"}]'),
            ).cast("binary")
        ).alias("data"),
    )
    schema = T.ArrayType(T.StructType([T.StructField("id", T.StringType())]))
    return (
        b64.withColumn("_json", F.unbase64("data").cast("string"))
        .withColumn("_docs", F.from_json("_json", schema))
        .select("doc_id", F.explode("_docs").alias("d"))
        .select("doc_id", F.col("d.id").alias("fanout_id"))
    )


ORACLE_DECODE = """
WITH b AS (
  SELECT doc_id,
         to_base64(('[{"id":"' || doc_id || '-a"},{"id":"' || doc_id ||
                    '-b"}]')::BLOB) AS data
  FROM documents
),
d AS (SELECT doc_id, decode(from_base64(data)) AS j FROM b)
SELECT doc_id, json_extract_string(j, '$[0].id') AS fanout_id FROM d
UNION ALL
SELECT doc_id, json_extract_string(j, '$[1].id') AS fanout_id FROM d
"""


def q_prompt_assembly(spark, sf):
    """P15 + P11 + O1: per-group prompt with chronologically ordered
    `title:, summary:` context lines and the 12k truncation budget."""
    ev = load(spark, sf, "events")
    lines = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.concat(
            F.lit("title: "),
            F.col("event_type"),
            F.lit(", summary: "),
            F.substring(F.col("props"), 1, 1500),
        ).alias("line"),
    )
    ctx = lines.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("_ctx")
    )
    return ctx.select(
        "user_id",
        F.substring(
            F.concat(
                F.lit(TX.SUMMARY_INSTRUCTIONS),
                F.lit(" <context>\n"),
                F.col("_ctx"),
                F.lit("\n</context>\n"),
            ),
            1,
            TX.PROMPT_LIMIT,
        ).alias("prompt"),
    )


ORACLE_PROMPT = f"""
WITH l AS (
  SELECT user_id, ts, event_id,
         'title: ' || event_type || ', summary: ' || substr(props, 1, 1500)
           AS line
  FROM events
),
c AS (
  SELECT user_id,
         string_agg(line, chr(10) ORDER BY ts, event_id) AS ctx
  FROM l GROUP BY user_id
)
SELECT user_id,
       substr('{TX.SUMMARY_INSTRUCTIONS}' || ' <context>' || chr(10) ||
              ctx || chr(10) || '</context>' || chr(10),
              1, {TX.PROMPT_LIMIT}) AS prompt
FROM c
"""


def q_topk_per_group(spark, sf):
    """§2.6 window: top-3 orders by price per customer, total order."""
    orders = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w).cast("long"))
        .where("rank <= 3")
        .select(
            "o_custkey",
            "rank",
            "o_orderkey",
            F.round(F.col("o_totalprice").cast("decimal(18,4)"), 2)
            .cast("double")
            .alias("price"),
        )
    )


ORACLE_TOPK_GROUP = """
WITH r AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
)
SELECT o_custkey, rank, o_orderkey,
       round(CAST(o_totalprice AS DECIMAL(18,4)), 2)::DOUBLE AS price
FROM r WHERE rank <= 3
"""


def q_date_roundtrip(spark, sf):
    """P14: ISO-with-trailing-Z parse (summarization.py:33-35 rstrip)
    then reformat '%Y-%m-%d %H:%M:%S'."""
    orders = load(spark, sf, "orders")
    iso = orders.select(
        "o_orderkey",
        F.concat(
            F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z")
        ).alias("iso_z"),
    )
    return iso.select(
        "o_orderkey",
        TX.format_date(TX.parse_pub_date("iso_z")).alias("parsed"),
    )


ORACLE_DATE_RT = """
SELECT o_orderkey,
       strftime(
         strptime(rtrim(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') || 'Z',
                        'Z'),
                  '%Y-%m-%dT%H:%M:%S'),
         '%Y-%m-%d %H:%M:%S') AS parsed
FROM orders
"""


