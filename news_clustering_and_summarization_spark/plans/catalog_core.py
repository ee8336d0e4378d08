"""Relational core (SURVEY §2.3 J*, §2.4 A*, §2.5 O*, §2.6 windows).

Split out of the former plans/catalog.py monolith (r08 verdict item
6) — function bodies unchanged; plans.catalog re-exports every name,
so the driver contract, tests and tools are untouched."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from ..functions import hashing as H
from ..functions import text as TX
from ..operators import summarize as SM
from ..operators import text_analysis as TA
from .catalog_shared import (  # noqa: F401
    EVENT_TYPES,
    load,
    _dec,
    _money,
)

# ---------------------------------------------------------------------
# Relational core (SURVEY §2.3 J*, §2.4 A*, §2.5 O*, §2.6 windows)
# ---------------------------------------------------------------------


def q_pricing_summary(spark, sf):
    """TPC-H Q1 shape: multi-agg groupBy (A1/A5/A6 family)."""
    li = load(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            _money(F.sum(_dec("l_extendedprice"))).alias("sum_base_price"),
            _money(
                F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            ).alias("sum_disc_price"),
            F.round(
                F.sum(_dec("l_quantity")).cast("double") / F.count("*"), 6
            ).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2)::DOUBLE
         AS sum_base_price,
       round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                 (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)::DOUBLE
         AS sum_disc_price,
       round(sum(CAST(l_quantity AS DECIMAL(18,4)))::DOUBLE / count(*), 6)
         AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_customers(spark, sf):
    """J1-style broadcast equi-join + A7 top-k with total order."""
    orders = load(spark, sf, "orders")
    customer = load(spark, sf, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("*").alias("n_orders"),
            _money(F.sum(_dec("o_totalprice"))).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


ORACLE_TOP_CUSTOMERS = """
SELECT c_custkey, c_name, count(*) AS n_orders,
       round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)::DOUBLE AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 10
"""


def q_customers_without_orders(spark, sf):
    """J3/O4: anti join (requested-minus-found split)."""
    orders = load(spark, sf, "orders")
    customer = load(spark, sf, "customer")
    return customer.join(
        orders.select("o_custkey"),
        customer.c_custkey == orders.o_custkey,
        "left_anti",
    ).select("c_custkey", "c_name")


ORACLE_NO_ORDERS = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_mode_event_type(spark, sf):
    """A3: mode per group via count + row_number (deterministic
    lexical tiebreak)."""
    ev = load(spark, sf, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", F.col("event_type").alias("mode_event_type"), "n")
    )


ORACLE_MODE = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY user_id, event_type
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY n DESC, event_type ASC) AS rn
  FROM c
)
SELECT user_id, event_type AS mode_event_type, n FROM r WHERE rn = 1
"""


def q_order_date_range(spark, sf):
    """A4 + P14: min/max dates per customer, string-formatted."""
    orders = load(spark, sf, "orders")
    return orders.groupBy("o_custkey").agg(
        F.date_format(F.min("o_orderdate"), TX.DATE_FMT).alias("earliest"),
        F.date_format(F.max("o_orderdate"), TX.DATE_FMT).alias("latest"),
        F.count("*").alias("n_orders"),
    )


ORACLE_DATE_RANGE = """
SELECT o_custkey,
       strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS earliest,
       strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS latest,
       count(*) AS n_orders
FROM orders GROUP BY o_custkey
"""


def q_running_total(spark, sf):
    """§2.6 window: per-user running event-value total in time order."""
    ev = load(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).over(w), 2
        ).cast("double").alias("running_value"),
    )


ORACLE_RUNNING = """
SELECT user_id, event_id,
       round(sum(CAST(value AS DECIMAL(18,2))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)::DOUBLE
         AS running_value
FROM events
"""


def q_sessionize(spark, sf):
    """Sessionization: lag-gap > 30 min starts a new session."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = ev.withColumn(
        "new_sess",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts"), 1).over(w)
            > 1800 * 1_000_000
        ).cast("int"),
    )
    return gapped.groupBy("user_id").agg(
        (F.coalesce(F.sum("new_sess"), F.lit(0)) + 1).alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


ORACLE_SESSIONIZE = """
WITH g AS (
  SELECT user_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) > 1800 * 1000000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id, (coalesce(sum(new_sess), 0) + 1)::BIGINT AS n_sessions,
       count(*) AS n_events
FROM g GROUP BY user_id
"""


def q_quality_deciles(spark, sf):
    """Curriculum prep: rank documents into quality deciles (ntile
    over the composite quality score, doc_id tiebreak) and summarize
    each bucket — the shape used to schedule training data from
    low- to high-quality."""
    docs = load(spark, sf, "documents")
    scored = TA.quality_score(docs, "text")
    # deciles within each language shard: the window partitions by
    # lang, so ranking parallelizes — a global ntile would serialize
    # into one partition (the trap the audit sweep flags)
    w = Window.partitionBy("lang").orderBy("quality_score", "doc_id")
    return (
        scored.withColumn("decile", F.ntile(10).over(w))
        .groupBy("lang", "decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("quality_score"), 6).alias("avg_quality"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        )
    )


def oracle_quality_deciles() -> str:
    tok = H.tokens_sql("text")
    return f"""
WITH scored AS (
  SELECT doc_id, lang, len({tok}) AS n_tokens,
         {TA.quality_score_sql('text')} AS quality_score
  FROM documents
),
ranked AS (
  SELECT *, ntile(10) OVER (
    PARTITION BY lang ORDER BY quality_score, doc_id) AS decile
  FROM scored
)
SELECT lang, decile, count(*) AS n_docs,
       round(avg(quality_score), 6) AS avg_quality,
       round(avg(n_tokens), 6) AS avg_tokens
FROM ranked GROUP BY lang, decile
"""


def q_full_outer_reconcile(spark, sf):
    """Full outer join of two independently aggregated streams (orders
    vs events per day) with zero-filled gaps — the reconciliation
    shape. Both sides pre-aggregate before the join, so the shuffle
    carries one row per day, not per event."""
    ev = load(spark, sf, "events")
    orders = load(spark, sf, "orders")
    od = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("n_orders"))
    ed = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("n_events"))
    return (
        od.join(ed, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


ORACLE_FULL_OUTER = """
WITH od AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, count(*) AS n_orders
  FROM orders GROUP BY 1
),
ed AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events
  FROM events GROUP BY 1
)
SELECT coalesce(od.day, ed.day) AS day,
       coalesce(n_orders, 0) AS n_orders,
       coalesce(n_events, 0) AS n_events
FROM od FULL OUTER JOIN ed ON od.day = ed.day
"""


def q_session_windows(spark, sf):
    """Native session_window aggregation (streaming-ready shape run
    in batch): per-user sessions closing after a 30-minute silence,
    with start / end(+gap) / event count. The oracle re-derives the
    same sessions with the gap-cumsum formulation — two formulations,
    one answer."""
    from ..streaming.windows import session_counts

    ev = load(spark, sf, "events")
    out = session_counts(ev, "ts", gap="30 minutes", keys=["user_id"])
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias(
            "session_end"
        ),
        "n",
    )


ORACLE_SESSION_WINDOWS = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   >= 1800 * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM g
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
         AS session_end,
       count(*) AS n
FROM s GROUP BY user_id, sess
"""


def q_event_pivot(spark, sf):
    """Pivot: per-user event-type counts as columns."""
    ev = load(spark, sf, "events")
    piv = (
        ev.groupBy("user_id").pivot("event_type", EVENT_TYPES).count()
    )
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES],
    )


ORACLE_PIVOT = """
SELECT user_id,
       count(*) FILTER (event_type = 'click') AS n_click,
       count(*) FILTER (event_type = 'error') AS n_error,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'signup') AS n_signup,
       count(*) FILTER (event_type = 'view') AS n_view
FROM events GROUP BY user_id
"""


def q_json_extract(spark, sf):
    """S3 family: JSON payload field extraction (props is a JSON
    string column)."""
    ev = load(spark, sf, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


ORACLE_JSON = """
SELECT event_id, json_extract_string(props, '$.k')::INT AS k_val
FROM events
"""


def q_entity_threshold(spark, sf):
    """P5 semantics on real data: per order, parts with discount >=
    threshold joined into a labeled string ('' when none pass —
    organizations-style)."""
    li = load(spark, sf, "lineitem")
    part = load(spark, sf, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    kept = joined.where(F.col("l_discount") >= 0.08)
    agg = kept.groupBy("l_orderkey").agg(
        F.array_join(
            F.array_sort(F.collect_list("p_name")), ", "
        ).alias("_names")
    )
    all_orders = li.select("l_orderkey").distinct()
    return all_orders.join(agg, "l_orderkey", "left").select(
        "l_orderkey",
        F.when(
            F.col("_names").isNull() | (F.col("_names") == ""), F.lit("")
        )
        .otherwise(F.concat(F.lit("RelevantParts: "), F.col("_names")))
        .alias("relevant_parts"),
    )


ORACLE_ENTITY = """
WITH kept AS (
  SELECT l_orderkey, string_agg(p_name, ', ' ORDER BY p_name) AS names
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_discount >= 0.08
  GROUP BY l_orderkey
)
SELECT o.l_orderkey,
       CASE WHEN k.names IS NULL OR k.names = '' THEN ''
            ELSE 'RelevantParts: ' || k.names END AS relevant_parts
FROM (SELECT DISTINCT l_orderkey FROM lineitem) o
LEFT JOIN kept k ON o.l_orderkey = k.l_orderkey
"""


def q_last_writer_wins(spark, sf):
    """P13/O5: keep-last per key by a deterministic order column —
    latest order per customer."""
    orders = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("last_orderkey"),
            F.date_format("o_orderdate", TX.DATE_FMT).alias("last_orderdate"),
        )
    )


ORACLE_LWW = """
WITH r AS (
  SELECT *, row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey AS last_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS last_orderdate
FROM r WHERE rn = 1
"""


def q_union_set_ops(spark, sf):
    """O4/O6: union + except composition — customers active in orders
    or high-balance, minus those in the BUILDING segment."""
    customer = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    active = customer.join(
        orders.select("o_custkey"),
        customer.c_custkey == orders.o_custkey,
        "left_semi",
    ).select("c_custkey")
    rich = customer.where("c_acctbal > 9000").select("c_custkey")
    building = customer.where("c_mktsegment = 'BUILDING'").select("c_custkey")
    return (
        active.union(rich).distinct().exceptAll(building.distinct())
        .select("c_custkey")
    )


ORACLE_SETOPS = """
SELECT c_custkey FROM (
  SELECT c_custkey FROM customer
  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  UNION
  SELECT c_custkey FROM customer WHERE c_acctbal > 9000
)
EXCEPT ALL
SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
"""


def q_summarize_trigger(spark, sf):
    """ST6: the reference's summarize-trigger predicate over derived
    (n_articles, summary_count) pairs (trigger_sfn.py:45-55)."""
    ev = load(spark, sf, "events")
    base = ev.select(
        "event_id",
        (F.col("event_id") % 40).cast("long").alias("n_articles"),
        (F.col("user_id") % 4).cast("long").alias("summary_count"),
    )
    return base.select(
        "event_id",
        "n_articles",
        "summary_count",
        SM.should_summarize("n_articles", "summary_count").alias("fire"),
    )


ORACLE_TRIGGER = """
SELECT event_id, n AS n_articles, c AS summary_count,
       ((n > 5 * (c + 1)) AND (n < 15)) OR ((n > 5 * (c + 1)) AND c = 0)
         AS fire
FROM (
  SELECT event_id, (event_id % 40)::BIGINT AS n, (user_id % 4)::BIGINT AS c
  FROM events
) t(event_id, n, c)
"""


def q_asof_join(spark, sf):
    """AS-OF join (backward): for each event, the most recent order of
    the same key at or before the event time. Union-sort-window
    composition — one shuffle on the key (operators/temporal.py)."""
    from ..operators.temporal import asof_join

    ev = load(spark, sf, "events").select("event_id", "user_id", "ts")
    orders = load(spark, sf, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    joined = asof_join(
        ev, orders, key="user_id", left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderdate"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("right_o_orderdate", TX.DATE_FMT).alias("asof_orderdate"),
    )


ORACLE_ASOF = """
SELECT e.event_id, e.user_id,
       (SELECT strftime(max(o.o_orderdate), '%Y-%m-%d %H:%M:%S')
        FROM orders o
        WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
         AS asof_orderdate
FROM events e
"""


def q_range_join(spark, sf):
    """Range join: clicks within 1 hour after each signup, per user —
    bucketized equi-join composition (operators/temporal.py), not a
    nested-loop inequality join."""
    from ..operators.temporal import range_join

    ev = load(spark, sf, "events")
    signups = ev.where("event_type = 'signup'").select(
        F.col("event_id").alias("signup_id"), "user_id", "ts"
    )
    clicks = ev.where("event_type = 'click'").select(
        "user_id", F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    pairs = range_join(
        signups, clicks, key="user_id", left_ts="ts",
        right_ts="click_ts", range_seconds=3600,
    )
    return (
        signups.join(
            pairs.groupBy("signup_id").agg(
                F.count("*").alias("n_clicks_1h")
            ),
            "signup_id",
            "left",
        )
        .select(
            "signup_id",
            "user_id",
            F.coalesce("n_clicks_1h", F.lit(0)).alias("n_clicks_1h"),
        )
    )


ORACLE_RANGE = """
SELECT s.event_id AS signup_id, s.user_id,
       count(c.event_id) AS n_clicks_1h
FROM events s
LEFT JOIN events c
  ON c.user_id = s.user_id AND c.event_type = 'click'
 AND epoch_us(c.ts) >= epoch_us(s.ts)
 AND epoch_us(c.ts) < epoch_us(s.ts) + 3600::BIGINT * 1000000
WHERE s.event_type = 'signup'
GROUP BY s.event_id, s.user_id
"""


def q_interval_join(spark, sf):
    """interval_join_streams (streaming/windows.py:83) driven in batch
    mode: non-signup events landing within [signup.ts, signup.ts +
    15 min] for the same user. Same code path as the watermarked
    stream-stream join (the condition is ordinary SQL), so the batch
    oracle pins the join semantics the streaming query uses."""
    from ..streaming.windows import interval_join_streams

    ev = load(spark, sf, "events")
    left = ev.where(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event"),
    )
    right = ev.where(F.col("event_type") != "signup").select(
        "user_id", F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event"),
    )
    joined = interval_join_streams(
        left, right, key="user_id", left_ts="l_ts", right_ts="r_ts",
        tolerance="15 minutes",
    )
    return joined.select(
        "l_event",
        "r_event",
        (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("delta_us"),
    )


ORACLE_INTERVAL_JOIN = """
SELECT l.event_id AS l_event, r.event_id AS r_event,
       (epoch_us(r.ts) - epoch_us(l.ts))::BIGINT AS delta_us
FROM events l
JOIN events r
  ON l.user_id = r.user_id
 AND l.event_type = 'signup' AND r.event_type <> 'signup'
 AND r.ts >= l.ts
 AND r.ts <= l.ts + INTERVAL 15 MINUTE
"""


def q_rollup_summary(spark, sf):
    """ROLLUP aggregation (free via Catalyst; no reference analogue —
    SURVEY §2.4 note)."""
    li = load(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            _money(F.sum(_dec("l_extendedprice"))).alias("sum_price"),
            F.count("*").alias("n"),
        )
    )


ORACLE_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2)::DOUBLE
         AS sum_price,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


