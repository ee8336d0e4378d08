"""Relational breadth beyond strict parity (Catalyst-free wins) + r4 training-data extensions.

Split out of the former plans/catalog.py monolith (r08 verdict item
6) — function bodies unchanged; plans.catalog re-exports every name,
so the driver contract, tests and tools are untouched."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from ..functions import hashing as H
from ..functions.exact import half_away_div_sql
from ..functions import vectors as V
from ..operators import similarity as S
from ..operators import text_analysis as TA
from .catalog_shared import (  # noqa: F401
    load,
    widen,
    _dec,
)

# ---------------------------------------------------------------------
# Relational breadth beyond strict parity (free via Catalyst — SURVEY
# §2.4 note "approx_count_distinct etc. ... come free"; each keeps a
# 100 TB-safe shape: partial aggregation, broadcastable dims, windows
# partitioned on high-cardinality keys)
# ---------------------------------------------------------------------


def q_cube_summary(spark, sf):
    """CUBE over (returnflag, linestatus): all 4 grouping-set levels
    in ONE pass (map-side partial agg per set — no re-scan per level)."""
    li = load(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("double")).alias("sum_qty"),
        F.count("*").alias("n"),
    ).withColumn("sum_qty", F.round("sum_qty", 4))


ORACLE_CUBE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_lag_lead_delta(spark, sf):
    """lag/lead windows: per-customer day gap between consecutive
    orders and the next order's price. Partitioned by customer (high
    cardinality — parallel at any scale); deterministic tiebreak."""
    orders = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).cast("long").alias("days_since_prev"),
        F.round(
            F.lead(F.col("o_totalprice")).over(w).cast("decimal(18,4)"), 2
        ).cast("double").alias("next_price"),
    )


ORACLE_LAG_LEAD = """
SELECT o_custkey, o_orderkey,
       date_diff('day',
         lag(o_orderdate::DATE) OVER w, o_orderdate::DATE) AS days_since_prev,
       round(lead(o_totalprice) OVER w::DECIMAL(18,4), 2)::DOUBLE
         AS next_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_group_quantiles(spark, sf):
    """Exact linearly-interpolated quantiles per group (median + p90).
    Spark ``percentile`` and DuckDB ``quantile_cont`` share the
    (n-1)·p interpolation rule; rounded at the edge."""
    li = load(spark, sf, "lineitem")
    q = F.expr("percentile(CAST(l_quantity AS DOUBLE), array(0.5D, 0.9D))")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(q.getItem(0), 6).alias("median_qty"),
            F.round(q.getItem(1), 6).alias("p90_qty"),
            F.round(F.min(F.col("l_quantity").cast("double")), 6).alias("min_qty"),
            F.round(F.max(F.col("l_quantity").cast("double")), 6).alias("max_qty"),
        )
    )


ORACLE_QUANTILES = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
       round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
       round(min(l_quantity), 6) AS min_qty,
       round(max(l_quantity), 6) AS max_qty
FROM lineitem
GROUP BY l_returnflag
"""


def q_quantile_sketch(spark, sf):
    """Self-certifying quantile sketch (the percentile companion of
    sketch_profile): per group, ``percentile_approx`` runs next to
    the exact percentile and an in-plan assert pins the sketch within
    a rank-error-derived value tolerance; output is the EXACT value +
    the certified flag, so the oracle hash-verifies content while the
    assert certifies the sketch path — at 100 TB you keep only the
    sketch, whose envelope CI has pinned."""
    li = load(spark, sf, "lineitem")
    exact = F.expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.9D)")
    approx = F.expr(
        "percentile_approx(CAST(l_extendedprice AS DOUBLE), 0.9D, 1000)"
    )
    agg = li.groupBy("l_returnflag").agg(
        F.round(exact, 6).alias("p90_price"),
        approx.alias("_p90_approx"),
        F.min(F.col("l_extendedprice").cast("double")).alias("_lo"),
        F.max(F.col("l_extendedprice").cast("double")).alias("_hi"),
    )
    # accuracy=1000 bounds RANK error at n/1000; translate to a value
    # tolerance via the group's value range (loose but sound for the
    # near-uniform price distribution; the assert exists to catch a
    # broken sketch, not to certify tight bounds)
    tol = (F.col("_hi") - F.col("_lo")) * F.lit(0.05)
    return agg.select(
        "l_returnflag",
        "p90_price",
        F.assert_true(
            F.abs(F.col("_p90_approx") - F.col("p90_price")) <= tol,
            F.concat(
                F.lit("quantile sketch out of envelope: "),
                F.col("_p90_approx").cast("string"),
                F.lit(" vs exact "),
                F.col("p90_price").cast("string"),
            ),
        ).isNull().alias("sketch_ok"),
    )


ORACLE_QUANTILE_SKETCH = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice::DOUBLE, 0.9), 6) AS p90_price,
       true AS sketch_ok
FROM lineitem
GROUP BY l_returnflag
"""


def q_event_transitions(spark, sf):
    """Per-user event-type transition counts (the Markov-bigram scan
    behind session modeling / next-event training data): lag window
    per user ordered by (ts, event_id), then a global count per
    (prev, next) pair. One window shuffle + one narrow agg."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n"))
    )


ORACLE_EVENT_TRANSITIONS = """
SELECT prev_type, event_type, count(*) AS n
FROM (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events)
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


def q_exists_composition(spark, sf):
    """Correlated EXISTS / NOT EXISTS as semi + anti joins: customers
    with an urgent order but no low-priority one. Both probe sides
    reduce to key sets (broadcastable at dim scale)."""
    customer = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    urgent = orders.where("o_orderpriority = '1-URGENT'").select("o_custkey")
    low = orders.where("o_orderpriority = '5-LOW'").select("o_custkey")
    return (
        customer.join(
            urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
        )
        .join(low, customer.c_custkey == low.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


ORACLE_EXISTS = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '5-LOW')
"""


def q_intersect_keys(spark, sf):
    """INTERSECT (§2.5 notes the reference has none — engine breadth):
    customers active in both 1995 and 1996."""
    orders = load(spark, sf, "orders")
    y = lambda yr: orders.where(
        F.year("o_orderdate") == yr
    ).select("o_custkey")
    return y(1995).intersect(y(1996))


ORACLE_INTERSECT = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""


def q_above_brand_avg(spark, sf):
    """Correlated scalar subquery as aggregate + broadcast re-join:
    parts priced above their brand's average retail price. The brand
    aggregate is tiny — Catalyst broadcasts it; the big side never
    shuffles."""
    part = load(spark, sf, "part")
    avg_per_brand = part.groupBy("p_brand").agg(
        (
            F.sum(_dec("p_retailprice")).cast("double") / F.count("*")
        ).alias("_avg")
    )
    return (
        part.join(F.broadcast(avg_per_brand), "p_brand")
        .where(F.col("p_retailprice").cast("double") > F.col("_avg"))
        .select(
            "p_partkey",
            "p_brand",
            F.round(_dec("p_retailprice"), 2).cast("double").alias("price"),
        )
    )


ORACLE_ABOVE_AVG = """
SELECT p_partkey, p_brand,
       round(p_retailprice::DECIMAL(18,4), 2)::DOUBLE AS price
FROM part p
WHERE p_retailprice::DOUBLE >
  (SELECT sum(p_retailprice::DECIMAL(18,4))::DOUBLE / count(*)
   FROM part b WHERE b.p_brand = p.p_brand)
"""


def q_distinct_agg(spark, sf):
    """Multi-column DISTINCT aggregation (SURVEY §2.4 notes the
    reference has none — engine breadth). Catalyst plans this as one
    Expand + two-phase HashAggregate: partial per-partition distinct
    before the shuffle, so the wire carries distinct keys only."""
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count("*").alias("n_rows"),
    )


ORACLE_DISTINCT_AGG = """
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT l_partkey) AS n_part,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


def q_string_agg(spark, sf):
    """Ordered string aggregation per group (DuckDB ``string_agg ...
    ORDER BY``): region -> comma-joined sorted nation names. Both
    sides are dims; the join broadcasts and the agg is map-side."""
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count("*").alias("n"),
        )
    )


ORACLE_STRING_AGG = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       count(*) AS n
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_ntile_buckets(spark, sf):
    """ntile(4) price quartiles per order priority. Partitioned by
    priority (bounded fan-in per partition) with a unique-key
    tiebreak so bucket assignment is deterministic cross-engine."""
    orders = load(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").cast("double"), "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("price_quartile"),
    )


ORACLE_NTILE = """
SELECT o_orderkey, o_orderpriority,
       ntile(4) OVER (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice::DOUBLE, o_orderkey)
         AS price_quartile
FROM orders
"""


def q_range_frame_window(spark, sf):
    """RANGE-frame window: per-customer rolling 30-day order spend.
    Spark ``rangeBetween`` needs a numeric sort key, so both engines
    order by days-since-epoch; RANGE includes all peers, making the
    result tie-order independent. Partitioned by customer — high
    cardinality, parallel at any scale."""
    orders = load(spark, sf, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day.cast("long"))
        .rangeBetween(-30, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(_dec("o_totalprice")).over(w).cast("double"), 2).alias(
            "spend_30d"
        ),
    )


ORACLE_RANGE_FRAME = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice::DECIMAL(18,4)) OVER (
         PARTITION BY o_custkey
         ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate::DATE)
         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
       )::DOUBLE, 2) AS spend_30d
FROM orders
"""


def q_profile_columns(spark, sf):
    """ANALYZE-style column profile of orders in one scan (counts,
    nulls, distincts, min/max). Single aggregation job; the melt to
    long form is a zero-shuffle Expand. Columns chosen for identical
    string rendering across engines (ints + strings)."""
    from ..operators.profiling import profile_columns

    orders = load(spark, sf, "orders")
    return profile_columns(
        orders, ["o_orderkey", "o_custkey", "o_orderpriority"]
    )


def _profile_oracle_one(col: str) -> str:
    return f"""
SELECT '{col}' AS column, count(*) AS n,
       sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
       count(DISTINCT {col}) AS n_distinct,
       min({col})::VARCHAR AS min_value,
       max({col})::VARCHAR AS max_value
FROM orders
"""


ORACLE_PROFILE = " UNION ALL ".join(
    _profile_oracle_one(c)
    for c in ["o_orderkey", "o_custkey", "o_orderpriority"]
)


def q_sketch_profile(spark, sf):
    """Per-source document cardinalities with a SELF-CERTIFYING HLL
    sketch (profiling.sketch_profile): approx_count_distinct runs
    next to the exact count and an in-plan assert pins its relative
    error; the oracle hash-verifies the exact values, so a green row
    certifies both legs."""
    from ..operators.profiling import sketch_profile

    docs = load(spark, sf, "documents")
    return sketch_profile(docs, "source", "text", rsd=0.05)


ORACLE_SKETCH_PROFILE = """
SELECT source, count(*) AS n_rows,
       count(DISTINCT text) AS n_distinct,
       true AS sketch_ok
FROM documents
GROUP BY source
"""


def q_scd2_history(spark, sf):
    """Type-2 SCD build over the events change log (temporal.
    scd2_history): per-user runs of identical event_type become
    versioned validity intervals. One Exchange + one Sort serve both
    window passes."""
    from ..operators.temporal import scd2_history

    ev = load(spark, sf, "events")
    hist = scd2_history(
        ev, key="user_id", ts="ts", attrs=["event_type"],
        tiebreak="event_id",
    )
    return hist.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias(
            "valid_from"
        ),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        "version",
        "is_current",
    )


ORACLE_SCD2 = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(ts) OVER w IS NULL OR lag(event_type) OVER w IS DISTINCT
           FROM event_type AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
log AS (SELECT * FROM ordered WHERE chg)
SELECT user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(lead(ts) OVER w2, '%Y-%m-%d %H:%M:%S') AS valid_to,
       row_number() OVER w2 AS version,
       lead(ts) OVER w2 IS NULL AS is_current
FROM log
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_table_diff(spark, sf):
    """Snapshot diff — the data-ops primitive behind incremental
    publishing and CDC backfills: full outer join of two table
    versions on the key, row-hash compare, emit added / removed /
    changed. Versions are derived deterministically from orders so
    the oracle replays them: A drops keys % 7 == 0, B drops
    % 5 == 0 and doubles o_totalprice on % 3 == 0."""
    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", _dec("o_totalprice").alias("price")
    )
    a = orders.where(F.col("o_orderkey") % 7 != 0)
    b = orders.where(F.col("o_orderkey") % 5 != 0).withColumn(
        "price",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("price") * 2
        ).otherwise(F.col("price")),
    )
    ah = a.select(
        "o_orderkey",
        F.md5(F.concat_ws("|", "o_custkey", "price")).alias("_ha"),
    )
    bh = b.select(
        "o_orderkey",
        F.md5(F.concat_ws("|", "o_custkey", "price")).alias("_hb"),
    )
    return (
        ah.join(bh, "o_orderkey", "full_outer")
        .select(
            "o_orderkey",
            F.when(F.col("_ha").isNull(), F.lit("added"))
            .when(F.col("_hb").isNull(), F.lit("removed"))
            .when(F.col("_ha") != F.col("_hb"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
        .where(F.col("status") != "unchanged")
    )


ORACLE_TABLE_DIFF = """
WITH base AS (
  SELECT o_orderkey, o_custkey,
         CAST(o_totalprice AS DECIMAL(18,4)) AS price
  FROM orders
),
a AS (
  SELECT o_orderkey, md5(concat_ws('|', o_custkey, price)) AS ha
  FROM base WHERE o_orderkey % 7 <> 0
),
b AS (
  SELECT o_orderkey,
         md5(concat_ws('|', o_custkey,
             CASE WHEN o_orderkey % 3 = 0 THEN price * 2
                  ELSE price END)) AS hb
  FROM base WHERE o_orderkey % 5 <> 0
)
SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN a.ha IS NULL THEN 'added'
            WHEN b.hb IS NULL THEN 'removed'
            WHEN a.ha <> b.hb THEN 'changed'
            ELSE 'unchanged' END AS status
FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
WHERE (CASE WHEN a.ha IS NULL THEN 'added'
            WHEN b.hb IS NULL THEN 'removed'
            WHEN a.ha <> b.hb THEN 'changed'
            ELSE 'unchanged' END) <> 'unchanged'
"""


def q_value_histogram(spark, sf):
    """Fixed-range histogram of l_extendedprice (24 buckets over
    [0, 120000), open-ended tails clamped): literal bounds keep it a
    single groupBy with no data-dependent pre-scan — the shape of
    every monitoring/drift histogram at scale."""
    li = load(spark, sf, "lineitem")
    lo, width, nb = 0.0, 5000.0, 24
    bucket = F.least(
        F.lit(nb - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col("l_extendedprice") - lo) / width).cast("int"),
        ),
    )
    return (
        li.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .withColumn("lo", F.col("bucket") * width)
        .withColumn("hi", (F.col("bucket") + 1) * width)
    )


ORACLE_VALUE_HISTOGRAM = """
SELECT bucket, count(*) AS n, bucket * 5000.0 AS lo,
       (bucket + 1) * 5000.0 AS hi
FROM (
  SELECT least(23, greatest(0,
           floor((l_extendedprice - 0.0) / 5000.0)::INT)) AS bucket
  FROM lineitem)
GROUP BY bucket
"""


def q_grouping_sets(spark, sf):
    """Explicit GROUPING SETS — ((returnflag), (linestatus)): two
    independent aggregate views in ONE scan + Expand (not two scans
    unioned). Complements cube/rollup with a mixed-set shape."""
    li = load(spark, sf, "lineitem")
    li.createOrReplaceTempView("_li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               round(sum(CAST(l_quantity AS DOUBLE)), 4) AS sum_qty
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


ORACLE_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 4) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


def q_sample_hash(spark, sf):
    """Deterministic content-addressed 10% sample of documents: a
    pure hash filter, partition-independent and pushed to the scan
    (zero shuffle) — the reproducible way to sample a 100 TB corpus."""
    from ..operators import sampling as S

    docs = load(spark, sf, "documents")
    return S.hash_sample(docs, "doc_id", 0.1).select("doc_id", "lang")


def oracle_sample_hash() -> str:
    from ..operators.sampling import bucket_sql

    return f"""
SELECT doc_id, lang FROM documents
WHERE {bucket_sql('doc_id', 42)} < 100000
"""


def q_sample_split(spark, sf):
    """Hash-bucket train/test split of orders (row membership stable
    under corpus growth), summarized per split."""
    from ..operators import sampling as S

    orders = load(spark, sf, "orders")
    return (
        S.train_test_split(orders, "o_orderkey", test_fraction=0.2)
        .groupBy("split")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(_dec("o_totalprice")).cast("double"), 2).alias(
                "total_price"
            ),
        )
    )


def oracle_sample_split() -> str:
    from ..operators.sampling import bucket_sql

    return f"""
SELECT CASE WHEN {bucket_sql('o_orderkey', 42)} < 200000
            THEN 'test' ELSE 'train' END AS split,
       count(*) AS n,
       round(sum(o_totalprice::DECIMAL(18,4))::DOUBLE, 2) AS total_price
FROM orders
GROUP BY 1
"""


def q_sample_stratified(spark, sf):
    """Exact 10%-per-stratum sample of events by event_type: rank by
    content hash inside each stratum, keep ceil(n*0.1). One shuffle
    on the stratum key; strata sampled in parallel."""
    from ..operators import sampling as S

    ev = load(spark, sf, "events")
    return S.stratified_sample(ev, "event_type", "event_id", 0.1).select(
        "event_id", "event_type"
    )


def oracle_sample_stratified() -> str:
    from ..operators.sampling import bucket_sql

    b = bucket_sql("event_id", 42)
    return f"""
SELECT event_id, event_type FROM (
  SELECT event_id, event_type,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY {b}, event_id) AS _rn,
         count(*) OVER (PARTITION BY event_type) AS _n
  FROM events
) WHERE _rn <= ceil(_n * 0.1)
"""


def q_vocab_topk(spark, sf):
    """Corpus vocabulary: top-100 token frequencies with document
    frequency — the tokenizer-training / BPE-prep scan. Explode is
    map-side; the count shuffles only (token, partial-count) pairs
    (two-phase agg), and top-k is a TakeOrdered, never a global sort
    of the vocabulary."""
    from ..functions import fan_out
    from ..functions import hashing as H

    docs = load(spark, sf, "documents")
    tok = fan_out(docs).select(
        "doc_id", F.explode(H.tokens("text")).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), "token")
        .limit(100)
    )


def oracle_vocab_topk() -> str:
    from ..functions.hashing import tokens_sql

    return f"""
SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
FROM (SELECT doc_id, unnest({tokens_sql('text')}) AS token FROM documents)
GROUP BY token
ORDER BY tf DESC, token
LIMIT 100
"""


def q_bucketed_join(spark, sf):
    """Fact-fact join on co-located bucketed tables: orders and
    lineitem written ``bucketBy(orderkey)`` once, then joined with
    ZERO exchanges — the storage-level answer to the biggest shuffle
    at 100 TB. Revenue per order priority; tests assert the physical
    plan is Exchange-free between the scans and the join."""
    from ..sources import tables as T

    tag = _safe_sf_tag(sf)
    o = T.write_bucketed(
        load(spark, sf, "orders").select(
            "o_orderkey", "o_orderpriority"
        ),
        f"orders_bkt_{tag}",
        8,
        "o_orderkey",
        sort_cols=["o_orderkey"],
    )
    l = T.write_bucketed(
        load(spark, sf, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        f"lineitem_bkt_{tag}",
        8,
        "l_orderkey",
        sort_cols=["l_orderkey"],
    )
    orders_b, li_b = spark.table(o), spark.table(l)
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    )
    return (
        li_b.join(orders_b, li_b.l_orderkey == orders_b.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(revenue.cast("double"), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def _safe_sf_tag(sf: str) -> str:
    import re

    return re.sub(r"[^A-Za-z0-9_]", "_", sf.rstrip("/").rsplit("/", 1)[-1])


ORACLE_BUCKETED = """
SELECT o_orderpriority,
       round(sum(l_extendedprice::DECIMAL(18,4)
                 * (1 - l_discount::DECIMAL(18,4)))::DOUBLE, 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_window_counts(spark, sf):
    """Tumbling event-time window aggregation (batch mode of the
    streaming operator — same code path, streaming/windows.py): events
    per hour per type. Spark ``window()`` buckets are epoch-aligned,
    exactly DuckDB ``time_bucket``. One shuffle on (bucket, type)."""
    from ..streaming.windows import windowed_counts

    ev = load(spark, sf, "events")
    out = windowed_counts(
        ev,
        "ts",
        window_size="1 hour",
        keys=["event_type"],
        aggs=[
            F.round(F.sum(F.col("value").cast("double")), 4).alias(
                "sum_value"
            )
        ],
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("wstart"),
        "event_type",
        "n",
        "sum_value",
    )


ORACLE_WINDOW_COUNTS = """
SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S')
         AS wstart,
       event_type,
       count(*) AS n,
       round(sum(value::DOUBLE), 4) AS sum_value
FROM events
GROUP BY 1, 2
"""


def q_skew_join(spark, sf):
    """Salted equi-join: lineitem ⋈ orders with the shuffle spread 16
    ways per key (hot-key insurance when the dim is too big/dynamic to
    broadcast). Result is identical to the plain join — the oracle IS
    the plain join."""
    from ..operators.skew import salted_join

    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "okey")
    orders = load(spark, sf, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, on="okey", salt=16)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("l_quantity").cast("double")), 4).alias(
            "sum_qty"
        ),
    )


ORACLE_SKEW_JOIN = """
SELECT o_orderpriority, count(*) AS n,
       round(sum(l_quantity), 4) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_unpivot_measures(spark, sf):
    """UNPIVOT / melt: wide lineitem measures to long (measure, value)
    rows — the inverse of `event_pivot` (§2.5 breadth). Spark's
    ``unpivot`` is a zero-shuffle Expand (rows fan out in place);
    aggregated per measure per returnflag afterwards."""
    li = load(spark, sf, "lineitem")
    long = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").cast("double").alias("extendedprice"),
        F.col("l_discount").cast("double").alias("discount"),
    ).unpivot(
        ["l_returnflag"],
        ["quantity", "extendedprice", "discount"],
        "measure",
        "value",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
    )


ORACLE_UNPIVOT = """
WITH long AS (
  SELECT l_returnflag, 'quantity' AS measure, l_quantity::DOUBLE AS value
  FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'extendedprice', l_extendedprice::DOUBLE
  FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'discount', l_discount::DOUBLE FROM lineitem
)
SELECT l_returnflag, measure, count(*) AS n,
       round(sum(value), 2) AS total
FROM long GROUP BY l_returnflag, measure
"""


def _media_frame(spark, sf):
    """Synthetic media table derived deterministically from documents
    (payload = utf-8 bytes of text; type keyed off doc_id) — identical
    construction is expressible in DuckDB for the stats oracle."""
    docs = load(spark, sf, "documents")
    return docs.select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )


def q_media_stats(spark, sf):
    """Multimodal corpus stats over the opaque binary column (no
    decode touches the payload bytes; scan + one groupBy on a
    3-value key with map-side partials)."""
    from ..operators.multimodal import media_stats

    return media_stats(_media_frame(spark, sf))


ORACLE_MEDIA_STATS = """
SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       count(*) AS n_assets,
       sum(octet_length(encode(text)))::BIGINT AS total_bytes,
       round(avg(octet_length(encode(text))), 2) AS mean_bytes
FROM documents
GROUP BY 1
"""


def q_phash_dedup(spark, sf):
    """Perceptual-hash image near-dup detection (multimodal.
    phash_duplicates, r08 verdict item 4): aHash 60-bit fingerprints
    over the fake-codec pixel grid, candidates via the shared
    4x15-bit pigeonhole banding (lossless at hamming <= 3), exact
    hamming verify. Near-duplicate images are PLANTED — every 5th
    image asset reappears under asset_id+1000000 with a two-char
    payload suffix (a sub-threshold perturbation of the fake luma
    grid) — so the query must pair each replica with its original.
    The oracle replays fingerprints bit-for-bit and uses the same
    pigeonhole blocks (equivalence with all-pairs is the pigeonhole
    THEOREM, not an implementation coincidence)."""
    from ..operators.multimodal import phash_duplicates

    imgs = _media_frame(spark, sf).where(F.col("media_type") == "image")
    planted = (
        imgs.where(F.col("asset_id").cast("long") % 5 == 0)
        .select(
            (F.col("asset_id").cast("long") + F.lit(1000000))
            .cast("string")
            .alias("asset_id"),
            F.concat(
                F.col("payload"), F.encode(F.lit(" zz"), "utf-8")
            ).alias("payload"),
        )
    )
    return phash_duplicates(
        imgs.select("asset_id", "payload").unionByName(planted),
        max_hamming=3,
    ).orderBy("l_id", "r_id")


def oracle_phash_dedup() -> str:
    from ..operators.multimodal import PHASH_CELLS

    tok = H.tokens_sql("text")
    blocks = ", ".join(
        f"(phash % {1 << ((b + 1) * 15)}) - (phash % {1 << (b * 15)})"
        for b in range(4)
    )
    return f"""
WITH img AS MATERIALIZED (
  SELECT doc_id::VARCHAR AS asset_id, text FROM documents
  WHERE doc_id % 3 = 0
  UNION ALL
  SELECT (doc_id + 1000000)::VARCHAR, text || ' zz' FROM documents
  WHERE doc_id % 3 = 0 AND doc_id % 5 = 0
),
px AS (
  SELECT asset_id, {H.hash64_sql('t')} % {PHASH_CELLS} AS cell,
         count(*)::BIGINT AS value
  FROM (SELECT asset_id, unnest({tok}) AS t FROM img)
  GROUP BY 1, 2
),
fp AS MATERIALIZED (
  SELECT asset_id,
         sum(CASE WHEN value * {PHASH_CELLS} > total
                  THEN (1::BIGINT << cell) ELSE 0 END)::BIGINT AS phash
  FROM (SELECT *, sum(value) OVER (PARTITION BY asset_id) AS total
        FROM px)
  GROUP BY 1
),
keyed AS MATERIALIZED (
  -- no block ordinal (DuckDB lacks WITH ORDINALITY): block values
  -- keep their original bit positions, so cross-block key
  -- collisions are possible only at key=0 — spurious CANDIDATES
  -- the hamming verify below discards, never missed pairs
  SELECT asset_id, phash, u.k AS key
  FROM fp, unnest([{blocks}]) AS u(k)
),
cand AS (
  SELECT DISTINCT a.asset_id AS l_id, a.phash AS l_fp,
                  b.asset_id AS r_id, b.phash AS r_fp
  FROM keyed a JOIN keyed b
    ON a.key = b.key AND a.asset_id < b.asset_id
)
SELECT l_id, r_id,
       {H.hamming_distance_sql('l_fp', 'r_fp')} AS hamming
FROM cand
WHERE {H.hamming_distance_sql('l_fp', 'r_fp')} <= 3
ORDER BY l_id, r_id
"""


def q_media_decode_real(spark, sf):
    """The REAL codec path under the driver's correctness gate
    (r11): each document becomes an 8x8 grayscale image whose pixels
    are md5-derived (the repo's cross-engine hash64), encoded as
    genuine BMP (even doc_id) or PNG (odd doc_id — zlib deflate +
    scanline filters on the wire), decoded back through
    multimodal._real_decode (the same dispatch production assets
    take), and reduced to the 16-bin luma histogram packed into two
    exact int64 columns. DuckDB cannot run a codec — but it CAN
    replay the pixel -> Rec.601 luma -> bin arithmetic from the same
    md5 stream, so a hash-green row certifies encode ∘ decode ==
    identity plus the whole feature pipeline, bit for bit, on every
    document. Python cost is the codec kernel itself (mapInPandas,
    executor-side); the oracle replays construction, not decoding."""
    import hashlib

    import numpy as np
    import pandas as pd

    from ..functions import bmp, png
    from ..operators.multimodal import FEATURE_DIM, _real_decode

    docs = load(spark, sf, "documents").select("doc_id")

    def run(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                vals = np.array(
                    [
                        int(
                            hashlib.md5(
                                f"{did}|px|{i}".encode()
                            ).hexdigest()[:15],
                            16,
                        ) % 256
                        for i in range(64)
                    ],
                    dtype=np.uint8,
                )
                img = np.repeat(
                    vals.reshape(8, 8)[:, :, None], 3, axis=2
                )
                payload = (
                    bmp.encode_bmp(img) if did % 2 == 0
                    else png.encode_png(img, row_filter=4)
                )
                d = _real_decode(payload, "image")
                counts = np.rint(
                    np.array(d["feature"]) * 64
                ).astype(np.int64)
                lo = sum(int(c) << (8 * i)
                         for i, c in enumerate(counts[:8]))
                hi = sum(int(c) << (8 * i)
                         for i, c in enumerate(counts[8:FEATURE_DIM]))
                out.append({
                    "doc_id": did,
                    "fmt": "bmp" if did % 2 == 0 else "png",
                    "width": d["width"],
                    "height": d["height"],
                    "n_frames": d["n_frames"],
                    "bins_lo": lo,
                    "bins_hi": hi,
                })
            yield pd.DataFrame(
                out,
                columns=["doc_id", "fmt", "width", "height",
                         "n_frames", "bins_lo", "bins_hi"],
            )

    return docs.mapInPandas(
        run,
        schema="doc_id long, fmt string, width int, height int, "
        "n_frames int, bins_lo long, bins_hi long",
    )


def oracle_media_decode_real() -> str:
    # bin width: 255_000 // 16 = 15937 (multimodal._luma_hist);
    # gray pixel v -> luma 1000*v (299+587+114)
    h = H.hash64_sql("doc_id::VARCHAR || '|px|' || i::VARCHAR")
    return """
WITH px AS (
  SELECT doc_id, i, ({h}) % 256 AS v
  FROM documents, range(64) t(i)
),
bins AS (
  SELECT doc_id, least((1000 * v) // 15937, 15) AS b,
         count(*)::BIGINT AS c
  FROM px GROUP BY 1, 2
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS fmt,
       8 AS width, 8 AS height, 1 AS n_frames,
       sum(CASE WHEN b < 8 THEN c * (1::BIGINT << (8 * b))
                ELSE 0 END)::BIGINT AS bins_lo,
       sum(CASE WHEN b >= 8 THEN c * (1::BIGINT << (8 * (b - 8)))
                ELSE 0 END)::BIGINT AS bins_hi
FROM bins GROUP BY doc_id
""".format(h=h)


def q_media_frames_real(spark, sf):
    """The GIF codec + frame-extraction OPERATORS under the driver
    gate (r11): each document becomes a 2-frame animated GIF of
    md5-derived 8x8 gray frames, which flows through the REAL
    production operators — extract_frames (GIF frames composed and
    re-encoded as BMP) then decode_media (BMP decode + luma
    histogram) — and out as exact packed int64 bins per frame.
    DuckDB replays the md5 pixel -> luma -> bin arithmetic per
    (doc, frame); a hash-green row certifies GIF encode ∘ LZW decode
    ∘ composition ∘ BMP re-encode ∘ BMP decode == identity on every
    frame of every document."""
    import hashlib

    import numpy as np
    import pandas as pd

    from ..functions import gif
    from ..operators import multimodal as MMOD

    docs = load(spark, sf, "documents").select("doc_id")

    def build(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                frames = []
                for fi in range(2):
                    vals = np.array(
                        [
                            int(
                                hashlib.md5(
                                    f"{did}|gf|{fi}|{i}".encode()
                                ).hexdigest()[:15],
                                16,
                            ) % 256
                            for i in range(64)
                        ],
                        dtype=np.uint8,
                    )
                    frames.append(
                        np.repeat(
                            vals.reshape(8, 8)[:, :, None], 3, axis=2
                        )
                    )
                out.append({
                    "asset_id": str(did),
                    "media_type": "video",
                    "payload": gif.encode_gif(frames),
                })
            yield pd.DataFrame(
                out, columns=["asset_id", "media_type", "payload"]
            )

    media = docs.mapInPandas(
        build, schema="asset_id string, media_type string, payload binary"
    )
    frames = MMOD.extract_frames(media, every_nth=1)
    decoded = MMOD.decode_media(
        frames.select(
            "asset_id", F.lit("image").alias("media_type"), "payload"
        )
    )
    packed = decoded.select(
        F.split("asset_id", "#")[0].cast("long").alias("doc_id"),
        F.split("asset_id", "#")[1].cast("int").alias("frame_index"),
        "width",
        "height",
        F.aggregate(
            F.slice(F.col("feature"), 1, 8),
            F.lit(0).cast("long"),
            lambda acc, x: acc * F.lit(256)
            + F.round(x * 64).cast("long"),
        ).alias("bins_hi_to_lo_0_7"),
        F.aggregate(
            F.slice(F.col("feature"), 9, 8),
            F.lit(0).cast("long"),
            lambda acc, x: acc * F.lit(256)
            + F.round(x * 64).cast("long"),
        ).alias("bins_hi_to_lo_8_15"),
    )
    return packed


def oracle_media_frames_real() -> str:
    h = H.hash64_sql(
        "doc_id::VARCHAR || '|gf|' || f::VARCHAR || '|' || i::VARCHAR"
    )
    return """
WITH px AS (
  SELECT doc_id, f, i, ({h}) % 256 AS v
  FROM documents, range(2) tf(f), range(64) t(i)
),
bins AS (
  SELECT doc_id, f, least((1000 * v) // 15937, 15) AS b,
         count(*)::BIGINT AS c
  FROM px GROUP BY 1, 2, 3
),
dense AS (
  SELECT d.doc_id, tf.f, tb.b, coalesce(bins.c, 0) AS c
  FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN range(2) tf(f) CROSS JOIN range(16) tb(b)
  LEFT JOIN bins ON bins.doc_id = d.doc_id AND bins.f = tf.f
                AND bins.b = tb.b
)
SELECT doc_id, f::INT AS frame_index, 8 AS width, 8 AS height,
       sum(CASE WHEN b < 8
                THEN c * power(256, 7 - b)::BIGINT ELSE 0 END)::BIGINT
           AS bins_hi_to_lo_0_7,
       sum(CASE WHEN b >= 8
                THEN c * power(256, 15 - b)::BIGINT ELSE 0 END)::BIGINT
           AS bins_hi_to_lo_8_15
FROM dense GROUP BY doc_id, f
""".format(h=h)


def q_preprocess_stage(spark, sf):
    """The FULL preprocess stage (P1+P2-P4+P7 composed, operators/
    preprocess.preprocess) under the driver gate — previously its
    pieces were oracled (`clean_text`) or pytest-only (vendor drop,
    stage composition, corrupt/dup guards). Articles are derived
    from documents with three planted hazards: a vendor column
    ("spam", from schemas.VENDOR_DROP_COLUMNS — P1 must remove it or
    the schema compare fails), VALUE-IDENTICAL duplicate ids for
    every doc_id % 7 == 0 (P7 dedup; identical rows make the
    arbitrary-winner choice deterministic), and corrupt_record rows
    with NULL ids (the P7 parse guard must cut them). The oracle
    replays clean_text/strip_tags via the shared SQL fragments on
    the deduplicated, guard-filtered base."""
    from ..operators.preprocess import preprocess

    docs = load(spark, sf, "documents")
    arts = docs.select(
        F.col("doc_id").cast("string").alias("id"),
        F.concat(F.lit("Title <b>"), "source", F.lit("</b> & co")
                 ).alias("title"),
        F.col("text").alias("text"),
        F.concat(
            F.lit("2024-03-"),
            F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
        ).alias("date"),
        F.col("lang").alias("spam"),  # planted vendor column (P1)
        F.lit(None).cast("string").alias("corrupt_record"),
    )
    dups = arts.where(F.col("id").cast("long") % 7 == 0)
    corrupt = docs.where(F.col("doc_id") % 11 == 0).select(
        F.lit(None).cast("string").alias("id"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("date"),
        F.lit(None).cast("string").alias("spam"),
        F.concat(F.lit("{bad json "), F.col("doc_id").cast("string"))
        .alias("corrupt_record"),
    )
    staged = arts.unionByName(dups).unionByName(corrupt)
    return preprocess(staged).select(
        "id",
        "title",
        F.length("summary").alias("summary_len"),
        "text",
        "publication_date",
    )


def oracle_preprocess_stage() -> str:
    from ..functions.text import clean_text_sql, strip_tags_sql

    title_in = "('Title <b>' || source || '</b> & co')"
    date_in = ("('2024-03-' || lpad(((doc_id % 28) + 1)::VARCHAR,"
               " 2, '0'))")
    return """
SELECT doc_id::VARCHAR AS id,
       {title} AS title,
       length({summary}) AS summary_len,
       {text_out} AS text,
       {date_out} AS publication_date
FROM documents
""".format(
        title=clean_text_sql(title_in),
        summary=clean_text_sql("text"),
        text_out=strip_tags_sql("text"),
        date_out=strip_tags_sql(date_in),
    )


def q_cluster_assignments(spark, sf):
    """J2 under the driver gate (previously pytest-only): the
    cluster-association lookup — (PK, article_ids array) update rows
    exploded to one row per (PK, article_id) with duplicate
    associations collapsed (operators/cluster_tables.
    assignments_from_updates), then the serving-side displayable
    predicate (serving.displayable_clusters, P10/A6's gate) applied
    to a clusters frame derived from the same groups. Updates are
    built from orders: PK = o_custkey % 200, with every orderkey
    % 5 == 0 association INJECTED TWICE (the dedup must collapse
    it). Output: one row per cluster with its deduplicated
    association count and displayability."""
    from ..operators.cluster_tables import assignments_from_updates
    from ..operators.serving import displayable_clusters

    orders = load(spark, sf, "orders")
    pairs = orders.select(
        (F.col("o_custkey") % 200).cast("long").alias("pk_num"),
        F.col("o_orderkey").cast("string").alias("aid"),
    )
    doubled = pairs.unionByName(
        pairs.where(F.col("aid").cast("long") % 5 == 0)
    )
    updates = doubled.groupBy("pk_num").agg(
        F.collect_list("aid").alias("article_ids")
    ).select(
        F.concat(F.lit("CLUSTER#"), F.col("pk_num").cast("string"))
        .alias("PK"),
        "pk_num",
        "article_ids",
    )
    assigns = assignments_from_updates(
        updates.select("PK", "article_ids")
    )
    counts = assigns.groupBy("PK").agg(
        F.count("*").alias("article_count")
    )
    clusters = updates.select(
        "PK",
        (F.col("pk_num") % 5 != 0).alias("is_cluster"),
        F.when(F.col("pk_num") % 3 == 0, F.lit("")).otherwise(
            F.lit("summary")
        ).alias("generated_summary"),
        F.size("article_ids").alias("number_of_articles"),
    )
    disp = displayable_clusters(clusters).select(
        "PK", F.lit(True).alias("displayable")
    )
    return counts.join(disp, "PK", "left").select(
        "PK",
        "article_count",
        F.coalesce("displayable", F.lit(False)).alias("displayable"),
    )


def oracle_cluster_assignments() -> str:
    # number_of_articles counts the RAW (pre-dedup) association list,
    # mirroring the Spark side's size(article_ids) over the doubled
    # rows; article_count counts the deduplicated associations
    return """
WITH pairs AS (
  SELECT (o_custkey % 200)::BIGINT AS pk_num,
         o_orderkey::VARCHAR AS aid
  FROM orders
),
doubled AS (
  SELECT * FROM pairs
  UNION ALL
  SELECT * FROM pairs WHERE aid::BIGINT % 5 = 0
),
assigns AS (SELECT DISTINCT pk_num, aid FROM doubled),
counts AS (
  SELECT pk_num, count(*)::BIGINT AS article_count
  FROM assigns GROUP BY pk_num
),
raw_n AS (
  SELECT pk_num, count(*)::BIGINT AS n_raw FROM doubled GROUP BY pk_num
)
SELECT 'CLUSTER#' || c.pk_num::VARCHAR AS "PK",
       c.article_count,
       (c.pk_num % 5 != 0 AND c.pk_num % 3 != 0 AND r.n_raw > 2)
           AS displayable
FROM counts c JOIN raw_n r USING (pk_num)
"""


def q_audio_decode_real(spark, sf):
    """The WAV codec under the driver gate (r11): each document
    becomes 512 md5-derived PCM16 samples, encoded as a genuine WAV,
    decoded back through functions/wav (the production audio path),
    and reduced to per-segment sum-of-squares energies. PCM16 decode
    is EXACT in float32 (int16/32768 has a power-of-two divisor), so
    rint(sample*32768) reconstructs the original integers and the
    energies are exact int64s DuckDB replays from the same md5
    stream — a hash-green row certifies encode ∘ decode == identity
    on every sample of every document."""
    import hashlib

    import numpy as np
    import pandas as pd

    from ..functions import wav

    docs = load(spark, sf, "documents").select("doc_id")
    n, seg = 512, 128

    def run(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                ints = np.array(
                    [
                        int(
                            hashlib.md5(
                                f"{did}|au|{i}".encode()
                            ).hexdigest()[:15],
                            16,
                        ) % 65536 - 32768
                        for i in range(n)
                    ],
                    dtype=np.int64,
                )
                payload = wav.encode_wav(
                    ints.astype(np.float64) / 32768.0, 8000, bits=16
                )
                decoded, rate = wav.decode_wav(payload)
                back = np.rint(
                    decoded[:, 0].astype(np.float64) * 32768.0
                ).astype(np.int64)
                row = {"doc_id": did, "sample_rate": rate,
                       "n_samples": int(len(back))}
                for s in range(n // seg):
                    row[f"energy_{s}"] = int(
                        (back[s * seg: (s + 1) * seg] ** 2).sum()
                    )
                out.append(row)
            yield pd.DataFrame(
                out,
                columns=["doc_id", "sample_rate", "n_samples"]
                + [f"energy_{s}" for s in range(n // seg)],
            )

    return docs.mapInPandas(
        run,
        schema="doc_id long, sample_rate int, n_samples int, "
        + ", ".join(f"energy_{s} long" for s in range(n // seg)),
    )


def oracle_audio_decode_real() -> str:
    h = H.hash64_sql("doc_id::VARCHAR || '|au|' || i::VARCHAR")
    energies = ", ".join(
        f"sum(CASE WHEN i // 128 = {s} THEN v * v ELSE 0 END)::BIGINT "
        f"AS energy_{s}"
        for s in range(4)
    )
    return """
WITH px AS (
  SELECT doc_id, i, ({h}) % 65536 - 32768 AS v
  FROM documents, range(512) t(i)
)
SELECT doc_id, 8000 AS sample_rate, 512 AS n_samples, {energies}
FROM px GROUP BY doc_id
""".format(h=h, energies=energies)


def q_multimodal_decode(spark, sf):
    """Decode -> frame-sample over mapInPandas with the deterministic
    fake codec — the SQL-replayable twin of the real path (the real
    codecs are exercised by `media_decode_real` and the pytest
    suites; DuckDB can replay a hash, not a codec). The fake derives
    dimensions from md5(payload); exact per-row semantics are also
    golden-tested in tests/test_multimodal.py."""
    from ..operators.multimodal import decode_media, sample_frames

    decoded = decode_media(_media_frame(spark, sf), fake=True)
    frames = sample_frames(decoded, every_nth=5)
    return (
        decoded.select("asset_id", "media_type")
        .join(frames, "asset_id", "left")
        .groupBy("media_type")
        .agg(
            F.countDistinct("asset_id").alias("n_assets"),
            F.count("frame_index").alias("n_sampled_frames"),
        )
    )


def q_embed_instruction(spark, sf):
    """M2 (instruction prefixes) under the driver gate — previously
    pytest-only: embed each document's text twice through the
    production embedding UDF (operators/embed.make_embed_udf), once
    bare and once with the instruction prefix 'query: ' (the
    reference's embedding_model_utils.py:60-61 hook). The prefix
    adds exactly one 'query' token to every token stream, so the
    oracle replays both hash embeddings (incl. the float32 wire
    quantization) and the per-doc cosine between them — a hash-green
    row certifies the prefix reaches the tokenizer, shifts exactly
    one bucket, and nothing else."""
    from ..operators.embed import DeterministicHashEmbedder, make_embed_udf

    docs = load(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("id"),
        F.coalesce("text", F.lit("")).alias("text"),
    )
    plain_udf = make_embed_udf(DeterministicHashEmbedder())
    inst_udf = make_embed_udf(
        DeterministicHashEmbedder(instruction="query: ")
    )
    both = docs.select(
        "id",
        F.element_at(plain_udf("text"), 1).alias("vp"),
        F.element_at(inst_udf("text"), 1).alias("vi"),
    )

    def _d(col):
        return F.transform(col, lambda x: x.cast("double"))

    dot = F.aggregate(
        F.zip_with(_d("vp"), _d("vi"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(_d(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    ck = F.aggregate(
        _d("vi"),
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.floor(x * 1e6 + F.lit(0.5)).cast("long"),
    )
    np_, ni = nrm("vp"), nrm("vi")
    return both.select(
        "id",
        F.when(np_ * ni == 0, F.lit(0.0))
        .otherwise(F.round(dot / (np_ * ni), 6))
        .alias("cos_plain_inst"),
        (ck % F.lit(2**61 - 1)).alias("inst_vec_ck"),
    )


def oracle_embed_instruction() -> str:
    def vec(extra: str) -> str:
        return """
  SELECT d.id, list(coalesce(h.v, 0.0){extra} ORDER BY b.i) AS raw
  FROM (SELECT id FROM docs) d
  CROSS JOIN range(0, 64) b(i)
  LEFT JOIN hist h ON h.id = d.id AND h.bucket = b.i
  GROUP BY d.id
""".format(extra=extra)

    quantize = """
  SELECT id, list_transform(raw,
           x -> (x / CASE WHEN nrm = 0 THEN 1 ELSE nrm END)::REAL::DOUBLE)
         AS qv
  FROM (SELECT id, raw,
          sqrt(list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(raw, x -> x*x)), (a,v) -> a+v)) AS nrm
        FROM {src})
"""
    return """
WITH docs AS (
  SELECT doc_id::VARCHAR AS id, coalesce(text, '') AS embed_text
  FROM documents
),
tok AS (
  SELECT id, regexp_replace(t, '[^a-z0-9]', '', 'g') AS tk
  FROM (
    SELECT id, unnest(list_filter(
      string_split_regex(lower(embed_text), '\\s+'), x -> x <> '')) AS t
    FROM docs)
),
hashed AS (
  SELECT id,
    ('0x' || substr(md5('42|' || tk), 15, 2))::INT % 64 AS bucket,
    CASE WHEN (('0x' || substr(md5('42|' || tk), 1, 2))::INT // 64) % 2 = 1
         THEN 1.0 ELSE -1.0 END AS sgn
  FROM tok WHERE tk <> ''
),
hist AS (SELECT id, bucket, sum(sgn) AS v FROM hashed GROUP BY id, bucket),
qtok AS (
  SELECT ('0x' || substr(md5('42|query'), 15, 2))::INT % 64 AS qb,
         CASE WHEN (('0x' || substr(md5('42|query'), 1, 2))::INT // 64)
                   % 2 = 1
              THEN 1.0 ELSE -1.0 END AS qs
),
vp_raw AS ({vec_plain}),
vi_raw AS ({vec_inst}),
vp AS ({q_plain}),
vi AS ({q_inst}),
paired AS (
  SELECT p.id, p.qv AS a, i.qv AS b FROM vp p JOIN vi i USING (id)
),
m AS (
  SELECT id,
    list_reduce(list_prepend(0.0::DOUBLE,
      list_transform(range(64), k -> a[k+1] * b[k+1])),
      (acc, v) -> acc + v) AS dot,
    sqrt(list_reduce(list_prepend(0.0::DOUBLE,
      list_transform(a, x -> x*x)), (acc, v) -> acc + v)) AS na,
    sqrt(list_reduce(list_prepend(0.0::DOUBLE,
      list_transform(b, x -> x*x)), (acc, v) -> acc + v)) AS nb,
    list_reduce(list_prepend(0::BIGINT,
      list_transform(b, x -> floor(x * 1e6 + 0.5)::BIGINT)),
      (acc, v) -> acc + v) AS ck
  FROM paired
)
SELECT id,
       CASE WHEN na * nb = 0 THEN 0.0
            ELSE round(dot / (na * nb), 6) END AS cos_plain_inst,
       ck % 2305843009213693951 AS inst_vec_ck
FROM m
""".format(
        vec_plain=vec(""),
        vec_inst=vec(
            " + CASE WHEN b.i = (SELECT qb FROM qtok)"
            " THEN (SELECT qs FROM qtok) ELSE 0.0 END"
        ),
        q_plain=quantize.format(src="vp_raw"),
        q_inst=quantize.format(src="vi_raw"),
    )


def oracle_pipeline_e2e() -> str:
    """SQL replay of preprocess → hash embed → ε-graph → counts.

    The only float32 in the pipeline is the embedding wire format;
    ``::REAL::DOUBLE`` reproduces that rounding exactly, after which
    both engines do float64 arithmetic (dot products differ only in
    summation order, ~1e-15 — far from the ε=0.2 boundary)."""
    dot = V.dot_sql("a.uv", "b.uv")
    return f"""
WITH RECURSIVE docs AS (
  SELECT doc_id::VARCHAR AS id,
         concat_ws(chr(10), source, text, text) AS embed_text
  FROM documents
),
tok AS (
  SELECT id, regexp_replace(t, '[^a-z0-9]', '', 'g') AS tk
  FROM (
    SELECT id, unnest(list_filter(
      string_split_regex(lower(embed_text), '\\s+'), x -> x <> '')) AS t
    FROM docs)
),
hashed AS (
  SELECT id,
    ('0x' || substr(md5('42|' || tk), 15, 2))::INT % 64 AS bucket,
    CASE WHEN (('0x' || substr(md5('42|' || tk), 1, 2))::INT // 64) % 2 = 1
         THEN 1.0 ELSE -1.0 END AS sgn
  FROM tok WHERE tk <> ''
),
hist AS (SELECT id, bucket, sum(sgn) AS v FROM hashed GROUP BY id, bucket),
vec AS (
  SELECT d.id, list(coalesce(h.v, 0.0) ORDER BY b.i) AS raw
  FROM (SELECT id FROM docs) d
  CROSS JOIN range(0, 64) b(i)
  LEFT JOIN hist h ON h.id = d.id AND h.bucket = b.i
  GROUP BY d.id
),
n1 AS (
  SELECT id, raw,
         sqrt(list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(raw, x -> x*x)), (a,v) -> a+v)) AS nrm
  FROM vec
),
q AS (
  SELECT id, list_transform(raw,
           x -> (x / CASE WHEN nrm = 0 THEN 1 ELSE nrm END)::REAL::DOUBLE)
         AS qv
  FROM n1
),
u AS (
  SELECT id, qv,
         sqrt(list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(qv, x -> x*x)), (a,v) -> a+v)) AS qn
  FROM q
),
unit AS MATERIALIZED (
  SELECT id, list_transform(qv,
           x -> x / (CASE WHEN qn < 1e-300 THEN 1e-300 ELSE qn END)) AS uv
  FROM u
),
pair AS MATERIALIZED (
  SELECT a.id AS src, b.id AS dst
  FROM unit a JOIN unit b ON a.id < b.id
  WHERE greatest(0.0, least(1.0, 1.0 - {dot})) <= 0.2
),
edges AS MATERIALIZED (
  SELECT src, dst FROM pair UNION ALL SELECT dst, src FROM pair
),
reach AS (
  SELECT id, id AS comp FROM docs
  UNION
  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
SELECT (cnt.n >= 2) AS is_cluster, count(*) AS n_docs
FROM comp c
JOIN (SELECT component, count(*) AS n FROM comp GROUP BY component) cnt
  USING (component)
GROUP BY 1 ORDER BY 1
"""


ORACLE_MULTIMODAL_DECODE = """
WITH m AS (
  SELECT doc_id::VARCHAR AS asset_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         md5(coalesce(text, '')) AS h
  FROM documents
),
dec AS (
  SELECT asset_id, media_type,
         CASE WHEN media_type = 'image' THEN 1
              ELSE 1 + ('0x' || substr(h, 5, 2))::INT % 30
         END AS n_frames
  FROM m
),
frames AS (
  SELECT asset_id, unnest(range(0, n_frames, 5)) AS frame_index
  FROM dec WHERE n_frames > 1
)
SELECT d.media_type, count(DISTINCT d.asset_id) AS n_assets,
       count(f.frame_index) AS n_sampled_frames
FROM dec d LEFT JOIN frames f ON d.asset_id = f.asset_id
GROUP BY d.media_type
"""


def q_regional_revenue(spark, sf):
    """Six-table star join (TPC-H Q5 shape): ASIA revenue per nation
    for 1996, where the supplying and ordering nations match. The
    three dims (region→nation→supplier) broadcast; the fact-fact
    chain (customer⨝orders⨝lineitem) shuffles on its keys with the
    date filter pushed to the orders scan — Catalyst reorders freely
    because the plan is declared, not scheduled."""
    region = load(spark, sf, "region").where("r_name = 'ASIA'")
    nation = load(spark, sf, "nation")
    supplier = load(spark, sf, "supplier")
    customer = load(spark, sf, "customer")
    orders = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load(spark, sf, "lineitem")
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(
            F.broadcast(nation),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(revenue.cast("double"), 2).alias("revenue"))
    )


ORACLE_REGIONAL_REVENUE = """
SELECT n_name,
       round(sum(l_extendedprice::DECIMAL(18,4)
                 * (1 - l_discount::DECIMAL(18,4)))::DOUBLE, 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q_sql_shipping_priority(spark, sf):
    """Pure-SQL surface: TPC-H Q3 shape submitted as ANSI SQL via
    ``spark.sql`` over temp views — the engine's declarative entry
    point. Catalyst plans it identically to the DataFrame builds
    (broadcast customer dim, pushed date filters, partial aggs); the
    oracle differs only in the date-format function name."""
    for t in ("customer", "orders", "lineitem"):
        load(spark, sf, t).createOrReplaceTempView(t)
    return spark.sql(_shipping_priority_sql("date_format", "yyyy-MM-dd"))


# {fmt}: Spark spells it date_format(ts, fmt), DuckDB strftime(ts, fmt)
# with an incompatible pattern language — everything else is shared.
_SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2)
         AS revenue,
       {fmt}(o_orderdate, '{pat}') AS order_date,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate < TIMESTAMP '1996-07-01'
  AND l_shipdate > TIMESTAMP '1996-07-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def _shipping_priority_sql(fmt: str, pat: str) -> str:
    return _SHIPPING_PRIORITY_SQL.replace("{fmt}", fmt).replace("{pat}", pat)


ORACLE_SQL_SHIPPING = _shipping_priority_sql("strftime", "%Y-%m-%d")


def q_stable_ids(spark, sf):
    """Dense global rank without a global sort (operators/ids.py):
    range partitions number themselves, driver folds the offsets.
    Oracle is the single-partition ``row_number()`` formulation —
    identical output, completely different (scalable) plan."""
    from ..operators.ids import stable_ids

    docs = load(spark, sf, "documents").select("doc_id", "lang")
    return stable_ids(docs, ["doc_id"], num_partitions=8)


ORACLE_STABLE_IDS = """
SELECT doc_id, lang,
       row_number() OVER (ORDER BY doc_id) - 1 AS stable_id
FROM documents
"""


def q_constraint_check(spark, sf):
    """Deequ-style declarative validation suite over orders
    (operators/constraints.py): 6 row-level rules + a key-uniqueness
    rule, ALL evaluated in one aggregation job — row rules fold into
    conditional aggregates in a single partial-aggregated scan, the
    uniqueness rule rides the same job's Expand. One rule
    (`price_under_cap`) is planted to fail so both engines must agree
    on a non-zero violation count, not just all-green."""
    from ..operators.constraints import (
        check_constraints,
        row_rule,
        unique_rule,
    )

    orders = load(spark, sf, "orders")
    rules = [
        row_rule("custkey_not_null", F.col("o_custkey").isNotNull()),
        unique_rule("orderkey_unique", "o_orderkey"),
        row_rule(
            "status_domain", F.col("o_orderstatus").isin("O", "F", "P")
        ),
        row_rule(
            "priority_shape",
            F.col("o_orderpriority").rlike(r"^[1-5]-[A-Z ]+$"),
        ),
        row_rule("price_positive", F.col("o_totalprice") > 0),
        row_rule("price_under_cap", F.col("o_totalprice") <= 150000.0),
        row_rule(
            "date_after_1995",
            F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"),
        ),
    ]
    return check_constraints(orders, rules).orderBy("rule")


# NULL semantics pinned on both sides: a rule predicate that evaluates
# to NULL counts as a violation (CASE WHEN pred THEN 0 ELSE 1 routes
# NULL to the ELSE arm, exactly like F.when(pred, 0).otherwise(1)).
ORACLE_CONSTRAINT_CHECK = """
WITH base AS (
  SELECT count(*) AS n_rows,
    sum(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END) AS v_custkey,
    count(o_orderkey) - count(DISTINCT o_orderkey) AS v_unique,
    sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END)
      AS v_status,
    sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
        THEN 0 ELSE 1 END) AS v_prio,
    sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS v_pos,
    sum(CASE WHEN o_totalprice <= 150000.0 THEN 0 ELSE 1 END) AS v_cap,
    sum(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01'
        THEN 0 ELSE 1 END) AS v_date
  FROM orders
)
SELECT r.rule, base.n_rows,
       CAST(r.v AS BIGINT) AS n_violations,
       r.v = 0 AS passed
FROM base
CROSS JOIN LATERAL (VALUES
  ('custkey_not_null', v_custkey),
  ('orderkey_unique',  v_unique),
  ('status_domain',    v_status),
  ('priority_shape',   v_prio),
  ('price_positive',   v_pos),
  ('price_under_cap',  v_cap),
  ('date_after_1995',  v_date)
) AS r(rule, v)
ORDER BY rule
"""


def q_agg_upsert(spark, sf):
    """Incremental aggregate maintenance (operators/incremental.py):
    orders are split at 1998-01-01 into 'history' and 'new batch'; the
    history's per-priority partial-aggregate state is merged with the
    batch's partials (full-outer on key, counts/sums add, min/max
    least/greatest) WITHOUT re-scanning history rows. The oracle is a
    plain GROUP BY over the whole table — a green hash certifies
    merge(state, partial(delta)) == aggregate(full corpus) exactly
    (decimal sums make the merge order-free)."""
    from ..operators.incremental import (
        finalize_aggregates,
        merge_aggregate_state,
        partial_aggregate,
    )

    orders = load(spark, sf, "orders")
    split = F.lit("1998-01-01").cast("timestamp")
    hist = orders.where(F.col("o_orderdate") < split)
    delta = orders.where(F.col("o_orderdate") >= split)
    keys = ["o_orderpriority"]
    state = partial_aggregate(hist, keys, "o_totalprice")
    merged = merge_aggregate_state(
        state, partial_aggregate(delta, keys, "o_totalprice"), keys
    )
    return finalize_aggregates(merged, keys).orderBy("o_orderpriority")


ORACLE_AGG_UPSERT = """
SELECT o_orderpriority, count(*) AS n,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2)
         AS total_value,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             / count(*), 6) AS avg_value,
       min(o_totalprice) AS min_value,
       max(o_totalprice) AS max_value
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_apply_deletes(spark, sf):
    """Right-to-be-forgotten (sources/tables.apply_deletes): documents
    are copied to a scratch dataset range-partitioned on doc_id, then
    the lowest-decile ids (a clustered delete list, the realistic
    shape — one user's documents live near each other) are deleted.
    File-level pruning is asserted: with the delete keys clustered in
    one range partition, fewer files are rewritten than exist — at
    100 TB this is the difference between rewriting ~0.1% of files and
    rewriting the corpus. The returned survivors hash-match a plain
    NOT-IN oracle, certifying delete completeness AND that untouched
    files kept their rows."""
    from ..sources import tables as T

    tag = _safe_sf_tag(sf)
    wh = spark.conf.get("spark.sql.warehouse.dir")
    for p in ("file:", "file://"):
        if wh.startswith(p):
            wh = wh[len(p):]
            break
    path = f"{wh}/rtbf_docs_{tag}"
    docs = load(spark, sf, "documents")
    thr = docs.count() // 10
    (
        docs.repartitionByRange(8, "doc_id")
        .write.mode("overwrite")
        .parquet(path)
    )
    deletes = docs.where(F.col("doc_id") < thr).select("doc_id")
    stats = T.apply_deletes(spark, path, deletes, "doc_id")
    assert stats["rows_deleted"] > 0, stats
    assert 0 < stats["files_rewritten"] < stats["files_total"], stats
    return (
        spark.read.parquet(path)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


ORACLE_APPLY_DELETES = """
SELECT doc_id, lang, source
FROM documents
WHERE doc_id >= (SELECT count(*) // 10 FROM documents)
ORDER BY doc_id
"""


def q_kmeans_assign(spark, sf):
    """Distributed Lloyd's k-means (operators/kmeans.py): k=4, two
    iterations over the embeddings (cast float->double, exact).
    Assignment is a shuffle-free literal-centroid projection
    (aggregate/zip_with index-ordered folds + array_min argmin);
    the update is one k-row groupBy exchange per iteration; the
    driver holds k x dim floats only. The oracle replays both
    iterations UNROLLED in SQL — init = first-k-by-id, identical
    index-ordered distance folds, centroids rounded to 9 decimals at
    each boundary so unordered-mean ulp drift cannot flip an argmin."""
    from ..operators.kmeans import lloyd_kmeans

    emb = widen(spark, load(spark, sf, "embeddings")).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    return lloyd_kmeans(
        emb, "vec_id", "v", k=4, n_iter=2, dim=64
    ).orderBy("vec_id")


def _kmeans_sqdist_sql(v: str, c: str, dim: int) -> str:
    return (
        "list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(1, {dim + 1}), "
        f"i -> ({v}[i] - {c}[i]) * ({v}[i] - {c}[i]))), "
        "(acc, x) -> acc + x)"
    )


def _kmeans_cte_sql(k: int, iters: int, dim: int) -> str:
    """CTE chain ``e, c0, a1, c1, ..., c{iters}`` (no WITH keyword):
    the deterministic Lloyd replay shared by oracle_kmeans_assign,
    oracle_ann_ivf and oracle_ann_ivf_pq — first-k-by-id init,
    9dp-rounded centroid means per iteration."""
    sq = _kmeans_sqdist_sql("e.v", "c.cent", dim)
    parts = [
        f"""e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cent
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k})
)"""
    ]
    for it in range(1, iters + 1):
        parts.append(
            f""",
a{it} AS (
  SELECT vec_id, cluster, dist FROM (
    SELECT vec_id, cluster, dist,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM (SELECT e.vec_id, c.cluster, {sq} AS dist
          FROM e CROSS JOIN c{it - 1} c))
  WHERE rn = 1
),
c{it} AS (
  SELECT cluster, list(m ORDER BY dim) AS cent FROM (
    SELECT a.cluster, r.i AS dim, round(avg(e.v[r.i]), 9) AS m
    FROM a{it} a JOIN e USING (vec_id) CROSS JOIN range(1, {dim + 1}) r(i)
    GROUP BY a.cluster, r.i) GROUP BY cluster
)"""
        )
    return "".join(parts)


def oracle_kmeans_assign(k: int = 4, iters: int = 2, dim: int = 64) -> str:
    sq = _kmeans_sqdist_sql("e.v", "c.cent", dim)
    return f"""
WITH {_kmeans_cte_sql(k, iters, dim)}
SELECT vec_id, cluster, round(dist, 6) AS sqdist FROM (
  SELECT vec_id, cluster, dist,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist, cluster) AS rn
  FROM (SELECT e.vec_id, c.cluster, {sq} AS dist
        FROM e CROSS JOIN c{iters} c))
WHERE rn = 1
ORDER BY vec_id"""


def q_semdedup(spark, sf):
    """SemDeDup-style semantic dedup (operators/dedup.py
    semantic_dedup, Abbas et al. 2023): k-means partitions the
    embedding space (k=8 here; ~N/1000 at scale) so the quadratic
    cosine compare runs inside each bounded cluster, never
    corpus-wide; a row is dropped when a smaller-id cluster-mate has
    cosine >= 0.95. The synthetic embeddings have no natural pair
    above cos 0.51, so every 10th vector is planted again under
    vec_id+100000 (cos exactly 1.0 with its original) — the drops the
    query must find. The oracle replays the ENTIRE path — the planted
    union, both Lloyd iterations unrolled (index-ordered folds,
    9-decimal centroid rounding), and the per-cluster cosine prune
    with the same left-fold dot products — so a green hash certifies
    assignments and drops."""
    from ..operators.dedup import semantic_dedup

    emb = widen(spark, load(spark, sf, "embeddings")).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    planted = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + F.lit(100000)).alias("vec_id"), "v"
    )
    return semantic_dedup(
        emb.unionByName(planted), "vec_id", "v", k=8, tau=0.95,
        n_iter=2, dim=64,
    ).orderBy("vec_id")


def oracle_semdedup(
    k: int = 8, tau: float = 0.95, iters: int = 2, dim: int = 64
) -> str:
    sq = _kmeans_sqdist_sql("e.v", "c.cent", dim)

    def dot(a: str, b: str) -> str:
        return (
            "list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(range(1, {dim + 1}), "
            f"i -> {a}[i] * {b}[i])), (acc, x) -> acc + x)"
        )

    parts = [
        f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, list_transform(embedding, x -> x::DOUBLE)
  FROM embeddings WHERE vec_id % 10 = 0
),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cent
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k})
)"""
    ]
    for it in range(1, iters + 1):
        parts.append(
            f""",
a{it} AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM (SELECT e.vec_id, c.cluster, {sq} AS dist
          FROM e CROSS JOIN c{it - 1} c))
  WHERE rn = 1
),
c{it} AS (
  SELECT cluster, list(m ORDER BY dim) AS cent FROM (
    SELECT a.cluster, r.i AS dim, round(avg(e.v[r.i]), 9) AS m
    FROM a{it} a JOIN e USING (vec_id) CROSS JOIN range(1, {dim + 1}) r(i)
    GROUP BY a.cluster, r.i) GROUP BY cluster
)"""
        )
    parts.append(
        f""",
asn AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM (SELECT e.vec_id, c.cluster, {sq} AS dist
          FROM e CROSS JOIN c{iters} c))
  WHERE rn = 1
),
s AS (
  SELECT e.vec_id, e.v, sqrt({dot("e.v", "e.v")}) AS n, asn.cluster
  FROM e JOIN asn USING (vec_id)
),
dropped AS (
  SELECT DISTINCT b.vec_id AS d
  FROM s a JOIN s b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE {dot("a.v", "b.v")} / (a.n * b.n) >= {tau}
)
SELECT s.vec_id, s.cluster, dropped.d IS NULL AS keep
FROM s LEFT JOIN dropped ON s.vec_id = dropped.d
ORDER BY s.vec_id"""
    )
    return "".join(parts)


def q_dsir_select(spark, sf):
    """DSIR importance resampling (operators/sampling.py
    dsir_importance_weights, Xie et al. 2023): score every document by
    Σ log(p_target/p_source) over 1024 hashed-bigram buckets with
    add-one smoothing — target = the English documents, source = the
    whole corpus — and keep the 50 most target-like. The per-bucket
    log-ratio is quantized to a 1e-6 integer once, so document weights
    are exact integer sums (no float-summation drift) and the oracle
    replays bucket counts, ratios, and weights bit-for-bit. Both
    bucket tables are one integer-count shuffle; the 1024-row ratio
    table broadcasts to the bigram instances."""
    from ..operators.sampling import (
        DSIR_LOG_QUANT,
        dsir_importance_weights,
    )

    docs = widen(spark, load(spark, sf, "documents"))
    target = docs.where(F.col("lang") == "en")
    # r11: target is source.where(lang='en'), so pass the predicate and
    # let the operator derive target counts from its one materialized
    # bigram stream instead of tokenizing the subset again (§1.2).
    w = dsir_importance_weights(
        docs,
        target,
        "doc_id",
        "text",
        1024,
        target_predicate=F.col("lang") == "en",
    )
    return (
        w.join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "dsir_weight",
            F.round(
                F.col("dsir_weight") / F.lit(float(DSIR_LOG_QUANT)), 6
            ).alias("log_ratio"),
        )
        .orderBy(F.col("dsir_weight").desc(), "doc_id")
        .limit(50)
    )


def oracle_dsir_select(n_buckets: int = 1024) -> str:
    from ..operators.sampling import DSIR_BUCKET_SEED, DSIR_LOG_QUANT

    tok = H.tokens_sql("text")
    bg = H.word_shingles_sql("toks", 2)
    h = H.hash64_sql("bg", DSIR_BUCKET_SEED)
    return f"""
WITH src AS (
  SELECT doc_id, {h} % {n_buckets} AS bucket FROM (
    SELECT doc_id, unnest({bg}) AS bg FROM (
      SELECT doc_id, {tok} AS toks FROM documents))
),
tgt AS (
  SELECT {h} % {n_buckets} AS bucket FROM (
    SELECT unnest({bg}) AS bg FROM (
      SELECT {tok} AS toks FROM documents WHERE lang = 'en'))
),
sc AS (SELECT bucket, count(*) AS sc FROM src GROUP BY bucket),
tc AS (SELECT bucket, count(*) AS tc FROM tgt GROUP BY bucket),
tot AS (SELECT (SELECT sum(sc) FROM sc) AS st,
               (SELECT sum(tc) FROM tc) AS tt),
ratios AS (
  SELECT coalesce(sc.bucket, tc.bucket) AS bucket,
         cast(round(ln(
           ((coalesce(tc, 0) + 1)::DOUBLE / (tt + {n_buckets})::DOUBLE)
           / ((coalesce(sc, 0) + 1)::DOUBLE / (st + {n_buckets})::DOUBLE)
         ) * {DSIR_LOG_QUANT}) AS BIGINT) AS lr
  FROM sc FULL JOIN tc USING (bucket) CROSS JOIN tot
),
w AS (
  SELECT src.doc_id, CAST(sum(lr) AS BIGINT) AS dsir_weight
  FROM src JOIN ratios USING (bucket) GROUP BY src.doc_id
)
SELECT w.doc_id, d.lang, w.dsir_weight,
       round(w.dsir_weight / {float(DSIR_LOG_QUANT)}, 6) AS log_ratio
FROM w JOIN documents d ON w.doc_id = d.doc_id
ORDER BY w.dsir_weight DESC, w.doc_id
LIMIT 50
"""


def q_hard_negatives(spark, sf):
    """Hard-example mining for contrastive training
    (operators/similarity.mine_triplets): for 25 anchor embeddings,
    the most-similar DIFFERENT-label row (hard negative) and the
    least-similar SAME-label row (hard positive), with margin =
    neg_cosine - pos_cosine (positive margin = the triplet violates
    separation and belongs in the next training batch). One scored
    pass feeds both window ranks; anchors are a bounded mini-batch
    sample — at corpus scale candidates come from ivf_topk/lsh_topk
    per label partition with identical ranking semantics."""
    from ..operators.similarity import mine_triplets

    emb = load(spark, sf, "embeddings")
    anchors = emb.where(F.col("vec_id") < 25)
    out = mine_triplets(anchors, emb)
    return out.select(
        "vec_id",
        "hard_negative_id",
        F.round("neg_cosine", 6).alias("neg_cosine"),
        "hard_positive_id",
        F.round("pos_cosine", 6).alias("pos_cosine"),
        F.round("margin", 6).alias("margin"),
    ).orderBy("vec_id")


def oracle_hard_negatives() -> str:
    cos = (
        f"{V.dot_sql('a.embedding', 'c.embedding')} / "
        f"({V.norm_sql('a.embedding')} * {V.norm_sql('c.embedding')})"
    )
    return f"""
WITH scored AS (
  SELECT a.vec_id AS aid, a.label AS alabel,
         c.vec_id AS cid, c.label AS clabel, {cos} AS cos
  FROM embeddings a JOIN embeddings c ON a.vec_id <> c.vec_id
  WHERE a.vec_id < 25
),
neg AS (
  SELECT aid, cid AS hard_negative_id, cos AS neg_cosine FROM (
    SELECT *, row_number() OVER (PARTITION BY aid
                                 ORDER BY cos DESC, cid ASC) AS rn
    FROM scored WHERE clabel <> alabel) WHERE rn = 1
),
pos AS (
  SELECT aid, cid AS hard_positive_id, cos AS pos_cosine FROM (
    SELECT *, row_number() OVER (PARTITION BY aid
                                 ORDER BY cos ASC, cid ASC) AS rn
    FROM scored WHERE clabel = alabel) WHERE rn = 1
)
SELECT neg.aid AS vec_id, neg.hard_negative_id,
       round(neg.neg_cosine, 6) AS neg_cosine,
       pos.hard_positive_id,
       round(pos.pos_cosine, 6) AS pos_cosine,
       round(neg.neg_cosine - pos.pos_cosine, 6) AS margin
FROM neg JOIN pos USING (aid)
ORDER BY vec_id
"""


def q_k_anonymity(spark, sf):
    """k-anonymity audit (operators/profiling.k_anonymity_audit):
    equivalence classes over the quasi-identifier tuple (nation,
    market segment, account-balance band) with classes smaller than
    k=5 flagged at_risk — the pre-release privacy gate for corpora
    assembled from user data. One map-side-combined groupBy shuffle;
    at 100 TB the class table is bounded by the quasi-identifier
    domain, not the row count."""
    from ..operators.profiling import k_anonymity_audit

    cust = load(spark, sf, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias(
            "balance_band"
        ),
    )
    return k_anonymity_audit(
        cust, ["c_nationkey", "c_mktsegment", "balance_band"], k=5
    ).orderBy("c_nationkey", "c_mktsegment", "balance_band")


ORACLE_K_ANONYMITY = """
SELECT c_nationkey, c_mktsegment,
       cast(floor(c_acctbal / 1000) AS BIGINT) AS balance_band,
       count(*) AS class_size,
       count(*) < 5 AS at_risk
FROM customer
GROUP BY 1, 2, 3
ORDER BY c_nationkey, c_mktsegment, balance_band
"""


def q_theil_sen(spark, sf):
    """Theil-Sen robust trend slope (operators/temporal.
    theil_sen_daily) per event-type daily series — the magnitude
    companion to mann_kendall (direction/significance): lower median
    of all pairwise day slopes, each quantized once as an exact
    integer division (signed dy is safe: Spark DIV and DuckDB //
    both truncate toward zero). Pair kernel bounded by calendar
    days² per series."""
    from ..operators.temporal import theil_sen_daily

    return theil_sen_daily(load(spark, sf, "events"))


def oracle_theil_sen() -> str:
    from ..operators.temporal import theil_sen_daily_sql

    return theil_sen_daily_sql("events")


def q_mann_kendall(spark, sf):
    """Mann-Kendall monotonic-trend test (operators/temporal.
    mann_kendall_daily) per event-type daily series — the
    nonparametric "is it actually trending" ranking next to
    cusum_detect's level shifts. S and 18·Var(S) exact int64 (tie
    correction from one per-value groupBy); the i<j pair kernel is
    bounded by calendar days² per series, never corpus rows."""
    from ..operators.temporal import mann_kendall_daily

    return mann_kendall_daily(load(spark, sf, "events"))


def oracle_mann_kendall() -> str:
    from ..operators.temporal import mann_kendall_daily_sql

    return mann_kendall_daily_sql("events")


def q_sax_symbols(spark, sf):
    """SAX symbolization (operators/temporal.sax_daily) of each
    event-type's zero-filled daily count series: z-normalize via
    exact integer sufficient statistics, map days onto the
    alphabet-4 standard-normal quartile symbols, emit the per-series
    symbol string — the representation behind time-series motif
    mining and symbol-cost whole-series similarity."""
    from ..operators.temporal import sax_daily

    return sax_daily(load(spark, sf, "events"))


def oracle_sax_symbols() -> str:
    from ..operators.temporal import sax_daily_sql

    return sax_daily_sql("events")


def q_chi2_abtest(spark, sf):
    """Chi-square independence guardrail (operators/profiling.
    chi2_independence): hash-parity A/B arms vs event-type mix —
    "did both arms see the same behavior distribution?". The
    categorical member of the drift trio (ks_drift numeric,
    psi_drift binned). Zero cells materialized from the margin
    frame; exact-integer numerators in doubles, one division per
    cell."""
    from ..operators.profiling import chi2_independence

    ev = load(spark, sf, "events").select(
        F.when(
            H.hash64(F.col("user_id").cast("string")) % 2 == 0,
            F.lit("arm_a"),
        )
        .otherwise(F.lit("arm_b"))
        .alias("arm"),
        "event_type",
    )
    return chi2_independence(ev, "arm", "event_type")


def oracle_chi2_abtest() -> str:
    from ..operators.profiling import chi2_independence_sql

    arm = (
        "CASE WHEN "
        + H.hash64_sql("user_id::VARCHAR")
        + " % 2 = 0 THEN 'arm_a' ELSE 'arm_b' END"
    )
    return chi2_independence_sql(
        f"(SELECT {arm} AS arm, event_type FROM events)",
        "arm",
        "event_type",
    )


def q_psi_drift(spark, sf):
    """Population Stability Index (operators/evaluation.psi_drift):
    price distribution drift of late-period shipments against the
    <=1997 reference period, on the reference's exact decile order
    statistics — the scored companion to ks_drift with the industry
    0.1/0.25 action thresholds. Cent-grid values, add-one smoothing,
    one quantized double expression per bucket."""
    from ..operators.evaluation import psi_drift

    li = load(spark, sf, "lineitem").select(
        F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("price_c"),
        (F.year("l_shipdate") <= F.lit(1997)).alias("is_ref"),
    )
    return psi_drift(li, "price_c", "is_ref")


def oracle_psi_drift() -> str:
    from ..operators.evaluation import psi_drift_sql

    return psi_drift_sql(
        "lineitem",
        "floor(l_extendedprice * 100.0 + 0.5)",
        "year(l_shipdate) <= 1997",
    )


def q_rake_keywords(spark, sf):
    """RAKE keyphrases over the documents corpus (operators/
    text_analysis.rake_keywords): stopword-free token runs scored by
    summed word degree/frequency — the one-pass keyphrase ranker
    next to keyword_textrank's iterative graph. Gaps-and-islands
    phrase detection, integer-division scores, TakeOrdered top-30."""
    from ..operators.text_analysis import rake_keywords

    return rake_keywords(load(spark, sf, "documents"), top_k=30)


def oracle_rake_keywords() -> str:
    from ..operators.text_analysis import rake_keywords_sql

    return rake_keywords_sql("documents", top_k=30)


def q_source_js_drift(spark, sf):
    """Per-source Jensen-Shannon divergence from the corpus token
    distribution (operators/profiling.group_js_divergence): the
    drift ranking that flags which crawl/source needs curation
    attention. Absent-token closed form keeps all work on each
    source's own token set — never vocab × sources."""
    from ..operators.profiling import group_js_divergence

    docs = load(spark, sf, "documents")
    toks = docs.select(
        "source", F.explode(H.tokens("text")).alias("token")
    )
    return group_js_divergence(toks, group_col="source", token_col="token")


def oracle_source_js_drift() -> str:
    from ..operators.profiling import group_js_divergence_sql

    tok = H.tokens_sql("text")
    cte = (
        f"SELECT source AS g, unnest({tok}) AS t FROM documents"
    )
    return group_js_divergence_sql(cte, group_col="source")


def q_ks_drift(spark, sf):
    """Two-sample Kolmogorov-Smirnov drift test (operators/
    evaluation.ks_two_sample): does the purchase value distribution
    differ from the click value distribution? Values land on a
    cent-precision integer grid; the statistic is computed without
    a global row sort (per-value counts + the classifier_auc
    two-phase prefix sum), numerator exact int64."""
    from ..operators.evaluation import ks_two_sample

    ev = load(spark, sf, "events").select(
        "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("value_c"),
    )
    return ks_two_sample(
        ev, "value_c", "event_type", "purchase", "click"
    )


def oracle_ks_drift() -> str:
    from ..operators.evaluation import ks_two_sample_sql

    return ks_two_sample_sql(
        "events",
        "floor(value * 100.0 + 0.5)",
        "event_type",
        "purchase",
        "click",
    )


def q_l_diversity(spark, sf):
    """l-diversity audit (operators/profiling.l_diversity_audit):
    the gate k-anonymity misses — a (nation, segment) class whose
    members all share one balance band leaks the sensitive value at
    ANY class size. Reports distinct-l and entropy l-diversity per
    class; one (quasi, sensitive) pre-collapse is the only
    corpus-scale pass, everything after is bounded by the attribute
    domains."""
    from ..operators.profiling import l_diversity_audit

    cust = load(spark, sf, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias(
            "balance_band"
        ),
    )
    return l_diversity_audit(
        cust,
        ["c_nationkey", "c_mktsegment"],
        "balance_band",
        l=3,
    ).orderBy("c_nationkey", "c_mktsegment")


def oracle_l_diversity() -> str:
    from ..operators.profiling import l_diversity_audit_sql

    inner = l_diversity_audit_sql(
        "(SELECT c_nationkey, c_mktsegment, "
        "cast(floor(c_acctbal / 1000) AS BIGINT) AS balance_band "
        "FROM customer)",
        ["c_nationkey", "c_mktsegment"],
        "balance_band",
        l=3,
    )
    return inner + " ORDER BY c_nationkey, c_mktsegment"


def q_classifier_auc(spark, sf):
    """Exact ROC-AUC (operators/evaluation.binary_auc) of the hashed
    linear quality scorer against the lang=='en' label: the
    Mann-Whitney statistic computed WITHOUT a global row sort — one
    per-score-count shuffle, then a cumulative window over the
    distinct-score table (bounded by the score domain, not the
    corpus; score_raw is an exact integer here so the numerator never
    drifts). The oracle computes the SAME statistic with the O(P·N)
    pairwise definition — two independent algorithms, one exact
    answer."""
    from ..operators.evaluation import binary_auc

    docs = load(spark, sf, "documents")
    weights = TA.demo_weights(spark, 1024)
    scored = TA.hashed_linear_score(docs, weights, n_buckets=1024)
    labeled = scored.join(
        docs.select("doc_id", (F.col("lang") == "en").alias("y")),
        "doc_id",
    )
    return binary_auc(labeled, "score_raw", "y").select(
        F.round("auc", 9).alias("auc"), "n_pos", "n_neg"
    )


def oracle_classifier_auc() -> str:
    scored = TA.hashed_linear_score_sql("documents")
    return f"""
WITH s AS ({scored}),
lab AS (
  SELECT s.score_raw AS score, (d.lang = 'en') AS y
  FROM s JOIN documents d USING (doc_id)
),
pairs AS (
  SELECT sum(CASE WHEN p.score > n.score THEN 2
                  WHEN p.score = n.score THEN 1
                  ELSE 0 END) AS num2
  FROM (SELECT score FROM lab WHERE y) p
  CROSS JOIN (SELECT score FROM lab WHERE NOT y) n
),
tot AS (
  SELECT CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
  FROM lab
)
SELECT round(num2::DOUBLE / (2.0 * n_pos * n_neg), 9) AS auc,
       n_pos, n_neg
FROM pairs CROSS JOIN tot
"""


def q_bpe_merges(spark, sf):
    """BPE tokenizer training (operators/bpe.py): the first 3 merge
    rules learned from the corpus word-frequency table. The corpus is
    touched ONCE (word counts); every iteration after that is
    vocab-bounded — pair counting is a map-side-combined groupBy over
    vocab rows, the argmax is a 1-row collect (k-means-style bounded
    driver state), and the merge applies as a shuffle-free fold
    projection. The oracle replays all three iterations UNROLLED —
    pair counts, deterministic argmax (cnt desc, symbols asc), and
    the same left-to-right fold — so a green hash certifies the whole
    training loop."""
    from ..operators.bpe import learn_bpe_merges, word_frequencies

    docs = widen(spark, load(spark, sf, "documents"))
    merges, _ = learn_bpe_merges(word_frequencies(docs, "text"), 3)
    return merges.orderBy("step")


def _bpe_train_ctes(n_merges: int = 3) -> str:
    """CTE chain (without the WITH keyword) learning ``n_merges`` BPE
    rules from the documents word-frequency table: wf, w0, then
    p{it}/m{it} per iteration (and w{it} states between them). Shared
    by the training oracle and the encode oracle."""
    tok = H.tokens_sql("text")
    sep = "chr(31)"
    parts = [
        f"""wf AS (
  SELECT word, count(*) AS freq FROM (
    SELECT unnest({tok}) AS word FROM documents) GROUP BY word
),
w0 AS (
  SELECT word, freq,
         list_transform(range(1, len(word) + 1),
                        i -> word[i]::VARCHAR) AS syms
  FROM wf
)"""
    ]
    for it in range(1, n_merges + 1):
        parts.append(
            f""",
p{it} AS (
  SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT syms, freq, unnest(range(1, len(syms))) AS i
        FROM w{it - 1})
  GROUP BY 1, 2
),
m{it} AS (SELECT l, r, cnt FROM p{it} ORDER BY cnt DESC, l, r LIMIT 1)"""
        )
        if it < n_merges:
            parts.append(
                f""",
w{it} AS (
  SELECT word, freq,
    string_split(list_reduce(syms, (acc, x) -> CASE
      WHEN (acc = m.l OR ends_with(acc, {sep} || m.l)) AND x = m.r
      THEN left(acc, len(acc) - len(m.l)) || m.l || m.r
      ELSE acc || {sep} || x END), {sep}) AS syms
  FROM w{it - 1} CROSS JOIN m{it} m
)"""
            )
    return "".join(parts)


def oracle_bpe_merges(n_merges: int = 3) -> str:
    parts = ["\nWITH ", _bpe_train_ctes(n_merges)]
    selects = [
        f"""SELECT {it} AS step, l AS "left", r AS "right",
       l || r AS merged, cnt AS pair_count FROM m{it}"""
        for it in range(1, n_merges + 1)
    ]
    parts.append("\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY step")
    return "".join(parts)


def q_lm_perplexity(spark, sf):
    """CCNet-style LM quality filter (operators/lm.py): an add-one
    bigram model trained on the English documents scores every
    document's average log-probability — the fluency signal CCNet
    gets from KenLM, kept fully inside the engine. Training is two
    integer-count shuffles with min_count pruning; scoring joins
    document bigrams to the broadcast model; per-bigram logs are
    1e-6-quantized integers so document totals are exact sums. The
    oracle replays counts, smoothing, quantized logs, and totals."""
    from ..operators.lm import score_perplexity, train_bigram_lm

    docs = load(spark, sf, "documents")
    bigrams, uni, vocab = train_bigram_lm(
        docs.where(F.col("lang") == "en"), "text", min_count=2
    )
    return score_perplexity(docs, bigrams, uni, vocab).orderBy(
        "doc_id"
    )


def oracle_lm_perplexity(min_count: int = 2) -> str:
    from ..operators.lm import LM_LOG_QUANT

    tok = H.tokens_sql("text")
    return f"""
WITH rtoks AS (
  SELECT {tok} AS toks FROM documents WHERE lang = 'en'
),
rbg AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM rtoks)
),
big AS (
  SELECT w1, w2, count(*) AS c2 FROM rbg
  GROUP BY 1, 2 HAVING count(*) >= {min_count}
),
uni AS (
  SELECT w, count(*) AS c1 FROM (
    SELECT unnest(toks) AS w FROM rtoks) GROUP BY w
),
voc AS (SELECT count(*) AS v FROM uni),
dtoks AS (SELECT doc_id, {tok} AS toks FROM documents),
dbg AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        FROM dtoks)
),
scored AS (
  SELECT dbg.doc_id,
         cast(round(ln(
           (coalesce(big.c2, 0) + 1)::DOUBLE
           / (coalesce(uni.c1, 0) + voc.v)::DOUBLE
         ) * {LM_LOG_QUANT}) AS BIGINT) AS lq
  FROM dbg
  LEFT JOIN big USING (w1, w2)
  LEFT JOIN uni ON dbg.w1 = uni.w
  CROSS JOIN voc
),
pd AS (
  SELECT doc_id, count(*) AS n_bigrams, CAST(sum(lq) AS BIGINT) AS logprob_q
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(pd.n_bigrams, 0)::BIGINT AS n_bigrams,
       pd.logprob_q,
       {half_away_div_sql("pd.logprob_q", "pd.n_bigrams")}
         / {float(LM_LOG_QUANT)} AS avg_logp
FROM documents d LEFT JOIN pd USING (doc_id)
ORDER BY d.doc_id
"""


