"""Temporal join operators (engine extensions).

Spark has no native AS-OF or range join; these are the standard
compositions (pyspark guide "Common OLAP patterns"):

* ``asof_join`` — union-tag-sort-window: tag both sides, union on the
  key, sort by (key, time, side-priority) within partitions, carry the
  last-seen right row forward with ``last(ignorenulls)``. ONE shuffle
  on the key + one intra-partition sort — no per-row probing, no
  pairwise blowup; this survives arbitrarily many rows per key.

* ``range_join`` — bucketize the time axis on both sides (bucket width
  = range width), equi-join on (key, bucket) for the bucket and its
  predecessor, then apply the exact range predicate. Turns an
  inequality join Catalyst would nest-loop into a hash join with a
  bounded candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exact import half_away_div, sql_str_lit


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_s: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts on the same key (pd.merge_asof semantics,
    'backward'). Right columns come back null when nothing precedes.

    Ties on timestamp: the right row sorts first (so an equal-time
    right row IS visible to the left row), and among equal-time right
    rows the last one in (ts, original order) wins — deterministic
    given unique (key, right_ts).
    """
    lcols = left.columns
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias("_rt"),
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            l.schema["_l"].dataType
        ).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(right_ts).alias("_rt"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "_k",
        "_t",
        "_side",
        "_l",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in right_cols
        ],
        F.last("_rt", ignorenulls=True).over(w).alias("_c_ts"),
    ).where(F.col("_side") == 1)
    if tolerance_s is not None:
        in_tol = (
            F.col("_t").cast("double") - F.col("_c_ts").cast("double")
        ) <= F.lit(float(tolerance_s))
        carried = carried.select(
            "_k",
            "_t",
            "_l",
            *[
                F.when(in_tol, F.col(f"_c_{c}"))
                .otherwise(F.lit(None))
                .alias(f"_c_{c}")
                for c in right_cols
            ],
        )
    return carried.select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        *[F.col(f"_c_{c}").alias(f"right_{c}") for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    range_seconds: int,
) -> DataFrame:
    """Pairs (left, right) on the same key with
    left_ts <= right_ts < left_ts + range_seconds.

    Bucketized: bucket width == range width, right joins to its own
    bucket and the previous one, exact predicate applied after — a
    pure equi-join plan (hash join + filter), no BroadcastNestedLoop.
    Output: all left columns + all right columns (right names prefixed
    ``r_`` on collision).
    """
    # microsecond-exact: cast(timestamp as long) truncates to whole
    # seconds, which silently reorders sub-second neighbors at the
    # range boundary. `div` is exact integer division (no float round).
    width_us = int(range_seconds) * 1_000_000
    lb = left.withColumn("_lt", F.unix_micros(F.col(left_ts))).withColumn(
        "_bucket", F.expr(f"_lt div {width_us}")
    )
    rb = right.withColumn(
        "_rt", F.unix_micros(F.col(right_ts))
    ).withColumn(
        "_bucket",
        F.explode(
            F.array(
                F.expr(f"_rt div {width_us}"),
                F.expr(f"_rt div {width_us}") - 1,
            )
        ),
    )
    rename = {
        c: (f"r_{c}" if c in left.columns else c) for c in right.columns
    }
    rb = rb.select(
        "_bucket",
        "_rt",
        F.col(key).alias("_rk"),
        *[F.col(c).alias(rename[c]) for c in right.columns],
    )
    joined = lb.join(
        rb,
        (lb[key] == rb["_rk"]) & (lb["_bucket"] == rb["_bucket"]),
        "inner",
    )
    exact = joined.where(
        (F.col("_rt") >= F.col("_lt"))
        & (F.col("_rt") < F.col("_lt") + F.lit(width_us))
    )
    return exact.select(
        *[F.col(c) for c in left.columns],
        *[F.col(rename[c]) for c in right.columns],
    )


def scd2_history(
    df: DataFrame,
    key: str,
    ts: str,
    attrs: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change
    log: one row per (key, consecutive run of identical ``attrs``),
    with validity interval and version number.

    Output = key + attrs + (valid_from, valid_to, version,
    is_current); valid_to is NULL on the current row. The batch
    analogue of the reference's DynamoDB upsert stream (SURVEY §2.1
    S10) when you need the full audit trail, and the standard shape
    for training-data snapshots ("which labels were live on date X").

    Plan: both window passes share one partitioning (key) and one sort
    (ts, tiebreak) — Catalyst plans a single Exchange + Sort; change
    detection is a lag() compare, interval closure a lead(). No
    joins, no second shuffle.

    Null handling: a NULL attribute value is treated as a change
    whenever the previous row's value was also NULL (lag() cannot
    distinguish "no previous row" from "previous value NULL"), so
    tracked attributes should be non-null; pre-coalesce them to a
    sentinel if the source can produce NULLs mid-stream.
    """
    order = [F.col(ts).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    changed = F.lit(False)
    for a in attrs:
        prev = F.lag(a).over(w)
        changed = changed | prev.isNull() | (prev != F.col(a)) | (
            prev.isNotNull() & F.col(a).isNull()
        )
    # first row per key: lag(ts) is NULL -> changed via prev.isNull()
    # only if the attr is non-null; force it explicitly instead
    first_row = F.lag(ts).over(w).isNull()
    log = df.withColumn("_chg", first_row | changed).where("_chg")
    w2 = Window.partitionBy(key).orderBy(*order)
    return log.select(
        key,
        *attrs,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.lead(ts).over(w2).isNull().alias("is_current"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Time-weighted average per key: each observation's value holds
    until the next observation, so
    TWA = Σ v_i·(t_{i+1} - t_i) / (t_last - t_first) — the correct
    mean for irregularly-sampled series (sensor gauges, account
    balances, event `value` streams), where the row-mean over-weights
    bursts. The final observation carries no duration (standard
    right-open convention).

    Plan: ONE shuffle on the key; the lead() window partitions by key
    (parallel across keys, no global sort). Determinism: durations
    are integer epoch seconds and each v·Δt product is quantized to a
    1e-6 integer before the sum, so per-key totals are exact integer
    sums (the DSIR/LM contract) — the oracle replays them
    bit-for-bit. Keys with < 2 observations yield NULL (no time
    span).

    Output: (key_col, n_obs, span_seconds, twa).
    """
    ts = F.unix_timestamp(F.col(ts_col))
    stepped = df.select(
        key_col,
        ts.alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
    ).withColumn("_t_next", F.lead("_t").over(
        # (_t, _v) ordering: ties on the timestamp are broken by the
        # value, and full (t, v) duplicates are interchangeable — the
        # contribution multiset (and the oracle) cannot diverge
        Window.partitionBy(key_col).orderBy("_t", "_v")
    ))
    contrib = stepped.withColumn(
        "_wq",
        F.round(
            F.col("_v")
            * (F.col("_t_next") - F.col("_t")).cast("double")
            * F.lit(1_000_000)
        ).cast("long"),
    )
    return (
        contrib.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            (F.max("_t") - F.min("_t")).alias("span_seconds"),
            F.sum("_wq").alias("_wq_total"),
        )
        .select(
            key_col,
            "n_obs",
            "span_seconds",
            # integer half-away rounding (functions/exact.py)
            F.when(
                F.col("span_seconds") > 0,
                half_away_div("_wq_total", "span_seconds")
                / F.lit(1_000_000.0),
            ).alias("twa"),
        )
    )


# --- exponentially weighted moving average (round 6) -----------------


def ewma(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha_pct: int = 30,
) -> DataFrame:
    """Per-key EWMA (s_1 = v_1; s_t = α·v_t + (1-α)·s_{t-1}) over the
    deterministic (order_col, value) sequence — the recency-weighted
    smoothing signal (rate monitoring, drifting quality baselines).

    The recursion is inherently ordered, so it runs as an
    INDEX-ORDERED left fold over each key's collected (order, value)
    array — bit-identical in Spark's ``aggregate`` and DuckDB's
    ``list_reduce`` (the proven cross-engine fold pattern; float sums
    never cross rows unordered). Per-key history must be bounded
    (entity-level sequences, the same contract as sessionize /
    scd2_history) — this is NOT for a single global series.

    α = alpha_pct/100 built via explicit double casts (bare decimal
    literals parse as DECIMAL in both engines). The fold result
    quantizes through floor(x*1e6 + 0.5) — arithmetic half-up on
    the bit-identical fold double — NOT round(x, 6), whose
    BigDecimal-vs-libm tie behavior diverges one ulp from the grid
    (the functions/exact.py failure shape, here on a raw double).
    Output: (key_col, n_obs, ewma_q, ewma = ewma_q/1e6)."""
    a = f"(cast({alpha_pct} as double) / cast(100 as double))"
    fold = (
        f"aggregate(slice(_vs, 2, greatest(size(_vs) - 1, 0)), "
        f"element_at(_vs, 1), "
        f"(acc, x) -> {a} * x + (cast(1 as double) - {a}) * acc)"
    )
    return (
        df.select(
            F.col(key_col),
            F.struct(
                F.col(order_col).alias("o"),
                F.col(value_col).cast("double").alias("v"),
            ).alias("_sv"),
        )
        .groupBy(key_col)
        .agg(
            F.expr("transform(array_sort(collect_list(_sv)), s -> s.v)")
            .alias("_vs")
        )
        .select(
            key_col,
            F.size("_vs").cast("long").alias("n_obs"),
            F.expr(
                f"cast(floor({fold} * 1000000.0 + 0.5) as bigint)"
            ).alias("ewma_q"),
        )
        .withColumn("ewma", F.col("ewma_q") / F.lit(1000000.0))
    )


def ewma_sql(
    table: str,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha_pct: int = 30,
) -> str:
    a = f"(cast({alpha_pct} as double) / cast(100 as double))"
    return f"""
WITH seq AS (
  SELECT {key_col},
         list({value_col}::DOUBLE ORDER BY {order_col}, {value_col}) AS vs
  FROM {table} GROUP BY {key_col}
),
folded AS (
  SELECT {key_col}, len(vs)::BIGINT AS n_obs,
         CAST(floor(list_reduce(vs,
              (acc, x) -> {a} * x + (cast(1 as double) - {a}) * acc)
              * 1000000.0 + 0.5) AS BIGINT) AS ewma_q
  FROM seq
)
SELECT {key_col}, n_obs, ewma_q, ewma_q / 1000000.0 AS ewma
FROM folded
"""


def gap_fill_daily(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Calendar gap-fill with linear interpolation — the timeseries
    regularization step (downsample-to-daily + fill missing days)
    that precedes any windowed model over event streams.

    Per key: daily totals (exact DECIMAL(18,2) sums — the engine's
    certified order-free money-sum pattern — held as integer cents),
    then a generated day spine from the key's first to last active
    day, observed rows joined on, and every gap filled by linear
    interpolation between the bracketing observations:

        v(d) = v_prev + half_away((v_next - v_prev)·(d - d_prev)
                                   / (d_next - d_prev))

    in exact integer cents (one half-away integer division — both
    engines agree bit-for-bit; see functions/exact.py). Spine
    endpoints are always observed so prev/next never fall off.

    Shape: one (key, day) groupBy; the spine explode is |keys| ×
    span-days rows; two frame-bounded windows per key (last/first
    IGNORE NULLS) — everything partitions by key, nothing global.

    Output: (key, day 'yyyy-MM-dd' string, n_events, v_cents,
    filled) — v_cents observed or interpolated integer cents."""
    daily = df.groupBy(
        F.col(key_col).alias("k"), F.to_date(ts_col).alias("d")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (
            F.sum(F.col(value_col).cast("decimal(18,2)")) * 100
        ).cast("long").alias("v_obs"),
    )
    spine = (
        daily.groupBy("k")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "k",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("d"),
        )
    )
    full = spine.join(daily, ["k", "d"], "left")
    wp = (
        Window.partitionBy("k")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("k")
        .orderBy("d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v_obs").isNotNull(), F.col("d"))
    filled = (
        full.withColumn("_pv", F.last("v_obs", ignorenulls=True).over(wp))
        .withColumn("_pd", F.last(obs_day, ignorenulls=True).over(wp))
        .withColumn("_nv", F.first("v_obs", ignorenulls=True).over(wn))
        .withColumn("_nd", F.first(obs_day, ignorenulls=True).over(wn))
    )
    interp = F.col("_pv") + half_away_div(
        "(_nv - _pv) * datediff(d, _pd)", "datediff(_nd, _pd)"
    )
    return filled.select(
        F.col("k").alias(key_col),
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce(F.col("v_obs"), interp).cast("long").alias("v_cents"),
        F.col("v_obs").isNull().alias("filled"),
    ).orderBy(key_col, "day")


def gap_fill_daily_sql(
    table: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    """DuckDB twin of gap_fill_daily."""
    from ..functions.exact import half_away_div_sql

    interp = half_away_div_sql("(nv - pv) * (d - pd)", "(nd - pd)")
    return f"""
WITH daily AS (
  SELECT {key_col} AS k, CAST({ts_col} AS DATE) AS d,
         count(*)::BIGINT AS n_events,
         CAST(sum(CAST({value_col} AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS v_obs
  FROM {table} GROUP BY 1, 2
),
spine AS (
  SELECT k, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
           AS d
  FROM (SELECT k, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY k)
),
full_cal AS (
  SELECT s.k, s.d, dy.n_events, dy.v_obs
  FROM spine s LEFT JOIN daily dy ON s.k = dy.k AND s.d = dy.d
),
brk AS (
  SELECT k, d, n_events, v_obs,
         last_value(v_obs IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN v_obs IS NOT NULL THEN d END IGNORE NULLS)
           OVER wp AS pd,
         first_value(v_obs IGNORE NULLS) OVER wn AS nv,
         first_value(CASE WHEN v_obs IS NOT NULL THEN d END IGNORE NULLS)
           OVER wn AS nd
  FROM full_cal
  WINDOW wp AS (PARTITION BY k ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY k ORDER BY d
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT k AS {key_col}, strftime(d, '%Y-%m-%d') AS day,
       coalesce(n_events, 0)::BIGINT AS n_events,
       coalesce(v_obs, pv + {interp})::BIGINT AS v_cents,
       (v_obs IS NULL) AS filled
FROM brk ORDER BY {key_col}, day
"""


def last_touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback_us: int = 3_600_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Last-touch attribution: for every conversion event, the most
    recent preceding touch event (click/view) by the same user
    within ``lookback_us`` microseconds — the standard
    marketing-credit assignment, and the canonical carry-forward
    window (same family as gap_fill/SCD2).

    ONE window per user ordered by the total key (ts_us, event_id):
    ``last(touch, ignorenulls=True)`` over the unbounded-to-previous
    frame carries the latest touch to each row — no self-join, no
    per-conversion scan-back. At 100 TB this is one shuffle on
    user_id; a hot user only serializes their own event stream.

    Determinism: timestamps enter as exact integer MICROSECONDS
    (epoch_us both engines — no sub-second floor/round divergence,
    see ewma's rationale); ties break on event_id.

    Output: one row per conversion —
    (conv_id, user, conv_ts_us, touch_id, gap_us); touch columns
    NULL when no touch precedes the conversion inside the window.
    """
    ts_us = F.unix_micros(F.col(ts_col))
    base = events.select(
        F.col(user_col).alias("usr"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("etype"),
        ts_us.alias("ts_us"),
    )
    w = (
        Window.partitionBy("usr")
        .orderBy("ts_us", "eid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("etype").isin(*touch_types)
    last_ts = F.last(
        F.when(is_touch, F.col("ts_us")), ignorenulls=True
    ).over(w)
    last_id = F.last(
        F.when(is_touch, F.col("eid")), ignorenulls=True
    ).over(w)
    # gap/in_window MUST reference the materialized t_ts/t_id columns,
    # not the window expressions: a window expression used after the
    # conversion filter would re-evaluate over the FILTERED frame
    # (purchases only), where no touch rows exist
    gap = F.col("ts_us") - F.col("t_ts")
    in_window = gap <= F.lit(lookback_us)
    return (
        base.withColumn("t_ts", last_ts)
        .withColumn("t_id", last_id)
        .where(F.col("etype") == conversion_type)
        .select(
            F.col("eid").alias("conv_id"),
            F.col("usr").alias("user_id"),
            F.col("ts_us").alias("conv_ts_us"),
            F.when(in_window, F.col("t_id")).alias("touch_id"),
            F.when(in_window, gap).cast("long").alias("gap_us"),
        )
        .orderBy("conv_id")
    )


def last_touch_attribution_sql(
    events_table: str = "events",
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback_us: int = 3_600_000_000,
) -> str:
    """DuckDB twin of last_touch_attribution."""
    touches = ", ".join(sql_str_lit(t) for t in touch_types)
    return f"""
WITH base AS (
  SELECT user_id AS usr, event_id AS eid, event_type AS etype,
         epoch_us(ts) AS ts_us
  FROM {events_table}
),
carried AS (
  SELECT usr, eid, etype, ts_us,
         last_value(CASE WHEN etype IN ({touches}) THEN ts_us END
                    IGNORE NULLS)
           OVER (PARTITION BY usr ORDER BY ts_us, eid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS t_ts,
         last_value(CASE WHEN etype IN ({touches}) THEN eid END
                    IGNORE NULLS)
           OVER (PARTITION BY usr ORDER BY ts_us, eid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS t_id
  FROM base
)
SELECT eid AS conv_id, usr AS user_id, ts_us AS conv_ts_us,
       CASE WHEN ts_us - t_ts <= {lookback_us} THEN t_id END
         AS touch_id,
       CASE WHEN ts_us - t_ts <= {lookback_us} THEN ts_us - t_ts END
         ::BIGINT AS gap_us
FROM carried
WHERE etype = {sql_str_lit(conversion_type)}
ORDER BY conv_id
"""


def cusum_daily(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    alarm_mult: int = 3,
) -> DataFrame:
    """CUSUM change-point detection (Page 1954) over zero-filled
    daily event counts, per series — the classic drift detector for
    rate shifts that a plain threshold misses.

    The recurrence s_i = max(0, s_{i-1} + (x_i - k)) looks
    sequential, but has the closed form

        s_i = p_i - min(0, min_{j<=i} p_j),   p = prefix sum of (x-k)

    so it is TWO frame-bounded windows per series (cumulative sum +
    cumulative min) — no recursion, no driver loop, partitioned by
    series key, nothing global. k is the series mean; to keep every
    term an exact integer the whole series is scaled by n (days):
    p_i = Σ (n·x_j − S) with S = Σx, and the alarm fires when the
    unscaled cusum exceeds ``alarm_mult``× the daily mean, i.e.
    s_scaled > alarm_mult·S. Bit-identical on any engine.

    Output: (event_type, day, x, s_scaled, alarm) ordered by
    (event_type, day); s_scaled = n·cusum."""
    daily = events.groupBy(
        F.col(type_col).alias("g"), F.to_date(ts_col).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    return cusum_from_daily(daily, type_col=type_col, alarm_mult=alarm_mult)


def cusum_from_daily(
    daily: DataFrame,
    type_col: str = "event_type",
    alarm_mult: int = 3,
) -> DataFrame:
    """The CUSUM closed form over an already-aggregated daily count
    table (g, d, x) — factored out of [[cusum_daily]] so the
    streaming variant (streaming/temporal.CusumStream) computes the
    IDENTICAL plan over its epoch-summed state: stream == batch by
    construction, not by parallel implementations."""
    spine = (
        daily.groupBy("g")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "g",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("d"),
        )
    )
    full = spine.join(daily, ["g", "d"], "left").select(
        "g", "d", F.coalesce("x", F.lit(0)).cast("long").alias("x")
    )
    totals = full.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("s_tot"),
    )
    wcum = (
        Window.partitionBy("g")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_p = full.join(totals, "g").withColumn(
        "p",
        F.sum(F.col("n") * F.col("x") - F.col("s_tot")).over(wcum),
    )
    s_scaled = F.col("p") - F.least(F.lit(0), F.min("p").over(wcum))
    return (
        with_p.select(
            F.col("g").alias(type_col),
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "x",
            s_scaled.alias("s_scaled"),
            (s_scaled > F.lit(alarm_mult) * F.col("s_tot")).alias(
                "alarm"
            ),
        )
        .orderBy(type_col, "day")
    )


def cusum_daily_sql(
    events_table: str = "events", alarm_mult: int = 3
) -> str:
    """DuckDB twin of cusum_daily."""
    return f"""
WITH daily AS (
  SELECT event_type AS g, ts::DATE AS d, count(*)::BIGINT AS x
  FROM {events_table} GROUP BY 1, 2
),
spine AS (
  SELECT g, unnest(generate_series(min(d), max(d),
                   INTERVAL 1 DAY))::DATE AS d
  FROM daily GROUP BY g
),
full_days AS (
  SELECT s.g, s.d, coalesce(dl.x, 0)::BIGINT AS x
  FROM spine s LEFT JOIN daily dl ON dl.g = s.g AND dl.d = s.d
),
tot AS (
  SELECT g, count(*)::BIGINT AS n, sum(x)::BIGINT AS s_tot
  FROM full_days GROUP BY g
),
cum AS (
  SELECT f.g, f.d, f.x, t.s_tot,
         sum(t.n * f.x - t.s_tot)
           OVER (PARTITION BY f.g ORDER BY f.d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS p
  FROM full_days f JOIN tot t ON t.g = f.g
),
sc AS (
  SELECT g, d, x, s_tot,
         p - least(0, min(p)
               OVER (PARTITION BY g ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           AS s_scaled
  FROM cum
)
SELECT g AS event_type, strftime(d, '%Y-%m-%d') AS day, x,
       s_scaled::BIGINT AS s_scaled,
       (s_scaled > {alarm_mult} * s_tot) AS alarm
FROM sc ORDER BY event_type, day
"""


def autocorr_daily(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    lag: int = 1,
    min_pairs: int = 3,
) -> DataFrame:
    """Lag-k autocorrelation of zero-filled daily event counts per
    series — the seasonality/burst-persistence probe (ACF value)
    behind every rate model.

    Pearson r over (x_{t-lag}, x_t) pairs from ONE window lag per
    series, then the same exact-integer sufficient statistics as
    operators/regression.ols_fit. The only non-rational op is
    sqrt, which IEEE-754 requires to be correctly rounded, so the
    result quantizes identically on both engines.

    Output: (event_type, n_pairs, r_q = round(r * 1e6))."""
    daily = events.groupBy(
        F.col(type_col).alias("g"), F.to_date(ts_col).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("v"))
    spine = (
        daily.groupBy("g")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "g",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("d"),
        )
    )
    full = spine.join(daily, ["g", "d"], "left").select(
        "g", "d", F.coalesce("v", F.lit(0)).cast("long").alias("v")
    )
    w = Window.partitionBy("g").orderBy("d")
    pairs = full.withColumn("xprev", F.lag("v", lag).over(w)).where(
        F.col("xprev").isNotNull()
    )
    stats = pairs.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xprev").alias("sx"),
        F.sum("v").alias("sy"),
        F.sum(F.col("xprev") * F.col("v")).alias("sxy"),
        F.sum(F.col("xprev") * F.col("xprev")).alias("sxx"),
        F.sum(F.col("v") * F.col("v")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    r = num / (F.sqrt(vx) * F.sqrt(vy))
    return (
        stats.where(
            (F.col("n") >= min_pairs) & (vx > 0) & (vy > 0)
        )
        .select(
            F.col("g").alias(type_col),
            F.col("n").alias("n_pairs"),
            F.floor(r * F.lit(1e6) + F.lit(0.5)).cast("long").alias(
                "r_q"
            ),
        )
        .orderBy(type_col)
    )


def autocorr_daily_sql(
    events_table: str = "events", lag: int = 1, min_pairs: int = 3
) -> str:
    """DuckDB twin of autocorr_daily."""
    return f"""
WITH daily AS (
  SELECT event_type AS g, ts::DATE AS d, count(*)::BIGINT AS v
  FROM {events_table} GROUP BY 1, 2
),
spine AS (
  SELECT g, unnest(generate_series(min(d), max(d),
                   INTERVAL 1 DAY))::DATE AS d
  FROM daily GROUP BY g
),
full_days AS (
  SELECT s.g, s.d, coalesce(dl.v, 0)::BIGINT AS v
  FROM spine s LEFT JOIN daily dl ON dl.g = s.g AND dl.d = s.d
),
pairs AS (
  SELECT g, v,
         lag(v, {lag}) OVER (PARTITION BY g ORDER BY d) AS xprev
  FROM full_days
),
stats AS (
  SELECT g, count(*)::BIGINT AS n,
         sum(xprev)::BIGINT AS sx, sum(v)::BIGINT AS sy,
         sum(xprev * v)::BIGINT AS sxy,
         sum(xprev * xprev)::BIGINT AS sxx,
         sum(v * v)::BIGINT AS syy
  FROM pairs WHERE xprev IS NOT NULL GROUP BY g
)
SELECT g AS event_type, n AS n_pairs,
       floor((n * sxy - sx * sy)::DOUBLE
             / (sqrt((n * sxx - sx * sx)::DOUBLE)
                * sqrt((n * syy - sy * sy)::DOUBLE)) * 1e6 + 0.5
            )::BIGINT AS r_q
FROM stats
WHERE n >= {min_pairs}
  AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
ORDER BY event_type
"""


def fano_factor(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    min_days: int = 3,
) -> DataFrame:
    """Fano factor (index of dispersion, var/mean) of zero-filled
    daily counts per series — the burstiness classifier: ≈1 is
    Poisson arrivals, >1 bursty/overdispersed (retry storms, bot
    floods), <1 regular/scheduled. The companion statistic to
    [[cusum]]'s level-shift alarm.

    Exact integers end to end: with S = Σx, n days,
    sample variance = (n·Σx² − S²)/(n·(n−1)) and mean = S/n, so
    F = (n·Σx² − S²)/((n−1)·S) — ONE double division of exact
    int64s (daily-count squares pass int64 until a single key sees
    ~3e9 events/day), half-up quantized at 1e6.

    Output: (event_type, n_days, mean_q, fano_q)."""
    daily = events.groupBy(
        F.col(type_col).alias("g"), F.to_date(ts_col).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    spine = (
        daily.groupBy("g")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "g",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("d"),
        )
    )
    full = spine.join(daily, ["g", "d"], "left").select(
        "g", F.coalesce("x", F.lit(0)).cast("long").alias("x")
    )
    stats = full.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    fano = (
        (F.col("n") * F.col("sxx") - F.col("s") * F.col("s")).cast(
            "double"
        )
        / ((F.col("n") - F.lit(1)) * F.col("s")).cast("double")
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")

    def q(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")

    return (
        stats.where((F.col("n") >= min_days) & (F.col("s") > 0))
        .select(
            F.col("g").alias(type_col),
            F.col("n").alias("n_days"),
            q(mean).alias("mean_q"),
            q(fano).alias("fano_q"),
        )
        .orderBy(type_col)
    )


def fano_factor_sql(
    events_table: str = "events", min_days: int = 3
) -> str:
    """DuckDB twin of fano_factor."""
    return f"""
WITH daily AS (
  SELECT event_type AS g, ts::DATE AS d, count(*)::BIGINT AS x
  FROM {events_table} GROUP BY 1, 2
),
spine AS (
  SELECT g, unnest(generate_series(min(d), max(d),
                   INTERVAL 1 DAY))::DATE AS d
  FROM daily GROUP BY g
),
full_days AS (
  SELECT s.g, coalesce(dl.x, 0)::BIGINT AS x
  FROM spine s LEFT JOIN daily dl ON dl.g = s.g AND dl.d = s.d
),
stats AS (
  SELECT g, count(*)::BIGINT AS n, sum(x)::BIGINT AS s,
         sum(x * x)::BIGINT AS sxx
  FROM full_days GROUP BY g
)
SELECT g AS event_type, n AS n_days,
       floor(s::DOUBLE / n::DOUBLE * 1e6 + 0.5)::BIGINT AS mean_q,
       floor((n * sxx - s * s)::DOUBLE / ((n - 1) * s)::DOUBLE
             * 1e6 + 0.5)::BIGINT AS fano_q
FROM stats
WHERE n >= {min_days} AND s > 0
ORDER BY event_type
"""


def period_over_period(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    yoy_lag: int = 12,
) -> DataFrame:
    """Month-over-month and year-over-year comparison per key — the
    BI staple. Monthly totals in exact integer cents (the certified
    DECIMAL money-sum pattern), a generated month spine so a silent
    empty month reads as 0 rather than silently comparing against
    the wrong period, and two lag windows per key (nothing global).

    Percent changes are ONE division of exact ints each, half-up
    quantized; NULL until the lag exists or when the base is 0.

    Output: (key, month 'yyyy-MM', v_cents, mom_pct_q, yoy_pct_q)."""
    monthly = df.groupBy(
        F.col(key_col).alias("k"),
        F.trunc(F.col(ts_col), "month").alias("m"),
    ).agg(
        (F.sum(F.col(value_col).cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("v"),
    )
    spine = (
        monthly.groupBy("k")
        .agg(F.min("m").alias("m0"), F.max("m").alias("m1"))
        .select(
            "k",
            F.explode(
                F.sequence("m0", "m1", F.expr("interval 1 month"))
            ).alias("m"),
        )
    )
    full = spine.join(monthly, ["k", "m"], "left").select(
        "k", "m", F.coalesce("v", F.lit(0)).alias("v")
    )
    w = Window.partitionBy("k").orderBy("m")
    prev = F.lag("v", 1).over(w)
    yoy = F.lag("v", yoy_lag).over(w)

    def pct(cur, base):
        return F.when(
            base.isNotNull() & (base != 0),
            F.floor(
                (cur - base).cast("double") / base.cast("double")
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long"),
        )

    return full.select(
        F.col("k").alias(key_col),
        F.date_format("m", "yyyy-MM").alias("month"),
        F.col("v").alias("v_cents"),
        pct(F.col("v"), prev).alias("mom_pct_q"),
        pct(F.col("v"), yoy).alias("yoy_pct_q"),
    ).orderBy(key_col, "month")


def period_over_period_sql(
    table_cte: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    yoy_lag: int = 12,
) -> str:
    """DuckDB twin of period_over_period."""
    return f"""
WITH monthly AS (
  SELECT {key_col} AS k, date_trunc('month', {ts_col})::DATE AS m,
         (sum(CAST({value_col} AS DECIMAL(18,2))) * 100)::BIGINT AS v
  FROM ({table_cte}) GROUP BY 1, 2
),
spine AS (
  SELECT k, unnest(generate_series(min(m), max(m),
                   INTERVAL 1 MONTH))::DATE AS m
  FROM monthly GROUP BY k
),
full_m AS (
  SELECT s.k, s.m, coalesce(mo.v, 0)::BIGINT AS v
  FROM spine s LEFT JOIN monthly mo ON mo.k = s.k AND mo.m = s.m
),
lagged AS (
  SELECT k, m, v,
         lag(v, 1) OVER (PARTITION BY k ORDER BY m) AS prev,
         lag(v, {yoy_lag}) OVER (PARTITION BY k ORDER BY m) AS yoy
  FROM full_m
)
SELECT k AS {key_col}, strftime(m, '%Y-%m') AS month, v AS v_cents,
       CASE WHEN prev IS NOT NULL AND prev <> 0 THEN
         floor((v - prev)::DOUBLE / prev::DOUBLE * 1e6 + 0.5)::BIGINT
       END AS mom_pct_q,
       CASE WHEN yoy IS NOT NULL AND yoy <> 0 THEN
         floor((v - yoy)::DOUBLE / yoy::DOUBLE * 1e6 + 0.5)::BIGINT
       END AS yoy_pct_q
FROM lagged ORDER BY {key_col}, month
"""


def survival_curve(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Kaplan-Meier survival estimate of time-to-second-event per
    user (Kaplan & Meier 1958) — the retention/churn curve with
    CORRECT censoring: users who never produced a second event are
    censored at the observation horizon instead of being dropped
    (the mistake naive retention queries make).

    Each user contributes one duration in whole MINUTES (first
    event → second event; censored at the corpus max timestamp —
    minute resolution keeps the curve informative for streams whose
    inter-event gaps are minutes, not days). At each
    distinct duration t: n_i = at-risk, d_i = events. The KM
    product Π(1 − d_i/n_i) is emitted in LOG space: per-term
    round(ln(1−d_i/n_i)·1e9) integers, cumulative-summed — a
    deterministic integer path (the mutual_info log discipline;
    exp() is not correctly-rounded so the product itself is not
    hash-safe). log_surv_q = 1e9·ln S(t), monotone decreasing;
    surv ≈ exp(q/1e9) for display.

    Shape: one window per user (first/second pick), one duration
    groupBy, one cumulative window over the ≤span-days duration
    table. Output: (t_days, n_risk, d_events, c_censored,
    log_surv_q)."""
    ts_us = F.unix_micros(F.col(ts_col))
    base = events.select(
        F.col(user_col).alias("u"),
        ts_us.alias("t"),
        F.col(id_col).alias("eid"),
    )
    w = Window.partitionBy("u").orderBy("t", "eid")
    seq = base.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= 2
    )
    per_user = seq.groupBy("u").agg(
        F.min(F.when(F.col("rn") == 1, F.col("t"))).alias("t1"),
        F.min(F.when(F.col("rn") == 2, F.col("t"))).alias("t2"),
    )
    horizon = base.agg(F.max("t").alias("h"))
    us_min = 60_000_000
    durations = per_user.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("t2").isNotNull(),
            F.expr(f"(t2 - t1) DIV {us_min}"),
        )
        .otherwise(F.expr(f"(h - t1) DIV {us_min}"))
        .alias("td"),
        F.col("t2").isNull().alias("censored"),
    )
    by_t = durations.groupBy("td").agg(
        F.sum((~F.col("censored")).cast("long")).alias("d"),
        F.sum(F.col("censored").cast("long")).alias("c"),
    )
    wc = Window.orderBy("td").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = by_t.agg(F.sum(F.col("d") + F.col("c")).alias("n_all"))
    cum = (
        by_t.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_risk",
            F.col("n_all")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(
                    Window.orderBy("td").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            # d == n_risk absorbs the curve: S(t)=0, ln undefined —
            # emit NULL log-survival from that time on (the standard
            # KM absorption convention) instead of ln(0)
            "term_q",
            F.when(
                (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
                F.round(
                    F.log(
                        F.lit(1.0)
                        - F.col("d").cast("double")
                        / F.col("n_risk").cast("double")
                    )
                    * F.lit(1e9)
                ).cast("long"),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "absorbed", (F.col("d") == F.col("n_risk")).cast("long")
        )
    )
    return cum.select(
        F.col("td").alias("t_min"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("d_events"),
        F.col("c").cast("long").alias("c_censored"),
        F.when(
            F.sum("absorbed").over(wc) == 0,
            F.sum("term_q").over(wc),
        )
        .cast("long")
        .alias("log_surv_q"),
    ).orderBy("t_min")


def survival_curve_sql(events_table: str = "events") -> str:
    """DuckDB twin of survival_curve."""
    us_min = 60_000_000
    return f"""
WITH base AS (
  SELECT user_id AS u, epoch_us(ts) AS t, event_id AS eid
  FROM {events_table}
),
seq AS (
  SELECT u, t,
         row_number() OVER (PARTITION BY u ORDER BY t, eid) AS rn
  FROM base
),
per_user AS (
  SELECT u, min(CASE WHEN rn = 1 THEN t END) AS t1,
         min(CASE WHEN rn = 2 THEN t END) AS t2
  FROM seq WHERE rn <= 2 GROUP BY u
),
horizon AS (SELECT max(t) AS h FROM base),
durations AS (
  SELECT CASE WHEN t2 IS NOT NULL THEN (t2 - t1) // {us_min}
              ELSE (h - t1) // {us_min} END AS td,
         (t2 IS NULL) AS censored
  FROM per_user, horizon
),
by_t AS (
  SELECT td, sum(CASE WHEN censored THEN 0 ELSE 1 END)::BIGINT AS d,
         sum(CASE WHEN censored THEN 1 ELSE 0 END)::BIGINT AS c
  FROM durations GROUP BY td
),
tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n_all FROM by_t),
cum AS (
  SELECT td, d, c,
         t.n_all - coalesce(sum(d + c) OVER (ORDER BY td
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_risk
  FROM by_t, tot t
),
termed AS (
  SELECT td, d, c, n_risk,
         CASE WHEN d > 0 AND d < n_risk THEN
           CAST(round(ln(1.0 - d::DOUBLE / n_risk::DOUBLE) * 1e9)
                AS BIGINT)
         ELSE 0 END AS term_q,
         CASE WHEN d = n_risk THEN 1 ELSE 0 END AS absorbed
  FROM cum
)
SELECT td AS t_min, n_risk::BIGINT AS n_risk, d AS d_events,
       c AS c_censored,
       CASE WHEN sum(absorbed) OVER (ORDER BY td
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 0
            THEN CAST(sum(term_q) OVER (ORDER BY td
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT)
       END AS log_surv_q
FROM termed ORDER BY t_min
"""


def weekday_profile(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekday seasonality per series with SPINE-CORRECT
    expectations: the null hypothesis share of each ISO weekday is
    (#occurrences of that weekday in the observed span) / span-days
    — NOT 1/7, which silently biases any span that is not a whole
    number of weeks (the classic seasonality-test mistake). Chi-
    square terms per (series, weekday) flag day-of-week structure.

    All counts exact; expected = total·dow_days/span_days is integer
    arithmetic until ONE division; the chi-square term is the same
    plain-multiply dag as benford_audit. One groupBy + a per-series
    spine join.

    Output: (event_type, dow 1-7, n_obs, expected_q, chi2_q)."""
    daily = events.groupBy(
        F.col(type_col).alias("g"), F.to_date(ts_col).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    spine = (
        daily.groupBy("g")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "g",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("d"),
        )
    )
    dow = F.dayofweek("d").cast("long")  # 1=Sunday..7 both engines?
    spine_dow = spine.groupBy("g", dow.alias("dw")).agg(
        F.count(F.lit(1)).cast("long").alias("dow_days")
    )
    span = spine.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("span_days")
    )
    obs = (
        daily.select("g", dow.alias("dw"), "x")
        .groupBy("g", "dw")
        .agg(F.sum("x").alias("n_obs"))
    )
    totals = obs.groupBy("g").agg(
        F.sum("n_obs").cast("long").alias("total")
    )
    j = (
        spine_dow.join(obs, ["g", "dw"], "left")
        .na.fill({"n_obs": 0})
        .join(F.broadcast(span), "g")
        .join(F.broadcast(totals), "g")
    )
    expected = (
        (F.col("total") * F.col("dow_days")).cast("double")
        / F.col("span_days").cast("double")
    )
    dev = F.col("n_obs").cast("double") - expected

    def q(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")

    return j.select(
        F.col("g").alias(type_col),
        F.col("dw").alias("dow"),
        F.col("n_obs").cast("long").alias("n_obs"),
        q(expected).alias("expected_q"),
        q(dev * dev / expected).alias("chi2_q"),
    ).orderBy(type_col, "dow")


def weekday_profile_sql(events_table: str = "events") -> str:
    """DuckDB twin of weekday_profile. DuckDB dayofweek() is
    0=Sunday..6; Spark dayofweek() is 1=Sunday..7 — shift by 1."""
    return f"""
WITH daily AS (
  SELECT event_type AS g, ts::DATE AS d, count(*)::BIGINT AS x
  FROM {events_table} GROUP BY 1, 2
),
spine AS (
  SELECT g, unnest(generate_series(min(d), max(d),
                   INTERVAL 1 DAY))::DATE AS d
  FROM daily GROUP BY g
),
spine_dow AS (
  SELECT g, dayofweek(d)::BIGINT + 1 AS dw,
         count(*)::BIGINT AS dow_days
  FROM spine GROUP BY 1, 2
),
span AS (SELECT g, count(*)::BIGINT AS span_days FROM spine GROUP BY g),
obs AS (
  SELECT g, dayofweek(d)::BIGINT + 1 AS dw, sum(x)::BIGINT AS n_obs
  FROM daily GROUP BY 1, 2
),
totals AS (SELECT g, CAST(sum(n_obs) AS BIGINT) AS total
           FROM obs GROUP BY g),
j AS (
  SELECT sd.g, sd.dw, coalesce(o.n_obs, 0)::BIGINT AS n_obs,
         (t.total * sd.dow_days)::DOUBLE / sp.span_days::DOUBLE
           AS expected
  FROM spine_dow sd
  LEFT JOIN obs o ON o.g = sd.g AND o.dw = sd.dw
  JOIN span sp ON sp.g = sd.g
  JOIN totals t ON t.g = sd.g
)
SELECT g AS event_type, dw AS dow, n_obs,
       floor(expected * 1e6 + 0.5)::BIGINT AS expected_q,
       floor((n_obs::DOUBLE - expected) * (n_obs::DOUBLE - expected)
             / expected * 1e6 + 0.5)::BIGINT AS chi2_q
FROM j ORDER BY event_type, dow
"""


# SAX breakpoints for alphabet size 4: the standard-normal quartile
# boundaries (Lin & Keogh 2003, table 3), quantized once as integer
# micro-units so both engines compare against the SAME literals.
SAX_BREAKPOINTS_Q4 = (-674_490, 0, 674_490)  # ±0.67449 * 1e6


def sax_daily(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """SAX symbolization (Lin & Keogh 2003) of zero-filled daily
    event counts, per series: z-normalize the series, map each day
    to an alphabet-4 symbol a<b<c<d by the standard-normal quartile
    breakpoints, and emit the per-series symbol string — the
    representation behind time-series motif mining, anomaly grammars
    and whole-series similarity at symbol (not float) cost.

    Determinism: per-series mean/variance come from exact integer
    sufficient statistics (Σx, Σx², n); the z-score is computed in
    integer micro-units — z_q = floor((n·x − S)·1e6 / (n·sd) + 0.5)
    with n·sd = sqrt(n·Σx² − S²) per series, sqrt being IEEE-
    correctly-rounded and the single division quantized half-up
    (floor(x + 0.5): ties toward +inf) —
    then compared against integer breakpoint literals, so the symbol
    assignment cannot float-flip between engines. Zero-variance
    series emit all-'c' (z = 0 falls in the [0, 0.6745) region —
    the standard half-open breakpoint convention). The symbol string aggregates in
    day order (array_sort on (day, symbol) structs ↔ string_agg
    ORDER BY), never a global sort.

    Output: (event_type, n_days, sax) one row per series."""
    daily = events.groupBy(
        F.col(type_col).alias("g"), F.to_date(ts_col).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    spine = (
        daily.groupBy("g")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "g",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("d"),
        )
    )
    full = spine.join(daily, ["g", "d"], "left").select(
        "g", "d", F.coalesce("x", F.lit(0)).cast("long").alias("x")
    )
    stats = full.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    j = full.join(F.broadcast(stats), "g")
    # sd = sqrt((n·Σx² − S²))/n, so n·sd = sqrt(n·Σx² − S²) —
    # all-integer radicand
    n_sd = F.sqrt(
        (F.col("n") * F.col("s2") - F.col("s") * F.col("s")).cast(
            "double"
        )
    )
    z_q = F.when(n_sd > 0, F.floor(
        (F.col("n") * F.col("x") - F.col("s")).cast("double")
        * F.lit(1e6)
        / n_sd
        + F.lit(0.5)
    ).cast("long")).otherwise(F.lit(0))
    b1, b2, b3 = SAX_BREAKPOINTS_Q4
    sym = (
        F.when(z_q < F.lit(b1), F.lit("a"))
        .when(z_q < F.lit(b2), F.lit("b"))
        .when(z_q < F.lit(b3), F.lit("c"))
        .otherwise(F.lit("d"))
    )
    per_day = j.select("g", "d", sym.alias("sym"))
    return (
        per_day.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("d"), F.col("sym")))
                    ),
                    lambda x: x["sym"],
                ),
                "",
            ).alias("sax"),
        )
        .select(F.col("g").alias(type_col), "n_days", "sax")
        .orderBy(type_col)
    )


def sax_daily_sql(events_table: str = "events") -> str:
    """DuckDB twin of sax_daily."""
    b1, b2, b3 = SAX_BREAKPOINTS_Q4
    return f"""
WITH sax_daily AS MATERIALIZED (
  SELECT event_type AS g, ts::DATE AS d, count(*)::BIGINT AS x
  FROM {events_table} GROUP BY 1, 2
),
sax_spine AS (
  SELECT g, unnest(generate_series(min(d), max(d),
                   INTERVAL 1 DAY))::DATE AS d
  FROM sax_daily GROUP BY g
),
sax_full AS (
  SELECT s.g, s.d, coalesce(dl.x, 0)::BIGINT AS x
  FROM sax_spine s LEFT JOIN sax_daily dl ON dl.g = s.g AND dl.d = s.d
),
sax_stats AS (
  SELECT g, count(*)::BIGINT AS n, sum(x)::BIGINT AS s,
         sum(x * x)::BIGINT AS s2
  FROM sax_full GROUP BY g
),
sax_z AS (
  SELECT f.g, f.d,
         CASE WHEN (t.n * t.s2 - t.s * t.s) > 0 THEN
           floor((t.n * f.x - t.s)::DOUBLE * 1e6
                 / sqrt((t.n * t.s2 - t.s * t.s)::DOUBLE)
                 + 0.5)::BIGINT
         ELSE 0 END AS z_q
  FROM sax_full f JOIN sax_stats t ON t.g = f.g
),
sax_sym AS (
  SELECT g, d,
         CASE WHEN z_q < {b1} THEN 'a'
              WHEN z_q < {b2} THEN 'b'
              WHEN z_q < {b3} THEN 'c'
              ELSE 'd' END AS sym
  FROM sax_z
)
SELECT g AS event_type, count(*)::BIGINT AS n_days,
       string_agg(sym, '' ORDER BY d) AS sax
FROM sax_sym GROUP BY g
ORDER BY event_type
"""


def mann_kendall_daily(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Mann-Kendall monotonic-trend test per series over zero-filled
    daily event counts — the nonparametric "is this metric actually
    trending" answer ([[cusum_daily]] finds level SHIFTS; this ranks
    sustained drift without assuming linearity or normality).

        S = Σ_{i<j} sign(x_j − x_i)
        Var(S) = [n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)] / 18
        z = (S − sign(S)) / sqrt(Var(S))   (continuity-corrected)

    Exactness: S and 18·Var(S) are pure int64 (the tie term comes
    from one extra groupBy over the per-value counts); the only
    float ops are one IEEE sqrt of an exact integer and one division,
    half-up-quantized ×1e6 (floor(x·1e6 + 0.5): ties toward +inf,
    identical expression both engines). The i<j pair join is keyed on the
    series and bounded by CALENDAR days² per series, never corpus
    rows — at any corpus scale this is a constant-size kernel per
    series.

    Output: (event_type, n_days, s_stat, var_s_x18, z_q) ordered by
    series."""
    daily = events.groupBy(
        F.col(type_col).alias("g"), F.to_date(ts_col).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    spine = (
        daily.groupBy("g")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "g",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("d"),
        )
    )
    full = spine.join(daily, ["g", "d"], "left").select(
        "g", "d", F.coalesce("x", F.lit(0)).cast("long").alias("x")
    )
    a = full.select("g", F.col("d").alias("di"), F.col("x").alias("xi"))
    b = full.select("g", F.col("d").alias("dj"), F.col("x").alias("xj"))
    s_stat = (
        a.join(b, "g")
        .where(F.col("di") < F.col("dj"))
        .groupBy("g")
        .agg(
            F.sum(F.signum(F.col("xj") - F.col("xi")).cast("long"))
            .cast("long")
            .alias("s_stat")
        )
    )
    ties = (
        full.groupBy("g", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("g")
        .agg(
            F.sum(
                F.col("t")
                * (F.col("t") - 1)
                * (2 * F.col("t") + 5)
            ).alias("tie_term"),
            F.sum("t").cast("long").alias("n_days"),
        )
    )
    j = s_stat.join(ties, "g")
    var18 = (
        F.col("n_days")
        * (F.col("n_days") - 1)
        * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    )
    # z = (S - sign(S)) / sqrt(var18/18) = (S - sign(S))*sqrt(18)/sqrt(var18)
    # keep ONE sqrt of an exact integer: multiply the numerator by
    # sqrt(18) via sqrt(18*(S-sign)^2) would lose the sign — instead
    # compute with two IEEE-exact steps written identically both
    # engines: num/sqrt(var18) * sqrt(18.0)
    num = (F.col("s_stat") - F.signum(F.col("s_stat")).cast("long")).cast(
        "double"
    )
    z_q = F.when(
        var18 > 0,
        F.floor(
            num / F.sqrt(var18.cast("double")) * F.sqrt(F.lit(18.0))
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0))
    return j.select(
        F.col("g").alias(type_col),
        "n_days",
        "s_stat",
        var18.cast("long").alias("var_s_x18"),
        z_q.alias("z_q"),
    ).orderBy(type_col)


def mann_kendall_daily_sql(events_table: str = "events") -> str:
    """DuckDB twin of mann_kendall_daily."""
    return f"""
WITH mk_daily AS MATERIALIZED (
  SELECT event_type AS g, ts::DATE AS d, count(*)::BIGINT AS x
  FROM {events_table} GROUP BY 1, 2
),
mk_spine AS (
  SELECT g, unnest(generate_series(min(d), max(d),
                   INTERVAL 1 DAY))::DATE AS d
  FROM mk_daily GROUP BY g
),
mk_full AS MATERIALIZED (
  SELECT s.g, s.d, coalesce(dl.x, 0)::BIGINT AS x
  FROM mk_spine s LEFT JOIN mk_daily dl ON dl.g = s.g AND dl.d = s.d
),
mk_s AS (
  SELECT a.g, sum(sign(b.x - a.x))::BIGINT AS s_stat
  FROM mk_full a JOIN mk_full b ON a.g = b.g AND a.d < b.d
  GROUP BY a.g
),
mk_ties AS (
  SELECT g,
         sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie_term,
         sum(t)::BIGINT AS n_days
  FROM (SELECT g, x, count(*)::BIGINT AS t FROM mk_full GROUP BY g, x)
  GROUP BY g
),
mk_j AS (
  SELECT s.g, t.n_days, s.s_stat,
         (t.n_days * (t.n_days - 1) * (2 * t.n_days + 5)
          - t.tie_term)::BIGINT AS var18
  FROM mk_s s JOIN mk_ties t ON t.g = s.g
)
SELECT g AS event_type, n_days, s_stat,
       var18 AS var_s_x18,
       CASE WHEN var18 > 0 THEN
         floor((s_stat - sign(s_stat))::DOUBLE / sqrt(var18::DOUBLE)
               * sqrt(18.0) * 1e6 + 0.5)::BIGINT
       ELSE 0 END AS z_q
FROM mk_j ORDER BY event_type
"""


def theil_sen_daily(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Theil-Sen robust trend slope per series over zero-filled daily
    event counts — the MAGNITUDE companion to [[mann_kendall_daily]]
    (MK says whether a drift is significant; this says how many
    events/day it gains), robust to 29% outliers where OLS's
    breakdown point is zero.

    slope = lower median over all i<j pairs of (x_j − x_i)/(d_j − d_i),
    each pair slope quantized ONCE as the exact integer
    trunc(dy·1e6 / dx) — dy is SIGNED, and Spark DIV and DuckDB //
    both truncate toward zero, so the quantized slopes agree on both
    signs and no float slope ever exists — then the lower median
    via the per-value-count cumulative window
    (the weighted_median pattern: 2·cum >= n_pairs), partitioned by
    series. Pair kernel bounded by calendar days² per series, like
    MK.

    Output: (event_type, n_pairs, slope_q) ordered by series —
    slope_q in micro-events/day."""
    daily = events.groupBy(
        F.col(type_col).alias("g"), F.to_date(ts_col).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    spine = (
        daily.groupBy("g")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "g",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("d"),
        )
    )
    full = spine.join(daily, ["g", "d"], "left").select(
        "g", "d", F.coalesce("x", F.lit(0)).cast("long").alias("x")
    )
    a = full.select("g", F.col("d").alias("di"), F.col("x").alias("xi"))
    b = full.select("g", F.col("d").alias("dj"), F.col("x").alias("xj"))
    slopes = (
        a.join(b, "g")
        .where(F.col("di") < F.col("dj"))
        .select(
            "g",
            # dy is SIGNED (falling series) — safe because Spark DIV
            # and DuckDB // BOTH truncate toward zero (verified:
            # -1000000 // 7 = -142857 in this container's DuckDB)
            F.expr(
                "CAST((xj - xi) * 1000000 DIV datediff(dj, di) AS LONG)"
            ).alias("s_q"),
        )
    )
    per_val = slopes.groupBy("g", "s_q").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wcum = (
        Window.partitionBy("g")
        .orderBy("s_q")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("g")
    ranked = per_val.select(
        "g",
        "s_q",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(tot).alias("n_pairs"),
    )
    return (
        ranked.where(2 * F.col("cum") >= F.col("n_pairs"))
        .groupBy("g", "n_pairs")
        .agg(F.min("s_q").alias("slope_q"))
        .select(
            F.col("g").alias(type_col),
            F.col("n_pairs"),
            "slope_q",
        )
        .orderBy(type_col)
    )


def theil_sen_daily_sql(events_table: str = "events") -> str:
    """DuckDB twin of theil_sen_daily."""
    return f"""
WITH ts_daily AS MATERIALIZED (
  SELECT event_type AS g, ts::DATE AS d, count(*)::BIGINT AS x
  FROM {events_table} GROUP BY 1, 2
),
ts_spine AS (
  SELECT g, unnest(generate_series(min(d), max(d),
                   INTERVAL 1 DAY))::DATE AS d
  FROM ts_daily GROUP BY g
),
ts_full AS MATERIALIZED (
  SELECT s.g, s.d, coalesce(dl.x, 0)::BIGINT AS x
  FROM ts_spine s LEFT JOIN ts_daily dl ON dl.g = s.g AND dl.d = s.d
),
ts_slopes AS (
  SELECT a.g,
         ((b.x - a.x) * 1000000 // date_diff('day', a.d, b.d))::BIGINT
           AS s_q
  FROM ts_full a JOIN ts_full b ON a.g = b.g AND a.d < b.d
),
ts_pv AS (
  SELECT g, s_q, count(*)::BIGINT AS c FROM ts_slopes GROUP BY g, s_q
),
ts_rk AS (
  SELECT g, s_q,
         sum(c) OVER (PARTITION BY g ORDER BY s_q
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(c) OVER (PARTITION BY g) AS n_pairs
  FROM ts_pv
)
SELECT g AS event_type, n_pairs::BIGINT AS n_pairs,
       min(s_q)::BIGINT AS slope_q
FROM ts_rk WHERE 2 * cum >= n_pairs
GROUP BY g, n_pairs
ORDER BY event_type
"""


def changepoint_binseg_daily(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    quant: int = 1_000_000,
) -> DataFrame:
    """Single most-likely mean-shift point per daily series — the
    first step of binary segmentation (Scott & Knott 1974), the
    "WHERE did the level change" companion to [[cusum_from_daily]]'s
    "DID it cross the alarm threshold". For the zero-filled daily
    count series x_1..x_T with prefix sums S_t, the split statistic

        D_t = | S_t · T − t · S_T |        (t = 1 .. T−1)

    is the CUSUM distance scaled by T (all EXACT int64 — S_t ≤ total
    events, ·T stays < 2^63 for ~3e9 events/day × decades; widen to
    DECIMAL beyond), and t* = argmax D_t with the earliest-day
    tie-break. Segment means are half-away integer divisions ×quant.

    Shape: one (g, day) groupBy — the corpus-scale pass — then all
    windows run over the DATE SPINE (calendar-bounded rows per
    series, never event rows; the ks_drift precedent). Series with
    T < 2 have no interior split: one row with NULL split columns
    (degenerate-input discipline).

    Output: (g, t_star, d_max, mean_before_q, mean_after_q) — t_star
    the last day of the left segment."""
    daily = events.groupBy(
        F.col(type_col).alias("g"), F.col(ts_col).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    spine = (
        daily.groupBy("g")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "g",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("d"),
        )
    )
    full = spine.join(daily, ["g", "d"], "left").select(
        "g", "d", F.coalesce("x", F.lit(0)).cast("long").alias("x")
    )
    w_ord = Window.partitionBy("g").orderBy("d")
    w_all = Window.partitionBy("g")
    scored = (
        full.withColumn("s_t", F.sum("x").over(w_ord))
        .withColumn("t", F.row_number().over(w_ord))
        .withColumn("n", F.count(F.lit(1)).over(w_all))
        .withColumn("s_tot", F.sum("x").over(w_all))
        .where(F.col("t") < F.col("n"))  # interior splits only
        .withColumn(
            "d_stat",
            F.abs(
                F.col("s_t") * F.col("n") - F.col("t") * F.col("s_tot")
            ),
        )
    )
    w_pick = Window.partitionBy("g").orderBy(
        F.col("d_stat").desc(), F.col("d").asc()
    )
    best = (
        scored.withColumn("_rn", F.row_number().over(w_pick))
        .where(F.col("_rn") == 1)
        .select(
            "g",
            # dates leave the engine as formatted strings (catalog
            # determinism rule: Spark is session-TZ, DuckDB UTC-naive)
            F.date_format("d", "yyyy-MM-dd").alias("t_star"),
            F.col("d_stat").alias("d_max"),
            half_away_div(f"s_t * {quant}", "t").cast("long").alias(
                "mean_before_q"
            ),
            half_away_div(
                f"(s_tot - s_t) * {quant}", "n - t"
            ).cast("long").alias("mean_after_q"),
        )
    )
    # series too short for an interior split: emit the degenerate row
    short = (
        full.groupBy("g")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") < 2)
        .select(
            "g",
            F.lit(None).cast("string").alias("t_star"),
            F.lit(None).cast("long").alias("d_max"),
            F.lit(None).cast("long").alias("mean_before_q"),
            F.lit(None).cast("long").alias("mean_after_q"),
        )
    )
    return best.unionByName(short).orderBy("g")


def changepoint_binseg_daily_sql(
    events_table: str = "events", quant: int = 1_000_000
) -> str:
    """DuckDB twin of changepoint_binseg_daily."""
    from ..functions.exact import half_away_div_sql

    mb = half_away_div_sql(f"s_t * {quant}", "t")
    ma = half_away_div_sql(f"(s_tot - s_t) * {quant}", "n - t")
    return f"""
WITH daily AS (
  SELECT event_type AS g, ts::DATE AS d, count(*)::BIGINT AS x
  FROM {events_table} GROUP BY 1, 2
),
spine AS (
  SELECT g, unnest(generate_series(min(d), max(d),
                   INTERVAL 1 DAY))::DATE AS d
  FROM daily GROUP BY g
),
full_days AS (
  SELECT s.g, s.d, coalesce(dl.x, 0)::BIGINT AS x
  FROM spine s LEFT JOIN daily dl ON dl.g = s.g AND dl.d = s.d
),
scored AS (
  SELECT g, d,
         sum(x) OVER (PARTITION BY g ORDER BY d
                      ROWS UNBOUNDED PRECEDING) AS s_t,
         row_number() OVER (PARTITION BY g ORDER BY d) AS t,
         count(*) OVER (PARTITION BY g) AS n,
         sum(x) OVER (PARTITION BY g) AS s_tot
  FROM full_days
),
interior AS (
  SELECT g, d, s_t::BIGINT AS s_t, t, n, s_tot::BIGINT AS s_tot,
         abs(s_t * n - t * s_tot)::BIGINT AS d_stat
  FROM scored WHERE t < n
),
best AS (
  SELECT g, strftime(d, '%Y-%m-%d') AS t_star, d_stat AS d_max,
         {mb}::BIGINT AS mean_before_q,
         {ma}::BIGINT AS mean_after_q,
         row_number() OVER (PARTITION BY g
                            ORDER BY d_stat DESC, d ASC) AS rn
  FROM interior
),
short AS (
  SELECT g, NULL::VARCHAR AS t_star, NULL::BIGINT AS d_max,
         NULL::BIGINT AS mean_before_q, NULL::BIGINT AS mean_after_q
  FROM full_days GROUP BY g HAVING count(*) < 2
)
SELECT g, t_star, d_max, mean_before_q, mean_after_q
FROM (SELECT g, t_star, d_max, mean_before_q, mean_after_q
      FROM best WHERE rn = 1
      UNION ALL SELECT * FROM short)
ORDER BY g
"""
