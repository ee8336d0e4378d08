"""As-of and range join operators: golden micro cases + tolerance."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators.temporal import (
    asof_join,
    range_join,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:05")),
            (2, "A", _ts("2024-01-01 10:00:00")),  # equal-time quote visible
            (3, "A", _ts("2024-01-01 09:59:59")),  # before any quote
            (4, "B", _ts("2024-01-01 10:00:10")),
        ],
        "trade_id long, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),
            ("A", _ts("2024-01-01 10:00:03"), 101.0),
            ("B", _ts("2024-01-01 10:00:01"), 50.0),
        ],
        "sym string, qts timestamp, px double",
    )
    got = {
        r["trade_id"]: r["right_px"]
        for r in asof_join(
            trades, quotes, key="sym", left_ts="ts", right_ts="qts",
            right_cols=["px"],
        ).collect()
    }
    assert got == {1: 101.0, 2: 100.0, 3: None, 4: 50.0}


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01 10:01:00"))],
        "i long, sym string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:00:00"), 1.0)],
        "sym string, qts timestamp, px double",
    )
    with_tol = asof_join(
        left, right, "sym", "ts", "qts", ["px"], tolerance_s=30
    ).collect()[0]
    assert with_tol["right_px"] is None  # 60s gap > 30s tolerance
    no_tol = asof_join(
        left, right, "sym", "ts", "qts", ["px"], tolerance_s=120
    ).collect()[0]
    assert no_tol["right_px"] == 1.0


def test_range_join_window(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00"))],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 09:59:59"), 0),   # before -> out
            ("u", _ts("2024-01-01 10:00:00"), 1),   # boundary -> in
            ("u", _ts("2024-01-01 10:59:59"), 2),   # in
            ("u", _ts("2024-01-01 11:00:00"), 3),   # end-exclusive -> out
            ("v", _ts("2024-01-01 10:30:00"), 4),   # wrong key -> out
        ],
        "k string, rts timestamp, rid long",
    )
    got = sorted(
        r["rid"]
        for r in range_join(
            left, right, key="k", left_ts="ts", right_ts="rts",
            range_seconds=3600,
        ).collect()
    )
    assert got == [1, 2]


def test_range_join_bucket_boundary(spark):
    # right rows in the NEXT bucket but inside the range must appear
    # (the predecessor-bucket trick)
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:30:00"))],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts("2024-01-01 11:15:00"), 9)],  # next hour bucket, in range
        "k string, rts timestamp, rid long",
    )
    got = range_join(
        left, right, key="k", left_ts="ts", right_ts="rts",
        range_seconds=3600,
    ).collect()
    assert [r["rid"] for r in got] == [9]


def test_scd2_history_planted(spark):
    from news_clustering_and_summarization_spark.operators.temporal import (
        scd2_history,
    )

    rows = [
        # user 1: A A B A  -> versions A, B, A (middle dup collapsed)
        (1, "2026-01-01 00:00:00", 10, "A"),
        (1, "2026-01-01 01:00:00", 11, "A"),
        (1, "2026-01-01 02:00:00", 12, "B"),
        (1, "2026-01-01 03:00:00", 13, "A"),
        # user 2: single row -> one current version
        (2, "2026-01-01 00:30:00", 20, "Z"),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts string, event_id int, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    hist = scd2_history(
        df, key="user_id", ts="ts", attrs=["event_type"],
        tiebreak="event_id",
    )
    got = sorted(
        (
            r["user_id"], r["version"], r["event_type"],
            str(r["valid_from"]), str(r["valid_to"]), r["is_current"],
        )
        for r in hist.collect()
    )
    assert got == [
        (1, 1, "A", "2026-01-01 00:00:00", "2026-01-01 02:00:00", False),
        (1, 2, "B", "2026-01-01 02:00:00", "2026-01-01 03:00:00", False),
        (1, 3, "A", "2026-01-01 03:00:00", "None", True),
        (2, 1, "Z", "2026-01-01 00:30:00", "None", True),
    ]


def test_scd2_single_exchange(spark):
    """Both window passes must share one shuffle."""
    from news_clustering_and_summarization_spark.operators.temporal import (
        scd2_history,
    )

    df = spark.createDataFrame(
        [(1, "2026-01-01 00:00:00", 1, "A")],
        "user_id int, ts string, event_id int, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    plan = (
        scd2_history(df, "user_id", "ts", ["event_type"], "event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_current_equals_last_writer_wins(spark):
    """Invariant: the is_current slice of the SCD2 history must agree
    with a direct latest-row-per-key query over the same change log."""
    from news_clustering_and_summarization_spark.operators.temporal import (
        scd2_history,
    )
    from tests.conftest import SF_SMOKE

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    hist = scd2_history(
        ev, key="user_id", ts="ts", attrs=["event_type"],
        tiebreak="event_id",
    )
    current = {
        r["user_id"]: r["event_type"]
        for r in hist.where("is_current").collect()
    }
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    latest = {
        r["user_id"]: r["event_type"]
        for r in ev.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .collect()
    }
    assert current == latest


def test_time_weighted_avg_hand_case(spark):
    from datetime import datetime

    from news_clustering_and_summarization_spark.operators.temporal import (
        time_weighted_avg,
    )

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def at(s):
        return datetime(2024, 1, 1, 0, 0, s)

    rows = [
        # user 1: value 10 for 30s, then 20 for 10s -> (300+200)/40
        ("u1", t0, 10.0),
        ("u1", at(30), 20.0),
        ("u1", at(40), 99.0),   # last obs carries no duration
        # user 2: single observation -> NULL twa
        ("u2", t0, 5.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {
        r["user_id"]: r
        for r in time_weighted_avg(df, "user_id", "ts", "value").collect()
    }
    assert out["u1"]["span_seconds"] == 40
    assert out["u1"]["twa"] == 12.5
    assert out["u2"]["twa"] is None and out["u2"]["n_obs"] == 1


# --- ewma (round 6) --------------------------------------------------


def test_ewma_hand_computed(spark):
    from news_clustering_and_summarization_spark.operators.temporal import ewma

    rows = [
        (1, 1, 10.0),
        (1, 2, 20.0),
        (1, 3, 30.0),
        (2, 1, 5.0),
    ]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = {
        r["k"]: (r["n_obs"], r["ewma"])
        for r in ewma(df, "k", "t", "v", alpha_pct=30).collect()
    }
    # s1=10; s2=.3*20+.7*10=13; s3=.3*30+.7*13=18.1
    assert out[1][0] == 3 and abs(out[1][1] - 18.1) < 1e-6
    assert out[2] == (1, 5.0)


def test_ewma_order_by_time_not_input(spark):
    from news_clustering_and_summarization_spark.operators.temporal import ewma

    a = spark.createDataFrame(
        [(1, 2, 20.0), (1, 1, 10.0)], "k long, t long, v double"
    )
    b = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0)], "k long, t long, v double"
    ).repartition(5)
    ra = ewma(a, "k", "t", "v").first()
    rb = ewma(b, "k", "t", "v").first()
    assert ra["ewma_q"] == rb["ewma_q"]  # partition/input-order invariant
    assert abs(ra["ewma"] - 13.0) < 1e-6


def test_gap_fill_daily_linear_interpolation(spark):
    """Observed days 1/3/5 with 10.00/30.00/20.00: day 2 -> 20.00
    (midpoint), day 4 -> 25.00; endpoints never filled."""
    import datetime as dt

    from news_clustering_and_summarization_spark.operators.temporal import (
        gap_fill_daily,
    )

    rows = [
        (7, dt.datetime(2024, 3, 1, 9, 0), 10.0),
        (7, dt.datetime(2024, 3, 3, 9, 0), 30.0),
        (7, dt.datetime(2024, 3, 5, 9, 0), 20.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {r["day"]: r for r in gap_fill_daily(df).collect()}
    assert sorted(out) == [f"2024-03-0{i}" for i in range(1, 6)]
    assert [out[d]["v_cents"] for d in sorted(out)] == [
        1000, 2000, 3000, 2500, 2000
    ]
    assert [out[d]["filled"] for d in sorted(out)] == [
        False, True, False, True, False
    ]
    assert out["2024-03-02"]["n_events"] == 0


def test_gap_fill_daily_multiple_events_and_keys(spark):
    """Same-day events sum exactly; keys keep independent spines."""
    import datetime as dt

    from news_clustering_and_summarization_spark.operators.temporal import (
        gap_fill_daily,
    )

    rows = [
        (1, dt.datetime(2024, 3, 1, 1, 0), 1.25),
        (1, dt.datetime(2024, 3, 1, 2, 0), 2.50),
        (2, dt.datetime(2024, 3, 9, 1, 0), 5.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = gap_fill_daily(df).collect()
    assert len(out) == 2  # one day per key, no spine beyond extents
    by_key = {r["user_id"]: r for r in out}
    assert by_key[1]["v_cents"] == 375 and by_key[1]["n_events"] == 2
    assert by_key[2]["v_cents"] == 500 and not by_key[2]["filled"]


def test_last_touch_attribution_semantics(spark):
    """Latest touch wins, lookback gates, other users' touches never
    leak, conversions with no preceding touch emit NULLs, and a
    touch AFTER the conversion does not count."""
    import datetime as dt

    from news_clustering_and_summarization_spark.operators.temporal import (
        last_touch_attribution,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        # user 1: click, view, purchase -> credits the VIEW (latest)
        (1, at(0), 1, "click", 0.0, ""),
        (2, at(10), 1, "view", 0.0, ""),
        (3, at(20), 1, "purchase", 0.0, ""),
        # user 1: second purchase 2h later -> outside 1h lookback
        (4, at(7800), 1, "purchase", 0.0, ""),
        # user 2: purchase with NO touch before (touch comes after)
        (5, at(100), 2, "purchase", 0.0, ""),
        (6, at(200), 2, "click", 0.0, ""),
        # user 3: error events are not touches
        (7, at(0), 3, "error", 0.0, ""),
        (8, at(5), 3, "purchase", 0.0, ""),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = {
        r["conv_id"]: (r["touch_id"], r["gap_us"])
        for r in last_touch_attribution(ev).collect()
    }
    assert got[3] == (2, 10_000_000)
    assert got[4] == (None, None)     # view was 7790s ago > 1h
    assert got[5] == (None, None)
    assert got[8] == (None, None)


def test_last_touch_attribution_tie_and_sql_twin(spark):
    """Same-timestamp touch/conversion: tie breaks on event_id, so a
    touch with a smaller id at the identical ts IS credited (it
    sorts before the conversion). SQL twin agrees on a seeded
    stream."""
    import datetime as dt
    import hashlib

    import duckdb

    from news_clustering_and_summarization_spark.operators.temporal import (
        last_touch_attribution,
        last_touch_attribution_sql,
    )

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (10, t0, 1, "view", 0.0, ""),
            (11, t0, 1, "purchase", 0.0, ""),
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    rows = last_touch_attribution(ev).collect()
    assert (rows[0]["touch_id"], rows[0]["gap_us"]) == (10, 0)

    types = ["click", "view", "purchase", "error", "signup"]
    data = []
    for i in range(400):
        h = int(hashlib.md5(f"att|{i}".encode()).hexdigest()[:8], 16)
        data.append(
            (
                i,
                t0 + dt.timedelta(seconds=(h % 100_000)),
                h % 7,
                types[h % 5],
                0.0,
                "",
            )
        )
    df = spark.createDataFrame(
        data, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = sorted(
        tuple(r) for r in last_touch_attribution(df).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, "
        "user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany(
        "INSERT INTO events VALUES (?, ?, ?, ?, ?, ?)", data
    )
    want = sorted(
        tuple(r)
        for r in con.execute(last_touch_attribution_sql()).fetchall()
    )
    assert got == want


def test_cusum_closed_form_matches_recurrence(spark):
    """The window closed form must equal the sequential
    max(0, s + (x - mean)) recurrence, scaled by n; a level shift
    mid-series must raise the alarm while the flat head stays off."""
    import datetime as dt

    from news_clustering_and_summarization_spark.operators.temporal import (
        cusum_daily,
    )

    # 10 days at 1/day then 10 days at 21/day: mean 11, big shift
    t0 = dt.datetime(2024, 1, 1, 6, 0, 0)
    rows = []
    eid = 0
    for day in range(20):
        cnt = 1 if day < 10 else 21
        for _ in range(cnt):
            rows.append((eid, t0 + dt.timedelta(days=day), 7, "shift"))
            eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    got = cusum_daily(ev).collect()
    xs = [r["x"] for r in got]
    n, S = len(xs), sum(xs)
    s, expect = 0, []
    for x in xs:
        s = max(0, s + (n * x - S))  # scaled recurrence
        expect.append(s)
    assert [r["s_scaled"] for r in got] == expect
    assert not any(r["alarm"] for r in got[:10])
    assert got[-1]["alarm"]  # shifted tail accumulates


def test_cusum_zero_fills_missing_days(spark):
    """A series with an absent middle day gets an x=0 spine row."""
    import datetime as dt

    from news_clustering_and_summarization_spark.operators.temporal import (
        cusum_daily,
    )

    t0 = dt.datetime(2024, 3, 1)
    ev = spark.createDataFrame(
        [
            (1, t0, 1, "a"),
            (2, t0 + dt.timedelta(days=2), 1, "a"),
        ],
        ["event_id", "ts", "user_id", "event_type"],
    )
    got = cusum_daily(ev).collect()
    assert [(r["day"], r["x"]) for r in got] == [
        ("2024-03-01", 1),
        ("2024-03-02", 0),
        ("2024-03-03", 1),
    ]


def test_autocorr_known_series(spark):
    """A strictly alternating series has lag-1 r = -1 (quantized);
    constant series are filtered (zero variance); the SQL twin
    agrees on a seeded stream."""
    import datetime as dt
    import hashlib

    import duckdb

    from news_clustering_and_summarization_spark.operators.temporal import (
        autocorr_daily,
        autocorr_daily_sql,
    )

    t0 = dt.datetime(2024, 1, 1, 12)
    rows = []
    eid = 0
    for day in range(12):
        cnt = 5 if day % 2 == 0 else 1
        for _ in range(cnt):
            rows.append((eid, t0 + dt.timedelta(days=day), 1, "alt"))
            eid += 1
    for day in range(12):  # constant 2/day -> zero variance
        for _ in range(2):
            rows.append((eid, t0 + dt.timedelta(days=day), 1, "flat"))
            eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    got = {r["event_type"]: r for r in autocorr_daily(ev).collect()}
    assert set(got) == {"alt"}
    assert got["alt"]["r_q"] == -1_000_000

    data = []
    for i in range(500):
        h = int(hashlib.md5(f"ac|{i}".encode()).hexdigest()[:8], 16)
        data.append(
            (i, t0 + dt.timedelta(seconds=h % (86400 * 30)),
             h % 5, ["a", "b", "c"][h % 3], 0.0, "")
        )
    df = spark.createDataFrame(
        data, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = sorted(tuple(r) for r in autocorr_daily(df).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, "
        "user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?, ?)", data)
    want = sorted(
        tuple(r) for r in con.execute(autocorr_daily_sql()).fetchall()
    )
    assert got == want


def test_period_over_period_semantics(spark):
    """MoM and YoY percent changes from exact cents; an empty
    middle month zero-fills (NULL pct when base is 0); first month
    has NULL MoM; twin matches."""
    import datetime as dt

    import duckdb

    from news_clustering_and_summarization_spark.operators.temporal import (
        period_over_period,
        period_over_period_sql,
    )

    rows = []
    # key 'a': jan 100.00, feb 150.00, (mar missing), apr 75.00,
    # next-jan 200.00 (YoY +100% with yoy_lag=12)
    for m, v in [(1, 100.0), (2, 150.0), (4, 75.0)]:
        rows.append(("a", dt.datetime(2023, m, 15), v))
    rows.append(("a", dt.datetime(2024, 1, 15), 200.0))
    df = spark.createDataFrame(rows, ["k", "ts", "val"])
    got = {
        (r["k"], r["month"]): (
            r["v_cents"], r["mom_pct_q"], r["yoy_pct_q"]
        )
        for r in period_over_period(df, "k", "ts", "val").collect()
    }
    assert got[("a", "2023-01")] == (10000, None, None)
    assert got[("a", "2023-02")] == (15000, 500_000, None)
    assert got[("a", "2023-03")] == (0, -1_000_000, None)
    assert got[("a", "2023-04")][1] is None  # base month was 0
    assert got[("a", "2024-01")][2] == 1_000_000  # YoY vs 2023-01

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR, ts TIMESTAMP, val DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            period_over_period_sql("SELECT * FROM t", "k", "ts", "val")
        ).fetchall()
    )
    assert sorted(
        tuple(r)
        for r in period_over_period(df, "k", "ts", "val").collect()
    ) == want


def test_survival_curve_km_hand_case(spark):
    """Textbook KM: 5 users, second events at minutes 1,1,3; two
    users censored (never convert) with durations 2 and 4. Risk
    sets and per-step factors must match the hand computation, and
    censored users leave the risk set WITHOUT a survival drop."""
    import datetime as dt
    import math

    from news_clustering_and_summarization_spark.operators.temporal import (
        survival_curve,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    eid = 0

    def ev(u, minute):
        nonlocal eid
        rows.append((eid, t0 + dt.timedelta(minutes=minute), u, "e"))
        eid += 1

    # all users' first event at t0
    for u in range(1, 6):
        ev(u, 0)
    ev(1, 1)   # convert at 1
    ev(2, 1)   # convert at 1
    ev(3, 3)   # convert at 3
    # users 4,5 never convert; horizon = max ts = minute 4
    ev(9, 2)   # another user's FIRST event at minute 2 (horizon pad)
    ev(9, 4)   # user 9 converts at 2 -> also in the curve
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    got = {
        r["t_min"]: r for r in survival_curve(df).collect()
    }
    # durations: u1:1 u2:1 u3:3 u9:2 converted; u4,u5 censored at 4
    assert got[1]["n_risk"] == 6 and got[1]["d_events"] == 2
    assert got[2]["n_risk"] == 4 and got[2]["d_events"] == 1
    assert got[3]["n_risk"] == 3 and got[3]["d_events"] == 1
    assert got[4]["c_censored"] == 2 and got[4]["d_events"] == 0
    # S(3) = (1-2/6)(1-1/4)(1-1/3) = 1/3; log terms quantized per step
    expect = (
        round(math.log(1 - 2 / 6) * 1e9)
        + round(math.log(1 - 1 / 4) * 1e9)
        + round(math.log(1 - 1 / 3) * 1e9)
    )
    assert got[3]["log_surv_q"] == expect
    # censored-only row carries the previous cumulative value
    assert got[4]["log_surv_q"] == expect


def test_survival_curve_absorption_null(spark):
    """When every remaining at-risk user converts at the final
    time, S hits 0: log_surv_q is NULL from that row on (never
    ln(0))."""
    import datetime as dt

    from news_clustering_and_summarization_spark.operators.temporal import (
        survival_curve,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "e"),
        (2, t0 + dt.timedelta(minutes=1), 1, "e"),
        (3, t0, 2, "e"),
        (4, t0 + dt.timedelta(minutes=1), 2, "e"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    got = survival_curve(df).collect()
    assert len(got) == 1
    assert got[0]["d_events"] == 2 and got[0]["n_risk"] == 2
    assert got[0]["log_surv_q"] is None


def test_weekday_profile_partial_week_expectation(spark):
    """A 10-day span has 2 of three weekdays and 1 of the rest —
    the expectation must use those counts, not total/7. A series
    concentrated on one weekday flags a large chi2 there; twin
    matches."""
    import datetime as dt

    import duckdb

    from news_clustering_and_summarization_spark.operators.temporal import (
        weekday_profile,
        weekday_profile_sql,
    )

    # Mon 2024-01-01 .. Wed 2024-01-10: Mon,Tue,Wed x2; Thu..Sun x1
    t0 = dt.datetime(2024, 1, 1, 10)
    rows = []
    eid = 0
    for day in range(10):
        n = 10 if (t0 + dt.timedelta(days=day)).weekday() == 0 else 1
        for _ in range(n):
            rows.append((eid, t0 + dt.timedelta(days=day), 1, "mon_heavy"))
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    got = {r["dow"]: r for r in weekday_profile(df).collect()}
    assert len(got) == 7
    # Spark dayofweek: Monday = 2; two Mondays in span, 20 obs
    total = sum(r["n_obs"] for r in got.values())
    assert got[2]["n_obs"] == 20
    assert got[2]["expected_q"] == round(total * 2 / 10 * 1e6)
    assert got[2]["chi2_q"] > max(
        r["chi2_q"] for d, r in got.items() if d != 2
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, "
        "user_id BIGINT, event_type VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(weekday_profile_sql()).fetchall()
    )
    assert sorted(
        tuple(r) for r in weekday_profile(df).collect()
    ) == want


def test_sax_daily_hand_case(spark):
    """A symmetric low-high series maps to the expected quartile
    symbols; a constant series (zero variance) is all-'b'; a gap day
    zero-fills into the alphabet."""
    from news_clustering_and_summarization_spark.operators.temporal import (
        sax_daily,
    )

    rows = []
    # series A: counts 1,1,5,5 over 4 days -> z = ±1 -> a,a,d,d
    for day, n in [(1, 1), (2, 1), (3, 5), (4, 5)]:
        rows += [("A", f"2024-02-0{day}T00:00:00")] * n
    # series B: constant 2/day -> z=0 -> all 'c' (half-open regions)
    for day in (1, 2, 3):
        rows += [("B", f"2024-02-0{day}T00:00:00")] * 2
    # series C: day 2 missing entirely -> zero-filled into the string
    rows += [("C", "2024-02-01T00:00:00")] * 4
    rows += [("C", "2024-02-03T00:00:00")] * 4
    df = spark.createDataFrame(
        rows, "event_type string, ts string"
    ).selectExpr("event_type", "cast(ts as timestamp) AS ts")
    got = {r["event_type"]: r for r in sax_daily(df).collect()}
    assert got["A"]["sax"] == "aadd" and got["A"]["n_days"] == 4
    assert got["B"]["sax"] == "ccc"
    assert got["C"]["sax"] == "dad"  # 4,0,4 -> high,low,high


def test_sax_daily_sql_twin(spark):
    import duckdb
    import hashlib

    from news_clustering_and_summarization_spark.operators.temporal import (
        sax_daily,
        sax_daily_sql,
    )

    rows = []
    for i in range(600):
        h = hashlib.md5(f"sax|{i}".encode()).hexdigest()
        day = int(h[:2], 16) % 20 + 1
        g = f"t{int(h[2:4], 16) % 3}"
        rows.append((g, f"2024-03-{day:02d}T12:00:00"))
    df = spark.createDataFrame(
        rows, "event_type string, ts string"
    ).selectExpr("event_type", "cast(ts as timestamp) AS ts")
    got = sorted(tuple(r) for r in sax_daily(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_type VARCHAR, ts TIMESTAMP)")
    con.executemany(
        "INSERT INTO events VALUES (?, ?)",
        [(g, t.replace("T", " ")) for g, t in rows],
    )
    want = sorted(
        tuple(r) for r in con.execute(sax_daily_sql("events")).fetchall()
    )
    assert got == want


def test_mann_kendall_hand_cases(spark):
    """Strictly increasing series: S = C(n,2), large positive z;
    constant series: S = 0 and Var degenerates to 0 via the tie
    term (all days one tie group); textbook S check on a mixed
    series."""
    import math

    from news_clustering_and_summarization_spark.operators.temporal import (
        mann_kendall_daily,
    )

    rows = []
    # U: 1,2,3,4,5 per day -> strictly up
    for day in range(1, 6):
        rows += [("U", f"2024-04-0{day}T00:00:00")] * day
    # K: constant 3/day
    for day in range(1, 6):
        rows += [("K", f"2024-04-0{day}T00:00:00")] * 3
    # M: 2,1,2 -> pairs (2,1):-1 (2,2):0 (1,2):+1 -> S=0
    for day, n in [(1, 2), (2, 1), (3, 2)]:
        rows += [("M", f"2024-04-0{day}T00:00:00")] * n
    df = spark.createDataFrame(
        rows, "event_type string, ts string"
    ).selectExpr("event_type", "cast(ts as timestamp) AS ts")
    got = {r["event_type"]: r for r in mann_kendall_daily(df).collect()}
    u = got["U"]
    assert u["s_stat"] == 10  # C(5,2), no ties
    assert u["var_s_x18"] == 5 * 4 * 15  # no tie correction
    expect_z = (10 - 1) / math.sqrt(5 * 4 * 15 / 18)
    assert abs(u["z_q"] / 1e6 - expect_z) < 1e-5
    k = got["K"]
    assert k["s_stat"] == 0 and k["var_s_x18"] == 0 and k["z_q"] == 0
    assert got["M"]["s_stat"] == 0


def test_mann_kendall_sql_twin(spark):
    import duckdb
    import hashlib

    from news_clustering_and_summarization_spark.operators.temporal import (
        mann_kendall_daily,
        mann_kendall_daily_sql,
    )

    rows = []
    for i in range(500):
        h = hashlib.md5(f"mk|{i}".encode()).hexdigest()
        day = int(h[:2], 16) % 25 + 1
        g = f"t{int(h[2:4], 16) % 3}"
        rows.append((g, f"2024-05-{day:02d}T12:00:00"))
    df = spark.createDataFrame(
        rows, "event_type string, ts string"
    ).selectExpr("event_type", "cast(ts as timestamp) AS ts")
    got = sorted(tuple(r) for r in mann_kendall_daily(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_type VARCHAR, ts TIMESTAMP)")
    con.executemany(
        "INSERT INTO events VALUES (?, ?)",
        [(g, t.replace("T", " ")) for g, t in rows],
    )
    want = sorted(
        tuple(r)
        for r in con.execute(mann_kendall_daily_sql("events")).fetchall()
    )
    assert got == want


def test_theil_sen_hand_cases_and_twin(spark):
    """Clean +2/day slope recovered exactly; a falling series yields
    the negative quantized slope (signed integer division truncates
    identically on both engines); random twin bit-match."""
    import duckdb
    import hashlib

    from news_clustering_and_summarization_spark.operators.temporal import (
        theil_sen_daily,
        theil_sen_daily_sql,
    )

    rows = []
    # U: 1,3,5,7 -> every pair slope exactly +2/day
    for day, n in [(1, 1), (2, 3), (3, 5), (4, 7)]:
        rows += [("U", f"2024-06-0{day}T00:00:00")] * n
    # D: 7,1 over 3 days (gap zero-fills day 2) -> slopes
    # (0-7)/1=-7, (1-0)/1=+1, (1-7)/2=-3 -> lower median -3
    rows += [("D", "2024-06-01T00:00:00")] * 7
    rows += [("D", "2024-06-03T00:00:00")] * 1
    df = spark.createDataFrame(
        rows, "event_type string, ts string"
    ).selectExpr("event_type", "cast(ts as timestamp) AS ts")
    got = {r["event_type"]: r for r in theil_sen_daily(df).collect()}
    assert got["U"]["slope_q"] == 2_000_000 and got["U"]["n_pairs"] == 6
    assert got["D"]["slope_q"] == -3_000_000 and got["D"]["n_pairs"] == 3

    rows = []
    for i in range(500):
        h = hashlib.md5(f"tsn|{i}".encode()).hexdigest()
        day = int(h[:2], 16) % 25 + 1
        g = f"t{int(h[2:4], 16) % 3}"
        rows.append((g, f"2024-07-{day:02d}T12:00:00"))
    df = spark.createDataFrame(
        rows, "event_type string, ts string"
    ).selectExpr("event_type", "cast(ts as timestamp) AS ts")
    got = sorted(tuple(r) for r in theil_sen_daily(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_type VARCHAR, ts TIMESTAMP)")
    con.executemany(
        "INSERT INTO events VALUES (?, ?)",
        [(g, t.replace("T", " ")) for g, t in rows],
    )
    want = sorted(
        tuple(r)
        for r in con.execute(theil_sen_daily_sql("events")).fetchall()
    )
    assert got == want


def test_changepoint_binseg_hand_case(spark):
    """Level shift 2->8 between Jan 3 and Jan 4 must be found at
    t_star = Jan 3 (last day of the left segment) with exact segment
    means; a one-day series degenerates to NULLs."""
    import datetime as dt

    from news_clustering_and_summarization_spark.operators.temporal import (
        changepoint_binseg_daily,
    )

    rows = []
    eid = 0
    for day, n in [(1, 2), (2, 2), (3, 2), (4, 8), (5, 8), (6, 8)]:
        for _ in range(n):
            rows.append(
                (eid, dt.datetime(2024, 1, day, 12, 0), "shift", 0.0)
            )
            eid += 1
    rows.append((eid, dt.datetime(2024, 3, 1, 0, 0), "single", 0.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = {r["g"]: r for r in changepoint_binseg_daily(df).collect()}
    s = out["shift"]
    assert s["t_star"] == "2024-01-03"
    assert s["mean_before_q"] == 2_000_000
    assert s["mean_after_q"] == 8_000_000
    # D_3 = |6*6 - 3*30| = 54
    assert s["d_max"] == 54
    one = out["single"]
    assert one["t_star"] is None and one["d_max"] is None
