"""Physical-plan regression tests: the scale properties SCALE.md
claims (pushdown, broadcast, single-Exchange windows, no cartesian)
are asserted here so a future edit can't silently regress them.
tools/explain_audit.py sweeps every query; these pin the flagship
plans precisely."""

from __future__ import annotations

import re

from news_clustering_and_summarization_spark.plans import catalog
from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    # default truncates FileScan metadata (PushedFilters/ReadSchema)
    # at 100 chars — widen so assertions see the full scan line
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    df = catalog.QUERIES[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushes_filter_and_prunes(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [" in plan
    assert re.search(r"PushedFilters: \[[^\]]*l_shipdate", plan), plan
    # projection pruned: the scan must not read all 16 lineitem cols
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and len(m.group(1).split(",")) <= 8, m and m.group(1)


def test_top_customers_broadcasts_the_dim(spark):
    plan = _plan(spark, "top_customers")
    assert "BroadcastHashJoin" in plan, plan


def test_window_queries_have_single_exchange(spark):
    for name in ("lag_lead_delta", "running_total", "range_frame_window"):
        plan = _plan(spark, name)
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges == 1, (name, n_exchanges)
        assert "SinglePartition" not in plan, name


def test_distinct_agg_partials_before_shuffle(spark):
    plan = _plan(spark, "distinct_agg")
    assert "Expand" in plan
    # partial aggregate must appear below the first exchange:
    # the plan string lists operators top-down, so the LAST
    # HashAggregate (deepest) must come after the LAST Exchange
    assert plan.rfind("HashAggregate") > plan.rfind("Exchange"), plan


def test_no_cartesian_in_relational_queries(spark):
    for name in ("regional_revenue", "skew_join", "asof_join", "range_join"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_decontaminate_broadcasts_benchmark_grams(spark):
    plan = _plan(spark, "decontaminate")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_chunk_documents_is_shuffle_free(spark):
    plan = _plan(spark, "chunk_documents")
    assert "Exchange" not in plan, plan
    assert "Generate explode" in plan or "Generate posexplode" in plan, plan


def test_pack_sequences_partitions_by_shard(spark):
    plan = _plan(spark, "pack_sequences")
    # windowed per lang shard: exactly one hash exchange, never a
    # global single-partition sort
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SinglePartition" not in plan, plan


def test_runtime_bloom_filter_prunes_fact_side(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from news_clustering_and_summarization_spark.session import (
        enable_runtime_filters,
    )

    enable_runtime_filters(spark, force_for_small_scans=True)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").where(
            "o_orderpriority = '1-URGENT'"
        )
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )


# --- round-6 batch 5 -------------------------------------------------


def test_interleave_schedule_wfq_order(spark):
    from news_clustering_and_summarization_spark.plans.catalog import (
        WFQ_SCALE,
    )

    # WFQ math on a hand fixture: w = sqrt(cnt)*1000, vt=(2k+1)/(2w)
    # source A cnt=4 -> w=2000; B cnt=1 -> w=1000
    # A: 250000, 750000, 1250000, 1750000; B: 500000 (at 1e9 scale //)
    assert ((2 * 0 + 1) * WFQ_SCALE) // (2 * 2000) == 250_000
    assert ((2 * 0 + 1) * WFQ_SCALE) // (2 * 1000) == 500_000
    assert ((2 * 1 + 1) * WFQ_SCALE) // (2 * 2000) == 750_000


def test_interleave_schedule_proportional(spark):
    from news_clustering_and_summarization_spark.plans import catalog
    from tests.conftest import SF_SMOKE

    rows = catalog.QUERIES["interleave_schedule"](spark, SF_SMOKE).collect()
    assert len(rows) == 200
    vts = [r["vt_q"] for r in rows]
    assert vts == sorted(vts)  # schedule is vt-ordered
    # within any source, arrival order k is respected
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["k"])
    for ks in by_src.values():
        assert ks == sorted(ks)


def test_tokenizer_fertility_contract(spark):
    from news_clustering_and_summarization_spark.plans import catalog
    from tests.conftest import SF_SMOKE

    rows = catalog.QUERIES["tokenizer_fertility"](spark, SF_SMOKE).collect()
    assert len(rows) >= 2  # multiple languages present
    for r in rows:
        # with 3 merges, encoding can never yield fewer symbols than
        # words nor more than characters; fertility matches the ratio
        assert r["syms"] >= r["words"] > 0
        assert abs(r["fertility"] - r["syms"] / r["words"]) < 1e-5


def test_ccnet_mix_bucket_contract(spark):
    """Per-lang terciles: head best_avg_q >= middle >= tail, sizes
    within 1 of each other, all scorable docs accounted for."""
    from news_clustering_and_summarization_spark.plans.catalog import QUERIES

    rows = QUERIES["ccnet_mix"](spark, "/root/testdata/sf0.001").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    for lang, b in by_lang.items():
        assert set(b) == {"head", "middle", "tail"}
        assert (
            b["head"]["worst_avg_q"]
            >= b["middle"]["best_avg_q"]
            >= b["middle"]["worst_avg_q"]
            >= b["tail"]["best_avg_q"]
        )
        sizes = [b[k]["n_docs"] for k in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1


def test_cohort_ltv_hand_case(spark):
    """Two cohorts: week-0 revenue then week-1 revenue accumulate;
    a user's later events land in their FIRST-SEEN cohort; oracle
    agrees."""
    import datetime as dt

    import duckdb

    from news_clustering_and_summarization_spark.plans.catalog import (
        ORACLE_COHORT_LTV,
        q_cohort_ltv,
    )

    # Monday 2024-01-01 anchors cohort A; Monday 2024-01-08 cohort B
    rows = [
        (1, dt.datetime(2024, 1, 2, 10), 1, "e", 10.0, ""),   # A wk0
        (2, dt.datetime(2024, 1, 9, 10), 1, "e", 5.0, ""),    # A wk1
        (3, dt.datetime(2024, 1, 10, 10), 2, "e", 7.0, ""),   # B wk0
    ]
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df = spark.createDataFrame(
            rows,
            ["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        df.write.parquet(os.path.join(td, "events.parquet"))
        # the catalog loader reads {sf}/events.parquet
        got = sorted(
            tuple(r) for r in q_cohort_ltv(spark, td).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"'{os.path.join(td, 'events.parquet')}/*.parquet'"
        )
        want = sorted(
            tuple(r) for r in con.execute(ORACLE_COHORT_LTV).fetchall()
        )
    assert got == want
    assert got == [
        ("2024-01-01", 0, 1000, 1000),
        ("2024-01-01", 1, 500, 1500),
        ("2024-01-08", 0, 700, 700),
    ]


def test_top_paths_ordering_and_session_break(spark):
    """Events within one session join in (ts, id) order; a >30-min
    gap starts a new path; ties at one timestamp order by id."""
    import datetime as dt
    import os
    import tempfile

    from news_clustering_and_summarization_spark.plans.catalog import (
        q_top_paths,
    )

    t0 = dt.datetime(2024, 1, 1, 9)
    rows = [
        (1, t0, 7, "view", 0.0, ""),
        (2, t0, 7, "click", 0.0, ""),                      # same ts, id order
        (3, t0 + dt.timedelta(minutes=5), 7, "purchase", 0.0, ""),
        (4, t0 + dt.timedelta(hours=2), 7, "view", 0.0, ""),  # new session
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows,
            ["event_id", "ts", "user_id", "event_type", "value", "props"],
        ).write.parquet(os.path.join(td, "events.parquet"))
        got = {
            r["path"]: r["n_sessions"]
            for r in q_top_paths(spark, td).collect()
        }
    assert got == {"view>click>purchase": 1, "view": 1}


def _write_events(spark, td, rows):
    import os

    spark.createDataFrame(
        rows,
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).write.parquet(os.path.join(td, "events.parquet"))


def test_rolling_median_window_semantics(spark):
    """First rows see growing windows (n_window = day index + 1);
    the lower median of an even window picks the lower middle; the
    envelope brackets x."""
    import datetime as dt
    import tempfile

    from news_clustering_and_summarization_spark.plans.catalog import (
        q_rolling_median,
    )

    t0 = dt.datetime(2024, 2, 1, 8)
    counts = [5, 1, 9, 3, 7, 2, 8, 4]
    rows = []
    eid = 0
    for day, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, t0 + dt.timedelta(days=day), 1, "e", 0.0, ""))
            eid += 1
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, td, rows)
        got = q_rolling_median(spark, td).collect()
    assert [r["n_window"] for r in got] == [1, 2, 3, 4, 5, 6, 7, 7]
    # day 2 window [5,1] sorted [1,5]: lower median 1
    assert got[1]["roll_median"] == 1
    # day 8 window = counts[1:8] sorted [1,2,3,4,7,8,9] -> 4
    assert got[7]["roll_median"] == 4
    assert all(r["roll_min"] <= r["x"] <= r["roll_max"] for r in got)


def test_seasonal_residuals_weekday_aware(spark):
    """A series that is ALWAYS high on Mondays must give Monday z
    near 0 (it's the seasonal norm) while a one-off weekday spike
    scores high — exactly what a seasonal-blind detector gets
    wrong."""
    import datetime as dt
    import tempfile

    from news_clustering_and_summarization_spark.plans.catalog import (
        q_seasonal_residuals,
    )

    t0 = dt.datetime(2024, 1, 1, 8)  # a Monday
    rows = []
    eid = 0
    for day in range(28):
        date = t0 + dt.timedelta(days=day)
        c = 20 if date.weekday() == 0 else 5
        if day == 9:          # one Wednesday spikes to 19
            c = 19
        for _ in range(c):
            rows.append((eid, date, 1, "e", 0.0, ""))
            eid += 1
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, td, rows)
        got = {r["day"]: r for r in q_seasonal_residuals(spark, td).collect()}
    # Mondays: all equal 20 -> zero variance -> GATED (absent)
    assert "2024-01-01" not in got
    # every constant weekday (Tue..Sun all 5s) is variance-gated too
    assert "2024-01-09" not in got
    # only Wednesdays (5,5,19,5) survive: mean 8.5, sd 7 ->
    # the spike scores exactly +1.5, the normal ones exactly -0.5
    assert got["2024-01-10"]["z_q"] == 1_500_000
    assert got["2024-01-03"]["z_q"] == -500_000


def test_load_metadata_cache_identical_frames(spark):
    """r12: the session-scoped table-metadata cache must change
    nothing observable — identical schema and rows on a cache hit
    (including the events ts special case), and widen()'s cached
    partition probe must equal the direct .rdd probe."""
    from news_clustering_and_summarization_spark.plans import (
        catalog_shared as CS,
    )

    CS._META_CACHE.clear()
    first = CS.load(spark, SF_SMOKE, "events")
    hit = CS.load(spark, SF_SMOKE, "events")
    assert hit.schema == first.schema
    assert dict(hit.dtypes)["ts"] == "timestamp"
    assert sorted(map(tuple, hit.collect())) == sorted(
        map(tuple, first.collect())
    )
    docs = CS.load(spark, SF_SMOKE, "documents")
    direct = docs.rdd.getNumPartitions()
    CS.widen(spark, docs)  # fills the probe cache
    key = (spark.sparkContext.applicationId, SF_SMOKE, "documents")
    assert CS._META_CACHE[key]["scan_partitions"] == direct
    # widened output parallelism respects the gate either way
    w = CS.widen(spark, CS.load(spark, SF_SMOKE, "documents"))
    assert w.rdd.getNumPartitions() >= min(
        spark.sparkContext.defaultParallelism, direct
    )
