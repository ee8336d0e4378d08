"""Count-min sketch (operators/frequent.py): no-underestimate
guarantee, exactness at wide widths, merge == rebuild, collision
behavior at tiny widths, and sketch size bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators.frequent import (
    cms_build,
    cms_estimate,
    cms_merge,
)


@pytest.fixture(scope="module")
def instances(spark):
    # token i appears i times, i = 1..12
    rows = [(f"tok{i:02d}",) for i in range(1, 13) for _ in range(i)]
    return spark.createDataFrame(rows, "token string")


def _est(spark, instances, width):
    sketch = cms_build(instances, "token", width)
    q = instances.select("token").distinct()
    return {
        r["token"]: r["cms_estimate"]
        for r in cms_estimate(q, "token", sketch, width).collect()
    }


def test_never_underestimates(spark, instances):
    for width in (4, 64, 4096):
        est = _est(spark, instances, width)
        for i in range(1, 13):
            assert est[f"tok{i:02d}"] >= i, (width, i, est)


def test_exact_when_wide(spark, instances):
    # 12 tokens in 4096 buckets x 3 independent rows: a 3-way
    # simultaneous collision for any token is (12/4096)^3-improbable,
    # and the fixture hashes are deterministic — pin exactness
    est = _est(spark, instances, 4096)
    assert est == {f"tok{i:02d}": i for i in range(1, 13)}


def test_tiny_width_overestimates_but_bounded(spark, instances):
    est = _est(spark, instances, 4)
    n_total = sum(range(1, 13))
    for i in range(1, 13):
        # worst case: everything lands in one bucket
        assert i <= est[f"tok{i:02d}"] <= n_total


def test_merge_equals_rebuild(spark, instances):
    a = instances.where(F.col("token") <= "tok06")
    b = instances.where(F.col("token") > "tok06")
    merged = cms_merge(
        cms_build(a, "token", 64), cms_build(b, "token", 64)
    )
    direct = cms_build(instances, "token", 64)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_sketch_size_bounded(spark, instances):
    sketch = cms_build(instances, "token", 16)
    assert sketch.count() <= 3 * 16
    # cells sum to d * n_instances
    total = sketch.agg(F.sum("cnt")).collect()[0][0]
    assert total == 3 * instances.count()


def test_unseen_token_estimates_from_sketch(spark, instances):
    sketch = cms_build(instances, "token", 4096)
    q = spark.createDataFrame([("never-seen-token",)], "token string")
    est = cms_estimate(q, "token", sketch, 4096).collect()[0]
    # may collide to a positive count but must exist and be >= 0
    assert est["cms_estimate"] >= 0


def test_basket_pairs_hand_case(spark):
    from news_clustering_and_summarization_spark.operators.frequent import (
        basket_pairs,
    )

    rows = [
        (1, "bread"), (1, "butter"),
        (2, "bread"), (2, "butter"),
        (3, "bread"), (3, "milk"),
        (4, "milk"),
        (4, "milk"),  # duplicate item in a basket counts once
    ]
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = {
        (r["ant"], r["cons"]): r
        for r in basket_pairs(df, "basket", "item", min_support=2).collect()
    }
    r = out[("bread", "butter")]
    # supp(bread)=3, supp(butter)=2, pair=2, N=4
    assert r["pair_support"] == 2
    assert r["confidence"] == 0.666667
    assert r["lift"] == 1.333333
    # symmetric direction has different confidence
    assert out[("butter", "bread")]["confidence"] == 1.0
    assert ("bread", "milk") not in out  # support 1 pruned


def test_agms_f2_exact_leg_and_estimator_band(spark):
    """F2 of {a:4, b:2, c:1} is 21 exactly; the deterministic
    md5-sign sketch must land within the documented
    median-of-means band on a larger skewed stream."""
    from news_clustering_and_summarization_spark.operators.frequent import (
        agms_f2,
    )

    small = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] * 2 + [("c",)], ["k"]
    )
    r = agms_f2(small, "k").first()
    assert r["n_rows"] == 7 and r["f2_exact"] == 21
    # skewed stream: one hot key + uniform tail
    rows = [("hot",)] * 200 + [(f"k{i}",) for i in range(400)]
    big = agms_f2(spark.createDataFrame(rows, ["k"]), "k").first()
    assert big["f2_exact"] == 200 * 200 + 400
    # median-of-7-means keeps the estimate inside ~2 std
    # (std/F2 ~ sqrt(2/5)/sqrt(7) ~ 0.24); deterministic here
    assert big["rel_err_q"] < 600_000
    assert big["f2_est"] > 0


def test_sequence_pair_support_hand_case(spark):
    """u1: A,B,A — supports A->B AND B->A (first(A)<last(B),
    first(B)<last(A)); u2: B,A — supports only B->A; a user with a
    single type supports nothing."""
    import datetime as dt

    from news_clustering_and_summarization_spark.operators.frequent import (
        sequence_pair_support,
    )

    t0 = dt.datetime(2024, 1, 1)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        (1, at(0), 1, "A"),
        (2, at(1), 1, "B"),
        (3, at(2), 1, "A"),
        (4, at(0), 2, "B"),
        (5, at(1), 2, "A"),
        (6, at(0), 3, "A"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    got = {
        (r["a"], r["b"]): r["support"]
        for r in sequence_pair_support(ev).collect()
    }
    assert got == {("A", "B"): 1, ("B", "A"): 2}


def test_sequence_pair_support_same_ts_and_sql_twin(spark):
    """Events at the SAME timestamp order by event_id (strict '<'
    on the padded key): A(id 1) then B(id 2) at t0 counts as
    A-before-B but not B-before-A. SQL twin agrees on a seeded
    stream."""
    import datetime as dt
    import hashlib

    import duckdb

    from news_clustering_and_summarization_spark.operators.frequent import (
        sequence_pair_support,
        sequence_pair_support_sql,
    )

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, t0, 1, "A"), (2, t0, 1, "B")],
        ["event_id", "ts", "user_id", "event_type"],
    )
    got = {
        (r["a"], r["b"]): r["support"]
        for r in sequence_pair_support(ev).collect()
    }
    assert got == {("A", "B"): 1}

    types = ["A", "B", "C", "D"]
    data = []
    for i in range(300):
        h = int(hashlib.md5(f"sq|{i}".encode()).hexdigest()[:8], 16)
        data.append(
            (i, t0 + dt.timedelta(seconds=h % 5000), h % 11,
             types[h % 4], 0.0, "")
        )
    df = spark.createDataFrame(
        data, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = sorted(
        tuple(r) for r in sequence_pair_support(df, min_support=2).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, "
        "user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?, ?)", data)
    want = sorted(
        tuple(r)
        for r in con.execute(
            sequence_pair_support_sql(min_support=2)
        ).fetchall()
    )
    assert got == want
