"""HyperLogLog register sketch (operators/cardinality.py): merge must
equal a one-shot build (decomposable-state contract), estimates must
land inside the documented error envelope on both the linear-counting
and harmonic branches, and the build plan must shuffle registers, not
values."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.functions import hashing as H
from news_clustering_and_summarization_spark.operators.cardinality import (
    hll_build,
    hll_estimate,
    hll_merge,
)
from news_clustering_and_summarization_spark.plans.catalog import load
from tests.conftest import SF_SMOKE

M = 1024


def _values(spark, n, prefix="v"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id")).alias("val")
    )


def test_linear_counting_branch_small_cardinality(spark):
    # 200 distinct << 2.5*m with empty registers -> m*ln(m/V) branch
    est = hll_estimate(hll_build(_values(spark, 200), "val", M), M).first()
    assert abs(est["hll_estimate"] - 200) <= 0.10 * 200


def test_harmonic_branch_large_cardinality(spark):
    # 20k distinct >> 2.5*m -> raw harmonic-mean branch; sigma ~ 3.3%
    est = hll_estimate(
        hll_build(_values(spark, 20_000), "val", M), M
    ).first()
    assert abs(est["hll_estimate"] - 20_000) <= 0.15 * 20_000


def test_duplicates_do_not_inflate(spark):
    vals = _values(spark, 500)
    dup = vals.unionAll(vals).unionAll(vals)
    a = hll_estimate(hll_build(vals, "val", M), M).first()["hll_estimate"]
    b = hll_estimate(hll_build(dup, "val", M), M).first()["hll_estimate"]
    assert a == b


def test_merge_equals_one_shot_build(spark):
    x = _values(spark, 700, "x")
    y = _values(spark, 900, "y")
    merged = hll_merge(hll_build(x, "val", M), hll_build(y, "val", M))
    one_shot = hll_build(x.unionAll(y), "val", M)
    assert (
        sorted(merged.collect()) == sorted(one_shot.collect())
    ), "register-wise max must equal building over the union"


def test_grouped_registers_bounded_by_m(spark):
    docs = load(spark, SF_SMOKE, "documents")
    sh = docs.select(
        "lang",
        F.explode(H.word_shingles(H.tokens(F.col("text")), 3)).alias("sh"),
    )
    regs = hll_build(sh, "sh", M, ["lang"])
    per_group = regs.groupBy("lang").count().collect()
    assert per_group and all(r["count"] <= M for r in per_group)


def test_build_plan_shuffles_registers_not_values(spark):
    # exactly one exchange (the register groupBy); partial aggregation
    # means the map side combines before it
    plan = hll_build(
        _values(spark, 1000), "val", M
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial_max" in plan.lower() or "HashAggregate" in plan, plan


def test_merge_associativity_random_splits(spark):
    # property: ANY 3-way split merged in any order equals one shot
    from news_clustering_and_summarization_spark.operators.cardinality import (
        hll_build,
        hll_merge,
    )
    from pyspark.sql import functions as F

    full = spark.range(3000).select(
        F.concat(F.lit("k"), F.col("id")).alias("val")
    )
    parts = [
        full.where(F.col("val").substr(2, 10).cast("long") % 3 == i)
        for i in range(3)
    ]
    built = [hll_build(p, "val", 256) for p in parts]
    merged_lr = hll_merge(hll_merge(built[0], built[1]), built[2])
    merged_rl = hll_merge(built[0], hll_merge(built[1], built[2]))
    one_shot = hll_build(full, "val", 256)
    a = sorted(map(tuple, merged_lr.collect()))
    assert a == sorted(map(tuple, merged_rl.collect()))
    assert a == sorted(map(tuple, one_shot.collect()))


def test_kmv_distinct_small_and_estimate_band(spark):
    """Fewer distincts than k: the sketch holds them all and the
    estimator is irrelevant (k_used == exact). Many distincts: the
    estimate lands inside the ~3/sqrt(k) relative-error band, and
    rel_err_q self-reports the same error."""
    from news_clustering_and_summarization_spark.operators.cardinality import (
        kmv_distinct,
    )

    small = spark.createDataFrame(
        [(i % 10,) for i in range(100)], ["v"]
    )
    r = kmv_distinct(small, "v", k=256).collect()[0]
    assert r["k_used"] == 10 and r["exact"] == 10

    big = spark.createDataFrame([(i,) for i in range(20_000)], ["v"])
    r = kmv_distinct(big, "v", k=256).collect()[0]
    assert r["exact"] == 20_000 and r["k_used"] == 256
    rel = abs(r["est"] - 20_000) / 20_000
    assert rel < 3 / (256 ** 0.5)
    assert r["rel_err_q"] == int(rel * 1e6 + 0.5)


def test_kmv_distinct_sql_twin(spark):
    import duckdb

    from news_clustering_and_summarization_spark.operators.cardinality import (
        kmv_distinct,
        kmv_distinct_sql,
    )

    df = spark.createDataFrame(
        [(i * 7 % 997,) for i in range(5000)], ["v"]
    )
    got = tuple(kmv_distinct(df, "v", k=64).collect()[0])
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT (i * 7) % 997 AS v "
        "FROM range(5000) r(i)"
    )
    want = tuple(
        con.execute(kmv_distinct_sql("t", "v", k=64)).fetchall()[0]
    )
    assert got == want


def test_count_col_and_extra_aggs_single_pipeline(spark):
    """r12: hll_build(count_col=...) over a distinct value set +
    hll_estimate(extra_aggs=[sum(count_col)]) must reproduce BOTH the
    exact distinct count and the identical estimate of the join-based
    two-pass formulation."""
    from pyspark.sql import functions as F

    from news_clustering_and_summarization_spark.operators.cardinality import (
        hll_build,
        hll_estimate,
    )

    rows = [("en", f"w{i % 700}") for i in range(5000)] + [
        ("fr", f"w{i % 41}") for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["lang", "v"])
    dis = df.distinct()
    fused = hll_estimate(
        hll_build(dis, "v", 256, ["lang"], count_col="_n"),
        256,
        ["lang"],
        extra_aggs=[F.sum("_n").alias("exact_distinct")],
    )
    got = {
        r["lang"]: (r["exact_distinct"], r["hll_estimate"])
        for r in fused.collect()
    }
    # exact legs
    assert got["en"][0] == 700 and got["fr"][0] == 41
    # estimate identical to the plain (no-extras) path
    plain = {
        r["lang"]: r["hll_estimate"]
        for r in hll_estimate(
            hll_build(df, "v", 256, ["lang"]), 256, ["lang"]
        ).collect()
    }
    assert got["en"][1] == plain["en"] and got["fr"][1] == plain["fr"]
