"""Statistical-audit operators (r09 batch 3): Spearman rank
correlation, Benjamini-Hochberg FDR, split-conformal bound, fairness
audit. The catalog queries run these on null synthetic data (no
group effects — correct but branch-poor), so these tests plant real
effects to exercise the discovery/rejection branches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators.evaluation import (
    conformal_bound,
    fairness_audit,
    fdr_bh,
)
from news_clustering_and_summarization_spark.operators.profiling import (
    spearman,
)


def test_spearman_perfect_monotone(spark):
    # y = x^3 is nonlinear but perfectly monotone: rho = 1 exactly
    df = spark.createDataFrame(
        [(x, x * x * x) for x in range(1, 50)], "a long, b long"
    )
    row = spearman(df, "a", "b").collect()[0]
    assert row["n"] == 49 and row["rho_q"] == 1_000_000
    row = spearman(df.select("a", (-F.col("b")).alias("b")), "a", "b").collect()[0]
    assert row["rho_q"] == -1_000_000


def test_spearman_ties_average_rank(spark):
    # tie-corrected: x has ties; compare against scipy-style hand calc
    # x: [1,1,2,3], y: [10,20,30,40] -> ranks x: [1.5,1.5,3,4],
    # y: [1,2,3,4]; rho = 1 - something != 1 because of the tie split
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30), (3, 40)], "a long, b long"
    )
    row = spearman(df, "a", "b").collect()[0]
    # pearson([1.5,1.5,3,4],[1,2,3,4]) = 0.9486832980...
    assert row["rho_q"] == 948683


def test_spearman_zero_variance_is_null(spark):
    df = spark.createDataFrame([(1, 7), (1, 9)], "a long, b long")
    assert spearman(df, "a", "b").collect()[0]["rho_q"] is None


def test_fdr_bh_planted_skew_rejects(spark):
    # 9 null groups (uniform A/N/R) + one wildly skewed group: BH at
    # alpha=0.05 must reject exactly the planted group
    rows = []
    for g in range(9):
        rows += [(f"g{g}", c) for c in ["A", "N", "R"] * 40]
    rows += [("bad", "A")] * 110 + [("bad", "N")] * 5 + [("bad", "R")] * 5
    df = spark.createDataFrame(rows, "g string, c string")
    out = fdr_bh(df, "g", "c", ["A", "N", "R"], alpha=0.05).collect()
    rejected = {r["g"] for r in out if r["rejected"]}
    assert rejected == {"bad"}
    assert [r["k"] for r in out] == list(range(1, 11))
    assert out[0]["g"] == "bad"  # largest statistic ranks first


def test_fdr_bh_requires_three_categories(spark):
    df = spark.createDataFrame([("g", "A")], "g string, c string")
    with pytest.raises(ValueError, match="df=2"):
        fdr_bh(df, "g", "c", ["A", "B"])


def test_conformal_bound_covers(spark):
    # group mean predictor, symmetric residuals: the 90% bound must
    # cover >= 90% of calibration residuals by construction (k-th
    # order statistic) and be one of the observed residual values
    rows = [(i, i % 5, 1000 * (i % 5) + (i * 37) % 100) for i in range(400)]
    df = spark.createDataFrame(rows, "rk long, grp long, v long")
    out = conformal_bound(df, "rk", "grp", "v").collect()[0]
    assert out["cal_k"] == (90 * (out["n_cal"] + 1) + 99) // 100
    # residuals are |offset - mean(offsets)| with offsets in [0, 99]
    assert out["bound"] is not None and 0 <= out["bound"] <= 100


def test_conformal_bound_small_cal_is_null(spark):
    # 3 calibration rows at 90%: k = ceil(0.9*4) = 4 > n_cal -> NULL
    rows = [(i, 0, i) for i in range(6)]
    df = spark.createDataFrame(rows, "rk long, grp long, v long")
    out = conformal_bound(df, "rk", "grp", "v").collect()[0]
    if out["cal_k"] > out["n_cal"]:
        assert out["bound"] is None


def test_fairness_audit_flags_disparate_segment(spark):
    # segment "m": 50% positive; segment "f": 10% positive -> overall
    # 30%; f's DI ratio = 0.1/0.3 = 0.333 < 0.8 -> flagged
    rows = [("m", i < 50) for i in range(100)] + [
        ("f", i < 10) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "seg string, y boolean")
    out = {r["seg"]: r for r in fairness_audit(df, "seg", "y").collect()}
    assert out["f"]["below_four_fifths"] is True
    assert out["m"]["below_four_fifths"] is False
    assert out["f"]["di_q"] == 333333
    assert out["f"]["rate_gap_q"] == -200000
    assert out["m"]["rate_gap_q"] == 200000


def test_conformal_bound_negative_values_match_oracle(spark):
    # r09 advisor: the integer mean `(s - s % c) / c` and the twin's
    # `//` were claimed (docstring) to be floor division; both in fact
    # TRUNCATE toward zero. Pin cross-engine parity on a value domain
    # with negative per-group sums so the agreement is tested, not
    # assumed.
    import duckdb as _duckdb
    import pandas as pd

    from news_clustering_and_summarization_spark.operators.evaluation import (
        conformal_bound_sql,
    )
    from tests.conftest import rows_match

    rows = [(i, i % 3, ((i * 41) % 199) - 150) for i in range(240)]
    sdf = spark.createDataFrame(rows, "rk long, grp long, v long")
    out = conformal_bound(sdf, "rk", "grp", "v")
    con = _duckdb.connect()
    con.register(
        "t_neg", pd.DataFrame(rows, columns=["rk", "grp", "v"])
    )
    ok, msg = rows_match(
        out, con.sql(conformal_bound_sql("t_neg", "rk", "grp", "v"))
    )
    con.close()
    assert ok, msg


def test_spearman_fractional_mult1_matches_oracle(spark):
    # r09 advisor: with x_mult=1 the old Spark path long-cast
    # (truncation) while the oracle ::BIGINT rounded — parity held
    # only on integral inputs. Both sides now quantize half-up
    # unconditionally; pin it on genuinely fractional doubles.
    import duckdb as _duckdb
    import pandas as pd

    from news_clustering_and_summarization_spark.operators.profiling import (
        spearman_sql,
    )
    from tests.conftest import rows_match

    rows = [
        (float(i) + 0.5, float((i * 7) % 23) + 0.5) for i in range(60)
    ]
    sdf = spark.createDataFrame(rows, "a double, b double")
    out = spearman(sdf, "a", "b")
    con = _duckdb.connect()
    con.register("t_frac", pd.DataFrame(rows, columns=["a", "b"]))
    ok, msg = rows_match(
        out, con.sql(spearman_sql("t_frac", "a", "b"))
    )
    con.close()
    assert ok, msg
