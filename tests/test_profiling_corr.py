"""Correlation-matrix profiler tests."""

import duckdb

from news_clustering_and_summarization_spark.operators.profiling import (
    corr_matrix,
    corr_matrix_sql,
)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows,
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


def test_corr_matrix_known_relationships(spark):
    """price = 100*qty gives r=1 for (price_c, qty); an exactly
    anti-correlated tax gives r=-1; all 6 pairs present."""
    rows = []
    for q in range(1, 21):
        rows.append(
            (float(q), 100.0 * q, 0.01 * (q % 5), 0.10 - 0.005 * (q % 5) * 0)
        )
    # make tax exactly anti-linear in discount: tax = 0.10 - disc
    rows = [
        (float(q), 100.0 * q, 0.01 * (q % 5), 0.10 - 0.01 * (q % 5))
        for q in range(1, 21)
    ]
    df = _mk(spark, rows)
    got = {
        (r["var_a"], r["var_b"]): r["r_q"]
        for r in corr_matrix(df).collect()
    }
    assert len(got) == 6
    assert got[("qty", "price_c")] == 1_000_000
    assert got[("disc_c", "tax_c")] == -1_000_000


def test_corr_matrix_matches_duckdb_and_numpy(spark):
    import hashlib

    import numpy as np

    rows = []
    for i in range(200):
        h = hashlib.md5(f"cm|{i}".encode()).hexdigest()
        q = 1 + int(h[:4], 16) % 50
        p = round(q * (900 + int(h[4:8], 16) % 200) / 100.0, 2)
        d = (int(h[8:12], 16) % 11) / 100.0
        t = (int(h[12:16], 16) % 9) / 100.0
        rows.append((float(q), p, d, t))
    df = _mk(spark, rows)
    got = sorted(tuple(r) for r in corr_matrix(df).collect())

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lineitem (l_quantity DOUBLE, l_extendedprice "
        "DOUBLE, l_discount DOUBLE, l_tax DOUBLE)"
    )
    con.executemany("INSERT INTO lineitem VALUES (?, ?, ?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute(corr_matrix_sql()).fetchall())
    assert got == want

    # sanity vs numpy on one pair (qty vs price cents)
    qs = np.array([r[0] for r in rows])
    ps = np.array([np.floor(r[1] * 100 + 0.5) for r in rows])
    expect = np.corrcoef(qs, ps)[0, 1]
    r_q = dict(((a, b), r) for a, b, _, r in got)[("qty", "price_c")]
    assert abs(r_q / 1e6 - expect) < 2e-6


def test_benford_audit_known_distribution(spark):
    """A perfectly Benford-ish sample (counts proportional to p_d)
    yields near-zero chi2 terms; a uniform-digit sample deviates
    sharply on digit 1. Digits from string-of-cents: 0.05 -> '5'."""
    from news_clustering_and_summarization_spark.operators.profiling import (
        BENFORD_P,
        benford_audit,
    )

    rows = []
    for d, p in BENFORD_P.items():
        for i in range(int(round(p * 1000))):
            rows.append((float(d) * (10 ** (i % 3)),))
    df = spark.createDataFrame(rows, ["v"])
    got = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert set(got) == set(range(1, 10))
    assert sum(r["n_obs"] for r in got.values()) == len(rows)
    assert all(r["chi2_q"] < 400_000 for r in got.values())  # < 0.4

    uni = spark.createDataFrame(
        [(float(d),) for d in range(1, 10) for _ in range(100)], ["v"]
    )
    got = {r["digit"]: r for r in benford_audit(uni, "v").collect()}
    assert got[1]["chi2_q"] > 50_000_000  # digit 1 way under-observed

    # sub-dollar values take their digit from the cents string
    small = spark.createDataFrame([(0.05,), (0.42,), (-3.0,), (0.0,)], ["v"])
    got = {r["digit"]: r["n_obs"] for r in benford_audit(small, "v").collect()}
    assert got == {5: 1, 4: 1}  # negatives/zeros excluded


def test_benford_audit_sql_twin(spark):
    import duckdb
    import hashlib

    from news_clustering_and_summarization_spark.operators.profiling import (
        benford_audit,
        benford_audit_sql,
    )

    rows = [
        (int(hashlib.md5(f"bf|{i}".encode()).hexdigest()[:6], 16)
         % 99_999 / 100.0,)
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, ["v"])
    got = sorted(tuple(r) for r in benford_audit(df, "v").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(benford_audit_sql("t", "v")).fetchall()
    )
    assert got == want


def test_weighted_median_hand_cases(spark):
    """Lower weighted median semantics: value whose cumulative
    weight first reaches half the total; heavy single value
    dominates; duplicate values collapse their weight."""
    from news_clustering_and_summarization_spark.operators.profiling import (
        weighted_median,
    )

    rows = [
        # g1: values 1(w1) 2(w1) 3(w1) -> median 2
        ("g1", 1, 1), ("g1", 2, 1), ("g1", 3, 1),
        # g2: 1(w1) 10(w9) -> half=5 -> 10
        ("g2", 1, 1), ("g2", 10, 9),
        # g3: duplicates: 5 appears twice w2 each; 1(w1) 5(w4) ->
        # cum at 5 = 5 >= 2.5 of tot 5 -> median 5
        ("g3", 1, 1), ("g3", 5, 2), ("g3", 5, 2),
        # g4: exact half boundary: 1(w2) 2(w2) -> 2*cumw(1)=4 >=
        # totw 4 -> lower median 1
        ("g4", 1, 2), ("g4", 2, 2),
    ]
    df = spark.createDataFrame(rows, ["g", "v", "w"])
    got = {
        r["g"]: (r["w_median"], r["tot_w"])
        for r in weighted_median(df, "g", "v", "w").collect()
    }
    assert got == {
        "g1": (2, 3),
        "g2": (10, 10),
        "g3": (5, 5),
        "g4": (1, 4),
    }


def test_weighted_median_sql_twin(spark):
    import duckdb
    import hashlib

    from news_clustering_and_summarization_spark.operators.profiling import (
        weighted_median,
        weighted_median_sql,
    )

    rows = []
    for i in range(500):
        h = hashlib.md5(f"wm|{i}".encode()).hexdigest()
        rows.append(
            (f"g{int(h[:2], 16) % 7}", int(h[2:6], 16) % 100,
             1 + int(h[6:8], 16) % 9)
        )
    df = spark.createDataFrame(rows, ["g", "v", "w"])
    got = sorted(
        tuple(r) for r in weighted_median(df, "g", "v", "w").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v BIGINT, w BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            weighted_median_sql("SELECT * FROM t", "g", "v", "w")
        ).fetchall()
    )
    assert got == want


def test_gini_concentration_extremes(spark):
    """Perfect equality -> G = 0 (well, (n-1)/n correction: the
    sample formula gives 0 for equal values); total concentration
    in one member -> G = (n-1)/n; twin matches."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.profiling import (
        gini_concentration,
        gini_concentration_sql,
    )

    rows = (
        [("eq", i, 10) for i in range(10)]
        + [("one", 0, 100)]
        + [("one", i, 0) for i in range(1, 10)]
    )
    df = spark.createDataFrame(rows, ["g", "m", "v"])
    got = {
        r["g"]: r for r in gini_concentration(df, "g", "v").collect()
    }
    assert got["eq"]["gini_q"] == 0
    assert got["one"]["gini_q"] == 900_000  # (n-1)/n with n=10

    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, m BIGINT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            gini_concentration_sql("SELECT * FROM t", "g", "v")
        ).fetchall()
    )
    assert sorted(
        tuple(r) for r in gini_concentration(df, "g", "v").collect()
    ) == want


def test_winsorized_stats_semantics(spark):
    """Outliers get clipped to the exact P05/P95 order statistics;
    the clipped mean moves toward the bulk; n_clipped counts only
    values strictly outside; twin matches."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.profiling import (
        winsorized_stats,
        winsorized_stats_sql,
    )

    # 100 values: 1..98 plus two wild outliers
    rows = [("g", v) for v in range(1, 99)] + [("g", 10_000), ("g", -5_000)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = winsorized_stats(df, "g", "v").collect()[0]
    # n=100 -> k05 = ceil(5) = 5, k95 = ceil(95) = 95
    # sorted: -5000, 1..98, 10000 -> rank5 = 4, rank95 = 94
    assert (r["lo_c"], r["hi_c"]) == (4, 94)
    assert r["n_clipped"] == 2 + 3 + 4  # outliers + 1,2,3 + 95..98
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = [
        tuple(x)
        for x in con.execute(
            winsorized_stats_sql("SELECT * FROM t", "g", "v")
        ).fetchall()
    ]
    assert [tuple(r)] == want


def test_abc_classify_hand_case(spark):
    """Values 80, 15, 3, 2 (total 100): the 80 item is A (cum 80%),
    the 15 item is B (cum 95%), the tail is C; ties order by item;
    twin matches."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.profiling import (
        abc_classify,
        abc_classify_sql,
    )

    rows = [("g", 1, 80), ("g", 2, 15), ("g", 3, 3), ("g", 4, 2)]
    df = spark.createDataFrame(rows, ["grp", "item", "v"])
    got = {
        r["abc_class"]: (r["n_items"], r["class_value"], r["share_q"])
        for r in abc_classify(df, "grp", "item", "v").collect()
    }
    assert got == {
        "A": (1, 80, 800_000),
        "B": (1, 15, 150_000),
        "C": (2, 5, 50_000),
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp VARCHAR, item BIGINT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            abc_classify_sql("SELECT * FROM t", "grp", "item", "v")
        ).fetchall()
    )
    assert sorted(
        tuple(r) for r in abc_classify(df, "grp", "item", "v").collect()
    ) == want


def test_welch_z_known_separation(spark):
    """A group whose values sit far above the rest gets a large
    positive z; symmetric groups get symmetric z; min_n gates; twin
    matches on a seeded table."""
    import hashlib

    import duckdb

    from news_clustering_and_summarization_spark.operators.profiling import (
        welch_z_test,
        welch_z_test_sql,
    )

    rows = (
        [("hi", 100 + i % 3) for i in range(20)]
        + [("lo", 10 + i % 3) for i in range(20)]
        + [("solo", 55)]  # n=1 -> gated
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r["g"]: r for r in welch_z_test(df, "g", "v").collect()}
    assert set(got) == {"hi", "lo"}
    assert got["hi"]["z_q"] > 10_000_000   # z >> 10
    assert got["lo"]["z_q"] < -10_000_000

    data = [
        (
            f"g{int(hashlib.md5(f'wz|{i}'.encode()).hexdigest()[:2], 16) % 4}",
            int(hashlib.md5(f"wzv|{i}".encode()).hexdigest()[:4], 16) % 1000,
        )
        for i in range(300)
    ]
    df2 = spark.createDataFrame(data, ["g", "v"])
    got2 = sorted(tuple(r) for r in welch_z_test(df2, "g", "v").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", data)
    want = sorted(
        tuple(r)
        for r in con.execute(
            welch_z_test_sql("SELECT * FROM t", "g", "v")
        ).fetchall()
    )
    assert got2 == want


def test_hhi_index_extremes(spark):
    """Monopoly -> HHI 10000 bp; n equal members -> 10000/n bp;
    twin matches."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.profiling import (
        hhi_index,
        hhi_index_sql,
    )

    rows = (
        [("mono", 1, 500)]
        + [("even", m, 100) for m in range(1, 5)]
    )
    df = spark.createDataFrame(rows, ["g", "m", "v"])
    got = {
        r["g"]: r for r in hhi_index(df, "g", "m", "v").collect()
    }
    assert got["mono"]["hhi_q"] == 1_000_000   # 10000 bp * 1e2
    assert got["even"]["hhi_q"] == 250_000     # 2500 bp * 1e2

    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, m BIGINT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            hhi_index_sql("SELECT * FROM t", "g", "m", "v")
        ).fetchall()
    )
    assert sorted(
        tuple(r) for r in hhi_index(df, "g", "m", "v").collect()
    ) == want


def test_l_diversity_hand_case(spark):
    """Class (1): 4 rows all sensitive=A -> distinct 1, entropy 0,
    at_risk. Class (2): uniform over 3 values -> entropy = ln 3,
    not at risk at l=3."""
    import math

    from news_clustering_and_summarization_spark.operators.profiling import (
        l_diversity_audit,
    )

    rows = [(1, "A")] * 4 + [(2, "A"), (2, "B"), (2, "C")]
    df = spark.createDataFrame(rows, ["qid", "sv"])
    got = {
        r["qid"]: r
        for r in l_diversity_audit(df, ["qid"], "sv", l=3).collect()
    }
    assert got[1]["class_size"] == 4
    assert got[1]["distinct_sensitive"] == 1
    assert got[1]["entropy_q"] == 0 and got[1]["at_risk"]
    assert got[2]["distinct_sensitive"] == 3 and not got[2]["at_risk"]
    assert abs(got[2]["entropy_q"] - math.log(3) * 1e9) < 10


def test_l_diversity_sql_twin(spark):
    import duckdb

    from news_clustering_and_summarization_spark.operators.profiling import (
        l_diversity_audit,
        l_diversity_audit_sql,
    )

    import hashlib

    rows = []
    for i in range(200):
        h = hashlib.md5(f"ld|{i}".encode()).hexdigest()
        rows.append((int(h[:2], 16) % 6, f"v{int(h[2:4], 16) % 5}"))
    df = spark.createDataFrame(rows, ["qid", "sv"])
    got = sorted(
        tuple(r) for r in l_diversity_audit(df, ["qid"], "sv", l=4).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (qid BIGINT, sv VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            l_diversity_audit_sql("t", ["qid"], "sv", l=4)
        ).fetchall()
    )
    assert got == want


def test_group_js_divergence_bounds(spark):
    """A group identical to the corpus mix scores ~0; a group fully
    disjoint from the rest scores near ln 2 (it IS half the corpus,
    so exactly the two-point JS of disjoint halves)."""
    from news_clustering_and_summarization_spark.operators.profiling import (
        group_js_divergence,
    )

    # two groups with IDENTICAL token multisets -> each group's dist
    # == corpus dist -> JS = 0 exactly
    same = [("g1", t) for t in ["a", "a", "b"]] + [
        ("g2", t) for t in ["a", "a", "b"]
    ]
    df = spark.createDataFrame(same, ["source", "token"])
    got = {r["source"]: r for r in group_js_divergence(df).collect()}
    assert got["g1"]["js_q"] == 0 and got["g2"]["js_q"] == 0
    assert got["g1"]["n_tokens"] == 3 and got["g1"]["vocab"] == 2

    # disjoint halves: p=2q on own tokens, q terms vanish on the
    # other half -> JS = ln 2 - 0.5 ln(3/2)... compute exactly
    import math

    disj = [("g1", "a"), ("g1", "b"), ("g2", "c"), ("g2", "d")]
    df = spark.createDataFrame(disj, ["source", "token"])
    got = {r["source"]: r["js_q"] for r in group_js_divergence(df).collect()}
    # closed form: 0.5[ln(4/3)] + 0.5[0.5·ln(2/3)·... ] — just check
    # symmetry and the known two-distribution value JS(P, M) where
    # M = (P+Q)/2 with disjoint P,Q relative to corpus mix:
    # p=1/2 per own token, q=1/4; term1 = 2·(1/2)ln(2·(1/2)/(3/4))
    # term2 = 2·(1/4)ln(2·(1/4)/(3/4)); missing mass = 1/2 -> +ln2/2
    t1 = math.log((2 * 0.5) / 0.75)
    t2 = 0.5 * math.log((2 * 0.25) / 0.75)
    expect = 0.5 * (t1 + t2 + math.log(2) * 0.5)
    for g in ("g1", "g2"):
        assert abs(got[g] / 1e9 - expect) < 1e-6
    assert got["g1"] == got["g2"]


def test_group_js_divergence_sql_twin(spark):
    import duckdb
    import hashlib

    from news_clustering_and_summarization_spark.operators.profiling import (
        group_js_divergence,
        group_js_divergence_sql,
    )

    words = ["sun", "moon", "star", "rain", "wind"]
    rows = []
    for i in range(300):
        h = hashlib.md5(f"js|{i}".encode()).hexdigest()
        rows.append(
            (f"s{int(h[:2], 16) % 3}", words[int(h[2:4], 16) % 5])
        )
    df = spark.createDataFrame(rows, ["source", "token"])
    got = sorted(tuple(r) for r in group_js_divergence(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE tk (g VARCHAR, t VARCHAR)")
    con.executemany("INSERT INTO tk VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            group_js_divergence_sql("SELECT g, t FROM tk")
        ).fetchall()
    )
    assert got == want


def test_chi2_independence_hand_case(spark):
    """Perfectly proportional margins -> chi2 = 0; a fully
    group-determined outcome on a 2x2 -> chi2 = N exactly; dof and
    zero-cell materialization check out."""
    from news_clustering_and_summarization_spark.operators.profiling import (
        chi2_independence,
    )

    prop = (
        [("a", "x")] * 6 + [("a", "y")] * 2
        + [("b", "x")] * 3 + [("b", "y")] * 1
    )
    df = spark.createDataFrame(prop, ["g", "cat"])
    rows = chi2_independence(df, "g", "cat").collect()
    assert rows[0]["chi2_q"] == 0 and rows[0]["dof"] == 1

    det = [("a", "x")] * 5 + [("b", "y")] * 5
    df = spark.createDataFrame(det, ["g", "cat"])
    rows = chi2_independence(df, "g", "cat").collect()
    # 2x2 fully determined: chi2 = N = 10 -> 10e6 quantized; the two
    # zero cells must be present
    assert len(rows) == 4
    assert rows[0]["chi2_q"] == 10_000_000
    zero_cells = [(r["g"], r["cat"]) for r in rows if r["o"] == 0]
    assert sorted(zero_cells) == [("a", "y"), ("b", "x")]


def test_chi2_independence_sql_twin(spark):
    import duckdb
    import hashlib

    from news_clustering_and_summarization_spark.operators.profiling import (
        chi2_independence,
        chi2_independence_sql,
    )

    rows = []
    for i in range(400):
        h = hashlib.md5(f"x2|{i}".encode()).hexdigest()
        g = f"g{int(h[:2], 16) % 3}"
        cat = f"c{int(h[2:4], 16) % 4}"
        rows.append((g, cat))
    df = spark.createDataFrame(rows, ["g", "cat"])
    got = sorted(tuple(r) for r in chi2_independence(df, "g", "cat").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, cat VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            chi2_independence_sql("t", "g", "cat")
        ).fetchall()
    )
    assert got == want
