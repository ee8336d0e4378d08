"""clustering_quality must reproduce the textbook V-measure values
(hand-computed; matches sklearn's homogeneity/completeness/v_measure
conventions for the degenerate cases)."""

from __future__ import annotations

import math

import pytest

from news_clustering_and_summarization_spark.operators.evaluation import (
    clustering_quality,
)


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, ["pred", "truth"])
    return clustering_quality(df, "pred", "truth").first()


def test_perfect_clustering(spark):
    r = _run(spark, [(1, "a"), (1, "a"), (2, "b"), (2, "b")])
    assert (r.homogeneity, r.completeness, r.v_measure) == (1.0, 1.0, 1.0)


def test_single_cluster_of_mixed_truth(spark):
    # all predictions identical: completeness 1, homogeneity 0
    r = _run(spark, [(1, "a"), (1, "a"), (1, "b"), (1, "b")])
    assert r.homogeneity == 0.0
    assert r.completeness == 1.0
    assert r.v_measure == 0.0


def test_hand_computed_split(spark):
    # truth {a,a,b,b}; pred {1,1,1,2}: one 'b' split off.
    # contingency: (1,a)=2 (1,b)=1 (2,b)=1, N=4
    pairs = [(1, "a"), (1, "a"), (1, "b"), (2, "b")]
    n = 4
    h_c = -(2 / 4) * math.log(2 / 4) * 2  # H(truth): two classes of 2
    h_ck = -(
        (2 / n) * math.log(2 / 3) + (1 / n) * math.log(1 / 3)
        + (1 / n) * math.log(1 / 1)
    )
    h_k = -((3 / 4) * math.log(3 / 4) + (1 / 4) * math.log(1 / 4))
    h_kc = -(
        (2 / n) * math.log(2 / 2) + (1 / n) * math.log(1 / 2)
        + (1 / n) * math.log(1 / 2)
    )
    h = 1 - h_ck / h_c
    c = 1 - h_kc / h_k
    v = 2 * h * c / (h + c)
    r = _run(spark, pairs)
    assert r.homogeneity == pytest.approx(h, abs=1e-6)
    assert r.completeness == pytest.approx(c, abs=1e-6)
    assert r.v_measure == pytest.approx(v, abs=1e-6)


def test_binary_auc_known_values(spark):
    from news_clustering_and_summarization_spark.operators.evaluation import (
        binary_auc,
    )

    # perfect separation -> 1.0
    rows = [(10, 1), (9, 1), (2, 0), (1, 0)]
    df = spark.createDataFrame(rows, ["score", "y"])
    r = binary_auc(df, "score", "y").first()
    assert r["auc"] == 1.0 and r["n_pos"] == 2 and r["n_neg"] == 2

    # inverted -> 0.0
    inv = spark.createDataFrame([(1, 1), (2, 1), (9, 0)], ["score", "y"])
    assert binary_auc(inv, "score", "y").first()["auc"] == 0.0

    # all ties -> 0.5 exactly (tie credit)
    tie = spark.createDataFrame([(5, 1), (5, 1), (5, 0)], ["score", "y"])
    assert binary_auc(tie, "score", "y").first()["auc"] == 0.5

    # hand case: pos {3,1}, neg {2,2}: pairs (3>2)x2=2 wins, (1<2)x2
    # losses -> AUC = 2/4 = 0.5? no: wins 2, ties 0, total 4 -> 0.5
    mix = spark.createDataFrame(
        [(3, 1), (1, 1), (2, 0), (2, 0)], ["score", "y"]
    )
    assert binary_auc(mix, "score", "y").first()["auc"] == 0.5


def test_calibration_bins_hand_case(spark):
    from news_clustering_and_summarization_spark.operators.evaluation import (
        calibration_bins,
    )

    rows = [
        (0.05, 0), (0.05, 0), (0.05, 1),   # bin 0: pos_rate 1/3
        (0.95, 1), (0.95, 1),              # bin 9: pos_rate 1
        (1.0, 1),                          # hi edge clamps into bin 9
        (-0.2, 0),                         # below lo clamps into bin 0
    ]
    df = spark.createDataFrame(rows, ["score", "y"])
    out = {
        r["bin"]: r
        for r in calibration_bins(df, "score", "y", 10, 0.0, 1.0).collect()
    }
    assert out[0]["n"] == 4 and out[0]["pos_rate"] == 0.25
    assert out[9]["n"] == 3 and out[9]["pos_rate"] == 1.0
    assert out[0]["bin_lo"] == 0.0 and out[9]["bin_lo"] == 0.9
    assert abs(out[9]["mean_score"] - (0.95 + 0.95 + 1.0) / 3) < 1e-6


def test_binary_auc_single_class_yields_null(spark):
    from news_clustering_and_summarization_spark.operators.evaluation import (
        binary_auc,
    )

    pos_only = spark.createDataFrame([(1, 1), (2, 1)], ["score", "y"])
    r = binary_auc(pos_only, "score", "y").first()
    assert r["auc"] is None and r["n_pos"] == 2 and r["n_neg"] == 0


def test_rouge_hand_case(spark):
    """ROUGE clipped counts on a tiny hand-computable doc: candidate
    'a b a c' (lead_k=4) vs reference 'a a b d x y'."""
    from news_clustering_and_summarization_spark.operators.evaluation import (
        rouge_scores,
    )

    # 10 tokens: cand = [a b a c], ref = [a a b d x y]
    df = spark.createDataFrame([(1, "a b a c a a b d x y")], ["doc_id", "text"])
    r = rouge_scores(df, "doc_id", "text", lead_k=4).first()
    # unigrams: cand counts {a:2,b:1,c:1}, ref {a:2,b:1,d:1,x:1,y:1}
    # clipped match = min(2,2)+min(1,1) = 3; |C1|=4, |R1|=6
    assert r["r1_match"] == 3 and r["r1_ref"] == 6
    assert r["r1_f1_q"] == 600000  # 2*3/(4+6) = 0.6
    # bigrams: cand {'a b','b a','a c'}, ref {'a a','a b','b d','d x','x y'}
    # match = 1 ('a b'); |C2|=3, |R2|=5
    assert r["r2_match"] == 1 and r["r2_ref"] == 5
    assert r["r2_f1_q"] == 250000  # 2*1/(3+5) = 0.25


def test_rouge_short_docs_excluded_and_zero_overlap(spark):
    from news_clustering_and_summarization_spark.operators.evaluation import (
        rouge_scores,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c"),                       # < lead_k+2 tokens: dropped
            (2, "a b c d p q"),                 # cand [a b c d], ref [p q]
        ],
        ["doc_id", "text"],
    )
    out = rouge_scores(df, "doc_id", "text", lead_k=4).collect()
    assert [r["id"] for r in out] == [2]
    r = out[0]
    assert r["r1_match"] == 0 and r["r1_f1_q"] == 0
    assert r["r2_match"] == 0 and r["r2_f1_q"] == 0


def test_gini_stump_perfect_split(spark):
    """A feature that separates classes exactly at x<=5 must be
    found with gini_split 0 and gain == root gini; a pure-noise
    feature gains ~nothing; the SQL twin matches bit-for-bit."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.evaluation import (
        gini_stump,
        gini_stump_sql,
    )

    rows = []
    for i in range(40):
        y = 1 if i < 20 else 0
        perfect = i % 10 if y == 1 else 10 + i % 10  # <=9 iff y=1
        noise = i % 4
        rows.append((y, perfect, noise))
    df = spark.createDataFrame(rows, ["y", "perfect", "noise"])
    got = {
        r["feature"]: r
        for r in gini_stump(df, "y", ["perfect", "noise"]).collect()
    }
    assert got["perfect"]["gini_split_q"] == 0
    assert got["perfect"]["threshold"] == 9
    assert got["perfect"]["gain_q"] == got["perfect"]["gini_root_q"]
    assert got["perfect"]["gini_root_q"] == 500_000_000  # balanced
    assert got["noise"]["gain_q"] < 10_000_000

    con = duckdb.connect()
    con.execute("CREATE TABLE t (y BIGINT, perfect BIGINT, noise BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            gini_stump_sql("SELECT * FROM t", "y", ["perfect", "noise"])
        ).fetchall()
    )
    assert sorted(
        tuple(r)
        for r in gini_stump(df, "y", ["perfect", "noise"]).collect()
    ) == want


def test_gini_stump_min_side_and_ties(spark):
    """min_side excludes degenerate splits; equal-score thresholds
    break ties on the smaller threshold."""
    from news_clustering_and_summarization_spark.operators.evaluation import (
        gini_stump,
    )

    # symmetric data: thresholds 1 and 2 both give the same split
    # score; the argmin must pick threshold 1
    rows = [(1, 1), (1, 2), (0, 3), (0, 4)]
    df = spark.createDataFrame(rows, ["y", "x"])
    r = gini_stump(df, "y", ["x"]).collect()[0]
    assert r["gini_split_q"] == 0 and r["threshold"] == 2

    # min_side=2 forbids the 1-vs-3 splits
    r2 = gini_stump(df, "y", ["x"], min_side=2).collect()[0]
    assert r2["threshold"] == 2


def test_ndcg_perfect_and_inverted_ranking(spark):
    """Ranking exactly by relevance gives NDCG = 1; ranking worst-
    first scores lower; docs missing relevance labels count rel 0;
    SQL twin matches bit-for-bit."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.evaluation import (
        ndcg_at_k,
        ndcg_at_k_sql,
    )

    rel_rows = [(1, 3), (2, 2), (3, 1)]
    rel = spark.createDataFrame(rel_rows, ["doc_id", "rel"])
    perfect = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3), (4, 4)], ["doc_id", "rank"]
    )
    r = ndcg_at_k(perfect, rel, k=4).collect()[0]
    assert r["ndcg_q"] == 1_000_000
    inverted = spark.createDataFrame(
        [(4, 1), (3, 2), (2, 3), (1, 4)], ["doc_id", "rank"]
    )
    r2 = ndcg_at_k(inverted, rel, k=4).collect()[0]
    assert r2["ndcg_q"] < 800_000
    assert r2["idcg_q"] == r["idcg_q"]

    got = tuple(ndcg_at_k(inverted, rel, k=4).collect()[0])
    sql = ndcg_at_k_sql(
        "SELECT * FROM (VALUES (4, 1), (3, 2), (2, 3), (1, 4)) "
        "t(doc_id, rank)",
        "SELECT * FROM (VALUES (1, 3), (2, 2), (3, 1)) t(doc_id, rel)",
        k=4,
    )
    want = tuple(duckdb.sql(sql).fetchall()[0])
    assert got == want


def test_ks_two_sample_hand_case(spark):
    """Disjoint supports -> D = 1; identical samples -> D = 0; a
    known textbook split -> exact rational numerator."""
    from news_clustering_and_summarization_spark.operators.evaluation import (
        ks_two_sample,
    )

    disjoint = spark.createDataFrame(
        [(1, "a"), (2, "a"), (10, "b"), (11, "b")], ["v", "g"]
    )
    r = ks_two_sample(disjoint, "v", "g", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["d_num"], r["d_q"]) == (2, 2, 4, 1_000_000)

    same = spark.createDataFrame(
        [(1, "a"), (2, "a"), (1, "b"), (2, "b")], ["v", "g"]
    )
    r = ks_two_sample(same, "v", "g", "a", "b").collect()[0]
    assert r["d_num"] == 0 and r["d_q"] == 0

    # a={1,2,3}, b={2,3,4}: D = 1/3 (at v=1 and v=3)
    mixed = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (2, "b"), (3, "b"), (4, "b")],
        ["v", "g"],
    )
    r = ks_two_sample(mixed, "v", "g", "a", "b").collect()[0]
    assert r["d_num"] == 3 and r["d_q"] == 333_333


def test_ks_two_sample_shard_boundary_and_sql_twin(spark):
    """Values spanning shard boundaries (width 4) agree with the
    single-window DuckDB twin bit-for-bit, including negatives."""
    import duckdb
    import hashlib

    from news_clustering_and_summarization_spark.operators.evaluation import (
        ks_two_sample,
        ks_two_sample_sql,
    )

    rows = []
    for i in range(400):
        h = hashlib.md5(f"ks|{i}".encode()).hexdigest()
        v = int(h[:4], 16) % 37 - 11  # negatives cross shard 0
        g = "a" if int(h[4:6], 16) % 3 else "b"
        rows.append((v, g))
    df = spark.createDataFrame(rows, ["v", "g"])
    got = [
        tuple(r)
        for r in ks_two_sample(
            df, "v", "g", "a", "b", shard_width=4
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v BIGINT, g VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = [
        tuple(r)
        for r in con.execute(
            ks_two_sample_sql("t", "v", "g", "a", "b")
        ).fetchall()
    ]
    assert got == want


def test_psi_drift_identical_and_shifted(spark):
    """Identical slices -> every term 0 (smoothing included since
    counts match); a hard right-shift -> large positive PSI."""
    from news_clustering_and_summarization_spark.operators.evaluation import (
        psi_drift,
    )

    vals = list(range(100))
    same = [(v, True) for v in vals] + [(v, False) for v in vals]
    df = spark.createDataFrame(same, ["v", "is_ref"])
    rows = psi_drift(df, "v", "is_ref", n_buckets=5).collect()
    assert len(rows) == 5
    assert all(r["term_q"] == 0 for r in rows)
    assert rows[0]["psi_q"] == 0
    # every reference bucket holds exactly n/k values
    assert all(r["ref_n"] == 20 for r in rows)

    shifted = [(v, True) for v in vals] + [
        (v + 80, False) for v in vals
    ]
    df = spark.createDataFrame(shifted, ["v", "is_ref"])
    rows = psi_drift(df, "v", "is_ref", n_buckets=5).collect()
    psi = rows[0]["psi_q"] / 1e9
    assert psi > 0.25  # far past the industry action threshold


def test_psi_drift_sql_twin(spark):
    import duckdb
    import hashlib

    from news_clustering_and_summarization_spark.operators.evaluation import (
        psi_drift,
        psi_drift_sql,
    )

    rows = []
    for i in range(500):
        h = hashlib.md5(f"psi|{i}".encode()).hexdigest()
        v = int(h[:4], 16) % 200
        is_ref = int(h[4:6], 16) % 2 == 0
        if not is_ref:
            v += int(h[6:8], 16) % 60  # mild drift
        rows.append((v, is_ref))
    df = spark.createDataFrame(rows, ["v", "is_ref"])
    got = [
        tuple(r)
        for r in psi_drift(df, "v", "is_ref", shard_width=16).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v BIGINT, is_ref BOOLEAN)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = [
        tuple(r)
        for r in con.execute(psi_drift_sql("t", "v", "is_ref")).fetchall()
    ]
    assert got == want and len(got) == 10


def test_psi_and_ks_degenerate_inputs_match_twin(spark):
    """Empty reference slice (psi) and empty group (ks): both engines
    must agree structurally instead of NULL-vs-0 bucket divergence /
    NaN-vs-cast-error (r07 review findings). Also: concentrated
    reference mass still yields exactly n_buckets rows with the
    empty buckets' smoothing terms present."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.evaluation import (
        ks_two_sample,
        ks_two_sample_sql,
        psi_drift,
        psi_drift_sql,
    )

    con = duckdb.connect()

    # psi: no reference rows at all
    rows = [(v, False) for v in range(50)]
    df = spark.createDataFrame(rows, ["v", "is_ref"])
    got = [tuple(r) for r in psi_drift(df, "v", "is_ref").collect()]
    con.execute("CREATE TABLE t1 (v BIGINT, is_ref BOOLEAN)")
    con.executemany("INSERT INTO t1 VALUES (?, ?)", rows)
    want = [
        tuple(r)
        for r in con.execute(psi_drift_sql("t1", "v", "is_ref")).fetchall()
    ]
    assert got == want and len(got) == 10
    # empty reference: thresholds collapse to 0, every edge = min(v),
    # so bucket 1 holds min(v) and the top bucket everything else —
    # degenerate but IDENTICAL on both engines
    assert got[0][1] == 0 and got[0][2] == 1
    assert got[-1][2] == 49

    # psi: 90% of the reference on one value -> empty middle buckets
    # still materialized with their smoothing terms
    conc = [(100, True)] * 90 + [(v, True) for v in range(10)] + [
        (v, False) for v in range(200)
    ]
    df = spark.createDataFrame(conc, ["v", "is_ref"])
    got = [tuple(r) for r in psi_drift(df, "v", "is_ref").collect()]
    con.execute("CREATE TABLE t2 (v BIGINT, is_ref BOOLEAN)")
    con.executemany("INSERT INTO t2 VALUES (?, ?)", conc)
    want = [
        tuple(r)
        for r in con.execute(psi_drift_sql("t2", "v", "is_ref")).fetchall()
    ]
    assert got == want and len(got) == 10
    empty = [r for r in got if r[1] == 0 and r[2] == 0]
    # the empty buckets exist AND carry their NONZERO smoothing term
    # (n_a != n_b here) — the term the old plan silently dropped
    assert empty and all(r[3] != 0 for r in empty)

    # ks: one group empty -> d_q NULL on both engines, no error
    rows = [(v, "b") for v in range(20)]
    df = spark.createDataFrame(rows, ["v", "g"])
    got = [tuple(r) for r in ks_two_sample(df, "v", "g", "a", "b").collect()]
    con.execute("CREATE TABLE t3 (v BIGINT, g VARCHAR)")
    con.executemany("INSERT INTO t3 VALUES (?, ?)", rows)
    want = [
        tuple(r)
        for r in con.execute(
            ks_two_sample_sql("t3", "v", "g", "a", "b")
        ).fetchall()
    ]
    assert got == want
    assert got[0][0] == 0 and got[0][3] is None


def test_cohen_kappa_textbook(spark):
    """Classic 2x2 example: raters agree on 20+15 of 50 with margins
    (25,25)x(30,20) -> pe=0.5, po=0.7, kappa=0.4 exactly."""
    from pyspark.sql import functions as F

    from news_clustering_and_summarization_spark.operators.evaluation import (
        cohen_kappa,
    )

    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    got = cohen_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert (got["n"], got["agree"]) == (50, 35)
    # S = 25*30 + 25*20 = 1250; kappa = (35*50-1250)/(2500-1250) = 0.4
    assert got["s_cross"] == 1250
    assert got["kappa_q"] == 400_000


def test_cohen_kappa_perfect_and_chance(spark):
    from pyspark.sql import functions as F

    from news_clustering_and_summarization_spark.operators.evaluation import (
        cohen_kappa,
    )

    same = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("x", "x")], "a string, b string"
    )
    assert cohen_kappa(same, F.col("a"), F.col("b")).collect()[0][
        "kappa_q"
    ] == 1_000_000


def test_cohen_kappa_constant_raters_pinned(spark):
    """r08 review: same constant label on both raters -> S = N^2,
    textbook 0/0, pinned to +1e6. Different constant labels are NOT
    degenerate: the margin join is empty, S = 0, kappa = 0 — which
    also regression-tests the empty-join NULL coalesce."""
    from pyspark.sql import functions as F

    from news_clustering_and_summarization_spark.operators.evaluation import (
        cohen_kappa,
    )

    same = spark.createDataFrame([("x", "x")] * 7, "a string, b string")
    assert cohen_kappa(same, F.col("a"), F.col("b")).collect()[0][
        "kappa_q"
    ] == 1_000_000
    diff = spark.createDataFrame([("x", "y")] * 7, "a string, b string")
    got = cohen_kappa(diff, F.col("a"), F.col("b")).collect()[0]
    assert (got["s_cross"], got["kappa_q"]) == (0, 0)


def test_cohen_kappa_empty_is_null(spark):
    """r08 advisor: an EMPTY input hits the S == N^2 branch (0 == 0)
    but means "zero rated items", not "perfect agreement" — kappa_q
    must be NULL, never +1e6, or the statistic lies as a gate."""
    from pyspark.sql import functions as F

    from news_clustering_and_summarization_spark.operators.evaluation import (
        cohen_kappa,
    )

    empty = spark.createDataFrame([], "a string, b string")
    got = cohen_kappa(empty, F.col("a"), F.col("b")).collect()[0]
    assert got["n"] == 0 and got["kappa_q"] is None


def test_bleu_corpus_identical_lead(spark):
    """A doc whose remainder repeats its lead verbatim has every
    clipped n-gram matched: m_n = c_n, log precision terms cancel,
    and log_bleu4_q reduces to 4x the brevity-penalty term."""
    from news_clustering_and_summarization_spark.operators.evaluation import (
        bleu_corpus,
    )

    lead = " ".join(f"w{i}" for i in range(15))
    df = spark.createDataFrame(
        [(1, lead + " " + lead + " tail1 tail2 tail3")],
        ["doc_id", "text"],
    )
    got = bleu_corpus(df).collect()[0]
    assert got["n_docs"] == 1 and got["cand_len"] == 15
    assert all(got[f"m{n}"] == got[f"c{n}"] for n in (1, 2, 3, 4))
    # ref_len=18, cand_len=15 -> bp = q(1 - 18/15) = q(-0.2) = -200000
    assert got["ref_len"] == 18
    assert got["log_bleu4_q"] == 4 * -200_000


def test_bleu_corpus_zero_match_is_null_and_sql_twin(spark):
    """Disjoint lead/remainder vocab -> m_1 = 0 -> NULL score; and
    the DuckDB twin is bit-identical on a mixed corpus."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.evaluation import (
        bleu_corpus,
        bleu_corpus_sql,
    )

    rows = [
        (1, " ".join(f"a{i}" for i in range(15))
         + " " + " ".join(f"b{i}" for i in range(20))),
        (2, " ".join(f"c{i % 7}" for i in range(40))),
        (3, "short doc below the gate"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = bleu_corpus(df).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = con.execute(bleu_corpus_sql("documents")).fetchone()
    assert tuple(got) == tuple(want)
    only_disjoint = bleu_corpus(df.where("doc_id = 1")).collect()[0]
    assert only_disjoint["log_bleu4_q"] is None  # m1 > 0 but m2 = 0? no:
    # doc 1 has zero lead/remainder overlap -> m1 = 0 -> NULL


def test_average_precision_textbook(spark):
    """Ranked [P, N, P] by score: AP = 1/2·(1/1) + 1/2·(2/3)
    = 0.8333...; ties collapse onto one threshold."""
    from news_clustering_and_summarization_spark.operators.evaluation import (
        average_precision,
    )

    df = spark.createDataFrame(
        [(30, 1), (20, 0), (10, 1)], ["score", "y"]
    )
    got = average_precision(df, "score", "y").collect()[0]
    assert (got["n_pos"], got["n_neg"]) == (2, 1)
    # terms: s=30 -> (1/2)(1/1)=0.5 ; s=10 -> (1/2)(2/3)
    assert got["ap_q"] == 500_000_000_000 + round(1e12 / 3)
    tied = spark.createDataFrame(
        [(10, 1), (10, 0), (10, 1)], ["score", "y"]
    )
    t = average_precision(tied, "score", "y").collect()[0]
    # one threshold: (2·2)/(2·3) = 1/3 per the term formula... no:
    # p_s=2, tp=2, fp=1 -> (2·2)/(2·3)·1e12 = floor(2/3·1e12 + 0.5)
    assert t["ap_q"] == 666_666_666_667
    one_class = spark.createDataFrame([(5, 0)], ["score", "y"])
    assert average_precision(one_class, "score", "y").collect()[0][
        "ap_q"
    ] is None


def test_matthews_corr_textbook_and_degenerate(spark):
    """Perfect prediction -> +1e6; inverted -> -1e6; a zero margin
    (constant prediction) -> NULL; empty input -> NULL."""
    from pyspark.sql import functions as F

    from news_clustering_and_summarization_spark.operators.evaluation import (
        matthews_corr,
    )

    perfect = spark.createDataFrame(
        [(True, True), (False, False)] * 3, "p boolean, y boolean"
    )
    assert matthews_corr(perfect, "p", "y").collect()[0]["mcc_q"] == 1_000_000
    inverted = perfect.select((~F.col("p")).alias("p"), "y")
    assert matthews_corr(inverted, "p", "y").collect()[0][
        "mcc_q"
    ] == -1_000_000
    const = spark.createDataFrame(
        [(True, True), (True, False)], "p boolean, y boolean"
    )
    assert matthews_corr(const, "p", "y").collect()[0]["mcc_q"] is None
    empty = spark.createDataFrame([], "p boolean, y boolean")
    row = matthews_corr(empty, "p", "y").collect()[0]
    assert (row["tp"], row["tn"], row["fp"], row["fn"]) == (0, 0, 0, 0)
    assert row["mcc_q"] is None


def test_average_precision_zero_positive_keeps_counts(spark):
    """r09 review: a zero-positive input must report the REAL
    (n_pos=0, n_neg) counts with ap_q NULL — matching the SQL twin,
    not an all-NULL row from aggregating the empty term frame."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.evaluation import (
        average_precision,
        average_precision_sql,
    )

    df = spark.createDataFrame([(5, 0), (7, 0), (9, 0)], ["score", "y"])
    got = average_precision(df, "score", "y").collect()[0]
    assert (got["ap_q"], got["n_pos"], got["n_neg"]) == (None, 0, 3)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (score BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(5, 0), (7, 0), (9, 0)])
    want = con.execute(average_precision_sql("t", "score", "y")).fetchone()
    assert (got["ap_q"], got["n_pos"], got["n_neg"]) == tuple(want)


def test_bleu_corpus_empty_survivors_matches_sql(spark):
    """r09 review: when no document clears the length gate both
    engines must emit the same zero-stats row (Spark summed to NULL
    where the twin coalesced to 0)."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.evaluation import (
        bleu_corpus,
        bleu_corpus_sql,
    )

    rows = [(1, "too short"), (2, "also quite short text")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = tuple(bleu_corpus(df).collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = tuple(con.execute(bleu_corpus_sql("documents")).fetchone())
    assert got == want
    assert got[0] == 0 and got[1] == 0 and got[2] == 0
