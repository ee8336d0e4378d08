"""Fellegi–Sunter record linkage (operators/linkage.py): blocking
restricts candidates, agreement weights sum exactly, NULL fields
compare null-safe, and the threshold decides."""

from __future__ import annotations

from news_clustering_and_summarization_spark.operators.linkage import (
    FieldRule,
    link_records,
)

RULES = [
    FieldRule("name", 40, -15),
    FieldRule("city", 10, -10),
]


SCHEMA = "rec_id string, block int, name string, city string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_blocking_limits_candidates_and_scores_exactly(spark):
    left = _df(spark, [("l1", 1, "ada", "paris"), ("l2", 2, "bob", "rome")])
    right = _df(
        spark,
        [
            ("r1", 1, "ada", "paris"),   # same block, full agree: 50
            ("r2", 1, "eve", "paris"),   # same block, city only: -5
            ("r3", 2, "bob", "oslo"),    # block 2: name only: 30
            ("r4", 3, "ada", "paris"),   # different block: never scored
        ],
    )
    out = {
        (r["left_id"], r["right_id"]): (r["score"], r["is_match"])
        for r in link_records(
            left, right, ["block"], RULES, threshold=30
        ).collect()
    }
    assert out[("l1", "r1")] == (50, True)
    assert out[("l1", "r2")] == (-5, False)
    assert out[("l2", "r3")] == (30, True)
    assert ("l1", "r4") not in out and ("l2", "r4") not in out


def test_null_fields_compare_null_safe(spark):
    left = _df(spark, [("l1", 1, None, "paris")])
    right = _df(spark, [("r1", 1, None, "paris"), ("r2", 1, "x", None)])
    out = {
        r["right_id"]: (r["name_agree"], r["city_agree"], r["score"])
        for r in link_records(
            left, right, ["block"], RULES, threshold=30
        ).collect()
    }
    # NULL == NULL agrees under eqNullSafe; NULL vs value disagrees
    assert out["r1"] == (True, True, 50)
    assert out["r2"] == (False, False, -25)


def test_fuzzy_join_lev1_hand_cases(spark):
    """Substitution, insertion, deletion and exact-dup pairs are all
    found; distance-2 pairs are not. The SQL twin (independent
    quadratic θ-join) agrees."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.linkage import (
        fuzzy_join_lev1,
        fuzzy_join_lev1_sql,
    )

    rows = [
        (1, "carpet"),
        (2, "carpets"),   # insertion of 1
        (3, "carpe"),     # deletion of 1
        (4, "carpem"),    # substitution vs carpet
        (5, "carpet"),    # exact dup of 1
        (6, "cxrpxt"),    # distance 2 from carpet
        (7, "zzz"),       # unrelated
    ]
    df = spark.createDataFrame(rows, ["rid", "name"])
    got = sorted(
        tuple(r)
        for r in fuzzy_join_lev1(df, "rid", "name").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{s}')" for i, s in rows)
                + ") v(rid, name)")
    want = sorted(
        tuple(r)
        for r in con.execute(
            fuzzy_join_lev1_sql("t", "rid", "name")
        ).fetchall()
    )
    assert got == want
    pairs = {(a, b): d for a, b, d in got}
    assert pairs[(1, 5)] == 0
    assert pairs[(1, 2)] == 1 and pairs[(1, 3)] == 1
    assert pairs[(1, 4)] == 1
    assert (1, 6) not in pairs and (6, 7) not in pairs
    # empty string pairs with single chars (insertion)
    df2 = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "ab")], ["rid", "name"]
    )
    got2 = {
        (r["id_l"], r["id_r"]): r["dist"]
        for r in fuzzy_join_lev1(df2, "rid", "name").collect()
    }
    assert got2 == {(1, 2): 1, (2, 3): 1}


def test_mutual_best_match_reciprocal_only(spark):
    """A-B reciprocal best survives; C prefers B but B prefers A, so
    no pair with C survives; ties on score break by the other id."""
    from news_clustering_and_summarization_spark.operators.linkage import (
        mutual_best_match,
    )

    pairs = [
        # (l, r, dist) — ascending=True, smaller is better
        ("A", "B", 1), ("B", "A", 1),
        ("C", "B", 2), ("B", "C", 2),
        ("C", "D", 3), ("D", "C", 3),
    ]
    df = spark.createDataFrame(pairs, ["l_id", "r_id", "score"])
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in mutual_best_match(df, ascending=True).collect()
    )
    # A<->B mutual; C's best (B) is taken, so C falls through to D,
    # but D's best IS C -> C<->D also mutual? No: mutual_best_match
    # is single-pass — C's rank-1 is B, not D, so (C,D) has _rl=2.
    assert got == [("A", "B"), ("B", "A")]


def test_mutual_best_match_tie_breaks_by_other_id(spark):
    from news_clustering_and_summarization_spark.operators.linkage import (
        mutual_best_match,
    )

    pairs = [
        (1, 10, 5), (1, 11, 5),   # tie: 10 wins (asc id)
        (10, 1, 5), (11, 1, 5),
    ]
    df = spark.createDataFrame(pairs, ["l_id", "r_id", "score"])
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in mutual_best_match(df, ascending=True).collect()
    )
    assert got == [(1, 10), (10, 1)]


def test_mutual_best_match_symmetric_canonical_input(spark):
    """The r07 review case: a CANONICAL monopartite list fed through
    symmetric=True enforces true 1:1 — entity 2 cannot match both 1
    and 3; also equals the both-orientations run, and a mixed-
    orientation/duplicated input canonicalizes first."""
    from news_clustering_and_summarization_spark.operators.linkage import (
        mutual_best_match,
    )

    canon = [(1, 2, 9), (2, 3, 95)]  # higher = better
    df = spark.createDataFrame(canon, ["l_id", "r_id", "score"])
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in mutual_best_match(df, symmetric=True).collect()
    )
    # entity 2's best is 3 -> only (2,3) survives; WITHOUT symmetric
    # the bipartite windows would (wrongly) keep both pairs
    assert got == [(2, 3)]
    wrong = sorted(
        (r["l_id"], r["r_id"]) for r in mutual_best_match(df).collect()
    )
    assert wrong == [(1, 2), (2, 3)]  # the documented failure mode

    # mixed orientations + duplicates canonicalize to the same answer
    messy = canon + [(2, 1, 9), (3, 2, 95), (2, 3, 95)]
    df = spark.createDataFrame(messy, ["l_id", "r_id", "score"])
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in mutual_best_match(df, symmetric=True).collect()
    )
    assert got == [(2, 3)]


def test_mutual_best_match_symmetric_ignores_self_pairs(spark):
    """A self-pair with the best score must not block the entity's
    real mutual match (r07 second-pass review)."""
    from news_clustering_and_summarization_spark.operators.linkage import (
        mutual_best_match,
    )

    pairs = [(1, 1, 0), (1, 2, 5)]
    df = spark.createDataFrame(pairs, ["l_id", "r_id", "score"])
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in mutual_best_match(
            df, ascending=True, symmetric=True
        ).collect()
    )
    assert got == [(1, 2)]


def test_golden_record_chain_and_rules(spark):
    """A-B-C chain collapses into ONE golden record; survivorship
    picks longest name (tie -> lexicographically smaller), max
    balance, modal segment (tie -> smaller value); the unlinked
    record survives as its own golden."""
    from news_clustering_and_summarization_spark.operators.linkage import (
        golden_record,
    )

    records = spark.createDataFrame(
        [
            ("r1", "ANNA", "AUTO", 10),
            ("r2", "ANNABEL", "HOME", 30),
            ("r3", "ANNABEL", "HOME", 20),
            ("r9", "ZED", "AUTO", 5),
        ],
        "rec_id string, name string, segment string, band long",
    )
    pairs = spark.createDataFrame(
        [("r1", "r2"), ("r2", "r3")], "l_id string, r_id string"
    )
    got = {
        r["golden_id"]: r
        for r in golden_record(
            records,
            pairs,
            id_col="rec_id",
            longest_cols=("name",),
            max_cols=("band",),
            mode_cols=("segment",),
        ).collect()
    }
    assert set(got) == {"r1", "r9"}
    g = got["r1"]
    assert (g["n_members"], g["name"], g["band"], g["segment"]) == (
        3, "ANNABEL", 30, "HOME",
    )
    assert got["r9"]["n_members"] == 1 and got["r9"]["name"] == "ZED"


def test_edit_distance_join_lossless_vs_bruteforce(spark):
    """PassJoin blocking finds EXACTLY the brute-force <=2 pairs on a
    typo-rich corpus (substitutions, inserts, deletes, transposed-ish
    pairs, and far strings), and excludes the < d+1 shorts."""
    from news_clustering_and_summarization_spark.operators.linkage import (
        edit_distance_join,
    )

    rows = [
        (1, "goldenrod lace"),
        (2, "goldenrod lacy"),       # sub, d=1
        (3, "goldenrod lacee"),      # insert, d=1 vs 1; d=2 vs 2
        (4, "goldnrod lace"),        # delete, d=1 vs 1
        (5, "silver bolt"),
        (6, "silvery bolts"),        # d=2 vs 5
        (7, "xx"),                   # len 2 < d+1: excluded
        (8, "completely different"),
    ]
    df = spark.createDataFrame(rows, ["rid", "name"])
    got = sorted(
        (r["id_l"], r["id_r"], r["dist"])
        for r in edit_distance_join(df, "rid", "name", 2).collect()
    )
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = sorted(
        (a, b, lev(sa, sb))
        for (a, sa), (b, sb) in itertools.combinations(rows, 2)
        if len(sa) >= 3 and len(sb) >= 3 and lev(sa, sb) <= 2
    )
    assert got == want
    assert all(t[0] != 7 and t[1] != 7 for t in got)
