"""Fixed-point PageRank (operators/graph.py): hand-checkable
structure (cycles uniform, stars concentrate rank in the hub),
rank-mass conservation on symmetric graphs up to integer truncation,
and the documented dangling-node behavior."""

from __future__ import annotations

from news_clustering_and_summarization_spark.operators.graph import (
    SCALE,
    pagerank_fixed_point,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _ranks(edges, **kw):
    return {
        r["node"]: r["rank"]
        for r in pagerank_fixed_point(edges, **kw).collect()
    }


def test_cycle_stays_uniform(spark):
    # symmetric ring: by symmetry every node keeps rank SCALE/N
    ring = [(i, (i + 1) % 4) for i in range(4)]
    ring += [(d, s) for s, d in ring]
    r = _ranks(_edges(spark, ring), iterations=3)
    assert len(set(r.values())) == 1
    assert abs(r[0] - SCALE // 4) <= 4


def test_star_concentrates_rank_in_hub(spark):
    # undirected star: hub 0 <-> leaves 1..5
    star = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
    r = _ranks(_edges(spark, star), iterations=3)
    leaves = [r[i] for i in range(1, 6)]
    assert r[0] > max(leaves)
    assert len(set(leaves)) == 1, "leaves are symmetric"


def test_mass_conserved_on_symmetric_graph(spark):
    # no dangling nodes -> total rank stays SCALE up to the per-node
    # truncation loss (< 1 unit per division, a handful of divisions
    # per node per iteration)
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 1)]
    sym = pairs + [(d, s) for s, d in pairs]
    r = _ranks(_edges(spark, sym), iterations=4)
    total = sum(r.values())
    assert abs(total - SCALE) < 100 * len(r)


def test_dangling_node_keeps_teleport_only(spark):
    # 0 -> 1, 1 has no out-edges: after one iteration node 1's inflow
    # comes only from 0; node 0 gets teleport only
    r = _ranks(_edges(spark, [(0, 1)]), iterations=1)
    tele = (SCALE * 15) // (100 * 2)
    assert r[0] == tele
    assert r[1] == tele + (85 * (SCALE // 2)) // 100


def test_more_iterations_converge(spark):
    # chain with a popular sink pattern: ranks move monotonically
    # toward the fixed point; iteration 6 vs 7 differ less than 1 vs 2
    pairs = [(i, i + 1) for i in range(6)] + [(i + 1, i) for i in range(6)]
    e = _edges(spark, pairs)
    r1, r2 = _ranks(e, iterations=1), _ranks(e, iterations=2)
    r6, r7 = _ranks(e, iterations=6), _ranks(e, iterations=7)
    early = sum(abs(r1[k] - r2[k]) for k in r1)
    late = sum(abs(r6[k] - r7[k]) for k in r6)
    assert late < early


def test_partitioning_invariance(spark):
    # property: ranks are identical under any input partitioning
    # (exact integer arithmetic has no float-summation order term)
    pairs = [(i % 17, (i * 5 + 3) % 17) for i in range(60)]
    e1 = _edges(spark, pairs)
    e2 = _edges(spark, pairs).repartition(13)
    assert _ranks(e1, iterations=3) == _ranks(e2, iterations=3)


# --- TextRank (round 6) ----------------------------------------------


def test_textrank_edges_symmetric_distinct(spark):
    from news_clustering_and_summarization_spark.operators.graph import (
        textrank_edges,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha beta"),
            (2, "beta alpha; the of it"),  # short words filtered out
        ],
        ["doc_id", "text"],
    )
    got = {
        (r["src"], r["dst"]) for r in textrank_edges(docs, "text").collect()
    }
    # filtered stream doc1: alpha beta gamma alpha beta
    # adjacents: (alpha,beta) (beta,gamma) (gamma,alpha) (alpha,beta)
    # doc2: beta alpha
    want_pairs = {("alpha", "beta"), ("beta", "gamma"), ("gamma", "alpha")}
    want = want_pairs | {(b, a) for a, b in want_pairs}
    assert got == want


def test_textrank_edges_filter_gap_adjacency(spark):
    from news_clustering_and_summarization_spark.operators.graph import (
        textrank_edges,
    )

    # 'a of b' -> filtered stream ['wordone', 'wordtwo']: the stopword
    # gap makes them adjacent (post-filter adjacency, per TextRank)
    docs = spark.createDataFrame(
        [(1, "wordone of wordtwo")], ["doc_id", "text"]
    )
    got = {
        (r["src"], r["dst"]) for r in textrank_edges(docs, "text").collect()
    }
    assert got == {("wordone", "wordtwo"), ("wordtwo", "wordone")}


# --- label propagation (round 6) -------------------------------------


def _lp(spark, edges, seeds, iterations=3):
    from news_clustering_and_summarization_spark.operators.graph import (
        label_propagation,
    )

    e = spark.createDataFrame(edges, "src long, dst long")
    sym = e.union(e.selectExpr("dst AS src", "src AS dst"))
    s = spark.createDataFrame(seeds, "node long, label string")
    return {
        r["node"]: (r["label"], r["is_seed"])
        for r in label_propagation(sym, s, iterations).collect()
    }


def test_label_prop_spreads_majority(spark):
    # star: center 0 with seeds 1,2 ('a') and 3 ('b') -> majority 'a'
    got = _lp(spark, [(0, 1), (0, 2), (0, 3)],
              [(1, "a"), (2, "a"), (3, "b")], iterations=1)
    assert got[0] == ("a", False)
    assert got[1] == ("a", True)


def test_label_prop_tie_breaks_lexicographic(spark):
    got = _lp(spark, [(0, 1), (0, 2)], [(1, "b"), (2, "a")], iterations=1)
    assert got[0][0] == "a"


def test_label_prop_seeds_clamped_and_hops_bound(spark):
    # chain: 0(seed 'x') - 1 - 2 - 3; 1 hop reaches only node 1
    got1 = _lp(spark, [(0, 1), (1, 2), (2, 3)], [(0, "x")], iterations=1)
    assert got1[1][0] == "x" and got1[2][0] is None and got1[3][0] is None
    got3 = _lp(spark, [(0, 1), (1, 2), (2, 3)], [(0, "x")], iterations=3)
    assert got3[3][0] == "x"
    # seed keeps its label even when neighbors disagree
    got = _lp(
        spark, [(0, 1), (0, 2)], [(0, "z"), (1, "a"), (2, "a")],
        iterations=2,
    )
    assert got[0] == ("z", True)


def test_triangle_counts_k4_plus_path(spark):
    """K4 has 4 triangles (each vertex in 3); a pendant path adds
    none. Duplicate and reversed edges must collapse."""
    from news_clustering_and_summarization_spark.operators.graph import (
        triangle_counts,
    )

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    extra = [(4, 5), (5, 6)]           # path, no triangles
    dups = [(2, 1), (3, 1)]            # reversed duplicates
    df = spark.createDataFrame(k4 + extra + dups, ["l_id", "r_id"])
    rows = triangle_counts(df).collect()
    out = {r["id"]: r["n_tri"] for r in rows}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    assert all(r["n_total"] == 4 for r in rows)


def test_triangle_counts_self_loops_ignored(spark):
    from news_clustering_and_summarization_spark.operators.graph import (
        triangle_counts,
    )

    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 3), (1, 3), (3, 3)], ["l_id", "r_id"]
    )
    rows = triangle_counts(df).collect()
    assert {r["id"]: r["n_tri"] for r in rows} == {1: 1, 2: 1, 3: 1}
    assert rows[0]["n_total"] == 1


def test_kcore_peels_tail_keeps_clique(spark):
    """K5 (min degree 4) survives a 4-core; a pendant chain hanging
    off it peels away layer by layer. converged must be true once
    enough rounds have run, and the survivor degrees are degrees
    within the CORE, not the original graph."""
    from news_clustering_and_summarization_spark.operators.graph import (
        kcore,
    )

    k5 = [
        (i, j) for i in range(1, 6) for j in range(i + 1, 6)
    ]
    tail = [(5, 6), (6, 7), (7, 8)]
    df = spark.createDataFrame(k5 + tail, ["l_id", "r_id"])
    rows = kcore(df, k=4, rounds=3).collect()
    out = {r["id"]: r for r in rows}
    assert set(out) == {1, 2, 3, 4, 5}
    assert all(r["core_deg"] == 4 for r in rows)
    assert all(r["core_size"] == 5 for r in rows)
    assert all(r["converged"] for r in rows)


def test_kcore_unconverged_flag_and_empty_core(spark):
    """A 6-cycle at k=3 empties out: every vertex has degree 2, so
    round 1 already deletes everything — the empty result is the
    correct 3-core. With rounds=0 no peeling happens, so the
    'core' is the whole (degree-2) graph and converged=False."""
    from news_clustering_and_summarization_spark.operators.graph import (
        kcore,
    )

    cyc = [(i, (i + 1) % 6) for i in range(6)]
    df = spark.createDataFrame(cyc, ["l_id", "r_id"])
    assert kcore(df, k=3, rounds=2).count() == 0
    rows = kcore(df, k=3, rounds=0).collect()
    assert len(rows) == 6
    assert all(not r["converged"] for r in rows)


def test_kcore_sql_matches_spark_on_random_graph(spark):
    """Oracle twin agrees with the Spark peeling on an Erdos-Renyi
    graph seeded via md5 (deterministic), including reversed-dup
    edges and self loops."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.graph import (
        kcore,
        kcore_sql,
    )

    import hashlib

    edges = []
    for i in range(30):
        for j in range(30):
            h = hashlib.md5(f"kc|{i}|{j}".encode()).hexdigest()
            if int(h[:8], 16) % 5 == 0:
                edges.append((i, j))
    df = spark.createDataFrame(edges, ["l_id", "r_id"])
    got = sorted(
        tuple(r) for r in kcore(df, k=3, rounds=6).collect()
    )
    values = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = kcore_sql(
        f"SELECT * FROM (VALUES {values}) t(l_id, r_id)",
        k=3,
        rounds=6,
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want


def test_clustering_coefficient_hand_cases(spark):
    """Triangle+pendant: triangle nodes have lcc=1 except the one
    carrying the pendant (deg 3, 1 triangle -> 1/3); pendant leaf
    (deg 1) is excluded. K4: all 1.0."""
    from news_clustering_and_summarization_spark.operators.graph import (
        clustering_coefficient,
    )

    tri = [(1, 2), (2, 3), (1, 3), (3, 4)]
    rows = clustering_coefficient(
        spark.createDataFrame(tri, ["l_id", "r_id"])
    ).collect()
    out = {r["id"]: r for r in rows}
    assert set(out) == {1, 2, 3}
    assert out[1]["lcc_q"] == 1_000_000
    assert out[2]["lcc_q"] == 1_000_000
    assert out[3]["lcc_q"] == 333_333  # 1/3 half-up at 6dp
    assert out[3]["deg"] == 3 and out[3]["n_tri"] == 1

    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    rows = clustering_coefficient(
        spark.createDataFrame(k4, ["l_id", "r_id"])
    ).collect()
    assert all(r["lcc_q"] == 1_000_000 for r in rows)


def test_clustering_coefficient_zero_and_sql_twin(spark):
    """A star has lcc=0 at the hub (no closed wedges); SQL twin
    agrees on a seeded random graph."""
    import duckdb
    import hashlib

    from news_clustering_and_summarization_spark.operators.graph import (
        clustering_coefficient,
        clustering_coefficient_sql,
    )

    star = [(0, i) for i in range(1, 5)]
    rows = clustering_coefficient(
        spark.createDataFrame(star, ["l_id", "r_id"])
    ).collect()
    assert {r["id"]: r["lcc_q"] for r in rows} == {0: 0}

    edges = []
    for i in range(25):
        for j in range(25):
            h = hashlib.md5(f"cc|{i}|{j}".encode()).hexdigest()
            if int(h[:8], 16) % 4 == 0:
                edges.append((i, j))
    df = spark.createDataFrame(edges, ["l_id", "r_id"])
    got = sorted(tuple(r) for r in clustering_coefficient(df).collect())
    values = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = clustering_coefficient_sql(
        f"SELECT * FROM (VALUES {values}) t(l_id, r_id)"
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want


def test_link_predict_hand_case_and_cap(spark):
    """Path 1-2-3 predicts (1,3) via center 2 (deg 2 -> ra 5e8); a
    square 1-2-3-4-1 predicts both diagonals with cn=2. Adjacent
    pairs never appear. max_degree drops hub-centered wedges."""
    from news_clustering_and_summarization_spark.operators.graph import (
        link_predict,
    )

    path = spark.createDataFrame([(1, 2), (2, 3)], ["l_id", "r_id"])
    rows = link_predict(path, top_k=10).collect()
    assert [(r["u"], r["w"], r["cn"], r["ra_q"]) for r in rows] == [
        (1, 3, 1, 500_000_000)
    ]

    sq = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], ["l_id", "r_id"]
    )
    rows = link_predict(sq, top_k=10).collect()
    got = {(r["u"], r["w"]): (r["cn"], r["ra_q"]) for r in rows}
    assert got == {
        (1, 3): (2, 1_000_000_000),
        (2, 4): (2, 1_000_000_000),
    }

    # star hub deg 4: capping at 3 removes every wedge
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], ["l_id", "r_id"]
    )
    assert link_predict(star, top_k=10, max_degree=3).count() == 0
    assert link_predict(star, top_k=10).count() == 6


def test_link_predict_sql_matches_spark(spark):
    import duckdb
    import hashlib

    from news_clustering_and_summarization_spark.operators.graph import (
        link_predict,
        link_predict_sql,
    )

    edges = []
    for i in range(25):
        for j in range(25):
            h = hashlib.md5(f"lp|{i}|{j}".encode()).hexdigest()
            if int(h[:8], 16) % 4 == 0:
                edges.append((i, j))
    df = spark.createDataFrame(edges, ["l_id", "r_id"])
    got = [
        tuple(r)
        for r in link_predict(df, top_k=20, max_degree=10).collect()
    ]
    values = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = link_predict_sql(
        f"SELECT * FROM (VALUES {values}) t(l_id, r_id)",
        top_k=20,
        max_degree=10,
    )
    want = [tuple(r) for r in duckdb.sql(sql).fetchall()]
    assert got == want


def test_bfs_levels_path_graph(spark):
    """Path 0-1-2-3: levels equal hop distance; vertex 9 in a
    separate component is absent; fixpoint certified."""
    from news_clustering_and_summarization_spark.operators.graph import (
        bfs_levels,
    )

    edges = [(0, 1), (1, 2), (2, 3), (9, 10)]
    df = spark.createDataFrame(edges, ["l_id", "r_id"])
    rows = {r["id"]: r for r in bfs_levels(df, seed=0, rounds=5).collect()}
    assert {k: v["level"] for k, v in rows.items()} == {
        0: 0, 1: 1, 2: 2, 3: 3,
    }
    assert 9 not in rows and 10 not in rows
    assert all(r["frontier_exhausted"] for r in rows.values())


def test_bfs_levels_fixpoint_flag_flips(spark):
    """With rounds smaller than the eccentricity the certificate
    goes false — the in-band proof the hash relies on."""
    from news_clustering_and_summarization_spark.operators.graph import (
        bfs_levels,
    )

    edges = [(0, 1), (1, 2), (2, 3)]
    df = spark.createDataFrame(edges, ["l_id", "r_id"])
    rows = bfs_levels(df, seed=0, rounds=2).collect()
    assert {r["id"] for r in rows} == {0, 1, 2}
    assert not any(r["frontier_exhausted"] for r in rows)


def test_bfs_levels_sql_matches_spark_on_random_graph(spark):
    """DuckDB twin agrees on a deterministic Erdos-Renyi graph,
    including dup/reversed edges and self loops."""
    import duckdb
    import hashlib

    from news_clustering_and_summarization_spark.operators.graph import (
        bfs_levels,
        bfs_levels_sql,
    )

    edges = [(5, 5)]
    for i in range(30):
        for j in range(30):
            h = hashlib.md5(f"bfs|{i}|{j}".encode()).hexdigest()
            if int(h[:8], 16) % 14 == 0:
                edges.append((i, j))
    df = spark.createDataFrame(edges, ["l_id", "r_id"])
    got = sorted(tuple(r) for r in bfs_levels(df, seed=0, rounds=8).collect())
    values = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = bfs_levels_sql(
        f"SELECT * FROM (VALUES {values}) t(l_id, r_id)", seed=0, rounds=8
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want


def test_sssp_prefers_cheap_multi_hop_path(spark):
    """Triangle 0-1-2 where the direct 0->2 edge (w=10) loses to the
    two-hop path through 1 (w=2+3); negative-free hand case with an
    unreachable vertex absent."""
    from news_clustering_and_summarization_spark.operators.graph import (
        sssp,
    )

    edges = [(0, 1, 2), (1, 2, 3), (0, 2, 10), (7, 8, 1)]
    df = spark.createDataFrame(edges, ["l_id", "r_id", "w"])
    rows = {r["id"]: r for r in sssp(df, seed=0, rounds=5).collect()}
    assert {k: v["dist"] for k, v in rows.items()} == {0: 0, 1: 2, 2: 5}
    assert 7 not in rows and 8 not in rows
    assert all(r["converged"] for r in rows.values())


def test_sssp_parallel_edges_keep_cheapest_and_certificate_flips(spark):
    """Duplicate edges collapse to the min weight; with rounds too
    small for the relaxation to finish the converged flag goes
    false."""
    from news_clustering_and_summarization_spark.operators.graph import (
        sssp,
    )

    edges = [(0, 1, 9), (0, 1, 4), (1, 2, 1), (2, 3, 1), (3, 4, 1)]
    df = spark.createDataFrame(edges, ["l_id", "r_id", "w"])
    done = {r["id"]: r["dist"] for r in sssp(df, seed=0, rounds=6).collect()}
    assert done == {0: 0, 1: 4, 2: 5, 3: 6, 4: 7}
    early = sssp(df, seed=0, rounds=2).collect()
    assert not any(r["converged"] for r in early)


def test_sssp_sql_matches_spark_on_random_graph(spark):
    """DuckDB twin bit-match on a deterministic weighted random
    graph with parallel edges and self loops."""
    import duckdb
    import hashlib

    from news_clustering_and_summarization_spark.operators.graph import (
        sssp,
        sssp_sql,
    )

    edges = [(4, 4, 1)]
    for i in range(25):
        for j in range(25):
            h = hashlib.md5(f"sp|{i}|{j}".encode()).hexdigest()
            if int(h[:8], 16) % 11 == 0:
                edges.append((i, j, int(h[8:10], 16) % 7 + 1))
    df = spark.createDataFrame(edges, ["l_id", "r_id", "w"])
    got = sorted(tuple(r) for r in sssp(df, seed=0, rounds=12).collect())
    values = ", ".join(f"({a}, {b}, {w})" for a, b, w in edges)
    sql = sssp_sql(
        f"SELECT * FROM (VALUES {values}) t(l_id, r_id, w)",
        seed=0,
        rounds=12,
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want


def test_personalized_pagerank_duplicate_seeds_deduped(spark):
    """r08 advisor: duplicate rows in `seeds` must not multiply base
    rows through the left join or inflate n_seeds — the operator
    de-duplicates, so dup-seed input is bit-identical to distinct."""
    from news_clustering_and_summarization_spark.operators.graph import (
        personalized_pagerank,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 1)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    dup_seeds = spark.createDataFrame([(1,), (1,), (1,)], ["node"])
    want = sorted(
        tuple(r) for r in personalized_pagerank(edges, seeds).collect()
    )
    got = sorted(
        tuple(r) for r in personalized_pagerank(edges, dup_seeds).collect()
    )
    assert got == want
    # one row per node, not one per (node, seed-dup)
    assert len(got) == 3


def test_hits_bipartite_star_and_sql_twin(spark):
    """Star: hub u points at v1..v3, hub w points at v1 only. After
    any iteration v1 is the top authority and u the top hub (strictly
    above w/v2/v3); the DuckDB unrolled replay is bit-identical."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.graph import (
        hits_scores,
        hits_sql,
    )

    edges = [(1, 11), (1, 12), (1, 13), (2, 11)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = sorted(tuple(r) for r in hits_scores(df, iterations=3).collect())
    by_node = {t[0]: t for t in got}
    assert by_node[1][1] > by_node[2][1]  # u out-hubs w
    assert by_node[11][2] > by_node[12][2]  # v1 out-auths v2
    assert by_node[12][2] == by_node[13][2]  # symmetric leaves tie
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    frag, final = hits_sql("e", iterations=3)
    want = sorted(
        con.execute(
            f"WITH {frag} SELECT node, hub_q, auth_q FROM {final}"
        ).fetchall()
    )
    assert got == want


def test_hits_no_edges_degenerate(spark):
    from news_clustering_and_summarization_spark.operators.graph import (
        hits_scores,
    )

    empty = spark.createDataFrame([], "src long, dst long")
    assert hits_scores(empty, iterations=2).collect() == []


def test_wl_fingerprint_distinguishes_structure(spark):
    """Path a-b-c vs triangle x-y-z: after 2 WL rounds the path's
    endpoints share a fingerprint, its middle differs, and all
    triangle nodes share one (degree-2 but different neighborhoods
    than the path middle); the SQL twin is bit-identical."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.graph import (
        wl_fingerprint,
        wl_fingerprint_sql,
    )

    edges = [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r for r in wl_fingerprint(df, rounds=2).collect()}
    assert got[1]["wl_q"] == got[3]["wl_q"]          # path endpoints
    assert got[1]["wl_q"] != got[2]["wl_q"]          # middle differs
    assert got[10]["wl_q"] == got[11]["wl_q"] == got[12]["wl_q"]
    assert got[2]["wl_q"] != got[10]["wl_q"]         # middle != triangle
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    frag, final = wl_fingerprint_sql("e", rounds=2)
    want = sorted(
        con.execute(
            f"WITH {frag} SELECT node, degree, wl_q FROM {final}"
        ).fetchall()
    )
    assert sorted(tuple(r) for r in wl_fingerprint(df, 2).collect()) == want
