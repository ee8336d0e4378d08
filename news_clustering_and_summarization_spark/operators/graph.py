"""PageRank-style link centrality in pure DataFrame operations.

Web-crawl corpus building ranks pages by link centrality before
filtering (quality weighting, crawl prioritization, seed selection —
the Common-Crawl-style pipelines the training-data extension surface
targets); the reference has no graph operator, so this is an engine
extension in the same family as connected components
(operators/cluster.py). The algorithm is the standard damped
power iteration; the engineering choices are about scale and
cross-engine determinism:

* **Exact fixed-point arithmetic.** Ranks are integers scaled by
  10^12; every step is integer division and integer sums, which are
  associative — unordered partial aggregation in Spark and DuckDB
  produce the SAME bits, so the SQL oracle replays the iteration
  exactly (no float-summation ulp drift, the problem the k-means
  oracle solves by per-iteration rounding — here nothing needs
  rounding at all). rank/10^12 recovers the conventional value;
  truncation loses < outdeg · 10^-12 rank mass per node per step.
* **One shuffle per iteration.** Each step is
  ``ranks ⋈ edges on src`` then ``groupBy(dst).sum``; ranks carry one
  row per node (≪ edges), so AQE broadcasts the rank side and only
  the edge->dst aggregation exchanges data. The edge table is scanned
  once per iteration from its (src)-partitioned cache.
* **Bounded driver state: none.** The node count enters the plan as a
  broadcast one-row aggregate (crossJoin of a count), not a collected
  scalar, so the whole loop is lazy until the caller acts.
* **Dangling mass.** Nodes without out-edges keep only teleport rank
  (their mass is dropped, the simplified variant most engines ship);
  symmetric edge lists (like co-occurrence graphs) have no dangling
  nodes, making conservation exact up to truncation — asserted in
  tests/test_graph.py.

At 100 TB-scale graphs the iteration count is the only knob: each
iteration costs one edge-table scan plus one shuffle of one row per
(dst, iteration) — the canonical Pregel-lite shape. localCheckpoint
every few iterations truncates the growing lineage (the loop does it
at ``checkpoint_every``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["SCALE", "pagerank_fixed_point"]

SCALE = 10**12  # fixed-point denominator: rank value = rank / SCALE

# Driver-local fixed-point gate (r12): beneath this many edges the
# power iteration runs on one collected edge list — the same
# small-graph escape hatch connected_components takes
# (LOCAL_CC_EDGES). Every step is EXACT int64 arithmetic (floor
# division and sums of non-negative fixed-point integers — total rank
# mass stays ~SCALE, so num*inflow <= ~85e12 « 2^63), so the local
# ranks are BIT-IDENTICAL to the distributed ones by construction —
# no rounding contract is even involved, unlike the kmeans local
# path. Gate choice is MEASURED, not maximal: at 500k edges the
# collected list is ~8 MB and the win is decisive (keyword_textrank's
# 552-edge word graph: paired-ratio 0.44 — three fixed-cost shuffle
# jobs become one tiny collect); at 2.4M edges (q_pagerank's
# co-purchase graph) the 40 MB single-threaded driver collect costs
# as much as the three distributed iterations it replaces
# (paired-ratio 1.12 — measured, rejected), so bigger graphs stay
# distributed.
LOCAL_PR_EDGES = 500_000


def _local_pagerank(
    e: DataFrame, iterations: int, damping_num: int, damping_den: int
) -> DataFrame:
    """Collected power iteration (exact int64 replica of the
    distributed loop): contrib = rank div outdeg per src, inflow =
    sum of contribs per dst (int64 scatter-add), rank = teleport +
    (num * inflow) div den; dangling nodes keep teleport only
    (inflow 0). Node ids may be ints or strings — ids are only
    grouped, never computed on."""
    import numpy as np
    import pandas as pd

    from ..session import local_df

    id_t0 = dict(e.dtypes)["src"]
    pdf = e.toPandas()
    if len(pdf) == 0:  # empty graph: empty result, like the dist path
        return local_df(e.sparkSession, [], f"node {id_t0}, rank long")
    both = pd.concat([pdf["src"], pdf["dst"]], ignore_index=True)
    codes, nodes = pd.factorize(both, use_na_sentinel=False)
    n_edges = len(pdf)
    si = codes[:n_edges]
    di = codes[n_edges:]
    n = len(nodes)
    outdeg = np.bincount(si, minlength=n).astype(np.int64)
    rank = np.full(n, SCALE // n, dtype=np.int64)
    teleport = np.int64(
        (SCALE * (damping_den - damping_num)) // (damping_den * n)
    )
    safe_deg = np.maximum(outdeg, 1)  # nodes w/o out-edges never gather
    for _ in range(iterations):
        contrib = rank // safe_deg
        inflow = np.zeros(n, dtype=np.int64)
        np.add.at(inflow, di, contrib[si])
        rank = teleport + (np.int64(damping_num) * inflow) // np.int64(
            damping_den
        )
    id_t = dict(e.dtypes)["src"]
    return local_df(
        e.sparkSession,
        list(zip(nodes.tolist(), rank.tolist())),
        f"node {id_t}, rank long",
    )


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Damped power iteration over ``edges(src, dst)`` (pre-dedup'd by
    the caller if multiplicity should not weight the walk).

    Returns (node, rank) with rank an exact scaled integer:
    rank_0 = SCALE div N, and
    rank_{i+1}(v) = (SCALE*(den-num)) div (den*N)
                  + (num * sum_{u->v} rank_i(u) div outdeg(u)) div den.

    The edge relation is localCheckpointed once up front: it feeds
    the node table, the degree table AND every iteration's contrib
    join, so an unmaterialized (possibly join-heavy) edge lineage
    would re-execute ~iterations+2 times (r07 bench: 6.3s -> 3.4s on
    the sf0.1 co-purchase graph from this cut alone).
    """
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    if e.count() <= LOCAL_PR_EDGES:
        return _local_pagerank(e, iterations, damping_num, damping_den)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_row = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))

    ranks = nodes.crossJoin(F.broadcast(n_row)).select(
        "node",
        F.expr(f"{SCALE} div n_nodes").alias("rank"),
        "n_nodes",
    )
    teleport = F.expr(
        f"({SCALE} * {damping_den - damping_num})"
        f" div ({damping_den} * n_nodes)"
    )
    for i in range(iterations):
        contrib = (
            ranks.join(deg, ranks.node == deg.src)
            .select(
                "src",
                F.expr("rank div outdeg").alias("contrib"),
            )
            .join(e, "src")
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = (
            ranks.join(contrib, ranks.node == contrib.dst, "left")
            .select(
                "node",
                (
                    teleport
                    + F.expr(
                        f"({damping_num} *"
                        " coalesce(inflow, 0))"
                        f" div {damping_den}"
                    )
                ).alias("rank"),
                "n_nodes",
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", "rank")


def pagerank_sql(
    edges_cte: str,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> tuple[str, str]:
    """DuckDB replay: unrolled CTE chain over ``edges_cte(src, dst)``
    — bit-identical to pagerank_fixed_point because every step is
    integer arithmetic. Returns (cte_fragment, final_relation_name);
    the caller splices the fragment into its WITH list and selects
    (node, rank) from the final relation."""
    tele = (
        f"({SCALE} * {damping_den - damping_num})"
        f" // ({damping_den} * (SELECT n FROM n_nodes))"
    )
    parts = [
        f"nodes AS (SELECT DISTINCT src AS node FROM {edges_cte}"
        f" UNION SELECT DISTINCT dst FROM {edges_cte})",
        "n_nodes AS (SELECT count(*) AS n FROM nodes)",
        f"deg AS (SELECT src, count(*) AS outdeg FROM {edges_cte}"
        " GROUP BY src)",
        f"r0 AS (SELECT node, {SCALE} // (SELECT n FROM n_nodes)"
        " AS rank FROM nodes)",
    ]
    prev = "r0"
    for i in range(1, iterations + 1):
        parts.append(
            f"""r{i} AS (
  SELECT nodes.node,
         CAST({tele} + ({damping_num} * coalesce(inf.inflow, 0))
             // {damping_den} AS BIGINT) AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst, sum(c.contrib) AS inflow
    FROM (SELECT {prev}.node AS src, {prev}.rank // deg.outdeg AS contrib
          FROM {prev} JOIN deg ON {prev}.node = deg.src) c
    JOIN {edges_cte} e ON e.src = c.src
    GROUP BY e.dst
  ) inf ON nodes.node = inf.dst
)"""
        )
        prev = f"r{i}"
    return ",\n".join(parts), prev


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Personalized PageRank (r08): the random walk teleports back to
    a SEED SET instead of the uniform distribution — the similarity /
    recommendation form ("rank every node by proximity to these
    seeds"). Exact scaled-integer fixed point like
    [[pagerank_fixed_point]]:

      s(v)        = SCALE div |S|          for v in S, else 0
      rank_0      = s
      rank_{i+1}(v) = (s(v)·(den−num)) div den
                    + (num · Σ_{u→v} rank_i(u) div outdeg(u)) div den

    so both engines agree bit-for-bit with no rounding discipline.
    Same shuffle shape as the uniform variant: one groupBy per
    iteration keyed on dst; seeds broadcast. ``seeds`` is one column
    ``node``; seeds absent from the graph still receive teleport
    mass (they are rankable isolated vertices). Seeds are
    de-duplicated here (r08 advisor finding: duplicate seed rows
    would multiply `base` rows through the left join AND inflate
    n_seeds, double-counting teleport mass identically in both
    engines — invisible to the oracle hash-compare)."""
    seeds = seeds.select("node").distinct()
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .unionAll(seeds.select(F.col("node")))
        .distinct()
    )
    n_seeds = seeds.agg(F.count(F.lit(1)).alias("n_seeds"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    seed_mark = seeds.select("node", F.lit(1).alias("_is_seed"))
    base = nodes.join(F.broadcast(seed_mark), "node", "left").crossJoin(
        F.broadcast(n_seeds)
    ).select(
        "node",
        F.when(
            F.col("_is_seed").isNotNull(),
            F.expr(f"{SCALE} div n_seeds"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("s"),
    ).localCheckpoint(eager=True)
    ranks = base.select("node", F.col("s").alias("rank"))
    for _ in range(iterations):
        contrib = (
            ranks.join(deg, ranks.node == deg.src)
            .select("src", F.expr("rank div outdeg").alias("contrib"))
            .join(e, "src")
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = (
            base.join(contrib, base.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.expr(
                        f"(s * {damping_den - damping_num})"
                        f" div {damping_den}"
                    )
                    + F.expr(
                        f"({damping_num} * coalesce(inflow, 0))"
                        f" div {damping_den}"
                    )
                ).cast("long").alias("rank"),
            )
        )
    return ranks.select("node", "rank")


def personalized_pagerank_sql(
    edges_cte: str,
    seeds_cte: str,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> tuple[str, str]:
    """DuckDB replay of personalized_pagerank — unrolled CTEs,
    bit-identical integer arithmetic. Returns (cte_fragment,
    final_relation); caller splices into its WITH list."""
    parts = [
        f"ppr_nodes AS (SELECT DISTINCT node FROM ("
        f"SELECT src AS node FROM {edges_cte}"
        f" UNION ALL SELECT dst FROM {edges_cte}"
        f" UNION ALL SELECT node FROM {seeds_cte}))",
        # DISTINCT mirrors the operator's seed dedup (r09 review:
        # the r08 fix landed Spark-side only; duplicate seed rows
        # would inflate n AND multiply base rows through this join)
        f"ppr_seeds AS (SELECT DISTINCT node FROM {seeds_cte})",
        "ppr_ns AS (SELECT count(*) AS n FROM ppr_seeds)",
        f"ppr_deg AS (SELECT src, count(*) AS outdeg FROM {edges_cte}"
        " GROUP BY src)",
        f"ppr_base AS (SELECT n.node, CASE WHEN s.node IS NOT NULL"
        f" THEN {SCALE} // (SELECT n FROM ppr_ns) ELSE 0 END AS s"
        f" FROM ppr_nodes n LEFT JOIN ppr_seeds s ON n.node = s.node)",
        "ppr_r0 AS (SELECT node, s AS rank FROM ppr_base)",
    ]
    prev = "ppr_r0"
    for i in range(1, iterations + 1):
        parts.append(
            f"""ppr_r{i} AS (
  SELECT b.node,
         CAST((b.s * {damping_den - damping_num}) // {damping_den}
              + ({damping_num} * coalesce(inf.inflow, 0))
                // {damping_den} AS BIGINT) AS rank
  FROM ppr_base b LEFT JOIN (
    SELECT e.dst, sum(c.contrib) AS inflow
    FROM (SELECT {prev}.node AS src, {prev}.rank // d.outdeg AS contrib
          FROM {prev} JOIN ppr_deg d ON {prev}.node = d.src) c
    JOIN {edges_cte} e ON e.src = c.src
    GROUP BY e.dst
  ) inf ON b.node = inf.dst
)"""
        )
        prev = f"ppr_r{i}"
    return ",\n".join(parts), prev


# --- TextRank keyword extraction -------------------------------------


def textrank_edges(
    df: "DataFrame",
    text_col: str = "text",
    min_len: int = 4,
) -> "DataFrame":
    """Co-occurrence graph for TextRank keyword extraction (Mihalcea &
    Tarau 2004): candidate words (length >= ``min_len`` after the
    shared tokenizer) that are ADJACENT in the filtered stream get a
    symmetric, deduplicated edge — the original unweighted keyword
    formulation. One explode + one distinct; the graph is
    vocab-bounded (nodes = candidate vocabulary), so the PageRank
    iterations that follow never touch the corpus again."""
    tokf = (
        f"filter(filter(split(lower({text_col}), '[^a-z0-9]+'), "
        f"t -> t != ''), t -> length(t) >= {min_len})"
    )
    # materialize the filtered token array in its own projection: an
    # inlined {tokf} inside the transform lambda would re-run the
    # tokenizer per array INDEX (O(len²) per doc — measured 15s vs
    # 1s at sf0.1); a column reference evaluates once per row
    adj = (
        "CASE WHEN size(tk) < 2 THEN "
        "cast(array() AS array<struct<a string, b string>>) "
        "ELSE transform(sequence(1, size(tk) - 1), "
        "i -> struct(tk[i-1] AS a, tk[i] AS b)) END"
    )
    pairs = (
        df.select(F.expr(tokf).alias("tk"))
        .select(F.explode(F.expr(adj)).alias("p"))
        .select("p.a", "p.b")
    )
    # distinct on CANONICAL (min,max) pairs first — half the rows
    # through the dedup shuffle — then mirror; materialized once so
    # the pagerank iterations that re-scan the edge table don't
    # re-run the corpus explode per iteration
    canon = (
        pairs.where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    return (
        canon.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(
            canon.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .localCheckpoint(eager=False)
    )


def textrank_edges_sql(table: str, text_expr: str, min_len: int = 4) -> str:
    """DuckDB CTE body matching textrank_edges (relation: src, dst)."""
    tokf = (
        f"list_filter(list_filter(regexp_split_to_array(lower({text_expr}),"
        f" '[^a-z0-9]+'), t -> t <> ''), t -> len(t) >= {min_len})"
    )
    return f"""
SELECT DISTINCT src, dst FROM (
  SELECT a AS src, b AS dst FROM (
    SELECT tk[i] AS a, tk[i + 1] AS b
    FROM (SELECT tk, unnest(range(1, len(tk))) AS i
          FROM (SELECT {tokf} AS tk FROM {table})))
  UNION ALL
  SELECT b, a FROM (
    SELECT tk[i] AS a, tk[i + 1] AS b
    FROM (SELECT tk, unnest(range(1, len(tk))) AS i
          FROM (SELECT {tokf} AS tk FROM {table})))
) WHERE src <> dst
"""


# --- semi-supervised label propagation -------------------------------


def label_propagation(
    edges: "DataFrame",
    seeds: "DataFrame",
    iterations: int = 3,
) -> "DataFrame":
    """Semi-supervised label propagation (Zhu & Ghahramani 2002,
    majority-vote variant) over a symmetric ``edges(src, dst)`` graph
    with clamped ``seeds(node, label)`` — the weak-supervision
    annotator of corpus pipelines (propagate a trusted subset's
    language/domain/topic tags to the rest of a near-dup or
    similarity graph).

    Synchronous iterations, fully deterministic: each unlabeled node
    adopts the MAJORITY label of its labeled neighbors (tie -> the
    lexicographically smallest label), keeps its previous label when
    no neighbor is labeled; seeds never change. Each iteration is one
    edge-join + one groupBy + one per-node window (partitioned by
    node, never global) — the Pregel-lite shape pagerank uses, with
    the same unrolled-CTE SQL replay.

    Returns (node, label, is_seed); label NULL where no labeled
    neighborhood reached the node within ``iterations`` hops.
    """
    # materialize the edge list once — every hop re-scans it, and
    # callers often hand in an expensive candidate-pair pipeline
    edges = edges.select("src", "dst").localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    state = nodes.join(seeds, "node", "left").select(
        "node",
        F.col("label"),
        F.col("label").isNotNull().alias("is_seed"),
    )
    for i in range(iterations):
        votes = (
            edges.join(
                state.withColumnRenamed("node", "src"), "src"
            )
            .where(F.col("label").isNotNull())
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        from pyspark.sql import Window as _W

        w = _W.partitionBy("dst").orderBy(F.desc("c"), F.asc("label"))
        best = (
            votes.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("dst", F.col("label").alias("new_label"))
        )
        state = (
            state.join(best, state.node == best.dst, "left")
            .select(
                "node",
                F.when(F.col("is_seed"), F.col("label"))
                .otherwise(F.coalesce("new_label", "label"))
                .alias("label"),
                "is_seed",
            )
            .localCheckpoint(eager=False)
        )
    return state


def label_propagation_sql(
    edges_cte: str, seeds_cte: str, iterations: int = 3
) -> tuple[str, str]:
    """DuckDB replay: unrolled CTE chain over ``edges_cte(src, dst)``
    and ``seeds_cte(node, label)``. Returns (cte_fragment,
    final_relation) selecting (node, label, is_seed)."""
    parts = [
        f"""lp_nodes AS (SELECT DISTINCT src AS node FROM {edges_cte}
  UNION SELECT DISTINCT dst FROM {edges_cte})""",
        f"""s0 AS (
  SELECT n.node, sd.label, sd.label IS NOT NULL AS is_seed
  FROM lp_nodes n LEFT JOIN {seeds_cte} sd ON n.node = sd.node)""",
    ]
    prev = "s0"
    for i in range(1, iterations + 1):
        parts.append(
            f"""b{i} AS (
  SELECT dst, label AS new_label FROM (
    SELECT e.dst, s.label, count(*) AS c,
           row_number() OVER (PARTITION BY e.dst
                              ORDER BY count(*) DESC, s.label) AS rn
    FROM {edges_cte} e JOIN {prev} s ON e.src = s.node
    WHERE s.label IS NOT NULL
    GROUP BY e.dst, s.label)
  WHERE rn = 1)""",
        )
        parts.append(
            f"""s{i} AS (
  SELECT s.node,
         CASE WHEN s.is_seed THEN s.label
              ELSE coalesce(b.new_label, s.label) END AS label,
         s.is_seed
  FROM {prev} s LEFT JOIN b{i} b ON s.node = b.dst)"""
        )
        prev = f"s{i}"
    return ",\n".join(parts), prev


def triangle_counts(
    edges: DataFrame,
    src_col: str = "l_id",
    dst_col: str = "r_id",
    with_total: bool = True,
) -> DataFrame:
    """Per-node triangle counting with degree orientation — the
    standard scalable formulation (Suri & Vassilvitskii 2011,
    "Counting Triangles and the Curse of the Last Reducer"): orient
    every undirected edge from its lower-(degree, id) endpoint to the
    higher one, so each triangle is generated exactly once at its
    minimum-key vertex and — critically at 100 TB — a hot vertex of
    degree D contributes O(D·avg_deg) wedges instead of O(D²): the
    wedge explosion lands on LOW-degree vertices by construction.

    Input: one row per undirected edge (either orientation, no
    self-loops; duplicates are collapsed). Two equi-joins: wedge
    formation on the oriented source, then wedge-closure against the
    oriented edge list. All integer ids/counts — bit-exact on any
    engine.

    Output: (id, n_tri) per vertex in >= 1 triangle, plus total
    triangle count on every row (n_total) for the global audit."""
    e0 = (
        edges.select(
            F.least(src_col, dst_col).alias("u"),
            F.greatest(src_col, dst_col).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        # edge generation (often an expensive similarity kernel) feeds
        # degree AND orientation — cut the lineage so it runs once
        .localCheckpoint(eager=True)
    )
    deg = (
        e0.select(F.col("u").alias("id"))
        .unionAll(e0.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    # total order key: (deg, id) packed into one comparable BIGINT —
    # ids are < 1e9 in every testdata table (documented bound)
    keyed = (
        e0.join(deg.withColumnRenamed("id", "u"), "u")
        .withColumnRenamed("deg", "du")
        .join(deg.withColumnRenamed("id", "v"), "v")
        .withColumnRenamed("deg", "dv")
        .select(
            "u",
            "v",
            (F.col("du") * F.lit(1_000_000_000) + F.col("u")).alias("ku"),
            (F.col("dv") * F.lit(1_000_000_000) + F.col("v")).alias("kv"),
        )
    )
    arcs = keyed.select(
        F.when(F.col("ku") < F.col("kv"), F.col("u"))
        .otherwise(F.col("v"))
        .alias("src"),
        F.when(F.col("ku") < F.col("kv"), F.col("v"))
        .otherwise(F.col("u"))
        .alias("dst"),
        F.greatest("ku", "kv").alias("kdst"),
    ).localCheckpoint(eager=True)  # consumed 3x (two wedge legs + closure)
    a1 = arcs.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.col("kdst").alias("kb")
    )
    a2 = arcs.select(
        F.col("src").alias("a"), F.col("dst").alias("c"), F.col("kdst").alias("kc")
    )
    wedges = a1.join(a2, "a").where(F.col("kb") < F.col("kc"))
    closing = arcs.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    tris = (
        wedges.join(closing, ["b", "c"])
        .select("a", "b", "c")
        .localCheckpoint(eager=True)  # feeds per-node counts AND total
    )
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    if not with_total:
        # callers that only need per-node counts (e.g.
        # clustering_coefficient) skip the 1-row total crossJoin —
        # Catalyst cannot prune it (an empty aggregate side would
        # change cardinality)
        return per_node.select("id", "n_tri").orderBy("id")
    total = tris.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        per_node.crossJoin(F.broadcast(total))
        .select("id", "n_tri", "n_total")
        .orderBy("id")
    )


def triangle_counts_sql(edges_cte: str) -> str:
    """DuckDB twin of triangle_counts. ``edges_cte`` must be a SELECT
    yielding columns (l_id, r_id) — one row per undirected edge in
    either orientation."""
    return f"""
WITH raw_edges AS MATERIALIZED ({edges_cte}),
e0 AS (
  SELECT DISTINCT least(l_id, r_id) AS u, greatest(l_id, r_id) AS v
  FROM raw_edges WHERE l_id <> r_id
),
deg AS (
  SELECT id, count(*)::BIGINT AS deg
  FROM (SELECT u AS id FROM e0 UNION ALL SELECT v FROM e0)
  GROUP BY id
),
keyed AS (
  SELECT u, v, du.deg * 1000000000 + u AS ku, dv.deg * 1000000000 + v AS kv
  FROM e0 JOIN deg du ON du.id = u JOIN deg dv ON dv.id = v
),
arcs AS (
  SELECT CASE WHEN ku < kv THEN u ELSE v END AS src,
         CASE WHEN ku < kv THEN v ELSE u END AS dst,
         greatest(ku, kv) AS kdst
  FROM keyed
),
wedges AS (
  SELECT a1.src AS a, a1.dst AS b, a2.dst AS c
  FROM arcs a1 JOIN arcs a2 ON a1.src = a2.src
  WHERE a1.kdst < a2.kdst
),
tris AS (
  SELECT w.a, w.b, w.c
  FROM wedges w JOIN arcs cl ON cl.src = w.b AND cl.dst = w.c
),
per_node AS (
  SELECT id, count(*)::BIGINT AS n_tri
  FROM (SELECT unnest([a, b, c]) AS id FROM tris)
  GROUP BY id
)
SELECT id, n_tri, (SELECT count(*)::BIGINT FROM tris) AS n_total
FROM per_node ORDER BY id
"""


def kcore(
    edges: DataFrame,
    k: int = 4,
    rounds: int = 10,
    src_col: str = "l_id",
    dst_col: str = "r_id",
) -> DataFrame:
    """k-core decomposition by synchronous peeling (Matula & Beck
    1983; the BSP formulation is the standard distributed one):
    repeatedly delete every vertex whose degree among SURVIVORS is
    < k; the fixpoint is the maximal subgraph with min degree >= k —
    the community-density filter that separates a dense near-dup
    cluster from its periphery.

    Runs EXACTLY ``rounds`` synchronous peels (the oracle unrolls
    them), then performs one more degree pass to certify the
    fixpoint: ``converged`` is true iff no vertex would be dropped
    in round rounds+1. A green hash therefore certifies BOTH the
    peeling arithmetic and that the answer IS the k-core (pick
    ``rounds`` with margin; peeling converges in O(diameter)-ish
    rounds in practice — 7 on the densest testdata graph).

    Per round: one both-endpoints semi-join against the survivor
    set + one degree groupBy — everything keys on vertex id; the
    survivor table only shrinks. Same shape at any scale.

    Output: (id, core_deg, core_size, converged) for core members."""
    e0 = (
        edges.select(
            F.least(src_col, dst_col).alias("u"),
            F.greatest(src_col, dst_col).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    alive = (
        e0.select(F.col("u").alias("id"))
        .unionAll(e0.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def survivor_degrees(alive_df: DataFrame) -> DataFrame:
        act = e0.join(
            alive_df.withColumnRenamed("id", "u"), "u", "left_semi"
        ).join(alive_df.withColumnRenamed("id", "v"), "v", "left_semi")
        return (
            act.select(F.col("u").alias("id"))
            .unionAll(act.select(F.col("v").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        )

    for _ in range(rounds):
        alive = (
            survivor_degrees(alive)
            .where(F.col("deg") >= k)
            .select("id")
            .localCheckpoint(eager=True)
        )
    final = survivor_degrees(alive).join(alive, "id", "left_semi")
    stats = final.agg(
        F.count(F.lit(1)).cast("long").alias("core_size"),
        F.min("deg").alias("_min_deg"),
    )
    return (
        final.crossJoin(F.broadcast(stats))
        .select(
            "id",
            F.col("deg").alias("core_deg"),
            "core_size",
            (F.coalesce(F.col("_min_deg"), F.lit(k)) >= k).alias(
                "converged"
            ),
        )
        .orderBy("id")
    )


def kcore_sql(
    edges_cte: str, k: int = 4, rounds: int = 10
) -> str:
    """DuckDB twin of kcore (peels unrolled as CTEs).

    Every per-round CTE is MATERIALIZED: each round references the
    previous survivor set four times, so inlined (non-materialized)
    CTEs would re-evaluate the whole chain ~4**rounds times."""
    ctes = [
        f"raw_edges AS MATERIALIZED ({edges_cte})",
        """e0 AS MATERIALIZED (
  SELECT DISTINCT least(l_id, r_id) AS u, greatest(l_id, r_id) AS v
  FROM raw_edges WHERE l_id <> r_id
)""",
        """a0 AS MATERIALIZED (
  SELECT DISTINCT id FROM (SELECT u AS id FROM e0
                           UNION ALL SELECT v FROM e0)
)""",
    ]
    prev = "a0"
    for t in range(1, rounds + 1):
        ctes.append(
            f"""d{t} AS MATERIALIZED (
  SELECT id, count(*)::BIGINT AS deg
  FROM (SELECT u AS id FROM e0
        WHERE u IN (SELECT id FROM {prev})
          AND v IN (SELECT id FROM {prev})
        UNION ALL
        SELECT v FROM e0
        WHERE u IN (SELECT id FROM {prev})
          AND v IN (SELECT id FROM {prev}))
  GROUP BY id
)"""
        )
        ctes.append(
            f"a{t} AS MATERIALIZED "
            f"(SELECT id FROM d{t} WHERE deg >= {k})"
        )
        prev = f"a{t}"
    ctes.append(
        f"""fin AS (
  SELECT id, count(*)::BIGINT AS deg
  FROM (SELECT u AS id FROM e0
        WHERE u IN (SELECT id FROM {prev})
          AND v IN (SELECT id FROM {prev})
        UNION ALL
        SELECT v FROM e0
        WHERE u IN (SELECT id FROM {prev})
          AND v IN (SELECT id FROM {prev}))
  GROUP BY id
)""",
    )
    ctes.append(
        f"""core AS (
  SELECT f.id, f.deg FROM fin f
  WHERE f.id IN (SELECT id FROM {prev})
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT c.id, c.deg AS core_deg, s.core_size,
       (coalesce(s.min_deg, {k}) >= {k}) AS converged
FROM core c, (SELECT count(*)::BIGINT AS core_size, min(deg) AS min_deg
              FROM core) s
ORDER BY c.id
"""
    )


def clustering_coefficient(
    edges: DataFrame,
    src_col: str = "l_id",
    dst_col: str = "r_id",
) -> DataFrame:
    """Local clustering coefficient (Watts & Strogatz 1998):
    lcc(v) = 2*tri(v) / (deg(v)*(deg(v)-1)) for deg >= 2 — the
    density of a node's neighborhood, the standard community-
    tightness signal next to [[kcore]]'s global one.

    Triangles come from :func:`triangle_counts` (degree-oriented
    wedges — never the naive deg^2 explosion); degrees are one
    groupBy. Both key on vertex id, so the join is co-partitioned.

    Determinism: tri and deg are exact integers; the coefficient is
    ONE IEEE division of exact ints (2*tri*1e6 / denom) then
    arithmetic half-up rounding — bit-identical across engines
    (see functions/exact.py rationale).

    Output: (id, deg, n_tri, lcc_q) with lcc_q = round(lcc * 1e6).
    """
    e0 = (
        edges.select(
            F.least(src_col, dst_col).alias("u"),
            F.greatest(src_col, dst_col).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)  # feeds degrees AND triangles
    )
    deg = (
        e0.select(F.col("u").alias("id"))
        .unionAll(e0.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .where(F.col("deg") >= 2)
    )
    tri = triangle_counts(e0, "u", "v", with_total=False)
    denom = F.col("deg") * (F.col("deg") - F.lit(1))
    num = (
        F.coalesce(F.col("n_tri"), F.lit(0)) * F.lit(2_000_000)
    ).cast("double")
    return (
        deg.join(tri, "id", "left")
        .select(
            "id",
            "deg",
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
            F.floor(num / denom.cast("double") + F.lit(0.5))
            .cast("long")
            .alias("lcc_q"),
        )
        .orderBy("id")
    )


def clustering_coefficient_sql(edges_cte: str) -> str:
    """DuckDB twin of clustering_coefficient (shares the
    triangle_counts_sql wedge pipeline)."""
    return f"""
WITH raw_in AS MATERIALIZED ({edges_cte}),
e00 AS MATERIALIZED (
  SELECT DISTINCT least(l_id, r_id) AS u, greatest(l_id, r_id) AS v
  FROM raw_in WHERE l_id <> r_id
),
degs AS (
  SELECT id, count(*)::BIGINT AS deg
  FROM (SELECT u AS id FROM e00 UNION ALL SELECT v FROM e00)
  GROUP BY id HAVING count(*) >= 2
),
tri AS MATERIALIZED (
  SELECT id, n_tri FROM ({triangle_counts_sql(
      "SELECT u AS l_id, v AS r_id FROM e00")})
)
SELECT d.id, d.deg,
       coalesce(t.n_tri, 0)::BIGINT AS n_tri,
       floor((coalesce(t.n_tri, 0) * 2000000)::DOUBLE
             / (d.deg * (d.deg - 1))::DOUBLE + 0.5)::BIGINT AS lcc_q
FROM degs d LEFT JOIN tri t ON t.id = d.id
ORDER BY d.id
"""


def link_predict(
    edges: DataFrame,
    top_k: int = 100,
    max_degree: int = 0,
    src_col: str = "l_id",
    dst_col: str = "r_id",
) -> DataFrame:
    """Link prediction by common-neighbor count + resource-allocation
    index (Zhou, Lu & Zhang 2009: RA(u,w) = sum over common
    neighbors z of 1/deg(z)) — ranks NON-adjacent pairs most likely
    to be the same community, the graph-side dual of embedding
    near-dup mining.

    Shape: adjacency self-join keyed on the shared neighbor z emits
    each wedge once (nbr1 < nbr2), groupBy the candidate pair,
    anti-join the existing edge set, deterministic top-k. The wedge
    count is sum(deg(z)^2); ``max_degree`` (0 = off) drops hub
    wedge-centers first — at 100 TB you always cap (a celebrity hub
    contributes deg^2 wedges and ~zero RA weight: 1/deg each).

    Determinism: cn is an exact count; each RA term is ONE IEEE
    division of exact ints (1e9/deg) half-up-rounded to an
    integer, then summed as integers (order-free). Ranking ties
    break on (u, w).

    Output: (u, w, cn, ra_q) with ra_q = round(sum(1/deg) * 1e9).
    """
    e0 = (
        edges.select(
            F.least(src_col, dst_col).alias("u"),
            F.greatest(src_col, dst_col).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)  # adjacency, degrees, anti-join
    )
    adj = e0.select(F.col("u").alias("z"), F.col("v").alias("nbr")).unionAll(
        e0.select(F.col("v").alias("z"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy("z").agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    if max_degree > 0:
        deg = deg.where(F.col("deg") <= max_degree)
    ra_term = F.floor(
        F.lit(1_000_000_000).cast("double") / F.col("deg").cast("double")
        + F.lit(0.5)
    ).cast("long")
    centers = adj.join(deg, "z").select("z", "nbr", ra_term.alias("ra_t"))
    a1 = centers.select("z", F.col("nbr").alias("cu"), "ra_t")
    a2 = centers.select("z", F.col("nbr").alias("cw"))
    cand = (
        a1.join(a2, "z")
        .where(F.col("cu") < F.col("cw"))
        .groupBy("cu", "cw")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cn"),
            F.sum("ra_t").cast("long").alias("ra_q"),
        )
    )
    return (
        cand.join(
            e0,
            (cand["cu"] == e0["u"]) & (cand["cw"] == e0["v"]),
            "left_anti",
        )
        .select(
            F.col("cu").alias("u"), F.col("cw").alias("w"), "cn", "ra_q"
        )
        .orderBy(
            F.col("cn").desc(), F.col("ra_q").desc(), "u", "w"
        )
        .limit(top_k)
    )


def link_predict_sql(
    edges_cte: str, top_k: int = 100, max_degree: int = 0
) -> str:
    """DuckDB twin of link_predict."""
    cap = f"HAVING count(*) <= {max_degree}" if max_degree > 0 else ""
    return f"""
WITH raw_in AS MATERIALIZED ({edges_cte}),
e00 AS MATERIALIZED (
  SELECT DISTINCT least(l_id, r_id) AS u, greatest(l_id, r_id) AS v
  FROM raw_in WHERE l_id <> r_id
),
adj AS MATERIALIZED (
  SELECT u AS z, v AS nbr FROM e00
  UNION ALL SELECT v, u FROM e00
),
degs AS MATERIALIZED (
  SELECT z, count(*)::BIGINT AS deg,
         floor(1000000000::DOUBLE / count(*)::DOUBLE + 0.5)::BIGINT
           AS ra_t
  FROM adj GROUP BY z {cap}
),
centers AS MATERIALIZED (
  SELECT a.z, a.nbr, d.ra_t FROM adj a JOIN degs d ON d.z = a.z
),
cand AS (
  SELECT a1.nbr AS u, a2.nbr AS w,
         count(*)::BIGINT AS cn, sum(a1.ra_t)::BIGINT AS ra_q
  FROM centers a1 JOIN centers a2 ON a1.z = a2.z AND a1.nbr < a2.nbr
  GROUP BY a1.nbr, a2.nbr
)
SELECT c.u, c.w, c.cn, c.ra_q
FROM cand c ANTI JOIN e00 e ON e.u = c.u AND e.v = c.w
ORDER BY c.cn DESC, c.ra_q DESC, c.u, c.w
LIMIT {top_k}
"""


def bfs_levels(
    edges: DataFrame,
    seed: int,
    rounds: int = 8,
    src_col: str = "l_id",
    dst_col: str = "r_id",
) -> DataFrame:
    """Breadth-first hop levels from a seed vertex — reachability
    with distances, the probe behind "how many hops connect these
    communities" / diameter estimation. Synchronous frontier
    expansion (the Pregel BFS): per round one neighbor semi-join +
    one anti-join against the visited set; each round's frontier is
    localCheckpointed so lineage stays flat.

    Runs EXACTLY ``rounds`` expansions and certifies the fixpoint
    in-band like [[kcore]]: ``frontier_exhausted`` is true iff round
    rounds+1 would add no vertex — a green hash proves BOTH the
    levels and that the reachable set is complete.

    Output: (id, level, frontier_exhausted) for reached vertices."""
    e0 = (
        edges.select(
            F.least(src_col, dst_col).alias("u"),
            F.greatest(src_col, dst_col).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    adj = e0.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        e0.select(F.col("v").alias("a"), F.col("u").alias("b"))
    ).localCheckpoint(eager=True)
    spark = edges.sparkSession
    visited = spark.createDataFrame(
        [(seed, 0)], ["id", "level"]
    ).localCheckpoint(eager=True)
    frontier = visited.select("id")
    for t in range(1, rounds + 1):
        nxt = (
            adj.join(
                frontier.withColumnRenamed("id", "a"), "a", "left_semi"
            )
            .select(F.col("b").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        visited = visited.unionAll(
            nxt.select("id", F.lit(t).alias("level"))
        ).localCheckpoint(eager=True)
        frontier = nxt
    # fixpoint certificate: one more expansion must be empty
    extra = (
        adj.join(frontier.withColumnRenamed("id", "a"), "a", "left_semi")
        .select(F.col("b").alias("id"))
        .distinct()
        .join(visited.select("id"), "id", "left_anti")
        .agg(F.count(F.lit(1)).alias("n_more"))
    )
    return (
        visited.crossJoin(F.broadcast(extra))
        .select(
            "id",
            F.col("level").cast("long").alias("level"),
            (F.col("n_more") == 0).alias("frontier_exhausted"),
        )
        .orderBy("id")
    )


def bfs_levels_sql(edges_cte: str, seed: int, rounds: int = 8) -> str:
    """DuckDB twin of bfs_levels (rounds unrolled, every per-round
    CTE MATERIALIZED — see kcore_sql's blowup note)."""
    ctes = [
        f"raw_e AS MATERIALIZED ({edges_cte})",
        """eb AS MATERIALIZED (
  SELECT DISTINCT least(l_id, r_id) AS u, greatest(l_id, r_id) AS v
  FROM raw_e WHERE l_id <> r_id
)""",
        """adjb AS MATERIALIZED (
  SELECT u AS a, v AS b FROM eb UNION ALL SELECT v, u FROM eb
)""",
        f"vis0 AS MATERIALIZED (SELECT {seed}::BIGINT AS id, 0 AS level)",
        f"fr0 AS MATERIALIZED (SELECT {seed}::BIGINT AS id)",
    ]
    prev_v, prev_f = "vis0", "fr0"
    for t in range(1, rounds + 1):
        ctes.append(
            f"""nx{t} AS MATERIALIZED (
  SELECT DISTINCT b AS id FROM adjb
  WHERE a IN (SELECT id FROM {prev_f})
    AND b NOT IN (SELECT id FROM {prev_v})
)"""
        )
        ctes.append(
            f"""vis{t} AS MATERIALIZED (
  SELECT id, level FROM {prev_v}
  UNION ALL SELECT id, {t} AS level FROM nx{t}
)"""
        )
        prev_v, prev_f = f"vis{t}", f"nx{t}"
    ctes.append(
        f"""extra AS (
  SELECT count(*) AS n_more FROM (
    SELECT DISTINCT b FROM adjb
    WHERE a IN (SELECT id FROM {prev_f})
      AND b NOT IN (SELECT id FROM {prev_v})
  )
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT v.id, v.level::BIGINT AS level,
       (e.n_more = 0) AS frontier_exhausted
FROM {prev_v} v, extra e
ORDER BY v.id
"""
    )


def sssp(
    edges: DataFrame,
    seed: int,
    rounds: int = 10,
    src_col: str = "l_id",
    dst_col: str = "r_id",
    weight_col: str = "w",
) -> DataFrame:
    """Single-source shortest paths with non-negative INTEGER edge
    weights — the weighted generalization of [[bfs_levels]] ("how
    close is everything to this document under similarity cost"),
    and the last classic missing from the Pregel-lite family
    (r07 verdict item 5). Synchronous Bellman-Ford relaxation: per
    round ONE adjacency join + ONE min-groupBy, state is the
    (vertex, best_dist) table, lineage cut per round with
    localCheckpoint. No negative weights by contract, so
    ``rounds`` >= the hop count of the longest shortest path
    guarantees convergence.

    Fixpoint certified in-band like [[kcore]]/[[bfs_levels]]:
    ``converged`` is true iff round rounds+1 improves no vertex — a
    green hash proves the distances are final, not just "rounds ran
    out".

    Output: (id, dist, converged) for vertices reachable from
    ``seed``; unreachable vertices are absent (infinite distance).

    100 TB shape: the per-round state is O(V) keyed by vertex id,
    relaxation is an equi-join edges-to-frontier on the source key —
    the same bucketed-join scaling story as pagerank; weights stay
    int64 so min() is exact and engine-order-free."""
    e0 = (
        edges.select(
            F.col(src_col).alias("u"),
            F.col(dst_col).alias("v"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))  # parallel edges: keep cheapest
        .localCheckpoint(eager=True)
    )
    adj = e0.unionAll(
        e0.select(
            F.col("v").alias("u"), F.col("u").alias("v"), "w"
        )
    ).localCheckpoint(eager=True)
    spark = edges.sparkSession
    dist = spark.createDataFrame([(seed, 0)], ["id", "dist"]).select(
        "id", F.col("dist").cast("long").alias("dist")
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        relaxed = (
            adj.join(dist.withColumnRenamed("id", "u"), "u")
            .select(
                F.col("v").alias("id"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    # fixpoint certificate: one more relaxation must improve nothing
    once_more = (
        adj.join(dist.withColumnRenamed("id", "u"), "u")
        .select(
            F.col("v").alias("id"),
            (F.col("dist") + F.col("w")).alias("nd"),
        )
        .groupBy("id")
        .agg(F.min("nd").alias("nd"))
        .join(dist, "id", "left_outer")
        .where(
            F.col("dist").isNull() | (F.col("nd") < F.col("dist"))
        )
        .agg(F.count(F.lit(1)).alias("n_improved"))
    )
    return (
        dist.crossJoin(F.broadcast(once_more))
        .select(
            "id",
            F.col("dist").cast("long").alias("dist"),
            (F.col("n_improved") == 0).alias("converged"),
        )
        .orderBy("id")
    )


def sssp_sql(
    edges_cte: str, seed: int, rounds: int = 10
) -> str:
    """DuckDB twin of sssp. ``edges_cte`` must yield
    (l_id, r_id, w) with non-negative integer weights. Rounds
    unrolled; every per-round CTE MATERIALIZED (kcore_sql's
    re-inlining blowup note)."""
    ctes = [
        f"raw_e AS MATERIALIZED ({edges_cte})",
        """ew AS MATERIALIZED (
  SELECT u, v, min(w) AS w FROM (
    SELECT l_id AS u, r_id AS v, w FROM raw_e WHERE l_id <> r_id
  ) GROUP BY u, v
)""",
        """adjw AS MATERIALIZED (
  SELECT u, v, w FROM ew UNION ALL SELECT v, u, w FROM ew
)""",
        f"d0 AS MATERIALIZED (SELECT {seed}::BIGINT AS id, 0::BIGINT AS dist)",
    ]
    prev = "d0"
    for t in range(1, rounds + 1):
        ctes.append(
            f"""d{t} AS MATERIALIZED (
  SELECT id, min(dist)::BIGINT AS dist FROM (
    SELECT id, dist FROM {prev}
    UNION ALL
    SELECT a.v AS id, d.dist + a.w AS dist
    FROM adjw a JOIN {prev} d ON a.u = d.id
  ) GROUP BY id
)"""
        )
        prev = f"d{t}"
    ctes.append(
        f"""extra AS (
  SELECT count(*) AS n_improved FROM (
    SELECT a.v AS id, min(d.dist + a.w) AS nd
    FROM adjw a JOIN {prev} d ON a.u = d.id
    GROUP BY a.v
  ) n LEFT JOIN {prev} p ON p.id = n.id
  WHERE p.id IS NULL OR n.nd < p.dist
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT d.id, d.dist, (e.n_improved = 0) AS converged
FROM {prev} d, extra e
ORDER BY d.id
"""
    )


def hits_scores(
    edges: DataFrame,
    iterations: int = 3,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over directed
    ``edges(src, dst)`` — the link-quality pair PageRank doesn't
    give: hub = "points at good content", authority = "is good
    content" (crawl-frontier prioritization and source-quality
    weighting in web-corpus builds; the reference has no graph
    operator, engine extension like [[pagerank_fixed_point]]).

    Exact scaled-integer fixed point: h_0 = SCALE everywhere, then
    per iteration a(v) = Σ_{u→v} h(u) followed by max-normalization
    a ← a·SCALE div max(a) (max is exact on integers — the same
    reason embedding_pca renormalizes by max|u|, an L2 norm's sqrt
    would reintroduce a float), then h(u) = Σ_{u→v} a(v) and the
    same normalization. Every step is integer sums + integer
    division, associative and bit-identical across engines; the
    DuckDB oracle replays the iterations unrolled.

    Shape: two dst/src-keyed groupBy shuffles per iteration (the
    Pregel-lite shape); the max enters as a broadcast one-row
    aggregate, never a collected scalar. Nodes with no in-edges
    keep authority 0; no out-edges → hub 0.

    Returns (node, hub_q, auth_q), one row per node incident to any
    edge."""
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    h = nodes.select("node", F.lit(SCALE).cast("long").alias("hub"))

    def _norm(df: DataFrame, col: str) -> DataFrame:
        # x·SCALE overflows int64 once raw inflow sums pass ~9e6·SCALE
        # — widen the product through DECIMAL(38,0)/HUGEINT; the
        # quotient is ≤ SCALE by construction (x ≤ mx), so the final
        # BIGINT cast is safe (verified div/HUGEINT-// parity).
        # The input is materialized FIRST: it feeds both the max
        # aggregate and the main pass, and an unmaterialized double
        # reference doubles the replayed lineage at every one of the
        # 2·iterations normalizations — 2^6 re-executions of the edge
        # joins by iteration 3 (observed: 60s for a 6k-row graph).
        df = df.localCheckpoint(eager=True)
        # _mx stays DECIMAL: a BIGINT cast here would overflow in
        # exactly the >9.2e6-in-edge regime the widened sums exist
        # for (r09 second-pass review) — the expr below casts it to
        # DECIMAL(38,0) anyway
        mx = df.agg(
            F.greatest(F.max(col), F.lit(1))
            .cast("decimal(38,0)")
            .alias("_mx")
        )
        return df.crossJoin(F.broadcast(mx)).select(
            "node",
            F.expr(
                f"CAST((CAST({col} AS DECIMAL(38,0)) * {SCALE})"
                f" div CAST(_mx AS DECIMAL(38,0)) AS BIGINT)"
            ).alias(col),
        )

    a = None
    for _ in range(iterations):
        # sums widen through DECIMAL(38,0): hub values are SCALE=1e12
        # and an int64 sum wraps past ~9.2e6 in-edges (r09 review) —
        # the DuckDB twin's sum(BIGINT) auto-widens to HUGEINT
        a = _norm(
            nodes.join(
                e.join(
                    h.withColumnRenamed("node", "src"), "src"
                )
                .groupBy("dst")
                .agg(
                    F.sum(F.col("hub").cast("decimal(38,0)")).alias("auth")
                )
                .withColumnRenamed("dst", "node"),
                "node",
                "left",
            ).select(
                "node",
                F.coalesce(
                    F.col("auth"), F.lit(0).cast("decimal(38,0)")
                ).alias("auth"),
            ),
            "auth",
        )
        h = _norm(
            nodes.join(
                e.join(
                    a.withColumnRenamed("node", "dst"), "dst"
                )
                .groupBy("src")
                .agg(
                    F.sum(F.col("auth").cast("decimal(38,0)")).alias("hub")
                )
                .withColumnRenamed("src", "node"),
                "node",
                "left",
            ).select(
                "node",
                F.coalesce(
                    F.col("hub"), F.lit(0).cast("decimal(38,0)")
                ).alias("hub"),
            ),
            "hub",
        )
    return (
        h.withColumnRenamed("hub", "hub_q")
        .join(a.withColumnRenamed("auth", "auth_q"), "node")
        .select("node", "hub_q", "auth_q")
    )


def hits_sql(edges_cte: str, iterations: int = 3) -> tuple[str, str]:
    """DuckDB replay of hits_scores: unrolled CTE chain over
    ``edges_cte(src, dst)`` (pre-DISTINCT'd by the caller to match
    the operator's edge dedup). Returns (cte_fragment,
    final_relation) selecting (node, hub_q, auth_q)."""
    parts = [
        f"nodes AS (SELECT DISTINCT src AS node FROM {edges_cte}"
        f" UNION SELECT DISTINCT dst FROM {edges_cte})",
        f"h0 AS (SELECT node, {SCALE}::BIGINT AS hub FROM nodes)",
    ]
    prev_h = "h0"
    a_rel = None
    for i in range(1, iterations + 1):
        parts.append(
            f"""a{i}_raw AS MATERIALIZED (
  SELECT nodes.node, coalesce(inf.auth, 0::HUGEINT) AS auth
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node, sum({prev_h}.hub::HUGEINT) AS auth
    FROM {edges_cte} e JOIN {prev_h} ON e.src = {prev_h}.node
    GROUP BY e.dst
  ) inf USING (node)
)"""
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT node, ((auth::HUGEINT * {SCALE})"
            f" // greatest((SELECT max(auth) FROM a{i}_raw), 1))::BIGINT"
            f" AS auth FROM a{i}_raw)"
        )
        parts.append(
            f"""h{i}_raw AS MATERIALIZED (
  SELECT nodes.node, coalesce(ouf.hub, 0::HUGEINT) AS hub
  FROM nodes LEFT JOIN (
    SELECT e.src AS node, sum(a{i}.auth::HUGEINT) AS hub
    FROM {edges_cte} e JOIN a{i} ON e.dst = a{i}.node
    GROUP BY e.src
  ) ouf USING (node)
)"""
        )
        parts.append(
            f"h{i} AS MATERIALIZED (SELECT node, ((hub::HUGEINT * {SCALE})"
            f" // greatest((SELECT max(hub) FROM h{i}_raw), 1))::BIGINT"
            f" AS hub FROM h{i}_raw)"
        )
        prev_h = f"h{i}"
        a_rel = f"a{i}"
    final = (
        f"hits_out AS (SELECT {prev_h}.node, {prev_h}.hub AS hub_q,"
        f" {a_rel}.auth AS auth_q FROM {prev_h}"
        f" JOIN {a_rel} ON {prev_h}.node = {a_rel}.node)"
    )
    parts.append(final)
    return ",\n".join(parts), "hits_out"


def wl_fingerprint(
    edges: DataFrame,
    rounds: int = 2,
) -> DataFrame:
    """Weisfeiler-Lehman node fingerprints (Shervashidze et al. 2011,
    "Weisfeiler-Lehman graph kernels") over the UNDIRECTED graph of
    ``edges(src, dst)`` — structural node signatures for graph-shaped
    training data: two nodes share a fingerprint after r rounds iff
    their r-hop neighborhood trees are isomorphic, which is the
    standard blocking key for graph dedup and the feature map of the
    WL kernel.

        lbl_0(v) = degree(v)
        lbl_t(v) = hash64(lbl_{t-1}(v) || '|' ||
                          join(sort(multiset of neighbor lbl_{t-1})))

    Determinism: collect_list is partition-order-dependent, so the
    neighbor multiset is array_sort'ed BEFORE hashing (the oracle's
    list(... ORDER BY ...) replays it); hash64 is the md5-derived
    engine-portable hash. Per round: one dst-keyed groupBy over the
    symmetrized edge list — the Pregel-lite shuffle shape; labels are
    localCheckpointed per round (consumed twice: neighbor fan-out and
    the self term).

    Output: (node, degree, wl_q) — wl_q the round-``rounds`` label.
    Isolated nodes don't exist by construction (nodes come from the
    edge list)."""
    from ..functions import hashing as H

    e = edges.select("src", "dst").distinct()
    und = (
        e.unionAll(e.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    lbl = (
        und.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("lbl"))
        .localCheckpoint(eager=True)
    )
    deg = lbl.select("node", F.col("lbl").alias("degree"))
    for _ in range(rounds):
        nbr = (
            und.join(
                lbl.select(F.col("node").alias("dst"),
                           F.col("lbl").alias("_nl")),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(
                F.concat_ws(
                    ",",
                    F.array_sort(F.collect_list(F.col("_nl"))),
                ).alias("_ns")
            )
        )
        lbl = (
            lbl.join(nbr, "node")
            .select(
                "node",
                H.hash64(
                    F.concat_ws("|", F.col("lbl").cast("string"),
                                F.col("_ns"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
    return deg.join(lbl, "node").select(
        "node", "degree", F.col("lbl").alias("wl_q")
    )


def wl_fingerprint_sql(edges_cte: str, rounds: int = 2) -> tuple[str, str]:
    """DuckDB replay of wl_fingerprint: unrolled rounds over
    ``edges_cte(src, dst)``. Returns (cte_fragment, final_relation)
    selecting (node, degree, wl_q)."""
    from ..functions.hashing import hash64_sql

    parts = [
        f"wl_und AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        f"SELECT src, dst FROM {edges_cte}"
        f" UNION ALL SELECT dst, src FROM {edges_cte}))",
        "wl_l0 AS MATERIALIZED (SELECT src AS node,"
        " count(*)::BIGINT AS lbl FROM wl_und GROUP BY src)",
    ]
    prev = "wl_l0"
    for i in range(1, rounds + 1):
        h = hash64_sql(
            "(prev.lbl::VARCHAR || '|' || n.ns)"
        )
        parts.append(
            f"""wl_n{i} AS MATERIALIZED (
  SELECT u.src AS node,
         string_agg(l.lbl::VARCHAR, ',' ORDER BY l.lbl) AS ns
  FROM wl_und u JOIN {prev} l ON u.dst = l.node
  GROUP BY u.src
)"""
        )
        parts.append(
            f"""wl_l{i} AS MATERIALIZED (
  SELECT prev.node, {h} AS lbl
  FROM {prev} prev JOIN wl_n{i} n ON prev.node = n.node
)"""
        )
        prev = f"wl_l{i}"
    parts.append(
        f"wl_out AS (SELECT d.node, d.lbl AS degree, f.lbl AS wl_q"
        f" FROM wl_l0 d JOIN {prev} f ON d.node = f.node)"
    )
    return ",\n".join(parts), "wl_out"


def modularity(
    edges: DataFrame, communities: DataFrame, node_col: str = "node",
    comm_col: str = "community",
) -> DataFrame:
    """Newman modularity of a node partition over an undirected graph
    (Newman & Girvan 2004) — "is the community structure better than
    chance?", the quality gate for any clustering-on-graphs output.

    ``edges`` is the repo's symmetric directed form (both
    orientations present, no self-loops); with M = directed edge
    count (= 2m), E_c = intra-community directed edges and D_c =
    total degree of community c:

        Q = Σ_c (M·E_c − D_c²) / M²

    Everything up to the final division is exact integer arithmetic
    in DECIMAL(38,0) (M·E_c and D_c² pass int64 at ~3e9 edges); the
    one double division per community quantizes half-up at 1e-6.
    Output: one row per community (community, e_c, d_c,
    q_contrib_q), ordered — Q itself is the exact sum of the
    contributions. Shape: two groupBys on the edge list plus a
    broadcast 1-row M total; no global windows, no iteration."""
    lab_src = communities.select(
        F.col(node_col).alias("src"), F.col(comm_col).alias("_c_src")
    )
    lab_dst = communities.select(
        F.col(node_col).alias("dst"), F.col(comm_col).alias("_c_dst")
    )
    labeled = edges.join(lab_src, "src").join(lab_dst, "dst")
    m_tot = labeled.agg(F.count(F.lit(1)).cast("long").alias("M"))
    intra = (
        labeled.where(F.col("_c_src") == F.col("_c_dst"))
        .groupBy(F.col("_c_src").alias(comm_col))
        .agg(F.count(F.lit(1)).cast("long").alias("e_c"))
    )
    degree = (
        labeled.groupBy(F.col("_c_src").alias(comm_col))
        .agg(F.count(F.lit(1)).cast("long").alias("d_c"))
    )
    d38 = "decimal(38,0)"
    return (
        degree.join(intra, comm_col, "left")
        .select(
            comm_col,
            F.coalesce("e_c", F.lit(0)).cast("long").alias("e_c"),
            "d_c",
        )
        .crossJoin(F.broadcast(m_tot))
        .select(
            comm_col,
            "e_c",
            "d_c",
            F.floor(
                (
                    F.col("M").cast(d38) * F.col("e_c").cast(d38)
                    - F.col("d_c").cast(d38) * F.col("d_c").cast(d38)
                ).cast("double")
                / (F.col("M").cast("double") * F.col("M").cast("double"))
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long").alias("q_contrib_q"),
        )
        .orderBy(comm_col)
    )


def modularity_sql(
    edges_cte: str, communities_cte: str, comm_out: str = "community"
) -> str:
    """DuckDB twin of modularity (HUGEINT for the exact products).
    ``edges_cte``/``communities_cte`` are relation names with
    (src, dst) / (node, community) columns."""
    return f"""
labeled AS (
  SELECT e.src, e.dst, cs.community AS c_src, cd.community AS c_dst
  FROM {edges_cte} e
  JOIN {communities_cte} cs ON cs.node = e.src
  JOIN {communities_cte} cd ON cd.node = e.dst
),
m_tot AS (SELECT count(*)::BIGINT AS M FROM labeled),
intra AS (SELECT c_src AS c, count(*)::BIGINT AS e_c FROM labeled
          WHERE c_src = c_dst GROUP BY c_src),
degree AS (SELECT c_src AS c, count(*)::BIGINT AS d_c FROM labeled
           GROUP BY c_src)
SELECT d.c AS {comm_out}, coalesce(i.e_c, 0)::BIGINT AS e_c, d.d_c,
       floor((M::HUGEINT * coalesce(i.e_c, 0)::HUGEINT
              - d.d_c::HUGEINT * d.d_c::HUGEINT)::DOUBLE
             / (M::DOUBLE * M::DOUBLE) * 1e6 + 0.5)::BIGINT
           AS q_contrib_q
FROM degree d LEFT JOIN intra i ON i.c = d.c CROSS JOIN m_tot
ORDER BY {comm_out}
"""


def assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of end-point degrees over the directed-symmetric edge
    list — do hubs link to hubs (r > 0, social graphs) or to leaves
    (r < 0, technological graphs)?

    Reuses the corr_matrix discipline: integer degrees, one map-side-
    combinable aggregation of DECIMAL(38,0) sufficient statistics,
    sqrt as the only irrational, half-up 1e-6 quantization. Zero-
    variance degenerate (regular graph) emits NULL. Output: one row
    (m_edges, r_q)."""
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("_d")
    )
    d19 = "decimal(19,0)"
    paired = (
        edges.join(deg.select(F.col("src"), F.col("_d").alias("dx")), "src")
        .join(
            deg.select(
                F.col("src").alias("dst"), F.col("_d").alias("dy")
            ),
            "dst",
        )
    )
    stats = paired.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("dx").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("dy").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("dx").cast(d19) * F.col("dy").cast(d19)).alias("sxy"),
        F.sum(F.col("dx").cast(d19) * F.col("dx").cast(d19)).alias("sxx"),
        F.sum(F.col("dy").cast(d19) * F.col("dy").cast(d19)).alias("syy"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    num = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return stats.select(
        F.col("n").alias("m_edges"),
        F.when(
            (vx > 0) & (vy > 0),
            F.floor(
                num / (F.sqrt(vx) * F.sqrt(vy)) * F.lit(1e6) + F.lit(0.5)
            ).cast("long"),
        ).alias("r_q"),
    )


def assortativity_sql(edges_cte: str) -> str:
    """DuckDB twin of assortativity."""
    return f"""
deg AS (SELECT src, count(*)::BIGINT AS d FROM {edges_cte} GROUP BY src),
paired AS (
  SELECT ds.d AS dx, dd.d AS dy
  FROM {edges_cte} e JOIN deg ds ON ds.src = e.src
                     JOIN deg dd ON dd.src = e.dst
),
stats AS MATERIALIZED (
  SELECT count(*)::BIGINT AS n,
         sum(dx::HUGEINT) AS sx, sum(dy::HUGEINT) AS sy,
         sum(dx::HUGEINT * dy::HUGEINT) AS sxy,
         sum(dx::HUGEINT * dx::HUGEINT) AS sxx,
         sum(dy::HUGEINT * dy::HUGEINT) AS syy
  FROM paired
)
SELECT n AS m_edges,
       CASE WHEN (n::HUGEINT * sxx - sx * sx) > 0
             AND (n::HUGEINT * syy - sy * sy) > 0
            THEN floor((n::HUGEINT * sxy - sx * sy)::DOUBLE
                 / (sqrt((n::HUGEINT * sxx - sx * sx)::DOUBLE)
                    * sqrt((n::HUGEINT * syy - sy * sy)::DOUBLE))
                 * 1e6 + 0.5)::BIGINT
       END AS r_q
FROM stats
"""
