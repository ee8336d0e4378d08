"""Count-min sketch heavy hitters — approximate frequent-token
tracking whose sketch is itself replayable cross-engine.

At 100 TB the exact token-frequency table is itself a big-data
problem (billions of distinct tokens); a count-min sketch is the
standing answer: d×w counters (kilobytes–megabytes), mergeable across
partitions/days by cell-wise addition, never underestimates. The
reference has no frequency surface (its nearest is TF-IDF idf counts,
helper_functions.py:34-57); this is an engine extension for corpus
telemetry (stopword drift, spam-token floods, vocabulary monitoring).

Design:
* **Build** is ONE shuffle: every token instance expands to d
  (row, bucket) cells in-row (the d hashes are md5-derived via
  functions/hashing.hash64 — deterministic and bit-replayable in SQL),
  then a single groupBy(row, bucket) with map-side combine. The
  result is d×w rows — driver/broadcast scale by construction.
* **Estimate** broadcasts the sketch: each query token computes its d
  buckets in-row, joins the sketch cells, takes min over d. The CMS
  guarantee (estimate >= true count; overestimate ~N/w in
  expectation) is asserted in-plan in the catalog query.
* **Merge** (day -> week rollups) is cell-wise addition on (row,
  bucket) — same decomposable-state pattern as
  operators/incremental.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions.exact import half_away_div

__all__ = ["CMS_SEEDS", "cms_build", "cms_estimate", "cms_merge"]

# one seed per sketch row; md5(seed|token) keeps rows independent
CMS_SEEDS: tuple[int, ...] = (101, 202, 303)


def _bucket(tok: Column, seed: int, width: int) -> Column:
    # hash64 is a positive 60-bit value, so % == pmod
    return H.hash64(tok, seed=seed) % F.lit(width)


def cms_build(
    df: DataFrame, token_col: str, width: int, seeds: tuple[int, ...] = CMS_SEEDS
) -> DataFrame:
    """Build the sketch from a DataFrame of token INSTANCES (one row
    per occurrence). Returns (row, bucket, cnt) — d×width rows max."""
    tok = F.col(token_col)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        _bucket(tok, seed, width).alias("bucket"),
                    )
                    for d, seed in enumerate(seeds)
                ]
            )
        ).alias("c")
    ).select("c.*")
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    queries: DataFrame,
    token_col: str,
    sketch: DataFrame,
    width: int,
    seeds: tuple[int, ...] = CMS_SEEDS,
) -> DataFrame:
    """Point-estimate each distinct token in ``queries``: min over the
    d sketch rows of the token's bucket counter. The sketch is tiny by
    construction — broadcast it so the lookup never shuffles the query
    side. Tokens whose buckets were never touched estimate to 0
    (possible only for tokens absent from the build corpus)."""
    tok = F.col(token_col)
    qcells = queries.select(
        tok.alias("token"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        _bucket(tok, seed, width).alias("bucket"),
                    )
                    for d, seed in enumerate(seeds)
                ]
            )
        ).alias("c"),
    ).select("token", "c.*")
    return (
        qcells.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("token")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate")
        )
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (width, seeds):
    cell-wise addition. merge(build(X), build(Y)) == build(X ∪ Y)."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def basket_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Frequent-pair mining over (basket, item) rows: support,
    confidence(a->b), and lift for every co-occurring ordered pair
    with pair support >= ``min_support`` — the association-rule
    core (Agrawal & Srikant 1994) without the combinatorial tail
    (pairs only; real baskets are small, so the per-basket self-join
    fan-out is bounded by basket size squared, the same bounded-key
    argument as the co-purchase graph in plans/catalog.q_pagerank).

    confidence and lift are rounded HALF-AWAY IN INTEGER SPACE at
    1e-6 (c_pair/c_a and c_pair·N/(c_a·c_b) are small-denominator
    rationals that can land exactly between grid points — the same
    divergence class fixed in evaluation.calibration_bins).

    Output: (ant, cons, pair_support, ant_support, cons_support,
    confidence, lift).
    """
    b = baskets.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    item_supp = b.groupBy("_i").agg(F.count(F.lit(1)).alias("supp"))
    # basket count enters the plan as a broadcast one-row aggregate,
    # not a collected scalar — constructing this DataFrame stays lazy
    # (the house pattern from graph.pagerank_fixed_point)
    n_row = b.agg(F.count_distinct("_b").alias("nb"))
    l, r = b.alias("l"), b.alias("r")
    pairs = (
        l.join(r, "_b")
        .where(F.col("l._i") != F.col("r._i"))
        .groupBy(
            F.col("l._i").alias("ant"), F.col("r._i").alias("cons")
        )
        .agg(F.count(F.lit(1)).alias("pair_support"))
        .where(F.col("pair_support") >= min_support)
    )
    ia = item_supp.select(
        F.col("_i").alias("ant"), F.col("supp").alias("ant_support")
    )
    ic = item_supp.select(
        F.col("_i").alias("cons"), F.col("supp").alias("cons_support")
    )
    q = 1_000_000
    return (
        pairs.join(F.broadcast(ia), "ant")
        .join(F.broadcast(ic), "cons")
        .crossJoin(F.broadcast(n_row))
        .select(
            "ant",
            "cons",
            "pair_support",
            "ant_support",
            "cons_support",
            (
                half_away_div(
                    f"{q} * pair_support", "ant_support"
                )
                / F.lit(float(q))
            ).alias("confidence"),
            (
                half_away_div(
                    f"{q} * pair_support * nb",
                    "ant_support * cons_support",
                )
                / F.lit(float(q))
            ).alias("lift"),
        )
    )


# --- AGMS (tug-of-war) second-moment sketch ---------------------------

AGMS_SEED = 77_000


def agms_f2(
    df: DataFrame,
    key_col: str,
    counters: int = 35,
    groups: int = 7,
) -> DataFrame:
    """AGMS / tug-of-war sketch of the second frequency moment
    F₂ = Σ_k c_k² (Alon, Matias & Szegedy 1996) — F₂ IS the
    self-join size, and the cross-product of two AGMS sketches
    estimates any equi-join's cardinality, which is what a planner
    wants BEFORE paying for the join. One streaming pass, ``counters``
    integer registers, no per-key state: the sketch costs O(1) memory
    where the exact answer needs a full key shuffle.

    Each register is s_j = Σ_rows ±1(key) with md5-derived signs —
    an order-free INTEGER sum, so partial aggregation can never
    drift. E[s_j²] = F₂ exactly; variance is tamed the classical
    way: means of ``counters/groups`` registers, then the median of
    the ``groups`` means (odd count — the median is an exact middle
    element, no interpolation). The exact F₂ is computed beside the
    sketch (ONE key shuffle) and the relative error is emitted so
    the row certifies the estimator itself — the quantile_sketch
    self-certification pattern.

    All ``counters`` sums evaluate in a SINGLE aggregation (35
    columns, map-side combined) — no row explosion; the reshape to
    register rows happens on the one-row result.

    Output: one row (n_rows, f2_exact, f2_est, rel_err_q)."""
    per = counters // groups
    assert per * groups == counters and groups % 2 == 1

    def sign(j: int) -> Column:
        return F.lit(1) - 2 * (
            H.hash64(F.col(key_col).cast("string"), seed=AGMS_SEED + j)
            % F.lit(2)
        )

    sk = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[F.sum(sign(j)).cast("long").alias(f"s{j}") for j in range(counters)],
    )
    stack = ", ".join(f"{j}, s{j}" for j in range(counters))
    regs = sk.select(
        "n_rows", F.expr(f"stack({counters}, {stack}) AS (j, s)")
    )
    means = (
        regs.withColumn("grp", F.col("j") % groups)
        .groupBy("n_rows", "grp")
        .agg(F.sum(F.col("s") * F.col("s")).alias("_ss"))
        .select(
            "n_rows",
            half_away_div("_ss", str(per)).cast("long").alias("m"),
        )
    )
    est = means.groupBy("n_rows").agg(
        F.expr("percentile(CAST(m AS DOUBLE), 0.5D)")
        .cast("long")
        .alias("f2_est")
    )
    exact = (
        df.groupBy(F.col(key_col).alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(
            F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)"))
            .cast("long")
            .alias("f2_exact")
        )
    )
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            "n_rows",
            "f2_exact",
            "f2_est",
            half_away_div(
                "1000000 * abs(f2_est - f2_exact)", "f2_exact"
            )
            .cast("long")
            .alias("rel_err_q"),
        )
    )


def agms_f2_sql(
    table: str,
    key_col: str,
    counters: int = 35,
    groups: int = 7,
) -> str:
    """DuckDB twin of agms_f2."""
    from ..functions.exact import half_away_div_sql

    per = counters // groups
    signs = ", ".join(
        "sum(1 - 2 * ("
        + H.hash64_sql(f"CAST({key_col} AS VARCHAR)", seed=AGMS_SEED + j)
        + " % 2))"
        for j in range(counters)
    )
    return f"""
WITH sk AS (
  SELECT count(*)::BIGINT AS n_rows, [{signs}] AS ss FROM {table}
),
regs AS (
  SELECT n_rows, unnest(range(0, {counters})) AS j, unnest(ss) AS s
  FROM sk
),
means AS (
  SELECT n_rows, j % {groups} AS grp,
         {half_away_div_sql('CAST(sum(s * s) AS BIGINT)', str(per))}::BIGINT
           AS m
  FROM regs GROUP BY 1, 2
),
est AS (
  SELECT n_rows,
         CAST(quantile_cont(CAST(m AS DOUBLE), 0.5) AS BIGINT) AS f2_est
  FROM means GROUP BY n_rows
),
ex AS (
  SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact
  FROM (SELECT count(*)::BIGINT AS c FROM {table} GROUP BY {key_col})
)
SELECT n_rows, f2_exact, f2_est,
       {half_away_div_sql('1000000 * abs(f2_est - f2_exact)',
                          'f2_exact')}::BIGINT AS rel_err_q
FROM est CROSS JOIN ex
"""


def sequence_pair_support(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    min_support: int = 1,
) -> DataFrame:
    """Length-2 sequential-pattern support (the AprioriAll/PrefixSpan
    base case, Agrawal & Srikant 1995): for every ordered type pair
    (a → b), the number of users with SOME occurrence of a strictly
    before some occurrence of b.

    The scalable identity: "a before b somewhere in the stream" ⟺
    first(a) < last(b). So one groupBy(user, type) reduces each
    user's stream to ≤|type-vocabulary| rows carrying
    (min_key, max_key) — the per-user pair join is then
    vocab² (constant), never events². Keys are fixed-width
    zero-padded (ts_us, event_id) strings, whose lexicographic
    order IS the total event order (the struct-min trick both
    engines agree on).

    Output: (a, b, support) for a != b, support >= min_support,
    ordered by (support desc, a, b)."""
    key = F.concat(
        F.lpad(F.unix_micros(F.col(ts_col)).cast("string"), 20, "0"),
        F.lpad(F.col(id_col).cast("string"), 12, "0"),
    )
    per_ut = (
        events.select(
            F.col(user_col).alias("usr"),
            F.col(type_col).alias("etype"),
            key.alias("k"),
        )
        .groupBy("usr", "etype")
        .agg(F.min("k").alias("first_k"), F.max("k").alias("last_k"))
    )
    a = per_ut.select(
        "usr", F.col("etype").alias("a"), "first_k"
    )
    b = per_ut.select("usr", F.col("etype").alias("b"), "last_k")
    return (
        a.join(b, "usr")
        .where(
            (F.col("a") != F.col("b"))
            & (F.col("first_k") < F.col("last_k"))
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .where(F.col("support") >= min_support)
        .orderBy(F.col("support").desc(), "a", "b")
    )


def sequence_pair_support_sql(
    events_table: str = "events", min_support: int = 1
) -> str:
    """DuckDB twin of sequence_pair_support."""
    return f"""
WITH keyed AS (
  SELECT user_id AS usr, event_type AS etype,
         lpad(epoch_us(ts)::VARCHAR, 20, '0')
           || lpad(event_id::VARCHAR, 12, '0') AS k
  FROM {events_table}
),
per_ut AS (
  SELECT usr, etype, min(k) AS first_k, max(k) AS last_k
  FROM keyed GROUP BY usr, etype
)
SELECT a.etype AS a, b.etype AS b, count(*)::BIGINT AS support
FROM per_ut a JOIN per_ut b
  ON a.usr = b.usr AND a.etype <> b.etype
 AND a.first_k < b.last_k
GROUP BY a.etype, b.etype
HAVING count(*) >= {min_support}
ORDER BY support DESC, a, b
"""
