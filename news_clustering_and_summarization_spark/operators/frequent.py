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
