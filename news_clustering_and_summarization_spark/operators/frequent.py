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
