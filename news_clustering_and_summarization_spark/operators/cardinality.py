"""HyperLogLog cardinality sketch — approximate distinct counting
whose registers are replayable cross-engine.

At 100 TB, ``COUNT(DISTINCT token)`` is a full shuffle of every
distinct value; a HyperLogLog sketch answers the same question with
m = 2^p integer registers (kilobytes), mergeable across partitions,
days, and datasets by register-wise max — the canonical cardinality
telemetry for corpus building (vocabulary growth, per-language
distinct-token tracking, join-key cardinality estimation before
choosing a join strategy). The reference has no cardinality surface;
this is an engine extension in the same family as the count-min
sketch (operators/frequent.py).

Design (Flajolet et al. 2007, the standard HLL formulation):

* **Build is ONE shuffle with map-side combine.** Every value row
  computes ``(bucket, rho)`` in-row from two independent md5-derived
  hashes (functions/hashing.hash64 — bit-identical in SQL):
  ``bucket = h1 % m`` and ``rho = trailing_zeros(h2) + 1`` (the
  geometric observable; extracted with the exact ``h2 & -h2`` lowbit
  trick so no float log enters the hot path unrounded). A single
  ``groupBy(group, bucket).max(rho)`` yields the registers — at most
  m rows per group regardless of input size, and partial aggregation
  means the exchange carries registers, never values.
* **Estimate is a per-group fold over ≤ m rows.** The harmonic mean
  ``alpha_m * m^2 / sum(2^-r_j)`` is computed with the 2^-r terms
  scaled to exact integers (``1L << (61 - r)`` summed as
  decimal(38,0)) so the engines' unordered float summation can never
  disagree; the one double division and the small-range correction
  ``m * ln(m/V)`` (applied when raw <= 2.5m and V empty registers
  remain) happen once per group on exact inputs.
* **Merge is register-wise max** — ``merge(build(X), build(Y)) ==
  build(X ∪ Y)`` exactly (max is idempotent/commutative), the same
  decomposable-state contract as operators/incremental.py, proven in
  tests/test_cardinality.py.

Standard error is ~1.04/sqrt(m) (≈3.3% at the default m=1024); the
catalog query (plans/catalog.py q_hll_distinct) pins a 15% relative
band per group in-plan and the oracle replays the registers
bit-for-bit in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H

__all__ = [
    "HLL_BUCKET_SEED",
    "HLL_RHO_SEED",
    "hll_alpha",
    "hll_build",
    "hll_estimate",
    "hll_merge",
]

# independent md5 streams: h1 picks the register, h2 feeds rho
HLL_BUCKET_SEED = 11
HLL_RHO_SEED = 12

# hash64 yields 60 uniform bits; rho for the (16^-15-probability)
# all-zero hash caps at the full width + 1
_MAX_RHO = 61


def hll_alpha(m: int) -> float:
    """Bias-correction constant for m >= 128 registers."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_build(
    df: DataFrame,
    value_col: str,
    m: int,
    group_cols: list[str] | None = None,
    count_col: str | None = None,
) -> DataFrame:
    """Build per-group HLL registers from value rows (duplicates are
    harmless — max absorbs them). Returns (group..., bucket, r) with
    at most m rows per group.

    ``count_col`` (r12) additionally emits the per-bucket value-row
    count under that name — when ``df`` is already distinct on
    (group, value), summing it per group recovers the EXACT distinct
    count from the same single aggregation pipeline (buckets
    partition the distinct values), which is how q_hll_distinct
    computes its exact leg without a second corpus pass."""
    groups = list(group_cols or [])
    v = F.col(value_col)
    bucket = (H.hash64(v, seed=HLL_BUCKET_SEED) % F.lit(m)).alias("bucket")
    # rho = trailing_zeros(h2) + 1: the lowbit (h2 & -h2) is an exact
    # power of two, so round(log2(.)) carries no float risk; rho is
    # geometric(1/2) on uniform hash bits
    rho = (
        F.when(H.hash64(v, seed=HLL_RHO_SEED) == 0, F.lit(_MAX_RHO))
        .otherwise(
            F.round(
                F.log2(
                    F.expr(
                        "__hll_h2 & -__hll_h2"
                    )
                )
            ).cast("int")
            + F.lit(1)
        )
        .alias("rho")
    )
    # NULL values hash to NULL (md5(NULL) is NULL) and would emit a
    # phantom NULL-bucket register that skews v_empty — drop them;
    # HLL counts distinct non-null values, matching COUNT(DISTINCT)
    cells = (
        df.where(v.isNotNull())
        .withColumn("__hll_h2", H.hash64(v, seed=HLL_RHO_SEED))
        .select(*groups, bucket, rho)
    )
    aggs = [F.max("rho").alias("r")]
    if count_col is not None:
        aggs.append(F.count(F.lit(1)).alias(count_col))
    return cells.groupBy(*groups, "bucket").agg(*aggs)


def hll_estimate(
    registers: DataFrame,
    m: int,
    group_cols: list[str] | None = None,
    extra_aggs: list | None = None,
) -> DataFrame:
    """Collapse registers to one ``hll_estimate`` double per group.

    The harmonic sum uses exact integer terms (1L << (61-r), summed as
    decimal(38,0) — up to m * 2^61 ≈ 2^71 never overflows 38 digits)
    plus V * 2^61 for the V untouched registers, so both engines see
    the identical double at the final division.

    ``extra_aggs`` (r12): additional aliased aggregate Columns folded
    into the SAME per-group aggregation (e.g. summing hll_build's
    ``count_col`` to an exact distinct count) — their outputs are
    returned before ``hll_estimate`` so callers get estimate + extras
    from one pipeline instead of joining two."""
    groups = list(group_cols or [])
    alpha = hll_alpha(m)
    agg = registers.groupBy(*groups).agg(
        # coalesce: a global aggregate over EMPTY registers yields one
        # row with a NULL sum — treat as zero so the estimate degrades
        # to the linear-counting value 0.0 instead of NULL
        F.coalesce(
            F.sum(
                F.expr("shiftleft(1L, 61 - r)").cast("decimal(38,0)")
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("ssum"),
        F.count(F.lit(1)).alias("present"),
        *(extra_aggs or []),
    )
    v_empty = F.lit(m) - F.col("present")
    total = (
        F.col("ssum")
        + v_empty.cast("decimal(38,0)") * F.lit(2**61).cast("decimal(38,0)")
    ).cast("double")
    raw = F.lit(alpha * m * m * float(2**61)) / total
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty.cast("double")),
    ).otherwise(raw)
    extras = [c for c in agg.columns if c not in (*groups, "ssum", "present")]
    return agg.select(*groups, *extras, est.alias("hll_estimate"))


def hll_estimate_sql(
    m: int, registers_cte: str, group_expr: str | None = None
) -> str:
    """DuckDB replay of hll_estimate over a CTE named ``registers_cte``
    with columns (group?, bucket, r). Returns a SELECT yielding
    (group?, hll_estimate)."""
    alpha = hll_alpha(m)
    g = group_expr
    sel_g = f"{g}, " if g else ""
    by_g = f"GROUP BY {g}" if g else ""
    return f"""
SELECT {sel_g}
  CASE WHEN raw <= {2.5 * m} AND v_empty > 0
       THEN {float(m)} * ln({float(m)} / v_empty)
       ELSE raw END AS hll_estimate
FROM (
  SELECT {sel_g}
    {alpha * m * m * float(2 ** 61)!r} /
      cast(sum(cast((1::BIGINT << (61 - r)) AS DECIMAL(38,0)))
           + cast(({m} - count(*)) AS DECIMAL(38,0)) * cast({2 ** 61} AS DECIMAL(38,0))
           AS DOUBLE) AS raw,
    {m} - count(*) AS v_empty
  FROM {registers_cte} {by_g}
)
"""


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two register sets built with the same (m, seeds):
    register-wise max. Exactly equals building over the union."""
    groups = [c for c in a.columns if c not in ("bucket", "r")]
    return (
        a.unionByName(b)
        .groupBy(*groups, "bucket")
        .agg(F.max("r").alias("r"))
    )


def kmv_distinct(
    df: DataFrame,
    col: str,
    k: int = 256,
) -> DataFrame:
    """KMV / theta distinct-count sketch (Bar-Yossef et al. 2002;
    the k-minimum-values estimator behind Theta sketches): hash
    every value to a uniform 60-bit integer, keep the k smallest
    DISTINCT hashes; the k-th smallest at normalized position
    h_k/2^60 estimates the distinct count as (k-1)·2^60/h_k.

    The complement to [[hll]]: mergeable by union-of-mins, and —
    unlike HLL — supports set INTERSECTION estimates, which is why
    dedup planners carry both. One exact top-k (TakeOrdered — never
    a global sort materialization) over the distinct-hash stream.

    Determinism: hashes are md5-derived exact integers; the only
    float op is one division of exactly-representable doubles
    (255·2^60 has 60 trailing zero bits, well inside the 53-bit
    mantissa rule), half-up-quantized. The true count rides along
    for a self-certifying relative error.

    Output: ONE row (k_used, kth_hash, est, exact, rel_err_q)."""
    # md5 needs a string: integer keys render as decimal digits,
    # identical in both engines
    hashes = df.select(
        H.hash64(F.col(col).cast("string")).alias("h")
    ).distinct()
    topk = hashes.orderBy("h").limit(k)
    sk = topk.agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.max("h").alias("kth_hash"),
    )
    exact = hashes.agg(
        F.count(F.lit(1)).cast("long").alias("exact")
    )
    est = F.floor(
        (F.col("k_used") - F.lit(1)).cast("double")
        * (F.lit(float(1 << 60)) / F.col("kth_hash").cast("double"))
        + F.lit(0.5)
    ).cast("long")
    return (
        sk.crossJoin(F.broadcast(exact))
        .select(
            "k_used",
            "kth_hash",
            est.alias("est"),
            "exact",
            F.floor(
                F.abs(
                    est.cast("double") - F.col("exact").cast("double")
                )
                / F.col("exact").cast("double")
                * F.lit(1e6)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("rel_err_q"),
        )
    )


def kmv_distinct_sql(table: str, col: str, k: int = 256) -> str:
    """DuckDB twin of kmv_distinct."""
    h = H.hash64_sql(f"{col}::VARCHAR")
    return f"""
WITH hashes AS MATERIALIZED (
  SELECT DISTINCT {h} AS h FROM {table}
),
topk AS (SELECT h FROM hashes ORDER BY h LIMIT {k}),
sk AS (
  SELECT count(*)::BIGINT AS k_used, max(h) AS kth_hash FROM topk
),
ex AS (SELECT count(*)::BIGINT AS exact FROM hashes),
j AS (
  SELECT k_used, kth_hash,
         floor((k_used - 1)::DOUBLE
               * ({float(1 << 60)} / kth_hash::DOUBLE) + 0.5)::BIGINT
           AS est,
         exact
  FROM sk, ex
)
SELECT k_used, kth_hash, est, exact,
       floor(abs(est::DOUBLE - exact::DOUBLE) / exact::DOUBLE
             * 1e6 + 0.5)::BIGINT AS rel_err_q
FROM j
"""
