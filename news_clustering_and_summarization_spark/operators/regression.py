"""Distributed ordinary least squares via sufficient statistics —
the one-aggregation regression every profiling pipeline runs (length
vs tokens, quality vs year, throughput vs batch size).

OLS over integer-valued (x, y) needs only the five sufficient
statistics (n, Σx, Σy, Σxy, Σx², Σy²), each an exact integer sum —
order-free, one shuffle, map-side combinable, the same contract as
the DSIR/LM integer-sum kernels. Slope/intercept/R² are then O(1)
arithmetic on the aggregate row:

    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
    intercept = (Σy − slope·Σx) / n
    R² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))

Determinism: the sums are exact BIGINTs; the derived values are a
fixed dag of IEEE double ops on identical inputs (cast, multiply,
divide), quantized half-up at 1e6 — bit-identical across engines.

Scale note: integer products like n·Σxy overflow int64 near
n·x·y ≈ 9.2e18 (e.g. a trillion rows of x,y ≈ 10³) — at that scale
move the sufficient statistics to DECIMAL(38,0); the plan shape
(one groupBy) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ols_fit", "ols_fit_sql"]


def ols_fit(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    min_n: int = 3,
) -> DataFrame:
    """Per-group OLS of integer y on integer x.

    Output: (group, n, slope_q, intercept_q, r2_q) with the _q
    columns = round(value * 1e6); groups with fewer than ``min_n``
    points or zero x-variance are dropped (no defined line)."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    stats = (
        df.select(
            F.col(group_col).alias("grp"),
            x.alias("x"),
            y.alias("y"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    r2 = (num * num) / (den * deny)

    def q(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")

    return (
        stats.where((F.col("n") >= min_n) & (den != F.lit(0.0)))
        .select(
            F.col("grp").alias(group_col),
            "n",
            q(slope).alias("slope_q"),
            q(intercept).alias("intercept_q"),
            # deny == 0 means y is constant: the fit is exact, R² := 1
            q(
                F.when(deny == F.lit(0.0), F.lit(1.0)).otherwise(r2)
            ).alias("r2_q"),
        )
        .orderBy(group_col)
    )


def ols_fit_sql(
    table_cte: str,
    group_col: str,
    x_col: str,
    y_col: str,
    min_n: int = 3,
) -> str:
    """DuckDB twin of ols_fit (same sufficient-statistics dag)."""
    return f"""
WITH pts AS (
  SELECT {group_col} AS grp, {x_col}::BIGINT AS x, {y_col}::BIGINT AS y
  FROM ({table_cte})
),
stats AS (
  SELECT grp, count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * y)::BIGINT AS sxy,
         sum(x * x)::BIGINT AS sxx,
         sum(y * y)::BIGINT AS syy
  FROM pts GROUP BY grp
),
derived AS (
  SELECT grp, n,
         (n * sxy - sx * sy)::DOUBLE AS num,
         (n * sxx - sx * sx)::DOUBLE AS den,
         (n * syy - sy * sy)::DOUBLE AS deny,
         sx::DOUBLE AS sxd, sy::DOUBLE AS syd, n::DOUBLE AS nd
  FROM stats
)
SELECT grp AS {group_col}, n,
       floor(num / den * 1e6 + 0.5)::BIGINT AS slope_q,
       floor((syd - (num / den) * sxd) / nd * 1e6 + 0.5)::BIGINT
         AS intercept_q,
       floor(CASE WHEN deny = 0 THEN 1.0
                  ELSE (num * num) / (den * deny) END * 1e6 + 0.5
            )::BIGINT AS r2_q
FROM derived
WHERE n >= {min_n} AND den <> 0
ORDER BY {group_col}
"""
