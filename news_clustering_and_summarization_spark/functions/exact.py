"""Exact integer arithmetic helpers shared by the cross-engine
oracle surface.

Quantized-integer totals divided by arbitrary counts can land
exactly between 1e-6 grid points, where Spark's BigDecimal HALF_UP
rounding and DuckDB's double rounding disagree by one ulp of the
last decimal (first hit: calibration mean over two odd-quantized
scores, commit c02274c). The fix is to round half-away IN INTEGER
SPACE, where the engines cannot diverge:

    half_away(num / den) = sign · ((2·|num| + den) div (2·den))

for den > 0. Every operator that averages a quantized-integer total
(calibration, LM perplexity, time-weighted average, basket-rule
ratios) routes through these two twins so the next fix lands in one
place.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["half_away_div", "half_away_div_sql", "sql_str_lit"]


def sql_str_lit(s: str) -> str:
    """Quote ``s`` as a single-quoted SQL string literal, doubling
    embedded single quotes (identical escaping rule in Spark SQL and
    DuckDB). Every oracle builder that interpolates a runtime string
    (group names, stopword lists) must route through this — an
    apostrophe in a data-derived value must not break or inject into
    the generated query (r08 advisor finding)."""
    return "'" + s.replace("'", "''") + "'"


def half_away_div(num_expr: str, den_expr: str) -> Column:
    """Column: round(num/den) half-away-from-zero via exact integer
    division. ``den_expr`` must be a positive integer expression;
    ``num_expr`` may be negative. NULL num yields NULL."""
    return F.expr(
        f"CASE WHEN ({num_expr}) >= 0"
        f" THEN (2 * ({num_expr}) + ({den_expr}))"
        f" div (2 * ({den_expr}))"
        f" ELSE -((2 * -({num_expr}) + ({den_expr}))"
        f" div (2 * ({den_expr}))) END"
    )


def half_away_div_sql(num_expr: str, den_expr: str) -> str:
    """DuckDB twin of half_away_div (// is integer division on
    integer operands; both branches keep operands non-negative)."""
    return (
        f"(CASE WHEN ({num_expr}) >= 0"
        f" THEN (2 * ({num_expr}) + ({den_expr}))"
        f" // (2 * ({den_expr}))"
        f" ELSE -((2 * -({num_expr}) + ({den_expr}))"
        f" // (2 * ({den_expr}))) END)"
    )
