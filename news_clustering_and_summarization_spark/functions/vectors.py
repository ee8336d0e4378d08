"""Embedding-vector column math (SURVEY §2.3 J4, §2.8 M1).

Pure Column expressions so Catalyst keeps them in whole-stage codegen;
all arithmetic in float64 index order so a DuckDB oracle using
parallel-unnest sums (or list_* functions) matches bit-for-bit after
rounding. The reference computes cosine distance on L2-normalized
vectors in fp16 (clustering.py:53-85); we deliberately use float64 and
document the difference (SURVEY §7.4 risk 6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Index-ordered float64 dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def l2_normalize(a: Column) -> Column:
    n = norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_distance(a: Column, b: Column) -> Column:
    """1 - cosine similarity, clipped to [0, 1] like the reference
    (clustering.py:83-85)."""
    d = F.lit(1.0) - cosine_similarity(a, b)
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), d))


def centroid_of(vec_list: Column) -> Column:
    """Element-wise mean of an array-of-vectors column (A2,
    process_records.py:396-400)."""
    n = F.size(vec_list)
    summed = F.aggregate(
        vec_list,
        F.transform(F.element_at(vec_list, 1), lambda x: F.lit(0.0)),
        lambda acc, v: F.zip_with(acc, v, lambda x, y: x + y.cast("double")),
    )
    return F.transform(summed, lambda x: x / n)


# --- DuckDB oracle fragments -----------------------------------------


def dot_sql(a: str, b: str) -> str:
    """Index-ordered sum via list_reduce over positions — deterministic
    summation order matching Spark's aggregate()."""
    return (
        "list_reduce(list_prepend(0.0::DOUBLE, "
        "list_transform(range(1, len({a}) + 1), "
        "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), (acc, v) -> acc + v)"
    ).format(a=a, b=b)


def norm_sql(a: str) -> str:
    return (
        "sqrt(list_reduce(list_prepend(0.0::DOUBLE, "
        "list_transform({a}, x -> x::DOUBLE * x::DOUBLE)), "
        "(acc, v) -> acc + v))"
    ).format(a=a)


def cosine_distance_sql(a: str, b: str) -> str:
    return "greatest(0.0, least(1.0, 1.0 - {dot} / ({na} * {nb})))".format(
        dot=dot_sql(a, b), na=norm_sql(a), nb=norm_sql(b)
    )
