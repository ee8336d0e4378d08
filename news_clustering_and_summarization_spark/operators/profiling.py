"""Dataset profiling: per-column statistics in ONE scan.

The ANALYZE-style pass every corpus build runs before training: row
counts, null fractions, distinct counts, min/max — computed for all
requested columns in a single aggregation (one job, one scan; the
per-column results are then melted to long form with a zero-shuffle
Expand). No reference analogue (its only data-quality surface is the
duplicate-key guards, SURVEY §2.2 P13) — engine extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled column:
    (column, n, n_null, n_distinct, min_value, max_value) — min/max
    rendered as strings so heterogeneous column types coexist."""
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__n"),
            F.sum(
                F.when(F.col(c).isNull(), 1).otherwise(0)
            ).alias(f"{c}__n_null"),
            F.countDistinct(c).alias(f"{c}__n_distinct"),
            # min/max on the NATIVE type, cast the result — casting
            # first would turn numeric order into lexicographic order
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__n_null").alias("n_null"),
            F.col(f"{c}__n_distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def sketch_profile(
    df: DataFrame,
    group_col: str,
    key_col: str,
    rsd: float = 0.05,
    tolerance_mult: float = 5.0,
) -> DataFrame:
    """Per-group cardinality profile that CERTIFIES its own sketch:
    computes both ``approx_count_distinct`` (HyperLogLog++, the only
    thing you'd run at 100 TB) and the exact distinct count, and
    asserts inside the plan that the sketch landed within
    ``tolerance_mult * rsd`` relative error. Output columns are the
    exact values plus ``sketch_ok`` — so a plain SQL oracle can
    hash-verify the row content while the assert certifies the
    HLL path executed and met its contract.

    At real scale you'd drop the exact leg and keep only the sketch;
    this operator exists to pin the sketch's error envelope in CI
    before you trust it alone.
    """
    agg = df.groupBy(group_col).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(key_col).alias("n_distinct"),
        F.approx_count_distinct(key_col, rsd).alias("_n_approx"),
    )
    rel_err = F.abs(F.col("_n_approx") - F.col("n_distinct")) / F.greatest(
        F.col("n_distinct"), F.lit(1)
    ).cast("double")
    return agg.select(
        group_col,
        "n_rows",
        "n_distinct",
        F.assert_true(
            rel_err <= F.lit(tolerance_mult * rsd),
            F.concat(
                F.lit(f"HLL sketch outside {tolerance_mult}x rsd: "),
                F.col("_n_approx").cast("string"),
                F.lit(" vs exact "),
                F.col("n_distinct").cast("string"),
            ),
        ).isNull().alias("sketch_ok"),
    )


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Privacy governance check for training-data release: group rows
    by their quasi-identifier combination and flag equivalence classes
    smaller than ``k`` — the rows whose attribute combination could
    re-identify an individual (Sweeney 2002 k-anonymity). Training
    corpora assembled from user data run this before export; groups
    failing the floor get suppressed or generalized upstream.

    One groupBy shuffle on the quasi-identifier tuple (map-side
    combined counts); output is one row per equivalence class:
    (quasi_cols..., class_size, at_risk). NULL attribute values form
    their own class (SQL GROUP BY semantics, identical in the
    oracle).
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .withColumn("at_risk", F.col("class_size") < F.lit(k))
    )
