"""Record linkage (entity resolution) — Fellegi–Sunter scoring over
blocked candidate pairs.

Training corpora routinely merge entity tables from different
sources (user profiles, publishers, citation records) where no
shared key exists; the standard decomposition (Fellegi & Sunter
1969) is the one every production linker still uses:

1. **Blocking** — candidate pairs come from an EQUI-JOIN on a cheap
   blocking key (here: a caller-supplied column list), never an
   all-pairs compare. Block sizes bound the quadratic term exactly
   like LSH buckets bound near-dup search; hot blocks are the same
   AQE skew case.
2. **Agreement vector** — per candidate pair, a 0/1 agreement per
   field (exact or banded equality; extend with edit-distance
   predicates as needed).
3. **Score** — Σ of per-field weights: agreement adds log2(m/u),
   disagreement adds log2((1-m)/(1-u)) (m = P(agree | match),
   u = P(agree | non-match)). Weights enter as INTEGER
   centi-log-units, so pair scores are exact integer sums —
   reproducible across engines and partitionings (the DSIR/LM
   contract).
4. **Decision** — score >= threshold → match.

The weights are caller-supplied constants (estimated upstream via EM
or set from known m/u rates); this operator is the scoring plan, not
the estimator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["FieldRule", "link_records"]


class FieldRule:
    """One comparison field: agreement predicate built from two
    column expressions plus integer (agree, disagree) weights in
    centi-log-units."""

    def __init__(
        self, name: str, agree_weight: int, disagree_weight: int
    ):
        self.name = name
        self.agree_weight = int(agree_weight)
        self.disagree_weight = int(disagree_weight)


def link_records(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    rules: list[FieldRule],
    id_col: str = "rec_id",
    threshold: int = 0,
) -> DataFrame:
    """Score all candidate pairs sharing the blocking key.

    ``left``/``right`` must both carry ``id_col``, the ``block_cols``,
    and one column per rule name. Output: (left_id, right_id,
    <name>_agree per rule, score, is_match), where score is the exact
    integer Fellegi–Sunter sum.
    """
    lcols = [F.col(c).alias(f"_bl_{c}") for c in block_cols]
    l = left.select(
        F.col(id_col).alias("left_id"),
        *lcols,
        *[F.col(r.name).alias(f"_l_{r.name}") for r in rules],
    )
    r_ = right.select(
        F.col(id_col).alias("right_id"),
        *[F.col(c).alias(f"_br_{c}") for c in block_cols],
        *[F.col(rl.name).alias(f"_r_{rl.name}") for rl in rules],
    )
    cond = [
        l[f"_bl_{c}"].eqNullSafe(r_[f"_br_{c}"]) for c in block_cols
    ]
    joined = l.join(r_, cond, "inner")
    agrees: list[Column] = []
    score: Column = F.lit(0)
    out_cols = []
    for rl in rules:
        a = (
            F.col(f"_l_{rl.name}").eqNullSafe(F.col(f"_r_{rl.name}"))
        ).alias(f"{rl.name}_agree")
        agrees.append(a)
        out_cols.append(f"{rl.name}_agree")
        score = score + F.when(
            F.col(f"{rl.name}_agree"), F.lit(rl.agree_weight)
        ).otherwise(F.lit(rl.disagree_weight))
    return (
        joined.select("left_id", "right_id", *agrees)
        .select(
            "left_id",
            "right_id",
            *out_cols,
            score.alias("score"),
        )
        .withColumn("is_match", F.col("score") >= F.lit(threshold))
    )
