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

from pyspark.sql import Column, DataFrame, Window
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


def fuzzy_join_lev1(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Edit-distance-1 self-join by SymSpell deletion neighborhoods
    (Garbe 2012; the lossless d=1 blocking): two strings are within
    Levenshtein distance 1 iff they share a key in
    {s} ∪ {s minus one character} — a substitution shares the
    deletion at the edited position, an insert/delete shares the
    shorter string itself. So blocking is an EQUI-join on generated
    keys (O(len) keys per row, never all-pairs), and the exact
    `levenshtein` check only runs per candidate — at 100 TB the
    quadratic term is bounded by key-bucket sizes exactly like LSH
    bands (hot keys are the standard AQE skew case; cap key
    frequency for adversarial corpora).

    Output: (id_l, id_r, dist) with id_l < id_r, dist in {0, 1}
    (0 = identical strings under distinct ids)."""
    keys = (
        "array_distinct(concat(array(t), "
        "transform(sequence(1, length(t)), "
        "i -> concat(substring(t, 1, i - 1), substring(t, i + 1)))))"
    )
    keyed = df.select(
        F.col(id_col).alias("rid"), F.col(text_col).alias("t")
    ).select("rid", "t", F.explode(F.expr(keys)).alias("k"))
    left = keyed.select(
        F.col("rid").alias("id_l"), F.col("t").alias("t_l"), "k"
    )
    right = keyed.select(
        F.col("rid").alias("id_r"), F.col("t").alias("t_r"), "k"
    )
    return (
        left.join(right, "k")
        .where(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r", "t_l", "t_r")
        .distinct()
        .where(F.levenshtein("t_l", "t_r") <= 1)
        .select(
            "id_l",
            "id_r",
            F.levenshtein("t_l", "t_r").cast("long").alias("dist"),
        )
        .orderBy("id_l", "id_r")
    )


def fuzzy_join_lev1_sql(
    table: str, id_col: str, text_col: str
) -> str:
    """DuckDB twin of fuzzy_join_lev1 — deliberately the INDEPENDENT
    quadratic formulation (plain θ-join on levenshtein <= 1), so a
    green hash also certifies the deletion-neighborhood blocking is
    lossless, not just that both sides ran the same plan."""
    return f"""
SELECT a.{id_col} AS id_l, b.{id_col} AS id_r,
       levenshtein(a.{text_col}, b.{text_col})::BIGINT AS dist
FROM {table} a JOIN {table} b
  ON a.{id_col} < b.{id_col}
 AND levenshtein(a.{text_col}, b.{text_col}) <= 1
ORDER BY id_l, id_r
"""


def mutual_best_match(
    pairs: DataFrame,
    l_col: str = "l_id",
    r_col: str = "r_id",
    score_col: str = "score",
    ascending: bool = False,
    symmetric: bool = False,
) -> DataFrame:
    """Mutual best-match selection over a scored candidate-pair
    relation — the MERGE DECISION that follows blocking + scoring
    ([[link_records]], [[fuzzy_join_lev1]]): a pair survives only if
    each side is the other's single best candidate. The standard
    conservative 1:1 entity-resolution rule (reciprocal / mutual
    nearest neighbour), it never chains A-B-C merges the way a
    threshold does.

    Default mode is BIPARTITE (left/right are different entity
    spaces, e.g. link_records' two tables): partitioning by each
    side sees that entity's full candidate list because every
    candidate pair appears exactly once. For a MONOPARTITE relation
    (self-join candidates, one entity space) pass
    ``symmetric=True``: the input — canonical l<r lists like
    fuzzy_join_lev1's output, both-orientation lists, or a mix —
    is canonicalized, deduplicated and mirrored internally so each
    entity's window sees ALL its candidates, and survivors return
    once in canonical l<r orientation. Feeding a canonical
    monopartite list through the bipartite default would silently
    violate the 1:1 rule (each window would see only half an
    entity's candidates — r07 review finding), hence the explicit
    switch. The score must be orientation-symmetric.

    Shape: two row_number windows, each partitioned by one side and
    ordered by (score, other-id) — both shuffles are keyed on an id
    column, state per partition is that entity's candidate list.
    Deterministic: ties on score break by the other side's id, so
    rank 1 is unique. ``ascending=True`` treats the score as a
    distance (smaller is better).

    Output: the surviving (l, r, score) rows."""
    if symmetric:
        canon = (
            pairs.where(F.col(l_col) != F.col(r_col))  # self-pairs
            # would mirror into duplicate rank-1 rows and block the
            # entity's real mutual match (r07 review)
            .select(
                F.least(F.col(l_col), F.col(r_col)).alias(l_col),
                F.greatest(F.col(l_col), F.col(r_col)).alias(r_col),
                F.col(score_col),
            )
            .distinct()
        )
        pairs = canon.unionAll(
            canon.select(
                F.col(r_col).alias(l_col),
                F.col(l_col).alias(r_col),
                F.col(score_col),
            )
        )
    sc = F.col(score_col).asc() if ascending else F.col(score_col).desc()
    wl = Window.partitionBy(l_col).orderBy(sc, F.col(r_col).asc())
    wr = Window.partitionBy(r_col).orderBy(sc, F.col(l_col).asc())
    out = (
        pairs.withColumn("_rl", F.row_number().over(wl))
        .withColumn("_rr", F.row_number().over(wr))
        .where((F.col("_rl") == 1) & (F.col("_rr") == 1))
        .drop("_rl", "_rr")
    )
    if symmetric:
        out = out.where(F.col(l_col) < F.col(r_col))
    return out


def golden_record(
    records: DataFrame,
    pairs: DataFrame,
    id_col: str = "rec_id",
    longest_cols: tuple[str, ...] = (),
    max_cols: tuple[str, ...] = (),
    mode_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Survivorship merge — the MDM "golden record" step that follows
    record linkage (r08): duplicate groups are the connected
    components of the match-pair graph (chains A-B-C collapse into
    one entity, singletons survive as themselves), and each group's
    canonical record is assembled field-by-field by rule:

      longest_cols — longest value wins (ties: lexicographically
                     smallest value, then smallest record id);
      max_cols     — maximum value wins;
      mode_cols    — most frequent value wins (ties: smallest value).

    Every rule is a deterministic total order, so the golden record
    is engine-replayable — no scan-order dependence, unlike naive
    "first record wins" survivorship.

    Shape: one CC over match pairs (geometrically contracting, like
    dedup components), then per-rule windows/groupBys PARTITIONED BY
    COMPONENT — high-cardinality keys, never a global window. Output:
    (golden_id, n_members, <field columns>) — golden_id is the
    group's minimum record id.

    ``pairs`` needs columns l_id / r_id (direction-free)."""
    from .cluster import connected_components

    comp = connected_components(
        records.select(id_col), pairs.select("l_id", "r_id"), id_col=id_col
    )
    base = (
        records.join(comp, id_col)
        .localCheckpoint(eager=True)  # CC output feeds every rule pass
    )
    out = base.groupBy("component").agg(
        F.min(id_col).alias("golden_id"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
    )
    for c in longest_cols:
        w = Window.partitionBy("component").orderBy(
            F.length(c).desc(), F.col(c).asc(), F.col(id_col).asc()
        )
        pick = (
            base.select("component", c, id_col)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("component", c)
        )
        out = out.join(pick, "component")
    for c in max_cols:
        out = out.join(
            base.groupBy("component").agg(F.max(c).alias(c)), "component"
        )
    for c in mode_cols:
        counts = base.groupBy("component", c).agg(
            F.count(F.lit(1)).alias("_n")
        )
        w = Window.partitionBy("component").orderBy(
            F.col("_n").desc(), F.col(c).asc()
        )
        pick = (
            counts.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("component", c)
        )
        out = out.join(pick, "component")
    return out.drop("component")


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_d: int = 2,
) -> DataFrame:
    """Edit-distance ≤ d self-join by PassJoin segment blocking
    (Li, Deng, Feng 2011) — the d ≥ 2 companion to
    [[fuzzy_join_lev1]] (SymSpell deletion neighborhoods are lossless
    only at d = 1; their size explodes combinatorially beyond it).

    Pigeonhole: partition a string s into d+1 contiguous segments;
    any t with ed(s, t) ≤ d must contain at least one segment as an
    EXACT substring, at a position shifted by at most d (each edit
    shifts alignment by ≤ 1). So blocking is an EQUI-join of
    segments (d+1 per row) against candidate substrings (the other
    side emits every substring whose length could be a partner's
    segment length — a [⌊(L−d)/(d+1)⌋ .. ⌈(L+d)/(d+1)⌉] band, O(d·L)
    rows), with the |Δpos| ≤ d and |ΔL| ≤ d residuals as
    post-filters; the exact `levenshtein` runs only per DISTINCT
    candidate pair. At 100 TB the quadratic term is bounded by
    segment-bucket sizes exactly like LSH bands — low-entropy
    segments (shared prefixes) are the hot-key case: cap bucket
    frequency or pre-strip constant prefixes for adversarial
    corpora.

    Strings shorter than d+1 cannot be partitioned into non-empty
    segments (an empty segment matches everywhere) and are EXCLUDED
    — a documented precondition, not a silent wrong answer.

    Output: (id_l, id_r, dist) with id_l < id_r, dist ≤ d."""
    d = int(max_d)
    base = df.select(
        F.col(id_col).alias("rid"), F.col(text_col).alias("t")
    ).where(F.length("t") >= d + 1)
    # d+1 segments of t: len_i = L div (d+1) + (i < L % (d+1)),
    # start_i = i·(L div (d+1)) + least(i, L % (d+1))   (0-based)
    segs = base.select(
        "rid",
        "t",
        F.length("t").alias("len"),
        F.explode(
            F.expr(
                f"""transform(sequence(0, {d}), i -> struct(
                  substring(t,
                    i * (length(t) div {d + 1})
                      + least(i, length(t) % {d + 1}) + 1,
                    (length(t) div {d + 1})
                      + CASE WHEN i < length(t) % {d + 1}
                             THEN 1 ELSE 0 END) AS seg,
                  i * (length(t) div {d + 1})
                    + least(i, length(t) % {d + 1}) AS pos))"""
            )
        ).alias("s"),
    ).select(
        F.col("rid").alias("rid_a"),
        F.col("t").alias("t_a"),
        F.col("len").alias("len_a"),
        F.col("s.seg").alias("seg"),
        F.length("s.seg").alias("slen"),
        F.col("s.pos").alias("pos"),
    )
    # candidate substrings: every position, every length in the
    # partner-segment band [⌊(L−d)/(d+1)⌋ .. ⌈(L+d)/(d+1)⌉]
    subs = base.select(
        "rid",
        "t",
        F.length("t").alias("len"),
        F.explode(
            F.expr(
                f"""flatten(transform(
                  sequence(greatest((length(t) - {d}) div {d + 1}, 1),
                           ((length(t) + {d}) div {d + 1}) + 1),
                  l -> transform(sequence(0, length(t) - l),
                       p -> struct(substring(t, p + 1, l) AS sub,
                                   l AS slen, p AS pos))))"""
            )
        ).alias("s"),
    ).select(
        F.col("rid").alias("rid_b"),
        F.col("t").alias("t_b"),
        F.col("len").alias("len_b"),
        F.col("s.sub").alias("seg"),
        F.col("s.slen").alias("slen"),
        F.col("s.pos").alias("spos"),
    )
    cand = (
        segs.join(subs, ["seg", "slen"])
        .where(
            (F.col("rid_a") != F.col("rid_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= d)
            & (F.abs(F.col("pos") - F.col("spos")) <= d)
        )
        .select(
            F.least("rid_a", "rid_b").alias("id_l"),
            F.greatest("rid_a", "rid_b").alias("id_r"),
            F.when(F.col("rid_a") < F.col("rid_b"), F.col("t_a"))
            .otherwise(F.col("t_b"))
            .alias("t_l"),
            F.when(F.col("rid_a") < F.col("rid_b"), F.col("t_b"))
            .otherwise(F.col("t_a"))
            .alias("t_r"),
        )
        .distinct()
    )
    return (
        cand.where(F.levenshtein("t_l", "t_r") <= d)
        .select(
            "id_l",
            "id_r",
            F.levenshtein("t_l", "t_r").cast("long").alias("dist"),
        )
        .orderBy("id_l", "id_r")
    )


def edit_distance_join_sql(
    table: str, id_col: str, text_col: str, max_d: int = 2
) -> str:
    """DuckDB twin of edit_distance_join — deliberately the
    INDEPENDENT quadratic formulation (θ-join on levenshtein ≤ d
    over the same length-≥ d+1 population), so a green hash
    certifies the PassJoin segment blocking is LOSSLESS, not just
    that both sides ran the same plan."""
    d = int(max_d)
    return f"""
SELECT a.{id_col} AS id_l, b.{id_col} AS id_r,
       levenshtein(a.{text_col}, b.{text_col})::BIGINT AS dist
FROM {table} a JOIN {table} b
  ON a.{id_col} < b.{id_col}
 AND abs(length(a.{text_col}) - length(b.{text_col})) <= {d}
 AND levenshtein(a.{text_col}, b.{text_col}) <= {d}
WHERE length(a.{text_col}) >= {d + 1}
  AND length(b.{text_col}) >= {d + 1}
ORDER BY id_l, id_r
"""
