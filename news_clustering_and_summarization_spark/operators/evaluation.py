"""Clustering-quality metrics: homogeneity, completeness, V-measure.

The reference's README promises a `test` folder with "epsilon tests
with notebooks for evaluating clustering" (README.md:258-262) that is
absent from the snapshot (SURVEY §5) — this module supplies that
evaluation capability as a first-class distributed operator: given
predicted cluster labels and ground-truth labels, compute the
entropy-based external metrics (Rosenberg & Hirschberg 2007,
"V-Measure: A conditional entropy-based external cluster evaluation
measure", EMNLP) entirely as DataFrame aggregations — one contingency
groupBy plus marginal aggregates, no collect of per-row data, so it
runs at corpus scale.

    homogeneity  h = 1 - H(truth | pred) / H(truth)
    completeness c = 1 - H(pred | truth) / H(pred)
    v_measure    v = 2hc / (h + c)

Degenerate conventions match sklearn: an entropy of 0 yields a metric
of 1.0; h + c == 0 yields v = 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exact import half_away_div, sql_str_lit


def clustering_quality(
    df: DataFrame, pred_col: str, truth_col: str
) -> DataFrame:
    """One-row DataFrame (n, homogeneity, completeness, v_measure),
    all double, rounded to 6dp for cross-engine comparison."""
    cont = (
        df.groupBy(
            F.col(pred_col).alias("_k"), F.col(truth_col).alias("_c")
        )
        .agg(F.count("*").alias("n_ck"))
    )
    total = cont.agg(F.sum("n_ck").alias("n")).select(
        F.col("n").cast("double").alias("n")
    )
    k_marg = cont.groupBy("_k").agg(F.sum("n_ck").alias("n_k"))
    c_marg = cont.groupBy("_c").agg(F.sum("n_ck").alias("n_c"))

    joint = (
        cont.join(k_marg, "_k")
        .join(c_marg, "_c")
        .crossJoin(F.broadcast(total))
    )
    # conditional entropies from the contingency table
    hck = joint.agg(
        (-F.sum(
            (F.col("n_ck") / F.col("n"))
            * F.log(F.col("n_ck") / F.col("n_k"))
        )).alias("h_c_given_k"),
        (-F.sum(
            (F.col("n_ck") / F.col("n"))
            * F.log(F.col("n_ck") / F.col("n_c"))
        )).alias("h_k_given_c"),
    )
    hc = c_marg.crossJoin(F.broadcast(total)).agg(
        (-F.sum(
            (F.col("n_c") / F.col("n")) * F.log(F.col("n_c") / F.col("n"))
        )).alias("h_c")
    )
    hk = k_marg.crossJoin(F.broadcast(total)).agg(
        (-F.sum(
            (F.col("n_k") / F.col("n")) * F.log(F.col("n_k") / F.col("n"))
        )).alias("h_k")
    )
    h = F.when(F.col("h_c") == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - F.col("h_c_given_k") / F.col("h_c")
    )
    c = F.when(F.col("h_k") == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - F.col("h_k_given_c") / F.col("h_k")
    )
    return (
        hck.crossJoin(hc)
        .crossJoin(hk)
        .crossJoin(total)
        .select(
            F.col("n").cast("long").alias("n"),
            F.round(h, 6).alias("homogeneity"),
            F.round(c, 6).alias("completeness"),
            F.round(
                F.when(h + c == 0, F.lit(0.0)).otherwise(
                    2 * h * c / (h + c)
                ),
                6,
            ).alias("v_measure"),
        )
    )


def embedding_outlier_scores(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Data-cleaning signal: per-label cosine distance to the label
    centroid, plus its z-score within the label — high z marks
    mislabeled or off-distribution rows. Pure aggregations: centroid
    via posexplode (distributed, no collect), one broadcast-sized
    join back, moment stats per label. Emits scores for every row
    (thresholding is the caller's policy — keeps the output free of
    float-boundary membership flips).

    Cross-engine determinism (the r10 sf1 sweep caught the original
    avg/stddev formulation hash-diverging at 10x group sizes —
    unordered double sums drift by ulps and flip the rounded output):
    every aggregate is now an EXACT integer sum. Centroid components
    are means of 1e6-quantized coordinates (sums < 2^53 — exact in
    DECIMAL and in any-order double addition alike); distances
    quantize to integer micro-units before the moment stats; mean and
    sample variance assemble from DECIMAL(38,0) power sums
    (n·Σq² − (Σq)² exact); the only irrational op is one final sqrt
    on an exact-integer-derived double, and the z-score's division
    order is pinned identically in the SQL twin."""
    from ..functions import vectors as V

    q = F.floor(F.col("val").cast("double") * 1e6 + F.lit(0.5))
    cent = (
        df.select(label_col, F.posexplode(F.col(vec_col)).alias("pos", "val"))
        .groupBy(label_col, "pos")
        .agg(
            F.sum(q.cast("decimal(38,0)")).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            label_col,
            "pos",
            # exact: |q| <= ~1e6, n <= 2^33 before the double sum
            # could lose a unit; the division is one deterministic op
            (F.col("_s").cast("double")
             / (F.col("_n") * F.lit(1e6))).alias("mean"),
        )
        .groupBy(label_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "mean"))).alias("_pm")
        )
        .select(
            label_col,
            F.transform(F.col("_pm"), lambda s: s["mean"]).alias("centroid"),
        )
    )
    dists = df.join(cent, label_col).select(
        label_col,
        id_col,
        F.floor(
            V.cosine_distance(
                F.col(vec_col).cast("array<double>"), F.col("centroid")
            )
            * 1e6
            + F.lit(0.5)
        ).cast("long").alias("dq"),
    )
    d38 = "decimal(38,0)"
    stats = dists.groupBy(label_col).agg(
        F.sum(F.col("dq").cast(d38)).alias("_s1"),
        F.sum((F.col("dq") * F.col("dq")).cast(d38)).alias("_s2"),
        F.count("*").alias("n_members"),
    )
    n = F.col("n_members")
    var_num = (n.cast(d38) * F.col("_s2") - F.col("_s1") * F.col("_s1"))
    # z = (n·dq − S1) / (n · sqrt(var_num / (n(n−1)))) — every term
    # left of the sqrt is an exact integer; op order pinned in SQL
    z = (
        (n.cast(d38) * F.col("dq").cast(d38) - F.col("_s1")).cast("double")
        / (
            n.cast("double")
            * F.sqrt(
                var_num.cast("double")
                / (n * (n - F.lit(1))).cast("double")
            )
        )
    )
    return dists.join(stats, label_col).select(
        label_col,
        id_col,
        "n_members",
        (F.col("dq").cast("double") / F.lit(1e6)).alias("dist"),
        # + 0.0 normalizes IEEE -0.0 (a just-below-mean dq rounds to
        # -0.0): equal by ==, DIFFERENT by bit pattern — and the
        # driver hashes float bits (caught by the sf1 sweep)
        (
            F.round(F.when(var_num > 0, z).otherwise(F.lit(0.0)), 3)
            + F.lit(0.0)
        ).alias("zscore"),
    )


def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    shard_width: int = 1024,
) -> DataFrame:
    """Exact ROC-AUC (Mann-Whitney U) without a global row sort:

        AUC = [ Σ_s  p_s · (2·N_<s + n_s) ] / (2·P·N)

    where the sum runs over DISTINCT score values (p_s/n_s = pos/neg
    counts at score s, N_<s = negatives strictly below). Per-score
    counts are one map-side-combined shuffle over the rows; the
    cumulative window then runs over the distinct-score table, whose
    size is bounded by the score DOMAIN (quantized model outputs),
    not the corpus — the difference between "sort 100 TB of rows" and
    "scan a few thousand score levels". The numerator stays an exact
    integer (ties contribute n_s, i.e. the ½ tie credit pre-scaled by
    2), so both engines agree bit-for-bit up to the single final
    division.

    The cumulative negative count is a TWO-PHASE prefix sum: scores
    shard by ``floor(score / shard_width)`` (monotone, so shard order
    == score order), the in-shard cumsum windows per shard in
    parallel, and only the shard-TOTAL table — #shards rows, three
    orders of magnitude smaller than the score table — passes through
    a single-partition prefix window. No window in the plan ever sees
    the full distinct-score relation in one partition.

    ``label_col`` must be 0/1-castable. Returns one row:
    (auc, n_pos, n_neg).
    """
    lab = F.col(label_col).cast("long")
    per_score = (
        df.select(F.col(score_col).alias("score"), lab.alias("y"))
        .groupBy("score")
        .agg(
            F.sum("y").alias("p_s"),
            F.sum(F.lit(1) - F.col("y")).alias("n_s"),
        )
        .withColumn(
            "shard",
            F.floor(F.col("score") / F.lit(shard_width)).cast("long"),
        )
    )
    w_in = (
        Window.partitionBy("shard")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_shard = (
        Window.orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    shard_offsets = (
        per_score.groupBy("shard")
        .agg(F.sum("n_s").alias("shard_n"))
        .withColumn(
            "offset",
            F.coalesce(F.sum("shard_n").over(w_shard), F.lit(0)),
        )
        .select("shard", "offset")
    )
    contrib = (
        per_score.join(F.broadcast(shard_offsets), "shard")
        .withColumn(
            "cum_neg",
            F.coalesce(F.sum("n_s").over(w_in), F.lit(0))
            + F.col("offset"),
        )
    )
    # one-class inputs (P or N zero) have no defined AUC: emit NULL
    # instead of a divide-by-zero error under Spark 4 ANSI defaults
    return contrib.agg(
        F.when(
            (F.sum("p_s") > 0) & (F.sum("n_s") > 0),
            F.sum(
                F.col("p_s")
                * (F.lit(2) * F.col("cum_neg") + F.col("n_s"))
            ).cast("double")
            / (
                F.lit(2.0)
                * F.sum("p_s").cast("double")
                * F.sum("n_s").cast("double")
            ),
        ).alias("auc"),
        F.sum("p_s").alias("n_pos"),
        F.sum("n_s").alias("n_neg"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Reliability diagram for a [lo, hi]-ranged classifier score:
    fixed-width bins, each reporting size, mean predicted score, and
    empirical positive rate — the calibration companion to
    binary_auc (AUC measures ranking; this measures whether 0.8
    means 80%). One map-side-combined groupBy on the bin id.

    Determinism: the bin id is a floor of an affine transform (exact
    for the usual quantized scores); the mean score is an integer
    mean — scores quantize to 1e-6 BEFORE summation — so both the
    numerator and the positive count are exact integer sums. Output:
    (bin, bin_lo, n, mean_score, pos_rate) ordered by bin.
    """
    width = (hi - lo) / n_bins
    s = F.col(score_col).cast("double")
    bin_id = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((s - F.lit(lo)) / F.lit(width)).cast("int"),
        ),
    )
    score_q = F.round(s * F.lit(1_000_000)).cast("long")
    lab = F.col(label_col).cast("long")
    return (
        df.select(
            bin_id.alias("bin"), score_q.alias("sq"), lab.alias("y")
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("sq").alias("sqs"),
            F.sum("y").alias("pos"),
        )
        .select(
            "bin",
            F.round(
                F.lit(lo) + F.col("bin") * F.lit(width), 6
            ).alias("bin_lo"),
            "n",
            # round-half-away in exact integer space (see
            # functions/exact.py for why plain round() diverges)
            (
                half_away_div("sqs", "n") / F.lit(1_000_000.0)
            ).alias("mean_score"),
            F.round(
                F.col("pos").cast("double") / F.col("n"), 6
            ).alias("pos_rate"),
        )
        .orderBy("bin")
    )


# --- ROUGE-N summary evaluation ---------------------------------------


def rouge_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lead_k: int = 15,
) -> DataFrame:
    """ROUGE-1 / ROUGE-2 (Lin 2004, "ROUGE: A Package for Automatic
    Evaluation of Summaries") of the lead-k extractive summary
    against the document remainder — the standard intrinsic metric
    for the reference's summarization stage
    (business_logic/summarization/; its LLM summaries have no
    deterministic surface, so the catalog scores the classic LEAD-k
    baseline whose candidate/reference split is a pure function of
    the document).

    Per document: candidate C = first ``lead_k`` tokens, reference
    R = the rest. For n in {1, 2}: match_n = Σ_g min(c_C(g), c_R(g))
    over n-grams g (clipped counts — the ROUGE definition), candidate
    gram count |C_n| = lead_k - n + 1 (constant), reference count
    |R_n| = n_tok - lead_k - n + 1. Precision, recall and F1 are
    single exact integer divisions: F1 = 2·match / (|C_n| + |R_n|)
    (the harmonic-mean identity keeps it one division), emitted
    half-away-quantized at 1e6 so both engines agree bit-for-bit.

    Shape: tokens materialized once per doc (no-CSE-inside-lambda
    rule), one explode per side per n with map-side-combined
    (id, gram) counts, one equi-join per n on (id, gram) — the same
    shuffle budget as a TF computation; no windows, no collects.
    Docs shorter than lead_k + 2 tokens (empty bigram reference) are
    excluded up front.

    Output: (id, n_tok, r1_match, r1_ref, r1_f1_q, r2_match, r2_ref,
    r2_f1_q) — candidate sizes are the documented constants."""
    from ..functions import hashing as H

    parts = (
        df.select(
            F.col(id_col).alias("id"), H.tokens(F.col(text_col)).alias("_tok")
        )
        .where(F.size("_tok") >= lead_k + 2)
        .select(
            "id",
            F.size("_tok").cast("long").alias("n_tok"),
            F.slice("_tok", 1, lead_k).alias("_cand"),
            F.expr(f"slice(_tok, {lead_k + 1}, size(_tok) - {lead_k})").alias(
                "_ref"
            ),
        )
    )

    def match_counts(n: int) -> DataFrame:
        cand = (
            parts.select(
                "id", F.explode(H.word_shingles(F.col("_cand"), n)).alias("g")
            )
            .groupBy("id", "g")
            .agg(F.count(F.lit(1)).alias("c_c"))
        )
        ref = (
            parts.select(
                "id", F.explode(H.word_shingles(F.col("_ref"), n)).alias("g")
            )
            .groupBy("id", "g")
            .agg(F.count(F.lit(1)).alias("c_r"))
        )
        return (
            cand.join(ref, ["id", "g"])
            .groupBy("id")
            .agg(
                F.sum(F.least("c_c", "c_r")).cast("long").alias(f"r{n}_match")
            )
        )

    out = parts.select("id", "n_tok")
    for n in (1, 2):
        n_cand = lead_k - n + 1
        out = (
            out.join(match_counts(n), "id", "left")
            .withColumn(
                f"r{n}_match", F.coalesce(f"r{n}_match", F.lit(0)).cast("long")
            )
            .withColumn(
                f"r{n}_ref", (F.col("n_tok") - F.lit(lead_k + n - 1)).cast("long")
            )
            .withColumn(
                f"r{n}_f1_q",
                half_away_div(
                    f"2000000 * r{n}_match", f"{n_cand} + r{n}_ref"
                ).cast("long"),
            )
        )
    return out.select(
        "id",
        "n_tok",
        "r1_match",
        "r1_ref",
        "r1_f1_q",
        "r2_match",
        "r2_ref",
        "r2_f1_q",
    ).orderBy("id")


def rouge_scores_sql(
    table: str,
    id_col: str = "doc_id",
    text_expr: str = "text",
    lead_k: int = 15,
) -> str:
    """DuckDB twin of rouge_scores (same clipped-count grams, same
    half-away integer F1)."""
    from ..functions.exact import half_away_div_sql
    from ..functions.hashing import tokens_sql, word_shingles_sql

    def side(n: int, col: str, cname: str) -> str:
        return f"""
  SELECT id, g, count(*)::BIGINT AS {cname}
  FROM (SELECT id, unnest({word_shingles_sql(col, n)}) AS g FROM parts)
  GROUP BY id, g"""

    def f1(n: int) -> str:
        n_cand = lead_k - n + 1
        return half_away_div_sql(
            f"2000000 * r{n}_match", f"{n_cand} + r{n}_ref"
        )

    return f"""
WITH tok AS (
  SELECT {id_col} AS id, {tokens_sql(text_expr)} AS t FROM {table}
),
parts AS (
  SELECT id, len(t)::BIGINT AS n_tok,
         list_slice(t, 1, {lead_k}) AS cand,
         list_slice(t, {lead_k + 1}, len(t)) AS ref
  FROM tok WHERE len(t) >= {lead_k + 2}
),
c1 AS ({side(1, 'cand', 'c_c')}),
r1 AS ({side(1, 'ref', 'c_r')}),
m1 AS (
  SELECT id, sum(least(c_c, c_r))::BIGINT AS m
  FROM c1 JOIN r1 USING (id, g) GROUP BY id
),
c2 AS ({side(2, 'cand', 'c_c')}),
r2 AS ({side(2, 'ref', 'c_r')}),
m2 AS (
  SELECT id, sum(least(c_c, c_r))::BIGINT AS m
  FROM c2 JOIN r2 USING (id, g) GROUP BY id
),
scored AS (
  SELECT p.id, p.n_tok,
         coalesce(m1.m, 0)::BIGINT AS r1_match,
         (p.n_tok - {lead_k})::BIGINT AS r1_ref,
         coalesce(m2.m, 0)::BIGINT AS r2_match,
         (p.n_tok - {lead_k + 1})::BIGINT AS r2_ref
  FROM parts p
  LEFT JOIN m1 ON p.id = m1.id
  LEFT JOIN m2 ON p.id = m2.id
)
SELECT id, n_tok, r1_match, r1_ref, {f1(1)}::BIGINT AS r1_f1_q,
       r2_match, r2_ref, {f1(2)}::BIGINT AS r2_f1_q
FROM scored ORDER BY id
"""


def gini_stump(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
    min_side: int = 1,
) -> DataFrame:
    """Best 1-level decision stump per feature by Gini impurity —
    the CART split-finding pass (Breiman et al. 1984), the kernel
    every distributed tree learner (and every "which feature
    predicts quality?" audit) runs first.

    Scalable shape: unpivot features → groupBy (feature, value)
    collapses rows to distinct values BEFORE any window, then ONE
    cumulative window PER FEATURE (partitioned — nothing global)
    sweeps every candidate threshold "x <= v" in a single pass:
    weighted Gini = 2·(posL·negL/nL + posR·negR/nR)/n from the
    running counts. The argmin is a deterministic (score, value)
    min-struct per feature.

    Determinism: counts are exact int64; products are computed as
    doubles (same single IEEE multiply both engines — deterministic
    even past the 2^53 exactness line), quantized half-up at 1e9
    for the argmin so ties break identically.

    Output per feature: (feature, threshold, n, pos,
    gini_root_q, gini_split_q, gain_q) at 1e9 quantization."""
    pairs = []
    for fc in feature_cols:
        pairs.append(F.lit(fc))
        pairs.append(F.col(fc).cast("long"))
    lab = F.col(label_col).cast("long")
    long_df = df.select(
        lab.alias("y"),
        F.expr(
            "stack({n}, {args})".format(
                n=len(feature_cols),
                args=", ".join(
                    f"'{fc}', CAST({fc} AS BIGINT)"
                    for fc in feature_cols
                ),
            )
        ).alias("feat", "v"),
    )
    per_val = long_df.groupBy("feat", "v").agg(
        F.count(F.lit(1)).cast("long").alias("n_v"),
        F.sum("y").cast("long").alias("pos_v"),
    )
    wc = (
        Window.partitionBy("feat")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("feat")
    cum = (
        per_val.withColumn("nl", F.sum("n_v").over(wc))
        .withColumn("posl", F.sum("pos_v").over(wc))
        .withColumn("n", F.sum("n_v").over(wt))
        .withColumn("pos", F.sum("pos_v").over(wt))
    )
    d = lambda c: c.cast("double")  # noqa: E731
    negl = F.col("nl") - F.col("posl")
    nr = F.col("n") - F.col("nl")
    posr = F.col("pos") - F.col("posl")
    negr = nr - posr
    split = (
        F.lit(2.0)
        * (
            d(F.col("posl")) * d(negl) / d(F.col("nl"))
            + d(posr) * d(negr) / d(nr)
        )
        / d(F.col("n"))
    )
    root = (
        F.lit(2.0)
        * d(F.col("pos"))
        * d(F.col("n") - F.col("pos"))
        / (d(F.col("n")) * d(F.col("n")))
    )

    def q(c):
        return F.floor(c * F.lit(1e9) + F.lit(0.5)).cast("long")

    cand = cum.where(
        (F.col("nl") >= min_side) & (nr >= min_side)
    ).select(
        "feat",
        F.col("v").alias("threshold"),
        "n",
        "pos",
        q(root).alias("gini_root_q"),
        q(split).alias("gini_split_q"),
    )
    wbest = Window.partitionBy("feat").orderBy(
        "gini_split_q", "threshold"
    )
    return (
        cand.withColumn("_rn", F.row_number().over(wbest))
        .where(F.col("_rn") == 1)
        .select(
            F.col("feat").alias("feature"),
            "threshold",
            "n",
            "pos",
            "gini_root_q",
            "gini_split_q",
            (F.col("gini_root_q") - F.col("gini_split_q")).alias(
                "gain_q"
            ),
        )
        .orderBy("feature")
    )


def gini_stump_sql(
    table_cte: str,
    label_col: str,
    feature_cols: list[str],
    min_side: int = 1,
) -> str:
    """DuckDB twin of gini_stump."""
    legs = " UNION ALL ".join(
        f"SELECT '{fc}' AS feat, {fc}::BIGINT AS v, "
        f"{label_col}::BIGINT AS y FROM base"
        for fc in feature_cols
    )
    return f"""
WITH base AS MATERIALIZED (SELECT * FROM ({table_cte})),
long_rows AS ({legs}),
per_val AS (
  SELECT feat, v, count(*)::BIGINT AS n_v, sum(y)::BIGINT AS pos_v
  FROM long_rows GROUP BY 1, 2
),
cum AS (
  SELECT feat, v,
         sum(n_v) OVER (PARTITION BY feat ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS nl,
         sum(pos_v) OVER (PARTITION BY feat ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS posl,
         sum(n_v) OVER (PARTITION BY feat) AS n,
         sum(pos_v) OVER (PARTITION BY feat) AS pos
  FROM per_val
),
cand AS (
  SELECT feat, v AS threshold, n::BIGINT AS n, pos::BIGINT AS pos,
         floor(2.0 * pos::DOUBLE * (n - pos)::DOUBLE
               / (n::DOUBLE * n::DOUBLE) * 1e9 + 0.5)::BIGINT
           AS gini_root_q,
         floor(2.0 * (posl::DOUBLE * (nl - posl)::DOUBLE / nl::DOUBLE
                      + (pos - posl)::DOUBLE
                        * ((n - nl) - (pos - posl))::DOUBLE
                        / (n - nl)::DOUBLE)
               / n::DOUBLE * 1e9 + 0.5)::BIGINT AS gini_split_q
  FROM cum
  WHERE nl >= {min_side} AND (n - nl) >= {min_side}
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY feat
             ORDER BY gini_split_q, threshold) AS rn
  FROM cand
)
SELECT feat AS feature, threshold, n, pos, gini_root_q, gini_split_q,
       (gini_root_q - gini_split_q)::BIGINT AS gain_q
FROM best WHERE rn = 1 ORDER BY feature
"""


# 1/log2(rank+1) DCG discounts, precomputed once and embedded as the
# SAME literals in both engines — no runtime log anywhere
import math as _math

NDCG_MAX_K = 20
NDCG_DISCOUNTS = {
    r: 1.0 / _math.log2(r + 1) for r in range(1, NDCG_MAX_K + 1)
}
NDCG_QUANT = 10**9


def ndcg_at_k(
    ranked: DataFrame,
    relevance: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """NDCG@k of a ranked retrieval list against graded relevance
    labels (Järvelin & Kekäläinen 2002) — THE ranking-quality
    metric; here with a fully deterministic arithmetic path:

    DCG terms (2^rel − 1)·(1/log2(rank+1)) use PRE-COMPUTED discount
    literals (identical doubles both engines) and integer gains, each
    term quantized to an integer at 1e9 BEFORE summation — so the
    over-rows sum is order-free. IDCG re-ranks the relevance table's
    top-k by (rel desc, id) — an exact TakeOrdered, never a global
    sort.

    Output: ONE row (k, dcg_q, idcg_q, ndcg_q)."""
    if k > NDCG_MAX_K:
        raise ValueError(f"k > {NDCG_MAX_K} needs more discounts")
    disc = F.create_map(
        *[
            x
            for r in range(1, k + 1)
            for x in (F.lit(r), F.lit(NDCG_DISCOUNTS[r]))
        ]
    )
    # SQL shiftleft takes a column shift amount; the PySpark helper
    # only accepts an int literal
    gain = F.expr(f"shiftleft(1, cast({rel_col} as int)) - 1")
    term = F.floor(
        gain.cast("double") * F.element_at(disc, F.col(rank_col).cast("int"))
        * F.lit(float(NDCG_QUANT))
        + F.lit(0.5)
    ).cast("long")
    dcg = (
        ranked.where(F.col(rank_col) <= k)
        .join(relevance, id_col, "left")
        .na.fill({rel_col: 0})
        .agg(F.sum(term).cast("long").alias("dcg_q"))
    )
    w = Window.orderBy(
        F.col(rel_col).desc(), F.col(id_col)
    )
    ideal = (
        relevance.orderBy(F.col(rel_col).desc(), F.col(id_col))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .agg(
            F.sum(
                F.floor(
                    F.expr(
                        f"shiftleft(1, cast({rel_col} as int)) - 1"
                    ).cast("double")
                    * F.element_at(disc, F.col("rank").cast("int"))
                    * F.lit(float(NDCG_QUANT))
                    + F.lit(0.5)
                ).cast("long")
            )
            .cast("long")
            .alias("idcg_q")
        )
    )
    return dcg.crossJoin(F.broadcast(ideal)).select(
        F.lit(k).cast("long").alias("k"),
        "dcg_q",
        "idcg_q",
        F.floor(
            F.col("dcg_q").cast("double")
            / F.col("idcg_q").cast("double")
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("ndcg_q"),
    )


def ndcg_at_k_sql(
    ranked_cte: str,
    relevance_cte: str,
    k: int = 10,
) -> str:
    """DuckDB twin of ndcg_at_k. CTEs yield (doc_id, rank) and
    (doc_id, rel)."""
    cases = " ".join(
        f"WHEN {r} THEN {NDCG_DISCOUNTS[r]!r}" for r in range(1, k + 1)
    )
    term = (
        f"floor(((1 << rel::INT) - 1)::DOUBLE * (CASE rank {cases} END)"
        f" * {float(NDCG_QUANT)!r} + 0.5)::BIGINT"
    )
    return f"""
WITH ranked AS MATERIALIZED ({ranked_cte}),
rel AS MATERIALIZED ({relevance_cte}),
dcg AS (
  SELECT CAST(sum({term}) AS BIGINT) AS dcg_q
  FROM (SELECT r.rank, coalesce(v.rel, 0) AS rel
        FROM ranked r LEFT JOIN rel v ON v.doc_id = r.doc_id
        WHERE r.rank <= {k})
),
ideal AS (
  SELECT CAST(sum({term}) AS BIGINT) AS idcg_q
  FROM (SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id)
               ::BIGINT AS rank
        FROM rel ORDER BY rel DESC, doc_id LIMIT {k})
)
SELECT {k}::BIGINT AS k, dcg_q, idcg_q,
       floor(dcg_q::DOUBLE / idcg_q::DOUBLE * 1e6 + 0.5)::BIGINT
         AS ndcg_q
FROM dcg, ideal
"""


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    shard_width: int = 1024,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic over an integer-grid
    value column — the standard distribution-drift test ("did this
    batch's metric distribution shift?") next to [[binary_auc]], and
    like it computed WITHOUT a global row sort:

        D = max_v |F_a(v) − F_b(v)|
          = max_v |cumA(v)·n_b − cumB(v)·n_a| / (n_a·n_b)

    over DISTINCT grid values v. Per-value counts are one map-side-
    combined shuffle; the inclusive cumulative counts use
    binary_auc's TWO-PHASE prefix sum (in-shard window per
    ``floor(v / shard_width)`` shard, single-partition window over
    the #shards-row shard-total table only). The numerator is exact
    int64 — safe while n_a·n_b < 2^63 (~3e9 rows per side); past
    that, widen the products to DECIMAL(38,0), the corr_matrix
    pattern — so both engines agree bit-for-bit up to the single
    final division, half-up quantized (floor(x·1e6 + 0.5):
    ties toward +inf; identical expression both engines).

    ``value_col`` must already be an integer grid (quantize doubles
    upstream: the statistic is then the exact KS of the quantized
    distributions). Returns ONE row: (n_a, n_b, d_num, d_q)."""
    g = F.col(group_col)
    per_v = (
        df.where(g.isin([group_a, group_b]))
        .select(
            F.col(value_col).cast("long").alias("v"),
            (g == F.lit(group_a)).cast("long").alias("ia"),
        )
        .groupBy("v")
        .agg(
            F.sum("ia").alias("a_c"),
            F.sum(F.lit(1) - F.col("ia")).alias("b_c"),
        )
    )
    return ks_from_value_counts(per_v, shard_width)


def ks_from_value_counts(
    per_v: DataFrame, shard_width: int = 1024
) -> DataFrame:
    '''The KS statistic tail over a (v, a_c, b_c) per-value count
    table — factored out of [[ks_two_sample]] (r08) so
    streaming/drift.KsStream runs the IDENTICAL two-phase prefix-sum
    plan over its accumulated counts: stream == batch by shared code,
    the psi_from_bucket_counts pattern.'''
    per_v = per_v.withColumn(
        "shard",
        F.floor(F.col("v") / F.lit(shard_width)).cast("long"),
    )
    w_in = (
        Window.partitionBy("shard")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    shard_tot = per_v.groupBy("shard").agg(
        F.sum("a_c").alias("sa"), F.sum("b_c").alias("sb")
    )
    w_shard = Window.orderBy("shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = shard_tot.select(
        "shard",
        F.coalesce(F.sum("sa").over(w_shard), F.lit(0)).alias("off_a"),
        F.coalesce(F.sum("sb").over(w_shard), F.lit(0)).alias("off_b"),
    )
    totals = per_v.agg(
        F.sum("a_c").cast("long").alias("n_a"),
        F.sum("b_c").cast("long").alias("n_b"),
    )
    cum = (
        per_v.join(offs, "shard")
        .select(
            "v",
            (F.sum("a_c").over(w_in) + F.col("off_a")).alias("ca"),
            (F.sum("b_c").over(w_in) + F.col("off_b")).alias("cb"),
        )
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            "n_a",
            "n_b",
            F.abs(
                F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")
            ).alias("_d"),
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("_d").cast("long").alias("d_num"))
        .select(
            "n_a",
            "n_b",
            "d_num",
            # an empty group makes D undefined (0/0): emit NULL on
            # BOTH engines rather than Spark NaN vs a DuckDB cast
            # error (r07 review finding)
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.floor(
                    F.col("d_num").cast("double")
                    / (
                        F.col("n_a").cast("double")
                        * F.col("n_b").cast("double")
                    )
                    * F.lit(1e6)
                    + F.lit(0.5)
                ).cast("long"),
            ).alias("d_q"),
        )
    )


def ks_two_sample_sql(
    table: str,
    value_expr: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> str:
    """DuckDB twin of ks_two_sample (single window over the
    distinct-value table — the oracle needs semantics, not the
    two-phase scale shape). Group names are escaped as SQL string
    literals (sql_str_lit) — apostrophes in data-derived group
    values must not break the generated query."""
    ga, gb = sql_str_lit(group_a), sql_str_lit(group_b)
    return f"""
WITH per_v AS MATERIALIZED (
  SELECT ({value_expr})::BIGINT AS v,
         sum(CASE WHEN {group_col} = {ga} THEN 1 ELSE 0 END)::BIGINT AS a_c,
         sum(CASE WHEN {group_col} = {gb} THEN 1 ELSE 0 END)::BIGINT AS b_c
  FROM {table}
  WHERE {group_col} IN ({ga}, {gb})
  GROUP BY 1
),
tot AS (
  SELECT sum(a_c)::BIGINT AS n_a, sum(b_c)::BIGINT AS n_b FROM per_v
),
cum AS (
  SELECT sum(a_c) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
         sum(b_c) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
  FROM per_v
)
SELECT t.n_a, t.n_b,
       max(abs(c.ca * t.n_b - c.cb * t.n_a))::BIGINT AS d_num,
       CASE WHEN t.n_a > 0 AND t.n_b > 0 THEN
         floor(max(abs(c.ca * t.n_b - c.cb * t.n_a))::DOUBLE
               / (t.n_a::DOUBLE * t.n_b::DOUBLE) * 1e6 + 0.5)::BIGINT
       END AS d_q
FROM cum c, tot t
GROUP BY t.n_a, t.n_b
"""


def psi_drift(
    df: DataFrame,
    value_col: str,
    ref_col: str,
    n_buckets: int = 10,
    shard_width: int = 1024,
) -> DataFrame:
    """Population Stability Index — the ML-ops drift score between a
    REFERENCE slice and a CURRENT slice of an integer-grid metric
    ([[ks_two_sample]] ranks "did it shift"; PSI is the industry
    score with the 0.1/0.25 action thresholds). Buckets are the
    reference distribution's exact ``n_buckets``-quantile ORDER
    STATISTICS (edge_j = smallest grid value whose reference
    cumulative count reaches ceil(j·n/k)) — computed from per-value
    counts with the classifier_auc two-phase prefix sum, collapsed
    to ONE 9-edge row by conditional mins, and broadcast back. No
    interpolation, no collect, no global row sort.

        PSI = Σ_buckets (p_i − q_i) · ln(p_i / q_i)

    with add-one smoothing on both counts so empty buckets stay
    finite and deterministic. The ln argument is an exact integer
    product ratio; the term is quantized half-up ×1e9 in ONE
    identical double expression per bucket, so the 10-term sum is
    engine-exact.

    ``ref_col`` must be boolean (true = reference row).
    Output: exactly ``n_buckets`` rows (a bucket spine left-joins the
    counts, so a bucket holding no distinct values still contributes
    its smoothing term) of (bucket, ref_n, cur_n, term_q, psi_q) —
    psi_q repeated per row is the total in nano-nats. An empty
    reference slice degenerates deterministically on both engines:
    all rank thresholds collapse to 0, every edge becomes min(v),
    so bucket 1 holds min(v) and the top bucket everything else
    (pinned by test_psi_and_ks_degenerate_inputs_match_twin)."""
    per_v = (
        df.select(
            F.col(value_col).cast("long").alias("v"),
            F.col(ref_col).cast("long").alias("ir"),
        )
        .groupBy("v")
        .agg(
            F.sum("ir").alias("a_c"),
            F.sum(F.lit(1) - F.col("ir")).alias("b_c"),
        )
        .withColumn(
            "shard",
            F.floor(F.col("v") / F.lit(shard_width)).cast("long"),
        )
    )
    w_in = (
        Window.partitionBy("shard")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_shard = Window.orderBy("shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        per_v.groupBy("shard")
        .agg(F.sum("a_c").alias("sa"))
        .select(
            "shard",
            F.coalesce(F.sum("sa").over(w_shard), F.lit(0)).alias(
                "off_a"
            ),
        )
    )
    totals = per_v.agg(
        F.sum("a_c").cast("long").alias("n_a"),
        F.sum("b_c").cast("long").alias("n_b"),
    )
    cum = (
        per_v.join(offs, "shard")
        .crossJoin(F.broadcast(totals))
        .select(
            "v",
            "a_c",
            "b_c",
            "n_a",
            "n_b",
            (F.sum("a_c").over(w_in) + F.col("off_a")).alias("ca"),
        )
    )
    edges = cum.groupBy().agg(*psi_edge_aggs(n_buckets))
    bucket = psi_bucket_col(n_buckets)
    per_bucket_raw = (
        cum.crossJoin(F.broadcast(edges))
        .select(
            bucket.cast("long").alias("bucket"),
            "a_c",
            "b_c",
        )
        .groupBy("bucket")
        .agg(
            F.sum("a_c").cast("long").alias("ref_n"),
            F.sum("b_c").cast("long").alias("cur_n"),
        )
    )
    return psi_from_bucket_counts(
        df.sparkSession, per_bucket_raw, n_buckets
    )


def psi_edge_aggs(n_buckets: int) -> list:
    """The PSI decile-edge aggregate expressions, shared by batch
    psi_drift and streaming/drift.PsiStream so the binning is
    identical BY CONSTRUCTION, not by parallel maintenance (r08
    review finding): edge_j = min v with ca >= ceil(j·n_a/k), ceil
    via (j·n_a + k−1) DIV k. Expects columns v, ca, n_a."""
    return [
        F.min(
            F.when(
                F.col("ca")
                >= F.expr(
                    f"CAST(({j} * n_a + {n_buckets - 1})"
                    f" DIV {n_buckets} AS LONG)"
                ),
                F.col("v"),
            )
        ).alias(f"e{j}")
        for j in range(1, n_buckets)
    ]


def psi_bucket_col(n_buckets: int):
    """The PSI bucket-assignment fold shared by batch and stream
    (r08 review finding — see psi_edge_aggs). Expects column v and
    broadcast edge columns e1..e{k-1}. Edges are never NULL while
    any data row exists: the rank threshold is 0 when n_a = 0 (every
    row satisfies ca >= 0, so e_j = min v) and <= n_a = max(ca)
    otherwise — no NULL-sentinel handling needed (r07 review)."""
    bucket = F.lit(1)
    for j in range(1, n_buckets):
        bucket = bucket + (F.col("v") > F.col(f"e{j}")).cast("int")
    return bucket


def psi_from_bucket_counts(
    spark, per_bucket_raw: DataFrame, n_buckets: int = 10
) -> DataFrame:
    """PSI tail shared by the batch operator above and
    streaming/drift.PsiStream (r08 verdict item 5): given raw
    per-bucket (bucket, ref_n, cur_n) counts, emit the full
    n_buckets-row PSI table. Totals are the bucket sums (every row
    lands in exactly one bucket, so these equal the pre-bucketing
    slice totals); the spine left-join guarantees a bucket holding
    no values still contributes its add-one smoothing term (r07
    review finding). Because the STREAM's detect() calls this very
    function over its accumulated bucket counts, stream == batch is
    true by construction — same expressions, same quantization."""
    totals = per_bucket_raw.agg(
        F.sum("ref_n").cast("long").alias("_na"),
        F.sum("cur_n").cast("long").alias("_nb"),
    )
    spine = spark.range(1, n_buckets + 1).select(
        F.col("id").cast("long").alias("bucket")
    )
    per_bucket = (
        spine.join(per_bucket_raw, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.coalesce("ref_n", F.lit(0)).cast("long").alias("ref_n"),
            F.coalesce("cur_n", F.lit(0)).cast("long").alias("cur_n"),
            F.coalesce("_na", F.lit(0)).alias("_na"),
            F.coalesce("_nb", F.lit(0)).alias("_nb"),
        )
    )
    # add-one smoothing: p=(ref_n+1)/(na+k), q=(cur_n+1)/(nb+k)
    sa = F.col("ref_n") + F.lit(1)
    sb = F.col("cur_n") + F.lit(1)
    ta = F.col("_na") + F.lit(n_buckets)
    tb = F.col("_nb") + F.lit(n_buckets)
    lnq = F.floor(
        F.log((sa * tb).cast("double") / (sb * ta).cast("double"))
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("long")
    term = F.floor(
        (
            sa.cast("double") / ta.cast("double")
            - sb.cast("double") / tb.cast("double")
        )
        * lnq.cast("double")
        + F.lit(0.5)
    ).cast("long")
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        per_bucket.select(
            "bucket", "ref_n", "cur_n", term.alias("term_q")
        )
        .withColumn("psi_q", F.sum("term_q").over(wt))
        .orderBy("bucket")
    )


def psi_drift_sql(
    table: str,
    value_expr: str,
    ref_pred: str,
    n_buckets: int = 10,
) -> str:
    """DuckDB twin of psi_drift (single-window cumulative — the
    oracle needs semantics, not the two-phase shape)."""
    edge_cols = ", ".join(
        f"min(CASE WHEN ca >= ({j} * n_a + {n_buckets - 1}) // {n_buckets} "
        f"THEN v END) AS e{j}"
        for j in range(1, n_buckets)
    )
    bucket_expr = "1" + "".join(
        f" + CASE WHEN c.v > e.e{j} THEN 1 ELSE 0 END"
        for j in range(1, n_buckets)
    )
    return f"""
WITH psi_v AS MATERIALIZED (
  SELECT ({value_expr})::BIGINT AS v,
         sum(CASE WHEN {ref_pred} THEN 1 ELSE 0 END)::BIGINT AS a_c,
         sum(CASE WHEN {ref_pred} THEN 0 ELSE 1 END)::BIGINT AS b_c
  FROM {table} GROUP BY 1
),
psi_tot AS (
  SELECT sum(a_c)::BIGINT AS n_a, sum(b_c)::BIGINT AS n_b FROM psi_v
),
psi_cum AS (
  SELECT v, a_c, b_c, t.n_a, t.n_b,
         sum(a_c) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca
  FROM psi_v, psi_tot t
),
psi_edges AS (SELECT {edge_cols} FROM psi_cum),
psi_b_raw AS (
  SELECT ({bucket_expr})::BIGINT AS bucket,
         sum(c.a_c)::BIGINT AS ref_n, sum(c.b_c)::BIGINT AS cur_n
  FROM psi_cum c, psi_edges e
  GROUP BY 1
),
psi_b AS (
  SELECT s.bucket,
         coalesce(r.ref_n, 0)::BIGINT AS ref_n,
         coalesce(r.cur_n, 0)::BIGINT AS cur_n,
         t.n_a AS na, t.n_b AS nb
  FROM (SELECT unnest(generate_series(1, {n_buckets}))::BIGINT
          AS bucket) s
  LEFT JOIN psi_b_raw r ON r.bucket = s.bucket
  CROSS JOIN psi_tot t
),
psi_t AS (
  SELECT bucket, ref_n, cur_n,
         floor(((ref_n + 1)::DOUBLE / (na + {n_buckets})::DOUBLE
                - (cur_n + 1)::DOUBLE / (nb + {n_buckets})::DOUBLE)
               * floor(ln(((ref_n + 1) * (nb + {n_buckets}))::DOUBLE
                          / ((cur_n + 1) * (na + {n_buckets}))::DOUBLE)
                       * 1e9 + 0.5)::BIGINT::DOUBLE
               + 0.5)::BIGINT AS term_q
  FROM psi_b
)
SELECT bucket, ref_n, cur_n, term_q,
       sum(term_q) OVER ()::BIGINT AS psi_q
FROM psi_t ORDER BY bucket
"""


def cohen_kappa(
    df: DataFrame, rater_a, rater_b, quant: int = 1_000_000
) -> DataFrame:
    """Cohen's kappa inter-rater agreement (r08) between two label
    columns/expressions — the standard check that two automated
    labelers (quality classifiers, language filters, dedup verdicts)
    agree beyond chance before one replaces the other in a pipeline.

        kappa = (p_o − p_e) / (1 − p_e)
              = (A·N − S) / (N² − S)

    with A = #agreements, S = Σ_k rowcount_k · colcount_k — the whole
    statistic reduces to EXACT int64 sufficient statistics (N ≤ ~3e9
    before N² needs DECIMAL widening, the corr_matrix pattern), and
    the single final division is quantized half-up ×quant, so both
    engines agree bit-for-bit. Works for any label domain, not just
    booleans. Shape: one pass for A and N, one label-keyed groupBy
    pair for the margins (domain-bounded), one-row output
    (n, agree, s_cross, kappa_q).

    Degenerate pin (r08 review): when both raters emit the SAME
    single constant label, S = N² and the textbook ratio is 0/0 —
    pinned to +quant (perfect agreement, the statistic's limit).
    Constant-but-different raters are NOT degenerate (their margin
    join is empty, S = 0, kappa = 0 falls out of the formula —
    provided the empty-join NULL is coalesced BEFORE entering the
    arithmetic, the actual bug this note accompanies). An EMPTY
    input also hits S == N² (0 == 0) but means "zero rated items",
    not "perfect agreement" — kappa_q is NULL there (r08 advisor
    finding), matching the repo's degenerate-input discipline."""
    labeled = df.select(
        F.col(rater_a).cast("string").alias("ra") if isinstance(rater_a, str)
        else rater_a.cast("string").alias("ra"),
        F.col(rater_b).cast("string").alias("rb") if isinstance(rater_b, str)
        else rater_b.cast("string").alias("rb"),
    ).localCheckpoint(eager=True)
    head = labeled.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("ra") == F.col("rb")).cast("long"))
        .cast("long")
        .alias("agree"),
    )
    ma = labeled.groupBy(F.col("ra").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("ca")
    )
    mb = labeled.groupBy(F.col("rb").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("cb")
    )
    s = (
        ma.join(mb, "k")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("s_cross"))
    )
    return (
        head.crossJoin(F.broadcast(s))
        .select(
            "n",
            "agree",
            F.coalesce("s_cross", F.lit(0)).alias("s_cross"),
            F.when(F.col("n") == 0, F.lit(None).cast("long"))
            .when(
                F.col("n") * F.col("n")
                == F.coalesce(F.col("s_cross"), F.lit(0)),
                F.lit(quant),
            )
            .otherwise(
                F.floor(
                    (
                        F.col("agree") * F.col("n")
                        - F.coalesce(F.col("s_cross"), F.lit(0))
                    ).cast("double")
                    / (
                        F.col("n") * F.col("n")
                        - F.coalesce(F.col("s_cross"), F.lit(0))
                    ).cast("double")
                    * F.lit(float(quant))
                    + F.lit(0.5)
                )
            )
            .cast("long")
            .alias("kappa_q"),
        )
    )


def bleu_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lead_k: int = 15,
    max_n: int = 4,
    quant: int = 1_000_000,
) -> DataFrame:
    """Corpus-level BLEU (Papineni et al. 2002) of the LEAD-k
    extractive summary against the document remainder — the
    precision-side companion to [[rouge_scores]] for the reference's
    summarization stage (business_logic/summarization/ has no
    deterministic surface, so the catalog scores the LEAD baseline).

    Sufficient statistics are EXACT int64: per n in 1..max_n, the
    corpus clipped-match total m_n = Σ_docs Σ_g min(c_C(g), c_R(g))
    and the candidate gram total c_n = n_docs·(lead_k − n + 1);
    corpus candidate/reference lengths for the brevity penalty.

    The score leaves the engine in LOG space with the repo's
    one-quantized-ln-per-point discipline (heaps_law / survival_curve
    precedent): q(x) = floor(x·quant + 0.5), and

      log_bleu4_q = Σ_n (q(ln m_n) − q(ln c_n))  +  max_n · bp_q
      bp_q        = least(0, q(1 − ref_len/cand_len))

    i.e. max_n × the conventional log-BLEU, ×quant — exact integer
    arithmetic after each individually-quantized ln, so both engines
    agree bit-for-bit (exp would add a second uncontrolled float op;
    callers exponentiate outside the comparison surface if they want
    the 0..1 value). NULL when any m_n = 0 (the textbook score is 0
    = log −∞; the standard smoothings are a policy choice left to
    the caller) or when no document survives the length gate.

    Shape: per n, two map-side-combined (id, gram) counts and one
    equi-join — a TF computation's shuffle budget; the final frame
    is a broadcast cross of five one-row aggregates. Docs shorter
    than lead_k + max_n + 1 tokens (empty max_n-gram reference) are
    excluded up front."""
    from ..functions import hashing as H

    parts = (
        df.select(
            F.col(id_col).alias("id"), H.tokens(F.col(text_col)).alias("_tok")
        )
        .where(F.size("_tok") >= lead_k + max_n + 1)
        .select(
            "id",
            F.size("_tok").cast("long").alias("n_tok"),
            F.slice("_tok", 1, lead_k).alias("_cand"),
            F.expr(f"slice(_tok, {lead_k + 1}, size(_tok) - {lead_k})").alias(
                "_ref"
            ),
        )
        .localCheckpoint(eager=True)  # feeds 2·max_n explodes + head
    )
    head = parts.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        # coalesce: an empty survivor set must read 0, not NULL — the
        # SQL twin computes count(*)*k / coalesce(sum,0) (r09 review)
        F.coalesce(F.sum(F.lit(lead_k)), F.lit(0)).cast("long").alias(
            "cand_len"
        ),
        F.coalesce(F.sum(F.col("n_tok") - F.lit(lead_k)), F.lit(0))
        .cast("long")
        .alias("ref_len"),
    )
    out = head
    for n in range(1, max_n + 1):
        cand = (
            parts.select(
                "id", F.explode(H.word_shingles(F.col("_cand"), n)).alias("g")
            )
            .groupBy("id", "g")
            .agg(F.count(F.lit(1)).alias("c_c"))
        )
        ref = (
            parts.select(
                "id", F.explode(H.word_shingles(F.col("_ref"), n)).alias("g")
            )
            .groupBy("id", "g")
            .agg(F.count(F.lit(1)).alias("c_r"))
        )
        m = (
            cand.join(ref, ["id", "g"])
            .agg(
                F.coalesce(F.sum(F.least("c_c", "c_r")), F.lit(0))
                .cast("long")
                .alias(f"m{n}")
            )
        )
        out = out.crossJoin(F.broadcast(m)).withColumn(
            f"c{n}",
            (F.col("n_docs") * F.lit(lead_k - n + 1)).cast("long"),
        )
    qln = lambda c: F.floor(  # noqa: E731 — q(ln x), the per-point quantizer
        F.log(c.cast("double")) * F.lit(float(quant)) + F.lit(0.5)
    ).cast("long")
    bp = F.least(
        F.lit(0).cast("long"),
        F.floor(
            (
                F.lit(1.0)
                - F.col("ref_len").cast("double")
                / F.col("cand_len").cast("double")
            )
            * F.lit(float(quant))
            + F.lit(0.5)
        ).cast("long"),
    )
    log_terms = None
    any_zero = F.lit(False)
    for n in range(1, max_n + 1):
        t = qln(F.col(f"m{n}")) - qln(F.col(f"c{n}"))
        log_terms = t if log_terms is None else log_terms + t
        any_zero = any_zero | (F.col(f"m{n}") == 0)
    return out.select(
        "n_docs",
        "cand_len",
        "ref_len",
        *[c for n in range(1, max_n + 1) for c in (f"m{n}", f"c{n}")],
        F.when(
            (F.col("n_docs") == 0) | any_zero, F.lit(None).cast("long")
        )
        .otherwise(log_terms + F.lit(max_n) * bp)
        .alias("log_bleu4_q"),
    )


def bleu_corpus_sql(
    table: str,
    id_col: str = "doc_id",
    text_expr: str = "text",
    lead_k: int = 15,
    max_n: int = 4,
    quant: int = 1_000_000,
) -> str:
    """DuckDB twin of bleu_corpus (same clipped counts, same
    per-point quantized lns, same integer log-space assembly)."""
    from ..functions.hashing import tokens_sql, word_shingles_sql

    def side(n: int, col: str, cname: str) -> str:
        return f"""
  SELECT id, g, count(*)::BIGINT AS {cname}
  FROM (SELECT id, unnest({word_shingles_sql(col, n)}) AS g FROM parts)
  GROUP BY id, g"""

    m_ctes = []
    for n in range(1, max_n + 1):
        m_ctes.append(f"c{n} AS ({side(n, 'cand', 'c_c')})")
        m_ctes.append(f"r{n} AS ({side(n, 'ref', 'c_r')})")
        m_ctes.append(
            f"m{n} AS (SELECT coalesce(sum(least(c_c, c_r)), 0)::BIGINT"
            f" AS m FROM c{n} JOIN r{n} USING (id, g))"
        )

    def qln(e: str) -> str:
        return f"floor(ln(({e})::DOUBLE) * {quant}.0 + 0.5)::BIGINT"

    log_sum = " + ".join(
        f"({qln(f'm{n}.m')} - {qln(f'h.n_docs * {lead_k - n + 1}')})"
        for n in range(1, max_n + 1)
    )
    any_zero = " OR ".join(f"m{n}.m = 0" for n in range(1, max_n + 1))
    m_cols = ", ".join(
        f"m{n}.m AS m{n}, (h.n_docs * {lead_k - n + 1})::BIGINT AS c{n}"
        for n in range(1, max_n + 1)
    )
    froms = " CROSS JOIN ".join(["h"] + [f"m{n}" for n in range(1, max_n + 1)])
    return f"""
WITH tok AS (
  SELECT {id_col} AS id, {tokens_sql(text_expr)} AS t FROM {table}
),
parts AS (
  SELECT id, len(t)::BIGINT AS n_tok,
         list_slice(t, 1, {lead_k}) AS cand,
         list_slice(t, {lead_k + 1}, len(t)) AS ref
  FROM tok WHERE len(t) >= {lead_k + max_n + 1}
),
h AS (
  SELECT count(*)::BIGINT AS n_docs,
         (count(*) * {lead_k})::BIGINT AS cand_len,
         coalesce(sum(n_tok - {lead_k}), 0)::BIGINT AS ref_len
  FROM parts
),
{",".join(m_ctes)}
SELECT h.n_docs, h.cand_len, h.ref_len, {m_cols},
       CASE WHEN h.n_docs = 0 OR {any_zero} THEN NULL
            ELSE ({log_sum})
                 + {max_n} * least(0::BIGINT,
                     floor((1.0 - h.ref_len::DOUBLE / h.cand_len::DOUBLE)
                           * {quant}.0 + 0.5)::BIGINT)
       END AS log_bleu4_q
FROM {froms}
"""


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    shard_width: int = 1024,
    quant: int = 10**12,
) -> DataFrame:
    """Exact average precision (area under the precision-recall
    curve, sklearn's step-wise AP definition) without a global row
    sort — the class-imbalance companion to [[binary_auc]] (AUC is
    blind to the positive rate; AP is the metric quality-classifier
    gates actually use on 1%-positive corpora):

        AP = Σ_s (p_s / P) · TP_s / (TP_s + FP_s)

    summed over DISTINCT scores s descending, where p_s/n_s are the
    pos/neg counts AT s and TP_s/FP_s are cumulative from the top
    INCLUDING s (ties enter the threshold together — the sklearn
    convention). Like binary_auc, per-score counts are one
    map-side-combined shuffle and the cumulative runs as a TWO-PHASE
    prefix sum over the distinct-score table (in-shard window + a
    #shards-row offset table), so no window ever sees the full score
    relation in one partition.

    Each per-score term is quantized half-up at ``quant`` (=1e12; the
    chi2_abtest per-cell precedent) and the terms sum exactly, so
    both engines agree bit-for-bit. All int products stay < 2^53 for
    corpora to ~3e7 rows per class; beyond that widen the term's
    numerator to DECIMAL — documented, not silently wrong, because
    the inputs are counts the caller can bound. One-class inputs
    (P = 0) emit NULL (degenerate-input discipline).

    Output: one row (ap_q, n_pos, n_neg)."""
    lab = F.col(label_col).cast("long")
    per_score = (
        df.select(F.col(score_col).alias("score"), lab.alias("y"))
        .groupBy("score")
        .agg(
            F.sum("y").alias("p_s"),
            F.sum(F.lit(1) - F.col("y")).alias("n_s"),
        )
        .withColumn(
            "shard",
            F.floor(F.col("score") / F.lit(shard_width)).cast("long"),
        )
    )
    w_in = (
        Window.partitionBy("shard")
        .orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_shard = (
        Window.orderBy(F.col("shard").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    shard_offsets = (
        per_score.groupBy("shard")
        .agg(F.sum("p_s").alias("sp"), F.sum("n_s").alias("sn"))
        .withColumn(
            "off_p", F.coalesce(F.sum("sp").over(w_shard), F.lit(0))
        )
        .withColumn(
            "off_n", F.coalesce(F.sum("sn").over(w_shard), F.lit(0))
        )
        .select("shard", "off_p", "off_n")
    )
    contrib = (
        per_score.join(F.broadcast(shard_offsets), "shard")
        .withColumn("tp", F.sum("p_s").over(w_in) + F.col("off_p"))
        .withColumn("fp", F.sum("n_s").over(w_in) + F.col("off_n"))
    )
    total = contrib.agg(
        F.sum("p_s").alias("n_pos"), F.sum("n_s").alias("n_neg")
    )
    term = F.floor(
        (F.col("p_s") * F.col("tp")).cast("double")
        / (F.col("n_pos") * (F.col("tp") + F.col("fp"))).cast("double")
        * F.lit(float(quant))
        + F.lit(0.5)
    ).cast("long")
    # anchor the output on the ALWAYS-one-row totals aggregate: a
    # zero-positive input empties the term frame, and deriving the
    # counts via max() over it returned NULL n_pos/n_neg where the
    # SQL twin reports the real counts (r09 review)
    ap_sum = (
        contrib.where(F.col("p_s") > 0)
        .crossJoin(F.broadcast(total))
        .agg(F.sum(term).alias("_apsum"))
    )
    return total.crossJoin(F.broadcast(ap_sum)).select(
        F.when(F.col("n_pos") > 0, F.col("_apsum"))
        .cast("long")
        .alias("ap_q"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
    )


def average_precision_sql(
    table_or_cte: str,
    score_expr: str,
    label_expr: str,
    quant: int = 10**12,
) -> str:
    """DuckDB twin of average_precision (single window — the oracle
    replays the STATISTIC, the two-phase sharding is a Spark plan
    choice invisible in the result)."""
    return f"""
WITH per_score AS (
  SELECT {score_expr} AS score,
         sum(({label_expr})::BIGINT)::BIGINT AS p_s,
         sum(1 - ({label_expr})::BIGINT)::BIGINT AS n_s
  FROM {table_or_cte}
  GROUP BY 1
),
cum AS (
  SELECT score, p_s, n_s,
         sum(p_s) OVER (ORDER BY score DESC
                        ROWS UNBOUNDED PRECEDING) AS tp,
         sum(n_s) OVER (ORDER BY score DESC
                        ROWS UNBOUNDED PRECEDING) AS fp
  FROM per_score
),
tot AS (
  SELECT sum(p_s)::BIGINT AS n_pos, sum(n_s)::BIGINT AS n_neg
  FROM per_score
)
SELECT CASE WHEN n_pos > 0 THEN
         (SELECT sum(floor((p_s * tp)::DOUBLE
                           / (tot.n_pos * (tp + fp))::DOUBLE
                           * {quant}.0 + 0.5)::BIGINT)
          FROM cum WHERE p_s > 0)
       END::BIGINT AS ap_q,
       n_pos, n_neg
FROM tot
"""


def matthews_corr(
    df: DataFrame, pred_col, label_col, quant: int = 1_000_000
) -> DataFrame:
    """Matthews correlation coefficient (phi coefficient) between a
    binary prediction and a binary label — the single-number
    confusion summary that, unlike accuracy or F1, stays honest
    under class imbalance (the training-data classifier-gate
    standard alongside [[cohen_kappa]]):

        MCC = (TP·TN − FP·FN) / √((TP+FP)(TP+FN)(TN+FP)(TN+FN))

    TP/TN/FP/FN are exact int64 from ONE map-side-combined aggregate
    (no shuffle beyond the 4-counter reduce). The numerator is an
    exact int64 product-difference (< 2^53 up to ~9e7 rows per cell
    — widen to DECIMAL beyond); the denominator pairs the four
    margins into two < 2^53 products, one correctly-rounded double
    multiply and one sqrt — identical expression text in both
    engines — and the single final division quantizes half-up at
    ``quant``. Any zero margin makes the textbook value 0/0: NULL
    (degenerate-input discipline; sklearn pins 0 — callers wanting
    that coalesce it).

    Output: one row (tp, tn, fp, fn, mcc_q)."""
    p = (
        F.col(pred_col) if isinstance(pred_col, str) else pred_col
    ).cast("boolean")
    y = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("boolean")
    counts = df.agg(
        F.sum((p & y).cast("long")).cast("long").alias("tp"),
        F.sum(((~p) & (~y)).cast("long")).cast("long").alias("tn"),
        F.sum((p & (~y)).cast("long")).cast("long").alias("fp"),
        F.sum(((~p) & y).cast("long")).cast("long").alias("fn"),
    ).select(
        *[F.coalesce(c, F.lit(0)).cast("long").alias(c) for c in
          ("tp", "tn", "fp", "fn")]
    )
    den_a = (F.col("tp") + F.col("fp")) * (F.col("tp") + F.col("fn"))
    den_b = (F.col("tn") + F.col("fp")) * (F.col("tn") + F.col("fn"))
    return counts.select(
        "tp",
        "tn",
        "fp",
        "fn",
        F.when(
            (den_a == 0) | (den_b == 0), F.lit(None).cast("long")
        )
        .otherwise(
            F.floor(
                (F.col("tp") * F.col("tn") - F.col("fp") * F.col("fn"))
                .cast("double")
                / F.sqrt(den_a.cast("double") * den_b.cast("double"))
                * F.lit(float(quant))
                + F.lit(0.5)
            )
        )
        .cast("long")
        .alias("mcc_q"),
    )


def matthews_corr_sql(
    table_or_cte: str, pred_expr: str, label_expr: str,
    quant: int = 1_000_000,
) -> str:
    """DuckDB twin of matthews_corr."""
    return f"""
WITH c AS (
  SELECT
    coalesce(sum(CASE WHEN ({pred_expr}) AND ({label_expr})
                 THEN 1 ELSE 0 END), 0)::BIGINT AS tp,
    coalesce(sum(CASE WHEN NOT ({pred_expr}) AND NOT ({label_expr})
                 THEN 1 ELSE 0 END), 0)::BIGINT AS tn,
    coalesce(sum(CASE WHEN ({pred_expr}) AND NOT ({label_expr})
                 THEN 1 ELSE 0 END), 0)::BIGINT AS fp,
    coalesce(sum(CASE WHEN NOT ({pred_expr}) AND ({label_expr})
                 THEN 1 ELSE 0 END), 0)::BIGINT AS fn
  FROM {table_or_cte}
)
SELECT tp, tn, fp, fn,
       CASE WHEN (tp + fp) * (tp + fn) = 0
              OR (tn + fp) * (tn + fn) = 0 THEN NULL
            ELSE floor((tp * tn - fp * fn)::DOUBLE
                       / sqrt(((tp + fp) * (tp + fn))::DOUBLE
                              * ((tn + fp) * (tn + fn))::DOUBLE)
                       * {quant}.0 + 0.5)::BIGINT
       END AS mcc_q
FROM c
"""


# --- multiple-testing control ---------------------------------------


def fdr_bh(
    df: DataFrame,
    group_col: str,
    cat_col: str,
    categories: list[str],
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini-Hochberg FDR control over per-group chi-square
    goodness-of-fit tests (Benjamini & Hochberg 1995) — the
    multiple-testing guardrail for fleet-wide audits: testing 25
    brands at alpha=0.05 each expects a false alarm; BH bounds the
    FALSE DISCOVERY RATE across the family instead.

    Per group g: chi² GOF of the ``cat_col`` distribution (the fixed
    ``categories`` list) against the whole-table distribution, df =
    len(categories)-1. With df=2 the survival function is EXACTLY
    exp(-x/2), so p-ordering is stat-ordering reversed and the BH
    step-up 'p_(k) <= alpha*k/m' becomes 'stat_(k) >= -2*ln(alpha*k/m)'
    — one ln per group of a rational argument; cross-engine the
    comparison flips only if a statistic lands within 1 ulp of a
    threshold (the quantized-ln bet bleu_corpus already takes).

    Exactness: each chi² term is ((o*N - n_g*C)² as DECIMAL(38,0))
    cast to double, divided by the exact-below-2^53 integer
    (n_g*C*N), and the terms are summed in the FIXED category-list
    order — both engines evaluate the identical double expression
    tree. Ties in stat break by group name, so the k-ranking is
    total and deterministic.

    Output per group, ordered by k: (group, n_g, stat_q, k,
    rejected) where k is the ascending-p rank and rejected marks the
    BH step-up set {k <= K}, K = max k with p_(k) <= alpha*k/m."""
    if len(categories) != 3:
        # exp(-x/2) is the df=2 survival function; other df need an
        # incomplete-gamma, which has no shared-expression replay
        raise ValueError("fdr_bh is pinned to 3 categories (df=2)")
    base = df.select(
        F.col(group_col).alias("g"), F.col(cat_col).alias("c")
    )
    cat_counts = [
        F.sum(F.when(F.col("c") == F.lit(c), 1).otherwise(0))
        .cast("long")
        .alias(f"o_{i}")
        for i, c in enumerate(categories)
    ]
    per_g = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"), *cat_counts
    )
    totals = base.agg(
        F.count(F.lit(1)).cast("long").alias("N"),
        *[
            F.sum(F.when(F.col("c") == F.lit(c), 1).otherwise(0))
            .cast("long")
            .alias(f"C_{i}")
            for i, c in enumerate(categories)
        ],
    )
    j = per_g.crossJoin(F.broadcast(totals))
    d38 = "decimal(38,0)"
    term = None
    for i in range(len(categories)):
        num = (
            (
                F.col(f"o_{i}").cast(d38) * F.col("N").cast(d38)
                - F.col("n_g").cast(d38) * F.col(f"C_{i}").cast(d38)
            )
        )
        t = (num * num).cast("double") / (
            F.col("n_g") * F.col(f"C_{i}") * F.col("N")
        ).cast("double")
        term = t if term is None else term + t
    scored = j.select(
        "g", "n_g", term.alias("stat"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    # the window domain is the GROUP table (25 brands), O(1) by
    # construction — never the row table
    w = Window.orderBy(F.col("stat").desc(), F.col("g").asc())
    ranked = scored.withColumn("k", F.row_number().over(w)).withColumn(
        "hit",
        F.col("stat")
        >= F.lit(-2.0)
        * F.log(F.lit(alpha) * F.col("k") / F.col("m")),
    )
    kmax = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("hit"), F.col("k"))), F.lit(0)
        ).alias("k_cut")
    )
    return (
        ranked.crossJoin(F.broadcast(kmax))
        .select(
            F.col("g").alias(group_col),
            "n_g",
            F.floor(F.col("stat") * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias("stat_q"),
            "k",
            (F.col("k") <= F.col("k_cut")).alias("rejected"),
        )
        .orderBy("k")
    )


def fdr_bh_sql(
    table: str,
    group_expr: str,
    cat_expr: str,
    categories: list[str],
    alpha: float = 0.05,
) -> str:
    """DuckDB twin of fdr_bh: identical fixed-order double expression
    tree, HUGEINT for the squared numerators."""
    o_sel = ", ".join(
        f"sum(CASE WHEN c = {sql_str_lit(c)} THEN 1 ELSE 0 END)::BIGINT"
        f" AS o_{i}"
        for i, c in enumerate(categories)
    )
    c_sel = ", ".join(
        f"sum(CASE WHEN c = {sql_str_lit(c)} THEN 1 ELSE 0 END)::BIGINT"
        f" AS C_{i}"
        for i, c in enumerate(categories)
    )
    terms = " + ".join(
        f"(((o_{i}::HUGEINT * N::HUGEINT - n_g::HUGEINT * C_{i}::HUGEINT)"
        f" * (o_{i}::HUGEINT * N::HUGEINT - n_g::HUGEINT * C_{i}::HUGEINT)"
        f")::DOUBLE / (n_g * C_{i} * N)::DOUBLE)"
        for i in range(len(categories))
    )
    return f"""
WITH base AS (SELECT ({group_expr}) AS g, ({cat_expr}) AS c FROM {table}),
per_g AS (SELECT g, count(*)::BIGINT AS n_g, {o_sel} FROM base GROUP BY g),
tot AS (SELECT count(*)::BIGINT AS N, {c_sel} FROM base),
scored AS (
  SELECT g, n_g, {terms} AS stat,
         count(*) OVER () AS m
  FROM per_g CROSS JOIN tot
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY stat DESC, g ASC) AS k,
         stat >= -2.0 * ln({alpha} * row_number() OVER
             (ORDER BY stat DESC, g ASC) / m) AS hit
  FROM scored
),
kmax AS (SELECT coalesce(max(CASE WHEN hit THEN k END), 0) AS k_cut
         FROM ranked)
SELECT g AS {group_expr if group_expr.isidentifier() else 'grp'},
       n_g, floor(stat * 1e6 + 0.5)::BIGINT AS stat_q,
       k::BIGINT AS k, k <= k_cut AS rejected
FROM ranked CROSS JOIN kmax
ORDER BY k
"""


# --- conformal prediction --------------------------------------------


def conformal_bound(
    df: DataFrame,
    key_col: str,
    group_col: str,
    value_col: str,
    alpha_pct: int = 10,
    shard_width: int = 1024,
) -> DataFrame:
    """Split-conformal prediction bound (Vovk et al.; Papadopoulos
    2002 inductive form): hash-split the rows into a TRAIN half
    (fits the predictor: per-group integer mean) and a CALIBRATION
    half (scores nonconformity |y - yhat|); the (1-alpha) bound is
    the k-th smallest calibration residual with the finite-sample
    correction k = ceil((n_cal+1)(1-alpha)) — the distribution-free
    guarantee that a future |y - yhat| <= bound with prob >= 1-alpha.

    Everything is exact integer arithmetic: the split is
    hash64(key)%2, yhat is integer division of the DECIMAL cent sum
    TRUNCATED TOWARD ZERO — `(s - s % c) / c` with Spark's
    dividend-sign `%` truncates, and DuckDB's `//` also truncates
    (verified: -7//2 = -3), so the twins agree on negative sums
    too; "floor division" would be wrong for s < 0 — residuals are
    integer cents, and the order statistic
    comes from binary_auc's two-phase prefix-sum over the DISTINCT
    residual domain (no global row sort). alpha is a percent so k's
    ceiling is integer division, never float.

    Output: one row (n_cal, cal_k, bound) — bound NULL when
    cal_k > n_cal (calibration set too small for the level)."""
    from ..functions import hashing as H

    base = df.select(
        H.hash64(F.col(key_col).cast("string")).alias("h"),
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("long").alias("v"),
    )
    train = base.where(F.col("h") % 2 == 0)
    cal = base.where(F.col("h") % 2 != 0)
    yhat = train.groupBy("grp").agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    ).select(
        "grp",
        ((F.col("s") - F.col("s") % F.col("c")) / F.col("c"))
        .cast("long")
        .alias("yh"),
    )
    resid = (
        cal.join(yhat, "grp")
        .select(F.abs(F.col("v") - F.col("yh")).alias("r"))
    )
    per_r = resid.groupBy("r").agg(
        F.count(F.lit(1)).cast("long").alias("n_v")
    ).withColumn(
        "shard", F.floor(F.col("r") / F.lit(shard_width)).cast("long")
    )
    w_in = (
        Window.partitionBy("shard")
        .orderBy("r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_shard = Window.orderBy("shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        per_r.groupBy("shard")
        .agg(F.sum("n_v").alias("shard_n"))
        .withColumn(
            "offset",
            F.coalesce(F.sum("shard_n").over(w_shard), F.lit(0)),
        )
        .select("shard", "offset")
    )
    cum = per_r.join(F.broadcast(offsets), "shard").select(
        "r",
        (F.sum("n_v").over(w_in) + F.col("offset")).alias("cum"),
    )
    q = 100 - alpha_pct
    nk = resid.agg(
        F.count(F.lit(1)).cast("long").alias("n_cal")
    ).select(
        "n_cal",
        F.expr(f"({q} * (n_cal + 1) + 99) div 100").alias("cal_k"),
    )
    return nk.crossJoin(
        F.broadcast(
            cum.crossJoin(F.broadcast(nk.select("cal_k")))
            .where(F.col("cum") >= F.col("cal_k"))
            .agg(F.min("r").alias("_b"))
        )
    ).select(
        "n_cal",
        "cal_k",
        F.when(F.col("cal_k") <= F.col("n_cal"), F.col("_b")).alias(
            "bound"
        ),
    )


def conformal_bound_sql(
    table: str,
    key_expr: str,
    group_expr: str,
    value_expr: str,
    alpha_pct: int = 10,
) -> str:
    """DuckDB twin of conformal_bound: same hash split, the same
    truncate-toward-zero integer mean (`//` truncates in DuckDB,
    matching Spark's `(s - s % c) / c` — both engines agree on
    negative sums), and the k-th order statistic via a plain
    row_number (semantics, not the two-phase shape)."""
    from ..functions import hashing as H

    h = H.hash64_sql(f"({key_expr})::VARCHAR")
    q = 100 - alpha_pct
    return f"""
WITH base AS (SELECT {h} AS h, ({group_expr}) AS grp,
                     ({value_expr})::BIGINT AS v FROM {table}),
yhat AS (
  SELECT grp, (sum(v::HUGEINT) // count(*)::HUGEINT)::BIGINT AS yh
  FROM base WHERE h % 2 = 0 GROUP BY grp
),
resid AS (
  SELECT abs(v - yh)::BIGINT AS r
  FROM base JOIN yhat USING (grp) WHERE h % 2 <> 0
),
nk AS (SELECT count(*)::BIGINT AS n_cal,
              (({q} * (count(*) + 1) + 99) // 100)::BIGINT AS cal_k
       FROM resid),
ordered AS (SELECT r, row_number() OVER (ORDER BY r) AS rn FROM resid)
SELECT n_cal, cal_k,
       CASE WHEN cal_k <= n_cal THEN
         (SELECT min(r) FROM ordered CROSS JOIN nk WHERE rn >= cal_k)
       END AS bound
FROM nk
"""


# --- fairness / representation audit ---------------------------------


def fairness_audit(
    df: DataFrame,
    segment_col: str,
    positive_col: str,
) -> DataFrame:
    """Demographic-parity audit of a boolean outcome across segments
    — the representation-bias check a training-data pipeline runs
    before a corpus (or a labeling policy) ships: per segment, the
    positive-rate GAP vs the overall rate and the DISPARATE-IMPACT
    ratio (four-fifths rule, EEOC 1978: flag when a segment's rate
    falls below 80% of the overall).

    Pure counting: per-segment (n_g, pos_g) in one map-side-
    combinable groupBy, overall totals broadcast back, and the two
    metrics as single exact-integer-over-exact-integer double
    divisions (counts < 2^53), quantized half-up at 1e-6 — no
    stochastic surface anywhere.

    Output per segment: (segment, n_g, pos_g, rate_gap_q, di_q,
    below_four_fifths), ordered by segment."""
    base = df.select(
        F.col(segment_col).alias("seg"),
        F.col(positive_col).cast("long").alias("y"),
    )
    per = base.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("y").cast("long").alias("pos_g"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("N"),
        F.sum("y").cast("long").alias("P"),
    )
    j = per.crossJoin(F.broadcast(tot))
    gap = (
        F.col("pos_g").cast("double") / F.col("n_g").cast("double")
        - F.col("P").cast("double") / F.col("N").cast("double")
    )
    di = (F.col("pos_g").cast("double") * F.col("N").cast("double")) / (
        F.col("n_g").cast("double") * F.col("P").cast("double")
    )
    return j.select(
        F.col("seg").alias(segment_col),
        "n_g",
        "pos_g",
        F.floor(gap * F.lit(1e6) + F.lit(0.5)).cast("long").alias(
            "rate_gap_q"
        ),
        F.when(
            F.col("P") > 0,
            F.floor(di * F.lit(1e6) + F.lit(0.5)).cast("long"),
        ).alias("di_q"),
        F.when(F.col("P") > 0, di < F.lit(0.8)).alias(
            "below_four_fifths"
        ),
    ).orderBy(segment_col)


def fairness_audit_sql(
    table: str, segment_expr: str, positive_expr: str, out_seg: str
) -> str:
    """DuckDB twin of fairness_audit (identical double divisions)."""
    return f"""
WITH base AS (SELECT ({segment_expr}) AS seg,
                     (CASE WHEN {positive_expr} THEN 1 ELSE 0 END)::BIGINT
                     AS y FROM {table}),
per AS (SELECT seg, count(*)::BIGINT AS n_g, sum(y)::BIGINT AS pos_g
        FROM base GROUP BY seg),
tot AS (SELECT count(*)::BIGINT AS N, sum(y)::BIGINT AS P FROM base)
SELECT seg AS {out_seg}, n_g, pos_g,
       floor((pos_g::DOUBLE / n_g::DOUBLE - P::DOUBLE / N::DOUBLE)
             * 1e6 + 0.5)::BIGINT AS rate_gap_q,
       CASE WHEN P > 0 THEN
         floor((pos_g::DOUBLE * N::DOUBLE) / (n_g::DOUBLE * P::DOUBLE)
               * 1e6 + 0.5)::BIGINT END AS di_q,
       CASE WHEN P > 0 THEN
         (pos_g::DOUBLE * N::DOUBLE) / (n_g::DOUBLE * P::DOUBLE) < 0.8
       END AS below_four_fifths
FROM per CROSS JOIN tot
ORDER BY {out_seg}
"""
