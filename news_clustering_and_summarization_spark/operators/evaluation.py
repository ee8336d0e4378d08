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

from ..functions.exact import half_away_div


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
    via posexplode+avg (distributed, no collect), one broadcast-sized
    join back, moment stats per label. Emits scores for every row
    (thresholding is the caller's policy — keeps the output free of
    float-boundary membership flips).
    """
    from ..functions import vectors as V
    from .cluster import centroids

    cent = centroids(df.select(label_col, vec_col), label_col, vec_col)
    dists = df.join(cent, label_col).select(
        label_col,
        id_col,
        V.cosine_distance(
            F.col(vec_col).cast("array<double>"), F.col("centroid")
        ).alias("dist"),
    )
    stats = dists.groupBy(label_col).agg(
        F.avg("dist").alias("_mu"),
        F.stddev_samp("dist").alias("_sd"),
        F.count("*").alias("n_members"),
    )
    return dists.join(stats, label_col).select(
        label_col,
        id_col,
        "n_members",
        F.round("dist", 6).alias("dist"),
        F.round(
            F.when(
                F.col("_sd") > 0, (F.col("dist") - F.col("_mu")) / F.col("_sd")
            ).otherwise(F.lit(0.0)),
            3,
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
