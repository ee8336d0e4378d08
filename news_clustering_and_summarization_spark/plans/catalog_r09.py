"""Round-9 catalog family: evaluation metrics (BLEU, average
precision, MCC), internal cluster-quality indexes (silhouette,
Davies-Bouldin), and the batch-2 additions registered by the facade.

Same contract as every family module: q_* builders return a
DataFrame; ORACLE_* / oracle_*() supply the DuckDB twin the driver
hash-compares at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import text_analysis as TA
from .catalog_shared import load, widen


def q_bleu_eval(spark, sf):
    """Corpus BLEU-4 of the LEAD-15 extractive summary vs the
    document remainder (operators/evaluation.bleu_corpus) — the
    precision-side summarization metric next to rouge_eval; exact
    int sufficient statistics, one quantized ln per point, log-space
    integer assembly (no uncontrolled exp)."""
    from ..operators.evaluation import bleu_corpus

    return bleu_corpus(widen(spark, load(spark, sf, "documents")))


def oracle_bleu_eval() -> str:
    from ..operators.evaluation import bleu_corpus_sql

    return bleu_corpus_sql("documents")


def q_pr_auc(spark, sf):
    """Exact average precision (operators/evaluation.
    average_precision) of the hashed linear quality scorer against
    the lang=='en' label — the class-imbalance companion to
    classifier_auc, computed with the same two-phase prefix-sum
    shape (no global row sort; the cumulative window runs over the
    distinct-score domain)."""
    from ..operators.evaluation import average_precision

    docs = load(spark, sf, "documents")
    weights = TA.demo_weights(spark, 1024)
    scored = TA.hashed_linear_score(docs, weights, n_buckets=1024)
    labeled = scored.join(
        docs.select("doc_id", (F.col("lang") == "en").alias("y")),
        "doc_id",
    )
    return average_precision(labeled, "score_raw", "y")


def oracle_pr_auc() -> str:
    from ..operators.evaluation import average_precision_sql

    scored = TA.hashed_linear_score_sql("documents")
    inner = average_precision_sql("lab", "score", "y")
    return f"""
WITH s AS ({scored}),
lab AS (
  SELECT s.score_raw AS score, (d.lang = 'en') AS y
  FROM s JOIN documents d USING (doc_id)
),
{inner.lstrip().removeprefix("WITH")}
"""


def q_mcc_eval(spark, sf):
    """Matthews correlation coefficient (operators/evaluation.
    matthews_corr) of the length-based quality rater against the
    lang=='en' label — the confusion-matrix summary that stays
    honest under class imbalance; exact int64 counts, one
    correctly-rounded sqrt, one quantized division."""
    from ..operators.evaluation import matthews_corr

    docs = load(spark, sf, "documents")
    return matthews_corr(
        docs, F.col("n_chars") >= 400, F.col("lang") == "en"
    )


def oracle_mcc_eval() -> str:
    from ..operators.evaluation import matthews_corr_sql

    return matthews_corr_sql("documents", "n_chars >= 400", "lang = 'en'")


def q_silhouette(spark, sf):
    """Per-label mean simplified silhouette (operators/
    cluster_metrics.silhouette_by_label) over the embeddings table's
    ground-truth labels — the internal cluster-quality gate
    (squared-distance variant, exact integer; centroids ride in the
    plan as literals so per-point scoring is a pure projection)."""
    from ..operators.cluster_metrics import silhouette_by_label

    return silhouette_by_label(load(spark, sf, "embeddings"))


def oracle_silhouette() -> str:
    from ..operators.cluster_metrics import silhouette_by_label_sql

    return silhouette_by_label_sql("embeddings")


def q_davies_bouldin(spark, sf):
    """Davies-Bouldin index (operators/cluster_metrics.
    davies_bouldin) over the embeddings labels — the companion
    internal index to silhouette (lower = tighter/better-separated
    clusters); k² pair frame over the label domain, one row out."""
    from ..operators.cluster_metrics import davies_bouldin

    return davies_bouldin(load(spark, sf, "embeddings"))


def oracle_davies_bouldin() -> str:
    from ..operators.cluster_metrics import davies_bouldin_sql

    return davies_bouldin_sql("embeddings")
