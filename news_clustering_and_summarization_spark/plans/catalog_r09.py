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


def q_t_closeness(spark, sf):
    """t-closeness audit (operators/profiling.t_closeness_audit):
    per quasi-identifier class, total-variation distance between the
    class's sensitive-attribute distribution and the global one —
    the third privacy gate after k_anonymity / l_diversity (skewness
    attacks pass both). Exact HUGEINT/DECIMAL cross-products, one
    half-up division per class."""
    from ..operators.profiling import t_closeness_audit

    cust = load(spark, sf, "customer").select(
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias(
            "balance_band"
        ),
        "c_nationkey",
    )
    return t_closeness_audit(
        cust, ["c_mktsegment", "balance_band"], "c_nationkey"
    ).orderBy("c_mktsegment", "balance_band")


def oracle_t_closeness() -> str:
    from ..operators.profiling import t_closeness_audit_sql

    return t_closeness_audit_sql(
        "(SELECT c_mktsegment,"
        " cast(floor(c_acctbal / 1000) AS BIGINT) AS balance_band,"
        " c_nationkey FROM customer)",
        ["c_mktsegment", "balance_band"],
        "c_nationkey",
        order_by="c_mktsegment, balance_band",
    )


def q_hits(spark, sf):
    """HITS hubs & authorities (operators/graph.hits_scores) over
    the directed supplier→part bipartite graph from lineitem —
    source-quality weighting for corpus builds (hub = supplier
    covering good parts, authority = part carried by good
    suppliers). Exact scaled-integer fixed point with per-iteration
    max-normalization; oracle replays 3 iterations unrolled."""
    from ..operators.graph import hits_scores

    li = widen(spark, load(spark, sf, "lineitem")).select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey").cast("long") + F.lit(1_000_000_000)).alias(
            "dst"
        ),
    )
    return (
        hits_scores(li, iterations=3)
        .orderBy(F.col("auth_q").desc(), F.col("hub_q").desc(), "node")
        .limit(25)
    )


def oracle_hits() -> str:
    from ..operators.graph import hits_sql

    frag, final = hits_sql("edges", iterations=3)
    return f"""
WITH edges AS (
  SELECT DISTINCT l_suppkey::BIGINT AS src,
         (l_partkey::BIGINT + 1000000000) AS dst
  FROM lineitem
),
{frag}
SELECT node, hub_q, auth_q FROM {final}
ORDER BY auth_q DESC, hub_q DESC, node
LIMIT 25
"""


def q_edit_distance_join(spark, sf):
    """PassJoin edit-distance ≤2 self-join (operators/linkage.
    edit_distance_join) over part names — segment-blocked candidate
    generation (d+1 segments equi-join candidate substrings, |Δpos|
    and |Δlen| residual filters) + exact levenshtein verify; the
    oracle is the INDEPENDENT quadratic θ-join, so green == the
    blocking is lossless."""
    from ..operators.linkage import edit_distance_join

    return edit_distance_join(
        widen(spark, load(spark, sf, "part")), "p_partkey", "p_name", 2
    )


def oracle_edit_distance_join() -> str:
    from ..operators.linkage import edit_distance_join_sql

    return edit_distance_join_sql("part", "p_partkey", "p_name", 2)


def q_stratified_kfold(spark, sf):
    """Deterministic stratified k-fold audit (operators/sampling.
    stratified_kfold_summary): documents stratified by lang into 5
    hash-ordered folds; the per-(stratum, fold) id checksum makes a
    green hash certify the exact assignment."""
    from ..operators.sampling import stratified_kfold_summary

    return stratified_kfold_summary(
        load(spark, sf, "documents"), "doc_id", "lang", k=5
    )


def oracle_stratified_kfold() -> str:
    from ..operators.sampling import stratified_kfold_summary_sql

    return stratified_kfold_summary_sql("documents", "doc_id", "lang", k=5)


def q_changepoint(spark, sf):
    """Binary-segmentation changepoint (operators/temporal.
    changepoint_binseg_daily): per event-type daily series, the
    single most-likely mean-shift day via the exact-integer CUSUM
    distance argmax — the "WHERE did the level change" companion to
    cusum_detect; windows run over the calendar spine only."""
    from ..operators.temporal import changepoint_binseg_daily

    return changepoint_binseg_daily(load(spark, sf, "events"))


def oracle_changepoint() -> str:
    from ..operators.temporal import changepoint_binseg_daily_sql

    return changepoint_binseg_daily_sql("events")


def q_wl_fingerprint(spark, sf):
    """Weisfeiler-Lehman node fingerprints (operators/graph.
    wl_fingerprint) on the part co-purchase graph: 2 rounds of
    sorted-neighborhood md5 relabeling — structural blocking keys
    for graph dedup; Pregel-lite shuffle shape, fingerprint
    HISTOGRAM output (domain-bounded rows)."""
    from ..operators.graph import wl_fingerprint

    li = widen(spark, load(spark, sf, "lineitem")).select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        # no .distinct() here: wl_fingerprint dedups its edge input
        # itself — a catalog-side distinct would shuffle the query's
        # largest intermediate twice (r09 second-pass review)
    )
    fp = wl_fingerprint(edges, rounds=2)
    return (
        fp.groupBy("wl_q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("node").cast("long").alias("min_node"),
            F.sum("degree").cast("long").alias("sum_degree"),
        )
        .orderBy(F.col("n_nodes").desc(), "wl_q")
        .limit(50)
    )


def oracle_wl_fingerprint() -> str:
    from ..operators.graph import wl_fingerprint_sql

    frag, final = wl_fingerprint_sql("edges", rounds=2)
    return f"""
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
{frag}
SELECT wl_q, count(*)::BIGINT AS n_nodes,
       min(node)::BIGINT AS min_node,
       sum(degree)::BIGINT AS sum_degree
FROM {final}
GROUP BY wl_q ORDER BY n_nodes DESC, wl_q LIMIT 50
"""


def q_mmr_rerank(spark, sf):
    """MMR diversity reranking (operators/similarity.mmr_rerank):
    top-20 query-similar vectors greedily reranked to 5 by
    λ·relevance − (1−λ)·max-similarity-to-selected (λ=½, quantized
    ints, id tie-breaks); the oracle replays the greedy UNROLLED —
    an independent implementation of the selection logic."""
    from ..operators.similarity import mmr_rerank

    return mmr_rerank(load(spark, sf, "embeddings"), query_id=0)


def oracle_mmr_rerank() -> str:
    from ..operators.similarity import mmr_rerank_sql

    return mmr_rerank_sql("embeddings", query_id=0)


def q_spearman_corr(spark, sf):
    """Tie-corrected Spearman rank correlation between lineitem
    quantity and extended price (operators/profiling.spearman): the
    monotone-association companion to corr_matrix, built from
    per-distinct-value doubled average ranks (exact integers via the
    binary_auc two-phase prefix sum — no global row sort) and a
    DECIMAL(38,0) Pearson assembly over them."""
    from ..operators.profiling import spearman

    return spearman(
        load(spark, sf, "lineitem"),
        "l_quantity",
        "l_extendedprice",
        x_mult=1,
        y_mult=100,
    )


def oracle_spearman_corr() -> str:
    from ..operators.profiling import spearman_sql

    return spearman_sql(
        "lineitem",
        "l_quantity",
        "l_extendedprice",
        x_mult=1,
        y_mult=100,
    )


def q_fdr_bh(spark, sf):
    """Benjamini-Hochberg FDR control across per-brand return-flag
    chi-square tests (operators/evaluation.fdr_bh): 25 simultaneous
    GOF tests against the corpus-wide flag distribution, step-up
    selected at alpha=0.05 — the multiple-testing guardrail for
    fleet-wide data audits (25 naive tests at 0.05 expect a false
    alarm; BH bounds the false discovery rate instead)."""
    from ..operators.evaluation import fdr_bh

    li = load(spark, sf, "lineitem")
    part = load(spark, sf, "part")
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == F.col("p_partkey"),
    ).select("p_brand", "l_returnflag")
    return fdr_bh(joined, "p_brand", "l_returnflag", ["A", "N", "R"])


def oracle_fdr_bh() -> str:
    from ..operators.evaluation import fdr_bh_sql

    inner = (
        "(SELECT p_brand, l_returnflag FROM lineitem "
        "JOIN part ON l_partkey = p_partkey)"
    )
    return fdr_bh_sql(inner, "p_brand", "l_returnflag", ["A", "N", "R"])


def q_conformal_bound(spark, sf):
    """Split-conformal 90% prediction bound for lineitem price given
    quantity (operators/evaluation.conformal_bound): hash-split
    train/calibration halves, per-quantity integer-mean predictor,
    finite-sample k = ceil((n+1)·0.9)-th smallest calibration
    residual via the two-phase prefix sum — the distribution-free
    interval a data-quality gate would alarm against."""
    from ..operators.evaluation import conformal_bound

    li = load(spark, sf, "lineitem").select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("rk"),
        F.col("l_quantity").cast("long").alias("q"),
        F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    return conformal_bound(li, "rk", "q", "cents")


def oracle_conformal_bound() -> str:
    from ..operators.evaluation import conformal_bound_sql

    inner = (
        "(SELECT (l_orderkey * 8 + l_linenumber) AS rk, "
        "l_quantity::BIGINT AS q, "
        "floor(l_extendedprice * 100.0 + 0.5)::BIGINT AS cents "
        "FROM lineitem)"
    )
    return conformal_bound_sql(inner, "rk", "q", "cents")


def q_fairness_audit(spark, sf):
    """Demographic-parity audit of urgent-priority order rates
    across customer nations (operators/evaluation.fairness_audit):
    per-segment positive-rate gap vs overall and the four-fifths
    disparate-impact ratio — the representation-bias check a corpus
    or labeling policy is gated on before training."""
    from ..operators.evaluation import fairness_audit

    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    joined = orders.join(
        F.broadcast(cust.select("c_custkey", "c_nationkey")),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        "c_nationkey",
        (F.col("o_orderpriority") == "1-URGENT").alias("is_urgent"),
    )
    return fairness_audit(joined, "c_nationkey", "is_urgent")


def oracle_fairness_audit() -> str:
    from ..operators.evaluation import fairness_audit_sql

    inner = (
        "(SELECT c_nationkey, o_orderpriority FROM orders "
        "JOIN customer ON o_custkey = c_custkey)"
    )
    return fairness_audit_sql(
        inner, "c_nationkey", "o_orderpriority = '1-URGENT'",
        "c_nationkey",
    )


def _copurchase_edges(spark, sf):
    """The pagerank query's part co-purchase graph (symmetric
    directed, distinct, no self-loops) — shared by the graph-quality
    queries below."""
    li = widen(spark, load(spark, sf, "lineitem")).select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )


_EDGES_SQL = """
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
)"""


def q_graph_modularity(spark, sf):
    """Newman modularity of the BRAND partition over the co-purchase
    graph (operators/graph.modularity): does co-purchase structure
    follow brand? Per-brand exact contribution rows; Q is their sum.
    Two groupBys over the edge list + a broadcast 1-row total —
    no iteration, no global window."""
    from ..operators.graph import modularity

    part = load(spark, sf, "part")
    comms = part.select(
        F.col("p_partkey").alias("node"),
        F.col("p_brand").alias("community"),
    )
    return modularity(
        _copurchase_edges(spark, sf), comms, comm_col="community"
    )


def oracle_graph_modularity() -> str:
    from ..operators.graph import modularity_sql

    return (
        f"WITH {_EDGES_SQL.strip()},\n"
        "comms AS (SELECT p_partkey AS node, p_brand AS community "
        "FROM part),"
        f"{modularity_sql('edges', 'comms', 'community')}"
    )


def q_assortativity(spark, sf):
    """Degree assortativity of the co-purchase graph
    (operators/graph.assortativity): one DECIMAL-exact Pearson over
    edge endpoint degrees — hub-to-hub vs hub-to-leaf mixing, the
    one-row graph-shape diagnostic next to clustering_coeff."""
    from ..operators.graph import assortativity

    return assortativity(_copurchase_edges(spark, sf))


def oracle_assortativity() -> str:
    from ..operators.graph import assortativity_sql

    return (
        f"WITH {_EDGES_SQL.strip()},"
        f"{assortativity_sql('edges')}"
    )


def q_flesch_readability(spark, sf):
    """Flesch Reading Ease per document (operators/text_analysis.
    flesch_readability): vowel-group syllable surrogate, [.!?]+
    sentences, repo tokenizer words — one zero-shuffle projection;
    the readability gate next to quality_score."""
    from ..operators.text_analysis import flesch_readability

    return flesch_readability(widen(spark, load(spark, sf, "documents")))


def oracle_flesch_readability() -> str:
    from ..operators.text_analysis import flesch_readability_sql

    return flesch_readability_sql("documents")


def q_kcenter_coreset(spark, sf):
    """Greedy k-center coreset over the embeddings table
    (operators/sampling.kcenter_coreset, k=8): the
    diversity-maximizing data-selection primitive (Gonzalez 1985;
    Sener & Savarese 2018). k-1 driver-coordinated top-1 rounds — an
    intentionally ITERATIVE plan, like kmeans_assign/pagerank; the
    oracle replays the identical unrolled recurrence, so the
    selected ids and the coverage-radius curve match bit-for-bit."""
    from ..operators.sampling import kcenter_coreset

    return kcenter_coreset(load(spark, sf, "embeddings"), k=8)


def oracle_kcenter_coreset() -> str:
    from ..operators.sampling import kcenter_coreset_sql

    return kcenter_coreset_sql("embeddings", k=8)
