#!/usr/bin/env python3
"""Plan audit: sweep every catalog query's physical plan for scale
red flags (SCALE.md 'Explain-plan audit' — run it per round).

Flags checked per query:
  CARTESIAN  — CartesianProduct / BroadcastNestedLoopJoin in the plan
               (allowed only for the deliberately-gated small-pool
               similarity paths)
  GLOBAL_WIN — a Window with an empty PARTITION BY (single-partition
               bottleneck at scale)
  PY_UDF     — row-at-a-time BatchEvalPython (slow path; Arrow/pandas
               variants show as ArrowEvalPython / MapInPandas and are
               fine)

Filter pushdown is reported informationally per query (the
"pushdown" extra) rather than flagged — many catalog queries scan
full tables by design.

Usage: python tools/explain_audit.py [sf_dir]   (default sf0.001)
Exit code 1 if an unexpected flag fires.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from news_clustering_and_summarization_spark.plans import catalog  # noqa: E402
from news_clustering_and_summarization_spark.session import get_spark  # noqa: E402

# Queries allowed to cartesian/nested-loop: the gated small-side
# similarity kernels (strategy switches to LSH above LSH_THRESHOLD)
# and range joins whose non-equi residual rides on a bucket equi-join.
CARTESIAN_OK = {
    "dedup_embedding",
    "ann_topk",
    "ann_ivf",
    "cluster_assign",
    "cluster_serving",
    "clustering_quality",  # wraps cluster_assign's gated kernel
    "clustering_eps_sweep",  # same kernel, once per swept eps
    "incremental_cluster",
    # one-row broadcast crosses: the per-n clipped-match totals and
    # the corpus head are five 1-row aggregates assembled crosswise
    "bleu_eval",
    # one-row broadcast cross of the (n_pos, n_neg) total onto the
    # distinct-score contribution table
    "pr_auc",
    # ONE-ROW broadcast global-total aggregate crossJoined onto the
    # domain-bounded (class x value) cell table
    "t_closeness",
    # ONE-ROW broadcast crosses: the (N, per-category totals) row
    # onto the 25-brand table, and the one-row BH cutoff (k_cut)
    # back onto the ranked groups
    "fdr_bh",
    # ONE-ROW broadcast crosses: (n_cal, cal_k) onto the cumulative
    # residual table and the one-row bound aggregate back
    "conformal_bound",
    # ONE-ROW broadcast cross of the (N, P) overall totals onto the
    # 25-segment table
    "fairness_audit",
    # ONE-ROW broadcast cross of the directed-edge-count total onto
    # the 25-brand community table
    "graph_modularity",
    # per-normalization ONE-ROW broadcast max aggregate crossJoined
    # onto the node table (2 per iteration, the pagerank n_nodes shape)
    "hits",
    "pipeline_e2e",
    # the in-plan contract checks crossJoin a broadcast 1-row
    # recall/false-positive stats aggregate onto the result — a
    # BroadcastNestedLoopJoin with an O(1)-row side by construction
    "ann_lsh",
    "cluster_lsh_verify",
    # production variant keeps the 1-row (n_nodes)x(n_edges, max_dist)
    # broadcast crossJoin summary — O(1)-row sides by construction
    "cluster_lsh",
    # same O(1)-row summary crossJoins: (n_nodes) x (n_edges,
    # max_dist, 2^61 checksums) for the production path; the verify
    # variant adds the 1-row sampled-recall legs (the
    # cluster_lsh_verify shape)
    "cluster_ivf",
    "cluster_ivf_verify",
    # same O(1)-row summary crossJoin — (n_nodes) x (n_edges,
    # max_dist, 2^61 checksums) — over pairs read from the on-disk
    # ε-pair index instead of the in-memory join
    "cluster_ivf_index",
    # crossJoins the broadcast ONE-ROW corpus-total aggregate onto the
    # bigram table (text_analysis.collocations) — O(1)-row side
    "collocations",
    # spine construction: range(P) crossJoin the 2-row key-name frame
    # (both O(1) dimension tables), plus the broadcast per-key totals
    "partition_skew_audit",
    # ONE-ROW head aggregate crossJoin ONE-ROW margin-product
    # aggregate — both sides O(1) by construction
    "cohen_kappa",
    # ONE-ROW group-count aggregate broadcast onto the (group, term)
    # table — O(1)-row side
    "ctfidf_labels",
    # same pattern: ONE-ROW source-count aggregate broadcast onto the
    # tf table
    "distinctive_terms",
    # same pattern: ONE-ROW (avgdl, N) aggregate broadcast onto the
    # tf table (keyword_search)
    "keyword_search",
    # same pattern: ONE-ROW total-token-count aggregate crossJoined
    # onto the 20-row top-k before the error-bound check
    "heavy_hitters",
    # per-config summary = crossJoin of two ONE-ROW count aggregates
    # (candidates x verified), three configs unioned
    "minhash_band_sweep",
    # MW iterations: ONE-ROW broadcast aggregates (baseline loss, per-
    # iteration weight total, domain count) crossJoined onto the
    # |domains|-row table — every crossJoin side is O(1) rows or the
    # kilobyte-scale domain table; the corpus is scanned exactly once
    "doremi_weights",
    # ONE-ROW broadcast global-triangle-total crossJoined onto the
    # per-node counts for the audit column
    "triangle_count",
    # ONE-ROW broadcast (core_size, min_deg) aggregate crossJoined
    # onto the surviving core for the fixpoint-certificate columns
    "kcore",
    # ONE-ROW broadcast n_more aggregate (round rounds+1 frontier
    # count) crossJoined onto the visited set for the
    # frontier_exhausted fixpoint-certificate column — same shape
    # as kcore's certificate
    "bfs_levels",
    # ONE-ROW broadcast n_improved aggregate (round rounds+1
    # relaxation count) crossJoined onto the distance table for the
    # converged fixpoint-certificate column — same shape as kcore's
    "sssp",
    # crossJoin of two ONE-ROW aggregates (k-min sketch stats x exact
    # count) — both sides O(1) rows by construction
    "kmv_distinct",
    # same shape: ONE-ROW AGMS estimate crossJoined onto the ONE-ROW
    # exact F2 aggregate for the self-certifying rel-error column
    # (frequent.py agms_f2, est.crossJoin(broadcast(exact)))
    "join_size_sketch",
    # BM25 leg's ONE-ROW corpus-stats broadcast (same as bm25_search)
    # plus the gated 1-query brute-force cosine leg (same as ann_topk)
    "rrf_fusion",
    # ONE-ROW grand-total sufficient-statistics aggregate crossJoined
    # onto the per-group stats (rest-side = total - group)
    "welch_z",
    # crossJoin of two ONE-ROW aggregates (DCG x IDCG) plus the BM25
    # leg's ONE-ROW corpus-stats broadcast
    "ndcg_eval",
    # ONE-ROW horizon (max ts) and ONE-ROW total-user aggregates
    # crossJoined onto the per-user / per-duration tables
    "survival_curve",
    # the broadcast RING table (nodes x vnodes, kilobytes by
    # construction) crossJoined onto the key table — the consistent-
    # hashing successor probe
    "hash_ring",
    # #sources x #sources pair frame (non-equi broadcast join on
    # src_a < src_b) — source-dimension bounded, kilobytes at any
    # corpus scale; every corpus-scale pass is an equi-keyed
    # distinct/groupBy upstream of it
    "source_jaccard_kmv",
    # ONE-ROW broadcast (n_a, n_b) totals aggregate crossJoined onto
    # the distinct-value cum table before the max — O(1)-row side
    "ks_drift",
    # ONE-ROW broadcast totals and ONE-ROW 9-edge order-statistics
    # aggregates crossJoined onto the distinct-value table — both
    # O(1)-row sides by construction
    "psi_drift",
    # #groups x #categories margin frame (both domain-bounded,
    # kilobytes) plus the ONE-ROW grand-total broadcast — the zero-
    # cell materialization the statistic requires
    "chi2_abtest",
    # ONE-ROW broadcast corpus-token-total aggregate crossJoined onto
    # the (group, token) count table — O(1)-row side by construction
    "source_js_drift",
    # power iteration: ONE-ROW broadcast max|u| renormalizer and sign
    # pivot crossJoined onto the 64-row iterate/component tables
    "embedding_pca",
    # inherits lm_perplexity's ONE-ROW vocab-size crossJoin (the
    # add-one smoothing denominator) — O(1)-row side by construction
    "ccnet_mix",
    # crossJoins the ONE-ROW grand-total aggregate onto the
    # contingency-cell table — O(1)-row side by construction
    "mutual_info",
    # crossJoins the two ONE-ROW corpus-total aggregates (source and
    # target token counts) onto the 1024-row bucket ratio table
    "dsir_select",
    # crossJoins the ONE-ROW node-count aggregate onto the node table
    # (rank init + teleport term) — O(1)-row side by construction
    "pagerank",
    # same pagerank kernel over the TextRank co-occurrence graph —
    # the only crossJoin is the ONE-ROW node-count aggregate
    "keyword_textrank",
    # crossJoins the ONE-ROW min/max stats aggregate onto the rows
    # before the zero-shuffle z-key projection — O(1)-row side
    "zorder_layout",
    # same ONE-ROW min/max stats broadcast before the chained
    # zero-shuffle Hilbert key projections
    "hilbert_layout",
    # ONE-ROW total-count aggregate crossJoined onto the 9 digit rows
    "benford_audit",
    # bounded anchor mini-batch (25 rows) x corpus scored pass — the
    # same gated brute-force kernel as ann_topk; at corpus scale the
    # candidates come from ivf_topk/lsh_topk instead (documented)
    "hard_negatives",
    # crossJoins the ONE-ROW vocab-size aggregate onto the scored
    # bigram instances — O(1)-row side by construction
    "lm_perplexity",
    # crossJoins the ONE-ROW corpus total and ONE-ROW normalizer onto
    # the per-domain count table — O(1)-row sides by construction
    "mix_temperature",
    # composed IVF-PQ: the ADC shortlist re-rank and the exact-recall
    # leg both use the gated brute-force kernel (bounded query side),
    # plus the 1-row recall-stats crossJoin of _with_recall_assert
    "ann_ivf_pq",
    # crossJoins the ONE-ROW basket-count aggregate onto the pruned
    # pair table (lift denominator) — O(1)-row side by construction
    "basket_rules",
    # crossJoins the ONE-ROW corpus-token-total aggregate onto the
    # word-count table (keep-rate denominator) — O(1)-row side
    "skipgram_pairs",
    # crossJoins the ONE-ROW (n_docs, total_dl, df_i...) stats
    # aggregate onto the per-doc tf table — O(1)-row side by
    # construction (same pattern as keyword_search)
    "bm25_search",
    # crossJoins the ONE-ROW vocab-total aggregate onto the top-k
    # head (≤100 rows) — O(1)-row side by construction
    "vocab_coverage",
}
# Global (unpartitioned) windows tolerated only where the input is a
# provably tiny aggregate (pool_metrics reduces to O(1) rows first).
# ann_ivf/ann_lsh: the SinglePartition exchange in their plans is the
# O(1)-row global aggregate of the recall stats, not a window input —
# the ranking windows themselves partition by query_id.
# same for distinctive_terms: SinglePartition is its one-row
# source-count aggregate; the top-5 window partitions by source.
# classifier_auc: the only single-partition window runs over the
# shard-TOTAL table of the two-phase prefix sum — #shards rows
# (score domain / shard_width), provably tiny; the per-score cumsum
# partitions by shard.
# ann_ivf_pq: same as ann_ivf/ann_lsh — the SinglePartition exchange
# is the O(1)-row recall-stats aggregate; the ranking windows
# partition by query_id.
GLOBAL_WIN_OK = {
    "pool_metrics",
    "ann_ivf",
    "ann_lsh",
    "distinctive_terms",
    "classifier_auc",
    # same two-phase prefix-sum shape as classifier_auc (descending):
    # the only single-partition window is over the shard-TOTAL table
    "pr_auc",
    "ann_ivf_pq",
    # rank + running-sum windows run over ONLY the top_k (≤100) head
    # rows after the limit — bounded single-partition input
    "vocab_coverage",
    # the two-phase prefix sum's only single-partition window runs
    # over the shard-TOTAL table (N/shard_width rows, same shape as
    # classifier_auc); per-row cumsums partition by shard
    "pack_global",
    # same two-phase prefix-sum shape as classifier_auc: the only
    # single-partition window is over the shard-TOTAL table
    "ks_drift",
    # two x the two-phase prefix-sum shape (one per rank dimension):
    # each single-partition window is over a shard-TOTAL table
    "spearman_corr",
    # two-phase prefix sum over the distinct-residual domain: the
    # single-partition window is the shard-TOTAL table
    "conformal_bound",
    # rank/threshold windows run over the GROUP table (25 brands,
    # O(1) domain by construction), never the row table
    "fdr_bh",
    # two-phase shard-total window for the reference cum counts plus
    # the psi total window over the TEN bucket rows
    "psi_drift",
    # the rank window is PARTITIONED BY GROUP; the SinglePartition in
    # the plan is the one-row n_groups aggregate exchange feeding the
    # broadcast — heuristic co-occurrence, not a global window
    "ctfidf_labels",
    # chi2/dof totals windowed over the #groups x #categories cell
    # table — domain-bounded (10 rows here), never the input
    "chi2_abtest",
    # SinglePartition here is the LM path's ONE-ROW vocab aggregate
    # (not a window input); the tercile ntile windows partition by
    # lang
    "ccnet_mix",
    # two-phase distributed skyline: the one global window is the
    # merge over the UNION OF PER-BUCKET FRONTIERS (expected
    # O(buckets * log n) rows for 2-D skylines), not the input —
    # phase 1's windows partition by bucket
    "skyline",
    # rank windows run over the two <=50-row retrieval legs
    # (post-limit) — bounded single-partition input, the
    # vocab_coverage pattern
    "rrf_fusion",
    # rank windows over the <=50-row BM25 head and the <=k-row ideal
    # list (post-limit) — bounded single-partition inputs
    "ndcg_eval",
    # the cumulative KM window runs over the DISTINCT-DURATION table
    # (<= observation-span minutes rows after the groupBy), not the
    # event stream — bounded by the time span, not the data
    "survival_curve",
}


def audit_one(name: str, plan: str) -> list[str]:
    flags = []
    if (
        re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan)
        and name not in CARTESIAN_OK
    ):
        flags.append("CARTESIAN")
    # Window spec with empty partitioning prints as
    # "Window [...], [..ordering..]" with no partition expr list;
    # robust detection: "SinglePartition" feeding a Window.
    if (
        "Window" in plan
        and "SinglePartition" in plan
        and name not in GLOBAL_WIN_OK
    ):
        flags.append("GLOBAL_WIN")
    if "BatchEvalPython" in plan:
        flags.append("PY_UDF")
    return flags


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("explain-audit", shuffle_partitions=8)
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "extended"
    )
    bad = 0
    lines = []
    for name in sorted(catalog.QUERIES):
        try:
            df = catalog.QUERIES[name](spark, sf)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # pragma: no cover - audit tool
            print(f"{name:24s} ERROR {type(exc).__name__}: {exc}")
            lines.append((name, f"ERROR {type(exc).__name__}", ""))
            bad += 1
            continue
        flags = audit_one(name, plan)
        status = ",".join(flags) if flags else "ok"
        # observability extras (informational, not flagged)
        extras = []
        if "PushedFilters: [" in plan and not re.search(
            r"PushedFilters: \[\]", plan
        ):
            extras.append("pushdown")
        if "BroadcastHashJoin" in plan:
            extras.append("broadcast")
        n_ex = plan.count("Exchange hashpartitioning")
        extras.append(f"{n_ex}x shuffle")
        print(f"{name:24s} {status:12s} {', '.join(extras)}")
        lines.append((name, status, ", ".join(extras)))
        if flags:
            bad += 1
    spark.stop()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "AUDIT.md"), "w") as f:
        f.write(
            "# AUDIT — mechanized physical-plan sweep\n\n"
            f"Generated by `python tools/explain_audit.py {sf}` over every\n"
            "catalog query. Flags: CARTESIAN (cartesian/nested-loop join\n"
            "outside the size-gated similarity kernels), GLOBAL_WIN\n"
            "(single-partition window outside O(1)-row inputs), PY_UDF\n"
            "(row-at-a-time Python in the plan). Extras are informational:\n"
            "pushdown = non-empty PushedFilters on a scan, broadcast =\n"
            "BroadcastHashJoin present, Nx shuffle = hash Exchange count.\n\n"
            "| query | status | plan notes |\n|---|---|---|\n"
        )
        for name, status, extras in lines:
            f.write(f"| {name} | {status} | {extras} |\n")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
