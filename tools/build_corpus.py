#!/usr/bin/env python3
"""End-to-end corpus build CLI: the catalog's certified preprocessing
chain (quality -> language -> exact dedup -> per-source token budget)
run as a TOOL, with the result published as an atomic serving
snapshot and one JSON stats line on stdout.

Usage:
  python tools/build_corpus.py [--sf DIR] [--out DIR]
      [--budget N] [--min-quality Q] [--lang CODE]

The per-stage operators are the same ones the oracle gate certifies
(catalog queries quality_score, lang_id, dedup_exact,
select_token_budget, corpus_build); this wrapper adds the delivery
half a pipeline needs: an immutable versioned output
(tables.publish_snapshot) and machine-readable accounting.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from news_clustering_and_summarization_spark.operators import (  # noqa: E402
    text_analysis as TA,
)
from news_clustering_and_summarization_spark.operators.sampling import (  # noqa: E402
    select_token_budget,
)
from news_clustering_and_summarization_spark.session import get_spark  # noqa: E402
from news_clustering_and_summarization_spark.sources import tables as T  # noqa: E402


def build_corpus(
    spark,
    sf_dir: str,
    out_dir: str,
    budget: int,
    min_quality: float,
    lang: str,
) -> dict:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs = docs.where(F.col("text").isNotNull())
    n_input = docs.count()
    scored = TA.token_counts(
        TA.quality_score(docs).withColumn("lang_pred", TA.language_id("text"))
    )
    filtered = scored.where(
        (F.col("quality_score") >= min_quality)
        & (F.col("lang_pred") == lang)
    )
    n_filtered = filtered.count()
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        filtered.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    n_deduped = deduped.count()
    budgeted = select_token_budget(
        deduped,
        budget=budget,
        tokens_col="bpe_token_estimate",
        quality_col="quality_score",
        id_col="doc_id",
        shard_col="source",
    ).select(
        "doc_id", "source", "lang", "text",
        "quality_score", "bpe_token_estimate",
    )
    version = T.publish_snapshot(budgeted, out_dir)
    out = T.read_latest_snapshot(spark, out_dir)
    per_source = {
        r["source"]: {"n_docs": r["n"], "tokens": r["tok"]}
        for r in out.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("bpe_token_estimate").cast("long").alias("tok"),
        )
        .collect()
    }
    return {
        "version": version,
        "n_input": n_input,
        "n_after_filters": n_filtered,
        "n_after_dedup": n_deduped,
        "n_selected": out.count(),
        "total_tokens": sum(s["tokens"] for s in per_source.values()),
        "budget_per_source": budget,
        "per_source": per_source,
        "out": out_dir,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--budget", type=int, default=50_000)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--lang", default="en")
    args = ap.parse_args()
    spark = get_spark("build-corpus")
    try:
        stats = build_corpus(
            spark, args.sf, args.out, args.budget,
            args.min_quality, args.lang,
        )
    finally:
        spark.stop()
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
