"""Summarization operator (SURVEY §2.7 ST6, §2.8 M4, §2.4 A3-A4,
§2.2 P11-P12, P15; reference trigger_sfn.py + summarization.py).

Pipeline: threshold-filter the cluster-update stream -> gather member
articles -> assemble the reference's prompt (chronological order,
per-article truncation) -> LLM backend -> parse <title>/<summary> ->
merge results + mode/min/max aggregates onto the metadata table.

The LLM is pluggable (M4): `DeterministicExtractiveSummarizer` for
tests/bench (pure function of the input; no service), `BedrockClaudeBackend`
stub with the reference's generation parameters (max_tokens=500,
temperature=0.1, top_p=1, top_k=100 — summarization.py:82-95).
"""

from __future__ import annotations

from typing import Protocol

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import text as TX

ARTICLES_THRESHOLD = 5  # reference lambda.tf:138
ARTICLE_CAP_MULT = 3  # trigger_sfn.py:14


def should_summarize(
    n_articles: F.Column | str,
    summary_count: F.Column | str,
    threshold: int = ARTICLES_THRESHOLD,
) -> F.Column:
    """ST6 trigger predicate (trigger_sfn.py:45-55):
    lower = n > T*(count+1); upper = n < 3T;
    fire when (lower and upper) or (lower and count == 0)."""
    n = F.col(n_articles) if isinstance(n_articles, str) else n_articles
    c = F.col(summary_count) if isinstance(summary_count, str) else summary_count
    lower = n > threshold * (c + 1)
    upper = n < ARTICLE_CAP_MULT * threshold
    return (lower & upper) | (lower & (c == 0))


def filter_summarize_candidates(clusters: DataFrame) -> DataFrame:
    """P9 + ST6: clusters crossing the summarize threshold
    (trigger_sfn.py:24-25, 45-55). Input is the clusters metadata
    table (which carries summary_count); the raw change feed from
    incremental_cluster_update doesn't — the reference's trigger
    lambda likewise reads the metadata item before deciding
    (trigger_sfn.py:34-44)."""
    return clusters.where(
        should_summarize("number_of_articles", "summary_count")
    )


class SummarizerBackend(Protocol):
    def summarize_batch(self, prompts: list[str]) -> list[str]: ...


class DeterministicExtractiveSummarizer:
    """Deterministic stand-in for Claude (M4 test backend): emits
    <title>first title</title><summary>first N words of the
    concatenated context</summary>. Pure function of the prompt."""

    def __init__(self, max_words: int = 60):
        self.max_words = max_words

    def summarize_batch(self, prompts: list[str]) -> list[str]:
        out = []
        for p in prompts:
            ctx = p.split("<context>")[-1].split("</context>")[0].strip()
            lines = [ln for ln in ctx.split("\n") if ln.strip()]
            first_title = ""
            if lines and lines[0].startswith("title: "):
                first_title = lines[0][len("title: "):].split(", summary:")[0]
            words = " ".join(lines).split()
            summary = " ".join(words[: self.max_words])
            out.append(
                f"<title>{first_title}</title><summary>{summary}</summary>"
            )
        return out


class BedrockClaudeBackend:
    """Claude 3 Haiku via Bedrock with the reference's generation
    parameters (summarization.py:82-95, lambda.tf:185).

    ``client`` injects the transport (``invoke_model(modelId=...,
    body=...)`` returning ``{"body": <read()able>}``) so the request
    contract — one message per prompt, GENERATION_PARAMS in every
    body — is testable without AWS; without a client, boto3 is
    imported lazily and a NotImplementedError points local runs at
    the deterministic summarizer when it is absent."""

    GENERATION_PARAMS = {
        "max_tokens": 500,
        "temperature": 0.1,
        "top_p": 1,
        "top_k": 100,
    }

    def __init__(
        self,
        model_id: str = "anthropic.claude-3-haiku-20240307-v1:0",
        client=None,
        max_retries: int = 3,
        sleep=None,
    ):
        self.model_id = model_id
        self._client = client
        self.max_retries = max_retries
        import time

        self._sleep = sleep or time.sleep

    def _get_client(self):
        if self._client is None:
            try:
                import boto3
            except ImportError as exc:
                raise NotImplementedError(
                    "Bedrock backend requires boto3 + AWS credentials; "
                    "use DeterministicExtractiveSummarizer for local runs."
                ) from exc
            from .embed import _CLIENT_CREATE_LOCK

            with _CLIENT_CREATE_LOCK:
                if self._client is None:
                    self._client = boto3.client("bedrock-runtime")
        return self._client

    def summarize_batch(self, prompts: list[str]) -> list[str]:
        import json

        from .embed import _invoke_with_retries

        client = self._get_client()
        out = []
        for prompt in prompts:
            body = json.dumps(
                {
                    "anthropic_version": "bedrock-2023-05-31",
                    "messages": [{"role": "user", "content": prompt}],
                    **self.GENERATION_PARAMS,
                }
            )
            resp = _invoke_with_retries(
                lambda: client.invoke_model(modelId=self.model_id, body=body),
                f"Bedrock invoke_model({self.model_id})",
                self.max_retries,
                self._sleep,
            )
            payload = json.loads(resp["body"].read())
            out.append(payload["content"][0]["text"])
        return out


def make_summarize_udf(
    backend: SummarizerBackend | None = None, concurrency: int = 1
):
    """M4 summarize UDF. ``concurrency > 1`` overlaps the I/O-bound
    backend calls with a per-executor thread pool — the analogue of
    the reference notebook's asyncio fan-out over Bedrock
    (summarization notebook cells 9-10): each prompt becomes its own
    summarize_batch([prompt]) call, results re-assembled in input
    order. Compute-bound backends (the deterministic summarizer) gain
    nothing; leave concurrency=1 there."""
    backend = backend or DeterministicExtractiveSummarizer()

    @F.pandas_udf(T.StringType())
    def summarize(prompts: pd.Series) -> pd.Series:
        return pd.Series(
            summarize_concurrent(
                backend, prompts.fillna("").tolist(), concurrency
            )
        )

    return summarize


def summarize_concurrent(
    backend: SummarizerBackend, vals: list[str], concurrency: int
) -> list[str]:
    """One summarize_batch([prompt]) per prompt through a thread pool,
    results in input order. Factored out of the UDF so the overlap
    behavior is directly testable without an executor round-trip."""
    if concurrency <= 1 or len(vals) <= 1:
        return backend.summarize_batch(vals)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=concurrency) as pool:
        return list(pool.map(lambda p: backend.summarize_batch([p])[0], vals))


def build_prompts(
    candidates: DataFrame,
    clusters: DataFrame,
    cluster_articles: DataFrame,
) -> DataFrame:
    """P15: per-candidate prompt with per-article `title:, summary:`
    lines in chronological order (O1 — notebook cell 6 sorts by
    publication_date) and the truncation budgets of P11.

    Output: (PK, summary_count, prompt).
    """
    meta = clusters.select("PK", "generated_summary", "summary_count")
    cand = candidates.select("PK").distinct().join(meta, "PK", "inner")

    limit = F.when(
        F.col("summary_count") > 0, F.lit(TX.SUMMARY_LIMIT_LATER)
    ).otherwise(F.lit(TX.SUMMARY_LIMIT_FIRST))

    arts = cluster_articles.join(
        F.broadcast(cand.select("PK", "summary_count")), "PK", "inner"
    ).withColumn(
        "_line",
        TX.article_prompt_line(F.col("title"), F.col("summary"), limit),
    )
    # chronological order inside each cluster, stable on SK
    ordered = (
        arts.groupBy("PK")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("publication_date", "SK", "_line")
                        )
                    ),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("_context")
        )
    )
    return (
        cand.join(ordered, "PK", "left")
        .select(
            "PK",
            "summary_count",
            TX.assemble_prompt(
                F.col("generated_summary"),
                F.coalesce(F.col("_context"), F.lit("")),
            ).alias("prompt"),
        )
    )


def cluster_aggregates(cluster_articles: DataFrame) -> DataFrame:
    """A3/A4 (summarization.py:13-61): per cluster —
    most_common_location / most_common_organization (mode over the
    exploded entity lists; '' when absent) and earliest/latest
    publication date reformatted to '%Y-%m-%d %H:%M:%S'."""

    def mode_of(col: str) -> DataFrame:
        exploded = cluster_articles.select(
            "PK", F.explode_outer(col).alias("val")
        ).where(F.col("val").isNotNull())
        counts = exploded.groupBy("PK", "val").agg(F.count("*").alias("n"))
        w = Window.partitionBy("PK").orderBy(F.desc("n"), F.asc("val"))
        return (
            counts.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("PK", F.col("val").alias(f"most_common_{col[:-1]}"))
        )

    dates = cluster_articles.groupBy("PK").agg(
        TX.format_date(
            F.min(TX.parse_pub_date("publication_date"))
        ).alias("earliest_date"),
        TX.format_date(
            F.max(TX.parse_pub_date("publication_date"))
        ).alias("latest_date"),
    )
    base = cluster_articles.select("PK").distinct()
    return (
        base.join(mode_of("locations"), "PK", "left")
        .join(mode_of("organizations"), "PK", "left")
        .join(dates, "PK", "left")
        .select(
            "PK",
            F.coalesce("most_common_location", F.lit("")).alias(
                "most_common_location"
            ),
            F.coalesce("most_common_organization", F.lit("")).alias(
                "most_common_organization"
            ),
            F.coalesce("earliest_date", F.lit("")).alias("earliest_date"),
            F.coalesce("latest_date", F.lit("")).alias("latest_date"),
        )
    )


def summarize_clusters(
    candidates: DataFrame,
    clusters: DataFrame,
    cluster_articles: DataFrame,
    backend: SummarizerBackend | None = None,
) -> DataFrame:
    """M4 + A3/A4: produce the summary-update rows
    (summarization.py handler + summarization_pipeline.tf:24-58).

    Output: (PK, description, generated_summary, summary_count,
    most_common_location, most_common_organization, earliest_date,
    latest_date) — exactly the fields the SFN writes back.
    """
    udf = make_summarize_udf(backend)
    prompts = build_prompts(candidates, clusters, cluster_articles)
    responses = prompts.withColumn("_res", udf(F.col("prompt")))
    title, summary = TX.parse_summary_response("_res")
    parsed = responses.select(
        "PK",
        title.alias("description"),
        summary.alias("generated_summary"),
        (F.col("summary_count") + 1).alias("summary_count"),
    )
    aggs = cluster_aggregates(
        cluster_articles.join(
            F.broadcast(parsed.select("PK")), "PK", "left_semi"
        )
    )
    return parsed.join(aggs, "PK", "left")


def apply_summary_updates(clusters: DataFrame, summaries: DataFrame) -> DataFrame:
    """Second MERGE: write summary fields onto metadata rows
    (summarization_pipeline.tf:24-58 UpdateDynamoDB state)."""
    s = summaries.select(
        "PK",
        F.col("description").alias("_d"),
        F.col("generated_summary").alias("_g"),
        F.col("summary_count").alias("_c"),
        F.col("most_common_location").alias("_l"),
        F.col("most_common_organization").alias("_o"),
        F.col("earliest_date").alias("_e"),
        F.col("latest_date").alias("_t"),
    )
    return (
        clusters.join(F.broadcast(s), "PK", "left")
        .select(
            *[
                c
                for c in clusters.columns
                if c
                not in {
                    "description",
                    "generated_summary",
                    "summary_count",
                    "most_common_location",
                    "most_common_organization",
                    "earliest_date",
                    "latest_date",
                }
            ],
            F.coalesce("_d", "description").alias("description"),
            F.coalesce("_g", "generated_summary").alias("generated_summary"),
            F.coalesce("_c", "summary_count").alias("summary_count"),
            F.coalesce("_l", "most_common_location").alias(
                "most_common_location"
            ),
            F.coalesce("_o", "most_common_organization").alias(
                "most_common_organization"
            ),
            F.coalesce("_e", "earliest_date").alias("earliest_date"),
            F.coalesce("_t", "latest_date").alias("latest_date"),
        )
        .select(*clusters.columns)
    )
