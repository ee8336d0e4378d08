"""Contract tests for the cloud model backends via fake transports —
no SDK or AWS account needed (reference contracts: embed_docs.py:57-95
batching, variables.tf:103-107 ≤200 texts/call, summarization.py:82-95
generation parameters). The fakes implement the public boto3 wire
shape (invoke_model / invoke_endpoint, error dicts with
response["Error"]["Code"]), so these tests pin the exact
request/response mapping the live clients would see.
"""

from __future__ import annotations

import io
import json

import numpy as np
import pytest

from news_clustering_and_summarization_spark.operators.embed import (
    MAX_ARTICLES_PER_CALL,
    BedrockTitanBackend,
    SageMakerBackend,
    embed_articles,
    make_embed_udf,
)
from news_clustering_and_summarization_spark.operators.summarize import (
    BedrockClaudeBackend,
)
from news_clustering_and_summarization_spark.testing import (
    FakeBedrockRuntime,
    FakeSageMakerRuntime,
)


# --- Bedrock Titan -----------------------------------------------------


def test_titan_one_invoke_per_text_with_dims_and_normalize():
    fake = FakeBedrockRuntime(dim=8)
    be = BedrockTitanBackend(dim=8, client=fake)
    out = be.embed_batch(["alpha", "beta", "gamma"])
    assert out.shape == (3, 8)
    # one call per text (embed_docs.py:70-95), each carrying the
    # dimensions + normalize contract
    assert len(fake.calls) == 3
    for (model_id, body), text in zip(fake.calls, ["alpha", "beta", "gamma"]):
        assert model_id == "amazon.titan-embed-text-v2:0"
        assert body == {"inputText": text, "dimensions": 8, "normalize": True}


def test_titan_retries_transient_then_succeeds():
    fake = FakeBedrockRuntime(dim=4, fail_first=2)
    slept = []
    be = BedrockTitanBackend(dim=4, client=fake, sleep=slept.append)
    out = be.embed_batch(["x"])
    assert out.shape == (1, 4)
    assert len(fake.calls) == 3  # 2 throttles + 1 success
    assert slept == [1, 2]  # exponential backoff


def test_titan_fatal_error_maps_to_runtime_error():
    fake = FakeBedrockRuntime(fail_first=99, fail_code="AccessDeniedException")
    be = BedrockTitanBackend(client=fake, sleep=lambda s: None)
    with pytest.raises(RuntimeError, match="AccessDeniedException"):
        be.embed_batch(["x"])
    assert len(fake.calls) == 1  # fatal codes are not retried


def test_titan_retry_exhaustion_raises():
    fake = FakeBedrockRuntime(fail_first=99)
    be = BedrockTitanBackend(client=fake, max_retries=2, sleep=lambda s: None)
    with pytest.raises(RuntimeError, match="ThrottlingException"):
        be.embed_batch(["x"])
    assert len(fake.calls) == 3  # initial + 2 retries


# --- SageMaker ---------------------------------------------------------


def test_sagemaker_batch_contract_and_response_mapping():
    fake = FakeSageMakerRuntime(dim=8)
    be = SageMakerBackend(dim=8, endpoint_name="embed-ep", client=fake)
    out = be.embed_batch(["ab", "cdef"])
    assert out.shape == (2, 8)
    assert out[0, 0] == 2.0 and out[1, 0] == 4.0
    ((ep, ctype, texts),) = fake.calls
    assert ep == "embed-ep" and ctype == "application/json"
    assert texts == ["ab", "cdef"]


def test_sagemaker_rejects_oversize_batch():
    be = SageMakerBackend(client=FakeSageMakerRuntime())
    with pytest.raises(ValueError, match=str(MAX_ARTICLES_PER_CALL)):
        be.embed_batch(["t"] * (MAX_ARTICLES_PER_CALL + 1))


def test_sagemaker_udf_chunks_to_endpoint_limit(spark):
    """Driving the real pandas-UDF path with >200 rows: the chunker
    must keep every endpoint call within MAX_ARTICLES_PER_CALL (the
    backend raises inside the executor otherwise) and reassemble rows
    in order."""
    n = MAX_ARTICLES_PER_CALL * 2 + 50
    df = spark.createDataFrame(
        [(f"d{i}", "w " * (i % 7 + 1)) for i in range(n)],
        "id string, embed_text string",
    )
    be = SageMakerBackend(dim=4, endpoint_name="ep", client=FakeSageMakerRuntime(dim=4))
    got = embed_articles(df, backend=be)
    rows = got.collect()
    assert len(rows) == n
    assert all(len(r["concat_embedding"][0]) == 4 for r in rows)


# --- Bedrock Claude summarizer ----------------------------------------


def test_claude_generation_params_in_every_request():
    fake = FakeBedrockRuntime(payload_kind="content")
    be = BedrockClaudeBackend(client=fake)
    out = be.summarize_batch(["p1", "p2"])
    assert out == ["<title>t</title><summary>s</summary>"] * 2
    assert len(fake.calls) == 2
    for (model_id, body), prompt in zip(fake.calls, ["p1", "p2"]):
        assert model_id == "anthropic.claude-3-haiku-20240307-v1:0"
        assert body["messages"] == [{"role": "user", "content": prompt}]
        # reference generation parameters (summarization.py:82-95)
        assert body["max_tokens"] == 500
        assert body["temperature"] == 0.1
        assert body["top_p"] == 1 and body["top_k"] == 100
        assert body["anthropic_version"] == "bedrock-2023-05-31"


def test_claude_transient_retry():
    fake = FakeBedrockRuntime(payload_kind="content", fail_first=1)
    be = BedrockClaudeBackend(client=fake, sleep=lambda s: None)
    assert len(be.summarize_batch(["p"])) == 1
    assert len(fake.calls) == 2


def test_summarize_concurrent_overlaps_and_orders():
    """concurrency>1 must issue one backend call per prompt, actually
    overlap them (peak in-flight > 1), and keep input order."""
    import threading
    import time

    from news_clustering_and_summarization_spark.operators.summarize import (
        summarize_concurrent,
    )

    class SlowEchoBackend:
        def __init__(self):
            self.lock = threading.Lock()
            self.in_flight = 0
            self.peak = 0
            self.calls = []

        def summarize_batch(self, prompts):
            with self.lock:
                self.in_flight += 1
                self.peak = max(self.peak, self.in_flight)
                self.calls.append(list(prompts))
            time.sleep(0.05)
            with self.lock:
                self.in_flight -= 1
            return [f"S:{p}" for p in prompts]

    be = SlowEchoBackend()
    out = summarize_concurrent(be, [f"p{i}" for i in range(16)], 8)
    assert out == [f"S:p{i}" for i in range(16)]
    assert all(len(c) == 1 for c in be.calls)  # one prompt per call
    assert be.peak > 1  # calls overlapped


def test_concurrent_summarize_udf_end_to_end(spark):
    """The concurrency>1 UDF path on an executor: results line up
    with prompts row by row."""
    from pyspark.sql import functions as F

    from news_clustering_and_summarization_spark.operators.summarize import (
        make_summarize_udf,
    )

    class EchoBackend:
        def summarize_batch(self, prompts):
            return [f"S:{p}" for p in prompts]

    df = spark.createDataFrame(
        [(f"p{i}",) for i in range(16)], "prompt string"
    ).coalesce(1)
    udf = make_summarize_udf(EchoBackend(), concurrency=8)
    rows = df.select("prompt", udf(F.col("prompt")).alias("s")).collect()
    assert len(rows) == 16
    assert all(r["s"] == f"S:{r['prompt']}" for r in rows)


def test_connection_errors_retry_like_throttles():
    """botocore connection-level failures carry no response dict —
    they must still classify as transient and retry."""
    from news_clustering_and_summarization_spark.operators.embed import (
        _invoke_with_retries,
    )

    class ReadTimeoutError(Exception):  # botocore-shaped, no .response
        pass

    # botocore-shaped includes the module: name-matching is scoped to
    # network-transport modules so unrelated libraries' TimeoutErrors
    # don't retry pointlessly
    ReadTimeoutError.__module__ = "botocore.exceptions"

    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise ReadTimeoutError("read timed out")
        return "ok"

    assert _invoke_with_retries(flaky, "op", 3, lambda s: None) == "ok"
    assert len(calls) == 3

    class AccessDenied(Exception):
        response = {"Error": {"Code": "AccessDeniedException"}}

    def fatal():
        calls.append(1)
        raise AccessDenied()

    calls.clear()
    with pytest.raises(RuntimeError, match="AccessDeniedException"):
        _invoke_with_retries(fatal, "op", 3, lambda s: None)
    assert len(calls) == 1  # fatal codes never retry

    # a name-collision from an unrelated library must NOT retry —
    # backoff can't fix a non-network TimeoutError
    class TimeoutError(Exception):  # noqa: A001 - the collision is the point
        pass

    TimeoutError.__module__ = "somelib.pool"

    def unrelated():
        calls.append(1)
        raise TimeoutError("worker pool exhausted")

    calls.clear()
    with pytest.raises(RuntimeError, match="TimeoutError"):
        _invoke_with_retries(unrelated, "op", 3, lambda s: None)
    assert len(calls) == 1
    assert len(calls) == 1
