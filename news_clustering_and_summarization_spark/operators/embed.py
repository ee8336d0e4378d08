"""Embedding operator (SURVEY §2.8 M1/M2; reference embed_docs.py:70-95,
model_artifacts/embedding/model/code/inference.py).

Pluggable backends behind one pandas-UDF surface:

* ``DeterministicHashEmbedder`` — seeded hashing-trick projection into
  ``dim`` buckets with ±1 signs, L2-normalized. Fully deterministic, so
  clustering golden tests are reproducible (SURVEY §7.2.3). This is the
  test/bench backend.
* ``BedrockTitanBackend`` / ``SageMakerBackend`` — stubs with the
  reference's batching contract (≤200 texts/call, dims=512,
  variables.tf:51-55, 103-107); they raise unless the respective SDK
  is importable and configured. The Spark-side plumbing (Arrow batches,
  schema) is identical to the deterministic backend, so swapping the
  backend does not change the plan.

The embedding column is ``array<array<float>>`` with a single-element
outer list, matching the reference wire format (embed_docs.py:97-98,
unwrapped at process_records.py:86).
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Protocol

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_ARTICLES_PER_CALL = 200  # reference variables.tf:103-107
DEFAULT_DIM = 64  # test tables use 64; reference deploys 512


class EmbeddingBackend(Protocol):
    dim: int

    def embed_batch(self, texts: list[str]) -> np.ndarray: ...


class DeterministicHashEmbedder:
    """Hashing-trick bag-of-words embedding.

    token -> md5(f'{seed}|{token}') -> (bucket, sign); vector is the
    signed token-count histogram, L2-normalized. Same instruction-prefix
    hook as the reference models (embedding_model_utils.py:60-61).
    """

    def __init__(self, dim: int = DEFAULT_DIM, seed: int = 42, instruction: str = ""):
        self.dim = dim
        self.seed = seed
        self.instruction = instruction
        # RAW token -> (bucket, sign) | None memo (r11: keyed on the
        # token as split, BEFORE the per-char alnum strip, so repeats
        # skip the strip loop AND the md5 — natural-language corpora
        # repeat a small vocabulary, collapsing both costs to one per
        # distinct raw token per worker; capped to bound memory).
        # None records "strips to empty".
        self._memo: dict[str, tuple[int, float] | None] = {}

    def _bucket_sign(self, raw: str) -> tuple[int, float] | None:
        hit = self._memo.get(raw)
        if hit is not None or raw in self._memo:
            return hit
        token = "".join(ch for ch in raw if ch.isalnum())
        if not token:
            val = None
        else:
            h = int.from_bytes(
                hashlib.md5(f"{self.seed}|{token}".encode()).digest()[:8],
                "big",
            )
            val = (h % self.dim, 1.0 if (h >> 62) & 1 else -1.0)
        if len(self._memo) < 1_000_000:
            self._memo[raw] = val
        return val

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        bucket_sign = self._bucket_sign
        for row, text in enumerate(texts):
            if not text:
                continue
            r = out[row]
            for raw in (self.instruction + text).lower().split():
                bs = bucket_sign(raw)
                if bs is not None:
                    # += in split order: same float accumulation order
                    # as the unmemoized loop — bit-identical histograms
                    r[bs[0]] += bs[1]
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        return out / norms


# Transient AWS error codes worth retrying (public boto3 error shape:
# exc.response["Error"]["Code"]); anything else is fatal immediately.
TRANSIENT_ERROR_CODES = frozenset(
    {
        "ThrottlingException",
        "TooManyRequestsException",
        "ServiceUnavailableException",
        "ModelTimeoutException",
        "InternalServerException",
    }
)

# botocore's connection-level failures carry NO response dict — they
# are exception classes, matched by name so no SDK import is needed.
# These are the most common transient failures of all (socket resets,
# read timeouts) and must retry like a throttle would.
TRANSIENT_ERROR_CLASSES = frozenset(
    {
        "ConnectionError",
        "ConnectTimeoutError",
        "ReadTimeoutError",
        "EndpointConnectionError",
        "ConnectionClosedError",
        "TimeoutError",
    }
)

# Name-matching is scoped to network-transport modules: unrelated
# libraries reuse names like TimeoutError/ConnectionError for
# non-network failures where a backoff-retry cannot help. Builtin
# ConnectionError/TimeoutError subclasses always classify as
# transient (socket-level by definition) via isinstance instead.
TRANSIENT_ERROR_MODULES = frozenset(
    {"botocore", "boto3", "aiobotocore", "urllib3", "aiohttp",
     "socket", "ssl"}
)


# boto3's default-session client() is not thread-safe; the concurrent
# summarize fan-out (and any multi-threaded caller) must serialize
# first-use client creation. Module-level so backend instances stay
# picklable into UDF closures (locks can't be pickled; the module —
# and with it this lock — is re-imported per executor).
import threading

_CLIENT_CREATE_LOCK = threading.Lock()


def _error_code(exc: Exception) -> str | None:
    response = getattr(exc, "response", None)
    if isinstance(response, dict):
        return response.get("Error", {}).get("Code")
    return None


def _is_transient(exc: Exception) -> bool:
    if _error_code(exc) in TRANSIENT_ERROR_CODES:
        return True
    if isinstance(exc, (ConnectionError, TimeoutError)):
        return True
    return any(
        c.__name__ in TRANSIENT_ERROR_CLASSES
        and c.__module__.partition(".")[0] in TRANSIENT_ERROR_MODULES
        for c in type(exc).__mro__
    )


def _invoke_with_retries(call, what: str, max_retries: int, sleep):
    """Shared retry envelope: transient codes/connection errors retried
    with exponential backoff (1s, 2s, 4s...), fatal codes and
    exhaustion mapped to a RuntimeError naming the endpoint/model so a
    stream failure is attributable from the driver log alone."""
    attempt = 0
    while True:
        try:
            return call()
        except Exception as exc:  # noqa: BLE001 - classified below
            if _is_transient(exc) and attempt < max_retries:
                sleep(2**attempt)
                attempt += 1
                continue
            raise RuntimeError(
                f"{what} failed "
                f"(code={_error_code(exc) or type(exc).__name__})"
            ) from exc


class BedrockTitanBackend:
    """Titan v2 via Bedrock (embed_docs.py:70-95: dimensions=512,
    normalize=true, one text per InvokeModel call).

    ``client`` injects the transport (anything with
    ``invoke_model(modelId=..., body=...)`` returning
    ``{"body": <read()able>}``) — contract tests use a fake; without
    one, a boto3 bedrock-runtime client is created lazily, and a clear
    NotImplementedError points local runs at the deterministic
    backend when boto3 is absent."""

    def __init__(
        self,
        dim: int = 512,
        model_id: str = "amazon.titan-embed-text-v2:0",
        client=None,
        max_retries: int = 3,
        sleep=None,
    ):
        self.dim = dim
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
                    "use DeterministicHashEmbedder for local runs."
                ) from exc
            with _CLIENT_CREATE_LOCK:
                if self._client is None:
                    self._client = boto3.client("bedrock-runtime")
        return self._client

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        import json

        client = self._get_client()
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        for i, text in enumerate(texts):
            body = json.dumps(
                {
                    "inputText": text,
                    "dimensions": self.dim,
                    "normalize": True,
                }
            )
            resp = _invoke_with_retries(
                lambda: client.invoke_model(modelId=self.model_id, body=body),
                f"Bedrock invoke_model({self.model_id})",
                self.max_retries,
                self._sleep,
            )
            payload = json.loads(resp["body"].read())
            out[i] = payload["embedding"]
        return out


class SageMakerBackend:
    """SageMaker realtime endpoint (embed_docs.py:57-68: batched ≤200
    texts per call; inference.py:23-98 accepts ``{"texts": [...]}``
    and returns ``{"embeddings": [[...], ...]}``).

    The ≤MAX_ARTICLES_PER_CALL contract is enforced HERE, not just in
    the UDF chunker, so a violation anywhere surfaces as a loud
    ValueError instead of a silent oversize request. ``client``
    injects the transport (``invoke_endpoint(EndpointName=...,
    ContentType=..., Body=...)``)."""

    def __init__(
        self,
        dim: int = 512,
        endpoint_name: str = "",
        client=None,
        max_retries: int = 3,
        sleep=None,
    ):
        self.dim = dim
        self.endpoint_name = endpoint_name
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
                    "SageMaker backend requires boto3 + an endpoint; "
                    "use DeterministicHashEmbedder for local runs."
                ) from exc
            with _CLIENT_CREATE_LOCK:
                if self._client is None:
                    self._client = boto3.client("sagemaker-runtime")
        return self._client

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        import json

        if len(texts) > MAX_ARTICLES_PER_CALL:
            raise ValueError(
                f"SageMaker endpoint accepts at most "
                f"{MAX_ARTICLES_PER_CALL} texts per call, got {len(texts)}"
            )
        client = self._get_client()
        body = json.dumps({"texts": texts})
        resp = _invoke_with_retries(
            lambda: client.invoke_endpoint(
                EndpointName=self.endpoint_name,
                ContentType="application/json",
                Body=body,
            ),
            f"SageMaker invoke_endpoint({self.endpoint_name})",
            self.max_retries,
            self._sleep,
        )
        payload = json.loads(resp["Body"].read())
        return np.asarray(payload["embeddings"], dtype=np.float64)


def make_embed_udf(backend: EmbeddingBackend | None = None, wrapped: bool = True):
    """Series->Series pandas UDF embedding texts with the backend.

    Arrow moves whole batches; the backend sees ≤MAX_ARTICLES_PER_CALL
    texts per call to honor the reference's endpoint contract.
    """
    backend = backend or DeterministicHashEmbedder()
    ret = (
        T.ArrayType(T.ArrayType(T.FloatType()))
        if wrapped
        else T.ArrayType(T.FloatType())
    )

    @F.pandas_udf(ret)
    def embed(texts: pd.Series) -> pd.Series:
        vals = texts.fillna("").tolist()
        chunks = []
        for i in range(0, len(vals), MAX_ARTICLES_PER_CALL):
            chunks.append(backend.embed_batch(vals[i : i + MAX_ARTICLES_PER_CALL]))
        if chunks:
            mat = np.vstack(chunks).astype(np.float32)
        else:
            mat = np.zeros((0, backend.dim), dtype=np.float32)
        if wrapped:
            return pd.Series([[row.tolist()] for row in mat])
        return pd.Series([row.tolist() for row in mat])

    return embed


def embed_articles(
    df: DataFrame,
    text_col: str = "embed_text",
    backend: EmbeddingBackend | None = None,
) -> DataFrame:
    """M1: attach ``concat_embedding`` (wrapped wire format)."""
    udf = make_embed_udf(backend, wrapped=True)
    return df.withColumn("concat_embedding", udf(F.col(text_col)))


def unwrap_embedding(col: Column | str) -> Column:
    """Reference unwraps the 1-element outer list at
    process_records.py:86."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(c, 1)
