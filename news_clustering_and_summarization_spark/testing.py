"""Fake cloud transports for backend contract tests (and for users
wiring the pipeline without AWS). They implement the public boto3 wire
shape — ``invoke_model`` / ``invoke_endpoint``, error objects carrying
``response["Error"]["Code"]`` — so the live backends' request/response
mapping, batching, and retry envelope can be exercised hermetically.
Defined inside the package (not in tests/) so Spark executors can
unpickle them by module name.
"""

from __future__ import annotations

import io
import json


class AwsStyleError(Exception):
    """Error with the boto3 ClientError shape the retry envelope
    classifies on."""

    def __init__(self, code: str):
        super().__init__(code)
        self.response = {"Error": {"Code": code}}


class FakeBedrockRuntime:
    """``invoke_model`` fake: records (modelId, parsed body) per call;
    fails the first ``fail_first`` calls with ``fail_code``. Returns a
    Titan-shaped ``{"embedding": [...]}`` payload by default, or a
    Claude-shaped ``{"content": [{"text": ...}]}`` with
    ``payload_kind="content"``."""

    def __init__(
        self,
        dim: int = 8,
        fail_first: int = 0,
        fail_code: str = "ThrottlingException",
        payload_kind: str = "embedding",
        text: str = "<title>t</title><summary>s</summary>",
    ):
        self.dim = dim
        self.calls: list[tuple[str, dict]] = []
        self.fail_first = fail_first
        self.fail_code = fail_code
        self.payload_kind = payload_kind
        self.text = text

    def invoke_model(self, modelId, body):
        self.calls.append((modelId, json.loads(body)))
        if len(self.calls) <= self.fail_first:
            raise AwsStyleError(self.fail_code)
        if self.payload_kind == "embedding":
            payload = {"embedding": [0.5] * self.dim}
        else:
            payload = {"content": [{"text": self.text}]}
        return {"body": io.BytesIO(json.dumps(payload).encode())}


class FakeSageMakerRuntime:
    """``invoke_endpoint`` fake: echoes one ``[len(text)] * dim``
    vector per input text so row order is verifiable end-to-end."""

    def __init__(
        self,
        dim: int = 8,
        fail_first: int = 0,
        fail_code: str = "ThrottlingException",
    ):
        self.dim = dim
        self.calls: list[tuple[str, str, list[str]]] = []
        self.fail_first = fail_first
        self.fail_code = fail_code

    def invoke_endpoint(self, EndpointName, ContentType, Body):
        texts = json.loads(Body)["texts"]
        self.calls.append((EndpointName, ContentType, texts))
        if len(self.calls) <= self.fail_first:
            raise AwsStyleError(self.fail_code)
        return {
            "Body": io.BytesIO(
                json.dumps(
                    {"embeddings": [[float(len(t))] * self.dim for t in texts]}
                ).encode()
            )
        }


def inflate_vectors(
    emb,
    factor: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    noise: float = 0.05,
    seed: int = 42,
):
    """Deterministically replicate each embedding ``factor`` times with
    hash-derived elementwise perturbation (uniform ±``noise``) — the
    bench/test corpus builder for exercising the LSH similarity path
    above LSH_THRESHOLD without synthesizing data files. Copies derive
    from the driver-generated embeddings table; ids become
    ``id * factor + copy``. Pure Column expressions, shuffle-free.
    The perturbation hash is md5-derived (functions/hashing.hash64)
    so inflate_vectors_sql replays it bit-for-bit in DuckDB — the
    cluster_lsh oracle depends on that."""
    from pyspark.sql import functions as F

    from .functions import hashing as H

    return emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("_copy"),
    ).select(
        (F.col("_id") * factor + F.col("_copy")).alias(id_col),
        F.transform(
            F.col("_v").cast("array<double>"),
            lambda x, j: x
            + (
                H.hash64(
                    F.concat_ws("|", F.col("_id"), F.col("_copy"), j),
                    seed,
                )
                % 2001
                - 1000
            )
            / F.lit(1000.0)
            * F.lit(noise),
        ).alias(vec_col),
    )


def inflate_vectors_sql(
    src: str,
    factor: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    noise: float = 0.05,
    seed: int = 42,
) -> str:
    """DuckDB replay of inflate_vectors over relation ``src`` — same
    md5 perturbation, same id arithmetic. Emits a SELECT (caller wraps
    in a CTE)."""
    from .functions.hashing import hash64_sql

    h = hash64_sql(
        f"(s.{id_col}::VARCHAR || '|' || c.copy::VARCHAR"
        " || '|' || (i - 1)::VARCHAR)",
        seed,
    )
    return f"""
SELECT s.{id_col} * {factor} + c.copy AS {id_col},
       list_transform(range(1, {dim + 1}),
         i -> s.{vec_col}[i]::DOUBLE
              + ({h} % 2001 - 1000) / 1000.0 * {noise}) AS {vec_col}
FROM {src} s CROSS JOIN range(0, {factor}) c(copy)"""
