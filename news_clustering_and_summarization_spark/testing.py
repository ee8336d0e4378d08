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


def _uniform_width(col, np):
    """True iff every list in a no-null Arrow list column has the same
    length, checked from the offsets buffer (see
    operators/cluster._arrow_uniform_width — duplicated here so the
    testing module keeps zero operator imports in kernels)."""
    offs = col.offsets.to_numpy(zero_copy_only=False)
    if len(offs) <= 2:
        return True
    widths = np.diff(offs)
    return bool((widths == widths[0]).all())


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
    ``id * factor + copy``. One NumPy mapInPandas pass, shuffle-free
    (r11: the explode + interpreted transform() fold was ~1s of every
    inflated bench query's wall; the kernel computes the identical
    int64 LCG mix and float perturbation vectorized — values are
    bit-equal, see the modulus argument below).
    The perturbation is an integer LCG mix of (inflated id, dim index,
    seed) — pure codegen'd int64 arithmetic that replays bit-for-bit
    in DuckDB (inflate_vectors_sql; the cluster_lsh oracle depends on
    that). The inflated id is reduced mod _LCG_M BEFORE the first
    multiply — mathematically identical ((x·A + C) mod M ≡
    ((x mod M)·A + C) mod M), so values at every previously-working
    scale are unchanged, and every intermediate stays < 2^62 even
    for the 1e9-range ids of the sf10 rehearsal fixtures (r09: the
    unreduced first product overflowed int64 there — Spark ANSI
    errors, DuckDB errors; neither wraps silently)."""
    from pyspark.sql import functions as F

    id_type = dict(emb.dtypes)[id_col]

    def _perturb(rep_ids, Xr, np):
        """The LCG mix, vectorized on int64: every intermediate is
        < 2^62 (M < 2^31, A ~ 1.1e9, (j+1)*B <= dim*2.7e9) and every
        operand non-negative, so numpy's % and * match Spark's
        pmod-free expression exactly."""
        dim = Xr.shape[1]
        s1 = (rep_ids + np.int64(seed)) % np.int64(_LCG_M)
        s2 = (s1 * np.int64(_LCG_A) + np.int64(_LCG_C)) % np.int64(
            _LCG_M
        )
        j1 = np.arange(1, dim + 1, dtype=np.int64)
        s3 = (
            s2[:, None] * np.int64(_LCG_A)
            + j1[None, :] * np.int64(_MIX_B)
        ) % np.int64(_LCG_M)
        v = s3 % np.int64(2001) - np.int64(1000)
        # same float op order as the Column expression:
        # x + ((v / 1000.0) * noise)
        return Xr + (v / 1000.0) * noise

    def inflate(batches):
        """mapInArrow kernel (r11 session 2, guide §4.2): vector
        columns cross the boundary as flat Arrow buffers reshaped
        zero-copy — the previous mapInPandas form paid a per-row
        object conversion on BOTH sides (Arrow list -> np.ndarray
        cell -> .tolist() on input; list-of-arrays object column ->
        Arrow on output), ~1s/200k rows/side single-core. Float
        arithmetic is byte-for-byte the old kernel's (_perturb)."""
        import numpy as np
        import pyarrow as pa

        out_id_t = None
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            ids_a = rb.column(0)
            v = rb.column(1)
            if out_id_t is None:
                out_id_t = ids_a.type
            ids = ids_a.to_numpy(zero_copy_only=False).astype(np.int64)
            vals = v.flatten()
            if v.null_count == 0 and len(vals) == 0 and n > 0:
                # degenerate: all-empty lists — keep the shape
                vals_np = np.zeros((n, 0), dtype=np.float64)
                X = vals_np
            elif v.null_count == 0 and _uniform_width(v, np):
                # width uniformity checked from the offsets (r11
                # advice): divisibility alone would zero-copy-reshape
                # ragged-but-divisible batches into wrong vectors
                dim = len(vals) // n
                X = (
                    vals.to_numpy(zero_copy_only=False)
                    .astype(np.float64)  # float32 widening is exact
                    .reshape(n, dim)
                )
            else:
                X = None  # nulls or ragged: slow path below
            copies = np.arange(factor, dtype=np.int64)
            # inflated ids, row-major: row i's copies are contiguous —
            # the same (id, copy) pairs the explode produced
            rep_ids = (ids[:, None] * factor + copies[None, :]).reshape(-1)
            rep_id_arr = pa.array(rep_ids).cast(out_id_t)
            if X is not None:
                dim = X.shape[1]
                Xr = np.repeat(X, factor, axis=0)
                out = _perturb(rep_ids, Xr, np)
                offs = pa.array(
                    np.arange(len(rep_ids) + 1, dtype=np.int64) * dim,
                    type=pa.int32(),
                )
                lists = pa.ListArray.from_arrays(
                    offs, pa.array(out.reshape(-1), type=pa.float64())
                )
            else:
                # null/ragged rows: per-row assembly (rare; tests only)
                nulls = np.array(
                    [not v[i].is_valid for i in range(n)], dtype=bool
                )
                rows = [
                    None
                    if nulls[i]
                    else np.asarray(v[i].as_py(), dtype=np.float64)
                    for i in range(n)
                ]
                col: list = []
                for i in range(n):
                    for c in range(factor):
                        if rows[i] is None:
                            col.append(None)
                        else:
                            rid = np.array(
                                [ids[i] * factor + c], dtype=np.int64
                            )
                            col.append(
                                _perturb(rid, rows[i][None, :], np)[0]
                            )
                lists = pa.array(col, type=pa.list_(pa.float64()))
            yield pa.RecordBatch.from_arrays(
                [rep_id_arr, lists], names=[id_col, vec_col]
            )

    return emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
    ).mapInArrow(
        inflate, schema=f"{id_col} {id_type}, {vec_col} array<double>"
    )


# LCG/mix constants shared by both engines (glibc LCG multiplier and
# Knuth's 2^32 golden-ratio constant); _LCG_M = 2^31 - 1 keeps every
# product under 2^62.
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2147483647
_MIX_B = 2654435761


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
    integer LCG perturbation, same id arithmetic. Emits a SELECT
    (caller wraps in a CTE)."""
    id2 = f"(s.{id_col} * {factor} + c.copy + {seed})"
    h = (
        f"(({id2} % {_LCG_M} * {_LCG_A} + {_LCG_C}) % {_LCG_M}"
        f" * {_LCG_A} + i * {_MIX_B}) % {_LCG_M}"
    )
    return f"""
SELECT s.{id_col} * {factor} + c.copy AS {id_col},
       list_transform(range(1, {dim + 1}),
         i -> s.{vec_col}[i]::DOUBLE
              + ({h} % 2001 - 1000) / 1000.0 * {noise}) AS {vec_col}
FROM {src} s CROSS JOIN range(0, {factor}) c(copy)"""
