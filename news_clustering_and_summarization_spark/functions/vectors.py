"""Embedding-vector column math (SURVEY §2.3 J4, §2.8 M1).

Pure Column expressions so Catalyst keeps them in whole-stage codegen;
all arithmetic in float64 index order so a DuckDB oracle using
parallel-unnest sums (or list_* functions) matches bit-for-bit after
rounding. The reference computes cosine distance on L2-normalized
vectors in fp16 (clustering.py:53-85); we deliberately use float64 and
document the difference (SURVEY §7.4 risk 6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Index-ordered float64 dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def l2_normalize(a: Column) -> Column:
    n = norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_distance(a: Column, b: Column) -> Column:
    """1 - cosine similarity, clipped to [0, 1] like the reference
    (clustering.py:83-85)."""
    d = F.lit(1.0) - cosine_similarity(a, b)
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), d))


def centroid_of(vec_list: Column) -> Column:
    """Element-wise mean of an array-of-vectors column (A2,
    process_records.py:396-400)."""
    n = F.size(vec_list)
    summed = F.aggregate(
        vec_list,
        F.transform(F.element_at(vec_list, 1), lambda x: F.lit(0.0)),
        lambda acc, v: F.zip_with(acc, v, lambda x, y: x + y.cast("double")),
    )
    return F.transform(summed, lambda x: x / n)


# --- DuckDB oracle fragments -----------------------------------------


def dot_sql(a: str, b: str) -> str:
    """Index-ordered sum via list_reduce over positions — deterministic
    summation order matching Spark's aggregate()."""
    return (
        "list_reduce(list_prepend(0.0::DOUBLE, "
        "list_transform(range(1, len({a}) + 1), "
        "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), (acc, v) -> acc + v)"
    ).format(a=a, b=b)


def norm_sql(a: str) -> str:
    return (
        "sqrt(list_reduce(list_prepend(0.0::DOUBLE, "
        "list_transform({a}, x -> x::DOUBLE * x::DOUBLE)), "
        "(acc, v) -> acc + v))"
    ).format(a=a)


def cosine_distance_sql(a: str, b: str) -> str:
    return "greatest(0.0, least(1.0, 1.0 - {dot} / ({na} * {nb})))".format(
        dot=dot_sql(a, b), na=norm_sql(a), nb=norm_sql(b)
    )


# --- embedding compression (engine extension) ------------------------
# Johnson-Lindenstrauss random projection + int8 quantization: the two
# standard levers for cutting 100 TB of embeddings down before ANN /
# storage. Both are pure zero-shuffle projections; both are exactly
# reproducible cross-engine (the sign matrix is generated driver-side
# from md5 and embedded as LITERALS in whichever engine runs it, and
# every float expression is an order-pinned chain).


def rademacher_signs(dim: int, k: int, seed: int = 42) -> list[list[float]]:
    """k rows of dim +/-1.0 signs, deterministic in (dim, k, seed):
    sign_ij = +1 iff the first hex digit of md5(f"{seed}|{j}|{i}") is
    even. No RNG state — any process regenerates the same matrix."""
    import hashlib

    return [
        [
            1.0
            if int(
                hashlib.md5(f"{seed}|{j}|{i}".encode()).hexdigest()[0], 16
            )
            % 2
            == 0
            else -1.0
            for i in range(dim)
        ]
        for j in range(k)
    ]


def project_jl(vec: Column, signs: list[list[float]]) -> Column:
    """Project to len(signs) dims: out_j = dot(vec, signs_j) / sqrt(k).
    Rademacher JL: preserves pairwise distances within (1 +/- eps) for
    k = O(log n / eps^2) — e.g. 64 -> 16 keeps cosine neighborhoods
    while cutting ANN FLOPs and storage 4x."""
    import math

    inv = 1.0 / math.sqrt(len(signs))
    return F.array(
        *[
            (
                dot(vec, F.array(*[F.lit(s) for s in row])) * F.lit(inv)
            )
            for row in signs
        ]
    )


SIGN_QUANT = 1_000_000_000  # 1e-9 vector quantization for LSH dots


def sign_bucket(vec: Column, signs: list[list[float]]) -> Column:
    """Sign-LSH bucket id from Rademacher hyperplanes: bit j is set
    iff sum_i(signs_ij * round(v_i * 1e9)) > 0. Quantizing each
    coordinate to an integer once makes every dot an INTEGER sum —
    order-free and exact — so the DuckDB oracle can compute the same
    buckets with a vectorized join+SUM instead of per-row float folds
    (and a numpy matmul path would agree too, were one used). The
    1e-9 quantization is far below any embedding's noise floor; the
    LSH guarantee is untouched. JVM Column expression, O(nbits*dim)
    per row, embarrassingly parallel at any corpus size."""
    w = F.transform(
        vec,
        lambda x: F.round(x.cast("double") * F.lit(float(SIGN_QUANT)))
        .cast("long"),
    )
    out = F.lit(0).cast("long")
    for j, row in enumerate(signs):
        s = F.array(*[F.lit(int(x)).cast("long") for x in row])
        d = F.aggregate(
            F.zip_with(w, s, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        out = out + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast(
            "long"
        )
    return out


def sign_bucket_cte_sql(
    src: str,
    signs: list[list[float]],
    out_cte: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB replay of sign_bucket as a vectorized CTE chain ending
    in ``{out_cte}(id_col, b)``: unnest coordinates once, join the
    sign matrix as a VALUES table, integer SUM per (row, plane) —
    millions of rows/second instead of the pathological per-row
    lambda-fold projection. Exact because the quantized dot is an
    integer sum (order-free in both engines)."""
    dim = len(signs[0])
    rows = ", ".join(
        f"({j}, {i + 1}, {int(s)})"
        for j, row in enumerate(signs)
        for i, s in enumerate(row)
    )
    return f"""{out_cte}_wv AS (
  SELECT s.{id_col}, r.i,
         CAST(round(s.{vec_col}[r.i]::DOUBLE * {SIGN_QUANT}.0) AS BIGINT)
           AS w
  FROM {src} s CROSS JOIN range(1, {dim + 1}) r(i)
),
{out_cte}_sgn (j, i, sg) AS (VALUES {rows}),
{out_cte}_dots AS (
  SELECT wv.{id_col}, sgn.j, sum(sgn.sg * wv.w) AS d
  FROM {out_cte}_wv wv JOIN {out_cte}_sgn sgn USING (i)
  GROUP BY wv.{id_col}, sgn.j
),
{out_cte} AS (
  SELECT {id_col},
         CAST(sum(CASE WHEN d > 0 THEN 1::BIGINT << j ELSE 0 END)
              AS BIGINT) AS b
  FROM {out_cte}_dots GROUP BY {id_col}
)"""


def cosine_similarity_sql(a: str, b: str) -> str:
    """Raw cosine similarity (unclipped) matching cosine_similarity's
    fold order exactly."""
    return "({dot} / ({na} * {nb}))".format(
        dot=dot_sql(a, b), na=norm_sql(a), nb=norm_sql(b)
    )


def project_jl_sql(expr: str, signs: list[list[float]]) -> str:
    import math

    inv = 1.0 / math.sqrt(len(signs))
    outs = []
    for row in signs:
        arr = "[" + ", ".join(str(s) for s in row) + "]"
        outs.append(f"({dot_sql(expr, arr)} * {inv!r})")
    return "[" + ", ".join(outs) + "]"


def quantize_int8(vec: Column) -> tuple[Column, Column]:
    """(scale, q): symmetric int8 quantization q_i = round_half_up(
    v_i / scale) with scale = max|v| / 127; all-zero vectors get
    scale 0 and q = 0. round-half-up is floor(x + 0.5) — exact IEEE,
    no banker's-rounding divergence between engines."""
    amax = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    q = F.when(
        amax == 0, F.transform(vec, lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            vec,
            lambda x: F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(x / scale + F.lit(0.5)).cast("int"),
                ),
            ),
        )
    )
    return scale, q


def quantize_int8_sql(expr: str) -> tuple[str, str]:
    amax = f"list_max(list_transform({expr}, x -> abs(x)))"
    scale = f"({amax} / 127.0)"
    q = (
        f"CASE WHEN {amax} = 0 THEN list_transform({expr}, x -> 0) "
        f"ELSE list_transform({expr}, x -> "
        f"greatest(-127, least(127, floor(x / {scale} + 0.5)::INT))) END"
    )
    return scale, q


def quantize_fixed(vec_col: str, scale: int) -> Column:
    """Element-wise half-up fixed-point quantizer: each component
    becomes floor(x·scale + 0.5) as BIGINT. The repo-standard vector
    quantizer (pca.py discipline, shared by cluster_metrics): CAST to
    DOUBLE happens BEFORE the scale — float32 inputs would otherwise
    multiply in float32, and the two engines' promotion chains
    differ; double math is identical text on both sides."""
    return F.expr(
        f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE)"
        f" * {scale}.0 + 0.5) AS BIGINT))"
    )


def quantize_fixed_sql(vec_col: str, scale: int) -> str:
    """DuckDB twin of quantize_fixed."""
    return (
        f"list_transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE)"
        f" * {scale}.0 + 0.5) AS BIGINT))"
    )
