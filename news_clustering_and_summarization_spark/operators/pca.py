"""Top-principal-component extraction by integer fixed-point power
iteration — the "All-but-the-top" embedding post-processing step
(Mu & Viswanath 2018: subtracting the mean and the dominant
principal directions makes embedding spaces isotropic and measurably
improves similarity tasks). The reference's embedding stage
(business_logic/embedding/) ships vectors straight to clustering;
this operator supplies the standard isotropy correction as a
distributed, replayable computation.

Why fixed point: the power iterate v_{t+1} = normalize(Xᵀ(X v_t))
is a cross-row float sum per dimension — exactly the unordered
aggregation the engine's determinism rules forbid. Instead every
quantity is an integer:

* embeddings quantized once, half-up, at 1e6 (bit-identical on
  both engines for identical input doubles);
* per-dimension mean subtracted in integer space (exact
  half-away division by N — proper centered PCA);
* per-row scores sᵢ = Σⱼ x̃_q[i,j]·v_q[j] are int64 sums of integer
  products — order-free by construction;
* the back-projection u = Σᵢ s''ᵢ·x̃_q[i,·] accumulates through
  DECIMAL(38,0) (exact in Spark; DuckDB's HUGEINT) so no row count
  can overflow the partials, then renormalizes by max|u| (power
  iteration admits ANY per-step rescaling — max is exact on
  integers, unlike an L2 norm whose sqrt would reintroduce a
  float), two half-away rescales keeping every product inside
  int64.

Per iteration: one broadcast of the 64-entry iterate, one row-local
score pass, one (dim) groupBy of 64 groups — the map-side-combined
exchange carries 64·partitions rows regardless of corpus size. The
final component is emitted at 1e9 scale with the sign convention
v[argmax|v|] > 0 (power iteration's sign is otherwise arbitrary).

Convergence contract: the operator performs EXACTLY ``iters`` power
steps — the error toward the true top component contracts by
(σ₂/σ₁)² per step, so the iterate is the converged PC only when the
spectrum has a gap (tests/test_pca.py plants one and shows cos >
0.999 in 3 steps). The synthetic embeddings testdata is deliberately
near-isotropic (σ₁/σ₂ ≈ 1.04), so the catalog query certifies the
replayable fixed-point ARITHMETIC, not a converged direction —
exactly like the kmeans_assign and pagerank oracles, which also pin
a fixed iteration count rather than a fixed point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact import half_away_div

__all__ = ["top_component", "top_component_sql"]

# embedding quantization scale (values are O(1) floats)
XQ = 1_000_000
# iterate scale
VQ = 1_000_000_000


def top_component(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    iters: int = 3,
) -> DataFrame:
    """Centered top principal component after ``iters`` power steps.

    Output: (dim, mu_q, v_q) — per-dimension integer mean (1e6) and
    component coordinate (1e9, sign-normalized)."""
    # quantize once: arithmetic half-up (identical on identical
    # input doubles; see memory note on round() tie divergence)
    # CAST to DOUBLE before the scale: float32 inputs would otherwise
    # multiply in float32 (both engines promote float*int to float),
    # and the two engines' promotion chains differ — double math is
    # identical text on both sides
    from ..functions.vectors import quantize_fixed

    xq = quantize_fixed(vec_col, XQ)
    base = df.select(F.col(id_col).alias("id"), xq.alias("xq"))
    cells = base.select(
        "id", F.posexplode("xq").alias("d", "x")
    )
    mu = (
        cells.groupBy("d")
        .agg(
            F.sum(F.col("x").cast("decimal(38,0)")).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "d",
            half_away_div("CAST(_s AS BIGINT)", "_n").cast("long").alias(
                "mu_q"
            ),
        )
    )
    cen = (
        cells.join(F.broadcast(mu), "d")
        .select("id", "d", (F.col("x") - F.col("mu_q")).alias("x"))
        .localCheckpoint(eager=True)  # consumed once per iteration
    )
    # v_0 = uniform unit vector: 1/sqrt(dim) — exact at 1e9 only for
    # power-of-4 dims; half-up otherwise (both engines replay it)
    import math

    v0 = int(math.floor(VQ / math.sqrt(dim) + 0.5))
    v = None  # DataFrame (d, vq)
    for _ in range(iters):
        if v is None:
            scored = cen.withColumn("vq", F.lit(v0).cast("long"))
        else:
            scored = cen.join(F.broadcast(v), "d")
        # s_i = sum_j x~_q * v_q  (x~·v at 1e15) -> rescale to 1e3
        s = (
            scored.groupBy("id")
            .agg(F.sum(F.col("x") * F.col("vq")).alias("_s"))
            .select(
                "id",
                half_away_div("_s", str(10**12)).cast("long").alias("s2"),
            )
        )
        u = (
            cen.join(s, "id")
            .groupBy("d")
            .agg(
                F.sum(
                    (F.col("s2") * F.col("x")).cast("decimal(38,0)")
                ).alias("_u")
            )
            .select("d", F.col("_u").cast("long").alias("u"))
        )
        # two-step renormalize: compress to <=1e9, then scale by max
        u2 = u.select(
            "d", half_away_div("u", str(10**4)).cast("long").alias("u2")
        )
        m = u2.agg(F.max(F.abs(F.col("u2"))).alias("m"))
        v = (
            u2.crossJoin(F.broadcast(m))
            .select(
                "d",
                half_away_div(f"u2 * {VQ}", "m").cast("long").alias("vq"),
            )
            .localCheckpoint(eager=True)  # tiny; cuts per-iter lineage
        )
    # sign convention: coordinate with max |v| is positive
    pivot = v.orderBy(F.abs(F.col("vq")).desc(), "d").limit(1).select(
        F.when(F.col("vq") >= 0, F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("sgn")
    )
    return (
        v.crossJoin(F.broadcast(pivot))
        .join(F.broadcast(mu), "d")
        .select(
            F.col("d").alias("dim"),
            "mu_q",
            (F.col("vq") * F.col("sgn")).cast("long").alias("v_q"),
        )
        .orderBy("dim")
    )


def top_component_sql(
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    iters: int = 3,
) -> str:
    """DuckDB twin of top_component (iterations unrolled as CTEs)."""
    import math

    from ..functions.exact import half_away_div_sql

    had = half_away_div_sql
    v0 = int(math.floor(VQ / math.sqrt(dim) + 0.5))
    from ..functions.vectors import quantize_fixed_sql

    qv = quantize_fixed_sql(vec_col, XQ)
    ctes = [
        f"""cells AS (
  SELECT {id_col} AS id, unnest(range(0, {dim})) AS d,
         unnest({qv}) AS x
  FROM {table}
)""",
        f"""mu AS (
  SELECT d, {had('CAST(sum(x) AS BIGINT)', 'count(*)')}::BIGINT AS mu_q
  FROM cells GROUP BY d
)""",
        """cen AS MATERIALIZED (
  SELECT id, cells.d, x - mu_q AS x FROM cells JOIN mu USING (d)
)""",
    ]
    prev_v = None
    for t in range(1, iters + 1):
        vq = f"{v0}::BIGINT" if prev_v is None else "vq"
        src = (
            "cen"
            if prev_v is None
            else f"cen JOIN {prev_v} USING (d)"
        )
        ctes.append(
            f"""s{t} AS (
  SELECT id, {had('CAST(sum(x * ' + vq + ') AS BIGINT)', str(10**12))}::BIGINT AS s2
  FROM {src} GROUP BY id
)"""
        )
        ctes.append(
            f"""u{t} AS (
  SELECT d, {had('CAST(sum(s2 * x) AS BIGINT)', str(10**4))}::BIGINT AS u2
  FROM cen JOIN s{t} USING (id) GROUP BY d
)"""
        )
        ctes.append(
            f"""v{t} AS (
  SELECT d, {had(f'u2 * {VQ}', 'm')}::BIGINT AS vq
  FROM u{t}, (SELECT max(abs(u2)) AS m FROM u{t}) mm
)"""
        )
        prev_v = f"v{t}"
    ctes.append(
        f"""sgn AS (
  SELECT CASE WHEN vq >= 0 THEN 1 ELSE -1 END AS sgn
  FROM {prev_v} ORDER BY abs(vq) DESC, d LIMIT 1
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT v.d AS dim, mu.mu_q, (v.vq * sgn.sgn)::BIGINT AS v_q
FROM {prev_v} v JOIN mu USING (d), sgn
ORDER BY dim
"""
    )


GRAM_QUANT = 10**6


def gram_matrix(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact Gram matrix G = EᵀE of an embedding column — the
    covariance-shaped primitive under PCA/whitening/isotropy audits
    (embedding_pca's power iteration consumes exactly this product
    implicitly; materializing G once beats re-streaming E per
    iteration when d is small).

    Scalable shape: posexplode each vector to (row, i, v), self-join
    ON THE ROW ID (d² fan-out per row, map-side combinable), one
    groupBy (i, j) — the output is d² cells regardless of N. Upper
    triangle only (G is symmetric).

    Determinism: elements are quantized to integers ONCE
    (arithmetic half-up floor(v·1e6 + 0.5) — engine round()
    rounding modes differ, the repo-standard quantizer does not);
    cell sums are then exact integer sums in
    DECIMAL(38,0)/HUGEINT (q² ≈ 1e12 per term — int64 dies at ~9e6
    rows, decimal never). g = g_q / 1e12 recovers the float value.

    Output: (i, j, g_q) for 0 <= i <= j < d."""
    q = F.floor(
        F.col("v").cast("double") * F.lit(float(GRAM_QUANT))
        + F.lit(0.5)
    ).cast("long")
    cells = emb.select(
        F.col(id_col).alias("rid"),
        F.posexplode(F.col(vec_col)).alias("i", "v"),
    ).select("rid", "i", q.alias("vq"))
    a = cells.select("rid", F.col("i").alias("ia"), F.col("vq").alias("va"))
    b = cells.select("rid", F.col("i").alias("ib"), F.col("vq").alias("vb"))
    return (
        a.join(b, "rid")
        .where(F.col("ia") <= F.col("ib"))
        .groupBy(F.col("ia").alias("i"), F.col("ib").alias("j"))
        .agg(
            F.sum(
                F.col("va").cast("decimal(19,0)")
                * F.col("vb").cast("decimal(19,0)")
            )
            .cast("decimal(38,0)")
            .cast("string")
            .alias("g_q")
        )
        .orderBy("i", "j")
    )


def gram_matrix_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of gram_matrix (HUGEINT sums rendered as strings
    — the driver's pandas canonicalizer cannot hash HUGEINT)."""
    return f"""
WITH cells AS MATERIALIZED (
  SELECT {id_col} AS rid,
         generate_subscripts({vec_col}, 1) - 1 AS i,
         floor(unnest({vec_col})::DOUBLE * {float(GRAM_QUANT)!r}
               + 0.5)::BIGINT AS vq
  FROM {table}
)
SELECT a.i AS i, b.i AS j,
       CAST(sum(a.vq::HUGEINT * b.vq::HUGEINT) AS VARCHAR) AS g_q
FROM cells a JOIN cells b ON a.rid = b.rid AND a.i <= b.i
GROUP BY 1, 2
ORDER BY i, j
"""
