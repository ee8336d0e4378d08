"""Clustering (the flagship family): ε-graph, LSH scale path, serving, e2e.

Split out of the former plans/catalog.py monolith (r08 verdict item
6) — function bodies unchanged; plans.catalog re-exports every name,
so the driver contract, tests and tools are untouched."""

from __future__ import annotations

from pyspark.sql import functions as F
from ..functions import hashing as H
from ..functions import vectors as V
from ..operators import cluster as C
from .catalog_shared import (  # noqa: F401
    load,
)

# ---------------------------------------------------------------------
# Clustering (the flagship)
# ---------------------------------------------------------------------

CLUSTER_EPS = 0.8  # synthetic vectors are near-orthogonal; see tests


def q_cluster_assign(spark, sf):
    emb = load(spark, sf, "embeddings")
    return C.cluster_batch(
        emb, id_col="vec_id", vec_col="embedding", eps=CLUSTER_EPS,
        strategy="cross",
    )


def oracle_cluster_assign(eps: float = CLUSTER_EPS) -> str:
    dist = V.cosine_distance_sql("a.embedding", "b.embedding")
    return f"""
WITH RECURSIVE edges AS MATERIALIZED (
  SELECT a.vec_id AS src, b.vec_id AS dst
  FROM embeddings a JOIN embeddings b
    ON a.vec_id <> b.vec_id AND {dist} <= {eps}
),
reach AS (
  SELECT vec_id AS id, vec_id AS comp FROM embeddings
  UNION
  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
SELECT c.id AS vec_id, c.component AS cluster_rep, (cnt.n >= 2) AS is_cluster
FROM comp c
JOIN (SELECT component, count(*) AS n FROM comp GROUP BY component) cnt
  USING (component)
"""


def _lsh_inflated_edges(spark, sf, eps, checkpoint_edges):
    """Shared kernel of the cluster_lsh pair: deterministic 25x
    inflation + sign-LSH candidate generation + exact-cosine verify.
    Returns (inflated, edges).

    nbits=18 over the auto default: this corpus's true pairs sit
    well inside eps (family dist ~0.05 « 0.10), so extra selectivity
    costs ~4% sampled recall (0.74 vs 0.79 measured at 50k) while
    cutting the candidate join ~3x in wall time.
    n_rows (metadata-only count * inflate factor) engages the
    broadcast vector-attach inside lsh_candidate_pairs: 50k x 64
    doubles = 25 MB, under the 64 MiB gate.

    r11: ``edges`` is the CANONICAL HALF (both_directions=False) —
    every unordered pair exactly once, bucket-canonical orientation.
    The mirrored union's branches are unshared lineage, so both
    consumers were executing the candidate join + verify kernel
    TWICE; they now derive the both-directions aggregates from the
    half (count x 2, same max) instead."""
    from ..testing import inflate_vectors

    emb = load(spark, sf, "embeddings")
    # repartition the BASE rows (1 parquet file = 1 partition), not
    # the inflated output: the kernel then runs on every core and the
    # exchange moves base-size bytes instead of factor x that
    # (guide §2.3 / §8 — decide placement on small rows; r11 A/B:
    # 1.49s -> 0.59s for the inflate+materialize leg). Row values are
    # identical — inflation is per-row deterministic.
    inflated = inflate_vectors(
        emb.repartition(spark.sparkContext.defaultParallelism), 25
    ).localCheckpoint(eager=True)
    edges = C.lsh_candidate_pairs(
        inflated, inflated, eps, id_col="vec_id", vec_col="embedding",
        nbits=18, dim=64, n_rows=emb.count() * 25, symmetric=True,
        both_directions=False,
    )
    if checkpoint_edges:
        # the verify variant fans edges out to three consumers
        # (n_edges agg, max-dist agg, recall semi-join); cut once
        edges = edges.localCheckpoint(eager=True)
    return inflated, edges


def q_cluster_lsh(spark, sf):
    """PRODUCTION sign-LSH ε-pair path (r08 verdict item 4 split the
    former fused query): inflate 25x past LSH_THRESHOLD, bucket
    equi-join on hyperplane signs with multiprobe, exact-cosine verify
    of candidates — candidates + verify ONLY, the plan a pipeline
    would actually run. The recall-floor and zero-false-positive
    certificates (a brute-forced ~2% sample plus in-plan
    F.assert_true legs — pure verification overhead at production
    time) now live in q_cluster_lsh_verify, which keeps the
    bench/soak role so the headline number stays honest. Oracle
    replays inflate → bucket → probe → exact-verify in DuckDB and
    compares (n_nodes, n_edges, max_edge_dist)."""
    eps = 0.10
    inflated, edges = _lsh_inflated_edges(
        spark, sf, eps, checkpoint_edges=False
    )
    # edges is the canonical half: each unordered pair once, so the
    # both-directions count is exactly 2x and the max is unchanged
    return inflated.agg(F.count("*").alias("n_nodes")).crossJoin(
        edges.agg(
            (F.count("*") * 2).alias("n_edges"),
            F.round(F.max("dist"), 6).alias("max_edge_dist"),
        )
    )


def q_cluster_lsh_verify(spark, sf):
    """Certificate variant of q_cluster_lsh (same kernel via
    _lsh_inflated_edges): adds the two contracts asserted in-plan —
    (1) zero false positives: the max edge distance must be <= eps
    (structural: candidates are exact-verified); (2) recall >= 0.5
    against a brute-forced ~2% sample of the corpus. Fully oracled
    (oracle_cluster_lsh_verify): md5-derived inflation noise,
    md5-Rademacher hyperplanes, fold-dot buckets, multiprobe,
    exact-verify and the sampled-recall aggregate all replay in
    DuckDB. This is the soak/bench variant; production runs
    q_cluster_lsh."""
    eps = 0.10
    inflated, edges = _lsh_inflated_edges(
        spark, sf, eps, checkpoint_edges=True
    )
    sample = inflated.where(
        H.hash64(F.col("vec_id").cast("string")) % 50 == 0
    )
    # checkpoint: exact feeds both the recall semi-join and the
    # n_sample_pairs aggregate — without the cut the O(sample^2)
    # verification kernel runs once per consumer
    exact = C.brute_force_pairs(
        sample, sample, eps, id_col="vec_id", vec_col="embedding",
        upper_only=True, with_dist=False,
    ).localCheckpoint(eager=True)
    # edges is the canonical half in BUCKET orientation — sort the
    # ids for the id-canonical semi-join the recall leg expects
    lsh_pairs = edges.select(
        F.least("l_id", "r_id").alias("l_id"),
        F.greatest("l_id", "r_id").alias("r_id"),
    )
    hits = exact.join(lsh_pairs, ["l_id", "r_id"], "left_semi").agg(
        F.count("*").alias("_n_hits")
    )
    return (
        inflated.agg(F.count("*").alias("n_nodes"))
        .crossJoin(
            edges.agg(
                (F.count("*") * 2).alias("n_edges"),
                F.round(F.max("dist"), 6).alias("max_edge_dist"),
            )
        )
        .crossJoin(exact.agg(F.count("*").alias("n_sample_pairs")))
        .crossJoin(hits)
        .select(
            "n_nodes",
            "n_edges",
            "n_sample_pairs",
            F.round(
                F.when(F.col("n_sample_pairs") > 0,
                       F.col("_n_hits") / F.col("n_sample_pairs"))
                .otherwise(F.lit(1.0)),
                6,
            ).alias("recall_vs_exact_sample"),
            "max_edge_dist",
        )
        .withColumn(
            "no_false_positives",
            F.assert_true(
                F.col("max_edge_dist") <= F.lit(eps + 1e-9),
                F.concat(F.lit("LSH edge beyond eps: "),
                         F.col("max_edge_dist").cast("string")),
            ).isNull(),
        )
        .withColumn(
            "recall_floor_ok",
            F.assert_true(
                F.col("recall_vs_exact_sample") >= F.lit(0.5),
                F.concat(F.lit("LSH recall below floor 0.5: "),
                         F.col("recall_vs_exact_sample").cast("string")),
            ).isNull(),
        )
    )


def _oracle_lsh_ctes(eps: float, nbits: int, factor: int) -> str:
    """Shared WITH-prefix of the cluster_lsh oracles: md5 inflation,
    sign-LSH buckets over md5-Rademacher planes, multiprobe candidate
    join, exact-cosine edge verification. MATERIALIZED CTEs pin each
    stage to one evaluation."""
    from ..operators.similarity import probe_masks
    from ..testing import inflate_vectors_sql

    signs = V.rademacher_signs(64, nbits, seed=42)
    masks = ", ".join(str(m) for m in probe_masks(nbits, 2))
    cosd = V.cosine_distance_sql("li.embedding", "ri.embedding")
    inf = inflate_vectors_sql("embeddings", factor, dim=64)
    return f"""
WITH inf AS MATERIALIZED ({inf}),
{V.sign_bucket_cte_sql("inf", signs, "b")},
cand AS (
  SELECT DISTINCT l.vec_id AS l_id, r.vec_id AS r_id
  FROM b l CROSS JOIN (SELECT unnest([{masks}]) AS m) mm
  JOIN b r ON r.b = xor(l.b, mm.m)
  WHERE l.vec_id <> r.vec_id
),
edges AS MATERIALIZED (
  SELECT l_id, r_id, dist FROM (
    SELECT c.l_id, c.r_id, {cosd} AS dist
    FROM cand c JOIN inf li ON li.vec_id = c.l_id
                JOIN inf ri ON ri.vec_id = c.r_id)
  WHERE dist <= {eps}
)"""


def oracle_cluster_lsh(
    eps: float = 0.10, nbits: int = 18, factor: int = 25
) -> str:
    """Production-path oracle: the shared inflate/bucket/probe/verify
    CTEs, aggregated to (n_nodes, n_edges, max_edge_dist) — no
    sampled-recall leg (that is q_cluster_lsh_verify's contract)."""
    return f"""{_oracle_lsh_ctes(eps, nbits, factor)}
SELECT (SELECT count(*) FROM inf) AS n_nodes,
       (SELECT count(*) FROM edges) AS n_edges,
       (SELECT round(max(dist), 6) FROM edges) AS max_edge_dist
"""


def oracle_cluster_lsh_verify(
    eps: float = 0.10, nbits: int = 18, factor: int = 25
) -> str:
    """DuckDB replay of the entire cluster_lsh_verify path: the shared
    inflate/bucket/probe/verify CTEs plus the brute-forced ~2% sample
    and the sampled-recall aggregate."""
    cosd_s = V.cosine_distance_sql("s1.embedding", "s2.embedding")
    samp_pred = H.hash64_sql("vec_id::VARCHAR") + " % 50 = 0"
    return f"""{_oracle_lsh_ctes(eps, nbits, factor)},
samp AS MATERIALIZED (
  SELECT vec_id, embedding FROM inf WHERE {samp_pred}
),
exact AS MATERIALIZED (
  SELECT s1.vec_id AS l_id, s2.vec_id AS r_id
  FROM samp s1 JOIN samp s2 ON s1.vec_id < s2.vec_id
  WHERE {cosd_s} <= {eps}
),
agg AS (
  SELECT (SELECT count(*) FROM inf) AS n_nodes,
         (SELECT count(*) FROM edges) AS n_edges,
         (SELECT count(*) FROM exact) AS n_sample_pairs,
         (SELECT count(*) FROM exact x WHERE EXISTS (
            SELECT 1 FROM edges e2
            WHERE e2.l_id = x.l_id AND e2.r_id = x.r_id)) AS n_hits,
         (SELECT round(max(dist), 6) FROM edges) AS max_edge_dist
)
SELECT n_nodes, n_edges, n_sample_pairs,
       round(CASE WHEN n_sample_pairs > 0
                  THEN n_hits::DOUBLE / n_sample_pairs
                  ELSE 1.0 END, 6) AS recall_vs_exact_sample,
       max_edge_dist,
       true AS no_false_positives, true AS recall_floor_ok
FROM agg
"""


# --- IVF ε-pair index (r09 verdict item 1) ---------------------------

_IVF_EPS = 0.10
_IVF_FACTOR = 10
_IVF_SAMPLE_MOD = 64
_IVF_NPROBE = 8
_IVF_CPROBE = 8
_CK_MOD = 2305843009213693952  # 2^61, the standing checksum modulus


def _ivf_inflated_edges(spark, sf, checkpoint_edges: bool):
    """Shared kernel of the cluster_ivf pair: deterministic 10x
    inflation + IVF margin-capped multiprobe + exact-cosine verify
    (operators/cluster.ivf_epsilon_pairs)."""
    from ..testing import inflate_vectors

    emb = load(spark, sf, "embeddings")
    # base-side repartition before the inflate kernel — see
    # _lsh_inflated_edges (r11, guide §2.3/§8)
    inflated = inflate_vectors(
        emb.repartition(spark.sparkContext.defaultParallelism),
        _IVF_FACTOR,
    ).localCheckpoint(eager=True)
    edges = C.ivf_epsilon_pairs(
        inflated, _IVF_EPS, id_col="vec_id", vec_col="embedding",
        sample_mod=_IVF_SAMPLE_MOD, nprobe=_IVF_NPROBE,
        cprobe=_IVF_CPROBE,
        # canonical pairs only: both consumers filter l<r anyway, and
        # the mirrored union would run the verify kernel twice
        both_directions=False,
    )
    if checkpoint_edges:
        edges = edges.localCheckpoint(eager=True)
    return inflated, edges


def _edge_checksums():
    """Value-level certification of the whole edge SET in O(1) output
    columns: a content hash over canonical pair ids and the sum of
    1e-6-quantized distances, both mod 2^61 in DECIMAL(38,0)/HUGEINT.
    Any missing, extra, or misvalued edge flips at least one."""
    pk = H.hash64(
        F.concat(
            F.col("l_id").cast("string"),
            F.lit("|"),
            F.col("r_id").cast("string"),
        )
    )
    return [
        (
            F.sum(pk.cast("decimal(38,0)"))
            % F.lit(_CK_MOD).cast("decimal(38,0)")
        ).cast("long").alias("pair_ck"),
        (
            F.sum(
                F.floor(F.col("dist") * 1e6 + F.lit(0.5)).cast(
                    "decimal(38,0)"
                )
            )
            % F.lit(_CK_MOD).cast("decimal(38,0)")
        ).cast("long").alias("dist_ck"),
    ]


def q_cluster_ivf(spark, sf):
    """PRODUCTION IVF ε-pair path (r09 verdict item 1 — the
    scale-stable index past sign-LSH's L=8 recall ceiling): inflate
    10x, route every vector to its margin-capped top-8 IVF cells by
    quantized-integer distance to a hash-stride data-point codebook,
    verify within-cell candidates with the exact fold cosine. The
    oracle replays inflate → quantize → route → candidate → verify
    move for move in DuckDB (integer routing has zero float
    ambiguity; verify is the engine-pinned fold), and the output
    certifies the full edge SET value-level via 2^61 checksums —
    n_edges, max dist, a pair-identity hash and the quantized-dist
    sum must all match."""
    inflated, edges = _ivf_inflated_edges(spark, sf, checkpoint_edges=False)
    canon = edges.where(F.col("l_id") < F.col("r_id"))
    return inflated.agg(F.count("*").alias("n_nodes")).crossJoin(
        canon.agg(
            F.count("*").alias("n_edges"),
            F.round(F.max("dist"), 6).alias("max_edge_dist"),
            *_edge_checksums(),
        )
    )


def q_cluster_ivf_verify(spark, sf):
    """Certificate variant of q_cluster_ivf (same kernel): adds the
    two in-plan contracts — zero false positives (max edge dist <=
    eps, structural: every candidate is exact-verified) and recall
    >= 0.7 against a brute-forced ~5% sample (the r09 verdict's
    boundary-recall bar; measured ~0.997 at 50k). Fully oracled:
    the sampled-recall leg replays in DuckDB too."""
    inflated, edges = _ivf_inflated_edges(spark, sf, checkpoint_edges=True)
    sample = inflated.where(
        H.hash64(F.col("vec_id").cast("string")) % 20 == 0
    )
    exact = C.brute_force_pairs(
        sample, sample, _IVF_EPS, id_col="vec_id", vec_col="embedding",
        upper_only=True, with_dist=False,
    ).localCheckpoint(eager=True)
    ivf_pairs = edges.where(F.col("l_id") < F.col("r_id")).select(
        "l_id", "r_id"
    )
    hits = exact.join(ivf_pairs, ["l_id", "r_id"], "left_semi").agg(
        F.count("*").alias("_n_hits")
    )
    return (
        inflated.agg(F.count("*").alias("n_nodes"))
        .crossJoin(
            edges.where(F.col("l_id") < F.col("r_id")).agg(
                F.count("*").alias("n_edges"),
                F.round(F.max("dist"), 6).alias("max_edge_dist"),
            )
        )
        .crossJoin(exact.agg(F.count("*").alias("n_sample_pairs")))
        .crossJoin(hits)
        .select(
            "n_nodes",
            "n_edges",
            "n_sample_pairs",
            F.round(
                F.when(F.col("n_sample_pairs") > 0,
                       F.col("_n_hits") / F.col("n_sample_pairs"))
                .otherwise(F.lit(1.0)),
                6,
            ).alias("recall_vs_exact_sample"),
            "max_edge_dist",
        )
        .withColumn(
            "no_false_positives",
            F.assert_true(
                F.col("max_edge_dist") <= F.lit(_IVF_EPS + 1e-9),
                F.concat(F.lit("IVF edge beyond eps: "),
                         F.col("max_edge_dist").cast("string")),
            ).isNull(),
        )
        .withColumn(
            "recall_floor_ok",
            F.assert_true(
                F.col("recall_vs_exact_sample") >= F.lit(0.7),
                F.concat(F.lit("IVF recall below floor 0.7: "),
                         F.col("recall_vs_exact_sample").cast("string")),
            ).isNull(),
        )
    )


def _oracle_ivf_ctes(cent_pred: str = "") -> str:
    """Shared WITH-prefix of the cluster_ivf oracles: md5 inflation,
    integer quantization, codebook stride, TWO-LEVEL exact-integer
    routing (coarse = every isqrt(k)-th codebook row; fine ranking
    over the top-cprobe groups' cells only — mirrors
    operators/cluster.ivf_epsilon_pairs move for move) with (d2, id)
    rank at both levels + margin cap, candidate join, exact
    fold-cosine verification. Routing distances use DOUBLE[64]
    array_inner_product — exact for the < 2^53 integer-valued
    components in ANY summation order, so the SIMD fast path IS the
    bit-exact replay; floor(sqrt(k)) equals Python math.isqrt(k) for
    k < 2^52 because IEEE sqrt is correctly rounded."""
    from ..operators.cluster import IVF_QUANT
    import math

    inf = inflate_vectors_sql_cached("embeddings", _IVF_FACTOR)
    mq = repr((math.sqrt(2.0 * _IVF_EPS) + 1e-6) * IVF_QUANT)
    cosd = V.cosine_distance_sql("li.embedding", "ri.embedding")
    stride = H.hash64_sql("vec_id::VARCHAR") + f" % {_IVF_SAMPLE_MOD} = 0"
    lim = f"(sqrt(greatest(dh, 0.0)) + {mq}) * (sqrt(greatest(dh, 0.0)) + {mq})"
    return f"""
WITH inf AS MATERIALIZED ({inf}),
q AS MATERIALIZED (
  SELECT vec_id, embedding, vq, array_inner_product(vq, vq) AS nq
  FROM (SELECT vec_id, embedding,
               list_transform(embedding,
                   e -> floor(e::DOUBLE * {IVF_QUANT}.0 + 0.5)
               )::DOUBLE[64] AS vq
        FROM inf)
),
cent AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         vq AS cq, nq AS nc
  FROM q WHERE {stride}{cent_pred}
),
parms AS MATERIALIZED (
  SELECT greatest(1, CAST(floor(sqrt(count(*)::DOUBLE)) AS BIGINT))
         AS cstride
  FROM cent
),
coarse AS MATERIALIZED (
  SELECT cell // p.cstride AS g, cq AS gq, nc AS ng
  FROM cent, parms p WHERE cell % p.cstride = 0
),
cellgrp AS MATERIALIZED (
  SELECT cell, g FROM (
    SELECT c.cell, co.g,
           row_number() OVER (PARTITION BY c.cell
               ORDER BY c.nc - 2 * array_inner_product(c.cq, co.gq)
                        + co.ng, co.g) AS rn
    FROM cent c CROSS JOIN coarse co)
  WHERE rn = 1
),
routedg AS MATERIALIZED (
  SELECT vec_id, g FROM (
    SELECT q.vec_id, co.g,
           row_number() OVER (PARTITION BY q.vec_id
               ORDER BY q.nq - 2 * array_inner_product(q.vq, co.gq)
                        + co.ng, co.g) AS rn
    FROM q CROSS JOIN coarse co)
  WHERE rn <= {_IVF_CPROBE}
),
routed AS MATERIALIZED (
  SELECT vec_id, cell, (rn = 1) AS is_home FROM (
    SELECT vec_id, cell, d2,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, cell) AS rn,
           min(d2) OVER (PARTITION BY vec_id) AS dh
    FROM (SELECT q.vec_id, ce.cell,
                 q.nq - 2 * array_inner_product(q.vq, ce.cq)
                 + ce.nc AS d2
          FROM q
          JOIN routedg rg ON rg.vec_id = q.vec_id
          JOIN cellgrp cg ON cg.g = rg.g
          JOIN cent ce ON ce.cell = cg.cell))
  WHERE rn <= {_IVF_NPROBE} AND d2 <= {lim}
),
cand AS (
  SELECT DISTINCT a.vec_id AS l_id, b.vec_id AS r_id
  FROM routed a JOIN routed b ON a.cell = b.cell
   AND a.vec_id < b.vec_id
  WHERE a.is_home OR b.is_home
),
edges AS MATERIALIZED (
  SELECT l_id, r_id, dist FROM (
    SELECT c.l_id, c.r_id, {cosd} AS dist
    FROM cand c JOIN inf li ON li.vec_id = c.l_id
                JOIN inf ri ON ri.vec_id = c.r_id)
  WHERE dist <= {_IVF_EPS}
)"""


def inflate_vectors_sql_cached(src: str, factor: int) -> str:
    from ..testing import inflate_vectors_sql

    return inflate_vectors_sql(src, factor, dim=64)


def q_cluster_ivf_index(spark, sf):
    """On-disk IVF ε-pair index lifecycle as ONE oracled query (r10
    verdict item 6): build the index over a 90% base (codebook =
    hash-stride over base only), APPEND the remaining 10% against the
    frozen codebook, then read the full pair set straight from the
    persisted fan-out — no routing at query time. The oracle is the
    cluster_ivf bit-replay with the codebook CTE restricted to base
    rows: append==rebuild holds because the appended rows route
    through the identical broadcast geometry
    (operators/eps_index.py; equivalence also pinned by
    tests/test_eps_index.py). Same 2^61 edge-set checksums."""
    import os

    from ..operators import eps_index as XI

    inflated, _ = _ivf_inflated_edges_input(spark, sf)
    split = H.hash64(F.col("vec_id").cast("string")) % 10 == 0
    base = inflated.where(~split)
    batch = inflated.where(split)
    tag = sf.strip("/").replace("/", "_")
    path = f"/tmp/spark_graft_eps_index/{tag}_{os.getpid()}"
    kw = dict(id_col="vec_id", vec_col="embedding")
    XI.write_eps_index(
        base, path, _IVF_EPS, sample_mod=_IVF_SAMPLE_MOD,
        nprobe=_IVF_NPROBE, cprobe=_IVF_CPROBE, n_buckets=64, **kw,
    )
    XI.append_eps_index(batch, path, **kw)
    edges = XI.eps_pairs_from_index(spark, path)
    return inflated.agg(F.count("*").alias("n_nodes")).crossJoin(
        edges.agg(
            F.count("*").alias("n_edges"),
            F.round(F.max("dist"), 6).alias("max_edge_dist"),
            *_edge_checksums(),
        )
    )


def _ivf_inflated_edges_input(spark, sf):
    """The cluster_ivf inflation (shared corpus, no edge compute)."""
    from ..testing import inflate_vectors

    emb = load(spark, sf, "embeddings")
    # base-side repartition before the inflate kernel — see
    # _lsh_inflated_edges (r11, guide §2.3/§8)
    inflated = inflate_vectors(
        emb.repartition(spark.sparkContext.defaultParallelism),
        _IVF_FACTOR,
    ).localCheckpoint(eager=True)
    return inflated, None


def oracle_cluster_ivf_index() -> str:
    pair_h = H.hash64_sql("l_id::VARCHAR || '|' || r_id::VARCHAR")
    base_pred = " AND " + H.hash64_sql("vec_id::VARCHAR") + " % 10 != 0"
    return f"""{_oracle_ivf_ctes(cent_pred=base_pred)}
SELECT (SELECT count(*) FROM inf) AS n_nodes,
       (SELECT count(*) FROM edges) AS n_edges,
       (SELECT round(max(dist), 6) FROM edges) AS max_edge_dist,
       (SELECT (sum(({pair_h})::HUGEINT) % {_CK_MOD})::BIGINT
        FROM edges) AS pair_ck,
       (SELECT (sum(floor(dist * 1e6 + 0.5)::HUGEINT)
                % {_CK_MOD})::BIGINT FROM edges) AS dist_ck
"""


def oracle_cluster_ivf() -> str:
    pair_h = H.hash64_sql("l_id::VARCHAR || '|' || r_id::VARCHAR")
    return f"""{_oracle_ivf_ctes()}
SELECT (SELECT count(*) FROM inf) AS n_nodes,
       (SELECT count(*) FROM edges) AS n_edges,
       (SELECT round(max(dist), 6) FROM edges) AS max_edge_dist,
       (SELECT (sum(({pair_h})::HUGEINT) % {_CK_MOD})::BIGINT
        FROM edges) AS pair_ck,
       (SELECT (sum(floor(dist * 1e6 + 0.5)::HUGEINT)
                % {_CK_MOD})::BIGINT FROM edges) AS dist_ck
"""


def oracle_cluster_ivf_verify() -> str:
    cosd_s = V.cosine_distance_sql("s1.embedding", "s2.embedding")
    samp_pred = H.hash64_sql("vec_id::VARCHAR") + " % 20 = 0"
    return f"""{_oracle_ivf_ctes()},
samp AS MATERIALIZED (
  SELECT vec_id, embedding FROM inf WHERE {samp_pred}
),
exact AS MATERIALIZED (
  SELECT s1.vec_id AS l_id, s2.vec_id AS r_id
  FROM samp s1 JOIN samp s2 ON s1.vec_id < s2.vec_id
  WHERE {cosd_s} <= {_IVF_EPS}
),
agg AS (
  SELECT (SELECT count(*) FROM inf) AS n_nodes,
         (SELECT count(*) FROM edges) AS n_edges,
         (SELECT count(*) FROM exact) AS n_sample_pairs,
         (SELECT count(*) FROM exact x WHERE EXISTS (
            SELECT 1 FROM edges e2
            WHERE e2.l_id = x.l_id AND e2.r_id = x.r_id)) AS n_hits,
         (SELECT round(max(dist), 6) FROM edges) AS max_edge_dist
)
SELECT n_nodes, n_edges, n_sample_pairs,
       round(CASE WHEN n_sample_pairs > 0
                  THEN n_hits::DOUBLE / n_sample_pairs
                  ELSE 1.0 END, 6) AS recall_vs_exact_sample,
       max_edge_dist,
       true AS no_false_positives, true AS recall_floor_ok
FROM agg
"""


_COMPACT_EPS = 0.56  # yields a mix of merges and singletons (see below)


def q_pool_compaction(spark, sf):
    """Pool-maintenance compaction (operators/cluster.compact_pool,
    r11 — the fix for the 500k-soak pool-drift finding) as an oracled
    query. A deterministic pool is built from the embeddings table
    (every vec_id its own row; every third row pre-marked is_cluster
    with two articles, the rest singletons with one) and compacted at
    eps=0.56 (pairwise distances on this corpus start ~0.52, so the
    sweep produces real merges AND surviving singletons). The output
    certifies the full relational merge surface value-level:
    representative selection (lowest row_id), row_id-ordered article
    concatenation (order-sensitive art_ck hash), per-rep absorbed
    counts and a 2^61 checksum over absorbed cluster_ids (the remap
    set), and untouched singleton rows. The float centroid leg is
    deliberately excluded (pytest-pinned in test_compact_pool; Spark
    avg and DuckDB avg fold in different orders)."""
    from ..operators.cluster import compact_pool

    emb = load(spark, sf, "embeddings")
    vid = F.col("vec_id").cast("string")
    pool = emb.select(
        F.col("vec_id").cast("long").alias("row_id"),
        F.concat(F.lit("c-"), vid).alias("cluster_id"),
        F.when(
            F.col("vec_id") % 3 == 0,
            F.array(
                F.concat(F.lit("a"), vid), F.concat(F.lit("b"), vid)
            ),
        )
        .otherwise(F.array(F.concat(F.lit("a"), vid)))
        .alias("article_ids"),
        (F.col("vec_id") % 3 == 0).alias("is_cluster"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    )
    res = compact_pool(pool, eps=_COMPACT_EPS, strategy="cross")
    remag = res["remaps"].groupBy("new_pk").agg(
        F.count("*").cast("long").alias("_n_abs"),
        (
            F.sum(H.hash64(F.col("old_pk")).cast("decimal(38,0)"))
            % F.lit(_CK_MOD).cast("decimal(38,0)")
        ).cast("long").alias("_abs_ck"),
    )
    state = res["state"]
    return (
        state.join(remag, state.cluster_id == remag.new_pk, "left")
        .select(
            "row_id",
            "cluster_id",
            F.size("article_ids").cast("long").alias("n_articles"),
            H.hash64(F.concat_ws("|", F.col("article_ids"))).alias(
                "art_ck"
            ),
            "is_cluster",
            F.coalesce(F.col("_n_abs"), F.lit(0).cast("long")).alias(
                "n_absorbed"
            ),
            F.coalesce(F.col("_abs_ck"), F.lit(0).cast("long")).alias(
                "absorbed_ck"
            ),
        )
    )


def oracle_pool_compaction() -> str:
    dist = V.cosine_distance_sql("a.centroid", "b.centroid")
    h_art = H.hash64_sql("array_to_string(article_ids, '|')")
    h_art_m = H.hash64_sql("array_to_string(m.all_articles, '|')")
    h_pk = H.hash64_sql("cluster_id")
    return f"""
WITH RECURSIVE pool AS MATERIALIZED (
  SELECT vec_id::BIGINT AS row_id,
         'c-' || vec_id::VARCHAR AS cluster_id,
         CASE WHEN vec_id % 3 = 0
              THEN ['a' || vec_id::VARCHAR, 'b' || vec_id::VARCHAR]
              ELSE ['a' || vec_id::VARCHAR] END AS article_ids,
         (vec_id % 3 = 0) AS is_cluster,
         list_transform(embedding, x -> x::DOUBLE) AS centroid
  FROM embeddings
),
edges AS MATERIALIZED (
  SELECT a.row_id AS src, b.row_id AS dst
  FROM pool a JOIN pool b ON a.row_id <> b.row_id
  WHERE {dist} <= {_COMPACT_EPS}
),
reach AS (
  SELECT row_id AS id, row_id AS comp FROM pool
  UNION
  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id),
lab AS MATERIALIZED (
  SELECT p.*, c.component,
         count(*) OVER (PARTITION BY c.component) AS n,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY p.row_id) AS rk
  FROM pool p JOIN comp c ON c.id = p.row_id
),
merged AS (
  SELECT component, min(row_id) AS row_id,
         flatten(list(article_ids ORDER BY row_id)) AS all_articles
  FROM lab WHERE n >= 2 GROUP BY component
),
absorbed AS (
  SELECT component, count(*)::BIGINT AS n_absorbed,
         (sum(({h_pk})::HUGEINT)
          % {_CK_MOD})::BIGINT AS absorbed_ck
  FROM lab WHERE n >= 2 AND rk > 1 GROUP BY component
)
SELECT m.row_id, 'c-' || m.row_id::VARCHAR AS cluster_id,
       len(m.all_articles)::BIGINT AS n_articles,
       {h_art_m} AS art_ck,
       true AS is_cluster,
       a.n_absorbed, a.absorbed_ck
FROM merged m JOIN absorbed a USING (component)
UNION ALL
SELECT row_id, cluster_id, len(article_ids)::BIGINT AS n_articles,
       {h_art} AS art_ck, is_cluster,
       0::BIGINT AS n_absorbed, 0::BIGINT AS absorbed_ck
FROM lab WHERE n < 2
"""


def q_clustering_quality(spark, sf):
    """External cluster-evaluation metrics over the ε-graph assignment
    vs the ground-truth label column — the eval capability the
    reference's missing `test/` folder promised (README.md:258-262).
    Entirely aggregation-shaped (contingency groupBy + marginals);
    oracle recomputes clustering AND metrics in SQL."""
    from ..operators.evaluation import clustering_quality

    emb = load(spark, sf, "embeddings")
    # tighter eps than CLUSTER_EPS: the synthetic vectors' pairwise
    # distances start ~0.52, so 0.56 yields a mix of clusters and
    # singletons — non-degenerate metrics (0.8 merges everything)
    assigned = C.cluster_batch(
        emb, id_col="vec_id", vec_col="embedding", eps=0.56,
        strategy="cross",
    )
    joined = assigned.join(
        emb.select("vec_id", "label"), "vec_id"
    )
    return clustering_quality(joined, pred_col="cluster_rep", truth_col="label")


def q_clustering_eps_sweep(spark, sf):
    """Quality-vs-eps sweep: the reference's offline epsilon
    comparison (summarization notebook cell 3 compares cluster files
    at eps=0.05/0.10/0.15) as one query — one (homogeneity,
    completeness, v_measure) row per eps. The grid is calibrated to
    this corpus: synthetic pairwise distances start ~0.62, so the
    notebook's absolute values would be all-singleton degenerate rows;
    {0.56, 0.60, 0.64} spans none→some→more merging, which is the
    sweep's point. Each arm is an independent ε-graph clustering +
    contingency aggregation; the union is a plan-level UNION ALL so
    the three arms run as parallel stages, not sequentially."""
    from functools import reduce

    from ..operators.evaluation import clustering_quality

    emb = load(spark, sf, "embeddings")
    arms = []
    for eps in EPS_SWEEP_GRID:
        assigned = C.cluster_batch(
            emb, id_col="vec_id", vec_col="embedding", eps=eps,
            strategy="cross",
        )
        joined = assigned.join(emb.select("vec_id", "label"), "vec_id")
        arms.append(
            clustering_quality(
                joined, pred_col="cluster_rep", truth_col="label"
            ).select(
                F.lit(eps).alias("eps"),
                "n",
                "homogeneity",
                "completeness",
                "v_measure",
            )
        )
    return reduce(lambda a, b: a.unionByName(b), arms)


EPS_SWEEP_GRID = (0.56, 0.60, 0.64)


def oracle_clustering_eps_sweep() -> str:
    arms = [
        f"SELECT CAST({eps} AS DOUBLE) AS eps, * FROM "
        f"({_oracle_quality_block(eps)})"
        for eps in EPS_SWEEP_GRID
    ]
    return "\nUNION ALL\n".join(arms)


def oracle_clustering_quality() -> str:
    return _oracle_quality_block(0.56)


def _oracle_quality_block(eps: float) -> str:
    assign = oracle_cluster_assign(eps=eps).strip().rstrip(";")
    return f"""
WITH assigned AS ({assign}),
joined AS (
  SELECT a.cluster_rep AS _k, e.label AS _c
  FROM assigned a JOIN embeddings e USING (vec_id)
),
cont AS (SELECT _k, _c, count(*) AS n_ck FROM joined GROUP BY _k, _c),
tot AS (SELECT sum(n_ck)::DOUBLE AS n FROM cont),
km AS (SELECT _k, sum(n_ck) AS n_k FROM cont GROUP BY _k),
cm AS (SELECT _c, sum(n_ck) AS n_c FROM cont GROUP BY _c),
cond AS (
  SELECT -sum((n_ck / n) * ln(n_ck / n_k)) AS h_c_given_k,
         -sum((n_ck / n) * ln(n_ck / n_c)) AS h_k_given_c
  FROM cont JOIN km USING (_k) JOIN cm USING (_c), tot
),
ents AS (
  SELECT (SELECT -sum((n_c / n) * ln(n_c / n)) FROM cm, tot) AS h_c,
         (SELECT -sum((n_k / n) * ln(n_k / n)) FROM km, tot) AS h_k
),
hv AS (
  SELECT CASE WHEN h_c = 0 THEN 1.0 ELSE 1.0 - h_c_given_k / h_c END AS h,
         CASE WHEN h_k = 0 THEN 1.0 ELSE 1.0 - h_k_given_c / h_k END AS c
  FROM cond, ents
)
SELECT (SELECT n::BIGINT FROM tot) AS n,
       round(h, 6) AS homogeneity,
       round(c, 6) AS completeness,
       round(CASE WHEN h + c = 0 THEN 0.0 ELSE 2 * h * c / (h + c) END, 6)
         AS v_measure
FROM hv
"""


def q_cluster_serving(spark, sf):
    """Serving view over the clustering: cluster sizes > 2, top-10 by
    size (UI query shape, P10/A6/A7/O2)."""
    assigned = q_cluster_assign(spark, sf)
    return (
        assigned.where("is_cluster")
        .groupBy("cluster_rep")
        .agg(F.count("*").alias("n_members"))
        .where("n_members > 2")
        .orderBy(F.desc("n_members"), F.asc("cluster_rep"))
        .limit(10)
    )


def oracle_cluster_serving() -> str:
    return f"""
WITH assigned AS ({oracle_cluster_assign()})
SELECT cluster_rep, count(*) AS n_members
FROM assigned WHERE is_cluster
GROUP BY cluster_rep
HAVING count(*) > 2
ORDER BY n_members DESC, cluster_rep ASC
LIMIT 10
"""


def q_pool_metrics(spark, sf):
    """A5 (process_records.py:313-316, 428-434): pool telemetry over
    the clustering assignment — cluster count, singleton count, total
    tracked stories."""
    assigned = q_cluster_assign(spark, sf)
    return assigned.agg(
        F.count_distinct(
            F.when(F.col("is_cluster"), F.col("cluster_rep"))
        ).alias("n_clusters"),
        F.sum(F.when(~F.col("is_cluster"), 1).otherwise(0)).alias(
            "n_singletons"
        ),
        F.count("*").alias("total_members"),
    )


def oracle_pool_metrics() -> str:
    return f"""
WITH assigned AS ({oracle_cluster_assign()})
SELECT count(DISTINCT CASE WHEN is_cluster THEN cluster_rep END)
         AS n_clusters,
       sum(CASE WHEN NOT is_cluster THEN 1 ELSE 0 END)::BIGINT
         AS n_singletons,
       count(*) AS total_members
FROM assigned
"""


def q_incremental_cluster(spark, sf):
    """ST2/M3 stateful path in the gate: two micro-batches through
    incremental_cluster_update (centroid collapse, representative =
    lowest pool position, absorbed singletons purged). The DuckDB
    oracle replays the identical batch sequence in SQL — arrival-order
    row ids, per-batch fresh-edge ε-graph closure (recursive CTE),
    centroid means, rep/absorbed/kept-cluster bookkeeping — so this
    stateful path is hash-gated, not rows-only. Semantics are also
    golden-tested in tests/test_cluster.py."""
    from ..schemas import CLUSTER_STATE_SCHEMA

    emb = load(spark, sf, "embeddings").select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
        (F.col("vec_id") % 2).alias("_half"),
    )
    state = spark.createDataFrame([], CLUSTER_STATE_SCHEMA)
    # eps=0.56 (not CLUSTER_EPS): non-degenerate pool — a mix of
    # multi-member clusters and singletons exercises the rep/absorbed/
    # kept-cluster paths, and the sparse ε-graph keeps the oracle's
    # recursive closure tractable (0.8 merges all 500 rows into one
    # dense component).
    for half in (0, 1):
        res = C.incremental_cluster_update(
            state,
            emb.where(F.col("_half") == half).drop("_half"),
            eps=0.56,
            strategy="cross",
        )
        state = res["state"].localCheckpoint(eager=True)
    return (
        state.groupBy("is_cluster")
        .agg(
            F.count("*").alias("n_pool_rows"),
            F.sum(F.size("article_ids")).alias("n_articles"),
        )
        .orderBy("is_cluster")
    )


def oracle_incremental_cluster(eps: float = 0.56) -> str:
    """SQL replay of q_incremental_cluster's two-batch run of
    incremental_cluster_update (cluster.py:450-597): batch row ids are
    assigned in arrival (string) order after the surviving pool's max
    row id; fresh edges are new×pool only; components close over the
    whole pool; the lowest-row_id member represents a multi component,
    absorbed singletons are purged into it (article lists ordered by
    row_id), already-cluster non-reps persist unchanged, and the rep's
    centroid is the element-wise mean of member pool-row vectors —
    which is what batch 2's distance tests run against."""
    # distances test normalized-then-dotted vectors — the same shape as
    # the Spark kernel (brute_force_pairs normalizes rows, then
    # matmuls). Native list_dot_product instead of the index-ordered
    # dot_sql lambda: these distances only GATE edges (they are never
    # emitted), the nearest pair sits ~0.04 from the 0.56 threshold,
    # and the native kernel is ~5x faster on the two n_batch x n_pool
    # joins that dominate this oracle.
    d_ab = "greatest(0.0, least(1.0, 1.0 - list_dot_product(a.nv, b.nv)))"
    d_ap = "greatest(0.0, least(1.0, 1.0 - list_dot_product(a.nv, p.nv)))"
    return f"""
WITH RECURSIVE
emb0 AS (
  SELECT vec_id::VARCHAR AS id,
         list_transform(embedding, x -> x::DOUBLE) AS v,
         vec_id % 2 AS half
  FROM embeddings
),
emb1 AS (
  SELECT id, v, half, {V.norm_sql("v")} AS nrm FROM emb0
),
emb AS MATERIALIZED (
  SELECT id, v, half, list_transform(v, x -> x / nrm) AS nv FROM emb1
),
b1 AS MATERIALIZED (
  SELECT id, v, nv, row_number() OVER (ORDER BY id) AS row_id
  FROM emb WHERE half = 0
),
e1 AS MATERIALIZED (
  SELECT a.row_id AS src, b.row_id AS dst
  FROM b1 a JOIN b1 b ON a.row_id <> b.row_id AND {d_ab} <= {eps}
),
r1 AS (
  SELECT row_id AS id, row_id AS comp FROM b1
  UNION
  SELECT e.dst AS id, r.comp FROM r1 r JOIN e1 e ON e.src = r.id
),
c1 AS MATERIALIZED (SELECT id AS row_id, min(comp) AS component FROM r1 GROUP BY id),
s1 AS MATERIALIZED (SELECT component, count(*) AS n FROM c1 GROUP BY component),
m1 AS MATERIALIZED (
  SELECT c1.row_id, c1.component, b1.id, b1.v
  FROM c1 JOIN b1 USING (row_id) JOIN s1 USING (component)
  WHERE s1.n >= 2
),
cent1 AS MATERIALIZED (
  SELECT component, list(avg_val ORDER BY pos) AS centroid
  FROM (
    SELECT component, pos, avg(val) AS avg_val
    FROM (
      SELECT component,
             unnest(v) AS val,
             unnest(range(1, len(v) + 1)) AS pos
      FROM m1
    )
    GROUP BY component, pos
  )
  GROUP BY component
),
rep1 AS MATERIALIZED (
  SELECT component, min(row_id) AS row_id,
         list(id ORDER BY row_id) AS article_ids
  FROM m1 GROUP BY component
),
cent1n AS MATERIALIZED (
  SELECT component, centroid,
         list_transform(centroid, x -> x / {V.norm_sql("centroid")})
           AS ncentroid
  FROM cent1
),
pool1 AS MATERIALIZED (
  SELECT rep1.row_id, rep1.article_ids, TRUE AS is_cluster,
         cent1n.ncentroid AS nv
  FROM rep1 JOIN cent1n USING (component)
  UNION ALL
  SELECT c1.row_id, [b1.id] AS article_ids, FALSE AS is_cluster, b1.nv
  FROM c1 JOIN b1 USING (row_id) JOIN s1 USING (component)
  WHERE s1.n < 2
),
b2 AS MATERIALIZED (
  SELECT id, nv,
         row_number() OVER (ORDER BY id)
           + (SELECT coalesce(max(row_id), 0) FROM pool1) AS row_id
  FROM emb WHERE half = 1
),
pool2 AS MATERIALIZED (
  SELECT row_id, article_ids, is_cluster, nv FROM pool1
  UNION ALL
  SELECT row_id, [id] AS article_ids, FALSE AS is_cluster, nv FROM b2
),
e2 AS MATERIALIZED (
  SELECT a.row_id AS src, p.row_id AS dst
  FROM b2 a JOIN pool2 p ON a.row_id <> p.row_id AND {d_ap} <= {eps}
),
e2s AS MATERIALIZED (SELECT src, dst FROM e2 UNION SELECT dst AS src, src AS dst FROM e2),
r2 AS (
  SELECT row_id AS id, row_id AS comp FROM pool2
  UNION
  SELECT e.dst AS id, r.comp FROM r2 r JOIN e2s e ON e.src = r.id
),
c2 AS MATERIALIZED (SELECT id AS row_id, min(comp) AS component FROM r2 GROUP BY id),
s2 AS MATERIALIZED (SELECT component, count(*) AS n FROM c2 GROUP BY component),
lab2 AS MATERIALIZED (
  SELECT c2.row_id, c2.component, s2.n, p.article_ids, p.is_cluster,
         row_number() OVER (
           PARTITION BY c2.component ORDER BY c2.row_id) AS rk
  FROM c2 JOIN pool2 p USING (row_id) JOIN s2 USING (component)
),
final AS (
  SELECT is_cluster, len(article_ids)::BIGINT AS n_arts
  FROM lab2 WHERE n < 2
  UNION ALL
  SELECT TRUE AS is_cluster, len(article_ids)::BIGINT AS n_arts
  FROM lab2 WHERE n >= 2 AND rk > 1 AND is_cluster
  UNION ALL
  SELECT TRUE AS is_cluster,
         sum(CASE WHEN rk = 1 OR NOT is_cluster
                  THEN len(article_ids) ELSE 0 END)::BIGINT AS n_arts
  FROM lab2 WHERE n >= 2
  GROUP BY component
)
SELECT is_cluster,
       count(*)::BIGINT AS n_pool_rows,
       sum(n_arts)::BIGINT AS n_articles
FROM final
GROUP BY is_cluster
ORDER BY is_cluster
"""


def q_pipeline_e2e(spark, sf):
    """Full document pipeline (preprocess -> deterministic embed ->
    cluster -> cluster sizes). The hashing-trick embedder is
    md5-derived, so the ENTIRE pipeline replays in SQL: the oracle
    rebuilds embed_text, tokens, signed bucket histograms, the
    float32 wire quantization (::REAL::DOUBLE — IEEE-identical to the
    UDF's astype(float32)), unit vectors, the ε=0.2 edge set, and the
    recursive-CTE closure. Per-row embedding semantics are also
    golden-tested in tests/."""
    from ..operators.embed import embed_articles, unwrap_embedding
    from ..operators.preprocess import with_embed_text

    docs = (
        load(spark, sf, "documents")
        .select(
            F.col("doc_id").cast("string").alias("id"),
            F.col("source").alias("title"),
            F.col("text").alias("summary"),
            "text",
        )
        # small parquet arrives as 1 partition; fan out so the embed
        # UDF runs on all cores
        .repartition(spark.sparkContext.defaultParallelism)
    )
    emb = embed_articles(with_embed_text(docs)).withColumn(
        "vec", unwrap_embedding("concat_embedding")
    )
    assigned = C.cluster_batch(
        emb, id_col="id", vec_col="vec", eps=0.2, strategy="auto"
    )
    return (
        assigned.groupBy("is_cluster")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("is_cluster")
    )




DBSCAN_EPS = 0.65
DBSCAN_MIN_SAMPLES = 4


def q_dbscan_full(spark, sf):
    """General-min_samples DBSCAN (operators/cluster.dbscan, r08):
    the reference runs DBSCAN(min_samples=2), where every ε-connected
    point is core and cluster_batch's component labeling is exact;
    this query exercises the FULL algorithm — core points by
    neighbor degree, clusters as components of the core-core
    subgraph, border points attached to their minimum-labeled core
    neighbor (a deterministic pick where the textbook algorithm is
    scan-order-dependent), noise left unlabeled. The oracle replays
    the whole path with a recursive-CTE closure over core-core
    edges."""
    emb = load(spark, sf, "embeddings")
    return C.dbscan(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        eps=DBSCAN_EPS,
        min_samples=DBSCAN_MIN_SAMPLES,
        strategy="cross",
    ).orderBy("vec_id")


def oracle_dbscan_full() -> str:
    dist = V.cosine_distance_sql("a.embedding", "b.embedding")
    k = DBSCAN_MIN_SAMPLES
    return f"""
WITH RECURSIVE pairs AS MATERIALIZED (
  SELECT a.vec_id AS src, b.vec_id AS dst
  FROM embeddings a JOIN embeddings b
    ON a.vec_id <> b.vec_id AND {dist} <= {DBSCAN_EPS}
),
deg AS (SELECT src AS id, count(*) AS d FROM pairs GROUP BY 1),
core AS MATERIALIZED (
  SELECT id FROM deg WHERE d >= {k} - 1
),
cedges AS MATERIALIZED (
  SELECT p.src, p.dst FROM pairs p
  JOIN core a ON p.src = a.id JOIN core b ON p.dst = b.id
),
reach AS (
  SELECT id, id AS comp FROM core
  UNION
  SELECT e.dst AS id, r.comp FROM reach r JOIN cedges e ON e.src = r.id
),
comp AS (SELECT id, min(comp) AS cluster FROM reach GROUP BY id),
border AS (
  SELECT p.src AS id, min(c.cluster) AS bcluster
  FROM pairs p JOIN comp c ON p.dst = c.id
  WHERE p.src NOT IN (SELECT id FROM core)
  GROUP BY 1
)
SELECT v.vec_id,
       CASE WHEN comp.id IS NOT NULL THEN 'core'
            WHEN border.id IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       coalesce(comp.cluster, border.bcluster) AS cluster
FROM embeddings v
LEFT JOIN comp ON v.vec_id = comp.id
LEFT JOIN border ON v.vec_id = border.id
ORDER BY v.vec_id
"""
