"""Internal cluster-quality indexes: silhouette and Davies-Bouldin.

The reference's clustering stage ships with NO intrinsic quality
signal (its promised epsilon-evaluation notebooks are absent from the
snapshot — README.md:258-262, SURVEY §5); [[clustering_quality]]
covers the EXTERNAL (label-supervised) metrics, and this module adds
the two standard INTERNAL ones every clustering pipeline gates on
when no ground truth exists. Both use the SQUARED-distance variant
(documented; the monotone transform keeps every argmin/argmax
decision identical while keeping the whole computation in exact
integer arithmetic — no cross-row float sums, the engine's
determinism rule):

* simplified silhouette (centroid form): a²(i) = ‖x_i − c_own‖²,
  b²(i) = min over other clusters ‖x_i − c_l‖²,
  s(i) = (b² − a²)/max(a², b²)  (0 for singleton clusters and for
  the max = 0 degenerate, the sklearn conventions);
* Davies-Bouldin: R_ij = (σ²_i + σ²_j)/‖c_i − c_j‖², DB = mean_i
  max_{j≠i} R_ij with σ²_i the mean squared member-centroid
  distance. Coinciding distinct-cluster centroids make the textbook
  value +∞: the row reports NULL (degenerate-input discipline).

Determinism: vectors quantize ONCE half-up at 1e6 (the pca.py
discipline, double-cast before the scale so float32 inputs don't
promote differently across engines); centroids are exact half-away
integer divisions of int sums; every distance is an int64 sum of int
products ((2e6)²·64 ≈ 2.6e14 ≪ 2^63); the one float division per
point / per pair quantizes half-up at 1e6.

Scale shape: one (label, dim) groupBy for centroids (domain-bounded),
then per-point distances are a PURE PROJECTION — the k quantized
centroids ride in the plan as literal arrays (k·dim ints of bounded
driver state, the lloyd_kmeans / write_zordered precedent), so no
join fan-out and no per-point shuffle; one final label-keyed
aggregate. k is asserted ≤ 4096 to keep the plan literal-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exact import half_away_div, half_away_div_sql
from ..functions.vectors import quantize_fixed, quantize_fixed_sql

__all__ = ["silhouette_by_label", "davies_bouldin"]

XQ = 1_000_000  # vector quantization scale (pca.py discipline)
SQ = 1_000_000  # score quantization scale


def _xq(vec_col: str) -> Column:
    return quantize_fixed(vec_col, XQ)


def _xq_sql(vec_col: str) -> str:
    return quantize_fixed_sql(vec_col, XQ)


def _sqdist_lit(xq: Column, cent: list[int]) -> Column:
    lit = F.array(*[F.lit(int(v)).cast("long") for v in cent])
    return F.aggregate(
        F.zip_with(xq, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _centroids_q(
    df: DataFrame, label_col: str, vec_col: str
) -> list[tuple[int, list[int], int]]:
    """[(label, c_q[dim], n_members)] sorted by label — exact integer
    centroids via one (label, dim) groupBy; bounded driver state
    (k·dim ints). NULL labels (unassigned points, e.g. DBSCAN noise
    from an upstream left join) are EXCLUDED — a documented contract
    (r09 review: a None key would otherwise crash the label sort and
    the literal plan), mirrored by the SQL twins' IS NOT NULL."""
    cells = df.where(F.col(label_col).isNotNull()).select(
        F.col(label_col).cast("long").alias("_l"), _xq(vec_col).alias("_xq")
    ).select("_l", F.posexplode("_xq").alias("_d", "_x"))
    rows = (
        cells.groupBy("_l", "_d")
        .agg(
            F.sum(F.col("_x").cast("decimal(38,0)")).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "_l",
            "_d",
            half_away_div("CAST(_s AS BIGINT)", "_n").cast("long").alias(
                "_c"
            ),
            "_n",
        )
        .collect()
    )
    by_label: dict[int, dict[int, int]] = {}
    n_by_label: dict[int, int] = {}
    for r in rows:
        by_label.setdefault(r["_l"], {})[r["_d"]] = r["_c"]
        n_by_label[r["_l"]] = r["_n"]
    assert len(by_label) <= 4096, "label domain too large for literal plan"
    return [
        (lbl, [dims[d] for d in sorted(dims)], n_by_label[lbl])
        for lbl, dims in sorted(by_label.items())
    ]


def silhouette_by_label(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label mean simplified silhouette (squared-distance
    variant). Output: (label, n_members, mean_sil_q) ordered by
    label; mean_sil_q in [-1e6, 1e6]."""
    cents = _centroids_q(df, label_col, vec_col)
    if not cents:
        return df.sparkSession.createDataFrame(
            [], "label long, n_members long, mean_sil_q long"
        )
    base = df.where(F.col(label_col).isNotNull()).select(
        F.col(label_col).cast("long").alias("label"),
        _xq(vec_col).alias("_xq"),
    )
    # a2 / b2 / own_n in ONE projection: per centroid l, d_l is the
    # int fold against the literal array; own-ness routes it to a2
    # (coalesce of the single non-null branch) or into the b2 least
    # (F.least skips nulls, so the own branch drops out)
    a2_branches, b2_branches, n_branches = [], [], []
    for lbl, c, n in cents:
        d = _sqdist_lit(F.col("_xq"), c)
        is_own = F.col("label") == F.lit(int(lbl)).cast("long")
        a2_branches.append(F.when(is_own, d))
        b2_branches.append(
            F.when(~is_own, d).otherwise(F.lit(None).cast("long"))
        )
        n_branches.append(F.when(is_own, F.lit(int(n)).cast("long")))
    a2 = F.coalesce(*a2_branches) if len(a2_branches) > 1 else a2_branches[0]
    own_n = F.coalesce(*n_branches) if len(n_branches) > 1 else n_branches[0]
    b2 = (
        F.least(*b2_branches)
        if len(b2_branches) > 1
        else F.lit(None).cast("long")
    )
    pts = base.select(
        "label", a2.alias("a2"), b2.alias("b2"), own_n.alias("own_n")
    )
    s_q = (
        F.when(F.col("own_n") == 1, F.lit(0))  # sklearn singleton pin
        .when(F.col("b2").isNull(), F.lit(0))  # k = 1: no other cluster
        .when(F.greatest("a2", "b2") == 0, F.lit(0))  # == every centroid
        .otherwise(
            F.floor(
                (F.col("b2") - F.col("a2")).cast("double")
                / F.greatest("a2", "b2").cast("double")
                * F.lit(float(SQ))
                + F.lit(0.5)
            )
        )
        .cast("long")
    )
    return (
        pts.select("label", s_q.alias("s_q"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("s_q").cast("long").alias("_ssum"),
        )
        .select(
            "label",
            "n_members",
            half_away_div("_ssum", "n_members").cast("long").alias(
                "mean_sil_q"
            ),
        )
        .orderBy("label")
    )


def silhouette_by_label_sql(
    table: str,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of silhouette_by_label (cell-join formulation —
    the oracle replays the ARITHMETIC; the literal-centroid plan is
    a Spark physical choice invisible in the result)."""
    return f"""
WITH xq AS (
  SELECT {label_col}::BIGINT AS label, {id_col} AS id,
         {_xq_sql(vec_col)} AS v
  FROM {table} WHERE {label_col} IS NOT NULL
),
cells AS (
  SELECT label, id, generate_subscripts(v, 1) AS d, unnest(v) AS x
  FROM xq
),
cent AS (
  SELECT label AS clabel, d,
         {half_away_div_sql('sum(x)', 'count(*)')}::BIGINT AS c,
         count(DISTINCT id)::BIGINT AS cn
  FROM cells GROUP BY label, d
),
d2 AS (
  SELECT cells.label, cells.id, cent.clabel,
         sum((cells.x - cent.c) * (cells.x - cent.c))::BIGINT AS d2,
         any_value(cent.cn) AS cn
  FROM cells JOIN cent USING (d)
  GROUP BY cells.label, cells.id, cent.clabel
),
pts AS (
  SELECT label, id,
         max(CASE WHEN clabel = label THEN d2 END) AS a2,
         min(CASE WHEN clabel <> label THEN d2 END) AS b2,
         max(CASE WHEN clabel = label THEN cn END) AS own_n
  FROM d2 GROUP BY label, id
),
sq AS (
  SELECT label,
         CASE WHEN own_n = 1 THEN 0
              WHEN b2 IS NULL THEN 0
              WHEN greatest(a2, b2) = 0 THEN 0
              ELSE floor((b2 - a2)::DOUBLE / greatest(a2, b2)::DOUBLE
                         * {SQ}.0 + 0.5)::BIGINT
         END AS s_q
  FROM pts
)
SELECT label, count(*)::BIGINT AS n_members,
       {half_away_div_sql('sum(s_q)', 'count(*)')}::BIGINT AS mean_sil_q
FROM sq GROUP BY label ORDER BY label
"""


def davies_bouldin(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Davies-Bouldin index (squared-distance variant), one row:
    (n_clusters, db_q) with db_q = mean_i max_{j≠i} R_ij half-away
    at 1e6; NULL when any two distinct clusters share a centroid
    (textbook +∞) or when k < 2."""
    cents = _centroids_q(df, label_col, vec_col)
    spark = df.sparkSession
    if len(cents) < 2:
        return spark.createDataFrame(
            [(len(cents), None)], "n_clusters long, db_q long"
        )
    base = df.where(F.col(label_col).isNotNull()).select(
        F.col(label_col).cast("long").alias("label"),
        _xq(vec_col).alias("_xq"),
    )
    own_branches = []
    for lbl, c, _n in cents:
        d = _sqdist_lit(F.col("_xq"), c)
        own_branches.append(
            F.when(F.col("label") == F.lit(int(lbl)).cast("long"), d)
        )
    own = F.coalesce(*own_branches)
    sig = (
        base.select("label", own.alias("d2"))
        .groupBy("label")
        .agg(
            F.sum(F.col("d2").cast("decimal(38,0)")).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "label",
            half_away_div("CAST(_s AS BIGINT)", "_n").cast("long").alias(
                "sig2"
            ),
        )
    )
    # k² pair frame over the label domain — kilobytes at any corpus
    # scale; centroid distances from the collected exact ints
    cd = [
        (int(li), int(lj), sum((a - b) * (a - b) for a, b in zip(ci, cj)))
        for li, ci, _ in cents
        for lj, cj, _ in cents
        if li != lj
    ]
    pairs = spark.createDataFrame(cd, "label long, lj long, cd2 long")
    r = (
        pairs.join(F.broadcast(sig), "label")
        .join(
            F.broadcast(
                sig.select(
                    F.col("label").alias("lj"),
                    F.col("sig2").alias("sig2_j"),
                )
            ),
            "lj",
        )
        .select(
            "label",
            F.when(F.col("cd2") == 0, F.lit(None).cast("long"))
            .otherwise(
                F.floor(
                    (F.col("sig2") + F.col("sig2_j")).cast("double")
                    / F.col("cd2").cast("double")
                    * F.lit(float(SQ))
                    + F.lit(0.5)
                )
            )
            .cast("long")
            .alias("r_q"),
            (F.col("cd2") == 0).cast("long").alias("bad"),
        )
    )
    per_i = r.groupBy("label").agg(
        F.max("r_q").alias("rmax"), F.sum("bad").alias("nbad")
    )
    return per_i.agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.when(F.sum("nbad") == 0, half_away_div("sum(rmax)", "count(*)"))
        .cast("long")
        .alias("db_q"),
    )


def davies_bouldin_sql(
    table: str,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of davies_bouldin."""
    return f"""
WITH xq AS (
  SELECT {label_col}::BIGINT AS label, {id_col} AS id,
         {_xq_sql(vec_col)} AS v
  FROM {table} WHERE {label_col} IS NOT NULL
),
cells AS (
  SELECT label, id, generate_subscripts(v, 1) AS d, unnest(v) AS x
  FROM xq
),
cent AS (
  SELECT label, d,
         {half_away_div_sql('sum(x)', 'count(*)')}::BIGINT AS c
  FROM cells GROUP BY label, d
),
own AS (
  SELECT cells.label, cells.id,
         sum((cells.x - cent.c) * (cells.x - cent.c))::BIGINT AS d2
  FROM cells JOIN cent ON cells.d = cent.d AND cells.label = cent.label
  GROUP BY cells.label, cells.id
),
sig AS (
  SELECT label,
         {half_away_div_sql('sum(d2)', 'count(*)')}::BIGINT AS sig2
  FROM own GROUP BY label
),
cd AS (
  SELECT a.label AS li, b.label AS lj,
         sum((a.c - b.c) * (a.c - b.c))::BIGINT AS cd2
  FROM cent a JOIN cent b ON a.d = b.d AND a.label <> b.label
  GROUP BY a.label, b.label
),
r AS (
  SELECT cd.li AS label,
         CASE WHEN cd.cd2 = 0 THEN NULL
              ELSE floor((si.sig2 + sj.sig2)::DOUBLE / cd.cd2::DOUBLE
                         * {SQ}.0 + 0.5)::BIGINT
         END AS r_q,
         CASE WHEN cd.cd2 = 0 THEN 1 ELSE 0 END AS bad
  FROM cd
  JOIN sig si ON si.label = cd.li
  JOIN sig sj ON sj.label = cd.lj
),
per_i AS (
  SELECT label, max(r_q) AS rmax, sum(bad) AS nbad FROM r GROUP BY label
)
SELECT (SELECT count(*) FROM sig)::BIGINT AS n_clusters,
       CASE WHEN count(*) > 0 AND sum(nbad) = 0
            THEN {half_away_div_sql('sum(rmax)', 'count(*)')}::BIGINT
       END AS db_q
FROM per_i
"""
