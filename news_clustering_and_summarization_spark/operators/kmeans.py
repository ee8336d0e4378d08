"""Distributed Lloyd's k-means in pure DataFrame operations.

The reference's clustering is ε-graph DBSCAN (process_records.py:
301-308); k-means is the complementary partitional algorithm every
training-data pipeline keeps next to it (topic bucketing for mixture
balancing, IVF coarse quantizers, embedding-space telemetry). MLlib
has an RDD-based implementation; this one is deliberately
DataFrame-native so Catalyst sees the whole loop body:

* **Assignment is a projection, not a join.** The k current centroids
  are injected as literal arrays into a single `select` — distance to
  each centroid is an index-ordered `aggregate(zip_with(...))` fold
  (JVM codegen, no UDF, no shuffle), and argmin is `array_min` over
  `(dist, cluster)` structs (lexicographic struct order gives the
  deterministic low-cluster tiebreak).
* **Update is one k-row shuffle.** Per-cluster per-dimension means are
  a single `groupBy(cluster)` with `dim` avg aggregates — partial
  aggregation combines map-side, so the exchange carries k rows per
  partition, never data rows.
* **The driver holds only k×dim floats** (the same scalar-fold pattern
  as tables.write_zordered's min/max collect) — at 1B rows the loop
  costs n_iter scans and nothing else.

Determinism contract (what makes the SQL oracle replayable):
init = the first k vectors by id; every distance is an index-ordered
float fold (bit-identical across engines); centroid components are
rounded to 9 decimals at each iteration boundary, collapsing the
engines' unordered-sum ulp drift before it can flip an argmin.
Empty clusters drop out (both engines: the groupBy simply produces no
row for them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "assign_to_centroids",
    "lloyd_centroids",
    "lloyd_kmeans",
    "probe_cells",
]

# Driver-local Lloyd gate (r12): beneath this many n*dim double cells
# (~32 MB) the iteration loop runs on ONE collected matrix instead of
# n_iter collect-jobs — the same small-input escape hatch
# connected_components takes (LOCAL_CC_EDGES). At bench scale each
# distributed iteration is a fixed-cost job (~0.5s) over k-bounded
# data; at real scale the distributed path engages unchanged.
LOCAL_KMEANS_CELLS = 4_000_000


def _sqdist_matrix(X, cmat, np):
    """(n, k) squared-distance matrix via the SAME index-ordered fold
    as the documented kernel: acc = acc + (x_j - c_j)^2 sequentially
    over dims, vectorized over rows — identical IEEE doubles in the
    distributed UDF and the driver-local loop (shared by both)."""
    acc = np.zeros((len(X), len(cmat)), dtype=np.float64)
    for j in range(cmat.shape[1]):
        d = X[:, j][:, None] - cmat[None, :, j]
        acc = acc + d * d
    return acc


def _round_half_up_9(x: float) -> float:
    """Replicate Spark's round(double, 9): BigDecimal.valueOf uses the
    SHORTEST decimal representation (Double.toString == Python repr),
    then HALF_UP at scale 9, then back to double."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(x))).quantize(
            Decimal("1E-9"), rounding=ROUND_HALF_UP
        )
    )


def probe_cells(
    df: DataFrame,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
    nprobe: int,
) -> DataFrame:
    """IVF query-side probe: explode each row into its ``nprobe``
    nearest centroids, ordered by (sqdist, cluster) — the struct sort
    gives exactly the tie-break the oracle's row_number replays. Pure
    projection + explode, no shuffle; centroid literals ride in the
    plan like assign_to_centroids."""
    vec = F.col(vec_col)
    arr = F.array_sort(
        F.array(
            *[
                F.struct(
                    _sqdist(vec, cent).alias("dist"),
                    F.lit(int(cid)).alias("cluster"),
                )
                for cid, cent in centroids
            ]
        )
    )
    return (
        df.withColumn("_pc", F.explode(F.slice(arr, 1, nprobe)))
        .withColumn("cluster", F.col("_pc.cluster"))
        .drop("_pc")
    )


def _sqdist(vec: Column, centroid: list[float]) -> Column:
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_to_centroids(
    df: DataFrame,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
) -> DataFrame:
    """Add ``(cluster, sqdist)`` for the nearest of ``centroids``
    (list of (cluster_id, vector)). Still a projection — no shuffle —
    but vectorized (r11, guide §4.2): the k interpreted
    aggregate/zip_with folds per row were the bulk of kmeans_assign /
    semdedup wall. The NumPy kernel replays the same index-ordered
    fold — acc = acc + (x_j - c_j)^2 sequentially over dims,
    vectorized over rows, identical IEEE doubles — and the
    (dist, cluster) lexicographic argmin is replicated by ranking
    centroids in ascending cluster-id order (np.argmin returns the
    FIRST minimum). ``df[vec_col]`` must be array<double> with no
    nulls (the lloyd_kmeans contract)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cents = sorted((int(cid), list(vec)) for cid, vec in centroids)
    cids = np.array([c for c, _ in cents], dtype=np.int64)
    cmat = np.array([v for _, v in cents], dtype=np.float64)

    # no type hints: `from __future__ import annotations` turns them
    # into strings the UDF inferrer cannot resolve for local imports —
    # pass the eval type explicitly instead
    from pyspark.sql.functions import PandasUDFType

    @pandas_udf(
        "struct<dist: double, cluster: int>", PandasUDFType.SCALAR
    )
    def nearest(vs):
        X = np.asarray(vs.tolist(), dtype=np.float64)
        acc = _sqdist_matrix(X, cmat, np)
        best = np.argmin(acc, axis=1)
        return pd.DataFrame(
            {
                "dist": acc[np.arange(len(X)), best],
                "cluster": cids[best].astype(np.int32),
            }
        )

    best = nearest(F.col(vec_col))
    return df.withColumn("cluster", best["cluster"]).withColumn(
        "sqdist", best["dist"]
    )


def lloyd_kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_iter: int,
    dim: int,
) -> DataFrame:
    """Run ``n_iter`` Lloyd iterations and return the final assignment
    ``(id_col, cluster, sqdist)`` against the last centroids.

    ``df[vec_col]`` must be array<double> (cast float embeddings
    first — float→double widening is exact)."""
    centroids = lloyd_centroids(df, id_col, vec_col, k, n_iter, dim)
    if not centroids:
        # empty corpus: empty result with the contract schema (an
        # F.array() of zero centroid structs would not even plan)
        id_type = dict(df.dtypes)[id_col]
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, cluster int, sqdist double"
        )
    return assign_to_centroids(df, vec_col, centroids).select(
        id_col, "cluster", F.round("sqdist", 6).alias("sqdist")
    )


def lloyd_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_iter: int,
    dim: int,
) -> list[tuple[int, list[float]]]:
    """The centroid half of lloyd_kmeans: ``n_iter`` Lloyd iterations
    from the first-k-by-id init, centroid means rounded to 9dp at each
    iteration boundary (the cross-engine determinism pin the DuckDB
    oracle replays). Returns [(cluster_id, centroid)] — k rows,
    driver-side by design (centroids are the broadcast side of every
    downstream assign). Empty corpus -> []."""
    if k < 1 or n_iter < 0:
        raise ValueError("k >= 1 and n_iter >= 0 required")
    vecs = df.select(id_col, vec_col)
    n = vecs.count()
    if n == 0:
        return []
    if n * max(dim, 1) <= LOCAL_KMEANS_CELLS:
        # r12 driver-local path: one id-ordered collect replaces the
        # init job + n_iter assignment/update collect-jobs. Arithmetic
        # is the SAME index-ordered fold (_sqdist_matrix — shared with
        # the distributed UDF), the same first-min/ascending-cid
        # argmin, and the same per-iteration round(mean, 9) pin
        # (_round_half_up_9 replicates Spark's HALF_UP exactly). The
        # only order that differs is the mean's summation order —
        # which the 9dp rounding contract already absorbs between
        # Spark's unordered partial aggregation and DuckDB (module
        # docstring); equality with the distributed path is pinned by
        # tests/test_kmeans_local.py.
        import numpy as np

        rows = vecs.orderBy(id_col).collect()
        X = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
        centroids = [
            (i, [float(x) for x in X[i]]) for i in range(min(k, n))
        ]
        for _ in range(n_iter):
            cids = np.array([c for c, _ in centroids], dtype=np.int64)
            cmat = np.array([v for _, v in centroids], dtype=np.float64)
            best = np.argmin(_sqdist_matrix(X, cmat, np), axis=1)
            by: dict[int, list[float]] = {}
            for pos in np.unique(best):
                members = X[best == pos]
                mean = members.sum(axis=0) / len(members)
                by[int(cids[pos])] = [
                    _round_half_up_9(v) for v in mean
                ]
            centroids = sorted(by.items())
        return [(c, list(v)) for c, v in centroids]
    init = (
        vecs
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if not init:
        return []
    centroids = [(i, list(r[vec_col])) for i, r in enumerate(init)]
    for _ in range(n_iter):
        assigned = assign_to_centroids(df, vec_col, centroids)
        # r11 (guide §1.2): the update was one 64-wide
        # avg(element_at) aggregate — wide enough that codegen gives
        # up and the stage runs ~2.3x slower than the equivalent
        # narrow plan. posexplode + (cluster, dim) avg computes the
        # same per-component float means (identical per-partition
        # accumulation order; cross-partition merge order was already
        # unordered in the wide plan — the 9dp rounding below is the
        # existing contract that absorbs it) through two generic
        # codegen-friendly operators.
        rows = (
            assigned.select(
                "cluster", F.posexplode(F.col(vec_col)).alias("_i", "_x")
            )
            .groupBy("cluster", "_i")
            .agg(F.round(F.avg("_x"), 9).alias("_m"))
            .collect()
        )
        by: dict[int, list[float]] = {}
        for r in rows:
            by.setdefault(r["cluster"], [0.0] * dim)[r["_i"]] = r["_m"]
        centroids = sorted((c, v) for c, v in by.items())
    return centroids
