"""On-disk IVF ε-pair index (r10 verdict item 6).

``cluster.ivf_epsilon_pairs`` recomputes its codebook and re-routes
the whole corpus on every call. For the reference's actual serving
shape — a long-lived article pool that grows by micro-batches
(process_records.py:88-118 stores only the new distance block; the
pool's settled pairs are never revisited) — the index should be
BUILT once and then appended to. This module persists exactly the
join's internals:

    <path>/_codebook/           cell-ordered codebook rows
                                (cell, _id, _v) — the FROZEN routing
                                geometry; appends route against it
                                bit-identically (shared
                                _ivf_prep_from_vecs / _ivf_route_fn)
    <path>/_params.json         eps, sample_mod, nprobe, cprobe,
                                margin, quant, n_buckets, id_type —
                                a query can't silently run with
                                different knobs than the build
    <path>/routed/              the routed fan-out rows
                                (cell, _id, _home, _v), hive-
                                partitioned by cell_bucket =
                                cell % n_buckets

Partitioning by a BUCKET of cells, not by cell: cells hold
~sample_mod rows by construction, so cell-level directories would
mean n/sample_mod directories (millions at 100 TB) — a metadata
explosion. Buckets keep the directory count fixed at ``n_buckets``
while still giving incremental queries directory-level partition
pruning (PartitionFilters): a new batch touches <= |batch|·nprobe
cells, so the scan reads only those cells' buckets, never the whole
history.

Scale shape: build = one routing pass + ONE bucket-keyed shuffle
into the partitioned write (the shuffle bounds the layout at one
file per non-empty bucket — without it every routing task opens a
writer per bucket it touches, tasks x n_buckets files); append =
route ONLY the new batch against the frozen broadcast codebook +
append its buckets (same bounded write); full query = per-cell
verify kernel over the layout (no routing at all — the expensive
fan-out is amortized across every later query); incremental query =
route batch, prune to touched buckets, kernel with left side
restricted to the new rows. Codebook drift under appends degrades
recall for genuinely novel regions (new rows still route to their
nearest EXISTING cells); rebuild when append volume rivals the base —
same contract as similarity.append_ivf_index.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import local_df
from .cluster import (
    IVF_QUANT,
    _ivf_cell_pairs_fn,
    _ivf_prep_from_vecs,
    _ivf_route_fn,
    ivf_centroid_ids,
)

_PARAMS = "_params.json"
_CODEBOOK = "_codebook"
_ROUTED = "routed"


def _route(df, prep, id_type, id_col, vec_col, n_buckets):
    """Route ``df`` against a prepared codebook; returns the fan-out
    frame (cell, _id, _home, _v, cell_bucket)."""
    spark = df.sparkSession
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).where(F.col("_v").isNotNull())
    par = spark.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < par:
        base = base.repartition(par)
    bc = spark.sparkContext.broadcast(prep["arrays"])
    routed = base.mapInArrow(
        _ivf_route_fn(bc, prep["p"], prep["cp"], prep["mq"]),
        schema=f"cell long, _id {id_type}, _home boolean, "
        "_v array<double>",
    )
    return routed.withColumn(
        "cell_bucket", F.pmod(F.col("cell"), F.lit(n_buckets))
    )


def write_eps_index(
    df: DataFrame,
    path: str,
    eps: float,
    id_col: str = "row_id",
    vec_col: str = "centroid",
    sample_mod: int = 64,
    nprobe: int = 8,
    cprobe: int = 32,
    margin: float | None = None,
    n_buckets: int = 256,
    codebook: DataFrame | None = None,
) -> None:
    """Build the on-disk ε-pair index for ``df`` at ``path``.

    ``codebook`` (optional, rows with ``id_col``/``vec_col``) injects
    an explicit codebook instead of the hash-stride sample of ``df``
    — the append==rebuild equivalence is stated against a rebuild
    that injects the ORIGINAL base codebook (a fresh stride over
    base∪batch is a different index by definition)."""
    import math

    spark = df.sparkSession
    id_type = dict(df.dtypes)[id_col]
    src = codebook if codebook is not None else df
    cb = (
        src.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ).where(F.col("_v").isNotNull())
    )
    if codebook is None:
        cb = ivf_centroid_ids(cb, "_id", sample_mod)
    cent_rows = cb.orderBy("_id").collect()
    if not cent_rows:
        cent_rows = (
            df.select(
                F.col(id_col).alias("_id"),
                F.col(vec_col).cast("array<double>").alias("_v"),
            )
            .where(F.col("_v").isNotNull())
            .orderBy("_id")
            .collect()
        )
    if margin is None:
        margin = math.sqrt(2.0 * eps) + 1e-6
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _PARAMS), "w") as f:
        json.dump(
            {
                "eps": eps,
                "sample_mod": sample_mod,
                "nprobe": nprobe,
                "cprobe": cprobe,
                "margin": margin,
                "quant": IVF_QUANT,
                "n_buckets": n_buckets,
                "id_type": id_type,
            },
            f,
        )
    # Arrow-local relation, not createDataFrame(list): the pickled
    # Python RDD costs ~0.1s of worker round-trip PER PARTITION per
    # action (r11: this one write was ~4s of cluster_ivf_index)
    local_df(
        spark,
        [(i, r["_id"], list(r["_v"])) for i, r in enumerate(cent_rows)],
        f"cell long, _id {id_type}, _v array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, _CODEBOOK)
    )
    if not cent_rows:
        # empty corpus: a readable (empty) routed layout, not a hole
        routed = spark.createDataFrame(
            [],
            f"cell long, _id {id_type}, _home boolean, "
            "_v array<double>, cell_bucket long",
        )
    else:
        prep = _ivf_prep_from_vecs(
            [r["_v"] for r in cent_rows], eps, margin, nprobe, cprobe
        )
        routed = _route(df, prep, id_type, id_col, vec_col, n_buckets)
        # One bucket-keyed shuffle before the partitioned write:
        # without it every routing task opens a writer per bucket it
        # touches (tasks x n_buckets files — thousands at bench
        # scale, millions on a cluster); with it the layout is
        # exactly one file per non-empty bucket. The shuffle moves
        # only the 16-byte-ish routing rows + vectors once, and the
        # downstream per-cell kernel was going to shuffle on cell
        # anyway — this just pays part of that cost at build time.
        routed = routed.repartition(n_buckets, "cell_bucket")
    routed.write.partitionBy("cell_bucket").mode("overwrite").parquet(
        os.path.join(path, _ROUTED)
    )


def _load(spark: SparkSession, path: str, need_prep: bool = True):
    """Read _params.json and (when ``need_prep``) rebuild the routing
    geometry from the persisted codebook. Full-index readers
    (eps_pairs_from_index) pass ``need_prep=False``: they never route,
    and the codebook collect + numpy prep were ~0.5s of pure waste per
    query at bench scale (r11, guide §1.2 — don't compute things you
    throw away)."""
    with open(os.path.join(path, _PARAMS)) as f:
        params = json.load(f)
    if params["quant"] != IVF_QUANT:
        raise ValueError(
            f"index at {path!r} was built with quant={params['quant']}, "
            f"this build uses {IVF_QUANT} — rebuild the index"
        )
    if not need_prep:
        return params, None
    cent_rows = (
        spark.read.parquet(os.path.join(path, _CODEBOOK))
        .orderBy("cell")
        .collect()
    )
    prep = (
        _ivf_prep_from_vecs(
            [r["_v"] for r in cent_rows],
            params["eps"],
            params["margin"],
            params["nprobe"],
            params["cprobe"],
        )
        if cent_rows
        else None
    )
    return params, prep


def _read_routed(spark: SparkSession, path: str, params: dict) -> DataFrame:
    """Routed-layout scan with an EXPLICIT schema: an empty index has
    partition directories but no data files, where inference fails —
    and the schema is knowable from _params.json anyway."""
    return spark.read.schema(
        f"cell long, _id {params['id_type']}, _home boolean, "
        "_v array<double>, cell_bucket long"
    ).parquet(os.path.join(path, _ROUTED))


def append_eps_index(new_batch: DataFrame, path: str,
                     id_col: str = "row_id",
                     vec_col: str = "centroid") -> None:
    """Route ``new_batch`` against the FROZEN codebook and append its
    fan-out rows — history is never rewritten; only the buckets the
    batch lands in gain files."""
    spark = new_batch.sparkSession
    params, prep = _load(spark, path)
    if prep is None:
        raise ValueError(f"index at {path!r} has an empty codebook")
    if dict(new_batch.dtypes)[id_col] != params["id_type"]:
        raise ValueError(
            f"id column type {dict(new_batch.dtypes)[id_col]!r} != "
            f"index id_type {params['id_type']!r}"
        )
    _route(
        new_batch, prep, params["id_type"], id_col, vec_col,
        params["n_buckets"],
    ).repartition(
        params["n_buckets"], "cell_bucket"
    ).write.partitionBy("cell_bucket").mode("append").parquet(
        os.path.join(path, _ROUTED)
    )


def eps_pairs_from_index(
    spark: SparkSession,
    path: str,
    both_directions: bool = False,
    max_block: int = 4096,
) -> DataFrame:
    """All ε-pairs of the indexed corpus, straight from the persisted
    fan-out — NO routing pass: the per-cell verify kernel is the only
    compute. Output contract matches ivf_epsilon_pairs."""
    params, _ = _load(spark, path, need_prep=False)
    id_type = params["id_type"]
    out_schema = f"l_id {id_type}, r_id {id_type}, dist double"
    routed = _read_routed(spark, path, params).select(
        "cell", "_id", "_home", "_v"
    )
    verified = (
        routed.groupBy("cell")
        .applyInArrow(
            _ivf_cell_pairs_fn(params["eps"], max_block),
            schema=out_schema,
        )
        .dropDuplicates(["l_id", "r_id"])
    )
    if not both_directions:
        return verified
    return verified.unionAll(
        verified.select(
            F.col("r_id").alias("l_id"),
            F.col("l_id").alias("r_id"),
            "dist",
        )
    )


def eps_pairs_incremental(
    new_batch: DataFrame,
    path: str,
    id_col: str = "row_id",
    vec_col: str = "centroid",
    both_directions: bool = False,
    max_block: int = 4096,
) -> DataFrame:
    """ε-pairs of ``new_batch`` × (indexed pool ∪ ``new_batch``)
    WITHOUT recomputing any settled pool×pool pair — the reference's
    incremental semantics (clustering.py:88-118). The batch routes
    against the frozen codebook in memory; the index scan is pruned
    to the buckets the batch actually touches (collect of <=
    |batch|·nprobe distinct bucket ids -> literal IN filter ->
    directory-level PartitionFilters before a byte of history is
    read). Does NOT append — call append_eps_index to absorb the
    batch afterwards."""
    spark = new_batch.sparkSession
    params, prep = _load(spark, path)
    if prep is None:
        raise ValueError(f"index at {path!r} has an empty codebook")
    id_type = params["id_type"]
    out_schema = f"l_id {id_type}, r_id {id_type}, dist double"
    routed_new = _route(
        new_batch, prep, id_type, id_col, vec_col, params["n_buckets"]
    ).localCheckpoint(eager=True)
    touched = sorted(
        r["cell_bucket"]
        for r in routed_new.select("cell_bucket").distinct().collect()
    )
    if not touched:
        return spark.createDataFrame([], out_schema)
    pool = (
        _read_routed(spark, path, params)
        .where(F.col("cell_bucket").isin(touched))
        .select("cell", "_id", "_home", "_v")
        .withColumn("_new", F.lit(False))
    )
    both = pool.unionByName(
        routed_new.select("cell", "_id", "_home", "_v").withColumn(
            "_new", F.lit(True)
        )
    )
    verified = (
        both.groupBy("cell")
        .applyInArrow(
            _ivf_cell_pairs_fn(params["eps"], max_block),
            schema=out_schema,
        )
        .dropDuplicates(["l_id", "r_id"])
    )
    if not both_directions:
        return verified
    return verified.unionAll(
        verified.select(
            F.col("r_id").alias("l_id"),
            F.col("l_id").alias("r_id"),
            "dist",
        )
    )
