"""Clustering operators (SURVEY §2.3 J4, §2.8 M3, §2.4 A2).

The reference clusters with ``DBSCAN(eps=0.10, min_samples=2,
metric='precomputed')`` over a cosine-distance matrix
(process_records.py:301-308, clustering.py:53-118). With
``min_samples=2`` every point with at least one ε-neighbor is a core
point, so DBSCAN degenerates *exactly* to connected components of the
ε-neighborhood graph — which is how we implement it, as a composition
of a similarity join (edge generation) and an iterative hash-min label
propagation (component search). Both pieces are plain DataFrame ops, so
they scale out; nothing is materialized on the driver.

Similarity-join strategies:
  * ``cross``  — full O(n²) pair filter. Right for pools ≤ ~10⁴ rows
                 (bench scale); Catalyst keeps the distance expression
                 in codegen and AQE picks broadcast when one side fits.
  * ``lsh``    — MLlib BucketedRandomProjectionLSH approxSimilarityJoin.
                 For unit vectors, ‖a-b‖² = 2·cos_dist(a,b), so the
                 cosine threshold eps maps to euclidean sqrt(2·eps).
                 This is the 100 TB path: candidate pairs only, no n².
  * ``auto``   — cross below ``LSH_THRESHOLD`` rows, else lsh.

Incremental semantics replicated from the reference (SURVEY §7.4):
  - distances are computed new-batch × (pool ∪ new-batch) only; settled
    pool-vs-pool pairs are never revisited (clustering.py:88-118 stores
    just the new block).
  - the component representative is the lowest pool position
    (process_records.py:369-371); merged-in rows that are *not* already
    clusters are absorbed and purged; rows that are clusters keep their
    identity and only donate their centroid to the new mean
    (process_records.py:386-416 — ``to_remove`` skips is_cluster rows).
  - the representative's centroid becomes the mean of the *pool-row*
    vectors in the component (centroids count once, not per-member:
    process_records.py:393-400).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import vectors as V

DEFAULT_EPS = 0.10  # reference process_records.py:304
LSH_THRESHOLD = 20_000  # pool size above which cross-join is replaced
# lsh_candidate_pairs re-attaches vectors to the verified candidate
# set by broadcast when the whole vector table provably fits; 64 MiB
# of packed doubles is well inside executor broadcast budgets.
_VEC_BROADCAST_BYTES = 64 << 20
# Below these sizes the ε-graph fits trivially on the driver and a
# local union-find beats rounds of distributed joins (same planner
# heuristic as the broadcast side of brute_force_pairs — the driver
# already holds the whole vector pool there). Above them CC runs as
# distributed graph contraction.
LOCAL_CC_EDGES = 2_000_000
LOCAL_CC_VERTICES = 1_000_000

# --- edge generation (J4) --------------------------------------------


def brute_force_pairs(
    left: DataFrame,
    right: DataFrame,
    eps: float,
    id_col: str = "row_id",
    vec_col: str = "centroid",
    upper_only: bool = False,
    with_dist: bool = True,
    block_cells: int = 16_000_000,
) -> DataFrame:
    """All pairs (left.id, right.id) with cosine distance <= eps.
    Output: l_id, r_id, dist (float64). Skips self-pairs.

    Implementation: the right side is collected and broadcast (this
    strategy is only chosen when it fits — similarity_pairs switches
    to LSH above LSH_THRESHOLD), then each left partition computes a
    vectorized NumPy block matmul against it inside mapInPandas — the
    same normalized-dot kernel the reference hand-rolls
    (clustering.py:53-85), but per-executor with Arrow batches and in
    float64 (no fp16 artifacts, SURVEY §7.4 risk 6). O(n·m/p) per
    task, zero shuffle."""
    import numpy as np
    import pandas as pd

    spark = left.sparkSession
    dist_part = ", dist double" if with_dist else ""
    out_schema = (
        f"l_id {dict(left.dtypes)[id_col]}, "
        f"r_id {dict(right.dtypes)[id_col]}{dist_part}"
    )
    r_rows = right.select(
        F.col(id_col).alias("rid"), F.col(vec_col).alias("rvec")
    ).collect()
    if not r_rows:
        return spark.createDataFrame([], out_schema)
    r_ids = np.array([row["rid"] for row in r_rows])
    r_mat = np.array([row["rvec"] for row in r_rows], dtype=np.float64)
    r_norm = r_mat / np.maximum(
        np.linalg.norm(r_mat, axis=1, keepdims=True), 1e-300
    )
    bc = spark.sparkContext.broadcast((r_ids, r_norm))

    # A small parquet scan arrives as 1 partition — that would run the
    # whole matmul in one task. Fan the left side out to the cluster.
    par = spark.sparkContext.defaultParallelism
    if left.rdd.getNumPartitions() < par:
        left = left.repartition(par)

    def block(batches):
        ids_r, mat_r = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            l_ids = pdf["lid"].to_numpy()
            l_mat = np.array(pdf["lvec"].tolist(), dtype=np.float64)
            l_norm = l_mat / np.maximum(
                np.linalg.norm(l_mat, axis=1, keepdims=True), 1e-300
            )
            # right side processed in column blocks bounded to ~16M
            # sim cells (128 MB float64): an UNBLOCKED batch x right
            # matrix is batch_rows x |right| doubles PER WORKER —
            # at a 100k-row right side that is 2.4 GB x 32 workers,
            # which OOM-killed the r10 sf10 probe's recall leg
            rchunk = max(512, block_cells // max(len(l_norm), 1))
            outs = []
            for r0 in range(0, len(ids_r), rchunk):
                sim = l_norm @ mat_r[r0: r0 + rchunk].T
                dist = np.clip(1.0 - sim, 0.0, 1.0)
                li, ri = np.nonzero(dist <= eps)
                gr = ri + r0
                keep = (
                    (l_ids[li] < ids_r[gr])
                    if upper_only
                    else (l_ids[li] != ids_r[gr])
                )
                cols = {
                    "l_id": l_ids[li][keep],
                    "r_id": ids_r[gr][keep],
                }
                if with_dist:
                    cols["dist"] = dist[li, ri][keep]
                outs.append(pd.DataFrame(cols))
            if outs:
                yield pd.concat(outs)
            else:
                # fallback frame must carry the SAME columns as the
                # blocked path (incl. dist when with_dist) or the
                # Arrow schema conversion dies on the empty batch
                empty = {"l_id": [], "r_id": []}
                if with_dist:
                    empty["dist"] = []
                yield pd.DataFrame(empty)

    return left.select(
        F.col(id_col).alias("lid"), F.col(vec_col).alias("lvec")
    ).mapInPandas(block, schema=out_schema)


def signlsh_bits(
    eps: float,
    probe_radius: int,
    target_recall: float = 0.7,
    max_bits: int = 24,
) -> int:
    """Largest hyperplane count whose multiprobe recall at the ε
    boundary still meets ``target_recall``.

    Sign-LSH collision probability per bit for a pair at cosine
    distance d is p = 1 - arccos(1-d)/π; a pair is found iff at most
    ``probe_radius`` of the bits differ, so boundary recall is the
    binomial tail P(Binom(nbits, 1-p) <= probe_radius). More bits =
    smaller buckets = cheaper join, so take the most bits that still
    clear the floor (pairs well inside ε collide with higher p)."""
    best = 4
    for n in range(4, max_bits + 1):
        if _boundary_recall(eps, n, probe_radius) >= target_recall:
            best = n
        else:
            break
    return best


def signlsh_params(
    eps: float,
    n_rows: int,
    target_recall: float = 0.7,
    max_bits: int = 34,
    max_probes: int = 256,
) -> tuple[int, int]:
    """(nbits, probe_radius) sized to the corpus, not just to recall.

    Recall alone picks FEW bits (12 at eps=0.1, r=2) — fine at 50k
    rows, catastrophic at 10⁹ where 2^12 buckets mean ~244k rows per
    bucket and the within-bucket join goes quadratic again. Bounded
    bucket load (~16 rows expected) needs nbits >= log2(N/16), and
    recall at a given bit count is bought with probe radius. So:
    smallest r in {1,2,3} whose recall-max bit count covers the load
    floor AND whose probe fan-out Σ_{k<=r} C(nbits, k) stays within
    ``max_probes``; if nothing qualifies, the largest r that fits the
    probe budget at the load floor, accepting boundary recall below
    target (pairs well inside ε still collide at much higher
    probability — documented tradeoff, never a quadratic join and
    never an unbounded explode).

    The probe cap is the r09 100x lesson: the explode multiplies the
    corpus by the mask count, and at the load-floor bit widths of
    500k+ corpora r=3 means >1100 masks per row — the probe pass
    itself became the quadratic-shaped cost (881 s at 500k vectors;
    OOM at 5M). C(20, <=2) = 211 masks keeps the fan-out flat while
    boundary recall at eps=0.1 stays ~0.5; callers buy recall with
    a second hash table (seed), not with radius."""
    import math

    def probes(nb: int, r: int) -> int:
        return sum(math.comb(nb, k) for k in range(r + 1))

    # load floor: expected bucket occupancy ~0.25, NOT ~16 — the
    # candidate volume per row is probes x load, and at the ~100-mask
    # fan-outs of real corpora a load of 16 amplifies every row into
    # ~2000 candidate cosines (r09 100x probe: 15 min at 500k vectors
    # on bits sized for load 16; seconds at load 0.25). Four extra
    # bits cost nothing — buckets are a hash value, not an allocation.
    need = max(4, math.ceil(math.log2(max(n_rows, 2) * 4.0)))
    for r in (1, 2, 3):
        nb = signlsh_bits(eps, r, target_recall, max_bits)
        # signlsh_bits returns its 4-bit floor even when 4 bits can't
        # meet the target at this radius — verify before trusting it
        # (eps=0.56 at r=1: boundary recall ~0.55 despite nb=4)
        if (
            nb >= need
            and _boundary_recall(eps, nb, r) >= target_recall
            and probes(nb, r) <= max_probes
        ):
            return nb, r
    nb = min(need, max_bits)
    best = 1
    for r in (2, 3):
        if probes(nb, r) <= max_probes:
            best = r
    return nb, best


def signlsh_tables(
    eps: float,
    nbits: int,
    probe_radius: int,
    target_recall: float = 0.7,
    max_tables: int = 8,
) -> int:
    """Hash-table count L lifting multiprobe recall at the ε boundary
    to ``target_recall``: 1 − (1 − p₁)^L >= target, p₁ the
    single-table boundary recall. Capped at ``max_tables`` (each
    table is one more linear bucket+probe pass; past ~8 the honest
    answer is a different index, not more of this one)."""
    import math

    p1 = _boundary_recall(eps, nbits, probe_radius)
    if p1 >= target_recall:
        return 1
    if p1 <= 0.0:
        return max_tables
    need = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p1))
    return max(1, min(max_tables, need))


def _boundary_recall(eps: float, nbits: int, probe_radius: int) -> float:
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, 1.0 - eps))) / math.pi
    q = 1.0 - p
    return sum(
        math.comb(nbits, k) * (q**k) * (p ** (nbits - k))
        for k in range(probe_radius + 1)
    )


def _pair_verify_fn(eps: float):
    """mapInPandas exact-cosine verify kernel factory: batches of
    (l_id, r_id, _lv, _rv) -> (l_id, r_id, dist) rows with dist <=
    eps. Replays ``V.cosine_distance`` bit-for-bit — norms and dot
    are sequential-over-dims, vectorized-over-pairs folds (identical
    IEEE op order to the Catalyst/DuckDB expression), then
    greatest(0, least(1, .)) clipping with Spark's NaN ordering
    (zero-norm vectors: NaN clips to 1.0 there, so they are emitted
    only when eps >= 1 — replicated exactly). r11 optimization
    (guide §4.2): the interpreted aggregate/zip_with fold was ~85%
    of cluster_lsh's wall at 1.9M candidates x 3 folds x 64 dims;
    one NumPy pass per Arrow batch does the same arithmetic at
    vector speed."""
    import numpy as np
    import pandas as pd

    def verify(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            A = np.array(pdf["_lv"].tolist(), dtype=np.float64)
            B = np.array(pdf["_rv"].tolist(), dtype=np.float64)
            na = np.zeros(len(A), dtype=np.float64)
            nb = np.zeros(len(A), dtype=np.float64)
            dot = np.zeros(len(A), dtype=np.float64)
            for j in range(A.shape[1]):
                a = A[:, j]
                b = B[:, j]
                na = na + a * a
                nb = nb + b * b
                dot = dot + a * b
            dist = 1.0 - dot / (np.sqrt(na) * np.sqrt(nb))
            nanm = np.isnan(dist)
            dist = np.minimum(1.0, np.maximum(0.0, dist))
            # Spark/DuckDB order NaN above every double: least(1, NaN)
            # = 1.0, so greatest(0, least(1, NaN)) = 1.0
            dist[nanm] = 1.0
            ok = dist <= eps
            yield pd.DataFrame(
                {
                    "l_id": pdf["l_id"].to_numpy()[ok],
                    "r_id": pdf["r_id"].to_numpy()[ok],
                    "dist": dist[ok],
                }
            )

    return verify


def _pair_verify_lookup_fn(eps: float, bc):
    """Broadcast-lookup variant of _pair_verify_fn (r11, guide §2.3/
    §8: shuffle keys, not payloads): candidate batches carry ONLY
    (l_id, r_id) — 16-ish bytes/row — and the kernel gathers both
    vectors from a one-time python broadcast of the (ids, matrix)
    pair. The old path attached vectors per CANDIDATE row via two
    broadcast hash joins and then shipped candidates x 2 x dim
    doubles through Arrow (~2 GB at the bench's 1.9M candidates);
    this ships the matrix once per worker and ~30 MB of ids. The
    arithmetic is _pair_verify_fn's fold verbatim — same gathered
    doubles, same IEEE op order, same NaN clipping — so emitted
    distances are bit-identical."""
    import numpy as np
    import pandas as pd

    def verify(batches):
        l_index, XL, r_index, XR = bc.value
        if r_index is None:  # symmetric: left IS right
            r_index, XR = l_index, XL
        for pdf in batches:
            if pdf.empty:
                continue
            li = l_index.get_indexer(pdf["l_id"].to_numpy())
            ri = r_index.get_indexer(pdf["r_id"].to_numpy())
            A = XL[li]
            B = XR[ri]
            na = np.zeros(len(A), dtype=np.float64)
            nb = np.zeros(len(A), dtype=np.float64)
            dot = np.zeros(len(A), dtype=np.float64)
            for j in range(A.shape[1]):
                a = A[:, j]
                b = B[:, j]
                na = na + a * a
                nb = nb + b * b
                dot = dot + a * b
            dist = 1.0 - dot / (np.sqrt(na) * np.sqrt(nb))
            nanm = np.isnan(dist)
            dist = np.minimum(1.0, np.maximum(0.0, dist))
            dist[nanm] = 1.0
            ok = dist <= eps
            yield pd.DataFrame(
                {
                    "l_id": pdf["l_id"].to_numpy()[ok],
                    "r_id": pdf["r_id"].to_numpy()[ok],
                    "dist": dist[ok],
                }
            )

    return verify


def _collect_vec_lookup(vecs_df, id_name: str, vec_name: str):
    """Driver-side (pd.Index over ids, float64 matrix) for the
    verify's broadcast-lookup attach — or None when ids are not
    unique (duplicate-id inputs keep the join path, which preserves
    the per-duplicate pair fan-out). Same driver footprint as the
    JVM broadcast hash relation this replaces, behind the same
    ``n_rows * dim * 8 <= gate`` check."""
    import numpy as np
    import pandas as pd

    # r11 session 2: toArrow + one flat-buffer reshape instead of
    # toPandas + per-row tolist — the collect was ~1s of every
    # lookup-gated LSH query's wall at the 50k bench corpus
    tbl = vecs_df.toArrow()
    if tbl.num_rows == 0:
        return None  # join path handles the empty corpus
    ids = tbl.column(id_name).to_numpy(zero_copy_only=False)
    index = pd.Index(ids)
    if not index.is_unique:
        return None
    X = _arrow_vec_matrix(
        tbl.column(vec_name).combine_chunks(), tbl.num_rows, np
    )
    return index, X


def lsh_candidate_pairs(
    left: DataFrame,
    right: DataFrame,
    eps: float,
    id_col: str = "row_id",
    vec_col: str = "centroid",
    nbits: int | None = None,
    probe_radius: int | None = None,
    seed: int = 42,
    n_rows: int | None = None,
    dim: int | None = None,
    symmetric: bool = False,
    n_tables: int = 1,
    vec_broadcast_bytes: int | None = None,
    both_directions: bool = True,
) -> DataFrame:
    """Approximate ε-pairs via sign (random-hyperplane) LSH with
    multiprobe, verified exactly. Same output contract as
    brute_force_pairs (both directions, no self-pairs, dist column).

    Shape: bucket both sides on ``nbits`` hyperplane signs (one
    Arrow-batched matmul per partition), explode the left side to
    every bucket within hamming distance ``probe_radius`` of its own,
    equi-join on the bucket id, then re-verify candidates with the
    exact cosine distance — zero false positives, recall = the
    binomial tail signlsh_bits targets. When ``nbits`` /
    ``probe_radius`` are omitted they are sized to the corpus via
    signlsh_params (bucket count scales with right-side rows so the
    per-bucket join stays linear; recall bought with probe radius);
    pass them explicitly to pin the tradeoff.

    ``symmetric=True`` declares left IS right (a self-join): the
    XOR-mask match is symmetric, so every unordered pair would be
    generated and exact-verified twice — once per orientation. The
    fast path keeps only probes ``>= `` the row's own bucket (pair
    with buckets p<q is found solely from the p side; same-bucket
    pairs are disambiguated by ``l_id < r_id``), which halves both
    the probe explode and the verification kernel, then mirrors the
    verified half to preserve the both-directions output contract
    bit-for-bit. r07 bisect: the double-sided verify was the bulk of
    the cluster_lsh regression (4.3s -> 1.7s on the 50k corpus).

    ``n_tables`` > 1 builds L independent hash tables (seeds seed,
    seed+1, ...) and UNIONS their candidate sets before the single
    exact verify — the standard recall lever once the probe radius
    hits its fan-out budget. Single-table multiprobe recall DECAYS
    with corpus size: the bucket-load floor pushes nbits up with
    log N, every extra bit multiplies the per-pair miss odds, and
    the probe fan-out C(nbits, r) is capped at 256 masks (r09 100x
    probe: radius-3 at the 500k-corpus bit width exploded 1160
    masks/row — 15 minutes of probe join where radius-2 takes
    seconds). L tables cost L bucket passes + L probe joins —
    LINEAR in both L and N — and lift recall to 1 − (1 − p₁)^L;
    candidates are deduped across tables before the verify, so each
    surviving pair pays the cosine exactly once. signlsh_tables()
    sizes L from the single-table boundary recall.

    This replaced an MLlib BucketedRandomProjectionLSH formulation:
    on L2-normalized vectors the scalar projections concentrate in
    (-3/8, 3/8) (E[(u.r)^2] = 1/dim), so any bucketLength of ordinary
    size collapsed the corpus into a handful of buckets and the
    "scale path" degenerated into a quadratic within-bucket join —
    unusable at exactly the >LSH_THRESHOLD sizes it exists for."""
    from .similarity import lsh_bucket_rows, probe_masks

    if nbits is None and probe_radius is None:
        # n_rows spares the extra count job when the caller (e.g.
        # similarity_pairs' auto strategy) already sized the input
        nbits, probe_radius = signlsh_params(
            eps, right.count() if n_rows is None else n_rows
        )
    elif nbits is None:
        nbits = signlsh_bits(eps, probe_radius)
    elif probe_radius is None:
        probe_radius = 2
    if dim is None:
        # driver job over the (possibly UDF-bearing) left lineage just
        # to learn the vector width — callers that know it (catalog
        # q_cluster_lsh, incremental_cluster_update) pass dim= and
        # skip this, the same way n_rows= spares the right.count()
        first = (
            left.select(vec_col).where(F.col(vec_col).isNotNull()).first()
        )
        if first is None:
            spark = left.sparkSession
            id_type = dict(left.dtypes)[id_col]
            return spark.createDataFrame(
                [], f"l_id {id_type}, r_id {id_type}, dist double"
            )
        dim = len(first[0])
    l_vecs = left.select(
        F.col(id_col).alias("l_id"), F.col(vec_col).alias("_lv")
    )
    r_vecs = right.select(
        F.col(id_col).alias("r_id"), F.col(vec_col).alias("_rv")
    )
    masks = probe_masks(nbits, probe_radius)

    # Per hash table: Arrow-batched int64 matmul bucketing
    # (bit-identical to lsh_bucket_col and the SQL replay —
    # quantized-integer dots are order-free, ~10x faster than the
    # interpreted fold at nbits=18 x dim=64), then the probe explode.
    # The explode multiplies the left side by len(masks); carrying
    # vectors through it would shuffle |left| * masks * dim doubles,
    # so the join runs on (id, bucket) pairs ONLY and vectors are
    # re-attached to the far smaller candidate set at verify —
    # broadcast-attached when provably small (n_rows & dim known,
    # under _VEC_BROADCAST_BYTES), hash-join otherwise.
    def _cand_one_table(t: int):
        # r11 session 2: lsh_bucket_rows (mapInArrow) replaces the
        # withColumn pandas_udf — the candidate paths only ever keep
        # (id, bucket), so bucketing emits exactly that and vectors
        # never enter a pandas object column (guide §4.2). Quantized
        # integer dots are order-free: bit-identical buckets.
        probes = F.array(
            *[
                F.col("_b0").bitwiseXOR(F.lit(m)).cast("long")
                for m in masks
            ]
        )
        lvd = l_vecs.select(
            "l_id", F.col("_lv").cast("array<double>").alias("_lv")
        )
        if symmetric:
            # left IS right: reuse the one Arrow matmul instead of
            # bucketing the same vectors twice (r09: ~1.5s of the 50k
            # bench query was the duplicate bucket pass). Checkpoint
            # only (id, bucket) — materializing the vector column the
            # verify re-attaches anyway would be pure waste.
            lb = lsh_bucket_rows(
                lvd, "l_id", "_lv", dim, nbits, seed + t
            ).localCheckpoint(eager=True)
            rb = lb.select(
                F.col("l_id").alias("r_id"),
                F.col("_b0").alias("_bucket"),
            )
            # each unordered pair matches on exactly ONE bucket value
            # per table (its mask m = b_l XOR b_r is unique), so
            # probing only buckets >= the row's own generates it once:
            # from the smaller-bucket side, or — same bucket — from
            # the smaller id. Halves the explode AND the verify.
            lbe = lb.select(
                "l_id",
                F.col("_b0"),
                F.explode(
                    F.filter(probes, lambda p: p >= F.col("_b0"))
                ).alias("_bucket"),
            )
            return (
                lbe.join(rb, "_bucket")
                .where(
                    (F.col("_bucket") > F.col("_b0"))
                    | (F.col("l_id") < F.col("r_id"))
                )
                .select("l_id", "r_id")
            )
        lb = lsh_bucket_rows(lvd, "l_id", "_lv", dim, nbits, seed + t)
        rb = lsh_bucket_rows(
            r_vecs.select(
                "r_id", F.col("_rv").cast("array<double>").alias("_rv")
            ),
            "r_id",
            "_rv",
            dim,
            nbits,
            seed + t,
            bucket_out="_bucket",
        )
        lbe = lb.select("l_id", F.explode(probes).alias("_bucket"))
        return (
            lbe.join(rb, "_bucket")
            .where(F.col("l_id") != F.col("r_id"))
            .select("l_id", "r_id")
        )

    cand = _cand_one_table(0)
    for t in range(1, n_tables):
        cand = cand.unionAll(_cand_one_table(t))
    if n_tables > 1:
        # cross-table dedup BEFORE the verify: candidate id pairs are
        # 16 bytes, verified cosines are the expensive part. (The
        # symmetric path emits each pair in ONE canonical-per-table
        # orientation, but different tables can disagree on which —
        # canonicalize before distinct.)
        if symmetric:
            cand = cand.select(
                F.least("l_id", "r_id").alias("l_id"),
                F.greatest("l_id", "r_id").alias("r_id"),
            )
        cand = cand.dropDuplicates(["l_id", "r_id"])
    # vec_broadcast_bytes is the memory-vs-disk tradeoff knob for the
    # verify's vector attach (r09 100x probe lesson): above the gate
    # the attach runs as TWO shuffle joins whose second leg carries a
    # full vector per CANDIDATE row — bytes ~= candidates x dim x 8,
    # i.e. answer-volume-bound, and on a near-dup-saturated corpus
    # (5M vectors x ~24 true pairs each) that is ~60 GB of shuffle a
    # single box's disk may not hold, while the whole vector table is
    # only n x dim x 8 = 2.5 GB — comfortably one executor's memory.
    # Callers that know their executors can raise the gate; the 64 MiB
    # default stays conservative for the generic path.
    gate = (
        _VEC_BROADCAST_BYTES
        if vec_broadcast_bytes is None
        else vec_broadcast_bytes
    )
    small = n_rows is not None and n_rows * dim * 8 <= gate
    id_type = dict(left.dtypes)[id_col]
    out_schema = f"l_id {id_type}, r_id {id_type}, dist double"
    lookup = None
    if small:
        # r11 (guide §2.3/§8): under the gate the vector table fits
        # in memory anyway (the old path built TWO JVM broadcast hash
        # relations of it) — collect it ONCE, python-broadcast the
        # (ids, matrix) pair, and let the verify kernel gather
        # vectors by id. Candidates then cross the Arrow boundary as
        # bare id pairs instead of 2 x dim doubles each (~2 GB ->
        # ~30 MB at the bench's 1.9M candidates). Bit-identical dist:
        # same doubles, same fold (_pair_verify_lookup_fn). Falls
        # back to the join path when ids are not unique (duplicate-id
        # inputs rely on the join's per-duplicate fan-out).
        l_look = _collect_vec_lookup(
            l_vecs.where(F.col("_lv").isNotNull()), "l_id", "_lv"
        )
        if l_look is not None:
            if symmetric:
                lookup = (*l_look, None, None)
            else:
                r_look = _collect_vec_lookup(
                    r_vecs.where(F.col("_rv").isNotNull()),
                    "r_id",
                    "_rv",
                )
                if r_look is not None:
                    lookup = (*l_look, *r_look)
    if lookup is not None:
        bc = left.sparkSession.sparkContext.broadcast(lookup)
        verified = cand.select("l_id", "r_id").mapInPandas(
            _pair_verify_lookup_fn(eps, bc), schema=out_schema
        )
    else:
        if small:
            l_vecs, r_vecs = F.broadcast(l_vecs), F.broadcast(r_vecs)
        verified = (
            cand.join(l_vecs, "l_id")
            .join(r_vecs, "r_id")
            .select("l_id", "r_id", "_lv", "_rv")
            # exact verify in one NumPy pass per Arrow batch instead
            # of the interpreted per-candidate aggregate/zip_with
            # folds — same IEEE double (guide §4.2; r11)
            .mapInPandas(_pair_verify_fn(eps), schema=out_schema)
        )
    if not symmetric and n_tables == 1:
        # duplicate-id inputs can repeat an (l, r) pair — dedup. The
        # SYMMETRIC single-table path needs none: an unordered pair
        # matches on exactly one bucket value (its unique mask
        # m = b_l XOR b_r), generated from one side only (r09); the
        # multi-table paths dedup candidates pre-verify above.
        verified = verified.dropDuplicates(["l_id", "r_id"])
    if symmetric and both_directions:
        # restore the both-directions contract from the verified half.
        # NOTE the union's two branches are the SAME unmaterialized
        # lineage — Catalyst does not share it, so a consumer that
        # aggregates the union executes the candidate join + verify
        # twice. Callers that only need each unordered pair once
        # (aggregates, canonical-pair joins) should pass
        # both_directions=False and read the half directly: it holds
        # every unordered pair exactly once in BUCKET-canonical
        # orientation (probe >= own bucket), i.e. NOT sorted by id —
        # canonicalize with least/greatest if id order matters (r11;
        # the same contract ivf_epsilon_pairs already documents).
        verified = verified.unionAll(
            verified.select(
                F.col("r_id").alias("l_id"),
                F.col("l_id").alias("r_id"),
                "dist",
            )
        )
    return verified


# ivf_epsilon_pairs routing quantizer: vector components scale by 2^20
# before rounding, so routing distances are EXACT integers (squares sum
# to < 2^53 at dim 64 — see the operator docstring) and both engines
# rank cells identically with no float-order ambiguity anywhere.
IVF_QUANT = 1 << 20


def ivf_centroid_ids(df: DataFrame, id_col: str, sample_mod: int):
    """The deterministic centroid subset of ``df``: rows whose content
    hash lands on the ``sample_mod`` stride. Data-point centroids —
    not Lloyd means — so the DuckDB oracle can SELECT the identical
    codebook instead of replaying float k-means."""
    from ..functions import hashing as H

    return df.where(
        F.pmod(H.hash64(F.col(id_col).cast("string")), sample_mod) == 0
    )


def _ivf_prep_from_vecs(vecs, eps, margin, nprobe, cprobe):
    """Quantize an ORDERED codebook (cell i = vecs[i]) and derive the
    two-level coarse structure + resolved probe knobs. Shared by the
    in-memory ε-pair join and the on-disk index (eps_index.py), so a
    frozen persisted codebook routes bit-identically to the build."""
    import math

    import numpy as np

    Cq = np.array(
        [
            np.floor(np.asarray(v, dtype=np.float64) * IVF_QUANT + 0.5)
            for v in vecs
        ],
        dtype=np.float64,
    )
    c_sq = (Cq * Cq).sum(axis=1)
    if margin is None:
        margin = math.sqrt(2.0 * eps) + 1e-6
    mq = margin * IVF_QUANT
    k = len(Cq)
    # two-level index: coarse centroids = every cstride-th row of the
    # id-ordered codebook; each fine cell joins its nearest coarse
    # group by the same exact-integer d2 with (d2, g) tie-break
    # (np.argmin returns the FIRST minimum — g ascends with column)
    cstride = max(1, math.isqrt(k))
    g_pos = np.arange(0, k, cstride)
    kc = len(g_pos)
    Gq = Cq[g_pos]
    g_sq = c_sq[g_pos]
    d2cg = c_sq[:, None] - 2.0 * (Cq @ Gq.T) + g_sq[None, :]
    cell_grp = np.argmin(d2cg, axis=1)
    grp_members = [np.nonzero(cell_grp == g)[0] for g in range(kc)]
    return {
        "arrays": (Cq, c_sq, Gq, g_sq, grp_members),
        "p": min(nprobe, k),
        "cp": min(cprobe, kc),
        "mq": mq,
    }


def _arrow_vec_matrix(col, n, np):
    """(n, dim) float64 view of an Arrow list column with no nulls —
    one flat-buffer reshape instead of a per-row object conversion
    (r11 session 2, guide §4.2). Raises on nulls/ragged input, which
    the callers' `.where(col.isNotNull())` + fixed-dim contract
    already exclude (the old tolist() path would have failed there
    too, just later). Row width is validated from the list OFFSETS
    (r11 advice): total-length divisibility alone would let mixed-dim
    rows whose flattened length happens to divide n reshape into
    silently wrong vectors."""
    if col.null_count:
        raise ValueError("vector column contains nulls")
    if n == 0 or not _arrow_uniform_width(col, np):
        raise ValueError("ragged vector column")
    vals = col.flatten()
    return (
        vals.to_numpy(zero_copy_only=False)
        .astype(np.float64, copy=False)
        .reshape(n, len(vals) // n)
    )


def _arrow_uniform_width(col, np):
    """True iff every list in a no-null Arrow list column has the
    same length, checked from the offsets buffer (np.diff over the
    n+1 offsets — O(n) ints, no value materialization)."""
    offs = col.offsets.to_numpy(zero_copy_only=False)
    if len(offs) <= 2:
        return True
    widths = np.diff(offs)
    return bool((widths == widths[0]).all())


def _ivf_route_fn(bc, p: int, cp: int, mq: float):
    """mapInArrow routing-kernel factory: quantize each batch, rank
    the coarse rows (level 1), exact-rank the probed groups' fine
    cells (level 2) via one (d2, cell) lexsort, margin-cap, and emit
    (cell, _id, _home, _v) fan-out rows. ``bc`` broadcasts the
    _ivf_prep_from_vecs arrays; shared by ivf_epsilon_pairs and the
    on-disk index so build/append/query all route identically.
    r11 session 2 (guide §4.2): vectors cross the boundary as flat
    Arrow buffers (zero-copy reshape in, flat-buffer gather out)
    instead of pandas object columns; the routing arithmetic —
    quantization, integer d2 ranks, lexsort, margin cap — is
    unchanged, so the fan-out is row-for-row identical."""
    import numpy as np
    import pyarrow as pa

    def route(batches):
        Cm, csq, Gm, gsq, members = bc.value
        n_grp = len(members)
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            ids_arrow = rb.column(rb.schema.get_field_index("_id"))
            v_col = rb.column(rb.schema.get_field_index("_v"))
            X = _arrow_vec_matrix(v_col, n, np)
            Xq = np.floor(X * IVF_QUANT + 0.5)
            a_cell, a_idx, a_home = [], [], []
            # row-chunked so the distance blocks stay flat
            for r0 in range(0, len(Xq), 1024):
                xc = Xq[r0: r0 + 1024]
                nr = len(xc)
                x_sq = (xc * xc).sum(axis=1)
                # level 1 — rank the √k coarse rows; stable argsort on
                # d2 keeps ascending g within ties = (d2, g) rank.
                # d2(x, c) = |x|² - 2x·c + |c|², every term an exact
                # integer-valued double -> identical in any engine
                d2g = x_sq[:, None] - 2.0 * (xc @ Gm.T) + gsq[None, :]
                topg = np.argsort(d2g, axis=1, kind="stable")[:, :cp]
                probe = np.zeros((nr, n_grp), dtype=bool)
                probe[np.arange(nr)[:, None], topg] = True
                # level 2 — exact d2 to the fine cells of the probed
                # groups only, gathered group-major so every matmul
                # stays vectorized
                rows_l, cells_l, d2_l = [], [], []
                for g in range(n_grp):
                    r = np.nonzero(probe[:, g])[0]
                    M = members[g]
                    if not len(r) or not len(M):
                        continue
                    d2f = (
                        x_sq[r][:, None]
                        - 2.0 * (xc[r] @ Cm[M].T)
                        + csq[M][None, :]
                    )
                    rows_l.append(np.repeat(r, len(M)))
                    cells_l.append(np.tile(M, len(r)))
                    d2_l.append(d2f.ravel())
                if not rows_l:
                    continue
                rows = np.concatenate(rows_l)
                cells = np.concatenate(cells_l)
                d2s = np.concatenate(d2_l)
                # exact (d2, cell) rank per row via one lexsort — no
                # argpartition boundary-tie caveat: ties at the nprobe
                # cut break by cell id, matching the SQL row_number
                order = np.lexsort((cells, d2s, rows))
                rows_s = rows[order]
                cells_s = cells[order]
                d2_s = d2s[order]
                first = np.empty(len(rows_s), dtype=bool)
                first[:1] = True
                first[1:] = rows_s[1:] != rows_s[:-1]
                idx = np.arange(len(rows_s))
                fidx = np.maximum.accumulate(np.where(first, idx, 0))
                rank = idx - fidx
                # margin cap vs the best PROBED cell: explicit t*t,
                # not t**2 (Python ** routes through C pow(), not
                # guaranteed ulp-identical to the SQL twin's multiply)
                t = np.sqrt(np.maximum(d2_s[fidx], 0.0)) + mq
                keep = (rank < p) & (d2_s <= t * t)
                a_cell.append(cells_s[keep])
                a_idx.append(rows_s[keep] + r0)
                a_home.append(rank[keep] == 0)
            o_cell = np.concatenate(a_cell) if a_cell else np.array([], dtype=np.int64)
            o_idx = (
                np.concatenate(a_idx) if a_idx else np.array([], dtype=np.int64)
            )
            o_home = (
                np.concatenate(a_home) if a_home else np.array([], dtype=bool)
            )
            dim = X.shape[1]
            out_v = X[o_idx]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_cell.astype(np.int64, copy=False)),
                    ids_arrow.take(pa.array(o_idx, type=pa.int64())),
                    pa.array(o_home),
                    pa.ListArray.from_arrays(
                        pa.array(
                            np.arange(len(o_idx) + 1, dtype=np.int64)
                            * dim,
                            type=pa.int32(),
                        ),
                        pa.array(
                            out_v.reshape(-1), type=pa.float64()
                        ),
                    ),
                ],
                names=["cell", "_id", "_home", "_v"],
            )

    return route


def _ivf_cell_pairs_fn(eps: float, max_block: int):
    """applyInArrow per-cell verify-kernel factory. Full mode emits
    every within-cell ε-pair (canonical l_id < r_id, home-flag
    dedup); when the input carries a ``_new`` boolean column the
    kernel runs INCREMENTALLY — left side restricted to new rows, so
    settled pool×pool pairs are never recomputed. r11 session 2
    (guide §4.2): per-group Arrow tables instead of pandas frames —
    vectors come in as one flat-buffer reshape, pairs go out as plain
    Arrow arrays; the verify arithmetic (normalized prefilter matmul
    + exact fold recompute for survivors) is unchanged."""
    import numpy as np
    import pyarrow as pa

    def cell_pairs(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        id_arr = tbl.column("_id").combine_chunks()
        ids = id_arr.to_numpy(zero_copy_only=False)
        home = tbl.column("_home").to_numpy(zero_copy_only=False)
        inc = "_new" in tbl.column_names
        newm = (
            tbl.column("_new").to_numpy(zero_copy_only=False)
            if inc
            else None
        )
        X = _arrow_vec_matrix(tbl.column("_v").combine_chunks(), n, np)
        # fold-order norms: sequential over dims, vectorized over rows
        # (bit-identical to V.norm / norm_sql)
        acc = np.zeros(len(X), dtype=np.float64)
        for j in range(X.shape[1]):
            acc = acc + X[:, j] * X[:, j]
        norms = np.sqrt(acc)
        Xn = X / np.maximum(norms, 1e-300)[:, None]
        out_l, out_r, out_d = [], [], []

        def emit(gi, gj):
            if not len(gi):
                return
            swap = ids[gi] > ids[gj]
            gi[swap], gj[swap] = gj[swap], gi[swap]
            # exact fold-order dot on the ORIGINAL doubles for
            # survivors: sequential over dims, vectorized over
            # pairs — replays the Catalyst/DuckDB fold exactly
            dot = np.zeros(len(gi), dtype=np.float64)
            A, B = X[gi], X[gj]
            for jd in range(X.shape[1]):
                dot = dot + A[:, jd] * B[:, jd]
            dist = 1.0 - dot / (norms[gi] * norms[gj])
            dist = np.clip(dist, 0.0, 1.0)
            ok = dist <= eps
            out_l.append(ids[gi][ok])
            out_r.append(ids[gj][ok])
            out_d.append(dist[ok])

        if inc:
            # incremental: left = NEW rows only, right = all rows in
            # the cell — settled pool×pool pairs are never recomputed
            # (the reference's new×(pool∪new) block shape,
            # clustering.py:88-118). A new×new pair is seen from both
            # endpoints: the id order keeps exactly one.
            L = np.nonzero(newm)[0]
            for i0 in range(0, len(L), max_block):
                li = L[i0: i0 + max_block]
                for j0 in range(0, len(X), max_block):
                    j1 = min(j0 + max_block, len(X))
                    d = 1.0 - Xn[li] @ Xn[j0:j1].T
                    ii, rj = np.nonzero(d <= eps + 1e-9)
                    gi, gj = li[ii], rj + j0
                    keep = (
                        (ids[gi] != ids[gj])
                        & (home[gi] | home[gj])
                        & (~newm[gj] | (ids[gi] < ids[gj]))
                    )
                    emit(gi[keep], gj[keep])
        else:
            for i0 in range(0, len(X), max_block):
                i1 = min(i0 + max_block, len(X))
                for j0 in range(i0, len(X), max_block):
                    j1 = min(j0 + max_block, len(X))
                    d = 1.0 - Xn[i0:i1] @ Xn[j0:j1].T
                    li, rj = np.nonzero(d <= eps + 1e-9)
                    gi, gj = li + i0, rj + j0
                    if j0 == i0:
                        # diagonal block: both orientations present in
                        # the nonzero — the id order keeps exactly one
                        keep = (ids[gi] < ids[gj]) & (
                            home[gi] | home[gj]
                        )
                    else:
                        # off-diagonal block: each cross pair appears
                        # ONCE (block (j0, i0) is never iterated), in
                        # whichever orientation the block order gave
                        # it — canonicalize in emit() instead of
                        # filtering, or pairs whose smaller id lives
                        # in the later block are lost
                        keep = (ids[gi] != ids[gj]) & (
                            home[gi] | home[gj]
                        )
                    emit(gi[keep], gj[keep])
        idt = id_arr.type
        if not out_l:
            return pa.table(
                {
                    "l_id": pa.array([], type=idt),
                    "r_id": pa.array([], type=idt),
                    "dist": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "l_id": pa.array(np.concatenate(out_l)).cast(idt),
                "r_id": pa.array(np.concatenate(out_r)).cast(idt),
                "dist": pa.array(
                    np.concatenate(out_d), type=pa.float64()
                ),
            }
        )

    return cell_pairs


def ivf_epsilon_pairs(
    df: DataFrame,
    eps: float,
    id_col: str = "row_id",
    vec_col: str = "centroid",
    sample_mod: int = 64,
    nprobe: int = 8,
    cprobe: int = 32,
    margin: float | None = None,
    max_block: int = 4096,
    both_directions: bool = True,
) -> DataFrame:
    """ε-pair self-join via IVF cells with margin-capped multiprobe
    (r09 verdict item 1: the scale-stable index past sign-LSH's L=8
    recall ceiling). Output contract matches brute_force_pairs /
    lsh_candidate_pairs symmetric mode: both directions, no
    self-pairs, exact ``dist``; false positives are structurally
    impossible (every candidate is exact-verified).

    **Index.** The codebook is a hash-stride SAMPLE OF THE DATA
    (ivf_centroid_ids, expected n/sample_mod points) — no Lloyd
    float fitting, so the whole index is deterministic relational
    algebra both engines can replay. Routing is TWO-LEVEL (r10
    verdict item 1: one-level ranking was n·k·dim = O(n²·dim/
    sample_mod) total FLOPs with k ∝ n — quadratic CPU, the last
    scale-killer term in the flagship path). Level 1: coarse
    centroids are every isqrt(k)-th row of the cell-id-ordered
    codebook (kc ≈ √k of them), each fine cell is assigned to its
    nearest coarse centroid, and a point ranks only the kc coarse
    rows, keeping its top-``cprobe`` groups. Level 2: the point
    ranks the fine cells INSIDE those groups (expected cprobe·√k of
    them) and probes its top-``nprobe``, margin-filtered. Per-point
    routing work is (kc + cprobe·k/kc)·dim ≈ (1+cprobe)·√k·dim —
    n^1.5 total instead of n², and at probe scales the matmuls are
    no longer the wall. The default cprobe=32 is recall-first:
    tools/ivf_scale_probe.py measures 0.98/0.94/0.92 at 50k/500k/5M
    with BOTH probe depths fixed (cprobe=8 is ~2x faster at 5M but
    drops to 0.855 there — use it when approximate recall is
    acceptable). When cprobe ≥ kc every group is probed and
    the index degrades EXACTLY to one-level semantics (the fine
    ranking then runs over all k cells), so small inputs keep the
    old behavior bit-for-bit. All distances at both levels are
    quantized integer squared euclidean (components scaled by
    IVF_QUANT and half-up rounded; dim·(Q·|x|)² stays under 2^53,
    so numpy BLAS on integer-valued doubles and DuckDB's
    array_inner_product produce the SAME exact integers in any
    summation order — routing has zero float ambiguity), ties broken
    by (d2, id) at every level. The margin filter drops probed cells
    beyond sqrt(d2_home) + Q·(sqrt(2·eps) + slack), where d2_home is
    the best PROBED cell: cells beyond it cannot host an ε-pair
    completion (triangle inequality on ~unit-norm inputs), so on
    cluster-structured corpora the probe list collapses to ~1 cell;
    on sphere-filling corpora the cap bounds cost and recall is the
    measured quantity (tools/ivf_scale_probe.py).

    **Why this breaks the LSH decade ceiling.** Sign-LSH holds
    recall by growing tables L (2→3→8 across the r09 probe's two
    decades — saturated at the L=8 cap, cluster.py signlsh_tables).
    Here a pair is found iff one endpoint's home cell is in the
    other's top-``nprobe`` probe list; as n grows, cells shrink only
    like k^(-1/dim) (k ∝ n at fixed sample_mod), so the probe-rank
    of a true neighbor's home cell is ~scale-invariant — recall
    needs no growing knob. tools/ivf_scale_probe.py measures exactly
    this across 50k/500k/5M.

    **Scale shape.** Routing: one row-chunked BLAS pass against the
    broadcast codebook, zero shuffle, n·(1+cprobe)·√k·dim flops
    (two-level, above). One data
    shuffle routes each vector to <= nprobe cells (<= nprobe·n rows;
    margin typically prunes far below the cap). Verification runs
    inside each cell as a blocked numpy kernel (semdedup's bounded-
    quadratic shape): per-cell m² cosines with m ~ sample_mod·probe
    fan-out; candidates never materialize into a shuffle — only
    verified ε-pairs leave the kernel, so post-kernel traffic is
    answer-bound (one dropDuplicates for the <= 2 cells that can
    both emit a pair). Skew honesty: the largest cell bounds one
    task's wall (``max_block`` chunking keeps memory flat); a
    pathological single-cell corpus degrades to the exact quadratic
    in one task — same answer, no memory cliff.

    **Exactness of dist.** The kernel prefilters with a normalized
    fp64 matmul at eps + 1e-9, then recomputes survivors with the
    SAME left-to-right index-ordered fold as V.cosine_distance /
    cosine_distance_sql (vectorized across pairs, sequential across
    dims — bit-identical doubles), so emitted distances equal the
    Catalyst/DuckDB expression exactly and full value-level oracles
    hold (plans/catalog_cluster.q_cluster_ivf*)."""
    spark = df.sparkSession
    id_type = dict(df.dtypes)[id_col]
    out_schema = f"l_id {id_type}, r_id {id_type}, dist double"
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).where(F.col("_v").isNotNull())
    cent_rows = (
        ivf_centroid_ids(base, "_id", sample_mod)
        .orderBy("_id")
        .collect()
    )
    if not cent_rows:
        # stride hit nothing (tiny input): every row is its own cell
        cent_rows = base.orderBy("_id").collect()
    if not cent_rows:
        return spark.createDataFrame([], out_schema)
    prep = _ivf_prep_from_vecs(
        [r["_v"] for r in cent_rows], eps, margin, nprobe, cprobe
    )
    bc = spark.sparkContext.broadcast(prep["arrays"])
    p, cp, mq = prep["p"], prep["cp"], prep["mq"]

    par = spark.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < par:
        base = base.repartition(par)

    # r11 NOTE (guide §1.1 — measured, kept as-is): a broadcast-
    # lookup variant (route emits (cell, id, home) only; the cell
    # kernel gathers vectors from a python broadcast, the same trick
    # that won 2x in the LSH verify) was A/B'd here and REJECTED:
    # 1.91s -> 3.77s at the bench corpus. The routed fan-out is only
    # ~7x corpus bytes, so the saved shuffle (~60 MB) was smaller
    # than the per-task broadcast deserialization it added; the LSH
    # win came from replacing ~2 GB of per-candidate Arrow traffic.
    routed = base.mapInArrow(
        _ivf_route_fn(bc, p, cp, mq),
        schema=f"cell long, _id {id_type}, _home boolean, "
        "_v array<double>",
    )

    verified = (
        routed.groupBy("cell")
        .applyInArrow(
            _ivf_cell_pairs_fn(eps, max_block), schema=out_schema
        )
        # a pair can surface in home(u) AND home(v) — answer-bound dedup
        .dropDuplicates(["l_id", "r_id"])
    )
    if not both_directions:
        # canonical half only (l_id < r_id). Callers that aggregate or
        # join on canonical pairs should prefer this: the mirror below
        # is a UNION whose branches Catalyst does not share, so a
        # post-union l<r filter would run the verify kernel twice
        # (and the r10 sf10 probe OOMed materializing the mirrored
        # 214M-row set it was about to filter back down)
        return verified
    return verified.unionAll(
        verified.select(
            F.col("r_id").alias("l_id"),
            F.col("l_id").alias("r_id"),
            "dist",
        )
    )


def similarity_pairs(
    left: DataFrame,
    right: DataFrame,
    eps: float = DEFAULT_EPS,
    id_col: str = "row_id",
    vec_col: str = "centroid",
    strategy: str = "auto",
    dim: int | None = None,
) -> DataFrame:
    n_right = None
    if strategy == "auto":
        n_right = right.count()
        strategy = (
            "cross" if left.count() + n_right <= LSH_THRESHOLD else "lsh"
        )
    if strategy == "cross":
        return brute_force_pairs(left, right, eps, id_col, vec_col)
    if strategy == "lsh":
        # reuse the auto-sizing count so lsh param selection doesn't
        # re-evaluate the (possibly UDF-bearing) right-side lineage
        return lsh_candidate_pairs(
            left, right, eps, id_col, vec_col, n_rows=n_right, dim=dim
        )
    if strategy == "ivf":
        # self-join index: ivf_epsilon_pairs routes ONE corpus against
        # its own codebook, so a caller passing a distinct right side
        # would silently get left×left — refuse instead
        same = left is right
        if not same:
            try:
                same = bool(
                    left._jdf.queryExecution().analyzed().sameResult(
                        right._jdf.queryExecution().analyzed()
                    )
                )
            except Exception:
                same = False
        if not same:
            raise ValueError(
                "strategy='ivf' is a self-join index: left and right "
                "must be the same DataFrame (use 'lsh' or 'cross' for "
                "two-sided joins)"
            )
        return ivf_epsilon_pairs(
            left, eps, id_col=id_col, vec_col=vec_col
        )
    raise ValueError(f"unknown strategy {strategy!r}")


# --- connected components (M3 core) ----------------------------------


def union_find_components(v_pdf, e_pdf):
    """Pure union-find core: pandas Series ``vid`` + edge frame with
    ``l_id``/``r_id`` -> pandas DataFrame (vid, component) where
    component = minimum member id. Path-halving + union-by-size,
    O(E α(V)). Factored out of the Spark wrapper so it is directly
    property-testable against a reference BFS."""
    import pandas as pd

    codes, uniques = pd.factorize(
        pd.concat(
            [v_pdf["vid"], e_pdf["l_id"], e_pdf["r_id"]], ignore_index=True
        )
    )
    nv = len(v_pdf)
    parent = list(range(len(uniques)))
    size = [1] * len(uniques)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    lc = codes[nv : nv + len(e_pdf)]
    rc = codes[nv + len(e_pdf) :]
    for u, w in zip(lc.tolist(), rc.tolist()):
        ru, rw = find(u), find(w)
        if ru == rw:
            continue
        if size[ru] < size[rw]:
            ru, rw = rw, ru
        parent[rw] = ru
        size[ru] += size[rw]
    roots = [find(c) for c in codes[:nv].tolist()]
    out = pd.DataFrame({"vid": v_pdf["vid"], "_root": roots})
    comp = out.groupby("_root")["vid"].transform("min")
    return pd.DataFrame({"vid": out["vid"], "component": comp})


def _local_connected_components(
    vertices: DataFrame, edges: DataFrame, id_col: str
) -> DataFrame:
    """Union-find on the driver for graphs under the LOCAL_CC_* gates.

    Exact same contract as the distributed path: component = minimum
    member id (string ids compare lexicographically in both engines)."""
    v_pdf = vertices.select(F.col(id_col).alias("vid")).toPandas()
    e_pdf = edges.select("l_id", "r_id").toPandas()
    spark = vertices.sparkSession
    out = union_find_components(v_pdf, e_pdf)
    vid_field = vertices.select(F.col(id_col).alias("vid")).schema[0]
    schema = T.StructType(
        [vid_field, T.StructField("component", vid_field.dataType, True)]
    )
    return spark.createDataFrame(out, schema=schema).select(
        F.col("vid").alias(id_col), "component"
    )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "row_id",
    max_iterations: int = 50,
    method: str = "auto",
) -> DataFrame:
    """Connected components by graph contraction with pointer doubling.

    vertices: one column ``id_col``; edges: ``l_id``/``r_id``
    (direction-free). Per round:

      1. m(u) = min(u, min neighbor)          (one groupBy over E)
      2. m    = m ∘ m                          (pointer doubling — halves
                                                chain lengths, O(log n)
                                                rounds on paths)
      3. labels.comp = m(labels.comp)          (mapping composition)
      4. E   = {(m(u), m(v)) | (u,v) ∈ E, m(u) ≠ m(v)} distinct

    Dense components collapse to self-loops after the first round, so
    unlike plain hash-min the big edge set is joined ONCE — the edge
    list shrinks geometrically. Chains are handled by FULL path
    compression of the pointer map inside each round (m := m∘m to a
    fixpoint, log₂(chain) cheap self-joins of the small map — without
    it a path graph shrinks by O(1) per round and a 40-node chain
    takes ~15 expensive rounds). Lineage is cut per round with
    localCheckpoint. Output: (id_col, component).

    ``method``: 'auto' gates on LOCAL_CC_EDGES/LOCAL_CC_VERTICES and
    picks 'local' (driver union-find) or 'distributed' (contraction).
    """
    e0 = edges.select("l_id", "r_id").localCheckpoint(eager=True)
    if method == "auto":
        method = (
            "local"
            if e0.count() <= LOCAL_CC_EDGES
            and vertices.count() <= LOCAL_CC_VERTICES
            else "distributed"
        )
    if method == "local":
        return _local_connected_components(vertices, e0, id_col)
    sym = e0.union(
        e0.select(
            F.col("r_id").alias("l_id"), F.col("l_id").alias("r_id")
        )
    )
    labels = vertices.select(
        F.col(id_col).alias("vid"), F.col(id_col).alias("component")
    )
    e = sym.localCheckpoint(eager=True)
    for _ in range(max_iterations):
        if e.limit(1).count() == 0:
            break
        # 1. min over neighbors, self included
        m = (
            e.groupBy("l_id")
            .agg(F.min("r_id").alias("m"))
            .select("l_id", F.least("l_id", "m").alias("m"))
            .localCheckpoint(eager=True)
        )
        # 2. full path compression: m := m∘m until fixpoint. Change
        # detection rides along inside the composition join (exact and
        # type-agnostic — vertex ids may be strings; a numeric sum
        # would break on string ids, and hash-sums overflow under
        # ANSI mode).
        for _ in range(60):
            m2 = m.select(F.col("l_id").alias("_k"), F.col("m").alias("_v"))
            composed = (
                m.join(m2, m.m == m2._k, "left")
                .select(
                    "l_id",
                    F.coalesce("_v", "m").alias("m"),
                    (F.col("_v").isNotNull() & (F.col("_v") != F.col("m"))).alias(
                        "_ch"
                    ),
                )
                .localCheckpoint(eager=True)
            )
            changed = composed.where("_ch").limit(1).count()
            m = composed.drop("_ch")
            if changed == 0:
                break
        # 3. compose into the vertex mapping
        labels = (
            labels.join(m, labels.component == m.l_id, "left")
            .select(
                "vid", F.coalesce("m", "component").alias("component")
            )
            .localCheckpoint(eager=True)
        )
        # 4. contract the edge set
        ml = m.select(F.col("l_id").alias("_u"), F.col("m").alias("_mu"))
        mr = m.select(F.col("l_id").alias("_w"), F.col("m").alias("_mw"))
        e = (
            e.join(ml, e.l_id == ml._u)
            .join(mr, e.r_id == mr._w)
            .select(
                F.col("_mu").alias("l_id"), F.col("_mw").alias("r_id")
            )
            .where(F.col("l_id") != F.col("r_id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    return labels.select(F.col("vid").alias(id_col), "component")


# --- batch clustering (flagship composition) -------------------------


def cluster_batch(
    df: DataFrame,
    id_col: str = "id",
    vec_col: str = "embedding",
    eps: float = DEFAULT_EPS,
    strategy: str = "auto",
) -> DataFrame:
    """Batch ε-graph clustering of one embedded table.

    Output: (id_col, cluster_rep, is_cluster) where cluster_rep is the
    minimum member id of the component (DBSCAN label surrogate) and
    is_cluster is True for components of size >= 2 (min_samples=2
    noise rule: singletons are noise / remain singleton rows).

    The projected nodes are materialized once (localCheckpoint):
    edge generation, the CC iterations, and the size join each re-read
    them, and without the cut an upstream embedding UDF would be
    recomputed per action.
    """
    nodes = df.select(id_col, vec_col).localCheckpoint(eager=True)
    if strategy == "auto":
        # resolve here (one count on the checkpointed nodes) so
        # similarity_pairs doesn't re-count both sides
        strategy = "cross" if nodes.count() * 2 <= LSH_THRESHOLD else "lsh"
    if strategy == "cross":
        # self-join: emit each undirected edge once, no distance column
        # (CC symmetrizes internally) — halves the Arrow/checkpoint
        # volume of dense graphs
        edges = brute_force_pairs(
            nodes, nodes, eps, id_col=id_col, vec_col=vec_col,
            upper_only=True, with_dist=False,
        )
    else:
        edges = similarity_pairs(
            nodes, nodes, eps, id_col=id_col, vec_col=vec_col,
            strategy=strategy,
        )
    comp = connected_components(nodes.select(id_col), edges, id_col=id_col)
    sizes = comp.groupBy("component").agg(F.count("*").alias("_n"))
    return (
        comp.join(sizes, "component")
        .select(
            id_col,
            F.col("component").alias("cluster_rep"),
            (F.col("_n") >= 2).alias("is_cluster"),
        )
    )


def dbscan(
    df: DataFrame,
    id_col: str = "id",
    vec_col: str = "embedding",
    eps: float = DEFAULT_EPS,
    min_samples: int = 4,
    strategy: str = "cross",
) -> DataFrame:
    """Full DBSCAN (Ester et al. 1996) at arbitrary ``min_samples`` —
    the general form of the reference's min_samples=2 configuration
    (business_logic/clustering/, where every ε-connected point is
    core and [[cluster_batch]]'s component labeling is exact). At
    min_samples > 2 the core/border/noise distinction appears:

      core   — |N_eps(p)| >= min_samples, the point itself included
               (so neighbor-degree >= min_samples − 1);
      border — non-core with at least one core ε-neighbor; joins the
               cluster of its MINIMUM-labeled core neighbor
               (a deterministic pick where the textbook algorithm is
               order-dependent — border points reachable from two
               clusters are assigned by label order, not scan order);
      noise  — everything else (cluster NULL).

    Clusters are connected components over CORE-CORE ε-edges only
    (textbook density-reachability restricted to cores), labeled by
    the component's minimum core id. Shape: one ε-pair join (the
    same brute-force/LSH machinery as cluster_batch), one degree
    groupBy, CC on the core subgraph (geometrically contracting),
    one border attach join. Output: (id_col, role, cluster).
    """
    nodes = df.select(id_col, vec_col).localCheckpoint(eager=True)
    if strategy == "cross":
        edges = brute_force_pairs(
            nodes, nodes, eps, id_col=id_col, vec_col=vec_col,
            upper_only=True, with_dist=False,
        )
    else:
        edges = similarity_pairs(
            nodes, nodes, eps, id_col=id_col, vec_col=vec_col,
            strategy=strategy,
        ).where(F.col("l_id") < F.col("r_id")).select("l_id", "r_id")
    edges = edges.localCheckpoint(eager=True)
    sym = edges.unionByName(
        edges.select(
            F.col("r_id").alias("l_id"), F.col("l_id").alias("r_id")
        )
    )
    deg = sym.groupBy("l_id").agg(F.count(F.lit(1)).alias("_deg"))
    roles = (
        nodes.select(id_col)
        .join(deg.withColumnRenamed("l_id", id_col), id_col, "left")
        .select(
            id_col,
            (
                F.coalesce("_deg", F.lit(0)) >= F.lit(min_samples - 1)
            ).alias("_core"),
        )
        .localCheckpoint(eager=True)
    )
    cores = roles.where("_core").select(id_col)
    core_edges = (
        edges.join(
            cores.withColumnRenamed(id_col, "l_id"), "l_id", "left_semi"
        )
        .join(
            cores.withColumnRenamed(id_col, "r_id"), "r_id", "left_semi"
        )
    )
    comp = connected_components(cores, core_edges, id_col=id_col)
    core_lbl = comp.select(
        F.col(id_col).alias("_cid"), F.col("component").alias("_cluster")
    ).localCheckpoint(eager=True)
    # border attach: min core-neighbor CLUSTER LABEL per non-core id
    border = (
        sym.join(
            core_lbl, sym.r_id == core_lbl._cid
        )
        .groupBy("l_id")
        .agg(F.min("_cluster").alias("_bcluster"))
    )
    return (
        roles.join(
            core_lbl.withColumnRenamed("_cid", id_col), id_col, "left"
        )
        .join(border.withColumnRenamed("l_id", id_col), id_col, "left")
        .select(
            id_col,
            F.when(F.col("_core"), F.lit("core"))
            .when(F.col("_bcluster").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.when(F.col("_core"), F.col("_cluster"))
            .otherwise(F.col("_bcluster"))
            .alias("cluster"),
        )
    )


def centroids(
    df: DataFrame,
    member_col: str = "cluster_rep",
    vec_col: str = "embedding",
) -> DataFrame:
    """A2: per-cluster mean vector, computed distributed by exploding
    vector positions (no collect; scales to any cluster size).
    Output: (member_col, centroid array<double>)."""
    exploded = df.select(
        member_col, F.posexplode(F.col(vec_col)).alias("pos", "val")
    )
    means = exploded.groupBy(member_col, "pos").agg(
        F.avg(F.col("val").cast("double")).alias("mean")
    )
    return (
        means.groupBy(member_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "mean"))
            ).alias("_pm")
        )
        .select(
            member_col,
            F.transform(F.col("_pm"), lambda s: s["mean"]).alias("centroid"),
        )
    )


# --- incremental pool update (M3 stateful step) ----------------------


def incremental_cluster_update(
    state: DataFrame,
    batch: DataFrame,
    eps: float = DEFAULT_EPS,
    strategy: str = "auto",
    batch_id_col: str = "id",
    batch_vec_col: str = "embedding",
    dim: int | None = None,
) -> dict[str, DataFrame]:
    """One reference micro-batch step (process_records.py:283-445).

    state: CLUSTER_STATE_SCHEMA table (row_id, cluster_id, article_ids,
    is_cluster, centroid). batch: new articles with embeddings and a
    deterministic arrival order on ``batch_id_col``.

    Returns {"state": new_state, "updates": cluster_updates} where
    updates carries one row per touched cluster for the serving-table
    merge (op=INSERT for brand-new rows, MODIFY for grown clusters).
    """
    max_row = state.agg(F.coalesce(F.max("row_id"), F.lit(0))).collect()[0][0]

    # Idempotence on article_id (SURVEY §7.4 risk 5): drop re-delivered
    # articles already tracked anywhere in the pool, so at-least-once
    # replay cannot double-count (the reference only dedups within a
    # batch — process_records.py:77-83 — and would double-count here).
    known = state.select(
        F.explode("article_ids").alias(batch_id_col)
    ).distinct()
    batch = batch.join(known, batch_id_col, "left_anti")

    # Arrival order -> pool positions after the existing rows
    # (reference label_tracker.extend, process_records.py:321-327).
    new_rows = (
        batch.select(
            F.col(batch_id_col).alias("article_id"),
            F.col(batch_vec_col).cast("array<double>").alias("centroid"),
        )
        .withColumn(
            "row_id",
            F.row_number().over(Window.orderBy("article_id")) + F.lit(max_row),
        )
        .select(
            "row_id",
            F.concat(F.lit("c-"), F.col("article_id")).alias("cluster_id"),
            F.array("article_id").alias("article_ids"),
            F.lit(False).alias("is_cluster"),
            "centroid",
        )
    )
    new_rows = new_rows.localCheckpoint(eager=True)

    pool = state.unionByName(new_rows)
    # Fresh edges: new × (pool ∪ new) only — settled pairs not revisited.
    edges = similarity_pairs(
        new_rows, pool, eps, id_col="row_id", vec_col="centroid",
        strategy=strategy, dim=dim,
    )
    comp = connected_components(pool.select("row_id"), edges, id_col="row_id")

    sizes = comp.groupBy("component").agg(F.count("*").alias("_n"))
    labeled = (
        pool.join(comp, "row_id")
        .join(sizes, "component")
    )

    multi = labeled.where(F.col("_n") >= 2)
    single = labeled.where(F.col("_n") < 2)

    # Representative = lowest row_id in component.
    rep_w = Window.partitionBy("component").orderBy("row_id")
    multi = multi.withColumn("_rank", F.row_number().over(rep_w))

    reps = multi.where(F.col("_rank") == 1)
    absorbed = multi.where((F.col("_rank") > 1) & (~F.col("is_cluster")))
    kept_clusters = multi.where((F.col("_rank") > 1) & F.col("is_cluster"))

    # Centroid = mean of pool-row vectors in the component (A2).
    cent = centroids(
        multi.select("component", "centroid"),
        member_col="component",
        vec_col="centroid",
    ).withColumnRenamed("centroid", "new_centroid")

    gained = (
        absorbed.groupBy("component")
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("row_id", "article_ids"))
                ).getField("article_ids")
            ).alias("gained_articles")
        )
    )

    updated_reps = (
        reps.join(cent, "component")
        .join(gained, "component", "left")
        .select(
            "row_id",
            "cluster_id",
            F.concat(
                F.col("article_ids"),
                F.coalesce(
                    F.col("gained_articles"),
                    F.array().cast("array<string>"),
                ),
            ).alias("article_ids"),
            F.lit(True).alias("is_cluster"),
            F.col("new_centroid").alias("centroid"),
        )
    )

    new_state = (
        updated_reps
        .unionByName(
            kept_clusters.select(
                "row_id", "cluster_id", "article_ids", "is_cluster", "centroid"
            )
        )
        .unionByName(
            single.select(
                "row_id", "cluster_id", "article_ids", "is_cluster", "centroid"
            )
        )
    )

    # op semantics follow the reference change feed: INSERT when the
    # cluster first forms (its rep was new or a mere singleton — no
    # metadata row exists yet), MODIFY when an existing cluster grew.
    updates = (
        updated_reps.join(
            state.where(F.col("is_cluster")).select(
                "row_id", F.lit(True).alias("_existed")
            ),
            "row_id",
            "left",
        )
        .select(
            F.when(F.col("_existed").isNotNull(), F.lit("MODIFY"))
            .otherwise(F.lit("INSERT"))
            .alias("op"),
            F.col("cluster_id").alias("PK"),
            F.concat(F.lit("#METADATA#"), F.col("cluster_id")).alias("SK"),
            F.lit("metadata").alias("type"),
            F.size("article_ids").cast("long").alias("number_of_articles"),
            F.col("article_ids"),
        )
    )
    return {"state": new_state, "updates": updates}


def compact_pool(
    state: DataFrame,
    eps: float = DEFAULT_EPS,
    strategy: str = "auto",
    dim: int | None = None,
) -> dict[str, DataFrame]:
    """Pool-maintenance sweep (r11 scale extension — an explicit
    periodic job, NOT a per-batch reference step): full ε-graph
    re-cluster of the POOL ROWS only, merging what the per-batch
    semantics can never merge.

    Why it exists: the reference keeps ``is_cluster`` rows forever
    (process_records.py:386-416 — ``to_remove`` skips is_cluster
    rows), so with APPROXIMATE candidate joins above LSH_THRESHOLD a
    missed link at family-formation time is a PERMANENT split. The
    r11 500k streaming soak measured it: 41,638 pool rows for 20,000
    planted families (8.3% of rows ingested) after 50 sign-LSH
    batches — strays and split clusters accumulate because a miss at
    formation is never revisited. The pool is O(clusters), tiny
    relative to the corpus, so an exact (≤ LSH_THRESHOLD) or IVF
    exact-verified self-join over it costs seconds — running this
    sweep every N batches (or offline) re-pins the pool at the true
    family count. Same maintenance shape as the dedup stream's
    compact_epochs.

    Merge semantics extend the reference's batch rules: representative
    = lowest row_id in the component; article_ids concatenate in
    row_id order (rep's own first); centroid = mean of the member
    POOL-ROW vectors (each pool row one vote — A2's centroids-count-
    once rule); every merged component is a cluster. Singleton
    components keep their row unchanged.

    Returns {"state", "remaps", "updates"}: ``remaps``
    (old_pk, new_pk) re-points serving rows of absorbed clusters;
    ``updates`` carries (PK, number_of_articles, article_ids) for the
    surviving reps — the merge_cluster_metadata shape."""
    state_cols = [
        "row_id", "cluster_id", "article_ids", "is_cluster", "centroid",
    ]
    if strategy == "auto":
        strategy = "cross" if state.count() <= LSH_THRESHOLD else "ivf"
    if strategy == "ivf":
        edges = ivf_epsilon_pairs(
            state, eps, id_col="row_id", vec_col="centroid",
            both_directions=False,
        )
    else:
        edges = similarity_pairs(
            state, state, eps, id_col="row_id", vec_col="centroid",
            strategy=strategy, dim=dim,
        )
    comp = connected_components(
        state.select("row_id"), edges, id_col="row_id"
    )
    sizes = comp.groupBy("component").agg(F.count("*").alias("_n"))
    labeled = state.join(comp, "row_id").join(sizes, "component")
    single = labeled.where(F.col("_n") < 2).select(*state_cols)
    multi = labeled.where(F.col("_n") >= 2)
    rep_w = Window.partitionBy("component").orderBy("row_id")
    multi = multi.withColumn("_rank", F.row_number().over(rep_w))
    reps = multi.where(F.col("_rank") == 1)
    absorbed = multi.where(F.col("_rank") > 1)
    cent = centroids(
        multi.select("component", "centroid"),
        member_col="component",
        vec_col="centroid",
    ).withColumnRenamed("centroid", "new_centroid")
    merged_articles = multi.groupBy("component").agg(
        F.flatten(
            F.array_sort(
                F.collect_list(F.struct("row_id", "article_ids"))
            ).getField("article_ids")
        ).alias("all_articles")
    )
    new_reps = (
        reps.join(cent, "component")
        .join(merged_articles, "component")
        .select(
            "row_id",
            "cluster_id",
            F.col("all_articles").alias("article_ids"),
            F.lit(True).alias("is_cluster"),
            F.col("new_centroid").alias("centroid"),
        )
    )
    new_state = new_reps.unionByName(single)
    remaps = absorbed.join(
        reps.select("component", F.col("cluster_id").alias("new_pk")),
        "component",
    ).select(F.col("cluster_id").alias("old_pk"), "new_pk")
    updates = new_reps.select(
        F.col("cluster_id").alias("PK"),
        F.size("article_ids").cast("long").alias("number_of_articles"),
        "article_ids",
    )
    return {"state": new_state, "remaps": remaps, "updates": updates}
