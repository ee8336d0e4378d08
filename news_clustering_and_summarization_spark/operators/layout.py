"""Z-order (Morton) data layout keys — the multi-dimensional
clustering lever behind Delta/Iceberg OPTIMIZE ZORDER: interleave the
bits of several dimensions so range predicates on ANY of them prune
file-level min/max stats (sources/tables.py stats_skipping shows the
pruning side; this produces the layout that makes it effective on
more than one column).

Everything is integer arithmetic — normalization is an integer
rescale against broadcast min/max aggregates, interleaving is a sum
of shifted bit tests — so the DuckDB oracle replays the keys
bit-for-bit. At 100 TB the flow is: compute zkey (zero-shuffle
projection after one tiny stats aggregate), repartitionByRange(zkey)
at write time, and let every engine's stats-based skipping do the
rest; the per-bucket min/max spans this module reports are exactly
the footer stats a scan would prune on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key_expr", "zorder_layout_stats"]


def _interleave_sql(x: str, y: str, bits: int, idiv: str) -> str:
    """SQL expression interleaving ``bits`` low bits of x (even
    positions) and y (odd positions). ``idiv`` is the dialect's
    integer-division operator: Spark spells it DIV, DuckDB // —
    everything else (%, *, +) is shared."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x}) {idiv} {1 << b}) % 2) * {1 << (2 * b)}")
        terms.append(f"((({y}) {idiv} {1 << b}) % 2) * {1 << (2 * b + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_key_expr(
    x: str, y: str, x_min: str, x_max: str, y_min: str, y_max: str,
    bits: int = 8,
    idiv: str = "//",
) -> str:
    """SQL expression for the z-order key of (x, y) normalized to
    ``bits``-bit grids against the given min/max expressions. Integer
    throughout: q = ((v - lo) * (2^bits - 1)) idiv max(hi - lo, 1)."""
    top = (1 << bits) - 1
    xq = (f"((({x}) - ({x_min})) * {top} {idiv} "
          f"greatest(({x_max}) - ({x_min}), 1))")
    yq = (f"((({y}) - ({y_min})) * {top} {idiv} "
          f"greatest(({y_max}) - ({y_min}), 1))")
    return _interleave_sql(xq, yq, bits, idiv)


def zorder_layout_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    bucket_bits: int = 3,
) -> DataFrame:
    """Assign every row its z-order key and report per-z-bucket
    min/max spans of BOTH dimensions — the footer stats a z-ordered
    layout would expose to scan pruning (tight on x AND y, where a
    single-column sort is tight on one and spans the full range of
    the other).

    One 1-row min/max aggregate broadcast into a zero-shuffle key
    projection, then one groupBy over 4^bucket_bits buckets. Output:
    (zbucket, n_rows, x_lo, x_hi, y_lo, y_hi)."""
    stats = df.agg(
        F.min(x_col).cast("long").alias("_xlo"),
        F.max(x_col).cast("long").alias("_xhi"),
        F.min(y_col).cast("long").alias("_ylo"),
        F.max(y_col).cast("long").alias("_yhi"),
    )
    zkey = zorder_key_expr(
        x_col, y_col, "_xlo", "_xhi", "_ylo", "_yhi", bits, idiv="DIV"
    )
    shift = 1 << (2 * bits - 2 * bucket_bits)
    return (
        df.crossJoin(F.broadcast(stats))
        .select(
            F.col(x_col).cast("long").alias("x"),
            F.col(y_col).cast("long").alias("y"),
            F.expr(f"{zkey} DIV {shift}").alias("zbucket"),
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_lo"),
            F.max("x").alias("x_hi"),
            F.min("y").alias("y_lo"),
            F.max("y").alias("y_hi"),
        )
    )


def zorder_layout_stats_sql(
    table: str,
    x_col: str,
    y_col: str,
    bits: int = 8,
    bucket_bits: int = 3,
) -> str:
    zkey = zorder_key_expr(
        f"t.{x_col}::BIGINT",
        f"t.{y_col}::BIGINT",
        "s._xlo",
        "s._xhi",
        "s._ylo",
        "s._yhi",
        bits,
    )
    shift = 1 << (2 * bits - 2 * bucket_bits)
    return f"""
WITH s AS (
  SELECT min({x_col})::BIGINT AS _xlo, max({x_col})::BIGINT AS _xhi,
         min({y_col})::BIGINT AS _ylo, max({y_col})::BIGINT AS _yhi
  FROM {table}
)
SELECT {zkey} // {shift} AS zbucket,
       count(*)::BIGINT AS n_rows,
       min(t.{x_col}::BIGINT) AS x_lo, max(t.{x_col}::BIGINT) AS x_hi,
       min(t.{y_col}::BIGINT) AS y_lo, max(t.{y_col}::BIGINT) AS y_hi
FROM {table} t CROSS JOIN s
GROUP BY 1
"""


# --- Hilbert curve ----------------------------------------------------


def hilbert_steps(bits: int, idiv: str) -> list[tuple[str, str, str]]:
    """Per-level (d_increment, new_x, new_y) SQL templates for the
    standard xy2d walk (the Wikipedia/Hamilton formulation): at each
    scale s = 2^(bits-1) .. 1, read quadrant bits (rx, ry), add
    s²·((3rx) XOR ry) to the key, then rotate/flip the frame. The
    XOR-of-one-bit-values table is spelled as a CASE (0,1,3,2) so no
    dialect bitwise op is needed; bit tests use ``idiv``/% only.

    Templates reference {x} and {y}; the caller chains them
    (column-by-column in Spark, CTE-by-CTE in DuckDB)."""
    steps = []
    n = 1 << bits
    for lvl in range(bits - 1, -1, -1):
        s = 1 << lvl
        rx = f"((({{x}}) {idiv} {s}) % 2)"
        ry = f"((({{y}}) {idiv} {s}) % 2)"
        d_inc = (
            f"{s * s} * (CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
            f"WHEN {rx} = 0 AND {ry} = 1 THEN 1 "
            f"WHEN {rx} = 1 AND {ry} = 1 THEN 2 ELSE 3 END)"
        )
        new_x = (
            f"(CASE WHEN {ry} = 0 THEN "
            f"(CASE WHEN {rx} = 1 THEN {n - 1} - ({{y}}) "
            f"ELSE ({{y}}) END) ELSE ({{x}}) END)"
        )
        new_y = (
            f"(CASE WHEN {ry} = 0 THEN "
            f"(CASE WHEN {rx} = 1 THEN {n - 1} - ({{x}}) "
            f"ELSE ({{x}}) END) ELSE ({{y}}) END)"
        )
        steps.append((d_inc, new_x, new_y))
    return steps


def hilbert_layout_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    bucket_bits: int = 3,
) -> DataFrame:
    """Hilbert-curve layout keys + per-bucket min/max spans — the
    better-locality sibling of zorder_layout_stats (a Hilbert walk
    never jumps across the grid the way Morton's Z-seams do, so
    bucket bounding boxes are tighter and stats-based pruning skips
    more files; same normalize → key → repartitionByRange flow).

    The per-level rotation makes the key stateful, so it unrolls as
    ``bits`` chained projections (still zero-shuffle — Catalyst
    collapses them into one) after the broadcast 1-row min/max
    aggregate. All integer CASE/divide arithmetic — bit-identical
    cross-engine.

    Output: (hbucket, n_rows, x_lo, x_hi, y_lo, y_hi)."""
    top = (1 << bits) - 1
    stats = df.agg(
        F.min(x_col).cast("long").alias("_xlo"),
        F.max(x_col).cast("long").alias("_xhi"),
        F.min(y_col).cast("long").alias("_ylo"),
        F.max(y_col).cast("long").alias("_yhi"),
    )
    base = df.crossJoin(F.broadcast(stats)).select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
        F.expr(
            f"(({x_col} - _xlo) * {top}) DIV greatest(_xhi - _xlo, 1)"
        ).alias("hx"),
        F.expr(
            f"(({y_col} - _ylo) * {top}) DIV greatest(_yhi - _ylo, 1)"
        ).alias("hy"),
    )
    cur = base.withColumn("hd", F.lit(0).cast("long"))
    for d_inc, new_x, new_y in hilbert_steps(bits, idiv="DIV"):
        cur = cur.select(
            "x",
            "y",
            F.expr(new_x.format(x="hx", y="hy")).alias("hx"),
            F.expr(new_y.format(x="hx", y="hy")).alias("hy"),
            (
                F.col("hd") + F.expr(d_inc.format(x="hx", y="hy"))
            ).alias("hd"),
        )
    shift = 1 << (2 * bits - 2 * bucket_bits)
    return (
        cur.select(
            "x", "y", F.expr(f"hd DIV {shift}").alias("hbucket")
        )
        .groupBy("hbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_lo"),
            F.max("x").alias("x_hi"),
            F.min("y").alias("y_lo"),
            F.max("y").alias("y_hi"),
        )
    )


def hilbert_layout_stats_sql(
    table: str,
    x_col: str,
    y_col: str,
    bits: int = 8,
    bucket_bits: int = 3,
) -> str:
    """DuckDB twin of hilbert_layout_stats (CTE chain per level)."""
    top = (1 << bits) - 1
    ctes = [
        f"""s AS (
  SELECT min({x_col})::BIGINT AS _xlo, max({x_col})::BIGINT AS _xhi,
         min({y_col})::BIGINT AS _ylo, max({y_col})::BIGINT AS _yhi
  FROM {table}
)""",
        f"""h0 AS (
  SELECT t.{x_col}::BIGINT AS x, t.{y_col}::BIGINT AS y,
         ((t.{x_col}::BIGINT - s._xlo) * {top})
           // greatest(s._xhi - s._xlo, 1) AS hx,
         ((t.{y_col}::BIGINT - s._ylo) * {top})
           // greatest(s._yhi - s._ylo, 1) AS hy,
         0::BIGINT AS hd
  FROM {table} t CROSS JOIN s
)""",
    ]
    prev = "h0"
    for i, (d_inc, new_x, new_y) in enumerate(
        hilbert_steps(bits, idiv="//"), start=1
    ):
        ctes.append(
            f"""h{i} AS (
  SELECT x, y,
         {new_x.format(x="hx", y="hy")} AS hx,
         {new_y.format(x="hx", y="hy")} AS hy,
         hd + {d_inc.format(x="hx", y="hy")} AS hd
  FROM {prev}
)"""
        )
        prev = f"h{i}"
    shift = 1 << (2 * bits - 2 * bucket_bits)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT hd // {shift} AS hbucket, count(*)::BIGINT AS n_rows,
       min(x) AS x_lo, max(x) AS x_hi, min(y) AS y_lo, max(y) AS y_hi
FROM {prev}
GROUP BY 1
"""
    )


# --- consistent hashing -----------------------------------------------


def hash_ring_assign(
    keys: DataFrame,
    key_col: str,
    nodes: list[str],
    vnodes_per_node: int = 8,
) -> DataFrame:
    """Consistent-hash ring assignment (Karger et al. 1997) — the
    shard-placement primitive: keys map to the SUCCESSOR virtual
    node on an md5 ring, so adding/removing one node only remaps
    ~1/N of the keyspace (a modulo assignment remaps almost all).

    The ring is nodes × vnodes rows — kilobytes at any scale — and
    BROADCAST; assignment is one broadcast join + a per-key min
    (successor = smallest vnode position >= key position, wrapping
    to the global minimum). No shuffle of the key table beyond its
    own aggregation. All md5-derived integer positions, bit-exact
    cross-engine.

    Output: (key, node, vnode_pos) one row per key."""
    from ..functions import hashing as H

    spark = keys.sparkSession
    ring_rows = [
        (n, v) for n in nodes for v in range(vnodes_per_node)
    ]
    ring = spark.createDataFrame(ring_rows, ["node", "vn"]).select(
        "node",
        H.hash64(
            F.concat_ws("|", F.lit("ring"), F.col("node"),
                        F.col("vn").cast("string"))
        ).alias("vpos"),
    )
    keyed = keys.select(
        F.col(key_col).alias("k"),
        H.hash64(F.col(key_col).cast("string")).alias("kpos"),
    )
    j = keyed.crossJoin(F.broadcast(ring))
    succ = j.groupBy("k", "kpos").agg(
        F.min(
            F.when(F.col("vpos") >= F.col("kpos"), F.col("vpos"))
        ).alias("succ"),
        F.min("vpos").alias("wrap"),
    )
    chosen = succ.select(
        "k", F.coalesce("succ", "wrap").alias("vpos")
    )
    return (
        chosen.join(F.broadcast(ring), "vpos")
        .select(F.col("k").alias(key_col), "node", F.col("vpos"))
        .orderBy(key_col)
    )


def hash_ring_assign_sql(
    table: str,
    key_col: str,
    nodes: list[str],
    vnodes_per_node: int = 8,
) -> str:
    """DuckDB twin of hash_ring_assign."""
    from ..functions import hashing as H

    ring_vals = ", ".join(
        f"('{n}', {v})" for n in nodes for v in range(vnodes_per_node)
    )
    vh = H.hash64_sql("('ring' || '|' || node || '|' || vn::VARCHAR)")
    kh = H.hash64_sql(f"{key_col}::VARCHAR")
    return f"""
WITH ring AS MATERIALIZED (
  SELECT node, {vh} AS vpos
  FROM (VALUES {ring_vals}) t(node, vn)
),
keyed AS (
  SELECT {key_col} AS k, {kh} AS kpos FROM {table}
),
succ AS (
  SELECT k, kpos,
         min(CASE WHEN r.vpos >= kpos THEN r.vpos END) AS succ,
         min(r.vpos) AS wrap
  FROM keyed CROSS JOIN ring r
  GROUP BY k, kpos
),
chosen AS (SELECT k, coalesce(succ, wrap) AS vpos FROM succ)
SELECT c.k AS {key_col}, r.node, c.vpos
FROM chosen c JOIN ring r ON r.vpos = c.vpos
ORDER BY {key_col}
"""


def partition_skew_audit(
    df: DataFrame,
    key_cols: list[str],
    n_partitions: int = 32,
) -> DataFrame:
    """Shuffle-key skew audit (r08): "will this key distribute evenly
    across ``n_partitions`` reducers?" — the question to ask BEFORE
    keying a 100 TB shuffle. Each candidate key is hashed with the
    engine-portable md5 hash (deterministic stand-in for the
    engine's partitioner — skew is a property of the KEY DISTRIBUTION,
    not of murmur vs md5) and every (key, partition) gets its row
    count, distinct-key count, and an exact integer load factor
    load_ppm = rows·P·1e6 div total (1e6 = perfectly balanced).
    Empty partitions appear with zeros via a partition spine, so a
    low-cardinality key's pathology (e.g. event_type: 5 values → at
    most 5 busy reducers, 27 idle) is visible as rows, not absence.

    One scan + one (key_name, partition)-keyed groupBy per audited
    key — map-side combinable; output is key_cols·P rows at any
    input size."""
    from ..functions import hashing as H

    spark = df.sparkSession
    parts = []
    for c in key_cols:
        parts.append(
            df.select(
                F.lit(c).alias("key_name"),
                (
                    H.hash64(F.col(c).cast("string"))
                    % F.lit(n_partitions)
                ).alias("partition"),
                F.col(c).cast("string").alias("_k"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    counts = u.groupBy("key_name", "partition").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("_k").cast("long").alias("n_keys"),
    )
    spine = (
        spark.range(n_partitions)
        .select(F.col("id").cast("long").alias("partition"))
        .crossJoin(
            spark.createDataFrame(
                [(c,) for c in key_cols], "key_name string"
            )
        )
    )
    totals = counts.groupBy("key_name").agg(
        F.sum("n_rows").alias("_total")
    )
    return (
        spine.join(counts, ["key_name", "partition"], "left")
        .join(F.broadcast(totals), "key_name")
        .select(
            "key_name",
            "partition",
            F.coalesce("n_rows", F.lit(0)).cast("long").alias("n_rows"),
            F.coalesce("n_keys", F.lit(0)).cast("long").alias("n_keys"),
            # DECIMAL(38,0) product: n_rows·P·1e6 overflows int64
            # past ~2.9e11 rows/partition — exactly the low-
            # cardinality pathology this audit exists to flag (r08
            # review; corr_matrix widening pattern). Result <= P·1e6.
            F.expr(
                f"CAST(CAST(coalesce(n_rows, 0) AS DECIMAL(38,0))"
                f" * {n_partitions} * 1000000"
                " div CAST(_total AS DECIMAL(38,0)) AS LONG)"
            ).alias("load_ppm"),
        )
        .orderBy("key_name", "partition")
    )
