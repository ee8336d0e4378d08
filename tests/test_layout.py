"""Z-order layout keys (round 6)."""

from __future__ import annotations

from news_clustering_and_summarization_spark.operators.layout import (
    zorder_layout_stats,
)


def test_zorder_interleave_locality(spark):
    # full 8x8 grid at bits=3: bucket_bits=2 -> 16 buckets of 4 cells,
    # each bucket a 2x2 tile (the defining z-order locality property)
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = zorder_layout_stats(df, "x", "y", bits=3, bucket_bits=2).collect()
    assert len(out) == 16
    for r in out:
        assert r["n_rows"] == 4
        assert r["x_hi"] - r["x_lo"] == 1  # tight 2-wide span on BOTH
        assert r["y_hi"] - r["y_lo"] == 1  # dims -> pruning works on either


def test_zorder_beats_linear_sort_on_second_dim(spark):
    # under a linear sort by x, each 4-cell run spans the FULL y range;
    # z-order tiles bound both dims
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    z = zorder_layout_stats(df, "x", "y", bits=3, bucket_bits=2).collect()
    max_y_span = max(r["y_hi"] - r["y_lo"] for r in z)
    assert max_y_span == 1 < 7  # linear-by-x buckets would span 7


def _hilbert_xy2d_ref(n, x, y):
    """Wikipedia reference implementation."""
    rx = ry = 0
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_steps_match_reference_all_cells():
    """The SQL step templates replay the reference xy2d on every
    cell of a 16x16 grid (via DuckDB), and the resulting d values
    are a permutation of 0..255 with unit-step locality (consecutive
    d -> manhattan-adjacent cells, the property Morton lacks)."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.layout import (
        hilbert_steps,
    )

    bits, n = 4, 16
    sql_prev = (
        "h0 AS (SELECT x, y, x AS hx, y AS hy, 0 AS hd FROM "
        "(SELECT a.r AS x, b.r AS y FROM range(16) a(r), range(16) b(r)))"
    )
    ctes = [sql_prev]
    prev = "h0"
    for i, (d_inc, new_x, new_y) in enumerate(
        hilbert_steps(bits, idiv="//"), start=1
    ):
        ctes.append(
            f"h{i} AS (SELECT x, y, "
            f"{new_x.format(x='hx', y='hy')} AS hx, "
            f"{new_y.format(x='hx', y='hy')} AS hy, "
            f"hd + {d_inc.format(x='hx', y='hy')} AS hd FROM {prev})"
        )
        prev = f"h{i}"
    rows = duckdb.sql(
        "WITH " + ",".join(ctes) + f" SELECT x, y, hd FROM {prev}"
    ).fetchall()
    got = {(x, y): d for x, y, d in rows}
    for (x, y), d in got.items():
        assert d == _hilbert_xy2d_ref(n, x, y)
    by_d = sorted(got.items(), key=lambda kv: kv[1])
    assert [d for _, d in by_d] == list(range(256))
    for ((x1, y1), _), ((x2, y2), _) in zip(by_d, by_d[1:]):
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_layout_stats_spark_matches_sql(spark):
    """Spark chained projections == DuckDB CTE chain on a seeded
    point set, including the normalize-to-grid stage."""
    import duckdb
    import hashlib

    from news_clustering_and_summarization_spark.operators.layout import (
        hilbert_layout_stats,
        hilbert_layout_stats_sql,
    )

    pts = []
    for i in range(500):
        h = hashlib.md5(f"hil|{i}".encode()).hexdigest()
        pts.append((int(h[:6], 16) % 10_000, int(h[6:12], 16) % 3_000))
    df = spark.createDataFrame(pts, ["px", "py"])
    got = sorted(
        tuple(r)
        for r in hilbert_layout_stats(df, "px", "py").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (px BIGINT, py BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pts)
    want = sorted(
        tuple(r)
        for r in con.execute(
            hilbert_layout_stats_sql("t", "px", "py")
        ).fetchall()
    )
    assert got == want


def test_hash_ring_properties(spark):
    """Every key lands on exactly one node; removing one node only
    remaps the keys that were ON that node (the consistent-hashing
    contract a modulo scheme violates); twin matches."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.layout import (
        hash_ring_assign,
        hash_ring_assign_sql,
    )

    keys = spark.createDataFrame(
        [(i,) for i in range(200)], ["k"]
    )
    nodes4 = ["n1", "n2", "n3", "n4"]
    a4 = {
        r["k"]: r["node"]
        for r in hash_ring_assign(keys, "k", nodes4).collect()
    }
    assert len(a4) == 200
    assert set(a4.values()) <= set(nodes4)
    # drop n4: only n4's keys may move
    a3 = {
        r["k"]: r["node"]
        for r in hash_ring_assign(keys, "k", nodes4[:3]).collect()
    }
    moved = [k for k in a4 if a4[k] != a3[k]]
    assert all(a4[k] == "n4" for k in moved)
    assert any(a4[k] == "n4" for k in a4)  # n4 actually owned keys

    got = sorted(
        tuple(r) for r in hash_ring_assign(keys, "k", nodes4).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(range(200)) AS k")
    want = sorted(
        tuple(r)
        for r in con.execute(
            hash_ring_assign_sql("t", "k", nodes4)
        ).fetchall()
    )
    assert got == want


def test_partition_skew_audit_shapes(spark):
    """Low-cardinality key concentrates load in <= n_distinct
    partitions (the rest appear with zero rows via the spine); a
    near-unique key spreads out; load_ppm sums to ~P*1e6 per key."""
    from news_clustering_and_summarization_spark.operators.layout import (
        partition_skew_audit,
    )

    rows = [(i, "t%d" % (i % 2)) for i in range(400)]
    df = spark.createDataFrame(rows, "uid long, etype string")
    out = partition_skew_audit(df, ["uid", "etype"], n_partitions=8)
    rowsd = [r.asDict() for r in out.collect()]
    assert len(rowsd) == 16  # 2 keys x 8 partitions, spine-complete
    et = [r for r in rowsd if r["key_name"] == "etype"]
    assert sum(1 for r in et if r["n_rows"] > 0) <= 2
    assert sum(r["n_rows"] for r in et) == 400
    uid = [r for r in rowsd if r["key_name"] == "uid"]
    assert sum(1 for r in uid if r["n_rows"] > 0) >= 6
    for key_rows in (et, uid):
        total_ppm = sum(r["load_ppm"] for r in key_rows)
        assert abs(total_ppm - 8_000_000) <= 8  # div truncation slack
