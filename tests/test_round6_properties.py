"""Randomized reference-implementation checks for the round-6
operators: the Spark DataFrame formulations vs trivially-correct
pure-Python references on seeded random inputs (the
test_cc_properties pattern, sized for one Spark call per example)."""

from __future__ import annotations

import random
from collections import Counter

from news_clustering_and_summarization_spark.operators.dedup import (
    containment_pairs,
)
from news_clustering_and_summarization_spark.operators.graph import (
    label_propagation,
)

CONTAIN_QUANT = 1_000_000


def _py_shingles(text: str, n: int) -> set[str]:
    toks = [t for t in "".join(
        c if c.isalnum() else " " for c in text.lower()
    ).split() if t]
    return {
        " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
    } if len(toks) >= n else set()


def _py_containment(rows, n, thr_q):
    sh = {i: _py_shingles(t, n) for i, t in rows}
    sh = {i: s for i, s in sh.items() if s}
    out = {}
    ids = sorted(sh)
    for a in ids:
        for b in ids:
            if a >= b:
                continue
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            cl = inter * CONTAIN_QUANT // len(sh[a])
            cr = inter * CONTAIN_QUANT // len(sh[b])
            if max(cl, cr) >= thr_q:
                out[(a, b)] = (inter, len(sh[a]), len(sh[b]), cl, cr)
    return out


def test_containment_matches_python_reference(spark):
    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(25)]
    for case in range(4):
        rows = []
        for i in range(14):
            base = [rng.choice(vocab) for _ in range(rng.randrange(0, 12))]
            if i % 3 == 0 and rows:
                # splice a copied run from an earlier doc to plant
                # containment structure
                prev = rows[rng.randrange(len(rows))][1].split()
                base = prev[: rng.randrange(len(prev) + 1)] + base
            rows.append((i, " ".join(base)))
        want = _py_containment(rows, n=3, thr_q=200_000)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["l_id"], r["r_id"]): (
                r["inter"], r["l_n"], r["r_n"],
                r["cont_l_q"], r["cont_r_q"],
            )
            for r in containment_pairs(
                df, "doc_id", "text", n=3, threshold=0.2
            ).collect()
        }
        assert got == want, f"case {case}"


def _py_label_prop(edges, seeds, iterations):
    nodes = {v for e in edges for v in e}
    adj = {}
    for s, d in edges:
        adj.setdefault(d, []).append(s)  # incoming: dst votes from src
    label = {v: seeds.get(v) for v in nodes}
    for _ in range(iterations):
        nxt = {}
        for v in nodes:
            if v in seeds:
                nxt[v] = seeds[v]
                continue
            votes = Counter(
                label[u] for u in adj.get(v, []) if label.get(u)
            )
            if votes:
                best = sorted(
                    votes.items(), key=lambda kv: (-kv[1], kv[0])
                )[0][0]
                nxt[v] = best
            else:
                nxt[v] = label[v]
        label = nxt
    return {v: (label[v], v in seeds) for v in nodes}


def test_label_prop_matches_python_reference(spark):
    rng = random.Random(99)
    for case in range(3):
        n = 18
        edges = set()
        for _ in range(30):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((a, b))
                edges.add((b, a))
        edges = sorted(edges)
        seeds = {
            v: rng.choice(["x", "y", "z"])
            for v in rng.sample(range(n), 5)
        }
        want = _py_label_prop(edges, seeds, 3)
        e = spark.createDataFrame(edges, "src long, dst long")
        s = spark.createDataFrame(
            sorted(seeds.items()), "node long, label string"
        )
        got = {
            r["node"]: (r["label"], r["is_seed"])
            for r in label_propagation(e, s, iterations=3).collect()
        }
        assert got == want, f"case {case}"


def test_zipf_slope_synthetic_power_law(spark):
    """A corpus built so freq(rank) ∝ rank^-1 must fit slope ≈ -1
    with r² ≈ 1; the SQL twin matches bit-for-bit."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.text_analysis import (
        zipf_slope,
        zipf_slope_sql,
    )

    # vocab of 50 words, word i repeated round(1000/i) times
    words = []
    for i in range(1, 51):
        words += [f"w{i:03d}"] * round(1000 / i)
    text = " ".join(words)
    df = spark.createDataFrame([(1, text, "x", "s", len(text))],
                               ["doc_id", "text", "lang", "source",
                                "n_chars"])
    row = zipf_slope(df, top_k=50).collect()[0]
    assert row["n_fit"] == 50
    assert abs(row["slope_q"] / 1e6 + 1.0) < 0.02
    assert row["r2_q"] > 990_000

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
        "lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.execute("INSERT INTO documents VALUES (1, ?, 'x', 's', 1)",
                [text])
    want = con.execute(zipf_slope_sql("documents", top_k=50)).fetchall()[0]
    assert tuple(row) == want


def test_shannon_diversity_extremes(spark):
    """Uniform types maximize H (evenness 1); a single repeated type
    gives H = 0; twin matches."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.text_analysis import (
        shannon_diversity,
        shannon_diversity_sql,
    )

    rows = [
        (1, "a b c d e f g h", "x", "uniform", 1),
        (2, "z z z z z z z z", "x", "mono", 1),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    got = {r["source"]: r for r in shannon_diversity(df).collect()}
    import math

    assert abs(got["uniform"]["h_q"] / 1e6 - math.log(8)) < 1e-5
    assert got["uniform"]["evenness_q"] == 1_000_000
    assert got["mono"]["h_q"] == 0 and got["mono"]["vocab"] == 1
    assert got["mono"]["evenness_q"] == 0  # vocab=1 guard

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
        "lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(shannon_diversity_sql("documents")).fetchall()
    )
    assert sorted(tuple(r) for r in shannon_diversity(df).collect()) == want


def test_fano_factor_poisson_vs_regular(spark):
    """A constant 5/day series has variance 0 -> F = 0; an
    all-or-nothing bursty series is overdispersed (F > 1); twin
    matches on a seeded stream."""
    import datetime as dt
    import hashlib

    import duckdb

    from news_clustering_and_summarization_spark.operators.temporal import (
        fano_factor,
        fano_factor_sql,
    )

    t0 = dt.datetime(2024, 1, 1, 9)
    rows = []
    eid = 0
    for day in range(10):
        for _ in range(5):
            rows.append((eid, t0 + dt.timedelta(days=day), 1, "flat"))
            eid += 1
    for day in range(10):
        if day % 5 == 0:
            for _ in range(25):
                rows.append(
                    (eid, t0 + dt.timedelta(days=day), 1, "burst")
                )
                eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    got = {r["event_type"]: r for r in fano_factor(ev).collect()}
    assert got["flat"]["fano_q"] == 0
    assert got["flat"]["mean_q"] == 5_000_000
    assert got["burst"]["fano_q"] > 1_000_000

    data = []
    for i in range(400):
        h = int(hashlib.md5(f"ff|{i}".encode()).hexdigest()[:8], 16)
        data.append(
            (i, t0 + dt.timedelta(seconds=h % (86400 * 20)), h % 5,
             ["a", "b", "c"][h % 3], 0.0, "")
        )
    df = spark.createDataFrame(
        data, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = sorted(tuple(r) for r in fano_factor(df).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, "
        "user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?, ?)", data)
    want = sorted(
        tuple(r) for r in con.execute(fano_factor_sql()).fetchall()
    )
    assert got == want
