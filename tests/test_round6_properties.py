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
