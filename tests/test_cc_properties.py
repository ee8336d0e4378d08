"""Property-based tests for the connected-components core, plus
local-vs-distributed strategy equivalence on the Spark wrapper.

The union-find core (cluster.union_find_components) is pure pandas,
so hypothesis can hammer it against a reference BFS over hundreds of
random graphs in milliseconds — chains, cliques, isolated vertices,
string ids, duplicate and self edges all emerge from the generator.
"""

from __future__ import annotations

from collections import deque

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from news_clustering_and_summarization_spark.operators.cluster import (
    union_find_components,
)


def _bfs_components(vids: list[str], edges: list[tuple[str, str]]):
    adj: dict[str, list[str]] = {v: [] for v in vids}
    for u, w in edges:
        adj.setdefault(u, []).append(w)
        adj.setdefault(w, []).append(u)
    label: dict[str, str] = {}
    for start in adj:
        if start in label:
            continue
        seen = {start}
        q = deque([start])
        while q:
            x = q.popleft()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    q.append(y)
        rep = min(seen)
        for x in seen:
            label[x] = rep
    return {v: label[v] for v in vids}


@st.composite
def graphs(draw):
    n = draw(st.integers(min_value=0, max_value=40))
    vids = [f"v{i:02d}" for i in range(n)]
    if n == 0:
        return vids, []
    idx = st.integers(min_value=0, max_value=n - 1)
    edges = draw(
        st.lists(st.tuples(idx, idx), min_size=0, max_size=80).map(
            lambda ps: [(vids[a], vids[b]) for a, b in ps]
        )
    )
    return vids, edges


@settings(max_examples=300, deadline=None)
@given(graphs())
def test_union_find_matches_bfs(g):
    vids, edges = g
    got = union_find_components(
        pd.DataFrame({"vid": pd.Series(vids, dtype="object")}),
        pd.DataFrame(
            {
                "l_id": pd.Series([e[0] for e in edges], dtype="object"),
                "r_id": pd.Series([e[1] for e in edges], dtype="object"),
            }
        ),
    )
    expect = _bfs_components(vids, edges)
    assert dict(zip(got["vid"], got["component"])) == expect


@settings(max_examples=200, deadline=None)
@given(graphs())
def test_union_find_edge_order_invariant(g):
    vids, edges = g
    v = pd.DataFrame({"vid": pd.Series(vids, dtype="object")})

    def run(es):
        out = union_find_components(
            v,
            pd.DataFrame(
                {
                    "l_id": pd.Series([e[0] for e in es], dtype="object"),
                    "r_id": pd.Series([e[1] for e in es], dtype="object"),
                }
            ),
        )
        return dict(zip(out["vid"], out["component"]))

    flipped = [(b, a) for a, b in reversed(edges)]
    assert run(edges) == run(flipped)


def test_local_and_distributed_strategies_agree(spark):
    """The strategy gate must be invisible: same labels either way,
    on a graph mixing a chain, a clique, and isolated vertices."""
    import random

    from news_clustering_and_summarization_spark.operators.cluster import (
        connected_components,
    )

    rng = random.Random(7)
    vids = [f"n{i:03d}" for i in range(60)]
    chain = [(vids[i], vids[i + 1]) for i in range(0, 19)]
    clique = [
        (vids[a], vids[b])
        for a in range(25, 33)
        for b in range(a + 1, 33)
    ]
    rand = [
        (vids[rng.randrange(40, 55)], vids[rng.randrange(40, 55)])
        for _ in range(10)
    ]
    edges = spark.createDataFrame(
        chain + clique + rand, "l_id string, r_id string"
    )
    verts = spark.createDataFrame([(v,) for v in vids], "vid string")
    local = connected_components(
        verts, edges, id_col="vid", method="local"
    ).collect()
    dist = connected_components(
        verts, edges, id_col="vid", method="distributed"
    ).collect()
    as_map = lambda rows: {r["vid"]: r["component"] for r in rows}
    assert as_map(local) == as_map(dist)
