"""Property tests for the decomposable-state operators: incremental
aggregate merges and count-min sketches must equal their one-shot
builds on arbitrary inputs and arbitrary batch splits. Spark jobs are
slow per example, so examples are capped — the value is the random
SHAPES (empty batches, single-key floods, all-distinct, negative
values), not volume."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from news_clustering_and_summarization_spark.operators.frequent import (
    cms_build,
    cms_estimate,
    cms_merge,
)
from news_clustering_and_summarization_spark.operators.incremental import (
    finalize_aggregates,
    merge_aggregate_state,
    partial_aggregate,
)

ROWS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d"]),
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
    ),
    min_size=1,
    max_size=30,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=ROWS, cut=st.integers(min_value=0, max_value=30))
@_SETTINGS
def test_merge_any_split_equals_full(spark, rows, cut):
    cut = min(cut, len(rows))
    a, b = rows[:cut], rows[cut:]
    full = spark.createDataFrame(rows, "k string, v double")
    state = partial_aggregate(full.limit(0), ["k"], "v")
    for part in (a, b):
        if not part:
            continue
        df = spark.createDataFrame(part, "k string, v double")
        state = merge_aggregate_state(
            state, partial_aggregate(df, ["k"], "v"), ["k"]
        )
    got = sorted(
        map(tuple, finalize_aggregates(state, ["k"]).collect())
    )
    want = sorted(
        map(
            tuple,
            finalize_aggregates(
                partial_aggregate(full, ["k"], "v"), ["k"]
            ).collect(),
        )
    )
    assert got == want


TOKENS = st.lists(
    st.sampled_from(["x", "y", "z", "w", "long-token", ""]),
    min_size=1,
    max_size=25,
)


@given(toks=TOKENS, cut=st.integers(min_value=0, max_value=25))
@_SETTINGS
def test_cms_split_merge_and_no_underestimate(spark, toks, cut):
    cut = min(cut, len(toks))
    width = 8
    full = spark.createDataFrame([(t,) for t in toks], "token string")
    merged = cms_merge(
        cms_build(
            spark.createDataFrame(
                [(t,) for t in toks[:cut]] or [("_pad_",)], "token string"
            ),
            "token",
            width,
        ),
        cms_build(
            spark.createDataFrame(
                [(t,) for t in toks[cut:]] or [("_pad_",)], "token string"
            ),
            "token",
            width,
        ),
    )
    exact: dict[str, int] = {}
    for t in toks:
        exact[t] = exact.get(t, 0) + 1
    q = spark.createDataFrame([(t,) for t in exact], "token string")
    est = {
        r["token"]: r["cms_estimate"]
        for r in cms_estimate(q, "token", merged, width).collect()
    }
    pad = 2 - (0 if toks[:cut] else 1) - (0 if toks[cut:] else 1)
    for t, c in exact.items():
        assert est[t] >= c
        # total mass bound: an estimate can never exceed all instances
        # (+ padding rows injected for empty halves)
        assert est[t] <= len(toks) + pad
