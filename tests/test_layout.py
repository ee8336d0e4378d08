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
