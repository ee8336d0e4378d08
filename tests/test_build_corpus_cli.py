"""Corpus-build CLI (tools/build_corpus.py): funnel monotonicity,
per-source budget enforcement, snapshot versioning on rebuild."""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.sources import tables as T

_TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "build_corpus.py",
)
_spec = importlib.util.spec_from_file_location("build_corpus", _TOOL)
build_corpus_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(build_corpus_mod)

SF = "/root/testdata/sf0.001"


def test_build_funnel_and_budget(spark, tmp_path):
    out = os.path.join(str(tmp_path), "corpus")
    stats = build_corpus_mod.build_corpus(
        spark, SF, out, budget=1000, min_quality=0.5, lang="en"
    )
    assert (
        stats["n_input"]
        >= stats["n_after_filters"]
        >= stats["n_after_dedup"]
        >= stats["n_selected"]
        > 0
    )
    # per-source budget is a hard cap
    assert all(
        s["tokens"] <= 1000 for s in stats["per_source"].values()
    ), stats["per_source"]
    # the published snapshot IS the accounted corpus
    snap = T.read_latest_snapshot(spark, out)
    assert snap.count() == stats["n_selected"]
    got_tokens = (
        snap.agg(F.sum("bpe_token_estimate").cast("long")).collect()[0][0]
    )
    assert got_tokens == stats["total_tokens"]


def test_rebuild_bumps_version_atomically(spark, tmp_path):
    out = os.path.join(str(tmp_path), "corpus")
    s1 = build_corpus_mod.build_corpus(
        spark, SF, out, budget=500, min_quality=0.5, lang="en"
    )
    s2 = build_corpus_mod.build_corpus(
        spark, SF, out, budget=2000, min_quality=0.5, lang="en"
    )
    assert (s1["version"], s2["version"]) == (1, 2)
    # latest reflects the bigger budget; v=1 still on disk for readers
    assert s2["total_tokens"] >= s1["total_tokens"]
    assert os.path.isdir(os.path.join(out, "v=1"))
