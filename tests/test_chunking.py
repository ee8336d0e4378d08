"""Chunking / sequence-packing operators (training-data prep)."""

from __future__ import annotations

import pytest

from news_clustering_and_summarization_spark.operators import chunking as CH


def test_chunk_documents_overlap_semantics(spark):
    # 10 tokens, chunk=4, overlap=2 -> starts 1,3,5,7,9 (stride 2)
    text = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    df = spark.createDataFrame([(0, text), (1, ""), (2, None)],
                               "doc_id long, text string")
    rows = CH.chunk_documents(df, chunk_tokens=4, overlap=2).collect()
    by_chunk = {r["chunk_id"]: r for r in rows}
    assert {r["doc_id"] for r in rows} == {0}  # empty/null -> no chunks
    assert len(rows) == 5
    assert by_chunk[0]["chunk_text"] == "t1 t2 t3 t4"
    assert by_chunk[1]["chunk_text"] == "t3 t4 t5 t6"
    assert by_chunk[4]["chunk_text"] == "t9 t10"  # short tail kept
    assert by_chunk[4]["chunk_tokens"] == 2
    # consecutive chunks share exactly `overlap` tokens
    a, b = by_chunk[0]["chunk_text"].split(), by_chunk[1]["chunk_text"].split()
    assert a[-2:] == b[:2]


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        CH.chunk_documents(df, chunk_tokens=4, overlap=4)


def test_pack_sequences_bin_assignment(spark):
    # budget 10, in id order token counts 4,4,4,4 -> cum_before
    # 0,4,8,12 -> seq 0,0,0,1 (doc may straddle the edge; offset rule)
    rows = [(i, "w x y z") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["seq_id"]
           for r in CH.pack_sequences(df, budget=10).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1}


def test_pack_sequences_sharded_windows_reset(spark):
    rows = [(0, "en", "a b c d e f"), (1, "en", "a b c d e f"),
            (2, "fr", "a b c d e f"), (3, "fr", "a b c d e f")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r["doc_id"]: r["seq_id"]
           for r in CH.pack_sequences(df, budget=8, shard_col="lang")
           .collect()}
    # each shard restarts at cum 0: docs 0/2 in seq 0, docs 1/3 spill
    assert got == {0: 0, 1: 0, 2: 0, 3: 0} or got == {0: 0, 1: 0, 2: 0, 3: 0}
    # second doc per shard has cum_before 6 < 8 -> still seq 0; third
    # would spill. Verify with a 3-doc shard:
    df2 = spark.createDataFrame(
        [(0, "en", "a b c d e f"), (1, "en", "a b c d e f"),
         (2, "en", "a b c d e f")],
        "doc_id long, lang string, text string")
    got2 = {r["doc_id"]: r["seq_id"]
            for r in CH.pack_sequences(df2, budget=8, shard_col="lang")
            .collect()}
    assert got2 == {0: 0, 1: 0, 2: 1}


def test_chunk_reconstruction_property(spark):
    """Chunks reassemble to the exact token stream: chunk 0 whole,
    every later chunk minus its first `overlap` tokens. Holds for any
    doc length including empty, shorter-than-chunk, and tails that
    fall entirely inside the overlap."""
    import random

    rng = random.Random(42)
    docs = [
        (i, " ".join(f"w{rng.randrange(20)}" for _ in range(rng.randrange(0, 50))))
        for i in range(150)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for chunk_tokens, overlap in ((4, 1), (8, 3), (16, 8)):
        out = CH.chunk_documents(
            df, chunk_tokens=chunk_tokens, overlap=overlap
        ).collect()
        got: dict[int, list[tuple[int, str]]] = {}
        for r in out:
            assert r["chunk_tokens"] == len(r["chunk_text"].split())
            assert 1 <= r["chunk_tokens"] <= chunk_tokens
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_id"], r["chunk_text"])
            )
        for doc_id, text in docs:
            toks = text.split()
            chunks = [t for _, t in sorted(got.get(doc_id, []))]
            rebuilt: list[str] = []
            for j, c in enumerate(chunks):
                parts = c.split()
                rebuilt.extend(parts if j == 0 else parts[overlap:])
            assert rebuilt == toks, (doc_id, chunk_tokens, overlap)


def test_span_corruption_structure(spark):
    from news_clustering_and_summarization_spark.operators.chunking import (
        span_corruption,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
         for i in range(20)],
        ["doc_id", "text"],
    )
    out = span_corruption(docs, start_ppt=150, span_len=2).collect()
    saw_mask = False
    for r in out:
        assert r["n_tokens"] == 10
        n_sent_in = r["input_text"].count("<extra_id_")
        n_sent_tgt = r["target_text"].count("<extra_id_")
        assert n_sent_in == n_sent_tgt, "one sentinel per span, both sides"
        # reconstruction: unmasked input tokens + masked target tokens
        # = original token count
        in_toks = [
            t for t in r["input_text"].split() if not t.startswith("<")
        ]
        tgt_toks = [
            t for t in r["target_text"].split() if not t.startswith("<")
        ]
        assert len(in_toks) + len(tgt_toks) == 10
        assert len(tgt_toks) == r["n_masked"]
        saw_mask = saw_mask or r["n_masked"] > 0
    assert saw_mask, "at 15% start rate some doc must mask something"


def test_span_corruption_is_deterministic(spark):
    from news_clustering_and_summarization_spark.operators.chunking import (
        span_corruption,
    )

    docs = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten")],
        ["doc_id", "text"],
    )
    a = span_corruption(docs, start_ppt=200, span_len=2).collect()
    b = span_corruption(
        docs.repartition(7), start_ppt=200, span_len=2
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_skipgram_pairs_window_and_subsampling(spark):
    from news_clustering_and_summarization_spark.operators.chunking import (
        skipgram_pairs,
    )

    # with subsample_t=1.0 every word survives (keep rate 1):
    # "a b c" with window 1 -> pairs (a,b),(b,a),(b,c),(c,b)
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    out = {
        (r["center"], r["context"]): r["pair_count"]
        for r in skipgram_pairs(
            docs, window=1, subsample_t=1.0
        ).collect()
    }
    assert out == {
        ("a", "b"): 1,
        ("b", "a"): 1,
        ("b", "c"): 1,
        ("c", "b"): 1,
    }


def test_skipgram_subsampling_thins_frequent_words(spark):
    from news_clustering_and_summarization_spark.operators.chunking import (
        skipgram_pairs,
    )

    # 'the' dominates the corpus; at t=1e-3 its keep rate is far
    # below 1 while rare words always survive as centers
    text = " ".join(["the"] * 500 + ["rare"])
    docs = spark.createDataFrame(
        [(i, text) for i in range(4)], ["doc_id", "text"]
    )
    pairs = skipgram_pairs(docs, window=2, subsample_t=1e-3)
    from pyspark.sql import functions as F

    centers = {
        r["center"]: r["n"]
        for r in pairs.groupBy("center")
        .agg(F.sum("pair_count").alias("n"))
        .collect()
    }
    total_the_centers = centers.get("the", 0)
    # unsubsampled 'the' would emit ~2000 centers x ~4 contexts; the
    # sqrt(t/f) rule keeps ~4.5% of them
    assert total_the_centers < 2000, centers
    assert "rare" in centers


# --- pack_sequences_global (round 6: two-phase global packing) -------


def test_pack_global_equals_naive_window(spark):
    from pyspark.sql import Window, functions as F
    from news_clustering_and_summarization_spark.functions import hashing as H
    from news_clustering_and_summarization_spark.operators.chunking import (
        pack_sequences_global,
    )

    rows = [(i, " ".join(["w"] * (i % 7 + 1))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        map(tuple, pack_sequences_global(
            df, "doc_id", "text", budget=16, shard_width=32
        ).collect())
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    tok_n = F.size(H.tokens("text")).cast("long")
    naive = sorted(
        map(tuple, df.select(
            "doc_id",
            tok_n.alias("n_tokens"),
            F.coalesce(F.sum(tok_n).over(w), F.lit(0)).alias("cum_before"),
        ).select(
            "doc_id", "n_tokens", "cum_before",
            F.expr("cum_before DIV 16").alias("seq_id"),
        ).collect())
    )
    assert got == naive


def test_pack_global_monotone_nonskipping(spark):
    from news_clustering_and_summarization_spark.operators.chunking import (
        pack_sequences_global,
    )

    df = spark.createDataFrame(
        [(i, "a b c d") for i in range(50)], "doc_id long, text string"
    )
    rows = sorted(
        (r["doc_id"], r["seq_id"])
        for r in pack_sequences_global(
            df, "doc_id", "text", budget=8, shard_width=7
        ).collect()
    )
    seqs = [s for _, s in rows]
    assert seqs == sorted(seqs)  # monotone in doc order
    assert set(seqs) == set(range(max(seqs) + 1))  # no gaps
