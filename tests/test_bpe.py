"""BPE merge learning (operators/bpe.py): textbook merge sequences,
left-to-right non-overlap in the fold, deterministic tiebreaks, and
vocab-state consistency."""

from __future__ import annotations

from news_clustering_and_summarization_spark.operators.bpe import (
    learn_bpe_merges,
    word_frequencies,
)


def _wf(spark, pairs):
    return spark.createDataFrame(pairs, ["word", "freq"])


def test_textbook_banana_merges(spark):
    merges, state = learn_bpe_merges(
        _wf(spark, [("banana", 3), ("bandana", 1)]), 2
    )
    got = [(r["left"], r["right"], r["merged"]) for r in merges.collect()]
    # 'an' appears 2x in banana (freq 3) + 2x in bandana = 8; then
    # 'an'+'a' appears once per banana + once in bandana
    assert got[0] == ("a", "n", "an")
    assert got[1] == ("an", "a", "ana")
    syms = {
        r["word"]: r["syms"] for r in state.collect()
    }
    assert syms["banana"] == ["b", "an", "ana"]
    assert syms["bandana"] == ["b", "an", "d", "ana"]


def test_fold_never_merges_overlapping_pairs(spark):
    # 'aaaa' with pair (a,a): left-to-right gives [aa, aa], and the
    # second merge (aa,aa) gives [aaaa] — never [aa,[aa merged with
    # leftover]] artifacts
    merges, state = learn_bpe_merges(_wf(spark, [("aaaa", 1)]), 2)
    got = [(r["left"], r["right"]) for r in merges.collect()]
    assert got == [("a", "a"), ("aa", "aa")]
    assert state.first()["syms"] == ["aaaa"]


def test_tiebreak_is_lexicographic(spark):
    # 'ab' and 'cd' both count 1 -> (a,b) wins by symbol order
    merges, _ = learn_bpe_merges(_wf(spark, [("ab", 1), ("cd", 1)]), 1)
    r = merges.first()
    assert (r["left"], r["right"]) == ("a", "b")


def test_single_char_words_are_inert(spark):
    merges, state = learn_bpe_merges(
        _wf(spark, [("a", 100), ("b", 50), ("xy", 1)]), 1
    )
    r = merges.first()
    assert (r["left"], r["right"], r["pair_count"]) == ("x", "y", 1)
    assert {t["word"]: t["syms"] for t in state.collect()}["a"] == ["a"]


def test_word_frequencies_counts_instances(spark):
    docs = spark.createDataFrame(
        [(1, "the cat the hat"), (2, "the end")], ["id", "text"]
    )
    wf = {
        r["word"]: r["freq"]
        for r in word_frequencies(docs, "text").collect()
    }
    assert wf["the"] == 3 and wf["cat"] == 1


# --- bpe_encode (round 6: tokenizer APPLY side) ----------------------


def test_bpe_encode_hand_case(spark):
    from news_clustering_and_summarization_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(1, "aaab aab"), (2, "b"), (3, ""), (4, "AAAB?!")],
        ["doc_id", "text"],
    )
    # merges applied in order: (a,a)->aa, then (aa,b)->aab
    out = {
        r["doc_id"]: (r["n_words"], r["n_syms"], r["syms_h"])
        for r in bpe_encode(
            docs, [("a", "a"), ("aa", "b")], "doc_id", "text"
        ).collect()
    }
    # 'aaab' -> [aa, a, b]; 'aab' -> [aab]  => stream aa|a|b|aab
    assert out[1][:2] == (2, 4)
    # 'b' -> [b]
    assert out[2][:2] == (1, 1)
    # empty doc -> empty stream, md5('')
    import hashlib

    assert out[3] == (0, 0, hashlib.md5(b"").hexdigest())
    # lowercase + punctuation split: 'AAAB?!' tokenizes to 'aaab'
    assert out[4][:2] == (1, 3)
    sep = "\x1f"
    want1 = hashlib.md5(sep.join(["aa", "a", "b", "aab"]).encode()).hexdigest()
    assert out[1][2] == want1


def test_bpe_encode_merge_order_matters(spark):
    from news_clustering_and_summarization_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    # (b,c) first blocks (a,b): a|bc
    r1 = bpe_encode(docs, [("b", "c"), ("a", "b")]).first()
    # (a,b) first: ab|c
    r2 = bpe_encode(docs, [("a", "b"), ("b", "c")]).first()
    assert r1["n_syms"] == 2 and r2["n_syms"] == 2
    assert r1["syms_h"] != r2["syms_h"]
