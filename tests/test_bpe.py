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
