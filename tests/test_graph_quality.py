"""Graph-quality metrics (r09 batch 4): Newman modularity and degree
assortativity on hand-checkable planted graphs, plus the Flesch
readability surrogate on hand-counted text."""

from __future__ import annotations

from news_clustering_and_summarization_spark.operators.graph import (
    assortativity,
    modularity,
)
from news_clustering_and_summarization_spark.operators.text_analysis import (
    flesch_readability,
)


def _sym(pairs):
    """Undirected edge list -> the repo's symmetric directed form."""
    return [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]


def test_modularity_two_cliques(spark):
    # two disjoint triangles, communities = the cliques: the textbook
    # high-modularity case. M = 12 directed edges; per community:
    # e_c = 6 (directed intra), d_c = 6 -> contrib = (12*6 - 36)/144
    # = 0.25; Q = 0.5.
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(4, 5), (5, 6), (4, 6)]
    edges = spark.createDataFrame(_sym(tri1 + tri2), "src long, dst long")
    comms = spark.createDataFrame(
        [(i, "a") for i in (1, 2, 3)] + [(i, "b") for i in (4, 5, 6)],
        "node long, community string",
    )
    out = {r["community"]: r for r in modularity(edges, comms).collect()}
    assert out["a"]["e_c"] == 6 and out["a"]["d_c"] == 6
    assert out["a"]["q_contrib_q"] == 250000
    assert out["b"]["q_contrib_q"] == 250000


def test_modularity_single_community_is_zero(spark):
    # everything in one community: Q = (M*M - (M)^2)/M^2 with
    # e_c = M, d_c = M -> contrib = (M*M - M*M)/M^2 = 0 exactly
    edges = spark.createDataFrame(
        _sym([(1, 2), (2, 3), (1, 3)]), "src long, dst long"
    )
    comms = spark.createDataFrame(
        [(i, "all") for i in (1, 2, 3)], "node long, community string"
    )
    [row] = modularity(edges, comms).collect()
    assert row["q_contrib_q"] == 0


def test_assortativity_star_is_negative_clique_is_null(spark):
    # star K1,4: hubs (deg 4) only link to leaves (deg 1) -> r = -1
    star = spark.createDataFrame(
        _sym([(0, i) for i in (1, 2, 3, 4)]), "src long, dst long"
    )
    [row] = assortativity(star).collect()
    assert row["m_edges"] == 8
    assert row["r_q"] == -1_000_000
    # clique: all degrees equal -> zero variance -> NULL
    clique = spark.createDataFrame(
        _sym([(1, 2), (2, 3), (1, 3)]), "src long, dst long"
    )
    [row] = assortativity(clique).collect()
    assert row["r_q"] is None


def test_flesch_hand_counted(spark):
    # "the cat sat. it sat on a mat!" -> tokens: 8 words; sentences:
    # 2 ([.] and [!]); syllable groups: the=1 cat=1 sat=1 it=1 sat=1
    # on=1 a=1 mat=1 = 8. score = 206.835 - 1.015*(8/2) - 84.6*(8/8)
    # = 206.835 - 4.06 - 84.6 = 118.175 -> 1181750
    df = spark.createDataFrame(
        [("d1", "the cat sat. it sat on a mat!")], "doc_id string, text string"
    )
    [row] = flesch_readability(df).collect()
    assert row["n_words"] == 8
    assert row["n_sentences"] == 2
    assert row["n_syllables"] == 8
    assert row["flesch_q"] == 1_181_750


def test_flesch_empty_doc_is_null(spark):
    df = spark.createDataFrame(
        [("d1", "!!!")], "doc_id string, text string"
    )
    [row] = flesch_readability(df).collect()
    assert row["n_words"] == 0 and row["flesch_q"] is None


def test_flesch_vowel_groups_not_vowels(spark):
    # "queueing" has vowel GROUPS ueuei+... -> u e u e i -> groups:
    # "ueuei" is one run? q-u-e-u-e-i-n-g: 'ueuei' consecutive vowels
    # = ONE group; so syllables = 1 (floor applies anyway).
    # "beautiful": eau|i|u -> 3 groups.
    df = spark.createDataFrame(
        [("d1", "queueing beautiful rhythm")], "doc_id string, text string"
    )
    [row] = flesch_readability(df).collect()
    # queueing: 'ueuei' one group + trailing... q(ueuei)ng = 1;
    # beautiful: b(eau)t(i)f(u)l = 3; rhythm: 'y' = 1
    assert row["n_syllables"] == 1 + 3 + 1
