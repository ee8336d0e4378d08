"""Text-analysis operators vs DuckDB oracles on the documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.functions import hashing as H
from news_clustering_and_summarization_spark.operators import text_analysis as TA
from tests.conftest import SF_SMOKE, assert_matches_oracle


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_language_id_known_samples(spark):
    rows = [
        (0, "the cat is on the mat and the dog is in the house"),
        (1, "el gato esta en la casa y los perros en el jardin"),
        (2, "le chat est dans la maison pour les vacances sur la mer"),
        (3, "der hund ist nicht mit der katze und das haus von zu"),
        (4, "xyzzy plugh qwerty"),
    ]
    df = spark.createDataFrame(rows, "i int, text string")
    got = {
        r["i"]: r["lang"]
        for r in df.select(
            "i", TA.language_id("text").alias("lang")
        ).collect()
    }
    assert got == {0: "en", 1: "es", 2: "fr", 3: "de", 4: "und"}


def test_language_id_oracle(spark, docs, duck):
    got = docs.select(
        "doc_id", TA.language_id("text").alias("lang_pred")
    )
    oracle = (
        f"SELECT doc_id, {TA.language_id_sql('text')} AS lang_pred "
        "FROM documents"
    )
    assert_matches_oracle(got, duck, oracle)


def test_quality_score_oracle(spark, docs, duck):
    got = TA.quality_score(docs, "text").select("doc_id", "quality_score")
    oracle = (
        f"SELECT doc_id, {TA.quality_score_sql('text')} AS quality_score "
        "FROM documents"
    )
    assert_matches_oracle(got, duck, oracle)


def test_quality_score_edge_cases(spark):
    rows = [
        (0, "short"),                                   # too few tokens
        (1, " ".join(["the word is fine and solid"] * 5)),  # healthy
        (2, "!!! ??? ,,, ;;; ..." * 10),                # punctuation soup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["quality_score"]
        for r in TA.quality_score(df, "text").select(
            "doc_id", "quality_score"
        ).collect()
    }
    assert got[1] == 1.0
    assert got[0] < 1.0
    assert got[2] < got[1]


def test_token_counts_oracle(spark, docs, duck):
    got = TA.token_counts(docs, "text").select(
        "doc_id", "ws_token_count", "bpe_token_estimate"
    )
    ws, bpe = TA.token_counts_sql("text")
    oracle = (
        f"SELECT doc_id, {ws} AS ws_token_count, "
        f"{bpe} AS bpe_token_estimate FROM documents"
    )
    assert_matches_oracle(got, duck, oracle)


def test_fingerprints_order_sensitivity(spark):
    rows = [
        (0, "alpha beta gamma"),
        (1, "gamma beta alpha"),   # same tokens, different order
        (2, "alpha beta gamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in TA.document_fingerprints(df).collect()}
    assert got[0]["rolling_fp"] == got[2]["rolling_fp"]
    assert got[0]["rolling_fp"] != got[1]["rolling_fp"]
    assert got[0]["content_md5"] == got[2]["content_md5"]


def test_fingerprints_oracle(spark, docs, duck):
    got = TA.document_fingerprints(docs)
    tok = H.tokens_sql("text")
    oracle = f"""
    SELECT doc_id, {H.fingerprint_sql(tok)} AS rolling_fp,
           md5(coalesce(text, '')) AS content_md5
    FROM documents
    """
    assert_matches_oracle(got, duck, oracle)


def test_repetition_signals_hand_computed(spark):
    # "a a b": tokens n=3 d=2 top=2 -> dup=1/3, top=2/3;
    # bigrams ["a a","a b"] n=2 d=2 top=1 -> dup=0, top=1/2
    rows = [(0, "a a b"), (1, "x"), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["dup_token_frac"],
            r["top_token_frac"],
            r["dup_bigram_frac"],
            r["top_bigram_frac"],
        )
        for r in TA.repetition_signals(df).collect()
    }
    assert got[0] == (round(1 / 3, 6), round(2 / 3, 6), 0.0, 0.5)
    # single token: no dup, top=1/1; no bigrams -> 0s
    assert got[1] == (0.0, 1.0, 0.0, 0.0)
    # null text: all-zero signals, row preserved
    assert got[2] == (0.0, 0.0, 0.0, 0.0)


def test_repetition_signals_flags_degenerate_doc(spark):
    rows = [(0, "spam ham " * 50), (1, "one two three four five six")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r for r in TA.repetition_signals(df).collect()
    }
    assert got[0]["dup_bigram_frac"] > 0.9 > got[1]["dup_bigram_frac"]
    assert got[0]["top_token_frac"] == 0.5


def test_scrub_pii_planted(spark):
    from news_clustering_and_summarization_spark.operators.text_analysis import (
        scrub_pii,
    )

    rows = [
        (0, "mail a.user+tag@sub.example.org now"),
        (1, "call +1 (555) 867-5309 today"),
        (2, "server at 192.168.100.100 responded"),
        (3, "released 2024-03-01 version 1.2.3"),  # date/version: untouched
        # datetimes: date+hour is 10 digits bridged by -/space, which
        # the phone pattern would eat without the guard step
        (4, "logged at 2026-08-14 00:22:59 by admin"),
        (5, "meeting 14.08.2026 9:30 then call 555-867-5309"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", scrub_pii("text").alias("s")).collect()}
    assert got[0] == "mail <EMAIL> now"
    assert got[1] == "call <PHONE> today"
    assert got[2] == "server at <IP> responded"
    assert got[3] == "released 2024-03-01 version 1.2.3"
    assert got[4] == "logged at 2026-08-14 00:22:59 by admin"
    assert got[5] == "meeting 14.08.2026 9:30 then call <PHONE>"


def test_dedup_paragraphs_planted(spark):
    from news_clustering_and_summarization_spark.operators.text_analysis import (
        dedup_paragraphs,
    )

    doc = "intro text\n\nboilerplate nav\n\nbody text\n\nboilerplate nav\n\nintro text"
    df = spark.createDataFrame([(0, doc)], "doc_id long, text string")
    out = df.select(dedup_paragraphs("text").alias("d")).collect()[0]["d"]
    assert out == "intro text\n\nboilerplate nav\n\nbody text"


def test_dedup_paragraphs_regex_metachar_sep(spark):
    # sep is literal on both split and rejoin even when it contains
    # regex metacharacters ('. ' would otherwise split on every
    # char-followed-by-space; '|' on every position)
    from news_clustering_and_summarization_spark.operators.text_analysis import (
        dedup_paragraphs,
    )

    df = spark.createDataFrame(
        [(0, "alpha beta. alpha beta. gamma"), (1, "a|b|a|c")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["d"]
        for r in df.select(
            "doc_id", dedup_paragraphs("text", sep=". ").alias("d")
        ).collect()
    }
    assert got[0] == "alpha beta. gamma"
    got2 = df.where("doc_id = 1").select(
        dedup_paragraphs("text", sep="|").alias("d")
    ).collect()[0]["d"]
    assert got2 == "a|b|c"


def test_repeated_passages_planted(spark):
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens -> 2 distinct 5-grams
    rows = [
        (0, shared + " one unique tail here now"),
        (1, shared + " two other ending words go"),
        (2, "totally different text with no overlap at all present"),
        (3, "tiny doc"),  # < 5 tokens -> zero passages
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in TA.repeated_passages(df, n=5, min_docs=2).collect()
    }
    # docs 0/1 share exactly the 2 5-grams inside `shared`
    assert got[0]["n_repeated"] == 2 and got[1]["n_repeated"] == 2
    assert got[2]["n_repeated"] == 0
    assert got[3]["n_passages"] == 0 and got[3]["repeated_frac"] == 0.0
    assert got[0]["n_passages"] == 7  # 11 tokens -> 7 5-grams
    assert got[0]["repeated_frac"] == round(2 / 7, 6)


def test_quality_classifier_exact_and_sparse_weights(spark):
    df = spark.createDataFrame(
        [(0, "aa bb cc aa"), (1, "")], "doc_id long, text string"
    )
    w = TA.demo_weights(spark, 64)
    got = {
        r["doc_id"]: r
        for r in TA.hashed_linear_score(df, w, n_buckets=64).collect()
    }
    # token multiplicity counts: 4 token instances
    assert got[0]["n_tokens"] == 4
    assert got[1]["n_tokens"] == 0 and got[1]["score"] == 0.0
    assert got[0]["keep"] == (got[0]["score_raw"] >= 0)
    # sparse weight table: unmatched buckets drop out of the sum
    w1 = w.where(F.col("bucket") < 1)  # nearly empty model
    got1 = {
        r["doc_id"]: r
        for r in TA.hashed_linear_score(df, w1, n_buckets=64).collect()
    }
    assert got1[0]["n_tokens"] <= 4


def test_repeated_passages_oracle(spark, duck):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert_matches_oracle(
        TA.repeated_passages(docs, n=3, min_docs=2),
        duck,
        TA.repeated_passages_sql(n=3, min_docs=2),
    )


def test_quality_classifier_oracle(spark, duck):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert_matches_oracle(
        TA.hashed_linear_score(
            docs, TA.demo_weights(spark, 256), n_buckets=256
        ),
        duck,
        TA.hashed_linear_score_sql(n_buckets=256),
    )


def test_collocations_planted(spark):
    rows = [(i, "strong coffee " + ("word%d other%d " % (i, i)) * 3)
            for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = TA.collocations(df, min_count=5, top_k=10).collect()
    got = {r["bg"]: r for r in out}
    # 'strong coffee' occurs 10x, always adjacent, each word only in
    # that pair (+start); a perfect collocation must rank and score
    assert "strong coffee" in got
    r = got["strong coffee"]
    assert r["c12"] == 10 and r["c1"] == 10 and r["c2"] == 10
    # lift = c12*N/(c1*c2) = 10*N/100 = N/10 where N = total tokens
    n_total = sum(len(t.split()) for _, t in rows)
    assert r["lift"] == round(10 * n_total / 100.0, 6)


def test_collocations_oracle_smoke(spark, duck):
    from tests.conftest import SF_SMOKE as _SF
    docs = spark.read.parquet(f"{_SF}/documents.parquet")
    assert_matches_oracle(
        TA.collocations(docs, min_count=3, top_k=25),
        duck,
        TA.collocations_sql(min_count=3, top_k=25),
    )


def test_k_anonymity_audit_flags_small_classes(spark):
    from news_clustering_and_summarization_spark.operators.profiling import (
        k_anonymity_audit,
    )

    rows = (
        [("US", "a")] * 5        # class of 5 -> safe at k=5
        + [("US", "b")] * 2      # class of 2 -> at risk
        + [(None, "a")] * 1      # NULL forms its own (risky) class
    )
    df = spark.createDataFrame(rows, ["country", "segment"])
    out = {
        (r["country"], r["segment"]): (r["class_size"], r["at_risk"])
        for r in k_anonymity_audit(df, ["country", "segment"], 5).collect()
    }
    assert out[("US", "a")] == (5, False)
    assert out[("US", "b")] == (2, True)
    assert out[(None, "a")] == (1, True)


def test_lm_perplexity_prefers_fluent_text(spark):
    from news_clustering_and_summarization_spark.operators.lm import (
        score_perplexity,
        train_bigram_lm,
    )

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(5)],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),   # in-domain
            (2, "mat the on sat cat the"),   # shuffled
            (3, "zq xv qq zz"),              # out-of-vocab
            (4, "a"),                        # < 2 tokens -> NULL score
        ],
        ["doc_id", "text"],
    )
    big, uni, voc = train_bigram_lm(ref, "text", min_count=2)
    out = {
        r["doc_id"]: r for r in score_perplexity(docs, big, uni, voc).collect()
    }
    # in-domain beats everything; note the add-one floor: fully-OOV
    # bigrams cost ln(1/V) while unseen bigrams after a COMMON word
    # cost ln(1/(c1+V)) < ln(1/V), so shuffled in-vocab text can
    # score BELOW gibberish — thresholding composes with lang_id /
    # quality_score, not instead of them
    assert out[1]["avg_logp"] > out[2]["avg_logp"]
    assert out[1]["avg_logp"] > out[3]["avg_logp"]
    assert out[4]["n_bigrams"] == 0 and out[4]["avg_logp"] is None


def test_winnow_guarantee_and_density(spark):
    from news_clustering_and_summarization_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    # docs share a 9-word passage; with k=4, w=3 any shared passage
    # of >= w+k-1=6 words must share a fingerprint
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k l m n"),
            (2, "x y z q a b c d e f g h w v u t"),
            (3, "p q r s t u v w p q r s"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs, k=4, w=3).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    assert by_doc[1] & by_doc[2], "guaranteed shared fingerprint"
    assert not (by_doc[1] & by_doc[3]), "no shared passage, no match"
    # density: selected fingerprints ~2/(w+1) of windows, far below
    # the full shingle count (11 shingles in doc 1)
    assert len(by_doc[1]) < 11


def test_gopher_filter_names_failures(spark):
    from news_clustering_and_summarization_spark.plans.catalog import (
        QUERIES,
    )
    import tempfile
    import os

    # build a tiny documents table with one doc per failure mode
    rows = [
        (1, "a solid healthy document with plenty of varied and useful words here today", "en", "s", 75),
        (2, "tiny", "en", "s", 4),                                  # too_short
        (3, "spam ham " + "spam ham " * 30, "en", "s", 200),        # repetitive+dominated
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in QUERIES["gopher_filter"](spark, d).collect()}
    assert out[1]["keep"] and out[1]["fail_reasons"] == ""
    assert "too_short" in out[2]["fail_reasons"] and not out[2]["keep"]
    assert "repetitive" in out[3]["fail_reasons"]
    assert "dominated" in out[3]["fail_reasons"]


# --- char_entropy (round 6) ------------------------------------------


def test_char_entropy_hand_cases(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, ""), (4, "abcd")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_chars"], r["entropy_bits"])
        for r in TA.char_entropy(docs, "doc_id", "text").collect()
    }
    assert out[1] == (4, 0.0)          # single class -> zero entropy
    assert out[2][0] == 2 and abs(out[2][1] - 1.0) < 1e-6   # fair coin
    assert out[3] == (0, 0.0)          # empty doc
    assert out[4][0] == 4 and abs(out[4][1] - 2.0) < 1e-6   # 4 classes
    # skewed distribution: H(3/4, 1/4)
    skew = spark.createDataFrame([(1, "aaab")], ["doc_id", "text"])
    r = TA.char_entropy(skew, "doc_id", "text").first()
    want = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert abs(r["entropy_bits"] - want) < 1e-5


def test_mutual_information_hand_cases(spark):
    """Perfectly dependent columns: I(X;Y) = H(X) = ln 2 for a
    balanced binary pair; independent columns: I = 0."""
    import math

    from news_clustering_and_summarization_spark.operators.profiling import (
        mutual_information,
    )

    dep = spark.createDataFrame(
        [("a", "p")] * 4 + [("b", "q")] * 4, ["x", "y"]
    )
    r = mutual_information(dep, "x", "y").first()
    assert r["n"] == 8 and r["cells"] == 2
    assert abs(r["mi_nats"] - math.log(2)) < 1e-6
    ind = spark.createDataFrame(
        [("a", "p"), ("a", "q"), ("b", "p"), ("b", "q")] * 3, ["x", "y"]
    )
    r2 = mutual_information(ind, "x", "y").first()
    assert r2["mi_q"] == 0 and r2["mi_nats"] == 0.0


def test_robust_outliers_flags_only_the_planted_spike(spark):
    """MAD ignores the spike (unlike stddev): 9 values near 10 plus
    one at 1000 -> exactly one outlier; a clean group flags none."""
    from news_clustering_and_summarization_spark.operators.profiling import (
        robust_outliers,
    )

    spiky = [("s", 9.0 + i * 0.25) for i in range(9)] + [("s", 1000.0)]
    clean = [("c", 5.0 + (i % 3) * 0.1) for i in range(10)]
    df = spark.createDataFrame(spiky + clean, ["g", "v"])
    out = {r["g"]: r for r in robust_outliers(df, "g", "v").collect()}
    assert out["s"]["n_outliers"] == 1
    assert out["s"]["outlier_rate_q"] == 100000
    assert out["c"]["n_outliers"] == 0
    assert abs(out["s"]["med"] - 10.125) < 1e-9


def test_rake_keywords_hand_case(spark):
    """'deep learning' (2-word phrase, repeated) outranks singleton
    words; degree/frequency math checks against the Rose et al.
    worked definition; stopword runs break phrases."""
    from news_clustering_and_summarization_spark.operators.text_analysis import (
        rake_keywords,
    )

    rows = [
        (1, "deep learning and deep learning for vision"),
        (2, "the deep learning"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["phrase"]: r for r in rake_keywords(df, top_k=10).collect()
    }
    # phrases: 'deep learning' x3, 'vision' x1 ('and'/'for'/'the'
    # are stopwords). deep: freq 3, deg 6; learning: freq 3, deg 6;
    # vision: freq 1, deg 1.
    dl = got["deep learning"]
    assert dl["n_words"] == 2 and dl["n_occurrences"] == 3
    assert dl["score_q"] == 4_000_000  # 2.0 + 2.0
    v = got["vision"]
    assert v["score_q"] == 1_000_000 and v["n_occurrences"] == 1
    # ranking: multiword phrase first
    assert dl["score_q"] > v["score_q"]


def test_rake_keywords_sql_twin_and_phrase_cap(spark):
    import duckdb
    import hashlib

    from news_clustering_and_summarization_spark.operators.text_analysis import (
        rake_keywords,
        rake_keywords_sql,
    )

    words = ["alpha", "beta", "gamma", "delta", "the", "of", "zed"]
    rows = []
    for i in range(150):
        h = hashlib.md5(f"rk|{i}".encode()).hexdigest()
        txt = " ".join(
            words[int(h[j * 2 : j * 2 + 2], 16) % len(words)]
            for j in range(8)
        )
        rows.append((i, txt))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [
        tuple(r)
        for r in rake_keywords(df, top_k=15, max_phrase_len=3).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = [
        tuple(r)
        for r in con.execute(
            rake_keywords_sql("documents", top_k=15, max_phrase_len=3)
        ).fetchall()
    ]
    assert got == want
    # cap respected
    assert all(r[1] <= 3 for r in got)


def test_heaps_vocab_growth_known_exponent(spark):
    """Synthetic slices built with V = N^0.5 exactly (vocab = sqrt of
    token count, each type repeated sqrt-N times) recover beta ~ 0.5
    with r2 ~ 1."""
    from news_clustering_and_summarization_spark.operators.text_analysis import (
        heaps_vocab_growth,
    )

    rows = []
    for si, v in enumerate([10, 20, 40, 80]):
        # slice si: v distinct types, each repeated v times -> N = v^2
        words = " ".join(
            f"w{si}x{t}" for t in range(v) for _ in range(v)
        )
        rows.append((f"s{si}", words))
    df = spark.createDataFrame(rows, "source string, text string")
    got = heaps_vocab_growth(df).collect()[0]
    assert got["n_slices"] == 4
    assert abs(got["beta_q"] - 500_000) < 2_000
    assert got["r2_q"] > 999_000


def test_heaps_single_slice_is_null(spark):
    """r08 review: one slice -> OLS denominator 0 -> all fit fields
    NULL (not NaN-cast garbage), n_slices still reported."""
    from news_clustering_and_summarization_spark.operators.text_analysis import (
        heaps_vocab_growth,
    )

    df = spark.createDataFrame(
        [("s0", "a b c a b c d e")], "source string, text string"
    )
    got = heaps_vocab_growth(df).collect()[0]
    assert got["n_slices"] == 1
    assert got["beta_q"] is None
    assert got["lnk_q"] is None
    assert got["r2_q"] is None


def test_ctfidf_top_terms_hand_case(spark):
    """Two slices sharing a common word: the shared word scores
    exactly 0 (ln 1) for both, each slice's exclusive word leads its
    ranking with score tf*ln(2)*1e6."""
    from news_clustering_and_summarization_spark.operators.text_analysis import (
        ctfidf_top_terms,
    )

    rows = [
        ("g1", "alpha alpha shared"),
        ("g2", "beta shared shared"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r["source"], r["rank"]): r
        for r in ctfidf_top_terms(df, "source", "text", k=2).collect()
    }
    ln2q = 693147  # round(ln(2) * 1e6)
    g1 = got[("g1", 1)]
    assert (g1["term"], g1["tf"], g1["score_q"]) == ("alpha", 2, 2 * ln2q)
    g2 = got[("g2", 1)]
    assert (g2["term"], g2["tf"], g2["score_q"]) == ("beta", 1, ln2q)
    assert got[("g1", 2)]["term"] == "shared"
    assert got[("g1", 2)]["score_q"] == 0


def test_corpus_signals_matches_naive_composition(spark, docs):
    """r11: corpus_signals shares ONE tokenization across all signals;
    every value must equal the naive per-operator composition."""
    naive = TA.token_counts(
        TA.quality_score(docs).withColumn("lang_pred", TA.language_id("text"))
    )
    fused = TA.corpus_signals(docs)
    cols = [
        "doc_id", "n_chars", "n_tokens", "stopword_ratio", "punct_ratio",
        "mean_word_len", "quality_score", "lang_pred", "ws_token_count",
        "bpe_token_estimate",
    ]
    a = sorted(map(tuple, naive.select(cols).collect()))
    b = sorted(map(tuple, fused.select(cols).collect()))
    assert a == b


def test_quality_features_tokens_col_reuse(spark, docs):
    """Passing a pre-materialized tokens_col must not change values."""
    pre = docs.withColumn("_tok", H.tokens("text"))
    a = sorted(
        map(
            tuple,
            TA.quality_features(docs)
            .select("doc_id", "n_tokens", "stopword_ratio", "mean_word_len")
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            TA.quality_features(pre, tokens_col="_tok")
            .select("doc_id", "n_tokens", "stopword_ratio", "mean_word_len")
            .collect(),
        )
    )
    assert a == b
