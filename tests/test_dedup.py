"""Dedup operators vs DuckDB oracles on the real documents table, plus
planted-duplicate golden cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.functions import hashing as H
from news_clustering_and_summarization_spark.operators import dedup as D
from tests.conftest import SF_SMOKE, assert_matches_oracle


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def _planted(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy dog again and once"),   # near dup of 0
        (3, "completely different content about spark query engines at scale"),
        (4, "completely different content about spark query engines at scale"),  # exact dup of 3
        (5, "unrelated text regarding weather patterns in northern regions"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates_planted(spark):
    df = _planted(spark)
    dups = {
        (r["doc_id"], r["canonical_id"])
        for r in D.exact_duplicates(df).collect()
    }
    assert dups == {(0, 0), (1, 0), (3, 3), (4, 3)}
    kept = {r["doc_id"] for r in D.dedup_exact(df).collect()}
    assert kept == {0, 2, 3, 5}


def test_exact_duplicates_oracle(spark, docs, duck):
    got = D.exact_duplicates(docs)
    oracle = """
    WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
    g AS (SELECT content_hash, min(doc_id) AS canonical_id, count(*) AS n
          FROM h GROUP BY content_hash)
    SELECT h.doc_id, g.canonical_id, h.content_hash
    FROM h JOIN g USING (content_hash) WHERE g.n >= 2
    """
    assert_matches_oracle(got, duck, oracle)


def test_ngram_jaccard_planted(spark):
    df = _planted(spark)
    pairs = {
        (r["l_id"], r["r_id"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert (3, 4) in pairs
    assert not any({l, r} == {0, 3} for l, r in pairs)


def test_ngram_jaccard_oracle(spark, docs, duck):
    got = D.ngram_jaccard_pairs(docs, n=3, threshold=0.5).withColumn(
        "jaccard", F.round("jaccard", 6)
    )
    tok = H.tokens_sql("text")
    sh = H.word_shingles_sql(tok, 3)
    oracle = f"""
    WITH s AS (
      SELECT doc_id AS id, list_distinct({sh}) AS sh FROM documents
      WHERE len({sh}) > 0
    ),
    inv AS (SELECT id, unnest(sh) AS g FROM s),
    co AS (
      SELECT a.id AS l_id, b.id AS r_id, count(*) AS inter
      FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT co.l_id, co.r_id,
           round(inter::DOUBLE / (la.n + lb.n - inter), 6) AS jaccard
    FROM co
    JOIN (SELECT id, len(sh) AS n FROM s) la ON la.id = co.l_id
    JOIN (SELECT id, len(sh) AS n FROM s) lb ON lb.id = co.r_id
    WHERE inter::DOUBLE / (la.n + lb.n - inter) >= 0.5
    """
    assert_matches_oracle(got, duck, oracle)


def _shingled(df, n=3):
    return (
        df.select(
            F.col("doc_id").alias("id"),
            F.array_distinct(
                H.word_shingles(H.tokens("text"), n)
            ).alias("sh"),
        )
        .where(F.size("sh") > 0)
    )


def test_ngram_hot_shingle_cap_bounds_candidates(spark):
    # 300 docs all sharing one hot trigram, plus one genuine near-dup
    # pair with unique vocabulary. Uncapped candidate generation is
    # O(df^2) on the hot posting list; the cap removes it entirely.
    rows = [
        (i, f"alpha beta gamma u{i}a u{i}b u{i}c u{i}d") for i in range(300)
    ]
    rows += [(1000, "x1 x2 x3 x4 x5 x6"), (1001, "x1 x2 x3 x4 x5 x7")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = _shingled(df)
    uncapped = D.ngram_candidate_pairs(sh).count()
    capped = D.ngram_candidate_pairs(sh, max_shingle_df=50).count()
    assert uncapped >= 300 * 299 // 2  # hot-shingle blowup is real
    assert capped == 1  # only the genuine near-dup pair survives
    # and the surviving pair's jaccard is exact (3 shared / 5 union)
    pairs = {
        (r["l_id"], r["r_id"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(
            df, threshold=0.5, max_shingle_df=50
        ).collect()
    }
    assert pairs == {(1000, 1001): 0.6}


def test_ngram_cap_preserves_scores(spark, docs):
    # With a cap no posting list on the fixture corpus exceeds, the
    # capped path (candidate cap + array re-verify) must return exactly
    # the uncapped result — scores included.
    uncapped = {
        (r["l_id"], r["r_id"]): round(r["jaccard"], 9)
        for r in D.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    capped = {
        (r["l_id"], r["r_id"]): round(r["jaccard"], 9)
        for r in D.ngram_jaccard_pairs(
            docs, n=3, threshold=0.5, max_shingle_df=10**6
        ).collect()
    }
    assert capped == uncapped


def test_ngram_jaccard_capped_oracle(spark, docs, duck):
    # The catalog query runs the capped path; its oracle encodes the
    # same df cap — both engines drop the same hot shingles.
    from news_clustering_and_summarization_spark.plans import catalog

    got = D.ngram_jaccard_pairs(
        docs, n=3, threshold=0.5, max_shingle_df=catalog.NGRAM_SHINGLE_DF_CAP
    ).withColumn("jaccard", F.round("jaccard", 6))
    assert_matches_oracle(got, duck, catalog.oracle_ngram_jaccard())


def test_minhash_candidates_and_verify(spark):
    df = _planted(spark)
    nd = {
        (r["l_id"], r["r_id"])
        for r in D.minhash_near_duplicates(df, threshold=0.5).collect()
    }
    # exact dups always collide in every band
    assert (0, 1) in nd and (3, 4) in nd
    # verified: no false positives vs exact jaccard
    exact = {
        (r["l_id"], r["r_id"])
        for r in D.ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    assert nd <= exact


def test_minhash_signature_oracle(spark, docs, duck):
    sig = docs.select(
        "doc_id",
        H.minhash_signature(
            H.word_shingles(H.tokens("text"), 3), 8
        ).alias("sig"),
    ).where(~F.exists("sig", lambda v: v.isNull()))
    tok = H.tokens_sql("text")
    sh = H.word_shingles_sql(tok, 3)
    oracle = f"""
    SELECT doc_id, {H.minhash_signature_sql(sh, 8)} AS sig
    FROM documents WHERE len({sh}) > 0
    """
    assert_matches_oracle(sig, duck, oracle)


def test_simhash_duplicates_planted(spark):
    # identical docs -> hamming 0; verify candidates found via blocks
    df = _planted(spark)
    got = {
        (r["l_id"], r["r_id"]): r["hamming"]
        for r in D.simhash_duplicates(df, max_hamming=10).collect()
    }
    assert got.get((0, 1)) == 0
    assert got.get((3, 4)) == 0
    assert (0, 2) in got  # one word changed -> small hamming distance


def test_simhash_fingerprint_oracle(spark, docs, duck):
    got = D.simhash_fingerprints(docs)
    tok = H.tokens_sql("text")
    oracle = f"SELECT doc_id, {H.simhash_sql(tok)} AS simhash FROM documents"
    assert_matches_oracle(got, duck, oracle)


def test_embedding_near_duplicates(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    pairs = D.embedding_near_duplicates(
        emb, eps=0.6, strategy="cross"
    ).collect()
    assert all(r["l_id"] < r["r_id"] and r["dist"] <= 0.6 for r in pairs)
    assert len(pairs) > 0


def test_tfidf_near_duplicates_reference_semantics(spark):
    rows = [
        ("g1", 0, "stocks rally as markets surge on earnings beat today"),
        ("g1", 1, "stocks rally as markets surge on earnings beat today"),
        ("g1", 2, "central bank holds interest rates steady this quarter"),
        ("g2", 3, "stocks rally as markets surge on earnings beat today"),
    ]
    df = spark.createDataFrame(rows, "cluster string, doc_id long, text string")
    got = {
        (r["cluster"], r["l_id"], r["r_id"])
        for r in D.tfidf_near_duplicates(df, threshold=0.9).collect()
    }
    # only the same-group identical pair; cross-group twin untouched
    assert got == {("g1", 0, 1)}


def test_decontaminate_hand_computed(spark):
    from news_clustering_and_summarization_spark.operators.dedup import (
        decontaminate,
    )

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words nothing shared here today"),
            (3, "ab"),  # < n tokens -> excluded (no n-grams)
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, "we saw the quick brown fox yesterday")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in decontaminate(train, test, n=3).collect()}
    assert set(got) == {1, 2}
    # train doc 1 has 7 distinct 3-grams; "the quick brown" and
    # "quick brown fox" appear in the test doc
    assert got[1]["n_ngrams"] == 7
    assert got[1]["n_hit_ngrams"] == 2
    assert got[1]["contaminated"] == 1
    assert got[1]["contamination_frac"] == round(2 / 7, 6)
    assert got[2]["n_hit_ngrams"] == 0
    assert got[2]["contaminated"] == 0


def test_minhash_incremental_with_persisted_band_table(spark, tmp_path):
    """The parquet round-tripped band table must yield the same pairs
    as building from history in place, and candidates must only pair
    batch ids with history ids."""
    from news_clustering_and_summarization_spark.operators.dedup import (
        minhash_band_table,
        minhash_incremental_near_duplicates,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    batch = docs.where("doc_id % 5 = 4")
    history = docs.where("doc_id % 5 <> 4")
    path = str(tmp_path / "band_table")
    minhash_band_table(history, n=3, k=16, bands=4).write.parquet(path)
    stored = spark.read.parquet(path)
    via_store = minhash_incremental_near_duplicates(
        batch, history, n=3, threshold=0.5, k=16, bands=4,
        band_table=stored,
    )
    direct = minhash_incremental_near_duplicates(
        batch, history, n=3, threshold=0.5, k=16, bands=4
    )
    a = sorted((r["l_id"], r["r_id"], round(r["jaccard"], 6))
               for r in via_store.collect())
    b = sorted((r["l_id"], r["r_id"], round(r["jaccard"], 6))
               for r in direct.collect())
    assert a == b and len(a) > 0
    assert all(l % 5 == 4 and r % 5 != 4 for l, r, _ in a)


def test_minhash_incremental_equals_cross_set_slice_of_full_run(spark):
    """inc(batch, history) must equal the one-shot minhash pairs
    restricted to one-endpoint-in-each-set (direction normalized) —
    the two paths share banding, so any divergence is a bug."""
    from news_clustering_and_summarization_spark.operators.dedup import (
        minhash_incremental_near_duplicates,
        minhash_near_duplicates,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    batch = docs.where("doc_id % 5 = 4")
    history = docs.where("doc_id % 5 <> 4")
    inc = {
        (r["l_id"], r["r_id"], round(r["jaccard"], 6))
        for r in minhash_incremental_near_duplicates(
            batch, history, n=3, threshold=0.5, k=16, bands=4
        ).collect()
    }
    full = minhash_near_duplicates(
        docs, n=3, threshold=0.5, k=16, bands=4
    ).collect()
    cross = set()
    for r in full:
        a, b, j = r["l_id"], r["r_id"], round(r["jaccard"], 6)
        if (a % 5 == 4) != (b % 5 == 4):  # one endpoint per set
            l, rr = (a, b) if a % 5 == 4 else (b, a)
            cross.add((l, rr, j))
    assert inc == cross and len(inc) > 0


def test_semantic_dedup_drops_planted_cluster_mates(spark):
    # two tight groups + one singleton; within each group the
    # smaller-id row survives and near-copies drop at tau=0.95
    from news_clustering_and_summarization_spark.operators.dedup import (
        semantic_dedup,
    )

    def vec(base, jitter):
        v = [0.0] * 8
        v[base] = 1.0
        v[(base + 1) % 8] = jitter
        return v

    rows = [
        (1, vec(0, 0.0)),
        (2, vec(0, 0.01)),   # cos ~0.99995 with id 1 -> drop
        (3, vec(4, 0.0)),
        (4, vec(4, 0.02)),   # near id 3 -> drop
        (5, vec(2, 0.0)),    # alone -> keep
    ]
    df = spark.createDataFrame(rows, ["id", "v"])
    out = {
        r["id"]: r["keep"]
        for r in semantic_dedup(
            df, "id", "v", k=3, tau=0.95, n_iter=2, dim=8
        ).collect()
    }
    assert out == {1: True, 2: False, 3: True, 4: False, 5: True}


def test_semantic_dedup_zero_vector_matches_nothing(spark):
    from news_clustering_and_summarization_spark.operators.dedup import (
        semantic_dedup,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),   # zero norm: no cosine defined
        (3, [0.0, 0.0, 0.0, 0.0]),   # second zero vector
    ]
    df = spark.createDataFrame(rows, ["id", "v"])
    out = {
        r["id"]: r["keep"]
        for r in semantic_dedup(
            df, "id", "v", k=1, tau=0.5, n_iter=1, dim=4
        ).collect()
    }
    assert out == {1: True, 2: True, 3: True}, (
        "zero vectors must not match anything (not even each other)"
    )


# --- tfidf_exact_pairs (round 6: J5 exact-replay variant) ------------


def test_tfidf_exact_pairs_hand_case(spark):
    from news_clustering_and_summarization_spark.operators.dedup import (
        tfidf_exact_pairs,
    )

    docs = spark.createDataFrame(
        [
            ("g1", 1, "cat dog fish"),
            ("g1", 2, "cat dog fish"),   # identical -> cosine 1.0
            ("g1", 3, "zebra yak emu"),  # disjoint -> no pair
            ("g2", 4, "cat dog fish"),   # other group -> no cross pair
        ],
        ["grp", "id", "text"],
    )
    out = tfidf_exact_pairs(
        docs, "grp", "id", "text", threshold=0.5, max_df_frac=1.0
    ).collect()
    assert [(r["grp"], r["l_id"], r["r_id"], r["cosine"]) for r in out] == [
        ("g1", 1, 2, 1.0)
    ]


def test_tfidf_exact_pairs_df_pruning(spark):
    from news_clustering_and_summarization_spark.operators.dedup import (
        tfidf_exact_pairs,
    )

    # 'the' appears in every doc; with max_df_frac=0.5 it is pruned,
    # so docs sharing ONLY 'the' produce no candidate pair
    docs = spark.createDataFrame(
        [
            ("g", 1, "the cat"),
            ("g", 2, "the dog"),
            ("g", 3, "the bird"),
        ],
        ["grp", "id", "text"],
    )
    out = tfidf_exact_pairs(
        docs, "grp", "id", "text", threshold=0.0, max_df_frac=0.5
    ).collect()
    assert out == []


# --- containment_pairs (round 6: asymmetric sub-document dup) --------


def test_containment_asymmetric_quote(spark):
    from news_clustering_and_summarization_spark.operators.dedup import (
        containment_pairs,
    )

    quote = "alpha beta gamma delta epsilon zeta eta"
    long_doc = quote + " " + " ".join(f"filler{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, quote), (2, long_doc), (3, "unrelated words entirely here")],
        ["doc_id", "text"],
    )
    out = containment_pairs(
        docs, "doc_id", "text", n=5, threshold=0.5
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["l_id"], r["r_id"]) == (1, 2)
    # every 5-gram of the quote appears in the long doc -> left
    # containment 1.0; right containment far below threshold
    assert r["cont_l_q"] == 1_000_000
    assert r["cont_r_q"] < 200_000
    # Jaccard for this pair would be inter/union = 3/43 -- the case
    # containment exists to catch


def test_containment_capped_reverifies_exact(spark):
    from news_clustering_and_summarization_spark.operators.dedup import (
        containment_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "one two three four five six"),
            (2, "one two three four five six seven"),
            (3, "one two three four five six eight"),
        ],
        ["doc_id", "text"],
    )
    unc = {
        (r["l_id"], r["r_id"]): (r["inter"], r["cont_l_q"], r["cont_r_q"])
        for r in containment_pairs(
            docs, "doc_id", "text", n=3, threshold=0.3
        ).collect()
    }
    cap = {
        (r["l_id"], r["r_id"]): (r["inter"], r["cont_l_q"], r["cont_r_q"])
        for r in containment_pairs(
            docs, "doc_id", "text", n=3, threshold=0.3, max_shingle_df=2
        ).collect()
    }
    # capped candidates that survive carry EXACT re-verified values
    for k in cap:
        assert cap[k] == unc[k]


def test_tfidf_mllib_and_exact_paths_agree_on_planted_dups(spark):
    """The reference-parity MLlib path (tfidf_near_duplicates) and the
    oracle-replayable exact path (tfidf_exact_pairs) must both surface
    the planted high-similarity pair and agree no disjoint pair
    qualifies — same semantics, two formulations."""
    from news_clustering_and_summarization_spark.operators.dedup import (
        tfidf_exact_pairs,
        tfidf_near_duplicates,
    )

    near = "markets rallied on strong earnings and upbeat guidance today"
    docs = spark.createDataFrame(
        [
            ("g", 1, near),
            ("g", 2, near + " again"),
            ("g", 3, "volcanic eruption disrupts island flights overnight"),
        ],
        ["cluster", "doc_id", "text"],
    )
    ml = {
        (r["l_id"], r["r_id"])
        for r in tfidf_near_duplicates(docs, threshold=0.5).collect()
    }
    exact = {
        (r["l_id"], r["r_id"])
        for r in tfidf_exact_pairs(
            docs, "cluster", "doc_id", "text",
            threshold=0.5, max_df_frac=1.0,
        ).collect()
    }
    assert (1, 2) in ml and (1, 2) in exact
    assert (1, 3) not in ml and (1, 3) not in exact
    assert (2, 3) not in ml and (2, 3) not in exact


def test_duplicate_spans_shared_passage(spark):
    """Two docs sharing a 10-token passage: each gets ONE span of
    exactly 10 tokens; a unique doc yields no row."""
    from news_clustering_and_summarization_spark.operators.dedup import (
        duplicate_spans,
    )

    shared = "q w e r t y u i o p"  # 10 tokens
    df = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma"),
            (2, f"delta {shared} epsilon zeta"),
            (3, "totally unique words only here nothing shared at all"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["id"]: r
        for r in duplicate_spans(df, n=5, min_span=8).collect()
    }
    assert set(out) == {1, 2}
    for r in out.values():
        assert r["n_spans"] == 1 and r["dup_tokens"] == 10


def test_duplicate_spans_short_run_excluded(spark):
    """A shared 6-token passage produces anchors but the merged span
    (6 tokens) is under min_span=8 and must be dropped."""
    from news_clustering_and_summarization_spark.operators.dedup import (
        duplicate_spans,
    )

    shared = "q w e r t y"  # 6 tokens -> 2 anchors at n=5 -> span 6
    df = spark.createDataFrame(
        [(1, f"aa bb {shared} cc"), (2, f"dd {shared} ee")],
        ["doc_id", "text"],
    )
    assert duplicate_spans(df, n=5, min_span=8).count() == 0
    # with the threshold at 6 the same spans qualify
    out = duplicate_spans(df, n=5, min_span=6).collect()
    assert sorted((r["id"], r["dup_tokens"]) for r in out) == [
        (1, 6),
        (2, 6),
    ]


def test_source_jaccard_hand_case(spark):
    """Two sources sharing half their shingles; a third disjoint.
    Shingles are word 3-grams, so docs share a shingle only via a
    3-token overlap."""
    from news_clustering_and_summarization_spark.operators.dedup import (
        source_jaccard,
    )

    rows = [
        (1, "alpha beta gamma delta", "A"),   # shingles: ab g, b g d
        (2, "alpha beta gamma zeta", "B"),    # shares 'alpha beta gamma'
        (3, "one two three four", "C"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {
        (r["src_a"], r["src_b"]): r
        for r in source_jaccard(df).collect()
    }
    # A: {abg, bgd}, B: {abg, bgz} -> inter 1, union 3
    assert set(got) == {("A", "B")}
    r = got[("A", "B")]
    assert (r["inter"], r["size_a"], r["size_b"]) == (1, 2, 2)
    assert r["jaccard_q"] == 333_333


def test_source_jaccard_sql_twin(spark):
    import duckdb
    import hashlib

    from news_clustering_and_summarization_spark.operators.dedup import (
        source_jaccard,
        source_jaccard_sql,
    )

    words = ["red", "blue", "green", "gold", "iron", "clay", "moss"]
    rows = []
    for i in range(120):
        h = hashlib.md5(f"sj|{i}".encode()).hexdigest()
        txt = " ".join(
            words[int(h[j * 2 : j * 2 + 2], 16) % len(words)]
            for j in range(6)
        )
        rows.append((i, txt, f"s{int(h[:2], 16) % 4}"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = sorted(tuple(r) for r in source_jaccard(df).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
        "source VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(source_jaccard_sql("documents")).fetchall()
    )
    assert got == want


def test_source_jaccard_kmv_exact_when_union_fits(spark):
    """With k >= the true union size the KMV estimate IS exact:
    matches/k' = true Jaccard, union_est = true union, and
    zero-overlap pairs appear with jaccard_q = 0 (the planning
    answer the exact variant's inner join drops)."""
    from news_clustering_and_summarization_spark.operators.dedup import (
        source_jaccard_kmv,
    )

    rows = [
        (1, "alpha beta gamma delta", "A"),
        (2, "alpha beta gamma zeta", "B"),
        (3, "one two three four", "C"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {
        (r["src_a"], r["src_b"]): r
        for r in source_jaccard_kmv(df, k=512).collect()
    }
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = got[("A", "B")]
    assert (ab["k_ab"], ab["matches"], ab["union_est"]) == (3, 1, 3)
    assert ab["inter_est"] == 1 and ab["jaccard_q"] == 333_333
    for pair in (("A", "C"), ("B", "C")):
        assert got[pair]["jaccard_q"] == 0
        assert got[pair]["inter_est"] == 0


def test_source_jaccard_kmv_tracks_exact(spark):
    """On a 120-doc corpus the k=64 sketch estimate lands within
    0.1 absolute Jaccard of the exact operator for every pair the
    exact variant emits, and the SQL twin is bit-identical."""
    import duckdb
    import hashlib

    from news_clustering_and_summarization_spark.operators.dedup import (
        source_jaccard,
        source_jaccard_kmv,
        source_jaccard_kmv_sql,
    )

    words = ["red", "blue", "green", "gold", "iron", "clay", "moss"]
    rows = []
    for i in range(120):
        h = hashlib.md5(f"sj|{i}".encode()).hexdigest()
        txt = " ".join(
            words[int(h[j * 2 : j * 2 + 2], 16) % len(words)]
            for j in range(6)
        )
        rows.append((i, txt, f"s{int(h[:2], 16) % 4}"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    exact = {
        (r["src_a"], r["src_b"]): r["jaccard_q"]
        for r in source_jaccard(df).collect()
    }
    est_rows = source_jaccard_kmv(df, k=64).collect()
    est = {(r["src_a"], r["src_b"]): r["jaccard_q"] for r in est_rows}
    for pair, jq in exact.items():
        assert abs(est[pair] - jq) <= 100_000, (pair, est[pair], jq)
    got = sorted(tuple(r) for r in est_rows)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
        "source VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            source_jaccard_kmv_sql("documents", k=64)
        ).fetchall()
    )
    assert got == want


def test_source_jaccard_kmv_prefilter_lossless(spark):
    """The r08 τ-prefilter must be invisible in the output: the
    prefiltered path equals the direct path row-for-row, both at a
    comfortable margin (no fallback) and at margin=1 with a tiny k
    (τ cuts to ~k survivors, so the short-source fallback
    recompute path is actually exercised)."""
    import hashlib

    from news_clustering_and_summarization_spark.operators.dedup import (
        source_jaccard_kmv,
    )

    words = ["red", "blue", "green", "gold", "iron", "clay", "moss"]
    rows = []
    for i in range(120):
        h = hashlib.md5(f"sjp|{i}".encode()).hexdigest()
        txt = " ".join(
            words[int(h[j * 2 : j * 2 + 2], 16) % len(words)]
            for j in range(6)
        )
        rows.append((i, txt, f"s{int(h[:2], 16) % 4}"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    for k, margin in [(64, 4), (8, 1)]:
        direct = sorted(
            tuple(r)
            for r in source_jaccard_kmv(
                df, k=k, prefilter_margin=None
            ).collect()
        )
        pref = sorted(
            tuple(r)
            for r in source_jaccard_kmv(
                df, k=k, prefilter_margin=margin
            ).collect()
        )
        assert pref == direct, (k, margin)


def test_setsim_join_prefix_filter_lossless(spark):
    """Hand case: two near-identical docs pass threshold, an
    unrelated doc never pairs; the independent quadratic oracle
    (tokens mode AND shingle mode) agrees exactly — certifying the
    prefix filter drops no qualifying pair."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.dedup import (
        setsim_join,
        setsim_join_sql,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "x", "s", 1),
        (2, "the quick brown fox jumps over the lazy cat", "x", "s", 1),
        (3, "entirely different words appear in this one", "x", "s", 1),
        (4, "the quick brown fox jumps over the lazy dog", "x", "s", 1),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    for n in (1, 3):
        got = sorted(
            tuple(r)
            for r in setsim_join(df, shingle_n=n).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
            "lang VARCHAR, source VARCHAR, n_chars BIGINT)"
        )
        con.executemany(
            "INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows
        )
        want = sorted(
            tuple(r)
            for r in con.execute(
                setsim_join_sql("documents", shingle_n=n)
            ).fetchall()
        )
        assert got == want
        pairs = {(a, b) for a, b, *_ in got}
        assert (1, 4) in pairs          # exact dup always qualifies
        assert not any(3 in p for p in pairs)
    # exact dup pair has jaccard 1
    got1 = {
        (r["id_a"], r["id_b"]): r["jaccard_q"]
        for r in setsim_join(df, shingle_n=3).collect()
    }
    assert got1[(1, 4)] == 1_000_000


def test_setsim_join_threshold_boundary(spark):
    """Sets {a,b,c,d} vs {a,b,c,e}: J = 3/5 >= 1/2 passes; vs
    {a,b,x,y}: J = 2/6 = 1/3 < 1/2 fails; exact boundary J = 1/2
    passes (>= semantics)."""
    from news_clustering_and_summarization_spark.operators.dedup import (
        setsim_join,
    )

    rows = [
        (1, "a b c d", "x", "s", 1),
        (2, "a b c e", "x", "s", 1),
        (3, "a b x y", "x", "s", 1),
        (4, "a b c d e f", "x", "s", 1),  # vs 1: inter 4, union 6 -> 2/3
        (5, "a b c d e f g h", "x", "s", 1),  # vs 1: 4/8 = exactly 1/2
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["union_sz"])
        for r in setsim_join(df, shingle_n=1).collect()
    }
    assert (1, 2) in got and got[(1, 2)] == (3, 5)
    assert (1, 3) not in got
    assert (1, 5) in got and got[(1, 5)] == (4, 8)  # boundary >= 


def test_kmv_short_sources_catches_zero_survivor_source(spark):
    """r08 advisor: the τ-prefilter audit must flag a source whose
    threshold cut ALL its hashes (zero survivor rows) — invisible to
    a survivors-only groupBy, caught by driving the audit from
    `taus` with a left join + coalesce(0)."""
    from news_clustering_and_summarization_spark.operators.dedup import (
        _kmv_short_sources,
    )

    maxh = 1 << 60
    taus = spark.createDataFrame(
        [("full", maxh), ("clipped", 100), ("wiped", 10)],
        "src string, _tau long",
    )
    filtered = spark.createDataFrame(
        # "full" kept everything (tau = MAXH, never short); "clipped"
        # kept one row (< k); "wiped" kept NOTHING (the advisor case)
        [("full", 1, maxh), ("full", 2, maxh), ("clipped", 5, 100)],
        "src string, h long, _tau long",
    )
    got = sorted(r.src for r in _kmv_short_sources(taus, filtered, k=2).collect())
    assert got == ["clipped", "wiped"]
