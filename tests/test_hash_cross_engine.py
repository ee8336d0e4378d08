"""Fuzz the cross-engine hash primitives: every *_sql twin must agree
with its Spark expression bit-for-bit over randomized inputs (unicode,
punctuation, empties, long strings). These primitives carry the whole
oracle gate — minhash/simhash/fingerprint/sampling all reduce to them."""

from __future__ import annotations

import random
import string

import pyspark.sql.functions as F
import pytest

from news_clustering_and_summarization_spark.functions import hashing as H

ALPHABETS = [
    string.ascii_letters + string.digits + " ",
    string.printable,
    "äöüßéèñçπЖ中文句子 🙂🚀 \t\n'\"\\",
]


def _random_corpus(n: int = 300, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    out = ["", " ", "a", "<p>html &quot;entities&quot;</p>"]
    while len(out) < n:
        alpha = rng.choice(ALPHABETS)
        out.append(
            "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 200)))
        )
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, s) for i, s in enumerate(_random_corpus())]
    df = spark.createDataFrame(rows, ["i", "s"])
    return df, rows


def _compare(spark, duck, df, rows, spark_col, sql_expr):
    got = {
        r["i"]: r["v"] for r in df.select("i", spark_col.alias("v")).collect()
    }
    duck.execute("CREATE OR REPLACE TABLE _fuzz(i BIGINT, s VARCHAR)")
    duck.executemany("INSERT INTO _fuzz VALUES (?, ?)", rows)
    want = dict(
        duck.execute(f"SELECT i, {sql_expr} AS v FROM _fuzz").fetchall()
    )
    mism = {
        i: (got[i], want[i])
        for i in want
        if got[i] != want[i]
        and not (got[i] is None and want[i] is None)
    }
    assert not mism, list(mism.items())[:5]


def test_hash64_agrees(spark, duck, corpus):
    df, rows = corpus
    _compare(spark, duck, df, rows, H.hash64(F.col("s")), H.hash64_sql("s"))
    _compare(
        spark, duck, df, rows,
        H.hash64(F.col("s"), seed=99), H.hash64_sql("s", seed=99),
    )


def test_shingle_hash31_agrees(spark, duck, corpus):
    df, rows = corpus
    _compare(
        spark, duck, df, rows,
        H.shingle_hash31(F.col("s")), H.shingle_hash31_sql("s"),
    )


def test_tokens_agree(spark, duck, corpus):
    df, rows = corpus
    _compare(
        spark, duck, df, rows,
        F.to_json(H.tokens("s")),
        f"to_json({H.tokens_sql('s')})",
    )


def test_simhash_agrees(spark, duck, corpus):
    df, rows = corpus
    _compare(
        spark, duck, df, rows,
        H.simhash(H.tokens("s")),
        H.simhash_sql(H.tokens_sql("s")),
    )


def test_fingerprint_agrees(spark, duck, corpus):
    df, rows = corpus
    _compare(
        spark, duck, df, rows,
        H.fingerprint(H.tokens("s")),
        H.fingerprint_sql(H.tokens_sql("s")),
    )


def test_token_buckets_agree(spark, duck, corpus):
    from news_clustering_and_summarization_spark.operators import (
        text_analysis as TA,
    )

    df, rows = corpus
    _compare(
        spark, duck, df, rows,
        F.to_json(TA.token_buckets("s", 1024)),
        f"to_json({TA.token_buckets_sql('s', 1024)})",
    )


def test_vector_compression_twins_agree(spark, duck):
    """quantize_int8 / project_jl numeric twins over randomized
    vectors (zeros, tiny, negative, mixed magnitude)."""
    import random

    from news_clustering_and_summarization_spark.functions import (
        vectors as V,
    )

    rng = random.Random(11)
    vecs = [[0.0] * 8, [1e-12] * 8, [-3.5] * 8]
    while len(vecs) < 60:
        vecs.append(
            [rng.uniform(-10, 10) * rng.choice([1e-6, 1, 1e3])
             for _ in range(8)]
        )
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "i long, v array<double>")
    signs = V.rademacher_signs(8, 4)
    scale, q = V.quantize_int8(F.col("v"))
    got = {
        r["i"]: (round(r["s"], 6), r["q"], [round(x, 6) for x in r["p"]])
        for r in df.select(
            "i", scale.alias("s"), q.alias("q"),
            V.project_jl(F.col("v"), signs).alias("p"),
        ).collect()
    }
    duck.execute("CREATE OR REPLACE TABLE _vf(i BIGINT, v DOUBLE[])")
    duck.executemany("INSERT INTO _vf VALUES (?, ?)", rows)
    s_sql, q_sql = V.quantize_int8_sql("v")
    p_sql = V.project_jl_sql("v", signs)
    want = {
        i: (round(s, 6), qq, [round(x, 6) for x in p])
        for i, s, qq, p in duck.execute(
            f"SELECT i, {s_sql}, {q_sql}, {p_sql} FROM _vf"
        ).fetchall()
    }
    assert got == want
