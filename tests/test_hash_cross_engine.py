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
