"""N-gram language-model perplexity scoring — the CCNet-style
quality filter (Wenzek et al. 2020): score every document by a
reference language model and keep the fluent ones. CCNet uses a
KenLM 5-gram; the DataFrame-native equivalent here is an add-one
smoothed bigram model, which keeps the whole pipeline inside the
engine (no external model artifact) while exercising the identical
plan shape a KenLM-backed scorer would need.

* **Training is two integer-count shuffles** over the reference
  corpus: bigram counts c(w1,w2) and unigram counts c(w1), with
  ``min_count`` pruning the bigram table (at web scale the unpruned
  table is vocab² — pruning to count >= 2 drops the hapax tail that
  dominates rows but not probability mass).
* **Scoring joins each document's bigram instances** to the model:
  P(w2|w1) = (c2+1)/(c1+V) covers seen and unseen cases in ONE
  formula (c2, c1 default 0 via left joins; V = unigram vocab size).
  The per-instance log is quantized to a 1e-6 integer — a scalar
  function of exact integer counts, so identical in any engine — and
  the per-document total is an EXACT integer sum (the same
  no-float-drift contract as DSIR weights, operators/sampling.py).
* At scale the unigram table broadcasts (vocab-bounded) and the
  bigram model joins on (w1, w2) — shuffle-sized by the pruned model,
  or broadcast when pruning keeps it small.

Output per document: bigram count, exact quantized total, average
log-probability (the monotone equivalent of perplexity:
ppl = exp(-avg_logp); avg is reported instead of exp'd to keep the
surface bit-reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions.exact import half_away_div

__all__ = ["LM_LOG_QUANT", "train_bigram_lm", "score_perplexity"]

LM_LOG_QUANT = 1_000_000


def _bigram_instances(
    df: DataFrame, text_col: str, *carry: str
) -> DataFrame:
    toks = H.tokens(F.col(text_col))
    pairs = F.expr(
        "CASE WHEN size(__toks) < 2 THEN "
        "cast(array() AS array<struct<w1 string, w2 string>>) "
        "ELSE transform(sequence(1, size(__toks) - 1), "
        "i -> struct(__toks[i-1] AS w1, __toks[i] AS w2)) END"
    )
    return (
        df.withColumn("__toks", toks)
        .select(*carry, F.explode(pairs).alias("p"))
        .select(*carry, "p.w1", "p.w2")
    )


def train_bigram_lm(
    reference: DataFrame, text_col: str = "text", min_count: int = 2
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (bigrams, unigrams, vocab): bigram counts pruned to
    ``min_count``, unigram counts, and a one-row vocab size V."""
    bg = _bigram_instances(reference, text_col)
    bigrams = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .where(F.col("c2") >= min_count)
    )
    uni = (
        reference.select(
            F.explode(H.tokens(F.col(text_col))).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    return bigrams, uni, vocab


def score_perplexity(
    docs: DataFrame,
    bigrams: DataFrame,
    unigrams: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a trained bigram model. Output:
    (id_col, n_bigrams, logprob_q, avg_logp) — logprob_q is the exact
    quantized integer total; avg_logp = logprob_q / n rounded
    half-away in integer space then scaled to log units. Documents
    with < 2 tokens score NULL."""
    inst = _bigram_instances(docs, text_col, id_col)
    scored = (
        inst.join(F.broadcast(bigrams), ["w1", "w2"], "left")
        .join(
            F.broadcast(unigrams),
            inst["w1"] == unigrams["w"],
            "left",
        )
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.round(
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast(
                        "double"
                    )
                    / (
                        F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")
                    ).cast("double")
                )
                * F.lit(LM_LOG_QUANT)
            )
            .cast("long")
            .alias("lq"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("lq").alias("logprob_q"),
    )
    # avg = logprob_q / n rounded half-away in exact integer space
    # (functions/exact.py — plain round() diverges on half boundaries)
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        "logprob_q",
        (
            half_away_div("logprob_q", "n_bigrams")
            / F.lit(float(LM_LOG_QUANT))
        ).alias("avg_logp"),
    )
