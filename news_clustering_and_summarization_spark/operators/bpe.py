"""BPE merge learning — tokenizer training as DataFrame operations.

Byte-pair encoding (Sennrich et al. 2016) is the vocabulary-building
step of every modern tokenizer: repeatedly merge the most frequent
adjacent symbol pair. The classic formulation is driver-side over a
python dict; the property that makes it a *Spark* problem at 100 TB
is that BPE trains on the WORD-FREQUENCY TABLE, not the corpus — one
corpus-sized aggregation produces a vocab-bounded (word, freq) table
(typically 10^6-10^7 rows regardless of corpus size), and every merge
iteration after that touches only the vocab:

* **Pair counting** explodes each word's adjacent symbol pairs
  weighted by word frequency — one map-side-combined groupBy over
  vocab rows.
* **The argmax pair** is a 1-row collect per iteration (the same
  bounded driver state as k-means centroids; ties broken by count
  desc, then left/right symbol asc — fully deterministic).
* **Merge application** is a shuffle-free projection: a left fold
  over each word's symbol array replaces [l, r] tail-matches with the
  merged symbol. Left-to-right non-overlap falls out of the fold
  because the merged symbol is textually distinct from its left part
  ("aaa" with pair (a,a) folds to [aa, a], never [aa, aa]).

The DuckDB oracle (plans/catalog.py oracle_bpe_merges) replays every
iteration unrolled — pair counts, argmax, and the same fold (as a
string-accumulator list_reduce) — so a green hash certifies the whole
training loop, not just the final vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H

__all__ = ["word_frequencies", "learn_bpe_merges", "bpe_encode"]


def word_frequencies(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus -> (word, freq): the one corpus-sized aggregation."""
    return (
        df.select(F.explode(H.tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pairs(syms_col: str) -> F.Column:
    # 0-based [] indexing: pairs (syms[i-1], syms[i]) for i in
    # 1..size-1 enumerate every adjacent pair once, in order; guard
    # single-symbol words (Spark's sequence(1, 0) counts DOWN)
    return F.expr(
        f"CASE WHEN size({syms_col}) < 2 THEN "
        f"cast(array() AS array<struct<l string, r string>>) "
        f"ELSE transform(sequence(1, size({syms_col}) - 1), "
        f"i -> struct({syms_col}[i-1] AS l, {syms_col}[i] AS r)) END"
    )


def _apply_merge(syms_col: str, left: str, right: str) -> F.Column:
    """Left fold replacing adjacent (left, right) with left||right."""
    merged = left + right
    return F.expr(
        f"""
        aggregate(
          slice({syms_col}, 2, greatest(size({syms_col}) - 1, 0)),
          array(element_at({syms_col}, 1)),
          (acc, x) -> CASE
            WHEN element_at(acc, -1) = {_lit(left)} AND x = {_lit(right)}
            THEN concat(slice(acc, 1, size(acc) - 1),
                        array({_lit(merged)}))
            ELSE concat(acc, array(x)) END)
        """
    )


def _lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def learn_bpe_merges(
    words: DataFrame, n_merges: int
) -> tuple[DataFrame, DataFrame]:
    """Run ``n_merges`` BPE iterations over a (word, freq) table.

    Returns (merges, vocab_state): merges = (step, left, right,
    merged, pair_count) one row per learned merge; vocab_state =
    (word, freq, syms) after all merges. Each iteration collects ONE
    row (the argmax pair) to the driver and lazily checkpoints the
    fold lineage.
    """
    spark = words.sparkSession
    # eager checkpoint of the vocab-sized initial state: iteration 1's
    # argmax action and iteration 2's lazy-checkpoint materialization
    # of state-1 would otherwise EACH re-run the corpus word-frequency
    # lineage behind ``words`` (r11, guide §5.3 — the corpus tokenize
    # pass was paid twice; A/B'd below in OPTIMIZATION_r11.md)
    state = words.select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)), "
            "i -> substr(word, i, 1))"
        ).alias("syms"),
    ).localCheckpoint(eager=True)
    rows = []
    for step in range(1, n_merges + 1):
        pairs = (
            state.select(
                "freq", F.explode(_adjacent_pairs("syms")).alias("p")
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(
            F.desc("cnt"), F.asc("l"), F.asc("r")
        ).first()
        if top is None:
            break
        rows.append(
            (step, top["l"], top["r"], top["l"] + top["r"], top["cnt"])
        )
        state = state.select(
            "word",
            "freq",
            _apply_merge("syms", top["l"], top["r"]).alias("syms"),
        ).localCheckpoint(eager=False)
    if rows:
        from ..session import local_df

        # Arrow-local relation (r11): createDataFrame(list) pays a
        # Python-worker round trip per partition on every action
        merges = local_df(
            spark,
            rows,
            "step int, left string, right string, merged string, "
            "pair_count bigint",
        )
    else:
        merges = spark.createDataFrame(
            [], "step int, left string, right string, merged string, "
            "pair_count bigint"
        )
    return merges, state


def _encode_word_expr(word_expr: str, merges: list[tuple[str, str]]) -> str:
    """SQL expression: word string -> symbol array after applying the
    learned ``merges`` in priority order (the tokenizer APPLY side).
    Pure nested expressions — the merge list is tiny (tokenizer vocab
    is learned offline), so each merge becomes one fold literal."""
    syms = (
        f"transform(sequence(1, length({word_expr})), "
        f"i -> substr({word_expr}, i, 1))"
    )
    for left, right in merges:
        merged = left + right
        syms = (
            f"aggregate(slice({syms}, 2, greatest(size({syms}) - 1, 0)), "
            f"array(element_at({syms}, 1)), "
            f"(acc, x) -> CASE WHEN element_at(acc, -1) = {_lit(left)} "
            f"AND x = {_lit(right)} "
            f"THEN concat(slice(acc, 1, size(acc) - 1), "
            f"array({_lit(merged)})) "
            f"ELSE concat(acc, array(x)) END)"
        )
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer APPLICATION at corpus scale: encode every document
    with an already-learned merge list (the output of
    ``learn_bpe_merges``, collected once — it is tokenizer state, not
    data, exactly like broadcast k-means centroids).

    Zero shuffle: per document, words -> char symbols -> the same
    left-to-right fold per merge that training used, flattened back
    to one symbol stream. Output per doc: ``n_words``, ``n_syms``
    (post-merge token count — the number a token-budget pipeline
    bills), and ``syms_h`` (md5 of the chr(31)-joined stream, so the
    oracle certifies the exact token SEQUENCE, not just counts).

    The nested-fold expression grows linearly with the merge count;
    for production-sized merge tables (10k+) the same fold runs as a
    mapInPandas trie pass instead — the plan shape (projection, no
    shuffle) is identical.
    """
    deduped: list[tuple[str, str]] = []
    for left, right in merges:
        if (left, right) not in deduped:
            deduped.append((left, right))
    enc = _encode_word_expr("w", deduped)
    words = (
        "filter(split(lower({t}), '[^a-z0-9]+'), t -> t != '')".format(
            t=text_col
        )
    )
    # materialize words and the encoded stream in their own
    # projections — inlining the expressions would re-run the
    # tokenizer and the whole fold once per referencing column
    return (
        df.select(F.col(id_col), F.expr(words).alias("_w"))
        .select(
            id_col,
            F.expr("size(_w)").cast("long").alias("n_words"),
            F.expr(f"flatten(transform(_w, w -> {enc}))").alias("_s"),
        )
        .select(
            id_col,
            "n_words",
            F.expr("size(_s)").cast("long").alias("n_syms"),
            F.md5(F.expr("array_join(_s, chr(31))")).alias("syms_h"),
        )
    )
