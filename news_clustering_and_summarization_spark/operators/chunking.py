"""Document chunking / sequence packing for training-data prep
(engine extension, no reference counterpart): split long documents
into fixed-token windows with overlap, and assign short documents to
fixed-token-budget training sequences.

Both are pure Column/window expressions (JVM-side, codegen) with
exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing as H


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document's token stream into windows of
    ``chunk_tokens`` tokens advancing by ``chunk_tokens - overlap``
    (so consecutive chunks share ``overlap`` tokens). The final chunk
    may be short; empty documents produce no chunks.

    Token starts are generated per row with ``sequence`` and fanned
    out with ``posexplode`` — one narrow projection, no shuffle at
    all; at 100 TB the chunker is embarrassingly parallel and
    preserves the input partitioning.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    tok = H.tokens(text_col)
    starts = F.when(F.size(tok) <= 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(1), F.size(tok), F.lit(stride)).cast("array<int>")
    )
    exploded = df.select(
        F.col(id_col),
        tok.alias("_tok"),
        F.posexplode(starts).alias("chunk_id", "_start"),
    )
    chunk = F.slice(F.col("_tok"), F.col("_start"), chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.size(chunk).alias("chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def chunk_documents_sql(
    text_expr: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_expr: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB formulation of :func:`chunk_documents` (same semantics,
    1-based slicing, 0-based chunk_id)."""
    stride = chunk_tokens - overlap
    tok = H.tokens_sql(text_expr)
    return f"""
WITH tok AS (SELECT {id_expr} AS doc_id, {tok} AS t FROM {table}),
starts AS (
  SELECT doc_id, t, g.s AS start,
         (g.s - 1) // {stride} AS chunk_id
  FROM tok, LATERAL (SELECT unnest(range(1, len(t) + 1, {stride})) AS s) g
)
SELECT doc_id, chunk_id::INT AS chunk_id,
       len(list_slice(t, start, start + {chunk_tokens} - 1)) AS chunk_tokens,
       array_to_string(list_slice(t, start, start + {chunk_tokens} - 1), ' ')
         AS chunk_text
FROM starts
"""


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
    shard_col: str | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences: in
    deterministic ``id_col`` order, a document starts in the bin its
    cumulative token offset falls in (``seq_id = cum_before //
    budget``) — the standard offset-packing approximation (documents
    may straddle bin edges; the chunker above handles the splits).

    With ``shard_col`` the running sum is windowed per shard, so the
    cumsum parallelizes across shards instead of collapsing to one
    partition — at scale, pack within shards (language, source,
    date-bucket), never globally.
    """
    tok_n = F.size(H.tokens(text_col))
    part = [shard_col] if shard_col else []
    w = (
        Window.partitionBy(*part)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = [F.col(shard_col)] if shard_col else []
    # integer DIV, not float division: cumulative token counts at
    # corpus scale can exceed 2^53 where double division goes inexact
    return df.select(
        *out,
        F.col(id_col),
        tok_n.alias("n_tokens"),
        (F.sum(tok_n).over(w) - tok_n).alias("_cum_before"),
    ).select(
        *([shard_col] if shard_col else []),
        id_col,
        "n_tokens",
        F.expr(f"_cum_before DIV {budget}").alias("seq_id"),
    )


def pack_sequences_sql(
    text_expr: str,
    budget: int = 256,
    id_expr: str = "doc_id",
    shard_expr: str | None = None,
    table: str = "documents",
) -> str:
    tok = H.tokens_sql(text_expr)
    part = f"PARTITION BY {shard_expr} " if shard_expr else ""
    shard_sel = f"{shard_expr}, " if shard_expr else ""
    return f"""
SELECT {shard_sel}{id_expr} AS doc_id, len({tok}) AS n_tokens,
       ((sum(len({tok})) OVER ({part}ORDER BY {id_expr}
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - len({tok})) // {budget})::BIGINT AS seq_id
FROM {table}
"""


def pack_sequences_global(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
    shard_width: int = 1024,
) -> DataFrame:
    """GLOBAL offset packing without a single-partition window — the
    corpus-wide variant ``pack_sequences`` deliberately refuses (its
    global mode collapses to one partition). Same two-phase prefix
    sum as evaluation.binary_auc: rows shard by ``id_col div
    shard_width`` (monotone in the packing order, so shard order ==
    row order), the in-shard cumsum windows per shard in parallel,
    and only the shard-TOTAL table — N/shard_width rows — passes
    through a single-partition prefix window. Output is row-identical
    to the naive global window (tests assert it).

    Output: (id_col, n_tokens, cum_before, seq_id); integer DIV
    throughout (corpus token totals exceed 2^53 where double division
    goes inexact)."""
    tok_n = F.size(H.tokens(text_col)).cast("long")
    base = df.select(
        F.col(id_col),
        tok_n.alias("n_tokens"),
        F.expr(f"{id_col} DIV {shard_width}").alias("_shard"),
    )
    w_in = (
        Window.partitionBy("_shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_shard = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        base.groupBy("_shard")
        .agg(F.sum("n_tokens").alias("_shard_tok"))
        .withColumn(
            "_offset",
            F.coalesce(F.sum("_shard_tok").over(w_shard), F.lit(0)),
        )
        .select("_shard", "_offset")
    )
    return (
        base.withColumn(
            "_in", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
        )
        .join(offsets, "_shard")
        .select(
            id_col,
            "n_tokens",
            (F.col("_offset") + F.col("_in")).alias("cum_before"),
            F.expr(f"(_offset + _in) DIV {budget}").alias("seq_id"),
        )
    )


def pack_sequences_global_sql(
    text_expr: str,
    budget: int = 256,
    id_expr: str = "doc_id",
    table: str = "documents",
) -> str:
    """Oracle: the naive single global window — an INDEPENDENT
    formulation of the same packing (the two-phase plan must agree
    row-for-row)."""
    tok = H.tokens_sql(text_expr)
    return f"""
SELECT {id_expr} AS doc_id, len({tok})::BIGINT AS n_tokens,
       CAST(coalesce(sum(len({tok})) OVER (ORDER BY {id_expr}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS cum_before,
       (CAST(coalesce(sum(len({tok})) OVER (ORDER BY {id_expr}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) // {budget})::BIGINT AS seq_id
FROM {table}
"""


SPAN_SEED = 21


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    start_ppt: int = 50,
    span_len: int = 3,
) -> DataFrame:
    """T5-style span-corruption pairs (Raffel et al. 2020): mask
    contiguous token spans, emit (input_text with one sentinel per
    span, target_text = sentinels + the masked content) — the
    denoising objective's data prep, generated DETERMINISTICALLY so
    the same corpus always yields the same training pairs (resumable
    corpus builds; no RNG).

    Span starts are content-addressed — hash(doc, pos) under
    ``start_ppt``/1000 — and each start masks ``span_len`` tokens;
    overlapping spans coalesce (the windowed any-start-within-reach
    test). Expected mask rate ≈ start_ppt/1000 · span_len.

    Plan: every window partitions BY DOCUMENT (parallel, never
    global); the final assembly is one groupBy with an array_sort of
    (pos, piece) structs — order is explicit in the data, not the
    partitioning. Output: (id_col, n_tokens, n_masked, input_text,
    target_text).
    """
    toks = df.select(
        F.col(id_col),
        F.posexplode(H.tokens(F.col(text_col))).alias("pos", "tok"),
    )
    is_start = (
        H.hash64(
            F.concat_ws("|", F.col(id_col).cast("string"), F.col("pos")),
            seed=SPAN_SEED,
        )
        % 1000
        < F.lit(start_ppt)
    ).cast("int")
    w_reach = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(span_len - 1), 0)
    )
    w_lag = Window.partitionBy(id_col).orderBy("pos")
    w_cum = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = (
        toks.withColumn("st", is_start)
        .withColumn("masked", (F.max("st").over(w_reach) == 1).cast("int"))
        .withColumn(
            "span_start",
            (
                (F.col("masked") == 1)
                & (F.coalesce(F.lag("masked").over(w_lag), F.lit(0)) == 0)
            ).cast("int"),
        )
        .withColumn(
            "sentinel", F.sum("span_start").over(w_cum) - F.lit(1)
        )
    )
    sent = F.concat(
        F.lit("<extra_id_"), F.col("sentinel").cast("string"), F.lit(">")
    )
    pieces = marked.select(
        id_col,
        "pos",
        "masked",
        F.when(F.col("masked") == 0, F.col("tok"))
        .when(F.col("span_start") == 1, sent)
        .alias("in_piece"),
        F.when(
            F.col("span_start") == 1, F.concat(sent, F.lit(" "), F.col("tok"))
        )
        .when(F.col("masked") == 1, F.col("tok"))
        .alias("tgt_piece"),
    )
    return (
        pieces.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("masked").alias("n_masked"),
            F.array_sort(
                F.collect_list(F.struct("pos", "in_piece"))
            ).alias("_in"),
            F.array_sort(
                F.collect_list(F.struct("pos", "tgt_piece"))
            ).alias("_tgt"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_masked",
            # explicit null filter: engines differ on whether join
            # skips nulls, so never rely on it
            F.array_join(
                F.filter(
                    F.transform(F.col("_in"), lambda s: s["in_piece"]),
                    lambda x: x.isNotNull(),
                ),
                " ",
            ).alias("input_text"),
            F.array_join(
                F.filter(
                    F.transform(F.col("_tgt"), lambda s: s["tgt_piece"]),
                    lambda x: x.isNotNull(),
                ),
                " ",
            ).alias("target_text"),
        )
    )


SKIPGRAM_SEED = 23
SKIPGRAM_QUANT = 1_000_000


def skipgram_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 2,
    subsample_t: float = 1e-3,
) -> DataFrame:
    """Skip-gram (center, context) training pairs with the word2vec
    frequency subsampling rule (Mikolov et al. 2013): a center
    occurrence survives with probability min(1, sqrt(t / f_w)) where
    f_w is the word's corpus frequency ratio — frequent words are
    aggressively thinned, rare words always kept. Selection is
    CONTENT-ADDRESSED (hash of doc and position under the quantized
    keep-rate, no RNG), so the same corpus always emits the same
    pairs under any partitioning — the resumable-build contract every
    sample generator in this module follows.

    Determinism: keep rates are quantized to 1e-6 ONCE per word (one
    sqrt on exact-integer-derived doubles, the temperature_mix
    pattern), and pair counting is a plain integer groupBy. Plan: one
    corpus-frequency shuffle, a broadcast rate join, an in-row
    window expansion (offsets ±1..±window — no self-join), and the
    final count shuffle.

    Output: (center, context, pair_count) aggregated over the corpus.
    """
    toks = df.select(
        F.col(id_col),
        F.posexplode(H.tokens(F.col(text_col))).alias("pos", "w"),
    )
    wc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("wn"))
    tot = wc.agg(F.sum("wn").alias("n"))
    rates = wc.crossJoin(F.broadcast(tot)).select(
        "w",
        F.round(
            F.least(
                F.lit(1.0),
                F.sqrt(
                    F.lit(subsample_t)
                    / (F.col("wn").cast("double") / F.col("n"))
                ),
            )
            * F.lit(SKIPGRAM_QUANT)
        )
        .cast("long")
        .alias("keep_q"),
    )
    kept = (
        toks.join(F.broadcast(rates), "w")
        .where(
            H.hash64(
                F.concat_ws(
                    "|", F.col(id_col).cast("string"), F.col("pos")
                ),
                seed=SKIPGRAM_SEED,
            )
            % SKIPGRAM_QUANT
            < F.col("keep_q")
        )
        .select(id_col, "pos", F.col("w").alias("center"))
    )
    offsets = [o for o in range(-window, window + 1) if o != 0]
    ctx_pos = F.explode(
        F.array(*[F.col("pos") + F.lit(o) for o in offsets])
    ).alias("cpos")
    expanded = kept.select(id_col, "pos", "center", ctx_pos)
    ctx = toks.select(
        F.col(id_col),
        F.col("pos").alias("cpos"),
        F.col("w").alias("context"),
    )
    return (
        expanded.join(ctx, [id_col, "cpos"])
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
