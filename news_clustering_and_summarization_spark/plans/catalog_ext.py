"""Round-6/7/8 extensions: sufficient-statistics analytics, graph, drift, trend, profiling.

Split out of the former plans/catalog.py monolith (r08 verdict item
6) — function bodies unchanged; plans.catalog re-exports every name,
so the driver contract, tests and tools are untouched."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from ..functions import hashing as H
from ..functions.exact import half_away_div_sql
from ..functions import vectors as V
from ..operators import cluster as C
from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import text_analysis as TA
from .catalog_shared import (  # noqa: F401
    load,
    widen,
    _dec,
    _money,
)
from .catalog_breadth import (  # noqa: F401
    _bpe_train_ctes,
    _media_frame,
    _safe_sf_tag,
    oracle_lm_perplexity,
)
from .catalog_curation import (  # noqa: F401
    BM25_QUERY_TERMS,
)
from .catalog_dedup import (  # noqa: F401
    oracle_dedup_components,
)

# --- round-6 extension: TF-IDF exact pairs, BPE encode, TextRank -----


def q_tfidf_neardup(spark, sf):
    """J5's TF-IDF cosine near-dup (operators/dedup.py
    tfidf_exact_pairs) in the exact-replay sparse formulation: tokens
    exploded once, smooth-idf weights quantized to int64 so norms and
    pair dots are order-free integer sums, candidates from the
    inverted-index equi-join on (source, term) with df-pruned hot
    terms — never a dense n² crossJoin (the MLlib variant keeps
    reference-API parity; this is the 100 TB path).
    Cites reference summarization notebook cell 7 remove_dup_article."""
    from ..operators.dedup import tfidf_exact_pairs

    docs = load(spark, sf, "documents")
    return tfidf_exact_pairs(
        docs,
        group_col="source",
        id_col="doc_id",
        text_col="text",
        threshold=0.25,
        max_df_frac=0.9,
    ).select("source", "l_id", "r_id", "dot_q", "cosine")


def oracle_tfidf_neardup() -> str:
    from ..operators.dedup import tfidf_exact_pairs_sql

    inner = tfidf_exact_pairs_sql(
        "documents",
        "source",
        "doc_id",
        "text",
        threshold=0.25,
        max_df_frac=0.9,
    )
    return f"SELECT grp AS source, l_id, r_id, dot_q, cosine FROM ({inner})"


BPE_ENC_SEP = "chr(31)"


def q_bpe_encode(spark, sf):
    """Tokenizer APPLY at corpus scale (operators/bpe.py bpe_encode):
    learn 3 merges from the corpus word-frequency table (the
    bpe_merges loop — one corpus aggregation, vocab-bounded
    iterations), collect the 3-row merge table as tokenizer state,
    then encode every document in a single zero-shuffle projection
    (words -> chars -> the same left-to-right fold per merge). The
    md5 of the full symbol stream certifies the exact token SEQUENCE
    per document, and the oracle replays training AND encoding."""
    from ..operators.bpe import (
        bpe_encode,
        learn_bpe_merges,
        word_frequencies,
    )

    docs = widen(spark, load(spark, sf, "documents"))
    merges_df, _ = learn_bpe_merges(word_frequencies(docs, "text"), 3)
    merges = [
        (r["left"], r["right"])
        for r in merges_df.orderBy("step").collect()
    ]
    return bpe_encode(docs, merges, "doc_id", "text").orderBy("doc_id")


def oracle_bpe_encode(n_merges: int = 3) -> str:
    tok = H.tokens_sql("text")
    sep = BPE_ENC_SEP
    fold = (
        "list_reduce(syms, (acc, x) -> CASE "
        "WHEN (acc = m.l OR ends_with(acc, {sep} || m.l)) AND x = m.r "
        "THEN left(acc, len(acc) - len(m.l)) || m.l || m.r "
        "ELSE acc || {sep} || x END)"
    ).format(sep=sep)
    enc_parts = [
        f""",
dw AS (
  SELECT doc_id, i AS pos, tk[i] AS word
  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i
        FROM (SELECT doc_id, {tok} AS tk FROM documents))
),
e0 AS (
  SELECT doc_id, pos,
         list_transform(range(1, len(word) + 1),
                        i -> word[i]::VARCHAR) AS syms
  FROM dw
)"""
    ]
    for it in range(1, n_merges + 1):
        inner = fold
        if it == n_merges:
            enc_parts.append(
                f""",
e{it} AS (SELECT doc_id, pos, {inner} AS s
  FROM e{it - 1} CROSS JOIN m{it} m)"""
            )
        else:
            enc_parts.append(
                f""",
e{it} AS (SELECT doc_id, pos, string_split({inner}, {sep}) AS syms
  FROM e{it - 1} CROSS JOIN m{it} m)"""
            )
    return (
        "WITH "
        + _bpe_train_ctes(n_merges)
        + "".join(enc_parts)
        + f""",
per_doc AS (
  SELECT doc_id, count(*)::BIGINT AS n_words,
         CAST(sum(len(string_split(s, {sep}))) AS BIGINT) AS n_syms,
         md5(string_agg(s, {sep} ORDER BY pos)) AS syms_h
  FROM e{n_merges} GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_words, 0)::BIGINT AS n_words,
       coalesce(p.n_syms, 0)::BIGINT AS n_syms,
       coalesce(p.syms_h, md5('')) AS syms_h
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""
    )


def q_keyword_textrank(spark, sf):
    """TextRank keyword extraction (Mihalcea & Tarau 2004;
    operators/graph.py textrank_edges + pagerank_fixed_point): the
    unweighted co-occurrence graph over candidate words (adjacent,
    length >= 4) ranked by 3 damped power iterations in exact
    fixed-point integer arithmetic, top 20 keywords. The graph is
    vocab-bounded — one corpus explode + distinct builds it, and
    every iteration after that is one shuffle over (node, rank)
    rows. The oracle replays the full iteration unrolled (same
    pagerank_sql fragment the pagerank query certifies)."""
    from ..operators.graph import (
        SCALE,
        pagerank_fixed_point,
        textrank_edges,
    )

    docs = widen(spark, load(spark, sf, "documents"))
    edges = textrank_edges(docs, "text", min_len=4)
    ranks = pagerank_fixed_point(edges, iterations=3)
    return (
        ranks.select(
            F.col("node").alias("keyword"),
            "rank",
            F.round(F.col("rank") / F.lit(float(SCALE)), 9).alias(
                "score"
            ),
        )
        .orderBy(F.desc("rank"), "keyword")
        .limit(20)
    )


def oracle_keyword_textrank() -> str:
    from ..operators.graph import SCALE, pagerank_sql, textrank_edges_sql

    edges = textrank_edges_sql("documents", "text", min_len=4)
    frag, final = pagerank_sql("edges", iterations=3)
    return f"""
WITH edges AS ({edges}),
{frag}
SELECT node AS keyword, rank,
       round(rank / {float(SCALE)!r}, 9) AS score
FROM {final}
ORDER BY rank DESC, keyword
LIMIT 20
"""


def q_pack_global(spark, sf):
    """GLOBAL token-offset packing without a single-partition window
    (operators/chunking.py pack_sequences_global): the two-phase
    prefix sum — in-shard cumsum windows run per shard in parallel;
    only the shard-TOTAL table (N/1024 rows) crosses a
    single-partition window. The oracle is the NAIVE global window —
    an independent formulation the two-phase plan must match
    row-for-row."""
    from ..operators.chunking import pack_sequences_global

    docs = load(spark, sf, "documents")
    return pack_sequences_global(
        docs, "doc_id", "text", budget=256, shard_width=64
    ).orderBy("doc_id")


def oracle_pack_global() -> str:
    from ..operators.chunking import pack_sequences_global_sql

    return pack_sequences_global_sql("text", budget=256)


def q_containment(spark, sf):
    """Asymmetric shingle containment (operators/dedup.py
    containment_pairs): |S(A)∩S(B)|/|S(A)| over distinct word
    trigrams — the sub-document duplication signal Jaccard misses
    when document sizes differ (Broder 1997's two resemblance
    measures). Inverted-index candidates, integer-quotient
    containment (no float rounding discipline at all)."""
    from ..operators.dedup import containment_pairs

    docs = load(spark, sf, "documents")
    return containment_pairs(
        docs, "doc_id", "text", n=3, threshold=0.1
    )


def oracle_containment() -> str:
    from ..operators.dedup import containment_pairs_sql

    return containment_pairs_sql(
        "documents", "doc_id", "text", n=3, threshold=0.1
    )


LP_SEED_MOD = 3


def q_label_prop(spark, sf):
    """Semi-supervised label propagation (operators/graph.py
    label_propagation): the trusted third of the corpus (doc_id % 3
    == 0) seeds its ``lang`` tag, which propagates 3 synchronous
    majority-vote hops over the trigram-containment similarity graph
    — the weak-supervision annotator pattern (tag the near-dup
    neighborhood of a vetted subset). Deterministic throughout:
    majority with lexicographic tie-break, seeds clamped, per-node
    windows only. Output covers EVERY document; label is NULL where
    no labeled neighborhood reached the node."""
    from ..operators.dedup import containment_pairs
    from ..operators.graph import label_propagation

    docs = load(spark, sf, "documents")
    pairs = containment_pairs(
        docs, "doc_id", "text", n=3, threshold=0.1
    ).select("l_id", "r_id")
    edges = pairs.select(
        F.col("l_id").alias("src"), F.col("r_id").alias("dst")
    ).unionAll(
        pairs.select(
            F.col("r_id").alias("src"), F.col("l_id").alias("dst")
        )
    )
    seeds = docs.where(
        F.col("doc_id") % LP_SEED_MOD == 0
    ).select(F.col("doc_id").alias("node"), F.col("lang").alias("label"))
    lp = label_propagation(edges, seeds, iterations=3)
    is_seed_all = (F.col("doc_id") % LP_SEED_MOD == 0)
    return docs.select("doc_id", "lang").join(
        lp, docs.doc_id == lp.node, "left"
    ).select(
        "doc_id",
        F.when(F.col("node").isNotNull(), F.col("label"))
        .otherwise(F.when(is_seed_all, F.col("lang")))
        .alias("label"),
        is_seed_all.alias("is_seed"),
    ).orderBy("doc_id")


def oracle_label_prop() -> str:
    from ..operators.dedup import containment_pairs_sql
    from ..operators.graph import label_propagation_sql

    pairs = containment_pairs_sql(
        "documents", "doc_id", "text", n=3, threshold=0.1
    )
    frag, final = label_propagation_sql("edges", "seeds", iterations=3)
    return f"""
WITH pairs AS ({pairs}),
edges AS (
  SELECT l_id AS src, r_id AS dst FROM pairs
  UNION ALL
  SELECT r_id, l_id FROM pairs
),
seeds AS (
  SELECT doc_id AS node, lang AS label FROM documents
  WHERE doc_id % {LP_SEED_MOD} = 0
),
{frag}
SELECT d.doc_id,
       CASE WHEN s.node IS NOT NULL THEN s.label
            WHEN d.doc_id % {LP_SEED_MOD} = 0 THEN d.lang
            ELSE NULL END AS label,
       (d.doc_id % {LP_SEED_MOD} = 0) AS is_seed
FROM documents d LEFT JOIN {final} s ON d.doc_id = s.node
ORDER BY d.doc_id
"""


def q_char_entropy(spark, sf):
    """Character-distribution entropy quality signal
    (operators/text_analysis.py char_entropy): the compression-ratio
    family of filters (gibberish/boilerplate sit at the extremes).
    Per-class integer terms n_c*round(ln(n_c/N)*1e9) make the per-doc
    sum order-free; one explode + two map-side-combined groupBys."""
    return TA.char_entropy(
        load(spark, sf, "documents"), "doc_id", "text"
    ).orderBy("doc_id")


def oracle_char_entropy() -> str:
    return TA.char_entropy_sql("documents", "doc_id", "text")


def q_dup_weighted_sample(spark, sf):
    """Duplicate-aware sampling (operators/sampling.py
    dup_weighted_sample): near-dup clusters from the transitive
    closure weighted 1/size, content-addressed keep decision — the
    'count every near-dup cluster once' corpus-mixing correction,
    deterministic and re-runnable. Oracle nests the recursive-CTE
    closure the dedup_components query already certifies."""
    from ..operators.sampling import dup_weighted_sample

    docs = load(spark, sf, "documents")
    return dup_weighted_sample(
        docs, "doc_id", "text", n=3, threshold=0.5, seed=11
    ).orderBy("doc_id")


def oracle_dup_weighted_sample() -> str:
    from ..operators.sampling import SAMPLE_BUCKETS, bucket_sql

    base = oracle_dedup_components().strip()
    return f"""
WITH base AS ({base}),
sizes AS (
  SELECT canonical_id, count(*)::BIGINT AS cluster_size
  FROM base GROUP BY canonical_id
)
SELECT b.doc_id, b.canonical_id, s.cluster_size,
       ({SAMPLE_BUCKETS} // s.cluster_size)::BIGINT AS weight_q,
       ({bucket_sql("b.doc_id", 11)}
        < {SAMPLE_BUCKETS} // s.cluster_size) AS sampled
FROM base b JOIN sizes s USING (canonical_id)
ORDER BY b.doc_id
"""


def q_percent_rank(spark, sf):
    """percent_rank + cume_dist window coverage: customer balance
    percentile within market segment (unique tie-break via custkey so
    both functions are deterministic); partitioned windows only."""
    cust = load(spark, sf, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    ).orderBy("c_custkey")


ORACLE_PERCENT_RANK = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       round(percent_rank() OVER (PARTITION BY c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey), 9) AS pct_rank,
       round(cume_dist() OVER (PARTITION BY c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey), 9) AS cume
FROM customer
ORDER BY c_custkey
"""


def q_zorder_layout(spark, sf):
    """Z-order layout keys (operators/layout.py): Morton-interleave
    (l_partkey, l_suppkey) and report per-z-bucket min/max spans of
    BOTH dimensions — the footer stats a z-ordered rewrite exposes to
    scan pruning on either column (Delta/Iceberg OPTIMIZE ZORDER; the
    write-side pair of the stats_skipping query). Integer rescale +
    bit interleave only, one broadcast stats row, one groupBy."""
    from ..operators.layout import zorder_layout_stats

    li = load(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    return zorder_layout_stats(
        li, "l_partkey", "l_suppkey", bits=8, bucket_bits=3
    ).orderBy("zbucket")


def oracle_zorder_layout() -> str:
    from ..operators.layout import zorder_layout_stats_sql

    return zorder_layout_stats_sql(
        "lineitem", "l_partkey", "l_suppkey", bits=8, bucket_bits=3
    )


def q_ewma_smooth(spark, sf):
    """Per-customer EWMA of order totals (operators/temporal.py ewma):
    the recency-weighted smoothing baseline. The recursion is an
    index-ordered fold over each key's bounded (date, value) history —
    the proven bit-identical cross-engine fold (cf. bpe/dedup folds) —
    so no float sum ever crosses rows unordered."""
    from ..operators.temporal import ewma

    orders = load(spark, sf, "orders")
    return ewma(
        orders, "o_custkey", "o_orderdate", "o_totalprice", alpha_pct=30
    ).orderBy("o_custkey")


def oracle_ewma_smooth() -> str:
    from ..operators.temporal import ewma_sql

    return ewma_sql(
        "orders", "o_custkey", "o_orderdate", "o_totalprice", alpha_pct=30
    )


WFQ_SCALE = 10**9


def q_interleave_schedule(spark, sf):
    """Weighted-fair-queueing curriculum interleave: the deterministic
    ORDER in which a training run should consume a mixed corpus.
    Each source gets weight sqrt(count)·1000 (the T=2 temperature
    damping mix_temperature certifies for RATES — this is the
    streaming-order side), each doc its within-source arrival k (by
    content hash), and the WFQ virtual finishing time vt = (2k+1) /
    (2w) — integer arithmetic at 1e9 scale. The first 200 positions
    of the global merge are the certified output; heavy sources
    appear proportionally more often, with no RNG and no global
    window (orderBy+limit = TakeOrdered)."""
    docs = load(spark, sf, "documents")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("cnt")
    ).select(
        "source",
        F.expr("cast(round(sqrt(cnt) * 1000) as bigint)").alias("w_q"),
    )
    w = Window.partitionBy("source").orderBy(
        H.hash64(F.col("doc_id").cast("string"), seed=5), "doc_id"
    )
    return (
        docs.select("source", "doc_id")
        .withColumn("k", F.row_number().over(w).cast("long") - 1)
        .join(F.broadcast(counts), "source")
        .select(
            "source",
            "doc_id",
            "k",
            F.expr(f"((2 * k + 1) * {WFQ_SCALE}) DIV (2 * w_q)").alias(
                "vt_q"
            ),
        )
        .orderBy("vt_q", "source", "doc_id")
        .limit(200)
    )


def oracle_interleave_schedule() -> str:
    h = H.hash64_sql("(doc_id)::VARCHAR", seed=5)
    return f"""
WITH counts AS (
  SELECT source,
         CAST(round(sqrt(count(*)) * 1000) AS BIGINT) AS w_q
  FROM documents GROUP BY source
),
ranked AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY {h}, doc_id) - 1 AS k
  FROM documents
)
SELECT r.source, r.doc_id, r.k::BIGINT AS k,
       ((2 * r.k + 1) * {WFQ_SCALE}) // (2 * c.w_q) AS vt_q
FROM ranked r JOIN counts c USING (source)
ORDER BY vt_q, r.source, r.doc_id
LIMIT 200
"""


def q_tokenizer_fertility(spark, sf):
    """Tokenizer fertility (tokens-per-word) per language under the
    corpus-learned BPE — the standard tokenizer-evaluation metric
    (multilingual fertility gaps drive vocab-size decisions). Rides
    the certified bpe_encode path; per-lang totals are integer sums
    and the ratio is the exact half-away integer division at 1e6."""
    from ..functions.exact import half_away_div
    from ..operators.bpe import (
        bpe_encode,
        learn_bpe_merges,
        word_frequencies,
    )

    docs = load(spark, sf, "documents")
    merges_df, _ = learn_bpe_merges(word_frequencies(docs, "text"), 3)
    merges = [
        (r["left"], r["right"])
        for r in merges_df.orderBy("step").collect()
    ]
    enc = bpe_encode(docs, merges, "doc_id", "text")
    return (
        enc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("words"),
            F.sum("n_syms").alias("syms"),
        )
        .select(
            "lang",
            "n_docs",
            "words",
            "syms",
            (
                half_away_div("syms * 1000000", "greatest(words, 1)")
                / F.lit(1000000.0)
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


def oracle_tokenizer_fertility() -> str:
    from ..functions.exact import half_away_div_sql

    enc = oracle_bpe_encode()
    ratio = half_away_div_sql("syms * 1000000", "greatest(words, 1)")
    return f"""
WITH enc AS ({enc}),
agg AS (
  SELECT d.lang, count(*)::BIGINT AS n_docs,
         CAST(sum(e.n_words) AS BIGINT) AS words,
         CAST(sum(e.n_syms) AS BIGINT) AS syms
  FROM enc e JOIN documents d USING (doc_id)
  GROUP BY d.lang
)
SELECT lang, n_docs, words, syms,
       {ratio} / 1000000.0 AS fertility
FROM agg ORDER BY lang
"""


ROUNDTRIP_MOD = 1_000_000_007


def _row_checksum_col():
    return F.sum(
        H.hash64(
            F.concat_ws(
                "\x1f",
                F.col("doc_id").cast("string"),
                F.col("text"),
                F.col("lang"),
                F.col("source"),
                F.col("n_chars").cast("string"),
            )
        )
        % ROUNDTRIP_MOD
    ).cast("long")


def q_format_roundtrip(spark, sf):
    """Source/sink format breadth: write the documents table to CSV
    (quoted/escaped, multiLine), ORC, and JSON-lines sinks, read each
    back with the EXPLICIT schema, and emit (fmt, n_rows, checksum)
    where checksum is an order-free integer sum of per-row hashes.
    The oracle computes the same checksum straight from parquet — a
    green hash certifies every format's write+read path is LOSSLESS
    for every row, including quoting/escaping of free text. Writes go
    under the Spark warehouse dir (the bucketed-table pattern)."""
    tag = _safe_sf_tag(sf)
    docs = load(spark, sf, "documents").select(
        "doc_id",
        F.coalesce("text", F.lit("")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    base = (
        f"{spark.conf.get('spark.sql.warehouse.dir')}"
        f"/fmt_roundtrip_{tag}"
    )
    schema = (
        "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    parts = []
    for fmt in ("csv", "orc", "json"):
        path = f"{base}/{fmt}"
        w = docs.write.mode("overwrite").format(fmt)
        r = spark.read.format(fmt).schema(schema)
        if fmt == "csv":
            w = w.option("header", True).option("escape", '"').option(
                "emptyValue", ""
            )
            r = (
                r.option("header", True)
                .option("escape", '"')
                .option("multiLine", True)
                .option("emptyValue", "")
            )
        w.save(path)
        rt = r.load(path)
        parts.append(
            rt.agg(
                F.lit(fmt).alias("fmt"),
                F.count(F.lit(1)).alias("n_rows"),
                _row_checksum_col().alias("checksum"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("fmt")


def oracle_format_roundtrip() -> str:
    h = H.hash64_sql(
        "(doc_id::VARCHAR || chr(31) || coalesce(text, '') || chr(31)"
        " || lang || chr(31) || source || chr(31) || n_chars::VARCHAR)"
    )
    one = (
        f"SELECT count(*)::BIGINT AS n_rows, "
        f"CAST(sum({h} % {ROUNDTRIP_MOD}) AS BIGINT) AS checksum "
        f"FROM documents"
    )
    return f"""
WITH ref AS ({one})
SELECT fmt, n_rows, checksum
FROM (VALUES ('csv'), ('orc'), ('json')) AS f(fmt) CROSS JOIN ref
ORDER BY fmt
"""


POOL_DIMS = 16


def q_frame_pool(spark, sf):
    """Temporal pooling over sampled video/audio frames — the
    decode -> frame-sample -> per-frame-embed -> mean-pool pipeline
    shape every multimodal trainer runs. decode_media is the REAL
    mapInPandas plumbing (deterministic fake codec, as in
    multimodal_decode); per-frame features are md5-derived integers
    (the codec stand-in), and the per-dimension mean is the exact
    half-away integer division, so the asset-level pooled embedding
    replays bit-for-bit in SQL. Output per pooled asset:
    (asset_id, n_sampled, pool_checksum, pool_sum_q)."""
    from ..functions.exact import half_away_div
    from ..operators.multimodal import decode_media, sample_frames

    decoded = decode_media(_media_frame(spark, sf), fake=True)
    frames = sample_frames(decoded, every_nth=5)
    dims = frames.select(
        "asset_id",
        "frame_index",
        F.explode(F.expr(f"sequence(0, {POOL_DIMS - 1})")).alias("dim"),
    ).select(
        "asset_id",
        "dim",
        (
            H.hash64(
                F.concat_ws(
                    ":",
                    F.col("asset_id"),
                    F.col("frame_index").cast("string"),
                    F.col("dim").cast("string"),
                )
            )
            % 1000
        ).alias("f"),
    )
    per_dim = dims.groupBy("asset_id", "dim").agg(
        F.sum("f").alias("s"), F.count(F.lit(1)).alias("n")
    ).select(
        "asset_id",
        "dim",
        "s",
        "n",
        half_away_div("1000 * s", "n").alias("mean_q"),
    )
    return (
        per_dim.groupBy("asset_id")
        .agg(
            F.max("n").cast("long").alias("n_sampled"),
            F.md5(
                F.expr(
                    "array_join(transform(array_sort(collect_list("
                    "struct(dim, mean_q))), "
                    "x -> concat(x.dim, ':', x.mean_q)), chr(31))"
                )
            ).alias("pool_checksum"),
            F.sum("s").cast("long").alias("pool_sum_q"),
        )
        .orderBy("asset_id")
    )


def oracle_frame_pool() -> str:
    from ..functions.exact import half_away_div_sql

    h = H.hash64_sql(
        "(asset_id || ':' || frame_index::VARCHAR || ':' || dim::VARCHAR)"
    )
    mean_q = half_away_div_sql("1000 * s", "n")
    return f"""
WITH m AS (
  SELECT doc_id::VARCHAR AS asset_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         md5(coalesce(text, '')) AS h
  FROM documents
),
dec AS (
  SELECT asset_id, media_type,
         CASE WHEN media_type = 'image' THEN 1
              ELSE 1 + ('0x' || substr(h, 5, 2))::INT % 30
         END AS n_frames
  FROM m
),
frames AS (
  SELECT asset_id, unnest(range(0, n_frames, 5)) AS frame_index
  FROM dec WHERE n_frames > 1
),
dims AS (
  SELECT asset_id, frame_index, unnest(range(0, {POOL_DIMS})) AS dim
  FROM frames
),
feat AS (
  SELECT asset_id, dim, {h} % 1000 AS f FROM dims
),
per_dim AS (
  SELECT asset_id, dim, CAST(sum(f) AS BIGINT) AS s,
         count(*)::BIGINT AS n
  FROM feat GROUP BY asset_id, dim
)
SELECT asset_id,
       CAST(max(n) AS BIGINT) AS n_sampled,
       md5(string_agg(dim::VARCHAR || ':' || ({mean_q})::VARCHAR,
                      chr(31) ORDER BY dim)) AS pool_checksum,
       CAST(sum(s) AS BIGINT) AS pool_sum_q
FROM per_dim
GROUP BY asset_id
ORDER BY asset_id
"""


# One SQL text, two engines: the implicit supplier hierarchy
# parent(k) = floor(k/10) forms a forest rooted at keys 1..9; the
# recursive CTE walks each supplier to its root. floor(x/10.0) is the
# portable integer step (Spark int/int division and DuckDB CAST
# rounding both diverge; floor does not).
_RECURSIVE_CLOSURE_SQL = """
WITH RECURSIVE up AS (
  SELECT s_suppkey, s_suppkey AS anc, 0 AS depth
  FROM supplier
  UNION ALL
  SELECT s_suppkey, CAST(floor(anc / 10.0) AS BIGINT) AS anc,
         depth + 1 AS depth
  FROM up WHERE anc >= 10
)
SELECT s_suppkey,
       CAST(max(depth) AS BIGINT) AS depth,
       CAST(min(CASE WHEN anc < 10 THEN anc END) AS BIGINT) AS root,
       CAST(sum(anc) AS BIGINT) AS chain_sum
FROM up
GROUP BY s_suppkey
ORDER BY s_suppkey
"""


def q_sql_recursive_closure(spark, sf):
    """Native recursive CTE (Spark 4.1 WITH RECURSIVE) walking the
    implicit supplier hierarchy parent(k)=floor(k/10) to its roots —
    the iterative-closure workloads (org charts, BOM explosions,
    reachability) expressed in ONE SQL text shared verbatim with the
    DuckDB oracle. Complements the engine's DataFrame-loop closures
    (connected components, pagerank), whose oracles go the other
    direction (SQL replays the loop); here Spark itself runs the
    recursion."""
    load(spark, sf, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_RECURSIVE_CLOSURE_SQL)


def q_rouge_eval(spark, sf):
    """ROUGE-1/2 of the LEAD-k extractive summary vs the document
    remainder (operators/evaluation.rouge_scores) — the intrinsic
    metric for the reference's summarization stage scored on the
    deterministic LEAD baseline. Clipped n-gram counts, constant
    candidate sizes, F1 as ONE half-away integer division via the
    harmonic-mean identity; shuffle budget of a TF computation."""
    from ..operators.evaluation import rouge_scores

    return rouge_scores(load(spark, sf, "documents"), "doc_id", "text")


def oracle_rouge_eval() -> str:
    from ..operators.evaluation import rouge_scores_sql

    return rouge_scores_sql("documents", "doc_id", "text")


PHRASE_QUERY = "slow hash"


def q_phrase_search(spark, sf):
    """Exact phrase query (operators/curation.phrase_matches):
    adjacency-checked token offsets computed IN-ROW over the
    materialized token array — zero shuffles, one codegen'd corpus
    pass; the optimal plan for a doc-store table (the posting-list
    join shape only wins with a pre-materialized inverted index —
    that side is covered by bm25_search)."""
    from ..operators.curation import phrase_matches

    return phrase_matches(
        load(spark, sf, "documents"), PHRASE_QUERY, "doc_id", "text"
    )


def oracle_phrase_search() -> str:
    from ..operators.curation import phrase_matches_sql

    return phrase_matches_sql("documents", PHRASE_QUERY, "doc_id", "text")


def q_doremi_weights(spark, sf):
    """DoReMi-style Group-DRO domain reweighting (operators/sampling.
    doremi_domain_weights): multiplicative-weights iterations over
    per-domain excess proxy loss, exp-free integer MW rule, ε-uniform
    smoothing. One corpus scan + one domain groupBy; every iteration
    runs over the |domains|-row table only."""
    from ..operators.sampling import doremi_domain_weights

    return doremi_domain_weights(load(spark, sf, "documents"))


def oracle_doremi_weights() -> str:
    from ..operators.sampling import doremi_domain_weights_sql

    return doremi_domain_weights_sql("documents")


def q_dup_spans(spark, sf):
    """Maximal duplicated-span audit (operators/dedup.duplicate_spans)
    — the distributed form of Lee et al. exact substring dedup:
    n-gram anchors shared across >= 2 docs, merged into maximal
    islands per doc with a lag window; NO candidate pair join, cost
    linear in the corpus token stream."""
    return D.duplicate_spans(
        load(spark, sf, "documents"), "doc_id", "text", n=5, min_span=8
    )


def oracle_dup_spans() -> str:
    return D.duplicate_spans_sql("documents", "doc_id", "text", 5, 8)


def q_gap_fill(spark, sf):
    """Calendar gap-fill + linear interpolation (operators/temporal.
    gap_fill_daily): per-user daily spine with missing days
    interpolated in exact integer cents — the timeseries
    regularization pass; per-key windows only, nothing global."""
    from ..operators.temporal import gap_fill_daily

    return gap_fill_daily(load(spark, sf, "events"), "user_id", "ts", "value")


def oracle_gap_fill() -> str:
    from ..operators.temporal import gap_fill_daily_sql

    return gap_fill_daily_sql("events", "user_id", "ts", "value")


TRIANGLE_EPS = 0.75


def q_triangle_count(spark, sf):
    """Degree-oriented triangle counting (operators/graph.
    triangle_counts) over the ε-similarity graph on embeddings —
    the clustering-coefficient / community-density audit for a
    near-dup graph. Orientation puts the wedge explosion on
    low-degree vertices (Suri & Vassilvitskii), so a hot node of
    degree D costs O(D·avg_deg), not O(D²). Edge generation here is
    the exact kernel (500 vectors); at LSH_THRESHOLD scale the same
    edges come from lsh_candidate_pairs — triangle_counts only sees
    an edge list either way."""
    from ..operators.graph import triangle_counts

    emb = load(spark, sf, "embeddings")
    edges = C.brute_force_pairs(
        emb, emb, TRIANGLE_EPS, id_col="vec_id", vec_col="embedding",
        upper_only=True, with_dist=False,
    )
    return triangle_counts(edges, "l_id", "r_id")


KCORE_EPS = 0.72
KCORE_K = 4


def q_kcore(spark, sf):
    """k-core decomposition (operators/graph.kcore) of the
    ε-similarity graph — synchronous peeling to the dense community
    core, with one extra degree pass certifying the fixpoint in the
    hashed output (converged=true). 10 peels cover every testdata
    graph (densest needs 7); per round one survivor semi-join + one
    degree groupBy, all keyed on vertex id."""
    from ..operators.graph import kcore

    emb = load(spark, sf, "embeddings")
    edges = C.brute_force_pairs(
        emb, emb, KCORE_EPS, id_col="vec_id", vec_col="embedding",
        upper_only=True, with_dist=False,
    )
    return kcore(edges, k=KCORE_K, rounds=10)


def oracle_kcore() -> str:
    from ..operators.graph import kcore_sql

    dist = V.cosine_distance_sql("a.embedding", "b.embedding")
    cte = (
        "SELECT a.vec_id AS l_id, b.vec_id AS r_id "
        "FROM embeddings a JOIN embeddings b "
        f"ON a.vec_id < b.vec_id AND {dist} <= {KCORE_EPS}"
    )
    return kcore_sql(cte, k=KCORE_K, rounds=10)


def q_clustering_coeff(spark, sf):
    """Local clustering coefficient (operators/graph.
    clustering_coefficient) over the ε-similarity graph: Watts-
    Strogatz neighborhood density per node, exact integer tri/deg
    plus one IEEE division quantized half-up — the community-
    tightness profile next to kcore's global fixpoint."""
    from ..operators.graph import clustering_coefficient

    emb = load(spark, sf, "embeddings")
    edges = C.brute_force_pairs(
        emb, emb, KCORE_EPS, id_col="vec_id", vec_col="embedding",
        upper_only=True, with_dist=False,
    )
    return clustering_coefficient(edges)


def oracle_clustering_coeff() -> str:
    from ..operators.graph import clustering_coefficient_sql

    dist = V.cosine_distance_sql("a.embedding", "b.embedding")
    cte = (
        "SELECT a.vec_id AS l_id, b.vec_id AS r_id "
        "FROM embeddings a JOIN embeddings b "
        f"ON a.vec_id < b.vec_id AND {dist} <= {KCORE_EPS}"
    )
    return clustering_coefficient_sql(cte)


BFS_SEED = 0
BFS_ROUNDS = 9


def q_bfs_levels(spark, sf):
    """BFS hop levels (operators/graph.bfs_levels) from vec_id 0 on
    the ε-similarity graph — reachability with distances, the probe
    behind "how many hops connect these communities". Synchronous
    frontier expansion; 9 rounds cover every testdata graph (deepest
    eccentricity observed is 6 at sf0.001, 5 at sf0.01) and the
    fixpoint is certified in-band (frontier_exhausted), so a green
    hash proves the reachable set is complete — including the 4
    sf0.01 vertices correctly absent (disconnected from seed 0)."""
    from ..operators.graph import bfs_levels

    emb = load(spark, sf, "embeddings")
    edges = C.brute_force_pairs(
        emb, emb, KCORE_EPS, id_col="vec_id", vec_col="embedding",
        upper_only=True, with_dist=False,
    )
    return bfs_levels(edges, seed=BFS_SEED, rounds=BFS_ROUNDS)


def oracle_bfs_levels() -> str:
    from ..operators.graph import bfs_levels_sql

    dist = V.cosine_distance_sql("a.embedding", "b.embedding")
    cte = (
        "SELECT a.vec_id AS l_id, b.vec_id AS r_id "
        "FROM embeddings a JOIN embeddings b "
        f"ON a.vec_id < b.vec_id AND {dist} <= {KCORE_EPS}"
    )
    return bfs_levels_sql(cte, seed=BFS_SEED, rounds=BFS_ROUNDS)


def q_mutual_nn(spark, sf):
    """Mutual nearest-neighbour pairs (operators/linkage.
    mutual_best_match) on the ε-similarity graph: a pair survives
    only if each vector is the other's single closest ε-neighbour —
    the conservative 1:1 merge decision that never chains A-B-C the
    way a plain threshold does. Two id-keyed row_number windows over
    the candidate edges; ties on distance break by neighbour id.
    Output canonicalized to l<r with the distance half-up
    quantized."""
    from ..operators.linkage import mutual_best_match

    emb = load(spark, sf, "embeddings")
    edges = C.brute_force_pairs(
        emb, emb, KCORE_EPS, id_col="vec_id", vec_col="embedding",
        upper_only=False, with_dist=True,
    )
    kept = mutual_best_match(
        edges, l_col="l_id", r_col="r_id", score_col="dist",
        ascending=True,
    )
    return (
        kept.where(F.col("l_id") < F.col("r_id"))
        .select(
            "l_id",
            "r_id",
            F.floor(F.col("dist") * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias("dist_q"),
        )
        .orderBy("l_id", "r_id")
    )


def oracle_mutual_nn() -> str:
    dist = V.cosine_distance_sql("a.embedding", "b.embedding")
    return f"""
WITH e AS MATERIALIZED (
  SELECT a.vec_id AS l_id, b.vec_id AS r_id, {dist} AS dist
  FROM embeddings a JOIN embeddings b
  ON a.vec_id <> b.vec_id AND {dist} <= {KCORE_EPS}
),
ranked AS (
  SELECT l_id, r_id, dist,
         row_number() OVER (PARTITION BY l_id ORDER BY dist, r_id) AS rl,
         row_number() OVER (PARTITION BY r_id ORDER BY dist, l_id) AS rr
  FROM e
)
SELECT l_id, r_id,
       floor(dist * 1e6 + 0.5)::BIGINT AS dist_q
FROM ranked
WHERE rl = 1 AND rr = 1 AND l_id < r_id
ORDER BY l_id, r_id
"""


def q_sssp(spark, sf):
    """Weighted single-source shortest paths (operators/graph.sssp)
    from vec_id 0 on the ε-similarity graph, edge weight = quantized
    cosine distance + 1 (strictly positive ints) — "how close is
    every document to this one under accumulated similarity cost",
    the weighted generalization of bfs_levels. Synchronous
    Bellman-Ford; the hop-longest shortest path on the testdata
    graphs is 6 (probed at both SFs), 9 rounds give fixpoint margin
    and the certificate (converged) is hashed in-band."""
    from ..operators.graph import sssp

    emb = load(spark, sf, "embeddings")
    edges = C.brute_force_pairs(
        emb, emb, KCORE_EPS, id_col="vec_id", vec_col="embedding",
        upper_only=True, with_dist=True,
    ).select(
        "l_id",
        "r_id",
        (
            F.floor(F.col("dist") * F.lit(1e6) + F.lit(0.5)).cast("long")
            + F.lit(1)
        ).alias("w"),
    )
    return sssp(edges, seed=BFS_SEED, rounds=BFS_ROUNDS)


def oracle_sssp() -> str:
    from ..operators.graph import sssp_sql

    dist = V.cosine_distance_sql("a.embedding", "b.embedding")
    cte = (
        "SELECT a.vec_id AS l_id, b.vec_id AS r_id, "
        f"floor(({dist}) * 1e6 + 0.5)::BIGINT + 1 AS w "
        "FROM embeddings a JOIN embeddings b "
        f"ON a.vec_id < b.vec_id AND {dist} <= {KCORE_EPS}"
    )
    return sssp_sql(cte, seed=BFS_SEED, rounds=BFS_ROUNDS)


LINKPRED_TOPK = 100
LINKPRED_MAXDEG = 64


def q_link_predict(spark, sf):
    """Link prediction (operators/graph.link_predict): common-
    neighbor count + resource-allocation index over the ε-graph,
    ranking the non-adjacent pairs most likely to merge — the graph
    dual of embedding near-dup mining. Hub wedge-centers capped at
    deg 64 (deg^2 wedge blowup; RA weight of a hub term is ~0
    anyway), deterministic top-100."""
    from ..operators.graph import link_predict

    emb = load(spark, sf, "embeddings")
    edges = C.brute_force_pairs(
        emb, emb, KCORE_EPS, id_col="vec_id", vec_col="embedding",
        upper_only=True, with_dist=False,
    )
    return link_predict(
        edges, top_k=LINKPRED_TOPK, max_degree=LINKPRED_MAXDEG
    )


def oracle_link_predict() -> str:
    from ..operators.graph import link_predict_sql

    dist = V.cosine_distance_sql("a.embedding", "b.embedding")
    cte = (
        "SELECT a.vec_id AS l_id, b.vec_id AS r_id "
        "FROM embeddings a JOIN embeddings b "
        f"ON a.vec_id < b.vec_id AND {dist} <= {KCORE_EPS}"
    )
    return link_predict_sql(
        cte, top_k=LINKPRED_TOPK, max_degree=LINKPRED_MAXDEG
    )


def q_skyline(spark, sf):
    """2-D skyline / Pareto frontier (operators/skyline.skyline_2d)
    of part: cheapest price (integer cents) at each size level —
    two-phase distributed frontier (per-bucket window, then one
    window over the provably reduced local-frontier union). Oracle
    is the independent NOT-EXISTS dominance definition."""
    from ..operators.skyline import skyline_2d

    part = load(spark, sf, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("price_c"),
        "p_size",
    )
    return skyline_2d(
        part, id_col="p_partkey", min_col="price_c", max_col="p_size"
    ).select(
        F.col("id").alias("p_partkey"),
        F.col("min_axis").alias("price_c"),
        F.col("max_axis").alias("p_size"),
    )


def oracle_skyline() -> str:
    from ..operators.skyline import skyline_2d_sql

    cte = (
        "SELECT p_partkey, "
        "floor(p_retailprice * 100.0 + 0.5)::BIGINT AS price_c, "
        "p_size FROM part"
    )
    sql = skyline_2d_sql(cte, "p_partkey", "price_c", "p_size")
    return (
        "SELECT id AS p_partkey, min_axis AS price_c, "
        f"max_axis AS p_size FROM ({sql}) ORDER BY price_c, p_partkey"
    )


def q_fuzzy_join(spark, sf):
    """Levenshtein-1 fuzzy self-join (operators/linkage.
    fuzzy_join_lev1) over customer names via lossless SymSpell
    deletion-neighborhood blocking — equi-join on O(len) generated
    keys, exact edit-distance verify per candidate only. The oracle
    is the independent quadratic θ-join, so green also certifies
    the blocking loses no pair."""
    from ..operators.linkage import fuzzy_join_lev1

    cust = load(spark, sf, "customer")
    return fuzzy_join_lev1(cust, id_col="c_custkey", text_col="c_name")


def oracle_fuzzy_join() -> str:
    from ..operators.linkage import fuzzy_join_lev1_sql

    return fuzzy_join_lev1_sql("customer", "c_custkey", "c_name")


def q_ols_fit(spark, sf):
    """Per-language OLS (operators/regression.ols_fit) of document
    chars on whitespace tokens — ONE groupBy of six exact-integer
    sufficient statistics (map-side combinable, order-free), then
    O(1) arithmetic per group. The canonical profiling regression
    at any scale."""
    from ..operators.regression import ols_fit

    docs = load(spark, sf, "documents")
    pts = TA.token_counts(docs, "text").select(
        "lang", F.col("ws_token_count").alias("x"),
        F.col("n_chars").alias("y"),
    )
    return ols_fit(pts, group_col="lang", x_col="x", y_col="y")


def oracle_ols_fit() -> str:
    from ..operators.regression import ols_fit_sql

    ws, _ = TA.token_counts_sql("text")
    cte = (
        f"SELECT lang, {ws} AS x, n_chars AS y FROM documents"
    )
    return ols_fit_sql(cte, "lang", "x", "y")


def q_small_qty_revenue(spark, sf):
    """TPC-H Q17 shape, per brand: revenue from lineitems whose
    quantity is below 20% of their part's average — the classic
    correlated-scalar-subquery DECORRELATION: per-part aggregate
    once, join back, never a per-row subquery. The threshold
    compare is exact integer algebra (qty < 0.2*avg ⟺
    5*qty*cnt < sum_qty), so no float drift can flip a row."""
    li = load(spark, sf, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        "l_extendedprice",
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_q"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    part = load(spark, sf, "part").select("p_partkey", "p_brand")
    below = (
        li.join(per_part, "l_partkey")
        .where(
            F.lit(5) * F.col("qty") * F.col("cnt") < F.col("sum_q")
        )
        .join(
            F.broadcast(part),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    return (
        below.groupBy("p_brand")
        .agg(
            _money(F.sum(_dec("l_extendedprice"))).alias("below_rev"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
        .select(
            "p_brand",
            "below_rev",
            "n_items",
            F.floor(
                F.col("below_rev") / F.lit(7.0) * F.lit(100.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("avg_yearly_c"),
        )
        .orderBy("p_brand")
    )


ORACLE_SMALL_QTY_REVENUE = """
WITH li AS (
  SELECT l_partkey, l_quantity::BIGINT AS qty, l_extendedprice
  FROM lineitem
),
per_part AS (
  SELECT l_partkey, sum(qty)::BIGINT AS sum_q, count(*)::BIGINT AS cnt
  FROM li GROUP BY l_partkey
),
below AS (
  SELECT p.p_brand, l.l_extendedprice
  FROM li l
  JOIN per_part pp ON pp.l_partkey = l.l_partkey
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE 5 * l.qty * pp.cnt < pp.sum_q
),
agg AS (
  SELECT p_brand,
         round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2)::DOUBLE
           AS below_rev,
         count(*)::BIGINT AS n_items
  FROM below GROUP BY p_brand
)
SELECT p_brand, below_rev, n_items,
       floor(below_rev / 7.0 * 100.0 + 0.5)::BIGINT AS avg_yearly_c
FROM agg ORDER BY p_brand
"""


def q_attribution(spark, sf):
    """Last-touch attribution (operators/temporal.
    last_touch_attribution): one carry-forward window per user (no
    self-join, no scan-back), exact integer-microsecond gaps,
    1-hour lookback."""
    from ..operators.temporal import last_touch_attribution

    ev = load(spark, sf, "events")
    return last_touch_attribution(ev)


def oracle_attribution() -> str:
    from ..operators.temporal import last_touch_attribution_sql

    return last_touch_attribution_sql()


def q_seq_patterns(spark, sf):
    """Length-2 sequential-pattern support (operators/frequent.
    sequence_pair_support): first(a) < last(b) identity reduces each
    user to vocab-bounded rows; the pair join is vocab² per user,
    never events²."""
    from ..operators.frequent import sequence_pair_support

    ev = load(spark, sf, "events")
    return sequence_pair_support(ev, min_support=2)


def oracle_seq_patterns() -> str:
    from ..operators.frequent import sequence_pair_support_sql

    return sequence_pair_support_sql(min_support=2)


def q_cusum(spark, sf):
    """CUSUM change-point detection (operators/temporal.cusum_daily):
    the sequential max(0, s+(x-k)) recurrence via its closed form
    p_i - min(0, running-min p) — two frame-bounded windows per
    series, exact integers throughout (series scaled by n so the
    mean reference never divides)."""
    from ..operators.temporal import cusum_daily

    return cusum_daily(load(spark, sf, "events"))


def oracle_cusum() -> str:
    from ..operators.temporal import cusum_daily_sql

    return cusum_daily_sql()


def q_autocorr(spark, sf):
    """Lag-1 autocorrelation of zero-filled daily counts per event
    type (operators/temporal.autocorr_daily): one window lag +
    exact-integer sufficient statistics; sqrt is IEEE
    correctly-rounded so the quantized r replays in DuckDB."""
    from ..operators.temporal import autocorr_daily

    return autocorr_daily(load(spark, sf, "events"))


def oracle_autocorr() -> str:
    from ..operators.temporal import autocorr_daily_sql

    return autocorr_daily_sql()


def q_kmv_distinct(spark, sf):
    """KMV/theta distinct sketch (operators/cardinality.kmv_distinct)
    of lineitem part keys — k-minimum md5 hashes, exact top-k, one
    exactly-representable double division; self-certifying rel_err
    against the exact count."""
    from ..operators.cardinality import kmv_distinct

    li = load(spark, sf, "lineitem")
    return kmv_distinct(li, "l_partkey", k=256)


def oracle_kmv_distinct() -> str:
    from ..operators.cardinality import kmv_distinct_sql

    return kmv_distinct_sql("lineitem", "l_partkey", k=256)


def q_corr_matrix(spark, sf):
    """Pairwise Pearson matrix over lineitem measures (operators/
    profiling.corr_matrix): every sufficient statistic from ONE
    map-side-combinable aggregation, DECIMAL(38,0) cross-products
    (int64-safe past 100 TB), 6 pairs unpivoted from the single
    stats row."""
    from ..operators.profiling import corr_matrix

    return corr_matrix(load(spark, sf, "lineitem"))


def oracle_corr_matrix() -> str:
    from ..operators.profiling import corr_matrix_sql

    return corr_matrix_sql("lineitem")


def q_hilbert_layout(spark, sf):
    """Hilbert-curve layout keys over part (price cents × size)
    (operators/layout.hilbert_layout_stats): better-locality sibling
    of zorder_layout — the stateful rotation unrolls into chained
    zero-shuffle projections Catalyst collapses; per-bucket min/max
    spans are the footer stats pruning would use."""
    from ..operators.layout import hilbert_layout_stats

    part = load(spark, sf, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("price_c"),
        "p_size",
    )
    return hilbert_layout_stats(part, "price_c", "p_size").orderBy(
        "hbucket"
    )


def oracle_hilbert_layout() -> str:
    from ..operators.layout import hilbert_layout_stats_sql

    inner = (
        "SELECT p_partkey, floor(p_retailprice * 100.0 + 0.5)::BIGINT "
        "AS price_c, p_size FROM part"
    )
    sql = hilbert_layout_stats_sql(f"({inner})", "price_c", "p_size")
    return f"SELECT * FROM ({sql}) ORDER BY hbucket"


def q_benford(spark, sf):
    """Benford first-digit audit of lineitem prices (operators/
    profiling.benford_audit): digit from the decimal string of
    integer cents (never float log10), expected probabilities as
    shared compile-time literals, per-digit chi-square terms."""
    from ..operators.profiling import benford_audit

    return benford_audit(load(spark, sf, "lineitem"), "l_extendedprice")


def oracle_benford() -> str:
    from ..operators.profiling import benford_audit_sql

    return benford_audit_sql("lineitem", "l_extendedprice")


def q_source_jaccard(spark, sf):
    """Corpus-pair Jaccard between document sources (operators/
    dedup.source_jaccard): exact shingle-set overlap via a
    shingle-keyed equi-join (blowup bounded by sources-per-shingle²,
    never documents²) — the dedup-planning matrix."""
    from ..operators.dedup import source_jaccard

    return source_jaccard(load(spark, sf, "documents"))


def oracle_source_jaccard() -> str:
    from ..operators.dedup import source_jaccard_sql

    return source_jaccard_sql("documents")


def q_source_jaccard_kmv(spark, sf):
    """Sketched corpus-pair Jaccard (operators/dedup.
    source_jaccard_kmv, r07): per-source KMV bottom-512 shingle
    sketches — ONE corpus-scale distinct, no shingle self-join; all
    pair math on the #sources·k sketch table (kilobytes at any
    corpus size). The planning-grade replacement for the exact
    variant's hot-shingle #sources² fanout; exact kept for audits.
    r08: τ-prefiltered (only bottom-k candidates reach the distinct
    shuffle) over a widened scan (the shingle+md5 stage was a single
    task on the one-file bench input)."""
    from ..operators.dedup import source_jaccard_kmv

    return source_jaccard_kmv(widen(spark, load(spark, sf, "documents")))


def oracle_source_jaccard_kmv() -> str:
    from ..operators.dedup import source_jaccard_kmv_sql

    return source_jaccard_kmv_sql("documents")


def q_weighted_median(spark, sf):
    """Exact lower weighted median of price-by-quantity per brand
    (operators/profiling.weighted_median): weight pre-aggregated per
    (group, value) before the per-group cumulative window; the
    half-total test is pure integer algebra (2·cumw >= totw)."""
    from ..operators.profiling import weighted_median

    li = load(spark, sf, "lineitem").select(
        "l_partkey",
        F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("price_c"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    part = load(spark, sf, "part").select("p_partkey", "p_brand")
    joined = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    )
    return weighted_median(joined, "p_brand", "price_c", "qty")


ORACLE_WEIGHTED_MEDIAN_CTE = """
SELECT p.p_brand,
       floor(l.l_extendedprice * 100.0 + 0.5)::BIGINT AS price_c,
       l.l_quantity::BIGINT AS qty
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
"""


def oracle_weighted_median() -> str:
    from ..operators.profiling import weighted_median_sql

    return weighted_median_sql(
        ORACLE_WEIGHTED_MEDIAN_CTE, "p_brand", "price_c", "qty"
    )


def q_zipf_slope(spark, sf):
    """Zipf slope of the document corpus (operators/text_analysis.
    zipf_slope): exact TakeOrdered top-1000 head, one bounded
    window for ranks, per-term quantized logs, DECIMAL(38,0)
    sufficient statistics."""
    from ..operators.text_analysis import zipf_slope

    return zipf_slope(load(spark, sf, "documents"))


def oracle_zipf_slope() -> str:
    from ..operators.text_analysis import zipf_slope_sql

    return zipf_slope_sql("documents")


def q_shannon_diversity(spark, sf):
    """Token-type Shannon diversity + Pielou evenness per source
    (operators/text_analysis.shannon_diversity): one log per TYPE
    quantized to an integer term, decimal accumulation."""
    from ..operators.text_analysis import shannon_diversity

    return shannon_diversity(load(spark, sf, "documents"))


def oracle_shannon_diversity() -> str:
    from ..operators.text_analysis import shannon_diversity_sql

    return shannon_diversity_sql("documents")


def q_fano_factor(spark, sf):
    """Burstiness (index of dispersion) of daily counts per event
    type (operators/temporal.fano_factor): exact integer variance
    algebra, one division, zero-filled spine."""
    from ..operators.temporal import fano_factor

    return fano_factor(load(spark, sf, "events"))


def oracle_fano_factor() -> str:
    from ..operators.temporal import fano_factor_sql

    return fano_factor_sql()


RRF_LEG_K = 50


def q_rrf_fusion(spark, sf):
    """Hybrid retrieval: reciprocal-rank fusion (operators/curation.
    rrf_fuse) of a BM25 lexical leg and an embedding-cosine leg —
    rank-only combination, integer-quantized RRF terms. The cosine
    leg is the gated 1-query brute-force kernel (ann family); at
    corpus scale it swaps for ivf/lsh_topk unchanged."""
    from ..operators.curation import bm25_search, rrf_fuse

    docs = load(spark, sf, "documents")
    bm = bm25_search(
        docs, "doc_id", "text", BM25_QUERY_TERMS, top_k=RRF_LEG_K
    )
    wa = Window.orderBy(F.col("score_q").desc(), "doc_id")
    leg_a = bm.select(
        "doc_id", F.row_number().over(wa).cast("long").alias("rank")
    )
    emb = load(spark, sf, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    leg_b = S.brute_force_topk(q, emb, k=RRF_LEG_K).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    fused = rrf_fuse(leg_a, leg_b, id_col="doc_id", top_k=20)
    # rename to match the oracle's column set exactly (the driver
    # compares schemas by NAME)
    return fused.withColumnRenamed("id", "doc_id")


def oracle_rrf_fusion() -> str:
    from ..operators.curation import bm25_search_sql, rrf_fuse_sql

    bm = bm25_search_sql(
        "text", "doc_id", "documents", BM25_QUERY_TERMS,
        top_k=RRF_LEG_K,
    )
    leg_a = (
        f"SELECT doc_id AS id, row_number() OVER "
        f"(ORDER BY score_q DESC, doc_id) AS rank FROM ({bm})"
    )
    cos = V.dot_sql("q.embedding", "c.embedding")
    nrm = f"({V.norm_sql('q.embedding')} * {V.norm_sql('c.embedding')})"
    leg_b = f"""
SELECT neighbor_id AS id, rank FROM (
  SELECT c.vec_id AS neighbor_id,
         row_number() OVER (ORDER BY {cos} / {nrm} DESC, c.vec_id ASC)
           AS rank
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id = 0
) WHERE rank <= {RRF_LEG_K}
"""
    sql = rrf_fuse_sql(leg_a, leg_b, top_k=20)
    return (
        f"SELECT id AS doc_id, rank_a, rank_b, rrf_q FROM ({sql})"
    )


def q_gini_stump(spark, sf):
    """CART split finding (operators/evaluation.gini_stump): best
    1-level Gini stump predicting returned lineitems from quantity /
    discount — distinct-value collapse before per-feature cumulative
    windows, single-pass threshold sweep, deterministic quantized
    argmin."""
    from ..operators.evaluation import gini_stump

    li = load(spark, sf, "lineitem").select(
        (F.col("l_returnflag") == F.lit("R")).cast("long").alias("ret"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_discount") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("disc_c"),
    )
    return gini_stump(li, "ret", ["qty", "disc_c"])


def oracle_gini_stump() -> str:
    from ..operators.evaluation import gini_stump_sql

    cte = (
        "SELECT (l_returnflag = 'R')::BIGINT AS ret, "
        "l_quantity::BIGINT AS qty, "
        "floor(l_discount * 100.0 + 0.5)::BIGINT AS disc_c "
        "FROM lineitem"
    )
    return gini_stump_sql(cte, "ret", ["qty", "disc_c"])


def q_gini_concentration(spark, sf):
    """Revenue-concentration Gini per nation (operators/profiling.
    gini_concentration): customer order totals in cents, one rank
    window per nation, DECIMAL(38,0) rank·value accumulation."""
    from ..operators.profiling import gini_concentration

    cust = load(spark, sf, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = load(spark, sf, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("rev_c"),
    )
    per_cust = (
        orders.join(
            F.broadcast(cust),
            orders["o_custkey"] == cust["c_custkey"],
        )
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.sum("rev_c").alias("rev"))
    )
    return gini_concentration(per_cust, "c_nationkey", "rev")


ORACLE_GINI_CTE = """
SELECT c.c_nationkey, c.c_custkey, sum(rc.rev_c)::BIGINT AS rev
FROM (SELECT o_custkey,
             floor(o_totalprice * 100.0 + 0.5)::BIGINT AS rev_c
      FROM orders) rc
JOIN customer c ON c.c_custkey = rc.o_custkey
GROUP BY 1, 2
"""


def oracle_gini_concentration() -> str:
    from ..operators.profiling import gini_concentration_sql

    return gini_concentration_sql(
        ORACLE_GINI_CTE, "c_nationkey", "rev"
    )


def q_winsorize(spark, sf):
    """Winsorized price statistics per brand (operators/profiling.
    winsorized_stats): exact order-statistic P05/P95 clip via
    integer rank compare — no float percentile anywhere."""
    from ..operators.profiling import winsorized_stats

    li = load(spark, sf, "lineitem").select(
        "l_partkey",
        F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("price_c"),
    )
    part = load(spark, sf, "part").select("p_partkey", "p_brand")
    joined = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    )
    return winsorized_stats(joined, "p_brand", "price_c")


ORACLE_WINSOR_CTE = """
SELECT p.p_brand,
       floor(l.l_extendedprice * 100.0 + 0.5)::BIGINT AS price_c
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
"""


def oracle_winsorize() -> str:
    from ..operators.profiling import winsorized_stats_sql

    return winsorized_stats_sql(ORACLE_WINSOR_CTE, "p_brand", "price_c")


def q_abc_classify(spark, sf):
    """ABC/Pareto classification of parts by revenue within brand
    (operators/profiling.abc_classify): per-brand rank + running-sum
    windows, integer share thresholds, per-class rollup."""
    from ..operators.profiling import abc_classify

    li = load(spark, sf, "lineitem").select(
        "l_partkey",
        F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("price_c"),
    )
    part = load(spark, sf, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(
            F.broadcast(part), li["l_partkey"] == part["p_partkey"]
        )
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum("price_c").alias("rev"))
    )
    return abc_classify(rev, "p_brand", "p_partkey", "rev")


ORACLE_ABC_CTE = """
SELECT p.p_brand, p.p_partkey, sum(
  floor(l.l_extendedprice * 100.0 + 0.5)::BIGINT) AS rev
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1, 2
"""


def oracle_abc_classify() -> str:
    from ..operators.profiling import abc_classify_sql

    return abc_classify_sql(
        ORACLE_ABC_CTE, "p_brand", "p_partkey", "rev"
    )


def q_welch_z(spark, sf):
    """One-vs-rest Welch z-test of event value by type (operators/
    profiling.welch_z_test): rest-side statistics derived as
    total − group from one aggregation — no second scan."""
    from ..operators.profiling import welch_z_test

    ev = load(spark, sf, "events").select(
        "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("v_c"),
    )
    return welch_z_test(ev, "event_type", "v_c")


def oracle_welch_z() -> str:
    from ..operators.profiling import welch_z_test_sql

    cte = (
        "SELECT event_type, "
        "floor(value * 100.0 + 0.5)::BIGINT AS v_c FROM events"
    )
    return welch_z_test_sql(cte, "event_type", "v_c")


def q_setsim_join(spark, sf):
    """Exact all-pairs Jaccard >= 1/2 self-join over documents via
    AllPairs prefix filtering (operators/dedup.setsim_join) — the
    deterministic, no-miss complement to MinHash LSH. The oracle is
    the independent quadratic formulation, so green certifies the
    prefix filter is lossless."""
    from ..operators.dedup import setsim_join

    return setsim_join(load(spark, sf, "documents"))


def oracle_setsim_join() -> str:
    from ..operators.dedup import setsim_join_sql

    return setsim_join_sql("documents")


def q_ndcg_eval(spark, sf):
    """NDCG@10 of the BM25 ranking against graded term-coverage
    relevance (operators/evaluation.ndcg_at_k): discount literals
    precomputed — no runtime log; per-term integer quantization so
    the DCG sum is order-free."""
    from ..operators.curation import bm25_search
    from ..operators.evaluation import ndcg_at_k

    docs = load(spark, sf, "documents")
    bm = bm25_search(
        docs, "doc_id", "text", BM25_QUERY_TERMS, top_k=RRF_LEG_K
    )
    wa = Window.orderBy(F.col("score_q").desc(), "doc_id")
    ranked = bm.select(
        "doc_id", F.row_number().over(wa).cast("long").alias("rank")
    )
    from ..functions import hashing as HH

    rel_expr = None
    for t in sorted(set(BM25_QUERY_TERMS)):
        has = F.array_contains(HH.tokens("text"), t).cast("long")
        rel_expr = has if rel_expr is None else rel_expr + has
    relevance = docs.select(
        "doc_id", rel_expr.alias("rel")
    ).where(F.col("rel") > 0)
    return ndcg_at_k(ranked, relevance, k=10)


def oracle_ndcg_eval() -> str:
    from ..operators.curation import bm25_search_sql
    from ..operators.evaluation import ndcg_at_k_sql
    from ..functions import hashing as HH

    bm = bm25_search_sql(
        "text", "doc_id", "documents", BM25_QUERY_TERMS,
        top_k=RRF_LEG_K,
    )
    ranked = (
        f"SELECT doc_id, row_number() OVER "
        f"(ORDER BY score_q DESC, doc_id)::BIGINT AS rank FROM ({bm})"
    )
    tok = HH.tokens_sql("text")
    rel = " + ".join(
        f"list_contains({tok}, '{t}')::BIGINT"
        for t in sorted(set(BM25_QUERY_TERMS))
    )
    relevance = (
        f"SELECT doc_id, ({rel}) AS rel FROM documents "
        f"WHERE ({rel}) > 0"
    )
    return ndcg_at_k_sql(ranked, relevance, k=10)


def q_period_over_period(spark, sf):
    """Month-over-month / year-over-year revenue by order priority
    (operators/temporal.period_over_period): month spine zero-fill,
    two lag windows per key, exact integer cents."""
    from ..operators.temporal import period_over_period

    orders = load(spark, sf, "orders")
    return period_over_period(
        orders, "o_orderpriority", "o_orderdate", "o_totalprice"
    )


def oracle_period_over_period() -> str:
    from ..operators.temporal import period_over_period_sql

    return period_over_period_sql(
        "SELECT * FROM orders",
        "o_orderpriority",
        "o_orderdate",
        "o_totalprice",
    )


def q_survival_curve(spark, sf):
    """Kaplan-Meier time-to-second-event retention curve over events
    (operators/temporal.survival_curve): censoring handled at the
    horizon, KM product emitted in quantized log space (exp is not
    correctly-rounded; ln with per-term integer quantization is the
    engine's certified log discipline)."""
    from ..operators.temporal import survival_curve

    return survival_curve(load(spark, sf, "events"))


def oracle_survival_curve() -> str:
    from ..operators.temporal import survival_curve_sql

    return survival_curve_sql()


def q_hhi(spark, sf):
    """Herfindahl-Hirschman supplier-revenue concentration per
    nation (operators/profiling.hhi_index): exact integer Σv²/S²
    with one closing division."""
    from ..operators.profiling import hhi_index

    li = load(spark, sf, "lineitem").select(
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("price_c"),
    )
    supp = load(spark, sf, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    joined = li.join(
        F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"]
    )
    return hhi_index(joined, "s_nationkey", "l_suppkey", "price_c")


ORACLE_HHI_CTE = """
SELECT s.s_nationkey, l.l_suppkey,
       floor(l.l_extendedprice * 100.0 + 0.5)::BIGINT AS price_c
FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
"""


def oracle_hhi() -> str:
    from ..operators.profiling import hhi_index_sql

    return hhi_index_sql(
        ORACLE_HHI_CTE, "s_nationkey", "l_suppkey", "price_c"
    )


def q_weekday_profile(spark, sf):
    """Weekday seasonality chi-square per event type (operators/
    temporal.weekday_profile): spine-correct expectations (weekday
    share of the actual span, not 1/7) — partial weeks never bias
    the test."""
    from ..operators.temporal import weekday_profile

    return weekday_profile(load(spark, sf, "events"))


def oracle_weekday_profile() -> str:
    from ..operators.temporal import weekday_profile_sql

    return weekday_profile_sql()


def q_cohort_ltv(spark, sf):
    """Cohort lifetime-value accumulation: users grouped by
    first-seen ISO week, their event value summed per week-offset,
    then CUMULATIVE per cohort (the LTV curve investors read off a
    retention matrix). Exact integer cents; the cumulative window
    partitions by cohort — nothing global. Same two-shuffle shape
    as cohort_retention (first-seen table is per-user, broadcast
    back)."""
    ev = load(spark, sf, "events").select(
        "user_id",
        "ts",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("v_c"),
    )
    first = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
    j = ev.join(F.broadcast(first), "user_id")
    week0 = F.date_sub(
        F.to_date("t0"), (F.dayofweek(F.to_date("t0")) + 5) % 7
    )
    offset = F.floor(
        F.datediff(F.to_date("ts"), week0) / F.lit(7)
    ).cast("long")
    weekly = (
        j.select(
            F.date_format(week0, "yyyy-MM-dd").alias("cohort_week"),
            offset.alias("week_offset"),
            "v_c",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.sum("v_c").cast("long").alias("week_value"))
    )
    wc = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return weekly.select(
        "cohort_week",
        "week_offset",
        "week_value",
        F.sum("week_value").over(wc).cast("long").alias("cum_ltv"),
    ).orderBy("cohort_week", "week_offset")


ORACLE_COHORT_LTV = """
WITH ev AS (
  SELECT user_id, ts, floor(value * 100.0 + 0.5)::BIGINT AS v_c
  FROM events
),
first AS (SELECT user_id, min(ts) AS t0 FROM ev GROUP BY user_id),
j AS (
  SELECT e.ts, e.v_c,
         (f.t0::DATE
          - (((dayofweek(f.t0::DATE) + 6) % 7))::INTEGER) AS week0
  FROM ev e JOIN first f ON f.user_id = e.user_id
),
weekly AS (
  SELECT strftime(week0, '%Y-%m-%d') AS cohort_week,
         floor((ts::DATE - week0) / 7)::BIGINT AS week_offset,
         CAST(sum(v_c) AS BIGINT) AS week_value
  FROM j GROUP BY 1, 2
)
SELECT cohort_week, week_offset, week_value,
       CAST(sum(week_value) OVER (PARTITION BY cohort_week
            ORDER BY week_offset
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_ltv
FROM weekly ORDER BY cohort_week, week_offset
"""


def q_top_paths(spark, sf):
    """Top-20 session paths: per 30-min session, the ordered
    event-type string (events sorted by the zero-padded (ts,id)
    total key via array_sort over structs — deterministic), counted
    across sessions. The funnel-discovery view next to
    event_transitions' pair matrix."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts"), 1).over(w)
    sess = (
        ev.withColumn(
            "new_sess",
            (gap > 1800 * 1_000_000).cast("long"),
        )
        .fillna({"new_sess": 1})
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(
                Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    keyed = sess.select(
        "user_id",
        "sess_id",
        F.struct(
            F.concat(
                F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
                F.lpad(F.col("event_id").cast("string"), 12, "0"),
            ).alias("k"),
            F.col("event_type").alias("et"),
        ).alias("s"),
    )
    paths = (
        keyed.groupBy("user_id", "sess_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda x: x["et"]
                ),
                ">",
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )
    return paths


ORACLE_TOP_PATHS = """
WITH gapped AS (
  SELECT user_id, event_id, event_type, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)
              > 1800 * 1000000 THEN 1
              WHEN lag(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) IS NULL THEN 1
              ELSE 0 END AS new_sess
  FROM events
),
sess AS (
  SELECT user_id, event_id, event_type, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess_id
  FROM gapped
),
paths AS (
  SELECT user_id, sess_id,
         string_agg(event_type, '>'
                    ORDER BY lpad(epoch_us(ts)::VARCHAR, 20, '0')
                             || lpad(event_id::VARCHAR, 12, '0'))
           AS path
  FROM sess GROUP BY user_id, sess_id
)
SELECT path, count(*)::BIGINT AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
"""


def q_rolling_median(spark, sf):
    """7-day rolling median/min/max envelope of daily counts per
    event type: the frame's values are collected and sorted PER ROW
    (bounded 7-element arrays — never a shuffle), lower-median
    picked by integer index; zero-filled day spine. The robust
    alternative to ewma for spiky series."""
    ev = load(spark, sf, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("g"), F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    spine = (
        daily.groupBy("g")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "g",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("d"),
        )
    )
    full = spine.join(daily, ["g", "d"], "left").select(
        "g", "d", F.coalesce("x", F.lit(0)).cast("long").alias("x")
    )
    wf = (
        Window.partitionBy("g")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    arr = F.sort_array(F.collect_list("x").over(wf))
    n = F.size(arr)
    med = F.element_at(arr, ((n + F.lit(1)) / F.lit(2)).cast("int"))
    return full.select(
        F.col("g").alias("event_type"),
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "x",
        F.size(arr).cast("long").alias("n_window"),
        med.cast("long").alias("roll_median"),
        F.element_at(arr, 1).cast("long").alias("roll_min"),
        F.element_at(arr, -1).cast("long").alias("roll_max"),
    ).orderBy("event_type", "day")


ORACLE_ROLLING_MEDIAN = """
WITH daily AS (
  SELECT event_type AS g, ts::DATE AS d, count(*)::BIGINT AS x
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT g, unnest(generate_series(min(d), max(d),
                   INTERVAL 1 DAY))::DATE AS d
  FROM daily GROUP BY g
),
full_days AS (
  SELECT s.g, s.d, coalesce(dl.x, 0)::BIGINT AS x
  FROM spine s LEFT JOIN daily dl ON dl.g = s.g AND dl.d = s.d
),
framed AS (
  SELECT g, d, x,
         list_sort(list(x) OVER (PARTITION BY g ORDER BY d
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
  FROM full_days
)
SELECT g AS event_type, strftime(d, '%Y-%m-%d') AS day, x,
       len(arr)::BIGINT AS n_window,
       arr[(len(arr) + 1) // 2]::BIGINT AS roll_median,
       arr[1]::BIGINT AS roll_min,
       arr[len(arr)]::BIGINT AS roll_max
FROM framed ORDER BY event_type, day
"""


def q_seasonal_residuals(spark, sf):
    """Seasonally-adjusted daily anomalies: per (event_type,
    weekday) mean/sd from exact integer sufficient statistics, then
    each day's residual z — the anomaly detector that does NOT fire
    every weekend (rate_anomaly's seasonal-blind counterpart).
    sd via IEEE-correctly-rounded sqrt; zero-sd groups gated."""
    ev = load(spark, sf, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("g"), F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    spine = (
        daily.groupBy("g")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "g",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("d"),
        )
    )
    full = spine.join(daily, ["g", "d"], "left").select(
        "g",
        "d",
        F.dayofweek("d").cast("long").alias("dw"),
        F.coalesce("x", F.lit(0)).cast("long").alias("x"),
    )
    stats = full.groupBy("g", "dw").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    j = full.join(F.broadcast(stats), ["g", "dw"])
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    var = (
        F.col("n") * F.col("sxx") - F.col("s") * F.col("s")
    ).cast("double") / (
        F.col("n") * (F.col("n") - F.lit(1))
    ).cast("double")
    z = (F.col("x").cast("double") - mean) / F.sqrt(var)
    return (
        j.where(
            (F.col("n") >= 2)
            & (F.col("n") * F.col("sxx") - F.col("s") * F.col("s") > 0)
        )
        .select(
            F.col("g").alias("event_type"),
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dw",
            "x",
            F.floor(z * F.lit(1e6) + F.lit(0.5)).cast("long").alias(
                "z_q"
            ),
        )
        .orderBy("event_type", "day")
    )


ORACLE_SEASONAL_RESIDUALS = """
WITH daily AS (
  SELECT event_type AS g, ts::DATE AS d, count(*)::BIGINT AS x
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT g, unnest(generate_series(min(d), max(d),
                   INTERVAL 1 DAY))::DATE AS d
  FROM daily GROUP BY g
),
full_days AS (
  SELECT s.g, s.d, dayofweek(s.d)::BIGINT + 1 AS dw,
         coalesce(dl.x, 0)::BIGINT AS x
  FROM spine s LEFT JOIN daily dl ON dl.g = s.g AND dl.d = s.d
),
stats AS (
  SELECT g, dw, count(*)::BIGINT AS n, sum(x)::BIGINT AS s,
         sum(x * x)::BIGINT AS sxx
  FROM full_days GROUP BY 1, 2
)
SELECT f.g AS event_type, strftime(f.d, '%Y-%m-%d') AS day, f.dw,
       f.x,
       floor((f.x::DOUBLE - st.s::DOUBLE / st.n::DOUBLE)
             / sqrt((st.n * st.sxx - st.s * st.s)::DOUBLE
                    / (st.n * (st.n - 1))::DOUBLE)
             * 1e6 + 0.5)::BIGINT AS z_q
FROM full_days f JOIN stats st ON st.g = f.g AND st.dw = f.dw
WHERE st.n >= 2 AND st.n * st.sxx - st.s * st.s > 0
ORDER BY event_type, day
"""


def q_gram_matrix(spark, sf):
    """Exact embedding Gram matrix EᵀE (operators/pca.gram_matrix):
    quantize-once integer elements, row-keyed self-join with
    map-side combine, d² output cells; HUGEINT sums rendered as
    strings for the driver's pandas hasher."""
    from ..operators.pca import gram_matrix

    return gram_matrix(load(spark, sf, "embeddings"))


def oracle_gram_matrix() -> str:
    from ..operators.pca import gram_matrix_sql

    return gram_matrix_sql("embeddings")


RING_NODES = ["node-a", "node-b", "node-c", "node-d"]


def q_hash_ring(spark, sf):
    """Consistent-hash shard assignment of customers (operators/
    layout.hash_ring_assign): md5 ring broadcast (kilobytes at any
    scale), successor-with-wraparound via per-key min — the
    placement op behind elastic shard moves."""
    from ..operators.layout import hash_ring_assign

    cust = load(spark, sf, "customer")
    return hash_ring_assign(cust, "c_custkey", RING_NODES)


def oracle_hash_ring() -> str:
    from ..operators.layout import hash_ring_assign_sql

    return hash_ring_assign_sql("customer", "c_custkey", RING_NODES)


def q_join_size_sketch(spark, sf):
    """AGMS/tug-of-war F2 sketch (operators/frequent.agms_f2) of
    lineitem's part-key frequency vector — F2 is the self-join size
    and the planner's join-cardinality probe. 35 integer registers
    in ONE streaming aggregation (no row explosion, no per-key
    state) beside the exact one-shuffle answer; the emitted relative
    error certifies the estimator (quantile_sketch pattern)."""
    from ..operators.frequent import agms_f2

    return agms_f2(load(spark, sf, "lineitem"), "l_partkey")


def oracle_join_size_sketch() -> str:
    from ..operators.frequent import agms_f2_sql

    return agms_f2_sql("lineitem", "l_partkey")


def q_mutual_info(spark, sf):
    """Column-dependency MI audit (operators/profiling.
    mutual_information) between lang and source — the partition-key
    payoff predictor. Integer per-cell terms (char_entropy
    discipline); exchange carries contingency cells, never rows."""
    from ..operators.profiling import mutual_information

    return mutual_information(load(spark, sf, "documents"), "lang", "source")


def oracle_mutual_info() -> str:
    from ..operators.profiling import mutual_information_sql

    return mutual_information_sql("documents", "lang", "source")


def q_robust_outliers(spark, sf):
    """Median/MAD robust outlier audit (operators/profiling.
    robust_outliers) of event values per event type — the
    non-parametric anomaly flag; both engines share the quantile
    interpolation rule and every per-row op afterwards."""
    from ..operators.profiling import robust_outliers

    return robust_outliers(load(spark, sf, "events"), "event_type", "value")


def oracle_robust_outliers() -> str:
    from ..operators.profiling import robust_outliers_sql

    return robust_outliers_sql("events", "event_type", "value")


def q_ccnet_mix(spark, sf):
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al.
    2020): every document scored by the certified add-one bigram LM
    (operators/lm.py — the same train+score path lm_perplexity
    certifies), then split into per-language terciles by fluency.
    Ordering key is the exact integer avg logprob (half-away), ties
    broken by doc_id, so ntile is deterministic on both engines.
    Unscorable docs (< 2 tokens) are excluded. Production note: the
    per-lang ntile is an exact global sort per language — at corpus
    scale CCNet derives the two thresholds from a SAMPLE (the
    engine's quantile_sketch path); the exact form here is the
    oracle-checkable contract."""
    from ..functions.exact import half_away_div
    from ..operators.lm import score_perplexity, train_bigram_lm

    docs = load(spark, sf, "documents")
    bigrams, uni, vocab = train_bigram_lm(
        docs.where(F.col("lang") == "en"), "text", min_count=2
    )
    scored = (
        score_perplexity(docs, bigrams, uni, vocab)
        .where(F.col("n_bigrams") > 0)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            half_away_div("logprob_q", "n_bigrams")
            .cast("long")
            .alias("avg_q"),
        )
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("avg_q").desc(), "doc_id"
    )
    bucketed = scored.withColumn("b", F.ntile(3).over(w))
    return (
        bucketed.groupBy("lang", "b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("avg_q").alias("best_avg_q"),
            F.min("avg_q").alias("worst_avg_q"),
        )
        .select(
            "lang",
            F.when(F.col("b") == 1, F.lit("head"))
            .when(F.col("b") == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
            "n_docs",
            "best_avg_q",
            "worst_avg_q",
        )
        .orderBy("lang", "bucket")
    )


def oracle_ccnet_mix() -> str:
    lmp = oracle_lm_perplexity().strip()
    return f"""
WITH lmp AS ({lmp}),
scored AS (
  SELECT l.doc_id, d.lang,
         {half_away_div_sql('l.logprob_q', 'l.n_bigrams')}::BIGINT AS avg_q
  FROM lmp l JOIN documents d USING (doc_id)
  WHERE l.n_bigrams > 0
),
bucketed AS (
  SELECT lang, avg_q,
         ntile(3) OVER (PARTITION BY lang
                        ORDER BY avg_q DESC, doc_id) AS b
  FROM scored
)
SELECT lang,
       CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
              ELSE 'tail' END AS bucket,
       count(*)::BIGINT AS n_docs,
       max(avg_q) AS best_avg_q,
       min(avg_q) AS worst_avg_q
FROM bucketed GROUP BY lang, b ORDER BY lang, bucket
"""


def q_embedding_pca(spark, sf):
    """Centered top principal component by integer fixed-point power
    iteration (operators/pca.top_component) — the All-but-the-top
    isotropy correction for embedding spaces. Every cross-row sum is
    integer or DECIMAL(38,0); per-step renormalization by max|u|
    (exact on integers) instead of an L2 norm, so all three
    iterations replay bit-for-bit in SQL."""
    from ..operators.pca import top_component

    return top_component(load(spark, sf, "embeddings"), "vec_id", "embedding")


def oracle_embedding_pca() -> str:
    from ..operators.pca import top_component_sql

    return top_component_sql("embeddings", "vec_id", "embedding")


def oracle_triangle_count() -> str:
    from ..operators.graph import triangle_counts_sql

    dist = V.cosine_distance_sql("a.embedding", "b.embedding")
    cte = (
        "SELECT a.vec_id AS l_id, b.vec_id AS r_id "
        "FROM embeddings a JOIN embeddings b "
        f"ON a.vec_id < b.vec_id AND {dist} <= {TRIANGLE_EPS}"
    )
    return triangle_counts_sql(cte)




SKEW_AUDIT_PARTS = 32


def q_partition_skew_audit(spark, sf):
    """Shuffle-key skew audit (operators/layout.partition_skew_audit,
    r08): per-reducer load profile for two candidate shuffle keys of
    the event stream — user_id (high-cardinality, expected ~uniform)
    and event_type (5 values: at most 5 busy reducers of 32, the
    classic pre-shuffle pathology this audit exists to catch before
    a 100 TB job keys on it). Exact integer load factors; empty
    partitions materialized via a spine."""
    from ..operators.layout import partition_skew_audit

    ev = load(spark, sf, "events")
    return partition_skew_audit(
        ev, ["user_id", "event_type"], n_partitions=SKEW_AUDIT_PARTS
    )


def oracle_partition_skew_audit() -> str:
    p = SKEW_AUDIT_PARTS
    h = H.hash64_sql("k")
    return f"""
WITH keyed AS (
  SELECT 'user_id' AS key_name, user_id::VARCHAR AS k FROM events
  UNION ALL
  SELECT 'event_type', event_type FROM events
),
counts AS (
  SELECT key_name, {h} % {p} AS partition,
         count(*)::BIGINT AS n_rows,
         count(DISTINCT k)::BIGINT AS n_keys
  FROM keyed GROUP BY 1, 2
),
totals AS (
  SELECT key_name, sum(n_rows)::BIGINT AS total FROM counts GROUP BY 1
),
spine AS (
  SELECT kn.key_name, r.i AS partition
  FROM (SELECT DISTINCT key_name FROM keyed) kn
  CROSS JOIN range(0, {p}) r(i)
)
SELECT s.key_name, s.partition,
       coalesce(c.n_rows, 0)::BIGINT AS n_rows,
       coalesce(c.n_keys, 0)::BIGINT AS n_keys,
       (coalesce(c.n_rows, 0)::HUGEINT * {p} * 1000000
        // t.total::HUGEINT)::BIGINT AS load_ppm
FROM spine s
LEFT JOIN counts c ON s.key_name = c.key_name AND s.partition = c.partition
JOIN totals t ON s.key_name = t.key_name
ORDER BY s.key_name, s.partition
"""


def q_cohen_kappa(spark, sf):
    """Inter-rater agreement (operators/evaluation.cohen_kappa, r08)
    between two automated document-quality raters — a length rule
    (n_chars >= 400) and a whitespace-token rule (>= 60 spaces).
    Kappa reduces to exact int64 sufficient statistics
    (A·N − S) / (N² − S); single quantized division at the edge."""
    from ..operators.evaluation import cohen_kappa

    docs = load(spark, sf, "documents")
    r1 = (F.col("n_chars") >= 400).alias("ra")
    r2 = (
        F.length("text")
        - F.length(F.regexp_replace("text", " ", ""))
        >= 60
    ).alias("rb")
    return cohen_kappa(docs, r1, r2)


ORACLE_COHEN_KAPPA = """
WITH labeled AS (
  SELECT (n_chars >= 400)::VARCHAR AS ra,
         ((length(text) - length(replace(text, ' ', ''))) >= 60)
           ::VARCHAR AS rb
  FROM documents
),
head AS (
  SELECT count(*)::BIGINT AS n,
         sum(CASE WHEN ra = rb THEN 1 ELSE 0 END)::BIGINT AS agree
  FROM labeled
),
ma AS (SELECT ra AS k, count(*)::BIGINT AS ca FROM labeled GROUP BY 1),
mb AS (SELECT rb AS k, count(*)::BIGINT AS cb FROM labeled GROUP BY 1),
s AS (
  SELECT coalesce(sum(ca * cb), 0)::BIGINT AS s_cross
  FROM ma JOIN mb USING (k)
)
SELECT n, agree, s_cross,
       CASE WHEN n = 0 THEN NULL
            WHEN n * n = s_cross THEN 1000000
            ELSE floor((agree * n - s_cross)::DOUBLE
                       / (n * n - s_cross)::DOUBLE * 1000000
                       + 0.5)::BIGINT
       END AS kappa_q
FROM head CROSS JOIN s
"""


def q_heaps_law(spark, sf):
    """Heaps'-law vocabulary growth fit (text_analysis.
    heaps_vocab_growth, r08): log-log OLS of per-source vocabulary
    on per-source token count — the corpus-health companion to
    zipf_slope (β collapsing toward 0 flags boilerplate slices
    before a tokenizer/dedup run). Sufficient-statistics OLS with
    the one-quantized-ln-per-point discipline."""
    docs = widen(spark, load(spark, sf, "documents"))
    return TA.heaps_vocab_growth(docs)


def oracle_heaps_law() -> str:
    return TA.heaps_vocab_growth_sql("documents")


def q_ctfidf_labels(spark, sf):
    """c-TF-IDF cluster labeling (text_analysis.ctfidf_top_terms,
    r08, BERTopic-style): the top-5 characterizing terms per source
    slice — the "what is this cluster about?" label generation a
    news-clustering UI needs, scored tf·ln(N/df) with one quantized
    log per term. Bounded by groups × vocabulary after the first
    count pass."""
    docs = widen(spark, load(spark, sf, "documents"))
    return TA.ctfidf_top_terms(docs, "source", "text", k=5)


def oracle_ctfidf_labels() -> str:
    return TA.ctfidf_top_terms_sql("documents", "source", "text", k=5)
