"""Deterministic sampling / split operators for training-data
pipelines.

A 100 TB corpus can't be sampled with ``rand()`` if the sample must be
reproducible across runs, retries, and cluster sizes — Spark's
``sample()`` is seed-stable only for a fixed partitioning. These
operators are *content-addressed* instead: membership depends only on
an md5 hash of a stable key (``functions.hashing.hash64``), so the
same row lands in the same split everywhere, any engine can reproduce
the selection (the DuckDB oracles in plans/catalog.py do), and the
sample predicate is a plain filter that pushes down onto the scan —
no shuffle, no state.

The reference has no sampling stage (its ``COUNT``/``MAX_ARTICLES``
truncations, data/put_records.py:40 and embed_docs.py:67-68, are
head-limits, O7 in SURVEY §2.5); these are engine-breadth operators
for the training-data suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing as H

# One-in-a-million bucket resolution: fractions down to 1e-6 are
# representable exactly, and the bucket id fits comfortably in the
# 60-bit hash range without modulo bias mattering (2^60 / 1e6 buckets
# leaves bias < 1e-12).
SAMPLE_BUCKETS = 1_000_000


def _bucket(key: Column, seed: int) -> Column:
    return H.hash64(key.cast("string"), seed) % SAMPLE_BUCKETS


def bucket_sql(expr: str, seed: int) -> str:
    """DuckDB fragment computing the identical bucket id."""
    return f"({H.hash64_sql(f'({expr})::VARCHAR', seed)} % {SAMPLE_BUCKETS})"


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: int = 42,
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction`` of the
    bucket space. Deterministic, partition-independent, and a pure
    filter — Catalyst pushes it to the scan; zero shuffle."""
    keep = int(round(fraction * SAMPLE_BUCKETS))
    return df.where(_bucket(F.col(key_col), seed) < keep)


def train_test_split(
    df: DataFrame,
    key_col: str,
    test_fraction: float = 0.1,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Label every row 'train' or 'test' by hash bucket. Disjoint and
    exhaustive by construction; a row's split never changes when the
    data around it does (critical for incremental corpus builds)."""
    cut = int(round(test_fraction * SAMPLE_BUCKETS))
    b = _bucket(F.col(key_col), seed)
    return df.withColumn(
        split_col, F.when(b < cut, F.lit("test")).otherwise(F.lit("train"))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fraction: float,
    seed: int = 42,
) -> DataFrame:
    """Exact per-stratum fraction: rank rows inside each stratum by
    content hash (a deterministic, data-independent order) and keep
    ``ceil(n_g * fraction)`` of each group. One shuffle, hash-
    partitioned on the stratum key; strata are processed in parallel
    and a skewed stratum degrades only its own partition's sort."""
    b = _bucket(F.col(key_col), seed)
    w = Window.partitionBy(strata_col)
    wo = w.orderBy(b, F.col(key_col))
    return (
        df.withColumn("_rn", F.row_number().over(wo))
        .withColumn("_n", F.count("*").over(w))
        .where(F.col("_rn") <= F.ceil(F.col("_n") * F.lit(fraction)))
        .drop("_rn", "_n")
    )


def mix_datasets(
    sources: list[tuple[DataFrame, float]],
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Weighted dataset mixture: keep each source at its own sampling
    rate and union the results — the standard way training corpora are
    combined at fixed mixing ratios (rates > 1.0 mean oversampling by
    whole-copy repetition plus a fractional remainder sample).

    Content-addressed like everything above: membership is a pure
    pushed-down filter per source, the union is a no-shuffle
    UnionExec, and the same row survives at the same rate on any
    cluster layout. Repeated copies get a ``mix_epoch`` column so
    downstream shuffles can spread them.
    """
    parts: list[DataFrame] = []
    for i, (df, rate) in enumerate(sources):
        if rate < 0:
            raise ValueError(f"negative rate for source {i}")
        whole, frac = int(rate), rate - int(rate)
        for epoch in range(whole):
            parts.append(df.withColumn("mix_epoch", F.lit(epoch)))
        if frac > 0:
            parts.append(
                hash_sample(df, key_col, frac, seed=seed + i).withColumn(
                    "mix_epoch", F.lit(whole)
                )
            )
    if not parts:
        raise ValueError("no sources")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def leakage_safe_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    test_fraction: float = 0.1,
    seed: int = 42,
    split_col: str = "split",
    method: str = "ngram",
    threshold: float = 0.5,
    n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Train/test split that keeps every near-duplicate GROUP on one
    side. Splitting on the raw document key leaks near-copies of test
    documents into train — the classic contamination bug a dedup stage
    exists to prevent. Here dedup_components resolves the duplicate
    groups (transitive closure) and each member splits by the hash
    bucket of its CANONICAL id, so A~B~C always land together;
    singleton docs are their own canonical and split as before.
    Output: input columns + canonical_id + ``split_col``."""
    from .dedup import dedup_components

    comp = dedup_components(
        df, id_col=id_col, text_col=text_col, n=n, threshold=threshold,
        method=method, max_shingle_df=max_shingle_df,
    )
    cut = int(round(test_fraction * SAMPLE_BUCKETS))
    b = _bucket(F.col("canonical_id"), seed)
    return (
        df.join(comp.select(id_col, "canonical_id"), id_col)
        .withColumn(
            split_col,
            F.when(b < cut, F.lit("test")).otherwise(F.lit("train")),
        )
    )


def select_token_budget(
    df: DataFrame,
    budget: int,
    tokens_col: str,
    quality_col: str,
    id_col: str,
    shard_col: str | None = None,
) -> DataFrame:
    """Greedy quality-first corpus selection under a token budget:
    order documents by (quality desc, id) and keep the longest prefix
    whose cumulative token count stays within ``budget`` — the
    standard "best B tokens" curriculum/selection step of a training
    mix. With ``shard_col`` the budget applies PER SHARD (per
    language, per source, ...), and each shard's window sorts
    independently — parallel, no global ordering. Without it the
    selection is a single global window: correct, but sized for
    budget-selection over an already-aggregated candidate set, not
    for a raw 100 TB table (give it a shard key there).

    Output: the selected rows + cum_tokens (inclusive running total).
    Deterministic: ties on quality break on id.
    """
    parts = [shard_col] if shard_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy(F.desc(quality_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn(
            "cum_tokens", F.sum(F.col(tokens_col).cast("long")).over(w)
        )
        .where(F.col("cum_tokens") <= budget)
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    seed: int = 99,
) -> DataFrame:
    """Keep each row with probability ``weight_col`` (a [0,1] column —
    e.g. a quality score), DETERMINISTICALLY: the row's content-
    addressed hash bucket is compared against weight*SAMPLE_BUCKETS,
    so the same row always makes the same keep/drop decision
    regardless of partitioning, growth, or re-runs — the property
    every incremental corpus build needs from its downsampler (a
    re-run must not resample survivors). Integer-bucket-vs-double
    comparison, no RNG, no float accumulation.

    The quality-weighted downsampling step of a training-data
    pipeline: low-quality documents survive at reduced rates instead
    of a hard threshold cliff."""
    b = _bucket(F.col(key_col), seed)
    return df.where(b < F.col(weight_col) * SAMPLE_BUCKETS)


# --- DSIR-style importance resampling --------------------------------

DSIR_BUCKET_SEED = 77
DSIR_LOG_QUANT = 1_000_000  # log-ratio quantization: 1e-6 resolution


def dsir_importance_weights(
    source: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 1024,
    target_predicate: Column | None = None,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023):
    score every source document by how target-like its hashed-bigram
    distribution is — weight(doc) = Σ_bigrams log(p_target(bucket) /
    p_source(bucket)) with add-one smoothing over ``n_buckets`` hashed
    buckets. High-weight docs look like the target domain; resampling
    by weight shifts a raw crawl toward it.

    Scale/determinism design:
    * Bucket statistics are ONE shuffle each over integer counts; the
      resulting ``n_buckets``-row ratio table broadcasts to the
      source-side bigram instances (never the reverse).
    * The per-bucket log-ratio is quantized to a 1e-6-resolution
      integer ONCE (a single log call on a double built from exact
      integer counts — identical in both engines), so the per-document
      aggregation is an EXACT integer sum: unordered partial sums
      cannot drift, and the DuckDB oracle replays weights bit-for-bit.

    Returns (id_col, dsir_weight) with dsir_weight = quantized
    integer; divide by DSIR_LOG_QUANT for the conventional log score.
    """

    def bigram_instances(df: DataFrame, *cols: str) -> DataFrame:
        return df.select(
            *cols, H.tokens(F.col(text_col)).alias("_tok")
        ).select(
            *cols,
            F.explode(
                H.word_shingles(F.col("_tok"), 2)
            ).alias("bg"),
        ).withColumn(
            "bucket", H.hash64(F.col("bg"), DSIR_BUCKET_SEED) % n_buckets
        )

    # materialized once: the source bigram stream feeds BOTH the
    # bucket-count aggregate and the scoring join — tokenize+shingle
    # is the expensive expression tree (same pattern as
    # dedup.ngram_jaccard_pairs)
    if target_predicate is not None:
        # r11: when the caller declares target = source.where(pred)
        # (q_dsir_select: lang == 'en'), carry the predicate as a flag
        # through the ONE materialized bigram stream instead of
        # tokenizing the target subset a second time — identical
        # instances, one corpus pass fewer (guide §1.2).
        src = bigram_instances(
            source.withColumn("_is_tgt", target_predicate), id_col, "_is_tgt"
        ).localCheckpoint(eager=True)
        tgt = src.where(F.col("_is_tgt"))
    else:
        src = bigram_instances(source, id_col).localCheckpoint(eager=True)
        tgt = bigram_instances(target)
    src_cnt = src.groupBy("bucket").agg(F.count(F.lit(1)).alias("sc"))
    tgt_cnt = tgt.groupBy("bucket").agg(F.count(F.lit(1)).alias("tc"))
    src_tot = src_cnt.agg(F.sum("sc").alias("st"))
    tgt_tot = tgt_cnt.agg(F.sum("tc").alias("tt"))
    ratios = (
        src_cnt.join(tgt_cnt, "bucket", "full")
        .crossJoin(F.broadcast(src_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "bucket",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("tc"), F.lit(0)) + 1).cast(
                            "double"
                        )
                        / (F.col("tt") + n_buckets).cast("double")
                    )
                    / (
                        (F.coalesce(F.col("sc"), F.lit(0)) + 1).cast(
                            "double"
                        )
                        / (F.col("st") + n_buckets).cast("double")
                    )
                )
                * F.lit(DSIR_LOG_QUANT)
            )
            .cast("long")
            .alias("lr"),
        )
    )
    weights = (
        src.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(F.sum("lr").alias("dsir_weight"))
    )
    # every source doc gets a row: docs with < 2 tokens have no
    # bigrams and score NULL (the score_perplexity convention) rather
    # than silently vanishing from the output
    return source.select(id_col).join(weights, id_col, "left")


def temperature_mix(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    target_total: int,
    temperature: float = 2.0,
    seed: int = 5,
) -> DataFrame:
    """Temperature-based domain rebalancing (the multilingual-corpus
    sampling rule, e.g. mBERT/XLM-R): sample domain d at probability
    p_d ∝ (n_d/N)^(1/T), flattening the head and boosting the tail as
    T grows (T=1 = natural distribution, T→∞ = uniform). Per-domain
    sampling rate r_d = min(1, target_total·p_d / n_d), then
    membership is the usual content-addressed hash bucket — no RNG,
    reproducible under any partitioning, pushes down as a filter.

    The rate is quantized to 1e-6 (the bucket resolution) BEFORE the
    threshold compare, so the single pow() per domain — the only
    libm call — cannot flip membership across engines. Domain counts
    are one map-side-combined shuffle; the rate table (one row per
    domain) broadcasts.

    Returns the sampled rows plus (domain_rate) for inspection.
    """
    counts = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("_n_d")
    )
    total = counts.agg(F.sum("_n_d").alias("_n"))
    # one pow() per domain, quantized to a 1e-9 integer immediately:
    # the normalizer is then an EXACT integer sum (an unordered double
    # sum here could drift an ulp between engines and flip a
    # 6-decimal rate on a boundary), and p_q/z_q ratios are built
    # from identical integers everywhere
    p_q = (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "_p_q",
            F.round(
                F.pow(
                    F.col("_n_d").cast("double") / F.col("_n"),
                    1.0 / temperature,
                )
                * F.lit(1_000_000_000)
            ).cast("long"),
        )
    )
    z = p_q.agg(F.sum("_p_q").alias("_z_q"))
    rates = (
        p_q.crossJoin(F.broadcast(z))
        .select(
            domain_col,
            "_n_d",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(float(target_total))
                    * (
                        F.col("_p_q").cast("double")
                        / F.col("_z_q").cast("double")
                    )
                    / F.col("_n_d"),
                ),
                6,
            ).alias("domain_rate"),
        )
    )
    bucket = _bucket(F.col(key_col), seed)
    return (
        df.join(F.broadcast(rates), domain_col)
        .where(
            bucket
            < F.round(F.col("domain_rate") * SAMPLE_BUCKETS).cast(
                "long"
            )
        )
        .drop("_n_d")
    )


# --- duplicate-aware sampling weights (round 6) ----------------------


def dup_weighted_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    seed: int = 11,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """'Count every near-dup cluster once': resolve near-duplicate
    groups (the dedup_components transitive closure), weight each
    member 1/cluster_size, and keep rows whose content-addressed hash
    bucket falls under that weight — in expectation one survivor per
    cluster, without the bias of always keeping the canonical member
    (the standard corpus-mixing correction for duplicated documents;
    deterministic, partition-independent, re-runnable).

    weight_q is an exact integer (SAMPLE_BUCKETS div size) and the
    keep decision reuses the tested hash_sample bucket convention, so
    the whole output replays in SQL. Output: (id_col, canonical_id,
    cluster_size, weight_q, sampled)."""
    from .dedup import dedup_components

    comp = dedup_components(
        df,
        id_col=id_col,
        text_col=text_col,
        n=n,
        threshold=threshold,
        method="ngram",
        max_shingle_df=max_shingle_df,
    )
    sizes = comp.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        comp.join(sizes, "canonical_id")
        .select(
            F.col(id_col),
            "canonical_id",
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.expr(f"{SAMPLE_BUCKETS} DIV cluster_size").alias(
                "weight_q"
            ),
            (
                _bucket(F.col(id_col), seed)
                < F.expr(f"{SAMPLE_BUCKETS} DIV cluster_size")
            ).alias("sampled"),
        )
    )


# --- DoReMi-style domain reweighting ----------------------------------


def doremi_domain_weights(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    iters: int = 3,
    eta_q: int = 300_000,
    eps_q: int = 100_000,
) -> DataFrame:
    """Group-DRO multiplicative-weights domain reweighting in the
    DoReMi shape (Xie et al. 2023, "DoReMi: Optimizing Data Mixtures
    Speeds Up Language Model Pretraining"): domains whose proxy loss
    exceeds the reference loss get upweighted multiplicatively, then
    the mixture is smoothed toward uniform.

    Proxy loss here is a pure data statistic (no model in the engine):
    per-doc chars-per-token at 1e6 fixed point — the compression-rate
    family every curation stack already computes. Reference loss is
    the corpus-wide mean. The multiplicative update uses the linear
    MW rule w·(1 + η·excess) (exp-free — exp(double) is the one
    transcendental whose last ulp differs between Java's Math.exp and
    libm, so the oracle could never hash-match), with every step in
    exact integer arithmetic:

        excess_d = half_away(1e6·(loss_d - base) / base)
        f_d      = max(1, 1e6 + half_away(η_q·excess_d / 1e6))   (fixed)
        a_0      = 1e6;  a_{t+1} = normalize(half_away(a_t·f_d / 1e6))

    ``iters`` rounds, then ε-uniform smoothing
    w = (1-ε)·a + ε/k. All sums are int64 over ≤|domains| rows.

    Shape: one pass over the corpus for per-doc losses, one groupBy
    on the domain, then ≤ 4 one-row broadcast cross-joins over the
    DOMAIN table (|domains| rows — kilobytes at any corpus size; the
    corpus itself is never touched again). At 100 TB the cost is the
    single scan, same as any quality-signal pass.

    Output: (domain, n_docs, loss_q, excess_q, w_q, w_smooth_q),
    weights at 1e6 scale summing to ~1e6."""
    from ..functions.exact import half_away_div

    per_doc = (
        df.select(
            F.col(domain_col).alias("domain"),
            F.length(text_col).cast("long").alias("n_chars"),
            F.size(H.tokens(F.col(text_col))).cast("long").alias("n_tok"),
        )
        .where(F.col("n_tok") > 0)
        .select(
            "domain",
            half_away_div("1000000 * n_chars", "n_tok")
            .cast("long")
            .alias("ld"),
        )
    )
    dom = per_doc.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("ld").alias("_s")
    )
    base = per_doc.agg(
        F.sum("ld").alias("_ts"), F.count(F.lit(1)).alias("_tn")
    ).select(half_away_div("_ts", "_tn").cast("long").alias("base_q"))
    d = (
        dom.crossJoin(F.broadcast(base))
        .withColumn(
            "loss_q", half_away_div("_s", "n_docs").cast("long")
        )
        .withColumn(
            "excess_q",
            half_away_div("1000000 * (loss_q - base_q)", "base_q").cast(
                "long"
            ),
        )
        .withColumn(
            "f_q",
            F.greatest(
                F.lit(1).cast("long"),
                (
                    F.lit(1_000_000)
                    + half_away_div(f"{eta_q} * excess_q", "1000000")
                ).cast("long"),
            ),
        )
        .withColumn("a_q", F.lit(1_000_000).cast("long"))
        .select("domain", "n_docs", "loss_q", "excess_q", "f_q", "a_q")
        # the domain table is tiny; cut the lineage so the per-
        # iteration total doesn't recompute the corpus scan 2^iters
        # times
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        d = d.withColumn(
            "_raw", half_away_div("a_q * f_q", "1000000").cast("long")
        )
        tot = d.agg(F.sum("_raw").cast("long").alias("_tot"))
        d = (
            d.crossJoin(F.broadcast(tot))
            .withColumn(
                "a_q", half_away_div("_raw * 1000000", "_tot").cast("long")
            )
            .drop("_raw", "_tot")
        )
    return (
        d.crossJoin(
            F.broadcast(d.agg(F.count(F.lit(1)).alias("_k")))
        )
        .select(
            "domain",
            "n_docs",
            "loss_q",
            "excess_q",
            F.col("a_q").alias("w_q"),
            (
                half_away_div(f"(1000000 - {eps_q}) * a_q", "1000000")
                + half_away_div(f"{eps_q}", "_k")
            )
            .cast("long")
            .alias("w_smooth_q"),
        )
        .orderBy("domain")
    )


def doremi_domain_weights_sql(
    table: str,
    domain_col: str = "source",
    text_expr: str = "text",
    iters: int = 3,
    eta_q: int = 300_000,
    eps_q: int = 100_000,
) -> str:
    """DuckDB twin of doremi_domain_weights (iterations unrolled as
    CTEs, identical integer arithmetic)."""
    from ..functions.exact import half_away_div_sql
    from ..functions.hashing import tokens_sql

    had = half_away_div_sql
    ctes = [
        f"""pd AS (
  SELECT {domain_col} AS domain,
         {had('1000000 * n_chars', 'n_tok')}::BIGINT AS ld
  FROM (SELECT {domain_col}, length({text_expr})::BIGINT AS n_chars,
               len({tokens_sql(text_expr)})::BIGINT AS n_tok
        FROM {table})
  WHERE n_tok > 0
)""",
        f"""dom AS (
  SELECT domain, count(*)::BIGINT AS n_docs,
         CAST(sum(ld) AS BIGINT) AS s
  FROM pd GROUP BY domain
)""",
        f"""base AS (
  SELECT {had('CAST(sum(ld) AS BIGINT)', 'count(*)::BIGINT')}::BIGINT
         AS base_q
  FROM pd
)""",
        f"""s0 AS (
  SELECT domain, n_docs,
         {had('s', 'n_docs')}::BIGINT AS loss_q,
         {had(f"1000000 * ({had('s', 'n_docs')} - base_q)", 'base_q')}::BIGINT
           AS excess_q,
         greatest(1, 1000000 + {had(f'{eta_q} * ' + had(f"1000000 * ({had('s', 'n_docs')} - base_q)", 'base_q'), '1000000')})::BIGINT AS f_q,
         1000000::BIGINT AS a_q
  FROM dom, base
)""",
    ]
    prev = "s0"
    for t in range(1, iters + 1):
        ctes.append(
            f"""r{t} AS (
  SELECT domain, n_docs, loss_q, excess_q, f_q,
         {had('a_q * f_q', '1000000')}::BIGINT AS raw
  FROM {prev}
)"""
        )
        ctes.append(
            f"""s{t} AS (
  SELECT domain, n_docs, loss_q, excess_q, f_q,
         {had('raw * 1000000', 'tot')}::BIGINT AS a_q
  FROM r{t}, (SELECT CAST(sum(raw) AS BIGINT) AS tot FROM r{t}) n{t}
)"""
        )
        prev = f"s{t}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT domain, n_docs, loss_q, excess_q, a_q AS w_q,
       ({had(f'(1000000 - {eps_q}) * a_q', '1000000')}
        + {had(f'{eps_q}', 'k')})::BIGINT AS w_smooth_q
FROM {prev}, (SELECT count(*)::BIGINT AS k FROM {prev}) kk
ORDER BY domain
"""
    )


def stratified_kfold(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    k: int = 5,
    seed: int = 0x5F0,
) -> DataFrame:
    """Deterministic stratified k-fold assignment — the eval-split
    primitive [[train_test_split]] doesn't give: every stratum
    (language, source, quality tier) is spread across all k folds
    with sizes differing by at most 1, so per-fold metrics aren't
    confounded by stratum mix (sklearn StratifiedKFold semantics,
    hash-ordered instead of input-ordered so it is reproducible
    under any partitioning).

        fold(row) = (row_number per stratum ordered by
                     (hash64(id), id) − 1) mod k

    The (hash, id) compound order makes the assignment a pure
    function of the data — no RNG, no scan order. The per-stratum
    row_number window partitions by stratum; at 100 TB a single
    giant stratum serializes its own window, which is the standard
    two-phase-prefix refactor if it ever dominates (documented — the
    usual strata, language × source, are far below that).

    Returns df plus a ``fold`` column."""
    w = Window.partitionBy(stratum_col).orderBy(
        H.hash64(F.col(id_col).cast("string"), seed), F.col(id_col)
    )
    return df.withColumn(
        "fold", ((F.row_number().over(w) - F.lit(1)) % F.lit(k)).cast("long")
    )


def stratified_kfold_summary(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    k: int = 5,
    seed: int = 0x5F0,
) -> DataFrame:
    """Per-(stratum, fold) audit of [[stratified_kfold]]: member
    count plus an order-free id-hash checksum, so a hash-green
    oracle certifies the exact ASSIGNMENT, not just the fold sizes.
    Output: (stratum, fold, n, id_checksum)."""
    folded = stratified_kfold(df, id_col, stratum_col, k, seed)
    # 60-bit hashes sum past int64 within ~8 rows: accumulate through
    # DECIMAL(38,0)/HUGEINT, then fold back into int64 by modulo
    return (
        folded.groupBy(F.col(stratum_col).alias("stratum"), "fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (
                F.sum(
                    H.hash64(F.col(id_col).cast("string"), seed + 1).cast(
                        "decimal(38,0)"
                    )
                )
                % F.lit(2**61).cast("decimal(38,0)")
            ).cast("long").alias("id_checksum"),
        )
        .orderBy("stratum", "fold")
    )


def stratified_kfold_summary_sql(
    table: str,
    id_col: str,
    stratum_col: str,
    k: int = 5,
    seed: int = 0x5F0,
) -> str:
    """DuckDB twin of stratified_kfold_summary."""
    h_order = H.hash64_sql(f"({id_col})::VARCHAR", seed)
    h_sum = H.hash64_sql(f"({id_col})::VARCHAR", seed + 1)
    return f"""
WITH folded AS (
  SELECT {stratum_col} AS stratum, {id_col} AS id,
         ((row_number() OVER (PARTITION BY {stratum_col}
                              ORDER BY {h_order}, {id_col}) - 1)
          % {k})::BIGINT AS fold,
         {h_sum} AS h2
  FROM {table}
)
SELECT stratum, fold, count(*)::BIGINT AS n,
       (sum(h2::HUGEINT) % 2305843009213693952)::BIGINT AS id_checksum
FROM folded GROUP BY stratum, fold ORDER BY stratum, fold
"""


def kcenter_coreset(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "DataFrame":
    """Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    traversal; Sener & Savarese 2018 for the training-data use): pick
    the point farthest from the chosen set, k times — the classic
    diversity-maximizing data-selection primitive with the 2-approx
    coverage guarantee.

    Iterative by nature: k-1 driver-coordinated rounds, each ONE
    top-1 TakeOrdered job (no global sort — Spark's limit(1) with
    ordering is a per-partition top-1 + driver merge) over a plan
    that accumulates `least(mind, dist(vec, c_r))` chains; exactly
    one center row (id + vector) is collected per round, so driver
    traffic is k rows total. Determinism: the seed is the MINIMUM id,
    every distance is the engine-pinned cosine expression, and the
    argmax tie-breaks by ascending id — the DuckDB oracle replays
    the identical unrolled recurrence, so selection parity is
    bit-for-bit. Chosen points stay in the frame (their min-dist
    collapses to ~0 and they are never re-picked while any point has
    positive distance); both engines share that behavior exactly.

    Output: one row per selected center, (sel_round, id, radius_q)
    where radius_q is the quantized farthest distance AT selection
    (the decreasing k-center coverage curve; NULL for the seed)."""
    import math

    from ..functions import vectors as V

    rows = []
    seed = (
        df.select(F.min(F.col(id_col)).alias("i")).first()["i"]
    )
    seed_vec = (
        df.where(F.col(id_col) == seed).select(vec_col).first()[0]
    )
    rows.append((0, seed, None))
    cur = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn(
        "mind",
        V.cosine_distance(
            F.col("v"), F.array(*[F.lit(float(x)) for x in seed_vec])
        ),
    )
    for r in range(1, k):
        far = cur.orderBy(
            F.col("mind").desc(), F.col("id").asc()
        ).limit(1).collect()[0]
        rows.append(
            (r, far["id"], int(math.floor(far["mind"] * 1e6 + 0.5)))
        )
        cvec = F.array(*[F.lit(float(x)) for x in far["v"]])
        cur = cur.withColumn(
            "mind", F.least(F.col("mind"), V.cosine_distance(F.col("v"), cvec))
        )
        # lineage cut every 16 rounds (the pagerank discipline): the
        # `least(...)` chain otherwise grows one nested expression
        # per center, and at k≈100 each round re-analyzes a
        # 100-deep plan (r09 verdict item 2). localCheckpoint also
        # caps recompute: each top-1 job evaluates at most 16
        # distance terms past the last materialization.
        if r % 16 == 0 and r < k - 1:
            cur = cur.localCheckpoint(eager=True)
    spark = df.sparkSession
    id_type = df.schema[id_col].dataType.simpleString()
    out = spark.createDataFrame(
        rows, f"sel_round long, {id_col} {id_type}, radius_q long"
    )
    return out.orderBy("sel_round")


def kcenter_coreset_sql(
    table: str = "embeddings",
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of kcenter_coreset: the same greedy recurrence
    unrolled into k CTE pairs (c_r = top-1 by (mind DESC, id ASC),
    m_r = running least of distances). Every CTE is MATERIALIZED:
    DuckDB inlines plain CTEs per reference, and m_r references
    m_{r-1} twice, so without materialization the expansion doubles
    per round — 2^k parquet scans, which exhausts the fd limit
    around k=16 (the oracle-side twin of the 2^(2*iters) pagerank
    re-execution trap the Spark path cuts with localCheckpoint)."""
    from ..functions import vectors as V

    d0 = V.cosine_distance_sql("e." + vec_col, "c." + vec_col)
    parts = [
        f"c0 AS MATERIALIZED (SELECT {id_col}, {vec_col} FROM {table} "
        f"WHERE {id_col} = (SELECT min({id_col}) FROM {table}))",
        f"m0 AS MATERIALIZED (SELECT e.{id_col} AS id, e.{vec_col} AS v, "
        f"{d0} AS mind FROM {table} e CROSS JOIN "
        f"(SELECT {vec_col} FROM c0) c)",
    ]
    for r in range(1, k):
        dr = V.cosine_distance_sql("m.v", "c.cv")
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT id, v, mind FROM m{r - 1} "
            f"ORDER BY mind DESC, id ASC LIMIT 1)"
        )
        if r < k - 1:
            parts.append(
                f"m{r} AS MATERIALIZED "
                f"(SELECT m.id, m.v, least(m.mind, {dr}) AS mind "
                f"FROM m{r - 1} m CROSS JOIN "
                f"(SELECT v AS cv FROM c{r}) c)"
            )
    selects = [
        f"SELECT 0::BIGINT AS sel_round, "
        f"(SELECT {id_col} FROM c0)::BIGINT AS {id_col}, "
        f"NULL::BIGINT AS radius_q"
    ] + [
        f"SELECT {r}::BIGINT, (SELECT id FROM c{r})::BIGINT, "
        f"(SELECT floor(mind * 1e6 + 0.5) FROM c{r})::BIGINT"
        for r in range(1, k)
    ]
    body = ",\n".join(parts)
    union = "\nUNION ALL\n".join(selects)
    return f"WITH {body}\n{union}\nORDER BY sel_round"
