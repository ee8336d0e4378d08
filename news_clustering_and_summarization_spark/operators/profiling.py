"""Dataset profiling: per-column statistics in ONE scan.

The ANALYZE-style pass every corpus build runs before training: row
counts, null fractions, distinct counts, min/max — computed for all
requested columns in a single aggregation (one job, one scan; the
per-column results are then melted to long form with a zero-shuffle
Expand). No reference analogue (its only data-quality surface is the
duplicate-key guards, SURVEY §2.2 P13) — engine extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled column:
    (column, n, n_null, n_distinct, min_value, max_value) — min/max
    rendered as strings so heterogeneous column types coexist."""
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__n"),
            F.sum(
                F.when(F.col(c).isNull(), 1).otherwise(0)
            ).alias(f"{c}__n_null"),
            F.countDistinct(c).alias(f"{c}__n_distinct"),
            # min/max on the NATIVE type, cast the result — casting
            # first would turn numeric order into lexicographic order
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__n_null").alias("n_null"),
            F.col(f"{c}__n_distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def sketch_profile(
    df: DataFrame,
    group_col: str,
    key_col: str,
    rsd: float = 0.05,
    tolerance_mult: float = 5.0,
) -> DataFrame:
    """Per-group cardinality profile that CERTIFIES its own sketch:
    computes both ``approx_count_distinct`` (HyperLogLog++, the only
    thing you'd run at 100 TB) and the exact distinct count, and
    asserts inside the plan that the sketch landed within
    ``tolerance_mult * rsd`` relative error. Output columns are the
    exact values plus ``sketch_ok`` — so a plain SQL oracle can
    hash-verify the row content while the assert certifies the
    HLL path executed and met its contract.

    At real scale you'd drop the exact leg and keep only the sketch;
    this operator exists to pin the sketch's error envelope in CI
    before you trust it alone.
    """
    agg = df.groupBy(group_col).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(key_col).alias("n_distinct"),
        F.approx_count_distinct(key_col, rsd).alias("_n_approx"),
    )
    rel_err = F.abs(F.col("_n_approx") - F.col("n_distinct")) / F.greatest(
        F.col("n_distinct"), F.lit(1)
    ).cast("double")
    return agg.select(
        group_col,
        "n_rows",
        "n_distinct",
        F.assert_true(
            rel_err <= F.lit(tolerance_mult * rsd),
            F.concat(
                F.lit(f"HLL sketch outside {tolerance_mult}x rsd: "),
                F.col("_n_approx").cast("string"),
                F.lit(" vs exact "),
                F.col("n_distinct").cast("string"),
            ),
        ).isNull().alias("sketch_ok"),
    )


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Privacy governance check for training-data release: group rows
    by their quasi-identifier combination and flag equivalence classes
    smaller than ``k`` — the rows whose attribute combination could
    re-identify an individual (Sweeney 2002 k-anonymity). Training
    corpora assembled from user data run this before export; groups
    failing the floor get suppressed or generalized upstream.

    One groupBy shuffle on the quasi-identifier tuple (map-side
    combined counts); output is one row per equivalence class:
    (quasi_cols..., class_size, at_risk). NULL attribute values form
    their own class (SQL GROUP BY semantics, identical in the
    oracle).
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .withColumn("at_risk", F.col("class_size") < F.lit(k))
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the
    companion gate to [[k_anonymity_audit]]: a class can satisfy
    k-anonymity yet leak the sensitive attribute outright when every
    member shares one value. Per quasi-identifier class this reports
    distinct-l (how many distinct sensitive values) and ENTROPY
    l-diversity (Shannon entropy of the sensitive distribution must
    reach ln l), flagging classes below the distinct floor.

    Shape: ONE (quasi, sensitive)-keyed groupBy pre-collapse — the
    corpus-scale pass — then a class-keyed groupBy over the
    (classes × values) table; bounded by the attribute domains, not
    rows. Entropy terms use the established runtime-ln per-term
    quantization (×1e9, half-up: floor(x + 0.5), ties toward +inf)
    over exact integer count ratios,
    so the sum is order-free and engine-identical.

    Output: (quasi_cols..., class_size, distinct_sensitive,
    entropy_q, at_risk)."""
    vc = (
        df.groupBy(*quasi_cols, F.col(sensitive_col).alias("_sv"))
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    tot = F.sum("_c").over(
        Window.partitionBy(*quasi_cols)
    )
    terms = vc.withColumn("_n", tot).select(
        *quasi_cols,
        "_c",
        "_n",
        # -(c/n)·ln(c/n) quantized: ln on the exact integer ratio
        (
            -F.floor(
                F.log(F.col("_c").cast("double") / F.col("_n").cast("double"))
                * F.lit(1e9)
                + F.lit(0.5)
            ).cast("long")
            * F.col("_c")
        ).alias("_t"),
    )
    return (
        terms.groupBy(*quasi_cols)
        .agg(
            F.max("_n").alias("class_size"),
            F.count(F.lit(1)).cast("long").alias("distinct_sensitive"),
            F.sum("_t").alias("_sumt"),
        )
        # Σ terms DIV n: exact integer division (all terms >= 0), the
        # dialect-split op — Spark DIV, DuckDB // (layout pattern)
        .withColumn(
            "entropy_q", F.expr("_sumt DIV class_size").cast("long")
        )
        .withColumn("at_risk", F.col("distinct_sensitive") < F.lit(l))
        .drop("_sumt")
    )


def l_diversity_audit_sql(
    table: str,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int,
) -> str:
    """DuckDB twin of l_diversity_audit."""
    q = ", ".join(quasi_cols)
    return f"""
WITH vc AS MATERIALIZED (
  SELECT {q}, {sensitive_col} AS sv, count(*)::BIGINT AS c
  FROM {table} GROUP BY ALL
),
wt AS (
  SELECT {q}, c,
         sum(c) OVER (PARTITION BY {q}) AS n
  FROM vc
),
terms AS (
  SELECT {q}, c, n,
         -floor(ln(c::DOUBLE / n::DOUBLE) * 1e9 + 0.5)::BIGINT * c AS t
  FROM wt
)
SELECT {q},
       max(n)::BIGINT AS class_size,
       count(*)::BIGINT AS distinct_sensitive,
       (sum(t) // max(n))::BIGINT AS entropy_q,
       count(*) < {l} AS at_risk
FROM terms GROUP BY {q}
"""


# --- column-dependency profiling --------------------------------------

MI_LOG_QUANT = 10**9


def mutual_information(
    df: DataFrame, col_x: str, col_y: str
) -> DataFrame:
    """Mutual information I(X;Y) between two categorical columns —
    the column-dependency audit a profiler runs before choosing
    partition keys or stratification variables (high MI between a
    proposed partition column and the query filter column predicts
    partition-pruning payoff; MI ~ 0 means the split is useless).

    I(X;Y) = Σ_xy p_xy · ln(p_xy / (p_x·p_y)). Each contingency cell
    contributes the INTEGER term n_xy · round(ln(n_xy·N / (n_x·n_y))
    · 1e9) — counts are integers, the ratio is ONE double division of
    exact integer products, so the total is an order-free integer sum
    (the char_entropy discipline, operators/text_analysis.py).

    Shape: one (x, y) groupBy for the contingency table (map-side
    combined), two broadcast margin joins, a ONE-ROW total crossJoin;
    the exchange carries |X|·|Y| cells, never rows.

    Output: a single row (n, cells, mi_q, mi_nats)."""
    cells = df.groupBy(
        F.col(col_x).alias("x"), F.col(col_y).alias("y")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
    mx = cells.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
    my = cells.groupBy("y").agg(F.sum("n_xy").alias("n_y"))
    tot = cells.agg(F.sum("n_xy").alias("n"))
    term = (
        F.col("n_xy")
        * F.round(
            F.log(
                (F.col("n_xy") * F.col("n")).cast("double")
                / (F.col("n_x") * F.col("n_y")).cast("double")
            )
            * F.lit(float(MI_LOG_QUANT))
        ).cast("long")
    )
    return (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.max("n").alias("n"),
            F.count(F.lit(1)).cast("long").alias("cells"),
            F.sum(term).cast("long").alias("mi_q"),
        )
        .select(
            "n",
            "cells",
            "mi_q",
            F.expr(
                f"round(mi_q / CAST(n AS DOUBLE) / {float(MI_LOG_QUANT)!r}, 6)"
            ).alias("mi_nats"),
        )
    )


def mutual_information_sql(table: str, col_x: str, col_y: str) -> str:
    """DuckDB twin of mutual_information."""
    return f"""
WITH cells AS (
  SELECT {col_x} AS x, {col_y} AS y, count(*)::BIGINT AS n_xy
  FROM {table} GROUP BY 1, 2
),
mx AS (SELECT x, CAST(sum(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY x),
my AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY y),
tot AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n FROM cells)
SELECT max(n)::BIGINT AS n, count(*)::BIGINT AS cells,
       CAST(sum(n_xy * CAST(round(ln(
         CAST(n_xy * n AS DOUBLE) / CAST(n_x * n_y AS DOUBLE)
       ) * {float(MI_LOG_QUANT)!r}) AS BIGINT)) AS BIGINT) AS mi_q,
       round(CAST(sum(n_xy * CAST(round(ln(
         CAST(n_xy * n AS DOUBLE) / CAST(n_x * n_y AS DOUBLE)
       ) * {float(MI_LOG_QUANT)!r}) AS BIGINT)) AS BIGINT)
         / CAST(max(n) AS DOUBLE) / {float(MI_LOG_QUANT)!r}, 6) AS mi_nats
FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
"""


def robust_outliers(
    df: DataFrame, group_col: str, value_col: str, k: float = 3.0
) -> DataFrame:
    """Median/MAD robust outlier audit per group — the
    non-parametric counterpart of z-score anomaly flags (median and
    MAD are insensitive to the outliers being hunted, unlike
    mean/stddev). A value is flagged when |v - median| > k·MAD.

    Exactness: Spark ``percentile`` and DuckDB ``quantile_cont``
    share the (n-1)·p interpolation rule (certified by
    group_quantiles); every per-row op afterwards (subtract, abs,
    one multiply, compare) is the same IEEE op on the same doubles
    in both engines, so the flag can never diverge. Two passes over
    the grouped values (median, then MAD of deviations) + one count
    — all shuffles key on the group.

    Output: (group, n, med, mad, n_outliers, outlier_rate_q)."""
    from ..functions.exact import half_away_div

    g = F.col(group_col)
    med = df.groupBy(g.alias("grp")).agg(
        F.expr(f"percentile(CAST({value_col} AS DOUBLE), 0.5D)").alias(
            "med"
        )
    )
    dev = df.select(
        g.alias("grp"), F.col(value_col).cast("double").alias("v")
    ).join(F.broadcast(med), "grp")
    mad = dev.groupBy("grp").agg(
        F.expr("percentile(abs(v - med), 0.5D)").alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "grp")
    return (
        flagged.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(
                F.when(
                    F.abs(F.col("v") - F.col("med"))
                    > F.lit(k) * F.col("mad"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n",
            "med",
            "mad",
            "n_outliers",
            half_away_div("1000000 * n_outliers", "n")
            .cast("long")
            .alias("outlier_rate_q"),
        )
        .orderBy(group_col)
    )


def robust_outliers_sql(
    table: str, group_col: str, value_col: str, k: float = 3.0
) -> str:
    """DuckDB twin of robust_outliers."""
    from ..functions.exact import half_away_div_sql

    return f"""
WITH med AS (
  SELECT {group_col} AS grp,
         quantile_cont(CAST({value_col} AS DOUBLE), 0.5) AS med
  FROM {table} GROUP BY 1
),
dev AS (
  SELECT t.{group_col} AS grp, CAST(t.{value_col} AS DOUBLE) AS v, m.med
  FROM {table} t JOIN med m ON t.{group_col} = m.grp
),
mad AS (
  SELECT grp, quantile_cont(abs(v - med), 0.5) AS mad
  FROM dev GROUP BY grp
)
SELECT d.grp AS {group_col}, count(*)::BIGINT AS n,
       round(max(d.med), 6) AS med,
       round(max(m.mad), 6) AS mad,
       CAST(sum(CASE WHEN abs(d.v - d.med) > {k} * m.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       {half_away_div_sql(
           "1000000 * CAST(sum(CASE WHEN abs(d.v - d.med) > "
           + str(k)
           + " * m.mad THEN 1 ELSE 0 END) AS BIGINT)",
           "count(*)",
       )}::BIGINT AS outlier_rate_q
FROM dev d JOIN mad m USING (grp)
GROUP BY d.grp ORDER BY {group_col}
"""


CORR_VARS = [
    ("qty", "l_quantity", 1),
    ("price_c", "l_extendedprice", 100),
    ("disc_c", "l_discount", 100),
    ("tax_c", "l_tax", 100),
]


def corr_matrix(df: DataFrame) -> DataFrame:
    """Pairwise Pearson correlation matrix over lineitem's numeric
    measures — the standard profiling pass before any feature
    selection (collinear measures, pricing relationships).

    ONE full-scan aggregation produces every sufficient statistic
    (n plus Σx, Σx², Σx·y for all pairs — map-side combinable,
    order-free); the 6 upper-triangle correlations are then built
    from that single row by an unpivot, so the matrix costs exactly
    one shuffle-to-one-row regardless of scale.

    Inputs are quantized to exact integer units (cents) first;
    cross-products are accumulated in DECIMAL(38,0) — at 100 TB the
    cent-squared sums pass int64 (~9.2e18) long before the row
    count does. The only irrational op is IEEE-correctly-rounded
    sqrt; r quantizes half-up at 1e6 identically cross-engine.

    Output: (var_a, var_b, n, r_q) for the 6 unordered pairs."""
    cols = {}
    for name, src, mult in CORR_VARS:
        c = F.col(src)
        if mult != 1:
            c = F.floor(c * F.lit(float(mult)) + F.lit(0.5))
        cols[name] = c.cast("long")
    base = df.select(*[c.alias(n) for n, c in cols.items()])
    names = [n for n, _, _ in CORR_VARS]
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i, a in enumerate(names):
        aggs.append(
            F.sum(F.col(a).cast("decimal(38,0)")).alias(f"s_{a}")
        )
        for b in names[i:]:
            aggs.append(
                F.sum(
                    F.col(a).cast("decimal(19,0)")
                    * F.col(b).cast("decimal(19,0)")
                ).alias(f"s_{a}_{b}")
            )
    stats = base.agg(*aggs)
    pair_rows = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            num = (
                F.col("n").cast("decimal(38,0)") * F.col(f"s_{a}_{b}")
                - F.col(f"s_{a}") * F.col(f"s_{b}")
            ).cast("double")
            va = (
                F.col("n").cast("decimal(38,0)") * F.col(f"s_{a}_{a}")
                - F.col(f"s_{a}") * F.col(f"s_{a}")
            ).cast("double")
            vb = (
                F.col("n").cast("decimal(38,0)") * F.col(f"s_{b}_{b}")
                - F.col(f"s_{b}") * F.col(f"s_{b}")
            ).cast("double")
            r = num / (F.sqrt(va) * F.sqrt(vb))
            pair_rows.append(
                F.struct(
                    F.lit(a).alias("var_a"),
                    F.lit(b).alias("var_b"),
                    F.col("n").alias("n"),
                    F.floor(r * F.lit(1e6) + F.lit(0.5))
                    .cast("long")
                    .alias("r_q"),
                )
            )
    return (
        stats.select(
            F.explode(F.array(*pair_rows)).alias("p")
        )
        .select("p.var_a", "p.var_b", "p.n", "p.r_q")
        .orderBy("var_a", "var_b")
    )


def corr_matrix_sql(table: str = "lineitem") -> str:
    """DuckDB twin of corr_matrix (HUGEINT plays DECIMAL(38,0))."""
    names = [n for n, _, _ in CORR_VARS]
    sel = []
    for name, src, mult in CORR_VARS:
        if mult == 1:
            sel.append(f"{src}::BIGINT AS {name}")
        else:
            sel.append(
                f"floor({src} * {float(mult)} + 0.5)::BIGINT AS {name}"
            )
    aggs = ["count(*)::BIGINT AS n"]
    for i, a in enumerate(names):
        aggs.append(f"sum({a}::HUGEINT) AS s_{a}")
        for b in names[i:]:
            aggs.append(f"sum({a}::HUGEINT * {b}::HUGEINT) AS s_{a}_{b}")
    pairs = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            pairs.append(
                f"""SELECT '{a}' AS var_a, '{b}' AS var_b, n,
floor((n::HUGEINT * s_{a}_{b} - s_{a} * s_{b})::DOUBLE
      / (sqrt((n::HUGEINT * s_{a}_{a} - s_{a} * s_{a})::DOUBLE)
         * sqrt((n::HUGEINT * s_{b}_{b} - s_{b} * s_{b})::DOUBLE))
      * 1e6 + 0.5)::BIGINT AS r_q
FROM stats"""
            )
    union = "\nUNION ALL\n".join(pairs)
    return f"""
WITH base AS (SELECT {", ".join(sel)} FROM {table}),
stats AS MATERIALIZED (SELECT {", ".join(aggs)} FROM base)
SELECT * FROM ({union}) ORDER BY var_a, var_b
"""


# First-significant-digit probabilities log10(1 + 1/d), embedded as
# the SAME literals in both engines (no runtime log -> no libm
# divergence surface at all)
BENFORD_P = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def benford_audit(
    df: DataFrame,
    col: str,
) -> DataFrame:
    """Benford's-law first-digit audit — the classic fabricated-data
    / synthetic-leak detector for naturally-occurring positive
    amounts (Benford 1938; Nigrini's forensic-accounting usage):
    compare the observed first-significant-digit distribution to
    p(d) = log10(1 + 1/d) and report each digit's chi-square term.

    One groupBy(digit) over a zero-shuffle projection; the total
    row count joins back as a broadcast 1-row aggregate. The first
    digit comes from the decimal STRING rendering of the integer
    cents (identical across engines), never from float log10.
    Expected probabilities are shared compile-time literals, so the
    chi-square terms are a fixed IEEE dag — bit-identical.

    Output per digit 1..9: (digit, n_obs, n_total, exp_q, chi2_q)
    with exp_q = round(n_total·p_d·1e6)... exp_q in millionths of a
    row; chi2_q = round((obs - n·p)²/(n·p) · 1e6)."""
    cents = F.floor(F.col(col) * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    digit = F.substring(cents.cast("string"), 1, 1).cast("long")
    obs = (
        df.where(F.col(col) > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    total = obs.agg(F.sum("n_obs").cast("long").alias("n_total"))
    rows = obs.crossJoin(F.broadcast(total))
    p = F.element_at(
        F.create_map(
            *[
                x
                for d, pv in BENFORD_P.items()
                for x in (F.lit(d), F.lit(pv))
            ]
        ),
        F.col("digit"),
    )
    expected = F.col("n_total").cast("double") * p
    # squared via plain multiply, not pow(): libm pow is not required
    # to be correctly rounded, x*x is a single IEEE multiply
    dev = F.col("n_obs").cast("double") - expected
    chi2 = dev * dev / expected

    def q(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")

    return rows.select(
        "digit",
        "n_obs",
        "n_total",
        q(expected).alias("exp_q"),
        q(chi2).alias("chi2_q"),
    ).orderBy("digit")


def benford_audit_sql(table: str, col: str) -> str:
    """DuckDB twin of benford_audit."""
    cases = " ".join(
        f"WHEN {d} THEN {pv!r}" for d, pv in BENFORD_P.items()
    )
    return f"""
WITH obs AS (
  SELECT substr((floor({col} * 100.0 + 0.5)::BIGINT)::VARCHAR, 1, 1)
           ::BIGINT AS digit,
         count(*)::BIGINT AS n_obs
  FROM {table} WHERE {col} > 0 GROUP BY 1
),
tot AS (SELECT sum(n_obs)::BIGINT AS n_total FROM obs),
j AS (
  SELECT digit, n_obs, n_total,
         n_total::DOUBLE * (CASE digit {cases} END) AS expected
  FROM obs, tot
)
SELECT digit, n_obs, n_total,
       floor(expected * 1e6 + 0.5)::BIGINT AS exp_q,
       floor((n_obs::DOUBLE - expected) * (n_obs::DOUBLE - expected)
             / expected * 1e6 + 0.5)::BIGINT AS chi2_q
FROM j ORDER BY digit
"""


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Exact weighted median per group (lower weighted median: the
    smallest value whose cumulative weight reaches half the total) —
    the robust location statistic for skewed weighted data
    (price-by-volume, score-by-token-count) where a plain median
    over rows mis-weights.

    Shape: pre-aggregate weight per (group, value) — collapses
    duplicates BEFORE the window so the sort is over distinct
    values — then one cumulative-sum window per group and a
    min-over-qualifying filter. Exact integer weights: the
    half-total test is 2·cumw >= totw, no division anywhere.

    Output: (group, w_median, tot_w)."""
    per_val = df.groupBy(
        F.col(group_col).alias("grp"), F.col(value_col).alias("v")
    ).agg(F.sum(F.col(weight_col).cast("long")).alias("w"))
    wc = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("grp")
    ranked = per_val.withColumn(
        "cumw", F.sum("w").over(wc)
    ).withColumn("totw", F.sum("w").over(tot))
    return (
        ranked.where(F.lit(2) * F.col("cumw") >= F.col("totw"))
        .groupBy("grp")
        .agg(
            F.min("v").alias("w_median"),
            F.max("totw").alias("tot_w"),
        )
        .select(
            F.col("grp").alias(group_col),
            "w_median",
            F.col("tot_w").cast("long").alias("tot_w"),
        )
        .orderBy(group_col)
    )


def weighted_median_sql(
    table_cte: str, group_col: str, value_col: str, weight_col: str
) -> str:
    """DuckDB twin of weighted_median."""
    return f"""
WITH per_val AS (
  SELECT {group_col} AS grp, {value_col} AS v,
         sum({weight_col}::BIGINT) AS w
  FROM ({table_cte}) GROUP BY 1, 2
),
ranked AS (
  SELECT grp, v, w,
         sum(w) OVER (PARTITION BY grp ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cumw,
         sum(w) OVER (PARTITION BY grp) AS totw
  FROM per_val
)
SELECT grp AS {group_col}, min(v) AS w_median,
       max(totw)::BIGINT AS tot_w
FROM ranked WHERE 2 * cumw >= totw
GROUP BY grp ORDER BY grp
"""


def gini_concentration(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Gini coefficient of value concentration per group — the
    inequality statistic behind "is this corpus dominated by a few
    domains?" / revenue-concentration audits (0 = perfectly even,
    →1 = one member holds everything).

    Sample Gini on the ascending-sorted sequence:
    G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx). One rank window per group
    (ties ordered arbitrarily but Σ i·x_i is tie-invariant when the
    x are equal — and the window still carries a deterministic
    tiebreak on value). Integer values in, rank·value products
    accumulate in DECIMAL(38,0)/HUGEINT (rank·cents passes int64
    around 1e9 members), ONE double division out, half-up
    quantized at 1e6.

    Output: (group, n, total, gini_q)."""
    # ties in v need no explicit tiebreak: Σ i·v over a constant-v
    # rank block is permutation-invariant, so the aggregate is
    # deterministic whatever order the engine picks
    w = Window.partitionBy("grp").orderBy("v")
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("long").alias("v"),
    )
    ranked = base.withColumn(
        "i", F.row_number().over(w).cast("long")
    )
    stats = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("decimal(38,0)").alias("s"),
        F.sum(
            F.col("i").cast("decimal(19,0)")
            * F.col("v").cast("decimal(19,0)")
        ).alias("siv"),
    )
    n38 = F.col("n").cast("decimal(38,0)")
    num = (
        F.lit(2).cast("decimal(38,0)") * F.col("siv")
        - (n38 + F.lit(1).cast("decimal(38,0)")) * F.col("s")
    ).cast("double")
    den = (n38 * F.col("s")).cast("double")
    return (
        stats.where(F.col("s") > 0)
        .select(
            F.col("grp").alias(group_col),
            "n",
            F.col("s").cast("long").alias("total"),
            F.floor(num / den * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias("gini_q"),
        )
        .orderBy(group_col)
    )


def gini_concentration_sql(
    table_cte: str, group_col: str, value_col: str
) -> str:
    """DuckDB twin of gini_concentration."""
    return f"""
WITH base AS (
  SELECT {group_col} AS grp, {value_col}::BIGINT AS v
  FROM ({table_cte})
),
ranked AS (
  SELECT grp, v,
         row_number() OVER (PARTITION BY grp ORDER BY v)::BIGINT AS i
  FROM base
),
stats AS (
  SELECT grp, count(*)::BIGINT AS n, sum(v::HUGEINT) AS s,
         sum(i::HUGEINT * v::HUGEINT) AS siv
  FROM ranked GROUP BY grp
)
SELECT grp AS {group_col}, n, s::BIGINT AS total,
       floor((2::HUGEINT * siv - (n + 1)::HUGEINT * s)::DOUBLE
             / (n::HUGEINT * s)::DOUBLE * 1e6 + 0.5)::BIGINT AS gini_q
FROM stats
WHERE s > 0
ORDER BY {group_col}
"""


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
) -> DataFrame:
    """Winsorized per-group statistics — clip values at exact
    per-group order-statistic percentiles (percentile_disc
    semantics: the value at rank ceil(p·n/100)) and report the
    clipped mean, the robust alternative to dropping outliers.

    One rank window per group (deterministic tiebreak on value then
    a stable seed), thresholds picked by INTEGER rank compare
    (k = (p·n + 99) integer-div 100 — no float percentile), clipped
    sum in DECIMAL(38,0), one division for the mean.

    Output: (group, n, lo_c, hi_c, clipped_mean_q, n_clipped)."""
    # order-statistic VALUES are tie-invariant (the value at rank k
    # inside a tied block is the tied value), so orderBy(v) alone is
    # deterministic in output
    w = Window.partitionBy("grp").orderBy("v")
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("long").alias("v"),
    )
    ranked = base.withColumn(
        "i", F.row_number().over(w).cast("long")
    ).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("grp"))
    )
    klo = F.expr(f"({lo_pct} * n + 99) DIV 100")
    khi = F.expr(f"({hi_pct} * n + 99) DIV 100")
    th = ranked.groupBy("grp").agg(
        F.max("n").cast("long").alias("n"),
        F.min(F.when(F.col("i") == klo, F.col("v"))).alias("lo_c"),
        F.min(F.when(F.col("i") == khi, F.col("v"))).alias("hi_c"),
    )
    joined = base.join(F.broadcast(th), "grp")
    clipped = F.greatest(
        F.col("lo_c"), F.least(F.col("hi_c"), F.col("v"))
    )
    out = joined.groupBy("grp").agg(
        F.max("n").alias("n"),
        F.max("lo_c").alias("lo_c"),
        F.max("hi_c").alias("hi_c"),
        F.sum(clipped.cast("decimal(38,0)")).alias("_cs"),
        F.sum(
            ((F.col("v") < F.col("lo_c")) | (F.col("v") > F.col("hi_c")))
            .cast("long")
        ).alias("n_clipped"),
    )
    mean_q = F.floor(
        F.col("_cs").cast("double") / F.col("n").cast("double")
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    return out.select(
        F.col("grp").alias(group_col),
        "n",
        "lo_c",
        "hi_c",
        mean_q.alias("clipped_mean_q"),
        F.col("n_clipped").cast("long").alias("n_clipped"),
    ).orderBy(group_col)


def winsorized_stats_sql(
    table_cte: str,
    group_col: str,
    value_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
) -> str:
    """DuckDB twin of winsorized_stats."""
    return f"""
WITH base AS (
  SELECT {group_col} AS grp, {value_col}::BIGINT AS v
  FROM ({table_cte})
),
ranked AS (
  SELECT grp, v,
         row_number() OVER (PARTITION BY grp ORDER BY v)::BIGINT AS i,
         count(*) OVER (PARTITION BY grp)::BIGINT AS n
  FROM base
),
th AS (
  SELECT grp, max(n)::BIGINT AS n,
         min(CASE WHEN i = ({lo_pct} * n + 99) // 100 THEN v END)
           AS lo_c,
         min(CASE WHEN i = ({hi_pct} * n + 99) // 100 THEN v END)
           AS hi_c
  FROM ranked GROUP BY grp
),
agg AS (
  SELECT b.grp, max(t.n) AS n, max(t.lo_c) AS lo_c,
         max(t.hi_c) AS hi_c,
         sum(greatest(t.lo_c, least(t.hi_c, b.v))::HUGEINT) AS cs,
         sum(CASE WHEN b.v < t.lo_c OR b.v > t.hi_c
                  THEN 1 ELSE 0 END)::BIGINT AS n_clipped
  FROM base b JOIN th t ON t.grp = b.grp
  GROUP BY b.grp
)
SELECT grp AS {group_col}, n::BIGINT AS n, lo_c, hi_c,
       floor(cs::DOUBLE / n::DOUBLE * 1e6 + 0.5)::BIGINT
         AS clipped_mean_q,
       n_clipped
FROM agg ORDER BY {group_col}
"""



def abc_classify(
    df: DataFrame,
    group_col: str,
    item_col: str,
    value_col: str,
    a_pct: int = 80,
    b_pct: int = 95,
) -> DataFrame:
    """ABC / Pareto classification per group — the 80/15/5 inventory
    analysis: rank items by value, classify by cumulative share
    (A = head up to a_pct%%, B = to b_pct%%, C = tail). The corpus
    analogue decides which domains get human review vs spot checks.

    One rank + running-sum window per group (partitioned — nothing
    global), integer share compare (100·cum <= pct·total — no float
    thresholds), deterministic (value desc, item) order. Output is
    the per-(group, class) rollup.

    Output: (group, abc_class, n_items, class_value, share_q)."""
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(item_col).alias("item"),
        F.col(value_col).cast("long").alias("v"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy(F.col("v").desc(), "item")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("grp")
    ranked = base.withColumn("cum", F.sum("v").over(w)).withColumn(
        "tot", F.sum("v").over(wt)
    )
    cls = (
        F.when(
            F.lit(100) * F.col("cum") <= F.lit(a_pct) * F.col("tot"),
            F.lit("A"),
        )
        .when(
            F.lit(100) * F.col("cum") <= F.lit(b_pct) * F.col("tot"),
            F.lit("B"),
        )
        .otherwise(F.lit("C"))
    )
    out = (
        ranked.withColumn("abc_class", cls)
        .groupBy("grp", "abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("v").cast("long").alias("class_value"),
            F.max("tot").alias("_tot"),
        )
    )
    share_q = F.floor(
        F.col("class_value").cast("double")
        / F.col("_tot").cast("double")
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    return out.select(
        F.col("grp").alias(group_col),
        "abc_class",
        "n_items",
        "class_value",
        share_q.alias("share_q"),
    ).orderBy(group_col, "abc_class")


def abc_classify_sql(
    table_cte: str,
    group_col: str,
    item_col: str,
    value_col: str,
    a_pct: int = 80,
    b_pct: int = 95,
) -> str:
    """DuckDB twin of abc_classify."""
    return f"""
WITH base AS (
  SELECT {group_col} AS grp, {item_col} AS item,
         {value_col}::BIGINT AS v
  FROM ({table_cte})
),
ranked AS (
  SELECT grp, v,
         sum(v) OVER (PARTITION BY grp ORDER BY v DESC, item
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum,
         sum(v) OVER (PARTITION BY grp) AS tot
  FROM base
),
classed AS (
  SELECT grp, v, tot,
         CASE WHEN 100 * cum <= {a_pct} * tot THEN 'A'
              WHEN 100 * cum <= {b_pct} * tot THEN 'B'
              ELSE 'C' END AS abc_class
  FROM ranked
)
SELECT grp AS {group_col}, abc_class,
       count(*)::BIGINT AS n_items,
       sum(v)::BIGINT AS class_value,
       floor(sum(v)::DOUBLE / max(tot)::DOUBLE * 1e6 + 0.5)::BIGINT
         AS share_q
FROM classed
GROUP BY grp, abc_class
ORDER BY {group_col}, abc_class
"""


def welch_z_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    min_n: int = 2,
) -> DataFrame:
    """One-vs-rest Welch z-test per group — the A/B-screening pass
    ("does this segment's metric differ from everyone else's?")
    run before any deeper causal analysis.

    z = (m_g − m_rest) / sqrt(s²_g/n_g + s²_rest/n_rest) from ONE
    aggregation of exact integer sufficient statistics (values
    pre-quantized to cents by the caller); the rest-side stats are
    total − group, so no second scan and no self-join. sqrt is IEEE
    correctly-rounded; z quantizes half-up at 1e6.

    Output: (group, n, mean_q, z_q) ordered by group."""
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("long").alias("v"),
    )
    per = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").alias("s"),
        F.sum(
            F.col("v").cast("decimal(19,0)")
            * F.col("v").cast("decimal(19,0)")
        ).alias("ss"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("s").cast("decimal(38,0)").alias("ts"),
        F.sum("ss").cast("decimal(38,0)").alias("tss"),
    )
    j = per.crossJoin(F.broadcast(tot))
    d = lambda c: c.cast("double")  # noqa: E731
    n_g, s_g, ss_g = F.col("n"), F.col("s"), F.col("ss")
    n_r = F.col("tn") - n_g
    s_r = F.col("ts") - s_g.cast("decimal(38,0)")
    ss_r = F.col("tss") - ss_g
    mean_g = d(s_g) / d(n_g)
    mean_r = d(s_r) / d(n_r)
    # sample variance: (n·Σv² − (Σv)²) / (n·(n−1)) — decimal
    # numerators stay exact, ONE double division each
    var_g = d(
        n_g.cast("decimal(38,0)") * ss_g
        - s_g.cast("decimal(38,0)") * s_g.cast("decimal(38,0)")
    ) / d(n_g * (n_g - F.lit(1)))
    var_r = d(
        n_r.cast("decimal(38,0)") * ss_r - s_r * s_r
    ) / d(n_r * (n_r - F.lit(1)))
    z = (mean_g - mean_r) / F.sqrt(
        var_g / d(n_g) + var_r / d(n_r)
    )

    def q(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")

    return (
        j.where((n_g >= min_n) & (n_r >= min_n))
        .select(
            F.col("grp").alias(group_col),
            "n",
            q(mean_g).alias("mean_q"),
            q(z).alias("z_q"),
        )
        .orderBy(group_col)
    )


def welch_z_test_sql(
    table_cte: str, group_col: str, value_col: str, min_n: int = 2
) -> str:
    """DuckDB twin of welch_z_test."""
    return f"""
WITH base AS (
  SELECT {group_col} AS grp, {value_col}::BIGINT AS v
  FROM ({table_cte})
),
per AS (
  SELECT grp, count(*)::BIGINT AS n, sum(v)::BIGINT AS s,
         sum(v::HUGEINT * v::HUGEINT) AS ss
  FROM base GROUP BY grp
),
tot AS (
  SELECT sum(n)::BIGINT AS tn, sum(s::HUGEINT) AS ts,
         sum(ss) AS tss
  FROM per
),
j AS (
  SELECT p.grp, p.n,
         p.s::DOUBLE / p.n::DOUBLE AS mean_g,
         (t.ts - p.s)::DOUBLE / (t.tn - p.n)::DOUBLE AS mean_r,
         (p.n::HUGEINT * p.ss - p.s::HUGEINT * p.s::HUGEINT)::DOUBLE
           / (p.n * (p.n - 1))::DOUBLE AS var_g,
         ((t.tn - p.n)::HUGEINT * (t.tss - p.ss)
          - (t.ts - p.s) * (t.ts - p.s))::DOUBLE
           / ((t.tn - p.n) * (t.tn - p.n - 1))::DOUBLE AS var_r,
         t.tn - p.n AS n_r
  FROM per p CROSS JOIN tot t
)
SELECT grp AS {group_col}, n,
       floor(mean_g * 1e6 + 0.5)::BIGINT AS mean_q,
       floor((mean_g - mean_r)
             / sqrt(var_g / n::DOUBLE + var_r / n_r::DOUBLE)
             * 1e6 + 0.5)::BIGINT AS z_q
FROM j
WHERE n >= {min_n} AND n_r >= {min_n}
ORDER BY {group_col}
"""


def hhi_index(
    df: DataFrame,
    group_col: str,
    member_col: str,
    value_col: str,
) -> DataFrame:
    """Herfindahl-Hirschman concentration index per group — the
    antitrust-style market-concentration scalar (Σ share², on the
    conventional 0..10,000 basis-point scale: <1500 competitive,
    >2500 concentrated). Companion to [[gini]]: HHI weights the
    head, Gini the whole curve.

    Exact path: HHI = 10^4 · Σv² / S², so member totals and Σv²
    accumulate as exact integers (DECIMAL(38,0)/HUGEINT — v² passes
    int64 at member totals ≈ 3e9) and ONE double division closes
    each group. No per-member float ever crosses rows.

    Output: (group, n_members, total, hhi_q) with hhi_q =
    round(HHI_basis_points · 1e2) (i.e. 1e6-quantized share-sum)."""
    per = (
        df.groupBy(
            F.col(group_col).alias("grp"),
            F.col(member_col).alias("m"),
        )
        .agg(F.sum(F.col(value_col).cast("long")).alias("v"))
    )
    stats = per.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("v").cast("decimal(38,0)").alias("s"),
        F.sum(
            F.col("v").cast("decimal(19,0)")
            * F.col("v").cast("decimal(19,0)")
        ).alias("svv"),
    )
    hhi = (
        F.col("svv").cast("double")
        / (F.col("s") * F.col("s")).cast("double")
        * F.lit(1e4)  # basis points
    )
    return (
        stats.where(F.col("s") > 0)
        .select(
            F.col("grp").alias(group_col),
            "n_members",
            F.col("s").cast("long").alias("total"),
            F.floor(hhi * F.lit(1e2) + F.lit(0.5))
            .cast("long")
            .alias("hhi_q"),
        )
        .orderBy(group_col)
    )


def hhi_index_sql(
    table_cte: str, group_col: str, member_col: str, value_col: str
) -> str:
    """DuckDB twin of hhi_index."""
    return f"""
WITH per AS (
  SELECT {group_col} AS grp, {member_col} AS m,
         sum({value_col}::BIGINT) AS v
  FROM ({table_cte}) GROUP BY 1, 2
),
stats AS (
  SELECT grp, count(*)::BIGINT AS n_members,
         sum(v::HUGEINT) AS s,
         sum(v::HUGEINT * v::HUGEINT) AS svv
  FROM per GROUP BY grp
)
SELECT grp AS {group_col}, n_members, s::BIGINT AS total,
       floor(svv::DOUBLE / (s * s)::DOUBLE * 1e4 * 1e2 + 0.5)::BIGINT
         AS hhi_q
FROM stats
WHERE s > 0
ORDER BY {group_col}
"""


# floor(ln(2)*1e9 + 0.5), precomputed so both engines share the exact
# integer literal rather than each calling ln(2)
LN2_Q = 693_147_181


def group_js_divergence(
    tokens_df: DataFrame,
    group_col: str = "source",
    token_col: str = "token",
) -> DataFrame:
    """Jensen-Shannon divergence of each group's token distribution
    from the whole-corpus distribution — the distribution-drift
    ranking ("which source/crawl is most unusual?") that decides
    which slices need a closer curation look. Bounded in [0, ln 2],
    symmetric, defined even where a token is missing on one side —
    why it beats raw KL for corpus QA.

    Absent-token closed form keeps the work ON the group's own
    token set: for tokens the group lacks, the JS term reduces to
    q·ln 2, so

        2·JS = Σ_{t∈g} p·ln(2p/(p+q)) + Σ_{t∈g} q·ln(2q/(p+q))
               + ln 2 · (1 − Q_g),   Q_g = corpus mass of g's tokens

    — never a vocab × groups expansion. Shape: one (group, token)
    count shuffle (map-side combined), a token-keyed re-group for
    corpus counts, one token-keyed join back; group totals broadcast,
    the corpus total a ONE-ROW crossJoin. Every ln argument is an
    exact int64 product ratio (2·c·T vs c·T + C·T_g — widen to
    DECIMAL(38,0) past ~3e9-token groups, the corr_matrix pattern),
    per-term half-up-quantized ×1e9 (floor(x + 0.5)) and weighted by the integer
    count, so both sums are order-free; ln 2 enters as the shared
    integer literal LN2_Q.

    Output: (group_col, n_tokens, vocab, js_q) — js_q in nano-nats."""
    counts = tokens_df.groupBy(
        F.col(group_col).alias("g"), F.col(token_col).alias("t")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    corpus = counts.groupBy("t").agg(F.sum("c").alias("cc"))
    g_tot = counts.groupBy("g").agg(F.sum("c").alias("tg"))
    tot = counts.agg(F.sum("c").alias("tt"))
    j = (
        counts.join(corpus, "t")
        .join(F.broadcast(g_tot), "g")
        .crossJoin(F.broadcast(tot))
    )
    den = (F.col("c") * F.col("tt") + F.col("cc") * F.col("tg")).cast(
        "double"
    )
    lnq1 = F.floor(
        F.log((F.lit(2) * F.col("c") * F.col("tt")).cast("double") / den)
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("long")
    lnq2 = F.floor(
        F.log((F.lit(2) * F.col("cc") * F.col("tg")).cast("double") / den)
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("long")
    agg = j.groupBy("g").agg(
        F.max("tg").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(lnq1 * F.col("c")).alias("_a"),
        F.sum(lnq2 * F.col("cc")).alias("_b"),
        F.sum("cc").alias("_sc"),
        F.max("tt").alias("_tt"),
    )
    two_js = (
        F.col("_a").cast("double") / F.col("n_tokens").cast("double")
        + F.col("_b").cast("double") / F.col("_tt").cast("double")
        + F.lit(LN2_Q).cast("double")
        * (
            (F.col("_tt") - F.col("_sc")).cast("double")
            / F.col("_tt").cast("double")
        )
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n_tokens",
        "vocab",
        F.floor(two_js / F.lit(2.0) + F.lit(0.5))
        .cast("long")
        .alias("js_q"),
    ).orderBy(group_col)


def group_js_divergence_sql(
    tokens_cte: str,
    group_col: str = "source",
) -> str:
    """DuckDB twin of group_js_divergence. ``tokens_cte`` must yield
    (g, t) one row per token instance."""
    return f"""
WITH js_tk AS MATERIALIZED ({tokens_cte}),
js_counts AS MATERIALIZED (
  SELECT g, t, count(*)::BIGINT AS c FROM js_tk GROUP BY 1, 2
),
js_corpus AS (SELECT t, sum(c)::BIGINT AS cc FROM js_counts GROUP BY t),
js_g_tot AS (SELECT g, sum(c)::BIGINT AS tg FROM js_counts GROUP BY g),
js_tot AS (SELECT sum(c)::BIGINT AS tt FROM js_counts),
js_j AS (
  SELECT n.g, n.c, o.cc, gt.tg, js_tot.tt,
         (n.c * js_tot.tt + o.cc * gt.tg)::DOUBLE AS den
  FROM js_counts n
  JOIN js_corpus o ON o.t = n.t
  JOIN js_g_tot gt ON gt.g = n.g, js_tot
),
js_agg AS (
  SELECT g,
         max(tg)::BIGINT AS n_tokens,
         count(*)::BIGINT AS vocab,
         sum(floor(ln((2 * c * tt)::DOUBLE / den) * 1e9 + 0.5)::BIGINT
             * c)::BIGINT AS a,
         sum(floor(ln((2 * cc * tg)::DOUBLE / den) * 1e9 + 0.5)::BIGINT
             * cc)::BIGINT AS b,
         sum(cc)::BIGINT AS sc,
         max(tt)::BIGINT AS tt
  FROM js_j GROUP BY g
)
SELECT g AS {group_col}, n_tokens, vocab,
       floor((a::DOUBLE / n_tokens::DOUBLE
              + b::DOUBLE / tt::DOUBLE
              + {LN2_Q}::DOUBLE * ((tt - sc)::DOUBLE / tt::DOUBLE))
             / 2.0 + 0.5)::BIGINT AS js_q
FROM js_agg ORDER BY {group_col}
"""


def chi2_independence(
    df: DataFrame,
    group_col: str,
    cat_col: str,
) -> DataFrame:
    """Chi-square test of independence between a (small-domain)
    group assignment and a categorical outcome — the A/B-test
    guardrail ("did the arms see the same event mix?") and the
    categorical member of the drift trio next to [[ks_two_sample]]
    (numeric) and [[psi_drift]] (binned). Expected cell counts come
    from the margins; the statistic is

        chi2 = Σ_cells (o·N − r·c)² / (N·r·c)

    with o·N − r·c an EXACT integer carried in a double (magnitudes
    < 2^53 up to ~9e7 rows per margin product; widen to
    DECIMAL(38,0) past that, the corr_matrix pattern), one IEEE
    division per cell, half-up ×1e6 quantized — order-free sums,
    engine-identical. ONE (group, category) groupBy is the only
    corpus-scale pass; margins ride broadcast joins over the
    category/group domains.

    Output: one row per (group, category) cell — (g, cat, o,
    term_q) — with chi2_q and dof repeated on every row; zero cells
    are materialized from the margin frame so their expected-count
    contribution is never silently dropped."""
    cells = df.groupBy(
        F.col(group_col).alias("g"), F.col(cat_col).alias("cat")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    rowm = cells.groupBy("g").agg(F.sum("o").alias("r"))
    colm = cells.groupBy("cat").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("n"))
    full = (
        # zero cells matter: build the full g x cat frame from the
        # margins (both domain-bounded) so absent combinations
        # contribute their expected-count term
        rowm.crossJoin(F.broadcast(colm))
        .join(cells, ["g", "cat"], "left")
        .select(
            "g",
            "cat",
            "r",
            "c",
            F.coalesce("o", F.lit(0)).alias("o"),
        )
        .crossJoin(F.broadcast(tot))
    )
    x = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    term = F.floor(
        x * x / (F.col("n") * F.col("r") * F.col("c")).cast("double")
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    per_cell = full.select("g", "cat", "o", term.alias("term_q"))
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ng = F.size(F.collect_set("g").over(w_all))
    ncat = F.size(F.collect_set("cat").over(w_all))
    return (
        per_cell.withColumn("chi2_q", F.sum("term_q").over(w_all))
        .withColumn(
            "dof", ((ng - 1) * (ncat - 1)).cast("long")
        )
        .orderBy("cat", "g")
    )


def chi2_independence_sql(
    table: str,
    group_col: str,
    cat_col: str,
) -> str:
    """DuckDB twin of chi2_independence."""
    return f"""
WITH x2_cells AS MATERIALIZED (
  SELECT {group_col} AS g, {cat_col} AS cat, count(*)::BIGINT AS o
  FROM {table} GROUP BY 1, 2
),
x2_rowm AS (SELECT g, sum(o)::BIGINT AS r FROM x2_cells GROUP BY g),
x2_colm AS (SELECT cat, sum(o)::BIGINT AS c FROM x2_cells GROUP BY cat),
x2_tot AS (SELECT sum(o)::BIGINT AS n FROM x2_cells),
x2_full AS (
  SELECT rm.g, cm.cat, rm.r, cm.c, coalesce(ce.o, 0)::BIGINT AS o, t.n
  FROM x2_rowm rm
  CROSS JOIN x2_colm cm
  LEFT JOIN x2_cells ce ON ce.g = rm.g AND ce.cat = cm.cat
  CROSS JOIN x2_tot t
),
x2_t AS (
  SELECT g, cat, o,
         floor((o * n - r * c)::DOUBLE * (o * n - r * c)::DOUBLE
               / (n * r * c)::DOUBLE * 1e6 + 0.5)::BIGINT AS term_q
  FROM x2_full
)
SELECT g, cat, o, term_q,
       sum(term_q) OVER ()::BIGINT AS chi2_q,
       ((count(DISTINCT g) OVER () - 1)
        * (count(DISTINCT cat) OVER () - 1))::BIGINT AS dof
FROM x2_t ORDER BY cat, g
"""


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_q: int = 200_000,
    quant: int = 1_000_000,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    third privacy gate after [[k_anonymity_audit]] and
    [[l_diversity_audit]]: a class passes l-diversity yet still
    leaks when its sensitive DISTRIBUTION diverges from the global
    one (the skewness/similarity attacks). For a categorical
    sensitive attribute the Earth-Mover's Distance reduces to total
    variation:

        t(g) = ½ Σ_s | n_gs/n_g − N_s/N |

    computed entirely in exact integer space: per (class, value)
    cell the term |n_gs·N − N_s·n_g| is an exact product-difference
    (widened through DECIMAL(38,0)/HUGEINT — n·N products pass 2^63
    long before a 100 TB corpus does), cells sum order-free per
    class, and the single division by 2·n_g·N quantizes half-up at
    ``quant``. Values ABSENT from a class still contribute (the
    Σ over s runs on the full value domain): the class-level sum
    adds Σ_{s absent} N_s·n_g, folded in exactly as
    (N − Σ_{s present} N_s)·n_g — no zero-cell materialization
    needed.

    Shape: one (quasi, sensitive) groupBy — the corpus-scale pass —
    then class-keyed aggregation over the (classes × values-present)
    cell table, one broadcast one-row global total; all
    domain-bounded. Output: (quasi_cols..., class_size, t_q_value,
    at_risk) with at_risk = t_q_value > t_q."""
    cells = (
        df.groupBy(*quasi_cols, sensitive_col)
        .agg(F.count(F.lit(1)).alias("n_gs"))
        .localCheckpoint(eager=True)
    )
    glob = cells.groupBy(sensitive_col).agg(
        F.sum("n_gs").cast("long").alias("n_s")
    )
    total = glob.agg(F.sum("n_s").cast("long").alias("n_tot"))
    dec = "decimal(38,0)"
    cls = cells.groupBy(*quasi_cols).agg(
        F.sum("n_gs").cast("long").alias("class_size")
    )
    per_class = (
        cells.join(F.broadcast(glob), sensitive_col)
        .join(cls, quasi_cols)
        .crossJoin(F.broadcast(total))
        .groupBy(*quasi_cols)
        .agg(
            F.max("class_size").cast("long").alias("class_size"),
            F.sum(
                F.abs(
                    F.col("n_gs").cast(dec) * F.col("n_tot").cast(dec)
                    - F.col("n_s").cast(dec)
                    * F.col("class_size").cast(dec)
                )
            ).alias("_present"),
            F.sum(F.col("n_s").cast(dec)).alias("_ns_present"),
            F.max("n_tot").cast("long").alias("n_tot"),
        )
        .select(
            *quasi_cols,
            "class_size",
            "n_tot",
            (
                F.col("_present")
                + (
                    F.col("n_tot").cast(dec) - F.col("_ns_present")
                ) * F.col("class_size").cast(dec)
            ).alias("_tv2"),
        )
    )
    return per_class.select(
        *quasi_cols,
        "class_size",
        F.floor(
            F.col("_tv2").cast("double")
            / (
                F.lit(2.0)
                * F.col("class_size").cast("double")
                * F.col("n_tot").cast("double")
            )
            * F.lit(float(quant))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("t_q_value"),
    ).withColumn("at_risk", F.col("t_q_value") > F.lit(t_q))


def t_closeness_audit_sql(
    table: str,
    quasi_cols: list[str],
    sensitive_col: str,
    t_q: int = 200_000,
    quant: int = 1_000_000,
    order_by: str | None = None,
) -> str:
    """DuckDB twin of t_closeness_audit (HUGEINT widening mirrors
    the DECIMAL(38,0) path). ``glob`` is a DuckDB table function, so
    the global-margin CTE is named ``gmarg``."""
    q = ", ".join(quasi_cols)
    tail = f"ORDER BY {order_by}" if order_by else ""
    return f"""
WITH cells AS (
  SELECT {q}, {sensitive_col} AS s, count(*)::BIGINT AS n_gs
  FROM {table} GROUP BY {q}, {sensitive_col}
),
gmarg AS (
  SELECT s, sum(n_gs)::BIGINT AS n_s FROM cells GROUP BY s
),
tot AS (SELECT sum(n_s)::BIGINT AS n_tot FROM gmarg),
cls AS (
  SELECT {q}, sum(n_gs)::BIGINT AS class_size FROM cells GROUP BY {q}
),
per_class AS (
  SELECT {', '.join('cells.' + c for c in quasi_cols)},
         any_value(cls.class_size) AS class_size,
         any_value(tot.n_tot) AS n_tot,
         sum(abs(n_gs::HUGEINT * n_tot::HUGEINT
                 - n_s::HUGEINT * cls.class_size::HUGEINT)) AS present,
         sum(n_s::HUGEINT) AS ns_present
  FROM cells
  JOIN gmarg USING (s)
  JOIN cls USING ({q})
  CROSS JOIN tot
  GROUP BY {q}
)
SELECT {q}, class_size,
       floor((present + (n_tot::HUGEINT - ns_present)
                        * class_size::HUGEINT)::DOUBLE
             / (2.0 * class_size::DOUBLE * n_tot::DOUBLE)
             * {quant}.0 + 0.5)::BIGINT AS t_q_value,
       floor((present + (n_tot::HUGEINT - ns_present)
                        * class_size::HUGEINT)::DOUBLE
             / (2.0 * class_size::DOUBLE * n_tot::DOUBLE)
             * {quant}.0 + 0.5)::BIGINT > {t_q} AS at_risk
FROM per_class
{tail}
"""


def spearman(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_mult: int = 1,
    y_mult: int = 1,
    shard_width: int = 1024,
) -> DataFrame:
    """Exact tie-corrected Spearman rank correlation — the monotone
    companion to corr_matrix's Pearson (outlier-robust association,
    the profiling question "related at all?" rather than "linearly
    related?").

    No global row sort anywhere: the tie-correct AVERAGE rank of a
    value is a per-DISTINCT-value quantity, 2·avgrank = 2·N_< + n_v
    + 1 (an exact integer — the doubling clears the half from
    averaging, and Pearson is affine-invariant so rho over doubled
    ranks is rho over ranks). N_< comes from binary_auc's two-phase
    prefix-sum shape: in-shard cumulative windows run per
    ``floor(value/shard_width)`` shard in parallel and only the
    #shards-row total table crosses a single-partition window. The
    doubled ranks then join back to the rows (value-keyed, domain-
    not corpus-sized) and Pearson assembles from one map-side-
    combinable aggregation in DECIMAL(38,0) — exact to ~4e9 rows
    (4n⁴ < 1e38); the only irrational op is the final sqrt and rho
    quantizes half-up at 1e-6.

    Zero-variance inputs (all x or all y equal) have no defined
    rank correlation: rho_q is NULL, matching the repo's
    degenerate-input discipline. Output: one row (n, rho_q)."""
    # Quantize unconditionally (including mult=1): a bare long cast
    # TRUNCATES decimals Spark-side while DuckDB's ::BIGINT ROUNDS, so
    # the mult=1 fast path would silently diverge on fractional inputs
    # (r09 advisor finding) — half-up floor on both engines instead.
    xq = F.floor(F.col(x_col) * F.lit(float(x_mult)) + F.lit(0.5))
    yq = F.floor(F.col(y_col) * F.lit(float(y_mult)) + F.lit(0.5))
    base = df.select(
        xq.cast("long").alias("x"), yq.cast("long").alias("y")
    )

    def rank2(col: str) -> DataFrame:
        per = base.groupBy(col).agg(
            F.count(F.lit(1)).cast("long").alias("n_v")
        ).withColumn(
            "shard",
            F.floor(F.col(col) / F.lit(shard_width)).cast("long"),
        )
        w_in = (
            Window.partitionBy("shard")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w_shard = Window.orderBy("shard").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = (
            per.groupBy("shard")
            .agg(F.sum("n_v").alias("shard_n"))
            .withColumn(
                "offset",
                F.coalesce(F.sum("shard_n").over(w_shard), F.lit(0)),
            )
            .select("shard", "offset")
        )
        return (
            per.join(F.broadcast(offsets), "shard")
            .select(
                col,
                (
                    F.lit(2)
                    * (
                        F.coalesce(F.sum("n_v").over(w_in), F.lit(0))
                        + F.col("offset")
                    )
                    + F.col("n_v")
                    + F.lit(1)
                ).alias(f"r2{col}"),
            )
        )

    ranked = base.join(rank2("x"), "x").join(rank2("y"), "y")
    d19 = "decimal(19,0)"
    stats = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("r2x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("r2y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("r2x").cast(d19) * F.col("r2y").cast(d19)).alias("sxy"),
        F.sum(F.col("r2x").cast(d19) * F.col("r2x").cast(d19)).alias("sxx"),
        F.sum(F.col("r2y").cast(d19) * F.col("r2y").cast(d19)).alias("syy"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    num = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    rho = num / (F.sqrt(vx) * F.sqrt(vy))
    return stats.select(
        "n",
        F.when(
            (vx > 0) & (vy > 0),
            F.floor(rho * F.lit(1e6) + F.lit(0.5)).cast("long"),
        ).alias("rho_q"),
    )


def spearman_sql(
    table: str,
    x_expr: str,
    y_expr: str,
    x_mult: int = 1,
    y_mult: int = 1,
) -> str:
    """DuckDB twin of spearman (HUGEINT plays DECIMAL; the oracle
    replays the SEMANTICS — per-distinct-value doubled average
    ranks, Pearson over them — with plain windows, not the two-phase
    sharding, which is a Spark plan shape, not a result). Applies
    the same unconditional floor(x*mult+0.5) quantization as the
    Spark path — a bare ::BIGINT would ROUND (half away from zero)
    where the engine half-up floors, diverging on fractional input."""
    xq = f"floor(({x_expr}) * {float(x_mult)} + 0.5)"
    yq = f"floor(({y_expr}) * {float(y_mult)} + 0.5)"
    return f"""
WITH base AS (SELECT ({xq})::BIGINT AS x, ({yq})::BIGINT AS y
              FROM {table}),
rx AS (
  SELECT x,
         2 * coalesce(sum(n_v) OVER (ORDER BY x ROWS BETWEEN
             UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n_v + 1 AS r2x
  FROM (SELECT x, count(*)::BIGINT AS n_v FROM base GROUP BY x)
),
ry AS (
  SELECT y,
         2 * coalesce(sum(n_v) OVER (ORDER BY y ROWS BETWEEN
             UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n_v + 1 AS r2y
  FROM (SELECT y, count(*)::BIGINT AS n_v FROM base GROUP BY y)
),
stats AS MATERIALIZED (
  SELECT count(*)::BIGINT AS n,
         sum(r2x::HUGEINT) AS sx, sum(r2y::HUGEINT) AS sy,
         sum(r2x::HUGEINT * r2y::HUGEINT) AS sxy,
         sum(r2x::HUGEINT * r2x::HUGEINT) AS sxx,
         sum(r2y::HUGEINT * r2y::HUGEINT) AS syy
  FROM base JOIN rx USING (x) JOIN ry USING (y)
)
SELECT n,
       CASE WHEN (n::HUGEINT * sxx - sx * sx) > 0
             AND (n::HUGEINT * syy - sy * sy) > 0
            THEN floor((n::HUGEINT * sxy - sx * sy)::DOUBLE
                 / (sqrt((n::HUGEINT * sxx - sx * sx)::DOUBLE)
                    * sqrt((n::HUGEINT * syy - sy * sy)::DOUBLE))
                 * 1e6 + 0.5)::BIGINT
       END AS rho_q
FROM stats
"""
