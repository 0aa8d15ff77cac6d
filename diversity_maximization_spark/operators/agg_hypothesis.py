"""Hypothesis tests and spatial statistics (SURVEY.md §2.2-D, stats-test family).

Split from the former monolithic operators/aggregates.py (r6 verdict
item 7); all public names are re-exported there, so existing imports
and registry behavior are unchanged.
"""


from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources import load


from .agg_shared import (
    _A2_PRIOS,
    _JT_GROUPS,
    _MH_PRIOS,
    _MH_R,
    _MH_S,
    _a2_cells,
    _a2_exprs,
    _a2_pivot_sql,
    _duck_md5_32,
    _jt_prefix_cte,
    _mh_pivot_sql,
    cents,
)


_TT_MEAN = "(CAST(s1 AS DOUBLE) / 100) / n"
_TT_VAR = (
    "((CAST(s2 AS DOUBLE) / 10000)"
    " - ((CAST(s1 AS DOUBLE) / 100) * (CAST(s1 AS DOUBLE) / 100)) / n)"
    " / (n - 1)"
)


@query(
    "agg_ttest_welch",
    bounded_cross="1-row broadcast scalar (two-arm stats row)",
    oracle=f"""
WITH g AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM({cents('value')}) AS BIGINT) AS s1,
         CAST(SUM({cents('value')} * {cents('value')}) AS BIGINT) AS s2
  FROM events WHERE event_type IN ('view', 'purchase')
  GROUP BY event_type
), m AS (
  SELECT event_type, n, {_TT_MEAN} AS mean, {_TT_VAR} AS var FROM g
), a AS (SELECT * FROM m WHERE event_type = 'view'),
  b AS (SELECT * FROM m WHERE event_type = 'purchase')
SELECT a.n AS n_view, b.n AS n_purchase,
       a.mean - b.mean AS mean_diff,
       (a.mean - b.mean) / sqrt(a.var / a.n + b.var / b.n) AS t_stat,
       pow(a.var / a.n + b.var / b.n, 2)
         / (pow(a.var / a.n, 2) / (a.n - 1)
            + pow(b.var / b.n, 2) / (b.n - 1)) AS welch_dof
FROM a, b
""",
)
def agg_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test (the A/B experimentation staple —
    unequal variances, unequal sizes): is the mean event value of
    'view' events different from 'purchase' events? Everything
    derives from two (n, sum, sum-of-squares) exact-integer triples —
    one partial+final agg over the filtered scan — and the t
    statistic + Welch-Satterthwaite dof evaluate as one closed-form
    double expression from identical integers with identical text on
    both engines: bit-exact, no rounding, and layout-independent
    (the same property agg_regr_trend and sample_poisson_bootstrap
    build on). At 100 TB the experiment readout costs one aggregate
    over the metric scan."""
    ev = load(spark, sf_dir, "events")
    c = cents("value")
    g = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(f"CAST(SUM({c}) AS BIGINT)").alias("s1"),
            F.expr(f"CAST(SUM({c} * {c}) AS BIGINT)").alias("s2"),
        )
    )
    m = g.select(
        "event_type",
        "n",
        F.expr(_TT_MEAN).alias("mean"),
        F.expr(_TT_VAR).alias("var"),
    )
    a = m.filter(F.col("event_type") == "view").select(
        F.col("n").alias("n_view"),
        F.col("mean").alias("mean_a"),
        F.col("var").alias("var_a"),
    )
    b = m.filter(F.col("event_type") == "purchase").select(
        F.col("n").alias("n_purchase"),
        F.col("mean").alias("mean_b"),
        F.col("var").alias("var_b"),
    )
    se2 = "var_a / n_view + var_b / n_purchase"
    return a.crossJoin(b).select(
        "n_view",
        "n_purchase",
        F.expr("mean_a - mean_b").alias("mean_diff"),
        F.expr(f"(mean_a - mean_b) / sqrt({se2})").alias("t_stat"),
        F.expr(
            f"pow({se2}, 2)"
            " / (pow(var_a / n_view, 2) / (n_view - 1)"
            "    + pow(var_b / n_purchase, 2) / (n_purchase - 1))"
        ).alias("welch_dof"),
    )


_CHI_E = (
    "CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(gt AS DOUBLE)"
)


@query(
    "agg_chi2_cells",
    bounded_cross="bounded margins x 1-row grand total",
    oracle=f"""
WITH cells AS (
  SELECT source, lang, COUNT(*) AS o FROM documents GROUP BY source, lang
), rows_t AS (
  SELECT source, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY source
), cols_t AS (
  SELECT lang, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY lang
), grand AS (
  SELECT CAST(SUM(o) AS BIGINT) AS gt FROM cells
)
SELECT c.source, c.lang, c.o AS observed,
       {_CHI_E} AS expected,
       (CAST(c.o AS DOUBLE) - {_CHI_E}) * (CAST(c.o AS DOUBLE) - {_CHI_E})
         / {_CHI_E} AS contribution
FROM cells c
JOIN rows_t USING (source) JOIN cols_t USING (lang), grand
""",
)
def agg_chi2_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence (is document language
    independent of source?) reported PER CELL: observed count,
    margin-product expected count, and the (o-e)^2/e contribution.
    All inputs are exact integer counts, and each cell's doubles
    derive from its own integers with identical expression text —
    bit-exact. The per-cell form is deliberate: the chi2 TOTAL is a
    float sum whose accumulation order differs across engines, so
    the operator emits the order-free cells and leaves the tiny
    final sum to the consumer (grid-sized, driver-cheap) — the same
    reasoning that keeps exact-integer quotients unrounded
    elsewhere. One shuffle for the cells; margins are cell-table
    aggregates (grid-sized, broadcast back)."""
    d = load(spark, sf_dir, "documents")
    cells = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("o"))
    rows_t = cells.groupBy("source").agg(
        F.sum("o").cast("bigint").alias("rt")
    )
    cols_t = cells.groupBy("lang").agg(F.sum("o").cast("bigint").alias("ct"))
    grand = cells.agg(F.sum("o").cast("bigint").alias("gt"))
    j = (
        cells.join(F.broadcast(rows_t), "source")
        .join(F.broadcast(cols_t), "lang")
        .crossJoin(F.broadcast(grand))
    )
    return j.select(
        "source",
        "lang",
        F.col("o").alias("observed"),
        F.expr(_CHI_E).alias("expected"),
        F.expr(
            f"(CAST(o AS DOUBLE) - {_CHI_E}) * (CAST(o AS DOUBLE) - {_CHI_E})"
            f" / {_CHI_E}"
        ).alias("contribution"),
    )


_MWU_FINAL = """
SELECT n1 AS n_view, n2 AS n_purchase,
       CAST(u2 AS DOUBLE) / 2 AS u_stat,
       (CAST(u2 AS DOUBLE) / 2 - CAST(n1 AS DOUBLE) * n2 / 2)
         / sqrt(CAST(n1 AS DOUBLE) * n2 / 12
                * ((n1 + n2 + 1)
                   - CAST(tsum AS DOUBLE)
                     / ((CAST(n1 AS DOUBLE) + n2)
                        * (CAST(n1 AS DOUBLE) + n2 - 1)))) AS z_stat
""".strip()


@query(
    "agg_mannwhitney_u",
    oracle=f"""
WITH rows_ AS (
  SELECT event_type AS grp, event_id,
         CAST(ROUND((value) * 100) AS BIGINT) AS c
  FROM events WHERE event_type IN ('view', 'purchase')
), numbered AS (
  SELECT grp, c,
         ROW_NUMBER() OVER (ORDER BY c, grp, event_id) AS rn
  FROM rows_
), vals AS (
  SELECT c, MIN(rn) AS mn, MAX(rn) AS mx, COUNT(*) AS t,
         CAST(SUM(CASE WHEN grp = 'view' THEN 1 ELSE 0 END) AS BIGINT)
           AS cnt_a
  FROM numbered GROUP BY c
), s AS (
  SELECT CAST(SUM(cnt_a * (mn + mx)) AS BIGINT) AS r1_2,
         CAST(SUM(cnt_a) AS BIGINT) AS n1,
         CAST(SUM(t - cnt_a) AS BIGINT) AS n2,
         CAST(SUM(t * t * t - t) AS BIGINT) AS tsum
  FROM vals
), u AS (
  SELECT n1, n2, tsum,
         2 * n1 * n2 + n1 * (n1 + 1) - r1_2 AS u2
  FROM s
)
{_MWU_FINAL}
FROM u
""",
)
def agg_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) — the nonparametric A/B
    test for when means mislead: compares 'view' vs 'purchase' value
    distributions by ranks. EXACT arithmetic throughout: global
    ranks come from the distributed row-number plan
    (plans/global_rank.py — range buckets + per-bucket offsets, NO
    single-partition window), tied ranks use the midrank identity
    avg_rank = (min_rn + max_rn)/2 kept as the INTEGER doubled rank
    sum r1_2 = sum(cnt_a * (mn + mx)), and the tie-corrected normal
    approximation z evaluates once from five exact BIGINTs with
    identical expression text on both engines — bit-exact, no
    rounding. The oracle replays the same ranks with a plain global
    window (intentionally naive single-task sort at scale; the
    engine path is the distributed one)."""
    from ..plans.global_rank import with_global_row_number

    ev = load(spark, sf_dir, "events")
    rows_ = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        F.col("event_type").alias("grp"),
        "event_id",
        F.expr(cents("value")).alias("c"),
    )
    numbered, _n = with_global_row_number(
        rows_, ["c", "grp", "event_id"], out_col="rn"
    )
    vals = numbered.groupBy("c").agg(
        F.min("rn").alias("mn"),
        F.max("rn").alias("mx"),
        F.count(F.lit(1)).alias("t"),
        F.sum(F.when(F.col("grp") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("cnt_a"),
    )
    s = vals.agg(
        F.sum(F.col("cnt_a") * (F.col("mn") + F.col("mx")))
        .cast("bigint")
        .alias("r1_2"),
        F.sum("cnt_a").cast("bigint").alias("n1"),
        F.sum(F.col("t") - F.col("cnt_a")).cast("bigint").alias("n2"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).cast("bigint").alias("tsum"),
    )
    u = s.select(
        "n1",
        "n2",
        "tsum",
        F.expr("2 * n1 * n2 + n1 * (n1 + 1) - r1_2").alias("u2"),
    )
    u.createOrReplaceTempView("mwu_u")
    return spark.sql(f"{_MWU_FINAL}\nFROM mwu_u")


@query(
    "agg_ks_test",
    oracle="""
WITH rows_ AS (
  SELECT event_type AS grp, CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type IN ('view', 'purchase')
), vals AS (
  SELECT c,
         CAST(SUM(CASE WHEN grp = 'view' THEN 1 ELSE 0 END) AS BIGINT)
           AS da,
         CAST(SUM(CASE WHEN grp = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS db
  FROM rows_ GROUP BY c
), cum AS (
  SELECT c,
         CAST(SUM(da) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS ca,
         CAST(SUM(db) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cb,
         CAST(SUM(da) OVER () AS BIGINT) AS n1,
         CAST(SUM(db) OVER () AS BIGINT) AS n2
  FROM vals
)
SELECT n1, n2,
       MAX(abs(CAST(ca AS DOUBLE) / n1 - CAST(cb AS DOUBLE) / n2))
         AS d_stat,
       MAX(abs(CAST(ca AS DOUBLE) / n1 - CAST(cb AS DOUBLE) / n2))
         * sqrt(CAST(n1 AS DOUBLE) * n2 / (CAST(n1 AS DOUBLE) + n2))
         AS ks_scaled
FROM cum GROUP BY n1, n2
""",
)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test ('view' vs 'purchase'
    value distributions): D = sup |ECDF_a - ECDF_b|, evaluated at
    every distinct pooled value, plus the sqrt(n1*n2/(n1+n2))-scaled
    statistic. The 100 TB shape: the fact stream collapses FIRST to
    per-distinct-value group counts (one shuffled agg; the distinct
    count is bounded by the VALUE DOMAIN — cents here, ~1e5 — not by
    corpus size), and the cumulative window runs over that tiny
    table, the same bounded-domain argument as survival_km's risk
    table. ECDF ratios are exact-integer quotients; D is a max of
    identical IEEE doubles — no rounding anywhere."""
    ev = load(spark, sf_dir, "events")
    rows_ = ev.filter(
        F.col("event_type").isin("view", "purchase")
    ).select(
        F.col("event_type").alias("grp"),
        F.expr(cents("value")).alias("c"),
    )
    vals = rows_.groupBy("c").agg(
        F.sum(F.when(F.col("grp") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("da"),
        F.sum(F.when(F.col("grp") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("db"),
    )
    # bounded: distinct integer cents of a bounded value domain
    w_cum = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # bounded: same distinct-cents domain
    w_all = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = vals.select(
        "c",
        F.sum("da").over(w_cum).alias("ca"),
        F.sum("db").over(w_cum).alias("cb"),
        F.sum("da").over(w_all).alias("n1"),
        F.sum("db").over(w_all).alias("n2"),
    )
    diff = F.abs(
        F.col("ca").cast("double") / F.col("n1")
        - F.col("cb").cast("double") / F.col("n2")
    )
    return (
        cum.groupBy("n1", "n2")
        .agg(F.max(diff).alias("d_stat"))
        .select(
            "n1",
            "n2",
            "d_stat",
            (
                F.col("d_stat")
                * F.sqrt(
                    F.col("n1").cast("double")
                    * F.col("n2")
                    / (F.col("n1").cast("double") + F.col("n2"))
                )
            ).alias("ks_scaled"),
        )
    )


@query(
    "agg_benford",
    oracle="""
WITH digits AS (
  SELECT CAST(floor(o_totalprice
               / power(10, floor(log10(o_totalprice)))) AS BIGINT)
           AS digit
  FROM orders WHERE o_totalprice > 0
), counts AS (
  SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit
), tot AS (
  SELECT digit, n, CAST(SUM(n) OVER () AS BIGINT) AS total FROM counts
)
SELECT digit, n,
       CAST(n AS DOUBLE) / total AS observed,
       log10(1 + 1.0 / digit) AS expected,
       (CAST(n AS DOUBLE) / total - log10(1 + 1.0 / digit))
         * (CAST(n AS DOUBLE) / total - log10(1 + 1.0 / digit))
         * total / log10(1 + 1.0 / digit) AS chi2_term
FROM tot
""",
)
def agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the
    fraud/data-quality screen auditors run over ledgers: observed
    leading-digit frequency vs log10(1 + 1/d), with per-digit
    chi-square contributions. The leading digit is extracted
    NUMERICALLY (x / 10^floor(log10 x)) with the identical
    expression in both engines, so any libm edge behaves the same on
    both sides; the fact table collapses to <= 9 rows before the
    tiny total window. All ratios exact-integer quotients."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = o.select(
        F.floor(
            F.col("o_totalprice")
            / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
        )
        .cast("bigint")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    # bounded: 9 leading digits
    w_all = Window.orderBy("digit").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tot = counts.select(
        "digit", "n", F.sum("n").over(w_all).alias("total")
    )
    obs = F.col("n").cast("double") / F.col("total")
    exp = F.log10(1 + 1.0 / F.col("digit"))
    return tot.select(
        "digit",
        "n",
        obs.alias("observed"),
        exp.alias("expected"),
        ((obs - exp) * (obs - exp) * F.col("total") / exp).alias(
            "chi2_term"
        ),
    )


@query(
    "agg_runs_test",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
), signs AS (
  SELECT day,
         CASE WHEN c > lag(c) OVER (ORDER BY day) THEN 1
              WHEN c < lag(c) OVER (ORDER BY day) THEN -1 END AS s
  FROM daily
), seq AS (
  SELECT s, lag(s) OVER (ORDER BY day) AS prev
  FROM signs WHERE s IS NOT NULL
), agg AS (
  SELECT CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND s <> prev
                      THEN 1 ELSE 0 END) AS BIGINT) AS runs
  FROM seq
)
SELECT n1, n2, runs,
       CAST(2 AS DOUBLE) * n1 * n2 / (n1 + n2) + 1 AS mu,
       (CAST(runs AS DOUBLE) - (CAST(2 AS DOUBLE) * n1 * n2 / (n1 + n2) + 1))
         / sqrt(CAST(2 AS DOUBLE) * n1 * n2 * (CAST(2 AS DOUBLE) * n1 * n2 - n1 - n2)
                / ((CAST(n1 + n2 AS DOUBLE)) * (n1 + n2)
                   * (n1 + n2 - 1))) AS z
FROM agg
""",
)
def agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on daily revenue moves — the
    randomness check that flags trending or oscillating series
    before a forecaster assumes i.i.d. noise: up/down signs of
    day-over-day deltas (flat days dropped), the observed run count,
    and the exact-moment normal z. Everything reduces on the tiny
    daily table; the final z is one shared-shape double expression
    over three exact integers."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr(cents("value"))).alias("c")
    )
    # bounded: O(days) daily rollup
    w = Window.orderBy("day")
    signs = daily.select(
        "day",
        F.when(F.col("c") > F.lag("c").over(w), 1)
        .when(F.col("c") < F.lag("c").over(w), -1)
        .alias("s"),
    ).filter(F.col("s").isNotNull())
    # bounded: O(days) daily rollup
    seq = signs.select("s", F.lag("s").over(Window.orderBy("day")).alias("prev"))
    agg = seq.agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("s") != F.col("prev")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("runs"),
    )
    agg.createOrReplaceTempView("runs_agg")
    return spark.sql(
        """
SELECT n1, n2, runs,
       CAST(2 AS DOUBLE) * n1 * n2 / (n1 + n2) + 1 AS mu,
       (CAST(runs AS DOUBLE) - (CAST(2 AS DOUBLE) * n1 * n2 / (n1 + n2) + 1))
         / sqrt(CAST(2 AS DOUBLE) * n1 * n2 * (CAST(2 AS DOUBLE) * n1 * n2 - n1 - n2)
                / ((CAST(n1 + n2 AS DOUBLE)) * (n1 + n2)
                   * (n1 + n2 - 1))) AS z
FROM runs_agg
"""
    )


@query(
    "agg_power_analysis",
    oracle="""
WITH m AS (
  SELECT o_orderpriority AS segment,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                  AS HUGEINT) * CAST(ROUND(o_totalprice * 100) AS BIGINT))
              AS VARCHAR) AS DOUBLE) AS ss
  FROM orders GROUP BY 1
)
SELECT segment, CAST(n AS BIGINT) AS n_orders,
       round(s / n / 100, 6) AS mean_value,
       round(sqrt((ss - s * s / n) / (n - 1)) / 100, 6) AS sd_value,
       CAST(ceil(2 * (1.959964 + 0.841621) * (1.959964 + 0.841621)
            * ((ss - s * s / n) / (n - 1))
            / ((0.05 * s / n) * (0.05 * s / n))) AS BIGINT)
         AS n_required_5pct_mde
FROM m
""",
)
def agg_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis per order segment: the required
    per-arm sample size for a 5% minimum detectable effect on mean
    order value at alpha=0.05 / power=0.8 — n = 2 (z_{a/2}+z_b)^2
    sigma^2 / delta^2, the sizing every A/B test starts from.
    Variance from the exact overflow-safe moment pair (the
    agg_cov_matrix discipline), z constants fixed literals, one
    closed-form expression identical in both engines; ceil() on an
    exact quotient keeps the integer output hash-stable."""
    o = load(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    dec = "DECIMAL(38,0)"
    m = o.groupBy(F.col("o_orderpriority").alias("segment")).agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
        F.expr(f"CAST(SUM({c}) AS DOUBLE)").alias("s"),
        F.expr(f"CAST(SUM(CAST({c} AS {dec}) * {c}) AS DOUBLE)").alias("ss"),
    )
    return m.select(
        "segment",
        F.expr("CAST(n AS BIGINT)").alias("n_orders"),
        F.expr("round(s / n / 100, 6)").alias("mean_value"),
        F.expr("round(sqrt((ss - s * s / n) / (n - 1)) / 100, 6)").alias(
            "sd_value"
        ),
        F.expr(
            "CAST(ceil(2 * (1.959964 + 0.841621) * (1.959964 + 0.841621)"
            " * ((ss - s * s / n) / (n - 1))"
            " / ((0.05 * s / n) * (0.05 * s / n))) AS BIGINT)"
        ).alias("n_required_5pct_mde"),
    )


@query(
    "agg_anova_oneway",
    oracle="""
WITH g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS ss
  FROM events GROUP BY event_type
), folds AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(SUM(s) AS BIGINT) AS s_total,
         list_sum(list(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n
                       ORDER BY event_type)) AS sum_sq_over_n,
         list_sum(list(CAST(ss AS DOUBLE)
                       ORDER BY event_type)) AS sum_ss
  FROM g
), m AS (
  SELECT k, n_total,
         sum_sq_over_n
           - CAST(s_total AS DOUBLE) * CAST(s_total AS DOUBLE) / n_total
           AS ssb,
         sum_ss - sum_sq_over_n AS ssw
  FROM folds
)
SELECT k, n_total,
       ssb / 10000 AS ss_between,
       ssw / 10000 AS ss_within,
       (ssb / (k - 1)) / (ssw / (n_total - k)) AS f_stat
FROM m
""",
)
def agg_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across event types — the k-group
    generalization completing the stats tier (Welch t, chi-square,
    Mann-Whitney, KS already shipped). Per-group moments (n, sum,
    sum-of-squares) are exact BIGINTs over integer cents (ss fits
    bigint up to ~4e9 rows at this value domain; beyond that the
    decimal(38) ladder of agg_corr_cov applies). The float stage —
    SSB = sum(s_g^2/n_g) - S^2/N, SSW = sum(ss_g) - sum(s_g^2/n_g) —
    folds the BOUNDED group table in event_type order via a strict
    left fold in both engines (Spark F.aggregate over a sorted
    array == DuckDB list_sum over ORDER BY list — bit-equal), so F
    needs no rounding. The data-sized pass is one partial+final
    aggregate; everything after runs on k rows."""
    ev = load(spark, sf_dir, "events")
    c = F.expr(cents("value"))
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(c).cast("bigint").alias("s"),
        F.sum(
            F.expr(
                f"{cents('value')} * {cents('value')}"
            )
        ).cast("bigint").alias("ss"),
    )
    terms = g.select(
        "event_type",
        "n",
        "s",
        "ss",
        (
            F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n")
        ).alias("t_sq_over_n"),
        F.col("ss").cast("double").alias("ss_d"),
    )
    folds = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.sum("s").cast("bigint").alias("s_total"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("event_type", "t_sq_over_n"))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["t_sq_over_n"],
        ).alias("sum_sq_over_n"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("event_type", "ss_d"))),
            F.lit(0.0),
            lambda acc, x: acc + x["ss_d"],
        ).alias("sum_ss"),
    )
    m = folds.select(
        "k",
        "n_total",
        (
            F.col("sum_sq_over_n")
            - F.col("s_total").cast("double")
            * F.col("s_total").cast("double")
            / F.col("n_total")
        ).alias("ssb"),
        (F.col("sum_ss") - F.col("sum_sq_over_n")).alias("ssw"),
    )
    return m.select(
        "k",
        "n_total",
        (F.col("ssb") / 10000).alias("ss_between"),
        (F.col("ssw") / 10000).alias("ss_within"),
        (
            (F.col("ssb") / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("n_total") - F.col("k")))
        ).alias("f_stat"),
    )


@query(
    "agg_kendall_tau",
    bounded_cross="bounded O(days^2) pair join",
    oracle="""
WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'click'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY 1
), p AS (
  SELECT CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
         CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
         CAST(SUM(CASE WHEN a.x = b.x AND a.y <> b.y
                       THEN 1 ELSE 0 END) AS BIGINT) AS ties_x,
         CAST(SUM(CASE WHEN a.y = b.y AND a.x <> b.x
                       THEN 1 ELSE 0 END) AS BIGINT) AS ties_y,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM d a JOIN d b ON a.day < b.day
)
SELECT concordant, discordant, ties_x, ties_y, n_pairs,
       CAST(concordant - discordant AS DOUBLE)
         / (sqrt(CAST(n_pairs - ties_x AS DOUBLE))
            * sqrt(CAST(n_pairs - ties_y AS DOUBLE))) AS tau_b
FROM p
""",
)
def agg_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between the daily purchase and
    click revenue series — the robust, outlier-immune companion to
    ts_rolling_xcorr's Pearson. Concordant/discordant/tied pair
    counts are exact integers from the O(days^2) pair join (bounded:
    the daily rollup, never raw events — ~250 pairs per fixture
    month; a year is ~66k pairs); tau-b is one float expression of
    exact integers with correctly-rounded sqrt — bit-identical, no
    rounding."""
    ev = load(spark, sf_dir, "events")
    c = F.expr("CAST(ROUND(value * 100) AS BIGINT)")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", c).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "click", c).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    a = d.select(
        F.col("day").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = d.select(
        F.col("day").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    pairs = a.join(F.broadcast(b), F.col("da") < F.col("db"))
    sgn = (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb"))
    p = pairs.agg(
        F.sum(F.when(sgn > 0, 1).otherwise(0)).cast("bigint").alias(
            "concordant"
        ),
        F.sum(F.when(sgn < 0, 1).otherwise(0)).cast("bigint").alias(
            "discordant"
        ),
        F.sum(
            F.when(
                (F.col("xa") == F.col("xb")) & (F.col("ya") != F.col("yb")), 1
            ).otherwise(0)
        ).cast("bigint").alias("ties_x"),
        F.sum(
            F.when(
                (F.col("ya") == F.col("yb")) & (F.col("xa") != F.col("xb")), 1
            ).otherwise(0)
        ).cast("bigint").alias("ties_y"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    return p.select(
        "concordant",
        "discordant",
        "ties_x",
        "ties_y",
        "n_pairs",
        (
            (F.col("concordant") - F.col("discordant")).cast("double")
            / (
                F.sqrt((F.col("n_pairs") - F.col("ties_x")).cast("double"))
                * F.sqrt((F.col("n_pairs") - F.col("ties_y")).cast("double"))
            )
        ).alias("tau_b"),
    )


@query(
    "agg_wilson_ci",
    oracle="""
WITH m AS (
  SELECT event_type AS segment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN CAST(round(value * 100) AS BIGINT) >= 24500
                       THEN 1 ELSE 0 END) AS BIGINT) AS x
  FROM events GROUP BY event_type
)
, raw AS (
SELECT segment, n, x,
       CAST(x AS DOUBLE) / n AS rate,
       ((CAST(x AS DOUBLE) / n)
          + CAST(3.8415 AS DOUBLE) / (2 * n)
          - CAST(1.96 AS DOUBLE)
            * sqrt((CAST(x AS DOUBLE) / n) * (1 - CAST(x AS DOUBLE) / n) / n
                   + CAST(3.8415 AS DOUBLE) / (4.0 * n * n)))
         / (1 + CAST(3.8415 AS DOUBLE) / n) AS wilson_lo_raw,
       ((CAST(x AS DOUBLE) / n)
          + CAST(3.8415 AS DOUBLE) / (2 * n)
          + CAST(1.96 AS DOUBLE)
            * sqrt((CAST(x AS DOUBLE) / n) * (1 - CAST(x AS DOUBLE) / n) / n
                   + CAST(3.8415 AS DOUBLE) / (4.0 * n * n)))
         / (1 + CAST(3.8415 AS DOUBLE) / n) AS wilson_hi_raw
FROM m
)
SELECT segment, n, x, rate,
       greatest(CAST(0 AS DOUBLE), wilson_lo_raw) AS wilson_lo,
       least(CAST(1 AS DOUBLE), wilson_hi_raw) AS wilson_hi
FROM raw
""",
)
def agg_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Wilson score interval for the high-value-event rate per
    segment — the binomial CI that behaves at small n and extreme
    rates (unlike the Wald interval every naive dashboard ships).
    z = 1.96 and z^2 = 3.8415 are embedded literals (CAST AS DOUBLE
    both engines — the SPRT lesson: DuckDB parses bare decimals as
    DECIMAL otherwise); counts are exact bigints and the interval is
    one closed-form float expression in identical order (sqrt
    correctly rounded) — bit-exact, no rounding; bounds clamp to
    [0, 1] in BOTH engines (the z vs z^2 literal pair is not an
    exact square, so the x=0 lower bound lands a few 1e-8 below
    zero before the clamp). One partial+final aggregate."""
    ev = load(spark, sf_dir, "events")
    m = ev.groupBy(F.col("event_type").alias("segment")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(F.expr(cents("value")) >= 24500, 1).otherwise(0)
        ).cast("bigint").alias("x"),
    )
    p = F.col("x").cast("double") / F.col("n")
    z2 = F.lit(3.8415)
    z = F.lit(1.96)
    half = z * F.sqrt(
        p * (1 - p) / F.col("n") + z2 / (4.0 * F.col("n") * F.col("n"))
    )
    center = p + z2 / (2 * F.col("n"))
    denom = 1 + z2 / F.col("n")
    return m.select(
        "segment",
        "n",
        "x",
        p.alias("rate"),
        F.greatest(F.lit(0.0), (center - half) / denom).alias("wilson_lo"),
        F.least(F.lit(1.0), (center + half) / denom).alias("wilson_hi"),
    )


@query(
    "agg_mcnemar_test",
    oracle="""
WITH s AS (
  SELECT CASE WHEN CAST(round(value * 100) AS BIGINT) >= 24500
              THEN 1 ELSE 0 END AS rater_a,
         CASE WHEN event_type IN ('purchase', 'click')
              THEN 1 ELSE 0 END AS rater_b
  FROM events
), m AS (
  SELECT CAST(SUM(CASE WHEN rater_a = 1 AND rater_b = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN rater_a = 0 AND rater_b = 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM s
)
SELECT b, c,
       CAST((b - c) * (b - c) AS DOUBLE) / CAST(b + c AS DOUBLE)
         AS mcnemar_chi2,
       CAST((b - c) * (b - c) AS DOUBLE) / CAST(b + c AS DOUBLE)
         > CAST(3.841 AS DOUBLE) AS reject_h0
FROM m
""",
)
def agg_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on the two weak labelers of agg_cohens_kappa:
    do they disagree SYMMETRICALLY (null) or is one systematically
    stricter? chi2 = (b - c)^2 / (b + c) over the discordant cell
    counts — exact integers into one double division; the verdict
    compares against the chi2(1) 5% critical value as an embedded
    double literal. Kappa says 'how much they agree'; McNemar says
    'whose errors are biased' — a labeler-audit needs both. One
    partial+final aggregate."""
    ev = load(spark, sf_dir, "events")
    s = ev.select(
        F.when(F.expr(cents("value")) >= 24500, 1).otherwise(0).alias(
            "rater_a"
        ),
        F.when(
            F.col("event_type").isin("purchase", "click"), 1
        ).otherwise(0).alias("rater_b"),
    )
    m = s.agg(
        F.sum(
            F.when((F.col("rater_a") == 1) & (F.col("rater_b") == 0), 1)
            .otherwise(0)
        ).cast("bigint").alias("b"),
        F.sum(
            F.when((F.col("rater_a") == 0) & (F.col("rater_b") == 1), 1)
            .otherwise(0)
        ).cast("bigint").alias("c"),
    )
    chi2 = (
        ((F.col("b") - F.col("c")) * (F.col("b") - F.col("c"))).cast("double")
        / (F.col("b") + F.col("c")).cast("double")
    )
    return m.select(
        "b", "c", chi2.alias("mcnemar_chi2"), (chi2 > 3.841).alias("reject_h0")
    )


@query(
    "agg_two_proportion_z",
    oracle="""
WITH arms AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
  FROM events
), m AS (
  SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT)
           AS x1,
         CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT)
           AS x2
  FROM arms
)
SELECT n1, x1, n2, x2,
       CAST(x1 AS DOUBLE) / n1 AS p1,
       CAST(x2 AS DOUBLE) / n2 AS p2,
       (CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
         / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                * (1 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                * (CAST(1 AS DOUBLE) / n1 + CAST(1 AS DOUBLE) / n2))
         AS z_stat,
       abs((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
           / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                  * (1 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                  * (CAST(1 AS DOUBLE) / n1 + CAST(1 AS DOUBLE) / n2)))
         > CAST(1.96 AS DOUBLE) AS reject_h0
FROM m
""",
)
def agg_two_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test between experiment arms — the
    conversion-rate significance readout (the discrete counterpart
    to agg_ttest_welch). Counts are exact bigints; p1, p2, the
    pooled variance, and z are one float expression in identical
    order (sqrt correctly rounded); the verdict compares |z| against
    1.96 as an embedded double. One partial+final aggregate over the
    assignment scan."""
    ev = load(spark, sf_dir, "events")
    arms = ev.select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "conv"
        ),
    )
    m = arms.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("arm") == "A", F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("x1"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        F.sum(F.when(F.col("arm") == "B", F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("x2"),
    )
    p1 = F.col("x1").cast("double") / F.col("n1")
    p2 = F.col("x2").cast("double") / F.col("n2")
    pp = (F.col("x1") + F.col("x2")).cast("double") / (
        F.col("n1") + F.col("n2")
    )
    z = (p1 - p2) / F.sqrt(
        pp
        * (1 - pp)
        * (
            F.lit(1.0) / F.col("n1")
            + F.lit(1.0) / F.col("n2")
        )
    )
    return m.select(
        "n1",
        "x1",
        "n2",
        "x2",
        p1.alias("p1"),
        p2.alias("p2"),
        z.alias("z_stat"),
        (F.abs(z) > 1.96).alias("reject_h0"),
    )


@query(
    "agg_ttest_paired",
    oracle="""
WITH halves AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN date_trunc('day', ts)
                            < TIMESTAMP '2024-01-16 00:00:00'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS pre_c,
         CAST(SUM(CASE WHEN date_trunc('day', ts)
                            >= TIMESTAMP '2024-01-16 00:00:00'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS post_c
  FROM events GROUP BY user_id
), d AS (
  SELECT post_c - pre_c AS diff FROM halves
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(diff) AS BIGINT) AS s,
         CAST(SUM(diff * diff) AS BIGINT) AS ss
  FROM d
)
SELECT n,
       CAST(s AS DOUBLE) / n / 100 AS mean_diff,
       (CAST(s AS DOUBLE) / n)
         / sqrt(((CAST(ss AS DOUBLE)
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1))
                / n) AS t_stat
FROM m
""",
)
def agg_ttest_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired t-test of per-user spend before vs after mid-month —
    each user is their own control (the within-subject design that
    kills between-user variance; agg_ttest_welch is the unpaired
    counterpart). Differences are exact integer cents; n, sum, and
    sum-of-squares are exact bigints; mean and t are one float
    expression in identical order (sqrt correctly rounded) —
    bit-exact. Two stacked aggregates, the second on user-sized
    data."""
    ev = load(spark, sf_dir, "events")
    c = F.expr("CAST(ROUND(value * 100) AS BIGINT)")
    pivot = "TIMESTAMP_NTZ'2024-01-16 00:00:00'"
    halves = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.expr(f"date_trunc('day', ts) < {pivot}"), c
            ).otherwise(0)
        ).cast("bigint").alias("pre_c"),
        F.sum(
            F.when(
                F.expr(f"date_trunc('day', ts) >= {pivot}"), c
            ).otherwise(0)
        ).cast("bigint").alias("post_c"),
    )
    d = halves.select((F.col("post_c") - F.col("pre_c")).alias("diff"))
    m = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("diff").cast("bigint").alias("s"),
        F.sum(F.col("diff") * F.col("diff")).cast("bigint").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    return m.select(
        "n",
        (mean / 100).alias("mean_diff"),
        (mean / F.sqrt(var / F.col("n"))).alias("t_stat"),
    )


@query(
    "agg_cochran_armitage",
    oracle="""
WITH g AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS dose,
         CAST(COUNT(*) AS BIGINT) AS n_i,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS x_i
  FROM orders GROUP BY 1
), m AS (
  SELECT CAST(SUM(n_i) AS BIGINT) AS n,
         CAST(SUM(x_i) AS BIGINT) AS x,
         CAST(SUM(dose * x_i) AS BIGINT) AS swx,
         CAST(SUM(dose * n_i) AS BIGINT) AS swn,
         CAST(SUM(dose * dose * n_i) AS BIGINT) AS swwn
  FROM g
)
SELECT n, x,
       CAST(n * swx - x * swn AS DOUBLE) AS num,
       (CAST(n AS DOUBLE) * (n * swx - x * swn)
          * (n * swx - x * swn))
         / (CAST(x AS DOUBLE) * (n - x)
            * (CAST(n AS DOUBLE) * swwn - CAST(swn AS DOUBLE) * swn))
         AS trend_chi2
FROM m
""",
)
def agg_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: does the finished-order rate
    move MONOTONICALLY with priority level (dose scores 1..5 from
    the priority prefix)? The ordered-groups test a plain chi-square
    can't express — chi2 asks 'any association', this asks 'a
    trend'. All five moments are exact bigints; the statistic is one
    float expression of those integers in identical order. The
    integer products stay under 2^63 for n up to ~4e8 rows at dose
    <= 9 (beyond: the decimal ladder). One partial+final aggregate
    over the orders scan plus a 5-row reduction."""
    o = load(spark, sf_dir, "orders")
    g = o.groupBy(
        F.expr("CAST(substr(o_orderpriority, 1, 1) AS BIGINT)").alias(
            "dose"
        )
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum(
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
        ).cast("bigint").alias("x_i"),
    )
    m = g.agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("x_i").cast("bigint").alias("x"),
        F.sum(F.col("dose") * F.col("x_i")).cast("bigint").alias("swx"),
        F.sum(F.col("dose") * F.col("n_i")).cast("bigint").alias("swn"),
        F.sum(F.col("dose") * F.col("dose") * F.col("n_i"))
        .cast("bigint")
        .alias("swwn"),
    )
    num_i = F.col("n") * F.col("swx") - F.col("x") * F.col("swn")
    return m.select(
        "n",
        "x",
        num_i.cast("double").alias("num"),
        (
            (F.col("n").cast("double") * num_i * num_i)
            / (
                F.col("x").cast("double")
                * (F.col("n") - F.col("x"))
                * (
                    F.col("n").cast("double") * F.col("swwn")
                    - F.col("swn").cast("double") * F.col("swn")
                )
            )
        ).alias("trend_chi2"),
    )


@query(
    "agg_spearman_rho",
    oracle="""
WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'click'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY 1
), rx AS (
  SELECT day, x, y,
         CAST(2 * COUNT(*) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              + COUNT(*) OVER (PARTITION BY x) + 1 AS BIGINT) AS rx2
  FROM d
), rxy AS (
  SELECT day, rx2,
         CAST(2 * COUNT(*) OVER (ORDER BY y
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              + COUNT(*) OVER (PARTITION BY y) + 1 AS BIGINT) AS ry2
  FROM rx
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rx2) AS BIGINT) AS sx,
         CAST(SUM(ry2) AS BIGINT) AS sy,
         CAST(SUM(rx2 * ry2) AS BIGINT) AS sxy,
         CAST(SUM(rx2 * rx2) AS BIGINT) AS sxx,
         CAST(SUM(ry2 * ry2) AS BIGINT) AS syy
  FROM rxy
)
SELECT n,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS spearman_rho
FROM m
""",
)
def agg_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Spearman rank correlation between the daily
    purchase and click revenue series — completes the correlation
    trio (Pearson: ts_rolling_xcorr; Kendall: agg_kendall_tau).
    Implemented as Pearson over DOUBLED midranks so the midrank .5s
    become exact integers: 2*midrank = 2*count_less + count_eq + 1,
    computed from one prefix window + one peer-count window per
    axis over the BOUNDED daily table. The moment sums are exact
    bigints; rho is one float expression with correctly-rounded
    sqrt — bit-exact, no rounding (scaling both rank vectors by 2
    leaves Pearson unchanged)."""
    ev = load(spark, sf_dir, "events")
    c = F.expr("CAST(ROUND(value * 100) AS BIGINT)")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", c).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "click", c).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    # bounded: one row per calendar day of the fixture span
    wx = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    px = Window.partitionBy("x")
    rx = d.withColumn(
        "rx2",
        (
            2 * F.coalesce(F.count(F.lit(1)).over(wx), F.lit(0))
            + F.count(F.lit(1)).over(px)
            + 1
        ).cast("bigint"),
    )
    # bounded: one row per calendar day of the fixture span
    wy = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, -1)
    py = Window.partitionBy("y")
    rxy = rx.withColumn(
        "ry2",
        (
            2 * F.coalesce(F.count(F.lit(1)).over(wy), F.lit(0))
            + F.count(F.lit(1)).over(py)
            + 1
        ).cast("bigint"),
    )
    m = rxy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("rx2").cast("bigint").alias("sx"),
        F.sum("ry2").cast("bigint").alias("sy"),
        F.sum(F.col("rx2") * F.col("ry2")).cast("bigint").alias("sxy"),
        F.sum(F.col("rx2") * F.col("rx2")).cast("bigint").alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).cast("bigint").alias("syy"),
    )
    return m.select(
        "n",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (
                F.sqrt(
                    (
                        F.col("n") * F.col("sxx")
                        - F.col("sx") * F.col("sx")
                    ).cast("double")
                )
                * F.sqrt(
                    (
                        F.col("n") * F.col("syy")
                        - F.col("sy") * F.col("sy")
                    ).cast("double")
                )
            )
        ).alias("spearman_rho"),
    )


@query(
    "agg_levene_bf",
    oracle=f"""
WITH t AS (
  SELECT event_type, {cents('value')} AS c, event_id,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY {cents('value')}, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
), med AS (
  SELECT event_type, MAX(CASE WHEN rn = (n + 1) // 2 THEN c END) AS med_c
  FROM t GROUP BY event_type
), z AS (
  SELECT t.event_type, abs(t.c - med.med_c) AS zc
  FROM t JOIN med USING (event_type)
), g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(zc) AS BIGINT) AS s,
         CAST(SUM(zc * zc) AS BIGINT) AS ss
  FROM z GROUP BY event_type
), folds AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(SUM(s) AS BIGINT) AS s_total,
         list_sum(list(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n
                       ORDER BY event_type)) AS sum_sq_over_n,
         list_sum(list(CAST(ss AS DOUBLE)
                       ORDER BY event_type)) AS sum_ss
  FROM g
), m AS (
  SELECT k, n_total,
         sum_sq_over_n
           - CAST(s_total AS DOUBLE) * CAST(s_total AS DOUBLE) / n_total
           AS ssb,
         sum_ss - sum_sq_over_n AS ssw
  FROM folds
)
SELECT k, n_total,
       (ssb / (k - 1)) / (ssw / (n_total - k)) AS w_stat
FROM m
""",
)
def agg_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe Levene test: are the event-value VARIANCES
    homogeneous across event types? (The precondition check ANOVA
    itself assumes — BF is the robust variant scoring absolute
    deviations from the group MEDIAN, not the mean.) The group
    median uses the shared rank formulation (lower median at rank
    (n+1) div 2 over (cents, event_id) order — never the two
    engines' divergent quantile builtins); deviations are exact
    integer cents, so the per-group moments (n, sum z, sum z^2) are
    exact BIGINTs, and the one-way-ANOVA F over them reuses the
    agg_anova_oneway bounded-k sorted-fold discipline — the only
    floats are the k-row fold and the final ratio, bit-equal by
    strict-left-fold parity. One exchange on event_type serves the
    ranking window, the median join (broadcast, k rows), and the
    moment aggregate."""
    ev = load(spark, sf_dir, "events")
    c = F.expr(cents("value"))
    w_rank = Window.partitionBy("event_type").orderBy(c, "event_id")
    w_all = Window.partitionBy("event_type")
    t = ev.select(
        "event_type",
        c.alias("c"),
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    med = t.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.floor((F.col("n") + 1) / 2), F.col("c"))
        ).alias("med_c")
    )
    z = t.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("c") - F.col("med_c")).alias("zc")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("zc").cast("bigint").alias("s"),
        F.sum(F.col("zc") * F.col("zc")).cast("bigint").alias("ss"),
    )
    folds = g.select(
        "event_type",
        "n",
        "s",
        "ss",
        (
            F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
        ).alias("t_sq_over_n"),
        F.col("ss").cast("double").alias("ss_d"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.sum("s").cast("bigint").alias("s_total"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("event_type", "t_sq_over_n"))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["t_sq_over_n"],
        ).alias("sum_sq_over_n"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("event_type", "ss_d"))),
            F.lit(0.0),
            lambda acc, x: acc + x["ss_d"],
        ).alias("sum_ss"),
    )
    m = folds.select(
        "k",
        "n_total",
        (
            F.col("sum_sq_over_n")
            - F.col("s_total").cast("double")
            * F.col("s_total").cast("double")
            / F.col("n_total")
        ).alias("ssb"),
        (F.col("sum_ss") - F.col("sum_sq_over_n")).alias("ssw"),
    )
    return m.select(
        "k",
        "n_total",
        (
            (F.col("ssb") / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("n_total") - F.col("k")))
        ).alias("w_stat"),
    )


@query(
    "agg_srm_check",
    oracle="""
WITH seg AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_a,
         CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_b
  FROM events GROUP BY event_type
)
SELECT event_type, n_a, n_b,
       CAST(n_a - n_b AS DOUBLE) * (n_a - n_b) / (n_a + n_b) AS chi2_1df,
       CAST(n_a - n_b AS DOUBLE) * (n_a - n_b) / (n_a + n_b) > 3.841459
         AS srm_flag
FROM seg
""",
)
def agg_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check, the first gate of any experiment
    readout: under the 50/50 user_id-parity assignment every
    segment's arm counts should be binomially balanced, and the
    1-df chi-square against the expected half-split reduces to
    (n_a - n_b)^2 / N exactly — integer counts, ONE division, and a
    flag at the 0.05 critical value (3.841). Run PER SEGMENT
    (event_type) because aggregate balance can hide segment-level
    assignment bugs (a client that drops arm-B events only for one
    event class). One partial+final aggregate; k rows out."""
    ev = load(spark, sf_dir, "events")
    seg = ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    chi2 = (
        (F.col("n_a") - F.col("n_b")).cast("double")
        * (F.col("n_a") - F.col("n_b"))
        / (F.col("n_a") + F.col("n_b"))
    )
    return seg.select(
        "event_type",
        "n_a",
        "n_b",
        chi2.alias("chi2_1df"),
        (chi2 > 3.841459).alias("srm_flag"),
    )


_TOST_EXPR = (
    "(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2) / 100"
)
_TOST_SE = (
    "sqrt(((CAST(ss1 AS DOUBLE)"
    " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1) / (n1 - 1) / n1"
    " + (CAST(ss2 AS DOUBLE)"
    " - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2) / (n2 - 1) / n2)"
    ") / 100"
)


@query(
    "agg_tost_equivalence",
    oracle=f"""
WITH arms AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), m AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS ss
  FROM arms GROUP BY arm
), w AS (
  SELECT
    MAX(CASE WHEN arm = 'A' THEN n END) AS n1,
    MAX(CASE WHEN arm = 'A' THEN s END) AS s1,
    MAX(CASE WHEN arm = 'A' THEN ss END) AS ss1,
    MAX(CASE WHEN arm = 'B' THEN n END) AS n2,
    MAX(CASE WHEN arm = 'B' THEN s END) AS s2,
    MAX(CASE WHEN arm = 'B' THEN ss END) AS ss2
  FROM m
)
SELECT n1, n2,
       {_TOST_EXPR} AS mean_diff,
       {_TOST_SE} AS se_diff,
       (({_TOST_EXPR}) + 2.0) / ({_TOST_SE}) AS z_lower,
       (2.0 - ({_TOST_EXPR})) / ({_TOST_SE}) AS z_upper,
       (({_TOST_EXPR}) + 2.0) / ({_TOST_SE}) > 1.644854
         AND (2.0 - ({_TOST_EXPR})) / ({_TOST_SE}) > 1.644854
         AS equivalent
FROM w
""",
)
def agg_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST (two one-sided tests) equivalence between experiment
    arms — the test you need when the goal is to SHOW NO EFFECT
    (a refactor, an infra migration): both H0s 'diff <= -2.0' and
    'diff >= +2.0' (dollars) must be rejected at alpha=0.05, i.e.
    both z statistics above 1.645. A non-significant Welch t is NOT
    evidence of equivalence; TOST is, which is why it sits beside
    agg_ttest_welch in the inventory. Per-arm moments are exact
    bigints (cents discipline); the Welch unpooled SE, the two z's
    and the flag are ONE float expression whose text is shared
    verbatim between the Spark plan and the oracle, pinning IEEE
    evaluation order. One partial+final aggregate + a 2-row pivot."""
    ev = load(spark, sf_dir, "events")
    arms = ev.select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
        F.expr(cents("value")).alias("c"),
    )
    m = arms.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ss"),
    )
    w = m.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == "A", F.col("s"))).alias("s1"),
        F.max(F.when(F.col("arm") == "A", F.col("ss"))).alias("ss1"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("arm") == "B", F.col("s"))).alias("s2"),
        F.max(F.when(F.col("arm") == "B", F.col("ss"))).alias("ss2"),
    )
    return w.select(
        "n1",
        "n2",
        F.expr(_TOST_EXPR).alias("mean_diff"),
        F.expr(_TOST_SE).alias("se_diff"),
        F.expr(f"(({_TOST_EXPR}) + 2.0) / ({_TOST_SE})").alias("z_lower"),
        F.expr(f"(2.0 - ({_TOST_EXPR})) / ({_TOST_SE})").alias("z_upper"),
        F.expr(
            f"(({_TOST_EXPR}) + 2.0) / ({_TOST_SE}) > 1.644854"
            f" AND (2.0 - ({_TOST_EXPR})) / ({_TOST_SE}) > 1.644854"
        ).alias("equivalent"),
    )


@query(
    "agg_mantel_haenszel",
    oracle=f"""
WITH cells AS (
  SELECT o_orderpriority AS pr,
         CAST(SUM(CASE WHEN o_custkey % 2 = 0 AND o_orderstatus = 'F'
                       THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN o_custkey % 2 = 0 AND o_orderstatus <> 'F'
                       THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN o_custkey % 2 = 1 AND o_orderstatus = 'F'
                       THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN o_custkey % 2 = 1 AND o_orderstatus <> 'F'
                       THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM orders GROUP BY o_orderpriority
), piv AS (
  SELECT {_mh_pivot_sql()} FROM cells
)
SELECT CAST(5 AS INT) AS n_strata,
       {_MH_R} AS sum_r,
       {_MH_S} AS sum_s,
       ({_MH_R}) / ({_MH_S}) AS or_mh
FROM piv
""",
)
def agg_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel pooled odds ratio across strata — the
    confounder-adjusted 2x2 estimate (here: customer-parity exposure
    vs finished-order outcome, stratified by the five order
    priorities), the epidemiology/experimentation standard when a
    crude pooled table would Simpson's-paradox you. Per-stratum cell
    counts are one partial+final integer aggregate; the five known
    priority strata pivot into NAMED columns so the R = sum(a_i
    d_i/n_i) and S = sum(b_i c_i/n_i) float sums are written out
    term by term in one fixed-order expression shared verbatim with
    the oracle — the agg_ljungbox/TOST determinism recipe, here
    applied to a cross-stratum reduction that a data-ordered SUM()
    could never hash-match. Output: one row, OR_MH = R/S."""
    o = load(spark, sf_dir, "orders")
    exposed = F.col("o_custkey") % 2 == 0
    outcome = F.col("o_orderstatus") == "F"
    cells = o.groupBy(F.col("o_orderpriority").alias("pr")).agg(
        F.sum(F.when(exposed & outcome, 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when(exposed & ~outcome, 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when(~exposed & outcome, 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when(~exposed & ~outcome, 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    piv_cols = []
    for i, pr in enumerate(_MH_PRIOS, start=1):
        for letter in "abcd":
            piv_cols.append(
                F.max(
                    F.when(F.col("pr") == pr, F.col(letter))
                )
                .cast("bigint")
                .alias(f"{letter}{i}")
            )
    piv = cells.agg(*piv_cols)
    return piv.select(
        F.lit(5).cast("int").alias("n_strata"),
        F.expr(_MH_R).alias("sum_r"),
        F.expr(_MH_S).alias("sum_s"),
        F.expr(f"({_MH_R}) / ({_MH_S})").alias("or_mh"),
    )


_A2 = _a2_exprs()


@query(
    "agg_anova_twoway",
    bounded_cross="1-row broadcast scalar (ssq grand-total row)",
    oracle=f"""
WITH cells AS (
  SELECT o_custkey % 2 AS par, o_orderpriority AS pr,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS s
  FROM orders GROUP BY 1, 2
), ssq_t AS (
  SELECT CAST(CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                            AS HUGEINT)
                       * CAST(ROUND(o_totalprice * 100) AS BIGINT))
              AS VARCHAR) AS DOUBLE) AS ssq
  FROM orders
), piv AS (
  SELECT {_a2_pivot_sql()}, (SELECT ssq FROM ssq_t) AS ssq FROM cells
)
SELECT CAST({_A2['n_total']} AS BIGINT) AS n_total,
       ({_A2['ss_a']}) / 10000 AS ss_parity,
       ({_A2['ss_b']}) / 10000 AS ss_priority,
       ({_A2['ss_cells']}) / 10000 AS ss_cells,
       (({_A2['ss_cells']}) - ({_A2['ss_a']}) - ({_A2['ss_b']}))
         / 10000 AS ss_interaction,
       (({_A2['ss_total']}) - ({_A2['ss_cells']})) / 10000 AS ss_within,
       ({_A2['ss_total']}) / 10000 AS ss_total,
       ({_A2['ss_cells']}) / ({_A2['ss_total']}) AS eta2_cells
FROM piv
""",
)
def agg_anova_twoway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way ANOVA decomposition of order value over customer
    parity x order priority: marginal sums of squares for each
    factor, the 10-cell between-cells SS, their interaction
    remainder, and the within-cell residual — the experiment-
    design readout one factor at a time cannot give ('does the
    priority effect differ by arm'). All cell counts and sums are
    exact integers (the value squares ride the ts_acf
    decimal(38)/HUGEINT-via-VARCHAR discipline since sum(c^2)
    exceeds 2^63 at sf0.1); the ten cells pivot into NAMED columns
    and every SS is ONE fixed-order float expression shared
    verbatim with the oracle. Unbalanced-design caveat documented:
    with unequal cell sizes the marginal SS are Type-I-style
    descriptive components, so ss_interaction is the cells-minus-
    marginals remainder (can go negative under imbalance) — the
    property test pins the balanced case where the decomposition
    is exact."""
    o = load(spark, sf_dir, "orders")
    cells = o.groupBy(
        (F.col("o_custkey") % 2).alias("par"),
        F.col("o_orderpriority").alias("pr"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("s"),
    )
    piv_cols = []
    for p, r in _a2_cells():
        piv_cols.append(
            F.max(
                F.when(
                    (F.col("par") == p) & (F.col("pr") == _A2_PRIOS[r]),
                    F.col("n"),
                )
            )
            .cast("bigint")
            .alias(f"n{p}{r}")
        )
        piv_cols.append(
            F.max(
                F.when(
                    (F.col("par") == p) & (F.col("pr") == _A2_PRIOS[r]),
                    F.col("s"),
                )
            )
            .cast("bigint")
            .alias(f"s{p}{r}")
        )
    ssq = o.agg(
        F.sum(
            F.expr(cents("o_totalprice")).cast("decimal(38,0)")
            * F.expr(cents("o_totalprice"))
        )
        .cast("double")
        .alias("ssq")
    )
    piv = cells.agg(*piv_cols).crossJoin(F.broadcast(ssq))
    return piv.select(
        F.expr(f"CAST({_A2['n_total']} AS BIGINT)").alias("n_total"),
        F.expr(f"({_A2['ss_a']}) / 10000").alias("ss_parity"),
        F.expr(f"({_A2['ss_b']}) / 10000").alias("ss_priority"),
        F.expr(f"({_A2['ss_cells']}) / 10000").alias("ss_cells"),
        F.expr(
            f"(({_A2['ss_cells']}) - ({_A2['ss_a']}) - ({_A2['ss_b']}))"
            " / 10000"
        ).alias("ss_interaction"),
        F.expr(
            f"(({_A2['ss_total']}) - ({_A2['ss_cells']})) / 10000"
        ).alias("ss_within"),
        F.expr(f"({_A2['ss_total']}) / 10000").alias("ss_total"),
        F.expr(f"({_A2['ss_cells']}) / ({_A2['ss_total']})").alias(
            "eta2_cells"
        ),
    )


@query(
    "agg_mde_curve",
    bounded_cross="5-row planning grid crossed with the 1-row variance scalar",
    oracle="""
WITH m AS (
  SELECT o_orderpriority AS segment,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
           AS s,
         CAST(CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                  AS HUGEINT) * CAST(ROUND(o_totalprice * 100) AS BIGINT))
              AS VARCHAR) AS DOUBLE) AS ss
  FROM orders GROUP BY 1
), grid AS (
  SELECT unnest([1000, 5000, 10000, 50000, 100000]) AS n_per_arm
)
SELECT segment, n_per_arm,
       round(sqrt(2 * ((ss - s * s / n) / (n - 1)) / n_per_arm)
             * (1.959964 + 0.841621) / 100, 6) AS mde_abs,
       round(sqrt(2 * ((ss - s * s / n) / (n - 1)) / n_per_arm)
             * (1.959964 + 0.841621) / (s / n), 6) AS mde_rel
FROM m, grid
""",
)
def agg_mde_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-detectable-effect curve per order segment: for a grid
    of per-arm sample sizes, the smallest mean shift an alpha=0.05 /
    power=0.8 test can detect — mde = (z_a/2 + z_b) * sqrt(2
    sigma^2 / n) — the 'how long must this test run' planning table
    that inverts agg_power_analysis (same closed form, same fixed z
    literals, no normal CDF ever evaluated at query time). Variance
    from the exact overflow-safe moment pair; 5 segments x 5 grid
    rows out, one fixed float expression each."""
    o = load(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    dec = "DECIMAL(38,0)"
    m = o.groupBy(F.col("o_orderpriority").alias("segment")).agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
        F.expr(f"CAST(SUM({c}) AS DOUBLE)").alias("s"),
        F.expr(f"CAST(SUM(CAST({c} AS {dec}) * {c}) AS DOUBLE)").alias(
            "ss"
        ),
    )
    grid = spark.createDataFrame(
        [(1000,), (5000,), (10000,), (50000,), (100000,)],
        "n_per_arm bigint",
    )
    return m.crossJoin(F.broadcast(grid)).select(
        "segment",
        "n_per_arm",
        F.expr(
            "round(sqrt(2 * ((ss - s * s / n) / (n - 1)) / n_per_arm)"
            " * (1.959964 + 0.841621) / 100, 6)"
        ).alias("mde_abs"),
        F.expr(
            "round(sqrt(2 * ((ss - s * s / n) / (n - 1)) / n_per_arm)"
            " * (1.959964 + 0.841621) / (s / n), 6)"
        ).alias("mde_rel"),
    )


# chi-square upper 5% critical points (public distribution tables)
_CHI2_CRIT_4DF = 9.487729036781154

_KW_FINAL = """, m AS (
  SELECT k, n_total, tsum,
         CAST(12 AS DOUBLE) * hsum
           / (CAST(n_total AS DOUBLE) * CAST(n_total + 1 AS DOUBLE))
           - CAST(3 AS DOUBLE) * CAST(n_total + 1 AS DOUBLE) AS h,
         CAST(1 AS DOUBLE) - CAST(tsum AS DOUBLE)
           / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
              * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)) AS c
  FROM kw_s
)
SELECT k, n_total AS n, h, h / c AS h_corrected,
       h / c > CAST(9.487729036781154 AS DOUBLE) AS significant
FROM m"""


@query(
    "agg_kruskal_wallis",
    bounded_cross="1-row tie-totals scalar crossed onto the 1-row group fold",
    oracle=f"""
WITH rows_ AS (
  SELECT event_type AS grp, event_id,
         CAST(ROUND((value) * 100) AS BIGINT) AS c
  FROM events
), numbered AS (
  SELECT grp, c,
         ROW_NUMBER() OVER (ORDER BY c, grp, event_id) AS rn
  FROM rows_
), vals AS (
  SELECT c, MIN(rn) AS mn, MAX(rn) AS mx, CAST(COUNT(*) AS BIGINT) AS t
  FROM numbered GROUP BY c
), cg AS (
  SELECT c, grp, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM numbered GROUP BY c, grp
), per_g AS (
  SELECT g.grp,
         CAST(SUM(g.cnt * (v.mn + v.mx)) AS BIGINT) AS r2,
         CAST(SUM(g.cnt) AS BIGINT) AS n
  FROM cg g JOIN vals v USING (c) GROUP BY g.grp
), gfold AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS n_total,
         list_sum(list(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE) / (4 * n)
                       ORDER BY grp)) AS hsum
  FROM per_g
), ties AS (
  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tsum FROM vals
), kw_s AS (
  SELECT k, n_total, hsum, tsum FROM gfold, ties
){_KW_FINAL}
""",
)
def agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H — the k-group rank test completing the
    nonparametric tier (Mann-Whitney is its 2-group case): does
    event value differ across the five event types? Same exactness
    recipe as agg_mannwhitney_u: global midranks from the
    distributed row-number plan (plans/global_rank.py, no
    single-partition window), doubled rank sums r2_g =
    sum(cnt * (mn + mx)) kept as exact BIGINTs, the k-bounded group
    fold sum(r2_g^2 / (4 n_g)) in event_type order (Spark
    F.aggregate over a sorted array == DuckDB list_sum over an
    ORDER BY list), and H / tie-corrected H evaluated once from
    exact integers with identical expression text — bit-exact, no
    rounding. Significance vs the public chi-square(4) 5% critical
    point, embedded as the same literal in both engines."""
    from ..plans.global_rank import with_global_row_number

    ev = load(spark, sf_dir, "events")
    rows_ = ev.select(
        F.col("event_type").alias("grp"),
        "event_id",
        F.expr(cents("value")).alias("c"),
    )
    numbered, _n = with_global_row_number(
        rows_, ["c", "grp", "event_id"], out_col="rn"
    )
    vals = numbered.groupBy("c").agg(
        F.min("rn").alias("mn"),
        F.max("rn").alias("mx"),
        F.count(F.lit(1)).cast("bigint").alias("t"),
    )
    cg = numbered.groupBy("c", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    per_g = (
        cg.join(vals, "c")
        .groupBy("grp")
        .agg(
            F.sum(F.col("cnt") * (F.col("mn") + F.col("mx")))
            .cast("bigint")
            .alias("r2"),
            F.sum("cnt").cast("bigint").alias("n"),
        )
    )
    terms = per_g.select(
        "grp",
        "n",
        (
            F.col("r2").cast("double")
            * F.col("r2").cast("double")
            / (4 * F.col("n"))
        ).alias("term"),
    )
    gfold = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("grp", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("hsum"),
    )
    ties = vals.agg(
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).cast("bigint").alias("tsum")
    )
    kw_s = gfold.crossJoin(F.broadcast(ties))
    kw_s.createOrReplaceTempView("kw_s")
    return spark.sql(f"WITH kw_s AS (SELECT * FROM kw_s){_KW_FINAL}")


@query(
    "agg_friedman_test",
    oracle="""
WITH cell AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS blk, event_type AS trt,
         CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), complete AS (
  SELECT blk FROM cell GROUP BY blk HAVING COUNT(DISTINCT trt) = 5
), r AS (
  SELECT c.blk, c.trt, c.c,
         ROW_NUMBER() OVER (PARTITION BY c.blk
                            ORDER BY c.c, c.trt) AS rn
  FROM cell c JOIN complete USING (blk)
), mr AS (
  SELECT blk, c, MIN(rn) AS mn, MAX(rn) AS mx FROM r GROUP BY blk, c
), r2g AS (
  SELECT r.trt, CAST(SUM(m.mn + m.mx) AS BIGINT) AS r2
  FROM r JOIN mr m ON m.blk = r.blk AND m.c = r.c
  GROUP BY r.trt
), s AS (
  SELECT CAST(SUM(r2 * r2) AS BIGINT) AS fsum,
         CAST(COUNT(*) AS BIGINT) AS k,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM complete) AS b
  FROM r2g
)
SELECT b AS n_blocks, k,
       CAST(12 AS DOUBLE) * (CAST(fsum AS DOUBLE) / 4)
         / (CAST(b AS DOUBLE) * CAST(k AS DOUBLE) * CAST(k + 1 AS DOUBLE))
         - CAST(3 AS DOUBLE) * CAST(b AS DOUBLE) * CAST(k + 1 AS DOUBLE)
         AS q,
       CAST(12 AS DOUBLE) * (CAST(fsum AS DOUBLE) / 4)
         / (CAST(b AS DOUBLE) * CAST(k AS DOUBLE) * CAST(k + 1 AS DOUBLE))
         - CAST(3 AS DOUBLE) * CAST(b AS DOUBLE) * CAST(k + 1 AS DOUBLE)
         > CAST(9.487729036781154 AS DOUBLE) AS significant
FROM s
""",
)
def agg_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test — the repeated-measures rank test: do the five
    event types differ in daily revenue when each calendar DAY is
    its own block (controls for day-level shocks the way a paired
    test controls for subjects)? Within-block midranks use the same
    doubled-rank identity as agg_mannwhitney_u (mn + mx per tied
    value, exact BIGINT); the per-treatment doubled rank sums r2_j
    are tiny bounded integers, so sum(r2_j^2) is an exact BIGINT and
    Q evaluates once from exact integers with identical expression
    text — bit-exact. Only complete blocks (all 5 treatments
    present) enter, per the classical design. The within-block rank
    window partitions by day — bounded at 5 rows per partition.
    Significance vs the chi-square(4) 5% point (public tables)."""
    ev = load(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.date_trunc("day", "ts").alias("blk"),
        F.col("event_type").alias("trt"),
    ).agg(F.sum(F.expr(cents("value"))).cast("bigint").alias("c"))
    complete = (
        cell.groupBy("blk")
        .agg(F.countDistinct("trt").alias("nt"))
        .filter(F.col("nt") == 5)
        .select("blk")
    )
    # bounded: 5 treatment rows per day-block partition
    w = Window.partitionBy("blk").orderBy("c", "trt")
    r = cell.join(complete, "blk").withColumn("rn", F.row_number().over(w))
    mr = r.groupBy("blk", "c").agg(
        F.min("rn").alias("mn"), F.max("rn").alias("mx")
    )
    r2g = (
        r.join(mr, ["blk", "c"])
        .groupBy("trt")
        .agg(F.sum(F.col("mn") + F.col("mx")).cast("bigint").alias("r2"))
    )
    b = complete.count()
    s = r2g.agg(
        F.sum(F.col("r2") * F.col("r2")).cast("bigint").alias("fsum"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    ).withColumn("b", F.lit(b).cast("bigint"))
    q = (
        F.lit(12).cast("double")
        * (F.col("fsum").cast("double") / 4)
        / (
            F.col("b").cast("double")
            * F.col("k").cast("double")
            * (F.col("k") + 1).cast("double")
        )
        - F.lit(3).cast("double")
        * F.col("b").cast("double")
        * (F.col("k") + 1).cast("double")
    )
    return s.select(
        F.col("b").alias("n_blocks"),
        "k",
        q.alias("q"),
        (q > F.lit(9.487729036781154).cast("double")).alias("significant"),
    )


@query(
    "agg_moods_median",
    bounded_cross="1-row global-median scalar onto the 10-cell table",
    oracle="""
WITH rows_ AS (
  SELECT event_type AS grp, event_id,
         CAST(ROUND((value) * 100) AS BIGINT) AS c
  FROM events
), numbered AS (
  SELECT grp, c, ROW_NUMBER() OVER (ORDER BY c, grp, event_id) AS rn
  FROM rows_
), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rows_),
med AS (
  SELECT c AS mc FROM numbered, tot WHERE rn = (n + 1) // 2
), cells AS (
  SELECT grp, CASE WHEN c > (SELECT mc FROM med) THEN 1 ELSE 0 END AS above,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM rows_ GROUP BY 1, 2
), margins AS (
  SELECT c.grp, c.above, c.o,
         SUM(c.o) OVER (PARTITION BY c.grp) AS rowt,
         SUM(c.o) OVER (PARTITION BY c.above) AS colt
  FROM cells c
), chi AS (
  SELECT list_sum(list(
           (CAST(o AS DOUBLE)
            - CAST(rowt AS DOUBLE) * CAST(colt AS DOUBLE) / n)
           * (CAST(o AS DOUBLE)
              - CAST(rowt AS DOUBLE) * CAST(colt AS DOUBLE) / n)
           / (CAST(rowt AS DOUBLE) * CAST(colt AS DOUBLE) / n)
           ORDER BY grp, above)) AS chi2,
         CAST(COUNT(DISTINCT grp) AS BIGINT) AS k,
         MAX(n) AS n
  FROM margins, tot
)
SELECT n, k, (SELECT CAST(mc AS DOUBLE) / 100 FROM med) AS grand_median,
       chi2, k - 1 AS df,
       chi2 > CAST(9.487729036781154 AS DOUBLE) AS significant
FROM chi
""",
)
def agg_moods_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test: split every event at the grand median of
    value (lower-median convention, rank (n+1)//2 from the
    distributed row-number plan) and chi-square the resulting
    5x2 above/not-above table. All counts exact BIGINTs; the
    10-cell chi-square folds in (grp, above) order via the sorted-
    array fold == list_sum(ORDER BY) equivalence, each cell's
    (O - E)^2 / E evaluated with identical expression text from
    exact integers — bit-exact, no rounding. Significance vs the
    chi-square(4) 5% point."""
    from ..plans.global_rank import with_global_row_number

    ev = load(spark, sf_dir, "events")
    rows_ = ev.select(
        F.col("event_type").alias("grp"),
        "event_id",
        F.expr(cents("value")).alias("c"),
    )
    numbered, n_total = with_global_row_number(
        rows_, ["c", "grp", "event_id"], out_col="rn"
    )
    med_pos = (n_total + 1) // 2
    mc = numbered.filter(F.col("rn") == med_pos).select("c").collect()[0][0]
    cells = rows_.groupBy(
        "grp",
        F.when(F.col("c") > mc, 1).otherwise(0).alias("above"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    wr = Window.partitionBy("grp")
    wc = Window.partitionBy("above")
    margins = cells.select(
        "grp",
        "above",
        "o",
        F.sum("o").over(wr).alias("rowt"),
        F.sum("o").over(wc).alias("colt"),
    )
    e_expr = (
        F.col("rowt").cast("double") * F.col("colt").cast("double") / n_total
    )
    terms = margins.select(
        "grp",
        "above",
        (
            (F.col("o").cast("double") - e_expr)
            * (F.col("o").cast("double") - e_expr)
            / e_expr
        ).alias("term"),
    )
    chi = terms.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("grp", "above", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("chi2"),
        F.countDistinct("grp").cast("bigint").alias("k"),
    )
    return chi.select(
        F.lit(n_total).cast("bigint").alias("n"),
        "k",
        (F.lit(mc).cast("double") / 100).alias("grand_median"),
        "chi2",
        (F.col("k") - 1).alias("df"),
        (F.col("chi2") > F.lit(9.487729036781154).cast("double")).alias(
            "significant"
        ),
    )


@query(
    "agg_hodges_lehmann",
    bounded_cross="bounded O(days^2) Walsh-average pair join",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
), walsh AS (
  SELECT a.day AS da, b.day AS db, a.c + b.c AS w
  FROM daily a JOIN daily b ON a.day <= b.day
), ranked AS (
  SELECT w, ROW_NUMBER() OVER (ORDER BY w, da, db) AS rn,
         COUNT(*) OVER () AS m
  FROM walsh
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
       CAST(MAX(m) AS BIGINT) AS n_pairs,
       CAST(MAX(CASE WHEN rn = (m + 1) // 2 THEN w END) AS DOUBLE)
         / 2 / 100 AS hl_estimate
FROM ranked
""",
)
def agg_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann location estimator of daily revenue: the
    median of all Walsh averages (x_i + x_j)/2 over day pairs
    i <= j — the robust center estimate behind the Wilcoxon
    signed-rank interval (30-50% breakdown vs the mean, better
    efficiency than the median). The pair table is the bounded
    O(days^2) cross (~500 rows for a month); Walsh sums stay as
    exact doubled-cents BIGINTs, the median picks rank (M+1)//2
    (lower-median convention, deterministic (w, day, day)
    tie-break), and the single division to currency happens once —
    bit-exact."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr(cents("value"))).cast("bigint").alias("c")
    )
    a = daily.select(F.col("day").alias("da"), F.col("c").alias("ca"))
    b = daily.select(F.col("day").alias("db"), F.col("c").alias("cb"))
    walsh = a.join(b, F.col("da") <= F.col("db")).select(
        "da", "db", (F.col("ca") + F.col("cb")).alias("w")
    )
    # bounded: O(days^2) Walsh pairs (~500 rows), single-task fine
    wn = Window.orderBy("w", "da", "db")
    ranked = walsh.select(
        "w",
        F.row_number().over(wn).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    n_days = daily.count()
    return ranked.agg(
        F.lit(n_days).cast("bigint").alias("n_days"),
        F.max("m").cast("bigint").alias("n_pairs"),
        (
            F.max(
                F.when(
                    F.col("rn") == F.expr("(m + 1) div 2"), F.col("w")
                )
            ).cast("double")
            / 2
            / 100
        ).alias("hl_estimate"),
    )


@query(
    "agg_benjamini_hochberg",
    bounded_cross="1-row global-share scalar onto the 25-nation cell table",
    oracle="""
WITH cells AS (
  SELECT c_nationkey AS nation, c_mktsegment AS seg,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM customer GROUP BY 1, 2
), seg_tot AS (
  SELECT seg, CAST(SUM(o) AS BIGINT) AS st FROM cells GROUP BY seg
), grand AS (
  SELECT CAST(SUM(o) AS BIGINT) AS g FROM cells
), nat_tot AS (
  SELECT nation, CAST(SUM(o) AS BIGINT) AS nt FROM cells GROUP BY nation
), full_cells AS (
  SELECT n.nation, s.seg, n.nt, s.st, COALESCE(c.o, 0) AS o
  FROM nat_tot n CROSS JOIN seg_tot s
  LEFT JOIN cells c ON c.nation = n.nation AND c.seg = s.seg
), chi AS (
  SELECT nation,
         list_sum(list(
           (CAST(o AS DOUBLE)
            - CAST(nt AS DOUBLE) * st / (SELECT g FROM grand))
           * (CAST(o AS DOUBLE)
              - CAST(nt AS DOUBLE) * st / (SELECT g FROM grand))
           / (CAST(nt AS DOUBLE) * st / (SELECT g FROM grand))
           ORDER BY seg)) AS chi2
  FROM full_cells GROUP BY nation
), pv AS (
  SELECT nation, chi2,
         exp(-chi2 / 2) * (CAST(1 AS DOUBLE) + chi2 / 2) AS p
  FROM chi
), ranked AS (
  SELECT nation, chi2, p,
         ROW_NUMBER() OVER (ORDER BY p, nation) AS rnk,
         COUNT(*) OVER () AS m
  FROM pv
), cutoff AS (
  SELECT COALESCE(MAX(CASE WHEN p <= rnk * CAST(0.05 AS DOUBLE) / m
                           THEN rnk END), 0) AS kstar
  FROM ranked
)
SELECT nation, round(chi2, 6) AS chi2, round(p, 9) AS p_value,
       CAST(rnk AS BIGINT) AS rnk,
       rnk * CAST(0.05 AS DOUBLE) / m AS bh_threshold,
       rnk <= (SELECT kstar FROM cutoff) AS rejected
FROM ranked
""",
)
def agg_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over 25 simultaneous
    chi-square tests — does nation i's market-segment mix deviate
    from the global mix? — the multiple-testing correction every
    segment-screening dashboard needs (Bonferroni is too blunt at
    m=25). Exactness: each nation's chi-square folds its 5 cells in
    segment order from exact integer counts; the p-value uses the
    CLOSED FORM for even df (df=4: p = exp(-x/2)(1 + x/2)) so no
    incomplete-gamma approximation is needed; the BH step-up finds
    the largest rank k with p_(k) <= k*alpha/m and rejects ranks
    <= k. Ranking ties break by nation. Cross-engine exp() is <=1
    ulp (accepted, verified at all SFs); displayed chi2/p rounded,
    the BH comparison runs on raw doubles identical in both
    engines."""
    c = load(spark, sf_dir, "customer")
    cells = c.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    seg_tot = cells.groupBy("seg").agg(
        F.sum("o").cast("bigint").alias("st")
    )
    nat_tot = cells.groupBy("nation").agg(
        F.sum("o").cast("bigint").alias("nt")
    )
    g = cells.agg(F.sum("o")).collect()[0][0]
    full_cells = (
        nat_tot.crossJoin(F.broadcast(seg_tot))
        .join(cells, ["nation", "seg"], "left")
        .select(
            "nation",
            "seg",
            "nt",
            "st",
            F.coalesce("o", F.lit(0)).alias("o"),
        )
    )
    e = F.col("nt").cast("double") * F.col("st") / F.lit(g)
    terms = full_cells.select(
        "nation",
        "seg",
        (
            (F.col("o").cast("double") - e)
            * (F.col("o").cast("double") - e)
            / e
        ).alias("term"),
    )
    chi = terms.groupBy("nation").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("seg", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("chi2")
    )
    pv = chi.select(
        "nation",
        "chi2",
        (
            F.exp(-F.col("chi2") / 2)
            * (F.lit(1).cast("double") + F.col("chi2") / 2)
        ).alias("p"),
    )
    # bounded: 25 nation rows
    wr = Window.orderBy("p", "nation")
    ranked = pv.select(
        "nation",
        "chi2",
        "p",
        F.row_number().over(wr).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    kstar_row = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p")
                    <= F.col("rnk") * F.lit(0.05).cast("double") / F.col("m"),
                    F.col("rnk"),
                )
            ),
            F.lit(0),
        ).alias("kstar")
    ).collect()[0]
    kstar = kstar_row["kstar"]
    return ranked.select(
        "nation",
        F.round("chi2", 6).alias("chi2"),
        F.round("p", 9).alias("p_value"),
        F.col("rnk").cast("bigint").alias("rnk"),
        (F.col("rnk") * F.lit(0.05).cast("double") / F.col("m")).alias(
            "bh_threshold"
        ),
        (F.col("rnk") <= F.lit(kstar)).alias("rejected"),
    )


_PERM_B = 32  # deterministic hash permutations


@query(
    "agg_permutation_test",
    bounded_cross="1-row observed-diff scalar onto the 32-row permutation table",
    oracle=f"""
WITH base AS (
  SELECT event_id, user_id % 2 AS arm,
         CAST(ROUND((value) * 100) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'
), obs AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN c END) AS DOUBLE)
           / SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
         - CAST(SUM(CASE WHEN arm = 1 THEN c END) AS DOUBLE)
           / SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS d_obs
  FROM base
), perm AS (
  SELECT b.b,
         {_duck_md5_32("CAST(base.event_id AS VARCHAR) || '|' || CAST(b.b AS VARCHAR)")} % 2
           AS parm,
         base.c
  FROM base CROSS JOIN (SELECT unnest(generate_series(1, {_PERM_B})) AS b) b
), pdiff AS (
  SELECT b,
         CAST(SUM(CASE WHEN parm = 0 THEN c END) AS DOUBLE)
           / SUM(CASE WHEN parm = 0 THEN 1 ELSE 0 END)
         - CAST(SUM(CASE WHEN parm = 1 THEN c END) AS DOUBLE)
           / SUM(CASE WHEN parm = 1 THEN 1 ELSE 0 END) AS d
  FROM perm GROUP BY b
)
SELECT (SELECT d_obs FROM obs) AS d_obs,
       CAST(SUM(CASE WHEN abs(d) >= abs((SELECT d_obs FROM obs))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
       CAST(1 + SUM(CASE WHEN abs(d) >= abs((SELECT d_obs FROM obs))
                    THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(1 + {_PERM_B} AS DOUBLE) AS p_value
FROM pdiff
""",
)
def agg_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test of the purchase-value difference between the
    user-parity arms, with {B} DETERMINISTIC pseudo-permutations:
    permutation b reassigns each event by the portable 32-bit md5
    hash of (event_id, b) mod 2 — the same null-resampling logic as
    a random-label permutation test, but reproducible across engines
    and runs (no RNG state, the sample_hash_split doctrine). The
    p-value is the add-one-smoothed fraction of permuted |mean
    diffs| at least as extreme as observed. All sums are exact
    integer cents; each diff is one float expression from exact
    integers — bit-exact. One 32x explode of the filtered slice,
    two hash aggs.""".format(B=_PERM_B)
    ev = load(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        (F.col("user_id") % 2).alias("arm"),
        F.expr(cents("value")).alias("c"),
    )
    d_of = lambda arm_col: (
        F.sum(F.when(F.col(arm_col) == 0, F.col("c"))).cast("double")
        / F.sum(F.when(F.col(arm_col) == 0, 1).otherwise(0))
        - F.sum(F.when(F.col(arm_col) == 1, F.col("c"))).cast("double")
        / F.sum(F.when(F.col(arm_col) == 1, 1).otherwise(0))
    )
    d_obs = base.agg(d_of("arm").alias("d_obs")).collect()[0]["d_obs"]
    bgrid = spark.range(1, _PERM_B + 1).select(F.col("id").alias("b"))
    perm = base.crossJoin(F.broadcast(bgrid)).select(
        "b",
        (
            F.expr(
                "conv(substring(md5(concat_ws('|', event_id, b)), 1, 8),"
                " 16, 10)"
            ).cast("bigint")
            % 2
        ).alias("parm"),
        "c",
    )
    pdiff = perm.groupBy("b").agg(d_of("parm").alias("d"))
    return pdiff.agg(
        F.lit(d_obs).alias("d_obs"),
        F.sum(
            F.when(F.abs(F.col("d")) >= abs(d_obs), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_extreme"),
        (
            (
                1
                + F.sum(
                    F.when(F.abs(F.col("d")) >= abs(d_obs), 1).otherwise(0)
                )
            ).cast("double")
            / F.lit(float(1 + _PERM_B))
        ).alias("p_value"),
    )


@query(
    "agg_cvm_test",
    oracle="""
WITH s AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS tr,
         CAST(round(o_totalprice * 100) AS BIGINT) AS sc,
         o_orderkey
  FROM orders
), r AS (
  SELECT tr,
         ROW_NUMBER() OVER (ORDER BY sc, o_orderkey) AS r,
         ROW_NUMBER() OVER (PARTITION BY tr ORDER BY sc, o_orderkey) AS i
  FROM s
), g AS (
  SELECT CAST(SUM(CASE WHEN tr = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
         CAST(SUM(CASE WHEN tr = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         CAST(SUM(CASE WHEN tr = 1 THEN (r - i) * (r - i) ELSE 0 END)
              AS BIGINT) AS st,
         CAST(SUM(CASE WHEN tr = 0 THEN (r - i) * (r - i) ELSE 0 END)
              AS BIGINT) AS sc2
  FROM r
)
SELECT nt AS n_treated,
       nc AS n_control,
       CAST(CAST(CAST(nt AS HUGEINT) * st + CAST(nc AS HUGEINT) * sc2
                 AS VARCHAR) AS DOUBLE) AS u_stat,
       CAST(CAST(CAST(nt AS HUGEINT) * st + CAST(nc AS HUGEINT) * sc2
                 AS VARCHAR) AS DOUBLE)
         / (CAST(nt AS DOUBLE) * CAST(nc AS DOUBLE) * CAST(nt + nc AS DOUBLE))
         - CAST(4 * nt * nc - 1 AS DOUBLE) / CAST(6 * (nt + nc) AS DOUBLE)
         AS t_stat
FROM g
""",
)
def agg_cvm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises test (Anderson 1962 rank form)
    comparing the URGENT-priority order-value distribution against
    the rest — the whole-distribution companion of agg_ks_test (KS
    sees the single largest CDF gap; CvM integrates the squared gap,
    so it catches broad shape shifts KS underweights):
    U = n*sum_i (r_i - i)^2 + m*sum_j (s_j - j)^2 over combined ranks,
    T = U/(n*m*N) - (4nm - 1)/(6N). Ranks are made unique by the
    deterministic (cents, orderkey) total order (ties broken
    identically in both engines — the statistic is defined ON that
    order, documented).

    Scale shape: THREE passes of the two-phase global-rank machinery
    (combined rank over (sc, key); within-group index per group
    slice, each range-bucketed by the score, never a 2-partition
    window), a key-equi-join-free union, one hash aggregate to a
    single row. U goes through decimal(38,0) (~2e19 at sf0.1, ~2e27
    at 100x — inside 38 digits), then the decimal->double /
    HUGEINT->VARCHAR->double cast pair the agg_gamma_mom precedent
    proved bit-equal."""
    from ..plans.global_rank import with_global_row_number

    base = load(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("tr"),
        F.expr(cents("o_totalprice")).alias("sc"),
        "o_orderkey",
    )
    ranked, _ = with_global_row_number(
        base, ["sc", "o_orderkey"], out_col="r"
    )
    t1, n_t = with_global_row_number(
        ranked.filter(F.col("tr") == 1), ["sc", "o_orderkey"], out_col="i"
    )
    t0, n_c = with_global_row_number(
        ranked.filter(F.col("tr") == 0), ["sc", "o_orderkey"], out_col="i"
    )
    both = t1.unionByName(t0)
    d2 = (F.col("r") - F.col("i")) * (F.col("r") - F.col("i"))
    g = both.agg(
        F.sum(F.when(F.col("tr") == 1, d2).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("st"),
        F.sum(F.when(F.col("tr") == 0, d2).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("sc2"),
    )
    u_dec = (
        F.lit(n_t).cast("decimal(38,0)") * F.col("st")
        + F.lit(n_c).cast("decimal(38,0)") * F.col("sc2")
    )
    u_d = u_dec.cast("double")
    n_tot = n_t + n_c
    return g.select(
        F.lit(n_t).cast("bigint").alias("n_treated"),
        F.lit(n_c).cast("bigint").alias("n_control"),
        u_d.alias("u_stat"),
        (
            u_d
            / (
                F.lit(float(n_t))
                * F.lit(float(n_c))
                * F.lit(float(n_tot))
            )
            - F.lit(float(4 * n_t * n_c - 1)) / F.lit(float(6 * n_tot))
        ).alias("t_stat"),
    )


@query(
    "agg_tukey_hsd",
    bounded_cross=(
        "5-priority pairwise grid (10 pairs) + 1-row pooled-MSE scalar"
    ),
    oracle="""
WITH g AS (
  SELECT o_orderpriority AS g,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(CAST(SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                  AS HUGEINT)
                  * CAST(round(o_totalprice * 100) AS BIGINT))
              AS VARCHAR) AS DOUBLE) AS ss
  FROM orders GROUP BY 1
), st AS (
  SELECT g, n,
         CAST(s AS DOUBLE) / n AS m,
         (ss - (CAST(s AS DOUBLE) / n) * s) AS sse
  FROM g
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn,
         CAST(COUNT(*) AS BIGINT) AS k,
         list_sum(list(sse ORDER BY g)) AS ssesum
  FROM st
), mse AS (
  SELECT ssesum / CAST(nn - k AS DOUBLE) AS mse, nn - k AS df_error
  FROM tot
)
SELECT a.g AS prio_a, b.g AS prio_b,
       ABS(a.m - b.m) / 100 AS mean_diff_dollars,
       sqrt(mse.mse / 2 * (1.0 / CAST(a.n AS DOUBLE)
                           + 1.0 / CAST(b.n AS DOUBLE))) / 100 AS se_dollars,
       ABS(a.m - b.m)
         / sqrt(mse.mse / 2 * (1.0 / CAST(a.n AS DOUBLE)
                               + 1.0 / CAST(b.n AS DOUBLE))) AS q_stat,
       mse.df_error AS df_error
FROM st a JOIN st b ON a.g < b.g, mse
""",
)
def agg_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD post-hoc pairwise comparisons across the five
    order-priority groups: studentized-range q statistic per pair,
    |mean_i - mean_j| / sqrt(MSE/2 * (1/n_i + 1/n_j)), with the
    pooled within-group MSE and its error df — the step every ANOVA
    (agg_anova_twoway) must be followed by before naming WHICH
    groups differ. Reports the statistic and df (the q critical
    value is a table lookup the caller owns).

    Exactness: per-group n/sum/sum-of-squares are exact integer
    cents (squares through HUGEINT / decimal(38)); each group's SSE
    is the gamma_mom (ss - mu*s) expression; the 5 SSEs fold in
    group order via the ts_sharpe strict-fold pair (F.aggregate over
    array_sort == list_sum over ORDER BY) so the pooled MSE is
    bit-identical; pairs and q are fixed double expressions. Scale
    shape: ONE two-phase hash aggregate to 5 rows, then a declared
    bounded 5x5 pair grid with a 1-row MSE scalar cross."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.expr(cents("o_totalprice")).alias("c"),
    )
    g = o.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("double")
        .alias("ss"),
    )
    m = F.col("s").cast("double") / F.col("n")
    st = g.select(
        "g", "n", m.alias("m"), (F.col("ss") - m * F.col("s")).alias("sse")
    )
    arr = F.array_sort(F.collect_list(F.struct("g", "sse")))
    tot = st.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.aggregate(
            arr, F.lit(0.0), lambda acc, x: acc + x["sse"]
        ).alias("ssesum"),
    )
    mse = tot.select(
        (F.col("ssesum") / (F.col("nn") - F.col("k")).cast("double")).alias(
            "mse"
        ),
        (F.col("nn") - F.col("k")).alias("df_error"),
    )
    a = st.select(
        F.col("g").alias("prio_a"), F.col("n").alias("na"), F.col("m").alias("ma")
    )
    b = st.select(
        F.col("g").alias("prio_b"), F.col("n").alias("nb"), F.col("m").alias("mb")
    )
    # bounded: 5x5 priority pair grid + 1-row MSE scalar
    pairs = a.join(F.broadcast(b), F.col("prio_a") < F.col("prio_b")).crossJoin(
        F.broadcast(mse)
    )
    diff = F.abs(F.col("ma") - F.col("mb"))
    se = F.sqrt(
        F.col("mse")
        / F.lit(2)
        * (
            F.lit(1.0) / F.col("na").cast("double")
            + F.lit(1.0) / F.col("nb").cast("double")
        )
    )
    return pairs.select(
        "prio_a",
        "prio_b",
        (diff / F.lit(100)).alias("mean_diff_dollars"),
        (se / F.lit(100)).alias("se_dollars"),
        (diff / se).alias("q_stat"),
        "df_error",
    )


@query(
    "agg_grubbs",
    oracle="""
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(CAST(SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                  AS HUGEINT)
                  * CAST(round(o_totalprice * 100) AS BIGINT))
              AS VARCHAR) AS DOUBLE) AS ss,
         CAST(MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mx,
         CAST(MIN(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mn
  FROM orders
), st AS (
  SELECT n,
         CAST(s AS DOUBLE) / n AS mu,
         sqrt((ss - (CAST(s AS DOUBLE) / n) * s) / (n - 1)) AS sd,
         GREATEST(CAST(mx AS DOUBLE) - CAST(s AS DOUBLE) / n,
                  CAST(s AS DOUBLE) / n - CAST(mn AS DOUBLE)) AS dev
  FROM m
)
SELECT n AS n_orders,
       mu / 100 AS mean_dollars,
       sd / 100 AS sd_dollars,
       dev / 100 AS max_dev_dollars,
       dev / sd AS g_stat
FROM st
""",
)
def agg_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs outlier statistic for the order-value population:
    G = max|x - mean| / s, the classical single-outlier screen (the
    parametric cousin of anomaly_iqr_fences / anomaly_mad_robust —
    those fence, this TESTS, with the critical value a t-table
    lookup the caller owns).

    Exactness: the extreme deviation is GREATEST(max - mu, mu - min)
    over exact integer extremes and the exact-cents mean — max/min
    are associative, so the distributed aggregate is order-free;
    variance follows the gamma_mom (ss - mu*s)/(n-1) discipline; G
    is a fixed double expression. Scale shape: ONE two-phase hash
    aggregate to a single row."""
    m = load(spark, sf_dir, "orders").select(
        F.expr(cents("o_totalprice")).alias("c")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("double")
        .alias("ss"),
        F.max("c").cast("bigint").alias("mx"),
        F.min("c").cast("bigint").alias("mn"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("ss") - mu * F.col("s")) / (F.col("n") - 1)
    )
    dev = F.greatest(
        F.col("mx").cast("double") - mu, mu - F.col("mn").cast("double")
    )
    return m.select(
        F.col("n").alias("n_orders"),
        (mu / 100).alias("mean_dollars"),
        (sd / 100).alias("sd_dollars"),
        (dev / 100).alias("max_dev_dollars"),
        (dev / sd).alias("g_stat"),
    )


@query(
    "agg_cochrans_q",
    oracle="""
WITH flags AS (
  SELECT l_orderkey,
         CAST(MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS t1,
         CAST(MAX(CASE WHEN CAST(round(l_discount * 100) AS BIGINT) >= 6
                       THEN 1 ELSE 0 END) AS BIGINT) AS t2,
         CAST(MAX(CASE WHEN CAST(round(l_quantity) AS BIGINT) >= 40
                       THEN 1 ELSE 0 END) AS BIGINT) AS t3
  FROM lineitem GROUP BY 1
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t1) AS BIGINT) AS c1,
         CAST(SUM(t2) AS BIGINT) AS c2,
         CAST(SUM(t3) AS BIGINT) AS c3,
         CAST(SUM((t1 + t2 + t3) * (t1 + t2 + t3)) AS BIGINT) AS sr2
  FROM flags
)
SELECT n AS n_orders, c1 AS c_returns, c2 AS c_discounted, c3 AS c_bulk,
       CAST(2 * (3 * (c1 * c1 + c2 * c2 + c3 * c3)
                 - (c1 + c2 + c3) * (c1 + c2 + c3)) AS DOUBLE)
         / CAST(3 * (c1 + c2 + c3) - sr2 AS DOUBLE) AS q_stat,
       CAST(2 AS BIGINT) AS df
FROM m
""",
)
def agg_cochrans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test for k=3 correlated binary outcomes per order
    (any returned line / any deep-discount line / any bulk-quantity
    line): do the three 'defect' rates differ across outcomes
    measured on the SAME orders? — the k-treatment generalization of
    agg_mcnemar_test (k=2) and the binary analogue of
    agg_friedman_test. Q = (k-1)[k*sum C_j^2 - T^2]/(kT - sum R_i^2)
    ~ chi2(k-1) under exchangeability.

    Exactness: flags, column totals, T and the row-sum squares are
    all exact bigints (C^2 ~ 2e15 at a 100x corpus — inside int64);
    Q is ONE double division of two exact integers. Scale shape: one
    hash aggregate over lineitem to O(orders) rows, a second to one
    row."""
    flags = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("t1"),
            F.max(
                F.when(F.expr(cents("l_discount")) >= 6, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("t2"),
            F.max(
                F.when(
                    F.expr("CAST(round(l_quantity) AS BIGINT)") >= 40, 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("t3"),
        )
    )
    r = F.col("t1") + F.col("t2") + F.col("t3")
    m = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t1").cast("bigint").alias("c1"),
        F.sum("t2").cast("bigint").alias("c2"),
        F.sum("t3").cast("bigint").alias("c3"),
        F.sum(r * r).cast("bigint").alias("sr2"),
    )
    t = F.col("c1") + F.col("c2") + F.col("c3")
    num = 2 * (
        3
        * (
            F.col("c1") * F.col("c1")
            + F.col("c2") * F.col("c2")
            + F.col("c3") * F.col("c3")
        )
        - t * t
    )
    den = 3 * t - F.col("sr2")
    return m.select(
        F.col("n").alias("n_orders"),
        F.col("c1").alias("c_returns"),
        F.col("c2").alias("c_discounted"),
        F.col("c3").alias("c_bulk"),
        (num.cast("double") / den.cast("double")).alias("q_stat"),
        F.lit(2).cast("bigint").alias("df"),
    )


@query(
    "agg_g_test",
    bounded_cross="1-row total scalar onto the 15-cell contingency table",
    oracle="""
WITH cells AS (
  SELECT o_orderpriority AS p, o_orderstatus AS st,
         CAST(COUNT(*) AS BIGINT) AS nij
  FROM orders GROUP BY 1, 2
), rws AS (
  SELECT p, CAST(SUM(nij) AS BIGINT) AS ri FROM cells GROUP BY 1
), cls AS (
  SELECT st, CAST(SUM(nij) AS BIGINT) AS cj FROM cells GROUP BY 1
), tot AS (
  SELECT CAST(SUM(nij) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT p) AS BIGINT) AS nr,
         CAST(COUNT(DISTINCT st) AS BIGINT) AS nc
  FROM cells
), terms AS (
  SELECT c.nij,
         CAST(FLOOR(LN(CAST(c.nij * t.n AS DOUBLE)
                       / CAST(r.ri * l.cj AS DOUBLE)) * 1000000 + 0.5)
              AS BIGINT) AS lq
  FROM cells c JOIN rws r USING (p) JOIN cls l USING (st), tot t
), s AS (
  SELECT CAST(SUM(2 * nij * lq) AS BIGINT) AS g_micro,
         CAST(COUNT(*) AS BIGINT) AS n_cells
  FROM terms
)
SELECT t.n AS n_total, s.n_cells,
       CAST(s.g_micro AS DOUBLE) / 1000000 AS g_stat,
       (t.nr - 1) * (t.nc - 1) AS df
FROM s, tot t
""",
)
def agg_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (likelihood-ratio chi-square) of independence between
    order priority and order status: G = 2 sum n_ij ln(n_ij/e_ij)
    with e_ij = r_i c_j / N — the information-theoretic twin of the
    Pearson test (agg_chi2_cells / agg_cramers_v use the quadratic
    approximation; G IS 2N times the mutual information in nats, so
    this key also cross-checks agg_mutual_info's estimand).

    Exactness: each cell's log argument collapses to the ratio of
    two exact bigint products (n_ij*N over r_i*c_j — ~2e14 at a 100x
    corpus, inside int64); the ln is quantized ONCE at 1e-6 so every
    term 2*n_ij*lq is an exact bigint micro-nat and the sum is
    order-free. Empty cells never materialize (groupBy emits
    observed cells only — their LR contribution is 0). Scale shape:
    one hash aggregate to <=15 cells, two broadcast margin joins, a
    declared 1-row total cross."""
    o = load(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("p"),
        F.col("o_orderstatus").alias("st"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("nij"))
    rws = cells.groupBy("p").agg(F.sum("nij").cast("bigint").alias("ri"))
    cls = cells.groupBy("st").agg(F.sum("nij").cast("bigint").alias("cj"))
    tot = cells.agg(
        F.sum("nij").cast("bigint").alias("n"),
        F.count_distinct(F.col("p")).cast("bigint").alias("nr"),
        F.count_distinct(F.col("st")).cast("bigint").alias("nc"),
    )
    terms = (
        cells.join(F.broadcast(rws), "p")
        .join(F.broadcast(cls), "st")
        .crossJoin(F.broadcast(tot))
        .select(
            "nij",
            "n",
            "nr",
            "nc",
            F.floor(
                F.log(
                    (F.col("nij") * F.col("n")).cast("double")
                    / (F.col("ri") * F.col("cj")).cast("double")
                )
                * F.lit(1000000)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("lq"),
        )
    )
    s = terms.groupBy("n", "nr", "nc").agg(
        F.sum(2 * F.col("nij") * F.col("lq")).cast("bigint").alias("g_micro"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    )
    return s.select(
        F.col("n").alias("n_total"),
        "n_cells",
        (F.col("g_micro").cast("double") / F.lit(1000000)).alias("g_stat"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).alias("df"),
    )


@query(
    "agg_jonckheere",
    oracle=f"""
WITH s AS (
  SELECT o_orderpriority AS g,
         CAST(round(o_totalprice * 100) AS BIGINT) AS sc,
         o_orderkey AS k
  FROM orders
), {", ".join(_jt_prefix_cte(t) for t in range(1, 5))},
cnts AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY g
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(n * n) AS BIGINT) AS sn2,
         CAST(CAST(SUM(CAST(n AS HUGEINT) * n * (2 * n + 3)) AS VARCHAR)
              AS DOUBLE) AS sv
  FROM cnts
), jj AS (
  SELECT c1.c + c2.c + c3.c + c4.c AS j FROM c1, c2, c3, c4
), ev AS (
  SELECT nn, j,
         CAST(nn * nn - sn2 AS DOUBLE) / 4 AS e_j,
         (CAST(CAST(CAST(nn AS HUGEINT) * nn * (2 * nn + 3) AS VARCHAR)
               AS DOUBLE) - sv) / 72 AS var_j
  FROM tot, jj
)
SELECT nn AS n_total, j AS j_stat, e_j, var_j,
       (CAST(j AS DOUBLE) - e_j) / sqrt(var_j) AS z_score
FROM ev
""",
)
def agg_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra test for an ORDERED alternative across the
    five priority doses (does order value trend monotonically with
    urgency?): J = sum over group pairs i<j of the Mann-Whitney
    count U_ij, against its null mean (N^2 - sum n_i^2)/4 and
    variance [N^2(2N+3) - sum n_i^2(2n_i+3)]/72 — strictly more
    powerful than Kruskal-Wallis when the doses are ordered, which
    the TPC-H priorities literally are. Ties broken by the
    deterministic (cents, orderkey) total order (the agg_cvm_test
    contract: the statistic is defined ON that order).

    Exactness: J collapses further than the prefix-rank identity —
    sum_{i<j} U_ij = sum_b #{a : group(a) < group(b), a precedes b
    in the deterministic (sc, k) total order} (rp - i of the old
    8-pass formulation IS that predecessor count, summed over every
    group's rows; the lowest group contributes 0). So J is an exact
    bigint from ONE range-bucketed sorted Arrow pass (r10, guide
    §2.3/§4.2): per-(bucket, group) counts give exact cross-bucket
    offsets (the global-rank offset trick), and one sorted
    mapInPandas accumulates per-row lower-group predecessor counts
    — replacing 8 full global-rank pipelines + 4 equi-joins. The
    null moments go through HUGEINT/python-int (~7e21 at 100x) with
    the proven correctly-rounded double conversions. Scale shape:
    one quantile pass + one bucket-count pass + one sorted pass,
    one tiny aggregate."""
    import numpy as np
    import pandas as pd

    from ..plans.global_rank import with_range_bucket

    base = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.expr(cents("o_totalprice")).alias("sc"),
        F.col("o_orderkey").alias("k"),
    )
    spark_conf_nb = int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    bucketed = with_range_bucket(base, "sc", spark_conf_nb).localCheckpoint(
        eager=False
    )
    cell = bucketed.groupBy("_gr_bucket", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).collect()
    gidx = {g: i for i, g in enumerate(_JT_GROUPS)}
    # offsets[b][gi] = rows of group gi in buckets STRICTLY before b
    per_bucket: dict[int, list[int]] = {}
    for r in cell:
        per_bucket.setdefault(r["_gr_bucket"], [0] * len(_JT_GROUPS))[
            gidx[r["g"]]
        ] += int(r["n"])
    offsets: dict[int, list[int]] = {}
    run = [0] * len(_JT_GROUPS)
    for b in sorted(per_bucket):
        offsets[b] = list(run)
        for i_, v in enumerate(per_bucket[b]):
            run[i_] += v
    cnts = {g: run[gidx[g]] for g in _JT_GROUPS if run[gidx[g]]}
    ng = len(_JT_GROUPS)

    def jpass(batches):
        # running per-(bucket, group) counts, seeded with the exact
        # cross-bucket offsets; rows arrive sorted by (sc, k) and
        # buckets are contiguous under that sort, so each row's
        # lower-group predecessor count = offset part + within-task
        # part (state persists across batches of the task)
        state = {b: list(o) for b, o in offsets.items()}
        for pdf in batches:
            if not len(pdf):
                continue
            buckets = pdf["_gr_bucket"].to_numpy()
            gs = pdf["g"].map(gidx).to_numpy()
            j = 0
            seg_starts = np.flatnonzero(
                np.concatenate(([True], buckets[1:] != buckets[:-1]))
            )
            seg_ends = np.concatenate((seg_starts[1:], [len(buckets)]))
            for s, e in zip(seg_starts, seg_ends):
                b = int(buckets[s])
                garr = gs[s:e]
                cnt0 = state[b]
                lower = np.zeros(len(garr), dtype=np.int64)
                for gi in range(1, ng):
                    m = garr == gi
                    if m.any():
                        # exclusive prefix count of strictly-lower
                        # groups (the row itself is == gi, never < gi)
                        lower[m] = np.cumsum(garr < gi)[m]
                pre = np.concatenate(([0], np.cumsum(cnt0)))[:-1]
                j += int(lower.sum() + pre[garr].sum())
                for gi in range(ng):
                    cnt0[gi] += int((garr == gi).sum())
            yield pd.DataFrame({"j": np.array([j], dtype=np.int64)})

    j_total = int(
        bucketed.repartition(spark_conf_nb, "_gr_bucket")
        .sortWithinPartitions("sc", "k")
        .mapInPandas(jpass, "j bigint")
        .agg(F.sum("j").cast("bigint").alias("j"))
        .collect()[0]["j"]
    )
    nn = sum(cnts.values())
    sn2 = sum(n * n for n in cnts.values())
    sv = float(sum(n * n * (2 * n + 3) for n in cnts.values()))
    hv = float(nn * nn * (2 * nn + 3))
    one = spark.createDataFrame(
        [(nn, j_total, sn2, sv, hv)],
        "nn bigint, j bigint, sn2 bigint, sv double, hv double",
    )
    e_j = (F.col("nn") * F.col("nn") - F.col("sn2")).cast("double") / F.lit(4)
    var_j = (F.col("hv") - F.col("sv")) / F.lit(72)
    return one.select(
        F.col("nn").alias("n_total"),
        F.col("j").alias("j_stat"),
        e_j.alias("e_j"),
        var_j.alias("var_j"),
        ((F.col("j").cast("double") - e_j) / F.sqrt(var_j)).alias("z_score"),
    )


TTEST1_MU0_DOLLARS = 150000  # hypothesized mean order value


@query(
    "agg_ttest_one_sample",
    oracle=f"""
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(CAST(SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                  AS HUGEINT)
                  * CAST(round(o_totalprice * 100) AS BIGINT))
              AS VARCHAR) AS DOUBLE) AS ss
  FROM orders
), st AS (
  SELECT n,
         CAST(s AS DOUBLE) / n AS mu,
         sqrt((ss - (CAST(s AS DOUBLE) / n) * s) / (n - 1)) AS sd
  FROM m
)
SELECT n AS n_orders,
       mu / 100 AS mean_dollars,
       (mu - {TTEST1_MU0_DOLLARS * 100}) / 100 AS diff_dollars,
       (mu - {TTEST1_MU0_DOLLARS * 100}) / (sd / sqrt(CAST(n AS DOUBLE)))
         AS t_stat,
       n - 1 AS df
FROM st
""",
)
def agg_ttest_one_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sample t-test of the mean order value against the
    hypothesized mu0 = ${TTEST1_MU0_DOLLARS:,} — the missing first
    rung of the t family (agg_ttest_welch compares two groups,
    agg_ttest_paired matched pairs; this tests ONE mean against a
    spec/target, the daily 'are we on plan?' question).

    Exactness: the gamma_mom exact-moment discipline (integer cents,
    HUGEINT/decimal(38) squares); t is a fixed double expression;
    mu0 enters as an integer-cent literal. ONE hash aggregate."""
    m = load(spark, sf_dir, "orders").select(
        F.expr(cents("o_totalprice")).alias("c")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("double")
        .alias("ss"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt((F.col("ss") - mu * F.col("s")) / (F.col("n") - 1))
    mu0c = F.lit(TTEST1_MU0_DOLLARS * 100)
    return m.select(
        F.col("n").alias("n_orders"),
        (mu / 100).alias("mean_dollars"),
        ((mu - mu0c) / 100).alias("diff_dollars"),
        ((mu - mu0c) / (sd / F.sqrt(F.col("n").cast("double")))).alias(
            "t_stat"
        ),
        (F.col("n") - 1).alias("df"),
    )


@query(
    "agg_holm_bonferroni",
    bounded_cross="1-row global-share scalar onto the 25-nation cell table",
    oracle="""
WITH cells AS (
  SELECT c_nationkey AS nation, c_mktsegment AS seg,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM customer GROUP BY 1, 2
), seg_tot AS (
  SELECT seg, CAST(SUM(o) AS BIGINT) AS st FROM cells GROUP BY seg
), grand AS (
  SELECT CAST(SUM(o) AS BIGINT) AS g FROM cells
), nat_tot AS (
  SELECT nation, CAST(SUM(o) AS BIGINT) AS nt FROM cells GROUP BY nation
), full_cells AS (
  SELECT n.nation, s.seg, n.nt, s.st, COALESCE(c.o, 0) AS o
  FROM nat_tot n CROSS JOIN seg_tot s
  LEFT JOIN cells c ON c.nation = n.nation AND c.seg = s.seg
), chi AS (
  SELECT nation,
         list_sum(list(
           (CAST(o AS DOUBLE)
            - CAST(nt AS DOUBLE) * st / (SELECT g FROM grand))
           * (CAST(o AS DOUBLE)
              - CAST(nt AS DOUBLE) * st / (SELECT g FROM grand))
           / (CAST(nt AS DOUBLE) * st / (SELECT g FROM grand))
           ORDER BY seg)) AS chi2
  FROM full_cells GROUP BY nation
), pv AS (
  SELECT nation, chi2,
         exp(-chi2 / 2) * (CAST(1 AS DOUBLE) + chi2 / 2) AS p
  FROM chi
), ranked AS (
  SELECT nation, p,
         ROW_NUMBER() OVER (ORDER BY p, nation) AS rnk,
         COUNT(*) OVER () AS m
  FROM pv
), flags AS (
  SELECT nation, p, rnk, m,
         CAST(0.05 AS DOUBLE) / (m - rnk + 1) AS holm_threshold,
         p <= CAST(0.05 AS DOUBLE) / (m - rnk + 1) AS step_ok
  FROM ranked
), cutoff AS (
  SELECT COALESCE(MIN(CASE WHEN NOT step_ok THEN rnk END) - 1,
                  (SELECT MAX(m) FROM flags)) AS kstar
  FROM flags
)
SELECT nation, round(p, 9) AS p_value, CAST(rnk AS BIGINT) AS rnk,
       holm_threshold,
       rnk <= (SELECT kstar FROM cutoff) AS rejected_holm,
       p <= CAST(0.05 AS DOUBLE) / m AS rejected_bonferroni
FROM flags
""",
)
def agg_holm_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm step-down correction (with the plain Bonferroni column
    for contrast) over the SAME 25 nation-vs-global segment-mix
    chi-square family agg_benjamini_hochberg controls by FDR — the
    FWER-controlling counterpart: reject ranks 1..k* where k* is
    the last rank before the first p_(i) > alpha/(m-i+1) failure.
    Holm dominates Bonferroni uniformly, and reading all three keys
    side by side shows the FDR-vs-FWER power gap on real counts.

    Exactness: identical pv construction to the BH key (exact
    integer cells, segment-ordered strict folds, closed-form even-df
    p; cross-engine exp <= 1 ulp, accepted and verified); the
    step-down cutoff is a MIN over integer ranks. Scale shape: two
    hash aggregates to <= 25x5 cells, bounded 25-row windows."""
    c = load(spark, sf_dir, "customer")
    cells = c.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    seg_tot = cells.groupBy("seg").agg(F.sum("o").cast("bigint").alias("st"))
    nat_tot = cells.groupBy("nation").agg(
        F.sum("o").cast("bigint").alias("nt")
    )
    g = cells.agg(F.sum("o")).collect()[0][0]
    full_cells = (
        nat_tot.crossJoin(F.broadcast(seg_tot))
        .join(cells, ["nation", "seg"], "left")
        .select(
            "nation", "seg", "nt", "st", F.coalesce("o", F.lit(0)).alias("o")
        )
    )
    e = F.col("nt").cast("double") * F.col("st") / F.lit(g)
    terms = full_cells.select(
        "nation",
        "seg",
        (
            (F.col("o").cast("double") - e)
            * (F.col("o").cast("double") - e)
            / e
        ).alias("term"),
    )
    chi = terms.groupBy("nation").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("seg", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("chi2")
    )
    pv = chi.select(
        "nation",
        (
            F.exp(-F.col("chi2") / 2)
            * (F.lit(1).cast("double") + F.col("chi2") / 2)
        ).alias("p"),
    )
    # bounded: 25 nation rows
    wr = Window.orderBy("p", "nation")
    ranked = pv.select(
        "nation",
        "p",
        F.row_number().over(wr).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    thr = F.lit(0.05).cast("double") / (F.col("m") - F.col("rnk") + 1)
    flags = ranked.select(
        "nation",
        "p",
        "rnk",
        "m",
        thr.alias("holm_threshold"),
        (F.col("p") <= thr).alias("step_ok"),
    )
    kstar = flags.agg(
        F.coalesce(
            F.min(F.when(~F.col("step_ok"), F.col("rnk"))) - 1,
            F.max("m"),
        ).alias("kstar")
    ).collect()[0]["kstar"]
    return flags.select(
        "nation",
        F.round("p", 9).alias("p_value"),
        F.col("rnk").cast("bigint").alias("rnk"),
        "holm_threshold",
        (F.col("rnk") <= F.lit(int(kstar))).alias("rejected_holm"),
        (F.col("p") <= F.lit(0.05).cast("double") / F.col("m")).alias(
            "rejected_bonferroni"
        ),
    )


@query(
    "agg_last_digit_test",
    bounded_cross="1-row corpus-count scalar onto the 10-digit table",
    oracle="""
WITH obs AS (
  SELECT CAST(CAST(round(o_totalprice * 100) AS BIGINT) % 10 AS INTEGER)
           AS digit,
         CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM orders GROUP BY 1
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders
), digits AS (
  SELECT CAST(unnest(generate_series(0, 9)) AS INTEGER) AS digit
)
SELECT d.digit,
       COALESCE(o.n_obs, 0) AS n_obs,
       CAST(n.n AS DOUBLE) / 10 AS expected,
       CAST((10 * COALESCE(o.n_obs, 0) - n.n)
            * (10 * COALESCE(o.n_obs, 0) - n.n) AS DOUBLE)
         / CAST(10 * n.n AS DOUBLE) AS chi2_term
FROM digits d LEFT JOIN obs o ON o.digit = d.digit, n
""",
)
def agg_last_digit_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-digit uniformity screen on order cents — the forensic
    companion of agg_benford: genuine transactional amounts have
    UNIFORM last digits (chi2 vs n/10 expected), while fabricated
    or psychologically-priced amounts cluster on 0/5/9; reading
    this next to the Benford first-digit screen catches both tail
    types. Per-digit chi-square contribution via the exact-integer
    identity (obs - n/10)^2/(n/10) = (10*obs - n)^2 / (10n).

    Exactness: digit counts are exact; the chi2 numerator
    (10*obs - n)^2 is exact bigint (~2e16 at a 100x corpus, inside
    int64); one float division per row. Scale shape: one hash
    aggregate to <=10 rows, a broadcast join to the literal digit
    table, a declared 1-row count cross."""
    o = load(spark, sf_dir, "orders")
    obs = (
        o.select(
            (F.expr(cents("o_totalprice")) % 10).cast("int").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    )
    n1 = o.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    digits = spark.createDataFrame([(d,) for d in range(10)], "digit int")
    base = digits.join(F.broadcast(obs), "digit", "left").crossJoin(
        F.broadcast(n1)
    )
    n_obs = F.coalesce(F.col("n_obs"), F.lit(0).cast("bigint"))
    diff = 10 * n_obs - F.col("n")
    return base.select(
        "digit",
        n_obs.alias("n_obs"),
        (F.col("n").cast("double") / 10).alias("expected"),
        ((diff * diff).cast("double") / (10 * F.col("n")).cast("double")).alias(
            "chi2_term"
        ),
    )


@query(
    "agg_energy_distance",
    oracle="""
WITH s AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS tr,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c, o_orderkey
  FROM orders
), all_r AS (
  SELECT tr, c, ROW_NUMBER() OVER (ORDER BY c, o_orderkey) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM s
), grp_r AS (
  SELECT tr, c,
         ROW_NUMBER() OVER (PARTITION BY tr ORDER BY c, o_orderkey) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY tr) AS BIGINT) AS n
  FROM s
), sums AS (
  SELECT
    (SELECT CAST(CAST(SUM(CAST(2 * rn - 1 - n AS HUGEINT) * c)
                 AS VARCHAR) AS DOUBLE) FROM all_r) AS s_all,
    (SELECT CAST(CAST(SUM(CAST(2 * rn - 1 - n AS HUGEINT) * c)
                 AS VARCHAR) AS DOUBLE) FROM grp_r WHERE tr = 1) AS s_t,
    (SELECT CAST(CAST(SUM(CAST(2 * rn - 1 - n AS HUGEINT) * c)
                 AS VARCHAR) AS DOUBLE) FROM grp_r WHERE tr = 0) AS s_c,
    (SELECT CAST(SUM(tr) AS BIGINT) FROM s) AS nt,
    (SELECT CAST(SUM(1 - tr) AS BIGINT) FROM s) AS nc
), st AS (
  SELECT nt, nc,
         (s_all - s_t - s_c) / (CAST(nt AS DOUBLE) * nc) AS ab,
         s_t / (CAST(nt AS DOUBLE) * nt) AS aa,
         s_c / (CAST(nc AS DOUBLE) * nc) AS bb
  FROM sums
)
SELECT nt AS n_treated, nc AS n_control,
       ab / 100 AS mean_cross_dollars,
       (2 * ab - aa - bb) / 100 AS energy_dist_dollars,
       (CAST(nt AS DOUBLE) * nc / (nt + nc)) * (2 * ab - aa - bb) / 100
         AS energy_stat
FROM st
""",
)
def agg_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy distance two-sample test (Szekely-Rizzo) between
    URGENT and other order values: E = 2 E|X-Y| - E|X-X'| - E|Y-Y'|
    — the characteristic-function-complete test that detects ANY
    distributional difference (KS sees the largest CDF gap, CvM the
    integrated square; energy distance is zero IFF the laws are
    equal), with the nt*nc/(nt+nc)-scaled statistic practitioners
    permute. In 1-D the three pairwise-|diff| sums collapse to the
    EXACT rank identity sum (2i - 1 - n) x_(i), so no pair ever
    materializes.

    Exactness: all three weighted rank sums are exact integers
    (coefficients x values through HUGEINT/decimal(38) — ~3e17 at
    sf0.1, ~3e23 at 100x, the wide type is load-bearing); ranks use
    the deterministic (cents, key) order; the E-statistics are
    fixed double expressions. Scale shape: THREE passes of the
    two-phase global-rank machinery (combined + each group slice,
    all score-bucketed), three 1-row reductions."""
    from ..plans.global_rank import with_global_row_number

    s = load(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("tr"),
        F.expr(cents("o_totalprice")).alias("c"),
        "o_orderkey",
    )

    def wsum(df):
        ranked, n = with_global_row_number(
            df, ["c", "o_orderkey"], out_col="rn"
        )
        row = ranked.agg(
            F.sum(
                (2 * F.col("rn") - 1 - F.lit(n)).cast("decimal(38,0)")
                * F.col("c")
            )
            .cast("double")
            .alias("w")
        ).collect()[0]
        return float(row["w"]), n

    s_all, n_all = wsum(s)
    s_t, n_t = wsum(s.filter(F.col("tr") == 1))
    s_c, n_c = wsum(s.filter(F.col("tr") == 0))
    one = s.sparkSession.createDataFrame(
        [(n_t, n_c, s_all, s_t, s_c)],
        "nt bigint, nc bigint, s_all double, s_t double, s_c double",
    )
    ab = (F.col("s_all") - F.col("s_t") - F.col("s_c")) / (
        F.col("nt").cast("double") * F.col("nc")
    )
    aa = F.col("s_t") / (F.col("nt").cast("double") * F.col("nt"))
    bb = F.col("s_c") / (F.col("nc").cast("double") * F.col("nc"))
    e = 2 * ab - aa - bb
    return one.select(
        F.col("nt").alias("n_treated"),
        F.col("nc").alias("n_control"),
        (ab / 100).alias("mean_cross_dollars"),
        (e / 100).alias("energy_dist_dollars"),
        (
            (F.col("nt").cast("double") * F.col("nc") / (F.col("nt") + F.col("nc")))
            * e
            / 100
        ).alias("energy_stat"),
    )


@query(
    "agg_benjamini_yekutieli",
    bounded_cross="1-row global-share scalar onto the 25-nation cell table",
    oracle="""
WITH cells AS (
  SELECT c_nationkey AS nation, c_mktsegment AS seg,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM customer GROUP BY 1, 2
), seg_tot AS (
  SELECT seg, CAST(SUM(o) AS BIGINT) AS st FROM cells GROUP BY seg
), grand AS (
  SELECT CAST(SUM(o) AS BIGINT) AS g FROM cells
), nat_tot AS (
  SELECT nation, CAST(SUM(o) AS BIGINT) AS nt FROM cells GROUP BY nation
), full_cells AS (
  SELECT n.nation, s.seg, n.nt, s.st, COALESCE(c.o, 0) AS o
  FROM nat_tot n CROSS JOIN seg_tot s
  LEFT JOIN cells c ON c.nation = n.nation AND c.seg = s.seg
), chi AS (
  SELECT nation,
         list_sum(list(
           (CAST(o AS DOUBLE)
            - CAST(nt AS DOUBLE) * st / (SELECT g FROM grand))
           * (CAST(o AS DOUBLE)
              - CAST(nt AS DOUBLE) * st / (SELECT g FROM grand))
           / (CAST(nt AS DOUBLE) * st / (SELECT g FROM grand))
           ORDER BY seg)) AS chi2
  FROM full_cells GROUP BY nation
), pv AS (
  SELECT nation,
         exp(-chi2 / 2) * (CAST(1 AS DOUBLE) + chi2 / 2) AS p
  FROM chi
), ranked AS (
  SELECT nation, p,
         ROW_NUMBER() OVER (ORDER BY p, nation) AS rnk,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM pv
), cm AS (
  SELECT list_sum(list(1.0 / rnk ORDER BY rnk)) AS c
  FROM ranked
), cutoff AS (
  SELECT COALESCE(MAX(CASE WHEN r.p <= r.rnk * CAST(0.05 AS DOUBLE)
                                       / (r.m * cm.c)
                           THEN r.rnk END), 0) AS kstar
  FROM ranked r, cm
)
SELECT r.nation, round(r.p, 9) AS p_value,
       CAST(r.rnk AS BIGINT) AS rnk,
       r.rnk * CAST(0.05 AS DOUBLE) / (r.m * cm.c) AS by_threshold,
       r.rnk <= (SELECT kstar FROM cutoff) AS rejected_by
FROM ranked r, cm
""",
)
def agg_benjamini_yekutieli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Yekutieli FDR control over the same 25 nation
    chi-square tests as the BH and Holm keys — the correction that
    stays valid under ARBITRARY dependence between tests (BH
    assumes positive dependence) by paying the harmonic factor
    c(m) = sum 1/i. The three keys side by side display the full
    power ordering BY <= Holm/Bonferroni-ish <= BH and WHY each is
    chosen. Identical pv construction (exact cells, closed-form
    even-df p, <=1-ulp exp accepted); the harmonic constant folds
    in rank order (bounded 25 terms); the step-up cutoff mirrors
    BH's. Same bounded scale shape as the siblings."""
    c = load(spark, sf_dir, "customer")
    cells = c.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    seg_tot = cells.groupBy("seg").agg(F.sum("o").cast("bigint").alias("st"))
    nat_tot = cells.groupBy("nation").agg(
        F.sum("o").cast("bigint").alias("nt")
    )
    g = cells.agg(F.sum("o")).collect()[0][0]
    full_cells = (
        nat_tot.crossJoin(F.broadcast(seg_tot))
        .join(cells, ["nation", "seg"], "left")
        .select(
            "nation", "seg", "nt", "st", F.coalesce("o", F.lit(0)).alias("o")
        )
    )
    e = F.col("nt").cast("double") * F.col("st") / F.lit(g)
    terms = full_cells.select(
        "nation",
        "seg",
        (
            (F.col("o").cast("double") - e)
            * (F.col("o").cast("double") - e)
            / e
        ).alias("term"),
    )
    chi = terms.groupBy("nation").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("seg", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("chi2")
    )
    pv = chi.select(
        "nation",
        (
            F.exp(-F.col("chi2") / 2)
            * (F.lit(1).cast("double") + F.col("chi2") / 2)
        ).alias("p"),
    )
    # bounded: 25 nation rows
    wr = Window.orderBy("p", "nation")
    ranked = pv.select(
        "nation",
        "p",
        F.row_number().over(wr).alias("rnk"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("m"),
    )
    cm = ranked.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct("rnk", (F.lit(1.0) / F.col("rnk")).alias("v"))
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("c")
    )
    j = ranked.crossJoin(F.broadcast(cm))
    thr = F.col("rnk") * F.lit(0.05).cast("double") / (F.col("m") * F.col("c"))
    kstar = j.agg(
        F.coalesce(
            F.max(F.when(F.col("p") <= thr, F.col("rnk"))), F.lit(0)
        ).alias("k")
    ).collect()[0]["k"]
    return j.select(
        "nation",
        F.round("p", 9).alias("p_value"),
        F.col("rnk").cast("bigint").alias("rnk"),
        thr.alias("by_threshold"),
        (F.col("rnk") <= F.lit(int(kstar))).alias("rejected_by"),
    )


@query(
    "agg_hotelling_t2",
    bounded_cross="two 1-row group-moment scalars crossed into one row",
    oracle="""
WITH base AS (
  SELECT CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS tr,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS y,
         l.nl AS x
  FROM orders o
  JOIN (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS nl
        FROM lineitem GROUP BY 1) l ON l.l_orderkey = o.o_orderkey
), g AS (
  SELECT tr, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(CAST(SUM(CAST(y AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) AS syy,
         CAST(CAST(SUM(CAST(x AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) AS sxy
  FROM base GROUP BY tr
), w AS (
  SELECT t.n AS n1, c.n AS n2,
         CAST(t.sx AS DOUBLE) / t.n - CAST(c.sx AS DOUBLE) / c.n AS dx,
         CAST(t.sy AS DOUBLE) / t.n - CAST(c.sy AS DOUBLE) / c.n AS dy,
         ((CAST(t.sxx AS DOUBLE) - (CAST(t.sx AS DOUBLE) / t.n) * t.sx)
          + (CAST(c.sxx AS DOUBLE) - (CAST(c.sx AS DOUBLE) / c.n) * c.sx))
           / (t.n + c.n - 2) AS vxx,
         ((t.syy - (CAST(t.sy AS DOUBLE) / t.n) * t.sy)
          + (c.syy - (CAST(c.sy AS DOUBLE) / c.n) * c.sy))
           / (t.n + c.n - 2) AS vyy,
         ((t.sxy - (CAST(t.sx AS DOUBLE) / t.n) * t.sy)
          + (c.sxy - (CAST(c.sx AS DOUBLE) / c.n) * c.sy))
           / (t.n + c.n - 2) AS vxy
  FROM g t, g c WHERE t.tr = 1 AND c.tr = 0
)
SELECT n1 AS n_treated, n2 AS n_control,
       dx AS mean_diff_lines,
       dy / 100 AS mean_diff_dollars,
       (CAST(n1 AS DOUBLE) * n2 / (n1 + n2))
         * (dx * (vyy * dx - vxy * dy) + dy * (vxx * dy - vxy * dx))
         / (vxx * vyy - vxy * vxy) AS t2_stat,
       (CAST(n1 AS DOUBLE) + n2 - 2 - 1)
         / ((CAST(n1 AS DOUBLE) + n2 - 2) * 2)
         * ((CAST(n1 AS DOUBLE) * n2 / (n1 + n2))
            * (dx * (vyy * dx - vxy * dy) + dy * (vxx * dy - vxy * dx))
            / (vxx * vyy - vxy * vxy)) AS f_stat
FROM w
""",
)
def agg_hotelling_t2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hotelling's T^2 two-sample test on the (basket size, order
    value) mean VECTOR, URGENT vs the rest: T^2 = (n1 n2/(n1+n2))
    d' S_pooled^-1 d with the 2x2 pooled covariance inverted in
    closed form (the anomaly_mahalanobis discipline), plus the
    exact F-scaling (n1+n2-p-1)/((n1+n2-2)p) — the multivariate
    generalization of agg_ttest_welch that respects the correlation
    between the two outcomes (two separate t-tests double-count the
    shared variance; T^2 does not).

    Exactness: per-group moment matrices are exact integers (y
    products via HUGEINT/decimal(38)); the quadratic form expands
    the 2x2 inverse literally (dx*(vyy*dx - vxy*dy) + dy*(...)
    over the determinant) in identical order; numpy-pinned per the
    closed-form rule. Scale shape: one lineitem count aggregate,
    one 2-group hash aggregate, a declared 1-row cross."""
    nl = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    base = (
        load(spark, sf_dir, "orders")
        .join(nl, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("tr"),
            F.expr(cents("o_totalprice")).alias("y"),
            "x",
        )
    )
    g = base.groupBy("tr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("syy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("sxy"),
    )
    t = g.filter(F.col("tr") == 1).select(
        *[F.col(c).alias(f"t_{c}") for c in ("n", "sx", "sxx", "sy", "syy", "sxy")]
    )
    c = g.filter(F.col("tr") == 0).select(
        *[F.col(c).alias(f"c_{c}") for c in ("n", "sx", "sxx", "sy", "syy", "sxy")]
    )
    j = t.crossJoin(F.broadcast(c))

    def mean(p, col):
        return F.col(f"{p}_{col}").cast("double") / F.col(f"{p}_n")

    dof = F.col("t_n") + F.col("c_n") - 2
    dx = mean("t", "sx") - mean("c", "sx")
    dy = mean("t", "sy") - mean("c", "sy")
    vxx = (
        (F.col("t_sxx").cast("double") - mean("t", "sx") * F.col("t_sx"))
        + (F.col("c_sxx").cast("double") - mean("c", "sx") * F.col("c_sx"))
    ) / dof
    vyy = (
        (F.col("t_syy") - mean("t", "sy") * F.col("t_sy"))
        + (F.col("c_syy") - mean("c", "sy") * F.col("c_sy"))
    ) / dof
    vxy = (
        (F.col("t_sxy") - mean("t", "sx") * F.col("t_sy"))
        + (F.col("c_sxy") - mean("c", "sx") * F.col("c_sy"))
    ) / dof
    scale = F.col("t_n").cast("double") * F.col("c_n") / (
        F.col("t_n") + F.col("c_n")
    )
    t2 = (
        scale
        * (dx * (vyy * dx - vxy * dy) + dy * (vxx * dy - vxy * dx))
        / (vxx * vyy - vxy * vxy)
    )
    fs = (
        (F.col("t_n").cast("double") + F.col("c_n") - 2 - 1)
        / ((F.col("t_n").cast("double") + F.col("c_n") - 2) * 2)
        * t2
    )
    return j.select(
        F.col("t_n").alias("n_treated"),
        F.col("c_n").alias("n_control"),
        dx.alias("mean_diff_lines"),
        (dy / 100).alias("mean_diff_dollars"),
        t2.alias("t2_stat"),
        fs.alias("f_stat"),
    )


YUEN_TRIM_PCT = 10  # symmetric trim fraction per tail


@query(
    "agg_yuen_test",
    bounded_cross="two 1-row trimmed-moment scalars crossed into one row",
    oracle=f"""
WITH s AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS tr,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c, o_orderkey
  FROM orders
), r AS (
  SELECT tr, c,
         ROW_NUMBER() OVER (PARTITION BY tr ORDER BY c, o_orderkey) AS i,
         CAST(COUNT(*) OVER (PARTITION BY tr) AS BIGINT) AS n
  FROM s
), wz AS (
  SELECT tr, n, ({YUEN_TRIM_PCT} * n) // 100 AS g,
         CASE WHEN i <= ({YUEN_TRIM_PCT} * n) // 100 THEN 'lo'
              WHEN i > n - ({YUEN_TRIM_PCT} * n) // 100 THEN 'hi'
              ELSE 'mid' END AS zone,
         c, i
  FROM r
), bounds AS (
  SELECT tr,
         MIN(CASE WHEN zone = 'mid' THEN c END) AS lo_c,
         MAX(CASE WHEN zone = 'mid' THEN c END) AS hi_c
  FROM wz GROUP BY tr
), win AS (
  SELECT wz.tr, wz.n, wz.g,
         CASE WHEN wz.zone = 'lo' THEN b.lo_c
              WHEN wz.zone = 'hi' THEN b.hi_c
              ELSE wz.c END AS w,
         CASE WHEN wz.zone = 'mid' THEN wz.c END AS t
  FROM wz JOIN bounds b ON b.tr = wz.tr
), m AS (
  SELECT tr, MAX(n) AS n, MAX(g) AS g,
         CAST(COUNT(t) AS BIGINT) AS h,
         CAST(SUM(t) AS BIGINT) AS st,
         CAST(SUM(w) AS BIGINT) AS sw,
         CAST(CAST(SUM(CAST(w AS HUGEINT) * w) AS VARCHAR) AS DOUBLE) AS sww
  FROM win GROUP BY tr
), f AS (
  SELECT tr, n, h,
         CAST(st AS DOUBLE) / h AS tmean,
         (sww - (CAST(sw AS DOUBLE) / n) * sw) / (n - 1) AS wvar
  FROM m
)
SELECT a.h AS h_treated, b.h AS h_control,
       (a.tmean - b.tmean) / 100 AS trimmed_diff_dollars,
       (a.tmean - b.tmean)
         / sqrt((CAST(a.n - 1 AS DOUBLE) * a.wvar) / (a.h * (a.h - 1))
                + (CAST(b.n - 1 AS DOUBLE) * b.wvar) / (b.h * (b.h - 1)))
         AS yuen_t
FROM f a, f b WHERE a.tr = 1 AND b.tr = 0
""",
)
def agg_yuen_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yuen's trimmed-means robust t-test (URGENT vs rest order
    values, {YUEN_TRIM_PCT}% symmetric trim): trimmed means compared
    with WINSORIZED variances — the heavy-tail-robust replacement
    for Welch's t (agg_ttest_welch breaks down exactly where money
    data lives; Yuen keeps nominal error rates under contamination).
    Winsorized values clamp each tail to the innermost surviving
    observation.

    Exactness: trim boundaries are exact integer rank cuts under
    the (cents, key) order; winsorized values stay exact integers
    (clamped to data values), so all moments are exact
    (HUGEINT/decimal(38) squares); the statistic is one fixed
    double expression. Scale shape: per-group rank windows (the
    2-partition trade-off the agg_qte/cvm precedents document —
    acceptable because the heavy reduction follows immediately),
    one 2-row hash aggregate, a declared 1-row cross."""
    s = load(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("tr"),
        F.expr(cents("o_totalprice")).alias("c"),
        "o_orderkey",
    )
    # bounded: 2-partition rank window feeding an immediate reduction
    wr = Window.partitionBy("tr").orderBy("c", "o_orderkey")
    wn = Window.partitionBy("tr")
    r = s.select(
        "tr",
        "c",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )
    gcut = F.expr(f"({YUEN_TRIM_PCT} * n) div 100")
    wz = r.select(
        "tr",
        "n",
        gcut.alias("g"),
        F.when(F.col("i") <= gcut, "lo")
        .when(F.col("i") > F.col("n") - gcut, "hi")
        .otherwise("mid")
        .alias("zone"),
        "c",
    )
    bounds = wz.groupBy("tr").agg(
        F.min(F.when(F.col("zone") == "mid", F.col("c"))).alias("lo_c"),
        F.max(F.when(F.col("zone") == "mid", F.col("c"))).alias("hi_c"),
    )
    win = wz.join(bounds, "tr").select(
        "tr",
        "n",
        "g",
        F.when(F.col("zone") == "lo", F.col("lo_c"))
        .when(F.col("zone") == "hi", F.col("hi_c"))
        .otherwise(F.col("c"))
        .alias("w"),
        F.when(F.col("zone") == "mid", F.col("c")).alias("t"),
    )
    m = win.groupBy("tr").agg(
        F.max("n").alias("n"),
        F.max("g").alias("g"),
        F.count("t").cast("bigint").alias("h"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum("w").cast("bigint").alias("sw"),
        F.sum(F.col("w").cast("decimal(38,0)") * F.col("w"))
        .cast("double")
        .alias("sww"),
    )
    f = m.select(
        "tr",
        "n",
        "h",
        (F.col("st").cast("double") / F.col("h")).alias("tmean"),
        (
            (F.col("sww") - (F.col("sw").cast("double") / F.col("n")) * F.col("sw"))
            / (F.col("n") - 1)
        ).alias("wvar"),
    )
    a = f.filter(F.col("tr") == 1).select(
        F.col("h").alias("ha"), F.col("n").alias("na"),
        F.col("tmean").alias("ma"), F.col("wvar").alias("va"),
    )
    b = f.filter(F.col("tr") == 0).select(
        F.col("h").alias("hb"), F.col("n").alias("nb"),
        F.col("tmean").alias("mb"), F.col("wvar").alias("vb"),
    )
    j = a.crossJoin(F.broadcast(b))
    d = F.col("ma") - F.col("mb")
    se = F.sqrt(
        ((F.col("na") - 1).cast("double") * F.col("va"))
        / (F.col("ha") * (F.col("ha") - 1))
        + ((F.col("nb") - 1).cast("double") * F.col("vb"))
        / (F.col("hb") * (F.col("hb") - 1))
    )
    return j.select(
        F.col("ha").alias("h_treated"),
        F.col("hb").alias("h_control"),
        (d / 100).alias("trimmed_diff_dollars"),
        (d / se).alias("yuen_t"),
    )


@query(
    "agg_rank_biserial",
    oracle="""
WITH s AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS tr,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c, o_orderkey
  FROM orders
), r AS (
  SELECT tr,
         ROW_NUMBER() OVER (ORDER BY c, tr, o_orderkey) AS r,
         ROW_NUMBER() OVER (PARTITION BY tr
                            ORDER BY c, o_orderkey) AS i
  FROM s
), lteq AS (
  SELECT CAST(SUM(CASE WHEN tr = 1 THEN r - i ELSE 0 END) AS BIGINT) AS le
  FROM r
), ties AS (
  SELECT CAST(SUM(nt * nc) AS BIGINT) AS eq
  FROM (SELECT c,
               CAST(SUM(tr) AS BIGINT) AS nt,
               CAST(SUM(1 - tr) AS BIGINT) AS nc
        FROM s GROUP BY c)
), nn AS (
  SELECT CAST(SUM(tr) AS BIGINT) AS nt, CAST(SUM(1 - tr) AS BIGINT) AS nc
  FROM s
)
SELECT nn.nt AS n_treated, nn.nc AS n_control,
       CAST(lteq.le AS DOUBLE) - CAST(ties.eq AS DOUBLE) / 2 AS u_mw,
       2 * (CAST(lteq.le AS DOUBLE) - CAST(ties.eq AS DOUBLE) / 2)
         / (CAST(nn.nt AS DOUBLE) * nn.nc) - 1 AS rank_biserial,
       (CAST(lteq.le AS DOUBLE) - CAST(ties.eq AS DOUBLE) / 2)
         / (CAST(nn.nt AS DOUBLE) * nn.nc) AS common_language_es
FROM lteq, ties, nn
""",
)
def agg_rank_biserial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biserial correlation (Cliff's delta) and the common-
    language effect size for URGENT vs other order values — the
    EFFECT-SIZE companions the agg_mannwhitney_u significance test
    should always be reported with (cohens_d assumes normality;
    these read directly as 'probability a random urgent order
    exceeds a random other one'). Exact tie handling: ordering by
    (value, group, key) puts equal-valued controls before treated,
    so sum(r - i) over treated counts #less-than PLUS #equal
    exactly, and U = that sum minus half the exact per-value tie
    pair count.

    Exactness: sum(r - i) over treated rows equals the number of
    (control, treated) pairs where the control precedes the treated
    in the (c, tr, k) total order — the 2-group case of the
    agg_jonckheere predecessor identity — so `le` comes from ONE
    range-bucketed sorted Arrow pass (r10, guide §2.3: the old
    shape ran TWO full global-rank pipelines, a control count and
    the le reduction); the per-(bucket, tr) cell counts give the
    cross-bucket control offsets AND n_t/n_c for free; the tie-pair
    table is one hash aggregate over the same checkpointed bucket
    table; U and both effect sizes are fixed double expressions.
    Scale shape: one quantile pass + one cell count + one sorted
    pass + one tie aggregate."""
    import numpy as np
    import pandas as pd

    from ..plans.global_rank import with_range_bucket

    s = load(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("tr"),
        F.expr(cents("o_totalprice")).alias("c"),
        "o_orderkey",
    )
    nb = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    bucketed = with_range_bucket(s, "c", nb).localCheckpoint(eager=False)
    cell = (
        bucketed.groupBy("_gr_bucket", "tr")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    )
    per_bucket: dict[int, list[int]] = {}
    for r in cell:
        per_bucket.setdefault(r["_gr_bucket"], [0, 0])[int(r["tr"])] += int(
            r["n"]
        )
    n_c = sum(v[0] for v in per_bucket.values())
    n_t = sum(v[1] for v in per_bucket.values())
    # controls in buckets STRICTLY before b (jonckheere offset trick)
    c_off: dict[int, int] = {}
    run = 0
    for b in sorted(per_bucket):
        c_off[b] = run
        run += per_bucket[b][0]

    def lepass(batches):
        state = dict(c_off)  # bucket -> controls seen before cursor
        for pdf in batches:
            if not len(pdf):
                continue
            buckets = pdf["_gr_bucket"].to_numpy()
            tr = pdf["tr"].to_numpy()
            le = 0
            seg_starts = np.flatnonzero(
                np.concatenate(([True], buckets[1:] != buckets[:-1]))
            )
            seg_ends = np.concatenate((seg_starts[1:], [len(buckets)]))
            for s_, e_ in zip(seg_starts, seg_ends):
                b = int(buckets[s_])
                t = tr[s_:e_]
                # controls preceding each treated row = cross-bucket
                # offset + exclusive within-segment cumulative
                within = np.cumsum(t == 0)
                m = t == 1
                le += int(within[m].sum()) + state[b] * int(m.sum())
                state[b] += int((t == 0).sum())
            yield pd.DataFrame({"le": np.array([le], dtype=np.int64)})

    le = int(
        bucketed.repartition(nb, "_gr_bucket")
        .sortWithinPartitions("c", "tr", "o_orderkey")
        .mapInPandas(lepass, "le bigint")
        .agg(F.sum("le").cast("bigint").alias("le"))
        .collect()[0]["le"]
    )
    eq = int(
        bucketed.groupBy("c")
        .agg(
            F.sum("tr").cast("bigint").alias("nt"),
            F.sum(1 - F.col("tr")).cast("bigint").alias("nc"),
        )
        .agg(F.sum(F.col("nt") * F.col("nc")).cast("bigint").alias("eq"))
        .collect()[0]["eq"]
    )
    one = s.sparkSession.createDataFrame(
        [(n_t, n_c, le, eq)], "nt bigint, nc bigint, le bigint, eq bigint"
    )
    u = F.col("le").cast("double") - F.col("eq").cast("double") / 2
    nm = F.col("nt").cast("double") * F.col("nc")
    return one.select(
        F.col("nt").alias("n_treated"),
        F.col("nc").alias("n_control"),
        u.alias("u_mw"),
        (2 * u / nm - 1).alias("rank_biserial"),
        (u / nm).alias("common_language_es"),
    )


@query(
    "agg_page_trend",
    oracle="""
WITH cells AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         o_orderpriority AS prio,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
), v AS (
  SELECT yr, prio,
         CAST(s AS DOUBLE) / n AS m,
         CAST(SUBSTR(prio, 1, 1) AS INTEGER) AS j
  FROM cells
), rk AS (
  SELECT yr, j,
         CAST(ROW_NUMBER() OVER (PARTITION BY yr ORDER BY m, prio)
              AS BIGINT) AS r
  FROM v
), colsum AS (
  SELECT j, CAST(SUM(r) AS BIGINT) AS rj FROM rk GROUP BY j
), l AS (
  SELECT CAST(SUM(j * rj) AS BIGINT) AS l,
         (SELECT CAST(COUNT(DISTINCT yr) AS BIGINT) FROM rk) AS b
  FROM colsum
)
SELECT l AS page_l, b AS n_blocks,
       CAST(b * 5 * 36 AS DOUBLE) / 4 AS e_l,
       CAST(b * 25 * 6 * 24 AS DOUBLE) / 144 AS var_l,
       (CAST(l AS DOUBLE) - CAST(b * 5 * 36 AS DOUBLE) / 4)
         / sqrt(CAST(b * 25 * 6 * 24 AS DOUBLE) / 144) AS z
FROM l
""",
)
def agg_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L test for an ORDERED alternative in a randomized-block
    design: blocks are order YEARS, treatments the 5 priorities in
    their natural dose order, and within each year the priorities'
    mean order values are ranked; L = sum over treatments of
    j * (rank column sum), with null mean bk(k+1)^2/4 and variance
    bk^2(k+1)(k^2-1)/144 (k = 5 literals folded into the
    expressions) — the blocked counterpart of agg_jonckheere (which
    pools all rows; Page respects year-level baselines the way
    agg_friedman_test does for the unordered case).

    Exactness: cell means are identical single divisions of exact
    integers; within-block ranks are deterministic ((mean, prio)
    ties); L and both null moments are exact integer arithmetic.
    Scale shape: one 35-cell hash aggregate, bounded 5-row block
    windows, a 1-row reduction."""
    cells = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(
            F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    v = cells.select(
        "yr",
        "prio",
        (F.col("s").cast("double") / F.col("n")).alias("m"),
        F.substring("prio", 1, 1).cast("int").alias("j"),
    )
    wb = Window.partitionBy("yr").orderBy("m", "prio")
    rk = v.select(
        "yr", "j", F.row_number().over(wb).cast("bigint").alias("r")
    )
    colsum = rk.groupBy("j").agg(F.sum("r").cast("bigint").alias("rj"))
    b = rk.select("yr").distinct().count()
    lrow = colsum.agg(
        F.sum(F.col("j") * F.col("rj")).cast("bigint").alias("l")
    )
    e_l = float(b * 5 * 36) / 4
    var_l = float(b * 25 * 6 * 24) / 144
    return lrow.select(
        F.col("l").alias("page_l"),
        F.lit(b).cast("bigint").alias("n_blocks"),
        F.lit(e_l).alias("e_l"),
        F.lit(var_l).alias("var_l"),
        ((F.col("l").cast("double") - F.lit(e_l)) / F.sqrt(F.lit(var_l))).alias(
            "z"
        ),
    )


@query(
    "agg_morans_i",
    bounded_cross="25x25 nation adjacency grid + 1-row moment scalar",
    oracle="""
WITH v AS (
  SELECT c.c_nationkey AS nk, n.n_regionkey AS rk,
         CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         list_sum(list(CAST(s AS DOUBLE) / cnt ORDER BY nk)) AS sm
  FROM v
), z AS (
  SELECT v.nk, v.rk,
         CAST(v.s AS DOUBLE) / v.cnt - m.sm / m.n AS z, m.n
  FROM v, m
), num AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS w,
         list_sum(list(a.z * b.z ORDER BY a.nk, b.nk)) AS cross_sum,
         MAX(a.n) AS n
  FROM z a JOIN z b ON a.rk = b.rk AND a.nk <> b.nk
), den AS (
  SELECT list_sum(list(z * z ORDER BY nk)) AS ssz FROM z
)
SELECT num.n AS n_nations, num.w AS n_links,
       (CAST(num.n AS DOUBLE) / num.w) * num.cross_sum / den.ssz
         AS morans_i,
       -1.0 / (num.n - 1) AS e_i_null
FROM num, den
""",
)
def agg_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I spatial autocorrelation of mean account balance over
    the same-region nation adjacency (w_ij = 1 iff nations share a
    region): I = (n/W) sum w_ij z_i z_j / sum z_i^2 against the
    null E[I] = -1/(n-1) — the first statistic of spatial
    econometrics (do neighboring markets co-move?), a dimension
    (SPACE) the engine's time/graph autocorrelation keys
    (ts_acf, graph_degree_assortativity) didn't yet cover.

    Exactness: nation means are identical divisions of exact cent
    sums; all cross/self products fold in nation order via the
    strict-fold pair over the BOUNDED 25-node table and its
    declared 25x25 adjacency grid. Scale shape: one broadcast dim
    join + a 25-row hash aggregate; everything after is bounded."""
    v = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation").select(
                    "n_nationkey", "n_regionkey"
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.col("n_regionkey").alias("rk"),
        )
        .agg(
            F.sum(F.expr(cents("c_acctbal"))).cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
    )

    def nk_fold(df, key_cols, col):
        return F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(*key_cols, col.alias("v")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        )

    mean_col = F.col("s").cast("double") / F.col("cnt")
    m = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        nk_fold(v, ["nk"], mean_col).alias("sm"),
    ).collect()[0]
    n, sm = int(m["n"]), float(m["sm"])
    z = v.select(
        "nk", "rk", (mean_col - F.lit(sm / n)).alias("z")
    )
    a = z.select(F.col("nk"), F.col("rk"), F.col("z").alias("za"))
    b = z.select(
        F.col("nk").alias("nkb"), F.col("rk").alias("rkb"),
        F.col("z").alias("zb"),
    )
    # bounded: 25x25 same-region adjacency grid
    links = a.join(
        F.broadcast(b),
        (F.col("rk") == F.col("rkb")) & (F.col("nk") != F.col("nkb")),
    )
    num = links.agg(
        F.count(F.lit(1)).cast("bigint").alias("w"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct("nk", "nkb", (F.col("za") * F.col("zb")).alias("v"))
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("cross_sum"),
    ).collect()[0]
    ssz = float(
        z.agg(nk_fold(z, ["nk"], F.col("z") * F.col("z")).alias("ssz"))
        .collect()[0]["ssz"]
    )
    one = v.sparkSession.createDataFrame(
        [(n, int(num["w"]), float(num["cross_sum"]), ssz)],
        "n bigint, w bigint, cross_sum double, ssz double",
    )
    return one.select(
        F.col("n").alias("n_nations"),
        F.col("w").alias("n_links"),
        (
            (F.col("n").cast("double") / F.col("w"))
            * F.col("cross_sum")
            / F.col("ssz")
        ).alias("morans_i"),
        (F.lit(-1.0) / (F.col("n") - 1)).alias("e_i_null"),
    )


@query(
    "agg_geary_c",
    bounded_cross="25x25 nation adjacency grid + 1-row moment scalar",
    oracle="""
WITH v AS (
  SELECT c.c_nationkey AS nk, n.n_regionkey AS rk,
         CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         list_sum(list(CAST(s AS DOUBLE) / cnt ORDER BY nk)) AS sm
  FROM v
), z AS (
  SELECT v.nk, v.rk, CAST(v.s AS DOUBLE) / v.cnt AS x,
         CAST(v.s AS DOUBLE) / v.cnt - m.sm / m.n AS z, m.n
  FROM v, m
), num AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS w,
         list_sum(list((a.x - b.x) * (a.x - b.x) ORDER BY a.nk, b.nk))
           AS dsq,
         MAX(a.n) AS n
  FROM z a JOIN z b ON a.rk = b.rk AND a.nk <> b.nk
), den AS (
  SELECT list_sum(list(z * z ORDER BY nk)) AS ssz FROM z
)
SELECT num.n AS n_nations, num.w AS n_links,
       (CAST(num.n - 1 AS DOUBLE) / (2 * num.w)) * num.dsq / den.ssz
         AS geary_c
FROM num, den
""",
)
def agg_geary_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geary's C contiguity ratio over the same-region nation
    adjacency — Moran's I's LOCAL-difference twin: C =
    ((n-1)/2W) sum w_ij (x_i - x_j)^2 / sum z^2, null value 1
    (C < 1 positive spatial association, C > 1 negative). Moran
    weights cross-products of deviations (global view); Geary
    weights squared neighbor DIFFERENCES (local view) — the two
    together are the standard spatial-autocorrelation report.

    Exactness and scale shape identical to agg_morans_i: exact
    nation means, nation-ordered strict folds, the declared bounded
    25x25 grid."""
    v = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation").select(
                    "n_nationkey", "n_regionkey"
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.col("n_regionkey").alias("rk"),
        )
        .agg(
            F.sum(F.expr(cents("c_acctbal"))).cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
    )
    mean_col = F.col("s").cast("double") / F.col("cnt")
    m = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("nk", mean_col.alias("v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("sm"),
    ).collect()[0]
    n, sm = int(m["n"]), float(m["sm"])
    z = v.select(
        "nk",
        "rk",
        mean_col.alias("x"),
        (mean_col - F.lit(sm / n)).alias("z"),
    )
    a = z.select("nk", "rk", F.col("x").alias("xa"))
    b = z.select(
        F.col("nk").alias("nkb"), F.col("rk").alias("rkb"),
        F.col("x").alias("xb"),
    )
    # bounded: 25x25 same-region adjacency grid
    links = a.join(
        F.broadcast(b),
        (F.col("rk") == F.col("rkb")) & (F.col("nk") != F.col("nkb")),
    )
    num = links.agg(
        F.count(F.lit(1)).cast("bigint").alias("w"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "nk",
                        "nkb",
                        (
                            (F.col("xa") - F.col("xb"))
                            * (F.col("xa") - F.col("xb"))
                        ).alias("v"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("dsq"),
    ).collect()[0]
    ssz = float(
        z.agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct("nk", (F.col("z") * F.col("z")).alias("v"))
                    )
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["v"],
            ).alias("ssz")
        ).collect()[0]["ssz"]
    )
    one = v.sparkSession.createDataFrame(
        [(n, int(num["w"]), float(num["dsq"]), ssz)],
        "n bigint, w bigint, dsq double, ssz double",
    )
    return one.select(
        F.col("n").alias("n_nations"),
        F.col("w").alias("n_links"),
        (
            ((F.col("n") - 1).cast("double") / (2 * F.col("w")))
            * F.col("dsq")
            / F.col("ssz")
        ).alias("geary_c"),
    )


@query(
    "agg_local_morans",
    bounded_cross="25x25 nation adjacency grid + 1-row moment scalar",
    oracle="""
WITH v AS (
  SELECT c.c_nationkey AS nk, n.n_regionkey AS rk,
         CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         list_sum(list(CAST(s AS DOUBLE) / cnt ORDER BY nk)) AS sm
  FROM v
), z AS (
  SELECT v.nk, v.rk,
         CAST(v.s AS DOUBLE) / v.cnt - m.sm / m.n AS z, m.n
  FROM v, m
), m2 AS (
  SELECT list_sum(list(z * z ORDER BY nk)) / MAX(n) AS mom2 FROM z
), nb AS (
  SELECT a.nk, a.z, a.rk,
         CAST(COUNT(b.nk) AS BIGINT) AS deg,
         list_sum(list(b.z ORDER BY b.nk)) AS zsum
  FROM z a LEFT JOIN z b ON a.rk = b.rk AND a.nk <> b.nk
  GROUP BY a.nk, a.z, a.rk
)
SELECT nb.nk AS nation, nb.deg AS n_neighbors,
       nb.z * COALESCE(nb.zsum, 0.0) / nb.deg / m2.mom2 AS local_i,
       CASE WHEN nb.z >= 0 AND nb.zsum >= 0 THEN 'HH'
            WHEN nb.z < 0 AND nb.zsum < 0 THEN 'LL'
            WHEN nb.z >= 0 THEN 'HL' ELSE 'LH' END AS quadrant
FROM nb, m2 WHERE nb.deg > 0
""",
)
def agg_local_morans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Moran's I (Anselin's LISA) per nation over the same-
    region adjacency: I_i = z_i * mean(neighbor z) / m2, with the
    HH/LL/HL/LH quadrant label — the 'WHICH markets drive the
    clustering' decomposition that the global agg_morans_i
    averages away (sum of local Is recovers the global up to
    scaling). Row-standardized weights (divide by degree).

    Exactness: the same exact-mean frame as the global key;
    neighbor sums fold in nation order; quadrants are exact sign
    comparisons on identical doubles. Same bounded 25x25 shape."""
    v = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation").select(
                    "n_nationkey", "n_regionkey"
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.col("n_regionkey").alias("rk"),
        )
        .agg(
            F.sum(F.expr(cents("c_acctbal"))).cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
    )
    mean_col = F.col("s").cast("double") / F.col("cnt")
    mrow = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("nk", mean_col.alias("v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("sm"),
    ).collect()[0]
    n, sm = int(mrow["n"]), float(mrow["sm"])
    z = v.select("nk", "rk", (mean_col - F.lit(sm / n)).alias("z"))
    mom2 = float(
        z.agg(
            (
                F.aggregate(
                    F.array_sort(
                        F.collect_list(
                            F.struct("nk", (F.col("z") * F.col("z")).alias("v"))
                        )
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x["v"],
                )
                / F.lit(n)
            ).alias("m2")
        ).collect()[0]["m2"]
    )
    a = z.select("nk", "rk", F.col("z").alias("za"))
    b = z.select(
        F.col("nk").alias("nkb"), F.col("rk").alias("rkb"),
        F.col("z").alias("zb"),
    )
    # bounded: 25x25 same-region adjacency grid
    nb = (
        a.join(
            F.broadcast(b),
            (F.col("rk") == F.col("rkb")) & (F.col("nk") != F.col("nkb")),
            "left",
        )
        .groupBy("nk", "za")
        .agg(
            F.count("nkb").cast("bigint").alias("deg"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("nkb", F.col("zb").alias("v")))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["v"],
            ).alias("zsum"),
        )
        .filter(F.col("deg") > 0)
    )
    zsum = F.coalesce(F.col("zsum"), F.lit(0.0))
    return nb.select(
        F.col("nk").alias("nation"),
        F.col("deg").alias("n_neighbors"),
        (F.col("za") * zsum / F.col("deg") / F.lit(mom2)).alias("local_i"),
        F.when((F.col("za") >= 0) & (zsum >= 0), "HH")
        .when((F.col("za") < 0) & (zsum < 0), "LL")
        .when(F.col("za") >= 0, "HL")
        .otherwise("LH")
        .alias("quadrant"),
    )
