"""Economics, inequality, pricing, distribution fitting and OR (SURVEY.md §2.2-D).

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
    cents,
    growth_accounting_over,
)


_GINI = (
    "(2.0 * CAST(swr AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sw AS DOUBLE)))"
    " - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)"
)


@query(
    "agg_gini",
    oracle=f"""
WITH ranked AS (
  SELECT o_orderpriority,
         CAST(ROUND((o_totalprice) * 100) AS BIGINT) AS c,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY CAST(ROUND((o_totalprice) * 100) AS BIGINT),
                                     o_orderkey) AS i
  FROM orders
), s AS (
  SELECT o_orderpriority, COUNT(*) AS n,
         CAST(SUM(c) AS BIGINT) AS sw,
         CAST(SUM(i * c) AS BIGINT) AS swr
  FROM ranked GROUP BY o_orderpriority
)
SELECT o_orderpriority, n, {_GINI} AS gini
FROM s
""",
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration per order priority —
    the inequality/concentration metric (how top-heavy is spend?)
    every marketplace dashboard carries. Closed form over the
    ascending-rank weighted sum: G = 2*sum(i*x_i)/(n*sum(x)) -
    (n+1)/n, with x in exact integer cents and ranks from a
    deterministic (value, key) sort — both sums are exact BIGINTs,
    so the one double expression at the end is bit-identical on any
    engine or layout. One window (the rank) + one aggregate; at a
    scale where the per-group window is hot, the distributed
    row-number machinery of plans/global_rank.py substitutes
    directly."""
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    c = F.expr(cents("o_totalprice"))
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.expr(cents("o_totalprice")), "o_orderkey"
    )
    ranked = o.select(
        "o_orderpriority",
        c.alias("c"),
        F.row_number().over(w).alias("i"),
    )
    s = ranked.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").cast("bigint").alias("sw"),
        F.sum(F.col("i") * F.col("c")).cast("bigint").alias("swr"),
    )
    return s.select("o_orderpriority", "n", F.expr(_GINI).alias("gini"))


@query(
    "agg_hhi",
    oracle=f"""
WITH per AS (
  SELECT o_orderpriority, o_custkey,
         CAST(SUM({cents('o_totalprice')}) AS BIGINT) AS c
  FROM orders GROUP BY o_orderpriority, o_custkey
), s AS (
  SELECT o_orderpriority,
         CAST(CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS VARCHAR)
              AS DOUBLE) AS sq,
         CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE) AS tot,
         COUNT(*) AS n_sellers
  FROM per GROUP BY o_orderpriority
)
SELECT o_orderpriority, n_sellers, sq / (tot * tot) AS hhi
FROM s
""",
)
def agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index per order priority:
    HHI = sum over customers of (revenue share)^2, computed WITHOUT
    ever materializing float shares — sum(c_i^2) / (sum c_i)^2 over
    exact integer cents, accumulated as DECIMAL(38,0) / HUGEINT
    (squared cents overflow int64 at scale — the agg_corr_cov
    pattern), one double division at the end: order-independent and
    bit-identical on both engines. Two aggregations: per-(group,
    customer) revenue, then the power sums — the naive
    share-then-square form would need a third pass AND an
    order-dependent float sum."""
    dec = "DECIMAL(38,0)"
    o = load(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    per = o.groupBy("o_orderpriority", "o_custkey").agg(
        F.expr(f"CAST(SUM({c}) AS BIGINT)").alias("c")
    )
    s = per.groupBy("o_orderpriority").agg(
        F.expr(
            f"CAST(SUM(CAST(c AS {dec}) * CAST(c AS {dec})) AS DOUBLE)"
        ).alias("sq"),
        F.expr(f"CAST(SUM(CAST(c AS {dec})) AS DOUBLE)").alias("tot"),
        F.count(F.lit(1)).alias("n_sellers"),
    )
    return s.select(
        "o_orderpriority", "n_sellers", F.expr("sq / (tot * tot)").alias("hhi")
    )


@query(
    "agg_hill_tail",
    oracle="""
WITH topk AS (
  SELECT o_totalprice,
         ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
           AS rn
  FROM orders
), sel AS (
  SELECT o_totalprice,
         MIN(CASE WHEN rn = 501 THEN o_totalprice END) OVER ()
           AS x_min
  FROM topk WHERE rn <= 501
)
SELECT CAST(500 AS BIGINT) AS k,
       x_min,
       round(1.0 / (SUM(ln(o_totalprice / x_min)) / 500), 9)
         AS hill_alpha
FROM sel WHERE o_totalprice > x_min
GROUP BY x_min
""",
)
def agg_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the Pareto tail index over the top-500
    order totals — the heavy-tail diagnostic behind capacity
    planning and whale-revenue analysis: alpha = 1 / mean(ln(x_i /
    x_{(k+1)})) over the k largest observations. The top-(k+1) set
    is an order statistic (rank window, unique tie-break), so the
    estimator is deterministic; ln sums round to 9 dp per the
    ln-ulp policy. At scale the top-k is a TakeOrdered, never a
    global sort. (Summation order of the k logs is fixed by
    accumulating in rank order in both engines via the same
    single-partition fold over 500 values; the 9-dp rounding absorbs
    the engines' different 500-term accumulation orders — relative
    spread ~1e-13 on O(1) magnitudes.)"""
    o = load(spark, sf_dir, "orders")
    k = 500
    top = o.select("o_totalprice", "o_orderkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    ).limit(k + 1)
    arr = top.agg(F.collect_list("o_totalprice").alias("xs"))
    return arr.select(
        F.lit(k).cast("bigint").alias("k"),
        F.expr("array_min(xs)").alias("x_min"),
        F.round(
            1.0
            / (
                F.expr(
                    "aggregate(filter(xs, x -> x > array_min(xs)),"
                    " CAST(0.0 AS DOUBLE),"
                    " (a, x) -> a + ln(x / array_min(xs)))"
                )
                / k
            ),
            9,
        ).alias("hill_alpha"),
    )


@query(
    "agg_lorenz_curve",
    bounded_cross="1-row broadcast scalar (decile total)",
    oracle="""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sc
  FROM orders GROUP BY o_custkey
), b AS (
  SELECT sc, NTILE(10) OVER (ORDER BY sc, o_custkey) AS decile
  FROM spend
), d AS (
  SELECT decile, COUNT(*) AS n_customers,
         CAST(SUM(sc) AS BIGINT) AS decile_cents
  FROM b GROUP BY decile
), t AS (
  SELECT CAST(SUM(decile_cents) AS BIGINT) AS total FROM d
)
SELECT d.decile, d.n_customers,
       CAST(d.decile_cents AS DOUBLE) / 100 AS decile_spend,
       CAST(CAST(SUM(d.decile_cents) OVER (ORDER BY d.decile)
                 AS BIGINT) AS DOUBLE)
         / CAST(t.total AS DOUBLE) AS cum_share
FROM d, t
""",
)
def agg_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer spend concentration: customers sorted
    by exact total cents into global deciles (plans/global_rank.py —
    range-bucket + per-bucket offsets, no SinglePartition window),
    then cumulative share of total spend per decile. The companion
    to agg_gini: the full inequality curve rather than the scalar.
    Integer cents end to end; cum_share is one double division of
    exact bigints. The 10-row decile table's cumulative window is
    trivially bounded."""
    from ..plans.global_rank import ntile_expr, with_global_row_number

    spend = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("sc"))
    )
    numbered, n_total = with_global_row_number(spend, ["sc", "o_custkey"])
    b = numbered.withColumn("decile", ntile_expr("_rn", n_total, 10))
    d = b.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("sc").cast("bigint").alias("decile_cents"),
    )
    t = d.agg(F.sum("decile_cents").cast("bigint").alias("total"))
    # bounded: 10 decile rows
    wc = Window.orderBy("decile")
    return (
        d.crossJoin(F.broadcast(t))
        .withColumn(
            "cum_cents", F.sum("decile_cents").over(wc).cast("bigint")
        )
        .select(
            "decile",
            "n_customers",
            (F.col("decile_cents").cast("double") / 100).alias(
                "decile_spend"
            ),
            (
                F.col("cum_cents").cast("double")
                / F.col("total").cast("double")
            ).alias("cum_share"),
        )
    )


@query(
    "agg_inverse_simpson",
    oracle="""
WITH m AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY source, lang
), agg AS (
  SELECT source,
         CAST(SUM(n) AS BIGINT) AS total,
         CAST(SUM(n * n) AS BIGINT) AS sum_sq,
         CAST(COUNT(*) AS BIGINT) AS n_langs
  FROM m GROUP BY source
)
SELECT source, total, n_langs,
       CAST(total * total AS DOUBLE) / CAST(sum_sq AS DOUBLE)
         AS effective_langs
FROM agg
""",
)
def agg_inverse_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-Simpson diversity (Hill number D2) of the language mix
    per source: (sum n)^2 / sum(n^2) — the 'effective number of
    languages' a corpus slice really has (a feed that is 99% one
    language scores ~1 however many langs it nominally lists). All
    integers until one double division — no entropy/exp needed, so
    no libm exposure at all. Two stacked aggregates on the source
    key; the mix-balancing companion to corpus_diversity_by_source."""
    d = load(spark, sf_dir, "documents")
    m = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    agg = m.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("total"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sum_sq"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
    )
    return agg.select(
        "source",
        "total",
        "n_langs",
        (
            (F.col("total") * F.col("total")).cast("double")
            / F.col("sum_sq").cast("double")
        ).alias("effective_langs"),
    )


@query(
    "agg_theil_index",
    bounded_cross="1-row broadcast scalar (grand total / user count)",
    oracle=f"""
WITH cust AS (
  SELECT c.c_nationkey AS nk,
         CAST(SUM({cents('o.o_totalprice')}) AS BIGINT) AS c
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY o.o_custkey, c.c_nationkey
), g AS (
  SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(c) AS BIGINT) AS s_g
  FROM cust GROUP BY nk
), tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n_all,
         CAST(SUM(s_g) AS BIGINT) AS s_all
  FROM g
), terms AS (
  SELECT cust.nk,
         CAST(round(1000000000000.0 *
           (CAST(cust.c AS DOUBLE)
              / (CAST(g.s_g AS DOUBLE) / g.n_g))
           * ln(CAST(cust.c AS DOUBLE)
                / (CAST(g.s_g AS DOUBLE) / g.n_g))) AS BIGINT) AS tq
  FROM cust JOIN g ON g.nk = cust.nk
), w AS (
  SELECT nk, CAST(SUM(tq) AS BIGINT) AS sum_tq FROM terms GROUP BY nk
)
SELECT n.n_name AS nation, g.n_g AS n_customers,
       round(CAST(g.s_g AS DOUBLE) / g.n_g / 100, 2) AS mean_spend,
       round(CAST(w.sum_tq AS DOUBLE) / 1000000000000 / g.n_g, 6)
         AS theil_within,
       round((CAST(g.n_g AS DOUBLE) / tot.n_all)
             * ((CAST(g.s_g AS DOUBLE) / g.n_g)
                / (CAST(tot.s_all AS DOUBLE) / tot.n_all))
             * ln((CAST(g.s_g AS DOUBLE) / g.n_g)
                  / (CAST(tot.s_all AS DOUBLE) / tot.n_all)), 6)
         AS between_contrib
FROM g JOIN w ON w.nk = g.nk
JOIN nation n ON n.n_nationkey = g.nk
CROSS JOIN tot
""",
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality DECOMPOSITION of customer spend by nation —
    the inequality measure gini can't decompose: total Theil =
    sum(between_contrib) + spend-share-weighted sum(theil_within),
    so each nation's row says both how unequal its customers are
    internally and how much its mean deviates from the global mean.
    Per-customer terms (x/mu_g) ln(x/mu_g) use the agg_icc
    quantization discipline: identical IEEE trees in both engines,
    quantized once to integer picounits, exact-bigint summed per
    group (unbounded customer count never meets a float
    accumulator). Group/global stats are exact bigint (count, sum)
    pairs; all readouts round at 6 dp. Shape: orders->customer
    aggregate (one shuffle), k=nations-bounded group table
    broadcast back for the term pass."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    cust = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("o_custkey", "c_nationkey")
        .agg(
            F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("c")
        )
        .select(F.col("c_nationkey").alias("nk"), "c")
    )
    g = cust.groupBy("nk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("c").cast("bigint").alias("s_g"),
    )
    tot = g.agg(
        F.sum("n_g").cast("bigint").alias("n_all"),
        F.sum("s_g").cast("bigint").alias("s_all"),
    )
    mu_g = F.col("s_g").cast("double") / F.col("n_g")
    ratio = F.col("c").cast("double") / mu_g
    terms = cust.join(F.broadcast(g), "nk").select(
        "nk",
        F.round(F.lit(1000000000000.0) * ratio * F.log(ratio))
        .cast("bigint")
        .alias("tq"),
    )
    w = terms.groupBy("nk").agg(F.sum("tq").cast("bigint").alias("sum_tq"))
    mu_all = F.col("s_all").cast("double") / F.col("n_all")
    return (
        g.join(w, "nk")
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("nk"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n_name").alias("nation"),
            F.col("n_g").alias("n_customers"),
            F.round(mu_g / 100, 2).alias("mean_spend"),
            F.round(
                F.col("sum_tq").cast("double")
                / 1000000000000
                / F.col("n_g"),
                6,
            ).alias("theil_within"),
            F.round(
                (F.col("n_g").cast("double") / F.col("n_all"))
                * (mu_g / mu_all)
                * F.log(mu_g / mu_all),
                6,
            ).alias("between_contrib"),
        )
    )


@query(
    "agg_overdispersion",
    bounded_cross="1-row broadcast scalar (moment row)",
    oracle="""
WITH uk AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS k
  FROM events GROUP BY event_type, user_id
), per AS (
  SELECT event_type,
         CAST(SUM(k) AS BIGINT) AS sk,
         CAST(SUM(k * k) AS BIGINT) AS skk
  FROM uk GROUP BY event_type
), g AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u FROM events
)
SELECT event_type, sk AS n_events, u AS n_users,
       CAST(sk AS DOUBLE) / u AS mean_k,
       (CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * sk / u) / (u - 1)
         AS var_k,
       ((CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * sk / u) / (u - 1))
         / (CAST(sk AS DOUBLE) / u) AS dispersion_index
FROM per, g
""",
)
def agg_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion diagnostic for per-user event counts: the
    variance-to-mean (dispersion) index per event type, INCLUDING
    the users who never fired the event (they add zeros to the
    variance through the global user count — the mistake that makes
    naive versions of this metric meaningless). Index near 1 =
    Poisson traffic; far above 1 = bursty/heavy-tailed, i.e. a
    negative-binomial world where per-user rate modeling and Poisson
    CIs will lie. Zeros contribute nothing to sum(k) or sum(k^2), so
    the whole computation is the per-(type,user) count rollup plus
    one exact-bigint aggregate per type and a broadcast global user
    count; each output row is ONE fixed float expression."""
    ev = load(spark, sf_dir, "events")
    uk = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    per = uk.groupBy("event_type").agg(
        F.sum("k").cast("bigint").alias("sk"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("skk"),
    )
    g = ev.agg(F.countDistinct("user_id").cast("bigint").alias("u"))
    mean_k = F.col("sk").cast("double") / F.col("u")
    var_k = (
        F.col("skk").cast("double")
        - F.col("sk").cast("double") * F.col("sk") / F.col("u")
    ) / (F.col("u") - 1)
    return per.crossJoin(F.broadcast(g)).select(
        "event_type",
        F.col("sk").alias("n_events"),
        F.col("u").alias("n_users"),
        mean_k.alias("mean_k"),
        var_k.alias("var_k"),
        (var_k / mean_k).alias("dispersion_index"),
    )


# Gumbel method-of-moments constants, computed once in Python and
# embedded as identical double literals in both engines (the SPRT /
# er_fs_weights discipline — no pi/sqrt calls at query time).
_GUMBEL_SQRT6_OVER_PI = 0.779696801233676  # sqrt(6)/pi
_GUMBEL_EULER = 0.5772156649015329  # Euler-Mascheroni gamma
# -ln(-ln(1 - 1/100)): the standardized 100-period return level
_GUMBEL_Z100 = 4.600149226776579


@query(
    "agg_gumbel_daily_max",
    oracle=f"""
WITH dm AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS mx
  FROM events GROUP BY 1, 2
), m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(mx) AS BIGINT) AS s,
         CAST(SUM(mx * mx) AS BIGINT) AS ss
  FROM dm GROUP BY event_type
)
SELECT event_type, n,
       CAST(s AS DOUBLE) / n / 100 AS mean_daily_max,
       CAST({_GUMBEL_SQRT6_OVER_PI!r} AS DOUBLE)
         * sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                / (n - 1)) / 100 AS gumbel_beta,
       CAST(s AS DOUBLE) / n / 100
         - CAST({_GUMBEL_EULER!r} AS DOUBLE)
           * (CAST({_GUMBEL_SQRT6_OVER_PI!r} AS DOUBLE)
              * sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                     / (n - 1)) / 100) AS gumbel_mu,
       CAST(s AS DOUBLE) / n / 100
         - CAST({_GUMBEL_EULER!r} AS DOUBLE)
           * (CAST({_GUMBEL_SQRT6_OVER_PI!r} AS DOUBLE)
              * sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                     / (n - 1)) / 100)
         + CAST({_GUMBEL_Z100!r} AS DOUBLE)
           * (CAST({_GUMBEL_SQRT6_OVER_PI!r} AS DOUBLE)
              * sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                     / (n - 1)) / 100) AS return_level_100d
FROM m
""",
)
def agg_gumbel_daily_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value analysis of daily maxima per event type: fit a
    Gumbel distribution by the method of moments (beta =
    s*sqrt(6)/pi, mu = mean - gamma*beta) to the block maxima and
    report the 100-day return level mu + z_100*beta — 'the largest
    single transaction we should expect in the next hundred days',
    the capacity/fraud-threshold question mean-and-variance stats
    cannot answer. Daily maxima are exact integer cents (one rollup);
    their moments are exact bigints; sqrt(6)/pi, Euler's gamma, and
    the standardized return level are PYTHON-computed literals so
    neither engine calls pi()/ln() at query time, and every float
    expression is written out in one fixed order. O(types x days)
    intermediate, two aggregates total."""
    ev = load(spark, sf_dir, "events")
    dm = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.max(F.expr(cents("value"))).cast("bigint").alias("mx"))
    m = dm.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("mx").cast("bigint").alias("s"),
        F.sum(F.col("mx") * F.col("mx")).cast("bigint").alias("ss"),
    )
    beta_sql = (
        f"CAST({_GUMBEL_SQRT6_OVER_PI!r} AS DOUBLE)"
        " * sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)"
        " / (n - 1)) / 100"
    )
    mean_sql = "CAST(s AS DOUBLE) / n / 100"
    mu_sql = (
        f"{mean_sql} - CAST({_GUMBEL_EULER!r} AS DOUBLE) * ({beta_sql})"
    )
    return m.select(
        "event_type",
        "n",
        F.expr(mean_sql).alias("mean_daily_max"),
        F.expr(beta_sql).alias("gumbel_beta"),
        F.expr(mu_sql).alias("gumbel_mu"),
        F.expr(
            f"{mu_sql} + CAST({_GUMBEL_Z100!r} AS DOUBLE) * ({beta_sql})"
        ).alias("return_level_100d"),
    )


@query(
    "agg_simpsons_paradox",
    bounded_cross="1-row pooled-direction scalar",
    oracle="""
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
), strat AS (
  SELECT pr,
         CASE WHEN a * d > b * c THEN 1
              WHEN a * d < b * c THEN -1 ELSE 0 END AS direction
  FROM cells
), pooled AS (
  SELECT CASE WHEN SUM(a) * SUM(d) > SUM(b) * SUM(c) THEN 1
              WHEN SUM(a) * SUM(d) < SUM(b) * SUM(c) THEN -1
              ELSE 0 END AS pooled_direction
  FROM cells
)
SELECT s.pr AS stratum, CAST(s.direction AS INT) AS stratum_direction,
       CAST(p.pooled_direction AS INT) AS pooled_direction,
       s.direction <> 0 AND p.pooled_direction <> 0
         AND s.direction <> p.pooled_direction AS reversed
FROM strat s, pooled p
""",
)
def agg_simpsons_paradox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox detector over the Mantel-Haenszel strata:
    per stratum, the association DIRECTION between exposure and
    outcome is the exact integer sign of the cross-product a*d vs
    b*c (no odds-ratio division, so zero cells cost nothing); the
    pooled direction is the same sign on the collapsed table; a
    stratum flags `reversed` when it disagrees with the pooled
    direction — the aggregation-reverses-the-conclusion hazard that
    motivates stratified estimators in the first place, reduced to
    pure bigint comparisons that hash-match trivially. One integer
    aggregate + a 5-row scan."""
    o = load(spark, sf_dir, "orders")
    exposed = F.col("o_custkey") % 2 == 0
    outcome = F.col("o_orderstatus") == "F"
    cells = o.groupBy(F.col("o_orderpriority").alias("pr")).agg(
        F.sum(F.when(exposed & outcome, 1).otherwise(0))
        .cast("bigint").alias("a"),
        F.sum(F.when(exposed & ~outcome, 1).otherwise(0))
        .cast("bigint").alias("b"),
        F.sum(F.when(~exposed & outcome, 1).otherwise(0))
        .cast("bigint").alias("c"),
        F.sum(F.when(~exposed & ~outcome, 1).otherwise(0))
        .cast("bigint").alias("d"),
    )
    sign = (
        F.when(F.col("a") * F.col("d") > F.col("b") * F.col("c"), 1)
        .when(F.col("a") * F.col("d") < F.col("b") * F.col("c"), -1)
        .otherwise(0)
    )
    strat = cells.select(
        F.col("pr").alias("stratum"), sign.cast("int").alias(
            "stratum_direction"
        )
    )
    pooled = cells.agg(
        F.when(
            F.sum("a") * F.sum("d") > F.sum("b") * F.sum("c"), 1
        )
        .when(F.sum("a") * F.sum("d") < F.sum("b") * F.sum("c"), -1)
        .otherwise(0)
        .cast("int")
        .alias("pooled_direction")
    )
    return strat.crossJoin(F.broadcast(pooled)).select(
        "stratum",
        "stratum_direction",
        "pooled_direction",
        (
            (F.col("stratum_direction") != 0)
            & (F.col("pooled_direction") != 0)
            & (F.col("stratum_direction") != F.col("pooled_direction"))
        ).alias("reversed"),
    )


@query(
    "agg_price_volume_mix",
    oracle="""
WITH li AS (
  SELECT l.l_partkey AS part,
         CASE WHEN o.o_orderdate < TIMESTAMP '1998-01-01'
              THEN 0 ELSE 1 END AS period,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS rev
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
), pv AS (
  SELECT a.part,
         a.q AS q0, a.rev AS rev0, b.q AS q1, b.rev AS rev1
  FROM li a JOIN li b ON a.part = b.part
  WHERE a.period = 0 AND b.period = 1
)
SELECT part, q0, q1,
       CAST(rev1 - rev0 AS BIGINT) AS rev_change_cents,
       (CAST(q1 - q0 AS DOUBLE) * (CAST(rev0 AS DOUBLE) / q0)) / 100
         AS volume_effect,
       (CAST(q1 AS DOUBLE)
        * (CAST(rev1 AS DOUBLE) / q1 - CAST(rev0 AS DOUBLE) / q0)) / 100
         AS price_effect
FROM pv
ORDER BY abs(rev1 - rev0) DESC, part
LIMIT 25
""",
)
def agg_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume decomposition of each part's revenue change
    between the pre-1998 and 1998+ halves of the order history —
    the FP&A waterfall: volume effect (quantity delta at old unit
    price) plus price effect (new quantity at unit-price delta)
    telescopes EXACTLY to the revenue change, q1*p1 - q0*p0. The
    revenue change itself stays an exact integer (cents), so the
    top-25 biggest movers are ordered by a bigint — the float
    effects are per-ROW single expressions from exact integer
    sums, never summed across rows, so no reduction-order hazard
    exists. One aggregate over the fact join, a self-join on the
    per-part period rollup, TakeOrderedAndProject for the cut."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_partkey").alias("part"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.expr(cents("l_extendedprice")).alias("rc"),
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"),
            0,
        )
        .otherwise(1)
        .alias("period"),
    )
    per = (
        li.join(o, "l_orderkey")
        .groupBy("part", "period")
        .agg(
            F.sum("qty").cast("bigint").alias("q"),
            F.sum("rc").cast("bigint").alias("rev"),
        )
    )
    a = per.filter(F.col("period") == 0).select(
        "part",
        F.col("q").alias("q0"),
        F.col("rev").alias("rev0"),
    )
    b = per.filter(F.col("period") == 1).select(
        "part",
        F.col("q").alias("q1"),
        F.col("rev").alias("rev1"),
    )
    both = a.join(b, "part")
    return (
        both.select(
            "part",
            "q0",
            "q1",
            (F.col("rev1") - F.col("rev0"))
            .cast("bigint")
            .alias("rev_change_cents"),
            (
                (F.col("q1") - F.col("q0")).cast("double")
                * (F.col("rev0").cast("double") / F.col("q0"))
                / 100
            ).alias("volume_effect"),
            (
                F.col("q1").cast("double")
                * (
                    F.col("rev1").cast("double") / F.col("q1")
                    - F.col("rev0").cast("double") / F.col("q0")
                )
                / 100
            ).alias("price_effect"),
        )
        .orderBy(F.abs(F.col("rev_change_cents")).desc(), "part")
        .limit(25)
    )


@query(
    "agg_new_vs_returning",
    oracle="""
WITH first_day AS (
  SELECT user_id, MIN(date_trunc('day', ts)) AS d0 FROM events
  GROUP BY user_id
), ud AS (
  SELECT DISTINCT e.user_id, date_trunc('day', e.ts) AS day, f.d0
  FROM events e JOIN first_day f USING (user_id)
)
SELECT CAST(day AS TIMESTAMP) AS day,
       CAST(SUM(CASE WHEN day = d0 THEN 1 ELSE 0 END) AS BIGINT)
         AS new_users,
       CAST(SUM(CASE WHEN day <> d0 THEN 1 ELSE 0 END) AS BIGINT)
         AS returning_users,
       CAST(CAST(SUM(CASE WHEN day = d0 THEN 1 ELSE 0 END) AS BIGINT)
            AS DOUBLE) / COUNT(*) AS new_share
FROM ud GROUP BY day
""",
)
def agg_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split — the growth-accounting
    companion to rolling_dau: a user counts as NEW only on their
    first-ever active day and RETURNING on every later active day,
    so the two series decompose DAU exactly and the new_share ratio
    is the acquisition-vs-retention mix product reviews track. Two
    shuffled aggregates on user_id (first-touch, then the distinct
    user-day rollup) and one day-keyed count — integer everywhere
    except the single share division."""
    ev = load(spark, sf_dir, "events")
    fd = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("d0")
    )
    ud = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
        .join(fd, "user_id")
    )
    return ud.groupBy("day").agg(
        F.sum(F.when(F.col("day") == F.col("d0"), 1).otherwise(0))
        .cast("bigint")
        .alias("new_users"),
        F.sum(F.when(F.col("day") != F.col("d0"), 1).otherwise(0))
        .cast("bigint")
        .alias("returning_users"),
        (
            F.sum(F.when(F.col("day") == F.col("d0"), 1).otherwise(0))
            .cast("bigint")
            .cast("double")
            / F.count(F.lit(1))
        ).alias("new_share"),
    )


@query(
    "agg_growth_accounting",
    bounded_cross="1-row max-month bound x per-entity month table",
    oracle="""
WITH um AS (
  SELECT DISTINCT user_id, date_trunc('month', ts) AS m FROM events
), fm AS (
  SELECT user_id, MIN(m) AS m0 FROM um GROUP BY user_id
), months AS (
  SELECT DISTINCT m FROM um
), cur AS (
  SELECT u.m, u.user_id, f.m0,
         CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END AS was_active
  FROM um u
  JOIN fm f USING (user_id)
  LEFT JOIN um p ON p.user_id = u.user_id
    AND p.m = u.m - INTERVAL 1 MONTH
), churn AS (
  SELECT (p.m + INTERVAL 1 MONTH) AS m,
         CAST(COUNT(*) AS BIGINT) AS churned
  FROM um p
  LEFT JOIN um n ON n.user_id = p.user_id
    AND n.m = p.m + INTERVAL 1 MONTH
  WHERE n.user_id IS NULL
    AND p.m + INTERVAL 1 MONTH <= (SELECT MAX(m) FROM months)
  GROUP BY 1
)
SELECT CAST(c.m AS TIMESTAMP) AS month,
       CAST(COUNT(*) AS BIGINT) AS mau,
       CAST(SUM(CASE WHEN c.m = c.m0 THEN 1 ELSE 0 END) AS BIGINT)
         AS new_users,
       CAST(SUM(CASE WHEN c.m <> c.m0 AND c.was_active = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS retained,
       CAST(SUM(CASE WHEN c.m <> c.m0 AND c.was_active = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS resurrected,
       CAST(COALESCE(MAX(ch.churned), 0) AS BIGINT) AS churned
FROM cur c LEFT JOIN churn ch ON ch.m = c.m
GROUP BY c.m
""",
)
def agg_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly growth accounting — the MAU decomposition every
    growth review runs: this month's actives split into NEW (first
    month ever), RETAINED (also active last month) and RESURRECTED
    (active before, but not last month), plus last month's actives
    who went silent (CHURNED, attributed to the month they missed).
    The identity MAU(t) = new + retained + resurrected and
    MAU(t) - MAU(t-1) = new + resurrected - churned holds exactly
    by construction and is property-tested. Shape: the distinct
    (user, month) rollup is the only corpus-scale object; first
    months, the previous-month self-join, and the churn anti-join
    all key on user_id — three user-keyed shuffles, all-integer
    outputs."""
    ev = load(spark, sf_dir, "events")
    return growth_accounting_over(ev, "user_id", "ts")


@query(
    "agg_revenue_retention",
    bounded_cross="1-row max-month bound x per-entity month table",
    oracle="""
WITH cm AS (
  SELECT o_custkey AS c, date_trunc('month', o_orderdate) AS m,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1, 2
), base AS (
  SELECT p.m + INTERVAL 1 MONTH AS m,
         p.c, p.rev AS prev_rev, COALESCE(n.rev, 0) AS cur_rev
  FROM cm p
  LEFT JOIN cm n ON n.c = p.c AND n.m = p.m + INTERVAL 1 MONTH
  WHERE p.m + INTERVAL 1 MONTH <= (SELECT MAX(m) FROM cm)
)
SELECT CAST(m AS TIMESTAMP) AS month,
       CAST(SUM(prev_rev) AS BIGINT) AS base_rev_cents,
       CAST(SUM(CASE WHEN cur_rev > prev_rev THEN cur_rev - prev_rev
                     ELSE 0 END) AS BIGINT) AS expansion_cents,
       CAST(SUM(CASE WHEN cur_rev > 0 AND cur_rev < prev_rev
                     THEN prev_rev - cur_rev ELSE 0 END) AS BIGINT)
         AS contraction_cents,
       CAST(SUM(CASE WHEN cur_rev = 0 THEN prev_rev ELSE 0 END)
            AS BIGINT) AS churned_cents,
       CAST(CAST(SUM(cur_rev) AS BIGINT) AS DOUBLE) / SUM(prev_rev)
         AS nrr,
       CAST(CAST(SUM(CASE WHEN cur_rev < prev_rev THEN cur_rev
                          ELSE prev_rev END) AS BIGINT) AS DOUBLE)
         / SUM(prev_rev) AS grr
FROM base GROUP BY m
""",
)
def agg_revenue_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net / gross revenue retention per month — the SaaS board
    metric: take last month's paying customers as the base cohort
    and bridge their revenue into this month as expansion (grew),
    contraction (shrank but stayed), and churn (went to zero); NRR
    = cohort's current revenue / base, GRR = same with expansion
    capped at base per customer (min(cur, prev)). New-customer
    revenue is deliberately OUT of both ratios — that separation is
    the metric's whole point. Exact integer cents end-to-end (the
    bridge components are classification sums over one
    customer-month self-join keyed on the customer), two float
    divisions per month row."""
    o = load(spark, sf_dir, "orders")
    cm = o.groupBy(
        F.col("o_custkey").alias("c"),
        F.date_trunc("month", "o_orderdate").alias("m"),
    ).agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("rev"))
    mx = cm.agg(F.max("m").alias("mx"))
    nxt = cm.select(
        "c", F.col("m").alias("nm"), F.col("rev").alias("cur_rev")
    )
    base = (
        cm.select(
            "c",
            F.expr("m + INTERVAL 1 MONTH").alias("m"),
            F.col("rev").alias("prev_rev"),
        )
        .crossJoin(F.broadcast(mx))
        .filter(F.col("m") <= F.col("mx"))
        .join(
            nxt.withColumnRenamed("nm", "m"), ["c", "m"], "left"
        )
        .select(
            "m",
            "prev_rev",
            F.coalesce("cur_rev", F.lit(0)).alias("cur_rev"),
        )
    )
    return base.groupBy(F.col("m").alias("month")).agg(
        F.sum("prev_rev").cast("bigint").alias("base_rev_cents"),
        F.sum(
            F.when(
                F.col("cur_rev") > F.col("prev_rev"),
                F.col("cur_rev") - F.col("prev_rev"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("expansion_cents"),
        F.sum(
            F.when(
                (F.col("cur_rev") > 0)
                & (F.col("cur_rev") < F.col("prev_rev")),
                F.col("prev_rev") - F.col("cur_rev"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("contraction_cents"),
        F.sum(
            F.when(F.col("cur_rev") == 0, F.col("prev_rev")).otherwise(0)
        )
        .cast("bigint")
        .alias("churned_cents"),
        (
            F.sum("cur_rev").cast("bigint").cast("double")
            / F.sum("prev_rev")
        ).alias("nrr"),
        (
            F.sum(F.least("cur_rev", "prev_rev"))
            .cast("bigint")
            .cast("double")
            / F.sum("prev_rev")
        ).alias("grr"),
    )


@query(
    "agg_abc_classification",
    oracle="""
WITH pr AS (
  SELECT l_partkey AS part,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS rev
  FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT part, rev,
         CAST(SUM(rev) OVER (ORDER BY -rev, part) AS BIGINT) AS cum,
         (SELECT CAST(SUM(rev) AS BIGINT) FROM pr) AS total
  FROM pr
), classed AS (
  SELECT part, rev,
         CASE WHEN 5 * (cum - rev) < 4 * total THEN 'A'
              WHEN 20 * (cum - rev) < 19 * total THEN 'B'
              ELSE 'C' END AS abc_class,
         total
  FROM ranked
)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS BIGINT) AS revenue_cents,
       CAST(CAST(SUM(rev) AS BIGINT) AS DOUBLE) / MAX(total)
         AS revenue_share
FROM classed GROUP BY abc_class
""",
)
def agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: rank parts by revenue and cut
    the cumulative share at 80% (A) and 95% (B) — the Pareto
    segmentation purchasing and warehouse-slotting run on every
    catalog. Class boundaries are the EXACT integer crossings
    5*(cum_before_item) < 4*total and 20*cum < 19*total evaluated
    at each item's interval START, so no float share ever decides a
    class (a boundary part classifies identically in both engines
    by integer comparison). The descending cumulative revenue runs
    on the plans/global_rank.py two-phase prefix machinery (range
    buckets on negated revenue + driver offsets + bucket-partitioned
    window — the sample_pps_systematic shape); the oracle uses the
    naive global SUM() OVER. Output: three class rows with exact
    cents and one share division each."""
    from ..plans.global_rank import with_range_bucket

    li = load(spark, sf_dir, "lineitem")
    pr = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(F.expr(cents("l_extendedprice"))).cast("bigint").alias("rev")
    )
    w = pr.select("part", "rev", (-F.col("rev")).alias("neg_rev"))
    rb = with_range_bucket(w, "neg_rev").localCheckpoint(eager=False)
    subtotals = {
        r["_gr_bucket"]: r["bt"]
        for r in rb.groupBy("_gr_bucket")
        .agg(F.sum("rev").alias("bt"))
        .collect()
    }
    total = int(sum(subtotals.values()))
    offsets, acc = {}, 0
    for b in sorted(subtotals):
        offsets[b] = acc
        acc += subtotals[b]
    off_map = F.create_map(
        *[F.lit(x) for b in sorted(offsets) for x in (b, offsets[b])]
    )
    win = (
        Window.partitionBy("_gr_bucket")
        .orderBy("neg_rev", "part")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rb.select(
        "part",
        "rev",
        (
            F.element_at(off_map, F.col("_gr_bucket"))
            + F.sum("rev").over(win)
        ).cast("bigint").alias("cum"),
    )
    classed = cum.select(
        "rev",
        F.when(
            5 * (F.col("cum") - F.col("rev")) < 4 * total, "A"
        )
        .when(20 * (F.col("cum") - F.col("rev")) < 19 * total, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("rev").cast("bigint").alias("revenue_cents"),
        (
            F.sum("rev").cast("bigint").cast("double") / F.lit(total)
        ).alias("revenue_share"),
    )


@query(
    "agg_expected_shortfall",
    oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT event_type, c,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY c, day) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_days,
       CAST((MAX(n) + 19) // 20 AS BIGINT) AS k_tail,
       CAST(MAX(CASE WHEN rn = (n + 19) // 20 THEN c END) AS BIGINT)
         AS var95_cents,
       CAST(SUM(CASE WHEN rn <= (n + 19) // 20 THEN c ELSE 0 END)
            AS BIGINT) AS tail_sum_cents,
       CAST(CAST(SUM(CASE WHEN rn <= (n + 19) // 20 THEN c ELSE 0 END)
                 AS BIGINT) AS DOUBLE)
         / ((MAX(n) + 19) // 20) / 100 AS expected_shortfall
FROM ranked GROUP BY event_type
""",
)
def agg_expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Value-at-Risk and Expected Shortfall (CVaR) of daily
    revenue per event type: the k = ceil(n/20) WORST days define the
    tail; VaR is the k-th smallest day and ES is the tail's mean —
    the coherent risk measure Basel replaced VaR with, here reading
    'how bad is a bad day, on average'. The tail size uses the
    SHARED integer ceil-rank formula (n+19)//20 in both engines
    (the win_moving_p90 / drift_psi discrete-quantile lesson: never
    pair two engines' quantile builtins), ranks break ties by day,
    and the tail sum stays exact integer cents with ONE division at
    the end. Per-type windows over the O(days) rollup — partitioned,
    bounded."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.expr(cents("value"))).cast("bigint").alias("c"))
    w = Window.partitionBy("event_type").orderBy("c", "day")
    wn = Window.partitionBy("event_type")
    ranked = daily.select(
        "event_type",
        "c",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    k = F.expr("(n + 19) div 20")
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_days"),
        F.max(k).cast("bigint").alias("k_tail"),
        F.max(F.when(F.col("rn") == k, F.col("c")))
        .cast("bigint")
        .alias("var95_cents"),
        F.sum(F.when(F.col("rn") <= k, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("tail_sum_cents"),
        (
            F.sum(F.when(F.col("rn") <= k, F.col("c")).otherwise(0))
            .cast("bigint")
            .cast("double")
            / F.max(k)
            / 100
        ).alias("expected_shortfall"),
    )


@query(
    "agg_price_elasticity",
    oracle="""
WITH pq AS (
  SELECT p.p_partkey,
         CAST(ROUND(ln(p.p_retailprice) * 100000) AS BIGINT) AS x,
         CAST(ROUND(ln(CAST(SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT))
                            AS DOUBLE) / 100) * 100000) AS BIGINT) AS y
  FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
  GROUP BY p.p_partkey, p.p_retailprice
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM pq
)
SELECT n,
       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
         AS elasticity,
       (CAST(sy AS DOUBLE)
        - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * sx)
         / n / 100000 AS intercept_ln
FROM m
""",
)
def agg_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price elasticity of demand: the log-log OLS slope of total
    quantity sold on retail price across parts — d ln(qty) /
    d ln(price), the canonical demand-curve estimate. Float
    discipline (the entropy_source recipe): each part's ln(price)
    and ln(qty) are fixed-pointed ONCE to integer 1e-5 units, so
    every OLS moment (sx, sy, sxy, sxx) is an exact
    order-independent BIGINT (products bounded ~1e17 at any test
    SF) and the closed-form slope evaluates once from exact
    integers with identical text both engines. Residual accepted
    risk: Java Math.log vs libm ln within 1 ulp of a .5 quantization
    boundary — deterministic and verified green on the fixture at
    all SFs. The quantity sum per part is exact integer cents."""
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    pq = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_partkey", "p_retailprice")
        .agg(F.sum(F.expr(cents("l_quantity"))).alias("qc"))
        .select(
            F.round(F.log("p_retailprice") * 100000)
            .cast("bigint")
            .alias("x"),
            F.round(
                F.log(F.col("qc").cast("double") / 100) * 100000
            )
            .cast("bigint")
            .alias("y"),
        )
    )
    m = pq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    slope = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    return m.select(
        "n",
        slope.alias("elasticity"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx"))
            / F.col("n")
            / 100000
        ).alias("intercept_ln"),
    )


@query(
    "agg_gamma_mom",
    oracle="""
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS s,
         CAST(CAST(SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                  AS HUGEINT)
                  * CAST(round(o_totalprice * 100) AS BIGINT))
              AS VARCHAR) AS DOUBLE) AS ss
  FROM orders
), st AS (
  SELECT n,
         CAST(s AS DOUBLE) / n AS mu,
         (ss - (CAST(s AS DOUBLE) / n) * s) / (n - 1) AS var
  FROM m
)
SELECT n AS n_orders,
       mu / 100 AS mean_dollars,
       (mu * mu) / var AS shape_k,
       var / mu / 100 AS scale_theta_dollars
FROM st
""",
)
def agg_gamma_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-of-moments Gamma fit of the order-value distribution
    (k = mean^2/var, theta = var/mean) — the two-parameter positive
    model pricing/risk teams reach for before anything heavier, and
    the natural sibling of agg_gumbel_daily_max (extremes) and
    agg_hill_tail (tail index): this one fits the BODY.

    Exactness: mean and variance come from exact integer cents sums
    (squares through HUGEINT/decimal(38) — the ts_acf discipline);
    k and theta are fixed double expressions over those identical
    integers. One aggregate, one row."""
    o = load(spark, sf_dir, "orders").select(
        F.expr(cents("o_totalprice")).alias("c")
    )
    m = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("double")
        .alias("ss"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    var = (F.col("ss") - mu * F.col("s")) / (F.col("n") - 1)
    return m.select(
        F.col("n").alias("n_orders"),
        (mu / 100).alias("mean_dollars"),
        ((mu * mu) / var).alias("shape_k"),
        (var / mu / 100).alias("scale_theta_dollars"),
    )


_PIDX_Y0, _PIDX_Y1 = 1995, 1996


@query(
    "agg_price_index",
    oracle=f"""
WITH py AS (
  SELECT l_partkey AS pk,
         CAST(year(l_shipdate) AS INTEGER) AS y,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS v,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem
  WHERE year(l_shipdate) IN ({_PIDX_Y0}, {_PIDX_Y1})
  GROUP BY l_partkey, year(l_shipdate)
), u AS (
  SELECT pk, y, (v * 1000) // q AS pm, q FROM py
), b AS (
  SELECT a.pk, a.pm AS p0, a.q AS q0, c.pm AS p1, c.q AS q1
  FROM u a JOIN u c ON a.pk = c.pk
  WHERE a.y = {_PIDX_Y0} AND c.y = {_PIDX_Y1}
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(p1 * q0) AS BIGINT) AS l_num,
         CAST(SUM(p0 * q0) AS BIGINT) AS l_den,
         CAST(SUM(p1 * q1) AS BIGINT) AS p_num,
         CAST(SUM(p0 * q1) AS BIGINT) AS p_den
  FROM b
)
SELECT n_parts,
       CAST(l_num AS DOUBLE) / l_den AS laspeyres,
       CAST(p_num AS DOUBLE) / p_den AS paasche,
       sqrt((CAST(l_num AS DOUBLE) / l_den)
            * (CAST(p_num AS DOUBLE) / p_den)) AS fisher
FROM s
""",
)
def agg_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indices between the
    {_PIDX_Y0} and {_PIDX_Y1} ship years over parts traded in BOTH —
    the index-number machinery behind every inflation / price-change
    dashboard (Laspeyres weights by base-year baskets, Paasche by
    current, Fisher is their geometric mean and the superlative
    compromise).

    Exactness: per part-year unit prices are quantized ONCE as the
    positive-operand floor division (value_cents * 1e3) // quantity
    (milli-cent resolution; p*q products stay ~1e12/part so the
    cross-basket sums sit inside int64 at a 100x corpus), so all
    four basket sums are exact bigints and the three indices are
    fixed double expressions over identical integers. Scale shape:
    one part-year hash aggregate over lineitem (year filter pushed
    to the scan), a part-keyed self-join of the two year slices, a
    1-row sum."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        F.year("l_shipdate").alias("y"),
        F.expr(cents("l_extendedprice")).alias("vc"),
        F.expr("CAST(round(l_quantity) AS BIGINT)").alias("qn"),
    ).filter(F.col("y").isin(_PIDX_Y0, _PIDX_Y1))
    py = li.groupBy("pk", "y").agg(
        F.sum("vc").cast("bigint").alias("v"),
        F.sum("qn").cast("bigint").alias("q"),
    )
    u = py.select(
        "pk", "y", F.expr("(v * 1000) div q").alias("pm"), "q"
    )
    a = u.filter(F.col("y") == _PIDX_Y0).select(
        "pk", F.col("pm").alias("p0"), F.col("q").alias("q0")
    )
    c = u.filter(F.col("y") == _PIDX_Y1).select(
        "pk", F.col("pm").alias("p1"), F.col("q").alias("q1")
    )
    b = a.join(c, "pk")
    s = b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum(F.col("p1") * F.col("q0")).cast("bigint").alias("l_num"),
        F.sum(F.col("p0") * F.col("q0")).cast("bigint").alias("l_den"),
        F.sum(F.col("p1") * F.col("q1")).cast("bigint").alias("p_num"),
        F.sum(F.col("p0") * F.col("q1")).cast("bigint").alias("p_den"),
    )
    lasp = F.col("l_num").cast("double") / F.col("l_den")
    paas = F.col("p_num").cast("double") / F.col("p_den")
    return s.select(
        "n_parts",
        lasp.alias("laspeyres"),
        paas.alias("paasche"),
        F.sqrt(lasp * paas).alias("fisher"),
    )


@query(
    "agg_negbin_mom",
    oracle="""
WITH k AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cnt) AS BIGINT) AS s,
         CAST(SUM(cnt * cnt) AS BIGINT) AS ss
  FROM k
), st AS (
  SELECT n,
         CAST(s AS DOUBLE) / n AS mu,
         (CAST(ss AS DOUBLE) - (CAST(s AS DOUBLE) / n) * s) / (n - 1) AS var
  FROM m
)
SELECT n AS n_customers,
       mu AS mean_orders,
       var AS var_orders,
       var / mu AS dispersion,
       (mu * mu) / (var - mu) AS r_size,
       ((mu * mu) / (var - mu))
         / ((mu * mu) / (var - mu) + mu) AS p_success
FROM st
""",
)
def agg_negbin_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-of-moments negative-binomial fit of the orders-per-
    customer count distribution (NB2: var = mu + mu^2/r, so
    r = mu^2/(var - mu), p = r/(r + mu)) — the standard
    overdispersed count model behind purchase-frequency / BG-NBD
    style CLV work, completing the MoM family (agg_gamma_mom fits
    the value BODY, agg_gumbel_daily_max the extremes,
    agg_hill_tail the tail; this fits the COUNTS). The dispersion
    index var/mu is reported so an equidispersed fixture (r -> inf)
    reads honestly; customers with zero orders are out of frame
    (truncated-sample caveat in the name of determinism).

    Exactness: per-customer counts, their sum and their square sum
    are exact bigints (counts are tiny — no HUGEINT needed); mean,
    variance and the two NB parameters are fixed double expressions
    over those identical integers. Scale shape: one hash aggregate
    to O(customers) rows, a second to one row."""
    k = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    m = k.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cnt").cast("bigint").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("ss"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    var = (F.col("ss").cast("double") - mu * F.col("s")) / (F.col("n") - 1)
    r_size = (mu * mu) / (var - mu)
    return m.select(
        F.col("n").alias("n_customers"),
        mu.alias("mean_orders"),
        var.alias("var_orders"),
        (var / mu).alias("dispersion"),
        r_size.alias("r_size"),
        (r_size / (r_size + mu)).alias("p_success"),
    )


@query(
    "agg_lognormal_mom",
    oracle="""
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(CAST(SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                  AS HUGEINT)
                  * CAST(round(o_totalprice * 100) AS BIGINT))
              AS VARCHAR) AS DOUBLE) AS ss
  FROM orders
), lq AS (
  SELECT n,
         CAST(FLOOR(LN(CAST(s AS DOUBLE) / n) * 1000000 + 0.5) AS BIGINT)
           AS l1,
         CAST(FLOOR(LN(ss / n) * 1000000 + 0.5) AS BIGINT) AS l2
  FROM m
)
SELECT n AS n_orders,
       CAST(4 * l1 - l2 AS DOUBLE) / 2000000 AS mu_log_cents,
       sqrt(CAST(l2 - 2 * l1 AS DOUBLE) / 1000000) AS sigma_log,
       CAST(FLOOR(EXP(CAST(4 * l1 - l2 AS DOUBLE) / 2000000) + 0.5)
            AS BIGINT) / 100.0 AS median_dollars
FROM lq
""",
)
def agg_lognormal_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-of-moments lognormal fit of the order-value
    distribution via the raw moments (E[X] = exp(mu + s^2/2),
    E[X^2] = exp(2mu + 2s^2) => mu = 2 ln m1 - ln m2 / 2,
    s^2 = ln m2 - 2 ln m1) — the multiplicative-process model that
    competes with agg_gamma_mom on skewed money data; the implied
    median exp(mu) is the robust center the mean overstates.

    Exactness: m1 and m2 come from exact integer cents (squares
    through HUGEINT/decimal(38)); each ln is quantized ONCE at 1e-6,
    so mu and s^2 are exact INTEGER combinations (4*l1 - l2 over
    2e6; l2 - 2*l1 over 1e6) — the estimator arithmetic carries no
    raw libm bit. The median re-exponentiates the identical double
    and half-up rounds to integer cents (boundary risk ~1 ulp at
    1e-2 absolute — the standard quantization caveat). One hash
    aggregate, one row."""
    m = load(spark, sf_dir, "orders").select(
        F.expr(cents("o_totalprice")).alias("c")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("double")
        .alias("ss"),
    )
    lq = m.select(
        "n",
        F.floor(
            F.log(F.col("s").cast("double") / F.col("n")) * F.lit(1000000)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("l1"),
        F.floor(
            F.log(F.col("ss") / F.col("n")) * F.lit(1000000) + F.lit(0.5)
        )
        .cast("bigint")
        .alias("l2"),
    )
    mu = (4 * F.col("l1") - F.col("l2")).cast("double") / F.lit(2000000)
    return lq.select(
        F.col("n").alias("n_orders"),
        mu.alias("mu_log_cents"),
        F.sqrt(
            (F.col("l2") - 2 * F.col("l1")).cast("double") / F.lit(1000000)
        ).alias("sigma_log"),
        (
            F.floor(F.exp(mu) + F.lit(0.5)).cast("bigint") / F.lit(100.0)
        ).alias("median_dollars"),
    )


@query(
    "agg_palma_ratio",
    oracle="""
WITH s AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS sc, o_orderkey
  FROM orders
), r AS (
  SELECT sc, ROW_NUMBER() OVER (ORDER BY sc, o_orderkey) AS rn
  FROM s
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(sc) AS BIGINT) AS tot
  FROM s
), sh AS (
  SELECT
    CAST(SUM(CASE WHEN r.rn <= (4 * n.n) // 10 THEN r.sc ELSE 0 END)
         AS BIGINT) AS bot40,
    CAST(SUM(CASE WHEN r.rn > n.n - (n.n // 10) THEN r.sc ELSE 0 END)
         AS BIGINT) AS top10
  FROM r, n
)
SELECT n.n AS n_orders,
       CAST(sh.top10 AS DOUBLE) / n.tot AS top10_share,
       CAST(sh.bot40 AS DOUBLE) / n.tot AS bottom40_share,
       CAST(sh.top10 AS DOUBLE) / sh.bot40 AS palma_ratio
FROM sh, n
""",
)
def agg_palma_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Palma inequality ratio of the order-value distribution: the
    top-10% value share over the bottom-40% share — the
    concentration summary that replaced Gini in much of the
    inequality literature because it reads directly as 'how many
    bottom-40s fit in the top decile', completing the family
    (agg_gini curvature, agg_theil_index decomposability,
    agg_lorenz_curve the full curve, agg_hhi market form). Decile
    membership is by the deterministic (cents, orderkey) rank;
    cutoffs use identical integer floor arithmetic (4n//10, n//10).

    Exactness: ranks from ONE pass of the two-phase global-rank
    machinery; both shares are exact bigint cent sums over exact
    integer rank ranges; the three ratios are fixed double
    expressions. Scale shape: one rank pass, one hash aggregate with
    a declared 1-row count scalar."""
    from ..plans.global_rank import with_global_row_number

    s = load(spark, sf_dir, "orders").select(
        F.expr(cents("o_totalprice")).alias("sc"), "o_orderkey"
    )
    r, n = with_global_row_number(s, ["sc", "o_orderkey"], out_col="rn")
    tot_row = s.agg(F.sum("sc").cast("bigint").alias("tot")).collect()[0]
    tot = int(tot_row["tot"])
    b_cut = (4 * n) // 10
    t_cut = n - (n // 10)
    sh = r.agg(
        F.sum(F.when(F.col("rn") <= b_cut, F.col("sc")).otherwise(0))
        .cast("bigint")
        .alias("bot40"),
        F.sum(F.when(F.col("rn") > t_cut, F.col("sc")).otherwise(0))
        .cast("bigint")
        .alias("top10"),
    )
    return sh.select(
        F.lit(n).cast("bigint").alias("n_orders"),
        (F.col("top10").cast("double") / F.lit(tot)).alias("top10_share"),
        (F.col("bot40").cast("double") / F.lit(tot)).alias(
            "bottom40_share"
        ),
        (F.col("top10").cast("double") / F.col("bot40")).alias(
            "palma_ratio"
        ),
    )


NV_CU, NV_CO = 9, 1  # newsvendor under/over-stock unit costs (9:1)


@query(
    "agg_newsvendor",
    bounded_cross="1-row quantile-pick scalar onto the 1-row moment frame",
    oracle=f"""
WITH demand AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(COUNT(*) AS BIGINT) AS d
  FROM orders GROUP BY 1
), r AS (
  SELECT d, ROW_NUMBER() OVER (ORDER BY d, day) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM demand
), pick AS (
  SELECT d AS q_star, n FROM r
  WHERE rn = ({NV_CU} * n + {NV_CU + NV_CO} - 1) // {NV_CU + NV_CO}
), m AS (
  SELECT CAST(SUM(d) AS BIGINT) AS sd, CAST(COUNT(*) AS BIGINT) AS n
  FROM demand
)
SELECT m.n AS n_days,
       CAST(m.sd AS DOUBLE) / m.n AS mean_daily_demand,
       CAST({NV_CU} AS DOUBLE) / {NV_CU + NV_CO} AS critical_fractile,
       pick.q_star AS q_star_orders
FROM m, pick
""",
)
def agg_newsvendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor optimal stocking level for daily order demand:
    q* = F^-1(cu/(cu+co)) — the empirical-quantile solution of the
    single-period inventory problem at a {NV_CU}:{NV_CO}
    understock:overstock cost ratio (critical fractile 0.9), the OR
    classic behind every perishable/capacity pre-commit decision.
    Complements agg_expected_shortfall (which prices the tail this
    quantile cuts).

    Exactness: daily demand counts are exact integers; q* is the
    exact order statistic at rank ceil(f*n) under the deterministic
    (demand, day) order — integer ceiling arithmetic identical in
    both engines. Scale shape: one O(days) rollup, one bounded rank
    window, a 1-row pick with a declared scalar cross."""
    demand = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    # bounded: O(days) daily rollup rows
    wr = Window.orderBy("d", "day")
    r = demand.select(
        "d",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    pick = r.filter(
        F.col("rn")
        == F.expr(f"({NV_CU} * n + {NV_CU + NV_CO} - 1) div {NV_CU + NV_CO}")
    ).select(F.col("d").alias("q_star"), "n")
    m = demand.agg(
        F.sum("d").cast("bigint").alias("sd"),
        F.count(F.lit(1)).cast("bigint").alias("nn"),
    )
    # bounded: 1-row quantile pick
    j = m.crossJoin(F.broadcast(pick))
    return j.select(
        F.col("nn").alias("n_days"),
        (F.col("sd").cast("double") / F.col("nn")).alias(
            "mean_daily_demand"
        ),
        (F.lit(NV_CU).cast("double") / F.lit(NV_CU + NV_CO)).alias(
            "critical_fractile"
        ),
        F.col("q_star").alias("q_star_orders"),
    )


SS_Z_90 = 1.2815515655446004  # Phi^-1(0.90), public constant
SS_LEAD_DAYS = 7


@query(
    "agg_safety_stock",
    oracle=f"""
WITH demand AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(COUNT(*) AS BIGINT) AS d
  FROM orders GROUP BY 1
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(d) AS BIGINT) AS s,
         CAST(SUM(d * d) AS BIGINT) AS ss
  FROM demand
)
SELECT n AS n_days,
       CAST(s AS DOUBLE) / n AS mean_daily_demand,
       sqrt((CAST(ss AS DOUBLE) - (CAST(s AS DOUBLE) / n) * s) / (n - 1))
         AS sd_daily_demand,
       CAST('{SS_Z_90!r}' AS DOUBLE)
         * sqrt((CAST(ss AS DOUBLE) - (CAST(s AS DOUBLE) / n) * s) / (n - 1))
         * sqrt(CAST({SS_LEAD_DAYS} AS DOUBLE)) AS safety_stock_orders,
       (CAST(s AS DOUBLE) / n) * {SS_LEAD_DAYS}
         + CAST('{SS_Z_90!r}' AS DOUBLE)
           * sqrt((CAST(ss AS DOUBLE) - (CAST(s AS DOUBLE) / n) * s) / (n - 1))
           * sqrt(CAST({SS_LEAD_DAYS} AS DOUBLE)) AS reorder_point_orders
FROM m
""",
)
def agg_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety stock and reorder point for daily order demand at a
    90% cycle service level over a {SS_LEAD_DAYS}-day lead time:
    SS = z * sd_daily * sqrt(L), ROP = mean_daily * L + SS — the
    continuous-review (s, Q) inventory formulas, the planning twin
    of agg_newsvendor's single-period quantile (z as a
    repr-round-tripped CAST-string literal, the ts_macd lesson).

    Exactness: demand moments are exact integers; every output is a
    fixed double expression over them. ONE hash aggregate chain."""
    demand = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    m = demand.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d").cast("bigint").alias("s"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("ss"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("ss").cast("double") - mu * F.col("s")) / (F.col("n") - 1)
    )
    ss_ = (
        F.lit(SS_Z_90)
        * sd
        * F.sqrt(F.lit(SS_LEAD_DAYS).cast("double"))
    )
    return m.select(
        F.col("n").alias("n_days"),
        mu.alias("mean_daily_demand"),
        sd.alias("sd_daily_demand"),
        ss_.alias("safety_stock_orders"),
        (mu * F.lit(SS_LEAD_DAYS) + ss_).alias("reorder_point_orders"),
    )


@query(
    "agg_atkinson",
    oracle="""
WITH t AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
         CAST(round(1000000000000.0
              * ln(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DOUBLE)))
              AS BIGINT) AS lq
  FROM orders
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(CAST(SUM(CAST(lq AS HUGEINT)) AS VARCHAR) AS DOUBLE) AS sl
  FROM t
)
SELECT n AS n_orders,
       CAST(s AS DOUBLE) / n / 100 AS mean_dollars,
       exp(sl / 1000000000000 / n) / 100 AS geomean_dollars,
       1 - (exp(sl / 1000000000000 / n) / 100)
           / (CAST(s AS DOUBLE) / n / 100) AS atkinson_eps1
FROM m
""",
)
def agg_atkinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index at epsilon = 1 over order values:
    A_1 = 1 - geomean/mean — the welfare-theoretic member of the
    inequality family (agg_gini rank-based, agg_theil_index
    entropy-based, agg_palma_ratio share-based; Atkinson is the
    one with an explicit inequality-aversion parameter, and at
    eps=1 it is the geometric-mean shortfall).

    Exactness: per-row ln quantized at 1e-12 relative (the
    agg_theil_index discipline — both engines see the identical
    double and the quantization absorbs the <=1-ulp libm spread);
    the quantized sum rides HUGEINT/decimal(38) (~2.6e18 at sf0.1 —
    outgrows int64 at 100x, so the wide type is load-bearing);
    geomean re-exponentiates one identical double. ONE hash
    aggregate."""
    t = load(spark, sf_dir, "orders").select(
        F.expr(cents("o_totalprice")).alias("c")
    ).select(
        "c",
        F.round(
            F.lit(1000000000000.0) * F.log(F.col("c").cast("double"))
        )
        .cast("bigint")
        .alias("lq"),
    )
    m = t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("lq").cast("decimal(38,0)")).cast("double").alias("sl"),
    )
    mean_d = F.col("s").cast("double") / F.col("n") / 100
    geo_d = F.exp(F.col("sl") / F.lit(1000000000000) / F.col("n")) / 100
    return m.select(
        F.col("n").alias("n_orders"),
        mean_d.alias("mean_dollars"),
        geo_d.alias("geomean_dollars"),
        (F.lit(1) - geo_d / mean_d).alias("atkinson_eps1"),
    )


MVP_X_TYPE, MVP_Y_TYPE = "click", "purchase"


@query(
    "agg_min_variance_portfolio",
    bounded_cross="two 1-row moment scalars + 1-row cross-moment",
    oracle=f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1992-01-01',
                   CAST(date_trunc('day', ts) AS DATE)) AS dd,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events
  WHERE event_type IN ('{MVP_X_TYPE}', '{MVP_Y_TYPE}')
  GROUP BY 1, 2
), rx AS (
  SELECT dd, CAST(c - LAG(c) OVER (ORDER BY dd) AS DOUBLE)
               / LAG(c) OVER (ORDER BY dd) AS r
  FROM daily WHERE event_type = '{MVP_X_TYPE}' QUALIFY r IS NOT NULL
), ry AS (
  SELECT dd, CAST(c - LAG(c) OVER (ORDER BY dd) AS DOUBLE)
               / LAG(c) OVER (ORDER BY dd) AS r
  FROM daily WHERE event_type = '{MVP_Y_TYPE}' QUALIFY r IS NOT NULL
), j AS (
  SELECT rx.r AS x, ry.r AS y, rx.dd
  FROM rx JOIN ry ON ry.dd = rx.dd
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         list_sum(list(x ORDER BY dd)) AS sx,
         list_sum(list(y ORDER BY dd)) AS sy,
         list_sum(list(x * x ORDER BY dd)) AS sxx,
         list_sum(list(y * y ORDER BY dd)) AS syy,
         list_sum(list(x * y ORDER BY dd)) AS sxy
  FROM j
), st AS (
  SELECT n,
         (sxx - sx / n * sx) / (n - 1) AS vx,
         (syy - sy / n * sy) / (n - 1) AS vy,
         (sxy - sx / n * sy) / (n - 1) AS cxy
  FROM m
)
SELECT n AS n_days,
       vx AS var_x, vy AS var_y, cxy AS cov_xy,
       (vy - cxy) / (vx + vy - 2 * cxy) AS w_x_min_var,
       vx * ((vy - cxy) / (vx + vy - 2 * cxy))
         * ((vy - cxy) / (vx + vy - 2 * cxy))
         + vy * (1 - (vy - cxy) / (vx + vy - 2 * cxy))
              * (1 - (vy - cxy) / (vx + vy - 2 * cxy))
         + 2 * cxy * ((vy - cxy) / (vx + vy - 2 * cxy))
               * (1 - (vy - cxy) / (vx + vy - 2 * cxy))
         AS min_portfolio_var
FROM st
""",
)
def agg_min_variance_portfolio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-asset minimum-variance portfolio (Markowitz closed form)
    over the daily '{MVP_X_TYPE}' and '{MVP_Y_TYPE}' return series:
    w*_x = (var_y - cov)/(var_x + var_y - 2 cov) and the resulting
    portfolio variance — the diversification arithmetic under
    ts_sharpe's risk-adjusted view and ts_ccf's dependence view of
    the same two streams.

    Exactness: returns are float divisions of exact integer pairs;
    the five moments fold the overlapping-day pairs in DAY order
    via the strict-fold pair (ts_sharpe discipline); w* and the
    portfolio variance are fixed double expressions over those
    identical moments. Scale shape: one 2-series rollup, bounded
    day-ordered folds, a 1-row reduction."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin(MVP_X_TYPE, MVP_Y_TYPE)
    )
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("1992-01-01")
        ).alias("dd"),
    ).agg(F.sum(F.expr(cents("value"))).cast("bigint").alias("c"))

    def rets(tp, out):
        # bounded: O(days) per-type rollup rows
        w = Window.orderBy("dd")
        return (
            daily.filter(F.col("event_type") == tp)
            .select(
                "dd",
                (
                    (F.col("c") - F.lag("c").over(w)).cast("double")
                    / F.lag("c").over(w)
                ).alias(out),
            )
            .filter(F.col(out).isNotNull())
        )

    rx = rets(MVP_X_TYPE, "x")
    ry = rets(MVP_Y_TYPE, "y").select(F.col("dd").alias("dd_y"), "y")
    j = rx.join(ry, rx["dd"] == ry["dd_y"]).select("dd", "x", "y")
    arr = F.array_sort(
        F.collect_list(F.struct("dd", F.col("x").alias("x"), F.col("y").alias("y")))
    )

    def fold(f):
        return F.aggregate(arr, F.lit(0.0), lambda acc, e: acc + f(e))

    m = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        fold(lambda e: e["x"]).alias("sx"),
        fold(lambda e: e["y"]).alias("sy"),
        fold(lambda e: e["x"] * e["x"]).alias("sxx"),
        fold(lambda e: e["y"] * e["y"]).alias("syy"),
        fold(lambda e: e["x"] * e["y"]).alias("sxy"),
    )
    n = F.col("n")
    vx = (F.col("sxx") - F.col("sx") / n * F.col("sx")) / (n - 1)
    vy = (F.col("syy") - F.col("sy") / n * F.col("sy")) / (n - 1)
    cxy = (F.col("sxy") - F.col("sx") / n * F.col("sy")) / (n - 1)
    st = m.select(
        n.alias("n_days"), vx.alias("vx"), vy.alias("vy"), cxy.alias("cxy")
    )
    wx = (F.col("vy") - F.col("cxy")) / (
        F.col("vx") + F.col("vy") - 2 * F.col("cxy")
    )
    return st.select(
        F.col("n_days"),
        F.col("vx").alias("var_x"),
        F.col("vy").alias("var_y"),
        F.col("cxy").alias("cov_xy"),
        wx.alias("w_x_min_var"),
        (
            F.col("vx") * wx * wx
            + F.col("vy") * (1 - wx) * (1 - wx)
            + 2 * F.col("cxy") * wx * (1 - wx)
        ).alias("min_portfolio_var"),
    )


@query(
    "agg_gravity_trade",
    oracle="""
WITH flows AS (
  SELECT s.s_nationkey AS i, c.c_nationkey AS j,
         CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS f
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey <> c.c_nationkey
  GROUP BY 1, 2
), mass_out AS (
  SELECT i, CAST(SUM(f) AS BIGINT) AS mo FROM flows GROUP BY i
), mass_in AS (
  SELECT j, CAST(SUM(f) AS BIGINT) AS mi FROM flows GROUP BY j
), reg AS (
  SELECT n_nationkey AS nk, n_regionkey AS rk FROM nation
), pts AS (
  SELECT fl.i, fl.j,
         CAST(FLOOR(LN(CAST(fl.f AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS y,
         CAST(FLOOR(LN(CAST(mo.mo AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           + CAST(FLOOR(LN(CAST(mi.mi AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS x,
         CASE WHEN ri.rk = rj.rk THEN 1 ELSE 0 END AS r
  FROM flows fl
  JOIN mass_out mo ON mo.i = fl.i
  JOIN mass_in mi ON mi.j = fl.j
  JOIN reg ri ON ri.nk = fl.i
  JOIN reg rj ON rj.nk = fl.j
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m0,
         CAST(SUM(x) AS BIGINT) AS m1,
         CAST(CAST(SUM(CAST(x AS HUGEINT) * x) AS VARCHAR) AS DOUBLE) AS m2,
         CAST(SUM(r) AS BIGINT) AS r1,
         CAST(SUM(x * r) AS BIGINT) AS xr,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(CAST(SUM(CAST(x AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) AS sxy,
         CAST(SUM(r * y) AS BIGINT) AS sry
  FROM pts
), d AS (
  SELECT CAST(m0 AS DOUBLE) AS n, CAST(m1 AS DOUBLE) AS sx, m2 AS sxx,
         CAST(r1 AS DOUBLE) AS sr, CAST(xr AS DOUBLE) AS sxr,
         CAST(r1 AS DOUBLE) AS srr,
         CAST(sy AS DOUBLE) AS sy, sxy, CAST(sry AS DOUBLE) AS sry
  FROM m
), sol AS (
  SELECT n,
    (n * (sxx * srr - sxr * sxr) - sx * (sx * srr - sxr * sr)
       + sr * (sx * sxr - sxx * sr)) AS det,
    (sy * (sxx * srr - sxr * sxr) - sx * (sxy * srr - sxr * sry)
       + sr * (sxy * sxr - sxx * sry)) AS da,
    (n * (sxy * srr - sry * sxr) - sy * (sx * srr - sxr * sr)
       + sr * (sx * sry - sr * sxy)) AS db,
    (n * (sxx * sry - sxr * sxy) - sx * (sx * sry - sxy * sr)
       + sy * (sx * sxr - sxx * sr)) AS dc
  FROM d
)
SELECT CAST(n AS BIGINT) AS n_pairs,
       da / det AS coef_intercept,
       db / det AS mass_elasticity,
       dc / det AS same_region_coef,
       exp(dc / det) AS region_multiplier
FROM sol
""",
)
def agg_gravity_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gravity model of inter-nation trade flows (Tinbergen):
    ln(flow_ij) = a + b*ln(M_i * M_j) + c*same_region over the
    supplier-nation -> customer-nation value flows, solved in
    CLOSED FORM (3x3 Cramer, the ts_bass_diffusion discipline) —
    the workhorse of empirical trade economics: b is the mass
    elasticity, exp(c) the within-region trade multiplier. Built on
    the same flow edges as graph_katz, but modeling INTENSITY, not
    topology.

    Exactness: flows and masses are exact cent sums; every ln is
    quantized at 1e-6 and the combined-mass regressor is DEFINED as
    lq(M_i) + lq(M_j) (exact integer micro-nats); the same-region
    dummy is exact (r^2 = r, so Srr = Sr); all normal-equation
    moments are exact integers (x*y products through
    HUGEINT/decimal(38)); the Cramer expansions evaluate in
    identical order. Scale shape: the flow aggregate shuffles one
    row per (i, j) pair (<= 600 cells regardless of corpus size);
    everything after is bounded."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    flows = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("i"), F.col("c_nationkey").alias("j")
        )
        .agg(
            F.sum(F.expr(cents("l_extendedprice"))).cast("bigint").alias("f")
        )
    )
    mass_out = flows.groupBy("i").agg(F.sum("f").cast("bigint").alias("mo"))
    mass_in = flows.groupBy("j").agg(F.sum("f").cast("bigint").alias("mi"))
    reg = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), F.col("n_regionkey").alias("rk")
    )

    def lnq(col):
        return F.floor(F.log(col.cast("double")) * 1000000 + 0.5).cast(
            "bigint"
        )

    pts = (
        flows.join(F.broadcast(mass_out), "i")
        .join(F.broadcast(mass_in), "j")
        .join(
            F.broadcast(reg.select(F.col("nk").alias("i"), F.col("rk").alias("ri"))),
            "i",
        )
        .join(
            F.broadcast(reg.select(F.col("nk").alias("j"), F.col("rk").alias("rj"))),
            "j",
        )
        .select(
            lnq(F.col("f")).alias("y"),
            (lnq(F.col("mo")) + lnq(F.col("mi"))).alias("x"),
            F.when(F.col("ri") == F.col("rj"), 1).otherwise(0).alias("r"),
        )
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("m0"),
        F.sum("x").cast("bigint").alias("m1"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("double")
        .alias("m2"),
        F.sum("r").cast("bigint").alias("r1"),
        F.sum(F.col("x") * F.col("r")).cast("bigint").alias("xr"),
        F.sum("y").cast("bigint").alias("sy0"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("r") * F.col("y")).cast("bigint").alias("sry0"),
    )
    d = m.select(
        F.col("m0").cast("double").alias("n"),
        F.col("m1").cast("double").alias("sx"),
        F.col("m2").alias("sxx"),
        F.col("r1").cast("double").alias("sr"),
        F.col("xr").cast("double").alias("sxr"),
        F.col("r1").cast("double").alias("srr"),
        F.col("sy0").cast("double").alias("sy"),
        "sxy",
        F.col("sry0").cast("double").alias("sry"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sr, sxr, srr = F.col("sr"), F.col("sxr"), F.col("srr")
    sy, sxy, sry = F.col("sy"), F.col("sxy"), F.col("sry")
    det = (
        n * (sxx * srr - sxr * sxr)
        - sx * (sx * srr - sxr * sr)
        + sr * (sx * sxr - sxx * sr)
    )
    da = (
        sy * (sxx * srr - sxr * sxr)
        - sx * (sxy * srr - sxr * sry)
        + sr * (sxy * sxr - sxx * sry)
    )
    db = (
        n * (sxy * srr - sry * sxr)
        - sy * (sx * srr - sxr * sr)
        + sr * (sx * sry - sr * sxy)
    )
    dc = (
        n * (sxx * sry - sxr * sxy)
        - sx * (sx * sry - sxy * sr)
        + sy * (sx * sxr - sxx * sr)
    )
    return d.select(
        n.cast("bigint").alias("n_pairs"),
        (da / det).alias("coef_intercept"),
        (db / det).alias("mass_elasticity"),
        (dc / det).alias("same_region_coef"),
        F.exp(dc / det).alias("region_multiplier"),
    )


POT_Q_PCT = 95  # exceedance threshold quantile


@query(
    "agg_pot_gpd",
    bounded_cross="1-row threshold scalar onto the exceedance scan",
    oracle=f"""
WITH s AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c, o_orderkey
  FROM orders
), r AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c, o_orderkey) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM s
), thr AS (
  SELECT c AS u, n FROM r
  WHERE rn = ({POT_Q_PCT} * n + 99) // 100
), exc AS (
  SELECT s.c - t.u AS e, t.u, t.n
  FROM s, thr t WHERE s.c > t.u
), m AS (
  SELECT MAX(u) AS u, MAX(n) AS n,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(e) AS BIGINT) AS se,
         CAST(CAST(SUM(CAST(e AS HUGEINT) * e) AS VARCHAR) AS DOUBLE) AS see
  FROM exc
), st AS (
  SELECT u, n, k,
         CAST(se AS DOUBLE) / k AS mb,
         (see - (CAST(se AS DOUBLE) / k) * se) / (k - 1) AS vb
  FROM m
)
SELECT n AS n_orders, k AS n_exceedances,
       CAST(u AS DOUBLE) / 100 AS threshold_dollars,
       mb / 100 AS mean_excess_dollars,
       0.5 * (1 - mb * mb / vb) AS gpd_xi,
       (mb / 2) * (mb * mb / vb + 1) / 100 AS gpd_sigma_dollars
FROM st
""",
)
def agg_pot_gpd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peaks-over-threshold GPD fit of order-value exceedances above
    the {POT_Q_PCT}th percentile (method of moments: xi =
    (1 - m^2/v)/2, sigma = m(m^2/v + 1)/2) — the third leg of the
    extreme-value family (agg_gumbel_daily_max fits block maxima,
    agg_hill_tail the log-tail index; POT uses ALL exceedances, the
    estimator practitioners actually deploy for VaR beyond data).
    xi < 0 reads as a bounded tail, xi > 0 heavy.

    Exactness: the threshold is the exact order statistic under the
    (cents, key) order; excesses and their moments are exact
    integers (squares via HUGEINT/decimal(38)); xi and sigma are
    fixed double expressions. Scale shape: one global-rank pick,
    one filtered scan with a declared 1-row threshold cross, a
    1-row reduction."""
    s = load(spark, sf_dir, "orders").select(
        F.expr(cents("o_totalprice")).alias("c"), "o_orderkey"
    )
    from ..plans.global_rank import with_global_row_number

    r, n = with_global_row_number(s, ["c", "o_orderkey"], out_col="rn")
    kq = (POT_Q_PCT * n + 99) // 100
    u = int(
        r.filter(F.col("rn") == kq).select("c").collect()[0]["c"]
    )
    exc = s.filter(F.col("c") > u).select((F.col("c") - u).alias("e"))
    m = exc.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("e").cast("bigint").alias("se"),
        F.sum(F.col("e").cast("decimal(38,0)") * F.col("e"))
        .cast("double")
        .alias("see"),
    )
    mb = F.col("se").cast("double") / F.col("k")
    vb = (F.col("see") - mb * F.col("se")) / (F.col("k") - 1)
    return m.select(
        F.lit(n).cast("bigint").alias("n_orders"),
        F.col("k").alias("n_exceedances"),
        F.lit(float(u) / 100).alias("threshold_dollars"),
        (mb / 100).alias("mean_excess_dollars"),
        (F.lit(0.5) * (F.lit(1) - mb * mb / vb)).alias("gpd_xi"),
        ((mb / 2) * (mb * mb / vb + 1) / 100).alias("gpd_sigma_dollars"),
    )


@query(
    "agg_weibull_rank_fit",
    oracle="""
WITH s AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c, o_orderkey
  FROM orders
), r AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c, o_orderkey) AS i,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM s
), pts AS (
  SELECT CAST(FLOOR(LN(CAST(c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(LN(-LN(1 - (i - 0.375) / (n + 0.25))) * 1000000 + 0.5)
              AS BIGINT) AS y
  FROM r
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(CAST(SUM(CAST(x AS HUGEINT) * x) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(CAST(SUM(CAST(x AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) AS sxy
  FROM pts
), fit AS (
  SELECT n,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS k,
         (CAST(sy AS DOUBLE)
          - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * sx)
           / n AS a
  FROM m
)
SELECT n AS n_orders,
       k AS weibull_shape,
       FLOOR(exp(-a / k / 1000000) / 100 * 10000 + 0.5) / 10000
         AS weibull_scale_dollars
FROM fit
""",
)
def agg_weibull_rank_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull probability-plot fit of order values (median-rank
    regression, the reliability-engineering standard): with Benard
    plotting positions F_i = (i - 0.375)/(n + 0.25), regress
    ln(-ln(1-F)) on ln(x) — the slope IS the shape k and
    exp(-intercept/k) the scale — completing the distribution-
    fitting shelf (gamma/lognormal body, NB counts, gumbel maxima,
    GPD exceedances; Weibull is THE lifetime/strength model).
    k > 1 reads as wear-out-like concentration, k < 1 heavy-lower-
    tail.

    Exactness: ranks come from one pass of the global-rank
    machinery under the (cents, key) order; both per-row lns are
    quantized at 1e-6 (plotting positions are identical doubles by
    construction), so the OLS moments are exact integers (x*y via
    HUGEINT/decimal(38), ~1.7e20 at sf0.1 — the wide type is
    load-bearing); slope/intercept/scale are fixed double
    expressions, numpy-pinned per the closed-form rule; the final
    exp is quantized at 1e-4 dollars (the cross-engine exp 1-ulp
    spread bit at sf0.1 — caught by the hash gate, absorbed by
    half-up rounding). Scale shape: one rank pass, one 1-row
    moment reduction."""
    from ..plans.global_rank import with_global_row_number

    s = load(spark, sf_dir, "orders").select(
        F.expr(cents("o_totalprice")).alias("c"), "o_orderkey"
    )
    r, n = with_global_row_number(s, ["c", "o_orderkey"], out_col="i")
    fpos = (F.col("i") - F.lit(0.375)) / (F.lit(n) + F.lit(0.25))
    pts = r.select(
        F.floor(F.log(F.col("c").cast("double")) * 1000000 + 0.5)
        .cast("bigint")
        .alias("x"),
        F.floor(F.log(-F.log(F.lit(1) - fpos)) * 1000000 + 0.5)
        .cast("bigint")
        .alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("double")
        .alias("sxx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("sxy"),
    )
    n_d = F.col("n").cast("double")
    k = (n_d * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        n_d * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    a = (F.col("sy").cast("double") - k * F.col("sx")) / F.col("n")
    return m.select(
        F.col("n").alias("n_orders"),
        k.alias("weibull_shape"),
        (
            F.floor(
                F.exp(-a / k / F.lit(1000000)) / 100 * 10000 + F.lit(0.5)
            )
            / 10000
        ).alias("weibull_scale_dollars"),
    )


@query(
    "agg_cr4_concentration",
    bounded_cross="1-row grand-total scalar onto the 8-row top list",
    oracle="""
WITH rev AS (
  SELECT s.s_suppkey,
         CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS r
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1
), tot AS (
  SELECT CAST(SUM(r) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS n
  FROM rev
), top AS (
  SELECT r, ROW_NUMBER() OVER (ORDER BY r DESC, s_suppkey) AS rk
  FROM rev QUALIFY rk <= 8
)
SELECT tot.n AS n_suppliers,
       CAST(SUM(CASE WHEN top.rk <= 4 THEN top.r ELSE 0 END) AS DOUBLE)
         / tot.t AS cr4,
       CAST(SUM(top.r) AS DOUBLE) / tot.t AS cr8
FROM top, tot
GROUP BY tot.n, tot.t
""",
)
def agg_cr4_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four- and eight-firm concentration ratios of supplier revenue
    (CR4/CR8): the share of the market held by the largest 4 and 8
    suppliers — the antitrust screen read alongside agg_hhi (HHI
    weights ALL squared shares; CRk asks only about the head, the
    number merger guidelines quote first).

    Exactness: supplier revenues and the grand total are exact cent
    sums; the top-8 cut is a deterministic (revenue DESC, suppkey)
    rank; both ratios divide exact integers. Scale shape: one hash
    aggregate to O(suppliers), a WindowGroupLimit top-8 (rank-limit
    pushdown, never a global sort), a declared 1-row total
    cross."""
    rev = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.expr(cents("l_extendedprice"))).cast("bigint").alias("r")
        )
    )
    tot = rev.agg(
        F.sum("r").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    # bounded: top-8 rank limit
    wr = Window.orderBy(F.desc("r"), "l_suppkey")
    top = (
        rev.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 8)
    )
    j = top.crossJoin(F.broadcast(tot))
    return j.groupBy("n", "t").agg(
        (
            F.sum(F.when(F.col("rk") <= 4, F.col("r")).otherwise(0)).cast(
                "double"
            )
            / F.max("t")
        ).alias("cr4"),
        (F.sum("r").cast("double") / F.max("t")).alias("cr8"),
    ).select(
        F.col("n").alias("n_suppliers"), "cr4", "cr8"
    )


@query(
    "agg_taylors_law",
    oracle="""
WITH g AS (
  SELECT c.c_nationkey AS nk,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS s,
         CAST(CAST(SUM(CAST(CAST(round(o.o_totalprice * 100) AS BIGINT)
                  AS HUGEINT)
                  * CAST(round(o.o_totalprice * 100) AS BIGINT))
              AS VARCHAR) AS DOUBLE) AS ss
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1
), pts AS (
  SELECT nk,
         CAST(FLOOR(LN(CAST(s AS DOUBLE) / n) * 1000000 + 0.5) AS BIGINT)
           AS x,
         CAST(FLOOR(LN((ss - (CAST(s AS DOUBLE) / n) * s) / (n - 1))
                    * 1000000 + 0.5) AS BIGINT) AS y
  FROM g WHERE n > 1
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM pts
)
SELECT k AS n_groups,
       (CAST(k AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / (CAST(k AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
         AS taylor_slope_b,
       (CAST(sy AS DOUBLE)
        - ((CAST(k AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(k AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * sx)
         / k / 1000000 AS ln_a_intercept
FROM m
""",
)
def agg_taylors_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Taylor's power law (fluctuation scaling) across the 25 nation
    markets: regress ln(variance) on ln(mean) of order values per
    nation — variance ~ a * mean^b, with b = 1 the Poisson-like
    regime and b -> 2 the clumped/heterogeneous regime; the
    scaling diagnostic ecology exported to operations and finance
    (how does dispersion grow with market size?). Sits beside
    agg_overdispersion (one global index) with a CROSS-GROUP
    scaling exponent.

    Exactness: per-nation moments are exact integers
    (HUGEINT/decimal(38) squares); both lns are quantized at 1e-6
    so the OLS over 25 micro-nat points is exact integer
    arithmetic with a closed-form slope (numpy-pinned per the
    closed-form rule). Scale shape: one broadcast dim join + a
    25-row hash aggregate, a 1-row reduction."""
    g = (
        load(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                load(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey"
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("s"),
            F.sum(
                F.expr(cents("o_totalprice")).cast("decimal(38,0)")
                * F.expr(cents("o_totalprice"))
            )
            .cast("double")
            .alias("ss"),
        )
    )
    mu = F.col("s").cast("double") / F.col("n")
    var = (F.col("ss") - mu * F.col("s")) / (F.col("n") - 1)
    pts = g.filter(F.col("n") > 1).select(
        F.floor(F.log(mu) * 1000000 + 0.5).cast("bigint").alias("x"),
        F.floor(F.log(var) * 1000000 + 0.5).cast("bigint").alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    k_d = F.col("k").cast("double")
    slope = (k_d * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        k_d * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    return m.select(
        F.col("k").alias("n_groups"),
        slope.alias("taylor_slope_b"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx"))
            / F.col("k")
            / F.lit(1000000)
        ).alias("ln_a_intercept"),
    )


@query(
    "agg_hoover_index",
    bounded_cross="1-row (n, total) scalar onto the customer spend table",
    oracle="""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sc
  FROM orders GROUP BY o_custkey
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(sc) AS BIGINT) AS s
  FROM spend
), dev AS (
  SELECT CAST(CAST(SUM(ABS(CAST(spend.sc AS HUGEINT) * tot.n - tot.s))
              AS VARCHAR) AS DOUBLE) AS sad,
         MAX(tot.n) AS n, MAX(tot.s) AS s
  FROM spend, tot
)
SELECT n AS n_customers,
       CAST(s AS DOUBLE) / n / 100 AS mean_spend_dollars,
       sad / (2 * CAST(n AS DOUBLE) * s) AS hoover_index
FROM dev
""",
)
def agg_hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoover (Robin Hood) index of customer spend concentration:
    the share of total spend that would have to move to equalize
    everyone — geometrically the maximum vertical gap between the
    Lorenz curve and the diagonal, computed here by the EXACT
    identity Hoover = sum|x_i - mu| / (2 n mu) = sum|n x_i - S| /
    (2 n S), which turns the whole statistic into one absolute-
    integer sum (no sort, no prefix — unlike the Lorenz/Gini pair,
    Hoover needs no order statistics at all). Completes the
    inequality family's most operational member ('how many dollars
    must move?').

    Exactness: every |n*x - S| term is an exact integer
    (HUGEINT/decimal(38) — ~1e22 at a 100x corpus); one float
    division closes it. Scale shape: one customer rollup, a
    declared 1-row scalar cross, one absolute-sum reduction —
    shuffle-light even by this repo's standards."""
    spend = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("sc"))
    )
    tot = spend.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("sc").cast("bigint").alias("s"),
    )
    # bounded: 1-row (n, total) scalar
    dev = spend.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.abs(
                F.col("sc").cast("decimal(38,0)") * F.col("n") - F.col("s")
            )
        )
        .cast("double")
        .alias("sad"),
        F.max("n").alias("n"),
        F.max("s").alias("s"),
    )
    return dev.select(
        F.col("n").alias("n_customers"),
        (F.col("s").cast("double") / F.col("n") / 100).alias(
            "mean_spend_dollars"
        ),
        (
            F.col("sad")
            / (2 * F.col("n").cast("double") * F.col("s"))
        ).alias("hoover_index"),
    )


@query(
    "agg_price_dispersion",
    oracle="""
WITH up AS (
  SELECT l_partkey,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM((CAST(round(l_extendedprice * 100) AS BIGINT) * 1000)
                  // CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS s,
         CAST(CAST(SUM(CAST((CAST(round(l_extendedprice * 100) AS BIGINT)
                             * 1000)
                            // CAST(round(l_quantity) AS BIGINT) AS HUGEINT)
                  * ((CAST(round(l_extendedprice * 100) AS BIGINT) * 1000)
                     // CAST(round(l_quantity) AS BIGINT)))
              AS VARCHAR) AS HUGEINT) AS ss
  FROM lineitem GROUP BY 1
), multi AS (
  SELECT n, s, ss FROM up WHERE n >= 2
), cls AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_multi,
         CAST(SUM(CASE WHEN 100 * n * (n * ss - CAST(s AS HUGEINT) * s)
                            > (n - 1) * CAST(s AS HUGEINT) * s
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_high
  FROM multi
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM up) AS n_parts,
       cls.n_multi AS n_multi_observation_parts,
       cls.n_high AS n_high_dispersion_parts,
       CAST(cls.n_high AS DOUBLE) / cls.n_multi AS high_dispersion_share
FROM cls
""",
)
def agg_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Law-of-one-price screen: for every part observed on >= 2
    lineitems, classify whether its UNIT-price coefficient of
    variation exceeds 10% — entirely in EXACT INTEGER arithmetic by
    cross-multiplying the CV^2 > 0.01 inequality
    (100 n (n*ss - s^2) > (n-1) s^2, unit prices quantized once at
    milli-cents like agg_price_index) — the price-dispersion
    diagnostic empirical IO runs on any marketplace, with zero
    float entering the per-part decision.

    Exactness: quantized unit prices, their sums and the inequality
    sides are exact integers (HUGEINT/decimal(38) — s^2 terms reach
    ~8e21 at 100x); only the final share divides. Scale shape: one
    part-keyed hash aggregate, one classification aggregate."""
    up_expr = (
        f"({cents('l_extendedprice')} * 1000) div "
        f"CAST(round(l_quantity) AS BIGINT)"
    )
    up = (
        load(spark, sf_dir, "lineitem")
        .select(F.expr(up_expr).alias("p"), "l_partkey")
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("p").cast("bigint").alias("s"),
            F.sum(F.col("p").cast("decimal(38,0)") * F.col("p")).alias("ss"),
        )
    )
    n_parts = up.count()
    multi = up.filter(F.col("n") >= 2)
    s_dec = F.col("s").cast("decimal(38,0)")
    lhs = 100 * F.col("n") * (F.col("n") * F.col("ss") - s_dec * F.col("s"))
    rhs = (F.col("n") - 1) * s_dec * F.col("s")
    cls = multi.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_multi"),
        F.sum(F.when(lhs > rhs, 1).otherwise(0)).cast("bigint").alias(
            "n_high"
        ),
    )
    return cls.select(
        F.lit(n_parts).cast("bigint").alias("n_parts"),
        F.col("n_multi").alias("n_multi_observation_parts"),
        F.col("n_high").alias("n_high_dispersion_parts"),
        (F.col("n_high").cast("double") / F.col("n_multi")).alias(
            "high_dispersion_share"
        ),
    )


@query(
    "agg_mean_log_deviation",
    oracle="""
WITH t AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
         CAST(round(1000000000000.0
              * ln(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DOUBLE)))
              AS BIGINT) AS lq
  FROM orders
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(CAST(SUM(CAST(lq AS HUGEINT)) AS VARCHAR) AS DOUBLE) AS sl
  FROM t
)
SELECT n AS n_orders,
       (CAST(FLOOR(LN(CAST(s AS DOUBLE) / n) * 1000000 + 0.5) AS BIGINT)
          / 1e6)
         - sl / 1000000000000 / n AS mean_log_deviation
FROM m
""",
)
def agg_mean_log_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean log deviation (Theil's L, generalized entropy GE(0)) of
    order values: MLD = ln(mean) - mean(ln x) — the inequality
    member that weights the BOTTOM of the distribution (GE(1) =
    Theil T weights the top; Atkinson(1) = 1 - exp(-MLD) links the
    two), closing the generalized-entropy family the engine now
    carries end to end (gini, lorenz, palma, hoover, theil,
    atkinson, GE(0)).

    Exactness: the per-row ln rides the established 1e-12
    quantization with its decimal(38) sum; ln(mean) is quantized at
    1e-6 over the identical exact-moment double; the statistic is
    fixed arithmetic over those quantized integers. ONE hash
    aggregate."""
    t = load(spark, sf_dir, "orders").select(
        F.expr(cents("o_totalprice")).alias("c")
    ).select(
        "c",
        F.round(
            F.lit(1000000000000.0) * F.log(F.col("c").cast("double"))
        )
        .cast("bigint")
        .alias("lq"),
    )
    m = t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("lq").cast("decimal(38,0)")).cast("double").alias("sl"),
    )
    ln_mu_q = F.floor(
        F.log(F.col("s").cast("double") / F.col("n")) * F.lit(1000000)
        + F.lit(0.5)
    ).cast("bigint") / F.lit(1e6)
    return m.select(
        F.col("n").alias("n_orders"),
        (
            ln_mu_q - F.col("sl") / F.lit(1000000000000) / F.col("n")
        ).alias("mean_log_deviation"),
    )


@query(
    "agg_market_model",
    oracle=f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1992-01-01',
                   CAST(date_trunc('day', ts) AS DATE)) AS dd,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY 1, 2
), rx AS (
  SELECT dd, CAST(c - LAG(c) OVER (ORDER BY dd) AS DOUBLE)
               / LAG(c) OVER (ORDER BY dd) AS x
  FROM daily WHERE event_type = 'click' QUALIFY x IS NOT NULL
), ry AS (
  SELECT dd, CAST(c - LAG(c) OVER (ORDER BY dd) AS DOUBLE)
               / LAG(c) OVER (ORDER BY dd) AS y
  FROM daily WHERE event_type = 'purchase' QUALIFY y IS NOT NULL
), j AS (
  SELECT rx.dd, rx.x, ry.y FROM rx JOIN ry ON ry.dd = rx.dd
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         list_sum(list(x ORDER BY dd)) AS sx,
         list_sum(list(y ORDER BY dd)) AS sy,
         list_sum(list(x * x ORDER BY dd)) AS sxx,
         list_sum(list(y * y ORDER BY dd)) AS syy,
         list_sum(list(x * y ORDER BY dd)) AS sxy
  FROM j
), fit AS (
  SELECT n,
         (CAST(n AS DOUBLE) * sxy - sx * sy)
           / (CAST(n AS DOUBLE) * sxx - sx * sx) AS beta,
         (sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx) / n AS alpha,
         (CAST(n AS DOUBLE) * sxy - sx * sy)
           * (CAST(n AS DOUBLE) * sxy - sx * sy)
           / ((CAST(n AS DOUBLE) * sxx - sx * sx)
              * (CAST(n AS DOUBLE) * syy - sy * sy)) AS r2
  FROM m
)
SELECT n AS n_days, alpha AS jensen_alpha_daily, beta, r2
FROM fit
""",
)
def agg_market_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-index market model of purchase returns on click
    returns: beta (sensitivity of conversions to traffic moves),
    Jensen's alpha (conversion return unexplained by traffic — the
    'organic' component) and R^2 — the CAPM regression transplanted
    to the funnel, closing the two-series finance shelf (ts_ccf
    lead-lag, min-variance allocation, turbulence joint-outliers;
    this one DECOMPOSES one series' moves by the other).

    Exactness: returns are float divisions of exact integer pairs;
    all five moments fold in day order via the strict-fold pair;
    alpha/beta/R^2 are fixed double expressions in identical
    order. One 2-series rollup, bounded folds, a 1-row
    reduction."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("1992-01-01")
        ).alias("dd"),
    ).agg(F.sum(F.expr(cents("value"))).cast("bigint").alias("c"))

    def rets(tp, out):
        # bounded: O(days) per-type rollup rows
        w = Window.orderBy("dd")
        return (
            daily.filter(F.col("event_type") == tp)
            .select(
                "dd",
                (
                    (F.col("c") - F.lag("c").over(w)).cast("double")
                    / F.lag("c").over(w)
                ).alias(out),
            )
            .filter(F.col(out).isNotNull())
        )

    rx = rets("click", "x")
    ry = rets("purchase", "y").select(F.col("dd").alias("dd_y"), "y")
    j = rx.join(ry, rx["dd"] == ry["dd_y"]).select("dd", "x", "y")
    arr = F.array_sort(
        F.collect_list(
            F.struct("dd", F.col("x").alias("x"), F.col("y").alias("y"))
        )
    )

    def fold(f):
        return F.aggregate(arr, F.lit(0.0), lambda acc, e: acc + f(e))

    m = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        fold(lambda e: e["x"]).alias("sx"),
        fold(lambda e: e["y"]).alias("sy"),
        fold(lambda e: e["x"] * e["x"]).alias("sxx"),
        fold(lambda e: e["y"] * e["y"]).alias("syy"),
        fold(lambda e: e["x"] * e["y"]).alias("sxy"),
    )
    n_d = F.col("n").cast("double")
    num = n_d * F.col("sxy") - F.col("sx") * F.col("sy")
    beta = num / (n_d * F.col("sxx") - F.col("sx") * F.col("sx"))
    alpha = (F.col("sy") - beta * F.col("sx")) / F.col("n")
    r2 = (
        num
        * num
        / (
            (n_d * F.col("sxx") - F.col("sx") * F.col("sx"))
            * (n_d * F.col("syy") - F.col("sy") * F.col("sy"))
        )
    )
    return m.select(
        F.col("n").alias("n_days"),
        alpha.alias("jensen_alpha_daily"),
        beta.alias("beta"),
        r2.alias("r2"),
    )
