"""Experimentation, causal inference, Bayesian updates and sampling designs (SURVEY.md §2.2-D).

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
    RDD_BANDWIDTH,
    RDD_CUTOFF_C,
    _IPF_CUTOFF,
    _IPF_PAIRS,
    _kbucket,
    _raking_oracle,
    _rdd_side_sql,
    cents,
    pps_systematic_over,
)


# Poisson(1) inverse CDF thresholds (cumulative e^-1 * 1/k!), exact
# double literals -> identical CASE ladder on both engines.
_BOOT_U01 = (
    "((((event_id * 37 + rep) % 2147483648) * 2654435761)"
    " % 4294967296) / 4294967296.0"
)
_BOOT_WT = (
    "CASE WHEN u < 0.36787944117144233 THEN 0"
    " WHEN u < 0.7357588823428847 THEN 1"
    " WHEN u < 0.9196986029286058 THEN 2"
    " WHEN u < 0.9810118431238462 THEN 3"
    " WHEN u < 0.9963401531726563 THEN 4"
    " WHEN u < 0.9994058151824183 THEN 5"
    " ELSE 6 END"
)
_BOOT_R = 32


@query(
    "sample_poisson_bootstrap",
    oracle=f"""
WITH reps AS (SELECT unnest(generate_series(0, {_BOOT_R - 1})) AS rep),
base AS (
  SELECT e.event_type, r.rep,
         {_BOOT_U01} AS u,
         CAST(ROUND((value) * 100) AS BIGINT) AS c
  FROM events e CROSS JOIN reps r
), wtd AS (
  SELECT event_type, rep, {_BOOT_WT} AS wt, c FROM base
), m AS (
  SELECT event_type, rep,
         CAST(SUM(wt * c) AS DOUBLE) / 100
           / nullif(CAST(SUM(wt) AS DOUBLE), 0) AS mean_r
  FROM wtd GROUP BY event_type, rep
), ranked AS (
  SELECT event_type, mean_r,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY mean_r, rep) AS rn
  FROM m
)
SELECT event_type,
       MIN(CASE WHEN rn = 2 THEN mean_r END) AS boot_lo,
       MIN(CASE WHEN rn = {_BOOT_R - 1} THEN mean_r END) AS boot_hi
FROM ranked GROUP BY event_type
""",
)
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap confidence interval for the per-group mean
    (Chamandy et al., "Estimating Uncertainty for Massive Data
    Streams" — the Google one-pass bootstrap): each row joins every
    replicate with weight ~ Poisson(1) drawn DETERMINISTICALLY from a
    hash of (row id, replicate id) via the inverse CDF, so resampling
    needs no RNG state, no data movement, and reproduces identically
    on any cluster layout or engine. 32 replicate means per group,
    report the 2nd and 31st order statistics (~94% interval).

    Scale shape: the replicate fan-out is a constant-factor (32x)
    narrow map — at 100 TB you run it on the aggregate's INPUT KEYS
    only, never materializing the fan-out to disk — and each
    replicate mean is an exact integer-cents ratio, so the entire
    statistic is bit-reproducible (same CASE ladder of exact double
    thresholds on both engines). Order statistics tie-break by
    replicate id."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").select(
        "event_type", "event_id", F.expr(cents("value")).alias("c")
    )
    fan = ev.withColumn(
        "rep", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1)))
    ).withColumn("u", F.expr(_BOOT_U01)).withColumn(
        "wt", F.expr(_BOOT_WT)
    )
    m = fan.groupBy("event_type", "rep").agg(
        F.expr(
            "CAST(SUM(wt * c) AS DOUBLE) / 100"
            " / nullif(CAST(SUM(wt) AS DOUBLE), 0)"
        ).alias("mean_r")
    )
    w = Window.partitionBy("event_type").orderBy("mean_r", "rep")
    ranked = m.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("event_type").agg(
        F.min(F.when(F.col("rn") == 2, F.col("mean_r"))).alias("boot_lo"),
        F.min(F.when(F.col("rn") == _BOOT_R - 1, F.col("mean_r"))).alias(
            "boot_hi"
        ),
    )


_AB_U01 = (
    "(((user_id % 2147483648) * 2654435761 % 4294967296) / 4294967296.0)"
)


@query(
    "sample_ab_assignment",
    oracle=f"""
WITH arms AS (
  SELECT DISTINCT user_id,
         CASE WHEN {_AB_U01} < 0.5 THEN 'A' ELSE 'B' END AS arm
  FROM events
), c AS (
  SELECT arm, COUNT(*) AS n FROM arms GROUP BY arm
), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM c)
SELECT arm, n,
       CAST(t AS DOUBLE) / 2 AS expected,
       (CAST(n AS DOUBLE) - CAST(t AS DOUBLE) / 2)
         * (CAST(n AS DOUBLE) - CAST(t AS DOUBLE) / 2)
         / (CAST(t AS DOUBLE) / 2) AS srm_chi2_term
FROM c, tot
""",
)
def sample_ab_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic experiment bucketing + sample-ratio-mismatch
    audit: users hash into arms A/B with the engine's stateless
    uniform hash (no RNG, stable across sessions, layouts, engines —
    the property real experimentation systems require so a user
    never flips arms), then each arm's count is checked against the
    50/50 design with its chi-square SRM term (the standard broken-
    randomization alarm; threshold ~3.84 for p<0.05 with the two
    terms summed). All doubles derive from exact counts with
    identical expression text — bit-exact. One distinct + two tiny
    aggregates."""
    ev = load(spark, sf_dir, "events")
    arms = ev.select(
        "user_id",
        F.when(F.expr(_AB_U01) < 0.5, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("arm"),
    ).distinct()
    c = arms.groupBy("arm").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.sum("n").cast("bigint").alias("t"))
    half = "CAST(t AS DOUBLE) / 2"
    return c.crossJoin(F.broadcast(tot)).select(
        "arm",
        "n",
        F.expr(half).alias("expected"),
        F.expr(
            f"(CAST(n AS DOUBLE) - {half}) * (CAST(n AS DOUBLE) - {half})"
            f" / ({half})"
        ).alias("srm_chi2_term"),
    )


_RATIO_CI_FINAL = """
SELECT grp, n,
       sx / sy AS ratio,
       sqrt(greatest(
         ((sxx - sx * sx / n)
          - 2 * (sx / sy) * (sxy - sx * sy / n)
          + (sx / sy) * (sx / sy) * (syy - sy * sy / n))
         / (n - 1), 0.0)) / (sy / n) / sqrt(n) AS se,
       sx / sy - 1.959963984540054 *
         (sqrt(greatest(
           ((sxx - sx * sx / n)
            - 2 * (sx / sy) * (sxy - sx * sy / n)
            + (sx / sy) * (sx / sy) * (syy - sy * sy / n))
           / (n - 1), 0.0)) / (sy / n) / sqrt(n)) AS ci_lo,
       sx / sy + 1.959963984540054 *
         (sqrt(greatest(
           ((sxx - sx * sx / n)
            - 2 * (sx / sy) * (sxy - sx * sy / n)
            + (sx / sy) * (sx / sy) * (syy - sy * sy / n))
           / (n - 1), 0.0)) / (sy / n) / sqrt(n)) AS ci_hi
""".strip()


@query(
    "agg_ratio_delta_ci",
    oracle=f"""
WITH m AS (
  SELECT l_returnflag AS grp,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM({cents('l_extendedprice')}) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST({cents('l_extendedprice')} AS HUGEINT)
                  * {cents('l_extendedprice')}) AS VARCHAR) AS DOUBLE)
           AS sxx,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS DOUBLE) AS syy,
         CAST(CAST(SUM(CAST({cents('l_extendedprice')} AS HUGEINT)
                  * l_quantity) AS VARCHAR) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
{_RATIO_CI_FINAL}
FROM m
""",
)
def agg_ratio_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric
    (revenue-cents per unit quantity, per return flag) — the
    experimentation readout for per-user/per-session ratios where
    the naive per-row mean is simply wrong: the ratio of sums is the
    estimand and its sampling noise comes from the joint (x, y)
    variation, se^2 = (var_x - 2 r cov + r^2 var_y) / (n ybar^2).
    Six exact moment sums (HUGEINT / DECIMAL(38) where cents
    products overflow int64) convert to double once; the CI
    expression is a SHARED SQL fragment run verbatim by both
    engines — bit-exact, no rounding."""
    li = load(spark, sf_dir, "lineitem")
    cy = cents("l_extendedprice")
    q = "CAST(l_quantity AS BIGINT)"
    dec = "DECIMAL(38,0)"
    m = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
        F.expr(f"CAST(SUM({cy}) AS DOUBLE)").alias("sx"),
        F.expr(f"CAST(SUM({q}) AS DOUBLE)").alias("sy"),
        F.expr(
            f"CAST(SUM(CAST({cy} AS {dec}) * {cy}) AS DOUBLE)"
        ).alias("sxx"),
        F.expr(f"CAST(SUM({q} * {q}) AS DOUBLE)").alias("syy"),
        F.expr(
            f"CAST(SUM(CAST({cy} AS {dec}) * l_quantity) AS DOUBLE)"
        ).alias("sxy"),
    )
    m.createOrReplaceTempView("ratio_ci_m")
    return spark.sql(f"{_RATIO_CI_FINAL}\nFROM ratio_ci_m")


@query(
    "agg_cuped",
    oracle="""
WITH post AS (
  SELECT o_custkey AS cust, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS y
  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY 1
), pre AS (
  SELECT o_custkey AS cust, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS x
  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1
), units AS (
  SELECT post.cust, post.y, COALESCE(pre.x, 0) AS x
  FROM post LEFT JOIN pre ON pre.cust = post.cust
), m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(x AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) AS sxy,
         CAST(CAST(SUM(CAST(x AS HUGEINT) * x) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(y AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) AS syy
  FROM units
)
SELECT CAST(n AS BIGINT) AS n_customers,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS theta,
       round(sy / n / 100, 6) AS mean_post_spend,
       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         AS var_reduction
FROM m
""",
)
def agg_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for experiment metrics (Deng et al.
    2013): theta = Cov(pre-period covariate, post-period metric) /
    Var(covariate) over customer units, and the variance-reduction
    factor rho^2 the adjusted metric Y - theta*(X - E[X]) buys. The
    A/B-testing staple that cuts experiment runtime: the same exact
    moment-sum discipline as agg_cov_matrix (cents products through
    DECIMAL(38,0) on the Spark side, HUGEINT->VARCHAR->DOUBLE in the
    oracle), so theta and rho^2 are deterministic closed forms over
    order-independent integer sums. One shuffled agg per period plus
    a broadcast-sized unit join."""
    o = load(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    post = (
        o.filter("o_orderdate >= TIMESTAMP '1998-01-01'")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(F.expr(f"SUM({c})").alias("y"))
    )
    pre = (
        o.filter("o_orderdate < TIMESTAMP '1998-01-01'")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(F.expr(f"SUM({c})").alias("x"))
    )
    units = post.join(pre, "cust", "left").select(
        "y", F.coalesce("x", F.lit(0)).alias("x")
    )
    dec = "DECIMAL(38,0)"
    m = units.agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
        F.expr("CAST(SUM(x) AS DOUBLE)").alias("sx"),
        F.expr("CAST(SUM(y) AS DOUBLE)").alias("sy"),
        F.expr(f"CAST(SUM(CAST(x AS {dec}) * y) AS DOUBLE)").alias("sxy"),
        F.expr(f"CAST(SUM(CAST(x AS {dec}) * x) AS DOUBLE)").alias("sxx"),
        F.expr(f"CAST(SUM(CAST(y AS {dec}) * y) AS DOUBLE)").alias("syy"),
    )
    return m.select(
        F.expr("CAST(n AS BIGINT)").alias("n_customers"),
        F.expr("round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)").alias(
            "theta"
        ),
        F.expr("round(sy / n / 100, 6)").alias("mean_post_spend"),
        F.expr(
            "round((n * sxy - sx * sy) * (n * sxy - sx * sy)"
            " / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)"
        ).alias("var_reduction"),
    )


@query(
    "agg_diff_in_diff",
    oracle="""
WITH cells AS (
  SELECT CASE WHEN c_nationkey < 12 THEN 'treat' ELSE 'control' END AS cohort,
         CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
              THEN 'post' ELSE 'pre' END AS period,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders JOIN customer ON o_custkey = c_custkey
), m AS (
  SELECT
    CAST(SUM(CASE WHEN cohort='treat' AND period='pre' THEN c END) AS DOUBLE)
      / COUNT(CASE WHEN cohort='treat' AND period='pre' THEN 1 END) / 100
      AS pre_treat,
    CAST(SUM(CASE WHEN cohort='treat' AND period='post' THEN c END) AS DOUBLE)
      / COUNT(CASE WHEN cohort='treat' AND period='post' THEN 1 END) / 100
      AS post_treat,
    CAST(SUM(CASE WHEN cohort='control' AND period='pre' THEN c END) AS DOUBLE)
      / COUNT(CASE WHEN cohort='control' AND period='pre' THEN 1 END) / 100
      AS pre_control,
    CAST(SUM(CASE WHEN cohort='control' AND period='post' THEN c END) AS DOUBLE)
      / COUNT(CASE WHEN cohort='control' AND period='post' THEN 1 END) / 100
      AS post_control,
    CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM cells
)
SELECT n_orders,
       round(pre_treat, 6) AS pre_treat,
       round(post_treat, 6) AS post_treat,
       round(pre_control, 6) AS pre_control,
       round(post_control, 6) AS post_control,
       round((post_treat - pre_treat) - (post_control - pre_control), 6)
         AS did_estimate
FROM m
""",
)
def agg_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator over the 2x2 design
    (treatment cohort = nations 0-11, period split at 1998-01-01,
    metric = mean order value): the causal-inference workhorse for
    rollouts without randomization. All four cell means come from ONE
    conditional-aggregation pass over the order-customer join (exact
    cents sums / exact counts, single shuffle), and the DiD estimate
    is a closed-form expression over them — identical SQL text in
    both engines."""
    o = load(spark, sf_dir, "orders")
    cu = load(spark, sf_dir, "customer")
    cells = o.join(cu, o.o_custkey == cu.c_custkey).select(
        F.expr(
            "CASE WHEN c_nationkey < 12 THEN 'treat' ELSE 'control' END"
        ).alias("cohort"),
        F.expr(
            "CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'"
            " THEN 'post' ELSE 'pre' END"
        ).alias("period"),
        F.expr(cents("o_totalprice")).alias("c"),
    )

    def cell(coh, per):
        return (
            f"CAST(SUM(CASE WHEN cohort='{coh}' AND period='{per}' THEN c END)"
            f" AS DOUBLE)"
            f" / COUNT(CASE WHEN cohort='{coh}' AND period='{per}' THEN 1 END)"
            f" / 100"
        )

    m = cells.agg(
        F.expr(cell("treat", "pre")).alias("pre_treat"),
        F.expr(cell("treat", "post")).alias("post_treat"),
        F.expr(cell("control", "pre")).alias("pre_control"),
        F.expr(cell("control", "post")).alias("post_control"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_orders"),
    )
    return m.select(
        "n_orders",
        F.round("pre_treat", 6).alias("pre_treat"),
        F.round("post_treat", 6).alias("post_treat"),
        F.round("pre_control", 6).alias("pre_control"),
        F.round("post_control", 6).alias("post_control"),
        F.expr(
            "round((post_treat - pre_treat) - (post_control - pre_control), 6)"
        ).alias("did_estimate"),
    )


# SPRT constants, computed ONCE in Python and embedded as repr
# literals in BOTH engines (repr round-trips the double exactly, so
# the llr arithmetic s*L1 + f*L0 is bit-identical cross-engine —
# no engine ever calls ln() on data).
import math as _math

_SPRT_P0, _SPRT_P1 = 0.10, 0.13
_SPRT_L1 = _math.log(_SPRT_P1 / _SPRT_P0)  # per-success llr increment
_SPRT_L0 = _math.log((1 - _SPRT_P1) / (1 - _SPRT_P0))  # per-failure
_SPRT_A = _math.log(19.0)  # alpha = beta = 0.05 -> ln((1-b)/a)


@query(
    "agg_sprt_sequential",
    oracle=f"""
WITH arms AS (
  SELECT user_id,
         MIN(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS day,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events
  WHERE {_AB_U01} >= 0.5
  GROUP BY user_id
), daily AS (
  SELECT day, COUNT(*) AS n, SUM(conv) AS s FROM arms GROUP BY day
), cum AS (
  SELECT day,
         CAST(SUM(n) OVER w AS BIGINT) AS n_cum,
         CAST(SUM(s) OVER w AS BIGINT) AS s_cum
  FROM daily WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
)
SELECT day, n_cum, s_cum,
       s_cum * CAST({_SPRT_L1!r} AS DOUBLE) + (n_cum - s_cum) * CAST({_SPRT_L0!r} AS DOUBLE) AS llr,
       CASE WHEN s_cum * CAST({_SPRT_L1!r} AS DOUBLE) + (n_cum - s_cum) * CAST({_SPRT_L0!r} AS DOUBLE)
                 >= CAST({_SPRT_A!r} AS DOUBLE) THEN 'accept_h1'
            WHEN s_cum * CAST({_SPRT_L1!r} AS DOUBLE) + (n_cum - s_cum) * CAST({_SPRT_L0!r} AS DOUBLE)
                 <= -CAST({_SPRT_A!r} AS DOUBLE) THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM cum
""",
)
def agg_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT sequential conversion test — the always-valid
    peeking monitor the fixed-horizon t-test can't be: treatment-arm
    users (the sample_ab_assignment hash split) enroll on their
    first-touch day, and the cumulative log-likelihood ratio of
    H1: p = 0.13 vs H0: p = 0.10 is read daily against the
    ln(19) Wald boundaries (alpha = beta = 0.05). The per-success /
    per-failure llr increments are PYTHON-COMPUTED literals embedded
    in both engines, so llr = s*L1 + f*L0 is two exact-count double
    products and one add — bit-identical, no rounding. Scale shape:
    one user-level aggregate, an O(days) rollup, and a prefix sum
    over the bounded day domain."""
    ev = load(spark, sf_dir, "events")
    arms = (
        ev.filter(F.expr(_AB_U01) >= 0.5)
        .groupBy("user_id")
        .agg(
            F.min(F.date_trunc("day", "ts")).alias("day"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv"),
        )
    )
    daily = arms.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("s")
    )
    # bounded: O(days) enrollment rollup, <= study-window rows
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "day",
        F.sum("n").over(w).cast("bigint").alias("n_cum"),
        F.sum("s").over(w).cast("bigint").alias("s_cum"),
    )
    llr = F.col("s_cum") * F.lit(_SPRT_L1) + (
        F.col("n_cum") - F.col("s_cum")
    ) * F.lit(_SPRT_L0)
    return cum.select(
        "day",
        "n_cum",
        "s_cum",
        llr.alias("llr"),
        F.when(llr >= F.lit(_SPRT_A), F.lit("accept_h1"))
        .when(llr <= -F.lit(_SPRT_A), F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    )


@query(
    "agg_beta_posterior",
    oracle="""
WITH arms AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
  FROM events
), m AS (
  SELECT arm, COUNT(*) AS n,
         CAST(SUM(conv) AS BIGINT) AS x
  FROM arms GROUP BY arm
)
SELECT arm, n, x,
       CAST(1 + x AS DOUBLE) / CAST(2 + n AS DOUBLE) AS post_mean,
       (CAST(1 + x AS DOUBLE) / CAST(2 + n AS DOUBLE))
         * (CAST(1 + n - x AS DOUBLE) / CAST(2 + n AS DOUBLE))
         / CAST(3 + n AS DOUBLE) AS post_var
FROM m
""",
)
def agg_beta_posterior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian conversion-rate posterior per experiment arm under a
    Beta(1,1) prior: posterior mean (1+x)/(2+n) and variance
    a*b/((a+b)^2 (a+b+1)) written as a product of single divisions of
    exact integers in the same order both engines (no pow, no
    rounding). The conjugate update is one aggregate over the
    assignment scan — the sequential-decision companion to
    agg_sprt_sequential (frequentist) and sample_ab_assignment
    (bucketing + SRM)."""
    ev = load(spark, sf_dir, "events")
    arms = ev.select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "conv"
        ),
    )
    m = arms.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("conv").cast("bigint").alias("x"),
    )
    post_mean = (1 + F.col("x")).cast("double") / (2 + F.col("n")).cast(
        "double"
    )
    post_b = (1 + F.col("n") - F.col("x")).cast("double") / (
        2 + F.col("n")
    ).cast("double")
    return m.select(
        "arm",
        "n",
        "x",
        post_mean.alias("post_mean"),
        (post_mean * post_b / (3 + F.col("n")).cast("double")).alias(
            "post_var"
        ),
    )


@query(
    "sample_neyman_allocation",
    oracle="""
WITH m AS (
  SELECT c_mktsegment AS stratum,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)
                  * CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS ss
  FROM customer GROUP BY c_mktsegment
), sd AS (
  SELECT stratum, n,
         sqrt((CAST(ss AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1))
           AS sigma
  FROM m
), tot AS (
  SELECT list_sum(list(n * sigma ORDER BY stratum)) AS denom FROM sd
)
SELECT sd.stratum, sd.n, sd.sigma / 100 AS sigma_bal,
       (sd.n * sd.sigma) / tot.denom AS neyman_share,
       CAST(round((sd.n * sd.sigma) / tot.denom * 1000) AS BIGINT)
         AS alloc_per_1000
FROM sd, tot
""",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation: per stratum
    (market segment), the share of a fixed sampling budget that
    minimizes estimator variance — n_h * sigma_h / sum(n * sigma).
    Moments are exact bigints over integer cents; sigma is one
    chained float expression (identical op order both engines, sqrt
    correctly rounded); the denominator folds the BOUNDED stratum
    table in stratum order (strict left fold == DuckDB list_sum over
    an ORDER BY list — the agg_anova_oneway recipe), so the shares
    are bit-identical with no rounding. The design-of-experiments
    complement to sample_stratified (which executes a given
    allocation)."""
    c = load(spark, sf_dir, "customer")
    cents_bal = F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)")
    m = c.groupBy(F.col("c_mktsegment").alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(cents_bal).cast("bigint").alias("s"),
        F.sum(
            F.expr(
                "CAST(ROUND(c_acctbal * 100) AS BIGINT)"
                " * CAST(ROUND(c_acctbal * 100) AS BIGINT)"
            )
        ).cast("bigint").alias("ss"),
    )
    sd = m.select(
        "stratum",
        "n",
        F.sqrt(
            (
                F.col("ss").cast("double")
                - F.col("s").cast("double") * F.col("s").cast("double")
                / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("sigma"),
    )
    tot = sd.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct("stratum", (F.col("n") * F.col("sigma")).alias("w"))
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["w"],
        ).alias("denom")
    )
    return sd.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n",
        (F.col("sigma") / 100).alias("sigma_bal"),
        ((F.col("n") * F.col("sigma")) / F.col("denom")).alias(
            "neyman_share"
        ),
        F.expr(
            "CAST(ROUND((n * sigma) / denom * 1000) AS BIGINT)"
        ).alias("alloc_per_1000"),
    )


@query(
    "sample_rolling_origin_cv",
    oracle="""
WITH d AS (
  SELECT event_id,
         date_diff('day',
                   (SELECT date_trunc('day', MIN(ts)) FROM events),
                   date_trunc('day', ts)) AS day_num
  FROM events
), folds(fold, train_end, test_end) AS (
  VALUES (1, 7, 14), (2, 14, 21), (3, 21, 28)
)
SELECT f.fold,
       CAST(f.train_end AS INTEGER) AS train_days,
       CAST(SUM(CASE WHEN d.day_num < f.train_end
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       CAST(SUM(CASE WHEN d.day_num >= f.train_end
                      AND d.day_num < f.test_end
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_test
FROM d CROSS JOIN folds f
GROUP BY f.fold, f.train_end
""",
)
def sample_rolling_origin_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin (expanding-window) time-series cross-validation
    splits: fold k trains on days [0, 7k) and tests on [7k, 7k+7) —
    the leakage-free CV for any forecasting model (random k-fold
    leaks the future; sample_group_kfold handles the entity-leak
    case, this handles the temporal one). Day numbers are exact
    integer day-diffs from the corpus start; the 3-row fold relation
    broadcasts and one aggregate emits every fold's train/test
    census."""
    ev = load(spark, sf_dir, "events")
    t0 = ev.agg(F.date_trunc("day", F.min("ts")).alias("t0"))
    d = ev.crossJoin(F.broadcast(t0)).select(
        "event_id",
        F.expr("datediff(date_trunc('day', ts), t0)").alias("day_num"),
    )
    folds = spark.createDataFrame(
        [(1, 7, 14), (2, 14, 21), (3, 21, 28)],
        "fold int, train_end int, test_end int",
    )
    out = (
        d.crossJoin(F.broadcast(folds))
        .groupBy("fold", "train_end")
        .agg(
            F.sum(
                F.when(F.col("day_num") < F.col("train_end"), 1).otherwise(0)
            ).cast("bigint").alias("n_train"),
            F.sum(
                F.when(
                    (F.col("day_num") >= F.col("train_end"))
                    & (F.col("day_num") < F.col("test_end")),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_test"),
        )
    )
    return out.select(
        "fold",
        F.col("train_end").alias("train_days"),
        "n_train",
        "n_test",
    )


@query(
    "agg_odds_ratio",
    oracle="""
WITH arms AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
  FROM events
), m AS (
  SELECT CAST(SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN arm = 'A' THEN 1 - conv ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN arm = 'B' THEN 1 - conv ELSE 0 END) AS BIGINT) AS d
  FROM arms
)
SELECT a, b, c, d,
       CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE) AS odds_ratio,
       round(ln(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE)), 9)
         AS log_or,
       round(sqrt(CAST(1 AS DOUBLE) / a + CAST(1 AS DOUBLE) / b
                  + CAST(1 AS DOUBLE) / c + CAST(1 AS DOUBLE) / d), 9)
         AS se_log_or
FROM m
""",
)
def agg_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio of conversion between experiment arms with the
    Woolf log-scale standard error — the effect-size readout that
    composes across studies (meta-analysis) where risk differences
    don't. The 2x2 cells are exact bigints; the OR is one double
    division of exact products; ln and the se are rounded at 9 dp
    (the ln discipline — 1-ulp libm divergence at O(1) scale).
    One partial+final aggregate."""
    ev = load(spark, sf_dir, "events")
    arms = ev.select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "conv"
        ),
    )
    m = arms.agg(
        F.sum(F.when(F.col("arm") == "A", F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when(F.col("arm") == "A", 1 - F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when(F.col("arm") == "B", F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when(F.col("arm") == "B", 1 - F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    orx = (F.col("a") * F.col("d")).cast("double") / (
        F.col("b") * F.col("c")
    ).cast("double")
    return m.select(
        "a",
        "b",
        "c",
        "d",
        orx.alias("odds_ratio"),
        F.round(F.log(orx), 9).alias("log_or"),
        F.round(
            F.sqrt(
                F.lit(1.0) / F.col("a")
                + F.lit(1.0) / F.col("b")
                + F.lit(1.0) / F.col("c")
                + F.lit(1.0) / F.col("d")
            ),
            9,
        ).alias("se_log_or"),
    )


@query(
    "agg_cohens_d",
    oracle="""
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
       (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2) / 100
         AS mean_diff,
       ((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
        / sqrt(((CAST(ss1 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
                + (CAST(ss2 AS DOUBLE)
                   - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2))
               / (n1 + n2 - 2))) AS cohens_d
FROM w
""",
)
def agg_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d standardized effect size between experiment arms —
    the magnitude readout that makes agg_ttest_welch's significance
    interpretable (a tiny p with d = 0.02 ships nothing). Pooled SD
    from exact per-arm moment bigints; mean difference and d are one
    float expression in identical order. One partial+final aggregate
    plus a 2-row pivot."""
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
    m1 = F.col("s1").cast("double") / F.col("n1")
    m2 = F.col("s2").cast("double") / F.col("n2")
    ssq1 = F.col("ss1").cast("double") - F.col("s1").cast("double") * F.col(
        "s1"
    ).cast("double") / F.col("n1")
    ssq2 = F.col("ss2").cast("double") - F.col("s2").cast("double") * F.col(
        "s2"
    ).cast("double") / F.col("n2")
    pooled = F.sqrt((ssq1 + ssq2) / (F.col("n1") + F.col("n2") - 2))
    return w.select(
        "n1",
        "n2",
        ((m1 - m2) / 100).alias("mean_diff"),
        ((m1 - m2) / pooled).alias("cohens_d"),
    )


@query(
    "agg_bootstrap_diff_ci",
    oracle=f"""
WITH reps AS (SELECT unnest(generate_series(0, {_BOOT_R - 1})) AS rep),
base AS (
  SELECT CASE WHEN e.user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         r.rep,
         {_BOOT_U01} AS u,
         CAST(ROUND((value) * 100) AS BIGINT) AS c
  FROM events e CROSS JOIN reps r
), wtd AS (
  SELECT arm, rep, {_BOOT_WT} AS wt, c FROM base
), m AS (
  SELECT rep,
         CAST(SUM(CASE WHEN arm = 'A' THEN wt * c ELSE 0 END) AS DOUBLE)
           / 100
           / nullif(CAST(SUM(CASE WHEN arm = 'A' THEN wt ELSE 0 END)
                         AS DOUBLE), 0)
         - CAST(SUM(CASE WHEN arm = 'B' THEN wt * c ELSE 0 END) AS DOUBLE)
           / 100
           / nullif(CAST(SUM(CASE WHEN arm = 'B' THEN wt ELSE 0 END)
                         AS DOUBLE), 0) AS diff_r
  FROM wtd GROUP BY rep
), ranked AS (
  SELECT diff_r,
         ROW_NUMBER() OVER (ORDER BY diff_r, rep) AS rn
  FROM m
)
SELECT MIN(CASE WHEN rn = 2 THEN diff_r END) AS diff_lo,
       MIN(CASE WHEN rn = {_BOOT_R - 1} THEN diff_r END) AS diff_hi,
       CAST(SUM(CASE WHEN diff_r > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_reps_positive
FROM ranked
""",
)
def agg_bootstrap_diff_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the DIFFERENCE in
    arm means — the uncertainty readout an A/B decision actually
    needs (does the interval cross zero?), built on the
    sample_poisson_bootstrap machinery: deterministic hash-drawn
    Poisson(1) weights per (row, replicate), each replicate's diff
    an exact-integer-cents ratio pair, CI = 2nd/31st order
    statistics of the 32 replicate diffs, plus the count of positive
    replicates as the sign-stability readout. Same scale shape:
    constant 32x narrow fan-out, two aggregates, a 32-row rank."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
        "event_id",
        F.expr(cents("value")).alias("c"),
    )
    fan = ev.withColumn(
        "rep", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1)))
    ).withColumn("u", F.expr(_BOOT_U01)).withColumn("wt", F.expr(_BOOT_WT))
    m = fan.groupBy("rep").agg(
        F.expr(
            "CAST(SUM(CASE WHEN arm = 'A' THEN wt * c ELSE 0 END)"
            " AS DOUBLE) / 100"
            " / nullif(CAST(SUM(CASE WHEN arm = 'A' THEN wt ELSE 0 END)"
            " AS DOUBLE), 0)"
            " - CAST(SUM(CASE WHEN arm = 'B' THEN wt * c ELSE 0 END)"
            " AS DOUBLE) / 100"
            " / nullif(CAST(SUM(CASE WHEN arm = 'B' THEN wt ELSE 0 END)"
            " AS DOUBLE), 0)"
        ).alias("diff_r")
    )
    # bounded: 32 bootstrap replicate rows
    w = Window.orderBy("diff_r", "rep")
    ranked = m.withColumn("rn", F.row_number().over(w))
    return ranked.agg(
        F.min(F.when(F.col("rn") == 2, F.col("diff_r"))).alias("diff_lo"),
        F.min(
            F.when(F.col("rn") == _BOOT_R - 1, F.col("diff_r"))
        ).alias("diff_hi"),
        F.sum(F.when(F.col("diff_r") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_reps_positive"),
    )


@query(
    "agg_capture_recapture",
    oracle="""
WITH w1 AS (
  SELECT DISTINCT user_id FROM events
  WHERE date_trunc('week', ts) = TIMESTAMP '2024-01-01 00:00:00'
), w2 AS (
  SELECT DISTINCT user_id FROM events
  WHERE date_trunc('week', ts) = TIMESTAMP '2024-01-08 00:00:00'
), m AS (
  SELECT (SELECT COUNT(*) FROM w1) AS n1,
         (SELECT COUNT(*) FROM w2) AS n2,
         (SELECT COUNT(*) FROM w1 JOIN w2 USING (user_id)) AS m12,
         (SELECT COUNT(*) FROM events e
          WHERE date_trunc('week', e.ts)
                IN (TIMESTAMP '2024-01-01 00:00:00',
                    TIMESTAMP '2024-01-08 00:00:00')) AS n_events
), t AS (
  SELECT n1, n2, m12,
         (SELECT COUNT(DISTINCT user_id) FROM events
          WHERE date_trunc('week', ts)
                IN (TIMESTAMP '2024-01-01 00:00:00',
                    TIMESTAMP '2024-01-08 00:00:00')) AS true_union
  FROM m
)
SELECT n1, n2, m12, true_union,
       CAST(n1 AS DOUBLE) * n2 / m12 AS lincoln_petersen,
       CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m12 + 1) - 1
         AS chapman_estimate
FROM t
""",
)
def agg_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture population estimation (Lincoln-Petersen +
    the small-sample Chapman correction) from two observation
    windows: week-1 users are the 'marked' capture, week-2 the
    recapture, and the overlap estimates the total population the
    two scans draw from — the estimator a dedup/coverage audit uses
    to answer 'how many entities exist that BOTH passes missed'.
    Reported against the true two-week union as ground truth. All
    counts exact; both estimates are single float expressions of
    exact integers. ONE pass (r10, guide §2.3): the old shape ran
    FOUR count actions — two distinct-counts, a join count and a
    union count — each re-scanning and re-shuffling events; per-user
    week flags + one groupBy + one 1-row aggregate produce the
    identical four integers lazily (n1 = sum max(i1), m12 =
    sum i1*i2, union = count of the flag table)."""
    ev = load(spark, sf_dir, "events")
    wk = F.date_trunc("week", "ts")
    w1 = F.expr("TIMESTAMP_NTZ'2024-01-01 00:00:00'")
    w2 = F.expr("TIMESTAMP_NTZ'2024-01-08 00:00:00'")
    flags = ev.where(wk.isin(w1, w2)).select(
        "user_id",
        F.when(wk == w1, 1).otherwise(0).alias("i1"),
        F.when(wk == w2, 1).otherwise(0).alias("i2"),
    )
    per_user = flags.groupBy("user_id").agg(
        F.max("i1").alias("i1"), F.max("i2").alias("i2")
    )
    out = per_user.agg(
        F.sum("i1").cast("bigint").alias("n1"),
        F.sum("i2").cast("bigint").alias("n2"),
        F.sum(F.col("i1") * F.col("i2")).cast("bigint").alias("m12"),
        F.count(F.lit(1)).cast("bigint").alias("true_union"),
    )
    return out.select(
        "n1",
        "n2",
        "m12",
        "true_union",
        (F.col("n1").cast("double") * F.col("n2") / F.col("m12")).alias(
            "lincoln_petersen"
        ),
        (
            (F.col("n1") + 1).cast("double")
            * (F.col("n2") + 1)
            / (F.col("m12") + 1)
            - 1
        ).alias("chapman_estimate"),
    )


@query(
    "agg_bayes_daily_update",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS conv,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), cum AS (
  SELECT day,
         CAST(SUM(conv) OVER (ORDER BY day) AS BIGINT) AS c_conv,
         CAST(SUM(n) OVER (ORDER BY day) AS BIGINT) AS c_n
  FROM daily
)
SELECT day,
       CAST(1 + c_conv AS BIGINT) AS alpha,
       CAST(1 + c_n - c_conv AS BIGINT) AS beta,
       CAST(1 + c_conv AS DOUBLE) / (2 + c_n) AS posterior_mean
FROM cum
""",
)
def agg_bayes_daily_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential Bayesian conversion monitoring: starting from a
    Beta(1,1) prior, each day's purchases/events fold into the
    conjugate posterior, and the output is the posterior (alpha,
    beta, mean) AFTER each day — the daily dashboard row of a
    launch review, and the sequential companion to the one-shot
    agg_beta_posterior. Conjugacy means the whole history is two
    cumulative INTEGER sums over the O(days) daily rollup; the
    running window rides the tiny day table (bounded domain — see
    the PLANS.md unpartitioned-window audit), and the only float is
    the per-day posterior-mean division."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("conv"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    # bounded: O(distinct days) rows — the daily rollup, not events
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "day",
        F.sum("conv").over(w).cast("bigint").alias("c_conv"),
        F.sum("n").over(w).cast("bigint").alias("c_n"),
    )
    return cum.select(
        "day",
        (1 + F.col("c_conv")).cast("bigint").alias("alpha"),
        (1 + F.col("c_n") - F.col("c_conv")).cast("bigint").alias("beta"),
        (
            (1 + F.col("c_conv")).cast("double") / (2 + F.col("c_n"))
        ).alias("posterior_mean"),
    )


@query(
    "agg_eb_shrinkage",
    bounded_cross="1-row broadcast scalar (prior moment row)",
    oracle="""
WITH per AS (
  SELECT c.c_nationkey AS nation,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS s
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey
), g AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_g, CAST(SUM(s) AS BIGINT) AS s_g
  FROM per
)
SELECT nation, n,
       CAST(s AS DOUBLE) / n / 100 AS raw_mean,
       (CAST(s AS DOUBLE) + 20 * (CAST(s_g AS DOUBLE) / n_g))
         / (n + 20) / 100 AS shrunk_mean
FROM per, g
""",
)
def agg_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-nation mean order value
    toward the grand mean with a 20-pseudo-observation prior:
    shrunk = (sum + 20 * grand_mean) / (n + 20) — the partial-
    pooling estimate that keeps a 3-order nation from topping a
    leaderboard on noise, and the simplest hierarchical-model
    readout an analytics engine should own. All sums are exact
    integer cents (one shuffled agg + a broadcast single-row grand
    total); each output row evaluates ONE fixed float expression,
    so no cross-row float reduction exists to diverge. Small-n
    groups move toward the prior, big-n groups barely — the
    monotone-in-n contraction property is fuzz-tested."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", F.expr(cents("o_totalprice")).alias("cts")
    )
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nation"),
    )
    per = o.join(c, "o_custkey").groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cts").cast("bigint").alias("s"),
    )
    g = per.agg(
        F.sum("n").cast("bigint").alias("n_g"),
        F.sum("s").cast("bigint").alias("s_g"),
    )
    return per.crossJoin(F.broadcast(g)).select(
        "nation",
        "n",
        (F.col("s").cast("double") / F.col("n") / 100).alias("raw_mean"),
        (
            (
                F.col("s").cast("double")
                + 20 * (F.col("s_g").cast("double") / F.col("n_g"))
            )
            / (F.col("n") + 20)
            / 100
        ).alias("shrunk_mean"),
    )


PPS_SAMPLES = 100


@query(
    "sample_pps_systematic",
    oracle=f"""
WITH w AS (
  SELECT o_custkey AS c_custkey, CAST(COUNT(*) AS BIGINT) AS w
  FROM orders GROUP BY o_custkey
), cum AS (
  SELECT c_custkey, w,
         CAST(SUM(w) OVER (ORDER BY c_custkey) AS BIGINT) AS cum,
         (SELECT CAST(SUM(w) AS BIGINT) FROM w) AS total
  FROM w
), hits AS (
  SELECT c_custkey, w, cum, total,
         (CASE WHEN 2 * {PPS_SAMPLES} * cum < total THEN 0
               ELSE (2 * {PPS_SAMPLES} * cum - total) // (2 * total) + 1
          END)
         - (CASE WHEN 2 * {PPS_SAMPLES} * (cum - w) < total THEN 0
                 ELSE (2 * {PPS_SAMPLES} * (cum - w) - total)
                      // (2 * total) + 1
            END) AS n_hits
  FROM cum
)
SELECT c_custkey, w, cum, CAST(n_hits AS BIGINT) AS n_hits
FROM hits WHERE n_hits >= 1
""",
)
def sample_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic probability-proportional-to-size sampling of
    {PPS_SAMPLES} customers, weighted by order count — the survey-
    sampling workhorse (PPS systematic beats Poisson sampling on
    variance and hits the target size exactly; a heavy unit can be
    selected multiple times, reported via n_hits). Selection points
    are the half-offset grid (k+1/2)*total/n over the cumulative
    weight line; a customer is drawn once per grid point inside its
    weight interval. ALL arithmetic is integer: the crossing count
    is the doubled-numerator floor formula with an explicit
    below-first-point guard, so no negative integer division exists
    anywhere (Spark's `div` truncates toward zero while DuckDB's
    `//` floors — they agree only on nonnegative operands, which
    the guard guarantees). The cumulative weights come from the
    plans/global_rank.py two-phase machinery (range buckets +
    driver offsets + bucket-partitioned window) — the survival_km
    prefix-sum shape, never a single-task global window; the oracle
    uses the naive global SUM() OVER."""
    o = load(spark, sf_dir, "orders")
    w = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("w")
    )
    return pps_systematic_over(w, "c_custkey", "w", PPS_SAMPLES)


@query(
    "agg_risk_difference",
    oracle="""
WITH cells AS (
  SELECT CAST(SUM(CASE WHEN o_custkey % 2 = 0 AND o_orderstatus = 'F'
                       THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN o_custkey % 2 = 0 AND o_orderstatus <> 'F'
                       THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN o_custkey % 2 = 1 AND o_orderstatus = 'F'
                       THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN o_custkey % 2 = 1 AND o_orderstatus <> 'F'
                       THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM orders
)
SELECT a, b, c, d,
       CAST(a AS DOUBLE) / (a + b) AS risk_exposed,
       CAST(c AS DOUBLE) / (c + d) AS risk_control,
       CAST(a AS DOUBLE) / (a + b) - CAST(c AS DOUBLE) / (c + d)
         AS risk_difference,
       (CAST(a AS DOUBLE) / (a + b)) / (CAST(c AS DOUBLE) / (c + d))
         AS risk_ratio,
       CAST(1 AS DOUBLE)
         / (CAST(a AS DOUBLE) / (a + b) - CAST(c AS DOUBLE) / (c + d))
         AS nnt
FROM cells
""",
)
def agg_risk_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absolute risk difference, risk ratio, and number-needed-to-
    treat from the 2x2 exposure/outcome table — the effect measures
    a clinician (or a growth lead reading an activation experiment)
    wants BESIDE the odds ratio: OR exaggerates for common outcomes;
    RD and NNT are the decision-relevant scales. One integer
    aggregate; every output is a fixed single-row float expression
    over the four exact cells (agg_odds_ratio's complement — same
    table, different measures)."""
    o = load(spark, sf_dir, "orders")
    exposed = F.col("o_custkey") % 2 == 0
    outcome = F.col("o_orderstatus") == "F"
    cells = o.agg(
        F.sum(F.when(exposed & outcome, 1).otherwise(0))
        .cast("bigint").alias("a"),
        F.sum(F.when(exposed & ~outcome, 1).otherwise(0))
        .cast("bigint").alias("b"),
        F.sum(F.when(~exposed & outcome, 1).otherwise(0))
        .cast("bigint").alias("c"),
        F.sum(F.when(~exposed & ~outcome, 1).otherwise(0))
        .cast("bigint").alias("d"),
    )
    r1 = F.col("a").cast("double") / (F.col("a") + F.col("b"))
    r0 = F.col("c").cast("double") / (F.col("c") + F.col("d"))
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        r1.alias("risk_exposed"),
        r0.alias("risk_control"),
        (r1 - r0).alias("risk_difference"),
        (r1 / r0).alias("risk_ratio"),
        (F.lit(1).cast("double") / (r1 - r0)).alias("nnt"),
    )


@query(
    "agg_proportion_sizing",
    oracle="""
WITH m AS (
  SELECT o_orderpriority AS segment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM orders GROUP BY 1
)
SELECT segment, n AS n_orders, k AS n_converted,
       CAST(k AS DOUBLE) / n AS base_rate,
       CAST(ceil(
         (1.959964 + 0.841621) * (1.959964 + 0.841621)
         * ((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n)
            + (CAST(k AS DOUBLE) / n * 1.1)
              * (1 - CAST(k AS DOUBLE) / n * 1.1))
         / ((CAST(k AS DOUBLE) / n * 0.1)
            * (CAST(k AS DOUBLE) / n * 0.1))
       ) AS BIGINT) AS n_required_10pct_lift
FROM m
""",
)
def agg_proportion_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-size requirement for a PROPORTION test per segment:
    per-arm n to detect a 10% relative lift of the segment's
    conversion rate at alpha=0.05 / power=0.8 — n = (z_a/2+z_b)^2 *
    (p1 q1 + p2 q2) / (p2-p1)^2 with p2 = 1.1 p1, the binary-metric
    companion to agg_power_analysis's continuous sizing (rates and
    means need different formulas, and using the wrong one is the
    most common test-planning bug). Exact integer counts, fixed z
    literals, ONE closed-form float expression identical in both
    engines, ceil() for the hash-stable integer answer."""
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(F.col("o_orderpriority").alias("segment")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
    )
    return m.select(
        "segment",
        F.col("n").alias("n_orders"),
        F.col("k").alias("n_converted"),
        F.expr("CAST(k AS DOUBLE) / n").alias("base_rate"),
        F.expr(
            "CAST(ceil("
            " (1.959964 + 0.841621) * (1.959964 + 0.841621)"
            " * ((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n)"
            "    + (CAST(k AS DOUBLE) / n * 1.1)"
            "      * (1 - CAST(k AS DOUBLE) / n * 1.1))"
            " / ((CAST(k AS DOUBLE) / n * 0.1)"
            "    * (CAST(k AS DOUBLE) / n * 0.1))"
            ") AS BIGINT)"
        ).alias("n_required_10pct_lift"),
    )


@query(
    "agg_stratified_att",
    oracle="""
WITH cb AS (
  SELECT c_custkey,
         NTILE(10) OVER (ORDER BY CAST(round(c_acctbal * 100) AS BIGINT),
                         c_custkey) AS stratum
  FROM customer
), o AS (
  SELECT cb.stratum,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS tr,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y
  FROM orders JOIN cb ON o_custkey = cb.c_custkey
), s AS (
  SELECT stratum,
         CAST(SUM(tr) AS BIGINT) AS n_t,
         CAST(COUNT(*) - SUM(tr) AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN tr = 1 THEN y ELSE 0 END) AS BIGINT) AS y_t,
         CAST(SUM(CASE WHEN tr = 0 THEN y ELSE 0 END) AS BIGINT) AS y_c
  FROM o GROUP BY stratum
), ok AS (
  SELECT * FROM s WHERE n_t > 0 AND n_c > 0
), tot AS (SELECT CAST(SUM(n_t) AS BIGINT) AS nt FROM ok)
SELECT (SELECT nt FROM tot) AS n_treated,
       CAST(COUNT(*) AS BIGINT) AS n_strata,
       CAST(SUM(n_t * ((y_t * 10000) // n_t - (y_c * 10000) // n_c))
            AS BIGINT) AS att_qcents_wsum,
       CAST(SUM(n_t * ((y_t * 10000) // n_t - (y_c * 10000) // n_c))
            AS DOUBLE) / (SELECT nt FROM tot) / 10000 / 100
         AS att_dollars
FROM ok
""",
)
def agg_stratified_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified average treatment effect on the treated
    (Cochran 1968 post-stratification — the simplest honest causal
    adjustment): does URGENT priority move order value once customer
    wealth is controlled for? Customers are stratified into account-
    balance deciles (exact global NTILE); within each stratum the
    treated-vs-control mean-outcome gap is weighted by the stratum's
    treated count; strata lacking either arm drop out (common-support
    trimming, reported via n_strata).

    Exactness: per-stratum means are quantized ONCE as positive-
    operand floor divisions ((sum * 1e4) // n, quarter-milli-cent
    resolution; stratum_sum * 1e4 stays inside int64 at a 100x
    corpus), the
    weighted sum is an exact bigint, and the final ATT is one double
    chain over identical integers. Scale shape: one global NTILE
    over customers (two-phase machinery), one keyed equi-join to
    orders, a 10-row stratum table — no window over orders, no
    driver loop."""
    from ..plans.global_rank import ntile_expr, with_global_row_number

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", F.expr(cents("c_acctbal")).alias("ab")
    )
    numbered, n_cust = with_global_row_number(
        cust, ["ab", "c_custkey"], out_col="_rn"
    )
    cb = numbered.select(
        "c_custkey", ntile_expr("_rn", n_cust, 10).alias("stratum")
    )
    o = (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("tr"),
            F.expr(cents("o_totalprice")).alias("y"),
        )
        .join(cb, F.col("o_custkey") == F.col("c_custkey"))
    )
    s = o.groupBy("stratum").agg(
        F.sum("tr").cast("bigint").alias("n_t"),
        (F.count(F.lit(1)) - F.sum("tr")).cast("bigint").alias("n_c"),
        F.sum(F.when(F.col("tr") == 1, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("y_t"),
        F.sum(F.when(F.col("tr") == 0, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("y_c"),
    ).filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    gap = F.expr("(y_t * 10000) div n_t - (y_c * 10000) div n_c")
    agg = s.agg(
        F.sum("n_t").cast("bigint").alias("n_treated"),
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum(F.col("n_t") * gap).cast("bigint").alias(
            "att_qcents_wsum"
        ),
    )
    return agg.select(
        "n_treated",
        "n_strata",
        "att_qcents_wsum",
        (
            F.col("att_qcents_wsum").cast("double")
            / F.col("n_treated")
            / 10000
            / 100
        ).alias("att_dollars"),
    )


@query("agg_raking", oracle=_raking_oracle())
def agg_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raking / iterative proportional fitting (Deming & Stephan
    1940) of the first-year order sample to the FULL-period
    priority-by-region margins — the survey-calibration step that
    turns a biased sample into population-consistent weights, and
    the classic fix when a panel over-represents one region. Four
    row/column scaling pairs on the 5x5 cell table.

    Exactness: weights live at 1e6 fixed point; each scaling step is
    TWO positive-operand floor divisions (ratio quantized to 1e6 as
    (target * 1e12) // marginal_sum, then (w * ratio) // 1e6 — both
    inside int64 at any corpus size because the cell table is
    schema-bounded), so the oracle unrolls the identical integer
    recurrence. Zero rows/columns pass through untouched. Scale
    shape: the data-sized work is one join chain + two margin
    aggregates collapsing to <= 25 cells + 10 margins; the IPF loop
    runs on the driver over that bounded table."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    oc = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(n),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("o_orderpriority").alias("p"),
            F.col("r_name").alias("rg"),
            F.col("o_orderdate").alias("d"),
        )
        .localCheckpoint(eager=True)
    )
    sample = (
        oc.filter(F.col("d") < F.lit(_IPF_CUTOFF).cast("timestamp"))
        .groupBy("p", "rg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()  # bounded: <= 5x5 cells
    )
    tp = {
        row["p"]: int(row["t"])
        for row in oc.groupBy("p").agg(F.count(F.lit(1)).alias("t")).collect()
    }
    tr = {
        row["rg"]: int(row["t"])
        for row in oc.groupBy("rg").agg(F.count(F.lit(1)).alias("t")).collect()
    }
    ps = sorted(tp)
    rgs = sorted(tr)
    w = {(p, rg): 0 for p in ps for rg in rgs}
    for row in sample:
        w[(row["p"], row["rg"])] = int(row["cnt"]) * 1_000_000
    for _ in range(_IPF_PAIRS):
        for p in ps:
            rs = sum(w[(p, rg)] for rg in rgs)
            if rs:
                ratio = (tp[p] * 1_000_000_000_000) // rs
                for rg in rgs:
                    w[(p, rg)] = (w[(p, rg)] * ratio) // 1_000_000
        for rg in rgs:
            cs = sum(w[(p, rg)] for p in ps)
            if cs:
                ratio = (tr[rg] * 1_000_000_000_000) // cs
                for p in ps:
                    w[(p, rg)] = (w[(p, rg)] * ratio) // 1_000_000
    return spark.createDataFrame(
        [(p, rg, w[(p, rg)]) for p in ps for rg in rgs],
        "priority string, region string, weight_micro bigint",
    )


@query(
    "agg_qte",
    oracle="""
WITH s AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS tr,
         CAST(round(o_totalprice * 100) AS BIGINT) AS sc,
         o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                    o_orderkey) AS rk
  FROM orders
), ng AS (
  SELECT tr, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY tr
), idx AS (
  SELECT ng.tr, t.p,
         CAST(CEIL(t.p * ng.n / 100.0) AS BIGINT) AS k
  FROM ng, unnest(generate_series(10, 90, 10)) t(p)
), q AS (
  SELECT i.p, i.tr, s.sc
  FROM idx i JOIN s ON s.tr = i.tr AND s.rk = i.k
)
SELECT CAST(a.p AS INTEGER) AS decile,
       a.sc AS q_treated_cents,
       b.sc AS q_control_cents,
       a.sc - b.sc AS qte_cents,
       CAST(a.sc - b.sc AS DOUBLE) / 100 AS qte_dollars
FROM q a JOIN q b ON a.p = b.p AND a.tr = 1 AND b.tr = 0
""",
)
def agg_qte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects (Doksum 1974): the
    treated-vs-control gap at every decile of the order-value
    distribution, not just the mean — the distributional view ATT
    (agg_stratified_att) can't give (a policy can leave the mean
    flat while fattening one tail). Treated = URGENT priority.

    Exactness: each decile is an ORDER STATISTIC — the value at rank
    ceil(p*n/100) under the deterministic (cents, key) order — so
    every output is an exact integer difference; no interpolation,
    no float percentile. Scale shape: ONE pass of the two-phase
    global-rank machinery ordered by (group, score, key) — the
    per-group rank is the global rank minus the leading group's
    offset, so no per-group single-task sort exists — then an
    18-row literal index fetch joined back. ceil(p*n/100) uses
    identical integer arithmetic ((p*n + 99) // 100) both engines."""
    from ..plans.global_rank import with_global_row_number

    o = load(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("tr"),
        F.expr(cents("o_totalprice")).alias("sc"),
        "o_orderkey",
    )
    numbered, n_total = with_global_row_number(
        o, ["tr", "sc", "o_orderkey"], out_col="rn"
    )
    counts = {
        r["tr"]: r["n"]
        for r in numbered.groupBy("tr")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_c, n_t = int(counts[0]), int(counts[1])
    # global rn is (control block) then (treated block): tr leads the
    # order, so treated ranks start after the n_c control rows
    targets = []  # (global_rn, tr, decile)
    for p in range(10, 100, 10):
        targets.append(((p * n_c + 99) // 100, 0, p))
        targets.append((n_c + (p * n_t + 99) // 100, 1, p))
    tgt = spark.createDataFrame(
        targets, "rn bigint, tr_want int, decile int"
    )
    picked = numbered.join(F.broadcast(tgt), "rn").select(
        "decile", "tr", "sc"
    )
    a = picked.filter(F.col("tr") == 1).select(
        "decile", F.col("sc").alias("q_treated_cents")
    )
    b = picked.filter(F.col("tr") == 0).select(
        "decile", F.col("sc").alias("q_control_cents")
    )
    return a.join(b, "decile").select(
        "decile",
        "q_treated_cents",
        "q_control_cents",
        (F.col("q_treated_cents") - F.col("q_control_cents")).alias(
            "qte_cents"
        ),
        (
            (F.col("q_treated_cents") - F.col("q_control_cents")).cast(
                "double"
            )
            / 100
        ).alias("qte_dollars"),
    )


@query(
    "agg_design_effect",
    oracle="""
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sw,
         CAST(CAST(SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                  AS HUGEINT)
                  * CAST(round(o_totalprice * 100) AS BIGINT))
              AS VARCHAR) AS DOUBLE) AS sww
  FROM orders
)
SELECT n AS n_orders,
       CAST(n AS DOUBLE) * sww / (CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE))
         AS deff,
       (CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)) / sww AS n_eff,
       sqrt(CAST(n AS DOUBLE) * sww
            / (CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)) - 1) AS cv_weights
FROM m
""",
)
def agg_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish design effect of a value-weighted estimator over orders
    (weights = order value): DEFF = n*sum(w^2)/(sum w)^2 = 1 + cv^2
    of the weights, with the effective sample size n_eff =
    (sum w)^2 / sum(w^2) — the one number survey/sampling teams use
    to price unequal weighting, completing the repo's survey-methods
    family (sample_neyman_allocation plans strata, sample_ht_estimate
    expands, agg_raking calibrates; this AUDITS the resulting
    weights).

    Exactness: sum(w) is an exact bigint of integer cents; sum(w^2)
    goes through HUGEINT / decimal(38) and the proven
    decimal->double / VARCHAR->double cast pair; DEFF, n_eff and the
    weight CV are fixed double expressions over those identical
    numbers. Scale shape: ONE two-phase hash aggregate to a single
    row — nothing else."""
    m = load(spark, sf_dir, "orders").select(
        F.expr(cents("o_totalprice")).alias("w")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("w").cast("bigint").alias("sw"),
        F.sum(F.col("w").cast("decimal(38,0)") * F.col("w"))
        .cast("double")
        .alias("sww"),
    )
    n_d = F.col("n").cast("double")
    sw_d = F.col("sw").cast("double")
    deff = n_d * F.col("sww") / (sw_d * sw_d)
    return m.select(
        F.col("n").alias("n_orders"),
        deff.alias("deff"),
        ((sw_d * sw_d) / F.col("sww")).alias("n_eff"),
        F.sqrt(deff - F.lit(1)).alias("cv_weights"),
    )


@query(
    "sample_cluster_two_stage",
    bounded_cross="1-row PSU-count scalar onto the 1-row total frame",
    oracle=f"""
WITH psu AS (
  SELECT n_nationkey FROM nation
  WHERE {_kbucket('n_nationkey')} < 40
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m FROM psu
), ssu AS (
  SELECT c.c_nationkey,
         CAST(round(c.c_acctbal * 100) AS BIGINT) AS y
  FROM customer c JOIN psu ON psu.n_nationkey = c.c_nationkey
  WHERE {_kbucket('c.c_custkey')} < 20
), per AS (
  SELECT c_nationkey,
         CAST(COUNT(*) AS BIGINT) AS nk,
         CAST(SUM(y) * 5 AS BIGINT) AS t
  FROM ssu GROUP BY 1
), tot AS (
  SELECT CAST(SUM(nk) AS BIGINT) AS n_sampled,
         CAST(SUM(t) AS BIGINT) AS ts,
         CAST(CAST(SUM(CAST(t AS HUGEINT) * t) AS VARCHAR) AS DOUBLE) AS tss
  FROM per
)
SELECT m.m AS n_psu_selected,
       tot.n_sampled,
       25.0 / m.m * tot.ts / 100 AS ht_total_dollars,
       25.0 * sqrt((tss - (CAST(tot.ts AS DOUBLE) / m.m) * tot.ts)
                   / (m.m * (m.m - 1))) / 100 AS se_total_dollars
FROM tot, m
""",
)
def sample_cluster_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage cluster sample of customer account balances:
    stage 1 hash-selects ~40% of the 25 nation PSUs, stage 2
    hash-selects ~20% of each selected nation's customers (both by
    the portable Knuth bucket — reproducible on any engine, no RNG
    state), then the classic two-stage estimator: per-PSU totals
    expanded by 1/f2 = 5, T_hat = (25/m) * sum t_i, with the
    between-PSU with-replacement variance V_hat =
    25^2 * s_t^2 / m — the design every field survey and
    distributed-audit sample runs, completing the survey family
    (neyman plans strata, ht expands, raking calibrates,
    design_effect audits; this one CLUSTERS).

    Exactness: both selections are integer hash comparisons;
    per-PSU expanded totals are exact cents bigints; the variance
    numerator follows the (tss - mean*ts) exact-int pattern
    (HUGEINT/decimal(38) for t^2). Scale shape: a broadcast
    semi-join against the <=25-row PSU list, one hash aggregate per
    nation, a 1-row reduction with a declared scalar cross."""
    nat = load(spark, sf_dir, "nation").select("n_nationkey")
    psu = nat.filter(F.expr(_kbucket("n_nationkey")) < 40)
    cust = load(spark, sf_dir, "customer")
    ssu = (
        cust.join(
            F.broadcast(psu),
            cust["c_nationkey"] == psu["n_nationkey"],
        )
        .filter(F.expr(_kbucket("c_custkey")) < 20)
        .select(
            "c_nationkey", F.expr(cents("c_acctbal")).alias("y")
        )
    )
    per = ssu.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("nk"),
        (F.sum("y") * 5).cast("bigint").alias("t"),
    )
    tot = per.agg(
        F.sum("nk").cast("bigint").alias("n_sampled"),
        F.sum("t").cast("bigint").alias("ts"),
        F.sum(F.col("t").cast("decimal(38,0)") * F.col("t"))
        .cast("double")
        .alias("tss"),
    )
    mrow = psu.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    # bounded: 1-row PSU-count scalar onto the 1-row total frame
    j = tot.crossJoin(F.broadcast(mrow))
    ts_d = F.col("ts").cast("double")
    return j.select(
        F.col("m").alias("n_psu_selected"),
        "n_sampled",
        (F.lit(25.0) / F.col("m") * F.col("ts") / F.lit(100)).alias(
            "ht_total_dollars"
        ),
        (
            F.lit(25.0)
            * F.sqrt(
                (F.col("tss") - (ts_d / F.col("m")) * F.col("ts"))
                / (F.col("m") * (F.col("m") - 1))
            )
            / F.lit(100)
        ).alias("se_total_dollars"),
    )


RR_FLIP_PCT = 25  # randomized-response flip probability (percent)


@query(
    "privacy_rr_frequency",
    bounded_cross="1-row observed-count scalar onto the 1-row total",
    oracle=f"""
WITH resp AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS truth,
         CASE WHEN {{h}} < {RR_FLIP_PCT} THEN 1 ELSE 0 END AS flip
  FROM orders
), obs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN flip = 1 THEN 1 - truth ELSE truth END)
              AS BIGINT) AS yes,
         CAST(SUM(truth) AS BIGINT) AS true_yes
  FROM resp
)
SELECT n AS n_respondents,
       yes AS observed_yes,
       CAST(yes AS DOUBLE) / n AS observed_rate,
       (CAST(yes AS DOUBLE) / n - {RR_FLIP_PCT / 100!r})
         / {(100 - 2 * RR_FLIP_PCT) / 100!r} AS estimated_rate,
       CAST(true_yes AS DOUBLE) / n AS true_rate
FROM obs
""".format(h="(((o_orderkey % 2147483648) * 2654435761 % 4294967296) % 100)"),
)
def privacy_rr_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner randomized-response frequency estimation: each
    respondent's sensitive bit (order fulfilled?) is flipped with
    probability p = {RR_FLIP_PCT}% (here a DETERMINISTIC portable
    Knuth-bucket 'coin' so the mechanism is replayable — a
    documented demo of the estimator, not a DP deployment), and the
    population rate is debiased as (observed - p)/(1 - 2p) — the
    classic local-privacy primitive under privacy_dp_counts /
    privacy_k_anon's umbrella, and the estimator every LDP telemetry
    system (RAPPOR-style) builds on.

    Exactness: flips and observed counts are exact integer hash
    comparisons; the debias is one fixed double expression (p as a
    repr literal). The true rate is reported alongside so the
    estimator's bias on this corpus is visible. ONE hash
    aggregate."""
    h = F.expr("(((o_orderkey % 2147483648) * 2654435761 % 4294967296) % 100)")
    truth = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    flip = F.when(h < RR_FLIP_PCT, 1).otherwise(0)
    obs = load(spark, sf_dir, "orders").select(
        truth.alias("truth"), flip.alias("flip")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(F.col("flip") == 1, 1 - F.col("truth")).otherwise(
                F.col("truth")
            )
        )
        .cast("bigint")
        .alias("yes"),
        F.sum("truth").cast("bigint").alias("true_yes"),
    )
    rate = F.col("yes").cast("double") / F.col("n")
    return obs.select(
        F.col("n").alias("n_respondents"),
        F.col("yes").alias("observed_yes"),
        rate.alias("observed_rate"),
        (
            (rate - F.lit(RR_FLIP_PCT / 100))
            / F.lit((100 - 2 * RR_FLIP_PCT) / 100)
        ).alias("estimated_rate"),
        (F.col("true_yes").cast("double") / F.col("n")).alias("true_rate"),
    )


@query(
    "agg_rdd_sharp",
    bounded_cross="two 1-row side-moment scalars crossed into one row",
    oracle=f"""
WITH base AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) - {RDD_CUTOFF_C} AS u,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), {_rdd_side_sql("l", str(-RDD_BANDWIDTH), "0")},
{_rdd_side_sql("r", "0", str(RDD_BANDWIDTH))},
fit AS (
  SELECT l.n AS nl, r.n AS nr,
         (CAST(l.sy AS DOUBLE)
          - ((CAST(l.n AS DOUBLE) * l.suy - CAST(l.su AS DOUBLE) * l.sy)
             / (CAST(l.n AS DOUBLE) * l.su2
                - CAST(l.su AS DOUBLE) * CAST(l.su AS DOUBLE)))
            * l.su) / l.n AS al,
         (CAST(r.sy AS DOUBLE)
          - ((CAST(r.n AS DOUBLE) * r.suy - CAST(r.su AS DOUBLE) * r.sy)
             / (CAST(r.n AS DOUBLE) * r.su2
                - CAST(r.su AS DOUBLE) * CAST(r.su AS DOUBLE)))
            * r.su) / r.n AS ar
  FROM l, r
)
SELECT nl AS n_left, nr AS n_right,
       al AS rate_left_at_cutoff,
       ar AS rate_right_at_cutoff,
       ar - al AS rdd_effect
FROM fit
""",
)
def agg_rdd_sharp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression-discontinuity estimate at the $150k order-
    value cutoff: local LINEAR fits of the fulfilment rate on each
    side within a +-$50k bandwidth, compared AT the cutoff — the
    quasi-experimental jump estimator (Thistlethwaite-Campbell)
    completing the causal family (agg_diff_in_diff trends,
    agg_stratified_att strata, agg_cuped variance reduction; this
    exploits a THRESHOLD rule). A synthetic fixture has no true
    discontinuity — the honest expected estimate is ~0, which is
    exactly what a placebo RDD should report.

    Exactness: each side's simple-OLS moments are exact integers
    (centered running variable u = cents - c; u^2 sums through
    HUGEINT/decimal(38) — int64 would overflow at a 100x corpus);
    slopes and cutoff intercepts are fixed double expressions in
    identical order. Scale shape: ONE bandwidth-filtered scan (the
    predicate pushes to parquet), two 1-row side aggregates, a
    declared scalar cross."""
    base = load(spark, sf_dir, "orders").select(
        (F.expr(cents("o_totalprice")) - F.lit(RDD_CUTOFF_C)).alias("u"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )

    def side(lo, hi, pfx):
        return base.filter(
            (F.col("u") >= lo) & (F.col("u") < hi)
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias(f"{pfx}n"),
            F.sum("u").cast("bigint").alias(f"{pfx}su"),
            F.sum(F.col("u").cast("decimal(38,0)") * F.col("u"))
            .cast("double")
            .alias(f"{pfx}su2"),
            F.sum("y").cast("bigint").alias(f"{pfx}sy"),
            F.sum(F.col("u") * F.col("y")).cast("bigint").alias(f"{pfx}suy"),
        )

    l = side(-RDD_BANDWIDTH, 0, "l")
    r = side(0, RDD_BANDWIDTH, "r")
    # bounded: two 1-row side-moment frames
    j = l.crossJoin(F.broadcast(r))

    def alpha(pfx):
        n_d = F.col(f"{pfx}n").cast("double")
        su_d = F.col(f"{pfx}su").cast("double")
        beta = (n_d * F.col(f"{pfx}suy") - su_d * F.col(f"{pfx}sy")) / (
            n_d * F.col(f"{pfx}su2") - su_d * su_d
        )
        return (F.col(f"{pfx}sy").cast("double") - beta * F.col(f"{pfx}su")) / F.col(
            f"{pfx}n"
        )

    al, ar = alpha("l"), alpha("r")
    return j.select(
        F.col("ln").alias("n_left"),
        F.col("rn").alias("n_right"),
        al.alias("rate_left_at_cutoff"),
        ar.alias("rate_right_at_cutoff"),
        (ar - al).alias("rdd_effect"),
    )


CEM_BUCKET_CENTS = 100_000  # $1k coarsening buckets


@query(
    "agg_cem_att",
    oracle=f"""
WITH base AS (
  SELECT o.o_orderkey,
         CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS tr,
         CAST(round(o.o_totalprice * 100) AS BIGINT) // {CEM_BUCKET_CENTS}
           AS b,
         l.nl AS y
  FROM orders o
  JOIN (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS nl
        FROM lineitem GROUP BY 1) l ON l.l_orderkey = o.o_orderkey
), cells AS (
  SELECT b,
         CAST(SUM(CASE WHEN tr = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
         CAST(SUM(CASE WHEN tr = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         CAST(SUM(CASE WHEN tr = 1 THEN y ELSE 0 END) AS BIGINT) AS syt,
         CAST(SUM(CASE WHEN tr = 0 THEN y ELSE 0 END) AS BIGINT) AS syc
  FROM base GROUP BY b
), matched AS (
  SELECT * FROM cells WHERE nt > 0 AND nc > 0
), folds AS (
  SELECT CAST(SUM(nt) AS BIGINT) AS n_t,
         CAST(SUM(nc) AS BIGINT) AS n_c,
         CAST(COUNT(*) AS BIGINT) AS n_buckets,
         list_sum(list(CAST(syt AS DOUBLE)
                       - CAST(nt AS DOUBLE) * syc / nc ORDER BY b)) AS num
  FROM matched
)
SELECT n_t AS n_treated_matched,
       n_c AS n_control_matched,
       n_buckets AS n_buckets_matched,
       num / n_t AS att_lines
FROM folds
""",
)
def agg_cem_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarsened-exact-matching ATT (Iacus-King-Porro): treated
    (URGENT) orders matched to controls within $1k order-value
    buckets; unmatched buckets drop (the CEM pruning step), and the
    effect on the line-count outcome is the matched-stratum
    difference ATT = mean over treated of (y_t - control bucket
    mean) — the transparent non-parametric matching design next to
    agg_stratified_att's quantile strata (CEM coarsens the
    COVARIATE, not its ranks, so the common-support pruning is
    explicit in n_buckets_matched).

    Exactness: bucket ids, per-bucket counts and outcome sums are
    exact integers; each matched bucket's term syt - nt*syc/nc is
    one fixed double expression folded in BUCKET order via the
    strict-fold pair (bounded domain: price-range/1k buckets).
    Scale shape: one lineitem count aggregate, one bucket hash
    aggregate, a bounded fold."""
    o = load(spark, sf_dir, "orders")
    nl = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    base = o.join(nl, o["o_orderkey"] == nl["l_orderkey"]).select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("tr"),
        F.expr(
            f"CAST(round(o_totalprice * 100) AS BIGINT) div {CEM_BUCKET_CENTS}"
        ).alias("b"),
        "y",
    )
    cells = base.groupBy("b").agg(
        F.sum(F.when(F.col("tr") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("nt"),
        F.sum(F.when(F.col("tr") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("nc"),
        F.sum(F.when(F.col("tr") == 1, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("syt"),
        F.sum(F.when(F.col("tr") == 0, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("syc"),
    )
    matched = cells.filter((F.col("nt") > 0) & (F.col("nc") > 0))
    term = (
        F.col("syt").cast("double")
        - F.col("nt").cast("double") * F.col("syc") / F.col("nc")
    )
    folds = matched.agg(
        F.sum("nt").cast("bigint").alias("n_t"),
        F.sum("nc").cast("bigint").alias("n_c"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("b", term.alias("v")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("num"),
    )
    return folds.select(
        F.col("n_t").alias("n_treated_matched"),
        F.col("n_c").alias("n_control_matched"),
        F.col("n_buckets").alias("n_buckets_matched"),
        (F.col("num") / F.col("n_t")).alias("att_lines"),
    )


@query(
    "agg_iptw_ate",
    oracle="""
WITH base AS (
  SELECT o_orderpriority AS seg,
         CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END AS tr,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), cells AS (
  SELECT seg,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(tr) AS BIGINT) AS nt,
         CAST(SUM(tr * y) AS BIGINT) AS syt,
         CAST(SUM((1 - tr) * y) AS BIGINT) AS syc
  FROM base GROUP BY seg
), terms AS (
  SELECT seg, n, nt,
         CAST(syt AS DOUBLE) / (CAST(nt AS DOUBLE) / n) AS wy_t,
         CAST(nt AS DOUBLE) / (CAST(nt AS DOUBLE) / n) AS w_t,
         CAST(syc AS DOUBLE) / (1 - CAST(nt AS DOUBLE) / n) AS wy_c,
         CAST(n - nt AS DOUBLE) / (1 - CAST(nt AS DOUBLE) / n) AS w_c
  FROM cells
), folds AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         list_sum(list(wy_t ORDER BY seg)) AS swy_t,
         list_sum(list(w_t ORDER BY seg)) AS sw_t,
         list_sum(list(wy_c ORDER BY seg)) AS swy_c,
         list_sum(list(w_c ORDER BY seg)) AS sw_c
  FROM terms
)
SELECT n_total,
       swy_t / sw_t AS mean_treated_iptw,
       swy_c / sw_c AS mean_control_iptw,
       swy_t / sw_t - swy_c / sw_c AS ate_iptw
FROM folds
""",
)
def agg_iptw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-probability-of-treatment-weighted ATE (Horvitz-
    Thompson / Hajek form) with a CLOSED-FORM propensity model —
    the segment-saturated propensity e(seg) = P(T|seg) is the exact
    within-segment treatment rate, so the logistic fit every IPTW
    pipeline runs has an exact solution here and the estimator
    needs no iteration: ATE = Hajek-weighted treated mean minus
    control mean. Treatment is the deterministic orderkey % 3
    pseudo-assignment (the sample_ab_assignment convention). The
    estimating-equation counterpart of agg_stratified_att (same
    strata, weighting instead of post-stratification — with a
    saturated model the two coincide asymptotically, readable side
    by side).

    Exactness: per-segment counts/sums are exact integers; each
    segment's four weighted terms are fixed double expressions, and
    the cross-segment accumulations fold in SEGMENT order via the
    strict-fold pair. Scale shape: one hash aggregate to 5 rows,
    one bounded fold."""
    base = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("seg"),
        F.when(F.col("o_orderkey") % 3 == 0, 1).otherwise(0).alias("tr"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    cells = base.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("tr").cast("bigint").alias("nt"),
        F.sum(F.col("tr") * F.col("y")).cast("bigint").alias("syt"),
        F.sum((1 - F.col("tr")) * F.col("y")).cast("bigint").alias("syc"),
    )
    e = F.col("nt").cast("double") / F.col("n")
    terms = cells.select(
        "seg",
        "n",
        (F.col("syt").cast("double") / e).alias("wy_t"),
        (F.col("nt").cast("double") / e).alias("w_t"),
        (F.col("syc").cast("double") / (F.lit(1) - e)).alias("wy_c"),
        ((F.col("n") - F.col("nt")).cast("double") / (F.lit(1) - e)).alias(
            "w_c"
        ),
    )

    def seg_fold(col):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("seg", F.col(col).alias("v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        )

    folds = terms.agg(
        F.sum("n").cast("bigint").alias("n_total"),
        seg_fold("wy_t").alias("swy_t"),
        seg_fold("w_t").alias("sw_t"),
        seg_fold("wy_c").alias("swy_c"),
        seg_fold("w_c").alias("sw_c"),
    )
    mt = F.col("swy_t") / F.col("sw_t")
    mc = F.col("swy_c") / F.col("sw_c")
    return folds.select(
        "n_total",
        mt.alias("mean_treated_iptw"),
        mc.alias("mean_control_iptw"),
        (mt - mc).alias("ate_iptw"),
    )


@query(
    "agg_oaxaca",
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
  SELECT tr,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(CAST(SUM(CAST(x AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) AS sxy
  FROM base GROUP BY tr
), fit AS (
  SELECT tr, n,
         CAST(sx AS DOUBLE) / n AS mx,
         CAST(sy AS DOUBLE) / n AS my,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS beta
  FROM g
), w AS (
  SELECT t.n AS n_treated, c.n AS n_control,
         (t.my - c.my) / 100 AS gap_dollars,
         c.beta * (t.mx - c.mx) / 100 AS explained_dollars,
         ((t.my - c.my) - c.beta * (t.mx - c.mx)) / 100
           AS unexplained_dollars,
         t.beta / 100 AS beta_treated_dollars_per_line,
         c.beta / 100 AS beta_control_dollars_per_line
  FROM fit t, fit c WHERE t.tr = 1 AND c.tr = 0
)
SELECT * FROM w
""",
)
def agg_oaxaca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oaxaca-Blinder decomposition of the URGENT-vs-rest order-value
    gap with basket size (line count) as the endowment: gap =
    explained (control coefficients x endowment difference) +
    unexplained (coefficient/structure difference) — the canonical
    wage-gap decomposition, here answering 'do urgent orders cost
    more because they are BIGGER, or because urgency itself
    prices differently?'. Completes the causal/econometric shelf
    with the decomposition view (DiD trends, RDD thresholds, CEM
    matching, IPTW weighting; this PARTITIONS a gap).

    Exactness: per-group simple-OLS moments are exact integers
    (x*y through HUGEINT/decimal(38)); betas, means and the three
    decomposition terms are fixed double expressions; the two
    1-row group fits meet in a declared scalar cross. An
    independent numpy replay pins the algebra (the gravity/bass
    Cramer lesson). Scale shape: one lineitem count aggregate, one
    2-group hash aggregate, a 1-row cross."""
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
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("sxy"),
    )
    n_d = F.col("n").cast("double")
    fit = g.select(
        "tr",
        "n",
        (F.col("sx").cast("double") / F.col("n")).alias("mx"),
        (F.col("sy").cast("double") / F.col("n")).alias("my"),
        (
            (n_d * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            / (n_d * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        ).alias("beta"),
    )
    t = fit.filter(F.col("tr") == 1).select(
        F.col("n").alias("n_treated"),
        F.col("mx").alias("mxt"),
        F.col("my").alias("myt"),
        F.col("beta").alias("bt"),
    )
    c = fit.filter(F.col("tr") == 0).select(
        F.col("n").alias("n_control"),
        F.col("mx").alias("mxc"),
        F.col("my").alias("myc"),
        F.col("beta").alias("bc"),
    )
    # bounded: two 1-row group fits
    j = t.crossJoin(F.broadcast(c))
    gap = (F.col("myt") - F.col("myc")) / 100
    expl = F.col("bc") * (F.col("mxt") - F.col("mxc")) / 100
    return j.select(
        "n_treated",
        "n_control",
        gap.alias("gap_dollars"),
        expl.alias("explained_dollars"),
        (
            (
                (F.col("myt") - F.col("myc"))
                - F.col("bc") * (F.col("mxt") - F.col("mxc"))
            )
            / 100
        ).alias("unexplained_dollars"),
        (F.col("bt") / 100).alias("beta_treated_dollars_per_line"),
        (F.col("bc") / 100).alias("beta_control_dollars_per_line"),
    )


@query(
    "agg_jackknife_variance",
    bounded_cross="1-row grand-total scalar onto the 25-nation table",
    oracle="""
WITH g AS (
  SELECT c_nationkey AS nk,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s_g
  FROM customer GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(SUM(s_g) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS grps
  FROM g
), reps AS (
  SELECT g.nk,
         CAST(tot.s - g.s_g AS DOUBLE) / (tot.n - g.n_g) AS theta_g,
         tot.s, tot.n, tot.grps
  FROM g, tot
), tb AS (
  SELECT MAX(grps) AS grps,
         CAST(MAX(s) AS DOUBLE) / MAX(n) AS theta,
         list_sum(list(theta_g ORDER BY nk)) / MAX(grps) AS theta_bar
  FROM reps
), jk AS (
  SELECT MAX(tb.grps) AS grps, MAX(tb.theta) AS theta,
         MAX(tb.theta_bar) AS theta_bar,
         list_sum(list(
           (reps.theta_g - tb.theta_bar)
           * (reps.theta_g - tb.theta_bar)
           ORDER BY reps.nk)) AS ssq
  FROM reps, tb
)
SELECT CAST(grps AS BIGINT) AS n_groups,
       theta / 100 AS mean_acctbal_dollars,
       sqrt((grps - 1.0) / grps * ssq) / 100 AS jackknife_se_dollars,
       theta_bar / 100 AS mean_of_replicates_dollars
FROM jk
""",
)
def agg_jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-group jackknife standard error of the mean account
    balance, with nations as the 25 replicate groups: each replicate
    re-estimates the mean without one nation, and
    V_jk = (G-1)/G * sum (theta_g - theta_bar)^2 — the
    replicate-weight variance machinery production surveys publish
    SEs with (no closed-form design variance needed), completing the
    survey family's ESTIMATION leg (two-stage samples the design,
    DEFF audits the weights; this measures the uncertainty).

    Exactness: per-nation and grand sums are exact cents; every
    replicate estimate is one fixed double division of those
    integers; both cross-replicate accumulations fold in NATION
    order via the strict-fold pair. Scale shape: one hash aggregate
    to 25 rows, a declared 1-row total cross, bounded folds."""
    g = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_g"),
            F.sum(F.expr(cents("c_acctbal"))).cast("bigint").alias("s_g"),
        )
    )
    tot = g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("grps"),
    )
    reps = g.crossJoin(F.broadcast(tot)).select(
        "nk",
        (
            (F.col("s") - F.col("s_g")).cast("double")
            / (F.col("n") - F.col("n_g"))
        ).alias("theta_g"),
        "s",
        "n",
        "grps",
    )

    def nk_fold(col_expr):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("nk", col_expr.alias("v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        )

    first = reps.agg(
        F.max("grps").alias("grps"),
        (F.max("s").cast("double") / F.max("n")).alias("theta"),
        nk_fold(F.col("theta_g")).alias("sum_theta"),
    ).collect()[0]
    grps = int(first["grps"])
    theta_bar = float(first["sum_theta"]) / grps
    ssq_row = reps.agg(
        nk_fold(
            (F.col("theta_g") - F.lit(theta_bar))
            * (F.col("theta_g") - F.lit(theta_bar))
        ).alias("ssq")
    ).collect()[0]
    one = reps.sparkSession.createDataFrame(
        [(grps, float(first["theta"]), theta_bar, float(ssq_row["ssq"]))],
        "grps bigint, theta double, theta_bar double, ssq double",
    )
    return one.select(
        F.col("grps").alias("n_groups"),
        (F.col("theta") / 100).alias("mean_acctbal_dollars"),
        (
            F.sqrt(
                (F.col("grps") - F.lit(1.0)) / F.col("grps") * F.col("ssq")
            )
            / 100
        ).alias("jackknife_se_dollars"),
        (F.col("theta_bar") / 100).alias("mean_of_replicates_dollars"),
    )


@query(
    "agg_bic_bayes_factor",
    oracle="""
WITH base AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS tr,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
), g AS (
  SELECT tr, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(CAST(SUM(CAST(c AS HUGEINT) * c) AS VARCHAR) AS DOUBLE) AS ss
  FROM base GROUP BY tr
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(s) AS BIGINT) AS s,
         list_sum(list(ss ORDER BY tr)) AS ss,
         list_sum(list(ss - (CAST(s AS DOUBLE) / n) * s ORDER BY tr))
           AS sse1
  FROM g
), m AS (
  SELECT n, sse1,
         ss - (CAST(s AS DOUBLE) / n) * s AS sse0
  FROM tot
)
SELECT n AS n_orders,
       sse0 / 10000 AS sse_pooled_dollars2,
       sse1 / 10000 AS sse_two_means_dollars2,
       CAST(n AS DOUBLE)
         * (CAST(FLOOR(LN(sse0) * 1000000 + 0.5) AS BIGINT) / 1e6
            - CAST(FLOOR(LN(sse1) * 1000000 + 0.5) AS BIGINT) / 1e6)
         - (CAST(FLOOR(LN(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
            / 1e6) AS two_ln_bf10
FROM m
""",
)
def agg_bic_bayes_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIC-approximate Bayes factor for 'do URGENT and other orders
    share a mean?': 2 ln BF10 ~ n ln(SSE0/SSE1) - ln n (the
    Schwarz/Wagenmakers unit-information approximation) — the
    Bayesian counterpart of the t family's p-values, reporting
    EVIDENCE (positive favors two means, and the ln n term is the
    built-in Occam penalty frequentist tests lack).

    Exactness: both SSEs come from exact integer moments (the
    group-ordered strict fold for SSE1's two-term sum); each ln is
    quantized at 1e-6, so the statistic is fixed arithmetic over
    identical quantized integers. ONE 2-group hash aggregate."""
    base = load(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("tr"),
        F.expr(cents("o_totalprice")).alias("c"),
    )
    g = base.groupBy("tr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("double")
        .alias("ss"),
    )

    def tr_fold(col):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("tr", col.alias("v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        )

    tot = g.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("s").cast("bigint").alias("s"),
        tr_fold(F.col("ss")).alias("ss"),
        tr_fold(
            F.col("ss") - (F.col("s").cast("double") / F.col("n")) * F.col("s")
        ).alias("sse1"),
    )
    sse0 = F.col("ss") - (F.col("s").cast("double") / F.col("n")) * F.col("s")

    def lnq(col):
        return F.floor(F.log(col) * F.lit(1000000) + F.lit(0.5)).cast(
            "bigint"
        ) / F.lit(1e6)

    return tot.select(
        F.col("n").alias("n_orders"),
        (sse0 / 10000).alias("sse_pooled_dollars2"),
        (F.col("sse1") / 10000).alias("sse_two_means_dollars2"),
        (
            F.col("n").cast("double") * (lnq(sse0) - lnq(F.col("sse1")))
            - lnq(F.col("n").cast("double"))
        ).alias("two_ln_bf10"),
    )
