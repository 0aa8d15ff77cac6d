"""Core SQL aggregations: group-by shapes, percentiles, moments, pivots (SURVEY.md §2.2-D).

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
    davg,
    dsum,
    dsum2,
    dsum3,
    duck_davg,
    duck_dsum,
    duck_dsum2,
    duck_dsum3,
)


@query(
    "agg_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {duck_dsum('l_quantity')} AS sum_qty,
       {duck_dsum('l_extendedprice')} AS sum_base_price,
       {duck_dsum2('l_extendedprice', 'l_discount')} AS sum_disc_price,
       {duck_dsum3('l_extendedprice', 'l_discount', 'l_tax')} AS sum_charge,
       {duck_davg('l_quantity')} AS avg_qty,
       {duck_davg('l_extendedprice')} AS avg_price,
       {duck_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (the flagship relational agg)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "2001-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum2("l_extendedprice", "l_discount").alias("sum_disc_price"),
            dsum3("l_extendedprice", "l_discount", "l_tax").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
SELECT c_nationkey, COUNT(DISTINCT c_mktsegment) AS n_segments,
       COUNT(*) AS n_customers
FROM customer
GROUP BY c_nationkey
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct (Expand + two-phase agg in the physical plan)."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@query(
    "agg_approx_cd",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS approx_ok
FROM events
GROUP BY event_type
""",
)
def agg_approx_cd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) — the 100 TB path for distincts.

    HLL sketches are engine-specific, so the oracle formulation is a
    tolerance check: the query emits the EXACT distinct count plus a
    flag that the HLL estimate (rsd 1%) lands within 5% of it; the
    oracle returns the exact count and TRUE. A lying estimate flips
    the flag and fails the driver's value hash.
    """
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        (
            (
                F.abs(
                    F.approx_count_distinct("user_id", 0.01)
                    - F.countDistinct("user_id")
                )
                / F.countDistinct("user_id")
            )
            <= 0.05
        ).alias("approx_ok"),
    )


@query(
    "agg_having",
    bounded_cross="1-row scalar-subquery broadcast (global avg)",
    oracle=f"""
SELECT o_custkey, COUNT(*) AS n_orders, {duck_dsum('o_totalprice')} AS total_spend
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 12
""",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_spend"),
        )
        .filter(F.col("n_orders") >= 12)
    )


_ROLLUP_BODY = f"""
SELECT l_returnflag, l_linestatus,
       {duck_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY {{grouping}} (l_returnflag, l_linestatus)
"""


@query("agg_rollup", oracle=_ROLLUP_BODY.format(grouping="ROLLUP"))
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@query("agg_cube", oracle=_ROLLUP_BODY.format(grouping="CUBE"))
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {duck_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "agg_stats",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 6) AS sd_qty,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(var_samp(l_discount), 6) AS var_disc
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/corr/variance)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
    )


@query(
    "agg_percentile",
    oracle="""
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 6) AS p90_price
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation in both engines).

    At 100 TB the production path is percentile_approx (t-digest,
    mergeable, one pass); the exact variant is the correctness anchor.
    """
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
    )


@query(
    "agg_pivot",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
FROM orders GROUP BY o_orderpriority
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivoted counts (status columns per priority) via groupBy.pivot
    with EXPLICIT pivot values — at scale, enumerating values skips
    the extra distinct-collection job pivot otherwise runs."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


@query(
    "agg_mode",
    oracle="""
SELECT n_nationkey, segment AS mode_segment, c AS n_customers FROM (
  SELECT c_nationkey AS n_nationkey, c_mktsegment AS segment,
         COUNT(*) AS c,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY COUNT(*) DESC, c_mktsegment) AS rn
  FROM customer GROUP BY c_nationkey, c_mktsegment
) WHERE rn = 1
""",
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (most frequent market segment per
    nation). Built as count + rank with an explicit lexicographic
    tie-break rather than engine mode() — engine tie behavior is
    unspecified and would not hash-match; this form is two exact
    shuffles (count, then tiny window) at any scale."""
    from pyspark.sql.window import Window

    c = load(spark, sf_dir, "customer")
    counted = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c"), "c_mktsegment")
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("c_nationkey").alias("n_nationkey"),
            F.col("c_mktsegment").alias("mode_segment"),
            F.col("c").alias("n_customers"),
        )
    )


@query(
    "agg_histogram",
    oracle=f"""
SELECT LEAST(CAST(FLOOR(o_totalprice / 50000) AS BIGINT), 9) AS bucket,
       COUNT(*) AS n, {duck_dsum('o_totalprice')} AS total
FROM orders GROUP BY 1 ORDER BY 1
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals (10 buckets of 50k, top
    bucket open). Bucketing is a narrow map; the agg is one
    partial+final shuffle carrying <=10 groups — the histogram shape
    that works at any scale (vs sort-based percentile binning)."""
    o = load(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000).cast("bigint"), F.lit(9))
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
        .orderBy("bucket")
    )


@query(
    "agg_percentile_grouped",
    oracle=f"""
SELECT o_orderpriority,
       quantile_cont({cents('o_totalprice')}, 0.25) / 100 AS p25,
       quantile_cont({cents('o_totalprice')}, 0.50) / 100 AS median,
       quantile_cont({cents('o_totalprice')}, 0.75) / 100 AS p75
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def agg_percentile_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped quantiles (25/50/75) of order totals. Quantiles
    interpolate over exact integer CENTS (integers are exact in
    doubles, so both engines' linear interpolation produces the
    identical double) and divide by 100 at the end. Exact percentile
    sorts within each group — fine per-group; the approx sketch
    (agg_percentile) is the scale path for global quantiles."""
    o = load(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr(f"percentile({c}, 0.25) / 100").alias("p25"),
            F.expr(f"percentile({c}, 0.50) / 100").alias("median"),
            F.expr(f"percentile({c}, 0.75) / 100").alias("p75"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_corr_cov",
    oracle=f"""
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM({cents('l_quantity')}) AS DOUBLE) AS sx,
         CAST(SUM({cents('l_extendedprice')}) AS DOUBLE) AS sy,
         CAST(SUM({cents('l_quantity')} * {cents('l_extendedprice')}) AS DOUBLE) AS sxy,
         CAST(SUM({cents('l_quantity')} * {cents('l_quantity')}) AS DOUBLE) AS sxx,
         CAST(SUM({cents('l_extendedprice')} * {cents('l_extendedprice')}) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       round((n * sxy - sx * sy) / (n * n), 4) AS cov_pop_cents2,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
             6) AS corr_qty_price
FROM s ORDER BY l_returnflag
""",
)
def agg_corr_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group covariance and Pearson correlation, computed from
    EXACT integer-cents moment sums (n, sx, sy, sxy, sxx, syy) with
    one double expression at the end — unlike the built-in
    corr()/covar_pop() (whose float accumulation order varies with
    partitioning), this formulation is bit-identical on any engine,
    any partition layout. The moments are one partial+final agg pass;
    the integer products stay within int64 at any group size that
    fits a bigint."""
    li = load(spark, sf_dir, "lineitem")
    cx, cy = cents("l_quantity"), cents("l_extendedprice")
    # squared-cents sums exceed int64 at sf0.1 (measured 2.2e19), so
    # the moment sums accumulate as DECIMAL(38,0) in Spark / HUGEINT
    # in DuckDB — both exact — and convert to double ONCE at the end
    # (the same nearest-double rounding on both engines).
    dec = "DECIMAL(38,0)"
    s = li.groupBy("l_returnflag").agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
        F.expr(f"CAST(SUM(CAST({cx} AS {dec})) AS DOUBLE)").alias("sx"),
        F.expr(f"CAST(SUM(CAST({cy} AS {dec})) AS DOUBLE)").alias("sy"),
        F.expr(f"CAST(SUM(CAST({cx} * {cy} AS {dec})) AS DOUBLE)").alias("sxy"),
        F.expr(f"CAST(SUM(CAST({cx} * {cx} AS {dec})) AS DOUBLE)").alias("sxx"),
        F.expr(f"CAST(SUM(CAST({cy} * {cy} AS {dec})) AS DOUBLE)").alias("syy"),
    )
    return s.select(
        "l_returnflag",
        F.expr("round((n * sxy - sx * sy) / (n * n), 4)").alias(
            "cov_pop_cents2"
        ),
        F.expr(
            "round((n * sxy - sx * sy)"
            " / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)"
        ).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


_MOM_FINAL = """
round((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * pow(s1 / n, 3))
      / pow(s2 / n - pow(s1 / n, 2), 1.5), 6)
""".strip()
_KURT_FINAL = """
round((s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * pow(s1 / n, 2) * (s2 / n)
       - 3 * pow(s1 / n, 4))
      / pow(s2 / n - pow(s1 / n, 2), 2) - 3, 6)
""".strip()


@query(
    "agg_skew_kurtosis",
    oracle=f"""
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM({cents('l_quantity')}) AS DOUBLE) AS s1,
         CAST(SUM({cents('l_quantity')} * {cents('l_quantity')}) AS DOUBLE) AS s2,
         CAST(SUM({cents('l_quantity')} * {cents('l_quantity')}
                  * {cents('l_quantity')}) AS DOUBLE) AS s3,
         CAST(SUM({cents('l_quantity')} * {cents('l_quantity')}
                  * {cents('l_quantity')} * {cents('l_quantity')}) AS DOUBLE) AS s4
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       {_MOM_FINAL} AS skewness_pop,
       {_KURT_FINAL} AS kurtosis_excess
FROM s ORDER BY l_returnflag
""",
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per group from EXACT
    integer-cents power sums (n, Σx, Σx², Σx³, Σx⁴) — the built-in
    skewness()/kurtosis() accumulate floats in partition order (and
    engines disagree on bias correction), while raw power sums are
    one exact partial+final agg pass with a single double expression
    at the end, identical on both engines. Quantity cents ≤ 5100 keep
    x⁴ PRODUCTS inside int64 (6.8e14), but the x⁴ SUM passes 9.2e18
    at sf0.1 (measured 2.6e19 per group), so sums accumulate as
    DECIMAL(38,0) in Spark / hugeint in DuckDB — the same
    overflow-safe pattern as agg_corr_cov — and convert to double
    once at the end."""
    li = load(spark, sf_dir, "lineitem")
    cx = cents("l_quantity")
    dec = "DECIMAL(38,0)"
    s = li.groupBy("l_returnflag").agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
        F.expr(f"CAST(SUM(CAST({cx} AS {dec})) AS DOUBLE)").alias("s1"),
        F.expr(f"CAST(SUM(CAST({cx} * {cx} AS {dec})) AS DOUBLE)").alias(
            "s2"
        ),
        F.expr(
            f"CAST(SUM(CAST({cx} * {cx} * {cx} AS {dec})) AS DOUBLE)"
        ).alias("s3"),
        F.expr(
            f"CAST(SUM(CAST({cx} * {cx} * {cx} * {cx} AS {dec})) AS DOUBLE)"
        ).alias("s4"),
    )
    return s.select(
        "l_returnflag",
        F.expr(_MOM_FINAL).alias("skewness_pop"),
        F.expr(_KURT_FINAL).alias("kurtosis_excess"),
    ).orderBy("l_returnflag")


@query(
    "agg_weighted_avg",
    oracle=f"""
SELECT l_returnflag,
       round(CAST(SUM({cents('l_extendedprice')} * CAST(l_quantity AS BIGINT))
                  AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100,
             4) AS wavg_price
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted mean extended price per return flag, from
    EXACT integer sums (price cents × integral quantity) with one
    double division at the end — the weighted-average discipline that
    stays hash-stable where a float-accumulated avg(w*x)/avg(w)
    varies with partition order. l_quantity is integral in the
    fixtures (TPC-H semantics), so the weight cast is lossless."""
    li = load(spark, sf_dir, "lineitem")
    cp = cents("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.expr(
            f"CAST(SUM({cp} * CAST(l_quantity AS BIGINT)) AS DOUBLE)"
        ).alias("num"),
        F.expr("CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)").alias(
            "den"
        ),
    )
    return s.select(
        "l_returnflag",
        F.expr("round(num / den / 100, 4)").alias("wavg_price"),
    )


@query(
    "agg_string_concat",
    oracle="""
SELECT r.r_name,
       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
       CAST(COUNT(*) AS BIGINT) AS n_nations
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG WITHIN GROUP — the report
    formatting staple): comma-joined nation names per region, sorted
    so the concatenation is deterministic under any partitioning.
    Spark 4's native listagg with WITHIN GROUP ordering; DuckDB's
    string_agg with ORDER BY mirrors it."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@query(
    "agg_bool_logic",
    oracle="""
SELECT event_type,
       COUNT(*) FILTER (value > 100) AS n_large,
       bool_and(value >= 0) AS all_nonneg,
       bool_or(value > 900) AS any_huge
FROM events GROUP BY event_type
""",
)
def agg_bool_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate family (count_if, bool_and,
    bool_or) — the data-quality assertion aggregates; all three
    partial+final combinable, one shuffle of tiny per-group state."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("count_if(value > 100)").alias("n_large"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 900).alias("any_huge"),
    )


@query(
    "agg_multi_distinct",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT date_trunc('day', ts)) AS n_days,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
""",
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates in one GROUP BY — planned through
    Spark's Expand operator (one pass over the input replicated per
    distinct set, then a two-level aggregate) instead of N separate
    scans + a join; the canonical engine capability check for
    dashboard queries that count several distinct dimensions at
    once."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.date_trunc("day", "ts")).alias("n_days"),
        F.count(F.lit(1)).alias("n_events"),
    )


# agg_regr_trend: exact moment sums -> one double expression at the
# end (the agg_corr_cov pattern); x = epoch seconds, y = value cents.
_REGR_X = "CAST(epoch_us_col / 1000000 AS BIGINT)"
_REGR_SLOPE = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"


@query(
    "agg_regr_trend",
    oracle=f"""
WITH b AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS x,
         {cents('value')} AS y
  FROM events
), s AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(x * y AS HUGEINT)) AS VARCHAR) AS DOUBLE) AS sxy,
         CAST(CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS VARCHAR)
              AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS VARCHAR)
              AS DOUBLE) AS syy
  FROM b GROUP BY event_type
)
SELECT event_type,
       {_REGR_SLOPE} * 86400 AS slope_cents_per_day,
       (sy - {_REGR_SLOPE} * sx) / n AS intercept_cents,
       pow(n * sxy - sx * sy, 2)
         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
FROM s
""",
)
def agg_regr_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend line — regr_slope / regr_intercept / regr_r2
    semantics (is metric value drifting over time, per event type?)
    computed from EXACT integer moment sums: x = epoch seconds,
    y = value cents, sums accumulated as DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB) — both exact, so partition layout cannot change
    the result — and converted to double ONCE for the closed-form
    slope/intercept/r2 expressions, which are literally the same text
    on both engines. One partial+final agg pass over the scan; the
    built-in regr_* aggregates would float-accumulate in partition
    order and could never hash-match across engines."""
    ev = load(spark, sf_dir, "events")
    dec = "DECIMAL(38,0)"
    cy = cents("value")
    x = "CAST(CAST(ts AS TIMESTAMP) AS BIGINT)"  # epoch seconds (UTC)
    s = ev.groupBy("event_type").agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
        F.expr(f"CAST(SUM(CAST({x} AS {dec})) AS DOUBLE)").alias("sx"),
        F.expr(f"CAST(SUM(CAST({cy} AS {dec})) AS DOUBLE)").alias("sy"),
        F.expr(f"CAST(SUM(CAST({x} * {cy} AS {dec})) AS DOUBLE)").alias("sxy"),
        F.expr(
            f"CAST(SUM(CAST({x} AS {dec}) * CAST({x} AS {dec})) AS DOUBLE)"
        ).alias("sxx"),
        F.expr(
            f"CAST(SUM(CAST({cy} AS {dec}) * CAST({cy} AS {dec})) AS DOUBLE)"
        ).alias("syy"),
    )
    return s.select(
        "event_type",
        F.expr(f"{_REGR_SLOPE} * 86400").alias("slope_cents_per_day"),
        F.expr(f"(sy - {_REGR_SLOPE} * sx) / n").alias("intercept_cents"),
        F.expr(
            "pow(n * sxy - sx * sy, 2)"
            " / ((n * sxx - sx * sx) * (n * syy - sy * sy))"
        ).alias("r2"),
    )


@query(
    "agg_grouping_labels",
    oracle="""
SELECT COALESCE(l_returnflag, '(all)') AS rf,
       COALESCE(l_linestatus, '(all)') AS ls,
       CASE WHEN GROUPING(l_returnflag) = 1 AND GROUPING(l_linestatus) = 1
              THEN 'grand_total'
            WHEN GROUPING(l_linestatus) = 1 THEN 'flag_subtotal'
            ELSE 'leaf' END AS level,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
         AS grouping_id,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_grouping_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING()/grouping-id semantics on a rollup — the part of
    the cube surface agg_rollup doesn't exercise: distinguishing a
    REAL NULL group key from a rollup-generated subtotal row. Each
    row carries its human label (leaf / flag_subtotal / grand_total)
    and the packed grouping id, identical CASE logic in both
    engines. Still one Expand + one aggregate exchange."""
    li = load(spark, sf_dir, "lineitem")
    g_rf = F.grouping("l_returnflag").cast("int")
    g_ls = F.grouping("l_linestatus").cast("int")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            g_rf.alias("g_rf"),
            g_ls.alias("g_ls"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("ls"),
            F.when(
                (F.col("g_rf") == 1) & (F.col("g_ls") == 1),
                "grand_total",
            )
            .when(F.col("g_ls") == 1, "flag_subtotal")
            .otherwise("leaf")
            .alias("level"),
            (F.col("g_rf") * 2 + F.col("g_ls"))
            .cast("bigint")
            .alias("grouping_id"),
            "n",
        )
    )


@query(
    "agg_mutual_info",
    bounded_cross="bounded margins x 1-row grand total",
    oracle="""
WITH joint AS (
  SELECT event_type AS a, CAST(hour(ts) AS BIGINT) AS b,
         COUNT(*) AS n_ab
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT CAST(SUM(n_ab) AS BIGINT) AS n FROM joint
), ma AS (
  SELECT a, CAST(SUM(n_ab) AS BIGINT) AS n_a FROM joint GROUP BY a
), mb AS (
  SELECT b, CAST(SUM(n_ab) AS BIGINT) AS n_b FROM joint GROUP BY b
)
SELECT j.a AS event_type, j.b AS hour, j.n_ab,
       round((CAST(j.n_ab AS DOUBLE) / n)
             * ln((CAST(j.n_ab AS DOUBLE) * n)
                  / (CAST(n_a AS DOUBLE) * n_b)), 9) AS mi_term
FROM joint j JOIN tot ON TRUE
JOIN ma ON ma.a = j.a
JOIN mb ON mb.b = j.b
""",
)
def agg_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and hour of day,
    emitted per contingency CELL (p_ab * ln(p_ab / (p_a * p_b))) —
    the feature-selection statistic, kept order-free by the same
    per-cell discipline as agg_chi2_cells: summing the terms is the
    caller's (order-sensitive) business, the engine ships exact
    cell values. All ratios exact-integer quotients; ln on identical
    doubles. The contingency table is |types| x 24 regardless of
    corpus size — one partial+final agg plus two tiny margin joins.
    mi_term rounds to 9 dp: Java's Math.log and libm disagree by one
    ulp on some inputs (observed at sf0.01), the same policy
    tfidf/quality_bigram_logprob use for ln-valued outputs."""
    ev = load(spark, sf_dir, "events")
    joint = ev.groupBy(
        F.col("event_type").alias("a"),
        F.hour("ts").cast("bigint").alias("b"),
    ).agg(F.count(F.lit(1)).alias("n_ab"))
    tot = joint.agg(F.sum("n_ab").cast("bigint").alias("n"))
    ma = joint.groupBy("a").agg(F.sum("n_ab").cast("bigint").alias("n_a"))
    mb = joint.groupBy("b").agg(F.sum("n_ab").cast("bigint").alias("n_b"))
    j = (
        joint.crossJoin(F.broadcast(tot))
        .join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
    )
    p_ab = F.col("n_ab").cast("double") / F.col("n")
    return j.select(
        F.col("a").alias("event_type"),
        F.col("b").alias("hour"),
        "n_ab",
        F.round(
            p_ab
            * F.log(
                (F.col("n_ab").cast("double") * F.col("n"))
                / (F.col("n_a").cast("double") * F.col("n_b"))
            ),
            9,
        ).alias("mi_term"),
    )


@query(
    "agg_percentile_disc",
    oracle="""
SELECT l_returnflag,
       quantile_disc(l_extendedprice, 0.25) AS p25_disc,
       quantile_disc(l_extendedprice, 0.50) AS p50_disc,
       quantile_disc(l_extendedprice, 0.75) AS p75_disc,
       quantile_disc(l_extendedprice, 0.99) AS p99_disc
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles (percentile_disc semantics: the smallest
    ACTUAL value whose cumulative share >= p — an order statistic,
    never an interpolated synthetic) next to agg_percentile's
    continuous form. Discrete quantiles are what SLO/latency
    reporting wants: the returned number really happened. Exact
    match is trivially stable — both engines return the identical
    stored double."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        *[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP"
                " (ORDER BY l_extendedprice)"
            ).alias(f"p{int(p * 100)}_disc")
            for p in (0.25, 0.50, 0.75, 0.99)
        ]
    )


@query(
    "agg_approx_quantile_eval",
    oracle="""
SELECT CAST(0.5 AS DOUBLE) AS p, quantile_cont(o_totalprice, 0.5) AS exact_val,
       TRUE AS est_ok FROM orders
UNION ALL
SELECT CAST(0.9 AS DOUBLE), quantile_cont(o_totalprice, 0.9), TRUE FROM orders
UNION ALL
SELECT CAST(0.99 AS DOUBLE), quantile_cont(o_totalprice, 0.99), TRUE FROM orders
""",
)
def agg_approx_quantile_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy gate for the approximate-quantile path — the report
    that justifies replacing an exact sort with a sketch at 100 TB:
    approx_percentile(accuracy=10000) against the exact interpolated
    quantile, per percentile, with a 1%-relative-error verdict. The
    oracle returns exact + TRUE (the sketch estimate is
    engine-specific — the same formulation sketch_hll_merge uses);
    a failing flag would hash-mismatch, so the driver gate enforces
    the tolerance."""
    o = load(spark, sf_dir, "orders")
    rows = []
    for p in (0.5, 0.9, 0.99):
        rows.append(
            o.agg(
                F.lit(p).alias("p"),
                F.expr(f"percentile(o_totalprice, {p})").alias(
                    "exact_val"
                ),
                F.expr(
                    f"approx_percentile(o_totalprice, {p}, 10000)"
                ).alias("est"),
            )
        )
    u = rows[0]
    for r in rows[1:]:
        u = u.unionByName(r)
    return u.select(
        "p",
        "exact_val",
        (
            F.abs(F.col("est") - F.col("exact_val"))
            / F.abs(F.col("exact_val"))
            <= 0.01
        ).alias("est_ok"),
    )


@query(
    "agg_exact_median_distributed",
    oracle="""
SELECT median(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0
         AS median_price,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
""",
)
def agg_exact_median_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT global median WITHOUT a single-partition sort — true
    distributed SELECTION (r10, guide §2.3/§2.4): range buckets +
    exact per-bucket counts locate which bucket holds each middle
    rank, then ONLY the target bucket(s) — ~n/32 rows — are sorted
    (a bucket-partitioned window) to pick the two middle order
    statistics; every other bucket is filtered out before any sort
    or shuffle. The previous shape ran the full global-row-number
    pipeline (whole-table shuffle + sort + Arrow numbering) to use
    two of its rows. A plain median() pulls every value through one
    task at 100 TB; this shape touches each row once for counts and
    sorts only the middle bucket. Same bucket boundaries, same
    (c, o_orderkey) total order, so the selected order statistics —
    and the hash — are identical. Cents are exact integers, so the
    even-count midpoint is deterministic IEEE in both engines."""
    from ..plans.global_rank import with_range_bucket

    o = load(spark, sf_dir, "orders").select(
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c"),
        "o_orderkey",
    )
    bucketed = with_range_bucket(o, "c").localCheckpoint(eager=False)
    counts = {
        r["_gr_bucket"]: r["n"]
        for r in bucketed.groupBy("_gr_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n = sum(counts.values())
    if n == 0:
        # Empty input: the isin() below would be built with zero
        # arguments and fail at plan-construction time (r10 ADVICE).
        # Return the null-median row the pre-r10 shape produced.
        return spark.createDataFrame(
            [(None, 0)], "median_price double, n bigint"
        )
    lo, hi = (n + 1) // 2, n // 2 + 1
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    targets = {
        b
        for b in counts
        for r in (lo, hi)
        if offsets[b] < r <= offsets[b] + counts[b]
    }
    in_bucket = bucketed.filter(
        F.col("_gr_bucket").isin(*[int(b) for b in targets])
    )
    w = Window.partitionBy("_gr_bucket").orderBy("c", "o_orderkey")
    off_expr = F.lit(0)
    for b in targets:
        off_expr = F.when(
            F.col("_gr_bucket") == int(b), F.lit(int(offsets[b]))
        ).otherwise(off_expr)
    mids = in_bucket.withColumn(
        "rn", off_expr + F.row_number().over(w)
    ).filter(F.col("rn").isin(lo, hi))
    return mids.agg(
        (
            (F.sum("c").cast("double") / F.count(F.lit(1)))
            / 100.0
        ).alias("median_price"),
        F.lit(n).cast("bigint").alias("n"),
    )


@query(
    "agg_max_by",
    oracle="""
SELECT o_custkey,
       arg_max(o_orderkey, o_totalprice ORDER BY o_orderkey) AS biggest_order,
       MAX(o_totalprice) AS biggest_total,
       arg_min(o_orderkey, o_totalprice ORDER BY o_orderkey) AS smallest_order
FROM orders
GROUP BY o_custkey
""",
)
def agg_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by (arg-max aggregates) — 'which order was the
    customer's biggest' WITHOUT a window+filter round trip: one
    partial+final aggregate carries the (value, arg) pair. Ties on
    the value are broken deterministically toward the LOWEST order
    key by folding the key into the comparison struct in BOTH
    engines (DuckDB's ORDER BY arg form; Spark by max_by on a
    (value, -key) struct), so the hash is stable on duplicate
    totals."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.expr(
            "max_by(o_orderkey, struct(o_totalprice, -o_orderkey))"
        ).alias("biggest_order"),
        F.max("o_totalprice").alias("biggest_total"),
        F.expr(
            "min_by(o_orderkey, struct(o_totalprice, o_orderkey))"
        ).alias("smallest_order"),
    )


@query(
    "agg_cov_matrix",
    oracle=f"""
WITH m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM({cents('l_extendedprice')}) AS DOUBLE) AS s1,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s2,
         CAST(SUM({cents('l_discount')}) AS DOUBLE) AS s3,
         CAST(CAST(SUM(CAST({cents('l_extendedprice')} AS HUGEINT)
                  * {cents('l_extendedprice')}) AS VARCHAR) AS DOUBLE)
           AS s11,
         CAST(CAST(SUM(CAST({cents('l_extendedprice')} AS HUGEINT)
                  * l_quantity) AS VARCHAR) AS DOUBLE) AS s12,
         CAST(CAST(SUM(CAST({cents('l_extendedprice')} AS HUGEINT)
                  * {cents('l_discount')}) AS VARCHAR) AS DOUBLE)
           AS s13,
         CAST(SUM(CAST(l_quantity AS BIGINT) * l_quantity) AS DOUBLE)
           AS s22,
         CAST(SUM(CAST(l_quantity AS BIGINT) * {cents('l_discount')})
              AS DOUBLE) AS s23,
         CAST(SUM({cents('l_discount')} * {cents('l_discount')})
              AS DOUBLE) AS s33
  FROM lineitem
)
SELECT u.i, u.j, u.sij, u.si, u.sj, n,
       (u.sij - u.si * u.sj / n) / (n - 1) AS cov
FROM m, (
  SELECT unnest(['price','price','price','qty','qty','disc']) AS i,
         unnest(['price','qty','disc','qty','disc','disc']) AS j,
         unnest([s11, s12, s13, s22, s23, s33]) AS sij,
         unnest([s1, s1, s1, s2, s2, s3]) AS si,
         unnest([s1, s2, s3, s2, s3, s3]) AS sj
  FROM m
) u
""",
)
def agg_cov_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full sample covariance MATRIX of (price, quantity, discount)
    in one pass — the feature-preprocessing statistic PCA/whitening
    starts from: nine exact moment sums (HUGEINT/decimal where cents
    products overflow int64) unpivoted to the six upper-triangle
    cells, each covariance one deterministic double expression. The
    per-cell output keeps the matrix order-free for hashing, the
    agg_chi2_cells discipline."""
    li = load(spark, sf_dir, "lineitem")
    cy, cd = cents("l_extendedprice"), cents("l_discount")
    q = "CAST(l_quantity AS BIGINT)"
    dec = "DECIMAL(38,0)"
    m = li.agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
        F.expr(f"CAST(SUM({cy}) AS DOUBLE)").alias("s1"),
        F.expr(f"CAST(SUM({q}) AS DOUBLE)").alias("s2"),
        F.expr(f"CAST(SUM({cd}) AS DOUBLE)").alias("s3"),
        F.expr(f"CAST(SUM(CAST({cy} AS {dec}) * {cy}) AS DOUBLE)").alias("s11"),
        F.expr(f"CAST(SUM(CAST({cy} AS {dec}) * l_quantity) AS DOUBLE)").alias("s12"),
        F.expr(f"CAST(SUM(CAST({cy} AS {dec}) * {cd}) AS DOUBLE)").alias("s13"),
        F.expr(f"CAST(SUM({q} * l_quantity) AS DOUBLE)").alias("s22"),
        F.expr(f"CAST(SUM({q} * {cd}) AS DOUBLE)").alias("s23"),
        F.expr(f"CAST(SUM({cd} * {cd}) AS DOUBLE)").alias("s33"),
    )
    cells = m.select(
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.lit(j).alias("j"),
                        F.col(sij).alias("sij"),
                        F.col(si).alias("si"),
                        F.col(sj).alias("sj"),
                    )
                    for i, j, sij, si, sj in [
                        ("price", "price", "s11", "s1", "s1"),
                        ("price", "qty", "s12", "s1", "s2"),
                        ("price", "disc", "s13", "s1", "s3"),
                        ("qty", "qty", "s22", "s2", "s2"),
                        ("qty", "disc", "s23", "s2", "s3"),
                        ("disc", "disc", "s33", "s3", "s3"),
                    ]
                ]
            )
        ).alias("c"),
    )
    return cells.select(
        F.col("c.i").alias("i"),
        F.col("c.j").alias("j"),
        F.col("c.sij").alias("sij"),
        F.col("c.si").alias("si"),
        F.col("c.sj").alias("sj"),
        "n",
        (
            (F.col("c.sij") - F.col("c.si") * F.col("c.sj") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("cov"),
    )


@query(
    "agg_histogram_2d",
    oracle="""
SELECT CAST(least(floor(o_totalprice / 60000), 9) AS INT) AS price_bin,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
         / 100 AS total
FROM orders
GROUP BY 1, 2
""",
)
def agg_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram (price band x order day-of-week) — the heatmap
    backend query every BI layer issues: equi-width price bins
    clamped into a top bucket, calendar second axis, count and exact
    cents per cell. ONE partial+final aggregate; output is
    O(bins x 7) regardless of fact size. (dayofweek numbering:
    Spark is 1-7 Sunday-first, DuckDB 0-6 — the oracle adds one to
    share the label space; caught by the hash gate.)"""
    o = load(spark, sf_dir, "orders")
    return o.groupBy(
        F.least(F.floor(F.col("o_totalprice") / 60000), F.lit(9))
        .cast("int")
        .alias("price_bin"),
        F.dayofweek("o_orderdate").cast("int").alias("dow"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(
                F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
            ).cast("double")
            / 100
        ).alias("total"),
    )


@query(
    "agg_trimmed_mean",
    oracle="""
WITH ranked AS (
  SELECT o_custkey % 1000 AS cohort,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
         ROW_NUMBER() OVER (PARTITION BY o_custkey % 1000
                            ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT),
                                     o_orderkey) AS r,
         COUNT(*) OVER (PARTITION BY o_custkey % 1000) AS n
  FROM orders
), kept AS (
  SELECT cohort, c
  FROM ranked
  WHERE r > CAST(floor(n * 0.1) AS BIGINT)
    AND r <= n - CAST(floor(n * 0.1) AS BIGINT)
)
SELECT cohort,
       COUNT(*) AS n_kept,
       CAST(SUM(c) AS DOUBLE) / 100 / COUNT(*) AS trimmed_mean_price
FROM kept GROUP BY cohort
""",
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean order value per customer cohort (custkey %
    1000) — the robust central tendency a revenue dashboard wants
    when a few whale orders skew plain AVG. Trim bounds via a SHARED
    row_number formulation (rank > floor(0.1n) and rank <=
    n - floor(0.1n), ties broken by o_orderkey) rather than each
    engine's discrete-quantile builtin, whose order-statistic
    conventions differ (the drift_psi lesson); the mean itself is the
    exact-integer-cents sum / count double. Scale shape: the cohort
    modulus gives many balanced groups (and scales up with data by
    raising the modulus), so the per-cohort window sorts many small
    partitions after one hash shuffle — no single-task window, no
    skew."""
    o = load(spark, sf_dir, "orders").withColumn(
        "cohort", F.expr("o_custkey % 1000")
    )
    w = Window.partitionBy("cohort").orderBy(
        F.expr(cents("o_totalprice")), "o_orderkey"
    )
    ranked = o.select(
        "cohort",
        F.expr(cents("o_totalprice")).alias("c"),
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy("cohort"))
        .alias("n"),
    )
    kept = ranked.filter(
        (F.col("r") > F.expr("CAST(floor(n * 0.1) AS BIGINT)"))
        & (F.col("r") <= F.col("n") - F.expr("CAST(floor(n * 0.1) AS BIGINT)"))
    )
    return kept.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.expr("CAST(SUM(c) AS DOUBLE) / 100 / COUNT(*)").alias(
            "trimmed_mean_price"
        ),
    )


@query(
    "agg_winsorized_mean",
    oracle="""
WITH ranked AS (
  SELECT o_custkey % 1000 AS cohort,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
         ROW_NUMBER() OVER (PARTITION BY o_custkey % 1000
                            ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT),
                                     o_orderkey) AS r,
         COUNT(*) OVER (PARTITION BY o_custkey % 1000) AS n
  FROM orders
), bounds AS (
  SELECT cohort,
         MAX(CASE WHEN r = CAST(floor(n * 0.1) AS BIGINT) + 1 THEN c END) AS lo,
         MAX(CASE WHEN r = n - CAST(floor(n * 0.1) AS BIGINT) THEN c END) AS hi
  FROM ranked GROUP BY cohort
)
SELECT r.cohort,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN r.c < b.lo THEN b.lo
                     WHEN r.c > b.hi THEN b.hi
                     ELSE r.c END) AS DOUBLE) / 100 / COUNT(*)
         AS winsorized_mean_price
FROM ranked r JOIN bounds b ON b.cohort = r.cohort
GROUP BY r.cohort
""",
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% winsorized mean per customer cohort — agg_trimmed_mean's
    companion: outliers are CLAMPED to the decile boundary values
    instead of dropped, so every order still counts (the robust mean
    of choice when sample size matters). Boundary order statistics
    come from the same shared row_number formulation (rank
    floor(0.1n)+1 and n-floor(0.1n), ties by o_orderkey), the clamp
    and sum are exact integer cents. One window pass + one broadcast
    join of the tiny per-cohort bounds table."""
    o = load(spark, sf_dir, "orders").withColumn(
        "cohort", F.expr("o_custkey % 1000")
    )
    w = Window.partitionBy("cohort").orderBy(
        F.expr(cents("o_totalprice")), "o_orderkey"
    )
    ranked = o.select(
        "cohort",
        F.expr(cents("o_totalprice")).alias("c"),
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("cohort")).alias("n"),
    )
    bounds = ranked.groupBy("cohort").agg(
        F.max(
            F.when(
                F.col("r") == F.expr("CAST(floor(n * 0.1) AS BIGINT) + 1"),
                F.col("c"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("r") == F.expr("n - CAST(floor(n * 0.1) AS BIGINT)"),
                F.col("c"),
            )
        ).alias("hi"),
    )
    return (
        ranked.join(F.broadcast(bounds), "cohort")
        .groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(
                "CAST(SUM(CASE WHEN c < lo THEN lo WHEN c > hi THEN hi"
                " ELSE c END) AS DOUBLE) / 100 / COUNT(*)"
            ).alias("winsorized_mean_price"),
        )
    )


@query(
    "agg_bitmap_presence",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER))
            AS BIGINT) AS presence_bitmap,
       CAST(bit_count(bit_or(CAST(1 AS BIGINT)
                             << CAST(user_id % 63 AS INTEGER)))
            AS INTEGER) AS n_slots,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
""",
)
def agg_bitmap_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap presence aggregate: per day, a 63-slot user-presence
    bitmap built with bit_or(1 << user_id % 63) — the mergeable
    bitmap-index primitive (daily bitmaps AND/OR into
    retention/overlap queries without touching raw events again;
    the slot count is the capped-domain distinct estimate). Pure
    integer bit arithmetic on both engines (slot 63 stays clear so
    the bigint never goes negative); popcount via bit_count. One
    partial+final aggregate — bit_or partials merge associatively,
    the same property that makes the bitmap shuffle-safe at any
    scale."""
    ev = load(spark, sf_dir, "events")
    bm = F.bit_or(
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))")
    )
    return ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        bm.cast("bigint").alias("presence_bitmap"),
        F.bit_count(bm).cast("int").alias("n_slots"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "agg_weighted_median",
    oracle=f"""
WITH t AS (
  SELECT l_returnflag AS flag,
         {cents('l_extendedprice')} AS price_c,
         CAST(l_quantity AS BIGINT) AS w,
         SUM(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag
           ORDER BY {cents('l_extendedprice')}, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
         SUM(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag) AS total_w
  FROM lineitem
)
SELECT flag,
       CAST(MIN(CASE WHEN 2 * cumw >= total_w THEN price_c END) AS DOUBLE)
         / 100 AS weighted_median,
       CAST(MAX(total_w) AS BIGINT) AS total_weight
FROM t GROUP BY flag
""",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median of the line price per return flag —
    the robust 'typical traded price' a pricing dashboard needs
    (each line counts by units moved, not once). Shared exact
    formulation in BOTH engines: sort each group by (price cents,
    orderkey, linenumber), running cumulative weight, and the
    weighted median is the SMALLEST price whose cumulative weight
    reaches half the total (2*cumw >= total — all-integer, no
    division). One exchange on the group key serves the running
    window, the per-group total window, and the final groupBy; with
    k groups the post-window aggregate is k rows. Weights and
    prices are exact bigints, so the hash match is exact by
    construction."""
    li = load(spark, sf_dir, "lineitem")
    price_c = F.expr(cents("l_extendedprice"))
    w_run = (
        Window.partitionBy("l_returnflag")
        .orderBy(price_c, "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    t = li.select(
        F.col("l_returnflag").alias("flag"),
        price_c.alias("price_c"),
        F.sum(F.col("l_quantity").cast("bigint")).over(w_run).alias("cumw"),
        F.sum(F.col("l_quantity").cast("bigint")).over(w_all).alias("total_w"),
    )
    return t.groupBy("flag").agg(
        (
            F.min(
                F.when(2 * F.col("cumw") >= F.col("total_w"), F.col("price_c"))
            ).cast("double")
            / 100
        ).alias("weighted_median"),
        F.max("total_w").cast("bigint").alias("total_weight"),
    )
