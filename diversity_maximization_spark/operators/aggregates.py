"""Aggregations (SURVEY.md §2.2-D).

All run as Catalyst two-phase hash aggregates (partial map-side combine
-> shuffle on group keys -> final), which is exactly the plan that
scales: the shuffle carries one row per (partition x group), not the
data. Money/quantity sums go through DECIMAL(18,2) so the result is
exact and order-independent — the only way a distributed sum can
hash-match a single-threaded DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources import load


# Exact money arithmetic: every fixture money column is a 2-dp value,
# so ROUND(x*100) recovers the exact integer cents (verified: max
# |x*100 - round(x*100)| < 1e-8 across all money columns). Integer
# sums are associative — a 1000-way distributed sum hash-matches a
# single-threaded oracle exactly, which no double or double->DECIMAL
# cast can guarantee (Java's shortest-repr double->decimal rounding
# diverges from DuckDB's binary rounding on 3/4-dp products).


def cents(expr: str) -> str:
    """Exact integer cents of a 2-dp double column (SQL fragment)."""
    return f"CAST(ROUND(({expr}) * 100) AS BIGINT)"


def dsum(expr: str) -> Column:
    """Exact order-independent sum of a 2-dp numeric, as double."""
    return F.expr(f"CAST(SUM({cents(expr)}) AS DOUBLE) / 100")


def duck_dsum(expr: str) -> str:
    return f"(CAST(SUM({cents(expr)}) AS DOUBLE) / 100)"


def davg(expr: str) -> Column:
    """Exact-cents-sum / count — identical double in both engines."""
    return F.expr(f"CAST(SUM({cents(expr)}) AS DOUBLE) / 100 / COUNT(*)")


def duck_davg(expr: str) -> str:
    return f"(CAST(SUM({cents(expr)}) AS DOUBLE) / 100 / COUNT(*))"


def dsum2(a: str, b_complement: str) -> Column:
    """Exact SUM(a * (1 - b)) for 2-dp a and b: cents(a)*(100-cents(b))/1e4."""
    return F.expr(
        f"CAST(SUM({cents(a)} * (100 - {cents(b_complement)})) AS DOUBLE) / 10000"
    )


def duck_dsum2(a: str, b_complement: str) -> str:
    return (
        f"(CAST(SUM({cents(a)} * (100 - {cents(b_complement)})) AS DOUBLE) / 10000)"
    )


def dsum3(a: str, b_minus: str, c_plus: str) -> Column:
    """Exact SUM(a * (1 - b) * (1 + c)) via integer cents."""
    return F.expr(
        f"CAST(SUM({cents(a)} * (100 - {cents(b_minus)}) * (100 + {cents(c_plus)})) "
        f"AS DOUBLE) / 1000000"
    )


def duck_dsum3(a: str, b_minus: str, c_plus: str) -> str:
    return (
        f"(CAST(SUM({cents(a)} * (100 - {cents(b_minus)}) * (100 + {cents(c_plus)})) "
        f"AS DOUBLE) / 1000000)"
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

_OLS_FINAL = """
SELECT grp, n_rows,
       (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
          + s2 * (s1y * s12 - s11 * s2y)) / det AS b0,
       (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s2y - s1y * s2)) / det AS b_qty,
       (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
          + sy * (s1 * s12 - s11 * s2)) / det AS b_disc,
       1 - (syy
            - ((sy * (s11 * s22 - s12 * s12)
                - s1 * (s1y * s22 - s12 * s2y)
                + s2 * (s1y * s12 - s11 * s2y)) / det) * sy
            - ((n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
                + s2 * (s1 * s2y - s1y * s2)) / det) * s1y
            - ((n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
                + sy * (s1 * s12 - s11 * s2)) / det) * s2y)
         / (syy - sy * sy / n) AS r2
""".strip()

_OLS_DET = """
  SELECT grp, n, n AS n_rows, s1, s2, sy, s11, s22, s12, s1y, s2y, syy,
         n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s12 - s11 * s2) AS det
""".strip()


@query(
    "agg_ols_multi",
    oracle=f"""
WITH m AS (
  SELECT l_returnflag AS grp,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
         CAST(SUM({cents('l_discount')}) AS DOUBLE) AS s2,
         CAST(SUM({cents('l_extendedprice')}) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS DOUBLE) AS s11,
         CAST(SUM({cents('l_discount')} * {cents('l_discount')}) AS DOUBLE)
           AS s22,
         CAST(SUM(CAST(l_quantity AS BIGINT) * {cents('l_discount')})
              AS DOUBLE) AS s12,
         CAST(SUM(CAST(l_quantity AS BIGINT) * {cents('l_extendedprice')})
              AS DOUBLE) AS s1y,
         CAST(SUM({cents('l_discount')} * {cents('l_extendedprice')})
              AS DOUBLE) AS s2y,
         CAST(CAST(SUM(CAST({cents('l_extendedprice')} AS HUGEINT)
                  * {cents('l_extendedprice')}) AS VARCHAR) AS DOUBLE)
           AS syy
  FROM lineitem GROUP BY l_returnflag
), d AS (
{_OLS_DET}
  FROM m
)
{_OLS_FINAL}
FROM d
""",
)
def agg_ols_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form TWO-FEATURE OLS per return flag: extended price
    (cents) regressed on quantity and discount via the 3x3 normal
    equations solved by Cramer's rule — the multivariate companion
    to agg_regr_trend. Nine moment sums accumulate EXACTLY (int64
    where products fit, DECIMAL(38)/HUGEINT for the y^2 sum that
    overflows at sf0.1), convert to double once, and the
    coefficient/R^2 expressions are a SHARED SQL fragment evaluated
    identically by both engines — bit-exact, no rounding. One
    partial+final aggregate over the scan; the fit itself is O(1)
    per group. This is how distributed linear models on bounded
    feature counts actually train: moments in one pass, solve on
    the driver-side expression."""
    li = load(spark, sf_dir, "lineitem")
    q = "CAST(l_quantity AS BIGINT)"
    cd, cy = cents("l_discount"), cents("l_extendedprice")
    dec = "DECIMAL(38,0)"
    m = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
        F.expr(f"CAST(SUM({q}) AS DOUBLE)").alias("s1"),
        F.expr(f"CAST(SUM({cd}) AS DOUBLE)").alias("s2"),
        F.expr(f"CAST(SUM({cy}) AS DOUBLE)").alias("sy"),
        F.expr(f"CAST(SUM({q} * {q}) AS DOUBLE)").alias("s11"),
        F.expr(f"CAST(SUM({cd} * {cd}) AS DOUBLE)").alias("s22"),
        F.expr(f"CAST(SUM({q} * {cd}) AS DOUBLE)").alias("s12"),
        F.expr(f"CAST(SUM({q} * {cy}) AS DOUBLE)").alias("s1y"),
        F.expr(f"CAST(SUM({cd} * {cy}) AS DOUBLE)").alias("s2y"),
        F.expr(
            f"CAST(SUM(CAST({cy} AS {dec}) * {cy}) AS DOUBLE)"
        ).alias("syy"),
    )
    m.createOrReplaceTempView("ols_m")
    spark.sql(f"{_OLS_DET}\nFROM ols_m").createOrReplaceTempView("ols_d")
    return spark.sql(f"{_OLS_FINAL}\nFROM ols_d")

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
    """EXACT global median WITHOUT a single-partition sort — the
    distributed-selection plan: global row numbers come from the
    range-bucket machinery (plans/global_rank.py: quantile
    boundaries, per-bucket offsets, Arrow-numbered buckets), then
    the two middle order statistics are picked by rank and averaged.
    A plain median() pulls every value through one task at 100 TB;
    this shape touches each row once and sorts only within buckets.
    Cents are exact integers, so the even-count midpoint is
    deterministic IEEE in both engines."""
    from ..plans.global_rank import with_global_row_number

    o = load(spark, sf_dir, "orders").select(
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c"),
        "o_orderkey",
    )
    numbered, n = with_global_row_number(
        o, ["c", "o_orderkey"], out_col="rn"
    )
    lo, hi = (n + 1) // 2, n // 2 + 1
    mids = numbered.filter(F.col("rn").isin(lo, hi))
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
    "agg_roc_auc",
    oracle="""
WITH g AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS s,
         COUNT(*) AS cnt,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
  FROM events GROUP BY 1
), r AS (
  SELECT s, cnt, pos,
         COALESCE(SUM(cnt) OVER (
           ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_less
  FROM g
), a AS (
  SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(cnt - pos) AS BIGINT) AS n_neg,
         CAST(SUM(pos * (2 * cum_less + cnt + 1)) AS BIGINT) AS rank2
  FROM r
)
SELECT n_pos, n_neg,
       CAST(rank2 - n_pos * (n_pos + 1) AS DOUBLE)
         / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc
FROM a
""",
)
def agg_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected ROC AUC of a score (event value) against a
    binary label (event_type = 'purchase') — the model-eval primitive
    a curation pipeline runs on every learned quality scorer. Uses
    the rank-sum identity AUC = (R+ - n+(n+ + 1)/2) / (n+ n-), with
    tied scores carrying their AVERAGE rank. Everything stays integer
    until the single final division: per distinct cents score we keep
    (cnt, pos); twice-the-average-rank of that score is the integer
    2*cum_less + cnt + 1, so R2 = SUM(pos * that) is an exact BIGINT
    and AUC = (R2 - n+(n+ +1)) / (2 n+ n-) is ONE double division —
    bit-identical across engines with no rounding. Scale shape: the
    grouped score table is bounded by the distinct 2-dp value domain
    (<= ~49k rows for events.value in [0.01, 490]), so the
    unpartitioned prefix window runs over a provably small table; the
    only data-sized pass is the first groupBy. BIGINT headroom: R2
    <= 2n^2, exact up to n ~ 2e9 rows per AUC computation."""
    ev = load(spark, sf_dir, "events")
    scored = ev.select(
        F.expr(cents("value")).alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "pos"
        ),
    )
    return roc_auc_over(scored, "s", "pos")


def roc_auc_over(df: DataFrame, score_col: str, pos_col: str) -> DataFrame:
    """Exact tie-corrected rank-sum AUC kernel over (score, 0/1
    label) rows — shared by agg_roc_auc and api.roc_auc. Scores
    should be integer-exact (e.g. cents) for cross-engine
    bit-stability; the grouped score table bounds the prefix
    window."""
    g = df.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(pos_col).alias("pos"),
    )
    # bounded: distinct values of the (quantized) score domain
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    r = g.withColumn(
        "cum_less", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    )
    a = r.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).cast("bigint").alias("n_neg"),
        F.sum(
            F.col("pos") * (2 * F.col("cum_less") + F.col("cnt") + 1)
        ).cast("bigint").alias("rank2"),
    )
    return a.select(
        "n_pos",
        "n_neg",
        (
            (
                F.col("rank2") - F.col("n_pos") * (F.col("n_pos") + 1)
            ).cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
        ).alias("auc"),
    )


@query(
    "agg_calibration_bins",
    oracle="""
WITH s AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS sc,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
  FROM orders
), b AS (
  SELECT sc, pos,
         NTILE(10) OVER (ORDER BY sc, o_orderkey) AS bin
  FROM s
)
SELECT bin, COUNT(*) AS n_rows,
       CAST(CAST(SUM(sc) AS BIGINT) AS DOUBLE) / 100 / COUNT(*)
         AS mean_score,
       CAST(CAST(SUM(pos) AS BIGINT) AS DOUBLE) / COUNT(*) AS pos_rate
FROM b GROUP BY bin
""",
)
def agg_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile calibration table: order all orders by score (exact
    total-price cents, o_orderkey tie-break), split into 10 equal-
    frequency bins, and report mean score vs positive rate (label =
    finished status) per bin — the reliability-diagram input for any
    learned scorer. The global NTILE uses the two-phase
    plans/global_rank.py machinery (range-bucket + per-bucket offsets
    + partitioned mapInPandas numbering), so no single-task Sort or
    SinglePartition window touches the full table; the exact
    NTILE(10) arithmetic on the global row number matches DuckDB's
    NTILE convention (first n%10 tiles one row bigger). Divisions are
    double/bigint in the same order both engines."""
    from ..plans.global_rank import ntile_expr, with_global_row_number

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(cents("o_totalprice")).alias("sc"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
    )
    numbered, n_total = with_global_row_number(o, ["sc", "o_orderkey"])
    binned = numbered.withColumn(
        "bin", ntile_expr("_rn", n_total, 10)
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.sum("sc").cast("bigint").cast("double")
            / 100
            / F.count(F.lit(1))
        ).alias("mean_score"),
        (
            F.sum("pos").cast("bigint").cast("double") / F.count(F.lit(1))
        ).alias("pos_rate"),
    )


@query(
    "agg_classifier_eval",
    oracle="""
WITH s AS (
  SELECT CASE WHEN CAST(round(value * 100) AS BIGINT) >= 24500
              THEN 1 ELSE 0 END AS pred,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events
), m AS (
  SELECT CAST(SUM(pred * label) AS BIGINT) AS tp,
         CAST(SUM(pred * (1 - label)) AS BIGINT) AS fp,
         CAST(SUM((1 - pred) * label) AS BIGINT) AS fn,
         CAST(SUM((1 - pred) * (1 - label)) AS BIGINT) AS tn
  FROM s
)
SELECT tp, fp, fn, tn,
       CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision_,
       CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall_,
       CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) AS f1,
       CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE)
         AS accuracy
FROM m
""",
)
def agg_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded binary-classifier evaluation (pred = score >=
    245.00, label = purchase): confusion matrix plus precision /
    recall / F1 / accuracy, each expressed as ONE division of exact
    BIGINT counts (F1 via 2tp/(2tp+fp+fn), not the P*R composition,
    so no intermediate float). The whole operator is one partial+
    final aggregate over the fact scan — the cheapest possible
    distributed shape. Companion to agg_roc_auc (threshold-free) and
    agg_calibration_bins (reliability)."""
    ev = load(spark, sf_dir, "events")
    s = ev.select(
        F.when(
            F.expr(cents("value")) >= 24500, 1
        ).otherwise(0).alias("pred"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("label"),
    )
    m = s.agg(
        F.sum(F.col("pred") * F.col("label")).cast("bigint").alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("label")))
        .cast("bigint")
        .alias("fp"),
        F.sum((1 - F.col("pred")) * F.col("label"))
        .cast("bigint")
        .alias("fn"),
        F.sum((1 - F.col("pred")) * (1 - F.col("label")))
        .cast("bigint")
        .alias("tn"),
    )
    return m.select(
        "tp",
        "fp",
        "fn",
        "tn",
        (
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fp")).cast("double")
        ).alias("precision_"),
        (
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fn")).cast("double")
        ).alias("recall_"),
        (
            (2 * F.col("tp")).cast("double")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double")
        ).alias("f1"),
        (
            (F.col("tp") + F.col("tn")).cast("double")
            / (
                F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")
            ).cast("double")
        ).alias("accuracy"),
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
    "agg_cohens_kappa",
    oracle="""
WITH s AS (
  SELECT CASE WHEN CAST(round(value * 100) AS BIGINT) >= 24500
              THEN 1 ELSE 0 END AS rater_a,
         CASE WHEN event_type IN ('purchase', 'click')
              THEN 1 ELSE 0 END AS rater_b
  FROM events
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN rater_a = rater_b THEN 1 ELSE 0 END)
              AS BIGINT) AS agree,
         CAST(SUM(rater_a) AS BIGINT) AS a1,
         CAST(SUM(rater_b) AS BIGINT) AS b1
  FROM s
)
SELECT n, agree, a1, b1,
       CAST(agree AS DOUBLE) / n AS po,
       (CAST(a1 AS DOUBLE) * b1 + CAST(n - a1 AS DOUBLE) * (n - b1))
         / (CAST(n AS DOUBLE) * n) AS pe,
       (CAST(agree AS DOUBLE) / n
          - (CAST(a1 AS DOUBLE) * b1 + CAST(n - a1 AS DOUBLE) * (n - b1))
            / (CAST(n AS DOUBLE) * n))
         / (1 - (CAST(a1 AS DOUBLE) * b1 + CAST(n - a1 AS DOUBLE) * (n - b1))
               / (CAST(n AS DOUBLE) * n)) AS kappa
FROM m
""",
)
def agg_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa agreement between two binary labelers (a value
    threshold vs an event-type rule) — the chance-corrected metric
    for judging weak labelers / LLM-judge agreement before trusting
    either for training-data filtering. Marginals and agreement are
    exact bigints; po, pe, and kappa are float expressions of those
    integers in identical order (products stay in double's exact
    range far beyond any row count here). One partial+final
    aggregate."""
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
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(F.col("rater_a") == F.col("rater_b"), 1).otherwise(0)
        ).cast("bigint").alias("agree"),
        F.sum("rater_a").cast("bigint").alias("a1"),
        F.sum("rater_b").cast("bigint").alias("b1"),
    )
    nd = F.col("n").cast("double")
    po = F.col("agree").cast("double") / F.col("n")
    pe = (
        F.col("a1").cast("double") * F.col("b1")
        + (F.col("n") - F.col("a1")).cast("double") * (F.col("n") - F.col("b1"))
    ) / (nd * F.col("n"))
    return m.select(
        "n",
        "agree",
        "a1",
        "b1",
        po.alias("po"),
        pe.alias("pe"),
        ((po - pe) / (1 - pe)).alias("kappa"),
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
    "agg_cramers_v",
    bounded_cross="1-row grand-total scalar onto the bounded cell table",
    oracle="""
WITH cells AS (
  SELECT event_type AS r,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS c,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
), margins AS (
  SELECT r, CAST(SUM(o) AS BIGINT) AS row_n FROM cells GROUP BY r
), cols AS (
  SELECT c, CAST(SUM(o) AS BIGINT) AS col_n FROM cells GROUP BY c
), tot AS (
  SELECT CAST(SUM(o) AS BIGINT) AS n,
         (SELECT COUNT(*) FROM margins) AS n_rows,
         (SELECT COUNT(*) FROM cols) AS n_cols
  FROM cells
), chi AS (
  SELECT list_sum(list(
           (o - CAST(m.row_n AS DOUBLE) * k.col_n / t.n)
           * (o - CAST(m.row_n AS DOUBLE) * k.col_n / t.n)
           / (CAST(m.row_n AS DOUBLE) * k.col_n / t.n)
           ORDER BY cells.r, cells.c)) AS chi2
  FROM cells
  JOIN margins m ON cells.r = m.r
  JOIN cols k ON cells.c = k.c
  CROSS JOIN tot t
)
SELECT t.n, t.n_rows, t.n_cols, chi.chi2,
       sqrt(chi.chi2 / (t.n * least(t.n_rows - 1, t.n_cols - 1)))
         AS cramers_v
FROM chi, tot t
""",
)
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V effect size for the event-type x arm contingency
    table — the normalized [0,1] association strength a raw
    chi-square can't give (agg_chi2_cells reports the cells; this is
    the scalar verdict). Cell counts and margins are exact bigints;
    the chi-square contributions fold over the BOUNDED cell table in
    (row, col) order (strict left fold both engines), and V is one
    sqrt of exact-ordered arithmetic. Three small aggregates after
    one data-sized pass."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("r"),
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("c"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    margins = cells.groupBy("r").agg(
        F.sum("o").cast("bigint").alias("row_n")
    )
    cols = cells.groupBy("c").agg(F.sum("o").cast("bigint").alias("col_n"))
    n_rows = margins.count()
    n_cols = cols.count()
    tot = cells.agg(F.sum("o").cast("bigint").alias("n"))
    joined = (
        cells.join(F.broadcast(margins), "r")
        .join(F.broadcast(cols), "c")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("row_n").cast("double") * F.col("col_n") / F.col("n")
    contrib = (F.col("o") - e) * (F.col("o") - e) / e
    chi = joined.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("r", "c", contrib.alias("x")))
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["x"],
        ).alias("chi2"),
        F.first(F.col("n")).alias("n"),
    )
    return chi.select(
        "n",
        F.lit(n_rows).cast("bigint").alias("n_rows"),
        F.lit(n_cols).cast("bigint").alias("n_cols"),
        "chi2",
        F.sqrt(
            F.col("chi2")
            / (F.col("n") * F.least(F.lit(n_rows - 1), F.lit(n_cols - 1)))
        ).alias("cramers_v"),
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
    exact integers. Three semi-joined distinct-counts over one
    filtered scan."""
    ev = load(spark, sf_dir, "events")
    wk = F.date_trunc("week", "ts")
    w1d = ev.where(wk == F.expr("TIMESTAMP_NTZ'2024-01-01 00:00:00'")).select(
        "user_id"
    ).distinct()
    w2d = ev.where(wk == F.expr("TIMESTAMP_NTZ'2024-01-08 00:00:00'")).select(
        "user_id"
    ).distinct()
    n1 = w1d.count()
    n2 = w2d.count()
    m12 = w1d.join(w2d, "user_id").count()
    true_union = (
        ev.where(
            wk.isin(
                F.expr("TIMESTAMP_NTZ'2024-01-01 00:00:00'"),
                F.expr("TIMESTAMP_NTZ'2024-01-08 00:00:00'"),
            )
        )
        .select("user_id")
        .distinct()
        .count()
    )
    spark_sess = ev.sparkSession
    out = spark_sess.createDataFrame(
        [(n1, n2, m12, true_union)],
        "n1 bigint, n2 bigint, m12 bigint, true_union bigint",
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
    "agg_icc",
    oracle=f"""
WITH g AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM({cents('value')}) AS BIGINT) AS s,
         CAST(SUM({cents('value')} * {cents('value')}) AS BIGINT) AS ss
  FROM events GROUP BY user_id
), q AS (
  SELECT n, s, ss,
         CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS BIGINT)
           AS sq_over_n
  FROM g
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(SUM(s) AS BIGINT) AS s_total,
         CAST(SUM(ss) AS BIGINT) AS sum_ss,
         CAST(SUM(sq_over_n) AS BIGINT) AS sum_q,
         CAST(SUM(n * n) AS BIGINT) AS sum_n_sq
  FROM q
), m AS (
  SELECT k, n_total,
         (CAST(sum_q AS DOUBLE)
            - CAST(s_total AS DOUBLE) * CAST(s_total AS DOUBLE) / n_total)
           / (k - 1) AS msb,
         (CAST(sum_ss AS DOUBLE) - CAST(sum_q AS DOUBLE))
           / (n_total - k) AS msw,
         (n_total - CAST(sum_n_sq AS DOUBLE) / n_total)
           / (k - 1) AS n0
  FROM tot
)
SELECT k, n_total,
       msb / 10000 AS ms_between,
       msw / 10000 AS ms_within,
       (msb - msw) / (msb + (n0 - 1) * msw) AS icc1
FROM m
""",
)
def agg_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICC(1), the one-way random-effects intraclass correlation:
    what fraction of event-value variance is BETWEEN users rather
    than within them — the clustering-strength number that decides
    whether per-user random effects (or cluster-robust errors) are
    needed. Unlike agg_anova_oneway's bounded-k sorted fold, the
    group count here (users) is UNBOUNDED, so the between-groups
    sum uses the integer-quantization discipline instead: each
    group's s^2/n term is computed with the identical two IEEE ops
    in both engines (deterministic), quantized once to an integer
    cents^2 unit, and summed as exact bigints — distributed
    accumulation order can't perturb the total (the
    select_facility_location recipe applied to an aggregate).
    Unbalanced design handled via n0 = (N - sum n_j^2 / N)/(k-1).
    One partial+final aggregate over the data; everything after is
    driver-scalar arithmetic on six exact integers."""
    ev = load(spark, sf_dir, "events")
    c = F.expr(cents("value"))
    g = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(c).cast("bigint").alias("s"),
        F.sum(F.expr(f"{cents('value')} * {cents('value')}"))
        .cast("bigint")
        .alias("ss"),
    )
    q = g.select(
        "n",
        "s",
        "ss",
        F.round(
            F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
        )
        .cast("bigint")
        .alias("sq_over_n"),
    )
    tot = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.sum("s").cast("bigint").alias("s_total"),
        F.sum("ss").cast("bigint").alias("sum_ss"),
        F.sum("sq_over_n").cast("bigint").alias("sum_q"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sum_n_sq"),
    )
    m = tot.select(
        "k",
        "n_total",
        (
            (
                F.col("sum_q").cast("double")
                - F.col("s_total").cast("double")
                * F.col("s_total").cast("double")
                / F.col("n_total")
            )
            / (F.col("k") - 1)
        ).alias("msb"),
        (
            (F.col("sum_ss").cast("double") - F.col("sum_q").cast("double"))
            / (F.col("n_total") - F.col("k"))
        ).alias("msw"),
        (
            (
                F.col("n_total")
                - F.col("sum_n_sq").cast("double") / F.col("n_total")
            )
            / (F.col("k") - 1)
        ).alias("n0"),
    )
    return m.select(
        "k",
        "n_total",
        (F.col("msb") / 10000).alias("ms_between"),
        (F.col("msw") / 10000).alias("ms_within"),
        (
            (F.col("msb") - F.col("msw"))
            / (F.col("msb") + (F.col("n0") - 1) * F.col("msw"))
        ).alias("icc1"),
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


_MH_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_MH_R = " + ".join(
    f"(CAST(a{i} AS DOUBLE) * d{i} / (a{i} + b{i} + c{i} + d{i}))"
    for i in range(1, 6)
)
_MH_S = " + ".join(
    f"(CAST(b{i} AS DOUBLE) * c{i} / (a{i} + b{i} + c{i} + d{i}))"
    for i in range(1, 6)
)


def _mh_pivot_sql() -> str:
    cols = []
    for i, pr in enumerate(_MH_PRIOS, start=1):
        for letter in "abcd":
            cols.append(
                f"CAST(MAX(CASE WHEN pr = '{pr}' THEN {letter} END)"
                f" AS BIGINT) AS {letter}{i}"
            )
    return ", ".join(cols)


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


@query(
    "agg_decile_lift",
    bounded_cross="1-row broadcast scalar (decile totals)",
    oracle="""
WITH s AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS sc,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
  FROM orders
), b AS (
  SELECT sc, pos, NTILE(10) OVER (ORDER BY -sc, o_orderkey) AS decile
  FROM s
), per AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS p
  FROM b GROUP BY decile
), cum AS (
  SELECT decile, n, p,
         CAST(SUM(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
         CAST(SUM(p) OVER (ORDER BY decile) AS BIGINT) AS cum_p,
         (SELECT CAST(SUM(n) AS BIGINT) FROM per) AS n_g,
         (SELECT CAST(SUM(p) AS BIGINT) FROM per) AS p_g
  FROM per
)
SELECT decile, n, p,
       cum_n, cum_p,
       CAST(cum_p * n_g AS DOUBLE) / (cum_n * p_g) AS cum_lift
FROM cum
""",
)
def agg_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains/lift chart: rank orders by score (total
    price, DESCENDING via the negated-cents trick), cut into 10
    equal-frequency deciles with the plans/global_rank.py
    distributed NTILE, and report each prefix's conversion lift
    over the base rate — 'the top 30% of scores capture 1.8x their
    share of conversions', the model-targeting readout every
    campaign sizing meeting wants. The cumulative sums ride the
    10-row decile table; lift = (cum_p * N) / (cum_n * P) keeps the
    numerator and denominator exact bigints so the ONLY float is
    one division per decile row."""
    from ..plans.global_rank import ntile_expr, with_global_row_number

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        (-F.expr(cents("o_totalprice"))).alias("neg_sc"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
    )
    numbered, n_total = with_global_row_number(o, ["neg_sc", "o_orderkey"])
    per = (
        numbered.withColumn("decile", ntile_expr("_rn", n_total, 10))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("p"),
        )
    )
    g = per.agg(
        F.sum("n").cast("bigint").alias("n_g"),
        F.sum("p").cast("bigint").alias("p_g"),
    )
    # bounded: 10 decile rows
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.crossJoin(F.broadcast(g))
        .select(
            "decile",
            "n",
            "p",
            F.sum("n").over(w).cast("bigint").alias("cum_n"),
            F.sum("p").over(w).cast("bigint").alias("cum_p"),
            "n_g",
            "p_g",
        )
        .select(
            "decile",
            "n",
            "p",
            "cum_n",
            "cum_p",
            (
                (F.col("cum_p") * F.col("n_g")).cast("double")
                / (F.col("cum_n") * F.col("p_g"))
            ).alias("cum_lift"),
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


def pps_systematic_over(
    weights: DataFrame, key_col: str, weight_col: str, n: int
) -> DataFrame:
    """Generic systematic PPS sampler over any (key, weight) table —
    the library form of sample_pps_systematic (same half-offset
    integer crossing algebra and two-phase prefix sums)."""
    from ..plans.global_rank import with_range_bucket

    w = weights.select(
        F.col(key_col).alias("c_custkey"),
        F.col(weight_col).cast("bigint").alias("w"),
    )
    rb = with_range_bucket(w, "c_custkey").localCheckpoint(eager=False)
    subtotals = {
        r["_gr_bucket"]: r["bt"]
        for r in rb.groupBy("_gr_bucket")
        .agg(F.sum("w").alias("bt"))
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
        .orderBy("c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rb.select(
        "c_custkey",
        "w",
        (
            F.element_at(off_map, F.col("_gr_bucket"))
            + F.sum("w").over(win)
        ).cast("bigint").alias("cum"),
    )
    lo = F.when(
        2 * n * (F.col("cum") - F.col("w")) < total, F.lit(0)
    ).otherwise(
        F.expr(
            f"({2 * n} * (cum - w) - {total}) div {2 * total}"
        ) + 1
    )
    hi = F.when(2 * n * F.col("cum") < total, F.lit(0)).otherwise(
        F.expr(f"({2 * n} * cum - {total}) div {2 * total}") + 1
    )
    hits = cum.select(
        "c_custkey", "w", "cum", (hi - lo).cast("bigint").alias("n_hits")
    )
    return hits.filter(F.col("n_hits") >= 1)


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


def growth_accounting_over(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Generic monthly growth-accounting kernel over any (user, ts)
    event DataFrame — the library form of agg_growth_accounting
    (same new/retained/resurrected/churned identities)."""
    um = df.select(
        F.col(user_col).alias("user_id"),
        F.date_trunc("month", ts_col).alias("m"),
    ).distinct()
    fm = um.groupBy("user_id").agg(F.min("m").alias("m0"))
    prev = um.select(
        "user_id",
        F.expr("m + INTERVAL 1 MONTH").alias("m"),
        F.lit(1).alias("was_active"),
    )
    cur = (
        um.join(fm, "user_id")
        .join(prev, ["user_id", "m"], "left")
        .select(
            "m",
            "m0",
            F.coalesce("was_active", F.lit(0)).alias("was_active"),
        )
    )
    max_m = um.agg(F.max("m").alias("mx"))
    nxt = um.select(
        "user_id", F.expr("m + INTERVAL 1 MONTH").alias("nm")
    )
    churn = (
        um.select("user_id", F.expr("m + INTERVAL 1 MONTH").alias("m"))
        .join(
            nxt.withColumnRenamed("nm", "m"),
            ["user_id", "m"],
            "left_anti",
        )
        .crossJoin(F.broadcast(max_m))
        .filter(F.col("m") <= F.col("mx"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("churned"))
    )
    agg = cur.groupBy(F.col("m").alias("month")).agg(
        F.count(F.lit(1)).cast("bigint").alias("mau"),
        F.sum(F.when(F.col("m") == F.col("m0"), 1).otherwise(0))
        .cast("bigint")
        .alias("new_users"),
        F.sum(
            F.when(
                (F.col("m") != F.col("m0")) & (F.col("was_active") == 1),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("retained"),
        F.sum(
            F.when(
                (F.col("m") != F.col("m0")) & (F.col("was_active") == 0),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("resurrected"),
    )
    return agg.join(
        churn.withColumnRenamed("m", "month"), "month", "left"
    ).select(
        "month",
        "mau",
        "new_users",
        "retained",
        "resurrected",
        F.coalesce("churned", F.lit(0)).cast("bigint").alias("churned"),
    )


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


_A2_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _a2_cells() -> list[tuple[int, int]]:
    return [(p, r) for p in (0, 1) for r in range(5)]


def _a2_pivot_sql() -> str:
    cols = []
    for p, r in _a2_cells():
        cols.append(
            f"CAST(MAX(CASE WHEN par = {p} AND pr = '{_A2_PRIOS[r]}'"
            f" THEN n END) AS BIGINT) AS n{p}{r}"
        )
        cols.append(
            f"CAST(MAX(CASE WHEN par = {p} AND pr = '{_A2_PRIOS[r]}'"
            f" THEN s END) AS BIGINT) AS s{p}{r}"
        )
    return ", ".join(cols)


def _a2_exprs() -> dict[str, str]:
    """Fixed-order SS expressions over the 10 named pivot cells —
    identical text in both engines (the Mantel-Haenszel recipe,
    two-way)."""
    cells = _a2_cells()
    n_tot = " + ".join(f"n{p}{r}" for p, r in cells)
    s_tot = " + ".join(f"s{p}{r}" for p, r in cells)
    gm = f"(CAST(({s_tot}) AS DOUBLE) / ({n_tot}))"
    terms_cells = " + ".join(
        f"(CAST(s{p}{r} AS DOUBLE) / n{p}{r} - {gm})"
        f" * (CAST(s{p}{r} AS DOUBLE) / n{p}{r} - {gm}) * n{p}{r}"
        for p, r in cells
    )
    ss_a_terms = []
    for p in (0, 1):
        np_ = " + ".join(f"n{p}{r}" for r in range(5))
        sp_ = " + ".join(f"s{p}{r}" for r in range(5))
        m = f"(CAST(({sp_}) AS DOUBLE) / ({np_}))"
        ss_a_terms.append(f"({m} - {gm}) * ({m} - {gm}) * ({np_})")
    ss_b_terms = []
    for r in range(5):
        nr_ = " + ".join(f"n{p}{r}" for p in (0, 1))
        sr_ = " + ".join(f"s{p}{r}" for p in (0, 1))
        m = f"(CAST(({sr_}) AS DOUBLE) / ({nr_}))"
        ss_b_terms.append(f"({m} - {gm}) * ({m} - {gm}) * ({nr_})")
    return {
        "n_total": n_tot,
        "ss_cells": terms_cells,
        "ss_a": " + ".join(ss_a_terms),
        "ss_b": " + ".join(ss_b_terms),
        "ss_total": f"ssq - CAST(({s_tot}) AS DOUBLE) * ({s_tot})"
        f" / ({n_tot})",
    }


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
    "agg_gini_impurity",
    bounded_cross="1-row parent-impurity scalar onto the 1-row hour fold",
    oracle="""
WITH cls AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nc FROM events GROUP BY 1
), parent AS (
  SELECT CAST(SUM(nc) AS BIGINT) AS n,
         CAST(SUM(nc * nc) AS BIGINT) AS ssc
  FROM cls
), hc AS (
  SELECT CAST(hour(ts) AS BIGINT) AS h, event_type,
         CAST(COUNT(*) AS BIGINT) AS nhc
  FROM events GROUP BY 1, 2
), hstat AS (
  SELECT h, CAST(SUM(nhc) AS BIGINT) AS nh,
         CAST(SUM(nhc * nhc) AS BIGINT) AS ssh
  FROM hc GROUP BY h
), child AS (
  SELECT list_sum(list(
           (CAST(nh AS DOUBLE) * CAST(nh AS DOUBLE) - CAST(ssh AS DOUBLE))
           / (CAST(nh AS DOUBLE) * (SELECT n FROM parent))
           ORDER BY h)) AS wchild,
         CAST(COUNT(*) AS BIGINT) AS n_splits
  FROM hstat
)
SELECT p.n,
       (CAST(p.n AS DOUBLE) * CAST(p.n AS DOUBLE) - CAST(p.ssc AS DOUBLE))
         / (CAST(p.n AS DOUBLE) * CAST(p.n AS DOUBLE)) AS parent_gini,
       c.wchild AS weighted_child_gini,
       (CAST(p.n AS DOUBLE) * CAST(p.n AS DOUBLE) - CAST(p.ssc AS DOUBLE))
         / (CAST(p.n AS DOUBLE) * CAST(p.n AS DOUBLE)) - c.wchild AS gain,
       c.n_splits
FROM parent p, child c
""",
)
def agg_gini_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini impurity gain of splitting event_type by hour-of-day —
    the decision-tree split criterion as a distributed aggregate
    (the feature-screening primitive for categorical targets).
    Parent impurity 1 - sum(p_c^2) and each hour-bucket's child
    impurity come from exact BIGINT squared counts; the weighted
    child sum folds the 24-row hour table in hour order (sorted
    fold == list_sum ORDER BY) with each term evaluated from exact
    integers by identical expression text — bit-exact, no rounding.
    Two data-sized aggs; everything after runs on <= 24 rows."""
    ev = load(spark, sf_dir, "events")
    cls = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("nc")
    )
    parent = cls.agg(
        F.sum("nc").cast("bigint").alias("n"),
        F.sum(F.col("nc") * F.col("nc")).cast("bigint").alias("ssc"),
    )
    hc = ev.groupBy(
        F.hour("ts").cast("bigint").alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("nhc"))
    hstat = hc.groupBy("h").agg(
        F.sum("nhc").cast("bigint").alias("nh"),
        F.sum(F.col("nhc") * F.col("nhc")).cast("bigint").alias("ssh"),
    )
    n_total = parent.collect()[0]
    n, ssc = n_total["n"], n_total["ssc"]
    terms = hstat.select(
        "h",
        (
            (
                F.col("nh").cast("double") * F.col("nh").cast("double")
                - F.col("ssh").cast("double")
            )
            / (F.col("nh").cast("double") * F.lit(n))
        ).alias("term"),
    )
    child = terms.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("h", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("wchild"),
        F.count(F.lit(1)).cast("bigint").alias("n_splits"),
    )
    nd = F.lit(float(n))
    parent_gini = (nd * nd - F.lit(float(ssc))) / (nd * nd)
    return child.select(
        F.lit(n).cast("bigint").alias("n"),
        parent_gini.alias("parent_gini"),
        F.col("wchild").alias("weighted_child_gini"),
        (parent_gini - F.col("wchild")).alias("gain"),
        "n_splits",
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


def _duck_md5_32(arg: str) -> str:
    """First 32 bits of md5(arg) as BIGINT — identical to Spark's
    conv(substring(md5(x), 1, 8), 16, 10) (nibble-sum form)."""
    return "(" + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({arg}), {k}, 1)) - 1)"
        f" * {16 ** (8 - k)}"
        for k in range(1, 9)
    ) + ")"


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
    "agg_conformal_interval",
    oracle="""
WITH base AS (
  SELECT event_id, event_type,
         CAST(ROUND((value) * 100) AS BIGINT) AS c
  FROM events WHERE event_type IN ('purchase', 'click', 'view')
), train AS (
  SELECT event_type,
         CAST(SUM(c) AS DOUBLE) / COUNT(*) AS pred,
         CAST(COUNT(*) AS BIGINT) AS n_train
  FROM base WHERE event_id % 2 = 0 GROUP BY event_type
), calib AS (
  SELECT b.event_type, b.event_id,
         abs(CAST(b.c AS DOUBLE) - t.pred) AS r
  FROM base b JOIN train t USING (event_type)
  WHERE b.event_id % 2 = 1
), ranked AS (
  SELECT event_type, r,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY r, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_cal
  FROM calib
), q AS (
  SELECT event_type, MAX(n_cal) AS n_calib,
         MAX(CASE WHEN rn = (9 * (n_cal + 1) + 9) // 10 THEN r END) AS q90
  FROM ranked GROUP BY event_type
)
SELECT t.event_type, t.n_train, CAST(q.n_calib AS BIGINT) AS n_calib,
       t.pred / 100 AS prediction,
       q.q90 / 100 AS q90,
       CAST((SELECT COUNT(*) FROM calib c
             WHERE c.event_type = t.event_type AND c.r <= q.q90) AS DOUBLE)
         / q.n_calib AS coverage
FROM train t JOIN q USING (event_type)
""",
)
def agg_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals per event type: train on
    even event_ids (the point predictor is the training mean),
    calibrate on odd ids, and take the ceil(0.9 * (n+1))-th smallest
    absolute residual as the finite-sample-valid 90% interval
    half-width — the distribution-free uncertainty quantification
    every ML scoring pipeline should ship next to its predictions.
    Exactness: the training mean is exact-cents-sum / count; each
    residual is one float expression from exact integers; the
    conformal quantile is an exact RANK PICK (k = (9(n+1)+9)//10 in
    pure integers — never ceil(0.9 * x), whose IEEE 0.9 rounds the
    boundary wrong) with (r, event_id) tie-break; coverage is an
    exact count over one division. No folds, no rounding."""
    ev = load(spark, sf_dir, "events")
    base = ev.filter(
        F.col("event_type").isin("purchase", "click", "view")
    ).select("event_id", "event_type", F.expr(cents("value")).alias("c"))
    train = (
        base.filter(F.col("event_id") % 2 == 0)
        .groupBy("event_type")
        .agg(
            (F.sum("c").cast("double") / F.count(F.lit(1))).alias("pred"),
            F.count(F.lit(1)).cast("bigint").alias("n_train"),
        )
    )
    calib = (
        base.filter(F.col("event_id") % 2 == 1)
        .join(F.broadcast(train.select("event_type", "pred")), "event_type")
        .select(
            "event_type",
            "event_id",
            F.abs(F.col("c").cast("double") - F.col("pred")).alias("r"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy("r", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = calib.select(
        "event_type",
        "r",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_cal"),
    )
    q = ranked.groupBy("event_type").agg(
        F.max("n_cal").alias("n_calib"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(9 * (n_cal + 1) + 9) div 10"),
                F.col("r"),
            )
        ).alias("q90"),
    )
    cov = (
        calib.join(F.broadcast(q.select("event_type", "q90")), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("r") <= F.col("q90"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_in")
        )
    )
    return (
        train.join(q, "event_type")
        .join(cov, "event_type")
        .select(
            "event_type",
            "n_train",
            F.col("n_calib").cast("bigint").alias("n_calib"),
            (F.col("pred") / 100).alias("prediction"),
            (F.col("q90") / 100).alias("q90"),
            (F.col("n_in").cast("double") / F.col("n_calib")).alias(
                "coverage"
            ),
        )
    )


@query(
    "agg_brier_score",
    bounded_cross="5-row segment probability table folded into one score row",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderpriority AS seg,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), train AS (
  SELECT seg,
         CAST(SUM(y) AS DOUBLE) / COUNT(*) AS p
  FROM base WHERE o_orderkey % 2 = 0 GROUP BY seg
), test AS (
  SELECT b.seg, t.p,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(b.y) AS BIGINT) AS ny
  FROM base b JOIN train t USING (seg)
  WHERE b.o_orderkey % 2 = 1
  GROUP BY b.seg, t.p
), folds AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_test,
         list_sum(list(n * p * p - 2 * p * ny + ny ORDER BY seg)) AS ss,
         list_sum(list(CAST(ny AS DOUBLE) * (n - ny) / n / n * n
                       ORDER BY seg)) AS ref_ss
  FROM test
)
SELECT n_test,
       ss / n_test AS brier,
       ref_ss / n_test AS brier_refitted,
       CAST(1 AS DOUBLE) - (ss / n_test) / (ref_ss / n_test)
         AS skill_vs_refit
FROM folds
""",
)
def agg_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score of a per-segment probability forecast: train-half
    (even order keys) purchase-fulfilment rates predict the test
    half; Brier = mean (p - y)^2 — the proper scoring rule every
    probabilistic classifier gates on — decomposed per segment as
    n*p^2 - 2*p*ny + ny so only exact integer counts and the
    per-segment p enter (y is 0/1, so y^2 = y). A same-data
    refitted-rate reference (ny(n-ny)/n per segment) gives the
    skill score. Both accumulations fold the 5-row segment table in
    segment order — bit-exact, no rounding."""
    o = load(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("seg"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    train = (
        base.filter(F.col("o_orderkey") % 2 == 0)
        .groupBy("seg")
        .agg((F.sum("y").cast("double") / F.count(F.lit(1))).alias("p"))
    )
    test = (
        base.filter(F.col("o_orderkey") % 2 == 1)
        .join(F.broadcast(train), "seg")
        .groupBy("seg", "p")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("ny"),
        )
    )
    terms = test.select(
        "seg",
        "n",
        (
            F.col("n") * F.col("p") * F.col("p")
            - 2 * F.col("p") * F.col("ny")
            + F.col("ny")
        ).alias("t1"),
        (
            F.col("ny").cast("double")
            * (F.col("n") - F.col("ny"))
            / F.col("n")
            / F.col("n")
            * F.col("n")
        ).alias("t2"),
    )
    folds = terms.agg(
        F.sum("n").cast("bigint").alias("n_test"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("seg", F.col("t1").alias("v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("ss"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("seg", F.col("t2").alias("v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("ref_ss"),
    )
    return folds.select(
        "n_test",
        (F.col("ss") / F.col("n_test")).alias("brier"),
        (F.col("ref_ss") / F.col("n_test")).alias("brier_refitted"),
        (
            F.lit(1).cast("double")
            - (F.col("ss") / F.col("n_test"))
            / (F.col("ref_ss") / F.col("n_test"))
        ).alias("skill_vs_refit"),
    )


@query(
    "agg_pareto_front",
    oracle=f"""
SELECT p.p_partkey, {cents('p.p_retailprice')} AS price_cents,
       CAST(p.p_size AS INT) AS p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part o
  WHERE {cents('o.p_retailprice')} <= {cents('p.p_retailprice')}
    AND o.p_size >= p.p_size
    AND ({cents('o.p_retailprice')} < {cents('p.p_retailprice')}
         OR o.p_size > p.p_size)
)
""",
)
def agg_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE operator: the Pareto frontier of parts minimizing
    retail price while maximizing size — every part not DOMINATED by
    another (cheaper-or-equal AND bigger-or-equal, strict somewhere).
    The classic multi-criteria shortlist query (cheapest part at
    every quality level).

    Scale-correct plan that never sorts or self-joins the part table
    globally: p_size is a BOUNDED domain (TPC-H: 1..50), so one
    shuffle builds the 50-row (size -> min price) table, a bounded
    suffix-min window over it yields min price among STRICTLY LARGER
    sizes, and a broadcast join back flags dominance per row —
    dominated iff a same-size part is strictly cheaper OR a larger
    size exists at less-or-equal price. O(n) scan + O(sizes) state;
    the naive NOT EXISTS theta join is the oracle, not the plan.
    All comparisons on exact integer cents — hash-stable."""
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.expr(cents("p_retailprice")).alias("price_cents"),
        F.col("p_size").cast("int").alias("p_size"),
    )
    by_size = p.groupBy("p_size").agg(F.min("price_cents").alias("minp"))
    # bounded: p_size domain is 1..50 (TPC-H), so this window runs
    # over at most 50 rows
    w = Window.orderBy(F.col("p_size").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # the largest size has no larger sizes: empty frame -> NULL, which
    # must mean "not dominated", not a three-valued-logic drop
    sfx = by_size.select(
        "p_size",
        "minp",
        F.coalesce(
            F.min("minp").over(w), F.lit(2**62).cast("bigint")
        ).alias("minp_larger"),
    )
    joined = p.join(F.broadcast(sfx), "p_size")
    dominated = (F.col("minp") < F.col("price_cents")) | (
        F.col("minp_larger") <= F.col("price_cents")
    )
    return joined.filter(~dominated).select(
        "p_partkey", "price_cents", "p_size"
    )


_ISO_BINS = 20


def _iso_violation(p: str) -> str:
    """PAVA violation predicate on the DuckDB state row alias ``p``:
    the last two stack blocks violate monotonicity, compared by
    CROSS-MULTIPLICATION so the test is exact-integer (no division
    anywhere in the merge loop)."""
    return (
        f"(len({p}.sums) >= 2 AND "
        f"{p}.sums[len({p}.sums)-1] * {p}.ns[len({p}.ns)] > "
        f"{p}.sums[len({p}.sums)] * {p}.ns[len({p}.ns)-1])"
    )


@query(
    "agg_isotonic_calibration",
    oracle=f"""
WITH RECURSIVE bins AS MATERIALIZED (
  SELECT bin,
         CAST(SUM(pos) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
           NTILE({_ISO_BINS}) OVER (
             ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                      o_orderkey) AS bin
    FROM orders)
  GROUP BY bin
), bl AS MATERIALIZED (
  SELECT list(s ORDER BY bin) AS ls, list(n ORDER BY bin) AS ln FROM bins
),
dp AS (
  SELECT 1 AS pos, [l.ls[1]] AS sums, [l.ln[1]] AS ns,
         [CAST(1 AS BIGINT)] AS widths
  FROM bl l
  UNION ALL
  SELECT CASE WHEN {_iso_violation('p')} THEN p.pos
              ELSE p.pos + 1 END AS pos,
         CASE WHEN {_iso_violation('p')}
              THEN list_slice(p.sums, 1, len(p.sums) - 2)
                   || [p.sums[len(p.sums) - 1] + p.sums[len(p.sums)]]
              ELSE p.sums || [l.ls[p.pos + 1]] END AS sums,
         CASE WHEN {_iso_violation('p')}
              THEN list_slice(p.ns, 1, len(p.ns) - 2)
                   || [p.ns[len(p.ns) - 1] + p.ns[len(p.ns)]]
              ELSE p.ns || [l.ln[p.pos + 1]] END AS ns,
         CASE WHEN {_iso_violation('p')}
              THEN list_slice(p.widths, 1, len(p.widths) - 2)
                   || [p.widths[len(p.widths) - 1]
                       + p.widths[len(p.widths)]]
              ELSE p.widths || [CAST(1 AS BIGINT)] END AS widths
  FROM dp p CROSS JOIN bl l
  WHERE {_iso_violation('p')} OR p.pos < {_ISO_BINS}
),
fin AS MATERIALIZED (
  SELECT sums, ns, widths FROM dp p
  WHERE p.pos = {_ISO_BINS} AND NOT {_iso_violation('p')}
)
SELECT CAST(k AS INTEGER) AS block_idx,
       CAST(1 + COALESCE(list_sum(list_slice(widths, 1, k - 1)), 0)
            AS BIGINT) AS bin_from,
       CAST(list_sum(list_slice(widths, 1, k)) AS BIGINT) AS bin_to,
       ns[k] AS n_rows, sums[k] AS pos_sum,
       CAST(sums[k] AS DOUBLE) / ns[k] AS iso_rate
FROM fin, unnest(generate_series(1, len(sums))) t(k)
""",
)
def agg_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration of the score -> positive-rate curve by
    pool-adjacent-violators (PAVA; Barlow et al. 1972 — what sklearn's
    IsotonicRegression fits): the {_ISO_BINS} equal-frequency score
    bins of agg_calibration_bins, pooled left-to-right until the
    positive rate is non-decreasing in score. The monotone fit is the
    step function probability calibrators actually deploy; the raw
    reliability diagram (calibration_bins) can zigzag.

    Exactness: the merge loop compares pooled rates by CROSS-
    MULTIPLICATION (s_a * n_b > s_b * n_a — exact bigints, no
    division until the final per-block rate, which divides identical
    integers). Scale shape: the data-sized work is the global NTILE
    (two-phase range-bucket machinery, no SinglePartition sort) and
    one groupBy to {_ISO_BINS} rows; PAVA itself is a <= 2*{_ISO_BINS}-step
    stack loop on the driver over the bounded bin table. The oracle
    replays the IDENTICAL stack machine as a recursive CTE over
    list-of-bigint state (one append OR one merge per step, <= 39
    steps). Output: one row per pooled block with its bin span,
    exact counts, and the isotonic rate."""
    from ..plans.global_rank import ntile_expr, with_global_row_number

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(cents("o_totalprice")).alias("sc"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
    )
    numbered, n_total = with_global_row_number(o, ["sc", "o_orderkey"])
    binned = numbered.withColumn(
        "bin", ntile_expr("_rn", n_total, _ISO_BINS)
    )
    rows = (
        binned.groupBy("bin")
        .agg(
            F.sum("pos").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .collect()  # bounded: exactly _ISO_BINS rows
    )
    rows.sort(key=lambda r: r["bin"])
    sums = []
    ns = []
    widths = []
    for r in rows:
        sums.append(int(r["s"]))
        ns.append(int(r["n"]))
        widths.append(1)
        while len(sums) >= 2 and sums[-2] * ns[-1] > sums[-1] * ns[-2]:
            sums[-2:] = [sums[-2] + sums[-1]]
            ns[-2:] = [ns[-2] + ns[-1]]
            widths[-2:] = [widths[-2] + widths[-1]]
    out = []
    start = 1
    for k in range(len(sums)):
        out.append(
            (
                k + 1,
                start,
                start + widths[k] - 1,
                ns[k],
                sums[k],
                float(sums[k]) / ns[k],
            )
        )
        start += widths[k]
    return spark.createDataFrame(
        out,
        "block_idx int, bin_from bigint, bin_to bigint, n_rows bigint,"
        " pos_sum bigint, iso_rate double",
    )


@query(
    "agg_average_precision",
    oracle="""
WITH r AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
         ROW_NUMBER() OVER (
           ORDER BY -CAST(round(value * 100) AS BIGINT), event_id
         ) AS k
  FROM events
), p AS (
  SELECT k, ROW_NUMBER() OVER (ORDER BY k) AS j
  FROM r WHERE pos = 1
), a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pos,
         CAST(SUM((j * 1000000000) // k) AS BIGINT) AS ap_nano_sum
  FROM p
)
SELECT n_pos, ap_nano_sum,
       CAST(ap_nano_sum AS DOUBLE) / n_pos / 1000000000
         AS average_precision
FROM a
""",
)
def agg_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (the area under the precision-recall curve,
    step-interpolated — sklearn's average_precision_score with a
    deterministic tie order): rank events by score descending
    (event_id tie-break), AP = mean over positives of
    precision-at-that-positive = (1/n+) * sum_j (j / k_j) where the
    j-th positive sits at global rank k_j. The imbalanced-label
    companion of agg_roc_auc — PR space ignores the true-negative
    mass that inflates ROC on rare-positive corpora.

    Exactness: each per-positive precision is quantized as the
    positive-operand floor division (j * 1e9) // k_j — identical
    div / // semantics — and bigint-summed order-free; ONE double
    division chain at the end on identical integers. Scale shape:
    both global rankings run through the two-phase range-bucket
    machinery (plans/global_rank.py — no SinglePartition sort); the
    positives pass reuses the same order. j <= n+ <= 1.5e5 at sf0.1
    -> terms <= 1.5e14, sums well inside int64 even at 100x."""
    from ..plans.global_rank import with_global_row_number

    ev = load(spark, sf_dir, "events").select(
        (-F.expr(cents("value"))).alias("neg_s"),
        "event_id",
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("pos"),
    )
    numbered, _ = with_global_row_number(
        ev, ["neg_s", "event_id"], out_col="k"
    )
    positives = numbered.filter(F.col("pos") == 1).select("k")
    ranked_pos, n_pos = with_global_row_number(positives, ["k"], out_col="j")
    agg = ranked_pos.agg(
        F.sum(F.expr("(j * 1000000000) div k")).cast("bigint").alias(
            "ap_nano_sum"
        )
    )
    return agg.select(
        F.lit(n_pos).cast("bigint").alias("n_pos"),
        "ap_nano_sum",
        (
            F.col("ap_nano_sum").cast("double")
            / F.lit(n_pos)
            / F.lit(1000000000)
        ).alias("average_precision"),
    )


@query(
    "agg_bland_altman",
    bounded_cross="1-row broadcast scalar (global diff-moment row)",
    oracle="""
WITH ls AS (
  SELECT l_orderkey AS ok,
         CAST(SUM(CAST(FLOOR((CAST(l_extendedprice AS DOUBLE)
              * (1 - CAST(l_discount AS DOUBLE)))
              * (1 + CAST(l_tax AS DOUBLE)) * 1000000 + 0.5) AS BIGINT))
           AS BIGINT) AS s_micro
  FROM lineitem GROUP BY l_orderkey
), d AS (
  SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) * 10000 - ls.s_micro
           AS d
  FROM orders o JOIN ls ON o.o_orderkey = ls.ok
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(d) AS BIGINT) AS sd_,
         CAST(CAST(SUM(CAST(d AS HUGEINT) * d) AS VARCHAR) AS DOUBLE)
           AS ss
  FROM d
), st AS (
  SELECT n,
         CAST(sd_ AS DOUBLE) / n AS mean_d,
         sqrt((ss - (CAST(sd_ AS DOUBLE) / n) * CAST(sd_ AS DOUBLE))
              / (n - 1)) AS sd_d
  FROM m
)
SELECT st.n AS n_orders,
       st.mean_d AS mean_diff_micro,
       st.sd_d AS sd_diff_micro,
       st.mean_d - 1.96 * st.sd_d AS loa_lo,
       st.mean_d + 1.96 * st.sd_d AS loa_hi,
       CAST(SUM(CASE WHEN CAST(d.d AS DOUBLE) < st.mean_d - 1.96 * st.sd_d
                       OR CAST(d.d AS DOUBLE) > st.mean_d + 1.96 * st.sd_d
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outside
FROM d, st
GROUP BY st.n, st.mean_d, st.sd_d
""",
)
def agg_bland_altman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bland-Altman agreement analysis (Bland & Altman 1986) between
    the two ways this schema states an order's value: the header
    o_totalprice vs the lineitem-derived sum(extendedprice *
    (1-discount) * (1+tax)) — the reconciliation report a warehouse
    runs between a rollup column and its source-of-truth detail.
    Reports the bias (mean difference), the spread (SD), the 95%
    limits of agreement, and how many orders fall outside them.

    Exactness: each line's value is quantized ONCE to integer micro
    units with FLOOR(x * 1e6 + 0.5) on a fixed double expression
    (identical IEEE sequence both engines), so per-order sums and the
    diff d are exact bigints; d^2 goes through decimal(38)/HUGEINT
    (the ts_acf overflow discipline — d can reach ~6e11 micro, d^2
    ~4e23) and the moments collapse to doubles in one fixed order.
    Scale shape: one keyed groupBy over lineitem, one equi-join to
    orders, a 1-row moment aggregate joined back as a broadcast
    scalar, one linear flag pass — no window, no driver loop."""
    li = load(spark, sf_dir, "lineitem")
    ls = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.sum(
            F.expr(
                "CAST(FLOOR((CAST(l_extendedprice AS DOUBLE)"
                " * (1 - CAST(l_discount AS DOUBLE)))"
                " * (1 + CAST(l_tax AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("s_micro")
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        (F.expr(cents("o_totalprice")) * 10000).alias("o_micro"),
    )
    d = o.join(ls, "ok").select(
        (F.col("o_micro") - F.col("s_micro")).alias("d")
    )
    m = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d").cast("bigint").alias("sd_"),
        F.sum(F.col("d").cast("decimal(38,0)") * F.col("d"))
        .cast("double")
        .alias("ss"),
    )
    st = m.select(
        "n",
        (F.col("sd_").cast("double") / F.col("n")).alias("mean_d"),
        F.sqrt(
            (
                F.col("ss")
                - (F.col("sd_").cast("double") / F.col("n"))
                * F.col("sd_").cast("double")
            )
            / (F.col("n") - 1)
        ).alias("sd_d"),
    )
    flagged = d.crossJoin(F.broadcast(st))
    lo = F.col("mean_d") - 1.96 * F.col("sd_d")
    hi = F.col("mean_d") + 1.96 * F.col("sd_d")
    return flagged.groupBy("n", "mean_d", "sd_d").agg(
        F.sum(
            F.when(
                (F.col("d").cast("double") < lo)
                | (F.col("d").cast("double") > hi),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_outside")
    ).select(
        F.col("n").alias("n_orders"),
        F.col("mean_d").alias("mean_diff_micro"),
        F.col("sd_d").alias("sd_diff_micro"),
        lo.alias("loa_lo"),
        hi.alias("loa_hi"),
        "n_outside",
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


@query(
    "agg_ece",
    oracle="""
WITH r AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
         ROW_NUMBER() OVER (
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                    o_orderkey) AS rn,
         NTILE(10) OVER (
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                    o_orderkey) AS bin
  FROM orders
), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
b AS (
  SELECT bin, CAST(SUM(pos) AS BIGINT) AS pos_b,
         CAST(SUM(rn) AS BIGINT) AS ranksum_b
  FROM r GROUP BY bin
)
SELECT (SELECT n FROM nn) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(ABS(pos_b * (SELECT n FROM nn) - ranksum_b)) AS BIGINT)
         AS ece_num,
       CAST(SUM(ABS(pos_b * (SELECT n FROM nn) - ranksum_b)) AS DOUBLE)
         / (SELECT n FROM nn) / (SELECT n FROM nn) AS ece
FROM b
""",
)
def agg_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error of the rank-normalized score
    against the binary label, over the same 10 equal-frequency bins
    as agg_calibration_bins: ECE = sum_b (n_b/N) * |acc_b - conf_b|
    with conf the mean normalized rank. The headline number model
    monitoring dashboards track; isotonic (agg_isotonic_calibration)
    is the FIX, ECE is the ALARM.

    Exactness by algebra, not quantization: with conf_b =
    ranksum_b/(n_b*N) and acc_b = pos_b/n_b, each bin term
    (n_b/N)*|acc_b - conf_b| collapses to |pos_b*N - ranksum_b| / N^2
    — so the WHOLE statistic is one exact bigint numerator
    (pos_b * N <= 2.25e14 at a 100x corpus) over N^2, no per-bin
    float ever summed. Scale shape: one global row-number + NTILE
    pass (two-phase machinery), a 10-row aggregate, one division."""
    from ..plans.global_rank import ntile_expr, with_global_row_number

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(cents("o_totalprice")).alias("sc"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
    )
    numbered, n_total = with_global_row_number(
        o, ["sc", "o_orderkey"], out_col="rn"
    )
    binned = numbered.withColumn("bin", ntile_expr("rn", n_total, 10))
    b = binned.groupBy("bin").agg(
        F.sum("pos").cast("bigint").alias("pos_b"),
        F.sum("rn").cast("bigint").alias("ranksum_b"),
    )
    agg = b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum(
            F.abs(F.col("pos_b") * F.lit(n_total) - F.col("ranksum_b"))
        )
        .cast("bigint")
        .alias("ece_num"),
    )
    return agg.select(
        F.lit(n_total).cast("bigint").alias("n_rows"),
        "n_bins",
        "ece_num",
        (
            F.col("ece_num").cast("double") / F.lit(n_total) / F.lit(n_total)
        ).alias("ece"),
    )


_IPF_PAIRS = 4  # row+column scaling pairs to unroll
_IPF_CUTOFF = "1996-01-01"  # sample = first calendar year of orders


def _raking_oracle() -> str:
    head = f"""
WITH oc AS MATERIALIZED (
  SELECT o.o_orderpriority AS p, r.r_name AS rg, o.o_orderdate AS d
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
), grid AS MATERIALIZED (
  SELECT pp.p, rr.rg
  FROM (SELECT DISTINCT p FROM oc) pp, (SELECT DISTINCT rg FROM oc) rr
), w0 AS MATERIALIZED (
  SELECT g.p, g.rg,
         CAST(COALESCE(s.cnt, 0) * 1000000 AS BIGINT) AS w
  FROM grid g LEFT JOIN (
    SELECT p, rg, COUNT(*) AS cnt FROM oc
    WHERE d < TIMESTAMP '{_IPF_CUTOFF} 00:00:00' GROUP BY p, rg
  ) s ON s.p = g.p AND s.rg = g.rg
), tp AS MATERIALIZED (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS t FROM oc GROUP BY p
), tr AS MATERIALIZED (
  SELECT rg, CAST(COUNT(*) AS BIGINT) AS t FROM oc GROUP BY rg
)"""
    parts = [head]
    prev = "w0"
    for k in range(1, _IPF_PAIRS + 1):
        parts.append(f"""
, wr{k} AS MATERIALIZED (
  SELECT w.p, w.rg,
         CASE WHEN rs.rs = 0 THEN w.w
              ELSE (w.w * ((tp.t * 1000000000000) // rs.rs)) // 1000000
         END AS w
  FROM {prev} w
  JOIN (SELECT p, CAST(SUM(w) AS BIGINT) AS rs FROM {prev} GROUP BY p)
    rs ON rs.p = w.p
  JOIN tp ON tp.p = w.p
), wc{k} AS MATERIALIZED (
  SELECT w.p, w.rg,
         CASE WHEN cs.cs = 0 THEN w.w
              ELSE (w.w * ((tr.t * 1000000000000) // cs.cs)) // 1000000
         END AS w
  FROM wr{k} w
  JOIN (SELECT rg, CAST(SUM(w) AS BIGINT) AS cs FROM wr{k} GROUP BY rg)
    cs ON cs.rg = w.rg
  JOIN tr ON tr.rg = w.rg
)""")
        prev = f"wc{k}"
    parts.append(f"""
SELECT p AS priority, rg AS region, w AS weight_micro
FROM {prev}
""")
    return "".join(parts)


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
    "agg_log_loss",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderpriority AS seg,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), train AS (
  SELECT seg, CAST(SUM(y) AS DOUBLE) / COUNT(*) AS p
  FROM base WHERE o_orderkey % 2 = 0 GROUP BY seg
), test AS (
  SELECT b.seg, t.p,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(b.y) AS BIGINT) AS ny
  FROM base b JOIN train t USING (seg)
  WHERE b.o_orderkey % 2 = 1
  GROUP BY b.seg, t.p
), q AS (
  SELECT seg, n, ny,
         CAST(FLOOR(LN(p) * 1000000 + 0.5) AS BIGINT) AS l1,
         CAST(FLOOR(LN(1 - p) * 1000000 + 0.5) AS BIGINT) AS l0,
         CAST(FLOOR(LN(CAST(ny AS DOUBLE) / n) * 1000000 + 0.5) AS BIGINT)
           AS r1,
         CAST(FLOOR(LN(1 - CAST(ny AS DOUBLE) / n) * 1000000 + 0.5)
              AS BIGINT) AS r0
  FROM test
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_test,
         CAST(SUM(-(ny * l1 + (n - ny) * l0)) AS BIGINT) AS ll_micro,
         CAST(SUM(-(ny * r1 + (n - ny) * r0)) AS BIGINT) AS ref_micro
  FROM q
)
SELECT n_test,
       CAST(ll_micro AS DOUBLE) / 1000000 / n_test AS log_loss,
       CAST(ref_micro AS DOUBLE) / 1000000 / n_test AS log_loss_refitted,
       CAST(1 AS DOUBLE)
         - (CAST(ll_micro AS DOUBLE) / 1000000 / n_test)
           / (CAST(ref_micro AS DOUBLE) / 1000000 / n_test)
         AS skill_vs_refit
FROM tot
""",
)
def agg_log_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-entropy (log loss) of the agg_brier_score segment
    forecast: train-half fulfilment rates score the test half under
    -mean[y ln p + (1-y) ln(1-p)] — the OTHER canonical proper
    scoring rule (Brier is quadratic and bounded; log loss punishes
    confident misses unboundedly), with the same refitted-rate
    reference and skill score so the two keys read side by side.

    Exactness: within a segment every row shares p, so the loss
    collapses to -(ny*ln(p) + (n-ny)*ln(1-p)); each ln is quantized
    ONCE at 1e-6 (the corpus_heaps_law discipline — both engines see
    the identical double p), making every per-segment term an exact
    bigint micro-nat product and the total an order-free integer
    sum — NO float fold anywhere, unlike brier's ordered fold.
    Scale shape: two hash aggregates to 5 rows, one broadcast join,
    a 1-row sum."""
    o = load(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("seg"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    train = (
        base.filter(F.col("o_orderkey") % 2 == 0)
        .groupBy("seg")
        .agg((F.sum("y").cast("double") / F.count(F.lit(1))).alias("p"))
    )
    test = (
        base.filter(F.col("o_orderkey") % 2 == 1)
        .join(F.broadcast(train), "seg")
        .groupBy("seg", "p")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("ny"),
        )
    )

    def lnq(col):
        return F.floor(F.log(col) * F.lit(1000000) + F.lit(0.5)).cast(
            "bigint"
        )

    rate = F.col("ny").cast("double") / F.col("n")
    terms = test.select(
        "n",
        "ny",
        lnq(F.col("p")).alias("l1"),
        lnq(F.lit(1) - F.col("p")).alias("l0"),
        lnq(rate).alias("r1"),
        lnq(F.lit(1) - rate).alias("r0"),
    )
    tot = terms.agg(
        F.sum("n").cast("bigint").alias("n_test"),
        F.sum(
            -(F.col("ny") * F.col("l1") + (F.col("n") - F.col("ny")) * F.col("l0"))
        )
        .cast("bigint")
        .alias("ll_micro"),
        F.sum(
            -(F.col("ny") * F.col("r1") + (F.col("n") - F.col("ny")) * F.col("r0"))
        )
        .cast("bigint")
        .alias("ref_micro"),
    )
    ll = F.col("ll_micro").cast("double") / F.lit(1000000) / F.col("n_test")
    ref = F.col("ref_micro").cast("double") / F.lit(1000000) / F.col("n_test")
    return tot.select(
        "n_test",
        ll.alias("log_loss"),
        ref.alias("log_loss_refitted"),
        (F.lit(1).cast("double") - ll / ref).alias("skill_vs_refit"),
    )


@query(
    "agg_fleiss_kappa",
    oracle="""
WITH per AS (
  SELECT l_orderkey,
         CAST(COUNT(*) AS BIGINT) AS nl,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS cr,
         CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT)
           AS ca,
         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT)
           AS cn
  FROM lineitem GROUP BY 1
), four AS (
  SELECT * FROM per WHERE nl = 4
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cr * cr + ca * ca + cn * cn) AS BIGINT) AS s,
         CAST(SUM(cr) AS BIGINT) AS tr,
         CAST(SUM(ca) AS BIGINT) AS ta,
         CAST(SUM(cn) AS BIGINT) AS tn
  FROM four
), st AS (
  SELECT n,
         CAST(s - 4 * n AS DOUBLE) / CAST(12 * n AS DOUBLE) AS p_bar,
         CAST(tr * tr + ta * ta + tn * tn AS DOUBLE)
           / CAST(16 * n * n AS DOUBLE) AS p_e
  FROM m
)
SELECT n AS n_items,
       p_bar, p_e,
       (p_bar - p_e) / (1 - p_e) AS kappa
FROM st
""",
)
def agg_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa — chance-corrected agreement for a FIXED panel
    of m raters per item, generalizing agg_cohens_kappa's two-rater
    form: items are orders with exactly 4 lineitems, the 4 lines are
    the 'raters', and the 3 return-flag states are the categories
    (do an order's lines agree on its return outcome beyond chance?).
    P_i = (sum_j n_ij^2 - m) / (m(m-1)), kappa =
    (P_bar - P_e)/(1 - P_e) with P_e from pooled category shares.

    Exactness: every quantity is an exact bigint (per-item category
    counts, their squares <= 16, pooled totals and THEIR squares —
    ~6e13 at a 100x corpus, inside int64); P_bar, P_e and kappa are
    fixed double expressions over those integers. Scale shape: one
    hash aggregate over lineitem to O(orders) rows, a second to one
    row."""
    per = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nl"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("cr"),
            F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0))
            .cast("bigint")
            .alias("ca"),
            F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
            .cast("bigint")
            .alias("cn"),
        )
        .filter(F.col("nl") == 4)
    )
    m = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.col("cr") * F.col("cr")
            + F.col("ca") * F.col("ca")
            + F.col("cn") * F.col("cn")
        )
        .cast("bigint")
        .alias("s"),
        F.sum("cr").cast("bigint").alias("tr"),
        F.sum("ca").cast("bigint").alias("ta"),
        F.sum("cn").cast("bigint").alias("tn"),
    )
    p_bar = (F.col("s") - 4 * F.col("n")).cast("double") / (
        12 * F.col("n")
    ).cast("double")
    p_e = (
        F.col("tr") * F.col("tr")
        + F.col("ta") * F.col("ta")
        + F.col("tn") * F.col("tn")
    ).cast("double") / (16 * F.col("n") * F.col("n")).cast("double")
    return m.select(
        F.col("n").alias("n_items"),
        p_bar.alias("p_bar"),
        p_e.alias("p_e"),
        ((p_bar - p_e) / (F.lit(1) - p_e)).alias("kappa"),
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


# Portable Knuth multiplicative hash on a bigint key (the
# sample_hash_split discipline), emitting a 0..99 pseudo-bucket.
def _kbucket(key: str) -> str:
    return f"((({key}) % 2147483648) * 2654435761 % 4294967296) % 100"


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


_JT_GROUPS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _jt_prefix_cte(t: int) -> str:
    g = _JT_GROUPS[t]
    return f"""p{t} AS (
  SELECT g, ROW_NUMBER() OVER (ORDER BY sc, k) AS rp,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY sc, k) AS i
  FROM s WHERE g <= '{g}'
), c{t} AS (
  SELECT CAST(SUM(rp - i) AS BIGINT) AS c FROM p{t} WHERE g = '{g}'
)"""


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

    Exactness: J collapses to sum(prefix_rank - within_rank) over
    each group's rows — the identity sum_{i<j} U_ij =
    sum_b (rank of b among groups <= its own, minus its
    within-group rank) — so J is an exact bigint from EIGHT passes
    of the two-phase global-rank machinery (4 prefix unions + 4
    within-group, all range-bucketed by the score); the null
    moments go through HUGEINT/python-int (~7e21 at 100x) with the
    proven correctly-rounded double conversions. Scale shape: 8
    rank passes + key-equi-joins, one hash aggregate."""
    from ..plans.global_rank import with_global_row_number

    base = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.expr(cents("o_totalprice")).alias("sc"),
        F.col("o_orderkey").alias("k"),
    )
    j_total = 0
    for t in range(1, 5):
        gt = _JT_GROUPS[t]
        sub = base.filter(F.col("g") <= gt)
        rp_df, _ = with_global_row_number(sub, ["sc", "k"], out_col="rp")
        own = rp_df.filter(F.col("g") == gt).select("k", "rp")
        i_df, _ = with_global_row_number(
            base.filter(F.col("g") == gt), ["sc", "k"], out_col="i"
        )
        contrib = (
            own.join(i_df.select("k", "i"), "k")
            .agg(F.sum(F.col("rp") - F.col("i")).cast("bigint").alias("c"))
            .collect()[0]["c"]
        )
        j_total += int(contrib)
    cnts = {
        r["g"]: int(r["n"])
        for r in base.groupBy("g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    }
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


RDD_CUTOFF_C = 15_000_000  # $150k in cents
RDD_BANDWIDTH = 5_000_000  # +-$50k


def _rdd_side_sql(name: str, lo: str, hi: str) -> str:
    return f"""{name} AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(u) AS BIGINT) AS su,
         CAST(CAST(SUM(CAST(u AS HUGEINT) * u) AS VARCHAR) AS DOUBLE) AS su2,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(u * y) AS BIGINT) AS suy
  FROM base WHERE u >= {lo} AND u < {hi}
)"""


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
    "agg_fairness_report",
    bounded_cross="1-row extremes scalar onto the 5-group table",
    oracle="""
WITH pred AS (
  SELECT c.c_mktsegment AS grp,
         CASE WHEN o.o_totalprice >
              (SELECT median(o_totalprice) FROM orders) THEN 1 ELSE 0 END
           AS yhat,
         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), g AS (
  SELECT grp,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(yhat) AS BIGINT) AS npos,
         CAST(SUM(CASE WHEN y = 1 AND yhat = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS tp,
         CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p,
         CAST(SUM(CASE WHEN y = 0 AND yhat = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS fp,
         CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg
  FROM pred GROUP BY grp
), ext AS (
  SELECT MAX(CAST(npos AS DOUBLE) / n) AS mx_sel,
         MIN(CAST(npos AS DOUBLE) / n) AS mn_sel,
         MAX(CAST(tp AS DOUBLE) / p) AS mx_tpr,
         MIN(CAST(tp AS DOUBLE) / p) AS mn_tpr
  FROM g
)
SELECT g.grp,
       g.n,
       CAST(g.npos AS DOUBLE) / g.n AS selection_rate,
       CAST(g.tp AS DOUBLE) / g.p AS tpr,
       CAST(g.fp AS DOUBLE) / g.neg AS fpr,
       ext.mx_sel - ext.mn_sel AS demographic_parity_gap,
       ext.mx_tpr - ext.mn_tpr AS equal_opportunity_gap,
       ext.mn_sel / ext.mx_sel AS disparate_impact_ratio
FROM g, ext
""",
)
def agg_fairness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-fairness audit of a threshold classifier across the five
    customer market segments: per-group selection rate, TPR and FPR
    (classifier = order value above the corpus median; outcome =
    fulfilment), plus the three standard gap metrics every
    responsible-AI review reports — demographic-parity gap,
    equal-opportunity (TPR) gap, and the four-fifths
    disparate-impact ratio. Completes the eval family
    (agg_classifier_eval accuracy, agg_roc_auc ranking, agg_ece
    calibration; this audits GROUP SKEW).

    Exactness: the threshold is the exact-median order statistic
    (both engines' median of the same doubles — 2-dp values, exact
    compare); all confusion cells are exact integer counts; rates
    and gaps are fixed double expressions with the extremes taken
    over the bounded 5-group table. Scale shape: one broadcast-able
    dimension join, one hash aggregate to 5 rows, a bounded extreme
    scan, a declared 1-row cross."""
    o = load(spark, sf_dir, "orders")
    med = o.agg(F.expr("median(o_totalprice)").alias("m")).collect()[0]["m"]
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("grp")
    )
    pred = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        "grp",
        F.when(F.col("o_totalprice") > F.lit(med), 1).otherwise(0).alias(
            "yhat"
        ),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    g = pred.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("yhat").cast("bigint").alias("npos"),
        F.sum(F.when((F.col("y") == 1) & (F.col("yhat") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("p"),
        F.sum(F.when((F.col("y") == 0) & (F.col("yhat") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("neg"),
    )
    sel = F.col("npos").cast("double") / F.col("n")
    tpr = F.col("tp").cast("double") / F.col("p")
    ext = g.agg(
        F.max(sel).alias("mx_sel"),
        F.min(sel).alias("mn_sel"),
        F.max(tpr).alias("mx_tpr"),
        F.min(tpr).alias("mn_tpr"),
    )
    # bounded: 1-row extremes scalar onto the 5-group table
    j = g.crossJoin(F.broadcast(ext))
    return j.select(
        "grp",
        "n",
        sel.alias("selection_rate"),
        tpr.alias("tpr"),
        (F.col("fp").cast("double") / F.col("neg")).alias("fpr"),
        (F.col("mx_sel") - F.col("mn_sel")).alias("demographic_parity_gap"),
        (F.col("mx_tpr") - F.col("mn_tpr")).alias("equal_opportunity_gap"),
        (F.col("mn_sel") / F.col("mx_sel")).alias("disparate_impact_ratio"),
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
    "agg_cronbach_alpha",
    oracle="""
WITH per AS (
  SELECT l_orderkey,
         CAST(COUNT(*) AS BIGINT) AS nl,
         CAST(SUM(CASE WHEN l_linenumber = 1
                  THEN CAST(round(l_extendedprice * 100) AS BIGINT) END)
              AS BIGINT) AS i1,
         CAST(SUM(CASE WHEN l_linenumber = 2
                  THEN CAST(round(l_extendedprice * 100) AS BIGINT) END)
              AS BIGINT) AS i2,
         CAST(SUM(CASE WHEN l_linenumber = 3
                  THEN CAST(round(l_extendedprice * 100) AS BIGINT) END)
              AS BIGINT) AS i3,
         CAST(SUM(CASE WHEN l_linenumber = 4
                  THEN CAST(round(l_extendedprice * 100) AS BIGINT) END)
              AS BIGINT) AS i4
  FROM lineitem GROUP BY 1
), four AS (
  SELECT i1, i2, i3, i4, i1 + i2 + i3 + i4 AS tot
  FROM per WHERE nl = 4
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(i1) AS BIGINT) AS s1,
         CAST(CAST(SUM(CAST(i1 AS HUGEINT) * i1) AS VARCHAR) AS DOUBLE)
           AS ss1,
         CAST(SUM(i2) AS BIGINT) AS s2,
         CAST(CAST(SUM(CAST(i2 AS HUGEINT) * i2) AS VARCHAR) AS DOUBLE)
           AS ss2,
         CAST(SUM(i3) AS BIGINT) AS s3,
         CAST(CAST(SUM(CAST(i3 AS HUGEINT) * i3) AS VARCHAR) AS DOUBLE)
           AS ss3,
         CAST(SUM(i4) AS BIGINT) AS s4,
         CAST(CAST(SUM(CAST(i4 AS HUGEINT) * i4) AS VARCHAR) AS DOUBLE)
           AS ss4,
         CAST(SUM(tot) AS BIGINT) AS st,
         CAST(CAST(SUM(CAST(tot AS HUGEINT) * tot) AS VARCHAR) AS DOUBLE)
           AS sst
  FROM four
), v AS (
  SELECT n,
         (ss1 - (CAST(s1 AS DOUBLE) / n) * s1) / (n - 1)
           + (ss2 - (CAST(s2 AS DOUBLE) / n) * s2) / (n - 1)
           + (ss3 - (CAST(s3 AS DOUBLE) / n) * s3) / (n - 1)
           + (ss4 - (CAST(s4 AS DOUBLE) / n) * s4) / (n - 1) AS sum_vi,
         (sst - (CAST(st AS DOUBLE) / n) * st) / (n - 1) AS v_tot
  FROM m
)
SELECT n AS n_orders,
       sum_vi / 10000 AS sum_item_var_dollars2,
       v_tot / 10000 AS total_var_dollars2,
       (4.0 / 3.0) * (1 - sum_vi / v_tot) AS cronbach_alpha
FROM v
""",
)
def agg_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha over 4-line orders, treating the four line
    prices (by line number) as a 4-item scale and the order total as
    the scale score: alpha = k/(k-1) * (1 - sum item variances /
    total variance) — the internal-consistency reliability
    coefficient (psychometrics' most-reported number), and the
    within-basket coherence view next to agg_fleiss_kappa's
    categorical agreement on the same 4-line fixture.

    Exactness: all five variance pairs use exact integer cents with
    HUGEINT/decimal(38) squares and the gamma_mom (ss - mu*s)
    expression; the item-variance sum is a FIXED four-term
    expression (k is a constant, not a fold). One hash aggregate
    over lineitem, one 1-row reduction."""
    c = F.expr(cents("l_extendedprice"))
    per = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nl"),
            *[
                F.sum(F.when(F.col("l_linenumber") == k, c))
                .cast("bigint")
                .alias(f"i{k}")
                for k in (1, 2, 3, 4)
            ],
        )
        .filter(F.col("nl") == 4)
        .withColumn(
            "tot",
            F.col("i1") + F.col("i2") + F.col("i3") + F.col("i4"),
        )
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for k in ("i1", "i2", "i3", "i4", "tot"):
        aggs.append(F.sum(k).cast("bigint").alias(f"s_{k}"))
        aggs.append(
            F.sum(F.col(k).cast("decimal(38,0)") * F.col(k))
            .cast("double")
            .alias(f"ss_{k}")
        )
    m = per.agg(*aggs)

    def var(k):
        return (
            F.col(f"ss_{k}")
            - (F.col(f"s_{k}").cast("double") / F.col("n")) * F.col(f"s_{k}")
        ) / (F.col("n") - 1)

    sum_vi = var("i1") + var("i2") + var("i3") + var("i4")
    v_tot = var("tot")
    return m.select(
        F.col("n").alias("n_orders"),
        (sum_vi / 10000).alias("sum_item_var_dollars2"),
        (v_tot / 10000).alias("total_var_dollars2"),
        ((F.lit(4.0) / F.lit(3.0)) * (F.lit(1) - sum_vi / v_tot)).alias(
            "cronbach_alpha"
        ),
    )


@query(
    "agg_lmg_importance",
    oracle="""
WITH base AS (
  SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) AS y,
         l.nl AS x1,
         CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS x2
  FROM orders o
  JOIN (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS nl
        FROM lineitem GROUP BY 1) l ON l.l_orderkey = o.o_orderkey
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x1) AS BIGINT) AS s1,
         CAST(SUM(x1 * x1) AS BIGINT) AS s11,
         CAST(SUM(x2) AS BIGINT) AS s2,
         CAST(SUM(x1 * x2) AS BIGINT) AS s12,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(CAST(SUM(CAST(x1 AS HUGEINT) * y) AS VARCHAR) AS DOUBLE)
           AS s1y,
         CAST(SUM(x2 * y) AS BIGINT) AS s2y,
         CAST(CAST(SUM(CAST(y AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) AS syy
  FROM base
), c AS (
  SELECT n,
         s11 - CAST(s1 AS DOUBLE) * s1 / n AS c11,
         CAST(s2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n AS c22,
         s12 - CAST(s1 AS DOUBLE) * s2 / n AS c12,
         s1y - CAST(s1 AS DOUBLE) * sy / n AS c1y,
         CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy / n AS c2y,
         syy - CAST(sy AS DOUBLE) * sy / n AS cyy
  FROM m
), r AS (
  SELECT n,
         (c1y * c1y) / (c11 * cyy) AS r1,
         (c2y * c2y) / (c22 * cyy) AS r2,
         ((c22 * c1y * c1y - 2 * c12 * c1y * c2y + c11 * c2y * c2y)
          / (c11 * c22 - c12 * c12)) / cyy AS r12
  FROM c
)
SELECT n AS n_orders, r1 AS r2_x1_alone, r2 AS r2_x2_alone,
       r12 AS r2_full,
       (r1 + (r12 - r2)) / 2 AS lmg_x1,
       (r2 + (r12 - r1)) / 2 AS lmg_x2
FROM r
""",
)
def agg_lmg_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LMG / Shapley R^2 decomposition for the two order-value
    drivers (basket size x1, urgency x2): each driver's importance
    is its R^2 contribution averaged over both entry orders —
    lmg_1 = [R^2(1) + (R^2(12) - R^2(2))]/2 — the standard
    'relative importance' answer when drivers are correlated and
    raw R^2s double-count (the regression twin of
    attribution_shapley's touchpoint game; x2^2 = x2 keeps every
    moment exact).

    Exactness: all centered second moments come from exact integer
    sums (y products through HUGEINT/decimal(38)); the three R^2
    values (two simple, one two-variable in closed form) and the
    two LMG shares are fixed double expressions; the LMG shares
    sum to R^2_full by construction (pinned in tests with a numpy
    replay, per the closed-form rule). ONE hash aggregate."""
    nl = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x1"))
    )
    base = (
        load(spark, sf_dir, "orders")
        .join(nl, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.expr(cents("o_totalprice")).alias("y"),
            "x1",
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("x2"),
        )
    )
    m = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("s1"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("s11"),
        F.sum("x2").cast("bigint").alias("s2"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("s12"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x1").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("bigint").alias("s2y"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("syy"),
    )
    n = F.col("n")
    c11 = F.col("s11") - F.col("s1").cast("double") * F.col("s1") / n
    c22 = F.col("s2").cast("double") - F.col("s2").cast("double") * F.col("s2") / n
    c12 = F.col("s12") - F.col("s1").cast("double") * F.col("s2") / n
    c1y = F.col("s1y") - F.col("s1").cast("double") * F.col("sy") / n
    c2y = F.col("s2y").cast("double") - F.col("s2").cast("double") * F.col("sy") / n
    cyy = F.col("syy") - F.col("sy").cast("double") * F.col("sy") / n
    r1 = (c1y * c1y) / (c11 * cyy)
    r2 = (c2y * c2y) / (c22 * cyy)
    r12 = (
        (c22 * c1y * c1y - 2 * c12 * c1y * c2y + c11 * c2y * c2y)
        / (c11 * c22 - c12 * c12)
    ) / cyy
    return m.select(
        n.alias("n_orders"),
        r1.alias("r2_x1_alone"),
        r2.alias("r2_x2_alone"),
        r12.alias("r2_full"),
        ((r1 + (r12 - r2)) / 2).alias("lmg_x1"),
        ((r2 + (r12 - r1)) / 2).alias("lmg_x2"),
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

    Exactness: both rank passes use the two-phase global-rank
    machinery (score-bucketed); the tie-pair table is one hash
    aggregate of exact products; U and both effect sizes are fixed
    double expressions. Scale shape: two rank passes, two 1-row
    reductions."""
    from ..plans.global_rank import with_global_row_number

    s = load(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("tr"),
        F.expr(cents("o_totalprice")).alias("c"),
        "o_orderkey",
    )
    ra, _ = with_global_row_number(s, ["c", "tr", "o_orderkey"], out_col="r")
    t1, n_t = with_global_row_number(
        ra.filter(F.col("tr") == 1), ["c", "o_orderkey"], out_col="i"
    )
    le = int(
        t1.agg(F.sum(F.col("r") - F.col("i")).cast("bigint").alias("le"))
        .collect()[0]["le"]
    )
    eq = int(
        s.groupBy("c")
        .agg(
            F.sum("tr").cast("bigint").alias("nt"),
            F.sum(1 - F.col("tr")).cast("bigint").alias("nc"),
        )
        .agg(F.sum(F.col("nt") * F.col("nc")).cast("bigint").alias("eq"))
        .collect()[0]["eq"]
    )
    n_c = s.filter(F.col("tr") == 0).count()
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
    "agg_kendall_w",
    oracle="""
WITH cells AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         o_orderpriority AS prio,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
), rk AS (
  SELECT yr, prio,
         CAST(ROW_NUMBER() OVER (PARTITION BY yr
              ORDER BY CAST(s AS DOUBLE) / n, prio) AS BIGINT) AS r
  FROM cells
), colsum AS (
  SELECT prio, CAST(SUM(r) AS BIGINT) AS rj FROM rk GROUP BY prio
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(rj) AS BIGINT) AS tot,
         CAST(SUM(rj * rj) AS BIGINT) AS ss,
         (SELECT CAST(COUNT(DISTINCT yr) AS BIGINT) FROM rk) AS b
  FROM colsum
)
SELECT b AS n_blocks, k AS n_treatments,
       (12.0 * (CAST(ss AS DOUBLE) - CAST(tot AS DOUBLE) * tot / k))
         / (CAST(b AS DOUBLE) * b * k * (k * k - 1)) AS kendall_w,
       CAST(b AS DOUBLE) * (k - 1)
         * ((12.0 * (CAST(ss AS DOUBLE) - CAST(tot AS DOUBLE) * tot / k))
            / (CAST(b AS DOUBLE) * b * k * (k * k - 1))) AS friedman_chi2
FROM m
""",
)
def agg_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance W — do the order YEARS
    agree on how the five priorities rank by mean value?
    W = 12 S / (b^2 k (k^2 - 1)) over rank-column sums (S their
    centered square sum), with the Friedman chi2 = b(k-1)W link
    reported — the agreement number behind 'is the ranking stable
    across periods?', the multi-rater RANKING complement of
    agg_fleiss_kappa's categorical agreement, on the same blocked
    frame as agg_page_trend (Page asks ORDERED trend; W asks ANY
    consistent ranking).

    Exactness: within-block ranks are deterministic; column sums,
    their squares and S are exact integers; W and the chi2 are
    fixed double expressions. One 35-cell aggregate, bounded
    windows."""
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
    wb = Window.partitionBy("yr").orderBy(
        F.col("s").cast("double") / F.col("n"), "prio"
    )
    rk = cells.select(
        "yr", "prio", F.row_number().over(wb).cast("bigint").alias("r")
    )
    colsum = rk.groupBy("prio").agg(F.sum("r").cast("bigint").alias("rj"))
    b = rk.select("yr").distinct().count()
    m = colsum.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("rj").cast("bigint").alias("tot"),
        F.sum(F.col("rj") * F.col("rj")).cast("bigint").alias("ss"),
    )
    k_d = F.col("k").cast("double")
    s_c = F.col("ss").cast("double") - F.col("tot").cast("double") * F.col(
        "tot"
    ) / F.col("k")
    w = (12.0 * s_c) / (
        F.lit(float(b)) * b * k_d * (k_d * k_d - 1)
    )
    return m.select(
        F.lit(b).cast("bigint").alias("n_blocks"),
        F.col("k").alias("n_treatments"),
        w.alias("kendall_w"),
        (F.lit(float(b)) * (k_d - 1) * w).alias("friedman_chi2"),
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
    "agg_weighted_kappa",
    bounded_cross="3x3 margin grid + 1-row total scalar",
    oracle="""
WITH base AS (
  SELECT CASE WHEN o.o_totalprice < 100000 THEN 0
              WHEN o.o_totalprice < 300000 THEN 1 ELSE 2 END AS a,
         CASE WHEN l.nl <= 2 THEN 0 WHEN l.nl <= 4 THEN 1 ELSE 2 END AS b
  FROM orders o
  JOIN (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS nl
        FROM lineitem GROUP BY 1) l ON l.l_orderkey = o.o_orderkey
), cells AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY a, b
), ra AS (SELECT a, CAST(SUM(n) AS BIGINT) AS r FROM cells GROUP BY a),
cb AS (SELECT b, CAST(SUM(n) AS BIGINT) AS c FROM cells GROUP BY b),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cells),
num AS (
  SELECT CAST(SUM(ABS(a - b) * n) AS BIGINT) AS obs FROM cells
), den AS (
  SELECT CAST(SUM(ABS(ra.a - cb.b) * ra.r * cb.c) AS BIGINT) AS expd
  FROM ra, cb
)
SELECT tot.nn AS n_orders,
       CAST(num.obs AS DOUBLE) / tot.nn AS mean_abs_disagreement,
       1 - CAST(tot.nn AS DOUBLE) * num.obs / den.expd AS weighted_kappa
FROM tot, num, den
""",
)
def agg_weighted_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-weighted Cohen's kappa between two ORDINAL raters —
    the order-value tercile (fixed thresholds) and the basket-size
    tercile: kappa_w = 1 - N sum|i-j| n_ij / sum|i-j| r_i c_j, the
    agreement coefficient that charges partial credit for
    near-misses (plain agg_cohens_kappa treats off-by-one and
    off-by-two identically — wrong for ordinal scales). With
    linear weights BOTH the observed and expected disagreement are
    EXACT integers, so kappa is one division.

    Exactness: fixed literal bucket thresholds (no rank pass
    needed), exact 3x3 cells/margins, exact integer numerator and
    denominator (~1e16 at 100x — inside int64... r*c reaches
    ~2e14 * 3; the ABS-weighted sum stays ~1e15). Scale shape: one
    lineitem count aggregate, one 9-cell aggregate, bounded margin
    grids."""
    nl = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nl"))
    )
    base = (
        load(spark, sf_dir, "orders")
        .join(nl, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.when(F.col("o_totalprice") < 100000, 0)
            .when(F.col("o_totalprice") < 300000, 1)
            .otherwise(2)
            .alias("a"),
            F.when(F.col("nl") <= 2, 0)
            .when(F.col("nl") <= 4, 1)
            .otherwise(2)
            .alias("b"),
        )
    )
    cells = base.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    ra = cells.groupBy("a").agg(F.sum("n").cast("bigint").alias("r"))
    cb = cells.groupBy("b").agg(F.sum("n").cast("bigint").alias("c"))
    # one lazy agg over cells for nn+obs, the bounded 3x3 margin grid
    # for expd, crossJoined into a single 1-row plan (the
    # agg_ordinal_association pattern) — no driver-side collect()s
    no = cells.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum(F.abs(F.col("a") - F.col("b")) * F.col("n"))
        .cast("bigint")
        .alias("obs"),
    )
    ed = ra.crossJoin(F.broadcast(cb)).agg(
        F.sum(F.abs(F.col("a") - F.col("b")) * F.col("r") * F.col("c"))
        .cast("bigint")
        .alias("expd")
    )
    one = no.crossJoin(F.broadcast(ed))
    return one.select(
        F.col("nn").alias("n_orders"),
        (F.col("obs").cast("double") / F.col("nn")).alias(
            "mean_abs_disagreement"
        ),
        (
            F.lit(1)
            - F.col("nn").cast("double") * F.col("obs") / F.col("expd")
        ).alias("weighted_kappa"),
    )


@query(
    "agg_ordinal_association",
    bounded_cross="9x9 ordinal cell-pair grid + margin scalars",
    oracle="""
WITH base AS (
  SELECT CASE WHEN o.o_totalprice < 100000 THEN 0
              WHEN o.o_totalprice < 300000 THEN 1 ELSE 2 END AS a,
         CASE WHEN l.nl <= 2 THEN 0 WHEN l.nl <= 4 THEN 1 ELSE 2 END AS b
  FROM orders o
  JOIN (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS nl
        FROM lineitem GROUP BY 1) l ON l.l_orderkey = o.o_orderkey
), cells AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY a, b
), pair AS (
  SELECT CAST(SUM(CASE WHEN (x.a < y.a AND x.b < y.b)
                         OR (x.a > y.a AND x.b > y.b)
                       THEN x.n * y.n ELSE 0 END) AS BIGINT) AS c2,
         CAST(SUM(CASE WHEN (x.a < y.a AND x.b > y.b)
                         OR (x.a > y.a AND x.b < y.b)
                       THEN x.n * y.n ELSE 0 END) AS BIGINT) AS d2,
         CAST(SUM(CASE WHEN x.a = y.a AND x.b <> y.b
                       THEN x.n * y.n ELSE 0 END) AS BIGINT) AS ty2,
         CAST(SUM(CASE WHEN x.b = y.b AND x.a <> y.a
                       THEN x.n * y.n ELSE 0 END) AS BIGINT) AS tx2
  FROM cells x, cells y
)
SELECT CAST(c2 // 2 AS BIGINT) AS concordant,
       CAST(d2 // 2 AS BIGINT) AS discordant,
       CAST(c2 - d2 AS DOUBLE) / (c2 + d2) AS goodman_kruskal_gamma,
       CAST(c2 - d2 AS DOUBLE) / (c2 + d2 + ty2) AS somers_d_yx,
       CAST(c2 - d2 AS DOUBLE)
         / sqrt(CAST(c2 + d2 + ty2 AS DOUBLE) * (c2 + d2 + tx2))
         AS kendall_tau_b
FROM pair
""",
)
def agg_ordinal_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ordinal-association triple — Goodman-Kruskal gamma,
    Somers' D(y|x) and Kendall's tau-b — between the order-value
    and basket-size terciles, all from ONE bounded 9x9 cell-pair
    grid: gamma ignores ties (upper bound), Somers' D charges ties
    on the dependent only (the asymmetric regression-flavored one,
    and the c-statistic's cousin), tau-b charges both. Reading the
    three together is how categorical-data analysis actually
    reports ordinal association; agg_kendall_tau gives the raw-data
    tau, this gives the contingency-table family.

    Exactness: concordant/discordant/tie pair counts are exact
    integer sums of cell products over the 81-pair grid (~3e15 at
    100x — inside int64); the three coefficients are fixed double
    expressions. Scale shape: one 9-cell aggregate, a bounded
    81-pair fold."""
    nl = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nl"))
    )
    base = (
        load(spark, sf_dir, "orders")
        .join(nl, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.when(F.col("o_totalprice") < 100000, 0)
            .when(F.col("o_totalprice") < 300000, 1)
            .otherwise(2)
            .alias("a"),
            F.when(F.col("nl") <= 2, 0)
            .when(F.col("nl") <= 4, 1)
            .otherwise(2)
            .alias("b"),
        )
    )
    cells = base.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    x = cells.select(
        F.col("a").alias("xa"), F.col("b").alias("xb"), F.col("n").alias("xn")
    )
    y = cells.select(
        F.col("a").alias("ya"), F.col("b").alias("yb"), F.col("n").alias("yn")
    )
    # bounded: 9x9 cell-pair grid
    grid = x.crossJoin(F.broadcast(y))
    prod = F.col("xn") * F.col("yn")
    conc = ((F.col("xa") < F.col("ya")) & (F.col("xb") < F.col("yb"))) | (
        (F.col("xa") > F.col("ya")) & (F.col("xb") > F.col("yb"))
    )
    disc = ((F.col("xa") < F.col("ya")) & (F.col("xb") > F.col("yb"))) | (
        (F.col("xa") > F.col("ya")) & (F.col("xb") < F.col("yb"))
    )
    tya = (F.col("xa") == F.col("ya")) & (F.col("xb") != F.col("yb"))
    txb = (F.col("xb") == F.col("yb")) & (F.col("xa") != F.col("ya"))
    pair = grid.agg(
        F.sum(F.when(conc, prod).otherwise(0)).cast("bigint").alias("c2"),
        F.sum(F.when(disc, prod).otherwise(0)).cast("bigint").alias("d2"),
        F.sum(F.when(tya, prod).otherwise(0)).cast("bigint").alias("ty2"),
        F.sum(F.when(txb, prod).otherwise(0)).cast("bigint").alias("tx2"),
    )
    cd = (F.col("c2") - F.col("d2")).cast("double")
    return pair.select(
        F.expr("c2 div 2").alias("concordant"),
        F.expr("d2 div 2").alias("discordant"),
        (cd / (F.col("c2") + F.col("d2"))).alias("goodman_kruskal_gamma"),
        (cd / (F.col("c2") + F.col("d2") + F.col("ty2"))).alias(
            "somers_d_yx"
        ),
        (
            cd
            / F.sqrt(
                (F.col("c2") + F.col("d2") + F.col("ty2")).cast("double")
                * (F.col("c2") + F.col("d2") + F.col("tx2"))
            )
        ).alias("kendall_tau_b"),
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
