"""More classic TPC-H query patterns (Q4 / Q6 / Q12 / Q14 / Q17 /
Q18 / Q19), adapted to the fixture columns (SURVEY.md §1.4 — the
fixtures lack l_shipmode / l_commitdate / l_receiptdate / partsupp,
so the EXISTS / conditional-count predicates are re-targeted onto
columns that exist; the *query shapes* — semi-join count, selective
scan-agg, conditional two-way counts, conditional-share-of-total,
correlated per-group average, having-on-agg join-back, disjunctive
multi-range predicate — are the TPC-H ones).

Every money/quantity aggregate goes through the exact integer-cents
discipline (registry docstring) so the DuckDB hash matches
bit-for-bit; integer counts are exact by construction.

Plan notes: Q4 = broadcast-able semi join (distinct orderkeys of
returned lineitems is small) then partial+final count; Q6 is the
poster child for scan-side pushdown — predicate and 3-column pruning
reach the parquet scan, the agg is a single partial+final over a
pre-filtered scan; Q17 computes the per-part average ONCE as a
shuffled agg and broadcasts it back against the (brand-filtered,
hence tiny) fact side; Q18 aggregates lineitem first (the having
filter kills most groups before any join), then joins the survivors
back to orders/customer with broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load
from .aggregates import cents, dsum, dsum2, duck_dsum, duck_dsum2


@query(
    "tpch_q4",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority-checking pattern (TPC-H Q4): count orders per
    priority that have >=1 qualifying lineitem, one quarter.
    (Fixture adaptation: the qualifying predicate is l_returnflag='R'
    — there is no commitdate/receiptdate pair.)"""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q6",
    oracle=f"""
SELECT (CAST(SUM({cents('l_extendedprice')} * {cents('l_discount')}) AS DOUBLE)
        / 10000) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue-change pattern (TPC-H Q6): single selective
    scan + global agg. The predicate and the 4-column projection both
    push into the parquet scan (tests/test_plans.py pins this); the
    sum is exact integer cents x cents / 1e4."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.expr(
            f"CAST(SUM({cents('l_extendedprice')} * {cents('l_discount')}) AS DOUBLE)"
            " / 10000"
        ).alias("revenue")
    )


@query(
    "tpch_q12",
    oracle="""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
""",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-mode-priority pattern (TPC-H Q12): conditional two-way
    counts of order priorities per lineitem category, one year.
    (Fixture adaptation: grouped by l_linestatus — no l_shipmode.)"""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "tpch_q14",
    oracle=f"""
SELECT (100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                   THEN {cents('l.l_extendedprice')} * (100 - {cents('l.l_discount')})
                   ELSE 0 END) AS DOUBLE)
        / CAST(SUM({cents('l.l_extendedprice')} * (100 - {cents('l.l_discount')}))
               AS DOUBLE)) AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
  AND l.l_shipdate < TIMESTAMP '1997-10-01'
""",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-effect pattern (TPC-H Q14): promo share of revenue,
    one month. part is broadcast; numerator and denominator are exact
    integer-cents sums, the final division is the identical IEEE op in
    both engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = F.broadcast(load(spark, sf_dir, "part"))
    prod = f"{cents('l_extendedprice')} * (100 - {cents('l_discount')})"
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.expr(
                f"100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {prod} ELSE 0 END)"
                f" AS DOUBLE) / CAST(SUM({prod}) AS DOUBLE)"
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_q17",
    oracle=f"""
WITH pa AS (
  SELECT l_partkey,
         CAST(SUM({cents('l_quantity')}) AS DOUBLE) / 100 / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT (CAST(SUM({cents('l.l_extendedprice')}) AS DOUBLE) / 100 / 7.0)
       AS avg_yearly
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13' AND l.l_quantity < 0.4 * pa.avg_qty
""",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order-revenue pattern (TPC-H Q17): lineitems
    below 40% of their part's average quantity, one brand. The
    correlated subquery is decorrelated into one per-part agg that is
    computed once and broadcast back; the brand filter makes the
    probe side tiny. avg is exact-cents-sum / count in both engines."""
    li = load(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    )
    pa = F.broadcast(
        li.groupBy("l_partkey").agg(
            F.expr(
                f"CAST(SUM({cents('l_quantity')}) AS DOUBLE) / 100 / COUNT(*)"
            ).alias("avg_qty")
        ).withColumnRenamed("l_partkey", "pa_partkey")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(pa, li.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < 0.4 * F.col("avg_qty"))
        .agg(
            F.expr(
                f"CAST(SUM({cents('l_extendedprice')}) AS DOUBLE) / 100 / 7.0"
            ).alias("avg_yearly")
        )
    )


@query(
    "tpch_q18",
    oracle=f"""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       MAX(o.o_totalprice) AS o_totalprice,
       (CAST(SUM({cents('l.l_quantity')}) AS DOUBLE) / 100) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM({cents('l_quantity')}) > 300 * 100
)
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate
ORDER BY o_totalprice DESC, o.o_orderkey
LIMIT 100
""",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume-customer pattern (TPC-H Q18): orders whose total
    quantity exceeds 300. The having-agg runs FIRST (it eliminates
    almost every orderkey), and the small survivor set is broadcast
    into the join-back — the big fact table is aggregated once and
    never re-shuffled."""
    li = load(spark, sf_dir, "lineitem")
    big = F.broadcast(
        li.groupBy("l_orderkey")
        .agg(F.expr(f"SUM({cents('l_quantity')})").alias("qty_cents"))
        .filter(F.col("qty_cents") > 300 * 100)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        li.join(big, li.l_orderkey == F.col("big_orderkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate")
        .agg(
            F.max("o_totalprice").alias("o_totalprice"),
            F.expr(f"CAST(SUM({cents('l_quantity')}) AS DOUBLE) / 100").alias(
                "total_qty"
            ),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q19",
    oracle=f"""
SELECT {duck_dsum2('l.l_extendedprice', 'l.l_discount')} AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted-revenue pattern (TPC-H Q19): disjunction of three
    (brand, size-range, quantity-range) predicates across the join.
    part is broadcast; the disjunctive filter runs post-join (its
    part-only conjuncts are pushed to the build side by Catalyst)."""
    li = load(spark, sf_dir, "lineitem")
    p = F.broadcast(load(spark, sf_dir, "part"))
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((br == "Brand#12") & sz.between(1, 15) & q.between(1, 11))
        | ((br == "Brand#23") & sz.between(1, 25) & q.between(10, 20))
        | ((br == "Brand#34") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum2("l_extendedprice", "l_discount").alias("revenue"))
    )


@query(
    "tpch_q15",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey, {duck_dsum2('l_extendedprice', 'l_discount')} AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, rev.total_rev
FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
WHERE rev.total_rev = (SELECT MAX(total_rev) FROM rev)
ORDER BY s.s_suppkey
""",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-supplier pattern (TPC-H Q15): the supplier(s) achieving the
    quarter's maximum revenue. The revenue CTE is computed ONCE and
    reused for both the max and the equality filter (cached — Spark
    would otherwise recompute the agg for each use); revenue is exact
    integer cents so the equality against MAX is exact, not an
    epsilon-compare."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(dsum2("l_extendedprice", "l_discount").alias("total_rev"))
        .cache()
    )
    max_rev = rev.agg(F.max("total_rev")).collect()[0][0]
    s = load(spark, sf_dir, "supplier")
    out = (
        s.join(rev.filter(F.col("total_rev") == max_rev), s.s_suppkey == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )
    return out


@query(
    "tpch_q22",
    bounded_cross="1-row scalar-subquery broadcast (avg balance)",
    oracle=f"""
WITH avgbal AS (
  SELECT CAST(SUM({cents('c_acctbal')}) AS DOUBLE) / 100 / COUNT(*) AS a
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey, COUNT(*) AS numcust, {duck_dsum('c.c_acctbal')} AS totacctbal
FROM customer c, avgbal
WHERE c.c_acctbal > avgbal.a
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1998-01-01')
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
""",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-sales-opportunity pattern (TPC-H Q22): rich customers
    with no recent orders, by nation. The scalar average is one tiny
    agg broadcast into the filter; the no-recent-orders test is a
    LEFT ANTI join against the date-filtered orders (never a
    correlated per-row subquery). (Fixture adaptation: grouped by
    c_nationkey — there is no phone column to prefix.)"""
    c = load(spark, sf_dir, "customer")
    avgbal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            F.expr(f"CAST(SUM({cents('c_acctbal')}) AS DOUBLE) / 100 / COUNT(*)")
        )
        .collect()[0][0]
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1998-01-01"
    )
    return (
        c.filter(F.col("c_acctbal") > avgbal)
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "tpch_q7",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       {duck_dsum2('l.l_extendedprice', 'l.l_discount')} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1999-12-31'
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
""",
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-shipping pattern (TPC-H Q7): revenue flow between a
    nation pair by ship year. Plan shape: the fact⋈fact
    lineitem⋈orders join shuffles once on orderkey; customer,
    supplier, and both nation sides broadcast (all small); the
    disjunctive nation-pair predicate filters BEFORE the group-by so
    only matching flows aggregate."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") <= "1999-12-31")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dsum2("l_extendedprice", "l_discount").alias("revenue"))
    )


@query(
    "tpch_q8",
    oracle=f"""
SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_2'
                THEN {cents('l.l_extendedprice')} * (100 - {cents('l.l_discount')})
                ELSE 0 END) AS DOUBLE)
       / CAST(SUM({cents('l.l_extendedprice')} * (100 - {cents('l.l_discount')}))
              AS DOUBLE) AS mkt_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN region r ON n1.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
JOIN part p ON l.l_partkey = p.p_partkey
WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
GROUP BY year(o.o_orderdate)
""",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National-market-share pattern (TPC-H Q8): the target supplier
    nation's share of PROMO-part revenue sold into ASIA customers, by
    order year. Seven-table join: the only shuffle is
    lineitem⋈orders; part, customer, supplier, nation x2, region all
    broadcast. The share is a ratio of exact integer-cents sums, so
    the double division is bit-identical in both engines."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    asia = r.filter(F.col("r_name") == "ASIA")
    vol = f"{cents('l_extendedprice')} * (100 - {cents('l_discount')})"
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(asia), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.expr(
                f"CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN {vol} "
                f"ELSE 0 END) AS DOUBLE) / CAST(SUM({vol}) AS DOUBLE)"
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q13",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
""",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-order-distribution pattern (TPC-H Q13): histogram of
    customers by order count, excluding urgent orders (the fixture's
    stand-in for the comment filter). Two-phase: left join + count per
    customer (COUNT of the right-side key so no-order customers count
    0), then a second tiny aggregation over the counts. Integer-only —
    hash-exact."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )
