"""Classic TPC-H-pattern queries over the fixture tables (SURVEY.md
§2.2 relational surface, composed end-to-end the way a warehouse
user would run them). Q1's pattern is agg_pricing_summary; here are
the Q3 / Q5 / Q10 patterns, adapted to the fixture columns (dates
span 1995..2001; columns the fixtures lack are omitted). Revenue
sums use the exact integer-cents discipline (registry docstring) so
the DuckDB hash matches bit-for-bit.

Plan notes (the shapes Catalyst picks and we want): Q3 = two
sort-merge/broadcast joins then partial+final agg then TakeOrdered;
Q5 = fact table joined to broadcast dims with the c_nationkey =
s_nationkey cycle closed AFTER both joins (a filter, not a join);
Q10 = fact-to-fact join with group-by customer and TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load
from .aggregates import dsum2, duck_dsum2


@query(
    "tpch_q3",
    oracle=f"""
SELECT l.l_orderkey, {duck_dsum2('l.l_extendedprice', 'l.l_discount')} AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
LIMIT 10
""",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority pattern (TPC-H Q3): top unshipped orders by
    revenue for one market segment."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15"
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum2("l_extendedprice", "l_discount").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5",
    oracle=f"""
SELECT n.n_name, {duck_dsum2('l.l_extendedprice', 'l.l_discount')} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND c.c_nationkey = s.s_nationkey
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC
""",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier-volume pattern (TPC-H Q5): revenue by nation
    where customer and supplier share the nation, one region, two
    years. Dims are broadcast; the c/s nation equality is a post-join
    filter."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    s = F.broadcast(load(spark, sf_dir, "supplier"))
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum2("l_extendedprice", "l_discount").alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


@query(
    "tpch_q10",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       {duck_dsum2('l.l_extendedprice', 'l.l_discount')} AS revenue,
       MAX(c.c_acctbal) AS c_acctbal, MAX(n.n_name) AS n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-07-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item-reporting pattern (TPC-H Q10): customers who
    returned the most revenue in a quarter-ish window."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            dsum2("l_extendedprice", "l_discount").alias("revenue"),
            F.max("c_acctbal").alias("c_acctbal"),
            F.max("n_name").alias("n_name"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )
