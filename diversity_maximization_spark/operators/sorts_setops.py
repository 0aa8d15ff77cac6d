"""Sort / limit / top-k and set operations (SURVEY.md §2.2-F,G).

Global sort is a range-partitioned sort (sampled boundaries, no single
reducer); ORDER BY + LIMIT k compiles to TakeOrderedAndProject — each
partition keeps k rows, the driver merges p*k, never a full sort. Both
verified in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load


@query(
    "sort_global",
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal
FROM customer
ORDER BY c_nationkey, c_acctbal DESC, c_custkey
""",
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.orderBy(
        "c_nationkey", F.col("c_acctbal").desc(), "c_custkey"
    ).select("c_custkey", "c_nationkey", "c_acctbal")


@query(
    "topk_global",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (TakeOrderedAndProject; ties broken by o_orderkey)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )


@query(
    "setop_union_all",
    oracle="""
SELECT c_custkey AS id, c_name AS name, 'customer' AS kind FROM customer
UNION ALL
SELECT s_suppkey AS id, s_name AS name, 'supplier' AS kind FROM supplier
""",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.lit("customer").alias("kind"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionAll(s)


@query(
    "setop_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "setop_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "setop_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "sort_skyline",
    oracle="""
SELECT p_partkey, p_retailprice, p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice >= p.p_retailprice AND q.p_size <= p.p_size
    AND (q.p_retailprice > p.p_retailprice OR q.p_size < p.p_size))
""",
)
def sort_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) over parts — maximize p_retailprice
    while minimizing p_size: the multi-criteria shortlist every
    "best tradeoff" query wants and SQL can only say as a quadratic
    NOT EXISTS anti-self-join (the oracle; intentionally naive, see
    PLANS.md). Scale plan in ``skyline_2d``."""
    return skyline_2d(
        load(spark, sf_dir, "part"),
        maximize="p_retailprice",
        minimize="p_size",
        keep_cols=["p_partkey"],
    )


def skyline_2d(
    df: DataFrame,
    maximize: str,
    minimize: str,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """2-D Pareto frontier over any DataFrame: rows not strictly
    dominated on (maximize up, minimize down).

    The MapReduce skyline decomposition: (1) each partition computes
    its LOCAL skyline with an O(n log n) sort-and-sweep in Arrow
    batches (per input split, next to the data); (2) the union of
    local skylines — provably a superset of the global skyline, and
    at most frontier-size x partitions rows — is swept once more on
    a single partition. The quadratic never runs; stage 2's input is
    tiny by construction. Dominance is strict-in-at-least-one, so
    duplicate (maximize, minimize) points survive together."""
    import pandas as pd

    cols = list(keep_cols or []) + [maximize, minimize]
    part = df.select(*cols)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in part.schema.fields
    )

    def sweep(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([maximize, minimize], ascending=[False, True])
        keep = []
        best = None  # min of `minimize` among strictly-better rows
        for _, grp in pdf.groupby(maximize, sort=False):
            gmin = grp[minimize].iloc[0]
            if best is None or gmin < best:
                keep.append(grp[grp[minimize] == gmin])
            best = gmin if best is None else min(best, gmin)
        return pd.concat(keep) if keep else pdf.iloc[0:0]

    def local(batches):
        for pdf in batches:
            if len(pdf):
                yield sweep(pdf)

    candidates = part.mapInPandas(local, schema)

    def merge(batches):
        dfs = [pdf for pdf in batches if len(pdf)]
        if dfs:
            yield sweep(pd.concat(dfs))

    # stage 2: one tiny partition sweeps the candidate union
    return candidates.coalesce(1).mapInPandas(merge, schema)

@query(
    "setop_intersect_all",
    oracle="""
SELECT o_custkey AS user_id FROM orders
INTERSECT ALL
SELECT user_id FROM events
""",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — the MULTISET intersection (min of the two
    multiplicities per key), distinct from the set-semantics
    setop_intersect: a key ordering 3 times that fired 2 events
    appears twice. Same DataFrame verb (intersectAll), one shuffle
    per side on the value."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id")
    )
    e = load(spark, sf_dir, "events").select("user_id")
    return o.intersectAll(e)


@query(
    "setop_except_all",
    oracle="""
SELECT o_custkey AS user_id FROM orders
EXCEPT ALL
SELECT user_id FROM events
""",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (multiplicities subtract,
    floor at zero), vs setop_except's set semantics. exceptAll is
    the audit-friendly form: how many ORDER ROWS have no matching
    event occurrence left after pairing one-for-one."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id")
    )
    e = load(spark, sf_dir, "events").select("user_id")
    return o.exceptAll(e)

@query(
    "setop_union_by_name",
    oracle="""
SELECT o_orderkey AS id, o_totalprice AS amount,
       CAST(NULL AS VARCHAR) AS event_type, 'order' AS src
FROM orders WHERE o_totalprice > 400000
UNION ALL
SELECT event_id AS id, value AS amount, event_type,
       'event' AS src
FROM events WHERE event_type = 'purchase'
""",
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift union: two feeds with DIFFERENT columns combine
    by NAME with missing columns NULL-backfilled
    (unionByName(allowMissingColumns=True)) — the union a pipeline
    actually needs when producers evolve independently, vs UNION
    ALL's silent by-position mispairing. The oracle spells out the
    aligned projection explicitly; matching proves the name-based
    alignment puts every value in the right column."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(
            F.col("o_orderkey").alias("id"),
            F.col("o_totalprice").alias("amount"),
            F.lit("order").alias("src"),
        )
    )
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("id"),
            F.col("value").alias("amount"),
            "event_type",
            F.lit("event").alias("src"),
        )
    )
    return o.unionByName(e, allowMissingColumns=True).select(
        "id", "amount", "event_type", "src"
    )
