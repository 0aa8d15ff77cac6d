"""Direct SQL entry point (SURVEY.md §3.1): the engine's tables are
temp views, arbitrary ANSI SQL runs through Catalyst. sql_adhoc
demonstrates it end-to-end with a multi-table query whose ORACLE IS
THE IDENTICAL SQL TEXT — the strongest possible parity statement:
whatever SQL a reference user runs today, they paste it unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..sources.tables import register_views

# Runs verbatim on Spark AND DuckDB: exact integer-cents revenue,
# dimension joins, conditional agg, HAVING — no engine-specific syntax.
_ADHOC_SQL = """
SELECT r.r_name AS region, o.o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100
         AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderstatus <> 'P'
GROUP BY r.r_name, o.o_orderpriority
HAVING COUNT(*) > 2
"""


def sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    """Run arbitrary SQL against the corpus views (the user-facing
    entry point; see also api.py)."""
    register_views(spark, sf_dir)
    return spark.sql(text)


@query("sql_adhoc", oracle=_ADHOC_SQL)
def sql_adhoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: the identical query text runs on Spark
    (through Catalyst: broadcast dimension chain, partial+final agg)
    and on DuckDB as the oracle. Proves a reference user's SQL
    workload ports verbatim."""
    return sql(spark, sf_dir, _ADHOC_SQL)


# Identical text on Spark 4 (recursive CTE support, SPARK-24497) and
# DuckDB: walks the synthetic parent tree parent(u) = hash(u) % u
# (the same tree graph_ancestor_depth climbs by distributed pointer
# jumping) down to the root, carrying the full ancestry path string.
# Each recursion step is one equi-free self-extension; Spark executes
# it as iterative UNION ALL materializations, so the work per step is
# one scan of the frontier — the declarative twin of the pointer-
# jumping loop (which remains the better plan for deep trees:
# log(depth) rounds vs depth steps here).
_RECURSIVE_SQL = """
WITH RECURSIVE walk AS (
  SELECT doc_id, CAST(doc_id AS BIGINT) AS cur, CAST(0 AS BIGINT) AS depth,
         CAST(doc_id AS VARCHAR(20)) AS path
  FROM documents
  UNION ALL
  SELECT doc_id,
         (cur * 2654435761 % 4294967296) % cur,
         depth + 1,
         CONCAT(path, '<',
                CAST((cur * 2654435761 % 4294967296) % cur AS VARCHAR(20)))
  FROM walk WHERE cur > 0
)
SELECT doc_id, depth, path FROM walk WHERE cur = 0
"""


@query("sql_recursive_cte", oracle=_RECURSIVE_SQL)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI recursive CTE through the SQL front door: the IDENTICAL
    WITH RECURSIVE text resolves every document's root ancestry path
    on both engines (one terminal row per doc at cur = 0). Proves
    the engine covers the recursive-query tier of the SQL surface
    natively — hierarchies, BOM walks, reachability — without the
    caller hand-rolling an iterative join loop."""
    return sql(spark, sf_dir, _RECURSIVE_SQL)
