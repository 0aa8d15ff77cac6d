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
