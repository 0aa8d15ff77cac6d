"""Scans, sources, sinks (SURVEY.md §2.2-A).

scan_parquet exercises the full-table read path on every fixture;
scan_pruned exercises Catalyst column pruning + predicate pushdown
(at 100 TB the difference between these two plans is the whole game:
`.explain` on scan_pruned shows PushedFilters and a 2-column
ReadSchema). sink_parquet round-trips a partitioned write.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import TABLES, load

_SCAN_ORACLE = " UNION ALL ".join(
    f"SELECT '{t}' AS tbl, COUNT(*) AS n_rows FROM {t}" for t in TABLES
)


@query("scan_parquet", oracle=_SCAN_ORACLE)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of every fixture table -> (tbl, n_rows)."""
    out = None
    for t in TABLES:
        df = load(spark, sf_dir, t).agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(t).alias("tbl"), F.col("n_rows")
        )
        out = df if out is None else out.unionAll(df)
    return out


@query(
    "scan_pruned",
    oracle="""
SELECT l_orderkey, l_extendedprice
FROM lineitem
WHERE l_quantity < 5 AND l_shipdate >= TIMESTAMP '2000-01-01'
""",
)
def scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned, predicate-pushed scan (2 of 11 columns read)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") < 5) & (F.col("l_shipdate") >= "2000-01-01"))
        .select("l_orderkey", "l_extendedprice")
    )


@query(
    "source_json_props",
    oracle="""
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
FROM events
""",
)
def source_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON `props` column into a typed field."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


_SINK_ORACLE = (
    "SELECT " + ", ".join(TABLES["events"]) + " FROM events"
)


@query("sink_parquet", oracle=_SINK_ORACLE)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet write + read-back (the engine's result sink).

    Writes `events` partitioned by event_type (the scale pattern: one
    directory per low-cardinality partition key, enabling partition
    pruning downstream) and returns the lazy read-back DataFrame; the
    oracle is the original table, so the driver's hash check IS the
    round-trip-equivalence proof. The temp dir lives for the process
    lifetime (no driver-side collect — the read-back stays lazy and
    distributed)."""
    ev = load(spark, sf_dir, "events")
    out_dir = tempfile.mkdtemp(prefix="dms_sink_")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out_dir)
    return spark.read.parquet(out_dir).select(*TABLES["events"])


@query(
    "sink_partition_prune",
    oracle="""
SELECT event_type, COUNT(*) AS n, CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
       AS DOUBLE) / 100 AS total_value
FROM events
WHERE event_type IN ('click', 'purchase')
GROUP BY event_type
""",
)
def sink_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned read-back: write events partitioned by
    event_type, then aggregate ONLY two partitions. The filter on the
    partition column becomes a PartitionFilters entry on the scan —
    Spark lists just the two matching directories and never opens the
    other files. This read-the-directories-you-need layout is the
    single biggest 100 TB lever for selective queries (a pinned
    assertion in tests/test_plans.py checks the pruned scan reads
    only the two partition dirs). Oracle = the same aggregate over
    the original table, proving prune-correctness."""
    ev = load(spark, sf_dir, "events")
    out_dir = tempfile.mkdtemp(prefix="dms_prune_")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out_dir)
    back = spark.read.parquet(out_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100"
        ).alias("total_value"),
    )


@query(
    "sink_clustered_layout",
    oracle="""
SELECT COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
         / 100 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1995-04-01'
""",
)
def sink_clustered_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered data layout + data-skipping read-back: write
    lineitem range-partitioned AND sorted within files on l_shipdate,
    then aggregate a tight date slice of the read-back.

    This is the zone-map / clustering lever for high-cardinality
    columns where directory partitioning (sink_partition_prune) is
    wrong: because each output file covers a disjoint l_shipdate
    range, the read-back's pushed-down range predicate (PushedFilters
    on the scan) lets parquet row-group min/max statistics skip every
    file outside the slice. At 100 TB this turns a full-table scan
    into reading ~1/Nth of the files — the same reason lakehouses
    Z-order on query keys. Oracle = the same aggregate over the
    original table, proving layout round-trip correctness."""
    li = load(spark, sf_dir, "lineitem")
    out_dir = tempfile.mkdtemp(prefix="dms_cluster_")
    (
        li.repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    back = spark.read.parquet(out_dir).filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1995-04-01")
    )
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) "
            "AS DOUBLE) / 100"
        ).alias("revenue"),
    )
