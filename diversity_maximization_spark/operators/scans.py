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
from ..scratch import scratch_dir
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
    out_dir = scratch_dir(prefix="dms_sink_")
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
    out_dir = scratch_dir(prefix="dms_prune_")
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
    out_dir = scratch_dir(prefix="dms_cluster_")
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


def _morton_expr(a: str, b: str, bits: int = 16):
    """Z-value: interleave the low `bits` of two non-negative ints —
    pure JVM shift/mask expressions, no UDF."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftright(F.col(a).cast("bigint"), i) % 2
        bbit = F.shiftright(F.col(b).cast("bigint"), i) % 2
        z = z + F.shiftleft(abit, 2 * i + 1) + F.shiftleft(bbit, 2 * i)
    return z


def write_zorder_layout(spark: SparkSession, sf_dir: str) -> str:
    """Write orders Z-order-clustered on (customer bucket, day number);
    returns the directory (see sink_zorder_layout)."""
    o = load(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    zsrc = o.withColumn("ck", (F.col("o_custkey") % 1024).cast("bigint")).withColumn(
        "dy", day.cast("bigint")
    )
    zv = _morton_expr("ck", "dy")
    out_dir = scratch_dir(prefix="dms_zorder_")
    (
        zsrc.withColumn("zv", zv)
        .repartitionByRange(8, "zv")
        .sortWithinPartitions("zv")
        .drop("zv", "dy")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


@query(
    "sink_zorder_layout",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
WHERE o_custkey % 1024 BETWEEN 100 AND 160
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
""",
)
def sink_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton-interleaved) multi-column clustering — the
    lakehouse layout lever when queries filter on TWO independent
    columns and single-key range clustering can only serve one:
    orders are written range-partitioned and sorted by the bit
    interleave of (customer bucket, day number), so every file covers
    a small rectangle of the (customer, date) plane and parquet
    row-group min/max statistics skip files for predicates on EITHER
    column. The interleave is pure JVM shift/mask expressions (no
    UDF). The key returns a two-predicate aggregate over the
    read-back, hash-checked against the original table; the skipping
    effect itself is pinned in tests/test_plans.py."""
    out_dir = write_zorder_layout(spark, sf_dir)
    back = spark.read.parquet(out_dir).filter(
        F.col("ck").between(100, 160)
        & (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).alias(
            "cents"
        ),
    )

@query(
    "plan_cache_reuse",
    oracle="""
WITH enriched AS (
  SELECT o.o_custkey, c.c_mktsegment, o.o_totalprice
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT c_mktsegment AS seg,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
         / 100 AS total,
       (SELECT COUNT(DISTINCT o_custkey) FROM enriched) AS n_buyers_all
FROM enriched GROUP BY c_mktsegment
""",
)
def plan_cache_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit intermediate caching — the dashboard pattern where
    one expensive enrichment join feeds several reports: the joined
    (order x customer) intermediate is .cache()d and BOTH consumers
    (per-segment rollup + global distinct-buyer count) read the
    InMemoryTableScan instead of re-running the join (pinned by a
    plan test). At 100 TB this is the decision of materializing a
    hot intermediate once per refresh instead of once per panel;
    results are cache-independent — the oracle proves equality, the
    plan proves reuse. The cache is unpersisted before returning so
    a long-lived session doesn't pin it (ADVICE r02 discipline)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    enriched = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("o_custkey", "c_mktsegment", "o_totalprice")
        .cache()
    )
    try:
        buyers = enriched.select(
            F.countDistinct("o_custkey").alias("n_buyers_all")
        )
        per_seg = enriched.groupBy(
            F.col("c_mktsegment").alias("seg")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(
                    F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
                ).cast("double")
                / 100
            ).alias("total"),
        )
        out = per_seg.crossJoin(F.broadcast(buyers)).select(
            "seg", "n", "total", "n_buyers_all"
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        enriched.unpersist()
    return out
