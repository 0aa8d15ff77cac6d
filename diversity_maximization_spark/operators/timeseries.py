"""Time-series operators over the events stream table (hypertable
patterns: gap-filled continuous aggregates and rollup hierarchies).

- ts_gapfill_locf: hourly per-event-type aggregate on a DENSE time
  grid — buckets with no events appear with n=0 and carry the last
  observed running total forward (LOCF). The grid is
  sequence(min, max, 1 hour) crossed with the 5 event types; the
  LOCF window partitions BY SERIES (event_type), so parallelism
  equals the number of series — the standard shape for per-series
  interpolation (a 100 TB corpus has many series, not one).
- ts_rollup_daily: the continuous-aggregate hierarchy — daily totals
  computed FROM THE HOURLY AGGREGATE, not from raw events. The
  oracle computes daily directly from raw rows, so the hash match
  proves the rollup re-aggregation is lossless (exact integer cents
  make the two-level sum associative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources import load
from .aggregates import cents


def _hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(cents("value"))).alias("total_cents"),
    )


@query(
    "ts_gapfill_locf",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         COUNT(*) AS n, SUM({cents('value')}) AS total_cents
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), bounds AS (
  SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM hourly
), grid AS (
  SELECT t.event_type, g.bucket
  FROM (SELECT DISTINCT event_type FROM events) t,
       (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        FROM bounds) g
)
SELECT g.event_type, g.bucket,
       COALESCE(h.n, 0) AS n,
       CAST(last_value(h.total_cents IGNORE NULLS) OVER (
              PARTITION BY g.event_type ORDER BY g.bucket
              ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100 AS locf_total
FROM grid g LEFT JOIN hourly h
  ON g.event_type = h.event_type AND g.bucket = h.bucket
""",
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event type with last-observation-
    carried-forward totals — the gap-fill + LOCF pattern of a
    hypertable continuous aggregate. Empty buckets get n=0 and the
    previous bucket's total. Plan: one shuffled agg to hourly grain,
    two scalar bounds, a 5-row dimension crossed with the generated
    hour sequence (both tiny), a left join back, and a per-series
    LOCF window."""
    hourly = _hourly(spark, sf_dir).cache()
    lo, hi = hourly.agg(F.min("bucket"), F.max("bucket")).collect()[0]
    grid = (
        spark.range(1)
        .select(
            F.explode(
                F.expr(
                    f"sequence(TIMESTAMP '{lo}', TIMESTAMP '{hi}', "
                    "INTERVAL 1 HOUR)"
                )
            ).alias("bucket")
        )
        .crossJoin(
            F.broadcast(
                load(spark, sf_dir, "events").select("event_type").distinct()
            )
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce("n", F.lit(0)).alias("n"),
            (
                F.last("total_cents", ignorenulls=True).over(w).cast("double")
                / 100
            ).alias("locf_total"),
        )
    )


@query(
    "ts_rollup_daily",
    oracle=f"""
SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       COUNT(*) AS n,
       CAST(SUM({cents('value')}) AS DOUBLE) / 100 AS total_value
FROM events
GROUP BY event_type, date_trunc('day', ts)
""",
)
def ts_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup hierarchy: daily per-type totals computed from the
    HOURLY aggregate (re-aggregation), while the oracle aggregates
    the raw rows directly — the hash match proves the hourly
    materialization loses nothing (exact integer-cents sums are
    associative, so hourly-then-daily == daily). This is the
    continuous-aggregate maintenance pattern: at 100 TB the daily
    view reads 24 rows per day per series instead of the raw
    stream."""
    hourly = _hourly(spark, sf_dir)
    return hourly.groupBy(
        "event_type", F.date_trunc("day", "bucket").alias("day")
    ).agg(
        F.sum("n").alias("n"),
        (F.sum("total_cents").cast("double") / 100).alias("total_value"),
    )
