"""SparkSession factory.

Local defaults mirror what we'd set on a real cluster: AQE on (runtime
re-planning, skew-join splitting, partition coalescing), Arrow on (all
pandas-UDF traffic is Arrow-batched), and a shuffle-partition count
sized for the local test harness. On a 1000-executor cluster the only
knobs that change are shuffle partitions (let AQE coalesce from a high
initial number) and memory sizing; nothing in the engine code assumes
local mode.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(app_name: str = "diversity-maximization-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # per-process managed-table warehouse (bucketed tables): keeps the
    # repo clean and avoids location collisions across sessions, since
    # the in-memory catalog forgets tables but their dirs persist
    warehouse = os.environ.get("SPARK_WAREHOUSE_DIR")
    if warehouse is None:
        # engine-owned default: register for exit-time cleanup (a
        # user-provided SPARK_WAREHOUSE_DIR is never deleted)
        from .scratch import register_scratch

        warehouse = register_scratch(
            os.path.join(tempfile.gettempdir(), f"dms_warehouse_{os.getpid()}")
        )
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.warehouse.dir", warehouse)
        # batch shuffles: a fixed moderate width locally (AQE coalesces
        # the small ones at runtime); on a cluster override via env —
        # the streaming state-store width is derived separately in
        # streaming/replay.py (AQE never applies there)
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.ts is parquet TIMESTAMP(NANOS); Spark has no nanos type,
        # so read as int64 and convert in the loader (sources/tables.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
