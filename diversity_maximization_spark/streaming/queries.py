"""Structured Streaming query registrations (SURVEY.md §2.2-J)."""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from . import coreset, windows  # noqa: F401  (register their keys)
from .replay import (
    run_to_memory,
    stream_conf,
    stream_events,
    write_replay_files,
)


@query("stream_coreset")  # SURVEY §2.2-J: alias of div_coreset_stream
def stream_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass doubling coreset as a stateful streaming op (§2.1)."""
    return coreset.streaming_coreset(spark, sf_dir)


@query(
    "sink_stream_memory",
    oracle="SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY 1",
)
def sink_stream_memory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming memory sink (SURVEY §2.2-A sink_stream_console/memory):
    replay events through readStream, aggregate, land in an in-memory
    table in complete mode; final table equals the batch answer."""
    replay = write_replay_files(spark, sf_dir)
    st = stream_events(spark, replay)
    agg = st.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    return run_to_memory(agg, windows._fresh("sink_mem"), mode="complete")


@query(
    "sink_stream_console",
    oracle="SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY 1",
)
def sink_stream_console(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming console sink (SURVEY §2.2-A sink_stream_console):
    the same replayed aggregation is driven to completion through a
    `console` sink (rows printed per micro-batch to driver stdout —
    the debug sink), then re-run against a memory sink to RETURN the
    final table, which must equal the batch answer. Both sinks consume
    the identical plan; the console pass proves the sink wiring, the
    memory pass makes the result checkable."""
    replay = write_replay_files(spark, sf_dir)
    agg = (
        stream_events(spark, replay)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    with stream_conf(spark):
        q = (
            agg.writeStream.format("console")
            .option("numRows", 5)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    agg2 = (
        stream_events(spark, replay)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return run_to_memory(agg2, windows._fresh("sink_con"), mode="complete")
