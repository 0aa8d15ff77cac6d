"""Structured Streaming window operators (SURVEY.md §2.2-J).

Each queries() entry REALLY runs a streaming query (file-source
replay -> watermark -> windowed agg -> memory sink, availableNow
trigger) and returns the final table; the oracle is the equivalent
batch SQL over the full data — the batch-equivalence check the
reference's streaming algorithms were validated with
(SURVEY.md §5.1/5.2.4).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..scratch import scratch_dir
from ..sources import load
from .replay import (
    run_to_memory,
    stream_conf,
    stream_events,
    write_replay_files,
    write_replay_files_with_flush,
)

_counter = itertools.count()


def _fresh(name: str) -> str:
    return f"{name}_{next(_counter)}"


@query(
    "stream_tumbling",
    oracle="""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       event_type, COUNT(*) AS cnt
FROM events
GROUP BY 1, 2
""",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window counts per event type, 10-min watermark,
    replayed as a real stream (complete mode -> final state equals the
    batch answer)."""
    replay = write_replay_files(spark, sf_dir)
    st = stream_events(spark, replay)
    agg = (
        st.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    out = run_to_memory(agg, _fresh("tumbling"), mode="complete")
    return out.select(
        F.col("window.start").cast("timestamp_ntz").alias("window_start"), "event_type", "cnt"
    )


@query(
    "stream_sliding",
    oracle="""
SELECT CAST(time_bucket(INTERVAL 15 MINUTE, ts)
            - j * INTERVAL 15 MINUTE AS TIMESTAMP) AS window_start,
       COUNT(*) AS cnt
FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)
GROUP BY 1
""",
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 min (each event lands in 4)."""
    replay = write_replay_files(spark, sf_dir)
    st = stream_events(spark, replay)
    agg = (
        st.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    out = run_to_memory(agg, _fresh("sliding"), mode="complete")
    return out.select(F.col("window.start").cast("timestamp_ntz").alias("window_start"), "cnt")


@query(
    "stream_session",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM sess GROUP BY user_id, session_id
""",
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(ts, '30 minutes') per user — Spark's native
    session windows; grouping is provably identical to the gap-based
    sessionization oracle. Runs in batch mode (same operator;
    append-mode streaming session windows can never close their final
    session in a finite replay — tests/test_streaming.py drives the
    streaming variant with a sentinel)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


@query(
    "stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dropDuplicates within the watermark."""
    replay = write_replay_files(spark, sf_dir)
    st = stream_events(spark, replay)
    dd = (
        st.withWatermark("ts", "10 minutes")
        .select("user_id", "event_type", "ts")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_to_memory(dd, _fresh("dedup"), mode="append")


@query(
    "stream_cume_unique",
    oracle="""
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS unique_users
FROM events GROUP BY event_type
""",
)
def stream_cume_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed distinct-users-to-date per event type — the streaming
    form of the adoption curve, and a MULTI-stateful-operator chain:
    distinct aggregates are unsupported in streaming, so the standard
    decomposition chains stateful dropDuplicates (first-seen state)
    into a plain streaming count (complete mode), two state stores in
    one query (Spark 3.5+ multi-stateful support). After full replay
    the final table must equal the batch COUNT(DISTINCT) — the
    batch-equivalence contract every key in this module carries."""
    replay = write_replay_files(spark, sf_dir)
    st = stream_events(spark, replay)
    dd = (
        st.withWatermark("ts", "10 minutes")
        .select("event_type", "user_id", "ts")
        .dropDuplicates(["event_type", "user_id"])
    )
    agg = dd.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("unique_users")
    )
    return run_to_memory(agg, _fresh("cume_unique"), mode="complete")


@query(
    "stream_late_data",
    oracle="""
WITH mn AS (SELECT min(ts) AS t0 FROM events),
ot AS (SELECT ts FROM events, mn WHERE ts > t0 + INTERVAL 1 HOUR),
wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ot)
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM ot, wm
WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= w
GROUP BY 1
""",
)
def stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constructed late-arrival replay: the last slice re-delivers
    records from the first hour; with a 10-minute watermark already
    advanced far beyond them, append-mode aggregation drops them.
    Returns per-window counts EXCLUDING the dropped late rows
    (asserted against the batch count in tests).

    Hash-checked since round 5 (was rows-only): the construction is
    fully deterministic, so the append-mode emission set is exactly
    expressible in SQL — hourly counts over the on-time slice
    restricted to windows whose end <= final watermark
    (max on-time ts - 10 min); boundary semantics (<=) verified
    empirically at all three SFs."""
    import os
    import shutil
    import tempfile

    ev = load(spark, sf_dir, "events").orderBy("ts")
    tmin = ev.agg(F.min("ts")).collect()[0][0]
    cutoff = ev.agg(F.expr("min(ts) + INTERVAL 1 HOUR")).collect()[0][0]

    on_time = ev.filter(F.col("ts") > cutoff)
    late = ev.filter(F.col("ts") <= cutoff)  # will arrive LAST -> dropped

    replay = scratch_dir(prefix="dms_late_")
    checkpoint = scratch_dir(prefix="dms_late_ckpt_")

    def add_file(part, idx):
        d = scratch_dir("dms_slice_")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
        dst = os.path.join(replay, f"{idx:04d}.parquet")
        shutil.copy(os.path.join(d, f), dst)
        # deterministic replay order: the file source sorts by mtime
        os.utime(dst, (1_700_000_000 + 60 * idx, 1_700_000_000 + 60 * idx))
        shutil.rmtree(d, ignore_errors=True)

    collected: list = []

    def run_once():
        st = stream_events(spark, replay)
        agg = (
            st.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                F.col("window.start").cast("timestamp_ntz").alias("window_start"),
                "cnt",
            )
        )
        with stream_conf(spark):
            q = (
                agg.writeStream.foreachBatch(
                    lambda bdf, _id: collected.extend(bdf.collect())
                )
                .outputMode("append")
                .option("checkpointLocation", checkpoint)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    # Run 1: on-time data only -> advances the watermark to ~max(ts)-10min.
    # Run 2 (same checkpoint): the late file arrives; every row is behind
    # the watermark -> dropped; run 2 emits the finalized on-time windows.
    add_file(on_time, 0)
    run_once()
    add_file(late, 1)
    run_once()
    return spark.createDataFrame(
        collected, "window_start timestamp_ntz, cnt bigint"
    )


@query(
    "stream_static_join",
    oracle="""
SELECT e.event_id, e.event_type, c.c_mktsegment,
       CAST(ROUND(e.value * 100) AS BIGINT) AS value_cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
""",
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (a core Structured Streaming
    capability): the replayed event stream joins a STATIC dimension
    (customer) per micro-batch — the standard 100 TB enrichment shape,
    where the static side broadcasts into every micro-batch and no
    stream-side state accumulates. Append mode; the final sink
    contents must equal the batch join."""
    replay = write_replay_files(spark, sf_dir)
    st = stream_events(spark, replay)
    dim = load(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment")
    )
    joined = st.join(F.broadcast(dim), st.user_id == dim.c_custkey).select(
        "event_id",
        "event_type",
        "c_mktsegment",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("value_cents"),
    )
    return run_to_memory(joined, _fresh("sjoin"), mode="append")


@query(
    "stream_topk_window",
    oracle="""
SELECT window_start, event_type, max_value
FROM (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
         event_type, MAX(value) AS max_value
  FROM events GROUP BY 1, 2
)
""",
)
def stream_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day per-type running maximum value, computed as a REAL
    stream (watermark + daily tumbling window, complete mode) — the
    streaming leaderboard pattern. Max is order-insensitive, so the
    final streaming state must equal the batch aggregate exactly
    (batch-equivalence oracle). At scale: windowed max keeps one
    scalar per open (window, type) group in the state store; the
    watermark bounds state growth."""
    replay = write_replay_files(spark, sf_dir)
    st = stream_events(spark, replay)
    agg = (
        st.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.max("value").alias("max_value"))
    )
    out = run_to_memory(agg, _fresh("topkwin"), mode="complete")
    return out.select(
        F.col("window.start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "max_value",
    )


@query(
    "sink_stream_foreach_batch",
    oracle="""
SELECT event_type, COUNT(*) AS cnt,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100
         AS total_value
FROM events
GROUP BY event_type
""",
)
def sink_stream_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch sink — the production streaming sink pattern
    (per-micro-batch custom write with exactly-once batch ids): each
    micro-batch's per-type partial counts/cent-sums are appended to a
    parquet directory keyed by batch id, then the final answer
    re-aggregates the partials. The oracle is the plain batch
    aggregate — equality proves (a) every micro-batch was delivered
    exactly once and (b) the partial-then-final decomposition is
    lossless (integer cents are associative). At scale foreachBatch
    is how streams write to lakehouse tables, dims, or external
    stores; the partial-agg-then-merge shape keeps each batch's write
    proportional to the number of groups, not rows."""
    import tempfile as _tf

    replay = write_replay_files(spark, sf_dir)
    st = stream_events(spark, replay)
    out_dir = scratch_dir(prefix="dms_feb_")

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        (
            bdf.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias(
                    "cents"
                ),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    with stream_conf(spark):
        q = (
            st.writeStream.foreachBatch(write_batch)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.read.parquet(out_dir)
        .groupBy("event_type")
        .agg(
            F.sum("cnt").alias("cnt"),
            (F.sum("cents").cast("double") / 100).alias("total_value"),
        )
    )


@query(
    "stream_stream_join",
    oracle="""
SELECT s.user_id, s.event_id AS signup_id, p.event_id AS purchase_id
FROM events s JOIN events p
  ON s.user_id = p.user_id
 AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 5 MINUTE
WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
""",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join: signups joined to purchases of the
    same user within 5 minutes, both sides watermarked (45 min: the
    replay slices are cut by event_id, so cross-file event-time
    disorder can exceed a tight watermark; state eviction must
    out-wait the disorder bound or in-window pairs drop) — the hardest
    Structured Streaming operator (state on BOTH sides; the watermark
    + time-range condition is what lets Spark evict join state, so
    memory stays bounded by the time window, not the stream length).
    Replayed as a real two-stream query; the oracle is the identical
    batch interval join over the full table — equality proves no
    in-window pair was dropped or duplicated across micro-batches.
    At 100 TB/day this is the canonical attribution join."""
    replay = write_replay_files(spark, sf_dir)
    s = (
        stream_events(spark, replay)
        .filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("event_id").alias("signup_id"),
            F.col("ts").alias("ts_s"),
        )
        .withWatermark("ts_s", "45 minutes")
    )
    p = (
        stream_events(spark, replay)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_p"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("ts_p"),
        )
        .withWatermark("ts_p", "45 minutes")
    )
    joined = s.join(
        p,
        (F.col("user_id") == F.col("user_p"))
        & (F.col("ts_p") >= F.col("ts_s"))
        & (F.col("ts_p") <= F.col("ts_s") + F.expr("INTERVAL 5 MINUTE")),
    )
    out = run_to_memory(
        joined.select("user_id", "signup_id", "purchase_id"),
        _fresh("ssjoin"),
        mode="append",
    )
    return out


@query(
    "stream_stream_left_join",
    oracle="""
SELECT s.user_id, s.event_id AS signup_id, p.event_id AS purchase_id
FROM events s LEFT JOIN events p
  ON s.user_id = p.user_id AND p.event_type = 'purchase'
 AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 5 MINUTE
WHERE s.event_type = 'signup'
""",
)
def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM LEFT OUTER join — the eviction-correctness twin
    of stream_stream_join: every signup must emit exactly once, with
    its in-window purchases or null-extended, and a null row may only
    surface once the global watermark PASSES the signup's 5-minute
    window (emitting earlier would produce a spurious null next to a
    later real match; never emitting is the documented
    outer-join-at-stream-end caveat). The replay appends two sentinel
    flush batches (replay.write_replay_files_with_flush) so the
    watermark provably crosses every real event and the withheld
    unmatched state drains inside the replay itself — equality with
    the batch LEFT JOIN oracle then proves BOTH no-dup/no-drop on
    matches AND exactly-once null extension on non-matches. At
    100 TB/day this is the attribution join with abandoned-signup
    accounting; state stays bounded by the watermark horizon exactly
    as in the inner variant."""
    # files_per_trigger=1: the sentinel-flush protocol REQUIRES the two
    # trailing sentinel files to land in separate micro-batches (the
    # first advances the watermark, the second is the data batch in
    # which the evicted unmatched state drains) — coarser batching
    # would merge them and put the final drain back on no-data-batch
    # scheduling, which this key's design explicitly avoids.
    replay = write_replay_files_with_flush(spark, sf_dir)
    s = (
        stream_events(spark, replay, files_per_trigger=1)
        .filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("event_id").alias("signup_id"),
            F.col("ts").alias("ts_s"),
        )
        .withWatermark("ts_s", "45 minutes")
    )
    p = (
        stream_events(spark, replay, files_per_trigger=1)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_p"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("ts_p"),
        )
        .withWatermark("ts_p", "45 minutes")
    )
    joined = s.join(
        p,
        (F.col("user_id") == F.col("user_p"))
        & (F.col("ts_p") >= F.col("ts_s"))
        & (F.col("ts_p") <= F.col("ts_s") + F.expr("INTERVAL 5 MINUTE")),
        "leftOuter",
    )
    out = run_to_memory(
        joined.select("user_id", "signup_id", "purchase_id"),
        _fresh("ssljoin"),
        mode="append",
    )
    # Drop the watermark-flush sentinels on the MATERIALIZED batch
    # result, never inside the streaming plan: a user_id filter in the
    # streaming plan is pushed below the left-side EventTimeWatermark
    # node, which silently removes the sentinel signups BEFORE they can
    # advance the left watermark — the global watermark then stalls at
    # max(real ts) - 45 min and the last ~50 min of unmatched signups
    # are withheld forever (observed: 4 tail rows missing at sf0.01).
    return out.filter(F.col("user_id") >= 0)


@query(
    "stream_stream_full_join",
    oracle="""
SELECT COALESCE(s.user_id, p.user_id) AS user_id,
       s.event_id AS signup_id, p.event_id AS purchase_id
FROM (SELECT user_id, event_id, ts FROM events
      WHERE event_type = 'signup') s
FULL JOIN (SELECT user_id, event_id, ts FROM events
           WHERE event_type = 'purchase') p
  ON s.user_id = p.user_id
 AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 5 MINUTE
""",
)
def stream_stream_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM FULL OUTER join — state on BOTH sides must evict
    AND null-extend: every signup emits (with purchases or null, as in
    the left variant) and every purchase that attributed to no signup
    ALSO emits once the watermark passes its window — the complete
    attribution ledger (converted, abandoned-signup, and organic-
    purchase rows in one result). Same sentinel-flush replay and same
    materialized-side sentinel filter as stream_stream_left_join (the
    filter must see COALESCE of both sides, since unmatched rows carry
    only one side's user id)."""
    replay = write_replay_files_with_flush(spark, sf_dir)
    s = (
        stream_events(spark, replay, files_per_trigger=1)
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("user_s"),
            F.col("event_id").alias("signup_id"),
            F.col("ts").alias("ts_s"),
        )
        .withWatermark("ts_s", "45 minutes")
    )
    p = (
        stream_events(spark, replay, files_per_trigger=1)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_p"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("ts_p"),
        )
        .withWatermark("ts_p", "45 minutes")
    )
    joined = s.join(
        p,
        (F.col("user_s") == F.col("user_p"))
        & (F.col("ts_p") >= F.col("ts_s"))
        & (F.col("ts_p") <= F.col("ts_s") + F.expr("INTERVAL 5 MINUTE")),
        "fullOuter",
    )
    out = run_to_memory(
        joined.select(
            F.coalesce("user_s", "user_p").alias("user_id"),
            "signup_id",
            "purchase_id",
        ),
        _fresh("ssfjoin"),
        mode="append",
    )
    return out.filter(F.col("user_id") >= 0)


@query(
    "stream_dedup_within_watermark",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark — the BOUNDED-STATE streaming
    dedup (state for a key expires once the watermark passes it, so
    state size tracks the watermark horizon instead of growing
    forever like plain dropDuplicates). Exercised here with a
    watermark wider than the replayed event-time range so no key
    expires mid-replay and the result provably equals the batch
    DISTINCT oracle; in production the same query runs with a real
    horizon (and re-emits a key only if it recurs beyond it — the
    documented, intended semantics of the API)."""
    replay = write_replay_files(spark, sf_dir)
    st = stream_events(spark, replay)
    dd = (
        st.withWatermark("ts", "3650 days")
        .select("user_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_to_memory(dd, _fresh("ddww"), mode="append")


@query(
    "stream_session_dynamic_gap",
    oracle="""
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_type = 'error' THEN 300 ELSE 1800 END AS gap
  FROM events
), flagged AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) > MAX(epoch(ts) + gap) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              OR ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS new_sess
  FROM g
), sess AS (
  SELECT user_id, ts,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM sess GROUP BY user_id, session_id
""",
)
def stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap session windows — session_window(ts, expr) where
    the gap depends on the event ('error' events hold the session
    open only 5 minutes, everything else 30): Spark merges events
    whose [ts, ts+gap] intervals chain-overlap. The oracle replays
    the same semantics as a running max of (epoch + gap) per user —
    a new session starts exactly when an event's time exceeds every
    previous event's reach. Batch mode (same operator as streaming;
    see stream_session for why finite replays can't close final
    sessions in append mode)."""
    ev = load(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "error", "5 minutes").otherwise(
        "30 minutes"
    )
    return (
        ev.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


@query(
    "stream_checkpoint_resume",
    oracle="""
SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'
""",
)
def stream_checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-ONCE restart through a checkpoint — the operational
    guarantee streaming pipelines live on: the replay is delivered in
    two separate runs of the same query against one
    checkpointLocation (run 1 sees half the files, run 2 the rest);
    the file-source offsets in the checkpoint make run 2 process ONLY
    the unseen files, and the parquet sink's commit log keeps the
    output exactly-once, so the combined sink equals the batch oracle
    with no duplicates and no gaps."""
    import os
    import shutil
    import tempfile

    from .replay import EVENT_SCHEMA, write_replay_files

    full = write_replay_files(spark, sf_dir)
    files = sorted(os.listdir(full))
    src = scratch_dir(prefix="dms_ckres_src_")
    ckpt = scratch_dir(prefix="dms_ckres_ck_")
    out = scratch_dir(prefix="dms_ckres_out_")

    def run_once():
        st = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            st.filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "value")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    half = max(1, len(files) // 2)
    for f in files[:half]:
        shutil.copy(os.path.join(full, f), os.path.join(src, f))
    run_once()
    for f in files[half:]:
        shutil.copy(os.path.join(full, f), os.path.join(src, f))
    run_once()
    return spark.read.parquet(out)


# Shared expression text for stream_anomaly: both engines evaluate
# LITERALLY these fragments, so the doubles are bit-identical.
_AN_CENTS = "CAST(ROUND((value) * 100) AS BIGINT)"
_AN_MEAN = "(CAST(sum_c AS DOUBLE) / 100) / n"
_AN_STD = (
    "sqrt(((CAST(sumsq_c AS DOUBLE) / 10000)"
    " - ((CAST(sum_c AS DOUBLE) / 100) * (CAST(sum_c AS DOUBLE) / 100)) / n)"
    " / (n - 1))"
)


@query(
    "stream_anomaly",
    oracle=f"""
WITH s AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM({_AN_CENTS}) AS BIGINT) AS sum_c,
         CAST(SUM({_AN_CENTS} * {_AN_CENTS}) AS BIGINT) AS sumsq_c
  FROM events GROUP BY event_type
), m AS (
  SELECT event_type, n, {_AN_MEAN} AS mean, {_AN_STD} AS std FROM s
)
SELECT m.event_type, m.n, m.mean, m.std,
       CAST(SUM(CASE WHEN abs(e.value - m.mean) > 3.0 * m.std
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM events e JOIN m ON e.event_type = m.event_type
GROUP BY m.event_type, m.n, m.mean, m.std
""",
)
def stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming anomaly profile: per-event-type moment sketches
    (count + exact integer cent sums + squared-cent sums) accumulate
    in a REAL streaming aggregation over the file replay — the moment
    triple is order- and batching-independent, so the final streamed
    state provably equals the batch aggregate regardless of
    micro-batch boundaries (the property that makes this safe where a
    prefix-z-score stream would depend on arrival order). The final
    sketch (one row per event type) then broadcasts onto the static
    table to flag |x - mean| > 3*sigma outliers.

    At 100 TB this is the production monitoring shape: the stream
    maintains tiny mergeable state forever; flagging is a narrow
    broadcast-join pass over whatever slice needs scoring. Exact
    integer micro-units keep the driver hash bit-exact (the
    mean/std/flag expressions are literally the same SQL text on
    both engines)."""
    replay = write_replay_files(spark, sf_dir)
    st = stream_events(spark, replay)
    sketch = st.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(_AN_CENTS)).alias("sum_c"),
        F.sum(F.expr(f"{_AN_CENTS} * {_AN_CENTS}")).alias("sumsq_c"),
    )
    final = run_to_memory(sketch, _fresh("anomaly"), mode="complete")
    m = final.select(
        "event_type",
        "n",
        F.expr(_AN_MEAN).alias("mean"),
        F.expr(_AN_STD).alias("std"),
    )
    ev = load(spark, sf_dir, "events")
    return (
        ev.join(F.broadcast(m), "event_type")
        .groupBy("event_type", "n", "mean", "std")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("mean"))
                    > F.lit(3.0) * F.col("std"),
                    1,
                ).otherwise(0)
            ).alias("n_anomalies")
        )
        .select("event_type", "n", "mean", "std", "n_anomalies")
    )


@query(
    "stream_cdc_apply",
    oracle="""
WITH ops AS (
  SELECT user_id, ts, event_id, value,
         (event_id % 97 = 0) AS is_delete,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, value AS last_value, event_id AS last_event_id
FROM ops WHERE rn = 1 AND NOT is_delete
""",
)
def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply — a change stream of upserts and deletes
    (every event_id % 97 == 0 is a tombstone) maintained as a keyed
    table via foreachBatch MERGE onto parquet. The merge is
    VERSION-BASED last-writer-wins on (ts, event_id), not
    arrival-order-based: each micro-batch reduces to its per-key
    argmax op, unions with the state table, and keeps the global
    argmax — so the final table is provably independent of batch
    boundaries and replay slicing (the same order-independence
    discipline as stream_anomaly), which is exactly how production
    CDC sinks survive reordered feeds (a version/sequence column,
    not wall-clock arrival). Tombstones stay in the state as flagged
    rows (so a late earlier-versioned upsert cannot resurrect a
    deleted key) and are filtered at read time. Batch-equivalence
    oracle: last op per key wins, deletes erase."""
    import os
    import shutil
    import tempfile

    replay = write_replay_files(spark, sf_dir)
    st = stream_events(spark, replay)
    state_dir = scratch_dir(prefix="dms_cdc_state_")
    shutil.rmtree(state_dir, ignore_errors=True)

    def apply_batch(batch_df, batch_id):
        from pyspark.sql import functions as BF
        from pyspark.sql.window import Window as BW

        ops = batch_df.select(
            "user_id",
            "ts",
            "event_id",
            "value",
            (BF.col("event_id") % 97 == 0).alias("is_delete"),
        )
        sess = batch_df.sparkSession
        if os.path.exists(state_dir):
            ops = sess.read.parquet(state_dir).unionByName(ops)
        w = BW.partitionBy("user_id").orderBy(
            BF.col("ts").desc(), BF.col("event_id").desc()
        )
        merged = (
            ops.withColumn("rn", BF.row_number().over(w))
            .filter(BF.col("rn") == 1)
            .drop("rn")
        )
        tmp = state_dir + f"_b{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(state_dir):
            shutil.rmtree(state_dir)
        os.rename(tmp, state_dir)

    with stream_conf(spark):
        q = (
            st.writeStream.foreachBatch(apply_batch)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation", scratch_dir(prefix="dms_cdc_ckpt_")
            )
            .start()
        )
        q.awaitTermination()
    final = spark.read.parquet(state_dir)
    return final.filter(~F.col("is_delete")).select(
        "user_id",
        F.col("value").alias("last_value"),
        F.col("event_id").alias("last_event_id"),
    )

@query(
    "stream_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
), stages AS (
  SELECT u.user_id,
         CASE WHEN p.user_id IS NOT NULL THEN 3
              WHEN c.user_id IS NOT NULL THEN 2
              WHEN v.user_id IS NOT NULL THEN 1
              ELSE 0 END AS stage
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN v ON u.user_id = v.user_id
  LEFT JOIN c ON u.user_id = c.user_id
  LEFT JOIN p ON u.user_id = p.user_id
)
SELECT stage, COUNT(*) AS n_users FROM stages GROUP BY stage
""",
)
def stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATEFUL streaming funnel: a per-user state machine
    (none -> view -> click-after-view -> purchase-after-click) held
    in the state store via applyInPandasWithState, keyed by user_id —
    state is distributed across executors exactly like production
    funnel tracking, one tiny (stage, anchor) record per user. Each
    micro-batch folds that user's events in (ts, event_id) order;
    replay slices are time-ordered (event_id is monotone in ts), so
    the greedy advance is exactly the batch first-touch chain and
    the final per-stage census hash-matches the batch SQL oracle —
    the strongest equivalence a stateful stream op can claim. Stage
    is monotone, so the final stage per user is the MAX over
    update-mode emissions."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    replay = write_replay_files(spark, sf_dir)
    st = stream_events(spark, replay)

    def handler(key, pdfs, state: GroupState):
        if state.exists:
            stage, anchor = state.get
        else:
            stage, anchor = 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for ts, etype in zip(rows["ts"], rows["event_type"]):
            us = int(ts.value) // 1000  # pandas ns -> us
            if stage == 0 and etype == "view":
                stage, anchor = 1, us
            elif stage == 1 and etype == "click" and us > anchor:
                stage, anchor = 2, us
            elif stage == 2 and etype == "purchase" and us > anchor:
                stage, anchor = 3, us
        state.update((stage, anchor))
        yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})

    snap = (
        st.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            handler,
            "user_id bigint, stage int",
            "stage int, anchor bigint",
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    out = run_to_memory(snap, _fresh("funnel"), mode="update")
    final = out.groupBy("user_id").agg(F.max("stage").alias("stage"))
    return final.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_users")
    )

@query(
    "stream_hll_wau",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), grid AS (
  SELECT DISTINCT day FROM ud
)
SELECT CAST(g.day AS TIMESTAMP) AS day,
       COUNT(DISTINCT u.user_id) AS exact_wau,
       TRUE AS est_ok
FROM grid g JOIN ud u
  ON u.day <= g.day AND u.day >= g.day - INTERVAL 6 DAY
GROUP BY g.day
""",
)
def stream_hll_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMED rolling weekly actives from mergeable sketches — the
    streaming twin of sketch_rolling_wau: each micro-batch folds its
    users into per-day HLL sketches appended via foreachBatch (a
    sketch-table write proportional to days-touched, never rows),
    the final rollup merges sketch fragments per day with
    hll_union_agg ACROSS batches, and each day's weekly estimate is
    the union of <= 7 daily sketches. Equality of the exact count +
    a within-5% sketch verdict against the batch oracle proves the
    fragments compose losslessly across arbitrary micro-batch
    boundaries — the mergeability contract that lets a 100 TB
    stream keep distinct counts with kilobytes of state per day."""
    import tempfile as _tf

    replay = write_replay_files(spark, sf_dir)
    st = stream_events(spark, replay)
    out_dir = scratch_dir(prefix="dms_hllwau_")

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        (
            bdf.groupBy(F.date_trunc("day", "ts").alias("day"))
            .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
            .write.mode("append")
            .parquet(out_dir)
        )

    with stream_conf(spark):
        q = (
            st.writeStream.foreachBatch(write_batch)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    daily = (
        spark.read.parquet(out_dir)
        .groupBy("day")
        .agg(F.expr("hll_union_agg(sk)").alias("sk"))
    )
    grid = daily.select(F.col("day").alias("g_day"))
    est = (
        F.broadcast(grid)
        .join(
            daily,
            (F.col("day") <= F.col("g_day"))
            & (F.col("day") >= F.expr("g_day - INTERVAL 6 DAYS")),
        )
        .groupBy("g_day")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
    )
    ev_batch = load(spark, sf_dir, "events")
    ud = ev_batch.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    exact = (
        F.broadcast(ud.select(F.col("day").alias("g_day")).distinct())
        .join(
            ud,
            (F.col("day") <= F.col("g_day"))
            & (F.col("day") >= F.expr("g_day - INTERVAL 6 DAYS")),
        )
        .groupBy("g_day")
        .agg(F.countDistinct("user_id").alias("exact_wau"))
    )
    return exact.join(est, "g_day").select(
        F.col("g_day").cast("timestamp_ntz").alias("day"),
        "exact_wau",
        (
            F.abs(F.col("est") - F.col("exact_wau"))
            / F.col("exact_wau")
            <= 0.05
        ).alias("est_ok"),
    )

@query(
    "stream_late_metrics",
    oracle="""
WITH b AS (
  SELECT date_trunc('hour', MAX(ts)) AS last_hour FROM events
)
SELECT CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS n_input,
       CAST((SELECT COUNT(*) FROM events e, b WHERE e.ts < b.last_hour)
            AS BIGINT) AS n_emitted,
       CAST((SELECT COUNT(*) FROM events e, b WHERE e.ts >= b.last_hour)
            AS BIGINT) AS n_open
""",
)
def stream_late_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode window-closure reconciliation under OUT-OF-ORDER
    replay — the audit an on-call runs before trusting a streaming
    table: engine-reported input rows (StreamingQueryProgress,
    summed over batches) vs rows the sink actually emitted. The
    first-hour slice is delivered LAST, after the watermark has
    advanced a month past it; availableNow still flushes every
    CLOSED window on wrap-up, so emitted = all rows except the final
    still-open hour (watermark = max ts - 10 min never passes its
    end), with nothing duplicated and nothing lost despite the
    out-of-order delivery. The oracle predicts all three numbers
    purely from the corpus, so the hash match pins this build's
    exact semantics — including the one-batch watermark lag that
    parks late rows in state instead of dropping them at ingestion
    (a final flush then emits their closed windows)."""
    import os
    import shutil
    import tempfile

    ev = load(spark, sf_dir, "events").orderBy("ts")
    cutoff = ev.agg(F.expr("min(ts) + INTERVAL 1 HOUR")).collect()[0][0]
    on_time = ev.filter(F.col("ts") > cutoff)
    late = ev.filter(F.col("ts") <= cutoff)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    replay = scratch_dir(prefix="dms_latem_")

    def add_file(part, idx):
        d = scratch_dir("dms_slice_")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
        dst = os.path.join(replay, f"{idx:04d}.parquet")
        shutil.copy(os.path.join(d, f), dst)
        os.utime(dst, (1_700_000_000 + 60 * idx,) * 2)
        shutil.rmtree(d, ignore_errors=True)

    add_file(on_time.select(*cols), 0)
    add_file(late.select(*cols), 1)

    st = stream_events(spark, replay)
    agg = (
        st.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    name = _fresh("latem")
    with stream_conf(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    n_input = sum(p["numInputRows"] for p in q.recentProgress)
    emitted = spark.table(name).agg(F.sum("cnt")).collect()[0][0] or 0
    return spark.createDataFrame(
        [(int(n_input), int(emitted), int(n_input - emitted))],
        "n_input bigint, n_emitted bigint, n_open bigint",
    )


@query(
    "stream_sessionize_state",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id)) > 1800
              OR LAG(ts) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, event_id, ts,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sess GROUP BY user_id, session_id
""",
)
def stream_sessionize_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATEFUL streaming sessionization: a per-user
    applyInPandasWithState processor carrying (session_id, n_events,
    start_us, last_us) across micro-batches — the 30-min-gap rule of
    win_sessionize as distributed keyed state instead of a batch
    window. Each batch folds that user's new events in (ts,
    event_id) order, opening a new session when the gap exceeds
    1800 s, and emits the latest snapshot of EVERY session it
    touched (a session that closes mid-batch still gets its final
    row). n_events is monotone within a session and batch slices are
    time-ordered, so the last emission per (user, session) IS the
    completed session, and the census hash-matches the batch SQL
    oracle — batch-boundary independence, the stream_funnel
    equivalence claim applied to sessionization. State per user is
    one 4-field record regardless of history length."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    replay = write_replay_files(spark, sf_dir)
    st = stream_events(spark, replay)

    def handler(key, pdfs, state: GroupState):
        if state.exists:
            sid, n_ev, start_us, last_us = state.get
        else:
            sid, n_ev, start_us, last_us = 0, 0, 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        touched = {}
        for ts in rows["ts"]:
            us = int(ts.value) // 1000  # pandas ns -> us
            if sid == 0 or us - last_us > 1_800_000_000:
                sid, n_ev, start_us = sid + 1, 0, us
            n_ev += 1
            last_us = us
            touched[sid] = (n_ev, start_us, last_us)
        state.update((sid, n_ev, start_us, last_us))
        if touched:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(touched),
                    "session_id": list(touched),
                    "n_events": [v[0] for v in touched.values()],
                    "start_us": [v[1] for v in touched.values()],
                    "end_us": [v[2] for v in touched.values()],
                }
            )

    snap = (
        st.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            handler,
            "user_id bigint, session_id bigint, n_events bigint,"
            " start_us bigint, end_us bigint",
            "sid bigint, n_ev bigint, start_us bigint, last_us bigint",
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    out = run_to_memory(snap, _fresh("sess_state"), mode="update")
    final = out.groupBy("user_id", "session_id").agg(
        F.max("n_events").alias("n_events"),
        F.min("start_us").alias("start_us"),
        F.max("end_us").alias("end_us"),
    )
    return final.select(
        "user_id",
        "session_id",
        "n_events",
        F.expr(
            "timestampadd(MICROSECOND, start_us,"
            " TIMESTAMP_NTZ'1970-01-01 00:00:00')"
        ).alias("session_start"),
        F.expr(
            "timestampadd(MICROSECOND, end_us,"
            " TIMESTAMP_NTZ'1970-01-01 00:00:00')"
        ).alias("session_end"),
    )


@query(
    "stream_minmax_state",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(MIN(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
         AS min_value,
       CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
         AS max_value,
       CAST(CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
            AS DOUBLE) / 100 AS total_value
FROM events GROUP BY event_type
""",
)
def stream_minmax_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed numeric state accumulators over the stream: per event
    type, a constant-size (count, min, max, sum) record updated by
    applyInPandasWithState each micro-batch — the running-metrics
    monitor every ingestion job keeps. Cents are exact integers in
    state, so accumulation is order- and batch-boundary-independent
    and the final update-mode snapshot per key (count is monotone —
    take the max-count row) hash-matches the batch GROUP BY oracle.
    State per key: four bigints, forever."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    replay = write_replay_files(spark, sf_dir)
    st = stream_events(spark, replay)

    def handler(key, pdfs, state: GroupState):
        if state.exists:
            n, mn, mx, s = state.get
        else:
            n, mn, mx, s = 0, None, None, 0
        for pdf in pdfs:
            cents = (pdf["value"] * 100).round().astype("int64")
            if len(cents):
                n += len(cents)
                cmn, cmx = int(cents.min()), int(cents.max())
                mn = cmn if mn is None else min(mn, cmn)
                mx = cmx if mx is None else max(mx, cmx)
                s += int(cents.sum())
        state.update((n, mn, mx, s))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_events": [n],
                "min_c": [mn],
                "max_c": [mx],
                "sum_c": [s],
            }
        )

    snap = (
        st.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            handler,
            "event_type string, n_events bigint, min_c bigint,"
            " max_c bigint, sum_c bigint",
            "n bigint, mn bigint, mx bigint, s bigint",
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    out = run_to_memory(snap, _fresh("minmax_state"), mode="update")
    w = out.groupBy("event_type").agg(
        F.max_by(
            F.struct("n_events", "min_c", "max_c", "sum_c"), F.col("n_events")
        ).alias("fin")
    )
    return w.select(
        "event_type",
        F.col("fin.n_events").alias("n_events"),
        (F.col("fin.min_c").cast("double") / 100).alias("min_value"),
        (F.col("fin.max_c").cast("double") / 100).alias("max_value"),
        (F.col("fin.sum_c").cast("double") / 100).alias("total_value"),
    )


@query(
    "stream_bitmap_state",
    oracle="""
SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
       CAST(bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER))
            AS BIGINT) AS presence_bitmap,
       CAST(bit_count(bit_or(CAST(1 AS BIGINT)
                             << CAST(user_id % 63 AS INTEGER)))
            AS INTEGER) AS n_slots
FROM events GROUP BY 1
""",
)
def stream_bitmap_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable BITMAP state over the stream: per week, one bigint
    whose bits record user presence slots (1 << user_id % 63),
    OR-merged in the state store each micro-batch — the
    agg_bitmap_presence primitive as keyed streaming state. Bit-OR
    is associative and idempotent, so the accumulated bitmap is
    independent of batch boundaries AND replay order, and the final
    snapshot (bitmap is monotone under OR — take the max-popcount
    row, tie-broken by the bitmap value itself since OR only adds
    bits) hash-matches the batch GROUP BY oracle. State per week:
    exactly one bigint."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    replay = write_replay_files(spark, sf_dir)
    st = stream_events(spark, replay)
    keyed = st.select(
        F.date_trunc("week", "ts").alias("week"), "user_id"
    )

    def handler(key, pdfs, state: GroupState):
        bm = state.get[0] if state.exists else 0
        for pdf in pdfs:
            for uid in pdf["user_id"]:
                bm |= 1 << (int(uid) % 63)
        state.update((bm,))
        yield pd.DataFrame({"week": [key[0]], "presence_bitmap": [bm]})

    snap = keyed.groupBy("week").applyInPandasWithState(
        handler,
        "week timestamp_ntz, presence_bitmap bigint",
        "bm bigint",
        "update",
        GroupStateTimeout.NoTimeout,
    )
    out = run_to_memory(snap, _fresh("bitmap_state"), mode="update")
    fin = out.groupBy("week").agg(
        F.max("presence_bitmap").alias("presence_bitmap")
    )
    return fin.select(
        "week",
        "presence_bitmap",
        F.bit_count("presence_bitmap").cast("int").alias("n_slots"),
    )


@query(
    "stream_decay_state",
    oracle="""
WITH RECURSIVE ev AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
), r AS (
  SELECT user_id, rn, c AS acc FROM ev WHERE rn = 1
  UNION ALL
  SELECT ev.user_id, ev.rn, ev.c + r.acc // 2 AS acc
  FROM r JOIN ev ON ev.user_id = r.user_id AND ev.rn = r.rn + 1
)
SELECT user_id,
       CAST(MAX(rn) AS BIGINT) AS n_events,
       CAST(arg_max(acc, rn) AS BIGINT) AS decay_acc
FROM r GROUP BY user_id
""",
)
def stream_decay_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed EXPONENTIAL-DECAY accumulator over the stream: per user,
    acc' = cents + acc // 2 folded in (ts, event_id) order — the
    recency-weighted activity score a freshness ranker keeps (each
    event's contribution halves with every subsequent event). The
    halving is INTEGER floor division, so state is one exact bigint:
    no float accumulation, no batch-boundary sensitivity beyond
    ordering — and slices replay in time order, so the stream fold
    equals the batch fold and the snapshot census (n_events is
    monotone — max-n row per user) hash-matches a DuckDB recursive
    CTE replaying the identical recurrence. The geometric series
    bounds state at 2x max cents regardless of history length —
    constant state per key, the same contract as
    stream_sessionize_state. Alpha is fixed at the dyadic 1/2
    precisely so quantization is exact in both engines; a float
    alpha would reintroduce cross-engine rounding drift."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    replay = write_replay_files(spark, sf_dir)
    st = stream_events(spark, replay)

    def handler(key, pdfs, state: GroupState):
        if state.exists:
            acc, n = state.get
        else:
            acc, n = 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        cents = (rows["value"] * 100).round().astype("int64")
        for c in cents:
            acc = int(c) + acc // 2
            n += 1
        state.update((acc, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "decay_acc": [acc],
            }
        )

    snap = (
        st.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            handler,
            "user_id bigint, n_events bigint, decay_acc bigint",
            "acc bigint, n bigint",
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    out = run_to_memory(snap, _fresh("decay_state"), mode="update")
    fin = out.groupBy("user_id").agg(
        F.max_by(
            F.struct("n_events", "decay_acc"), F.col("n_events")
        ).alias("fin")
    )
    return fin.select(
        "user_id",
        F.col("fin.n_events").alias("n_events"),
        F.col("fin.decay_acc").alias("decay_acc"),
    )
