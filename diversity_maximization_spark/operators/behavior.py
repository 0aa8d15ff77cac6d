"""Behavioral / product-analytics operators over the events table:
cohort retention, event-transition (Markov) matrix, peak-concurrency
sweep-line, daily anomaly z-scores, and SCD2 (type-2 slowly-changing
dimension) history building.

These are the event-log workloads a 100 TB analytics engine serves
daily. Scale notes per operator:

- retention_cohort: two shuffled aggs on user_id (first-touch, then
  cohort cell counts) — user_id is the natural high-cardinality
  partition key, no skew beyond real user skew (AQE handles).
- markov_transitions: one window over (user_id) — per-user sequences
  parallelize across users; the transition matrix itself is tiny
  (|event_type|^2) so the final agg collapses fast map-side.
- interval_concurrency: the naive sweep-line is ONE global-ordered
  running sum — a single-task scale-killer. Implemented instead as
  the two-phase decomposition: a per-day partitioned prefix sum
  (parallel across days) plus a day-level carry (window over the tiny
  per-day totals), recombined additively. The oracle IS the naive
  global form, so the hash match proves the decomposition exact.
- anomaly_daily_zscore: per-type daily counts then a per-type window
  — parallelism = number of series, the standard anomaly shape.
- scd2_history: lag/lead over (user_id, ts) — the CDC-to-dimension
  compaction every lakehouse runs; one shuffle on the entity key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..scratch import scratch_dir
from ..sources import load


@query(
    "retention_cohort",
    oracle="""
WITH first AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
)
SELECT CAST(date_trunc('week', f.first_ts) AS TIMESTAMP) AS cohort_week,
       CAST(date_diff('day', date_trunc('week', f.first_ts),
                      date_trunc('week', e.ts)) / 7 AS INT) AS week_offset,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e JOIN first f USING (user_id)
GROUP BY 1, 2
""",
)
def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by the week of
    their first event; each cell counts distinct users from that
    cohort active N weeks later. Week offsets are exact day-diffs of
    week-truncated timestamps divided by 7 (always integral), so no
    engine-specific week-number arithmetic is involved."""
    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    return (
        ev.join(first, "user_id")
        .select(
            F.date_trunc("week", "first_ts").alias("cohort_week"),
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")),
                    F.date_trunc("week", F.col("first_ts")),
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "markov_transitions",
    oracle="""
WITH seq AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type, next_type, COUNT(*) AS n,
       CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY event_type) AS p
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
""",
)
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix: for each user's time-ordered
    event sequence (ties broken by event_id), count type->next-type
    pairs and normalize to per-source-type probabilities. p is an
    exact-integer ratio rounded to 6 dp, so the hash is stable."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "event_id", "ts", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
    )
    trans = pairs.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_src = Window.partitionBy("event_type")
    return trans.select(
        "event_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(per_src)).alias("p"),
    )


@query(
    "interval_concurrency",
    oracle="""
WITH deltas AS (
  SELECT ts AS t, 1 AS delta, event_id FROM events
  UNION ALL
  SELECT ts + INTERVAL 30 MINUTE AS t, -1 AS delta, event_id FROM events
), run AS (
  SELECT t, SUM(delta) OVER (ORDER BY t, delta, event_id
                             ROWS UNBOUNDED PRECEDING) AS cur
  FROM deltas
)
SELECT CAST(date_trunc('day', t) AS TIMESTAMP) AS day,
       CAST(MAX(cur) AS BIGINT) AS peak
FROM run GROUP BY 1
""",
)
def interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent 30-minute event windows per day, by sweep-line.

    The oracle is the textbook single-ordered running sum (+1 at each
    start, -1 at each end). That form is a one-task bottleneck at
    scale, so the Spark plan decomposes it: within-day prefix sums run
    partitioned by day (parallel), a day-level cumulative carry runs
    over the tiny per-day totals, and peak(day) = carry + max(prefix).
    Exact because day(t) is monotone in the global sweep order — the
    hash match against the naive oracle proves the decomposition.

    Tie discipline: ends sort before starts at the same instant
    (delta -1 < +1), then event_id — a total order on both engines.
    """
    ev = load(spark, sf_dir, "events")
    starts = ev.select(
        F.col("ts").alias("t"), F.lit(1).alias("delta"), "event_id"
    )
    ends = ev.select(
        F.expr("ts + INTERVAL 30 MINUTES").alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    deltas = starts.unionAll(ends).withColumn(
        "day", F.date_trunc("day", "t")
    )
    in_day = (
        Window.partitionBy("day")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pref = deltas.withColumn("prefix", F.sum("delta").over(in_day))
    day_tot = pref.groupBy("day").agg(
        F.sum("delta").alias("day_delta"), F.max("prefix").alias("day_peak")
    )
    carry_w = (  # bounded: O(days) daily rollup
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return day_tot.select(
        "day",
        (
            F.sum("day_delta").over(carry_w)
            - F.col("day_delta")
            + F.col("day_peak")
        ).alias("peak"),
    )


@query(
    "anomaly_daily_zscore",
    oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS n
  FROM events GROUP BY event_type, date_trunc('day', ts)
)
SELECT event_type, CAST(day AS TIMESTAMP) AS day, n,
       round((n - AVG(n) OVER t) / nullif(stddev_samp(n) OVER t, 0), 4) AS z
FROM daily
WINDOW t AS (PARTITION BY event_type)
""",
)
def anomaly_daily_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-count anomaly scores: z-score of each day's count
    against that event type's own daily distribution. Rounded to 4 dp
    on O(1) magnitudes (same discipline as udf_grouped_map — the two
    engines' stddev accumulation orders differ at ~1e-12 relative).
    Zero variance (a type with identical counts every day) is pinned
    to NULL in BOTH engines via nullif / a when-guard: Spark's
    non-ANSI x/0.0 is NULL but DuckDB's is inf, so the unguarded form
    hash-diverges on constant series (ADVICE r02).
    Parallelism = number of series; the window partitions by type."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    t = Window.partitionBy("event_type")
    sd = F.stddev_samp("n").over(t)
    return daily.select(
        "event_type",
        "day",
        "n",
        F.round(
            (F.col("n") - F.avg("n").over(t))
            / F.when(sd != 0, sd),
            4,
        ).alias("z"),
    )


@query(
    "scd2_history",
    oracle="""
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), changes AS (
  SELECT user_id, event_type AS state, ts AS valid_from, event_id
  FROM marked
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, state, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from, event_id) AS valid_to,
       lead(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from, event_id) IS NULL
         AS is_current
FROM changes
""",
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: compact each user's
    event stream into validity ranges of their current event_type
    "state" — a row per state change carrying [valid_from, valid_to)
    and an is_current flag. The CDC-to-dimension compaction pattern:
    one shuffle on the entity key, two stacked windows over the same
    partitioning (Catalyst plans a single Exchange + two Window
    nodes, no second shuffle)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            "event_id",
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


def _rolling_user_days(ev: DataFrame) -> DataFrame:
    """(g_day, day, user_id): each day-grid row paired with the
    distinct user-days inside its trailing 7-day window, via a
    broadcast day-grid range join — the shared exact substrate of
    rolling_dau and sketch_rolling_wau's verification branch."""
    ud = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    grid = ud.select("day").distinct()
    return F.broadcast(grid.withColumnRenamed("day", "g_day")).join(
        ud,
        (F.col("day") <= F.col("g_day"))
        & (F.col("day") >= F.expr("g_day - INTERVAL 6 DAYS")),
    )


@query(
    "rolling_dau",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), grid AS (
  SELECT DISTINCT day FROM ud
)
SELECT CAST(g.day AS TIMESTAMP) AS day,
       COUNT(DISTINCT CASE WHEN u.day = g.day THEN u.user_id END) AS dau,
       COUNT(DISTINCT u.user_id) AS wau
FROM grid g JOIN ud u
  ON u.day <= g.day AND u.day >= g.day - INTERVAL 6 DAY
GROUP BY g.day
""",
)
def rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily and rolling-7-day active users per day. COUNT(DISTINCT)
    over a sliding range is not window-expressible in Spark, so the
    rolling set is materialized as (day-grid) ⋈ (distinct user-days)
    range join. Scale shape: the day grid is one row per day —
    broadcast — while the big side is the deduplicated (user, day)
    pairs (one shuffled distinct), so the range join is a broadcast
    fan-out of ≤7 grid rows per user-day, then one count-distinct agg
    keyed by day. No all-pairs anything."""
    ev = load(spark, sf_dir, "events")
    return (
        _rolling_user_days(ev)
        .groupBy("g_day")
        .agg(
            F.countDistinct(
                F.when(F.col("day") == F.col("g_day"), F.col("user_id"))
            ).alias("dau"),
            F.countDistinct("user_id").alias("wau"),
        )
        .withColumnRenamed("g_day", "day")
    )


@query(
    "time_to_conversion",
    oracle="""
WITH s AS (
  SELECT user_id, MIN(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS first_purchase_ts
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
  GROUP BY e.user_id
)
SELECT s.user_id, s.signup_ts, p.first_purchase_ts,
       CAST(date_diff('microsecond', s.signup_ts, p.first_purchase_ts)
            AS DOUBLE) / 3600000000 AS hours_to_convert
FROM s JOIN p USING (user_id)
""",
)
def time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion latency per user: first signup,
    first subsequent purchase, and the gap in hours (exact integer
    microseconds / 3.6e9 — deterministic double; whole-second diffs
    disagree between engines on sub-second timestamps: Spark
    truncates the full interval, DuckDB counts boundary crossings). Two aggs on user_id plus
    one equi-join, all on the same shuffle key, so Catalyst reuses
    one Exchange lineage — the funnel-latency companion to
    funnel_signup_purchase."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    return s.join(p, "user_id").select(
        "user_id",
        "signup_ts",
        "first_purchase_ts",
        (
            F.expr(
                "CAST(timestampdiff(MICROSECOND, signup_ts,"
                " first_purchase_ts) AS DOUBLE)"
            )
            / 3600000000
        ).alias("hours_to_convert"),
    )


@query(
    "mv_incremental_refresh",
    oracle="""
SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100
         AS total_value
FROM events
GROUP BY event_type, date_trunc('day', ts)
""",
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a daily per-type
    aggregate MV is materialized to parquet for history (days before
    2024-01-16), then refreshed by merging ONLY the delta partition's
    partial aggregate — never rescanning history. The oracle is the
    full recompute over all events, so the hash match proves
    merge-refresh ≡ recompute (exact integer cents make the two-level
    sum associative). At 100 TB this is the difference between an
    O(delta) nightly refresh and an O(history) one."""
    import tempfile

    ev = load(spark, sf_dir, "events")
    split = "2024-01-16"

    def day_agg(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias(
                "cents"
            ),
        )

    mv_dir = scratch_dir(prefix="dms_mv_")
    day_agg(ev.filter(F.col("ts") < split)).write.mode(
        "overwrite"
    ).parquet(mv_dir)
    base = spark.read.parquet(mv_dir)
    delta = day_agg(ev.filter(F.col("ts") >= split))
    return (
        base.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
        .select(
            "event_type",
            "day",
            "n",
            (F.col("cents").cast("double") / 100).alias("total_value"),
        )
    )


@query(
    "sketch_rolling_wau",
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
def sketch_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct actives from MERGEABLE daily HLL
    sketches: one sketch per day (a single pass over events), then
    each day's weekly estimate is the union of ≤7 daily sketches —
    no re-touching of raw user ids. This is how rolling distinct
    counts are served at 100 TB: the exact form (rolling_dau)
    re-shuffles raw (user, day) pairs per window, the sketch form
    shuffles ~1.5 kB per day. Estimates are engine-specific, so the
    key emits the exact count plus a within-5% flag for the sketch
    estimate; the oracle returns exact + TRUE (same formulation as
    sketch_hll_merge)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
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
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
        )
    )
    exact = (
        _rolling_user_days(ev)
        .groupBy("g_day")
        .agg(F.countDistinct("user_id").alias("exact_wau"))
    )
    return (
        exact.join(est, "g_day")
        .select(
            F.col("g_day").alias("day"),
            "exact_wau",
            (
                F.abs(F.col("est") - F.col("exact_wau"))
                / F.col("exact_wau")
                <= 0.05
            ).alias("est_ok"),
        )
    )


@query(
    "win_gaps_islands",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), numbered AS (
  SELECT user_id,
         date_diff('day', DATE '2024-01-01', day) AS day_num,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM ud
), islands AS (
  SELECT user_id, day_num - rn AS anchor, COUNT(*) AS streak_len
  FROM numbered GROUP BY user_id, day_num - rn
)
SELECT user_id,
       CAST(SUM(streak_len) AS BIGINT) AS n_active_days,
       COUNT(*) AS n_streaks,
       CAST(MAX(streak_len) AS BIGINT) AS longest_streak
FROM islands GROUP BY user_id
""",
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's consecutive-active-day streaks.
    The classic trick — numbering a user's distinct days makes
    (day_number - row_number) constant exactly within a consecutive
    run, so one window plus two aggs finds every streak with no
    self-join. Day numbers are exact integer day-diffs from a fixed
    date (no epoch/tz arithmetic). Shape: one shuffled distinct on
    (user, day), one per-user window, two aggs on the same key
    lineage — the engagement-streak query every analytics team
    ships."""
    ev = load(spark, sf_dir, "events")
    ud = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    numbered = ud.select(
        "user_id",
        F.datediff(F.col("day"), F.lit("2024-01-01")).alias("day_num"),
        F.row_number().over(w).alias("rn"),
    )
    islands = numbered.groupBy(
        "user_id", (F.col("day_num") - F.col("rn")).alias("anchor")
    ).agg(F.count(F.lit(1)).alias("streak_len"))
    return islands.groupBy("user_id").agg(
        F.sum("streak_len").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("streak_len").alias("longest_streak"),
    )


@query(
    "seq_pattern_match",
    oracle="""
WITH seq AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type, 1) OVER w AS t1, lag(ts, 1) OVER w AS ts1,
         lag(event_type, 2) OVER w AS t2, lag(ts, 2) OVER w AS ts2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id, ts AS purchase_ts, ts1 AS click_ts, ts2 AS view_ts
FROM seq
WHERE event_type = 'purchase' AND t1 = 'click' AND t2 = 'view'
  AND epoch(ts) - epoch(ts2) <= 3600
""",
)
def seq_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching (the MATCH_RECOGNIZE shape SQL
    engines bolt on, expressed with lag chains): emit every
    view -> click -> purchase run of three CONSECUTIVE events by one
    user completing within an hour. One window partitioning (by
    user), two lags — a single Exchange at any scale, and each match
    row carries the full timeline for attribution."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_sec = F.col("ts").cast("timestamp").cast("double")
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.lag("event_type", 1).over(w).alias("t1"),
        F.lag("ts", 1).over(w).alias("ts1"),
        F.lag("event_type", 2).over(w).alias("t2"),
        F.lag("ts", 2).over(w).alias("ts2"),
        (ts_sec - F.lag(ts_sec, 2).over(w)).alias("span"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "purchase")
            & (F.col("t1") == "click")
            & (F.col("t2") == "view")
            & (F.col("span") <= 3600)
        )
        .select(
            "user_id",
            "event_id",
            F.col("ts").alias("purchase_ts"),
            F.col("ts1").alias("click_ts"),
            F.col("ts2").alias("view_ts"),
        )
    )

@query(
    "attribution_last_touch",
    oracle="""
WITH touched AS (
  SELECT event_type, value,
         LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
  FROM events
)
SELECT COALESCE(channel, '(direct)') AS channel,
       COUNT(*) AS n_purchases,
       CAST(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
            / 100 AS DOUBLE) AS revenue
FROM touched
WHERE event_type = 'purchase'
GROUP BY 1
""",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to
    the most recent PRIOR non-purchase event of the same user (the
    carried channel), '(direct)' when the purchase is the user's
    first event. One window per user (ignore-nulls last over the
    strictly-preceding frame), then a tiny per-channel rollup —
    a single Exchange on user_id regardless of scale, the same shape
    ad-attribution pipelines run over trillions of touches. Revenue
    goes through exact integer cents (associative, order-free)."""
    return last_touch_attribution(
        load(spark, sf_dir, "events"),
        user_col="user_id",
        ts_col="ts",
        tiebreak_col="event_id",
        type_col="event_type",
        conversion="purchase",
        value_col="value",
    )


def last_touch_attribution(
    df,
    user_col: str,
    ts_col: str,
    tiebreak_col: str,
    type_col: str,
    conversion: str,
    value_col: str,
) -> DataFrame:
    """Generic last-touch attribution over any event DataFrame (the
    library form of attribution_last_touch): one window per user
    carrying the most recent non-conversion type, then a per-channel
    rollup with exact integer cents."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    channel = F.last(
        F.when(F.col(type_col) != conversion, F.col(type_col)),
        ignorenulls=True,
    ).over(w)
    return (
        df.select(user_col, tiebreak_col, ts_col, type_col, value_col)
        .withColumn("channel", channel)
        .filter(F.col(type_col) == conversion)
        .groupBy(F.coalesce("channel", F.lit("(direct)")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            (
                F.sum(
                    F.expr(f"CAST(ROUND({value_col} * 100) AS BIGINT)")
                ).cast("double")
                / 100
            ).alias("revenue"),
        )
    )


@query(
    "anomaly_mad_robust",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
), med AS (
  SELECT event_type, median(n) AS med FROM daily GROUP BY 1
), mad AS (
  SELECT d.event_type, med,
         median(abs(n - med)) AS mad
  FROM daily d JOIN med USING (event_type)
  GROUP BY d.event_type, med
)
SELECT d.event_type, day, n, med, mad,
       0.6745 * (n - med) / nullif(mad, 0) AS robust_z,
       COALESCE(abs(0.6745 * (n - med) / nullif(mad, 0)) > 3.5,
                FALSE) AS is_anomaly
FROM daily d JOIN mad ON d.event_type = mad.event_type
""",
)
def anomaly_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) daily-count anomaly detection per event
    type — the outlier-resistant companion to anomaly_daily_zscore:
    a burst day cannot drag its own threshold the way it drags a
    mean/stddev. med and MAD are EXACT interpolated medians
    (percentile 0.5: the midpoint of two integers, then of two such
    midpoints — identical IEEE arithmetic in both engines), the
    robust z is the standard 0.6745 scaling, pinned NULL when MAD=0
    (constant series). Shape: one daily rollup, two tiny per-type
    aggs, one broadcast-back join — the per-series state is O(types),
    never O(days)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(n, 0.5)").alias("med")
    )
    mad = (
        daily.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.expr("percentile(abs(n - med), 0.5)").alias("mad"))
    )
    z = 0.6745 * (F.col("n") - F.col("med")) / F.nullif(
        F.col("mad"), F.lit(0.0)
    )
    return (
        daily.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "day",
            "n",
            "med",
            "mad",
            z.alias("robust_z"),
            F.coalesce(F.abs(z) > 3.5, F.lit(False)).alias("is_anomaly"),
        )
    )


@query(
    "ts_wow_change",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
)
SELECT c.day,
       CAST(c.cents AS DOUBLE) / 100 AS revenue,
       CAST(p.cents AS DOUBLE) / 100 AS revenue_prev_week,
       (c.cents - p.cents) AS delta_cents,
       CAST(c.cents - p.cents AS DOUBLE) / p.cents AS wow_change
FROM daily c JOIN daily p ON p.day = c.day - INTERVAL 7 DAY
""",
)
def ts_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue change, CALENDAR-aligned: each day is
    compared to the day exactly 7 days earlier by an equi-join on
    the shifted date — not LAG(7), which silently mis-aligns the
    moment a day is missing from the series. Cents are exact
    integers, so delta and ratio are deterministic; the self-join is
    on the tiny daily rollup (O(days) rows), not the fact table."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias("cents")
    )
    prev = daily.select(
        (F.col("day") + F.expr("INTERVAL 7 DAYS")).alias("day"),
        F.col("cents").alias("p_cents"),
    )
    return daily.join(prev, "day").select(
        "day",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        (F.col("p_cents").cast("double") / 100).alias("revenue_prev_week"),
        (F.col("cents") - F.col("p_cents")).alias("delta_cents"),
        (
            (F.col("cents") - F.col("p_cents")).cast("double")
            / F.col("p_cents")
        ).alias("wow_change"),
    )

@query(
    "funnel_multi_step",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_view_click,
       (SELECT COUNT(*) FROM p) AS n_view_click_purchase,
       CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
         / (SELECT COUNT(*) FROM v) AS conv_step2,
       CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
         / nullif((SELECT COUNT(*) FROM c), 0) AS conv_step3
""",
)
def funnel_multi_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel (view -> click -> purchase): a user
    advances a stage only with an event STRICTLY AFTER their previous
    stage's first event — the sequencing every funnel tool promises
    and a bare COUNT(DISTINCT) funnel silently fakes. Three
    first-touch aggregates chained by user_id equi-joins, all on the
    same shuffle key lineage, then single-row stage counts with
    exact-integer conversion ratios."""
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(
            p.agg(F.count(F.lit(1)).alias("n_view_click_purchase"))
        )
    )
    return counts.select(
        "n_view",
        "n_view_click",
        "n_view_click_purchase",
        (
            F.col("n_view_click").cast("double") / F.col("n_view")
        ).alias("conv_step2"),
        (
            F.col("n_view_click_purchase").cast("double")
            / F.nullif(F.col("n_view_click"), F.lit(0))
        ).alias("conv_step3"),
    )

@query(
    "survival_km",
    oracle="""
WITH s AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS tp
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s.t0
  GROUP BY e.user_id
), durs AS (
  SELECT s.user_id,
         CASE WHEN p.tp IS NOT NULL
              THEN CAST(floor((epoch_us(p.tp) - epoch_us(s.t0))
                              / 86400000000) AS BIGINT)
              ELSE CAST(floor((epoch_us(TIMESTAMP '2024-01-31 00:00:00')
                               - epoch_us(s.t0)) / 86400000000) AS BIGINT)
         END AS dur,
         CASE WHEN p.tp IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM s LEFT JOIN p ON s.user_id = p.user_id
), risk AS (
  SELECT dur, CAST(SUM(ev) AS BIGINT) AS n_events,
         CAST(COUNT(*) - SUM(ev) AS BIGINT) AS n_censored,
         CAST(COUNT(*) AS BIGINT) AS n_total
  FROM durs GROUP BY dur
), tbl AS (
  SELECT dur, n_events, n_censored,
         CAST(SUM(n_total) OVER (ORDER BY dur
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
              AS BIGINT) AS n_at_risk
  FROM risk
), curve AS (
  SELECT dur, n_events, n_censored, n_at_risk,
         list(1.0 - CAST(n_events AS DOUBLE) / n_at_risk)
           OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS fs
  FROM tbl
)
SELECT dur AS day, n_at_risk, n_events, n_censored,
       CAST(n_events AS DOUBLE) / n_at_risk AS hazard,
       list_reduce(fs, (a, x) -> a * x) AS survival
FROM curve WHERE n_events > 0
""",
)
def survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for signup -> first purchase with
    RIGHT-CENSORING (users who never purchase are censored at the
    2024-01-31 study end) — the estimator behind every retention /
    time-to-convert curve that doesn't throw away non-converters.
    Per event day: at-risk count (reverse cumulative total), deaths,
    censorings, hazard d/n, and S(t) = prod(1 - d_j/n_j). The curve
    arithmetic runs on the O(distinct days) risk table, so the
    global windows are oracle-shape-tiny; the per-user reduction is
    two first-touch aggs + one equi-join on user_id. The cumulative
    product is a SEQUENTIAL left fold over the per-day factor list
    in BOTH engines (list fold, not a product aggregate), so the
    doubles hash bit-identically — multiplying the skipped zero-event
    days' exact 1.0 factors is a no-op by IEEE."""
    ev = load(spark, sf_dir, "events")
    end_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'2024-01-01 00:00:00',"
        " TIMESTAMP_NTZ'2024-01-31 00:00:00')"
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    diff_us = F.when(
        F.col("tp").isNotNull(),
        F.expr("timestampdiff(MICROSECOND, t0, tp)").cast("double"),
    ).otherwise(
        end_us.cast("double")
        - F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ'2024-01-01 00:00:00', t0)"
        ).cast("double")
    )
    durs = s.join(p, "user_id", "left").select(
        F.floor(diff_us / 86400000000).cast("long").alias("dur"),
        F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    return km_curve(durs, dur_col="dur", event_col="ev")


def km_curve(durs: DataFrame, dur_col: str, event_col: str) -> DataFrame:
    """Kaplan-Meier estimator over any (duration, event 0/1)
    DataFrame — the library form of survival_km. Collapses to the
    O(distinct durations) risk table, reverse-cumulative at-risk
    counts, and a sequential left-fold cumulative product.

    Scale design: NO unpartitioned Window — both order-by-dur prefix
    passes use the plans/global_rank two-phase machinery (pinned in
    test_plans.py). The risk table is range-bucketed on dur; the
    at-risk count is grand_total minus (driver-side cumulative of
    per-bucket subtotals + a bucket-PARTITIONED running sum), exact
    integers throughout. The survival product must stay a sequential
    IEEE left fold to hash-match the oracle, so it chains through
    buckets: one driver pass over the per-bucket ORDERED factor
    arrays (zero-event days carry an exact 1.0 factor — skipping
    them is an IEEE no-op, so only event days fold) computes each
    bucket's entering prefix, and each row finishes with
    aggregate(local_factors, entering, a*x). Driver state is
    O(distinct event durations) — the size of the OUTPUT curve —
    never the per-subject rows."""
    from ..plans.global_rank import with_range_bucket

    risk = durs.groupBy(F.col(dur_col).alias("dur")).agg(
        F.sum(event_col).cast("long").alias("n_events"),
        (F.count(F.lit(1)) - F.sum(event_col))
        .cast("long")
        .alias("n_censored"),
        F.count(F.lit(1)).alias("n_total"),
    )
    rb = with_range_bucket(
        risk, "dur", num_buckets=None
    ).localCheckpoint(eager=False)

    subtotals = {
        r["_gr_bucket"]: r["bt"]
        for r in rb.groupBy("_gr_bucket")
        .agg(F.sum("n_total").alias("bt"))
        .collect()
    }
    grand = sum(subtotals.values())
    offsets, acc = {}, 0
    for b in sorted(subtotals):
        offsets[b] = acc  # rows in buckets strictly before b
        acc += subtotals[b]
    off_map = F.create_map(
        *[F.lit(x) for b in sorted(offsets) for x in (b, offsets[b])]
    )
    w_before = Window.partitionBy("_gr_bucket").orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tbl = rb.select(
        "_gr_bucket",
        "dur",
        "n_events",
        "n_censored",
        (
            F.lit(grand)
            - F.element_at(off_map, F.col("_gr_bucket"))
            - F.coalesce(F.sum("n_total").over(w_before), F.lit(0))
        ).cast("long").alias("n_at_risk"),
    )
    factor = F.lit(1.0) - F.col("n_events").cast("double") / F.col(
        "n_at_risk"
    )
    # no checkpoint here: recomputing the bucket-partitioned window
    # over the O(distinct durs) risk table (behind the rb checkpoint)
    # is cheap, and keeping the lineage open leaves BOTH prefix
    # passes visible in the executed plan for the test_plans pin.
    evd = tbl.filter(F.col("n_events") > 0)

    arrs = (
        evd.select("_gr_bucket", F.struct("dur", factor.alias("f")).alias("s"))
        .groupBy("_gr_bucket")
        .agg(F.sort_array(F.collect_list("s")).alias("a"))
        .collect()
    )
    entering, accp = {}, 1.0
    for r in sorted(arrs, key=lambda r: r["_gr_bucket"]):
        entering[r["_gr_bucket"]] = accp
        for s in r["a"]:
            accp = accp * s["f"]  # Python float == IEEE double
    ent_map = F.create_map(
        *[F.lit(x) for b in sorted(entering) for x in (b, entering[b])]
    )
    w_fwd = Window.partitionBy("_gr_bucket").orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = evd.withColumn("fs", F.collect_list(factor).over(w_fwd))
    return curve.select(
        F.col("dur").alias("day"),
        "n_at_risk",
        "n_events",
        "n_censored",
        (F.col("n_events").cast("double") / F.col("n_at_risk")).alias(
            "hazard"
        ),
        F.aggregate(
            "fs",
            F.element_at(ent_map, F.col("_gr_bucket")).cast("double"),
            lambda a, x: a * x,
        ).alias("survival"),
    )

@query(
    "ltv_cohort_curve",
    oracle="""
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP)
           AS cohort_week
  FROM events GROUP BY user_id
), sized AS (
  SELECT cohort_week, COUNT(*) AS cohort_users FROM first GROUP BY 1
), cells AS (
  SELECT f.cohort_week,
         CAST(date_diff('day', f.cohort_week,
                        date_trunc('week', e.ts)) / 7 AS INT)
           AS week_offset,
         CAST(SUM(CASE WHEN e.event_type = 'purchase'
                  THEN CAST(ROUND(e.value * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS cents
  FROM events e JOIN first f USING (user_id)
  GROUP BY 1, 2
)
SELECT c.cohort_week, c.week_offset, s.cohort_users,
       CAST(SUM(c.cents) OVER (PARTITION BY c.cohort_week
                               ORDER BY c.week_offset
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         / 100 / s.cohort_users AS cum_ltv_per_user
FROM cells c JOIN sized s USING (cohort_week)
""",
)
def ltv_cohort_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve — the revenue triangle every growth team
    tracks: users cohorted by first-touch week, purchase revenue
    bucketed by weeks-since-cohort, and the CUMULATIVE
    revenue-per-cohort-user read off a running window over the tiny
    (cohort x offset) cell table. Exact integer cents make the
    cumulative sum order-free; the only windows run over O(weeks^2)
    cells. Same first-touch chain as retention_cohort, so the two
    reports share their heavy aggregation shape."""
    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    sized = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    cells = (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.expr("CAST(ROUND(value * 100) AS BIGINT)"),
                ).otherwise(0)
            ).alias("cents")
        )
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.join(F.broadcast(sized), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "cohort_users",
            (
                F.sum("cents").over(w).cast("double")
                / 100
                / F.col("cohort_users")
            ).alias("cum_ltv_per_user"),
        )
    )

def _gauss_jordan(A):
    """Fixed-order Gauss-Jordan elimination (NO pivoting) on an
    augmented n x (n+1) matrix; returns [A[i][n] / A[i][i]]. The
    exact operation ORDER — ``f = A[i][p] / A[p][p]`` then
    ``A[i][j] - f * A[p][j]`` over the PRE-STEP row values — is the
    cross-engine contract: the DuckDB oracles for markov_absorption
    and attribution_markov_removal replay the identical IEEE-double
    sequence as unrolled MATERIALIZED CTE steps, so the results are
    bit-identical and the keys hash-match without tolerance. No
    pivoting is safe here: every solved (I - Q) block is (weakly
    chained) diagonally dominant because each solve row keeps escape
    mass (absorption or sink). Matrices are |event types|-sized, so
    the O(n^3) driver cost is trivial."""
    n = len(A)
    for p in range(n):
        piv = A[p]
        for i in range(n):
            if i == p:
                continue
            f = A[i][p] / piv[p]
            A[i] = [A[i][j] - f * piv[j] for j in range(n + 1)]
    return [A[i][n] / A[i][i] for i in range(n)]


def absorption_expected_steps(trans_counts, absorbing: str):
    """Expected steps to absorption for each transient state of a
    Markov chain given raw transition COUNTS {(a, b): n}. Returns
    {state: expected_steps}; the linear solve is O(|states|^3) on
    the driver — states are event types, a handful — while the
    counts come from the distributed transition aggregate.

    States that cannot reach the absorbing state — dead ends with
    no outgoing transitions, and members of closed non-absorbing
    classes — are detected by backward reachability FIRST and get
    +inf, and the solve runs ONLY over the can-reach block. That
    keeps the restricted (I - Q) nonsingular (every solve state has
    escape mass, spectral radius < 1), so no blanket-inf fallback:
    a dead-end event type reports inf, never a bogus 1.0, and one
    closed class cannot poison every other state's answer. For a
    can-reach state the value is the expected steps until the walk
    leaves the can-reach block (absorbed, or lost to a dead end)."""
    states = sorted({a for a, _ in trans_counts} | {b for _, b in trans_counts})
    transient = [s for s in states if s != absorbing]
    rev: dict = {}
    for (a, b), n in trans_counts.items():
        if n > 0:
            rev.setdefault(b, set()).add(a)
    can_reach: set = set()
    frontier = [absorbing]
    while frontier:
        x = frontier.pop()
        for p in rev.get(x, ()):
            if p != absorbing and p not in can_reach:
                can_reach.add(p)
                frontier.append(p)
    solve_states = [s for s in transient if s in can_reach]
    idx = {s: i for i, s in enumerate(solve_states)}
    row_total: dict = {}
    for (a, _), n in trans_counts.items():
        row_total[a] = row_total.get(a, 0) + n
    q: dict = {}
    for (a, b), n in trans_counts.items():
        if a in idx and b in idx:
            k = (idx[a], idx[b])
            q[k] = q.get(k, 0.0) + n / row_total[a]
    m = len(solve_states)
    A = [
        [(1.0 if i == j else 0.0) - q.get((i, j), 0.0) for j in range(m)]
        + [1.0]
        for i in range(m)
    ]
    t = _gauss_jordan(A)
    out = {s: float("inf") for s in transient}
    out.update({s: t[idx[s]] for s in solve_states})
    return out


_GJ_PIVOTS = 6  # >= max transient states (5 event types); extra pivots no-op


def _gauss_chain(src: str, keys: str, pivots: int = _GJ_PIVOTS) -> str:
    """Unrolled Gauss-Jordan CTE chain over an augmented cell table
    ``src(i, j, v)`` (plus optional extra grouping ``keys`` like
    'd,'). Each step replays _gauss_jordan's pivot-p update with the
    identical IEEE op order: f = A[i][p]/A[p][p]; v - f*A[p][j],
    all cells read from the PREVIOUS step's snapshot. Pivots past
    the matrix size find no pivot row (pe.v IS NULL) and pass cells
    through unchanged. MATERIALIZED is load-bearing: each step
    references its predecessor four times, so inlining would expand
    4^pivots scans."""
    parts = []
    prev = src
    for p in range(pivots):
        g = f"gj{p + 1}"
        extra_c = (
            " AND ".join(f"pc.{k} = c.{k}" for k in keys.split(",") if k)
            + " AND "
            if keys
            else ""
        )
        parts.append(
            f""", {g} AS MATERIALIZED (
  SELECT c.* EXCLUDE (v),
         CASE WHEN c.i = {p} OR pe.v IS NULL THEN c.v
              ELSE c.v - (pc.v / pe.v) * pr.v END AS v
  FROM {prev} c
  LEFT JOIN {prev} pc ON {extra_c}pc.i = c.i AND pc.j = {p}
  LEFT JOIN {prev} pr ON {extra_c.replace('pc.', 'pr.')}pr.i = {p} AND pr.j = c.j
  LEFT JOIN {prev} pe ON {extra_c.replace('pc.', 'pe.')}pe.i = {p} AND pe.j = {p}
)"""
        )
        prev = g
    return "".join(parts)


def _markov_absorption_oracle() -> str:
    """DuckDB replay of markov_absorption: transition counts, the
    backward-reachability rounds, then the exact _gauss_jordan
    elimination unrolled (see _gauss_chain). Rounded via round_even
    == Python round() half-even."""
    reach = []
    for r in range(1, _GJ_PIVOTS + 1):
        reach.append(
            f""", r{r} AS MATERIALIZED (
  SELECT DISTINCT s FROM (
    SELECT s FROM r{r - 1}
    UNION ALL
    SELECT tc.a AS s FROM tc JOIN r{r - 1} q ON tc.b = q.s
  )
)"""
        )
    return f"""
WITH seq AS MATERIALIZED (
  SELECT event_type AS a,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS b
  FROM events
), tc AS MATERIALIZED (
  SELECT a, b, COUNT(*) AS n FROM seq WHERE b IS NOT NULL GROUP BY a, b
), st AS MATERIALIZED (
  SELECT DISTINCT s FROM (SELECT a AS s FROM tc UNION ALL SELECT b FROM tc)
), r0 AS MATERIALIZED (SELECT CAST('purchase' AS VARCHAR) AS s)
{''.join(reach)}
, solve AS MATERIALIZED (
  SELECT s, CAST(ROW_NUMBER() OVER (ORDER BY s) AS INTEGER) - 1 AS i
  FROM r{_GJ_PIVOTS} WHERE s <> 'purchase'
), nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM solve),
tot AS MATERIALIZED (SELECT a, SUM(n) AS tot FROM tc GROUP BY a),
qq AS MATERIALIZED (
  SELECT si.i AS i, sj.i AS j,
         CAST(tc.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS q
  FROM tc
  JOIN solve si ON tc.a = si.s
  JOIN solve sj ON tc.b = sj.s
  JOIN tot t ON t.a = tc.a
), grid AS MATERIALIZED (
  SELECT si.i, sj.j FROM solve si
  CROSS JOIN (SELECT i AS j FROM solve UNION ALL SELECT n AS j FROM nn) sj
), gj0 AS MATERIALIZED (
  SELECT g.i, g.j,
         CASE WHEN g.j = (SELECT n FROM nn) THEN 1.0
              ELSE (CASE WHEN g.i = g.j THEN 1.0 ELSE 0.0 END)
                   - COALESCE(qq.q, 0.0) END AS v
  FROM grid g LEFT JOIN qq ON qq.i = g.i AND qq.j = g.j
){_gauss_chain('gj0', '')}
, sol AS MATERIALIZED (
  SELECT s.s, bb.v / dg.v AS t
  FROM solve s
  JOIN gj{_GJ_PIVOTS} dg ON dg.i = s.i AND dg.j = s.i
  JOIN gj{_GJ_PIVOTS} bb ON bb.i = s.i AND bb.j = (SELECT n FROM nn)
)
SELECT st.s AS start_type,
       COALESCE(round_even(sol.t, 6), -1.0) AS expected_steps_to_purchase
FROM st LEFT JOIN sol ON sol.s = st.s
WHERE st.s <> 'purchase'
"""


@query("markov_absorption", oracle=_markov_absorption_oracle())
def markov_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected events until PURCHASE from each starting event type —
    the absorbing-Markov-chain readout of the journey matrix: the
    distributed transition-count aggregate (markov_transitions'
    shape) collapses to a |types| x |types| table, and the driver
    solves (I - Q) t = 1 for the transient block. This is the
    funnel question 'how many more touches until conversion' that
    per-stage conversion rates can't answer. Deterministic and
    hash-checked: exact integer counts in, one fixed-order
    _gauss_jordan solve out (values rounded to 6 dp) — the oracle
    replays the identical elimination as unrolled MATERIALIZED CTEs.
    Closed-form behavior pinned in tests on a hand-built chain."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "event_id", "ts", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = {
        (r["event_type"], r["next_type"]): r["n"] for r in pairs
    }
    steps = absorption_expected_steps(counts, absorbing="purchase")
    rows = [
        (s, round(v, 6) if v != float("inf") else -1.0)
        for s, v in sorted(steps.items())
    ]
    return spark.createDataFrame(
        rows, "start_type string, expected_steps_to_purchase double"
    )

def absorption_probability(trans_counts, absorbing: str, drop=None):
    """P(eventually absorbed | start state) for the chain given raw
    transition COUNTS, optionally with one state REMOVED (its
    transitions deleted; rows renormalize implicitly by solving on
    the remaining mass — removed-state visits become terminal
    non-conversions, the Markov-attribution convention). Solves
    (I - Q) p = r by the same fixed-order _gauss_jordan the DuckDB
    oracle replays, on the tiny type matrix."""
    counts = {
        (a, b): n
        for (a, b), n in trans_counts.items()
        if a != drop and b != drop
    }
    states = sorted({a for a, _ in counts} | {b for _, b in counts})
    transient = [s for s in states if s != absorbing]
    if absorbing not in states:
        return {s: 0.0 for s in transient}
    idx = {s: i for i, s in enumerate(transient)}
    q: dict = {}
    rv: dict = {}
    # row totals INCLUDE dropped-target transitions: removing a
    # channel sends that probability mass to a terminal sink
    row_tot = {}
    for (a, b), n in trans_counts.items():
        if a != drop:
            row_tot[a] = row_tot.get(a, 0) + n
    for (a, b), n in counts.items():
        if a == absorbing:
            continue
        if b == absorbing:
            rv[idx[a]] = rv.get(idx[a], 0.0) + n / row_tot[a]
        else:
            k = (idx[a], idx[b])
            q[k] = q.get(k, 0.0) + n / row_tot[a]
    m = len(transient)
    A = [
        [(1.0 if i == j else 0.0) - q.get((i, j), 0.0) for j in range(m)]
        + [rv.get(i, 0.0)]
        for i in range(m)
    ]
    p = _gauss_jordan(A)
    return {s: p[idx[s]] for s in transient}


def _markov_removal_oracle() -> str:
    """DuckDB replay of attribution_markov_removal: one shared
    transition-count table, then EVERY absorption solve — the base
    chain plus one per removed channel — runs in parallel as a
    'd'-keyed cell table through one unrolled _gauss_chain. States,
    row totals (which keep dropped-target mass: removal = terminal
    sink), Q, r, and the final max(base-p, 0) / sorted-left-fold
    credit normalization all mirror absorption_probability's exact
    float ops (list_sum == Python sum's left fold)."""
    return f"""
WITH seq AS MATERIALIZED (
  SELECT event_type AS a,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS b
  FROM events
), tc AS MATERIALIZED (
  SELECT a, b, COUNT(*) AS n FROM seq WHERE b IS NOT NULL GROUP BY a, b
), st AS MATERIALIZED (
  SELECT DISTINCT s FROM (SELECT a AS s FROM tc UNION ALL SELECT b FROM tc)
), drops AS MATERIALIZED (
  SELECT CAST('__base__' AS VARCHAR) AS d
  UNION ALL
  SELECT DISTINCT a AS d FROM tc WHERE a NOT IN ('purchase', 'view')
), fc AS MATERIALIZED (
  SELECT dr.d, tc.a, tc.b, tc.n
  FROM drops dr JOIN tc
    ON (dr.d = '__base__' OR (tc.a <> dr.d AND tc.b <> dr.d))
), std AS MATERIALIZED (
  SELECT DISTINCT d, s FROM (
    SELECT d, a AS s FROM fc UNION ALL SELECT d, b AS s FROM fc)
), tr AS MATERIALIZED (
  SELECT d, s,
         CAST(ROW_NUMBER() OVER (PARTITION BY d ORDER BY s) AS INTEGER) - 1
           AS i
  FROM std WHERE s <> 'purchase'
), nn AS MATERIALIZED (SELECT d, COUNT(*) AS n FROM tr GROUP BY d),
tot AS MATERIALIZED (
  SELECT dr.d, tc.a, SUM(tc.n) AS tot
  FROM drops dr JOIN tc ON (dr.d = '__base__' OR tc.a <> dr.d)
  GROUP BY dr.d, tc.a
), qq AS MATERIALIZED (
  SELECT fc.d, ti.i AS i, tj.i AS j,
         CAST(fc.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS q
  FROM fc
  JOIN tr ti ON ti.d = fc.d AND ti.s = fc.a
  JOIN tr tj ON tj.d = fc.d AND tj.s = fc.b
  JOIN tot t ON t.d = fc.d AND t.a = fc.a
), rr AS MATERIALIZED (
  SELECT fc.d, ti.i AS i,
         CAST(fc.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS r
  FROM fc
  JOIN tr ti ON ti.d = fc.d AND ti.s = fc.a
  JOIN tot t ON t.d = fc.d AND t.a = fc.a
  WHERE fc.b = 'purchase'
), grid AS MATERIALIZED (
  SELECT a.d, a.i, b.j
  FROM tr a JOIN (
    SELECT d, i AS j FROM tr UNION ALL SELECT d, n AS j FROM nn
  ) b ON b.d = a.d
), gj0 AS MATERIALIZED (
  SELECT g.d, g.i, g.j,
         CASE WHEN g.j = nn.n THEN COALESCE(rr.r, 0.0)
              ELSE (CASE WHEN g.i = g.j THEN 1.0 ELSE 0.0 END)
                   - COALESCE(qq.q, 0.0) END AS v
  FROM grid g
  JOIN nn ON nn.d = g.d
  LEFT JOIN qq ON qq.d = g.d AND qq.i = g.i AND qq.j = g.j
  LEFT JOIN rr ON rr.d = g.d AND rr.i = g.i AND g.j = nn.n
){_gauss_chain('gj0', 'd')}
, pv AS MATERIALIZED (
  SELECT t.d, bb.v / dg.v AS p
  FROM tr t
  JOIN nn ON nn.d = t.d
  JOIN gj{_GJ_PIVOTS} dg ON dg.d = t.d AND dg.i = t.i AND dg.j = t.i
  JOIN gj{_GJ_PIVOTS} bb ON bb.d = t.d AND bb.i = t.i AND bb.j = nn.n
  WHERE t.s = 'view'
), base AS MATERIALIZED (
  SELECT COALESCE((SELECT p FROM pv WHERE d = '__base__'), 0.0) AS p
), eff AS MATERIALIZED (
  SELECT dr.d AS channel,
         GREATEST((SELECT p FROM base) - COALESCE(pv.p, 0.0), 0.0) AS effect
  FROM drops dr LEFT JOIN pv ON pv.d = dr.d
  WHERE dr.d <> '__base__'
), ttl AS MATERIALIZED (
  SELECT CASE WHEN t = 0.0 THEN 1.0 ELSE t END AS total
  FROM (SELECT COALESCE(list_sum(list(effect ORDER BY channel)), 0.0) AS t
        FROM eff)
)
SELECT channel,
       round_even((SELECT p FROM base), 6) AS base_conversion,
       round_even((SELECT p FROM base) - effect, 6) AS removal_conversion,
       round_even(effect, 6) AS removal_effect,
       round_even(effect / (SELECT total FROM ttl), 6) AS credit_share
FROM eff
"""


@query("attribution_markov_removal", oracle=_markov_removal_oracle())
def attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain (removal-effect) attribution — the data-driven
    counterweight to last-touch: each channel's credit is how much
    the purchase-absorption probability from 'view' DROPS when that
    channel's transitions are removed from the journey chain
    (removed mass becomes terminal non-conversion, the standard
    convention). Transition counts aggregate distributed; the
    removal solves are |channels| tiny fixed-order _gauss_jordan
    systems on the driver, hash-checked against one 'd'-keyed
    parallel elimination in the oracle.
    Emits per channel: removal conversion, absolute effect, and
    normalized credit share. Hand-built chains pin the closed forms
    in tests."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "event_id", "ts", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = {(r["event_type"], r["next_type"]): r["n"] for r in pairs}
    base = absorption_probability(counts, "purchase").get("view", 0.0)
    channels = sorted(
        {a for a, _ in counts} - {"purchase", "view"}
    )
    effects = {}
    for ch in channels:
        p = absorption_probability(counts, "purchase", drop=ch).get(
            "view", 0.0
        )
        effects[ch] = max(base - p, 0.0)
    total = sum(effects.values()) or 1.0
    rows = [
        (
            ch,
            round(base, 6),
            round(base - effects[ch], 6),
            round(effects[ch], 6),
            round(effects[ch] / total, 6),
        )
        for ch in channels
    ]
    return spark.createDataFrame(
        rows,
        "channel string, base_conversion double, removal_conversion"
        " double, removal_effect double, credit_share double",
    )

@query(
    "win_cume_unique_users",
    oracle="""
WITH fs AS (
  SELECT user_id, MIN(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS day
  FROM events GROUP BY user_id
), per_day AS (
  SELECT day, COUNT(*) AS new_users FROM fs GROUP BY day
)
SELECT day, CAST(new_users AS BIGINT) AS new_users,
       CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS users_to_date
FROM per_day
""",
)
def win_cume_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-unique adoption curve — distinct users seen TO DATE
    per day, the growth chart next to rolling_dau's sliding window.
    A windowed COUNT(DISTINCT) is not expressible in Spark (and would
    re-touch every user per day anyway); the standard first-seen
    decomposition is exact and one-pass: each user contributes on
    exactly their first-touch day (one shuffled min-agg on user_id),
    the per-day new-user counts collapse to the O(days) rollup, and
    the running total is a prefix sum over that rollup."""
    ev = load(spark, sf_dir, "events")
    per_day = (
        ev.groupBy("user_id")
        .agg(F.min(F.date_trunc("day", "ts")).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    # bounded: O(days) first-touch rollup, <= study-window rows
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("users_to_date"),
    )


@query(
    "funnel_time_between_steps",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
), lat AS (
  SELECT 'view_to_click' AS step_pair,
         date_diff('microsecond', v.t1, c.t2) AS us
  FROM v JOIN c ON v.user_id = c.user_id
  UNION ALL
  SELECT 'click_to_purchase',
         date_diff('microsecond', c.t2, p.t3)
  FROM c JOIN p ON c.user_id = p.user_id
), ranked AS (
  SELECT step_pair, us,
         ROW_NUMBER() OVER (PARTITION BY step_pair ORDER BY us) AS r,
         COUNT(*) OVER (PARTITION BY step_pair) AS n
  FROM lat
)
SELECT step_pair,
       CAST(MAX(n) AS BIGINT) AS n_users,
       (CAST(SUM(CASE WHEN r = (n + 1) // 2 THEN us END) AS DOUBLE)
        + SUM(CASE WHEN r = n // 2 + 1 THEN us END)) / 2 AS median_latency_us,
       CAST(SUM(us) AS DOUBLE) / MAX(n) AS mean_latency_us
FROM ranked GROUP BY step_pair
""",
)
def funnel_time_between_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-step latency distribution of the strict ordered funnel
    (funnel_multi_step's sequencing): exact microsecond gaps between
    each user's first view->click and click->purchase, with the
    median picked by the shared-rank formulation ((n+1) div 2 and
    n div 2 + 1 select the same row when n is odd) and the mean from
    exact integer sums — the step-latency table an activation team
    reads next to the conversion rates. Same shuffle-key lineage as
    the funnel itself; the latency table is user-sized, never
    event-sized."""
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    lat = (
        v.join(c, "user_id")
        .select(
            F.lit("view_to_click").alias("step_pair"),
            F.expr("timestampdiff(MICROSECOND, t1, t2)").alias("us"),
        )
        .unionAll(
            c.join(p, "user_id").select(
                F.lit("click_to_purchase").alias("step_pair"),
                F.expr("timestampdiff(MICROSECOND, t2, t3)").alias("us"),
            )
        )
    )
    w = Window.partitionBy("step_pair").orderBy("us")
    ranked = lat.select(
        "step_pair",
        "us",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("step_pair")).alias("n"),
    )
    return ranked.groupBy("step_pair").agg(
        F.max("n").alias("n_users"),
        (
            (
                F.sum(
                    F.when(F.col("r") == F.expr("(n + 1) div 2"), F.col("us"))
                ).cast("double")
                + F.sum(F.when(F.col("r") == F.expr("n div 2 + 1"), F.col("us")))
            )
            / 2
        ).alias("median_latency_us"),
        (F.sum("us").cast("double") / F.max("n")).alias("mean_latency_us"),
    )


@query(
    "assoc_rules_lift",
    oracle="""
WITH baskets AS MATERIALIZED (
  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS item
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), nb AS (SELECT COUNT(DISTINCT ok) AS n FROM baskets),
items AS MATERIALIZED (
  SELECT item, COUNT(*) AS n_item FROM baskets GROUP BY item
), pairs AS MATERIALIZED (
  SELECT a.item AS ia, b.item AS ib, COUNT(*) AS n_ab
  FROM baskets a JOIN baskets b ON a.ok = b.ok AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING COUNT(*) >= 5
), rules AS (
  SELECT ia AS antecedent, ib AS consequent, n_ab FROM pairs
  UNION ALL
  SELECT ib AS antecedent, ia AS consequent, n_ab FROM pairs
)
SELECT r.antecedent, r.consequent, CAST(r.n_ab AS BIGINT) AS n_ab,
       CAST(r.n_ab AS DOUBLE) / nb.n AS support,
       CAST(r.n_ab AS DOUBLE) / ha.n_item AS confidence,
       (CAST(r.n_ab AS DOUBLE) / ha.n_item)
         / (CAST(hb.n_item AS DOUBLE) / nb.n) AS lift
FROM rules r
JOIN items ha ON ha.item = r.antecedent
JOIN items hb ON hb.item = r.consequent
CROSS JOIN nb
""",
)
def assoc_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (support / confidence / lift)
    over order baskets of part brands — the co-purchase signal a
    recommender bootstraps from. Scale shape: the part dim joins
    BROADCAST; the basket self-join is an equi-join co-partitioned on
    the orderkey it was just distinct-shuffled on (no second
    shuffle); the pair aggregate's key domain is bounded by
    |brands|^2, so rule stats collapse to a tiny table joined back
    broadcast. Every metric is count-ratio arithmetic with one shared
    expression tree (n_ab/n_a, n_b/n -> lift), so raw doubles are
    bit-identical cross-engine — no rounding needed."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("item"))
        .distinct()
    )
    n_baskets = baskets.select("ok").distinct().count()
    items = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.item") < F.col("b.item")))
        .groupBy(F.col("a.item").alias("ia"), F.col("b.item").alias("ib"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    rules = pairs.select(
        F.col("ia").alias("antecedent"), F.col("ib").alias("consequent"), "n_ab"
    ).unionAll(
        pairs.select(
            F.col("ib").alias("antecedent"), F.col("ia").alias("consequent"), "n_ab"
        )
    )
    ha = items.select(F.col("item").alias("antecedent"), F.col("n_item").alias("n_a"))
    hb = items.select(F.col("item").alias("consequent"), F.col("n_item").alias("n_b"))
    return (
        rules.join(F.broadcast(ha), "antecedent")
        .join(F.broadcast(hb), "consequent")
        .select(
            "antecedent",
            "consequent",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            (F.col("n_ab").cast("double") / F.lit(n_baskets)).alias("support"),
            (F.col("n_ab").cast("double") / F.col("n_a")).alias("confidence"),
            (
                (F.col("n_ab").cast("double") / F.col("n_a"))
                / (F.col("n_b").cast("double") / F.lit(n_baskets))
            ).alias("lift"),
        )
    )


@query(
    "agg_rfm_segmentation",
    oracle="""
WITH anchor AS (SELECT MAX(CAST(date_trunc('day', ts) AS DATE)) AS d0 FROM events),
u AS (
  SELECT user_id,
         date_diff('day', MAX(CAST(date_trunc('day', ts) AS DATE)),
                   (SELECT d0 FROM anchor)) AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS monetary_cents
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(recency_days AS BIGINT) AS recency_days,
       CAST(frequency AS BIGINT) AS frequency,
       CAST(monetary_cents AS DOUBLE) / 100 AS monetary,
       CAST(6 - NTILE(5) OVER (ORDER BY recency_days, user_id) AS INTEGER)
         AS r_score,
       CAST(NTILE(5) OVER (ORDER BY frequency, user_id) AS INTEGER) AS f_score,
       CAST(NTILE(5) OVER (ORDER BY monetary_cents, user_id) AS INTEGER)
         AS m_score,
       CAST(6 - NTILE(5) OVER (ORDER BY recency_days, user_id) AS VARCHAR)
         || CAST(NTILE(5) OVER (ORDER BY frequency, user_id) AS VARCHAR)
         || CAST(NTILE(5) OVER (ORDER BY monetary_cents, user_id) AS VARCHAR)
         AS segment
FROM u
""",
)
def agg_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic marketing scoring: per user,
    Recency (days since last touch vs the dataset anchor day),
    Frequency (events), Monetary (exact purchase cents), each scored
    into quintiles, concatenated into the '555'-style segment.

    Scale shape: one user-level aggregate, then THREE exact global
    quintiles via plans/global_rank.py's two-phase row numbers
    (quantile range buckets + per-bucket offsets) — ntile_expr gives
    the exact SQL NTILE from (row_number, n) with NO single-partition
    window, three times over a users-sized (not events-sized) table.
    Ties broken by user_id, so every rank is deterministic."""
    from ..plans.global_rank import ntile_expr, with_global_row_number

    ev = load(spark, sf_dir, "events")
    anchor = ev.select(
        F.max(F.date_trunc("day", "ts").cast("date")).alias("d0")
    ).collect()[0]["d0"]
    u = ev.groupBy("user_id").agg(
        F.datediff(
            F.lit(anchor), F.max(F.date_trunc("day", "ts").cast("date"))
        )
        .cast("bigint")
        .alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("CAST(ROUND(value * 100) AS BIGINT)"),
            ).otherwise(0)
        ).alias("monetary_cents"),
    )
    numbered, n = with_global_row_number(
        u, ["recency_days", "user_id"], out_col="_rn_r"
    )
    numbered, _ = with_global_row_number(
        numbered, ["frequency", "user_id"], out_col="_rn_f"
    )
    numbered, _ = with_global_row_number(
        numbered, ["monetary_cents", "user_id"], out_col="_rn_m"
    )
    r5 = (F.lit(6) - ntile_expr("_rn_r", n, 5)).cast("int")
    f5 = ntile_expr("_rn_f", n, 5)
    m5 = ntile_expr("_rn_m", n, 5)
    return numbered.select(
        "user_id",
        "recency_days",
        F.col("frequency").cast("bigint").alias("frequency"),
        (F.col("monetary_cents").cast("double") / 100).alias("monetary"),
        r5.alias("r_score"),
        f5.alias("f_score"),
        m5.alias("m_score"),
        F.concat(
            r5.cast("string"), f5.cast("string"), m5.cast("string")
        ).alias("segment"),
    )


@query(
    "path_common_prefixes",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS r
  FROM events
), paths AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY r) AS path
  FROM ranked WHERE r <= 5 GROUP BY user_id
), counted AS (
  SELECT path, COUNT(*) AS n_users FROM paths GROUP BY path
)
SELECT path, CAST(n_users AS BIGINT) AS n_users
FROM counted
ORDER BY n_users DESC, path
LIMIT 20
""",
)
def path_common_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most common first-5-event journey prefixes — the
    'what do users actually do first' path report. Per-user windows
    are PARTITIONED (user_id); the path strings collapse to a
    bounded-domain count (at most |types|^5 distinct paths, far
    fewer in practice), and the final top-20 is a
    TakeOrderedAndProject with the path string as deterministic
    tie-break — never a global sort."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.select("user_id", "event_type", F.row_number().over(w).alias("r"))
        .filter(F.col("r") <= 5)
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                ">", F.array_sort(F.collect_list(F.struct("r", "event_type")))
                .getField("event_type")
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(20)
    )


@query(
    "anomaly_iqr_fences",
    oracle="""
WITH c AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), r AS (
  SELECT event_type, c,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY c, event_id) AS rn
  FROM c
), n AS (
  SELECT event_type, COUNT(*) AS n FROM c GROUP BY event_type
), q AS (
  SELECT r.event_type,
         MIN(CASE WHEN r.rn = (n.n + 3) // 4 THEN r.c END) AS q1c,
         MIN(CASE WHEN r.rn = (3 * n.n + 3) // 4 THEN r.c END) AS q3c
  FROM r JOIN n ON r.event_type = n.event_type
  GROUP BY r.event_type
)
SELECT q.event_type,
       CAST(n.n AS BIGINT) AS n,
       CAST(q.q1c AS DOUBLE) / 100 AS q1,
       CAST(q.q3c AS DOUBLE) / 100 AS q3,
       CAST(SUM(CASE WHEN 4 * c.c < 4 * q.q1c - 6 * (q.q3c - q.q1c)
                       OR 4 * c.c > 4 * q.q3c + 6 * (q.q3c - q.q1c)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM c JOIN q ON c.event_type = q.event_type
JOIN n ON c.event_type = n.event_type
GROUP BY q.event_type, n.n, q.q1c, q.q3c
""",
)
def anomaly_iqr_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit per event type: Q1/Q3 are the exact
    order statistics at ceil(n/4) and ceil(3n/4) of the sorted
    integer-cents values (ONE shared rank formulation in both
    engines — the drift_psi lesson: never pair the two engines'
    discrete-quantile builtins), and the 1.5*IQR fences are compared
    in scaled integers (4c vs 4q1 - 6*IQR), so the whole operator is
    integer-exact until the two /100 descales. Scale shape: the rank
    window partitions by event_type (bounded group count is NOT
    required — any cardinality hash-partitions), the quartile table
    is O(types) and broadcasts back onto the fact scan."""
    ev = load(spark, sf_dir, "events")
    c = ev.select(
        "event_type",
        "event_id",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("c"),
    )
    w = Window.partitionBy("event_type").orderBy("c", "event_id")
    r = c.withColumn("rn", F.row_number().over(w))
    n = c.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    q = (
        r.join(n, "event_type")
        .groupBy("event_type")
        .agg(
            F.min(
                F.when(F.col("rn") == F.expr("(n + 3) DIV 4"), F.col("c"))
            ).alias("q1c"),
            F.min(
                F.when(
                    F.col("rn") == F.expr("(3 * n + 3) DIV 4"), F.col("c")
                )
            ).alias("q3c"),
        )
    )
    iqr = F.col("q3c") - F.col("q1c")
    return (
        c.join(F.broadcast(q), "event_type")
        .join(F.broadcast(n), "event_type")
        .groupBy("event_type", "n", "q1c", "q3c")
        .agg(
            F.sum(
                F.when(
                    (4 * F.col("c") < 4 * F.col("q1c") - 6 * iqr)
                    | (4 * F.col("c") > 4 * F.col("q3c") + 6 * iqr),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_outliers")
        )
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            (F.col("q1c").cast("double") / 100).alias("q1"),
            (F.col("q3c").cast("double") / 100).alias("q3"),
            "n_outliers",
        )
    )


_MS_SCALE = 10**12
_MS_ROUNDS = 30

_MS_SEQ = """
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
"""


def _markov_stationary_oracle() -> str:
    parts = [
        f"WITH seq AS ({_MS_SEQ})",
        """, cells AS MATERIALIZED (
  SELECT event_type AS i, next_type AS j, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
)""",
        """, rmass AS MATERIALIZED (
  SELECT i, CAST(SUM(n) AS BIGINT) AS r FROM cells GROUP BY i
)""",
        """, states AS MATERIALIZED (
  SELECT i AS s FROM cells UNION SELECT j FROM cells
)""",
        f""", v0 AS MATERIALIZED (
  SELECT s, CAST({_MS_SCALE} // (SELECT COUNT(*) FROM states) AS BIGINT)
         AS v
  FROM states
)""",
    ]
    for t in range(1, _MS_ROUNDS + 1):
        parts.append(
            f""", v{t} AS MATERIALIZED (
  SELECT c.j AS s, CAST(SUM((v.v * c.n) // r.r) AS BIGINT) AS v
  FROM v{t - 1} v JOIN cells c ON v.s = c.i JOIN rmass r ON r.i = c.i
  GROUP BY c.j
)"""
        )
    parts.append(
        f"""
SELECT st.s AS event_type,
       CAST(COALESCE(vz.v, 0) AS BIGINT) AS v_fixed,
       CAST(COALESCE(vz.v, 0) AS DOUBLE) / {_MS_SCALE} AS stationary
FROM states st LEFT JOIN v{_MS_ROUNDS} vz ON st.s = vz.s
"""
    )
    return "".join(parts)


@query("agg_markov_stationary", oracle=_markov_stationary_oracle())
def agg_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain by
    30 rounds of EXACT fixed-point power iteration (scale 1e12):
    v'_j = sum_i floor(v_i * c_ij / r_i) — every term an integer
    floor division, so Spark's driver-side loop over the collected
    <= |types|^2 cell matrix (the accepted tiny-matrix pattern of
    markov_absorption) replays bit-for-bit as the oracle's unrolled
    MATERIALIZED CTE chain (the text_pagerank_exact fixed-point
    recipe; floors lose < 1e-10 of mass total — deterministic on
    both engines). The data-sized work is ONE lag window + ONE
    groupBy; the iteration runs on vocabulary-sized state."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    cells = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("i"), F.col("next_type").alias("j")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    )
    c: dict = {}
    r: dict = {}
    states = set()
    for row in cells:
        c[(row.i, row.j)] = row.n
        r[row.i] = r.get(row.i, 0) + row.n
        states.add(row.i)
        states.add(row.j)
    k = len(states)
    v = {s: _MS_SCALE // k for s in states}
    for _ in range(_MS_ROUNDS):
        nv = {s: 0 for s in states}
        for (i, j), n in c.items():
            nv[j] += (v.get(i, 0) * n) // r[i]
        v = nv
    out = [
        (s, int(v.get(s, 0)), float(v.get(s, 0)) / _MS_SCALE)
        for s in sorted(states)
    ]
    return spark.createDataFrame(
        out, "event_type string, v_fixed bigint, stationary double"
    )


_CAMPAIGNS = [
    ("wk1_push", "2024-01-03 00:00:00", "2024-01-05 00:00:00"),
    ("midmonth_sale", "2024-01-12 00:00:00", "2024-01-16 00:00:00"),
    ("payday_blitz", "2024-01-25 12:00:00", "2024-01-27 00:00:00"),
]


def _overlap_duration_oracle() -> str:
    vals = ", ".join(
        f"('{n}', TIMESTAMP '{s}', TIMESTAMP '{e}')" for n, s, e in _CAMPAIGNS
    )
    return f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id)) > 1800
              OR LAG(ts) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id,
         ts
  FROM flagged
), spans AS (
  SELECT user_id, session_id,
         MIN(ts) AS s_start, MAX(ts) AS s_end
  FROM sess GROUP BY user_id, session_id
), camp(name, c_start, c_end) AS (VALUES {vals}),
ov AS (
  SELECT c.name, s.user_id, s.session_id,
         greatest(CAST(0 AS BIGINT),
           epoch_us(least(s.s_end, c.c_end))
             - epoch_us(greatest(s.s_start, c.c_start))) AS us
  FROM spans s CROSS JOIN camp c
)
SELECT name,
       CAST(SUM(CASE WHEN us > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions,
       COUNT(DISTINCT CASE WHEN us > 0 THEN user_id END) AS n_users,
       CAST(CAST(SUM(us) AS BIGINT) AS DOUBLE) / 1000000
         AS total_overlap_sec
FROM ov GROUP BY name
"""


@query("interval_overlap_duration", oracle=_overlap_duration_oracle())
def interval_overlap_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total session-time overlap with campaign windows: sessionize
    (the win_sessionize kernel), then for each (session, campaign)
    the intersection length greatest(0, min(ends) - max(starts)) in
    EXACT epoch microseconds — the attribution denominator
    ('how much attended time did each campaign actually get').
    The campaign list is a 3-row literal relation broadcast onto the
    session spans; all arithmetic is integer micros until the single
    /1e6 descale. Session spans reuse one user-partitioned
    exchange."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            (
                F.col("ts").cast("timestamp").cast("double")
                - F.lag(F.col("ts").cast("timestamp").cast("double")).over(w)
                > 1800
            )
            | F.lag("ts").over(w).isNull(),
            1,
        ).otherwise(0).alias("new_sess"),
    )
    sess = flagged.select(
        "user_id",
        "ts",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("session_id"),
    )
    spans = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    camp = spark.createDataFrame(
        _CAMPAIGNS, "name string, c_start string, c_end string"
    ).select(
        "name",
        F.col("c_start").cast("timestamp_ntz").alias("c_start"),
        F.col("c_end").cast("timestamp_ntz").alias("c_end"),
    )
    us = F.greatest(
        F.lit(0).cast("bigint"),
        F.expr(
            "timestampdiff(MICROSECOND,"
            " greatest(s_start, c_start), least(s_end, c_end))"
        ),
    )
    ov = spans.crossJoin(F.broadcast(camp)).select(
        "name", "user_id", "session_id", us.alias("us")
    )
    return ov.groupBy("name").agg(
        F.sum(F.when(F.col("us") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_sessions"),
        F.countDistinct(
            F.when(F.col("us") > 0, F.col("user_id"))
        ).alias("n_users"),
        (F.sum("us").cast("bigint").cast("double") / 1000000).alias(
            "total_overlap_sec"
        ),
    )


@query(
    "attribution_shapley",
    oracle="""
WITH fp AS (
  SELECT user_id, ts, event_id FROM (
    SELECT user_id, ts, event_id,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
), pri AS (
  SELECT f.user_id,
         CASE e.event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
              WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END AS bit
  FROM fp f JOIN events e
    ON e.user_id = f.user_id AND e.event_type <> 'purchase'
   AND (e.ts < f.ts OR (e.ts = f.ts AND e.event_id < f.event_id))
), um AS (
  SELECT f.user_id, COALESCE(BIT_OR(p.bit), 0) AS mask
  FROM fp f LEFT JOIN pri p ON p.user_id = f.user_id
  GROUP BY f.user_id
), mc AS (
  SELECT mask, CAST(COUNT(*) AS BIGINT) AS cnt FROM um GROUP BY mask
), vv AS (
  SELECT s.s, CAST(COALESCE(SUM(mc.cnt), 0) AS BIGINT) AS v
  FROM generate_series(0, 15) s(s)
  LEFT JOIN mc ON (mc.mask & s.s) = mc.mask
  GROUP BY s.s
), ch AS (
  SELECT * FROM (VALUES ('click', 1), ('error', 2),
                        ('signup', 4), ('view', 8)) AS t(channel, bit)
)
SELECT ch.channel,
       CAST(SUM((CASE bit_count(v1.s) WHEN 0 THEN 6 WHEN 1 THEN 2
                      WHEN 2 THEN 2 ELSE 6 END)
                * (v2.v - v1.v)) AS BIGINT) AS shapley_numer,
       CAST(CAST(SUM((CASE bit_count(v1.s) WHEN 0 THEN 6 WHEN 1 THEN 2
                           WHEN 2 THEN 2 ELSE 6 END)
                     * (v2.v - v1.v)) AS BIGINT) AS DOUBLE) / 24.0
         AS shapley_credit
FROM ch
JOIN vv v1 ON (v1.s & ch.bit) = 0
JOIN vv v2 ON v2.s = v1.s + ch.bit
GROUP BY ch.channel
""",
)
def attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value marketing attribution — the game-theoretic credit
    split last-touch and Markov-removal both approximate. Coalition
    value v(S) = number of converting users whose pre-first-purchase
    channel set is contained in S (the conversions that survive if
    only channels in S existed); each channel's credit is the exact
    Shapley average of its marginal contributions over all 2^3
    orderings-by-subset. With the four fixed non-purchase channels
    (click/error/signup/view) every v(S) is an INTEGER user count,
    the |S|!(m-1-|S|)! weights are the integers {6,2,2,6}, and the
    whole computation stays in bigint until ONE division by m!=24 —
    hash-exact across engines by construction. Shape: the only
    event-scale work is first-purchase per user (one agg) + one join
    back for prior touches + a per-user BIT_OR (one agg); everything
    after runs on <=16-row mask/subset frames (BNLJ on tiny sides),
    so the plan is two user_id shuffles regardless of corpus size.
    Efficiency property sum_i(credit_i) = v(full) - v(empty) is
    fuzz-tested; the direct-conversion mass (empty channel set)
    cancels out of every marginal, as it must."""
    ev = load(spark, sf_dir, "events")
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "view", 8)
        .otherwise(0)
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("fp"))
    )
    pri = (
        ev.filter(F.col("event_type") != "purchase")
        .join(fp, "user_id")
        .filter(F.struct("ts", "event_id") < F.col("fp"))
        .select("user_id", bit.alias("bit"))
        .groupBy("user_id")
        .agg(F.bit_or("bit").alias("mask0"))
    )
    um = fp.join(pri, "user_id", "left").select(
        "user_id", F.coalesce("mask0", F.lit(0)).alias("mask")
    )
    mc = um.groupBy("mask").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    masks = spark.range(0, 16).select(F.col("id").alias("s"))
    vv = (
        masks.join(
            mc, F.col("mask").bitwiseAND(F.col("s")) == F.col("mask"), "left"
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("v"))
    )
    ch = spark.createDataFrame(
        [("click", 1), ("error", 2), ("signup", 4), ("view", 8)],
        "channel string, bit long",
    )
    v1 = vv.select(F.col("s").alias("s1"), F.col("v").alias("va"))
    v2 = vv.select(F.col("s").alias("s2"), F.col("v").alias("vb"))
    w = (
        F.when(F.bit_count("s1") == 0, 6)
        .when(F.bit_count("s1") == 1, 2)
        .when(F.bit_count("s1") == 2, 2)
        .otherwise(6)
    )
    numer = F.sum(w * (F.col("vb") - F.col("va"))).cast("bigint")
    return (
        ch.join(v1, F.col("s1").bitwiseAND(F.col("bit")) == 0)
        .join(v2, F.col("s2") == F.col("s1") + F.col("bit"))
        .groupBy("channel")
        .agg(
            numer.alias("shapley_numer"),
            (numer.cast("double") / 24.0).alias("shapley_credit"),
        )
    )


@query(
    "interval_allocate_hours",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id)) > 1800
              OR LAG(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id,
         ts
  FROM flagged
), spans AS (
  SELECT user_id, session_id,
         MIN(ts) AS s_start, MAX(ts) AS s_end
  FROM sess GROUP BY user_id, session_id
  HAVING MIN(ts) < MAX(ts)
), alloc AS (
  SELECT date_trunc('hour', s_start)
           + (g.i || ' hours')::INTERVAL AS hour,
         GREATEST(CAST(0 AS BIGINT),
           date_diff('microsecond',
             GREATEST(s_start, date_trunc('hour', s_start)
                               + (g.i || ' hours')::INTERVAL),
             LEAST(s_end, date_trunc('hour', s_start)
                          + ((g.i + 1) || ' hours')::INTERVAL)))
           AS us
  FROM spans,
  LATERAL (SELECT unnest(generate_series(0,
             CAST(date_diff('hour', date_trunc('hour', s_start),
                            date_trunc('hour', s_end)) AS BIGINT)))
           AS i) g
)
SELECT CAST(hour AS TIMESTAMP) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_session_slices,
       CAST(SUM(us) AS BIGINT) AS allocated_us,
       CAST(CAST(SUM(us) AS BIGINT) AS DOUBLE) / 1000000
         AS allocated_sec
FROM alloc WHERE us > 0
GROUP BY hour
""",
)
def interval_allocate_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time allocation of user sessions onto the hourly grid: each
    30-min-gap session (the win_sessionize spans, zero-length ones
    dropped) is SPLIT across the clock hours it overlaps, crediting
    each hour exactly its overlap — the utilization/occupancy rollup
    ('engaged seconds per hour') that naive count-by-start-hour
    misstates whenever a session crosses a boundary. Overlaps are
    exact integer MICROSECONDS (greatest/least clamps on the hour
    edges), so the allocation sums are order-free bigints and
    sum(allocated_us) over hours telescopes to total session
    duration (property-tested). Shape: the session rollup is two
    same-partitioned windows + one agg; the hour split explodes each
    session into its spanned-hour count (bounded by session length,
    ~1-2 rows typical) via sequence(), then one hour-keyed agg."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts_sec = F.col("ts").cast("timestamp").cast("double")
    new_sess = F.when(
        F.lag(ts_sec).over(w).isNull()
        | (ts_sec - F.lag(ts_sec).over(w) > 1800),
        1,
    ).otherwise(0)
    sess = ev.withColumn("new_sess", new_sess).withColumn(
        "session_id", F.sum("new_sess").over(wrun).cast("bigint")
    )
    spans = (
        sess.groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
        .filter(F.col("s_start") < F.col("s_end"))
    )
    alloc = spans.select(
        F.explode(
            F.expr(
                "sequence(0, CAST((unix_seconds(date_trunc('hour', s_end))"
                " - unix_seconds(date_trunc('hour', s_start))) / 3600"
                " AS INT))"
            )
        ).alias("i"),
        "s_start",
        "s_end",
    ).select(
        F.expr(
            "date_trunc('hour', s_start) + make_interval(0,0,0,0,i,0,0)"
        ).alias("hour"),
        F.greatest(
            F.lit(0).cast("bigint"),
            F.expr(
                "timestampdiff(MICROSECOND,"
                " greatest(s_start, date_trunc('hour', s_start)"
                "          + make_interval(0,0,0,0,i,0,0)),"
                " least(s_end, date_trunc('hour', s_start)"
                "       + make_interval(0,0,0,0,i + 1,0,0)))"
            ),
        ).alias("us"),
    )
    return (
        alloc.filter(F.col("us") > 0)
        .groupBy("hour")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_session_slices"),
            F.sum("us").cast("bigint").alias("allocated_us"),
            (F.sum("us").cast("bigint").cast("double") / 1000000).alias(
                "allocated_sec"
            ),
        )
    )


@query(
    "rolling_stickiness",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), grid AS (
  SELECT DISTINCT day FROM ud
)
SELECT CAST(g.day AS TIMESTAMP) AS day,
       COUNT(DISTINCT CASE WHEN u.day = g.day THEN u.user_id END) AS dau,
       COUNT(DISTINCT u.user_id) AS mau30,
       CAST(COUNT(DISTINCT CASE WHEN u.day = g.day THEN u.user_id END)
            AS DOUBLE)
         / COUNT(DISTINCT u.user_id) AS stickiness
FROM grid g JOIN ud u
  ON u.day <= g.day AND u.day >= g.day - INTERVAL 29 DAY
GROUP BY g.day
""",
)
def rolling_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day (30-day rolling active base) —
    THE engagement ratio product teams watch: what fraction of the
    monthly active base shows up on a given day (20% ~ the
     'good consumer app' folk threshold). Same materialized range
    join as rolling_dau — the day grid is one broadcast row per
    day, the deduplicated (user, day) pairs fan out to <=30 grid
    rows each, one count-distinct agg keyed by day — because a
    sliding COUNT(DISTINCT) window does not exist in either engine.
    Integer counts, ONE division per day row."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    grid = ud.select("day").distinct().select(
        F.col("day").alias("g_day")
    )
    joined = ud.join(
        F.broadcast(grid),
        (F.col("day") <= F.col("g_day"))
        & (F.col("day") >= F.expr("g_day - INTERVAL 29 DAYS")),
    )
    return (
        joined.groupBy("g_day")
        .agg(
            F.countDistinct(
                F.when(F.col("day") == F.col("g_day"), F.col("user_id"))
            ).alias("dau"),
            F.countDistinct("user_id").alias("mau30"),
            (
                F.countDistinct(
                    F.when(
                        F.col("day") == F.col("g_day"), F.col("user_id")
                    )
                ).cast("double")
                / F.countDistinct("user_id")
            ).alias("stickiness"),
        )
        .withColumnRenamed("g_day", "day")
    )


@query(
    "conversion_horizon_cdf",
    oracle="""
WITH s AS (
  SELECT user_id, MIN(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN s ON s.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
  GROUP BY e.user_id
), d AS (
  SELECT s.user_id,
         CASE WHEN p.user_id IS NOT NULL
              THEN date_diff('microsecond', s.signup_ts, p.purchase_ts)
         END AS us
  FROM s LEFT JOIN p ON p.user_id = s.user_id
), grid AS (
  SELECT * FROM (VALUES (CAST(3600000000 AS BIGINT), '1h'),
                        (21600000000, '6h'), (86400000000, '1d'),
                        (259200000000, '3d'), (604800000000, '7d'))
         AS t(horizon_us, horizon)
)
SELECT horizon, horizon_us,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_signups,
       CAST(SUM(CASE WHEN d.us IS NOT NULL AND d.us <= horizon_us
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
       CAST(CAST(SUM(CASE WHEN d.us IS NOT NULL AND d.us <= horizon_us
                          THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
         / (SELECT COUNT(*) FROM d) AS conversion_share
FROM grid, d
GROUP BY horizon, horizon_us
""",
)
def conversion_horizon_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative signup->purchase conversion at fixed horizons
    (1h / 6h / 1d / 3d / 7d) — the CDF summary of
    time_to_conversion's per-user latencies, and the table that
    sets attribution windows and experiment readout delays ('92% of
    converters convert inside 3 days, so a 7-day wait adds nothing').
    Latencies are exact integer microseconds; each horizon row is
    one integer count against a broadcast 5-row grid with ONE share
    division — no percentile machinery, no float comparisons."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    d = s.join(p, "user_id", "left").select(
        "user_id",
        F.expr(
            "timestampdiff(MICROSECOND, signup_ts, purchase_ts)"
        ).alias("us"),
    )
    n_tot = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_signups"))
    grid = spark.createDataFrame(
        [
            (3600000000, "1h"),
            (21600000000, "6h"),
            (86400000000, "1d"),
            (259200000000, "3d"),
            (604800000000, "7d"),
        ],
        "horizon_us bigint, horizon string",
    )
    return (
        d.crossJoin(F.broadcast(grid))
        .groupBy("horizon", "horizon_us")
        .agg(
            F.sum(
                F.when(
                    F.col("us").isNotNull()
                    & (F.col("us") <= F.col("horizon_us")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_converted")
        )
        .crossJoin(F.broadcast(n_tot))
        .select(
            "horizon",
            "horizon_us",
            "n_signups",
            "n_converted",
            (
                F.col("n_converted").cast("double") / F.col("n_signups")
            ).alias("conversion_share"),
        )
    )


@query(
    "attribution_model_compare",
    oracle="""
WITH touched AS (
  SELECT event_type, value,
         LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS channel
  FROM events
), lt AS (
  SELECT COALESCE(channel, '(direct)') AS channel,
         CAST(COUNT(*) AS BIGINT) AS lt_purchases
  FROM touched WHERE event_type = 'purchase' GROUP BY 1
), fp AS (
  SELECT user_id, ts, event_id FROM (
    SELECT user_id, ts, event_id,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
), pri AS (
  SELECT f.user_id,
         CASE e.event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
              WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END AS bit
  FROM fp f JOIN events e
    ON e.user_id = f.user_id AND e.event_type <> 'purchase'
   AND (e.ts < f.ts OR (e.ts = f.ts AND e.event_id < f.event_id))
), um AS (
  SELECT f.user_id, COALESCE(BIT_OR(p.bit), 0) AS mask
  FROM fp f LEFT JOIN pri p ON p.user_id = f.user_id
  GROUP BY f.user_id
), mc AS (
  SELECT mask, CAST(COUNT(*) AS BIGINT) AS cnt FROM um GROUP BY mask
), vv AS (
  SELECT s.s, CAST(COALESCE(SUM(mc.cnt), 0) AS BIGINT) AS v
  FROM generate_series(0, 15) s(s)
  LEFT JOIN mc ON (mc.mask & s.s) = mc.mask
  GROUP BY s.s
), ch AS (
  SELECT * FROM (VALUES ('click', 1), ('error', 2),
                        ('signup', 4), ('view', 8)) AS t(channel, bit)
), shap AS (
  SELECT ch.channel,
         CAST(CAST(SUM((CASE bit_count(v1.s) WHEN 0 THEN 6 WHEN 1 THEN 2
                             WHEN 2 THEN 2 ELSE 6 END)
                       * (v2.v - v1.v)) AS BIGINT) AS DOUBLE) / 24.0
           AS shapley_credit
  FROM ch
  JOIN vv v1 ON (v1.s & ch.bit) = 0
  JOIN vv v2 ON v2.s = v1.s + ch.bit
  GROUP BY ch.channel
)
SELECT COALESCE(lt.channel, shap.channel) AS channel,
       CAST(COALESCE(lt.lt_purchases, 0) AS BIGINT) AS last_touch_credit,
       shap.shapley_credit
FROM lt FULL OUTER JOIN shap ON shap.channel = lt.channel
""",
)
def attribution_model_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution model comparison table: each channel's credit
    under LAST-TOUCH (purchase counts) and under SHAPLEY (exact
    game-theoretic split of first-purchase conversions) side by side
    — the disagreement report that decides budget reallocation
    fights (last-touch systematically over-credits closers and
    starves upper-funnel touches; the delta per channel is the
    point). Pure composition of the attribution_last_touch and
    attribution_shapley kernels joined FULL OUTER on channel (so
    '(direct)' — which Shapley deliberately excludes — still
    appears), and the oracle composes both replay chains the same
    way. All the determinism arguments inherit from the two parent
    keys."""
    from ..registry import QUERIES

    lt = QUERIES["attribution_last_touch"](spark, sf_dir).select(
        "channel", F.col("n_purchases").alias("last_touch_credit")
    )
    shap = QUERIES["attribution_shapley"](spark, sf_dir).select(
        "channel", "shapley_credit"
    )
    return lt.join(shap, "channel", "full_outer").select(
        "channel",
        F.coalesce("last_touch_credit", F.lit(0))
        .cast("bigint")
        .alias("last_touch_credit"),
        "shapley_credit",
    )


@query(
    "survival_logrank",
    oracle="""
WITH s AS (
  SELECT user_id, user_id % 2 AS arm, MIN(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS tp
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s.t0
  GROUP BY e.user_id
), durs AS (
  SELECT s.arm,
         CASE WHEN p.tp IS NOT NULL
              THEN CAST(floor((epoch_us(p.tp) - epoch_us(s.t0))
                              / 86400000000) AS BIGINT)
              ELSE CAST(floor((epoch_us(TIMESTAMP '2024-01-31 00:00:00')
                               - epoch_us(s.t0)) / 86400000000) AS BIGINT)
         END AS dur,
         CASE WHEN p.tp IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM s LEFT JOIN p ON s.user_id = p.user_id
), risk AS (
  SELECT dur,
         CAST(SUM(CASE WHEN arm = 0 THEN ev ELSE 0 END) AS BIGINT) AS d1,
         CAST(SUM(ev) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t1,
         CAST(COUNT(*) AS BIGINT) AS t
  FROM durs GROUP BY dur
), atrisk AS (
  SELECT dur, d1, d,
         CAST(SUM(t1) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
                            AND UNBOUNDED FOLLOWING) AS BIGINT) AS n1,
         CAST(SUM(t) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
                           AND UNBOUNDED FOLLOWING) AS BIGINT) AS n
  FROM risk
), terms AS (
  SELECT dur, d1,
         CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE) AS e1t,
         CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(1 AS DOUBLE) - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(n - d AS DOUBLE) / CAST(n - 1 AS DOUBLE)) AS vt
  FROM atrisk WHERE d > 0 AND n > 1
), folds AS (
  SELECT CAST(SUM(d1) AS BIGINT) AS o1,
         list_sum(list(e1t ORDER BY dur)) AS e1,
         list_sum(list(vt ORDER BY dur)) AS v
  FROM terms
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_users, o1, e1,
       (CAST(o1 AS DOUBLE) - e1) * (CAST(o1 AS DOUBLE) - e1) / v AS chi2,
       (CAST(o1 AS DOUBLE) - e1) * (CAST(o1 AS DOUBLE) - e1) / v
         > CAST(3.841458820694124 AS DOUBLE) AS significant
FROM folds
""",
)
def survival_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-group log-rank test on the signup -> first-purchase
    survival cohort (arms = user_id parity, the same deterministic
    A/B split as agg_beta_posterior): at every event day, compare
    arm-0's observed deaths to its hypergeometric expectation given
    the pooled at-risk counts; chi2 = (O - E)^2 / V with the
    standard variance term. Exactness: all at-risk and death counts
    are exact BIGINTs (reverse cumulative sums over the O(days)
    risk table), each day's E and V terms evaluate from those
    integers with identical expression text, and the two float
    accumulations fold in dur order (sorted-array fold == list_sum
    ORDER BY) — bit-exact, no rounding. Completes the survival
    family: survival_km estimates each curve, this key tests
    whether two curves differ. Significance vs the chi-square(1)
    5% point (public tables)."""
    ev = load(spark, sf_dir, "events")
    end_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'2024-01-01 00:00:00',"
        " TIMESTAMP_NTZ'2024-01-31 00:00:00')"
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
        .select("user_id", (F.col("user_id") % 2).alias("arm"), "t0")
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s.select("user_id", "t0"), "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    diff_us = F.when(
        F.col("tp").isNotNull(),
        F.expr("timestampdiff(MICROSECOND, t0, tp)").cast("double"),
    ).otherwise(
        end_us.cast("double")
        - F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ'2024-01-01 00:00:00', t0)"
        ).cast("double")
    )
    durs = s.join(p, "user_id", "left").select(
        "arm",
        F.floor(diff_us / 86400000000).cast("long").alias("dur"),
        F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    risk = durs.groupBy("dur").agg(
        F.sum(F.when(F.col("arm") == 0, F.col("ev")).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("t1"),
        F.count(F.lit(1)).cast("bigint").alias("t"),
    )
    # bounded: O(distinct days) risk-table rows
    wrev = Window.orderBy("dur").rowsBetween(0, Window.unboundedFollowing)
    atrisk = risk.select(
        "dur",
        "d1",
        "d",
        F.sum("t1").over(wrev).cast("bigint").alias("n1"),
        F.sum("t").over(wrev).cast("bigint").alias("n"),
    )
    dd = F.col("d").cast("double")
    r1 = F.col("n1").cast("double") / F.col("n").cast("double")
    terms = atrisk.filter((F.col("d") > 0) & (F.col("n") > 1)).select(
        "dur",
        "d1",
        (dd * F.col("n1").cast("double") / F.col("n").cast("double")).alias(
            "e1t"
        ),
        (
            dd
            * r1
            * (F.lit(1).cast("double") - r1)
            * (
                (F.col("n") - F.col("d")).cast("double")
                / (F.col("n") - 1).cast("double")
            )
        ).alias("vt"),
    )
    n_users = s.count()
    folds = terms.agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("dur", "e1t"))),
            F.lit(0.0),
            lambda acc, x: acc + x["e1t"],
        ).alias("e1"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("dur", "vt"))),
            F.lit(0.0),
            lambda acc, x: acc + x["vt"],
        ).alias("v"),
    )
    chi2 = (
        (F.col("o1").cast("double") - F.col("e1"))
        * (F.col("o1").cast("double") - F.col("e1"))
        / F.col("v")
    )
    return folds.select(
        F.lit(n_users).cast("bigint").alias("n_users"),
        "o1",
        "e1",
        chi2.alias("chi2"),
        (chi2 > F.lit(3.841458820694124).cast("double")).alias("significant"),
    )


_MAHA_CHI2_2_99 = 9.21034037197618  # chi-square(2) 99% point, public tables


def _mahalanobis_oracle() -> str:
    return f"""
WITH u AS (
  SELECT user_id,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS xc,
         CAST(COUNT(*) AS BIGINT) AS yc
  FROM events GROUP BY user_id
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xc) AS BIGINT) AS sx, CAST(SUM(yc) AS BIGINT) AS sy,
         CAST(SUM(xc * xc) AS BIGINT) AS sxx,
         CAST(SUM(yc * yc) AS BIGINT) AS syy,
         CAST(SUM(xc * yc) AS BIGINT) AS sxy
  FROM u
), c AS (
  SELECT CAST(n AS DOUBLE) AS nd,
         CAST(sx AS DOUBLE) / n AS mx, CAST(sy AS DOUBLE) / n AS my,
         CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n)
           * (CAST(sx AS DOUBLE) / n) AS vxx,
         CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n)
           * (CAST(sy AS DOUBLE) / n) AS vyy,
         CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n)
           * (CAST(sy AS DOUBLE) / n) AS vxy
  FROM m
)
SELECT u.user_id,
       round((c.vyy * (CAST(u.xc AS DOUBLE) - c.mx)
                    * (CAST(u.xc AS DOUBLE) - c.mx)
         - 2 * c.vxy * (CAST(u.xc AS DOUBLE) - c.mx)
                     * (CAST(u.yc AS DOUBLE) - c.my)
         + c.vxx * (CAST(u.yc AS DOUBLE) - c.my)
                 * (CAST(u.yc AS DOUBLE) - c.my))
         / (c.vxx * c.vyy - c.vxy * c.vxy), 6) AS md2,
       (c.vyy * (CAST(u.xc AS DOUBLE) - c.mx)
              * (CAST(u.xc AS DOUBLE) - c.mx)
         - 2 * c.vxy * (CAST(u.xc AS DOUBLE) - c.mx)
                     * (CAST(u.yc AS DOUBLE) - c.my)
         + c.vxx * (CAST(u.yc AS DOUBLE) - c.my)
                 * (CAST(u.yc AS DOUBLE) - c.my))
         / (c.vxx * c.vyy - c.vxy * c.vxy)
         > CAST({_MAHA_CHI2_2_99!r} AS DOUBLE) AS outlier
FROM u, c
"""


@query(
    "anomaly_mahalanobis",
    bounded_cross="1-row broadcast scalar (global moment row)",
    oracle=_mahalanobis_oracle(),
)
def anomaly_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate outlier detection: squared Mahalanobis distance of
    every user's (total spend, event count) pair from the population
    centroid under the 2x2 population covariance, flagged against the
    99% chi-square(2) point — catches users whose spend/activity
    COMBINATION is anomalous even when each marginal looks normal
    (the classic fraud-screen that z-scores per column cannot do).

    Exactness: per-user features and all five covariance moments are
    exact BIGINTs (cents x counts stay well under 2^63); means,
    variances, and the closed-form 2x2 inverse evaluate from those
    exact integers in the same expression order in both engines, and
    every user's md2 is one fixed float expression over them —
    bit-exact before the final display round. Plan: one groupBy user,
    one 1-row moment aggregate joined back as a broadcast scalar, one
    linear pass — no window, no driver loop over users."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("xc"),
        F.count(F.lit(1)).cast("bigint").alias("yc"),
    )
    m = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xc").cast("bigint").alias("sx"),
        F.sum("yc").cast("bigint").alias("sy"),
        F.sum(F.col("xc") * F.col("xc")).cast("bigint").alias("sxx"),
        F.sum(F.col("yc") * F.col("yc")).cast("bigint").alias("syy"),
        F.sum(F.col("xc") * F.col("yc")).cast("bigint").alias("sxy"),
    )
    mx = F.col("sx").cast("double") / F.col("n")
    my = F.col("sy").cast("double") / F.col("n")
    c = m.select(
        mx.alias("mx"),
        my.alias("my"),
        (F.col("sxx").cast("double") / F.col("n") - mx * mx).alias("vxx"),
        (F.col("syy").cast("double") / F.col("n") - my * my).alias("vyy"),
        (F.col("sxy").cast("double") / F.col("n") - mx * my).alias("vxy"),
    )
    dx = F.col("xc").cast("double") - F.col("mx")
    dy = F.col("yc").cast("double") - F.col("my")
    md2 = (
        F.col("vyy") * dx * dx
        - 2 * F.col("vxy") * dx * dy
        + F.col("vxx") * dy * dy
    ) / (F.col("vxx") * F.col("vyy") - F.col("vxy") * F.col("vxy"))
    return u.crossJoin(F.broadcast(c)).select(
        "user_id",
        F.round(md2, 6).alias("md2"),
        (md2 > F.lit(_MAHA_CHI2_2_99).cast("double")).alias("outlier"),
    )


@query(
    "seq_pattern_support",
    oracle="""
WITH tot AS (
  SELECT COUNT(DISTINCT o_custkey) AS n_cust FROM orders
), pat AS (
  SELECT DISTINCT a.o_custkey, a.o_orderpriority AS p1,
         b.o_orderpriority AS p2
  FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey
   AND (a.o_orderdate < b.o_orderdate
        OR (a.o_orderdate = b.o_orderdate
            AND a.o_orderkey < b.o_orderkey))
)
SELECT p1, p2, CAST(COUNT(*) AS BIGINT) AS support,
       CAST(COUNT(*) AS DOUBLE) / (SELECT n_cust FROM tot) AS support_frac
FROM pat GROUP BY p1, p2
""",
)
def seq_pattern_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern support mining (the GSP/PrefixSpan length-2
    tier): for every ordered priority pair (p1 then p2, ANY gap —
    subsequence containment, not adjacency, which is what separates
    this from markov_transitions' adjacent-step counts), the number
    of customers whose order history contains it. Per-customer pair
    generation is an equi-join on custkey with a lexicographic
    (date, key) precedence filter — O(sum n_c^2) with n_c bounded by
    orders-per-customer (<= ~40), so the shuffle is keyed and skew-
    free at any corpus size; the 5x5 pattern domain bounds the
    output. support_frac divides identical exact integers, so the
    double is engine-identical."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    a = o.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("ka"),
        F.col("o_orderdate").alias("da"),
        F.col("o_orderpriority").alias("p1"),
    )
    b = o.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("kb"),
        F.col("o_orderdate").alias("db"),
        F.col("o_orderpriority").alias("p2"),
    )
    pat = (
        a.join(b, "ck")
        .filter(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("ka") < F.col("kb")))
        )
        .select("ck", "p1", "p2")
        .distinct()
    )
    n_cust = o.select("o_custkey").distinct().count()
    return pat.groupBy("p1", "p2").agg(
        F.count(F.lit(1)).cast("bigint").alias("support"),
        (F.count(F.lit(1)).cast("double") / F.lit(n_cust)).alias(
            "support_frac"
        ),
    )


_REC_TOPK = 50


@query(
    "rec_eval_popularity",
    oracle=f"""
WITH last_o AS (
  SELECT o_custkey AS ck, o_orderkey AS ok FROM (
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders)
  WHERE rn = 1
), test_p AS (
  SELECT DISTINCT t.ck, l.l_partkey AS p
  FROM last_o t JOIN lineitem l ON l.l_orderkey = t.ok
), train AS (
  SELECT l.l_partkey AS p, COUNT(*) AS cnt
  FROM lineitem l
  WHERE l.l_orderkey NOT IN (SELECT ok FROM last_o)
  GROUP BY l.l_partkey
), top AS (
  SELECT p, ROW_NUMBER() OVER (ORDER BY cnt DESC, p) AS rnk
  FROM train QUALIFY rnk <= {_REC_TOPK}
), best AS (
  SELECT tp.ck, MIN(t.rnk) AS best_rank
  FROM test_p tp LEFT JOIN top t ON t.p = tp.p
  GROUP BY tp.ck
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN best_rank <= 10 THEN 1 ELSE 0 END) AS BIGINT)
         AS hits_at_10,
       CAST(SUM(CASE WHEN best_rank IS NOT NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS hits_at_{_REC_TOPK},
       CAST(SUM(CASE WHEN best_rank IS NOT NULL
                     THEN 1000000000 // best_rank ELSE 0 END) AS BIGINT)
         AS rr_nano_sum,
       CAST(SUM(CASE WHEN best_rank IS NOT NULL
                     THEN 1000000000 // best_rank ELSE 0 END) AS DOUBLE)
         / COUNT(*) / 1000000000 AS mrr
FROM best
""",
)
def rec_eval_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recommender evaluation harness, popularity baseline: hold out
    every customer's LAST order (leave-last-basket-out — the standard
    temporal split), rank parts by training-set popularity, and score
    hit-rate@10 / @{_REC_TOPK} and MRR of each held-out basket
    against the top-{_REC_TOPK} list. The floor every real
    recommender must beat, and the eval plumbing (temporal split,
    deterministic ranking, reciprocal-rank aggregation) is the
    reusable part.

    Exactness: the split is a keyed window (per-customer, date+key
    ties); the ranking is (count DESC, partkey) — fully
    deterministic; reciprocal ranks are quantized with the
    positive-operand floor division 1e9 // rank and bigint-summed.
    Scale shape: one keyed window for the split, one anti-join to
    drop test orders from training counts, a part-keyed hash
    aggregate; the top-{_REC_TOPK} list is fetched once (bounded 50
    rows) and broadcast back against the test baskets — the heavy
    tables never meet in a pair join."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    last_o = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("o_custkey").alias("ck"), F.col("o_orderkey").alias("ok"))
    )
    test_p = (
        last_o.join(li, last_o["ok"] == li["l_orderkey"])
        .select("ck", F.col("l_partkey").alias("p"))
        .distinct()
    )
    train = (
        li.join(
            last_o.select("ok"),
            li["l_orderkey"] == F.col("ok"),
            "left_anti",
        )
        .groupBy(F.col("l_partkey").alias("p"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top_rows = (
        train.orderBy(F.col("cnt").desc(), "p").limit(_REC_TOPK).collect()
    )  # bounded: exactly _REC_TOPK rows at any data size
    top = spark.createDataFrame(
        [(int(r["p"]), i + 1) for i, r in enumerate(top_rows)],
        "p bigint, rnk int",
    )
    best = (
        test_p.join(F.broadcast(top), "p", "left")
        .groupBy("ck")
        .agg(F.min("rnk").alias("best_rank"))
    )
    rr = F.when(
        F.col("best_rank").isNotNull(),
        F.expr("1000000000 div best_rank"),
    ).otherwise(F.lit(0))
    return best.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.when(F.col("best_rank") <= 10, 1).otherwise(0))
        .cast("bigint")
        .alias("hits_at_10"),
        F.sum(F.when(F.col("best_rank").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias(f"hits_at_{_REC_TOPK}"),
        F.sum(rr).cast("bigint").alias("rr_nano_sum"),
        (
            F.sum(rr).cast("double")
            / F.count(F.lit(1))
            / F.lit(1000000000)
        ).alias("mrr"),
    )


@query(
    "survival_nelson_aalen",
    oracle="""
WITH s AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS tp
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s.t0
  GROUP BY e.user_id
), durs AS (
  SELECT CASE WHEN p.tp IS NOT NULL
              THEN CAST(floor((epoch_us(p.tp) - epoch_us(s.t0))
                              / 86400000000) AS BIGINT)
              ELSE CAST(floor((epoch_us(TIMESTAMP '2024-01-31 00:00:00')
                               - epoch_us(s.t0)) / 86400000000) AS BIGINT)
         END AS dur,
         CASE WHEN p.tp IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM s LEFT JOIN p ON s.user_id = p.user_id
), risk AS (
  SELECT dur, CAST(SUM(ev) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS n_total
  FROM durs GROUP BY dur
), tbl AS (
  SELECT dur, d,
         CAST(SUM(n_total) OVER (ORDER BY dur
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
              AS BIGINT) AS n
  FROM risk
), cum AS (
  SELECT dur, d, n,
         CAST(SUM((d * 1000000000) // n) OVER (
              ORDER BY dur ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS h_nano,
         CAST(SUM((d * 1000000000000) // (n * n)) OVER (
              ORDER BY dur ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS v_pico
  FROM tbl
)
SELECT dur AS day, n AS n_at_risk, d AS n_events,
       h_nano AS cumhaz_nano,
       CAST(h_nano AS DOUBLE) / 1000000000 AS cumhaz,
       sqrt(CAST(v_pico AS DOUBLE) / 1000000000000) AS se
FROM cum WHERE d > 0
""",
)
def survival_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator for the same
    signup -> first-purchase study as survival_km: H(t) =
    sum_{event days <= t} d_j / n_j with the standard variance
    sum d_j / n_j^2 — the additive twin of KM's product (and the
    better-behaved one at small risk sets; -ln S vs H is the classic
    model check).

    Exactness is SIMPLER than KM's sequential float fold: each
    per-day term is quantized once with positive-operand floor
    division ((d * 1e9) // n; variance at 1e12), so the cumulative
    curves are ORDER-FREE integer sums — no IEEE sequencing contract
    at all. Scale shape: two first-touch aggregates + one user_id
    equi-join reduce subjects to the O(distinct durations) risk
    table, which is bounded by the STUDY LENGTH in days (calendar,
    not data) — the suffix/prefix finish runs on the driver over
    that bounded table (the ts_* local-finish tier; d stays under
    the 1e12 quantizer's int64 budget up to ~9M events/day)."""
    ev = load(spark, sf_dir, "events")
    end_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'2024-01-01 00:00:00',"
        " TIMESTAMP_NTZ'2024-01-31 00:00:00')"
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    diff_us = F.when(
        F.col("tp").isNotNull(),
        F.expr("timestampdiff(MICROSECOND, t0, tp)").cast("double"),
    ).otherwise(
        end_us.cast("double")
        - F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ'2024-01-01 00:00:00', t0)"
        ).cast("double")
    )
    durs = s.join(p, "user_id", "left").select(
        F.floor(diff_us / 86400000000).cast("long").alias("dur"),
        F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    risk = (
        durs.groupBy("dur")
        .agg(
            F.sum("ev").cast("long").alias("d"),
            F.count(F.lit(1)).cast("long").alias("n_total"),
        )
        .collect()  # bounded: O(study-length days) rows
    )
    risk.sort(key=lambda r: r["dur"])
    if any(int(r["d"]) > 8_000_000 for r in risk):
        raise ValueError(
            "survival_nelson_aalen: daily event count exceeds the 1e12"
            " variance quantizer's int64 budget — lower the scale"
        )
    n = sum(int(r["n_total"]) for r in risk)
    out = []
    h_nano = 0
    v_pico = 0
    for r in risk:
        d = int(r["d"])
        h_nano += (d * 1_000_000_000) // n
        v_pico += (d * 1_000_000_000_000) // (n * n)
        if d > 0:
            out.append(
                (
                    int(r["dur"]),
                    n,
                    d,
                    h_nano,
                    float(h_nano) / 1_000_000_000,
                    (float(v_pico) / 1_000_000_000_000) ** 0.5,
                )
            )
        n -= int(r["n_total"])
    return spark.createDataFrame(
        out,
        "day bigint, n_at_risk bigint, n_events bigint,"
        " cumhaz_nano bigint, cumhaz double, se double",
    )


@query(
    "agg_littles_law",
    bounded_cross="two 1-row scalars (horizon, job moments) crossed",
    oracle="""
WITH jobs AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         CAST(epoch_us(MIN(ts)) AS BIGINT) AS s,
         CAST(epoch_us(MAX(ts)) AS BIGINT) + 60000000 AS e
  FROM events GROUP BY 1, 2
), hz AS (
  SELECT CAST(MIN(s) AS BIGINT) AS h0, CAST(MAX(e) AS BIGINT) AS h1
  FROM jobs
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(e - s) AS BIGINT) AS busy_us
  FROM jobs
)
SELECT m.n AS n_jobs,
       CAST(hz.h1 - hz.h0 AS DOUBLE) / 3600000000 AS horizon_hours,
       CAST(m.n AS DOUBLE) / (CAST(hz.h1 - hz.h0 AS DOUBLE) / 3600000000)
         AS lambda_per_hour,
       CAST(m.busy_us AS DOUBLE) / m.n / 60000000 AS w_mean_minutes,
       CAST(m.busy_us AS DOUBLE) / (hz.h1 - hz.h0) AS l_time_avg,
       (CAST(m.n AS DOUBLE) / (CAST(hz.h1 - hz.h0 AS DOUBLE) / 3600000000))
         * (CAST(m.busy_us AS DOUBLE) / m.n / 60000000) / 60
         / (CAST(m.busy_us AS DOUBLE) / (hz.h1 - hz.h0)) AS littles_ratio
FROM m, hz
""",
)
def agg_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law audit of user activity: jobs are per-(user, day)
    activity spans (first to last event + a 1-minute floor);
    L = time-average concurrent jobs, lambda = arrival rate,
    W = mean span — and L = lambda * W (Brumelle/Little identity,
    exact here because the time-average concurrency integral equals
    the exact integer sum of span durations over the horizon —
    sum(cur * dt) == sum(durations) for any interval set). The
    reported ratio folds the unit conversions back out and reads
    1.0 up to float — the ops-queueing sanity check every capacity
    model starts from; interval_concurrency gives the per-day PEAK
    view of the same sweep.

    Exactness: all spans and the horizon are exact integer
    epoch-microseconds; the five outputs are fixed double
    expressions over three exact integers. Scale shape: one hash
    aggregate to O(user-days), two 1-row reductions, a declared
    scalar cross."""
    ev = load(spark, sf_dir, "events")
    jobs = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.expr("CAST(unix_micros(CAST(MIN(ts) AS TIMESTAMP)) AS BIGINT)").alias("s"),
        (F.expr("CAST(unix_micros(CAST(MAX(ts) AS TIMESTAMP)) AS BIGINT)") + 60000000).alias(
            "e"
        ),
    )
    hz = jobs.agg(
        F.min("s").cast("bigint").alias("h0"),
        F.max("e").cast("bigint").alias("h1"),
    )
    m = jobs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("e") - F.col("s")).cast("bigint").alias("busy_us"),
    )
    j = m.crossJoin(F.broadcast(hz))
    hor = (F.col("h1") - F.col("h0")).cast("double")
    hor_h = hor / F.lit(3600000000)
    lam = F.col("n").cast("double") / hor_h
    w_min = F.col("busy_us").cast("double") / F.col("n") / F.lit(60000000)
    l_avg = F.col("busy_us").cast("double") / (F.col("h1") - F.col("h0"))
    return j.select(
        F.col("n").alias("n_jobs"),
        hor_h.alias("horizon_hours"),
        lam.alias("lambda_per_hour"),
        w_min.alias("w_mean_minutes"),
        l_avg.alias("l_time_avg"),
        (lam * w_min / F.lit(60) / l_avg).alias("littles_ratio"),
    )


@query(
    "rec_eval_itemknn",
    oracle="""
WITH last_o AS (
  SELECT o_custkey AS ck, o_orderkey AS ok FROM (
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders)
  WHERE rn = 1
), tr_items AS (
  SELECT DISTINCT o.o_custkey AS ck, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_orderkey NOT IN (SELECT ok FROM last_o)
), basket AS (
  SELECT DISTINCT l.l_orderkey AS ok, l.l_partkey AS p
  FROM lineitem l
  WHERE l.l_orderkey NOT IN (SELECT ok FROM last_o)
), co AS (
  SELECT a.p AS i, b.p AS j, CAST(COUNT(*) AS BIGINT) AS c
  FROM basket a JOIN basket b ON a.ok = b.ok AND a.p <> b.p
  GROUP BY 1, 2
), cand AS (
  SELECT t.ck, co.j, CAST(SUM(co.c) AS BIGINT) AS score
  FROM tr_items t JOIN co ON co.i = t.p
  GROUP BY 1, 2
), unseen AS (
  SELECT c.ck, c.j, c.score
  FROM cand c LEFT JOIN tr_items t ON t.ck = c.ck AND t.p = c.j
  WHERE t.p IS NULL
), recs AS (
  SELECT ck, j, ROW_NUMBER() OVER (PARTITION BY ck
           ORDER BY score DESC, j) AS rnk
  FROM unseen QUALIFY rnk <= 50
), test_p AS (
  SELECT DISTINCT t.ck, l.l_partkey AS p
  FROM last_o t JOIN lineitem l ON l.l_orderkey = t.ok
), best AS (
  SELECT tp.ck, MIN(r.rnk) AS best_rank
  FROM test_p tp LEFT JOIN recs r ON r.ck = tp.ck AND r.j = tp.p
  GROUP BY tp.ck
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN best_rank <= 10 THEN 1 ELSE 0 END) AS BIGINT)
         AS hits_at_10,
       CAST(SUM(CASE WHEN best_rank IS NOT NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS hits_at_50,
       CAST(SUM(CASE WHEN best_rank IS NOT NULL
                     THEN 1000000000 // best_rank ELSE 0 END) AS BIGINT)
         AS rr_nano_sum,
       CAST(SUM(CASE WHEN best_rank IS NOT NULL
                     THEN 1000000000 // best_rank ELSE 0 END) AS DOUBLE)
         / COUNT(*) / 1000000000 AS mrr
FROM best
""",
)
def rec_eval_itemknn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-based collaborative filtering under the SAME leave-last-
    basket-out protocol as rec_eval_popularity: train-basket
    co-occurrence counts score each customer's unseen candidates
    (score(c, j) = sum over the customer's training items i of
    co(i, j) — exact integer co-counts, the classic item-item CF
    kernel), top-50 PERSONALIZED lists replace the single global
    popularity list, and the identical hit@10/@50 + MRR harness
    makes the two keys directly comparable — the lift of
    personalization over the popularity floor, measured.

    Exactness: the split, co-counts, candidate scores, seen-item
    exclusion and (score DESC, part) ranking are all exact integer
    operations; MRR uses the quantized 1e9 // rank reciprocal.
    Scale shape: co-occurrence is a within-basket self-join (<= 42
    pairs per order — basket-bounded, linear in orders); candidate
    generation joins user-items to co-lists and hash-aggregates one
    row per (customer, candidate); ranking is a per-customer
    partitioned window (WindowGroupLimit caps at 50); the heavy
    tables never meet in an unbounded pair join."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    last_o = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("o_custkey").alias("ck"), F.col("o_orderkey").alias("ok"))
    )
    train_li = li.join(
        last_o.select(F.col("ok").alias("l_orderkey")),
        "l_orderkey",
        "left_anti",
    )
    tr_items = (
        train_li.join(
            o.select("o_orderkey", "o_custkey"),
            train_li["l_orderkey"] == o["o_orderkey"],
        )
        .select(F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    basket = train_li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p")
    ).distinct()
    a = basket.select("ok", F.col("p").alias("i"))
    b = basket.select(F.col("ok").alias("ok2"), F.col("p").alias("j"))
    co = (
        a.join(b, (a["ok"] == b["ok2"]) & (F.col("i") != F.col("j")))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cand = (
        tr_items.join(co, tr_items["p"] == co["i"])
        .groupBy("ck", "j")
        .agg(F.sum("c").cast("bigint").alias("score"))
    )
    unseen = cand.join(
        tr_items.select("ck", F.col("p").alias("j")),
        ["ck", "j"],
        "left_anti",
    )
    wr = Window.partitionBy("ck").orderBy(F.desc("score"), "j")
    recs = (
        unseen.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 50)
        .select("ck", "j", "rnk")
    )
    test_p = (
        li.join(last_o, li["l_orderkey"] == last_o["ok"])
        .select("ck", F.col("l_partkey").alias("p"))
        .distinct()
    )
    best = (
        test_p.join(
            recs,
            (test_p["ck"] == recs["ck"]) & (test_p["p"] == recs["j"]),
            "left",
        )
        .select(test_p["ck"].alias("tck"), "rnk")
        .groupBy("tck")
        .agg(F.min("rnk").alias("best_rank"))
    )
    rr = F.when(
        F.col("best_rank").isNotNull(),
        F.expr("1000000000 div best_rank"),
    ).otherwise(0)
    return best.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.when(F.col("best_rank") <= 10, 1).otherwise(0))
        .cast("bigint")
        .alias("hits_at_10"),
        F.sum(F.when(F.col("best_rank").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("hits_at_50"),
        F.sum(rr).cast("bigint").alias("rr_nano_sum"),
        (
            F.sum(rr).cast("double")
            / F.count(F.lit(1))
            / F.lit(1000000000)
        ).alias("mrr"),
    )


RMST_TAU = 365  # restriction horizon (days)


@query(
    "survival_rmst",
    oracle=f"""
WITH s AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS tp
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s.t0
  GROUP BY e.user_id
), durs AS (
  SELECT s.user_id,
         CASE WHEN p.tp IS NOT NULL
              THEN CAST(floor((epoch_us(p.tp) - epoch_us(s.t0))
                              / 86400000000) AS BIGINT)
              ELSE CAST(floor((epoch_us(TIMESTAMP '2024-01-31 00:00:00')
                               - epoch_us(s.t0)) / 86400000000) AS BIGINT)
         END AS dur,
         CASE WHEN p.tp IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM s LEFT JOIN p ON s.user_id = p.user_id
), risk AS (
  SELECT dur, CAST(SUM(ev) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_total
  FROM durs GROUP BY dur
), tbl AS (
  SELECT dur, n_events,
         CAST(SUM(n_total) OVER (ORDER BY dur
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
              AS BIGINT) AS n_at_risk
  FROM risk
), curve AS (
  SELECT dur, n_events, n_at_risk,
         list(1.0 - CAST(n_events AS DOUBLE) / n_at_risk)
           OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS fs
  FROM tbl
), ev_curve AS (
  SELECT dur AS day, list_reduce(fs, (a, x) -> a * x) AS survival
  FROM curve WHERE n_events > 0
), seg AS (
  SELECT day, survival,
         COALESCE(LEAD(day) OVER (ORDER BY day), {RMST_TAU}) AS nxt
  FROM ev_curve WHERE day < {RMST_TAU}
), parts AS (
  SELECT day,
         survival * (LEAST(nxt, {RMST_TAU}) - day) AS contrib,
         survival
  FROM seg
), head AS (
  SELECT LEAST(COALESCE(MIN(day), {RMST_TAU}), {RMST_TAU}) AS d1
  FROM ev_curve
)
SELECT CAST({RMST_TAU} AS BIGINT) AS tau_days,
       CAST(head.d1 AS DOUBLE)
         + COALESCE(list_sum(list(parts.contrib ORDER BY parts.day)), 0.0)
         AS rmst_days,
       CAST(COUNT(parts.day) AS BIGINT) AS n_event_days_in_tau,
       COALESCE(arg_max(parts.survival, parts.day), 1.0) AS survival_at_tau
FROM head LEFT JOIN parts ON TRUE
GROUP BY head.d1
""",
)
def survival_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time to tau = {RMST_TAU} days for
    the signup -> first-purchase process: the area under the
    Kaplan-Meier step curve — 'average purchase-free days in the
    first year' — the regulator-preferred effect summary when
    hazards aren't proportional, completing the survival family
    (survival_km the curve, survival_nelson_aalen the cumulative
    hazard, survival_logrank the comparison; this INTEGRATES).

    Exactness: the step curve comes from the registered
    survival_km machinery (sequential left-fold products — the
    proven bit-identical chain); each segment contribution is
    S * (integer day gap) and the area folds in DAY order via the
    strict-fold pair. Scale shape: the KM reduction (two
    first-touch aggregates + an equi-join) then O(distinct days)
    bounded windows and a 1-row fold."""
    km = survival_km(spark, sf_dir).select("day", "survival")
    # bounded: O(distinct event days) curve rows
    w = Window.orderBy("day")
    seg = (
        km.filter(F.col("day") < RMST_TAU)
        .select(
            "day",
            "survival",
            F.coalesce(F.lead("day").over(w), F.lit(RMST_TAU)).alias("nxt"),
        )
    )
    parts = seg.select(
        "day",
        "survival",
        (
            F.col("survival")
            * (F.least(F.col("nxt"), F.lit(RMST_TAU)) - F.col("day"))
        ).alias("contrib"),
    )
    d1 = km.agg(
        F.least(
            F.coalesce(F.min("day"), F.lit(RMST_TAU)), F.lit(RMST_TAU)
        ).alias("d1")
    ).collect()[0]["d1"]
    agg = parts.agg(
        F.coalesce(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("day", F.col("contrib").alias("v")))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["v"],
            ),
            F.lit(0.0),
        ).alias("area"),
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.coalesce(F.max_by("survival", "day"), F.lit(1.0)).alias("s_tau"),
    )
    return agg.select(
        F.lit(RMST_TAU).cast("bigint").alias("tau_days"),
        (F.lit(float(d1)) + F.col("area")).alias("rmst_days"),
        F.col("nd").alias("n_event_days_in_tau"),
        F.col("s_tau").alias("survival_at_tau"),
    )


@query(
    "agg_meta_analysis",
    bounded_cross="1-row pooled scalar onto the <=25-nation effect table",
    oracle="""
WITH base AS (
  SELECT c.c_nationkey AS nk,
         CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS tr,
         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), g AS (
  SELECT nk,
         CAST(SUM(tr) AS BIGINT) AS nt,
         CAST(SUM(tr * y) AS BIGINT) AS yt,
         CAST(SUM(1 - tr) AS BIGINT) AS nc,
         CAST(SUM((1 - tr) * y) AS BIGINT) AS yc
  FROM base GROUP BY nk
), eff AS (
  SELECT nk,
         CAST(yt AS DOUBLE) / nt - CAST(yc AS DOUBLE) / nc AS d,
         (CAST(yt AS DOUBLE) / nt) * (1 - CAST(yt AS DOUBLE) / nt) / nt
           + (CAST(yc AS DOUBLE) / nc) * (1 - CAST(yc AS DOUBLE) / nc) / nc
           AS v
  FROM g WHERE nt > 0 AND nc > 0
), ok AS (
  SELECT nk, d, v FROM eff WHERE v > 0
), pool AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         list_sum(list(d / v ORDER BY nk)) AS swd,
         list_sum(list(1 / v ORDER BY nk)) AS sw
  FROM ok
), q AS (
  SELECT pool.k, pool.swd, pool.sw,
         list_sum(list((ok.d - pool.swd / pool.sw)
                       * (ok.d - pool.swd / pool.sw) / ok.v
                  ORDER BY ok.nk)) AS q_stat
  FROM ok, pool
  GROUP BY pool.k, pool.swd, pool.sw
)
SELECT k AS k_nations,
       swd / sw AS pooled_effect,
       sqrt(1 / sw) AS se_pooled,
       q_stat,
       GREATEST(0.0, (q_stat - (k - 1)) / q_stat) AS i_squared
FROM q
""",
)
def agg_meta_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-effect meta-analysis of the per-nation URGENT-priority
    fulfilment effect: each nation is a 'study' with risk difference
    d_i and variance v_i; inverse-variance pooling gives the common
    effect and its SE, Cochran's Q and Higgins' I^2 quantify
    between-nation heterogeneity — the evidence-synthesis machinery
    (and the formal version of 'does the effect replicate across
    segments?' that agg_simpsons_paradox eyeballs).

    Exactness: per-nation counts are exact integers; d_i and v_i
    are fixed double expressions; all cross-nation accumulations
    fold in NATION order via the strict-fold pair, with the pooled
    scalar crossed back for Q. Degenerate nations (no arm or zero
    variance) are excluded by exact comparisons. Scale shape: one
    broadcast dim join + a 25-row hash aggregate; everything after
    is bounded."""
    base = (
        load(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                load(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey"
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_nationkey").alias("nk"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("tr"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        )
    )
    g = base.groupBy("nk").agg(
        F.sum("tr").cast("bigint").alias("nt"),
        F.sum(F.col("tr") * F.col("y")).cast("bigint").alias("yt"),
        F.sum(1 - F.col("tr")).cast("bigint").alias("nc"),
        F.sum((1 - F.col("tr")) * F.col("y")).cast("bigint").alias("yc"),
    )
    pt = F.col("yt").cast("double") / F.col("nt")
    pc = F.col("yc").cast("double") / F.col("nc")
    eff = g.filter((F.col("nt") > 0) & (F.col("nc") > 0)).select(
        "nk",
        (pt - pc).alias("d"),
        (
            pt * (1 - pt) / F.col("nt") + pc * (1 - pc) / F.col("nc")
        ).alias("v"),
    )
    ok = eff.filter(F.col("v") > 0)

    def nk_fold(expr_fn):
        return F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct("nk", F.col("d").alias("d"), F.col("v").alias("v"))
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + expr_fn(x),
        )

    pool = ok.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        nk_fold(lambda x: x["d"] / x["v"]).alias("swd"),
        nk_fold(lambda x: F.lit(1.0) / x["v"]).alias("sw"),
    )
    # bounded: 1-row pooled scalar onto <=25 nation rows
    joined = ok.crossJoin(F.broadcast(pool))
    pooled = F.col("swd") / F.col("sw")
    q = joined.groupBy("k", "swd", "sw").agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "nk",
                        (
                            (F.col("d") - pooled)
                            * (F.col("d") - pooled)
                            / F.col("v")
                        ).alias("t"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("q_stat")
    )
    return q.select(
        F.col("k").alias("k_nations"),
        (F.col("swd") / F.col("sw")).alias("pooled_effect"),
        F.sqrt(F.lit(1.0) / F.col("sw")).alias("se_pooled"),
        "q_stat",
        F.greatest(
            F.lit(0.0),
            (F.col("q_stat") - (F.col("k") - 1)) / F.col("q_stat"),
        ).alias("i_squared"),
    )
