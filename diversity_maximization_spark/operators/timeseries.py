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
    bounded_cross="tiny cross: 5 event types x generated hour grid",
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


@query(
    "ts_resample_interp",
    bounded_cross="tiny cross: 5 event types x generated hour grid",
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
), joined AS (
  SELECT g.event_type, g.bucket, h.n, h.total_cents,
         epoch(g.bucket) AS et
  FROM grid g LEFT JOIN hourly h
    ON g.event_type = h.event_type AND g.bucket = h.bucket
), win AS (
  SELECT event_type, bucket, COALESCE(n, 0) AS n, total_cents,
         last_value(total_cents IGNORE NULLS) OVER wp AS pc,
         last_value(CASE WHEN total_cents IS NOT NULL THEN et END
                    IGNORE NULLS) OVER wp AS pt,
         first_value(total_cents IGNORE NULLS) OVER wf AS nc,
         first_value(CASE WHEN total_cents IS NOT NULL THEN et END
                     IGNORE NULLS) OVER wf AS nt,
         et
  FROM joined
  WINDOW wp AS (PARTITION BY event_type ORDER BY bucket
                ROWS UNBOUNDED PRECEDING),
         wf AS (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, bucket, CAST(n AS BIGINT) AS n,
       round(CASE WHEN total_cents IS NOT NULL
                  THEN CAST(total_cents AS DOUBLE) / 100
                  WHEN pc IS NOT NULL AND nc IS NOT NULL
                  THEN (CAST(pc AS DOUBLE)
                        + (nc - pc) * ((et - pt) / (nt - pt))) / 100
             END, 6) AS interp_total
FROM win
""",
)
def ts_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resampling on the dense hourly grid (the
    companion to ts_gapfill_locf): empty buckets get the straight
    line between the surrounding observations by time fraction;
    leading/trailing gaps (no neighbor on one side) stay NULL.
    Per-series windows (one forward, one backward over the same
    partitioning — a single Exchange), exact integer cents inside the
    interpolation so the only float ops are the final fraction and
    multiply, written in the identical order in both engines."""
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
    et = F.col("bucket").cast("timestamp").cast("double")
    joined = grid.join(hourly, ["event_type", "bucket"], "left").withColumn(
        "et", et
    )
    obs_t = F.when(F.col("total_cents").isNotNull(), F.col("et"))
    wp = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    win = joined.select(
        "event_type",
        "bucket",
        F.coalesce("n", F.lit(0)).alias("n"),
        "total_cents",
        F.last("total_cents", ignorenulls=True).over(wp).alias("pc"),
        F.last(obs_t, ignorenulls=True).over(wp).alias("pt"),
        F.first("total_cents", ignorenulls=True).over(wf).alias("nc"),
        F.first(obs_t, ignorenulls=True).over(wf).alias("nt"),
        "et",
    )
    frac = (F.col("et") - F.col("pt")) / (F.col("nt") - F.col("pt"))
    interp = (
        F.col("pc").cast("double") + (F.col("nc") - F.col("pc")) * frac
    ) / 100
    return win.select(
        "event_type",
        "bucket",
        "n",
        F.round(
            F.when(
                F.col("total_cents").isNotNull(),
                F.col("total_cents").cast("double") / 100,
            ).when(
                F.col("pc").isNotNull() & F.col("nc").isNotNull(), interp
            ),
            6,
        ).alias("interp_total"),
    )


EWMA_ALPHA = 0.3


@query(
    "ts_ewma",
    oracle=f"""
WITH w AS (
  SELECT user_id, event_id,
         list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS hist
  FROM events
)
SELECT user_id, event_id,
       list_reduce(hist, (acc, v) -> {EWMA_ALPHA} * v
                                     + {1 - EWMA_ALPHA} * acc) AS ewma
FROM w
""",
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series exponentially-weighted moving average (the classic
    smoother a metrics pipeline runs per device/user): ewma_1 = x_1,
    ewma_t = a*x_t + (1-a)*ewma_{t-1}, ordered by (ts, event_id).
    The recurrence is inherently sequential PER KEY but embarrassingly
    parallel ACROSS keys, so the scale-correct plan is one shuffle by
    user_id followed by an Arrow-batched applyInPandas that runs the
    O(n) fold next to the data — state is one float per series, never
    the history. (A window-function formulation would need either
    per-row weighted re-sums — O(n*w) — or exp/log tricks that
    underflow; the fold is both faster and exact.)

    Hash-exactness: IEEE-754 double ops are deterministic, so as long
    as BOTH engines apply literally `a*x + (1-a)*acc` in the same
    order the results are bit-identical — the oracle replays the
    identical fold with DuckDB's list_reduce over a window-collected
    ordered history (fine at oracle scale, O(n^2) list
    materialization — intentionally naive, see PLANS.md)."""
    ev = load(spark, sf_dir, "events")
    return smooth_series(
        ev, ["user_id"], ["ts", "event_id"], "value", alpha=EWMA_ALPHA
    ).select("user_id", "event_id", "ewma")


HOLT_ALPHA = 0.5
HOLT_BETA = 0.3


@query(
    "ts_holt",
    oracle=f"""
WITH RECURSIVE ev AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), r AS (
  SELECT user_id, event_id, rn, value,
         CAST(value AS DOUBLE) AS level, CAST(0.0 AS DOUBLE) AS trend
  FROM ev WHERE rn = 1
  UNION ALL
  SELECT ev.user_id, ev.event_id, ev.rn, ev.value,
         {HOLT_ALPHA} * ev.value
           + {1 - HOLT_ALPHA} * (r.level + r.trend) AS level,
         {HOLT_BETA} * (({HOLT_ALPHA} * ev.value
                         + {1 - HOLT_ALPHA} * (r.level + r.trend)) - r.level)
           + {1 - HOLT_BETA} * r.trend AS trend
  FROM r JOIN ev ON ev.user_id = r.user_id AND ev.rn = r.rn + 1
)
SELECT user_id, event_id, level, trend, level + trend AS forecast_1
FROM r
""",
)
def ts_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (level+trend double-exponential) smoothing per
    series, with the one-step-ahead forecast — what a capacity
    planner runs per metric key. Two floats of state per series:
    level' = a*x + (1-a)*(level+trend);
    trend' = b*(level'-level) + (1-b)*trend, seeded (x_1, 0).

    Same execution contract as ts_ewma: one shuffle by series key,
    then an Arrow applyInPandas O(n) fold — sequential per key,
    embarrassingly parallel across keys. The oracle cannot replay a
    TWO-variable recurrence with list_reduce (the accumulator must
    be element-typed), so it walks the identical arithmetic with a
    recursive CTE instead — one recursion step per position, exactly
    the graph_ancestor_depth pattern. Both engines evaluate literally
    the same expression tree, so IEEE determinism keeps the driver
    hash exact."""
    ev = load(spark, sf_dir, "events")
    sm = smooth_series(
        ev, ["user_id"], ["ts", "event_id"], "value",
        alpha=HOLT_ALPHA, beta=HOLT_BETA,
    )
    return sm.select(
        "user_id", "event_id", "level", "trend",
        (F.col("level") + F.col("trend")).alias("forecast_1"),
    )


_HIER_SQL = """
SELECT CASE WHEN h IS NOT NULL THEN 'hour'
            WHEN d IS NOT NULL THEN 'day'
            ELSE 'month' END AS level,
       coalesce(h, d, m) AS bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM (SELECT date_trunc('hour', ts) AS h,
             date_trunc('day', ts) AS d,
             date_trunc('month', ts) AS m,
             value
      FROM events)
GROUP BY GROUPING SETS ((h), (d), (m))
""".strip()


@query("ts_rollup_hierarchy", oracle=_HIER_SQL)
def ts_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour/day/month continuous-aggregate hierarchy from ONE scan via
    GROUPING SETS — the hypertable rollup family ts_rollup_daily
    demonstrates two-level, generalized: Catalyst plans the three
    granularities as a single Expand (3x row replication with
    map-side partial aggregation), so the fact table is read once,
    not once per level. Exact integer cents make every level's total
    reproducible and re-aggregable. The IDENTICAL SQL text runs on
    both engines (the sql_adhoc contract)."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_HIER_SQL)


def smooth_series(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha: float = EWMA_ALPHA,
    beta: float | None = None,
) -> DataFrame:
    """Generic per-series exponential smoothing over any DataFrame:
    EWMA (beta=None) or Holt level+trend (beta set). One shuffle by
    key, then an Arrow applyInPandas O(n) fold with constant state —
    the execution contract ts_ewma / ts_holt demonstrate on the
    fixture. Output = key cols + order cols + value + the smoothed
    column(s)."""
    cols = key_cols + order_cols + [value_col]
    src = df.select(*cols)
    base = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields
    )
    extra = "level double, trend double" if beta is not None else "ewma double"
    a, b = alpha, beta

    def fold(pdf):
        pdf = pdf.sort_values(order_cols)
        if b is None:
            out, acc = [], None
            for v in pdf[value_col].to_numpy():
                acc = v if acc is None else a * v + (1 - a) * acc
                out.append(acc)
            return pdf.assign(ewma=out)
        levels, trends = [], []
        level = trend = None
        for x in pdf[value_col].to_numpy():
            if level is None:
                level, trend = x, 0.0
            else:
                new_level = a * x + (1 - a) * (level + trend)
                trend = b * (new_level - level) + (1 - b) * trend
                level = new_level
            levels.append(level)
            trends.append(trend)
        return pdf.assign(level=levels, trend=trends)

    return df.select(*cols).groupBy(*key_cols).applyInPandas(
        fold, f"{base}, {extra}"
    )


@query(
    "ts_cusum_drift",
    oracle="""
WITH mu AS (
  SELECT (CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS DOUBLE) / 100)
           / COUNT(*) AS m
  FROM events
), w AS (
  SELECT user_id, event_id,
         list(value - (SELECT m FROM mu))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hist
  FROM events
)
SELECT user_id, event_id,
       list_reduce(list_prepend(0.0, hist),
                   (acc, v) -> greatest(0.0, acc + v)) AS cusum
FROM w
""",
)
def ts_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift statistic per series (Page's cumulative
    sum — the classical sequential change detector a monitoring
    pipeline thresholds on): s_0 = 0, s_t = max(0, s_{t-1} + (x_t -
    mu)) against the corpus-wide exact-cents mean mu. Same execution
    contract as ts_ewma: one shuffle by key + Arrow O(n) fold with
    one float of state; mu is a broadcast scalar from exact integers.
    The oracle replays the identical fold via list_prepend(0.0) +
    list_reduce(greatest(0.0, acc + v)) — seeding with the prepended
    zero makes DuckDB's first-element-as-seed semantics apply the
    clamp to every element, matching the recurrence exactly
    (bit-exact; intentionally naive O(n^2) history materialization,
    see PLANS.md on ts_ewma)."""
    ev = load(spark, sf_dir, "events")
    mu = ev.agg(
        F.expr(
            "(CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS DOUBLE)"
            " / 100) / COUNT(*)"
        ).alias("m")
    ).collect()[0]["m"]

    def fold(pdf):
        pdf = pdf.sort_values(["ts", "event_id"])
        out = []
        acc = 0.0
        for v in pdf["value"].to_numpy():
            acc = max(0.0, acc + (v - mu))
            out.append(acc)
        return pdf.assign(cusum=out)[["user_id", "event_id", "cusum"]]

    return (
        ev.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(fold, "user_id bigint, event_id bigint, cusum double")
    )


@query(
    "ts_forecast_eval",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), lagged AS (
  SELECT event_type, c,
         lag(c, 1) OVER w AS naive_f,
         lag(c, 24) OVER w AS snaive_f
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
)
SELECT event_type,
       CAST(COUNT(snaive_f) AS BIGINT) AS n_eval,
       CAST(SUM(abs(c - naive_f)) FILTER (snaive_f IS NOT NULL) AS DOUBLE)
         / 100 / COUNT(snaive_f) AS mae_naive,
       CAST(SUM(abs(c - snaive_f)) FILTER (snaive_f IS NOT NULL) AS DOUBLE)
         / 100 / COUNT(snaive_f) AS mae_seasonal_naive
FROM lagged WHERE snaive_f IS NOT NULL
GROUP BY event_type
""",
)
def ts_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast baseline evaluation per series — the sanity harness
    any forecasting deployment needs BEFORE models: mean absolute
    error of the naive (last observation) and seasonal-naive (24
    observations back, the denominator of MASE) forecasts over the
    hourly revenue series. Errors are |exact cents - exact cents|
    integer sums, so both MAEs are single exact-integer quotients —
    bit-identical across engines, no rounding. Both lags share one
    window Exchange; evaluation is restricted to points where the
    seasonal forecast exists so the two MAEs cover the same rows
    (an honest MASE numerator/denominator pairing)."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.sum(F.expr("CAST(ROUND((value) * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    lagged = hourly.select(
        "event_type",
        "c",
        F.lag("c", 1).over(w).alias("naive_f"),
        F.lag("c", 24).over(w).alias("snaive_f"),
    ).filter(F.col("snaive_f").isNotNull())
    return lagged.groupBy("event_type").agg(
        F.count("snaive_f").alias("n_eval"),
        F.expr(
            "CAST(SUM(abs(c - naive_f)) AS DOUBLE) / 100 / COUNT(snaive_f)"
        ).alias("mae_naive"),
        F.expr(
            "CAST(SUM(abs(c - snaive_f)) AS DOUBLE) / 100 / COUNT(snaive_f)"
        ).alias("mae_seasonal_naive"),
    )


_SEAS_MEAN = "(CAST(s1 AS DOUBLE) / 100) / n"
_SEAS_VAR = (
    "((CAST(s2 AS DOUBLE) / 10000)"
    " - ((CAST(s1 AS DOUBLE) / 100) * (CAST(s1 AS DOUBLE) / 100)) / n)"
    " / (n - 1)"
)


@query(
    "ts_seasonal_profile",
    oracle=f"""
WITH b AS (
  SELECT event_type, CAST(hour(ts) AS INTEGER) AS hod,
         CAST(ROUND((value) * 100) AS BIGINT) AS c
  FROM events
), g AS (
  SELECT event_type, hod, COUNT(*) AS n,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM b GROUP BY event_type, hod
)
SELECT event_type, hod, n,
       {_SEAS_MEAN} AS seasonal_mean,
       {_SEAS_VAR} AS var_within
FROM g
""",
)
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per series — the decomposition
    table a seasonal-adjustment or anomaly pipeline subtracts before
    thresholding residuals: per (event_type, hour-of-day) the count,
    seasonal mean, and within-hour sample variance, all closed-form
    doubles from exact integer moment triples (bit-exact per row;
    any cross-hour statistic is left to the consumer so no
    order-dependent float summation exists anywhere — the
    agg_chi2_cells discipline). ONE partial+final aggregate over the
    scan; 24 x |series| output rows regardless of data size."""
    ev = load(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.hour("ts").cast("int").alias("hod"),
        F.expr("CAST(ROUND((value) * 100) AS BIGINT)").alias("c"),
    )
    g = b.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    )
    return g.select(
        "event_type",
        "hod",
        "n",
        F.expr(_SEAS_MEAN).alias("seasonal_mean"),
        F.expr(_SEAS_VAR).alias("var_within"),
    )

@query(
    "ts_stl_decompose",
    bounded_cross="1-row broadcast scalar onto the O(days) rollup",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
), trended AS (
  SELECT day, cents,
         CAST(SUM(cents) OVER w AS DOUBLE)
           / COUNT(*) OVER w AS trend,
         dayofweek(day) AS dow
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), det AS (
  SELECT day, cents, trend, dow, cents - trend AS detrended
  FROM trended
), seas AS (
  SELECT dow,
         list_reduce(list(detrended ORDER BY day),
                     (a, x) -> a + x) / COUNT(*) AS seasonal
  FROM det GROUP BY dow
)
SELECT d.day, CAST(d.cents AS DOUBLE) / 100 AS revenue, d.trend,
       s.seasonal, d.detrended - s.seasonal AS residual
FROM det d JOIN seas s ON d.dow = s.dow
""",
)
def ts_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal-trend decomposition of daily revenue (the
    STL shape, moving-average flavor): trend = centered 7-day moving
    average (exact integer window sums / counts), seasonal =
    day-of-week mean of the detrended series, residual = the rest.
    The one float-order hazard — summing detrended DOUBLES per
    weekday — is pinned by folding each weekday's values in DAY
    ORDER on both engines (sorted-list left fold, the survival_km
    discipline), so the decomposition hashes bit-identically. Runs
    on the O(days) rollup; every window/group is domain-bounded."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr(cents("value"))).alias("cents")
    )
    # bounded: O(days) daily rollup, <= study-window rows
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.select(
        "day",
        "cents",
        (
            F.sum("cents").over(w7).cast("double")
            / F.count(F.lit(1)).over(w7)
        ).alias("trend"),
        F.dayofweek("day").alias("dow"),
    )
    det = trended.withColumn(
        "detrended", F.col("cents") - F.col("trend")
    )
    seas = (
        det.groupBy("dow")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("day", "detrended"))
            ).alias("arr"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "dow",
            (
                F.expr(
                    "aggregate(arr, CAST(0.0 AS DOUBLE),"
                    " (a, s) -> a + s.detrended)"
                )
                / F.col("n")
            ).alias("seasonal"),
        )
    )
    return det.join(F.broadcast(seas), "dow").select(
        "day",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        "trend",
        "seasonal",
        (F.col("detrended") - F.col("seasonal")).alias("residual"),
    )

@query(
    "ts_acf",
    bounded_cross="tiny cross: 7-row lag grid + 1-row moment scalar",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
), lagged AS (
  SELECT a.c AS x, b.c AS y, l.lag
  FROM daily a
  JOIN (SELECT unnest(generate_series(1, 7)) AS lag) l ON TRUE
  JOIN daily b ON b.day = a.day + l.lag * INTERVAL 1 DAY
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(c) AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(c AS HUGEINT) * c) AS VARCHAR) AS DOUBLE) AS ss
  FROM daily
)
SELECT lag,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       (CAST(CAST(SUM(CAST(x AS HUGEINT) * y) AS VARCHAR) AS DOUBLE)
          - COUNT(*) * (s / n) * (s / n))
         / (ss - n * (s / n) * (s / n)) AS acf
FROM lagged, stats
GROUP BY lag, n, s, ss
""",
)
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily revenue at lags 1..7 — the
    seasonality detector run before choosing window widths: ACF(k) =
    (sum(x_t * x_{t+k}) - m * mean^2) / (ss - n * mean^2) with every
    sum an EXACT integer (HUGEINT / DECIMAL(38) for the cross
    products) and one double expression at the end, identical text
    both engines. Lag pairs come from a calendar-shifted equi-join
    on the O(days) rollup (LAG would mis-pair across gaps); the
    global moments are a broadcast scalar."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr(cents("value"))).alias("c")
    )
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    shifted = daily.crossJoin(F.broadcast(lags)).select(
        (
            F.col("day")
            + F.expr("make_interval(0, 0, 0, lag, 0, 0, 0)")
        ).alias("day"),
        F.col("c").alias("x"),
        "lag",
    )
    pairs = shifted.join(
        daily.select("day", F.col("c").alias("y")), "day"
    )
    stats = daily.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("c").cast("double").alias("s"),
        # c*c on bigint can silently wrap with ANSI off while DuckDB
        # errors — same overflow class as the HUGEINT discipline, so
        # the product goes through decimal(38,0) (and HUGEINT-via-
        # VARCHAR in the oracle) exactly like sxy below.
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("double")
        .alias("ss"),
    )
    return (
        pairs.crossJoin(F.broadcast(stats))
        .groupBy("lag", "n", "s", "ss")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.col("x").cast("decimal(38,0)") * F.col("y")
            ).cast("double").alias("sxy"),
        )
        .select(
            "lag",
            "n_pairs",
            (
                (
                    F.col("sxy")
                    - F.col("n_pairs")
                    * (F.col("s") / F.col("n"))
                    * (F.col("s") / F.col("n"))
                )
                / (
                    F.col("ss")
                    - F.col("n")
                    * (F.col("s") / F.col("n"))
                    * (F.col("s") / F.col("n"))
                )
            ).alias("acf"),
        )
    )

LTTB_BUCKETS = 50


def lttb_indices(x, y, n_out: int):
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson '13):
    keep endpoints; for each interior bucket keep the point forming
    the largest triangle with the PREVIOUSLY kept point and the NEXT
    bucket's centroid. Pure numpy, deterministic (ties -> first
    argmax). Returns ascending indices into x/y."""
    import numpy as np

    n = len(x)
    if n_out >= n or n_out < 3:
        return list(range(n))
    kept = [0]
    bounds = [
        1 + int(round(i * (n - 2) / (n_out - 2)))
        for i in range(n_out - 1)
    ]
    bounds[-1] = n - 1
    for b in range(n_out - 2):
        lo, hi = bounds[b], bounds[b + 1]
        nlo, nhi = bounds[b + 1], (
            n if b + 2 >= n_out - 1 else bounds[b + 2]
        )
        cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
        ax, ay = x[kept[-1]], y[kept[-1]]
        seg_x, seg_y = x[lo:hi], y[lo:hi]
        area = np.abs(
            (ax - cx) * (seg_y - ay) - (ax - seg_x) * (ay - cy)
        )
        kept.append(lo + int(area.argmax()))
    kept.append(n - 1)
    return kept


def _lttb_oracle(n_out: int = LTTB_BUCKETS) -> str:
    """Unrolled LTTB in DuckDB, exact: x is series-relative
    microseconds and y integer cents, so every centroid mean
    (CAST(SUM) AS DOUBLE / COUNT — sums < 2^53 are exact under any
    order, matching numpy's mean on the same ints) and every triangle
    area operand is an exactly-representable double; the per-bucket
    argmax (area DESC, i ASC — numpy argmax's first-max rule) then
    replays the kernel bit-for-bit. Bucket bounds mirror
    ``lttb_indices``: 1 + round_half_even(b*(n-2)/(n_out-2)), last
    bound pinned to n-1; the next-bucket window for the final
    interior bucket extends to n. Assumes n > n_out for every series
    (true at sf0.001+: >=166 hourly points); the engine's
    all-points fallback for shorter series is not mirrored."""
    last_b = n_out - 3  # interior buckets 0..last_b (n_out-2 of them)
    nb = n_out - 2
    head = f"""
WITH hourly AS MATERIALIZED (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS c
  FROM events GROUP BY 1, 2),
ser AS MATERIALIZED (
  SELECT event_type, h, c,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) - 1 AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         epoch_us(h) - MIN(epoch_us(h)) OVER (PARTITION BY event_type) AS x
  FROM hourly),
sn AS (SELECT DISTINCT event_type, n FROM ser),
bounds AS MATERIALIZED (
  SELECT sn.event_type, b.b,
         CASE WHEN b.b = {n_out - 2} THEN sn.n - 1
              ELSE 1 + CAST(round_even(b.b * (sn.n - 2) / {nb}.0, 0) AS BIGINT)
         END AS bound
  FROM sn CROSS JOIN (SELECT unnest(generate_series(0, {n_out - 2})) AS b) b),
bw AS MATERIALIZED (
  SELECT lo.event_type, lo.b, lo.bound AS lo, hi.bound AS hi,
         hi.bound AS nlo,
         CASE WHEN lo.b = {last_b} THEN sn.n ELSE n2.bound END AS nhi
  FROM bounds lo
  JOIN bounds hi ON hi.event_type = lo.event_type AND hi.b = lo.b + 1
  LEFT JOIN bounds n2 ON n2.event_type = lo.event_type AND n2.b = lo.b + 2
  JOIN sn ON sn.event_type = lo.event_type
  WHERE lo.b <= {last_b}),
cent AS MATERIALIZED (
  SELECT bw.event_type, bw.b,
         CAST(SUM(s.x) AS DOUBLE) / COUNT(*) AS cx,
         CAST(SUM(s.c) AS DOUBLE) / COUNT(*) AS cy
  FROM bw JOIN ser s ON s.event_type = bw.event_type
                    AND s.i >= bw.nlo AND s.i < bw.nhi
  GROUP BY 1, 2),
pprev AS (SELECT event_type, x AS ax, c AS ay FROM ser WHERE i = 0)"""
    rounds = []
    for b in range(n_out - 2):
        prev = "pprev" if b == 0 else f"pick{b - 1}"
        rounds.append(f"""
, pick{b} AS MATERIALIZED (
  SELECT event_type, i, h, c, x, x AS ax, c AS ay FROM (
    SELECT s.event_type, s.i, s.h, s.c, s.x,
           ROW_NUMBER() OVER (PARTITION BY s.event_type ORDER BY
             abs((CAST(p.ax AS DOUBLE) - ct.cx) * CAST(s.c - p.ay AS DOUBLE)
               - CAST(p.ax - s.x AS DOUBLE) * (CAST(p.ay AS DOUBLE) - ct.cy))
             DESC, s.i ASC) AS rn
    FROM ser s
    JOIN bw ON bw.event_type = s.event_type AND bw.b = {b}
           AND s.i >= bw.lo AND s.i < bw.hi
    JOIN cent ct ON ct.event_type = s.event_type AND ct.b = {b}
    JOIN {prev} p ON p.event_type = s.event_type)
  WHERE rn = 1)""")
    picks = " UNION ALL ".join(
        f"SELECT event_type, h, c, CAST({b + 1} AS INTEGER) AS pos FROM pick{b}"
        for b in range(n_out - 2)
    )
    tail = f"""
SELECT event_type, h AS hour, CAST(c AS DOUBLE) / 100 AS revenue, pos
FROM (
  SELECT event_type, h, c, CAST(0 AS INTEGER) AS pos FROM ser WHERE i = 0
  UNION ALL {picks}
  UNION ALL
  SELECT event_type, h, c, CAST({n_out - 1} AS INTEGER) AS pos
  FROM ser WHERE i = n - 1
)"""
    return head + "".join(rounds) + tail


@query("ts_downsample_lttb", oracle=_lttb_oracle())
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB chart downsampling per event-type series: each hourly
    revenue series (~720 points) reduces to LTTB_BUCKETS visually
    faithful points — the standard dashboard decimation that
    preserves spikes a stride sample would miss. One shuffle by
    series key, then an Arrow-batched per-series numpy kernel
    (sequential by construction — LTTB chains off the previously
    kept point); endpoints always survive. Pinned against a direct
    numpy replay in tests AND hash-checked against an unrolled
    DuckDB replay of the greedy walk (see _lttb_oracle — exact
    because all operands are sub-2^53 integers in float64)."""
    import pandas as pd

    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.expr(cents("value"))).alias("c"))

    def ds(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("h").reset_index(drop=True)
        # Series-relative MICROSECONDS, not absolute nanos: every x,
        # every bucket centroid sum, and every triangle-area operand
        # then stays exactly representable in float64 (< 2^53), so
        # the selection is bit-deterministic under ANY summation
        # order — which is what lets the DuckDB oracle replay the
        # greedy walk exactly (absolute nanos are ~1.7e18 and round).
        xi = pdf["h"].astype("int64") // 1000
        x = (xi - xi.iloc[0]).to_numpy().astype(np.float64)
        y = pdf["c"].to_numpy().astype(np.float64)
        idx = lttb_indices(x, y, LTTB_BUCKETS)
        out = pdf.iloc[idx][["event_type", "h", "c"]].copy()
        out["pos"] = range(len(idx))
        return out

    return (
        hourly.groupBy("event_type")
        .applyInPandas(
            ds, "event_type string, h timestamp_ntz, c bigint, pos int"
        )
        .select(
            "event_type",
            F.col("h").alias("hour"),
            (F.col("c").cast("double") / 100).alias("revenue"),
            "pos",
        )
    )

@query(
    "ts_mann_kendall",
    bounded_cross="bounded O(days^2) pair join + 1-row scalar totals",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
), pairs AS (
  SELECT CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1
              ELSE 0 END AS sgn
  FROM daily a JOIN daily b ON a.day < b.day
), ties AS (
  SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT COUNT(*) AS t FROM daily GROUP BY c)
), agg AS (
  SELECT CAST(SUM(sgn) AS BIGINT) AS s,
         CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n,
         (SELECT tie_term FROM ties) AS tie_term
  FROM pairs
)
SELECT s, n,
       (CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) - tie_term) / 18
         AS var_s,
       CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1)
                 / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                         - tie_term) / 18)
            WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1)
                 / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                         - tie_term) / 18)
            ELSE CAST(0 AS DOUBLE) END AS z
FROM agg
""",
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test on daily revenue — the nonparametric
    monotone-trend detector (no linearity or normality assumption)
    that pairs with agg_runs_test's randomness check: S sums the
    signs of all O(days^2) ordered pairs of the TINY daily rollup
    (the fact stream never self-joins), the variance carries the
    exact tie correction, and the continuity-corrected z is one
    shared closed form over exact integers. All constants typed
    explicitly to double (the decimal-literal lesson)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr(cents("value"))).alias("c")
    )
    a = daily.select(F.col("day").alias("da"), F.col("c").alias("ca"))
    b = daily.select(F.col("day").alias("db"), F.col("c").alias("cb"))
    pairs = a.join(b, F.col("da") < F.col("db")).select(
        F.when(F.col("cb") > F.col("ca"), 1)
        .when(F.col("cb") < F.col("ca"), -1)
        .otherwise(0)
        .alias("sgn")
    )
    ties = (
        daily.groupBy("c")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    n_tbl = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    agg = (
        pairs.agg(F.sum("sgn").cast("bigint").alias("s"))
        .crossJoin(F.broadcast(n_tbl))
        .crossJoin(F.broadcast(ties))
    )
    agg.createOrReplaceTempView("mk_agg")
    return spark.sql(
        """
SELECT s, n,
       (CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) - tie_term) / 18
         AS var_s,
       CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1)
                 / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                         - tie_term) / 18)
            WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1)
                 / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                         - tie_term) / 18)
            ELSE CAST(0 AS DOUBLE) END AS z
FROM mk_agg
"""
    )


@query(
    "ts_theilsen_trend",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS c
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type,
         CAST(b.c - a.c AS DOUBLE) / date_diff('day', a.day, b.day) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
), ranked AS (
  SELECT event_type, slope,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope) AS r,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM pairs
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_pairs,
       (SUM(CASE WHEN r = (n + 1) // 2 THEN slope END)
        + SUM(CASE WHEN r = n // 2 + 1 THEN slope END)) / 2
         AS theilsen_slope
FROM ranked GROUP BY event_type
""",
)
def ts_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per daily revenue series: the MEDIAN of
    all pairwise slopes — the estimator that shrugs off the outlier
    days that wreck an OLS slope (up to ~29% contamination). Every
    slope is one IEEE division of exact integers (cent delta / day
    delta), identical in both engines, and the median is selected by
    shared rank arithmetic — (slope@((n+1) div 2) + slope@(n div 2
    + 1)) / 2 picks the same row twice when n is odd, so one formula
    covers both parities with zero float tolerance. Scale shape: the
    pair join is per-series over the DAILY aggregate (bounded-domain
    rows, ~90 per series), never the raw events; the heavy table
    collapses in the first groupBy."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(F.expr(cents("value"))).alias("c"))
    a = daily.select("event_type", F.col("day").alias("da"), F.col("c").alias("ca"))
    b = daily.select("event_type", F.col("day").alias("db"), F.col("c").alias("cb"))
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("da") < F.col("db"))
        .select(
            "event_type",
            (
                (F.col("cb") - F.col("ca")).cast("double")
                / F.datediff("db", "da")
            ).alias("slope"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    lo = F.sum(F.when(F.col("r") == F.expr("(n + 1) div 2"), F.col("slope")))
    hi = F.sum(F.when(F.col("r") == F.expr("n div 2 + 1"), F.col("slope")))
    return ranked.groupBy("event_type").agg(
        F.max("n").alias("n_pairs"),
        ((lo + hi) / 2).alias("theilsen_slope"),
    )


_EMA_TAU_US = 3_600_000_000  # 1 h half-life-ish decay constant, micros


@query(
    "ts_ema_irregular",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_id, ts, value,
         date_diff('microsecond',
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS dt
  FROM events
), al AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN dt IS NULL THEN 1.0
              ELSE CAST(dt AS DOUBLE) / CAST(dt + {_EMA_TAU_US} AS DOUBLE)
         END AS alpha
  FROM seq
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       list_reduce(
         list_prepend({{'alpha': 1.0, 'v': 0.0}},
                      list({{'alpha': alpha, 'v': value}}
                           ORDER BY ts, event_id)),
         (a, b) -> {{'alpha': 1.0, 'v': a.v + b.alpha * (b.v - a.v)}}
       ).v AS ema_value
FROM al GROUP BY user_id
""",
)
def ts_ema_irregular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irregular-interval EMA — exponential smoothing whose decay
    follows the actual gap between events instead of assuming a
    regular grid: alpha_t = dt / (dt + tau). The RATIONAL decay (one
    integer-ratio division, not exp(-dt/tau)) is deliberate: both
    engines produce the identical double, so the sequential fold
    ema += alpha * (v - ema) is bit-exact cross-engine with NO
    rounding (Spark aggregate() and DuckDB list_reduce are both
    strict left folds; the seed {{1.0, 0.0}} plus a first-row
    alpha of 1.0 makes the first state exactly v_1). Scale shape:
    one user-partitioned window for the gaps, one groupBy carrying
    per-user (alpha, v) structs — state bounded by per-user
    activity, the same contract as the session/survival folds."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    al = (
        ev.select("user_id", "event_id", "ts", "value")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "dt", F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
        )
        .withColumn(
            "alpha",
            F.when(F.col("dt").isNull(), F.lit(1.0)).otherwise(
                F.col("dt").cast("double")
                / (F.col("dt") + F.lit(_EMA_TAU_US)).cast("double")
            ),
        )
        .withColumn(
            "t_us",
            F.expr(
                "timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ'2000-01-01 00:00:00', ts)"
            ),
        )
    )
    arr = F.array_sort(
        F.collect_list(F.struct("t_us", "event_id", "alpha", "value"))
    )
    fold = F.aggregate(
        arr,
        F.struct(F.lit(1.0).alias("alpha"), F.lit(0.0).alias("v")),
        lambda acc, x: F.struct(
            F.lit(1.0).alias("alpha"),
            (acc["v"] + x["alpha"] * (x["value"] - acc["v"])).alias("v"),
        ),
    )["v"]
    return al.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        fold.alias("ema_value"),
    )


@query(
    "ts_peak_detection",
    oracle="""
WITH d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), l AS (
  SELECT event_type, day, c,
         LAG(c) OVER (PARTITION BY event_type ORDER BY day) AS prev_c,
         LEAD(c) OVER (PARTITION BY event_type ORDER BY day) AS next_c
  FROM d
)
SELECT event_type, day, CAST(c AS DOUBLE) / 100 AS revenue
FROM l
WHERE prev_c IS NOT NULL AND next_c IS NOT NULL
  AND c > prev_c AND c > next_c
""",
)
def ts_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum detection on the daily revenue series per event
    type: a day is a peak iff its exact integer-cents total strictly
    exceeds BOTH neighbors (series endpoints excluded — no neighbor,
    no verdict). The classic lag/lead formulation; comparisons are
    on exact bigint cents so there is no float tie ambiguity, and
    the window partitions by series. Day stays TIMESTAMP in both
    engines (the DATE-vs-datetime64 fetchdf coercion trap)."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    l = d.select(
        "event_type",
        "day",
        "c",
        F.lag("c").over(w).alias("prev_c"),
        F.lead("c").over(w).alias("next_c"),
    )
    return l.where(
        F.col("prev_c").isNotNull()
        & F.col("next_c").isNotNull()
        & (F.col("c") > F.col("prev_c"))
        & (F.col("c") > F.col("next_c"))
    ).select(
        "event_type", "day", (F.col("c").cast("double") / 100).alias("revenue")
    )


@query(
    "ts_pre_post_impact",
    bounded_cross="1-row broadcast scalar (pre-period sums pivot)",
    oracle="""
WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'click'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY 1
), t AS (
  SELECT MIN(day) + INTERVAL 14 DAY AS pivot FROM d
), pre AS (
  SELECT CAST(SUM(x) AS BIGINT) AS px, CAST(SUM(y) AS BIGINT) AS py
  FROM d, t WHERE d.day < t.pivot
), post AS (
  SELECT day, x, y,
         CAST(SUM(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_x,
         CAST(SUM(y) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_y
  FROM d, t WHERE d.day >= t.pivot
)
SELECT day,
       CAST(x AS DOUBLE) / 100 AS actual,
       (CAST(px AS DOUBLE) / CAST(py AS DOUBLE)) * CAST(y AS DOUBLE) / 100
         AS counterfactual,
       (CAST(cum_x AS DOUBLE)
          - (CAST(px AS DOUBLE) / CAST(py AS DOUBLE)) * CAST(cum_y AS DOUBLE))
         / 100 AS cumulative_effect
FROM post, pre
""",
)
def ts_pre_post_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre/post intervention impact with a ratio counterfactual: the
    purchase series after day 14 is compared against (pre-period
    purchase/click ratio) x the click control series — the
    lightweight causal-impact readout (a synthetic control with one
    covariate). The pre-period ratio is ONE division of exact
    bigint sums; the cumulative effect avoids float accumulation
    entirely by the identity cum_effect = cum_x - ratio * cum_y over
    exact INTEGER running sums (float windowed sums would be
    summation-order hazardous across engines — integers are not).
    The post-period prefix window runs over the bounded daily
    rollup."""
    ev = load(spark, sf_dir, "events")
    c = F.expr("CAST(ROUND(value * 100) AS BIGINT)")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", c).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "click", c).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    pivot = d.agg(
        F.expr("MIN(day) + INTERVAL 14 DAY").alias("pivot")
    )
    dp = d.crossJoin(F.broadcast(pivot))
    pre = dp.where(F.col("day") < F.col("pivot")).agg(
        F.sum("x").cast("bigint").alias("px"),
        F.sum("y").cast("bigint").alias("py"),
    )
    # bounded: one row per post-period calendar day
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    post = dp.where(F.col("day") >= F.col("pivot")).select(
        "day",
        "x",
        "y",
        F.sum("x").over(w).cast("bigint").alias("cum_x"),
        F.sum("y").over(w).cast("bigint").alias("cum_y"),
    )
    ratio = F.col("px").cast("double") / F.col("py").cast("double")
    return post.crossJoin(F.broadcast(pre)).select(
        "day",
        (F.col("x").cast("double") / 100).alias("actual"),
        (ratio * F.col("y").cast("double") / 100).alias("counterfactual"),
        (
            (F.col("cum_x").cast("double") - ratio * F.col("cum_y").cast("double"))
            / 100
        ).alias("cumulative_effect"),
    )


@query(
    "ts_bollinger_bands",
    oracle="""
WITH d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), f AS (
  SELECT event_type, day, c,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(c) OVER w AS BIGINT) AS s,
         CAST(SUM(c * c) OVER w AS BIGINT) AS ss
  FROM d
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day,
       CAST(c AS DOUBLE) / 100 AS revenue,
       CAST(s AS DOUBLE) / n / 100 AS ma7,
       sqrt((CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
            / (CAST(n AS DOUBLE) * (n - 1))) / 100 AS sd7,
       (CAST(s AS DOUBLE) / n
          + 2 * sqrt((CAST(n AS DOUBLE) * ss
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                     / (CAST(n AS DOUBLE) * (n - 1)))) / 100 AS upper_band,
       (CAST(s AS DOUBLE) / n
          - 2 * sqrt((CAST(n AS DOUBLE) * ss
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                     / (CAST(n AS DOUBLE) * (n - 1)))) / 100 AS lower_band
FROM f WHERE n >= 2
""",
)
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (trailing-7 mean +/- 2 sample standard
    deviations) on the daily revenue series per event type. The
    frame moments (n, sum, sum of squares) are EXACT integer window
    aggregates; mean, sd, and both bands are closed-form float
    expressions evaluated in identical order on both engines (sqrt
    correctly rounded) — bit-exact, no rounding. Frames shorter than
    2 rows (undefined sample sd) are filtered by an exact integer
    predicate. One partitioned window serves all three moments."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("c")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    f = d.select(
        "event_type",
        "day",
        "c",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("c").over(w).cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).over(w).cast("bigint").alias("ss"),
    )
    nd = F.col("n").cast("double")
    sd = F.sqrt(
        (nd * F.col("ss") - F.col("s").cast("double") * F.col("s").cast("double"))
        / (nd * (F.col("n") - 1))
    )
    ma = F.col("s").cast("double") / F.col("n")
    return f.where(F.col("n") >= 2).select(
        "event_type",
        "day",
        (F.col("c").cast("double") / 100).alias("revenue"),
        (ma / 100).alias("ma7"),
        (sd / 100).alias("sd7"),
        ((ma + 2 * sd) / 100).alias("upper_band"),
        ((ma - 2 * sd) / 100).alias("lower_band"),
    )


@query(
    "ts_ohlc",
    oracle=f"""
WITH px AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         {cents('value')} AS c,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, day,
       CAST(MAX(CASE WHEN rn_a = 1 THEN c END) AS DOUBLE) / 100 AS open,
       CAST(MAX(c) AS DOUBLE) / 100 AS high,
       CAST(MIN(c) AS DOUBLE) / 100 AS low,
       CAST(MAX(CASE WHEN rn_d = 1 THEN c END) AS DOUBLE) / 100 AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) / 100 AS total
FROM px GROUP BY event_type, day
""",
)
def ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick rollup — the canonical market-data/metrics
    downsample: per (series, day) bucket, the OPEN (first value by
    (ts, event_id)), HIGH, LOW, CLOSE (last value) plus tick count
    and exact total. First/last are expressed as two ROW_NUMBER
    windows over the SAME partition keys the final groupBy uses, so
    the whole operator costs ONE exchange: windows and aggregate all
    run on the (event_type, day)-hashed partitioning, and AQE
    reuses it (the groupBy adds no second shuffle). All extrema and
    sums are exact integer cents; the only floats are the final
    /100 presentations. At 100 TB the bucket count is
    series x days — the rollup output is tiny relative to input,
    and per-bucket state is O(1), the same contract as
    ts_rollup_daily."""
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    w_a = Window.partitionBy("event_type", day).orderBy("ts", "event_id")
    w_d = Window.partitionBy("event_type", day).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    px = ev.select(
        "event_type",
        day.alias("day"),
        F.expr(cents("value")).alias("c"),
        F.row_number().over(w_a).alias("rn_a"),
        F.row_number().over(w_d).alias("rn_d"),
    )
    return px.groupBy("event_type", "day").agg(
        (
            F.max(F.when(F.col("rn_a") == 1, F.col("c"))).cast("double") / 100
        ).alias("open"),
        (F.max("c").cast("double") / 100).alias("high"),
        (F.min("c").cast("double") / 100).alias("low"),
        (
            F.max(F.when(F.col("rn_d") == 1, F.col("c"))).cast("double") / 100
        ).alias("close"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.sum("c").cast("double") / 100).alias("total"),
    )


@query(
    "ts_rsi",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM({cents('value')}) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), diffs AS (
  SELECT event_type, day,
         c - LAG(c) OVER (PARTITION BY event_type ORDER BY day) AS d,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM daily
), gl AS (
  SELECT event_type, day, rn,
         CAST(SUM(CASE WHEN d > 0 THEN d ELSE 0 END) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS sg,
         CAST(SUM(CASE WHEN d < 0 THEN -d ELSE 0 END) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS sl
  FROM diffs
)
SELECT event_type, day,
       CAST(100 AS DOUBLE) * sg / (sg + sl) AS rsi_14
FROM gl WHERE rn >= 15 AND sg + sl > 0
""",
)
def ts_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-period Relative Strength Index (Cutler's simple-average
    variant) over the per-type daily revenue series — the
    overbought/oversold momentum oscillator, windowed rather than
    Wilder's recursive smoothing precisely so it stays a pure
    window expression: RSI = 100 * sum(gains) / (sum(gains) +
    sum(losses)) over the trailing 14 diffs (the equal window
    lengths cancel, leaving ONE division of exact bigint cents).
    Rows need a full 14-diff history (rn >= 15) and a nonzero
    denominator. One exchange on the series key serves the daily
    rollup, the lag, and both rolling sums; per-series work is
    linear. At 100 TB the daily rollup collapses the input before
    any window sees it — the windows run on series x days rows."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.expr(cents("value"))).cast("bigint").alias("c"))
    w = Window.partitionBy("event_type").orderBy("day")
    diffs = daily.select(
        "event_type",
        "day",
        (F.col("c") - F.lag("c").over(w)).alias("d"),
        F.row_number().over(w).alias("rn"),
    )
    w14 = w.rowsBetween(-13, Window.currentRow)
    gl = diffs.select(
        "event_type",
        "day",
        "rn",
        F.sum(F.when(F.col("d") > 0, F.col("d")).otherwise(0))
        .over(w14)
        .cast("bigint")
        .alias("sg"),
        F.sum(F.when(F.col("d") < 0, -F.col("d")).otherwise(0))
        .over(w14)
        .cast("bigint")
        .alias("sl"),
    )
    return gl.where((F.col("rn") >= 15) & (F.col("sg") + F.col("sl") > 0)).select(
        "event_type",
        "day",
        (
            F.lit(100).cast("double") * F.col("sg")
            / (F.col("sg") + F.col("sl"))
        ).alias("rsi_14"),
    )


@query(
    "ts_sma_crossover",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM({cents('value')}) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), sums AS (
  SELECT event_type, day,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn,
         CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS s5,
         CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS BIGINT) AS s20
  FROM daily
), flags AS (
  SELECT event_type, day, rn, s5, s20,
         CASE WHEN 4 * s5 > s20 THEN 1 ELSE 0 END AS fast_above,
         LAG(CASE WHEN 4 * s5 > s20 THEN 1 ELSE 0 END)
           OVER (PARTITION BY event_type ORDER BY day) AS prev_above
  FROM sums
)
SELECT event_type, day,
       CASE WHEN fast_above = 1 THEN 'golden' ELSE 'death' END AS signal,
       CAST(s5 AS DOUBLE) / 500 AS sma5,
       CAST(s20 AS DOUBLE) / 2000 AS sma20
FROM flags
WHERE rn >= 21 AND fast_above <> prev_above
""",
)
def ts_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average crossover detection (the golden/death-cross
    trading signal, equally the canonical trend-shift alert for any
    KPI series): days where the 5-day SMA crosses the 20-day SMA.
    The comparison never divides — sma5 > sma20 iff 4*s5 > s20 on
    exact bigint window sums, so crossover flags are
    integer-exact; /500 and /2000 appear only in the presentation
    columns. rn >= 21 requires both windows full AND a valid
    previous flag. One exchange on the series key serves the daily
    rollup, both rolling sums, and the lag."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.expr(cents("value"))).cast("bigint").alias("c"))
    w = Window.partitionBy("event_type").orderBy("day")
    sums = daily.select(
        "event_type",
        "day",
        F.row_number().over(w).alias("rn"),
        F.sum("c").over(w.rowsBetween(-4, 0)).cast("bigint").alias("s5"),
        F.sum("c").over(w.rowsBetween(-19, 0)).cast("bigint").alias("s20"),
    )
    fast_above = F.when(4 * F.col("s5") > F.col("s20"), 1).otherwise(0)
    flags = sums.select(
        "event_type",
        "day",
        "rn",
        "s5",
        "s20",
        fast_above.alias("fast_above"),
        F.lag(fast_above).over(w).alias("prev_above"),
    )
    return flags.where(
        (F.col("rn") >= 21) & (F.col("fast_above") != F.col("prev_above"))
    ).select(
        "event_type",
        "day",
        F.when(F.col("fast_above") == 1, "golden")
        .otherwise("death")
        .alias("signal"),
        (F.col("s5").cast("double") / 500).alias("sma5"),
        (F.col("s20").cast("double") / 2000).alias("sma20"),
    )


def _ljungbox_oracle() -> str:
    """Ljung-Box replay: the ts_acf moment CTEs, each lag's r_k
    pivoted into a named column, then ONE fixed-order arithmetic
    expression — identical text in both engines, so the 7-term float
    sum evaluates in the same IEEE order by construction."""
    acf_expr = (
        "(CAST(CAST(SUM(CAST(x AS HUGEINT) * y) AS VARCHAR) AS DOUBLE)"
        " - COUNT(*) * (s / n) * (s / n))"
        " / (ss - n * (s / n) * (s / n))"
    )
    piv = ", ".join(
        f"MAX(CASE WHEN lag = {k} THEN acf END) AS r{k}"
        for k in range(1, 8)
    )
    terms = " + ".join(
        f"(r{k} * r{k}) / (n - {k}.0)" for k in range(1, 8)
    )
    return f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
), lagged AS (
  SELECT a.c AS x, b.c AS y, l.lag
  FROM daily a
  JOIN (SELECT unnest(generate_series(1, 7)) AS lag) l ON TRUE
  JOIN daily b ON b.day = a.day + l.lag * INTERVAL 1 DAY
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(c) AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(c AS HUGEINT) * c) AS VARCHAR) AS DOUBLE) AS ss
  FROM daily
), acfs AS (
  SELECT lag, {acf_expr} AS acf
  FROM lagged, stats GROUP BY lag, n, s, ss
), piv AS (
  SELECT (SELECT n FROM stats) AS n, {piv} FROM acfs
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(7 AS INT) AS df,
       n * (n + 2.0) * ({terms}) AS q_stat,
       n * (n + 2.0) * ({terms}) > 14.067140 AS reject_white_noise
FROM piv
"""


@query("ts_ljungbox", bounded_cross="1-row broadcast scalar (moment row) x bounded lag grid", oracle=_ljungbox_oracle())
def ts_ljungbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on daily revenue: Q = n(n+2) *
    sum_{k=1..7} r_k^2/(n-k) against the chi-square(7) 0.05 critical
    value 14.067 — the is-this-series-white-noise gate run before
    fitting any ARIMA-class model, and the natural consumer of
    ts_acf's r_k values. All moments are exact integers (the ts_acf
    HUGEINT/decimal(38) discipline); the 7 r_k floats then combine
    in ONE fixed-order expression written out term by term with
    identical text in both engines, so the float reduction order is
    pinned by construction (no data-dependent fold). Shape: the
    O(days) rollup + a 7-way calendar-shift join + a 7-row pivot —
    nothing scales past the day count."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr(cents("value"))).alias("c")
    )
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    shifted = daily.crossJoin(F.broadcast(lags)).select(
        (
            F.col("day")
            + F.expr("make_interval(0, 0, 0, lag, 0, 0, 0)")
        ).alias("day"),
        F.col("c").alias("x"),
        "lag",
    )
    pairs = shifted.join(daily.select("day", F.col("c").alias("y")), "day")
    stats = daily.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("c").cast("double").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("double")
        .alias("ss"),
    )
    acfs = (
        pairs.crossJoin(F.broadcast(stats))
        .groupBy("lag", "n", "s", "ss")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("y"))
            .cast("double")
            .alias("sxy"),
        )
        .select(
            "lag",
            "n",
            (
                (
                    F.col("sxy")
                    - F.col("n_pairs")
                    * (F.col("s") / F.col("n"))
                    * (F.col("s") / F.col("n"))
                )
                / (
                    F.col("ss")
                    - F.col("n") * (F.col("s") / F.col("n"))
                    * (F.col("s") / F.col("n"))
                )
            ).alias("acf"),
        )
    )
    piv_cols = [
        F.max(F.when(F.col("lag") == k, F.col("acf"))).alias(f"r{k}")
        for k in range(1, 8)
    ]
    piv = acfs.groupBy("n").agg(*piv_cols)
    terms = " + ".join(
        f"(r{k} * r{k}) / (n - {k}.0)" for k in range(1, 8)
    )
    return piv.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.lit(7).cast("int").alias("df"),
        F.expr(f"n * (n + 2.0) * ({terms})").alias("q_stat"),
        F.expr(
            f"n * (n + 2.0) * ({terms}) > 14.067140"
        ).alias("reject_white_noise"),
    )


@query(
    "ts_ulcer_index",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
), dd AS (
  SELECT day, c,
         CAST(MAX(c) OVER (ORDER BY day) - c AS BIGINT) AS drawdown_cents
  FROM daily
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(MAX(drawdown_cents) AS BIGINT) AS max_drawdown_cents,
       sqrt((CAST(SUM(drawdown_cents * drawdown_cents) AS DOUBLE)
             / COUNT(*))) / 100 AS ulcer_index
FROM dd
""",
)
def ts_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ulcer index of the daily revenue series — the drawdown-DEPTH
    risk metric (Peter Martin's root-mean-square drawdown), the
    quadratic companion to win_max_drawdown's worst-case point
    estimate: long shallow slumps and short crashes separate here
    where max-drawdown conflates them. Drawdowns are exact integer
    cents below the running peak (the running max rides the O(days)
    daily rollup — bounded domain), the squared sum stays bigint
    (drawdown <= ~1e9 cents -> square <= 1e18 at fixture scale), and
    the ONLY floats are the final mean, sqrt, and cents->dollars
    rescale in one fixed expression."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr(cents("value"))).alias("c")
    )
    # bounded: O(distinct days) rows — the daily rollup, not events
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dd = daily.select(
        "day",
        (F.max("c").over(w) - F.col("c"))
        .cast("bigint")
        .alias("drawdown_cents"),
    )
    return dd.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.max("drawdown_cents").cast("bigint").alias("max_drawdown_cents"),
        (
            F.sqrt(
                F.sum(
                    F.col("drawdown_cents") * F.col("drawdown_cents")
                ).cast("double")
                / F.count(F.lit(1))
            )
            / 100
        ).alias("ulcer_index"),
    )


CROSTON_ALPHA = 0.3


def _croston_oracle() -> str:
    """Recursive-CTE replay of the Croston fold: the same dense
    day-grid construction, then one recursion step per (type, rn)
    carrying (z, p, q, started) — the ts_holt pattern with demand-
    interval state. Identical literal coefficients both engines."""
    a = CROSTON_ALPHA
    return f"""
WITH RECURSIVE bounds AS (
  SELECT date_trunc('day', MIN(ts)) AS lo, date_trunc('day', MAX(ts)) AS hi
  FROM events
), grid AS (
  SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS day
  FROM bounds b
), types AS (
  SELECT DISTINCT event_type FROM events
), dc AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), ser AS (
  SELECT t.event_type, g.day,
         CAST(date_diff('day', (SELECT lo FROM bounds), g.day) + 1
              AS BIGINT) AS rn,
         CAST(COALESCE(dc.n, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN grid g
  LEFT JOIN dc ON dc.event_type = t.event_type AND dc.day = g.day
), r AS (
  SELECT event_type, day, rn, x,
         CASE WHEN x > 0 THEN CAST(x AS DOUBLE) END AS z,
         CASE WHEN x > 0 THEN CAST(1 AS DOUBLE) END AS p,
         CASE WHEN x > 0 THEN 1 ELSE 2 END AS q,
         (x > 0) AS started
  FROM ser WHERE rn = 1
  UNION ALL
  SELECT s.event_type, s.day, s.rn, s.x,
         CASE WHEN s.x > 0 AND r.started
                THEN {a} * CAST(s.x AS DOUBLE) + {1 - a} * r.z
              WHEN s.x > 0 THEN CAST(s.x AS DOUBLE)
              ELSE r.z END AS z,
         CASE WHEN s.x > 0 AND r.started
                THEN {a} * CAST(r.q AS DOUBLE) + {1 - a} * r.p
              WHEN s.x > 0 THEN CAST(r.q AS DOUBLE)
              ELSE r.p END AS p,
         CASE WHEN s.x > 0 THEN 1 ELSE r.q + 1 END AS q,
         (r.started OR s.x > 0) AS started
  FROM r JOIN ser s
    ON s.event_type = r.event_type AND s.rn = r.rn + 1
)
SELECT event_type, CAST(day AS TIMESTAMP) AS day, x, z, p,
       z / p AS croston_forecast
FROM r
"""


@query("ts_croston", bounded_cross="1-row broadcast scalar onto the O(days) rollup", oracle=_croston_oracle())
def ts_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for INTERMITTENT demand — the forecasting
    estimator for series that are mostly zeros (spare parts, long-
    tail SKUs), where plain EWMA systematically lags: smooth the
    nonzero demand SIZES (z) and the demand INTERVALS (p) as two
    separate EWMAs and forecast z/p demand per period. Runs on the
    dense per-type day grid (zeros are the signal — the grid join
    is what makes this Croston and not ts_ewma); q counts periods
    since the last demand and feeds the interval EWMA only on
    demand days. Execution is the smooth_series contract: one
    shuffle by series key, Arrow applyInPandas O(n) fold with three
    scalars of state; the oracle replays the identical IEEE
    arithmetic one recursion step per period (ts_holt pattern).
    Pre-first-demand rows carry NULL state in both engines."""
    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    grid = b.select(
        "lo",
        F.explode(
            F.expr("sequence(lo, hi, interval 1 day)")
        ).alias("day"),
    )
    types = ev.select("event_type").distinct()
    dc = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ser = (
        types.crossJoin(F.broadcast(grid))
        .join(dc, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            (F.datediff("day", "lo") + 1).cast("bigint").alias("rn"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("x"),
        )
    )
    a = CROSTON_ALPHA

    def fold(pdf):
        pdf = pdf.sort_values("rn")
        zs, ps, fs = [], [], []
        z = p = None
        q = 1
        started = False
        for x in pdf["x"].to_numpy():
            if x > 0:
                if started:
                    z = a * x + (1 - a) * z
                    p = a * q + (1 - a) * p
                else:
                    z = float(x)
                    p = float(q)
                    started = True
                q = 1
            else:
                q += 1
            zs.append(z)
            ps.append(p)
            fs.append(z / p if started else None)
        return pdf.assign(z=zs, p=ps, croston_forecast=fs)

    out = ser.groupBy("event_type").applyInPandas(
        fold,
        "event_type string, day timestamp, rn bigint, x bigint, "
        "z double, p double, croston_forecast double",
    )
    return out.select("event_type", "day", "x", "z", "p", "croston_forecast")


HW_ALPHA = 0.4
HW_BETA = 0.2
HW_GAMMA = 0.3
HW_PERIOD = 7


def _holt_winters_oracle() -> str:
    """Recursive replay of the additive Holt-Winters fold with the
    seven seasonal slots carried as a DOUBLE[] list column — the
    level' expression is recomputed verbatim inside the trend and
    seasonal updates (IEEE-identical to the Python fold's reuse of
    the value). Every arithmetic input is CAST AS DOUBLE first (the
    ts_croston decimal-literal lesson)."""
    a, b, g, m = HW_ALPHA, HW_BETA, HW_GAMMA, HW_PERIOD
    lv = (
        f"{a} * (CAST(s.x AS DOUBLE) - r.s[((s.rn - 1) % {m}) + 1])"
        f" + {1 - a} * (r.level + r.trend)"
    )
    return f"""
WITH RECURSIVE bounds AS (
  SELECT date_trunc('day', MIN(ts)) AS lo, date_trunc('day', MAX(ts)) AS hi
  FROM events
), grid AS (
  SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS day
  FROM bounds b
), types AS (
  SELECT DISTINCT event_type FROM events
), dc AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), ser AS (
  SELECT t.event_type, g.day,
         CAST(date_diff('day', (SELECT lo FROM bounds), g.day) + 1
              AS BIGINT) AS rn,
         CAST(COALESCE(dc.c, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN grid g
  LEFT JOIN dc ON dc.event_type = t.event_type AND dc.day = g.day
), seed0 AS (
  SELECT event_type,
         MAX(day) AS day,
         CAST(SUM(x) AS DOUBLE) / {m} AS level7,
         list(CAST(x AS DOUBLE) ORDER BY rn) AS xs
  FROM ser WHERE rn <= {m} GROUP BY event_type
), r AS (
  SELECT event_type, day, CAST({m} AS BIGINT) AS rn,
         CAST(0 AS BIGINT) AS x,
         level7 AS level, CAST(0 AS DOUBLE) AS trend,
         list_transform(xs, v -> v - level7) AS s
  FROM seed0
  UNION ALL
  SELECT s.event_type, s.day, s.rn, s.x,
         {lv} AS level,
         {b} * (({lv}) - r.level) + {1 - b} * r.trend AS trend,
         list_transform(r.s, (v, i) ->
           CASE WHEN i = ((s.rn - 1) % {m}) + 1
                THEN {g} * (CAST(s.x AS DOUBLE) - ({lv})) + {1 - g} * v
                ELSE v END) AS s
  FROM r JOIN ser s
    ON s.event_type = r.event_type AND s.rn = r.rn + 1
)
SELECT event_type, CAST(day AS TIMESTAMP) AS day, x,
       level, trend,
       level + trend + s[(rn % {m}) + 1] AS forecast_1
FROM r WHERE rn >= {m + 1}
"""


@query("ts_holt_winters", bounded_cross="1-row day-bounds row crossed into the dense day grid", oracle=_holt_winters_oracle())
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing) of daily
    revenue cents per event type, weekly seasonality: level, trend,
    and SEVEN seasonal slots updated per day — the full classical
    forecaster ts_holt omits the seasonal third of. Seeded at day 7
    (level = first-week mean, trend = 0, s_i = deviations); each
    later day updates level'/trend'/s'[slot] in the standard order
    and emits the one-step forecast level'+trend'+s'[next slot].
    Execution: the ts_croston dense-grid construction, one shuffle
    by event_type, Arrow applyInPandas fold with 9 floats of state;
    the oracle carries the seasonal vector as a DOUBLE[] list column
    through a recursive CTE, updating one slot per step with an
    indexed list_transform lambda — the ts_holt replay pattern
    extended to vector state. Both engines run literally the same
    IEEE expression tree (level' recomputed verbatim where Python
    reuses the bound value — same inputs, same ops, same bits)."""
    ev = load(spark, sf_dir, "events")
    b_ = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    grid = b_.select(
        "lo",
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day"),
    )
    types = ev.select("event_type").distinct()
    dc = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.expr(cents("value"))).cast("bigint").alias("c"))
    ser = (
        types.crossJoin(F.broadcast(grid))
        .join(dc, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            (F.datediff("day", "lo") + 1).cast("bigint").alias("rn"),
            F.coalesce("c", F.lit(0)).cast("bigint").alias("x"),
        )
    )
    a, bb, g, m = HW_ALPHA, HW_BETA, HW_GAMMA, HW_PERIOD

    def fold(pdf):
        pdf = pdf.sort_values("rn")
        xs = pdf["x"].to_numpy()
        if len(xs) < m + 1:
            return pdf.iloc[0:0].assign(
                level=[], trend=[], forecast_1=[]
            )[["event_type", "day", "x", "level", "trend", "forecast_1"]]
        level = float(sum(int(v) for v in xs[:m])) / m
        trend = 0.0
        s = [float(x) - level for x in xs[:m]]
        rows = []
        for pos in range(m, len(xs)):
            rn = pos + 1
            x = float(xs[pos])
            idx = (rn - 1) % m
            new_level = a * (x - s[idx]) + (1 - a) * (level + trend)
            trend = bb * (new_level - level) + (1 - bb) * trend
            level = new_level
            s[idx] = g * (x - level) + (1 - g) * s[idx]
            rows.append(
                (
                    pdf["event_type"].iloc[pos],
                    pdf["day"].iloc[pos],
                    int(xs[pos]),
                    level,
                    trend,
                    level + trend + s[rn % m],
                )
            )
        import pandas as pd

        return pd.DataFrame(
            rows,
            columns=[
                "event_type", "day", "x", "level", "trend", "forecast_1",
            ],
        )

    return ser.groupBy("event_type").applyInPandas(
        fold,
        "event_type string, day timestamp, x bigint, "
        "level double, trend double, forecast_1 double",
    )


@query(
    "ts_record_highs",
    oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), rr AS (
  SELECT event_type, day, c,
         CASE WHEN c > COALESCE(MAX(c) OVER (
                PARTITION BY event_type ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                -1)
              THEN 1 ELSE 0 END AS is_record
  FROM daily
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(is_record) AS BIGINT) AS n_records,
       CAST(MAX(CASE WHEN is_record = 1 THEN day END) AS TIMESTAMP)
         AS last_record_day,
       CAST(MAX(c) AS BIGINT) AS best_cents
FROM rr GROUP BY event_type
""",
)
def ts_record_highs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-record statistics of daily revenue per event type:
    how many days set a new all-time high, when the last record
    fell, and the standing record — the 'are we still growing'
    readout (for an i.i.d. series the expected record count is
    harmonic ~ ln(days), so a materially higher count IS the trend
    signal). A day is a record iff it strictly exceeds the running
    max of the PRECEDING frame (first day counts, via the -1
    sentinel against nonnegative cents). Exact integer cents
    end-to-end; the running max rides the per-type O(days) rollup —
    partitioned by series, never global."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.expr(cents("value"))).cast("bigint").alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rr = daily.withColumn(
        "is_record",
        F.when(
            F.col("c") > F.coalesce(F.max("c").over(w), F.lit(-1)), 1
        ).otherwise(0),
    )
    return rr.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("is_record").cast("bigint").alias("n_records"),
        F.max(F.when(F.col("is_record") == 1, F.col("day"))).alias(
            "last_record_day"
        ),
        F.max("c").cast("bigint").alias("best_cents"),
    )


@query(
    "ts_time_weighted_return",
    oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), rets AS (
  SELECT event_type, day, c,
         LAG(c) OVER (PARTITION BY event_type ORDER BY day) AS prev
  FROM daily
), hist AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_periods,
         list(CAST(c AS DOUBLE) / prev ORDER BY day) AS growths
  FROM rets WHERE prev IS NOT NULL AND prev > 0
  GROUP BY event_type
)
SELECT event_type, n_periods,
       list_reduce(growths, (a, x) -> a * x) - 1.0 AS twr,
       list_reduce(growths, (a, x) -> a * x) AS growth_factor
FROM hist
""",
)
def ts_time_weighted_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted (geometric-linked) return of daily revenue per
    event type: TWR = prod(c_t / c_{t-1}) - 1 over consecutive days
    — the portfolio-performance standard that neutralizes flow
    size, here reading 'compound daily growth' of each revenue
    stream. Day ratios come from a per-type LAG window (partitioned,
    O(days) rows); the multiplicative link is an ORDERED left fold:
    the engine folds in an Arrow applyInPandas scan per type (one
    float of state), the oracle replays the identical IEEE product
    with DuckDB's list_reduce over a day-ordered list — the ts_ewma
    replay contract, multiplicative instead of affine. Ratios are
    exact-integer-cents quotients so both engines start from
    identical doubles; zero-revenue days break the chain and are
    excluded identically (prev > 0)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.expr(cents("value"))).cast("bigint").alias("c"))
    w = Window.partitionBy("event_type").orderBy("day")
    rets = daily.withColumn("prev", F.lag("c").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("prev") > 0)
    )

    def fold(pdf):
        pdf = pdf.sort_values("day")
        acc = None
        for c, prev in zip(
            pdf["c"].to_numpy(), pdf["prev"].to_numpy()
        ):
            g = float(c) / float(prev)
            acc = g if acc is None else acc * g
        import pandas as pd

        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_periods": [len(pdf)],
                "twr": [acc - 1.0],
                "growth_factor": [acc],
            }
        )

    return rets.groupBy("event_type").applyInPandas(
        fold,
        "event_type string, n_periods bigint, twr double, "
        "growth_factor double",
    )


@query(
    "ts_time_underwater",
    oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), flags AS (
  SELECT event_type, day, c,
         CASE WHEN c < MAX(c) OVER (PARTITION BY event_type
                                    ORDER BY day) THEN 1 ELSE 0 END
           AS underwater,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM daily
), uw AS (
  SELECT event_type, day, rn,
         rn - ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY day) AS anchor
  FROM flags WHERE underwater = 1
), spells AS (
  SELECT event_type, anchor, CAST(COUNT(*) AS BIGINT) AS spell_days
  FROM uw GROUP BY event_type, anchor
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_spells,
       CAST(MAX(spell_days) AS BIGINT) AS max_underwater_days,
       CAST(SUM(spell_days) AS BIGINT) AS total_underwater_days
FROM spells GROUP BY event_type
""",
)
def ts_time_underwater(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-underwater analysis of daily revenue per event type: a
    day is UNDERWATER when it sits strictly below the running
    all-time peak, and consecutive underwater days form recovery
    spells — the DURATION view of drawdowns that win_max_drawdown's
    depth number and ts_ulcer_index's rms both miss ('how long were
    we below the high-water mark, and what was the worst stretch').
    Two stacked per-type windows (running max, then the
    gaps-islands anchor over the underwater subset) on the O(days)
    rollup, then two integer aggregations. Integer cents and day
    counts end-to-end — nothing float anywhere."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.expr(cents("value"))).cast("bigint").alias("c"))
    wpeak = Window.partitionBy("event_type").orderBy("day")
    flags = daily.select(
        "event_type",
        "day",
        F.when(F.col("c") < F.max("c").over(wpeak), 1)
        .otherwise(0)
        .alias("underwater"),
        F.row_number().over(wpeak).alias("rn"),
    )
    wuw = Window.partitionBy("event_type").orderBy("day")
    uw = flags.filter(F.col("underwater") == 1).withColumn(
        "anchor", F.col("rn") - F.row_number().over(wuw)
    )
    spells = uw.groupBy("event_type", "anchor").agg(
        F.count(F.lit(1)).cast("bigint").alias("spell_days")
    )
    return spells.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spells"),
        F.max("spell_days").cast("bigint").alias("max_underwater_days"),
        F.sum("spell_days").cast("bigint").alias("total_underwater_days"),
    )


@query(
    "ts_best_split",
    bounded_cross="1-row broadcast scalar (grand-total row)",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
), cum AS (
  SELECT day, c,
         CAST(SUM(c) OVER (ORDER BY day) AS BIGINT) AS cs,
         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
         (SELECT CAST(SUM(c) AS BIGINT) FROM daily) AS tot,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n
  FROM daily
)
SELECT CAST(day AS TIMESTAMP) AS split_after_day,
       CAST(i AS BIGINT) AS n_days_before,
       CAST(n - i AS BIGINT) AS n_days_after,
       (CAST(cs AS DOUBLE) / i
        - CAST(tot - cs AS DOUBLE) / (n - i)) / 100 AS mean_shift,
       abs(CAST(cs AS DOUBLE) / i
           - CAST(tot - cs AS DOUBLE) / (n - i))
         * i * (n - i) / n / 10000 AS shift_score
FROM cum WHERE i < n
ORDER BY abs(CAST(cs AS DOUBLE) / i
             - CAST(tot - cs AS DOUBLE) / (n - i))
           * i * (n - i) / n / 10000 DESC, day
LIMIT 1
""",
)
def ts_best_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detection on daily revenue — the first
    step of binary segmentation: over every candidate split day,
    score the before/after mean shift weighted by the balanced
    sample sizes (|m1 - m2| * n1*n2/n — the two-sample t numerator
    shape, so edge splits cannot win on noise alone) and return the
    argmax. Everything derives from ONE pass of cumulative integer
    sums over the O(days) rollup (bounded-domain window, see
    PLANS.md audit); each candidate's score is a per-row float
    expression; the argmax is ORDER BY ... LIMIT 1 — a 1-row
    TakeOrderedAndProject, ties broken by day. The classic CUSUM
    key (ts_cusum_drift) monitors drift online; this key answers
    the offline 'WHEN did the level change'."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr(cents("value"))).cast("bigint").alias("c")
    )
    # bounded: O(distinct days) rows — the daily rollup, not events
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # bounded: O(distinct days) rows — same rollup
    wr = Window.orderBy("day")
    tot = daily.agg(
        F.sum("c").cast("bigint").alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    cum = daily.select(
        "day",
        F.sum("c").over(w).cast("bigint").alias("cs"),
        F.row_number().over(wr).cast("bigint").alias("i"),
    ).crossJoin(F.broadcast(tot))
    shift = (
        F.col("cs").cast("double") / F.col("i")
        - (F.col("tot") - F.col("cs")).cast("double")
        / (F.col("n") - F.col("i"))
    )
    score = (
        F.abs(shift) * F.col("i") * (F.col("n") - F.col("i")) / F.col("n")
    )
    return (
        cum.filter(F.col("i") < F.col("n"))
        .select(
            F.col("day").alias("split_after_day"),
            F.col("i").alias("n_days_before"),
            (F.col("n") - F.col("i")).cast("bigint").alias("n_days_after"),
            (shift / 100).alias("mean_shift"),
            (score / 10000).alias("shift_score"),
        )
        .orderBy(F.col("shift_score").desc(), "split_after_day")
        .limit(1)
    )


@query(
    "ts_obv",
    oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c,
         CAST(COUNT(*) AS BIGINT) AS vol
  FROM events GROUP BY 1, 2
), signed AS (
  SELECT event_type, day, c, vol,
         CASE WHEN c > LAG(c) OVER (PARTITION BY event_type
                                    ORDER BY day) THEN vol
              WHEN c < LAG(c) OVER (PARTITION BY event_type
                                    ORDER BY day) THEN -vol
              ELSE 0 END AS dv
  FROM daily
)
SELECT event_type, CAST(day AS TIMESTAMP) AS day,
       CAST(vol AS BIGINT) AS volume,
       CAST(SUM(dv) OVER (PARTITION BY event_type ORDER BY day)
            AS BIGINT) AS obv
FROM signed
""",
)
def ts_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-balance volume of each event-type series: accumulate the
    day's event volume with the SIGN of the revenue move (up-day
    adds, down-day subtracts, flat and first days add zero) — the
    classic volume-confirms-price indicator, here reading 'is
    engagement flowing into or out of this revenue trend' alongside
    ts_rsi / ts_sma_crossover. Two stacked per-type windows (LAG
    for direction, running sum for the accumulation) on the O(days)
    rollup; exact integer cents decide the sign and exact integer
    volumes accumulate, so the whole operator is bigint end to
    end."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.expr(cents("value"))).cast("bigint").alias("c"),
        F.count(F.lit(1)).cast("bigint").alias("vol"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    signed = daily.withColumn(
        "dv",
        F.when(F.col("c") > F.lag("c").over(w), F.col("vol"))
        .when(F.col("c") < F.lag("c").over(w), -F.col("vol"))
        .otherwise(F.lit(0)),
    )
    return signed.select(
        "event_type",
        "day",
        F.col("vol").alias("volume"),
        F.sum("dv").over(wrun).cast("bigint").alias("obv"),
    )


@query(
    "ts_gini_daily",
    oracle="""
WITH o AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
         o_orderkey
  FROM orders
), ranked AS (
  SELECT day, c,
         CAST(ROW_NUMBER() OVER (PARTITION BY day ORDER BY c, o_orderkey)
              AS BIGINT) AS i
  FROM o
)
SELECT CAST(day AS TIMESTAMP) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(c) AS BIGINT) AS revenue_cents,
       CAST(2 * SUM(i * c) - (COUNT(*) + 1) * SUM(c) AS DOUBLE)
         / (COUNT(*) * SUM(c)) AS gini
FROM ranked GROUP BY day
HAVING SUM(c) > 0
""",
)
def ts_gini_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily Gini coefficient of order values — the INEQUALITY trend
    ('is revenue concentrating into fewer, bigger orders over
    time'), the time-series view of the one-shot agg_gini. Per day:
    rank orders ascending (key tie-break), then the closed form
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) — every sum an
    exact bigint over a DAY-PARTITIONED window (parallelism = days;
    no global sort anywhere), ONE division per day. The i*c product
    peaks around rank * cents ~ 1e4 * 1e7 = 1e11 per row and ~1e15
    per day-sum at sf0.1 — comfortably inside bigint."""
    o = load(spark, sf_dir, "orders").select(
        F.date_trunc("day", "o_orderdate").alias("day"),
        F.expr(cents("o_totalprice")).alias("c"),
        "o_orderkey",
    )
    w = Window.partitionBy("day").orderBy("c", "o_orderkey")
    ranked = o.withColumn("i", F.row_number().over(w).cast("bigint"))
    return (
        ranked.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("c").cast("bigint").alias("revenue_cents"),
            (
                (
                    2 * F.sum(F.col("i") * F.col("c"))
                    - (F.count(F.lit(1)) + 1) * F.sum("c")
                ).cast("double")
                / (F.count(F.lit(1)) * F.sum("c"))
            ).alias("gini"),
        )
        .filter(F.col("revenue_cents") > 0)
    )


@query(
    "ts_page_hinkley",
    bounded_cross="1-row grand-total scalar onto the O(days) rollup",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS n
  FROM daily
), m AS (
  SELECT day, c,
         ROW_NUMBER() OVER (ORDER BY day) AS t,
         SUM(c) OVER (ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS s
  FROM daily
), dev AS (
  SELECT day,
         CAST(s AS DOUBLE)
           - CAST(t AS DOUBLE) * (CAST(total AS DOUBLE) / n) AS mt,
         CAST(total AS DOUBLE) / 100 / n AS mean_rev
  FROM m, tot
), ph AS (
  SELECT day, mean_rev,
         (mt - MIN(mt) OVER (ORDER BY day
                             ROWS UNBOUNDED PRECEDING)) / 100 AS ph
  FROM dev
)
SELECT day, ph, ph > CAST(0.1 AS DOUBLE) * mean_rev AS alarm
FROM ph
""",
)
def ts_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift detector on daily revenue: the cumulative
    deviation from the global mean, m_t = S_t - t*mean, minus its
    running minimum — the classic sequential change-point statistic
    (alarm when the current mass sits lambda above the historical
    trough; lambda = 10% of mean daily revenue here). Exactness:
    S_t is an order-independent BIGINT prefix sum, m_t is a per-row
    float expression from exact integers (identical text both
    engines), and the running MIN is order-independent — bit-exact,
    no rounding. One O(days) rollup + one 1-row total scalar."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr(cents("value"))).cast("bigint").alias("c")
    )
    tot = daily.agg(
        F.sum("c").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    # bounded: O(days) daily rollup rows
    wt = Window.orderBy("day")
    # bounded: O(days) daily rollup rows
    wp = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    m = daily.select(
        "day",
        F.row_number().over(wt).alias("t"),
        F.sum("c").over(wp).alias("s"),
    ).crossJoin(F.broadcast(tot))
    dev = m.select(
        "day",
        (
            F.col("s").cast("double")
            - F.col("t").cast("double")
            * (F.col("total").cast("double") / F.col("n"))
        ).alias("mt"),
        (F.col("total").cast("double") / 100 / F.col("n")).alias("mean_rev"),
    )
    ph = dev.select(
        "day",
        "mean_rev",
        ((F.col("mt") - F.min("mt").over(wp)) / 100).alias("ph"),
    )
    return ph.select(
        "day",
        "ph",
        (F.col("ph") > F.lit(0.1).cast("double") * F.col("mean_rev")).alias(
            "alarm"
        ),
    )


@query(
    "ts_variance_ratio",
    bounded_cross="two 1-row moment scalars crossed into one stats row",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
), lagged AS (
  SELECT day, c,
         c - LAG(c, 1) OVER (ORDER BY day) AS d1,
         c - LAG(c, 5) OVER (ORDER BY day) AS d5
  FROM daily
), m1 AS (
  SELECT CAST(COUNT(d1) AS BIGINT) AS n1,
         CAST(SUM(d1) AS BIGINT) AS s1,
         CAST(SUM(d1 * d1) AS BIGINT) AS q1
  FROM lagged
), m5 AS (
  SELECT CAST(COUNT(d5) AS BIGINT) AS n5,
         CAST(SUM(d5) AS BIGINT) AS s5,
         CAST(SUM(d5 * d5) AS BIGINT) AS q5
  FROM lagged
)
SELECT n1, n5,
       (CAST(q5 AS DOUBLE) / n5
        - (CAST(s5 AS DOUBLE) / n5) * (CAST(s5 AS DOUBLE) / n5))
       / (CAST(5 AS DOUBLE)
          * (CAST(q1 AS DOUBLE) / n1
             - (CAST(s1 AS DOUBLE) / n1) * (CAST(s1 AS DOUBLE) / n1)))
       AS variance_ratio
FROM m1, m5
""",
)
def ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio statistic (q=5) on daily revenue
    differences: Var(5-day change) / (5 * Var(1-day change)) — the
    random-walk diagnostic (VR ~ 1 under a drift-free walk, < 1
    mean-reverting, > 1 trending). Both variances come from exact
    BIGINT moment sums of integer-cents differences; the single
    float expression is identical text in both engines — bit-exact,
    no rounding."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr(cents("value"))).cast("bigint").alias("c")
    )
    # bounded: O(days) daily rollup rows
    wd = Window.orderBy("day")
    lagged = daily.select(
        "day",
        (F.col("c") - F.lag("c", 1).over(wd)).alias("d1"),
        (F.col("c") - F.lag("c", 5).over(wd)).alias("d5"),
    )
    m1 = lagged.agg(
        F.count("d1").cast("bigint").alias("n1"),
        F.sum("d1").cast("bigint").alias("s1"),
        F.sum(F.col("d1") * F.col("d1")).cast("bigint").alias("q1"),
    )
    m5 = lagged.agg(
        F.count("d5").cast("bigint").alias("n5"),
        F.sum("d5").cast("bigint").alias("s5"),
        F.sum(F.col("d5") * F.col("d5")).cast("bigint").alias("q5"),
    )
    j = m1.crossJoin(F.broadcast(m5))
    var1 = (
        F.col("q1").cast("double") / F.col("n1")
        - (F.col("s1").cast("double") / F.col("n1"))
        * (F.col("s1").cast("double") / F.col("n1"))
    )
    var5 = (
        F.col("q5").cast("double") / F.col("n5")
        - (F.col("s5").cast("double") / F.col("n5"))
        * (F.col("s5").cast("double") / F.col("n5"))
    )
    return j.select(
        "n1",
        "n5",
        (var5 / (F.lit(5).cast("double") * var1)).alias("variance_ratio"),
    )


@query(
    "ts_hurst_rs",
    bounded_cross="3-row block-size grid folds crossed for the slope",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS BIGINT) AS c,
         ROW_NUMBER() OVER (ORDER BY date_trunc('day', ts)) - 1 AS t
  FROM events GROUP BY date_trunc('day', ts)
), sizes AS (SELECT unnest([5, 10, 15]) AS m),
blocks AS (
  SELECT s.m, d.t // s.m AS blk, d.t % s.m AS i, d.c
  FROM daily d JOIN sizes s
    ON d.t < s.m * ((SELECT COUNT(*) FROM daily) // s.m)
), bstat AS (
  SELECT m, blk, CAST(SUM(c) AS BIGINT) AS sx,
         CAST(SUM(c * c) AS BIGINT) AS ssq
  FROM blocks GROUP BY m, blk
), cum AS (
  SELECT b.m, b.blk,
         CAST(SUM(b.c) OVER (PARTITION BY b.m, b.blk ORDER BY b.i
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pc,
         b.i, s.sx, s.ssq
  FROM blocks b JOIN bstat s ON s.m = b.m AND s.blk = b.blk
), dev AS (
  SELECT m, blk, sx, ssq,
         MAX(m * pc - (i + 1) * sx) AS mxd,
         MIN(m * pc - (i + 1) * sx) AS mnd
  FROM cum GROUP BY m, blk, sx, ssq
), rs AS (
  SELECT m, blk,
         (CAST(mxd AS DOUBLE) - CAST(mnd AS DOUBLE))
           / sqrt(CAST(m AS DOUBLE) * ssq - CAST(sx AS DOUBLE) * sx) AS rs
  FROM dev
  WHERE m * ssq > sx * sx
), per_m AS (
  SELECT m, CAST(COUNT(*) AS BIGINT) AS n_blocks,
         list_sum(list(rs ORDER BY blk)) / COUNT(*) AS mean_rs
  FROM rs GROUP BY m
), fit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         list_sum(list(ln(CAST(m AS DOUBLE)) ORDER BY m)) AS slx,
         list_sum(list(ln(mean_rs) ORDER BY m)) AS sly,
         list_sum(list(ln(CAST(m AS DOUBLE)) * ln(mean_rs) ORDER BY m))
           AS slxy,
         list_sum(list(ln(CAST(m AS DOUBLE)) * ln(CAST(m AS DOUBLE))
                       ORDER BY m)) AS slxx
  FROM per_m
)
SELECT p.m, p.n_blocks, round(p.mean_rs, 6) AS mean_rs,
       round((CAST(f.k AS DOUBLE) * f.slxy - f.slx * f.sly)
             / (CAST(f.k AS DOUBLE) * f.slxx - f.slx * f.slx), 6)
         AS hurst
FROM per_m p, fit f
""",
)
def ts_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range (R/S) analysis of daily revenue with the Hurst
    exponent: for block sizes m = 5/10/15 days, each complete block
    reports R (range of cumulative mean-deviations) over S
    (population std); H is the log-log OLS slope of mean R/S on m —
    the long-memory diagnostic (H=0.5 random walk, >0.5 trending).
    Exactness: cumulative deviations are SCALED BY m so they stay
    integer (m*prefix - (i+1)*total — no mean division inside the
    prefix), R/S per block is one float expression from exact
    BIGINTs (the m scale cancels between R and S), per-size means
    fold in block order, and the ln-based slope is rounded to 6 dp
    (Java log vs libm 1-ulp discipline). Zero-variance blocks are
    excluded in both engines."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr(cents("value"))).cast("bigint").alias("c")
    )
    # bounded: O(days) daily rollup rows
    wd = Window.orderBy("day")
    d = daily.select(
        "c", (F.row_number().over(wd) - 1).cast("bigint").alias("t")
    )
    n_days = d.count()
    sizes = spark.createDataFrame([(5,), (10,), (15,)], "m bigint")
    blocks = d.crossJoin(F.broadcast(sizes)).filter(
        F.col("t") < F.col("m") * F.floor(F.lit(n_days) / F.col("m"))
    ).select(
        "m",
        F.expr("t div m").alias("blk"),
        (F.col("t") % F.col("m")).alias("i"),
        "c",
    )
    bstat = blocks.groupBy("m", "blk").agg(
        F.sum("c").cast("bigint").alias("sx"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ssq"),
    )
    # bounded: <= m rows per (m, blk) partition
    wblk = (
        Window.partitionBy("m", "blk")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = blocks.select(
        "m",
        "blk",
        "i",
        F.sum("c").over(wblk).cast("bigint").alias("pc"),
    ).join(bstat, ["m", "blk"])
    dev = cum.groupBy("m", "blk", "sx", "ssq").agg(
        F.max(
            F.col("m") * F.col("pc") - (F.col("i") + 1) * F.col("sx")
        ).alias("mxd"),
        F.min(
            F.col("m") * F.col("pc") - (F.col("i") + 1) * F.col("sx")
        ).alias("mnd"),
    )
    rs = dev.filter(
        F.col("m") * F.col("ssq") > F.col("sx") * F.col("sx")
    ).select(
        "m",
        "blk",
        (
            (F.col("mxd").cast("double") - F.col("mnd").cast("double"))
            / F.sqrt(
                F.col("m").cast("double") * F.col("ssq")
                - F.col("sx").cast("double") * F.col("sx")
            )
        ).alias("rs"),
    )
    per_m = rs.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        (
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("blk", "rs"))),
                F.lit(0.0),
                lambda acc, x: acc + x["rs"],
            )
            / F.count(F.lit(1))
        ).alias("mean_rs"),
    )
    lx = F.log(F.col("m").cast("double"))
    ly = F.log(F.col("mean_rs"))
    fit = per_m.select("m", lx.alias("lx"), ly.alias("ly")).agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("m", F.col("lx").alias("v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("slx"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("m", F.col("ly").alias("v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("sly"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct("m", (F.col("lx") * F.col("ly")).alias("v"))
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("slxy"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct("m", (F.col("lx") * F.col("lx")).alias("v"))
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("slxx"),
    )
    return per_m.crossJoin(F.broadcast(fit)).select(
        "m",
        "n_blocks",
        F.round("mean_rs", 6).alias("mean_rs"),
        F.round(
            (F.col("k").cast("double") * F.col("slxy") - F.col("slx") * F.col("sly"))
            / (F.col("k").cast("double") * F.col("slxx") - F.col("slx") * F.col("slx")),
            6,
        ).alias("hurst"),
    )


@query(
    "ts_seasonal_strength",
    bounded_cross="1-row grand-moment scalar onto the O(days) rollup",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         dayofweek(date_trunc('day', ts)) + 1 AS dow,
         CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), dw AS (
  SELECT dow, CAST(SUM(c) AS BIGINT) AS sd,
         CAST(COUNT(*) AS BIGINT) AS nd
  FROM daily GROUP BY dow
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS ssq
  FROM daily
), rem AS (
  SELECT d.day,
         CAST(d.c AS DOUBLE) - CAST(w.sd AS DOUBLE) / w.nd AS r
  FROM daily d JOIN dw w USING (dow)
), rfold AS (
  SELECT list_sum(list(r ORDER BY day)) AS sr,
         list_sum(list(r * r ORDER BY day)) AS srr
  FROM rem
)
SELECT t.n AS n_days,
       CAST(t.ssq AS DOUBLE) / t.n
         - (CAST(t.s AS DOUBLE) / t.n) * (CAST(t.s AS DOUBLE) / t.n)
         AS var_total,
       f.srr / t.n - (f.sr / t.n) * (f.sr / t.n) AS var_remainder,
       greatest(CAST(0 AS DOUBLE),
                CAST(1 AS DOUBLE)
                - (f.srr / t.n - (f.sr / t.n) * (f.sr / t.n))
                / (CAST(t.ssq AS DOUBLE) / t.n
                   - (CAST(t.s AS DOUBLE) / t.n)
                     * (CAST(t.s AS DOUBLE) / t.n)))
         AS seasonal_strength
FROM tot t, rfold f
""",
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal strength of daily revenue (the STL-style F_s
    diagnostic): 1 - Var(remainder) / Var(series), where the weekly
    seasonal component is each day-of-week's mean and the remainder
    is the day's deviation from its dow mean — near 1 = strongly
    weekly-periodic, near 0 = no weekly pattern. Var(series) comes
    straight from exact BIGINT moments; the remainder residuals are
    per-row float expressions from exact integers and their two
    accumulations fold in day order (sorted fold == list_sum ORDER
    BY) — bit-exact, no rounding. dayofweek parity: Spark is 1-7
    Sunday-first, DuckDB 0-6, so the oracle adds 1."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.dayofweek(F.date_trunc("day", "ts")).alias("dow"),
    ).agg(F.sum(F.expr(cents("value"))).cast("bigint").alias("c"))
    dw = daily.groupBy("dow").agg(
        F.sum("c").cast("bigint").alias("sd"),
        F.count(F.lit(1)).cast("bigint").alias("nd"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ssq"),
    )
    rem = daily.join(dw, "dow").select(
        "day",
        (
            F.col("c").cast("double")
            - F.col("sd").cast("double") / F.col("nd")
        ).alias("r"),
    )
    rfold = rem.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("day", F.col("r").alias("v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("sr"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct("day", (F.col("r") * F.col("r")).alias("v"))
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("srr"),
    )
    j = tot.crossJoin(F.broadcast(rfold))
    var_total = F.col("ssq").cast("double") / F.col("n") - (
        F.col("s").cast("double") / F.col("n")
    ) * (F.col("s").cast("double") / F.col("n"))
    var_rem = F.col("srr") / F.col("n") - (F.col("sr") / F.col("n")) * (
        F.col("sr") / F.col("n")
    )
    return j.select(
        F.col("n").alias("n_days"),
        var_total.alias("var_total"),
        var_rem.alias("var_remainder"),
        F.greatest(
            F.lit(0).cast("double"),
            F.lit(1).cast("double") - var_rem / var_total,
        ).alias("seasonal_strength"),
    )


@query(
    "ts_kpss",
    bounded_cross="1-row grand-total scalar onto the O(days) rollup",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM daily
), e AS (
  SELECT day,
         ROW_NUMBER() OVER (ORDER BY day) AS t,
         SUM(c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS pc,
         CAST(c AS DOUBLE) - CAST(s AS DOUBLE) / n AS ed,
         s, n
  FROM daily, tot
), lagged AS (
  SELECT day, t, n,
         (CAST(n AS DOUBLE) * pc - CAST(t AS DOUBLE) * s) / n AS st,
         ed,
         LAG(ed, 1) OVER (ORDER BY day) AS e1,
         LAG(ed, 2) OVER (ORDER BY day) AS e2,
         LAG(ed, 3) OVER (ORDER BY day) AS e3,
         LAG(ed, 4) OVER (ORDER BY day) AS e4
  FROM e
), folds AS (
  SELECT MAX(n) AS n,
         list_sum(list(st * st ORDER BY day)) AS ss2,
         list_sum(list(ed * ed ORDER BY day)) AS g0,
         list_sum(list(COALESCE(ed * e1, 0) ORDER BY day)) AS g1,
         list_sum(list(COALESCE(ed * e2, 0) ORDER BY day)) AS g2,
         list_sum(list(COALESCE(ed * e3, 0) ORDER BY day)) AS g3,
         list_sum(list(COALESCE(ed * e4, 0) ORDER BY day)) AS g4
  FROM lagged
), lrv AS (
  SELECT n, ss2,
         (g0 + 2 * (CAST(0.8 AS DOUBLE) * g1 + CAST(0.6 AS DOUBLE) * g2
                    + CAST(0.4 AS DOUBLE) * g3
                    + CAST(0.2 AS DOUBLE) * g4)) / n AS s2
  FROM folds
)
SELECT n,
       ss2 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * s2) AS kpss_eta,
       ss2 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * s2)
         > CAST(0.463 AS DOUBLE) AS reject_stationarity
FROM lrv
""",
)
def ts_kpss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity test on daily revenue: eta =
    sum(S_t^2) / (n^2 * s^2_lrv), where S_t are cumulative
    mean-deviations and the long-run variance uses a Bartlett kernel
    with 4 lags — the complement to a unit-root test (here the NULL
    is stationarity; reject above the published 5% point 0.463).
    Exactness: S_t is computed as (n*prefix - t*total)/n so the
    prefix stays an exact BIGINT (no float accumulation inside the
    scan); residuals e_t and every lag product are per-row floats
    from exact integers; all six accumulations fold in day order
    (list_sum ORDER BY == sorted-array fold); the Bartlett weights
    are exact decimals embedded identically — bit-exact, no
    rounding."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr(cents("value"))).cast("bigint").alias("c")
    )
    tot = daily.agg(
        F.sum("c").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    # bounded: O(days) daily rollup rows
    wd = Window.orderBy("day")
    wp = wd.rowsBetween(Window.unboundedPreceding, 0)
    e = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        F.row_number().over(wd).alias("t"),
        F.sum("c").over(wp).alias("pc"),
        (F.col("c").cast("double") - F.col("s").cast("double") / F.col("n"))
        .alias("ed"),
        "s",
        "n",
    )
    lagged = e.select(
        "day",
        "n",
        (
            (
                F.col("n").cast("double") * F.col("pc")
                - F.col("t").cast("double") * F.col("s")
            )
            / F.col("n")
        ).alias("st"),
        "ed",
        F.lag("ed", 1).over(wd).alias("e1"),
        F.lag("ed", 2).over(wd).alias("e2"),
        F.lag("ed", 3).over(wd).alias("e3"),
        F.lag("ed", 4).over(wd).alias("e4"),
    )

    def fold(expr, name):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("day", expr.alias("v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias(name)

    folds = lagged.agg(
        F.max("n").alias("n"),
        fold(F.col("st") * F.col("st"), "ss2"),
        fold(F.col("ed") * F.col("ed"), "g0"),
        fold(F.coalesce(F.col("ed") * F.col("e1"), F.lit(0.0)), "g1"),
        fold(F.coalesce(F.col("ed") * F.col("e2"), F.lit(0.0)), "g2"),
        fold(F.coalesce(F.col("ed") * F.col("e3"), F.lit(0.0)), "g3"),
        fold(F.coalesce(F.col("ed") * F.col("e4"), F.lit(0.0)), "g4"),
    )
    s2 = (
        F.col("g0")
        + 2
        * (
            F.lit(0.8).cast("double") * F.col("g1")
            + F.lit(0.6).cast("double") * F.col("g2")
            + F.lit(0.4).cast("double") * F.col("g3")
            + F.lit(0.2).cast("double") * F.col("g4")
        )
    ) / F.col("n")
    eta = F.col("ss2") / (
        F.col("n").cast("double") * F.col("n").cast("double") * s2
    )
    return folds.select(
        "n",
        eta.alias("kpss_eta"),
        (eta > F.lit(0.463).cast("double")).alias("reject_stationarity"),
    )


def _adf_oracle() -> str:
    from .behavior import _gauss_chain

    rss = (
        "dyy - 2 * (b0 * sy + b1 * s1y + b2 * s2y)"
        " + (b0 * (b0 * n + b1 * s1 + b2 * s2)"
        "    + b1 * (b0 * s1 + b1 * s11 + b2 * s12)"
        "    + b2 * (b0 * s2 + b1 * s12 + b2 * s22))"
    )
    return f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
), lagd AS (
  SELECT day, c,
         LAG(c, 1) OVER (ORDER BY day) AS y1,
         LAG(c, 2) OVER (ORDER BY day) AS y2
  FROM daily
), reg AS (
  SELECT c - y1 AS dy, y1 AS yl, y1 - y2 AS dl
  FROM lagd WHERE y2 IS NOT NULL
), m AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(yl) AS BIGINT) AS s1,
         CAST(SUM(dl) AS BIGINT) AS s2,
         CAST(SUM(yl * yl) AS BIGINT) AS s11,
         CAST(SUM(yl * dl) AS BIGINT) AS s12,
         CAST(SUM(dl * dl) AS BIGINT) AS s22,
         CAST(SUM(dy) AS BIGINT) AS sy,
         CAST(SUM(yl * dy) AS BIGINT) AS s1y,
         CAST(SUM(dl * dy) AS BIGINT) AS s2y,
         CAST(SUM(dy * dy) AS BIGINT) AS dyy
  FROM reg
), gj0 AS MATERIALIZED (
  SELECT i, j, v FROM (
    SELECT 0 AS i, 0 AS j, CAST(n AS DOUBLE) AS v FROM m
    UNION ALL SELECT 0, 1, CAST(s1 AS DOUBLE) FROM m
    UNION ALL SELECT 0, 2, CAST(s2 AS DOUBLE) FROM m
    UNION ALL SELECT 0, 3, CAST(sy AS DOUBLE) FROM m
    UNION ALL SELECT 0, 4, 1.0 FROM m
    UNION ALL SELECT 0, 5, 0.0 FROM m
    UNION ALL SELECT 0, 6, 0.0 FROM m
    UNION ALL SELECT 1, 0, CAST(s1 AS DOUBLE) FROM m
    UNION ALL SELECT 1, 1, CAST(s11 AS DOUBLE) FROM m
    UNION ALL SELECT 1, 2, CAST(s12 AS DOUBLE) FROM m
    UNION ALL SELECT 1, 3, CAST(s1y AS DOUBLE) FROM m
    UNION ALL SELECT 1, 4, 0.0 FROM m
    UNION ALL SELECT 1, 5, 1.0 FROM m
    UNION ALL SELECT 1, 6, 0.0 FROM m
    UNION ALL SELECT 2, 0, CAST(s2 AS DOUBLE) FROM m
    UNION ALL SELECT 2, 1, CAST(s12 AS DOUBLE) FROM m
    UNION ALL SELECT 2, 2, CAST(s22 AS DOUBLE) FROM m
    UNION ALL SELECT 2, 3, CAST(s2y AS DOUBLE) FROM m
    UNION ALL SELECT 2, 4, 0.0 FROM m
    UNION ALL SELECT 2, 5, 0.0 FROM m
    UNION ALL SELECT 2, 6, 1.0 FROM m
  )
){_gauss_chain('gj0', '', pivots=3)}
, coef AS MATERIALIZED (
  SELECT
    (SELECT v FROM gj3 WHERE i = 0 AND j = 3)
      / (SELECT v FROM gj3 WHERE i = 0 AND j = 0) AS b0,
    (SELECT v FROM gj3 WHERE i = 1 AND j = 3)
      / (SELECT v FROM gj3 WHERE i = 1 AND j = 1) AS b1,
    (SELECT v FROM gj3 WHERE i = 2 AND j = 3)
      / (SELECT v FROM gj3 WHERE i = 2 AND j = 2) AS b2,
    (SELECT v FROM gj3 WHERE i = 1 AND j = 5)
      / (SELECT v FROM gj3 WHERE i = 1 AND j = 1) AS inv11
), md AS (
  SELECT CAST(n AS DOUBLE) AS n, CAST(s1 AS DOUBLE) AS s1,
         CAST(s2 AS DOUBLE) AS s2, CAST(s11 AS DOUBLE) AS s11,
         CAST(s12 AS DOUBLE) AS s12, CAST(s22 AS DOUBLE) AS s22,
         CAST(sy AS DOUBLE) AS sy, CAST(s1y AS DOUBLE) AS s1y,
         CAST(s2y AS DOUBLE) AS s2y, CAST(dyy AS DOUBLE) AS dyy,
         n AS n_int
  FROM m
)
SELECT CAST(n_int AS BIGINT) AS n, b1 AS beta,
       b1 / sqrt((({rss}) / (n - 3)) * inv11) AS t_stat,
       b1 / sqrt((({rss}) / (n - 3)) * inv11)
         < CAST(-2.86 AS DOUBLE) AS unit_root_rejected
FROM md, coef
"""


@query("ts_adf", oracle=_adf_oracle())
def ts_adf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Augmented Dickey-Fuller test (one lag, with constant) on
    daily revenue: regress delta-y on [1, y_{t-1}, delta-y_{t-1}]
    and report the t-statistic of the y_{t-1} coefficient against
    the 5% Dickey-Fuller point (-2.86, public tables) — the
    unit-root complement of ts_kpss (here the NULL is a unit root).
    Exactness: all ten regression moments are exact BIGINTs over
    integer cents; the 3x3 normal equations solve AND the (X'X)^-1
    diagonal needed for the standard error use the same fixed-order
    no-pivot elimination STEP as behavior._gauss_jordan
    (f = A[i][p]/piv[p] over pre-step row values) — inlined here
    because the matrix is identity-augmented to 3x7 to extract the
    inverse diagonal, a shape _gauss_jordan's n x (n+1) contract
    doesn't cover; the oracle unrolls the identical IEEE steps via
    _gauss_chain with the same augmentation. RSS and the t-stat
    evaluate with the same fixed-order expression text in both
    engines — bit-exact, no rounding. No pivoting is safe: X'X is
    positive definite for a non-degenerate regressor set."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr(cents("value"))).cast("bigint").alias("c")
    )
    # bounded: O(days) daily rollup rows
    wd = Window.orderBy("day")
    lagd = daily.select(
        "c",
        F.lag("c", 1).over(wd).alias("y1"),
        F.lag("c", 2).over(wd).alias("y2"),
    ).filter(F.col("y2").isNotNull())
    reg = lagd.select(
        (F.col("c") - F.col("y1")).alias("dy"),
        F.col("y1").alias("yl"),
        (F.col("y1") - F.col("y2")).alias("dl"),
    )
    mrow = reg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("yl").cast("bigint").alias("s1"),
        F.sum("dl").cast("bigint").alias("s2"),
        F.sum(F.col("yl") * F.col("yl")).cast("bigint").alias("s11"),
        F.sum(F.col("yl") * F.col("dl")).cast("bigint").alias("s12"),
        F.sum(F.col("dl") * F.col("dl")).cast("bigint").alias("s22"),
        F.sum("dy").cast("bigint").alias("sy"),
        F.sum(F.col("yl") * F.col("dy")).cast("bigint").alias("s1y"),
        F.sum(F.col("dl") * F.col("dy")).cast("bigint").alias("s2y"),
        F.sum(F.col("dy") * F.col("dy")).cast("bigint").alias("dyy"),
    ).collect()[0]
    n = float(mrow["n"])
    s1, s2 = float(mrow["s1"]), float(mrow["s2"])
    s11, s12, s22 = (
        float(mrow["s11"]),
        float(mrow["s12"]),
        float(mrow["s22"]),
    )
    sy, s1y, s2y = float(mrow["sy"]), float(mrow["s1y"]), float(mrow["s2y"])
    dyy = float(mrow["dyy"])
    # 3x7 augmented [X'X | X'y | I], fixed-order no-pivot elimination
    A = [
        [n, s1, s2, sy, 1.0, 0.0, 0.0],
        [s1, s11, s12, s1y, 0.0, 1.0, 0.0],
        [s2, s12, s22, s2y, 0.0, 0.0, 1.0],
    ]
    for p in range(3):
        piv = A[p]
        for i in range(3):
            if i == p:
                continue
            f = A[i][p] / piv[p]
            A[i] = [A[i][j] - f * piv[j] for j in range(7)]
    b0 = A[0][3] / A[0][0]
    b1 = A[1][3] / A[1][1]
    b2 = A[2][3] / A[2][2]
    inv11 = A[1][5] / A[1][1]
    rss = (
        dyy
        - 2 * (b0 * sy + b1 * s1y + b2 * s2y)
        + (
            b0 * (b0 * n + b1 * s1 + b2 * s2)
            + b1 * (b0 * s1 + b1 * s11 + b2 * s12)
            + b2 * (b0 * s2 + b1 * s12 + b2 * s22)
        )
    )
    t_stat = b1 / ((rss / (n - 3)) * inv11) ** 0.5
    return spark.createDataFrame(
        [(int(mrow["n"]), b1, t_stat, t_stat < -2.86)],
        "n bigint, beta double, t_stat double, unit_root_rejected boolean",
    )


@query(
    "ts_cointegration",
    bounded_cross="1-row OLS-moment scalar onto the O(days) rollup",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CASE WHEN event_type = 'view'
                  THEN CAST(ROUND((value) * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(ROUND((value) * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1
), m1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM daily
), ols AS (
  SELECT n,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b,
         (CAST(sy AS DOUBLE)
          - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
            * sx) / n AS a
  FROM m1
), resid AS (
  SELECT day,
         CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE) AS e
  FROM daily, ols
), lagd AS (
  SELECT day, e,
         LAG(e, 1) OVER (ORDER BY day) AS e1,
         LAG(e, 2) OVER (ORDER BY day) AS e2
  FROM resid
), reg AS (
  SELECT day, e - e1 AS dy, e1 AS el, e1 - e2 AS dl
  FROM lagd WHERE e2 IS NOT NULL
), m2 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n2,
         list_sum(list(el * el ORDER BY day)) AS m00,
         list_sum(list(el * dl ORDER BY day)) AS m01,
         list_sum(list(dl * dl ORDER BY day)) AS m11,
         list_sum(list(el * dy ORDER BY day)) AS s1y,
         list_sum(list(dl * dy ORDER BY day)) AS s2y,
         list_sum(list(dy * dy ORDER BY day)) AS dyy
  FROM reg
), fit AS (
  SELECT n2, m00, m01, m11, s1y, s2y, dyy,
         m00 * m11 - m01 * m01 AS det,
         (m11 * s1y - m01 * s2y) / (m00 * m11 - m01 * m01) AS rho,
         (m00 * s2y - m01 * s1y) / (m00 * m11 - m01 * m01) AS gam
  FROM m2
)
SELECT (SELECT n FROM ols) AS n_days,
       (SELECT b FROM ols) AS hedge_slope,
       rho / sqrt(((dyy - 2 * (rho * s1y + gam * s2y)
                    + (rho * (rho * m00 + gam * m01)
                       + gam * (rho * m01 + gam * m11))) / (n2 - 2))
                  * (m11 / det)) AS t_stat,
       rho / sqrt(((dyy - 2 * (rho * s1y + gam * s2y)
                    + (rho * (rho * m00 + gam * m01)
                       + gam * (rho * m01 + gam * m11))) / (n2 - 2))
                  * (m11 / det))
         < CAST(-3.34 AS DOUBLE) AS cointegrated
FROM fit
""",
)
def ts_cointegration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle-Granger cointegration test between daily view and
    purchase revenue: OLS hedge regression y = a + b*x (exact
    integer moments), then an ADF(1, no constant) t-test on the
    residual series against the 5% Engle-Granger point (-3.34,
    MacKinnon tables) — the pairs-relationship test that completes
    the ts_kpss / ts_adf stationarity trio. Exactness: the hedge
    slope evaluates once from exact BIGINT moments; residuals are
    per-row floats from exact integers; the six residual-regression
    moments fold in day order (list_sum ORDER BY == sorted-array
    fold); the 2x2 solve is in closed form with identical expression
    text in both engines — bit-exact, no rounding."""
    ev = load(spark, sf_dir, "events")
    c = F.expr(cents("value"))
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "view", c).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", c).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    m1 = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    b_expr = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    ols = m1.select(
        "n",
        b_expr.alias("b"),
        ((F.col("sy").cast("double") - b_expr * F.col("sx")) / F.col("n"))
        .alias("a"),
    )
    resid = daily.crossJoin(F.broadcast(ols)).select(
        "day",
        "n",
        (
            F.col("y").cast("double")
            - F.col("a")
            - F.col("b") * F.col("x").cast("double")
        ).alias("e"),
        "b",
    )
    # bounded: O(days) daily rollup rows
    wd = Window.orderBy("day")
    lagd = resid.select(
        "day",
        "n",
        "b",
        "e",
        F.lag("e", 1).over(wd).alias("e1"),
        F.lag("e", 2).over(wd).alias("e2"),
    ).filter(F.col("e2").isNotNull())
    reg = lagd.select(
        "day",
        "n",
        "b",
        (F.col("e") - F.col("e1")).alias("dy"),
        F.col("e1").alias("el"),
        (F.col("e1") - F.col("e2")).alias("dl"),
    )

    def fold(expr, name):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("day", expr.alias("v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias(name)

    m2 = reg.agg(
        F.max("n").alias("n_days"),
        F.max("b").alias("hedge_slope"),
        F.count(F.lit(1)).cast("bigint").alias("n2"),
        fold(F.col("el") * F.col("el"), "m00"),
        fold(F.col("el") * F.col("dl"), "m01"),
        fold(F.col("dl") * F.col("dl"), "m11"),
        fold(F.col("el") * F.col("dy"), "s1y"),
        fold(F.col("dl") * F.col("dy"), "s2y"),
        fold(F.col("dy") * F.col("dy"), "dyy"),
    )
    det = F.col("m00") * F.col("m11") - F.col("m01") * F.col("m01")
    rho = (F.col("m11") * F.col("s1y") - F.col("m01") * F.col("s2y")) / det
    gam = (F.col("m00") * F.col("s2y") - F.col("m01") * F.col("s1y")) / det
    rss = (
        F.col("dyy")
        - 2 * (rho * F.col("s1y") + gam * F.col("s2y"))
        + (
            rho * (rho * F.col("m00") + gam * F.col("m01"))
            + gam * (rho * F.col("m01") + gam * F.col("m11"))
        )
    )
    t = rho / F.sqrt(
        (rss / (F.col("n2") - 2)) * (F.col("m11") / det)
    )
    return m2.select(
        "n_days",
        "hedge_slope",
        t.alias("t_stat"),
        (t < F.lit(-3.34).cast("double")).alias("cointegrated"),
    )


def _arch_lm_oracle() -> str:
    return f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
), dz AS (
  SELECT day, c - LAG(c, 1) OVER (ORDER BY day) AS dy FROM daily
), z AS (
  SELECT day, CAST((dy * dy) // 1000000 AS BIGINT) AS z FROM dz
  WHERE dy IS NOT NULL
), pairs AS (
  SELECT z, LAG(z, 1) OVER (ORDER BY day) AS zl FROM z
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(zl) AS BIGINT) AS s1,
         CAST(SUM(zl * zl) AS BIGINT) AS s11,
         CAST(SUM(z) AS BIGINT) AS sy,
         CAST(SUM(zl * z) AS BIGINT) AS s1y,
         CAST(SUM(z * z) AS BIGINT) AS syy
  FROM pairs WHERE zl IS NOT NULL
), t AS (
  SELECT n,
         CAST(n * s1y - s1 * sy AS DOUBLE) AS a,
         CAST(n * s11 - s1 * s1 AS DOUBLE) AS b,
         CAST(n * syy - sy * sy AS DOUBLE) AS cd
  FROM m
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE) * ((a * a) / (b * cd)) AS lm_stat,
       CAST(n AS DOUBLE) * ((a * a) / (b * cd))
         > CAST(3.841458820694124 AS DOUBLE) AS arch_effect
FROM t
"""


@query("ts_arch_lm", oracle=_arch_lm_oracle())
def ts_arch_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle's ARCH(1) LM test for volatility clustering in daily
    revenue changes: regress the QUANTIZED squared change
    z_t = floor(dy_t^2 / 1e6) on [1, z_{t-1}]; LM = n * R^2 against
    the 5% chi-square(1) point (3.8415, public tables). Volatility
    clustering (today's shock size predicting tomorrow's) is what
    separates heteroscedastic revenue streams from white noise — the
    precondition for any GARCH-style model.

    Exactness: the quantization keeps every regression moment an
    exact BIGINT (dy^2 ~ 1e12 would overflow BIGINT when squared
    again; floor-dividing by 1e6 bounds sum(z^2) ~ 1e15), and the
    three normal-equation terms n*s1y - s1*sy etc. are PRODUCTS OF
    EXACT BIGINTS computed before any float touches them — R^2 and
    the LM statistic evaluate from three exact integers cast to
    double in the same expression order in both engines. One daily
    rollup shuffle; everything after is O(days), # bounded."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr(cents("value"))).cast("bigint").alias("c")
    )
    # bounded: O(days) daily rollup rows
    wd = Window.orderBy("day")
    z = (
        daily.select("day", (F.col("c") - F.lag("c", 1).over(wd)).alias("dy"))
        .filter(F.col("dy").isNotNull())
        .select("day", F.expr("CAST((dy * dy) div 1000000 AS BIGINT)").alias("z"))
    )
    # bounded: O(days) rows
    wz = Window.orderBy("day")
    pairs = z.select("z", F.lag("z", 1).over(wz).alias("zl")).filter(
        F.col("zl").isNotNull()
    )
    m = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("zl").cast("bigint").alias("s1"),
        F.sum(F.col("zl") * F.col("zl")).cast("bigint").alias("s11"),
        F.sum("z").cast("bigint").alias("sy"),
        F.sum(F.col("zl") * F.col("z")).cast("bigint").alias("s1y"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("syy"),
    )
    a = (F.col("n") * F.col("s1y") - F.col("s1") * F.col("sy")).cast("double")
    b = (F.col("n") * F.col("s11") - F.col("s1") * F.col("s1")).cast("double")
    cd = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    lm = F.col("n").cast("double") * ((a * a) / (b * cd))
    return m.select(
        F.col("n"),
        lm.alias("lm_stat"),
        (lm > F.lit(3.841458820694124).cast("double")).alias("arch_effect"),
    )


def _granger_oracle() -> str:
    from .behavior import _gauss_chain

    rss_u = (
        "dyy - 2 * (b0 * sy + b1 * s1y + b2 * s2y)"
        " + (b0 * (b0 * n + b1 * s1 + b2 * s2)"
        "    + b1 * (b0 * s1 + b1 * s11 + b2 * s12)"
        "    + b2 * (b0 * s2 + b1 * s12 + b2 * s22))"
    )
    rss_r = (
        "dyy - 2 * (r0 * sy + r1 * s1y)"
        " + (r0 * (r0 * n + r1 * s1) + r1 * (r0 * s1 + r1 * s11))"
    )
    return f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(ROUND((value) * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS cb,
         CAST(SUM(CASE WHEN event_type = 'view'
                       THEN CAST(ROUND((value) * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS ca
  FROM events GROUP BY 1
), lagd AS (
  SELECT day, cb - LAG(cb, 1) OVER (ORDER BY day) AS dyb,
         ca - LAG(ca, 1) OVER (ORDER BY day) AS dya
  FROM daily
), reg AS (
  SELECT dyb AS dy,
         LAG(dyb, 1) OVER (ORDER BY day) AS yl,
         LAG(dya, 1) OVER (ORDER BY day) AS xl
  FROM lagd WHERE dyb IS NOT NULL
), regf AS (SELECT dy, yl, xl FROM reg WHERE yl IS NOT NULL AND xl IS NOT NULL
), m AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(yl) AS BIGINT) AS s1,
         CAST(SUM(xl) AS BIGINT) AS s2,
         CAST(SUM(yl * yl) AS BIGINT) AS s11,
         CAST(SUM(yl * xl) AS BIGINT) AS s12,
         CAST(SUM(xl * xl) AS BIGINT) AS s22,
         CAST(SUM(dy) AS BIGINT) AS sy,
         CAST(SUM(yl * dy) AS BIGINT) AS s1y,
         CAST(SUM(xl * dy) AS BIGINT) AS s2y,
         CAST(SUM(dy * dy) AS BIGINT) AS dyy
  FROM regf
), gj0 AS MATERIALIZED (
  SELECT i, j, v FROM (
    SELECT 0 AS i, 0 AS j, CAST(n AS DOUBLE) AS v FROM m
    UNION ALL SELECT 0, 1, CAST(s1 AS DOUBLE) FROM m
    UNION ALL SELECT 0, 2, CAST(s2 AS DOUBLE) FROM m
    UNION ALL SELECT 0, 3, CAST(sy AS DOUBLE) FROM m
    UNION ALL SELECT 1, 0, CAST(s1 AS DOUBLE) FROM m
    UNION ALL SELECT 1, 1, CAST(s11 AS DOUBLE) FROM m
    UNION ALL SELECT 1, 2, CAST(s12 AS DOUBLE) FROM m
    UNION ALL SELECT 1, 3, CAST(s1y AS DOUBLE) FROM m
    UNION ALL SELECT 2, 0, CAST(s2 AS DOUBLE) FROM m
    UNION ALL SELECT 2, 1, CAST(s12 AS DOUBLE) FROM m
    UNION ALL SELECT 2, 2, CAST(s22 AS DOUBLE) FROM m
    UNION ALL SELECT 2, 3, CAST(s2y AS DOUBLE) FROM m
  )
){_gauss_chain('gj0', '', pivots=3)}
, coef AS MATERIALIZED (
  SELECT
    (SELECT v FROM gj3 WHERE i = 0 AND j = 3)
      / (SELECT v FROM gj3 WHERE i = 0 AND j = 0) AS b0,
    (SELECT v FROM gj3 WHERE i = 1 AND j = 3)
      / (SELECT v FROM gj3 WHERE i = 1 AND j = 1) AS b1,
    (SELECT v FROM gj3 WHERE i = 2 AND j = 3)
      / (SELECT v FROM gj3 WHERE i = 2 AND j = 2) AS b2
), md AS (
  SELECT CAST(n AS DOUBLE) AS n, CAST(s1 AS DOUBLE) AS s1,
         CAST(s2 AS DOUBLE) AS s2, CAST(s11 AS DOUBLE) AS s11,
         CAST(s12 AS DOUBLE) AS s12, CAST(s22 AS DOUBLE) AS s22,
         CAST(sy AS DOUBLE) AS sy, CAST(s1y AS DOUBLE) AS s1y,
         CAST(s2y AS DOUBLE) AS s2y, CAST(dyy AS DOUBLE) AS dyy,
         n AS n_int
  FROM m
), rcoef AS (
  SELECT (s11 * sy - s1 * s1y) / (n * s11 - s1 * s1) AS r0,
         (n * s1y - s1 * sy) / (n * s11 - s1 * s1) AS r1
  FROM md
)
SELECT CAST(n_int AS BIGINT) AS n,
       (({rss_r}) - ({rss_u})) / (({rss_u}) / (n - 3)) AS f_stat,
       (({rss_r}) - ({rss_u})) / (({rss_u}) / (n - 3))
         > CAST(3.841458820694124 AS DOUBLE) AS causal
FROM md, coef, rcoef
"""


@query("ts_granger", oracle=_granger_oracle())
def ts_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger-causality F-test: do yesterday's VIEW revenue changes
    help predict today's PURCHASE revenue changes beyond purchase's
    own lag? Unrestricted model dyB_t ~ [1, dyB_{t-1}, dyA_{t-1}]
    vs restricted dyB_t ~ [1, dyB_{t-1}]; F = (RSS_r - RSS_u) /
    (RSS_u / (n - 3)) against the 5% F(1, inf) = chi2(1) point.
    The browse-to-buy lead-lag question every marketplace asks.

    Exactness: all ten moments are exact BIGINTs over integer cents;
    the 3x3 unrestricted solve replays the fixed-order no-pivot
    elimination via _gauss_chain (ts_adf's recipe), the restricted
    2-var solve is the closed form over exact-bigint moments cast to
    double, and both RSS expressions share their text with the
    oracle — bit-exact. One daily rollup shuffle, then O(days),
    # bounded."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr(cents("value")),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("cb"),
        F.sum(
            F.when(
                F.col("event_type") == "view", F.expr(cents("value"))
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("ca"),
    )
    # bounded: O(days) daily rollup rows
    wd = Window.orderBy("day")
    lagd = daily.select(
        "day",
        (F.col("cb") - F.lag("cb", 1).over(wd)).alias("dyb"),
        (F.col("ca") - F.lag("ca", 1).over(wd)).alias("dya"),
    ).filter(F.col("dyb").isNotNull())
    # bounded: O(days) rows
    wl = Window.orderBy("day")
    reg = lagd.select(
        F.col("dyb").alias("dy"),
        F.lag("dyb", 1).over(wl).alias("yl"),
        F.lag("dya", 1).over(wl).alias("xl"),
    ).filter(F.col("yl").isNotNull() & F.col("xl").isNotNull())
    mrow = reg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("yl").cast("bigint").alias("s1"),
        F.sum("xl").cast("bigint").alias("s2"),
        F.sum(F.col("yl") * F.col("yl")).cast("bigint").alias("s11"),
        F.sum(F.col("yl") * F.col("xl")).cast("bigint").alias("s12"),
        F.sum(F.col("xl") * F.col("xl")).cast("bigint").alias("s22"),
        F.sum("dy").cast("bigint").alias("sy"),
        F.sum(F.col("yl") * F.col("dy")).cast("bigint").alias("s1y"),
        F.sum(F.col("xl") * F.col("dy")).cast("bigint").alias("s2y"),
        F.sum(F.col("dy") * F.col("dy")).cast("bigint").alias("dyy"),
    ).collect()[0]
    n = float(mrow["n"])
    s1, s2 = float(mrow["s1"]), float(mrow["s2"])
    s11, s12, s22 = (
        float(mrow["s11"]),
        float(mrow["s12"]),
        float(mrow["s22"]),
    )
    sy, s1y, s2y = float(mrow["sy"]), float(mrow["s1y"]), float(mrow["s2y"])
    dyy = float(mrow["dyy"])
    # unrestricted 3x4, fixed-order no-pivot elimination (ADF recipe)
    A = [
        [n, s1, s2, sy],
        [s1, s11, s12, s1y],
        [s2, s12, s22, s2y],
    ]
    for p in range(3):
        piv = A[p]
        for i in range(3):
            if i == p:
                continue
            f = A[i][p] / piv[p]
            A[i] = [A[i][j] - f * piv[j] for j in range(4)]
    b0 = A[0][3] / A[0][0]
    b1 = A[1][3] / A[1][1]
    b2 = A[2][3] / A[2][2]
    rss_u = (
        dyy
        - 2 * (b0 * sy + b1 * s1y + b2 * s2y)
        + (
            b0 * (b0 * n + b1 * s1 + b2 * s2)
            + b1 * (b0 * s1 + b1 * s11 + b2 * s12)
            + b2 * (b0 * s2 + b1 * s12 + b2 * s22)
        )
    )
    # restricted 2-var closed form over exact-moment doubles
    r0 = (s11 * sy - s1 * s1y) / (n * s11 - s1 * s1)
    r1 = (n * s1y - s1 * sy) / (n * s11 - s1 * s1)
    rss_r = (
        dyy
        - 2 * (r0 * sy + r1 * s1y)
        + (r0 * (r0 * n + r1 * s1) + r1 * (r0 * s1 + r1 * s11))
    )
    f_stat = (rss_r - rss_u) / (rss_u / (n - 3))
    return spark.createDataFrame(
        [(int(mrow["n"]), f_stat, f_stat > 3.841458820694124)],
        "n bigint, f_stat double, causal boolean",
    )


def _pacf_oracle(max_lag: int = 3) -> str:
    from .behavior import _gauss_chain

    # cell table: one (d, i, j, v) solve per lag d — AR(d) normal
    # equations [X'X | X'y] with X = [1, l1..ld], shared sample
    cells = []
    names = {0: "nn"}
    for i in range(1, max_lag + 1):
        names[i] = f"s{i}"
    for d in range(1, max_lag + 1):
        for i in range(d + 1):
            for j in range(d + 1):
                if i == 0 and j == 0:
                    v = "nn"
                elif i == 0:
                    v = f"s{j}"
                elif j == 0:
                    v = f"s{i}"
                else:
                    v = f"s{min(i, j)}{max(i, j)}"
                cells.append(
                    f"SELECT {d} AS d, {i} AS i, {j} AS j,"
                    f" CAST({v} AS DOUBLE) AS v FROM m"
                )
            rhs = "sy" if i == 0 else f"s{i}y"
            cells.append(
                f"SELECT {d}, {i}, {d + 1}, CAST({rhs} AS DOUBLE) FROM m"
            )
    pacf_rows = " UNION ALL ".join(
        f"""SELECT CAST({d} AS INT) AS lag,
       (SELECT v FROM gj{max_lag + 1} WHERE d = {d} AND i = {d} AND j = {d + 1})
         / (SELECT v FROM gj{max_lag + 1} WHERE d = {d} AND i = {d} AND j = {d})
         AS pacf"""
        for d in range(1, max_lag + 1)
    )
    return f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
), dz AS (
  SELECT day, c - LAG(c, 1) OVER (ORDER BY day) AS dy FROM daily
), lagged AS (
  SELECT day, dy,
         LAG(dy, 1) OVER (ORDER BY day) AS l1,
         LAG(dy, 2) OVER (ORDER BY day) AS l2,
         LAG(dy, 3) OVER (ORDER BY day) AS l3
  FROM dz WHERE dy IS NOT NULL
), smp AS (SELECT * FROM lagged WHERE l3 IS NOT NULL
), m AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS nn,
         CAST(SUM(l1) AS BIGINT) AS s1, CAST(SUM(l2) AS BIGINT) AS s2,
         CAST(SUM(l3) AS BIGINT) AS s3,
         CAST(SUM(l1 * l1) AS BIGINT) AS s11,
         CAST(SUM(l1 * l2) AS BIGINT) AS s12,
         CAST(SUM(l1 * l3) AS BIGINT) AS s13,
         CAST(SUM(l2 * l2) AS BIGINT) AS s22,
         CAST(SUM(l2 * l3) AS BIGINT) AS s23,
         CAST(SUM(l3 * l3) AS BIGINT) AS s33,
         CAST(SUM(dy) AS BIGINT) AS sy,
         CAST(SUM(l1 * dy) AS BIGINT) AS s1y,
         CAST(SUM(l2 * dy) AS BIGINT) AS s2y,
         CAST(SUM(l3 * dy) AS BIGINT) AS s3y
  FROM smp
), gj0 AS MATERIALIZED (
  {" UNION ALL ".join(cells)}
){_gauss_chain('gj0', 'd', pivots=max_lag + 1)}
{pacf_rows}
"""


@query("ts_pacf", oracle=_pacf_oracle())
def ts_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of daily revenue changes at lags 1-3
    via the REGRESSION definition: PACF(k) = the lag-k coefficient of
    the AR(k) fit [1, dy_{t-1}..dy_{t-k}] -> dy_t — what an ACF
    (ts_acf) cannot give you: the lag-k effect with the shorter lags
    PARTIALLED OUT, the standard plot for picking AR model order.
    All three fits share the common maximal sample (first three rows
    dropped) so one moment row feeds every solve.

    Exactness: the 14 regression moments are exact BIGINTs over
    integer cents; the three normal-equation solves replay the
    fixed-order no-pivot elimination in ONE keyed _gauss_chain (cell
    table keyed by solve id d — the Markov-absorption multi-solve
    recipe), with smaller matrices passing pivot rounds through
    unchanged. One daily rollup shuffle; O(days) after, # bounded."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr(cents("value"))).cast("bigint").alias("c")
    )
    # bounded: O(days) daily rollup rows
    wd = Window.orderBy("day")
    dz = daily.select(
        "day", (F.col("c") - F.lag("c", 1).over(wd)).alias("dy")
    ).filter(F.col("dy").isNotNull())
    # bounded: O(days) rows
    wl = Window.orderBy("day")
    lagged = dz.select(
        "dy",
        F.lag("dy", 1).over(wl).alias("l1"),
        F.lag("dy", 2).over(wl).alias("l2"),
        F.lag("dy", 3).over(wl).alias("l3"),
    ).filter(F.col("l3").isNotNull())
    mr = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("nn"),
        *[
            F.sum(F.col(f"l{i}")).cast("bigint").alias(f"s{i}")
            for i in (1, 2, 3)
        ],
        *[
            F.sum(F.col(f"l{i}") * F.col(f"l{j}"))
            .cast("bigint")
            .alias(f"s{i}{j}")
            for i in (1, 2, 3)
            for j in (1, 2, 3)
            if i <= j
        ],
        F.sum("dy").cast("bigint").alias("sy"),
        *[
            F.sum(F.col(f"l{i}") * F.col("dy")).cast("bigint").alias(f"s{i}y")
            for i in (1, 2, 3)
        ],
    ).collect()[0]

    def mom(i: int, j: int) -> float:
        if i == 0 and j == 0:
            return float(mr["nn"])
        if i == 0:
            return float(mr[f"s{j}"])
        if j == 0:
            return float(mr[f"s{i}"])
        return float(mr[f"s{min(i, j)}{max(i, j)}"])

    out = []
    for k in (1, 2, 3):
        A = [
            [mom(i, j) for j in range(k + 1)]
            + [float(mr["sy"]) if i == 0 else float(mr[f"s{i}y"])]
            for i in range(k + 1)
        ]
        for p in range(k + 1):
            piv = A[p]
            for i in range(k + 1):
                if i == p:
                    continue
                f = A[i][p] / piv[p]
                A[i] = [A[i][j] - f * piv[j] for j in range(k + 2)]
        out.append((k, A[k][k + 1] / A[k][k]))
    return spark.createDataFrame(out, "lag int, pacf double")


def _sharpe_oracle() -> str:
    # epoch-us day key keeps the fold ORDER BY purely integer
    return """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
), rets AS (
  SELECT day,
         CAST(c - LAG(c, 1) OVER (ORDER BY day) AS DOUBLE)
           / CAST(LAG(c, 1) OVER (ORDER BY day) AS DOUBLE) AS r
  FROM daily
), rf AS (SELECT day, r FROM rets WHERE r IS NOT NULL
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         list_sum(list(r ORDER BY day)) AS sr,
         list_sum(list(r * r ORDER BY day)) AS srr,
         list_sum(list(CASE WHEN r < 0 THEN r * r ELSE CAST(0 AS DOUBLE) END
                       ORDER BY day)) AS sdd
  FROM rf
)
SELECT n,
       (sr / n) / sqrt(srr / n - (sr / n) * (sr / n)) * sqrt(252)
         AS sharpe_annualized,
       (sr / n) / sqrt(sdd / n) * sqrt(252) AS sortino_annualized
FROM m
"""


@query("ts_sharpe", oracle=_sharpe_oracle())
def ts_sharpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annualized Sharpe and Sortino ratios of the daily revenue
    return series (zero risk-free rate; population std; sqrt(252)
    annualization — public conventions): risk-adjusted performance
    and its downside-only variant, the summary every revenue/PnL
    dashboard leads with.

    Exactness: daily cents are exact BIGINTs; each day's return is
    ONE float division of the same two integers in both engines; the
    three return moments fold the O(days) series in day order via a
    strict left fold (Spark F.aggregate over an array_sort'ed
    collect_list == DuckDB list_sum over ORDER BY list — bit-equal),
    and the ratios evaluate in the same expression order — no
    rounding anywhere. One daily rollup shuffle; O(days) after."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr(cents("value"))).cast("bigint").alias("c")
    )
    # bounded: O(days) daily rollup rows
    wd = Window.orderBy("day")
    rets = daily.select(
        "day",
        (
            (F.col("c") - F.lag("c", 1).over(wd)).cast("double")
            / F.lag("c", 1).over(wd).cast("double")
        ).alias("r"),
    ).filter(F.col("r").isNotNull())
    arr = F.array_sort(F.collect_list(F.struct("day", "r")))

    def fold(val):
        return F.aggregate(
            arr,
            F.lit(0.0),
            lambda acc, x: acc + val(x),
        )

    m = rets.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        fold(lambda x: x["r"]).alias("sr"),
        fold(lambda x: x["r"] * x["r"]).alias("srr"),
        fold(
            lambda x: F.when(x["r"] < 0, x["r"] * x["r"]).otherwise(F.lit(0.0))
        ).alias("sdd"),
    )
    mean = F.col("sr") / F.col("n")
    return m.select(
        "n",
        (
            mean
            / F.sqrt(F.col("srr") / F.col("n") - mean * mean)
            * F.sqrt(F.lit(252.0))
        ).alias("sharpe_annualized"),
        (mean / F.sqrt(F.col("sdd") / F.col("n")) * F.sqrt(F.lit(252.0))).alias(
            "sortino_annualized"
        ),
    )


_MP_WIN = 8  # matrix-profile subsequence length (days)


@query(
    "ts_matrix_profile",
    bounded_cross=(
        "O(days^2) window-pair grid over the ~2.4k-day daily rollup "
        "(~5.8M pairs), data-size-independent"
    ),
    oracle=f"""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           // 100 AS d
  FROM orders GROUP BY 1
), s AS (
  SELECT day, d,
         ROW_NUMBER() OVER (ORDER BY day) - 1 AS idx
  FROM daily
), w AS (
  SELECT a.idx AS i, a.day AS day, list(b.d ORDER BY b.idx) AS arr
  FROM s a JOIN s b ON b.idx BETWEEN a.idx AND a.idx + {_MP_WIN - 1}
  GROUP BY a.idx, a.day
  HAVING COUNT(*) = {_MP_WIN}
), p AS (
  SELECT wa.i AS i, wa.day AS day, wb.i AS j, wb.day AS nn_day,
         CAST(list_sum(list_transform(generate_series(1, {_MP_WIN}),
              k -> (wa.arr[k] - wb.arr[k]) * (wa.arr[k] - wb.arr[k])))
           AS BIGINT) AS d2
  FROM w wa JOIN w wb ON ABS(wa.i - wb.i) >= {_MP_WIN}
)
SELECT CAST(day AS TIMESTAMP) AS day,
       CAST(nn_day AS TIMESTAMP) AS nn_day,
       d2
FROM (SELECT day, nn_day, d2,
             ROW_NUMBER() OVER (PARTITION BY i ORDER BY d2, j) AS rn
      FROM p)
WHERE rn = 1
""",
)
def ts_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Euclidean matrix profile of daily revenue (window m={_MP_WIN}
    days): for every {_MP_WIN}-day window, the squared distance to
    its nearest NON-OVERLAPPING neighbor window (exclusion zone
    |i - j| >= m) and that neighbor's start day — the motif/discord
    detector (Yeh et al., ICDM 2016) in its exact-integer form: the
    series is whole DOLLARS per day (exact cents sum, then positive
    floor division — identical div///), so every window distance is
    an exact bigint both engines reproduce term by term.

    Scale shape: one data-sized groupBy produces the O(days) rollup;
    everything after — window assembly and the days^2 pair grid
    (~5.8M pairs at 2.4k days) — is bounded by the CALENDAR, not the
    data, so it runs in the driver-local exact-integer tier (r10,
    guide §4.2: the JVM crossJoin materialized ~5.8M array pairs and
    folded 8-term zip_with sums per pair, ~13 s at any SF; vectorized
    int64 numpy over the collected O(days) rollup does the identical
    arithmetic in milliseconds — same local-finish tier as ts_dtw,
    and a 100x corpus still only grows the first aggregate).
    Overflow: dollar diffs <= ~5e7 at sf0.1 -> d2 <= 8 * 2.5e15 =
    2e16; guarded against corpora where the daily max would push the
    sum past int64. Tie-break: lowest neighbor index (np.argmin's
    first-minimum = the old min(struct(d2, j)) lexicographic rule)."""
    import numpy as np

    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).alias("c"))
        .select("day", F.expr("c div 100").alias("d"))
    )
    # bounded: O(calendar days) rows, data-independent (the ts_dtw
    # local-finish contract); maxd now read from the same collect
    ser = daily.collect()
    maxd = max((abs(int(r["d"])) for r in ser), default=None)
    if maxd is None or maxd > 100_000_000:
        raise ValueError(
            "ts_matrix_profile: daily dollars exceed the int64 window-"
            "distance budget (8 * (2*max)^2) — rescale the series first"
        )
    ser.sort(key=lambda r: r["day"])
    days = [r["day"] for r in ser]
    d = np.array([int(r["d"]) for r in ser], dtype=np.int64)
    n_win = len(d) - _MP_WIN + 1
    if n_win <= 0:  # fewer days than one window: no output rows
        return spark.createDataFrame(
            [], "day timestamp, nn_day timestamp, d2 bigint"
        )
    # windows[i, k] = d[i + k] — all full _MP_WIN-day windows
    win = np.lib.stride_tricks.sliding_window_view(d, _MP_WIN).astype(
        np.int64
    )
    # exact int64 pair grid D[i, j] = sum_k (win[i,k] - win[j,k])^2,
    # evaluated in ROW CHUNKS so driver memory is O(chunk * n_win)
    # (~128 MB) instead of O(n_win^2) at long calendars (r10 ADVICE:
    # the full matrix was ~46 MB at 2.4k days but multi-GB at a
    # 100-year daily calendar). Per-row argmin is independent of the
    # chunking, so the result is bit-identical to the full grid.
    big = np.int64(2**62)
    ii = np.arange(n_win)
    nn = np.empty(n_win, dtype=np.int64)
    nnd = np.empty(n_win, dtype=np.int64)
    chunk = max(64, (1 << 24) // max(1, n_win))
    for s in range(0, n_win, chunk):
        e = min(s + chunk, n_win)
        dist = np.zeros((e - s, n_win), dtype=np.int64)
        for k in range(_MP_WIN):
            diff = win[s:e, k][:, None] - win[:, k][None, :]
            dist += diff * diff
        # exclusion zone |i - j| < _MP_WIN -> sentinel above any real d2
        dist[np.abs(ii[s:e, None] - ii[None, :]) < _MP_WIN] = big
        idx = dist.argmin(axis=1)  # first minimum = lowest j on ties
        nn[s:e] = idx
        nnd[s:e] = dist[np.arange(e - s), idx]
    rows = [
        (days[i], days[int(nn[i])], int(nnd[i]))
        for i in range(n_win)
        if nnd[i] < big  # n_win <= 2*_MP_WIN-1 edge case
    ]
    return spark.createDataFrame(
        rows, "day timestamp, nn_day timestamp, d2 bigint"
    )


_DTW_BAND = 64  # Sakoe-Chiba radius (days)
_DTW_NATIONS = ("NATION_0", "NATION_1")


@query(
    "ts_dtw",
    oracle=f"""
WITH RECURSIVE cal AS MATERIALIZED (
  SELECT day, ROW_NUMBER() OVER (ORDER BY day) - 1 AS idx
  FROM (SELECT DISTINCT date_trunc('day', o_orderdate) AS day FROM orders)
), nrev AS MATERIALIZED (
  SELECT n.n_name, date_trunc('day', o.o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           // 100 AS d
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE n.n_name IN ('{_DTW_NATIONS[0]}', '{_DTW_NATIONS[1]}')
  GROUP BY 1, 2
), ser AS MATERIALIZED (
  SELECT cal.idx,
         COALESCE(MAX(CASE WHEN nrev.n_name = '{_DTW_NATIONS[0]}'
                           THEN nrev.d END), 0) AS a,
         COALESCE(MAX(CASE WHEN nrev.n_name = '{_DTW_NATIONS[1]}'
                           THEN nrev.d END), 0) AS b
  FROM cal LEFT JOIN nrev ON nrev.day = cal.day
  GROUP BY cal.idx
), lists AS MATERIALIZED (
  SELECT list(a ORDER BY idx) AS la, list(b ORDER BY idx) AS lb,
         COUNT(*) AS t
  FROM ser
),
moves(kind, di, dj, cur) AS (
  VALUES (0, 0, 0, true), (1, 1, 0, true), (1, 0, 1, true),
         (1, 1, 1, false)
),
dp AS (
  SELECT 0 AS step, 0 AS i, 0 AS j, ABS(l.la[1] - l.lb[1]) AS g
  FROM lists l
  UNION ALL
  SELECT t.step + 1 AS step, t.ti AS i, t.tj AS j,
         CASE WHEN t.kind = 0 THEN MIN(t.g)
              ELSE MIN(t.g)
                   + ANY_VALUE(ABS(t.la[t.ti + 1] - t.lb[t.tj + 1])) END
           AS g
  FROM (
    SELECT p.step, m.kind, p.i + m.di AS ti, p.j + m.dj AS tj, p.g,
           l.la, l.lb, l.t
    FROM dp p
    JOIN moves m
      ON (m.cur AND p.i + p.j = p.step)
      OR (NOT m.cur AND p.i + p.j = p.step - 1)
    CROSS JOIN lists l
  ) t
  WHERE t.kind = 0
     OR (t.ti < t.t AND t.tj < t.t AND ABS(t.ti - t.tj) <= {_DTW_BAND})
  GROUP BY t.step, t.kind, t.ti, t.tj
)
SELECT (SELECT t FROM lists) AS n_days,
       CAST(MIN(g) AS BIGINT) AS dtw_l1,
       CAST(MIN(g) AS DOUBLE) / (2 * (SELECT t FROM lists) - 1)
         AS per_step
FROM dp
WHERE i = (SELECT t FROM lists) - 1 AND j = (SELECT t FROM lists) - 1
""",
)
def ts_dtw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic time warping (Sakoe-Chiba band, radius {_DTW_BAND}
    days) between two nations' daily-revenue series on the shared
    order calendar — the alignment-tolerant series distance exact
    correlation can't give (one nation's demand pattern LAGGING the
    other's still scores as similar). Series are whole dollars per
    day (exact cents sum, positive floor division), costs are L1, so
    the whole DP is integer arithmetic — no IEEE anywhere.

    Scale shape: the only data-sized work is the orders-to-nation
    daily rollup (keyed equi-join on custkey, broadcast nation dim);
    the banded DP is O(T * band) on the CALENDAR-bounded series
    (~2.4k days -> ~310k cells) and runs on the driver in exact
    Python ints — the local-finish tier every ts_* key uses. The
    oracle replays the identical recurrence as a recursive-CTE
    WAVEFRONT: cells on anti-diagonal d depend only on diagonals
    d-1 / d-2, so each recursion step emits one diagonal plus a
    one-step pass-through of the previous one (a cell's three
    predecessor reads become three forward CONTRIBUTIONS grouped by
    target with MIN — the single-self-reference rewrite), with costs
    read from two MATERIALIZED day-lists. Oracle cost ~8 s at sf0.1
    (2 * T recursion steps; documented naive-oracle cost, the engine
    side is O(days * band) locally). Overflow: path length <= 2T,
    per-step cost <= max daily dollars -> g <= ~5e9 at sf0.1."""
    o = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nrev = (
        o.join(cust, o["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(nat),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name").isin(*_DTW_NATIONS))
        .groupBy(
            F.date_trunc("day", "o_orderdate").alias("day"), "n_name"
        )
        .agg(F.sum(F.expr(cents("o_totalprice"))).alias("c"))
        .select("day", "n_name", F.expr("c div 100").alias("d"))
    )
    cal = o.select(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).distinct()
    ser = (
        cal.join(nrev, "day", "left")
        .groupBy("day")
        .agg(
            F.coalesce(
                F.max(
                    F.when(F.col("n_name") == _DTW_NATIONS[0], F.col("d"))
                ),
                F.lit(0),
            ).alias("a"),
            F.coalesce(
                F.max(
                    F.when(F.col("n_name") == _DTW_NATIONS[1], F.col("d"))
                ),
                F.lit(0),
            ).alias("b"),
        )
        .collect()  # bounded: O(calendar days) rows, data-independent
    )
    ser.sort(key=lambda r: r["day"])
    a = [int(r["a"]) for r in ser]
    b = [int(r["b"]) for r in ser]
    t = len(a)
    r_ = _DTW_BAND
    prev: dict = {}
    for i in range(t):
        cur: dict = {}
        for j in range(max(0, i - r_), min(t - 1, i + r_) + 1):
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                cur[j] = c
                continue
            cands = []
            if j - 1 in cur:
                cands.append(cur[j - 1])
            if j in prev:
                cands.append(prev[j])
            if j - 1 in prev:
                cands.append(prev[j - 1])
            cur[j] = c + min(cands)
        prev = cur
    dtw = prev[t - 1]
    return spark.createDataFrame(
        [(t, dtw, float(dtw) / (2 * t - 1))],
        "n_days bigint, dtw_l1 bigint, per_step double",
    )


# Seasonal candidate periods (days) and their quantized trig tables.
# math.cos/sin run ONCE here at import; both engines consume the same
# integer literals, so no libm call is inside the hash gate.
_PGRAM_PERIODS = (7, 30, 91, 365)
_PGRAM_TRIG_SCALE = 1_000_000


def _pgram_trig_rows() -> list:
    import math

    rows = []
    for p in _PGRAM_PERIODS:
        for r in range(p):
            ang = 2.0 * math.pi * r / p
            rows.append(
                (
                    p,
                    r,
                    math.floor(
                        math.cos(ang) * _PGRAM_TRIG_SCALE + 0.5
                    ),
                    math.floor(
                        math.sin(ang) * _PGRAM_TRIG_SCALE + 0.5
                    ),
                )
            )
    return rows


_PGRAM_TRIG = _pgram_trig_rows()


def _pgram_oracle() -> str:
    vals = ",".join(f"({p},{r},{cq},{sq})" for p, r, cq, sq in _PGRAM_TRIG)
    return f"""
WITH s AS MATERIALIZED (
  SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           // 100 AS x,
         ROW_NUMBER() OVER (ORDER BY date_trunc('day', o_orderdate)) - 1
           AS t
  FROM orders GROUP BY date_trunc('day', o_orderdate)
), trig(period, r, cq, sq) AS (VALUES {vals})
SELECT g.period,
       CAST(SUM(s.x * g.cq) AS BIGINT) AS sc_micro,
       CAST(SUM(s.x * g.sq) AS BIGINT) AS ss_micro,
       (CAST(CAST(SUM(s.x * g.cq) AS BIGINT) AS DOUBLE) / 1000000.0)
         * (CAST(CAST(SUM(s.x * g.cq) AS BIGINT) AS DOUBLE) / 1000000.0)
       + (CAST(CAST(SUM(s.x * g.sq) AS BIGINT) AS DOUBLE) / 1000000.0)
         * (CAST(CAST(SUM(s.x * g.sq) AS BIGINT) AS DOUBLE) / 1000000.0)
         AS power
FROM s JOIN trig g ON s.t % g.period = g.r
GROUP BY g.period
"""


@query("ts_periodogram", oracle=_pgram_oracle())
def ts_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFT power of daily revenue at the candidate seasonal periods
    (weekly/monthly/quarterly/yearly) — the seasonality detector that
    says WHICH cycle dominates, where ts_acf only says "something at
    lag k". Sc(P) = sum_t x_t cos(2 pi (t mod P)/P) and the sine
    twin, power = (Sc/1e6)^2 + (Ss/1e6)^2.

    No libm inside the gate: the trig values are quantized to 1e6
    fixed point ONCE at import (module constant) and embedded as the
    SAME integer literals in the Spark plan and the oracle SQL, so
    every data-dependent step is an exact bigint product/sum
    (dollars <= ~2.3e7 x 1e6 x 2400 days ~ 5.5e16 < 2^63) and the
    one double expression divides/squares identical integers in the
    same order. Scale shape: one data-sized groupBy to the O(days)
    rollup, a broadcast join against the 493-row literal trig table,
    and a 4-group aggregate."""
    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).alias("c"))
        .select("day", F.expr("c div 100").alias("x"))
    )
    # bounded: O(days) daily rollup rows — index assignment only
    w_idx = Window.orderBy("day")
    s = daily.withColumn("t", F.row_number().over(w_idx) - 1)
    trig = spark.createDataFrame(
        _PGRAM_TRIG, "period int, r int, cq bigint, sq bigint"
    )
    # explode the 4-element literal period array data-side so the
    # trig lookup is a two-key EQUI join (BroadcastHashJoin), not a
    # nested-loop on the modulo predicate
    exploded = s.select(
        "x",
        F.explode(
            F.array(*[F.lit(p) for p in _PGRAM_PERIODS])
        ).alias("period"),
        "t",
    ).withColumn("r", F.col("t") % F.col("period"))
    joined = exploded.join(F.broadcast(trig), ["period", "r"])
    sc = F.sum(F.col("x") * F.col("cq")).cast("bigint")
    ss = F.sum(F.col("x") * F.col("sq")).cast("bigint")
    return joined.groupBy("period").agg(
        sc.alias("sc_micro"),
        ss.alias("ss_micro"),
        (
            (sc.cast("double") / 1000000.0) * (sc.cast("double") / 1000000.0)
            + (ss.cast("double") / 1000000.0)
            * (ss.cast("double") / 1000000.0)
        ).alias("power"),
    )


def _perm_pattern_case(a: str, b: str, c: str) -> str:
    """SQL CASE assigning the Bandt-Pompe ordinal pattern of the
    triple ({a},{b},{c}) with POSITION tie-break (equal values rank
    by earlier index — the (value, index) lexicographic order), as
    the permutation string of positions sorted ascending. Pure
    integer comparisons — identical text both engines."""
    ab = f"({a} < {b} OR {a} = {b})"  # pos 0 before pos 1 on ties
    ac = f"({a} < {c} OR {a} = {c})"
    bc = f"({b} < {c} OR {b} = {c})"
    return (
        f"CASE WHEN {ab} AND {ac} AND {bc} THEN '012' "
        f"WHEN {ab} AND {ac} AND NOT {bc} THEN '021' "
        f"WHEN NOT {ab} AND {ac} AND {bc} THEN '102' "
        f"WHEN {ab} AND NOT {ac} AND NOT {bc} THEN '201' "
        f"WHEN NOT {ab} AND NOT {ac} AND {bc} THEN '120' "
        f"ELSE '210' END"
    )


@query(
    "ts_permutation_patterns",
    oracle=f"""
WITH s AS (
  SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           // 100 AS x,
         ROW_NUMBER() OVER (ORDER BY date_trunc('day', o_orderdate)) - 1
           AS t
  FROM orders GROUP BY date_trunc('day', o_orderdate)
), tr AS (
  SELECT {_perm_pattern_case('a.x', 'b.x', 'c.x')} AS pattern
  FROM s a JOIN s b ON b.t = a.t + 1 JOIN s c ON c.t = a.t + 2
), tot AS (SELECT COUNT(*) AS n FROM tr)
SELECT pattern, CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot) AS frac
FROM tr GROUP BY pattern
""",
)
def ts_permutation_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal-pattern (Bandt-Pompe, order 3) distribution of daily
    revenue: every 3-day window is reduced to the permutation of its
    value ranks (position tie-break), and the six pattern frequencies
    are the nonlinear-dynamics fingerprint — a random walk spreads
    mass evenly, trends pile onto '012'/'210', mean-reversion onto
    the zigzags ('021'/'102'/'120'/'201'). The input to permutation
    entropy, kept as exact counts (frac divides identical integers).

    Scale shape: one data-sized groupBy to the O(days) rollup, two
    calendar-index equi self-joins, a 6-group aggregate. All pattern
    logic is integer comparisons shared verbatim with the oracle."""
    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).alias("c"))
        .select("day", F.expr("c div 100").alias("x"))
    )
    # bounded: O(days) daily rollup rows — index assignment only
    w_idx = Window.orderBy("day")
    s = daily.withColumn("t", F.row_number().over(w_idx) - 1).select(
        "t", "x"
    )
    a = s.select(F.col("t").alias("t"), F.col("x").alias("xa"))
    b = s.select((F.col("t") - 1).alias("t"), F.col("x").alias("xb"))
    c = s.select((F.col("t") - 2).alias("t"), F.col("x").alias("xc"))
    tr = a.join(b, "t").join(c, "t").select(
        F.expr(_perm_pattern_case("xa", "xb", "xc")).alias("pattern")
    )
    n_tot = tr.count()
    return tr.groupBy("pattern").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        (F.count(F.lit(1)).cast("double") / F.lit(n_tot)).alias("frac"),
    )


_NW_LAGS = 5


@query(
    "ts_newey_west",
    bounded_cross="tiny cross: 5-row lag grid + 1-row moment scalar",
    oracle=f"""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           // 100 AS x
  FROM orders GROUP BY 1
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(x) AS BIGINT) AS s,
         CAST(CAST(SUM(CAST(x AS HUGEINT) * x) AS VARCHAR) AS DOUBLE)
           AS sxx
  FROM daily
), lagged AS (
  SELECT l.lag,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(CAST(SUM(CAST(a.x AS HUGEINT) * b.x) AS VARCHAR) AS DOUBLE)
           AS sxy,
         CAST(SUM(a.x) AS BIGINT) AS sh,
         CAST(SUM(b.x) AS BIGINT) AS st_
  FROM daily a
  JOIN (SELECT unnest(generate_series(1, {_NW_LAGS})) AS lag) l ON TRUE
  JOIN daily b ON b.day = a.day + l.lag * INTERVAL 1 DAY
  GROUP BY l.lag
), g AS (
  SELECT lag,
         (sxy - (CAST(s AS DOUBLE) / t) * (sh + st_)
              + n_pairs * (CAST(s AS DOUBLE) / t)
                * (CAST(s AS DOUBLE) / t)) / t AS gamma_l
  FROM lagged, m
), g0 AS (
  SELECT (sxx - 2 * (CAST(s AS DOUBLE) / t) * s
              + t * (CAST(s AS DOUBLE) / t) * (CAST(s AS DOUBLE) / t)) / t
           AS gamma0,
         t
  FROM m
)
SELECT g0.t AS n_days,
       CAST((SELECT s FROM m) AS DOUBLE) / g0.t / 100 AS mean_daily_dollars,
       sqrt(g0.gamma0 / g0.t) AS se_iid,
       sqrt((g0.gamma0
             + 2 * (SELECT SUM((1.0 - lag / {_NW_LAGS + 1}.0) * gamma_l)
                    FROM g)) / g0.t) AS se_nw,
       sqrt((g0.gamma0
             + 2 * (SELECT SUM((1.0 - lag / {_NW_LAGS + 1}.0) * gamma_l)
                    FROM g)) / g0.t) / sqrt(g0.gamma0 / g0.t)
         AS se_inflation
FROM g0
""",
)
def ts_newey_west(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newey-West (1987) HAC standard error of the mean daily
    revenue: autocorrelated days make the naive se = sqrt(gamma0/T)
    lie; the Bartlett-weighted correction gamma0 + 2 * sum_(l<=5)
    (1 - l/6) * gamma_l is what an honest uncertainty band on "mean
    daily revenue" must use. Reports both and the inflation ratio —
    the single number that says how badly iid inference would have
    overstated precision.

    Exactness: every sum is an exact integer (cross products through
    HUGEINT/decimal(38) — the ts_acf discipline); autocovariances
    use the full-sample mean with head/tail correction sums, all
    assembled in one fixed double expression per lag. Scale shape:
    one data-sized groupBy to the O(days) rollup, a calendar-shifted
    equi-join for the 5 lag pair sets (LAG would mis-pair across
    gaps), a 1-row moment scalar — same plan family as ts_acf."""
    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).alias("c"))
        .select("day", F.expr("c div 100").alias("x"))
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("t"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("double")
        .alias("sxx"),
    )
    lags = spark.range(1, _NW_LAGS + 1).select(F.col("id").alias("lag"))
    shifted = daily.crossJoin(F.broadcast(lags)).select(
        (
            F.col("day") + F.expr("make_interval(0, 0, 0, lag, 0, 0, 0)")
        ).alias("day"),
        F.col("x").alias("xa"),
        "lag",
    )
    pairs = shifted.join(
        daily.select("day", F.col("x").alias("xb")), "day"
    )
    lagged = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.col("xa").cast("decimal(38,0)") * F.col("xb"))
        .cast("double")
        .alias("sxy"),
        F.sum("xa").cast("bigint").alias("sh"),
        F.sum("xb").cast("bigint").alias("st_"),
    )
    mu = F.col("s").cast("double") / F.col("t")
    g = lagged.crossJoin(F.broadcast(m)).select(
        "lag",
        (
            (
                F.col("sxy")
                - mu * (F.col("sh") + F.col("st_"))
                + F.col("n_pairs") * mu * mu
            )
            / F.col("t")
        ).alias("gamma_l"),
    )
    nw_sum = g.agg(
        F.sum(
            (F.lit(1.0) - F.col("lag") / F.lit(float(_NW_LAGS + 1)))
            * F.col("gamma_l")
        ).alias("w_sum")
    )
    g0 = m.select(
        "t",
        "s",
        (
            (F.col("sxx") - 2 * mu * F.col("s") + F.col("t") * mu * mu)
            / F.col("t")
        ).alias("gamma0"),
    )
    out = g0.crossJoin(F.broadcast(nw_sum))
    se_iid = F.sqrt(F.col("gamma0") / F.col("t"))
    se_nw = F.sqrt(
        (F.col("gamma0") + 2 * F.col("w_sum")) / F.col("t")
    )
    return out.select(
        F.col("t").alias("n_days"),
        (F.col("s").cast("double") / F.col("t") / 100).alias(
            "mean_daily_dollars"
        ),
        se_iid.alias("se_iid"),
        se_nw.alias("se_nw"),
        (se_nw / se_iid).alias("se_inflation"),
    )


MACD_FAST = 2 / 13   # EMA(12) smoothing factor 2/(12+1)
MACD_SLOW = 2 / 27   # EMA(26) smoothing factor 2/(26+1)
MACD_SIG = 0.2       # EMA(9) smoothing factor 2/(9+1)
_OMF, _OMS, _OMG = 1 - MACD_FAST, 1 - MACD_SLOW, 1 - MACD_SIG

# A 17-significant-digit numeric literal parses as DECIMAL in DuckDB
# (int64-scaled — 1.5e16 > 2^53, so the decimal->double cast is NOT
# the correctly-rounded string parse and drifts one ULP per step).
# Routing the alpha literals through CAST('<repr>' AS DOUBLE) forces
# the same correctly-rounded parse Python's repr round-trip uses.
_AFD = f"CAST('{MACD_FAST!r}' AS DOUBLE)"
_ASD = f"CAST('{MACD_SLOW!r}' AS DOUBLE)"
_AGD = f"CAST('{MACD_SIG!r}' AS DOUBLE)"
_OMFD = f"CAST('{_OMF!r}' AS DOUBLE)"
_OMSD = f"CAST('{_OMS!r}' AS DOUBLE)"
_OMGD = f"CAST('{_OMG!r}' AS DOUBLE)"


@query(
    "ts_macd",
    oracle=f"""
WITH RECURSIVE daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
), s AS (
  SELECT CAST(day AS TIMESTAMP) AS day,
         CAST(c AS DOUBLE) / 100 AS x,
         ROW_NUMBER() OVER (ORDER BY day) AS rn
  FROM daily
), r AS (
  SELECT day, rn, x, x AS ef, x AS es,
         CAST(0.0 AS DOUBLE) AS macd, CAST(0.0 AS DOUBLE) AS sig
  FROM s WHERE rn = 1
  UNION ALL
  SELECT s.day, s.rn, s.x,
         {_AFD} * s.x + {_OMFD} * r.ef AS ef,
         {_ASD} * s.x + {_OMSD} * r.es AS es,
         ({_AFD} * s.x + {_OMFD} * r.ef)
           - ({_ASD} * s.x + {_OMSD} * r.es) AS macd,
         {_AGD} * (({_AFD} * s.x + {_OMFD} * r.ef)
                   - ({_ASD} * s.x + {_OMSD} * r.es))
           + {_OMGD} * r.sig AS sig
  FROM r JOIN s ON s.rn = r.rn + 1
)
SELECT day, x AS revenue, ef AS ema_fast, es AS ema_slow,
       macd, sig AS signal_line, macd - sig AS histogram
FROM r
""",
)
def ts_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD(12, 26, 9) of the daily order-revenue series — the
    momentum indicator every trading/metrics dashboard stacks under
    the price pane: fast EMA minus slow EMA, a signal EMA of that
    difference, and their histogram. Seeds follow the public
    convention: both EMAs start at x_1 (so macd_1 = 0) and the
    signal line starts at 0.

    Execution shape: one hash aggregate to the O(days) daily rollup
    (exact integer cents), then ONE Arrow applyInPandas strict fold
    over the day-ordered series — three floats of state, sequential
    in days but constant memory, and bounded by the calendar
    (~2.4k rows) regardless of corpus size. Hash-exactness: each
    day's input is ONE float division of the same exact integers,
    and both engines evaluate literally the same IEEE expression
    tree per step (`a*x + (1-a)*acc` with repr-round-tripped alpha
    literals); the oracle replays the identical three-accumulator
    recurrence with a recursive CTE, one step per day (the ts_holt
    pattern extended to a chained fold)."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("c"))
    )
    af, asl, asg = MACD_FAST, MACD_SLOW, MACD_SIG
    omf, oms, omg = _OMF, _OMS, _OMG

    def fold(pdf):
        pdf = pdf.sort_values("day")
        ef = es = sig = None
        out = []
        for c in pdf["c"].to_numpy():
            x = c / 100.0
            if ef is None:
                ef, es, macd, sig = x, x, 0.0, 0.0
            else:
                ef = af * x + omf * ef
                es = asl * x + oms * es
                macd = ef - es
                sig = asg * macd + omg * sig
            out.append((x, ef, es, macd, sig, macd - sig))
        import pandas as pd

        cols = pd.DataFrame(
            out,
            columns=[
                "revenue", "ema_fast", "ema_slow",
                "macd", "signal_line", "histogram",
            ],
            index=pdf.index,
        )
        return pdf[["day"]].join(cols)

    # bounded: single-key fold over the O(days) daily rollup
    return (
        daily.groupBy(F.lit(1).alias("_k"))
        .applyInPandas(
            lambda _, pdf: fold(pdf),
            "day timestamp, revenue double, ema_fast double, "
            "ema_slow double, macd double, signal_line double, "
            "histogram double",
        )
    )


@query(
    "ts_turning_points",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
), l AS (
  SELECT c,
         LAG(c) OVER (ORDER BY day) AS p,
         LEAD(c) OVER (ORDER BY day) AS nx
  FROM daily
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN p IS NOT NULL AND nx IS NOT NULL
                        AND ((c > p AND c > nx) OR (c < p AND c < nx))
                       THEN 1 ELSE 0 END) AS BIGINT) AS tp
  FROM l
)
SELECT n AS n_days,
       tp AS n_turning,
       CAST(2 * (n - 2) AS DOUBLE) / 3 AS expected,
       CAST(16 * n - 29 AS DOUBLE) / 90 AS variance,
       (CAST(tp AS DOUBLE) - CAST(2 * (n - 2) AS DOUBLE) / 3)
         / sqrt(CAST(16 * n - 29 AS DOUBLE) / 90) AS z_score
FROM t
""",
)
def ts_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-points test for randomness of the daily-revenue series
    (Kendall's phase count): an interior day is a turning point when
    it is a strict local max or min; under IID the count is
    asymptotically N(2(n-2)/3, (16n-29)/90), so the z-score flags
    serial dependence — the nonparametric cousin of agg_runs_test
    (signs vs a level) applied to the series' SHAPE.

    Exactness: peak/trough flags are pure integer comparisons on
    exact daily cents (strict inequalities — tied neighbours are not
    turning points, identically in both engines); the count is an
    exact bigint and the three floats are fixed expressions over
    (n, tp). Scale shape: one hash aggregate to the O(days) rollup,
    one bounded window pass, a 1-row aggregate."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("c"))
    )
    # bounded: O(days) daily rollup rows
    w = Window.orderBy("day")
    lagged = daily.select(
        "c",
        F.lag("c").over(w).alias("p"),
        F.lead("c").over(w).alias("nx"),
    )
    is_tp = (
        F.col("p").isNotNull()
        & F.col("nx").isNotNull()
        & (
            ((F.col("c") > F.col("p")) & (F.col("c") > F.col("nx")))
            | ((F.col("c") < F.col("p")) & (F.col("c") < F.col("nx")))
        )
    )
    t = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(is_tp, 1).otherwise(0)).cast("bigint").alias("tp"),
    )
    expected = (2 * (F.col("n") - 2)).cast("double") / F.lit(3)
    variance = (16 * F.col("n") - 29).cast("double") / F.lit(90)
    return t.select(
        F.col("n").alias("n_days"),
        F.col("tp").alias("n_turning"),
        expected.alias("expected"),
        variance.alias("variance"),
        ((F.col("tp").cast("double") - expected) / F.sqrt(variance)).alias(
            "z_score"
        ),
    )


@query(
    "ts_control_chart",
    bounded_cross=(
        "1-row control-limit scalar onto the O(days) daily rollup"
    ),
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
), l AS (
  SELECT day, c, ABS(c - LAG(c) OVER (ORDER BY day)) AS mr
  FROM daily
), lim AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS DOUBLE) / 100 / COUNT(*) AS center,
         CAST(SUM(mr) AS DOUBLE) / (COUNT(*) - 1) / 100 AS mr_bar
  FROM l
), lim2 AS (
  SELECT n, center, mr_bar,
         center + 2.66 * mr_bar AS ucl,
         center - 2.66 * mr_bar AS lcl
  FROM lim
)
SELECT lim2.n AS n_days,
       lim2.center AS center_dollars,
       lim2.mr_bar AS mr_bar_dollars,
       lim2.ucl AS ucl_dollars,
       lim2.lcl AS lcl_dollars,
       CAST(SUM(CASE WHEN CAST(l.c AS DOUBLE) / 100 > lim2.ucl
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_above_ucl,
       CAST(SUM(CASE WHEN CAST(l.c AS DOUBLE) / 100 < lim2.lcl
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_below_lcl
FROM l, lim2
GROUP BY 1, 2, 3, 4, 5
""",
)
def ts_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart individuals/moving-range (I-MR) control chart of
    daily revenue: center line, MR-bar, the 3-sigma-equivalent
    control limits center ± 2.66*MR-bar (2.66 = 3/d2(2), the public
    SPC constant for n=2 moving ranges), and the out-of-control day
    counts — the monitoring chart ops teams run on any KPI, and the
    chart-limits complement of the sequential detectors
    (ts_cusum_drift, ts_page_hinkley).

    Exactness: daily values and moving ranges are exact integer
    cents (|c - prev| stays integer, so the MR sum is
    order-independent); center and MR-bar are single float divisions
    of those integers; the violation comparisons see bit-identical
    doubles in both engines. Scale shape: one hash aggregate to the
    O(days) rollup, one bounded window pass, a declared 1-row limit
    scalar cross, a 1-row count."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("c"))
    )
    # bounded: O(days) daily rollup rows
    w = Window.orderBy("day")
    lagged = daily.select(
        "day", "c", F.abs(F.col("c") - F.lag("c").over(w)).alias("mr")
    )
    lim = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.sum("c").cast("double") / F.lit(100) / F.count(F.lit(1))
        ).alias("center"),
        (
            F.sum("mr").cast("double")
            / (F.count(F.lit(1)) - F.lit(1))
            / F.lit(100)
        ).alias("mr_bar"),
    ).select(
        "n",
        "center",
        "mr_bar",
        (F.col("center") + F.lit(2.66) * F.col("mr_bar")).alias("ucl"),
        (F.col("center") - F.lit(2.66) * F.col("mr_bar")).alias("lcl"),
    )
    # bounded: 1-row limit scalar onto the O(days) frame
    joined = lagged.crossJoin(F.broadcast(lim))
    x = F.col("c").cast("double") / F.lit(100)
    return joined.groupBy(
        "n", "center", "mr_bar", "ucl", "lcl"
    ).agg(
        F.sum(F.when(x > F.col("ucl"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_above_ucl"),
        F.sum(F.when(x < F.col("lcl"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_below_lcl"),
    ).select(
        F.col("n").alias("n_days"),
        F.col("center").alias("center_dollars"),
        F.col("mr_bar").alias("mr_bar_dollars"),
        F.col("ucl").alias("ucl_dollars"),
        F.col("lcl").alias("lcl_dollars"),
        "n_above_ucl",
        "n_below_lcl",
    )


KALMAN_Q = 1e8   # process-noise variance (dollars^2)
KALMAN_R = 1e10  # observation-noise variance (dollars^2)


@query(
    "ts_kalman_level",
    oracle=f"""
WITH RECURSIVE daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
), s AS (
  SELECT CAST(day AS TIMESTAMP) AS day,
         CAST(c AS DOUBLE) / 100 AS z,
         ROW_NUMBER() OVER (ORDER BY day) AS rn
  FROM daily
), r AS (
  SELECT day, rn, z, z AS x, CAST({KALMAN_R!r} AS DOUBLE) AS p,
         CAST(0.0 AS DOUBLE) AS k
  FROM s WHERE rn = 1
  UNION ALL
  SELECT s.day, s.rn, s.z,
         r.x + ((r.p + {KALMAN_Q!r}) / ((r.p + {KALMAN_Q!r}) + {KALMAN_R!r}))
               * (s.z - r.x) AS x,
         (1.0 - ((r.p + {KALMAN_Q!r}) / ((r.p + {KALMAN_Q!r}) + {KALMAN_R!r})))
           * (r.p + {KALMAN_Q!r}) AS p,
         ((r.p + {KALMAN_Q!r}) / ((r.p + {KALMAN_Q!r}) + {KALMAN_R!r})) AS k
  FROM r JOIN s ON s.rn = r.rn + 1
)
SELECT day, z AS observed, x AS level, p AS p_var, k AS gain
FROM r
""",
)
def ts_kalman_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-level (random-walk-plus-noise) Kalman filter over daily
    revenue: the optimal recursive smoother whose gain ADAPTS from
    the posterior variance — the principled cousin of the
    fixed-alpha smoothers (ts_ewma converges to the steady-state
    gain; this key exposes the transient and the variance track).
    Seeds x_1 = z_1, P_1 = R (gain reported 0 for the seed row);
    per step: P+Q -> K = (P+Q)/(P+Q+R) -> x += K(z-x) ->
    P = (1-K)(P+Q), with public fixed Q/R literals.

    Execution contract identical to ts_macd: one hash aggregate to
    the O(days) rollup, one Arrow strict fold with two floats of
    state, calendar-bounded. Both engines evaluate literally the
    same IEEE expression tree per step (the gain subexpression is
    recomputed identically where reused), so the recursive-CTE
    replay is bit-exact."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("c"))
    )
    q, rv = KALMAN_Q, KALMAN_R

    def fold(pdf):
        pdf = pdf.sort_values("day")
        x = p = None
        out = []
        for c in pdf["c"].to_numpy():
            z = c / 100.0
            if x is None:
                x, p, k = z, rv, 0.0
            else:
                pp = p + q
                k = pp / (pp + rv)
                x = x + k * (z - x)
                p = (1.0 - k) * pp
            out.append((z, x, p, k))
        import pandas as pd

        cols = pd.DataFrame(
            out,
            columns=["observed", "level", "p_var", "gain"],
            index=pdf.index,
        )
        return pdf[["day"]].join(cols)

    # bounded: single-key fold over the O(days) daily rollup
    return daily.groupBy(F.lit(1).alias("_k")).applyInPandas(
        lambda _, pdf: fold(pdf),
        "day timestamp, observed double, level double, p_var double, "
        "gain double",
    )


SAMPEN_M = 2        # template length
SAMPEN_R_FRAC = 0.2  # tolerance as a fraction of the series std


@query(
    "ts_sample_entropy",
    bounded_cross=(
        "O(days^2) template-pair grid over the ~2.4k-day daily "
        "rollup (~2.9M pairs), data-size-independent"
    ),
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s,
         CAST(CAST(SUM(CAST(c AS HUGEINT) * c) AS VARCHAR) AS DOUBLE) AS ss
  FROM daily
), th AS (
  SELECT n,
         CAST(FLOOR(0.2 * sqrt((ss - (CAST(s AS DOUBLE) / n) * s) / (n - 1))
                    + 0.5) AS BIGINT) AS thr
  FROM m
), t AS (
  SELECT ROW_NUMBER() OVER (ORDER BY day) AS i, c AS a0,
         LEAD(c, 1) OVER (ORDER BY day) AS a1,
         LEAD(c, 2) OVER (ORDER BY day) AS a2
  FROM daily QUALIFY a2 IS NOT NULL
), cnt AS (
  SELECT
    CAST(SUM(CASE WHEN GREATEST(ABS(a.a0 - b.a0), ABS(a.a1 - b.a1))
                       <= (SELECT thr FROM th) THEN 1 ELSE 0 END) AS BIGINT)
      AS b_count,
    CAST(SUM(CASE WHEN GREATEST(ABS(a.a0 - b.a0), ABS(a.a1 - b.a1),
                                ABS(a.a2 - b.a2))
                       <= (SELECT thr FROM th) THEN 1 ELSE 0 END) AS BIGINT)
      AS a_count
  FROM t a JOIN t b ON a.i < b.i
)
SELECT (SELECT n FROM th) AS n_days,
       (SELECT thr FROM th) AS thr_cents,
       b_count, a_count,
       CAST(a_count AS DOUBLE) / b_count AS ratio,
       CASE WHEN a_count > 0 AND b_count > 0
            THEN -CAST(FLOOR(LN(CAST(a_count AS DOUBLE) / b_count) * 1000000
                             + 0.5) AS BIGINT) / 1e6
            ELSE NULL END AS sampen
FROM cnt
""",
)
def ts_sample_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample entropy (Richman–Moorman, m=2, r=0.2*sd, Chebyshev) of
    the daily-revenue series: -ln(A/B) where B counts template pairs
    of length m within tolerance and A the same at m+1 — the
    regularity measure physiology/anomaly pipelines run on any KPI
    stream; low SampEn = self-similar/regular, high = irregular.
    Complements ts_permutation_patterns (ordinal shape) and
    ts_hurst_rs (long-range memory) with template-matching
    regularity.

    Exactness: templates and Chebyshev distances are exact integer
    cents; the tolerance is quantized ONCE via FLOOR(0.2*sd + 0.5)
    from exact moments (both engines see identical doubles under
    sqrt); A and B are exact integer pair counts; the final ln is
    quantized at 1e-6 (the corpus_heaps_law discipline) so the
    statistic carries no raw-libm bit in the hash gate. Scale shape:
    one hash aggregate to the O(days) rollup, one bounded window
    pass, then a DECLARED calendar-bounded days^2 pair grid
    (~2.9M integer comparisons — the ts_matrix_profile budget),
    one 1-row aggregate."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("c"))
    )
    mrow = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("double")
        .alias("ss"),
    ).collect()[0]
    n, s, ss = int(mrow["n"]), int(mrow["s"]), float(mrow["ss"])
    import math as _m

    sd = _m.sqrt((ss - (float(s) / n) * s) / (n - 1))
    thr = int(_m.floor(SAMPEN_R_FRAC * sd + 0.5))

    # bounded: O(days) daily rollup rows
    w = Window.orderBy("day")
    t = (
        daily.select(
            F.row_number().over(w).alias("i"),
            F.col("c").alias("a0"),
            F.lead("c", 1).over(w).alias("a1"),
            F.lead("c", 2).over(w).alias("a2"),
        )
        .filter(F.col("a2").isNotNull())
    )
    a = t.select(
        F.col("i").alias("ia"), F.col("a0").alias("x0"),
        F.col("a1").alias("x1"), F.col("a2").alias("x2"),
    )
    b = t.select(
        F.col("i").alias("ib"), F.col("a0").alias("y0"),
        F.col("a1").alias("y1"), F.col("a2").alias("y2"),
    )
    # bounded: days^2 template-pair grid (declared)
    pairs = a.join(F.broadcast(b), F.col("ia") < F.col("ib"))
    d2 = F.greatest(
        F.abs(F.col("x0") - F.col("y0")), F.abs(F.col("x1") - F.col("y1"))
    )
    d3 = F.greatest(
        F.abs(F.col("x0") - F.col("y0")),
        F.abs(F.col("x1") - F.col("y1")),
        F.abs(F.col("x2") - F.col("y2")),
    )
    cnt = pairs.agg(
        F.sum(F.when(d2 <= F.lit(thr), 1).otherwise(0))
        .cast("bigint")
        .alias("b_count"),
        F.sum(F.when(d3 <= F.lit(thr), 1).otherwise(0))
        .cast("bigint")
        .alias("a_count"),
    )
    ratio = F.col("a_count").cast("double") / F.col("b_count")
    return cnt.select(
        F.lit(n).cast("bigint").alias("n_days"),
        F.lit(thr).cast("bigint").alias("thr_cents"),
        "b_count",
        "a_count",
        ratio.alias("ratio"),
        F.when(
            (F.col("a_count") > 0) & (F.col("b_count") > 0),
            -F.floor(
                F.log(F.col("a_count").cast("double") / F.col("b_count"))
                * F.lit(1000000)
                + F.lit(0.5)
            ).cast("bigint")
            / F.lit(1e6),
        ).alias("sampen"),
    )


CCF_MAX_LAG = 7
CCF_X_TYPE, CCF_Y_TYPE = "click", "purchase"


@query(
    "ts_ccf",
    bounded_cross="15-row lag grid + two 1-row moment scalars",
    oracle=f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1992-01-01',
                   CAST(date_trunc('day', ts) AS DATE)) AS dd,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events
  WHERE event_type IN ('{CCF_X_TYPE}', '{CCF_Y_TYPE}')
  GROUP BY 1, 2
), dx AS (SELECT dd, c FROM daily WHERE event_type = '{CCF_X_TYPE}'),
dy AS (SELECT dd, c FROM daily WHERE event_type = '{CCF_Y_TYPE}'),
mx AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s,
         CAST(CAST(SUM(CAST(c AS HUGEINT) * c) AS VARCHAR) AS DOUBLE) AS ss
  FROM dx
), my AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s,
         CAST(CAST(SUM(CAST(c AS HUGEINT) * c) AS VARCHAR) AS DOUBLE) AS ss
  FROM dy
), lagged AS (
  SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS m,
         CAST(CAST(SUM(CAST(dx.c AS HUGEINT) * dy.c) AS VARCHAR) AS DOUBLE)
           AS sxy
  FROM (SELECT unnest(generate_series(-{CCF_MAX_LAG}, {CCF_MAX_LAG})) AS lag) l
  JOIN dx ON TRUE
  JOIN dy ON dy.dd = dx.dd + l.lag
  GROUP BY 1
)
SELECT lag, m AS n_pairs,
       (sxy - m * (CAST(mx.s AS DOUBLE) / mx.n)
                * (CAST(my.s AS DOUBLE) / my.n))
         / sqrt((mx.ss - mx.n * (CAST(mx.s AS DOUBLE) / mx.n)
                              * (CAST(mx.s AS DOUBLE) / mx.n))
                * (my.ss - my.n * (CAST(my.s AS DOUBLE) / my.n)
                                * (CAST(my.s AS DOUBLE) / my.n))) AS ccf
FROM lagged, mx, my
""",
)
def ts_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between the daily '{CCF_X_TYPE}'
    and '{CCF_Y_TYPE}' revenue series at lags -7..+7 (does click
    volume LEAD purchase volume, and by how many days?) — the
    lead-lag detector behind every marketing-mix / conversion-delay
    analysis; the two-series companion of ts_acf, normalized by the
    full-series variances so r_0 is the plain Pearson correlation.

    Exactness: daily sums, counts and all cross/self second moments
    are exact integers (HUGEINT/decimal(38) for the products); each
    r_k is ONE fixed double expression over those integers. Scale
    shape: one hash aggregate to the 2 x O(days) rollup, an integer
    epoch-day equi-join per lag against the DECLARED 15-row lag
    grid, two 1-row moment scalars crossed on."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin(CCF_X_TYPE, CCF_Y_TYPE)
    )
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("1992-01-01")
        ).alias("dd"),
    ).agg(F.sum(F.expr(cents("value"))).cast("bigint").alias("c"))
    dx = daily.filter(F.col("event_type") == CCF_X_TYPE).select("dd", "c")
    dy = daily.filter(F.col("event_type") == CCF_Y_TYPE).select(
        F.col("dd").alias("dd_y"), F.col("c").alias("cy")
    )

    def moments(df, ccol):
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(ccol).cast("bigint").alias("s"),
            F.sum(F.col(ccol).cast("decimal(38,0)") * F.col(ccol))
            .cast("double")
            .alias("ss"),
        )

    mx = moments(dx, "c").select(
        F.col("n").alias("nx"), F.col("s").alias("sx"), F.col("ss").alias("ssx")
    )
    my = moments(dy.select(F.col("cy").alias("c")), "c").select(
        F.col("n").alias("ny"), F.col("s").alias("sy"), F.col("ss").alias("ssy")
    )
    grid = spark.createDataFrame(
        [(k,) for k in range(-CCF_MAX_LAG, CCF_MAX_LAG + 1)], "lag int"
    )
    # bounded: 15-row lag grid replicated over the O(days) series
    lagged = (
        dx.crossJoin(F.broadcast(grid))
        .join(
            dy,
            F.col("dd_y") == F.col("dd") + F.col("lag"),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("m"),
            F.sum(F.col("c").cast("decimal(38,0)") * F.col("cy"))
            .cast("double")
            .alias("sxy"),
        )
    )
    # bounded: two 1-row moment scalars
    j = lagged.crossJoin(F.broadcast(mx)).crossJoin(F.broadcast(my))
    mux = F.col("sx").cast("double") / F.col("nx")
    muy = F.col("sy").cast("double") / F.col("ny")
    return j.select(
        "lag",
        F.col("m").alias("n_pairs"),
        (
            (F.col("sxy") - F.col("m") * mux * muy)
            / F.sqrt(
                (F.col("ssx") - F.col("nx") * mux * mux)
                * (F.col("ssy") - F.col("ny") * muy * muy)
            )
        ).alias("ccf"),
    )


HAAR_N = 1024      # power-of-two analysis window (first 1024 days)
HAAR_LEVELS = 10   # log2(HAAR_N)


@query(
    "ts_haar_energy",
    bounded_cross="10-row level grid replicated over the bounded window",
    oracle=f"""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
), idx AS (
  SELECT ROW_NUMBER() OVER (ORDER BY day) - 1 AS i, c
  FROM daily QUALIFY i < {HAAR_N}
), grid AS (
  SELECT l, CAST(1 << l AS BIGINT) AS bs, CAST(1 << (l - 1) AS BIGINT) AS hs
  FROM unnest(generate_series(1, {HAAR_LEVELS})) t(l)
), coeff AS (
  SELECT g.l, idx.i // g.bs AS k,
         CAST(SUM(CASE WHEN (idx.i // g.hs) % 2 = 0 THEN idx.c
                       ELSE -idx.c END) AS BIGINT) AS d
  FROM idx, grid g
  GROUP BY 1, 2
)
SELECT CAST(l AS INTEGER) AS level,
       CAST(COUNT(*) AS BIGINT) AS n_coeffs,
       CAST(CAST(SUM(CAST(d AS HUGEINT) * d) AS VARCHAR) AS DOUBLE)
         AS energy,
       CAST(CAST(SUM(CAST(d AS HUGEINT) * d) AS VARCHAR) AS DOUBLE)
         / CAST(1 << l AS BIGINT) AS power
FROM coeff
GROUP BY l
""",
)
def ts_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnormalized Haar wavelet energy spectrum of the first
    {HAAR_N} days of daily revenue: at level l the detail
    coefficient of block k is (sum of the block's first half) -
    (sum of its second half); energy_l = sum_k d^2 and power_l =
    energy_l / 2^l satisfy the exact Parseval identity
    sum_l power_l + (sum x)^2/N = sum x^2 — the multi-resolution
    variance decomposition (which TIMESCALE carries the volatility?)
    that ts_periodogram answers for fixed frequencies and this
    answers for dyadic scales.

    Exactness: every coefficient is an exact bigint signed sum of
    daily cents (level-10 magnitude ~9e13 at a 100x corpus — inside
    int64); energies go through HUGEINT/decimal(38). Scale shape:
    one hash aggregate to the O(days) rollup, a DECLARED 10-row
    level-grid replication (10x the bounded window — the grouping-
    sets shape), ONE hash aggregate per (level, block), a 10-row
    reduction."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("c"))
    )
    # bounded: O(days) daily rollup rows
    w = Window.orderBy("day")
    idx = daily.select(
        (F.row_number().over(w) - 1).alias("i"), "c"
    ).filter(F.col("i") < HAAR_N)
    grid = spark.createDataFrame(
        [(l, 1 << l, 1 << (l - 1)) for l in range(1, HAAR_LEVELS + 1)],
        "l int, bs bigint, hs bigint",
    )
    # bounded: 10-row level grid over the <=1024-row window
    coeff = (
        idx.crossJoin(F.broadcast(grid))
        .groupBy("l", F.expr("i div bs").alias("k"))
        .agg(
            F.sum(
                F.when(F.expr("(i div hs) % 2") == 0, F.col("c")).otherwise(
                    -F.col("c")
                )
            )
            .cast("bigint")
            .alias("d")
        )
    )
    return (
        coeff.groupBy("l")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_coeffs"),
            F.sum(F.col("d").cast("decimal(38,0)") * F.col("d"))
            .cast("double")
            .alias("energy"),
        )
        .select(
            F.col("l").cast("int").alias("level"),
            "n_coeffs",
            "energy",
            (F.col("energy") / F.expr("CAST(1 << l AS BIGINT)")).alias(
                "power"
            ),
        )
    )


@query(
    "ts_bass_diffusion",
    oracle="""
WITH s AS (
  SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS st
  FROM events WHERE event_type = 'signup' GROUP BY 1
), cum AS (
  SELECT day, st,
         COALESCE(SUM(st) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nprev
  FROM s
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m0,
         CAST(SUM(nprev) AS BIGINT) AS m1,
         CAST(SUM(nprev * nprev) AS BIGINT) AS m2,
         CAST(CAST(SUM(CAST(nprev AS HUGEINT) * nprev * nprev) AS VARCHAR)
              AS DOUBLE) AS m3,
         CAST(CAST(SUM(CAST(nprev AS HUGEINT) * nprev * nprev * nprev)
              AS VARCHAR) AS DOUBLE) AS m4,
         CAST(SUM(st) AS BIGINT) AS sy,
         CAST(SUM(st * nprev) AS BIGINT) AS sy1,
         CAST(CAST(SUM(CAST(st AS HUGEINT) * nprev * nprev) AS VARCHAR)
              AS DOUBLE) AS sy2
  FROM cum
), d AS (
  SELECT CAST(m0 AS DOUBLE) AS m0, CAST(m1 AS DOUBLE) AS m1,
         CAST(m2 AS DOUBLE) AS m2, m3, m4,
         CAST(sy AS DOUBLE) AS sy, CAST(sy1 AS DOUBLE) AS sy1, sy2
  FROM m
), sol AS (
  SELECT m0,
    (m0 * (m2 * m4 - m3 * m3) - m1 * (m1 * m4 - m3 * m2)
       + m2 * (m1 * m3 - m2 * m2)) AS det,
    (sy * (m2 * m4 - m3 * m3) - m1 * (sy1 * m4 - m3 * sy2)
       + m2 * (sy1 * m3 - m2 * sy2)) AS da,
    (m0 * (sy1 * m4 - sy2 * m3) - sy * (m1 * m4 - m3 * m2)
       + m2 * (m1 * sy2 - m2 * sy1)) AS db,
    (m0 * (m2 * sy2 - m3 * sy1) - m1 * (m1 * sy2 - sy1 * m2)
       + sy * (m1 * m3 - m2 * m2)) AS dc
  FROM d
), co AS (
  SELECT m0, da / det AS a, db / det AS b, dc / det AS c FROM sol
)
SELECT CAST(m0 AS BIGINT) AS n_days, a AS coef_a, b AS coef_b, c AS coef_c,
       CASE WHEN b * b - 4 * a * c >= 0 AND c < 0
            THEN (-b - sqrt(b * b - 4 * a * c)) / (2 * c) END AS market_m,
       CASE WHEN b * b - 4 * a * c >= 0 AND c < 0
            THEN a / ((-b - sqrt(b * b - 4 * a * c)) / (2 * c)) END
         AS p_innovation,
       CASE WHEN b * b - 4 * a * c >= 0 AND c < 0
            THEN b + a / ((-b - sqrt(b * b - 4 * a * c)) / (2 * c)) END
         AS q_imitation
FROM co
""",
)
def ts_bass_diffusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bass diffusion model of the signup adoption curve via the
    classic discrete-time regression (Bass 1969): daily adopters
    S_t = a + b*N_{t-1} + c*N_{t-1}^2 over the observed signup-day
    series, then the structural parameters m (market size), p
    (innovation) and q (imitation) from the quadratic's roots
    (NULL when the fit is not S-shaped: discriminant < 0 or c >= 0,
    the honest answer on a stationary adoption series — identical
    double comparisons gate both engines) —
    the growth-curve fit every product/marketing forecast starts
    from, complementing ts_holt (trend) and agg_growth_accounting
    (composition).

    Exactness: the cumulative-adopter regressors and all OLS
    moments up to N^4 are exact integers (HUGEINT/decimal(38) for
    the cubic/quartic sums — ~4e28 at a 100x corpus, inside 38
    digits); the 3x3 normal equations are solved in CLOSED FORM
    (Cramer expansions written in identical expression order in
    both engines — no iterative solver), and (m, p, q) are fixed
    double expressions of (a, b, c). Scale shape: one hash
    aggregate to the O(days) series, one bounded running-total
    window, a 1-row moment reduction."""
    s = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("st"))
    )
    # bounded: O(days) signup-day rollup rows
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    cum = s.select(
        "st", F.coalesce(F.sum("st").over(w), F.lit(0)).alias("nprev")
    )
    np_ = F.col("nprev")
    m = cum.agg(
        F.count(F.lit(1)).cast("bigint").alias("m0i"),
        F.sum(np_).cast("bigint").alias("m1i"),
        F.sum(np_ * np_).cast("bigint").alias("m2i"),
        F.sum(np_.cast("decimal(38,0)") * np_ * np_).cast("double").alias("m3"),
        F.sum(np_.cast("decimal(38,0)") * np_ * np_ * np_)
        .cast("double")
        .alias("m4"),
        F.sum("st").cast("bigint").alias("syi"),
        F.sum(F.col("st") * np_).cast("bigint").alias("sy1i"),
        F.sum(F.col("st").cast("decimal(38,0)") * np_ * np_)
        .cast("double")
        .alias("sy2"),
    )
    d = m.select(
        F.col("m0i").alias("n_days"),
        F.col("m0i").cast("double").alias("m0"),
        F.col("m1i").cast("double").alias("m1"),
        F.col("m2i").cast("double").alias("m2"),
        "m3",
        "m4",
        F.col("syi").cast("double").alias("sy"),
        F.col("sy1i").cast("double").alias("sy1"),
        "sy2",
    )
    m0, m1, m2 = F.col("m0"), F.col("m1"), F.col("m2")
    m3, m4 = F.col("m3"), F.col("m4")
    sy, sy1, sy2 = F.col("sy"), F.col("sy1"), F.col("sy2")
    det = (
        m0 * (m2 * m4 - m3 * m3)
        - m1 * (m1 * m4 - m3 * m2)
        + m2 * (m1 * m3 - m2 * m2)
    )
    da = (
        sy * (m2 * m4 - m3 * m3)
        - m1 * (sy1 * m4 - m3 * sy2)
        + m2 * (sy1 * m3 - m2 * sy2)
    )
    db = (
        m0 * (sy1 * m4 - sy2 * m3)
        - sy * (m1 * m4 - m3 * m2)
        + m2 * (m1 * sy2 - m2 * sy1)
    )
    dc = (
        m0 * (m2 * sy2 - m3 * sy1)
        - m1 * (m1 * sy2 - sy1 * m2)
        + sy * (m1 * m3 - m2 * m2)
    )
    co = d.select(
        "n_days",
        (da / det).alias("a"),
        (db / det).alias("b"),
        (dc / det).alias("c"),
    )
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    ok = (b * b - 4 * a * c >= 0) & (c < 0)
    mm = (-b - F.sqrt(b * b - 4 * a * c)) / (2 * c)
    return co.select(
        "n_days",
        a.alias("coef_a"),
        b.alias("coef_b"),
        c.alias("coef_c"),
        F.when(ok, mm).alias("market_m"),
        F.when(ok, a / mm).alias("p_innovation"),
        F.when(ok, b + a / mm).alias("q_imitation"),
    )


@query(
    "ts_seasonal_mase",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
), l AS (
  SELECT c,
         LAG(c, 1) OVER (ORDER BY day) AS p1,
         LAG(c, 7) OVER (ORDER BY day) AS p7
  FROM daily
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN p1 IS NOT NULL THEN ABS(c - p1) END) AS BIGINT)
           AS s1,
         CAST(SUM(CASE WHEN p1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n1,
         CAST(SUM(CASE WHEN p7 IS NOT NULL THEN ABS(c - p7) END) AS BIGINT)
           AS s7,
         CAST(SUM(CASE WHEN p7 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n7
  FROM l
)
SELECT n AS n_days,
       CAST(s7 AS DOUBLE) / n7 / 100 AS mae_seasonal_dollars,
       CAST(s1 AS DOUBLE) / n1 / 100 AS mae_naive_dollars,
       (CAST(s7 AS DOUBLE) / n7) / (CAST(s1 AS DOUBLE) / n1) AS mase
FROM m
""",
)
def ts_seasonal_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE of the weekly seasonal-naive forecast (x_hat_t = x_{t-7})
    scaled by the one-step naive benchmark (Hyndman-Koehler 2006) —
    the scale-free forecast-accuracy number that lets revenue series
    of different magnitudes share one dashboard; < 1 means weekly
    seasonality carries real signal beyond persistence.
    Complements ts_forecast_eval (which scores a fitted model; this
    scores the BENCHMARKS that any model must beat).

    Exactness: both absolute-error sums are exact integer cents
    (|c - lag| stays integer, order-free distributed sums); the
    three ratios are fixed double expressions. Scale shape: one hash
    aggregate to the O(days) rollup, one bounded window pass, a
    1-row reduction."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("c"))
    )
    # bounded: O(days) daily rollup rows
    w = Window.orderBy("day")
    lagged = daily.select(
        "c",
        F.lag("c", 1).over(w).alias("p1"),
        F.lag("c", 7).over(w).alias("p7"),
    )
    m = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(F.col("p1").isNotNull(), F.abs(F.col("c") - F.col("p1")))
        )
        .cast("bigint")
        .alias("s1"),
        F.sum(F.when(F.col("p1").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(
            F.when(F.col("p7").isNotNull(), F.abs(F.col("c") - F.col("p7")))
        )
        .cast("bigint")
        .alias("s7"),
        F.sum(F.when(F.col("p7").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n7"),
    )
    mae7 = F.col("s7").cast("double") / F.col("n7")
    mae1 = F.col("s1").cast("double") / F.col("n1")
    return m.select(
        F.col("n").alias("n_days"),
        (mae7 / 100).alias("mae_seasonal_dollars"),
        (mae1 / 100).alias("mae_naive_dollars"),
        (mae7 / mae1).alias("mase"),
    )


def _bseg_score() -> str:
    """Shared split-score text: |mean_left - mean_right| * n1*n2/n."""
    return (
        "abs(CAST(cs AS DOUBLE) / i - CAST(tot - cs AS DOUBLE) / (n - i))"
        " * i * (n - i) / n"
    )


@query(
    "ts_binary_segmentation",
    oracle=f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
), cum AS (
  SELECT day, c,
         CAST(SUM(c) OVER (ORDER BY day) AS BIGINT) AS cs,
         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
         (SELECT CAST(SUM(c) AS BIGINT) FROM daily) AS tot,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n
  FROM cum_base
), cum_base AS (SELECT day, c FROM daily),
s1 AS (
  SELECT day FROM cum WHERE i < n
  ORDER BY {_bseg_score()} DESC, day LIMIT 1
), halves AS (
  SELECT d.day, d.c,
         CASE WHEN d.day <= (SELECT day FROM s1) THEN 0 ELSE 1 END AS side
  FROM daily d
), hcum AS (
  SELECT side, day,
         CAST(SUM(c) OVER (PARTITION BY side ORDER BY day) AS BIGINT) AS cs,
         CAST(ROW_NUMBER() OVER (PARTITION BY side ORDER BY day) AS BIGINT)
           AS i,
         CAST(SUM(c) OVER (PARTITION BY side) AS BIGINT) AS tot,
         CAST(COUNT(*) OVER (PARTITION BY side) AS BIGINT) AS n
  FROM halves
), s2 AS (
  SELECT side, day,
         ROW_NUMBER() OVER (PARTITION BY side
                            ORDER BY {_bseg_score()} DESC, day) AS rk
  FROM hcum WHERE i < n
)
SELECT CAST(0 AS INTEGER) AS depth, CAST(0 AS INTEGER) AS segment,
       CAST((SELECT day FROM s1) AS TIMESTAMP) AS split_after_day
UNION ALL
SELECT 1, CAST(side AS INTEGER), CAST(day AS TIMESTAMP)
FROM s2 WHERE rk = 1
""",
)
def ts_binary_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-2 binary segmentation of daily revenue (Scott-Knott /
    standard changepoint recursion): the ts_best_split argmax on the
    full series, then the same argmax INSIDE each resulting half —
    three change points structuring the series into four regimes;
    the multi-changepoint extension users reach for the moment one
    split isn't enough.

    Exactness: every candidate score derives from exact cumulative
    integer sums (per side) with the identical float score
    expression; each argmax is a deterministic ORDER BY score DESC,
    day LIMIT 1. Scale shape: one O(days) rollup, bounded-domain
    cumulative windows, THREE 1-row TakeOrderedAndProject argmaxes
    (the halves share one partitioned window pass — no per-half
    rescan of the fact table)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr(cents("value"))).cast("bigint").alias("c")
    )
    # bounded: O(days) daily rollup rows
    w = Window.orderBy("day")
    tot_n = daily.agg(
        F.sum("c").cast("bigint").alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    ).collect()[0]
    tot, n = int(tot_n["tot"]), int(tot_n["n"])
    cum = daily.select(
        "day",
        "c",
        F.sum("c").over(w).cast("bigint").alias("cs"),
        F.row_number().over(w).cast("bigint").alias("i"),
    ).withColumn("tot", F.lit(tot)).withColumn("n", F.lit(n))
    score = F.expr(_bseg_score())
    s1 = (
        cum.filter(F.col("i") < F.col("n"))
        .orderBy(score.desc(), "day")
        .limit(1)
        .collect()[0]["day"]
    )
    halves = daily.withColumn(
        "side", F.when(F.col("day") <= F.lit(s1), 0).otherwise(1)
    )
    ws = Window.partitionBy("side").orderBy("day")
    wp = Window.partitionBy("side")
    hcum = halves.select(
        "side",
        "day",
        F.sum("c").over(ws).cast("bigint").alias("cs"),
        F.row_number().over(ws).cast("bigint").alias("i"),
        F.sum("c").over(wp).cast("bigint").alias("tot"),
        F.count(F.lit(1)).over(wp).cast("bigint").alias("n"),
    )
    wr = Window.partitionBy("side").orderBy(score.desc(), "day")
    s2 = (
        hcum.filter(F.col("i") < F.col("n"))
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            F.lit(1).cast("int").alias("depth"),
            F.col("side").cast("int").alias("segment"),
            F.col("day").alias("split_after_day"),
        )
    )
    top = daily.sparkSession.createDataFrame(
        [(0, 0, s1)], "depth int, segment int, split_after_day timestamp"
    )
    return top.unionByName(s2)


STOCH_WINDOW = 14  # lookback days for %K


@query(
    "ts_stochastic_oscillator",
    oracle=f"""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
), w AS (
  SELECT CAST(day AS TIMESTAMP) AS day, c,
         MIN(c) OVER (ORDER BY day
                      ROWS BETWEEN {STOCH_WINDOW - 1} PRECEDING
                      AND CURRENT ROW) AS lo,
         MAX(c) OVER (ORDER BY day
                      ROWS BETWEEN {STOCH_WINDOW - 1} PRECEDING
                      AND CURRENT ROW) AS hi,
         ROW_NUMBER() OVER (ORDER BY day) AS rn
  FROM daily
), k AS (
  SELECT day, rn,
         CAST(c - lo AS DOUBLE) / CAST(hi - lo AS DOUBLE) * 100 AS pct_k
  FROM w WHERE rn >= {STOCH_WINDOW} AND hi > lo
), d AS (
  SELECT day, pct_k,
         LAG(pct_k, 1) OVER (ORDER BY day) AS k1,
         LAG(pct_k, 2) OVER (ORDER BY day) AS k2
  FROM k
)
SELECT day, pct_k,
       CASE WHEN k2 IS NOT NULL THEN (pct_k + k1 + k2) / 3 END AS pct_d
FROM d
""",
)
def ts_stochastic_oscillator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator %K/%D over daily revenue: %K locates
    today inside the {STOCH_WINDOW}-day high-low range, %D is its
    3-day smoothing — the bounded-momentum indicator completing the
    technical family (ts_rsi velocity, ts_bollinger_bands
    dispersion, ts_macd trend; this one is RANGE position).

    Exactness: rolling MIN/MAX over exact integer cents are
    order-free (no float in the extremes); %K is one float division
    of two exact integer differences; %D is the EXPLICIT 3-term sum
    (k + lag1 + lag2)/3 rather than a sliding AVG — sliding-window
    float aggregates use add/subtract rebalancing whose rounding an
    oracle cannot replay, the same trap the I-MR key avoided by
    integer MRs. Flat-range days (hi == lo) are excluded rather than
    0/0. Scale shape: one hash aggregate to the O(days) rollup, two
    bounded window passes."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("c"))
    )
    # bounded: O(days) daily rollup rows
    w = Window.orderBy("day")
    wf = w.rowsBetween(-(STOCH_WINDOW - 1), 0)
    base = daily.select(
        "day",
        "c",
        F.min("c").over(wf).alias("lo"),
        F.max("c").over(wf).alias("hi"),
        F.row_number().over(w).alias("rn"),
    )
    k = base.filter(
        (F.col("rn") >= STOCH_WINDOW) & (F.col("hi") > F.col("lo"))
    ).select(
        "day",
        (
            (F.col("c") - F.col("lo")).cast("double")
            / (F.col("hi") - F.col("lo")).cast("double")
            * 100
        ).alias("pct_k"),
    )
    # bounded: O(days) rollup-scale rows
    wd = Window.orderBy("day")
    d = k.select(
        "day",
        "pct_k",
        F.lag("pct_k", 1).over(wd).alias("k1"),
        F.lag("pct_k", 2).over(wd).alias("k2"),
    )
    return d.select(
        "day",
        "pct_k",
        F.when(
            F.col("k2").isNotNull(),
            (F.col("pct_k") + F.col("k1") + F.col("k2")) / 3,
        ).alias("pct_d"),
    )


VAR_ALPHA_PCT = 5  # 95% VaR


@query(
    "ts_var_backtest",
    bounded_cross="1-row VaR-threshold scalar onto the O(days) returns",
    oracle=f"""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
), rets AS (
  SELECT day,
         CAST(c - LAG(c) OVER (ORDER BY day) AS DOUBLE)
           / LAG(c) OVER (ORDER BY day) AS r
  FROM daily QUALIFY r IS NOT NULL
), ranked AS (
  SELECT r, ROW_NUMBER() OVER (ORDER BY r, day) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM rets
), var_t AS (
  SELECT r AS var_r, n FROM ranked
  WHERE rn = ({VAR_ALPHA_PCT} * n + 99) // 100
), viol AS (
  SELECT v.n,
         v.var_r,
         CAST(SUM(CASE WHEN rets.r < v.var_r THEN 1 ELSE 0 END) AS BIGINT)
           AS x
  FROM rets, var_t v
  GROUP BY v.n, v.var_r
)
SELECT n AS n_days,
       var_r AS var_95,
       x AS n_violations,
       CAST(x AS DOUBLE) / n AS violation_rate,
       -2 * ((CAST(n - x AS DOUBLE)
              * (CAST(FLOOR(LN(CAST('{1 - VAR_ALPHA_PCT / 100!r}' AS DOUBLE))
                            * 1000000 + 0.5) AS BIGINT) / 1e6)
              + CAST(x AS DOUBLE)
                * (CAST(FLOOR(LN(CAST('{VAR_ALPHA_PCT / 100!r}' AS DOUBLE))
                              * 1000000 + 0.5) AS BIGINT) / 1e6))
             - (CAST(n - x AS DOUBLE)
                * (CAST(FLOOR(LN(1 - CAST(x AS DOUBLE) / n) * 1000000 + 0.5)
                        AS BIGINT) / 1e6)
                + CAST(x AS DOUBLE)
                  * (CAST(FLOOR(LN(CAST(x AS DOUBLE) / n) * 1000000 + 0.5)
                          AS BIGINT) / 1e6))) AS kupiec_lr
FROM viol
""",
)
def ts_var_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kupiec proportion-of-failures VaR backtest: the in-sample 95%
    historical VaR of daily revenue returns (exact order statistic
    at rank ceil(0.05 n), ties by day), its violation count, and
    the POF likelihood ratio -2[ln L(p0) - ln L(p_hat)] ~ chi2(1) —
    the regulatory check (Basel traffic light) that the exceedance
    RATE matches the stated coverage, extending the risk family
    (agg_expected_shortfall sizes the tail; this AUDITS the
    quantile's calibration).

    Exactness: returns are single float divisions of exact integer
    pairs; the VaR cut is a deterministic rank; violations are
    exact comparisons/counts; each ln in the LR is quantized at
    1e-6 so the statistic is fixed arithmetic over (n, x). Scale
    shape: O(days) rollup, bounded windows, a declared 1-row
    threshold cross."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("c"))
    )
    # bounded: O(days) daily rollup rows
    w = Window.orderBy("day")
    rets = daily.select(
        "day",
        (
            (F.col("c") - F.lag("c").over(w)).cast("double")
            / F.lag("c").over(w)
        ).alias("r"),
    ).filter(F.col("r").isNotNull())
    # bounded: O(days) rollup-scale rows
    wr = Window.orderBy("r", "day")
    ranked = rets.select(
        "r",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    var_t = ranked.filter(
        F.col("rn") == (VAR_ALPHA_PCT * F.col("n") + 99) / 100
    )
    # integer division guard: Spark '/' is float — use floor-div expr
    var_t = ranked.filter(
        F.col("rn") == F.expr(f"({VAR_ALPHA_PCT} * n + 99) div 100")
    ).select(F.col("r").alias("var_r"), "n")
    # bounded: 1-row VaR threshold
    viol = (
        rets.crossJoin(F.broadcast(var_t))
        .groupBy("n", "var_r")
        .agg(
            F.sum(F.when(F.col("r") < F.col("var_r"), 1).otherwise(0))
            .cast("bigint")
            .alias("x")
        )
    )

    def lnq(col):
        return F.floor(F.log(col) * F.lit(1000000) + F.lit(0.5)).cast(
            "bigint"
        ) / F.lit(1e6)

    p0 = VAR_ALPHA_PCT / 100
    n_d = F.col("n").cast("double")
    x_d = F.col("x").cast("double")
    nx_d = (F.col("n") - F.col("x")).cast("double")
    rate = x_d / F.col("n")
    ll0 = nx_d * lnq(F.lit(1 - p0)) + x_d * lnq(F.lit(p0))
    ll1 = nx_d * lnq(F.lit(1) - rate) + x_d * lnq(rate)
    return viol.select(
        F.col("n").alias("n_days"),
        F.col("var_r").alias("var_95"),
        F.col("x").alias("n_violations"),
        rate.alias("violation_rate"),
        (F.lit(-2) * (ll0 - ll1)).alias("kupiec_lr"),
    )


@query(
    "ts_pettitt",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
), rk AS (
  SELECT day,
         CAST(ROW_NUMBER() OVER (ORDER BY c, day) AS BIGINT) AS r
  FROM daily
), cum AS (
  SELECT day,
         CAST(SUM(r) OVER (ORDER BY day) AS BIGINT) AS sr,
         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM rk
), u AS (
  SELECT day, t, n, 2 * sr - t * (n + 1) AS ut
  FROM cum WHERE t < n
)
SELECT CAST(day AS TIMESTAMP) AS change_day,
       CAST(t AS BIGINT) AS t_index,
       CAST(abs(ut) AS BIGINT) AS k_stat,
       CAST(n AS BIGINT) AS n_days
FROM u
ORDER BY abs(ut) DESC, day
LIMIT 1
""",
)
def ts_pettitt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt changepoint test on daily revenue — the RANK-based
    (distribution-free) single change-point locator next to
    ts_best_split's mean-shift score: U_t = sum_{i<=t, j>t}
    sign(x_i - x_j) collapses, for a tie-broken total order, to
    2*cumsum(rank) - t(n+1), so the whole statistic is exact
    integer arithmetic and the change day is argmax |U_t|. Robust
    where best_split is not: a variance-stable level shift in a
    heavy-tailed series moves ranks long before it moves means.

    Exactness: ranks use the deterministic (cents, day) order; U_t
    is exact bigint; the argmax is ORDER BY |U| DESC, day LIMIT 1.
    Scale shape: one hash aggregate to the O(days) rollup, two
    bounded window passes, a 1-row TakeOrderedAndProject."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("c"))
    )
    # bounded: O(days) daily rollup rows
    wr = Window.orderBy("c", "day")
    rk = daily.select(
        "day", F.row_number().over(wr).cast("bigint").alias("r")
    )
    # bounded: O(days) rollup-scale rows
    wd = Window.orderBy("day")
    cum = rk.select(
        "day",
        F.sum("r").over(wd).cast("bigint").alias("sr"),
        F.row_number().over(wd).cast("bigint").alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    u = cum.filter(F.col("t") < F.col("n")).select(
        "day",
        "t",
        "n",
        (2 * F.col("sr") - F.col("t") * (F.col("n") + 1)).alias("ut"),
    )
    return (
        u.orderBy(F.abs(F.col("ut")).desc(), "day")
        .limit(1)
        .select(
            F.col("day").alias("change_day"),
            F.col("t").alias("t_index"),
            F.abs(F.col("ut")).cast("bigint").alias("k_stat"),
            F.col("n").alias("n_days"),
        )
    )


SAX_WIN = 16    # window length (days)
SAX_STRIDE = 4  # window stride
SAX_SEGS = 4    # PAA segments per window (4 days each)


@query(
    "ts_sax_motifs",
    bounded_cross="4-row segment-offset grid over the O(days) rollup",
    oracle=f"""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
), idx AS (
  SELECT ROW_NUMBER() OVER (ORDER BY day) - 1 AS i, c,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM daily
), contrib AS (
  SELECT (idx.i // {SAX_STRIDE}) - k.k AS w, k.k AS seg, idx.c, idx.n
  FROM idx, unnest(generate_series(0, {SAX_SEGS - 1})) k(k)
  WHERE (idx.i // {SAX_STRIDE}) - k.k >= 0
    AND {SAX_WIN} + {SAX_STRIDE} * ((idx.i // {SAX_STRIDE}) - k.k) <= idx.n
), segs AS (
  SELECT w, seg, CAST(SUM(c) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS nd
  FROM contrib GROUP BY 1, 2
  HAVING COUNT(*) = {SAX_STRIDE}
), ranked AS (
  SELECT w, seg, s,
         ROW_NUMBER() OVER (ORDER BY s, w, seg) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM segs
), bp AS (
  SELECT MAX(CASE WHEN rn = (1 * m + 3) // 4 THEN s END) AS q1,
         MAX(CASE WHEN rn = (2 * m + 3) // 4 THEN s END) AS q2,
         MAX(CASE WHEN rn = (3 * m + 3) // 4 THEN s END) AS q3
  FROM ranked
), words AS (
  SELECT segs.w,
         CAST(SUM((CASE WHEN segs.s <= bp.q1 THEN 0
                        WHEN segs.s <= bp.q2 THEN 1
                        WHEN segs.s <= bp.q3 THEN 2
                        ELSE 3 END)
                  * (CASE segs.seg WHEN 0 THEN 64 WHEN 1 THEN 16
                                   WHEN 2 THEN 4 ELSE 1 END))
              AS BIGINT) AS word
  FROM segs, bp
  GROUP BY segs.w
)
SELECT word,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM words) AS share
FROM words GROUP BY word
""",
)
def ts_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX motif census of daily revenue (Lin-Keogh symbolic
    aggregate approximation, made fully deterministic): sliding
    {SAX_WIN}-day windows at stride {SAX_STRIDE}, PAA to {SAX_SEGS}
    segment sums, a 4-letter alphabet from the EMPIRICAL quartiles
    of all segment sums (exact order statistics instead of Gaussian
    breakpoints — no erf needed), each window a base-4 word, and
    the word histogram — repeated words ARE the motifs, the
    symbolic complement of ts_matrix_profile's exact-distance
    nearest-neighbor motifs.

    Exactness: segment sums are exact integer cents; breakpoints
    are rank-based order statistics under the deterministic
    (sum, window, segment) order; symbolization and word packing
    are pure integer comparisons. Scale shape: one O(days) rollup,
    a DECLARED 4-row offset-grid replication (each day feeds its 4
    covering windows), three hash aggregates, one bounded rank
    window."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("c"))
    )
    # bounded: O(days) daily rollup rows
    w = Window.orderBy("day")
    idx = daily.select(
        (F.row_number().over(w) - 1).alias("i"),
        "c",
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    kgrid = spark.createDataFrame([(k,) for k in range(SAX_SEGS)], "k int")
    # bounded: 4-row offset grid
    contrib = (
        idx.crossJoin(F.broadcast(kgrid))
        .withColumn("w", F.expr(f"(i div {SAX_STRIDE}) - k"))
        .filter(
            (F.col("w") >= 0)
            & (
                F.lit(SAX_WIN) + F.lit(SAX_STRIDE) * F.col("w")
                <= F.col("n")
            )
        )
    )
    segs = (
        contrib.groupBy("w", F.col("k").alias("seg"))
        .agg(
            F.sum("c").cast("bigint").alias("s"),
            F.count(F.lit(1)).alias("nd"),
        )
        .filter(F.col("nd") == SAX_STRIDE)
    )
    # bounded: O(days) rollup-scale rows
    wr = Window.orderBy("s", "w", "seg")
    ranked = segs.select(
        "s",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("m"),
    )
    bps = ranked.agg(
        F.max(
            F.when(F.col("rn") == F.expr("(1 * m + 3) div 4"), F.col("s"))
        ).alias("q1"),
        F.max(
            F.when(F.col("rn") == F.expr("(2 * m + 3) div 4"), F.col("s"))
        ).alias("q2"),
        F.max(
            F.when(F.col("rn") == F.expr("(3 * m + 3) div 4"), F.col("s"))
        ).alias("q3"),
    ).collect()[0]
    q1, q2, q3 = int(bps["q1"]), int(bps["q2"]), int(bps["q3"])
    sym = (
        F.when(F.col("s") <= q1, 0)
        .when(F.col("s") <= q2, 1)
        .when(F.col("s") <= q3, 2)
        .otherwise(3)
    )
    pw = (
        F.when(F.col("seg") == 0, 64)
        .when(F.col("seg") == 1, 16)
        .when(F.col("seg") == 2, 4)
        .otherwise(1)
    )
    words = segs.groupBy("w").agg(
        F.sum(sym * pw).cast("bigint").alias("word")
    )
    n_windows = words.count()
    return words.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        (F.count(F.lit(1)).cast("double") / F.lit(n_windows)).alias("share"),
    )


@query(
    "ts_parkinson_vol",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS hi,
         CAST(MIN(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS lo
  FROM orders GROUP BY 1
), q AS (
  SELECT CAST(round(1000000000000.0
              * ln(CAST(hi AS DOUBLE) / lo)) AS BIGINT) AS lq
  FROM daily
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(CAST(lq AS HUGEINT) * lq) AS VARCHAR) AS DOUBLE)
           AS sq
  FROM q
)
SELECT n AS n_days,
       sqrt(sq / 1e24
            / (4 * CAST('0.6931471805599453' AS DOUBLE) * n))
         AS parkinson_vol_daily,
       sqrt(sq / 1e24
            / (4 * CAST('0.6931471805599453' AS DOUBLE) * n))
         * sqrt(252.0) AS parkinson_vol_annualized
FROM m
""",
)
def ts_parkinson_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parkinson high-low range volatility of the daily order-price
    distribution: sigma_P = sqrt(sum ln(H/L)^2 / (4 ln2 n)) — the
    range-based estimator that is ~5x more statistically efficient
    than close-to-close volatility, completing the OHLC family
    (ts_ohlc builds the bars; ts_sharpe consumes close-to-close;
    this consumes the RANGE).

    Exactness: per-day ln(H/L) is quantized ONCE at 1e-12 (the
    theil/atkinson discipline) so each squared term is an exact
    HUGEINT/decimal(38) product and the sum is order-free; the
    final sqrt/annualization is one fixed expression (ln 2 as a
    CAST-string literal). Scale shape: one hash aggregate to the
    O(days) rollup, a 1-row reduction."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.max(F.expr(cents("o_totalprice"))).cast("bigint").alias("hi"),
            F.min(F.expr(cents("o_totalprice"))).cast("bigint").alias("lo"),
        )
    )
    q = daily.select(
        F.round(
            F.lit(1000000000000.0)
            * F.log(F.col("hi").cast("double") / F.col("lo"))
        )
        .cast("bigint")
        .alias("lq")
    )
    m = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("lq").cast("decimal(38,0)") * F.col("lq"))
        .cast("double")
        .alias("sq"),
    )
    ln2 = float.fromhex("0x1.62e42fefa39efp-1")
    vol = F.sqrt(
        F.col("sq") / F.lit(1e24) / (F.lit(4) * F.lit(ln2) * F.col("n"))
    )
    return m.select(
        F.col("n").alias("n_days"),
        vol.alias("parkinson_vol_daily"),
        (vol * F.sqrt(F.lit(252.0))).alias("parkinson_vol_annualized"),
    )


DFA_SIZES = [8, 16, 32, 64, 128, 256]


@query(
    "ts_dfa",
    bounded_cross=(
        "6-row size grid over the O(days) profile + 1-row slope scalar"
    ),
    oracle=f"""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
  FROM daily
), prof AS (
  SELECT ROW_NUMBER() OVER (ORDER BY day) - 1 AS i,
         CAST(SUM(tot.n * daily.c - tot.s)
              OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS yp,
         tot.n AS n
  FROM daily, tot
), segm AS (
  SELECT sz.s, prof.i // sz.s AS seg,
         (prof.i % sz.s) + 1 AS t, prof.yp, prof.n
  FROM prof, unnest(ARRAY{DFA_SIZES}) sz(s)
  WHERE prof.i // sz.s < prof.n // sz.s
), mo AS (
  SELECT s, seg, MAX(n) AS n,
         CAST(CAST(SUM(CAST(yp AS HUGEINT)) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(t AS HUGEINT) * yp) AS VARCHAR) AS DOUBLE) AS sty,
         CAST(CAST(SUM(CAST(yp AS HUGEINT) * yp) AS VARCHAR) AS DOUBLE) AS syy
  FROM segm GROUP BY s, seg
), rss AS (
  SELECT s, seg, n,
         syy - sy * sy / s
             - ((s * sty - (s * (s + 1) / 2.0) * sy)
                / (s * (s * (s + 1) * (2 * s + 1) / 6.0)
                   - (s * (s + 1) / 2.0) * (s * (s + 1) / 2.0)))
               * (sty - (s * (s + 1) / 2.0) * sy / s) AS r
  FROM mo
), fl AS (
  SELECT s, MAX(n) AS n, CAST(COUNT(*) AS BIGINT) AS n_segments,
         list_sum(list(r ORDER BY seg)) AS srss
  FROM rss GROUP BY s
), fv AS (
  SELECT s, n_segments,
         sqrt(srss / (n_segments * s)) / n AS fluct
  FROM fl
), pts AS (
  SELECT CAST(FLOOR(LN(CAST(s AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(LN(fluct) * 1000000 + 0.5) AS BIGINT) AS y
  FROM fv
), sl AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy2, CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM pts
)
SELECT fv.s AS scale, fv.n_segments, fv.fluct,
       CAST(sl.m * sl.sxy - sl.sx * sl.sy2 AS DOUBLE)
         / CAST(sl.m * sl.sxx - sl.sx * sl.sx AS DOUBLE) AS dfa_alpha
FROM fv, sl
""",
)
def ts_dfa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detrended fluctuation analysis of daily revenue (Peng 1994):
    integrate the centered series, split into non-overlapping
    windows at scales {DFA_SIZES}, LINEARLY detrend each window in
    closed form, and fit the log-log slope of RMS fluctuation vs
    scale — the trend-robust long-memory exponent next to
    ts_hurst_rs (alpha ~ H for stationary signals, but DFA survives
    polynomial trends that break R/S).

    Exactness: the profile is kept in EXACT integers by scaling
    through n (Y'_t = sum(n*x_i - S); Y'^2 sums ride
    HUGEINT/decimal(38) — ~6e37 at a 100x corpus, inside 38 digits
    only because the calendar bounds n); per-window St/Stt are
    closed-form polynomial constants of the scale; each window's
    RSS is one fixed double expression over exact moments; RSS sums
    fold in window order (bounded <= days/8 windows); the final
    slope is the corpus_heaps_law quantized-ln integer OLS. Scale
    shape: one rollup, one bounded cumsum window, a DECLARED 6-row
    scale-grid replication, two hash aggregates."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("c"))
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
    ).collect()[0]
    n, stot = int(tot["n"]), int(tot["s"])
    # bounded: O(days) daily rollup rows
    w = Window.orderBy("day")
    prof = daily.select(
        (F.row_number().over(w) - 1).alias("i"),
        F.sum(F.lit(n) * F.col("c") - F.lit(stot))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("yp"),
    )
    sizes = daily.sparkSession.createDataFrame(
        [(s,) for s in DFA_SIZES], "s int"
    )
    # bounded: 6-row scale grid
    segm = (
        prof.crossJoin(F.broadcast(sizes))
        .withColumn("seg", F.expr("i div s"))
        .withColumn("t", F.expr("(i % s) + 1"))
        .filter(F.col("seg") < F.lit(n) / F.col("s"))
        .filter(F.expr(f"seg < {n} div s"))
    )
    mo = segm.groupBy("s", "seg").agg(
        F.sum(F.col("yp").cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum(F.col("t").cast("decimal(38,0)") * F.col("yp"))
        .cast("double")
        .alias("sty"),
        F.sum(F.col("yp").cast("decimal(38,0)") * F.col("yp"))
        .cast("double")
        .alias("syy"),
    )
    s_ = F.col("s")
    st = s_ * (s_ + 1) / F.lit(2.0)
    stt = s_ * (s_ * (s_ + 1) * (2 * s_ + 1) / F.lit(6.0))
    b = (s_ * F.col("sty") - st * F.col("sy")) / (stt - st * st)
    rss = mo.select(
        "s",
        "seg",
        (
            F.col("syy")
            - F.col("sy") * F.col("sy") / s_
            - b * (F.col("sty") - st * F.col("sy") / s_)
        ).alias("r"),
    )
    fl = rss.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("seg", F.col("r").alias("v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("srss"),
    )
    fv = fl.select(
        "s",
        "n_segments",
        (
            F.sqrt(F.col("srss") / (F.col("n_segments") * F.col("s")))
            / F.lit(n)
        ).alias("fluct"),
    )
    pts = fv.select(
        F.floor(F.log(F.col("s").cast("double")) * 1000000 + 0.5)
        .cast("bigint")
        .alias("x"),
        F.floor(F.log("fluct") * 1000000 + 0.5).cast("bigint").alias("y"),
    )
    sl = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy2"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    # bounded: 1-row slope scalar onto the 6-row scale table
    j = fv.crossJoin(F.broadcast(sl))
    return j.select(
        F.col("s").alias("scale"),
        "n_segments",
        "fluct",
        (
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy2")).cast(
                "double"
            )
            / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
        ).alias("dfa_alpha"),
    )


@query(
    "ts_seasonal_mann_kendall",
    bounded_cross=(
        "month-partitioned O((days/12)^2) pair join + 1-row totals"
    ),
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(month(ts) AS INTEGER) AS m,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.m,
         CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1
              ELSE 0 END AS sgn
  FROM daily a JOIN daily b ON a.m = b.m AND a.day < b.day
), per_m AS (
  SELECT m, CAST(SUM(sgn) AS BIGINT) AS s_m FROM pairs GROUP BY m
), cnt AS (
  SELECT m, CAST(COUNT(*) AS BIGINT) AS n_m FROM daily GROUP BY m
), ties AS (
  SELECT m, CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_m
  FROM (SELECT m, COUNT(*) AS t FROM daily GROUP BY m, c)
  GROUP BY m
), tot AS (
  SELECT CAST(SUM(p.s_m) AS BIGINT) AS s,
         CAST(SUM(c.n_m) AS BIGINT) AS n,
         CAST(SUM(CAST(c.n_m AS BIGINT) * (c.n_m - 1) * (2 * c.n_m + 5)
                  - COALESCE(t.tie_m, 0)) AS BIGINT) AS var18
  FROM per_m p
  JOIN cnt c ON c.m = p.m
  LEFT JOIN ties t ON t.m = p.m
)
SELECT s, n,
       CAST(var18 AS DOUBLE) / 18 AS var_s,
       CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1)
                 / sqrt(CAST(var18 AS DOUBLE) / 18)
            WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1)
                 / sqrt(CAST(var18 AS DOUBLE) / 18)
            ELSE CAST(0 AS DOUBLE) END AS z
FROM tot
""",
)
def ts_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall trend test (Hirsch-Slack): the MK sign
    statistic computed WITHIN each calendar month and summed —
    January compares only to other Januaries, so a strong seasonal
    cycle can't masquerade as (or mask) a monotone trend the way it
    can in the plain ts_mann_kendall; the standard for
    environmental/KPI series with known seasonality. Variance sums
    the per-month tie-corrected terms.

    Exactness: sign pairs, per-month S and tie terms are exact
    integers; the z-score (with continuity correction) is one fixed
    double expression. Scale shape: the pair join is PARTITIONED by
    month — 12 grids of (days/12)^2 (~12x the plain key's cell
    count reduction), calendar-bounded and data-size-independent;
    then three tiny hash aggregates."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.month("ts").cast("int").alias("m"),
    ).agg(F.sum(F.expr(cents("value"))).cast("bigint").alias("c"))
    a = daily.select(
        F.col("m"), F.col("day").alias("da"), F.col("c").alias("ca")
    )
    b = daily.select(
        F.col("m").alias("mb"), F.col("day").alias("db"), F.col("c").alias("cb")
    )
    # bounded: month-partitioned days^2 pair grid (declared)
    pairs = a.join(
        b, (F.col("m") == F.col("mb")) & (F.col("da") < F.col("db"))
    ).select(
        "m",
        F.when(F.col("cb") > F.col("ca"), 1)
        .when(F.col("cb") < F.col("ca"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    per_m = pairs.groupBy("m").agg(F.sum("sgn").cast("bigint").alias("s_m"))
    cnt = daily.groupBy("m").agg(F.count(F.lit(1)).cast("bigint").alias("n_m"))
    ties = (
        daily.groupBy("m", "c")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("m")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("bigint")
            .alias("tie_m")
        )
    )
    tot = (
        per_m.join(cnt, "m")
        .join(ties, "m", "left")
        .agg(
            F.sum("s_m").cast("bigint").alias("s"),
            F.sum("n_m").cast("bigint").alias("n"),
            F.sum(
                F.col("n_m") * (F.col("n_m") - 1) * (2 * F.col("n_m") + 5)
                - F.coalesce(F.col("tie_m"), F.lit(0))
            )
            .cast("bigint")
            .alias("var18"),
        )
    )
    var_s = F.col("var18").cast("double") / 18
    z = (
        F.when(F.col("s") > 0, (F.col("s").cast("double") - 1) / F.sqrt(var_s))
        .when(F.col("s") < 0, (F.col("s").cast("double") + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0).cast("double"))
    )
    return tot.select("s", "n", var_s.alias("var_s"), z.alias("z"))


@query(
    "ts_spectral_entropy",
    bounded_cross="1-row total-power scalar onto the 4-period table",
    oracle=f"""
WITH pg AS ({_pgram_oracle().strip()}),
tot AS (
  SELECT list_sum(list(power ORDER BY period)) AS ptot FROM pg
), sh AS (
  SELECT pg.period, pg.power, pg.power / tot.ptot AS p
  FROM pg, tot
), ent AS (
  SELECT list_sum(list(
           -p * (CAST(FLOOR(LN(p) * 1000000 + 0.5) AS BIGINT) / 1e6)
           ORDER BY period)) AS h
  FROM sh
), dom AS (
  SELECT period FROM sh ORDER BY power DESC, period LIMIT 1
)
SELECT CAST(4 AS BIGINT) AS n_periods,
       ent.h AS h_nats,
       ent.h / CAST('1.3862943611198906' AS DOUBLE) AS h_normalized,
       CAST(dom.period AS INTEGER) AS dominant_period
FROM ent, dom
""",
)
def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral entropy of the candidate-period power distribution:
    H = -sum p_i ln p_i over ts_periodogram's normalized
    weekly/monthly/quarterly/yearly powers, plus the dominant
    period — ONE number for 'how concentrated is the seasonality?'
    (H -> 0: a single cycle owns the series; H -> ln 4: no
    preferred cycle), the summary dashboards alarm on where the
    periodogram is the diagnostic.

    Exactness: powers come from the periodogram's import-quantized
    integer-trig machinery (no libm in the data path); shares are
    identical doubles; each ln is quantized at 1e-6 and the 4-term
    entropy folds in PERIOD order; ln 4 is a CAST-string literal.
    Scale shape: the periodogram plan (O(days) rollup + broadcast
    trig join) then 4-row arithmetic."""
    pg = ts_periodogram(spark, sf_dir).select("period", "power")
    tot = pg.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("period", F.col("power").alias("v")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("ptot")
    )
    # bounded: 1-row total onto 4 rows
    sh = pg.crossJoin(F.broadcast(tot)).select(
        "period", "power", (F.col("power") / F.col("ptot")).alias("p")
    )
    ent = sh.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "period",
                        (
                            -F.col("p")
                            * (
                                F.floor(
                                    F.log("p") * F.lit(1000000) + F.lit(0.5)
                                ).cast("bigint")
                                / F.lit(1e6)
                            )
                        ).alias("v"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("h")
    )
    dom = (
        sh.orderBy(F.desc("power"), "period")
        .limit(1)
        .select(F.col("period").cast("int").alias("dominant_period"))
    )
    ln4 = float.fromhex("0x1.62e42fefa39efp+0")
    return ent.crossJoin(F.broadcast(dom)).select(
        F.lit(4).cast("bigint").alias("n_periods"),
        F.col("h").alias("h_nats"),
        (F.col("h") / F.lit(ln4)).alias("h_normalized"),
        "dominant_period",
    )


@query(
    "ts_mincer_zarnowitz",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
), p AS (
  SELECT c AS y, LAG(c, 7) OVER (ORDER BY day) AS f
  FROM daily QUALIFY f IS NOT NULL
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(f) AS BIGINT) AS sf,
         CAST(CAST(SUM(CAST(f AS HUGEINT) * f) AS VARCHAR) AS DOUBLE) AS sff,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(CAST(SUM(CAST(f AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) AS sfy,
         CAST(CAST(SUM(CAST(y AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) AS syy,
         CAST(CAST(SUM(CAST(y - f AS HUGEINT) * (y - f)) AS VARCHAR)
              AS DOUBLE) AS sdd
  FROM p
), fit AS (
  SELECT n, sdd,
         (CAST(n AS DOUBLE) * sfy - CAST(sf AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sff - CAST(sf AS DOUBLE) * sf) AS b,
         syy - CAST(sy AS DOUBLE) * sy / n
           - ((CAST(n AS DOUBLE) * sfy - CAST(sf AS DOUBLE) * sy)
              / (CAST(n AS DOUBLE) * sff - CAST(sf AS DOUBLE) * sf))
             * (sfy - CAST(sf AS DOUBLE) * sy / n) AS sse,
         syy - CAST(sy AS DOUBLE) * sy / n AS sst,
         (CAST(sy AS DOUBLE)
          - ((CAST(n AS DOUBLE) * sfy - CAST(sf AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sff - CAST(sf AS DOUBLE) * sf)) * sf)
           / n AS a
  FROM m
)
SELECT n AS n_days,
       a / 100 AS alpha_dollars,
       b AS beta,
       1 - sse / sst AS r2,
       ((sdd - sse) / 2) / (sse / (n - 2)) AS f_joint
FROM fit
""",
)
def ts_mincer_zarnowitz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mincer-Zarnowitz forecast-rationality regression of daily
    revenue on its weekly seasonal-naive forecast (lag-7): actual =
    a + b*forecast; an unbiased efficient forecast has (a, b) =
    (0, 1), and the joint F statistic [(RSS_restricted - SSE)/2] /
    [SSE/(n-2)] tests exactly that (the restricted model IS the
    y = f identity, so its RSS is just sum (y - f)^2) — the
    calibration-of-forecasts audit that ts_seasonal_mase's accuracy
    number can't give (a forecast can be accurate but biased).

    Exactness: all six moments are exact integers (products via
    HUGEINT/decimal(38)); a, b, R^2 and F are fixed double
    expressions in identical order. Scale shape: one O(days)
    rollup, one bounded lag window, a 1-row reduction."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("c"))
    )
    # bounded: O(days) daily rollup rows
    w = Window.orderBy("day")
    p = daily.select(
        F.col("c").alias("y"), F.lag("c", 7).over(w).alias("f")
    ).filter(F.col("f").isNotNull())
    m = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("f").cast("bigint").alias("sf"),
        F.sum(F.col("f").cast("decimal(38,0)") * F.col("f"))
        .cast("double")
        .alias("sff"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("f").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("sfy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("syy"),
        F.sum(
            (F.col("y") - F.col("f")).cast("decimal(38,0)")
            * (F.col("y") - F.col("f"))
        )
        .cast("double")
        .alias("sdd"),
    )
    n_d = F.col("n").cast("double")
    b = (n_d * F.col("sfy") - F.col("sf").cast("double") * F.col("sy")) / (
        n_d * F.col("sff") - F.col("sf").cast("double") * F.col("sf")
    )
    sst = F.col("syy") - F.col("sy").cast("double") * F.col("sy") / F.col("n")
    sse = sst - b * (
        F.col("sfy") - F.col("sf").cast("double") * F.col("sy") / F.col("n")
    )
    a = (F.col("sy").cast("double") - b * F.col("sf")) / F.col("n")
    return m.select(
        F.col("n").alias("n_days"),
        (a / 100).alias("alpha_dollars"),
        b.alias("beta"),
        (F.lit(1) - sse / sst).alias("r2"),
        (((F.col("sdd") - sse) / 2) / (sse / (F.col("n") - 2))).alias(
            "f_joint"
        ),
    )


@query(
    "ts_diebold_mariano",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
), p AS (
  SELECT c AS y,
         LAG(c, 1) OVER (ORDER BY day) AS f1,
         LAG(c, 7) OVER (ORDER BY day) AS f7
  FROM daily QUALIFY f7 IS NOT NULL
), d AS (
  SELECT ABS(y - f7) - ABS(y - f1) AS dt FROM p
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dt) AS BIGINT) AS sd,
         CAST(CAST(SUM(CAST(dt AS HUGEINT) * dt) AS VARCHAR) AS DOUBLE)
           AS sdd
  FROM d
)
SELECT n AS n_days,
       CAST(sd AS DOUBLE) / n / 100 AS mean_loss_diff_dollars,
       (CAST(sd AS DOUBLE) / n)
         / sqrt(((sdd - (CAST(sd AS DOUBLE) / n) * sd) / (n - 1)) / n)
         AS dm_stat
FROM m
""",
)
def ts_diebold_mariano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diebold-Mariano test comparing the weekly seasonal-naive
    forecast (lag-7) against the one-step naive (lag-1) under
    absolute loss: d_t = |e_seasonal| - |e_naive|, DM =
    mean(d)/se(mean) — the SIGNIFICANCE companion of
    ts_seasonal_mase's ratio (MASE < 1 says seasonal wins; DM says
    whether that win clears sampling noise). Plain iid variance
    (the lag-0 special case; HAC belongs to ts_newey_west's
    machinery and is cited there).

    Exactness: both loss series are exact integer cents, so d_t and
    its moments are exact integers (squares via HUGEINT/
    decimal(38)); DM is one fixed double expression. Scale shape:
    one O(days) rollup, one bounded lag window, a 1-row
    reduction."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("c"))
    )
    # bounded: O(days) daily rollup rows
    w = Window.orderBy("day")
    p = daily.select(
        F.col("c").alias("y"),
        F.lag("c", 1).over(w).alias("f1"),
        F.lag("c", 7).over(w).alias("f7"),
    ).filter(F.col("f7").isNotNull())
    d = p.select(
        (F.abs(F.col("y") - F.col("f7")) - F.abs(F.col("y") - F.col("f1")))
        .alias("dt")
    )
    m = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dt").cast("bigint").alias("sd"),
        F.sum(F.col("dt").cast("decimal(38,0)") * F.col("dt"))
        .cast("double")
        .alias("sdd"),
    )
    mean_d = F.col("sd").cast("double") / F.col("n")
    var_d = (F.col("sdd") - mean_d * F.col("sd")) / (F.col("n") - 1)
    return m.select(
        F.col("n").alias("n_days"),
        (mean_d / 100).alias("mean_loss_diff_dollars"),
        (mean_d / F.sqrt(var_d / F.col("n"))).alias("dm_stat"),
    )


@query(
    "ts_theil_u",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
), p AS (
  SELECT c AS y, LAG(c, 7) OVER (ORDER BY day) AS f,
         LAG(c, 1) OVER (ORDER BY day) AS prev
  FROM daily QUALIFY f IS NOT NULL AND prev IS NOT NULL
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(CAST(y - f AS HUGEINT) * (y - f)) AS VARCHAR)
              AS DOUBLE) AS sef,
         CAST(CAST(SUM(CAST(y - prev AS HUGEINT) * (y - prev)) AS VARCHAR)
              AS DOUBLE) AS sen,
         CAST(CAST(SUM(CAST(y AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) AS syy,
         CAST(CAST(SUM(CAST(f AS HUGEINT) * f) AS VARCHAR) AS DOUBLE) AS sff
  FROM p
)
SELECT n AS n_days,
       sqrt(sef / n) / (sqrt(syy / n) + sqrt(sff / n)) AS theil_u1,
       sqrt(sef / sen) AS theil_u2
FROM m
""",
)
def ts_theil_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U forecast-skill statistics for the weekly
    seasonal-naive forecast: U1 = RMSE/(RMS(y) + RMS(f)) in [0, 1]
    (0 = perfect), and U2 = RMSE(forecast)/RMSE(naive) (< 1 beats
    persistence) — the classic skill pair that, with MASE (absolute
    loss), DM (significance) and MZ (rationality), completes the
    forecast-evaluation shelf.

    Exactness: all four quadratic sums are exact integers
    (HUGEINT/decimal(38)); both U statistics are fixed double
    expressions. One rollup, one bounded window, a 1-row
    reduction."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("c"))
    )
    # bounded: O(days) daily rollup rows
    w = Window.orderBy("day")
    p = daily.select(
        F.col("c").alias("y"),
        F.lag("c", 7).over(w).alias("f"),
        F.lag("c", 1).over(w).alias("prev"),
    ).filter(F.col("f").isNotNull() & F.col("prev").isNotNull())

    def sq(a, b):
        return (
            F.sum(
                (F.col(a) - F.col(b)).cast("decimal(38,0)")
                * (F.col(a) - F.col(b))
            )
            .cast("double")
        )

    m = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        sq("y", "f").alias("sef"),
        sq("y", "prev").alias("sen"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("syy"),
        F.sum(F.col("f").cast("decimal(38,0)") * F.col("f"))
        .cast("double")
        .alias("sff"),
    )
    return m.select(
        F.col("n").alias("n_days"),
        (
            F.sqrt(F.col("sef") / F.col("n"))
            / (
                F.sqrt(F.col("syy") / F.col("n"))
                + F.sqrt(F.col("sff") / F.col("n"))
            )
        ).alias("theil_u1"),
        F.sqrt(F.col("sef") / F.col("sen")).alias("theil_u2"),
    )


@query(
    "ts_amihud_illiquidity",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1
), r AS (
  SELECT day, v,
         CAST(ABS(v - LAG(v) OVER (ORDER BY day)) AS DOUBLE)
           / LAG(v) OVER (ORDER BY day) AS ar
  FROM daily QUALIFY ar IS NOT NULL
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         list_sum(list(ar / (CAST(v AS DOUBLE) / 100) ORDER BY day))
           AS silliq
  FROM r
)
SELECT n AS n_days,
       silliq / n * 1e9 AS amihud_x1e9
FROM m
""",
)
def ts_amihud_illiquidity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Amihud (2002) illiquidity ratio of the daily revenue series:
    mean over days of |return| / dollar volume (scaled by 1e9 for
    readability) — THE standard price-impact proxy in empirical
    market microstructure: how much does a dollar of flow move the
    series? Completes the finance shelf's microstructure corner
    next to the volatility (Parkinson) and momentum (MACD/RSI)
    views.

    Exactness: each day's |return| is one float division of exact
    integer pairs; the per-day ratio divides by the identical
    dollar volume; the day-ordered strict fold makes the mean
    bit-exact. One rollup, one bounded window, a 1-row
    reduction."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("v"))
    )
    # bounded: O(days) daily rollup rows
    w = Window.orderBy("day")
    r = daily.select(
        "day",
        "v",
        (
            F.abs(F.col("v") - F.lag("v").over(w)).cast("double")
            / F.lag("v").over(w)
        ).alias("ar"),
    ).filter(F.col("ar").isNotNull())
    m = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "day",
                        (F.col("ar") / (F.col("v").cast("double") / 100)).alias(
                            "v2"
                        ),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["v2"],
        ).alias("silliq"),
    )
    return m.select(
        F.col("n").alias("n_days"),
        (F.col("silliq") / F.col("n") * F.lit(1e9)).alias("amihud_x1e9"),
    )


@query(
    "ts_calmar_ratio",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM daily_src GROUP BY 1
), daily_src AS (SELECT * FROM orders),
dd AS (
  SELECT day, c,
         CAST(MAX(c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS peak,
         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM daily
), m AS (
  SELECT MAX(n) AS n,
         MAX(CASE WHEN rn = 1 THEN c END) AS first_c,
         MAX(CASE WHEN rn = n THEN c END) AS last_c,
         MAX(CAST(peak - c AS DOUBLE) / peak) AS mdd
  FROM dd
)
SELECT n AS n_days,
       CAST(last_c AS DOUBLE) / first_c - 1 AS total_return,
       (CAST(last_c AS DOUBLE) / first_c - 1) * 365 / (n - 1)
         AS annualized_return,
       mdd AS max_drawdown,
       ((CAST(last_c AS DOUBLE) / first_c - 1) * 365 / (n - 1)) / mdd
         AS calmar_ratio
FROM m
""",
)
def ts_calmar_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calmar ratio of the daily-revenue 'equity curve': linearized
    annual return over the maximum peak-to-trough drawdown — the
    drawdown-denominated risk-adjusted return that pairs with
    ts_sharpe (volatility-denominated) and ts_ulcer_index
    (drawdown-depth integral); the number drawdown-averse
    allocators quote first.

    Exactness: first/last/peak values are exact integers (running
    MAX is order-free); each drawdown is one float division of two
    exact integers and the max over days picks identical doubles;
    the ratio is a fixed expression. Scale shape: one O(days)
    rollup, one bounded window pass, a 1-row reduction."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("c"))
    )
    # bounded: O(days) daily rollup rows
    w = Window.orderBy("day")
    dd = daily.select(
        "c",
        F.max("c")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("peak"),
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    m = dd.agg(
        F.max("n").alias("n"),
        F.max(F.when(F.col("rn") == 1, F.col("c"))).alias("first_c"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("c"))).alias("last_c"),
        F.max(
            (F.col("peak") - F.col("c")).cast("double") / F.col("peak")
        ).alias("mdd"),
    )
    tret = F.col("last_c").cast("double") / F.col("first_c") - 1
    aret = tret * 365 / (F.col("n") - 1)
    return m.select(
        F.col("n").alias("n_days"),
        tret.alias("total_return"),
        aret.alias("annualized_return"),
        F.col("mdd").alias("max_drawdown"),
        (aret / F.col("mdd")).alias("calmar_ratio"),
    )


@query(
    "ts_durbin_watson",
    bounded_cross="1-row OLS-coefficient scalar onto the O(days) series",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM daily_src GROUP BY 1
), daily_src AS (SELECT * FROM orders),
p AS (
  SELECT day, c AS y, LAG(c, 7) OVER (ORDER BY day) AS f
  FROM daily QUALIFY f IS NOT NULL
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(f) AS BIGINT) AS sf,
         CAST(CAST(SUM(CAST(f AS HUGEINT) * f) AS VARCHAR) AS DOUBLE) AS sff,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(CAST(SUM(CAST(f AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) AS sfy
  FROM p
), co AS (
  SELECT (CAST(n AS DOUBLE) * sfy - CAST(sf AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sff - CAST(sf AS DOUBLE) * sf) AS b,
         (CAST(sy AS DOUBLE)
          - ((CAST(n AS DOUBLE) * sfy - CAST(sf AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sff - CAST(sf AS DOUBLE) * sf)) * sf)
           / n AS a
  FROM m
), e AS (
  SELECT p.day, p.y - (co.a + co.b * p.f) AS e
  FROM p, co
), d AS (
  SELECT day, e, LAG(e) OVER (ORDER BY day) AS pe FROM e
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         list_sum(list(e * e ORDER BY day)) AS see,
         list_sum(list(CASE WHEN pe IS NOT NULL
                            THEN (e - pe) * (e - pe)
                            ELSE CAST(0 AS DOUBLE) END ORDER BY day)) AS sdd
  FROM d
)
SELECT n AS n_days, sdd / see AS durbin_watson
FROM s
""",
)
def ts_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson autocorrelation statistic on the residuals of
    the Mincer-Zarnowitz lag-7 regression: DW = sum (e_t -
    e_{t-1})^2 / sum e_t^2 — the first residual diagnostic run
    after ANY regression (DW ~ 2 means white residuals; << 2
    positive serial correlation, the silent killer of the
    regression SEs the MZ F-test relies on).

    Exactness: OLS coefficients come from exact integer moments (a
    1-row scalar); every residual is the same fixed double
    expression over (y, f, a, b); both quadratic sums fold in DAY
    order via the strict-fold pair. Scale shape: one O(days)
    rollup, bounded windows, a declared 1-row coefficient cross."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("c"))
    )
    # bounded: O(days) daily rollup rows
    w = Window.orderBy("day")
    p = daily.select(
        "day", F.col("c").alias("y"), F.lag("c", 7).over(w).alias("f")
    ).filter(F.col("f").isNotNull())
    m = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("f").cast("bigint").alias("sf"),
        F.sum(F.col("f").cast("decimal(38,0)") * F.col("f"))
        .cast("double")
        .alias("sff"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("f").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("sfy"),
    )
    n_d = F.col("n").cast("double")
    b = (n_d * F.col("sfy") - F.col("sf").cast("double") * F.col("sy")) / (
        n_d * F.col("sff") - F.col("sf").cast("double") * F.col("sf")
    )
    a = (F.col("sy").cast("double") - b * F.col("sf")) / F.col("n")
    co = m.select(a.alias("a"), b.alias("b"))
    # bounded: 1-row coefficient scalar
    e = p.crossJoin(F.broadcast(co)).select(
        "day", (F.col("y") - (F.col("a") + F.col("b") * F.col("f"))).alias("e")
    )
    # bounded: O(days) residual rows
    d = e.select("day", "e", F.lag("e").over(Window.orderBy("day")).alias("pe"))

    def day_fold(col):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("day", col.alias("v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        )

    s = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        day_fold(F.col("e") * F.col("e")).alias("see"),
        day_fold(
            F.when(
                F.col("pe").isNotNull(),
                (F.col("e") - F.col("pe")) * (F.col("e") - F.col("pe")),
            ).otherwise(F.lit(0.0))
        ).alias("sdd"),
    )
    return s.select(
        F.col("n").alias("n_days"),
        (F.col("sdd") / F.col("see")).alias("durbin_watson"),
    )


@query(
    "ts_turbulence",
    bounded_cross="1-row covariance scalar onto the O(days) return pairs",
    oracle=f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1992-01-01',
                   CAST(date_trunc('day', ts) AS DATE)) AS dd,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events
  WHERE event_type IN ('{CCF_X_TYPE}', '{CCF_Y_TYPE}')
  GROUP BY 1, 2
), rx AS (
  SELECT dd, CAST(c - LAG(c) OVER (ORDER BY dd) AS DOUBLE)
               / LAG(c) OVER (ORDER BY dd) AS x
  FROM daily WHERE event_type = '{CCF_X_TYPE}' QUALIFY x IS NOT NULL
), ry AS (
  SELECT dd, CAST(c - LAG(c) OVER (ORDER BY dd) AS DOUBLE)
               / LAG(c) OVER (ORDER BY dd) AS y
  FROM daily WHERE event_type = '{CCF_Y_TYPE}' QUALIFY y IS NOT NULL
), j AS (
  SELECT rx.dd, rx.x, ry.y FROM rx JOIN ry ON ry.dd = rx.dd
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         list_sum(list(x ORDER BY dd)) AS sx,
         list_sum(list(y ORDER BY dd)) AS sy,
         list_sum(list(x * x ORDER BY dd)) AS sxx,
         list_sum(list(y * y ORDER BY dd)) AS syy,
         list_sum(list(x * y ORDER BY dd)) AS sxy
  FROM j
), cov AS (
  SELECT n, sx / n AS mx, sy / n AS my,
         (sxx - sx / n * sx) / (n - 1) AS vx,
         (syy - sy / n * sy) / (n - 1) AS vy,
         (sxy - sx / n * sy) / (n - 1) AS vxy
  FROM m
)
SELECT j.dd AS day_index,
       ((j.x - cov.mx) * (cov.vy * (j.x - cov.mx)
                          - cov.vxy * (j.y - cov.my))
        + (j.y - cov.my) * (cov.vx * (j.y - cov.my)
                            - cov.vxy * (j.x - cov.mx)))
         / (cov.vx * cov.vy - cov.vxy * cov.vxy) AS turbulence
FROM j, cov
""",
)
def ts_turbulence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kritzman-Li financial turbulence index: each day's
    ({CCF_X_TYPE}, {CCF_Y_TYPE}) return pair scored by its
    Mahalanobis distance from the full-sample mean under the
    full-sample 2x2 covariance (closed-form inverse) — the
    multivariate 'how unusual is today?' monitor that catches
    correlation breaks plain z-scores miss (a day can be ordinary
    in each series yet extraordinary in their JOINT move).
    Completes the risk shelf beside VaR (tail size), Parkinson
    (range vol) and min-variance (allocation).

    Exactness: returns are float divisions of exact integer pairs;
    the five moments fold in day order; every day's quadratic form
    is one fixed expression over identical doubles. Scale shape:
    one 2-series rollup, bounded folds, a declared 1-row covariance
    cross onto the O(days) pairs — linear end to end."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin(CCF_X_TYPE, CCF_Y_TYPE)
    )
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("1992-01-01")
        ).alias("dd"),
    ).agg(F.sum(F.expr(cents("value"))).cast("bigint").alias("c"))

    def rets(tp, out):
        # bounded: O(days) per-type rollup rows
        w = Window.orderBy("dd")
        return (
            daily.filter(F.col("event_type") == tp)
            .select(
                "dd",
                (
                    (F.col("c") - F.lag("c").over(w)).cast("double")
                    / F.lag("c").over(w)
                ).alias(out),
            )
            .filter(F.col(out).isNotNull())
        )

    rx = rets(CCF_X_TYPE, "x")
    ry = rets(CCF_Y_TYPE, "y").select(F.col("dd").alias("dd_y"), "y")
    j = rx.join(ry, rx["dd"] == ry["dd_y"]).select("dd", "x", "y")
    arr = F.array_sort(
        F.collect_list(
            F.struct("dd", F.col("x").alias("x"), F.col("y").alias("y"))
        )
    )

    def fold(f):
        return F.aggregate(arr, F.lit(0.0), lambda acc, e: acc + f(e))

    m = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        fold(lambda e: e["x"]).alias("sx"),
        fold(lambda e: e["y"]).alias("sy"),
        fold(lambda e: e["x"] * e["x"]).alias("sxx"),
        fold(lambda e: e["y"] * e["y"]).alias("syy"),
        fold(lambda e: e["x"] * e["y"]).alias("sxy"),
    )
    n = F.col("n")
    cov = m.select(
        (F.col("sx") / n).alias("mx"),
        (F.col("sy") / n).alias("my"),
        ((F.col("sxx") - F.col("sx") / n * F.col("sx")) / (n - 1)).alias("vx"),
        ((F.col("syy") - F.col("sy") / n * F.col("sy")) / (n - 1)).alias("vy"),
        ((F.col("sxy") - F.col("sx") / n * F.col("sy")) / (n - 1)).alias(
            "vxy"
        ),
    )
    # bounded: 1-row covariance scalar
    out = j.crossJoin(F.broadcast(cov))
    zx = F.col("x") - F.col("mx")
    zy = F.col("y") - F.col("my")
    det = F.col("vx") * F.col("vy") - F.col("vxy") * F.col("vxy")
    return out.select(
        F.col("dd").alias("day_index"),
        (
            (
                zx * (F.col("vy") * zx - F.col("vxy") * zy)
                + zy * (F.col("vx") * zy - F.col("vxy") * zx)
            )
            / det
        ).alias("turbulence"),
    )


@query(
    "ts_garman_klass",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS hi,
         CAST(MIN(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS lo,
         CAST(MIN_BY(CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey)
              AS BIGINT) AS op,
         CAST(MAX_BY(CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey)
              AS BIGINT) AS cl
  FROM orders GROUP BY 1
), q AS (
  SELECT CAST(round(1000000000000.0 * ln(CAST(hi AS DOUBLE) / lo))
              AS BIGINT) AS lhl,
         CAST(round(1000000000000.0 * ln(CAST(cl AS DOUBLE) / op))
              AS BIGINT) AS lco
  FROM daily
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(CAST(lhl AS HUGEINT) * lhl) AS VARCHAR) AS DOUBLE)
           AS shl,
         CAST(CAST(SUM(CAST(lco AS HUGEINT) * lco) AS VARCHAR) AS DOUBLE)
           AS sco
  FROM q
)
SELECT n AS n_days,
       sqrt((0.5 * (shl / 1e24)
             - (2 * CAST('0.6931471805599453' AS DOUBLE) - 1)
               * (sco / 1e24)) / n) AS gk_vol_daily,
       sqrt((0.5 * (shl / 1e24)
             - (2 * CAST('0.6931471805599453' AS DOUBLE) - 1)
               * (sco / 1e24)) / n) * sqrt(252.0) AS gk_vol_annualized
FROM m
""",
)
def ts_garman_klass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Garman-Klass OHLC volatility of the daily order-price
    distribution: sigma^2 = mean[ 0.5 ln(H/L)^2 - (2 ln2 - 1)
    ln(C/O)^2 ] — ~7.4x more efficient than close-to-close and the
    drift-robust refinement of ts_parkinson_vol (which uses the
    range only); open/close are the first/last order of the day by
    key (the deterministic proxy this dateless fixture admits,
    documented). Deterministic MIN_BY/MAX_BY: o_orderkey is unique.

    Exactness: both per-day lns quantized at 1e-12 with exact
    HUGEINT/decimal(38) squares (order-free sums); ln 2 is a
    CAST-string literal; one fixed closing expression. One hash
    aggregate, a 1-row reduction."""
    c = F.expr(cents("o_totalprice"))
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.max(c).cast("bigint").alias("hi"),
            F.min(c).cast("bigint").alias("lo"),
            F.min_by(c, F.col("o_orderkey")).cast("bigint").alias("op"),
            F.max_by(c, F.col("o_orderkey")).cast("bigint").alias("cl"),
        )
    )
    q = daily.select(
        F.round(
            F.lit(1000000000000.0)
            * F.log(F.col("hi").cast("double") / F.col("lo"))
        )
        .cast("bigint")
        .alias("lhl"),
        F.round(
            F.lit(1000000000000.0)
            * F.log(F.col("cl").cast("double") / F.col("op"))
        )
        .cast("bigint")
        .alias("lco"),
    )
    m = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("lhl").cast("decimal(38,0)") * F.col("lhl"))
        .cast("double")
        .alias("shl"),
        F.sum(F.col("lco").cast("decimal(38,0)") * F.col("lco"))
        .cast("double")
        .alias("sco"),
    )
    ln2 = float.fromhex("0x1.62e42fefa39efp-1")
    var = (
        F.lit(0.5) * (F.col("shl") / F.lit(1e24))
        - (F.lit(2) * F.lit(ln2) - 1) * (F.col("sco") / F.lit(1e24))
    ) / F.col("n")
    return m.select(
        F.col("n").alias("n_days"),
        F.sqrt(var).alias("gk_vol_daily"),
        (F.sqrt(var) * F.sqrt(F.lit(252.0))).alias("gk_vol_annualized"),
    )


@query(
    "ts_rogers_satchell",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS hi,
         CAST(MIN(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS lo,
         CAST(MIN_BY(CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey)
              AS BIGINT) AS op,
         CAST(MAX_BY(CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey)
              AS BIGINT) AS cl
  FROM orders GROUP BY 1
), q AS (
  SELECT CAST(round(1000000000000.0 * ln(CAST(hi AS DOUBLE) / cl))
              AS BIGINT) AS lhc,
         CAST(round(1000000000000.0 * ln(CAST(hi AS DOUBLE) / op))
              AS BIGINT) AS lho,
         CAST(round(1000000000000.0 * ln(CAST(lo AS DOUBLE) / cl))
              AS BIGINT) AS llc,
         CAST(round(1000000000000.0 * ln(CAST(lo AS DOUBLE) / op))
              AS BIGINT) AS llo
  FROM daily
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(CAST(lhc AS HUGEINT) * lho
                       + CAST(llc AS HUGEINT) * llo) AS VARCHAR) AS DOUBLE)
           AS srs
  FROM q
)
SELECT n AS n_days,
       sqrt(srs / 1e24 / n) AS rs_vol_daily,
       sqrt(srs / 1e24 / n) * sqrt(252.0) AS rs_vol_annualized
FROM m
""",
)
def ts_rogers_satchell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rogers-Satchell OHLC volatility: sigma^2 = mean[ln(H/C)ln(H/O)
    + ln(L/C)ln(L/O)] — the DRIFT-INDEPENDENT member that completes
    the range-estimator trio (Parkinson: range only; Garman-Klass:
    efficient but zero-drift; RS stays unbiased under trend), so
    the three keys side by side diagnose whether apparent
    volatility is really drift. Same deterministic open/close
    proxies as ts_garman_klass.

    Exactness: four per-day lns quantized at 1e-12; each day's term
    is an exact HUGEINT/decimal(38) product-sum, so the total is
    order-free; one fixed closing expression. One hash aggregate,
    a 1-row reduction."""
    c = F.expr(cents("o_totalprice"))
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.max(c).cast("bigint").alias("hi"),
            F.min(c).cast("bigint").alias("lo"),
            F.min_by(c, F.col("o_orderkey")).cast("bigint").alias("op"),
            F.max_by(c, F.col("o_orderkey")).cast("bigint").alias("cl"),
        )
    )

    def lq(a, b):
        return F.round(
            F.lit(1000000000000.0)
            * F.log(F.col(a).cast("double") / F.col(b))
        ).cast("bigint")

    q = daily.select(
        lq("hi", "cl").alias("lhc"),
        lq("hi", "op").alias("lho"),
        lq("lo", "cl").alias("llc"),
        lq("lo", "op").alias("llo"),
    )
    m = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.col("lhc").cast("decimal(38,0)") * F.col("lho")
            + F.col("llc").cast("decimal(38,0)") * F.col("llo")
        )
        .cast("double")
        .alias("srs"),
    )
    vol = F.sqrt(F.col("srs") / F.lit(1e24) / F.col("n"))
    return m.select(
        F.col("n").alias("n_days"),
        vol.alias("rs_vol_daily"),
        (vol * F.sqrt(F.lit(252.0))).alias("rs_vol_annualized"),
    )
