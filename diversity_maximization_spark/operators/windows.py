"""Window functions (SURVEY.md §2.2-E).

Each window is one shuffle on its partition key; queries that stack
windows (sessionize) reuse the same partitioning so Catalyst plans a
single Exchange. Every ORDER BY inside a window is tie-broken with a
unique key — non-negotiable for oracle hash-stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources import load


@query(
    "win_topk_pergroup",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def win_topk_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (rank-filter pattern; at scale this
    is the per-group top-k that AQE turns into a partial top-k)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice", "rn"
        )
    )


@query(
    "win_rank_dense",
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice,
       RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk,
       DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk
FROM orders
""",
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "win_lag_lead",
    oracle="""
SELECT event_id, user_id,
       epoch(ts) - epoch(LAG(ts) OVER w) AS gap_sec,
       LEAD(event_id) OVER w AS next_event
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap per user. epoch seconds computed identically
    (timestamp_ntz treated as UTC in both engines)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (
            F.col("ts").cast("timestamp").cast("double")
            - F.lag(F.col("ts").cast("timestamp").cast("double")).over(w)
        ).alias("gap_sec"),
        F.lead("event_id").over(w).alias("next_event"),
    )


@query(
    "win_moving_avg",
    oracle="""
SELECT event_id, user_id,
       round(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7
FROM events
""",
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 6).alias("ma7")
    )


@query(
    "win_range_frame",
    oracle="""
SELECT o_orderkey, o_custkey,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                      RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS n_7d
FROM orders
""",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range frame: orders of the same customer in the trailing 7 days
    (inclusive). RANGE frames need no tie-break — peers share values."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("double"))
        .rangeBetween(-604800, 0)
    )
    return o.select(
        "o_orderkey", "o_custkey", F.count(F.lit(1)).over(w).alias("n_7d")
    )


@query(
    "win_running_total",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
         AS running_spend
FROM orders
""",
)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer (decimal-exact running sum)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
            .over(w)
            .cast("double")
            / 100
        ).alias("running_spend"),
    )


@query(
    "win_ntile_pctrank",
    oracle="""
SELECT o_orderkey,
       NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile,
       PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey) AS pct_rank
FROM orders
""",
)
def win_ntile_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global quartiles WITHOUT the single-partition window: exact
    distributed row numbers from plans/global_rank.py (quantile range
    buckets + per-bucket offsets + narrow Arrow map), then NTILE /
    PERCENT_RANK as closed-form column expressions. Same hash as the
    naive ``Window.orderBy`` form, but no task ever holds more than
    one bucket — the plan that survives 100 TB."""
    from ..plans.global_rank import (
        ntile_expr,
        percent_rank_expr,
        with_global_row_number,
    )

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    numbered, n = with_global_row_number(
        o, ["o_totalprice", "o_orderkey"], out_col="_rn"
    )
    return numbered.select(
        "o_orderkey",
        ntile_expr("_rn", n, 4).alias("quartile"),
        percent_rank_expr("_rn", n).alias("pct_rank"),
    )


@query(
    "win_sessionize",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id)) > 1800
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
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
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap sessionization: lag -> boundary flag -> running sum.
    Both windows share one partitioning (single Exchange in the plan).
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts_sec = F.col("ts").cast("timestamp").cast("double")
    prev_ts = F.lag(ts_sec).over(w)
    flagged = ev.withColumn(
        "new_sess",
        F.when(prev_ts.isNull() | ((ts_sec - prev_ts) > 1800), 1).otherwise(0),
    )
    sess = flagged.withColumn("session_id", F.sum("new_sess").over(wrun))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "win_first_last",
    oracle="""
SELECT DISTINCT user_id,
       FIRST_VALUE(event_type) OVER w AS first_type,
       LAST_VALUE(event_type)  OVER w AS last_type,
       COUNT(*) OVER (PARTITION BY user_id) AS n_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event type per user over the full-partition frame."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_events"),
    ).distinct()


@query(
    "funnel_signup_purchase",
    oracle="""
WITH f AS (
  SELECT user_id,
         MIN(ts) FILTER (event_type = 'signup')   AS first_signup,
         MIN(ts) FILTER (event_type = 'purchase') AS first_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(*) FILTER (first_signup IS NOT NULL) AS n_signed,
       COUNT(*) FILTER (first_signup IS NOT NULL
                        AND first_purchase > first_signup) AS n_converted
FROM f
""",
)
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite funnel analytic: users who signed up and later
    purchased — one conditional-min aggregation, no self-join (the
    shape that scales: a single shuffle on user_id)."""
    ev = load(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    return f.agg(
        F.count(F.when(F.col("first_signup").isNotNull(), 1)).alias("n_signed"),
        F.count(
            F.when(
                F.col("first_signup").isNotNull()
                & (F.col("first_purchase") > F.col("first_signup")),
                1,
            )
        ).alias("n_converted"),
    )


@query(
    "win_cume_dist",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice,
       CUME_DIST() OVER w AS cd,
       NTH_VALUE(o_totalprice, 2) OVER w AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey)
""",
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + nth_value per priority group. The order key includes
    the unique o_orderkey so frames (and therefore nth_value and the
    cume_dist numerator) are identical in both engines; cume_dist is a
    ratio of exact integers — the division is the same IEEE op."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@query(
    "win_topk_salted",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def win_topk_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase top-k per group: phase 1 ranks within
    (group, salt) — 8 salt buckets by hash of the row key, so a
    pathologically hot group spreads over 8 tasks — and keeps k rows
    per bucket; phase 2 re-ranks the ≤ 8k survivors per group. The
    oracle is the NAIVE single-window top-k: the hash match proves
    the salted plan computes identical semantics (any group's true
    top-3 survives its bucket's top-3). At 100 TB this is the shape
    that survives a group holding 10% of all rows; the plain
    win_topk_pergroup window would funnel that group through one
    task."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    salt = (F.xxhash64("o_orderkey") % 8).cast("int").alias("salt")
    w1 = Window.partitionBy("o_custkey", "salt").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    survivors = (
        o.withColumn("salt", salt)
        .withColumn("prn", F.row_number().over(w1))
        .filter(F.col("prn") <= 3)
    )
    w2 = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        survivors.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "win_reset_running_total",
    oracle="""
WITH marked AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS epoch
  FROM events
)
SELECT user_id, event_id, epoch,
       CAST(SUM(cents) OVER (PARTITION BY user_id, epoch
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100
         AS running_value
FROM marked
""",
)
def win_reset_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total that RESETS at each boundary event (here: every
    'signup' starts a new epoch for that user) — the conditional-
    cumsum idiom SQL has no native construct for: window 1 counts
    boundary markers into an epoch id, window 2 accumulates within
    (user, epoch). Same two-stacked-window shape as sessionization;
    the second window's (user_id, epoch) partitioning refines the
    first's, so the rows arrive already sorted and Catalyst plans one
    Exchange with two Window nodes. Exact integer cents keep the
    running sums hash-stable."""
    ev = load(spark, sf_dir, "events")
    w1 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
        F.sum(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        )
        .over(w1)
        .alias("epoch"),
    )
    w2 = (
        Window.partitionBy("user_id", "epoch")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return marked.select(
        "user_id",
        "event_id",
        "epoch",
        (F.sum("cents").over(w2).cast("double") / 100).alias(
            "running_value"
        ),
    )


@query(
    "win_percent_of_total",
    oracle="""
WITH per AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, n,
       CAST(cents AS DOUBLE) / 100 AS revenue,
       CAST(cents AS DOUBLE) / SUM(cents) OVER () AS rev_share,
       CAST(n AS DOUBLE) / SUM(n) OVER () AS count_share
FROM per
""",
)
def win_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total per group (the report staple): revenue and
    count shares per order priority. The unpartitioned window runs
    over the POST-AGGREGATION table (one row per priority — bounded),
    never the fact table, so the global frame is safe at any scale;
    exact integer cents make the shares hash-stable."""
    o = load(spark, sf_dir, "orders")
    per = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).alias(
            "cents"
        ),
    )
    wall = Window.partitionBy()
    return per.select(
        "o_orderpriority",
        "n",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        (F.col("cents").cast("double") / F.sum("cents").over(wall)).alias(
            "rev_share"
        ),
        (F.col("n").cast("double") / F.sum("n").over(wall)).alias(
            "count_share"
        ),
    )


_RC_FRAME = 20  # rolling frame: 19 preceding + current
_RC_CORR = (
    "CASE WHEN n > 1 THEN"
    " (n * sxy - sx * sy)"
    " / nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))"
    "          * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0)"
    " ELSE NULL END"
)


@query(
    "win_rolling_corr",
    oracle=f"""
WITH b AS (
  SELECT event_type, event_id, ts,
         CAST(ROUND((value) * 100) AS BIGINT) AS x,
         CAST(floor(epoch(ts)) AS BIGINT)
           - (SELECT CAST(floor(epoch(MIN(ts))) AS BIGINT) FROM events) AS y
  FROM events
), w AS (
  SELECT event_type, event_id,
         COUNT(*) OVER f AS n,
         CAST(SUM(x) OVER f AS BIGINT) AS sx,
         CAST(SUM(y) OVER f AS BIGINT) AS sy,
         CAST(SUM(x * y) OVER f AS BIGINT) AS sxy,
         CAST(SUM(x * x) OVER f AS BIGINT) AS sxx,
         CAST(SUM(y * y) OVER f AS BIGINT) AS syy
  FROM b
  WINDOW f AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN {_RC_FRAME - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type, event_id, n, {_RC_CORR} AS rolling_corr
FROM w
""",
)
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling Pearson correlation between metric value and time over
    a {_RC_FRAME}-row frame per series — the windowed drift detector
    (is this metric locally trending?), and the windowed-statistics
    generalization of agg_regr_trend. All five moment sums are EXACT
    integer window aggregates (value cents x seconds-since-corpus-
    start — the epoch shift keeps y^2 sums far inside int64), so the
    only float math is the closed-form corr expression evaluated from
    identical integers with identical text on both engines:
    bit-exact, no rounding needed. Zero-variance frames pin to NULL
    via nullif on both engines (the ADVICE-r2 zscore rule). One
    Exchange per event_type serves all six window aggregates."""
    ev = load(spark, sf_dir, "events")
    t0 = ev.agg(
        F.expr("CAST(CAST(MIN(ts) AS TIMESTAMP) AS BIGINT)")
    ).collect()[0][0]
    b = ev.select(
        "event_type",
        "event_id",
        "ts",
        F.expr("CAST(ROUND((value) * 100) AS BIGINT)").alias("x"),
        (
            F.expr("CAST(CAST(ts AS TIMESTAMP) AS BIGINT)")
            - F.lit(t0)
        ).alias("y"),
    )
    f = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_RC_FRAME - 1), 0)
    )
    w = b.select(
        "event_type",
        "event_id",
        F.count(F.lit(1)).over(f).alias("n"),
        F.sum("x").over(f).alias("sx"),
        F.sum("y").over(f).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(f).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(f).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(f).alias("syy"),
    )
    return w.select(
        "event_type", "event_id", "n", F.expr(_RC_CORR).alias("rolling_corr")
    )

@query(
    "win_moving_median",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, cents,
       median(cents) OVER (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         AS med7
FROM daily
""",
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 7-day moving median of daily revenue per event type.
    Spark has no percentile-as-window-frame builtin, so the frame is
    materialized as a sorted array (collect_list over the ROWS frame
    + array_sort — pure JVM, no Python) and the interpolated median
    is read off positionally: middle element for odd frames, the
    mean of the two middles for even. Frames are bounded (<= 7
    elements), so per-row state is O(1) and the whole thing is the
    usual one-Exchange-per-window-family plan; never use this shape
    for unbounded frames. Cents are exact integers, the even-frame
    midpoint is (a+b)/2 of integers — identical IEEE in DuckDB's
    median() window aggregate."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias("cents"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("cents").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    med = (lo.cast("double") + hi.cast("double")) / 2
    return daily.select("event_type", "day", "cents", med.alias("med7"))

@query(
    "win_hampel_filter",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n,
       median(n) OVER w AS med7,
       mad(n) OVER w AS mad7,
       COALESCE(abs(n - median(n) OVER w)
                  > 3 * 1.4826 * nullif(mad(n) OVER w, 0),
                FALSE) AS is_outlier
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
""",
)
def win_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel outlier filter — the standard time-series spike cleaner:
    each daily count is judged against the MEDIAN and MAD of its own
    centered 7-point window (3*1.4826*MAD threshold), so one spike
    can neither hide itself nor poison its neighbors' thresholds the
    way a rolling mean/stddev does. Spark has neither median nor MAD
    as window frames; both are read exactly off ONE sorted
    collect_list per frame (bounded 7 elements): interpolated median
    positionally, MAD as the interpolated median of the sorted
    absolute deviations (transform + array_sort, all JVM
    higher-order functions). Zero-MAD frames (constant weeks) pin
    the flag FALSE via nullif in both engines."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return hampel_filter(
        daily,
        key_cols=["event_type"],
        order_col="day",
        value_col="n",
        half_window=3,
    )


def hampel_filter(
    df: DataFrame,
    key_cols: list,
    order_col: str,
    value_col: str,
    half_window: int = 3,
    n_sigma: float = 3.0,
) -> DataFrame:
    """Generic Hampel filter over any keyed series DataFrame (the
    library form of win_hampel_filter): centered rolling median and
    MAD read exactly off one sorted bounded frame per row;
    zero-MAD frames pin the flag FALSE."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(-half_window, half_window)
    )

    def interp_median(arr):  # exact interpolated median of sorted arr
        n = F.size(arr)
        lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
        hi = F.element_at(arr, (n / 2 + 1).cast("int"))
        return (lo.cast("double") + hi.cast("double")) / 2

    frame = F.array_sort(F.collect_list(value_col).over(w))
    med = interp_median(frame)
    with_med = df.select(
        *key_cols,
        order_col,
        value_col,
        frame.alias("frame"),
        med.alias("med7"),
    )
    devs = F.array_sort(
        F.expr("transform(frame, x -> abs(CAST(x AS DOUBLE) - med7))")
    )
    mad = interp_median(devs)
    return with_med.select(
        *key_cols,
        order_col,
        value_col,
        "med7",
        mad.alias("mad7"),
        F.coalesce(
            F.abs(F.col(value_col) - F.col("med7"))
            > n_sigma * 1.4826 * F.nullif(mad, F.lit(0.0)),
            F.lit(False),
        ).alias("is_outlier"),
    )

@query(
    "win_nth_value",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       nth_value(o_totalprice, 3) OVER w AS third_highest,
       nth_value(o_orderkey, 2) OVER w AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over the full partition frame — the 'third-highest
    order per customer' ask that rank+filter answers clumsily;
    NULL where the customer has fewer than n orders. Unbounded
    frame + unique tie-break keeps every engine's answer
    identical."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.nth_value("o_totalprice", 3).over(w).alias("third_highest"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )

@query(
    "win_time_range_frame",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
)
SELECT event_type, day,
       CAST(SUM(cents) OVER (PARTITION BY event_type ORDER BY epoch(day)
                             RANGE BETWEEN 172800 PRECEDING
                                       AND CURRENT ROW) AS DOUBLE) / 100
         AS rolling_3d_value
FROM daily
""",
)
def win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame — the rolling 3-DAY revenue window
    that a ROWS frame cannot express when days are missing (a gap
    must shrink the window, not slide over it). Spark range frames
    need a numeric order key, so the day rolls to epoch seconds and
    the frame is RANGE [-2 days, now] (172800 s); the oracle states
    the identical numeric formulation. Runs on the O(days x types)
    rollup; the window partitions by series. Exact integer cents
    inside the frame, one cast out."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias("cents"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_timestamp("day"))
        .rangeBetween(-172800, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        (F.sum("cents").over(w).cast("double") / 100).alias(
            "rolling_3d_value"
        ),
    )


@query(
    "win_moving_p90",
    oracle="""
WITH c AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), f AS (
  SELECT user_id, event_id,
         list_sort(list(cents) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS frame
  FROM c
)
SELECT user_id, event_id,
       CAST(len(frame) AS INTEGER) AS n_frame,
       CAST(frame[CAST(ceil(0.9 * len(frame)) AS INTEGER)] AS DOUBLE) / 100
         AS p90
FROM f
""",
)
def win_moving_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling 90th percentile over the trailing 7-event frame
    per user — the tail-latency-style monitor for spend spikes. The
    order statistic is ONE SHARED FORMULATION in both engines
    (sorted frame list indexed at ceil(0.9 * n) — the drift_psi
    lesson: never pair Spark percentile against DuckDB
    quantile_disc, their discrete conventions differ), over exact
    integer cents. Scale shape: a single user-partitioned window
    whose frame is a bounded 7-element list — the same
    sorted-bounded-frame plan as win_moving_median."""
    ev = load(spark, sf_dir, "events")
    # bounded: 7-row frame per user-partitioned window
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    c = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
    )
    f = c.select(
        "user_id",
        "event_id",
        F.sort_array(F.collect_list("cents").over(w)).alias("frame"),
    )
    return f.select(
        "user_id",
        "event_id",
        F.size("frame").cast("int").alias("n_frame"),
        (
            F.element_at(
                "frame",
                F.ceil(F.lit(0.9) * F.size("frame")).cast("int"),
            ).cast("double")
            / 100
        ).alias("p90"),
    )


@query(
    "win_gap_islands",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM events
), r AS (
  SELECT user_id, day,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM days
), a AS (
  SELECT user_id, day,
         CAST(day AS DATE) - CAST(rn AS INTEGER) AS anchor
  FROM r
)
SELECT user_id,
       CAST(MIN(day) AS TIMESTAMP) AS island_start,
       CAST(MAX(day) AS TIMESTAMP) AS island_end,
       CAST(COUNT(*) AS INTEGER) AS island_days
FROM a GROUP BY user_id, anchor
""",
)
def win_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive active days per
    user (the streak detector behind retention and engagement
    features). The classic trick — day minus its per-user row number
    is constant within a run — turns the sequence problem into ONE
    partitioned window plus ONE groupBy; no self-join, no iteration.
    Scale shape: both the window and the aggregate hash-partition by
    user_id and reuse the same shuffle (AQE keeps the exchange);
    state per user is its distinct-day count. Day boundaries stay
    TIMESTAMP in the output (DATE-coercion trap)."""
    ev = load(spark, sf_dir, "events")
    return gap_islands_over(ev, "user_id", "ts")


def gap_islands_over(
    df: DataFrame, key_col: str, ts_col: str
) -> DataFrame:
    """Consecutive-day island kernel over (key, timestamp) rows —
    shared by win_gap_islands and api.gap_islands."""
    days = df.select(
        key_col, F.date_trunc("day", ts_col).alias("day")
    ).distinct()
    w = Window.partitionBy(key_col).orderBy("day")
    a = days.withColumn("rn", F.row_number().over(w)).withColumn(
        "anchor", F.expr("date_add(CAST(day AS DATE), -CAST(rn AS INT))")
    )
    return (
        a.groupBy(key_col, "anchor")
        .agg(
            F.min("day").alias("island_start"),
            F.max("day").alias("island_end"),
            F.count(F.lit(1)).cast("int").alias("island_days"),
        )
        .select(key_col, "island_start", "island_end", "island_days")
    )


@query(
    "ts_rolling_xcorr",
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
), f AS (
  SELECT day,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(x) OVER w AS BIGINT) AS sx,
         CAST(SUM(y) OVER w AS BIGINT) AS sy,
         CAST(SUM(x * y) OVER w AS BIGINT) AS sxy,
         CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
         CAST(SUM(y * y) OVER w AS BIGINT) AS syy
  FROM d
  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT day,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr7
FROM f
WHERE n = 7 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
""",
)
def ts_rolling_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day Pearson CROSS-correlation between the daily purchase
    and click revenue series — the co-movement monitor behind metric
    diagnosis dashboards. All six frame sums (n, sx, sy, sxy, sxx,
    syy) are exact BIGINTs over integer cents, so the closed-form
    correlation is ONE float expression evaluated in the same order
    in both engines (sqrt is correctly rounded IEEE — no libm
    divergence), no rounding needed. Degenerate frames (partial or
    zero-variance) are filtered by exact integer predicates. The
    window runs over the daily rollup. Scale: per-series-day state;
    at N series the window partitions by series key."""
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
    # bounded: one row per calendar day of the fixture span
    w = Window.orderBy("day").rowsBetween(-6, 0)
    f = d.select(
        "day",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).cast("bigint").alias("sx"),
        F.sum("y").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("bigint").alias("syy"),
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return f.where(
        (F.col("n") == 7) & (varx > 0) & (vary > 0)
    ).select(
        "day",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (
                F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double"))
            )
        ).alias("corr7"),
    )


@query(
    "win_max_drawdown",
    oracle="""
WITH d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), cumt AS (
  SELECT event_type, day,
         CAST(SUM(c) OVER w AS BIGINT) AS cum
  FROM d
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), r AS (
  SELECT event_type, day, cum,
         CAST(MAX(cum) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS runmax
  FROM cumt
), dd AS (
  SELECT event_type, day, runmax - cum AS drawdown FROM r
), mx AS (
  SELECT event_type, CAST(MAX(drawdown) AS BIGINT) AS max_dd
  FROM dd GROUP BY event_type
)
SELECT m.event_type,
       CAST(m.max_dd AS DOUBLE) / 100 AS max_drawdown,
       (SELECT MIN(day) FROM dd
        WHERE dd.event_type = m.event_type
          AND dd.drawdown = m.max_dd) AS trough_day
FROM mx m
""",
)
def win_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative daily revenue per event
    type — peak-to-trough decline, the risk statistic for any
    monotone-ish KPI series. Running sum and running max are EXACT
    integer cents (a nested window in one shared partition/order),
    drawdown = runmax - cum is integer subtraction, so max and the
    earliest trough day are tie-unambiguous. One Exchange serves
    both windows; everything after runs on the daily rollup."""
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
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = d.select(
        "event_type",
        "day",
        F.sum("c").over(w).cast("bigint").alias("cum"),
    )
    r = r.withColumn("runmax", F.max("cum").over(w).cast("bigint"))
    dd = r.select(
        "event_type", "day", (F.col("runmax") - F.col("cum")).alias("drawdown")
    )
    mx = dd.groupBy("event_type").agg(
        F.max("drawdown").cast("bigint").alias("max_dd")
    )
    trough = (
        dd.join(mx, "event_type")
        .where(F.col("drawdown") == F.col("max_dd"))
        .groupBy("event_type", "max_dd")
        .agg(F.min("day").alias("trough_day"))
    )
    return trough.select(
        "event_type",
        (F.col("max_dd").cast("double") / 100).alias("max_drawdown"),
        "trough_day",
    )


@query(
    "win_ratio_to_report",
    oracle="""
WITH c AS (
  SELECT l_orderkey, l_linenumber,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
  FROM lineitem
), t AS (
  SELECT l_orderkey, l_linenumber, pc,
         CAST(SUM(pc) OVER (PARTITION BY l_orderkey) AS BIGINT)
           AS order_total
  FROM c
)
SELECT l_orderkey, l_linenumber,
       CAST(pc AS DOUBLE) / 100 AS line_price,
       CAST(pc AS DOUBLE) / CAST(order_total AS DOUBLE) AS share_of_order
FROM t
""",
)
def win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO_TO_REPORT: each line item's share of its order total —
    the classic within-group contribution window (Oracle/Redshift
    surface parity). The partition total is one unordered window
    aggregate over exact integer cents (order-independent), and the
    share is ONE double division — bit-identical with no rounding.
    One hash-partitioned exchange on the order key."""
    li = load(spark, sf_dir, "lineitem")
    c = li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias("pc"),
    )
    w = Window.partitionBy("l_orderkey")
    t = c.withColumn("order_total", F.sum("pc").over(w).cast("bigint"))
    return t.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("pc").cast("double") / 100).alias("line_price"),
        (
            F.col("pc").cast("double") / F.col("order_total").cast("double")
        ).alias("share_of_order"),
    )


@query(
    "win_vwap",
    oracle="""
WITH c AS (
  SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
         CAST(round(l_quantity) AS BIGINT) AS q
  FROM lineitem
), f AS (
  SELECT l_partkey, l_orderkey, l_linenumber,
         CAST(SUM(pc * q) OVER w AS BIGINT) AS spq,
         CAST(SUM(q) OVER w AS BIGINT) AS sq
  FROM c
  WINDOW w AS (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT l_partkey, l_orderkey, l_linenumber,
       CAST(spq AS DOUBLE) / CAST(sq AS DOUBLE) / 100 AS vwap10
FROM f
""",
)
def win_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price over the trailing 10 shipments
    per part — sum(price x qty)/sum(qty) with BOTH frame sums exact
    BIGINTs (price cents x integer quantity), so the VWAP is one
    double division then one descale, bit-identical with no
    rounding. One part-partitioned window, deterministic
    (shipdate, orderkey, linenumber) order."""
    li = load(spark, sf_dir, "lineitem")
    c = li.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias("pc"),
        F.expr("CAST(ROUND(l_quantity) AS BIGINT)").alias("q"),
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-9, 0)
    )
    f = c.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("pc") * F.col("q")).over(w).cast("bigint").alias("spq"),
        F.sum("q").over(w).cast("bigint").alias("sq"),
    )
    return f.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        (
            F.col("spq").cast("double") / F.col("sq").cast("double") / 100
        ).alias("vwap10"),
    )


@query(
    "win_ignore_nulls",
    oracle="""
WITH masked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_type = 'purchase'
              THEN CAST(round(value * 100) AS BIGINT) END AS purchase_c
  FROM events
)
SELECT user_id, event_id,
       CAST(LAST_VALUE(purchase_c IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) / 100 AS last_purchase_value,
       CAST(LAG(purchase_c IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
       ) AS DOUBLE) / 100 AS prev_purchase_value
FROM masked
""",
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window surface parity: carry the most recent
    purchase amount forward through non-purchase events (LAST_VALUE
    ... IGNORE NULLS — the LOCF idiom as a window function, not the
    join-based ts_gapfill_locf), and the strictly-previous purchase
    via LAG ... IGNORE NULLS. Sparse column stays exact integer
    cents; the two functions share one user-partitioned exchange.
    Spark expresses the pair as last(expr, ignoreNulls=True) and
    lag with ignoreNulls."""
    ev = load(spark, sf_dir, "events")
    masked = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.col("event_type") == "purchase",
            F.expr("CAST(ROUND(value * 100) AS BIGINT)"),
        ).alias("purchase_c"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return masked.select(
        "user_id",
        "event_id",
        (
            F.last("purchase_c", ignorenulls=True)
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
            / 100
        ).alias("last_purchase_value"),
        (
            F.expr(
                "lag(purchase_c, 1) IGNORE NULLS OVER "
                "(PARTITION BY user_id ORDER BY ts, event_id)"
            ).cast("double")
            / 100
        ).alias("prev_purchase_value"),
    )


@query(
    "win_longest_streak",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
  FROM events
), isl AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
           AS anchor
  FROM ud
), runs AS (
  SELECT user_id, anchor, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM isl GROUP BY user_id, anchor
)
SELECT user_id,
       CAST(MAX(run_len) AS BIGINT) AS longest_streak,
       CAST(SUM(run_len) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks
FROM runs GROUP BY user_id
""",
)
def win_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of CONSECUTIVE active days per user — the
    engagement-streak metric (think login streaks) and the canonical
    gaps-and-islands reduction: distinct (user, epoch-day) pairs,
    anchor = day minus the per-user ROW_NUMBER (constant within a
    consecutive run, strictly distinct across runs), then two
    integer aggs — run lengths per (user, anchor), max/sum/count per
    user. Dates are epoch-day INTEGERS in both engines (datediff vs
    date_diff from 1970-01-01), so the whole operator is exact
    integer arithmetic with no date-type canonicalization risk.
    Shape at 100 TB: one shuffled distinct + one user-partitioned
    window + two per-user aggs — user_id is the high-cardinality
    key, parallelism never collapses."""
    ev = load(spark, sf_dir, "events")
    return longest_streaks_over(ev, "user_id", "ts")


def longest_streaks_over(
    df: DataFrame, key_col: str, ts_col: str
) -> DataFrame:
    """Generic consecutive-day streak kernel over any (key, ts)
    event DataFrame — the library form of win_longest_streak (same
    epoch-day integer algebra and island anchors)."""
    ud = df.select(
        F.col(key_col).alias("user_id"),
        F.datediff(F.col(ts_col).cast("date"), F.lit("1970-01-01")).alias(
            "day"
        ),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = ud.withColumn(
        "anchor", F.col("day") - F.row_number().over(w)
    )
    runs = isl.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).cast("bigint").alias("run_len")
    )
    return runs.groupBy("user_id").agg(
        F.max("run_len").cast("bigint").alias("longest_streak"),
        F.sum("run_len").cast("bigint").alias("n_active_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
    )


ALARM_THRESHOLD = 100.0
ALARM_COOLDOWN_US = 1_800_000_000  # 30 minutes


@query(
    "win_alarm_debounce",
    oracle=f"""
WITH RECURSIVE cand AS (
  SELECT user_id, event_id,
         date_diff('microseconds', TIMESTAMP '2024-01-01', ts) AS us,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE value > {ALARM_THRESHOLD}
), r AS (
  SELECT user_id, event_id, us, rn,
         TRUE AS emitted, us AS last_emit
  FROM cand WHERE rn = 1
  UNION ALL
  SELECT c.user_id, c.event_id, c.us, c.rn,
         c.us - r.last_emit > {ALARM_COOLDOWN_US} AS emitted,
         CASE WHEN c.us - r.last_emit > {ALARM_COOLDOWN_US}
              THEN c.us ELSE r.last_emit END AS last_emit
  FROM r JOIN cand c ON c.user_id = r.user_id AND c.rn = r.rn + 1
)
SELECT user_id, event_id, CAST(rn AS BIGINT) AS candidate_seq, emitted
FROM r
""",
)
def win_alarm_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert debouncing with a refractory period — the on-call
    pipeline primitive: every reading above {ALARM_THRESHOLD} is an
    alarm CANDIDATE, but an alarm only FIRES if 30 minutes have
    passed since the last FIRED alarm for that user. The dependency
    chains through emissions (a suppressed candidate does NOT reset
    the clock), so no window/gaps-islands expression exists — this
    is inherently a per-key sequential fold, run as one shuffle by
    user_id + an Arrow applyInPandas scan with one integer of state
    (the ts_ewma execution contract, but INTEGER state: microsecond
    timestamps, so the replay is exact with no float discipline
    needed at all). The oracle walks the identical recurrence with
    a recursive CTE (ts_holt pattern). Candidate filtering pushes
    to the scan; the fold touches only above-threshold rows."""
    ev = load(spark, sf_dir, "events")
    cand = ev.filter(F.col("value") > ALARM_THRESHOLD).select(
        "user_id",
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'2024-01-01', ts)"
        ).alias("us"),
    )
    cooldown = ALARM_COOLDOWN_US

    def fold(pdf):
        pdf = pdf.sort_values(["us", "event_id"])
        emitted, seqs = [], []
        last = None
        for i, us in enumerate(pdf["us"].to_numpy()):
            seqs.append(i + 1)
            if last is None or us - last > cooldown:
                emitted.append(True)
                last = us
            else:
                emitted.append(False)
        return pdf.assign(candidate_seq=seqs, emitted=emitted)

    out = cand.groupBy("user_id").applyInPandas(
        fold,
        "user_id bigint, event_id bigint, us bigint, "
        "candidate_seq bigint, emitted boolean",
    )
    return out.select("user_id", "event_id", "candidate_seq", "emitted")


@query(
    "win_rank_movers",
    oracle="""
WITH per AS (
  SELECT o_custkey AS c,
         CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 0 ELSE 1 END
           AS period,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1, 2
), r0 AS (
  SELECT c, rev AS rev0,
         ROW_NUMBER() OVER (ORDER BY -rev, c) AS rank0
  FROM per WHERE period = 0
), r1 AS (
  SELECT c, rev AS rev1,
         ROW_NUMBER() OVER (ORDER BY -rev, c) AS rank1
  FROM per WHERE period = 1
)
SELECT r0.c AS custkey,
       CAST(r0.rank0 AS BIGINT) AS rank_before,
       CAST(r1.rank1 AS BIGINT) AS rank_after,
       CAST(r0.rank0 - r1.rank1 AS BIGINT) AS rank_gain
FROM r0 JOIN r1 ON r1.c = r0.c
ORDER BY abs(r0.rank0 - r1.rank1) DESC, r0.c
LIMIT 25
""",
)
def win_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard movers report: rank every customer by revenue in
    the pre-1998 and 1998+ halves (dense total orders, ties broken
    by key) and surface the 25 biggest rank swings — 'who shot up /
    collapsed between periods', the delta view a static top-k never
    shows. Both rankings run through the plans/global_rank.py
    two-phase row-number machinery with the negated-revenue
    descending trick (NO single-task ORDER BY window over the
    customer table); the rank delta is a pure bigint so the top-25
    cut is TakeOrderedAndProject on integers. Oracle ranks with
    plain global windows (oracle-scale-only, as usual)."""
    from ..plans.global_rank import with_global_row_number

    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c"),
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), 0
        )
        .otherwise(1)
        .alias("period"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("rc"),
    )
    per = o.groupBy("c", "period").agg(
        F.sum("rc").cast("bigint").alias("rev")
    )
    p0 = per.filter(F.col("period") == 0).select(
        "c", (-F.col("rev")).alias("neg_rev")
    )
    p1 = per.filter(F.col("period") == 1).select(
        "c", (-F.col("rev")).alias("neg_rev")
    )
    r0, _ = with_global_row_number(p0, ["neg_rev", "c"], out_col="rank0")
    r1, _ = with_global_row_number(p1, ["neg_rev", "c"], out_col="rank1")
    joined = r0.select("c", "rank0").join(
        r1.select("c", "rank1"), "c"
    )
    return (
        joined.select(
            F.col("c").alias("custkey"),
            F.col("rank0").cast("bigint").alias("rank_before"),
            F.col("rank1").cast("bigint").alias("rank_after"),
            (F.col("rank0") - F.col("rank1"))
            .cast("bigint")
            .alias("rank_gain"),
        )
        .orderBy(F.abs(F.col("rank_gain")).desc(), "custkey")
        .limit(25)
    )


@query(
    "win_rolling_beta",
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
), w AS (
  SELECT day,
         ROW_NUMBER() OVER (ORDER BY day) AS rn,
         CAST(COUNT(*) OVER win AS BIGINT) AS n,
         CAST(SUM(x) OVER win AS BIGINT) AS sx,
         CAST(SUM(y) OVER win AS BIGINT) AS sy,
         CAST(SUM(x * y) OVER win AS BIGINT) AS sxy,
         CAST(SUM(x * x) OVER win AS BIGINT) AS sxx
  FROM daily
  WINDOW win AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT day,
       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / nullif(CAST(n AS DOUBLE) * sxx
                  - CAST(sx AS DOUBLE) * sx, 0) AS beta
FROM w WHERE rn >= 14
""",
)
def win_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 14-day OLS slope of daily purchase revenue against
    daily view revenue — the rolling-beta exposure measure (how many
    cents of purchases ride on each cent of views this fortnight).
    All five windowed sums are order-independent BIGINTs over
    integer cents (largest term n*sxx stays far under int64 at any
    SF of this value domain); beta is one float expression from
    exact integers with identical text both engines — bit-exact, no
    rounding. Emitted only for full 14-day windows."""
    from .aggregates import cents

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
    # bounded: O(days) daily rollup rows
    wd = Window.orderBy("day")
    win = wd.rowsBetween(-13, 0)
    w = daily.select(
        "day",
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(win).cast("bigint").alias("n"),
        F.sum("x").over(win).cast("bigint").alias("sx"),
        F.sum("y").over(win).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(win).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(win).cast("bigint").alias("sxx"),
    )
    return w.filter(F.col("rn") >= 14).select(
        "day",
        (
            (F.col("n").cast("double") * F.col("sxy")
             - F.col("sx").cast("double") * F.col("sy"))
            / F.nullif(
                F.col("n").cast("double") * F.col("sxx")
                - F.col("sx").cast("double") * F.col("sx"),
                F.lit(0.0),
            )
        ).alias("beta"),
    )
