"""Data-quality audit operators (the production gate a 100 TB
ingest runs before training): declarative rules evaluated as
aggregates — null rates, range violations, key uniqueness,
referential integrity — plus Spark's native observe() metrics API
for free in-flight counters on a query that is running anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load


@query(
    "dq_checks",
    oracle="""
SELECT 'customer_key_unique' AS rule, (
  SELECT COUNT(*) FROM (
    SELECT c_custkey FROM customer GROUP BY c_custkey HAVING COUNT(*) > 1)
) AS n_violations
UNION ALL
SELECT 'orders_fk_customer', (
  SELECT COUNT(*) FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'lineitem_qty_range', (
  SELECT COUNT(*) FROM lineitem
  WHERE l_quantity IS NULL OR l_quantity <= 0 OR l_quantity > 100)
UNION ALL
SELECT 'events_value_nonnull', (
  SELECT COUNT(*) FROM events WHERE value IS NULL)
UNION ALL
SELECT 'documents_text_nonempty', (
  SELECT COUNT(*) FROM documents
  WHERE text IS NULL OR length(text) = 0)
""",
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit: five rule families evaluated
    with ONE aggregate-shaped job per table — uniqueness is a
    group-count, referential integrity a LEFT ANTI join count, range
    and null rules are conditional counts inside the scan. Violations
    come back as a tiny (rule, count) report; a green run is all
    zeros. At 100 TB every rule is either a narrow scan-side count or
    one keyed shuffle — the audit costs no more than the cheapest
    aggregate over each table."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    ev = load(spark, sf_dir, "events")
    d = load(spark, sf_dir, "documents")

    dup_keys = (
        c.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("customer_key_unique").alias("rule"), "n_violations")
    )
    orphans = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("orders_fk_customer").alias("rule"), "n_violations")
    )
    qty = (
        li.agg(
            F.sum(
                F.when(
                    F.col("l_quantity").isNull()
                    | (F.col("l_quantity") <= 0)
                    | (F.col("l_quantity") > 100),
                    1,
                ).otherwise(0)
            ).alias("n_violations")
        )
        .select(F.lit("lineitem_qty_range").alias("rule"), "n_violations")
    )
    nulls = (
        ev.agg(
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias(
                "n_violations"
            )
        )
        .select(F.lit("events_value_nonnull").alias("rule"), "n_violations")
    )
    empties = (
        d.agg(
            F.sum(
                F.when(
                    F.col("text").isNull() | (F.length("text") == 0), 1
                ).otherwise(0)
            ).alias("n_violations")
        )
        .select(F.lit("documents_text_nonempty").alias("rule"), "n_violations")
    )
    return (
        dup_keys.unionAll(orphans)
        .unionAll(qty)
        .unionAll(nulls)
        .unionAll(empties)
    )


@query(
    "obs_quality_metrics",
    oracle="""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nonpositive,
       MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS max_price_cents
FROM orders
""",
)
def obs_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native observe() metrics: quality counters attached to
    a query that runs ANYWAY (here a pass over orders) — the
    zero-extra-scan way to monitor a production pipeline (metrics
    accumulate inside the existing job, surfaced via the Observation
    API, no second aggregation job over the data)."""
    from pyspark.sql import Observation

    o = load(spark, sf_dir, "orders")
    obs = Observation("dq")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "n_nonpositive"
        ),
        # observe() forbids DISTINCT aggregates — use min/max style
        # counters (the typical in-flight monitors anyway)
        F.max(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).alias(
            "max_price_cents"
        ),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_nonpositive"], m["max_price_cents"])],
        "n_rows bigint, n_nonpositive bigint, max_price_cents bigint",
    )


@query(
    "feat_bucketize",
    oracle="""
WITH t AS (
  SELECT c_custkey, c_acctbal,
         NTILE(8) OVER (ORDER BY c_acctbal, c_custkey) AS bucket
  FROM customer
)
SELECT bucket, COUNT(*) AS n,
       round(MIN(c_acctbal), 2) AS lo, round(MAX(c_acctbal), 2) AS hi
FROM t GROUP BY bucket
ORDER BY bucket
""",
)
def feat_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth feature bucketization (the quantile-binning step of
    feature engineering): exact NTILE(8) over account balance via the
    distributed global-row-number plan (plans/global_rank.py — no
    single-partition window), reporting each bucket's population and
    [lo, hi] bounds. Ties broken by key so the assignment is total
    and engine-independent."""
    from ..plans.global_rank import ntile_expr, with_global_row_number

    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    numbered, n = with_global_row_number(
        c, ["c_acctbal", "c_custkey"], out_col="_rn"
    )
    return (
        numbered.select(
            "c_custkey", "c_acctbal", ntile_expr("_rn", n, 8).alias("bucket")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("lo"),
            F.round(F.max("c_acctbal"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "feat_string_index",
    oracle="""
WITH freq AS (
  SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment
), idx AS (
  SELECT c_mktsegment,
         ROW_NUMBER() OVER (ORDER BY n DESC, c_mktsegment) - 1 AS label_idx
  FROM freq
)
SELECT c.c_custkey, c.c_mktsegment, i.label_idx
FROM customer c JOIN idx i ON c.c_mktsegment = i.c_mktsegment
""",
)
def feat_string_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StringIndexer semantics without MLlib: categorical labels map
    to dense integer ids ordered by frequency (most frequent = 0),
    ties by name — deterministic on any engine. The index table is
    one tiny agg (cardinality of the category, not the data) that
    broadcasts back onto the rows: the standard train-time encoding
    pass, shuffle-free on the fact side."""
    c = load(spark, sf_dir, "customer")
    from pyspark.sql.window import Window

    freq = c.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    idx = freq.select(
        "c_mktsegment",
        (
            F.row_number().over(
                # bounded: 5 market segments
                Window.orderBy(F.col("n").desc(), F.col("c_mktsegment"))
            )
            - 1
        ).alias("label_idx"),
    )
    return c.select("c_custkey", "c_mktsegment").join(
        F.broadcast(idx), "c_mktsegment"
    ).select("c_custkey", "c_mktsegment", "label_idx")


# Column kinds for the profiler: how each orders column contributes a
# numeric min/max (strings profile nulls/distinct only).
_PROFILE_COLS: list[tuple[str, str]] = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _profile_oracle() -> str:
    parts = []
    for c, kind in _PROFILE_COLS:
        if kind == "num":
            mn, mx = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
        elif kind == "ts":
            mn, mx = f"epoch(MIN({c}))", f"epoch(MAX({c}))"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
        parts.append(
            f"SELECT '{c}' AS column_name,\n"
            f"       COUNT(*) - COUNT({c}) AS n_nulls,\n"
            f"       COUNT(DISTINCT {c}) AS n_distinct,\n"
            f"       {mn} AS min_num, {mx} AS max_num\n"
            f"FROM orders"
        )
    return "\nUNION ALL\n".join(parts)


@query("profile_columns", oracle=_profile_oracle())
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiler — per-column null count, exact distinct count,
    and numeric/temporal min-max — the first pass any ingest runs on
    an unknown 100 TB drop to choose partition columns, spot junk,
    and size dictionaries. ONE scan: all per-column aggregates fold
    into a single agg (Catalyst plans the multi-distinct via one
    Expand, so cost is one shuffle of (column-id, value) pairs, not
    one job per column — at 6 columns that is a 6x row expansion
    with map-side partial aggregation, the same shape Spark gives
    GROUPING SETS). The wide 1-row result is then unpivoted to the
    long (column_name, stats) form executor-side via an
    explode(array(struct...)) — no driver loop. The oracle runs the
    textbook one-SELECT-per-column UNION ALL, proving the fused
    single-scan plan is semantics-preserving."""
    return profile_table(load(spark, sf_dir, "orders"), _PROFILE_COLS)


def profile_table(
    o: DataFrame, cols: list[tuple[str, str]]
) -> DataFrame:
    """Generic one-scan column profiler over any DataFrame: cols is
    [(name, kind)] with kind in {'num', 'ts', 'str'}. See
    profile_columns for the plan analysis."""
    aggs = []
    for c, kind in cols:
        aggs.append(
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls")
        )
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
        if kind == "num":
            aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
        elif kind == "ts":
            # NTZ has no direct double cast; via TIMESTAMP under the
            # session's UTC zone == DuckDB epoch() on the same value.
            aggs.append(
                F.min(c).cast("timestamp").cast("double").alias(f"{c}__min")
            )
            aggs.append(
                F.max(c).cast("timestamp").cast("double").alias(f"{c}__max")
            )
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__max"))
    wide = o.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_num"),
            F.col(f"{c}__max").alias("max_num"),
        )
        for c, _ in cols
    ]
    return wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")

@query(
    "privacy_k_anon",
    oracle="""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
         COUNT(*) AS class_size
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT c_nationkey, c_mktsegment, bal_band, class_size,
       class_size >= 5 AS meets_k,
       CAST(MIN(class_size) OVER () AS BIGINT) AS k_anonymity
FROM classes
""",
)
def privacy_k_anon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers — the check a
    training-data pipeline runs before releasing user-derived
    features: group customers by the QI tuple (nation, market
    segment, account-balance band), report every equivalence class
    with its size, whether it meets k=5, and the dataset-wide
    k-anonymity level (the smallest class). One shuffled agg on the
    QI tuple; the global MIN window runs over the tiny class table
    (O(classes) rows, single partition is fine and the oracle shape),
    not the fact table."""
    cust = load(spark, sf_dir, "customer")
    classes = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    from pyspark.sql.window import Window as W

    return classes.select(
        "c_nationkey",
        "c_mktsegment",
        "bal_band",
        "class_size",
        (F.col("class_size") >= 5).alias("meets_k"),
        F.min("class_size")
        .over(W.partitionBy(F.lit(1)))
        .alias("k_anonymity"),
    )

@query(
    "privacy_l_diversity",
    oracle="""
WITH classes AS (
  SELECT c_nationkey,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
         CAST(COUNT(*) AS BIGINT) AS class_size,
         COUNT(DISTINCT c_mktsegment) AS l_distinct
  FROM customer
  GROUP BY 1, 2
)
SELECT c_nationkey, bal_band, class_size, l_distinct,
       l_distinct >= 3 AS meets_l,
       CAST(MIN(l_distinct) OVER () AS BIGINT) AS l_diversity
FROM classes
""",
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's necessary companion: a
    class can be large (k-anonymous) yet leak the sensitive
    attribute if every member shares one value. Group by the QI
    tuple (nation, balance band), count DISTINCT sensitive values
    (market segment) per class, flag classes below l=3, and report
    the dataset-wide l (the weakest class). Same scale shape as
    privacy_k_anon: one shuffled agg on the QI tuple; the global
    MIN window runs over the tiny class table."""
    cust = load(spark, sf_dir, "customer")
    classes = cust.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).alias("bal_band"),
    ).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct("c_mktsegment").alias("l_distinct"),
    )
    from pyspark.sql.window import Window as W

    return classes.select(
        "c_nationkey",
        "bal_band",
        "class_size",
        "l_distinct",
        (F.col("l_distinct") >= 3).alias("meets_l"),
        F.min("l_distinct")
        .over(W.partitionBy(F.lit(1)))
        .alias("l_diversity"),
    )


DP_EPS_SCALE = 10.0  # Laplace b = sensitivity/epsilon = 1/0.1


@query(
    "privacy_dp_counts",
    oracle=f"""
WITH cnts AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM customer GROUP BY 1, 2
), seeded AS (
  SELECT *,
         (( (strpos('0123456789abcdef', substr(md5(CAST(c_nationkey AS VARCHAR)
              || '|' || c_mktsegment), 1, 1)) - 1) * 268435456
          + (strpos('0123456789abcdef', substr(md5(CAST(c_nationkey AS VARCHAR)
              || '|' || c_mktsegment), 2, 1)) - 1) * 16777216
          + (strpos('0123456789abcdef', substr(md5(CAST(c_nationkey AS VARCHAR)
              || '|' || c_mktsegment), 3, 1)) - 1) * 1048576
          + (strpos('0123456789abcdef', substr(md5(CAST(c_nationkey AS VARCHAR)
              || '|' || c_mktsegment), 4, 1)) - 1) * 65536
          + (strpos('0123456789abcdef', substr(md5(CAST(c_nationkey AS VARCHAR)
              || '|' || c_mktsegment), 5, 1)) - 1) * 4096
          + (strpos('0123456789abcdef', substr(md5(CAST(c_nationkey AS VARCHAR)
              || '|' || c_mktsegment), 6, 1)) - 1) * 256
          + (strpos('0123456789abcdef', substr(md5(CAST(c_nationkey AS VARCHAR)
              || '|' || c_mktsegment), 7, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(md5(CAST(c_nationkey AS VARCHAR)
              || '|' || c_mktsegment), 8, 1)) - 1)) + 0.5) / 4294967296.0
           AS u
  FROM cnts
)
SELECT c_nationkey, c_mktsegment, true_count,
       round(true_count
             - {DP_EPS_SCALE} * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
               * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS dp_count
FROM seeded
""",
)
def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release counts with SEEDED Laplace
    noise — the reproducible-DP pattern real release pipelines use
    (a keyed PRG, not an OS RNG, so reruns and both engines draw the
    identical noise): u = (first 32 md5 bits of the group key + 0.5)
    / 2^32 in (0,1), inverse-CDF Laplace noise
    -b*sign(u-1/2)*ln(1-2|u-1/2|) with b = 1/eps = {b}. The uniform
    is an exact rational (identical in both engines), the ln/abs
    chain is the same IEEE expression order, and the result rounds
    to 6 dp per the ln policy. One shuffled agg; the noise is a
    narrow per-row expression.""".format(b=DP_EPS_SCALE)
    cust = load(spark, sf_dir, "customer")
    cnts = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("true_count")
    )
    key = F.concat(
        F.col("c_nationkey").cast("string"),
        F.lit("|"),
        F.col("c_mktsegment"),
    )
    u = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    noise = (
        F.lit(-DP_EPS_SCALE)
        * F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    )
    return cnts.select(
        "c_nationkey",
        "c_mktsegment",
        "true_count",
        F.round(F.col("true_count") + noise, 6).alias("dp_count"),
    )


@query(
    "feat_assembly",
    oracle="""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_error,
       COUNT(DISTINCT date_trunc('day', ts)) AS days_active,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100
         AS total_value,
       CAST(date_diff('day', CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP),
                      TIMESTAMP '2024-01-31 00:00:00') AS BIGINT)
         AS recency_days,
       CAST(SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
            AS DOUBLE) / 100 AS purchase_value
FROM events
GROUP BY user_id
""",
)
def feat_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store assembly: the per-user wide feature row a
    churn/LTV model trains on — per-type event counts (conditional
    aggregation, NOT a self-join per feature), distinct active days,
    exact-cents monetary totals, and recency vs the study end. ONE
    shuffled aggregate on user_id builds every feature; this is the
    shape that keeps feature backfills at one pass over 100 TB
    instead of one join per feature."""
    ev = load(spark, sf_dir, "events")

    def n_of(t: str):
        return (
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{t}")
        )

    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        n_of("view"),
        n_of("click"),
        n_of("purchase"),
        n_of("error"),
        F.countDistinct(F.date_trunc("day", "ts")).alias("days_active"),
        (
            F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).cast(
                "double"
            )
            / 100
        ).alias("total_value"),
        F.datediff(
            F.lit("2024-01-31"), F.date_trunc("day", F.max("ts"))
        )
        .cast("bigint")
        .alias("recency_days"),
        (
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.expr("CAST(ROUND(value * 100) AS BIGINT)"),
                ).otherwise(0)
            ).cast("double")
            / 100
        ).alias("purchase_value"),
    )

@query(
    "feat_winsorize",
    oracle="""
WITH q AS (
  SELECT c_mktsegment,
         quantile_cont(c_acctbal, 0.05) AS p05,
         quantile_cont(c_acctbal, 0.95) AS p95
  FROM customer GROUP BY c_mktsegment
)
SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal, q.p05, q.p95,
       CASE WHEN c.c_acctbal < q.p05 THEN q.p05
            WHEN c.c_acctbal > q.p95 THEN q.p95
            ELSE c.c_acctbal END AS acctbal_winsorized,
       c.c_acctbal < q.p05 OR c.c_acctbal > q.p95 AS clipped
FROM customer c JOIN q ON c.c_mktsegment = q.c_mktsegment
""",
)
def feat_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization — the outlier-capping step before
    feature scaling: account balances clip to their market segment's
    exact interpolated [p5, p95]. The quantile table is O(groups)
    and broadcast back, so the fact table sees one narrow map after
    one shuffled agg; EXACT percentile_cont interpolation matches
    DuckDB's quantile_cont bit-for-bit (both are linear
    interpolation between order statistics of the same doubles)."""
    c = load(spark, sf_dir, "customer")
    q = c.groupBy("c_mktsegment").agg(
        F.expr("percentile(c_acctbal, 0.05)").alias("p05"),
        F.expr("percentile(c_acctbal, 0.95)").alias("p95"),
    )
    j = c.join(F.broadcast(q), "c_mktsegment")
    clipped = (F.col("c_acctbal") < F.col("p05")) | (
        F.col("c_acctbal") > F.col("p95")
    )
    return j.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        "p05",
        "p95",
        F.when(F.col("c_acctbal") < F.col("p05"), F.col("p05"))
        .when(F.col("c_acctbal") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("c_acctbal"))
        .alias("acctbal_winsorized"),
        clipped.alias("clipped"),
    )

@query(
    "dq_freshness_sla",
    oracle="""
SELECT event_type AS feed,
       MAX(ts) AS latest_ts,
       CAST((epoch_us(TIMESTAMP '2024-01-31 00:00:00')
             - epoch_us(MAX(ts))) / 3600000000.0 AS DOUBLE)
         AS staleness_hours,
       (epoch_us(TIMESTAMP '2024-01-31 00:00:00')
        - epoch_us(MAX(ts))) / 3600000000.0 <= 24.0 AS within_sla,
       COUNT(*) AS n_rows
FROM events GROUP BY event_type
""",
)
def dq_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness SLA audit — the first page of every pipeline
    dashboard: per feed (event type), the latest landed timestamp,
    staleness versus the 2024-01-31 reference instant in hours
    (exact integer microseconds over a float constant — identical
    arithmetic both engines), and the 24-hour SLA verdict. One
    partial+final MAX/COUNT aggregate; the scan never re-reads for
    the audit."""
    ev = load(spark, sf_dir, "events")
    anchor = (
        "timestampdiff(MICROSECOND, MAX(ts),"
        " TIMESTAMP_NTZ'2024-01-31 00:00:00')"
    )
    return ev.groupBy(F.col("event_type").alias("feed")).agg(
        F.max("ts").alias("latest_ts"),
        (F.expr(anchor) / 3600000000.0).alias("staleness_hours"),
        (F.expr(anchor) / 3600000000.0 <= 24.0).alias("within_sla"),
        F.count(F.lit(1)).alias("n_rows"),
    )

@query(
    "drift_psi",
    oracle="""
WITH base AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events
), ref_day AS (
  SELECT MIN(day) AS d0 FROM base
), day0 AS (
  SELECT c FROM base, ref_day WHERE day = d0
), cnts AS (
  SELECT c, COUNT(*) AS cnt FROM day0 GROUP BY c
), cum AS (
  SELECT c, CAST(SUM(cnt) OVER (ORDER BY c) AS BIGINT) AS cum FROM cnts
), ntot AS (
  SELECT COUNT(*) AS n FROM day0
), bounds AS (
  SELECT MIN(CASE WHEN cum >= CEIL(1*n/10.0) THEN c END) AS b1,
         MIN(CASE WHEN cum >= CEIL(2*n/10.0) THEN c END) AS b2,
         MIN(CASE WHEN cum >= CEIL(3*n/10.0) THEN c END) AS b3,
         MIN(CASE WHEN cum >= CEIL(4*n/10.0) THEN c END) AS b4,
         MIN(CASE WHEN cum >= CEIL(5*n/10.0) THEN c END) AS b5,
         MIN(CASE WHEN cum >= CEIL(6*n/10.0) THEN c END) AS b6,
         MIN(CASE WHEN cum >= CEIL(7*n/10.0) THEN c END) AS b7,
         MIN(CASE WHEN cum >= CEIL(8*n/10.0) THEN c END) AS b8,
         MIN(CASE WHEN cum >= CEIL(9*n/10.0) THEN c END) AS b9
  FROM cum, ntot
), bucketed AS (
  SELECT day,
         1 + CAST(c > b1 AS INT) + CAST(c > b2 AS INT)
           + CAST(c > b3 AS INT) + CAST(c > b4 AS INT)
           + CAST(c > b5 AS INT) + CAST(c > b6 AS INT)
           + CAST(c > b7 AS INT) + CAST(c > b8 AS INT)
           + CAST(c > b9 AS INT) AS bucket
  FROM base, bounds
), cells AS (
  SELECT day, bucket, COUNT(*) AS n FROM bucketed GROUP BY day, bucket
), grid AS (
  SELECT d.day, g.bucket,
         COALESCE(c.n, 0) AS n,
         CAST(SUM(COALESCE(c.n, 0)) OVER (PARTITION BY d.day)
              AS BIGINT) AS day_total
  FROM (SELECT DISTINCT day FROM cells) d
  CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS bucket) g
  LEFT JOIN cells c ON c.day = d.day AND c.bucket = g.bucket
), ref AS (
  SELECT bucket, n AS rn, day_total AS rt
  FROM grid, ref_day WHERE day = d0
)
SELECT g.day,
       round(SUM(((CAST(g.n AS DOUBLE) + 1) / (g.day_total + 10)
                  - (CAST(r.rn AS DOUBLE) + 1) / (r.rt + 10))
                 * ln(((CAST(g.n AS DOUBLE) + 1) / (g.day_total + 10))
                      / ((CAST(r.rn AS DOUBLE) + 1) / (r.rt + 10)))),
             6) AS psi,
       CAST(MAX(g.day_total) AS BIGINT) AS n_rows
FROM grid g JOIN ref r USING (bucket)
GROUP BY g.day
""",
)
def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per day — the ML-ops drift gate
    run before a model trained on yesterday's distribution serves
    today's: the FIRST day's exact decile bounds (order statistics
    on integer cents) bucket every day's values, and PSI =
    sum((p - q) ln(p / q)) per day with add-one smoothing so empty
    cells price in instead of exploding. Bounds are a 9-scalar
    broadcast; each day collapses to 10 cells before any window;
    ln rounds to 6 dp per the ln policy. PSI > 0.2 is the
    conventional retrain trigger — day one scores 0 against itself
    by construction.

    The decile bounds are deliberately NOT the engines' discrete-
    quantile builtins: Spark ``percentile_disc`` picks order
    statistic ceil(p*n) while DuckDB ``quantile_disc`` picks
    floor(p*(n-1))+1, and those diverge whenever frac(p*n) < p.
    Both engines instead share one rank-threshold formulation —
    b_i = MIN(c) with cumulative count >= ceil(i*n/10) over the
    per-cent count table. The cumulative window is unpartitioned
    but runs over DISTINCT integer cents (bounded domain, see
    PLANS.md window-audit)."""
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        F.date_trunc("day", "ts").alias("day"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("c"),
    )
    d0 = base.agg(F.min("day").alias("d0"))
    day0 = base.join(F.broadcast(d0), base.day == d0.d0).select("c")
    from pyspark.sql.window import Window as W0

    cum = (
        day0.groupBy("c")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # bounded: distinct integer cents of a bounded value domain
        .withColumn("cum", F.sum("cnt").over(W0.orderBy("c")))
    )
    ntot = day0.agg(F.count(F.lit(1)).alias("n"))
    bounds = cum.crossJoin(F.broadcast(ntot)).agg(
        *[
            F.min(
                F.when(
                    F.col("cum")
                    >= F.ceil(F.lit(i) * F.col("n") / F.lit(10.0)),
                    F.col("c"),
                )
            ).alias(f"b{i}")
            for i in range(1, 10)
        ]
    )
    bucket = F.lit(1)
    for i in range(1, 10):
        bucket = bucket + (F.col("c") > F.col(f"b{i}")).cast("int")
    cells = (
        base.crossJoin(F.broadcast(bounds))
        .select("day", bucket.alias("bucket"))
        .groupBy("day", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    days = cells.select("day").distinct()
    grid_b = spark.range(1, 11).select(F.col("id").cast("int").alias("bucket"))
    grid = (
        days.crossJoin(F.broadcast(grid_b))
        .join(cells, ["day", "bucket"], "left")
        .select(
            "day", "bucket", F.coalesce("n", F.lit(0)).alias("n")
        )
    )
    from pyspark.sql.window import Window as W

    totals = grid.withColumn(
        "day_total", F.sum("n").over(W.partitionBy("day"))
    )
    ref = (
        totals.join(F.broadcast(d0), totals.day == d0.d0)
        .select(
            "bucket",
            F.col("n").alias("rn"),
            F.col("day_total").alias("rt"),
        )
    )
    j = totals.join(F.broadcast(ref), "bucket")
    p = (F.col("n").cast("double") + 1) / (F.col("day_total") + 10)
    q = (F.col("rn").cast("double") + 1) / (F.col("rt") + 10)
    return j.groupBy("day").agg(
        F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"),
        F.max("day_total").cast("bigint").alias("n_rows"),
    )


@query(
    "privacy_t_closeness",
    oracle="""
WITH tot AS (
  SELECT COUNT(*) AS n FROM customer
), seg AS (
  SELECT c_mktsegment AS s, COUNT(*) AS g FROM customer GROUP BY 1
), classes AS (
  SELECT c_nationkey,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
         CAST(COUNT(*) AS BIGINT) AS class_size
  FROM customer GROUP BY 1, 2
), cls_seg AS (
  SELECT c_nationkey,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
         c_mktsegment AS s, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer GROUP BY 1, 2, 3
), num AS (
  SELECT c.c_nationkey, c.bal_band, c.class_size,
         CAST(SUM(abs(coalesce(cs.cnt, 0) * tot.n - seg.g * c.class_size))
              AS BIGINT) AS vd_num
  FROM classes c
  CROSS JOIN tot
  CROSS JOIN seg
  LEFT JOIN cls_seg cs ON cs.c_nationkey = c.c_nationkey
                      AND cs.bal_band = c.bal_band AND cs.s = seg.s
  GROUP BY 1, 2, 3
)
SELECT c_nationkey, bal_band, class_size,
       CAST(vd_num AS DOUBLE)
         / CAST(2 * class_size * (SELECT n FROM tot) AS DOUBLE) AS t_dist,
       CAST(vd_num AS DOUBLE)
         / CAST(2 * class_size * (SELECT n FROM tot) AS DOUBLE) <= 0.4
         AS meets_t,
       MAX(CAST(vd_num AS DOUBLE)
         / CAST(2 * class_size * (SELECT n FROM tot) AS DOUBLE)) OVER ()
         AS t_closeness
FROM num
""",
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — completes the k-anonymity / l-diversity /
    t-closeness release-check triad: a class can be large and
    l-diverse yet still leak if its sensitive-value DISTRIBUTION
    deviates sharply from the corpus-wide one. Per QI class (nation,
    balance band) the variational distance to the global
    c_mktsegment distribution: t = (1/2) sum_s |p_s - q_s|, computed
    via the EXACT integer numerator sum_s |cnt_s*N - g_s*class_size|
    (order-independent bigint arithmetic; one final double division,
    bit-identical in both engines), flagged against t <= 0.4, with
    the dataset-wide t (worst class) as a MAX window over the tiny
    class table. Scale shape: two shuffled aggs on the QI tuple plus
    a broadcast-sized 5-row segment table — the fact table never
    moves twice."""
    cust = load(spark, sf_dir, "customer")
    n = cust.count()
    seg = cust.groupBy(F.col("c_mktsegment").alias("s")).agg(
        F.count(F.lit(1)).alias("g")
    )
    qi = [F.col("c_nationkey"), F.floor(F.col("c_acctbal") / 1000).alias("bal_band")]
    classes = cust.groupBy(*qi).agg(F.count(F.lit(1)).alias("class_size"))
    cls_seg = cust.groupBy(
        *qi, F.col("c_mktsegment").alias("s")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    num = (
        classes.crossJoin(F.broadcast(seg))
        .join(
            cls_seg,
            ["c_nationkey", "bal_band", "s"],
            "left",
        )
        .groupBy("c_nationkey", "bal_band", "class_size")
        .agg(
            F.sum(
                F.abs(
                    F.coalesce(F.col("cnt"), F.lit(0)) * F.lit(n)
                    - F.col("g") * F.col("class_size")
                )
            ).alias("vd_num")
        )
    )
    t = F.col("vd_num").cast("double") / (
        F.lit(2) * F.col("class_size") * F.lit(n)
    ).cast("double")
    from pyspark.sql.window import Window as W

    return num.select(
        "c_nationkey",
        "bal_band",
        "class_size",
        t.alias("t_dist"),
        (t <= 0.4).alias("meets_t"),
        F.max(t).over(W.partitionBy(F.lit(1))).alias("t_closeness"),
    )


def _impute_oracle() -> str:
    from ..functions.hashing import md5_u32_duck

    h = md5_u32_duck("CAST(c_custkey AS VARCHAR)")
    return f"""
WITH flagged AS MATERIALIZED (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         (CAST({h} AS DOUBLE) / 4294967296.0) < 0.1 AS was_missing
  FROM customer
), med AS (
  SELECT c_mktsegment,
         (CAST(csum AS DOUBLE) / 2) / 100 AS seg_median
  FROM (
    SELECT c_mktsegment,
           SUM(CASE WHEN r = (n + 1) // 2 OR r = n // 2 + 1
                    THEN cents ELSE 0 END)
             * (CASE WHEN (n + 1) // 2 = n // 2 + 1 THEN 2 ELSE 1 END) AS csum
    FROM (
      SELECT c_mktsegment,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS r,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM flagged WHERE NOT was_missing
    ) GROUP BY c_mktsegment, n
  )
)
SELECT f.c_custkey, f.c_mktsegment, f.was_missing,
       CASE WHEN f.was_missing THEN m.seg_median ELSE f.c_acctbal END
         AS acctbal_filled
FROM flagged f JOIN med m ON m.c_mktsegment = f.c_mktsegment
"""


@query("feat_impute", oracle=_impute_oracle())
def feat_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median imputation — the feature-store fill step: rows whose
    portable md5 hash lands under 0.1 play the 'missing' role
    (deterministic, oracle-replayable missingness), and each missing
    account balance is filled with its market segment's EXACT
    interpolated median of the observed values (integer cents, two
    middle order statistics, one division chain shared with the
    oracle). Scale shape: the median runs off ONE partitioned
    window per segment (bounded segment count), and the fill joins
    the tiny per-segment medians back broadcast."""
    from ..functions.hashing import md5_u32_spark

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    flagged = c.withColumn(
        "was_missing",
        (
            md5_u32_spark(F.col("c_custkey").cast("string")).cast("double")
            / F.lit(4294967296.0)
        )
        < 0.1,
    )
    from pyspark.sql.window import Window

    obs = flagged.filter(~F.col("was_missing")).select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").alias("cents"),
    )
    wseg = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    med = (
        obs.select(
            "c_mktsegment",
            "cents",
            F.row_number().over(wseg).alias("r"),
            F.count(F.lit(1))
            .over(Window.partitionBy("c_mktsegment"))
            .alias("n"),
        )
        .groupBy("c_mktsegment", "n")
        .agg(
            (
                F.sum(
                    F.when(
                        (F.col("r") == F.expr("(n + 1) div 2"))
                        | (F.col("r") == F.expr("n div 2 + 1")),
                        F.col("cents"),
                    ).otherwise(0)
                )
                * F.expr(
                    "CASE WHEN (n + 1) div 2 = n div 2 + 1 THEN 2 ELSE 1 END"
                )
            ).alias("csum")
        )
        .select(
            "c_mktsegment",
            ((F.col("csum").cast("double") / 2) / 100).alias("seg_median"),
        )
    )
    return flagged.join(F.broadcast(med), "c_mktsegment").select(
        "c_custkey",
        "c_mktsegment",
        "was_missing",
        F.when(F.col("was_missing"), F.col("seg_median"))
        .otherwise(F.col("c_acctbal"))
        .alias("acctbal_filled"),
    )


def _hashing_trick_oracle() -> str:
    from ..functions.hashing import md5_nibble_duck, md5_u32_duck

    h = md5_u32_duck("tok")
    s = md5_nibble_duck("tok", 9)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), hashed AS (
  SELECT doc_id,
         {h} % 32 AS bucket,
         CASE WHEN {s} < 8 THEN 1 ELSE -1 END AS sign
  FROM toks WHERE tok <> ''
)
SELECT doc_id, CAST(bucket AS INTEGER) AS bucket,
       CAST(SUM(sign) AS BIGINT) AS weight,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM hashed GROUP BY doc_id, bucket
"""


@query("feat_hashing_trick", oracle=_hashing_trick_oracle())
def feat_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick — fixed-width signed feature hashing
    (Weinberger et al.): every token maps to one of 32 buckets by the
    portable md5 family, with a +-1 sign from an independent md5
    nibble so collisions cancel in expectation. Output is the sparse
    (doc, bucket, weight) representation a linear model trains on
    with NO vocabulary pass — the property that makes it the 100 TB
    featurizer (one explode + one partial-aggregated groupBy; bucket
    domain is a constant 32, so the shuffle carries at most
    32 rows/doc of integers, never text)."""
    from ..functions.hashing import md5_nibble_spark, md5_u32_spark

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    hashed = toks.select(
        "doc_id",
        F.pmod(md5_u32_spark(F.col("tok")), F.lit(32))
        .cast("int")
        .alias("bucket"),
        F.when(md5_nibble_spark(F.col("tok"), 9) < 8, 1)
        .otherwise(-1)
        .alias("sign"),
    )
    return hashed.groupBy("doc_id", "bucket").agg(
        F.sum("sign").cast("bigint").alias("weight"),
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
    )


_RI_RELATIONS = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
]


def _ri_oracle() -> str:
    parts = []
    for name, child, ckey, parent, pkey in _RI_RELATIONS:
        parts.append(
            f"""
SELECT '{name}' AS relation,
       COUNT(*) AS child_rows,
       CAST(SUM(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS orphan_rows,
       CAST(CAST(SUM(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS orphan_pct
FROM {child} c
LEFT JOIN (SELECT DISTINCT {pkey} AS _pk FROM {parent}) p
  ON c.{ckey} = p._pk"""
        )
    return "\nUNION ALL\n".join(parts)


@query("dq_referential_integrity", oracle=_ri_oracle())
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across the star schema — the ingest
    gate that catches a partial load before it poisons a join. Each
    relation is ONE pass over the child: left-join the distinct
    parent key set and count nulls, so the report costs five
    scan+join+agg jobs and shuffles only (child_key) pairs. The
    small parents (customer, part, supplier) broadcast under AQE;
    orders-sized parents fall back to a shuffled hash join, which is
    the correct 100-TB shape (a bloom-filter pre-pass would be the
    next tier). events.user_id->customer is the intentionally
    violable relation (event users need not be customers)."""
    out = None
    for name, child, ckey, parent, pkey in _RI_RELATIONS:
        p = (
            load(spark, sf_dir, parent)
            .select(F.col(pkey).alias("_pk"))
            .distinct()
        )
        j = (
            load(spark, sf_dir, child)
            .select(F.col(ckey).alias("_ck"))
            .join(p, F.col("_ck") == F.col("_pk"), "left")
        )
        orphans = F.sum(
            F.when(F.col("_pk").isNull(), 1).otherwise(0)
        ).cast("bigint")
        row = j.agg(
            F.count(F.lit(1)).alias("child_rows"),
            orphans.alias("orphan_rows"),
        ).select(
            F.lit(name).alias("relation"),
            "child_rows",
            "orphan_rows",
            (
                F.col("orphan_rows").cast("double")
                / F.col("child_rows").cast("double")
            ).alias("orphan_pct"),
        )
        out = row if out is None else out.unionAll(row)
    return out


@query(
    "feat_target_encode",
    oracle="""
WITH j AS (
  SELECT c.c_mktsegment,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS sc
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), per AS (
  SELECT c_mktsegment, COUNT(*) AS n_orders,
         CAST(SUM(sc) AS BIGINT) AS seg_sum
  FROM j GROUP BY c_mktsegment
), g AS (
  SELECT CAST(SUM(sc) AS BIGINT) AS gs, COUNT(*) AS gn FROM j
)
SELECT per.c_mktsegment, per.n_orders,
       CAST(per.seg_sum AS DOUBLE) / per.n_orders / 100 AS seg_mean,
       (CAST(per.seg_sum AS DOUBLE)
          + 10 * (CAST(g.gs AS DOUBLE) / g.gn))
         / (per.n_orders + 10) / 100 AS enc_totalprice
FROM per, g
""",
)
def feat_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding of a categorical feature (customer
    market segment) against a continuous target (order total):
    enc = (seg_sum + m * global_mean) / (seg_n + m), m = 10 — the
    leakage-controlled encoder every tabular feature pipeline ships.
    Sums are exact integer cents; the 1-row global aggregate joins
    back by broadcast (cross join of a scalar), so the plan is two
    hash aggregates over one fact-dim join and never re-shuffles the
    fact table. Float ops appear in the SAME order in both engines
    (sum -> /n -> /100; smoothing before the /100 descale), so the
    doubles are bit-identical with no rounding."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment",
        F.expr(
            "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
        ).alias("sc"),
    )
    per = j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("sc").cast("bigint").alias("seg_sum"),
    )
    g = j.agg(
        F.sum("sc").cast("bigint").alias("gs"),
        F.count(F.lit(1)).alias("gn"),
    )
    return per.crossJoin(F.broadcast(g)).select(
        "c_mktsegment",
        "n_orders",
        (
            F.col("seg_sum").cast("double") / F.col("n_orders") / 100
        ).alias("seg_mean"),
        (
            (
                F.col("seg_sum").cast("double")
                + 10 * (F.col("gs").cast("double") / F.col("gn"))
            )
            / (F.col("n_orders") + 10)
            / 100
        ).alias("enc_totalprice"),
    )
