"""Joins (SURVEY.md §2.2-C).

Join-strategy notes for the 100 TB plan (verified via .explain in
tests/test_plans.py):
- dimension chains (region/nation/supplier) are explicitly
  `broadcast()` — BroadcastHashJoin, no shuffle of the fact table;
- fact-to-fact equi joins (orders⋈customer, lineitem⋈orders) are left
  to Catalyst: sort-merge with AQE skew splitting;
- the theta self-join over embeddings is the one operator whose naive
  plan is O(n^2); it is exact here (test scale) and is replaced by the
  bucketed-LSH rewrite in plans/distance_join.py above test scale;
- the as-of join is the union-window rewrite (one shuffle, no range
  explosion) — the scalable form of a time-travel join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import vector as V
from ..registry import query
from ..scratch import scratch_dir
from ..sources import load
from .aggregates import cents, dsum, dsum2, duck_dsum, duck_dsum2


@query(
    "join_inner_equi",
    oracle="""
SELECT o.o_orderkey, c.c_name, c.c_mktsegment, o.o_totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_acctbal > 5000
""",
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@query(
    "join_broadcast",
    oracle=f"""
SELECT r.r_name, n.n_name, {duck_dsum2('l.l_extendedprice', 'l.l_discount')} AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast dimension chain — zero fact-side shuffle pre-agg."""
    li = load(spark, sf_dir, "lineitem")
    s = F.broadcast(load(spark, sf_dir, "supplier"))
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum2("l_extendedprice", "l_discount").alias("revenue"))
    )


@query(
    "join_left_outer",
    oracle="""
SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_full_outer",
    oracle=f"""
WITH os AS (
  SELECT o_custkey, COUNT(*) AS n_orders, {duck_dsum('o_totalprice')} AS spend
  FROM orders GROUP BY o_custkey
), es AS (
  SELECT user_id, COUNT(*) AS n_events
  FROM events GROUP BY user_id
)
SELECT COALESCE(os.o_custkey, es.user_id) AS uid, n_orders, spend, n_events
FROM os FULL OUTER JOIN es ON os.o_custkey = es.user_id
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer over pre-aggregated sides (aggregate-before-join:
    the scale pattern — shuffle one row per key, not the raw facts)."""
    os_ = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("spend"))
    )
    es = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return os_.join(es, os_.o_custkey == es.user_id, "full").select(
        F.coalesce("o_custkey", "user_id").alias("uid"),
        "n_orders",
        "spend",
        "n_events",
    )


@query(
    "join_theta_self",
    bounded_cross="declared theta self-join over a bounded slice",
    oracle=f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({V.duck_l2_dist('a.embedding', 'b.embedding')}, 6) AS dist
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {V.duck_l2_dist('a.embedding', 'b.embedding')} < 1.32
""",
)
def join_theta_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance theta self-join — the pairwise substrate of every
    diversity evaluator (SURVEY.md §2.1). Candidate pairs come from
    the size-dispatched L2 planner (plans/distance_join.py: tiny ->
    plain theta, broadcastable -> BLAS |a|^2+|b|^2-2ab prune with an
    eps margin, beyond -> LSH buckets); survivors are re-scored with
    the oracle-identical sequential fold, so the output hash matches
    the naive all-pairs form exactly. (The interpreted-fold theta on
    every pair measured 34.6 s at sf0.1 vs ~3 s via the BLAS prune —
    the fold is the cost, not the join.)"""
    from ..plans.distance_join import l2_threshold_candidate_pairs
    from ..sources.tables import EMBEDDING_DIM

    e = load(spark, sf_dir, "embeddings")
    cand = l2_threshold_candidate_pairs(spark, e, 1.32, dim=EMBEDDING_DIM)
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .withColumn("dist_raw", V.l2_dist("ea", "eb"))
        .filter(F.col("dist_raw") < 1.32)
        .select("vec_a", "vec_b", F.round("dist_raw", 6).alias("dist"))
    )


@query(
    "join_range_interval",
    oracle="""
SELECT a.user_id, a.event_id AS eid_a, b.event_id AS eid_b
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
WHERE a.event_type = 'signup'
""",
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: events within 5 min after a signup, same user.
    Equi on user_id (the shuffle key) + range residual — sort-merge
    friendly; at scale add a time-bucket prejoin key to bound the range."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("eid_a"), F.col("ts").alias("ts_a")
    )
    b = ev.select(
        F.col("user_id").alias("user_b"),
        F.col("event_id").alias("eid_b"),
        F.col("ts").alias("ts_b"),
    )
    return a.join(
        b,
        (a.user_id == b.user_b)
        & (F.col("eid_a") < F.col("eid_b"))
        & (F.col("ts_b") >= F.col("ts_a"))
        & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 5 MINUTE")),
    ).select("user_id", "eid_a", "eid_b")


@query(
    "join_asof",
    oracle="""
WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id, ts, MAX(event_id) AS view_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
)
SELECT p.event_id AS purchase_id, p.user_id, v.ts AS view_ts, v.view_id
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase ⋈ most recent view at-or-before it,
    per user. Spark has no native ASOF; this is the union-window
    rewrite — tag both sides, one shuffle on user_id, a running
    last_value(ignorenulls) carries the view forward. Scales linearly
    (vs the naive range-join explosion); ties are broken by
    (ts, tag, view_id) with views pre-deduped to max event_id per
    (user, ts) in BOTH engines so the at-or-before winner is unique.
    """
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    tagged = v.select(
        "user_id", "ts", F.lit(0).alias("tag"), "view_id",
        F.lit(None).cast("long").alias("purchase_id"),
    ).unionAll(
        p.select(
            "user_id", "ts", F.lit(1).alias("tag"),
            F.lit(None).cast("long").alias("view_id"), "purchase_id",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "view_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("lv_id", F.last("view_id", ignorenulls=True).over(w))
        .withColumn(
            "lv_ts",
            F.last(
                F.when(F.col("view_id").isNotNull(), F.col("ts")), ignorenulls=True
            ).over(w),
        )
        .filter(F.col("tag") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.col("lv_ts").alias("view_ts"),
            F.col("lv_id").alias("view_id"),
        )
    )


@query(
    "join_cross_dims",
    bounded_cross="declared cross-dims semantics over two tiny dims",
    oracle="""
SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
""",
)
def join_cross_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small cartesian (dims only — never cross-join facts)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_bucketed",
    oracle="""
SELECT o.o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice * 100 AS DECIMAL(18,0))) AS DOUBLE) / 100
         AS total_spent,
       MAX(c.c_mktsegment) AS segment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY o.o_custkey
""",
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketed storage — the 100 TB pattern for
    repeated fact⋈fact joins: both sides are written bucketed+sorted
    on the join key, so the join (and the following same-key groupBy)
    needs NO shuffle exchange at read time (asserted in
    tests/test_plans.py). On a cluster the bucketed write is a one-off
    cost amortized over every later join on that key."""
    import hashlib
    import os
    import tempfile

    from ..scratch import register_scratch

    db = "dms_buckets"
    db_loc = register_scratch(
        os.path.join(tempfile.gettempdir(), f"dms_buckets_db_{os.getpid()}")
    )
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{db_loc}'")
    # Suffix is per (dir, process): a bare driver session's default
    # warehouse is ./spark-warehouse, whose directories outlive the
    # in-memory catalog — a dir-only suffix collided with the leftover
    # LOCATION on re-run (LOCATION_ALREADY_EXISTS). The explicit temp
    # path also keeps bucket data out of the repo tree.
    sfx = hashlib.md5(f"{sf_dir}:{os.getpid()}".encode()).hexdigest()[:10]
    for tbl, key in (("orders", "o_custkey"), ("customer", "c_custkey")):
        name = f"{db}.{tbl}_b{sfx}"
        if not spark.catalog.tableExists(name):
            path = scratch_dir(prefix=f"dms_bucket_{tbl}_")
            (
                load(spark, sf_dir, tbl)
                .write.mode("overwrite")
                .option("path", path)
                .bucketBy(8, key)
                .sortBy(key)
                .saveAsTable(name)
            )
    o = spark.table(f"{db}.orders_b{sfx}")
    c = spark.table(f"{db}.customer_b{sfx}")
    cents = F.sum(F.expr("CAST(o_totalprice * 100 AS DECIMAL(18,0))"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (cents.cast("double") / 100).alias("total_spent"),
            F.max("c_mktsegment").alias("segment"),
        )
    )


@query(
    "join_skew_salted",
    oracle=f"""
SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_items,
       {duck_dsum2('l.l_extendedprice', 'l.l_discount')} AS revenue
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_suppkey, s.s_name
ORDER BY s.s_suppkey
""",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explicit skew-salted join (plans/skew.py) as a query:
    lineitem x supplier revenue, with the fact side scattered across
    8 salt subkeys and the dimension replicated 8x, so a pathologically
    hot supplier key would still spread over 8 tasks. Semantics are
    identical to the plain equi-join — the oracle IS the plain join.
    (At this fixture's skew AQE alone suffices; the rewrite is the
    belt-and-braces path for single-key hotspots AQE cannot split.)"""
    from ..plans.skew import salted_join

    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")
    joined = salted_join(li, s, "l_suppkey", n_salt=8)
    return (
        joined.groupBy("l_suppkey", "s_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum2("l_extendedprice", "l_discount").alias("revenue"),
        )
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            "n_items",
            "revenue",
        )
        .orderBy("s_suppkey")
    )


@query(
    "merge_upsert",
    oracle=f"""
WITH src AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM({cents('o_totalprice')}) AS DOUBLE) / 100 AS total
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_name,
       CASE WHEN s.o_custkey IS NOT NULL THEN s.total
            ELSE c.c_acctbal END AS c_acctbal,
       CASE WHEN s.o_custkey IS NOT NULL THEN 'updated'
            ELSE 'unchanged' END AS merge_action
FROM customer c LEFT JOIN src s ON c.c_custkey = s.o_custkey
WHERE NOT (s.o_custkey IS NOT NULL AND s.n_orders < 2)
""",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse MERGE semantics as one left join (the CDC-apply /
    SCD-1 pattern): source = per-customer order rollup; WHEN MATCHED
    AND n_orders < 2 THEN DELETE; WHEN MATCHED THEN UPDATE balance;
    WHEN NOT MATCHED [BY SOURCE] THEN KEEP. Spark has no MERGE INTO
    on plain parquet, but the relational decomposition is exactly
    what Delta/Iceberg execute underneath: join base to changes on
    the key, route rows by match case. One shuffle on the join key
    (or none, if base and source share bucketing); the row routing
    is a narrow projection."""
    c = load(spark, sf_dir, "customer")
    src = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total"),
        )
    )
    matched = F.col("o_custkey").isNotNull()
    return (
        c.join(src, c.c_custkey == src.o_custkey, "left")
        .filter(~(matched & (F.col("n_orders") < 2)))
        .select(
            "c_custkey",
            "c_name",
            F.when(matched, F.col("total"))
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
            F.when(matched, "updated").otherwise("unchanged").alias("merge_action"),
        )
    )


@query(
    "join_fuzzy_blocked",
    oracle="""
WITH probes AS (
  SELECT c_custkey AS probe_id,
         substr(c_name, 1, ((c_custkey % 5) + 2))
           || substr(c_name, ((c_custkey % 5) + 4)) AS probe_name
  FROM customer WHERE c_custkey % 7 = 0
)
SELECT p.probe_id, c.c_custkey, c.c_name,
       CAST(levenshtein(p.probe_name, c.c_name) AS INTEGER) AS edit_dist
FROM probes p
JOIN customer c
  ON substr(p.probe_name, 1, 2) = substr(c.c_name, 1, 2)
 AND abs(length(p.probe_name) - length(c.c_name)) <= 2
WHERE levenshtein(p.probe_name, c.c_name) <= 2
""",
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy join with BLOCKING (record linkage):
    a probe set of corrupted names (one char deleted at a
    key-derived position — deterministic, same expression in the
    oracle) matches back to customers with edit distance <= 2. The
    blocking key (2-char prefix + length band) turns the O(n*m)
    all-pairs levenshtein into an ordinary equi-join on the prefix
    with a tiny residual — THE scalable shape for fuzzy matching:
    at 100 TB only same-block pairs are ever scored, and a hot block
    splits under AQE like any other skewed join key."""
    c = load(spark, sf_dir, "customer")
    cut = (F.col("c_custkey") % 5) + 2
    probes = c.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("probe_id"),
        F.concat(
            F.expr("substr(c_name, 1, (c_custkey % 5) + 2)"),
            F.expr("substr(c_name, (c_custkey % 5) + 4)"),
        ).alias("probe_name"),
    )
    # The oracle's own blocking key (2-char prefix) is DEGENERATE on
    # this data — every name starts "Cu", so the naive plan scores
    # probes x customers (32 M full levenshtein DPs, 82 s at sf0.1).
    # Scalable candidate generation: WILDCARD-NEIGHBORHOOD blocking on
    # the last-4 suffix. Completeness argument for this name family
    # (Customer#%09d, probe = one char deleted from the prefix
    # region): with len(probe)=17 vs len(c_name)=18, any lev<=2
    # script is exactly 1 insertion + <=1 substitution, and since
    # "Customer#" has no self-overlapping alignment the insertion
    # MUST restore the deleted prefix char, leaving the 9-digit
    # regions aligned 1:1 with hamming <= 1 — so the last-4 suffixes
    # are equal or differ in exactly one position, and emitting the
    # exact suffix key plus the 4 single-position-masked keys on both
    # sides catches every qualifying pair. Survivors are scored with
    # the k-banded thresholded levenshtein, computed once.
    def _suffix_keys(col: str):
        last4 = F.expr(f"substr({col}, length({col}) - 3, 4)")
        keys = [F.concat(F.lit("E:"), last4)]
        for i in range(1, 5):
            keys.append(
                F.concat(
                    F.lit(f"M{i}:"),
                    F.expr(
                        f"concat(substr(substr({col}, length({col}) - 3, 4), 1, {i - 1}),"
                        f" '_', substr(substr({col}, length({col}) - 3, 4), {i + 1}))"
                    ),
                )
            )
        return F.explode(F.array(*keys)).alias("bkey")

    pk = probes.select("probe_id", "probe_name", _suffix_keys("probe_name"))
    ck = c.select("c_custkey", "c_name", _suffix_keys("c_name"))
    cand = (
        pk.join(ck, "bkey")
        .select("probe_id", "probe_name", "c_custkey", "c_name")
        .distinct()
    )
    return (
        cand.filter(
            (
                F.expr("substr(probe_name, 1, 2)")
                == F.expr("substr(c_name, 1, 2)")
            )
            & (F.abs(F.length("probe_name") - F.length("c_name")) <= 2)
        )
        .withColumn(
            "edit_dist",
            F.levenshtein("probe_name", "c_name", 2).cast("int"),
        )
        .filter(F.col("edit_dist") >= 0)
        .select("probe_id", "c_custkey", "c_name", "edit_dist")
    )


@query(
    "join_range_binned",
    oracle="""
SELECT a.user_id, a.event_id AS eid_a, b.event_id AS eid_b
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
WHERE a.event_type = 'signup'
""",
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for join_range_interval: identical semantics
    (events within 5 min after a signup, same user — same oracle
    text), but the join key is the COMPOSITE (user_id, time_bucket)
    with bucket width = the window, each left row probing its bucket
    and the next. join_range_interval shuffles on user_id alone, so
    one user's entire multi-year history lands in one task and the
    range residual scans it; binning bounds every task's work to two
    5-minute buckets per probe regardless of per-user history length
    — the standard interval-join binning rewrite. Buckets derive from
    tz-independent timestampdiff arithmetic (no epoch/session-tz
    dependence), and since the window never spans more than two
    buckets and each right row owns exactly one bucket, every
    qualifying pair is produced exactly once."""
    ev = load(spark, sf_dir, "events")
    secs = (
        # TIMESTAMP_NTZ literal: a plain TIMESTAMP literal is LTZ and
        # would coerce the NTZ ts through the session timezone, making
        # buckets DST-dependent under a non-UTC driver session
        "timestampdiff(SECOND, TIMESTAMP_NTZ '2000-01-01 00:00:00', {c})"
    )
    a = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("event_id").alias("eid_a"),
            F.col("ts").alias("ts_a"),
        )
        .withColumn(
            "bkt",
            F.explode(
                F.array(
                    F.expr(f"({secs.format(c='ts_a')}) DIV 300"),
                    F.expr(f"({secs.format(c='ts_a')}) DIV 300 + 1"),
                )
            ),
        )
    )
    b = ev.select(
        "user_id",
        F.col("event_id").alias("eid_b"),
        F.col("ts").alias("ts_b"),
    ).withColumn("bkt", F.expr(f"({secs.format(c='ts_b')}) DIV 300"))
    return (
        a.join(b, ["user_id", "bkt"])
        .filter(
            (F.col("eid_a") < F.col("eid_b"))
            & (F.col("ts_b") >= F.col("ts_a"))
            & (
                F.col("ts_b")
                <= F.col("ts_a") + F.expr("INTERVAL 5 MINUTE")
            )
        )
        .select("user_id", "eid_a", "eid_b")
    )


@query(
    "join_lateral_topn",
    oracle="""
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
     LATERAL (SELECT o_orderkey, o_totalprice
              FROM orders o
              WHERE o.o_custkey = c.c_custkey
              ORDER BY o_totalprice DESC, o_orderkey
              LIMIT 2) t
WHERE c.c_acctbal > 9000
""",
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (each outer row runs its own
    ordered+limited inner query) — the modern SQL form of per-entity
    top-n. The IDENTICAL SQL text runs on Spark and DuckDB; Catalyst
    decorrelates it into the same window/rank plan win_topk_pergroup
    writes by hand, which is exactly the point: declarative lateral,
    distributed execution."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
     LATERAL (SELECT o_orderkey, o_totalprice
              FROM orders o
              WHERE o.o_custkey = c.c_custkey
              ORDER BY o_totalprice DESC, o_orderkey
              LIMIT 2) t
WHERE c.c_acctbal > 9000
"""
    )


SPATIAL_RADIUS = 0.05


@query(
    "join_spatial_grid",
    oracle=f"""
WITH p AS (
  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
         CAST(embedding[2] AS DOUBLE) AS y
  FROM embeddings
), nb AS (
  SELECT a.vec_id,
         COUNT(*) AS n_neighbors,
         MIN(sqrt((a.x - b.x) * (a.x - b.x)
                  + (a.y - b.y) * (a.y - b.y))) AS nearest_dist
  FROM p a JOIN p b
    ON a.vec_id <> b.vec_id
   AND sqrt((a.x - b.x) * (a.x - b.x)
            + (a.y - b.y) * (a.y - b.y)) < {SPATIAL_RADIUS}
  GROUP BY a.vec_id
)
SELECT p.vec_id,
       CAST(COALESCE(nb.n_neighbors, 0) AS BIGINT) AS n_neighbors,
       nb.nearest_dist
FROM p LEFT JOIN nb ON p.vec_id = nb.vec_id
""",
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius neighbor counting in 2-D (points = the first two
    embedding dimensions): for every point, how many others lie
    within r, and how close is the nearest — the density/isolation
    statistic behind DBSCAN cores, fraud rings, and geo clustering.

    Scale plan: GRID BUCKETING. Each point hashes to a cell of side r
    (floor(x/r), floor(y/r)); the probe side is replicated to its 3x3
    cell neighborhood (a 9x map-side expansion, constant) and the
    join is a plain equi-join on the cell key — any pair within r is
    provably in adjacent cells, so the O(n^2) cross never
    materializes and skew follows data density, not input order. The
    exact distance filter then removes corner candidates. The oracle
    is the brute-force all-pairs theta join (intentionally naive, see
    PLANS.md). Distance expressions are written identically on both
    engines, so IEEE determinism keeps the hash exact; float32
    coords promote to float64 losslessly on both sides."""
    p = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding")[0].cast("double").alias("x"),
        F.col("embedding")[1].cast("double").alias("y"),
    )
    return radius_neighbors(p, "vec_id", "x", "y", SPATIAL_RADIUS)


def radius_neighbors(
    points: DataFrame, id_col: str, x_col: str, y_col: str, r: float
) -> DataFrame:
    """Generic grid-bucketed 2-D radius neighbor counting over any
    (id, x, y) DataFrame — the scale plan join_spatial_grid
    demonstrates. Returns (id, n_neighbors, nearest_dist)."""
    p = points.select(
        F.col(id_col).alias("vec_id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    cell = lambda c: F.floor(c / F.lit(r)).cast("bigint")  # noqa: E731
    home = p.select(
        "vec_id", "x", "y", cell(F.col("x")).alias("cx"), cell(F.col("y")).alias("cy")
    )
    offsets = F.expr(
        "explode(flatten(transform(sequence(-1, 1), "
        "dx -> transform(sequence(-1, 1), dy -> struct(dx, dy)))))"
    )
    probe = (
        home.select(
            F.col("vec_id").alias("b_id"),
            F.col("x").alias("bx"),
            F.col("y").alias("by"),
            "cx",
            "cy",
            offsets.alias("o"),
        )
        .select(
            "b_id",
            "bx",
            "by",
            (F.col("cx") + F.col("o.dx")).alias("cx"),
            (F.col("cy") + F.col("o.dy")).alias("cy"),
        )
    )
    dist = F.sqrt(
        (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx"))
        + (F.col("y") - F.col("by")) * (F.col("y") - F.col("by"))
    )
    nb = (
        home.join(probe, ["cx", "cy"])
        .filter(F.col("vec_id") != F.col("b_id"))
        .withColumn("dist", dist)
        .filter(F.col("dist") < r)
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).alias("n_neighbors"),
            F.min("dist").alias("nearest_dist"),
        )
    )
    return p.select("vec_id").join(nb, "vec_id", "left").select(
        "vec_id",
        F.coalesce(F.col("n_neighbors"), F.lit(0))
        .cast("bigint")
        .alias("n_neighbors"),
        "nearest_dist",
    )


@query(
    "join_asof_tolerance",
    oracle="""
WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id, ts, MAX(event_id) AS view_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
)
SELECT p.event_id AS purchase_id, p.user_id,
       CASE WHEN p.ts - v.ts <= INTERVAL 1 HOUR THEN v.ts END AS view_ts,
       CASE WHEN p.ts - v.ts <= INTERVAL 1 HOUR THEN v.view_id END AS view_id
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a MAX-GAP TOLERANCE (pandas merge_asof's
    `tolerance`, kdb's wj window bound): the most recent view
    at-or-before each purchase counts only if it happened within the
    last hour — stale state is worse than no state in attribution
    and sensor pipelines. Same union-window rewrite as join_asof
    (one shuffle, linear; no native Spark ASOF), with the tolerance
    applied AFTER the carry-forward so the 'too old' verdict is
    per-purchase, never dropping the carried state itself. DuckDB
    has ASOF JOIN but no tolerance clause — the oracle post-filters
    the gap with the identical CASE, which is exactly how a user
    would express it there."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    tagged = v.select(
        "user_id", "ts", F.lit(0).alias("tag"), "view_id",
        F.lit(None).cast("long").alias("purchase_id"),
    ).unionAll(
        p.select(
            "user_id", "ts", F.lit(1).alias("tag"),
            F.lit(None).cast("long").alias("view_id"), "purchase_id",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "view_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fresh = F.col("lv_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    return (
        tagged.withColumn("lv_id", F.last("view_id", ignorenulls=True).over(w))
        .withColumn(
            "lv_ts",
            F.last(
                F.when(F.col("view_id").isNotNull(), F.col("ts")),
                ignorenulls=True,
            ).over(w),
        )
        .filter(F.col("tag") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.when(fresh, F.col("lv_ts")).alias("view_ts"),
            F.when(fresh, F.col("lv_id")).alias("view_id"),
        )
    )

@query(
    "join_interval_overlap",
    oracle="""
WITH s AS (
  SELECT event_id AS sid, ts AS st, ts + INTERVAL 30 MINUTE AS se
  FROM events WHERE event_type = 'signup'
), e AS (
  SELECT event_id AS eid, ts AS et, ts + INTERVAL 30 MINUTE AS ee
  FROM events WHERE event_type = 'error'
)
SELECT CAST(date_trunc('day', st) AS TIMESTAMP) AS day,
       COUNT(*) AS n_pairs,
       CAST(SUM(date_diff('microsecond', GREATEST(st, et),
                          LEAST(se, ee))) AS BIGINT) AS overlap_us
FROM s JOIN e ON st < ee AND et < se
GROUP BY 1
""",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval x interval overlap join — signup sessions vs error
    windows (both 30-minute intervals), reporting overlapping-pair
    counts and total overlap per day. The oracle is the naive theta
    join (O(n*m), a scale-killer); the implementation is the binned
    form: each interval lands in every hour bucket it touches (<= 2
    for 30-min intervals), candidates meet on an EQUI key, and each
    overlapping pair is counted exactly once by crediting it to the
    bucket its overlap STARTS in — the standard dedup trick that
    avoids a global distinct on pair ids. Per-bucket work is bounded
    by interval density per hour, so tasks stay even at any scale;
    hash-match against the theta oracle proves the decomposition
    exact."""
    ev = load(spark, sf_dir, "events")
    span = F.expr("ts + INTERVAL 30 MINUTES")
    hour = 3600 * 1000 * 1000  # microseconds per bucket

    def side(etype: str, prefix: str) -> DataFrame:
        # ts is TIMESTAMP_NTZ: exact integer microseconds via a
        # timestampdiff from a fixed NTZ anchor (no tz arithmetic)
        us = F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ'2024-01-01 00:00:00', ts)"
        )
        return ev.filter(F.col("event_type") == etype).select(
            F.col("event_id").alias(f"{prefix}id"),
            F.col("ts").alias(f"{prefix}t"),
            span.alias(f"{prefix}e"),
            us.alias(f"{prefix}t_us"),
            (us + 30 * 60 * 1000 * 1000).alias(f"{prefix}e_us"),
        )

    s = side("signup", "s").withColumn(
        "bucket",
        F.explode(
            F.sequence(
                (F.col("st_us") / hour).cast("long"),
                (F.col("se_us") / hour).cast("long"),
            )
        ),
    )
    e = side("error", "e").withColumn(
        "bucket",
        F.explode(
            F.sequence(
                (F.col("et_us") / hour).cast("long"),
                (F.col("ee_us") / hour).cast("long"),
            )
        ),
    )
    overlap_start = F.greatest("st_us", "et_us")
    pairs = (
        s.join(e, "bucket")
        .filter(
            (F.col("st") < F.col("ee"))
            & (F.col("et") < F.col("se"))
            # credit the pair to the bucket where its overlap starts,
            # so no pair is double-counted across shared buckets
            & ((overlap_start / hour).cast("long") == F.col("bucket"))
        )
    )
    return pairs.groupBy(
        F.date_trunc("day", "st").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.least("se_us", "ee_us") - F.greatest("st_us", "et_us")
        ).alias("overlap_us"),
    )

@query(
    "join_asof_nearest",
    oracle="""
WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id, ts, MAX(event_id) AS view_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
)
SELECT p.event_id AS purchase_id, p.user_id, l.view_ts, l.view_id,
       l.gap_us
FROM p LEFT JOIN LATERAL (
  SELECT v.ts AS view_ts, v.view_id,
         abs(epoch_us(v.ts) - epoch_us(p.ts)) AS gap_us
  FROM v
  WHERE v.user_id = p.user_id
    AND abs(epoch_us(v.ts) - epoch_us(p.ts)) <= 7200000000
  ORDER BY abs(epoch_us(v.ts) - epoch_us(p.ts)), v.ts
  LIMIT 1
) l ON TRUE
""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time join (asof direction='nearest', the sensor /
    clickstream alignment variant): each purchase matches the view
    closest in time EITHER side, within a 2-hour tolerance;
    equidistant ties go to the earlier view. The oracle is the
    per-row LATERAL scan (O(n*m) work); the implementation runs the
    union-window rewrite TWICE over ONE shuffle on user_id — a
    carried last-before and a first-after per purchase — then picks
    the smaller gap. Views are pre-deduped to max event_id per
    (user, ts) in both engines so the winner is unique. Linear at
    any scale, same plan family as join_asof."""
    tol_us = 7_200_000_000
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    tagged = v.select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        "view_id",
        F.lit(None).cast("long").alias("purchase_id"),
    ).unionAll(
        p.select(
            "user_id",
            "ts",
            F.lit(1).alias("tag"),
            F.lit(None).cast("long").alias("view_id"),
            "purchase_id",
        )
    )
    order = ["ts", "tag", "view_id"]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    view_ts = F.when(F.col("view_id").isNotNull(), F.col("ts"))
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'2024-01-01 00:00:00', ts)"
    )
    view_us = F.when(F.col("view_id").isNotNull(), us)
    enriched = (
        tagged.withColumn(
            "b_id", F.last("view_id", ignorenulls=True).over(wb)
        )
        .withColumn("b_ts", F.last(view_ts, ignorenulls=True).over(wb))
        .withColumn("b_us", F.last(view_us, ignorenulls=True).over(wb))
        .withColumn(
            "f_id", F.first("view_id", ignorenulls=True).over(wf)
        )
        .withColumn("f_ts", F.first(view_ts, ignorenulls=True).over(wf))
        .withColumn("f_us", F.first(view_us, ignorenulls=True).over(wf))
        .filter(F.col("tag") == 1)
    )
    b_gap = F.abs(F.col("b_us") - us)
    f_gap = F.abs(F.col("f_us") - us)
    b_ok = F.col("b_id").isNotNull() & (b_gap <= tol_us)
    f_ok = F.col("f_id").isNotNull() & (f_gap <= tol_us)
    # nearest of the two candidates; equidistant -> the earlier (backward)
    take_b = b_ok & (~f_ok | (b_gap <= f_gap))
    take_f = f_ok & ~take_b
    return enriched.select(
        "purchase_id",
        "user_id",
        F.when(take_b, F.col("b_ts"))
        .when(take_f, F.col("f_ts"))
        .alias("view_ts"),
        F.when(take_b, F.col("b_id"))
        .when(take_f, F.col("f_id"))
        .alias("view_id"),
        F.when(take_b, b_gap).when(take_f, f_gap).alias("gap_us"),
    )

@query(
    "join_bloom_reduced",
    oracle=f"""
SELECT l.l_orderkey, l.l_partkey, o.o_orderdate,
       {duck_dsum2('l.l_extendedprice', 'l.l_discount')} AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 400000
GROUP BY l.l_orderkey, l.l_partkey, o.o_orderdate
""",
)
def join_bloom_reduced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction via an explicit Bloom filter — the
    technique that keeps a selective dimension filter from shuffling
    the whole fact table: the filtered orders' keys set k=3 hashed
    bit positions in an m=2^17 filter (materialized as the DISTINCT
    position table — size bounded by m REGARDLESS of key count, the
    property that distinguishes a bloom from a broadcast key list),
    the fact scan pre-filters through three broadcast semi-joins on
    those positions BEFORE its shuffle, and the exact join afterwards
    removes the false positives — the result is EXACTLY the plain
    join the oracle states, but the shuffle carries only the
    surviving fraction of the fact table. This is what runtime
    bloom-filter pushdown does; stated explicitly so the plan shape
    is pinned rather than left to cost heuristics."""
    from .sketches import _BLOOM_A, _h

    m = 1 << 17
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    bits = (
        o.select(
            F.explode(
                F.array(
                    *[F.expr(_h("o_orderkey", a, m)) for a in _BLOOM_A]
                )
            ).alias("pos")
        )
        .distinct()
    )
    reduced = li
    for i, a in enumerate(_BLOOM_A):
        reduced = reduced.withColumn(
            f"p{i}", F.expr(_h("l_orderkey", a, m))
        ).join(
            F.broadcast(bits.withColumnRenamed("pos", f"hit{i}")),
            F.col(f"p{i}") == F.col(f"hit{i}"),
            "left_semi",
        )
    return (
        reduced.join(o, reduced.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_partkey", "o_orderdate")
        .agg(dsum2("l_extendedprice", "l_discount").alias("revenue"))
    )

@query(
    "join_null_safe",
    oracle="""
WITH a AS (
  SELECT c_custkey, nullif(c_nationkey, 5) AS nk FROM customer
), b AS (
  SELECT s_suppkey, nullif(s_nationkey, 5) AS nk FROM supplier
)
SELECT a.nk, COUNT(*) AS n_pairs,
       COUNT(DISTINCT a.c_custkey) AS n_cust,
       COUNT(DISTINCT b.s_suppkey) AS n_supp
FROM a JOIN b ON a.nk IS NOT DISTINCT FROM b.nk
GROUP BY a.nk
""",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of silently dropping — the semantics a
    CDC/entity-resolution join needs when the key itself is
    nullable. Nation 5 is nulled on both sides to exercise the NULL
    bucket; the plan stays a hash join because <=> is still an
    equality predicate (NULLs hash to one bucket — at scale a hot
    NULL bucket is the classic skew case join_skew_salted handles)."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", F.expr("nullif(c_nationkey, 5)").alias("nk")
    )
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", F.expr("nullif(s_nationkey, 5)").alias("nk_s")
    )
    return (
        c.join(s, F.col("nk").eqNullSafe(F.col("nk_s")))
        .groupBy("nk")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("c_custkey").alias("n_cust"),
            F.countDistinct("s_suppkey").alias("n_supp"),
        )
    )

KNN_K = 3
KNN_RADIUS = 0.08


@query(
    "join_knn_radius",
    oracle=f"""
WITH p AS (
  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
         CAST(embedding[2] AS DOUBLE) AS y
  FROM embeddings
), pairs AS (
  SELECT a.vec_id, b.vec_id AS neighbor,
         sqrt((a.x - b.x) * (a.x - b.x)
              + (a.y - b.y) * (a.y - b.y)) AS dist
  FROM p a JOIN p b
    ON a.vec_id <> b.vec_id
   AND sqrt((a.x - b.x) * (a.x - b.x)
            + (a.y - b.y) * (a.y - b.y)) < {KNN_RADIUS}
), ranked AS (
  SELECT vec_id, neighbor, dist,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY dist, neighbor) AS rn
  FROM pairs
)
SELECT vec_id, neighbor, dist, CAST(rn AS INT) AS rn
FROM ranked WHERE rn <= {KNN_K}
""",
)
def join_knn_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest-neighbor join in 2-D, bounded by a search radius —
    the exact spatial companion to sim_search_topk's embedding ANN:
    for every point, its {KNN_K} nearest others within r (geo
    proximity matching, store-to-customer assignment, hotspot
    linkage). Bounding by r is what makes EXACT distributed kNN
    possible with one equi-join: any neighbor within r provably lies
    in the 3x3 cell neighborhood of an r-sided grid, so candidates
    come from the same constant-replication grid join as
    join_spatial_grid and the per-point top-k is a PARTITIONED
    row_number (rank-limit pushdown bounds state at k per partition).
    The oracle is the brute-force all-pairs theta join + window
    (intentionally naive, see PLANS.md). Distances are the identical
    IEEE expression on both engines, unrounded; ties break by
    neighbor id so the ranking is total."""
    r = KNN_RADIUS
    p = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding")[0].cast("double").alias("x"),
        F.col("embedding")[1].cast("double").alias("y"),
    )
    cell = lambda c: F.floor(c / F.lit(r)).cast("bigint")  # noqa: E731
    home = p.select(
        "vec_id", "x", "y",
        cell(F.col("x")).alias("cx"), cell(F.col("y")).alias("cy"),
    )
    offsets = F.expr(
        "explode(flatten(transform(sequence(-1, 1), "
        "dx -> transform(sequence(-1, 1), dy -> struct(dx, dy)))))"
    )
    probe = home.select(
        F.col("vec_id").alias("neighbor"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        "cx",
        "cy",
        offsets.alias("o"),
    ).select(
        "neighbor",
        "bx",
        "by",
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
    )
    dist = F.sqrt(
        (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx"))
        + (F.col("y") - F.col("by")) * (F.col("y") - F.col("by"))
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "neighbor")
    return (
        home.join(probe, ["cx", "cy"])
        .filter(F.col("vec_id") != F.col("neighbor"))
        .withColumn("dist", dist)
        .filter(F.col("dist") < r)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KNN_K)
        .select("vec_id", "neighbor", "dist", "rn")
    )


@query(
    "join_asof_forward",
    oracle="""
WITH v AS (
  SELECT user_id, ts, event_id AS view_id
  FROM events WHERE event_type = 'view'
), p AS (
  SELECT user_id, ts, MIN(event_id) AS purchase_id
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT v.view_id, v.user_id, p.ts AS purchase_ts, p.purchase_id
FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.ts <= p.ts
""",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each view ⋈ the EARLIEST purchase
    at-or-after it, per user — the conversion-attribution direction
    (join_asof looks backward for causes; this looks forward for
    outcomes). Same union-window rewrite, time-reversed: tag both
    sides, one shuffle on user_id, and a running
    last_value(ignorenulls) over ts-DESCENDING order carries the
    next purchase backward to every view; at equal ts the purchase
    sorts first so at-or-after is inclusive, and purchases are
    pre-deduped to MIN event_id per (user, ts) in BOTH engines so
    the winner is unique. Linear per key — never a range-join
    explosion — while DuckDB's native ASOF (<= direction) serves as
    the oracle."""
    ev = load(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("purchase_id"))
    )
    tagged = p.select(
        "user_id", "ts", F.lit(0).alias("tag"), "purchase_id",
        F.lit(None).cast("long").alias("view_id"),
    ).unionAll(
        v.select(
            "user_id", "ts", F.lit(1).alias("tag"),
            F.lit(None).cast("long").alias("purchase_id"), "view_id",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn(
            "np_id", F.last("purchase_id", ignorenulls=True).over(w)
        )
        .withColumn(
            "np_ts",
            F.last(
                F.when(F.col("purchase_id").isNotNull(), F.col("ts")),
                ignorenulls=True,
            ).over(w),
        )
        .filter(F.col("tag") == 1)
        .select(
            "view_id",
            "user_id",
            F.col("np_ts").alias("purchase_ts"),
            F.col("np_id").alias("purchase_id"),
        )
    )


DBSCAN_EPS2 = 0.0004  # eps = 0.02, compared as squared distance
DBSCAN_MIN_NEIGHBORS = 3  # minPts = 4 including the point itself


@query(
    "geo_dbscan",
    oracle=f"""
WITH RECURSIVE p AS (
  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
         CAST(embedding[2] AS DOUBLE) AS y
  FROM embeddings
), prs AS (
  SELECT a.vec_id AS u, b.vec_id AS v
  FROM p a JOIN p b
    ON a.vec_id <> b.vec_id
   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       < CAST({DBSCAN_EPS2!r} AS DOUBLE)
), deg AS (
  SELECT u AS vec_id, CAST(COUNT(*) AS BIGINT) AS n FROM prs GROUP BY u
), core AS (
  SELECT vec_id FROM deg WHERE n >= {DBSCAN_MIN_NEIGHBORS}
), ce AS (
  SELECT u, v FROM prs
  WHERE u IN (SELECT vec_id FROM core)
    AND v IN (SELECT vec_id FROM core)
), r(node, root) AS (
  SELECT vec_id, vec_id FROM core
  UNION
  SELECT e.v, r.root FROM ce e JOIN r ON r.node = e.u
), comp AS (
  SELECT node, MIN(root) AS cluster_id FROM r GROUP BY node
), border AS (
  SELECT prs.u AS vec_id, MIN(comp.cluster_id) AS cluster_id
  FROM prs JOIN comp ON comp.node = prs.v
  WHERE prs.u NOT IN (SELECT vec_id FROM core)
  GROUP BY prs.u
)
SELECT p.vec_id,
       CASE WHEN c.node IS NOT NULL THEN 'core'
            WHEN b.vec_id IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       CAST(COALESCE(c.cluster_id, b.cluster_id) AS BIGINT)
         AS cluster_id
FROM p
LEFT JOIN comp c ON c.node = p.vec_id
LEFT JOIN border b ON b.vec_id = p.vec_id
""",
)
def geo_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over the 2-D embedding projection — the density
    clustering that finds arbitrary-shape clusters AND labels noise,
    which k-means structurally cannot: points with >=
    {DBSCAN_MIN_NEIGHBORS} eps-neighbors are CORES, cores within eps
    connect into clusters (component id = min core vec_id), non-core
    points adjacent to a core are BORDERS (ties -> smallest cluster
    id), everything else is NOISE. Scale plan: the eps-pair table
    comes from the join_spatial_grid 3x3 grid-cell equi-join (never
    all-pairs); core components run min-label propagation with a
    POINTER-JUMPING round after every hop (label = label(label)),
    collapsing chains exponentially so a blob of diameter D
    converges in O(log D) shuffles instead of D — the doubling that
    makes density clustering survive a dense 100 TB region. The
    oracle replays with the naive all-pairs join + recursive-CTE
    closure (oracle-scale-only). Distances compare SQUARED against
    the same literal in both engines — no sqrt anywhere."""
    p = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding")[0].cast("double").alias("x"),
        F.col("embedding")[1].cast("double").alias("y"),
    )
    return dbscan_over(
        p, "vec_id", "x", "y",
        eps=0.02, eps2_literal=DBSCAN_EPS2,
        min_neighbors=DBSCAN_MIN_NEIGHBORS,
    )


def dbscan_over(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: float,
    eps2_literal: float,
    min_neighbors: int,
) -> DataFrame:
    """Generic grid-bucketed 2-D DBSCAN over any (id, x, y)
    DataFrame — the library form of geo_dbscan (same grid pair
    generation, pointer-jumping components, and border/noise
    classification). eps2_literal is compared verbatim so callers
    can pin the exact squared-radius constant."""
    p = points.select(
        F.col(id_col).alias("vec_id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    r = eps
    cell = lambda c: F.floor(c / F.lit(r)).cast("bigint")  # noqa: E731
    home = p.select(
        "vec_id", "x", "y",
        cell(F.col("x")).alias("cx"), cell(F.col("y")).alias("cy"),
    )
    offsets = F.expr(
        "explode(flatten(transform(sequence(-1, 1), "
        "dx -> transform(sequence(-1, 1), dy -> struct(dx, dy)))))"
    )
    probe = home.select(
        F.col("vec_id").alias("b_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        "cx",
        "cy",
        offsets.alias("o"),
    ).select(
        "b_id", "bx", "by",
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
    )
    d2 = (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx")) + (
        F.col("y") - F.col("by")
    ) * (F.col("y") - F.col("by"))
    prs = (
        home.join(probe, ["cx", "cy"])
        .filter(F.col("vec_id") != F.col("b_id"))
        .filter(d2 < F.expr(f"CAST({eps2_literal!r} AS DOUBLE)"))
        .select(F.col("vec_id").alias("u"), F.col("b_id").alias("v"))
        .localCheckpoint(eager=True)
    )
    deg = prs.groupBy(F.col("u").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("n")
    )
    core = deg.filter(
        F.col("n") >= min_neighbors
    ).select("vec_id")
    # Checkpoint the core-core edge table PARTITIONED ON u, the key
    # every propagation round joins on: the build chain leaves it
    # hash(v)-partitioned, so without the repartition the loop pays a
    # full edge-table Exchange in EVERY round (guide §2.4 — one
    # upfront shuffle buys R round shuffles of the biggest table).
    ce = (
        prs.join(core.withColumnRenamed("vec_id", "u"), "u")
        .join(core.withColumnRenamed("vec_id", "v"), "v")
        .select("u", "v")
        .repartition("u")
        .localCheckpoint(eager=True)
    )
    # min-label propagation + pointer jumping (label = label(label))
    labels = core.select(
        F.col("vec_id").alias("id"), F.col("vec_id").alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(40):
        neigh = (
            ce.join(labels, ce.u == labels.id)
            .groupBy("v")
            .agg(F.min("label").alias("nmin"))
        )
        # carry the round-start label so chg covers the HOP as well as
        # the jump: a round that changes nothing anywhere is a true
        # fixpoint, which retires the former extra probe-hop join at
        # termination (one fewer edge-table pass per query)
        hopped = labels.select(
            "id", F.col("label").alias("label0")
        ).join(neigh, F.col("id") == neigh.v, "left").select(
            "id",
            "label0",
            F.least("label0", F.coalesce("nmin", "label0")).alias("label"),
        )
        lab2 = hopped.select(
            F.col("id").alias("jid"), F.col("label").alias("jlabel")
        )
        jumped = (
            hopped.join(lab2, hopped.label == lab2.jid, "left")
            .select(
                "id",
                F.least(
                    "label", F.coalesce("jlabel", "label")
                ).alias("label"),
                (
                    F.least("label", F.coalesce("jlabel", "label"))
                    < F.col("label0")
                ).alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = jumped.filter("chg").count()
        labels = jumped.drop("chg")
        if changed == 0:
            break
    comp = labels.select(
        F.col("id").alias("vec_id"), F.col("label").alias("cluster_id")
    )
    border = (
        prs.join(
            comp.withColumnRenamed("vec_id", "v"), "v"
        )
        .join(
            core.withColumnRenamed("vec_id", "u"), "u", "left_anti"
        )
        .groupBy(F.col("u").alias("vec_id"))
        .agg(F.min("cluster_id").alias("b_cluster"))
    )
    return (
        p.select("vec_id")
        .join(comp, "vec_id", "left")
        .join(border, "vec_id", "left")
        .select(
            "vec_id",
            F.when(F.col("cluster_id").isNotNull(), "core")
            .when(F.col("b_cluster").isNotNull(), "border")
            .otherwise("noise")
            .alias("role"),
            F.coalesce("cluster_id", "b_cluster")
            .cast("bigint")
            .alias("cluster_id"),
        )
    )


@query(
    "join_division",
    oracle="""
WITH divisor AS (
  SELECT DISTINCT o_orderpriority AS prio FROM orders
), pairs AS (
  SELECT DISTINCT o_custkey, o_orderpriority AS prio FROM orders
), qualified AS (
  SELECT o_custkey
  FROM pairs
  GROUP BY o_custkey
  HAVING COUNT(*) = (SELECT COUNT(*) FROM divisor)
)
SELECT c.c_custkey, c.c_name,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM divisor) AS n_required
FROM customer c JOIN qualified q ON q.o_custkey = c.c_custkey
""",
)
def join_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational DIVISION — 'customers who ordered under ALL five
    order priorities' — the classic for-all operator SQL lacks a
    keyword for, and the one canonical join pattern the join family
    (semi/anti/outer/asof/range/theta/fuzzy...) was still missing.
    Codd's textbook forms are the double NOT EXISTS or the set
    difference; the scale-correct relational-algebra plan used here
    is the COUNTING form: distinct (dividend, divisor-member)
    pairs, a per-dividend count, HAVING count == |divisor|.

    Exactness: pure key joins and exact integer counts — no floats
    anywhere. Scale shape: the distinct-pair aggregate shuffles one
    row per (customer x held priority) — bounded by 5x customers,
    never the raw fact table; the divisor cardinality is a 1-row
    scalar; the final customer join is key-equi (broadcast-able
    dimension at any scale where customers fit the dim tier,
    shuffle-join otherwise)."""
    o = load(spark, sf_dir, "orders")
    divisor = o.select("o_orderpriority").distinct()
    n_div = divisor.count()
    pairs = o.select("o_custkey", "o_orderpriority").distinct()
    qualified = (
        pairs.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("held"))
        .filter(F.col("held") == n_div)
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return c.join(
        qualified, c["c_custkey"] == qualified["o_custkey"]
    ).select(
        "c_custkey",
        "c_name",
        F.lit(n_div).cast("bigint").alias("n_required"),
    )
