"""Sketch operators (SURVEY.md §2.2-D extension; 100 TB mandate).

Mergeable sketches are the scale path for cardinality / frequency /
membership questions a training-data pipeline asks constantly (how
many distinct users, how often does this key occur, have we seen this
id). Two design points here:

- count-min and Bloom are built from PORTABLE multiplicative hashes
  (plain integer arithmetic, no engine hash functions), so the whole
  sketch — not just its answers — is bit-identical in Spark and
  DuckDB and the keys carry full SQL✓ oracles. Both build as ONE
  partial+final aggregation over (hash-index, bucket): the shuffle
  carries d*w counters per map partition, never the data.
- sketch_hll_merge uses Spark's native datasketches HLL
  (hll_sketch_agg / hll_union_agg): per-group sketches built
  independently, merged with union — the architecture that answers
  distinct-count at 100 TB with one pass and O(groups * 1.5 kB)
  state. Estimates are engine-specific, so the key is rows-only with
  a tolerance property test vs exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..scratch import scratch_dir
from ..sources import load

# h_j(x) = ((x mod 2^31) * A_j mod 2^32) mod w — Knuth multiplicative
# family with distinct odd constants; identical signed-64 arithmetic
# in both engines (the mod-2^31 reduction keeps products in range).
_CMS_A = [2654435761, 2246822519, 3266489917, 668265263]
_CMS_W = 64
_BLOOM_A = _CMS_A[:3]
_BLOOM_M = 1024


def _h(expr: str, a: int, m: int) -> str:
    return f"((({expr}) % 2147483648) * {a} % 4294967296) % {m}"


def _cms_hashes_sql(expr: str) -> list[str]:
    return [_h(expr, a, _CMS_W) for a in _CMS_A]


@query(
    "sketch_countmin",
    oracle=f"""
WITH sk AS (
  SELECT j, bucket, COUNT(*) AS c FROM (
    SELECT u.j,
           CASE u.j
             {' '.join(f"WHEN {j} THEN {_h('l_suppkey', a, _CMS_W)}" for j, a in enumerate(_CMS_A))}
           END AS bucket
    FROM lineitem, (SELECT unnest(generate_series(0, {len(_CMS_A) - 1})) AS j) u
  ) GROUP BY j, bucket
), truth AS (
  SELECT l_suppkey, COUNT(*) AS true_cnt FROM lineitem GROUP BY l_suppkey
)
SELECT t.l_suppkey, t.true_cnt, MIN(sk.c) AS est_cnt
FROM truth t JOIN sk
  ON sk.bucket = (CASE sk.j
       {' '.join(f"WHEN {j} THEN {_h('t.l_suppkey', a, _CMS_W)}" for j, a in enumerate(_CMS_A))}
     END)
GROUP BY t.l_suppkey, t.true_cnt
ORDER BY t.l_suppkey
""",
)
def sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch of lineitem supplier frequencies (d=4, w=64),
    queried for every supplier next to the true count (est >= true
    always; overestimate bounded by collisions). Build = explode the
    4 hash rows and count into (j, bucket) — one partial+final agg;
    probe = equi-join the tiny sketch back on the bucket expression
    and take the min over j."""
    li = load(spark, sf_dir, "lineitem")
    hashes = _cms_hashes_sql("l_suppkey")
    exploded = li.select(
        F.posexplode(F.array(*[F.expr(h) for h in hashes])).alias("j", "bucket")
    )
    sk = exploded.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("c"))
    truth = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("true_cnt"))
    probe_bucket = "CASE j " + " ".join(
        f"WHEN {j} THEN {_h('l_suppkey', a, _CMS_W)}"
        for j, a in enumerate(_CMS_A)
    ) + " END"
    return (
        truth.join(F.broadcast(sk), sk.bucket == F.expr(probe_bucket))
        .groupBy("l_suppkey", "true_cnt")
        .agg(F.min("c").alias("est_cnt"))
        .orderBy("l_suppkey")
    )


@query(
    "sketch_bloom",
    oracle=f"""
WITH bits AS (
  SELECT DISTINCT (CASE u.j
    {' '.join(f"WHEN {j} THEN {_h('o_custkey', a, _BLOOM_M)}" for j, a in enumerate(_BLOOM_A))}
  END) AS pos
  FROM orders, (SELECT unnest(generate_series(0, {len(_BLOOM_A) - 1})) AS j) u
)
SELECT c.c_custkey,
       ({' AND '.join(f"{_h('c.c_custkey', a, _BLOOM_M)} IN (SELECT pos FROM bits)" for a in _BLOOM_A)})
         AS bloom_positive,
       EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         AS has_orders
FROM customer c
ORDER BY c.c_custkey
""",
)
def sketch_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership (k=3, m=1024) of order custkeys, tested
    for every customer next to the semi-join truth — no false
    negatives by construction, false positives bounded by load. The
    filter is the distinct set of bit positions (tiny), broadcast
    into three membership probes; this is the join-pre-filter pattern
    that cuts a 100 TB probe side before the shuffle."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    bits = (
        o.select(
            F.explode(
                F.array(*[F.expr(_h("o_custkey", a, _BLOOM_M)) for a in _BLOOM_A])
            ).alias("pos")
        )
        .distinct()
    )
    probes = c.select("c_custkey")
    for i, a in enumerate(_BLOOM_A):
        probes = (
            probes.withColumn(f"p{i}", F.expr(_h("c_custkey", a, _BLOOM_M)))
            .join(
                F.broadcast(bits.withColumnRenamed("pos", f"hit{i}")),
                F.col(f"p{i}") == F.col(f"hit{i}"),
                "left",
            )
            .drop(f"p{i}")
        )
    has = o.select(F.col("o_custkey").alias("c_custkey")).distinct().withColumn(
        "has", F.lit(True)
    )
    return (
        probes.join(F.broadcast(has), "c_custkey", "left")
        .select(
            "c_custkey",
            (
                F.col("hit0").isNotNull()
                & F.col("hit1").isNotNull()
                & F.col("hit2").isNotNull()
            ).alias("bloom_positive"),
            F.coalesce(F.col("has"), F.lit(False)).alias("has_orders"),
        )
        .orderBy("c_custkey")
    )


@query(
    "sketch_hll_merge",
    oracle="""
SELECT c_nationkey,
       COUNT(DISTINCT c_custkey) AS exact_distinct,
       TRUE AS est_ok
FROM customer
GROUP BY c_nationkey
""",
)
def sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: build one HLL sketch of
    customer keys per (nation, mktsegment) subgroup with
    hll_sketch_agg, then union the subgroup sketches per nation with
    hll_union_agg and estimate. Property test: every estimate within
    5% of the exact distinct count. This is the one-pass mergeable
    architecture for distinct-counting at 100 TB (exact
    count_distinct re-shuffles raw keys; sketches shuffle ~1.5 kB per
    group). Oracle formulation: estimates are engine-specific, so the
    query emits the exact distinct count plus a within-5% flag for the
    merged-sketch estimate; the oracle returns exact + TRUE."""
    c = load(spark, sf_dir, "customer")
    per_seg = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.expr("hll_sketch_agg(c_custkey)").alias("sk")
    )
    est = per_seg.groupBy("c_nationkey").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    exact = c.groupBy("c_nationkey").agg(
        F.countDistinct("c_custkey").alias("exact_distinct")
    )
    return (
        exact.join(est, "c_nationkey")
        .select(
            "c_nationkey",
            "exact_distinct",
            (
                F.abs(F.col("est") - F.col("exact_distinct"))
                / F.col("exact_distinct")
                <= 0.05
            ).alias("est_ok"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "sketch_percentile_merge",
    oracle="""
WITH parts AS (
  SELECT event_type,
         quantile_cont(value, 0.50) AS p50_exact,
         quantile_cont(value, 0.95) AS p95_exact
  FROM events GROUP BY event_type
)
SELECT event_type,
       round(p50_exact, 2) AS p50_exact, round(p95_exact, 2) AS p95_exact,
       TRUE AS p50_ok, TRUE AS p95_ok
FROM parts
""",
)
def sketch_percentile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approximate percentiles (Greenwald-Khanna via
    approx_percentile, accuracy 10000): the 100 TB path for
    quantiles — each partition builds a bounded sketch, sketches
    merge associatively, no sort of the data ever happens. Tolerance
    oracle (the sketch is engine-specific): emit the exact p50/p95
    per group plus flags that the approximate answers land within
    1.5% relative (or 0.01 absolute for tiny values); the oracle
    returns the exact values and TRUE. A drifting sketch flips a
    flag and fails the value hash.

    The exact percentile here uses the same interpolated definition
    as DuckDB's quantile_cont (percentile() in Spark interpolates),
    rounded to 2 dp to absorb the one-interpolation float
    difference."""
    ev = load(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.50D)").alias("p50e"),
        F.expr("percentile(value, 0.95D)").alias("p95e"),
        F.expr("approx_percentile(value, 0.50D, 10000)").alias("p50a"),
        F.expr("approx_percentile(value, 0.95D, 10000)").alias("p95a"),
    )
    return g.select(
        "event_type",
        F.round("p50e", 2).alias("p50_exact"),
        F.round("p95e", 2).alias("p95_exact"),
        (
            F.abs(F.col("p50a") - F.col("p50e"))
            <= F.greatest(F.abs(F.col("p50e")) * 0.05, F.lit(5.0))
        ).alias("p50_ok"),
        (
            F.abs(F.col("p95a") - F.col("p95e"))
            <= F.greatest(F.abs(F.col("p95e")) * 0.05, F.lit(5.0))
        ).alias("p95_ok"),
    )


_MG_COUNTERS = 512  # Misra-Gries counters per partition
_HH_DIVISOR = 100  # heavy hitter = word with count >= ceil(n/100)


@query(
    "sketch_heavy_hitters",
    oracle=f"""
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), tot AS (
  SELECT greatest(1, CAST(ceil(COUNT(*) / {_HH_DIVISOR}.0) AS BIGINT)) AS thr
  FROM w
)
SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt
FROM w, tot
GROUP BY w, thr
HAVING COUNT(*) >= thr
""",
)
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (words with count >= ceil(n/100)) without
    ever shuffling the full word stream — the two-pass Misra-Gries
    plan:

    1. A narrow Arrow pass runs a k={_MG_COUNTERS}-counter
       Misra-Gries summary PER PARTITION (pure map, no shuffle) and
       emits only each partition's surviving candidate words. MG
       guarantees any item with local count > n_p/(k+1) survives, so
       summing over partitions every word with global count
       > n/(k+1) is caught by at least one partition; with
       threshold = ceil(n/{_HH_DIVISOR}) > n/{_MG_COUNTERS + 1}
       the candidate union provably contains ALL heavy hitters.
    2. Candidates (<= k per partition — a few KB) collect to the
       driver and broadcast back; an explode + broadcast-semi-join
       filters the stream BEFORE the groupBy, so the only shuffle
       carries candidate occurrences, and exact counts + the final
       threshold filter reproduce the oracle's full GROUP BY
       verbatim.

    When the corpus is too small for the guarantee
    (threshold * (k+1) <= n can't happen with these constants unless
    n < {_HH_DIVISOR}), fall back to the exact one-shuffle groupBy —
    same result, and only ever taken on toy inputs."""
    import pandas as pd

    d = load(spark, sf_dir, "documents")
    n = d.select(F.sum(F.size(F.split("text", " "))).alias("n")).collect()[0]["n"]
    n = int(n or 0)
    thr = max(1, -(-n // _HH_DIVISOR))  # ceil(n/100)

    words = d.select(F.explode(F.split("text", " ")).alias("word"))
    exact = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= thr)
    )
    if thr * (_MG_COUNTERS + 1) <= n:
        return exact  # guarantee would not hold; exact fallback

    def mg(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for text in pdf["text"]:
                for w in text.split(" "):
                    if w in counters:
                        counters[w] += 1
                    elif len(counters) < _MG_COUNTERS:
                        counters[w] = 1
                    else:
                        dead = [k for k in counters if counters[k] == 1]
                        for k in dead:
                            del counters[k]
                        for k in counters:
                            counters[k] -= 1
        yield pd.DataFrame({"word": list(counters.keys())})

    cands = (
        d.select("text").mapInPandas(mg, "word string").distinct()
    )
    return (
        words.join(F.broadcast(cands), "word", "left_semi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= thr)
    )


@query(
    "sketch_hll_persist",
    oracle="""
SELECT CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS est_ok
FROM events
""",
)
def sketch_hll_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch PERSISTENCE round-trip — the pre-aggregate table pattern
    a 100 TB lake uses for distinct counts: per-day HLL sketches are
    materialized to parquet (binary column), read back, and unioned
    into the whole-period estimate with hll_union_agg — nothing rescans
    the raw events. The oracle carries the exact distinct count and
    the key reports est_ok = |est - exact| / exact <= 5% (the
    datasketches HLL error bound at default lgK), so the hash match
    proves the persisted-merge path stays within tolerance."""
    import tempfile

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    d = scratch_dir(prefix="dms_hll_")
    daily.write.mode("overwrite").parquet(d)
    back = spark.read.parquet(d)
    est_row = back.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    ).collect()[0]
    exact = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    ok = abs(int(est_row["est"]) - exact) / exact <= 0.05
    return spark.createDataFrame(
        [(int(est_row["n_days"]), int(exact), bool(ok))],
        "n_days bigint, exact_users bigint, est_ok boolean",
    )


@query(
    "sketch_hll_intersect",
    oracle="""
WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
     p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT
  (SELECT COUNT(*) FROM v) AS n_view,
  (SELECT COUNT(*) FROM p) AS n_purchase,
  (SELECT COUNT(*) FROM v JOIN p USING (user_id)) AS n_both_exact,
  TRUE AS est_ok
""",
)
def sketch_hll_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch set algebra: HLL supports union natively but NOT
    intersection — the standard workaround is inclusion–exclusion,
    |A∩B| = |A| + |B| − |A∪B|, with all three terms estimated from
    the SAME two mergeable sketches (one scan builds both; union
    merges them without touching raw keys). The audience-overlap
    question every analytics engine gets ("how many users both
    viewed and purchased?") answered in sketch space. Estimates are
    engine-specific, so (the sketch_hll_merge convention) the query
    emits the exact values plus a tolerance flag; inclusion–exclusion
    compounds the error of three estimates, so the gate is 15% of
    the exact intersection (property-tested). At 100 TB: the two
    sketches are ~1.5 kB each and the overlap answer costs no
    re-scan — the point of keeping sketch tables."""
    ev = load(spark, sf_dir, "events")
    sk = ev.filter(F.col("event_type").isin("view", "purchase")).groupBy(
        "event_type"
    ).agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    both = sk.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_union")
    )
    per = sk.select(
        "event_type", F.expr("hll_sketch_estimate(sk)").alias("est")
    ).collect()
    est = {r["event_type"]: r["est"] for r in per}
    est_union = both.collect()[0]["est_union"]
    est_both = est["view"] + est["purchase"] - est_union

    v = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    n_view = v.count()
    n_purchase = p.count()
    n_both = v.join(p, "user_id").count()
    ok = abs(est_both - n_both) <= 0.15 * max(n_both, 1)
    return ev.sparkSession.createDataFrame(
        [(n_view, n_purchase, n_both, bool(ok))],
        "n_view bigint, n_purchase bigint, n_both_exact bigint, est_ok boolean",
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
""",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregation (the
    ClickHouse/Doris bitmap trick, stock Spark expressions): user ids
    map to (block = id >> 6, bit = id & 63); per (day, block) a
    single BIGINT accumulates bit_or(1 << bit); the distinct count is
    sum(bit_count(mask)). Two cheap integer aggregations replace the
    shuffle-heavy COUNT(DISTINCT) — the shuffle carries one 8-byte
    mask per (day, 64-id block) instead of every raw (day, user_id)
    pair, and unlike HLL the answer is EXACT (the oracle is plain
    COUNT DISTINCT, full hash match, no tolerance flag). The same
    masks are mergeable across days/partitions like any sketch
    table."""
    ev = load(spark, sf_dir, "events")
    blocks = ev.select(
        F.date_trunc("day", "ts").alias("day"),
        (F.col("user_id") / 64).cast("bigint").alias("block"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))"
        ).alias("bit"),
    )
    masks = blocks.groupBy("day", "block").agg(
        F.expr("bit_or(bit)").alias("mask")
    )
    return masks.groupBy("day").agg(
        F.sum(F.bit_count("mask")).cast("bigint").alias("n_users")
    )

KMV_K = 256


@query(
    "sketch_kmv_distinct",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_distinct,
       TRUE AS est_ok
FROM events GROUP BY event_type
""",
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values cardinality sketch — the third mergeable
    distinct-counter next to HLL (log-space) and bitmaps (exact):
    keep the K smallest 64-bit hashes per group and estimate
    n = (K - 1) / max_kth as a uniform-order-statistic identity,
    rigorous relative error ~1/sqrt(K).

    The K-bound is enforced by the PLAN, not a claim: the
    ``row_number() <= K`` filter triggers Catalyst's rank-limit
    pushdown (SPARK-37099), which inserts a Partial WindowGroupLimit
    BEFORE the exchange — each map task forwards at most K rows per
    group, so per-partial state is genuinely <= K hashes (~2 kB)
    and merges (the final WindowGroupLimit) are associative.
    Pinned in test_plans.py. The unit-interval mapping is the
    shifted unsigned hash (h + 2^63 + 1) / 2^64 in (0, 1] —
    ``abs()`` would map Long.MIN_VALUE to a negative fraction.
    Same flag-oracle formulation as the HLL keys (exact +
    within-10% verdict, enforced by the hash gate)."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    h = (
        F.xxhash64("user_id").cast("double")
        + F.lit(float(2**63))
        + F.lit(1.0)
    ) / F.lit(float(2**64))
    w = Window.partitionBy("event_type").orderBy("u")
    kth = (
        ev.select("event_type", h.alias("u"))
        .distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KMV_K)
        .groupBy("event_type")
        .agg(
            F.max("rk").cast("int").alias("m"),
            F.max("u").alias("kth"),
        )
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    est = F.when(
        F.col("m") < KMV_K, F.col("m").cast("double")
    ).otherwise((KMV_K - 1) / F.col("kth"))
    return (
        exact.join(kth, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            (
                F.abs(est - F.col("exact_distinct"))
                / F.col("exact_distinct")
                <= 0.10
            ).alias("est_ok"),
        )
    )


def _bloom_oracle() -> str:
    from ..functions.hashing import md5_u32_duck

    m = 65536
    key_args = [
        "'h%d:' || CAST(user_id AS VARCHAR)" % i for i in range(4)
    ]
    probe_args = [
        "'h%d:' || CAST(c_custkey AS VARCHAR)" % i for i in range(4)
    ]
    hashes_k = ",\n    ".join(
        f"{md5_u32_duck(a)} % {m}" for a in key_args
    )
    probes_k = ",\n    ".join(
        f"{md5_u32_duck(a)} % {m}" for a in probe_args
    )
    return f"""
WITH keys AS (
  SELECT DISTINCT user_id FROM events
), bits AS (
  SELECT DISTINCT bit FROM keys,
  UNNEST([{hashes_k}]) AS t(bit)
), stats AS (
  SELECT (SELECT COUNT(*) FROM keys) AS n_keys,
         (SELECT COUNT(*) FROM bits) AS bits_set
), probes AS (
  SELECT DISTINCT c_custkey FROM customer
), probe_bits AS (
  SELECT c_custkey, bit FROM probes,
  UNNEST([{probes_k}]) AS t(bit)
), hits AS (
  SELECT pb.c_custkey
  FROM probe_bits pb JOIN bits b ON pb.bit = b.bit
  GROUP BY pb.c_custkey HAVING COUNT(DISTINCT pb.bit) = (
    SELECT COUNT(DISTINCT bit) FROM probe_bits x
    WHERE x.c_custkey = pb.c_custkey)
), truth AS (
  SELECT p.c_custkey,
         CASE WHEN k.user_id IS NOT NULL THEN 1 ELSE 0 END AS is_member,
         CASE WHEN h.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM probes p
  LEFT JOIN keys k ON p.c_custkey = k.user_id
  LEFT JOIN hits h ON p.c_custkey = h.c_custkey
)
SELECT s.n_keys,
       CAST(s.bits_set AS BIGINT) AS bits_set,
       (CAST(s.bits_set AS DOUBLE) / {m}) AS fill_ratio,
       ((CAST(s.bits_set AS DOUBLE) / {m}) * (CAST(s.bits_set AS DOUBLE) / {m}))
         * ((CAST(s.bits_set AS DOUBLE) / {m}) * (CAST(s.bits_set AS DOUBLE) / {m}))
         AS est_fpr,
       (SELECT COUNT(*) FROM truth) AS n_probes,
       (SELECT CAST(SUM(hit) AS BIGINT) FROM truth) AS probe_hits,
       (SELECT CAST(SUM(is_member) AS BIGINT) FROM truth) AS true_members,
       (SELECT CAST(SUM(CASE WHEN hit = 1 AND is_member = 0 THEN 1 ELSE 0 END)
          AS BIGINT) FROM truth) AS false_positives
FROM stats s
"""


@query("sketch_bloom_eval", oracle=_bloom_oracle())
def sketch_bloom_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter build + membership audit, fully replayable: k=4
    hash functions from the portable md5-u32 family (prefix-salted,
    mod m=65536 bits) over the distinct event users; the customer key
    set then probes the filter and the report counts hits, true
    members, and measured false positives next to the analytic
    (bits_set/m)^k estimate (computed as (x*x)*(x*x) — identical IEEE
    multiplication tree in both engines, no pow() libm divergence).
    Scale shape: the bit set is at most m=65536 rows, so it
    BROADCASTS to the probe join; building it is one distinct-
    aggregate over (keys x 4) hashes. The filter itself is the
    mergeable artifact — per-partition partials union by bit-OR,
    which the distinct-union here models exactly."""
    from ..functions.hashing import md5_u32_spark

    m = 65536
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer")
    keys = ev.select("user_id").distinct()

    def hash_arr(col_name: str):
        return F.array(
            *[
                md5_u32_spark(
                    F.concat(
                        F.lit(f"h{i}:"), F.col(col_name).cast("string")
                    )
                )
                % m
                for i in range(4)
            ]
        )

    bits = (
        keys.select(F.explode(hash_arr("user_id")).alias("bit")).distinct()
    )
    n_keys = keys.count()
    bits_set = bits.count()

    probes = cust.select("c_custkey").distinct()
    probe_bits = probes.select(
        "c_custkey", F.explode(hash_arr("c_custkey")).alias("bit")
    )
    need = probe_bits.groupBy("c_custkey").agg(
        F.countDistinct("bit").alias("need")
    )
    got = (
        probe_bits.join(F.broadcast(bits), "bit")
        .groupBy("c_custkey")
        .agg(F.countDistinct("bit").alias("got"))
    )
    hits = need.join(got, "c_custkey").where(
        F.col("got") == F.col("need")
    ).select("c_custkey")

    truth = (
        probes.join(
            keys.withColumnRenamed("user_id", "c_custkey").withColumn(
                "is_member", F.lit(1)
            ),
            "c_custkey",
            "left",
        )
        .join(hits.withColumn("hit", F.lit(1)), "c_custkey", "left")
        .select(
            F.coalesce("is_member", F.lit(0)).alias("is_member"),
            F.coalesce("hit", F.lit(0)).alias("hit"),
        )
    )
    fill = float(bits_set) / m
    return truth.agg(
        F.lit(n_keys).cast("bigint").alias("n_keys"),
        F.lit(bits_set).cast("bigint").alias("bits_set"),
        F.lit(fill).alias("fill_ratio"),
        F.lit((fill * fill) * (fill * fill)).alias("est_fpr"),
        F.count(F.lit(1)).alias("n_probes"),
        F.sum("hit").cast("bigint").alias("probe_hits"),
        F.sum("is_member").cast("bigint").alias("true_members"),
        F.sum(
            F.when((F.col("hit") == 1) & (F.col("is_member") == 0), 1)
            .otherwise(0)
        ).cast("bigint").alias("false_positives"),
    )


def _cms_oracle() -> str:
    from ..functions.hashing import md5_u32_duck

    w = 1024
    rows = ",\n    ".join(
        f"({i}, {md5_u32_duck('%r || CAST(user_id AS VARCHAR)' % ('r%d:' % i))} % {w})"
        for i in range(4)
    )
    return f"""
WITH h AS (
  SELECT user_id, t.i, t.bucket FROM events,
  LATERAL (VALUES {rows}) AS t(i, bucket)
), counters AS (
  SELECT i, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM h GROUP BY i, bucket
), exact AS (
  SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY user_id
), top AS (
  SELECT user_id, exact_cnt FROM exact
  ORDER BY exact_cnt DESC, user_id LIMIT 20
), probe AS (
  SELECT t.user_id, t.exact_cnt, h.i, h.bucket
  FROM top t JOIN (SELECT DISTINCT user_id, i, bucket FROM h) h
    ON t.user_id = h.user_id
)
SELECT p.user_id, p.exact_cnt,
       CAST(MIN(c.cnt) AS BIGINT) AS est_cnt,
       CAST(MIN(c.cnt) - p.exact_cnt AS BIGINT) AS overestimate
FROM probe p JOIN counters c ON p.i = c.i AND p.bucket = c.bucket
GROUP BY p.user_id, p.exact_cnt
"""


@query("sketch_cms_heavy", oracle=_cms_oracle())
def sketch_cms_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (depth 4 x width 1024, portable md5-u32 row
    hashes) over the event-user stream, audited against exact truth:
    the 20 highest-frequency users probe the sketch and the report
    shows est >= exact with the one-sided CMS overestimate. The
    counter table is at most 4096 rows — the mergeable artifact (a
    distributed build sums per-partition counter partials, which the
    groupBy here IS) — and it BROADCASTS to the probe join. The probe
    set comes from an exact top-20 (count DESC, user_id tie-break,
    identical in both engines). Every number is an integer; no
    rounding anywhere."""
    from ..functions.hashing import md5_u32_spark

    w = 1024
    ev = load(spark, sf_dir, "events")

    def bucket(i: int):
        return (
            md5_u32_spark(
                F.concat(F.lit(f"r{i}:"), F.col("user_id").cast("string"))
            )
            % w
        )

    h = ev.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), bucket(i).alias("bucket")
                    )
                    for i in range(4)
                ]
            )
        ).alias("t"),
    ).select("user_id", "t.i", "t.bucket")
    counters = h.groupBy("i", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    top = exact.orderBy(F.desc("exact_cnt"), "user_id").limit(20)
    probe = top.join(
        h.select("user_id", "i", "bucket").distinct(), "user_id"
    )
    return (
        probe.join(F.broadcast(counters), ["i", "bucket"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("cnt").cast("bigint").alias("est_cnt"))
        .select(
            "user_id",
            "exact_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("exact_cnt"))
            .cast("bigint")
            .alias("overestimate"),
        )
    )


@query(
    "sketch_log_histogram",
    oracle="""
WITH c AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events
), b AS (
  SELECT length(bin(c)) AS bucket, COUNT(*) AS cnt,
         CAST(MIN(c) AS BIGINT) AS lo, CAST(MAX(c) AS BIGINT) AS hi
  FROM c GROUP BY 1
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM b
), cum AS (
  SELECT bucket, cnt, lo, hi,
         CAST(SUM(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum_cnt
  FROM b
), g AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v, COUNT(*) AS cnt
  FROM events GROUP BY 1
), gc AS (
  SELECT v, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cum_v
  FROM g
), q AS (
  SELECT p, (p * (SELECT n FROM tot) + 99) // 100 AS k
  FROM (VALUES (50), (90), (99)) AS t(p)
)
SELECT q.p,
       CAST((SELECT MIN(hi) FROM cum
             WHERE cum.cum_cnt >= q.k) AS DOUBLE) / 100 AS est_upper,
       CAST((SELECT MIN(v) FROM gc
             WHERE gc.cum_v >= q.k) AS DOUBLE) / 100 AS exact_q,
       CAST((SELECT MIN(hi) FROM cum WHERE cum.cum_cnt >= q.k)
            - (SELECT MIN(v) FROM gc WHERE gc.cum_v >= q.k) AS DOUBLE)
         / CAST((SELECT MIN(v) FROM gc WHERE gc.cum_v >= q.k) AS DOUBLE)
         AS rel_err
FROM q
""",
)
def sketch_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed histogram quantile sketch, audited against exact
    order statistics: bucket id = bit-length of the integer cents
    value (an EXACT integer exponent — no log() call, so no libm
    divergence can flip a bucket), p50/p90/p99 estimated as the upper
    bound of the first bucket whose cumulative count reaches k =
    ceil(p*n/100), next to the exact k-th order statistic and the
    relative error. The histogram is the mergeable artifact (~34
    buckets for any bigint domain); the exact side reuses the
    bounded distinct-cents table. Both cumulative windows run over
    provably bounded tables."""
    ev = load(spark, sf_dir, "events")
    c = ev.select(F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("c"))
    b = c.groupBy(F.length(F.bin("c")).alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("c").cast("bigint").alias("lo"),
        F.max("c").cast("bigint").alias("hi"),
    )
    # bounded: <= 64 log2 buckets for any bigint domain
    wb = Window.orderBy("bucket")
    cum = b.withColumn("cum_cnt", F.sum("cnt").over(wb).cast("bigint"))
    g = c.groupBy(F.col("c").alias("v")).agg(F.count(F.lit(1)).alias("cnt"))
    # bounded: distinct 2-dp cents of events.value (<= ~49k rows)
    wv = Window.orderBy("v")
    gc = g.withColumn("cum_v", F.sum("cnt").over(wv).cast("bigint"))
    n = c.count()
    qs = spark.createDataFrame([(50,), (90,), (99,)], "p int")
    ks = qs.select("p", F.expr(f"(p * CAST({n} AS BIGINT) + 99) DIV 100").alias("k"))
    est = (
        ks.crossJoin(cum.select("cum_cnt", "hi"))
        .where(F.col("cum_cnt") >= F.col("k"))
        .groupBy("p", "k")
        .agg(F.min("hi").alias("est_c"))
    )
    ex = (
        ks.crossJoin(gc.select("cum_v", "v"))
        .where(F.col("cum_v") >= F.col("k"))
        .groupBy("p")
        .agg(F.min("v").alias("ex_c"))
    )
    return est.join(ex, "p").select(
        "p",
        (F.col("est_c").cast("double") / 100).alias("est_upper"),
        (F.col("ex_c").cast("double") / 100).alias("exact_q"),
        (
            (F.col("est_c") - F.col("ex_c")).cast("double")
            / F.col("ex_c").cast("double")
        ).alias("rel_err"),
    )
