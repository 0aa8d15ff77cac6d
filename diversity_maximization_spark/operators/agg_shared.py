"""Shared exact-decimal/fold helpers for the aggregate family modules.

Split from the former monolithic operators/aggregates.py (r6 verdict
item 7); all public names are re-exported there, so existing imports
and registry behavior are unchanged.
"""


from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources import load


# Exact money arithmetic: every fixture money column is a 2-dp value,
# so ROUND(x*100) recovers the exact integer cents (verified: max
# |x*100 - round(x*100)| < 1e-8 across all money columns). Integer
# sums are associative — a 1000-way distributed sum hash-matches a
# single-threaded oracle exactly, which no double or double->DECIMAL
# cast can guarantee (Java's shortest-repr double->decimal rounding
# diverges from DuckDB's binary rounding on 3/4-dp products).


def cents(expr: str) -> str:
    """Exact integer cents of a 2-dp double column (SQL fragment)."""
    return f"CAST(ROUND(({expr}) * 100) AS BIGINT)"


def dsum(expr: str) -> Column:
    """Exact order-independent sum of a 2-dp numeric, as double."""
    return F.expr(f"CAST(SUM({cents(expr)}) AS DOUBLE) / 100")


def duck_dsum(expr: str) -> str:
    return f"(CAST(SUM({cents(expr)}) AS DOUBLE) / 100)"


def davg(expr: str) -> Column:
    """Exact-cents-sum / count — identical double in both engines."""
    return F.expr(f"CAST(SUM({cents(expr)}) AS DOUBLE) / 100 / COUNT(*)")


def duck_davg(expr: str) -> str:
    return f"(CAST(SUM({cents(expr)}) AS DOUBLE) / 100 / COUNT(*))"


def dsum2(a: str, b_complement: str) -> Column:
    """Exact SUM(a * (1 - b)) for 2-dp a and b: cents(a)*(100-cents(b))/1e4."""
    return F.expr(
        f"CAST(SUM({cents(a)} * (100 - {cents(b_complement)})) AS DOUBLE) / 10000"
    )


def duck_dsum2(a: str, b_complement: str) -> str:
    return (
        f"(CAST(SUM({cents(a)} * (100 - {cents(b_complement)})) AS DOUBLE) / 10000)"
    )


def dsum3(a: str, b_minus: str, c_plus: str) -> Column:
    """Exact SUM(a * (1 - b) * (1 + c)) via integer cents."""
    return F.expr(
        f"CAST(SUM({cents(a)} * (100 - {cents(b_minus)}) * (100 + {cents(c_plus)})) "
        f"AS DOUBLE) / 1000000"
    )


def duck_dsum3(a: str, b_minus: str, c_plus: str) -> str:
    return (
        f"(CAST(SUM({cents(a)} * (100 - {cents(b_minus)}) * (100 + {cents(c_plus)})) "
        f"AS DOUBLE) / 1000000)"
    )


def roc_auc_over(df: DataFrame, score_col: str, pos_col: str) -> DataFrame:
    """Exact tie-corrected rank-sum AUC kernel over (score, 0/1
    label) rows — shared by agg_roc_auc and api.roc_auc. Scores
    should be integer-exact (e.g. cents) for cross-engine
    bit-stability; the grouped score table bounds the prefix
    window."""
    g = df.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(pos_col).alias("pos"),
    )
    # bounded: distinct values of the (quantized) score domain
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    r = g.withColumn(
        "cum_less", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    )
    a = r.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).cast("bigint").alias("n_neg"),
        F.sum(
            F.col("pos") * (2 * F.col("cum_less") + F.col("cnt") + 1)
        ).cast("bigint").alias("rank2"),
    )
    return a.select(
        "n_pos",
        "n_neg",
        (
            (
                F.col("rank2") - F.col("n_pos") * (F.col("n_pos") + 1)
            ).cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
        ).alias("auc"),
    )


_MH_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_MH_R = " + ".join(
    f"(CAST(a{i} AS DOUBLE) * d{i} / (a{i} + b{i} + c{i} + d{i}))"
    for i in range(1, 6)
)
_MH_S = " + ".join(
    f"(CAST(b{i} AS DOUBLE) * c{i} / (a{i} + b{i} + c{i} + d{i}))"
    for i in range(1, 6)
)


def _mh_pivot_sql() -> str:
    cols = []
    for i, pr in enumerate(_MH_PRIOS, start=1):
        for letter in "abcd":
            cols.append(
                f"CAST(MAX(CASE WHEN pr = '{pr}' THEN {letter} END)"
                f" AS BIGINT) AS {letter}{i}"
            )
    return ", ".join(cols)


def pps_systematic_over(
    weights: DataFrame, key_col: str, weight_col: str, n: int
) -> DataFrame:
    """Generic systematic PPS sampler over any (key, weight) table —
    the library form of sample_pps_systematic (same half-offset
    integer crossing algebra and two-phase prefix sums)."""
    from ..plans.global_rank import with_range_bucket

    w = weights.select(
        F.col(key_col).alias("c_custkey"),
        F.col(weight_col).cast("bigint").alias("w"),
    )
    rb = with_range_bucket(w, "c_custkey").localCheckpoint(eager=False)
    subtotals = {
        r["_gr_bucket"]: r["bt"]
        for r in rb.groupBy("_gr_bucket")
        .agg(F.sum("w").alias("bt"))
        .collect()
    }
    total = int(sum(subtotals.values()))
    offsets, acc = {}, 0
    for b in sorted(subtotals):
        offsets[b] = acc
        acc += subtotals[b]
    off_map = F.create_map(
        *[F.lit(x) for b in sorted(offsets) for x in (b, offsets[b])]
    )
    win = (
        Window.partitionBy("_gr_bucket")
        .orderBy("c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rb.select(
        "c_custkey",
        "w",
        (
            F.element_at(off_map, F.col("_gr_bucket"))
            + F.sum("w").over(win)
        ).cast("bigint").alias("cum"),
    )
    lo = F.when(
        2 * n * (F.col("cum") - F.col("w")) < total, F.lit(0)
    ).otherwise(
        F.expr(
            f"({2 * n} * (cum - w) - {total}) div {2 * total}"
        ) + 1
    )
    hi = F.when(2 * n * F.col("cum") < total, F.lit(0)).otherwise(
        F.expr(f"({2 * n} * cum - {total}) div {2 * total}") + 1
    )
    hits = cum.select(
        "c_custkey", "w", "cum", (hi - lo).cast("bigint").alias("n_hits")
    )
    return hits.filter(F.col("n_hits") >= 1)


def growth_accounting_over(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Generic monthly growth-accounting kernel over any (user, ts)
    event DataFrame — the library form of agg_growth_accounting
    (same new/retained/resurrected/churned identities)."""
    um = df.select(
        F.col(user_col).alias("user_id"),
        F.date_trunc("month", ts_col).alias("m"),
    ).distinct()
    fm = um.groupBy("user_id").agg(F.min("m").alias("m0"))
    prev = um.select(
        "user_id",
        F.expr("m + INTERVAL 1 MONTH").alias("m"),
        F.lit(1).alias("was_active"),
    )
    cur = (
        um.join(fm, "user_id")
        .join(prev, ["user_id", "m"], "left")
        .select(
            "m",
            "m0",
            F.coalesce("was_active", F.lit(0)).alias("was_active"),
        )
    )
    max_m = um.agg(F.max("m").alias("mx"))
    nxt = um.select(
        "user_id", F.expr("m + INTERVAL 1 MONTH").alias("nm")
    )
    churn = (
        um.select("user_id", F.expr("m + INTERVAL 1 MONTH").alias("m"))
        .join(
            nxt.withColumnRenamed("nm", "m"),
            ["user_id", "m"],
            "left_anti",
        )
        .crossJoin(F.broadcast(max_m))
        .filter(F.col("m") <= F.col("mx"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("churned"))
    )
    agg = cur.groupBy(F.col("m").alias("month")).agg(
        F.count(F.lit(1)).cast("bigint").alias("mau"),
        F.sum(F.when(F.col("m") == F.col("m0"), 1).otherwise(0))
        .cast("bigint")
        .alias("new_users"),
        F.sum(
            F.when(
                (F.col("m") != F.col("m0")) & (F.col("was_active") == 1),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("retained"),
        F.sum(
            F.when(
                (F.col("m") != F.col("m0")) & (F.col("was_active") == 0),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("resurrected"),
    )
    return agg.join(
        churn.withColumnRenamed("m", "month"), "month", "left"
    ).select(
        "month",
        "mau",
        "new_users",
        "retained",
        "resurrected",
        F.coalesce("churned", F.lit(0)).cast("bigint").alias("churned"),
    )


_A2_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _a2_cells() -> list[tuple[int, int]]:
    return [(p, r) for p in (0, 1) for r in range(5)]


def _a2_pivot_sql() -> str:
    cols = []
    for p, r in _a2_cells():
        cols.append(
            f"CAST(MAX(CASE WHEN par = {p} AND pr = '{_A2_PRIOS[r]}'"
            f" THEN n END) AS BIGINT) AS n{p}{r}"
        )
        cols.append(
            f"CAST(MAX(CASE WHEN par = {p} AND pr = '{_A2_PRIOS[r]}'"
            f" THEN s END) AS BIGINT) AS s{p}{r}"
        )
    return ", ".join(cols)


def _a2_exprs() -> dict[str, str]:
    """Fixed-order SS expressions over the 10 named pivot cells —
    identical text in both engines (the Mantel-Haenszel recipe,
    two-way)."""
    cells = _a2_cells()
    n_tot = " + ".join(f"n{p}{r}" for p, r in cells)
    s_tot = " + ".join(f"s{p}{r}" for p, r in cells)
    gm = f"(CAST(({s_tot}) AS DOUBLE) / ({n_tot}))"
    terms_cells = " + ".join(
        f"(CAST(s{p}{r} AS DOUBLE) / n{p}{r} - {gm})"
        f" * (CAST(s{p}{r} AS DOUBLE) / n{p}{r} - {gm}) * n{p}{r}"
        for p, r in cells
    )
    ss_a_terms = []
    for p in (0, 1):
        np_ = " + ".join(f"n{p}{r}" for r in range(5))
        sp_ = " + ".join(f"s{p}{r}" for r in range(5))
        m = f"(CAST(({sp_}) AS DOUBLE) / ({np_}))"
        ss_a_terms.append(f"({m} - {gm}) * ({m} - {gm}) * ({np_})")
    ss_b_terms = []
    for r in range(5):
        nr_ = " + ".join(f"n{p}{r}" for p in (0, 1))
        sr_ = " + ".join(f"s{p}{r}" for p in (0, 1))
        m = f"(CAST(({sr_}) AS DOUBLE) / ({nr_}))"
        ss_b_terms.append(f"({m} - {gm}) * ({m} - {gm}) * ({nr_})")
    return {
        "n_total": n_tot,
        "ss_cells": terms_cells,
        "ss_a": " + ".join(ss_a_terms),
        "ss_b": " + ".join(ss_b_terms),
        "ss_total": f"ssq - CAST(({s_tot}) AS DOUBLE) * ({s_tot})"
        f" / ({n_tot})",
    }


def _duck_md5_32(arg: str) -> str:
    """First 32 bits of md5(arg) as BIGINT — identical to Spark's
    conv(substring(md5(x), 1, 8), 16, 10) (nibble-sum form)."""
    return "(" + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({arg}), {k}, 1)) - 1)"
        f" * {16 ** (8 - k)}"
        for k in range(1, 9)
    ) + ")"


_ISO_BINS = 20


def _iso_violation(p: str) -> str:
    """PAVA violation predicate on the DuckDB state row alias ``p``:
    the last two stack blocks violate monotonicity, compared by
    CROSS-MULTIPLICATION so the test is exact-integer (no division
    anywhere in the merge loop)."""
    return (
        f"(len({p}.sums) >= 2 AND "
        f"{p}.sums[len({p}.sums)-1] * {p}.ns[len({p}.ns)] > "
        f"{p}.sums[len({p}.sums)] * {p}.ns[len({p}.ns)-1])"
    )


_IPF_PAIRS = 4  # row+column scaling pairs to unroll
_IPF_CUTOFF = "1996-01-01"  # sample = first calendar year of orders


def _raking_oracle() -> str:
    head = f"""
WITH oc AS MATERIALIZED (
  SELECT o.o_orderpriority AS p, r.r_name AS rg, o.o_orderdate AS d
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
), grid AS MATERIALIZED (
  SELECT pp.p, rr.rg
  FROM (SELECT DISTINCT p FROM oc) pp, (SELECT DISTINCT rg FROM oc) rr
), w0 AS MATERIALIZED (
  SELECT g.p, g.rg,
         CAST(COALESCE(s.cnt, 0) * 1000000 AS BIGINT) AS w
  FROM grid g LEFT JOIN (
    SELECT p, rg, COUNT(*) AS cnt FROM oc
    WHERE d < TIMESTAMP '{_IPF_CUTOFF} 00:00:00' GROUP BY p, rg
  ) s ON s.p = g.p AND s.rg = g.rg
), tp AS MATERIALIZED (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS t FROM oc GROUP BY p
), tr AS MATERIALIZED (
  SELECT rg, CAST(COUNT(*) AS BIGINT) AS t FROM oc GROUP BY rg
)"""
    parts = [head]
    prev = "w0"
    for k in range(1, _IPF_PAIRS + 1):
        parts.append(f"""
, wr{k} AS MATERIALIZED (
  SELECT w.p, w.rg,
         CASE WHEN rs.rs = 0 THEN w.w
              ELSE (w.w * ((tp.t * 1000000000000) // rs.rs)) // 1000000
         END AS w
  FROM {prev} w
  JOIN (SELECT p, CAST(SUM(w) AS BIGINT) AS rs FROM {prev} GROUP BY p)
    rs ON rs.p = w.p
  JOIN tp ON tp.p = w.p
), wc{k} AS MATERIALIZED (
  SELECT w.p, w.rg,
         CASE WHEN cs.cs = 0 THEN w.w
              ELSE (w.w * ((tr.t * 1000000000000) // cs.cs)) // 1000000
         END AS w
  FROM wr{k} w
  JOIN (SELECT rg, CAST(SUM(w) AS BIGINT) AS cs FROM wr{k} GROUP BY rg)
    cs ON cs.rg = w.rg
  JOIN tr ON tr.rg = w.rg
)""")
        prev = f"wc{k}"
    parts.append(f"""
SELECT p AS priority, rg AS region, w AS weight_micro
FROM {prev}
""")
    return "".join(parts)


# Portable Knuth multiplicative hash on a bigint key (the
# sample_hash_split discipline), emitting a 0..99 pseudo-bucket.
def _kbucket(key: str) -> str:
    return f"((({key}) % 2147483648) * 2654435761 % 4294967296) % 100"


_JT_GROUPS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _jt_prefix_cte(t: int) -> str:
    g = _JT_GROUPS[t]
    return f"""p{t} AS (
  SELECT g, ROW_NUMBER() OVER (ORDER BY sc, k) AS rp,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY sc, k) AS i
  FROM s WHERE g <= '{g}'
), c{t} AS (
  SELECT CAST(SUM(rp - i) AS BIGINT) AS c FROM p{t} WHERE g = '{g}'
)"""


RDD_CUTOFF_C = 15_000_000  # $150k in cents
RDD_BANDWIDTH = 5_000_000  # +-$50k


def _rdd_side_sql(name: str, lo: str, hi: str) -> str:
    return f"""{name} AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(u) AS BIGINT) AS su,
         CAST(CAST(SUM(CAST(u AS HUGEINT) * u) AS VARCHAR) AS DOUBLE) AS su2,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(u * y) AS BIGINT) AS suy
  FROM base WHERE u >= {lo} AND u < {hi}
)"""
