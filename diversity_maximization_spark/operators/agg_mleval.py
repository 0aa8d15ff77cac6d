"""ML evaluation, calibration, agreement and regression diagnostics (SURVEY.md §2.2-D).

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


from .agg_shared import (
    _ISO_BINS,
    _iso_violation,
    cents,
    roc_auc_over,
)


_OLS_FINAL = """
SELECT grp, n_rows,
       (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
          + s2 * (s1y * s12 - s11 * s2y)) / det AS b0,
       (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s2y - s1y * s2)) / det AS b_qty,
       (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
          + sy * (s1 * s12 - s11 * s2)) / det AS b_disc,
       1 - (syy
            - ((sy * (s11 * s22 - s12 * s12)
                - s1 * (s1y * s22 - s12 * s2y)
                + s2 * (s1y * s12 - s11 * s2y)) / det) * sy
            - ((n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
                + s2 * (s1 * s2y - s1y * s2)) / det) * s1y
            - ((n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
                + sy * (s1 * s12 - s11 * s2)) / det) * s2y)
         / (syy - sy * sy / n) AS r2
""".strip()

_OLS_DET = """
  SELECT grp, n, n AS n_rows, s1, s2, sy, s11, s22, s12, s1y, s2y, syy,
         n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s12 - s11 * s2) AS det
""".strip()


@query(
    "agg_ols_multi",
    oracle=f"""
WITH m AS (
  SELECT l_returnflag AS grp,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
         CAST(SUM({cents('l_discount')}) AS DOUBLE) AS s2,
         CAST(SUM({cents('l_extendedprice')}) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS DOUBLE) AS s11,
         CAST(SUM({cents('l_discount')} * {cents('l_discount')}) AS DOUBLE)
           AS s22,
         CAST(SUM(CAST(l_quantity AS BIGINT) * {cents('l_discount')})
              AS DOUBLE) AS s12,
         CAST(SUM(CAST(l_quantity AS BIGINT) * {cents('l_extendedprice')})
              AS DOUBLE) AS s1y,
         CAST(SUM({cents('l_discount')} * {cents('l_extendedprice')})
              AS DOUBLE) AS s2y,
         CAST(CAST(SUM(CAST({cents('l_extendedprice')} AS HUGEINT)
                  * {cents('l_extendedprice')}) AS VARCHAR) AS DOUBLE)
           AS syy
  FROM lineitem GROUP BY l_returnflag
), d AS (
{_OLS_DET}
  FROM m
)
{_OLS_FINAL}
FROM d
""",
)
def agg_ols_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form TWO-FEATURE OLS per return flag: extended price
    (cents) regressed on quantity and discount via the 3x3 normal
    equations solved by Cramer's rule — the multivariate companion
    to agg_regr_trend. Nine moment sums accumulate EXACTLY (int64
    where products fit, DECIMAL(38)/HUGEINT for the y^2 sum that
    overflows at sf0.1), convert to double once, and the
    coefficient/R^2 expressions are a SHARED SQL fragment evaluated
    identically by both engines — bit-exact, no rounding. One
    partial+final aggregate over the scan; the fit itself is O(1)
    per group. This is how distributed linear models on bounded
    feature counts actually train: moments in one pass, solve on
    the driver-side expression."""
    li = load(spark, sf_dir, "lineitem")
    q = "CAST(l_quantity AS BIGINT)"
    cd, cy = cents("l_discount"), cents("l_extendedprice")
    dec = "DECIMAL(38,0)"
    m = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
        F.expr(f"CAST(SUM({q}) AS DOUBLE)").alias("s1"),
        F.expr(f"CAST(SUM({cd}) AS DOUBLE)").alias("s2"),
        F.expr(f"CAST(SUM({cy}) AS DOUBLE)").alias("sy"),
        F.expr(f"CAST(SUM({q} * {q}) AS DOUBLE)").alias("s11"),
        F.expr(f"CAST(SUM({cd} * {cd}) AS DOUBLE)").alias("s22"),
        F.expr(f"CAST(SUM({q} * {cd}) AS DOUBLE)").alias("s12"),
        F.expr(f"CAST(SUM({q} * {cy}) AS DOUBLE)").alias("s1y"),
        F.expr(f"CAST(SUM({cd} * {cy}) AS DOUBLE)").alias("s2y"),
        F.expr(
            f"CAST(SUM(CAST({cy} AS {dec}) * {cy}) AS DOUBLE)"
        ).alias("syy"),
    )
    m.createOrReplaceTempView("ols_m")
    spark.sql(f"{_OLS_DET}\nFROM ols_m").createOrReplaceTempView("ols_d")
    return spark.sql(f"{_OLS_FINAL}\nFROM ols_d")


@query(
    "agg_roc_auc",
    oracle="""
WITH g AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS s,
         COUNT(*) AS cnt,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
  FROM events GROUP BY 1
), r AS (
  SELECT s, cnt, pos,
         COALESCE(SUM(cnt) OVER (
           ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_less
  FROM g
), a AS (
  SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(cnt - pos) AS BIGINT) AS n_neg,
         CAST(SUM(pos * (2 * cum_less + cnt + 1)) AS BIGINT) AS rank2
  FROM r
)
SELECT n_pos, n_neg,
       CAST(rank2 - n_pos * (n_pos + 1) AS DOUBLE)
         / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc
FROM a
""",
)
def agg_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected ROC AUC of a score (event value) against a
    binary label (event_type = 'purchase') — the model-eval primitive
    a curation pipeline runs on every learned quality scorer. Uses
    the rank-sum identity AUC = (R+ - n+(n+ + 1)/2) / (n+ n-), with
    tied scores carrying their AVERAGE rank. Everything stays integer
    until the single final division: per distinct cents score we keep
    (cnt, pos); twice-the-average-rank of that score is the integer
    2*cum_less + cnt + 1, so R2 = SUM(pos * that) is an exact BIGINT
    and AUC = (R2 - n+(n+ +1)) / (2 n+ n-) is ONE double division —
    bit-identical across engines with no rounding. Scale shape: the
    grouped score table is bounded by the distinct 2-dp value domain
    (<= ~49k rows for events.value in [0.01, 490]), so the
    unpartitioned prefix window runs over a provably small table; the
    only data-sized pass is the first groupBy. BIGINT headroom: R2
    <= 2n^2, exact up to n ~ 2e9 rows per AUC computation."""
    ev = load(spark, sf_dir, "events")
    scored = ev.select(
        F.expr(cents("value")).alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "pos"
        ),
    )
    return roc_auc_over(scored, "s", "pos")


@query(
    "agg_calibration_bins",
    oracle="""
WITH s AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS sc,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
  FROM orders
), b AS (
  SELECT sc, pos,
         NTILE(10) OVER (ORDER BY sc, o_orderkey) AS bin
  FROM s
)
SELECT bin, COUNT(*) AS n_rows,
       CAST(CAST(SUM(sc) AS BIGINT) AS DOUBLE) / 100 / COUNT(*)
         AS mean_score,
       CAST(CAST(SUM(pos) AS BIGINT) AS DOUBLE) / COUNT(*) AS pos_rate
FROM b GROUP BY bin
""",
)
def agg_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile calibration table: order all orders by score (exact
    total-price cents, o_orderkey tie-break), split into 10 equal-
    frequency bins, and report mean score vs positive rate (label =
    finished status) per bin — the reliability-diagram input for any
    learned scorer. The global NTILE uses the two-phase
    plans/global_rank.py machinery (range-bucket + per-bucket offsets
    + partitioned mapInPandas numbering), so no single-task Sort or
    SinglePartition window touches the full table; the exact
    NTILE(10) arithmetic on the global row number matches DuckDB's
    NTILE convention (first n%10 tiles one row bigger). Divisions are
    double/bigint in the same order both engines."""
    from ..plans.global_rank import ntile_expr, with_global_row_number

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(cents("o_totalprice")).alias("sc"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
    )
    numbered, n_total = with_global_row_number(o, ["sc", "o_orderkey"])
    binned = numbered.withColumn(
        "bin", ntile_expr("_rn", n_total, 10)
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.sum("sc").cast("bigint").cast("double")
            / 100
            / F.count(F.lit(1))
        ).alias("mean_score"),
        (
            F.sum("pos").cast("bigint").cast("double") / F.count(F.lit(1))
        ).alias("pos_rate"),
    )


@query(
    "agg_classifier_eval",
    oracle="""
WITH s AS (
  SELECT CASE WHEN CAST(round(value * 100) AS BIGINT) >= 24500
              THEN 1 ELSE 0 END AS pred,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events
), m AS (
  SELECT CAST(SUM(pred * label) AS BIGINT) AS tp,
         CAST(SUM(pred * (1 - label)) AS BIGINT) AS fp,
         CAST(SUM((1 - pred) * label) AS BIGINT) AS fn,
         CAST(SUM((1 - pred) * (1 - label)) AS BIGINT) AS tn
  FROM s
)
SELECT tp, fp, fn, tn,
       CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision_,
       CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall_,
       CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) AS f1,
       CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE)
         AS accuracy
FROM m
""",
)
def agg_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded binary-classifier evaluation (pred = score >=
    245.00, label = purchase): confusion matrix plus precision /
    recall / F1 / accuracy, each expressed as ONE division of exact
    BIGINT counts (F1 via 2tp/(2tp+fp+fn), not the P*R composition,
    so no intermediate float). The whole operator is one partial+
    final aggregate over the fact scan — the cheapest possible
    distributed shape. Companion to agg_roc_auc (threshold-free) and
    agg_calibration_bins (reliability)."""
    ev = load(spark, sf_dir, "events")
    s = ev.select(
        F.when(
            F.expr(cents("value")) >= 24500, 1
        ).otherwise(0).alias("pred"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("label"),
    )
    m = s.agg(
        F.sum(F.col("pred") * F.col("label")).cast("bigint").alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("label")))
        .cast("bigint")
        .alias("fp"),
        F.sum((1 - F.col("pred")) * F.col("label"))
        .cast("bigint")
        .alias("fn"),
        F.sum((1 - F.col("pred")) * (1 - F.col("label")))
        .cast("bigint")
        .alias("tn"),
    )
    return m.select(
        "tp",
        "fp",
        "fn",
        "tn",
        (
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fp")).cast("double")
        ).alias("precision_"),
        (
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fn")).cast("double")
        ).alias("recall_"),
        (
            (2 * F.col("tp")).cast("double")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double")
        ).alias("f1"),
        (
            (F.col("tp") + F.col("tn")).cast("double")
            / (
                F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")
            ).cast("double")
        ).alias("accuracy"),
    )


@query(
    "agg_cohens_kappa",
    oracle="""
WITH s AS (
  SELECT CASE WHEN CAST(round(value * 100) AS BIGINT) >= 24500
              THEN 1 ELSE 0 END AS rater_a,
         CASE WHEN event_type IN ('purchase', 'click')
              THEN 1 ELSE 0 END AS rater_b
  FROM events
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN rater_a = rater_b THEN 1 ELSE 0 END)
              AS BIGINT) AS agree,
         CAST(SUM(rater_a) AS BIGINT) AS a1,
         CAST(SUM(rater_b) AS BIGINT) AS b1
  FROM s
)
SELECT n, agree, a1, b1,
       CAST(agree AS DOUBLE) / n AS po,
       (CAST(a1 AS DOUBLE) * b1 + CAST(n - a1 AS DOUBLE) * (n - b1))
         / (CAST(n AS DOUBLE) * n) AS pe,
       (CAST(agree AS DOUBLE) / n
          - (CAST(a1 AS DOUBLE) * b1 + CAST(n - a1 AS DOUBLE) * (n - b1))
            / (CAST(n AS DOUBLE) * n))
         / (1 - (CAST(a1 AS DOUBLE) * b1 + CAST(n - a1 AS DOUBLE) * (n - b1))
               / (CAST(n AS DOUBLE) * n)) AS kappa
FROM m
""",
)
def agg_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa agreement between two binary labelers (a value
    threshold vs an event-type rule) — the chance-corrected metric
    for judging weak labelers / LLM-judge agreement before trusting
    either for training-data filtering. Marginals and agreement are
    exact bigints; po, pe, and kappa are float expressions of those
    integers in identical order (products stay in double's exact
    range far beyond any row count here). One partial+final
    aggregate."""
    ev = load(spark, sf_dir, "events")
    s = ev.select(
        F.when(F.expr(cents("value")) >= 24500, 1).otherwise(0).alias(
            "rater_a"
        ),
        F.when(
            F.col("event_type").isin("purchase", "click"), 1
        ).otherwise(0).alias("rater_b"),
    )
    m = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(F.col("rater_a") == F.col("rater_b"), 1).otherwise(0)
        ).cast("bigint").alias("agree"),
        F.sum("rater_a").cast("bigint").alias("a1"),
        F.sum("rater_b").cast("bigint").alias("b1"),
    )
    nd = F.col("n").cast("double")
    po = F.col("agree").cast("double") / F.col("n")
    pe = (
        F.col("a1").cast("double") * F.col("b1")
        + (F.col("n") - F.col("a1")).cast("double") * (F.col("n") - F.col("b1"))
    ) / (nd * F.col("n"))
    return m.select(
        "n",
        "agree",
        "a1",
        "b1",
        po.alias("po"),
        pe.alias("pe"),
        ((po - pe) / (1 - pe)).alias("kappa"),
    )


@query(
    "agg_cramers_v",
    bounded_cross="1-row grand-total scalar onto the bounded cell table",
    oracle="""
WITH cells AS (
  SELECT event_type AS r,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS c,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
), margins AS (
  SELECT r, CAST(SUM(o) AS BIGINT) AS row_n FROM cells GROUP BY r
), cols AS (
  SELECT c, CAST(SUM(o) AS BIGINT) AS col_n FROM cells GROUP BY c
), tot AS (
  SELECT CAST(SUM(o) AS BIGINT) AS n,
         (SELECT COUNT(*) FROM margins) AS n_rows,
         (SELECT COUNT(*) FROM cols) AS n_cols
  FROM cells
), chi AS (
  SELECT list_sum(list(
           (o - CAST(m.row_n AS DOUBLE) * k.col_n / t.n)
           * (o - CAST(m.row_n AS DOUBLE) * k.col_n / t.n)
           / (CAST(m.row_n AS DOUBLE) * k.col_n / t.n)
           ORDER BY cells.r, cells.c)) AS chi2
  FROM cells
  JOIN margins m ON cells.r = m.r
  JOIN cols k ON cells.c = k.c
  CROSS JOIN tot t
)
SELECT t.n, t.n_rows, t.n_cols, chi.chi2,
       sqrt(chi.chi2 / (t.n * least(t.n_rows - 1, t.n_cols - 1)))
         AS cramers_v
FROM chi, tot t
""",
)
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V effect size for the event-type x arm contingency
    table — the normalized [0,1] association strength a raw
    chi-square can't give (agg_chi2_cells reports the cells; this is
    the scalar verdict). Cell counts and margins are exact bigints;
    the chi-square contributions fold over the BOUNDED cell table in
    (row, col) order (strict left fold both engines), and V is one
    sqrt of exact-ordered arithmetic. Three small aggregates after
    one data-sized pass."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("r"),
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("c"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    margins = cells.groupBy("r").agg(
        F.sum("o").cast("bigint").alias("row_n")
    )
    cols = cells.groupBy("c").agg(F.sum("o").cast("bigint").alias("col_n"))
    n_rows = margins.count()
    n_cols = cols.count()
    tot = cells.agg(F.sum("o").cast("bigint").alias("n"))
    joined = (
        cells.join(F.broadcast(margins), "r")
        .join(F.broadcast(cols), "c")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("row_n").cast("double") * F.col("col_n") / F.col("n")
    contrib = (F.col("o") - e) * (F.col("o") - e) / e
    chi = joined.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("r", "c", contrib.alias("x")))
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["x"],
        ).alias("chi2"),
        F.first(F.col("n")).alias("n"),
    )
    return chi.select(
        "n",
        F.lit(n_rows).cast("bigint").alias("n_rows"),
        F.lit(n_cols).cast("bigint").alias("n_cols"),
        "chi2",
        F.sqrt(
            F.col("chi2")
            / (F.col("n") * F.least(F.lit(n_rows - 1), F.lit(n_cols - 1)))
        ).alias("cramers_v"),
    )


@query(
    "agg_icc",
    oracle=f"""
WITH g AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM({cents('value')}) AS BIGINT) AS s,
         CAST(SUM({cents('value')} * {cents('value')}) AS BIGINT) AS ss
  FROM events GROUP BY user_id
), q AS (
  SELECT n, s, ss,
         CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS BIGINT)
           AS sq_over_n
  FROM g
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(SUM(s) AS BIGINT) AS s_total,
         CAST(SUM(ss) AS BIGINT) AS sum_ss,
         CAST(SUM(sq_over_n) AS BIGINT) AS sum_q,
         CAST(SUM(n * n) AS BIGINT) AS sum_n_sq
  FROM q
), m AS (
  SELECT k, n_total,
         (CAST(sum_q AS DOUBLE)
            - CAST(s_total AS DOUBLE) * CAST(s_total AS DOUBLE) / n_total)
           / (k - 1) AS msb,
         (CAST(sum_ss AS DOUBLE) - CAST(sum_q AS DOUBLE))
           / (n_total - k) AS msw,
         (n_total - CAST(sum_n_sq AS DOUBLE) / n_total)
           / (k - 1) AS n0
  FROM tot
)
SELECT k, n_total,
       msb / 10000 AS ms_between,
       msw / 10000 AS ms_within,
       (msb - msw) / (msb + (n0 - 1) * msw) AS icc1
FROM m
""",
)
def agg_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICC(1), the one-way random-effects intraclass correlation:
    what fraction of event-value variance is BETWEEN users rather
    than within them — the clustering-strength number that decides
    whether per-user random effects (or cluster-robust errors) are
    needed. Unlike agg_anova_oneway's bounded-k sorted fold, the
    group count here (users) is UNBOUNDED, so the between-groups
    sum uses the integer-quantization discipline instead: each
    group's s^2/n term is computed with the identical two IEEE ops
    in both engines (deterministic), quantized once to an integer
    cents^2 unit, and summed as exact bigints — distributed
    accumulation order can't perturb the total (the
    select_facility_location recipe applied to an aggregate).
    Unbalanced design handled via n0 = (N - sum n_j^2 / N)/(k-1).
    One partial+final aggregate over the data; everything after is
    driver-scalar arithmetic on six exact integers."""
    ev = load(spark, sf_dir, "events")
    c = F.expr(cents("value"))
    g = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(c).cast("bigint").alias("s"),
        F.sum(F.expr(f"{cents('value')} * {cents('value')}"))
        .cast("bigint")
        .alias("ss"),
    )
    q = g.select(
        "n",
        "s",
        "ss",
        F.round(
            F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
        )
        .cast("bigint")
        .alias("sq_over_n"),
    )
    tot = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.sum("s").cast("bigint").alias("s_total"),
        F.sum("ss").cast("bigint").alias("sum_ss"),
        F.sum("sq_over_n").cast("bigint").alias("sum_q"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sum_n_sq"),
    )
    m = tot.select(
        "k",
        "n_total",
        (
            (
                F.col("sum_q").cast("double")
                - F.col("s_total").cast("double")
                * F.col("s_total").cast("double")
                / F.col("n_total")
            )
            / (F.col("k") - 1)
        ).alias("msb"),
        (
            (F.col("sum_ss").cast("double") - F.col("sum_q").cast("double"))
            / (F.col("n_total") - F.col("k"))
        ).alias("msw"),
        (
            (
                F.col("n_total")
                - F.col("sum_n_sq").cast("double") / F.col("n_total")
            )
            / (F.col("k") - 1)
        ).alias("n0"),
    )
    return m.select(
        "k",
        "n_total",
        (F.col("msb") / 10000).alias("ms_between"),
        (F.col("msw") / 10000).alias("ms_within"),
        (
            (F.col("msb") - F.col("msw"))
            / (F.col("msb") + (F.col("n0") - 1) * F.col("msw"))
        ).alias("icc1"),
    )


@query(
    "agg_decile_lift",
    bounded_cross="1-row broadcast scalar (decile totals)",
    oracle="""
WITH s AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS sc,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
  FROM orders
), b AS (
  SELECT sc, pos, NTILE(10) OVER (ORDER BY -sc, o_orderkey) AS decile
  FROM s
), per AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS p
  FROM b GROUP BY decile
), cum AS (
  SELECT decile, n, p,
         CAST(SUM(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
         CAST(SUM(p) OVER (ORDER BY decile) AS BIGINT) AS cum_p,
         (SELECT CAST(SUM(n) AS BIGINT) FROM per) AS n_g,
         (SELECT CAST(SUM(p) AS BIGINT) FROM per) AS p_g
  FROM per
)
SELECT decile, n, p,
       cum_n, cum_p,
       CAST(cum_p * n_g AS DOUBLE) / (cum_n * p_g) AS cum_lift
FROM cum
""",
)
def agg_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains/lift chart: rank orders by score (total
    price, DESCENDING via the negated-cents trick), cut into 10
    equal-frequency deciles with the plans/global_rank.py
    distributed NTILE, and report each prefix's conversion lift
    over the base rate — 'the top 30% of scores capture 1.8x their
    share of conversions', the model-targeting readout every
    campaign sizing meeting wants. The cumulative sums ride the
    10-row decile table; lift = (cum_p * N) / (cum_n * P) keeps the
    numerator and denominator exact bigints so the ONLY float is
    one division per decile row."""
    from ..plans.global_rank import ntile_expr, with_global_row_number

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        (-F.expr(cents("o_totalprice"))).alias("neg_sc"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
    )
    numbered, n_total = with_global_row_number(o, ["neg_sc", "o_orderkey"])
    per = (
        numbered.withColumn("decile", ntile_expr("_rn", n_total, 10))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("p"),
        )
    )
    g = per.agg(
        F.sum("n").cast("bigint").alias("n_g"),
        F.sum("p").cast("bigint").alias("p_g"),
    )
    # bounded: 10 decile rows
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.crossJoin(F.broadcast(g))
        .select(
            "decile",
            "n",
            "p",
            F.sum("n").over(w).cast("bigint").alias("cum_n"),
            F.sum("p").over(w).cast("bigint").alias("cum_p"),
            "n_g",
            "p_g",
        )
        .select(
            "decile",
            "n",
            "p",
            "cum_n",
            "cum_p",
            (
                (F.col("cum_p") * F.col("n_g")).cast("double")
                / (F.col("cum_n") * F.col("p_g"))
            ).alias("cum_lift"),
        )
    )


@query(
    "agg_gini_impurity",
    bounded_cross="1-row parent-impurity scalar onto the 1-row hour fold",
    oracle="""
WITH cls AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nc FROM events GROUP BY 1
), parent AS (
  SELECT CAST(SUM(nc) AS BIGINT) AS n,
         CAST(SUM(nc * nc) AS BIGINT) AS ssc
  FROM cls
), hc AS (
  SELECT CAST(hour(ts) AS BIGINT) AS h, event_type,
         CAST(COUNT(*) AS BIGINT) AS nhc
  FROM events GROUP BY 1, 2
), hstat AS (
  SELECT h, CAST(SUM(nhc) AS BIGINT) AS nh,
         CAST(SUM(nhc * nhc) AS BIGINT) AS ssh
  FROM hc GROUP BY h
), child AS (
  SELECT list_sum(list(
           (CAST(nh AS DOUBLE) * CAST(nh AS DOUBLE) - CAST(ssh AS DOUBLE))
           / (CAST(nh AS DOUBLE) * (SELECT n FROM parent))
           ORDER BY h)) AS wchild,
         CAST(COUNT(*) AS BIGINT) AS n_splits
  FROM hstat
)
SELECT p.n,
       (CAST(p.n AS DOUBLE) * CAST(p.n AS DOUBLE) - CAST(p.ssc AS DOUBLE))
         / (CAST(p.n AS DOUBLE) * CAST(p.n AS DOUBLE)) AS parent_gini,
       c.wchild AS weighted_child_gini,
       (CAST(p.n AS DOUBLE) * CAST(p.n AS DOUBLE) - CAST(p.ssc AS DOUBLE))
         / (CAST(p.n AS DOUBLE) * CAST(p.n AS DOUBLE)) - c.wchild AS gain,
       c.n_splits
FROM parent p, child c
""",
)
def agg_gini_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini impurity gain of splitting event_type by hour-of-day —
    the decision-tree split criterion as a distributed aggregate
    (the feature-screening primitive for categorical targets).
    Parent impurity 1 - sum(p_c^2) and each hour-bucket's child
    impurity come from exact BIGINT squared counts; the weighted
    child sum folds the 24-row hour table in hour order (sorted
    fold == list_sum ORDER BY) with each term evaluated from exact
    integers by identical expression text — bit-exact, no rounding.
    Two data-sized aggs; everything after runs on <= 24 rows."""
    ev = load(spark, sf_dir, "events")
    cls = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("nc")
    )
    parent = cls.agg(
        F.sum("nc").cast("bigint").alias("n"),
        F.sum(F.col("nc") * F.col("nc")).cast("bigint").alias("ssc"),
    )
    hc = ev.groupBy(
        F.hour("ts").cast("bigint").alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("nhc"))
    hstat = hc.groupBy("h").agg(
        F.sum("nhc").cast("bigint").alias("nh"),
        F.sum(F.col("nhc") * F.col("nhc")).cast("bigint").alias("ssh"),
    )
    n_total = parent.collect()[0]
    n, ssc = n_total["n"], n_total["ssc"]
    terms = hstat.select(
        "h",
        (
            (
                F.col("nh").cast("double") * F.col("nh").cast("double")
                - F.col("ssh").cast("double")
            )
            / (F.col("nh").cast("double") * F.lit(n))
        ).alias("term"),
    )
    child = terms.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("h", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("wchild"),
        F.count(F.lit(1)).cast("bigint").alias("n_splits"),
    )
    nd = F.lit(float(n))
    parent_gini = (nd * nd - F.lit(float(ssc))) / (nd * nd)
    return child.select(
        F.lit(n).cast("bigint").alias("n"),
        parent_gini.alias("parent_gini"),
        F.col("wchild").alias("weighted_child_gini"),
        (parent_gini - F.col("wchild")).alias("gain"),
        "n_splits",
    )


@query(
    "agg_conformal_interval",
    oracle="""
WITH base AS (
  SELECT event_id, event_type,
         CAST(ROUND((value) * 100) AS BIGINT) AS c
  FROM events WHERE event_type IN ('purchase', 'click', 'view')
), train AS (
  SELECT event_type,
         CAST(SUM(c) AS DOUBLE) / COUNT(*) AS pred,
         CAST(COUNT(*) AS BIGINT) AS n_train
  FROM base WHERE event_id % 2 = 0 GROUP BY event_type
), calib AS (
  SELECT b.event_type, b.event_id,
         abs(CAST(b.c AS DOUBLE) - t.pred) AS r
  FROM base b JOIN train t USING (event_type)
  WHERE b.event_id % 2 = 1
), ranked AS (
  SELECT event_type, r,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY r, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_cal
  FROM calib
), q AS (
  SELECT event_type, MAX(n_cal) AS n_calib,
         MAX(CASE WHEN rn = (9 * (n_cal + 1) + 9) // 10 THEN r END) AS q90
  FROM ranked GROUP BY event_type
)
SELECT t.event_type, t.n_train, CAST(q.n_calib AS BIGINT) AS n_calib,
       t.pred / 100 AS prediction,
       q.q90 / 100 AS q90,
       CAST((SELECT COUNT(*) FROM calib c
             WHERE c.event_type = t.event_type AND c.r <= q.q90) AS DOUBLE)
         / q.n_calib AS coverage
FROM train t JOIN q USING (event_type)
""",
)
def agg_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals per event type: train on
    even event_ids (the point predictor is the training mean),
    calibrate on odd ids, and take the ceil(0.9 * (n+1))-th smallest
    absolute residual as the finite-sample-valid 90% interval
    half-width — the distribution-free uncertainty quantification
    every ML scoring pipeline should ship next to its predictions.
    Exactness: the training mean is exact-cents-sum / count; each
    residual is one float expression from exact integers; the
    conformal quantile is an exact RANK PICK (k = (9(n+1)+9)//10 in
    pure integers — never ceil(0.9 * x), whose IEEE 0.9 rounds the
    boundary wrong) with (r, event_id) tie-break; coverage is an
    exact count over one division. No folds, no rounding."""
    ev = load(spark, sf_dir, "events")
    base = ev.filter(
        F.col("event_type").isin("purchase", "click", "view")
    ).select("event_id", "event_type", F.expr(cents("value")).alias("c"))
    train = (
        base.filter(F.col("event_id") % 2 == 0)
        .groupBy("event_type")
        .agg(
            (F.sum("c").cast("double") / F.count(F.lit(1))).alias("pred"),
            F.count(F.lit(1)).cast("bigint").alias("n_train"),
        )
    )
    calib = (
        base.filter(F.col("event_id") % 2 == 1)
        .join(F.broadcast(train.select("event_type", "pred")), "event_type")
        .select(
            "event_type",
            "event_id",
            F.abs(F.col("c").cast("double") - F.col("pred")).alias("r"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy("r", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = calib.select(
        "event_type",
        "r",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_cal"),
    )
    q = ranked.groupBy("event_type").agg(
        F.max("n_cal").alias("n_calib"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(9 * (n_cal + 1) + 9) div 10"),
                F.col("r"),
            )
        ).alias("q90"),
    )
    cov = (
        calib.join(F.broadcast(q.select("event_type", "q90")), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("r") <= F.col("q90"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_in")
        )
    )
    return (
        train.join(q, "event_type")
        .join(cov, "event_type")
        .select(
            "event_type",
            "n_train",
            F.col("n_calib").cast("bigint").alias("n_calib"),
            (F.col("pred") / 100).alias("prediction"),
            (F.col("q90") / 100).alias("q90"),
            (F.col("n_in").cast("double") / F.col("n_calib")).alias(
                "coverage"
            ),
        )
    )


@query(
    "agg_brier_score",
    bounded_cross="5-row segment probability table folded into one score row",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderpriority AS seg,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), train AS (
  SELECT seg,
         CAST(SUM(y) AS DOUBLE) / COUNT(*) AS p
  FROM base WHERE o_orderkey % 2 = 0 GROUP BY seg
), test AS (
  SELECT b.seg, t.p,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(b.y) AS BIGINT) AS ny
  FROM base b JOIN train t USING (seg)
  WHERE b.o_orderkey % 2 = 1
  GROUP BY b.seg, t.p
), folds AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_test,
         list_sum(list(n * p * p - 2 * p * ny + ny ORDER BY seg)) AS ss,
         list_sum(list(CAST(ny AS DOUBLE) * (n - ny) / n / n * n
                       ORDER BY seg)) AS ref_ss
  FROM test
)
SELECT n_test,
       ss / n_test AS brier,
       ref_ss / n_test AS brier_refitted,
       CAST(1 AS DOUBLE) - (ss / n_test) / (ref_ss / n_test)
         AS skill_vs_refit
FROM folds
""",
)
def agg_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score of a per-segment probability forecast: train-half
    (even order keys) purchase-fulfilment rates predict the test
    half; Brier = mean (p - y)^2 — the proper scoring rule every
    probabilistic classifier gates on — decomposed per segment as
    n*p^2 - 2*p*ny + ny so only exact integer counts and the
    per-segment p enter (y is 0/1, so y^2 = y). A same-data
    refitted-rate reference (ny(n-ny)/n per segment) gives the
    skill score. Both accumulations fold the 5-row segment table in
    segment order — bit-exact, no rounding."""
    o = load(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("seg"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    train = (
        base.filter(F.col("o_orderkey") % 2 == 0)
        .groupBy("seg")
        .agg((F.sum("y").cast("double") / F.count(F.lit(1))).alias("p"))
    )
    test = (
        base.filter(F.col("o_orderkey") % 2 == 1)
        .join(F.broadcast(train), "seg")
        .groupBy("seg", "p")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("ny"),
        )
    )
    terms = test.select(
        "seg",
        "n",
        (
            F.col("n") * F.col("p") * F.col("p")
            - 2 * F.col("p") * F.col("ny")
            + F.col("ny")
        ).alias("t1"),
        (
            F.col("ny").cast("double")
            * (F.col("n") - F.col("ny"))
            / F.col("n")
            / F.col("n")
            * F.col("n")
        ).alias("t2"),
    )
    folds = terms.agg(
        F.sum("n").cast("bigint").alias("n_test"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("seg", F.col("t1").alias("v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("ss"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("seg", F.col("t2").alias("v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("ref_ss"),
    )
    return folds.select(
        "n_test",
        (F.col("ss") / F.col("n_test")).alias("brier"),
        (F.col("ref_ss") / F.col("n_test")).alias("brier_refitted"),
        (
            F.lit(1).cast("double")
            - (F.col("ss") / F.col("n_test"))
            / (F.col("ref_ss") / F.col("n_test"))
        ).alias("skill_vs_refit"),
    )


@query(
    "agg_pareto_front",
    oracle=f"""
SELECT p.p_partkey, {cents('p.p_retailprice')} AS price_cents,
       CAST(p.p_size AS INT) AS p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part o
  WHERE {cents('o.p_retailprice')} <= {cents('p.p_retailprice')}
    AND o.p_size >= p.p_size
    AND ({cents('o.p_retailprice')} < {cents('p.p_retailprice')}
         OR o.p_size > p.p_size)
)
""",
)
def agg_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE operator: the Pareto frontier of parts minimizing
    retail price while maximizing size — every part not DOMINATED by
    another (cheaper-or-equal AND bigger-or-equal, strict somewhere).
    The classic multi-criteria shortlist query (cheapest part at
    every quality level).

    Scale-correct plan that never sorts or self-joins the part table
    globally: p_size is a BOUNDED domain (TPC-H: 1..50), so one
    shuffle builds the 50-row (size -> min price) table, a bounded
    suffix-min window over it yields min price among STRICTLY LARGER
    sizes, and a broadcast join back flags dominance per row —
    dominated iff a same-size part is strictly cheaper OR a larger
    size exists at less-or-equal price. O(n) scan + O(sizes) state;
    the naive NOT EXISTS theta join is the oracle, not the plan.
    All comparisons on exact integer cents — hash-stable."""
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.expr(cents("p_retailprice")).alias("price_cents"),
        F.col("p_size").cast("int").alias("p_size"),
    )
    by_size = p.groupBy("p_size").agg(F.min("price_cents").alias("minp"))
    # bounded: p_size domain is 1..50 (TPC-H), so this window runs
    # over at most 50 rows
    w = Window.orderBy(F.col("p_size").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # the largest size has no larger sizes: empty frame -> NULL, which
    # must mean "not dominated", not a three-valued-logic drop
    sfx = by_size.select(
        "p_size",
        "minp",
        F.coalesce(
            F.min("minp").over(w), F.lit(2**62).cast("bigint")
        ).alias("minp_larger"),
    )
    joined = p.join(F.broadcast(sfx), "p_size")
    dominated = (F.col("minp") < F.col("price_cents")) | (
        F.col("minp_larger") <= F.col("price_cents")
    )
    return joined.filter(~dominated).select(
        "p_partkey", "price_cents", "p_size"
    )


@query(
    "agg_isotonic_calibration",
    oracle=f"""
WITH RECURSIVE bins AS MATERIALIZED (
  SELECT bin,
         CAST(SUM(pos) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
           NTILE({_ISO_BINS}) OVER (
             ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                      o_orderkey) AS bin
    FROM orders)
  GROUP BY bin
), bl AS MATERIALIZED (
  SELECT list(s ORDER BY bin) AS ls, list(n ORDER BY bin) AS ln FROM bins
),
dp AS (
  SELECT 1 AS pos, [l.ls[1]] AS sums, [l.ln[1]] AS ns,
         [CAST(1 AS BIGINT)] AS widths
  FROM bl l
  UNION ALL
  SELECT CASE WHEN {_iso_violation('p')} THEN p.pos
              ELSE p.pos + 1 END AS pos,
         CASE WHEN {_iso_violation('p')}
              THEN list_slice(p.sums, 1, len(p.sums) - 2)
                   || [p.sums[len(p.sums) - 1] + p.sums[len(p.sums)]]
              ELSE p.sums || [l.ls[p.pos + 1]] END AS sums,
         CASE WHEN {_iso_violation('p')}
              THEN list_slice(p.ns, 1, len(p.ns) - 2)
                   || [p.ns[len(p.ns) - 1] + p.ns[len(p.ns)]]
              ELSE p.ns || [l.ln[p.pos + 1]] END AS ns,
         CASE WHEN {_iso_violation('p')}
              THEN list_slice(p.widths, 1, len(p.widths) - 2)
                   || [p.widths[len(p.widths) - 1]
                       + p.widths[len(p.widths)]]
              ELSE p.widths || [CAST(1 AS BIGINT)] END AS widths
  FROM dp p CROSS JOIN bl l
  WHERE {_iso_violation('p')} OR p.pos < {_ISO_BINS}
),
fin AS MATERIALIZED (
  SELECT sums, ns, widths FROM dp p
  WHERE p.pos = {_ISO_BINS} AND NOT {_iso_violation('p')}
)
SELECT CAST(k AS INTEGER) AS block_idx,
       CAST(1 + COALESCE(list_sum(list_slice(widths, 1, k - 1)), 0)
            AS BIGINT) AS bin_from,
       CAST(list_sum(list_slice(widths, 1, k)) AS BIGINT) AS bin_to,
       ns[k] AS n_rows, sums[k] AS pos_sum,
       CAST(sums[k] AS DOUBLE) / ns[k] AS iso_rate
FROM fin, unnest(generate_series(1, len(sums))) t(k)
""",
)
def agg_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration of the score -> positive-rate curve by
    pool-adjacent-violators (PAVA; Barlow et al. 1972 — what sklearn's
    IsotonicRegression fits): the {_ISO_BINS} equal-frequency score
    bins of agg_calibration_bins, pooled left-to-right until the
    positive rate is non-decreasing in score. The monotone fit is the
    step function probability calibrators actually deploy; the raw
    reliability diagram (calibration_bins) can zigzag.

    Exactness: the merge loop compares pooled rates by CROSS-
    MULTIPLICATION (s_a * n_b > s_b * n_a — exact bigints, no
    division until the final per-block rate, which divides identical
    integers). Scale shape: the data-sized work is the global NTILE
    (two-phase range-bucket machinery, no SinglePartition sort) and
    one groupBy to {_ISO_BINS} rows; PAVA itself is a <= 2*{_ISO_BINS}-step
    stack loop on the driver over the bounded bin table. The oracle
    replays the IDENTICAL stack machine as a recursive CTE over
    list-of-bigint state (one append OR one merge per step, <= 39
    steps). Output: one row per pooled block with its bin span,
    exact counts, and the isotonic rate."""
    from ..plans.global_rank import ntile_expr, with_global_row_number

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(cents("o_totalprice")).alias("sc"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
    )
    numbered, n_total = with_global_row_number(o, ["sc", "o_orderkey"])
    binned = numbered.withColumn(
        "bin", ntile_expr("_rn", n_total, _ISO_BINS)
    )
    rows = (
        binned.groupBy("bin")
        .agg(
            F.sum("pos").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .collect()  # bounded: exactly _ISO_BINS rows
    )
    rows.sort(key=lambda r: r["bin"])
    sums = []
    ns = []
    widths = []
    for r in rows:
        sums.append(int(r["s"]))
        ns.append(int(r["n"]))
        widths.append(1)
        while len(sums) >= 2 and sums[-2] * ns[-1] > sums[-1] * ns[-2]:
            sums[-2:] = [sums[-2] + sums[-1]]
            ns[-2:] = [ns[-2] + ns[-1]]
            widths[-2:] = [widths[-2] + widths[-1]]
    out = []
    start = 1
    for k in range(len(sums)):
        out.append(
            (
                k + 1,
                start,
                start + widths[k] - 1,
                ns[k],
                sums[k],
                float(sums[k]) / ns[k],
            )
        )
        start += widths[k]
    return spark.createDataFrame(
        out,
        "block_idx int, bin_from bigint, bin_to bigint, n_rows bigint,"
        " pos_sum bigint, iso_rate double",
    )


@query(
    "agg_average_precision",
    oracle="""
WITH r AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
         ROW_NUMBER() OVER (
           ORDER BY -CAST(round(value * 100) AS BIGINT), event_id
         ) AS k
  FROM events
), p AS (
  SELECT k, ROW_NUMBER() OVER (ORDER BY k) AS j
  FROM r WHERE pos = 1
), a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pos,
         CAST(SUM((j * 1000000000) // k) AS BIGINT) AS ap_nano_sum
  FROM p
)
SELECT n_pos, ap_nano_sum,
       CAST(ap_nano_sum AS DOUBLE) / n_pos / 1000000000
         AS average_precision
FROM a
""",
)
def agg_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (the area under the precision-recall curve,
    step-interpolated — sklearn's average_precision_score with a
    deterministic tie order): rank events by score descending
    (event_id tie-break), AP = mean over positives of
    precision-at-that-positive = (1/n+) * sum_j (j / k_j) where the
    j-th positive sits at global rank k_j. The imbalanced-label
    companion of agg_roc_auc — PR space ignores the true-negative
    mass that inflates ROC on rare-positive corpora.

    Exactness: each per-positive precision is quantized as the
    positive-operand floor division (j * 1e9) // k_j — identical
    div / // semantics — and bigint-summed order-free; ONE double
    division chain at the end on identical integers. Scale shape:
    both global rankings run through the two-phase range-bucket
    machinery (plans/global_rank.py — no SinglePartition sort); the
    positives pass reuses the same order. j <= n+ <= 1.5e5 at sf0.1
    -> terms <= 1.5e14, sums well inside int64 even at 100x."""
    from ..plans.global_rank import with_global_row_number

    ev = load(spark, sf_dir, "events").select(
        (-F.expr(cents("value"))).alias("neg_s"),
        "event_id",
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("pos"),
    )
    numbered, _ = with_global_row_number(
        ev, ["neg_s", "event_id"], out_col="k"
    )
    positives = numbered.filter(F.col("pos") == 1).select("k")
    ranked_pos, n_pos = with_global_row_number(positives, ["k"], out_col="j")
    agg = ranked_pos.agg(
        F.sum(F.expr("(j * 1000000000) div k")).cast("bigint").alias(
            "ap_nano_sum"
        )
    )
    return agg.select(
        F.lit(n_pos).cast("bigint").alias("n_pos"),
        "ap_nano_sum",
        (
            F.col("ap_nano_sum").cast("double")
            / F.lit(n_pos)
            / F.lit(1000000000)
        ).alias("average_precision"),
    )


@query(
    "agg_bland_altman",
    bounded_cross="1-row broadcast scalar (global diff-moment row)",
    oracle="""
WITH ls AS (
  SELECT l_orderkey AS ok,
         CAST(SUM(CAST(FLOOR((CAST(l_extendedprice AS DOUBLE)
              * (1 - CAST(l_discount AS DOUBLE)))
              * (1 + CAST(l_tax AS DOUBLE)) * 1000000 + 0.5) AS BIGINT))
           AS BIGINT) AS s_micro
  FROM lineitem GROUP BY l_orderkey
), d AS (
  SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) * 10000 - ls.s_micro
           AS d
  FROM orders o JOIN ls ON o.o_orderkey = ls.ok
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(d) AS BIGINT) AS sd_,
         CAST(CAST(SUM(CAST(d AS HUGEINT) * d) AS VARCHAR) AS DOUBLE)
           AS ss
  FROM d
), st AS (
  SELECT n,
         CAST(sd_ AS DOUBLE) / n AS mean_d,
         sqrt((ss - (CAST(sd_ AS DOUBLE) / n) * CAST(sd_ AS DOUBLE))
              / (n - 1)) AS sd_d
  FROM m
)
SELECT st.n AS n_orders,
       st.mean_d AS mean_diff_micro,
       st.sd_d AS sd_diff_micro,
       st.mean_d - 1.96 * st.sd_d AS loa_lo,
       st.mean_d + 1.96 * st.sd_d AS loa_hi,
       CAST(SUM(CASE WHEN CAST(d.d AS DOUBLE) < st.mean_d - 1.96 * st.sd_d
                       OR CAST(d.d AS DOUBLE) > st.mean_d + 1.96 * st.sd_d
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outside
FROM d, st
GROUP BY st.n, st.mean_d, st.sd_d
""",
)
def agg_bland_altman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bland-Altman agreement analysis (Bland & Altman 1986) between
    the two ways this schema states an order's value: the header
    o_totalprice vs the lineitem-derived sum(extendedprice *
    (1-discount) * (1+tax)) — the reconciliation report a warehouse
    runs between a rollup column and its source-of-truth detail.
    Reports the bias (mean difference), the spread (SD), the 95%
    limits of agreement, and how many orders fall outside them.

    Exactness: each line's value is quantized ONCE to integer micro
    units with FLOOR(x * 1e6 + 0.5) on a fixed double expression
    (identical IEEE sequence both engines), so per-order sums and the
    diff d are exact bigints; d^2 goes through decimal(38)/HUGEINT
    (the ts_acf overflow discipline — d can reach ~6e11 micro, d^2
    ~4e23) and the moments collapse to doubles in one fixed order.
    Scale shape: one keyed groupBy over lineitem, one equi-join to
    orders, a 1-row moment aggregate joined back as a broadcast
    scalar, one linear flag pass — no window, no driver loop."""
    li = load(spark, sf_dir, "lineitem")
    ls = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.sum(
            F.expr(
                "CAST(FLOOR((CAST(l_extendedprice AS DOUBLE)"
                " * (1 - CAST(l_discount AS DOUBLE)))"
                " * (1 + CAST(l_tax AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("s_micro")
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        (F.expr(cents("o_totalprice")) * 10000).alias("o_micro"),
    )
    d = o.join(ls, "ok").select(
        (F.col("o_micro") - F.col("s_micro")).alias("d")
    )
    m = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d").cast("bigint").alias("sd_"),
        F.sum(F.col("d").cast("decimal(38,0)") * F.col("d"))
        .cast("double")
        .alias("ss"),
    )
    st = m.select(
        "n",
        (F.col("sd_").cast("double") / F.col("n")).alias("mean_d"),
        F.sqrt(
            (
                F.col("ss")
                - (F.col("sd_").cast("double") / F.col("n"))
                * F.col("sd_").cast("double")
            )
            / (F.col("n") - 1)
        ).alias("sd_d"),
    )
    flagged = d.crossJoin(F.broadcast(st))
    lo = F.col("mean_d") - 1.96 * F.col("sd_d")
    hi = F.col("mean_d") + 1.96 * F.col("sd_d")
    return flagged.groupBy("n", "mean_d", "sd_d").agg(
        F.sum(
            F.when(
                (F.col("d").cast("double") < lo)
                | (F.col("d").cast("double") > hi),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_outside")
    ).select(
        F.col("n").alias("n_orders"),
        F.col("mean_d").alias("mean_diff_micro"),
        F.col("sd_d").alias("sd_diff_micro"),
        lo.alias("loa_lo"),
        hi.alias("loa_hi"),
        "n_outside",
    )


@query(
    "agg_ece",
    oracle="""
WITH r AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
         ROW_NUMBER() OVER (
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                    o_orderkey) AS rn,
         NTILE(10) OVER (
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                    o_orderkey) AS bin
  FROM orders
), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
b AS (
  SELECT bin, CAST(SUM(pos) AS BIGINT) AS pos_b,
         CAST(SUM(rn) AS BIGINT) AS ranksum_b
  FROM r GROUP BY bin
)
SELECT (SELECT n FROM nn) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(ABS(pos_b * (SELECT n FROM nn) - ranksum_b)) AS BIGINT)
         AS ece_num,
       CAST(SUM(ABS(pos_b * (SELECT n FROM nn) - ranksum_b)) AS DOUBLE)
         / (SELECT n FROM nn) / (SELECT n FROM nn) AS ece
FROM b
""",
)
def agg_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error of the rank-normalized score
    against the binary label, over the same 10 equal-frequency bins
    as agg_calibration_bins: ECE = sum_b (n_b/N) * |acc_b - conf_b|
    with conf the mean normalized rank. The headline number model
    monitoring dashboards track; isotonic (agg_isotonic_calibration)
    is the FIX, ECE is the ALARM.

    Exactness by algebra, not quantization: with conf_b =
    ranksum_b/(n_b*N) and acc_b = pos_b/n_b, each bin term
    (n_b/N)*|acc_b - conf_b| collapses to |pos_b*N - ranksum_b| / N^2
    — so the WHOLE statistic is one exact bigint numerator
    (pos_b * N <= 2.25e14 at a 100x corpus) over N^2, no per-bin
    float ever summed. Scale shape: one global row-number + NTILE
    pass (two-phase machinery), a 10-row aggregate, one division."""
    from ..plans.global_rank import ntile_expr, with_global_row_number

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(cents("o_totalprice")).alias("sc"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
    )
    numbered, n_total = with_global_row_number(
        o, ["sc", "o_orderkey"], out_col="rn"
    )
    binned = numbered.withColumn("bin", ntile_expr("rn", n_total, 10))
    b = binned.groupBy("bin").agg(
        F.sum("pos").cast("bigint").alias("pos_b"),
        F.sum("rn").cast("bigint").alias("ranksum_b"),
    )
    agg = b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum(
            F.abs(F.col("pos_b") * F.lit(n_total) - F.col("ranksum_b"))
        )
        .cast("bigint")
        .alias("ece_num"),
    )
    return agg.select(
        F.lit(n_total).cast("bigint").alias("n_rows"),
        "n_bins",
        "ece_num",
        (
            F.col("ece_num").cast("double") / F.lit(n_total) / F.lit(n_total)
        ).alias("ece"),
    )


@query(
    "agg_log_loss",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderpriority AS seg,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), train AS (
  SELECT seg, CAST(SUM(y) AS DOUBLE) / COUNT(*) AS p
  FROM base WHERE o_orderkey % 2 = 0 GROUP BY seg
), test AS (
  SELECT b.seg, t.p,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(b.y) AS BIGINT) AS ny
  FROM base b JOIN train t USING (seg)
  WHERE b.o_orderkey % 2 = 1
  GROUP BY b.seg, t.p
), q AS (
  SELECT seg, n, ny,
         CAST(FLOOR(LN(p) * 1000000 + 0.5) AS BIGINT) AS l1,
         CAST(FLOOR(LN(1 - p) * 1000000 + 0.5) AS BIGINT) AS l0,
         CAST(FLOOR(LN(CAST(ny AS DOUBLE) / n) * 1000000 + 0.5) AS BIGINT)
           AS r1,
         CAST(FLOOR(LN(1 - CAST(ny AS DOUBLE) / n) * 1000000 + 0.5)
              AS BIGINT) AS r0
  FROM test
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_test,
         CAST(SUM(-(ny * l1 + (n - ny) * l0)) AS BIGINT) AS ll_micro,
         CAST(SUM(-(ny * r1 + (n - ny) * r0)) AS BIGINT) AS ref_micro
  FROM q
)
SELECT n_test,
       CAST(ll_micro AS DOUBLE) / 1000000 / n_test AS log_loss,
       CAST(ref_micro AS DOUBLE) / 1000000 / n_test AS log_loss_refitted,
       CAST(1 AS DOUBLE)
         - (CAST(ll_micro AS DOUBLE) / 1000000 / n_test)
           / (CAST(ref_micro AS DOUBLE) / 1000000 / n_test)
         AS skill_vs_refit
FROM tot
""",
)
def agg_log_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-entropy (log loss) of the agg_brier_score segment
    forecast: train-half fulfilment rates score the test half under
    -mean[y ln p + (1-y) ln(1-p)] — the OTHER canonical proper
    scoring rule (Brier is quadratic and bounded; log loss punishes
    confident misses unboundedly), with the same refitted-rate
    reference and skill score so the two keys read side by side.

    Exactness: within a segment every row shares p, so the loss
    collapses to -(ny*ln(p) + (n-ny)*ln(1-p)); each ln is quantized
    ONCE at 1e-6 (the corpus_heaps_law discipline — both engines see
    the identical double p), making every per-segment term an exact
    bigint micro-nat product and the total an order-free integer
    sum — NO float fold anywhere, unlike brier's ordered fold.
    Scale shape: two hash aggregates to 5 rows, one broadcast join,
    a 1-row sum."""
    o = load(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("seg"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    train = (
        base.filter(F.col("o_orderkey") % 2 == 0)
        .groupBy("seg")
        .agg((F.sum("y").cast("double") / F.count(F.lit(1))).alias("p"))
    )
    test = (
        base.filter(F.col("o_orderkey") % 2 == 1)
        .join(F.broadcast(train), "seg")
        .groupBy("seg", "p")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("ny"),
        )
    )

    def lnq(col):
        return F.floor(F.log(col) * F.lit(1000000) + F.lit(0.5)).cast(
            "bigint"
        )

    rate = F.col("ny").cast("double") / F.col("n")
    terms = test.select(
        "n",
        "ny",
        lnq(F.col("p")).alias("l1"),
        lnq(F.lit(1) - F.col("p")).alias("l0"),
        lnq(rate).alias("r1"),
        lnq(F.lit(1) - rate).alias("r0"),
    )
    tot = terms.agg(
        F.sum("n").cast("bigint").alias("n_test"),
        F.sum(
            -(F.col("ny") * F.col("l1") + (F.col("n") - F.col("ny")) * F.col("l0"))
        )
        .cast("bigint")
        .alias("ll_micro"),
        F.sum(
            -(F.col("ny") * F.col("r1") + (F.col("n") - F.col("ny")) * F.col("r0"))
        )
        .cast("bigint")
        .alias("ref_micro"),
    )
    ll = F.col("ll_micro").cast("double") / F.lit(1000000) / F.col("n_test")
    ref = F.col("ref_micro").cast("double") / F.lit(1000000) / F.col("n_test")
    return tot.select(
        "n_test",
        ll.alias("log_loss"),
        ref.alias("log_loss_refitted"),
        (F.lit(1).cast("double") - ll / ref).alias("skill_vs_refit"),
    )


@query(
    "agg_fleiss_kappa",
    oracle="""
WITH per AS (
  SELECT l_orderkey,
         CAST(COUNT(*) AS BIGINT) AS nl,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS cr,
         CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT)
           AS ca,
         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT)
           AS cn
  FROM lineitem GROUP BY 1
), four AS (
  SELECT * FROM per WHERE nl = 4
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cr * cr + ca * ca + cn * cn) AS BIGINT) AS s,
         CAST(SUM(cr) AS BIGINT) AS tr,
         CAST(SUM(ca) AS BIGINT) AS ta,
         CAST(SUM(cn) AS BIGINT) AS tn
  FROM four
), st AS (
  SELECT n,
         CAST(s - 4 * n AS DOUBLE) / CAST(12 * n AS DOUBLE) AS p_bar,
         CAST(tr * tr + ta * ta + tn * tn AS DOUBLE)
           / CAST(16 * n * n AS DOUBLE) AS p_e
  FROM m
)
SELECT n AS n_items,
       p_bar, p_e,
       (p_bar - p_e) / (1 - p_e) AS kappa
FROM st
""",
)
def agg_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa — chance-corrected agreement for a FIXED panel
    of m raters per item, generalizing agg_cohens_kappa's two-rater
    form: items are orders with exactly 4 lineitems, the 4 lines are
    the 'raters', and the 3 return-flag states are the categories
    (do an order's lines agree on its return outcome beyond chance?).
    P_i = (sum_j n_ij^2 - m) / (m(m-1)), kappa =
    (P_bar - P_e)/(1 - P_e) with P_e from pooled category shares.

    Exactness: every quantity is an exact bigint (per-item category
    counts, their squares <= 16, pooled totals and THEIR squares —
    ~6e13 at a 100x corpus, inside int64); P_bar, P_e and kappa are
    fixed double expressions over those integers. Scale shape: one
    hash aggregate over lineitem to O(orders) rows, a second to one
    row."""
    per = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nl"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("cr"),
            F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0))
            .cast("bigint")
            .alias("ca"),
            F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
            .cast("bigint")
            .alias("cn"),
        )
        .filter(F.col("nl") == 4)
    )
    m = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.col("cr") * F.col("cr")
            + F.col("ca") * F.col("ca")
            + F.col("cn") * F.col("cn")
        )
        .cast("bigint")
        .alias("s"),
        F.sum("cr").cast("bigint").alias("tr"),
        F.sum("ca").cast("bigint").alias("ta"),
        F.sum("cn").cast("bigint").alias("tn"),
    )
    p_bar = (F.col("s") - 4 * F.col("n")).cast("double") / (
        12 * F.col("n")
    ).cast("double")
    p_e = (
        F.col("tr") * F.col("tr")
        + F.col("ta") * F.col("ta")
        + F.col("tn") * F.col("tn")
    ).cast("double") / (16 * F.col("n") * F.col("n")).cast("double")
    return m.select(
        F.col("n").alias("n_items"),
        p_bar.alias("p_bar"),
        p_e.alias("p_e"),
        ((p_bar - p_e) / (F.lit(1) - p_e)).alias("kappa"),
    )


@query(
    "agg_fairness_report",
    bounded_cross="1-row extremes scalar onto the 5-group table",
    oracle="""
WITH pred AS (
  SELECT c.c_mktsegment AS grp,
         CASE WHEN o.o_totalprice >
              (SELECT median(o_totalprice) FROM orders) THEN 1 ELSE 0 END
           AS yhat,
         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), g AS (
  SELECT grp,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(yhat) AS BIGINT) AS npos,
         CAST(SUM(CASE WHEN y = 1 AND yhat = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS tp,
         CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p,
         CAST(SUM(CASE WHEN y = 0 AND yhat = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS fp,
         CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg
  FROM pred GROUP BY grp
), ext AS (
  SELECT MAX(CAST(npos AS DOUBLE) / n) AS mx_sel,
         MIN(CAST(npos AS DOUBLE) / n) AS mn_sel,
         MAX(CAST(tp AS DOUBLE) / p) AS mx_tpr,
         MIN(CAST(tp AS DOUBLE) / p) AS mn_tpr
  FROM g
)
SELECT g.grp,
       g.n,
       CAST(g.npos AS DOUBLE) / g.n AS selection_rate,
       CAST(g.tp AS DOUBLE) / g.p AS tpr,
       CAST(g.fp AS DOUBLE) / g.neg AS fpr,
       ext.mx_sel - ext.mn_sel AS demographic_parity_gap,
       ext.mx_tpr - ext.mn_tpr AS equal_opportunity_gap,
       ext.mn_sel / ext.mx_sel AS disparate_impact_ratio
FROM g, ext
""",
)
def agg_fairness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-fairness audit of a threshold classifier across the five
    customer market segments: per-group selection rate, TPR and FPR
    (classifier = order value above the corpus median; outcome =
    fulfilment), plus the three standard gap metrics every
    responsible-AI review reports — demographic-parity gap,
    equal-opportunity (TPR) gap, and the four-fifths
    disparate-impact ratio. Completes the eval family
    (agg_classifier_eval accuracy, agg_roc_auc ranking, agg_ece
    calibration; this audits GROUP SKEW).

    Exactness: the threshold is the exact-median order statistic
    (both engines' median of the same doubles — 2-dp values, exact
    compare); all confusion cells are exact integer counts; rates
    and gaps are fixed double expressions with the extremes taken
    over the bounded 5-group table. Scale shape: one broadcast-able
    dimension join, one hash aggregate to 5 rows, a bounded extreme
    scan, a declared 1-row cross."""
    o = load(spark, sf_dir, "orders")
    med = o.agg(F.expr("median(o_totalprice)").alias("m")).collect()[0]["m"]
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("grp")
    )
    pred = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        "grp",
        F.when(F.col("o_totalprice") > F.lit(med), 1).otherwise(0).alias(
            "yhat"
        ),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    g = pred.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("yhat").cast("bigint").alias("npos"),
        F.sum(F.when((F.col("y") == 1) & (F.col("yhat") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("p"),
        F.sum(F.when((F.col("y") == 0) & (F.col("yhat") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("neg"),
    )
    sel = F.col("npos").cast("double") / F.col("n")
    tpr = F.col("tp").cast("double") / F.col("p")
    ext = g.agg(
        F.max(sel).alias("mx_sel"),
        F.min(sel).alias("mn_sel"),
        F.max(tpr).alias("mx_tpr"),
        F.min(tpr).alias("mn_tpr"),
    )
    # bounded: 1-row extremes scalar onto the 5-group table
    j = g.crossJoin(F.broadcast(ext))
    return j.select(
        "grp",
        "n",
        sel.alias("selection_rate"),
        tpr.alias("tpr"),
        (F.col("fp").cast("double") / F.col("neg")).alias("fpr"),
        (F.col("mx_sel") - F.col("mn_sel")).alias("demographic_parity_gap"),
        (F.col("mx_tpr") - F.col("mn_tpr")).alias("equal_opportunity_gap"),
        (F.col("mn_sel") / F.col("mx_sel")).alias("disparate_impact_ratio"),
    )


@query(
    "agg_cronbach_alpha",
    oracle="""
WITH per AS (
  SELECT l_orderkey,
         CAST(COUNT(*) AS BIGINT) AS nl,
         CAST(SUM(CASE WHEN l_linenumber = 1
                  THEN CAST(round(l_extendedprice * 100) AS BIGINT) END)
              AS BIGINT) AS i1,
         CAST(SUM(CASE WHEN l_linenumber = 2
                  THEN CAST(round(l_extendedprice * 100) AS BIGINT) END)
              AS BIGINT) AS i2,
         CAST(SUM(CASE WHEN l_linenumber = 3
                  THEN CAST(round(l_extendedprice * 100) AS BIGINT) END)
              AS BIGINT) AS i3,
         CAST(SUM(CASE WHEN l_linenumber = 4
                  THEN CAST(round(l_extendedprice * 100) AS BIGINT) END)
              AS BIGINT) AS i4
  FROM lineitem GROUP BY 1
), four AS (
  SELECT i1, i2, i3, i4, i1 + i2 + i3 + i4 AS tot
  FROM per WHERE nl = 4
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(i1) AS BIGINT) AS s1,
         CAST(CAST(SUM(CAST(i1 AS HUGEINT) * i1) AS VARCHAR) AS DOUBLE)
           AS ss1,
         CAST(SUM(i2) AS BIGINT) AS s2,
         CAST(CAST(SUM(CAST(i2 AS HUGEINT) * i2) AS VARCHAR) AS DOUBLE)
           AS ss2,
         CAST(SUM(i3) AS BIGINT) AS s3,
         CAST(CAST(SUM(CAST(i3 AS HUGEINT) * i3) AS VARCHAR) AS DOUBLE)
           AS ss3,
         CAST(SUM(i4) AS BIGINT) AS s4,
         CAST(CAST(SUM(CAST(i4 AS HUGEINT) * i4) AS VARCHAR) AS DOUBLE)
           AS ss4,
         CAST(SUM(tot) AS BIGINT) AS st,
         CAST(CAST(SUM(CAST(tot AS HUGEINT) * tot) AS VARCHAR) AS DOUBLE)
           AS sst
  FROM four
), v AS (
  SELECT n,
         (ss1 - (CAST(s1 AS DOUBLE) / n) * s1) / (n - 1)
           + (ss2 - (CAST(s2 AS DOUBLE) / n) * s2) / (n - 1)
           + (ss3 - (CAST(s3 AS DOUBLE) / n) * s3) / (n - 1)
           + (ss4 - (CAST(s4 AS DOUBLE) / n) * s4) / (n - 1) AS sum_vi,
         (sst - (CAST(st AS DOUBLE) / n) * st) / (n - 1) AS v_tot
  FROM m
)
SELECT n AS n_orders,
       sum_vi / 10000 AS sum_item_var_dollars2,
       v_tot / 10000 AS total_var_dollars2,
       (4.0 / 3.0) * (1 - sum_vi / v_tot) AS cronbach_alpha
FROM v
""",
)
def agg_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha over 4-line orders, treating the four line
    prices (by line number) as a 4-item scale and the order total as
    the scale score: alpha = k/(k-1) * (1 - sum item variances /
    total variance) — the internal-consistency reliability
    coefficient (psychometrics' most-reported number), and the
    within-basket coherence view next to agg_fleiss_kappa's
    categorical agreement on the same 4-line fixture.

    Exactness: all five variance pairs use exact integer cents with
    HUGEINT/decimal(38) squares and the gamma_mom (ss - mu*s)
    expression; the item-variance sum is a FIXED four-term
    expression (k is a constant, not a fold). One hash aggregate
    over lineitem, one 1-row reduction."""
    c = F.expr(cents("l_extendedprice"))
    per = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nl"),
            *[
                F.sum(F.when(F.col("l_linenumber") == k, c))
                .cast("bigint")
                .alias(f"i{k}")
                for k in (1, 2, 3, 4)
            ],
        )
        .filter(F.col("nl") == 4)
        .withColumn(
            "tot",
            F.col("i1") + F.col("i2") + F.col("i3") + F.col("i4"),
        )
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for k in ("i1", "i2", "i3", "i4", "tot"):
        aggs.append(F.sum(k).cast("bigint").alias(f"s_{k}"))
        aggs.append(
            F.sum(F.col(k).cast("decimal(38,0)") * F.col(k))
            .cast("double")
            .alias(f"ss_{k}")
        )
    m = per.agg(*aggs)

    def var(k):
        return (
            F.col(f"ss_{k}")
            - (F.col(f"s_{k}").cast("double") / F.col("n")) * F.col(f"s_{k}")
        ) / (F.col("n") - 1)

    sum_vi = var("i1") + var("i2") + var("i3") + var("i4")
    v_tot = var("tot")
    return m.select(
        F.col("n").alias("n_orders"),
        (sum_vi / 10000).alias("sum_item_var_dollars2"),
        (v_tot / 10000).alias("total_var_dollars2"),
        ((F.lit(4.0) / F.lit(3.0)) * (F.lit(1) - sum_vi / v_tot)).alias(
            "cronbach_alpha"
        ),
    )


@query(
    "agg_lmg_importance",
    oracle="""
WITH base AS (
  SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) AS y,
         l.nl AS x1,
         CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS x2
  FROM orders o
  JOIN (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS nl
        FROM lineitem GROUP BY 1) l ON l.l_orderkey = o.o_orderkey
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x1) AS BIGINT) AS s1,
         CAST(SUM(x1 * x1) AS BIGINT) AS s11,
         CAST(SUM(x2) AS BIGINT) AS s2,
         CAST(SUM(x1 * x2) AS BIGINT) AS s12,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(CAST(SUM(CAST(x1 AS HUGEINT) * y) AS VARCHAR) AS DOUBLE)
           AS s1y,
         CAST(SUM(x2 * y) AS BIGINT) AS s2y,
         CAST(CAST(SUM(CAST(y AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) AS syy
  FROM base
), c AS (
  SELECT n,
         s11 - CAST(s1 AS DOUBLE) * s1 / n AS c11,
         CAST(s2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n AS c22,
         s12 - CAST(s1 AS DOUBLE) * s2 / n AS c12,
         s1y - CAST(s1 AS DOUBLE) * sy / n AS c1y,
         CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy / n AS c2y,
         syy - CAST(sy AS DOUBLE) * sy / n AS cyy
  FROM m
), r AS (
  SELECT n,
         (c1y * c1y) / (c11 * cyy) AS r1,
         (c2y * c2y) / (c22 * cyy) AS r2,
         ((c22 * c1y * c1y - 2 * c12 * c1y * c2y + c11 * c2y * c2y)
          / (c11 * c22 - c12 * c12)) / cyy AS r12
  FROM c
)
SELECT n AS n_orders, r1 AS r2_x1_alone, r2 AS r2_x2_alone,
       r12 AS r2_full,
       (r1 + (r12 - r2)) / 2 AS lmg_x1,
       (r2 + (r12 - r1)) / 2 AS lmg_x2
FROM r
""",
)
def agg_lmg_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LMG / Shapley R^2 decomposition for the two order-value
    drivers (basket size x1, urgency x2): each driver's importance
    is its R^2 contribution averaged over both entry orders —
    lmg_1 = [R^2(1) + (R^2(12) - R^2(2))]/2 — the standard
    'relative importance' answer when drivers are correlated and
    raw R^2s double-count (the regression twin of
    attribution_shapley's touchpoint game; x2^2 = x2 keeps every
    moment exact).

    Exactness: all centered second moments come from exact integer
    sums (y products through HUGEINT/decimal(38)); the three R^2
    values (two simple, one two-variable in closed form) and the
    two LMG shares are fixed double expressions; the LMG shares
    sum to R^2_full by construction (pinned in tests with a numpy
    replay, per the closed-form rule). ONE hash aggregate."""
    nl = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x1"))
    )
    base = (
        load(spark, sf_dir, "orders")
        .join(nl, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.expr(cents("o_totalprice")).alias("y"),
            "x1",
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("x2"),
        )
    )
    m = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("s1"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("s11"),
        F.sum("x2").cast("bigint").alias("s2"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("s12"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x1").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("bigint").alias("s2y"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("syy"),
    )
    n = F.col("n")
    c11 = F.col("s11") - F.col("s1").cast("double") * F.col("s1") / n
    c22 = F.col("s2").cast("double") - F.col("s2").cast("double") * F.col("s2") / n
    c12 = F.col("s12") - F.col("s1").cast("double") * F.col("s2") / n
    c1y = F.col("s1y") - F.col("s1").cast("double") * F.col("sy") / n
    c2y = F.col("s2y").cast("double") - F.col("s2").cast("double") * F.col("sy") / n
    cyy = F.col("syy") - F.col("sy").cast("double") * F.col("sy") / n
    r1 = (c1y * c1y) / (c11 * cyy)
    r2 = (c2y * c2y) / (c22 * cyy)
    r12 = (
        (c22 * c1y * c1y - 2 * c12 * c1y * c2y + c11 * c2y * c2y)
        / (c11 * c22 - c12 * c12)
    ) / cyy
    return m.select(
        n.alias("n_orders"),
        r1.alias("r2_x1_alone"),
        r2.alias("r2_x2_alone"),
        r12.alias("r2_full"),
        ((r1 + (r12 - r2)) / 2).alias("lmg_x1"),
        ((r2 + (r12 - r1)) / 2).alias("lmg_x2"),
    )


@query(
    "agg_kendall_w",
    oracle="""
WITH cells AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         o_orderpriority AS prio,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
), rk AS (
  SELECT yr, prio,
         CAST(ROW_NUMBER() OVER (PARTITION BY yr
              ORDER BY CAST(s AS DOUBLE) / n, prio) AS BIGINT) AS r
  FROM cells
), colsum AS (
  SELECT prio, CAST(SUM(r) AS BIGINT) AS rj FROM rk GROUP BY prio
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(rj) AS BIGINT) AS tot,
         CAST(SUM(rj * rj) AS BIGINT) AS ss,
         (SELECT CAST(COUNT(DISTINCT yr) AS BIGINT) FROM rk) AS b
  FROM colsum
)
SELECT b AS n_blocks, k AS n_treatments,
       (12.0 * (CAST(ss AS DOUBLE) - CAST(tot AS DOUBLE) * tot / k))
         / (CAST(b AS DOUBLE) * b * k * (k * k - 1)) AS kendall_w,
       CAST(b AS DOUBLE) * (k - 1)
         * ((12.0 * (CAST(ss AS DOUBLE) - CAST(tot AS DOUBLE) * tot / k))
            / (CAST(b AS DOUBLE) * b * k * (k * k - 1))) AS friedman_chi2
FROM m
""",
)
def agg_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance W — do the order YEARS
    agree on how the five priorities rank by mean value?
    W = 12 S / (b^2 k (k^2 - 1)) over rank-column sums (S their
    centered square sum), with the Friedman chi2 = b(k-1)W link
    reported — the agreement number behind 'is the ranking stable
    across periods?', the multi-rater RANKING complement of
    agg_fleiss_kappa's categorical agreement, on the same blocked
    frame as agg_page_trend (Page asks ORDERED trend; W asks ANY
    consistent ranking).

    Exactness: within-block ranks are deterministic; column sums,
    their squares and S are exact integers; W and the chi2 are
    fixed double expressions. One 35-cell aggregate, bounded
    windows."""
    cells = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(
            F.sum(F.expr(cents("o_totalprice"))).cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    wb = Window.partitionBy("yr").orderBy(
        F.col("s").cast("double") / F.col("n"), "prio"
    )
    rk = cells.select(
        "yr", "prio", F.row_number().over(wb).cast("bigint").alias("r")
    )
    colsum = rk.groupBy("prio").agg(F.sum("r").cast("bigint").alias("rj"))
    b = rk.select("yr").distinct().count()
    m = colsum.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("rj").cast("bigint").alias("tot"),
        F.sum(F.col("rj") * F.col("rj")).cast("bigint").alias("ss"),
    )
    k_d = F.col("k").cast("double")
    s_c = F.col("ss").cast("double") - F.col("tot").cast("double") * F.col(
        "tot"
    ) / F.col("k")
    w = (12.0 * s_c) / (
        F.lit(float(b)) * b * k_d * (k_d * k_d - 1)
    )
    return m.select(
        F.lit(b).cast("bigint").alias("n_blocks"),
        F.col("k").alias("n_treatments"),
        w.alias("kendall_w"),
        (F.lit(float(b)) * (k_d - 1) * w).alias("friedman_chi2"),
    )


@query(
    "agg_weighted_kappa",
    bounded_cross="3x3 margin grid + 1-row total scalar",
    oracle="""
WITH base AS (
  SELECT CASE WHEN o.o_totalprice < 100000 THEN 0
              WHEN o.o_totalprice < 300000 THEN 1 ELSE 2 END AS a,
         CASE WHEN l.nl <= 2 THEN 0 WHEN l.nl <= 4 THEN 1 ELSE 2 END AS b
  FROM orders o
  JOIN (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS nl
        FROM lineitem GROUP BY 1) l ON l.l_orderkey = o.o_orderkey
), cells AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY a, b
), ra AS (SELECT a, CAST(SUM(n) AS BIGINT) AS r FROM cells GROUP BY a),
cb AS (SELECT b, CAST(SUM(n) AS BIGINT) AS c FROM cells GROUP BY b),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cells),
num AS (
  SELECT CAST(SUM(ABS(a - b) * n) AS BIGINT) AS obs FROM cells
), den AS (
  SELECT CAST(SUM(ABS(ra.a - cb.b) * ra.r * cb.c) AS BIGINT) AS expd
  FROM ra, cb
)
SELECT tot.nn AS n_orders,
       CAST(num.obs AS DOUBLE) / tot.nn AS mean_abs_disagreement,
       1 - CAST(tot.nn AS DOUBLE) * num.obs / den.expd AS weighted_kappa
FROM tot, num, den
""",
)
def agg_weighted_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-weighted Cohen's kappa between two ORDINAL raters —
    the order-value tercile (fixed thresholds) and the basket-size
    tercile: kappa_w = 1 - N sum|i-j| n_ij / sum|i-j| r_i c_j, the
    agreement coefficient that charges partial credit for
    near-misses (plain agg_cohens_kappa treats off-by-one and
    off-by-two identically — wrong for ordinal scales). With
    linear weights BOTH the observed and expected disagreement are
    EXACT integers, so kappa is one division.

    Exactness: fixed literal bucket thresholds (no rank pass
    needed), exact 3x3 cells/margins, exact integer numerator and
    denominator (~1e16 at 100x — inside int64... r*c reaches
    ~2e14 * 3; the ABS-weighted sum stays ~1e15). Scale shape: one
    lineitem count aggregate, one 9-cell aggregate, bounded margin
    grids."""
    nl = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nl"))
    )
    base = (
        load(spark, sf_dir, "orders")
        .join(nl, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.when(F.col("o_totalprice") < 100000, 0)
            .when(F.col("o_totalprice") < 300000, 1)
            .otherwise(2)
            .alias("a"),
            F.when(F.col("nl") <= 2, 0)
            .when(F.col("nl") <= 4, 1)
            .otherwise(2)
            .alias("b"),
        )
    )
    cells = base.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    ra = cells.groupBy("a").agg(F.sum("n").cast("bigint").alias("r"))
    cb = cells.groupBy("b").agg(F.sum("n").cast("bigint").alias("c"))
    # one lazy agg over cells for nn+obs, the bounded 3x3 margin grid
    # for expd, crossJoined into a single 1-row plan (the
    # agg_ordinal_association pattern) — no driver-side collect()s
    no = cells.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum(F.abs(F.col("a") - F.col("b")) * F.col("n"))
        .cast("bigint")
        .alias("obs"),
    )
    ed = ra.crossJoin(F.broadcast(cb)).agg(
        F.sum(F.abs(F.col("a") - F.col("b")) * F.col("r") * F.col("c"))
        .cast("bigint")
        .alias("expd")
    )
    one = no.crossJoin(F.broadcast(ed))
    return one.select(
        F.col("nn").alias("n_orders"),
        (F.col("obs").cast("double") / F.col("nn")).alias(
            "mean_abs_disagreement"
        ),
        (
            F.lit(1)
            - F.col("nn").cast("double") * F.col("obs") / F.col("expd")
        ).alias("weighted_kappa"),
    )


@query(
    "agg_ordinal_association",
    bounded_cross="9x9 ordinal cell-pair grid + margin scalars",
    oracle="""
WITH base AS (
  SELECT CASE WHEN o.o_totalprice < 100000 THEN 0
              WHEN o.o_totalprice < 300000 THEN 1 ELSE 2 END AS a,
         CASE WHEN l.nl <= 2 THEN 0 WHEN l.nl <= 4 THEN 1 ELSE 2 END AS b
  FROM orders o
  JOIN (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS nl
        FROM lineitem GROUP BY 1) l ON l.l_orderkey = o.o_orderkey
), cells AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY a, b
), pair AS (
  SELECT CAST(SUM(CASE WHEN (x.a < y.a AND x.b < y.b)
                         OR (x.a > y.a AND x.b > y.b)
                       THEN x.n * y.n ELSE 0 END) AS BIGINT) AS c2,
         CAST(SUM(CASE WHEN (x.a < y.a AND x.b > y.b)
                         OR (x.a > y.a AND x.b < y.b)
                       THEN x.n * y.n ELSE 0 END) AS BIGINT) AS d2,
         CAST(SUM(CASE WHEN x.a = y.a AND x.b <> y.b
                       THEN x.n * y.n ELSE 0 END) AS BIGINT) AS ty2,
         CAST(SUM(CASE WHEN x.b = y.b AND x.a <> y.a
                       THEN x.n * y.n ELSE 0 END) AS BIGINT) AS tx2
  FROM cells x, cells y
)
SELECT CAST(c2 // 2 AS BIGINT) AS concordant,
       CAST(d2 // 2 AS BIGINT) AS discordant,
       CAST(c2 - d2 AS DOUBLE) / (c2 + d2) AS goodman_kruskal_gamma,
       CAST(c2 - d2 AS DOUBLE) / (c2 + d2 + ty2) AS somers_d_yx,
       CAST(c2 - d2 AS DOUBLE)
         / sqrt(CAST(c2 + d2 + ty2 AS DOUBLE) * (c2 + d2 + tx2))
         AS kendall_tau_b
FROM pair
""",
)
def agg_ordinal_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ordinal-association triple — Goodman-Kruskal gamma,
    Somers' D(y|x) and Kendall's tau-b — between the order-value
    and basket-size terciles, all from ONE bounded 9x9 cell-pair
    grid: gamma ignores ties (upper bound), Somers' D charges ties
    on the dependent only (the asymmetric regression-flavored one,
    and the c-statistic's cousin), tau-b charges both. Reading the
    three together is how categorical-data analysis actually
    reports ordinal association; agg_kendall_tau gives the raw-data
    tau, this gives the contingency-table family.

    Exactness: concordant/discordant/tie pair counts are exact
    integer sums of cell products over the 81-pair grid (~3e15 at
    100x — inside int64); the three coefficients are fixed double
    expressions. Scale shape: one 9-cell aggregate, a bounded
    81-pair fold."""
    nl = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nl"))
    )
    base = (
        load(spark, sf_dir, "orders")
        .join(nl, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.when(F.col("o_totalprice") < 100000, 0)
            .when(F.col("o_totalprice") < 300000, 1)
            .otherwise(2)
            .alias("a"),
            F.when(F.col("nl") <= 2, 0)
            .when(F.col("nl") <= 4, 1)
            .otherwise(2)
            .alias("b"),
        )
    )
    cells = base.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    x = cells.select(
        F.col("a").alias("xa"), F.col("b").alias("xb"), F.col("n").alias("xn")
    )
    y = cells.select(
        F.col("a").alias("ya"), F.col("b").alias("yb"), F.col("n").alias("yn")
    )
    # bounded: 9x9 cell-pair grid
    grid = x.crossJoin(F.broadcast(y))
    prod = F.col("xn") * F.col("yn")
    conc = ((F.col("xa") < F.col("ya")) & (F.col("xb") < F.col("yb"))) | (
        (F.col("xa") > F.col("ya")) & (F.col("xb") > F.col("yb"))
    )
    disc = ((F.col("xa") < F.col("ya")) & (F.col("xb") > F.col("yb"))) | (
        (F.col("xa") > F.col("ya")) & (F.col("xb") < F.col("yb"))
    )
    tya = (F.col("xa") == F.col("ya")) & (F.col("xb") != F.col("yb"))
    txb = (F.col("xb") == F.col("yb")) & (F.col("xa") != F.col("ya"))
    pair = grid.agg(
        F.sum(F.when(conc, prod).otherwise(0)).cast("bigint").alias("c2"),
        F.sum(F.when(disc, prod).otherwise(0)).cast("bigint").alias("d2"),
        F.sum(F.when(tya, prod).otherwise(0)).cast("bigint").alias("ty2"),
        F.sum(F.when(txb, prod).otherwise(0)).cast("bigint").alias("tx2"),
    )
    cd = (F.col("c2") - F.col("d2")).cast("double")
    return pair.select(
        F.expr("c2 div 2").alias("concordant"),
        F.expr("d2 div 2").alias("discordant"),
        (cd / (F.col("c2") + F.col("d2"))).alias("goodman_kruskal_gamma"),
        (cd / (F.col("c2") + F.col("d2") + F.col("ty2"))).alias(
            "somers_d_yx"
        ),
        (
            cd
            / F.sqrt(
                (F.col("c2") + F.col("d2") + F.col("ty2")).cast("double")
                * (F.col("c2") + F.col("d2") + F.col("tx2"))
            )
        ).alias("kendall_tau_b"),
    )
