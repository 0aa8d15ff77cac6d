"""Property + plan tests for the round-4 sixth/seventh operator waves.

Each operator's oracle hash-match is the correctness gate; these
tests pin the INVARIANTS (what must hold at any scale factor) and
the PHYSICAL PLANS (what must hold at any data size) so a future
rewrite that stays value-correct but breaks the math or the scale
shape is caught locally.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from diversity_maximization_spark.registry import QUERIES
from diversity_maximization_spark.sources import load
from tests.test_plans import plan_of


def rows(spark, key, sf_dir):
    return QUERIES[key](spark, sf_dir).collect()


# ---------------------------------------------------------------- AUC


def test_roc_auc_in_unit_interval(spark, sf_dir):
    (r,) = rows(spark, "agg_roc_auc", sf_dir)
    assert 0.0 <= r.auc <= 1.0
    assert r.n_pos > 0 and r.n_neg > 0


def test_roc_auc_matches_quadratic_definition(spark, sf_dir):
    """Rank-sum AUC == the O(n^2) pair-counting definition
    (P(score+ > score-) + 0.5 P(tie)) on the small fixture."""
    ev = load(spark, sf_dir, "events").select(
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("s"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    pos = [r.s for r in ev.where("y = 1").collect()]
    neg = [r.s for r in ev.where("y = 0").collect()]
    import numpy as np

    p = np.array(sorted(pos))
    n = np.array(sorted(neg))
    wins = np.searchsorted(n, p, side="left").sum()
    ties = (
        np.searchsorted(n, p, side="right")
        - np.searchsorted(n, p, side="left")
    ).sum()
    expect = (wins + 0.5 * ties) / (len(p) * len(n))
    (r,) = rows(spark, "agg_roc_auc", sf_dir)
    assert math.isclose(r.auc, expect, rel_tol=0, abs_tol=1e-12)


# ------------------------------------------------------- calibration


def test_calibration_bins_partition_orders(spark, sf_dir):
    got = rows(spark, "agg_calibration_bins", sf_dir)
    n_orders = load(spark, sf_dir, "orders").count()
    assert sorted(r.bin for r in got) == list(range(1, 11))
    assert sum(r.n_rows for r in got) == n_orders
    # equal-frequency: sizes differ by at most 1
    sizes = [r.n_rows for r in got]
    assert max(sizes) - min(sizes) <= 1
    # mean score is non-decreasing in bin (score-ordered deciles)
    means = [r.mean_score for r in sorted(got, key=lambda r: r.bin)]
    assert means == sorted(means)


def test_calibration_bins_no_single_partition_window(spark, sf_dir):
    plan = plan_of(spark, "agg_calibration_bins", sf_dir)
    assert "SinglePartition" not in plan, plan


# ------------------------------------------------------------ dq / RI


def test_referential_integrity_star_schema_clean(spark, sf_dir):
    got = {r.relation: r for r in rows(spark, "dq_referential_integrity", sf_dir)}
    assert len(got) == 5
    for rel in (
        "lineitem.l_orderkey->orders",
        "lineitem.l_partkey->part",
        "lineitem.l_suppkey->supplier",
        "orders.o_custkey->customer",
    ):
        assert got[rel].orphan_rows == 0, rel
    for r in got.values():
        assert 0.0 <= r.orphan_pct <= 1.0
        assert r.orphan_rows <= r.child_rows


# ------------------------------------------------------ target encode


def test_target_encode_shrinks_toward_global_mean(spark, sf_dir):
    got = rows(spark, "feat_target_encode", sf_dir)
    # global mean reconstructed from the segment stats
    tot = sum(r.seg_mean * r.n_orders for r in got)
    n = sum(r.n_orders for r in got)
    gm = tot / n
    for r in got:
        lo, hi = sorted((r.seg_mean, gm))
        assert lo - 1e-9 <= r.enc_totalprice <= hi + 1e-9, r


# -------------------------------------------------------- IQR fences


def test_iqr_fences_quartiles_ordered(spark, sf_dir):
    for r in rows(spark, "anomaly_iqr_fences", sf_dir):
        assert r.q1 <= r.q3
        assert 0 <= r.n_outliers <= r.n


def test_iqr_fences_window_is_partitioned(spark, sf_dir):
    plan = plan_of(spark, "anomaly_iqr_fences", sf_dir)
    assert "SinglePartition" not in plan, plan


# ------------------------------------------------------------- peaks


def test_peak_detection_peaks_are_local_maxima(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    daily = {
        (r.event_type, r.day): r.c
        for r in ev.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .agg(
            F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias("c")
        )
        .collect()
    }
    peaks = rows(spark, "ts_peak_detection", sf_dir)
    assert peaks, "fixture should contain at least one peak"
    import datetime

    one = datetime.timedelta(days=1)
    for p in peaks:
        c = daily[(p.event_type, p.day)]
        prev = daily.get((p.event_type, p.day - one))
        nxt = daily.get((p.event_type, p.day + one))
        # neighbors exist (endpoints excluded) and are strictly lower
        assert prev is not None and nxt is not None
        assert c > prev and c > nxt


# ------------------------------------------------------------- bloom


def test_bloom_eval_no_false_negatives(spark, sf_dir):
    (r,) = rows(spark, "sketch_bloom_eval", sf_dir)
    # every true member must hit (Bloom filters never false-negative)
    assert r.probe_hits >= r.true_members
    assert r.false_positives == r.probe_hits - r.true_members
    assert 0 < r.bits_set <= 65536
    assert math.isclose(
        r.est_fpr, (r.bits_set / 65536) ** 4, rel_tol=1e-12
    )


def test_bloom_eval_bit_set_broadcasts(spark, sf_dir):
    plan = plan_of(spark, "sketch_bloom_eval", sf_dir)
    assert "BroadcastHashJoin" in plan, plan


# --------------------------------------------------------------- CMS


def test_cms_never_underestimates(spark, sf_dir):
    got = rows(spark, "sketch_cms_heavy", sf_dir)
    n_users = (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert len(got) == min(20, n_users)
    for r in got:
        assert r.est_cnt >= r.exact_cnt
        assert r.overestimate == r.est_cnt - r.exact_cnt


# ------------------------------------------------------ gap islands


def test_gap_islands_cover_active_days_exactly(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    active = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_days"))
    )
    truth = {r.user_id: r.n_days for r in active.collect()}
    islands = rows(spark, "win_gap_islands", sf_dir)
    per_user: dict = {}
    for i in islands:
        per_user[i.user_id] = per_user.get(i.user_id, 0) + i.island_days
        span = (i.island_end - i.island_start).days + 1
        assert span == i.island_days, i  # consecutive == span
    assert per_user == truth


# ----------------------------------------------------- log histogram


def test_log_histogram_brackets_exact_quantiles(spark, sf_dir):
    for r in rows(spark, "sketch_log_histogram", sf_dir):
        # bucket upper bound is >= the exact quantile, within 2x
        # (log2 buckets guarantee est/exact < 2)
        assert r.est_upper >= r.exact_q
        assert r.est_upper < 2 * r.exact_q
        assert r.rel_err >= 0


# -------------------------------------------------- classifier eval


def test_classifier_eval_identities(spark, sf_dir):
    (r,) = rows(spark, "agg_classifier_eval", sf_dir)
    n = load(spark, sf_dir, "events").count()
    assert r.tp + r.fp + r.fn + r.tn == n
    assert math.isclose(
        r.f1,
        2 * r.tp / (2 * r.tp + r.fp + r.fn),
        rel_tol=0,
        abs_tol=0,
    )
    p = r.tp / (r.tp + r.fp)
    rec = r.tp / (r.tp + r.fn)
    assert math.isclose(r.f1, 2 * p * rec / (p + rec), rel_tol=1e-12)


# ------------------------------------------------------ Lorenz curve


def test_lorenz_curve_convex_and_complete(spark, sf_dir):
    got = sorted(rows(spark, "agg_lorenz_curve", sf_dir), key=lambda r: r.decile)
    assert [r.decile for r in got] == list(range(1, 11))
    shares = [r.cum_share for r in got]
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    assert math.isclose(shares[-1], 1.0, rel_tol=0, abs_tol=1e-12)
    # spend-ordered deciles: increments are non-decreasing (convexity)
    inc = [b - a for a, b in zip([0.0] + shares[:-1], shares)]
    assert all(b >= a - 1e-12 for a, b in zip(inc, inc[1:]))


def test_lorenz_curve_no_single_partition_window_on_facts(spark, sf_dir):
    """The only permissible SinglePartition window is over the 10-row
    decile table; the customer-spend ranking must be distributed.
    Structural proxy: the plan's windows must all sit above an
    aggregate whose output is decile-bounded, i.e. no Window node
    consumes the raw orders scan."""
    plan = plan_of(spark, "agg_lorenz_curve", sf_dir)
    # the global rank machinery is mapInPandas, never a Window —
    # any Window in this plan is the 10-row cumulative
    assert plan.count("Window") <= 2, plan
