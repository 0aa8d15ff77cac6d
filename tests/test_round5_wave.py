"""Property + plan tests for the round-5 operator wave.

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


def one(spark, key, sf_dir):
    rows = QUERIES[key](spark, sf_dir).collect()
    assert len(rows) == 1, rows
    return rows[0]


def test_kruskal_wallis_invariants(spark, sf_dir):
    r = one(spark, "agg_kruskal_wallis", sf_dir)
    assert r.k == 5
    assert r.n > 0
    # H is non-negative and the tie correction can only RAISE it
    assert r.h >= 0
    assert r.h_corrected >= r.h - 1e-12
    assert r.significant == (r.h_corrected > 9.487729036781154)


def test_friedman_invariants(spark, sf_dir):
    r = one(spark, "agg_friedman_test", sf_dir)
    assert r.k == 5
    assert r.n_blocks > 0
    assert r.q >= 0
    # Q is bounded by the all-distinct-ranks maximum b*k*(k-1)... loose:
    assert r.q <= 12 * r.n_blocks * r.k


def test_moods_median_invariants(spark, sf_dir):
    r = one(spark, "agg_moods_median", sf_dir)
    assert r.df == 4 and r.chi2 >= 0
    # the grand median must be inside the observed value range
    ev = load(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("value"), F.max("value")).collect()[0]
    assert lo <= r.grand_median <= hi


def test_hodges_lehmann_between_min_and_max_day(spark, sf_dir):
    r = one(spark, "agg_hodges_lehmann", sf_dir)
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts")).agg(
        (F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")) / 100).alias("v")
    )
    lo, hi = daily.agg(F.min("v"), F.max("v")).collect()[0]
    assert lo <= r.hl_estimate <= hi
    # n_pairs = n_days * (n_days + 1) / 2 (i <= j pairs)
    assert r.n_pairs == r.n_days * (r.n_days + 1) // 2


def test_page_hinkley_nonnegative_and_zero_start(spark, sf_dir):
    rows = sorted(
        QUERIES["ts_page_hinkley"](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert all(r.ph >= -1e-9 for r in rows)
    assert abs(rows[0].ph) < 1e-9  # first day: m_1 == min prefix


def test_variance_ratio_positive(spark, sf_dir):
    r = one(spark, "ts_variance_ratio", sf_dir)
    assert r.variance_ratio > 0
    assert r.n5 == r.n1 - 4  # 4 fewer 5-lag differences than 1-lag


def test_rolling_beta_full_windows_only(spark, sf_dir):
    rows = QUERIES["win_rolling_beta"](spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events")
    n_days = ev.select(F.date_trunc("day", "ts")).distinct().count()
    assert len(rows) == max(n_days - 13, 0)
    assert all(r.beta is None or math.isfinite(r.beta) for r in rows)


def test_yule_k_and_mattr_ranges(spark, sf_dir):
    yk = QUERIES["text_yule_k"](spark, sf_dir).collect()
    assert all(r.yule_k >= 0 and r.n_types <= r.n_tokens for r in yk)
    mt = QUERIES["text_mattr"](spark, sf_dir).collect()
    assert all(0 < r.mattr <= 1 for r in mt)


def test_scc_functional_properties(spark, sf_dir):
    rows = QUERIES["graph_scc"](spark, sf_dir).collect()
    n = len(rows)
    by_id = {r.doc_id: r for r in rows}
    assert n == load(spark, sf_dir, "documents").count()
    # successor map: u -> (u * 2654435761 mod 2^32) mod n
    succ = lambda u: (u * 2654435761 % 4294967296) % n
    for r in rows[:200]:
        s = by_id[succ(r.doc_id)]
        if r.on_cycle:
            # a cycle node's successor is on the same cycle with the
            # same component id
            assert s.on_cycle and s.scc_id == r.scc_id
        else:
            # tail nodes are singleton SCCs labelled by themselves
            assert r.scc_id == r.doc_id
    # every cycle component's id is a member of that component
    cyc = [r for r in rows if r.on_cycle]
    comp_members = {}
    for r in cyc:
        comp_members.setdefault(r.scc_id, set()).add(r.doc_id)
    for cid, members in comp_members.items():
        assert cid in members
        assert cid == min(members)


def test_logrank_consistency(spark, sf_dir):
    r = one(spark, "survival_logrank", sf_dir)
    assert r.chi2 >= 0
    assert 0 <= r.o1 <= r.n_users
    assert r.e1 > 0
    assert r.significant == (r.chi2 > 3.841458820694124)


def test_gini_gain_bounds(spark, sf_dir):
    r = one(spark, "agg_gini_impurity", sf_dir)
    assert 0 <= r.weighted_child_gini <= r.parent_gini + 1e-12
    assert 0 <= r.parent_gini <= 1 - 1.0 / 5 + 1e-12  # 5 classes
    assert abs(r.gain - (r.parent_gini - r.weighted_child_gini)) < 1e-12


def test_price_elasticity_finite(spark, sf_dir):
    r = one(spark, "agg_price_elasticity", sf_dir)
    assert math.isfinite(r.elasticity) and math.isfinite(r.intercept_ln)
    assert r.n > 0


def test_hurst_rows_and_range(spark, sf_dir):
    rows = QUERIES["ts_hurst_rs"](spark, sf_dir).collect()
    assert {r.m for r in rows} == {5, 10, 15}
    assert all(r.mean_rs > 0 for r in rows)
    hs = {r.hurst for r in rows}
    assert len(hs) == 1  # one fitted exponent repeated per row
    (h,) = hs
    assert -1 < h < 2  # loose sanity; 0.5 = random walk


def test_seasonal_strength_bounds(spark, sf_dir):
    r = one(spark, "ts_seasonal_strength", sf_dir)
    assert 0 <= r.seasonal_strength <= 1
    assert r.var_remainder >= -1e-9
    assert r.var_total >= r.var_remainder - 1e-9


def test_ivf_rescored_sims_match_exact_fold(spark, sf_dir):
    """After the round-5 fold-exact re-score, every emitted IVF sim
    must equal the exact fold cosine of that pair (the BLAS GEMM is
    a prune, not the scorer)."""
    from diversity_maximization_spark.functions import vector as V

    e = load(spark, sf_dir, "embeddings")
    got = QUERIES["sim_search_ivf"](spark, sf_dir)
    a = e.select(F.col("vec_id"), F.col("embedding").alias("qa"))
    b = e.select(
        F.col("vec_id").alias("neighbor"), F.col("embedding").alias("qb")
    )
    joined = (
        got.join(a, "vec_id")
        .join(b, "neighbor")
        .withColumn("resim", F.round(V.cosine_sim("qa", "qb"), 6))
    )
    bad = joined.filter(F.col("sim") != F.col("resim")).count()
    assert bad == 0


def test_cascade_report_tier_monotonicity(spark, sf_dir):
    rows = {r.tier: r for r in QUERIES["dedup_cascade_report"](spark, sf_dir).collect()}
    assert set(rows) == {"1_exact", "2_minhash_jaccard", "3_simhash"}
    for r in rows.values():
        assert 0 <= r.n_new_pairs <= r.n_pairs
    assert rows["1_exact"].n_new_pairs == rows["1_exact"].n_pairs


def test_benjamini_hochberg_stepup_shape(spark, sf_dir):
    rows = sorted(
        QUERIES["agg_benjamini_hochberg"](spark, sf_dir).collect(),
        key=lambda r: r.rnk,
    )
    assert len(rows) == 25
    # p sorted ascending with rank; rejections form a prefix of ranks
    ps = [r.p_value for r in rows]
    assert ps == sorted(ps)
    rejected = [r.rnk for r in rows if r.rejected]
    assert rejected == list(range(1, len(rejected) + 1))
    # BH is never more conservative than nothing: every rejected row
    # satisfies its own threshold OR a later rank did
    for r in rows:
        assert 0 <= r.p_value <= 1


def test_kpss_eta_positive(spark, sf_dir):
    r = one(spark, "ts_kpss", sf_dir)
    assert r.kpss_eta > 0
    assert r.reject_stationarity == (r.kpss_eta > 0.463)


def test_permutation_test_bounds(spark, sf_dir):
    r = one(spark, "agg_permutation_test", sf_dir)
    assert 0 <= r.n_extreme <= 32
    assert abs(r.p_value - (1 + r.n_extreme) / 33) < 1e-12


def test_bigram_entropy_conditional_leq_marginal(spark, sf_dir):
    rows = QUERIES["corpus_bigram_entropy"](spark, sf_dir).collect()
    for r in rows:
        # conditioning cannot raise entropy
        assert r.h_conditional <= r.h_bigram + 1e-9
        assert r.h_conditional >= -1e-9


def test_adf_vs_numpy_ols(spark, sf_dir):
    """The ADF coefficient must match an independent numpy
    least-squares fit of the same regression to float tolerance
    (the exact Gauss path is the contract; numpy is the sanity
    cross-check)."""
    import numpy as np

    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias("c"))
        .orderBy("day")
        .collect()
    )
    y = np.array([r.c for r in daily], dtype=np.float64)
    dy = y[2:] - y[1:-1]
    X = np.stack([np.ones(len(dy)), y[1:-1], y[1:-1] - y[:-2]], axis=1)
    beta = np.linalg.lstsq(X, dy, rcond=None)[0]
    r = one(spark, "ts_adf", sf_dir)
    assert abs(r.beta - beta[1]) < 1e-6 * max(1.0, abs(beta[1]))
    assert r.unit_root_rejected == (r.t_stat < -2.86)


def test_conformal_coverage_at_least_nominal(spark, sf_dir):
    """Split-conformal guarantee: empirical calibration coverage of
    the q90 interval is >= 0.9 minus the finite-sample slack 1/(n+1)
    (it is exactly the fraction of residuals <= the k-th smallest,
    k = ceil(0.9 (n+1)))."""
    rows = QUERIES["agg_conformal_interval"](spark, sf_dir).collect()
    assert {r.event_type for r in rows} == {"purchase", "click", "view"}
    for r in rows:
        assert r.q90 >= 0
        assert r.coverage >= 0.9 - 1.0 / (r.n_calib + 1)
        assert r.coverage <= 1.0


def test_cointegration_vs_numpy(spark, sf_dir):
    """Hedge slope and residual-ADF coefficient cross-checked against
    an independent numpy fit."""
    import numpy as np

    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "view",
                    F.expr("CAST(ROUND(value * 100) AS BIGINT)"),
                ).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.expr("CAST(ROUND(value * 100) AS BIGINT)"),
                ).otherwise(0)
            ).alias("y"),
        )
        .orderBy("day")
        .collect()
    )
    x = np.array([r.x for r in daily], dtype=np.float64)
    y = np.array([r.y for r in daily], dtype=np.float64)
    b, a = np.polyfit(x, y, 1)
    r = one(spark, "ts_cointegration", sf_dir)
    assert abs(r.hedge_slope - b) < 1e-6 * max(1.0, abs(b))
    assert r.cointegrated == (r.t_stat < -3.34)


def test_brier_score_bounds(spark, sf_dir):
    r = one(spark, "agg_brier_score", sf_dir)
    assert 0 <= r.brier <= 1
    assert 0 <= r.brier_refitted <= 0.25 + 1e-12  # p(1-p) max
    # the train-rate forecast can't beat the refitted rates by much
    assert r.skill_vs_refit <= 1e-6
