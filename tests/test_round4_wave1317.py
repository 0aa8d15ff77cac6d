"""Property tests for the round-4 thirteenth-seventeenth waves."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from diversity_maximization_spark.registry import QUERIES
from diversity_maximization_spark.sources import load


def rows(spark, key, sf_dir):
    return QUERIES[key](spark, sf_dir).collect()


def test_ratio_to_report_shares_sum_to_one(spark, sf_dir):
    got = rows(spark, "win_ratio_to_report", sf_dir)
    per_order: dict = {}
    for r in got:
        per_order[r.l_orderkey] = per_order.get(r.l_orderkey, 0.0) + r.share_of_order
        assert 0.0 < r.share_of_order <= 1.0
    for k, total in per_order.items():
        assert math.isclose(total, 1.0, rel_tol=0, abs_tol=1e-9), k


def test_neyman_allocation_shares(spark, sf_dir):
    got = rows(spark, "sample_neyman_allocation", sf_dir)
    assert math.isclose(
        sum(r.neyman_share for r in got), 1.0, rel_tol=0, abs_tol=1e-12
    )
    import numpy as np

    c = load(spark, sf_dir, "customer").select(
        "c_mktsegment", F.expr("CAST(ROUND(c_acctbal*100) AS BIGINT)").alias("c")
    )
    by_seg: dict = {}
    for r in c.collect():
        by_seg.setdefault(r.c_mktsegment, []).append(r.c)
    for r in got:
        arr = np.array(by_seg[r.stratum], dtype=float)
        assert r.n == len(arr)
        assert math.isclose(
            r.sigma_bal, arr.std(ddof=1) / 100, rel_tol=1e-9
        )


def test_hash_family_is_verifiable(spark, sf_dir):
    import hashlib

    got = rows(spark, "fn_hash_family", sf_dir)
    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_dir, "documents").collect()
    }
    probe = got[0]
    t = docs[probe.doc_id].encode()
    assert probe.h_md5 == hashlib.md5(t).hexdigest()
    assert probe.h_sha256 == hashlib.sha256(t).hexdigest()
    assert probe.h_keyed == hashlib.md5(
        (hashlib.md5(t).hexdigest() + ":" + str(probe.doc_id)).encode()
    ).hexdigest()


def test_overlap_matrix_symmetric_bounds(spark, sf_dir):
    got = rows(spark, "corpus_overlap_matrix", sf_dir)
    seen = set()
    for r in got:
        assert r.source_a < r.source_b
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))
        assert 0 <= r.n_common <= min(r.n_a, r.n_b)
        assert 0.0 <= r.jaccard <= r.containment <= 1.0


def test_bitmap_presence_popcount(spark, sf_dir):
    for r in rows(spark, "agg_bitmap_presence", sf_dir):
        assert r.presence_bitmap >= 0  # slot 63 unused: never negative
        assert r.n_slots == bin(r.presence_bitmap).count("1")
        assert r.n_slots <= min(63, r.n_users)
        # each set slot is justified by at least one user mod 63
        assert r.n_slots >= 1


def test_vwap_within_frame_price_range(spark, sf_dir):
    li = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            "l_shipdate",
            F.expr("CAST(ROUND(l_extendedprice*100) AS BIGINT)").alias("pc"),
            F.expr("CAST(ROUND(l_quantity) AS BIGINT)").alias("q"),
        )
        .collect()
    )
    series: dict = {}
    for r in sorted(li, key=lambda r: (r.l_shipdate, r.l_orderkey, r.l_linenumber)):
        series.setdefault(r.l_partkey, []).append(r)
    vw = {
        (r.l_partkey, r.l_orderkey, r.l_linenumber): r.vwap10
        for r in rows(spark, "win_vwap", sf_dir)
    }
    # replay a few parts end-to-end
    for pk in list(series)[:5]:
        hist = series[pk]
        for i, r in enumerate(hist):
            frame = hist[max(0, i - 9) : i + 1]
            spq = sum(x.pc * x.q for x in frame)
            sq = sum(x.q for x in frame)
            expect = spq / sq / 100
            assert math.isclose(
                vw[(pk, r.l_orderkey, r.l_linenumber)], expect, rel_tol=1e-12
            )


def test_bollinger_bands_geometry(spark, sf_dir):
    for r in rows(spark, "ts_bollinger_bands", sf_dir):
        assert r.sd7 >= 0
        assert math.isclose(
            r.upper_band - r.ma7, r.ma7 - r.lower_band, rel_tol=0, abs_tol=1e-9
        )
        assert r.lower_band <= r.ma7 <= r.upper_band


def test_kendall_tau_matches_scipy_style_replay(spark, sf_dir):
    (r,) = rows(spark, "agg_kendall_tau", sf_dir)
    ev = load(spark, sf_dir, "events")
    c = F.expr("CAST(ROUND(value*100) AS BIGINT)")
    d = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", c).otherwise(0)).alias("x"),
            F.sum(F.when(F.col("event_type") == "click", c).otherwise(0)).alias("y"),
        )
        .collect()
    )
    conc = disc = tx = ty = n = 0
    for i in range(len(d)):
        for j in range(i + 1, len(d)):
            a, b = d[i], d[j]
            s = (a.x - b.x) * (a.y - b.y)
            n += 1
            if s > 0:
                conc += 1
            elif s < 0:
                disc += 1
            elif a.x == b.x and a.y != b.y:
                tx += 1
            elif a.y == b.y and a.x != b.x:
                ty += 1
    assert (r.concordant, r.discordant, r.n_pairs) == (conc, disc, n)
    expect = (conc - disc) / (math.sqrt(n - tx) * math.sqrt(n - ty))
    assert math.isclose(r.tau_b, expect, rel_tol=1e-12)
    assert -1.0 <= r.tau_b <= 1.0


def test_wilson_ci_brackets_rate(spark, sf_dir):
    for r in rows(spark, "agg_wilson_ci", sf_dir):
        assert 0.0 <= r.wilson_lo <= r.rate <= r.wilson_hi <= 1.0
        # interval shrinks like 1/sqrt(n): generous 3z/sqrt(n) cap
        assert r.wilson_hi - r.wilson_lo <= 3 * 1.96 / math.sqrt(r.n)


def test_overlap_duration_bounded_by_campaign_length(spark, sf_dir):
    from diversity_maximization_spark.operators.behavior import _CAMPAIGNS
    import datetime

    lens = {
        n: (
            datetime.datetime.fromisoformat(e)
            - datetime.datetime.fromisoformat(s)
        ).total_seconds()
        for n, s, e in _CAMPAIGNS
    }
    got = rows(spark, "interval_overlap_duration", sf_dir)
    assert {r.name for r in got} == set(lens)
    for r in got:
        assert 0 <= r.n_users <= r.n_sessions
        # each overlapping session contributes at most the campaign span
        assert r.total_overlap_sec <= r.n_sessions * lens[r.name] + 1e-6


def test_rolling_origin_cv_monotone_train(spark, sf_dir):
    got = sorted(rows(spark, "sample_rolling_origin_cv", sf_dir), key=lambda r: r.fold)
    assert [r.fold for r in got] == [1, 2, 3]
    trains = [r.n_train for r in got]
    assert trains == sorted(trains)  # expanding window
    # fold k+1's train set includes fold k's train+test exactly
    for a, b in zip(got, got[1:]):
        assert b.n_train == a.n_train + a.n_test


def test_cohens_kappa_identities(spark, sf_dir):
    (r,) = rows(spark, "agg_cohens_kappa", sf_dir)
    assert math.isclose(r.po, r.agree / r.n, rel_tol=1e-12)
    pe = (r.a1 * r.b1 + (r.n - r.a1) * (r.n - r.b1)) / (r.n * r.n)
    assert math.isclose(r.pe, pe, rel_tol=1e-12)
    assert math.isclose(r.kappa, (r.po - pe) / (1 - pe), rel_tol=1e-12)
    assert -1.0 <= r.kappa <= 1.0


def test_mcnemar_discordant_cells_match_kappa_marginals(spark, sf_dir):
    (mc,) = rows(spark, "agg_mcnemar_test", sf_dir)
    (kp,) = rows(spark, "agg_cohens_kappa", sf_dir)
    # b + c = total disagreements = n - agree
    assert mc.b + mc.c == kp.n - kp.agree
    # and the marginal identity: a1 - b? a1 = tp + b, b1 = tp + c
    assert mc.b - mc.c == kp.a1 - kp.b1
    assert mc.mcnemar_chi2 >= 0


def test_inverse_simpson_bounds(spark, sf_dir):
    for r in rows(spark, "agg_inverse_simpson", sf_dir):
        # 1 <= D2 <= number of categories
        assert 1.0 - 1e-12 <= r.effective_langs <= r.n_langs + 1e-12


def test_ppr_mass_concentrates_on_seed_brand(spark, sf_dir):
    from diversity_maximization_spark.operators.graph import (
        _PPR_BRAND,
        _PPR_R,
    )

    got = rows(spark, "graph_ppr_exact", sf_dir)
    assert got, "PPR must return rankings"
    ranks = [r.rank_scaled for r in got]
    assert ranks == sorted(ranks, reverse=True)
    assert all(0 <= v <= _PPR_R for v in ranks)
    # seed parts should be overrepresented in the top ranks vs their
    # share of the graph (restart mass lands on them every round)
    brands = {
        r.p_partkey: r.p_brand
        for r in load(spark, sf_dir, "part").collect()
    }
    top5_seed = sum(1 for r in got[:5] if brands[r.p_partkey] == _PPR_BRAND)
    assert top5_seed >= 1


def test_ht_estimator_is_integer_multiple(spark, sf_dir):
    got = rows(spark, "sample_ht_estimate", sf_dir)
    mx = max(
        r.n_chars
        for r in load(spark, sf_dir, "documents").select("n_chars").collect()
    )
    for r in got:
        assert r.ht_estimate_chars == r.n_accepted * mx
        assert math.isclose(
            r.rel_err,
            (r.ht_estimate_chars - r.true_total_chars) / r.true_total_chars,
            rel_tol=1e-12,
        )


def test_two_proportion_z_identities(spark, sf_dir):
    (r,) = rows(spark, "agg_two_proportion_z", sf_dir)
    assert r.n1 + r.n2 > 0 and r.x1 <= r.n1 and r.x2 <= r.n2
    pp = (r.x1 + r.x2) / (r.n1 + r.n2)
    z = (r.p1 - r.p2) / math.sqrt(pp * (1 - pp) * (1 / r.n1 + 1 / r.n2))
    assert math.isclose(r.z_stat, z, rel_tol=1e-12)
    assert r.reject_h0 == (abs(r.z_stat) > 1.96)


def test_spearman_matches_scipy_style_replay(spark, sf_dir):
    (r,) = rows(spark, "agg_spearman_rho", sf_dir)
    ev = load(spark, sf_dir, "events")
    c = F.expr("CAST(ROUND(value*100) AS BIGINT)")
    d = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", c).otherwise(0)).alias("x"),
            F.sum(F.when(F.col("event_type") == "click", c).otherwise(0)).alias("y"),
        )
        .collect()
    )
    import numpy as np

    xs = np.array([row.x for row in d], dtype=float)
    ys = np.array([row.y for row in d], dtype=float)

    def midranks(a):
        order = a.argsort(kind="mergesort")
        ranks = np.empty(len(a))
        sa = a[order]
        i = 0
        while i < len(sa):
            j = i
            while j + 1 < len(sa) and sa[j + 1] == sa[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return ranks

    rx, ry = midranks(xs), midranks(ys)
    expect = np.corrcoef(rx, ry)[0, 1]
    assert math.isclose(r.spearman_rho, expect, rel_tol=1e-9)
    assert -1.0 <= r.spearman_rho <= 1.0


def test_cochran_armitage_nonnegative_and_bounded(spark, sf_dir):
    (r,) = rows(spark, "agg_cochran_armitage", sf_dir)
    assert r.trend_chi2 >= 0
    assert 0 < r.x < r.n


def test_stream_minmax_state_matches_batch(spark, sf_dir):
    got = {r.event_type: r for r in rows(spark, "stream_minmax_state", sf_dir)}
    batch = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.min(F.expr("CAST(ROUND(value*100) AS BIGINT)")).cast("double") / 100).alias("mn"),
            (F.max(F.expr("CAST(ROUND(value*100) AS BIGINT)")).cast("double") / 100).alias("mx"),
        )
        .collect()
    )
    for b in batch:
        g = got[b.event_type]
        assert (g.n_events, g.min_value, g.max_value) == (b.n, b.mn, b.mx)


def test_stream_bitmap_state_is_superset_monotone(spark, sf_dir):
    for r in rows(spark, "stream_bitmap_state", sf_dir):
        assert r.presence_bitmap >= 0
        assert r.n_slots == bin(r.presence_bitmap).count("1")
