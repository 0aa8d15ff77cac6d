"""Property tests for the round-4 eighth/ninth/tenth operator waves.

Oracle hash-matches are the correctness gate; these pin the math
invariants and replay the kernels independently so a value-correct
but semantically wrong rewrite fails locally.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from diversity_maximization_spark.registry import QUERIES
from diversity_maximization_spark.sources import load


def rows(spark, key, sf_dir):
    return QUERIES[key](spark, sf_dir).collect()


def test_anova_f_matches_numpy_replay(spark, sf_dir):
    import numpy as np

    ev = load(spark, sf_dir, "events").select(
        "event_type", F.expr("CAST(ROUND(value*100) AS BIGINT)").alias("c")
    )
    groups: dict = {}
    for r in ev.collect():
        groups.setdefault(r.event_type, []).append(r.c)
    arrs = [np.array(v, dtype=float) for v in groups.values()]
    grand = np.concatenate(arrs)
    ssb = sum(len(a) * (a.mean() - grand.mean()) ** 2 for a in arrs)
    ssw = sum(((a - a.mean()) ** 2).sum() for a in arrs)
    k, n = len(arrs), len(grand)
    f_expect = (ssb / (k - 1)) / (ssw / (n - k))
    (got,) = rows(spark, "agg_anova_oneway", sf_dir)
    assert got.k == k and got.n_total == n
    assert math.isclose(got.f_stat, f_expect, rel_tol=1e-9)
    assert got.ss_between >= 0 and got.ss_within > 0


def test_recursive_cte_paths_follow_parent_hash(spark, sf_dir):
    got = rows(spark, "sql_recursive_cte", sf_dir)
    n_docs = load(spark, sf_dir, "documents").count()
    assert len(got) == n_docs  # exactly one terminal row per doc
    for r in got:
        ids = [int(x) for x in r.path.split("<")]
        assert ids[0] == r.doc_id
        assert ids[-1] == 0  # every chain ends at the root
        assert len(ids) == r.depth + 1
        for u, p in zip(ids, ids[1:]):
            assert p == (u * 2654435761 % 4294967296) % u


def test_rolling_xcorr_bounded_and_replayed(spark, sf_dir):
    got = rows(spark, "ts_rolling_xcorr", sf_dir)
    for r in got:
        assert -1.0 - 1e-12 <= r.corr7 <= 1.0 + 1e-12
    # replay one row with numpy over the daily series
    if got:
        import numpy as np

        ev = load(spark, sf_dir, "events")
        d = (
            ev.groupBy(F.date_trunc("day", "ts").alias("day"))
            .agg(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.expr("CAST(ROUND(value*100) AS BIGINT)"),
                    ).otherwise(0)
                ).alias("x"),
                F.sum(
                    F.when(
                        F.col("event_type") == "click",
                        F.expr("CAST(ROUND(value*100) AS BIGINT)"),
                    ).otherwise(0)
                ).alias("y"),
            )
            .orderBy("day")
            .collect()
        )
        days = [r.day for r in d]
        target = got[len(got) // 2]
        i = days.index(target.day)
        xs = np.array([r.x for r in d[i - 6 : i + 1]], dtype=float)
        ys = np.array([r.y for r in d[i - 6 : i + 1]], dtype=float)
        expect = np.corrcoef(xs, ys)[0, 1]
        assert math.isclose(target.corr7, expect, rel_tol=1e-9)


def test_time_bucket_partitions_events(spark, sf_dir):
    got = rows(spark, "fn_time_bucket", sf_dir)
    n = load(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in got) == n
    for r in got:
        # label reconstructs from the index: micros = idx * 900e6
        micros = r.bucket_idx * 900_000_000
        import datetime

        expect = datetime.datetime(1970, 1, 1) + datetime.timedelta(
            microseconds=micros
        )
        assert r.bucket_start == expect
        assert r.bucket_start.minute % 15 == 0
        assert r.bucket_start.second == 0


def test_markov_stationary_is_fixpoint(spark, sf_dir):
    got = {r.event_type: r for r in rows(spark, "agg_markov_stationary", sf_dir)}
    total = sum(r.stationary for r in got.values())
    # floors lose < 1e-10 of mass per the docstring; mass stays ~1
    assert 0.999 <= total <= 1.0 + 1e-9
    # v P ~= v at the fixpoint (power iteration converged)
    trans = {
        (r.event_type, r.next_type): r.p
        for r in rows(spark, "markov_transitions", sf_dir)
    }
    for j in got:
        vj = sum(
            got[i].stationary * trans.get((i, j), 0.0) for i in got
        )
        assert math.isclose(vj, got[j].stationary, rel_tol=0, abs_tol=1e-4)


def test_importance_sampling_exact_coin(spark, sf_dir):
    import hashlib

    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    docs = d.collect()
    max_w = max(r.n_chars for r in docs)
    expect: dict = {}
    for r in docs:
        u = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16)
        acc = 1 if u * max_w < r.n_chars * 4294967296 else 0
        a, n = expect.get(r.source, (0, 0))
        expect[r.source] = (a + acc, n + 1)
    got = rows(spark, "sample_importance", sf_dir)
    for r in got:
        a, n = expect[r.source]
        assert (r.n_accepted, r.n_docs) == (a, n)
        assert math.isclose(r.acceptance_rate, a / n, rel_tol=1e-12)


def test_assortativity_in_range(spark, sf_dir):
    (r,) = rows(spark, "graph_degree_assortativity", sf_dir)
    assert -1.0 - 1e-12 <= r.assortativity <= 1.0 + 1e-12
    assert r.n_vertices > 0 and r.n_edges > 0


def test_beta_posterior_consistency(spark, sf_dir):
    got = rows(spark, "agg_beta_posterior", sf_dir)
    assert {r.arm for r in got} == {"A", "B"}
    for r in got:
        assert 0.0 < r.post_mean < 1.0
        a, b = 1 + r.x, 1 + r.n - r.x
        assert math.isclose(r.post_mean, a / (a + b), rel_tol=1e-12)
        assert math.isclose(
            r.post_var, a * b / ((a + b) ** 2 * (a + b + 1)), rel_tol=1e-9
        )
        # posterior variance shrinks with n below prior variance 1/12
        assert r.post_var < 1 / 12


def test_er_pair_features_block_invariants(spark, sf_dir):
    feats = QUERIES["er_pair_features"](spark, sf_dir)
    for r in feats.collect():
        assert r.pa < r.pb
        assert 0.0 <= r.jw <= 1.0
        assert 0.0 <= r.char_jaccard <= 1.0
        assert r.damerau <= r.lev  # transpositions only help
        assert r.price_diff_cents >= 0
        if r.name_a == r.name_b:
            assert r.lev == 0 and r.jw == 1.0


def test_dedup_exact_normalized_catches_case_variants(spark, sf_dir):
    raw = {r.norm_hash: r for r in rows(spark, "dedup_exact_normalized", sf_dir)}
    n_docs = load(spark, sf_dir, "documents").count()
    assert sum(r.n_copies for r in raw.values()) == n_docs
    for r in raw.values():
        assert 1 <= r.n_raw_variants <= r.n_copies
    # normalized grouping is at least as coarse as raw dedup
    n_raw_groups = len(rows(spark, "dedup_exact", sf_dir))
    assert len(raw) <= n_raw_groups


def test_length_histogram_buckets_exact(spark, sf_dir):
    got = rows(spark, "corpus_length_histogram", sf_dir)
    n_docs = load(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in got) == n_docs
    for r in got:
        lo, hi = 1 << (r.log2_bucket - 1), (1 << r.log2_bucket) - 1
        assert lo <= r.min_chars <= r.max_chars <= hi
