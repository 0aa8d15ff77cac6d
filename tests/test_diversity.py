"""Property + golden tests for the diversity core (SURVEY.md §5.2).

Mirrors the reference's reconstructed test strategy: coreset
invariants, farthest-first guarantees vs brute force on tiny sets,
matroid independence, heuristic monotonicity.
"""

import itertools

import numpy as np
import pytest

from diversity_maximization_spark.diversity import kernel as K
from diversity_maximization_spark.diversity.coreset import (
    collect_coreset,
    mr_coreset,
)
from diversity_maximization_spark.diversity.gmm import gmm_distributed
from diversity_maximization_spark.diversity.matroid import (
    PartitionMatroid,
    TransversalMatroid,
)
from diversity_maximization_spark.registry import QUERIES
from diversity_maximization_spark.sources import load


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def X_all(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    return ids, X


def test_farthest_first_vs_bruteforce_edge(X_all):
    """2-approx guarantee for remote-edge, checked exactly on a tiny set."""
    _ids, X = X_all
    Xs = X[:10]
    D = K.pairwise_l2(Xs)
    k = 3
    chosen, _, _ = K.farthest_first(Xs, k, start=0)
    heur = K.eval_edge(D[np.ix_(chosen, chosen)])
    best = max(
        K.eval_edge(D[np.ix_(c, c)]) for c in map(list, itertools.combinations(range(10), k))
    )
    assert heur >= best / 2 - 1e-9
    assert heur <= best + 1e-9


def test_gmm_distributed_matches_local(spark, emb, X_all):
    """The distributed broadcast-argmax GMM must equal the sequential
    kernel run on the same points (same start, same tie-breaks)."""
    ids, X = X_all
    k = 8
    dist_centers = gmm_distributed(emb, k=k)
    local_idx, local_dist, _ = K.farthest_first(X, k, start=0)
    assert [c[1] for c in dist_centers] == [int(ids[i]) for i in local_idx]
    np.testing.assert_allclose(
        [c[2] for c in dist_centers], local_dist, rtol=1e-9, atol=1e-9
    )


def test_gmm_batched_refill_identical_to_single_step(spark, emb):
    """The batched-candidate-refill optimization must be a pure perf
    change: batch=1 degenerates to the one-center-per-job formulation,
    and the default batch must produce bit-identical centers, order,
    and distances."""
    k = 8
    batched = gmm_distributed(emb, k=k)
    single = gmm_distributed(emb, k=k, batch=1)
    assert [(c[0], c[1]) for c in batched] == [(c[0], c[1]) for c in single]
    assert [c[2] for c in batched] == [c[2] for c in single]


def test_gmm_k_exceeds_n_returns_all_points(spark, emb):
    """ADVICE r01: k > number of distinct points must return every
    point (the local kernel's min(k, n) clamp), not raise."""
    from pyspark.sql import functions as F

    few = emb.filter(F.col("vec_id") < 5)
    centers = gmm_distributed(few, k=10)
    assert sorted(c[1] for c in centers) == [0, 1, 2, 3, 4]


def test_bipartition_descent_matches_exhaustive(X_all):
    """On sets small enough to enumerate, the swap-descent heuristic
    must land on (or near) the exhaustive optimum; on a 2-cluster
    construction it must find the exact obvious cut."""
    import itertools

    _ids, X = X_all
    for n in (6, 9, 12):
        D = K.pairwise_l2(X[:n])
        exact = K.eval_bipartition(D)  # exhaustive path (n <= 14)
        heur = K.eval_bipartition(D, exhaustive_max=0)  # force descent
        assert heur >= exact - 1e-9  # descent can't beat the optimum
    # two tight clusters far apart: optimal balanced cut keeps each
    # cluster whole; descent must find it exactly
    a = np.random.RandomState(7).normal(0, 0.01, (4, 8))
    b = a + 100.0
    D = K.pairwise_l2(np.vstack([a, b]))
    exact = K.eval_bipartition(D)
    heur = K.eval_bipartition(D, exhaustive_max=0)
    # same cut, possibly complementary mask -> summation order differs
    assert abs(exact - heur) < 1e-9 * max(abs(exact), 1.0) + 1e-9 or abs(
        exact - heur
    ) / max(abs(exact), 1.0) < 1e-8


def test_div_eval_bipartition_query(spark, sf_dir):
    rows = QUERIES["div_eval_bipartition"](spark, sf_dir).collect()
    assert len(rows) == 1 and rows[0]["objective"] == "bipartition"
    assert rows[0]["value"] > 0


def test_gmm_k2_lower_bound(X_all):
    """At k=2 the chosen pair spans >= diameter/2."""
    _ids, X = X_all
    D = K.pairwise_l2(X)
    chosen, dist_when, _ = K.farthest_first(X, 2, start=0)
    assert dist_when[1] >= D.max() / 2 - 1e-9


def test_coreset_invariants(spark, emb):
    p, kprime, m = 4, 16, 1
    cs = mr_coreset(emb, p=p, kprime=kprime, m=m, seed=42).collect()
    by_part = {}
    for r in cs:
        by_part.setdefault(r["part"], []).append(r)
    assert set(by_part) == set(range(p))
    total_weight = 0
    for part, rows in by_part.items():
        kernels = [r for r in rows if r["is_kernel"] == 1]
        delegates = [r for r in rows if r["is_kernel"] == 0]
        assert len(kernels) == kprime
        assert len(delegates) <= kprime * m
        # farthest-first invariant: kernel pairwise min >= max assign dist
        KX = np.stack([np.asarray(r["embedding"]) for r in kernels])
        Dk = K.pairwise_l2(KX)
        min_kernel_pair = Dk[np.triu_indices(len(KX), k=1)].min()
        max_assign = max((r["dist_to_center"] for r in delegates), default=0.0)
        assert min_kernel_pair >= max_assign - 1e-9
        total_weight += sum(r["weight"] for r in rows)
    # weights account for every input point exactly once
    assert total_weight == emb.count()


def test_coreset_deterministic(spark, emb):
    a = sorted(
        (r["part"], r["vec_id"], r["center_rank"])
        for r in mr_coreset(emb, p=4, kprime=8, m=1, seed=7).collect()
    )
    b = sorted(
        (r["part"], r["vec_id"], r["center_rank"])
        for r in mr_coreset(emb, p=4, kprime=8, m=1, seed=7).collect()
    )
    assert a == b


def test_coreset_quality_vs_full(spark, emb, X_all):
    """Coreset-then-finish must stay close to the full-data heuristic
    (the paper's composable-coreset claim, checked loosely)."""
    _ids, X = X_all
    k = 8
    full_idx, _, _ = K.farthest_first(X, k, start=0)
    full_val = K.eval_edge(K.pairwise_l2(X[full_idx]))
    _cids, _labels, CX, _w = collect_coreset(mr_coreset(emb, p=4, kprime=16, m=1))
    cs_idx, _, _ = K.farthest_first(CX, k, start=0)
    cs_val = K.eval_edge(K.pairwise_l2(CX[cs_idx]))
    assert cs_val >= full_val / 3  # generous: theory gives ~(1-2eps)/2


def test_matching_disjoint_pairs(X_all):
    _ids, X = X_all
    D = K.pairwise_l2(X[:50])
    flat = K.matching_heuristic(D, k=10)
    assert len(flat) == 10
    assert len(set(flat.tolist())) == 10
    # first pair is the true farthest pair
    iu = np.triu_indices(50, k=1)
    assert np.isclose(D[flat[0], flat[1]], D[iu].max())


def test_local_search_improves(X_all):
    _ids, X = X_all
    D = K.pairwise_l2(X[:60])
    init, _, _ = K.farthest_first(X[:60], 8, start=0)

    def clique(s):
        idx = np.array(s)
        return D[np.ix_(idx, idx)].sum() / 2

    sel, val = K.local_search_clique(D, k=8, init=list(init))
    assert val >= clique(init) - 1e-9
    assert np.isclose(val, clique(sel))


def test_partition_matroid():
    m = PartitionMatroid({0: 2, 1: 1})
    assert m.is_independent([0, 0, 1])
    assert not m.is_independent([0, 0, 0])
    assert not m.is_independent([1, 1])


def test_transversal_matroid():
    topics = {0: frozenset({0}), 1: frozenset({0}), 2: frozenset({0, 1})}
    m = TransversalMatroid(topics)
    assert m.is_independent([0, 2])
    assert not m.is_independent([0, 1])  # both only cover topic 0
    assert m.is_independent([1, 2])


def test_matroid_queries_independent(spark, sf_dir):
    from diversity_maximization_spark.registry import QUERIES

    part_rows = QUERIES["div_matroid_partition"](spark, sf_dir).collect()
    labels = [r["label"] for r in part_rows]
    assert len(labels) == 10
    assert len(set(labels)) == len(labels)  # capacity 1 per label

    trans_rows = QUERIES["div_matroid_transversal"](spark, sf_dir).collect()
    assert len(trans_rows) == 6


def test_evaluators_match_numpy(spark, sf_dir, X_all):
    """SQL evaluators vs numpy on the same candidate set."""
    from diversity_maximization_spark.registry import QUERIES

    ids, X = X_all
    cand_mask = ids % 25 == 0
    D = K.pairwise_l2(X[cand_mask])
    for key, fn in [
        ("div_eval_edge", K.eval_edge),
        ("div_eval_clique", K.eval_clique),
        ("div_eval_star", K.eval_star),
    ]:
        row = QUERIES[key](spark, sf_dir).collect()[0]
        assert abs(row["value"] - round(fn(D), 6)) < 1e-5, key


def test_flagship_runs(spark, sf_dir):
    from diversity_maximization_spark.diversity.flagship import flagship

    rows = flagship(spark, sf_dir).collect()
    assert len(rows) == 10
    assert rows[0]["sel_order"] == 0
    assert all(r["edge_div"] > 0 for r in rows)


def test_distance_eval_accounting(spark, sf_dir):
    """Reference PerformanceMetrics parity: plan-side observe() counts
    the pair rows of a distributed evaluator; kernel-side counter
    tracks numpy distance evaluations."""
    import numpy as np
    from pyspark.sql import functions as F

    from diversity_maximization_spark.diversity import evaluators, kernel as K
    from diversity_maximization_spark.metrics import (
        KERNEL_DISTANCE_EVALS,
        observe_distance_evals,
    )
    from diversity_maximization_spark.sources import load

    cand = load(spark, sf_dir, "embeddings").limit(20)
    observed, obs = observe_distance_evals(evaluators.pairs(cand))
    observed.agg(F.min("dist")).collect()
    assert obs.get["n_distance_evals"] == 20 * 19 // 2

    KERNEL_DISTANCE_EVALS.reset()
    X = np.random.RandomState(0).standard_normal((30, 4))
    K.pairwise_l2(X)
    assert KERNEL_DISTANCE_EVALS.n == 30 * 29 // 2
    K.l2_to_point(X, X[0])
    assert KERNEL_DISTANCE_EVALS.n == 30 * 29 // 2 + 30


def test_gmm_cosine_matches_local_kernel(spark, sf_dir, X_all):
    """div_gmm_cosine (normalize + euclidean FFT) must pick the same
    centers as the local numpy kernel run directly with the cosine
    metric — the monotone-map reduction is exact, not approximate."""
    from diversity_maximization_spark.registry import QUERIES

    ids, X = X_all
    rows = QUERIES["div_gmm_cosine"](spark, sf_dir).collect()
    got = [r["vec_id"] for r in sorted(rows, key=lambda r: r["sel_order"])]
    chosen, dist_when, _ = K.farthest_first(X, 16, start=0, metric="cosine")
    want = [int(ids[i]) for i in chosen]
    assert got == want
    # reported cosine distances match the kernel's
    by_rank = {r["sel_order"]: r["cos_dist_when_chosen"] for r in rows}
    for rank in range(1, 16):
        assert abs(by_rank[rank] - dist_when[rank]) < 1e-6


def test_kmeans_assignment_is_nearest_center(spark, sf_dir, X_all):
    """After the final update, every point must be assigned to its
    nearest center (Lloyd's invariant), and the within-cluster cost
    must beat the k-random-centers baseline."""
    from diversity_maximization_spark.registry import QUERIES

    ids, X = X_all
    rows = QUERIES["div_kmeans"](spark, sf_dir).collect()
    assert len(rows) == len(ids)
    assign = {r["vec_id"]: (r["cluster"], r["dist"]) for r in rows}
    # rebuild the final centers as the query computed them: means of
    # the PENULTIMATE assignment... instead verify the invariant
    # directly: dist is the distance to the assigned cluster's
    # centroid-of-members under the reported assignment, and no point
    # is > its distance to the centroid of any other cluster's members
    # by more than the one-Lloyd-step slack. Simplest exact check:
    # recompute centers as member means and verify the assignment is
    # a fixed point for >=95% of points (float-mean wobble aside).
    import numpy as np

    k = 8
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    members = {c: [] for c in range(k)}
    for vid, (c, _d) in assign.items():
        members[c].append(id_to_row[int(vid)])
    centers = np.stack([
        X[members[c]].mean(axis=0) if members[c] else np.zeros(X.shape[1])
        for c in range(k)
    ])
    d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    nearest = d2.argmin(axis=1)
    agree = sum(
        1 for vid, (c, _d) in assign.items() if nearest[id_to_row[int(vid)]] == c
    )
    assert agree / len(ids) >= 0.95


def test_experiment_report_invariants(spark, sf_dir):
    """local search starts from GMM and only takes improving swaps, so
    its clique value dominates GMM's; every algorithm returns k points
    and non-negative objectives; random never beats local search."""
    from diversity_maximization_spark.registry import QUERIES

    rows = {
        r["algorithm"]: r
        for r in QUERIES["div_experiment_report"](spark, sf_dir).collect()
    }
    assert set(rows) == {"gmm", "matching", "local_search", "random"}
    for r in rows.values():
        assert r["k"] == 12
        assert r["edge_div"] >= 0 and r["clique_div"] >= 0
    assert (
        rows["local_search"]["clique_div"]
        >= rows["gmm"]["clique_div"] - 1e-9
    )
    assert (
        rows["local_search"]["clique_div"]
        >= rows["random"]["clique_div"] - 1e-9
    )


def test_tree_coreset_composition_invariants(spark, sf_dir):
    """The coreset-of-coresets must conserve total weight exactly,
    bound its size by p2*k', keep kernel points that exist in the
    source, and stay deterministic across runs. Its GMM diversity
    value must be in the same regime as the flat coreset's (tree
    composition loses at most a constant factor)."""
    import numpy as np

    from diversity_maximization_spark.diversity import kernel as K
    from diversity_maximization_spark.diversity.coreset import (
        collect_coreset,
        mr_coreset,
        tree_coreset,
    )
    from diversity_maximization_spark.sources import load as load_t

    emb = load_t(spark, sf_dir, "embeddings")
    n = emb.count()
    tree = tree_coreset(emb, p1=8, p2=2, kprime=16, seed=42)
    rows = tree.collect()
    assert sum(r["weight"] for r in rows) == n  # mass conserved
    assert len(rows) <= 2 * 16
    src_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert all(r["vec_id"] in src_ids for r in rows)
    again = tree_coreset(emb, p1=8, p2=2, kprime=16, seed=42).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    # diversity value sanity: tree-coreset GMM vs flat-coreset GMM
    def gmm_edge(cs):
        ids, _labels, X, _w = collect_coreset(cs)
        k = min(8, len(X))
        chosen, _, _ = K.farthest_first(X, k, start=0)
        return K.eval_edge(K.pairwise_l2(X[chosen]))

    flat_val = gmm_edge(mr_coreset(emb, p=4, kprime=16, m=0))
    tree_val = gmm_edge(tree.withColumn(
        "dist_to_center", tree["weight"] * 0.0
    ).withColumn("is_kernel", tree["weight"] * 0 + 1))
    assert tree_val >= 0.3 * flat_val


def test_kcenter_outliers_ignores_planted_junk():
    """Planted far-away outliers must not dictate the robust radius:
    with a budget covering them the radius stays at cluster scale,
    and the excluded weight is exactly the junk weight; with z=0 the
    radius is forced out to the junk."""
    import numpy as np

    from diversity_maximization_spark.diversity.queries import (
        kcenter_with_outliers,
    )

    rng = np.random.default_rng(7)
    clusters = np.concatenate(
        [rng.normal(c, 0.1, size=(30, 2)) for c in ((0, 0), (5, 5), (9, 0))]
    )
    junk = np.array([[100.0, 100.0], [-80.0, 50.0]])
    X = np.concatenate([clusters, junk])
    w = np.ones(len(X))

    centers, r, excluded = kcenter_with_outliers(X, w, k=3, z_weight=2.0)
    assert r < 1.0, r                      # cluster-scale radius
    assert excluded == 2.0                 # exactly the junk
    assert len(set(centers)) == 3

    _, r0, ex0 = kcenter_with_outliers(X, w, k=3, z_weight=0.0)
    # without a budget the junk must be covered: two centers burn on
    # junk and one must span all three clusters -> radius inflates
    # by an order of magnitude over the robust solution
    assert r0 > 5 * r and ex0 == 0.0


def test_transversal_exhaustive_matches_bruteforce(spark, sf_dir):
    """Independent replay of div_matroid_transversal_exhaustive: an
    itertools enumeration with TransversalMatroid as the independence
    oracle (Hopcroft-Karp-free Hall check lives only in the SQL side,
    so this cross-checks the Hall formulation against the matching
    oracle) must agree on the winning subset and its clique value."""
    import itertools

    import numpy as np

    from diversity_maximization_spark.diversity.matroid import (
        TransversalMatroid,
    )
    from diversity_maximization_spark.registry import QUERIES
    from diversity_maximization_spark.sources import load

    rows = (
        load(spark, sf_dir, "embeddings")
        .filter("vec_id % 29 = 0 AND vec_id < 320")
        .orderBy("vec_id")
        .collect()
    )
    assert len(rows) == 12
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    labels = [int(r["label"]) for r in rows]
    topics = {
        i: frozenset({labels[i] % 4, (labels[i] % 4 + 3) % 4})
        for i in range(12)
    }
    m = TransversalMatroid(topics)
    dq = {}
    for i, j in itertools.combinations(range(12), 2):
        dq[(i, j)] = int(round(float(np.linalg.norm(X[i] - X[j])) * 1e9))
    best = None
    for sub in itertools.combinations(range(12), 4):
        if not m.is_independent(list(sub)):
            continue
        vq = sum(dq[p] for p in itertools.combinations(sub, 2))
        mask = sum(1 << i for i in sub)
        if best is None or (-vq, mask) < (-best[0], best[1]):
            best = (vq, mask, sub)
    assert best is not None
    got = QUERIES["div_matroid_transversal_exhaustive"](
        spark, sf_dir
    ).orderBy("rank").collect()
    assert [r["vec_id"] for r in got] == [
        int(rows[i]["vec_id"]) for i in best[2]
    ]
    assert got[0]["clique_val"] == round(best[0] / 1e9, 6)


def test_kcenter_exhaustive_matches_bruteforce(spark, sf_dir):
    """Independent replay of div_kcenter_outliers_exhaustive: full
    (subset, radius) enumeration in numpy must agree on the minimal
    feasible radius, the tie-broken winner, and its excluded weight."""
    import itertools

    import numpy as np

    from diversity_maximization_spark.registry import QUERIES
    from diversity_maximization_spark.sources import load

    rows = (
        load(spark, sf_dir, "embeddings")
        .filter("vec_id % 29 = 0 AND vec_id < 320")
        .orderBy("vec_id")
        .collect()
    )
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    w = np.array([int(r["vec_id"]) % 3 + 1 for r in rows])
    n = len(rows)
    D = np.array(
        [
            [int(round(float(np.linalg.norm(X[i] - X[j])) * 1e9)) for j in range(n)]
            for i in range(n)
        ],
        dtype=np.int64,
    )
    radii = sorted(set(D.flatten().tolist()))
    best = None
    for sub in itertools.combinations(range(n), 3):
        mask = sum(1 << i for i in sub)
        md = D[list(sub), :].min(axis=0)
        for r in radii:
            unc = int(w[md > r].sum())
            if unc <= 2:
                if best is None or (r, mask) < (best[0], best[1]):
                    best = (r, mask, sub, unc)
                break  # larger radii for this subset can't improve r
    got = QUERIES["div_kcenter_outliers_exhaustive"](spark, sf_dir).orderBy(
        "rank"
    ).collect()
    assert [r["vec_id"] for r in got] == [
        int(rows[i]["vec_id"]) for i in best[2]
    ]
    assert got[0]["robust_radius"] == round(best[0] / 1e9, 6)
    assert got[0]["excluded_weight"] == best[3]
