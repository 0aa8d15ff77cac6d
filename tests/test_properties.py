"""Hypothesis property tests (SURVEY.md §5.2.2) over the pure
sequential kernels and the streaming fold — randomized invariants the
algorithms must hold for ANY point set, complementing the fixed-seed
golden tests. No SparkSession: these run in milliseconds."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from diversity_maximization_spark.diversity import kernel as K
from diversity_maximization_spark.streaming.coreset import KPRIME, fold_point

pointsets = arrays(
    np.float64,
    st.tuples(st.integers(2, 24), st.integers(1, 6)),
    elements=st.floats(-100, 100, allow_nan=False, width=32),
)


@given(pointsets, st.integers(2, 8))
@settings(max_examples=60, deadline=None)
def test_farthest_first_invariants(X, k):
    chosen, dist_when, min_dist = K.farthest_first(X, k, start=0)
    kk = min(k, len(X))
    assert len(chosen) == kk
    assert len(set(chosen.tolist())) == kk  # no repeats
    # greedy radii are non-increasing after the start sentinel
    assert all(
        dist_when[i] >= dist_when[i + 1] - 1e-9 for i in range(1, kk - 1)
    )
    # every point is within the last chosen radius of the chosen set
    if kk >= 2:
        assert min_dist.max() <= dist_when[-1] + 1e-9


@given(pointsets)
@settings(max_examples=60, deadline=None)
def test_gmm_2approx_edge_bound(X):
    """Gonzalez guarantee at k=2: the chosen pair's distance is >=
    half the true diameter (it is exactly max dist from the start)."""
    if len(X) < 2:
        return
    D = K.pairwise_l2(X)
    chosen, dist_when, _ = K.farthest_first(X, 2, start=0)
    assert dist_when[1] >= D.max() / 2.0 - 1e-9


@given(pointsets)
@settings(max_examples=60, deadline=None)
def test_evaluator_inequalities(X):
    """edge <= any MST edge -> (k-1)*edge <= tree <= cycle; star >=
    (k-1)*edge."""
    D = K.pairwise_l2(X)
    k = len(D)
    edge, tree, cycle = K.eval_edge(D), K.eval_tree(D), K.eval_cycle(D)
    star = K.eval_star(D)
    assert (k - 1) * edge <= tree + 1e-6
    assert tree <= cycle + 1e-6
    assert star >= (k - 1) * edge - 1e-6


@given(pointsets, st.integers(2, 10))
@settings(max_examples=40, deadline=None)
def test_matching_disjoint_and_bound(X, k):
    D = K.pairwise_l2(X)
    sel = K.matching_heuristic(D, k)
    assert len(sel) == len(set(sel.tolist()))  # disjoint
    assert len(sel) == 2 * min(k // 2, len(X) // 2)
    if len(sel) >= 2:
        # first pair is the true farthest pair
        i, j = sel[0], sel[1]
        assert D[i, j] >= D.max() - 1e-9


@given(pointsets, st.integers(2, 6))
@settings(max_examples=30, deadline=None)
def test_local_search_never_worse_than_init(X, k):
    D = K.pairwise_l2(X)
    kk = min(k, len(X))
    init = list(range(kk))
    sel, val = K.local_search_clique(D, kk, init=init)
    init_val = float(D[np.ix_(init, init)].sum() / 2.0)
    assert val >= init_val - 1e-9
    assert len(sel) == kk


@given(
    arrays(
        np.float64,
        st.tuples(st.integers(1, 120), st.integers(1, 4)),
        elements=st.floats(-50, 50, allow_nan=False, width=32),
    )
)
@settings(max_examples=40, deadline=None)
def test_streaming_fold_invariants(X):
    """Doubling-coreset invariants for any input order: <= k' centers,
    weights partition the input, centers pairwise-separated by tau."""
    st_ = {"tau": 0.0, "centers": []}
    for i, row in enumerate(X):
        fold_point(st_, i, [float(v) for v in row])
    centers = st_["centers"]
    assert 1 <= len(centers) <= KPRIME
    assert sum(c[2] for c in centers) == len(X)
    tau = st_["tau"]
    for i, a in enumerate(centers):
        for b in centers[i + 1 :]:
            d = float(np.linalg.norm(np.asarray(a[1]) - np.asarray(b[1])))
            assert d > tau - 1e-9


@given(
    arrays(
        np.float64,
        st.tuples(st.integers(4, 10), st.integers(1, 3)),
        elements=st.floats(-10, 10, allow_nan=False, width=32),
    ),
    st.integers(2, 4),
)
@settings(max_examples=30, deadline=None)
def test_gmm_2approx_vs_bruteforce(X, k):
    """Gonzalez guarantee against the true optimum (n<=10, k<=4):
    GMM's remote-edge value >= OPT/2."""
    from itertools import combinations

    if len(X) < k:
        return
    D = K.pairwise_l2(X)
    chosen, _, _ = K.farthest_first(X, k, start=0)
    gmm_edge = K.eval_edge(D[np.ix_(chosen, chosen)])
    opt = max(
        K.eval_edge(D[np.ix_(s, s)]) for s in combinations(range(len(X)), k)
    )
    assert gmm_edge >= opt / 2.0 - 1e-9


@given(
    arrays(
        np.float64,
        st.tuples(st.integers(4, 9), st.integers(1, 3)),
        elements=st.floats(-10, 10, allow_nan=False, width=32),
    ),
    st.integers(2, 4),
)
@settings(max_examples=20, deadline=None)
def test_local_search_half_approx_vs_bruteforce(X, k):
    """Local search for remote-clique vs the true optimum (the swap
    search is a (1/2)-approx for metric clique diversity)."""
    from itertools import combinations

    if len(X) < k:
        return
    D = K.pairwise_l2(X)
    _, val = K.local_search_clique(D, k)
    opt = max(
        float(D[np.ix_(s, s)].sum() / 2.0)
        for s in combinations(range(len(X)), k)
    )
    assert val >= opt / 2.0 - 1e-9


@given(pointsets)
@settings(max_examples=40, deadline=None)
def test_bipartition_bounds(X):
    """Remote-bipartition is sandwiched between remote-edge (one cross
    pair at least) and remote-clique (all pairs), for any point set,
    on both the exhaustive and descent paths."""
    if len(X) < 2:
        return
    D = K.pairwise_l2(X)
    edge, clique = K.eval_edge(D), K.eval_clique(D)
    for forced in (None, 0):
        v = (
            K.eval_bipartition(D)
            if forced is None
            else K.eval_bipartition(D, exhaustive_max=0)
        )
        assert v >= edge - 1e-9
        assert v <= clique + 1e-9


@given(
    st.lists(
        st.tuples(
            st.integers(0, 4),  # label
            st.lists(
                st.floats(-50, 50, allow_nan=False, width=32), min_size=3, max_size=3
            ),
        ),
        min_size=1,
        max_size=120,
    ),
    st.integers(1, 3),
)
@settings(max_examples=40, deadline=None)
def test_matroid_fold_invariants(points, cap):
    """For ANY stream: <= KPRIME centers, <= cap delegates per
    (center, label), centers pairwise-separated by tau, and every
    retained id came from the stream exactly once."""
    from diversity_maximization_spark.streaming.coreset import fold_matroid_point

    st_ = {"tau": 0.0, "centers": []}
    for i, (lab, vec) in enumerate(points):
        fold_matroid_point(st_, i, [float(x) for x in vec], lab, cap=cap)
    centers = st_["centers"]
    assert 1 <= len(centers) <= KPRIME
    seen = []
    for c in centers:
        seen.append(c[0])
        for lab, dl in c[3].items():
            assert len(dl) <= cap
            seen.extend(d[0] for d in dl)
    assert len(seen) == len(set(seen))  # no id retained twice
    for i, a in enumerate(centers):
        for b in centers[i + 1 :]:
            d = sum((x - y) ** 2 for x, y in zip(a[1], b[1])) ** 0.5
            assert d > st_["tau"] - 1e-12


@given(st.lists(st.integers(0, 7 * 86400 - 1), min_size=0, max_size=200))
@settings(max_examples=100, deadline=None)
def test_interval_concurrency_decomposition(starts):
    """The two-phase sweep-line in interval_concurrency (per-day
    prefix peaks + cumulative day-level carry) must equal the naive
    single-ordered running sum's per-day max for ANY interval set,
    not just the fixture — the algebraic identity the operator's
    oracle hash-match rests on. Ties follow the operator's order:
    (t, delta, unique id), ends before starts. (The production
    operator itself is driven against the naive form by its DuckDB
    oracle at three scale factors; this test extends the identity to
    arbitrary inputs beyond the fixtures.)"""
    from collections import defaultdict

    deltas = []
    for i, s in enumerate(starts):
        deltas.append((s, 1, i))
        deltas.append((s + 1800, -1, i))

    run = 0
    peak_naive = {}
    for t, d, _ in sorted(deltas, key=lambda x: (x[0], x[1], x[2])):
        run += d
        day = t // 86400
        peak_naive[day] = max(peak_naive.get(day, -(10**9)), run)

    by_day = defaultdict(list)
    for t, d, i in deltas:
        by_day[t // 86400].append((t, d, i))
    carry = 0
    peak_two = {}
    for day in sorted(by_day):
        run_d, pk = 0, -(10**9)
        for t, d, i in sorted(by_day[day], key=lambda x: (x[0], x[1], x[2])):
            run_d += d
            pk = max(pk, run_d)
        peak_two[day] = carry + pk
        carry += run_d

    assert peak_two == peak_naive


@given(
    st.lists(
        st.tuples(st.text("ab kitten", max_size=12),
                  st.text("abs ittng", max_size=12)),
        min_size=1, max_size=40,
    )
)
@settings(max_examples=40, deadline=None)
def test_string_distances_match_duckdb(pairs):
    """_damerau and _jaro_winkler (the pandas-UDF kernels behind
    fn_string_distance) are bit-identical to DuckDB's
    damerau_levenshtein / jaro_winkler_similarity on arbitrary
    strings — the same property the oracle gate checks on the part
    table, here over adversarial random inputs."""
    import duckdb

    from diversity_maximization_spark.operators.scalars import (
        _damerau,
        _jaro_winkler,
    )

    con = duckdb.connect()
    for a, b in pairs:
        dl, jw = con.execute(
            "SELECT damerau_levenshtein(?, ?),"
            " jaro_winkler_similarity(?, ?)",
            [a, b, a, b],
        ).fetchone()
        assert _damerau(a, b) == dl, (a, b)
        assert _jaro_winkler(a, b) == jw, (a, b)


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 120)),
        min_size=1,
        max_size=60,
    ),
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 120)),
        min_size=1,
        max_size=60,
    ),
)
@settings(max_examples=60, deadline=None)
def test_interval_overlap_bucket_dedup(left, right):
    """The join_interval_overlap decomposition invariant, as pure
    arithmetic: expanding each interval to every bucket it touches
    and crediting a pair to the bucket where its overlap STARTS
    yields each overlapping pair exactly once — for ANY interval
    sets and bucket width."""
    width = 64
    naive = {
        (i, j)
        for i, (s1, d1) in enumerate(left)
        for j, (s2, d2) in enumerate(right)
        if s1 < s2 + d2 and s2 < s1 + d1
    }
    got = set()
    for i, (s1, d1) in enumerate(left):
        for b1 in range(s1 // width, (s1 + d1) // width + 1):
            for j, (s2, d2) in enumerate(right):
                for b2 in range(s2 // width, (s2 + d2) // width + 1):
                    if b1 != b2:
                        continue
                    if not (s1 < s2 + d2 and s2 < s1 + d1):
                        continue
                    if max(s1, s2) // width == b1:
                        got.add((i, j))
    assert got == naive


def test_absorption_closed_forms():
    """Two hand-built chains with known answers: a geometric chain
    (E = 1/p) and a two-hop deterministic chain (E = 2)."""
    from diversity_maximization_spark.operators.behavior import (
        absorption_expected_steps,
    )

    # state a: with prob 0.25 -> done, else stay
    geo = {("a", "done"): 25, ("a", "a"): 75}
    assert abs(absorption_expected_steps(geo, "done")["a"] - 4.0) < 1e-12

    # a -> b -> done deterministically
    two = {("a", "b"): 10, ("b", "done"): 10}
    got = absorption_expected_steps(two, "done")
    assert abs(got["a"] - 2.0) < 1e-12 and abs(got["b"] - 1.0) < 1e-12


def test_absorption_dead_ends_and_closed_classes():
    """A dead-end state (no outgoing transitions) must report inf,
    not the 1.0 an all-zero Q row would yield; a closed
    non-absorbing class must report inf WITHOUT making the solve
    singular for every other (solvable) state."""
    from diversity_maximization_spark.operators.behavior import (
        absorption_expected_steps,
    )

    inf = float("inf")
    dead = {("a", "done"): 5, ("a", "c"): 5}
    got = absorption_expected_steps(dead, "done")
    assert got["c"] == inf and abs(got["a"] - 1.0) < 1e-12

    closed = {("a", "done"): 10, ("d", "e"): 5, ("e", "d"): 5}
    got = absorption_expected_steps(closed, "done")
    assert got["d"] == inf and got["e"] == inf
    assert abs(got["a"] - 1.0) < 1e-12  # not poisoned to inf


def test_markov_removal_attribution_closed_form():
    """view -> click -> purchase deterministic chain: removing click
    kills conversion entirely (full credit); a bypass path halves
    the effect."""
    from diversity_maximization_spark.operators.behavior import (
        absorption_probability,
    )

    chain = {("view", "click"): 10, ("click", "purchase"): 10}
    assert absorption_probability(chain, "purchase")["view"] == 1.0
    assert (
        absorption_probability(chain, "purchase", drop="click").get(
            "view", 0.0
        )
        == 0.0
    )

    # half the views go straight to purchase, half via click
    mix = {
        ("view", "purchase"): 5,
        ("view", "click"): 5,
        ("click", "purchase"): 10,
    }
    assert abs(absorption_probability(mix, "purchase")["view"] - 1.0) < 1e-12
    p_drop = absorption_probability(mix, "purchase", drop="click")["view"]
    assert abs(p_drop - 0.5) < 1e-12


def test_simhash_exact_banding_lossless_at_boundary(spark):
    """dedup_simhash_exact's exactness claim is the pigeonhole lemma:
    4 chunks over 64 bits recover EVERY pair at hamming <= 3. Plant
    signature pairs at hamming exactly 3 (must be found even when the
    flipped bits straddle three different chunks) and at hamming 4
    spread across all four chunks (allowed to be missed by banding,
    and excluded by the <= 3 filter regardless), and check the banded
    candidate join against brute force over the signatures."""
    from pyspark.sql import functions as F

    base = 0x0123456789ABCDEF
    sigs = [
        (1, base),
        (2, base ^ (1 << 0) ^ (1 << 20) ^ (1 << 40)),  # d=3, 3 chunks
        (3, base ^ (1 << 5) ^ (1 << 6)),               # d=2, one chunk
        (4, base ^ (1 << 1) ^ (1 << 17) ^ (1 << 33) ^ (1 << 49)),  # d=4
    ]

    def to_i64(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    df = spark.createDataFrame(
        [(i, to_i64(s)) for i, s in sigs], "doc_id bigint, simhash bigint"
    )
    chunks = df.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk", "cc.val")
    a, b = chunks.alias("a"), chunks.alias("b")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in (
            a.join(
                b,
                (F.col("a.chunk") == F.col("b.chunk"))
                & (F.col("a.val") == F.col("b.val"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.bit_count(
                    F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
                ).alias("hamming"),
            )
            .distinct()
            .filter(F.col("hamming") <= 3)
            .collect()
        )
    }
    want = set()
    for i, (ia, sa) in enumerate(sigs):
        for ib, sb in sigs[i + 1 :]:
            if bin(sa ^ sb).count("1") <= 3:
                want.add((ia, ib))
    assert got == want
    assert (1, 2) in got  # the straddling d=3 pair was recovered
    assert (1, 4) not in got  # d=4 is outside the exact contract
