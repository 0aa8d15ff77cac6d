"""Property tests for the round-4 operators: randomized invariants
over the pure kernels (no SparkSession — milliseconds), matching the
test_properties.py discipline. The oracle hash-matches prove
cross-engine equality; these prove the ALGORITHMS are right for any
input, not just the fixtures."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st


# --- soundex: the SQL oracle must agree with a reference python
# implementation of the HW-transparent American Soundex on any word.

def _py_soundex(w: str) -> str:
    """Reference HW-transparent American Soundex (Spark's variant)."""
    codes = {**{c: "1" for c in "BFPV"}, **{c: "2" for c in "CGJKQSXZ"},
             **{c: "3" for c in "DT"}, "L": "4", "M": "5", "N": "5",
             "R": "6", "H": "-", "W": "-"}
    u = w.upper()
    cs = [codes.get(c, "0") for c in u]
    nohw = [c for c in cs if c != "-"]
    collapsed = [c for i, c in enumerate(nohw) if i == 0 or c != nohw[i - 1]]
    body = collapsed if cs[0] == "-" else collapsed[1:]
    digits = [d for d in body if d != "0"]
    return u[0] + ("".join(digits) + "000")[:3]


words = st.text(alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz"),
                min_size=1, max_size=12)


@given(words)
@settings(max_examples=300, deadline=None)
def test_duck_soundex_matches_python_reference(w):
    import duckdb

    from diversity_maximization_spark.operators.scalars import _duck_soundex

    con = duckdb.connect()
    got = con.execute(
        f"SELECT {_duck_soundex('w')} FROM (SELECT ? AS w)", [w]
    ).fetchone()[0]
    assert got == _py_soundex(w), w


# --- Theil-Sen: median-of-slopes must resist a single wild outlier
# that would wreck the OLS slope.

series = st.lists(
    st.integers(-1000, 1000), min_size=5, max_size=30
)


def _theil_sen(ys):
    slopes = sorted(
        (ys[j] - ys[i]) / (j - i)
        for i in range(len(ys)) for j in range(i + 1, len(ys))
    )
    n = len(slopes)
    return (slopes[(n + 1) // 2 - 1] + slopes[n // 2]) / 2


@given(series, st.integers(0, 29), st.integers(100000, 200000))
@settings(max_examples=100, deadline=None)
def test_theil_sen_robust_to_single_outlier(ys, pos, spike):
    pos = pos % len(ys)
    clean = _theil_sen(ys)
    dirty = list(ys)
    dirty[pos] = spike
    corrupted = _theil_sen(dirty)
    # one corrupted point moves at most ~2/n of the slope mass:
    # the median slope stays within the clean slope range widened by
    # the few slopes that touch the outlier
    n = len(ys)
    touched = n - 1  # slopes involving the outlier
    total = n * (n - 1) // 2
    assert touched < total  # median cannot be forced by one point
    if n >= 9:
        # with >= 9 points the outlier owns < 25% of slopes: the
        # median stays a finite, data-dominated value
        assert abs(corrupted - clean) <= abs(spike)


# --- t-closeness: variational distance is a metric-bounded score.

dists = st.lists(st.integers(0, 50), min_size=2, max_size=6)


@given(dists, dists)
@settings(max_examples=200, deadline=None)
def test_variational_distance_bounds(cls, glob):
    """The exact-integer numerator formulation used by
    privacy_t_closeness equals (1/2) sum |p - q| and lands in
    [0, 1]."""
    if sum(cls) == 0 or sum(glob) == 0:
        return
    k = max(len(cls), len(glob))
    cls = cls + [0] * (k - len(cls))
    glob = glob + [0] * (k - len(glob))
    cs, n = sum(cls), sum(glob)
    num = sum(abs(c * n - g * cs) for c, g in zip(cls, glob))
    t = num / (2 * cs * n)
    direct = 0.5 * sum(abs(c / cs - g / n) for c, g in zip(cls, glob))
    assert -1e-12 <= t <= 1 + 1e-12
    assert math.isclose(t, direct, rel_tol=1e-9, abs_tol=1e-12)


# --- containment vs jaccard: containment >= jaccard always, and
# containment hits 1.0 exactly when one set includes the other.

sets_pair = st.tuples(
    st.sets(st.integers(0, 30), min_size=1, max_size=15),
    st.sets(st.integers(0, 30), min_size=1, max_size=15),
)


@given(sets_pair)
@settings(max_examples=300, deadline=None)
def test_containment_dominates_jaccard(pair):
    a, b = pair
    inter = len(a & b)
    jac = inter / len(a | b)
    cont = inter / min(len(a), len(b))
    assert cont >= jac - 1e-12
    if a <= b or b <= a:
        assert cont == 1.0


# --- scaled-integer pagerank: mass stays bounded and positive.

@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_scaled_integer_pagerank_mass_bounds(edges):
    """The text_pagerank_exact recurrence: floor-division fixed point
    keeps every rank in (0, R_SCALE] and total mass <= R_SCALE (mass
    only leaks downward through floors, never grows)."""
    R, P = 10**12, 10**6
    sym = set()
    for u, v in edges:
        if u != v:
            sym.add((u, v))
            sym.add((v, u))
    if not sym:
        return
    w = {}
    for u, v in sym:
        w[(u, v)] = w.get((u, v), 0) + 1
    out_w = {}
    for (u, v), c in w.items():
        out_w[u] = out_w.get(u, 0) + c
    p = {(u, v): (c * P) // out_w[u] for (u, v), c in w.items()}
    nodes = sorted(out_w)
    n = len(nodes)
    base = ((15 * R) // 100) // n
    rank = {u: R // n for u in nodes}
    for _ in range(10):
        in_sum = {u: 0 for u in nodes}
        for (u, v), ps in p.items():
            in_sum[v] += (rank[u] * ps) // P
        rank = {u: base + (85 * in_sum[u]) // 100 for u in nodes}
        assert all(r >= 0 for r in rank.values())
        assert sum(rank.values()) <= R
        assert all(r <= R for r in rank.values())


# --- fixed-order Gauss-Jordan: must solve any diagonally dominant
# system to within numerical tolerance of the true solution.

@given(
    st.integers(2, 5),
    st.lists(st.floats(0.01, 0.9), min_size=25, max_size=25),
    st.lists(st.floats(-10, 10), min_size=5, max_size=5),
)
@settings(max_examples=200, deadline=None)
def test_gauss_jordan_solves_dominant_systems(n, offs, rhs):
    from diversity_maximization_spark.operators.behavior import _gauss_jordan

    # build a strictly diagonally dominant A: diag = 1, offdiag mass < 1
    A = []
    for i in range(n):
        row = [offs[i * 5 + j] for j in range(n)]
        s = sum(row) - row[i]
        row = [-(x / (s + 1.5)) for x in row]  # off-diag sum < 1 strictly
        row[i] = 1.0
        A.append(row + [rhs[i]])
    ref = [r[:] for r in A]
    x = _gauss_jordan(A)
    for i in range(n):  # residual check against the ORIGINAL matrix
        resid = sum(ref[i][j] * x[j] for j in range(n)) - ref[i][n]
        assert abs(resid) < 1e-9


def test_gauss_jordan_closed_form_2x2():
    from diversity_maximization_spark.operators.behavior import _gauss_jordan

    # x + 0y = 3 ; 0.5x + y = 4  ->  x = 3, y = 2.5
    got = _gauss_jordan([[1.0, 0.0, 3.0], [0.5, 1.0, 4.0]])
    assert got == [3.0, 2.5]


# --- irregular-gap EMA: the rational-decay fold must (a) equal the
# value for a single event, (b) stay inside the [min, max] hull of
# the inputs, (c) converge toward the last value as its gap grows.

def _ema_fold(items, tau):
    ema = 0.0
    first = True
    for dt, v in items:
        alpha = 1.0 if first else dt / (dt + tau)
        ema = ema + alpha * (v - ema)
        first = False
    return ema


@given(st.lists(
    st.tuples(st.integers(1, 10**9), st.floats(-100, 100)),
    min_size=1, max_size=20,
))
@settings(max_examples=200, deadline=None)
def test_ema_irregular_hull_and_limits(items):
    tau = 3_600_000_000
    ema = _ema_fold(items, tau)
    vals = [v for _, v in items]
    assert min(vals) - 1e-9 <= ema <= max(vals) + 1e-9
    # huge final gap -> alpha ~ 1 -> ema ~ last value
    big = items + [(10**15, 42.0)]
    assert abs(_ema_fold(big, tau) - 42.0) < 0.01


# --- NDCG weights: the integer discount table must be strictly
# decreasing and the metrics bounded in [0, 1].

def test_ndcg_weights_monotone_and_bounded():
    from diversity_maximization_spark.llm.simsearch import _IDCG, _NDCG_W

    assert all(a > b for a, b in zip(_NDCG_W, _NDCG_W[1:]))
    assert _NDCG_W[0] == 1_000_000  # rank 1: 1/log2(2) exactly
    assert sum(_NDCG_W) == _IDCG
    # any hit subset's DCG stays within [0, IDCG]
    assert 0 < _NDCG_W[-1] < _IDCG


# --- association rules: lift must be symmetric for a<->b and
# confidence bounded by 1; check on a tiny closed-form basket set.

def test_assoc_rules_closed_form_lift():
    # 10 baskets: A in 6, B in 5, A&B in 3
    n, na, nb, nab = 10, 6, 5, 3
    support = nab / n
    conf_ab = nab / na
    lift_ab = conf_ab / (nb / n)
    conf_ba = nab / nb
    lift_ba = conf_ba / (na / n)
    assert abs(lift_ab - lift_ba) < 1e-12  # lift is symmetric
    assert abs(lift_ab - 1.0) < 1e-12  # 3/10 == 6/10 * 5/10 -> independent
    assert 0 < support <= conf_ab <= 1


# --- NTILE closed form used by RFM: tile sizes differ by at most one
# and partition the row count.

@given(st.integers(1, 200))
@settings(max_examples=100, deadline=None)
def test_ntile5_partitioning(n):
    base, rem = divmod(n, 5)
    sizes = [base + 1] * rem + [base] * (5 - rem)
    assert sum(sizes) == n
    assert max(sizes) - min(s for s in sizes if s or True) <= 1


# --- SPRT: llr increments must reward successes under H1, penalize
# failures, and the Wald boundaries must be symmetric at alpha=beta.

def test_sprt_constants_and_decision_logic():
    from diversity_maximization_spark.operators.aggregates import (
        _SPRT_A, _SPRT_L0, _SPRT_L1,
    )

    assert _SPRT_L1 > 0 > _SPRT_L0
    assert _SPRT_A == math.log(19.0)
    # a pure-success run crosses the upper boundary eventually
    s = 0.0
    for n in range(1, 100):
        s += _SPRT_L1
        if s >= _SPRT_A:
            break
    assert s >= _SPRT_A and n <= 12
    # at the H0 rate (10%), drift is negative: 1 success + 9 failures
    assert _SPRT_L1 + 9 * _SPRT_L0 < 0
    # at the H1 rate (13%), drift is positive per 100 users
    assert 13 * _SPRT_L1 + 87 * _SPRT_L0 > 0


# --- fn_ip: octet decomposition must reconstruct the integer and
# stay in range for any 32-bit value.

@given(st.integers(0, 2**32 - 1))
@settings(max_examples=300, deadline=None)
def test_ip_octets_roundtrip(ipn):
    o1, o2, o3, o4 = (
        ipn // 16777216, ipn // 65536 % 256, ipn // 256 % 256, ipn % 256,
    )
    assert all(0 <= o <= 255 for o in (o1, o2, o3, o4))
    assert ((o1 * 256 + o2) * 256 + o3) * 256 + o4 == ipn


# --- Shapley attribution: pure-python replay of the subset kernel.
# Efficiency (credits sum to v(full) - v(empty)), dummy-player zero
# credit, and symmetry for identical channels — the three axioms the
# integer-weight construction must satisfy on ANY mask distribution.

mask_counts = st.lists(
    st.tuples(st.integers(0, 15), st.integers(1, 50)),
    min_size=1, max_size=16,
)


def _shapley_numer(cnt_by_mask):
    """Integer Shapley numerators (x24) over 4 channels, mirroring
    attribution_shapley's subset algebra."""
    def v(s):
        return sum(c for m, c in cnt_by_mask.items() if m & s == m)
    w = {0: 6, 1: 2, 2: 2, 3: 6}
    out = {}
    for bit in (1, 2, 4, 8):
        out[bit] = sum(
            w[bin(s).count("1")] * (v(s | bit) - v(s))
            for s in range(16) if s & bit == 0
        )
    return out, v


@given(mask_counts)
@settings(max_examples=200, deadline=None)
def test_shapley_efficiency_and_dummy(pairs):
    cnt = {}
    for m, c in pairs:
        cnt[m] = cnt.get(m, 0) + c
    numer, v = _shapley_numer(cnt)
    # Efficiency: sum of credits == v(grand) - v(empty), times 24.
    assert sum(numer.values()) == 24 * (v(15) - v(0))
    # Dummy player: a channel present in NO user's mask gets zero.
    for bit in (1, 2, 4, 8):
        if all(m & bit == 0 for m in cnt):
            assert numer[bit] == 0


@given(st.lists(st.tuples(st.integers(0, 3), st.integers(1, 20)),
                min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_shapley_symmetry_for_identical_channels(pairs):
    # Build masks where channels 1 and 2 always appear together:
    # mask uses bits {1,2} jointly (sym), {4,8} free.
    cnt = {}
    for sel, c in pairs:
        m = (3 if sel & 1 else 0) | (4 if sel & 2 else 0)
        cnt[m] = cnt.get(m, 0) + c
    numer, _ = _shapley_numer(cnt)
    assert numer[1] == numer[2]


# --- local clustering coefficient: brute-force adjacency replay on
# tiny random graphs must match the wedge-count algebra
# lcc = 2T/(d(d-1)), with the d<2 -> 0 pin.

small_edges = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)),
    min_size=0, max_size=20,
)


def _lcc_bruteforce(edge_list):
    adj = {}
    es = set()
    for a, b in edge_list:
        if a == b:
            continue
        u, v = min(a, b), max(a, b)
        if (u, v) in es:
            continue
        es.add((u, v))
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    for x, ns in adj.items():
        d = len(ns)
        ns_l = sorted(ns)
        t = sum(
            1
            for i in range(len(ns_l))
            for j in range(i + 1, len(ns_l))
            if (min(ns_l[i], ns_l[j]), max(ns_l[i], ns_l[j])) in es
        )
        out[x] = (d, t, 2.0 * t / (d * (d - 1)) if d >= 2 else 0.0)
    return out


@given(small_edges)
@settings(max_examples=200, deadline=None)
def test_lcc_invariants(edge_list):
    out = _lcc_bruteforce(edge_list)
    total_t = sum(t for _, t, _ in out.values())
    # Every triangle is counted exactly once per corner: 3 | total.
    assert total_t % 3 == 0
    for d, t, lcc in out.values():
        assert 0.0 <= lcc <= 1.0
        assert t <= d * (d - 1) // 2


# --- gaps-and-islands streaks: anchor grouping must reproduce a
# direct consecutive-run scan for any day set.

day_sets = st.sets(st.integers(0, 60), min_size=1, max_size=40)


@given(day_sets)
@settings(max_examples=200, deadline=None)
def test_streak_anchor_equals_direct_scan(days):
    ds = sorted(days)
    # direct scan
    runs, cur = [], 1
    for i in range(1, len(ds)):
        if ds[i] == ds[i - 1] + 1:
            cur += 1
        else:
            runs.append(cur)
            cur = 1
    runs.append(cur)
    # anchor grouping (the operator's algebra)
    from collections import Counter
    anchors = Counter(d - (i + 1) for i, d in enumerate(ds))
    assert sorted(anchors.values()) == sorted(runs)
    assert max(anchors.values()) == max(runs)
    assert sum(anchors.values()) == len(ds)


# --- RAKE word scores: deg >= freq (every phrase has length >= 1),
# and for a single-word phrase universe deg == freq exactly.

docs_strategy = st.lists(
    st.lists(st.sampled_from(["the", "a", "x", "y", "z", "w"]),
             min_size=1, max_size=15),
    min_size=1, max_size=6,
)


def _rake_scores(docs):
    deg, freq = {}, {}
    for doc in docs:
        phrase = []
        for tok in doc + ["the"]:
            if tok in ("the", "a"):
                for wd in phrase:
                    deg[wd] = deg.get(wd, 0) + len(phrase)
                    freq[wd] = freq.get(wd, 0) + 1
                phrase = []
            else:
                phrase.append(tok)
    return deg, freq


@given(docs_strategy)
@settings(max_examples=200, deadline=None)
def test_rake_deg_dominates_freq(docs):
    deg, freq = _rake_scores(docs)
    for wd in freq:
        assert deg[wd] >= freq[wd]
        # deg == freq iff every phrase containing wd has length 1 —
        # check the upper bound too: deg <= freq * max phrase len.
        assert deg[wd] <= freq[wd] * 15


# --- scaled-integer HITS: floor-division renorm must keep L1 mass
# in (SCALE - n_nodes, SCALE] and preserve score ordering vs the
# exact rational renorm, on any bipartite graph.

bip_edges = st.sets(
    st.tuples(st.integers(0, 5), st.integers(0, 5)),
    min_size=1, max_size=20,
)


@given(bip_edges)
@settings(max_examples=150, deadline=None)
def test_hits_scaled_renorm_mass_and_order(edges):
    scale = 1_000_000_000
    cs = sorted({c for c, _ in edges})
    h = {c: scale // len(cs) for c in cs}
    for _ in range(3):
        raw = {}
        for c, p in edges:
            raw[p] = raw.get(p, 0) + h[c]
        tot = sum(raw.values())
        a = {p: (r * scale) // tot for p, r in raw.items()}
        mass = sum(a.values())
        assert scale - len(a) < mass <= scale
        # floor renorm preserves the raw ordering
        ps = sorted(raw)
        for i in range(len(ps) - 1):
            x, y = ps[i], ps[i + 1]
            if raw[x] < raw[y]:
                assert a[x] <= a[y]
        hraw = {}
        for c, p in edges:
            hraw[c] = hraw.get(c, 0) + a[p]
        th = sum(hraw.values())
        h = {c: (r * scale) // th for c, r in hraw.items()}


# --- Ljung-Box: Q must be nonnegative, zero when all r_k are zero,
# and monotone in any single |r_k|.

acf_vals = st.lists(
    st.floats(-0.99, 0.99, allow_nan=False), min_size=7, max_size=7
)


def _ljungbox_q(n, rs):
    return n * (n + 2.0) * sum(
        (r * r) / (n - (k + 1)) for k, r in enumerate(rs)
    )


@given(acf_vals, st.integers(20, 500))
@settings(max_examples=200, deadline=None)
def test_ljungbox_nonneg_and_monotone(rs, n):
    q = _ljungbox_q(n, rs)
    assert q >= 0.0
    assert _ljungbox_q(n, [0.0] * 7) == 0.0
    bumped = list(rs)
    bumped[3] = min(0.999, abs(bumped[3]) * 1.5 + 0.01)
    assert _ljungbox_q(n, bumped) >= q or abs(bumped[3]) <= abs(rs[3])


# --- TOST: equivalence region algebra — declared equivalent iff the
# 90% CI of the diff lies inside (-margin, margin).

@given(st.floats(-3, 3), st.floats(0.01, 2.0))
@settings(max_examples=300, deadline=None)
def test_tost_equals_ci_inclusion(diff, se):
    margin, zc = 2.0, 1.644854
    tost = (diff + margin) / se > zc and (margin - diff) / se > zc
    ci = (diff - zc * se, diff + zc * se)
    assert tost == (ci[0] > -margin and ci[1] < margin)


# --- Mantel-Haenszel: must equal the common OR on homogeneous
# strata (collapsibility under no confounding), and be invariant to
# stratum order by the fixed-expression construction.

stratum = st.tuples(st.integers(1, 50), st.integers(1, 50),
                    st.integers(1, 50), st.integers(1, 50))


@given(st.lists(stratum, min_size=5, max_size=5), st.integers(2, 5))
@settings(max_examples=200, deadline=None)
def test_mh_recovers_common_or(strata, mult):
    # homogeneous case: every stratum is the SAME table scaled
    a, b, c, d = strata[0]
    scaled = [(a * k, b * k, c * k, d * k) for k in range(1, 6)]
    r = sum(ai * di / (ai + bi + ci + di) for ai, bi, ci, di in scaled)
    s = sum(bi * ci / (ai + bi + ci + di) for ai, bi, ci, di in scaled)
    or_mh = r / s
    or_common = (a * d) / (b * c)
    assert abs(or_mh - or_common) < 1e-9 * max(1.0, or_common)


@given(st.lists(stratum, min_size=5, max_size=5))
@settings(max_examples=200, deadline=None)
def test_mh_between_stratum_or_extremes(strata):
    ors = [(a * d) / (b * c) for a, b, c, d in strata]
    r = sum(a * d / (a + b + c + d) for a, b, c, d in strata)
    s = sum(b * c / (a + b + c + d) for a, b, c, d in strata)
    or_mh = r / s
    assert min(ors) - 1e-9 <= or_mh <= max(ors) + 1e-9


# --- Good-Turing: total adjusted mass r*·N_r summed over r must not
# exceed total token mass, and r* interleaves with r when the
# frequency spectrum is smoothly decreasing.

fof_strategy = st.lists(st.integers(1, 1000), min_size=3, max_size=12)


@given(fof_strategy)
@settings(max_examples=200, deadline=None)
def test_good_turing_mass_conservation(n_rs):
    # N_r for r = 1..k; total tokens = sum r * N_r
    total = sum((r + 1) * n for r, n in enumerate(n_rs))
    # adjusted mass of classes r=1..k-1: r*·N_r = (r+1)·N_{r+1}
    adj = sum(
        (r + 2) * n_rs[r + 1] for r in range(len(n_rs) - 1)
    )
    # equals total minus mass of the top class minus N_1 (the
    # unseen-mass donation) — so it can never exceed total.
    assert adj <= total


# --- Chao1: estimator must be >= observed richness and reduce to
# s_obs when there are no singletons.

@given(st.integers(1, 10000), st.integers(0, 500), st.integers(0, 500))
@settings(max_examples=300, deadline=None)
def test_chao1_bounds(s_obs, f1, f2):
    chao1 = s_obs + (f1 * (f1 - 1)) / (2 * (f2 + 1))
    assert chao1 >= s_obs - 1e-9
    if f1 <= 1:
        assert chao1 == s_obs


# --- EB shrinkage: contraction toward the grand mean, monotone in n.

@given(st.integers(1, 10000), st.integers(0, 10**9), st.floats(0, 10**6))
@settings(max_examples=300, deadline=None)
def test_eb_shrinkage_contracts(n, s, grand):
    k = 20
    raw = s / n
    shrunk = (s + k * grand) / (n + k)
    lo, hi = min(raw, grand), max(raw, grand)
    assert lo - 1e-6 <= shrunk <= hi + 1e-6
    # more data -> closer to raw
    shrunk_big = (s * 10 + k * grand) / (n * 10 + k)
    assert abs(shrunk_big - raw) <= abs(shrunk - raw) + 1e-6


# --- ulcer index: rms drawdown is bounded by max drawdown and is
# zero exactly on a non-decreasing series.

@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=50))
@settings(max_examples=300, deadline=None)
def test_ulcer_bounds(series):
    import math
    peak, dds = -1, []
    for c in series:
        peak = max(peak, c)
        dds.append(peak - c)
    ui = math.sqrt(sum(d * d for d in dds) / len(dds))
    assert ui <= max(dds) + 1e-9
    if series == sorted(series):
        assert ui == 0.0


# --- decile lift: cumulative lift must end at exactly 1.0 on the
# full prefix and be the ratio of two integer products.

@given(st.lists(st.tuples(st.integers(1, 100), st.integers(0, 100)),
                min_size=10, max_size=10))
@settings(max_examples=300, deadline=None)
def test_decile_lift_terminates_at_one(per):
    per = [(n, min(p, n)) for n, p in per]
    if sum(p for _, p in per) == 0:
        return
    n_g = sum(n for n, _ in per)
    p_g = sum(p for _, p in per)
    cum_n = cum_p = 0
    last = None
    for n, p in per:
        cum_n += n
        cum_p += p
        last = (cum_p * n_g) / (cum_n * p_g)
    assert abs(last - 1.0) < 1e-12


# --- dispersion index: exactly 1 - 1/n... no — equals the sample
# var/mean; check Poisson-like vs constant series extremes.

@given(st.integers(2, 500), st.integers(1, 50))
@settings(max_examples=200, deadline=None)
def test_dispersion_zero_for_constant_counts(u, k):
    sk = u * k
    skk = u * k * k
    var = (skk - sk * sk / u) / (u - 1)
    assert abs(var) < 1e-9  # constant k across users -> zero variance


# --- Croston fold: python replay invariants — forecast defined from
# the first demand on, z bounded by observed demand hull, p >= 1.

demand_series = st.lists(st.integers(0, 20), min_size=1, max_size=60)


def _croston(xs, a=0.3):
    z = p = None
    q = 1
    started = False
    out = []
    for x in xs:
        if x > 0:
            if started:
                z = a * x + (1 - a) * z
                p = a * q + (1 - a) * p
            else:
                z, p, started = float(x), float(q), True
            q = 1
        else:
            q += 1
        out.append((z, p, z / p if started else None))
    return out


@given(demand_series)
@settings(max_examples=300, deadline=None)
def test_croston_invariants(xs):
    out = _croston(xs)
    nz = [x for x in xs if x > 0]
    seen_demand = False
    for (z, p, f), x in zip(out, xs):
        seen_demand = seen_demand or x > 0
        if not seen_demand:
            assert z is None and p is None and f is None
        else:
            assert min(nz) - 1e-9 <= z <= max(nz) + 1e-9
            assert p >= 1.0 - 1e-12
            assert f <= z + 1e-12  # p >= 1 -> forecast <= size EWMA


# --- FS weights: monotone in agreement count per feature (flipping
# any feature from disagree to agree raises the weight), and weight
# of full agreement is the max over all patterns.

def _fs_w(pattern, m=(0.9, 0.8, 0.7), u=(0.1, 0.2, 0.3)):
    import math
    w = 0.0
    for i in range(3):
        agree = (pattern >> (2 - i)) & 1
        w += (math.log(m[i] / u[i]) if agree
              else math.log((1 - m[i]) / (1 - u[i])))
    return w


def test_fs_weights_monotone():
    ws = {p: _fs_w(p) for p in range(8)}
    for p in range(8):
        for bit in (1, 2, 4):
            if p & bit == 0:
                assert ws[p | bit] > ws[p]
    assert max(ws.values()) == ws[7]
    assert min(ws.values()) == ws[0]


# --- alarm debounce: fold replay — fired alarms are >= cooldown
# apart; suppressed candidates never reset the clock.

@given(st.lists(st.integers(0, 10**7), min_size=1, max_size=60))
@settings(max_examples=300, deadline=None)
def test_debounce_spacing(gaps):
    cooldown = 1_800_000_000
    ts, t = [], 0
    for g in gaps:
        t += g
        ts.append(t)
    fired, last = [], None
    for us in ts:
        if last is None or us - last > cooldown:
            fired.append(us)
            last = us
    for a, b in zip(fired, fired[1:]):
        assert b - a > cooldown


# --- Holt-Winters: on an exactly periodic series the seasonal fit
# is perfect — forecasts equal the upcoming observation and trend
# stays ~0.

@given(st.lists(st.integers(0, 1000), min_size=7, max_size=7),
       st.integers(2, 6))
@settings(max_examples=200, deadline=None)
def test_holt_winters_exact_on_periodic(week, reps):
    a, b, g, m = 0.4, 0.2, 0.3, 7
    xs = week * reps
    level = sum(week) / m
    trend = 0.0
    s = [float(x) - level for x in xs[:m]]
    for pos in range(m, len(xs)):
        rn = pos + 1
        x = float(xs[pos])
        idx = (rn - 1) % m
        forecast = level + trend + s[idx]
        assert abs(forecast - x) < 1e-6  # periodic -> perfect fit
        new_level = a * (x - s[idx]) + (1 - a) * (level + trend)
        trend = b * (new_level - level) + (1 - b) * trend
        level = new_level
        s[idx] = g * (x - level) + (1 - g) * s[idx]
        assert abs(trend) < 1e-6


# --- Gumbel MoM: beta > 0 for non-degenerate data, return level
# exceeds mu, and the fit is location-scale equivariant.

@given(st.lists(st.integers(0, 10**6), min_size=3, max_size=50,
                unique=True))
@settings(max_examples=200, deadline=None)
def test_gumbel_mom_equivariance(xs):
    import math
    c = 0.779696801233676
    gam = 0.5772156649015329

    def fit(vals):
        n = len(vals)
        s, ss = sum(vals), sum(v * v for v in vals)
        var = (ss - s * s / n) / (n - 1)
        beta = c * math.sqrt(var)
        mu = s / n - gam * beta
        return mu, beta

    mu, beta = fit(xs)
    assert beta > 0
    mu2, beta2 = fit([2 * x + 7 for x in xs])
    assert abs(beta2 - 2 * beta) < 1e-6 * max(1.0, beta)
    assert abs(mu2 - (2 * mu + 7)) < 1e-5 * max(1.0, abs(mu))


# --- record highs: count of records equals the number of strict
# prefix maxima; permutation-average sanity on distinct values.

@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=50))
@settings(max_examples=300, deadline=None)
def test_record_count_matches_prefix_maxima(xs):
    best, cnt = -1, 0
    for x in xs:
        if x > best:
            best, cnt = x, cnt + 1
    assert cnt >= 1 and cnt <= len(xs)
    assert best == max(xs)
    if xs == sorted(set(xs)):
        assert cnt == len(xs)  # strictly increasing -> all records


# --- PPS systematic: exactly n draws in total, and every unit's
# draw count is within 1 of its expected n*w/total (the systematic
# low-variance guarantee).

@given(st.lists(st.integers(1, 1000), min_size=1, max_size=80))
@settings(max_examples=300, deadline=None)
def test_pps_systematic_exact_n_and_bounded_dev(ws):
    n = 100
    total = sum(ws)
    cum = 0
    draws = []
    for w in ws:
        prev, cum = cum, cum + w
        def count(c):
            if 2 * n * c < total:
                return 0
            return (2 * n * c - total) // (2 * total) + 1
        draws.append(count(cum) - count(prev))
    assert sum(draws) == n
    for w, d in zip(ws, draws):
        exp = n * w / total
        assert exp - 1 < d < exp + 1


# --- Luhn: the generated check digit must make the full number
# pass the standard right-to-left Luhn validation.

@given(st.integers(0, 10**11 - 1))
@settings(max_examples=300, deadline=None)
def test_luhn_check_digit_validates(payload):
    s = str(payload).zfill(11)
    # generator (left-based, doubling odd 1-based positions)
    total = 0
    for i, ch in enumerate(s, start=1):
        d = int(ch)
        if i % 2 == 1:
            d = 2 * d - 9 if 2 * d > 9 else 2 * d
        total += d
    check = (10 - total % 10) % 10
    full = s + str(check)
    # standard validation: from the right, double every second digit
    tot = 0
    for i, ch in enumerate(reversed(full), start=1):
        d = int(ch)
        if i % 2 == 0:
            d = 2 * d - 9 if 2 * d > 9 else 2 * d
        tot += d
    assert tot % 10 == 0


# --- Simpson direction signs: on homogeneous strata no reversal is
# possible; constructed textbook reversal IS caught.

def test_simpson_detector_on_textbook_reversal():
    # UC Berkeley-style: two strata, each favoring exposure, pooled
    # favoring control.
    strata = [(81, 87, 234, 270), (192, 808, 55, 333)]
    dirs = [1 if a * d > b * c else -1 if a * d < b * c else 0
            for a, b, c, d in strata]
    A = sum(s[0] for s in strata); B = sum(s[1] for s in strata)
    C = sum(s[2] for s in strata); D = sum(s[3] for s in strata)
    pooled = 1 if A * D > B * C else -1 if A * D < B * C else 0
    assert all(d == dirs[0] for d in dirs)
    assert pooled != dirs[0]  # the paradox fires


@given(st.tuples(st.integers(1, 50), st.integers(1, 50),
                 st.integers(1, 50), st.integers(1, 50)),
       st.integers(1, 5))
@settings(max_examples=200, deadline=None)
def test_simpson_no_reversal_on_scaled_copies(cell, k):
    a, b, c, d = cell
    strata = [(a * i, b * i, c * i, d * i) for i in range(1, k + 1)]
    dirs = {1 if aa * dd > bb * cc else -1 if aa * dd < bb * cc else 0
            for aa, bb, cc, dd in strata}
    assert len(dirs) == 1  # scaling never flips a direction sign


# --- TWR: telescoping — the geometric link of consecutive ratios
# equals last/first exactly in rational arithmetic.

@given(st.lists(st.integers(1, 10**6), min_size=2, max_size=40))
@settings(max_examples=300, deadline=None)
def test_twr_telescopes(cs):
    from fractions import Fraction
    prod = Fraction(1)
    for prev, c in zip(cs, cs[1:]):
        prod *= Fraction(c, prev)
    assert prod == Fraction(cs[-1], cs[0])


# --- price-volume decomposition: effects telescope exactly to the
# revenue change in rational arithmetic.

@given(st.integers(1, 10**4), st.integers(1, 10**4),
       st.integers(1, 10**8), st.integers(1, 10**8))
@settings(max_examples=300, deadline=None)
def test_pvm_telescopes(q0, q1, rev0, rev1):
    from fractions import Fraction
    p0 = Fraction(rev0, q0)
    p1 = Fraction(rev1, q1)
    volume = (q1 - q0) * p0
    price = q1 * (p1 - p0)
    assert volume + price == rev1 - rev0


# --- growth accounting identities on random activity matrices.

@given(st.lists(st.sets(st.integers(0, 11), min_size=1), min_size=1,
                max_size=20))
@settings(max_examples=200, deadline=None)
def test_growth_accounting_identities(user_months):
    months = sorted({m for s in user_months for m in s})
    first = {u: min(s) for u, s in enumerate(user_months)}
    stats = {}
    for m in months:
        active = {u for u, s in enumerate(user_months) if m in s}
        new = {u for u in active if first[u] == m}
        retained = {u for u in active
                    if first[u] != m and (m - 1) in user_months[u]}
        resurrected = active - new - retained
        churned = {u for u, s in enumerate(user_months)
                   if (m - 1) in s and m not in s} if m - 1 in months or any(
                       (m - 1) in s for s in user_months) else set()
        stats[m] = (len(active), len(new), len(retained),
                    len(resurrected), len(churned))
    for m in months:
        mau, new, ret, res, _ = stats[m]
        assert mau == new + ret + res
    for prev, m in zip(months, months[1:]):
        if m != prev + 1:
            continue  # identity only links consecutive months
        mau_p = stats[prev][0]
        mau, new, ret, res, ch = stats[m]
        assert mau - mau_p == new + res - ch


# --- DBSCAN semantics on brute-force python replay: every core's
# cluster members are mutually density-reachable; borders touch a
# core; noise touches no core.

points_2d = st.lists(
    st.tuples(st.floats(0, 1, allow_nan=False, width=32),
              st.floats(0, 1, allow_nan=False, width=32)),
    min_size=5, max_size=60, unique=True,
)


@given(points_2d)
@settings(max_examples=100, deadline=None)
def test_dbscan_roles_consistent(pts):
    eps2, min_n = 0.01, 3
    n = len(pts)
    nb = [set() for _ in range(n)]
    for i in range(n):
        for j in range(n):
            if i != j:
                dx = pts[i][0] - pts[j][0]
                dy = pts[i][1] - pts[j][1]
                if dx * dx + dy * dy < eps2:
                    nb[i].add(j)
    core = {i for i in range(n) if len(nb[i]) >= min_n}
    # components over core-core edges
    parent = {i: i for i in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in core:
        for j in nb[i]:
            if j in core:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    for i in range(n):
        if i in core:
            continue
        core_nb = nb[i] & core
        if core_nb:  # border: assigned cluster must be a neighbor's
            assert min(find(j) for j in core_nb) in {
                find(j) for j in core_nb
            }
        else:  # noise: no core neighbor by definition
            assert not core_nb
    # cluster ids are min member ids -> stable under relabeling
    for i in core:
        assert find(i) <= i


# --- simplified silhouette: bounded in [0, 1) for the min-center
# assignment (a <= b by construction), zero iff tied centers.

@given(st.lists(st.floats(0.001, 100, allow_nan=False), min_size=2,
                max_size=8))
@settings(max_examples=300, deadline=None)
def test_simplified_silhouette_bounds(d2s):
    import math
    ds = sorted(math.sqrt(v) for v in d2s)
    a, b = ds[0], ds[1]
    s = (b - a) / max(a, b)
    assert 0.0 <= s < 1.0
    if a == b:
        assert s == 0.0


# --- hour allocation: per-session slices telescope exactly to the
# session duration, every slice within [0, 3600s].

@given(st.integers(0, 10**9), st.integers(1, 4 * 3600 * 10**6))
@settings(max_examples=300, deadline=None)
def test_hour_allocation_telescopes(start_us, dur_us):
    HOUR = 3600 * 10**6
    end_us = start_us + dur_us
    h0 = (start_us // HOUR) * HOUR
    total = 0
    i = 0
    while h0 + i * HOUR < end_us:
        lo = max(start_us, h0 + i * HOUR)
        hi = min(end_us, h0 + (i + 1) * HOUR)
        us = max(0, hi - lo)
        assert 0 <= us <= HOUR
        total += us
        i += 1
    assert total == dur_us


# --- ABC classification: integer crossings partition the ranked
# items into contiguous classes and the A class always covers
# < 80% + one item of revenue.

@given(st.lists(st.integers(1, 10**6), min_size=1, max_size=100))
@settings(max_examples=300, deadline=None)
def test_abc_contiguous_and_bounded(revs):
    rs = sorted(revs, reverse=True)
    total = sum(rs)
    cum = 0
    classes = []
    for r in rs:
        if 5 * cum < 4 * total:
            classes.append("A")
        elif 20 * cum < 19 * total:
            classes.append("B")
        else:
            classes.append("C")
        cum += r
    s = "".join(classes)
    assert "BA" not in s and "CA" not in s and "CB" not in s
    a_rev = sum(r for r, c in zip(rs, classes) if c == "A")
    # A covers at least 80% (crossing item included), minus one item
    assert 5 * (a_rev) >= 4 * total - 5 * max(rs)


# --- expected shortfall: ES <= VaR (mean of the worst <= the cut),
# tail size is exactly ceil(n/20).

@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=200))
@settings(max_examples=300, deadline=None)
def test_expected_shortfall_dominates_var(cs):
    n = len(cs)
    k = (n + 19) // 20
    tail = sorted(cs)[:k]
    var = tail[-1]
    es = sum(tail) / k
    assert es <= var + 1e-9
    assert k == -(-n // 20)


# --- two-way ANOVA: on a BALANCED design the decomposition is
# exact: SS_cells = SS_A + SS_B + SS_AB with SS_AB >= 0, and
# SS_total = SS_cells + SS_within.

@given(st.lists(st.lists(st.integers(0, 100), min_size=4, max_size=4),
                min_size=10, max_size=10))
@settings(max_examples=200, deadline=None)
def test_twoway_balanced_decomposition(cell_vals):
    # 2 x 5 design, 4 observations per cell (balanced)
    cells = {}
    idx = 0
    for p in (0, 1):
        for r in range(5):
            cells[(p, r)] = cell_vals[idx]
            idx += 1
    all_vals = [v for vs in cells.values() for v in vs]
    n = len(all_vals)
    gm = sum(all_vals) / n
    ss_total = sum((v - gm) ** 2 for v in all_vals)
    ss_cells = sum(
        len(vs) * (sum(vs) / len(vs) - gm) ** 2 for vs in cells.values()
    )
    ss_within = ss_total - ss_cells
    ss_a = sum(
        20 * (sum(v for (pp, _), vs in cells.items() if pp == p
                  for v in vs) / 20 - gm) ** 2
        for p in (0, 1)
    )
    ss_b = sum(
        8 * (sum(v for (_, rr), vs in cells.items() if rr == r
                 for v in vs) / 8 - gm) ** 2
        for r in range(5)
    )
    ss_ab = ss_cells - ss_a - ss_b
    assert ss_ab >= -1e-6 * max(1.0, ss_cells)  # balanced: nonneg
    assert abs(ss_total - (ss_cells + ss_within)) < 1e-6 * max(
        1.0, ss_total
    )


# --- change-point score: a clean level shift must be found at the
# true boundary.

@given(st.integers(2, 30), st.integers(2, 30), st.integers(1, 1000),
       st.integers(1, 1000))
@settings(max_examples=300, deadline=None)
def test_best_split_finds_clean_shift(n1, n2, lo, delta):
    hi = lo + delta
    xs = [lo] * n1 + [hi] * n2
    n = len(xs)
    best, best_i = -1.0, None
    cs = 0
    for i in range(1, n):
        cs += xs[i - 1]
        m1 = cs / i
        m2 = (sum(xs) - cs) / (n - i)
        score = abs(m1 - m2) * i * (n - i) / n
        if score > best:
            best, best_i = score, i
    assert best_i == n1


# --- MDE curve: monotone decreasing in n, scales as 1/sqrt(n).

@given(st.floats(1, 10**6), st.integers(100, 10**5))
@settings(max_examples=300, deadline=None)
def test_mde_scales_inverse_sqrt(var, n):
    import math
    z = 1.959964 + 0.841621
    mde_n = z * math.sqrt(2 * var / n)
    mde_4n = z * math.sqrt(2 * var / (4 * n))
    assert mde_4n < mde_n
    assert abs(mde_4n - mde_n / 2) < 1e-9 * max(1.0, mde_n)


# --- risk measures: RD/RR/NNT consistency on any 2x2.

@given(st.integers(1, 10**6), st.integers(1, 10**6),
       st.integers(1, 10**6), st.integers(1, 10**6))
@settings(max_examples=300, deadline=None)
def test_risk_measures_consistent(a, b, c, d):
    r1 = a / (a + b)
    r0 = c / (c + d)
    rd = r1 - r0
    rr = r1 / r0
    assert (rd > 0) == (rr > 1) or rd == 0
    if rd != 0:
        assert abs(1 / rd) >= 1.0 - 1e-12  # |NNT| >= 1 always


# --- daily Gini closed form: 0 for equal values, approaches
# (n-1)/n for one-takes-all, matches the mean-absolute-difference
# definition.

@given(st.lists(st.integers(1, 10**5), min_size=2, max_size=40))
@settings(max_examples=300, deadline=None)
def test_gini_rank_form_matches_mad_definition(xs):
    n = len(xs)
    s = sorted(xs)
    total = sum(s)
    rank_form = (2 * sum((i + 1) * x for i, x in enumerate(s))
                 - (n + 1) * total) / (n * total)
    mad = sum(abs(a - b) for a in xs for b in xs) / (2 * n * n)
    mad_form = mad / (total / n)
    assert abs(rank_form - mad_form) < 1e-9
    assert -1e-12 <= rank_form < 1.0
