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
