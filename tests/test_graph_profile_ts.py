"""Property tests for the round-3 additions: triangle counting
(vs brute force), EWMA (vs pandas ewm), passage dedup (the planted
boilerplate must fire), and the column profiler (vs direct pandas)."""

from itertools import combinations

import pandas as pd

from diversity_maximization_spark import registry


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    row = registry.QUERIES["graph_triangle_count"](spark, sf_dir).collect()[0]

    li = (
        pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
            ["l_orderkey", "l_partkey"]
        ]
        .drop_duplicates()
        .groupby("l_orderkey")["l_partkey"]
        .apply(sorted)
    )
    edges = set()
    for parts in li:
        for a, b in combinations(parts, 2):
            if a != b:
                edges.add((min(a, b), max(a, b)))
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = 0
    for a, b in edges:
        tri += len(adj[a] & adj[b])
    assert row["n_edges"] == len(edges)
    assert row["n_vertices"] == len(adj)
    assert row["n_triangles"] == tri // 3  # each triangle seen from 3 edges


def test_degree_stats_sums_to_vertices(spark, sf_dir):
    deg = registry.QUERIES["graph_degree_stats"](spark, sf_dir).collect()
    tri = registry.QUERIES["graph_triangle_count"](spark, sf_dir).collect()[0]
    assert sum(r["n_vertices"] for r in deg) == tri["n_vertices"]
    # handshake lemma: sum(degree * count) == 2 |E|
    assert sum(r["degree"] * r["n_vertices"] for r in deg) == 2 * tri["n_edges"]


def test_ewma_matches_pandas_ewm(spark, sf_dir):
    out = (
        registry.QUERIES["ts_ewma"](spark, sf_dir)
        .toPandas()
        .set_index("event_id")["ewma"]
    )
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["ts", "event_id"]
    )
    # pandas ewm(adjust=False) is exactly the a*x + (1-a)*acc recurrence
    expect = (
        ev.groupby("user_id")["value"]
        .transform(lambda s: s.ewm(alpha=0.3, adjust=False).mean())
    )
    expect.index = ev["event_id"]
    joined = pd.DataFrame({"got": out, "want": expect})
    assert len(joined) == len(ev)
    assert (joined["got"] - joined["want"]).abs().max() < 1e-9


def test_dedup_passage_planted_boilerplate_fires(spark, sf_dir):
    rows = registry.QUERIES["dedup_passage"](spark, sf_dir).collect()
    planted = [r for r in rows if r["doc_id"] % 3 == 0]
    assert planted, "fixture must contain doc_id % 3 == 0 docs"
    # the 20-word boilerplate contains 6 fully-interior 15-grams shared
    # by every planted doc (boundary-spanning grams differ per doc)
    assert all(r["n_dup_passages"] >= 6 for r in planted)
    for r in rows:
        assert 0.0 <= r["dup_frac"] <= 1.0
        assert r["n_dup_passages"] <= r["n_passages"]


def test_profile_columns_vs_pandas(spark, sf_dir):
    prof = {
        r["column_name"]: r
        for r in registry.QUERIES["profile_columns"](spark, sf_dir).collect()
    }
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    assert set(prof) == set(o.columns)
    for c in o.columns:
        assert prof[c]["n_nulls"] == int(o[c].isna().sum())
        assert prof[c]["n_distinct"] == int(o[c].dropna().nunique())
    assert prof["o_totalprice"]["min_num"] == float(o["o_totalprice"].min())
    assert prof["o_totalprice"]["max_num"] == float(o["o_totalprice"].max())


def test_kcore_matches_local_peeling(spark, sf_dir):
    from diversity_maximization_spark.operators.graph import (
        KCORE_K,
        _copurchase_edges,
    )

    got = {
        r["node"]: r["core_degree"]
        for r in registry.QUERIES["graph_kcore"](spark, sf_dir).collect()
    }
    edges = {
        (r["u"], r["v"]) for r in _copurchase_edges(spark, sf_dir).collect()
    }
    # local peeling replay
    while True:
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {x for x, d in deg.items() if d >= KCORE_K}
        nxt = {(a, b) for a, b in edges if a in keep and b in keep}
        if nxt == edges:
            break
        edges = nxt
    want: dict[int, int] = {}
    for a, b in edges:
        want[a] = want.get(a, 0) + 1
        want[b] = want.get(b, 0) + 1
    assert got == want
    # every member really has core degree >= k
    assert all(d >= KCORE_K for d in got.values()) or not got


def test_lpa_matches_python_replay(spark, sf_dir):
    """graph_lpa_communities must equal a pure-python synchronous
    replay of the same deterministic rule (most frequent neighbor
    label, ties to smallest, LPA_ROUNDS rounds) on the same edges."""
    from collections import Counter

    from diversity_maximization_spark.operators.graph import (
        LPA_ROUNDS,
        _copurchase_edges,
    )
    from diversity_maximization_spark.registry import QUERIES

    edges = [
        (r["u"], r["v"])
        for r in _copurchase_edges(spark, sf_dir).collect()
    ]
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    lbl = {n: n for n in adj}
    for _ in range(LPA_ROUNDS):
        new = {}
        for n, nbrs in adj.items():
            c = Counter(lbl[m] for m in nbrs)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        lbl = new
    got = {
        r["node"]: r["community"]
        for r in QUERIES["graph_lpa_communities"](spark, sf_dir).collect()
    }
    assert got == lbl


def test_lttb_matches_numpy_replay(spark, sf_dir):
    """ts_downsample_lttb must equal a direct numpy replay per series
    (same bucket bounds, same tie-to-first argmax) and keep both
    endpoints."""
    import numpy as np

    from diversity_maximization_spark.operators.timeseries import (
        LTTB_BUCKETS,
        lttb_indices,
    )
    from diversity_maximization_spark.registry import QUERIES
    from diversity_maximization_spark.sources import load
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.sum(
                F.expr("CAST(ROUND(value * 100) AS BIGINT)")
            ).alias("c")
        )
        .collect()
    )
    series: dict = {}
    for r in hourly:
        series.setdefault(r["event_type"], []).append((r["h"], r["c"]))
    got: dict = {}
    for r in QUERIES["ts_downsample_lttb"](spark, sf_dir).collect():
        got.setdefault(r["event_type"], []).append(
            (r["pos"], r["hour"], r["revenue"])
        )
    for et, pts in series.items():
        pts.sort()
        # Same series-relative integer-microsecond convention as the
        # engine kernel (exact float64 operands, see ds() docstring).
        xs = [int(p[0].timestamp() * 1e6) for p in pts]
        x = np.array([v - xs[0] for v in xs], dtype=np.float64)
        y = np.array([p[1] for p in pts], dtype=np.float64)
        idx = lttb_indices(x, y, LTTB_BUCKETS)
        want = [
            (i, pts[j][0], pts[j][1] / 100.0)
            for i, j in enumerate(idx)
        ]
        assert sorted(got[et]) == want, et
        assert idx[0] == 0 and idx[-1] == len(pts) - 1
