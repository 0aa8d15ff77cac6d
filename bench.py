#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Timing discipline (BASELINE.md notes): the session is created and
warmed (one trivial job) before any query is timed, so numbers are
steady-state job time, not JVM/session startup. Each query is forced
with a full collect() — the same materialization the driver's
correctness check performs.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "agg_pricing_summary",
    "tpch_q3",
    "tpch_q5",
    "tpch_q10",
    "join_broadcast",
    "win_topk_pergroup",
    "win_sessionize",
    "div_eval_edge",
    "div_eval_clique",
    "dedup_exact",
    "sim_search_topk",
    "div_gmm",
    "div_coreset_mr",
    "dedup_minhash",
    "text_stats",
    "tfidf",
]


def calibrate(spark, sf_dir: str) -> dict[str, float]:
    """In-process host-speed anchors (r7 verdict item 2).

    BENCH wall-seconds on this shared box drift uniformly ±35% round
    to round from external load (the r7 16.6 s vs r6 11.6 s
    adjudication); these anchors, timed in the SAME process right
    before the headline loop, let a reader normalize across rounds
    (report spark_total / anchor, not wall seconds — BASELINE.md
    "Drift normalization"). Three anchors, min-of-3 each:

    - numpy_matmul_sec: pure-CPU 1536^2 dgemm — raw core speed/steal,
      no JVM, no I/O;
    - duckdb_pricing_sec: the BASELINE.md headline query
      (agg_pricing_summary oracle) in DuckDB over the same parquet —
      the baseline engine's own speed today;
    - spark_range_agg_sec: a fixed 50M-row range groupBy in THIS
      session — the Spark runtime's job-execution speed today.
    """
    import numpy as np

    from diversity_maximization_spark import registry
    from diversity_maximization_spark.testing import duck_connection

    anchors: dict[str, float] = {}

    rng = np.random.RandomState(0)
    a = rng.rand(1536, 1536)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        b = a @ a
        best = min(best, time.perf_counter() - t0)
        del b
    anchors["numpy_matmul_sec"] = round(best, 4)

    con = duck_connection(sf_dir)
    sql = registry.ORACLES["agg_pricing_summary"]
    con.execute(sql).fetchall()  # warm (footer cache, JIT)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    anchors["duckdb_pricing_sec"] = round(best, 4)
    con.close()

    probe = spark.range(50_000_000)
    probe.groupBy((probe.id % 97).alias("g")).count().collect()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        probe.groupBy((probe.id % 97).alias("g")).count().collect()
        best = min(best, time.perf_counter() - t0)
    anchors["spark_range_agg_sec"] = round(best, 4)
    return anchors


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from diversity_maximization_spark.session import get_spark

    spark = get_spark()

    from diversity_maximization_spark import registry

    registry.load_all()

    # Warm the JVM (codegen + JIT paths for agg/sort/window), the
    # Python worker pool (Arrow serde), and the parquet footer cache —
    # BASELINE.md's budget is defined on steady-state job time, and
    # the first jobs of a session otherwise pay one-off JIT costs.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.createDataFrame(
        [(i, float(i), [float(i)] * 4) for i in range(1000)],
        "id bigint, v double, vec array<double>",
    )
    warm.groupBy((warm.id % 7).alias("g")).agg({"v": "sum"}).collect()
    warm.orderBy(warm.v.desc()).limit(3).collect()
    warm.mapInPandas(lambda it: it, "id bigint, v double, vec array<double>").count()
    warm.selectExpr(
        "aggregate(zip_with(vec, vec, (x, y) -> x * y), 0D, (s, t) -> s + t)"
    ).collect()
    # Parquet datasource init (Hadoop FS classes, footer reader, scan
    # codegen) is a one-off ~2-3 s cost paid by the first file scan of
    # the session; warm it on the 5-row region table so the first
    # timed query measures steady-state scan time.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).collect()

    load_before = os.getloadavg()
    anchors = calibrate(spark, sf_dir)

    # Three timed executions per query, min reported: this box shows
    # uniform +-35% run-to-run swings from external load, and
    # BASELINE.md's budget is defined on steady-state job time — the
    # min of warm runs is the low-noise estimator of that. All three
    # reps are kept so per-rep totals (noise spread) land in the JSON.
    times: dict[str, float] = {}
    reps: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = registry.QUERIES.get(name)
        if fn is None:
            continue
        try:
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                rows = fn(spark, sf_dir).collect()
                runs.append(time.perf_counter() - t0)
                del rows
            times[name] = round(min(runs), 3)
            reps[name] = [round(t, 3) for t in runs]
        except Exception as exc:  # keep benching the rest
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            times[name] = -1.0
    total = round(sum(t for t in times.values() if t >= 0), 3)
    rep_totals = [
        round(sum(r[i] for r in reps.values()), 3) for i in range(3)
    ]
    load_after = os.getloadavg()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf_val,
                # Drift normalization (r7 verdict item 2): compare
                # value / anchors across rounds, not wall seconds —
                # see BASELINE.md "Drift normalization".
                "anchors": anchors,
                "value_over_spark_anchor": round(
                    total / anchors["spark_range_agg_sec"], 2
                ),
                "rep_totals": rep_totals,
                "loadavg_before": [round(x, 2) for x in load_before],
                "loadavg_after": [round(x, 2) for x in load_after],
            }
        )
    )


if __name__ == "__main__":
    main()
