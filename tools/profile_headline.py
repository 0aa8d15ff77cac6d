#!/usr/bin/env python
"""Per-query phase profile of the headline queries (guide §1):
for each query, time (a) DataFrame construction (Python driver code,
incl. any driver-side algorithm work), (b) execution via collect()
(the bench's timed action), and report the number of Spark jobs each
phase launched (statusTracker). Three reps, min reported.

Usage: python tools/profile_headline.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    import bench
    from diversity_maximization_spark import registry
    from diversity_maximization_spark.session import get_spark

    names = sys.argv[1:] or bench.HEADLINE
    spark = get_spark()
    registry.load_all()

    # same warmup as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.createDataFrame(
        [(i, float(i), [float(i)] * 4) for i in range(1000)],
        "id bigint, v double, vec array<double>",
    )
    warm.groupBy((warm.id % 7).alias("g")).agg({"v": "sum"}).collect()
    warm.mapInPandas(lambda it: it, "id bigint, v double, vec array<double>").count()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).collect()

    tracker = spark.sparkContext.statusTracker()
    out: dict[str, dict] = {}
    for name in names:
        fn = registry.QUERIES[name]
        best = None
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"profile: {name}")
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            j1 = len(tracker.getJobIdsForGroup(None) or [])
            rows = df.collect()
            t2 = time.perf_counter()
            j2 = len(tracker.getJobIdsForGroup(None) or [])
            rec = {
                "construct_s": round(t1 - t0, 3),
                "collect_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "jobs_construct": j1 - j0,
                "jobs_collect": j2 - j1,
                "n_rows": len(rows),
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
        out[name] = best
        print(name, json.dumps(best), flush=True)
    spark.sparkContext.setJobDescription(None)
    print("TOTAL", round(sum(v["total_s"] for v in out.values()), 3))


if __name__ == "__main__":
    main()
