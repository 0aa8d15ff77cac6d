"""Spark-side time profile of EVERY registry key (guide §1).

The correctness sweeps conflate Spark time with DuckDB-oracle replay
time, so they cannot rank engine cost. This tool times, per key, (a)
DataFrame construction (driver code incl. any eager algorithm work —
for several operators the real work happens here) and (b) execution
through the noop sink (computes every column of every row, discards
the result — guide §1.4), in ONE warm session, and emits a JSON list
sorted by total seconds descending. One rep per key by design: the
purpose is ranking the multi-second tail for optimization, not
benchmarking (bench.py is the benchmark).

    python tools/profile_sweep.py [--sf 0.01] [--json-out F] [key ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

from diversity_maximization_spark import registry
from diversity_maximization_spark.session import get_spark

registry.load_all()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.01")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()
    sf_dir = f"/root/testdata/sf{args.sf}"

    spark = get_spark("dms-profile-sweep")
    keys = args.keys or list(registry.QUERIES)
    out = []
    for i, key in enumerate(keys):
        fn = registry.QUERIES[key]
        spark.sparkContext.setJobDescription(f"profile:{key}")
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            t1 = time.time()
            sdf.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            rec = {
                "key": key,
                "construct_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
            }
        except Exception as exc:  # noqa: BLE001 - ranking tool, keep going
            rec = {"key": key, "error": f"{type(exc).__name__}: {exc}"[:200]}
        out.append(rec)
        print(f"[{i + 1}/{len(keys)}] {json.dumps(rec)}", flush=True)

    ranked = sorted(
        (r for r in out if "total_s" in r), key=lambda r: -r["total_s"]
    )
    print("\n=== top 40 by total Spark-side seconds ===")
    for r in ranked[:40]:
        print(
            f"{r['total_s']:8.2f}s  (c {r['construct_s']:.2f} + e "
            f"{r['exec_s']:.2f})  {r['key']}"
        )
    errs = [r for r in out if "error" in r]
    if errs:
        print(f"\n{len(errs)} errors:")
        for r in errs:
            print(f"  {r['key']}: {r['error']}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
