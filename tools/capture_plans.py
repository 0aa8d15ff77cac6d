#!/usr/bin/env python
"""Capture .explain("formatted") for queries into
plans/<round>/<query>_<tag>.txt (optimization-round evidence; the
judge checks plan claims against these files).

Usage: python tools/capture_plans.py <tag> [query ...]
  tag: "before" / "after" (file suffix)
  query: subset of registry keys (default: bench.HEADLINE)
Env: PLANS_OUT_DIR overrides the output directory (default plans/r11
of the repo the tool runs from).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from diversity_maximization_spark import registry
    from diversity_maximization_spark.session import get_spark

    names = sys.argv[2:] or bench.HEADLINE
    spark = get_spark()
    registry.load_all()

    out_dir = os.environ.get("PLANS_OUT_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11"
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"explain: {name}")
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} ({tag})\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
