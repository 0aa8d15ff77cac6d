"""Local mirror of the driver's correctness gate.

Runs every queries() entry at a given scale factor; where an oracle
exists, executes it in DuckDB over the same parquet and compares
row count, column names, and order-insensitive values (exact equality
after canonicalization). Usage:

    python tools/check.py [--sf 0.01] [key ...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from decimal import Decimal

sys.path.insert(0, ".")

import duckdb

from diversity_maximization_spark import registry
from diversity_maximization_spark.session import get_spark
from diversity_maximization_spark.sources import TABLES

registry.load_all()


def canon(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = tuple(canon(r[i]) for i in order)
        out.append(vals)
    out.sort(key=repr)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.01")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()
    sf_dir = f"/root/testdata/sf{args.sf}"

    spark = get_spark("dms-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    keys = args.keys or list(registry.QUERIES)
    n_pass = n_fail = n_rows_only = 0
    for key in keys:
        fn = registry.QUERIES[key]
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {key}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if key not in registry.ORACLES:
            print(f"rows  {key}: {len(srows)} rows ({dt:.1f}s) [no oracle]")
            n_rows_only += 1
            continue
        try:
            rel = con.sql(registry.ORACLES[key])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {key}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            sk, dk = rows_key(srows, scols), rows_key(drows, dcols)
            if sk != dk:
                bad = next(
                    (i, a, b) for i, (a, b) in enumerate(zip(sk, dk)) if a != b
                )
                problems.append(f"values differ, first at sorted idx {bad[0]}: spark={bad[1]!r} duck={bad[2]!r}")
        if problems:
            print(f"FAIL  {key}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {key}: {len(srows)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
