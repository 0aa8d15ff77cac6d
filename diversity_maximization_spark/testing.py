"""Shared test/check utilities: the oracle comparison the driver runs
(row count + column set + order-insensitive canonical values)."""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

from .sources import TABLES


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
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare(sdf, con, sql: str) -> list[str]:
    """Return a list of problems (empty = match, driver-style)."""
    scols, srows = sdf.columns, sdf.collect()
    rel = con.sql(sql)
    dcols, drows = rel.columns, rel.fetchall()
    problems = []
    if len(srows) != len(drows):
        problems.append(f"rowcount {len(srows)} vs {len(drows)}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"columns {sorted(scols)} vs {sorted(dcols)}")
    if not problems:
        sk, dk = rows_key(srows, scols), rows_key(drows, dcols)
        if sk != dk:
            i, a, b = next(
                (i, a, b) for i, (a, b) in enumerate(zip(sk, dk)) if a != b
            )
            problems.append(f"values differ at sorted idx {i}: spark={a!r} duck={b!r}")
    return problems
