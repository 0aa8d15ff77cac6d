"""Shared test/check utilities: the oracle comparison the driver runs
(row count + column set + order-insensitive canonical values).

The driver materializes BOTH sides through pandas (Spark ``toPandas()``
/ DuckDB ``fetchdf()``) before hashing, so dtype coercions that pandas
performs are part of the contract: a DuckDB HUGEINT (integer SUM)
becomes float64 (``1.0``) while the Spark side stays int64 (``1``), and
the hashes diverge even though python-level ``1 == 1.0``.  Round 2
shipped exactly that bug in ``win_sessionize`` because this module used
``fetchall()`` (python ints) and masked it.  The comparator therefore:

- goes through the same pandas path the driver uses on both sides;
- canonicalizes values with a TYPE TAG, so int 1 != float 1.0;
- rejects any oracle whose DuckDB result types include HUGEINT /
  UHUGEINT / DECIMAL — those never survive the driver's pandas
  conversion with the dtype Spark produces, so they are bugs at
  registration time, not at sample time.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from .sources import TABLES

# DuckDB result types that pandas silently converts to float64 (or
# object-of-Decimal) and therefore can never hash-match a Spark
# integral/double column. An oracle producing one is a latent driver
# failure even when fetchall()-style comparison passes.
_FORBIDDEN_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def canon(v):
    """Type-tagged canonical form: two values compare equal iff the
    driver's pandas-level hash would see them identically."""
    if isinstance(v, np.ndarray):
        return ("list", tuple(canon(x) for x in v.tolist()))
    if v is None or v is pd.NaT:
        return ("null",)
    if isinstance(v, (bool, np.bool_)):
        return ("bool", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("int", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("float", "nan")
        return ("float", repr(f))
    if isinstance(v, Decimal):
        return ("float", repr(float(v)))
    if isinstance(v, pd.Timestamp):
        return ("ts", v.to_pydatetime().isoformat())
    if isinstance(v, datetime.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("list", tuple(canon(x) for x in v))
    if isinstance(v, bytes):
        return ("bytes", v)
    if isinstance(v, str):
        return ("str", v)
    return (type(v).__name__, repr(v))


def pdf_rows(pdf: pd.DataFrame):
    """pandas frame -> list of canonical row tuples (columns sorted by
    name, the driver's order-insensitive convention)."""
    cols = list(pdf.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for tup in pdf.itertuples(index=False, name=None):
        out.append(tuple(canon(tup[i]) for i in order))
    out.sort(key=repr)
    return out


def rows_key(rows, cols):
    """Canonicalize already-collected rows (Row objects / tuples)."""
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


def forbidden_duck_types(rel) -> list[str]:
    """Names of oracle output columns whose DuckDB type pandas will
    coerce away from what Spark produces."""
    bad = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if any(t.startswith(ft) for ft in _FORBIDDEN_DUCK_TYPES):
            bad.append(f"{col}:{t}")
    return bad


def compare(sdf, con, sql: str) -> list[str]:
    """Return a list of problems (empty = match, driver-style)."""
    spdf = sdf.toPandas()
    scols = list(spdf.columns)
    rel = con.sql(sql)
    dcols = list(rel.columns)
    problems = []
    bad_types = forbidden_duck_types(rel)
    if bad_types:
        problems.append(
            "oracle result types pandas-coerce away from Spark's "
            f"(cast them in the SQL): {bad_types}"
        )
    dpdf = rel.fetchdf()
    if len(spdf) != len(dpdf):
        problems.append(f"rowcount {len(spdf)} vs {len(dpdf)}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"columns {sorted(scols)} vs {sorted(dcols)}")
    if not problems:
        sk, dk = pdf_rows(spdf), pdf_rows(dpdf)
        if sk != dk:
            i, a, b = next(
                (i, a, b) for i, (a, b) in enumerate(zip(sk, dk)) if a != b
            )
            problems.append(f"values differ at sorted idx {i}: spark={a!r} duck={b!r}")
    return problems
