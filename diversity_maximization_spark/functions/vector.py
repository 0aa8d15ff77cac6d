"""Vector math over ``array<float>`` columns — JVM-side, no UDFs.

The reference's `Distance` functions (SURVEY.md §1.1: Euclidean /
cosine over dense points) become Catalyst higher-order-function
expressions: `zip_with` + `aggregate` run inside whole-stage codegen,
so a distance join never leaves the JVM. Elements are cast
float->double (exact) before arithmetic so Spark and the DuckDB oracle
compute the identical IEEE sequence; see `duck_*` mirrors below which
generate the matching DuckDB SQL.

At 100 TB scale these expressions vectorize per-row with no Python
boundary; the O(n^2) *pairing* cost is handled separately by the LSH /
bucketing rewrites in plans/distance_join.py, not here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(expr: str) -> str:
    return f"CAST({expr} AS DOUBLE)"


def dot(a: str, b: str) -> Column:
    """Dot product of two array<float|double> columns (double, exact order)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> {_d('x')} * {_d('y')}), "
        f"CAST(0 AS DOUBLE), (s, v) -> s + v)"
    )


def lit_double_array(values) -> Column:
    """A driver-side float sequence as ONE parsed array<double> SQL
    literal. Equivalent to ``F.array(*[F.lit(float(v)) ...])`` but a
    single py4j round-trip instead of one per element — the
    element-wise form costs ~1 ms of driver time per literal, which
    dominates query CONSTRUCTION for centroid/plane/component arrays
    (64-2048 elements, rebuilt on every call). Values round-trip
    exactly: repr() emits the shortest digits that parse back to the
    same double, and CAST(string AS DOUBLE) is that parse."""
    return F.expr(
        "array("
        + ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in values)
        + ")"
    )


def sq_norm(a: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {a}, (x, y) -> {_d('x')} * {_d('y')}), "
        f"CAST(0 AS DOUBLE), (s, v) -> s + v)"
    )


def l2_dist(a: str, b: str) -> Column:
    """Euclidean distance; (x-y)*(x-y) not pow() so both engines match bit-for-bit."""
    return F.sqrt(
        F.expr(
            f"aggregate(zip_with({a}, {b}, (x, y) -> ({_d('x')} - {_d('y')}) * ({_d('x')} - {_d('y')})), "
            f"CAST(0 AS DOUBLE), (s, v) -> s + v)"
        )
    )


def cosine_sim(a: str, b: str) -> Column:
    return dot(a, b) / (F.sqrt(sq_norm(a)) * F.sqrt(sq_norm(b)))


def cosine_dist(a: str, b: str) -> Column:
    return F.lit(1.0) - cosine_sim(a, b)


def l2_normalize(a: str) -> Column:
    """L2-normalized copy of the vector (array<double>)."""
    return F.expr(
        f"transform({a}, x -> {_d('x')} / sqrt(aggregate(zip_with({a}, {a}, "
        f"(p, q) -> {_d('p')} * {_d('q')}), CAST(0 AS DOUBLE), (s, v) -> s + v)))"
    )


# --- DuckDB oracle mirrors -------------------------------------------------
# Same IEEE operation sequence: elementwise double products in index
# order, sequential left-fold sum. `list_sum` on a double list and the
# generate_series indexing keep the summation order identical to
# Spark's aggregate() left fold.


def duck_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def duck_sq_norm(a: str) -> str:
    return duck_dot(a, a)


def duck_l2_dist(a: str, b: str) -> str:
    return (
        f"sqrt(list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
        f"* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))))"
    )


def duck_cosine_sim(a: str, b: str) -> str:
    return f"({duck_dot(a, b)} / (sqrt({duck_sq_norm(a)}) * sqrt({duck_sq_norm(b)})))"


def duck_l2_normalize(a: str) -> str:
    return (
        f"list_transform({a}, x -> CAST(x AS DOUBLE) / sqrt({duck_sq_norm(a)}))"
    )
