"""Unit tests for the strict driver-style comparator itself
(diversity_maximization_spark/testing.py) — the gate that failed
open in round 2 must never fail open again."""

import duckdb
import pytest

from diversity_maximization_spark.testing import canon, compare


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_int_vs_float_mismatch_detected(spark, con):
    """DuckDB HUGEINT -> pandas float64 (1.0) vs Spark bigint (1):
    python-level 1 == 1.0, but the driver's hash differs — the
    comparator must flag it (this exact shape was r2's
    win_sessionize)."""
    sdf = spark.createDataFrame([(1,)], "x bigint")
    problems = compare(sdf, con, "SELECT SUM(1) AS x")
    assert problems, "uncast integer SUM must not pass"
    assert any("HUGEINT" in p for p in problems)


def test_decimal_output_rejected(spark, con):
    sdf = spark.createDataFrame([(1.5,)], "x double")
    problems = compare(sdf, con, "SELECT CAST(1.5 AS DECIMAL(5,2)) AS x")
    assert any("DECIMAL" in p for p in problems)


def test_matching_bigint_passes(spark, con):
    sdf = spark.createDataFrame([(2,), (1,)], "x bigint")
    assert compare(sdf, con, "SELECT * FROM (VALUES (1), (2)) t(x)") == []


def test_float_vs_int_value_tagged():
    assert canon(1) != canon(1.0)
    assert canon(1) == canon(1)
    assert canon(float("nan")) == canon(float("nan"))


def test_order_insensitive_but_value_strict(spark, con):
    sdf = spark.createDataFrame([(1, "b"), (2, "a")], "x bigint, s string")
    assert (
        compare(sdf, con, "SELECT * FROM (VALUES (2, 'a'), (1, 'b')) t(x, s)")
        == []
    )
    problems = compare(
        sdf, con, "SELECT * FROM (VALUES (2, 'a'), (1, 'c')) t(x, s)"
    )
    assert problems
