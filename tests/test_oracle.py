"""Every SQL-backed queries() key must hash-match its DuckDB oracle
at sf0.001 (the driver runs the same comparison at sf0.01)."""

import pytest

from diversity_maximization_spark import registry
from diversity_maximization_spark.testing import compare

ORACLE_KEYS = sorted(registry.ORACLES)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_match(spark, duck, sf_dir, key):
    sdf = registry.QUERIES[key](spark, sf_dir)
    problems = compare(sdf, duck, registry.ORACLES[key])
    assert not problems, f"{key}: {problems}"


def test_rows_only_keys_run(spark, sf_dir):
    for key in sorted(set(registry.QUERIES) - set(registry.ORACLES)):
        df = registry.QUERIES[key](spark, sf_dir)
        assert df.collect() is not None, key
