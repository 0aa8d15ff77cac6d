"""Synthetic point sources (SURVEY.md §2.1 parity): determinism,
partitioning-independence, and distributional sanity."""

import math

import numpy as np

from diversity_maximization_spark.sources.generators import (
    random_ball,
    random_gaussian,
    random_sphere,
)


def test_gaussian_moments(spark):
    rows = random_gaussian(spark, n=2000, dim=8).collect()
    X = np.array([r["embedding"] for r in rows])
    assert abs(X.mean()) < 0.05
    assert abs(X.std() - 1.0) < 0.05


def test_sphere_unit_norm(spark):
    rows = random_sphere(spark, n=500, dim=8).collect()
    norms = np.linalg.norm(np.array([r["embedding"] for r in rows]), axis=1)
    assert np.allclose(norms, 1.0, atol=1e-9)


def test_ball_radius_distribution(spark):
    rows = random_ball(spark, n=2000, dim=8).collect()
    # ADVICE r01: the radius draw must derive from the caller's seed —
    # different seeds must differ in norm distribution, not only
    # direction
    r1 = sorted(
        sum(x * x for x in r["embedding"]) for r in random_ball(spark, n=50, dim=8, seed=1).collect()
    )
    r2 = sorted(
        sum(x * x for x in r["embedding"]) for r in random_ball(spark, n=50, dim=8, seed=2).collect()
    )
    assert r1 != r2
    norms = np.linalg.norm(np.array([r["embedding"] for r in rows]), axis=1)
    assert norms.max() <= 1.0 + 1e-9
    # P[r <= t] = t^dim -> median radius = 0.5^(1/8)
    assert abs(np.median(norms) - 0.5 ** (1 / 8)) < 0.02


def test_partitioning_independence(spark):
    """Same (id, dim, seed) -> same point, regardless of partitioning."""
    a = {r["vec_id"]: tuple(r["embedding"])
         for r in random_gaussian(spark, n=300, dim=4).collect()}
    b = {r["vec_id"]: tuple(r["embedding"])
         for r in random_gaussian(spark, n=300, dim=4).repartition(7).collect()}
    assert a == b
