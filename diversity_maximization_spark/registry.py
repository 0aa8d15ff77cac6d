"""Query/oracle registries.

Every engine operator registers here as a named query: a callable
``(spark, sf_dir) -> DataFrame`` plus, where the semantics are
SQL-expressible, the equivalent DuckDB oracle SQL (run by the driver
side-by-side at sf0.01; row-count + schema + order-insensitive
value-hash must match — see __spark_entry__.py docstring).

Determinism discipline (SURVEY.md §5.2):
- money/quantity sums go through DECIMAL(18,2) then CAST AS DOUBLE in
  BOTH engines — exact, associative, order-independent;
- averages are computed as exact-decimal-sum / count, never engine avg;
- floating expressions that are order-dependent are rounded via
  ``round(x, 6)`` on O(1) magnitudes only;
- every LIMIT / ranking is tie-broken by a unique key;
- per-row IEEE arithmetic (same expression tree both engines) is left
  unrounded — it is bit-identical.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Keys whose physical plan INTENTIONALLY contains a CartesianProduct
# or BroadcastNestedLoopJoin, each with the bound that makes the cross
# safe at scale (a 1-row scalar side, a constant grid, declared
# pairwise semantics over a k-bounded set, ...). Populated by the
# ``bounded_cross=`` argument of @query at the registration site —
# the cartesian-sweep lint in tests/test_plans.py derives its
# allowlist from THIS dict, so a new scalar cross must declare its
# bound where it is written or the suite goes red.
BOUNDED_CROSS: dict[str, str] = {}


def query(
    name: str,
    oracle: Optional[str] = None,
    bounded_cross: Optional[str] = None,
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; optionally its oracle SQL.

    ``bounded_cross`` declares that the key's plan intentionally
    contains a cartesian/nested-loop join and states the domain bound
    that keeps it O(small) — required for the plan lint to pass.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        if bounded_cross is not None:
            BOUNDED_CROSS[name] = bounded_cross
        return fn

    return deco


# The driver's correctness gate checks the FIRST 50 keys in
# registration order. The window rotates per round to the keys that
# most need DRIVER verification now. After r5's clean sweep the
# cumulative driver-verified count is 239 with zero red; round 6
# continues the never-sampled rotation the r5 verdict prescribed
# ("the single highest-leverage action while 289/528 lack the hard
# signal"):
# (a) knn_classify_eval — CHANGED this round (tier column + LSH-tier
# guard + stable candidate-cut tie-break, per ADVICE r5) so its r5
# green row is stale; the new row proves the contract change against
# the updated oracle;
# (b) the eight post-full-sweep round-5 additions the verdict named
# first (their r5 artifact rows came from targeted runs, not the
# full sweep);
# (c) the twelve keys ADDED or CHANGED in round 6 — the four new
# analytics (ARCH LM, Granger, skyline, Mahalanobis), the four census
# keys, the two rows-only -> hash-checked conversions
# (dedup_embedding_lsh portable planes, dedup_semdedup fold-exact),
# and graph_scc (oracle-ceiling guard + the stats-barrier plan fix —
# its green row proves the fix kept the hash);
# (d) the remaining never-sampled backlog in NEVER_SAMPLED.md order
# (newest waves first) — 29 keys spanning the round-4 analytics,
# finance/ts, graph and sampling waves.
# Every key here MUST have an oracle (a no-oracle key in the
# window is an automatic err slot) — enforced in tests.
CHECK_WINDOW: list[str] = [
    # (a) changed this round — driver re-proof of the new contract
    "knn_classify_eval",
    # (b) the eight verdict-named post-sweep r5 additions
    "agg_brier_score",
    "ts_cointegration",
    "ts_adf",
    "agg_conformal_interval",
    "agg_benjamini_hochberg",
    "ts_kpss",
    "agg_permutation_test",
    "corpus_bigram_entropy",
    # (c) round-6 new / changed keys — first driver exposure or
    # same-hash proof of a plan fix
    "ts_arch_lm",
    "ts_granger",
    "agg_pareto_front",
    "anomaly_mahalanobis",
    "stream_coreset_census",
    "stream_coreset_shard_census",
    "div_eval_bipartition_exhaustive",
    "multimodal_decode_census",
    "dedup_embedding_lsh",
    "dedup_semdedup",
    "graph_scc",
    "ts_pacf",
    # (d) never-sampled backlog, NEVER_SAMPLED.md order
    "attribution_model_compare",
    "corpus_vocab_growth",
    "conversion_horizon_cdf",
    "ts_gini_daily",
    "agg_proportion_sizing",
    "agg_risk_difference",
    "ts_obv",
    "rolling_stickiness",
    "agg_expected_shortfall",
    "agg_abc_classification",
    "graph_rich_club",
    "win_rank_movers",
    "interval_allocate_hours",
    "agg_kmeans_silhouette",
    "geo_dbscan",
    "sink_integrity_manifest",
    "ts_time_underwater",
    "agg_revenue_retention",
    "agg_growth_accounting",
    "agg_new_vs_returning",
    "fn_semver",
    "agg_price_volume_mix",
    "agg_simpsons_paradox",
    "ts_time_weighted_return",
    "fn_luhn",
    "text_word_burstiness",
    "dedup_threshold_sweep",
    "sample_pps_systematic",
    "agg_gumbel_daily_max",
]


def load_all() -> None:
    """Import every module that registers queries (idempotent), then
    reorder the registry so CHECK_WINDOW comes first (the driver
    verifies the first 50 keys in registration order)."""
    from .operators import (  # noqa: F401
        aggregates,
        behavior,
        graph,
        joins,
        lakehouse,
        quality,
        scalars,
        scans,
        sketches,
        sorts_setops,
        sql_interface,
        timeseries,
        tpch,
        tpch_more,
        tpch_rest,
        udfs,
        windows,
    )
    from .diversity import bow as _bow  # noqa: F401
    from .diversity import queries as _div_queries  # noqa: F401
    from .sources import formats as _formats  # noqa: F401
    from .sources import generators as _generators  # noqa: F401
    from .llm import bpe as _bpe  # noqa: F401
    from .llm import decontam as _decontam  # noqa: F401
    from .llm import queries as _llm_queries  # noqa: F401
    from .llm import textrank as _textrank  # noqa: F401
    from .streaming import queries as _stream_queries  # noqa: F401

    missing = [k for k in CHECK_WINDOW if k not in QUERIES]
    if missing:
        raise RuntimeError(f"CHECK_WINDOW keys not registered: {missing}")
    ordered = CHECK_WINDOW + [k for k in QUERIES if k not in CHECK_WINDOW]
    reordered = {k: QUERIES[k] for k in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)
