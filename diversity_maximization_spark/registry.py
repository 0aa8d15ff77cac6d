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

# round-8 rotation: the next 50 never-driver-sampled keys, strictly
# in NEVER_SAMPLED.md order (r7 verdict item 1 — no contract-changed
# keys this round burn slots; the three r7-ADVICE rounding fixes were
# oracle-side tie alignments re-proven by the local strict gate).
# Every key here MUST have an oracle (a no-oracle key in the window
# is an automatic err slot) — enforced in tests.
CHECK_WINDOW: list[str] = [
    "agg_gravity_trade",
    "agg_oaxaca",
    "ts_dfa",
    "survival_rmst",
    "agg_meta_analysis",
    "agg_atkinson",
    "agg_min_variance_portfolio",
    "ts_parkinson_vol",
    "rec_eval_itemknn",
    "ts_sax_motifs",
    "join_division",
    "agg_iptw_ate",
    "agg_last_digit_test",
    "agg_littles_law",
    "agg_newsvendor",
    "agg_safety_stock",
    "ts_pettitt",
    "agg_fairness_report",
    "anomaly_isolation_grid",
    "ts_stochastic_oscillator",
    "ts_var_backtest",
    "agg_rdd_sharp",
    "agg_cem_att",
    "agg_holm_bonferroni",
    "anomaly_lof",
    "ts_binary_segmentation",
    "agg_ttest_one_sample",
    "privacy_rr_frequency",
    "agg_jonckheere",
    "agg_palma_ratio",
    "ts_seasonal_mase",
    "tokenize_greedy_vocab",
    "corpus_unigram_entropy",
    "ts_haar_energy",
    "ts_bass_diffusion",
    "sample_cluster_two_stage",
    "graph_square_count",
    "ts_ccf",
    "agg_g_test",
    "multimodal_video_motion_census",
    "agg_log_loss",
    "agg_fleiss_kappa",
    "agg_cochrans_q",
    "agg_lognormal_mom",
    "ts_kalman_level",
    "ts_sample_entropy",
    "agg_negbin_mom",
    "multimodal_audio_energy_census",
    "ts_turning_points",
    "ts_control_chart",
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
