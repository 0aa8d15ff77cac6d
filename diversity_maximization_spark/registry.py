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

# round-7 rotation: the next 50 never-driver-sampled keys in
# NEVER_SAMPLED.md order (newest continuation waves first, per the
# r6 verdict's item 1) — includes the three advice-flagged keys
# whose plans changed this round (graph_degree_powerlaw now lazy,
# agg_weighted_kappa single-pass, source_fixed_width width-guarded),
# so the driver proves the FIXED plans. Every key here MUST have an
# oracle (a no-oracle key in the window is an automatic err slot) —
# enforced in tests.
CHECK_WINDOW: list[str] = [
    # (a) keys whose CONTRACT changed in round 7 — first driver
    # exposure of the new oracles: text_pagerank (re-pointed at the
    # scaled-integer tier, now hash-checked), multimodal_features
    # (rows-only -> full arithmetic oracle), and the two new census
    # twins of the perceptual-hash / audio-decode paths
    "text_pagerank",
    "multimodal_features",
    "multimodal_audio_vad",
    "multimodal_image_blur",
    "multimodal_video_shots",
    "dedup_phash",
    "dedup_phash_census",
    "audio_fingerprint_census",
    "multimodal_resize_census",
    "multimodal_frame_sample_census",
    # (b) never-sampled backlog, NEVER_SAMPLED.md order
    "agg_market_model",
    "agg_ordinal_association",
    "agg_weighted_kappa",
    "ts_rogers_satchell",
    "agg_chao2_richness",
    "ts_garman_klass",
    "agg_mean_log_deviation",
    "ts_turbulence",
    "ts_durbin_watson",
    "graph_degree_powerlaw",
    "agg_price_dispersion",
    "agg_hoover_index",
    "agg_kendall_w",
    "ts_calmar_ratio",
    "agg_taylors_law",
    "agg_cr4_concentration",
    "agg_local_morans",
    "agg_bic_bayes_factor",
    "ts_amihud_illiquidity",
    "agg_geary_c",
    "agg_morans_i",
    "agg_page_trend",
    "text_burrows_delta",
    "agg_rank_biserial",
    "agg_yuen_test",
    "agg_hotelling_t2",
    "agg_weibull_rank_fit",
    "agg_jackknife_variance",
    "agg_benjamini_yekutieli",
    "ts_diebold_mariano",
    "ts_theil_u",
    "source_quasirandom",
    "agg_energy_distance",
    "ts_mincer_zarnowitz",
    "agg_pot_gpd",
    "ts_spectral_entropy",
    "agg_cronbach_alpha",
    "agg_lmg_importance",
    "ts_seasonal_mann_kendall",
    "source_fixed_width",
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
