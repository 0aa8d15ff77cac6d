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


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; optionally its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


# The driver's correctness gate checks the FIRST 50 keys in
# registration order (CORRECTNESS_r01 == list(QUERIES)[:50]). This
# explicit window puts the keys that most need driver verification
# first: round-1 ERR repairs, then the win_/div_/LLM/streaming/UDF
# inventory that round 1 never saw. Every key here MUST have an
# oracle (a no-oracle key in the window is an automatic err slot) —
# enforced by a test in tests/test_registry.py. Keys already
# driver-green in round 1 sort after the window.
CHECK_WINDOW: list[str] = [
    # round-1 ERR repairs (nanos ts / array hashing / no_oracle)
    "scan_parquet",
    "source_json_props",
    "sink_parquet",
    "agg_approx_cd",
    "join_full_outer",
    "join_range_interval",
    "join_asof",
    "fn_json",
    "fn_array",
    "sketch_hll_merge",
    # window functions (§2.2-E, all unseen in round 1)
    "win_topk_pergroup",
    "win_rank_dense",
    "win_lag_lead",
    "win_moving_avg",
    "win_range_frame",
    "win_running_total",
    "win_ntile_pctrank",
    "win_sessionize",
    # diversity evaluators with SQL oracles (§2.2-I)
    "div_eval_edge",
    "div_eval_clique",
    "div_eval_star",
    "div_random_baseline",
    # LLM-pipeline operators (§2.2-L)
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_components_ngram",
    "dedup_keep_canonical",
    "dedup_embedding",
    "sim_search_topk",
    "text_stats",
    "tfidf",
    "lang_topn_words",
    "lang_id_ngram",
    "token_count",
    "text_ngrams",
    "doc_fingerprint",
    "quality_score",
    "quality_bigram_logprob",
    "embed_normalize",
    "embed_quantize",
    "sample_hash_split",
    "sample_stratified",
    "multimodal_join",
    # streaming (§2.2-J, batch-equivalence oracles)
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_dedup",
    # UDF surface (§2.2-K)
    "udf_scalar_pandas",
    "udaf_grouped_pandas",
    "udf_grouped_map",
    "udtf_map_in_pandas",
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
