"""diversity_maximization_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference metric-space diversity-maximization library
(Cecca/diversity-maximization; see SURVEY.md — the reference checkout
was empty this session, so citations are to SURVEY.md sections which
reconstruct it from PVLDB 10(5) 2017 and KDD 2018 papers), extended
with the relational host surface and LLM-data-pipeline operators the
100 TB mandate requires.

Layout
------
- ``api``        : high-level library surface (gmm, gmm_coreset,
                   diversity, matching, local_search, streaming fold).
- ``session``    : SparkSession factory with scale-aware defaults.
- ``sources``    : fixture table loaders (declared schemas) and sinks.
- ``functions``  : column-expression libraries (vector math, text).
- ``operators``  : relational operators (scans, joins, aggs, windows,
                   sorts, set ops, scalar-function families) — each
                   registered as a (spark_fn, oracle_sql) pair.
- ``diversity``  : the reference's native surface — GMM/farthest-first,
                   matching, local search, diversity evaluators,
                   MapReduce coreset, matroid constraints.
- ``llm``        : dedup (exact/minhash/simhash/components),
                   similarity search, text stats, TF-IDF, multimodal
                   plumbing.
- ``plans``      : distance-join planner and skew rewrites.
- ``metrics``    : distance-evaluation counters.
- ``streaming``  : Structured Streaming ops (windows, sessionization,
                   dedup, streaming coreset).
- ``registry``   : the QUERIES/ORACLES registries consumed by
                   ``__spark_entry__.py``.
"""

__version__ = "0.1.0"
