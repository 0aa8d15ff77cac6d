"""Iterative-join graph traversal — the recursive-CTE gap.

Spark SQL has no RECURSIVE CTE; the engine's replacement for
hierarchy / reachability queries is ITERATIVE JOINS, and the scale-
correct form is POINTER JUMPING: each round, every node's ancestor
pointer jumps to its ancestor's ancestor while accumulated distance
adds — reach doubles per round, so a depth-D hierarchy resolves in
ceil(log2 D) shuffle joins instead of D self-joins (the naive
one-step walk) or a single-machine recursion. Same doubling idea as
dedup_components' min-label propagation; localCheckpoint per round
keeps the lineage flat.

The fixture hierarchy is synthetic but non-trivial: parent(u) =
(u * 2654435761 % 2^32) % u for u > 0 (a Knuth-mix pseudo-random
strictly-smaller parent, so the graph is a tree rooted at 0 with
O(log n) expected depth but no closed-form depth the oracle could
shortcut). doc_ids are dense 0..N-1 (asserted), so every parent is a
real node. The DuckDB oracle walks the identical arithmetic with a
recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load


@query(
    "graph_ancestor_depth",
    oracle="""
WITH RECURSIVE walk AS (
  SELECT doc_id AS u, doc_id AS cur, CAST(0 AS BIGINT) AS d FROM documents
  UNION ALL
  SELECT u, (cur * 2654435761 % 4294967296) % cur AS cur, d + 1
  FROM walk WHERE cur > 0
)
SELECT u AS doc_id, CAST(MAX(d) AS BIGINT) AS depth
FROM walk GROUP BY u
""",
)
def graph_ancestor_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth of every node in the synthetic parent tree via pointer
    jumping: state (u, ptr, d) starts at (u, parent(u), 1); each
    round joins the state with itself on ptr = u', sets
    d += d(ptr), ptr = ptr(ptr). Distance-to-root doubles per round
    -> ceil(log2 depth) rounds, each ONE equi-join shuffle. The root
    (u=0, ptr=0, d=0) is a fixpoint, so finished rows pass through
    unchanged; the loop stops when every ptr is 0."""
    d = load(spark, sf_dir, "documents")
    stats = d.agg(
        F.count(F.lit(1)).alias("n"), F.max("doc_id").alias("mx")
    ).collect()[0]
    if stats["n"] != stats["mx"] + 1:
        raise ValueError("graph_ancestor_depth requires dense doc_ids 0..N-1")

    u = F.col("doc_id")
    parent = ((u * F.lit(2654435761)) % F.lit(4294967296)) % u
    state = d.select(
        u.alias("u"),
        F.when(u > 0, parent).otherwise(F.lit(0)).cast("bigint").alias("ptr"),
        F.when(u > 0, F.lit(1)).otherwise(F.lit(0)).cast("bigint").alias("d"),
    )
    while True:
        state = state.localCheckpoint(eager=True)
        if state.filter(F.col("ptr") != 0).count() == 0:
            break
        hop = state.select(
            F.col("u").alias("ju"),
            F.col("ptr").alias("jptr"),
            F.col("d").alias("jd"),
        )
        state = state.join(hop, state["ptr"] == hop["ju"]).select(
            "u",
            F.col("jptr").alias("ptr"),
            (F.col("d") + F.col("jd")).alias("d"),
        )
    return state.select(F.col("u").alias("doc_id"), F.col("d").alias("depth"))
