"""Distributed GMM / farthest-first traversal (SURVEY.md §2.1).

The reference runs Gonzalez's greedy k-center sequentially; here the
per-iteration argmax is a distributed DataFrame job: keep a running
`min_dist` column (distance to the chosen set), pick the global
argmax (tie-broken by id), broadcast the new center as a literal
vector, update `min_dist` with `least()`. k small jobs over a cached
base — the scale path for "GMM on the full dataset" when the data
doesn't fit one machine. Lineage is cut with localCheckpoint every 8
iterations so the plan doesn't grow O(k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist_to_lit(vec_col: str, vec) -> F.Column:
    lit_arr = F.array(*[F.lit(float(x)) for x in vec])
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                lit_arr,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda s, v: s + v,
        )
    )


def gmm_distributed(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
):
    """Farthest-first traversal over a DataFrame of points.

    Returns a list of (rank, id, dist_when_chosen, vector). Start =
    min id (deterministic); argmax ties broken by min id.

    (Perf note: an AQE-off A/B at sf0.1/k=16 showed no steady-state
    difference — the k tiny TakeOrdered jobs are dominated by fixed
    job overhead, and the apparent first-run cost is JVM JIT warmup,
    not re-planning. So AQE stays untouched.)
    """
    base = df.select(id_col, vec_col).cache()
    first = base.orderBy(id_col).limit(1).collect()[0]
    centers = [(0, first[id_col], 0.0, list(first[vec_col]))]
    cur = base.withColumn("min_dist", _dist_to_lit(vec_col, first[vec_col]))
    for i in range(1, k):
        # chosen ids are excluded so duplicate points (min_dist 0 for
        # every remaining row) can never re-select a chosen center —
        # same tie discipline as the local kernel
        far = (
            cur.filter(~F.col(id_col).isin([c[1] for c in centers]))
            .orderBy(F.col("min_dist").desc(), F.col(id_col))
            .limit(1)
            .collect()[0]
        )
        centers.append((i, far[id_col], float(far["min_dist"]), list(far[vec_col])))
        cur = cur.withColumn(
            "min_dist",
            F.least("min_dist", _dist_to_lit(vec_col, far[vec_col])),
        )
        if i % 8 == 0:
            cur = cur.localCheckpoint(eager=False)
    base.unpersist()
    return centers
