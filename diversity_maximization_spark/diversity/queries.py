"""Diversity-native query registrations (SURVEY.md §2.2-I).

The candidate set for the evaluator queries is the deterministic
subset ``vec_id % 25 = 0`` (20 points at the 500-row fixtures) —
small enough for the O(|S|^2) oracles, fixed so golden values pin.
Heuristic outputs (gmm / matching / local search / coresets) are
rows-only keys: seeded, deterministic, covered by property + golden
tests (tests/test_diversity.py) instead of SQL.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import vector as V
from ..registry import query
from ..sources import load
from . import evaluators as E
from . import kernel as K
from .coreset import cluster_assignments, collect_coreset, mr_coreset
from .gmm import gmm_distributed
from .matroid import PartitionMatroid, TransversalMatroid

_CAND_FILTER = "vec_id % 25 = 0"


def _cand(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "embeddings").filter(_CAND_FILTER)


_PAIR_ORACLE = f"""
SELECT {V.duck_l2_dist('a.embedding', 'b.embedding')} AS dist,
       a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id % 25 = 0 AND b.vec_id % 25 = 0
"""


@query(
    "div_eval_edge",
    oracle=f"SELECT 'edge' AS objective, round(MIN(dist), 6) AS value FROM ({_PAIR_ORACLE})",
)
def div_eval_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remote-edge value of the candidate set (min pairwise L2)."""
    return E.edge_value(_cand(spark, sf_dir))


@query(
    "div_eval_clique",
    oracle=f"SELECT 'clique' AS objective, round(SUM(dist), 6) AS value FROM ({_PAIR_ORACLE})",
)
def div_eval_clique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remote-clique value (sum of pairwise distances)."""
    return E.clique_value(_cand(spark, sf_dir))


@query(
    "div_eval_star",
    oracle=f"""
SELECT 'star' AS objective, round(MIN(star_sum), 6) AS value FROM (
  SELECT a.vec_id, SUM({V.duck_l2_dist('a.embedding', 'b.embedding')}) AS star_sum
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE a.vec_id % 25 = 0 AND b.vec_id % 25 = 0
  GROUP BY a.vec_id)
""",
)
def div_eval_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remote-star value (min over centers of summed distances)."""
    return E.star_value(_cand(spark, sf_dir))


@query("div_eval_tree")  # rows-only: MST is not SQL-expressible
def div_eval_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    vals = E.tree_cycle_values(_cand(spark, sf_dir))
    return spark.createDataFrame(vals[:1], "objective string, value double")


@query("div_eval_cycle")  # rows-only: TSP tour is not SQL-expressible
def div_eval_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    vals = E.tree_cycle_values(_cand(spark, sf_dir))
    return spark.createDataFrame(vals[1:], "objective string, value double")


@query("div_eval_bipartition")  # rows-only: min balanced cut is NP-hard
def div_eval_bipartition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remote-bipartition value of the candidate set (SURVEY §2.1
    evaluator list): min over balanced bipartitions of the summed
    distance crossing the cut. Exhaustive on small sets; deterministic
    best-swap descent beyond (cross-checked vs exhaustive in
    tests/test_diversity.py)."""
    vals = E.bipartition_value(_cand(spark, sf_dir))
    return spark.createDataFrame(vals, "objective string, value double")


@query("div_gmm")  # rows-only: iterative; covered by property+golden tests
def div_gmm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed farthest-first traversal, k=16, over all embeddings."""
    emb = load(spark, sf_dir, "embeddings")
    centers = gmm_distributed(emb, k=16)
    rows = [(rank, int(vid), round(d, 6)) for rank, vid, d, _vec in centers]
    return spark.createDataFrame(
        rows, "sel_order int, vec_id bigint, dist_when_chosen double"
    )


@query("div_coreset_mr")  # rows-only: invariants tested in test_diversity.py
def div_coreset_mr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapReduce composable coreset (p=4, k'=16, m=1, seed=42)."""
    emb = load(spark, sf_dir, "embeddings")
    cs = mr_coreset(emb, p=4, kprime=16, m=1, seed=42)
    return cs.select(
        "part", "vec_id", "label", "is_kernel", "center_rank", "weight",
        F.round("dist_to_center", 6).alias("dist_to_center"),
    )


@query("div_matching")  # rows-only
def div_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matching heuristic (k/2 far pairs) on the composed coreset."""
    emb = load(spark, sf_dir, "embeddings")
    ids, _labels, X, _w = collect_coreset(mr_coreset(emb, p=4, kprime=16, m=1))
    D = K.pairwise_l2(X)
    flat = K.matching_heuristic(D, k=16)
    rows = [
        (i // 2, int(ids[flat[i]]), int(ids[flat[i + 1]]),
         round(float(D[flat[i], flat[i + 1]]), 6))
        for i in range(0, len(flat), 2)
    ]
    return spark.createDataFrame(
        rows, "pair_rank int, vec_id_a bigint, vec_id_b bigint, dist double"
    )


@query("div_local_search")  # rows-only
def div_local_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Swap local search for remote-clique (k=12) on the coreset."""
    emb = load(spark, sf_dir, "embeddings")
    ids, _labels, X, _w = collect_coreset(mr_coreset(emb, p=4, kprime=16, m=1))
    D = K.pairwise_l2(X)
    gmm_idx, _, _ = K.farthest_first(X, 12, start=0)
    sel, val = K.local_search_clique(D, k=12, init=list(gmm_idx))
    rows = [(int(ids[i]), round(val, 6)) for i in sel]
    return spark.createDataFrame(rows, "vec_id bigint, clique_value double")


@query("div_matroid_partition")  # rows-only; independence asserted in tests
def div_matroid_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity under a partition matroid (capacity 1 per label,
    k=10). Distributed part: matroid-aware delegate selection = keep
    top-2 points per (partition, cluster, label) — a windowed top-m,
    exactly the KDD18 category-aware coreset; driver part: constrained
    local search with the independence oracle."""
    emb = load(spark, sf_dir, "embeddings")
    assigned = cluster_assignments(emb, p=4, kprime=8, seed=42)
    w = Window.partitionBy("part", "center_rank", "label").orderBy(
        F.col("dist_to_center").desc(), F.col("vec_id")
    )
    delegates = assigned.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 2
    )
    rows = delegates.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    labels = np.array([r["label"] for r in rows])
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    D = K.pairwise_l2(X)
    matroid = PartitionMatroid({lab: 1 for lab in range(10)})

    # greedy independent init in vec_id order
    init: list[int] = []
    for i in range(len(ids)):
        if len(init) == 10:
            break
        if matroid.is_independent(labels[init + [i]]):
            init.append(i)
    sel, _val = K.local_search_clique(
        D, k=10, init=init,
        is_independent=lambda s: matroid.is_independent(labels[list(s)]),
    )
    out = [(int(ids[i]), int(labels[i])) for i in sel]
    return spark.createDataFrame(out, "vec_id bigint, label int")


@query("div_matroid_transversal")  # rows-only
def div_matroid_transversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity under a transversal matroid: point i covers topics
    {label, (label+3) mod 10}; k=6 points must match distinct topics
    (bipartite matching oracle, driver-side)."""
    emb = load(spark, sf_dir, "embeddings")
    ids, labels, X, _w = collect_coreset(mr_coreset(emb, p=4, kprime=16, m=1))
    D = K.pairwise_l2(X)
    topics = {
        i: frozenset({int(labels[i]), (int(labels[i]) + 3) % 10})
        for i in range(len(ids))
    }
    matroid = TransversalMatroid(topics)
    init: list[int] = []
    for i in range(len(ids)):
        if len(init) == 6:
            break
        if matroid.is_independent(init + [i]):
            init.append(i)
    sel, _val = K.local_search_clique(
        D, k=6, init=init, is_independent=matroid.is_independent
    )
    out = [(int(ids[i]), int(labels[i])) for i in sel]
    return spark.createDataFrame(out, "vec_id bigint, label int")


@query(
    "div_random_baseline",
    oracle="""
SELECT vec_id, label FROM embeddings
ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
LIMIT 16
""",
)
def div_random_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-k baseline via deterministic hash ordering (md5 agrees
    across engines, unlike rand(seed) which depends on partition
    layout — SURVEY.md §7 known-hard #7)."""
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .select("vec_id", "label")
        .limit(16)
    )


@query("div_gmm_cosine")  # rows-only: iterative; property-tested vs local kernel
def div_gmm_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farthest-first traversal under COSINE distance, k=16, fully
    distributed. Spark-first reduction instead of a second kernel:
    for L2-normalized vectors ||x-y||^2 = 2*(1 - cos(x,y)), a strictly
    monotone map — so euclidean farthest-first on the normalized
    corpus IS cosine farthest-first, and the one distributed GMM
    implementation serves both metrics. Reported distances are mapped
    back: cos_dist = d^2 / 2."""
    emb = load(spark, sf_dir, "embeddings")
    normed = emb.select("vec_id", V.l2_normalize("embedding").alias("embedding"))
    centers = gmm_distributed(normed, k=16)
    rows = [
        (rank, int(vid), round((d * d) / 2.0, 6)) for rank, vid, d, _vec in centers
    ]
    return spark.createDataFrame(
        rows, "sel_order int, vec_id bigint, cos_dist_when_chosen double"
    )


@query("div_kmeans")  # rows-only: iterative float means; property-tested
def div_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (k=8, 5 iterations) over the
    embeddings — the center-based complement of the remote-* diversity
    objectives (the reference's coreset machinery targets k-center;
    k-means is the classic centroid objective a data pipeline also
    wants, e.g. for IVF list training).

    Spark shape per iteration: assignment is a narrow map (centers are
    baked into the expression as literals — a k x d broadcast), and
    the center update is ONE partial+final agg over (cluster, dim)
    after posexplode — the shuffle carries 32 x k x d partial sums,
    never the data. Init = the k smallest vec_ids (deterministic);
    argmin ties break to the lowest cluster index."""
    from .gmm import _sqdist_to_lit

    k, iters = 8, 5
    pts = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").cache()
    centers = [
        list(r["embedding"])
        for r in pts.orderBy("vec_id").limit(k).collect()
    ]
    assigned = None
    for _ in range(iters):
        dists = F.array(*[_sqdist_to_lit("embedding", c) for c in centers])
        assigned = pts.select(
            "vec_id",
            "embedding",
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias("cluster"),
            F.sqrt(F.array_min(dists)).alias("dist"),
        )
        means = (
            assigned.select("cluster", F.posexplode("embedding").alias("dim", "v"))
            .groupBy("cluster", "dim")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["m"]
        centers = [
            [by_cluster[c][d] for d in range(len(centers[0]))]
            if c in by_cluster
            else centers[c]  # empty cluster keeps its old center
            for c in range(k)
        ]
    # final assignment against the converged centers
    dists = F.array(*[_sqdist_to_lit("embedding", c) for c in centers])
    out = pts.select(
        "vec_id",
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cluster"),
        F.round(F.sqrt(F.array_min(dists)), 6).alias("dist"),
    )
    return out


@query("div_experiment_report")  # rows-only: seeded heuristic outputs
def div_experiment_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's experiment-reporter workflow (SURVEY.md §3.1
    EP1) as one query: compose a MapReduce coreset, run every
    sequential heuristic on it — farthest-first (GMM), matching,
    swap local search, and a deterministic random baseline — and
    report each algorithm's remote-edge and remote-clique objectives
    side by side, the comparison table the reference's experiments
    module emits as JSON rows. Deterministic: fixed coreset seed
    partitioning, fixed start point, md5-hash 'random' order."""
    import hashlib

    emb = load(spark, sf_dir, "embeddings")
    ids, _labels, X, _w = collect_coreset(
        mr_coreset(emb, p=4, kprime=16, m=1)
    )
    D = K.pairwise_l2(X)
    k = 12
    gmm_idx, _, _ = K.farthest_first(X, k, start=0)
    ls_sel, _ = K.local_search_clique(D, k=k, init=list(gmm_idx))
    rnd = sorted(
        range(len(ids)),
        key=lambda i: (
            hashlib.md5(str(int(ids[i])).encode()).hexdigest(),
            int(ids[i]),
        ),
    )[:k]
    sels = {
        "gmm": list(gmm_idx),
        "matching": list(K.matching_heuristic(D, k=k)),
        "local_search": list(ls_sel),
        "random": rnd,
    }
    rows = []
    for alg in sorted(sels):
        sel = sels[alg]
        sub = D[np.ix_(sel, sel)]
        rows.append(
            (
                alg,
                len(sel),
                round(float(K.eval_edge(sub)), 6),
                round(float(K.eval_clique(sub)), 6),
            )
        )
    return spark.createDataFrame(
        rows, "algorithm string, k int, edge_div double, clique_div double"
    )


@query("div_coreset_tree")  # rows-only: invariants in test_diversity.py
def div_coreset_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level composable-coreset tree (p1=8 -> p2=2, k'=16):
    coresets of coresets with weight-conserving kernels — see
    diversity/coreset.py:tree_coreset for the fan-in analysis."""
    from .coreset import tree_coreset

    emb = load(spark, sf_dir, "embeddings")
    cs = tree_coreset(emb, p1=8, p2=2, kprime=16, seed=42)
    return cs.select(
        "part", "vec_id", "label", "center_rank", "weight",
    )

def kcenter_with_outliers(
    X, w, k: int, z_weight: float
):
    """Weighted k-center with outliers on a (small) coreset, solved
    exactly over the candidate-radius grid: for each candidate r
    (a pairwise coreset distance, ascending), greedily pick the
    point whose radius-r disk covers the most uncovered WEIGHT
    (ties -> lowest index), k times; r is feasible when the
    uncovered weight is <= z_weight. Returns (center_idx, radius,
    excluded_weight) for the smallest r the binary search certifies
    feasible — every returned solution is VERIFIED (disks re-checked
    against the weight budget), so the guarantee is unconditional
    even where greedy feasibility is not perfectly monotone in r. O(|C|^3 log |C|)
    on the driver — the coreset bounds |C|, which is exactly the
    composable-coreset contract: heavy lifting distributed, robust
    finish sequential on a provably small summary.

    This is the center-based-clustering-with-outliers extension of
    the reference's coreset lifecycle (the follow-up line to
    SURVEY.md §2.1's MapReduce coreset): planted far-away junk must
    not dictate the radius."""
    import numpy as np

    from . import kernel as K

    D = K.pairwise_l2(X)
    cands = np.unique(D)
    lo, hi = 0, len(cands) - 1
    best = None
    while lo <= hi:
        mid = (lo + hi) // 2
        r = cands[mid]
        covered = np.zeros(len(X), dtype=bool)
        centers = []
        for _ in range(k):
            gain = ((D <= r) & ~covered[None, :]) @ w
            c = int(gain.argmax())
            centers.append(c)
            covered |= D[c] <= r
        excluded = float(w[~covered].sum())
        if excluded <= z_weight:
            best = (centers, float(r), excluded)
            hi = mid - 1
        else:
            lo = mid + 1
    assert best is not None  # r = max distance always covers all
    return best


@query("div_kcenter_outliers")  # rows-only: greedy/coreset-specific
def div_kcenter_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust k-center (k=8) over the embeddings via the standard
    two-stage scale shape: distributed weighted MR coreset, then the
    exact greedy radius search of ``kcenter_with_outliers`` on the
    driver with an outlier budget of 2% of total weight. Emits the
    chosen centers with the robust radius and excluded weight —
    compare div_gmm, whose radius a single far-away point can
    dictate."""
    from .coreset import collect_coreset, mr_coreset

    e = load(spark, sf_dir, "embeddings")
    ids, labels, X, w = collect_coreset(mr_coreset(e, p=4, kprime=32))
    centers, radius, excluded = kcenter_with_outliers(
        X, w, k=8, z_weight=0.02 * float(w.sum())
    )
    rows = [
        (
            int(rank),
            int(ids[c]),
            int(labels[c]),
            round(radius, 6),
            round(excluded, 6),
        )
        for rank, c in enumerate(centers)
    ]
    return spark.createDataFrame(
        rows,
        "rank int, vec_id bigint, label int, robust_radius double,"
        " excluded_weight double",
    )
