"""MapReduce composable coreset (SURVEY.md §2.1 / PAPER-VLDB17 §4).

Plan shape (idiomatic Spark, no RDDs):

  points --[deterministic pseudo-random partition key:
            portable multiplicative mix of (id, seed) -> 0..p-1,
            see part_mix()]--> groupBy(part)
         --applyInPandas--> per-partition farthest-first kernel of
            size k' + up to m delegates per kernel point
         --> small DataFrame (p * k' * (m+1) rows) that either
             composes by union with other coresets or collects to the
             driver for the sequential finish.

The partition key is a hash of the unique id, not repartition()'s
round-robin: the coreset guarantee needs a random-like assignment
that is ALSO reproducible across runs and cluster layouts
(SURVEY.md §4.3). At 100 TB, p scales with cluster size and the
shuffle moves each point once; the applyInPandas kernel is O(n_p·k')
per partition in vectorized numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import kernel as K

CORESET_SCHEMA = (
    "part int, vec_id bigint, label int, is_kernel int, center_rank int, "
    "dist_to_center double, weight bigint, embedding array<double>"
)


def _partition_coreset(kprime: int, m: int):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        X = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype(np.float64)
        chosen, _, _ = K.farthest_first(X, kprime, start=0)
        assign = K.assign_to_centers(X, chosen)
        # weight = cluster size (delegate-weighted coreset)
        counts = np.bincount(assign, minlength=len(chosen))
        rows = []
        part = int(pdf["part"].iloc[0])
        for rank, c in enumerate(chosen):
            dist_c = K.l2_to_point(X, X[c])
            members = np.where((assign == rank) & (np.arange(len(X)) != c))[0]
            taken = members[:m]  # deterministic: lowest vec_id delegates
            # kernel weight = cluster members it represents (itself +
            # non-exported members); exported delegates weigh 1 each,
            # so each input point is accounted exactly once
            rows.append(
                (part, int(pdf["vec_id"].iloc[c]), int(pdf["label"].iloc[c]), 1,
                 rank, 0.0, int(counts[rank]) - len(taken), list(map(float, X[c])))
            )
            for d in taken:
                rows.append(
                    (part, int(pdf["vec_id"].iloc[d]), int(pdf["label"].iloc[d]),
                     0, rank, float(dist_c[d]), 1, list(map(float, X[d])))
                )
        return pd.DataFrame(
            rows,
            columns=[
                "part", "vec_id", "label", "is_kernel", "center_rank",
                "dist_to_center", "weight", "embedding",
            ],
        )

    return fn


def part_mix(p: int, seed: int, id_col: str = "vec_id") -> str:
    """Deterministic pseudo-random partition key as a PORTABLE SQL
    fragment (the sample_hash_split Knuth-mix idiom): high bits of a
    32-bit multiplicative hash mapped through [0,1) to 0..p-1.
    Identical arithmetic in Spark and DuckDB, which is what lets the
    div_coreset_mr oracle replay the partitioning — the previous
    xxhash64 key was engine-specific. Still id-only (reproducible
    across runs and cluster layouts, SURVEY.md §4.3) and random-like
    (the multiplier mixes the high bits; taking floor(u01 * p) uses
    them, never id % p)."""
    return (
        f"CAST(floor(((({id_col} + {seed}) % 2147483648) * 2654435761 "
        f"% 4294967296) / 4294967296.0 * {p}) AS INT)"
    )


def mr_coreset(
    df: DataFrame,
    p: int = 4,
    kprime: int = 16,
    m: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Composable coreset over (vec_id, embedding, label) rows."""
    parted = df.withColumn("part", F.expr(part_mix(p, seed)))
    return parted.groupBy("part").applyInPandas(
        _partition_coreset(kprime, m), CORESET_SCHEMA
    )


ASSIGN_SCHEMA = (
    "part int, vec_id bigint, label int, center_rank int, "
    "dist_to_center double, embedding array<double>"
)


def _partition_assign(kprime: int):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        X = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype(np.float64)
        chosen, _, _ = K.farthest_first(X, kprime, start=0)
        assign = K.assign_to_centers(X, chosen)
        dists = np.array(
            [K.l2_to_point(X[i : i + 1], X[chosen[assign[i]]])[0] for i in range(len(X))]
        )
        return pd.DataFrame(
            {
                "part": pdf["part"],
                "vec_id": pdf["vec_id"],
                "label": pdf["label"],
                "center_rank": assign.astype(int),
                "dist_to_center": dists,
                "embedding": pdf["embedding"],
            }
        )

    return fn


def cluster_assignments(
    df: DataFrame, p: int = 4, kprime: int = 8, seed: int = 42
) -> DataFrame:
    """Every point tagged with its (partition, cluster) — the substrate
    for matroid-aware delegate selection (windowed top-m per
    (cluster, category), SURVEY.md §2.2-I div_matroid_partition)."""
    parted = df.withColumn("part", F.expr(part_mix(p, seed)))
    return parted.groupBy("part").applyInPandas(
        _partition_assign(kprime), ASSIGN_SCHEMA
    )


def collect_coreset(coreset_df: DataFrame):
    """Compose (union is implicit — one DataFrame) and materialize the
    coreset on the driver for the sequential finish: returns
    (ids, labels, X, weights) sorted by vec_id."""
    rows = coreset_df.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    labels = np.array([r["label"] for r in rows])
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    w = np.array([r["weight"] for r in rows])
    return ids, labels, X, w


def _weighted_partition_coreset(kprime: int):
    """Level-2+ kernel: points already CARRY weights (they are a
    lower level's coreset); the kernel keeps farthest-first geometry
    and each kernel point absorbs the total weight of the points
    assigned to it — the invariant that makes composition lossless
    in mass at every level."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        X = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype(
            np.float64
        )
        chosen, _, _ = K.farthest_first(X, kprime, start=0)
        assign = K.assign_to_centers(X, chosen)
        w_in = pdf["weight"].to_numpy()
        w_out = np.zeros(len(chosen), dtype=np.int64)
        for i, a in enumerate(assign):
            w_out[a] += w_in[i]
        rows = []
        for rank, idx in enumerate(chosen):
            rows.append(
                (
                    int(pdf["part"].iloc[0]),
                    int(pdf["vec_id"].iloc[idx]),
                    int(pdf["label"].iloc[idx]),
                    1,
                    rank,
                    0.0,
                    int(w_out[rank]),
                    list(map(float, X[idx])),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "part", "vec_id", "label", "is_kernel", "center_rank",
                "dist_to_center", "weight", "embedding",
            ],
        )

    return fn


def tree_coreset(
    df: DataFrame,
    p1: int = 8,
    p2: int = 2,
    kprime: int = 16,
    seed: int = 42,
) -> DataFrame:
    """TWO-LEVEL composable-coreset tree (the composability theorem
    exercised, not just asserted): level 1 builds p1 per-partition
    coresets from the raw points; level 2 groups those coresets into
    p2 groups and runs the WEIGHTED kernel over them, so the final
    coreset is a coreset-of-coresets whose weights still sum to n.
    This is the multi-round MapReduce shape a 100 TB input needs
    when p1 coresets are themselves too many to union on one node:
    tree fan-in bounds every task's input at max(n/p1, p1*k'/p2,
    p2*k') rows — each level is one groupBy + one Arrow kernel."""
    lvl1 = mr_coreset(df, p=p1, kprime=kprime, m=0, seed=seed)
    regrouped = lvl1.filter(F.col("is_kernel") == 1).select(
        F.pmod(F.col("part").cast("bigint"), F.lit(p2)).cast("int").alias("part"),
        "vec_id",
        "label",
        "weight",
        "embedding",
    )
    return regrouped.groupBy("part").applyInPandas(
        _weighted_partition_coreset(kprime), CORESET_SCHEMA
    )
