"""Flagship end-to-end diversity query (SURVEY.md §7 M1).

embeddings → MapReduce composable coreset (distributed: partition,
per-partition farthest-first kernel + delegates via applyInPandas) →
driver-side GMM (farthest-first) finish on the composed coreset →
remote-edge / remote-clique evaluation of the chosen set → result
DataFrame. This is exactly the reference's EP1 batch pipeline
(SURVEY.md §3.1) re-expressed Spark-first.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from ..sources import load
from . import kernel as K
from .coreset import collect_coreset, mr_coreset


def flagship(
    spark: SparkSession,
    sf_dir: str,
    p: int = 4,
    kprime: int = 16,
    m: int = 1,
    k: int = 10,
) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    coreset = mr_coreset(emb, p=p, kprime=kprime, m=m, seed=42)
    ids, labels, X, _w = collect_coreset(coreset)

    chosen, dist_when, _ = K.farthest_first(X, k, start=0)
    D = K.pairwise_l2(X[chosen])
    edge = round(K.eval_edge(D), 6)
    clique = round(K.eval_clique(D), 6)

    rows = [
        (
            rank,
            int(ids[c]),
            int(labels[c]),
            round(float(dist_when[rank]), 6),
            edge,
            clique,
        )
        for rank, c in enumerate(chosen)
    ]
    return spark.createDataFrame(
        rows,
        "sel_order int, vec_id bigint, label int, dist_when_chosen double, "
        "edge_div double, clique_div double",
    )
