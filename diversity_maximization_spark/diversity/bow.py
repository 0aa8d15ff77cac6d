"""Bag-of-words points (SURVEY.md §1.1: the reference's sparse
`ArrayBagOfWords` substrate, used for its musiXmatch song
experiments). Documents become fixed-dim vectors by feature hashing —
word -> pmod(xxhash64(word), dim) bucket, counts summed per bucket —
entirely JVM-side (explode / groupBy / map_from_entries / transform),
so the vectorization is one shuffle of (doc, bucket) pairs and scales
like any aggregation. The hashed vectors then flow through the SAME
diversity pipeline as dense embeddings (GMM, coresets, evaluators) —
exactly how the reference treats BoW points as just another metric
space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load
from . import kernel as K
from .coreset import collect_coreset, mr_coreset

BOW_DIM = 64


def bow_vectors(d: DataFrame, dim: int = BOW_DIM) -> DataFrame:
    """(doc_id, embedding array<double>, label) — feature-hashed word
    counts; label = a hash bucket of `lang` so the matroid machinery
    works unchanged on BoW points."""
    words = d.select(
        "doc_id",
        "lang",
        F.explode(F.split("text", " ")).alias("word"),
    ).filter(F.length("word") > 0)
    buckets = words.groupBy(
        "doc_id",
        "lang",
        F.pmod(F.xxhash64("word"), F.lit(dim)).cast("int").alias("bucket"),
    ).agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    dense = (
        buckets.groupBy("doc_id", "lang")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("bucket", "cnt")))
            ).alias("m")
        )
        .select(
            F.col("doc_id").alias("vec_id"),
            F.expr(
                f"transform(sequence(0, {dim - 1}), "
                f"i -> coalesce(element_at(m, i), CAST(0 AS DOUBLE)))"
            ).alias("embedding"),
            F.pmod(F.xxhash64("lang"), F.lit(4)).cast("int").alias("label"),
        )
    )
    return dense


@query("bow_vectorize")  # rows-only: hash family is engine-specific
def bow_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents -> feature-hashed BoW vectors (norm + nnz exposed so
    the driver check sees stable values)."""
    d = load(spark, sf_dir, "documents")
    v = bow_vectors(d)
    return v.select(
        "vec_id",
        "label",
        F.expr(
            "CAST(aggregate(transform(embedding, x -> CAST(x > 0 AS INT)), 0, (s, b) -> s + b) AS INT)"
        ).alias("nnz"),
        F.round(
            F.expr(
                "sqrt(aggregate(transform(embedding, x -> x * x), "
                "CAST(0 AS DOUBLE), (s, v) -> s + v))"
            ),
            6,
        ).alias("l2_norm"),
    )


@query("div_gmm_bow")  # rows-only: seeded; invariants in tests
def div_gmm_bow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference musiXmatch parity: diversity maximization over BoW
    points under COSINE distance — coreset the hashed vectors (the
    same MapReduce kernel as dense embeddings), then cosine GMM k=8
    on the collected coreset."""
    d = load(spark, sf_dir, "documents")
    v = bow_vectors(d)
    cs = mr_coreset(v, p=4, kprime=16, m=1)
    ids, labels, X, w = collect_coreset(cs)
    chosen, dist_when, _ = K.farthest_first(X, 8, start=0, metric="cosine")
    rows = [
        (rank, int(ids[c]), round(float(dist_when[rank]), 6))
        for rank, c in enumerate(chosen)
    ]
    return spark.createDataFrame(
        rows, "sel_order int, doc_id bigint, cos_dist_when_chosen double"
    )
