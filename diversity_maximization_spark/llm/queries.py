"""LLM-pipeline query registrations (SURVEY.md §2.2-L)."""

from . import dedup, multimodal, simsearch, textstats, transforms  # noqa: F401


# embed_normalize lives here (pure-SQL twin of udf_scalar_pandas)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vector as V
from ..registry import query
from ..sources import load


@query(
    "embed_normalize",
    oracle=f"""
SELECT vec_id,
       array_to_string(list_transform({V.duck_l2_normalize('embedding')},
         x -> CAST(round(x * 1000000) AS BIGINT)), ',') AS unit_vec_q,
       round(sqrt({V.duck_sq_norm('embedding')}), 6) AS norm
FROM embeddings
""",
)
def embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize the embedding column — pure higher-order SQL.

    The normalized vector is serialized as comma-joined 1e6-scaled
    int64 (driver canonicalizer cannot hash list cells; int formatting
    is engine-identical, float formatting is not)."""
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.array_join(
            F.expr(
                "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) / "
                "sqrt(aggregate(zip_with(embedding, embedding, (p, q) -> "
                "CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), CAST(0 AS DOUBLE), "
                "(s, v) -> s + v)) * 1000000) AS BIGINT))"
            ),
            ",",
        ).alias("unit_vec_q"),
        F.round(F.sqrt(V.sq_norm("embedding")), 6).alias("norm"),
    )


@query(
    "embed_quantize",
    oracle="""
SELECT vec_id,
       array_to_string(list_transform(embedding,
         x -> CAST(round(CAST(x AS DOUBLE) * 127 /
                list_aggregate(list_transform(embedding,
                               y -> abs(CAST(y AS DOUBLE))), 'max'))
              AS BIGINT)), ',') AS q8,
       round(list_aggregate(list_transform(embedding,
             y -> abs(CAST(y AS DOUBLE))), 'max') / 127, 6) AS scale
FROM embeddings
""",
)
def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column
    (q = round(127 * x / max|x|), per-vector scale) — the standard
    memory-4x-reduction step before ANN indexing of a 100 TB corpus.
    Integer outputs are hash-exact across engines. A narrow map, no
    shuffle. (Expression form re-derives the max per element after
    projection collapse — O(d^2) per row, fine at d=64; for large d
    the same map runs in one pass per vector as an Arrow-batched
    mapInPandas, like multimodal_features.)"""
    e = load(spark, sf_dir, "embeddings")
    amax = "aggregate(embedding, CAST(0 AS DOUBLE), (s, y) -> greatest(s, abs(CAST(y AS DOUBLE))))"
    return e.select(
        "vec_id",
        F.array_join(
            F.expr(
                f"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 127 / {amax}) AS BIGINT))"
            ),
            ",",
        ).alias("q8"),
        F.expr(f"round({amax} / 127, 6)").alias("scale"),
    )
