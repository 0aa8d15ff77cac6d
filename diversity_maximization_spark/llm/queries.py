"""LLM-pipeline query registrations (SURVEY.md §2.2-L)."""

from . import dedup, multimodal, simsearch, textstats  # noqa: F401


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
       list_transform({V.duck_l2_normalize('embedding')}, x -> round(x, 6)) AS unit_vec,
       round(sqrt({V.duck_sq_norm('embedding')}), 6) AS norm
FROM embeddings
""",
)
def embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize the embedding column — pure higher-order SQL."""
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> round(CAST(x AS DOUBLE) / "
            "sqrt(aggregate(zip_with(embedding, embedding, (p, q) -> "
            "CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), CAST(0 AS DOUBLE), "
            "(s, v) -> s + v)), 6))"
        ).alias("unit_vec"),
        F.round(F.sqrt(V.sq_norm("embedding")), 6).alias("norm"),
    )
