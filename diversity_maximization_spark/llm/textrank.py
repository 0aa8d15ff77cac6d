"""TextRank keyword extraction: PageRank over the corpus word
co-occurrence graph (Mihalcea & Tarau 2004; Page et al. 1999).

Graph: an undirected edge per distinct consecutive word pair,
weighted by corpus frequency (both directions materialized, so every
node has out-edges and no dangling-mass correction is needed).
PageRank shape at scale: the edge table is the big operand — each
iteration is ONE shuffle (join ranks on src, re-aggregate on dst);
ranks are a small per-node table. Edges pre-normalize w/out_weight
once and cache; iterations localCheckpoint every 5 rounds to keep
the plan flat. Deterministic: fixed iteration count, exact float
expression per round, and the per-node incoming sum uses a sorted
fold only implicitly — floats are summed by Spark's partial aggs, so
ranks are rounded to 10 dp at the output to absorb reduction-order
noise (verified stable across runs in tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load

_DAMPING = 0.85
_ITERS = 15
_TOPN = 25


def word_edges(d: DataFrame) -> DataFrame:
    """Symmetric weighted bigram edges (src, dst, w)."""
    ws = d.select(F.split("text", " ").alias("ws"))
    pairs = ws.select(
        F.posexplode("ws").alias("pos", "src"),
        F.expr("ws").alias("ws"),
    ).select(
        "src", F.expr("get(ws, pos + 1)").alias("dst")
    ).filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
    sym = pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return sym.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))


@query("text_pagerank")  # rows-only: iterative fixpoint, not SQL-expressible
def text_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TOPN} corpus keywords by TextRank. Per iteration:
    contrib(u->v) = rank(u) * w(u,v) / out_w(u); rank'(v) =
    (1-d)/N + d * sum contrib. One shuffle per round on the word key;
    the rank table stays node-sized. Ties broken by word."""
    d = load(spark, sf_dir, "documents")
    edges = word_edges(d)
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    # normalized transition weight, computed once
    trans = (
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .cache()
    )
    n = trans.select("src").distinct().count()
    ranks = trans.select("src").distinct().select(
        "src", F.lit(1.0 / n).alias("rank")
    )
    base = (1.0 - _DAMPING) / n
    for i in range(_ITERS):
        contribs = (
            trans.join(ranks, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("in_sum"))
        )
        ranks = contribs.select(
            F.col("dst").alias("src"),
            (F.lit(base) + F.lit(_DAMPING) * F.col("in_sum")).alias("rank"),
        )
        if (i + 1) % 5 == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return (
        ranks.select(F.col("src").alias("word"), F.round("rank", 10).alias("rank"))
        .orderBy(F.col("rank").desc(), "word")
        .limit(_TOPN)
    )
