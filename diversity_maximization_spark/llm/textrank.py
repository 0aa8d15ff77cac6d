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


_R_SCALE = 1_000_000_000_000  # rank fixed-point scale (1e12)
_P_SCALE = 1_000_000  # transition-probability fixed-point scale (1e6)
_EXACT_ITERS = 10
_EXACT_TOPN = 25


def _pagerank_exact_oracle(
    iters: int = _EXACT_ITERS, as_float: bool = False
) -> str:
    """Unrolled scaled-integer PageRank in DuckDB — bit-exact vs the
    Spark loop because every operation is integer floor division /
    multiply / sum (order-independent), never a float. Same
    unrolled-iteration discipline as graph_lpa_communities.
    ``as_float`` emits the rank as a rounded double (rank_scaled /
    1e12) — the text_pagerank presentation of the same integers."""
    head = f"""
WITH bg AS (
  SELECT b.w1 AS src, b.w2 AS dst FROM (
    SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                  i -> {{'w1': ws[i], 'w2': ws[i + 1]}})) AS b
    FROM (SELECT string_split(text, ' ') AS ws FROM documents))
  WHERE b.w1 <> b.w2
), sym AS (
  SELECT src, dst FROM bg UNION ALL SELECT dst AS src, src AS dst FROM bg
), edges AS (
  SELECT src, dst, count(*) AS w FROM sym GROUP BY src, dst
), trans AS (
  SELECT e.src, e.dst, (e.w * {_P_SCALE}) // o.out_w AS p_scaled
  FROM edges e JOIN (SELECT src, SUM(w) AS out_w FROM edges GROUP BY src) o
    ON e.src = o.src
), nn AS (
  SELECT count(DISTINCT src) AS n FROM trans
), consts AS (
  SELECT n, {_R_SCALE} // n AS r_init,
         ((15 * {_R_SCALE}) // 100) // n AS base FROM nn
), r0 AS (
  SELECT src, (SELECT r_init FROM consts) AS rank_scaled
  FROM (SELECT DISTINCT src FROM trans)
)"""
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f"""
, r{i} AS (
  SELECT t.dst AS src,
         (SELECT base FROM consts)
           + (85 * SUM((r.rank_scaled * t.p_scaled) // {_P_SCALE})) // 100
           AS rank_scaled
  FROM trans t JOIN r{i - 1} r ON t.src = r.src
  GROUP BY t.dst
)""")
    if as_float:
        # Round in EXACT INTEGER space, not via round(x, 10): DuckDB's
        # decimal-scaling rounding and Spark's BigDecimal HALF_UP can
        # disagree when rank_scaled % 100 == 50 lands exactly on a
        # 10-dp tie (the _duck_pyround6 finding class). Half-up in
        # bigint — (x + 50) // 100 for the all-positive ranks here —
        # then ONE exact double division by 1e10 is bit-identical in
        # both engines (the quotient <= 1e10 is exactly representable).
        tail = f"""
SELECT src AS word,
       CAST((rank_scaled + 50) // 100 AS DOUBLE) / 10000000000.0 AS rank
FROM r{iters}
ORDER BY rank_scaled DESC, word LIMIT {_EXACT_TOPN}
"""
    else:
        tail = f"""
SELECT src AS word, CAST(rank_scaled AS BIGINT) AS rank_scaled FROM r{iters}
ORDER BY rank_scaled DESC, word LIMIT {_EXACT_TOPN}
"""
    return head + "".join(rounds) + tail


def _pagerank_scaled_ranks(
    spark: SparkSession, sf_dir: str, iters: int
) -> DataFrame:
    """Shared scaled-integer PageRank kernel (see text_pagerank_exact
    for the exactness/overflow argument): (src, rank_scaled) after
    ``iters`` rounds."""
    d = load(spark, sf_dir, "documents")
    edges = word_edges(d)
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    trans = (
        edges.join(out_w, "src")
        .select(
            "src",
            "dst",
            F.expr(f"(w * {_P_SCALE}) div out_w").alias("p_scaled"),
        )
        .cache()
    )
    n = trans.select("src").distinct().count()
    r_init = _R_SCALE // n
    base = ((15 * _R_SCALE) // 100) // n
    ranks = trans.select("src").distinct().select(
        "src", F.lit(r_init).cast("long").alias("rank_scaled")
    )
    for i in range(iters):
        ranks = (
            trans.join(ranks, "src")
            .groupBy("dst")
            .agg(
                F.sum(
                    F.expr(f"(rank_scaled * p_scaled) div {_P_SCALE}")
                ).alias("in_sum")
            )
            .select(
                F.col("dst").alias("src"),
                (F.lit(base) + F.expr("(85 * in_sum) div 100"))
                .cast("long")
                .alias("rank_scaled"),
            )
        )
        if (i + 1) % 5 == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


@query("text_pagerank_exact", oracle=_pagerank_exact_oracle())
def text_pagerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-exact TextRank tier: the same PageRank recurrence in
    SCALED-INTEGER arithmetic (rank at 1e12 fixed point, transition
    probabilities quantized to 1e6), so every per-edge contribution is
    a bigint and the per-node sum is order-independent — the float
    version's 10-dp rounding tolerance becomes exact equality the
    DuckDB oracle can hash-match. Same plan shape as text_pagerank
    (one equi-join shuffle per round over the edge table, node-sized
    rank state); floor division is identical in Spark (`div`) and
    DuckDB (`//`) for the all-positive operands here. Overflow-safe:
    rank <= 1e12 and p_scaled <= 1e6, so rank * p_scaled <= 1e18 <
    2^63. Output: top-{_EXACT_TOPN} (word, rank_scaled) — integers and
    strings only."""
    ranks = _pagerank_scaled_ranks(spark, sf_dir, _EXACT_ITERS)
    return (
        ranks.select(F.col("src").alias("word"), "rank_scaled")
        .orderBy(F.col("rank_scaled").desc(), "word")
        .limit(_EXACT_TOPN)
    )


@query(
    "text_pagerank",
    oracle=_pagerank_exact_oracle(iters=_ITERS, as_float=True),
)
def text_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 corpus keywords by TextRank, float presentation. Per
    iteration: contrib(u->v) = rank(u) * w(u,v) / out_w(u); rank(v)
    updates to (1-d)/N + d * sum contrib. One shuffle per round on
    the word key; the rank table stays node-sized. Ties broken by
    word.

    Re-pointed at the PROVEN scaled-integer tier (r6 verdict item 5):
    the recurrence runs in 1e12/1e6 fixed point (order-independent
    bigint sums - see text_pagerank_exact), and only the final
    presentation divides back to a rounded double. The quantization
    perturbs each rank by < 1e-6 relative, deterministically, so this
    key is now hash-checked end to end instead of rows-only (the old
    float power iteration was rows-only precisely because its
    distributed float sums were order-nondeterministic)."""
    ranks = _pagerank_scaled_ranks(spark, sf_dir, _ITERS)
    # 10-dp presentation via exact-integer half-up then one exact
    # double division (see _pagerank_exact_oracle tail) — never
    # F.round on a double, which can tie-break differently from the
    # oracle's round() when rank_scaled % 100 == 50.
    return (
        ranks.select(
            F.col("src").alias("word"),
            (
                F.expr("(rank_scaled + 50) div 100").cast("double")
                / F.lit(10_000_000_000.0)
            ).alias("rank"),
        )
        .orderBy(F.col("rank_scaled").desc(), "word")
        .limit(_TOPN)
    )
