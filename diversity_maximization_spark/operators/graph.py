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
from pyspark.sql.window import Window

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


@query(
    "graph_triangle_count",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), edges AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
), verts AS (
  SELECT u AS x FROM edges UNION SELECT v FROM edges
)
SELECT
  (SELECT COUNT(*) FROM verts) AS n_vertices,
  (SELECT COUNT(*) FROM edges) AS n_edges,
  (SELECT COUNT(*)
     FROM edges e1
     JOIN edges e2 ON e2.u = e1.v
     JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
""",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the part co-purchase graph (parts are
    adjacent iff some order contains both). The scale-correct plan is
    the degree-oriented wedge join (Cohen's MapReduce triangle
    algorithm / "node-iterator++"): orient every undirected edge from
    its lower-(degree, id) endpoint to the higher one, join oriented
    edges head-to-tail to enumerate wedges, then close each wedge
    with a semi-join back against the oriented edge set. Orientation
    bounds out-degree by O(sqrt(m)), so the wedge shuffle is
    O(m^{3/2}) worst-case instead of sum(deg^2) — the difference
    between feasible and not on a skewed 100 TB co-occurrence graph.
    Each triangle has exactly one source-of-two-out-edges vertex
    under a total order, so the count needs no de-dup division.
    The oracle counts the same triangles with the naive u<v<w
    three-way join (fine at oracle scale, wrong shape at 100 TB —
    intentionally naive, see PLANS.md)."""
    return triangle_count(_copurchase_edges(spark, sf_dir))


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected (u < v) part co-purchase edges."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    other = li.select(F.col("o"), F.col("p").alias("q"))
    return (
        li.join(other, "o")
        .filter(F.col("p") < F.col("q"))
        .select(F.col("p").alias("u"), F.col("q").alias("v"))
        .distinct()
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Degree-oriented triangle counting over any (u, v) undirected
    edge DataFrame (edges must be distinct with u < v). Returns one
    row (n_vertices, n_edges, n_triangles). See graph_triangle_count
    for the scale analysis."""
    # Degree of every endpoint, then orient by (degree, id).
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    # deg is |V|-sized (unbounded at 100 TB) — no forced broadcast;
    # AQE promotes it to a broadcast join when it measures small.
    with_deg = edges.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("t"),
    )
    wedges = oriented.alias("e1").join(
        oriented.alias("e2"), F.col("e1.t") == F.col("e2.s")
    ).select(
        F.col("e1.s").alias("a"),
        F.col("e1.t").alias("b"),
        F.col("e2.t").alias("c"),
    )
    closing = oriented.select(F.col("s").alias("a"), F.col("t").alias("c"))
    tri = wedges.join(closing, ["a", "c"], "left_semi")

    n_vertices = deg.agg(F.count(F.lit(1)).alias("n"))
    n_edges = edges.agg(F.count(F.lit(1)).alias("n"))
    n_tri = tri.agg(F.count(F.lit(1)).alias("n"))
    return (
        n_vertices.select(F.col("n").alias("n_vertices"))
        .crossJoin(n_edges.select(F.col("n").alias("n_edges")))
        .crossJoin(n_tri.select(F.col("n").alias("n_triangles")))
    )


@query(
    "graph_degree_stats",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), edges AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
), deg AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS x FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY x
)
SELECT d AS degree, CAST(COUNT(*) AS BIGINT) AS n_vertices
FROM deg GROUP BY d
""",
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the co-purchase graph — the first thing an
    analyst plots before choosing a graph algorithm (and the input to
    the orientation bound graph_triangle_count relies on). Two
    narrow-key aggregations; the edge materialization is shared
    logic with graph_triangle_count and at 100 TB would be a
    persisted intermediate (see sink_compact)."""
    edges = _copurchase_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_vertices"))


BFS_MAX_HOPS = 4


@query(
    "graph_bfs_hops",
    oracle=f"""
WITH RECURSIVE pairs AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), edges AS (
  SELECT a.p AS u, b.p AS v
  FROM pairs a JOIN pairs b ON a.o = b.o AND a.p <> b.p
), walk AS (
  SELECT CAST((SELECT MIN(l_partkey) FROM lineitem) AS BIGINT) AS node,
         CAST(0 AS BIGINT) AS d
  UNION
  SELECT e.v AS node, walk.d + 1 AS d
  FROM walk JOIN edges e ON e.u = walk.node
  WHERE walk.d < {BFS_MAX_HOPS}
)
SELECT d AS hops, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM (
  SELECT node, MIN(d) AS d FROM walk GROUP BY node
) GROUP BY d
""",
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first reachability from a fixed source (the minimum
    part key) over the co-purchase graph: how many parts sit at each
    hop distance — the neighborhood-growth curve behind
    recommendation radius and blast-radius questions. The engine
    runs LEVEL-SYNCHRONOUS FRONTIER BFS: each round joins only the
    current frontier against the edge list (one equi-join shuffle
    per level, frontier-sized, never whole-graph), anti-joins the
    visited set, and stops at {BFS_MAX_HOPS} hops or an empty
    frontier — the textbook Pregel iteration as plain DataFrame
    joins. The oracle walks the same levels with a recursive CTE
    whose UNION dedup bounds the recursion (hop cap mirrors the
    engine's)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    other = li.select(F.col("o"), F.col("p").alias("q"))
    edges = (
        li.join(other, "o")
        .filter(F.col("p") != F.col("q"))
        .select(F.col("p").alias("u"), F.col("q").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    src = li.agg(F.min("p")).collect()[0][0]
    spark_ = edges.sparkSession
    visited = spark_.createDataFrame(
        [(int(src), 0)], "node bigint, d bigint"
    ).localCheckpoint(eager=True)
    frontier = visited
    for depth in range(1, BFS_MAX_HOPS + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .withColumn("d", F.lit(depth).cast("bigint"))
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            break
        visited = visited.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited.groupBy(F.col("d").alias("hops")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )


KCORE_K = 12

# Peel rounds the oracle unrolls. Peeling is idempotent once the
# fixpoint is reached, so any unroll >= the convergence round count is
# exact; the co-purchase graph converges in 1 round at sf0.01 AND
# sf0.1 (measured: no vertex falls under degree 12), and 4 rounds
# leaves margin for sparser fixtures. The engine loop below still runs
# to the true fixpoint — the bound only shapes the DuckDB oracle.
_KCORE_ORACLE_ROUNDS = 4


def _kcore_oracle() -> str:
    """Unrolled-peeling DuckDB oracle: degree-filter + edge-trim per
    round, exactly the engine's per-round semantics (integer-only, so
    hash-exact). Same unrolled-fixpoint discipline as
    graph_lpa_communities' round unroll."""
    # MATERIALIZED is load-bearing: each round references the previous
    # edge CTE five times (directly + twice through the degree CTE),
    # so DuckDB's default inlining re-expands the co-purchase
    # self-join 5^rounds times and spills to disk.
    parts = [
        "WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),",
        "e0 AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v FROM li a JOIN li b ON a.o = b.o AND a.p < b.p)",
    ]
    for r in range(_KCORE_ORACLE_ROUNDS):
        parts.append(
            f", k{r} AS MATERIALIZED (SELECT x FROM (SELECT u AS x FROM e{r} UNION ALL "
            f"SELECT v AS x FROM e{r}) GROUP BY x HAVING count(*) >= {KCORE_K})"
        )
        parts.append(
            f", e{r + 1} AS MATERIALIZED (SELECT u, v FROM e{r} WHERE u IN (SELECT x FROM k{r}) "
            f"AND v IN (SELECT x FROM k{r}))"
        )
    last = _KCORE_ORACLE_ROUNDS
    parts.append(
        f" SELECT x AS node, count(*) AS core_degree FROM "
        f"(SELECT u AS x FROM e{last} UNION ALL SELECT v AS x FROM e{last}) "
        f"GROUP BY x"
    )
    return "\n".join(parts)


@query("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-core of the co-purchase graph (k=KCORE_K=12): iteratively
    peel vertices of degree < k until a fixpoint — the standard dense-
    subgraph/community seed and the cheapest 'influential node'
    filter. Each round is two aggregate-shaped jobs (degree count +
    filter) and two semi-joins trimming the edge list; the loop
    converges in a handful of rounds (peeling cascades), with
    localCheckpoint keeping lineage flat — the same iterative-join
    discipline as connected components and pointer jumping. Output:
    the surviving vertices with their within-core degree. Exactness
    is pinned by tests/test_graph_profile_ts.py against a local
    NetworkX-free python peeling replay."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    while True:
        deg = (
            edges.select(F.col("u").alias("x"))
            .unionAll(edges.select(F.col("v").alias("x")))
            .groupBy("x")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= KCORE_K).select("x")
        n_before = edges.count()
        edges = (
            edges.join(keep.withColumnRenamed("x", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("x", "v"), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
        if edges.count() == n_before:
            break
    return (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )

def neighbor_jaccard_over(
    df, basket_col: str, item_col: str, min_jaccard: float = 0.2
):
    """Item-item Jaccard similarity over any (basket, item)
    co-occurrence table: inverted-index self-join on the basket key
    (pairs exist only where a shared basket exists — posting-list
    work, not all-pairs), degrees joined back from the tiny
    per-item table, exact-integer Jaccard quotient thresholded.
    Single kernel shared by the registered graph_neighbor_jaccard
    query and api.neighbor_jaccard so fixes reach both surfaces."""
    li = df.select(
        F.col(basket_col).alias("o"), F.col(item_col).alias("p")
    ).distinct()
    deg = li.groupBy("p").agg(F.count(F.lit(1)).alias("d"))
    other = li.select("o", F.col("p").alias("q"))
    common = (
        li.join(other, "o")
        .filter(F.col("p") < F.col("q"))
        .groupBy(F.col("p").alias("u"), F.col("q").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("da") + F.col("db") - F.col("n_common")
    )
    return (
        common.join(
            deg.select(F.col("p").alias("u"), F.col("d").alias("da")), "u"
        )
        .join(
            deg.select(F.col("p").alias("v"), F.col("d").alias("db")), "v"
        )
        .filter(jac >= min_jaccard)
        .select("u", "v", "n_common", jac.alias("jaccard"))
    )


@query(
    "graph_neighbor_jaccard",
    oracle="""
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), deg AS (
  SELECT p, COUNT(*) AS d FROM op GROUP BY p
), common AS (
  SELECT a.p AS u, b.p AS v, COUNT(*) AS n_common
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
)
SELECT u, v, n_common,
       CAST(n_common AS DOUBLE)
         / (da.d + db.d - n_common) AS jaccard
FROM common
JOIN deg da ON da.p = u
JOIN deg db ON db.p = v
WHERE CAST(n_common AS DOUBLE) / (da.d + db.d - n_common) >= 0.2
""",
)
def graph_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item neighborhood Jaccard similarity over the bipartite
    order-part graph — the classic collaborative-filtering
    candidate generator: parts whose ORDER sets overlap strongly
    (|N(u) n N(v)| / |N(u) u N(v)| >= 0.2). Co-occurrence pairs
    come from the inverted-index self-join on the order key (pairs
    exist only where a shared order exists — posting-list work, not
    all-pairs); degrees join back from a tiny per-part table. At
    scale the per-order pair fan-out is bounded by basket size, the
    same O(sum b^2) guarantee every co-occurrence pipeline relies
    on; a hot mega-basket would be capped upstream. Exact-integer
    Jaccard quotient, unrounded. Delegates to neighbor_jaccard_over
    (shared with the api surface)."""
    return neighbor_jaccard_over(
        load(spark, sf_dir, "lineitem"),
        "l_orderkey",
        "l_partkey",
        min_jaccard=0.2,
    )

LPA_ROUNDS = 5


def _lpa_oracle() -> str:
    """DuckDB replay of the synchronous deterministic LPA: the same
    co-purchase edge derivation, then LPA_ROUNDS UNROLLED rounds —
    each one neighbor-label counting + (count desc, label asc)
    arg-max + keep-own-on-no-winner — ending with community sizes.
    Unrolling (not recursion) because each round REPLACES the label
    table, which recursive-CTE union semantics cannot express."""
    last = f"l{LPA_ROUNDS}"
    prefix = _lpa_chain_prefix(_lpa_rounds_ctes())
    return (
        prefix
        + f"""
SELECT t.node, t.lbl AS community, CAST(s.cnt AS BIGINT) AS community_size
FROM {last} t
JOIN (SELECT lbl, COUNT(*) AS cnt FROM {last} GROUP BY lbl) s USING (lbl)
"""
    )


def _lpa_rounds_ctes() -> list[str]:
    """The per-round CTE blocks of the unrolled LPA replay (shared by
    the graph_lpa_communities and graph_modularity oracles)."""
    rounds = []
    for r in range(LPA_ROUNDS):
        prev, cur = f"l{r}", f"l{r + 1}"
        rounds.append(f"""c{r} AS MATERIALIZED (
  SELECT e.src AS node, l.lbl AS nl, COUNT(*) AS n
  FROM ed e JOIN {prev} l ON l.node = e.dst GROUP BY 1, 2
), w{r} AS MATERIALIZED (
  SELECT node, nl,
         ROW_NUMBER() OVER (PARTITION BY node ORDER BY n DESC, nl) AS rn
  FROM c{r}
), {cur} AS MATERIALIZED (
  SELECT p.node, COALESCE(w.nl, p.lbl) AS lbl
  FROM {prev} p LEFT JOIN (SELECT node, nl FROM w{r} WHERE rn = 1) w
    USING (node)
)""")
    return rounds


def _lpa_chain_prefix(rounds: list[str]) -> str:
    """WITH-clause prefix: co-purchase edges + l0 + the round chain.
    Every CTE is MATERIALIZED — the modularity oracle references
    und/ed/l{LPA_ROUNDS} several times each, and DuckDB's default
    inlining would re-expand the whole round chain per reference
    (the multiplicative blow-up that filled the disk at sf0.1)."""
    return f"""
WITH op AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), und AS MATERIALIZED (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
), ed AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM und
  UNION ALL SELECT v AS src, u AS dst FROM und
), l0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, src AS lbl FROM ed
), {', '.join(rounds)}"""


def _lpa_labels(edges: DataFrame) -> DataFrame:
    """Run LPA_ROUNDS of deterministic synchronous label propagation
    over distinct undirected (u < v) edges; returns (node, lbl).
    Shared kernel of graph_lpa_communities and graph_modularity —
    see graph_lpa_communities for the determinism contract."""
    directed = (
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(
            edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    labels = (
        directed.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    def lpa_round(labels: DataFrame, r: int) -> DataFrame:
        nbr = directed.join(
            labels.withColumnRenamed("node", "dst").withColumnRenamed(
                "lbl", "nbr_lbl"
            ),
            "dst",
        )
        counts = nbr.groupBy(
            F.col("src").alias("node"), F.col("nbr_lbl")
        ).agg(F.count(F.lit(1)).alias("n"))
        w = Window.partitionBy("node").orderBy(
            F.col("n").desc(), F.col("nbr_lbl")
        )
        winner = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", F.col("nbr_lbl").alias("new_lbl"))
        )
        return labels.join(winner, "node", "left").select(
            "node",
            F.coalesce("new_lbl", "lbl").alias("lbl"),
        )

    # constant edge side -> linear stat growth: lineage-only barrier
    # eager=False (r11): fixed round count, constant edge side, no
    # per-round convergence action -> the whole propagation runs as
    # ONE job at the consumer's action instead of LPA_ROUNDS blocking
    # checkpoint jobs; plan truncation and stats behavior unchanged.
    return iterate_with_barrier(
        labels, lpa_round, LPA_ROUNDS, squaring=False, eager=False
    )


@query("graph_lpa_communities", oracle=_lpa_oracle())
def graph_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation over the
    part co-purchase graph, made fully deterministic: every vertex
    starts as its own label; each of LPA_ROUNDS rounds every vertex
    simultaneously adopts its neighborhood's most frequent label
    (ties -> smallest label; a vertex with no neighbors keeps its
    own). Each round is ONE shuffle of the directed edge list joined
    to the current labels plus a per-vertex arg-max window — the
    same bounded-rounds iterative-join discipline as pointer jumping
    and k-core, lineage kept flat with localCheckpoint. Output:
    (node, community, community_size). Exactness pinned against a
    pure-python synchronous replay in tests AND against a DuckDB
    oracle that unrolls the LPA_ROUNDS rounds in SQL (_lpa_oracle) —
    the fixed round count is what makes this iterative operator
    hash-checkable at all."""
    labels = _lpa_labels(_copurchase_edges(spark, sf_dir))
    sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("community_size"))
    return labels.join(sizes, "lbl").select(
        "node",
        F.col("lbl").alias("community"),
        "community_size",
    )


@query(
    "graph_degree_assortativity",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), und AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
), dir AS (
  SELECT u, v FROM und UNION ALL SELECT v, u FROM und
), deg AS (
  SELECT u AS x, CAST(COUNT(*) AS BIGINT) AS d FROM dir GROUP BY u
), e AS (
  SELECT du.d AS dx, dv.d AS dy
  FROM dir JOIN deg du ON dir.u = du.x JOIN deg dv ON dir.v = dv.x
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dx) AS BIGINT) AS sx,
         CAST(SUM(dx * dx) AS BIGINT) AS sxx,
         CAST(SUM(dx * dy) AS BIGINT) AS sxy
  FROM e
)
SELECT (SELECT COUNT(*) FROM deg) AS n_vertices,
       (SELECT COUNT(*) FROM und) AS n_edges,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         AS assortativity
FROM m
""",
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part co-order graph — do
    high-degree parts co-occur with high-degree parts? Pearson
    correlation of endpoint degrees over the DIRECTED edge list
    (each undirected edge both ways, so sum(dx) = sum(dy) and
    sum(dxx) = sum(dyy) by symmetry and the correlation needs only
    four integer sums). The moment sums are exact BIGINTs; the final
    expression casts each to double BEFORE multiplying (n*sxy would
    overflow int64 on large graphs) and evaluates in identical order
    on both engines — bit-exact, no rounding. Scale shape: edges are
    the within-order pair join (bounded by order width^2), degrees
    one groupBy, moments one aggregate. The edge table is
    localCheckpointed (r10, guide §5): it feeds THREE executions —
    n_vertices, n_edges and the moment aggregate — which uncheckpointed
    each re-ran the pair self-join + distinct from the scan."""
    li = load(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = pairs.alias("a")
    b = pairs.alias("b")
    und = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    dir_ = und.unionAll(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = dir_.groupBy(F.col("u").alias("x")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    e = (
        dir_.join(deg.select(F.col("x").alias("u"), F.col("d").alias("dx")), "u")
        .join(deg.select(F.col("x").alias("v"), F.col("d").alias("dy")), "v")
        .select("dx", "dy")
    )
    m = e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dx").cast("bigint").alias("sx"),
        F.sum(F.col("dx") * F.col("dx")).cast("bigint").alias("sxx"),
        F.sum(F.col("dx") * F.col("dy")).cast("bigint").alias("sxy"),
    )
    n_vertices = deg.count()
    n_edges = und.count()
    return m.select(
        F.lit(n_vertices).cast("bigint").alias("n_vertices"),
        F.lit(n_edges).cast("bigint").alias("n_edges"),
        (
            (
                F.col("n").cast("double") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
            / (
                F.col("n").cast("double") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
        ).alias("assortativity"),
    )


_PPR_R = 1_000_000_000_000
_PPR_P = 1_000_000
_PPR_ITERS = 10
_PPR_BRAND = "Brand#11"
_PPR_TOPN = 25


def _ppr_oracle() -> str:
    head = f"""
WITH pairs AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), und AS (
  SELECT a.p AS src, b.p AS dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM pairs a JOIN pairs b ON a.o = b.o AND a.p <> b.p
  GROUP BY a.p, b.p
), trans AS (
  SELECT e.src, e.dst, (e.w * {_PPR_P}) // o.out_w AS p_scaled
  FROM und e JOIN (SELECT src, SUM(w) AS out_w FROM und GROUP BY src) o
    ON e.src = o.src
), nodes AS (
  SELECT DISTINCT src FROM trans
), seeds AS (
  SELECT n.src FROM nodes n
  JOIN part p ON p.p_partkey = n.src AND p.p_brand = '{_PPR_BRAND}'
), ns AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_seeds FROM seeds
), r0 AS (
  SELECT n.src,
         CASE WHEN s.src IS NOT NULL
              THEN {_PPR_R} // (SELECT n_seeds FROM ns)
              ELSE 0 END AS rank_scaled
  FROM nodes n LEFT JOIN seeds s ON n.src = s.src
)"""
    rounds = []
    for i in range(1, _PPR_ITERS + 1):
        rounds.append(f"""
, r{i} AS (
  SELECT t.dst AS src,
         CASE WHEN s.src IS NOT NULL
              THEN ((15 * {_PPR_R}) // 100) // (SELECT n_seeds FROM ns)
              ELSE 0 END
           + (85 * SUM((r.rank_scaled * t.p_scaled) // {_PPR_P})) // 100
           AS rank_scaled
  FROM trans t JOIN r{i - 1} r ON t.src = r.src
  LEFT JOIN seeds s ON t.dst = s.src
  GROUP BY t.dst, s.src
)"""
        )
    tail = f"""
SELECT src AS p_partkey, CAST(rank_scaled AS BIGINT) AS rank_scaled
FROM r{_PPR_ITERS}
ORDER BY rank_scaled DESC, src LIMIT {_PPR_TOPN}
"""
    return head + "".join(rounds) + tail


@query("graph_ppr_exact", oracle=_ppr_oracle())
def graph_ppr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank on the part co-order graph, restarted at
    one brand's parts — 'which parts does THIS brand's purchase
    neighborhood actually reach' (the related-items / expansion
    primitive behind recommendation candidate generation). Same
    scaled-integer fixed-point recipe as text_pagerank_exact (rank
    1e12, transitions 1e6, floor division both engines, per-node
    sums order-independent bigints) with the restart mass
    concentrated on the seed set instead of uniform. One equi-join
    shuffle per iteration over the edge table; rank state stays
    node-sized; top-25 is TakeOrdered. The destination's seed flag
    is folded into the cached transition table ONCE (r10, guide
    §2.4): is_seed is functionally dependent on dst, so grouping by
    (dst, is_seed) — exactly the oracle's GROUP BY t.dst, s.src —
    replaces the former per-round broadcast join against the seed
    set with zero extra exchanges."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    pairs = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = pairs.alias("a")
    b = pairs.alias("b")
    und = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") != F.col("b.p")))
        .groupBy(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    out_w = und.groupBy("src").agg(F.sum("w").alias("out_w"))
    seeds = (
        part.where(F.col("p_brand") == _PPR_BRAND)
        .select(F.col("p_partkey").alias("src"))
        .join(und.select("src").distinct(), "src")
        .cache()
    )
    seed_flag = seeds.withColumn("is_seed", F.lit(1))
    # dst_seed folded into the cached edge table once: the broadcast
    # seed join runs here a single time instead of once per round
    trans = (
        und.join(out_w, "src")
        .select(
            "src",
            "dst",
            F.expr(f"(w * {_PPR_P}) div out_w").alias("p_scaled"),
        )
        .join(
            F.broadcast(
                seed_flag.select(
                    F.col("src").alias("dst"), F.col("is_seed").alias("dst_seed")
                )
            ),
            "dst",
            "left",
        )
        .cache()
    )
    nodes = trans.select("src").distinct()
    n_seeds = seeds.count()
    base_seed = ((15 * _PPR_R) // 100) // n_seeds
    ranks = (
        nodes.join(seed_flag, "src", "left")
        .select(
            "src",
            F.when(F.col("is_seed").isNotNull(), F.lit(_PPR_R // n_seeds))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rank_scaled"),
        )
    )
    for i in range(_PPR_ITERS):
        ranks = (
            trans.join(ranks, "src")
            # is_seed(dst) is functionally dependent on dst — same
            # grouping the oracle uses (GROUP BY t.dst, s.src), so no
            # post-aggregation join is needed
            .groupBy("dst", "dst_seed")
            .agg(
                F.sum(
                    F.expr(f"(rank_scaled * p_scaled) div {_PPR_P}")
                ).alias("in_sum")
            )
            .select(
                F.col("dst").alias("src"),
                (
                    F.when(
                        F.col("dst_seed").isNotNull(), F.lit(base_seed)
                    ).otherwise(F.lit(0))
                    + F.expr("(85 * in_sum) div 100")
                )
                .cast("long")
                .alias("rank_scaled"),
            )
        )
        if (i + 1) % 5 == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return (
        ranks.select(F.col("src").alias("p_partkey"), "rank_scaled")
        .orderBy(F.col("rank_scaled").desc(), "p_partkey")
        .limit(_PPR_TOPN)
    )


@query(
    "graph_adamic_adar",
    oracle="""
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), ow AS (
  SELECT o, CAST(round(1000000000.0 / ln(COUNT(*))) AS BIGINT) AS w
  FROM op GROUP BY o HAVING COUNT(*) >= 2
), pairs AS (
  SELECT a.p AS u, b.p AS v,
         COUNT(*) AS n_common,
         CAST(SUM(ow.w) AS BIGINT) AS sw
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  JOIN ow ON ow.o = a.o
  GROUP BY a.p, b.p
)
SELECT u, v, n_common, CAST(sw AS DOUBLE) / 1000000000 AS adamic_adar
FROM pairs WHERE n_common >= 2
""",
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the bipartite order-part
    graph: AA(u,v) = sum over shared orders o of 1/ln(basket(o)) —
    common neighbors weighted so a 2-item order says far more about
    (u,v) than a 40-item one. Same posting-list shape as
    graph_neighbor_jaccard (pairs exist only under a shared order,
    O(sum basket^2) work, never all-pairs); the per-order weight
    joins from a tiny per-order table before the pair groupBy, so
    the big self-join shuffles only (o, p) keys. Exactness: the
    1/ln weight is QUANTIZED once per order to an integer
    nano-unit — every downstream sum is exact bigint arithmetic,
    immune to accumulation order (the select_facility_location
    recipe); the only float is the final /1e9 presentation. Shared
    orders have basket >= 2 so ln is never zero."""
    op = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    ow = (
        op.groupBy("o")
        .agg(F.count(F.lit(1)).alias("bsize"))
        .where(F.col("bsize") >= 2)
        .select(
            "o",
            F.round(F.lit(1000000000.0) / F.log(F.col("bsize")))
            .cast("bigint")
            .alias("w"),
        )
    )
    a, b = op.alias("a"), op.alias("b")
    ow = ow.withColumnRenamed("o", "ow_o")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .join(ow, F.col("a.o") == F.col("ow_o"))
        .groupBy(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum("w").cast("bigint").alias("sw"),
        )
    )
    return pairs.where(F.col("n_common") >= 2).select(
        "u",
        "v",
        "n_common",
        (F.col("sw").cast("double") / 1000000000).alias("adamic_adar"),
    )


@query(
    "graph_reciprocity",
    oracle="""
WITH e AS (
  SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey <> c.c_nationkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(CASE WHEN EXISTS (
              SELECT 1 FROM e r
              WHERE r.src = e.dst AND r.dst = e.src)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_reciprocated,
       CAST(SUM(CASE WHEN EXISTS (
              SELECT 1 FROM e r
              WHERE r.src = e.dst AND r.dst = e.src)
            THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS reciprocity
FROM e
""",
)
def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocity of the international trade digraph: a directed
    edge (a -> b) exists when any supplier in nation a ships a line
    to a customer in nation b; reciprocity is the fraction of edges
    whose reverse also exists — the standard digraph symmetry
    measure (1.0 = every trade lane is two-way). The data-sized work
    is the q7-shaped join chain that derives edges; DISTINCT then
    collapses it to at most nations^2 rows, so the reciprocity
    self-join runs on a broadcast-sized table — the heavy scan
    never sees a pair join. Exact integer counts, one final
    division."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    e = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .distinct()
    )
    r = e.select(F.col("src").alias("r_src"), F.col("dst").alias("r_dst"))
    marked = e.join(
        F.broadcast(r),
        (F.col("r_src") == F.col("dst")) & (F.col("r_dst") == F.col("src")),
        "left",
    ).select(F.when(F.col("r_src").isNotNull(), 1).otherwise(0).alias("rec"))
    return marked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.sum("rec").cast("bigint").alias("n_reciprocated"),
        (
            F.sum("rec").cast("double") / F.count(F.lit(1))
        ).alias("reciprocity"),
    )


def _modularity_oracle() -> str:
    """Modularity of the LPA partition, replayed: the shared LPA
    chain, then Q = sum_c(m_c)/m - sum_c(d_c^2)/(4 m^2) on exact
    integer edge/degree sums (the cross-term expansion avoids any
    per-community float accumulation)."""
    last = f"l{LPA_ROUNDS}"
    return (
        _lpa_chain_prefix(_lpa_rounds_ctes())
        + f""", deg AS MATERIALIZED (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM ed GROUP BY src
), dc AS MATERIALIZED (
  SELECT l.lbl, CAST(SUM(deg.d) AS BIGINT) AS d_c
  FROM {last} l JOIN deg ON deg.node = l.node GROUP BY l.lbl
), intra AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS sum_mc
  FROM und e
  JOIN {last} lu ON lu.node = e.u
  JOIN {last} lv ON lv.node = e.v
  WHERE lu.lbl = lv.lbl
), agg AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS m,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM dc) AS n_communities,
         (SELECT sum_mc FROM intra) AS intra_edges,
         (SELECT CAST(SUM(d_c * d_c) AS BIGINT) FROM dc) AS sum_dc2
)
SELECT n_nodes, m AS n_edges, n_communities, intra_edges,
       CAST(intra_edges AS DOUBLE) / m
         - CAST(sum_dc2 AS DOUBLE)
           / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)) AS modularity
FROM agg
"""
    )


@query("graph_modularity", oracle=_modularity_oracle())
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the LPA community partition — the
    quality score that says whether the detected communities are
    real structure or noise (Q near 0) — closing the loop on
    graph_lpa_communities: detect, then MEASURE. Q = sum_c[m_c/m -
    (d_c/2m)^2], computed via the cross-term expansion
    sum(m_c)/m - sum(d_c^2)/(4m^2) so every accumulation is an
    exact bigint (intra-edge count; degree-mass squares per
    community) and only the final two divisions are float — no
    per-community float sum regardless of community count. Labels
    come from the shared _lpa_labels kernel (same bounded-rounds
    iterative joins); the extra cost over detection is one
    edge-label join and two small aggregates."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    labels = _lpa_labels(edges)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    dc = (
        labels.join(deg, "node")
        .groupBy("lbl")
        .agg(F.sum("d").cast("bigint").alias("d_c"))
    )
    lu = labels.select(F.col("node").alias("u"), F.col("lbl").alias("lbl_u"))
    lv = labels.select(F.col("node").alias("v"), F.col("lbl").alias("lbl_v"))
    intra = (
        edges.join(lu, "u")
        .join(lv, "v")
        .where(F.col("lbl_u") == F.col("lbl_v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("intra_edges"))
    )
    m = edges.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    nn = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    nc = dc.agg(F.count(F.lit(1)).cast("bigint").alias("n_communities"))
    dc2 = dc.agg(
        F.sum(F.col("d_c") * F.col("d_c")).cast("bigint").alias("sum_dc2")
    )
    agg = (
        nn.crossJoin(m)
        .crossJoin(nc)
        .crossJoin(intra)
        .crossJoin(dc2)
    )
    return agg.select(
        "n_nodes",
        F.col("m").alias("n_edges"),
        "n_communities",
        "intra_edges",
        (
            F.col("intra_edges").cast("double") / F.col("m")
            - F.col("sum_dc2").cast("double")
            / (
                F.lit(4.0)
                * F.col("m").cast("double")
                * F.col("m").cast("double")
            )
        ).alias("modularity"),
    )


@query(
    "graph_clustering_coeff",
    oracle="""
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), edges AS MATERIALIZED (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
), tri AS MATERIALIZED (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
), tn AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS t FROM (
    SELECT a AS x FROM tri UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY x
), deg AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS x FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY x
)
SELECT deg.x AS node, deg.d AS degree,
       CAST(COALESCE(tn.t, 0) AS BIGINT) AS triangles,
       CASE WHEN deg.d >= 2
            THEN CAST(2 * COALESCE(tn.t, 0) AS DOUBLE)
                 / (deg.d * (deg.d - 1))
            ELSE CAST(0 AS DOUBLE) END AS clustering_coeff
FROM deg LEFT JOIN tn ON tn.x = deg.x
""",
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node LOCAL clustering coefficient of the co-purchase graph
    — lcc(v) = 2*T(v) / (d(v)*(d(v)-1)), the fraction of a node's
    neighbor pairs that are themselves adjacent; the node-level
    refinement of graph_triangle_count (which only returns the global
    count). Same degree-oriented wedge-join kernel — orient edges
    low-(degree,id) -> high, wedge join head-to-tail, close against
    the oriented edge set — but the closing join is an INNER join
    (not semi) so each triangle surfaces exactly once with all three
    vertices, which then explode into per-node counts via one
    unionAll+groupBy. The O(m^1.5) wedge bound carries over
    unchanged, so per-node counting costs the same shuffle volume as
    global counting plus one |V|-sized agg. Integer triangle and
    degree counts, ONE float division per node, degree<2 pinned to
    0.0 in both engines. Oracle enumerates triangles with the naive
    u<v<w three-way join (oracle-scale-only; see PLANS.md)."""
    edges = _copurchase_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    with_deg = edges.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("t"),
    )
    wedges = oriented.alias("e1").join(
        oriented.alias("e2"), F.col("e1.t") == F.col("e2.s")
    ).select(
        F.col("e1.s").alias("a"),
        F.col("e1.t").alias("b"),
        F.col("e2.t").alias("c"),
    )
    closing = oriented.select(F.col("s").alias("a"), F.col("t").alias("c"))
    tri = wedges.join(closing, ["a", "c"])
    tn = (
        tri.select(F.col("a").alias("x"))
        .unionAll(tri.select(F.col("b").alias("x")))
        .unionAll(tri.select(F.col("c").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    joined = deg.join(tn, "x", "left").select(
        F.col("x").alias("node"),
        F.col("d").alias("degree"),
        F.coalesce("t", F.lit(0)).cast("bigint").alias("triangles"),
    )
    return joined.select(
        "node",
        "degree",
        "triangles",
        F.when(
            F.col("degree") >= 2,
            (2 * F.col("triangles")).cast("double")
            / (F.col("degree") * (F.col("degree") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering_coeff"),
    )


HITS_ROUNDS = 8
_HITS_SCALE = 1_000_000_000  # L1-norm fixed point (1e9)
_HITS_TOPN = 25


def _hits_oracle() -> str:
    """Unrolled scaled-integer HITS in DuckDB — every op is integer
    sum / multiply / floor-divide, so per-node sums are order-free
    and the replay is bit-exact vs the Spark loop. MATERIALIZED
    throughout (each round's tables are referenced twice)."""
    head = f"""
WITH eg AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
), nh AS (SELECT CAST(COUNT(DISTINCT c) AS BIGINT) AS n FROM eg),
h0 AS MATERIALIZED (
  SELECT DISTINCT c, {_HITS_SCALE} // (SELECT n FROM nh) AS h FROM eg
)"""
    rounds = []
    for i in range(1, HITS_ROUNDS + 1):
        rounds.append(f"""
, ar{i} AS MATERIALIZED (
  SELECT e.p, CAST(SUM(h.h) AS BIGINT) AS raw
  FROM eg e JOIN h{i - 1} h ON h.c = e.c GROUP BY e.p
), a{i} AS MATERIALIZED (
  SELECT p, (raw * {_HITS_SCALE})
            // (SELECT CAST(SUM(raw) AS BIGINT) FROM ar{i}) AS a
  FROM ar{i}
), hr{i} AS MATERIALIZED (
  SELECT e.c, CAST(SUM(a.a) AS BIGINT) AS raw
  FROM eg e JOIN a{i} a ON a.p = e.p GROUP BY e.c
), h{i} AS MATERIALIZED (
  SELECT c, (raw * {_HITS_SCALE})
            // (SELECT CAST(SUM(raw) AS BIGINT) FROM hr{i}) AS h
  FROM hr{i}
)""")
    tail = f"""
SELECT * FROM (
  SELECT 'authority' AS role, p AS node, CAST(a AS BIGINT) AS score_scaled
  FROM a{HITS_ROUNDS} ORDER BY a DESC, p LIMIT {_HITS_TOPN}
) UNION ALL
SELECT * FROM (
  SELECT 'hub' AS role, c AS node, CAST(h AS BIGINT) AS score_scaled
  FROM h{HITS_ROUNDS} ORDER BY h DESC, c LIMIT {_HITS_TOPN}
)"""
    return head + "".join(rounds) + tail


@query("graph_hits", oracle=_hits_oracle())
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg hubs-and-authorities) over the bipartite
    customer->part purchase graph: customers are hubs, parts are
    authorities; auth(p) = sum of hub scores of its buyers, hub(c) =
    sum of authority scores of its parts, L1-renormalized each round.
    Arithmetic is the text_pagerank_exact scaled-integer recipe
    (1e9 fixed point, floor division — Spark `div` == DuckDB `//`
    on the all-positive operands), so every per-node sum is an
    order-independent bigint and the {HITS_ROUNDS}-round replay
    hash-matches exactly. Overflow-safe by the L1 invariant: scores
    sum to <= 1e9 after each renorm, so raw sums <= 1e9 and
    raw * SCALE <= 1e18 < 2^63. Scale shape: per round TWO equi-join
    shuffles of the edge list against node-sized score tables (the
    exact mirror of PageRank's one — HITS alternates sides) plus two
    scalar totals that crossJoin back broadcast; localCheckpoint
    every 4 rounds keeps lineage flat. Output: top-{_HITS_TOPN}
    authorities and hubs via TakeOrderedAndProject, never a global
    sort."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c"), F.col("o_orderkey").alias("ok")
    )
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p")
    )
    eg = o.join(li, "ok").select("c", "p").distinct().cache()
    n = eg.select("c").distinct().count()
    h = eg.select("c").distinct().select(
        "c", F.lit(_HITS_SCALE // n).cast("long").alias("h")
    )
    # Per round, the L1 total folds into the SAME dataframe as the
    # renorm via an unbounded window over the node-sized raw table
    # (one single-partition exchange of <= |nodes| skinny rows) instead
    # of a separate scalar agg crossJoined back — so each round is a
    # straight chain with ONE consumer per intermediate and the whole
    # 8-round loop collapses from 16 eager checkpoint jobs (2 per
    # round: materialize ar, materialize hr) into ONE job at the final
    # action (guide §5: the capture-recapture fold pattern). The
    # checkpoints stay but turn LAZY: they still truncate lineage (a
    # bounded plan per round instead of a 16-shuffle tower, keeping
    # optimizer time flat) and still cache the round's partitions on
    # first compute, which is what stops the final union's double
    # consumption of the last round's tables from recomputing the
    # whole chain (the measured 198 s -> 10 s blowup class). Integer
    # arithmetic is unchanged: sum/div over the identical bigints.
    wall = Window.partitionBy()
    a = None
    for i in range(HITS_ROUNDS):
        ar = (
            eg.join(h, "c")
            .groupBy("p")
            .agg(F.sum("h").cast("bigint").alias("raw"))
            .withColumn("tot", F.sum("raw").over(wall).cast("bigint"))
        )
        a = ar.select(
            "p", F.expr(f"(raw * {_HITS_SCALE}) div tot").alias("a")
        ).localCheckpoint(eager=False)
        hr = (
            eg.join(a, "p")
            .groupBy("c")
            .agg(F.sum("a").cast("bigint").alias("raw"))
            .withColumn("tot", F.sum("raw").over(wall).cast("bigint"))
        )
        h = hr.select(
            "c", F.expr(f"(raw * {_HITS_SCALE}) div tot").alias("h")
        ).localCheckpoint(eager=False)
    top_a = (
        a.select(
            F.lit("authority").alias("role"),
            F.col("p").alias("node"),
            F.col("a").cast("bigint").alias("score_scaled"),
        )
        .orderBy(F.col("score_scaled").desc(), "node")
        .limit(_HITS_TOPN)
    )
    top_h = (
        h.select(
            F.lit("hub").alias("role"),
            F.col("c").alias("node"),
            F.col("h").cast("bigint").alias("score_scaled"),
        )
        .orderBy(F.col("score_scaled").desc(), "node")
        .limit(_HITS_TOPN)
    )
    return top_a.unionAll(top_h)


@query(
    "graph_closeness_sample",
    oracle=f"""
WITH RECURSIVE pairs AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), edges AS (
  SELECT a.p AS u, b.p AS v
  FROM pairs a JOIN pairs b ON a.o = b.o AND a.p <> b.p
), seeds AS (
  SELECT p AS seed FROM (SELECT DISTINCT p FROM pairs)
  ORDER BY p LIMIT 5
), walk AS (
  SELECT seed, seed AS node, CAST(0 AS BIGINT) AS d FROM seeds
  UNION
  SELECT walk.seed, e.v AS node, walk.d + 1 AS d
  FROM walk JOIN edges e ON e.u = walk.node
  WHERE walk.d < {BFS_MAX_HOPS}
), dist AS (
  SELECT seed, node, MIN(d) AS d FROM walk GROUP BY seed, node
)
SELECT seed,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
       CAST(SUM(d) AS BIGINT) AS total_dist,
       CAST(COUNT(*) - 1 AS DOUBLE) / SUM(d) AS closeness
FROM dist GROUP BY seed
""",
)
def graph_closeness_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated closeness centrality of five fixed seed parts (the
    five smallest ids) over the co-purchase graph: run ONE
    level-synchronous multi-source BFS keyed by (seed, node) — the
    graph_bfs_hops frontier loop with a composite key, so all five
    sources advance in the same {BFS_MAX_HOPS} join rounds rather
    than 5 sequential traversals — then closeness = (reached-1) /
    sum(hop distances) within the {BFS_MAX_HOPS}-hop ball (the
    standard sampled/truncated estimator for centrality at graph
    scale, where exact all-pairs BFS is off the table). Reached
    counts and distance sums are exact integers; ONE division per
    seed. Chose the classic (not harmonic) form deliberately:
    harmonic's sum of 1/d floats is reduction-order-dependent,
    n/sum_d is not. The frontier join is frontier x edges each
    round — never whole-graph — and the visited anti-join keys on
    (seed, node), so the 5 BFS trees never cross-contaminate."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    other = li.select(F.col("o"), F.col("p").alias("q"))
    edges = (
        li.join(other, "o")
        .filter(F.col("p") != F.col("q"))
        .select(F.col("p").alias("u"), F.col("q").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seeds = [
        int(r[0])
        for r in li.select("p").distinct().orderBy("p").limit(5).collect()
    ]
    spark_ = edges.sparkSession
    visited = spark_.createDataFrame(
        [(s, s, 0) for s in seeds], "seed bigint, node bigint, d bigint"
    ).localCheckpoint(eager=True)
    frontier = visited
    for depth in range(1, BFS_MAX_HOPS + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["u"])
            .select("seed", F.col("v").alias("node"))
            .distinct()
            .join(visited, ["seed", "node"], "left_anti")
            .withColumn("d", F.lit(depth).cast("bigint"))
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            break
        visited = visited.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited.groupBy("seed").agg(
        (F.count(F.lit(1)) - 1).cast("bigint").alias("n_reached"),
        F.sum("d").cast("bigint").alias("total_dist"),
        (
            (F.count(F.lit(1)) - 1).cast("double") / F.sum("d")
        ).alias("closeness"),
    )


@query(
    "graph_rich_club",
    oracle="""
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), edges AS MATERIALIZED (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
), deg AS MATERIALIZED (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS x FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY x
), grid AS (SELECT unnest(generate_series(1, 10)) AS k),
ce AS MATERIALIZED (
  SELECT g.k, e.u, e.v
  FROM grid g, edges e
  JOIN deg du ON du.x = e.u
  JOIN deg dv ON dv.x = e.v
  WHERE du.d > g.k AND dv.d > g.k
), ep AS (
  SELECT k, CAST(COUNT(DISTINCT x) AS BIGINT) AS n_club_endpoints
  FROM (SELECT k, u AS x FROM ce UNION ALL SELECT k, v FROM ce)
  GROUP BY k
), cedg AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS club_edges FROM ce GROUP BY k
), cn AS (
  SELECT g.k, CAST(COUNT(deg.x) AS BIGINT) AS n_club_nodes
  FROM grid g LEFT JOIN deg ON deg.d > g.k GROUP BY g.k
)
SELECT cn.k,
       CAST(COALESCE(ep.n_club_endpoints, 0) AS BIGINT)
         AS n_club_endpoints,
       cn.n_club_nodes,
       CAST(COALESCE(cedg.club_edges, 0) AS BIGINT) AS club_edges,
       CASE WHEN cn.n_club_nodes >= 2
            THEN CAST(2 * COALESCE(cedg.club_edges, 0) AS DOUBLE)
                 / (cn.n_club_nodes * (cn.n_club_nodes - 1))
            END AS rich_club_coeff
FROM cn
LEFT JOIN ep ON ep.k = cn.k
LEFT JOIN cedg ON cedg.k = cn.k
""",
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient of the co-purchase graph over the
    degree grid k = 1..10: phi(k) = 2*E_k / (N_k*(N_k-1)), the
    density of the subgraph induced by nodes of degree > k — 'do
    the hubs trade with each other', the connectivity-elite
    diagnostic behind resilience and assortativity analyses
    (complements graph_degree_assortativity's single correlation
    number with a full profile). Everything is integer counting —
    club membership is a degree threshold on the broadcast-joined
    degree table, club edges are one conditional sum over the edge
    list replicated across the 10-row grid — with ONE division per
    k. Output: k, club size, club edges, phi(k)."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    ed = edges.join(du, "u").join(dv, "v")
    grid = spark.range(1, 11).select(F.col("id").alias("k"))
    club_edges = ed.crossJoin(F.broadcast(grid)).groupBy("k").agg(
        F.sum(
            F.when(
                (F.col("du") > F.col("k")) & (F.col("dv") > F.col("k")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("club_edges")
    )
    club_nodes = deg.crossJoin(F.broadcast(grid)).groupBy("k").agg(
        F.sum(F.when(F.col("d") > F.col("k"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_club_nodes")
    )
    endpoints = (
        ed.crossJoin(F.broadcast(grid))
        .filter((F.col("du") > F.col("k")) & (F.col("dv") > F.col("k")))
        .select("k", F.col("u").alias("x"))
        .unionAll(
            ed.crossJoin(F.broadcast(grid))
            .filter(
                (F.col("du") > F.col("k")) & (F.col("dv") > F.col("k"))
            )
            .select("k", F.col("v").alias("x"))
        )
        .groupBy("k")
        .agg(F.countDistinct("x").cast("bigint").alias("n_club_endpoints"))
    )
    return (
        grid.join(club_edges, "k", "left")
        .join(club_nodes, "k", "left")
        .join(endpoints, "k", "left")
        .select(
            "k",
            F.coalesce("n_club_endpoints", F.lit(0))
            .cast("bigint")
            .alias("n_club_endpoints"),
            F.coalesce("n_club_nodes", F.lit(0))
            .cast("bigint")
            .alias("n_club_nodes"),
            F.coalesce("club_edges", F.lit(0))
            .cast("bigint")
            .alias("club_edges"),
            F.when(
                F.col("n_club_nodes") >= 2,
                (2 * F.col("club_edges")).cast("double")
                / (F.col("n_club_nodes") * (F.col("n_club_nodes") - 1)),
            ).alias("rich_club_coeff"),
        )
    )


def _scc_oracle(max_n_log2: int = 13) -> str:
    """Unrolled pointer-doubling replay of graph_scc: j{k} holds the
    2^k-step successor of every node (k self-joins of the N-row
    pointer table); after K = max_n_log2 rounds every pointer sits
    on a cycle (tail length < N <= 2^K). Cycle nodes = the distinct
    landing set; the min-label doubling over the cycle-restricted
    successor then yields the cycle minimum (2^K >= any cycle
    length). Pure integer arithmetic, MATERIALIZED per round."""
    parts = [
        """j0 AS MATERIALIZED (
  SELECT doc_id AS u,
         CASE WHEN doc_id IS NOT NULL THEN
           (doc_id * 2654435761 % 4294967296)
             % (SELECT COUNT(*) FROM documents) END AS p
  FROM documents
)"""
    ]
    for k in range(1, max_n_log2 + 1):
        parts.append(
            f"""j{k} AS MATERIALIZED (
  SELECT a.u, b.p FROM j{k - 1} a JOIN j{k - 1} b ON a.p = b.u
)"""
        )
    parts.append(
        f"""cyc AS MATERIALIZED (
  SELECT DISTINCT p AS u FROM j{max_n_log2}
)"""
    )
    parts.append(
        """m0 AS MATERIALIZED (
  SELECT c.u, j.p, c.u AS m
  FROM cyc c JOIN j0 j ON j.u = c.u
)"""
    )
    for k in range(1, max_n_log2 + 1):
        parts.append(
            f"""m{k} AS MATERIALIZED (
  SELECT a.u, b.p, least(a.m, b.m) AS m
  FROM m{k - 1} a JOIN m{k - 1} b ON a.p = b.u
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT j.u AS doc_id,
       CAST(COALESCE(m.m, j.u) AS BIGINT) AS scc_id,
       m.m IS NOT NULL AS on_cycle
FROM j0 j LEFT JOIN m{max_n_log2} m ON m.u = j.u
"""
    )


@query("graph_scc", oracle=_scc_oracle())
def graph_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components of the synthetic FUNCTIONAL
    digraph succ(u) = (u * 2654435761 mod 2^32) mod N over dense
    doc_ids (every node has out-degree 1, so SCCs are exactly the
    cycles of the permutation-like map plus singleton tail nodes —
    the rho-shaped structure of pseudo-random functional graphs).
    Scale-correct algorithm: POINTER DOUBLING — K = ceil(log2 N)
    self-join rounds square the successor map, landing every node's
    pointer on a cycle; the distinct landing set IS the cycle node
    set, and K more min-label doubling rounds over the
    cycle-restricted map give each cycle's minimum node as the
    component id. 2K equi-join shuffles total instead of O(N)
    sequential steps; all-integer state, no floats anywhere —
    bit-exact by construction. Tail nodes are their own singleton
    SCC (scc_id = doc_id, on_cycle = false)."""
    d = load(spark, sf_dir, "documents")
    stats = d.agg(
        F.count(F.lit(1)).alias("n"), F.max("doc_id").alias("mx")
    ).collect()[0]
    n = stats["n"]
    if n != stats["mx"] + 1:
        raise ValueError("graph_scc requires dense doc_ids 0..N-1")
    if n > 8192:
        # The registered oracle is unrolled at max_n_log2=13 (covers
        # N <= 2^13); beyond that it under-doubles and would fail the
        # hash gate as a SPURIOUS mismatch. Fail loudly instead (the
        # dense-id-guard precedent). Lift by registering
        # _scc_oracle(ceil(log2 N)) for the larger fixture.
        raise ValueError(
            f"graph_scc oracle is unrolled for N <= 8192 (got {n}); "
            "re-register with _scc_oracle(max_n_log2=ceil(log2 N))"
        )
    return _scc_pointer_doubling(d, n)


# The round-6 stats-squaring fix, promoted to the shared audited
# primitive (r6 verdict item 4): plans/iterate.py owns the full
# failure-mode writeup and the pinned bounded-stat-growth test.
from ..plans.iterate import iterate_with_barrier, stats_barrier

_stats_barrier = stats_barrier


def _scc_pointer_doubling(d: DataFrame, n: int) -> DataFrame:
    """The graph_scc engine core, oracle-free: pointer-doubling SCC
    over succ(u) = (u * 2654435761 mod 2^32) mod n for a documents
    frame with dense doc_ids 0..n-1. Split out so the scale-ladder
    probe (tools/scale_ladder.py) can measure the ENGINE beyond the
    registered oracle's N <= 8192 unroll ceiling — the ceiling is an
    oracle artifact, not an engine limit (the engine is 2*ceil(log2 n)
    equi-join rounds at any n)."""
    rounds = max(n - 1, 1).bit_length()  # 2^rounds >= n

    u = F.col("doc_id")
    succ = ((u * F.lit(2654435761)) % F.lit(4294967296)) % F.lit(n)
    j = d.select(u.alias("u"), succ.cast("bigint").alias("p"))
    base = j.localCheckpoint(eager=True)

    def double_ptr(ptr: DataFrame, r: int) -> DataFrame:
        hop = ptr.select(F.col("u").alias("hu"), F.col("p").alias("hp"))
        return ptr.join(hop, ptr["p"] == hop["hu"]).select(
            "u", F.col("hp").alias("p")
        )

    # state-vs-state join: squaring barrier mandatory (r6 ladder bug 1)
    ptr = iterate_with_barrier(base, double_ptr, rounds, squaring=True)
    cyc = ptr.select(F.col("p").alias("u")).distinct()
    m0 = (
        cyc.join(base, "u")
        .select("u", "p", F.col("u").alias("m"))
        .localCheckpoint(eager=True)
    )

    def double_min(m: DataFrame, r: int) -> DataFrame:
        hop = m.select(
            F.col("u").alias("hu"),
            F.col("p").alias("hp"),
            F.col("m").alias("hm"),
        )
        return m.join(hop, m["p"] == hop["hu"]).select(
            "u",
            F.col("hp").alias("p"),
            F.least("m", "hm").alias("m"),
        )

    m = iterate_with_barrier(m0, double_min, rounds, squaring=True)
    return (
        base.join(
            m.select(F.col("u").alias("mu"), "m"),
            base["u"] == F.col("mu"),
            "left",
        )
        .select(
            F.col("u").alias("doc_id"),
            F.coalesce("m", "u").cast("bigint").alias("scc_id"),
            F.col("m").isNotNull().alias("on_cycle"),
        )
    )


TRUSS_K = 4  # edges must sit in >= K-2 = 2 triangles

# Peel rounds the oracle unrolls. Truss peeling is idempotent once the
# fixpoint is reached (recomputing supports on a fixpoint keeps every
# edge), so any unroll >= the convergence round count is exact;
# measured convergence of the co-purchase graph: 1 round at sf0.001,
# 3 at sf0.01, 8 at sf0.1 — 10 leaves margin. The engine loop below
# still runs to the true fixpoint; the bound only shapes the oracle.
_TRUSS_ORACLE_ROUNDS = 10


def _truss_oracle() -> str:
    """Unrolled support-peeling DuckDB oracle: per round, enumerate
    triangles with the naive sorted three-way join (oracle-scale
    shape, intentionally naive), count each triangle into its three
    edges, and keep edges with support >= TRUSS_K - 2. MATERIALIZED
    is load-bearing (each round references the previous edge CTE five
    times). Output: the fixpoint edge set with its within-truss
    support."""
    parts = [
        "WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),",
        "e0 AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v FROM li a JOIN li b ON a.o = b.o AND a.p < b.p)",
    ]
    for r in range(_TRUSS_ORACLE_ROUNDS + 1):
        parts.append(
            f""", t{r} AS MATERIALIZED (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e{r} e1 JOIN e{r} e2 ON e2.u = e1.v
  JOIN e{r} e3 ON e3.u = e1.u AND e3.v = e2.v
), s{r} AS MATERIALIZED (
  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS s FROM (
    SELECT a AS u, b AS v FROM t{r} UNION ALL
    SELECT a AS u, c AS v FROM t{r} UNION ALL
    SELECT b AS u, c AS v FROM t{r}) GROUP BY u, v
), e{r + 1} AS MATERIALIZED (
  SELECT s.u, s.v FROM s{r} s WHERE s.s >= {TRUSS_K - 2}
)"""
        )
    last = _TRUSS_ORACLE_ROUNDS
    parts.append(
        f"""
SELECT s.u, s.v, s.s AS support
FROM s{last} s
JOIN e{last + 1} e ON e.u = s.u AND e.v = s.v
"""
    )
    return "\n".join(parts)


def _oriented_triangles(edges: DataFrame) -> DataFrame:
    """All triangles of a distinct u<v undirected edge set as
    (a, b, c) vertex rows, one row per triangle, via the degree-
    oriented wedge join (same O(m^(3/2)) shape as triangle_count,
    but with an inner closing join so every triangle keeps its three
    corners for per-edge accounting)."""
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    with_deg = edges.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("t"),
    )
    wedges = oriented.alias("e1").join(
        oriented.alias("e2"), F.col("e1.t") == F.col("e2.s")
    ).select(
        F.col("e1.s").alias("a"),
        F.col("e1.t").alias("b"),
        F.col("e2.t").alias("c"),
    )
    closing = oriented.select(F.col("s").alias("a"), F.col("t").alias("c"))
    return wedges.join(closing, ["a", "c"], "left_semi")


def _edge_support(edges: DataFrame) -> DataFrame:
    """(u, v, s): triangles-per-edge over a distinct u<v edge set."""
    tri = _oriented_triangles(edges)
    pair = lambda x, y: [  # noqa: E731 — sorted undirected pair
        F.least(F.col(x), F.col(y)).alias("u"),
        F.greatest(F.col(x), F.col(y)).alias("v"),
    ]
    all_edges = (
        tri.select(*pair("a", "b"))
        .unionAll(tri.select(*pair("a", "c")))
        .unionAll(tri.select(*pair("b", "c")))
    )
    return all_edges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("s")
    )


@query("graph_k_truss", oracle=_truss_oracle())
def graph_k_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {TRUSS_K}-truss of the part co-purchase graph: the maximal
    subgraph where every edge sits in >= {TRUSS_K}-2 = 2 triangles of
    the subgraph — the cohesion-mining step ABOVE k-core (every
    k-truss edge is in the (k-1)-core, but trussness demands the
    triangles that make communities real, not just degree mass).
    Cohen 2008; the standard dense-community extractor.

    Per peel round: triangles via the degree-oriented wedge join
    (O(m^(3/2)) shuffle bound, the triangle_count machinery with an
    inner closing join so each triangle lands on its three edges),
    one groupBy for per-edge support, one semi-join trim;
    localCheckpoint per round keeps lineage flat (the graph_scc
    stats-barrier lesson does not apply — each round derives from a
    FILTERED copy of one table, so stats shrink). The loop runs to
    the true fixpoint; the oracle unrolls {_TRUSS_ORACLE_ROUNDS}
    rounds (measured convergence <= 8 at sf0.1 + margin; idempotent
    past the fixpoint, loudly hash-breaks if a corpus ever needs
    more). Output: surviving edges with within-truss support."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    n_edges = edges.count()
    while True:
        # Checkpoint the support table: the peel trim consumes it now
        # and, at the fixpoint, the FINAL output reuses it — without
        # the checkpoint the returned plan would re-run the whole
        # triangle enumeration (the O(m^(3/2)) wedge join, the most
        # expensive pass here) a second time at materialization.
        sup = _edge_support(edges).localCheckpoint(eager=True)
        keep = sup.filter(F.col("s") >= TRUSS_K - 2).select("u", "v")
        edges = edges.join(keep, ["u", "v"], "left_semi").localCheckpoint(
            eager=True
        )
        n_now = edges.count()
        if n_now == n_edges:
            break
        n_edges = n_now
    # At the fixpoint the trim removed nothing, so `sup` restricted to
    # the surviving edges IS the within-truss support — no extra
    # triangle pass (one count per round instead of two, carried).
    return edges.join(sup, ["u", "v"]).select(
        "u", "v", F.col("s").alias("support")
    )


_KATZ_R = 1_000_000_000_000  # rank fixed point (1e12)
_KATZ_ALPHA_DIV = 64  # attenuation 1/64; in-degree <= 24 so 24/64 < 1
_KATZ_ITERS = 12


def _katz_oracle() -> str:
    head = f"""
WITH e AS MATERIALIZED (
  SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey <> c.c_nationkey
), nodes AS MATERIALIZED (
  SELECT n_nationkey AS v, n_name FROM nation
), r0 AS MATERIALIZED (
  SELECT v, CAST({_KATZ_R} AS BIGINT) AS x FROM nodes
)"""
    rounds = []
    for i in range(1, _KATZ_ITERS + 1):
        rounds.append(f"""
, r{i} AS MATERIALIZED (
  SELECT n.v,
         {_KATZ_R} + CAST(COALESCE(SUM(r.x // {_KATZ_ALPHA_DIV}), 0)
                          AS BIGINT) AS x
  FROM nodes n
  LEFT JOIN e ON e.dst = n.v
  LEFT JOIN r{i - 1} r ON r.v = e.src
  GROUP BY n.v
)"""
        )
    tail = f"""
SELECT n.n_name AS nation, r.x AS katz_scaled
FROM r{_KATZ_ITERS} r JOIN nodes n ON n.v = r.v
"""
    return head + "".join(rounds) + tail


@query("graph_katz", oracle=_katz_oracle())
def graph_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality of the international trade digraph (x = sum_k
    alpha^k A^k 1, iterated as x <- 1 + alpha * A^T x): nations score
    by how many trade lanes point at them, DISCOUNTED through longer
    supply chains — the walk-counting centrality degree can't see
    (a nation fed only by well-fed nations still ranks high).
    alpha = 1/{_KATZ_ALPHA_DIV} with in-degree <= 24 guarantees
    convergence (spectral radius bound alpha * deg_max < 1) and keeps
    the fixpoint under 1.7 * the 1e12 fixed point — no overflow at
    any data size, because the NATION graph is schema-bounded.

    Scale shape: the data-sized work is the q7-shaped join chain
    deriving distinct nation-pair edges (collapses to <= 625 rows);
    the {_KATZ_ITERS} iterations run on that broadcast-sized table —
    per-node sums of floor-divided bigints (positive operands, so
    div and // agree), order-independent. Fixed iteration count:
    (24/64)^{_KATZ_ITERS} is below the fixed-point resolution."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("v"), "n_name"
    )
    e = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # <= 625 rows from here on
    )
    ranks = nat.select("v", F.lit(_KATZ_R).cast("long").alias("x"))
    for _ in range(_KATZ_ITERS):
        contrib = (
            e.join(ranks, e["src"] == ranks["v"])
            .select(
                F.col("dst").alias("v"),
                F.expr(f"x div {_KATZ_ALPHA_DIV}").alias("cx"),
            )
            .groupBy("v")
            .agg(F.sum("cx").alias("in_sum"))
        )
        ranks = (
            nat.select("v")
            .join(contrib, "v", "left")
            .select(
                "v",
                (
                    F.lit(_KATZ_R) + F.coalesce(F.col("in_sum"), F.lit(0))
                )
                .cast("long")
                .alias("x"),
            )
        )
    return ranks.join(nat, "v").select(
        F.col("n_name").alias("nation"), F.col("x").alias("katz_scaled")
    )


@query(
    "graph_square_count",
    bounded_cross="three 1-row summary frames crossed into one row",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), edges AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
), verts AS (
  SELECT u AS x FROM edges UNION SELECT v FROM edges
), adj AS (
  SELECT u AS a, v AS b FROM edges UNION ALL SELECT v, u FROM edges
), wedge AS (
  SELECT x.b AS u, y.b AS w, CAST(COUNT(*) AS BIGINT) AS cn
  FROM adj x JOIN adj y ON x.a = y.a AND x.b < y.b
  GROUP BY 1, 2
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM verts) AS n_vertices,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM wedge) AS n_path2_pairs,
  (SELECT CAST(SUM((cn * (cn - 1)) // 2) AS BIGINT) // 2 FROM wedge)
    AS n_squares
""",
)
def graph_square_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-cycle (square) census of the part co-purchase graph — the
    quadrilateral complement of graph_triangle_count: squares are
    the smallest cycles that DON'T imply a triadic closure, so the
    square-to-triangle balance separates bipartite-like co-purchase
    structure (substitutes bought in alternating baskets) from
    clique-like structure (complements bought together).
    #C4 = (1/2) * sum over vertex pairs C(cn(u,w), 2): each square
    contributes exactly one center pair on each of its two
    diagonals.

    Exactness: common-neighbor counts, C(cn,2) via integer floor
    division (cn(cn-1) is always even), and the final halving
    (the diagonal double-count is structurally even) are all exact
    bigints. Scale shape: the wedge generation is one self-join of
    the adjacency on the center vertex — sum(deg^2) wedge rows
    (~3e8 at sf0.1; the co-purchase degree is corpus-INDEPENDENT
    (~30 orders/part x <=7 lines), so the wedge count grows
    linearly in parts, not quadratically) — then ONE hash aggregate
    by (u, w) and a 1-row reduction."""
    edges = _copurchase_edges(spark, sf_dir)
    adj = edges.select(
        F.col("u").alias("a"), F.col("v").alias("b")
    ).unionAll(edges.select(F.col("v").alias("a"), F.col("u").alias("b")))
    x = adj.select(F.col("a"), F.col("b").alias("u"))
    y = adj.select(F.col("a"), F.col("b").alias("w"))
    wedge = (
        x.join(y, "a")
        .filter(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cn"))
    )
    verts = (
        edges.select(F.col("u").alias("x"))
        .union(edges.select(F.col("v").alias("x")))
        .distinct()
    )
    tot = wedge.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_path2_pairs"),
        F.sum(F.expr("(cn * (cn - 1)) div 2")).cast("bigint").alias("sq2"),
    )
    nv = verts.agg(F.count(F.lit(1)).cast("bigint").alias("n_vertices"))
    ne = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    # bounded: three 1-row summary frames crossed into one row
    return (
        nv.crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(tot))
        .select(
            "n_vertices",
            "n_edges",
            "n_path2_pairs",
            F.expr("sq2 div 2").cast("bigint").alias("n_squares"),
        )
    )


@query(
    "graph_degree_powerlaw",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), edges AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
), deg AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT u AS x FROM edges UNION ALL SELECT v FROM edges)
  GROUP BY x
), dist AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS cnt FROM deg GROUP BY d
), ccdf AS (
  SELECT d,
         CAST(SUM(cnt) OVER (ORDER BY d DESC ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS atleast
  FROM dist
), pts AS (
  SELECT CAST(FLOOR(LN(CAST(d AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(LN(CAST(atleast AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS y
  FROM ccdf WHERE d >= 2
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM pts
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(MAX(d) AS BIGINT) FROM deg) AS max_degree,
       m.k AS n_ccdf_points,
       (CAST(m.k AS DOUBLE) * m.sxy - CAST(m.sx AS DOUBLE) * m.sy)
         / (CAST(m.k AS DOUBLE) * m.sxx - CAST(m.sx AS DOUBLE) * m.sx)
         AS ccdf_loglog_slope
FROM m
""",
)
def graph_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log CCDF slope of the co-purchase degree distribution —
    the heavy-tail diagnostic that decides whether degree-based
    plans need skew handling: a slope near -(alpha - 1) with small
    alpha means hubs dominate (salting/orientation mandatory); a
    steep slope means the degree cap assumption behind the wedge
    joins is safe. The empirical check FOR this repo's own
    graph-plan doctrine, computed the corpus_heaps_law way.

    Exactness: degrees, the distinct-degree distribution and the
    reverse-cumulative CCDF are exact integers over a BOUNDED
    (max-degree-sized) table; the quantized-ln OLS slope is exact
    integer arithmetic with one closing division. Scale shape: the
    co-purchase degree aggregate (linear), then everything lives on
    <= max_degree rows."""
    edges = _copurchase_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    # lazy 1-row stats frame crossJoined in at the end (same pattern as
    # graph_square_count) — no eager collect(), the degree aggregate is
    # computed once inside the single returned plan
    stats = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.max("d").cast("bigint").alias("max_degree"),
    )
    dist = deg.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    # bounded: <= max_degree distinct-degree rows
    w = Window.orderBy(F.desc("d")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ccdf = dist.select(
        "d", F.sum("cnt").over(w).cast("bigint").alias("atleast")
    )
    pts = ccdf.filter(F.col("d") >= 2).select(
        F.floor(F.log(F.col("d").cast("double")) * 1000000 + 0.5)
        .cast("bigint")
        .alias("x"),
        F.floor(F.log(F.col("atleast").cast("double")) * 1000000 + 0.5)
        .cast("bigint")
        .alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    k_d = F.col("k").cast("double")
    slope = (k_d * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        k_d * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    return (
        F.broadcast(stats)
        .crossJoin(m)
        .select(
            "n_nodes",
            "max_degree",
            F.col("k").alias("n_ccdf_points"),
            slope.alias("ccdf_loglog_slope"),
        )
    )
