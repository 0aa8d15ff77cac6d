"""High-level API surface (SURVEY.md §3.1 EP1-EP3 parity): the
library calls a reference user would port to."""

import numpy as np
import pytest

from diversity_maximization_spark import api
from diversity_maximization_spark.diversity import kernel as K
from diversity_maximization_spark.registry import QUERIES
from diversity_maximization_spark.sources import load


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


def test_gmm_distributed_equals_local(spark, emb):
    dist = {r[1] for r in api.gmm(emb, 6, distributed=True).collect()}
    loc = {r[1] for r in api.gmm(emb, 6, distributed=False).collect()}
    assert dist == loc


def test_gmm_cosine_metric(spark, emb):
    rows = api.gmm(emb, 5, metric="cosine", distributed=False).collect()
    assert len(rows) == 5
    # cosine distances live in [0, 2]
    assert all(0.0 <= r["dist_when_chosen"] <= 2.0 for r in rows[1:])


def test_gmm_coreset_quality(spark, emb):
    """Coreset-based GMM edge value must be within 2x of full GMM."""
    full = api.gmm(emb, 6, distributed=False)
    cs = api.gmm_coreset(emb, 6, p=4)
    ids_full = [r["vec_id"] for r in full.collect()]
    ids_cs = [r["vec_id"] for r in cs.collect()]
    e = emb
    from pyspark.sql import functions as F

    def edge_of(ids):
        return api.diversity(e.filter(F.col("vec_id").isin(ids)), "edge")

    assert edge_of(ids_cs) >= edge_of(ids_full) / 2.0 - 1e-9


def test_diversity_objectives(spark, emb):
    from pyspark.sql import functions as F

    cand = emb.filter(F.col("vec_id") < 12)
    vals = {
        o: api.diversity(cand, o)
        for o in ("edge", "clique", "star", "bipartition", "tree", "cycle")
    }
    assert all(v > 0 for v in vals.values())
    assert vals["tree"] <= vals["cycle"] + 1e-9
    # a balanced cut contains at least edge-many weight per cross pair
    assert vals["bipartition"] >= vals["edge"] - 1e-9
    assert vals["bipartition"] <= vals["clique"] + 1e-9


def test_local_search_matroid(spark, emb):
    from pyspark.sql import functions as F

    m = api.PartitionMatroid({i: 1 for i in range(10)})
    sel = api.local_search(
        emb.filter(F.col("vec_id") < 60), 4, label_col="label", matroid=m
    ).collect()
    labels = {
        r["label"]
        for r in emb.filter(
            F.col("vec_id").isin([s["vec_id"] for s in sel])
        ).collect()
    }
    assert len(labels) == 4  # capacity 1 per label -> all distinct


def test_streaming_fold_matches_query(spark, sf_dir, emb):
    rows = emb.orderBy("vec_id").collect()
    st = api.streaming_coreset_fold((r["vec_id"], r["embedding"]) for r in rows)
    got = {c[0]: c[2] for c in st["centers"]}
    q = {
        r["vec_id"]: r["weight"]
        for r in QUERIES["div_coreset_stream"](spark, sf_dir).collect()
    }
    assert got == q


def test_bow_pipeline(spark, sf_dir):
    v = QUERIES["bow_vectorize"](spark, sf_dir).collect()
    assert all(r["nnz"] > 0 for r in v)
    a = sorted(map(tuple, v))
    b = sorted(map(tuple, QUERIES["bow_vectorize"](spark, sf_dir).collect()))
    assert a == b  # deterministic hashing
    g = QUERIES["div_gmm_bow"](spark, sf_dir).collect()
    assert len(g) == 8
    assert len({r["doc_id"] for r in g}) == 8


def test_api_ann_topk_generic_schema(spark, sf_dir):
    """ann_topk works on arbitrary column names and agrees with the
    registered sim_search_topk on the fixture table."""
    from diversity_maximization_spark import api
    from diversity_maximization_spark.registry import QUERIES
    from diversity_maximization_spark.sources import load
    from pyspark.sql import functions as F

    e = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("pid"), F.col("embedding").alias("v")
    )
    got = {
        (r["pid"], r["neighbor"], r["rn"])
        for r in api.ann_topk(e, k=5, id_col="pid", vec_col="v").collect()
    }
    want = {
        (r["vec_id"], r["neighbor"], r["rn"])
        for r in QUERIES["sim_search_topk"](spark, sf_dir).collect()
    }
    assert got == want


def test_api_near_dup_pairs_threshold(spark, sf_dir):
    from diversity_maximization_spark import api
    from diversity_maximization_spark.sources import load

    e = load(spark, sf_dir, "embeddings")
    rows = api.near_dup_pairs(e, threshold=0.35).collect()
    assert rows and all(r["cos_sim"] > 0.35 for r in rows)
    assert all(r["vec_id_a"] < r["vec_id_b"] for r in rows)


def test_api_pipeline_ops_generic_schema(spark, sf_dir):
    """The training-pipeline api functions accept arbitrary column
    names and return the documented shapes."""
    from pyspark.sql import functions as F

    d = (
        load(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("k"), F.col("text").alias("body"))
    )
    q = api.quality_signals(d, id_col="k", text_col="body")
    assert {"doc_id", "n_words", "ttr", "top_share", "pass"} <= set(q.columns)
    assert q.count() == d.count()

    s = api.hash_split(d, "k", weights=(50, 25, 25), names=("a", "b", "c"))
    got = {r["split"] for r in s.select("split").distinct().collect()}
    assert got <= {"a", "b", "c"}

    pairs = api.near_dup_texts(d, threshold=0.9, id_col="k", text_col="body")
    assert all(r["jaccard"] >= 0.9 for r in pairs.collect())


def test_api_components_generic(spark):
    """components() on a hand-built graph: two triangles bridged to
    nothing — labels are the min id of each component."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12)], "src bigint, dst bigint"
    )
    verts = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 12, 99)], "id bigint"
    )
    got = {r["id"]: r["label"] for r in api.components(edges, verts).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_api_skyline_generic_schema(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 5), (2, 10.0, 5), (3, 9.0, 3), (4, 8.0, 4), (5, 7.0, 1)],
        "id bigint, score double, cost int",
    )
    got = {
        r["id"]
        for r in api.skyline(
            df, maximize="score", minimize="cost", keep_cols=["id"]
        ).collect()
    }
    # 1,2 duplicate non-dominated; 3 better cost at lower score; 4 is
    # dominated by 3 (lower score AND higher cost); 5 cheapest
    assert got == {1, 2, 3, 5}


def test_api_smooth_ewma_and_holt(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 15.0), (2, 1, 5.0)],
        "k bigint, t bigint, x double",
    )
    ew = {
        (r["k"], r["t"]): r["ewma"]
        for r in api.smooth(df, ["k"], ["t"], "x", alpha=0.3).collect()
    }
    assert ew[(1, 1)] == 10.0
    assert abs(ew[(1, 2)] - 13.0) < 1e-12
    assert abs(ew[(1, 3)] - 13.6) < 1e-12
    assert ew[(2, 1)] == 5.0
    ho = {
        (r["k"], r["t"]): (r["level"], r["trend"])
        for r in api.smooth(
            df, ["k"], ["t"], "x", alpha=0.5, beta=0.3
        ).collect()
    }
    assert ho[(1, 1)] == (10.0, 0.0)
    assert abs(ho[(1, 2)][0] - 15.0) < 1e-12  # 0.5*20 + 0.5*10
    assert abs(ho[(1, 2)][1] - 1.5) < 1e-12  # 0.3*5


def test_api_triangles_toy_graph(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "u bigint, v bigint"
    )
    row = api.triangles(edges).collect()[0]
    assert (row["n_vertices"], row["n_edges"], row["n_triangles"]) == (4, 4, 1)


def test_api_profile_generic(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "b")], "x bigint, s string"
    )
    prof = {
        r["column_name"]: r
        for r in api.profile(df, [("x", "num"), ("s", "str")]).collect()
    }
    assert prof["x"]["n_nulls"] == 1 and prof["x"]["n_distinct"] == 2
    assert prof["x"]["min_num"] == 1.0 and prof["x"]["max_num"] == 2.0
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["min_num"] is None


def test_api_passage_dups_and_neighbors(spark):
    boiler = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, "alpha " + boiler), (2, "beta " + boiler), (3, "solo text only")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in api.passage_dups(docs).collect()}
    assert out[1]["n_dup_passages"] >= 6 and out[2]["n_dup_passages"] >= 6
    assert out[3]["n_dup_passages"] == 0 and out[3]["n_passages"] == 0

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.01, 0.0), (3, 5.0, 5.0)],
        "id bigint, x double, y double",
    )
    nb = {
        r["vec_id"]: r
        for r in api.radius_neighbors(pts, "id", "x", "y", 0.05).collect()
    }
    assert nb[1]["n_neighbors"] == 1 and nb[2]["n_neighbors"] == 1
    assert nb[3]["n_neighbors"] == 0


def test_api_attribution_survival_hampel_strings(spark):
    """The generic library wrappers must reproduce hand-checked
    values on tiny synthetic frames (KM: S = 3/4 then 3/4 * 2/3;
    Hampel flags only the spike; kitten/sitting classics)."""
    from diversity_maximization_spark import api

    ev = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 00:00:00", "click", 1.0),
            (1, 2, "2024-01-01 01:00:00", "buy", 5.0),
            (2, 3, "2024-01-01 02:00:00", "buy", 7.0),
        ],
        "u bigint, eid bigint, t string, k string, v double",
    ).selectExpr("u", "eid", "CAST(t AS TIMESTAMP) AS t", "k", "v")
    att = {
        r["channel"]: (r["n_purchases"], r["revenue"])
        for r in api.attribution(ev, "u", "t", "eid", "k", "buy", "v").collect()
    }
    assert att == {"(direct)": (1, 7.0), "click": (1, 5.0)}

    d = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 0), (5, 0)], "dur long, ev int"
    )
    km = {r["day"]: r for r in api.survival(d, "dur", "ev").collect()}
    assert km[1]["survival"] == 0.75 and km[1]["n_at_risk"] == 4
    assert km[2]["survival"] == 0.5 and km[2]["n_censored"] == 1

    xs = [10, 11, 10, 50, 9, 10, 11]
    ser = spark.createDataFrame(
        [("a", i, xs[i]) for i in range(7)], "k string, i long, x long"
    )
    flags = [
        r["is_outlier"]
        for r in api.hampel(ser, ["k"], "i", "x").orderBy("i").collect()
    ]
    assert flags == [False, False, False, True, False, False, False]

    pr = spark.createDataFrame([("kitten", "sitting")], "a string, b string")
    row = api.string_scores(pr, "a", "b").collect()[0]
    assert (row["lev"], row["damerau"]) == (3, 3)
    assert abs(row["jw"] - 0.746031746031746) < 1e-15
