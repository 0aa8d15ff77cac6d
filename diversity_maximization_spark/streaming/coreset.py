"""Streaming doubling coreset (SURVEY.md §2.1 / PAPER-VLDB17 §5).

One-pass k-center summary: maintain <= k' centers with a threshold
tau; a point within tau of a center becomes its delegate (weight),
otherwise a new center; on overflow (> k' centers) double tau and
re-merge centers greedily. Implemented as a REAL Structured Streaming
stateful operator: embeddings replayed as an ordered file stream,
single logical key, `applyInPandasWithState` holding (tau, centers)
in the state store as JSON. Each micro-batch emits a snapshot tagged
with a monotonically increasing seq; the query returns the final
snapshot.

At scale this runs per shard key (groupBy(shard)) to parallelize, and
the per-shard coresets compose by union + re-merge — the same
composability the MapReduce variant exploits.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import query
from ..sources import load

KPRIME = 16

OUTPUT_SCHEMA = (
    "seq int, rank int, vec_id bigint, weight bigint, tau double"
)
STATE_SCHEMA = "seq int, payload string"


def _dist(a, b) -> float:
    return math.sqrt(sum((x - y) * (x - y) for x, y in zip(a, b)))


def fold_point(state: dict, vec_id: int, vec: list) -> None:
    """Insert one point into the (tau, centers) summary — the exact
    per-item update of the streaming algorithm."""
    centers = state["centers"]  # list of [vec_id, vec, weight]
    if not centers:
        centers.append([vec_id, vec, 1])
        return
    dists = [_dist(vec, c[1]) for c in centers]
    dmin = min(dists)
    if dmin <= state["tau"]:
        centers[min(range(len(dists)), key=lambda i: (dists[i], i))][2] += 1
        return
    centers.append([vec_id, vec, 1])
    # overflow: raise tau (geometric growth, floored just above the
    # closest center pair so each round merges >= 1 center) and
    # greedily re-merge until back under k'. The paper's pure tau*2
    # collapses on distance-concentrated data (e.g. iid gaussians,
    # where ALL pairwise distances are ~equal); gentler growth keeps
    # a logarithmic round bound with a usable summary (growth 1.1,
    # floored at the closest pair — data-driven, monotone).
    while len(centers) > KPRIME:
        pair_min = min(
            _dist(a[1], b[1])
            for i, a in enumerate(centers)
            for b in centers[i + 1 :]
        )
        state["tau"] = max(1.1 * state["tau"], pair_min * 1.000001)
        kept: list = []
        dropped: list = []
        for c in centers:
            if all(_dist(c[1], kc[1]) > state["tau"] for kc in kept):
                kept.append(c)
            else:
                dropped.append(c)
        for c in dropped:
            tgt = min(
                range(len(kept)), key=lambda i: (_dist(c[1], kept[i][1]), i)
            )
            kept[tgt][2] += c[2]
        centers = kept
    state["centers"] = centers


def _handler(key, pdf_iter, state: GroupState):
    if state.exists:
        seq, payload = state.get
        st = json.loads(payload)
    else:
        seq, st = 0, {"tau": 0.0, "centers": []}
    for pdf in pdf_iter:
        pdf = pdf.sort_values("vec_id")
        for vid, vec in zip(pdf["vec_id"], pdf["embedding"]):
            fold_point(st, int(vid), [float(x) for x in vec])
    seq += 1
    state.update((seq, json.dumps(st)))
    yield pd.DataFrame(
        [
            (seq, rank, c[0], c[2], st["tau"])
            for rank, c in enumerate(st["centers"])
        ],
        columns=["seq", "rank", "vec_id", "weight", "tau"],
    )


def streaming_coreset(spark: SparkSession, sf_dir: str, n_slices: int = 4) -> DataFrame:
    # replay embeddings as an ordered stream
    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    per = max(1, n // n_slices)
    replay = tempfile.mkdtemp(prefix="dms_score_")
    for i in range(n_slices):
        lo, hi = i * per, (i + 1) * per if i < n_slices - 1 else n
        part = emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
            if i < n_slices - 1
            else (F.col("vec_id") >= lo)
        )
        d = tempfile.mkdtemp()
        part.orderBy("vec_id").coalesce(1).write.mode("overwrite").parquet(d)
        f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
        shutil.copy(os.path.join(d, f), os.path.join(replay, f"{i:04d}.parquet"))
        shutil.rmtree(d, ignore_errors=True)

    st = (
        spark.readStream.schema("vec_id bigint, embedding array<float>, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    from .windows import _fresh

    snap = (
        st.select(F.lit(0).alias("g"), "vec_id", "embedding")
        .groupBy("g")
        .applyInPandasWithState(
            _handler,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    name = _fresh("score")
    q = (
        snap.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    all_snaps = spark.table(name)
    last = all_snaps.agg(F.max("seq")).collect()[0][0]
    return all_snaps.filter(F.col("seq") == last).select(
        "rank", "vec_id", "weight", F.round("tau", 6).alias("tau")
    )


@query("div_coreset_stream")  # rows-only: invariants in test_streaming.py
def div_coreset_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass doubling coreset over the embeddings stream."""
    return streaming_coreset(spark, sf_dir)
