"""Scale-ladder probe: wall-time scaling slopes for the O(n^2)-risk keys.

The fixtures stop at sf0.1 (2 000 embeddings / 5 000 documents), which
cannot distinguish "the plan is linear" from "the plan is quadratic but
small". This tool generates synthetic rungs at 1x / ~3x / 10x the
sf0.1 row counts (10x == the ~sf1-equivalent the round-5 verdict asked
for: 20 000 x 64-d vectors, 60 000 documents), runs each probed key on
each rung, and reports the fitted log-log slope

    alpha = log(t_hi / t_lo) / log(n_hi / n_lo)

between consecutive rungs and across the whole ladder. A linear plan
shows alpha ~= 1 (plus a constant job floor that DEFLATES the slope at
small t); a quadratic plan shows alpha -> 2 as n grows. Results land in
PLANS.md ("Scaling slopes") and .tmp/scale_ladder.json.

Probed keys (the round-5 verdict's list):

  sim_search_topk, knn_classify_eval  - BLAS-prune candidate tiers
  dedup_minhash, dedup_components     - banded LSH + label propagation
  div_gmm                             - k=16 farthest-first rounds
  graph_scc                           - pointer doubling; probed via
      _scc_pointer_doubling directly because the REGISTERED key guards
      at the oracle's N <= 8192 unroll ceiling (an oracle artifact, not
      an engine limit)

Synthetic data is generated with a fixed seed: embeddings are 10
Gaussian label clusters on 64-d (float32, like the fixture); documents
are 45-60-token texts over a 32-token vocabulary with a 5% exact-dup
tail so dedup keys have scale-invariant work density. The generator
keeps doc_ids dense 0..N-1 (graph_scc's contract).

Usage:
    python tools/scale_ladder.py [--rungs 1,3,10] [--keys k1,k2,...]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, ".")

BASE_EMB = 2_000  # sf0.1 embeddings rows
BASE_DOC = 6_000  # ~sf0.1 documents rows (5 000), rounded for clean 10x
DIM = 64
VOCAB = (
    "batch part spark line column order small sort fast value scan slow "
    "hash group agg filter query big key window row table stream merge "
    "data join shuffle stage plan codegen broadcast skew"
).split()


def gen_rung(rung_dir: str, mult: int, seed: int = 20260815) -> None:
    os.makedirs(rung_dir, exist_ok=True)
    rng = np.random.RandomState(seed + mult)

    n_emb = BASE_EMB * mult
    centers = rng.randn(10, DIM) * 2.0
    labels = rng.randint(0, 10, size=n_emb)
    emb = (centers[labels] + rng.randn(n_emb, DIM)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
                "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
                "label": pa.array(labels.astype(np.int32)),
            }
        ),
        f"{rung_dir}/embeddings.parquet",
    )

    n_doc = BASE_DOC * mult
    lengths = rng.randint(45, 61, size=n_doc)
    texts: list[str] = []
    for i in range(n_doc):
        if i > 20 and rng.rand() < 0.05:  # exact-dup tail, density-invariant
            texts.append(texts[rng.randint(0, i)])
        else:
            texts.append(
                " ".join(rng.choice(VOCAB, size=lengths[i]).tolist())
            )
    langs = rng.choice(["en", "zh", "de", "fr"], size=n_doc)
    sources = np.array([f"src{i % 8}" for i in range(n_doc)])
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(langs),
                "source": pa.array(sources),
                "n_chars": pa.array(
                    np.array([len(t) for t in texts], dtype=np.int64)
                ),
            }
        ),
        f"{rung_dir}/documents.parquet",
    )


def run_key(spark, key: str, rung_dir: str, n_doc: int) -> float:
    from diversity_maximization_spark import registry
    from diversity_maximization_spark.operators.graph import (
        _scc_pointer_doubling,
    )
    from diversity_maximization_spark.sources import load

    t0 = time.time()
    if key == "graph_scc":
        d = load(spark, rung_dir, "documents")
        _scc_pointer_doubling(d, n_doc).count()
    else:
        registry.QUERIES[key](spark, rung_dir).count()
    return time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rungs", default="1,3,10")
    ap.add_argument(
        "--keys",
        default=(
            "sim_search_topk,knn_classify_eval,dedup_minhash,"
            "dedup_components,div_gmm,graph_scc"
        ),
    )
    ap.add_argument("--out", default=".tmp/scale_ladder.json")
    args = ap.parse_args()
    rungs = [int(x) for x in args.rungs.split(",")]
    keys = args.keys.split(",")

    from diversity_maximization_spark import registry
    from diversity_maximization_spark.session import get_spark

    registry.load_all()
    spark = get_spark("dms-scale-ladder")

    for m in rungs:
        rd = f".tmp/ladder/L{m}"
        if not os.path.exists(f"{rd}/documents.parquet"):
            print(f"generating rung {m}x ...", flush=True)
            gen_rung(rd, m)

    results: dict[str, dict] = {}
    for key in keys:
        # one untimed warm run at the smallest rung (JVM/codegen warm)
        run_key(spark, key, f".tmp/ladder/L{rungs[0]}", BASE_DOC * rungs[0])
        times: dict[int, float] = {}
        for m in rungs:
            t = run_key(spark, key, f".tmp/ladder/L{m}", BASE_DOC * m)
            times[m] = round(t, 3)
            print(f"{key} @ {m}x: {t:.2f}s", flush=True)
        lo, hi = rungs[0], rungs[-1]
        slope = (
            math.log(times[hi] / times[lo]) / math.log(hi / lo)
            if hi > lo
            else float("nan")
        )
        seg = {
            f"{a}x->{b}x": round(
                math.log(times[b] / times[a]) / math.log(b / a), 3
            )
            for a, b in zip(rungs, rungs[1:])
        }
        results[key] = {
            "times_sec": {f"{m}x": times[m] for m in rungs},
            "slope_overall": round(slope, 3),
            "slope_segments": seg,
        }
        print(f"{key}: overall slope {slope:.2f} {seg}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(
            {
                "base_rows": {"embeddings": BASE_EMB, "documents": BASE_DOC},
                "rungs": rungs,
                "results": results,
            },
            f,
            indent=1,
        )
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
