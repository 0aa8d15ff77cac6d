"""Distributed BPE must match the pure-Python reference exactly:
same merges in the same order with the same counts, and the same
per-doc subword counts."""

import pandas as pd

from diversity_maximization_spark import registry
from diversity_maximization_spark.llm.bpe import (
    N_MERGES,
    apply_merges_reference,
    bpe_reference,
    bpe_train_merges,
)
from diversity_maximization_spark.sources import load


def _ref_word_freqs(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    wf: dict[str, int] = {}
    for text in docs["text"]:
        for w in text.split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    return wf


def test_bpe_train_matches_reference(spark, sf_dir):
    """The DISTRIBUTED tier (local finish forced off) must match the
    pure-Python reference merge-for-merge."""
    wf = _ref_word_freqs(sf_dir)
    want = bpe_reference(wf, N_MERGES)
    got = bpe_train_merges(
        load(spark, sf_dir, "documents"), N_MERGES,
        local_finish_max_words=0,
    )
    assert got == want


def test_bpe_local_finish_equals_distributed(spark, sf_dir):
    """The default local-finish tier must learn the identical merge
    sequence as the distributed loop (the tier switch is a pure
    performance decision) and must stay within the documented job
    budget: a constant handful (AQE splits the corpus aggregation
    into a few jobs), never one-plus jobs per merge like the
    distributed loop's ~2*N_MERGES."""
    d = load(spark, sf_dir, "documents")
    local = bpe_train_merges(d, N_MERGES)  # fixture is under threshold
    dist = bpe_train_merges(d, N_MERGES, local_finish_max_words=0)
    assert local == dist

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    sc.setJobGroup("bpe-local-finish", "job-count probe")
    try:
        bpe_train_merges(d, N_MERGES)
    finally:
        sc.setJobGroup(None, None)
    jobs = len(tracker.getJobIdsForGroup("bpe-local-finish") or [])
    assert 0 < jobs <= 6 < N_MERGES, jobs


def test_bpe_train_key_schema_and_determinism(spark, sf_dir):
    rows = registry.QUERIES["bpe_train"](spark, sf_dir).collect()
    assert [r["step"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(r["merged"] == r["left"] + r["right"] for r in rows)
    # merge counts are non-increasing only per-pair-recount semantics;
    # every count must be positive and the pairs distinct
    assert all(r["count"] > 0 for r in rows)
    assert len({(r["left"], r["right"]) for r in rows}) == len(rows)


def test_tokenize_bpe_matches_reference(spark, sf_dir):
    out = (
        registry.QUERIES["tokenize_bpe"](spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").set_index(
        "doc_id"
    ).sort_index()
    assert len(out) == len(docs)
    wf = _ref_word_freqs(sf_dir)
    merges = bpe_reference(wf, N_MERGES)
    cache = {}
    for doc_id, text in docs["text"].head(50).items():
        words = [w for w in text.split(" ") if w]
        n_sub = 0
        for w in words:
            if w not in cache:
                cache[w] = len(apply_merges_reference(w, merges))
            n_sub += cache[w]
        assert out.loc[doc_id, "n_words"] == len(words)
        assert out.loc[doc_id, "n_subwords"] == n_sub
