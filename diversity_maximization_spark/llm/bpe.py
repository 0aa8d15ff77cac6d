"""Distributed BPE (byte-pair encoding) vocabulary learning and
tokenization — the tokenizer-training leg of a pre-training data
pipeline.

Classic BPE (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units") trains on the WORD-FREQUENCY table,
not the raw corpus: a 100 TB corpus collapses to a distinct-word
table (millions of rows, not trillions of tokens) with one
groupBy(word).count() — after that, every merge iteration touches
only the vocabulary table. That is the property that makes BPE
training distributable at all, and this module keeps it:

- ``bpe_train``: after the collapse, the merge loop runs in one of
  two tiers chosen by word-table size (see ``bpe_train_merges``):
  a LOCAL FINISH on the collected vocabulary-sized table (the
  production shape — <= 3 Spark jobs total, only one corpus-sized),
  or the distributed k-round loop for vocabularies too large to
  collect: each round one small Spark job over the (word, freq,
  symbols) table — explode adjacent symbol pairs weighted by word
  frequency, groupBy pair, take the argmax (count desc, then
  lexicographic pair — fully deterministic), contract with a narrow
  Arrow-batched map. The sequential rounds are inherent to exact
  greedy BPE (each merge changes the next round's pair counts).
- ``tokenize_bpe``: apply the learned merge list (broadcast — it is
  k rows) to every document with one Arrow-batched mapInPandas pass:
  narrow, shuffle-free, linear in corpus size.

Both keys are rows-only (greedy BPE is not expressible in SQL);
exactness is instead pinned by tests/test_bpe.py: the distributed
trainer and tokenizer must match a pure-Python reference
implementation merge-for-merge and token-for-token.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load

N_MERGES = 20
END_OF_WORD = "</w>"


# ---------------------------------------------------------------- reference


def bpe_reference(word_freqs: dict[str, int], k: int):
    """Pure-Python exact BPE for tests: returns (merges, vocab) where
    merges is a list of ((left, right), count) in merge order."""
    syms = {w: list(w) + [END_OF_WORD] for w in word_freqs}
    merges = []
    for _ in range(k):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        merges.append(((l, r), c))
        for w in syms:
            s = syms[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def apply_merges_reference(word: str, merges) -> list[str]:
    """Tokenize one word with a learned merge list, in merge order."""
    s = list(word) + [END_OF_WORD]
    for (l, r), _ in merges:
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


# -------------------------------------------------------------- distributed


def word_freq_table(d: DataFrame) -> DataFrame:
    """Corpus -> (word, freq): the one corpus-sized shuffle."""
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _contract(batch_iter, left: str, right: str):
    for pdf in batch_iter:
        out = []
        for syms in pdf["syms"]:
            s = list(syms)
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            out.append(res)
        yield pd.DataFrame(
            {"word": pdf["word"], "freq": pdf["freq"], "syms": out}
        )


# Local-finish threshold: after the one corpus-sized shuffle the
# distinct-word table is vocabulary-sized; when it fits comfortably on
# the driver (<= this many words, ~tens of MB) the merge loop runs
# locally with the exact reference implementation instead of k
# sequential Spark jobs. See PLANS.md "bpe_train local finish".
LOCAL_FINISH_MAX_WORDS = 500_000


def bpe_train_merges(
    d: DataFrame,
    k: int = N_MERGES,
    local_finish_max_words: int = LOCAL_FINISH_MAX_WORDS,
) -> list[tuple]:
    """Learn k merges; returns [((l, r), count), ...].

    Two tiers, identical results (same greedy argmax, same
    count-desc-then-lexicographic tie-break — equality pinned in
    tests/test_bpe.py):

    - local finish (word table <= ``local_finish_max_words``): ONE
      corpus-sized Spark job builds + checkpoints the word-frequency
      table, two vocabulary-sized jobs count and collect it (AQE may
      split these into a few more physical jobs — the count stays a
      constant, pinned in tests), and the
      merge loop runs on the driver via ``bpe_reference``. This is
      the production shape for real corpora — a 32k-merge vocabulary
      as 32k sequential cluster-wide shuffles is a scheduler-floor
      disaster, while the collapsed word table is vocabulary-sized
      BY CONSTRUCTION and the driver loop touches no corpus data.
    - distributed (above threshold): the original k-round loop, one
      small Spark job per merge over the (word, freq, syms) table —
      explode adjacent pairs weighted by frequency, argmax, contract
      with an Arrow-batched map. Kept for vocabularies too large to
      collect; merges interact, so the gmm.py batched-refill proof
      does not apply and rounds stay sequential.
    """
    wf = word_freq_table(d)
    if local_finish_max_words:
        wf = wf.localCheckpoint(eager=True)
        if wf.count() <= local_finish_max_words:
            word_freqs = {
                r["word"]: int(r["freq"]) for r in wf.collect()
            }
            return bpe_reference(word_freqs, k)
    state = wf.select(
        "word",
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))
        ).alias("syms"),
    ).localCheckpoint(eager=True)

    merges: list[tuple] = []
    schema = "word string, freq bigint, syms array<string>"
    for _ in range(k):
        pairs = state.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, cnt = top[0]["l"], top[0]["r"], top[0]["cnt"]
        merges.append(((l, r), int(cnt)))
        state = state.mapInPandas(
            lambda it, _l=l, _r=r: _contract(it, _l, _r), schema
        ).localCheckpoint(eager=True)
    return merges


@query("bpe_train")  # rows-only: greedy BPE is not SQL-expressible
def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table (step, left, right, merged, count) for
    the fixture corpus — deterministic: ties break lexicographically,
    counts are exact integers, so any cluster layout learns the
    identical vocabulary (pinned against the pure-Python reference in
    tests/test_bpe.py)."""
    d = load(spark, sf_dir, "documents")
    merges = bpe_train_merges(d, N_MERGES)
    rows = [
        (i + 1, l, r, l + r, c)
        for i, ((l, r), c) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "step int, left string, right string, merged string, count bigint"
    )


@query("tokenize_bpe")  # rows-only: depends on the learned merges
def tokenize_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize every document with the learned BPE vocabulary and
    report per-doc subword counts plus the compression ratio vs
    whitespace words — the number a tokenizer team actually tracks.
    The merge list (k rows) broadcasts inside an Arrow-batched
    mapInPandas closure; tokenization is a narrow map over the corpus
    (per-word results memoized per batch — word soup repeats words,
    and so does any real corpus under Zipf)."""
    d = load(spark, sf_dir, "documents")
    merges = bpe_train_merges(d, N_MERGES)

    def tok(batch_iter):
        cache: dict[str, int] = {}
        for pdf in batch_iter:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in text.split(" ") if w]
                n_sub = 0
                for w in words:
                    if w not in cache:
                        cache[w] = len(apply_merges_reference(w, merges))
                    n_sub += cache[w]
                out.append((doc_id, len(words), n_sub))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_words", "n_subwords"]
            )

    toks = d.select("doc_id", "text").mapInPandas(
        tok, "doc_id bigint, n_words bigint, n_subwords bigint"
    )
    return toks.select(
        "doc_id",
        "n_words",
        "n_subwords",
        F.when(
            F.col("n_words") > 0,
            F.col("n_subwords").cast("double") / F.col("n_words"),
        )
        .otherwise(F.lit(0.0))
        .alias("subwords_per_word"),
    )
