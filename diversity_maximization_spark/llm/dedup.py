"""Deduplication operators (SURVEY.md §2.2-L; 100 TB mandate).

Four tiers, each the standard scale architecture:
- exact: hash-groupBy on md5(text) — one shuffle of (hash, id);
- minhash LSH: shingle -> 16 minhashes -> 4 bands -> bucket join.
  Only documents sharing a band bucket are ever paired, so the
  all-pairs O(n^2) never materializes; candidates are verified with
  exact shingle-set Jaccard via a sparse self-join;
- simhash: 64-bit signature, banded by 16-bit chunks, verified by
  hamming distance (bit_count(xor)) — all JVM-side;
- n-gram Jaccard: the sparse inverted-index self-join formulation
  (pairs exist only if they share a shingle) — pure SQL, scales with
  the posting-list sizes, not n^2.

All hashes are deterministic (xxhash64 with fixed seeds / md5), so
results are reproducible across runs and cluster layouts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import QUERIES, query
from ..sources import load

N_MINHASH = 16
N_BANDS = 4
ROWS_PER_BAND = 4
SHINGLE = 3


@query(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS text_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper_doc
FROM documents
GROUP BY md5(text)
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups (all hash groups; n_copies > 1 = dups).
    The canonical keeper is the minimum doc_id."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper_doc")
    )


def shingles_df(d: DataFrame) -> DataFrame:
    """Distinct word-3-shingles per doc.

    Arrow-batched pandas pass, one split per document. (The pure-SQL
    formulation — transform(sequence(...), i -> slice(split(text),
    ...)) — re-evaluates split() per shingle index because
    CollapseProject inlines the alias into the lambda: O(words^2)
    string splits per doc, measured 4.2s vs 0.4s at sf0.1.)
    Semantics identical to the DuckDB oracle in dedup_ngram_jaccard:
    consecutive word windows, distinct per doc, empties dropped.

    Parallelism guard (round-6 ladder finding): a small-file scan
    yields 1-2 input partitions and EXPLODE never re-splits, so the
    whole shingle -> md5-signature pipeline ran on 2 of 32 cores at
    the 60k-doc rung (68 s where ~8 s is the arithmetic). When the
    scan has fewer partitions than the cluster's parallelism,
    repartition the (narrow) documents first — a no-op at 100 TB,
    where the scan already carries thousands of splits."""

    def gen(batches):
        for pdf in batches:
            ids, shs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                ws = text.split(" ")
                # docs shorter than SHINGLE words produce NO shingles,
                # matching the oracle's generate_series(1, len-2) being
                # empty for len < 3 (ADVICE r01).
                n = max(len(ws) - SHINGLE + 1, 0)
                uniq = {" ".join(ws[i : i + SHINGLE]) for i in range(n)}
                uniq.discard("")
                ids.extend([doc_id] * len(uniq))
                shs.extend(uniq)
            yield pd.DataFrame({"doc_id": ids, "shingle": shs})

    src = d.select("doc_id", "text")
    par = src.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    return src.mapInPandas(gen, "doc_id bigint, shingle string")


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """16 minhashes per doc: min over shingles of xxhash64(shingle, i)."""
    aggs = [
        F.min(F.xxhash64("shingle", F.lit(i))).alias(f"h{i}")
        for i in range(N_MINHASH)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


@query("dedup_minhash")  # rows-only: hash family is engine-specific
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs over the fixture corpus — see
    ``minhash_near_dup_pairs``."""
    return minhash_near_dup_pairs(load(spark, sf_dir, "documents"))


def lsh_candidate_pairs(sig: DataFrame) -> DataFrame:
    """Band-bucket LSH candidate pairs from a minhash signature table:
    each signature is folded into N_BANDS bucket keys, docs sharing a
    (band, bucket) key are paired by an EQUI self-join, pairs
    deduped. This is the pre-verification candidate set the banding
    scheme commits to — dedup_minhash_eval measures its recall and
    precision against exact-Jaccard ground truth."""
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[f"h{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
            ).alias("bucket"),
        )
        for b in range(N_BANDS)
    ]
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.35,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs over any (id, text)
    DataFrame, verified with exact Jaccard. Pipeline: shingle ->
    signature -> band buckets -> bucket self-join -> sparse
    exact-Jaccard verification.
    Property (tests): every exact-duplicate pair must appear.
    (The shingle cache is read three times — the combined
    signature+size aggregation and both verify sides — which is why
    it is cached; callers running many queries in one driver session
    can spark.catalog.clearCache().)"""
    d = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    sh = shingles_df(d).cache()
    # One combined per-doc aggregation (guide §2.3/§2.4): the 16
    # minhash mins AND the shingle count come out of a single shuffle
    # over the cached shingle table, instead of the former separate
    # minhash_signatures + groupBy().count() pair — one less full
    # pass over the (big at 100 TB) shingle table and one less
    # Exchange. Cached because three subtrees consume it (banding +
    # both size joins); the cache holds one narrow row per doc.
    sig = (
        sh.groupBy("doc_id")
        .agg(
            *[
                F.min(F.xxhash64("shingle", F.lit(i))).alias(f"h{i}")
                for i in range(N_MINHASH)
            ],
            F.count(F.lit(1)).alias("n_sh"),
        )
        .cache()
    )

    cand = lsh_candidate_pairs(sig)

    # exact Jaccard verification via the sparse shingle join
    sizes = sig.select("doc_id", "n_sh")
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cand.join(sa, "doc_a").join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        common.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "sz_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "sz_b"}), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def _simhash_batches(batches):
    for pdf in batches:
        out = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            words, counts = np.unique(text.split(" "), return_counts=True)
            acc = np.zeros(64, dtype=np.int64)
            for w, c in zip(words, counts):
                h = int.from_bytes(
                    hashlib.md5(w.encode()).digest()[:8], "big", signed=False
                )
                bits = np.array([(h >> j) & 1 for j in range(64)], dtype=np.int64)
                acc += np.where(bits == 1, int(c), -int(c))
            sig = 0
            for j in range(64):
                if acc[j] > 0:
                    sig |= 1 << j
            if sig >= 1 << 63:  # two's-complement into int64
                sig -= 1 << 64
            out.append((doc_id, sig))
        yield pd.DataFrame(out, columns=["doc_id", "simhash"])


def simhash_df(d: DataFrame) -> DataFrame:
    """64-bit SimHash per doc (Arrow-batched pandas; deterministic md5
    word hashes)."""
    return d.select("doc_id", "text").mapInPandas(
        _simhash_batches, "doc_id bigint, simhash bigint"
    )


def _simhash_oracle_sig_sql() -> str:
    """DuckDB CTE computing the EXACT same 64-bit SimHash as
    _simhash_batches, bit for bit: md5 word hashes (identical hex in
    hashlib and DuckDB), per-bit weighted sign sums over the word
    counts, two's-complement assembly into BIGINT. Bit j of the
    big-endian first-8-bytes value lives in hex nibble (63-j)//4 at
    nibble bit j%4 — all small-int arithmetic, no int128 anywhere.
    Validated char-for-char against the Python reference."""
    acc_cols = ",\n".join(
        "SUM(c * (CASE WHEN (((strpos('0123456789abcdef', "
        f"substr(md5(word), {(63 - j) // 4 + 1}, 1)) - 1) >> {j % 4})"
        f" & 1) = 1 THEN 1 ELSE -1 END)) AS a{j}"
        for j in range(64)
    )
    sig_expr = " + ".join(
        (
            f"(CASE WHEN a{j} > 0 THEN "
            "CAST(-9223372036854775808 AS BIGINT) ELSE 0 END)"
            if j == 63
            else f"(CASE WHEN a{j} > 0 THEN CAST({1 << j} AS BIGINT)"
            " ELSE 0 END)"
        )
        for j in range(64)
    )
    return f"""
WITH words AS (
  SELECT doc_id, word, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents)
  GROUP BY doc_id, word
), accs AS (
  SELECT doc_id, {acc_cols} FROM words GROUP BY doc_id
), sigs AS (
  SELECT doc_id, {sig_expr} AS simhash FROM accs
)
"""


@query(
    "dedup_simhash",
    oracle=_simhash_oracle_sig_sql()
    + """
, chunks AS (
  SELECT doc_id, simhash, i AS chunk, (simhash >> (16 * i)) & 65535 AS val
  FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM chunks a
JOIN chunks b ON a.chunk = b.chunk AND a.val = b.val
            AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 12
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit signature into 4
    16-bit chunks, verify by hamming distance <= 12 via bit_count(xor)
    — JVM built-ins end to end.

    Recall note (ADVICE r01): banding guarantees a shared chunk only
    for hamming <= 3 (pigeonhole on 4 chunks); above that, candidate
    generation is lossy — a pair at hamming 4..12 is found only if its
    flipped bits cluster outside one chunk. This is the standard
    LSH recall/cost trade; raise band count for higher recall.

    Hash-checked since round 5 (was rows-only): the md5 word-hash
    family is bit-identical in DuckDB, so the oracle replays
    signature bits (_simhash_oracle_sig_sql), the 4x16-bit banding
    ((sig >> 16i) & 0xFFFF — mask-after-shift is fill-agnostic, so
    DuckDB's arithmetic shift equals Spark's shiftrightunsigned
    here), the banded candidate join, and the bit_count(xor) verify,
    all in SQL."""
    d = load(spark, sf_dir, "documents")
    sig = simhash_df(d)
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk", "cc.val")
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 12)
    )


SIMHASH_EXACT_D = 3


@query(
    "dedup_simhash_exact",
    oracle=_simhash_oracle_sig_sql()
    + f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_EXACT_D}
""",
)
def dedup_simhash_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL SimHash pairs at hamming distance <= {d} — the exact tier
    of the simhash family, and the hash-matched proof the banding
    machinery dedup_simhash builds on is sound: with 4 chunks over
    64 bits, any pair with <= 3 flipped bits shares at least one
    untouched chunk (pigeonhole), so the banded candidate join is
    LOSSLESS at this threshold and the engine result is exact while
    never materializing all pairs. The oracle recomputes the
    signatures bit-for-bit in SQL (md5 nibble arithmetic, see
    _simhash_oracle_sig_sql) and brute-forces every pair —
    intentionally naive (PLANS.md). dedup_simhash keeps the wider
    d <= 12 recall-bounded tier; this key is the d <= {d} exact
    contract a dedup pipeline can actually certify.""".format(
        d=SIMHASH_EXACT_D
    )
    d = load(spark, sf_dir, "documents")
    sig = simhash_df(d)
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk", "cc.val")
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= SIMHASH_EXACT_D)
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, greatest(len(ws) - {SHINGLE - 1}, 0)),
             i -> array_to_string(ws[i:i+{SHINGLE - 1}], ' '))) AS shingle
    FROM words)
  WHERE length(shingle) > 0
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.2
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity via the inverted-index sparse
    self-join (pairs only exist where a shingle is shared — the
    scalable exact formulation)."""
    d = load(spark, sf_dir, "documents")
    # cached: sh feeds sizes + BOTH sides of the self-join, and the
    # shingle generation is a Python (mapInPandas) pass over the corpus
    # — without the cache it runs three times per execution
    sh = shingles_df(d).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
    return (
        common.join(
            sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "sz_a"}), "doc_a"
        )
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "sz_b"}), "doc_b")
        .filter(jac >= 0.2)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@query(
    "dedup_containment",
    oracle=f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, greatest(len(ws) - {SHINGLE - 1}, 0)),
             i -> array_to_string(ws[i:i+{SHINGLE - 1}], ' '))) AS shingle
    FROM words)
  WHERE length(shingle) > 0
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(CAST(n_common AS DOUBLE) / least(sa.n_sh, sb.n_sh), 6)
         AS containment
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / least(sa.n_sh, sb.n_sh) >= 0.5
""",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-containment near-dup pairs: |A n B| / min(|A|, |B|) over
    the same 3-gram shingle sets as dedup_ngram_jaccard. Containment
    is the measure Jaccard structurally misses — a short document
    quoted whole inside a long one scores ~|A|/|B| on Jaccard (tiny)
    but ~1.0 on containment, which is exactly the
    quoted-inside/boilerplate-inclusion case a pretraining dedup
    cascade must catch (same motivation as passage-level dedup, but
    pairwise). Identical inverted-index sparse-join shape: pairs
    exist only where a shingle is shared, the shingle table shuffles
    once, and the threshold (0.5) prunes before output."""
    d = load(spark, sf_dir, "documents")
    sh = shingles_df(d).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    cont = F.col("n_common") / F.least(F.col("sz_a"), F.col("sz_b"))
    return (
        common.join(
            sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "sz_a"}), "doc_a"
        )
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "sz_b"}), "doc_b")
        .filter(cont >= 0.5)
        .select("doc_a", "doc_b", F.round(cont, 6).alias("containment"))
    )


CERT_NH = 8  # 32-bit md5 minhashes
CERT_BANDS = ((0, 1, 2, 3), (4, 5, 6, 7))  # 2 bands x 4 rows


def _md5_hex32_sql(arg: str) -> str:
    """DuckDB BIGINT expression for the first 32 bits of md5(arg):
    nibble-sum over the first 8 hex chars — identical to Spark's
    conv(substr(md5(x), 1, 8), 16, 10)."""
    return "(" + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({arg}), {k}, 1)) - 1)"
        f" * {16 ** (8 - k)}"
        for k in range(1, 9)
    ) + ")"


def _minhash_certified_oracle() -> str:
    hv = _md5_hex32_sql("shingle || '|' || CAST(i AS VARCHAR)")
    pivots = ",\n".join(
        f"MIN(CASE WHEN i = {i} THEN hv END) AS h{i}"
        for i in range(CERT_NH)
    )
    band_eq = " OR ".join(
        "(" + " AND ".join(f"a.h{i} = b.h{i}" for i in band) + ")"
        for band in CERT_BANDS
    )
    return f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, greatest(len(ws) - {SHINGLE - 1}, 0)),
             i -> array_to_string(ws[i:i+{SHINGLE - 1}], ' '))) AS shingle
    FROM words)
  WHERE length(shingle) > 0
), hv AS (
  SELECT doc_id, i, {hv} AS hv
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {CERT_NH - 1})) AS i)
), mh AS (
  SELECT doc_id, {pivots} FROM hv GROUP BY doc_id
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM mh a JOIN mh b ON a.doc_id < b.doc_id AND ({band_eq})
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       round(CAST(n_common AS DOUBLE)
             / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM cand JOIN common c USING (doc_a, doc_b)
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.2
"""


@query("dedup_minhash_certified", oracle=_minhash_certified_oracle())
def dedup_minhash_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL MinHash-LSH near-dup pipeline with every stage
    hash-checked: 3-word shingles -> 8 md5-based 32-bit minhashes ->
    2 bands x 4 rows -> banded candidate equi-join -> exact-Jaccard
    re-score (>= 0.2). Unlike dedup_minhash (xxhash64 signatures —
    engine-specific hash family, rows-only), the md5 hash family is
    bit-identical in DuckDB, so the oracle replays the ENTIRE chain
    in SQL (naive all-pairs band comparison — see PLANS.md) and the
    driver hash proves signature, banding, and re-score all exact.
    Scale shape is the production one: minhashes are 8 min-aggs over
    the shingle explosion (no UDF — md5/substr/conv built-ins),
    candidates come from a banded equi-join (never all pairs), and
    only candidates are re-scored."""
    d = load(spark, sf_dir, "documents")
    sh = shingles_df(d).cache()
    hcols = [
        F.min(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("shingle"), F.lit(f"|{i}"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
        ).alias(f"h{i}")
        for i in range(CERT_NH)
    ]
    mh = sh.groupBy("doc_id").agg(*hcols)
    bands = mh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        *[
                            F.col(f"h{i}").alias(f"k{j}")
                            for j, i in enumerate(band)
                        ],
                    )
                    for bi, band in enumerate(CERT_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.*")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            ["band", "k0", "k1", "k2", "k3"],
        )
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    common = (
        sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"), "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
    return (
        cand.join(common, ["doc_a", "doc_b"])
        .join(
            sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "sz_a"}),
            "doc_a",
        )
        .join(
            sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "sz_b"}),
            "doc_b",
        )
        .filter(jac >= 0.2)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def connected_components(
    edges: DataFrame, vertices: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Distributed connected components by min-label propagation —
    iterative equi-joins only, no GraphFrames (SURVEY.md §7 M4).

    `edges` (src, dst) undirected pairs; `vertices` one `id` column.
    Each round every vertex takes the min of its own label and its
    neighbors' labels; converges in O(component diameter) rounds
    (near-dup clusters are tiny, so a handful). Lineage is cut with
    localCheckpoint per round so the plan stays flat; the loop stops
    when a round changes nothing (count of changed labels — one cheap
    agg per round). Deterministic: component id = min vertex id."""
    # checkpoint the symmetrized edge set ONCE: the loop (and each
    # round's convergence count) re-executes every lazy upstream
    # otherwise — for er_resolve_entities that was the whole python
    # Jaro-Winkler pass re-run per round (r7 ladder catch: 43 s at
    # the 1x rung, ~4x the sum of its parts)
    # distinct() leaves the edge table hash(src,dst)-partitioned, but
    # every propagation round joins it on src alone — repartition on
    # src BEFORE the checkpoint so the loop never re-exchanges the
    # edge table (guide §2.4: one upfront shuffle buys one per round).
    sym = (
        edges.selectExpr("src", "dst")
        .unionAll(edges.selectExpr("dst AS src", "src AS dst"))
        .distinct()
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    from ..plans.iterate import iterate_with_barrier

    labels0 = vertices.select(
        F.col("id"), F.col("id").alias("label"), F.lit(False).alias("chg")
    ).localCheckpoint(eager=True)

    def cc_round(labels: DataFrame, r: int) -> DataFrame:
        neigh = (
            sym.join(labels, sym.src == labels.id)
            .groupBy("dst")
            .agg(F.min("label").alias("nmin"))
        )
        return labels.join(neigh, labels.id == neigh.dst, "left").select(
            "id",
            F.least("label", F.coalesce("nmin", "label")).alias("label"),
            (F.col("nmin") < F.col("label")).alias("chg"),
        )

    # constant edge side -> linear stat growth: lineage-only barrier;
    # stop when a round changes no label (one cheap agg per round)
    labels = iterate_with_barrier(
        labels0,
        cc_round,
        max_iter,
        squaring=False,
        converged=lambda st, r: st.filter("chg").count() == 0,
    )
    return labels.drop("chg")


def _exact_dup_edges(d: DataFrame) -> DataFrame:
    """Star edges (min id -> other ids) per exact-duplicate text group
    — one shuffle of (hash, id), never the O(group^2) pair set. Any
    spanning edge set yields the same connected components."""
    return (
        d.groupBy(F.md5("text").alias("h"))
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(
            F.expr("ids[0]").alias("src"),
            F.explode(F.expr("slice(ids, 2, size(ids))")).alias("dst"),
        )
    )


def _cc_certified_oracle() -> str:
    """Recursive-closure ground truth over (exact-dup ∪ certified-
    minhash-LSH) edges: the _minhash_certified_oracle pipeline down
    to thresholded pairs, unioned with exact-text pairs, then the
    same `reach` transitive closure as the ngram CC oracle."""
    body = _minhash_certified_oracle()
    # strip the final SELECT: keep the WITH ... CTE chain, re-close it
    # (RECURSIVE is required up front for the closure CTE below)
    ctes = body.split("\nSELECT c.doc_a", 1)[0].replace(
        "WITH words", "WITH RECURSIVE words", 1
    )
    return (
        ctes
        + f""", lsh AS (
  SELECT c.doc_a AS src, c.doc_b AS dst
  FROM cand JOIN common c USING (doc_a, doc_b)
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)
        >= 0.2
), epairs AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM documents a JOIN documents b
    ON a.text = b.text AND a.doc_id < b.doc_id
), alledges AS (
  SELECT src, dst FROM lsh UNION SELECT dst, src FROM lsh
  UNION SELECT src, dst FROM epairs UNION SELECT dst, src FROM epairs
), reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.id, e.dst FROM reach JOIN alledges e ON reach.r = e.src
)
SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id
"""
    )


@query("dedup_components", oracle=_cc_certified_oracle())
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate GROUPS: union the exact-dup and minhash-LSH
    near-dup pair sets, run distributed connected components, and
    report every document's component (component id = min doc_id —
    the keeper). The step that turns pairwise dedup into actual
    group-and-keep at scale. The near-pair source is the CERTIFIED
    md5 minhash tier (dedup_minhash_certified), so since round 4 the
    whole group-and-keep pipeline — signatures, banding, re-score,
    star edges, min-label propagation — is driver-hash-checked
    against a recursive-CTE transitive closure (the xxhash64 tier
    dedup_minhash remains for wider-signature workloads)."""
    d = load(spark, sf_dir, "documents")
    near_pairs = QUERIES["dedup_minhash_certified"](spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    edges = _exact_dup_edges(d).unionAll(near_pairs)
    verts = d.select(F.col("doc_id").alias("id"))
    comps = connected_components(edges, verts)
    return comps.select(
        F.col("id").alias("doc_id"), F.col("label").alias("component")
    )


# Shared oracle CTE block: n-gram-Jaccard + exact-dup edge set, then
# transitive closure (`reach`) — the recursive-CTE ground truth for the
# distributed min-label-propagation operator.
_CC_NGRAM_ORACLE_CTES = f"""
WITH RECURSIVE words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, greatest(len(ws) - {SHINGLE - 1}, 0)),
             i -> array_to_string(ws[i:i+{SHINGLE - 1}], ' '))) AS shingle
    FROM words)
  WHERE length(shingle) > 0
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), jpairs AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN sizes sa ON sa.doc_id = a.doc_id
  JOIN sizes sb ON sb.doc_id = b.doc_id
  GROUP BY a.doc_id, b.doc_id, sa.n_sh, sb.n_sh
  HAVING CAST(COUNT(*) AS DOUBLE) / (sa.n_sh + sb.n_sh - COUNT(*)) >= 0.2
), epairs AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM documents a JOIN documents b ON a.text = b.text AND a.doc_id < b.doc_id
), edges AS (
  SELECT src, dst FROM jpairs UNION SELECT dst AS src, src AS dst FROM jpairs
  UNION SELECT src, dst FROM epairs UNION SELECT dst AS src, src AS dst FROM epairs
), reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
)
"""


@query(
    "dedup_components_ngram",
    oracle=_CC_NGRAM_ORACLE_CTES
    + "SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id",
)
def dedup_components_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the ORACLE-EXPRESSIBLE edge set
    (exact-dup pairs + n-gram Jaccard >= 0.2 pairs), so the iterative
    min-label-propagation operator itself is hash-checked against a
    DuckDB recursive-CTE transitive closure — the strong-form check
    dedup_components (minhash edges, engine-specific hash family)
    can't have. Same component semantics: id = min doc_id reachable."""
    d = load(spark, sf_dir, "documents")
    near_pairs = QUERIES["dedup_ngram_jaccard"](spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    edges = _exact_dup_edges(d).unionAll(near_pairs)
    verts = d.select(F.col("doc_id").alias("id"))
    comps = connected_components(edges, verts)
    return comps.select(
        F.col("id").alias("doc_id"), F.col("label").alias("component")
    )


@query(
    "dedup_keep_canonical",
    oracle=_CC_NGRAM_ORACLE_CTES
    + """, comp AS (
  SELECT id, MIN(r) AS component FROM reach GROUP BY id
)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN comp ON d.doc_id = comp.id
WHERE comp.id = comp.component
""",
)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end dedup deliverable: the DEDUPLICATED corpus.
    One document per near-dup component (keeper = min doc_id = the
    component id), joined back to the corpus for its surviving
    metadata. At scale the keeper set is ~corpus-sized, so this is a
    plain shuffled equi-join on doc_id, not a broadcast."""
    d = load(spark, sf_dir, "documents")
    keep = (
        QUERIES["dedup_components_ngram"](spark, sf_dir)
        .filter(F.col("doc_id") == F.col("component"))
        .select("doc_id")
    )
    return d.join(keep, "doc_id").select("doc_id", "lang", "n_chars")


@query(
    "dedup_incremental",
    oracle="""
WITH split AS (
  SELECT doc_id, md5(text) AS h FROM documents
), bound AS (
  SELECT MAX(doc_id) // 2 AS b FROM documents
), old AS (
  SELECT DISTINCT h FROM split, bound WHERE doc_id < b
), new AS (
  SELECT doc_id, h FROM split, bound WHERE doc_id >= b
)
SELECT n.doc_id, (o.h IS NOT NULL) AS is_dup_of_existing
FROM new n LEFT JOIN old o ON n.h = o.h
""",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (batch-vs-corpus) exact dedup — the daily-crawl
    shape: the lower half of doc_id space stands in for the already-
    ingested corpus, the upper half for today's batch; each new doc
    is flagged iff its content hash already exists in the corpus.

    Plan: both sides reduce to 32-byte (hash) keys BEFORE any
    shuffle — the existing corpus contributes a DISTINCT hash set
    (in production this is the stored dedup index, not a rescan) and
    the join is a plain shuffled hash join on those keys; document
    text never moves. At 100 TB the shuffle carries only digests."""
    d = load(spark, sf_dir, "documents")
    b = d.agg(F.max("doc_id")).collect()[0][0] // 2
    hashed = d.select("doc_id", F.md5("text").alias("h"))
    old = hashed.filter(F.col("doc_id") < b).select("h").distinct()
    new = hashed.filter(F.col("doc_id") >= b)
    return (
        new.join(old.withColumnRenamed("h", "oh"), new["h"] == F.col("oh"), "left")
        .select("doc_id", F.col("oh").isNotNull().alias("is_dup_of_existing"))
    )


_PF_T = 0.5  # Jaccard threshold for the prefix-filter join


@query(
    "dedup_prefix_filter",
    oracle=f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, greatest(len(ws) - {SHINGLE - 1}, 0)),
             i -> array_to_string(ws[i:i+{SHINGLE - 1}], ' '))) AS shingle
    FROM words)
  WHERE length(shingle) > 0
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 6)
         AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= {_PF_T}
""",
)
def dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-similarity join with PREFIX FILTERING (PPJoin family):
    exact Jaccard >= {_PF_T} pairs, but candidate generation only
    indexes each document's RAREST n - ceil(t*n) + 1 shingles under a
    global (frequency asc, shingle) order. The classic prefix lemma:
    two sets whose prefixes under a shared total order are disjoint
    cannot reach Jaccard t, so the candidate set provably contains
    every qualifying pair — while common shingles (the frequent ones
    that inflate candidate lists in a plain shingle equi-join, e.g.
    dedup_ngram_jaccard's) never become join keys. Survivors are
    re-scored with the exact sparse intersection, so the output equals
    the all-pairs oracle verbatim.

    Plan shape: one frequency agg over (doc, shingle); a per-doc
    rarity window (partitioned by doc_id — bounded rows per doc);
    the candidate equi-join carries ONLY prefix shingles; the verify
    join carries only candidate pairs. At 100 TB the frequent-shingle
    hot buckets that would dominate a naive shingle join simply don't
    exist here."""
    d = load(spark, sf_dir, "documents")
    sh = shingles_df(d.select("doc_id", "text"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("fr"))
    ranked = sh.join(freq, "shingle")
    wd = Window.partitionBy("doc_id").orderBy("fr", "shingle")
    wn = Window.partitionBy("doc_id")
    pref = (
        ranked.withColumn("rn", F.row_number().over(wd))
        .withColumn("n_sh", F.count(F.lit(1)).over(wn))
        # p = n - ceil(t*n) + 1 with t = 0.5: ceil(n/2) = (n+1) DIV 2,
        # INTEGER division — `(n+1)/2` would be double division in
        # Spark and silently shorten even-n prefixes by one element
        # (a completeness hole the oracle only catches when a
        # borderline pair exists).
        .filter(
            F.col("rn") <= F.col("n_sh") - F.expr("(n_sh + 1) DIV 2") + 1
        )
        .select("doc_id", "shingle", "n_sh")
    )
    a = pref.select(
        F.col("doc_id").alias("doc_a"), "shingle", F.col("n_sh").alias("na")
    )
    b = pref.select(
        F.col("doc_id").alias("doc_b"), "shingle", F.col("n_sh").alias("nb")
    )
    cand = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingle").alias("sha"))
    sb = sh.select(F.col("doc_id").alias("b2"), F.col("shingle").alias("shb"))
    common = (
        cand.join(sa, "doc_a")
        .join(sb, (F.col("doc_b") == F.col("b2")) & (F.col("sha") == F.col("shb")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        common.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")),
            "doc_b",
        )
        .filter(jac >= _PF_T)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@query(
    "dedup_rate_by_source",
    oracle="""
WITH marked AS (
  SELECT source, doc_id, md5(text) AS h,
         MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (doc_id <> keeper) AS BIGINT) AS n_dups,
       COUNT(*) FILTER (doc_id <> keeper) * 1.0 / COUNT(*)
         AS dup_rate
FROM marked GROUP BY source
""",
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate rate — the corpus-health metric a
    curation dashboard tracks per crawl/source: a doc counts as a dup
    iff it is not its content-hash group's keeper (min doc_id). One
    window over the hash (the dedup shuffle) + one tiny per-source
    agg."""
    d = load(spark, sf_dir, "documents")
    wk = Window.partitionBy(F.md5("text"))
    marked = d.select(
        "source",
        "doc_id",
        F.min("doc_id").over(wk).alias("keeper"),
    )
    is_dup = F.col("doc_id") != F.col("keeper")
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(is_dup, 1)).alias("n_dups"),
        (F.count(F.when(is_dup, 1)) * 1.0 / F.count(F.lit(1))).alias(
            "dup_rate"
        ),
    )


PASSAGE_WORDS = 15
_BOILERPLATE = (
    "this work is licensed under the creative commons attribution share "
    "alike international license terms apply to all copies distributed "
    "worldwide"
)


@query(
    "dedup_passage",
    oracle=f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text || ' {_BOILERPLATE}'
              ELSE text END AS t
  FROM documents
), w AS (
  SELECT doc_id, string_split(t, ' ') AS ws FROM aug
), idx AS (
  SELECT doc_id, ws,
         unnest(generate_series(1, len(ws) - {PASSAGE_WORDS - 1})) AS i
  FROM w
), pos AS (
  SELECT doc_id, array_to_string(ws[i:i+{PASSAGE_WORDS - 1}], ' ') AS g
  FROM idx
), per_g AS (
  SELECT g, COUNT(DISTINCT doc_id) AS nd FROM pos GROUP BY g
), per_doc AS (
  SELECT pos.doc_id, COUNT(*) AS n,
         SUM(CASE WHEN per_g.nd >= 2 THEN 1 ELSE 0 END) AS ndup
  FROM pos JOIN per_g USING (g) GROUP BY pos.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(per_doc.n, 0) AS BIGINT) AS n_passages,
       CAST(COALESCE(per_doc.ndup, 0) AS BIGINT) AS n_dup_passages,
       CASE WHEN COALESCE(per_doc.n, 0) > 0
            THEN CAST(per_doc.ndup AS DOUBLE) / CAST(per_doc.n AS DOUBLE)
            ELSE 0.0 END AS dup_frac
FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
""",
)
def dedup_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-passage detection — the exact-substring
    tier of training-data dedup (boilerplate headers, licenses, quoted
    chunks): every {PASSAGE_WORDS}-word sliding window is a passage;
    a position is duplicated iff its passage occurs in >= 2 DISTINCT
    documents. Output is the per-doc duplicated-passage fraction a
    cleaning pipeline thresholds on.

    The fixture corpus is random word soup (organic cross-doc
    15-grams ~ 0), so docs with doc_id % 3 == 0 are first augmented
    with a deterministic shared boilerplate sentence — same
    expression in the oracle — proving the detector actually fires.

    Scale shape: passages explode JVM-side (split + transform/slice,
    no Python), shuffle as xxhash64 FINGERPRINTS (8 bytes, not the
    ~100-byte strings — the oracle groups the raw strings; a 2^-64
    collision is the accepted trade, same as dedup_exact's md5),
    one groupBy per passage + one groupBy per doc. This is the
    MapReduce form of suffix-array ExactSubstr dedup: linear in
    corpus size, never all-pairs."""
    d = load(spark, sf_dir, "documents")
    aug = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.col("text"), F.lit(" " + _BOILERPLATE)),
    ).otherwise(F.col("text"))
    return passage_dup_stats(d.select("doc_id", aug.alias("text")))


def passage_dup_stats(
    d: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_words: int = PASSAGE_WORDS,
) -> DataFrame:
    """Cross-document repeated-passage fraction over any (id, text)
    DataFrame — the generic core of dedup_passage (see its docstring
    for semantics and the scale analysis). Returns (id, n_passages,
    n_dup_passages, dup_frac)."""
    d = d.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    words = F.split(F.col("text"), " ")
    npos = F.size(words) - (n_words - 1)
    grams = F.when(
        npos > 0,
        F.transform(
            F.sequence(F.lit(0), npos - 1),
            lambda i: F.xxhash64(
                F.array_join(F.slice(words, i + 1, n_words), " ")
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    pos = d.select("doc_id", F.explode(grams).alias("h"))
    per_g = pos.groupBy("h").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    per_doc = (
        pos.join(per_g, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("ndup"),
        )
    )
    return d.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_passages"),
        F.coalesce(F.col("ndup"), F.lit(0))
        .cast("bigint")
        .alias("n_dup_passages"),
        F.when(
            F.coalesce(F.col("n"), F.lit(0)) > 0,
            F.col("ndup").cast("double") / F.col("n").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )

@query("dedup_minhash_eval")  # rows-only: hash family is engine-specific
def dedup_minhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-quality report for the MinHash-LSH banding scheme —
    the measurement every dedup pipeline owes its operators before
    trusting a hash family at 100 TB. Ground truth is the COMPLETE
    exact-Jaccard pair set >= threshold from the sparse shingle
    inverted-index join (complete because any pair with j > 0 shares
    a shingle); candidates are the raw band-bucket pairs BEFORE
    verification. Reports, per the banding theory curve
    P(candidate) = 1 - (1 - j^r)^b: truth/candidate counts, true
    positives, misses, recall against truth, and the share of
    candidates that verify (the wasted-verification cost). Exact
    integer counts; ratios are exact-int quotients. One row out."""
    thresh = 0.35
    d = load(spark, sf_dir, "documents")
    sh = shingles_df(d).cache()
    cand = lsh_candidate_pairs(minhash_signatures(sh))

    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    truth = (
        sa.join(sb, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .join(
            sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "sz_a"}),
            "doc_a",
        )
        .join(
            sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "sz_b"}),
            "doc_b",
        )
        .filter(
            F.col("n_common")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
            >= thresh
        )
        .select("doc_a", "doc_b")
    )
    joined = truth.withColumn("is_truth", F.lit(1)).join(
        cand.withColumn("is_cand", F.lit(1)), ["doc_a", "doc_b"], "full_outer"
    )
    return joined.agg(
        F.lit(thresh).alias("threshold"),
        F.sum("is_truth").alias("n_truth"),
        F.sum("is_cand").alias("n_candidates"),
        F.sum(
            F.when(
                F.col("is_truth").isNotNull() & F.col("is_cand").isNotNull(),
                1,
            )
        ).alias("tp"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("is_truth").isNotNull() & F.col("is_cand").isNull(),
                    1,
                )
            ),
            F.lit(0),
        ).alias("misses"),
        (
            F.sum(
                F.when(
                    F.col("is_truth").isNotNull()
                    & F.col("is_cand").isNotNull(),
                    1,
                )
            ).cast("double")
            / F.sum("is_truth")
        ).alias("recall"),
        (
            F.sum(
                F.when(
                    F.col("is_truth").isNotNull()
                    & F.col("is_cand").isNotNull(),
                    1,
                )
            ).cast("double")
            / F.sum("is_cand")
        ).alias("verify_yield"),
    )

def _cascade_certified_oracle() -> str:
    """Full-cascade oracle: the three tier pair sets replayed in one
    SQL statement — exact-text star edges, the certified-minhash
    chain (_minhash_certified_oracle, reused minus its final SELECT),
    and the simhash banded chain (_simhash_oracle_sig_sql, CTE names
    prefixed to avoid collisions) — then the marginal-catch counts."""
    import re

    mh_body = _minhash_certified_oracle()
    mh_ctes, mh_final = mh_body.split("\nSELECT c.doc_a", 1)
    mh_ctes = mh_ctes.strip()
    assert mh_ctes.startswith("WITH ")
    mh_ctes = mh_ctes[len("WITH ") :]
    mh_final = ("SELECT c.doc_a" + mh_final).strip()

    sh_ctes = _simhash_oracle_sig_sql().strip()
    assert sh_ctes.startswith("WITH ")
    sh_ctes = sh_ctes[len("WITH ") :]
    for name in ("words", "accs", "sigs"):
        sh_ctes = re.sub(rf"\b{name}\b", f"sh2_{name}", sh_ctes)
    # the minhash chain also ends without a trailing comma; stitch
    return f"""
WITH {mh_ctes},
t2 AS (SELECT doc_a AS a, doc_b AS b FROM ({mh_final})),
{sh_ctes},
chunks AS (
  SELECT doc_id, simhash, i AS chunk, (simhash >> (16 * i)) & 65535 AS val
  FROM sh2_sigs CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i)
),
t3 AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM chunks a
  JOIN chunks b ON a.chunk = b.chunk AND a.val = b.val
              AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 12
),
t1 AS (
  SELECT ids[1] AS a, unnest(ids[2:]) AS b
  FROM (SELECT list_sort(list(doc_id)) AS ids
        FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1)
),
t12 AS (SELECT a, b FROM t1 UNION SELECT a, b FROM t2)
SELECT '1_exact' AS tier,
       CAST((SELECT COUNT(*) FROM t1) AS BIGINT) AS n_pairs,
       CAST((SELECT COUNT(*) FROM t1) AS BIGINT) AS n_new_pairs
UNION ALL
SELECT '2_minhash_jaccard',
       CAST((SELECT COUNT(*) FROM t2) AS BIGINT),
       CAST((SELECT COUNT(*) FROM t2
             WHERE NOT EXISTS (SELECT 1 FROM t1
                               WHERE t1.a = t2.a AND t1.b = t2.b))
            AS BIGINT)
UNION ALL
SELECT '3_simhash',
       CAST((SELECT COUNT(*) FROM t3) AS BIGINT),
       CAST((SELECT COUNT(*) FROM t3
             WHERE NOT EXISTS (SELECT 1 FROM t12
                               WHERE t12.a = t3.a AND t12.b = t3.b))
            AS BIGINT)
"""


@query("dedup_cascade_report", oracle=_cascade_certified_oracle())
def dedup_cascade_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiered-dedup marginal-catch report — the planning table for a
    production cascade (cheap exact pass first, then fuzzy tiers):
    tier 1 = exact text hash, tier 2 = certified MinHash-LSH
    (md5 hash family, Jaccard >= 0.2), tier 3 = SimHash hamming
    <= 12. For each tier: total pairs it finds and NEW pairs no
    earlier (cheaper) tier caught — the marginal value that
    justifies the tier's cost at 100 TB. Tiers reuse the registered
    operators' own pair generators, so the report measures exactly
    what the engine ships. Hash-checked since round 5 (was
    rows-only): the fuzzy tiers now point at the PORTABLE md5-family
    generators (dedup_minhash_certified, dedup_simhash) whose chains
    the oracle replays end to end, instead of the xxhash64 family
    whose pair sets no independent engine can reproduce."""
    d = load(spark, sf_dir, "documents")
    # cache the three pair tables: each is consumed by TWO actions
    # (its total count and a left-anti count against later tiers) —
    # uncached, the full certified-minhash and simhash pipelines
    # re-executed once per action (guide §5: reuse > recompute for
    # expensive lineage; the pair tables are tiny)
    exact = (
        _exact_dup_edges(d)
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .cache()
    )
    mh = (
        QUERIES["dedup_minhash_certified"](spark, sf_dir)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .cache()
    )
    sh = (
        QUERIES["dedup_simhash"](spark, sf_dir)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .cache()
    )

    def tier(df: DataFrame, name: str, prev: DataFrame | None):
        total = df.count()
        new = df.join(prev, ["a", "b"], "left_anti").count() if prev is not None else total
        return (name, total, new)

    rows = [
        tier(exact, "1_exact", None),
        tier(mh, "2_minhash_jaccard", exact),
        tier(sh, "3_simhash", exact.unionByName(mh).distinct()),
    ]
    # rows are plain Python ints at this point; the report DataFrame
    # below has no lineage into the caches, so release them eagerly
    for df in (exact, mh, sh):
        df.unpersist()
    return spark.createDataFrame(
        rows, "tier string, n_pairs bigint, n_new_pairs bigint"
    )

@query(
    "er_resolve_entities",
    oracle="""
WITH names AS (
  SELECT p_name, MIN(p_partkey) AS id, COUNT(*) AS n_parts
  FROM part GROUP BY p_name
), pairs AS (
  SELECT a.id AS u, b.id AS v
  FROM names a JOIN names b
    ON a.id < b.id
   AND regexp_extract(a.p_name, '[a-z]+$')
       = regexp_extract(b.p_name, '[a-z]+$')
   AND jaro_winkler_similarity(a.p_name, b.p_name) >= 0.95
), edges AS (
  SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
), reach AS (
  WITH RECURSIVE r(node, root) AS (
    SELECT id, id FROM names
    UNION
    SELECT e.v, r.root FROM edges e JOIN r ON r.node = e.u
  )
  SELECT node, MIN(root) AS entity_id FROM r GROUP BY node
)
SELECT n.p_name, reach.entity_id, n.n_parts,
       CAST(COUNT(*) OVER (PARTITION BY reach.entity_id) AS BIGINT)
         AS cluster_size
FROM names n JOIN reach ON reach.node = n.id
""",
)
def er_resolve_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution over part names — the full ER
    flow in one operator: (1) collapse rows to distinct name
    entities (min partkey as stable id), (2) BLOCK by the name's
    head noun so candidate pairs never leave a block, (3) score
    with the Jaro-Winkler kernel that is bit-identical to DuckDB's
    built-in (>= 0.95 keeps 'cold X'/'old X' style variants), (4)
    cluster by distributed min-label connected components, (5) emit
    each name with its resolved entity id and cluster size. The
    oracle replays scoring with DuckDB's own jaro_winkler and the
    clustering with a RECURSIVE CTE — a full-pipeline hash match,
    not just per-stage spot checks. Scale: blocking bounds the pair
    fan-out, components run on the tiny name graph, and the row
    table is touched only by the initial collapse."""
    part = load(spark, sf_dir, "part")
    # cached: names feeds both block sides, the vertex set, and the
    # final resolve join — without the cache the part groupBy re-runs
    # four times per execution
    names = part.groupBy("p_name").agg(
        F.min("p_partkey").alias("id"),
        F.count(F.lit(1)).alias("n_parts"),
    ).cache()
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("id").alias("u"),
        F.regexp_extract("p_name", "[a-z]+$", 0).alias("block"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("id").alias("v"),
        F.regexp_extract("p_name", "[a-z]+$", 0).alias("block"),
    )

    import pandas as pd

    from ..operators.scalars import _jaro_winkler

    @F.pandas_udf("double")
    def jw_udf(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series([_jaro_winkler(p, q) for p, q in zip(x, y)])

    from ..plans.distance_join import ensure_parallelism

    # the blocked pair stream is tiny in BYTES but heavy in CPU (one
    # python JW eval per pair), so AQE's size-based coalescing packs
    # it onto 1-2 cores — re-split before the UDF (the r6
    # parallelism-starvation fix; no-op on already-wide plans)
    pairs = (
        ensure_parallelism(
            a.join(b, "block").filter(F.col("u") < F.col("v"))
        )
        .filter(jw_udf("name_a", "name_b") >= 0.95)
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    comp = connected_components(
        pairs, names.select("id"), max_iter=25
    ).withColumnsRenamed({"id": "cid", "label": "entity_id"})
    resolved = names.join(comp, names.id == comp.cid)
    sizes = resolved.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return resolved.join(F.broadcast(sizes), "entity_id").select(
        "p_name", "entity_id", "n_parts", "cluster_size"
    )


def _er_blocking_oracle() -> str:
    from ..operators.scalars import _duck_soundex

    return f"""
WITH words AS MATERIALIZED (
  SELECT p_partkey, {_duck_soundex("string_split(p_name, ' ')[1]")} AS sdx
  FROM part
), truth AS (
  SELECT a.p_partkey AS pa, b.p_partkey AS pb
  FROM part a JOIN part b ON a.p_name = b.p_name AND a.p_partkey < b.p_partkey
), blocked AS (
  SELECT a.p_partkey AS pa, b.p_partkey AS pb
  FROM words a JOIN words b
    ON a.sdx = b.sdx AND a.p_partkey < b.p_partkey
), hit AS (
  SELECT COUNT(*) AS n_hit FROM truth t
  JOIN blocked bl ON bl.pa = t.pa AND bl.pb = t.pb
)
SELECT (SELECT COUNT(*) FROM truth) AS n_true_pairs,
       (SELECT COUNT(*) FROM blocked) AS n_candidate_pairs,
       (SELECT n_hit FROM hit) AS n_true_in_block,
       CAST((SELECT n_hit FROM hit) AS DOUBLE)
         / nullif((SELECT COUNT(*) FROM truth), 0) AS recall,
       CAST((SELECT n_hit FROM hit) AS DOUBLE)
         / nullif((SELECT COUNT(*) FROM blocked), 0) AS precision_proxy
"""


@query("er_blocking_eval", oracle=_er_blocking_oracle())
def er_blocking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality report for entity resolution: how well does
    the fn_phonetic soundex block (on the first name word) cover the
    TRUE duplicate pairs (identical full p_name), and how much
    candidate volume does it cost — the recall/volume trade-off every
    blocking key must justify before the expensive pairwise scorer
    runs (the dedup_minhash_eval discipline applied to ER blocking).
    Exact integer pair counts; two self-joins, both equi-joins on
    name/block keys."""
    p = load(spark, sf_dir, "part")
    words = p.select(
        "p_partkey", F.split("p_name", " ")[0].alias("w")
    ).withColumn("sdx", F.soundex("w"))
    a = p.select(F.col("p_partkey").alias("pa"), F.col("p_name").alias("na"))
    b = p.select(F.col("p_partkey").alias("pb"), F.col("p_name").alias("nb"))
    # cached: each pair table is consumed by TWO actions (its own
    # count and the hit join) — uncached, each part self-join ran
    # twice (guide §5); released as soon as the counts are local ints
    truth = a.join(b, (F.col("na") == F.col("nb")) & (F.col("pa") < F.col("pb"))).select(
        "pa", "pb"
    ).cache()
    wa = words.select(F.col("p_partkey").alias("pa"), F.col("sdx").alias("sa"))
    wb = words.select(F.col("p_partkey").alias("pb"), F.col("sdx").alias("sb"))
    blocked = wa.join(
        wb, (F.col("sa") == F.col("sb")) & (F.col("pa") < F.col("pb"))
    ).select("pa", "pb").cache()
    n_true = truth.count()
    n_cand = blocked.count()
    n_hit = truth.join(blocked, ["pa", "pb"]).count()
    truth.unpersist()
    blocked.unpersist()
    return spark.createDataFrame(
        [
            (
                n_true,
                n_cand,
                n_hit,
                (n_hit / n_true) if n_true else None,
                (n_hit / n_cand) if n_cand else None,
            )
        ],
        "n_true_pairs bigint, n_candidate_pairs bigint, n_true_in_block bigint,"
        " recall double, precision_proxy double",
    )


def _er_pair_features_oracle() -> str:
    from ..operators.scalars import _duck_soundex

    return f"""
WITH blocks AS MATERIALIZED (
  SELECT p_partkey, p_name, p_brand, p_size,
         CAST(round(p_retailprice * 100) AS BIGINT) AS pc,
         p_type,
         {_duck_soundex("string_split(p_name, ' ')[1]")} AS sdx
  FROM part
)
SELECT a.p_partkey AS pa, b.p_partkey AS pb,
       a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS lev,
       damerau_levenshtein(a.p_name, b.p_name) AS damerau,
       jaccard(a.p_name, b.p_name) AS char_jaccard,
       jaro_winkler_similarity(a.p_name, b.p_name) AS jw,
       CAST(abs(a.pc - b.pc) AS BIGINT) AS price_diff_cents,
       CAST(a.p_type = b.p_type AS BOOLEAN) AS same_type
FROM blocks a JOIN blocks b
  ON a.sdx = b.sdx AND a.p_brand = b.p_brand AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
"""


@query("er_pair_features", oracle=_er_pair_features_oracle())
def er_pair_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature generation for the pairwise ER scorer: candidate pairs
    from a composite block (first-word soundex x brand x size — the
    tighter key er_blocking_eval motivates), each scored with the
    bit-matched record-linkage family (Levenshtein, unrestricted
    Damerau-Levenshtein, char-set Jaccard, Jaro-Winkler — the
    string_scores_over kernel shared with fn_string_distance) plus
    exact-cents price distance and a type-equality flag. This is the
    table a matching model trains on. Scale shape: blocking is an
    equi-join (never all-pairs); the Python scorers run Arrow-batched
    on exactly the candidate set."""
    from ..operators.scalars import string_scores_over

    p = load(spark, sf_dir, "part")
    blocks = p.select(
        "p_partkey",
        "p_name",
        "p_brand",
        "p_size",
        F.expr("CAST(ROUND(p_retailprice * 100) AS BIGINT)").alias("pc"),
        "p_type",
        F.soundex(F.split("p_name", " ")[0]).alias("sdx"),
    )
    a = blocks.select(
        F.col("p_partkey").alias("pa"),
        F.col("p_name").alias("name_a"),
        F.col("sdx").alias("sdx_a"),
        F.col("p_brand").alias("brand_a"),
        F.col("p_size").alias("size_a"),
        F.col("pc").alias("pc_a"),
        F.col("p_type").alias("type_a"),
    )
    b = blocks.select(
        F.col("p_partkey").alias("pb"),
        F.col("p_name").alias("name_b"),
        F.col("sdx").alias("sdx_b"),
        F.col("p_brand").alias("brand_b"),
        F.col("p_size").alias("size_b"),
        F.col("pc").alias("pc_b"),
        F.col("p_type").alias("type_b"),
    )
    pairs = a.join(
        b,
        (F.col("sdx_a") == F.col("sdx_b"))
        & (F.col("brand_a") == F.col("brand_b"))
        & (F.col("size_a") == F.col("size_b"))
        & (F.col("pa") < F.col("pb")),
    )
    scored = string_scores_over(pairs, "name_a", "name_b")
    return scored.select(
        "pa",
        "pb",
        "name_a",
        "name_b",
        "lev",
        "damerau",
        "char_jaccard",
        "jw",
        F.abs(F.col("pc_a") - F.col("pc_b")).cast("bigint").alias(
            "price_diff_cents"
        ),
        (F.col("type_a") == F.col("type_b")).alias("same_type"),
    )


@query(
    "dedup_exact_normalized",
    oracle="""
WITH norm AS (
  SELECT doc_id, text,
         trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
           ' +', ' ', 'g')) AS ntext
  FROM documents
)
SELECT md5(ntext) AS norm_hash,
       COUNT(*) AS n_copies,
       COUNT(DISTINCT md5(text)) AS n_raw_variants,
       MIN(doc_id) AS keeper_doc
FROM norm GROUP BY md5(ntext)
""",
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware exact dedup (the C4 recipe): lowercase,
    strip non-alphanumerics to spaces, collapse runs, trim — THEN
    hash. Catches the near-identical copies raw dedup_exact misses
    (case/punct/whitespace variants); n_raw_variants > 1 marks groups
    where normalization did extra work. The character class and the
    collapse regex behave identically under Java regex and RE2 (no
    engine-specific classes used). Same scale shape as dedup_exact:
    digests shuffle, never text."""
    d = load(spark, sf_dir, "documents")
    norm = d.select(
        "doc_id",
        "text",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
                " +",
                " ",
            )
        ).alias("ntext"),
    )
    return norm.groupBy(F.md5("ntext").alias("norm_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.countDistinct(F.md5("text")).alias("n_raw_variants"),
        F.min("doc_id").alias("keeper_doc"),
    )


@query(
    "dedup_cluster_sizes",
    oracle="""
WITH g AS (
  SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS size
  FROM documents GROUP BY md5(text)
)
SELECT size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(size * COUNT(*) AS BIGINT) AS n_docs,
       CAST((size - 1) * COUNT(*) AS BIGINT) AS n_removable
FROM g GROUP BY size
""",
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram — the telemetry a curation
    run reads BEFORE deduplicating: how many exact-duplicate
    clusters exist at each multiplicity, how many documents they
    hold, and how many rows deduplication would remove
    (size-1 per cluster). Two integer aggregations, the second over
    the already-tiny (hash, size) table; digests shuffle, text never
    does (the dedup_exact discipline). The n_removable column
    summed over rows = corpus shrink from exact dedup — pinned
    against dedup_exact in tests."""
    d = load(spark, sf_dir, "documents")
    g = d.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("size")
    )
    return g.groupBy("size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.col("size") * F.count(F.lit(1))).cast("bigint").alias("n_docs"),
        ((F.col("size") - 1) * F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_removable"),
    )


_FS_M = (0.9, 0.8, 0.7)  # P(agree | match) for size, type, price
_FS_U = (0.1, 0.2, 0.3)  # P(agree | non-match)


def _fs_weight(pattern: int) -> float:
    """Fellegi-Sunter log-likelihood-ratio weight of an agreement
    pattern (bit 2 = size, bit 1 = type, bit 0 = price), computed in
    PYTHON so both engines receive the identical double literal —
    the agg_sprt_sequential constant-embedding discipline (no ln()
    parity risk at query time)."""
    import math

    w = 0.0
    for i, (m, u) in enumerate(zip(_FS_M, _FS_U)):
        agree = (pattern >> (2 - i)) & 1
        w += math.log(m / u) if agree else math.log((1 - m) / (1 - u))
    return w


def _fs_weight_case(col: str) -> str:
    arms = " ".join(
        f"WHEN {p} THEN CAST({_fs_weight(p)!r} AS DOUBLE)"
        for p in range(8)
    )
    return f"CASE {col} {arms} END"


def _er_fs_oracle() -> str:
    from ..operators.scalars import _duck_soundex

    sdx = _duck_soundex("string_split(p_name, ' ')[1]")
    return f"""
WITH blocks AS MATERIALIZED (
  SELECT p_partkey, p_size, p_type,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS pc,
         p_brand,
         {sdx} AS sdx
  FROM part
), pairs AS (
  SELECT (CASE WHEN a.p_size = b.p_size THEN 4 ELSE 0 END
          + CASE WHEN a.p_type = b.p_type THEN 2 ELSE 0 END
          + CASE WHEN abs(a.pc - b.pc) <= 100 THEN 1 ELSE 0 END)
           AS pattern
  FROM blocks a JOIN blocks b
    ON a.sdx = b.sdx AND a.p_brand = b.p_brand
   AND a.p_partkey < b.p_partkey
)
SELECT pattern,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       {_fs_weight_case('pattern')} AS fs_weight,
       {_fs_weight_case('pattern')} > 0 AS match_leaning
FROM pairs GROUP BY pattern
"""


@query("er_fs_weights", oracle=_er_fs_oracle())
def er_fs_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter agreement-pattern table for the record-linkage
    decision model: block part pairs on (first-word soundex, brand)
    — the er_pair_features candidate generator — classify each pair
    into one of 2^3 agreement patterns over (size, type, price
    within $1), and attach the log-likelihood-ratio weight
    sum_i ln(m_i/u_i) or ln((1-m_i)/(1-u_i)). The m/u probabilities
    are declared constants, so every pattern weight is computed ONCE
    in Python and embedded as an identical double literal in both
    engines (the SPRT discipline — ln() never runs at query time).
    Pattern counts are one integer aggregate over the blocked
    equi-join; the output is <= 8 rows, the exact table a reviewer
    tunes thresholds on. Upper/lower FS thresholds then partition
    patterns into link / possible / non-link — match_leaning marks
    the positive-weight side."""
    p = load(spark, sf_dir, "part")
    blocks = p.select(
        "p_partkey",
        "p_size",
        "p_type",
        F.expr("CAST(ROUND(p_retailprice * 100) AS BIGINT)").alias("pc"),
        "p_brand",
        F.soundex(F.split("p_name", " ")[0]).alias("sdx"),
    )
    a = blocks.select(
        F.col("p_partkey").alias("ka"),
        F.col("p_size").alias("sz_a"),
        F.col("p_type").alias("ty_a"),
        F.col("pc").alias("pc_a"),
        F.col("p_brand").alias("br"),
        F.col("sdx"),
    )
    b = blocks.select(
        F.col("p_partkey").alias("kb"),
        F.col("p_size").alias("sz_b"),
        F.col("p_type").alias("ty_b"),
        F.col("pc").alias("pc_b"),
        F.col("p_brand").alias("br"),
        F.col("sdx"),
    )
    pairs = a.join(b, ["sdx", "br"]).filter(F.col("ka") < F.col("kb"))
    pattern = (
        F.when(F.col("sz_a") == F.col("sz_b"), 4).otherwise(0)
        + F.when(F.col("ty_a") == F.col("ty_b"), 2).otherwise(0)
        + F.when(
            F.abs(F.col("pc_a") - F.col("pc_b")) <= 100, 1
        ).otherwise(0)
    )
    counted = (
        pairs.select(pattern.alias("pattern"))
        .groupBy("pattern")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
    wc = _fs_weight_case("pattern")
    return counted.select(
        "pattern",
        "n_pairs",
        F.expr(wc).alias("fs_weight"),
        F.expr(f"{wc} > 0").alias("match_leaning"),
    )


@query(
    "dedup_threshold_sweep",
    oracle=f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, greatest(len(ws) - {SHINGLE - 1}, 0)),
             i -> array_to_string(ws[i:i+{SHINGLE - 1}], ' '))) AS shingle
    FROM words)
  WHERE length(shingle) > 0
), sizes AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT doc_a, doc_b, n_common,
         sa.n_sh + sb.n_sh - n_common AS n_union
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
), grid AS (
  SELECT unnest(generate_series(2, 9)) AS t10
)
SELECT t10,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT doc_a) + COUNT(DISTINCT doc_b)
            - COUNT(DISTINCT CASE WHEN doc_a = doc_b THEN doc_a END)
            AS BIGINT) AS n_endpoint_slots,
       CAST(COUNT(DISTINCT doc_b) AS BIGINT) AS n_removable_greedy
FROM grid JOIN pairs ON 10 * n_common >= t10 * n_union
GROUP BY t10
""",
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate threshold tuning table: ONE exact n-gram
    Jaccard pair computation (the dedup_ngram_jaccard inverted-index
    self-join), then pair/doc/removal counts at every Jaccard
    threshold 0.2..0.9 — the sweep a curation run reads to pick its
    cut before committing to a full dedup pass. Thresholding is the
    EXACT integer comparison 10*n_common >= t10*n_union (never a
    float >=, so no boundary pair can flip between engines);
    n_removable_greedy counts the keep-smallest-id loser side.
    Scale: the pair table is computed once and the 8-threshold grid
    replays it with a non-equi broadcast of 8 rows — candidate
    generation stays the sparse shared-shingle join, never
    all-pairs."""
    d = load(spark, sf_dir, "documents")
    sh = shingles_df(d).cache()
    sizes = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sh")
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")
    )
    pairs = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            (F.col("na") + F.col("nb") - F.col("n_common")).alias(
                "n_union"
            ),
        )
    )
    grid = spark.range(2, 10).select(F.col("id").alias("t10"))
    joined = pairs.join(
        F.broadcast(grid),
        10 * F.col("n_common") >= F.col("t10") * F.col("n_union"),
    )
    return joined.groupBy("t10").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        (
            F.countDistinct("doc_a")
            + F.countDistinct("doc_b")
            - F.countDistinct(
                F.when(F.col("doc_a") == F.col("doc_b"), F.col("doc_a"))
            )
        ).cast("bigint").alias("n_endpoint_slots"),
        F.countDistinct("doc_b").cast("bigint").alias(
            "n_removable_greedy"
        ),
    )
