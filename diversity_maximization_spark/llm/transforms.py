"""Training-data transform operators (SURVEY.md §2.2-L extensions):
PII redaction, document chunking, repetition-based quality.

All three are NARROW maps (per-row / per-doc work, no shuffle) — the
ideal 100 TB shape: they pipeline inside the scan stage and scale
linearly with executors. Oracles run the identical expression in
DuckDB (regex class chosen to behave the same under Java regex and
RE2; slicing/series bounds verified to agree element-for-element).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load

# No backrefs / lookaround: identical semantics in Java regex (Spark)
# and RE2 (DuckDB).
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}"


@query(
    "text_pii_redact",
    oracle=f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || doc_id ||
         '@example.com or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         AS t
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS clean_text,
       CAST(length(t) - length(regexp_replace(t, '{_EMAIL_RE}', '', 'g')) > 0
            AS BOOLEAN) AS had_email
FROM aug
""",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails / phone numbers from document text — the standard
    pre-training scrub pass. The fixture corpus has no organic PII, so
    each doc is first augmented with a DETERMINISTIC synthetic email +
    phone derived from doc_id (same expression in the oracle), proving
    the redaction actually fires on every row. Narrow map, no
    shuffle; regexes are Java/RE2-compatible by construction."""
    d = load(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return d.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("clean_text"),
        (
            F.length(aug) - F.length(F.regexp_replace(aug, _EMAIL_RE, "")) > 0
        ).alias("had_email"),
    )


CHUNK_SIZE = 50
CHUNK_STRIDE = 40


@query(
    "doc_chunk",
    oracle=f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), chunks AS (
  SELECT doc_id, ws,
         unnest(generate_series(1, greatest(len(ws), 1),
                                {CHUNK_STRIDE})) AS i
  FROM words
)
SELECT doc_id,
       CAST((i - 1) / {CHUNK_STRIDE} AS INTEGER) AS chunk_id,
       array_to_string(ws[i:i+{CHUNK_SIZE - 1}], ' ') AS chunk,
       CAST(len(ws[i:i+{CHUNK_SIZE - 1}]) AS INTEGER) AS n_tokens
FROM chunks
""",
)
def doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping 50-token windows with
    stride 40 — the sharding step that turns raw docs into training
    sequences. One narrow 1->N explode per doc (fan-out without
    shuffle); chunk boundaries are pure arithmetic so the DuckDB
    oracle reproduces them exactly (Spark slice(start, len) == DuckDB
    list_slice(start, start+len-1), both 1-based inclusive)."""
    d = load(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(ws), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    return (
        d.select("doc_id", ws.alias("ws"), F.explode(starts).alias("start"))
        .select(
            "doc_id",
            ((F.col("start") - 1) / CHUNK_STRIDE).cast("int").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("ws"), F.col("start"), F.lit(CHUNK_SIZE)), " "
            ).alias("chunk"),
            F.size(F.slice(F.col("ws"), F.col("start"), F.lit(CHUNK_SIZE))).alias(
                "n_tokens"
            ),
        )
    )


@query(
    "quality_repetition",
    oracle="""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), tri AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
                i -> array_to_string(ws[i:i+2], ' '))) AS tg
  FROM words
), per AS (
  SELECT doc_id, tg, COUNT(*) AS c FROM tri GROUP BY doc_id, tg
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_trigrams,
       MAX(c) * 1.0 / SUM(c) AS rep_ratio,
       MAX(c) * 1.0 / SUM(c) > 0.2 AS is_repetitive
FROM per
GROUP BY doc_id
""",
)
def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signal (Gopher-style): fraction of a
    doc's word trigrams taken by its single most frequent trigram.
    Computed entirely INSIDE one Arrow batch pass (mapInPandas): the
    per-doc trigram histogram never leaves the task, so there is no
    explode blow-up and no shuffle — at 100 TB this is a pure map over
    the corpus. Docs with fewer than 3 words emit nothing (no
    trigrams), matching the oracle's empty generate_series."""

    def gen(batches):
        for pdf in batches:
            out_id, out_n, out_r = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                ws = text.split(" ")
                n = len(ws) - 2
                if n <= 0:
                    continue
                counts: dict[str, int] = {}
                for i in range(n):
                    tg = " ".join(ws[i : i + 3])
                    counts[tg] = counts.get(tg, 0) + 1
                out_id.append(doc_id)
                out_n.append(n)
                out_r.append(max(counts.values()) / n)
            yield pd.DataFrame(
                {"doc_id": out_id, "n_trigrams": out_n, "ratio": out_r}
            )

    d = load(spark, sf_dir, "documents")
    raw = d.select("doc_id", "text").mapInPandas(
        gen, "doc_id bigint, n_trigrams bigint, ratio double"
    )
    return raw.select(
        "doc_id",
        "n_trigrams",
        F.col("ratio").alias("rep_ratio"),
        (F.col("ratio") > 0.2).alias("is_repetitive"),
    )


MIN_TOKENS = 20
MAX_REP = 0.2
_BUCKET = "((doc_id % 2147483648) * 2654435761 % 4294967296) % 100"


@query(
    "pipeline_pretrain_corpus",
    oracle=f"""
WITH dedup AS (
  SELECT MIN(doc_id) AS doc_id, text
  FROM documents GROUP BY text
), words AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM dedup
), tri AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
                i -> array_to_string(ws[i:i+2], ' '))) AS tg
  FROM words
), rep AS (
  SELECT doc_id, MAX(c) * 1.0 / SUM(c) AS ratio FROM (
    SELECT doc_id, tg, COUNT(*) AS c FROM tri GROUP BY doc_id, tg
  ) GROUP BY doc_id
), kept AS (
  -- chunking operates on the REDACTED text (redaction precedes
  -- chunking in the pipeline), so re-split after the scrub
  SELECT w.doc_id,
         string_split(regexp_replace(w.text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      ' ') AS ws
  FROM words w JOIN rep r ON w.doc_id = r.doc_id
  WHERE len(w.ws) >= {MIN_TOKENS} AND r.ratio <= {MAX_REP}
), chunks AS (
  SELECT doc_id, ws,
         unnest(generate_series(1, greatest(len(ws), 1),
                                {CHUNK_STRIDE})) AS i
  FROM kept
)
SELECT doc_id,
       CAST((i - 1) / {CHUNK_STRIDE} AS INTEGER) AS chunk_id,
       array_to_string(ws[i:i+{CHUNK_SIZE - 1}], ' ') AS chunk,
       CASE WHEN {_BUCKET} < 80 THEN 'train'
            WHEN {_BUCKET} < 90 THEN 'val'
            ELSE 'test' END AS split
FROM chunks
""",
)
def pipeline_pretrain_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-corpus pipeline — the operators of §2.2-L
    composed the way a real pre-training data job chains them:

      exact dedup (keep min doc_id per text)
      -> quality gate (>= 20 tokens, top-trigram share <= 0.2)
      -> PII scrub (email redaction)
      -> overlapping 50/40 token chunking
      -> deterministic 80/10/10 train/val/test split by doc hash

    Every stage is the same logic as its standalone key, and the whole
    chain stays one shuffle deep (the dedup groupBy); quality scoring
    is the Arrow-batched per-doc histogram, everything else is narrow.
    The oracle is the identical five-stage CTE chain in DuckDB, so the
    full composition — not just each piece — is hash-verified."""
    d = load(spark, sf_dir, "documents")
    dedup = d.groupBy("text").agg(F.min("doc_id").alias("doc_id"))

    def rep_gen(batches):
        for pdf in batches:
            out_id, out_r = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                ws = text.split(" ")
                n = len(ws) - 2
                if n <= 0:
                    continue
                counts: dict[str, int] = {}
                for i in range(n):
                    tg = " ".join(ws[i : i + 3])
                    counts[tg] = counts.get(tg, 0) + 1
                out_id.append(doc_id)
                out_r.append(max(counts.values()) / n)
            yield pd.DataFrame({"doc_id": out_id, "ratio": out_r})

    rep = dedup.select("doc_id", "text").mapInPandas(
        rep_gen, "doc_id bigint, ratio double"
    )
    ws = F.split("text", " ")
    kept = (
        dedup.join(rep, "doc_id")
        .filter((F.size(ws) >= MIN_TOKENS) & (F.col("ratio") <= MAX_REP))
        .select(
            "doc_id",
            F.regexp_replace("text", _EMAIL_RE, "<EMAIL>").alias("text"),
        )
    )
    ws2 = F.split("text", " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(ws2), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    bucket = F.expr(_BUCKET)
    return (
        kept.select(
            "doc_id", ws2.alias("ws"), F.explode(starts).alias("start")
        )
        .select(
            "doc_id",
            ((F.col("start") - 1) / CHUNK_STRIDE).cast("int").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("ws"), F.col("start"), F.lit(CHUNK_SIZE)), " "
            ).alias("chunk"),
            F.when(bucket < 80, "train")
            .when(bucket < 90, "val")
            .otherwise("test")
            .alias("split"),
        )
    )


@query(
    "quality_gopher_rules",
    oracle="""
WITH t AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         len(text) AS nc,
         len(list_distinct(string_split(text, ' '))) AS n_types
  FROM documents
), h AS (
  SELECT doc_id, MAX(c) AS top_c FROM (
    SELECT doc_id, w, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY doc_id, w
  ) GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       (nc - (n_words - 1)) * 1.0 / n_words AS mean_word_len,
       n_types * 1.0 / n_words AS ttr,
       top_c * 1.0 / n_words AS top_share,
       (n_words BETWEEN 10 AND 1000)
         AND ((nc - (n_words - 1)) * 1.0 / n_words BETWEEN 2 AND 12)
         AND (n_types * 1.0 / n_words >= 0.3)
         AND (top_c * 1.0 / n_words <= 0.2) AS pass
FROM t JOIN h ON t.doc_id = h.doc_id
""",
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style multi-rule quality filter over the fixture corpus
    — see ``gopher_signals`` for the plan."""
    return gopher_signals(load(spark, sf_dir, "documents"))


def gopher_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style multi-rule quality filter: word-count bounds, mean
    word length band, type-token ratio floor, and top-word share cap,
    with the per-rule signals AND the conjunction reported per doc.

    All four signals come out of ONE Arrow batch pass (mapInPandas):
    the per-doc word histogram (for top-word share) never leaves the
    task — same no-explode/no-shuffle shape as quality_repetition, a
    pure map over the corpus at 100 TB. Rule booleans and the
    reported ratios are both the UNROUNDED exact-integer quotients
    (identical operand order in both engines — bit-exact, and
    immune to the round() half-tie divergence found at sf0.1 in
    embed_centroids_report)."""

    def gen(batches):
        for pdf in batches:
            out = {"doc_id": [], "n_words": [], "nc": [], "n_types": [], "top_c": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                ws = text.split(" ")
                counts: dict[str, int] = {}
                for w in ws:
                    counts[w] = counts.get(w, 0) + 1
                out["doc_id"].append(doc_id)
                out["n_words"].append(len(ws))
                out["nc"].append(len(text))
                out["n_types"].append(len(counts))
                out["top_c"].append(max(counts.values()) if counts else 0)
            yield pd.DataFrame(out)

    raw = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).mapInPandas(
        gen, "doc_id bigint, n_words bigint, nc bigint, n_types bigint, top_c bigint"
    )
    nw = F.col("n_words")
    mean_wl = (F.col("nc") - (nw - 1)) * 1.0 / nw
    ttr = F.col("n_types") * 1.0 / nw
    top_share = F.col("top_c") * 1.0 / nw
    return raw.select(
        "doc_id",
        "n_words",
        mean_wl.alias("mean_word_len"),
        ttr.alias("ttr"),
        top_share.alias("top_share"),
        (
            nw.between(10, 1000)
            & mean_wl.between(2, 12)
            & (ttr >= 0.3)
            & (top_share <= 0.2)
        ).alias("pass"),
    )

@query(
    "text_readability",
    oracle="""
WITH m AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
           AS n_sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+'))
           AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
               - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)
         AS flesch_ease
FROM m
WHERE n_words > 0
""",
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — the classic readability
    quality signal for corpus curation, with the standard
    vowel-group syllable approximation (a maximal [aeiouy]+ run is
    one syllable): words, sentence terminators (clamped >= 1), and
    syllable groups all come from simple character-class regexes
    that RE2 (DuckDB) and Java regex (Spark) treat identically.
    The score is per-row IEEE arithmetic on exact integer counts —
    same expression tree both engines, left unrounded. One narrow
    projection, no shuffle: at 100 TB this is a pure map over the
    corpus scan."""
    docs = load(spark, sf_dir, "documents")
    n_words = F.size(F.expr("regexp_extract_all(text, '[A-Za-z]+', 0)"))
    n_sent = F.greatest(
        F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
    )
    n_syl = F.size(
        F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
    )
    return (
        docs.select(
            "doc_id",
            n_words.alias("n_words"),
            n_sent.alias("n_sentences"),
            n_syl.alias("n_syllables"),
        )
        .filter(F.col("n_words") > 0)
        .select(
            "doc_id",
            "n_words",
            "n_sentences",
            "n_syllables",
            (
                F.lit(206.835)
                - 1.015
                * (
                    F.col("n_words").cast("double")
                    / F.col("n_sentences")
                )
                - 84.6
                * (
                    F.col("n_syllables").cast("double")
                    / F.col("n_words")
                )
            ).alias("flesch_ease"),
        )
    )

@query(
    "text_sentence_split",
    oracle="""
WITH sents AS (
  SELECT doc_id,
         list_transform(
           regexp_extract_all(text, '[^.!?]+[.!?]*'),
           s -> trim(s)) AS ss
  FROM documents
)
, idx AS (
  SELECT doc_id, ss,
         unnest(generate_series(1, len(ss))) AS i
  FROM sents
)
SELECT doc_id,
       CAST(i AS INT) AS sent_idx,
       ss[i] AS sentence,
       CAST(len(regexp_extract_all(ss[i], '[A-Za-z]+')) AS INT)
         AS n_words
FROM idx
WHERE ss[i] <> ''
""",
)
def text_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation — the unit-of-work splitter upstream of
    chunking/embedding: terminator-delimited runs extracted with a
    lookbehind-free character-class regex (RE2 and Java regex agree),
    trimmed, empties dropped, emitted with a per-doc sentence index
    and word count. posexplode keeps the index without a window;
    pure narrow map over the corpus scan."""
    docs = load(spark, sf_dir, "documents")
    sents = docs.select(
        "doc_id",
        F.expr(
            "transform(regexp_extract_all(text, '[^.!?]+[.!?]*', 0),"
            " s -> trim(s))"
        ).alias("ss"),
    )
    return (
        sents.select(
            "doc_id", F.posexplode("ss").alias("pos", "sentence")
        )
        .filter(F.col("sentence") != "")
        .select(
            "doc_id",
            (F.col("pos") + 1).cast("int").alias("sent_idx"),
            "sentence",
            F.size(
                F.expr("regexp_extract_all(sentence, '[A-Za-z]+', 0)")
            ).alias("n_words"),
        )
    )

@query(
    "text_boilerplate_strip",
    oracle="""
WITH sent AS (
  SELECT doc_id, source,
         unnest(list_transform(
           regexp_extract_all(text, '[^.!?]+[.!?]*'),
           s -> trim(s))) AS sentence
  FROM documents
), nonempty AS (
  SELECT doc_id, source, sentence FROM sent WHERE sentence <> ''
), df AS (
  SELECT source, sentence,
         COUNT(DISTINCT doc_id) AS n_docs_with
  FROM nonempty GROUP BY source, sentence
), src_sizes AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
), flagged AS (
  SELECT d.source, d.sentence,
         CAST(d.n_docs_with AS DOUBLE) / s.n_docs >= 0.25
           AS is_boiler
  FROM df d JOIN src_sizes s USING (source)
)
SELECT n.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_sentences,
       CAST(SUM(CASE WHEN f.is_boiler THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boiler,
       CAST(SUM(CASE WHEN f.is_boiler THEN 0 ELSE len(n.sentence) END)
            AS BIGINT) AS kept_chars
FROM nonempty n
JOIN flagged f ON f.source = n.source AND f.sentence = n.sentence
GROUP BY n.doc_id
""",
)
def text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal — the web-corpus cleaning pass that strips
    repeated headers/footers: a sentence appearing in >= 25% of a
    SOURCE's documents is boilerplate for that source; per document,
    report sentence counts, flagged counts, and surviving characters.
    The document-frequency table is the inverted index the dedup
    family already relies on (explode -> distinct-doc counts ->
    broadcast-back join); per-source normalization means a template
    common on one site doesn't censor another. One explode shuffle +
    one DF agg, both bounded by sentence cardinality."""
    docs = load(spark, sf_dir, "documents")
    sent = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(regexp_extract_all(text, '[^.!?]+[.!?]*', 0),"
                " s -> trim(s))"
            )
        ).alias("sentence"),
    ).filter(F.col("sentence") != "")
    df_tab = sent.groupBy("source", "sentence").agg(
        F.countDistinct("doc_id").alias("n_docs_with")
    )
    sizes = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    flagged = df_tab.join(F.broadcast(sizes), "source").select(
        "source",
        "sentence",
        (
            F.col("n_docs_with").cast("double") / F.col("n_docs")
            >= 0.25
        ).alias("is_boiler"),
    )
    return (
        sent.join(flagged, ["source", "sentence"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sentences"),
            F.sum(F.when(F.col("is_boiler"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_boiler"),
            F.sum(
                F.when(F.col("is_boiler"), 0).otherwise(
                    F.length("sentence")
                )
            )
            .cast("bigint")
            .alias("kept_chars"),
        )
    )


@query(
    "sample_negative_pairs",
    oracle="""
WITH r AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS rk,
         COUNT(*) OVER () AS n
  FROM embeddings
), tgt AS (
  SELECT a.vec_id, k.neg_rank,
         ((a.vec_id % 2147483648) * 2654435761 + k.neg_rank * 40503)
           % 4294967296 % (a.n - 1) AS t0,
         a.rk, a.n
  FROM r a CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS neg_rank) k
)
SELECT t.vec_id, CAST(t.neg_rank AS INTEGER) AS neg_rank, b.vec_id AS neg_vec_id
FROM (SELECT vec_id, neg_rank,
             CASE WHEN t0 >= rk THEN t0 + 1 ELSE t0 END AS target
      FROM tgt) t
JOIN r b ON b.rk = t.target
""",
)
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive embedding
    training: each anchor gets 4 pseudo-random negatives drawn by a
    counter-based multiplicative hash over a dense rank ring, with
    the classic skip-self adjustment (a draw landing at or above the
    anchor's own rank shifts up by one, giving an exactly uniform
    choice among the n-1 others). No RNG state, identical arithmetic
    in both engines, and reproducible under any partitioning — the
    sample_hash_split discipline applied to PAIR generation. Scale
    shape: the rank ring is one window over ids (or a precomputed id
    table at 100 TB); negatives resolve through an equi-join on the
    rank key — never a cross join against the corpus."""
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "embeddings")
    # bounded: the rank ring is over embedding IDs only (id column,
    # no payload); at 100 TB this window is replaced by a precomputed
    # dense-id table — the ring arithmetic is unchanged
    w = Window.orderBy("vec_id")
    r = e.select(
        "vec_id",
        (F.row_number().over(w) - 1).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy(F.lit(1))).alias("n"),
    )
    k = spark.range(1, 5).select(F.col("id").cast("int").alias("neg_rank"))
    tgt = r.crossJoin(F.broadcast(k)).select(
        "vec_id",
        "neg_rank",
        F.expr(
            "CASE WHEN ((vec_id % 2147483648) * 2654435761"
            " + neg_rank * 40503) % 4294967296 % (n - 1) >= rk"
            " THEN ((vec_id % 2147483648) * 2654435761"
            " + neg_rank * 40503) % 4294967296 % (n - 1) + 1"
            " ELSE ((vec_id % 2147483648) * 2654435761"
            " + neg_rank * 40503) % 4294967296 % (n - 1) END"
        ).alias("target"),
    )
    b = r.select(F.col("rk").alias("target"), F.col("vec_id").alias("neg_vec_id"))
    return tgt.join(b, "target").select("vec_id", "neg_rank", "neg_vec_id")
