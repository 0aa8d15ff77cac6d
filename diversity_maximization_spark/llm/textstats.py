"""Text analysis operators (SURVEY.md §2.2-L): stats, TF-IDF,
language-ID, quality scoring, token counting, fingerprints.

All pure JVM built-ins (split/explode/window/agg) — the shapes that
survive 100 TB: one explode pass builds the inverted index; everything
downstream aggregates or joins on (doc, word) / (lang, word) keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources import load


def words_df(d: DataFrame) -> DataFrame:
    return d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("word")
    )


@query(
    "text_stats",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       CAST(length(text) AS INTEGER) AS n_chars,
       round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS avg_word_len,
       round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS ttr
FROM documents
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stats: tokens, chars, mean word length,
    type-token ratio."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.round(
            F.length(F.regexp_replace("text", " ", "")).cast("double")
            / F.size(toks),
            6,
        ).alias("avg_word_len"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("ttr"),
    )


@query(
    "lang_topn_words",
    oracle="""
SELECT lang, word, n, rn FROM (
  SELECT lang, word, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, word) AS rn
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY lang, word
) WHERE rn <= 5
""",
)
def lang_topn_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 words per language (explode -> count -> windowed top-k)."""
    d = load(spark, sf_dir, "documents")
    counts = words_df(d).groupBy("lang", "word").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("word"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "word", "n", "rn")
    )


@query(
    "tfidf",
    oracle="""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY doc_id, word
), df AS (
  SELECT word, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY word
), n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT tf.doc_id, tf.word,
       round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
FROM tf JOIN df ON tf.word = df.word CROSS JOIN n
WHERE tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) > 0
""",
)
def tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF over the corpus, single corpus pass: document frequency
    is derived from the cached (doc_id, word) term-frequency table
    (one row per pair, so count(*) per word == countDistinct(doc_id)
    over the raw words) instead of a second scan+explode+distinct-agg
    of the corpus. Locally the two shapes time the same (~1.5 s
    @sf0.1 — the cache write offsets the saved explode); at corpus
    scale one scan instead of two is the difference that matters, and
    tf is the post-combine table, far smaller than the exploded
    words. The per-word df table is broadcast into the final join."""
    d = load(spark, sf_dir, "documents")
    n_docs = d.count()
    tf = (
        words_df(d)
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
        .cache()
    )
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    score = F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    return (
        tf.join(F.broadcast(dfreq), "word")
        .filter(score > 0)
        .select("doc_id", "word", F.round(score, 6).alias("tfidf"))
    )


@query(
    "lang_id_ngram",
    oracle="""
WITH words AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents
), lexicon AS (
  SELECT lang, word FROM (
    SELECT lang, word,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, word) AS rn
    FROM words GROUP BY lang, word
  ) WHERE rn <= 20
), scores AS (
  SELECT w.doc_id, l.lang AS cand_lang, COUNT(*) AS hits
  FROM words w JOIN lexicon l ON w.word = l.word
  GROUP BY w.doc_id, l.lang
)
SELECT doc_id, cand_lang AS pred_lang, hits FROM (
  SELECT doc_id, cand_lang, hits,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, cand_lang) AS rn
  FROM scores
) WHERE rn = 1
""",
)
def lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID: corpus-derived top-20 lexicon per language, docs
    classified by argmax lexicon hits (the classic n-gram-profile
    heuristic; the lexicon is tiny -> broadcast join at scale).

    Single corpus pass (same shape as tfidf): both the lexicon
    derivation and the per-doc scoring re-aggregate the cached
    (doc_id, lang, word, cnt) table, so occurrence counts become
    sum(cnt) and the corpus is scanned/exploded once."""
    d = load(spark, sf_dir, "documents")
    wc = (
        words_df(d)
        .groupBy("doc_id", "lang", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .cache()
    )
    counts = wc.groupBy("lang", "word").agg(F.sum("cnt").alias("n"))
    wl = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("word"))
    lexicon = (
        counts.withColumn("rn", F.row_number().over(wl))
        .filter(F.col("rn") <= 20)
        .select(F.col("lang").alias("cand_lang"), "word")
    )
    scores = (
        wc.select("doc_id", "word", "cnt")
        .join(F.broadcast(lexicon), "word")
        .groupBy("doc_id", "cand_lang")
        .agg(F.sum("cnt").alias("hits"))
    )
    wd = Window.partitionBy("doc_id").orderBy(
        F.col("hits").desc(), F.col("cand_lang")
    )
    return (
        scores.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cand_lang").alias("pred_lang"), "hits")
    )


@query(
    "quality_score",
    oracle="""
WITH t AS (
  SELECT doc_id, n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_types,
         len(list_filter(string_split(text, ' '),
             w -> w IN ('the', 'a', 'of', 'and'))) AS n_stop
  FROM documents
)
SELECT doc_id,
       round(least(CAST(n_tokens AS DOUBLE) / 64, 1.0) * 0.4
             + (CAST(n_types AS DOUBLE) / n_tokens) * 0.4
             + least(CAST(n_stop AS DOUBLE) / n_tokens * 10, 1.0) * 0.2,
             6) AS quality
FROM t
""",
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length saturation + lexical
    diversity + stopword-rate band (the standard cheap pre-filter for
    LLM training corpora)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks).cast("double")
    n_types = F.size(F.array_distinct(toks)).cast("double")
    n_stop = F.size(
        F.filter(toks, lambda w: w.isin("the", "a", "of", "and"))
    ).cast("double")
    quality = (
        F.least(n_tokens / 64, F.lit(1.0)) * 0.4
        + (n_types / n_tokens) * 0.4
        + F.least(n_stop / n_tokens * 10, F.lit(1.0)) * 0.2
    )
    return d.select("doc_id", F.round(quality, 6).alias("quality"))


@query(
    "token_count",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INTEGER) AS re_tokens
FROM documents
""",
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace and a BPE-ish regex
    pre-tokenizer (alpha runs / digit runs)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+"), 0)).alias(
            "re_tokens"
        ),
    )


@query(
    "doc_fingerprint",
    oracle="""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
         AS fingerprint
FROM documents
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-canonical content fingerprint: md5 over the sorted
    distinct word set — invariant to word order and repetition (the
    cheap doc-level signature for cross-shard dedup)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " "))))
        ).alias("fingerprint"),
    )


@query(
    "multimodal_join",
    oracle="""
SELECT d.doc_id, d.lang, d.n_chars, e.label,
       CAST(len(e.embedding) AS INTEGER) AS dim
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
""",
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text ⋈ vector modality rows (doc_id = vec_id)."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id", "lang", "n_chars", "label", F.size("embedding").alias("dim")
    )


@query(
    "quality_bigram_logprob",
    oracle="""
WITH bg AS (
  SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(ws) - 1),
                  i -> {'w1': ws[i], 'w2': ws[i + 1]})) AS b
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))
), bgc AS (
  SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2
), pre AS (
  SELECT w1, SUM(c2) AS c1 FROM bgc GROUP BY w1
)
SELECT bg.doc_id, COUNT(*) AS n_bigrams,
       round(SUM(ln(CAST(c2 AS DOUBLE) / c1)) / COUNT(*), 6) AS avg_logprob
FROM bg JOIN bgc USING (w1, w2) JOIN pre USING (w1)
GROUP BY bg.doc_id
""",
)
def quality_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-derived bigram language-model quality score: mean
    ln P(w2|w1) over each document's bigrams, with MLE probabilities
    C(w1,w2)/C(w1·) estimated from the corpus itself (C(w1·) = bigram
    -prefix count, so both tables derive from ONE cached bigram pass).
    Low scores flag token-salad documents — the classic LM-based
    quality filter for training-data pipelines.

    Shape notes for scale: bigrams come from posexplode + lead() over
    (doc_id, pos) — split() runs once per document (a transform()
    lambda over the split array would re-evaluate split per element
    after CollapseProject inlining, the same O(words^2) trap measured
    in dedup shingling); the count tables re-aggregate the cached
    bigram table; joins are shuffled equi-joins on word keys (the
    bigram vocabulary is corpus-sized — NOT broadcastable)."""
    d = load(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w1")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        w.withColumn("w2", F.lead("w1").over(win))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", "w1", "w2")
        .cache()
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    pre = bgc.groupBy("w1").agg(F.sum("c2").alias("c1"))
    # Join the two VOCAB-sized count tables first and attach the
    # result to the instance table once: the former
    # bg⋈bgc⋈pre chain shuffled the full corpus-sized bigram
    # instance table TWICE (by (w1,w2), then again by w1). lp is
    # bigram-vocabulary-sized, so this drops one full-corpus
    # Exchange (guide §2.3/§2.4); the per-doc sum adds the identical
    # log(c2/c1) doubles as before.
    lp = bgc.join(pre, "w1")
    return (
        bg.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(F.log(F.col("c2").cast("double") / F.col("c1")))
                / F.count(F.lit(1)),
                6,
            ).alias("avg_logprob"),
        )
    )


# Portable multiplicative (Knuth) hash over doc_id: identical integer
# arithmetic in Spark and DuckDB (no engine hash functions), with the
# inner % 2^31 keeping the product inside signed-64 range. doc_id is
# reduced mod 2^31 first, so ids that collide mod 2^31 land in the
# same bucket — irrelevant for splitting, which only needs a stable
# pseudo-random bucket per id.
_HASH_BUCKET = "((doc_id % 2147483648) * 2654435761 % 4294967296) % 100"


@query(
    "sample_hash_split",
    oracle=f"""
SELECT doc_id, {_HASH_BUCKET} AS bucket,
       CASE WHEN {_HASH_BUCKET} < 80 THEN 'train'
            WHEN {_HASH_BUCKET} < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10) by a
    portable multiplicative hash of doc_id — the reproducible,
    cluster-layout-independent way to split a training corpus (a
    narrow map, no shuffle, no RNG state; the same document lands in
    the same split on any engine or partitioning)."""
    d = load(spark, sf_dir, "documents")
    bucket = F.expr(_HASH_BUCKET)
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


# Stratified variant of the hash split: per-label keep rates over the
# embeddings table (downsample the over-represented strata of a
# training corpus). Same portable multiplicative hash, on vec_id.
_VHASH = "((vec_id % 2147483648) * 2654435761 % 4294967296) % 100"


@query(
    "sample_stratified",
    oracle=f"""
SELECT vec_id, label FROM embeddings
WHERE {_VHASH} < 10 * (label + 1)
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep 10*(label+1)% of each
    label stratum by portable hash of vec_id — label 0 kept at 10%,
    label 9 at 100%. A narrow map with no shuffle and no RNG state;
    the same row survives on any engine, partitioning, or replay —
    the reproducibility property a training-data pipeline needs from
    its samplers (vs sample()/sampleBy(), whose per-partition RNG
    changes with the split layout)."""
    e = load(spark, sf_dir, "embeddings")
    return e.filter(F.expr(_VHASH) < 10 * (F.col("label") + 1)).select(
        "vec_id", "label"
    )


@query(
    "text_ngrams",
    oracle="""
WITH bg AS (
  SELECT b.w1 AS w1, b.w2 AS w2 FROM (
    SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                  i -> {'w1': ws[i], 'w2': ws[i + 1]})) AS b
    FROM (SELECT string_split(text, ' ') AS ws FROM documents))
)
SELECT w1 || ' ' || w2 AS bigram, COUNT(*) AS n
FROM bg GROUP BY w1, w2
ORDER BY n DESC, bigram
LIMIT 20
""",
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams. Same posexplode + lead() bigram
    derivation as quality_bigram_logprob (split() evaluated once per
    document — the transform()-lambda form re-splits per element
    after CollapseProject inlining); the count is one partial+final
    shuffle on the bigram key and the top-k is TakeOrdered, never a
    global sort."""
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w1")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = words.withColumn("w2", F.lead("w1").over(w)).filter(
        F.col("w2").isNotNull()
    )
    return (
        bigrams.groupBy(
            F.concat_ws(" ", "w1", "w2").alias("bigram")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


# Hash-uniform in (0,1]: (h+1)/2^32 over the 32-bit multiplicative
# hash — never 0, so ln(u) is finite; identical arithmetic both engines.
_WU01 = "((((doc_id % 2147483648) * 2654435761 % 4294967296) + 1) / 4294967296.0)"
_W_TOPN = 100


@query(
    "sample_weighted",
    oracle=f"""
SELECT doc_id, n_chars, wkey FROM (
  SELECT doc_id, n_chars,
         round(-ln({_WU01}) / n_chars, 9) AS wkey,
         ROW_NUMBER() OVER (ORDER BY round(-ln({_WU01}) / n_chars, 9), doc_id)
           AS rn
  FROM documents
) WHERE rn <= {_W_TOPN}
""",
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES): each doc draws a hash-uniform u and
    keeps key = -ln(u)/w with weight w = n_chars; the {_W_TOPN}
    smallest keys are the sample — inclusion probability rises with
    document length, and the draw is reproducible on any engine or
    partitioning (no RNG state). Keys are rounded to 9 dp BEFORE
    ranking so the ln() libm difference between engines (< 1 ulp)
    cannot flip an order; ties break by doc_id. At scale the global
    top-N is a TakeOrdered (partial per-partition top-N, no full
    sort)."""
    d = load(spark, sf_dir, "documents")
    key = F.expr(f"round(-ln({_WU01}) / n_chars, 9)")
    return (
        d.select("doc_id", "n_chars", key.alias("wkey"))
        .orderBy("wkey", "doc_id")
        .limit(_W_TOPN)
    )


@query(
    "sample_n_per_group",
    oracle=f"""
SELECT doc_id, lang, rn FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY ((doc_id % 2147483648) * 2654435761 % 4294967296), doc_id
         ) AS rn
  FROM documents
) WHERE rn <= 20
""",
)
def sample_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language cap: keep at most 20 docs per lang, chosen by
    portable hash order (a deterministic 'random' subset — the
    language-balancing cap of a multilingual corpus). One window per
    group; for a pathologically hot group the two-phase salted
    pattern of win_topk_salted applies unchanged."""
    d = load(spark, sf_dir, "documents")
    hsh = F.expr("((doc_id % 2147483648) * 2654435761 % 4294967296)")
    w = Window.partitionBy("lang").orderBy(hsh, F.col("doc_id"))
    return (
        d.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
    )


@query(
    "entropy_source",
    oracle="""
WITH cnt AS (
  SELECT source, w, COUNT(*) AS c FROM (
    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY source, w
)
SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_types,
       round(ln(CAST(SUM(c) AS DOUBLE))
             - CAST(SUM(CAST(ROUND(c * ln(c) * 1000000) AS BIGINT))
                    AS DOUBLE) / 1000000 / CAST(SUM(c) AS DOUBLE),
             6) AS entropy
FROM cnt GROUP BY source
""",
)
def entropy_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's word distribution (nats):
    H = ln(N) - (Σ c·ln c)/N over per-source word counts — the
    vocabulary-diversity signal used to spot template-generated or
    boilerplate-heavy corpus slices (low entropy = repetitive source).

    Float discipline: the Σ c·ln c accumulation is the only
    order-dependent term, so each term is fixed-pointed to integer
    micro-nats (CAST(ROUND(·*1e6) AS BIGINT)) and summed exactly —
    order-independent within each engine — then the final entropy is
    rounded to 6 dp. Residual cross-engine risk (accepted): Java
    Math.log and C libm log are each ≤1 ulp but not guaranteed
    bit-identical, so a term whose c·ln(c)·1e6 sits within ~1 ulp of
    a .5 boundary could round differently; on the fixed fixture
    vocabulary this is deterministic and verified green. One explode
    pass, two shuffled aggs on (source, word) then (source)."""
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    cnt = words.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    return (
        cnt.groupBy("source")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(
                F.expr("CAST(ROUND(c * ln(c) * 1000000) AS BIGINT)")
            ).alias("micro"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            F.round(
                F.log(F.col("n_tokens").cast("double"))
                - F.col("micro").cast("double")
                / 1000000
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("entropy"),
        )
    )


@query(
    "word_collocations",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), uni AS (
  SELECT w, COUNT(*) AS c FROM toks GROUP BY w
), bg AS (
  SELECT b.w1 AS w1, b.w2 AS w2 FROM (
    SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                  i -> {'w1': ws[i], 'w2': ws[i + 1]})) AS b
    FROM (SELECT string_split(text, ' ') AS ws FROM documents))
), bgc AS (
  SELECT w1, w2, COUNT(*) AS c_xy FROM bg GROUP BY w1, w2
), tot AS (
  SELECT (SELECT SUM(c) FROM uni) AS n_uni,
         (SELECT COUNT(*) FROM bg) AS n_bi
)
SELECT w1, w2, c_xy,
       round(ln((CAST(c_xy AS DOUBLE) * n_uni * n_uni)
                / (CAST(n_bi AS DOUBLE) * ux.c * uy.c)), 6) AS pmi
FROM bgc JOIN uni ux ON bgc.w1 = ux.w
         JOIN uni uy ON bgc.w2 = uy.w
         CROSS JOIN tot
WHERE c_xy >= 10
ORDER BY pmi DESC, w1, w2
LIMIT 100
""",
)
def word_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: top adjacent word pairs by pointwise
    mutual information, PMI = ln(P(xy) / (P(x)P(y))) with bigram and
    unigram MLE counts — the corpus-analysis tool that surfaces
    multiword expressions ("new york") vs chance co-occurrence. The
    PMI argument is an exact integer ratio evaluated in one double
    expression written identically in both engines, rounded to 6 dp,
    and the ranking orders by the ROUNDED value with (w1, w2) as the
    unique tie-break — so the top-100 cut is hash-stable. Shape: one
    explode pass, two count aggs, two equi-joins on word keys (the
    vocabulary is corpus-sized — shuffled, not broadcast), two scalar
    totals."""
    d = load(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w1")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    # NOT cached: bg is read twice (pair counts + the n_bi total), but
    # a pinned corpus-sized bigram cache outlives the query in a
    # long-lived driver session (ADVICE r02) — recomputing the narrow
    # explode+lead pass is the cheaper steady-state trade.
    bg = (
        w.withColumn("w2", F.lead("w1").over(win))
        .filter(F.col("w2").isNotNull())
        .select("w1", "w2")
    )
    uni = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bgc = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= 10)
    )
    tot = uni.agg(F.sum("c").alias("n_uni")).crossJoin(
        bg.agg(F.count(F.lit(1)).alias("n_bi"))
    )
    ux = uni.select(F.col("w").alias("w1"), F.col("c").alias("cx"))
    uy = uni.select(F.col("w").alias("w2"), F.col("c").alias("cy"))
    return (
        bgc.join(ux, "w1")
        .join(uy, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c_xy",
            F.expr(
                "round(ln((CAST(c_xy AS DOUBLE) * n_uni * n_uni)"
                " / (CAST(n_bi AS DOUBLE) * cx * cy)), 6)"
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(100)
    )


@query(
    "corpus_report",
    oracle="""
WITH t AS (
  SELECT source, lang, doc_id, string_split(text, ' ') AS ws FROM documents
), flat AS (
  SELECT source, lang, unnest(ws) AS w FROM t
), per AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(COUNT(DISTINCT w) AS BIGINT) AS n_types
  FROM flat GROUP BY source, lang
), docs AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(ws)) AS BIGINT) AS sum_words
  FROM t GROUP BY source, lang
)
SELECT d.source, d.lang, d.n_docs, d.sum_words AS n_words,
       d.sum_words * 1.0 / d.n_docs AS mean_doc_len,
       p.n_types * 1.0 / p.n_words AS corpus_ttr
FROM docs d JOIN per p ON d.source = p.source AND d.lang = p.lang
""",
)
def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, lang) corpus report card — the dataset-curation
    dashboard query: document count, token volume, mean document
    length, and corpus-level type-token ratio per slice. Two
    partial+final aggregations (doc-level and word-level) meeting in
    a broadcast-sized join on the tiny (source, lang) grid; the
    word-level distinct is the only corpus-sized shuffle and it
    carries (source, lang, word) triples, not documents."""
    d = load(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    t = d.select("source", "lang", "doc_id", ws.alias("ws"))
    docs = t.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("ws")).alias("sum_words"),
    )
    flat = t.select("source", "lang", F.explode("ws").alias("w"))
    per = flat.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.countDistinct("w").alias("n_types"),
    )
    return docs.join(per, ["source", "lang"]).select(
        "source",
        "lang",
        "n_docs",
        F.col("sum_words").alias("n_words"),
        (F.col("sum_words") * 1.0 / F.col("n_docs")).alias("mean_doc_len"),
        (F.col("n_types") * 1.0 / F.col("n_words")).alias("corpus_ttr"),
    )


_VOCAB_TOP = 100


@query(
    "vocab_coverage",
    oracle=f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), vocab AS (
  SELECT w FROM (
    SELECT w, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w) AS rn
    FROM words GROUP BY w
  ) WHERE rn <= {_VOCAB_TOP}
)
SELECT ws.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) FILTER (v.w IS NULL) AS BIGINT) AS n_oov,
       COUNT(*) FILTER (v.w IS NULL) * 1.0 / COUNT(*) AS oov_rate
FROM words ws LEFT JOIN vocab v ON ws.w = v.w
GROUP BY ws.doc_id
""",
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document OOV rate against the corpus top-{_VOCAB_TOP}
    vocabulary — the tokenizer-coverage health check run before
    committing a vocab. The vocabulary is derived with
    orderBy+limit (TakeOrdered: per-partition top-k merged on the
    driver, never a global sort), then BROADCAST into a left join
    the per-doc aggregation consumes map-side — the corpus word
    stream shuffles only for the vocabulary count agg."""
    d = load(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(_VOCAB_TOP)
        .select(F.col("w").alias("vw"))
    )
    j = words.join(
        F.broadcast(vocab), words["w"] == vocab["vw"], "left"
    )
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count(F.when(F.col("vw").isNull(), 1)).alias("n_oov"),
        (
            F.count(F.when(F.col("vw").isNull(), 1)) * 1.0 / F.count(F.lit(1))
        ).alias("oov_rate"),
    )


@query(
    "lang_id_eval",
    oracle="""
WITH words AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents
), lexicon AS (
  SELECT lang, word FROM (
    SELECT lang, word,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, word) AS rn
    FROM words GROUP BY lang, word
  ) WHERE rn <= 20
), scores AS (
  SELECT w.doc_id, l.lang AS cand_lang, COUNT(*) AS hits
  FROM words w JOIN lexicon l ON w.word = l.word
  GROUP BY w.doc_id, l.lang
), pred AS (
  SELECT doc_id, cand_lang AS pred_lang FROM (
    SELECT doc_id, cand_lang,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY hits DESC, cand_lang) AS rn
    FROM scores
  ) WHERE rn = 1
)
SELECT d.lang AS true_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (p.pred_lang = d.lang) AS BIGINT) AS n_correct,
       COUNT(*) FILTER (p.pred_lang = d.lang) * 1.0 / COUNT(*)
         AS accuracy
FROM documents d JOIN pred p ON d.doc_id = p.doc_id
GROUP BY d.lang
""",
)
def lang_id_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier EVALUATION as a first-class operator: per-language
    accuracy of the lang_id_ngram predictor against the labeled
    column — the precision/recall report every data-pipeline model
    gate runs. Reuses the registered predictor (same cached single
    corpus pass) and joins back to truth; one tiny per-language
    aggregate."""
    from ..registry import QUERIES

    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    pred = QUERIES["lang_id_ngram"](spark, sf_dir).select("doc_id", "pred_lang")
    hit = F.col("pred_lang") == F.col("lang")
    return (
        d.join(pred, "doc_id")
        .groupBy(F.col("lang").alias("true_lang"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(hit, 1)).alias("n_correct"),
            (F.count(F.when(hit, 1)) * 1.0 / F.count(F.lit(1))).alias(
                "accuracy"
            ),
        )
    )

@query(
    "sample_balanced",
    oracle="""
WITH sized AS (
  SELECT source, COUNT(*) AS n FROM documents GROUP BY source
), cap AS (
  SELECT MIN(n) AS k FROM sized
), ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn
  FROM documents
)
SELECT r.doc_id, r.source
FROM ranked r, cap
WHERE r.rn <= cap.k
""",
)
def sample_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling — every source keeps exactly
    min-class-size documents, the rebalancing step before training
    on skewed corpora. Selection is DETERMINISTIC and seed-free:
    rank within class by md5(doc_id) (a fixed pseudo-random order
    both engines share) and keep the first k. One window per class
    plus a broadcast scalar cap; at 100 TB the per-class rank is the
    only shuffle and the hash order makes the sample stable under
    any layout."""
    d = load(spark, sf_dir, "documents")
    sized = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    k = sized.agg(F.min("n").alias("k"))
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select(
        "doc_id", "source", F.row_number().over(w).alias("rn")
    )
    return (
        ranked.join(F.broadcast(k))
        .filter(F.col("rn") <= F.col("k"))
        .select("doc_id", "source")
    )

@query(
    "quality_lm_heldout",
    oracle=f"""
WITH split AS (
  SELECT doc_id, text, {_HASH_BUCKET} AS bucket FROM documents
), bg AS (
  SELECT doc_id, bucket, b.w1 AS w1, b.w2 AS w2 FROM (
    SELECT doc_id, bucket,
           unnest(list_transform(generate_series(1, len(ws) - 1),
                  i -> {{'w1': ws[i], 'w2': ws[i + 1]}})) AS b
    FROM (SELECT doc_id, bucket, string_split(text, ' ') AS ws
          FROM split))
), train_bgc AS (
  SELECT w1, w2, COUNT(*) AS c2 FROM bg WHERE bucket < 80
  GROUP BY w1, w2
), train_pre AS (
  SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM train_bgc GROUP BY w1
), vocab AS (
  SELECT COUNT(DISTINCT w2) AS v FROM train_bgc
)
SELECT t.doc_id, COUNT(*) AS n_bigrams,
       round(SUM(ln((CAST(COALESCE(c.c2, 0) AS DOUBLE) + 1)
                    / (CAST(COALESCE(p.c1, 0) AS DOUBLE) + v)))
             / COUNT(*), 6) AS avg_logprob
FROM bg t
LEFT JOIN train_bgc c ON c.w1 = t.w1 AND c.w2 = t.w2
LEFT JOIN train_pre p ON p.w1 = t.w1
JOIN vocab ON TRUE
WHERE t.bucket >= 90
GROUP BY t.doc_id
""",
)
def quality_lm_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HELD-OUT language-model evaluation — the train/test hygiene
    quality_bigram_logprob skips: bigram counts fit on the hash-split
    train docs (bucket < 80) score the untouched test docs (bucket >=
    90) with add-one smoothing over the train vocabulary, so unseen
    bigrams cost ln(1/(c1+V)) instead of crashing the join. This is
    the perplexity-proxy gate a data-mixing change must pass before
    shipping. Counts exact; the ln-sum rounds to 6 dp (the
    quality_bigram_logprob policy). Scale shape: one bigram explode,
    two train-side aggregates, broadcast vocabulary scalar, sparse
    left joins on the bigram key."""
    d = load(spark, sf_dir, "documents").withColumn(
        "bucket", F.expr(_HASH_BUCKET)
    )
    bg = (
        d.select(
            "doc_id", "bucket", F.split("text", " ").alias("ws")
        )
        .select(
            "doc_id",
            "bucket",
            F.posexplode(F.expr("slice(ws, 1, size(ws) - 1)")).alias(
                "i", "w1"
            ),
            F.col("ws"),
        )
        .select(
            "doc_id",
            "bucket",
            "w1",
            F.expr("ws[i + 1]").alias("w2"),
        )
    )
    train = bg.filter(F.col("bucket") < 80)
    bgc = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    pre = bgc.groupBy("w1").agg(F.sum("c2").cast("bigint").alias("c1"))
    vocab = bgc.agg(F.countDistinct("w2").alias("v"))
    test = bg.filter(F.col("bucket") >= 90)
    scored = (
        test.join(bgc, ["w1", "w2"], "left")
        .join(pre, "w1", "left")
        .crossJoin(F.broadcast(vocab))
    )
    lp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + 1)
        / (F.coalesce(F.col("c1"), F.lit(0)).cast("double") + F.col("v"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.sum(lp) / F.count(F.lit(1)), 6).alias("avg_logprob"),
    )

@query(
    "quality_zipf_fit",
    oracle="""
WITH wc AS (
  SELECT w AS word, COUNT(*) AS n FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
), top AS (
  SELECT word, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, word) AS rank
  FROM wc QUALIFY rank <= 100
), pts AS (
  SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y
  FROM top
)
SELECT CAST(COUNT(*) AS BIGINT) AS k,
       round((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
             / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)), 6)
         AS zipf_slope,
       round((SUM(y) - ((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
             / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))) * SUM(x))
             / COUNT(*), 6) AS intercept
FROM pts
""",
)
def quality_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit — the corpus-health fingerprint: OLS slope of
    ln(frequency) on ln(rank) over the top-100 words (natural text
    sits near -1; synthetic or template-heavy corpora flatten). The
    top-100 is a TakeOrdered with a unique tie-break, the fit is the
    closed form over six sums of 100 doubles, rounded to 6 dp per
    the ln policy. A one-row gate cheap enough to run per ingest
    batch."""
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # bounded: rank<=100 filter rewrites to TakeOrderedAndProject
    # below the window (plan-pinned in test_plans.py)
    w = Window.orderBy(F.col("n").desc(), "word")
    top = (
        wc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 100)
    )
    pts = top.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    slope = (
        F.count(F.lit(1)) * F.sum(F.col("x") * F.col("y"))
        - F.sum("x") * F.sum("y")
    ) / (
        F.count(F.lit(1)) * F.sum(F.col("x") * F.col("x"))
        - F.sum("x") * F.sum("x")
    )
    return pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(
            (F.sum("y") - slope * F.sum("x")) / F.count(F.lit(1)), 6
        ).alias("intercept"),
    )

@query(
    "sample_group_kfold",
    oracle="""
WITH folds AS (
  SELECT user_id,
         CAST(((user_id % 2147483648) * 2654435761 % 4294967296) % 5
              AS INT) AS fold
  FROM (SELECT DISTINCT user_id FROM events)
)
SELECT f.fold,
       COUNT(DISTINCT e.user_id) AS n_users,
       COUNT(*) AS n_events
FROM events e JOIN folds f USING (user_id)
GROUP BY f.fold
""",
)
def sample_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware k-fold assignment (k=5) — the cross-validation
    hygiene that prevents leakage: every row of a user lands in the
    SAME fold because the fold is a function of the group key alone
    (the portable multiplicative hash), never of the row. The report
    shows per-fold user and event counts; the map side is a narrow
    join against the tiny distinct-user fold table. Seed-free and
    layout-independent like every sampling op here."""
    ev = load(spark, sf_dir, "events")
    folds = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.expr(
                "CAST(((user_id % 2147483648) * 2654435761"
                " % 4294967296) % 5 AS INT)"
            ).alias("fold"),
        )
    )
    return (
        ev.join(F.broadcast(folds), "user_id")
        .groupBy("fold")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "quality_ngram_novelty",
    oracle=f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, greatest(len(ws) - 2, 0)),
             i -> array_to_string(ws[i:i+2], ' '))) AS shingle
    FROM words)
  WHERE length(shingle) > 0
), first_owner AS (
  SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS novelty
FROM sh s JOIN first_owner f ON f.shingle = s.shingle
GROUP BY s.doc_id
""",
)
def quality_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    3-gram shingles whose FIRST corpus occurrence (lowest doc_id —
    the ingestion-order proxy) is this document. The
    curriculum/data-freshness signal a curation pipeline uses to
    down-weight documents that only restate earlier material —
    dedup's soft sibling (a doc can evade every near-dup tier and
    still contribute nothing new). Shape: the shingle table shuffles
    once to find each shingle's first owner (a MIN agg, mergeable at
    any scale), then one equi-join back — no pairwise work at all,
    unlike the dedup tiers."""
    from .dedup import shingles_df

    d = load(spark, sf_dir, "documents")
    sh = shingles_df(d).cache()
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
            (
                F.sum(
                    F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("novelty"),
        )
    )


@query(
    "token_fertility_report",
    oracle="""
WITH per_doc AS (
  SELECT lang, source,
         CAST(length(text) AS BIGINT) AS chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
         CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT)
           AS re_toks
  FROM documents
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(chars) AS BIGINT) AS n_chars,
       CAST(SUM(words) AS BIGINT) AS n_words,
       CAST(SUM(re_toks) AS BIGINT) AS n_tokens,
       CAST(SUM(chars) AS DOUBLE) / SUM(re_toks) AS chars_per_token,
       CAST(SUM(re_toks) AS DOUBLE) / SUM(words) AS tokens_per_word
FROM per_doc GROUP BY lang, source
""",
)
def token_fertility_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by (lang, source) — the table a tokenizer
    review starts from: how many characters one token buys and how
    many tokens a whitespace word costs, per corpus slice. High
    fertility (tokens_per_word) on a language flags a tokenizer that
    will waste that language's context budget. Exact integer sums;
    the two ratios are single divisions of those sums (identical
    expression both engines). One partial-aggregated groupBy over a
    bounded (lang x source) domain — the shuffle carries six
    integers per slice, never text."""
    d = load(spark, sf_dir, "documents")
    per = d.select(
        "lang",
        "source",
        F.length("text").cast("bigint").alias("chars"),
        F.size(F.split("text", " ")).cast("bigint").alias("words"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)"))
        .cast("bigint")
        .alias("re_toks"),
    )
    return per.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("chars").cast("bigint").alias("n_chars"),
        F.sum("words").cast("bigint").alias("n_words"),
        F.sum("re_toks").cast("bigint").alias("n_tokens"),
        (F.sum("chars").cast("double") / F.sum("re_toks")).alias(
            "chars_per_token"
        ),
        (F.sum("re_toks").cast("double") / F.sum("words")).alias(
            "tokens_per_word"
        ),
    )


_BM25_TERMS = ["window", "merge", "spark"]
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_oracle() -> str:
    terms = ", ".join(f"('{t}')" for t in _BM25_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
), corpus AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS total_len
  FROM dl
), q(term) AS (VALUES {terms}),
tf AS (
  SELECT t.doc_id, q.term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks t JOIN q ON t.w = q.term
  GROUP BY t.doc_id, q.term
), df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id,
         round(
           ln((CAST(c.n_docs AS DOUBLE) - df.df + CAST(0.5 AS DOUBLE))
              / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
           * (CAST(tf.tf AS DOUBLE) * (CAST({_BM25_K1} AS DOUBLE) + 1))
           / (CAST(tf.tf AS DOUBLE)
              + CAST({_BM25_K1} AS DOUBLE)
                * (1 - CAST({_BM25_B} AS DOUBLE)
                   + CAST({_BM25_B} AS DOUBLE)
                     * CAST(dl.dl AS DOUBLE) * c.n_docs / c.total_len)),
           9) AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN corpus c
), agg AS (
  SELECT doc_id,
         round(list_sum(list(s ORDER BY s, doc_id)), 9) AS bm25
  FROM scored GROUP BY doc_id
)
SELECT doc_id, bm25 FROM agg
ORDER BY bm25 DESC, doc_id LIMIT 20
"""


@query("text_bm25_topk", oracle=_bm25_oracle())
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval (k1=1.2, b=0.75) for a fixed 3-term query over
    the whitespace-token corpus: idf = ln((N-df+0.5)/(df+0.5))
    rounded at 9 dp (the repo's ln discipline — Java vs libm ln can
    differ 1 ulp at O(1) scale; rounding kills it before ranking),
    length normalization via dl*N/total (exact integers into ONE
    float expression — avgdl never materializes as a rational), and
    the per-doc sum folds the <=3 term scores in (score, doc_id)
    order on both engines. Top-20 by (rounded score DESC, doc_id).
    Scale shape: tokens explode once, tf is a (doc, term) aggregate
    against a 3-row broadcast term list, df is term-sized, and the
    final ranking is TakeOrdered(20) — no global sort."""
    d = load(spark, sf_dir, "documents")
    return bm25_over(d, _BM25_TERMS)


def bm25_over(
    docs,
    terms,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = _BM25_K1,
    b: float = _BM25_B,
    topn: int = 20,
):
    """BM25 top-n kernel over any (id, text) frame for a term list —
    shared by text_bm25_topk and api.bm25."""
    d = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl")
    )
    corpus = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )
    q = docs.sparkSession.createDataFrame(
        [(t,) for t in terms], "term string"
    )
    tf = (
        toks.join(F.broadcast(q), toks.w == q.term)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (
                        F.col("n_docs").cast("double")
                        - F.col("df")
                        + F.lit(0.5)
                    )
                    / (F.col("df").cast("double") + F.lit(0.5))
                )
                * (F.col("tf").cast("double") * (F.lit(k1) + 1))
                / (
                    F.col("tf").cast("double")
                    + F.lit(k1)
                    * (
                        1
                        - F.lit(b)
                        + F.lit(b)
                        * F.col("dl").cast("double")
                        * F.col("n_docs")
                        / F.col("total_len")
                    )
                ),
                9,
            ).alias("s"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("s", "doc_id"))),
                F.lit(0.0),
                lambda acc, x: acc + x["s"],
            ),
            9,
        ).alias("bm25")
    )
    return agg.orderBy(F.desc("bm25"), "doc_id").limit(topn)


@query(
    "text_hapax_ratio",
    oracle="""
WITH words AS (
  SELECT source, unnest(string_split(text, ' ')) AS word
  FROM documents
), freq AS (
  SELECT source, word, COUNT(*) AS n FROM words GROUP BY source, word
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS hapax_ratio
FROM freq GROUP BY source
""",
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomena profile per source: vocabulary size, token
    count, words seen exactly once (hapax) and exactly twice (dis),
    and the hapax share of the vocabulary — the classic
    productivity/contamination signal (a template-generated source
    has an abnormally LOW hapax ratio; OCR noise an abnormally high
    one). Good-Turing smoothing starts from exactly these counts.
    Shape: explode -> two-level aggregate, all exact integers, one
    final ratio. The per-(source, word) partial aggregate combines
    map-side, so the shuffle carries distinct words, not token
    instances — same contract as tfidf's document-frequency pass."""
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    )
    freq = words.groupBy("source", "word").agg(
        F.count(F.lit(1)).alias("n")
    )
    return freq.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hapax"),
        F.sum(F.when(F.col("n") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dis"),
        (
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("hapax_ratio"),
    )


@query(
    "text_log_odds_words",
    oracle="""
WITH words AS (
  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
), bg AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS a_w FROM words GROUP BY word
), bg_tot AS (
  SELECT CAST(SUM(a_w) AS BIGINT) AS a_0 FROM bg
), en AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS y_i FROM words
  WHERE lang = 'en' GROUP BY word
), fr AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS y_j FROM words
  WHERE lang = 'fr' GROUP BY word
), n AS (
  SELECT CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_i,
         CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_j
  FROM words
), sc AS (
  SELECT bg.word,
         COALESCE(en.y_i, 0) AS y_i, COALESCE(fr.y_j, 0) AS y_j,
         bg.a_w, n.n_i, n.n_j, bg_tot.a_0
  FROM bg LEFT JOIN en ON en.word = bg.word
          LEFT JOIN fr ON fr.word = bg.word
          CROSS JOIN n CROSS JOIN bg_tot
), z AS (
  SELECT word, y_i, y_j,
         ln((CAST(y_i + a_w AS DOUBLE))
            / (n_i + a_0 - y_i - a_w))
           - ln((CAST(y_j + a_w AS DOUBLE))
                / (n_j + a_0 - y_j - a_w)) AS delta,
         1.0 / (y_i + a_w) + 1.0 / (y_j + a_w) AS var
  FROM sc WHERE y_i + y_j >= 5
)
SELECT word, y_i, y_j,
       round(delta, 6) AS log_odds,
       round(delta / sqrt(var), 6) AS z_score
FROM z WHERE abs(delta / sqrt(var)) >= 1.96
""",
)
def text_log_odds_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monroe's 'fightin' words': log-odds ratio of word usage
    between the English and French sub-corpora with an INFORMATIVE
    Dirichlet prior from the full background corpus — the
    statistically-grounded answer to 'which words distinguish these
    two slices' that raw frequency ratios (noisy on rare words) and
    PMI (biased toward hapax) both get wrong. delta = ln((y_i+a_w)/
    (n_i+a_0-y_i-a_w)) - ln(same for j); var = 1/(y_i+a_w) +
    1/(y_j+a_w); reported where the z-score clears 1.96 and the
    pair has >= 5 occurrences, so output is the interesting tail,
    not the vocabulary. All counts are exact bigints; the ln/sqrt
    readouts are per-row O(1)-magnitude floats rounded to 6 dp
    (the fn_math discipline). Shape: one explode feeding four
    word-level aggregates that all reuse the same shuffle key, then
    broadcast scalar totals."""
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    )
    bg = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("a_w")
    )
    en = (
        words.where(F.col("lang") == "en")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y_i"))
    )
    fr = (
        words.where(F.col("lang") == "fr")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y_j"))
    )
    n = words.agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("n_i"),
        F.sum(F.when(F.col("lang") == "fr", 1).otherwise(0))
        .cast("bigint")
        .alias("n_j"),
        F.count(F.lit(1)).cast("bigint").alias("a_0"),
    )
    sc = (
        bg.join(en, "word", "left")
        .join(fr, "word", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "word",
            F.coalesce("y_i", F.lit(0)).alias("y_i"),
            F.coalesce("y_j", F.lit(0)).alias("y_j"),
            "a_w",
            "n_i",
            "n_j",
            "a_0",
        )
        .where(F.col("y_i") + F.col("y_j") >= 5)
    )
    delta = F.log(
        (F.col("y_i") + F.col("a_w")).cast("double")
        / (F.col("n_i") + F.col("a_0") - F.col("y_i") - F.col("a_w"))
    ) - F.log(
        (F.col("y_j") + F.col("a_w")).cast("double")
        / (F.col("n_j") + F.col("a_0") - F.col("y_j") - F.col("a_w"))
    )
    var = F.lit(1.0) / (F.col("y_i") + F.col("a_w")) + F.lit(1.0) / (
        F.col("y_j") + F.col("a_w")
    )
    z = sc.select(
        "word",
        "y_i",
        "y_j",
        delta.alias("delta"),
        (delta / F.sqrt(var)).alias("zs"),
    )
    return z.where(F.abs(F.col("zs")) >= 1.96).select(
        "word",
        "y_i",
        "y_j",
        F.round("delta", 6).alias("log_odds"),
        F.round("zs", 6).alias("z_score"),
    )


@query(
    "text_rake_words",
    oracle="""
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), pw AS (
  SELECT doc_id, unnest(w) AS word,
         unnest(range(1, len(w) + 1)) AS pos
  FROM ws
), nonstop AS (
  SELECT doc_id, word, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
           AS island
  FROM pw WHERE word NOT IN ('the', 'a')
), ph AS (
  SELECT doc_id, island, word,
         COUNT(*) OVER (PARTITION BY doc_id, island) AS plen
  FROM nonstop
)
SELECT word,
       CAST(COUNT(*) AS BIGINT) AS freq,
       CAST(SUM(plen) AS BIGINT) AS deg,
       CAST(CAST(SUM(plen) AS BIGINT) AS DOUBLE) / COUNT(*) AS rake_score
FROM ph GROUP BY word
""",
)
def text_rake_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword scoring (Rose et al. 2010), word level: candidate
    phrases are maximal runs of non-stopword tokens (split at the
    stopwords 'the'/'a'); each word scores deg(w)/freq(w), where
    freq counts the word's occurrences inside candidate phrases and
    deg sums the lengths of the phrases it appears in — long-phrase
    membership is what lifts a word above its raw frequency, which
    is RAKE's whole idea. Phrase segmentation is the gaps-and-
    islands trick (pos minus per-doc ROW_NUMBER over non-stop
    tokens), so the plan is one explode + one per-doc window + one
    word-keyed agg — per-document parallelism end to end, no global
    window anywhere. deg and freq stay exact bigints; the ONLY float
    is the final per-word division, hash-identical across engines."""
    d = load(spark, sf_dir, "documents")
    pw = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "word"),
    ).select("doc_id", "word", (F.col("pos0") + 1).alias("pos"))
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    nonstop = (
        pw.filter(~F.col("word").isin("the", "a"))
        .withColumn("island", F.col("pos") - F.row_number().over(wdoc))
    )
    wph = Window.partitionBy("doc_id", "island")
    ph = nonstop.withColumn("plen", F.count(F.lit(1)).over(wph))
    return ph.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("deg"),
        (
            F.sum("plen").cast("bigint").cast("double")
            / F.count(F.lit(1))
        ).alias("rake_score"),
    )


@query(
    "text_good_turing",
    oracle="""
WITH wc AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS r FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ) GROUP BY word
), fof AS (
  SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM wc GROUP BY r
)
SELECT a.r,
       a.n_r,
       CAST(b.n_r AS BIGINT) AS n_r_plus_1,
       CAST((a.r + 1) * b.n_r AS DOUBLE) / a.n_r AS r_star
FROM fof a JOIN fof b ON b.r = a.r + 1
WHERE a.r <= 10
""",
)
def text_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing adjusted counts over the corpus vocabulary:
    r* = (r+1) * N_{r+1} / N_r for the low frequencies r <= 10 —
    the smoothing estimate every n-gram LM uses for its unseen-mass
    budget (r*=... at r shows how much probability the singletons
    and doubletons should surrender). The frequency-of-frequencies
    table N_r is two integer aggregations (word counts, then counts
    of counts — the second over a domain bounded by max word
    frequency); the self-join on r+1 runs on that tiny table; ONE
    float division per row. Shape at 100 TB: the only corpus-scale
    work is the word count (explode + partial/final agg); everything
    downstream is O(distinct frequencies)."""
    d = load(spark, sf_dir, "documents")
    wc = words_df(d).groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("r")
    )
    fof = wc.groupBy("r").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_r")
    )
    b = fof.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_plus_1")
    )
    return (
        fof.join(b, "r")
        .filter(F.col("r") <= 10)
        .select(
            "r",
            "n_r",
            F.col("n_r_plus_1").cast("bigint").alias("n_r_plus_1"),
            (
                ((F.col("r") + 1) * F.col("n_r_plus_1")).cast("double")
                / F.col("n_r")
            ).alias("r_star"),
        )
    )


@query(
    "agg_chao1_richness",
    oracle="""
WITH wc AS (
  SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS r FROM (
    SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
  ) GROUP BY lang, word
), per AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS s_obs,
         CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM wc GROUP BY lang
)
SELECT lang, s_obs, f1, f2,
       CAST(s_obs AS DOUBLE)
         + CAST(f1 * (f1 - 1) AS DOUBLE) / (2 * (f2 + 1))
         AS chao1
FROM per
""",
)
def agg_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 species-richness estimate of the per-language
    vocabulary — how many word types the corpus would reveal with
    infinite sampling, estimated from the singleton/doubleton
    counts via the bias-corrected form S + f1(f1-1)/(2(f2+1)) —
    integer numerator, one division, no f2=0 special case, and
    provably >= S (the uncorrected f1^2/(2 f2) form is not, which
    the property test caught on first run). The
    ecology estimator is exactly the right tool for 'how much
    vocabulary is my crawl still missing' during corpus curation —
    the same f1/f2 inputs as capture-recapture but answering
    richness, not coverage. Two integer aggs; two divisions per
    language."""
    d = load(spark, sf_dir, "documents")
    wc = words_df(d).groupBy("lang", "word").agg(
        F.count(F.lit(1)).cast("bigint").alias("r")
    )
    per = wc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("s_obs"),
        F.sum(F.when(F.col("r") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("f1"),
        F.sum(F.when(F.col("r") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("f2"),
    )
    return per.select(
        "lang",
        "s_obs",
        "f1",
        "f2",
        (
            F.col("s_obs").cast("double")
            + (F.col("f1") * (F.col("f1") - 1)).cast("double")
            / (2 * (F.col("f2") + 1))
        ).alias("chao1"),
    )


# CAST(1 AS DOUBLE), not the literal 1.0: Spark parses 1.0 as
# DECIMAL(2,1) and would run the whole fusion in decimal arithmetic
# (last-ulp mismatch vs DuckDB's double path — caught by the gate).
_RRF = (
    "CAST(1 AS DOUBLE) / (60 + r1) + CAST(1 AS DOUBLE) / (60 + r2)"
    " + CAST(1 AS DOUBLE) / (60 + r3)"
)


@query(
    "quality_rank_fusion",
    oracle=f"""
WITH sig AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS s1,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS s2,
         CAST(length(text) AS BIGINT) AS s3
  FROM documents
), ranked AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY -s1, doc_id) AS r1,
         ROW_NUMBER() OVER (ORDER BY -s2, doc_id) AS r2,
         ROW_NUMBER() OVER (ORDER BY -s3, doc_id) AS r3
  FROM sig
)
SELECT doc_id, CAST(r1 AS BIGINT) AS r1, CAST(r2 AS BIGINT) AS r2,
       CAST(r3 AS BIGINT) AS r3,
       {_RRF} AS rrf
FROM ranked
ORDER BY {_RRF} DESC, doc_id
LIMIT 50
""",
)
def quality_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of three document quality signals
    (token count, distinct-word count, character count): RRF(d) =
    sum_i 1/(60 + rank_i(d)) — the rank-combination standard when
    signals live on incomparable scales (k=60 from the original
    Cormack et al. TREC formulation). Each signal's global ranking
    runs through the plans/global_rank.py two-phase row-number
    machinery (range buckets + exact per-bucket offsets) — never a
    single-task ORDER BY window, and the negated-signal trick gives
    descending order with the ascending machinery. The three rank
    integers then combine in ONE fixed-order three-term float
    expression shared verbatim with the oracle, and the top-50 cut
    compiles to TakeOrderedAndProject. The oracle ranks with plain
    global windows (oracle-scale-only, as usual)."""
    from ..plans.global_rank import with_global_row_number

    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sig = d.select(
        "doc_id",
        (-F.size(toks)).cast("bigint").alias("n1"),
        (-F.size(F.array_distinct(toks))).cast("bigint").alias("n2"),
        (-F.length("text")).cast("bigint").alias("n3"),
    )
    ranked, _ = with_global_row_number(sig, ["n1", "doc_id"], out_col="r1")
    ranked, _ = with_global_row_number(ranked, ["n2", "doc_id"], out_col="r2")
    ranked, _ = with_global_row_number(ranked, ["n3", "doc_id"], out_col="r3")
    return (
        ranked.select(
            "doc_id",
            F.col("r1").cast("bigint").alias("r1"),
            F.col("r2").cast("bigint").alias("r2"),
            F.col("r3").cast("bigint").alias("r3"),
            F.expr(_RRF).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(50)
    )


@query(
    "text_word_burstiness",
    oracle="""
WITH dk AS (
  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS k FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents
  ) GROUP BY doc_id, word
), per AS (
  SELECT word,
         CAST(SUM(k) AS BIGINT) AS sk,
         CAST(SUM(k * k) AS BIGINT) AS skk,
         CAST(COUNT(*) AS BIGINT) AS n_docs_with
  FROM dk GROUP BY word
), g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS d FROM documents
)
SELECT word, sk AS n_occurrences, n_docs_with,
       ((CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * sk / d) / (d - 1))
         / (CAST(sk AS DOUBLE) / d) AS burstiness
FROM per, g
WHERE sk >= 50
ORDER BY ((CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * sk / d) / (d - 1))
           / (CAST(sk AS DOUBLE) / d) DESC, word
LIMIT 25
""",
)
def text_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word burstiness (Church-Gale): the variance-to-mean ratio of
    a word's per-document count, zeros included via the global doc
    count — near 1 means the word sprinkles Poisson-like
    (function words), far above 1 means it CLUMPS (topical/content
    words, boilerplate runs), the signal behind burstiness-aware IDF
    and boilerplate detection. Same exact-moment algebra as
    agg_overdispersion, per word: zero docs contribute nothing to
    sum(k)/sum(k^2), so one (doc,word) rollup + one per-word
    aggregate + a broadcast doc count computes the exact dispersion
    for every word; the min-support filter and top-25 cut compile
    to TakeOrderedAndProject, never a global sort."""
    d = load(spark, sf_dir, "documents")
    dk = words_df(d).groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    per = dk.groupBy("word").agg(
        F.sum("k").cast("bigint").alias("sk"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("skk"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs_with"),
    )
    g = d.agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    burst = (
        (
            F.col("skk").cast("double")
            - F.col("sk").cast("double") * F.col("sk") / F.col("d")
        )
        / (F.col("d") - 1)
    ) / (F.col("sk").cast("double") / F.col("d"))
    return (
        per.crossJoin(F.broadcast(g))
        .filter(F.col("sk") >= 50)
        .select(
            "word",
            F.col("sk").alias("n_occurrences"),
            "n_docs_with",
            burst.alias("burstiness"),
        )
        .orderBy(F.col("burstiness").desc(), "word")
        .limit(25)
    )


@query(
    "corpus_vocab_growth",
    oracle="""
WITH mx AS (
  SELECT CAST(MAX(doc_id) AS BIGINT) AS m FROM documents
), w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents
), grid AS (
  SELECT unnest(generate_series(1, 10)) AS decile
)
SELECT g.decile,
       ((SELECT m FROM mx) * g.decile) // 10 AS doc_id_cutoff,
       CAST(COUNT(DISTINCT CASE WHEN w.doc_id
                                     <= ((SELECT m FROM mx) * g.decile)
                                        // 10
                                THEN w.word END) AS BIGINT)
         AS vocab_size,
       CAST(SUM(CASE WHEN w.doc_id <= ((SELECT m FROM mx) * g.decile)
                                      // 10
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_tokens
FROM grid g, w
GROUP BY g.decile
""",
)
def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical vocabulary-growth (Heaps) curve: distinct word
    types and total tokens at ten corpus prefixes (docs up to each
    decile of the doc_id range) — the scaling readout that says
    whether more crawl keeps buying new vocabulary or the corpus
    has saturated (log-log slope ~ Heaps beta; the raw curve ships
    instead of a fitted exponent so no log() parity is at stake).
    ONE explode pass with ten conditional aggregates against a
    broadcast decile grid — the corpus is read once, not ten times;
    all outputs exact integers. Deterministic prefixes by doc_id,
    not sampling."""
    d = load(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").cast("bigint").alias("m"))
    w = words_df(d).select("doc_id", "word")
    grid = spark.range(1, 11).select(F.col("id").alias("decile"))
    return (
        w.crossJoin(F.broadcast(grid))
        .crossJoin(F.broadcast(mx))
        .groupBy("decile")
        .agg(
            F.max(F.expr("(m * decile) div 10")).alias("doc_id_cutoff"),
            F.countDistinct(
                F.when(
                    F.col("doc_id") <= F.expr("(m * decile) div 10"),
                    F.col("word"),
                )
            )
            .cast("bigint")
            .alias("vocab_size"),
            F.sum(
                F.when(
                    F.col("doc_id") <= F.expr("(m * decile) div 10"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_tokens"),
        )
    )


@query(
    "text_yule_k",
    oracle="""
WITH cnt AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS f FROM (
    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY source, w
)
SELECT source,
       CAST(SUM(f) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(10000 AS DOUBLE)
         * (CAST(SUM(f * f) AS BIGINT) - CAST(SUM(f) AS BIGINT))
         / (CAST(SUM(f) AS DOUBLE) * CAST(SUM(f) AS DOUBLE)) AS yule_k
FROM cnt GROUP BY source
""",
)
def text_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K per source — the classical lexical-
    repetitiveness constant (10^4 * (S2 - S1) / S1^2 over the word
    frequency spectrum; higher = more repetitive vocabulary, the
    stylometric cousin of entropy_source's template detector). S1
    and S2 are exact BIGINT sums over per-source word counts; the
    single float division has identical expression text in both
    engines — bit-exact, no rounding. One explode pass, two
    shuffled aggs."""
    d = load(spark, sf_dir, "documents")
    cnt = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    return cnt.groupBy("source").agg(
        F.sum("f").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        (
            F.lit(10000).cast("double")
            * (
                F.sum(F.col("f") * F.col("f")).cast("bigint")
                - F.sum("f").cast("bigint")
            )
            / (F.sum("f").cast("double") * F.sum("f").cast("double"))
        ).alias("yule_k"),
    )


@query(
    "text_mattr",
    oracle="""
WITH toks AS (
  SELECT doc_id, source, w, pos FROM (
    SELECT d.doc_id, d.source,
           unnest(string_split(d.text, ' ')) AS w,
           generate_subscripts(string_split(d.text, ' '), 1) - 1 AS pos
    FROM documents d)
), win AS (
  SELECT doc_id, source, pos // 50 AS w_id, w FROM toks
), full_w AS (
  SELECT doc_id, source, w_id,
         CAST(COUNT(*) AS BIGINT) AS n_tok,
         CAST(COUNT(DISTINCT w) AS BIGINT) AS n_distinct
  FROM win GROUP BY doc_id, source, w_id
  HAVING COUNT(*) = 50
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(n_distinct) AS DOUBLE) / (50 * COUNT(*)) AS mattr
FROM full_w GROUP BY source
""",
)
def text_mattr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed type-token ratio per source (MATTR family): split
    every document into consecutive complete 50-token windows,
    count distinct types per window, and report the source-level
    ratio sum(distinct) / (50 * n_windows) — the length-robust
    lexical-diversity measure (plain TTR shrinks with document
    length; fixed windows remove that bias). All counts exact
    BIGINTs aggregated per (doc, window) then per source; ONE final
    division — bit-exact, no per-window float accumulation. The
    explode carries the token position so windows are reproducible
    (posexplode == generate_subscripts - 1)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", " ")).alias("pos", "w"),
    )
    full_w = (
        toks.groupBy(
            "doc_id", "source", (F.col("pos") / 50).cast("bigint").alias("w_id")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            F.countDistinct("w").cast("bigint").alias("n_distinct"),
        )
        .filter(F.col("n_tok") == 50)
    )
    return full_w.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        (
            F.sum("n_distinct").cast("double")
            / (50 * F.count(F.lit(1)))
        ).alias("mattr"),
    )


@query(
    "corpus_bigram_entropy",
    oracle="""
WITH toks AS (
  SELECT source, doc_id, w, pos FROM (
    SELECT source, doc_id,
           unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents)
), bi AS (
  SELECT a.source, a.w AS w1, b.w AS w2
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 AND a.source = b.source
), bcnt AS (
  SELECT source, w1, w2, CAST(COUNT(*) AS BIGINT) AS c
  FROM bi GROUP BY source, w1, w2
), ucnt AS (
  SELECT source, w1, CAST(SUM(c) AS BIGINT) AS c
  FROM bcnt GROUP BY source, w1
), hb AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n2,
         CAST(SUM(CAST(ROUND(c * ln(c) * 1000000) AS BIGINT)) AS BIGINT)
           AS micro
  FROM bcnt GROUP BY source
), hu AS (
  SELECT source,
         CAST(SUM(CAST(ROUND(c * ln(c) * 1000000) AS BIGINT)) AS BIGINT)
           AS micro
  FROM ucnt GROUP BY source
)
SELECT hb.source, hb.n2 AS n_bigrams,
       round(ln(CAST(hb.n2 AS DOUBLE))
             - CAST(hb.micro AS DOUBLE) / 1000000 / hb.n2, 6)
         AS h_bigram,
       round(CAST(hu.micro AS DOUBLE) / 1000000 / hb.n2
             - CAST(hb.micro AS DOUBLE) / 1000000 / hb.n2, 6)
         AS h_conditional
FROM hb JOIN hu USING (source)
""",
)
def corpus_bigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram and conditional next-word entropy per source (nats) —
    the order-2 extension of entropy_source and the sharper
    template-generation detector (a source can have high unigram
    entropy yet near-zero conditional entropy when sentences repeat
    wholesale): H(w2|w1) = H(bigram) - H(first word of bigram) =
    sum(c1 ln c1)/N2 - sum(c2 ln c2)/N2. Same micro-nat fixed-point
    discipline as entropy_source: every c*ln(c) term quantizes once
    to integer micro-nats so the sums are exact order-independent
    BIGINTs; outputs rounded to 6 dp. The bigram table comes from a
    positional self-join on (doc, pos+1) — one explode, one
    equi-join shuffle on doc_id."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "w"),
    )
    a = toks.select("source", "doc_id", "pos", F.col("w").alias("w1"))
    b = toks.select(
        F.col("doc_id").alias("b_doc"),
        (F.col("pos") - 1).alias("b_pos"),
        F.col("w").alias("w2"),
    )
    bi = a.join(
        b,
        (a["doc_id"] == b["b_doc"]) & (a["pos"] == b["b_pos"]),
    ).select("source", "w1", "w2")
    bcnt = bi.groupBy("source", "w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ucnt = bcnt.groupBy("source", "w1").agg(
        F.sum("c").cast("bigint").alias("c")
    )
    micro = "CAST(ROUND(c * ln(c) * 1000000) AS BIGINT)"
    hb = bcnt.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n2"),
        F.sum(F.expr(micro)).cast("bigint").alias("micro_b"),
    )
    hu = ucnt.groupBy("source").agg(
        F.sum(F.expr(micro)).cast("bigint").alias("micro_u")
    )
    return hb.join(hu, "source").select(
        "source",
        F.col("n2").alias("n_bigrams"),
        F.round(
            F.log(F.col("n2").cast("double"))
            - F.col("micro_b").cast("double") / 1000000 / F.col("n2"),
            6,
        ).alias("h_bigram"),
        F.round(
            F.col("micro_u").cast("double") / 1000000 / F.col("n2")
            - F.col("micro_b").cast("double") / 1000000 / F.col("n2"),
            6,
        ).alias("h_conditional"),
    )


@query(
    "corpus_heaps_law",
    oracle="""
WITH d AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY doc_id) AS pos,
         len(string_split(text, ' ')) AS ntok, text
  FROM documents
), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
w AS MATERIALIZED (
  SELECT word, MIN(pos) AS first_pos
  FROM (SELECT pos, unnest(string_split(text, ' ')) AS word FROM d)
  GROUP BY word
), cp AS (
  SELECT k, ((k * (SELECT n FROM nn)) // 10) AS nk
  FROM unnest(generate_series(1, 10)) t(k)
), tk AS MATERIALIZED (
  SELECT cp.k, CAST(SUM(d.ntok) AS BIGINT) AS t
  FROM cp JOIN d ON d.pos <= cp.nk GROUP BY cp.k
), vk AS MATERIALIZED (
  SELECT cp.k, CAST(COUNT(*) AS BIGINT) AS v
  FROM cp JOIN w ON w.first_pos <= cp.nk GROUP BY cp.k
), pts AS (
  SELECT CAST(FLOOR(LN(CAST(tk.t AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS x,
         CAST(FLOOR(LN(CAST(vk.v AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS y
  FROM tk JOIN vk ON vk.k = tk.k
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM pts
)
SELECT (SELECT n FROM nn) AS n_docs,
       (SELECT v FROM vk WHERE k = 10) AS vocab_final,
       (SELECT t FROM tk WHERE k = 10) AS tokens_final,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) AS beta,
       (CAST(sy AS DOUBLE) / 1000000
        - CAST(n * sxy - sx * sy AS DOUBLE)
          / CAST(n * sxx - sx * sx AS DOUBLE)
          * (CAST(sx AS DOUBLE) / 1000000)) / 10 AS intercept_ln
FROM s
""",
)
def corpus_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth (V(T) ~ K * T^beta; Heaps
    1978): walk the corpus in doc_id order, record (cumulative
    tokens, cumulative distinct vocabulary) at the 10 document-count
    deciles, and fit the log-log OLS line. beta ~0.4-0.6 marks
    natural text; beta near 0 screams template/duplicated corpus and
    near 1 screams noise — the growth-curve twin of quality_zipf_fit,
    and the estimator for "how much NEW vocabulary will the next
    10 TB bring".

    Exactness: V(n_k) needs no sequential scan — it is COUNT(first
    occurrence position <= n_k) where first_pos is a plain MIN per
    word; both cumulative curves are conditional exact-integer
    aggregates. The 10 log points are quantized engine-side with
    FLOOR(LN(int) * 1e6 + 0.5) (the adamic_adar ln discipline — ln of
    IDENTICAL integers in both engines, quantized once), and the OLS
    slope is exact-bigint sums with ONE double division. Scale shape:
    the doc numbering is the two-phase global-rank machinery, the
    explode feeds one hash aggregate per word, and everything after
    is 10 rows."""
    from ..plans.global_rank import with_global_row_number

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    numbered, n_docs = with_global_row_number(d, ["doc_id"], out_col="pos")
    numbered = numbered.select(
        "pos", F.size(F.split("text", " ")).alias("ntok"), "text"
    ).localCheckpoint(eager=True)
    nks = [(k, (k * n_docs) // 10) for k in range(1, 11)]
    t_row = numbered.agg(
        *[
            F.sum(F.when(F.col("pos") <= nk, F.col("ntok")))
            .cast("bigint")
            .alias(f"t{k}")
            for k, nk in nks
        ]
    ).first()
    first_pos = (
        numbered.select(
            "pos", F.explode(F.split("text", " ")).alias("word")
        )
        .groupBy("word")
        .agg(F.min("pos").alias("first_pos"))
    )
    v_row = first_pos.agg(
        *[
            F.count(F.when(F.col("first_pos") <= nk, F.lit(1)))
            .cast("bigint")
            .alias(f"v{k}")
            for k, nk in nks
        ]
    ).first()
    pts = spark.createDataFrame(
        [(int(t_row[f"t{k}"]), int(v_row[f"v{k}"])) for k, _ in nks],
        "t bigint, v bigint",
    ).select(
        F.expr(
            "CAST(FLOOR(LN(CAST(t AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
        ).alias("x"),
        F.expr(
            "CAST(FLOOR(LN(CAST(v AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
        ).alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    beta = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
    )
    return s.select(
        F.lit(n_docs).cast("bigint").alias("n_docs"),
        F.lit(int(v_row["v10"])).cast("bigint").alias("vocab_final"),
        F.lit(int(t_row["t10"])).cast("bigint").alias("tokens_final"),
        beta.alias("beta"),
        (
            (
                F.col("sy").cast("double") / 1000000
                - beta * (F.col("sx").cast("double") / 1000000)
            )
            / 10
        ).alias("intercept_ln"),
    )


GV_TOP_WORDS = 8    # whole-word vocab entries
GV_TOP_BIGRAMS = 16  # character-bigram vocab entries


@query(
    "tokenize_greedy_vocab",
    oracle=f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS wd FROM documents
), wc AS (
  SELECT wd, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks WHERE len(wd) > 0 GROUP BY 1
), topw AS (
  SELECT wd AS t FROM wc ORDER BY c DESC, wd LIMIT {GV_TOP_WORDS}
), bg AS (
  SELECT substr(wc.wd, s.p, 2) AS t, CAST(SUM(wc.c) AS BIGINT) AS tc
  FROM wc, unnest(generate_series(1, len(wc.wd) - 1)) s(p)
  GROUP BY 1
), topb AS (
  SELECT t FROM bg ORDER BY tc DESC, t LIMIT {GV_TOP_BIGRAMS}
), vocab AS (
  SELECT DISTINCT t FROM (SELECT t FROM topw UNION ALL SELECT t FROM topb)
), dw AS (
  SELECT DISTINCT wd FROM wc
), best AS (
  SELECT dw.wd, s.p,
         COALESCE(MAX(CASE WHEN substr(dw.wd, s.p, len(v.t)) = v.t
                           THEN len(v.t) END), 0) AS bl
  FROM dw, unnest(generate_series(1, len(dw.wd))) s(p), vocab v
  GROUP BY 1, 2
), walk AS (
  SELECT wd, 1 AS pos, 0 AS tok, 0 AS unk FROM dw
  UNION ALL
  SELECT walk.wd, walk.pos + GREATEST(b.bl, 1),
         walk.tok + 1,
         walk.unk + CASE WHEN b.bl = 0 THEN 1 ELSE 0 END
  FROM walk JOIN best b ON b.wd = walk.wd AND b.p = walk.pos
  WHERE walk.pos <= len(walk.wd)
), done AS (
  SELECT wd, tok, unk FROM walk WHERE pos > len(wd)
)
SELECT toks.doc_id,
       CAST(SUM(d.tok) AS BIGINT) AS n_tokens,
       CAST(SUM(d.unk) AS BIGINT) AS n_unk_chars,
       CAST(COUNT(*) AS BIGINT) AS n_words
FROM toks JOIN done d ON d.wd = toks.wd
GROUP BY 1
""",
)
def tokenize_greedy_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy longest-match subword tokenization against a
    DETERMINISTIC corpus-derived vocab (top-{GV_TOP_WORDS} whole
    words + top-{GV_TOP_BIGRAMS} character bigrams by exact
    frequency, ties by string): at each position take the longest
    vocab entry that matches, else emit one unknown-char token —
    the WordPiece-style INFERENCE pass, and the hash-checked
    companion of the rows-only bpe_train/tokenize_bpe pair (their
    justification is the unbounded merge-chain REPLAY cost; this
    key pins the greedy-matching machinery itself to a DuckDB
    recursive-CTE walk over a precomputed longest-match jump
    table).

    Exactness: vocab selection is exact integer counts with total
    tie-breaking; the greedy walk is pure string/integer logic —
    identical in both engines by construction. Scale shape: token
    counting runs per DISTINCT word (an Arrow mapInPandas over the
    deduplicated vocabulary — the corpus can have billions of
    occurrences but only |V| distinct words do string work), then
    one equi-join back to occurrences and a per-doc hash aggregate.
    The <=24-entry vocab ships by closure, never a shuffle."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("wd")
    ).filter(F.length("wd") > 0)
    wc = toks.groupBy("wd").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    topw = [
        r["wd"]
        for r in wc.orderBy(F.desc("c"), "wd").limit(GV_TOP_WORDS).collect()
    ]
    # sequence(1, 0) counts DOWN in Spark (vs empty in DuckDB/SQL) —
    # exclude 1-char words before generating bigram positions.
    bg = (
        wc.filter(F.length("wd") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, length(wd) - 1), p -> substr(wd, p, 2))")
            ).alias("t"),
            "c",
        )
        .groupBy("t")
        .agg(F.sum("c").cast("bigint").alias("tc"))
    )
    topb = [
        r["t"]
        for r in bg.orderBy(F.desc("tc"), "t").limit(GV_TOP_BIGRAMS).collect()
    ]
    vocab = sorted(set(topw) | set(topb), key=lambda t: (-len(t), t))

    def tokenize(batches):
        import pandas as pd

        for pdf in batches:
            toks_out, unks = [], []
            for w in pdf["wd"]:
                pos, tok, unk = 0, 0, 0
                n = len(w)
                while pos < n:
                    best = 0
                    for t in vocab:  # longest-first order
                        lt = len(t)
                        if lt <= best:
                            break
                        if w[pos : pos + lt] == t:
                            best = lt
                            break
                    if best == 0:
                        unk += 1
                        pos += 1
                    else:
                        pos += best
                    tok += 1
                toks_out.append(tok)
                unks.append(unk)
            yield pd.DataFrame(
                {"wd": pdf["wd"], "tok": toks_out, "unk": unks}
            )

    dw = wc.select("wd")
    done = dw.mapInPandas(tokenize, "wd string, tok bigint, unk bigint")
    return toks.join(done, "wd").groupBy("doc_id").agg(
        F.sum("tok").cast("bigint").alias("n_tokens"),
        F.sum("unk").cast("bigint").alias("n_unk_chars"),
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
    )


@query(
    "corpus_unigram_entropy",
    bounded_cross="1-row token-total scalar onto the O(vocab) count table",
    oracle="""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS wd FROM documents
), wc AS (
  SELECT wd, CAST(COUNT(*) AS BIGINT) AS f
  FROM toks WHERE len(wd) > 0 GROUP BY 1
), tot AS (
  SELECT CAST(SUM(f) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS v FROM wc
), q AS (
  SELECT CAST(SUM(f * CAST(FLOOR(LN(CAST(f AS DOUBLE)) * 1000000 + 0.5)
                           AS BIGINT)) AS BIGINT) AS sfl
  FROM wc
)
SELECT tot.t AS n_tokens,
       tot.v AS vocab_size,
       CAST(FLOOR(LN(CAST(tot.t AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
         / 1e6
         - CAST(q.sfl AS DOUBLE) / 1000000 / tot.t AS h_nats,
       (CAST(FLOOR(LN(CAST(tot.t AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
          / 1e6
        - CAST(q.sfl AS DOUBLE) / 1000000 / tot.t)
         / CAST('0.6931471805599453' AS DOUBLE) AS h_bits
FROM tot, q
""",
)
def corpus_unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the corpus unigram distribution via the
    count identity H = ln T - (sum_w f_w ln f_w)/T — the
    zeroth-order compressibility bound every tokenizer/quality
    report leads with (corpus_bigram_entropy measures the
    first-order conditional; the gap between them is the unigram
    mutual information). Reported in nats and bits (ln 2 as a
    repr-round-tripped CAST-string literal — the ts_macd DECIMAL-
    literal lesson).

    Exactness: per-word f*lnq(f) with the 1e-6-quantized ln is an
    exact bigint micro-nat product, so the sum is ORDER-FREE; only
    two final divisions are float. Scale shape: one hash aggregate
    to O(vocab) rows, a 1-row reduction, a declared scalar cross."""
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("wd"))
        .filter(F.length("wd") > 0)
        .groupBy("wd")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    tot = wc.agg(
        F.sum("f").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    q = wc.agg(
        F.sum(
            F.col("f")
            * F.floor(
                F.log(F.col("f").cast("double")) * F.lit(1000000) + F.lit(0.5)
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("sfl")
    )
    # bounded: two 1-row frames crossed
    j = tot.crossJoin(F.broadcast(q))
    lnT = (
        F.floor(
            F.log(F.col("t").cast("double")) * F.lit(1000000) + F.lit(0.5)
        ).cast("bigint")
        / F.lit(1e6)
    )
    h = lnT - F.col("sfl").cast("double") / F.lit(1000000) / F.col("t")
    ln2 = float.fromhex("0x1.62e42fefa39efp-1")
    return j.select(
        F.col("t").alias("n_tokens"),
        F.col("v").alias("vocab_size"),
        h.alias("h_nats"),
        (h / F.lit(ln2)).alias("h_bits"),
    )


BD_TOP_WORDS = 16


@query(
    "text_burrows_delta",
    bounded_cross="20x20 source pair grid over the bounded profile table",
    oracle=f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS wd FROM documents
), tk AS (
  SELECT source, wd FROM toks WHERE len(wd) > 0
), topw AS (
  SELECT wd FROM (
    SELECT wd, CAST(COUNT(*) AS BIGINT) AS c FROM tk GROUP BY wd
  ) ORDER BY c DESC, wd LIMIT {BD_TOP_WORDS}
), stot AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS t FROM tk GROUP BY source
), cells AS (
  SELECT s.source, w.wd,
         CAST(COALESCE(x.c, 0) AS DOUBLE) / s.t AS f
  FROM stot s
  CROSS JOIN topw w
  LEFT JOIN (SELECT source, wd, CAST(COUNT(*) AS BIGINT) AS c
             FROM tk GROUP BY source, wd) x
    ON x.source = s.source AND x.wd = w.wd
), wm AS (
  SELECT wd, CAST(COUNT(*) AS BIGINT) AS k,
         list_sum(list(f ORDER BY source)) AS sf,
         list_sum(list(f * f ORDER BY source)) AS sff
  FROM cells GROUP BY wd
), ws AS (
  SELECT wd, sf / k AS mu,
         sqrt((sff - sf / k * sf) / (k - 1)) AS sd
  FROM wm
), z AS (
  SELECT c.source, c.wd, (c.f - ws.mu) / ws.sd AS z
  FROM cells c JOIN ws ON ws.wd = c.wd
  WHERE ws.sd > 0
), pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         list_sum(list(ABS(a.z - b.z) ORDER BY a.wd)) AS sabs,
         CAST(COUNT(*) AS BIGINT) AS nw
  FROM z a JOIN z b ON a.wd = b.wd AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, sabs / nw AS burrows_delta
FROM pairs
""",
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometric distance between all source pairs:
    z-score each source's relative frequency of the {BD_TOP_WORDS}
    most common words against the cross-source mean/sd, then
    Delta(a, b) = mean |z_a - z_b| — THE authorship-attribution
    measure (Burrows 2002), and a register/domain-drift detector
    for corpus curation (corpus_js_divergence compares whole
    distributions; Delta deliberately looks only at function-word
    style). Zero-variance words drop by exact comparison.

    Exactness: counts and totals are exact integers; relative
    frequencies are identical single divisions; the cross-source
    moments, z-scores and pair sums all fold in source/word order
    via the strict-fold pair over BOUNDED tables (20 sources x 16
    words). Scale shape: one token hash aggregate (data-sized),
    then everything lives on the 320-cell profile table with a
    DECLARED 20x20 pair grid."""
    d = load(spark, sf_dir, "documents")
    tk = d.select(
        "source", F.explode(F.split("text", " ")).alias("wd")
    ).filter(F.length("wd") > 0)
    topw = [
        r["wd"]
        for r in tk.groupBy("wd")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .orderBy(F.desc("c"), "wd")
        .limit(BD_TOP_WORDS)
        .collect()
    ]
    stot = tk.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    cnts = (
        tk.filter(F.col("wd").isin(topw))
        .groupBy("source", "wd")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wgrid = d.sparkSession.createDataFrame([(w,) for w in topw], "wd string")
    cells = (
        stot.crossJoin(F.broadcast(wgrid))
        .join(F.broadcast(cnts), ["source", "wd"], "left")
        .select(
            "source",
            "wd",
            (
                F.coalesce(F.col("c"), F.lit(0)).cast("double") / F.col("t")
            ).alias("f"),
        )
    )

    def fold_by(key, col):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct(key, col.alias("v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        )

    wm = cells.groupBy("wd").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        fold_by("source", F.col("f")).alias("sf"),
        fold_by("source", F.col("f") * F.col("f")).alias("sff"),
    )
    ws = wm.select(
        "wd",
        (F.col("sf") / F.col("k")).alias("mu"),
        F.sqrt(
            (F.col("sff") - F.col("sf") / F.col("k") * F.col("sf"))
            / (F.col("k") - 1)
        ).alias("sd"),
    )
    z = (
        cells.join(F.broadcast(ws), "wd")
        .filter(F.col("sd") > 0)
        .select(
            "source", "wd", ((F.col("f") - F.col("mu")) / F.col("sd")).alias("z")
        )
    )
    a = z.select(
        F.col("source").alias("src_a"), F.col("wd"), F.col("z").alias("za")
    )
    b = z.select(
        F.col("source").alias("src_b"), F.col("wd").alias("wdb"),
        F.col("z").alias("zb"),
    )
    # bounded: 20x20 source pair grid on the 320-cell profile
    pairs = a.join(
        F.broadcast(b),
        (F.col("wd") == F.col("wdb")) & (F.col("src_a") < F.col("src_b")),
    )
    return pairs.groupBy("src_a", "src_b").agg(
        (
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "wd", F.abs(F.col("za") - F.col("zb")).alias("v")
                        )
                    )
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["v"],
            )
            / F.count(F.lit(1))
        ).alias("burrows_delta")
    )


@query(
    "agg_chao2_richness",
    oracle="""
WITH inc AS (
  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS wd
  FROM documents
), clean AS (
  SELECT source, wd FROM inc WHERE len(wd) > 0
), freq AS (
  SELECT wd, CAST(COUNT(*) AS BIGINT) AS k FROM clean GROUP BY wd
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS s_obs,
         CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS q1,
         CAST(SUM(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT) AS q2,
         (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) FROM clean) AS t
  FROM freq
)
SELECT s_obs AS species_observed, q1 AS uniques, q2 AS duplicates,
       t AS n_sources,
       CASE WHEN q2 > 0
            THEN CAST(s_obs AS DOUBLE)
                 + (CAST(t - 1 AS DOUBLE) / t)
                   * CAST(q1 AS DOUBLE) * q1 / (2 * q2)
            ELSE CAST(s_obs AS DOUBLE)
                 + (CAST(t - 1 AS DOUBLE) / t)
                   * CAST(q1 AS DOUBLE) * (q1 - 1) / 2 END AS chao2_estimate
FROM m
""",
)
def agg_chao2_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao2 incidence-based richness estimator of the corpus
    vocabulary: from each word's PRESENCE across the 20 sources
    (not its abundance), estimate how many words exist beyond the
    observed — S + ((t-1)/t) q1^2/(2 q2) with the bias-corrected
    q2 = 0 branch — the sampling-completeness twin of
    agg_chao1_richness (abundance view) that survey-based corpus
    audits need when only per-source presence is trustworthy.

    Exactness: incidence counts, q1/q2 and t are exact integers
    from one distinct + one hash aggregate; both estimator branches
    are fixed double expressions selected by exact comparisons.
    Scale shape: distinct (source, word) pairs (bounded by
    t x vocab), two tiny aggregates."""
    inc = (
        load(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("wd"))
        .filter(F.length("wd") > 0)
        .distinct()
    )
    t = inc.select("source").distinct().count()
    freq = inc.groupBy("wd").agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    m = freq.agg(
        F.count(F.lit(1)).cast("bigint").alias("s_obs"),
        F.sum(F.when(F.col("k") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("q1"),
        F.sum(F.when(F.col("k") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("q2"),
    )
    tf = F.lit(float(t - 1)) / F.lit(t)
    est = F.when(
        F.col("q2") > 0,
        F.col("s_obs").cast("double")
        + tf * F.col("q1").cast("double") * F.col("q1") / (2 * F.col("q2")),
    ).otherwise(
        F.col("s_obs").cast("double")
        + tf * F.col("q1").cast("double") * (F.col("q1") - 1) / 2
    )
    return m.select(
        F.col("s_obs").alias("species_observed"),
        F.col("q1").alias("uniques"),
        F.col("q2").alias("duplicates"),
        F.lit(t).cast("bigint").alias("n_sources"),
        est.alias("chao2_estimate"),
    )
