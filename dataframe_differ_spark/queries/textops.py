"""Layer H text analysis + dedup over `documents` (SURVEY.md §2.H, [B:6]).

LLM-training-pipeline operators: tokenization, TF-IDF, language ID,
quality scoring, fingerprinting, exact + n-gram-Jaccard dedup. Everything
here is native Spark SQL expressions / higher-order functions — zero Python
UDFs — so the hot path stays inside whole-stage codegen at 100 TB.

Parity notes: token splitting is a single-space split in both engines;
transcendentals (ln) are rounded to 9 decimals to absorb last-ulp libm
differences; ratios are single double divisions (deterministic).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dataframe_differ_spark.queries import register
from dataframe_differ_spark.tables import load_table


def _tokens(col="text"):
    return F.split(F.col(col), " ")


# --------------------------------------------------------------------------
# H5: tokenize + token stats
# --------------------------------------------------------------------------


@register(
    "text_tokens",
    oracle="""
SELECT token, COUNT(*) AS occurrences, COUNT(DISTINCT doc_id) AS doc_freq
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
""",
)
def q_text_tokens(spark, sf_dir):
    """H5: explode tokens → corpus term frequencies + document frequencies.

    Scale: explode is pipelined (no shuffle); the single shuffle is the
    groupBy(token) with map-side partial aggregation.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
    )


@register(
    "text_tfidf",
    oracle="""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
     tf AS (SELECT doc_id, token, COUNT(*) AS tf
            FROM tok GROUP BY doc_id, token),
     df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token),
     n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT tf.doc_id, tf.token, tf.tf, df.df,
       ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 9) AS tfidf
FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
WHERE tf.tf >= 3
""",
)
def q_text_tfidf(spark, sf_dir):
    """H6: TF-IDF per (doc, term); df table is tiny → broadcast join.

    At 100 TB the df side (vocabulary) stays small relative to the corpus,
    so the tf→df join broadcasts and the corpus shuffles only once (tf
    groupBy). ln() rounded to 9dp for cross-engine libm parity.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()  # scalar, one tiny job; stable across engines
    return (
        tf.join(F.broadcast(df), "token")
        .filter(F.col("tf") >= 3)
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 9
            ).alias("tfidf"),
        )
    )


# --------------------------------------------------------------------------
# H: language ID (train-free n-gram/token-profile heuristic)
# --------------------------------------------------------------------------


@register(
    "text_lang_id",
    oracle="""
WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
             FROM documents),
     freq AS (SELECT lang, token, COUNT(*) AS cnt
              FROM tok GROUP BY lang, token),
     prof AS (SELECT lang, token FROM (
                SELECT lang, token,
                       ROW_NUMBER() OVER (PARTITION BY lang
                                          ORDER BY cnt DESC, token) AS rn
                FROM freq) WHERE rn <= 8),
     dtok AS (SELECT DISTINCT doc_id, token FROM tok),
     scores AS (SELECT d.doc_id, p.lang, COUNT(*) AS hits
                FROM dtok d JOIN prof p ON d.token = p.token
                GROUP BY d.doc_id, p.lang),
     best AS (SELECT doc_id, lang AS predicted_lang FROM (
                SELECT doc_id, lang,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                                          ORDER BY hits DESC, lang) AS rn
                FROM scores) WHERE rn = 1)
SELECT d.doc_id, d.lang AS true_lang, b.predicted_lang,
       CAST(d.lang = b.predicted_lang AS INTEGER) AS correct
FROM documents d JOIN best b ON d.doc_id = b.doc_id
""",
)
def q_text_lang_id(spark, sf_dir):
    """Language ID via train-free token-profile matching.

    Builds a top-8 token profile per language from the corpus itself, then
    classifies each doc by profile overlap (ties broken lexicographically).
    The profile table is tiny → broadcast; the corpus-side explode+groupBy
    carries the scale. Deterministic end to end, so it gets a full SQL
    oracle — unusual for a classifier, deliberate here.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang", F.explode(_tokens()).alias("token"))
    freq = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("token"))
    prof = (
        freq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 8)
        .select("lang", "token")
    )
    dtok = tok.select("doc_id", "token").distinct()
    scores = (
        dtok.join(F.broadcast(prof.withColumnRenamed("lang", "plang")), "token")
        .groupBy("doc_id", "plang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    wb = Window.partitionBy("doc_id").orderBy(F.col("hits").desc(), F.col("plang"))
    best = (
        scores.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("plang").alias("predicted_lang"))
    )
    return docs.join(best, "doc_id").select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        "predicted_lang",
        (F.col("lang") == F.col("predicted_lang")).cast("int").alias("correct"),
    )


# --------------------------------------------------------------------------
# H: quality scoring + token counting
# --------------------------------------------------------------------------


@register(
    "text_quality",
    oracle="""
WITH t AS (
  SELECT doc_id, n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         len(regexp_extract_all(text, '[a-z]+')) AS n_word_tokens
  FROM documents)
SELECT doc_id, n_tokens, n_distinct,
       ROUND(CAST(n_distinct AS DOUBLE) / n_tokens, 9) AS ttr,
       ROUND(CAST(n_chars AS DOUBLE) / n_tokens, 9) AS avg_token_len,
       CAST(n_tokens >= 20 AND CAST(n_distinct AS DOUBLE) / n_tokens >= 0.3
            AS INTEGER) AS passes_quality
FROM t
""",
)
def q_text_quality(spark, sf_dir):
    """Quality scoring: token counts, type-token ratio, length heuristics.

    Pure per-row expressions — embarrassingly parallel, no shuffle at all;
    at 100 TB this runs at parquet scan speed.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    ttr = n_distinct.cast("double") / n_tokens
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        F.round(ttr, 9).alias("ttr"),
        F.round(F.col("n_chars").cast("double") / n_tokens, 9).alias(
            "avg_token_len"
        ),
        ((n_tokens >= 20) & (ttr >= 0.3)).cast("int").alias("passes_quality"),
    )


@register(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ' '),
                          t -> CAST(length(t) * 131 + ascii(t) AS BIGINT))),
         (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
FROM documents
""",
)
def q_text_fingerprint(spark, sf_dir):
    """Document fingerprint: order-sensitive polynomial rolling hash.

    h = fold(tokens, h*31 + (len*131 + first_char)) mod 1e9+7 — pure
    integer arithmetic, bit-identical across engines, computed with the
    aggregate higher-order function (no UDF). Detects exact and
    prefix-shifted duplicates cheaply at scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    code = "CAST(length(t) * 131 + ascii(t) AS BIGINT)"
    fp = F.expr(
        "aggregate(split(text, ' '), CAST(0 AS BIGINT), "
        f"(acc, t) -> (acc * 31 + {code}) % 1000000007)"
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


# --------------------------------------------------------------------------
# H1/H2-adjacent: dedup family
# --------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS text_hash,
       MIN(doc_id) AS canonical_doc_id,
       COUNT(*) AS copies
FROM documents
GROUP BY md5(text)
""",
)
def q_dedup_exact(spark, sf_dir):
    """H1: exact dedup — hash-groupBy on content, min-id canonical.

    The 100 TB shape: shuffle on md5(text) (uniform 128-bit key, no skew),
    map-side combine. Survivors = canonical_doc_id; copies>1 are dups.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("copies"),
    )


@register(
    "dedup_ngram",
    oracle="""
WITH sh AS (
  SELECT doc_id, lang, source,
         list_distinct(list_transform(
           range(1, greatest(len(string_split(text,' ')) - 2, 0) + 1),
           i -> string_split(text,' ')[i] || ' ' ||
                string_split(text,' ')[i+1] || ' ' ||
                string_split(text,' ')[i+2])) AS shingles
  FROM documents),
  tok AS (
  SELECT doc_id, lang, source, len(shingles) AS n_sh,
         unnest(shingles) AS shingle
  FROM sh),
  inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         ANY_VALUE(a.n_sh) AS n_a, ANY_VALUE(b.n_sh) AS n_b,
         COUNT(*) AS inter_n
  FROM tok a JOIN tok b
    ON a.lang = b.lang AND a.source = b.source
   AND a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT doc_a, doc_b,
       ROUND(CAST(inter_n AS DOUBLE) / (n_a + n_b - inter_n), 9) AS jaccard
FROM inter
WHERE CAST(inter_n AS DOUBLE) / (n_a + n_b - inter_n) >= 0.2
""",
)
def q_dedup_ngram(spark, sf_dir):
    """H2-family: 3-gram (shingle) Jaccard near-dup detection, blocked.

    Scalable inverted-index formulation: explode distinct shingles, self
    equi-join on (block, shingle) so candidate pairs exist ONLY for
    documents that actually share a shingle — |A∩B| falls out as the
    pair's match count and |A∪B| = |A|+|B|−|A∩B|. No per-pair array
    intersection, no all-pairs blowup; the shuffle key (shingle) is
    near-uniform. Additional (lang, source) blocking caps hot shingles;
    full MinHash-LSH banding is `dedup_near`.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Shingles via zip_with over shifted slices — O(n) per doc. The naive
    # transform(sequence(...), i -> toks[i]...) form re-evaluates split()
    # per element access (O(n²) per doc, ~7× slower measured); zip_with
    # walks the three arrays once. Tail positions (where the +2 slice ran
    # out) surface as NULL and are filtered.
    sh = (
        docs.withColumn("toks", F.split("text", " "))
        .withColumn("t2", F.expr("slice(toks, 2, size(toks))"))
        .withColumn("t3", F.expr("slice(toks, 3, size(toks))"))
        .select(
            "doc_id",
            "lang",
            "source",
            F.expr(
                "array_distinct(filter("
                "  zip_with(zip_with(toks, t2, (a, b) -> concat_ws(' ', a, b)),"
                "           t3, (ab, c) -> IF(c IS NULL, NULL, concat_ws(' ', ab, c))),"
                "  x -> x IS NOT NULL))"
            ).alias("shingles"),
        )
    )
    tok = sh.select(
        "doc_id",
        "lang",
        "source",
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    )
    a = tok.alias("a")
    b = tok.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.any_value(F.col("a.n_sh")).alias("n_a"),
            F.any_value(F.col("b.n_sh")).alias("n_b"),
            F.count(F.lit(1)).alias("inter_n"),
        )
    )
    jac = F.col("inter_n").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("inter_n")
    )
    return inter.filter(jac >= 0.2).select(
        "doc_a", "doc_b", F.round(jac, 9).alias("jaccard")
    )
