"""Training-data pipeline operators over `documents` (SURVEY.md §2.H family).

The corpus-preparation stage of an LLM data pipeline, beyond dedup (in
``textops``): repetition-based quality filters, deterministic dataset
splits, vocabulary/Zipf statistics, sequence packing to a token budget,
source-mixture rebalancing, and benchmark decontamination. Everything is
native Spark SQL expressions — no Python UDFs — so at 100 TB the hot path
stays in whole-stage codegen and each operator is one-to-two shuffles.

Parity notes: token splitting is single-space in both engines; ratios are
single double divisions rounded to 9 dp; dataset splits use md5-prefix
buckets (engine-stable) rather than rng.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dataframe_differ_spark.operators.numeric import split_cast_sql as _split_sql
from dataframe_differ_spark.operators.pipeline import (
    decontaminate,
    hash_split,
    pack_sequences,
)
from dataframe_differ_spark.queries import register
from dataframe_differ_spark.tables import load_table


def _docs_tok(spark, sf_dir):
    """documents with a `toks` array column and `n_tok` count."""
    return (
        load_table(spark, sf_dir, "documents")
        .withColumn("toks", F.split("text", " "))
        .withColumn("n_tok", F.size("toks").cast("long"))
    )


# --------------------------------------------------------------------------
# Repetition / quality filter (Gopher-style signals, token-level)
# --------------------------------------------------------------------------


@register(
    "text_repetition",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
base AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tok, COUNT(*) AS n_uniq,
         MAX(cnt) AS top_tok FROM (
    SELECT doc_id, token, COUNT(*) AS cnt
    FROM tok GROUP BY doc_id, token)
  GROUP BY doc_id),
big AS (
  SELECT doc_id, MAX(cnt) AS top_bigram FROM (
    SELECT doc_id, bigram, COUNT(*) AS cnt FROM (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len(string_split(text,' ')) - 1, 0) + 1),
               i -> string_split(text,' ')[i] || ' ' ||
                    string_split(text,' ')[i+1])) AS bigram
      FROM documents)
    GROUP BY doc_id, bigram)
  GROUP BY doc_id)
SELECT b.doc_id, b.n_tok,
       ROUND(CAST(b.n_uniq AS DOUBLE) / b.n_tok, 9) AS uniq_frac,
       ROUND(CAST(b.top_tok AS DOUBLE) / b.n_tok, 9) AS top_tok_frac,
       ROUND(CAST(2 * g.top_bigram AS DOUBLE) / b.n_tok, 9)
         AS top_bigram_frac,
       (CAST(b.n_uniq AS DOUBLE) / b.n_tok < 0.30
        OR CAST(2 * g.top_bigram AS DOUBLE) / b.n_tok > 0.20)
         AS is_repetitive
FROM base b JOIN big g ON b.doc_id = g.doc_id
""",
)
def q_text_repetition(spark, sf_dir):
    """Per-document repetition signals — the Gopher-rules quality filter
    re-expressed at token level (the corpus has no line structure):
    unique-token fraction, top-unigram fraction, top-bigram token
    fraction, and a combined repetitive-document flag.

    Scale: both metric branches explode then groupBy(doc_id[, term]) —
    partial aggregation makes the shuffle ~vocabulary-sized per doc, and
    both branches shuffle on doc_id so the final join co-partitions
    without an extra exchange. Bigrams come from zip_with over a shifted
    slice (O(n) per doc, no nested-HOF re-evaluation).
    """
    docs = _docs_tok(spark, sf_dir)
    tok = docs.select("doc_id", "n_tok", F.explode("toks").alias("token"))
    base = (
        tok.groupBy("doc_id", "n_tok", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id", "n_tok")
        .agg(
            F.count(F.lit(1)).alias("n_uniq"),
            F.max("cnt").alias("top_tok"),
        )
    )
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "filter(zip_with(toks, slice(toks, 2, size(toks)),"
                "  (a, b) -> IF(b IS NULL, NULL, concat_ws(' ', a, b))),"
                "  x -> x IS NOT NULL)"
            )
        ).alias("bigram"),
    )
    big = (
        bigrams.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_bigram"))
    )
    uniq_frac = F.col("n_uniq").cast("double") / F.col("n_tok")
    top_big_frac = F.lit(2) * F.col("top_bigram").cast("double") / F.col("n_tok")
    return base.join(big, "doc_id").select(
        "doc_id",
        "n_tok",
        F.round(uniq_frac, 9).alias("uniq_frac"),
        F.round(F.col("top_tok").cast("double") / F.col("n_tok"), 9).alias(
            "top_tok_frac"
        ),
        F.round(top_big_frac, 9).alias("top_bigram_frac"),
        ((uniq_frac < 0.30) | (top_big_frac > 0.20)).alias("is_repetitive"),
    )


# --------------------------------------------------------------------------
# Deterministic train / val / test split
# --------------------------------------------------------------------------


@register(
    "split_train_val_test",
    oracle="""
SELECT CASE WHEN b = 'f' THEN 'test'
            WHEN b IN ('d', 'e') THEN 'val'
            ELSE 'train' END AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM (SELECT *, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS b
      FROM documents)
GROUP BY 1, 2
""",
)
def q_split_train_val_test(spark, sf_dir):
    """Deterministic hash split into train (13/16) / val (2/16) / test
    (1/16) by md5 bucket of doc_id, summarized per (split, lang).

    The reproducible alternative to randomSplit: identical membership on
    every run, every engine, any partitioning — essential when the split
    must survive re-ingestion at 100 TB. The bucket char compare and the
    token count pipeline with the scan; one shuffle for the summary.
    """
    # Thin binding over operators.pipeline.hash_split (round-5 extraction):
    # default (13, 2, 1)/16 split — bucket 15 ('f') = test, 13–14 ('d','e')
    # = val, the oracle's exact membership.
    docs = _docs_tok(spark, sf_dir)
    return (
        hash_split(docs, "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


# --------------------------------------------------------------------------
# Vocabulary / Zipf coverage
# --------------------------------------------------------------------------


@register(
    "vocab_coverage",
    oracle="""
WITH cnt AS (
  SELECT token, COUNT(*) AS n FROM (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token),
tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM cnt),
ranked AS (
  SELECT token, n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank
  FROM cnt)
SELECT r.rank, r.token, CAST(r.n AS BIGINT) AS n,
       ROUND(SUM(r.n) OVER (ORDER BY r.rank) / t.total, 9) AS cum_coverage
FROM ranked r CROSS JOIN tot t
WHERE r.rank <= 30
""",
)
def q_vocab_coverage(spark, sf_dir):
    """Top-30 vocabulary with cumulative corpus coverage (the Zipf curve
    a tokenizer-training step reads first).

    Scale: one shuffle for the token counts (map-side combine shrinks it
    to vocabulary size); the top-30 is orderBy+limit →
    TakeOrderedAndProject (per-partition heap + driver merge of 30 rows,
    never a full vocabulary sort). Ranking and the cumulative window then
    run on exactly 30 rows; total count is a broadcast scalar, not a
    collect.
    """
    docs = _docs_tok(spark, sf_dir)
    cnt = (
        docs.select(F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cnt.agg(F.sum("n").cast("double").alias("total"))
    ranked = (
        cnt.orderBy(F.col("n").desc(), "token")
        .limit(30)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), "token"))
            .cast("long"),
        )
    )
    cum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    return ranked.crossJoin(F.broadcast(tot)).select(
        "rank",
        "token",
        "n",
        F.round(F.sum("n").over(cum) / F.col("total"), 9).alias(
            "cum_coverage"
        ),
    )


# --------------------------------------------------------------------------
# Sequence packing to a token budget
# --------------------------------------------------------------------------


@register(
    "seq_pack_budget",
    oracle="""
WITH sized AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
  FROM documents),
packed AS (
  SELECT source, doc_id, n_tok,
         CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id)
                     - n_tok) / 512.0) AS BIGINT) AS pack_id
  FROM sized)
SELECT source, pack_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM packed GROUP BY source, pack_id
""",
)
def q_seq_pack_budget(spark, sf_dir):
    """Sequence packing: assign docs (in deterministic doc_id order,
    per source) to ~512-token training packs by running token count,
    then summarize each pack.

    The pack boundary is `floor(start_offset / budget)` — pure window
    arithmetic, so packing is deterministic and engine-independent
    (unlike greedy bin packing, which is order- and state-dependent).
    Scale: the running sum partitions by source, so parallelism is
    #sources wide and no global sort exists; at 100 TB you'd sub-salt
    sources by date to widen it further. One shuffle total.
    """
    # Thin binding over operators.pipeline.pack_sequences (round-5
    # extraction).
    sized = _docs_tok(spark, sf_dir).select("source", "doc_id", "n_tok")
    packed = pack_sequences(
        sized, "n_tok", 512, partition_cols=["source"], order_cols=["doc_id"]
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# --------------------------------------------------------------------------
# Source-mixture rebalancing weights
# --------------------------------------------------------------------------


@register(
    "source_mix_weights",
    oracle="""
WITH per_src AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS total,
               COUNT(*) AS n_sources FROM per_src)
SELECT p.source, p.n_docs, p.n_tokens,
       ROUND(p.n_tokens / t.total, 9) AS token_share,
       ROUND((1.0 / t.n_sources) / (p.n_tokens / t.total), 9)
         AS uniform_weight
FROM per_src p CROSS JOIN tot t
""",
)
def q_source_mix_weights(spark, sf_dir):
    """Data-mixture rebalancing: per-source token share and the sampling
    weight that would equalize sources (target = uniform 1/n_sources).

    This is the control input for mixture-weighted sampling in a
    pretraining pipeline. One shuffle (per-source aggregate, map-side
    combined); the totals row is a broadcast scalar join.
    """
    per_src = (
        _docs_tok(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )
    tot = per_src.agg(
        F.sum("n_tokens").cast("double").alias("total"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    share = F.col("n_tokens") / F.col("total")
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(share, 9).alias("token_share"),
        F.round((F.lit(1.0) / F.col("n_sources")) / share, 9).alias(
            "uniform_weight"
        ),
    )


# --------------------------------------------------------------------------
# Benchmark decontamination (cross-set shingle overlap)
# --------------------------------------------------------------------------


@register(
    "contamination_check",
    oracle="""
WITH sh AS (
  SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = 'f' AS is_bench,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(string_split(text,' ')) - 2, 0) + 1),
           i -> string_split(text,' ')[i] || ' ' ||
                string_split(text,' ')[i+1] || ' ' ||
                string_split(text,' ')[i+2]))) AS shingle
  FROM documents)
SELECT t.doc_id,
       COUNT(DISTINCT b.doc_id) AS n_bench_docs,
       COUNT(DISTINCT t.shingle) AS n_shared_shingles
FROM sh t JOIN sh b ON t.shingle = b.shingle
WHERE NOT t.is_bench AND b.is_bench
GROUP BY t.doc_id
""",
)
def q_contamination_check(spark, sf_dir):
    """Benchmark decontamination: for every training doc (md5 bucket !=
    'f'), count the held-out "benchmark" docs (bucket 'f') it shares a
    3-token shingle with, and how many distinct shingles leak.

    Same inverted-index shape as `dedup_ngram` but asymmetric: the
    benchmark shingle set is ~1/16 of the corpus (in practice, tiny), so
    Spark broadcasts it and the training side never shuffles — the scan,
    shingling, and probe all pipeline; the only shuffle is the final
    per-doc distinct-count. At 100 TB this is the difference between a
    full corpus self-join and a map-side lookup.
    """
    # Thin binding over operators.pipeline.decontaminate (round-5
    # extraction): the held-out pool is hash_split's test bucket
    # (md5 char 'f'), matching the oracle's is_bench predicate.
    docs = hash_split(load_table(spark, sf_dir, "documents"), "doc_id")
    return decontaminate(
        docs.filter(F.col("split") != "test"),
        docs.filter(F.col("split") == "test"),
        "doc_id",
        "text",
    )


# --------------------------------------------------------------------------
# Mixture resampling (apply the weights: deterministic replicate-and-sample)
# --------------------------------------------------------------------------


@register(
    "sample_mixture",
    oracle="""
WITH sized AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok
  FROM documents),
per_src AS (
  SELECT source, CAST(SUM(n_tok) AS DOUBLE) AS src_tokens
  FROM sized GROUP BY source),
tot AS (SELECT SUM(src_tokens) AS total, COUNT(*) AS n_sources FROM per_src),
wtd AS (
  SELECT p.source,
         (1.0 / t.n_sources) / (p.src_tokens / t.total) AS w
  FROM per_src p CROSS JOIN tot t),
cop AS (
  SELECT s.doc_id, s.source, s.n_tok,
         CAST(FLOOR(w.w) AS BIGINT)
         + CASE WHEN ('0x' || substr(md5('mix-' || CAST(s.doc_id AS VARCHAR)),
                                     1, 4))::BIGINT / 65536.0
                     < w.w - FLOOR(w.w)
                THEN 1 ELSE 0 END AS copies
  FROM sized s JOIN wtd w ON s.source = w.source),
out_tok AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs_in,
         CAST(SUM(copies) AS BIGINT) AS n_docs_out,
         CAST(SUM(copies * n_tok) AS BIGINT) AS tokens_out
  FROM cop GROUP BY source)
SELECT source, n_docs_in, n_docs_out, tokens_out,
       ROUND(tokens_out / SUM(tokens_out) OVER (), 9) AS achieved_share
FROM out_tok
""",
)
def q_sample_mixture(spark, sf_dir):
    """Apply `source_mix_weights`: deterministic replicate-and-sample to a
    uniform source mixture. Each doc gets floor(w) guaranteed copies plus
    one more when its md5-uniform u < frac(w) — so expected token share
    per source converges to 1/n_sources while membership stays
    reproducible (no rng, engine-stable).

    Scale: weights are a ~n_sources-row broadcast; the copies column is
    scan-side arithmetic; replication is explode(sequence(1, copies)) —
    here summarized per source, in an export job it would feed the
    writer directly. One real shuffle (per-source rollup). u is 16 bits
    of md5 (hex→int via conv), identical across engines.
    """
    sized = _docs_tok(spark, sf_dir).select("doc_id", "source", "n_tok")
    per_src = sized.groupBy("source").agg(
        F.sum("n_tok").cast("double").alias("src_tokens")
    )
    tot = per_src.agg(
        F.sum("src_tokens").alias("total"), F.count(F.lit(1)).alias("n_sources")
    )
    wtd = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        ((F.lit(1.0) / F.col("n_sources")) / (F.col("src_tokens") / F.col("total"))).alias("w"),
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("mix-"), F.col("doc_id").cast("string"))), 1, 4),
            16,
            10,
        ).cast("bigint")
        / 65536.0
    )
    cop = sized.join(F.broadcast(wtd), "source").withColumn(
        "copies",
        F.floor("w").cast("bigint")
        + F.when(u < F.col("w") - F.floor("w"), 1).otherwise(0),
    )
    # Explode-replication round-trip: prove the copies materialize (the
    # export path), then roll back up per source.
    rep = cop.filter(F.col("copies") > 0).select(
        "source",
        "n_tok",
        F.explode(F.sequence(F.lit(1), F.col("copies"))).alias("_i"),
    )
    out = (
        cop.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_in"),
            F.sum("copies").alias("n_docs_out"),
            F.sum(F.col("copies") * F.col("n_tok")).alias("tokens_out"),
        )
    )
    tot_out = out.agg(F.sum("tokens_out").cast("double").alias("tot_out"))
    return out.crossJoin(F.broadcast(tot_out)).select(
        "source",
        "n_docs_in",
        "n_docs_out",
        "tokens_out",
        F.round(F.col("tokens_out") / F.col("tot_out"), 9).alias(
            "achieved_share"
        ),
    )


# --------------------------------------------------------------------------
# Flagship composite: end-to-end training-data export
# --------------------------------------------------------------------------


@register(
    "pipeline_training_export",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
qual AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tok,
         CAST(COUNT(*) AS DOUBLE) / SUM(cnt) AS uniq_frac FROM (
    SELECT doc_id, token, COUNT(*) AS cnt FROM tok GROUP BY doc_id, token)
  GROUP BY doc_id),
sh AS (
  SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = 'f' AS is_bench,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(string_split(text,' ')) - 2, 0) + 1),
           i -> string_split(text,' ')[i] || ' ' ||
                string_split(text,' ')[i+1] || ' ' ||
                string_split(text,' ')[i+2]))) AS shingle
  FROM documents),
contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM sh t JOIN sh b ON t.shingle = b.shingle
  WHERE NOT t.is_bench AND b.is_bench),
kept AS (
  SELECT d.doc_id, d.source, q.n_tok,
         CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1) = 'f'
                THEN 'test'
              WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1) IN ('d','e')
                THEN 'val'
              ELSE 'train' END AS split
  FROM documents d
  JOIN qual q ON d.doc_id = q.doc_id
  WHERE q.uniq_frac >= 0.30
    AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)),
packed AS (
  SELECT split, source, doc_id, n_tok,
         CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY split, source
                                      ORDER BY doc_id)
                     - n_tok) / 512.0) AS BIGINT) AS pack_id
  FROM kept)
SELECT split, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT pack_id) AS BIGINT) AS n_packs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM packed GROUP BY split, source
""",
)
def q_pipeline_training_export(spark, sf_dir):
    """Flagship end-to-end training-data export: repetition-filter →
    benchmark-decontaminate → deterministic split → sequence-pack,
    summarized per (split, source). One Catalyst plan chains every
    stage of the corpus-preparation pipeline this module ships.

    Scale composition: the quality branch is one explode+groupBy(doc)
    shuffle; decontamination anti-joins against a broadcast benchmark
    shingle set (no corpus shuffle); the split is scan-side md5
    arithmetic; packing windows partition by (split, source) so the
    running sums stay #groups-wide parallel. Catalyst pipelines the
    filter→anti-join→window into the minimum exchanges; nothing
    collects to the driver.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    qual = (
        tok.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tok"),
            (F.count(F.lit(1)).cast("double") / F.sum("cnt")).alias(
                "uniq_frac"
            ),
        )
    )
    sh = (
        docs.withColumn("toks", F.split("text", " "))
        .withColumn("t2", F.expr("slice(toks, 2, size(toks))"))
        .withColumn("t3", F.expr("slice(toks, 3, size(toks))"))
        .withColumn(
            "is_bench",
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "f",
        )
        .select(
            "doc_id",
            "is_bench",
            F.explode(
                F.expr(
                    "array_distinct(filter("
                    "  zip_with(zip_with(toks, t2, (a, b) -> concat_ws(' ', a, b)),"
                    "           t3, (ab, c) -> IF(c IS NULL, NULL, concat_ws(' ', ab, c))),"
                    "  x -> x IS NOT NULL))"
                )
            ).alias("shingle"),
        )
    )
    bench_shingles = (
        sh.filter(F.col("is_bench")).select("shingle").distinct()
    )
    contaminated = (
        sh.filter(~F.col("is_bench"))
        .join(F.broadcast(bench_shingles), "shingle")
        .select("doc_id")
        .distinct()
    )
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    kept = (
        docs.select("doc_id", "source")
        .join(qual, "doc_id")
        .filter(F.col("uniq_frac") >= 0.30)
        .join(contaminated, "doc_id", "left_anti")
        .withColumn(
            "split",
            F.when(b == "f", "test")
            .when(b.isin("d", "e"), "val")
            .otherwise("train"),
        )
    )
    w = (
        Window.partitionBy("split", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = kept.withColumn(
        "pack_id",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(512.0)),
    )
    return packed.groupBy("split", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("pack_id").alias("n_packs"),
        F.sum("n_tok").alias("total_tokens"),
    )


# --------------------------------------------------------------------------
# Bigram-LM perplexity quality scoring
# --------------------------------------------------------------------------


@register(
    "text_perplexity",
    oracle="""
WITH tok AS (
  SELECT doc_id, token, pos FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token,
           unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
    FROM documents)),
big AS (
  SELECT doc_id, token AS w1,
         LEAD(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tok),
pairs AS (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL),
bi_cnt AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2),
uni_cnt AS (SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY w1),
v AS (SELECT COUNT(DISTINCT token) AS vocab FROM tok),
scored AS (
  SELECT p.doc_id,
         LN((b.c12 + 1.0) / (u.c1 + v.vocab)) AS lp
  FROM pairs p
  JOIN bi_cnt b ON p.w1 = b.w1 AND p.w2 = b.w2
  JOIN uni_cnt u ON p.w1 = u.w1
  CROSS JOIN v)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(-AVG(lp), 6) AS avg_neg_logprob
FROM scored GROUP BY doc_id
""",
)
def q_text_perplexity(spark, sf_dir):
    """Perplexity-style quality scoring: per-doc average negative bigram
    log-probability under the corpus's own add-one-smoothed bigram LM —
    the classic KenLM-shaped pretraining filter, self-trained so no
    external model is needed.

    Scale: bigram extraction is one zip_with per doc (no shuffle); the
    LM "training" is two count aggregates; scoring joins each doc
    bigram to its LM row on (w1, w2) — the natural-language bigram
    table is vocabulary-bounded and heavy-tailed, so the join key is
    near-uniform after AQE. Σln accumulates ~1e-16 ulp noise per term,
    so the mean is rounded to 6 dp (noise ceiling ~1e-13).
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        docs.withColumn("toks", F.split("text", " "))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "filter(zip_with(toks, slice(toks, 2, size(toks)),"
                    "  (a, b) -> IF(b IS NULL, NULL, struct(a AS w1, b AS w2))),"
                    "  x -> x IS NOT NULL)"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    bi_cnt = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni_cnt = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .agg(F.countDistinct("token").alias("vocab"))
    )
    scored = (
        pairs.join(bi_cnt, ["w1", "w2"])
        .join(uni_cnt, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log(
                (F.col("c12") + F.lit(1.0))
                / (F.col("c1") + F.col("vocab"))
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-F.avg("lp"), 6).alias("avg_neg_logprob"),
    )


_CHUNK_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents),
counted AS (
  SELECT doc_id, t, n,
         1 + (GREATEST(n - 40, 0) + 29) // 30 AS n_chunks
  FROM toks),
chunks AS (
  SELECT doc_id, UNNEST(generate_series(0, n_chunks - 1)) AS chunk_id, t, n
  FROM counted)
SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
       CAST(len(t[chunk_id * 30 + 1 : chunk_id * 30 + 40]) AS INTEGER)
         AS n_chunk_tokens,
       array_to_string(t[chunk_id * 30 + 1 : chunk_id * 30 + 40], ' ')
         AS chunk_text
FROM chunks
"""


@register("doc_chunking", oracle=_CHUNK_SQL)
def q_doc_chunking(spark, sf_dir):
    """Context-window chunking: split documents into overlapping token
    windows (40 tokens, stride 30 → 10-token overlap).

    The canonical LLM-ingest transform between cleaning and packing:
    1→N row expansion via explode(sequence(0, n_chunks−1)) + array
    slice — all JVM-side array ops on the already-tokenized column, no
    UDF, no shuffle at all (chunking is embarrassingly row-parallel; the
    output inherits the scan's partitioning). Chunk count is pure integer
    arithmetic [1 + ⌈max(n−40,0)/30⌉] so both engines agree exactly;
    trailing chunks clamp at the document end in both slice semantics.

    Thin binding over the parametric :func:`operators.tokenize.chunk_docs`
    (round-7 extraction).
    """
    from dataframe_differ_spark.operators.tokenize import chunk_docs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_docs(docs, "text", window=40, stride=30)


_WEIGHTED_SAMPLE_SQL = """
WITH scored AS (
  SELECT o_orderkey, o_totalprice,
         ROUND(-ln((CAST(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                1, 15)) AS BIGINT) AS DOUBLE) + 1.0)
                   / 1152921504606846976.0)
               / o_totalprice, 12) AS score
  FROM orders
  WHERE o_totalprice > 0)
SELECT o_orderkey, o_totalprice, score
FROM scored
ORDER BY score, o_orderkey
LIMIT 200
"""


@register("sample_weighted", oracle=_WEIGHTED_SAMPLE_SQL)
def q_sample_weighted(spark, sf_dir):
    """Deterministic weighted sampling without replacement (k smallest
    Efraimidis-Spirakis exponential keys).

    Weighted reservoir sampling à la Efraimidis-Spirakis, derandomized:
    each row's uniform draw is 60 bits of md5(key) mapped into (0, 1],
    its priority the exponential key -ln(u)/weight with the k SMALLEST
    kept (round 7: upgraded from the biased u/weight priority to the
    true E-S key, under which inclusion odds are weight-proportional).
    The sample is reproducible across engines and runs, and re-running
    on a grown table keeps previously chosen rows stable (priorities
    never change). One scan + TakeOrderedAndProject (per-partition
    top-k, tiny merge on the driver side of the exchange) — no global
    sort, the same shape that samples 100 TB with k·partitions memory.
    Parity: both the output score and the selection cut use the 12-dp
    ROUNDED key (the rounded-ln device), so a last-ulp libm difference
    cannot reorder the boundary; o_orderkey breaks ties totally.
    Non-positive weights are excluded before scoring in BOTH engines
    (round-8 ADVICE guard — a no-op on TPC-H prices, which are > 0).
    """
    from dataframe_differ_spark.operators.sampling import weighted_sample

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return weighted_sample(o, "o_orderkey", "o_totalprice", 200).select(
        "o_orderkey", "o_totalprice", "score"
    )


# --------------------------------------------------------------------------
# PII redaction (emails / IPv4), planted deterministically
# --------------------------------------------------------------------------

_PII_SQL = r"""
WITH d AS (
  SELECT doc_id, source,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
              || '.7 end' AS text
  FROM documents),
r AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER)
           AS n_emails,
         CAST(len(regexp_extract_all(text,
              '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS INTEGER)
           AS n_ips,
         regexp_replace(regexp_replace(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
              '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g')
           AS redacted
  FROM d)
SELECT doc_id, source, n_emails, n_ips,
       md5(redacted) AS redacted_md5,
       CAST(length(redacted) AS BIGINT) AS redacted_len
FROM r
"""


@register("text_pii_redact", oracle=_PII_SQL)
def q_text_pii_redact(spark, sf_dir):
    """PII redaction — the compliance pass every training corpus needs.

    Emails and IPv4 literals are planted deterministically (the synthetic
    corpus has none), then counted with regexp_extract_all and replaced
    with typed placeholder tokens. The patterns use the common subset of
    Java regex (Spark) and RE2 (DuckDB) — character classes and bounded
    repetition only, no lookaround — so both engines see identical
    matches; the oracle hashes the redacted text to keep the compared
    row narrow. Pure per-row codegen expressions: no shuffle at all, the
    operator inherits scan partitioning and scales embarrassingly.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 end"),
        ).alias("text"),
    )
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ip_re = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
    redacted = F.regexp_replace(
        F.regexp_replace("text", email_re, "<EMAIL>"), ip_re, "<IP>"
    )
    # Patterns go in as Column literals, NOT interpolated into F.expr SQL
    # text: the SQL parser unescapes '\.' to the '.' wildcard, silently
    # loosening the count patterns relative to the redaction/oracle ones
    # (round-2 advice — verified '1a2b3c4' matched the IP pattern).
    return d.select(
        "doc_id",
        "source",
        F.size(
            F.regexp_extract_all("text", F.lit(email_re), F.lit(0))
        ).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(ip_re), F.lit(0))).alias(
            "n_ips"
        ),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).cast("long").alias("redacted_len"),
    )


# --------------------------------------------------------------------------
# Bigram language-model counts (n-gram LM table build)
# --------------------------------------------------------------------------

_BIGRAM_SQL = """
WITH tok AS (
  SELECT doc_id, i AS pos, toks[i] AS w, toks[i + 1] AS w2
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
  CROSS JOIN (SELECT unnest(range(1, 4096)) AS i)
  WHERE i < len(toks)),
big AS (
  SELECT w, w2, COUNT(*) AS c_big FROM tok GROUP BY w, w2),
uni AS (
  SELECT w, CAST(SUM(c_big) AS BIGINT) AS c_uni FROM big GROUP BY w),
scored AS (
  SELECT b.w, b.w2, b.c_big, u.c_uni,
         CAST(b.c_big AS DOUBLE) / u.c_uni AS p_cond
  FROM big b JOIN uni u ON b.w = u.w)
SELECT w, w2, c_big, c_uni, ROUND(p_cond, 9) AS p_cond
FROM scored
ORDER BY c_big DESC, w, w2
LIMIT 50
"""


@register("text_bigram_lm", oracle=_BIGRAM_SQL)
def q_text_bigram_lm(spark, sf_dir):
    """Bigram LM count table (the n-gram statistics build).

    Adjacent token pairs within each document (never across documents),
    counted corpus-wide, with the conditional probability P(w2|w) from
    the bigram/unigram count ratio. The unigram denominator is derived
    by RE-AGGREGATING the bigram table (sum over w) rather than a second
    corpus pass — one corpus-wide shuffle total, then a join between two
    count tables that are both vocabulary-sized, not corpus-sized. The
    oracle's unnest(range) bound (4096) exceeds every doc length; Spark
    pairs tokens positionally with zip_with over the array and its tail
    — no posexplode of positions needed on the Spark side.
    """
    d = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split("text", " ")
    )
    pairs = d.select(
        F.explode(
            F.expr(
                "zip_with(slice(toks, 1, size(toks) - 1), "
                "slice(toks, 2, size(toks) - 1), "
                "(a, b) -> struct(a AS w, b AS w2))"
            )
        ).alias("p")
    ).select("p.w", "p.w2")
    big = pairs.groupBy("w", "w2").agg(F.count(F.lit(1)).alias("c_big"))
    uni = big.groupBy("w").agg(F.sum("c_big").alias("c_uni"))
    return (
        big.join(uni, "w")
        .select(
            "w",
            "w2",
            "c_big",
            "c_uni",
            F.round(F.col("c_big").cast("double") / F.col("c_uni"), 9).alias(
                "p_cond"
            ),
        )
        .orderBy(F.col("c_big").desc(), "w", "w2")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Incremental dedup: new batch vs existing corpus index
# --------------------------------------------------------------------------

_INCR_DEDUP_SQL = """
WITH corpus AS (
  SELECT md5(text) AS h, MIN(doc_id) AS canonical_id
  FROM documents WHERE doc_id % 10 < 8 GROUP BY md5(text)),
batch AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 >= 8),
flagged AS (
  SELECT b.doc_id, b.h, c.canonical_id,
         ROW_NUMBER() OVER (PARTITION BY b.h ORDER BY b.doc_id) AS rn
  FROM batch b LEFT JOIN corpus c ON b.h = c.h)
SELECT doc_id,
       CASE WHEN canonical_id IS NOT NULL THEN 'corpus'
            WHEN rn > 1 THEN 'batch'
            ELSE 'new' END AS dup_kind,
       canonical_id
FROM flagged
"""


@register("dedup_incremental", oracle=_INCR_DEDUP_SQL)
def q_dedup_incremental(spark, sf_dir):
    """Incremental exact dedup: a new ingest batch against the corpus index.

    The production dedup shape: the existing corpus is represented ONLY by
    its content-hash index (md5 → canonical doc id — at 100 TB this is the
    table you keep on disk, bucketed by hash; the corpus text is never
    re-read), and each incoming batch joins against the index plus itself.
    A batch doc is 'corpus' if its hash exists in the index, 'batch' if it
    repeats a hash first seen earlier in the same batch, else 'new'. The
    join key is the hash — uniform by construction, no skew — and shuffle
    width is (hash, id), independent of document size.
    """
    docs = load_table(spark, sf_dir, "documents")
    corpus = (
        docs.filter(F.col("doc_id") % 10 < 8)
        .groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("canonical_id"))
    )
    batch = docs.filter(F.col("doc_id") % 10 >= 8).select(
        "doc_id", F.md5("text").alias("h")
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    flagged = (
        batch.join(corpus, "h", "left")
        .withColumn("rn", F.row_number().over(w))
    )
    return flagged.select(
        "doc_id",
        F.when(F.col("canonical_id").isNotNull(), F.lit("corpus"))
        .when(F.col("rn") > 1, F.lit("batch"))
        .otherwise(F.lit("new"))
        .alias("dup_kind"),
        "canonical_id",
    )


# --------------------------------------------------------------------------
# Incremental NEAR-dup dedup against the persisted MinHash signature store
# (round 10, VERDICT r9 item #2 — the production day-N loop)
# --------------------------------------------------------------------------

_IMH_PERM = 12
_IMH_BANDS = 6

_IMH_SHINGLES = """
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(string_split(text,' ')) - 2, 0) + 1),
           i -> string_split(text,' ')[i] || ' ' ||
                string_split(text,' ')[i+1] || ' ' ||
                string_split(text,' ')[i+2])) AS shingles
  FROM {src}"""

_IMH_SIG = """
  SELECT doc_id, r.j,
         MIN(('0x' || substr(md5(CAST(r.j AS VARCHAR) || '~' || shingle),
                             1, 12))::BIGINT) AS s
  FROM {tok} CROSS JOIN (SELECT unnest(range({nperm})) AS j) r
  GROUP BY doc_id, r.j"""

_INCR_MH_SQL = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 < 8),
batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8
  UNION ALL
  SELECT doc_id + 300000 AS doc_id,
         array_to_string(string_split(text, ' ')[3:], ' ') AS text
  FROM documents WHERE doc_id % 10 < 8 AND doc_id % 9 = 0),
csh AS ({_IMH_SHINGLES.format(src="corpus")}),
bsh AS ({_IMH_SHINGLES.format(src="batch")}),
ctok AS (SELECT doc_id, unnest(shingles) AS shingle FROM csh),
btok AS (SELECT doc_id, unnest(shingles) AS shingle FROM bsh),
csig AS ({_IMH_SIG.format(tok="ctok", nperm=_IMH_PERM)}),
bsig AS ({_IMH_SIG.format(tok="btok", nperm=_IMH_PERM)}),
cband AS (
  SELECT doc_id AS corpus_id, j // {_IMH_PERM // _IMH_BANDS} AS band,
         string_agg(CAST(s AS VARCHAR), '-' ORDER BY j) AS bkey
  FROM csig GROUP BY doc_id, j // {_IMH_PERM // _IMH_BANDS}),
bband AS (
  SELECT doc_id AS batch_id, j // {_IMH_PERM // _IMH_BANDS} AS band,
         string_agg(CAST(s AS VARCHAR), '-' ORDER BY j) AS bkey
  FROM bsig GROUP BY doc_id, j // {_IMH_PERM // _IMH_BANDS}),
cand AS (
  SELECT DISTINCT b.batch_id, c.corpus_id
  FROM bband b JOIN cband c ON b.band = c.band AND b.bkey = c.bkey),
est AS (
  SELECT cd.batch_id, cd.corpus_id,
         AVG(CASE WHEN sb.s = sc.s THEN 1.0 ELSE 0.0 END) AS est
  FROM cand cd
  JOIN bsig sb ON sb.doc_id = cd.batch_id
  JOIN csig sc ON sc.doc_id = cd.corpus_id AND sc.j = sb.j
  GROUP BY cd.batch_id, cd.corpus_id)
SELECT batch_id, corpus_id, ROUND(est, 6) AS est_jaccard FROM est
"""


@register("dedup_incremental_persisted", oracle=_INCR_MH_SQL)
def q_dedup_incremental_persisted(spark, sf_dir):
    """Incremental NEAR-dup dedup against the PERSISTED MinHash signature
    store — the production day-N loop `dedup_incremental` (exact hashes)
    could not express: yesterday's corpus is represented ONLY by its
    signature artifact (kind ``minhash_signatures``, saved + reloaded
    through `operators.persistence` in-query, so save→load is verified
    to be identity on the index), and today's batch is signed with the
    STORED params and band-joined against band keys rebuilt from the
    loaded store — the corpus text is never re-read.

    Fixture: corpus = docs with doc_id % 10 < 8; batch = the remaining
    docs plus planted truncated twins of every 9th corpus doc
    (doc_id + 300000, first two tokens dropped) so cross matches
    provably exist. Output: every LSH candidate (batch_id, corpus_id)
    with its signature-agreement Jaccard estimate — the estimate needs
    only the store (no shingle re-read), which is exactly what makes
    the persisted index sufficient for day-N probing. Downstream either
    thresholds the estimate or fetches the two texts for exact verify
    (`dedup_near`'s cascade).

    100 TB shape: the store is a plain-parquet fact table partitioned
    by doc_id hash; signing the batch is explode → groupBy min on batch
    data only; the band join is equi on (band, bkey); the estimate
    joins 12-row signature slices of candidates only. Appending today's
    batch signatures to the store (one parquet append) completes the
    loop. Full DuckDB oracle replays the identical chain (round-trip
    identity makes the persistence hop transparent to the oracle).
    """
    from dataframe_differ_spark.operators.persistence import (
        load_artifact,
        run_scoped_artifact_path,
        save_artifact,
    )

    corpus, batch = _imh_corpus_batch(spark, sf_dir)

    # Day 0: sign the corpus and persist the store.
    store = _imh_sign(corpus, 3, _IMH_PERM)
    path = run_scoped_artifact_path("mhsig", sf_dir)
    save_artifact(
        store,
        path,
        "minhash_signatures",
        params={"num_perm": _IMH_PERM, "bands": _IMH_BANDS, "shingle_n": 3},
    )

    # Day N: load the store; all probe parameters come from the ARTIFACT
    # (probing with different params would band-join garbage — load
    # refuses a param-less store), and `expect_params` pins the
    # pipeline's own config against the store's — a store whose signing
    # params drifted from this query's constants fails LOUDLY at load
    # (round 11 param-drift contract) instead of band-joining garbage.
    art = load_artifact(
        spark,
        path,
        "minhash_signatures",
        expect_params={
            "num_perm": _IMH_PERM,
            "bands": _IMH_BANDS,
            "shingle_n": 3,
        },
    )
    num_perm = int(art.params["num_perm"])
    bands = int(art.params["bands"])
    shingle_n = int(art.params["shingle_n"])
    bsig = _imh_sign(batch, shingle_n, num_perm)
    return _imh_probe(art.df, bsig, num_perm // bands)


def _imh_corpus_batch(spark, sf_dir):
    """The shared store-loop fixture: (corpus, batch) document splits —
    corpus = doc_id % 10 < 8; batch = the rest plus planted truncated
    twins of every 9th corpus doc (doc_id + 300000, first two tokens
    dropped) so cross matches provably exist."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 < 8).select("doc_id", "text")
    planted = docs.filter(
        (F.col("doc_id") % 10 < 8) & (F.col("doc_id") % 9 == 0)
    ).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat_ws(
            " ", F.expr("slice(split(text, ' '), 3, size(split(text, ' ')))")
        ).alias("text"),
    )
    batch = (
        docs.filter(F.col("doc_id") % 10 >= 8)
        .select("doc_id", "text")
        .unionByName(planted)
    )
    return corpus, batch


def _imh_sign(df, shingle_n, num_perm):
    """Portable MinHash signatures (doc_id, j, s) of a (doc_id, text)
    frame — the signing half every store-loop query shares."""
    from dataframe_differ_spark.operators.dedup import (
        minhash_signatures,
        shingles,
    )

    sh = df.select(
        "doc_id", shingles("text", shingle_n).alias("_pp_sh")
    ).filter(F.size("_pp_sh") > 0)
    return minhash_signatures(
        sh, "doc_id", "_pp_sh", num_perm=num_perm, portable=True
    )


def _imh_probe(store_df, bsig, rpb):
    """LSH-probe batch signatures against a signature store: band keys
    on both sides → candidate pairs → signature-agreement Jaccard
    estimate. Needs ONLY the two signature tables (no text re-read) —
    the property that makes the persisted index sufficient for day-N
    probing."""

    def band_keys(sigs, out_id):
        return sigs.groupBy(
            F.col("doc_id").alias(out_id),
            (F.col("j") / rpb).cast("int").alias("band"),
        ).agg(
            F.expr(
                "concat_ws('-', transform(array_sort(collect_list(struct(j, s))), "
                "x -> cast(x.s as string)))"
            ).alias("bkey")
        )

    cband = band_keys(store_df, "corpus_id")
    bband = band_keys(bsig, "batch_id").withColumnRenamed("bkey", "_pp_bk")
    cand = (
        bband.join(
            cband,
            (bband["band"] == cband["band"])
            & (F.col("_pp_bk") == F.col("bkey")),
        )
        .select("batch_id", "corpus_id")
        .distinct()
    )
    sb = bsig.select(
        F.col("doc_id").alias("batch_id"), "j", F.col("s").alias("_pp_sb")
    )
    sc = store_df.select(
        F.col("doc_id").alias("corpus_id"),
        F.col("j").alias("_pp_jc"),
        F.col("s").alias("_pp_sc"),
    )
    return (
        cand.join(sb, "batch_id")
        .join(sc, (F.col("_pp_jc") == F.col("j")) & (sc["corpus_id"] == cand["corpus_id"]))
        .groupBy(cand["batch_id"], cand["corpus_id"])
        .agg(
            F.avg(
                F.when(F.col("_pp_sb") == F.col("_pp_sc"), F.lit(1.0)).otherwise(
                    0.0
                )
            ).alias("_pp_est")
        )
        .select(
            "batch_id", "corpus_id", F.round("_pp_est", 6).alias("est_jaccard")
        )
    )


# --------------------------------------------------------------------------
# Blocklist filter (wordlist screening with survival rates)
# --------------------------------------------------------------------------

_BLOCKLIST = ["slow", "error", "fail", "crash", "panic"]

_BLOCKLIST_SQL = f"""
WITH hits AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split(text, ' '),
              t -> list_contains({_BLOCKLIST!r}, t))) AS BIGINT) AS n_hits,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_hits = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clean,
       ROUND(CAST(SUM(CASE WHEN n_hits = 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 9) AS survival_rate,
       CAST(SUM(n_hits) AS BIGINT) AS total_hits
FROM hits GROUP BY source
"""


@register("text_blocklist_filter", oracle=_BLOCKLIST_SQL)
def q_text_blocklist_filter(spark, sf_dir):
    """Blocklist screening with per-source survival rates.

    The wordlist-filter pass (toxicity/spam screens take this exact
    shape): per-token membership against a broadcast-literal blocklist
    via an array HOF — the blocklist rides inside the expression, no join
    — then one tiny per-source rollup of survival. At 100 TB a real
    blocklist (10⁴–10⁶ terms) would broadcast as a table and the
    membership test becomes a left-semi explode-join; the survival
    aggregate is unchanged. Filter decision stays per-row/codegen.
    """
    bl = ", ".join(f"'{w}'" for w in _BLOCKLIST)
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        F.size(
            F.expr(
                f"filter(split(text, ' '), t -> array_contains(array({bl}), t))"
            )
        )
        .cast("long")
        .alias("n_hits"),
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_hits") == 0).cast("bigint")).alias("n_clean"),
        F.round(
            F.sum((F.col("n_hits") == 0).cast("double")) / F.count(F.lit(1)), 9
        ).alias("survival_rate"),
        F.sum("n_hits").alias("total_hits"),
    )


# --------------------------------------------------------------------------
# BPE merge-candidate counting (one training iteration's heavy step)
# --------------------------------------------------------------------------


@register(
    "bpe_pair_counts",
    oracle="""
WITH words AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word),
syms AS (
  SELECT freq,
         list_append(list_transform(range(1, length(word) + 1),
                                    i -> word[i]), '</w>') AS s
  FROM words),
pairs AS (
  SELECT s[i] AS left_sym, s[i + 1] AS right_sym, freq
  FROM syms, unnest(range(1, len(s))) AS u(i)),
agg AS (
  SELECT left_sym, right_sym, CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM pairs GROUP BY left_sym, right_sym)
SELECT left_sym, right_sym, pair_count
FROM agg ORDER BY pair_count DESC, left_sym, right_sym LIMIT 20
""",
)
def q_bpe_pair_counts(spark, sf_dir):
    """BPE training, the distributed step: adjacent-symbol pair counts
    over the corpus (Sennrich et al. 2016) — the top pair is the next
    merge rule a byte-pair-encoding tokenizer would learn.

    The classic BPE efficiency trick carries the plan: counting runs on
    the WORD FREQUENCY table (one corpus shuffle to build, then the
    corpus never re-scans per iteration), each word exploding into its
    character+end-marker symbol sequence whose adjacent pairs are
    weighted by word frequency. Characters come from an explicit
    substring transform — identical in both engines, unlike
    empty-separator splits — so the pair table is hash-exact and the
    top-20 merge candidates (full tiebreak) form the oracle. At 100 TB
    the pair aggregate is vocabulary-sized, combines map-side, and the
    top-20 is TakeOrdered — never a full sort.

    Thin binding over the parametric
    :func:`operators.tokenize.bpe_pair_stats` (round-7 extraction).
    """
    from dataframe_differ_spark.operators.tokenize import bpe_pair_stats

    docs = load_table(spark, sf_dir, "documents")
    return bpe_pair_stats(docs, "text", end_of_word="</w>", top_k=20)


@register(
    "batch_length_grouped",
    oracle="""
WITH sized AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents),
rk AS (
  SELECT n_tok, ROW_NUMBER() OVER (ORDER BY n_tok, doc_id) AS r
  FROM sized),
b AS (
  SELECT CAST(CEIL(CAST(r AS DOUBLE) / 32) AS INTEGER) AS batch_id, n_tok
  FROM rk)
SELECT batch_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(n_tok) AS min_tokens,
       MAX(n_tok) AS max_tokens,
       CAST(MAX(n_tok) * COUNT(*) - SUM(n_tok) AS BIGINT) AS padding_waste
FROM b GROUP BY batch_id
""",
)
def q_batch_length_grouped(spark, sf_dir):
    """Length-grouped batching: sort docs by token length, cut batches of
    32, report each batch's padding waste (rows padded to the batch max —
    the tokens a training step burns on pad).

    The dynamic-batching prep step: length-sorted batches make the waste
    per batch max(len)−len ≈ 0, vs arrival-order batching where every
    batch pays up to the global length spread. The global length sort is
    the two-phase distributed rank (operators.ranks — boundary sketch +
    bucketed window, no single-partition Window), exactly the production
    shape: at 100 TB you'd follow it with repartitionByRange(batch_id)
    on write so each training shard holds contiguous batches.
    """
    from dataframe_differ_spark.operators.ranks import ranked

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    r = ranked(sized, F.col("n_tok"), ["n_tok", "doc_id"], rank_col="r")
    b = r.select(
        F.ceil(F.col("r") / 32).cast("int").alias("batch_id"), "n_tok"
    )
    return b.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tok").alias("min_tokens"),
        F.max("n_tok").alias("max_tokens"),
        (F.max("n_tok") * F.count(F.lit(1)) - F.sum("n_tok"))
        .cast("long")
        .alias("padding_waste"),
    )


# DSIR importance resampling (Xie et al. 2023, arXiv:2302.03169): weight
# raw docs by how target-like their hashed-ngram distribution is. 1024
# hash buckets, Laplace-smoothed unigram-of-bigrams LMs.
_DSIR_BUCKETS = 1024
_DSIR_TARGET = "('src0', 'src1')"

_DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, source,
         -- both engines cap at 200 words (corpus max is 100) so the
         -- bigram enumeration bound below stays symmetric on any corpus
         list_filter(string_split(text, ' '), x -> x <> '')[1:200] AS t
  FROM documents),
bigrams AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(t[i] || '_' || t[i + 1]), 1, 12))::BIGINT
           % {_DSIR_BUCKETS} AS b
  FROM toks CROSS JOIN (SELECT unnest(range(1, 200)) AS i)
  WHERE i < len(t)),
doc_counts AS (
  SELECT doc_id, source, b, CAST(COUNT(*) AS BIGINT) AS c
  FROM bigrams GROUP BY doc_id, source, b),
tgt AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM bigrams
  WHERE source IN {_DSIR_TARGET} GROUP BY b),
raw AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS cs FROM bigrams GROUP BY b),
tot AS (
  SELECT (SELECT CAST(SUM(ct) AS BIGINT) FROM tgt) AS nt,
         (SELECT CAST(SUM(cs) AS BIGINT) FROM raw) AS ns),
lr AS (
  SELECT raw.b,
         ln((COALESCE(tgt.ct, 0) + 1.0) / (tot.nt + {_DSIR_BUCKETS}.0))
         - ln((raw.cs + 1.0) / (tot.ns + {_DSIR_BUCKETS}.0)) AS lw
  FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tot),
w AS (
  SELECT dc.doc_id, dc.source,
         list_reduce(list_prepend(0.0, list(dc.c * lr.lw ORDER BY dc.b)),
                     (a, x) -> a + x) AS logw
  FROM doc_counts dc JOIN lr ON dc.b = lr.b
  GROUP BY dc.doc_id, dc.source)
SELECT doc_id, source, ROUND(logw, 6) AS log_importance
FROM w
ORDER BY ROUND(logw, 6) DESC, doc_id LIMIT 100
"""


@register("sample_dsir_importance", oracle=_DSIR_SQL)
def q_sample_dsir_importance(spark, sf_dir):
    """DSIR: data selection by importance resampling (hashed-ngram LMs).

    The domain-targeting selection stage of a pretraining pipeline (Xie
    et al. 2023): estimate a target LM (docs from the target sources) and
    a raw-corpus LM over 1024 hashed-bigram buckets (Laplace-smoothed),
    weight every raw doc by its log importance ratio
    sum_b c_doc(b) * (ln p_target(b) - ln p_raw(b)), and keep the most
    target-like docs. Deterministic top-100 here (the stochastic variant
    composes this weight with `sample_weighted`'s Efraimidis-Spirakis
    keys). At 100 TB: the two LMs are 1024-row broadcast tables built by
    one map-side-combinable pass; per-doc weights are one hash-bucket
    join + groupBy(doc) — no shuffle beyond the doc key; selection is
    TakeOrdered, not a global window.

    Parity: counts are exact integers, the 2048 ln calls happen once in
    the tiny LR table, the per-doc sum is a sequential fold in bucket
    order, and BOTH the output value and the top-100 cut use the 6-dp
    ROUNDED weight so a last-ulp ln difference cannot reorder the
    boundary.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source",
        F.expr("slice(filter(split(text, ' '), x -> x != ''), 1, 200)").alias(
            "t"
        ),
    )
    bigrams = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1), "
                "(a, b) -> concat(a, '_', b))"
            )
        ).alias("bg"),
    ).select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5("bg"), 1, 12), 16, 10).cast("long")
            % _DSIR_BUCKETS
        ).alias("b"),
    )
    # The bigram stream feeds three aggregations; materialize it once.
    bigrams = bigrams.localCheckpoint(eager=False)
    doc_counts = bigrams.groupBy("doc_id", "source", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    tgt = (
        bigrams.filter(F.col("source").isin("src0", "src1"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    raw = bigrams.groupBy("b").agg(F.count(F.lit(1)).alias("cs"))
    nt = tgt.agg(F.sum("ct").alias("nt"))
    ns = raw.agg(F.sum("cs").alias("ns"))
    lr = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(ns))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
                    / (F.col("nt") + float(_DSIR_BUCKETS))
                )
                - F.log(
                    (F.col("cs") + 1.0) / (F.col("ns") + float(_DSIR_BUCKETS))
                )
            ).alias("lw"),
        )
    )
    terms = doc_counts.join(F.broadcast(lr), "b").withColumn(
        "term", F.col("c") * F.col("lw")
    )
    wrun = (
        Window.partitionBy("doc_id")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w = (
        terms.withColumn("s", F.sum("term").over(wrun))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.col("b").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            "doc_id", "source", F.round("s", 6).alias("log_importance")
        )
    )
    return w.orderBy(F.col("log_importance").desc(), "doc_id").limit(100)


# BPE training, two unrolled merge rounds. The merge APPLY is the
# boundary-safe token fold (round 8): list_reduce over the '|'-split
# symbols with a leading-sentinel string accumulator — a symbol x = b
# merges iff the accumulator ends with '|'+a, i.e. the previous SYMBOL
# is exactly a, so merges can't match across multi-char symbol
# boundaries (the old replace('a|b' -> 'ab') corrupted s|l|ob into
# s|lob for merge (l,o)). Same fold as operators/tokenize._bpe_apply.


def _bpe_apply_sql(s: str, a: str, b: str) -> str:
    """DuckDB twin of operators/tokenize._bpe_apply's token fold."""
    return (
        f"substr(list_reduce(list_prepend('', string_split({s}, '|')), "
        f"(acc, x) -> CASE WHEN x = {b} AND "
        f"right(acc, length({a}) + 1) = '|' || {a} "
        f"THEN substr(acc, 1, length(acc) - length({a}) - 1) "
        f"|| '|' || {a} || {b} "
        f"ELSE acc || '|' || x END), 2)"
    )


_BPE_TRAIN_SQL = f"""
WITH words AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
          AS w FROM documents)
  GROUP BY w),
s0 AS (
  SELECT w, freq,
         array_to_string(list_transform(range(1, length(w) + 1),
                                        i -> substr(w, i, 1)), '|') AS s
  FROM words),
p0 AS (
  SELECT t[i] AS a, t[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (SELECT freq, string_split(s, '|') AS t FROM s0)
  -- data-derived position spine (ADVICE r9: a fixed 1..59 silently
  -- undercounts pairs for 61+-char words; Spark scans every adjacency)
  CROSS JOIN (SELECT unnest(range(1, (SELECT MAX(len(string_split(s, '|')))
                                      FROM s0))) AS i)
  WHERE i < len(t)
  GROUP BY t[i], t[i + 1]),
m1 AS (SELECT a, b, cnt FROM p0 ORDER BY cnt DESC, a, b LIMIT 1),
s1 AS (
  SELECT s0.w, s0.freq,
         {_bpe_apply_sql('s0.s', 'm1.a', 'm1.b')} AS s
  FROM s0 CROSS JOIN m1),
p1 AS (
  SELECT t[i] AS a, t[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (SELECT freq, string_split(s, '|') AS t FROM s1)
  -- data-derived position spine (ADVICE r9: a fixed 1..59 silently
  -- undercounts pairs for 61+-char words; Spark scans every adjacency)
  CROSS JOIN (SELECT unnest(range(1, (SELECT MAX(len(string_split(s, '|')))
                                      FROM s1))) AS i)
  WHERE i < len(t)
  GROUP BY t[i], t[i + 1]),
m2 AS (SELECT a, b, cnt FROM p1 ORDER BY cnt DESC, a, b LIMIT 1),
s2 AS (
  SELECT s1.w, s1.freq,
         {_bpe_apply_sql('s1.s', 'm2.a', 'm2.b')} AS s
  FROM s1 CROSS JOIN m2),
tok0 AS (SELECT CAST(SUM(freq * len(string_split(s, '|'))) AS BIGINT) AS n
         FROM s0),
tok1 AS (SELECT CAST(SUM(freq * len(string_split(s, '|'))) AS BIGINT) AS n
         FROM s1),
tok2 AS (SELECT CAST(SUM(freq * len(string_split(s, '|'))) AS BIGINT) AS n
         FROM s2)
SELECT 1 AS merge_rank, m1.a AS left_sym, m1.b AS right_sym,
       m1.cnt AS pair_count, tok1.n AS corpus_tokens_after
FROM m1 CROSS JOIN tok1
UNION ALL
SELECT 2 AS merge_rank, m2.a AS left_sym, m2.b AS right_sym,
       m2.cnt AS pair_count, tok2.n AS corpus_tokens_after
FROM m2 CROSS JOIN tok2
UNION ALL
SELECT 0 AS merge_rank, '' AS left_sym, '' AS right_sym,
       CAST(0 AS BIGINT) AS pair_count, tok0.n AS corpus_tokens_after
FROM tok0
"""


@register("bpe_train_merges", oracle=_BPE_TRAIN_SQL)
def q_bpe_train_merges(spark, sf_dir):
    """BPE tokenizer TRAINING: two full merge rounds, fully relational.

    Completes the tokenizer-training story (`bpe_pair_counts` is one
    round of pair statistics; `text_tokenize_greedy` is inference):
    count weighted adjacent-symbol pairs -> argmax (count desc, pair asc)
    -> apply the merge corpus-wide -> recount -> second merge, reporting
    each merge and the corpus token count it achieves (row 0 = the
    pre-merge baseline). Dictionary-encoded like the tokenizer: symbol
    strings live on DISTINCT words with their corpus frequencies, so
    each round is a vocabulary-sized scan + one global 1-row argmax
    aggregate (broadcast back), never a corpus rescan — at 100 TB the
    word histogram is built once (the shape of every real BPE trainer)
    and each of the ~50k merge rounds costs vocabulary work only.

    The merge apply is the boundary-safe token fold (round-8 ADVICE
    fix; see operators/tokenize._bpe_apply) — identical ``aggregate``/
    ``list_reduce`` expression in both engines. All counts exact
    integers.

    Thin binding over the parametric :func:`operators.tokenize.train_bpe`
    (round-7 extraction) — the n-round trainer with lineage
    checkpointing; the oracle pins the 2-round unrolled form.
    """
    from dataframe_differ_spark.operators.tokenize import train_bpe

    docs = load_table(spark, sf_dir, "documents")
    return train_bpe(docs, "text", n_merges=2)


# WordPiece training (round 9): the BPE chain with the LIKELIHOOD merge
# criterion — per round, argmax of count(ab) / (count(a)·count(b))
# (Schuster & Nakajima 2012) instead of raw count. Counts are exact
# BIGINTs; the score is one division of exactly-converted doubles
# (no libm), identical in both engines, ties broken (a, b) asc.


def _wp_round_sql(t: int) -> str:
    """CTE block: WordPiece round ``t`` — pair + unigram counts over
    ``s{t - 1}``, likelihood argmax ``m{t}``, merge apply ``s{t}``."""
    p = t - 1
    return f"""
p{t} AS (
  -- position spine sized from the DATA (max token count of s{p}), not a
  -- fixed constant: a 61+-char word would silently fall off a hard-coded
  -- 1..59 scan (ADVICE r9); Spark's side scans every adjacency by
  -- construction, so the oracle must too.
  SELECT t[i] AS a, t[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (SELECT freq, string_split(s, '|') AS t FROM s{p})
  CROSS JOIN (SELECT unnest(range(1, (SELECT MAX(len(string_split(s, '|')))
                                      FROM s{p}))) AS i)
  WHERE i < len(t)
  GROUP BY t[i], t[i + 1]),
u{t} AS (
  SELECT sym, CAST(SUM(freq) AS BIGINT) AS c1
  FROM (SELECT unnest(string_split(s, '|')) AS sym, freq FROM s{p})
  GROUP BY sym),
m{t} AS (
  SELECT p.a, p.b, p.cnt,
         CAST(p.cnt AS DOUBLE) /
           (CAST(ua.c1 AS DOUBLE) * CAST(ub.c1 AS DOUBLE)) AS score
  FROM p{t} p
  JOIN u{t} ua ON ua.sym = p.a
  JOIN u{t} ub ON ub.sym = p.b
  ORDER BY score DESC, p.a, p.b LIMIT 1),
s{t} AS (
  SELECT s{p}.w, s{p}.freq,
         {{apply}} AS s
  FROM s{p} CROSS JOIN m{t}),
tok{t} AS (SELECT CAST(SUM(freq * len(string_split(s, '|'))) AS BIGINT) AS n
           FROM s{t})"""


_WP_TRAIN_SQL = (
    """
WITH words AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
          AS w FROM documents)
  GROUP BY w),
s0 AS (
  SELECT w, freq,
         array_to_string(list_transform(range(1, length(w) + 1),
                                        i -> substr(w, i, 1)), '|') AS s
  FROM words),
tok0 AS (SELECT CAST(SUM(freq * len(string_split(s, '|'))) AS BIGINT) AS n
         FROM s0),"""
    + _wp_round_sql(1).format(apply=_bpe_apply_sql("s0.s", "m1.a", "m1.b"))
    + ","
    + _wp_round_sql(2).format(apply=_bpe_apply_sql("s1.s", "m2.a", "m2.b"))
    + """
SELECT 1 AS merge_rank, m1.a AS left_sym, m1.b AS right_sym,
       m1.cnt AS pair_count, m1.score, tok1.n AS corpus_tokens_after
FROM m1 CROSS JOIN tok1
UNION ALL
SELECT 2, m2.a, m2.b, m2.cnt, m2.score, tok2.n
FROM m2 CROSS JOIN tok2
UNION ALL
SELECT 0, '', '', CAST(0 AS BIGINT), 0.0, tok0.n FROM tok0
"""
)


@register("wordpiece_train_merges", oracle=_WP_TRAIN_SQL)
def q_wordpiece_train_merges(spark, sf_dir):
    """WordPiece tokenizer TRAINING: two merge rounds under the
    LIKELIHOOD criterion — each round merges the pair maximizing
    count(ab) / (count(a)·count(b)), preferring pairs that co-occur
    beyond what their unigram frequencies predict (the criterion that
    separates WordPiece from BPE's raw-count argmax).

    Completes the trainer triad's training side: `bpe_train_merges`
    (count argmax), this (likelihood argmax), `unigram_train_vocab`
    (EM pruning) — with `text_tokenize_greedy` as the WordPiece apply.
    Same dictionary-encoded plan as BPE plus one unigram-count
    aggregate per round (vocab-sized, broadcast into the score join);
    the merge apply is the shared boundary-safe token fold. The score
    ships unrounded: exact-integer inputs, one IEEE division, no libm.
    Thin binding over :func:`operators.tokenize.train_wordpiece`.
    """
    from dataframe_differ_spark.operators.tokenize import train_wordpiece

    docs = load_table(spark, sf_dir, "documents")
    return train_wordpiece(docs, "text", n_merges=2)


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer training + apply (round 9, VERDICT r8 item #2 —
# completes the BPE / WordPiece / Unigram trainer triad). The oracle
# replays the deterministic Viterbi-EM exactly: the DP is a recursive CTE
# over character positions carrying the best-score/backpointer list (the
# kalman/CUSUM recursion device), candidate pieces iterate j-ascending
# with strict improvement so score ties break toward the longest last
# piece in BOTH engines, and every log-prob is round(ln(cnt/total), 12)
# (the libm-taint device) so path scores are bit-identical sums.
# ---------------------------------------------------------------------------

_UG_L = 4          # max piece length (chars)
_UG_SEED = 64      # seed multi-char pieces
_UG_VOCAB = 32     # final multi-char pieces
_UG_ITERS = 2      # EM iterations
_UG_MAXW = 16      # training word-length cap

def _ug_vocab_cached(spark, sf_dir):
    """The trained unigram vocabulary, built ONCE per (session, sf_dir):
    `unigram_train_vocab`, `unigram_apply_segment` and
    `unigram_vocab_persisted` all train the IDENTICAL model (same
    corpus, same hyperparameters), and the EM chain was each binding's
    dominant cost (round-10 session-cache application)."""
    import os

    from dataframe_differ_spark.operators.session_cache import session_cached
    from dataframe_differ_spark.operators.tokenize import train_unigram

    def build():
        docs = load_table(spark, sf_dir, "documents")
        return train_unigram(
            docs,
            "text",
            max_piece_len=_UG_L,
            seed_multi=_UG_SEED,
            vocab_multi=_UG_VOCAB,
            n_iters=_UG_ITERS,
            max_word_len=_UG_MAXW,
        )

    (vocab,) = session_cached(
        spark, ("unigram_vocab", os.path.abspath(sf_dir)), build
    )
    return vocab




def _ug_best_sql() -> str:
    """Best candidate struct at position ``v.i + 1``: piece lengths
    k = L..1, i.e. start j ascending, strict improvement → score ties
    break toward the SMALLEST j (longest last piece), same as the Spark
    fold and the Python reference.

    Candidate scores are PLAIN projections over ``v.dp`` — deliberately
    NO lambda indexes the outer list column: DuckDB 1.0 misbinds
    ``list_transform(e.cs, c -> v.dp[c.j + 1] ...)`` under vectorized
    recursive-CTE evaluation (many rows per step silently read another
    row's dp; reproduced at sf0.01, invisible in single-word repros).
    The ``j >= 0`` guard must precede the dp index: DuckDB's negative
    list indexes wrap from the END."""
    ents = []
    for k in range(_UG_L, 0, -1):
        ck = (
            f"CASE WHEN e.lp{k} IS NOT NULL AND v.i + 1 - {k} >= 0 "
            f"AND v.dp[v.i + 2 - {k}].s > CAST(-1e17 AS DOUBLE) "
            f"THEN v.dp[v.i + 2 - {k}].s + e.lp{k} END"
        )
        ents.append(
            f"struct_pack(s := {ck}, bp := CAST(v.i + 1 - {k} AS BIGINT))"
        )
    cand = "[" + ", ".join(ents) + "]"
    return (
        "list_reduce(list_prepend("
        "struct_pack(s := CAST(-1e18 AS DOUBLE), bp := CAST(-1 AS BIGINT)), "
        f"{cand}), "
        "(a, x) -> CASE WHEN x.s IS NOT NULL AND x.s > a.s THEN x ELSE a END)"
    )


def _ug_vit_sql(tag: str, vocab: str) -> str:
    """CTE block: Viterbi DP + backtrack of every word under ``vocab``
    (piece, lp) → ``bt{tag}(w, pos, piece)`` rows, one piece per row,
    ``pos`` = the piece's 0-based start (so ORDER BY pos reassembles).
    Candidate log-probs pivot to one column per piece length
    (``lp1..lpL``) so the recursion's best-candidate expression needs no
    list-of-candidates lambda (see :func:`_ug_best_sql`)."""
    slots = ",\n         ".join(
        f"MAX(CASE WHEN c.i - c.j = {k} THEN v.lp END) AS lp{k}"
        for k in range(1, _UG_L + 1)
    )
    return f"""
ed{tag} AS MATERIALIZED (
  SELECT c.w, c.i,
         {slots}
  FROM cands c JOIN {vocab} v USING (piece)
  GROUP BY c.w, c.i),
vit{tag}(w, i, dp) AS (
  SELECT w, CAST(0 AS BIGINT),
         [struct_pack(s := CAST(0.0 AS DOUBLE), bp := CAST(0 AS BIGINT))]
  FROM words2
  UNION ALL
  SELECT v.w, v.i + 1, list_append(v.dp, {_ug_best_sql()})
  FROM vit{tag} v
  JOIN words2 ww ON ww.w = v.w
  JOIN ed{tag} e ON e.w = v.w AND e.i = v.i + 1
  WHERE v.i < length(ww.w)),
dpw{tag} AS MATERIALIZED (
  SELECT v.w, v.dp FROM vit{tag} v JOIN words2 ww ON ww.w = v.w
  WHERE v.i = length(ww.w)),
bt{tag}(w, pos, piece) AS (
  SELECT w, CAST(length(w) AS BIGINT), CAST(NULL AS VARCHAR) FROM dpw{tag}
  UNION ALL
  SELECT b.w, d.dp[b.pos + 1].bp,
         substr(b.w, CAST(d.dp[b.pos + 1].bp + 1 AS INTEGER),
                CAST(b.pos - d.dp[b.pos + 1].bp AS INTEGER))
  FROM bt{tag} b JOIN dpw{tag} d ON d.w = b.w
  WHERE b.pos > 0)"""


def _ug_mstep_sql(t: int) -> str:
    """CTE block: M-step t — piece counts from ``bt{t}`` (+1 Laplace on
    single chars), zero-count multis pruned, relogged → ``v{t}``."""
    return f"""
cnt{t} AS (
  SELECT b.piece, CAST(SUM(ww.freq) AS BIGINT) AS raw
  FROM bt{t} b JOIN words2 ww ON ww.w = b.w
  WHERE b.piece IS NOT NULL
  GROUP BY b.piece),
v{t}c AS MATERIALIZED (
  SELECT p.piece,
         CAST(COALESCE(c.raw, 0) +
              CASE WHEN length(p.piece) = 1 THEN 1 ELSE 0 END AS BIGINT) AS cnt
  FROM v{t - 1} p LEFT JOIN cnt{t} c USING (piece)
  WHERE COALESCE(c.raw, 0) +
        CASE WHEN length(p.piece) = 1 THEN 1 ELSE 0 END > 0),
tt{t} AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM v{t}c),
v{t} AS MATERIALIZED (
  SELECT piece, ROUND(LN(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)), 12) AS lp
  FROM v{t}c CROSS JOIN tt{t})"""


_UG_PRELUDE = f"""
words2 AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        FROM documents)
  WHERE length(w) <= {_UG_MAXW}
  GROUP BY w),
cands AS MATERIALIZED (
  SELECT w, freq, a - 1 AS j, b AS i,
         substr(w, CAST(a AS INTEGER), CAST(b - a + 1 AS INTEGER)) AS piece
  FROM words2,
       unnest(range(1, length(w) + 1)) AS ua(a),
       unnest(range(1, {_UG_MAXW} + 1)) AS ub(b)
  WHERE b >= a AND b - a + 1 <= {_UG_L} AND b <= length(w)),
pf AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS pfreq FROM cands GROUP BY piece),
seed AS (
  SELECT piece, pfreq FROM pf WHERE length(piece) = 1
  UNION ALL
  SELECT piece, pfreq FROM (
    SELECT piece, pfreq FROM pf WHERE length(piece) >= 2
    ORDER BY pfreq DESC, piece LIMIT {_UG_SEED})),
t0 AS (SELECT CAST(SUM(pfreq) AS BIGINT) AS total FROM seed),
v0 AS MATERIALIZED (
  SELECT piece,
         ROUND(LN(CAST(pfreq AS DOUBLE) / CAST(total AS DOUBLE)), 12) AS lp
  FROM seed CROSS JOIN t0),
{",".join(_ug_vit_sql(str(t), f"v{t - 1}") + "," + _ug_mstep_sql(t)
          for t in range(1, _UG_ITERS + 1))},
fs AS (SELECT piece, cnt FROM v{_UG_ITERS}c WHERE length(piece) = 1),
fm AS (SELECT piece, cnt FROM (
  SELECT piece, cnt FROM v{_UG_ITERS}c WHERE length(piece) >= 2
  ORDER BY cnt DESC, piece LIMIT {_UG_VOCAB})),
fin AS (SELECT * FROM fs UNION ALL SELECT * FROM fm),
ftt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM fin)"""

_UG_TRAIN_SQL = f"""
WITH RECURSIVE
{_UG_PRELUDE}
SELECT piece, cnt AS expected_count,
       ROUND(LN(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)), 12) AS logp,
       length(piece) = 1 AS is_single
FROM fin CROSS JOIN ftt
"""


@register("unigram_train_vocab", oracle=_UG_TRAIN_SQL)
def q_unigram_train_vocab(spark, sf_dir):
    """Unigram-LM tokenizer TRAINING (Kudo 2018 — the SentencePiece
    algorithm), deterministic Viterbi-EM over the corpus word histogram:
    seed vocabulary of all ≤4-char substrings (all singles + top-64
    multis), 2 EM iterations (E: Viterbi-best segmentation per distinct
    word; M: expected counts, +1 Laplace on singles, zero-count multis
    pruned), final prune to all singles + top-32 multis, renormalized
    log-probs.

    Completes the trainer triad (`bpe_train_merges`, WordPiece via
    `text_tokenize_greedy`): these are the three canonical subword
    algorithms a Llama/T5-style pipeline reproduces on-cluster. Scale
    shape per operators/tokenize.train_unigram: ONE corpus shuffle for
    the histogram, then vocabulary-sized EM (broadcast vocab joins,
    nested `aggregate` HOF Viterbi DP — no UDFs, no collect). Oracle:
    full recursive-CTE replay of the DP + backtrack, hash-exact
    including 12-dp log-probs; pure-Python EM reference in
    tests/test_operator_properties_r9.py triangulates all three.
    """
    return _ug_vocab_cached(spark, sf_dir)


# Shared CTE chain: train replay -> final vocab -> Viterbi segmentation of
# the word histogram, ending in `segf(word, freq, seg, n_pieces)` — the
# apply oracle SELECTs it verbatim; the fertility oracle aggregates it.
_UG_SEG_CTES = f"""
{_UG_PRELUDE},
vfinal AS MATERIALIZED (
  SELECT piece, ROUND(LN(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)), 12) AS lp
  FROM fin CROSS JOIN ftt),
{_ug_vit_sql("f", "vfinal")},
segf AS (
  SELECT b.w AS word, ww.freq,
         COALESCE(array_to_string(list(b.piece ORDER BY b.pos)
                                  FILTER (WHERE b.piece IS NOT NULL), '|'),
                  '') AS seg,
         CAST(COUNT(b.piece) AS BIGINT) AS n_pieces
  FROM btf b JOIN words2 ww USING (w)
  GROUP BY b.w, ww.freq)"""

_UG_APPLY_SQL = f"""
WITH RECURSIVE {_UG_SEG_CTES}
SELECT word, freq, seg, n_pieces FROM segf
"""


@register("unigram_apply_segment", oracle=_UG_APPLY_SQL)
def q_unigram_apply_segment(spark, sf_dir):
    """Unigram tokenizer APPLY: Viterbi-segment the corpus word
    histogram under the `unigram_train_vocab` vocabulary → per distinct
    word its frequency, '|'-joined forward segmentation, and piece
    count — the inference half (what `bpe_apply_merges` is to
    `bpe_train_merges`).

    Train and apply share one lazy plan (the trained vocab flows in as
    a broadcast, never collected); at 100 TB the segmentation is a
    dictionary-encoded map-side join — the corpus is only rescanned if
    the caller re-expands words to documents. Oracle: the training
    replay plus one more recursive-CTE Viterbi pass under the final
    renormalized vocabulary.
    """
    from dataframe_differ_spark.operators.tokenize import unigram_segment

    docs = load_table(spark, sf_dir, "documents")
    vocab = _ug_vocab_cached(spark, sf_dir)
    seg = unigram_segment(
        docs, "text", vocab, max_piece_len=_UG_L, max_word_len=_UG_MAXW
    )
    return seg.select(
        "word", "freq", "seg", F.col("n_pieces").cast("long").alias("n_pieces")
    )


_NEYMAN_SQL = f"""
WITH c AS (
  SELECT o_orderkey, o_orderpriority AS stratum,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
m AS (
  SELECT stratum, CAST(COUNT(*) AS BIGINT) AS nh,
         CAST(SUM(cents) AS DECIMAL(38,0)) AS s1,
         CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS DECIMAL(38,0))
           AS s2
  FROM c GROUP BY stratum),
w AS (
  -- round 7: moments convert via the shared split-cast device
  -- (operators/numeric.py); the s1*s1 product reuses the converted
  -- double (no implicit decimal->double promotion).
  SELECT stratum, nh,
         nh * sqrt(({_split_sql('s2')}
                    - {_split_sql('s1')} * {_split_sql('s1')} / nh)
                   / nh) AS wh
  FROM m),
tot AS (
  SELECT list_reduce(list_prepend(0.0, list(wh ORDER BY stratum)),
                     (a, x) -> a + x) AS t
  FROM w),
alloc AS (
  SELECT w.stratum, w.nh,
         CAST(FLOOR(1000.0 * w.wh / tot.t) AS BIGINT) AS n_alloc
  FROM w CROSS JOIN tot),
ranked AS (
  SELECT c.o_orderkey, c.stratum, alloc.nh, alloc.n_alloc,
         ROW_NUMBER() OVER (PARTITION BY c.stratum
                            ORDER BY md5(CAST(c.o_orderkey AS VARCHAR)),
                                     c.o_orderkey) AS rn
  FROM c JOIN alloc ON c.stratum = alloc.stratum)
SELECT o_orderkey, stratum, nh AS n_stratum, n_alloc
FROM ranked WHERE rn <= n_alloc
"""


@register("sample_neyman_allocation", oracle=_NEYMAN_SQL)
def q_sample_neyman_allocation(spark, sf_dir):
    """Neyman-optimal stratified sampling (allocation proportional to
    N_h * sigma_h), fully deterministic.

    The eval-set construction recipe when strata differ in spread:
    minimum-variance allocation of a fixed budget (n=1000) gives
    high-variance strata more samples than proportional allocation
    would. Three relational stages: (1) exact per-stratum moments via
    the integer-cents DECIMAL(38,0) device (one map-side-combinable
    scan, any partial order), (2) allocation from a 5-row broadcast
    table — the weight total is a SEQUENTIAL fold in stratum order so
    cross-engine float addition agrees, floor (never ties) instead of
    round, (3) per-stratum md5-ordered head — the reproducible,
    engine-stable sampler (`sample_hash`'s rule, partitioned window per
    stratum). At 100 TB stage 3's window partitions on the stratum key;
    if one stratum dominates, swap in the two-phase rank operator.
    """
    from dataframe_differ_spark.operators.sampling import neyman_sample

    orders = load_table(spark, sf_dir, "orders")
    c = orders.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("stratum"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return neyman_sample(c, "o_orderkey", "stratum", "cents", budget=1000)


# --------------------------------------------------------------------------
# Filter-quality evaluation: exact ROC-AUC of a screening score
# --------------------------------------------------------------------------

_AUC_STOP = "('the','a','of','and','to','in','is','it')"

_AUC_SQL = f"""
WITH sc AS (
  SELECT CAST(len(list_filter(string_split(text, ' '),
                              x -> x IN {_AUC_STOP})) AS BIGINT) AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents),
hist AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS ns, CAST(SUM(y) AS BIGINT) AS ps
  FROM sc GROUP BY s),
cum AS (
  SELECT s, ns, ps,
         CAST(COALESCE(SUM(ns) OVER (ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cumb
  FROM hist),
agg AS (
  SELECT CAST(SUM(ps * (2 * cumb + ns + 1)) AS BIGINT) AS r2,
         CAST(SUM(ps) AS BIGINT) AS npos,
         CAST(SUM(ns) AS BIGINT) AS n
  FROM cum)
SELECT n AS n_docs, npos AS n_pos, n - npos AS n_neg,
       ROUND(CAST(r2 - npos * (npos + 1) AS DOUBLE)
             / CAST(2 * npos * (n - npos) AS DOUBLE), 9) AS auc,
       ROUND(2.0 * (CAST(r2 - npos * (npos + 1) AS DOUBLE)
                    / CAST(2 * npos * (n - npos) AS DOUBLE)) - 1.0, 9) AS gini
FROM agg
"""


@register("eval_auc_score", oracle=_AUC_SQL)
def q_eval_auc_score(spark, sf_dir):
    """Exact tie-corrected ROC-AUC of a screening score (Mann-Whitney U).

    The metric a pipeline owner uses to decide whether a cheap filter
    score is worth gating on: here, does stopword count predict
    English-language documents? AUC is computed exactly, ties handled by
    mid-rank, WITHOUT ranking any rows: the integer score is histogrammed
    (one map-side-combinable groupBy), and the rank-sum comes from the
    score spine via a broadcast triangle join — 2*R_pos = sum over score
    values of p_s * (2*cum_below + n_s + 1), all BIGINT. At 100 TB the
    corpus is touched once; the spine is bounded by the score's distinct
    values (~hundreds), so no global window and no sort of the data.
    Parity: everything is exact integers until the single final division
    (and gini = 2*auc - 1 with identical op order both engines).
    """
    from dataframe_differ_spark.operators.evalmetrics import auc_score

    docs = load_table(spark, sf_dir, "documents")
    sc = docs.select(
        F.expr(
            f"cast(size(filter(split(text, ' '), x -> x IN {_AUC_STOP})) as bigint)"
        ).alias("s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    roc = auc_score(sc, "s", "y")
    return roc.select(
        F.col("n").alias("n_docs"),
        "n_pos",
        "n_neg",
        F.round("auc", 9).alias("auc"),
        F.round("gini", 9).alias("gini"),
    )


# ---------------------------------------------------------------------------
# BPE apply: corpus token distribution after the learned merges (round 7)
# ---------------------------------------------------------------------------

_BPE_APPLY_SQL = f"""
WITH words AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
          AS w FROM documents)
  GROUP BY w),
s0 AS (
  SELECT w, freq,
         array_to_string(list_transform(range(1, length(w) + 1),
                                        i -> substr(w, i, 1)), '|') AS s
  FROM words),
p0 AS (
  SELECT t[i] AS a, t[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (SELECT freq, string_split(s, '|') AS t FROM s0)
  -- data-derived position spine (ADVICE r9: a fixed 1..59 silently
  -- undercounts pairs for 61+-char words; Spark scans every adjacency)
  CROSS JOIN (SELECT unnest(range(1, (SELECT MAX(len(string_split(s, '|')))
                                      FROM s0))) AS i)
  WHERE i < len(t)
  GROUP BY t[i], t[i + 1]),
m1 AS (SELECT a, b FROM p0 ORDER BY cnt DESC, a, b LIMIT 1),
s1 AS (
  SELECT s0.w, s0.freq,
         {_bpe_apply_sql('s0.s', 'm1.a', 'm1.b')} AS s
  FROM s0 CROSS JOIN m1),
p1 AS (
  SELECT t[i] AS a, t[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (SELECT freq, string_split(s, '|') AS t FROM s1)
  -- data-derived position spine (ADVICE r9: a fixed 1..59 silently
  -- undercounts pairs for 61+-char words; Spark scans every adjacency)
  CROSS JOIN (SELECT unnest(range(1, (SELECT MAX(len(string_split(s, '|')))
                                      FROM s1))) AS i)
  WHERE i < len(t)
  GROUP BY t[i], t[i + 1]),
m2 AS (SELECT a, b FROM p1 ORDER BY cnt DESC, a, b LIMIT 1),
s2 AS (
  SELECT s1.w, s1.freq,
         {_bpe_apply_sql('s1.s', 'm2.a', 'm2.b')} AS s
  FROM s1 CROSS JOIN m2),
tok AS (
  SELECT unnest(string_split(s, '|')) AS token, freq
  FROM s2)
SELECT token, CAST(SUM(freq) AS BIGINT) AS corpus_freq
FROM tok GROUP BY token
ORDER BY corpus_freq DESC, token LIMIT 20
"""


@register("bpe_apply_merges", oracle=_BPE_APPLY_SQL)
def q_bpe_apply_merges(spark, sf_dir):
    """BPE tokenizer INFERENCE: the corpus token distribution after the
    two learned merges — what `bpe_train_merges` (which reports the
    rules) actually does to the corpus. The top-20 subword tokens by
    weighted frequency are the vocabulary head a trained tokenizer
    would ship.

    Same dictionary-encoded plan as training: segmentation lives on the
    DISTINCT-word histogram, tokens explode from the vocabulary-sized
    frame (never the corpus), counts are exact BIGINTs weighted by word
    frequency, and the top-20 is TakeOrdered with a full (freq desc,
    token asc) tiebreak.

    Thin binding over the parametric :func:`operators.tokenize.bpe_segment`
    (round-7 addition).
    """
    from dataframe_differ_spark.operators.tokenize import bpe_segment

    docs = load_table(spark, sf_dir, "documents")
    seg = bpe_segment(docs, "text", n_merges=2)
    return (
        seg.select("freq", F.explode("subwords").alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").cast("long").alias("corpus_freq"))
        .orderBy(F.col("corpus_freq").desc(), "token")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# PR-AUC (average precision) of the screening score (round 7)
# ---------------------------------------------------------------------------

_PR_AUC_SQL = f"""
WITH sc AS (
  SELECT CAST(len(list_filter(string_split(text, ' '),
               x -> x IN {_AUC_STOP})) AS BIGINT) AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents),
hist AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS ns, CAST(SUM(y) AS BIGINT) AS ps
  FROM sc GROUP BY s),
cum AS (
  SELECT s, ns, ps,
         CAST(SUM(ns) OVER (ORDER BY s DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cumn,
         CAST(SUM(ps) OVER (ORDER BY s DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cump
  FROM hist),
tot AS (
  SELECT CAST(SUM(ns) AS BIGINT) AS n, CAST(SUM(ps) AS BIGINT) AS npos
  FROM hist),
per AS (
  SELECT cum.s, tot.n, tot.npos,
         (CAST(ps AS DOUBLE) / npos)
           * (CAST(cump AS DOUBLE) / cumn) AS c,
         CASE WHEN cump > 0 THEN ROUND(
           2.0 * (CAST(cump AS DOUBLE) / cumn)
               * (CAST(cump AS DOUBLE) / npos)
           / ((CAST(cump AS DOUBLE) / cumn)
              + (CAST(cump AS DOUBLE) / npos)), 9)
         ELSE 0.0 END AS f1
  FROM cum CROSS JOIN tot)
SELECT n AS n_docs, npos AS n_pos,
       ROUND(list_reduce(list_prepend(0.0, list(c ORDER BY s)),
                         (acc, x) -> acc + x), 9) AS avg_precision,
       MAX(f1) AS best_f1
FROM per GROUP BY n, npos
"""


@register("eval_pr_auc", oracle=_PR_AUC_SQL)
def q_eval_pr_auc(spark, sf_dir):
    """Average precision (step-wise PR-AUC) of the stopword screening
    score for English docs — the class-imbalance-honest companion to
    `eval_auc_score` on the SAME score/label cells (ROC-AUC flatters a
    filter when negatives dominate; AP weights by the positive class,
    and best_f1 names the operating point a pipeline would gate at).

    Devices: the auc_score histogram spine (per-distinct-score BIGINT
    counts, descending cumulatives via a broadcast triangle join — no
    row ranking, no global window), every precision/recall a division
    of identical BIGINTs, the spine-sized AP sum folded in sorted score
    order (order-free cross-engine), best_f1 a MAX of 9-dp-rounded
    values (order-free). Corpus touched once; spine ~tens of rows at
    any scale.

    Thin binding over the parametric :func:`operators.evalmetrics.pr_auc`
    (round-7 addition).
    """
    from dataframe_differ_spark.operators.evalmetrics import pr_auc

    docs = load_table(spark, sf_dir, "documents")
    sc = docs.select(
        F.expr(
            f"cast(size(filter(split(text, ' '), x -> x IN {_AUC_STOP})) as bigint)"
        ).alias("s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    out = pr_auc(sc, "s", "y")
    return out.select(
        F.col("n").alias("n_docs"),
        "n_pos",
        F.round("avg_precision", 9).alias("avg_precision"),
        "best_f1",
    )


@register("unigram_vocab_persisted", oracle=_UG_APPLY_SQL)
def q_unigram_vocab_persisted(spark, sf_dir):
    """`unigram_apply_segment` through the persistence layer: the
    trained unigram vocabulary is SAVED (`save_artifact`, kind
    ``unigram_vocab`` — piece + logp, the schema `unigram_segment`
    consumes), RELOADED fresh, and segmentation runs off the loaded
    frame. Same oracle as the apply query — save → load must be
    identity on the model (the sixth artifact kind, joining bpe_merges /
    ivf_centroids / bloom_bits / fastss_signatures / logreg_weights).

    Train-once-segment-everywhere: the EM scans run in the producing
    job; every consumer loads a ≤vocab-row parquet and segments with a
    broadcast join.
    """
    from dataframe_differ_spark.operators.persistence import (
        load_artifact,
        run_scoped_artifact_path,
        save_artifact,
    )
    from dataframe_differ_spark.operators.tokenize import unigram_segment

    docs = load_table(spark, sf_dir, "documents")
    vocab = _ug_vocab_cached(spark, sf_dir).select("piece", "logp")
    path = run_scoped_artifact_path("ugv", sf_dir)
    save_artifact(
        vocab, path, "unigram_vocab",
        params={"max_piece_len": _UG_L, "max_word_len": _UG_MAXW},
    )
    art = load_artifact(spark, path, "unigram_vocab")
    seg = unigram_segment(
        docs, "text", art.df,
        max_piece_len=art.params["max_piece_len"],
        max_word_len=art.params["max_word_len"],
    )
    return seg.select(
        "word", "freq", "seg", F.col("n_pieces").cast("long").alias("n_pieces")
    )


# --------------------------------------------------------------------------
# Signature-store APPEND consistency (round 10): the day-N loop's write
# half — prove merged store == from-scratch signing, in-query.
# --------------------------------------------------------------------------

_STORE_APPEND_SQL = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 < 8),
batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8
  UNION ALL
  SELECT doc_id + 300000 AS doc_id,
         array_to_string(string_split(text, ' ')[3:], ' ') AS text
  FROM documents WHERE doc_id % 10 < 8 AND doc_id % 9 = 0),
csh AS ({_IMH_SHINGLES.format(src="corpus")}),
bsh AS ({_IMH_SHINGLES.format(src="batch")}),
ctok AS (SELECT doc_id, unnest(shingles) AS shingle FROM csh),
btok AS (SELECT doc_id, unnest(shingles) AS shingle FROM bsh),
csig AS ({_IMH_SIG.format(tok="ctok", nperm=_IMH_PERM)}),
bsig AS ({_IMH_SIG.format(tok="btok", nperm=_IMH_PERM)}),
merged AS (SELECT * FROM csig UNION ALL SELECT * FROM bsig),
alltok AS (SELECT * FROM ctok UNION ALL SELECT * FROM btok),
scratch AS ({_IMH_SIG.format(tok="alltok", nperm=_IMH_PERM)}),
agree AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_agree
  FROM merged m JOIN scratch s
    ON m.doc_id = s.doc_id AND m.j = s.j AND m.s = s.s),
cnt AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM csig) AS n_store,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM bsig) AS n_batch,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM merged) AS n_merged,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM scratch) AS n_scratch,
         (SELECT n_agree FROM agree) AS n_agree)
SELECT n_store, n_batch, n_merged, n_scratch, n_agree,
       (n_merged = n_scratch AND n_agree = n_scratch) AS append_consistent
FROM cnt
"""


@register("dedup_store_append", oracle=_STORE_APPEND_SQL)
def q_dedup_store_append(spark, sf_dir):
    """The WRITE half of the signature-store day-N loop
    (`dedup_incremental_persisted` is the read half): append today's
    batch signatures to the store and PROVE, in-query, that the merged
    store is byte-identical to signing the whole corpus from scratch —
    the decomposability property (each doc's MinHash signature depends
    on that doc alone) that makes append-only maintenance valid, never
    requiring a full re-sign. The `warehouse_ivm_agg` pattern applied
    to the dedup index: the maintenance shortcut ships WITH its own
    equivalence verification.

    Output one row: store/batch/merged/from-scratch signature counts,
    the count of (doc_id, j, s)-exact agreements between merged and
    scratch, and the consistency verdict (merged = scratch on every
    row). At 100 TB the scratch side is the one-time backfill job and
    this query is its acceptance test; day N only ever runs the batch
    sign + parquet append.
    """
    corpus, batch = _imh_corpus_batch(spark, sf_dir)

    def sig_of(df):
        # Deliberately NOT lineage-cut: the signature frames feed 2-3
        # plan branches each, but ReuseExchange already dedupes the
        # shared subtrees — cutting them here measured 4.5 → 8.2 s warm
        # at sf0.1 (round 11; the kcore lesson again).
        return _imh_sign(df, 3, _IMH_PERM)

    csig = sig_of(corpus)
    bsig = sig_of(batch)
    merged = csig.unionByName(bsig)
    scratch = sig_of(corpus.unionByName(batch))
    sc = scratch.select(
        F.col("doc_id").alias("_pp_d"),
        F.col("j").alias("_pp_j"),
        F.col("s").alias("_pp_s"),
    )
    agree = merged.join(
        sc,
        (F.col("doc_id") == F.col("_pp_d"))
        & (F.col("j") == F.col("_pp_j"))
        & (F.col("s") == F.col("_pp_s")),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_agree"))
    counts = (
        csig.agg(F.count(F.lit(1)).cast("long").alias("n_store"))
        .crossJoin(
            F.broadcast(
                bsig.agg(F.count(F.lit(1)).cast("long").alias("n_batch"))
            )
        )
        .crossJoin(
            F.broadcast(
                merged.agg(F.count(F.lit(1)).cast("long").alias("n_merged"))
            )
        )
        .crossJoin(
            F.broadcast(
                scratch.agg(
                    F.count(F.lit(1)).cast("long").alias("n_scratch")
                )
            )
        )
        .crossJoin(F.broadcast(agree))
    )
    return counts.select(
        "n_store",
        "n_batch",
        "n_merged",
        "n_scratch",
        "n_agree",
        (
            (F.col("n_merged") == F.col("n_scratch"))
            & (F.col("n_agree") == F.col("n_scratch"))
        ).alias("append_consistent"),
    )


@register("dedup_store_compacted", oracle=_INCR_MH_SQL)
def q_dedup_store_compacted(spark, sf_dir):
    """Store COMPACTION under a full oracle (round 11, VERDICT r10 item
    #4 — lifecycle beyond append): the signature store lives through a
    whole maintenance cycle — day-0 save, a day-N batch append, a
    REPLAYED append (the at-least-once sink retry that leaves exact-
    duplicate rows), then `compact_artifact` (dedup + re-shard to one
    file set) — and the post-compaction LSH probe of the batch against
    the store's corpus side must STILL equal `dedup_incremental_
    persisted`'s probe of the never-compacted store (same oracle SQL):
    compaction is invisible to queries, which is its entire contract.

    The mechanism checks run in-query and fail loudly: rows_before
    must exceed rows_after by exactly one batch-signature set (the
    replayed append, removed by dedup — proving dedup removed ONLY the
    duplicates), and the rewrite must land in a single file set. At
    100 TB this is the weekend maintenance job: a grown store of
    thousands of small daily appends becomes one well-sharded scan
    again, with the probe-equality gate this query encodes as its
    acceptance test.
    """
    from dataframe_differ_spark.operators.persistence import (
        compact_artifact,
        load_artifact,
        run_scoped_artifact_path,
        save_artifact,
    )

    corpus, batch = _imh_corpus_batch(spark, sf_dir)
    params = {"num_perm": _IMH_PERM, "bands": _IMH_BANDS, "shingle_n": 3}

    # Day 0: persist the corpus store.
    path = run_scoped_artifact_path("mhsigc", sf_dir)
    save_artifact(
        _imh_sign(corpus, 3, _IMH_PERM), path, "minhash_signatures",
        params=params,
    )

    # Day N: sign the batch once (materialized — appended twice below
    # and probed after, so the signatures must be computed exactly once
    # and byte-stable across those uses), then append it twice: the
    # second write simulates an at-least-once delivery retry.
    bsig = _imh_sign(batch, 3, _IMH_PERM).localCheckpoint(eager=True)
    n_batch_sig = bsig.count()
    bsig.write.mode("append").parquet(f"{path}/data")
    bsig.write.mode("append").parquet(f"{path}/data")

    # Maintenance: compact (dedup duplicates, re-shard), then verify the
    # lifecycle arithmetic loudly — dedup must have removed EXACTLY the
    # replayed batch rows, nothing else.
    stats = compact_artifact(spark, path, "minhash_signatures", num_files=1)
    if stats.rows_before - stats.rows_after != n_batch_sig:
        raise RuntimeError(
            "compaction removed a row set different from the replayed "
            f"append: before={stats.rows_before} after={stats.rows_after} "
            f"batch_sigs={n_batch_sig}"
        )
    if stats.files_after != 1:
        raise RuntimeError(
            f"compaction left {stats.files_after} file sets, expected 1"
        )

    # Post-compaction probe: batch vs the store's CORPUS side (the
    # store now also holds the appended batch signatures; corpus rows
    # are doc_id % 10 < 8 under 300000 by the fixture's construction).
    art = load_artifact(
        spark, path, "minhash_signatures", expect_params=params
    )
    corpus_side = art.df.filter(
        (F.col("doc_id") % 10 < 8) & (F.col("doc_id") < 300000)
    )
    return _imh_probe(
        corpus_side, bsig, int(art.params["num_perm"]) // int(art.params["bands"])
    )


# --------------------------------------------------------------------------
# Tokenizer fertility / compression eval (round 10): the quality metric a
# tokenizer review actually reads, over the trained unigram model.
# --------------------------------------------------------------------------

_UG_FERT_SQL = f"""
WITH RECURSIVE {_UG_SEG_CTES}
SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
       CAST(SUM(freq) AS BIGINT) AS n_words,
       CAST(SUM(freq * n_pieces) AS BIGINT) AS n_pieces_total,
       ROUND(CAST(SUM(freq * n_pieces) AS DOUBLE) / SUM(freq), 9)
         AS fertility,
       ROUND(CAST(SUM(freq * length(word)) AS DOUBLE)
             / SUM(freq * n_pieces), 9) AS chars_per_piece,
       ROUND(CAST(SUM(CASE WHEN n_pieces = 1 THEN freq ELSE 0 END) AS DOUBLE)
             / SUM(freq), 9) AS pct_single_piece
FROM segf
"""


@register("eval_tokenizer_fertility", oracle=_UG_FERT_SQL)
def q_eval_tokenizer_fertility(spark, sf_dir):
    """Tokenizer FERTILITY eval (pieces per word, corpus-weighted) for
    the trained unigram model — the one-row metric a tokenizer review
    reads before shipping a vocab: fertility near 1.0 means the vocab
    covers the corpus with whole words (cheap sequences), high
    fertility means text shatters into characters (long sequences,
    wasted context window). Also reports chars-per-piece (compression)
    and the share of corpus tokens kept whole.

    Composes the cached trained vocab (`_ug_vocab_cached` — shared with
    the train/apply/persisted triple) + `unigram_segment`, then ONE
    aggregate over the word histogram: every metric is an exact-BIGINT
    ratio with a single division (no libm). Scope note: the histogram
    caps words at max_word_len=16 chars, the same population the
    trainer and apply queries see — the metric grades the tokenizer on
    its own training distribution. Oracle: the shared `_UG_SEG_CTES`
    replay aggregated instead of SELECTed.

    100 TB: segmentation is vocabulary-sized work over the DISTINCT
    word histogram (built once, the trainers' device); the eval is a
    1-row rollup of it. Nothing rescans the corpus.
    """
    from dataframe_differ_spark.operators.tokenize import unigram_segment

    docs = load_table(spark, sf_dir, "documents")
    vocab = _ug_vocab_cached(spark, sf_dir)
    seg = unigram_segment(
        docs, "text", vocab, max_piece_len=_UG_L, max_word_len=_UG_MAXW
    )
    single = F.when(F.col("n_pieces") == 1, F.col("freq")).otherwise(0)
    return seg.agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_words"),
        F.sum("freq").cast("long").alias("n_words"),
        F.sum(F.col("freq") * F.col("n_pieces"))
        .cast("long")
        .alias("n_pieces_total"),
        F.round(
            F.sum(F.col("freq") * F.col("n_pieces")).cast("double")
            / F.sum("freq"),
            9,
        ).alias("fertility"),
        F.round(
            F.sum(F.col("freq") * F.length("word")).cast("double")
            / F.sum(F.col("freq") * F.col("n_pieces")),
            9,
        ).alias("chars_per_piece"),
        F.round(F.sum(single).cast("double") / F.sum("freq"), 9).alias(
            "pct_single_piece"
        ),
    )
