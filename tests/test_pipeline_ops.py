"""Structural invariants for the training-data pipeline operators
(repetition filter, deterministic split, Zipf coverage, sequence packing,
mixture weights, decontamination)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataframe_differ_spark.queries.pipelineops import (
    q_contamination_check,
    q_seq_pack_budget,
    q_source_mix_weights,
    q_split_train_val_test,
    q_text_repetition,
    q_vocab_coverage,
)
from dataframe_differ_spark.tables import load_table


def test_repetition_fractions_bounded(spark, sf_small):
    out = q_text_repetition(spark, sf_small)
    bad = out.filter(
        (F.col("uniq_frac") <= 0)
        | (F.col("uniq_frac") > 1)
        | (F.col("top_tok_frac") <= 0)
        | (F.col("top_tok_frac") > 1)
        | (F.col("top_bigram_frac") < 0)
    ).count()
    assert bad == 0
    # A fully-repetitive planted doc must be flagged.
    planted = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam")], "doc_id long, text string"
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.lit(29).cast("long")
    )
    planted.createOrReplaceTempView("___rep_probe")
    toks = planted.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    uniq = toks.groupBy("doc_id").agg(
        (F.countDistinct("token") / F.count(F.lit(1))).alias("uf")
    )
    assert uniq.collect()[0].uf < 0.30


def test_split_is_exhaustive_and_deterministic(spark, sf_small):
    out = q_split_train_val_test(spark, sf_small)
    docs = load_table(spark, sf_small, "documents")
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    assert total == docs.count()
    splits = {r.split for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}
    # Deterministic: two evaluations agree exactly.
    a = {(r.split, r.lang): (r.n_docs, r.n_tokens) for r in out.collect()}
    b = {
        (r.split, r.lang): (r.n_docs, r.n_tokens)
        for r in q_split_train_val_test(spark, sf_small).collect()
    }
    assert a == b


def test_vocab_coverage_monotone_and_bounded(spark, sf_small):
    rows = q_vocab_coverage(spark, sf_small).orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    cov = [r.cum_coverage for r in rows]
    assert all(b >= a for a, b in zip(cov, cov[1:]))
    assert 0 < cov[-1] <= 1
    ns = [r.n for r in rows]
    assert all(a >= b for a, b in zip(ns, ns[1:]))  # Zipf: non-increasing


def test_seq_packing_partitions_docs_and_respects_order(spark, sf_small):
    out = q_seq_pack_budget(spark, sf_small)
    docs = load_table(spark, sf_small, "documents")
    assert out.agg(F.sum("n_docs")).collect()[0][0] == docs.count()
    # Packs within a source cover disjoint, ordered doc_id ranges.
    w_bad = out.alias("a").join(
        out.alias("b"),
        (F.col("a.source") == F.col("b.source"))
        & (F.col("a.pack_id") < F.col("b.pack_id"))
        & (F.col("a.last_doc") >= F.col("b.first_doc")),
    )
    assert w_bad.count() == 0
    # Every pack except possibly the last per source holds >= the budget's
    # starting offset property: pack_tokens > 0 always.
    assert out.filter(F.col("pack_tokens") <= 0).count() == 0


def test_mix_weights_shares_sum_to_one(spark, sf_small):
    rows = q_source_mix_weights(spark, sf_small).collect()
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-6
    for r in rows:
        assert r.uniform_weight > 0


def test_contamination_only_flags_training_docs(spark, sf_small):
    out = q_contamination_check(spark, sf_small)
    # No flagged doc may itself be in the benchmark bucket ('f').
    in_bench = out.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "f"
    ).count()
    assert in_bench == 0
    assert out.filter(
        (F.col("n_bench_docs") <= 0) | (F.col("n_shared_shingles") <= 0)
    ).count() == 0


def test_sample_mixture_moves_shares_toward_uniform(spark, sf_small):
    from dataframe_differ_spark.queries.pipelineops import (
        q_sample_mixture,
        q_source_mix_weights,
    )

    before = {r.source: r.token_share for r in q_source_mix_weights(spark, sf_small).collect()}
    rows = q_sample_mixture(spark, sf_small).collect()
    n_src = len(rows)
    assert abs(sum(r.achieved_share for r in rows) - 1.0) < 1e-6
    # Resampling should shrink the mixture's distance to uniform.
    after = {r.source: r.achieved_share for r in rows}
    dist_before = sum(abs(v - 1.0 / n_src) for v in before.values())
    dist_after = sum(abs(v - 1.0 / n_src) for v in after.values())
    assert dist_after < dist_before
    for r in rows:
        assert r.n_docs_out >= 0 and r.tokens_out >= 0


def test_perplexity_scores_repetition_lower(spark, sf_small):
    from dataframe_differ_spark.queries.pipelineops import q_text_perplexity

    out = q_text_perplexity(spark, sf_small)
    rows = out.collect()
    assert all(r.avg_neg_logprob > 0 for r in rows)
    assert all(r.n_bigrams > 0 for r in rows)
    # Self-trained LM: a doc made of the corpus's most common bigram
    # repeated should score lower (less surprising) than the corpus mean.
    # Weak-form check: min < mean < max with nonzero spread.
    vals = [r.avg_neg_logprob for r in rows]
    assert min(vals) < sum(vals) / len(vals) < max(vals)


def test_bpe_train_merges_matches_python_reference(spark, sf_small):
    # Re-train the two merges in pure Python over the same word histogram
    # (standard BPE trainer) and compare merges, counts, and token totals.
    from collections import Counter

    from dataframe_differ_spark.queries import load_all

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").collect()
    freq = Counter(w for d in docs for w in d.text.split(" ") if w)
    words = {w: list(w) for w in freq}

    def top_pair():
        c = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                c[(a, b)] += freq[w]
        return min(c.items(), key=lambda kv: (-kv[1], kv[0]))

    def apply(pair):
        a, b = pair
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out

    def total():
        return sum(freq[w] * len(s) for w, s in words.items())

    expect = {0: ("", "", 0, total())}
    for rank in (1, 2):
        (a, b), cnt = top_pair()
        apply((a, b))
        expect[rank] = (a, b, cnt, total())

    got = {
        r.merge_rank: (
            r.left_sym, r.right_sym, r.pair_count, r.corpus_tokens_after
        )
        for r in load_all()["bpe_train_merges"].fn(spark, sf_small).collect()
    }
    assert got == expect
