"""Round-10 query invariants: the properties the new bindings CLAIM
(zero cross-split leaks, append-only store consistency, persisted-probe
twin recovery, recall bounds) asserted on sf0.001 — complementing the
exact-value oracle gate, which checks values but not the CLAIMS about
them.
"""

from __future__ import annotations

import pytest

from dataframe_differ_spark.queries import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_split_leakage_safe_zero_leaks(spark, sf_small, registry):
    rows = registry["split_leakage_safe"].fn(spark, sf_small).collect()
    by_split = {r.split: r for r in rows}
    # the whole point of the query: no near-dup pair straddles splits
    assert all(r.leak_pairs == 0 for r in rows)
    # every corpus doc (base + every-13th planted twin) is assigned
    from dataframe_differ_spark.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_small, "documents")
    n_base = docs.count()
    n_planted = docs.filter(F.col("doc_id") % 13 == 0).count()
    assert sum(r.n_docs for r in rows) == n_base + n_planted
    # components partition the docs: each component in exactly one split
    assert sum(r.n_components for r in rows) <= sum(r.n_docs for r in rows)
    assert set(by_split) <= {"train", "val", "test"}


def test_dedup_store_append_consistent(spark, sf_small, registry):
    row = registry["dedup_store_append"].fn(spark, sf_small).collect()[0]
    # MinHash decomposability: merged store == from-scratch re-sign
    assert row.append_consistent
    assert row.n_merged == row.n_store + row.n_batch == row.n_scratch
    assert row.n_agree == row.n_scratch


def test_dedup_incremental_persisted_finds_planted_twins(
    spark, sf_small, registry
):
    rows = registry["dedup_incremental_persisted"].fn(
        spark, sf_small
    ).collect()
    assert all(0.0 <= r.est_jaccard <= 1.0 for r in rows)
    # every planted twin (corpus doc_id + 300000, 2 tokens dropped) must
    # band-match its source with a high signature-agreement estimate
    planted = {
        (r.batch_id, r.corpus_id): r.est_jaccard
        for r in rows
        if r.batch_id >= 300000 and r.batch_id - 300000 == r.corpus_id
    }
    assert planted, "no planted twin recovered from the persisted store"
    assert all(est >= 0.5 for est in planted.values())


def test_ann_drift_refresh_decision_row(spark, sf_small, registry):
    row = registry["ann_drift_refresh"].fn(spark, sf_small).collect()[0]
    assert row.n_queries == 10  # vec_id % 10 == 0 and < 100
    assert row.drift_l2 > 0.0  # the fixture plants real drift
    for r in (row.recall_old, row.recall_new):
        assert 0.0 <= r <= 1.0
    assert row.recall_delta == pytest.approx(
        row.recall_new - row.recall_old, abs=1e-9
    )


def test_eval_rouge_pairs_planted_twins_score_high(
    spark, sf_small, registry
):
    rows = registry["eval_rouge_pairs"].fn(spark, sf_small).collect()
    assert all(0.0 <= r.rouge1_f1 <= 1.0 for r in rows)
    assert all(0.0 <= r.rouge2_f1 <= 1.0 for r in rows)
    planted = [
        r for r in rows if r.doc_b - 100000 == r.doc_a and r.doc_b >= 100000
    ]
    assert planted, "no planted near-dup pair surfaced"
    # the twin lost only its last 3 tokens: unigram overlap stays high
    assert all(r.rouge1_f1 >= 0.5 for r in planted)
    # ROUGE is recall-oriented: the truncated twin can never beat a
    # perfect-copy score, and must dominate its own bigram score
    assert all(r.rouge1_f1 >= r.rouge2_f1 for r in planted)


def test_dq_k_anonymity_accounting(spark, sf_small, registry):
    from dataframe_differ_spark.tables import load_table

    row = registry["dq_k_anonymity"].fn(spark, sf_small).collect()[0]
    n_customers = load_table(spark, sf_small, "customer").count()
    assert row.k == 5
    assert row.n_rows == n_customers
    assert 0 <= row.n_risky_rows <= row.n_rows
    assert 0 <= row.n_risky_classes <= row.n_classes
    assert row.min_class_size >= 1
    assert 0.0 <= row.risky_share <= 1.0
    # risky rows live in risky classes: each has fewer than k members
    assert row.n_risky_rows < row.k * (row.n_risky_classes + 1)


def test_eval_tokenizer_fertility_identities(spark, sf_small, registry):
    row = registry["eval_tokenizer_fertility"].fn(spark, sf_small).collect()[0]
    assert row.n_words >= row.n_distinct_words > 0
    # a trained vocab always covers single chars: every word segments
    assert row.n_pieces_total >= row.n_words
    assert row.fertility >= 1.0
    assert row.chars_per_piece >= 1.0
    assert 0.0 <= row.pct_single_piece <= 1.0
    assert row.fertility == pytest.approx(
        row.n_pieces_total / row.n_words, abs=1e-8
    )


def test_contamination_semantic_planted_leaks(spark, sf_small, registry):
    rows = registry["contamination_semantic"].fn(spark, sf_small).collect()
    by_id = {r.bench_id: r for r in rows}
    # fixed benchmark set: every 50th vec below 500
    assert set(by_id) == {i for i in range(0, 500, 50)}
    # every %100 benchmark vec has a planted noisy copy in train -> leaks
    for bid in range(0, 500, 100):
        assert by_id[bid].contaminated, bid
        assert by_id[bid].nearest_train_id == bid + 700000
    assert all(-1.0 <= r.max_cos <= 1.0 for r in rows)


def test_dq_freshness_watermark(spark, sf_small, registry):
    rows = registry["dq_freshness"].fn(spark, sf_small).collect()
    assert rows and all(r.n_rows > 0 for r in rows)
    assert all(r.lag_days >= 0 for r in rows)
    # the watermark-owning stream has zero lag and is never stale
    assert any(r.lag_days == 0 and not r.stale for r in rows)
    assert all(r.stale == (r.lag_days > 7) for r in rows)
