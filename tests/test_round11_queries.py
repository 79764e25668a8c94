"""Round-11 mechanism tests: the streaming store-loop's streaming-only
surplus (store growth, acceptance ordering, batch-vs-batch candidate
causality) that the registered output's full oracle cannot see, plus the
connected-components lifecycle guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def sdp_run(spark, sf_small):
    from dataframe_differ_spark.queries.advanced_streaming import (
        _run_stream_dedup_persisted,
    )

    result, cand_log, acc_log, store_path, params = (
        _run_stream_dedup_persisted(spark, sf_small)
    )
    return {
        "result": result,
        "cands": spark.read.parquet(cand_log),
        "acc": spark.read.parquet(acc_log),
        "store_path": store_path,
        "params": params,
    }


def test_stream_dedup_persisted_equals_batch_twin(spark, sf_small, sdp_run):
    """vs-corpus candidates must be IDENTICAL to the one-shot batch
    probe of the same split against the same day-0 store — streaming
    the ingest changes nothing about the dedup verdicts."""
    from dataframe_differ_spark.queries import load_all

    twin = load_all()["dedup_incremental_persisted"].fn(spark, sf_small)
    assert _rows(
        sdp_run["result"].select("batch_id", "corpus_id", "est_jaccard")
    ) == _rows(twin.select("batch_id", "corpus_id", "est_jaccard"))


def test_stream_dedup_persisted_ran_multiple_batches(sdp_run):
    """4 one-file triggers -> every micro-batch must have probed, and
    acceptances must land in more than one batch (otherwise the
    'incremental' loop degenerated to a single batch)."""
    cand_batches = {
        r.micro_batch
        for r in sdp_run["cands"].select("micro_batch").distinct().collect()
    }
    acc_batches = {
        r.micro_batch
        for r in sdp_run["acc"].select("micro_batch").distinct().collect()
    }
    assert len(acc_batches) >= 2
    assert cand_batches  # at least one batch found candidates
    assert max(acc_batches) > min(acc_batches)


def test_stream_dedup_persisted_store_equals_batch_path(
    spark, sf_small, sdp_run
):
    """Final store contents == corpus signatures + a ONE-SHOT re-sign of
    exactly the accepted docs: append≡re-sign holds at micro-batch
    granularity, so the streamed store is the same artifact the batch
    day-N path would have produced."""
    from dataframe_differ_spark.operators.persistence import load_artifact
    from dataframe_differ_spark.queries.pipelineops import (
        _IMH_PERM,
        _imh_corpus_batch,
        _imh_sign,
    )

    art = load_artifact(
        spark,
        sdp_run["store_path"],
        "minhash_signatures",
        expect_params=sdp_run["params"],
    )
    corpus, batch = _imh_corpus_batch(spark, sf_small)
    accepted_ids = sdp_run["acc"].select("doc_id").distinct()
    expected = _imh_sign(corpus, 3, _IMH_PERM).unionByName(
        _imh_sign(batch.join(accepted_ids, "doc_id"), 3, _IMH_PERM)
    )
    assert _rows(art.df.select("doc_id", "j", "s")) == _rows(
        expected.select("doc_id", "j", "s")
    )


def test_stream_dedup_persisted_batch_vs_batch_causality(sdp_run):
    """Every candidate against an APPENDED doc (non-vs_corpus) must
    point at a doc accepted in a STRICTLY earlier micro-batch — the
    store can only ever contain what was ingested before you."""
    bb = sdp_run["cands"].filter(~F.col("vs_corpus"))
    acc = sdp_run["acc"].select(
        F.col("doc_id").alias("corpus_id"),
        F.col("micro_batch").alias("acc_batch"),
    )
    joined = bb.join(acc, "corpus_id", "left").collect()
    assert all(r.acc_batch is not None for r in joined)
    assert all(r.acc_batch < r.micro_batch for r in joined)


def test_connected_components_checkpoint_every_validation(spark):
    from dataframe_differ_spark.operators.dedup import connected_components

    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    for bad in (0, -1):
        with pytest.raises(ValueError, match="checkpoint_every"):
            connected_components(edges, checkpoint_every=bad)
    # cadence > 1 with the aliased self-joins still converges correctly
    out = connected_components(
        spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], ["src", "dst"]
        ),
        checkpoint_every=3,
    )
    got = {(r.v, r.component_id) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
