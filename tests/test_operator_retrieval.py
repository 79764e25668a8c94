"""Schema-agnostic unit tests for the round-6 retrieval operators:
bm25_scores (operators/textquality.py) and rrf_fuse
(operators/similarity.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from dataframe_differ_spark.operators.similarity import rrf_fuse
from dataframe_differ_spark.operators.textquality import bm25_scores


def test_bm25_matches_python(spark):
    corpus = [
        ("d1", "apple apple banana"),
        ("d2", "banana cherry cherry cherry"),
        ("d3", "apple banana cherry durian"),
    ]
    df = spark.createDataFrame([Row(pk=i, body=t) for i, t in corpus])
    got = {
        (r.pk, r.token): r.bm25
        for r in bm25_scores(df, "pk", "body", round_dp=None).collect()
    }
    docs = {i: t.split(" ") for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    dfreq = {}
    for toks in docs.values():
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    for (pk, tok), score in got.items():
        tf = docs[pk].count(tok)
        dl = len(docs[pk])
        idf = math.log(1 + (n - dfreq[tok] + 0.5) / (dfreq[tok] + 0.5))
        ref = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        assert score == pytest.approx(ref, abs=1e-12)
    # every (doc, distinct term) pair scored
    assert len(got) == sum(len(set(t)) for t in docs.values())


def test_bm25_min_tf_prunes(spark):
    df = spark.createDataFrame(
        [Row(pk=1, body="x x x y"), Row(pk=2, body="y z")]
    )
    got = bm25_scores(df, "pk", "body", min_tf=3).collect()
    assert {(r.pk, r.token) for r in got} == {(1, "x")}


def test_rrf_fuse_full_outer_and_score(spark):
    run1 = spark.createDataFrame(
        [Row(item="a", r=1), Row(item="b", r=2), Row(item="c", r=3)]
    )
    run2 = spark.createDataFrame([Row(item="b", r=1), Row(item="z", r=2)])
    got = {
        r.item: r for r in rrf_fuse([run1, run2], "item", "r", k=60).collect()
    }
    assert set(got) == {"a", "b", "c", "z"}
    assert got["b"].rrf_score == pytest.approx(
        round(1 / 62 + 1 / 61, 9), abs=1e-12
    )
    assert got["a"].rrf_score == pytest.approx(round(1 / 61, 9), abs=1e-12)
    assert got["z"].rank_1 is None and got["z"].rank_2 == 2
    # b (ranked well by both) beats everything
    assert got["b"].rrf_score == max(r.rrf_score for r in got.values())


def test_rrf_fuse_needs_two_runs(spark):
    run = spark.createDataFrame([Row(item="a", r=1)])
    with pytest.raises(ValueError, match="two runs"):
        rrf_fuse([run], "item", "r")
