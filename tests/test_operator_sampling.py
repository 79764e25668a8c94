"""Schema-agnostic unit tests for the round-6 parametric sampling
operators (operators/sampling.py).

Hand-built frames with arbitrary column names, checked for the properties
deterministic samplers must have: exact reproducibility, stability under
growth, rate targeting, weight proportionality, class balance, and
Neyman allocation ∝ N_h·σ_h. The fixture-bound registry queries keep
pinning exact-value semantics against the DuckDB oracles.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from dataframe_differ_spark.operators.sampling import (
    balanced_sample,
    hash_sample,
    neyman_sample,
    stratified_sample,
    weighted_sample,
)


def test_hash_sample_rate_and_stability(spark):
    df = spark.createDataFrame([Row(k=i) for i in range(4000)])
    kept = sorted(r.k for r in hash_sample(df, "k", sixteenths=4).collect())
    # ~4/16 = 25%, md5 is uniform
    assert 0.22 * 4000 < len(kept) < 0.28 * 4000
    # growth stability: the sample of a prefix is a subset of the full sample
    small = sorted(
        r.k for r in hash_sample(df.filter(df.k < 2000), "k", sixteenths=4).collect()
    )
    assert set(small) == {k for k in kept if k < 2000}
    # reproducible
    again = sorted(r.k for r in hash_sample(df, "k", sixteenths=4).collect())
    assert kept == again
    with pytest.raises(ValueError, match="sixteenths"):
        hash_sample(df, "k", sixteenths=0)


def test_stratified_sample_rates(spark):
    rows = [Row(k=i, grp="hot" if i % 2 else "cold") for i in range(4000)]
    df = spark.createDataFrame(rows)
    kept = stratified_sample(df, "k", "grp", {"hot": 2}, default_sixteenths=16)
    got = kept.groupBy("grp").count().collect()
    counts = {r.grp: r["count"] for r in got}
    assert counts["cold"] == 2000  # default 16/16 keeps everything
    assert 0.09 * 2000 < counts["hot"] < 0.16 * 2000  # ~2/16


def test_weighted_sample_prefers_heavy(spark):
    rng = random.Random(61)
    rows = [Row(k=i, w=100.0 if i < 200 else 1.0) for i in range(2000)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows)
    picks = weighted_sample(df, "k", "w", 100).collect()
    assert len(picks) == 100
    heavy = sum(1 for r in picks if r.w == 100.0)
    assert heavy > 60  # 200 heavy rows at 100x weight dominate the top-100
    assert all(r.score >= 0 for r in picks)
    # deterministic
    again = weighted_sample(df, "k", "w", 100).collect()
    assert sorted(r.k for r in picks) == sorted(r.k for r in again)


def test_weighted_sample_excludes_nonpositive_weights(spark):
    # round-8 ADVICE guard: weight 0 -> -ln(u)/0 = +/-inf and negative
    # weights give negative keys that would SORT FIRST and dominate the
    # k-smallest selection; both are excluded before scoring instead.
    rows = (
        [Row(k=i, w=1.0) for i in range(10)]
        + [Row(k=100 + i, w=0.0) for i in range(5)]
        + [Row(k=200 + i, w=-3.0) for i in range(5)]
        + [Row(k=300, w=None)]
    )
    picks = weighted_sample(spark.createDataFrame(rows), "k", "w", 50).collect()
    assert sorted(r.k for r in picks) == list(range(10))
    assert all(r.score >= 0 for r in picks)


def test_balanced_sample_equalizes(spark):
    rows = [Row(pk=i, lbl="maj") for i in range(900)]
    rows += [Row(pk=1000 + i, lbl="min") for i in range(70)]
    df = spark.createDataFrame(rows)
    out = balanced_sample(df, "pk", "lbl").collect()
    per = {}
    for r in out:
        per[r.lbl] = per.get(r.lbl, 0) + 1
    assert per == {"maj": 70, "min": 70}
    # explicit per_class cap
    capped = balanced_sample(df, "pk", "lbl", per_class=10).collect()
    assert sum(1 for r in capped if r.lbl == "maj") == 10


def test_neyman_allocates_by_spread(spark):
    rng = random.Random(71)
    rows = [Row(k=i, st="tight", v=5000 + rng.randrange(-10, 11)) for i in range(1500)]
    rows += [
        Row(k=10_000 + i, st="wide", v=5000 + rng.randrange(-2000, 2001))
        for i in range(1500)
    ]
    df = spark.createDataFrame(rows)
    out = neyman_sample(df, "k", "st", "v", budget=400).collect()
    alloc = {}
    for r in out:
        alloc[r.st] = r.n_alloc
        assert r.n_stratum == 1500
    # same N_h, sigma_wide >> sigma_tight -> nearly the whole budget
    assert alloc["wide"] > 10 * alloc["tight"]
    assert sum(alloc.values()) <= 400
    per = {}
    for r in out:
        per[r.st] = per.get(r.st, 0) + 1
    assert per == alloc  # every stratum filled exactly to its allocation


def test_reserved_prefix_rejected(spark):
    df = spark.createDataFrame([Row(_sa_rn=1, k=1)])
    with pytest.raises(ValueError, match="_sa_"):
        hash_sample(df, "k")
