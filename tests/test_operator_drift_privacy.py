"""Schema-agnostic unit tests for the round-6 parametric drift
(operators/drift.py) and privacy-audit (operators/privacy.py) operators.

Hand-built frames with arbitrary column names, checked against
pure-Python references (brute-force ECDF max gap, direct JSD, set-based
anonymity counts). The fixture-bound registry queries keep pinning
exact-value semantics against the DuckDB oracles.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import Row

from dataframe_differ_spark.operators.drift import js_divergence, ks_test
from dataframe_differ_spark.operators.privacy import k_anonymity, l_diversity


def test_ks_matches_bruteforce(spark):
    rng = random.Random(83)
    rows = [Row(price=rng.randrange(0, 300), old=True) for _ in range(800)]
    rows += [Row(price=rng.randrange(40, 340), old=False) for _ in range(700)]
    df = spark.createDataFrame(rows)
    got = ks_test(df, "price", "old").collect()[0]
    a = sorted(r.price for r in rows if r.old)
    b = sorted(r.price for r in rows if not r.old)

    import bisect

    vals = sorted({r.price for r in rows})
    best = 0
    at = None
    for v in vals:
        fa = bisect.bisect_right(a, v) * len(b)
        fb = bisect.bisect_right(b, v) * len(a)
        num = abs(fa - fb)
        if num > best:
            best, at = num, v
    assert got.n_base == len(a) and got.n_cur == len(b)
    assert got.d_num == best
    assert got.at_value == at
    d = best / (len(a) * len(b))
    assert got.d_stat == pytest.approx(d, abs=1e-9)
    lam = round(d, 9) * math.sqrt(len(a) * len(b) / (len(a) + len(b)))
    assert got.lambda_stat == pytest.approx(lam, abs=1e-9)
    assert got.d_stat > 0.1  # the planted +40 shift is material


def test_ks_identical_distributions(spark):
    rows = [Row(v=(i // 2) % 50, flag=i % 2 == 0) for i in range(1000)]
    got = ks_test(spark.createDataFrame(rows), "v", "flag").collect()[0]
    assert got.d_num == 0 and got.d_stat == 0.0


def test_jsd_matches_python(spark):
    rng = random.Random(97)
    words_a = ["alpha", "beta", "gamma", "delta"]
    words_b = ["beta", "gamma", "delta", "epsilon"]
    rows = [Row(w=rng.choice(words_a), base=True) for _ in range(600)]
    rows += [Row(w=rng.choice(words_b), base=False) for _ in range(500)]
    df = spark.createDataFrame(rows)
    out = js_divergence(df, "w", "base").collect()
    ca, cb = {}, {}
    for r in rows:
        (ca if r.base else cb)[r.w] = (ca if r.base else cb).get(r.w, 0) + 1
    ta, tb = sum(ca.values()), sum(cb.values())
    jsd = 0.0
    for w in set(ca) | set(cb):
        p, q = ca.get(w, 0) / ta, cb.get(w, 0) / tb
        m = 0.5 * (p + q)
        c = 0.5 * (p * math.log(p / m) if p else 0.0) + 0.5 * (
            q * math.log(q / m) if q else 0.0
        )
        jsd += round(c, 12)
    got = {r.w: r for r in out}
    assert set(got) == set(ca) | set(cb)
    for w, r in got.items():
        assert (r.cnt_base, r.cnt_cur) == (ca.get(w, 0), cb.get(w, 0))
        assert r.jsd == pytest.approx(jsd, abs=1e-12)
    # disjoint-vocab sanity: JSD of non-overlapping distributions = ln 2
    dis = spark.createDataFrame(
        [Row(w="x", base=True)] * 50 + [Row(w="y", base=False)] * 50
    )
    got2 = js_divergence(dis, "w", "base").collect()[0]
    assert got2.jsd == pytest.approx(math.log(2), abs=1e-9)


def test_k_anonymity_counts(spark):
    rows = [Row(zip3=f"z{i % 5}", age="a", n=i) for i in range(50)]
    rows += [Row(zip3="rare", age="b", n=99)]  # a singleton class
    df = spark.createDataFrame(rows).drop("n")
    out = k_anonymity(df, ["zip3", "age"], k=5, top_n=3).collect()
    assert all(r.n_groups == 6 for r in out)
    assert all(r.n_groups_lt_k == 1 for r in out)
    assert all(r.n_rows_at_risk == 1 for r in out)
    assert all(r.min_group_size == 1 for r in out)
    assert out[0].zip3 == "rare" and out[0].grp_size == 1


def test_l_diversity_homogeneity(spark):
    # class (q=1) is large but homogeneous in the sensitive column
    rows = [Row(q=1, s="leaky") for _ in range(20)]
    rows += [Row(q=2, s=f"v{i % 4}") for i in range(20)]
    df = spark.createDataFrame(rows)
    out = l_diversity(df, ["q"], "s", l=3, top_n=2).collect()
    assert out[0].q == 1 and out[0].l_distinct == 1
    assert out[0].n_classes_lt_l == 1 and out[0].n_rows_at_risk == 20
    assert out[1].q == 2 and out[1].l_distinct == 4


def test_reserved_prefix_rejected(spark):
    df = spark.createDataFrame([Row(_dr_v=1, b=True)])
    with pytest.raises(ValueError, match="_dr_"):
        ks_test(df, "_dr_v", "b")
    df2 = spark.createDataFrame([Row(_pr_x=1)])
    with pytest.raises(ValueError, match="_pr_"):
        k_anonymity(df2, ["_pr_x"])
