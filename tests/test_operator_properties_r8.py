"""Property-based invariants for the round-8 operator additions (the
hypothesis companion to the example-based tests in
test_operator_additions_r8.py):

- hellinger: 0 ≤ H ≤ 1 on random two-cohort corpora; symmetric under
  swapping the cohort flag; 0 when the two cohorts are the same
  multiset; and the Bhattacharyya total matches a Python replication of
  the rounded-contribution sum.
- kalman_level: the filtered level is always a convex combination of
  the initial observation and the subsequent data, so it stays inside
  [min(series), max(series)]; gains stay in (0, 1] and decrease
  monotonically (constant Q, R ⇒ the variance recursion is a
  contraction toward the steady state from above).
- systematic_sample: for a random stride/offset, the selected ranks are
  exactly {r : r ≡ offset (mod stride)} over the true sorted order, and
  the union over ALL offsets partitions the input.
- hits: hub/authority scores are non-negative and each side sums to ~1
  (L1 normalization survives the DECIMAL contribution rounding to
  within vocab·5e-13), on random DAG-ish edge lists.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from dataframe_differ_spark.operators.drift import hellinger
from dataframe_differ_spark.operators.graph import hits
from dataframe_differ_spark.operators.sampling import systematic_sample
from dataframe_differ_spark.operators.timeseries import kalman_level

hyp = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

occurrences = st.lists(
    st.tuples(st.sampled_from("abcd"), st.booleans()),
    min_size=2,
    max_size=40,
).filter(
    lambda o: any(b for _, b in o) and any(not b for _, b in o)
)


@given(occ=occurrences)
@hyp
def test_hellinger_bounds_and_symmetry(spark, occ):
    df = spark.createDataFrame([Row(it=i, fl=f) for i, f in occ])
    h = hellinger(df, "it", "fl").collect()
    val = h[0].hellinger
    assert 0.0 <= val <= 1.0
    flipped = spark.createDataFrame([Row(it=i, fl=not f) for i, f in occ])
    h2 = hellinger(flipped, "it", "fl").collect()
    assert h2[0].hellinger == val
    # python replication of the rounded BC sum
    from collections import Counter

    cb = Counter(i for i, f in occ if f)
    cc = Counter(i for i, f in occ if not f)
    nb, nc = sum(cb.values()), sum(cc.values())
    bc = sum(
        round(math.sqrt((cb.get(i, 0) / nb) * (cc.get(i, 0) / nc)), 12)
        for i in set(cb) | set(cc)
    )
    assert abs(h[0].bc_total - bc) < 1e-12


@given(occ=occurrences)
@hyp
def test_hellinger_identical_cohorts_zero(spark, occ):
    # mirror every occurrence into both cohorts → P == Q → H ≈ 0
    rows = [Row(it=i, fl=True) for i, _ in occ] + [
        Row(it=i, fl=False) for i, _ in occ
    ]
    df = spark.createDataFrame(rows)
    h = hellinger(df, "it", "fl").collect()[0].hellinger
    assert h < 1e-5


series_strategy = st.lists(
    st.integers(-50, 50), min_size=2, max_size=20
)


@given(ys=series_strategy)
@hyp
def test_kalman_level_bounded_and_gain_monotone(spark, ys):
    df = spark.createDataFrame(
        [Row(g="s", t=i, v=float(y)) for i, y in enumerate(ys)]
    )
    out = sorted(kalman_level(df, ["g"], "t", "v").collect(), key=lambda r: r.t)
    lo, hi = min(ys), max(ys)
    gains = [r.gain for r in out]
    for r in out:
        assert lo - 1e-9 <= r.level <= hi + 1e-9
        assert 0.0 < r.gain <= 1.0
        assert r.variance > 0.0
    assert all(a >= b - 1e-15 for a, b in zip(gains, gains[1:]))


@given(
    n=st.integers(3, 60),
    stride=st.integers(2, 7),
    data=st.data(),
)
@hyp
def test_systematic_sample_partitions(spark, n, stride, data):
    offset = data.draw(st.integers(0, stride - 1))
    keys = data.draw(
        st.lists(
            st.integers(0, 10_000), min_size=n, max_size=n, unique=True
        )
    )
    df = spark.createDataFrame([Row(k=k) for k in keys])
    ordered = sorted(keys)
    got = sorted(
        (r.k, r.sample_rank)
        for r in systematic_sample(df, ["k"], stride=stride, offset=offset).collect()
    )
    want = sorted(
        (v, i + 1)
        for i, v in enumerate(ordered)
        if (i + 1) % stride == offset
    )
    assert got == want
    # all offsets together partition the input
    total = 0
    for off in range(stride):
        total += systematic_sample(df, ["k"], stride=stride, offset=off).count()
    assert total == n


edges_strategy = st.lists(
    st.tuples(st.integers(0, 6), st.integers(7, 12)),
    min_size=1,
    max_size=20,
    unique=True,
)


@given(edges=edges_strategy)
@hyp
def test_hits_simplex(spark, edges):
    df = spark.createDataFrame([Row(u=u, v=v) for u, v in edges])
    out = hits(df, "u", "v").collect()
    hub_sum = sum(r.hub for r in out)
    auth_sum = sum(r.authority for r in out)
    for r in out:
        assert r.hub >= 0.0 and r.authority >= 0.0
    assert abs(hub_sum - 1.0) < 1e-9
    assert abs(auth_sum - 1.0) < 1e-9
