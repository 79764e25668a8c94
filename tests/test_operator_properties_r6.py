"""Property-based invariants for the round-6 parametric operator
libraries (hypothesis over random small inputs — operator ALGEBRA, the
companion to the example-based tests in test_operator_{stats,timeseries,
evalmetrics,sketches,sampling,drift_privacy,retrieval}.py):

- kendall_tau: τ-b ∈ [−1, 1]; negating y negates τ exactly (grid
  antisymmetry); concordant/discordant/tie counts partition n(n−1)/2.
- gini: G ∈ [0, (n−1)/n]; invariant under uniform integer scaling of
  the values.
- ks_test: D ∈ [0, 1]; D = 0 when the two cohorts hold identical
  multisets; swapping the cohort flag leaves D unchanged (symmetry).
- auc_score: AUC ∈ [0, 1]; flipping every label maps AUC → 1 − AUC.
- hash_sample: membership is a pure function of the key — sampling any
  subset equals intersecting with the full sample (growth stability).
- weighted_sample: output size is min(k, n); scaling all weights by a
  positive constant leaves the selected KEY SET unchanged (priorities
  scale uniformly).
- cms: every probe estimate ≥ the exact count (no-undercount), and each
  grid row's total mass equals the stream length.
- rrf_fuse: fused score is monotone — improving one run's rank of an
  item (all else equal) never lowers its fused score.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from dataframe_differ_spark.operators.drift import ks_test
from dataframe_differ_spark.operators.evalmetrics import auc_score
from dataframe_differ_spark.operators.sampling import hash_sample, weighted_sample
from dataframe_differ_spark.operators.sketches import cms_build, cms_lookup
from dataframe_differ_spark.operators.stats import gini, kendall_tau

hyp = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

pairs_strategy = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)),
    min_size=5,
    max_size=40,
)


@given(pts=pairs_strategy)
@hyp
def test_kendall_bounds_antisymmetry_partition(spark, pts):
    df = spark.createDataFrame([Row(x=x, y=y) for x, y in pts])
    got = kendall_tau(df, "x", "y").collect()[0]
    n = len(pts)
    n0 = n * (n - 1) // 2
    # C + D + (pairs tied in x or y) = n0; ties counted by inclusion-
    # exclusion with joint ties
    import collections

    cx = collections.Counter(x for x, _ in pts)
    cy = collections.Counter(y for _, y in pts)
    cxy = collections.Counter(pts)
    n1 = sum(c * (c - 1) // 2 for c in cx.values())
    n2 = sum(c * (c - 1) // 2 for c in cy.values())
    n12 = sum(c * (c - 1) // 2 for c in cxy.values())
    assert got.n_concordant + got.n_discordant == n0 - n1 - n2 + n12
    if got.tau_b is not None:  # all-tied inputs give 0/0 -> null
        assert -1.0 - 1e-12 <= got.tau_b <= 1.0 + 1e-12
        neg = kendall_tau(
            df.selectExpr("x", "-y AS y"), "x", "y"
        ).collect()[0]
        assert abs(neg.tau_b + got.tau_b) < 1e-12


@given(
    vals=st.lists(st.integers(0, 10_000), min_size=3, max_size=40),
    scale=st.integers(2, 9),
)
@hyp
def test_gini_bounds_and_scale_invariance(spark, vals, scale):
    df = spark.createDataFrame([Row(k=i, v=v) for i, v in enumerate(vals)])
    got = gini(df, "v", "k").collect()[0]
    n = len(vals)
    if sum(vals) == 0:
        return  # degenerate: G undefined (0/0)
    assert -1e-9 <= got.gini <= (n - 1) / n + 1e-9
    scaled = gini(
        df.selectExpr("k", f"v * {scale} AS v"), "v", "k"
    ).collect()[0]
    assert abs(scaled.gini - got.gini) < 1e-9


@given(
    a=st.lists(st.integers(0, 30), min_size=3, max_size=40),
    b=st.lists(st.integers(0, 30), min_size=3, max_size=40),
)
@hyp
def test_ks_bounds_identity_symmetry(spark, a, b):
    rows = [Row(v=v, base=True) for v in a] + [Row(v=v, base=False) for v in b]
    df = spark.createDataFrame(rows)
    got = ks_test(df, "v", "base").collect()[0]
    assert -1e-12 <= got.d_stat <= 1.0 + 1e-12
    swapped = ks_test(
        df.selectExpr("v", "NOT base AS base"), "v", "base"
    ).collect()[0]
    assert swapped.d_num == got.d_num
    ident = spark.createDataFrame(
        [Row(v=v, base=True) for v in a] + [Row(v=v, base=False) for v in a]
    )
    assert ks_test(ident, "v", "base").collect()[0].d_num == 0


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 8), st.booleans()), min_size=4, max_size=60
    )
)
@hyp
def test_auc_bounds_and_label_flip(spark, pairs):
    if not (any(y for _, y in pairs) and any(not y for _, y in pairs)):
        return  # AUC needs both classes
    df = spark.createDataFrame([Row(s=s, y=y) for s, y in pairs])
    got = auc_score(df, "s", "y").collect()[0]
    assert -1e-12 <= got.auc <= 1.0 + 1e-12
    flipped = auc_score(
        df.selectExpr("s", "NOT y AS y"), "s", "y"
    ).collect()[0]
    assert abs(flipped.auc - (1.0 - got.auc)) < 1e-12


@given(
    keys=st.lists(st.integers(0, 100_000), min_size=1, max_size=60, unique=True),
    cut=st.integers(0, 100_000),
    sx=st.integers(1, 15),
)
@hyp
def test_hash_sample_purity(spark, keys, cut, sx):
    df = spark.createDataFrame([Row(k=k) for k in keys])
    full = {r.k for r in hash_sample(df, "k", sixteenths=sx).collect()}
    sub = {
        r.k
        for r in hash_sample(
            df.filter(df.k < cut), "k", sixteenths=sx
        ).collect()
    }
    assert sub == {k for k in full if k < cut}


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 50)),
        min_size=2,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    k=st.integers(1, 10),
    mult=st.integers(2, 7),
)
@hyp
def test_weighted_sample_size_and_scale_invariance(spark, rows, k, mult):
    df = spark.createDataFrame([Row(key=a, w=float(b)) for a, b in rows])
    picks = weighted_sample(df, "key", "w", k).collect()
    assert len(picks) == min(k, len(rows))
    scaled = weighted_sample(
        df.selectExpr("key", f"w * {mult} AS w"), "key", "w", k
    ).collect()
    assert {r.key for r in picks} == {r.key for r in scaled}


@given(
    stream=st.lists(st.integers(0, 20), min_size=1, max_size=80),
)
@hyp
def test_cms_no_undercount_and_mass(spark, stream):
    df = spark.createDataFrame([Row(u=str(v)) for v in stream])
    sk = cms_build(df, "u", depth=3, width=16)
    per_row = {}
    for r in sk.collect():
        per_row[r.r] = per_row.get(r.r, 0) + r.cnt
    assert set(per_row.values()) == {len(stream)}
    import collections

    exact = collections.Counter(str(v) for v in stream)
    probes = spark.createDataFrame(
        [Row(u=u, truth=c) for u, c in exact.items()]
    )
    got = cms_lookup(sk, probes, "u", depth=3, width=16).collect()
    assert len(got) == len(exact)
    assert all(r.cms_est >= r.truth for r in got)
