"""Schema-agnostic unit tests for the round-6 parametric statistics
operators (operators/stats.py).

Deliberately NOT testdata-bound: every test hand-builds a DataFrame with
arbitrary column names (spend/arm, score/cohort, ...) and checks against
an independent pure-Python/numpy reference — the extraction contract from
VERDICT r5 item #2. The fixture-bound registry queries (stats_welch_ttest,
stats_anova_f, ...) keep pinning the exact-value semantics against the
DuckDB oracles.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dataframe_differ_spark.operators.stats import (
    anova_f,
    chi2_independence,
    fdr_bh,
    mann_whitney,
    spearman,
    welch_ttest,
)


@pytest.fixture(scope="module")
def ab_df(spark):
    """(uid, spend, arm): two arms with a planted location shift, integer
    values, deliberate ties."""
    rng = random.Random(42)
    rows = []
    for i in range(400):
        arm = i % 2 == 0
        base = 500 if arm else 460
        rows.append(Row(uid=i, spend=base + rng.randrange(0, 200, 5), arm=arm))
    return spark.createDataFrame(rows)


def _ab_values(ab_rows):
    a = [r.spend for r in ab_rows if r.arm]
    b = [r.spend for r in ab_rows if not r.arm]
    return a, b


def test_welch_matches_numpy(spark, ab_df):
    import numpy as np

    got = welch_ttest(ab_df, "spend", "arm").collect()[0]
    a, b = _ab_values(ab_df.collect())
    a, b = np.array(a, float), np.array(b, float)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se)
    dfw = se * se / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert got.n_a == len(a) and got.n_b == len(b)
    assert abs(got.mean_a - a.mean()) < 1e-3
    assert abs(got.t_stat - t) < 1e-6
    assert abs(got.df_welch - dfw) < 1e-4
    assert got.significant == (abs(t) > 1.96)


def test_anova_matches_numpy(spark):
    import numpy as np

    rng = random.Random(7)
    rows = [
        Row(cohort=g, score=(g + 1) * 10 + rng.randrange(0, 30))
        for g in range(4)
        for _ in range(50)
    ]
    df = spark.createDataFrame(rows)
    got = anova_f(df, "score", "cohort").collect()[0]
    groups = [
        np.array([r.score for r in rows if r.cohort == g], float)
        for g in range(4)
    ]
    allv = np.concatenate(groups)
    ssb = sum(len(g) * (g.mean() - allv.mean()) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (len(groups) - 1)) / (ssw / (len(allv) - len(groups)))
    assert got.k_groups == 4 and got.n_obs == 200
    assert abs(got.ss_between - ssb) < 1e-6 * max(1.0, ssb)
    assert abs(got.ss_within - ssw) < 1e-6 * max(1.0, ssw)
    assert abs(got.f_stat - f) < 1e-6
    assert abs(got.eta_sq - ssb / (ssb + ssw)) < 1e-9


def test_chi2_matches_numpy(spark):
    import numpy as np

    rng = random.Random(11)
    cats_a = ["x", "y", "z"]
    cats_b = ["p", "q"]
    rows = [
        Row(color=rng.choice(cats_a), shape=rng.choice(cats_b))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows)
    got = chi2_independence(df, "color", "shape").collect()[0]
    obs = np.zeros((3, 2))
    for r in rows:
        obs[cats_a.index(r.color), cats_b.index(r.shape)] += 1
    e = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / obs.sum()
    chi2 = ((obs - e) ** 2 / e).sum()
    assert got.n_obs == 300 and got.n_cells == 6 and got.dof == 2
    assert abs(got.chi2 - chi2) < 1e-6
    assert abs(got.cramers_v - math.sqrt(chi2 / (300 * 1))) < 1e-9


def test_mann_whitney_matches_python(spark, ab_df):
    got = mann_whitney(ab_df, "spend", "arm").collect()[0]
    a, b = _ab_values(ab_df.collect())
    pooled = sorted(a + b)
    # midranks with ties
    rank_of = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        rank_of[pooled[i]] = (i + 1 + j) / 2
        i = j
    r1 = sum(rank_of[v] for v in a)
    n1, n2 = len(a), len(b)
    u1 = r1 - n1 * (n1 + 1) / 2
    n = n1 + n2
    ties = sum(
        c**3 - c
        for c in __import__("collections").Counter(pooled).values()
    )
    sigma = math.sqrt(n1 * n2 / 12 * ((n + 1) - ties / (n * (n - 1))))
    z = (u1 - n1 * n2 / 2) / sigma
    assert got.n1 == n1 and got.n2 == n2
    assert abs(got.u1 - u1) < 1e-9
    assert abs(got.u2 - (n1 * n2 - u1)) < 1e-9
    assert abs(got.z_score - z) < 1e-6


def test_spearman_matches_python(spark):
    rng = random.Random(5)
    # monotone-ish relation with ties and noise
    rows = [
        Row(xx=v, yy=(v // 3) + rng.randrange(0, 4))
        for v in [rng.randrange(0, 40) for _ in range(250)]
    ]
    df = spark.createDataFrame(rows)
    got = spearman(df, "xx", "yy").collect()[0]

    def midranks(vals):
        s = sorted(vals)
        first = {}
        for idx, v in enumerate(s):
            first.setdefault(v, idx)
        from collections import Counter

        cnt = Counter(s)
        return [first[v] + 1 + (cnt[v] - 1) / 2 for v in vals]

    def pearson(x, y):
        n = len(x)
        sx, sy = sum(x), sum(y)
        sxy = sum(a * b for a, b in zip(x, y))
        sxx = sum(a * a for a in x)
        syy = sum(b * b for b in y)
        return (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )

    xs = [r.xx for r in rows]
    ys = [r.yy for r in rows]
    assert got.n == 250
    assert abs(got.spearman_rho - pearson(midranks(xs), midranks(ys))) < 1e-8
    assert abs(got.pearson_r - pearson(xs, ys)) < 1e-8
    assert got.spearman_rho > 0.8  # the planted monotone relation


def test_fdr_bh_stepup(spark):
    # hand-built test frame: p-values with a known BH outcome at q=0.05.
    # sig key = round(|z|*1e9) proxy: larger = smaller p.
    tests = [
        ("t1", 0.001), ("t2", 0.008), ("t3", 0.039), ("t4", 0.041),
        ("t5", 0.20), ("t6", 0.74),
    ]
    rows = [
        Row(test_id=tid, p=p, key=int(round((1.0 - p) * 1e9)))
        for tid, p in tests
    ]
    df = spark.createDataFrame(rows)
    got = {
        r.test_id: r
        for r in fdr_bh(
            df, "p", sig_key_col="key", tie_col="test_id", q=0.05
        ).collect()
    }
    # BH: sorted p = .001 .008 .039 .041 .20 .74; crit = i/6*.05
    # .001<=.0083 ok; .008<=.0167 ok; .039>.025 no; .041>.0333 no;
    # k* = 2 -> reject exactly t1, t2
    assert [got[t].p_rank for t in ("t1", "t2", "t3", "t4", "t5", "t6")] == [
        1, 2, 3, 4, 5, 6,
    ]
    assert all(got[t].n_tests == 6 for t in got)
    assert {t for t in got if got[t].reject} == {"t1", "t2"}
    assert abs(got["t3"].bh_critical - 0.05 * 3 / 6) < 1e-9


def test_fdr_bh_no_rejections(spark):
    rows = [
        Row(test_id=f"t{i}", p=0.5 + i / 100, key=10 - i) for i in range(5)
    ]
    df = spark.createDataFrame(rows)
    out = fdr_bh(df, "p", sig_key_col="key", tie_col="test_id").collect()
    assert all(not r.reject for r in out)


def test_reserved_prefix_rejected(spark):
    df = spark.createDataFrame([Row(_st_v=1, g=True)])
    with pytest.raises(ValueError, match="_st_"):
        welch_ttest(df, "_st_v", "g")


def test_kendall_tau_matches_python(spark):
    rng = random.Random(13)
    rows = [
        Row(sz=rng.randrange(1, 8), band=min(9, rng.randrange(0, 8) + rng.randrange(0, 3)))
        for _ in range(300)
    ]
    from dataframe_differ_spark.operators.stats import kendall_tau

    got = kendall_tau(spark.createDataFrame(rows), "sz", "band").collect()[0]
    pts = [(r.sz, r.band) for r in rows]
    C = D = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = (pts[i][0] > pts[j][0]) - (pts[i][0] < pts[j][0])
            dy = (pts[i][1] > pts[j][1]) - (pts[i][1] < pts[j][1])
            if dx * dy > 0:
                C += 1
            elif dx * dy < 0:
                D += 1
    n = len(pts)
    from collections import Counter

    n1 = sum(c * (c - 1) // 2 for c in Counter(x for x, _ in pts).values())
    n2 = sum(c * (c - 1) // 2 for c in Counter(y for _, y in pts).values())
    n0 = n * (n - 1) // 2
    tau = (C - D) / math.sqrt((n0 - n1) * (n0 - n2))
    assert (got.n, got.n_concordant, got.n_discordant) == (n, C, D)
    assert (got.ties_x, got.ties_y) == (n1, n2)
    assert abs(got.tau_b - tau) < 1e-12


def test_kendall_tau_perfect_orders(spark):
    from dataframe_differ_spark.operators.stats import kendall_tau

    inc = spark.createDataFrame([Row(a=i, b=i * 2) for i in range(20)])
    assert kendall_tau(inc, "a", "b").collect()[0].tau_b == 1.0
    dec = spark.createDataFrame([Row(a=i, b=-i) for i in range(20)])
    assert kendall_tau(dec, "a", "b").collect()[0].tau_b == -1.0


def test_levene_bf_matches_python(spark):
    rng = random.Random(29)
    # group B has ~3x the spread of group A -> large F
    rows = [Row(g="A", v=1000 + rng.randrange(-50, 51)) for _ in range(151)]
    rows += [Row(g="B", v=1000 + rng.randrange(-150, 151)) for _ in range(140)]
    from dataframe_differ_spark.operators.stats import levene_bf

    got = levene_bf(spark.createDataFrame(rows), "v", "g").collect()[0]

    def _median(xs):
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    groups = {}
    for r in rows:
        groups.setdefault(r.g, []).append(r.v)
    z = {
        g: [abs(2 * v - int(2 * _median(vs))) for v in vs]
        for g, vs in groups.items()
    }
    allz = [x for vs in z.values() for x in vs]
    gm = sum(allz) / len(allz)
    ssb = sum(len(vs) * (sum(vs) / len(vs) - gm) ** 2 for vs in z.values())
    ssw = sum(
        sum((x - sum(vs) / len(vs)) ** 2 for x in vs) for vs in z.values()
    )
    f = (ssb / (2 - 1)) / (ssw / (len(allz) - 2))
    assert got.k_groups == 2 and got.n_obs == len(rows)
    assert abs(got.f_stat - f) < 1e-6
    assert got.f_stat > 10  # the planted variance gap is material


def test_gini_extremes_and_reference(spark):
    from dataframe_differ_spark.operators.stats import gini

    equal = spark.createDataFrame([Row(uid=i, cents=500) for i in range(40)])
    assert abs(gini(equal, "cents", "uid").collect()[0].gini) < 1e-12
    # one holder owns everything -> G = (n-1)/n
    conc = spark.createDataFrame(
        [Row(uid=i, cents=0) for i in range(39)] + [Row(uid=99, cents=10_000)]
    )
    g = gini(conc, "cents", "uid").collect()[0]
    assert abs(g.gini - 39 / 40) < 1e-12
    # general reference: G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))
    rng = random.Random(37)
    vals = [rng.randrange(0, 10_000) for _ in range(200)]
    df = spark.createDataFrame([Row(uid=i, cents=v) for i, v in enumerate(vals)])
    got = gini(df, "cents", "uid").collect()[0]
    s = sorted(vals)
    ref = (
        2 * sum((i + 1) * v for i, v in enumerate(s)) - (200 + 1) * sum(s)
    ) / (200 * sum(s))
    assert abs(got.gini - ref) < 1e-9
    assert got.n == 200 and got.total == sum(vals)


def test_split_cast_double_matches_plain_cast_and_duckdb(spark):
    """The shared int128→double split-cast device (operators/numeric.py,
    promoted round 7) must agree with a plain double cast below 2^53,
    with the inline hi/lo reconstruction everywhere, and with its own
    DuckDB SQL twin — including past 2^64 where plain engine casts can
    diverge by one ulp (the round-6 sf0.1 bug)."""
    import duckdb
    from pyspark.sql import functions as F

    from dataframe_differ_spark.operators.numeric import (
        split_cast_double,
        split_cast_sql,
    )

    vals = [0, 1, 123456789, 2**31 - 1, 2**53 + 1, 2**63 - 7,
            2**64 + 12345, 3**45, 10**22 + 987654321, 2**72 + 3,
            # sign-safety: Spark's trunc-division form and DuckDB's //
            # agree for negatives too (covariance numerators)
            -5, -(2**64 + 12345), -(10**22 + 987654321)]
    df = spark.createDataFrame([(str(v),) for v in vals], "x string").select(
        F.col("x").cast("decimal(38,0)").alias("x")
    )
    rows = df.select(
        "x", split_cast_double(F.col("x")).alias("d")
    ).collect()
    for r in rows:
        v = int(r["x"])
        assert r["d"] == float(v) if v < 2**53 else True
        duck = duckdb.sql(f"SELECT {split_cast_sql(str(v))} AS d").fetchone()[0]
        assert r["d"] == duck, (v, r["d"], duck)


def test_welch_ttest_survives_big_cents(spark):
    """Round-7 ADVICE fix: Σv² accumulates in DECIMAL(38,0), so values
    whose squares sum past 2^63 no longer wrap (native BIGINT sums
    silently did, with ANSI off). 3 rows of 2e9-cent values per arm:
    Σv² = 1.2e19 > 2^63 ≈ 9.2e18."""
    import math

    from pyspark.sql import Row

    from dataframe_differ_spark.operators.stats import welch_ttest

    a = [1_000_000_000, 2_000_000_000, 3_000_000_000]  # Σv² = 1.4e19 > 2^63
    b = [500_000_000, 1_500_000_000, 2_500_000_000]
    rows = [Row(v=v, t=True) for v in a] + [Row(v=v, t=False) for v in b]
    out = welch_ttest(spark.createDataFrame(rows), "v", "t").collect()[0]
    # pure-Python reference (the wrapped BIGINT version yields a negative
    # variance here -> sqrt NaN -> t_stat None)
    ma, mb = sum(a) / 3, sum(b) / 3
    va = sum((x - ma) ** 2 for x in a) / 2
    vb = sum((x - mb) ** 2 for x in b) / 2
    t_ref = (ma - mb) / math.sqrt(va / 3 + vb / 3)
    assert out.n_a == 3 and out.n_b == 3
    assert out.t_stat is not None
    assert abs(out.t_stat - t_ref) < 1e-6 * abs(t_ref)
