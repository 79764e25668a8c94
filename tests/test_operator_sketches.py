"""Schema-agnostic unit tests for the round-6 parametric sketch operators
(operators/sketches.py).

Hand-built frames with arbitrary column names, checked against exact
counts / pure-Python references. The fixture-bound registry queries
(sketch_cms_topk, drift_psi, agg_hll_merge) keep pinning exact-value
semantics against the DuckDB oracles.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import Row

from dataframe_differ_spark.operators.sketches import (
    cms_build,
    cms_lookup,
    hll_rollup,
    psi_bins,
)


def test_cms_never_undercounts_and_is_tight_when_sparse(spark):
    rng = random.Random(31)
    # zipf-ish key stream: key i appears ~1000/i times
    stream = []
    for i in range(1, 40):
        stream += [f"url{i}"] * (1000 // i)
    rng.shuffle(stream)
    df = spark.createDataFrame([Row(u=u) for u in stream])
    sk = cms_build(df, "u", depth=4, width=256)
    grid = sk.collect()
    assert all(0 <= r.b < 256 and 0 <= r.r < 4 for r in grid)
    # total mass per row equals the stream length
    per_row = {}
    for r in grid:
        per_row[r.r] = per_row.get(r.r, 0) + r.cnt
    assert set(per_row.values()) == {len(stream)}
    exact = {}
    for u in stream:
        exact[u] = exact.get(u, 0) + 1
    probes = spark.createDataFrame(
        [Row(u=u, truth=c) for u, c in list(exact.items())[:10]]
    )
    got = cms_lookup(sk, probes, "u", depth=4, width=256).collect()
    assert len(got) == 10
    for r in got:
        assert r.cms_est >= r.truth  # count-min can only overcount


def test_cms_merge_by_cell_addition(spark):
    a = spark.createDataFrame([Row(k=str(i % 7)) for i in range(100)])
    b = spark.createDataFrame([Row(k=str(i % 5)) for i in range(60)])
    merged = (
        cms_build(a, "k").unionAll(cms_build(b, "k"))
        .groupBy("r", "b")
        .agg(__import__("pyspark.sql.functions", fromlist=["sum"]).sum("cnt").alias("cnt"))
    )
    direct = cms_build(a.unionAll(b), "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_cms_depth_over_4_rejected(spark):
    df = spark.createDataFrame([Row(k="x")])
    with pytest.raises(ValueError, match="depth"):
        cms_build(df, "k", depth=5)


def test_psi_matches_python_and_detects_shift(spark):
    rng = random.Random(41)
    rows = []
    # baseline uniform over bins 0-4; current shifted toward bin 4
    for _ in range(500):
        rows.append(Row(band=rng.randrange(0, 5), base=True))
    for _ in range(500):
        rows.append(Row(band=min(4, rng.randrange(0, 5) + rng.randrange(0, 3)), base=False))
    df = spark.createDataFrame(rows)
    out = psi_bins(df, "band", "base", n_bins=5).collect()
    nb = {r.band: 0 for r in rows}
    nc = dict(nb)
    for r in rows:
        (nb if r.base else nc)[r.band] += 1
    tb, tc = sum(nb.values()), sum(nc.values())
    psi = 0.0
    for r in out:
        p = (nb[r.bin] + 1) / (tb + 5)
        q = (nc[r.bin] + 1) / (tc + 5)
        contrib = (p - q) * math.log(p / q)
        assert abs(r.psi_bin - contrib) < 1e-12
        psi += contrib
    assert psi > 0.1  # the planted shift is material


def test_psi_identical_cohorts_near_zero(spark):
    # both cohorts drawn from the same uniform bin distribution
    rows = [Row(g=(i // 2) % 4, base=i % 2 == 0) for i in range(400)]
    out = psi_bins(spark.createDataFrame(rows), "g", "base").collect()
    assert sum(r.psi_bin for r in out) < 1e-6


def test_hll_rollup_levels_and_bounds(spark):
    rng = random.Random(53)
    rows = [
        Row(region=f"r{i % 3}", shop=f"s{i % 9}", user=rng.randrange(0, 400))
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows)
    out = hll_rollup(
        df,
        "user",
        ["region", "shop"],
        {"shop": ["region", "shop"], "region": ["region"], "total": []},
    ).collect()
    exact = {}
    for r in rows:
        exact.setdefault(("shop", f"{r.region}|{r.shop}"), set()).add(r.user)
        exact.setdefault(("region", r.region), set()).add(r.user)
        exact.setdefault(("total", "all"), set()).add(r.user)
    assert {(r.level, r.key) for r in out} == set(exact)
    for r in out:
        e = len(exact[(r.level, r.key)])
        assert abs(r.estimate - e) <= max(2.0, 0.05 * e)


def test_hll_rollup_unknown_level_col_rejected(spark):
    df = spark.createDataFrame([Row(a="x", v=1)])
    with pytest.raises(ValueError, match="non-fine"):
        hll_rollup(df, "v", ["a"], {"bad": ["zz"]})


def test_reserved_prefix_rejected(spark):
    df = spark.createDataFrame([Row(_sk_h=1)])
    with pytest.raises(ValueError, match="_sk_"):
        cms_build(df, "_sk_h")
