"""Schema-agnostic unit tests for the round-8 parametric operators:
operators/timeseries.kalman_level, operators/drift.hellinger,
operators/graph.hits, operators/sampling.systematic_sample.

Deliberately NOT testdata-bound (the rounds-5..7 extraction contract):
every test hand-builds frames with arbitrary column names and checks
against an independent pure-Python reference. The fixture-bound registry
queries (events_kalman_level, drift_hellinger, graph_hits,
sample_systematic) keep pinning exact-value semantics against DuckDB.
"""

from __future__ import annotations

import math
import random
from datetime import date, timedelta

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dataframe_differ_spark.operators.drift import hellinger
from dataframe_differ_spark.operators.graph import hits
from dataframe_differ_spark.operators.sampling import systematic_sample
from dataframe_differ_spark.operators.timeseries import kalman_level


# ---------------------------------------------------------------------------
# kalman_level
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sensor_df(spark):
    rng = random.Random(17)
    rows = []
    for sensor, base in (("t1", 50), ("t2", 200)):
        for i in range(25):
            rows.append(
                Row(
                    sensor=sensor,
                    at=date(2024, 5, 1) + timedelta(days=i),
                    reading=float(base + rng.randrange(-8, 9)),
                )
            )
    return spark.createDataFrame(rows)


def _py_kalman(ys, q=0.25, r=4.0, p0=16.0):
    l, p = ys[0], p0
    out = []
    for y in ys[1:]:
        pp = p + q
        k = pp / (pp + r)
        l = l + k * (y - l)
        p = (1.0 - k) * pp
        out.append((l, k, p))
    return out


def test_kalman_matches_python(spark, sensor_df):
    rows = sensor_df.collect()
    got = kalman_level(sensor_df, ["sensor"], "at", "reading").collect()
    for sensor in ("t1", "t2"):
        ys = [r.reading for r in sorted(rows, key=lambda r: r.at) if r.sensor == sensor]
        ref = _py_kalman(ys)
        mine = sorted([g for g in got if g.sensor == sensor], key=lambda g: g.at)
        assert len(mine) == len(ys) - 1
        for g, (l, k, p) in zip(mine, ref):
            assert g.level == pytest.approx(l, rel=1e-12)
            assert g.gain == pytest.approx(k, rel=1e-12)
            assert g.variance == pytest.approx(p, rel=1e-12)


def test_kalman_gain_settles(spark, sensor_df):
    """The gain must be monotonically decreasing toward the steady state
    fixed point of P = (1-K)(P+Q) — the property EWMA lacks."""
    got = sorted(
        kalman_level(sensor_df, ["sensor"], "at", "reading")
        .filter(F.col("sensor") == "t1")
        .collect(),
        key=lambda g: g.at,
    )
    gains = [g.gain for g in got]
    assert all(a >= b for a, b in zip(gains, gains[1:]))
    # steady state: the predicted variance x = P* + Q solves
    # x^2 - Qx - QR = 0, and K* = x / (x + R)
    q, r = 0.25, 4.0
    x = (q + math.sqrt(q * q + 4 * q * r)) / 2
    kstar = x / (x + r)
    assert gains[-1] == pytest.approx(kstar, abs=1e-3)


def test_kalman_single_observation_emits_nothing(spark):
    df = spark.createDataFrame([Row(g="a", t=1, v=5.0)])
    assert kalman_level(df, ["g"], "t", "v").count() == 0


# ---------------------------------------------------------------------------
# hellinger
# ---------------------------------------------------------------------------


def test_hellinger_matches_python(spark):
    occ = [("x", True)] * 30 + [("y", True)] * 10 + [("x", False)] * 10 + [
        ("y", False)
    ] * 30
    df = spark.createDataFrame(occ, ["cat", "is_old"])
    got = hellinger(df, "cat", "is_old").collect()
    bc = sum(
        round(math.sqrt((cb / 40) * (cc / 40)), 12)
        for cb, cc in ((30, 10), (10, 30))
    )
    want = math.sqrt(1 - bc)
    assert got[0].hellinger == pytest.approx(want, rel=1e-9)
    assert {r.cat for r in got} == {"x", "y"}
    assert all(r.n_base == 40 and r.n_cur == 40 for r in got)


def test_hellinger_identical_is_zero_and_disjoint_is_one(spark):
    same = spark.createDataFrame(
        [(c, b) for c in "abc" for b in (True, False) for _ in range(7)],
        ["tok", "flag"],
    )
    h0 = hellinger(same, "tok", "flag").collect()[0].hellinger
    assert h0 == pytest.approx(0.0, abs=1e-5)
    disjoint = spark.createDataFrame(
        [("a", True)] * 5 + [("b", False)] * 5, ["tok", "flag"]
    )
    h1 = hellinger(disjoint, "tok", "flag").collect()[0].hellinger
    assert h1 == pytest.approx(1.0, abs=1e-9)


def test_hellinger_reserved_prefix_rejected(spark):
    df = spark.createDataFrame([Row(_dr_x=1, f=True)])
    with pytest.raises(ValueError):
        hellinger(df, "_dr_x", "f")


# ---------------------------------------------------------------------------
# hits
# ---------------------------------------------------------------------------


def _py_hits(edges, iters=3):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    h = {n: 1.0 / len(nodes) for n in nodes}
    a = {}
    for _ in range(iters):
        a = {}
        for u, v in edges:
            a[v] = a.get(v, 0.0) + round(h.get(u, 0.0), 12)
        tot = sum(a.values())
        a = {n: s / tot for n, s in a.items()}
        h = {}
        for u, v in edges:
            h[u] = h.get(u, 0.0) + round(a[v], 12)
        tot = sum(h.values())
        h = {n: s / tot for n, s in h.items()}
    return h, a


def test_hits_matches_python(spark):
    # two hubs feeding a shared authority + a chain tail
    edges = [(1, 10), (2, 10), (1, 11), (3, 11), (10, 12), (2, 12)]
    df = spark.createDataFrame(edges, ["a", "b"])
    got = {r.node: (r.hub, r.authority) for r in hits(df, "a", "b").collect()}
    ph, pa = _py_hits(edges)
    for n, (gh, ga) in got.items():
        assert gh == pytest.approx(ph.get(n, 0.0), abs=1e-9)
        assert ga == pytest.approx(pa.get(n, 0.0), abs=1e-9)


def test_hits_star_graph(spark):
    """center -> leaves: the center is the ONLY hub, leaves split the
    authority mass evenly."""
    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {r.node: r for r in hits(df, "u", "v").collect()}
    assert got[0].hub == pytest.approx(1.0, abs=1e-9)
    assert got[0].authority == 0.0
    for i in range(1, 6):
        assert got[i].authority == pytest.approx(0.2, abs=1e-9)
        assert got[i].hub == 0.0


# ---------------------------------------------------------------------------
# systematic_sample
# ---------------------------------------------------------------------------


def test_systematic_sample_matches_python(spark):
    rng = random.Random(4)
    vals = rng.sample(range(100000), 500)
    df = spark.createDataFrame([(v, v * 3 % 97) for v in vals], ["k", "payload"])
    got = sorted(
        (r.k, r.sample_rank)
        for r in systematic_sample(df, ["k"], stride=7, offset=3).collect()
    )
    ordered = sorted(vals)
    want = sorted(
        (v, i + 1) for i, v in enumerate(ordered) if (i + 1) % 7 == 3
    )
    assert got == want


def test_systematic_sample_validation(spark):
    df = spark.createDataFrame([(1, 2)], ["k", "sample_rank"])
    with pytest.raises(ValueError):
        systematic_sample(df.select("k"), ["k"], stride=1)
    with pytest.raises(ValueError):
        systematic_sample(df.select("k"), ["k"], stride=4, offset=4)
    with pytest.raises(ValueError):
        systematic_sample(df, ["k"], stride=4)  # rank_col collision
