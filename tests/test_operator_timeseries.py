"""Schema-agnostic unit tests for the round-6 parametric time-series
operators (operators/timeseries.py).

Deliberately NOT testdata-bound: every test hand-builds a series with
arbitrary column names (store/day/sales, t/load, ...) and checks against
an independent pure-Python reference — the extraction contract
established in rounds 5–6. The fixture-bound registry queries
(events_holt_linear, events_changepoint_cusum, ...) keep pinning the
exact-value semantics against the DuckDB oracles.
"""

from __future__ import annotations

import math
import random
from datetime import date, timedelta

import pytest
from pyspark.sql import Row

from dataframe_differ_spark.operators.timeseries import (
    autocorr,
    cusum,
    ewma,
    holt_linear,
    mad_outliers,
    seasonality,
    theil_sen,
)


@pytest.fixture(scope="module")
def series_df(spark):
    """(store, day, sales): two stores, 30 days, integer values with a
    planted level shift in store B's last 10 days."""
    rng = random.Random(9)
    rows = []
    for s, base in (("A", 100), ("B", 80)):
        for i in range(30):
            lift = 40 if (s == "B" and i >= 20) else 0
            rows.append(
                Row(
                    store=s,
                    day=date(2024, 3, 1) + timedelta(days=i),
                    sales=base + lift + rng.randrange(0, 21),
                )
            )
    return spark.createDataFrame(rows)


def _series(rows, store):
    return [r.sales for r in sorted(rows, key=lambda r: r.day) if r.store == store]


def test_ewma_matches_python(spark, series_df):
    rows = series_df.collect()
    got = {
        (r.store, r.day): r.ewma
        for r in ewma(series_df, ["store"], "day", "sales", alpha=0.25).collect()
    }
    for s in ("A", "B"):
        xs = _series(rows, s)
        y = float(xs[0])
        days = sorted(r.day for r in rows if r.store == s)
        assert got[(s, days[0])] == y
        for i in range(1, len(xs)):
            y = 0.25 * xs[i] + 0.75 * y
            assert abs(got[(s, days[i])] - y) < 1e-12


def test_holt_matches_python(spark, series_df):
    rows = series_df.collect()
    out = holt_linear(series_df, ["store"], "day", "sales").collect()
    got = {(r.store, r.day): r for r in out}
    for s in ("A", "B"):
        xs = _series(rows, s)
        days = sorted(r.day for r in rows if r.store == s)
        l, b = float(xs[0]), 0.0
        assert got[(s, days[0])].forecast == xs[0]
        for i in range(1, len(xs)):
            yhat = l + b
            nl = 0.5 * xs[i] + 0.5 * (l + b)
            b = 0.25 * (nl - l) + 0.75 * b
            l = nl
            g = got[(s, days[i])]
            assert abs(g.level - l) < 1e-9
            assert abs(g.trend - b) < 1e-9
            assert abs(g.forecast - yhat) < 1e-9


def test_cusum_matches_python_and_alarms(spark, series_df):
    rows = series_df.collect()
    out = cusum(series_df, ["store"], "day", "sales").collect()
    got = {(r.store, r.day): r for r in out}
    alarmed = set()
    for s in ("A", "B"):
        xs = _series(rows, s)
        days = sorted(r.day for r in rows if r.store == s)
        n = len(xs)
        mu = sum(xs) / n
        sigma = math.sqrt((sum(x * x for x in xs) - sum(xs) ** 2 / n) / n)
        hi = lo = 0.0
        for i, x in enumerate(xs):
            hi = max(0.0, hi + x - mu - 0.5 * sigma)
            lo = min(0.0, lo + x - mu + 0.5 * sigma)
            g = got[(s, days[i])]
            assert abs(g.cusum_hi - hi) < 1e-9
            assert abs(g.cusum_lo - lo) < 1e-9
            assert g.alarm == (hi > 4 * sigma or lo < -4 * sigma)
            if g.alarm:
                alarmed.add(s)
    # the planted +40 shift in store B's tail must trip the detector
    assert "B" in alarmed and "A" not in alarmed


def test_autocorr_detects_period(spark):
    # strict period-3 sawtooth: lag-3/6 autocorr == 1, others negative
    rows = [Row(t=i, load=[10, 50, 90][i % 3]) for i in range(30)]
    df = spark.createDataFrame(rows)
    got = {r.lag: r for r in autocorr(df, "t", "load", max_lag=6).collect()}
    assert got[3].autocorr == pytest.approx(1.0, abs=1e-12)
    assert got[6].autocorr == pytest.approx(1.0, abs=1e-12)
    assert got[1].autocorr < 0 and got[2].autocorr < 0
    assert got[1].n_pairs == 29 and got[6].n_pairs == 24


def test_autocorr_gap_indices(spark):
    # missing index rows just mean fewer pairs, never wrong pairing
    rows = [Row(t=i, load=i * i) for i in range(20) if i != 7]
    df = spark.createDataFrame(rows)
    got = {r.lag: r for r in autocorr(df, "t", "load", max_lag=2).collect()}
    assert got[1].n_pairs == 17  # 19 rows, pairs (i, i+1) minus 6-7 and 7-8
    assert got[2].n_pairs == 16


def test_seasonality_matches_python(spark, series_df):
    from pyspark.sql import functions as F

    df = series_df.withColumn("dow", F.dayofweek("day"))
    rows = df.collect()
    per = {}
    for r in rows:
        per.setdefault(r.dow, []).append(r.sales)
    overall = sum(r.sales for r in rows) / len(rows)
    out = seasonality(df, "dow", "sales").collect()
    assert len(out) == len(rows)
    for r in out:
        idx = (sum(per[r.dow]) / len(per[r.dow])) / overall
        assert abs(r.seasonal_idx - idx) < 1e-12
        assert abs(r.deseasonalized - r.sales / idx) < 1e-9


def test_theil_sen_robust_to_outliers(spark):
    # y = 3t + 7 with two wild outliers; Theil-Sen must recover slope 3
    rows = [Row(t=i, y=3 * i + 7) for i in range(25)]
    rows[5] = Row(t=5, y=1000)
    rows[17] = Row(t=17, y=-500)
    df = spark.createDataFrame(rows)
    got = theil_sen(df, "t", "y").collect()[0]
    assert got.slope == pytest.approx(3.0, abs=1e-12)
    assert got.intercept == pytest.approx(7.0, abs=1e-9)
    assert got.n_points == 25 and got.n_pairs == 300


def test_mad_outliers_counts(spark):
    rng = random.Random(3)
    rows = [Row(sensor="s1", v=100 + rng.randrange(0, 5)) for _ in range(50)]
    rows += [Row(sensor="s1", v=10_000)]  # one wild point
    rows += [Row(sensor="s2", v=7) for _ in range(20)]  # zero-MAD group
    df = spark.createDataFrame(rows)
    got = {r.sensor: r for r in mad_outliers(df, ["sensor"], "v").collect()}
    assert got["s1"].n == 51 and got["s1"].n_outliers == 1
    assert got["s2"].mad == 0 and got["s2"].n_outliers == 0


def test_reserved_prefix_rejected(spark):
    df = spark.createDataFrame([Row(_ts_x=1, g="a", t=1)])
    with pytest.raises(ValueError, match="_ts_"):
        ewma(df, ["g"], "t", "_ts_x")


def test_crosscorr_detects_lead(spark):
    from dataframe_differ_spark.operators.timeseries import crosscorr

    # b is a copy of a shifted 3 steps later: peak correlation at lag +3
    base = [10, 50, 20, 80, 30, 90, 40, 100, 25, 60] * 3
    a = spark.createDataFrame([Row(t=i, v=base[i]) for i in range(30)])
    b = spark.createDataFrame(
        [Row(t=i + 3, v=base[i]) for i in range(30)]
    )
    got = {r.lag: r for r in crosscorr(a, b, "t", "v", max_lag=5).collect()}
    assert got[3].crosscorr == pytest.approx(1.0, abs=1e-12)
    assert all(
        got[k].crosscorr < 0.99 for k in got if k != 3
    )
    # pair counts shrink with |lag - 3| of the overlap window
    assert got[3].n_pairs == 30


def test_fold_operators_survive_ansi_mode(spark, series_df):
    """ewma/holt/cusum run on a user session with ANSI on (Spark 4's
    default): the empty-accumulator access must be guarded by
    size(acc) = 0, not by NULL + coalesce (round-7 ADVICE fix for
    cusum — element_at(acc, -1) throws INVALID_ARRAY_INDEX under ANSI)."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        assert cusum(series_df, ["store"], "day", "sales").count() == 60
        assert ewma(series_df, ["store"], "day", "sales", alpha=0.3).count() == 60
        assert (
            holt_linear(series_df, ["store"], "day", "sales").count() == 60
        )
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
