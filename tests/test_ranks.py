"""Unit tests for the two-phase distributed rank operator (operators/ranks).

The registered sketch siblings already prove value-identity to their
single-partition twins through the shared DuckDB oracles; these tests pin
the operator's edge semantics directly: tie handling across buckets,
descending order, running sums, degenerate (constant-key) bucketing, and
the NTILE formula on non-divisible and n < k inputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dataframe_differ_spark.operators.ranks import ntile_from_rank, ranked


def _ref_vs_ranked(spark, df, key, order_cols, ascending, k):
    w = Window.orderBy(*order_cols)
    ref = df.select(
        "id",
        F.row_number().over(w).alias("rk"),
        F.ntile(k).over(w).alias("nt"),
    )
    got = ranked(
        df,
        key,
        order_cols,
        ascending=ascending,
        n_buckets=4,
        rank_col="rk",
        n_col="n",
    ).select("id", "rk", ntile_from_rank(F.col("rk"), F.col("n"), k).alias("nt"))
    r = {(x["id"]): (x["rk"], x["nt"]) for x in ref.collect()}
    g = {(x["id"]): (x["rk"], x["nt"]) for x in got.collect()}
    assert r == g


def test_ranked_matches_window_with_heavy_ties(spark):
    # 200 rows over only 5 distinct keys: every bucket boundary falls on a
    # tie run; the unique tiebreaker must keep ranks exact anyway.
    df = spark.range(200).select(
        F.col("id"), (F.col("id") % 5).alias("v")
    )
    _ref_vs_ranked(spark, df, F.col("v"), ["v", "id"], True, 7)


def test_ranked_descending(spark):
    df = spark.range(137).select(F.col("id"), (F.col("id") * 37 % 100).alias("v"))
    _ref_vs_ranked(
        spark, df, F.col("v"), [F.col("v").desc(), "id"], False, 5
    )


def test_ranked_constant_key_degenerates_correctly(spark):
    # All-equal bucket key: every row lands in one bucket (the documented
    # worst case) but ranks stay exact.
    df = spark.range(50).select(F.col("id"), F.lit(1.0).alias("v"))
    _ref_vs_ranked(spark, df, F.col("v"), ["v", "id"], True, 3)


def test_ranked_running_sum_exact_decimal(spark):
    df = spark.range(100).select(
        F.col("id"),
        ((F.col("id") * 13 % 97) / F.lit(4)).cast("decimal(18,2)").alias("amt"),
    )
    w = Window.orderBy(F.col("amt").desc(), "id")
    ref = df.select(
        "id",
        F.sum("amt")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    )
    got = ranked(
        df,
        F.col("amt").cast("double"),
        [F.col("amt").desc(), "id"],
        ascending=False,
        n_buckets=4,
        running_sum=F.col("amt"),
        running_col="cum",
        running_total_col="tot",
    )
    r = {x["id"]: float(x["cum"]) for x in ref.collect()}
    rows = got.collect()
    g = {x["id"]: float(x["cum"]) for x in rows}
    assert r == g
    tot = float(df.agg(F.sum("amt")).first()[0])
    assert all(float(x["tot"]) == tot for x in rows)


def test_ranked_rejects_internal_name_collision(spark):
    df = spark.range(5).select(F.col("id"), F.lit(1).alias("_rk_bkt"))
    with pytest.raises(ValueError, match="_rk_"):
        ranked(df, F.col("id"), ["id"])


def test_ntile_formula_small_n(spark):
    # n < k: NTILE gives each of the n rows its own bucket 1..n.
    df = spark.range(3).select(F.col("id"))
    got = ranked(df, F.col("id"), ["id"], rank_col="rk", n_col="n").select(
        "id", ntile_from_rank(F.col("rk"), F.col("n"), 10).alias("nt")
    )
    assert {(x["id"], x["nt"]) for x in got.collect()} == {(0, 1), (1, 2), (2, 3)}


def test_no_single_partition_window_in_plan(spark):
    # The operator's whole point: its plan must not contain a global
    # (partition-less) Window — checked with the same detector the plan
    # audit uses.
    from dataframe_differ_spark.plans.audit import plan_features

    df = spark.range(1000).select(F.col("id"), (F.col("id") % 31).alias("v"))
    out = ranked(df, F.col("v"), ["v", "id"], rank_col="rk", n_col="n")
    f = plan_features(out)
    assert f.global_windows == 0


def test_sketch_siblings_equal_exact_twins(spark, sf_small):
    # The shared DuckDB oracles already pin both sides to the same values;
    # this is the direct in-Spark assertion (independent of DuckDB) that
    # each two-phase-rank sibling reproduces its single-partition twin.
    from dataframe_differ_spark.queries import load_all

    registry = load_all()
    pairs = [
        ("agg_histogram_equidepth", "agg_histogram_equidepth_sketch"),
        ("layout_zorder", "layout_zorder_sketch"),
        ("diff_quantile_drift", "diff_quantile_drift_sketch"),
        ("orders_rfm", "orders_rfm_sketch"),
        ("revenue_pareto", "revenue_pareto_sketch"),
        ("win_distribution", "win_distribution_sketch"),
        ("dim_surrogate_keys", "dim_surrogate_keys_sketch"),
    ]
    for exact_name, sketch_name in pairs:
        exact = registry[exact_name].fn(spark, sf_small)
        sketch = registry[sketch_name].fn(spark, sf_small)
        cols = sorted(exact.columns)
        assert cols == sorted(sketch.columns), (exact_name, sketch_name)
        a = sorted(tuple(r[c] for c in cols) for r in exact.collect())
        b = sorted(tuple(r[c] for c in cols) for r in sketch.collect())
        assert a == b, f"{sketch_name} != {exact_name}"
        assert registry[exact_name].scale_path == sketch_name
