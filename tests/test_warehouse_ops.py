"""Structural invariants for the warehouse/migration composites
(merge upsert, SCD2 snapshot diff, vector-column diff, column-mapped
diff, per-dim embedding stats, fuzzy-name dedup)."""

from __future__ import annotations

from pyspark.sql import functions as F

import dataframe_differ_spark.operators.diff_core as D
from dataframe_differ_spark.queries.warehouse import (
    q_dedup_fuzzy_names,
    q_diff_colmap,
    q_diff_scd2_snapshots,
    q_diff_vector_col,
    q_emb_dim_stats,
    q_merge_upsert,
)
from dataframe_differ_spark.queries.diff_queries import q_diff_keyed
from dataframe_differ_spark.tables import load_table


def test_merge_upsert_row_accounting(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    n = orders.count()
    k = F.col("o_orderkey")
    n_del = orders.filter(k % 13 == 0).count()
    n_ins = orders.filter(k % 11 == 0).count()
    out = q_merge_upsert(spark, sf_small)
    assert out.count() == n - n_del + n_ins
    # Updated rows carry the revised price; untouched rows are unchanged.
    joined = out.alias("m").join(
        orders.alias("o"), F.col("m.o_orderkey") == F.col("o.o_orderkey")
    )
    upd_mask = (F.col("o.o_orderkey") % 13 != 0) & (F.col("o.o_orderkey") % 7 == 0)
    wrong_upd = joined.filter(
        upd_mask
        & (F.col("m.o_totalprice") != F.col("o.o_totalprice") * F.lit(1.05))
    ).count()
    wrong_same = joined.filter(
        ~upd_mask & (F.col("m.o_totalprice") != F.col("o.o_totalprice"))
    ).count()
    assert wrong_upd == 0 and wrong_same == 0


def test_scd2_snapshot_diff_statuses(spark, sf_small):
    out = q_diff_scd2_snapshots(spark, sf_small)
    # Snapshots only grow over time: a user with state at T1 still has one
    # at T2 (events are never deleted), so 'D' is impossible.
    assert out.filter(F.col("diff_status") == "D").count() == 0
    statuses = {r[0] for r in out.select("diff_status").distinct().collect()}
    assert statuses <= {"N", "C", "I"}


def test_vector_diff_counts_match_statuses(spark, sf_small):
    out = q_diff_vector_col(spark, sf_small)
    # Every changed row reports >= 1 changed dim; the +0.5 perturbation
    # moves every one of the 64 dims past the 0.25 threshold.
    assert out.filter(
        (F.col("diff_status") == "C") & (F.col("n_changed_dims") != 64)
    ).count() == 0
    assert out.filter(
        (F.col("diff_status") == "N") & (F.col("n_changed_dims") != 0)
    ).count() == 0
    assert out.filter(
        F.col("diff_status").isin("I", "D")
        & F.col("n_changed_dims").isNotNull()
    ).count() == 0


def test_colmap_diff_equals_plain_diff(spark, sf_small):
    mapped = q_diff_colmap(spark, sf_small)
    plain = q_diff_keyed(spark, sf_small)
    assert mapped.columns == plain.columns
    assert mapped.exceptAll(plain).count() == 0
    assert plain.exceptAll(mapped).count() == 0


def test_colmap_missing_right_column_raises(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    try:
        D.diff(orders, orders, ["o_orderkey"], column_mapping={"o_custkey": "nope"})
    except ValueError as e:
        assert "nope" in str(e)
    else:
        raise AssertionError("expected ValueError for unknown right column")


def test_emb_dim_stats_shape_and_bounds(spark, sf_small):
    out = q_emb_dim_stats(spark, sf_small).collect()
    assert len(out) == 64
    n_vec = load_table(spark, sf_small, "embeddings").count()
    for r in out:
        assert r.n == n_vec
        assert r.min_val <= r.max_val
        # mean in micro-units must sit inside [min, max] scaled bounds.
        assert r.min_val * 1e6 - 1 <= r.mean_micro <= r.max_val * 1e6


def test_incremental_agg_equals_recompute(spark, sf_small):
    from dataframe_differ_spark.queries.warehouse import (
        q_agg_incremental_maintain,
    )

    incremental = q_agg_incremental_maintain(spark, sf_small)
    recompute = (
        q_merge_upsert(spark, sf_small)
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(38,9)"))
            .cast("double")
            .alias("total"),
        )
    )
    assert incremental.exceptAll(recompute).count() == 0
    assert recompute.exceptAll(incremental).count() == 0


def test_sampled_screen_extrapolation_consistent(spark, sf_small):
    from dataframe_differ_spark.queries.warehouse import q_diff_sampled_screen

    rows = {r.diff_status: r for r in q_diff_sampled_screen(spark, sf_small).collect()}
    for r in rows.values():
        assert r.est_total == r.cnt * 16
    # Sample of a 1500-row table lands near 1/16 of the keyspace.
    total = sum(r.cnt for r in rows.values())
    assert 0 < total < 1500 // 4


def test_fuzzy_pairs_are_canonical_and_blocked(spark, sf_small):
    out = q_dedup_fuzzy_names(spark, sf_small)
    assert out.filter(F.col("custkey_a") >= F.col("custkey_b")).count() == 0
    assert out.filter(F.col("dist") > 2).count() == 0
    # Blocking: both sides of every pair share the nation key.
    c = load_table(spark, sf_small, "customer").select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("c_nationkey").alias("nk_b"),
    )
    cross_block = (
        out.join(c, "custkey_b")
        .filter(F.col("nationkey") != F.col("nk_b"))
        .count()
    )
    assert cross_block == 0
