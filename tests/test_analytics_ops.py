"""Structural invariants for the analytics operators added after round-1
baseline (SCD2, as-of tolerance, containment dedup, changed-columns diff)."""

from __future__ import annotations

from pyspark.sql import functions as F

import dataframe_differ_spark.operators.diff_core as D
from dataframe_differ_spark.queries.relational import q_join_asof_tolerance
from dataframe_differ_spark.queries.textops import q_dedup_containment
from dataframe_differ_spark.queries.windows import q_scd2_build
from dataframe_differ_spark.tables import load_table


def test_scd2_intervals_partition_timeline(spark, sf_small):
    out = q_scd2_build(spark, sf_small)
    # Exactly one open (is_current) interval per user.
    open_per_user = (
        out.groupBy("user_id")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_open"))
        .filter(F.col("n_open") != 1)
        .count()
    )
    assert open_per_user == 0
    # Closed intervals never overlap: valid_to of interval k == valid_from
    # of interval k+1 in (ts, event_id) order, so valid_from < valid_to.
    bad = out.filter(
        F.col("valid_to").isNotNull() & (F.col("valid_from") > F.col("valid_to"))
    ).count()
    assert bad == 0


def test_asof_tolerance_never_matches_stale_clicks(spark, sf_small):
    out = q_join_asof_tolerance(spark, sf_small)
    stale = out.filter(
        F.col("click_ts").isNotNull()
        & (F.col("click_ts") < F.col("ts") - F.expr("interval 2 hours"))
    ).count()
    assert stale == 0
    # Tolerance only ever REMOVES matches relative to the unbounded as-of.
    from dataframe_differ_spark.queries.relational import q_join_asof

    unbounded = q_join_asof(spark, sf_small).filter(F.col("click_ts").isNotNull())
    bounded = out.filter(F.col("click_ts").isNotNull())
    assert bounded.count() <= unbounded.count()


def test_containment_catches_planted_truncation_dup(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    base = docs.limit(1).collect()[0]
    toks = base.text.split(" ")
    trunc = " ".join(toks[: max(3, len(toks) // 4)])  # 25% prefix
    planted = spark.createDataFrame(
        [(999_999, trunc, base.lang, base.source, len(trunc))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile, os

    out_dir = os.path.join(tempfile.gettempdir(), "ddspark_contain_test")
    docs.unionByName(planted).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    pairs = q_dedup_containment(spark, out_dir)
    hit = pairs.filter(
        (F.col("doc_b") == 999_999) & (F.col("doc_a") == base.doc_id)
    )
    assert hit.count() == 1  # truncation dup found (containment = 1.0)
    assert hit.collect()[0].containment >= 0.99


def test_diff_changed_columns_names_exact_set(spark):
    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    right = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 25.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    d = D.diff(left, right, ["k"], with_change_cols=True)
    rows = {r.k: r for r in d.collect()}
    assert rows[1].changed_columns == ""
    assert rows[2].changed_columns == "s,v"
    assert rows[3].diff_status == "D" and rows[3].changed_columns == ""
    assert rows[4].diff_status == "I" and rows[4].changed_columns == ""
