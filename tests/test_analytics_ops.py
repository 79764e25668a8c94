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


def test_interval_merge_spans_disjoint_and_complete(spark, sf_small):
    from dataframe_differ_spark.queries.windows import q_interval_merge

    out = q_interval_merge(spark, sf_small)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    n_events = load_table(spark, sf_small, "events").count()
    assert total == n_events  # every event lands in exactly one span
    # Spans for the same user never overlap (sorted by start, each span
    # must start strictly after the previous one ends).
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("span_start")
    overlapping = (
        out.withColumn("prev_end", F.lag("span_end").over(w))
        .filter(F.col("prev_end").isNotNull() & (F.col("span_start") <= F.col("prev_end")))
        .count()
    )
    assert overlapping == 0


def test_ewma_first_day_equals_count_and_bounds(spark, sf_small):
    from dataframe_differ_spark.queries.windows import q_timeseries_ewma

    out = q_timeseries_ewma(spark, sf_small).collect()
    by_type_first = {}
    for r in out:
        by_type_first.setdefault(r.event_type, []).append(r)
    for rows in by_type_first.values():
        rows.sort(key=lambda r: r.day)
        assert rows[0].ewma == rows[0].n  # fold seeds with the first value
        lo = min(r.n for r in rows)
        hi = max(r.n for r in rows)
        assert all(lo <= r.ewma <= hi for r in rows)  # convex combination


def test_pagerank_mass_and_floor(spark, sf_small):
    from dataframe_differ_spark.queries.composites import q_graph_pagerank_nations

    rows = q_graph_pagerank_nations(spark, sf_small).collect()
    assert len(rows) == 25
    # Every node keeps at least the teleport mass; truncating division
    # only ever loses mass, so the total stays at or below 1.0.
    assert all(r.rank_micros >= 6000 for r in rows)
    assert sum(r.rank_micros for r in rows) <= 25 * 40000


def test_expectations_all_pass_on_clean_corpus(spark, sf_small):
    from dataframe_differ_spark.queries.warehouse import q_expectations_check

    rows = q_expectations_check(spark, sf_small).collect()
    assert len(rows) == 5
    assert all(r["pass"] for r in rows), [r.rule for r in rows if not r["pass"]]


def test_knn_majority_vote_bounds(spark, sf_small):
    from dataframe_differ_spark.queries.vectors import q_knn_classify

    rows = q_knn_classify(spark, sf_small).collect()
    held_out = (
        load_table(spark, sf_small, "embeddings")
        .filter(F.col("vec_id") % 29 == 0)
        .count()
    )
    assert len(rows) == held_out  # exactly one prediction per query
    assert all(1 <= r.n_votes <= 5 for r in rows)


def test_temporal_scd2_counts_bounded_by_clicks(spark, sf_small):
    from dataframe_differ_spark.queries.warehouse import q_join_temporal_scd2

    rows = q_join_temporal_scd2(spark, sf_small).collect()
    clicks = (
        load_table(spark, sf_small, "events")
        .filter(F.col("event_type") == "click")
        .count()
    )
    assert set(r.state for r in rows) <= {"signup", "purchase"}
    assert sum(r.n_clicks for r in rows) <= clicks


def test_reconcile_deltas_match_diff_summary(spark, sf_small):
    """The aggregate screen's net row delta must equal I − D from the
    row-level diff summary over the same snapshot pair."""
    from dataframe_differ_spark.queries.diff_queries import q_diff_summary
    from dataframe_differ_spark.queries.warehouse import q_diff_agg_reconcile

    rec = q_diff_agg_reconcile(spark, sf_small).collect()
    summary = {r.diff_status: r.cnt for r in q_diff_summary(spark, sf_small).collect()}
    net = sum(r.n_delta for r in rec)
    assert net == summary.get("I", 0) - summary.get("D", 0)


def test_doc_chunking_covers_every_token(spark, sf_small):
    from dataframe_differ_spark.queries.pipelineops import q_doc_chunking

    out = q_doc_chunking(spark, sf_small)
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    # Stride 30 / window 40: every chunk except the last contributes 30
    # net-new tokens, the last contributes the remainder → per-doc
    # max(chunk_id)*30 + last_chunk_len == n_tok.
    per_doc = out.groupBy("doc_id").agg(
        F.max("chunk_id").alias("last_id"),
        F.max_by("n_chunk_tokens", "chunk_id").alias("last_len"),
    )
    joined = per_doc.join(docs, "doc_id")
    bad = joined.filter(
        F.col("last_id") * 30 + F.col("last_len") != F.col("n_tok")
    ).count()
    assert bad == 0


def test_weighted_sample_prefers_heavy_rows(spark, sf_small):
    from dataframe_differ_spark.queries.pipelineops import q_sample_weighted

    rows = q_sample_weighted(spark, sf_small).collect()
    assert len(rows) == 200
    sample_mean = sum(r.o_totalprice for r in rows) / len(rows)
    pop = load_table(spark, sf_small, "orders").agg(
        F.avg("o_totalprice")
    ).collect()[0][0]
    # Weight-proportional sampling must pull the sample mean above the
    # population mean (weights ARE the values).
    assert sample_mean > pop


def test_row_hash_matches_column_diff_statuses(spark, sf_small):
    from dataframe_differ_spark.queries.diff_queries import q_diff_summary
    from dataframe_differ_spark.queries.warehouse import q_diff_row_hash

    fast = {r.diff_status: r.cnt for r in q_diff_row_hash(spark, sf_small).collect()}
    slow = {r.diff_status: r.cnt for r in q_diff_summary(spark, sf_small).collect()}
    assert fast == slow  # the screen must agree exactly with the full diff


def test_bloom_prune_equals_plain_join(spark, sf_small):
    from dataframe_differ_spark.queries.relational import q_join_bloom_prune

    pruned = {
        r.c_mktsegment: (r.n_orders, r.revenue_micros)
        for r in q_join_bloom_prune(spark, sf_small).collect()
    }
    o = load_table(spark, sf_small, "orders")
    c = load_table(spark, sf_small, "customer").filter(F.col("c_acctbal") > 9000)
    plain = {
        r.c_mktsegment: (r.n_orders, r.revenue_micros)
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * F.lit(1e6))).alias(
                "revenue_micros"
            ),
        )
        .collect()
    }
    assert pruned == plain


def test_bucketed_range_join_equals_theta_join(spark, sf_small):
    from dataframe_differ_spark.queries.relational import q_join_range_bucketed

    out = {
        r.event_id: r.n_nearby_errors
        for r in q_join_range_bucketed(spark, sf_small).collect()
    }
    ev = load_table(spark, sf_small, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("ts").alias("p_ts")
    )
    e = ev.filter(F.col("event_type") == "error").select(F.col("ts").alias("e_ts"))
    naive = {
        r.event_id: r.n
        for r in p.join(
            e,
            (F.col("e_ts") >= F.col("p_ts") - F.expr("interval 2 minutes"))
            & (F.col("e_ts") <= F.col("p_ts") + F.expr("interval 2 minutes")),
            "left",
        )
        .groupBy("event_id")
        .agg(F.sum(F.col("e_ts").isNotNull().cast("long")).alias("n"))
        .collect()
    }
    assert out == naive


def test_surrogate_keys_dense_and_stable(spark, sf_small):
    from dataframe_differ_spark.queries.warehouse import q_dim_surrogate_keys

    rows = q_dim_surrogate_keys(spark, sf_small).collect()
    sks = sorted(r.dim_sk for r in rows)
    assert sks == list(range(1, len(rows) + 1))  # dense, 1-based, unique
    again = q_dim_surrogate_keys(spark, sf_small).collect()
    assert {(r.dim_sk, r.lang, r.source) for r in rows} == {
        (r.dim_sk, r.lang, r.source) for r in again
    }  # reproducible across runs


def test_cumulative_uniques_ends_at_total_users(spark, sf_small):
    from dataframe_differ_spark.queries.composites import q_events_cumulative_uniques

    rows = sorted(
        q_events_cumulative_uniques(spark, sf_small).collect(), key=lambda r: r.day
    )
    total_users = (
        load_table(spark, sf_small, "events").select("user_id").distinct().count()
    )
    assert rows[-1].cum_users == total_users
    assert all(a.cum_users <= b.cum_users for a, b in zip(rows, rows[1:]))


def test_trend_slope_matches_numpy(spark, sf_small):
    import numpy as np

    from dataframe_differ_spark.queries.relational import q_trend_daily_events

    out = {r.event_type: r.slope_per_day for r in q_trend_daily_events(spark, sf_small).collect()}
    daily = (
        load_table(spark, sf_small, "events")
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("i"),
        )
        .count()
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.i, r["count"]))
    for et, pts in series.items():
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        slope = np.polyfit(xs, ys, 1)[0]
        assert abs(out[et] - slope) < 1e-6


def test_paragraph_dedup_finds_planted_shared_chunk(spark, sf_small):
    from dataframe_differ_spark.queries.textops import q_dedup_paragraph

    out = q_dedup_paragraph(spark, sf_small)
    # Every reported hash must genuinely appear in >= 2 docs.
    assert out.filter(F.col("n_docs") < 2).count() == 0
    assert out.filter(F.col("n_copies") < F.col("n_docs")).count() == 0


def test_partition_pruned_scan_reads_one_partition(spark, sf_small):
    from dataframe_differ_spark.queries.udfs import q_join_partition_pruned

    df = q_join_partition_pruned(spark, sf_small)
    rows = df.collect()
    assert [r.o_orderstatus for r in rows] == ["F"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The fact scan must carry a partition filter on the partition column
    # (static fold or DPP — either way pruning reached the scan).
    assert "PartitionFilters: [" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters:")[1][:200]


def test_basket_affinity_pairs_canonical_and_supported(spark, sf_small):
    from dataframe_differ_spark.queries.composites import q_orders_basket_affinity

    rows = q_orders_basket_affinity(spark, sf_small).collect()
    assert 0 < len(rows) <= 25
    supports = [r.support for r in rows]
    assert supports == sorted(supports, reverse=True)
    for r in rows:
        assert r.part_a < r.part_b  # canonical pair orientation
        assert r.support >= 1


def test_migration_validate_verdict_consistent(spark, sf_small):
    from dataframe_differ_spark.queries.composites import (
        q_pipeline_migration_validate,
    )

    rows = q_pipeline_migration_validate(spark, sf_small).collect()
    assert len(rows) == 1
    r = rows[0]
    # The mutation planter changes/inserts/deletes rows, so a clean verdict
    # would mean the diff failed to see them.
    assert r.n_changed + r.n_inserted + r.n_deleted > 0
    assert r.migration_clean is False
    assert r.key_violations == 0
    assert r.right_total == r.n_unchanged + r.n_changed + r.n_inserted


def test_auc_matches_pure_python_reference(spark, sf_small):
    # Exact tie-corrected AUC, independently recomputed from the raw
    # (score, label) pairs with the O(n log n) textbook rank method.
    from dataframe_differ_spark.queries.pipelineops import (
        _AUC_STOP,
        q_eval_auc_score,
    )

    docs = load_table(spark, sf_small, "documents")
    rows = docs.select(
        F.expr(
            f"size(filter(split(text, ' '), x -> x IN {_AUC_STOP}))"
        ).alias("s"),
        (F.col("lang") == "en").alias("y"),
    ).collect()
    pairs = sorted((r.s, r.y) for r in rows)
    # mid-ranks per tied score group
    ranks, i = {}, 0
    while i < len(pairs):
        j = i
        while j < len(pairs) and pairs[j][0] == pairs[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0  # average of ranks i+1 .. j
        ranks[pairs[i][0]] = mid
        i = j
    n_pos = sum(1 for _, y in pairs if y)
    n_neg = len(pairs) - n_pos
    r_pos = sum(ranks[s] for s, y in pairs if y)
    expected = (r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)

    got = q_eval_auc_score(spark, sf_small).collect()[0]
    assert got.n_pos == n_pos and got.n_neg == n_neg
    assert abs(got.auc - expected) < 1e-9
    assert abs(got.gini - (2 * expected - 1)) < 1e-9


def test_km_survival_matches_pure_python_reference(spark, sf_small):
    # Kaplan-Meier recomputed naively from per-user lifetimes.
    from dataframe_differ_spark.queries.composites import q_km_survival_users

    e = load_table(spark, sf_small, "events")
    pu = (
        e.groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("date")).alias("f"),
            F.max(F.col("ts").cast("date")).alias("l"),
        )
        .collect()
    )
    m = max(r.l for r in pu)
    lifetimes = [
        ((r.l - r.f).days, (m - r.l).days >= 3) for r in pu
    ]  # (t, churned)
    spine = sorted({t for t, _ in lifetimes})
    surv, s = {}, 1.0
    for t in spine:
        n_at_risk = sum(1 for lt, _ in lifetimes if lt >= t)
        d = sum(1 for lt, ev in lifetimes if lt == t and ev)
        s *= (n_at_risk - d) / n_at_risk
        surv[t] = (n_at_risk, d, s)
    got = {r.t_days: r for r in q_km_survival_users(spark, sf_small).collect()}
    assert set(got) == set(spine)
    for t in spine:
        n_at_risk, d, s = surv[t]
        assert got[t].n_at_risk == n_at_risk
        assert got[t].n_churned == d
        assert abs(got[t].survival - s) < 1e-9
    # survival is non-increasing along the spine
    vals = [got[t].survival for t in spine]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_benford_shares_sum_to_one_and_digits_cover(spark, sf_small):
    from dataframe_differ_spark.queries.warehouse import q_benford_first_digit

    rows = q_benford_first_digit(spark, sf_small).collect()
    digits = {r.digit for r in rows}
    assert digits <= set(range(1, 10))
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-6
    # expected column is the Benford distribution (sums to 1 exactly in
    # closed form: sum log10(1 + 1/d) = log10(10) = 1)
    import math

    for r in rows:
        assert abs(r.expected - math.log10(1 + 1 / r.digit)) < 1e-9


def test_dedup_pr_counts_consistent(spark, sf_small):
    from dataframe_differ_spark.queries.scaleops import q_eval_dedup_pr

    r = q_eval_dedup_pr(spark, sf_small).collect()[0]
    assert r.tp + r.fp == r.n_cand
    assert r.tp + r.fn == r.n_truth
    assert 0.0 <= r.precision <= 1.0 and 0.0 <= r.recall <= 1.0
    # F1 equals the harmonic mean computed from p and r
    if r.tp:
        p, rec = r.tp / r.n_cand, r.tp / r.n_truth
        assert abs(r.f1 - 2 * p * rec / (p + rec)) < 1e-9
