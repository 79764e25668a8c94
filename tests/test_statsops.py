"""Pure-Python reference checks for the wave-4/5 statistics, evaluation,
and graph operators (statsops.py) — independent recomputation where a
small-scale reference is cheap, structural invariants otherwise."""

from __future__ import annotations

import hashlib
import math

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from dataframe_differ_spark.queries import load_all

load_all()

from dataframe_differ_spark.queries.composites import copurchase_edges  # noqa: E402
from dataframe_differ_spark.queries.statsops import (  # noqa: E402
    q_drift_js_divergence,
    q_drift_ks_test,
    q_eval_mrr_retrieval,
    q_eval_ndcg_retrieval,
    q_events_holt_linear,
    q_graph_bfs_hops,
    q_graph_pagerank_parts,
    q_source_mix_temperature,
    q_stats_bootstrap_ci,
    q_text_normalize_unicode,
)


def _md5_base(key: int) -> bool:
    return hashlib.md5(str(key).encode()).hexdigest()[0] < "8"


def test_ks_matches_python_reference(spark, sf_small):
    row = q_drift_ks_test(spark, sf_small).collect()[0]
    t = pq.read_table(sf_small + "/orders.parquet").to_pandas()
    t["is_base"] = t["o_orderkey"].map(_md5_base)
    a = sorted(t[t.is_base]["o_totalprice"])
    b = sorted(t[~t.is_base]["o_totalprice"])
    na, nb = len(a), len(b)
    vals = sorted(set(a) | set(b))
    import bisect

    best = 0
    for v in vals:
        ca = bisect.bisect_right(a, v)
        cb = bisect.bisect_right(b, v)
        best = max(best, abs(ca * nb - cb * na))
    assert row.n_base == na and row.n_cur == nb
    assert row.d_num == best
    assert abs(row.d_stat - best / (na * nb)) < 1e-9


def test_jsd_bounded_and_ordered(spark, sf_small):
    rows = q_drift_js_divergence(spark, sf_small).collect()
    assert len(rows) == 10
    jsd = rows[0].jsd_nats
    assert 0.0 <= jsd <= math.log(2) + 1e-9
    contribs = [r.contrib_nats for r in rows]
    assert contribs == sorted(contribs, reverse=True)
    assert all(r.vocab_size > 0 for r in rows)


def test_ndcg_mrr_recall_agree(spark, sf_small):
    ndcg = {r.query_id: r for r in q_eval_ndcg_retrieval(spark, sf_small).collect()}
    mrr = {r.query_id: r for r in q_eval_mrr_retrieval(spark, sf_small).collect()}
    from dataframe_differ_spark.queries.vectors import q_eval_retrieval_recall

    rec = {
        r.query_id: r for r in q_eval_retrieval_recall(spark, sf_small).collect()
    }
    assert set(ndcg) == set(mrr) == set(rec)
    for qid, r in ndcg.items():
        assert 0.0 <= r.ndcg <= 1.0 + 1e-9
        assert r.n_hits == rec[qid].n_hit  # same hit set, two metrics
        m = mrr[qid]
        if r.n_hits == 0:
            assert m.rr == 0.0 and m.first_hit_rank == 0
        else:
            assert m.first_hit_rank >= 1
            assert abs(m.rr - round(1.0 / m.first_hit_rank, 9)) < 1e-12
        # a perfect prefix (all 10 hits) forces NDCG == 1
        if r.n_hits == 10:
            assert abs(r.ndcg - 1.0) < 1e-9


def test_bootstrap_ci_brackets_mean(spark, sf_small):
    row = q_stats_bootstrap_ci(spark, sf_small).collect()[0]
    assert row.n_orders == 1500 and row.b_replicates == 100
    assert row.ci_lo_cents < row.mean_full_cents < row.ci_hi_cents
    assert row.se_boot_cents > 0
    # CI width should be a few bootstrap SEs, not orders of magnitude off.
    width = row.ci_hi_cents - row.ci_lo_cents
    assert 2 * row.se_boot_cents < width < 8 * row.se_boot_cents


def test_pagerank_floor_and_top50(spark, sf_small):
    edges = copurchase_edges(spark, sf_small)
    n_nodes = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .distinct()
        .count()
    )
    rows = q_graph_pagerank_parts(spark, sf_small).collect()
    assert len(rows) == 50
    floor = 0.15 / n_nodes
    for r in rows:
        assert r.pagerank >= floor - 1e-12
    prs = [r.pagerank for r in rows]
    assert prs == sorted(prs, reverse=True)
    # top-50 of thousands of nodes carries a small fraction of total mass
    assert sum(prs) < 1.0


def test_bfs_matches_python_bfs(spark, sf_small):
    got = {
        r.part: r.hop for r in q_graph_bfs_hops(spark, sf_small).collect()
    }
    e = copurchase_edges(spark, sf_small).collect()
    adj: dict[int, set[int]] = {}
    for r in e:
        adj.setdefault(r.u, set()).add(r.v)
        adj.setdefault(r.v, set()).add(r.u)
    src = min(adj)
    ref = {src: 0}
    frontier = [src]
    for hop in range(1, 5):
        nxt = []
        for n in frontier:
            for m in adj[n]:
                if m not in ref:
                    ref[m] = hop
                    nxt.append(m)
        frontier = nxt
    assert got == ref


def test_holt_matches_python_loop(spark, sf_small):
    rows = sorted(
        (
            r
            for r in q_events_holt_linear(spark, sf_small).collect()
            if r.event_type == "view"
        ),
        key=lambda r: r.day,
    )
    ys = [r.n_events for r in rows]
    level, trend = float(ys[0]), 0.0
    for i, y in enumerate(ys):
        if i == 0:
            yhat = float(y)
        else:
            yhat = level + trend
            new_level = 0.5 * y + 0.5 * (level + trend)
            trend = 0.25 * (new_level - level) + 0.75 * trend
            level = new_level
        assert abs(rows[i].forecast - yhat) < 1e-6
        assert abs(rows[i].level - level) < 1e-6
        assert abs(rows[i].trend - trend) < 1e-6


def test_normalize_unicode_planted_rows(spark, sf_small):
    out = q_text_normalize_unicode(spark, sf_small)
    planted = out.filter("planted")
    n_planted = planted.count()
    assert n_planted > 0
    # every planted row was actually normalized (NFD composed, zero-widths
    # dropped, double space collapsed -> strictly shorter)
    assert planted.filter(~F.col("changed")).count() == 0
    assert planted.filter(F.col("len_norm") >= F.col("len_raw")).count() == 0
    # untouched ASCII rows pass through the normalizer unchanged
    clean = out.filter(~F.col("planted"))
    assert clean.filter(F.col("changed")).count() == 0


def test_mix_temperature_flattens_toward_rare(spark, sf_small):
    rows = q_source_mix_temperature(spark, sf_small).collect()
    assert abs(sum(r.p_temp for r in rows) - 1.0) < 1e-6
    rare = min(rows, key=lambda r: r.token_share)
    common = max(rows, key=lambda r: r.token_share)
    # tau < 1 upsamples rare sources and downsamples common ones
    assert rare.upsample_factor > 1.0
    assert common.upsample_factor < 1.0
    # but never past uniform: ordering by p_temp preserves share ordering
    ordered = sorted(rows, key=lambda r: r.token_share)
    ps = [r.p_temp for r in ordered]
    assert ps == sorted(ps)


def test_threeway_matches_pandas_reference(spark, sf_small):
    from dataframe_differ_spark.queries.diff_queries import q_diff_threeway

    got = {
        r.status: (r.n_keys, r.needs_resolution)
        for r in q_diff_threeway(spark, sf_small).collect()
    }
    t = pq.read_table(sf_small + "/orders.parquet").to_pandas()
    cols = [
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    base = {r.o_orderkey: tuple(getattr(r, c) for c in cols) for r in t.itertuples()}

    def branch(pmod, mult, dmod, imod, shift):
        out = {}
        for k, v in base.items():
            if k % dmod == 0:
                continue
            if k % pmod == 0:
                v = (v[0], v[1], v[2] * mult, v[3], v[4])
            out[k] = v
        for k, v in base.items():
            if k % imod == 0:
                out[k + shift] = v
        return out

    ours = branch(53, 1.01, 97, 101, 10_000_000)
    theirs = branch(59, 1.02, 89, 103, 20_000_000)
    ref: dict[str, int] = {}
    for k in set(base) | set(ours) | set(theirs):
        b, o, th = base.get(k), ours.get(k), theirs.get(k)
        if b is not None and o is not None and th is not None:
            if o == b and th == b:
                s = "unchanged"
            elif o != b and th == b:
                s = "take_ours"
            elif o == b and th != b:
                s = "take_theirs"
            elif o == th:
                s = "convergent"
            else:
                s = "conflict_edit"
        elif b is not None and o is None and th is not None:
            s = "deleted_ours" if th == b else "conflict_delete_edit"
        elif b is not None and th is None and o is not None:
            s = "deleted_theirs" if o == b else "conflict_edit_delete"
        elif b is not None:
            s = "deleted_both"
        elif o is not None and th is None:
            s = "added_ours"
        elif th is not None and o is None:
            s = "added_theirs"
        else:
            s = "added_both_same" if o == th else "added_both_conflict"
        ref[s] = ref.get(s, 0) + 1
    assert {k: v[0] for k, v in got.items()} == ref
    for s, (_, needs) in got.items():
        assert needs == (s.startswith("conflict") or s == "added_both_conflict")


def test_ols_matches_numpy_lstsq(spark, sf_small):
    import numpy as np

    from dataframe_differ_spark.queries.statsops import q_stats_ols_multi

    row = q_stats_ols_multi(spark, sf_small).collect()[0]
    li = pq.read_table(sf_small + "/lineitem.parquet").to_pandas()
    o = pq.read_table(sf_small + "/orders.parquet").to_pandas()
    per = li.groupby("l_orderkey").agg(
        x1=("l_quantity", "size"), x2=("l_quantity", "sum")
    )
    m = per.join(o.set_index("o_orderkey"), how="inner")
    X = np.column_stack(
        [np.ones(len(m)), m["x1"].to_numpy(float), m["x2"].to_numpy(float)]
    )
    y = m["o_totalprice"].to_numpy(float)
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert row.n_orders == len(m)
    assert abs(row.intercept - beta[0]) < 1e-3
    assert abs(row.beta_n_items - beta[1]) < 1e-3
    assert abs(row.beta_total_qty - beta[2]) < 1e-3
    pred = X @ beta
    ss_res = float(((y - pred) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    assert abs(row.r_squared - (1 - ss_res / ss_tot)) < 1e-6
    assert 0.0 <= row.r_squared <= 1.0


def test_top_pc_matches_numpy_power_iteration(spark, sf_small):
    import numpy as np

    from dataframe_differ_spark.queries.statsops import q_vec_top_pc

    rows = q_vec_top_pc(spark, sf_small).collect()
    t = pq.read_table(sf_small + "/embeddings.parquet").to_pandas()
    t = t.sort_values("vec_id")
    X = np.stack(t["embedding"].to_numpy())
    v = X[t["vec_id"].to_numpy() == 0][0].astype(float)
    v = v / np.linalg.norm(v)
    for _ in range(2):
        w = X.T @ (X @ v)
        v = w / np.linalg.norm(w)
    lam = float(np.linalg.norm(w))
    ref = {i: v[i] for i in range(64)}
    assert len(rows) == 10
    for r in rows:
        assert abs(r.loading - ref[r.dim]) < 1e-6
        assert abs(r.eigval - lam) < 1e-3
    # loadings are the 10 largest |components|
    top = sorted(range(64), key=lambda i: (-abs(ref[i]), i))[:10]
    assert sorted(r.dim for r in rows) == sorted(top)


def test_weighted_median_matches_pandas(spark, sf_small):
    from dataframe_differ_spark.queries.statsops import q_agg_weighted_median

    rows = {
        r.fraction: r for r in q_agg_weighted_median(spark, sf_small).collect()
    }
    li = pq.read_table(sf_small + "/lineitem.parquet").to_pandas()
    g = (
        li.groupby("l_extendedprice")["l_quantity"]
        .sum()
        .sort_index()
        .cumsum()
    )
    total = float(g.iloc[-1])
    assert set(rows) == {0.25, 0.5, 0.75}
    for f, r in rows.items():
        ref = g.index[(g >= f * total).argmax()]
        assert abs(r.weighted_quantile - ref) < 1e-9
        assert abs(r.total_weight - total) < 1e-6
    assert (
        rows[0.25].weighted_quantile
        <= rows[0.5].weighted_quantile
        <= rows[0.75].weighted_quantile
    )


def test_cohort_ltv_cumulative_consistency(spark, sf_small):
    from dataframe_differ_spark.queries.statsops import q_orders_cohort_ltv

    rows = q_orders_cohort_ltv(spark, sf_small).collect()
    by_cohort: dict[tuple, list] = {}
    for r in rows:
        by_cohort.setdefault((r.cohort_year, r.cohort_month), []).append(r)
    for series in by_cohort.values():
        series.sort(key=lambda r: r.age_months)
        run = 0
        for r in series:
            run += r.revenue_cents
            assert r.cum_revenue_cents == run
            assert r.ltv_cents_per_customer == run // r.n_customers
    # cohort sizes sum to the number of customers with >= 1 order
    o = pq.read_table(sf_small + "/orders.parquet").to_pandas()
    n_cust = o["o_custkey"].nunique()
    assert sum(s[0].n_customers for s in by_cohort.values()) == n_cust


def test_sliding_distinct_matches_pandas(spark, sf_small):
    from dataframe_differ_spark.queries.statsops import (
        q_events_sliding_distinct,
    )

    got = {
        r.day: r.distinct_users_7d
        for r in q_events_sliding_distinct(spark, sf_small).collect()
    }
    e = pq.read_table(sf_small + "/events.parquet").to_pandas()
    e["d"] = e["ts"].dt.date
    act = e[["user_id", "d"]].drop_duplicates()
    days = sorted(act["d"].unique())
    import datetime

    ref = {}
    for d in days:
        lo = d - datetime.timedelta(days=6)
        ref[str(d)] = act[(act.d >= lo) & (act.d <= d)]["user_id"].nunique()
    assert got == ref


def test_cuped_reduces_variance_same_means(spark, sf_small):
    from dataframe_differ_spark.queries.statsops import q_events_uplift_cuped

    rows = {
        r.is_treatment: r
        for r in q_events_uplift_cuped(spark, sf_small).collect()
    }
    assert set(rows) == {True, False}
    for r in rows.values():
        assert r.n_users > 0
        assert r.var_raw > 0 and r.var_cuped > 0
        # variance REDUCTION is only an asymptotic guarantee; at sf0.001
        # an arm has ~3 users and arm-level theta mismatch can inflate it.
        if r.n_users >= 50:
            assert r.var_cuped <= r.var_raw * 1.05
    # both arms share one pooled theta
    assert rows[True].theta == rows[False].theta


def test_cuped_matches_numpy(spark, sf_small):
    import numpy as np

    from dataframe_differ_spark.queries.statsops import q_events_uplift_cuped

    rows = {
        r.is_treatment: r
        for r in q_events_uplift_cuped(spark, sf_small).collect()
    }
    e = pq.read_table(sf_small + "/events.parquet").to_pandas()
    e["d"] = e["ts"].dt.date
    d0, d1 = e["d"].min(), e["d"].max()
    import datetime

    cut = d0 + datetime.timedelta(days=(d1 - d0).days // 2)
    per = (
        e.assign(x=(e.d < cut).astype(int), y=(e.d >= cut).astype(int))
        .groupby("user_id")[["x", "y"]]
        .sum()
    )
    x, y = per["x"].to_numpy(float), per["y"].to_numpy(float)
    theta = np.cov(x, y, ddof=0)[0, 1] / np.var(x)
    treat = per.index.map(_md5_base).to_numpy()
    for flag in (True, False):
        yy, xx = y[treat == flag], x[treat == flag]
        adj = yy - theta * (xx - x.mean())
        r = rows[flag]
        assert abs(r.theta - theta) < 1e-6
        assert abs(r.mean_raw - yy.mean()) < 1e-6
        assert abs(r.mean_cuped - adj.mean()) < 1e-6
        assert abs(r.var_raw - yy.var(ddof=1)) < 1e-5
        assert abs(r.var_cuped - adj.var(ddof=1)) < 1e-5


def test_link_prediction_excludes_edges_and_matches_python(spark, sf_small):
    from dataframe_differ_spark.queries.statsops import q_graph_link_prediction

    rows = q_graph_link_prediction(spark, sf_small).collect()
    e = copurchase_edges(spark, sf_small).collect()
    edges = {(r.u, r.v) for r in e}
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for r in rows:
        assert (r.part_a, r.part_b) not in edges
        common = adj[r.part_a] & adj[r.part_b]
        assert len(common) == r.n_common
        assert len(adj[r.part_a]) + len(adj[r.part_b]) - r.n_common == r.n_union
        assert abs(r.jaccard - round(r.n_common / r.n_union, 9)) < 1e-12
    js = [r.jaccard for r in rows]
    assert js == sorted(js, reverse=True)


def test_link_prediction_capped_agrees_with_exact(spark, sf_small):
    """Round-5: the degree-capped scale form (cap=64) must reproduce the
    exact top-50 wherever no vertex exceeds the cap — which is everywhere
    in the test corpus, so the outputs are identical pair-for-pair."""
    from dataframe_differ_spark.queries.statsops import (
        q_graph_link_prediction,
        q_graph_link_prediction_capped,
    )

    exact = [
        (r.part_a, r.part_b, r.n_common, r.n_union)
        for r in q_graph_link_prediction(spark, sf_small).collect()
    ]
    capped = [
        (r.part_a, r.part_b, r.n_common, r.n_union)
        for r in q_graph_link_prediction_capped(spark, sf_small).collect()
    ]
    # corpus degrees are all < 64 → cap is a no-op; top-50 must agree
    assert set(exact) == set(capped)


def test_link_prediction_cap_bounds_hub_wedges(spark):
    """Round-5 structural scale test: on a synthetic hub graph (one vertex
    of degree 500) the capped neighbor sample bounds the hub's wedge
    output at C(64, 2), where the uncapped form emits C(500, 2) — the
    Σ deg² explosion the cap exists to prevent."""
    from pyspark.sql import functions as SF

    from dataframe_differ_spark.operators.ranks import partitioned_topk

    hub_edges = [(0, i) for i in range(1, 501)] + [(1000, 1001), (1000, 1002)]
    edges = spark.createDataFrame(hub_edges, ["u", "v"])
    sym = edges.unionAll(
        edges.select(SF.col("v").alias("u"), SF.col("u").alias("v"))
    )
    hkey = SF.md5(
        SF.concat_ws(":", SF.col("u").cast("string"), SF.col("v").cast("string"))
    )
    capped = partitioned_topk(sym, ["u"], [hkey, "v"], 64)
    # per-vertex neighbor lists are capped at 64
    degs = capped.groupBy("u").count().collect()
    assert max(r["count"] for r in degs) == 64
    a = capped.select(SF.col("u").alias("w"), SF.col("v").alias("x"))
    b = capped.select(SF.col("u").alias("w"), SF.col("v").alias("y"))
    wedges = a.join(b, "w").filter(SF.col("x") < SF.col("y"))
    hub_wedges = wedges.filter(SF.col("w") == 0).count()
    assert hub_wedges == 64 * 63 // 2  # vs 500*499/2 uncapped
    # the deterministic hash sample is reproducible run to run
    again = partitioned_topk(sym, ["u"], [hkey, "v"], 64)
    assert sorted(capped.collect()) == sorted(again.collect())


def test_welch_matches_numpy(spark, sf_small):
    import numpy as np

    from dataframe_differ_spark.queries.statsops import q_stats_welch_ttest

    r = q_stats_welch_ttest(spark, sf_small).collect()[0]
    e = pq.read_table(sf_small + "/events.parquet").to_pandas()
    e["cents"] = np.where(
        e.event_type == "purchase", np.round(e.value * 100).astype("int64"), 0
    )
    per = e.groupby("user_id")["cents"].sum()
    treat = per.index.map(_md5_base).to_numpy()
    a, b = per[treat].to_numpy(float), per[~treat].to_numpy(float)
    assert r.n_treat == len(a) and r.n_control == len(b)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    df = se2 * se2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert abs(r.t_stat - t) < 1e-6
    assert abs(r.df_welch - df) < 1e-4
    assert r.significant_95 == (abs(t) > 1.96)


def test_fdr_bh_stepup_rule(spark, sf_small):
    from dataframe_differ_spark.queries.statsops import q_stats_fdr_bh

    rows = sorted(
        q_stats_fdr_bh(spark, sf_small).collect(), key=lambda r: r.p_rank
    )
    assert rows, "at least one testable nation expected"
    m = rows[0].n_tests
    assert all(r.n_tests == m for r in rows)
    assert [r.p_rank for r in rows] == list(range(1, len(rows) + 1))
    # p ascending along rank (ties allowed via the exact |z| BIGINT key)
    ps = [r.p_two for r in rows]
    assert ps == sorted(ps)
    # BH step-up: reject exactly ranks <= k* = max{i : p_i <= 0.05*i/m}
    kstar = max(
        (r.p_rank for r in rows if r.p_two <= 0.05 * r.p_rank / m), default=0
    )
    for r in rows:
        assert r.reject_fdr05 == (r.p_rank <= kstar)
        assert abs(r.bh_critical - round(0.05 * r.p_rank / m, 9)) < 1e-12
        # z-test recompute from the four integer cells
        pt, pc = r.c_t / r.n_t, r.c_c / r.n_c
        pool = (r.c_t + r.c_c) / (r.n_t + r.n_c)
        z = (pt - pc) / math.sqrt(
            pool * (1 - pool) * (1 / r.n_t + 1 / r.n_c)
        )
        assert abs(r.z - z) < 1e-6


def test_chi2_matches_numpy(spark, sf_small):
    import numpy as np

    from dataframe_differ_spark.queries.statsops import (
        q_stats_chi2_independence,
    )

    r = q_stats_chi2_independence(spark, sf_small).collect()[0]
    c = pq.read_table(sf_small + "/customer.parquet").to_pandas()
    obs = c.groupby(["c_nationkey", "c_mktsegment"]).size().unstack(fill_value=0)
    o = obs.to_numpy(float)
    rt, ct, n = o.sum(axis=1), o.sum(axis=0), o.sum()
    # Only observed (non-empty) cells contribute terms in the query; an
    # all-zero cell would divide by a nonzero expected count and add 0
    # only if cnt==e==0 never happens — recompute over observed cells.
    e = np.outer(rt, ct) / n
    mask = o > 0
    chi2 = (((o - e) ** 2 / e)[mask]).sum()
    nr, nc = (rt > 0).sum(), (ct > 0).sum()
    assert r.n_obs == int(n)
    assert r.dof == (nr - 1) * (nc - 1)
    assert abs(r.chi2 - chi2) < 1e-5
    assert abs(r.cramers_v - math.sqrt(chi2 / (n * min(nr - 1, nc - 1)))) < 1e-8


def test_mann_whitney_matches_python_reference(spark, sf_small):
    """Round-5: U statistic and tie-corrected z against a pure-Python
    midrank computation at sf0.001."""
    from dataframe_differ_spark.queries.statsops import q_stats_mann_whitney

    row = q_stats_mann_whitney(spark, sf_small).collect()[0]
    t = pq.read_table(sf_small + "/orders.parquet").to_pandas()
    t["grp"] = t["o_orderkey"].map(_md5_base)
    vals = sorted(t["o_totalprice"])
    # midrank per value
    import collections

    cnt = collections.Counter(vals)
    midrank, cum = {}, 0
    for v in sorted(cnt):
        midrank[v] = cum + (cnt[v] + 1) / 2
        cum += cnt[v]
    a = t[t.grp]["o_totalprice"]
    r1 = sum(midrank[v] for v in a)
    n1, n2 = len(a), len(t) - len(a)
    u1 = r1 - n1 * (n1 + 1) / 2
    assert row.n1 == n1 and row.n2 == n2
    assert abs(row.u1 - u1) < 1e-9
    assert abs(row.u2 - (n1 * n2 - u1)) < 1e-9
    n = n1 + n2
    ties = sum(c**3 - c for c in cnt.values())
    sigma2 = n1 * n2 / 12 * ((n + 1) - ties / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2) / sigma2**0.5
    assert abs(row.z_score - round(z, 9)) < 1e-8


def test_spearman_matches_python_reference(spark, sf_small):
    """Round-5: Spearman rho and cents-Pearson against a pure-Python
    midrank/Pearson computation at sf0.001."""
    from dataframe_differ_spark.queries.statsops import q_stats_spearman_corr

    row = q_stats_spearman_corr(spark, sf_small).collect()[0]
    o = pq.read_table(sf_small + "/orders.parquet").to_pandas()
    li = pq.read_table(sf_small + "/lineitem.parquet").to_pandas()
    ycnt = li.groupby("l_orderkey").size()
    df = o.set_index("o_orderkey").join(ycnt.rename("y"), how="inner")
    xs = list(df["o_totalprice"])
    ys = list(df["y"])

    def midranks(vs):
        import collections

        cnt = collections.Counter(vs)
        mid, cum = {}, 0
        for v in sorted(cnt):
            mid[v] = cum + (cnt[v] + 1) / 2
            cum += cnt[v]
        return [mid[v] for v in vs]

    def pearson(a, b):
        n = len(a)
        sa, sb = sum(a), sum(b)
        sab = sum(x * y for x, y in zip(a, b))
        saa = sum(x * x for x in a)
        sbb = sum(y * y for y in b)
        return (n * sab - sa * sb) / (
            ((n * saa - sa * sa) * (n * sbb - sb * sb)) ** 0.5
        )

    assert row.n == len(xs)
    assert abs(row.spearman_rho - pearson(midranks(xs), midranks(ys))) < 1e-8
    cents = [round(x * 100) for x in xs]
    assert abs(row.pearson_r_cents - pearson(cents, ys)) < 1e-8
