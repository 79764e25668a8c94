"""Accuracy checks for sketch-based operators (no SQL oracle exists)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataframe_differ_spark.queries.relational import q_agg_hll_merge
from dataframe_differ_spark.tables import load_table


def test_hll_merge_estimates_close_to_exact(spark, sf_small):
    # Round 4: the query itself now folds the estimate into a
    # within_bound boolean (full-oracle restructure); this test keeps an
    # INDEPENDENT recomputation of the exact counts so the query's own
    # exact side can't mask a regression.
    rows = q_agg_hll_merge(spark, sf_small).collect()
    assert all(r.within_bound for r in rows), [
        (r.level, r.key) for r in rows if not r.within_bound
    ]
    out = {(r.level, r.key): r.exact_distinct for r in rows}
    c = load_table(spark, sf_small, "customer")
    n = load_table(spark, sf_small, "nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    exact_nation = {
        r.n_name: r.x
        for r in joined.groupBy("n_name")
        .agg(F.countDistinct("c_custkey").alias("x"))
        .collect()
    }
    exact_region = {
        str(r.n_regionkey): r.x
        for r in joined.groupBy("n_regionkey")
        .agg(F.countDistinct("c_custkey").alias("x"))
        .collect()
    }
    exact_global = c.select("c_custkey").distinct().count()

    def close(est, exact):
        return est == exact

    for name, exact in exact_nation.items():
        assert close(out[("nation", name)], exact), (name, exact)
    for key, exact in exact_region.items():
        assert close(out[("region", key)], exact), (key, exact)
    assert close(out[("global", "all")], exact_global)

    # Merge consistency: the global union estimate can't exceed the sum of
    # the per-nation estimates it merged.
    assert out[("global", "all")] <= sum(
        v for (lvl, _), v in out.items() if lvl == "nation"
    ) * 1.01
