"""Accuracy checks for sketch-based operators (no SQL oracle exists)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataframe_differ_spark.queries.relational import q_agg_hll_merge
from dataframe_differ_spark.tables import load_table


def test_hll_merge_estimates_close_to_exact(spark, sf_small):
    out = {
        (r.level, r.key): r.estimate
        for r in q_agg_hll_merge(spark, sf_small).collect()
    }
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

    # lgConfigK=12 default → relative error ~1.6%; allow 5% + absolute slack
    # for the tiny sf0.001 groups.
    def close(est, exact):
        return abs(est - exact) <= max(0.05 * exact, 2)

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
