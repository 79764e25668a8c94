"""Anti-rot checks for the two load-bearing audit whitelists (round 8,
VERDICT r7 item #6).

The plan-audit global-window whitelist (tools/plan_audit.py
GLOBAL_WINDOW_OK) and the cast-audit "safe by bounded magnitude" table
(BASELINE.md round-7 section) are safety DOCUMENTS: the first names
every query allowed a partition-less Window with its boundedness
reason, the second names every exact-integer→double site left
unconverted with its magnitude bound. Both rot silently if the code
they describe moves: a whitelist row for a deleted query hides gate
coverage, and a "safe" site whose documenting comment disappears can
be edited past its bound without tripping anything.

plan_audit already fails STALE window entries at runtime (an entry
whose live plan has no global window); this pytest adds the cheaper
static half so rot fails in the unit suite too, without a Spark plan
build: every whitelisted/expected query name must still be registered,
and every cast-audit "safe" site must still carry its documenting
comment at the named file.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _registry():
    from dataframe_differ_spark.queries import load_all

    return load_all()


def test_plan_audit_whitelists_name_live_queries():
    import plan_audit

    reg = set(_registry())
    for table_name in ("GLOBAL_WINDOW_OK", "MUST_BROADCAST", "MUST_PUSH_FILTER", "SKIP"):
        table = getattr(plan_audit, table_name, None)
        if table is None:
            continue
        dead = sorted(set(table) - reg)
        assert not dead, (
            f"tools/plan_audit.py {table_name} names unregistered queries "
            f"{dead} — remove the stale rows (or restore the queries)"
        )


# One row per "safe by bounded magnitude" class in BASELINE.md's
# round-7 cast-audit table: (BASELINE label, file, the documenting
# comment that must stay at the site). If an assertion here fires,
# either restore the comment or RE-AUDIT the site and update
# BASELINE.md — the bound claim is only as good as its documentation.
CAST_AUDIT_SAFE_SITES = [
    (
        "agg_skewness_kurtosis BIGINT raw moments (Σq⁴ ≤ 6.25e6·n)",
        "dataframe_differ_spark/queries/statsops.py",
        "sums stay under 2^63 beyond sf100",
    ),
    (
        "theil DECIMAL(38,12) log-bounded contributions",
        "dataframe_differ_spark/queries/composites.py",
        "summed as DECIMAL(38,12) — order-free",
    ),
    (
        "js_divergence DECIMAL(38,12) contributions (JSD ≤ ln 2)",
        "dataframe_differ_spark/queries/statsops.py",
        "rounded to 12 dp and summed as DECIMAL(38,12)",
    ),
    (
        "pagerank portable DECIMAL sums (total PR mass = 1)",
        "dataframe_differ_spark/operators/graph.py",
        "sums as DECIMAL(38,12): the sum is order-free",
    ),
    (
        "ks_test BIGINT cum·n cross-products (de-encoded round 7)",
        "dataframe_differ_spark/operators/drift.py",
        "2^63 rows per cohort with no cliff",
    ),
    (
        "kendall_tau / rank-sum class: BIGINT-rooted to the final ratio",
        "dataframe_differ_spark/operators/stats.py",
        "BIGINT until the final τ-b ratio",
    ),
    (
        "lorenz/abc/pareto integer-cents shares (single int64→double div)",
        "dataframe_differ_spark/queries/composites.py",
        "share divisions are the only float ops, on identical BIGINT",
    ),
    (
        "market-basket lift factors (< 2^53, exact per factor)",
        "dataframe_differ_spark/queries/composites.py",
        "exact at any sf below 2^53",
    ),
]


def test_cast_audit_safe_sites_still_documented():
    for label, rel, marker in CAST_AUDIT_SAFE_SITES:
        path = os.path.join(REPO, rel)
        text = open(path, encoding="utf-8").read()
        assert marker in text, (
            f"cast-audit safe site {label!r}: documenting comment "
            f"{marker!r} no longer present in {rel} — re-audit the site "
            "and update BASELINE.md's round-7 table"
        )
    # the BASELINE table itself must keep naming the same classes
    baseline = open(os.path.join(REPO, "BASELINE.md"), encoding="utf-8").read()
    assert "Safe by bounded magnitude" in baseline


def test_split_cast_device_still_shared():
    # the converted class's device: both halves must exist and stay
    # importable (the oracle half is string-generating, no Spark needed)
    from dataframe_differ_spark.operators.numeric import (
        split_cast_double,
        split_cast_sql,
    )

    assert callable(split_cast_double)
    assert "::DOUBLE" in split_cast_sql("x") or "AS DOUBLE" in split_cast_sql("x")
