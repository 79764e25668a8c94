"""Extract scale-relevant features from a DataFrame's executed plan.

The features are the ones that decide whether a plan survives a 100×
scale-up (SURVEY.md §4): join strategies (a dimension join that stops
broadcasting becomes a fact-side shuffle), exchange count (each is a full
shuffle of its input), pushed filters (a filter that misses the scan reads
the whole table), and Python evaluation mode (BatchEvalPython is the
row-at-a-time slow path; Arrow-vectorized forms are sanctioned).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanFeatures:
    broadcast_hash_joins: int
    sort_merge_joins: int
    shuffled_hash_joins: int
    broadcast_nl_joins: int
    exchanges: int
    python_row_udfs: int
    python_udtfs: int
    python_arrow_evals: int
    pushed_filters: list[str]
    #: Partition-less Window operators — every one is a "move all rows to
    #: one task" cliff at scale unless its input is provably bounded
    #: (post-limit seeds, ≤B-row offset frames). Gated per-query by
    #: tools/plan_audit.py against an explicit bounded-input whitelist.
    global_windows: int = 0
    #: collect_list / collect_set aggregations — each materializes one
    #: in-memory array PER GROUP on a single reducer and defeats partial
    #: aggregation, so it is safe only when the GROUP SIZE is bounded by
    #: something other than the corpus (a doc's length, a 64-dim spine, a
    #: post-limit seed set). Gated per-query by tools/plan_audit.py
    #: against an explicit bounded-group whitelist with a stated bound
    #: (round-10 verdict item #2 — the ann_drift_refresh dim_means fold
    #: grouped a corpus-sized set and was OOM-by-construction at 100 TB).
    collect_folds: int = 0

    @property
    def broadcast_joins(self) -> int:
        # BNLJ counts: a broadcast nested-loop (non-equi fan-out) still
        # keeps the big side shuffle-free.
        return self.broadcast_hash_joins + self.broadcast_nl_joins


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def global_window_lines(plan: str) -> list[str]:
    """Window operator lines with NO partition spec (single-partition).

    Relies on WindowExec's simpleString shape (verified empirically on
    Spark 4.1): ``Window [funcs], [partSpec], [orderSpec]`` when
    partitioned, ``Window [funcs], [orderSpec]`` for a global ordered
    window (the second group then carries sort directions — " NULLS "),
    ``Window [funcs], [partSpec]`` for a partitioned unordered window
    (no " NULLS "), and ``Window [funcs]`` for a global unordered one.
    """
    hits = []
    for raw in plan.splitlines():
        s = raw.strip().lstrip("+-:* ").strip()
        if not s.startswith("Window "):
            continue
        groups = s.count("], [")
        if groups >= 2:
            continue  # [funcs], [part], [order] — partitioned
        if groups == 1 and " NULLS " not in s.rsplit("], [", 1)[1]:
            continue  # [funcs], [part] — partitioned, no order
        hits.append(s)
    return hits


def plan_features(df: DataFrame) -> PlanFeatures:
    plan = executed_plan(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    n_udtf = plan.count("BatchEvalPythonUDTF")
    return PlanFeatures(
        broadcast_hash_joins=plan.count("BroadcastHashJoin"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        shuffled_hash_joins=plan.count("ShuffledHashJoin"),
        broadcast_nl_joins=plan.count("BroadcastNestedLoopJoin"),
        exchanges=plan.count("Exchange hashpartitioning"),
        # UDTF eval is row-at-a-time too, but it is the documented escape
        # hatch surface (H14) — tracked separately from banned scalar UDFs.
        python_row_udfs=plan.count("BatchEvalPython") - n_udtf,
        python_udtfs=n_udtf,
        python_arrow_evals=(
            plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
        ),
        pushed_filters=[p for p in pushed if p],
        global_windows=len(global_window_lines(plan)),
        collect_folds=len(re.findall(r"collect_(?:list|set)\(", plan)),
    )
