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

    @property
    def broadcast_joins(self) -> int:
        # BNLJ counts: a broadcast nested-loop (non-equi fan-out) still
        # keeps the big side shuffle-free.
        return self.broadcast_hash_joins + self.broadcast_nl_joins


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


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
    )
