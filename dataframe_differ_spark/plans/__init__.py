"""Physical-plan inspection — the scale-audit half of the engine.

Correctness says what a query returns; these helpers say HOW it will run at
100 TB: which joins broadcast vs shuffle, whether filters reached the
parquet scan, and whether any row-at-a-time Python crept into the hot path.
`tools/plan_audit.py` drives this over every registered query.
"""

from dataframe_differ_spark.plans.audit import (  # noqa: F401
    PlanFeatures,
    plan_features,
)
