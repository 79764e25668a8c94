"""Operator library: diff core (reference surface) + extensions."""

from dataframe_differ_spark.operators.diff_core import (
    schema_diff,
    diff,
    diff_unkeyed,
    diff_summary,
    column_mismatch_stats,
    duplicate_keys,
    changed_sample,
)

__all__ = [
    "schema_diff",
    "diff",
    "diff_unkeyed",
    "diff_summary",
    "column_mismatch_stats",
    "duplicate_keys",
    "changed_sample",
]
