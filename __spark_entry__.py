"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``dataframe_differ_spark.queries`` — the engine's query
registry. The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataframe_differ_spark.queries import load_all  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: keyed diff summary of orders vs seeded-mutated orders.

    Exercises the reference's core capability (full-outer null-safe join +
    per-column comparison + aggregation) in one query. Driver checks rows>0.
    """
    registry = load_all()
    return registry["diff_summary"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle}
