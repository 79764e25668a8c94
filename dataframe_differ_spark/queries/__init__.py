"""Query registry: every SURVEY.md §2 operator ships as a named query.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with its
DuckDB oracle SQL (or ``None`` for non-SQL-expressible ops, which the driver
checks rows-only). Keeping both halves adjacent in the registering module is
what keeps column aliases / rounding / timezone normalization in sync —
the oracle-parity hazards of SURVEY.md §5.4.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    fn: QueryFn
    oracle: str | None = None


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle SQL) by name.

    Raises on duplicate names: a re-registration silently SHADOWS the
    earlier query (the registry is a dict), which corrupts goldens and
    coverage accounting — fail at import instead.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(
                f"query {name!r} registered twice "
                f"(second definition: {fn.__module__}.{fn.__qualname__})"
            )
        REGISTRY[name] = Query(fn=fn, oracle=oracle)
        return fn

    return deco


_LOADED = False


def load_all() -> dict[str, Query]:
    """Import all query modules (side-effect registration) once."""
    global _LOADED
    if not _LOADED:
        from dataframe_differ_spark.queries import (  # noqa: F401
            diff_queries,
            relational,
            windows,
            textops,
            pipelineops,
            vectors,
            scalars,
            composites,
            warehouse,
            streaming_queries,
            advanced_streaming,
            udfs,
        )

        _LOADED = True
    return REGISTRY
