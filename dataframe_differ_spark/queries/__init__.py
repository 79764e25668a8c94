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
    #: For bounded exact VERIFIER queries (small-block all-pairs forms kept
    #: to ground-truth a sub-linear sibling): the registry name of the
    #: DECLARED 100 TB scale path. None for queries whose own plan is the
    #: scale path. Enforced by tests: a query with scale_path must name a
    #: registered query, and its own input must be explicitly bounded.
    scale_path: str | None = None


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, scale_path: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle SQL) by name.

    ``scale_path`` marks a bounded verifier and names its declared 100 TB
    sibling (e.g. the brute-force cosine join that ground-truths the LSH
    form). Raises on duplicate names: a re-registration silently SHADOWS
    the earlier query (the registry is a dict), which corrupts goldens and
    coverage accounting — fail at import instead.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(
                f"query {name!r} registered twice "
                f"(second definition: {fn.__module__}.{fn.__qualname__})"
            )
        REGISTRY[name] = Query(fn=fn, oracle=oracle, scale_path=scale_path)
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
            scaleops,
            rankops,
            statsops,
            # LAST: composes other queries' registered oracles (any
            # module above may be a component).
            datacard,
        )

        _LOADED = True
    return REGISTRY
