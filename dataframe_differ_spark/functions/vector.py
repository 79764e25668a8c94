"""Vector math over `array<double>` columns — native HOFs, no UDFs.

The arithmetic stays JVM-side in whole-stage codegen (zip_with + aggregate).
Engine-parity contract: both engines multiply elementwise then accumulate
STRICTLY SEQUENTIALLY (Spark `aggregate` HOF ≡ DuckDB `list_reduce` with a
prepended 0.0) — IEEE ops in identical order give bit-identical cosines.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def dot(a: str, b: str) -> F.Column:
    """Sequential dot product of two array<double> columns."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm(a: str) -> F.Column:
    return F.sqrt(dot(a, a))


def cosine(a: str, b: str) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))


def SQL_DOT(a: str, b: str, dim: int = 64) -> str:
    """DuckDB twin of :func:`dot` (identical accumulation order)."""
    return (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), i -> {a}[i] * {b}[i])), "
        "(acc, x) -> acc + x)"
    )


def SQL_COS(a: str, b: str, dim: int = 64) -> str:
    return (
        f"{SQL_DOT(a, b, dim)} / "
        f"(sqrt({SQL_DOT(a, a, dim)}) * sqrt({SQL_DOT(b, b, dim)}))"
    )
