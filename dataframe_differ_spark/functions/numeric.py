"""Exact-decimal numeric aggregation helpers (oracle-parity safe).

IEEE double summation is order-dependent, and Spark's partial-aggregate
order differs from DuckDB's — so money aggregates sum via exact decimals
and cast the exact result back to double: bit-identical on both engines,
and on any cluster size (the 100 TB property: results don't depend on
partitioning).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def dsum(c, alias, scale="18,2"):
    """Exact (decimal) sum of a double column, returned as double."""
    return F.sum(c.cast(f"decimal({scale})")).cast("double").alias(alias)


def SQL_DSUM(expr, alias, scale="18,2"):
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({scale}))) AS DOUBLE) AS {alias}"


def rev_dec():
    """Exact-decimal revenue l_extendedprice*(1-l_discount).

    Factors are cast to decimal BEFORE multiplying: a double→decimal cast
    of a 2-dp money value can never land on a rounding half (x.xx5 has no
    double representation), so both engines round identically; the decimal
    multiply/sum is then exact. Casting the double PRODUCT instead can hit
    exact halves where Spark (HALF_UP) and DuckDB disagree — observed at
    sf0.1.
    """
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )


SQL_REV_DEC = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) "
    "* (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)
