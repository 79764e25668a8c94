"""Deterministic left/right pair derivation for diff queries.

No separate right-side fixture exists (FIXTURES.md), so diff queries derive
the right table from ``orders`` inside the query, identically in Spark and
in the DuckDB oracle:

- delete  rows where ``o_orderkey % 97 == 0``            → status 'D'
- perturb ``o_totalprice * 1.01`` where ``% 53 == 0``    → status 'C'
- insert  rows where ``% 101 == 0`` with key +10,000,000 → status 'I'

The perturbation is raw IEEE double multiplication — bit-identical in both
engines — so no rounding normalization is needed on the compared values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ORDERS_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]

NONKEY_COLS = ORDERS_COLS[1:]


def mutated_orders(orders: DataFrame) -> DataFrame:
    """The deterministic 'right' side, from the 'left' ``orders``."""
    kept = orders.filter(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 53 == 0, F.col("o_totalprice") * F.lit(1.01)
        ).otherwise(F.col("o_totalprice")),
    )
    inserted = orders.filter(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
    )
    return kept.select(*ORDERS_COLS).unionByName(inserted.select(*ORDERS_COLS))


def mutated_orders_b(orders: DataFrame) -> DataFrame:
    """A second deterministic branch (the 'theirs' side of a 3-way merge).

    Different moduli from :func:`mutated_orders` so the two branches
    overlap only on lcm keys: perturb ``% 59`` (× 1.02, so keys divisible
    by both 53 and 59 — lcm 3127 — are CONFLICTING edits), delete
    ``% 89``, insert ``% 103`` at key +20,000,000.
    """
    kept = orders.filter(F.col("o_orderkey") % 89 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 59 == 0, F.col("o_totalprice") * F.lit(1.02)
        ).otherwise(F.col("o_totalprice")),
    )
    inserted = orders.filter(F.col("o_orderkey") % 103 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(20_000_000)
    )
    return kept.select(*ORDERS_COLS).unionByName(inserted.select(*ORDERS_COLS))


# DuckDB CTE computing the identical second branch.
MUTATED_ORDERS_B_SQL = """
  SELECT o_orderkey,
         o_custkey,
         o_orderstatus,
         CASE WHEN o_orderkey % 59 = 0 THEN o_totalprice * 1.02
              ELSE o_totalprice END AS o_totalprice,
         o_orderdate,
         o_orderpriority
  FROM orders
  WHERE o_orderkey % 89 <> 0
  UNION ALL
  SELECT o_orderkey + 20000000,
         o_custkey,
         o_orderstatus,
         o_totalprice,
         o_orderdate,
         o_orderpriority
  FROM orders
  WHERE o_orderkey % 103 = 0
"""


# DuckDB CTE computing the identical right side (use as `WITH right_t AS (...)`).
MUTATED_ORDERS_SQL = """
  SELECT o_orderkey,
         o_custkey,
         o_orderstatus,
         CASE WHEN o_orderkey % 53 = 0 THEN o_totalprice * 1.01
              ELSE o_totalprice END AS o_totalprice,
         o_orderdate,
         o_orderpriority
  FROM orders
  WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000,
         o_custkey,
         o_orderstatus,
         o_totalprice,
         o_orderdate,
         o_orderpriority
  FROM orders
  WHERE o_orderkey % 101 = 0
"""
