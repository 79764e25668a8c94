"""Parametric privacy-audit operators over arbitrary DataFrames.

Round-6 extraction (continuing the round's library pattern): the
data-governance audits — previously fixture-bound ``queries()`` closures
(queries/statsops.py) — as a reusable library:

    from dataframe_differ_spark.operators.privacy import k_anonymity
    risky = k_anonymity(users, ["zip3", "age_band", "gender"], k=5)

Design rules shared by every operator here:

- **Schema-agnostic**: the quasi-identifier columns are a parameter (the
  caller buckets continuous QIs first); internals use ``_pr_`` prefixed
  temporaries and refuse colliding inputs; outputs keep the caller's QI
  column names and add fixed documented audit columns.
- **Scan-shaped plans**: one map-side-combinable groupBy on the QI tuple
  + a 1-row broadcast of the corpus risk stats + a TakeOrdered of the
  riskiest classes — scan-bound at 100 TB.

The registered queries (``privacy_k_anonymity``, ``privacy_l_diversity``)
are thin fixture bindings over these functions; their DuckDB oracles and
the golden corpus pin the semantics.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "k_anonymity",
    "l_diversity",
]


def _check_reserved(df: DataFrame, prefix: str = "_pr_") -> None:
    for c in df.columns:
        if c.startswith(prefix):
            raise ValueError(f"input column {c!r} collides with {prefix} internals")


def k_anonymity(
    df: DataFrame,
    qi_cols: Sequence[str],
    *,
    k: int = 5,
    top_n: int = 10,
) -> DataFrame:
    """k-anonymity audit → the ``top_n`` smallest equivalence classes as
    ``(qi..., grp_size, n_groups, n_groups_lt_k, n_rows_at_risk,
    min_group_size)``.

    The pre-release re-identification check (Sweeney 2002): group by the
    quasi-identifier tuple and find classes smaller than ``k`` — rows in
    those classes are linkable to external data. Corpus-level risk stats
    ride along on every row via a 1-row broadcast; the riskiest
    (smallest) classes surface via TakeOrdered with the QI columns as
    deterministic tie-breaks.
    """
    _check_reserved(df)
    qi = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("grp_size"))
    tot = qi.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("grp_size") < k, 1).otherwise(0)).alias(
            "n_groups_lt_k"
        ),
        F.sum(
            F.when(F.col("grp_size") < k, F.col("grp_size")).otherwise(0)
        ).alias("n_rows_at_risk"),
        F.min("grp_size").alias("min_group_size"),
    )
    return (
        qi.crossJoin(F.broadcast(tot))
        .orderBy("grp_size", *qi_cols)
        .limit(top_n)
        .select(
            *qi_cols,
            "grp_size",
            "n_groups",
            "n_groups_lt_k",
            "n_rows_at_risk",
            "min_group_size",
        )
    )


def l_diversity(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    *,
    l: int = 3,  # noqa: E741  (the metric's canonical name)
    top_n: int = 10,
) -> DataFrame:
    """l-diversity audit → the ``top_n`` least-diverse equivalence classes
    as ``(qi..., grp_size, l_distinct, n_classes, min_l, n_classes_lt_l,
    n_rows_at_risk)``.

    k-anonymity alone fails the homogeneity attack (Machanavajjhala et
    al. 2007): a class of ≥ k rows that all share one sensitive value
    still discloses it. A class is risky when it holds fewer than ``l``
    distinct values of ``sensitive_col``. One groupBy with a
    distinct-count (Spark's two-level partial aggregate) + a 1-row
    broadcast; TakeOrdered by (l_distinct, grp_size, qi...).
    """
    _check_reserved(df)
    cls = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("grp_size"),
        F.countDistinct(sensitive_col).alias("l_distinct"),
    )
    tot = cls.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("l_distinct").alias("min_l"),
        F.sum(F.when(F.col("l_distinct") < l, 1).otherwise(0)).alias(
            "n_classes_lt_l"
        ),
        F.sum(
            F.when(F.col("l_distinct") < l, F.col("grp_size")).otherwise(0)
        ).alias("n_rows_at_risk"),
    )
    return (
        cls.crossJoin(F.broadcast(tot))
        .orderBy("l_distinct", "grp_size", *qi_cols)
        .limit(top_n)
        .select(
            *qi_cols,
            "grp_size",
            "l_distinct",
            "n_classes",
            "min_l",
            "n_classes_lt_l",
            "n_rows_at_risk",
        )
    )
