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
    "t_closeness",
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


def t_closeness(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    *,
    t: float = 0.2,
    top_n: int = 10,
    round_dp: int = 9,
) -> DataFrame:
    """t-closeness audit for an ORDERED sensitive attribute → the
    ``top_n`` worst equivalence classes as ``(qi..., n_class, emd,
    exceeds_t)``.

    Completes the k-anonymity → l-diversity → t-closeness ladder (Li,
    Li, Venkatasubramanian 2007): a class can be k-anonymous and
    l-diverse yet still leak if its sensitive distribution differs from
    the global one. For ordered values the distance is the Earth
    Mover's Distance with unit ground distance between adjacent values:
    EMD = Σᵢ |Σ_{j≤i} (p_j − q_j)| / (m − 1) over the m-value spine.

    Exactness: class and global counts are BIGINTs; p_j − q_j is a
    difference of two BIGINT ratios (identical doubles on any engine);
    the per-class |running| sum folds over the sorted value spine
    (order-free cross-engine) — never a corpus sort. Plan: one
    (qi, value) rollup + one value rollup, a DENSE class × value spine
    built from two bounded distinct frames (QI combos × sensitive
    values — both bounded at 100 TB), per-class cumulative via a
    partitioned window over the tiny spine, TakeOrdered for the report.
    """
    _check_reserved(df)
    from pyspark.sql import Window

    cv = df.groupBy(*qi_cols, F.col(sensitive_col).alias("_pr_v")).agg(
        F.count(F.lit(1)).alias("_pr_c")
    )
    classes = cv.groupBy(*qi_cols).agg(F.sum("_pr_c").alias("_pr_nc"))
    gv = df.groupBy(F.col(sensitive_col).alias("_pr_v")).agg(
        F.count(F.lit(1)).alias("_pr_g")
    )
    gtot = gv.agg(
        F.sum("_pr_g").alias("_pr_n"), F.count(F.lit(1)).alias("_pr_m")
    )
    spine = classes.crossJoin(F.broadcast(gv))
    dense = spine.join(cv, [*qi_cols, "_pr_v"], "left").select(
        *qi_cols,
        "_pr_nc",
        "_pr_v",
        F.coalesce("_pr_c", F.lit(0)).alias("_pr_c"),
        "_pr_g",
    )
    w = (
        Window.partitionBy(*qi_cols)
        .orderBy("_pr_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = dense.crossJoin(F.broadcast(gtot)).withColumn(
        "_pr_r",
        F.sum(
            F.col("_pr_c").cast("double") / F.col("_pr_nc")
            - F.col("_pr_g").cast("double") / F.col("_pr_n")
        ).over(w),
    )
    emd = run.groupBy(*qi_cols, "_pr_nc", "_pr_m").agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("_pr_v", "_pr_r"))),
                F.lit(0.0),
                lambda acc, x: acc + F.abs(x["_pr_r"]),
            )
            / (F.col("_pr_m") - 1),
            round_dp,
        ).alias("emd")
    )
    return (
        emd.orderBy(F.col("emd").desc(), *qi_cols)
        .limit(top_n)
        .select(
            *qi_cols,
            F.col("_pr_nc").alias("n_class"),
            "emd",
            (F.col("emd") > t).alias("exceeds_t"),
        )
    )
