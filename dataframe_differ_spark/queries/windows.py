"""Layer E — window functions (SURVEY.md §2.E).

Every ordering includes a unique tiebreak column (SURVEY.md §5.4): window
results over ties are otherwise nondeterministic and would flap the oracle
hash. Windows shuffle once on their partition key; all functions over the
same (partition, order) share a single sort.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dataframe_differ_spark.queries import register
from dataframe_differ_spark.queries.relational import SQL_DSUM
from dataframe_differ_spark.tables import load_table


@register(
    "win_rank",
    oracle="""
SELECT c_custkey, c_nationkey,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
       CAST(RANK() OVER w AS INTEGER) AS rnk,
       CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
       CAST(NTILE(4) OVER w AS INTEGER) AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
""",
)
def q_win_rank(spark, sf_dir):
    """E1: ranking family over one shared window spec (single sort)."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return customer.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "win_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       FIRST_VALUE(o_totalprice) OVER w AS first_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def q_win_lag_lead(spark, sf_dir):
    """E2: analytic lag/lead/first over each customer's order history."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
    )


@register(
    "win_running",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_spend
FROM orders
""",
)
def q_win_running(spark, sf_dir):
    """E3a: running sum (rows frame), decimal-exact for engine parity."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "win_range_frame",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey
                  ORDER BY datediff('day', TIMESTAMP '1970-01-01', o_orderdate)
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS spend_30d
FROM orders
""",
)
def q_win_range_frame(spark, sf_dir):
    """E3b: 30-day trailing revenue — RANGE frame over epoch days.

    Range frames need a numeric ordering key, so the timestamp becomes
    epoch days in both engines; the frame covers the value interval
    [day-30, day], i.e. true time-based windows, not row counts.
    """
    orders = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-30, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("spend_30d"),
    )


@register(
    "win_topk_group",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice
FROM (SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part)
WHERE rn <= 3
""",
)
def q_win_topk_group(spark, sf_dir):
    """E4: top-3 per group — rank-filter; per-partition heap at scale."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice")
    )


@register(
    "win_distribution",
    oracle="""
SELECT c_custkey,
       ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 9) AS cume,
       CAST(NTILE(10) OVER w AS INTEGER) AS decile
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
""",
)
def q_win_distribution(spark, sf_dir):
    """E-family extension: distribution functions (percent_rank/cume_dist).

    Unpartitioned window = single-reducer sort; fine for a ranked export,
    but at 100 TB the partitioned form (per-nation, per-day) is the one to
    use — this query exists to pin the semantics. Ratios are single double
    divisions of identical integers → deterministic.
    """
    customer = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.ntile(10).over(w).alias("decile"),
    )
