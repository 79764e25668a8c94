"""Layer A — diff core queries (SURVEY.md §2.A) with DuckDB oracles.

Left side is always ``orders``; right side is the deterministic in-query
mutation from ``_mutation`` so Spark and DuckDB diff the identical pair.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import dataframe_differ_spark.operators.diff_core as D
from dataframe_differ_spark.queries import register
from dataframe_differ_spark.queries._mutation import (
    MUTATED_ORDERS_SQL,
    NONKEY_COLS,
    mutated_orders,
)
from dataframe_differ_spark.tables import load_table


def _pair(spark, sf_dir):
    left = load_table(spark, sf_dir, "orders")
    return left, mutated_orders(left)


def _distinct_clause(tolerant: bool = False) -> str:
    parts = []
    for c in NONKEY_COLS:
        if tolerant and c == "o_totalprice":
            parts.append(
                "(NOT (l.o_totalprice IS NULL AND r.o_totalprice IS NULL) AND "
                "(l.o_totalprice IS NULL OR r.o_totalprice IS NULL OR "
                "ABS(l.o_totalprice - r.o_totalprice) > 5.0 + 0.001 * ABS(r.o_totalprice)))"
            )
        else:
            parts.append(f"(l.{c} IS DISTINCT FROM r.{c})")
    return "\n             OR ".join(parts)


def _diff_select(tolerant: bool = False) -> str:
    pairs = ",\n       ".join(
        f"l.{c} AS {c}_left, r.{c} AS {c}_right" for c in NONKEY_COLS
    )
    return f"""
WITH right_t AS ({MUTATED_ORDERS_SQL})
SELECT CASE WHEN l.o_orderkey IS NULL THEN 'I'
            WHEN r.o_orderkey IS NULL THEN 'D'
            WHEN {_distinct_clause(tolerant)}
            THEN 'C' ELSE 'N' END AS diff_status,
       COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey,
       {pairs}
FROM orders l FULL OUTER JOIN right_t r ON l.o_orderkey = r.o_orderkey
"""


DIFF_KEYED_SQL = _diff_select()


@register("diff_keyed", oracle=DIFF_KEYED_SQL)
def q_diff_keyed(spark, sf_dir):
    """A2: keyed row diff — one full-outer join + codegen'd comparisons."""
    left, right = _pair(spark, sf_dir)
    return D.diff(left, right, ["o_orderkey"])


@register(
    "diff_summary",
    oracle=f"""
WITH d AS ({DIFF_KEYED_SQL})
SELECT diff_status, COUNT(*) AS cnt FROM d GROUP BY diff_status
""",
)
def q_diff_summary(spark, sf_dir):
    """A4: status counts — map-side-combinable aggregate over the diff."""
    left, right = _pair(spark, sf_dir)
    return D.diff_summary(left, right, ["o_orderkey"])


@register(
    "diff_tolerant",
    oracle=f"""
WITH d AS ({_diff_select(tolerant=True)})
SELECT diff_status, COUNT(*) AS cnt FROM d GROUP BY diff_status
""",
)
def q_diff_tolerant(spark, sf_dir):
    """A6: tolerant diff — |l-r| <= atol + rtol*|r| treated equal.

    atol=5.0 reclassifies small-price perturbations back to 'N', so the
    status mix differs from the exact diff (that's the point of the test).
    """
    left, right = _pair(spark, sf_dir)
    return D.diff_summary(left, right, ["o_orderkey"], atol=5.0, rtol=0.001)


@register(
    "diff_unkeyed",
    oracle="""
WITH l AS (SELECT l_partkey, l_quantity, l_returnflag FROM lineitem),
     r AS (SELECT l_partkey, l_quantity, l_returnflag FROM lineitem
           WHERE l_suppkey % 11 <> 0),
     lc AS (SELECT l_partkey, l_quantity, l_returnflag,
                   COUNT(*) AS left_count FROM l GROUP BY ALL),
     rc AS (SELECT l_partkey, l_quantity, l_returnflag,
                   COUNT(*) AS right_count FROM r GROUP BY ALL)
SELECT COALESCE(lc.l_partkey, rc.l_partkey) AS l_partkey,
       COALESCE(lc.l_quantity, rc.l_quantity) AS l_quantity,
       COALESCE(lc.l_returnflag, rc.l_returnflag) AS l_returnflag,
       COALESCE(lc.left_count, 0) AS left_count,
       COALESCE(rc.right_count, 0) AS right_count
FROM lc FULL OUTER JOIN rc
  ON lc.l_partkey IS NOT DISTINCT FROM rc.l_partkey
 AND lc.l_quantity IS NOT DISTINCT FROM rc.l_quantity
 AND lc.l_returnflag IS NOT DISTINCT FROM rc.l_returnflag
WHERE COALESCE(lc.left_count, 0) <> COALESCE(rc.right_count, 0)
""",
)
def q_diff_unkeyed(spark, sf_dir):
    """A3: unkeyed multiset diff over a keyless lineitem projection."""
    li = load_table(spark, sf_dir, "lineitem")
    left = li.select("l_partkey", "l_quantity", "l_returnflag")
    right = li.filter(F.col("l_suppkey") % 11 != 0).select(
        "l_partkey", "l_quantity", "l_returnflag"
    )
    return D.diff_unkeyed(left, right)


def _mismatch_branch(c: str) -> str:
    return f"""
SELECT '{c}' AS column_name,
       CAST(SUM(CASE WHEN l.{c} IS NOT DISTINCT FROM r.{c} THEN 1 ELSE 0 END) AS BIGINT) AS n_equal,
       CAST(SUM(CASE WHEN l.{c} IS DISTINCT FROM r.{c} THEN 1 ELSE 0 END) AS BIGINT) AS n_different,
       CAST(SUM(CASE WHEN (l.{c} IS NULL) <> (r.{c} IS NULL) THEN 1 ELSE 0 END) AS BIGINT) AS n_null_mismatch
FROM orders l JOIN right_t r ON l.o_orderkey = r.o_orderkey
"""


@register(
    "col_mismatch",
    oracle="WITH right_t AS ({})\n{}".format(
        MUTATED_ORDERS_SQL,
        "\nUNION ALL\n".join(_mismatch_branch(c) for c in NONKEY_COLS),
    ),
)
def q_col_mismatch(spark, sf_dir):
    """A5: per-column equal/different/null-mismatch counts among matched keys."""
    left, right = _pair(spark, sf_dir)
    return D.column_mismatch_stats(left, right, ["o_orderkey"])


@register(
    "dup_keys",
    oracle="""
SELECT l_orderkey, COUNT(*) AS cnt
FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1
""",
)
def q_dup_keys(spark, sf_dir):
    """A7: uniqueness violation check (diff precondition)."""
    li = load_table(spark, sf_dir, "lineitem")
    return D.duplicate_keys(li, ["l_orderkey"])


@register(
    "changed_sample",
    oracle=f"""
WITH d AS ({DIFF_KEYED_SQL})
SELECT * FROM d WHERE diff_status = 'C' ORDER BY o_orderkey LIMIT 20
""",
)
def q_changed_sample(spark, sf_dir):
    """A8: deterministic top-n changed rows (TakeOrderedAndProject)."""
    left, right = _pair(spark, sf_dir)
    return D.changed_sample(left, right, ["o_orderkey"], n=20)


@register(
    "schema_diff",
    oracle="""
WITH l AS (
  SELECT column_name,
         CASE data_type
              WHEN 'BIGINT' THEN 'bigint'
              WHEN 'INTEGER' THEN 'int'
              WHEN 'DOUBLE' THEN 'double'
              WHEN 'VARCHAR' THEN 'string'
              WHEN 'TIMESTAMP' THEN 'timestamp_ntz'
              WHEN 'TIMESTAMP_NS' THEN 'timestamp_ntz'
              ELSE lower(data_type) END AS t
  FROM information_schema.columns WHERE table_name = 'orders'
)
SELECT column_name,
       t AS left_type,
       CASE WHEN column_name = 'o_orderpriority' THEN NULL
            WHEN column_name = 'o_totalprice' THEN 'string'
            ELSE t END AS right_type,
       CASE WHEN column_name = 'o_orderpriority' THEN 'removed'
            WHEN column_name = 'o_totalprice' THEN 'type_changed'
            ELSE 'same' END AS status
FROM l
UNION ALL
SELECT 'o_comment', NULL, 'string', 'added'
""",
)
def q_schema_diff(spark, sf_dir):
    """A1: schema diff — driver-side StructType walk, no Spark job.

    Right side derived in-query: drop o_orderpriority, retype o_totalprice
    to string, add o_comment.
    """
    left = load_table(spark, sf_dir, "orders")
    right = (
        left.drop("o_orderpriority")
        .withColumn("o_totalprice", F.col("o_totalprice").cast("string"))
        .withColumn("o_comment", F.lit("x"))
    )
    return D.schema_diff(left, right)


@register(
    "diff_composite_key",
    oracle="""
WITH l AS (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
           FROM lineitem),
     r AS (SELECT l_orderkey, l_linenumber,
                  CASE WHEN (l_orderkey + l_linenumber) % 41 = 0
                       THEN l_quantity + 1.0 ELSE l_quantity END AS l_quantity,
                  l_extendedprice
           FROM lineitem
           WHERE (l_orderkey + l_linenumber) % 83 <> 0)
SELECT CASE WHEN l.l_orderkey IS NULL THEN 'I'
            WHEN r.l_orderkey IS NULL THEN 'D'
            WHEN (l.l_quantity IS DISTINCT FROM r.l_quantity)
              OR (l.l_extendedprice IS DISTINCT FROM r.l_extendedprice)
            THEN 'C' ELSE 'N' END AS diff_status,
       COUNT(*) AS cnt
FROM l FULL OUTER JOIN r
  ON l.l_orderkey = r.l_orderkey AND l.l_linenumber = r.l_linenumber
GROUP BY 1
""",
)
def q_diff_composite_key(spark, sf_dir):
    """A2 with a composite key (l_orderkey, l_linenumber) — the join is on
    both key columns; mutation derived from the key sum so both engines
    build the identical right side."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    ksum = F.col("l_orderkey") + F.col("l_linenumber")
    right = li.filter(ksum % 83 != 0).withColumn(
        "l_quantity",
        F.when(ksum % 41 == 0, F.col("l_quantity") + 1.0).otherwise(
            F.col("l_quantity")
        ),
    )
    return D.diff_summary(li, right, ["l_orderkey", "l_linenumber"])


@register(
    "diff_changed_cols",
    oracle=f"""
WITH right_t AS ({MUTATED_ORDERS_SQL}),
d AS (
  SELECT CASE WHEN l.o_orderkey IS NULL THEN 'I'
              WHEN r.o_orderkey IS NULL THEN 'D'
              WHEN {_distinct_clause()}
              THEN 'C' ELSE 'N' END AS diff_status,
         COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey,
         array_to_string(list_filter([
           CASE WHEN l.o_custkey IS DISTINCT FROM r.o_custkey
                THEN 'o_custkey' END,
           CASE WHEN l.o_orderstatus IS DISTINCT FROM r.o_orderstatus
                THEN 'o_orderstatus' END,
           CASE WHEN l.o_totalprice IS DISTINCT FROM r.o_totalprice
                THEN 'o_totalprice' END,
           CASE WHEN l.o_orderdate IS DISTINCT FROM r.o_orderdate
                THEN 'o_orderdate' END,
           CASE WHEN l.o_orderpriority IS DISTINCT FROM r.o_orderpriority
                THEN 'o_orderpriority' END], x -> x IS NOT NULL), ',')
           AS chg
  FROM orders l FULL OUTER JOIN right_t r ON l.o_orderkey = r.o_orderkey)
SELECT CASE WHEN diff_status = 'C' THEN chg ELSE '' END AS changed_columns,
       COUNT(*) AS n_rows
FROM d WHERE diff_status IN ('C', 'N')
GROUP BY 1
""",
)
def q_diff_changed_cols(spark, sf_dir):
    """A2+: which columns changed, aggregated into a change fingerprint.

    `diff(with_change_cols=True)` appends the comma-joined changed-column
    names per row; grouping by it answers the first triage question of a
    migration validation ("is the drift all in one column?") without
    scanning value pairs. Same single-join plan as `diff_keyed` — the
    extra column reuses the comparison expressions already computed.
    """
    left, right = _pair(spark, sf_dir)
    d = D.diff(left, right, ["o_orderkey"], with_change_cols=True)
    return (
        d.filter(F.col("diff_status").isin("C", "N"))
        .groupBy("changed_columns")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "diff_checksum_prune",
    oracle=f"""
WITH right_t AS ({MUTATED_ORDERS_SQL}),
l AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS bucket,
         COUNT(*) AS left_rows,
         CAST(SUM(('0x' || substr(md5(
             CAST(o_orderkey AS VARCHAR) || '|' ||
             CAST(o_custkey AS VARCHAR) || '|' ||
             o_orderstatus || '|' ||
             CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS VARCHAR) || '|' ||
             o_orderpriority), 1, 8))::BIGINT) AS BIGINT) AS left_checksum
  FROM orders GROUP BY 1),
r AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS bucket,
         COUNT(*) AS right_rows,
         CAST(SUM(('0x' || substr(md5(
             CAST(o_orderkey AS VARCHAR) || '|' ||
             CAST(o_custkey AS VARCHAR) || '|' ||
             o_orderstatus || '|' ||
             CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS VARCHAR) || '|' ||
             o_orderpriority), 1, 8))::BIGINT) AS BIGINT) AS right_checksum
  FROM right_t GROUP BY 1)
SELECT COALESCE(l.bucket, r.bucket) AS bucket,
       COALESCE(left_rows, 0) AS left_rows,
       COALESCE(right_rows, 0) AS right_rows,
       left_checksum, right_checksum,
       NOT (COALESCE(left_rows, 0) = COALESCE(right_rows, 0)
            AND left_checksum IS NOT DISTINCT FROM right_checksum)
         AS needs_full_diff
FROM l FULL OUTER JOIN r ON l.bucket = r.bucket
""",
)
def q_diff_checksum_prune(spark, sf_dir):
    """A2+ at scale: phase-1 checksum pruning for incremental diffs.

    Buckets orders by month, computes order-independent additive md5
    checksums per bucket on both sides, and flags only mismatched
    buckets for the row-level diff. The 100 TB strategy: one scan per
    side + a #buckets shuffle replaces the full-table outer join when
    most partitions are unchanged — the row-level `diff()` then runs
    only on flagged months. Doubles are rendered via DECIMAL(18,4) and
    dates via a fixed format so the row representation is engine-stable.
    """
    left, right = _pair(spark, sf_dir)

    def repr_of():
        return F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.col("o_totalprice").cast("decimal(18,4)").cast("string"),
            F.col("o_orderpriority"),
        )

    return D.diff_bucket_checksums(
        left,
        right,
        bucket=F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM"),
        row_repr=repr_of(),
    )
