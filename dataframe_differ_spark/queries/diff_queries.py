"""Layer A — diff core queries (SURVEY.md §2.A) with DuckDB oracles.

Left side is always ``orders``; right side is the deterministic in-query
mutation from ``_mutation`` so Spark and DuckDB diff the identical pair.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import dataframe_differ_spark.operators.diff_core as D
from dataframe_differ_spark.queries import register
from dataframe_differ_spark.queries._mutation import (
    MUTATED_ORDERS_B_SQL,
    MUTATED_ORDERS_SQL,
    NONKEY_COLS,
    ORDERS_COLS,
    mutated_orders,
    mutated_orders_b,
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


# ---------------------------------------------------------------------------
# Three-way diff (merge classification)
# ---------------------------------------------------------------------------


def _3w_eq_sql(a: str, b: str) -> str:
    return " AND ".join(
        f"({a}.{c} IS NOT DISTINCT FROM {b}.{c})" for c in NONKEY_COLS
    )


_THREEWAY_SQL = f"""
WITH ours AS ({MUTATED_ORDERS_SQL}),
theirs AS ({MUTATED_ORDERS_B_SQL}),
j AS (
  SELECT COALESCE(b.o_orderkey, o.o_orderkey, t.o_orderkey) AS k,
         b.o_orderkey IS NOT NULL AS in_b,
         o.o_orderkey IS NOT NULL AS in_o,
         t.o_orderkey IS NOT NULL AS in_t,
         {_3w_eq_sql('o', 'b')} AS ob,
         {_3w_eq_sql('t', 'b')} AS tb,
         {_3w_eq_sql('o', 't')} AS ot
  FROM orders b
  FULL OUTER JOIN ours o ON b.o_orderkey = o.o_orderkey
  FULL OUTER JOIN theirs t
    ON COALESCE(b.o_orderkey, o.o_orderkey) = t.o_orderkey),
st AS (
  SELECT k,
    CASE
      WHEN in_b AND in_o AND in_t AND ob AND tb THEN 'unchanged'
      WHEN in_b AND in_o AND in_t AND NOT ob AND tb THEN 'take_ours'
      WHEN in_b AND in_o AND in_t AND ob AND NOT tb THEN 'take_theirs'
      WHEN in_b AND in_o AND in_t AND ot THEN 'convergent'
      WHEN in_b AND in_o AND in_t THEN 'conflict_edit'
      WHEN in_b AND NOT in_o AND in_t AND tb THEN 'deleted_ours'
      WHEN in_b AND NOT in_o AND in_t THEN 'conflict_delete_edit'
      WHEN in_b AND in_o AND NOT in_t AND ob THEN 'deleted_theirs'
      WHEN in_b AND in_o AND NOT in_t THEN 'conflict_edit_delete'
      WHEN in_b THEN 'deleted_both'
      WHEN in_o AND NOT in_t THEN 'added_ours'
      WHEN in_t AND NOT in_o THEN 'added_theirs'
      WHEN ot THEN 'added_both_same'
      ELSE 'added_both_conflict'
    END AS status
  FROM j)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_keys,
       MIN(k) AS min_key, MAX(k) AS max_key,
       starts_with(status, 'conflict') OR status = 'added_both_conflict'
         AS needs_resolution
FROM st GROUP BY status
"""


@register("diff_threeway", oracle=_THREEWAY_SQL)
def q_diff_threeway(spark, sf_dir):
    """A2+ three-way diff: classify every key for a base/ours/theirs merge.

    The migration-validation question two-way diff can't answer: given a
    common ancestor and two independently-evolved snapshots, which rows
    merge cleanly (one side changed, or both made the identical change)
    and which need human resolution (both edited differently, or one
    edited what the other deleted)? Both branches derive deterministically
    from `orders` (`_mutation.mutated_orders` / `mutated_orders_b`;
    coprime moduli make keys divisible by 53*59 = 3127 genuine
    conflicting edits). Two full outer joins on the key + null-safe
    column comparisons — the keyed-diff plan doubled, shuffle on a
    unique key, scan-bound at 100 TB; the summary rollup is a dozen
    rows. Git-style status taxonomy: take_ours/take_theirs, convergent,
    conflict_edit, delete-vs-edit conflicts, one/both-sided adds.
    """
    base = load_table(spark, sf_dir, "orders").select(*ORDERS_COLS)
    ours = mutated_orders(base)
    theirs = mutated_orders_b(base)

    def tag(df, t):
        sel = [F.col("o_orderkey")] + [
            F.col(c).alias(f"{t}_{c}") for c in NONKEY_COLS
        ]
        return df.select(*sel).withColumn(f"in_{t}", F.lit(True))

    j = (
        tag(base, "b")
        .join(tag(ours, "o"), ["o_orderkey"], "full")
        .join(tag(theirs, "t"), ["o_orderkey"], "full")
    )

    def eq(a, b):
        cond = F.lit(True)
        for c in NONKEY_COLS:
            cond = cond & F.col(f"{a}_{c}").eqNullSafe(F.col(f"{b}_{c}"))
        return cond

    in_b = F.coalesce(F.col("in_b"), F.lit(False))
    in_o = F.coalesce(F.col("in_o"), F.lit(False))
    in_t = F.coalesce(F.col("in_t"), F.lit(False))
    ob, tb, ot = eq("o", "b"), eq("t", "b"), eq("o", "t")
    status = (
        F.when(in_b & in_o & in_t & ob & tb, "unchanged")
        .when(in_b & in_o & in_t & ~ob & tb, "take_ours")
        .when(in_b & in_o & in_t & ob & ~tb, "take_theirs")
        .when(in_b & in_o & in_t & ot, "convergent")
        .when(in_b & in_o & in_t, "conflict_edit")
        .when(in_b & ~in_o & in_t & tb, "deleted_ours")
        .when(in_b & ~in_o & in_t, "conflict_delete_edit")
        .when(in_b & in_o & ~in_t & ob, "deleted_theirs")
        .when(in_b & in_o & ~in_t, "conflict_edit_delete")
        .when(in_b, "deleted_both")
        .when(in_o & ~in_t, "added_ours")
        .when(in_t & ~in_o, "added_theirs")
        .when(ot, "added_both_same")
        .otherwise("added_both_conflict")
    )
    st = j.select(F.col("o_orderkey").alias("k"), status.alias("status"))
    return (
        st.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
        )
        .withColumn(
            "needs_resolution",
            F.col("status").startswith("conflict")
            | (F.col("status") == "added_both_conflict"),
        )
    )
