"""Diff core — the reference's own capability surface (SURVEY.md §2.A).

Semantics reconstructed from the public dataframe-diff tool family
(menorah84/dataframe_differ; cf. capitalone/datacompy and the
G-Research spark-extension ``diff`` convention). The reference checkout is
empty (SURVEY.md §0), so the binding contract here is SURVEY.md §1.3:

Output schema of a keyed diff::

    diff_status: string in {'N','C','I','D'}   # N=no-change C=changed
                                               # I=insert(right-only)
                                               # D=delete(left-only)
    <key columns...>                           # coalesced left/right
    <col>_left, <col>_right                    # for every compared column

Scale design (100 TB): one null-safe full-outer shuffle join on the key
columns is the whole cost; every comparison is a Catalyst expression
(whole-stage-codegen'd, no Python). Summaries are map-side-combinable
aggregations. Nothing collects row-level data to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATUS_COL = "diff_status"
INSERT, DELETE, CHANGE, NOCHANGE = "I", "D", "C", "N"


def _compared_columns(
    left: DataFrame, right: DataFrame, keys: Sequence[str]
) -> list[str]:
    """Non-key columns present on BOTH sides, in left's column order."""
    rcols = set(right.columns)
    return [c for c in left.columns if c not in set(keys) and c in rcols]


def _neq(lc: Column, rc: Column, atol: float = 0.0, rtol: float = 0.0,
         dtype: T.DataType | None = None) -> Column:
    """Null-safe "values differ" predicate; optionally tolerant for numerics.

    Tolerant comparison (SURVEY.md §2.A6): equal iff
    ``abs(l - r) <= atol + rtol * abs(r)``; null==null; exact elsewhere.
    """
    if (atol or rtol) and isinstance(dtype, T.NumericType):
        both_null = lc.isNull() & rc.isNull()
        within = F.abs(lc - rc) <= (F.lit(atol) + F.lit(rtol) * F.abs(rc))
        eq = both_null | (lc.isNotNull() & rc.isNotNull() & within)
        return ~eq
    return ~lc.eqNullSafe(rc)


def diff(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    *,
    atol: float = 0.0,
    rtol: float = 0.0,
    columns: Sequence[str] | None = None,
    align_types: bool = False,
    with_change_cols: bool = False,
    column_mapping: dict[str, str] | None = None,
) -> DataFrame:
    """Keyed row diff (SURVEY.md §2.A2/§2.A6).

    One null-safe full-outer equi-join on ``keys``; per-column comparison as
    codegen'd expressions. ``atol``/``rtol`` make numeric columns tolerant.
    ``align_types=True`` casts right-side compared columns to the left
    side's type first (the int→bigint / float→double migration case);
    without it, mismatched types surface as Catalyst analysis errors.
    ``column_mapping`` maps left column name → right column name for
    inputs whose schemas drifted apart in naming (the migration-validation
    case); right columns are renamed to left names before comparison, so
    it is a plan-time rename with zero runtime cost. ``keys`` are always
    given in left-side names.
    ``with_change_cols=True`` appends a ``changed_columns`` column — the
    comma-joined names (left column order) of the columns that differ on
    'C' rows, empty string otherwise — the drill-down a reviewer reads
    before the per-column values (same expressions as the status, so the
    extra column costs nothing at scale).
    """
    keys = list(keys)
    if not keys:
        raise ValueError("diff() requires at least one key column; "
                         "use diff_unkeyed() for keyless multiset diffs")
    if column_mapping:
        missing = [r for r in column_mapping.values() if r not in right.columns]
        if missing:
            raise ValueError(
                f"column_mapping right-side column(s) {missing} not in right "
                f"DataFrame (columns: {right.columns})"
            )
        right = right.withColumnsRenamed(
            {rname: lname for lname, rname in column_mapping.items()}
        )
    for side, df in (("left", left), ("right", right)):
        missing = [k for k in keys if k not in df.columns]
        if missing:
            raise ValueError(
                f"key column(s) {missing} not in {side} DataFrame "
                f"(columns: {df.columns})"
            )
    cols = list(columns) if columns is not None else _compared_columns(left, right, keys)
    if columns is not None:
        for side, df in (("left", left), ("right", right)):
            missing = [c for c in cols if c not in df.columns]
            if missing:
                raise ValueError(
                    f"compared column(s) {missing} not in {side} DataFrame"
                )
    schema = {f.name: f.dataType for f in left.schema.fields}
    if align_types:
        rtypes = {f.name: f.dataType for f in right.schema.fields}
        for c in cols:
            if c in rtypes and rtypes[c] != schema[c]:
                right = right.withColumn(c, F.col(c).cast(schema[c]))

    # Presence markers survive the outer join even when key columns are null
    # (eqNullSafe matches null==null keys, so key-nullness is not a valid
    # side-presence test).
    l = left.withColumn("__p_l", F.lit(True)).alias("l")
    r = right.withColumn("__p_r", F.lit(True)).alias("r")
    # eqNullSafe keeps semantics correct when key columns contain nulls;
    # Catalyst still plans a hash-partitioned SMJ/SHJ on the keys.
    cond = None
    for k in keys:
        c = F.col(f"l.{k}").eqNullSafe(F.col(f"r.{k}"))
        cond = c if cond is None else (cond & c)
    joined = l.join(r, on=cond, how="full_outer")

    l_present = F.col("l.__p_l").isNotNull()
    r_present = F.col("r.__p_r").isNotNull()

    any_change = F.lit(False)
    for c in cols:
        any_change = any_change | _neq(
            F.col(f"l.{c}"), F.col(f"r.{c}"), atol, rtol, schema.get(c)
        )

    status = (
        F.when(~l_present, F.lit(INSERT))
        .when(~r_present, F.lit(DELETE))
        .when(any_change, F.lit(CHANGE))
        .otherwise(F.lit(NOCHANGE))
    )

    out = [status.alias(STATUS_COL)]
    out += [F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k) for k in keys]
    for c in cols:
        out.append(F.col(f"l.{c}").alias(f"{c}_left"))
        out.append(F.col(f"r.{c}").alias(f"{c}_right"))
    if with_change_cols:
        name_or_null = [
            F.when(
                _neq(F.col(f"l.{c}"), F.col(f"r.{c}"), atol, rtol, schema.get(c)),
                F.lit(c),
            )
            for c in cols
        ]
        changed = F.when(
            status == CHANGE,
            F.array_join(F.array_compact(F.array(*name_or_null)), ","),
        ).otherwise(F.lit(""))
        out.append(changed.alias("changed_columns"))
    return joined.select(*out)


def diff_summary(
    left: DataFrame, right: DataFrame, keys: Sequence[str], **kw
) -> DataFrame:
    """Counts per diff status (SURVEY.md §2.A4). Map-side combinable."""
    d = diff(left, right, keys, **kw)
    return d.groupBy(STATUS_COL).agg(F.count(F.lit(1)).alias("cnt"))


def schema_diff(left: DataFrame, right: DataFrame) -> DataFrame:
    """Schema diff (SURVEY.md §2.A1): driver-side StructType walk, no job.

    Result: one row per column that exists on either side, with its type on
    each side and a status in {added, removed, type_changed, same}.
    """
    spark = left.sparkSession
    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    rows = []
    seen = []
    for c in left.columns:
        seen.append(c)
        if c not in rtypes:
            rows.append((c, ltypes[c], None, "removed"))
        elif ltypes[c] != rtypes[c]:
            rows.append((c, ltypes[c], rtypes[c], "type_changed"))
        else:
            rows.append((c, ltypes[c], rtypes[c], "same"))
    for c in right.columns:
        if c not in ltypes:
            rows.append((c, None, rtypes[c], "added"))
    schema = T.StructType(
        [
            T.StructField("column_name", T.StringType()),
            T.StructField("left_type", T.StringType()),
            T.StructField("right_type", T.StringType()),
            T.StructField("status", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def diff_unkeyed(left: DataFrame, right: DataFrame) -> DataFrame:
    """Unkeyed multiset diff (SURVEY.md §2.A3).

    Bag semantics: report rows whose multiplicities differ between the
    sides, with ``left_count``/``right_count``. Plan: tag each side,
    union, and count both sides in a SINGLE aggregate —
    ``groupBy(all cols).agg(count_if(side), count_if(!side))``. One
    shuffle total (union is plan-level, free) versus the naive
    two-aggregates + null-safe full-outer join, and groupBy's null
    handling gives IS NOT DISTINCT FROM semantics for free. At 100 TB
    this halves shuffle volume and removes the join entirely; map-side
    partial counts collapse duplicate-heavy partitions before the wire.
    """
    cols = [c for c in left.columns if c in set(right.columns)]
    tagged = (
        left.select(*cols)
        .withColumn("__side", F.lit(True))
        .unionAll(right.select(*cols).withColumn("__side", F.lit(False)))
    )
    return (
        tagged.groupBy(*cols)
        .agg(
            F.count_if(F.col("__side")).alias("left_count"),
            F.count_if(~F.col("__side")).alias("right_count"),
        )
        .filter(F.col("left_count") != F.col("right_count"))
    )


def column_mismatch_stats(
    left: DataFrame, right: DataFrame, keys: Sequence[str], **kw
) -> DataFrame:
    """Per-column mismatch stats among matched keys (SURVEY.md §2.A5).

    For every compared column: number of matched rows where values are
    equal, differ, or exactly one side is null. Implemented as one
    conditional aggregation over the diff (no per-column jobs), unpivoted
    via ``stack`` so the result is long-form: (column_name, n_equal,
    n_different, n_null_mismatch).
    """
    keys = list(keys)
    cols = _compared_columns(left, right, keys)
    d = diff(left, right, keys, **kw).filter(F.col(STATUS_COL).isin(CHANGE, NOCHANGE))
    aggs = []
    for c in cols:
        lc, rc = F.col(f"{c}_left"), F.col(f"{c}_right")
        aggs.append(F.sum(lc.eqNullSafe(rc).cast("long")).alias(f"eq_{c}"))
        aggs.append(F.sum((~lc.eqNullSafe(rc)).cast("long")).alias(f"ne_{c}"))
        aggs.append(
            F.sum((lc.isNull() != rc.isNull()).cast("long")).alias(f"nm_{c}")
        )
    wide = d.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', eq_{c}, ne_{c}, nm_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) as "
        "(column_name, n_equal, n_different, n_null_mismatch)"
    )


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Keys violating uniqueness (SURVEY.md §2.A7) — diff precondition."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def changed_sample(
    left: DataFrame, right: DataFrame, keys: Sequence[str], n: int = 20, **kw
) -> DataFrame:
    """Deterministic sample of changed rows (SURVEY.md §2.A8).

    orderBy(keys).limit(n) compiles to TakeOrderedAndProject — per-partition
    top-n then a single driver merge; no global sort materialization.
    """
    d = diff(left, right, keys, **kw)
    return d.filter(F.col(STATUS_COL) == CHANGE).orderBy(*keys).limit(n)


def report(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    *,
    atol: float = 0.0,
    rtol: float = 0.0,
    sample_n: int = 5,
) -> str:
    """Human-readable diff report (the reference family's `report()` UX).

    Aggregates only — the row-level diff stays distributed; what crosses to
    the driver is a handful of summary rows plus `sample_n` changed keys.
    """
    keys = list(keys)
    sd = schema_diff(left, right).collect()
    summary = {
        r[STATUS_COL]: r["cnt"]
        for r in diff_summary(left, right, keys, atol=atol, rtol=rtol).collect()
    }
    mismatches = column_mismatch_stats(left, right, keys, atol=atol, rtol=rtol)
    mm_rows = mismatches.filter(F.col("n_different") > 0).collect()
    sample = changed_sample(left, right, keys, n=sample_n, atol=atol, rtol=rtol)
    sample_keys = [tuple(r[k] for k in keys) for r in sample.collect()]

    lines = ["DataFrame diff report", "=" * 21, ""]
    lines.append(f"Key columns: {', '.join(keys)}")
    if atol or rtol:
        lines.append(f"Numeric tolerance: atol={atol}, rtol={rtol}")
    lines.append("")
    lines.append("Schema changes:")
    changed_schema = [r for r in sd if r["status"] != "same"]
    if changed_schema:
        for r in changed_schema:
            lines.append(
                f"  {r['column_name']}: {r['status']}"
                f" ({r['left_type']} -> {r['right_type']})"
            )
    else:
        lines.append("  none")
    lines.append("")
    lines.append("Row status counts:")
    for st, label in (("N", "unchanged"), ("C", "changed"),
                      ("D", "only in left"), ("I", "only in right")):
        lines.append(f"  {label:14s} {summary.get(st, 0)}")
    lines.append("")
    lines.append("Columns with differences (among matched keys):")
    if mm_rows:
        for r in sorted(mm_rows, key=lambda r: -r["n_different"]):
            lines.append(
                f"  {r['column_name']}: {r['n_different']} differ"
                f" ({r['n_null_mismatch']} null-mismatch)"
            )
    else:
        lines.append("  none")
    if sample_keys:
        lines.append("")
        lines.append(f"Sample changed keys (first {sample_n}): {sample_keys}")
    return "\n".join(lines)


def diff_bucket_checksums(
    left: DataFrame,
    right: DataFrame,
    bucket: Column,
    row_repr: Column,
) -> DataFrame:
    """Partition-pruned diff, phase 1: per-bucket row counts + additive
    checksums for both sides, full-outer joined on the bucket.

    `row_repr` must be a deterministic, engine-stable string rendering of
    the compared row (caller casts doubles to decimals / formats dates).
    The checksum is the per-bucket SUM of each row's 32-bit md5 prefix —
    order-independent, mergeable, and computed map-side, so phase 1 costs
    one scan of each side plus a #buckets-sized shuffle. Buckets with
    `needs_full_diff = false` are PROVEN cheap to skip (counts and sums
    both match); only flagged buckets proceed to the row-level `diff()`.
    At 100 TB with date-bucketed tables this turns an incremental diff
    into a scan + a diff of only the changed days.
    """

    def side(df: DataFrame, prefix: str) -> DataFrame:
        h = F.conv(F.substring(F.md5(row_repr), 1, 8), 16, 10).cast("bigint")
        return df.groupBy(bucket.alias("bucket")).agg(
            F.count(F.lit(1)).alias(f"{prefix}_rows"),
            F.sum(h).alias(f"{prefix}_checksum"),
        )

    l = side(left, "left")
    r = side(right, "right")
    j = l.join(r, "bucket", "full_outer")
    return j.select(
        "bucket",
        F.coalesce("left_rows", F.lit(0)).alias("left_rows"),
        F.coalesce("right_rows", F.lit(0)).alias("right_rows"),
        "left_checksum",
        "right_checksum",
        (
            ~(
                F.col("left_rows").eqNullSafe(F.col("right_rows"))
                & F.col("left_checksum").eqNullSafe(F.col("right_checksum"))
            )
        ).alias("needs_full_diff"),
    )
