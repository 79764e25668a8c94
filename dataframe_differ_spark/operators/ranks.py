"""Distributed total-order ranking without a single-partition window.

``Window.orderBy(...)`` with no partition key is Spark's one unavoidable
scale cliff: every row moves to a single task. This module provides the
standard two-phase alternative — the "approx-boundary bucket + per-bucket
rank + tiny offset merge" plan — as a reusable operator, so exact global
``row_number`` / ``ntile`` / running-sum semantics survive a 100× scale-up:

1. **Boundaries** (one scan, mergeable sketch): ``percentile_approx`` on a
   numeric proxy of the leading sort key yields ``B - 1`` cut points.
2. **Bucket lookup** (map-side): each row's bucket is the count of
   boundaries strictly below (asc) / above (desc) its key — a broadcast of
   one tiny array row, no shuffle.
3. **Per-bucket rank** (one hash shuffle on the bucket id): ``row_number``
   (and optional running sums) within each bucket under the FULL total
   order — a partitioned window, ~n/B rows per task.
4. **Offset merge** (tiny): per-bucket counts/sums join each bucket with
   the sum of all LOWER buckets (a broadcast triangle join over ≤ B rows —
   no window at all), then ``global = offset + local``.

The result is EXACT — identical to the single-partition window — for any
``order_cols`` that form a total order (include a unique tiebreaker), for
any boundary quality: boundaries only steer data placement, never the
ranking. Skewed or duplicate boundaries degrade balance, not correctness.
At 100 TB, size ``n_buckets`` so n/B rows fit one task (the sketch pass is
scan-bound; the bucket shuffle is the same data a sort would move once).

Caller contract: ``bucket_key`` must be a non-null numeric-castable column
MONOTONE in the leading ``order_cols`` entry (e.g. ``unix_date`` of a date
key, ``cast("double")`` of a decimal); input columns must not start with
``_rk_``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Default bucket count. Test scale factors have 1e4–1e6 rows, so 32
#: buckets keeps per-task slices comfortable; at 100 TB you would raise
#: this to ~input_bytes / target_task_bytes (boundaries stay one sketch).
DEFAULT_BUCKETS = 32


def partitioned_topk(
    df: DataFrame,
    partition_cols: Sequence[Column | str],
    order_cols: Sequence[Column | str],
    k: int,
    *,
    rank_col: str | None = None,
) -> DataFrame:
    """Two-phase per-group top-k: per-input-partition prune, then global.

    With few groups (e.g. 5 ANN queries) a single ``row_number`` window
    key is maximally skewed — k reducers would sort the whole corpus.
    Phase 1 ranks within (group, spark_partition_id) and keeps ≤ k rows
    per slice, so the final per-group exchange+sort sees ≤ k·partitions
    rows. Identical result (top-k of per-partition top-ks == global
    top-k, given a total order). ``rank_col`` optionally keeps the global
    1-based rank as a column; internals are dropped either way.
    """
    wl = Window.partitionBy(*partition_cols, "_tk_pid").orderBy(*order_cols)
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    rc = rank_col or "_tk_rank"
    out = (
        df.withColumn("_tk_pid", F.spark_partition_id())
        .withColumn("_tk_lrank", F.row_number().over(wl))
        .filter(F.col("_tk_lrank") <= k)
        .withColumn(rc, F.row_number().over(w))
        .filter(F.col(rc) <= k)
        .drop("_tk_pid", "_tk_lrank")
    )
    return out if rank_col else out.drop(rc)


def ranked(
    df: DataFrame,
    bucket_key: Column,
    order_cols: Sequence[Column | str],
    *,
    ascending: bool = True,
    n_buckets: int = DEFAULT_BUCKETS,
    rank_col: str = "rk",
    n_col: str | None = None,
    running_sum: Column | None = None,
    running_col: str = "running",
    running_total_col: str | None = None,
    running_sums: Sequence[tuple[Column, str, str | None]] | None = None,
) -> DataFrame:
    """Attach an exact 1-based global ``row_number`` over ``order_cols``.

    ``ascending`` describes the LEADING sort key's direction (used only to
    orient the bucket comparison); ``order_cols`` themselves carry the
    authoritative per-column directions for the in-bucket window.

    Optional outputs: ``n_col`` (total row count), ``running_col``
    (inclusive running sum of ``running_sum`` in rank order) and
    ``running_total_col`` (its grand total) — all computed from the same
    tiny per-bucket stats frame, no extra pass over the data.

    ``running_sums`` (round 7) generalizes to ANY number of running sums
    in one pass: a sequence of ``(sum_expr, out_col, total_col_or_None)``
    triples, each carried through the same per-bucket stats frame — so a
    caller needing two cumulative counts (e.g. the two-cohort KS ECDF)
    no longer has to pack them into one integer with a base encoding
    (and inherit its overflow cliff). May be combined with the single
    ``running_sum`` sugar; column costs are one extra value per bucket
    row each — free.
    """
    for c in df.columns:
        if c.startswith("_rk_"):
            raise ValueError(f"input column {c!r} collides with _rk_ internals")
    sums: list[tuple[Column, str, str | None]] = []
    if running_sum is not None:
        sums.append((running_sum, running_col, running_total_col))
    if running_sums:
        sums.extend(running_sums)

    key_d = bucket_key.cast("double")
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    # Accuracy 1000 is plenty: boundaries only steer data placement, never
    # the ranking, so sketch error costs balance, not correctness. The
    # lazy checkpoint stops the 1-row boundary aggregate (and its scan)
    # from re-running in every downstream branch (stats, window).
    bnds = df.agg(
        F.percentile_approx(key_d, fracs, 1_000).alias("_rk_bnds")
    ).localCheckpoint(eager=False)
    if ascending:
        bkt = F.size(F.filter(F.col("_rk_bnds"), lambda x: key_d > x))
    else:
        bkt = F.size(F.filter(F.col("_rk_bnds"), lambda x: key_d < x))
    bucketed = (
        df.join(F.broadcast(bnds), how="cross")
        .withColumn("_rk_bkt", bkt)
        .drop("_rk_bnds")
    )

    # Per-bucket stats: map-side partial aggregation, B rows shuffled.
    aggs = [F.count(F.lit(1)).cast("long").alias("_rk_cnt")]
    for i, (expr, _, _) in enumerate(sums):
        aggs.append(F.sum(expr).alias(f"_rk_bsum{i}"))
    # ≤ B rows; lazily checkpointed so the offsets triangle join and the
    # totals aggregate don't each re-scan the input to rebuild it.
    stats = bucketed.groupBy("_rk_bkt").agg(*aggs).localCheckpoint(eager=False)

    # Exclusive prefix over buckets WITHOUT a window: broadcast triangle
    # join over the ≤ n_buckets stats rows (lower-bucket sums per bucket).
    lower_cols = [
        F.col("_rk_bkt").alias("_rk_bkt_b"),
        F.col("_rk_cnt").alias("_rk_cnt_b"),
    ]
    for i in range(len(sums)):
        lower_cols.append(F.col(f"_rk_bsum{i}").alias(f"_rk_bsum{i}_b"))
    lower = stats.select(*lower_cols)
    off_aggs = [
        F.coalesce(F.sum("_rk_cnt_b"), F.lit(0)).cast("long").alias("_rk_off")
    ]
    for i in range(len(sums)):
        off_aggs.append(
            F.coalesce(F.sum(f"_rk_bsum{i}_b"), F.lit(0)).alias(f"_rk_runoff{i}")
        )
    offs = (
        stats.join(
            F.broadcast(lower),
            F.col("_rk_bkt_b") < F.col("_rk_bkt"),
            "left",
        )
        .groupBy("_rk_bkt")
        .agg(*off_aggs)
    )

    tot_aggs = [F.sum("_rk_cnt").cast("long").alias("_rk_n")]
    for i in range(len(sums)):
        tot_aggs.append(F.sum(f"_rk_bsum{i}").alias(f"_rk_runtot{i}"))
    tots = stats.agg(*tot_aggs)

    # Per-bucket window: the ONLY full-data shuffle, partitioned by bucket.
    wloc = Window.partitionBy("_rk_bkt").orderBy(*order_cols)
    loc = bucketed.withColumn("_rk_loc", F.row_number().over(wloc))
    for i, (expr, _, _) in enumerate(sums):
        loc = loc.withColumn(
            f"_rk_lrun{i}",
            F.sum(expr).over(
                wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )

    out = (
        loc.join(F.broadcast(offs), "_rk_bkt")
        .join(F.broadcast(tots), how="cross")
        .withColumn(rank_col, (F.col("_rk_off") + F.col("_rk_loc")).cast("long"))
    )
    if n_col is not None:
        out = out.withColumn(n_col, F.col("_rk_n"))
    drop = ["_rk_bkt", "_rk_loc", "_rk_off", "_rk_n"]
    for i, (_, out_col, total_col) in enumerate(sums):
        out = out.withColumn(
            out_col, F.col(f"_rk_runoff{i}") + F.col(f"_rk_lrun{i}")
        )
        if total_col is not None:
            out = out.withColumn(total_col, F.col(f"_rk_runtot{i}"))
        drop += [f"_rk_lrun{i}", f"_rk_runoff{i}", f"_rk_runtot{i}", f"_rk_bsum{i}"]
    return out.drop(*drop)


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL ``NTILE(k)`` bucket from an exact 1-based global rank + total n.

    Replicates engine NTILE semantics exactly: the first ``n mod k``
    buckets hold ``ceil(n / k)`` rows, the rest ``floor(n / k)`` — so a
    distributed rank plus this formula is value-identical to
    ``ntile(k) OVER (ORDER BY ...)`` (exact for n below 2^53; the doubles
    in the divisions are integral until then).
    """
    q = F.floor(n / k).cast("long")
    rem = (n % k).cast("long")
    size_big = q + 1
    cut = size_big * rem
    return (
        F.when(rank <= cut, F.floor((rank - 1) / size_big) + 1)
        .otherwise(
            rem + F.floor((rank - cut - 1) / F.greatest(q, F.lit(1))) + 1
        )
        .cast("int")
    )


def string_bucket_key(col: Column) -> Column:
    """Monotone numeric proxy of a STRING sort key for ``bucket_key``.

    First 8 bytes of the UTF-8 encoding, zero-padded then parsed as a
    big-endian unsigned integer: Spark compares strings bytewise
    (UTF8String.compareTo), and zero-padding keeps proper prefixes below
    their extensions, so the integer is (non-strictly) monotone in the
    string order — strings equal in their first 8 bytes share a bucket
    and the in-bucket window resolves them. Internal-only (buckets never
    reach the output), so no cross-engine parity constraint applies.
    """
    return F.conv(
        F.hex(F.expr(f"rpad(CAST(({col._jc.toString()}) AS BINARY), 8, X'00')")),
        16,
        10,
    ).cast("double")
