"""Parametric training-data-pipeline operators.

Round-5 extraction, second wave: the pipeline-assembly measures a training
run needs — deterministic splits, sequence packing, benchmark
decontamination — as schema-agnostic functions over any DataFrame (the
diff_core / dedup / similarity pattern; registry queries are thin
bindings whose DuckDB oracles pin the semantics).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dataframe_differ_spark.operators.dedup import shingles

__all__ = ["hash_split", "pack_sequences", "decontaminate"]


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: Sequence[tuple[str, int]] = (("train", 13), ("val", 2), ("test", 1)),
    *,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic hash split: appends ``out_col`` ∈ split names.

    Buckets rows by the first hex char of md5(id) (16 equal slices) and
    assigns them to splits by cumulative sixteenths — e.g. the default
    (13, 2, 1) is train 13/16, val 2/16, test 1/16. The reproducible
    alternative to randomSplit: identical membership on every run, every
    engine, any partitioning — essential when the split must survive
    re-ingestion at 100 TB. Pure per-row expression, no shuffle.
    ``splits`` weights must sum to 16.
    """
    weights = [w for _, w in splits]
    if sum(weights) != 16 or any(w <= 0 for w in weights):
        raise ValueError(f"split weights must be positive and sum to 16: {splits}")
    bucket = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 1), 16, 10
    ).cast("int")
    expr: Column | None = None
    lo = 0
    for name, w in splits:
        hi = lo + w
        cond = (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return df.withColumn(out_col, expr)


def pack_sequences(
    df: DataFrame,
    size_col: str,
    budget: int,
    *,
    partition_cols: Sequence[str] = (),
    order_cols: Sequence[str],
    pack_col: str = "pack_id",
) -> DataFrame:
    """Assign rows to ~``budget``-token packs by running size, appending
    ``pack_col`` = floor(start_offset / budget) within each partition.

    Pure window arithmetic → packing is deterministic and
    engine-independent (unlike greedy bin packing, which is order- and
    state-dependent). Parallelism is #partitions wide and no global sort
    exists; at 100 TB sub-salt the partition key (e.g. by date) to widen.
    ``order_cols`` must totally order rows within a partition.
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        pack_col,
        F.floor((F.sum(size_col).over(w) - F.col(size_col)) / F.lit(float(budget))),
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 3,
    bench_id_col: str | None = None,
) -> DataFrame:
    """Benchmark-contamination report: for every training row, the number
    of benchmark rows it shares an ``shingle_n``-gram with and how many
    distinct shingles leak — ``(id_col, n_bench_docs, n_shared_shingles)``.

    The benchmark shingle set is small in practice, so it broadcasts and
    the training side never shuffles for the probe — the scan, shingling
    and lookup pipeline; the only shuffle is the final per-doc distinct
    count. Filter ``n_shared_shingles`` at your leak threshold and
    anti-join to drop contaminated rows.
    """
    bid = bench_id_col or id_col
    t = train.select(
        id_col, F.explode(shingles(text_col, shingle_n)).alias("_pl_sh")
    )
    b = bench.select(
        F.col(bid).alias("_pl_bench_doc"),
        F.explode(shingles(text_col, shingle_n)).alias("_pl_sh"),
    )
    return (
        t.join(F.broadcast(b), "_pl_sh")
        .groupBy(id_col)
        .agg(
            F.countDistinct("_pl_bench_doc").alias("n_bench_docs"),
            F.countDistinct("_pl_sh").alias("n_shared_shingles"),
        )
    )
