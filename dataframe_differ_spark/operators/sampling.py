"""Parametric deterministic-sampling operators over arbitrary DataFrames.

Round-6 extraction (continuing the dedup/similarity/graph/stats/
timeseries/evalmetrics/sketches pattern): the sampling family —
previously fixture-bound ``queries()`` closures (queries/relational.py,
queries/pipelineops.py, queries/statsops.py) — as a reusable library for
training-data curation:

    from dataframe_differ_spark.operators.sampling import weighted_sample
    picks = weighted_sample(docs, key_col="doc_id", weight_col="quality", k=10_000)

Design rules shared by every operator here:

- **Deterministic, engine-stable membership**: every sampler draws its
  randomness from md5 of the row KEY — identical samples on every run,
  every engine, any partitioning (rng TABLESAMPLE gives none of those),
  and re-running on a grown table keeps previously chosen rows stable.
  Essential when a sample must survive re-ingestion at 100 TB.
- **Schema-agnostic**: column names are parameters; internals use
  ``_sa_`` prefixed temporaries and refuse colliding inputs; samplers
  return the input columns (plus documented extras).
- **Scan-shaped plans**: rate filters pipeline with the parquet scan (no
  shuffle, no collect); top-k samplers plan as TakeOrderedAndProject
  (per-partition top-k, k·partitions merge); per-stratum heads use a
  window PARTITIONED on the stratum key — never a global window.

The registered queries (``sample_hash``, ``sample_stratified``,
``sample_weighted``, ``sample_balanced_classes``,
``sample_neyman_allocation``) are thin fixture bindings over these
functions; their DuckDB oracles and the golden corpus pin the semantics.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_sample",
    "systematic_sample",
    "stratified_sample",
    "weighted_sample",
    "balanced_sample",
    "neyman_sample",
]


def _check_reserved(df: DataFrame, prefix: str = "_sa_") -> None:
    for c in df.columns:
        if c.startswith(prefix):
            raise ValueError(f"input column {c!r} collides with {prefix} internals")


def _hex_bucket(key_col: str) -> Column:
    """First hex digit of md5(key) as the 16-slice bucket — the shared
    randomness source (same device as ``pipeline.hash_split``)."""
    return F.substring(F.md5(F.col(key_col).cast("string")), 1, 1)


# threshold character for "keep buckets < s sixteenths": hex digits are
# single chars, so s=16 needs a char ABOVE 'f' ('g'), not the two-char
# string "10" (which string-compares BELOW '2').
_HEX_CAP = "0123456789abcdefg"


def hash_sample(df: DataFrame, key_col: str, *, sixteenths: int = 1) -> DataFrame:
    """Deterministic ~``sixteenths``/16 sample: keep rows whose md5 bucket
    falls below the threshold. A pure scan predicate — pipelines with the
    parquet read, no shuffle, valid at any scale."""
    _check_reserved(df)
    if not 1 <= sixteenths <= 16:
        raise ValueError("sixteenths must be in 1..16")
    return df.filter(_hex_bucket(key_col) < _HEX_CAP[sixteenths])


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: Mapping[object, int],
    *,
    default_sixteenths: int = 16,
) -> DataFrame:
    """Per-stratum deterministic rates (in sixteenths): downsample
    over-represented strata reproducibly — the training-data curation
    move. ``rates`` maps stratum values to kept sixteenths (8 → 50%);
    unlisted strata keep ``default_sixteenths``/16. Still one scan
    predicate, no shuffle."""
    _check_reserved(df)
    for v in [*rates.values(), default_sixteenths]:
        if not 1 <= v <= 16:
            raise ValueError("rates must be in 1..16 sixteenths")
    cap: Column = F.lit(_HEX_CAP[default_sixteenths])
    for value, sx in rates.items():
        cap = F.when(F.col(stratum_col) == value, F.lit(_HEX_CAP[sx])).otherwise(cap)
    return df.filter(_hex_bucket(key_col) < cap)


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, k: int
) -> DataFrame:
    """Deterministic weighted sampling without replacement → the top-``k``
    rows by Efraimidis–Spirakis priority, input columns + ``score``.

    Efraimidis–Spirakis (2006) derandomized: each row's uniform draw is
    60 bits of md5(key) mapped to u ∈ (0, 1], and its key is the
    exponential draw E = −ln(u)/weight with the k SMALLEST kept —
    equivalent to keep-largest u^(1/w), the form under which inclusion
    probabilities are exactly weight-proportional (round 7: the earlier
    u/weight priority was deterministic but biased relative to E–S).
    The sample is reproducible across engines and runs (priorities never
    change as the table grows); ``score`` is rounded to 12 dp so the
    selection boundary survives a last-ulp libm ``ln`` difference on a
    replaying engine, with ``key_col`` as the total-order tiebreak. One
    scan + TakeOrderedAndProject — no global sort; k·partitions rows at
    the merge, the shape that samples 100 TB.

    Weights must be POSITIVE: E–S assigns weight-0 rows zero inclusion
    probability and negative weights are undefined, but numerically
    ``-ln(u)/w`` makes them ±inf / negative keys that would SORT FIRST
    and dominate the selection (round-8 ADVICE). Rows with
    ``weight <= 0`` (or NULL) are therefore excluded before scoring —
    the mathematically consistent reading of "zero probability".
    """
    _check_reserved(df)
    u = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    # (u + 1) / 2^60 ∈ (0, 1]: never 0 (ln(0) = -inf) and reaches 1.
    u_norm = (u.cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    scored = df.filter(F.col(weight_col) > 0).withColumn(
        "score", F.round(-F.log(u_norm) / F.col(weight_col), 12)
    )
    return scored.orderBy("score", key_col).limit(k)


def balanced_sample(
    df: DataFrame,
    key_col: str,
    label_col: str,
    *,
    per_class: int | None = None,
) -> DataFrame:
    """Class-balanced downsampling: md5-deterministic ``per_class`` rows
    per label (default: the minority-class size, i.e. perfect balance) →
    the input columns of the kept rows.

    Membership is an md5-ordered row_number PARTITIONED BY label — never
    global; per-class data is ~n/|labels| per task — so the picked set is
    stable across runs, engines, and repartitioning. For a pathologically
    dominant label, swap the window for ``ranks.partitioned_topk``.
    """
    from pyspark.sql import Window

    _check_reserved(df)
    w = Window.partitionBy(label_col).orderBy(
        F.md5(F.col(key_col).cast("string")), key_col
    )
    ranked = df.withColumn("_sa_rn", F.row_number().over(w))
    if per_class is None:
        kdf = (
            df.groupBy(label_col)
            .agg(F.count(F.lit(1)).alias("_sa_nb"))
            .agg(F.min("_sa_nb").alias("_sa_k"))
        )
        ranked = ranked.crossJoin(F.broadcast(kdf))
        kept = ranked.filter(F.col("_sa_rn") <= F.col("_sa_k"))
    else:
        kept = ranked.filter(F.col("_sa_rn") <= per_class)
    return kept.select(*df.columns)


def neyman_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    value_col: str,
    *,
    budget: int = 1000,
) -> DataFrame:
    """Neyman-optimal stratified sample (allocation ∝ N_h·σ_h) → kept rows
    as ``(key, stratum, n_stratum, n_alloc)``.

    The eval-set construction recipe when strata differ in spread:
    minimum-variance allocation of a fixed ``budget`` gives high-variance
    strata more samples than proportional allocation. ``value_col`` must
    be integer-exact (cents) so per-stratum moments are exact
    (DECIMAL(38,0) sums); the weight total folds in sorted stratum order
    (cross-engine order-free); allocations use floor (never ties); the
    per-stratum head is md5-ordered (the ``hash_sample`` rule). The
    window partitions on the stratum key; for a dominant stratum swap in
    the two-phase rank.
    """
    from pyspark.sql import Window

    _check_reserved(df)
    c = df.select(
        F.col(key_col), F.col(stratum_col).alias("_sa_st"), F.col(value_col)
    )
    v = F.col(value_col).cast("decimal(38,0)")
    m = c.groupBy("_sa_st").agg(
        F.count(F.lit(1)).alias("_sa_nh"),
        F.sum(v).alias("_sa_s1"),
        F.sum(v * F.col(value_col)).alias("_sa_s2"),
    )
    # split-cast (round 7): Σv² crosses 2^64 at ~1e9 rows of 1e5-cent
    # values — both engines convert via operators/numeric.py, and the
    # Σv·Σv product uses the converted double twice (no implicit
    # decimal→double promotion left in the chain).
    from dataframe_differ_spark.operators.numeric import split_cast_double

    s1d = split_cast_double(F.col("_sa_s1"))
    s2d = split_cast_double(F.col("_sa_s2"))
    w = m.select(
        "_sa_st",
        "_sa_nh",
        (
            F.col("_sa_nh")
            * F.sqrt((s2d - s1d * s1d / F.col("_sa_nh")) / F.col("_sa_nh"))
        ).alias("_sa_wh"),
    )
    tot = w.agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(_sa_st, _sa_wh))),"
            " x -> x._sa_wh), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
        ).alias("_sa_t")
    )
    alloc = w.crossJoin(F.broadcast(tot)).select(
        "_sa_st",
        "_sa_nh",
        F.floor(F.lit(float(budget)) * F.col("_sa_wh") / F.col("_sa_t"))
        .cast("long")
        .alias("n_alloc"),
    )
    rn = F.row_number().over(
        Window.partitionBy("_sa_st").orderBy(
            F.md5(F.col(key_col).cast("string")), F.col(key_col)
        )
    )
    return (
        c.join(F.broadcast(alloc), "_sa_st")
        .withColumn("_sa_rn", rn)
        .filter(F.col("_sa_rn") <= F.col("n_alloc"))
        .select(
            F.col(key_col),
            F.col("_sa_st").alias(stratum_col),
            F.col("_sa_nh").alias("n_stratum"),
            "n_alloc",
        )
    )


def systematic_sample(
    df: DataFrame,
    order_cols,
    *,
    stride: int,
    offset: int = 0,
    bucket_key: Column | None = None,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Every ``stride``-th row by EXACT global rank over ``order_cols`` →
    the input columns + ``rank_col`` (1-based position in the full sort
    order); keeps rows with ``rank % stride == offset`` (round 8).

    The fixed-interval companion to :func:`hash_sample` (Bernoulli) and
    :func:`weighted_sample` (importance): systematic sampling guarantees
    even coverage along the sort dimension (e.g. time), which matters
    when the metric drifts — a hash sample can cluster by chance, a
    stride cannot. Deterministic: same data + same ordering = same rows,
    on any engine.

    ``order_cols`` must be a unique total order (include a tiebreaker
    id); ``bucket_key`` (default: the first order column) must be a
    numeric/castable leading sort key for the two-phase rank's range
    bucketing. Plan: the exact rank comes from ``operators.ranks.ranked``
    — one percentile-sketch pass + per-bucket windows, never a global
    single-partition window — then the stride filter pipelines.
    """
    _check_reserved(df)
    if stride < 2:
        raise ValueError("stride must be >= 2")
    if not 0 <= offset < stride:
        raise ValueError("offset must be in [0, stride)")
    from dataframe_differ_spark.operators.ranks import ranked

    if rank_col in df.columns:
        raise ValueError(f"input column {rank_col!r} collides with rank_col")
    if bucket_key is not None:
        key = bucket_key
    elif isinstance(order_cols[0], Column):
        key = order_cols[0]
    elif isinstance(order_cols[0], str):
        key = F.col(order_cols[0])
    else:
        raise TypeError(
            "order_cols[0] must be a column name or Column when bucket_key "
            f"is None, got {type(order_cols[0]).__name__}"
        )
    rk = ranked(df, key, list(order_cols), rank_col=rank_col)
    return rk.filter(F.pmod(F.col(rank_col), F.lit(stride)) == F.lit(offset))
