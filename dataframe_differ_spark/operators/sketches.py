"""Parametric sketch / drift-screen operators over arbitrary DataFrames.

Round-6 extraction (continuing the dedup/similarity/graph/stats/
timeseries/evalmetrics pattern): the data-profiling sketch family —
previously fixture-bound ``queries()`` closures (queries/scaleops.py,
queries/relational.py) — as a reusable library:

    from dataframe_differ_spark.operators.sketches import cms_build, cms_lookup
    sk = cms_build(clicks, key_col="url")
    est = cms_lookup(sk, suspects, key_col="url")

Design rules shared by every operator here:

- **Schema-agnostic**: column names are parameters; internals use
  ``_sk_`` prefixed temporaries and refuse colliding inputs.
- **Fixed-size mergeable state**: every sketch partial-aggregates
  map-side into a state whose size is independent of key cardinality
  (CMS: d×w counters; HLL: one DataSketches register file per group) —
  the shape that turns a 100 TB COUNT(DISTINCT)/frequency question into
  a KB-sized shuffle.
- **Engine-portable hashing** where an oracle replays the math: CMS
  bucket r of key k is an 8-hex-char slice of ONE md5 digest per record
  (the 128-bit digest funds 4 × 32-bit row hashes), so a SQL oracle
  reproduces every counter exactly. HLL estimates are engine-specific by
  nature; their checkable contract is exact-count companions + a
  within-bound boolean (the ``agg_approx_distinct`` device) — the
  bindings' oracles pin that.

The registered queries (``sketch_cms_topk``, ``drift_psi``,
``agg_hll_merge``) are thin fixture bindings over these functions; their
DuckDB oracles and the golden corpus pin the operators' semantics.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cms_build",
    "cms_lookup",
    "psi_bins",
    "hll_rollup",
    "bloom_build",
    "bloom_probe",
]


def _check_reserved(df: DataFrame, prefix: str = "_sk_") -> None:
    for c in df.columns:
        if c.startswith(prefix):
            raise ValueError(f"input column {c!r} collides with {prefix} internals")


def _cms_bucket(r_col, digest_col, width: int):
    """Row-r counter index from a precomputed md5 hex digest: 8 hex chars
    starting at offset 8r, parsed base-16, mod width. Identical integers
    in any engine that can slice an md5 hex string."""
    return F.pmod(
        F.conv(F.substring(digest_col, r_col * 8 + 1, F.lit(8)), 16, 10).cast(
            "long"
        ),
        F.lit(width),
    )


def cms_build(
    df: DataFrame, key_col: str, *, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch of a key column → counter grid ``(r, b, cnt)``.

    One md5 per RECORD (not per record × row): digest first, then explode
    the ``depth`` row indices and slice — at 100 TB the hot-path cost is
    the hashing, not the d·w-cell shuffle. The grid partial-aggregates
    map-side, so executor state is O(d·w) regardless of key cardinality,
    and two grids built on disjoint data merge by cell addition (union
    the outputs and re-sum). ``depth`` ≤ 4 with the default slicing (the
    128-bit digest funds four 32-bit slices).
    """
    _check_reserved(df)
    if depth > 4:
        raise ValueError("depth > 4 exceeds the 4x32-bit slices of one md5 digest")
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    return (
        df.select(F.md5(F.col(key_col).cast("string")).alias("_sk_h"))
        .select("_sk_h", rows)
        .select("r", _cms_bucket(F.col("r"), F.col("_sk_h"), width).alias("b"))
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query a CMS grid → ``keys``' columns + ``cms_est``.

    cms_est(k) = min over rows r of cell[r][h_r(k)] — can only OVERcount
    (never under), the count-min guarantee. The sketch side is broadcast
    (≤ d·w rows); keys missing from every probed cell get no row (a key
    never inserted still hits populated cells in practice — CMS has no
    membership test). ``depth``/``width`` must match ``cms_build``'s.
    """
    _check_reserved(keys)
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    probes = keys.select(
        *keys.columns, F.md5(F.col(key_col).cast("string")).alias("_sk_h")
    ).select(*keys.columns, rows, F.col("_sk_h"))
    probes = probes.select(
        *keys.columns, "r", _cms_bucket(F.col("r"), F.col("_sk_h"), width).alias("b")
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "b"])
        .groupBy(*keys.columns)
        .agg(F.min("cnt").alias("cms_est"))
    )


def psi_bins(
    df: DataFrame,
    bin_col: str,
    is_base_col: str,
    *,
    smoothing: int = 1,
    n_bins: int | None = None,
) -> DataFrame:
    """Population Stability Index per bin → ``(bin, n_base, n_cur,
    psi_bin)`` (psi_bin an unrounded double; Σ psi_bin is the PSI).

    The production drift screen: rows carry a precomputed bin id and a
    boolean cohort flag; per-bin contribution (p − q)·ln(p/q) with
    add-``smoothing`` smoothing so empty bins stay finite (denominators
    add smoothing × the bin count — pass ``n_bins`` when the binning
    scheme has a FIXED bin count so unoccupied bins still fund the
    denominator; default is the observed occupied-bin count). One
    map-side-combinable groupBy on the bin
    key + a 1-row broadcast of the totals — scan-bound at any scale.
    ``ln`` is not bit-portable across engines; bindings that replay
    against a SQL oracle round the contribution before hashing.
    """
    _check_reserved(df)
    per_bin = df.groupBy(F.col(bin_col).alias("bin")).agg(
        F.sum(F.when(F.col(is_base_col), 1).otherwise(0)).alias("n_base"),
        F.sum(F.when(F.col(is_base_col), 0).otherwise(1)).alias("n_cur"),
    )
    nb = per_bin.agg(
        F.sum("n_base").alias("_sk_tb"),
        F.sum("n_cur").alias("_sk_tc"),
        (F.lit(n_bins) if n_bins else F.count(F.lit(1))).alias("_sk_k"),
    )
    p = (F.col("n_base") + smoothing).cast("double") / (
        F.col("_sk_tb") + smoothing * F.col("_sk_k")
    )
    q = (F.col("n_cur") + smoothing).cast("double") / (
        F.col("_sk_tc") + smoothing * F.col("_sk_k")
    )
    return per_bin.crossJoin(F.broadcast(nb)).select(
        "bin", "n_base", "n_cur", ((p - q) * F.log(p / q)).alias("psi_bin")
    )


def hll_rollup(
    df: DataFrame,
    value_col: str,
    fine_cols: Sequence[str],
    levels: Mapping[str, Sequence[str]],
    *,
    lgk: int = 12,
) -> DataFrame:
    """Mergeable COUNT(DISTINCT) rollup → ``(level, key, estimate)``.

    The 100 TB pattern for distinct-count hierarchies: ONE pass builds a
    DataSketches HLL per finest group (``hll_sketch_agg``), then every
    coarser level MERGES the binary sketches upward (``hll_union_agg``)
    instead of re-scanning the fact table. ``levels`` maps a level name
    to the subset of ``fine_cols`` it keeps (empty = grand total); the
    output key is the kept columns' values joined with '|' ('all' for the
    grand total). Estimates are engine-specific — pair with exact counts
    and a within-bound assertion when an oracle must replay (lgk=12 →
    ~1.6% rse; the binding's device).
    """
    _check_reserved(df)
    fine = df.groupBy(*fine_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("_sk_sk")
    )
    outs = []
    for name, keep in levels.items():
        keep = list(keep)
        unknown = set(keep) - set(fine_cols)
        if unknown:
            raise ValueError(f"level {name!r} keeps non-fine columns {unknown}")
        merged = (
            fine.groupBy(*keep).agg(F.hll_union_agg("_sk_sk").alias("_sk_sk"))
            if keep
            else fine.agg(F.hll_union_agg("_sk_sk").alias("_sk_sk"))
        )
        key = (
            F.concat_ws("|", *[F.col(c).cast("string") for c in keep])
            if keep
            else F.lit("all")
        )
        outs.append(
            merged.select(
                F.lit(name).alias("level"),
                key.alias("key"),
                F.hll_sketch_estimate("_sk_sk").alias("estimate"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def bloom_build(
    df: DataFrame,
    key_col: str,
    *,
    n_bits: int = 65536,
    n_hashes: int = 4,
) -> DataFrame:
    """Deterministic Bloom filter over a key set → the set-bit table
    ``(bit,)`` (distinct BIGINT positions, ≤ min(n_bits, k·|keys|) rows).

    Bit position i of key x is an md5-derived integer
    ``md5(i || ':' || x)[:15hex] mod n_bits`` — engine-portable, so a
    replaying oracle sets the identical bits (the CMS hashing rule).
    The bit table is the MERGEABLE, broadcastable form of the filter: a
    union of two builds is the filter of the union of the sets, and at
    n_bits = 2²⁶ it is a few hundred MB worst-case — still a broadcast.
    """
    _check_reserved(df)
    k = F.col(key_col).cast("string")
    return (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.pmod(
                            F.conv(
                                F.substring(
                                    F.md5(F.concat(F.lit(f"{i}:"), k)), 1, 15
                                ),
                                16,
                                10,
                            ).cast("long"),
                            F.lit(n_bits),
                        )
                        for i in range(n_hashes)
                    ]
                )
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    bits: DataFrame,
    df: DataFrame,
    key_col: str,
    *,
    n_bits: int = 65536,
    n_hashes: int = 4,
    out_col: str = "bloom_positive",
) -> DataFrame:
    """Probe a :func:`bloom_build` bit table → ``df`` + boolean
    ``out_col`` (true iff ALL ``n_hashes`` bit positions are set — i.e.
    "possibly in the set"; false is a guaranteed miss).

    Plan: the probe explodes each key into its ``n_hashes`` positions,
    left-joins the BROADCAST bit table, and reduces with a groupBy over
    the input columns (map-side combinable — the n_hashes exploded rows
    of one input row share a partition). Contract: probe rows must be
    DISTINCT (probe a distinct-key frame); duplicate rows collapse.
    """
    _check_reserved(df)
    k = F.col(key_col).cast("string")
    probes = df.select(
        *df.columns,
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.conv(
                            F.substring(
                                F.md5(F.concat(F.lit(f"{i}:"), k)), 1, 15
                            ),
                            16,
                            10,
                        ).cast("long"),
                        F.lit(n_bits),
                    )
                    for i in range(n_hashes)
                ]
            )
        ).alias("_sk_bit"),
    )
    hit = probes.join(
        F.broadcast(bits.withColumnRenamed("bit", "_sk_bit").withColumn(
            "_sk_set", F.lit(1)
        )),
        "_sk_bit",
        "left",
    )
    return (
        hit.groupBy(*df.columns)
        .agg(
            (F.sum(F.coalesce("_sk_set", F.lit(0))) == n_hashes).alias(
                out_col
            )
        )
    )
