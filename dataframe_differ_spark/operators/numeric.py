"""Cross-engine numeric devices shared by the operator library.

The one that earns its own module is the **split-cast int128→double
device**, promoted here in round 7 after the round-6 sf0.1 sweep caught
a real bug it fixes (SURVEY.md §13.2b): when an exact integer sum
(Spark DECIMAL(38,0), DuckDB HUGEINT) exceeds 2^64, the two engines'
int128→double conversions can round the SAME integer to doubles one ulp
apart (measured on the Brown-Forsythe Σz² at sf0.1).  Any query whose
oracle compares a rounded double derived from such a cast is exposed.

The device: split the integer at 2^30 —

    hi = x div 2^30          (|hi| < 2^96, but in practice < 2^53 for
                              any sum this library produces, so the
                              hi cast is exact)
    lo = x mod 2^30          (always exact in double)
    double(x) := double(hi) * 2^30 + double(lo)

``double(hi)`` and ``double(lo)`` are exact conversions whenever
|hi| < 2^53 (i.e. |x| < 2^83 — far above any Σv² this library meets:
even 100 TB of 1e5-cent values is ~1e12 rows × 1e10 = 1e22 ≈ 2^73),
and the reconstruction ``hi*2^30 + lo`` is two IEEE ops every engine
performs identically.  The (possibly rounded) result is therefore
deterministic by construction instead of by engine-conversion luck.

``split_cast_double`` is the Spark side; ``split_cast_sql`` emits the
equivalent DuckDB snippet so a binding's oracle replays the identical
op chain.  BASELINE.md (round-7 section) carries the audit of every
DECIMAL(38,x)→double cast site in the registry and which ones needed
this device.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["split_cast_double", "split_cast_sql", "SPLIT_BASE"]

# 2^30: big enough that hi stays < 2^53 for every sum we produce,
# small enough that lo is always exactly representable.
SPLIT_BASE = 1073741824


def split_cast_double(col: Column) -> Column:
    """Exact-integer column (DECIMAL/BIGINT) → double, engine-portably.

    Use instead of ``col.cast("double")`` whenever the value can exceed
    2^64 and the result feeds an oracle-compared float (see module
    docstring for why a plain cast diverges across engines there).
    """
    hi = (col - (col % F.lit(SPLIT_BASE))) / F.lit(SPLIT_BASE)
    return hi.cast("decimal(38,0)").cast("double") * F.lit(float(SPLIT_BASE)) + (
        col % F.lit(SPLIT_BASE)
    ).cast("double")


def split_cast_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`split_cast_double` for oracle strings.

    ``expr`` must be an exact-integer SQL expression (it is wrapped in
    a HUGEINT cast so ``//`` and ``%`` are integer ops).
    """
    return (
        f"(CAST(CAST({expr} AS HUGEINT) // {SPLIT_BASE} AS DOUBLE)"
        f" * {SPLIT_BASE}.0"
        f" + CAST(CAST({expr} AS HUGEINT) % {SPLIT_BASE} AS DOUBLE))"
    )
