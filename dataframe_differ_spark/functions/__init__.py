"""Reusable expression builders — the engine's public function surface.

Each helper ships as a PAIR: a Spark `Column` expression and the DuckDB SQL
text computing the bit-identical value, because the driver's correctness
gate hashes both engines' outputs (SURVEY.md §5.4). Keeping the pair in one
module is what stops the two sides drifting.

Everything here is pure column expressions (JVM-side, whole-stage codegen) —
no UDFs, per the 100 TB design rule.
"""

from dataframe_differ_spark.functions.numeric import (  # noqa: F401
    SQL_DSUM,
    SQL_REV_DEC,
    dsum,
    rev_dec,
)
from dataframe_differ_spark.functions.vector import (  # noqa: F401
    SQL_COS,
    SQL_DOT,
    cosine,
    dot,
    norm,
)
