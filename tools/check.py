"""Local stand-in for the driver's t2 correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same sf dir, then compares row-count, column names, and order-insensitive
values (exact, including floats — if we pass exact, any driver hash passes).

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataframe_differ_spark.queries import load_all
from dataframe_differ_spark.session import get_spark
from dataframe_differ_spark.tables import TABLE_NAMES

DEFAULT_SF = "/root/testdata/sf0.01"


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last").reset_index(
            drop=True
        )
    return df


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    # Strict dtype parity: the driver compares schemas, so int32-vs-int64 or
    # int-vs-float divergence between engines is a failure even when the
    # values agree numerically.
    for c in sorted(sdf.columns):
        sd, od = str(sdf[c].dtype), str(odf[c].dtype)
        if sd != od and not (
            sd.startswith("datetime64") and od.startswith("datetime64")
        ):
            problems.append(f"dtype {c}: spark={sd} oracle={od}")
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    s, o = normalize(sdf), normalize(odf)
    if len(s) == len(o):
        for c in s.columns:
            sv, ov = s[c], o[c]
            if pd.api.types.is_float_dtype(sv):
                a, b = sv.to_numpy(), ov.to_numpy(float)
                eq = (a == b) | (np.isnan(a) & np.isnan(b))
                if not eq.all():
                    bad = int((~eq).sum())
                    with np.errstate(invalid="ignore"):
                        md = np.nanmax(np.abs(a - b)) if len(a) else 0
                    problems.append(f"col {c}: {bad} float mismatches, maxdiff={md:.3e}")
            else:
                neq = ~(sv.eq(ov) | (sv.isna() & ov.isna()))
                if neq.any():
                    i = int(np.argmax(neq.to_numpy()))
                    problems.append(
                        f"col {c}: {int(neq.sum())} mismatches, first at row {i}: "
                        f"spark={sv.iloc[i]!r} oracle={ov.iloc[i]!r}"
                    )
    return problems


def main() -> int:
    args = sys.argv[1:]
    sf_dir = DEFAULT_SF
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    registry = load_all()
    names = args or list(registry)
    spark = get_spark("check")
    con = duck_con(sf_dir)
    failed = []
    for name in names:
        q = registry[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if q.oracle is None:
            print(f"ok   {name}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(q.oracle).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"ok   {name}: {len(sdf)} rows match [{time.time()-t0:.1f}s]")
    print(f"\n{len(names) - len(failed)}/{len(names)} pass")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
