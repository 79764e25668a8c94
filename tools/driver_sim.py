"""Exact driver-t2 replica: vanilla SparkSession through __spark_entry__.py.

tools/check.py verifies the registry on OUR session factory; the round
driver instead builds its own SparkSession (no UTC/Arrow/AQE confs) and
loads the contract file by path. Round 1 died on a difference between
those two paths (registry import crash), so this tool drives the exact
driver path: spec_from_file_location, entry(spark) smoke, then every
queries()[name] vs oracle_sql()[name] on DuckDB with check.py's strict
compare (values + dtypes).

Usage: python tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check import compare, duck_con

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spec = importlib.util.spec_from_file_location(
        "spark_entry_sim", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    assert m.entry(spark).count() > 0, "entry() returned no rows"
    qs, osql = m.queries(), m.oracle_sql()
    con = duck_con(sf)
    failed = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in osql:
            # Rows-only queries still pass through the driver's pandas
            # sort_values canon — replicate it so complex-typed outputs
            # (the round-2 agg_pctl_approx crash) fail here, not at judging.
            try:
                if len(sdf):
                    sdf.sort_values(by=list(sdf.columns), na_position="last")
            except TypeError as e:
                print(f"FAIL {name}: rows-only canon crash: {e}")
                failed.append(name)
            continue
        try:
            odf = con.execute(osql[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
    print(f"{len(qs) - len(failed)}/{len(qs)} pass on VANILLA session")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
