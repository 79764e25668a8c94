"""Pre-commit smoke gate (VERDICT r1 #2: never ship unexecuted code again).

Fast, mandatory, run before EVERY commit:
  1. import the full query registry (catches module-level NameErrors),
  2. assert golden_sf0001.json covers every registered query (catches
     queries committed without ever being executed),
  3. execute every query at sf0.001 and verify against the golden hashes
     (catches runtime NameErrors and silent result regressions),
  4. load __spark_entry__.py the way the driver does and sanity-check the
     three contract functions.

Usage: python tools/smoke.py   (exit 0 = safe to commit)
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    # 1. registry imports
    from dataframe_differ_spark.queries import load_all

    registry = load_all()
    print(f"[1/4] registry imports: {len(registry)} queries")

    # 2. golden coverage == registry
    with open(os.path.join(REPO, "golden_sf0001.json")) as f:
        golden = json.load(f)
    uncovered = sorted(set(registry) - set(golden))
    if uncovered:
        print(f"[2/4] FAIL: queries with no golden entry: {uncovered}")
        print("      run `python tools/golden.py --write` after verifying them")
        return 1
    print(f"[2/4] golden covers all {len(registry)} queries")

    # 3. execute everything at sf0.001 vs golden (catches runtime errors too)
    rc = subprocess.call([sys.executable, os.path.join(REPO, "tools", "golden.py"),
                          "--verify"])
    if rc != 0:
        print("[3/4] FAIL: golden verify")
        return 1
    print("[3/4] golden verify green")

    # 4. driver contract file
    spec = importlib.util.spec_from_file_location(
        "spark_entry_smoke", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs, osql = mod.queries(), mod.oracle_sql()
    assert set(qs) == set(registry), "queries() drifted from registry"
    assert set(osql) <= set(qs), "oracle_sql() has keys not in queries()"
    print(f"[4/4] __spark_entry__: {len(qs)} queries, {len(osql)} oracles")
    print("SMOKE OK — safe to commit")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
