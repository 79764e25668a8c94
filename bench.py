"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line with per-query and
total wall-clock seconds.

Queries are executed with the noop sink (full computation, no driver
collect) so the number measures the distributed plan, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataframe_differ_spark.queries import load_all
from dataframe_differ_spark.session import get_spark


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    registry = load_all()

    # Warm the JVM/session on the smallest scale so per-query numbers
    # measure the plan, not first-job startup.
    warm = next(iter(registry.values()))
    try:
        run_query(warm.fn(spark, "/root/testdata/sf0.001"))
    except Exception:
        pass

    times: dict[str, float] = {}
    t_all = time.time()
    for name, q in registry.items():
        t0 = time.time()
        try:
            run_query(q.fn(spark, sf_dir))
            times[name] = round(time.time() - t0, 3)
        except Exception as e:
            print(f"bench error {name}: {e}", file=sys.stderr)
            times[name] = -1.0
    total = round(time.time() - t_all, 3)
    print(
        json.dumps(
            {
                "metric": "total_wall_clock_all_queries",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
