"""Agreement + cap-bound tests for dedup_fuzzy_names_capped (round-6
verdict item #4: the declared scale path of the FastSS fuzzy dedup).

Mirrors the graph_link_prediction_capped defense: (1) on the real corpus
(max bucket 42 at sf0.1, 24 at sf0.01 — measured in DuckDB) cap=64 never
binds, so capped == exact pair-for-pair; (2) on a synthetic hot-bucket
corpus (one name duplicated far past the cap) the cap provably bounds
candidate work and output.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from dataframe_differ_spark.queries.warehouse import (
    _FUZZY_CAP,
    q_dedup_fuzzy_names,
    q_dedup_fuzzy_names_capped,
)


def test_capped_agrees_with_exact_on_corpus(spark, sf_small):
    exact = sorted(map(tuple, q_dedup_fuzzy_names(spark, sf_small).collect()))
    capped = sorted(
        map(tuple, q_dedup_fuzzy_names_capped(spark, sf_small).collect())
    )
    assert exact == capped
    assert len(exact) > 0  # the corpus does contain close name pairs


def test_cap_bounds_hot_bucket(spark, tmp_path):
    # 200 customers in one nation sharing ONE name: the exact form emits
    # C(200,2) = 19900 pairs; the capped form keeps <= _FUZZY_CAP members
    # per signature bucket, so every emitted pair has both endpoints in
    # the kept top-64-by-md5 set -> exactly C(64,2) = 2016 pairs.
    rows = [
        Row(c_custkey=i, c_name="Customer#000000001", c_nationkey=7)
        for i in range(200)
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows).write.parquet(
        os.path.join(sf_dir, "customer.parquet")
    )
    exact_n = q_dedup_fuzzy_names(spark, sf_dir).count()
    capped = q_dedup_fuzzy_names_capped(spark, sf_dir)
    capped_rows = capped.collect()
    assert exact_n == 200 * 199 // 2
    assert len(capped_rows) == _FUZZY_CAP * (_FUZZY_CAP - 1) // 2
    # capped output is a subset of the exact pair set (same nation, dist 0)
    assert all(r.dist == 0 and r.nationkey == 7 for r in capped_rows)
    keep = {r.custkey_a for r in capped_rows} | {
        r.custkey_b for r in capped_rows
    }
    assert len(keep) == _FUZZY_CAP
