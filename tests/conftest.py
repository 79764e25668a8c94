from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from dataframe_differ_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield spark


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL
