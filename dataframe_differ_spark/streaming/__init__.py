"""Streaming sink/state machinery beyond the built-in writeStream formats.

``foreach_batch`` implements the CDC upsert-merge sink pattern: each
micro-batch is merged latest-wins into a keyed parquet target through
versioned snapshots — the dependency-free local stand-in for a Delta/Iceberg
``MERGE INTO`` on a real cluster.
"""

from dataframe_differ_spark.streaming.foreach_batch import (  # noqa: F401
    UpsertMergeSink,
)
