"""Streaming sink/state machinery beyond the built-in writeStream formats.

``foreach_batch`` implements the CDC upsert-merge sink pattern: each
micro-batch is merged latest-wins into a keyed parquet target through
versioned snapshots — the dependency-free local stand-in for a Delta/Iceberg
``MERGE INTO`` on a real cluster.
"""

from dataframe_differ_spark.streaming.foreach_batch import (  # noqa: F401
    UpsertMergeSink,
)

import threading

#: Serializes the save→set→start→await→restore sections that temporarily
#: retarget session-wide ``spark.sql.shuffle.partitions`` for stateful
#: streaming starts. Without it, two streaming queries pipelined on bench
#: threads interleave their save/restore and can leak the temporary value
#: into the session (A saves 32→sets 8; B saves 8; A restores 32; B
#: "restores" 8).
STREAM_CONF_LOCK = threading.Lock()
