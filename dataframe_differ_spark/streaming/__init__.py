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

#: Streaming-progress capture (round-5): query-name-PREFIX → list of
#: per-micro-batch progress dicts from the most recent run. Lets the
#: batch-twin pytests assert the STATE-STORE semantics of the rows-only
#: stream_* queries (rows dropped by the watermark, state rows held for
#: dedup/session operators) instead of only output equality. Keyed by the
#: stable prefix ("dedup", "appendfin", ...), not the uuid-suffixed sink
#: name, so tests can find the entry; one-per-prefix is enough because the
#: capture is only read immediately after a query function returns.
LAST_PROGRESS: dict[str, list[dict]] = {}


def record_progress(prefix: str, query) -> None:
    """Store a finished StreamingQuery's recentProgress under ``prefix``."""
    import json as _json

    LAST_PROGRESS[prefix] = [_json.loads(p.json) for p in query.recentProgress]
