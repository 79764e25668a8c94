"""Source-side helpers beyond plain ``spark.read.parquet``.

``replay`` turns the static events table into a rate-limited incremental
stream (many small files + ``maxFilesPerTrigger``) — the local stand-in for
a Kafka/file-arrival source on a real cluster, letting streaming queries be
exercised across MANY micro-batches instead of one availableNow gulp.
"""

from dataframe_differ_spark.sources.replay import (  # noqa: F401
    incremental_events_stream,
    split_events_files,
)
