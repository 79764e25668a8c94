"""Advanced streaming surface: incremental replay + foreachBatch merge sink.

Closes two round-1 gaps from SURVEY.md §8: true multi-micro-batch execution
(rate-limited file replay via ``maxFilesPerTrigger``) and the foreachBatch
sink pattern (CDC upsert-merge). Both are rows-only for the driver
(micro-batch scheduling is not SQL-expressible); tests assert exact
equality with batch twins.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

from dataframe_differ_spark.queries import register
from dataframe_differ_spark.sources.replay import incremental_events_stream
from dataframe_differ_spark.streaming import STREAM_CONF_LOCK, record_progress
from dataframe_differ_spark.streaming.foreach_batch import UpsertMergeSink


@register("stream_replay_incremental")  # rows-only: micro-batch scheduling
def q_stream_replay_incremental(spark, sf_dir):
    """Rate-limited replay: 8 files, 2 per trigger → 4 micro-batches.

    The tumbling-window count accumulates in the state store across all 4
    batches (complete output mode re-emits the merged state each batch);
    the final table must equal the single-batch `window_tumbling` twin —
    proving window state survives micro-batch boundaries. This is the
    local stand-in for continuous Kafka/file-arrival ingestion where
    backpressure (maxFilesPerTrigger / maxBytesPerTrigger) sizes batches.
    """
    s = incremental_events_stream(spark, sf_dir, n_files=8, files_per_trigger=2)
    agg = (
        s.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"), "event_type", "n_events"
        )
    )
    name = f"replay_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"ddspark_ckpt_{name}")
    with STREAM_CONF_LOCK:
        saved = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", saved)
    return spark.table(name)


@register("stream_foreach_batch")  # rows-only: driver-side sink callback
def q_stream_foreach_batch(spark, sf_dir):
    """foreachBatch CDC merge: per-user latest value + running event count.

    Each of the 4 micro-batches is upsert-merged latest-wins into a
    versioned parquet snapshot (UpsertMergeSink) — the pattern for sinks
    Spark has no native format for (JDBC upserts, MERGE INTO). The running
    count is an aggregate no single batch can compute, so the result
    proves state flowed through the sink across batches; tests assert
    equality with the batch max_by twin and that >1 batches were merged.
    """
    base = os.path.join(
        tempfile.gettempdir(), f"ddspark_merge_{uuid.uuid4().hex[:8]}"
    )
    sink = UpsertMergeSink(base, keys=["user_id"])
    s = incremental_events_stream(
        spark, sf_dir, n_files=8, files_per_trigger=2
    ).select("user_id", "ts", "event_id", "value")
    with STREAM_CONF_LOCK:
        saved = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                s.writeStream.foreachBatch(sink)
                .option(
                    "checkpointLocation",
                    os.path.join(
                        tempfile.gettempdir(),
                        f"ddspark_ckpt_fb_{uuid.uuid4().hex[:8]}",
                    ),
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", saved)
    # Older snapshot versions are dead after the final merge; drop them so
    # repeated runs don't accumulate (the live version backs the result).
    for d in os.listdir(base):
        p = os.path.join(base, d)
        if p != sink.current_path:
            shutil.rmtree(p, ignore_errors=True)
    return sink.result(spark).withColumn("n_batches", F.lit(sink.n_batches))


@register("stream_append_finalized")  # rows-only: micro-batch scheduling
def q_stream_append_finalized(spark, sf_dir):
    """Append-mode windowed aggregation over the 4-micro-batch replay:
    a window row is emitted ONLY once the watermark passes its end —
    i.e. the stream outputs FINALIZED windows exactly once.

    This is the semantics sinks without upsert support (Kafka topics,
    append-only files) require: no retractions, no re-emission — and the
    flip sides are latency (a window is withheld until the watermark,
    fed by later batches, closes it), the guarantee that windows still
    open at termination are NEVER emitted, and real LATE-DATA DROP: the
    hash-split replay delivers old events in later batches, and once the
    watermark has passed them they are discarded, so an emitted count
    can be LESS than the batch twin's (the test asserts exactly this
    one-sided relationship). Complete/update modes are exercised by
    `stream_replay_incremental` / `stream_stateful`; this closes the
    third output mode.
    """
    s = incremental_events_stream(spark, sf_dir, n_files=8, files_per_trigger=2)
    agg = (
        s.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"), "event_type", "n_events"
        )
    )
    name = f"appendfin_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"ddspark_ckpt_{name}")
    with STREAM_CONF_LOCK:
        saved = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            record_progress("appendfin", q)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", saved)
    return spark.table(name)


@register("stream_update_deltas")  # rows-only: micro-batch scheduling
def q_stream_update_deltas(spark, sf_dir):
    """Update-mode windowed aggregation over the 4-micro-batch replay:
    each micro-batch emits ONLY the (window, event_type) groups whose
    aggregate CHANGED in that batch — the per-batch delta an incremental
    sink (key-value store, JDBC upsert) consumes. Completes the output-
    mode matrix: complete = `stream_replay_incremental`, append =
    `stream_append_finalized`, update = this.

    The memory sink cannot attribute rows to batches, so deltas are
    captured via foreachBatch (advanced_streaming's sink pattern): each
    batch's emission is appended to parquet tagged with its batch_id.
    The registered result is what the downstream store would hold after
    replay — the LATEST emission per group (which must equal the batch
    twin; pytest asserts it) — plus emission accounting (n_emissions,
    last_batch) proving groups were re-emitted only when updated, i.e.
    genuinely incremental, not complete-mode re-broadcast.
    """
    s = incremental_events_stream(spark, sf_dir, n_files=8, files_per_trigger=2)
    agg = (
        s.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"), "event_type", "n_events"
        )
    )
    acc_path = os.path.join(
        tempfile.gettempdir(), f"ddspark_upddelta_{uuid.uuid4().hex[:8]}"
    )

    def record(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(int(batch_id))).write.mode(
            "append"
        ).parquet(acc_path)

    ckpt = os.path.join(
        tempfile.gettempdir(), f"ddspark_ckpt_upd_{uuid.uuid4().hex[:8]}"
    )
    with STREAM_CONF_LOCK:
        saved = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                agg.writeStream.foreachBatch(record)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", saved)
    acc = spark.read.parquet(acc_path)
    return acc.groupBy("window_start", "event_type").agg(
        F.expr("max_by(n_events, batch_id)").alias("n_events"),
        F.count(F.lit(1)).alias("n_emissions"),
        F.max("batch_id").alias("last_batch"),
    )
