"""Streaming deduplication over the events table.

The ingestion-side twin of the batch dedup operators (operators/dedup.py):
an unbounded source re-delivers rows (at-least-once ingestion, replayed
files, overlapping backfills), and the pipeline must emit each logical key
once. Streaming mode uses ``dropDuplicatesWithinWatermark`` so the dedup
state store is BOUNDED — keys older than the watermark are evicted, which
is the only way the operator survives an unbounded 100 TB stream. Batch
mode is the plain ``distinct`` twin, which is what the SQL oracle checks.

The logical key is (user_id, event_type, event-time bucket): coarse enough
to collapse re-deliveries that jitter inside the bucket, and the bucket
column keeps the key space bounded per watermark window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .windowed import drain, events_stream

DEDUP_KEYS = ["user_id", "event_type", "bucket_ts"]


def dedup_events(
    events: DataFrame, granularity: str = "hour", watermark: str = "2 hours"
) -> DataFrame:
    """Distinct (user_id, event_type, bucket_ts) rows.

    Streaming input: watermark on ts + dropDuplicatesWithinWatermark —
    exactly-once per key within the watermark horizon, state evicted past
    it. Batch input: the same projection through ``dropDuplicates`` (equal
    to DISTINCT since only key columns are kept).
    """
    keyed = events.withColumn("bucket_ts", F.date_trunc(granularity, F.col("ts")))
    if events.isStreaming:
        # ts (the watermark column) stays in the frame so the engine can
        # track event time; dedup on the subset, then project to the keys
        return (
            keyed.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(DEDUP_KEYS)
            .select(*DEDUP_KEYS)
        )
    return keyed.select(*DEDUP_KEYS).dropDuplicates()


def run_dedup_availablenow(
    spark: SparkSession, events_dir: str, out_table: str = "stream_dedup"
) -> DataFrame:
    """Drain an events parquet directory (possibly containing replayed /
    duplicated files) as a stream through dedup_events into an in-memory
    sink; returns the sink table after the stream finishes."""
    stream = events_stream(spark, events_dir)
    q = (
        dedup_events(stream)
        .writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    return spark.table(out_table)
