"""Windowed streaming aggregation over the events table.

readStream(parquet) -> watermark -> tumbling-window counts -> sink. The test
runs it with Trigger.AvailableNow against the static events parquet and
checks the result equals the batch groupBy — the standard way to validate a
streaming pipeline without a live source.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import fixed_point_sum

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)


def events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-stream reader over the events table, shared by every streaming
    module (one copy of the schema + the single-file shim). Accepts a
    directory or a single parquet file — the file source requires a
    directory, so a file path becomes its parent + a pathGlobFilter."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if os.path.isfile(events_dir):
        reader = reader.option("pathGlobFilter", os.path.basename(events_dir))
        events_dir = os.path.dirname(events_dir)
    return reader.parquet(events_dir)


def drain(q, timeout: int = 300) -> None:
    """Wait for an AvailableNow drain to finish. awaitTermination(timeout)
    returns False on expiry — ignoring that would hand back a partial,
    still-mutating sink table; stop the query and raise instead."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(f"streaming drain still running after {timeout}s")


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window (window_start, event_type, n, total_value); watermark
    bounds state for late data when the source is unbounded."""
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        e.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), fixed_point_sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def run_availablenow(spark: SparkSession, events_dir: str, out_table: str = "stream_counts") -> DataFrame:
    """Drain the events parquet as a stream into an in-memory sink; returns
    the sink table DataFrame after the stream finishes."""
    stream = events_stream(spark, events_dir)
    q = (
        windowed_counts(stream)
        .writeStream.format("memory")
        .queryName(out_table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    return spark.table(out_table)
