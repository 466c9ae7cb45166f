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
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if os.path.isfile(events_dir):
        # single-file table: the file stream source requires a directory
        reader = reader.option("pathGlobFilter", os.path.basename(events_dir))
        events_dir = os.path.dirname(events_dir)
    stream = reader.parquet(events_dir)
    q = (
        windowed_counts(stream)
        .writeStream.format("memory")
        .queryName(out_table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(out_table)
