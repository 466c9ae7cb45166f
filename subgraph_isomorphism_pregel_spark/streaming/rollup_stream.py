"""Continuous aggregate: a streaming time-bucket rollup maintained
incrementally in an Iceberg-style snapshot table (the streaming form of
operators/timeagg.py — what TimescaleDB calls a continuous aggregate and
Databricks a streaming MERGE materialized view).

readStream(events) -> watermark -> leaf aggregate per (bucket_id,
event_type) in UPDATE output mode -> foreachBatch upsert: each micro-batch
emits the keys whose aggregates changed, and the upsert commits a new
table snapshot = previous rows minus the changed keys + the fresh rows.
Readers see snapshot-isolated, always-consistent aggregates while the
stream runs, and time travel across batch boundaries for free
(sources/icetable.py).

Totals use fixed_point_sum so the incremental result is bit-identical to
the batch rollup regardless of file arrival order. The watermark bounds
streaming state on an unbounded source; the AvailableNow validation drain
uses a wide watermark so no late file is dropped and the final table must
EQUAL the batch aggregate exactly (asserted in tests)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import fixed_point_sum
from ..operators.timeagg import time_bucket
from ..sources import icetable
from .windowed import EVENTS_SCHEMA, drain


def rollup_leaf(events: DataFrame, bucket_seconds: int = 900) -> DataFrame:
    """Leaf rollup rows (bucket_id, event_type, n, total_value) — the shared
    batch/stream aggregate; the batch form is the gate's oracle twin."""
    return events.groupBy(
        time_bucket(F.col("ts"), bucket_seconds).alias("bucket_id"),
        "event_type",
    ).agg(F.count("*").alias("n"), fixed_point_sum("value").alias("total_value"))


def rollup_stream_availablenow(
    spark: SparkSession,
    events_dir: str,
    table_path: str,
    bucket_seconds: int = 900,
    watermark: str = "2400 hours",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drain events_dir one file per micro-batch, merging each batch's
    changed aggregate rows into the snapshot table; returns the final
    table DataFrame. The table gains one snapshot per non-empty batch."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    agg = rollup_leaf(stream.withWatermark("ts", watermark), bucket_seconds)
    # partition_by needs a column that exists on the aggregate rows
    part_col = "event_type"

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.persist()
        if rows.isEmpty():
            rows.unpersist()
            return
        if os.path.exists(table_path):
            current = icetable.read_table(spark, table_path)
            keep = current.join(
                rows.select("bucket_id", "event_type"),
                ["bucket_id", "event_type"],
                "left_anti",
            )
            icetable.overwrite_table(keep.unionByName(rows), table_path)
        else:
            icetable.write_table(rows, table_path, partition_by=part_col)
        rows.unpersist()

    ckpt = tempfile.mkdtemp(prefix="rollup_stream_ckpt_")
    try:
        q = (
            agg.writeStream.foreachBatch(upsert)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        drain(q, timeout=600)
    finally:
        # the checkpoint is fresh per call and never resumed — remove the
        # state-store/offset files instead of leaking a dir per invocation
        shutil.rmtree(ckpt, ignore_errors=True)
    return icetable.read_table(spark, table_path)
