"""Stream–stream interval join (event attribution) over the events table.

Two watermarked streams — e.g. clicks and purchases — inner-joined per user
with a time-range condition (purchase within `tolerance` AFTER the click).
This is the one join shape Structured Streaming can run UNBOUNDED with
bounded state: the watermarks plus the range condition let the engine evict
a click row once no future purchase can land inside its window, and evict a
purchase once its window closes (state retention ≈ watermark + tolerance on
both sides).  Without the range condition the join state grows forever —
the reason this operator exists instead of a plain equi-join.

The batch twin is the identical expression over the static table (the
function is stream/batch agnostic, same as windowed_counts), and the DuckDB
oracle is a plain ANSI interval join — so the gate checks that the
STREAMING drain (AvailableNow) reproduces the exact batch join result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .windowed import drain, events_stream


def interval_join(
    left: DataFrame,
    right: DataFrame,
    tolerance: str = "6 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """(left_id, right_id, user_id, delay_us): every (left, right) event
    pair of the same user with right.ts in [left.ts, left.ts + tolerance].
    Inclusive on both ends; delay_us is the exact integer microsecond gap
    (epoch-microsecond arithmetic — no truncation, no float time math).
    Works on static frames (no watermark) and on streams (watermarks
    applied; state bounded by watermark + tolerance)."""
    l = left.select(
        F.col("event_id").alias("left_id"),
        F.col("user_id").alias("l_user"),
        F.col("ts").alias("l_ts"),
    )
    r = right.select(
        F.col("event_id").alias("right_id"),
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_ts"),
    )
    if left.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {tolerance}"))
    )
    return l.join(r, cond).select(
        "left_id",
        "right_id",
        F.col("l_user").alias("user_id"),
        # to_utc_timestamp(_, "UTC") upcasts TIMESTAMP_NTZ for unix_micros
        # without shifting the difference (same repo idiom as rangejoin)
        (
            F.unix_micros(F.to_utc_timestamp("r_ts", "UTC"))
            - F.unix_micros(F.to_utc_timestamp("l_ts", "UTC"))
        ).alias("delay_us"),
    )


def _event_stream(spark: SparkSession, events_dir: str, event_type: str) -> DataFrame:
    return events_stream(spark, events_dir).where(F.col("event_type") == event_type)


def run_attribution_availablenow(
    spark: SparkSession,
    events_dir: str,
    left_type: str = "click",
    right_type: str = "purchase",
    tolerance: str = "6 hours",
    out_table: str = "stream_attrib",
) -> DataFrame:
    """Drain the click->purchase attribution join as TWO streams over the
    same parquet with Trigger.AvailableNow; returns the sink table."""
    joined = interval_join(
        _event_stream(spark, events_dir, left_type),
        _event_stream(spark, events_dir, right_type),
        tolerance=tolerance,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    return spark.table(out_table)
