"""Event sessionization — the window-function face of the engine.

Assigns session ids per user with an inactivity gap: a new session starts
when the time since the user's previous event exceeds `gap`. Pure window
functions (lag + conditional cumulative sum), whole-stage codegen, one
shuffle on user_id. Exact ANSI-SQL twin in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import fixed_point_sum


def sessionize_native(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Same output shape via Spark's BUILT-IN session_window — the most
    idiomatic form (and the one that runs unchanged under Structured
    Streaming with a watermark; state-store merging of session windows
    comes free).

    Boundary convention is IDENTICAL to `sessionize`: an event at exactly
    last_ts + gap still merges (Spark's session window is closed at the
    gap boundary; splits happen on `> gap`) — pinned by a test with an
    exact-gap event, so the two forms share one oracle. session_no is
    derived per user by first_ts order (session windows of one user never
    overlap, so the order is total)."""
    agg = (
        events.groupBy(
            "user_id", F.session_window("ts", f"{gap_minutes} minutes").alias("w")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            fixed_point_sum("value").alias("total_value"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("first_ts")
    return (
        agg.withColumn("session_no", F.row_number().over(w).cast("long"))
        .select(
            "user_id", "session_no", "n_events", "first_ts", "last_ts", "total_value"
        )
        .orderBy("user_id", "session_no")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_no, n_events, first_ts, last_ts, total_value).

    session_no is 1-based per user in time order (deterministic: ties broken
    by event_id)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lit(gap_minutes * 60)
    prev_ts = F.lag("ts").over(w)
    # unix_timestamp handles TIMESTAMP_NTZ (session TZ is pinned to UTC, so
    # it equals DuckDB's epoch())
    new_sess = (
        F.when(prev_ts.isNull(), 1)
        .when(F.unix_timestamp(F.col("ts")) - F.unix_timestamp(prev_ts) > gap, 1)
        .otherwise(0)
    )
    sessioned = events.withColumn("session_no", F.sum(new_sess).over(w))
    return (
        sessioned.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            fixed_point_sum("value").alias("total_value"),
        )
        .orderBy("user_id", "session_no")
    )
