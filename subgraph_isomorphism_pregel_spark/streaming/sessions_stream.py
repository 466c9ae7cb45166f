"""Stateful streaming sessionization: applyInPandasWithState over events.

The batch sessionizer (operators/sessions.py) is a window + conditional
cumsum; THIS module is the custom stateful-operator form for unbounded
streams — per-user session state lives in the state store, sessions close
either by DATA EVIDENCE (a later event of the same user beyond the gap) or
by EVENT-TIME TIMEOUT (the watermark passes last_ts + gap), and each closed
session is appended to the sink exactly once.

Semantics match the batch sessionize exactly (same session numbering by
event time per user, same round-half-up micro-quantized total_value), so a
drained stream's emitted sessions are a prefix-closed subset of the batch
result: every session except each user's still-open final one whose timeout
the final watermark has not yet passed. The test splits the events table
into chronological files and drains with one-file-per-trigger so the
watermark actually advances between microbatches.

State per user: (next session number, open-session start/last micros,
event count, value micros). All arithmetic is integer micros — engine-exact
and identical to the batch path's fixed_point_sum quantization.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .windowed import EVENTS_SCHEMA, drain

OUT_SCHEMA = (
    "user_id long, session_no long, n_events long, "
    "first_ts timestamp, last_ts timestamp, total_value double"
)
STATE_SCHEMA = (
    "next_no long, open_start long, open_last long, open_n long, open_val long"
)

_US = 1_000_000


def _quant(v: float) -> int:
    """floor(v * 1e6 + 0.5): the same round-half-up micro quantization as
    functions.fixed_point_sum — one IEEE multiply, exact everywhere."""
    import math

    return int(math.floor(v * 1e6 + 0.5))


def _session_fn(gap_us: int, idle_ttl_ms: int | None = None):
    def fn(key: Tuple[Any], pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            next_no, o_start, o_last, o_n, o_val = state.get
            has_open = o_n > 0
        else:
            next_no, o_start, o_last, o_n, o_val = 1, 0, 0, 0, 0
            has_open = False

        closed = []  # (session_no, start_us, last_us, n, val_micro)
        last_event_us = 0  # set when a session closes by timeout (TTL base)

        if state.hasTimedOut:
            if not has_open:
                # the IDLE timer fired: the user's last session closed
                # idle_ttl ago with no new events — drop the state entry
                # entirely (their session_no restarts at 1 if they return)
                state.remove()
                return
            # watermark passed open_last + gap: no event can extend it
            closed.append((next_no, o_start, o_last, o_n, o_val))
            next_no += 1
            has_open = False
            # keep the closed session's last EVENT time for the idle-TTL
            # timer below — retention counts from the last event, not from
            # when the close happened to be observed
            last_event_us = o_last
            o_start = o_last = o_n = o_val = 0
        else:
            rows = [p for p in pdf_iter if len(p)]
            if rows:
                ev = pd.concat(rows).sort_values(["ts", "event_id"])
                ts_us = (ev["ts"].astype("int64") // 1000).to_numpy()
                vals = ev["value"].to_numpy()
                for t, v in zip(ts_us, vals):
                    t = int(t)  # GroupState round-trips through JSON: no numpy ints
                    q = _quant(float(v))
                    if has_open and t - o_last <= gap_us:
                        o_last, o_n, o_val = t, o_n + 1, o_val + q
                    else:
                        if has_open:
                            # definitively closed by this newer event
                            closed.append((next_no, o_start, o_last, o_n, o_val))
                            next_no += 1
                        o_start, o_last, o_n, o_val = t, t, 1, q
                        has_open = True

        if has_open:
            state.update((next_no, o_start, o_last, o_n, o_val))
            # fire when the watermark proves the gap elapsed; must be
            # strictly beyond the current watermark
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max((o_last + gap_us) // 1000 + 1, wm + 1))
        else:
            # no open session. Default: RETAIN state so a returning user's
            # session_no continues exactly where the batch sessionizer
            # would number it (the unbounded-growth tradeoff is deliberate
            # and now opt-out). With idle_ttl set: re-arm a long event-time
            # timer; if it fires before any new event, the state entry is
            # removed above (session_no continuity is traded for a bounded
            # state store).
            state.update((next_no, 0, 0, 0, 0))
            if idle_ttl_ms is not None:
                # TTL counts from the closed session's last EVENT TIME (not
                # from when the watermark happened to observe the close):
                # the entry dies once the user has been idle past the TTL
                # in event time. Must still be strictly beyond the current
                # watermark or the state store rejects the timer.
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(
                    max(last_event_us // 1000 + idle_ttl_ms, wm + 1)
                )

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [int(user_id)] * len(closed),
                    "session_no": [c[0] for c in closed],
                    "n_events": [c[3] for c in closed],
                    "first_ts": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "last_ts": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "total_value": [c[4] / _US for c in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 minute",
    idle_state_ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming (user_id, session_no, n_events, first_ts, last_ts,
    total_value) in append mode — one row per CLOSED session.

    State retention: by default per-user state is RETAINED after a
    session closes so session_no numbering stays exactly the batch
    sessionizer's — on an unbounded stream the state store then grows
    with the number of DISTINCT users (one tiny fixed-size row each).
    Set idle_state_ttl_minutes to bound the store instead: a user idle
    (no events, no open session) past the TTL in EVENT TIME has their
    state entry removed; if they return later their session_no restarts
    at 1, diverging from the batch numbering for exactly those users."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    ttl_ms = (
        idle_state_ttl_minutes * 60_000 if idle_state_ttl_minutes is not None else None
    )
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return e.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60 * _US, idle_ttl_ms=ttl_ms),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def run_availablenow_sessions(
    spark: SparkSession,
    events_dir: str,
    gap_minutes: int = 30,
    watermark: str = "1 minute",
    out_table: str = "stream_sessions",
    max_files_per_trigger: int = 1,
    idle_state_ttl_minutes: int | None = None,
) -> DataFrame:
    """Drain an events parquet directory as a stream (one file per trigger
    so the watermark advances between microbatches; Spark's no-data final
    microbatch then fires the remaining event-time timeouts) and return the
    in-memory sink of closed sessions."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    q = (
        sessionize_stream(
            stream,
            gap_minutes=gap_minutes,
            watermark=watermark,
            idle_state_ttl_minutes=idle_state_ttl_minutes,
        )
        .writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    return spark.table(out_table)
