"""Structured Streaming: availableNow drain of the events parquet must equal
the batch aggregation (watermark + tumbling window plumbing), and the
stateful sessionizer (applyInPandasWithState) must emit exactly the batch
sessionizer's CLOSED sessions."""

import os
import shutil

from pyspark.sql import functions as F

from subgraph_isomorphism_pregel_spark.streaming.windowed import (
    run_availablenow,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_equals_batch(spark):
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in windowed_counts(batch).collect()
    }
    got_df = run_availablenow(spark, f"{SF_DIR}/events.parquet", out_table="t_stream_counts")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in got_df.collect()
    }
    assert got == want
    assert len(got) > 0


def test_stateful_sessionize_stream(spark, tmp_path):
    """Drain events as a 2-file stream (one file per trigger, so the
    watermark advances between microbatches and the final no-data batch
    fires remaining event-time timeouts). Emitted rows must EXACTLY equal
    the batch sessionizer's sessions that are closed by data or whose
    timeout the final watermark passed; each user's still-open tail session
    must NOT be emitted."""
    from subgraph_isomorphism_pregel_spark.operators.sessions import sessionize
    from subgraph_isomorphism_pregel_spark.streaming.sessions_stream import (
        run_availablenow_sessions,
    )

    gap_min, wm_sec = 30, 60
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ts_us = "unix_micros(cast(ts as timestamp))"
    t_cut, t_max = ev.agg(
        F.expr(f"percentile({ts_us}, 0.5)"), F.max(F.expr(ts_us))
    ).collect()[0]

    # two chronological files; mod times force the file source to process
    # the earlier one first
    events_dir = str(tmp_path / "events_stream")
    os.makedirs(events_dir)
    for i, part in enumerate(
        (ev.where(F.expr(ts_us) <= t_cut), ev.where(F.expr(ts_us) > t_cut))
    ):
        sub = str(tmp_path / f"half{i}")
        part.coalesce(1).write.parquet(sub)
        (pf,) = [f for f in os.listdir(sub) if f.endswith(".parquet")]
        dst = os.path.join(events_dir, f"{i:02d}.parquet")
        shutil.copy(os.path.join(sub, pf), dst)
        os.utime(dst, (1_000_000 + i * 1000, 1_000_000 + i * 1000))

    got_df = run_availablenow_sessions(
        spark, events_dir, gap_minutes=gap_min, watermark=f"{wm_sec} seconds",
        out_table="t_stream_sessions",
    )
    got = {
        (r["user_id"], r["session_no"]): (r["n_events"], r["first_ts"], r["last_ts"], r["total_value"])
        for r in got_df.collect()
    }

    batch = sessionize(ev, gap_minutes=gap_min).collect()
    last_no = {}
    for r in batch:
        last_no[r["user_id"]] = max(last_no.get(r["user_id"], 0), r["session_no"])
    import pandas as pd

    wm_final_ms = int(t_max) // 1000 - wm_sec * 1000
    want = {}
    for r in batch:
        closed_by_data = r["session_no"] < last_no[r["user_id"]]
        # naive datetimes are UTC here (session tz); avoid tz-dependent
        # datetime.timestamp()
        last_ms = pd.Timestamp(r["last_ts"]).value // 1_000_000
        timeout_ms = last_ms + gap_min * 60 * 1000 + 1
        if closed_by_data or timeout_ms <= wm_final_ms:
            want[(r["user_id"], r["session_no"])] = (
                r["n_events"], r["first_ts"], r["last_ts"], r["total_value"]
            )
    assert len(got) > 0
    assert got == want


def test_idle_state_ttl_removes_state(spark, tmp_path):
    """With idle_state_ttl_minutes set, a user idle past the TTL (in event
    time) has their state entry REMOVED: when they return, session_no
    restarts at 1. Without the TTL (default), state is retained and the
    numbering continues — the documented tradeoff (ADVICE r3)."""
    import pandas as pd

    from subgraph_isomorphism_pregel_spark.streaming.sessions_stream import (
        run_availablenow_sessions,
    )

    def ev(eid, minute, user):
        return (
            eid,
            (pd.Timestamp("2026-01-01") + pd.Timedelta(minutes=minute)).to_pydatetime(),
            user,
            "click",
            1.0,
            "{}",
        )

    # one event per file; user 2's events only advance the watermark.
    # Timeline (gap=30m, wm=60s, ttl=10m): u1@0:00 -> u2 ticks advance the
    # watermark past u1's gap timeout (session 1 emitted, idle timer armed)
    # then past the idle TTL (state removed) -> u1 returns @5:00 -> final
    # tick + no-data batch close the second session.
    timeline = [
        ev(1, 0, 1),
        ev(2, 90, 2),
        ev(3, 120, 2),
        ev(4, 240, 2),
        ev(5, 300, 1),
        ev(6, 360, 2),
        ev(7, 420, 2),
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )

    def drain(name, ttl):
        events_dir = str(tmp_path / name)
        os.makedirs(events_dir)
        for i, row in enumerate(timeline):
            sub = str(tmp_path / f"{name}_stage{i}")
            spark.createDataFrame([row], schema).coalesce(1).write.parquet(sub)
            (pf,) = [f for f in os.listdir(sub) if f.endswith(".parquet")]
            dst = os.path.join(events_dir, f"{i:02d}.parquet")
            shutil.copy(os.path.join(sub, pf), dst)
            os.utime(dst, (1_000_000 + i * 1000, 1_000_000 + i * 1000))
        df = run_availablenow_sessions(
            spark, events_dir, gap_minutes=30, watermark="60 seconds",
            out_table=f"t_{name}", idle_state_ttl_minutes=ttl,
        )
        return sorted(
            (r["session_no"], r["first_ts"].minute + r["first_ts"].hour * 60)
            for r in df.collect() if r["user_id"] == 1
        )

    # TTL: both of user 1's sessions close; the second restarts at no=1
    assert drain("ttl", ttl=10) == [(1, 0), (1, 300)]
    # default retention: numbering continues across the idle gap
    assert drain("nottl", ttl=None) == [(1, 0), (2, 300)]


def test_stream_dedup_replayed_source(spark, tmp_path):
    """A replayed (at-least-once) source: the same events parquet delivered
    TWICE as two files. dropDuplicatesWithinWatermark must collapse the
    replay so the streamed result equals the batch distinct of ONE copy."""
    from subgraph_isomorphism_pregel_spark.streaming.dedup_stream import (
        dedup_events,
        run_dedup_availablenow,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    events_dir = str(tmp_path / "events_replayed")
    os.makedirs(events_dir)
    sub = str(tmp_path / "onefile")
    ev.coalesce(1).write.parquet(sub)
    (pf,) = [f for f in os.listdir(sub) if f.endswith(".parquet")]
    for i in range(2):  # original delivery + replay
        dst = os.path.join(events_dir, f"copy{i}.parquet")
        shutil.copy(os.path.join(sub, pf), dst)
        os.utime(dst, (1_000_000 + i * 1000, 1_000_000 + i * 1000))

    want = {
        (r["user_id"], r["event_type"], r["bucket_ts"])
        for r in dedup_events(ev).collect()
    }
    got_df = run_dedup_availablenow(spark, events_dir, out_table="t_stream_dedup")
    got = [
        (r["user_id"], r["event_type"], r["bucket_ts"]) for r in got_df.collect()
    ]
    assert len(got) == len(set(got))  # replay fully collapsed
    assert set(got) == want
    assert 0 < len(got) < 2 * ev.count()


def test_rollup_stream_matches_batch_and_snapshots(spark, tmp_path):
    """Continuous aggregate: a 5-file AvailableNow drain with foreachBatch
    merges into the snapshot table must EQUAL the batch leaf rollup
    exactly, and the table must have accumulated one snapshot per batch
    (time travel shows strictly growing coverage)."""
    from subgraph_isomorphism_pregel_spark.sources import icetable
    from subgraph_isomorphism_pregel_spark.streaming.rollup_stream import (
        rollup_leaf,
        rollup_stream_availablenow,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ingest = str(tmp_path / "ingest")
    for i in range(5):
        ev.where(F.col("event_id") % 5 == i).coalesce(1).write.mode(
            "append"
        ).parquet(ingest)
    table = str(tmp_path / "rollup_table")
    final = rollup_stream_availablenow(spark, ingest, table)
    got = {
        (r["bucket_id"], r["event_type"]): (r["n"], r["total_value"])
        for r in final.collect()
    }
    want = {
        (r["bucket_id"], r["event_type"]): (r["n"], r["total_value"])
        for r in rollup_leaf(ev).collect()
    }
    assert got == want
    sid = icetable.current_snapshot_id(table)
    assert sid >= 2  # incremental merges actually happened
    early = icetable.read_table(spark, table, snapshot_id=1)
    assert 0 < early.count() <= len(got)
    # a key's count at snapshot 1 never exceeds its final count
    first = {
        (r["bucket_id"], r["event_type"]): r["n"] for r in early.collect()
    }
    assert all(first[k] <= got[k][0] for k in first)


def test_stream_interval_join_equals_batch(spark):
    """The stream-stream attribution join (two watermarked AvailableNow
    streams over the same parquet) must reproduce the batch interval join
    row-for-row."""
    from pyspark.sql import functions as F

    from subgraph_isomorphism_pregel_spark.streaming.interval_join import (
        interval_join,
        run_attribution_availablenow,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batch = interval_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        tolerance="6 hours",
    )
    want = sorted(tuple(r) for r in batch.collect())
    got_df = run_attribution_availablenow(
        spark, f"{SF_DIR}/events.parquet", tolerance="6 hours",
        out_table="t_attrib_join",
    )
    got = sorted(tuple(r) for r in got_df.collect())
    assert len(got) > 0  # non-vacuous at sf0.001
    assert got == want
