"""Sessionization: lag-cumsum vs built-in session_window, including the
half-open boundary difference at a gap of EXACTLY gap_minutes."""

import datetime as dt

from pyspark.sql import functions as F

from subgraph_isomorphism_pregel_spark.operators.sessions import (
    sessionize,
    sessionize_native,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, t, u, "e", v, "") for i, (u, t, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_native_equals_cumsum(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = sorted(map(tuple, sessionize(ev).collect()))
    b = sorted(map(tuple, sessionize_native(ev).collect()))
    assert a == b and len(a) > 0


def test_boundary_convention(spark):
    """An event exactly gap seconds after the previous one MERGES in both
    forms (split on > gap; Spark's session window is closed at the gap
    boundary — pinned here empirically so the shared oracle stays honest);
    one second beyond the gap splits in both."""
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1.0),
        (1, t0 + dt.timedelta(seconds=1800), 2.0),   # exactly the gap
        (1, t0 + dt.timedelta(seconds=1800 + 10), 3.0),
        (2, t0, 5.0),
        (2, t0 + dt.timedelta(seconds=1801), 6.0),   # beyond the gap: both split
    ]
    ev = _events(spark, rows)
    cum = {(r["user_id"], r["session_no"]): r["n_events"] for r in sessionize(ev).collect()}
    nat = {(r["user_id"], r["session_no"]): r["n_events"] for r in sessionize_native(ev).collect()}
    assert cum == {(1, 1): 3, (2, 1): 1, (2, 2): 1}
    assert nat == cum
