"""As-of join vs a brute-force per-row scan: inclusive boundary, tie
rules, tolerance nulling, and no-match behavior."""

from datetime import datetime, timedelta

import pytest

from subgraph_isomorphism_pregel_spark.operators.asof import asof_join

T0 = datetime(2024, 1, 1)


def ts(minutes):
    return T0 + timedelta(minutes=minutes)


def brute(lrows, rrows, tolerance_seconds=None):
    out = {}
    for lid, key, lt in lrows:
        cand = [(rt, rid, val) for rid, k, rt, val in rrows if k == key and rt <= lt]
        if not cand:
            out[lid] = (None, None)
            continue
        rt, rid, val = max(cand)
        if tolerance_seconds is not None and (lt - rt).total_seconds() > tolerance_seconds:
            out[lid] = (None, None)
        else:
            out[lid] = (rid, val)
    return out


@pytest.fixture(scope="module")
def frames(spark):
    lrows = [
        (1, 10, ts(5)),
        (2, 10, ts(10)),
        (3, 10, ts(2)),   # before any right row -> no match
        (4, 20, ts(30)),
        (5, 30, ts(8)),   # user with no right rows at all
    ]
    rrows = [
        (101, 10, ts(3), 1.5),
        (102, 10, ts(5), 2.5),   # equal ts as left 1 -> inclusive match
        (103, 10, ts(9), 3.5),
        (104, 20, ts(1), 4.5),   # 29 minutes before left 4
    ]
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        rrows, "event_id long, user_id long, ts timestamp, value double"
    )
    return left, right, lrows, rrows


def collect(df):
    return {
        r["event_id"]: (r["matched_event_id"], r["matched_value"])
        for r in df.collect()
    }


def test_asof_matches_brute_force(spark, frames):
    left, right, lrows, rrows = frames
    got = collect(
        asof_join(left, right, keys=["user_id"], payload_cols=["event_id", "value"])
    )
    assert got == brute(lrows, rrows)
    # the boundary case really is inclusive: left 1 at ts(5) takes right 102 at ts(5)
    assert got[1] == (102, 2.5)
    assert got[3] == (None, None)
    assert got[5] == (None, None)


def test_asof_tolerance_nulls_stale_matches(spark, frames):
    left, right, lrows, rrows = frames
    got = collect(
        asof_join(
            left,
            right,
            keys=["user_id"],
            payload_cols=["event_id", "value"],
            tolerance_seconds=600,
        )
    )
    assert got == brute(lrows, rrows, tolerance_seconds=600)
    # left 4's nearest click is 29 min old -> nulled by the 10-min window
    assert got[4] == (None, None)
    # fresh matches survive
    assert got[2] == (103, 3.5)


def test_asof_equal_ts_tie_breaks_by_greatest_payload(spark):
    left = spark.createDataFrame(
        [(1, 7, ts(5))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(201, 7, ts(5), 1.0), (202, 7, ts(5), 2.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = collect(
        asof_join(left, right, keys=["user_id"], payload_cols=["event_id", "value"])
    )
    assert got[1] == (202, 2.0)


def test_asof_bad_inputs(spark, frames):
    left, right, _, _ = frames
    with pytest.raises(ValueError):
        asof_join(left, right, keys=[])
