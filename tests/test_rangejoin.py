"""Range join vs brute-force window scan: inclusive boundaries on both
ends, bucket-edge candidates never dropped, asymmetric windows."""

from datetime import datetime, timedelta

import pytest

from subgraph_isomorphism_pregel_spark.operators.rangejoin import range_join

T0 = datetime(2024, 1, 1)


def ts(seconds):
    return T0 + timedelta(seconds=seconds)


def brute(lrows, rrows, lo, hi):
    out = set()
    for lid, key, lt in lrows:
        for rid, k, rt, _ in rrows:
            if k == key and lt + timedelta(seconds=lo) <= rt <= lt + timedelta(seconds=hi):
                out.add((lid, rid))
    return out


@pytest.fixture(scope="module")
def frames(spark):
    # right rows planted exactly ON bucket edges (multiples of the window
    # span) and window boundaries to stress the candidate generator
    lrows = [(1, 10, ts(3600)), (2, 10, ts(7200)), (3, 20, ts(100))]
    rrows = [
        (101, 10, ts(0), 1.0),      # exactly lower bound of left 1
        (102, 10, ts(3600), 2.0),   # exactly at left 1 / lower of left 2
        (103, 10, ts(3599), 3.0),
        (104, 10, ts(7201), 4.0),   # 1s past left 2 -> excluded
        (105, 20, ts(50), 5.0),
    ]
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        rrows, "event_id long, user_id long, ts timestamp, value double"
    )
    return left, right, lrows, rrows


def pairs(df):
    return {(r["event_id"], r["r_event_id"]) for r in df.collect()}


def test_range_join_matches_brute_force(spark, frames):
    left, right, lrows, rrows = frames
    got = pairs(range_join(left, right, ["user_id"], lower_seconds=-3600, upper_seconds=0))
    assert got == brute(lrows, rrows, -3600, 0)
    # both boundaries inclusive
    assert (1, 101) in got and (1, 102) in got
    # 1s past the upper bound excluded
    assert all(rid != 104 for _, rid in got)


def test_range_join_asymmetric_window(spark, frames):
    left, right, lrows, rrows = frames
    got = pairs(
        range_join(left, right, ["user_id"], lower_seconds=-100, upper_seconds=100)
    )
    assert got == brute(lrows, rrows, -100, 100)
    assert (3, 105) in got


def test_range_join_subsecond_boundaries(spark):
    """Microsecond-offset rows at the exact boundary stay engine-exact:
    the interval filter is integer-microsecond arithmetic."""
    left = spark.createDataFrame(
        [(1, 5, T0 + timedelta(seconds=10, microseconds=500))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (201, 5, T0 + timedelta(seconds=0, microseconds=500), 1.0),  # exact lower
            (202, 5, T0 + timedelta(seconds=0, microseconds=499), 2.0),  # 1us early
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = pairs(range_join(left, right, ["user_id"], lower_seconds=-10, upper_seconds=0))
    assert got == {(1, 201)}


def test_range_join_bad_inputs(spark, frames):
    left, right, _, _ = frames
    with pytest.raises(ValueError):
        range_join(left, right, [])
    with pytest.raises(ValueError):
        range_join(left, right, ["user_id"], lower_seconds=5, upper_seconds=0)
