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


def brute_dir(lrows, rrows, direction, tolerance_seconds=None):
    out = {}
    for lid, key, lt in lrows:
        back = [(rt, rid, val) for rid, k, rt, val in rrows if k == key and rt <= lt]
        fwd = [(rt, rid, val) for rid, k, rt, val in rrows if k == key and rt >= lt]
        bm = max(back) if back else None
        fm = None
        if fwd:
            # earliest ts; among equal earliest ts the GREATEST payload
            t_min = min(rt for rt, _, _ in fwd)
            fm = max(x for x in fwd if x[0] == t_min)
        def ok_b(m):
            return m and (
                tolerance_seconds is None
                or (lt - m[0]).total_seconds() <= tolerance_seconds
            )
        def ok_f(m):
            return m and (
                tolerance_seconds is None
                or (m[0] - lt).total_seconds() <= tolerance_seconds
            )
        bm = bm if ok_b(bm) else None
        fm = fm if ok_f(fm) else None
        if direction == "backward":
            m = bm
        elif direction == "forward":
            m = fm
        else:
            if bm is None:
                m = fm
            elif fm is None:
                m = bm
            else:
                db = (lt - bm[0]).total_seconds()
                df_ = (fm[0] - lt).total_seconds()
                m = bm if db <= df_ else fm
        out[lid] = (m[1], m[2]) if m else (None, None)
    return out


@pytest.mark.parametrize("direction", ["forward", "nearest"])
def test_asof_directions_match_brute_force(spark, frames, direction):
    left, right, lrows, rrows = frames
    got = collect(
        asof_join(
            left, right, keys=["user_id"], payload_cols=["event_id", "value"],
            direction=direction,
        )
    )
    assert got == brute_dir(lrows, rrows, direction)
    # and with a tolerance window
    got_t = collect(
        asof_join(
            left, right, keys=["user_id"], payload_cols=["event_id", "value"],
            direction=direction, tolerance_seconds=240,
        )
    )
    assert got_t == brute_dir(lrows, rrows, direction, tolerance_seconds=240)


def test_asof_nearest_matches_pandas(spark):
    """Randomized cross-check of all three directions against
    pandas.merge_asof (single key, no ties by construction)."""
    import pandas as pd
    import random

    rng = random.Random(13)
    lts = sorted(rng.sample(range(0, 4000, 2), 60))  # even instants
    rts = sorted(rng.sample(range(1, 4001, 2), 50))  # odd -> never equal
    lpdf = pd.DataFrame(
        {"event_id": range(60), "user_id": 1, "ts": pd.to_datetime(lts, unit="s")}
    )
    rpdf = pd.DataFrame(
        {
            "event_id": range(100, 150),
            "user_id": 1,
            "ts": pd.to_datetime(rts, unit="s"),
            "value": [float(i) for i in range(50)],
        }
    )
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    for direction in ["backward", "forward", "nearest"]:
        got = collect(
            asof_join(
                left, right, keys=["user_id"],
                payload_cols=["event_id", "value"], direction=direction,
            )
        )
        want_pdf = pd.merge_asof(
            lpdf, rpdf, on="ts", by="user_id",
            direction=direction, suffixes=("", "_r"),
        )
        want = {
            int(r.event_id): (
                None if pd.isna(r.event_id_r) else int(r.event_id_r),
                None if pd.isna(r.value) else float(r.value),
            )
            for r in want_pdf.itertuples()
        }
        assert got == want, direction


def test_asof_bad_direction(spark, frames):
    left, right, _, _ = frames
    with pytest.raises(ValueError):
        asof_join(left, right, keys=["user_id"], direction="sideways")
