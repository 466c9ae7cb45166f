"""Time-bucket rollup: bucket arithmetic, subtotal/grand-total identities."""

from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F

from subgraph_isomorphism_pregel_spark.operators.timeagg import time_rollup

T0 = datetime(2024, 1, 1)


def test_time_rollup_identities(spark):
    rows = [
        (1, T0 + timedelta(minutes=1), "a", 1.0),
        (2, T0 + timedelta(minutes=14, seconds=59), "a", 2.0),  # same bucket
        (3, T0 + timedelta(minutes=15), "a", 4.0),              # next bucket
        (4, T0 + timedelta(minutes=16), "b", 8.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = time_rollup(df, dims=["event_type"]).collect()
    per = {
        (r["bucket_id"], r["event_type"]): (r["n"], r["sum_r"])
        for r in out
    }
    buckets = sorted({b for b, t in per if b is not None and t is not None})
    assert len(buckets) == 2 and buckets[1] == buckets[0] + 1
    b0, b1 = buckets
    assert per[(b0, "a")] == (2, 3.0)
    assert per[(b1, "a")] == (1, 4.0)
    assert per[(b1, "b")] == (1, 8.0)
    # subtotal rows: per-bucket over all types
    assert per[(b0, None)] == (2, 3.0)
    assert per[(b1, None)] == (2, 12.0)
    # grand total
    assert per[(None, None)] == (4, 15.0)
    assert len(per) == 6


def test_time_rollup_bad_bucket(spark):
    df = spark.createDataFrame(
        [(1, T0, "a", 1.0)], "event_id long, ts timestamp, event_type string, value double"
    )
    with pytest.raises(ValueError):
        time_rollup(df, bucket_seconds=0)


def test_gapfill_locf_semantics(spark):
    from subgraph_isomorphism_pregel_spark.operators.timeagg import gapfill_locf

    rows = [
        (1, "2024-01-01 00:00:30", "a", 1.0),
        (2, "2024-01-01 00:01:10", "a", 2.0),   # bucket 1
        (3, "2024-01-01 00:04:05", "a", 10.0),  # bucket 4 -> gaps at 2,3
        (4, "2024-01-01 00:00:59", "b", 5.0),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts string, event_type string, value double")
    ev = ev.withColumn("ts", F.to_timestamp("ts"))
    out = gapfill_locf(ev, bucket_seconds=60).collect()
    a = [(r["bucket_id"], r["n"], r["val"], r["filled"]) for r in out if r["event_type"] == "a"]
    base = a[0][0]
    rel = [(b - base, n, v, f) for b, n, v, f in a]
    assert rel == [
        (0, 1, 1.0, False),
        (1, 1, 2.0, False),
        (2, 0, 2.0, True),   # carried forward
        (3, 0, 2.0, True),
        (4, 1, 10.0, False),
    ]
    b_rows = [r for r in out if r["event_type"] == "b"]
    assert len(b_rows) == 1 and b_rows[0]["n"] == 1 and not b_rows[0]["filled"]


def test_gapfill_rejects_bad_bucket(spark):
    from subgraph_isomorphism_pregel_spark.operators.timeagg import gapfill_locf

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "a", 1.0)],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        gapfill_locf(ev, bucket_seconds=0)


def test_cube_agg_cells_and_gid(spark):
    """Every subset of the dims appears; subtotals are consistent with the
    finest cells; gid uses the SQL convention (first dim = MSB)."""
    from subgraph_isomorphism_pregel_spark.operators.timeagg import cube_agg

    rows = [("a", 1, 1.5), ("a", 1, 2.5), ("a", 2, 4.0), ("b", 1, 8.0)]
    df = spark.createDataFrame(rows, "t string, h long, value double")
    got = {
        (r["t"], r["h"], r["gid"]): (r["n"], r["sum_r"])
        for r in cube_agg(df, dims=["t", "h"]).collect()
    }
    # finest cells (gid 0)
    assert got[("a", 1, 0)] == (2, 4.0)
    assert got[("a", 2, 0)] == (1, 4.0)
    assert got[("b", 1, 0)] == (1, 8.0)
    # h marginal (gid 1: h grouped away), t marginal (gid 2), grand (gid 3)
    assert got[("a", None, 1)] == (3, 8.0)
    assert got[("b", None, 1)] == (1, 8.0)
    assert got[(None, 1, 2)] == (3, 12.0)
    assert got[(None, 2, 2)] == (1, 4.0)
    assert got[(None, None, 3)] == (4, 16.0)
    assert len(got) == 8  # 3 + 2 + 2 + 1 cells

    import pytest

    with pytest.raises(ValueError):
        cube_agg(df, dims=[])


def test_gapfill_interpolate_closed_form(spark):
    """Observed buckets 0 (sum 1.0) and 4 (sum 9.0) with a 3-bucket gap:
    lerp fills 3.0, 5.0, 7.0; observed rows keep their exact aggregates;
    a second group with adjacent buckets has no fills."""
    from subgraph_isomorphism_pregel_spark.operators.timeagg import (
        gapfill_interpolate,
    )

    rows = [
        (1, T0, "a", 1.0),
        (2, T0 + timedelta(minutes=60), "a", 9.0),          # bucket 4
        (3, T0 + timedelta(minutes=1), "b", 2.0),
        (4, T0 + timedelta(minutes=16), "b", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = gapfill_interpolate(df, bucket_seconds=900).collect()
    base = {g: min(r["bucket_id"] for r in out if r["event_type"] == g) for g in "ab"}
    got = {
        (r["event_type"], r["bucket_id"] - base[r["event_type"]]): (
            r["n"], r["val"], r["filled"],
        )
        for r in out
    }
    assert got[("a", 0)] == (1, 1.0, False)
    assert got[("a", 1)] == (0, 3.0, True)
    assert got[("a", 2)] == (0, 5.0, True)
    assert got[("a", 3)] == (0, 7.0, True)
    assert got[("a", 4)] == (1, 9.0, False)
    assert got[("b", 0)] == (1, 2.0, False)
    assert got[("b", 1)] == (1, 4.0, False)
    assert len(got) == 7
