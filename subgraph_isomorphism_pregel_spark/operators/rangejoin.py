"""Range join — all right rows within a time window around each left row,
per key (the other time-series join Spark lacks: as-of takes the nearest,
range takes the set — attribution windows, feature aggregation windows,
co-occurrence mining).

A naive formulation is a theta join (key equality + ts BETWEEN) which
Spark executes as a per-key cross product with a post-filter — dead when a
key holds millions of rows. This implementation time-BUCKETS the right
side: bucket = floor(epoch / W) for W = window span, and each left row
probes only its candidate buckets (the window spans at most 2 buckets,
probed with ±1 slack so floating-point epoch math can never drop a
boundary row), turning the range predicate into an EQUI-join on
(keys, bucket) + an exact timestamp filter. Catalyst gets a hash join;
fan-out is the true match volume, never the per-key cross product.

The exact filter compares native TIMESTAMPs with integer-microsecond
INTERVAL arithmetic (make_interval), so boundary semantics are
engine-exact — the double-epoch math is only ever a candidate generator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: int = -3600,
    upper_seconds: int = 0,
    prefix: str = "r_",
) -> DataFrame:
    """-> one row per (left row, right row) pair with
    left.ts + lower <= right.ts <= left.ts + upper (inclusive both ends),
    keyed on `keys`. Right columns come back {prefix}-renamed. Left rows
    with no match produce no output (inner semantics)."""
    if not keys:
        raise ValueError("range_join needs at least one key column")
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    W = float(upper_seconds - lower_seconds) or 1.0

    def epoch(c):
        # exact integer-microsecond epoch for both TIMESTAMP and
        # TIMESTAMP_NTZ: to_utc_timestamp(c, 'UTC') treats NTZ wall time as
        # UTC (zero shift, DST-free); candidate generation only — the exact
        # filter below compares native timestamps
        return F.unix_micros(F.to_utc_timestamp(c, "UTC")) / 1e6

    r = right.select(
        *[F.col(k) for k in keys],
        F.floor(epoch(F.col(right_ts)) / W).alias("__b"),
        *[
            F.col(c).alias(f"{prefix}{c}")
            for c in right.columns
            if c not in keys
        ],
    )
    lepoch = epoch(F.col(left_ts))
    l = left.withColumn(
        "__b",
        F.explode(
            F.sequence(
                (F.floor((lepoch + lower_seconds) / W) - 1).cast("long"),
                (F.floor((lepoch + upper_seconds) / W) + 1).cast("long"),
            )
        ),
    )
    lo = F.col(left_ts) + F.expr(f"make_interval(0, 0, 0, 0, 0, 0, {lower_seconds})")
    hi = F.col(left_ts) + F.expr(f"make_interval(0, 0, 0, 0, 0, 0, {upper_seconds})")
    rt = F.col(f"{prefix}{right_ts}")
    return (
        l.join(r, keys + ["__b"])
        .where((rt >= lo) & (rt <= hi))
        .drop("__b")
    )
