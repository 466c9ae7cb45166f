"""Hypertable-style time-bucket rollup: multi-resolution aggregates over a
time-bucketed event stream (the batch form of a continuous aggregate).

bucket_id = floor(epoch_micros / (bucket_seconds * 1e6)) — an integer
bucket index, engine-exact for TIMESTAMP and TIMESTAMP_NTZ (micros are
exact int64; the double division's ulp at epoch scale is finer than the
quotient granularity, so floor never misrounds). The rollup itself is
Spark's native ROLLUP: Catalyst expands the grouping sets, the partial
aggregation is map-side combined, and subtotal rows carry NULL dims —
exactly the SQL GROUP BY ROLLUP contract, so the DuckDB oracle is the
same query. One shuffle; at 100 TB bucket_id prefixes the grouping key so
the shuffle is time-partitioned and append-only ingest only touches the
newest buckets on incremental recompute."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_bucket(c, bucket_seconds: int = 900):
    """timestamp column -> integer bucket index (floor of epoch/width)."""
    micros = F.unix_micros(F.to_utc_timestamp(c, "UTC"))
    return F.floor(micros / F.lit(int(bucket_seconds) * 1_000_000))


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    dims: list[str] | None = None,
    value_col: str = "value",
    bucket_seconds: int = 900,
) -> DataFrame:
    """-> ROLLUP over (bucket_id, *dims): (bucket_id, dims..., n, sum_r)
    with NULL dims marking subtotal rows and one all-NULL grand total."""
    if bucket_seconds < 1:
        raise ValueError("bucket_seconds must be >= 1")
    dims = dims or []
    b = df.withColumn("bucket_id", time_bucket(F.col(ts_col), bucket_seconds))
    return b.rollup("bucket_id", *dims).agg(
        F.count("*").alias("n"),
        F.round(F.sum(value_col), 6).alias("sum_r"),
    )
