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

from ..functions import fixed_point_sum


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


def gapfill_locf(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    bucket_seconds: int = 900,
) -> DataFrame:
    """Hypertable-style gap-filled series with last-observation-carried-
    forward: (group, bucket_id, n, val, filled) for EVERY bucket between
    each group's first and last observation — missing buckets appear with
    n = 0, val = the previous bucket's aggregate, filled = true.

    The skeleton is one sequence() per group between its min and max
    observed bucket (never a global cross join); LOCF is one
    last(ignorenulls) running window per group. Two shuffles total (the
    bucket aggregate and the group window — same key, so AQE reuses the
    partitioning). At 100 TB series count is the parallelism unit and a
    bucket range rides each group's row, so skeleton size is output-sized,
    never |groups| x |global range|.
    """
    from pyspark.sql import Window

    if bucket_seconds < 1:
        raise ValueError("bucket_seconds must be >= 1")
    b = df.select(
        F.col(group_col).alias("grp"),
        time_bucket(F.col(ts_col), bucket_seconds).alias("bucket_id"),
        F.col(value_col).alias("v"),
    )
    agg = b.groupBy("grp", "bucket_id").agg(
        F.count("*").alias("n"), F.round(F.sum("v"), 6).alias("val_obs")
    )
    rng = (
        agg.groupBy("grp")
        .agg(F.min("bucket_id").alias("lo"), F.max("bucket_id").alias("hi"))
        .select("grp", F.explode(F.sequence("lo", "hi")).alias("bucket_id"))
    )
    j = rng.join(agg, ["grp", "bucket_id"], "left")
    w = (
        Window.partitionBy("grp")
        .orderBy("bucket_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        F.col("grp").alias(group_col),
        "bucket_id",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.last("val_obs", ignorenulls=True).over(w).alias("val"),
        F.col("n").isNull().alias("filled"),
    ).orderBy(group_col, "bucket_id")


def cube_agg(
    df: DataFrame,
    dims: list[str],
    value_col: str = "value",
) -> DataFrame:
    """-> CUBE over `dims`: (dims..., gid, n, sum_r), one row per cell of
    every subset of the dimensions (the full OLAP cube, not just the
    rollup chain), with gid = SQL-standard grouping id (first dim is the
    most significant bit: gid 0 = finest cells, 2^len(dims)-1 = grand
    total) disambiguating a real NULL dimension value from a subtotal.

    sum_r uses the fixed_point_sum discipline (int64 sum of 1e-6-quantized
    values) so every cell is order-independent and engine-exact.

    Scale shape: Catalyst's Expand replicates each input row 2^len(dims)
    times and ONE hash aggregate (map-side combined — the expansion never
    crosses the wire at full width) produces all cells; cardinality is the
    sum of per-subset distinct counts, not the input size. Keep dims low
    (<= 3-4) at 100 TB — standard cube discipline."""
    if not dims:
        raise ValueError("cube_agg needs at least one dimension")
    return (
        df.cube(*dims)
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            F.round(fixed_point_sum(value_col), 6).alias("sum_r"),
        )
    )


def gapfill_interpolate(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    bucket_seconds: int = 900,
) -> DataFrame:
    """Gap-filled series with LINEAR interpolation — gapfill_locf's other
    standard mode: a missing bucket gets

        val = prev + (next - prev) * (bucket - prev_b) / (next_b - prev_b)

    between its nearest observed neighbors (the skeleton spans each
    group's first..last observed bucket, so every gap has both). Same
    two-shuffle plan as LOCF plus one backward window on the SAME group
    key (no extra exchange); the lerp's operand order is mirrored
    verbatim in the SQL twin so the doubles are bit-identical."""
    from pyspark.sql import Window

    if bucket_seconds < 1:
        raise ValueError("bucket_seconds must be >= 1")
    b = df.select(
        F.col(group_col).alias("grp"),
        time_bucket(F.col(ts_col), bucket_seconds).alias("bucket_id"),
        F.col(value_col).alias("v"),
    )
    agg = b.groupBy("grp", "bucket_id").agg(
        F.count("*").alias("n"), F.round(F.sum("v"), 6).alias("val_obs")
    )
    rng = (
        agg.groupBy("grp")
        .agg(F.min("bucket_id").alias("lo"), F.max("bucket_id").alias("hi"))
        .select("grp", F.explode(F.sequence("lo", "hi")).alias("bucket_id"))
    )
    j = rng.join(agg, ["grp", "bucket_id"], "left")
    wp = (
        Window.partitionBy("grp")
        .orderBy("bucket_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("grp")
        .orderBy("bucket_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_b = F.when(F.col("n").isNotNull(), F.col("bucket_id"))
    pv = F.last("val_obs", ignorenulls=True).over(wp)
    pb = F.last(obs_b, ignorenulls=True).over(wp)
    nv = F.first("val_obs", ignorenulls=True).over(wn)
    nb = F.first(obs_b, ignorenulls=True).over(wn)
    lerp = F.round(
        pv + (nv - pv) * ((F.col("bucket_id") - pb) / (nb - pb)), 6
    )
    return j.select(
        F.col("grp").alias(group_col),
        "bucket_id",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.when(F.col("n").isNotNull(), F.col("val_obs")).otherwise(lerp).alias("val"),
        F.col("n").isNull().alias("filled"),
    ).orderBy(group_col, "bucket_id")
