"""As-of join — for every left row, the latest right row at-or-before it
per key (the time-series operator behind feature backfill, point-in-time
correctness, and last-touch attribution).

Spark has no native as-of join; the naive formulations are a per-row
LATERAL/theta-join (O(n_l * n_r) per key) or a range-bucketed join. This
implementation is the single-shuffle UNION-WINDOW construction:

    1. union right rows (tag 0, payload struct) and left rows (tag 1,
       null payload) on (keys, ts, tag);
    2. one window per key, ordered by (ts, tag, payload), carries
       last(payload, ignorenulls) over ROWS UNBOUNDED PRECEDING..CURRENT;
    3. keep tag 1 rows: the carried struct IS the as-of match.

Matching is INCLUSIVE (right.ts <= left.ts — right rows sort before left
at equal ts); among right rows tied on ts the greatest payload struct wins
(put an id first in payload_cols for a deterministic, engine-independent
tie-break). One shuffle on the key, O((n_l + n_r) log per-partition) —
the sort is per key-partition, never a cross product; key skew equals
per-key event volume, which a time-bucketed salt can split if a single
key's history outgrows an executor (document-scale histories don't).

`tolerance_seconds` turns matches older than the window into nulls (the
match STILL consumes the nearest row first — pandas.merge_asof semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    prefix: str = "matched_",
    direction: str = "backward",
) -> DataFrame:
    """-> left rows + {prefix}<payload_col> columns from the as-of match
    (null when no right row qualifies, or the tolerance lapses).

    direction (pandas.merge_asof semantics, inclusive at equal ts):
      'backward' — latest right row at-or-before the left row (default);
      'forward'  — earliest right row at-or-after (the same union-window
                   plan scanned descending);
      'nearest'  — whichever of the two is closer in time, ties to the
                   backward match; both carries ride ONE shuffle (same
                   key partitioning, two per-partition sorts)."""
    if not keys:
        raise ValueError("asof_join needs at least one key column")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be backward | forward | nearest")
    payload_cols = payload_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    pay = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in payload_cols]
    )
    left_cols = [c for c in left.columns]
    row_type = (
        left.select(F.struct(*[F.col(c) for c in left_cols]).alias("__row"))
        .schema["__row"]
        .dataType.simpleString()
    )
    pay_type = right.select(pay.alias("__pay")).schema["__pay"].dataType.simpleString()
    r_side = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        pay.alias("__pay"),
        F.lit(None).cast(row_type).alias("__row"),
    )
    l_side = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(pay_type).alias("__pay"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__row"),
    )
    w_b = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__tag").asc(), F.col("__pay").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # descending time scan: the last right row carried onto a left row is
    # the EARLIEST right at-or-after it (tag 0 before tag 1 keeps equal-ts
    # inclusive; __pay asc keeps the greatest-payload tie-break)
    w_f = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").desc(), F.col("__tag").asc(), F.col("__pay").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    union = r_side.unionByName(l_side)
    if direction == "backward":
        carried = union.withColumn("__mb", F.last("__pay", ignorenulls=True).over(w_b))
    elif direction == "forward":
        carried = union.withColumn("__mf", F.last("__pay", ignorenulls=True).over(w_f))
    else:
        carried = union.withColumn(
            "__mb", F.last("__pay", ignorenulls=True).over(w_b)
        ).withColumn("__mf", F.last("__pay", ignorenulls=True).over(w_f))
    carried = carried.where(F.col("__tag") == 1)

    def epoch_us(col):
        # NTZ-safe epoch micros (cast("long") rejects TIMESTAMP_NTZ);
        # only differences are used, so any consistent epoch works
        return F.unix_micros(F.to_utc_timestamp(col, "UTC"))

    def gate(col, delta_us):
        if tolerance_seconds is None:
            return col
        return F.when(
            col.isNotNull() & (delta_us <= tolerance_seconds * 1_000_000), col
        )

    t_us = epoch_us(F.col("__t"))
    if direction == "backward":
        m = gate(F.col("__mb"), t_us - epoch_us(F.col("__mb").getField("__ts")))
    elif direction == "forward":
        m = gate(F.col("__mf"), epoch_us(F.col("__mf").getField("__ts")) - t_us)
    else:
        mb = gate(F.col("__mb"), t_us - epoch_us(F.col("__mb").getField("__ts")))
        mf = gate(F.col("__mf"), epoch_us(F.col("__mf").getField("__ts")) - t_us)
        db = t_us - epoch_us(mb.getField("__ts"))
        df_ = epoch_us(mf.getField("__ts")) - t_us
        m = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(db <= df_, mb)  # tie -> backward (pandas semantics)
            .otherwise(mf)
        )
    out_cols = [F.col("__row").getField(c).alias(c) for c in left_cols]
    out_cols += [
        m.getField(c).alias(f"{prefix}{c}") for c in payload_cols
    ]
    return carried.select(*out_cols)
