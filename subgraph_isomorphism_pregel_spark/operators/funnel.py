"""Behavioral event-sequence analytics over the events table: ordered
funnel conversion, the first-order Markov transition matrix of event
types, and retention cohorts.

These are the product-analytics counterparts of the reference's fixed
query set — the same "declare the pattern, let the engine pick the
plan" idea the sketch-tree matcher applies to graphs, applied to a
user's time-ordered event sequence (reference analog: the staged
matching order of /root/reference/src/SItypes/SIQuery.h — a funnel IS a
path query over the per-user timeline).

Spark shapes (all pure codegen, no Python in the hot path):

  funnel       — one chained min-timestamp aggregation per step: step i
                 joins step i-1's per-user first-completion time and
                 takes min(ts) past it. Every join and aggregate hashes
                 on the SAME user key, so AQE reuses one exchange; the
                 per-step results are tiny (<= |users| rows) and the
                 final counts collapse to k rows via a unioned aggregate.
  transitions  — one lag() window partitioned by user (single shuffle),
                 then a (prev, next) count and a broadcast-joined
                 per-prev total for row-normalized probabilities.
  retention    — distinct (user, day) activity, the per-user min day
                 (cohort), and a (cohort, offset) distinct-user count —
                 three aggregations, all keyed by user then cohort.

Scale notes: funnels and retention are bounded by |users| after the
first aggregate, never by |events|; the transition matrix is bounded by
|event_type|^2. The only |events|-sized shuffle in the module is the
single user-keyed window in `markov_transitions` (unavoidable: order
within user is the semantics). Determinism: transition ties at equal
timestamps break on event_id, and all rates/probabilities are rounded
to 6dp before output (the engine-independence convention)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DAY_US = 86_400 * 1_000_000


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """-> (step_no, step, users, conv_r): how many users completed each
    prefix of `steps` IN ORDER (strictly increasing timestamps), and the
    conversion rate vs step 1. A user completes step i at the earliest
    event of type steps[i] that is strictly after their step i-1
    completion time."""
    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(type_col).alias("et"),
    )
    per_step = []  # per-user first-completion DataFrames, one per step
    prev = None
    for st in steps:
        cur = ev.where(F.col("et") == st).select("u", "t")
        if prev is not None:
            cur = cur.join(prev, "u").where(F.col("t") > F.col("t0")).select("u", "t")
        done = cur.groupBy("u").agg(F.min("t").alias("t0"))
        per_step.append(done)
        prev = done
    counts = [
        d.agg(F.count("*").alias("users")).select(
            F.lit(i + 1).alias("step_no"), F.lit(st).alias("step"), "users"
        )
        for i, (st, d) in enumerate(zip(steps, per_step))
    ]
    out = reduce(DataFrame.unionAll, counts)
    w = Window.orderBy("step_no").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return out.select(
        "step_no",
        "step",
        "users",
        # try_divide: an empty step 1 yields a NULL rate, not a div-0 error
        F.round(
            F.try_divide(F.col("users").cast("double"), F.first("users").over(w)), 6
        ).alias("conv_r"),
    ).orderBy("step_no")


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """-> (prev_type, next_type, n, prob_r): the first-order Markov
    transition matrix of event types along each user's time-ordered
    event sequence (ties on timestamp break by event id). prob_r is the
    row-normalized transition probability, rounded to 6dp."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    seq = events.select(
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    cnt = seq.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    tot = cnt.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return (
        cnt.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.col("tot"), 6).alias("prob_r"),
        )
        .orderBy("prev_type", "next_type")
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """-> (cohort_day, offset_day, users): classic retention triangle.
    cohort_day = the epoch-day of a user's FIRST event; a user is
    retained at offset d if they have any event on cohort_day + d.
    Day ids are integer epoch days (UTC), the engine-independent form."""
    act = events.select(
        F.col(user_col).alias("u"),
        (F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(_DAY_US))
        .cast("long")
        .alias("day"),
    ).distinct()
    cohort = act.groupBy("u").agg(F.min("day").alias("cohort_day"))
    return (
        act.join(cohort, "u")
        .select("cohort_day", (F.col("day") - F.col("cohort_day")).alias("offset_day"), "u")
        .groupBy("cohort_day", "offset_day")
        .agg(F.count_distinct("u").alias("users"))
        .orderBy("cohort_day", "offset_day")
    )
