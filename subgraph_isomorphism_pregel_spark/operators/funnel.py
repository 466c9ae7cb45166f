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

  funnel       — ONE user-keyed aggregation for the whole funnel: the
                 user's funnel-relevant events are sorted in-row
                 (array_sort over (ts, type) structs) and a single
                 codegen array fold (F.aggregate + F.transform) walks
                 them once, greedily filling the k first-completion
                 times — the greedy frontier fill is exactly the
                 chained min-after-previous semantics. Per-step counts
                 then collapse from k·|users| positions in one tiny
                 aggregate. One |events|-sized shuffle TOTAL regardless
                 of funnel length (the previous shape chained k
                 join+agg rounds whose plan grew quadratically with k).
  transitions  — one lag() window partitioned by user (single shuffle),
                 then a (prev, next) count and a broadcast-joined
                 per-prev total for row-normalized probabilities.
  retention    — distinct (user, day) activity, the per-user min day
                 (cohort), and a (cohort, offset) distinct-user count —
                 three aggregations, all keyed by user then cohort.

Scale notes: funnels and retention are bounded by |users| after the
first aggregate, never by |events|; the transition matrix is bounded by
|event_type|^2. The |events|-sized shuffles are one user-keyed
aggregation in `funnel` (funnel-relevant events only — the collected
per-user list is bounded by a user's matching events, the standard
sequence-analytics contract) and the single user-keyed window in
`markov_transitions` (unavoidable: order within user is the semantics). Determinism: transition ties at equal
timestamps break on event_id, and all rates/probabilities are rounded
to 6dp before output (the engine-independence convention)."""

from __future__ import annotations

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
    spark = events.sparkSession
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(type_col).alias("et"),
    ).where(F.col("et").isin(*set(steps)) & F.col("t").isNotNull())
    t_type = ev.schema["t"].dataType
    steps_lit = F.array(*[F.lit(s) for s in steps])
    init = F.array(*[F.lit(None).cast(t_type) for _ in steps])

    def advance(acc, x):
        # one event advances at most the frontier step: position j fills
        # only when it is empty, the event type matches steps[j], and
        # step j-1 was ALREADY complete strictly before this event (the
        # old acc gates, so a single event can never fill two positions;
        # F.get is 0-based and NULL-safe at j-1 = -1)
        def cell(c, j):
            prev = F.get(acc, j - 1)
            prev_ok = (j == F.lit(0)) | (prev.isNotNull() & (x["t"] > prev))
            fill = c.isNull() & (x["et"] == F.get(steps_lit, j)) & prev_ok
            return F.when(fill, x["t"]).otherwise(c)

        return F.transform(acc, cell)

    # the greedy forward pass over the time-sorted events computes exactly
    # the chained semantics: t_j = min ts of a steps[j] event strictly
    # after t_{j-1} (the first matching event past the frontier IS that
    # min in sorted order; timestamp ties lose to strict >, so the
    # (t, et) sort tiebreak never changes the result)
    done = (
        ev.groupBy("u")
        .agg(F.array_sort(F.collect_list(F.struct("t", "et"))).alias("seq"))
        .select(F.aggregate("seq", init, advance).alias("d"))
        .select(F.posexplode("d").alias("idx", "t0"))
        .groupBy("idx")
        .agg(F.count("t0").alias("users"))
    )
    base = spark.createDataFrame(
        [(i, i + 1, s) for i, s in enumerate(steps)],
        "idx int, step_no int, step string",
    )
    out = (
        base.join(done, "idx", "left")
        .select(
            "step_no",
            "step",
            F.coalesce(F.col("users"), F.lit(0)).cast("long").alias("users"),
        )
    )
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
