"""Warehouse-level bucketed table layout — the relational face of the
kernel's pid-bucketed zero-Exchange cogroup (operators/pregel.py:36-40):
two tables written with the SAME bucket count on the SAME key equi-join
with NO Exchange on either side, because every bucket file pair is
co-located by construction. This is the co-location story for repeated
100 TB fact-to-fact joins (orders ⋈ lineitem every run): pay the shuffle
ONCE at write time, never again at read time.

The reference ships the analogous layout step as its hash re-partition /
sync_graph phase (/root/reference/src/utils/communication.h all-to-all);
here Catalyst consumes the bucket metadata declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    buckets: int,
    path: str,
    sort: bool = True,
) -> DataFrame:
    """Persist `df` as a bucketed (and optionally sort-within-bucket)
    warehouse table and return the table-backed frame. Joins between two
    tables written with the same (key-count, buckets) plan with zero
    Exchanges; sorted buckets additionally let SortMergeJoin skip its
    per-task sort."""
    w = df.write.bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.option("path", path).mode("overwrite").saveAsTable(name)
    return df.sparkSession.table(name)


def shuffle_exchange_count(df: DataFrame) -> int:
    """# of SHUFFLE Exchange operators ("Exchange hashpartitioning"/
    "Exchange rangepartitioning") in the physical plan — the assertable
    shuffle count. BroadcastExchange is deliberately not counted: a
    broadcast also avoids the shuffle but proves nothing about bucket
    co-location, so plan tests disable auto-broadcast first."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
