"""Bucketed warehouse tables: same-key same-count equi-joins plan with
zero shuffle Exchanges, and results match the unbucketed join exactly."""

import pytest
from pyspark.sql import functions as F

from subgraph_isomorphism_pregel_spark.sources.bucketed import (
    shuffle_exchange_count,
    write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_shuffle_free(spark, tmp_path, no_broadcast):
    left = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("a")
    )
    right = spark.range(0, 500, 2).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("b")
    )
    bl = write_bucketed(left, "bkt_left", "k", 8, str(tmp_path / "l"))
    br = write_bucketed(right, "bkt_right", "k", 8, str(tmp_path / "r"))

    joined = bl.join(br, "k").select("k", "a", "b")
    assert shuffle_exchange_count(joined) == 0  # co-located by layout

    plain = left.join(right, "k").select("k", "a", "b")
    assert shuffle_exchange_count(plain) >= 1  # the shuffle bucketing buys off

    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, plain.collect())
    )

    # aggregation on the bucket key also rides the layout: no re-shuffle
    agg = bl.groupBy("k").agg(F.sum("a").alias("s"))
    assert shuffle_exchange_count(agg) == 0

    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_mismatched_bucket_counts_still_correct(spark, tmp_path, no_broadcast):
    """Different bucket counts cannot co-locate — Spark must reintroduce a
    shuffle on (at least) one side, and results stay exact."""
    left = spark.range(0, 200).select(F.col("id").alias("k"))
    right = spark.range(0, 200, 3).select(F.col("id").alias("k"))
    bl = write_bucketed(left, "bkt_l8", "k", 8, str(tmp_path / "l8"))
    br = write_bucketed(right, "bkt_r4", "k", 4, str(tmp_path / "r4"))
    joined = bl.join(br, "k")
    assert shuffle_exchange_count(joined) >= 1
    assert joined.count() == 67  # ceil(200/3)
    spark.sql("DROP TABLE IF EXISTS bkt_l8")
    spark.sql("DROP TABLE IF EXISTS bkt_r4")
