"""Structured Streaming: availableNow drain of the events parquet must equal
the batch aggregation (watermark + tumbling window plumbing)."""

from subgraph_isomorphism_pregel_spark.streaming.windowed import (
    run_availablenow,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_equals_batch(spark):
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in windowed_counts(batch).collect()
    }
    got_df = run_availablenow(spark, f"{SF_DIR}/events.parquet", out_table="t_stream_counts")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in got_df.collect()
    }
    assert got == want
    assert len(got) > 0
