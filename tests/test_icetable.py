"""Iceberg-style table layer: snapshot isolation / time travel and
planning-time partition pruning (SURVEY's Iceberg-source promise; verified
via inputFiles — a pruned read must not touch other partitions' files)."""

import tempfile

from pyspark.sql import functions as F

from subgraph_isomorphism_pregel_spark.sources.corpus import synth_corpus, verify_sha
from subgraph_isomorphism_pregel_spark.sources.icetable import (
    append_table,
    current_snapshot_id,
    read_table,
    table_stats,
    write_table,
)


def test_snapshot_write_read_roundtrip(spark):
    path = tempfile.mkdtemp(prefix="ice_")
    corpus = synth_corpus(spark, n_repos=4, files_per_repo=25, seed=1)
    sid = write_table(corpus, path, partition_by="lang")
    assert sid == 1 and current_snapshot_id(path) == 1

    back = read_table(spark, path)
    assert back.count() == 100
    assert set(back.columns) == set(corpus.columns)
    # the per-row invariant survives the table round trip
    assert verify_sha(back) == 0

    # append -> snapshot 2 sees old+new rows; snapshot 1 is UNCHANGED
    extra = synth_corpus(spark, n_repos=2, files_per_repo=25, seed=9)
    sid2 = append_table(extra, path)
    assert sid2 == 2
    assert read_table(spark, path).count() == 150
    assert read_table(spark, path, snapshot_id=1).count() == 100

    stats = table_stats(path)
    assert stats["total_rows"] == 150 and stats["parent_id"] == 1
    assert sum(stats["rows_by_partition"].values()) == 150


def test_partition_pruning_at_planning_time(spark):
    path = tempfile.mkdtemp(prefix="ice_")
    corpus = synth_corpus(spark, n_repos=4, files_per_repo=25, seed=1)
    write_table(corpus, path, partition_by="lang")

    pruned = read_table(spark, path, partition_filter="py")
    # correctness: exactly the py rows
    want = corpus.where(F.col("lang") == "py").count()
    assert pruned.count() == want > 0
    assert pruned.where(F.col("lang") != "py").count() == 0
    # the prune happened at planning time: no non-py file is even listed
    assert all("__part=py" in f for f in pruned.inputFiles())

    full = read_table(spark, path)
    assert len(set(full.inputFiles())) > len(set(pruned.inputFiles()))
