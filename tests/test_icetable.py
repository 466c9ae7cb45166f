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


def test_compact_and_expire(spark):
    """Maintenance actions: compaction rewrites the current snapshot into
    one file set per partition WITHOUT changing content; expire_snapshots
    then reclaims every data dir only pre-compaction snapshots referenced.
    Time travel to a kept snapshot keeps working; the expired one is gone."""
    import os

    import pytest

    from subgraph_isomorphism_pregel_spark.sources.icetable import (
        compact_table,
        expire_snapshots,
    )

    path = tempfile.mkdtemp(prefix="ice_maint_")
    c1 = synth_corpus(spark, n_repos=3, files_per_repo=20, seed=3)
    c2 = synth_corpus(spark, n_repos=3, files_per_repo=20, seed=4).withColumn(
        "repo", F.concat(F.lit("x/"), F.col("repo"))
    )
    write_table(c1, path, partition_by="lang")
    append_table(c2, path)

    before = read_table(spark, path)
    want = sorted((r["repo"], r["path"], r["content_sha"]) for r in before.collect())
    n_dirs_before = len(before.inputFiles())

    sid = compact_table(spark, path)
    assert sid == 3 and current_snapshot_id(path) == 3
    after = read_table(spark, path)
    got = sorted((r["repo"], r["path"], r["content_sha"]) for r in after.collect())
    assert got == want                      # content unchanged
    assert len(after.inputFiles()) < n_dirs_before  # fewer files
    # pre-compaction snapshot still time-travelable
    assert read_table(spark, path, snapshot_id=2).count() == before.count()

    # count the expirable partition dirs up front: removed_file_dirs must
    # equal exactly this (it would overcount if Spark's _SUCCESS markers
    # were tallied, the round-3 bug)
    referenced_now = {
        os.path.normpath(os.path.dirname(f.removeprefix("file:")))
        for f in read_table(spark, path).inputFiles()
    }
    data_root = os.path.join(path, "data")
    n_expirable = sum(
        1
        for sub in os.listdir(data_root)
        if os.path.isdir(os.path.join(data_root, sub))
        for part in os.listdir(os.path.join(data_root, sub))
        if os.path.isdir(os.path.join(data_root, sub, part))
        and os.path.join(data_root, sub, part) not in referenced_now
    )
    stats = expire_snapshots(path, keep_last=1)
    assert stats["kept"] == [3]
    assert stats["removed_snapshots"] == 2
    assert stats["removed_file_dirs"] == n_expirable > 0
    # current read still intact after reclaim, old snapshot gone
    assert read_table(spark, path).count() == len(want)
    # fully-expired staging dirs leave no empty shells behind: every
    # surviving data/sNNNNN-* dir still holds at least one partition dir
    for sub in os.listdir(data_root):
        subdir = os.path.join(data_root, sub)
        assert any(
            os.path.isdir(os.path.join(subdir, x)) for x in os.listdir(subdir)
        ), f"empty staging shell left behind: {subdir}"
    with pytest.raises(FileNotFoundError):
        read_table(spark, path, snapshot_id=2)
    # guard: cannot expire the current snapshot
    with pytest.raises(ValueError, match="current"):
        expire_snapshots(path, keep_last=0)


def test_expire_spares_concurrent_staging_dir(spark):
    """A data/<sub> staging dir that holds only marker files (a concurrent
    writer's freshly-created staging area, no partition dirs yet) must
    SURVIVE expire_snapshots — the empty-shell cleanup only removes a
    shell it emptied itself."""
    import os

    from subgraph_isomorphism_pregel_spark.sources.icetable import expire_snapshots

    path = tempfile.mkdtemp(prefix="ice_race_")
    c1 = synth_corpus(spark, n_repos=2, files_per_repo=10, seed=5)
    write_table(c1, path, partition_by="lang")
    append_table(synth_corpus(spark, n_repos=2, files_per_repo=10, seed=6), path)

    # simulate a concurrent writer mid-flight: staging dir + marker only
    staging = os.path.join(path, "data", "s99999-inflight")
    os.makedirs(staging)
    open(os.path.join(staging, "_SUCCESS"), "w").close()

    expire_snapshots(path, keep_last=1)
    assert os.path.isdir(staging), "expire removed a concurrent staging dir"
    assert os.path.exists(os.path.join(staging, "_SUCCESS"))
