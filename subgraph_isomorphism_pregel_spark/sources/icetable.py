"""Minimal Iceberg-style table format over parquet: snapshot manifests with
partition-level pruning and time travel.

The north-star input is "an Iceberg table of source-code repositories"; the
runtime has no Iceberg jars, so this module implements the two Iceberg
properties the engine actually relies on at 10^12-file scale, from scratch
over plain parquet files (public Iceberg spec concepts only):

- **snapshots**: every write/append creates an immutable numbered snapshot
  whose manifest lists exactly the data files visible in it; readers pin a
  snapshot, so a concurrent append never changes a running query's input
  (time travel = read an older snapshot id).
- **hidden partition pruning**: the manifest records each data file's
  partition value and row count; `read_table(..., partition_filter=...)`
  selects the matching files at PLANNING time — a pruned read never lists,
  opens, or footers the other files (cheaper than parquet row-group skipping,
  which still touches every file).

Layout:

    <path>/data/<snapshot>-<partition>-<i>.parquet   (partition col included)
    <path>/metadata/snap-00001.json                  {files: [...], parent}
    <path>/metadata/version-hint.text                current snapshot number

All JSON is tiny (file-level, not row-level); at real scale manifests shard
exactly like Iceberg's manifest lists — the reader API would not change.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _meta_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def _snap_path(path: str, sid: int) -> str:
    return os.path.join(_meta_dir(path), f"snap-{sid:05d}.json")


def current_snapshot_id(path: str) -> int:
    with open(os.path.join(_meta_dir(path), "version-hint.text")) as f:
        return int(f.read().strip())


def _load_snapshot(path: str, snapshot_id: int | None) -> dict:
    sid = current_snapshot_id(path) if snapshot_id is None else snapshot_id
    with open(_snap_path(path, sid)) as f:
        return json.load(f)


def _write_data_files(
    df: DataFrame, path: str, partition_by: str, sid: int
) -> list[dict]:
    """Write one parquet directory per partition value under data/ and
    return manifest entries (file path, partition value, row count)."""
    token = uuid.uuid4().hex[:8]
    staging = os.path.join(path, "data", f"s{sid:05d}-{token}")
    # one shuffle on the partition column -> one file set per value. Spark's
    # partitionBy drops the layout column from the data files, so it is
    # duplicated as __part for the directory layout and the ORIGINAL column
    # stays in-file (Iceberg keeps it in metadata; keeping it in-file lets a
    # pruned multi-directory read skip path parsing entirely)
    (
        df.withColumn("__part", F.col(partition_by).cast("string"))
        .repartition(F.col("__part"))
        .write.mode("overwrite")
        .partitionBy("__part")
        .parquet(staging)
    )
    spark = df.sparkSession
    entries = []
    for sub in sorted(os.listdir(staging)):
        if not sub.startswith("__part="):
            continue
        value = sub.split("=", 1)[1]
        fdir = os.path.join(staging, sub)
        n = spark.read.parquet(fdir).count()
        entries.append({"path": fdir, "partition": value, "rows": int(n)})
    return entries


def _commit(path: str, files: list[dict], partition_by: str, parent: int | None) -> int:
    sid = (parent or 0) + 1
    os.makedirs(_meta_dir(path), exist_ok=True)
    snap = {
        "snapshot_id": sid,
        "parent_id": parent,
        "partition_by": partition_by,
        "files": files,
        "total_rows": sum(f["rows"] for f in files),
    }
    with open(_snap_path(path, sid), "w") as f:
        json.dump(snap, f, indent=1)
    # the version hint is the last thing written: a crash before this line
    # leaves the previous snapshot current (atomic-enough for a local FS;
    # a real catalog does this with a CAS swap)
    with open(os.path.join(_meta_dir(path), "version-hint.text"), "w") as f:
        f.write(str(sid))
    return sid


def write_table(df: DataFrame, path: str, partition_by: str = "lang") -> int:
    """Create the table with snapshot 1 from df. Returns the snapshot id."""
    files = _write_data_files(df, path, partition_by, sid=1)
    return _commit(path, files, partition_by, parent=None)


def overwrite_table(df: DataFrame, path: str) -> int:
    """Replace the table contents as a NEW snapshot (previous snapshots
    stay readable via time travel until expire_snapshots reclaims them) —
    the commit primitive behind streaming MERGE/continuous aggregates."""
    cur = _load_snapshot(path, None)
    sid = cur["snapshot_id"] + 1
    new_files = _write_data_files(df, path, cur["partition_by"], sid=sid)
    return _commit(path, new_files, cur["partition_by"], cur["snapshot_id"])


def append_table(df: DataFrame, path: str) -> int:
    """Append df as a new snapshot (previous snapshots stay readable)."""
    cur = _load_snapshot(path, None)
    sid = cur["snapshot_id"] + 1
    new_files = _write_data_files(df, path, cur["partition_by"], sid=sid)
    return _commit(path, cur["files"] + new_files, cur["partition_by"], cur["snapshot_id"])


def read_table(
    spark: SparkSession,
    path: str,
    snapshot_id: int | None = None,
    partition_filter: str | list[str] | None = None,
) -> DataFrame:
    """Scan a snapshot; partition_filter prunes files at PLANNING time.

    The returned DataFrame reads ONLY the manifest-selected parquet
    directories — verify with df.inputFiles()."""
    snap = _load_snapshot(path, snapshot_id)
    files = snap["files"]
    if partition_filter is not None:
        wanted = (
            {partition_filter}
            if isinstance(partition_filter, str)
            else set(partition_filter)
        )
        files = [f for f in files if f["partition"] in wanted]
    if not files:
        raise ValueError(
            f"no data files match partition_filter={partition_filter!r} "
            f"in snapshot {snap['snapshot_id']}"
        )
    return spark.read.parquet(*[f["path"] for f in files])


def compact_table(spark: SparkSession, path: str) -> int:
    """Rewrite the CURRENT snapshot into one file set per partition value
    and commit it as a new snapshot — the Iceberg `rewrite_data_files`
    maintenance action. Appends fragment a partition across many small
    file sets (one per append); at 10^12-file scale unbounded smallness
    kills scan planning, so compaction is a first-class operation. Table
    CONTENT is unchanged (tests assert read equality); older snapshots
    still see the pre-compaction files until expired."""
    cur = _load_snapshot(path, None)
    df = read_table(spark, path)
    sid = cur["snapshot_id"] + 1
    files = _write_data_files(df, path, cur["partition_by"], sid=sid)
    return _commit(path, files, cur["partition_by"], cur["snapshot_id"])


def expire_snapshots(path: str, keep_last: int = 1) -> dict:
    """Drop all but the newest `keep_last` snapshots and DELETE data file
    sets no kept snapshot references — the Iceberg `expire_snapshots`
    action (append-only tables grow unreferenced files after compaction;
    storage is only reclaimed here, never by compaction itself). Returns
    {"kept": [...ids], "removed_snapshots": n, "removed_file_dirs": n}."""
    import shutil

    if keep_last < 1:
        raise ValueError(
            "expire_snapshots: keep_last must be >= 1 (the current snapshot "
            "can never be expired)"
        )
    cur = current_snapshot_id(path)
    all_sids = sorted(
        int(f[5:10])
        for f in os.listdir(_meta_dir(path))
        if f.startswith("snap-") and f.endswith(".json")
    )
    keep = set(all_sids[-keep_last:])
    if cur not in keep:
        raise ValueError("expire_snapshots: would expire the current snapshot")
    referenced = set()
    for sid in keep:
        referenced |= {f["path"] for f in _load_snapshot(path, sid)["files"]}
    removed_files = 0
    data_root = os.path.join(path, "data")
    for sub in sorted(os.listdir(data_root)):
        subdir = os.path.join(data_root, sub)
        if not os.path.isdir(subdir):
            continue
        removed_here = 0
        for part in sorted(os.listdir(subdir)):
            fdir = os.path.join(subdir, part)
            # skip Spark's write markers (_SUCCESS etc.) — only partition
            # DIRECTORIES are manifest-referenced data file sets
            if not os.path.isdir(fdir):
                continue
            if fdir not in referenced:
                shutil.rmtree(fdir, ignore_errors=True)
                removed_files += 1
                removed_here += 1
        # a staging dir whose every partition was expired is an empty
        # shell (just the marker files) — remove it outright. Only when
        # THIS expire call actually deleted a partition from it: a subdir
        # that was already partition-free may be a concurrent writer's
        # freshly-created staging dir that so far holds only marker files.
        if removed_here > 0 and not any(
            os.path.isdir(os.path.join(subdir, x)) for x in os.listdir(subdir)
        ):
            shutil.rmtree(subdir, ignore_errors=True)
    removed_snaps = 0
    for sid in all_sids:
        if sid not in keep:
            os.remove(_snap_path(path, sid))
            removed_snaps += 1
    return {
        "kept": sorted(keep),
        "removed_snapshots": removed_snaps,
        "removed_file_dirs": removed_files,
    }


def table_stats(path: str, snapshot_id: int | None = None) -> dict:
    """Manifest-only stats (no data read): rows per partition value."""
    snap = _load_snapshot(path, snapshot_id)
    per = {}
    for f in snap["files"]:
        per[f["partition"]] = per.get(f["partition"], 0) + f["rows"]
    return {
        "snapshot_id": snap["snapshot_id"],
        "parent_id": snap["parent_id"],
        "total_rows": snap["total_rows"],
        "rows_by_partition": per,
    }
