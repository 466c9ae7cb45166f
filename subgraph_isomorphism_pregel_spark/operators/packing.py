"""Deterministic sequence packing for LLM training-data preparation.

Pre-training pipelines pack variable-length documents into fixed-capacity
context windows ("bins") so GPU batches waste no tokens.  The classic
streaming heuristic is NEXT-FIT: walk the documents in a fixed order and
append each one to the current bin unless it would overflow, in which case
a fresh bin is opened.  A document longer than the capacity gets a bin of
its own (downstream tokenizers truncate it).

Determinism and scale come from the same trick the sampling operators use
(`sampling.py`): documents are assigned to a SHARD by an md5 hex bucket of
their id, and packed in (bucket, doc_id) order *within* the shard.  Shards
are the unit of parallelism — next-fit is inherently sequential, but only
within a shard, so a 100 TB corpus packs with one `applyInPandas` over
`n_shards` independent groups (set n_shards ~ a few × executor cores; each
shard streams one Arrow batch).  The per-shard loop is vectorized: a numpy
cumulative sum plus one `searchsorted` per BIN (not per row), so Python
work is O(#bins log n), never per-row.

The same (shard, order, next-fit) contract is expressible in ANSI SQL as a
per-shard recursive CTE, which is how the driver's DuckDB oracle checks it
bit-for-bit (see __spark_entry__._seq_pack_sql).

Reference analog: none — the reference engine has no corpus tooling; this
extends the data-pipeline surface alongside dedup/sampling (SURVEY §6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import tokens

_OUT_SCHEMA = (
    "doc_id long, shard int, bin long, pos int, n_tokens long"
)


def _bucket_hex(col, salt: str):
    return F.substring(F.md5(F.concat(F.col(col).cast("string"), F.lit(salt))), 1, 8)


def _pack_shard(pdf: pd.DataFrame, capacity: int) -> pd.DataFrame:
    """Next-fit over one shard, already restricted to one group by Spark.

    Sorts by (bucket, doc_id), then finds bin boundaries with one
    searchsorted per bin over the token-count cumsum."""
    pdf = pdf.sort_values(["bucket", "doc_id"], kind="mergesort").reset_index(drop=True)
    n = pdf["n_tokens"].to_numpy(dtype=np.int64)
    cs = np.cumsum(n)
    m = len(n)
    bins = np.empty(m, dtype=np.int64)
    pos = np.empty(m, dtype=np.int32)
    start, basis, b = 0, 0, 0
    while start < m:
        j = int(np.searchsorted(cs, basis + capacity, side="right"))
        if j <= start:  # oversize document: its own bin
            j = start + 1
        bins[start:j] = b
        pos[start:j] = np.arange(j - start, dtype=np.int32)
        basis = int(cs[j - 1])
        start, b = j, b + 1
    out = pdf[["doc_id", "shard", "n_tokens"]].copy()
    out["bin"] = bins
    out["pos"] = pos
    return out[["doc_id", "shard", "bin", "pos", "n_tokens"]]


def pack_documents(
    docs: DataFrame,
    capacity: int = 512,
    n_shards: int = 8,
    salt: str = "",
    count_col: str | None = None,
) -> DataFrame:
    """(doc_id, shard, bin, pos, n_tokens) — deterministic next-fit packing.

    `capacity` is the context-window token budget per bin; `count_col`
    names a precomputed token-count column (defaults to whitespace tokens
    of `text`).  One shuffle (the shard groupBy); everything before it is
    narrow codegen, everything inside it is Arrow-batched numpy.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive: {capacity}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: {n_shards}")
    bucket = _bucket_hex("doc_id", salt)
    n_tok = (
        F.col(count_col).cast("long")
        if count_col
        else F.size(tokens("text")).cast("long")
    )
    keyed = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        bucket.alias("bucket"),
        (F.conv(bucket, 16, 10).cast("long") % n_shards).cast("int").alias("shard"),
        n_tok.alias("n_tokens"),
    )
    return keyed.groupBy("shard").applyInPandas(
        lambda pdf: _pack_shard(pdf, capacity), _OUT_SCHEMA
    )


def packing_efficiency(packed: DataFrame, capacity: int) -> DataFrame:
    """One row per shard: bins used, token fill ratio vs capacity*bins —
    the waste metric a packing job reports."""
    return (
        packed.groupBy("shard")
        .agg(
            (F.max("bin") + 1).alias("n_bins"),
            F.sum("n_tokens").alias("tokens"),
        )
        .withColumn(
            "fill_ratio",
            F.round(F.col("tokens") / (F.col("n_bins") * F.lit(capacity)), 6),
        )
        .orderBy("shard")
    )
