"""Deterministic sampling for training-data curation.

Every training pipeline over a 100 TB corpus needs (a) a stable
train/val/test split, (b) per-stratum down-sampling (e.g. keep 10% of the
dominant language, 100% of the rare ones), and (c) an exact per-group quota.
All three are implemented as pure codegen expressions over an md5 hex
prefix of the row key — no RNG state, no UDF, no shuffle for (a)/(b) and a
single window shuffle for (c) — so the same row lands in the same split on
any cluster size, any partitioning, and any engine that computes md5 (the
DuckDB oracles use the identical expression).

The hash bucket is the FIRST 8 HEX CHARS of md5(key || salt) compared as a
fixed-width lowercase hex string: a fraction f maps to the threshold
hex(floor(f * 16^8)). String comparison of fixed-width hex equals numeric
comparison, and stays engine-portable (no 64-bit unsigned parsing needed).

Scale notes: split/sample are narrow map-side projections (filter pushdown
applies when the split column is used as a predicate); quota sampling uses
one hash-partitioned window per group — groups are strata (languages,
sources), so skew equals stratum skew and the window never sees more than
one stratum per task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEX_SPACE = 16**8  # the bucket space: 8 hex chars


def _bucket(key: Column, salt: str) -> Column:
    """First 8 hex chars of md5(key || salt) — a uniform U[0, 16^8) draw."""
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8)


def frac_threshold(f: float) -> str:
    """fraction -> fixed-width lowercase hex threshold (keep iff bucket < t)."""
    if not 0.0 <= f <= 1.0:
        raise ValueError(f"fraction out of [0,1]: {f}")
    if f >= 1.0:
        return "g" * 8  # lexicographically above every hex bucket: keep all
    return format(int(f * HEX_SPACE), "08x")

def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Append a deterministic `split` column by hash bucketing on key_col.

    weights: ordered {name: weight}; normalized to sum 1. A row's split is
    decided by which cumulative-threshold interval its bucket falls in, so
    adding a later split never reassigns earlier rows (stable splits under
    re-runs with the same weights prefix)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    b = _bucket(F.col(key_col), salt)
    cum = 0.0
    expr = None
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = b < F.lit(frac_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows.

    fractions: {stratum value: keep fraction}; strata not listed keep
    default_fraction. Same key + salt => same keep decision everywhere."""
    b = _bucket(F.col(key_col), salt)
    thr = None
    for val, f in fractions.items():
        cond = F.col(strata_col) == F.lit(val)
        t = F.lit(frac_threshold(f))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = F.lit(frac_threshold(default_fraction)) if thr is None else thr.otherwise(
        F.lit(frac_threshold(default_fraction))
    )
    return df.where(b < thr)


def hash_topk_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, chosen by hash order.

    A deterministic 'reservoir': rank rows inside each group by their hash
    bucket (ties broken by the key itself) and keep rank <= k. One window
    shuffle on group_col."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    b = _bucket(F.col(key_col), salt)
    return (
        df.withColumn("__b", b)
        .withColumn("sample_rank", F.row_number().over(
            Window.partitionBy(group_col).orderBy(F.col("__b").asc(), F.col(key_col).asc())
        ))
        .where(F.col("sample_rank") <= k)
        .drop("__b")
    )


def temperature_mixture(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    temperature: float = 0.5,
    target: int = 1000,
    salt: str = "",
) -> tuple[DataFrame, dict]:
    """Temperature-scaled domain mixture sampling — the pre-training
    data-mixing step: domain d with n_d rows gets weight n_d^T (T < 1
    upweights rare domains, T=1 is proportional), and a deterministic
    per-domain keep rate r_d = min(1, target * w_d / (Σw * n_d)) is
    applied by the stratified hash sampler. Returns (sampled df, rates).

    Engine-exact by construction: weights are floor(n^T * 1e6) INTEGERS
    (for T=0.5 computed via the correctly-rounded sqrt, so any IEEE
    engine agrees bit-for-bit), the total is an exact integer sum
    (order-free), and each threshold is one integer division
    (16^8 * target * w_d) // (total * n_d) — the float handed to
    frac_threshold is threshold/2^32, exact in a double because the
    denominator is a power of two, so int(f * 16^8) round-trips the
    integer. No float is ever summed or compared across engines.

    The per-domain count collect is metadata, not data: domains are few
    by definition (languages, sources); at 100 TB it is one map-side-
    combined groupBy of a handful of rows.
    """
    import math

    if temperature <= 0:
        raise ValueError("temperature must be positive")
    counts = {
        r[0]: r[1] for r in df.groupBy(domain_col).count().collect()
    }
    if not counts:
        return df.where(F.lit(False)), {}
    w = {
        d: math.floor(
            (math.sqrt(n) if temperature == 0.5 else float(n) ** temperature)
            * 1_000_000
        )
        for d, n in counts.items()
    }
    total = sum(w.values())
    rates = {}
    for d in sorted(counts):
        thr = min(HEX_SPACE, (HEX_SPACE * target * w[d]) // (total * counts[d]))
        rates[d] = thr / HEX_SPACE
    return stratified_sample(df, domain_col, rates, key_col, salt=salt), rates


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "",
    mode: str = "sort",
) -> DataFrame:
    """Deterministic corpus shuffle + shard assignment — the training
    export step after packing: every row gets (shard, rank_in_shard) for a
    seeded global permutation, so the written shards are reproducible on
    any cluster and re-runs resume the same order.

    mode='sort': rank rows by the md5 bucket (ties broken by key), shard
    round-robin over the global rank — a TRUE permutation with balanced
    shard sizes (|sizes| differ by at most 1). Costs one global sort; at
    100 TB use it per-partition-group or prefer mode='hash'.
    mode='hash': shard = bucket mod n_shards, rank by bucket within the
    shard via one window — no total order across shards (shard sizes are
    binomial, not exact), but no global sort either: the scale path.

    Both modes are pure column expressions + one window; the same
    construction is ANSI-SQL (row_number over the same keys).
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    if mode not in ("sort", "hash"):
        raise ValueError("mode must be 'sort' or 'hash'")
    b = _bucket(F.col(key_col), salt)
    if mode == "sort":
        w = Window.orderBy(b, F.col(key_col))
        rank = F.row_number().over(w) - 1
        return df.select(
            "*",
            (rank % n_shards).alias("shard"),
            (rank / n_shards).cast("long").alias("rank_in_shard"),
        )
    shard = (
        F.conv(F.substring(b, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    w = Window.partitionBy(shard).orderBy(b, F.col(key_col))
    return df.select(
        "*",
        shard.alias("shard"),
        (F.row_number().over(w) - 1).cast("long").alias("rank_in_shard"),
    )
