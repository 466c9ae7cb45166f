"""Distributed Bloom filter — membership sketch over a key column.

The reference carries a vestigial Bloom filter utility
(/root/reference/src/utils — unused dead code); this is the live,
distributed form: build a bit-set over one table's keys, probe another
table for "possibly present" membership (the join-pruning / dedup-probe
sketch). Deterministic and engine-exact: bit positions are
md5("{i}:{key}") hex prefixes parsed to int64 mod n_bits — Spark's
conv(hex,16,10), DuckDB's ('0x'||hex)::BIGINT and python's int(hex,16)
all agree bit-for-bit, so false POSITIVES (not just the guarantee) are
reproducible and the sketch is hash-gateable.

Representation: the filter is a DataFrame of DISTINCT set bit positions —
sparse, mergeable by union, and at most n_bits rows regardless of input
size, so it broadcasts into the probe join. Build is one
explode + distinct; probe is one broadcast left join + count-of-k per
key. No UDFs anywhere; everything is codegen expressions.

Sizing: false-positive rate ~ (1 - e^{-k*n/m})^k; pick n_bits ~ 10x
distinct keys for ~1% at k=4. n_bits bounds the broadcast (8 bytes * set
bits); past ~10^8 bits switch the probe join from broadcast to shuffle —
the same DataFrame works for both, Catalyst/AQE picks."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _position(col, i: int, n_bits: int):
    h = F.md5(F.concat_ws(":", F.lit(i), col.cast("string")))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % n_bits).alias("pos")


def bloom_build(
    df: DataFrame, key_col: str, n_bits: int = 2**20, k_hashes: int = 4
) -> DataFrame:
    """-> single-column (pos long) DataFrame of set bit positions."""
    if n_bits < 2 or k_hashes < 1:
        raise ValueError("need n_bits >= 2 and k_hashes >= 1")
    c = F.col(key_col)
    return (
        df.select(
            F.explode(
                F.array(*[_position(c, i, n_bits) for i in range(k_hashes)])
            ).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    bits: DataFrame,
    probe: DataFrame,
    key_col: str,
    n_bits: int = 2**20,
    k_hashes: int = 4,
) -> DataFrame:
    """-> probe rows + `maybe_present` boolean (true = possibly in the
    built set — no false negatives; false = definitely absent). Use the
    same n_bits/k_hashes as the build."""
    c = F.col(key_col)
    # probe DISTINCT keys: grouping the exploded rows of a key that appears
    # m times would compare m*k_hashes hits against k_hashes and report a
    # present key absent — a false NEGATIVE, the one error class a Bloom
    # filter must never make
    exploded = probe.select(key_col).distinct().select(
        key_col,
        F.posexplode(
            F.array(*[_position(c, i, n_bits) for i in range(k_hashes)])
        ).alias("i", "pos"),
    )
    hit = exploded.join(
        F.broadcast(bits.withColumn("__set", F.lit(1))), "pos", "left"
    )
    agg = hit.groupBy(key_col).agg(
        (F.count("__set") == k_hashes).alias("maybe_present")
    )
    return probe.join(agg, key_col)
