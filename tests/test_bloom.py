"""Bloom filter: no false negatives, reproducible false positives, python
replay of the bit positions."""

import hashlib

import pytest
from pyspark.sql import functions as F

from subgraph_isomorphism_pregel_spark.operators.bloom import bloom_build, bloom_probe


def py_positions(key, k, n_bits):
    return {
        int(hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:15], 16) % n_bits
        for i in range(k)
    }


def test_bloom_membership_and_replay(spark):
    built_keys = list(range(0, 200))
    probe_keys = list(range(0, 400))
    build = spark.createDataFrame([(x,) for x in built_keys], "doc_id long")
    probe = spark.createDataFrame([(x,) for x in probe_keys], "doc_id long")
    n_bits, k = 1024, 3
    bits = bloom_build(build, "doc_id", n_bits=n_bits, k_hashes=k)
    got_bits = {r["pos"] for r in bits.collect()}
    want_bits = set().union(*[py_positions(x, k, n_bits) for x in built_keys])
    assert got_bits == want_bits
    got = {
        r["doc_id"]: r["maybe_present"]
        for r in bloom_probe(bits, probe, "doc_id", n_bits=n_bits, k_hashes=k).collect()
    }
    # exact python replay
    for x in probe_keys:
        assert got[x] == py_positions(x, k, n_bits).issubset(want_bits), x
    # no false negatives
    assert all(got[x] for x in built_keys)
    # tight sizing (1024 bits / 200 keys * 3 hashes) must produce SOME false
    # positives and SOME true negatives among the 200 unseen keys
    unseen = [x for x in probe_keys if x >= 200]
    fp = sum(1 for x in unseen if got[x])
    assert 0 < fp < len(unseen)


def test_bloom_duplicate_probe_keys_no_false_negative(spark):
    """A probe key appearing m times must still read maybe_present=True when
    it is in the built set (grouping the exploded rows without a distinct
    would count m*k hits != k and report a present key absent)."""
    build = spark.createDataFrame([(7,), (9,)], "doc_id long")
    probe = spark.createDataFrame([(7,), (7,), (7,), (9,), (1,)], "doc_id long")
    n_bits, k = 1024, 3
    bits = bloom_build(build, "doc_id", n_bits=n_bits, k_hashes=k)
    rows = bloom_probe(bits, probe, "doc_id", n_bits=n_bits, k_hashes=k).collect()
    assert len(rows) == 5  # every probe row comes back, duplicates included
    by_key = {}
    for r in rows:
        by_key.setdefault(r["doc_id"], set()).add(r["maybe_present"])
    assert by_key[7] == {True} and by_key[9] == {True}
    want_bits = {p for x in (7, 9) for p in py_positions(x, k, n_bits)}
    assert by_key[1] == {py_positions(1, k, n_bits).issubset(want_bits)}


def test_bloom_bad_inputs(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        bloom_build(df, "doc_id", n_bits=1)
    with pytest.raises(ValueError):
        bloom_build(df, "doc_id", k_hashes=0)
