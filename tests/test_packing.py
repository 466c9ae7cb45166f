import hashlib

import pytest
from pyspark.sql import functions as F

from subgraph_isomorphism_pregel_spark.operators.packing import (
    _pack_shard,
    pack_documents,
    packing_efficiency,
)


def ref_next_fit(sizes, capacity):
    """Row-at-a-time next-fit oracle."""
    bins, cur, b = [], 0, -1
    for n in sizes:
        if b < 0 or cur + n > capacity:
            b, cur = b + 1, 0
        bins.append(b)
        cur += n
    return bins


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pack_shard_matches_row_oracle():
    import pandas as pd

    sizes = [3, 4, 4, 1, 9, 2, 2, 2, 5, 1, 10, 1]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(sizes)),
            "bucket": [format(i, "08x") for i in range(len(sizes))],
            "shard": 0,
            "n_tokens": sizes,
        }
    )
    out = _pack_shard(pdf, capacity=8)
    assert list(out["bin"]) == ref_next_fit(sizes, 8)
    # pos restarts at 0 inside every bin
    for b in set(out["bin"]):
        sub = out[out["bin"] == b]
        assert list(sub["pos"]) == list(range(len(sub)))


def test_pack_shard_oversize_gets_own_bin():
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "bucket": ["a", "b", "c"],
            "shard": 0,
            "n_tokens": [100, 2, 100],
        }
    )
    out = _pack_shard(pdf, capacity=10)
    assert list(out["bin"]) == [0, 1, 2]


def test_pack_documents_deterministic_and_capacity(spark):
    texts = [" ".join(["w"] * (3 + (i * 7) % 11)) for i in range(60)]
    docs = _docs_df(spark, texts)
    a = pack_documents(docs, capacity=16, n_shards=4, salt="s").orderBy("doc_id")
    b = pack_documents(
        docs.repartition(7), capacity=16, n_shards=4, salt="s"
    ).orderBy("doc_id")
    ra, rb = a.collect(), b.collect()
    assert ra == rb  # partitioning-invariant
    # every multi-doc bin respects the capacity
    fills = (
        pack_documents(docs, capacity=16, n_shards=4, salt="s")
        .groupBy("shard", "bin")
        .agg(F.sum("n_tokens").alias("tot"), F.count("*").alias("k"))
        .collect()
    )
    for r in fills:
        assert r["tot"] <= 16 or r["k"] == 1
    # shard assignment matches the md5 contract
    for r in ra:
        h = int(hashlib.md5(f"{r['doc_id']}s".encode()).hexdigest()[:8], 16)
        assert r["shard"] == h % 4


def test_pack_matches_python_oracle_per_shard(spark):
    texts = [" ".join(["w"] * (1 + (i * 5) % 9)) for i in range(40)]
    docs = _docs_df(spark, texts)
    rows = pack_documents(docs, capacity=12, n_shards=2, salt="x").collect()
    for s in (0, 1):
        sh = [r for r in rows if r["shard"] == s]
        sh.sort(
            key=lambda r: (
                hashlib.md5(f"{r['doc_id']}x".encode()).hexdigest()[:8],
                r["doc_id"],
            )
        )
        assert [r["bin"] for r in sh] == ref_next_fit(
            [r["n_tokens"] for r in sh], 12
        )


def test_packing_efficiency(spark):
    docs = _docs_df(spark, ["w w w"] * 10)
    packed = pack_documents(docs, capacity=6, n_shards=1, salt="")
    eff = packing_efficiency(packed, 6).collect()
    assert len(eff) == 1
    assert eff[0]["n_bins"] == 5 and eff[0]["fill_ratio"] == 1.0


def test_pack_rejects_bad_capacity(spark):
    with pytest.raises(ValueError):
        pack_documents(_docs_df(spark, ["a"]), capacity=0)


def test_pack_rejects_bad_shards(spark):
    with pytest.raises(ValueError):
        pack_documents(_docs_df(spark, ["a"]), capacity=8, n_shards=0)
