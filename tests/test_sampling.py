"""Deterministic sampling operators: stability under repartitioning is the
defining property — the same row must land in the same split/sample on any
cluster layout."""

import hashlib

import pytest
from pyspark.sql import functions as F

from subgraph_isomorphism_pregel_spark.operators.sampling import (
    frac_threshold,
    hash_split,
    hash_topk_per_group,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "fr"][i % 3], f"s{i % 4}") for i in range(600)]
    return spark.createDataFrame(rows, "doc_id long, lang string, source string")


def py_bucket(key, salt="v1"):
    return hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:8]


def test_hash_split_matches_python_and_proportions(docs):
    out = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", salt="v1").collect()}
    t_train, t_val = frac_threshold(0.9), frac_threshold(0.95)
    for i in range(600):
        b = py_bucket(i)
        want = "train" if b < t_train else ("val" if b < t_val else "test")
        assert out[i] == want, i
    n_train = sum(1 for v in out.values() if v == "train")
    assert 0.85 * 600 < n_train < 0.95 * 600


def test_hash_split_stable_under_repartition(docs):
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", salt="x").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(13, "lang"), "doc_id", salt="x").collect()
    }
    assert a == b
    # a different salt reshuffles assignments
    c = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", salt="y").collect()}
    assert a != c


def test_stratified_sample_edges(docs):
    kept = stratified_sample(
        docs, "lang", {"en": 1.0, "de": 0.0}, "doc_id", default_fraction=0.5, salt="v1"
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang.get("en") == 200  # f=1.0 keeps every row
    assert "de" not in by_lang  # f=0.0 keeps none
    assert 0.3 * 200 < by_lang.get("fr", 0) < 0.7 * 200  # default 0.5


def test_hash_topk_exact_quota_and_determinism(docs):
    out = hash_topk_per_group(docs, "source", "doc_id", 25, salt="v1")
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {f"s{i}": 25 for i in range(4)}
    again = hash_topk_per_group(
        docs.repartition(7), "source", "doc_id", 25, salt="v1"
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # quota larger than the group returns the whole group
    small = hash_topk_per_group(docs.where("doc_id < 8"), "source", "doc_id", 99)
    assert small.count() == 8


def test_bad_inputs(docs):
    with pytest.raises(ValueError):
        frac_threshold(1.5)
    with pytest.raises(ValueError):
        hash_topk_per_group(docs, "source", "doc_id", 0)
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", weights={"a": 0.0})


def test_temperature_mixture_upweights_rare_domains(spark):
    """T=0.5 pulls shares toward sqrt-proportional: the rare domain's keep
    RATE exceeds the common domain's, and realized counts track
    target * w_d / Σw within binomial noise."""
    import math

    from subgraph_isomorphism_pregel_spark.operators.sampling import (
        temperature_mixture,
    )

    rows = [(i, "big" if i < 1800 else "small") for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, dom string")
    out, rates = temperature_mixture(
        df, domain_col="dom", key_col="k", temperature=0.5, target=400, salt="t"
    )
    assert rates["small"] > rates["big"]
    got = {r[0]: r[1] for r in out.groupBy("dom").count().collect()}
    w = {d: math.floor(math.sqrt(n) * 1e6) for d, n in (("big", 1800), ("small", 200))}
    tot = sum(w.values())
    for d, n in (("big", 1800), ("small", 200)):
        expect = 400 * w[d] / tot
        assert abs(got[d] - expect) < 4 * math.sqrt(expect)


def test_temperature_mixture_t1_is_uniform_rate(spark):
    """T=1 weights are proportional to counts, so every domain keeps the
    same fraction target/total (integer-floored thresholds aside)."""
    from subgraph_isomorphism_pregel_spark.operators.sampling import (
        temperature_mixture,
    )

    rows = [(i, f"d{i % 3}") for i in range(600)]
    df = spark.createDataFrame(rows, "k long, dom string")
    _, rates = temperature_mixture(
        df, domain_col="dom", key_col="k", temperature=1.0, target=150, salt="u"
    )
    assert len(set(rates.values())) == 1


def test_temperature_mixture_caps_at_one_and_determinism(spark):
    from subgraph_isomorphism_pregel_spark.operators.sampling import (
        temperature_mixture,
    )

    rows = [(i, "tiny" if i < 5 else "big") for i in range(500)]
    df = spark.createDataFrame(rows, "k long, dom string")
    out1, rates = temperature_mixture(
        df, domain_col="dom", key_col="k", temperature=0.5, target=450, salt="v"
    )
    assert rates["tiny"] == 1.0  # capped: demanded share exceeds the domain
    out2, _ = temperature_mixture(
        df.repartition(16, "dom"), domain_col="dom", key_col="k",
        temperature=0.5, target=450, salt="v",
    )
    assert sorted(map(tuple, out1.collect())) == sorted(map(tuple, out2.collect()))


def test_temperature_mixture_rejects_bad_temperature(spark):
    import pytest as _pytest

    from subgraph_isomorphism_pregel_spark.operators.sampling import (
        temperature_mixture,
    )

    df = spark.createDataFrame([(1, "a")], "k long, dom string")
    with _pytest.raises(ValueError):
        temperature_mixture(df, domain_col="dom", key_col="k", temperature=0.0)


def test_shuffle_shards_sort_mode_is_balanced_permutation(spark):
    from subgraph_isomorphism_pregel_spark.operators.sampling import shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(103)], "k long")
    out = shuffle_shards(df, "k", 8, salt="s", mode="sort").collect()
    sizes = {}
    pairs = set()
    for r in out:
        sizes[r.shard] = sizes.get(r.shard, 0) + 1
        pairs.add((r.shard, r.rank_in_shard))
    assert len(pairs) == 103  # (shard, rank) is a bijection over rows
    assert max(sizes.values()) - min(sizes.values()) <= 1  # balanced
    # rank_in_shard is dense 0..size-1 per shard
    for s, n in sizes.items():
        assert {r for sh, r in pairs if sh == s} == set(range(n))


def test_shuffle_shards_python_oracle_and_determinism(spark):
    import hashlib

    from subgraph_isomorphism_pregel_spark.operators.sampling import shuffle_shards

    keys = list(range(60))
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    out = {
        r.k: (r.shard, r.rank_in_shard)
        for r in shuffle_shards(df, "k", 4, salt="z", mode="sort").collect()
    }
    order = sorted(keys, key=lambda k: (hashlib.md5(f"{k}z".encode()).hexdigest()[:8], k))
    want = {k: (i % 4, i // 4) for i, k in enumerate(order)}
    assert out == want
    out2 = {
        r.k: (r.shard, r.rank_in_shard)
        for r in shuffle_shards(df.repartition(16), "k", 4, salt="z", mode="sort").collect()
    }
    assert out2 == out


def test_shuffle_shards_hash_mode(spark):
    from subgraph_isomorphism_pregel_spark.operators.sampling import shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(200)], "k long")
    out = shuffle_shards(df, "k", 5, salt="h", mode="hash").collect()
    per = {}
    for r in out:
        per.setdefault(r.shard, []).append(r.rank_in_shard)
    assert set(per) <= set(range(5))
    for ranks in per.values():  # dense within each shard
        assert sorted(ranks) == list(range(len(ranks)))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        shuffle_shards(df, "k", 0)
    with _pytest.raises(ValueError):
        shuffle_shards(df, "k", 2, mode="nope")
