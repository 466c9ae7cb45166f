"""HLL / count-min sketches vs pure-Python recomputations and DuckDB twins."""

import hashlib
import math

import duckdb
import pytest

from subgraph_isomorphism_pregel_spark.operators.sketches import (
    cms_heavy_hitters,
    hll_distinct,
    hll_params,
    hll_sql,
)


def py_hll(values, p):
    m, W, R, num = hll_params(p)
    regs = {}
    for v in values:
        h = int(hashlib.md5(v.encode()).hexdigest()[:8], 16)
        b = h >> W
        w = h & ((1 << W) - 1)
        rank = W - w.bit_length() + 1
        regs[b] = max(regs.get(b, 0), rank)
    s = sum(2.0 ** (R - M) for M in regs.values()) + (m - len(regs)) * float(2**R)
    e_raw = num / s
    v_empty = m - len(regs)
    if e_raw <= 2.5 * m and v_empty > 0:
        return float(m) * math.log(float(m) / v_empty)
    return e_raw


def py_cms(token_stream, depth=3, width=256, k=20):
    counters = [{} for _ in range(depth)]
    bucket = {}
    for t in token_stream:
        for r in range(depth):
            b = int(hashlib.md5(f"{r}:{t}".encode()).hexdigest()[:8], 16) % width
            bucket[(r, t)] = b
            counters[r][b] = counters[r].get(b, 0) + 1
    est = {
        t: min(counters[r][bucket[(r, t)]] for r in range(depth))
        for t in set(token_stream)
    }
    return sorted(est.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_hll_matches_python_and_overcount_bound(spark):
    vals = [f"value-{i * 37 % 991}-{i}" for i in range(800)]
    df = spark.createDataFrame([(v,) for v in vals], "text string")
    for p in (4, 6, 10):
        got = hll_distinct(df, "text", p=p).collect()[0]["est_distinct"]
        assert got == py_hll(vals, p)
        # sanity: within the sketch's error regime for this n
        assert abs(got - 800) / 800 < 0.6


def test_hll_linear_counting_branch(spark):
    # 5 distinct values at p=10: raw estimate far below 2.5m with empty
    # registers -> linear counting, still bit-equal to the recomputation
    vals = ["a", "b", "c", "d", "e"]
    df = spark.createDataFrame([(v,) for v in vals * 3], "text string")
    got = hll_distinct(df, "text", p=10).collect()[0]["est_distinct"]
    assert got == py_hll(vals * 3, p=10)
    assert 1 <= got <= 20


def test_hll_empty_input(spark):
    df = spark.createDataFrame([], "text string")
    got = hll_distinct(df, "text", p=6).collect()[0]["est_distinct"]
    assert got == 0.0


def test_hll_sql_twin_parity(spark, tmp_path):
    vals = [f"doc {i % 113} body {i % 7}" for i in range(300)]
    df = spark.createDataFrame([(v,) for v in vals], "text string")
    pq = str(tmp_path / "t.parquet")
    df.write.parquet(pq)
    got = hll_distinct(spark.read.parquet(pq), "text", p=6).collect()[0][
        "est_distinct"
    ]
    want = duckdb.sql(
        hll_sql(f"'{pq}/*.parquet'", "text", p=6)
    ).fetchone()[0]
    assert got == want


def test_hll_p_bounds():
    with pytest.raises(ValueError):
        hll_params(3)
    with pytest.raises(ValueError):
        hll_params(17)


def test_cms_matches_python_and_upper_bounds(spark):
    docs = [
        (i, " ".join(f"tok{(i * j) % 23}" for j in range(1, 12))) for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r["token"], r["est"]) for r in cms_heavy_hitters(df, k=10).collect()]
    stream = [t for _, text in docs for t in text.split(" ") if t]
    assert got == py_cms(stream, k=10)
    # CMS never under-counts
    from collections import Counter

    true = Counter(stream)
    for t, e in got:
        assert e >= true[t]
