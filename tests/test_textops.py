"""Text/dedup/similarity operators vs pure-python oracles on the sf0.001
documents/embeddings tables plus hand-built fixtures."""

import hashlib
import math

import numpy as np
import pytest

from subgraph_isomorphism_pregel_spark.functions import LANG_MARKERS, LANG_PRIORITY, STOPWORDS
from subgraph_isomorphism_pregel_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from subgraph_isomorphism_pregel_spark.operators.multimodal import (
    attach_binary,
    extract_media_meta,
    frame_sample,
)
from subgraph_isomorphism_pregel_spark.operators.similarity import (
    cosine_topk,
    embedding_dup_pairs,
    lsh_topk,
)
from subgraph_isomorphism_pregel_spark.operators.textops import (
    fingerprint,
    langid,
    repetition_score,
    text_stats,
    tfidf_topk,
    token_count,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def py_tokens(text):
    return [t for t in text.strip().split(" ") if t]


def test_token_count(spark, docs):
    got = {r["doc_id"]: r["n_tokens"] for r in token_count(docs).collect()}
    for r in docs.collect():
        assert got[r["doc_id"]] == len(py_tokens(r["text"])), r["doc_id"]


def test_text_stats(spark, docs):
    got = {r["doc_id"]: r for r in text_stats(docs).collect()}
    for r in docs.collect():
        toks = py_tokens(r["text"])
        g = got[r["doc_id"]]
        assert g["n_tokens"] == len(toks)
        assert g["n_chars_calc"] == len(r["text"])
        assert g["stop_count"] == sum(1 for t in toks if t in STOPWORDS)
        punct = sum(1 for c in r["text"] if c in ".!?,;:")
        assert g["punct_count"] == punct
        sr = g["stop_count"] / max(g["n_tokens"], 1)
        pr = punct / max(len(r["text"]), 1)
        want_q = round((0.2 * sr + 0.8 * min(len(toks), 100) / 100.0) * (1 - pr), 6)
        assert abs(g["quality"] - want_q) < 1e-9


def test_langid(spark, docs):
    got = {r["doc_id"]: r for r in langid(docs).collect()}
    for r in docs.collect():
        toks = py_tokens(r["text"])
        scores = {l: sum(1 for t in toks if t in LANG_MARKERS[l]) for l in LANG_PRIORITY}
        best = max(scores.values())
        want = next(l for l in LANG_PRIORITY if scores[l] == best)
        assert got[r["doc_id"]]["pred_lang"] == want
        assert got[r["doc_id"]]["score"] == best


def test_fingerprint(spark, docs):
    got = {r["doc_id"]: r["fp"] for r in fingerprint(docs).collect()}
    for r in docs.collect():
        text = r["text"]
        n = max(len(text) - 7, 1)
        want = min(hashlib.md5(text[i : i + 8].encode()).hexdigest() for i in range(n))
        assert got[r["doc_id"]] == want


def test_repetition_score(spark, docs):
    """rep_ratio equals a pure-Python recomputation over the whole corpus,
    plus hand-built edge cases: a fully repeated doc, an all-distinct doc,
    and docs shorter than the n-gram width (ratio 0, zero n-grams)."""
    got = {r["doc_id"]: r for r in repetition_score(docs).collect()}
    for r in docs.collect():
        toks = py_tokens(r["text"])
        ngs = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)] if len(toks) >= 3 else []
        g = got[r["doc_id"]]
        assert g["n_ngrams"] == len(ngs)
        assert g["n_distinct"] == len(set(ngs))
        want = round(1.0 - len(set(ngs)) / len(ngs), 6) if ngs else 0.0
        assert abs(g["rep_ratio"] - want) < 1e-9, r["doc_id"]

    hand = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam spam"),   # one distinct 3-gram, 4 total
            (1, "a b c d e f"),                      # all distinct
            (2, "x y"),                              # shorter than n
            (3, ""),                                 # empty
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_score(hand).collect()}
    assert rows[0]["n_ngrams"] == 4 and rows[0]["n_distinct"] == 1
    assert rows[0]["rep_ratio"] == 0.75
    assert rows[1]["rep_ratio"] == 0.0 and rows[1]["n_distinct"] == 4
    assert rows[2]["n_ngrams"] == 0 and rows[2]["rep_ratio"] == 0.0
    assert rows[3]["n_ngrams"] == 0 and rows[3]["rep_ratio"] == 0.0


def test_tfidf_topk(spark, docs):
    """Top-k terms per document equal a pure-Python TF-IDF recomputation
    (same rounded score, same deterministic term tie-break)."""
    corpus = {r["doc_id"]: py_tokens(r["text"]) for r in docs.collect()}
    n = len(corpus)
    df_ = {}
    for toks in corpus.values():
        for t in set(toks):
            df_[t] = df_.get(t, 0) + 1
    want = {}
    for d, toks in corpus.items():
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        scored = sorted(
            ((round(c * math.log(n / df_[t]), 6), t, c) for t, c in tf.items()),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        want[d] = [(t, c, s) for s, t, c in scored]
    got = {}
    for r in tfidf_topk(docs).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["term"], r["tf"], r["score"], r["rnk"], r["df"])
        )
    for d, exp in want.items():
        g = sorted(got[d], key=lambda x: x[3])
        assert [x[3] for x in g] == list(range(1, len(g) + 1))
        for (term, tf_c, score), (gt, gtf, gs, _rnk, gdf) in zip(exp, g):
            assert (term, tf_c) == (gt, gtf), d
            assert abs(score - gs) < 1e-9, (d, term)
            assert gdf == df_[term]


def test_dedup_exact(spark):
    rows = [(1, "aa bb"), (2, "cc"), (3, "aa bb"), (4, "dd"), (5, "aa bb")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["canonical_id"], r["group_size"]) for r in dedup_exact(d).collect()}
    assert got == {1: (1, 3), 2: (2, 1), 3: (1, 3), 4: (4, 1), 5: (1, 3)}


def test_ngram_jaccard(spark):
    rows = [
        (1, "a b c d e f"),
        (2, "a b c d e g"),  # shares 3 of the union of 3-gram shingles
        (3, "x y z w v u"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(d, 3, 0.3).collect()}
    # doc1 shingles: {abc,bcd,cde,def}; doc2: {abc,bcd,cde,deg}; common 3, union 5
    assert got == {(1, 2): 0.6}


def test_minhash_identical_docs_collide(spark):
    rows = [(1, "p q r s t u v w"), (2, "p q r s t u v w"), (3, "completely different text here")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {r["doc_id"]: tuple(r[f"h{k}"] for k in range(12)) for r in minhash_signatures(d).collect()}
    assert sig[1] == sig[2] != sig[3]
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in minhash_lsh_pairs(d).collect()}
    assert pairs == {(1, 2): 1.0}


def test_simhash_oracle(spark, docs):
    small = docs.limit(5)
    got = {r["doc_id"]: r["simhash"] for r in simhash(small).collect()}
    for r in small.collect():
        toks = py_tokens(r["text"])
        val = 0
        for j in range(32):
            s = sum(1 if hashlib.md5(t.encode()).hexdigest()[j] in "89abcdef" else -1 for t in toks)
            if s > 0:
                val |= 1 << j
        assert got[r["doc_id"]] == val


def test_simhash_packed_equals_sql_impl(spark, docs):
    """The zero-shuffle packed default must equal the pure-expression
    variant bit for bit (including dropping zero-token docs)."""
    small = docs.limit(30)
    rows = [(100, "   "), (101, "one two one")]
    extra = spark.createDataFrame(rows, "doc_id long, text string")
    d = small.select("doc_id", "text").unionByName(extra)
    a = {r["doc_id"]: r["simhash"] for r in simhash(d, impl="packed").collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash(d, impl="sql").collect()}
    assert a == b
    assert 100 not in a and 101 in a


def np_cosine_topk(vecs, ids, k, n_queries):
    M = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    S = M @ M.T
    out = {}
    for qi, q in enumerate(ids):
        if q >= n_queries:
            continue
        cos = [(round(S[qi, j], 6), ids[j]) for j in range(len(ids)) if j != qi]
        cos.sort(key=lambda t: (-t[0], t[1]))
        out[q] = [(nid, r + 1, c) for r, (c, nid) in enumerate(cos[:k])]
    return out


def test_cosine_topk_vs_numpy(spark, emb):
    rows = emb.collect()
    ids = [r["vec_id"] for r in rows]
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    want = np_cosine_topk(vecs, ids, k=5, n_queries=10)
    got = {}
    for r in cosine_topk(emb, k=5, n_queries=10).collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["rank"], r["cos"]))
    assert set(got) == set(want)
    for q in want:
        for (gn, gr, gc), (wn, wr, wc) in zip(got[q], want[q]):
            assert gr == wr and abs(gc - wc) < 2e-6
            # neighbor ids may differ only on exact cos ties
            if gn != wn:
                assert abs(gc - wc) < 2e-6


def test_lsh_topk_matches_bruteforce_within_bucket(spark, emb):
    res = lsh_topk(emb, k=3).collect()
    assert len(res) > 0
    rows = emb.collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    for r in res[:50]:
        a, b = vecs[r["query_id"]], vecs[r["neighbor_id"]]
        want = round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)
        assert abs(r["cos"] - want) < 2e-6


def test_embedding_dup_pairs_threshold(spark, emb):
    got = embedding_dup_pairs(emb, threshold=0.9).collect()
    rows = emb.collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    ids = sorted(vecs)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            va, vb = vecs[a], vecs[b]
            c = round(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 6)
            if c >= 0.9:
                want.add((a, b))
    assert {(r["vec_a"], r["vec_b"]) for r in got} == want


def test_embedding_dup_pairs_lsh_subset_and_recall(spark, emb):
    """LSH near-dup pairs must be a SUBSET of brute force (exact verify
    inside buckets guarantees no false positives) and catch synthetic
    near-duplicates (high-cosine pairs collide in >=1 band whp)."""
    from pyspark.sql import functions as F

    from subgraph_isomorphism_pregel_spark.operators.similarity import (
        embedding_dup_pairs_lsh,
    )

    # plant obvious near-dups: copies of existing vectors with a tiny nudge
    base = emb.limit(5).collect()
    planted = [
        (10_000 + r["vec_id"], [float(x) + 0.001 for x in r["embedding"]])
        for r in base
    ]
    d = emb.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<float>")
    )
    brute = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_dup_pairs(d, threshold=0.9).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_dup_pairs_lsh(d, threshold=0.9).collect()
    }
    assert lsh <= brute
    planted_pairs = {(r["vec_id"], 10_000 + r["vec_id"]) for r in base}
    assert planted_pairs <= brute
    # every planted near-identical pair must be recalled by the LSH path
    assert planted_pairs <= lsh


def test_multimodal_plumbing(spark, docs):
    media = attach_binary(docs.limit(10))
    meta = extract_media_meta(media).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.limit(10).collect()}
    assert len(meta) == 10
    for m in meta:
        b = texts[m["media_id"]].encode()
        assert m["n_bytes"] == len(b)
        assert m["sha256"] == hashlib.sha256(b).hexdigest()
        assert 1 <= m["width"] <= 256 and 1 <= m["height"] <= 256
    fr = frame_sample(media, frame_bytes=64, stride=2)
    fc = fr.collect()
    assert fr.schema["frame"].dataType.typeName() == "binary"
    for r in fc:
        assert r["frame_no"] % 2 == 0
        assert len(r["frame"]) <= 64
    with pytest.raises(Exception):
        extract_media_meta(media, real_decode=True).collect()


def test_png_header_decode_is_real(spark, docs):
    """synth_png builds structurally valid PNG headers; extract_media_meta
    must parse width/height from the BYTES (IHDR + CRC verified), not the
    sha256 fake — and a corrupted CRC must fall back to the fake dims."""
    import struct as _struct

    from subgraph_isomorphism_pregel_spark.operators.multimodal import (
        _parse_png_ihdr,
        synth_png,
    )

    media = synth_png(docs.limit(16))
    meta = {r["media_id"]: r for r in extract_media_meta(media).collect()}
    assert len(meta) == 16
    for mid, m in meta.items():
        assert m["format"] == "png" and m["n_bytes"] == 45
        assert m["width"] == 1 + mid % 512
        assert m["height"] == 1 + (mid * 7) % 512
    # PNG headers parse under real_decode=True too (no NotImplementedError)
    assert extract_media_meta(media, real_decode=True).count() == 16

    # direct parser checks: valid header round-trips, corrupted CRC -> None
    (payload,) = [bytes(r["payload"]) for r in media.limit(1).collect()]
    assert _parse_png_ihdr(payload) is not None
    bad = bytearray(payload)
    bad[29] ^= 0xFF  # flip a CRC byte
    assert _parse_png_ihdr(bytes(bad)) is None
    assert _parse_png_ihdr(payload[:20]) is None  # truncated
    # width/height for the corrupted payload fall back to the sha256 fake
    df = spark.createDataFrame([(1, bytes(bad))], "media_id long, payload binary")
    (row,) = extract_media_meta(df).collect()
    digest = hashlib.sha256(bytes(bad)).digest()
    assert row["format"] == "png"  # magic still sniffs as png
    assert (row["width"], row["height"]) == (1 + digest[0], 1 + digest[1])


def test_jpeg_header_decode_is_real(spark, docs):
    """synth_jpeg builds well-formed marker segments; extract_media_meta
    must parse width/height from the SOF0 BYTES, not the sha256 fake — and
    a stream whose SOF0 is missing must fall back to the fake dims."""
    from subgraph_isomorphism_pregel_spark.operators.multimodal import (
        _parse_jpeg_sof,
        synth_jpeg,
    )

    media = synth_jpeg(docs.limit(16))
    meta = {r["media_id"]: r for r in extract_media_meta(media).collect()}
    assert len(meta) == 16
    for mid, m in meta.items():
        assert m["format"] == "jpg" and m["n_bytes"] == 35
        assert m["width"] == 1 + (3 * mid) % 1024
        assert m["height"] == 1 + (5 * mid) % 1024
    # JPEG headers parse under real_decode=True too
    assert extract_media_meta(media, real_decode=True).count() == 16

    (payload,) = [bytes(r["payload"]) for r in media.limit(1).collect()]
    assert _parse_jpeg_sof(payload) is not None
    # DHT (0xC4) shares the 0xC marker range but is NOT a frame header
    dht = payload.replace(b"\xff\xc0", b"\xff\xc4", 1)
    assert _parse_jpeg_sof(dht) is None
    assert _parse_jpeg_sof(payload[:10]) is None  # truncated mid-segment
    assert _parse_jpeg_sof(b"\xff\xd8\xff\xd9") is None  # SOI+EOI only
    # fallback to the sha256 fake when SOF is absent
    df = spark.createDataFrame([(1, dht)], "media_id long, payload binary")
    (row,) = extract_media_meta(df).collect()
    digest = hashlib.sha256(dht).digest()
    assert row["format"] == "jpg"
    assert (row["width"], row["height"]) == (1 + digest[0], 1 + digest[1])


def test_gif_header_decode_is_real(spark, docs):
    """synth_gif builds real logical screen descriptors; extract_media_meta
    must parse width/height from the LSD BYTES, not the sha256 fake — and
    a zero-dimension (structurally invalid) LSD must fall back."""
    from subgraph_isomorphism_pregel_spark.operators.multimodal import (
        _parse_gif_lsd,
        synth_gif,
    )

    media = synth_gif(docs.limit(16))
    meta = {r["media_id"]: r for r in extract_media_meta(media).collect()}
    assert len(meta) == 16
    for mid, m in meta.items():
        assert m["format"] == "gif" and m["n_bytes"] == 14
        assert m["width"] == 1 + (11 * mid) % 4096
        assert m["height"] == 1 + (13 * mid) % 4096
    # GIF headers parse under real_decode=True too
    assert extract_media_meta(media, real_decode=True).count() == 16

    (payload,) = [bytes(r["payload"]) for r in media.limit(1).collect()]
    assert _parse_gif_lsd(payload) is not None
    assert _parse_gif_lsd(payload[:10]) is None  # truncated LSD
    assert _parse_gif_lsd(b"GIF89b" + payload[6:]) is None  # bad version
    zero = payload[:6] + b"\x00\x00" + payload[8:]  # width 0: invalid
    assert _parse_gif_lsd(zero) is None
    df = spark.createDataFrame([(1, zero)], "media_id long, payload binary")
    (row,) = extract_media_meta(df).collect()
    digest = hashlib.sha256(zero).digest()
    assert row["format"] == "gif"  # magic still sniffs as gif
    assert (row["width"], row["height"]) == (1 + digest[0], 1 + digest[1])


def test_wav_header_decode_is_real(spark, docs):
    """synth_wav builds real RIFF chunk lists; extract_audio_meta must walk
    fmt/data chunks for every field, and malformed buffers yield nulls."""
    from subgraph_isomorphism_pregel_spark.operators.multimodal import (
        _parse_wav_header,
        extract_audio_meta,
        synth_wav,
    )

    media = synth_wav(docs.limit(16))
    meta = {r["media_id"]: r for r in extract_audio_meta(media).collect()}
    assert len(meta) == 16
    for mid, m in meta.items():
        channels = 1 + mid % 2
        rate = 8000 * (1 + mid % 4)
        n_samples = 16 + mid % 241
        assert m["channels"] == channels
        assert m["sample_rate"] == rate
        assert m["bits_per_sample"] == 16
        assert m["n_samples"] == n_samples
        assert m["n_bytes"] == 44 + n_samples * channels * 2
        assert m["duration_ms"] == n_samples * 1000.0 / rate

    (payload,) = [bytes(r["payload"]) for r in media.limit(1).collect()]
    assert _parse_wav_header(payload) is not None
    assert _parse_wav_header(payload[:20]) is None  # truncated
    assert _parse_wav_header(b"RIFX" + payload[4:]) is None  # bad magic
    # a WAVE with no data chunk is rejected, and non-WAV rows yield nulls
    no_data = payload[:36]  # RIFF header + fmt chunk only
    fixed = b"RIFF" + __import__("struct").pack("<I", len(no_data) - 8) + no_data[8:]
    assert _parse_wav_header(fixed) is None
    df = spark.createDataFrame([(7, b"not audio")], "media_id long, payload binary")
    (row,) = extract_audio_meta(df).collect()
    assert row["channels"] is None and row["duration_ms"] is None
    assert row["n_bytes"] == 9


def test_audio_features_pcm_decode_is_real(spark, docs):
    """extract_audio_features must decode the ACTUAL int16-LE samples from
    the data chunk: every aggregate is recomputed here from the generator
    formula in pure Python (independent of numpy slicing/endianness), and
    malformed or non-16-bit payloads yield typed nulls."""
    import math
    import struct

    from subgraph_isomorphism_pregel_spark.operators.multimodal import (
        extract_audio_features,
        synth_wav,
    )

    media = synth_wav(docs.limit(16))
    feats = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    assert len(feats) == 16
    for mid, m in feats.items():
        nv = (16 + mid % 241) * (1 + mid % 2)
        vals = [(mid * 31 + i * 17) % 2001 - 1000 for i in range(nv)]
        assert m["channels"] == 1 + mid % 2
        assert m["sample_rate"] == 8000 * (1 + mid % 4)
        assert m["n_values"] == nv
        assert m["sum_sq"] == sum(v * v for v in vals)
        assert m["peak_abs"] == max(abs(v) for v in vals)
        assert m["zero_crossings"] == sum(
            1 for a, b in zip(vals, vals[1:]) if a * b < 0
        )
        assert m["rms"] == math.sqrt(m["sum_sq"] / nv)

    # non-WAV payload and a 8-bit-per-sample WAV both yield typed nulls
    (payload,) = [bytes(r["payload"]) for r in media.limit(1).collect()]
    eight_bit = payload[:34] + struct.pack("<H", 8) + payload[36:]
    df = spark.createDataFrame(
        [(1, b"not audio"), (2, eight_bit)], "media_id long, payload binary"
    )
    rows = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    for r in rows.values():
        assert r["sum_sq"] is None and r["rms"] is None and r["n_values"] is None


def test_rademacher_dots_packed_equals_sql(spark, emb):
    """The zero-shuffle numpy GEMM projection must be BIT-IDENTICAL to the
    explode+groupBy SQL-expression variant (same quantization, same md5
    signs) — the packed impl is the scale path, the sql impl the
    cross-check twin (and the DuckDB oracle's shape)."""
    from subgraph_isomorphism_pregel_spark.operators.similarity import (
        _rademacher_dots,
    )

    a = {r["vec_id"]: tuple(r[f"dot{i}"] for i in range(8))
         for r in _rademacher_dots(emb, 8, impl="packed").collect()}
    b = {r["vec_id"]: tuple(r[f"dot{i}"] for i in range(8))
         for r in _rademacher_dots(emb, 8, impl="sql").collect()}
    assert a == b
    assert len(a) == emb.count()


def test_ann_topk_lsh_packed_equals_sql_impl(spark, emb):
    from subgraph_isomorphism_pregel_spark.operators.similarity import ann_topk_lsh

    a = sorted(map(tuple, ann_topk_lsh(emb, k=3, impl="packed").collect()))
    b = sorted(map(tuple, ann_topk_lsh(emb, k=3, impl="sql").collect()))
    assert a == b and len(a) > 0


def test_minhash_array_equals_explode_impl(spark, docs):
    from subgraph_isomorphism_pregel_spark.operators.dedup import minhash_signatures

    a = sorted(map(tuple, minhash_signatures(docs, 8, impl="array").collect()))
    b = sorted(map(tuple, minhash_signatures(docs, 8, impl="explode").collect()))
    assert a == b and len(a) > 0


def test_ivf_topk_exactness_and_recall(spark, emb):
    """IVF-flat: every returned neighbor's cosine must equal the exact
    cosine (candidates are scored exactly), ranks are consistent, and
    rank-1 recall vs brute force is reasonable for n_probe=2 of 8 lists."""
    from subgraph_isomorphism_pregel_spark.operators.similarity import ivf_topk

    rows = emb.collect()
    ids = [r["vec_id"] for r in rows]
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    idx = {v: i for i, v in enumerate(ids)}

    got = ivf_topk(emb, k=3, n_lists=8, n_probe=2).collect()
    assert len(got) > 0
    by_q = {}
    for r in got:
        c_exact = round(float(S[idx[r["query_id"]], idx[r["neighbor_id"]]]), 6)
        assert abs(r["cos"] - c_exact) < 1e-9, (r, c_exact)
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cos"]))
    for q, rs in by_q.items():
        rs.sort()
        assert [r for r, _ in rs] == list(range(1, len(rs) + 1))
        assert all(rs[i][1] >= rs[i + 1][1] for i in range(len(rs) - 1))
    # recall@1: the true nearest neighbor is found for a decent fraction
    hits = tot = 0
    true1 = {}
    for i, v in enumerate(ids):
        row = S[i].copy()
        row[i] = -np.inf
        true1[v] = ids[int(np.argmax(row))]
    for q, rs in by_q.items():
        tot += 1
        top = [r for r in got if r["query_id"] == q and r["rank"] == 1][0]
        hits += top["neighbor_id"] == true1[q]
    assert tot == len(ids)  # every vector got candidates
    assert hits / tot > 0.2  # 2/8 lists probed on near-random vectors


def test_ivf_topk_offset_ids(spark, emb):
    """Centroids are the n_lists smallest ACTUAL ids — a table whose ids
    start at 1000 must produce exactly the shifted result of the 0-based
    table, not degraded/empty output (ADVICE r3: `vec_id < n_lists` only
    worked for contiguous 0-based ids)."""
    from pyspark.sql import functions as F

    from subgraph_isomorphism_pregel_spark.operators.similarity import ivf_topk

    base = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["cos"])
        for r in ivf_topk(emb, k=3, n_lists=8, n_probe=2).collect()
    )
    shifted = emb.withColumn("vec_id", F.col("vec_id") + 1000)
    got = sorted(
        (r["query_id"] - 1000, r["neighbor_id"] - 1000, r["rank"], r["cos"])
        for r in ivf_topk(shifted, k=3, n_lists=8, n_probe=2).collect()
    )
    assert got == base and len(base) > 0


def test_dedup_survivors_transitive(spark):
    """a~b, b~c keeps ONE survivor for {a,b,c}; isolated docs survive."""
    from subgraph_isomorphism_pregel_spark.operators.dedup import dedup_survivors

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 7)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: (r["canonical"], r["is_survivor"])
        for r in dedup_survivors(docs, pairs, num_partitions=2).collect()
    }
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False),
        4: (4, True), 5: (5, True), 6: (5, False),
    }


def test_redact_pii_masks_and_counts(spark):
    from subgraph_isomorphism_pregel_spark.operators.textops import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail a.b@x.co and c@d.org from 192.168.0.1 acct 12345678901"),
            (2, "no pii here just words"),
            (3, "ip 10.0.0.255 twice 10.0.0.255 and short 12345678"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert rows[1]["n_email"] == 2 and rows[1]["n_ip"] == 1 and rows[1]["n_num"] == 1
    assert rows[1]["clean_text"] == "mail <EMAIL> and <EMAIL> from <IP> acct <NUM>"
    assert rows[2]["clean_text"] == "no pii here just words"
    assert (rows[2]["n_email"], rows[2]["n_ip"], rows[2]["n_num"]) == (0, 0, 0)
    # 8-digit run stays (threshold is 9), both IPs masked
    assert rows[3]["n_ip"] == 2 and rows[3]["n_num"] == 0
    assert "12345678" in rows[3]["clean_text"]


def test_redact_pii_email_consumes_digits_before_num_pass(spark):
    from subgraph_isomorphism_pregel_spark.operators.textops import redact_pii

    docs = spark.createDataFrame(
        [(1, "user123456789@example.com")], "doc_id long, text string"
    )
    r = redact_pii(docs).collect()[0]
    # the email pass runs first, so its 9-digit local part never counts as a NUM
    assert r["clean_text"] == "<EMAIL>" and r["n_email"] == 1 and r["n_num"] == 0


def test_quality_filter_flags(spark):
    from subgraph_isomorphism_pregel_spark.operators.textops import quality_filter

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is happy today"),  # keep
            (2, "tiny doc"),  # too_short
            (3, "the " + "word " * 6000 + "end"),  # too_long
            (4, "the end!!!! ....;;;; !!!! ????"),  # high_punct
            (5, "alpha beta gamma delta epsilon zeta"),  # low_stop
            (6, "the cat sat " * 10 + "on the mat"),  # repetitive
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_filter(docs).collect()}
    assert rows[1]["keep"] and not any(
        rows[1][c] for c in ("too_short", "too_long", "high_punct", "low_stop", "repetitive")
    )
    assert rows[2]["too_short"] and not rows[2]["keep"]
    assert rows[3]["too_long"] and not rows[3]["keep"]
    assert rows[4]["high_punct"] and not rows[4]["keep"]
    assert rows[5]["low_stop"] and not rows[5]["keep"]
    assert rows[6]["repetitive"] and not rows[6]["keep"]


def test_lm_score_matches_numpy(spark):
    from subgraph_isomorphism_pregel_spark.operators.textops import lm_score

    texts = ["the cat sat", "the the dog", "cat dog bird the"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    toks = [t.split() for t in texts]
    from collections import Counter

    c = Counter(w for ws in toks for w in ws)
    N = sum(c.values())
    got = {r["doc_id"]: r for r in lm_score(docs).collect()}
    for i, ws in enumerate(toks):
        q = sum(
            math.floor(tf * math.log(c[w] / N) * 1e6 + 0.5)
            for w, tf in Counter(ws).items()
        )
        want = round(q / 1e6 / len(ws), 6)
        assert got[i]["n_tokens"] == len(ws)
        assert got[i]["lm_score"] == pytest.approx(want, abs=1e-9)
    # more-frequent-token docs score higher (less surprising)
    assert got[1]["lm_score"] > got[2]["lm_score"]


def test_token_count_bpe(spark):
    from subgraph_isomorphism_pregel_spark.operators.textops import token_count_bpe

    docs = spark.createDataFrame(
        [(1, "Hello, world! v3.14 #tag x_y"), (2, "plain words only")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in token_count_bpe(docs).collect()}
    # Hello , world ! v 3 . 14 # tag x _ y  -> 13 tokens
    assert rows[1]["n_tokens"] == 13
    assert rows[1]["n_words"] == 6  # Hello world v tag x y
    assert rows[1]["n_digit_runs"] == 2  # 3, 14
    assert rows[1]["n_marks"] == 5  # , ! . # _
    assert rows[2]["n_tokens"] == 3 and rows[2]["n_marks"] == 0


def test_decontaminate(spark):
    from subgraph_isomorphism_pregel_spark.operators.dedup import decontaminate

    bm = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    tr = spark.createDataFrame(
        [
            (1, "a lazy dog sat by the quick brown fox today"),  # shares 2 shingles
            (2, "completely novel words with zero overlap here"),
            (3, "quick brown fox jumps again and again"),  # shares 2 shingles
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in decontaminate(tr, bm, k=3).collect()}
    # doc1: 'the quick brown', 'quick brown fox'; doc3: 'quick brown fox', 'brown fox jumps'
    assert rows[1]["n_hits"] == 2 and rows[1]["contaminated"]
    assert rows[2]["n_hits"] == 0 and not rows[2]["contaminated"]
    assert rows[3]["n_hits"] == 2 and rows[3]["contaminated"]


def test_quantize_embeddings_roundtrip(spark):
    from subgraph_isomorphism_pregel_spark.operators.similarity import (
        quantize_embeddings,
    )

    emb = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0]), (3, [2.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(emb).collect()}
    assert rows[1]["scale"] == 1.0
    assert rows[1]["codes_csv"] == "64,-127,32"  # floor(x*127+0.5)
    assert rows[2]["scale"] == 0.0 and rows[2]["codes_csv"] == "0,0,0"
    assert rows[3]["codes_csv"] == "127"
    # dequantized error bounded by scale/(2*127)
    import math

    for vid, vec in ((1, [0.5, -1.0, 0.25]), (3, [2.0])):
        s = rows[vid]["scale"]
        codes = [int(c) for c in rows[vid]["codes_csv"].split(",")]
        for x, c in zip(vec, codes):
            assert math.isclose(c * s / 127.0, x, abs_tol=s / 254.0 + 1e-12)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        quantize_embeddings(emb, bits=1)


def test_chunk_documents_oracle(spark):
    """Python reference chunker over hand-built docs, incl. the empty and
    shorter-than-overlap edge cases (one empty/whole chunk each)."""
    from subgraph_isomorphism_pregel_spark.operators.textops import chunk_documents

    rows = [
        (1, " ".join(f"t{i}" for i in range(150))),
        (2, "a b c"),
        (3, ""),
        (4, "   "),
        (5, " ".join(f"x{i}" for i in range(64))),  # exactly max_tokens
        (6, " ".join(f"y{i}" for i in range(65))),  # one past: second chunk
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.doc_id, r.chunk_id, r.start_token, r.n_tokens, r.chunk_text)
        for r in chunk_documents(docs, max_tokens=64, overlap=16).collect()
    ]
    want = []
    for doc_id, text in rows:
        ws = [t for t in text.split(" ") if t]
        n = len(ws)
        starts = list(range(0, max(n - 16, 1), 48))
        for s in starts:
            piece = ws[s : s + 64]
            want.append((doc_id, s // 48, s, len(piece), " ".join(piece)))
    assert got == sorted(want)


def test_chunk_documents_overlap_reconstruction(spark):
    """Consecutive chunks overlap by exactly `overlap` tokens, and the
    chunk set covers every token of the document."""
    from subgraph_isomorphism_pregel_spark.operators.textops import chunk_documents

    text = " ".join(f"w{i}" for i in range(230))
    docs = spark.createDataFrame([(9, text)], "doc_id long, text string")
    chunks = chunk_documents(docs, max_tokens=50, overlap=10).collect()
    toks = [c.chunk_text.split(" ") for c in sorted(chunks, key=lambda c: c.chunk_id)]
    for a, b in zip(toks, toks[1:]):
        assert a[-10:] == b[:10]
    rebuilt = toks[0] + [t for c in toks[1:] for t in c[10:]]
    assert rebuilt == text.split(" ")


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from subgraph_isomorphism_pregel_spark.operators.textops import chunk_documents

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=8, overlap=8)


def _span_oracle(rows, k):
    from collections import Counter

    ws = {d: [t for t in text.split(" ") if t] for d, text in rows}
    c = Counter()
    for w in ws.values():
        for p in range(len(w) - k + 1):
            c[" ".join(w[p : p + k])] += 1
    out = {}
    for d, w in ws.items():
        cov = set()
        for p in range(len(w) - k + 1):
            if c[" ".join(w[p : p + k])] >= 2:
                cov.update(range(p, p + k))
        out[d] = (" ".join(t for i, t in enumerate(w) if i not in cov), len(cov))
    return out


def test_dedup_spans_oracle(spark):
    """Cross-doc and within-doc 5-gram repeats scrub their spans; unique
    text and short/empty docs pass through untouched."""
    from subgraph_isomorphism_pregel_spark.operators.dedup import dedup_spans

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "intro words the quick brown fox jumps over something else entirely"),
        (3, "all unique tokens here nothing repeated anywhere at this point"),
        (4, "aa bb cc dd ee aa bb cc dd ee tail"),
        (5, "short doc"),
        (6, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in dedup_spans(docs, k=5).collect()
    }
    assert got == _span_oracle(rows, 5)
    assert got[3][1] == 0 and got[5] == ("short doc", 0) and got[6] == ("", 0)


def test_dedup_spans_fuzz(spark):
    """Random small-vocab corpora (repeats are common) vs the oracle."""
    import random

    from subgraph_isomorphism_pregel_spark.operators.dedup import dedup_spans

    rng = random.Random(31)
    rows = [
        (d, " ".join(rng.choice("abcdefgh") for _ in range(rng.randrange(0, 40))))
        for d in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in dedup_spans(docs, k=3).collect()
    }
    assert got == _span_oracle(rows, 3)


def test_pq_topk_matches_numpy_replay(spark, emb):
    """pq_topk's codes and ADC distances replayed exactly in numpy: same
    2^20 quantization, smallest-id codebooks, argmin-with-smallest-code
    ties, asymmetric block distances, (adc, neighbor_id) ranking."""
    import math

    import numpy as np

    from subgraph_isomorphism_pregel_spark.operators.similarity import pq_topk

    k, m_sub, k_codes, n_queries = 4, 8, 8, 6
    rows = sorted(
        ((r["vec_id"], list(r["embedding"])) for r in emb.collect()),
        key=lambda t: t[0],
    )
    ids = [i for i, _ in rows]
    q = {
        i: np.array([math.floor(float(v) * 1048576.0) for v in vec], dtype=np.int64)
        for i, vec in rows
    }
    dim = len(rows[0][1])
    d_sub = dim // m_sub
    cb_ids = ids[:k_codes]

    def block(v, j):
        return v[j * d_sub : (j + 1) * d_sub]

    def enc_dist(i, j, c):
        d = block(q[i], j) - block(q[cb_ids[c]], j)
        return int((d * d).sum())

    codes = {
        i: [
            min(range(k_codes), key=lambda c: (enc_dist(i, j, c), c))
            for j in range(m_sub)
        ]
        for i in ids
    }
    want = []
    for qid in ids[:n_queries]:
        scored = [
            (sum(enc_dist(qid, j, codes[nid][j]) for j in range(m_sub)), nid)
            for nid in ids
            if nid != qid
        ]
        scored.sort()
        want += [
            (qid, nid, rank + 1, adc) for rank, (adc, nid) in enumerate(scored[:k])
        ]

    got = [
        (r["query_id"], r["neighbor_id"], r["rank"], r["adc"])
        for r in pq_topk(emb, k=k, m_sub=m_sub, k_codes=k_codes, n_queries=n_queries).collect()
    ]
    assert got == want

    import pytest as _pytest

    with _pytest.raises(ValueError):
        pq_topk(emb, m_sub=7)  # 7 does not divide dim 64


def test_collocations(spark, docs):
    """Top-k PMI bigrams on the sf0.001 corpus equal a pure-Python
    recomputation of counts, the fixed-order PMI formula, and the
    deterministic (pmi desc, w1, w2) rank."""
    from subgraph_isomorphism_pregel_spark.operators.textops import collocations

    corpus = [py_tokens(r["text"]) for r in docs.collect()]
    nt = sum(len(t) for t in corpus)
    np_ = sum(max(len(t) - 1, 0) for t in corpus)
    uni, pairs = {}, {}
    for toks in corpus:
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    min_count, k = 2, 10
    scored = []
    for (a, b), c in pairs.items():
        if c < min_count:
            continue
        pmi = round(math.log((c / np_) / ((uni[a] / nt) * (uni[b] / nt))), 6)
        scored.append((a, b, c, uni[a], uni[b], pmi))
    scored.sort(key=lambda x: (-x[5], x[0], x[1]))
    want = [(a, b, c, ua, ub, pmi, i + 1)
            for i, (a, b, c, ua, ub, pmi) in enumerate(scored[:k])]
    got = [tuple(r) for r in
           collocations(docs, min_count=min_count, k=k).collect()]
    assert got == want
    assert 0 < len(got) <= k


def test_collocations_empty_corpus(spark):
    from subgraph_isomorphism_pregel_spark.operators.textops import collocations

    d = spark.createDataFrame([(1, "solo")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="no bigrams"):
        collocations(d)


def test_token_entropy(spark, docs):
    """Closed-form rows (uniform -> ln k, constant -> 0) plus an exact
    quantized-sum replay over the sf0.001 corpus."""
    from subgraph_isomorphism_pregel_spark.operators.textops import token_entropy

    d = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b"), (4, "  ")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in token_entropy(d).collect()}
    assert set(got) == {1, 2, 3}  # tokenless doc 4 has no distribution
    assert got[1]["entropy_r"] == 0.0 and got[1]["n_distinct"] == 1
    assert got[2]["entropy_r"] == round(math.log(4), 6)
    assert got[3]["entropy_r"] == round(math.log(2), 6)
    assert got[3]["n_tokens"] == 4 and got[3]["n_distinct"] == 2

    corpus = {r["doc_id"]: py_tokens(r["text"]) for r in docs.collect()}
    want = {}
    for did, toks in corpus.items():
        if not toks:
            continue
        cnt = {}
        for t in toks:
            cnt[t] = cnt.get(t, 0) + 1
        n = len(toks)
        qs = sum(
            math.floor((c / n) * math.log(c / n) * 1e9 + 0.5)
            for c in cnt.values()
        )
        want[did] = (n, len(cnt), round(-(qs / 1e9), 6))
    got2 = {r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["entropy_r"])
            for r in token_entropy(docs).collect()}
    assert got2 == want


def brute_bm25(rows, terms, k1=1.2, b=0.75):
    import math

    toks = {d: t.split() for d, t in rows}
    toks = {d: [x for x in t if x] for d, t in toks.items()}
    n = len(rows)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {q: sum(1 for t in toks.values() if q in t) for q in terms}
    out = {}
    for d, t in toks.items():
        qs = 0
        n_hit = 0
        for q in sorted(set(terms)):
            tf = t.count(q)
            if tf == 0:
                continue
            n_hit += 1
            idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            c = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(t) / avgdl))
            qs += math.floor(c * 1e9 + 0.5)
        if n_hit:
            out[d] = (n_hit, round(qs / 1e9, 6))
    return out


def test_bm25_matches_bruteforce(spark):
    from subgraph_isomorphism_pregel_spark.operators.textops import bm25_topk

    rows = [
        (0, "spark join spark merge fast"),
        (1, "the quick brown fox"),
        (2, "spark"),                      # short doc, high tf-density
        (3, "merge merge merge merge merge merge merge merge"),
        (4, "slow window slow window spark merge"),
        (5, "a b c d e f g h i j k l m n o p q r s t spark"),  # long doc
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["spark", "merge", "slow"]
    got = {r.doc_id: (r.n_hit, r.score_r, r.rank) for r in bm25_topk(docs, terms, k=10).collect()}
    want = brute_bm25(rows, terms)
    assert {d: v[:2] for d, v in got.items()} == want
    # doc 1 has no query term -> no row
    assert 1 not in got
    # ranking is by rounded score desc then doc_id
    ranked = sorted(got.items(), key=lambda kv: (-kv[1][1], kv[0]))
    assert [kv[1][2] for kv in ranked] == list(range(1, len(got) + 1))


def test_bm25_idf_downweights_common_terms(spark):
    from subgraph_isomorphism_pregel_spark.operators.textops import bm25_topk

    # 'common' appears everywhere, 'rare' once; same tf in the probe doc
    rows = [(i, "common filler") for i in range(9)] + [(9, "common rare")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.score_r for r in bm25_topk(docs, ["rare"], k=3).collect()}
    common = {r.doc_id: r.score_r for r in bm25_topk(docs, ["common"], k=30).collect()}
    assert got[9] > common[9]


def test_bm25_contracts(spark):
    import pytest as _pytest

    from subgraph_isomorphism_pregel_spark.operators.textops import bm25_topk

    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        bm25_topk(docs, [])
    with _pytest.raises(ValueError):
        bm25_topk(docs, ["x"], k=0)
    # no doc contains the term -> empty result, not an error
    assert bm25_topk(docs, ["absent"], k=5).count() == 0


def test_bmp_pixel_decode_is_real(spark, docs):
    """synth_bmp builds true 24-bit bottom-up BMPs with stride padding;
    decode_bmp_stats must reproduce exact channel sums AND position-weighted
    sums recomputed here pixel-by-pixel from the generator formula — the
    weighted sums catch a forgotten bottom-up flip or a stride bug."""
    from subgraph_isomorphism_pregel_spark.operators.multimodal import (
        _bmp_pixels,
        _parse_bmp,
        decode_bmp_stats,
        synth_bmp,
    )

    media = synth_bmp(docs.limit(16))
    got = {r["media_id"]: r for r in decode_bmp_stats(media).collect()}
    assert len(got) == 16
    for mid, m in got.items():
        w, h = 8 + mid % 9, 4 + (mid * 3) % 7
        sr = sg = sb = wr = wg = wb = 0
        for y in range(h):
            for x in range(w):
                r = (mid + 3 * x + 7 * y) % 256
                g = (2 * mid + 5 * x + 11 * y) % 256
                b = (mid + x * y) % 256
                wgt = y * w + x
                sr += r; sg += g; sb += b
                wr += wgt * r; wg += wgt * g; wb += wgt * b
        assert (m["width"], m["height"], m["n_pixels"]) == (w, h, w * h)
        assert (m["sum_r"], m["sum_g"], m["sum_b"]) == (sr, sg, sb)
        assert (m["wsum_r"], m["wsum_g"], m["wsum_b"]) == (wr, wg, wb)

    # direct parser checks: truncated / non-BMP payloads -> None
    (payload,) = [bytes(r["payload"]) for r in media.limit(1).collect()]
    assert _parse_bmp(payload) is not None
    assert _parse_bmp(payload[:40]) is None          # truncated header
    assert _bmp_pixels(payload[:60]) is None          # truncated pixel data
    assert _parse_bmp(b"PNG" + payload[3:]) is None   # wrong magic
    bad_bpp = payload[:28] + b"\x20\x00" + payload[30:]  # 32 bpp: rejected
    assert _parse_bmp(bad_bpp) is None

    # TOP-DOWN (negative height) BMPs must NOT be flipped: build one by
    # negating the height and pre-flipping the stored rows, then check the
    # decoded array matches the bottom-up original exactly.
    import struct as _struct

    import numpy as _np

    w0, h0, off0 = _parse_bmp(payload)
    px_up = _bmp_pixels(payload)
    row_bytes = w0 * 3
    stride = row_bytes + ((-row_bytes) % 4)
    body = _np.frombuffer(
        payload, dtype=_np.uint8, count=stride * h0, offset=off0
    ).reshape(h0, stride)
    td = (
        payload[:14]
        + _struct.pack("<Iii", 40, w0, -h0)
        + payload[26:off0]
        + body[::-1].tobytes()
    )
    px_td = _bmp_pixels(td)
    assert px_td is not None and (px_td == px_up).all()

    # nulls flow through the gated operator for junk payloads
    junk = spark.createDataFrame(
        [(99, b"not a bitmap at all")], "media_id long, payload binary"
    )
    (row,) = decode_bmp_stats(junk).collect()
    assert row["width"] is None and row["sum_r"] is None


def test_bmp_resize_nearest(spark, docs):
    """resize_bmp_nearest samples (floor(i*W/4), floor(j*H/4)) in row-major
    (j, i) order — recompute every sampled RGB from the generator formula."""
    import pytest as _pytest

    from subgraph_isomorphism_pregel_spark.operators.multimodal import (
        resize_bmp_nearest,
        synth_bmp,
    )

    media = synth_bmp(docs.limit(8))
    got = {r["media_id"]: r["thumb_csv"] for r in resize_bmp_nearest(media, 4, 4).collect()}
    assert len(got) == 8
    for mid, csv in got.items():
        w, h = 8 + mid % 9, 4 + (mid * 3) % 7
        want = []
        for j in range(4):
            for i in range(4):
                sx, sy = (i * w) // 4, (j * h) // 4
                want += [
                    (mid + 3 * sx + 7 * sy) % 256,
                    (2 * mid + 5 * sx + 11 * sy) % 256,
                    (mid + sx * sy) % 256,
                ]
        assert csv == ",".join(str(v) for v in want)

    with _pytest.raises(ValueError):
        resize_bmp_nearest(media, 0, 4)
    junk = spark.createDataFrame(
        [(7, b"\x00\x01")], "media_id long, payload binary"
    )
    (row,) = resize_bmp_nearest(junk).collect()
    assert row["thumb_csv"] is None


def test_dsir_weights(spark, docs):
    """Exact python replay of the hashed-unigram LLR pipeline (same md5
    bucketing, add-one smoothing, and 1e-9 quantized sum) on a closed-form
    fixture and on the sf0.001 corpus."""
    from subgraph_isomorphism_pregel_spark.operators.textops import dsir_weights

    def replay(rows, target_langs=("en",), n_buckets=4096):
        bucket = lambda t: int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % n_buckets
        ct, cr = {}, {}
        for _, text, lang in rows:
            for t in py_tokens(text):
                b = bucket(t)
                cr[b] = cr.get(b, 0) + 1
                if lang in target_langs:
                    ct[b] = ct.get(b, 0) + 1
        t_tot = float(sum(ct.values()) + n_buckets)
        r_tot = float(sum(cr.values()) + n_buckets)
        q = {
            b: math.floor(
                math.log(((ct.get(b, 0) + 1.0) * r_tot) / ((cr[b] + 1.0) * t_tot))
                * 1e9
                + 0.5
            )
            for b in cr
        }
        want = {}
        for did, text, lang in rows:
            toks = py_tokens(text)
            if not toks:
                continue
            qs = sum(q[bucket(t)] for t in toks)
            want[did] = (len(toks), round(qs / 1e9 / len(toks), 6))
        return want

    rows = [(1, "aa aa bb", "en"), (2, "aa cc", "de"), (3, "  ", "en")]
    d = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["llr_avg"])
        for r in dsir_weights(d).collect()
    }
    assert got == replay(rows)  # tokenless doc 3 has no row
    # target-language tokens must score strictly above the disjoint
    # non-target token on this fixture
    assert got[1][1] > got[2][1]

    corpus = [(r["doc_id"], r["text"], r["lang"]) for r in docs.collect()]
    got2 = {
        r["doc_id"]: (r["n_tokens"], r["llr_avg"])
        for r in dsir_weights(docs).collect()
    }
    assert got2 == replay(corpus)


def test_tfidf_cosine_pairs(spark):
    """Exact python replay of the quantized sparse-cosine pipeline, plus
    closed-form identical-doc / disjoint-doc behavior."""
    from subgraph_isomorphism_pregel_spark.operators.dedup import (
        tfidf_cosine_pairs,
    )

    rows = [
        (1, "apple banana cherry"),
        (2, "apple banana cherry"),      # exact dup of 1 -> cos 1.0
        (3, "apple banana date"),        # partial overlap
        (4, "elderberry fig grape"),     # disjoint -> no pair
        (5, "the the the the"),          # high-tf single common term
    ]

    def replay(rows, threshold, max_df):
        toks = {d: py_tokens(t) for d, t in rows}
        tf = {}
        for d, ts in toks.items():
            for t in ts:
                tf[(d, t)] = tf.get((d, t), 0) + 1
        df = {}
        for (d, t), _ in tf.items():
            df[t] = df.get(t, 0) + 1
        n = float(len(rows))
        w = {
            (d, t): c * math.log(n / df[t])
            for (d, t), c in tf.items()
            if df[t] <= max_df
        }
        q = lambda x: math.floor(x * 1e9 + 0.5)
        nq = {}
        for (d, t), v in w.items():
            nq[d] = nq.get(d, 0) + q(v * v)
        dq = {}
        docs = sorted(toks)
        for i, a in enumerate(docs):
            for b in docs[i + 1:]:
                s = 0
                shared = False
                for t in set(x for dd, x in w if dd == a):
                    if (b, t) in w:
                        shared = True
                        s += q(w[(a, t)] * w[(b, t)])
                if shared:
                    dq[(a, b)] = s
        out = {}
        for (a, b), s in dq.items():
            cos = round(
                (s / 1e9)
                / (math.sqrt(nq[a] / 1e9) * math.sqrt(nq[b] / 1e9)),
                6,
            )
            if cos >= threshold:
                out[(a, b)] = cos
        return out

    d = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"]): r["cos_r"]
        for r in tfidf_cosine_pairs(d, threshold=0.1, max_df=10).collect()
    }
    want = replay(rows, 0.1, 10)
    assert got == want
    assert got[(1, 2)] == 1.0           # exact duplicates
    assert 0.1 <= got[(1, 3)] < 1.0     # partial overlap, graded
    assert not any(4 in p for p in got)  # disjoint doc never pairs
