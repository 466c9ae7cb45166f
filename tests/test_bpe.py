"""BPE trainer — oracle is the classic sequential word-frequency BPE
(pair counting + greedy left-to-right merge application), which the
distributed rounds must reproduce merge-for-merge; bpe_apply must match
a Python tokenizer applying the learned merges in order."""

import random

import pytest

from subgraph_isomorphism_pregel_spark.operators.bpe import bpe_apply, bpe_train


def _word_freqs(texts):
    freqs = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def _merge_word(syms, l, r):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _bpe_oracle(texts, n_merges):
    freqs = {tuple(w): n for w, n in _word_freqs(texts).items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = {}
        for syms, n in freqs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, cnt))
        freqs = {
            tuple(_merge_word(list(syms), l, r)): n for syms, n in freqs.items()
        }
    return merges, freqs


def _apply_oracle(text, merges):
    total = 0
    for w in text.split():
        syms = list(w)
        for l, r in merges:
            syms = _merge_word(syms, l, r)
        total += len(syms)
    return total


def _texts(seed, n_docs, vocab=("aa", "aab", "abab", "ba", "b", "cab", "aaaa")):
    rng = random.Random(seed)
    return [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 12)))
        for _ in range(n_docs)
    ]


@pytest.mark.parametrize("seed,n_docs,n_merges", [(1, 60, 8), (2, 40, 12)])
def test_merges_match_sequential_bpe(spark, seed, n_docs, n_merges):
    texts = _texts(seed, n_docs)
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    mdf, wt = bpe_train(docs, n_merges)
    got = [(r.rank, r.left, r.right, r.freq) for r in mdf.orderBy("rank").collect()]
    want, final_freqs = _bpe_oracle(texts, n_merges)
    assert got == want
    # the final word table's bracketed strings segment exactly like the oracle
    seg = {
        r.word: tuple(r.ws.strip("\x01\x02").split("\x02\x01"))
        for r in wt.collect()
    }
    want_seg = {"".join(s): s for s in final_freqs}
    assert seg == want_seg


def test_apply_matches_python_tokenizer(spark):
    texts = _texts(7, 30)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    mdf, _ = bpe_train(docs, 6)
    merges = [(r.left, r.right) for r in mdf.orderBy("rank").collect()]
    got = {
        r.doc_id: r.bpe_tokens for r in bpe_apply(docs, merges).collect()
    }
    assert got == {i: _apply_oracle(t, merges) for i, t in enumerate(texts)}


def test_early_stop_when_no_pairs_remain(spark):
    docs = spark.createDataFrame([("a b a",)], "text string")
    mdf, _ = bpe_train(docs, 10)  # single-char words: nothing to merge
    assert mdf.count() == 0


def test_overlapping_runs_merge_greedily(spark):
    # "aaaa" + merge (a,a): greedy gives [aa, aa]; "aaa" gives [aa, a]
    docs = spark.createDataFrame([("aaaa aaa",)], "text string")
    mdf, wt = bpe_train(docs, 1)
    m = mdf.collect()[0]
    assert (m.left, m.right, m.freq) == ("a", "a", 5)
    seg = {r.word: r.ws.strip("\x01\x02").split("\x02\x01") for r in wt.collect()}
    assert seg == {"aaaa": ["aa", "aa"], "aaa": ["aa", "a"]}


def test_control_chars_stripped_and_whitespace_runs(spark):
    docs = spark.createDataFrame([("ab\x01\x02ab \t  ab\n\nab",)], "text string")
    mdf, _ = bpe_train(docs, 1)
    m = mdf.collect()[0]
    # words: 'abab', 'ab', 'ab\n\nab'? no — \n is whitespace: ab, ab, abab
    assert (m.left, m.right) == ("a", "b")
    assert m.freq == 4
