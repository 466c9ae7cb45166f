"""Text-analysis operators for a large-scale training-data pipeline, over a
``documents(doc_id, text, lang, source, n_chars)`` table.

All hot paths are pure Spark SQL expressions (whole-stage codegen, no Python),
and every operator has an exact DuckDB-SQL twin in __spark_entry__.oracle_sql:

- token_count      whitespace tokenization
- text_stats       quality scoring from length/punctuation/stopword ratios
- langid           marker-token language identification with deterministic
                   tie-breaking
- fingerprint      winnowing-style document fingerprint: min of the rolling
                   8-gram md5 hashes
- repetition_score duplicate word-n-gram fraction (the Gopher-style
                   repetition filter for LLM training corpora)
- tfidf_topk       per-document top-k terms by tf * ln(N/df)
- collocations     corpus top-k bigram collocations by pointwise mutual
                   information over a count floor
- token_entropy    per-document Shannon entropy of the token distribution
                   (gibberish / boilerplate detector)
- dsir_weights     DSIR importance weights: hashed-unigram log-likelihood
                   ratio of a target-domain model vs the raw corpus model
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import LANG_MARKERS, LANG_PRIORITY, STOPWORDS, count_in, tokens


def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) — whitespace tokens, empties dropped."""
    return docs.select("doc_id", F.size(tokens("text")).alias("n_tokens")).orderBy("doc_id")


# GPT-style pre-tokenizer classes, restricted to syntax with identical
# semantics in Java regex (Spark) and RE2 (DuckDB): letter runs, digit
# runs, and single non-alphanumeric marks
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_bpe(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_words, n_digit_runs, n_marks) — BPE-ish regex
    pre-tokenization counts: the token-budget estimator pipelines use when
    whitespace splitting undercounts (punctuation and numbers tokenize
    separately under a BPE vocabulary).  Pure codegen; zero shuffles."""
    def n(pat: str):
        return F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)))

    return docs.select(
        "doc_id",
        n(BPE_TOKEN_RE).alias("n_tokens"),
        n(r"[A-Za-z]+").alias("n_words"),
        n(r"[0-9]+").alias("n_digit_runs"),
        n(r"[^A-Za-z0-9\s]").alias("n_marks"),
    ).orderBy("doc_id")


def text_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars_calc, punct_count, stop_count, quality)

    quality = round((0.2*stop_ratio + 0.8*least(n_tokens,100)/100)
                    * (1 - punct_ratio), 6)
    with punct_ratio = punct_chars/chars, stop_ratio = stopword tokens/tokens.
    """
    t = tokens("text")
    d = docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.length("text").alias("n_chars_calc"),
        F.length(F.regexp_replace("text", r"[^.!?,;:]", "")).alias("punct_count"),
        count_in(t, STOPWORDS).alias("stop_count"),
    )
    stop_ratio = F.col("stop_count") / F.greatest(F.col("n_tokens"), F.lit(1))
    punct_ratio = F.col("punct_count") / F.greatest(F.col("n_chars_calc"), F.lit(1))
    quality = F.round(
        (0.2 * stop_ratio + 0.8 * F.least(F.col("n_tokens"), F.lit(100)) / 100.0)
        * (1.0 - punct_ratio),
        6,
    )
    return d.withColumn("quality", quality).orderBy("doc_id")


def langid(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang, score) — argmax of marker-token counts, ties broken
    by the fixed LANG_PRIORITY order."""
    t = tokens("text")
    scored = docs.select(
        "doc_id",
        *[count_in(t, LANG_MARKERS[l]).alias(f"s_{l}") for l in LANG_PRIORITY],
    )
    best = F.greatest(*[F.col(f"s_{l}") for l in LANG_PRIORITY])
    pred = F.lit(None).cast("string")
    # reversed so the FIRST language in priority order wins ties
    for l in reversed(LANG_PRIORITY):
        pred = F.when(F.col(f"s_{l}") == best, F.lit(l)).otherwise(pred)
    return scored.select(
        "doc_id", pred.alias("pred_lang"), best.cast("long").alias("score")
    ).orderBy("doc_id")


def repetition_score(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, n_ngrams, n_distinct, rep_ratio) — the duplicate word-n-gram
    fraction used by LLM-corpus repetition filters (Gopher-style): rep_ratio
    = 1 - distinct n-grams / total n-grams, 0 for documents with fewer than
    `n` tokens. Per-row codegen only (no shuffle, no Python): the n-gram
    list is a transform over token-slice windows, deduplicated with
    array_distinct inside the row."""
    t = tokens("text")
    d = docs.select("doc_id", t.alias("toks"))
    # guard the sequence: Spark's sequence(1, 0) counts DOWN, so only build
    # windows when the document actually has >= n tokens
    ng = F.expr(
        f"transform(sequence(1, size(toks) - {n - 1}),"
        f" i -> concat_ws(' ', slice(toks, i, {n})))"
    )
    d = d.withColumn(
        "ngs",
        F.when(F.size("toks") >= n, ng).otherwise(
            F.array().cast("array<string>")
        ),
    )
    rep = F.when(
        F.size("ngs") > 0,
        1.0 - F.size(F.array_distinct("ngs")) / F.size("ngs"),
    ).otherwise(F.lit(0.0))
    return d.select(
        "doc_id",
        F.size("ngs").alias("n_ngrams"),
        F.size(F.array_distinct("ngs")).alias("n_distinct"),
        F.round(rep, 6).alias("rep_ratio"),
    ).orderBy("doc_id")


def tfidf_topk(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, term, tf, df, score, rnk) — per-document top-k terms by
    tf * ln(N/df), ties broken by term ascending on the ROUNDED score so
    the ranking is engine-independent.

    Scale shape: one groupBy (doc_id, term) for tf (map-side combined),
    one groupBy term for df (small — the vocabulary — so AQE broadcasts
    the join back), one doc_id-partitioned window for the top-k. Nothing
    touches Python."""
    n_docs = docs.count()
    terms = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfx = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(dfx, "term").withColumn(
        "score",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
        .orderBy("doc_id", "rnk")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, n_hit, score_r, rank) — top-k documents by Okapi BM25
    against a fixed bag of query terms:

        idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)
        s(d, t) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

    n_hit = how many query terms the document contains. Per-term
    contributions are quantized to 9 decimals and summed as int64 (the
    `fixed_point_sum` discipline) so the per-doc score is
    order-independent; the rounded score ranks with doc_id tiebreak, so
    the top-k is engine-exact.

    Scale shape: the query-term filter lands BEFORE the (doc, term)
    groupBy — only postings of the |Q| query terms (a tiny fraction of
    the corpus) ever shuffle; df is a |Q|-row broadcast; dl/avgdl come
    from one scan-level aggregate with no explode. The final top-k is a
    TakeOrdered (no global sort materialization). Docs containing no
    query term score 0 and produce no row."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    terms = sorted(set(query_terms))
    n_docs = docs.count()
    dl = docs.select("doc_id", F.size(tokens("text")).alias("dl"))
    tot = dl.agg(F.sum("dl").alias("s"), F.count("*").alias("c")).first()
    avgdl = float(tot["s"]) / float(tot["c"]) if tot["c"] else 0.0
    hits = docs.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    ).where(F.col("term").isin(terms))
    tf = hits.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfx = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom
    scored = (
        tf.join(F.broadcast(dfx), "term")
        .join(dl, "doc_id")
        .withColumn("q", F.floor(contrib * F.lit(1e9) + F.lit(0.5)).cast("long"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"), F.sum("q").alias("qs"))
        .select(
            "doc_id", "n_hit", F.round(F.col("qs") / F.lit(1e9), 6).alias("score_r")
        )
    )
    top = scored.orderBy(F.desc("score_r"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score_r"), F.asc("doc_id"))
    return top.select(
        "doc_id", "n_hit", "score_r", F.row_number().over(w).alias("rank")
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) — winnowing-style fingerprint: the lexicographic min of
    md5 over all 8-char substrings (rolling k-grams). Documents shorter than
    8 chars fingerprint the whole text."""
    fp = F.array_min(
        F.expr(
            "transform(sequence(1, greatest(length(text)-7, 1)),"
            " i -> md5(substring(text, i, 8)))"
        )
    )
    return docs.select("doc_id", fp.alias("fp")).orderBy("doc_id")


# PII redaction patterns, applied IN ORDER (an email is consumed before the
# digit-run pass can see its local part). Kept to syntax shared verbatim by
# Java regex (Spark) and RE2 (DuckDB) so the SQL twin uses the same strings.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{9,}\b", "<NUM>"),
)


def quality_filter(
    docs: DataFrame,
    min_tokens: int = 5,
    max_tokens: int = 5000,
    max_punct_ratio: float = 0.12,
    min_stop_ratio: float = 0.02,
    max_rep_ratio: float = 0.15,
    ngram: int = 3,
) -> DataFrame:
    """(doc_id, n_tokens, too_short, too_long, high_punct, low_stop,
    repetitive, keep) — the Gopher-style composite pre-training filter:
    a document is kept iff it trips none of the five rules.

    Every flag is a pure per-row codegen expression (token/char counts,
    stopword ratio, duplicate word-n-gram fraction) — zero shuffles, so the
    filter runs at parquet-scan speed and `keep` pushes down as a predicate
    when used to subset the corpus.  Every ratio is ONE IEEE double
    division of two exact integer counts — both engines compute the same
    correctly-rounded quotient bit-for-bit, so the threshold comparisons
    (and hence the booleans) are engine-deterministic and hash-gate.
    """
    t = tokens("text")
    d = docs.select("doc_id", "text", t.alias("toks"))
    ng = F.expr(
        f"transform(sequence(1, size(toks) - {ngram - 1}),"
        f" i -> concat_ws(' ', slice(toks, i, {ngram})))"
    )
    d = d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.length(F.regexp_replace("text", r"[^.!?,;:]", "")).alias("punct"),
        count_in(F.col("toks"), STOPWORDS).alias("stops"),
        F.when(F.size("toks") >= ngram, ng)
        .otherwise(F.array().cast("array<string>"))
        .alias("ngs"),
    )
    punct_ratio = F.col("punct") / F.greatest(F.col("n_chars"), F.lit(1))
    stop_ratio = F.col("stops") / F.greatest(F.col("n_tokens"), F.lit(1))
    rep_ratio = F.when(
        F.size("ngs") > 0,
        1.0 - F.size(F.array_distinct("ngs")) / F.size("ngs"),
    ).otherwise(F.lit(0.0))
    flags = d.select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") < min_tokens).alias("too_short"),
        (F.col("n_tokens") > max_tokens).alias("too_long"),
        (punct_ratio > max_punct_ratio).alias("high_punct"),
        (stop_ratio < min_stop_ratio).alias("low_stop"),
        (rep_ratio > max_rep_ratio).alias("repetitive"),
    )
    keep = ~(
        F.col("too_short")
        | F.col("too_long")
        | F.col("high_punct")
        | F.col("low_stop")
        | F.col("repetitive")
    )
    return flags.withColumn("keep", keep).orderBy("doc_id")


def lm_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, lm_score) — average unigram log-probability of
    each document under the corpus's own unigram distribution: the
    perplexity-style quality signal corpus filters rank documents by.

    lm_score = (1/n) * sum over tokens of ln(c(tok)/N), where c is the
    corpus frequency and N the total token count.  The per-(doc, term)
    contribution tf*ln(p) is quantized to 6 decimal places and summed as
    int64 (the `fixed_point_sum` discipline), so the aggregate is
    order-independent and bit-identical across engines; the only float
    risk left is the last ulp of `ln` itself, the same exposure the
    gated tfidf operator already carries.

    Scale shape: one map-side-combined groupBy(doc_id, term) for tf, one
    groupBy(term) over the (small) vocabulary — AQE broadcasts it back —
    and one final groupBy(doc_id).  No Python anywhere.
    """
    terms = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    n_total = vocab.agg(F.sum("c")).collect()[0][0]
    contrib = tf.join(F.broadcast(vocab), "term").withColumn(
        "q",
        F.floor(
            F.col("tf")
            * F.log(F.col("c") / F.lit(float(n_total)))
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long"),
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.sum("tf").alias("n_tokens"), F.sum("q").alias("qs"))
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("qs") / F.lit(1e6) / F.col("n_tokens"), 6).alias(
                "lm_score"
            ),
        )
        .orderBy("doc_id")
    )


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, clean_text, n_email, n_ip, n_num): masks emails, IPv4
    addresses, and >=9-digit runs with typed placeholders — the standard
    pre-training scrub pass. Pure codegen (regexp_extract_all sizes +
    chained regexp_replace): zero shuffles, runs at scan speed; each
    count is taken on the text as it stood BEFORE that pattern's
    replacement, exactly as the SQL twin stages it."""
    t0 = F.col(text_col)
    (p_email, r_email), (p_ip, r_ip), (p_num, r_num) = PII_PATTERNS
    n_email = F.size(F.regexp_extract_all(t0, F.lit(p_email), F.lit(0)))
    t1 = F.regexp_replace(t0, p_email, r_email)
    n_ip = F.size(F.regexp_extract_all(t1, F.lit(p_ip), F.lit(0)))
    t2 = F.regexp_replace(t1, p_ip, r_ip)
    n_num = F.size(F.regexp_extract_all(t2, F.lit(p_num), F.lit(0)))
    t3 = F.regexp_replace(t2, p_num, r_num)
    return docs.select(
        "doc_id",
        t3.alias("clean_text"),
        n_email.cast("long").alias("n_email"),
        n_ip.cast("long").alias("n_ip"),
        n_num.cast("long").alias("n_num"),
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """(doc_id, chunk_id, start_token, n_tokens, chunk_text) — fixed-size
    context-window chunking with overlap, the standard pre-training /
    retrieval preprocessing step: whitespace tokens (the tokens() helper's
    convention), chunk k covering tokens [k*stride, k*stride + max_tokens)
    with stride = max_tokens - overlap, starts enumerated while
    start < n_tokens - overlap (one empty chunk for an empty/short doc, so
    every document survives into the chunk table). Pure codegen — one
    sequence+explode over row-local arrays, zero shuffles, zero Python;
    the identical enumeration is range(0, greatest(n-overlap,1), stride)
    in DuckDB (Spark's inclusive sequence endpoint n-overlap-1 and
    DuckDB's exclusive range stop n-overlap generate the same start set).
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    stride = max_tokens - overlap
    w = docs.select("doc_id", tokens("text").alias("ws"))
    n = F.size("ws")
    starts = F.sequence(
        F.lit(0), F.greatest(n - F.lit(overlap + 1), F.lit(0)), F.lit(stride)
    )
    ex = w.select("doc_id", "ws", F.explode(starts).alias("start_token"))
    piece = F.slice("ws", F.col("start_token") + 1, max_tokens)
    return ex.select(
        "doc_id",
        (F.col("start_token") / stride).cast("int").alias("chunk_id"),
        "start_token",
        F.size(piece).alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    ).orderBy("doc_id", "chunk_id")


def collocations(docs: DataFrame, min_count: int = 5, k: int = 20) -> DataFrame:
    """(w1, w2, pair_n, w1_n, w2_n, pmi, rnk) — corpus top-k bigram
    collocations by pointwise mutual information, the classic
    phrase-detection / tokenizer-vocabulary signal for training corpora:

        pmi = ln( P(w1,w2) / (P(w1) * P(w2)) )

    with P(w1,w2) = pair_n / n_bigrams and P(w) = w_n / n_tokens, keeping
    only bigrams seen >= min_count times (PMI is noise without a count
    floor). The expression is evaluated in a FIXED operation order —
    (pair_n / n_bigrams) / ((w1_n / n_tokens) * (w2_n / n_tokens)), one
    ln, one round(6) — mirrored token-for-token by the DuckDB oracle so
    the doubles agree bit-for-bit.

    Scale shape: bigrams come from a row-local parallel slice of the token
    array (zero self-joins, pure codegen), one (w1, w2) groupBy with
    map-side combine; the unigram table is vocabulary-sized so AQE
    broadcasts both joins back; the corpus totals are one 1-row aggregate.
    The top-k is a TakeOrdered over the min_count-filtered pair table (no
    global sort materialization); the rank window sees only k rows."""
    w = docs.select(tokens("text").alias("ws"))
    tot = w.agg(
        F.sum(F.size("ws")).alias("nt"),
        F.sum(F.greatest(F.size("ws") - F.lit(1), F.lit(0))).alias("np"),
    ).collect()[0]
    n_tokens, n_bigrams = int(tot["nt"] or 0), int(tot["np"] or 0)
    if n_bigrams == 0:
        raise ValueError("collocations: corpus has no bigrams")
    body = F.size("ws") - F.lit(1)
    pair = (
        w.where(F.size("ws") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice("ws", F.lit(1), body),
                    F.slice("ws", F.lit(2), body),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("pair_n"))
        .where(F.col("pair_n") >= min_count)
    )
    uni = (
        w.select(F.explode("ws").alias("wd"))
        .groupBy("wd")
        .agg(F.count("*").alias("w_n"))
    )
    s = (
        pair.join(uni.select(F.col("wd").alias("w1"), F.col("w_n").alias("w1_n")), "w1")
        .join(uni.select(F.col("wd").alias("w2"), F.col("w_n").alias("w2_n")), "w2")
    )
    pmi = F.round(
        F.log(
            (F.col("pair_n") / F.lit(n_bigrams))
            / ((F.col("w1_n") / F.lit(n_tokens)) * (F.col("w2_n") / F.lit(n_tokens)))
        ),
        6,
    )
    top = (
        s.withColumn("pmi", pmi)
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )
    # rank window runs over only the k surviving rows (single tiny task);
    # the limit itself is a TakeOrdered — no global sort materialization
    rw = Window.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    return top.select(
        "w1", "w2", "pair_n", "w1_n", "w2_n", "pmi",
        F.row_number().over(rw).alias("rnk"),
    ).orderBy("rnk")


def token_entropy(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct, entropy_r) — Shannon entropy (nats)
    of each document's OWN token distribution,

        H = -sum_t (c_t / n) * ln(c_t / n),

    the gibberish / boilerplate detector corpus filters pair with
    repetition_score: H ~ 0 flags one token repeated n times, H = ln(n)
    flags all-distinct noise, natural prose sits in between. Documents
    with no tokens produce no row (no distribution to measure).

    Each term's contribution is quantized to 9 decimals and summed as
    int64 (the `fixed_point_sum` discipline), so the per-doc aggregate is
    order-independent and bit-identical across engines — the only float
    exposure is ln's last ulp, the same carried by lm_score/tfidf.

    Scale shape: one map-side-combined groupBy(doc_id, term), one
    groupBy(doc_id) for totals, one join back on doc_id sharing the same
    hash key. No Python anywhere."""
    terms = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    nd = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.count("*").alias("n_distinct")
    )
    p = F.col("c") / F.col("n")
    contrib = tf.join(nd, "doc_id").withColumn(
        "q", F.floor(p * F.log(p) * F.lit(1e9) + F.lit(0.5)).cast("long")
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.first("n").alias("n_tokens"),
            F.first("n_distinct").alias("n_distinct"),
            F.sum("q").alias("qs"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.round(-(F.col("qs") / F.lit(1e9)), 6).alias("entropy_r"),
        )
        .orderBy("doc_id")
    )


def dsir_weights(
    docs: DataFrame,
    target_langs: tuple[str, ...] = ("en",),
    n_buckets: int = 4096,
) -> DataFrame:
    """(doc_id, n_tokens, llr_avg) — DSIR-style importance weights (Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling"): each document is scored by the average log-likelihood
    ratio of its hashed unigram features under a TARGET model (documents
    whose ``lang`` is in `target_langs`) vs the RAW corpus model,

        llr_avg = (1/n) * sum_tok ln( p_target(b(tok)) / p_raw(b(tok)) ),

    with b(tok) = int(md5(tok)[:8], 16) % n_buckets (the paper's hashed
    n-gram generalization: a FIXED feature space regardless of vocabulary
    size) and add-one smoothing over the bucket space. Positive weights
    mean "looks like the target domain"; importance resampling keeps
    documents with probability proportional to exp(llr). Documents with no
    tokens produce no row.

    Every per-token contribution is the bucket's llr quantized to 9
    decimals and summed as int64 (the `fixed_point_sum` discipline), so
    the per-doc aggregate is order-independent and bit-identical across
    engines; the only float exposure is ln's last ulp, the same carried by
    tfidf/lm_score/token_entropy.

    Scale shape: one map-side-combined groupBy(bucket) over the exploded
    tokens (the bucket table is FIXED at n_buckets rows no matter the
    corpus size — that is the point of feature hashing), one 2-value
    driver aggregate for the totals, then a broadcast join of the tiny
    bucket LUT back onto the tokens and one groupBy(doc_id). At 100 TB the
    LUT is still n_buckets rows: nothing here grows with the data except
    the two well-keyed shuffles."""
    tok = docs.select(
        "doc_id",
        F.col("lang").isin(*target_langs).alias("is_t"),
        F.explode(tokens("text")).alias("tok"),
    ).withColumn(
        "bucket",
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets),
    )
    counts = (
        tok.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
            F.count("*").alias("cr"),
        )
        .cache()
    )
    tot = counts.agg(F.sum("ct").alias("t"), F.sum("cr").alias("r")).collect()[0]
    t_tot = float((tot["t"] or 0) + n_buckets)
    r_tot = float((tot["r"] or 0) + n_buckets)
    # identical op order to the SQL twin: (ct+1)*(R+B) then /, one ln
    llr = F.log(
        ((F.col("ct") + F.lit(1.0)) * F.lit(r_tot))
        / ((F.col("cr") + F.lit(1.0)) * F.lit(t_tot))
    )
    # materialize the n_buckets-row LUT locally (JVM computes the ln, so q
    # is bit-identical to the lazy form) and release the cached bucket
    # table — leaving it cached leaked executor storage on every call
    lut_local = counts.select(
        "bucket", F.floor(llr * F.lit(1e9) + F.lit(0.5)).cast("long").alias("q")
    ).toPandas()
    counts.unpersist()
    lut = docs.sparkSession.createDataFrame(lut_local, "bucket long, q long")
    return (
        tok.join(F.broadcast(lut), "bucket")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("q").alias("qs"))
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("qs") / F.lit(1e9) / F.col("n_tokens"), 6).alias(
                "llr_avg"
            ),
        )
        .orderBy("doc_id")
    )
