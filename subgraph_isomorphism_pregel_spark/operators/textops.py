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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import LANG_MARKERS, LANG_PRIORITY, STOPWORDS, count_in, tokens


def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) — whitespace tokens, empties dropped."""
    return docs.select("doc_id", F.size(tokens("text")).alias("n_tokens")).orderBy("doc_id")


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
