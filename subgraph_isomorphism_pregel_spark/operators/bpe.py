"""Distributed BPE vocabulary training — the word-frequency-table
formulation, deterministic and exactly SQL-twinnable.

Byte-pair encoding (Sennrich et al. 2016) learns a tokenizer vocabulary by
repeatedly merging the most frequent adjacent symbol pair. The naive form
rescans the corpus per merge; the formulation that actually scales — and
the one every production trainer uses — collapses the corpus to its WORD
FREQUENCY TABLE first (distinct words with counts), because merges never
cross word boundaries: a 100 TB corpus becomes a vocabulary-sized table
(10^6-10^8 rows), and every merge round is a small aggregate over it, not
a corpus pass. That is exactly this operator: one corpus pass builds
(word, n), then `n_merges` driver-loop rounds of pair-count → argmax →
apply, each a few map-side-combined aggregates with one 1-row collect.

Symbols ride in ONE string column with each symbol wrapped in control
brackets: word "aaa" is "\\x01a\\x02\\x01a\\x02\\x01a\\x02". Applying
merge (l, r) is then a single builtin `replace` of "\\x01l\\x02\\x01r\\x02"
with "\\x01lr\\x02" — and because an engine-native replace scans
left-to-right consuming non-overlapping occurrences, it reproduces the
sequential greedy merge ("aaa" + (a,a) -> ["aa","a"]) exactly, while the
brackets make cross-boundary matches impossible (("xa","ay") never
matches pattern a·a). Both Spark's `replace` and DuckDB's `replace` share
these semantics, so the whole training loop unrolls into an exact ANSI-SQL
twin — merge table and all — with no float or ordering ambiguity:
the argmax is (count DESC, left ASC, right ASC).

Scale: the corpus pass is one groupBy(word) with partial aggregation; the
per-round pair explode is bounded by Σ word_len over DISTINCT words (the
vocabulary, not the corpus), and the argmax is a 1-row TakeOrdered.
Applying a learned merge list to text (`bpe_apply`) is a pure-codegen
chain of replaces — zero shuffles, no Python anywhere.

Convention: words split on runs of whitespace; symbols are characters (no
end-of-word marker); merges apply within words only; control chars
\\x01/\\x02 are stripped from input defensively. Parity-plus over the
reference (no tokenizer there); the LLM-pipeline twin of token_count_bpe's
regex approximation (textops.py) with a REAL learned vocabulary.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

L = "\x01"  # symbol-open bracket
R = "\x02"  # symbol-close bracket


def _wrap(col):
    """Word -> bracketed symbol string: each character c becomes
    \\x01c\\x02 (control brackets stripped from the input first)."""
    return F.regexp_replace(
        F.translate(col, L + R, ""), "(?s)(.)", f"{L}$1{R}"
    )


def word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, ws, n): distinct whitespace-separated words with corpus
    frequency and the bracketed symbol-string start state."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .select("word", _wrap(F.col("word")).alias("ws"), "n")
    )


def _pair_counts(wt: DataFrame) -> DataFrame:
    """(l, r, cnt) over adjacent symbol pairs, weighted by word frequency."""
    syms = F.split(F.regexp_replace("ws", f"^{L}|{R}$", ""), f"{R}{L}")
    return (
        wt.select(syms.alias("syms"), "n")
        .where(F.size("syms") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "j -> struct(syms[j - 1] AS l, syms[j] AS r))"
                )
            ).alias("p"),
            "n",
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("n").alias("cnt"))
    )


def bpe_train(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Learn `n_merges` BPE merges from the corpus.

    -> (merges, words): merges = (rank int, left, right, freq long) in
    learned order; words = the final (word, ws, n) table whose bracketed
    symbol strings segment every word under the learned vocabulary (its
    split is the exact tokenization). Stops early when no adjacent pair
    remains. Deterministic: argmax by (freq DESC, left ASC, right ASC).
    """
    spark = docs.sparkSession
    workdir = tempfile.mkdtemp(prefix="bpe_")

    def cut(df: DataFrame, tag: str) -> DataFrame:
        path = f"{workdir}/{tag}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    wt = cut(word_table(docs, text_col), "w000")
    merges: list[tuple[int, str, str, int]] = []
    # apply each learned merge LAZILY (one more builtin replace on the ws
    # column) and cut the lineage to parquet only every CUT_EVERY rounds:
    # per round the argmax aggregate re-evaluates at most CUT_EVERY codegen
    # replaces over the vocabulary table (cheap) instead of paying a parquet
    # write+read round-trip per merge — halves the Spark jobs per merge
    # with a bit-identical merge sequence (replace order is preserved).
    CUT_EVERY = 8
    since_cut = 0
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(wt)
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((rank, l, r, cnt))
        wt = wt.select(
            "word",
            F.replace(
                F.col("ws"),
                F.lit(f"{L}{l}{R}{L}{r}{R}"),
                F.lit(f"{L}{l}{r}{R}"),
            ).alias("ws"),
            "n",
        )
        since_cut += 1
        if since_cut >= CUT_EVERY:
            wt = cut(wt, f"w{rank:03d}")
            since_cut = 0
    if since_cut:
        wt = cut(wt, "wfinal")
    mdf = spark.createDataFrame(
        merges, "rank int, left string, right string, freq long"
    )
    return mdf, wt


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize with a learned merge list: adds `out_col` = number of BPE
    tokens in `text_col` under `merges` (applied in learned order, the
    standard tokenizer semantics). Pure codegen — per word, the bracketed
    symbol string runs through one builtin replace per merge, and the
    token count is the surviving bracket count; zero shuffles, no Python.
    Merge lists beyond ~200 entries deepen the expression tree enough to
    stress JVM codegen; chunk the list or tokenize against the trained
    word table instead at that size."""

    def seg(w):
        expr = _wrap(w)
        for l, r in merges:
            expr = F.replace(expr, F.lit(f"{L}{l}{R}{L}{r}{R}"), F.lit(f"{L}{l}{r}{R}"))
        return expr

    words = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != "")
    # tokens in a bracketed string = split count on the inter-symbol
    # boundary (the brackets aren't regex metachars)
    counts = F.transform(words, lambda w: F.size(F.split(seg(w), f"{R}{L}")))
    return df.withColumn(
        out_col,
        F.coalesce(F.aggregate(counts, F.lit(0), lambda a, x: a + x), F.lit(0)).cast("long"),
    )
