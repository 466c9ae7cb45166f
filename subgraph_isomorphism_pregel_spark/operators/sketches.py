"""Deterministic cardinality / frequency sketches (training-data pipeline ops).

Both sketches hash with md5 so every intermediate — register values, counter
cells, the final estimate's IEEE-754 arithmetic — reproduces bit-for-bit in
any engine, giving each operator an EXACT DuckDB SQL twin (the same design
rule as bloom.py / the LSH family: approximate ALGORITHMS, deterministic
ANSWERS).  The reference has no sketch layer (its utils/ Bloom filter is dead
code, SURVEY §2.6); these are engine breadth for the 100 TB corpus path,
where exact count-distinct / per-token groupBy would shuffle the full key
set: the HLL register table is 2^p rows and the CMS counter table d·w rows,
both broadcastable, regardless of input size.

Exactness notes (why the doubles are safe to hash-gate):
- every 2^(R-M) term is an exact integer-valued double (exponents ≤ 28) and
  their sums stay < 2^53, so Spark's partition-order-dependent SUM is still
  exact — addition of exact ints in any order is exact;
- the single division num/S happens once, on bit-identical operands, and
  IEEE-754 division is deterministic;
- only the linear-counting branch (small cardinalities) uses ln(); its twin
  mirrors the same expression, and the gated fixture sits in the raw-regime
  by construction (500 distinct docs >> 2.5·m at p=6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# alpha_m bias correction (Flajolet et al. 2007, Fig. 3)
_ALPHA = {4: 0.673, 5: 0.697, 6: 0.709}


def hll_params(p: int) -> tuple[int, int, int, float]:
    """(m, W, R, numerator) for precision p: m = 2^p registers over the top
    p bits of a 32-bit md5 prefix, W = 32-p remainder bits, R = W+1 the
    maximum rank, numerator = alpha·m²·2^R (precomputed in Python so the
    Spark plan and the SQL twin embed the IDENTICAL double literal)."""
    if not 4 <= p <= 16:
        raise ValueError(f"hll_distinct: p must be in [4, 16], got {p}")
    m = 1 << p
    W = 32 - p
    R = W + 1
    alpha = _ALPHA.get(p, 0.7213 / (1 + 1.079 / m))
    return m, W, R, alpha * m * m * float(2**R)


def hll_distinct(df: DataFrame, col: str = "text", p: int = 6) -> DataFrame:
    """One-row (est_distinct double) HyperLogLog cardinality estimate.

    h = first 8 hex chars of md5(col) as a 32-bit int; register = top p
    bits; rank = leading zeros of the remaining W bits + 1 (computed
    exactly via length(bin(w)) — string-based, no float log2); standard
    raw estimate alpha·m²/Σ2^(-M[j]) with empty registers contributing
    2^0, linear counting m·ln(m/V) below 2.5m when V empty registers
    remain.  Two shuffles total: the 2^p-row register aggregate and the
    final single-row fold — input size never shuffles."""
    m, W, R, num = hll_params(p)
    h = F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10).cast("long")
    b = F.shiftright(h, W)
    w = h.bitwiseAND(F.lit((1 << W) - 1))
    bitlen = F.when(w == F.lit(0), F.lit(0)).otherwise(F.length(F.bin(w)))
    rank = F.lit(W) - bitlen + F.lit(1)
    regs = (
        df.select(b.alias("b"), rank.alias("r"))
        .groupBy("b")
        .agg(F.max("r").alias("M"))
    )
    agg = regs.agg(
        F.count("*").alias("nb"),
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), F.lit(R) - F.col("M"))), F.lit(0.0)
        ).alias("s_present"),
    )
    v = F.lit(m) - F.col("nb")
    s = F.col("s_present") + v * F.lit(float(2**R))
    e_raw = F.lit(num) / s
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(e_raw)
    return agg.select(est.alias("est_distinct"))


def hll_sql(table: str, col: str = "text", p: int = 6) -> str:
    """The exact DuckDB twin of hll_distinct (identical literals, identical
    operation order) — used by the gate and handy as documentation."""
    m, W, R, num = hll_params(p)
    mask = (1 << W) - 1
    return f"""
WITH h AS (
  SELECT CAST(CAST('0x' || substr(md5({col}), 1, 8) AS UBIGINT) AS BIGINT) AS h32
  FROM {table}),
rk AS (
  SELECT h32 // {mask + 1} AS b,
         {W} - (CASE WHEN h32 % {mask + 1} = 0 THEN 0
                     ELSE length(bin(h32 % {mask + 1})) END) + 1 AS r
  FROM h),
regs AS (SELECT b, max(r) AS M FROM rk GROUP BY b),
agg AS (SELECT count(*) AS nb,
               coalesce(sum(2.0 ** ({R} - M)), 0.0) AS s_present
        FROM regs)
SELECT CASE WHEN {num!r} / (s_present + ({m} - nb) * {float(2**R)!r})
            <= {2.5 * m!r} AND ({m} - nb) > 0
       THEN {float(m)!r} * ln({float(m)!r} / ({m} - nb))
       ELSE {num!r} / (s_present + ({m} - nb) * {float(2**R)!r}) END
       AS est_distinct
FROM agg
"""


def cms_heavy_hitters(
    docs: DataFrame,
    k: int = 20,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Count-min-sketch token heavy hitters: (token, est long) — the top-k
    distinct tokens by sketch-estimated frequency (ties broken by token).

    Each of `depth` rows hashes tokens into `width` counting buckets with
    bucket_r(t) = md5('r:' || t) mod width; est(t) = min_r counter[r][b] —
    the classic CMS upper bound (over-estimates only, by colliding tokens).
    The counter table is depth·width rows regardless of corpus size (the
    broadcastable summary a 100 TB token stream needs); the candidate probe
    joins the DISTINCT token set against it.  Deterministic md5 bucketing
    makes even the collision error identical in the DuckDB twin."""
    from ..functions import tokens

    tok = docs.select(F.explode(tokens("text")).alias("t"))

    def bucket(r: int):
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{r}:"), F.col("t"))), 1, 8), 16, 10
        ).cast("long") % width

    # all depth rows of the sketch in ONE pass over the token explode (a
    # per-row union re-executes the tokenize+explode plan depth times):
    # posexplode the per-row bucket array, then one groupBy
    buckets = F.posexplode(F.array(*[bucket(r) for r in range(depth)])).alias("r", "b")
    counters = (
        tok.select(buckets).groupBy("r", "b").agg(F.count("*").alias("cnt"))
    )
    cand = tok.distinct()
    probes = cand.select("t", buckets)
    est = (
        probes.join(F.broadcast(counters), ["r", "b"])
        .groupBy("t")
        .agg(F.min("cnt").alias("est"))
    )
    return (
        est.orderBy(F.desc("est"), F.asc("t"))
        .limit(k)
        .select(F.col("t").alias("token"), "est")
    )
