"""Deterministic HyperLogLog distinct-count sketch.

The Elasticsearch ``cardinality`` aggregation (backed by Lucene's
HyperLogLogPlusPlus) answers "how many distinct values of this field
match the query" without a distinct shuffle — the reference's users
get it for free from the ES/Lucene stack the reference builds on
(reference: Assignment Two delegates all search plumbing to Lucene
9.9.2, SearchFiles.java:1).  At 100 TB a ``count(DISTINCT x)`` is a
full re-shuffle of every matched row on x; an HLL sketch is a
fixed-size (m = 4096 registers) state whose build is one map-side-
combinable ``max`` aggregation and whose merge is register-wise max —
THE cardinality plan at cluster scale.

This implementation is the classic Flajolet-Fuss-Gandouet-Meunier 2007
HLL (the 32-bit-hash formulation), made bit-for-bit reproducible
across engines so the DuckDB oracle can replicate it exactly:

* hash = first 8 hex digits of md5(value) — a 32-bit uniform (the
  house cross-engine hash recipe, same as the sampling operators);
* register index j = top ``P_BITS`` = 12 bits; rho = position of the
  leftmost 1-bit of the remaining 20 bits (bit-length via the binary
  string — exact integer arithmetic, no float log);
* the register sum Σ 2^-M[j] is computed as the INTEGER
  Σ 2^(RHO_MAX - M[j]) (≤ 4096·2^21 = 2^33, exact in int64 and in
  double) so no cross-engine float-summation-order divergence exists
  anywhere before the single final division;
* small-range (linear counting) and large-range corrections per the
  paper; only the corrections' single ln() touches libm, and the
  output is rounded (house 4 dp) to absorb last-ulp libm differences.

Standard error is 1.04/√m ≈ 1.6 % at m = 4096 (the ES default
``precision_threshold`` regime).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .portable import round_half_up

#: 2^P_BITS registers; 12 → m = 4096, ES cardinality's default regime.
P_BITS = 12
M_REGISTERS = 1 << P_BITS
W_BITS = 32 - P_BITS                # suffix bits that feed rho
RHO_MAX = W_BITS + 1                # rho(w=0) convention from the paper
#: bias correction constant alpha_m for m >= 128 (Flajolet et al. §4);
#: written as the same literal expression the oracle SQL uses so both
#: engines produce the identical IEEE double.
ALPHA_M = 0.7213 / (1.0 + 1.079 / float(M_REGISTERS))


def hll_registers(df: DataFrame, keys: Sequence[str],
                  value_col: str) -> DataFrame:
    """Per-key HLL register table: (keys..., register, rho).

    One narrow projection (md5 + integer bit ops, pure Catalyst) and
    one map-side-combinable ``max`` aggregation — at most
    ``m = 4096`` output rows per key regardless of input size.  NULL
    values are ignored (the ES cardinality convention).  Duplicate
    values need no pre-distinct: max() absorbs them, which is exactly
    why the sketch avoids the distinct shuffle.
    """
    h32 = (F.conv(F.substring(F.md5(F.col(value_col).cast("string")),
                              1, 8), 16, 10).cast("long"))
    j = F.shiftright(h32, W_BITS)
    w = h32.bitwiseAND(F.lit((1 << W_BITS) - 1))
    rho = (F.when(w == 0, F.lit(RHO_MAX))
           .otherwise(F.lit(RHO_MAX) - F.length(F.bin(w))))
    return (df.where(F.col(value_col).isNotNull())
            .select(*keys, j.alias("register"), rho.alias("r"))
            .groupBy(*keys, "register")
            .agg(F.max("r").alias("rho")))


def hll_estimate(registers: DataFrame, keys: Sequence[str],
                 ndigits: int = 4) -> DataFrame:
    """Collapse a register table to (keys..., v_zero, est).

    ``v_zero`` is the count of untouched registers (the linear-counting
    statistic) and ``est`` the corrected cardinality estimate.  The
    register sum stays integer (see module docstring) until the one
    final division, so the estimate is deterministic across engines.
    """
    # shiftleft with a COLUMN amount is SQL-only (the python wrapper
    # pins numBits to an int literal)
    two_pow_rho_inv = F.expr(
        f"shiftleft(cast(1 as bigint), {RHO_MAX} - rho)")
    agg = registers.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("occ"),
        F.sum(two_pow_rho_inv).alias("s_occ"))
    m = float(M_REGISTERS)
    v_zero = (F.lit(M_REGISTERS).cast("long") - F.col("occ"))
    s_total = (F.col("s_occ") +
               v_zero * F.lit(1 << RHO_MAX).cast("long"))
    raw = (F.lit(ALPHA_M * m * m * float(1 << RHO_MAX)) /
           s_total.cast("double"))
    two32 = float(1 << 32)
    est = (F.when((raw <= F.lit(2.5 * m)) & (v_zero > 0),
                  F.lit(m) * F.log(F.lit(m) / v_zero.cast("double")))
           .when(raw > F.lit(two32 / 30.0),
                 F.lit(-two32) * F.log(F.lit(1.0) - raw / F.lit(two32)))
           .otherwise(raw))
    return agg.select(*keys, v_zero.alias("v_zero"),
                      round_half_up(est, ndigits).alias("est"))


def hll_cardinality(df: DataFrame, keys: Sequence[str], value_col: str,
                    ndigits: int = 4) -> DataFrame:
    """Per-key approximate distinct count: registers → estimate."""
    return hll_estimate(hll_registers(df, keys, value_col), keys,
                        ndigits)


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------
#
# The frequency companion to HLL: a fixed DEPTH×WIDTH integer register
# grid whose build is one map-side-combinable ``sum`` aggregation and
# whose merge is register-wise add.  At 100 TB a "how often does each
# of these terms occur" over a token stream is either a full
# groupBy(token) shuffle (output proportional to the vocabulary) or a
# CMS: DEPTH·WIDTH counters per key regardless of input size, with the
# classic one-sided guarantee est ≥ true and
# P[est > true + ε·N] ≤ (1/2)^DEPTH at WIDTH = ⌈e/ε⌉.  Same
# cross-engine determinism recipe as the HLL above: md5-derived
# row-salted hashes, INTEGER-only accumulation, no float anywhere.

#: 4 rows × 1024 columns — ε ≈ e/1024 ≈ 0.27 % of the stream length,
#: failure probability 2^-4 per row set; 4 KiB of int64 per key.
CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_col(value, row: int):
    """Column index of ``value`` in CMS row ``row``: first 8 md5 hex
    digits of the row-salted value, mod WIDTH (md5 output is uniform,
    so the mod-2^10 fold keeps the uniformity)."""
    h32 = (F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{row}:"), value.cast("string"))),
        1, 8), 16, 10).cast("long"))
    return (h32 % CMS_WIDTH).cast("int")


def cms_registers(df: DataFrame, keys: Sequence[str],
                  value_col: str) -> DataFrame:
    """Per-key CMS register table: (keys..., row, col, cnt).

    One narrow projection (DEPTH md5s per input row), one posexplode
    (DEPTH-wide, a constant), one hash aggregation — at most
    DEPTH·WIDTH output rows per key.  NULL values are ignored.
    """
    v = F.col(value_col)
    cols = F.array(*[_cms_col(v, r) for r in range(CMS_DEPTH)])
    return (df.where(v.isNotNull())
            .select(*keys, F.posexplode(cols).alias("row", "col"))
            .groupBy(*keys, "row", "col")
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_lookup(registers: DataFrame, queries: DataFrame,
               keys: Sequence[str], value_col: str) -> DataFrame:
    """Point-estimate the count of each query value:
    (keys..., value_col, est) with est = min over rows of the
    addressed register (0 when a register was never touched — only
    possible when the estimate is exactly 0).

    The register table is DEPTH·WIDTH rows per key — broadcast-sized
    by construction, so the join never shuffles the query side.
    """
    v = F.col(value_col)
    probes = queries.select(
        *keys, v,
        F.posexplode(F.array(*[_cms_col(v, r)
                               for r in range(CMS_DEPTH)]))
        .alias("row", "col"))
    joined = probes.join(F.broadcast(registers),
                         [*keys, "row", "col"], "left")
    return (joined.groupBy(*keys, value_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
                 .alias("est")))


def cms_estimate_py(stream, query_values) -> dict:
    """Pure-Python replica (test oracle): identical arithmetic."""
    import hashlib

    regs: dict[tuple[int, int], int] = {}

    def _col(v, r):
        return int(hashlib.md5(f"{r}:{v}".encode()).hexdigest()[:8],
                   16) % CMS_WIDTH

    for v in stream:
        if v is None:
            continue
        for r in range(CMS_DEPTH):
            k = (r, _col(v, r))
            regs[k] = regs.get(k, 0) + 1
    return {q: min(regs.get((r, _col(q, r)), 0)
                   for r in range(CMS_DEPTH))
            for q in query_values}


def hll_estimate_py(values) -> float:
    """Pure-Python replica (test oracle): estimate for an iterable of
    string values, identical arithmetic to the DataFrame path."""
    import hashlib
    import math

    regs: dict[int, int] = {}
    for v in values:
        if v is None:
            continue
        h32 = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        j = h32 >> W_BITS
        w = h32 & ((1 << W_BITS) - 1)
        rho = RHO_MAX if w == 0 else RHO_MAX - w.bit_length()
        if rho > regs.get(j, 0):
            regs[j] = rho
    m = float(M_REGISTERS)
    v_zero = M_REGISTERS - len(regs)
    s_total = sum(1 << (RHO_MAX - r) for r in regs.values()) \
        + v_zero * (1 << RHO_MAX)
    raw = ALPHA_M * m * m * float(1 << RHO_MAX) / float(s_total)
    if raw <= 2.5 * m and v_zero > 0:
        est = m * math.log(m / v_zero)
    elif raw > float(1 << 32) / 30.0:
        est = -float(1 << 32) * math.log(1.0 - raw / float(1 << 32))
    else:
        est = raw
    import math as _m
    return _m.floor(est * 1e4 + 0.5) / 1e4


# ---------------------------------------------------------------------------
# Bloom filter (set membership with one-sided error)
# ---------------------------------------------------------------------------

# 4096 32-bit words = 131,072 bits. 32-bit words (not 64) so every
# mask 1 << (pos % 32) stays a small positive int64 in BOTH engines —
# DuckDB raises on 1::BIGINT << 63 overflow and Spark's sign bit would
# differ from it; 32-bit words dodge the whole class.
BLOOM_WORDS = 4096
BLOOM_WORD_BITS = 32
BLOOM_BITS = BLOOM_WORDS * BLOOM_WORD_BITS
BLOOM_K = 4


def _bloom_pos(value, i: int):
    """Bit position of hash i: 32-bit md5 uniform (house cross-engine
    recipe, salt 'i:') mod the filter size."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}:"), value)),
                           1, 8), 16, 10).cast("long")
    return h % F.lit(BLOOM_BITS)


def bloom_build(df: DataFrame, value_col: str) -> DataFrame:
    """Build a Bloom filter over a column of values: ≤ BLOOM_WORDS
    rows of (word_idx, bits), via one bitwise-OR hash aggregation —
    map-side combinable, fixed-size output regardless of input size
    (the reason to Bloom at 100 TB: a 16 KB broadcastable state
    replaces a distinct+join against the whole value set). Merge two
    filters by unioning rows and re-aggregating bit_or."""
    parts = [df.select(_bloom_pos(F.col(value_col), i).alias("pos"))
             for i in range(BLOOM_K)]
    allpos = parts[0]
    for p in parts[1:]:
        allpos = allpos.unionByName(p)
    bits = (allpos
            .withColumn("word_idx",
                        F.floor(F.col("pos") / BLOOM_WORD_BITS)
                        .cast("long"))
            .withColumn("lowbit",
                        (F.col("pos") % BLOOM_WORD_BITS).cast("int"))
            .select("word_idx",
                    F.expr("shiftleft(cast(1 as bigint), lowbit)")
                    .alias("bit")))
    return bits.groupBy("word_idx").agg(F.bit_or("bit").alias("bits"))


def bloom_probe(df: DataFrame, value_col: str,
                bloom: DataFrame) -> DataFrame:
    """Membership probe: adds a boolean ``maybe`` column — true iff
    ALL BLOOM_K bit positions of the value are set (one-sided: every
    true member tests true; non-members test true with probability
    ≈ (1 − e^{−k·n/m})^k).

    The 16 KB filter is COLLECTED once and baked into the plan as a
    literal word array (the JL-matrix recipe) — that fixed size is the
    entire point of a Bloom filter — so the probe is a zero-shuffle,
    zero-join per-row expression: K md5s + K array lookups per row.
    (The first cut probed via distinct + groupBy + join-back, which
    shuffled ~4×|distinct values| md5-string rows and OOM'd a local
    JVM at a 285M-gram real-corpus run; nothing about membership
    needs a shuffle.)"""
    wmap = {int(r["word_idx"]): int(r["bits"]) for r in bloom.collect()}
    words = F.array(*[F.lit(wmap.get(i, 0)) for i in range(BLOOM_WORDS)])
    masks = F.array(*[F.lit(1 << b) for b in range(BLOOM_WORD_BITS)])
    cond = None
    for i in range(BLOOM_K):
        pos = _bloom_pos(F.col(value_col), i)
        w = F.floor(pos / BLOOM_WORD_BITS).cast("int")
        lb = (pos % BLOOM_WORD_BITS).cast("int")
        ok = F.get(words, w).bitwiseAND(F.get(masks, lb)) != 0
        cond = ok if cond is None else (cond & ok)
    return df.withColumn(
        "maybe", F.when(F.col(value_col).isNull(), F.lit(None)
                        ).otherwise(cond))


def bloom_probe_py(values, member_values) -> dict:
    """Pure-Python replica (test oracle): same hash/bit arithmetic."""
    import hashlib

    words: dict[int, int] = {}
    for v in member_values:
        for i in range(BLOOM_K):
            h = int(hashlib.md5(f"{i}:{v}".encode()).hexdigest()[:8], 16)
            pos = h % BLOOM_BITS
            words[pos // BLOOM_WORD_BITS] = (
                words.get(pos // BLOOM_WORD_BITS, 0)
                | (1 << (pos % BLOOM_WORD_BITS)))
    out = {}
    for v in values:
        ok = True
        for i in range(BLOOM_K):
            h = int(hashlib.md5(f"{i}:{v}".encode()).hexdigest()[:8], 16)
            pos = h % BLOOM_BITS
            if not (words.get(pos // BLOOM_WORD_BITS, 0)
                    >> (pos % BLOOM_WORD_BITS)) & 1:
                ok = False
                break
        out[v] = ok
    return out
