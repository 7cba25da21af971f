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

import numpy as np
import pandas as pd
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

# Default 4096 32-bit words = 131,072 bits — right for benchmark-sized
# member sets (≈10k elements at 10 bits/element for ~1% FP); callers
# with bigger sets pass n_words (bloom_decontaminate auto-sizes).
# 32-bit words (not 64) so every mask stays a small positive int64 in
# BOTH engines — DuckDB raises on 1::BIGINT << 63 and the sign bit
# would diverge from Spark; 32-bit words dodge the whole class.
BLOOM_WORDS = 4096
BLOOM_WORD_BITS = 32
BLOOM_K = 4
BLOOM_BITS_PER_ELEM = 10          # sizing target: ~1% FP at k=4
# literal-array probe is plan-friendly up to this size; bigger filters
# probe through a vectorized pandas UDF with the words as a numpy
# closure (identical bit arithmetic, no Catalyst plan bloat)
_BLOOM_LITERAL_MAX_WORDS = 8192


def _bloom_h12(value):
    """Two independent 32-bit uniforms from ONE md5 (hex digits 1-8
    and 9-16) — Kirsch-Mitzenmacher double hashing derives all K
    positions as (h1 + i·h2) without K separate digests. h2 is forced
    odd so the stride never degenerates to 0."""
    d = F.md5(value.cast("string"))
    h1 = F.conv(F.substring(d, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(d, 9, 8), 16, 10).cast("long")
    return h1, h2.bitwiseOR(F.lit(1))


def bloom_build(df: DataFrame, value_col: str,
                n_words: int = BLOOM_WORDS) -> DataFrame:
    """Build a Bloom filter over a column of values: ≤ ``n_words``
    rows of (word_idx, bits), via one bitwise-OR hash aggregation —
    map-side combinable, fixed-size output regardless of input size
    (the reason to Bloom at 100 TB: a KB-scale broadcastable state
    replaces a distinct+join against the whole value set). ONE md5
    per value (double hashing); merge two same-sized filters by
    unioning rows and re-aggregating bit_or."""
    bits_m = int(n_words) * BLOOM_WORD_BITS
    h1, h2 = _bloom_h12(F.col(value_col))
    pos = F.explode(F.array(
        *[(h1 + F.lit(i) * h2) % F.lit(bits_m) for i in range(BLOOM_K)]
    )).alias("pos")
    bits = (df.where(F.col(value_col).isNotNull())
            .select(pos)
            .withColumn("word_idx",
                        F.floor(F.col("pos") / BLOOM_WORD_BITS)
                        .cast("long"))
            .withColumn("lowbit",
                        (F.col("pos") % BLOOM_WORD_BITS).cast("int"))
            .select("word_idx",
                    F.expr("shiftleft(cast(1 as bigint), lowbit)")
                    .alias("bit")))
    return bits.groupBy("word_idx").agg(F.bit_or("bit").alias("bits"))


def bloom_probe(df: DataFrame, value_col: str, bloom: DataFrame,
                n_words: int = BLOOM_WORDS) -> DataFrame:
    """Membership probe: adds a boolean ``maybe`` column — true iff
    ALL BLOOM_K bit positions of the value are set (one-sided: every
    true member tests true; non-members test true with probability
    ≈ (1 − e^{−k·n/m})^k).

    The filter is COLLECTED once (its fixed size is the entire point)
    and evaluated per-row with zero shuffles and zero joins: for
    ≤ {_BLOOM_LITERAL_MAX_WORDS} words it bakes into the plan as a
    literal word array (the JL-matrix recipe); larger filters probe
    through a vectorized pandas UDF over the (h1, h2) hash columns
    with the words as a numpy closure. (The first cut probed via
    distinct + groupBy + join-back, which shuffled ~4×|distinct
    values| md5-string rows and OOM'd a local JVM at a 285M-gram
    real-corpus run; nothing about membership needs a shuffle.)"""
    bits_m = int(n_words) * BLOOM_WORD_BITS
    wmap = {int(r["word_idx"]): int(r["bits"]) for r in bloom.collect()}
    h1, h2 = _bloom_h12(F.col(value_col))

    if n_words <= _BLOOM_LITERAL_MAX_WORDS:
        words = F.array(*[F.lit(wmap.get(i, 0)) for i in range(n_words)])
        masks = F.array(*[F.lit(1 << b) for b in range(BLOOM_WORD_BITS)])
        cond = None
        for i in range(BLOOM_K):
            pos = (h1 + F.lit(i) * h2) % F.lit(bits_m)
            w = F.floor(pos / BLOOM_WORD_BITS).cast("int")
            lb = (pos % BLOOM_WORD_BITS).cast("int")
            ok = F.get(words, w).bitwiseAND(F.get(masks, lb)) != 0
            cond = ok if cond is None else (cond & ok)
        return df.withColumn(
            "maybe", F.when(F.col(value_col).isNull(), F.lit(None)
                            ).otherwise(cond))

    arr = np.zeros(n_words, dtype=np.uint32)
    for i, b in wmap.items():
        arr[i] = b

    @F.pandas_udf("boolean")
    def _probe(h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        # NULL-value rows reach the UDF too (Spark computes UDFs in a
        # separate projection; the when()-guard only discards the
        # result) — fill before the int cast so numpy stays clean
        a = h1s.fillna(0).to_numpy(dtype=np.int64)
        b = h2s.fillna(1).to_numpy(dtype=np.int64)
        ok = np.ones(len(a), dtype=bool)
        for i in range(BLOOM_K):
            pos = (a + i * b) % bits_m
            ok &= (arr[pos // BLOOM_WORD_BITS]
                   >> (pos % BLOOM_WORD_BITS).astype(np.uint32)) & 1 == 1
        return pd.Series(ok)

    return (df.withColumn("_h1", h1).withColumn("_h2", h2)
            .withColumn("maybe",
                        F.when(F.col(value_col).isNull(), F.lit(None))
                        .otherwise(_probe(F.col("_h1"), F.col("_h2"))))
            .drop("_h1", "_h2"))


def bloom_size_for(n_values: int) -> int:
    """Power-of-two word count sized for ~1% FP at K=4
    (BLOOM_BITS_PER_ELEM bits/element), floored at the default and
    capped at 2^24 words (64 MB closure — past that the filter stops
    being a sensibly shippable per-task state). A capped filter is
    SATURATION territory — the exact failure the sizing exists to
    prevent (131k bits at 275k elements measured FP≈1) — so hitting
    the cap warns loudly instead of silently over-flagging."""
    import warnings

    need = max(BLOOM_WORDS,
               (n_values * BLOOM_BITS_PER_ELEM + BLOOM_WORD_BITS - 1)
               // BLOOM_WORD_BITS)
    w = 1
    while w < need:
        w <<= 1
    cap = 1 << 24
    if w > cap:
        warnings.warn(
            f"bloom_size_for: {n_values} elements want {w} words but "
            f"the cap is {cap} — fill fraction will exceed the ~1% FP "
            f"design point; expect heavy over-flagging (one-sided "
            f"guarantee still holds). Consider exact decontaminate() "
            f"or sharding the member set.", RuntimeWarning)
        return cap
    return w


def bloom_probe_py(values, member_values,
                   n_words: int = BLOOM_WORDS) -> dict:
    """Pure-Python replica (test oracle): same double-hash bit
    arithmetic as the DataFrame path."""
    import hashlib

    bits_m = n_words * BLOOM_WORD_BITS

    def h12(v):
        d = hashlib.md5(str(v).encode()).hexdigest()
        return int(d[:8], 16), int(d[8:16], 16) | 1

    words: dict[int, int] = {}
    for v in member_values:
        h1, h2 = h12(v)
        for i in range(BLOOM_K):
            pos = (h1 + i * h2) % bits_m
            words[pos // BLOOM_WORD_BITS] = (
                words.get(pos // BLOOM_WORD_BITS, 0)
                | (1 << (pos % BLOOM_WORD_BITS)))
    out = {}
    for v in values:
        h1, h2 = h12(v)
        ok = True
        for i in range(BLOOM_K):
            pos = (h1 + i * h2) % bits_m
            if not (words.get(pos // BLOOM_WORD_BITS, 0)
                    >> (pos % BLOOM_WORD_BITS)) & 1:
                ok = False
                break
        out[v] = ok
    return out
