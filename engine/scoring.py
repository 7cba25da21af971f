"""BM25 scoring (SURVEY.md §2.5 Q3; reference Searcher.java:25).

Single source of truth for the formula, pinned per SURVEY.md §4.3:

* Lucene >= 8 formula WITHOUT the rank-neutral ``(k1+1)`` numerator:
      score(t, d) = idf(t) * tf / (tf + k1 * (1 - b + b * dl / avgdl))
      idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
* exact (unquantized) document lengths, float64 end-to-end,
* ties broken by ascending doc_id everywhere.

Provided as plain Catalyst column math (whole-stage codegen, no UDF)
and as a numpy kernel (for the block-max WAND scorer), plus the exact
DuckDB SQL fragment so the oracle matches bit-for-bit in structure.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75

# LMDirichlet smoothing parameter (Lucene LMDirichletSimilarity default;
# the reference's §5.2.2 alternative-similarity experiment used it as-is)
MU = 2000.0


def idf_col(df_col: Column, n_docs: Column | float) -> Column:
    n = F.lit(float(n_docs)) if not isinstance(n_docs, Column) else n_docs
    return F.log1p((n - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)))


def bm25_col(tf_col: Column, df_col: Column, dl_col: Column,
             avgdl: Column | float, n_docs: Column | float,
             k1: float = K1, b: float = B) -> Column:
    """BM25 term-document partial score as a pure column expression."""
    av = F.lit(float(avgdl)) if not isinstance(avgdl, Column) else avgdl
    tf = tf_col.cast("double")
    denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl_col.cast("double") / av)
    return idf_col(df_col.cast("double"), n_docs) * tf / denom


def idf_np(df: np.ndarray, n_docs: float) -> np.ndarray:
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def bm25_np(tf: np.ndarray, idf: np.ndarray | float, dl: np.ndarray,
            avgdl: float, k1: float = K1, b: float = B) -> np.ndarray:
    tf = tf.astype(np.float64)
    denom = tf + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl)
    return idf * tf / denom


def bm25_sql(tf: str, df: str, dl: str, avgdl: str, n_docs: str,
             k1: float = K1, b: float = B) -> str:
    """DuckDB/ANSI SQL fragment computing the identical formula."""
    idf = f"ln(1.0 + ({n_docs} - {df} + 0.5) / ({df} + 0.5))"
    denom = f"({tf} + {k1} * (1.0 - {b} + {b} * {dl} / {avgdl}))"
    return f"({idf} * {tf} / {denom})"


# ---------------------------------------------------------------------------
# LMDirichlet (query-likelihood with Dirichlet smoothing) — the reference's
# published alternative similarity (GROUP_12.pdf §5.2.2: MAP 0.2791 via
# Lucene LMDirichletSimilarity). Pinned to Lucene's formula:
#
#   p(t|C)      = (ctf + 1) / (total_tokens + 1)      (LMSimilarity stats)
#   score(t, d) = max(0, log(1 + tf / (mu * p(t|C))) + log(mu / (dl + mu)))
#
# where ctf is the collection term frequency (Σ tf over all docs). Each
# term clause clamps at 0 independently (Lucene clamps per TermScorer),
# then SHOULD-clause scores sum, scaled by the clause boost. Exact doc
# lengths (no 8-bit norm quantization) — same documented divergence as
# BM25 (SURVEY.md §4.3).
# ---------------------------------------------------------------------------

def lmd_col(tf_col: Column, ctf_col: Column, dl_col: Column,
            total_tokens: Column | float, mu: float = MU) -> Column:
    """LMDirichlet term-document partial score as a column expression."""
    c = (F.lit(float(total_tokens))
         if not isinstance(total_tokens, Column) else total_tokens)
    p = (ctf_col.cast("double") + F.lit(1.0)) / (c + F.lit(1.0))
    # ln(1 + x), not log1p: Lucene's literal expression (LMDirichlet-
    # Similarity.score) and bit-identical to the DuckDB oracle's ln()
    raw = (F.log(F.lit(1.0) + tf_col.cast("double") / (F.lit(mu) * p))
           + F.log(F.lit(mu) / (dl_col.cast("double") + F.lit(mu))))
    return F.greatest(raw, F.lit(0.0))


def lmd_np(tf: np.ndarray, ctf: np.ndarray | float, dl: np.ndarray,
           total_tokens: float, mu: float = MU) -> np.ndarray:
    p = (np.asarray(ctf, dtype=np.float64) + 1.0) / (total_tokens + 1.0)
    raw = (np.log(1.0 + tf.astype(np.float64) / (mu * p))
           + np.log(mu / (dl.astype(np.float64) + mu)))
    return np.maximum(raw, 0.0)


def lmd_sql(tf: str, ctf: str, dl: str, total_tokens: str,
            mu: float = MU) -> str:
    """DuckDB/ANSI SQL fragment computing the identical formula."""
    p = f"(({ctf} + 1.0) / ({total_tokens} + 1.0))"
    raw = f"(ln(1.0 + {tf} / ({mu} * {p})) + ln({mu} / ({dl} + {mu})))"
    return f"greatest({raw}, 0.0)"


# ---------------------------------------------------------------------------
# Information-Based similarity (the reference's §5.2.2 "BM25 + IB
# Hybrid" row: MAP 0.3183 / P@20 0.486 / nDCG@20 0.5561 — "an IB
# (divergence-from-randomness) component in specific fields",
# GROUP_12.pdf). The paper does not publish the Lucene component
# choice, so the engine pins Lucene's canonical configuration
# IBSimilarity(DistributionLL, LambdaDF, NormalizationH2, c=1) —
# documented divergence like the exact-dl decision (SURVEY.md §4.3):
#
#   tfn       = tf * log2(1 + c * avgdl / dl)        (NormalizationH2)
#   λ         = (df + 1) / (N + 1)                   (LambdaDF)
#   score     = -log2(λ / (tfn + λ)) = log2(1 + tfn/λ)   (DistributionLL)
#
# Always ≥ 0 (tfn ≥ 0), matching Lucene 8+'s non-negative-score
# contract without an explicit clamp. SHOULD-clause scores sum,
# scaled by the clause boost, exactly like the other similarities.
# ---------------------------------------------------------------------------

IB_C = 1.0   # NormalizationH2 c (Lucene default)


# ---------------------------------------------------------------------------
# Lucene norm-quantization parity mode (SURVEY §4.3 decision: the
# engine standardizes on EXACT doc lengths; Lucene 8+ stores lengths
# as ONE BYTE via SmallFloat.intToByte4 and decodes with byte4ToInt at
# score time). The encode/decode roundtrip collapses to a closed form:
#
#   intToByte4: i < NUM_FREE_VALUES (= 255 - longToInt4(2^31-1) = 24)
#     → stored exactly; else 24 + longToInt4(i - 24), where longToInt4
#     keeps a 3-bit mantissa + implicit leading bit + exponent.
#   byte4ToInt inverts it, so byte4ToInt(intToByte4(dl)) =
#     dl                          if dl < 24
#     24 + msb4(dl - 24)          otherwise
#   with msb4(x) = x truncated to its 4 most significant bits
#   (x >> s << s, s = max(bitlength(x) - 4, 0)).
#
# Scoring with this quantized dl (avgdl stays exact — Lucene computes
# it from sumTotalTermFreq/docCount) reproduces Lucene's BM25 norm
# behavior, letting the ≈+1pt MAP delta previously ATTRIBUTED to
# exact-vs-quantized norms be measured directly
# (tools/trec_similarity.py --norms lucene).
# ---------------------------------------------------------------------------

_NORM_FREE = 24   # 255 - longToInt4(Integer.MAX_VALUE) in Lucene


def lucene_norm_dl(dl_col: Column) -> Column:
    """byte4ToInt(intToByte4(dl)) as a pure column expression."""
    x = dl_col.cast("long") - F.lit(_NORM_FREE)
    nb = F.length(F.bin(x))                      # bit length of x (>=0)
    shift = F.greatest(nb - F.lit(4), F.lit(0)).cast("double")
    p = F.pow(F.lit(2.0), shift)                 # exact for dl < 2^49
    q = (F.floor(x.cast("double") / p) * p).cast("long")
    return F.when(dl_col < _NORM_FREE, dl_col.cast("long")) \
        .otherwise(q + F.lit(_NORM_FREE))


def lucene_norm_dl_py(dl: int) -> int:
    """Pure-Python replica (test oracle) of the same roundtrip."""
    if dl < _NORM_FREE:
        return int(dl)
    x = int(dl) - _NORM_FREE
    shift = max(x.bit_length() - 4, 0)
    return ((x >> shift) << shift) + _NORM_FREE


def lucene_norm_dl_sql(dl: str) -> str:
    """DuckDB fragment computing the identical quantization (bin() and
    the power-of-two truncation behave identically there)."""
    x = f"(({dl})::BIGINT - {_NORM_FREE})"
    nb = f"length(bin({x}))"
    sh = f"greatest({nb} - 4, 0)"
    p = f"power(2.0, {sh})"
    q = f"(floor({x}::DOUBLE / {p}) * {p})::BIGINT"
    return (f"(CASE WHEN ({dl}) < {_NORM_FREE} THEN ({dl})::BIGINT "
            f"ELSE {q} + {_NORM_FREE} END)")


def ib_col(tf_col: Column, df_col: Column, dl_col: Column,
           avgdl: Column | float, n_docs: Column | float,
           c: float = IB_C) -> Column:
    """IB (LL·DF·H2) term-document partial score as a column expr."""
    av = F.lit(float(avgdl)) if not isinstance(avgdl, Column) else avgdl
    n = (F.lit(float(n_docs)) if not isinstance(n_docs, Column)
         else n_docs)
    tfn = tf_col.cast("double") * F.log2(
        F.lit(1.0) + F.lit(c) * av / dl_col.cast("double"))
    lam = (df_col.cast("double") + F.lit(1.0)) / (n + F.lit(1.0))
    return F.log2(F.lit(1.0) + tfn / lam)


def ib_np(tf: np.ndarray, df: np.ndarray | float, dl: np.ndarray,
          avgdl: float, n_docs: float, c: float = IB_C) -> np.ndarray:
    tfn = tf.astype(np.float64) * np.log2(
        1.0 + c * avgdl / dl.astype(np.float64))
    lam = (np.asarray(df, dtype=np.float64) + 1.0) / (n_docs + 1.0)
    return np.log2(1.0 + tfn / lam)


def ib_sql(tf: str, df: str, dl: str, avgdl: str, n_docs: str,
           c: float = IB_C) -> str:
    """DuckDB/ANSI SQL fragment computing the identical formula."""
    tfn = f"({tf} * log2(1.0 + {c} * {avgdl} / {dl}))"
    lam = f"(({df} + 1.0) / ({n_docs} + 1.0))"
    return f"log2(1.0 + {tfn} / {lam})"
