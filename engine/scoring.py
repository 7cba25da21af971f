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
