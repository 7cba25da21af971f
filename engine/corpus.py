"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Input table per BASELINE.json ``input_hint``:
    (repo:string, path:string, commit:string, lang:string, content:string)

Content mixes camelCase / snake_case identifiers, stopwords,
digit-bearing tokens, possessives and punctuation over a Zipf
vocabulary (~5k terms) so head-term skew is exercised. Each document is
a pure function of ``(seed, i)`` — generation is identical at any
parallelism level and on the driver. The per-row invariant column is
``sha = sha2(content, 256)`` (BASELINE.json input_hint), checked after
every materialization.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EXTS = [("py", "python"), ("java", "java"), ("scala", "scala"), ("md", "markdown")]

_STEMS = [
    "get", "set", "parse", "read", "write", "index", "search", "merge",
    "split", "token", "score", "rank", "query", "doc", "term", "block",
    "codec", "shard", "batch", "stream", "cache", "hash", "sort", "scan",
    "join", "group", "filter", "map", "reduce", "emit", "flush", "commit",
    "spill", "buffer", "vector", "matrix", "graph", "node", "edge", "tree",
]
_SUFFIXES = ["", "er", "ing", "ed", "s", "able", "ment"]
_STOP_FILLER = ["the", "a", "of", "to", "and", "in", "is", "for", "with", "on"]
_PUNCT = ["(", ")", "{", "}", ";", ",", ".", "=", "->", "::"]

VOCAB_SIZE = 5000


@lru_cache(maxsize=1)
def _vocab_and_probs() -> tuple[np.ndarray, np.ndarray]:
    """Deterministic code-ish vocabulary + Zipf(1.07) sampling weights."""
    rng = np.random.default_rng(42)
    vocab: list[str] = []
    i = 0
    while len(vocab) < VOCAB_SIZE:
        a = _STEMS[i % len(_STEMS)]
        b = _STEMS[(i * 7 + 3) % len(_STEMS)]
        suf = _SUFFIXES[(i * 13) % len(_SUFFIXES)]
        style = i % 4
        if style == 0:  # camelCase
            w = a + b.capitalize() + suf
        elif style == 1:  # snake_case
            w = f"{a}_{b}{suf}"
        elif style == 2:  # digit-bearing
            w = f"{a}{b.capitalize()}{int(rng.integers(0, 100))}"
        else:  # plain
            w = a + suf
        vocab.append(w)
        i += 1
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    probs = 1.0 / ranks ** 1.07
    probs /= probs.sum()
    return np.array(vocab), probs


def _gen_doc(i: int, seed: int, min_tokens: int, max_tokens: int
             ) -> tuple[str, str, str, str, str]:
    """One corpus row as a pure function of (seed, i)."""
    vocab, probs = _vocab_and_probs()
    rng = np.random.default_rng(seed * 1_000_003 + i)
    repo = f"org{i % 7}/repo{i % 23}"
    ext, lang = _EXTS[i % len(_EXTS)]
    path = f"src/m{i % 11}/File{i}.{ext}"
    commit = hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:12]
    n_tok = int(rng.integers(min_tokens, max_tokens + 1))
    words = vocab[rng.choice(len(vocab), size=n_tok, p=probs)]
    parts: list[str] = []
    for k, w in enumerate(words):
        parts.append(w)
        m = (i * 31 + k) % 17
        if m == 0:
            parts.append(_STOP_FILLER[k % len(_STOP_FILLER)])
        elif m == 5:
            parts.append(_PUNCT[k % len(_PUNCT)])
        elif m == 11:
            parts.append(w + "'s")
    return repo, path, commit, lang, " ".join(parts)


_COLS = ["repo", "path", "commit", "lang", "content"]


def generate_corpus_pdf(n_docs: int, seed: int = 42,
                        min_tokens: int = 50, max_tokens: int = 2000) -> pd.DataFrame:
    """Driver-side generation (tiny/small fixtures, unit tests)."""
    rows = [_gen_doc(i, seed, min_tokens, max_tokens) for i in range(n_docs)]
    return pd.DataFrame(rows, columns=_COLS)


def generate_corpus_df(spark: SparkSession, n_docs: int, seed: int = 42,
                       partitions: int = 32, min_tokens: int = 50,
                       max_tokens: int = 2000) -> DataFrame:
    """Distributed generation: ``spark.range`` + ``mapInPandas``. Row i is
    the same at any parallelism level and equals the driver-side row i."""
    import pyspark.sql.types as T

    schema = T.StructType([T.StructField(c, T.StringType()) for c in _COLS])

    def gen(batches):
        for pdf in batches:
            rows = [_gen_doc(int(i), seed, min_tokens, max_tokens)
                    for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=_COLS)

    return spark.range(0, n_docs, 1, partitions).mapInPandas(gen, schema=schema)


def with_sha(df: DataFrame) -> DataFrame:
    """Attach the per-row content invariant (input_hint: sha256 equality)."""
    return df.withColumn("sha", F.sha2(F.col("content"), 256))
