"""Tokenizer / analysis chain (SURVEY.md §2.3, operators T1-T5, T10-T12).

Re-expresses the reference's Lucene ``EnglishAnalyzer`` chain
(reference: src/main/java/org/cs7is3/Indexer.java:21-25,
src/main/java/org/cs7is3/CustomAnalyzer.java:20-39) as a *code-aware*
tokenizer per the north rule: camelCase / snake_case subword splitting,
lowercasing, possessive stripping, fixed English stopword removal, and
an optional (off-by-default) Porter stemming stage for parity mode.

The tokenization SPEC is deliberately small and engine-portable so the
DuckDB correctness oracle can reproduce it exactly (RE2-safe regexes,
no lookaround, no pattern backreferences):

  1. strip possessive:  ``'[sS]\\b``            -> ''
  2. camel boundary A:  ``([a-z0-9])([A-Z])``   -> ``\\1 \\2``
  3. camel boundary B:  ``([A-Z]+)([A-Z][a-z])``-> ``\\1 \\2``
  4. lowercase
  5. tokens = maximal runs of ``[a-z0-9]``   (splits snake_case, punct)
  6. drop stopwords (pinned 33-word Lucene English stop set)
  7. optional Porter stem (parity mode only; default off for code)

Three equivalent implementations are provided and unit-tested equal:

* :func:`tokenize_pandas_udf` — vectorized pandas/Arrow UDF (the engine
  hot path, per BASELINE.json input_hint: no per-row Python).
* :func:`tokens_col` — pure Catalyst column expression (whole-stage
  codegen; used where we want zero Python in the plan).
* :func:`duckdb_tokens_sql` — SQL fragment for the DuckDB oracle.
"""

from __future__ import annotations

from typing import Iterable, List

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET — 33 fixed words
# (reference: CustomAnalyzer.java:18,33 via Lucene public source).
STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with",
)
_STOPSET = frozenset(STOPWORDS)

# RE2 / Java / Python compatible pieces of the spec.
RE_POSSESSIVE = r"'[sS]\b"
RE_CAMEL_A = r"([a-z0-9])([A-Z])"
RE_CAMEL_B = r"([A-Z]+)([A-Z][a-z])"
RE_TOKEN = r"[a-z0-9]+"
RE_NONTOKEN = r"[^a-z0-9]+"


# ---------------------------------------------------------------------------
# Porter stemmer (parity mode, SURVEY.md T5). Compact pure-Python
# implementation of the classic Porter (1980) algorithm — public
# algorithm; no external deps. Applied vectorized per Arrow batch.
# ---------------------------------------------------------------------------

_VOWELS = "aeiou"


def _cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    m, prev_c = 0, True
    started = False
    for i in range(len(stem)):
        c = _cons(stem, i)
        if started and prev_c and not c:
            pass
        if not c:
            started = True
        if c and started and not prev_c:
            m += 1
        prev_c = c
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    if not (_cons(w, len(w) - 3) and not _cons(w, len(w) - 2) and _cons(w, len(w) - 1)):
        return False
    return w[-1] not in "wxy"


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


import functools


@functools.lru_cache(maxsize=1 << 20)
def porter_stem(w: str) -> str:
    """Classic Porter stemmer. Only used when ``stem=True`` (parity
    mode). Memoized: token frequencies are Zipf, so the per-worker
    cache turns ~400M stem calls on a real corpus into ~1M unique ones
    (pure function — caching cannot change results)."""
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    break
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Implementation 1: vectorized pandas UDF (hot path)
# ---------------------------------------------------------------------------

def _tokenize_series(s: pd.Series, stem: bool, keep_stopwords: bool) -> pd.Series:
    s = s.fillna("")
    s = s.str.replace(RE_POSSESSIVE, "", regex=True)
    s = s.str.replace(RE_CAMEL_A, r"\1 \2", regex=True)
    s = s.str.replace(RE_CAMEL_B, r"\1 \2", regex=True)
    s = s.str.lower()
    toks = s.str.findall(RE_TOKEN)
    if keep_stopwords and not stem:
        return toks
    if stem:
        return toks.map(
            lambda ts: [porter_stem(t) for t in ts if keep_stopwords or t not in _STOPSET]
        )
    return toks.map(lambda ts: [t for t in ts if t not in _STOPSET])


def tokenize_pandas_udf(stem: bool = False, keep_stopwords: bool = False):
    """Return a pandas UDF column function: string col -> array<string>.

    Vectorized per Arrow batch (pandas ``.str`` regex kernels); the only
    per-row Python is the final stopword list-filter, which operates on
    already-split token lists.
    """

    @F.pandas_udf(ArrayType(StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        return _tokenize_series(s, stem, keep_stopwords)

    return _tok


def tokenize_texts(texts: Iterable[str], stem: bool = False,
                   keep_stopwords: bool = False) -> List[List[str]]:
    """Driver-side tokenization (query strings, tests). Same spec."""
    return _tokenize_series(pd.Series(list(texts), dtype=object), stem, keep_stopwords).tolist()


# NOTE: a struct-returning "tokenize + per-doc tf pre-aggregation" UDF
# was tried to cut the explode volume 4×, but the Python→Arrow
# list<struct<term,tf>> conversion measured ~10× slower than exploding
# the plain array<string> and letting the JVM's partial+final hash agg
# do the combine. Keep UDF returns to Arrow-native primitive arrays.


# ---------------------------------------------------------------------------
# Implementation 2: pure Catalyst column expression (no Python at all)
# ---------------------------------------------------------------------------

def tokens_col(col: Column, keep_stopwords: bool = False) -> Column:
    """Tokenizer as a built-in-function column: stays in whole-stage
    codegen, no UDF. No stemming variant (stemming is parity-mode only).
    """
    c = F.regexp_replace(col, RE_POSSESSIVE, "")
    c = F.regexp_replace(c, RE_CAMEL_A, r"$1 $2")
    c = F.regexp_replace(c, RE_CAMEL_B, r"$1 $2")
    c = F.lower(c)
    arr = F.split(c, RE_NONTOKEN)
    if keep_stopwords:
        return F.filter(arr, lambda t: t != F.lit(""))
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.filter(arr, lambda t: (t != F.lit("")) & ~F.array_contains(stops, t))


# ---------------------------------------------------------------------------
# Implementation 3: DuckDB oracle SQL fragment
# ---------------------------------------------------------------------------

def duckdb_clean_sql(col: str) -> str:
    """SQL expression producing the cleaned, lowercased string whose
    ``[a-z0-9]+`` runs are the tokens. RE2-safe."""
    return (
        "lower(regexp_replace(regexp_replace(regexp_replace("
        f"{col}, '''[sS]\\b', '', 'g'), "
        "'([a-z0-9])([A-Z])', '\\1 \\2', 'g'), "
        "'([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'))"
    )


def duckdb_stoplist_sql() -> str:
    return "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


def duckdb_tokens_sql(col: str, keep_stopwords: bool = False) -> str:
    """DuckDB fragment: table-function-style exploded tokens.

    Use as:  ``SELECT ... FROM t, unnest({this}) AS u(term) WHERE term <> ''``
    """
    base = f"regexp_split_to_array({duckdb_clean_sql(col)}, '[^a-z0-9]+')"
    return base
