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

# ---------------------------------------------------------------------------
# T6 — ASCII folding (Lucene ASCIIFoldingFilter analog; reference wired
# it in the unused CustomAnalyzer.java:31 then abandoned it). Pinned
# table: all Latin-1 Supplement letters + the Latin Extended-A letters
# seen in European text. Lucene's full table covers further Unicode
# blocks (Greek presentation forms etc.) — out of scope for the corpora
# the reference targets; divergence documented here. 1:1 mappings go
# through translate(); multi-char expansions through a replace chain —
# both primitives exist identically in pandas, Catalyst and DuckDB, so
# the fold is oracle-portable.
# ---------------------------------------------------------------------------

_FOLD_1TO1: tuple[tuple[str, str], ...] = (
    ("ÀÁÂÃÄÅĀĂĄ", "A"), ("àáâãäåāăą", "a"),
    ("ÇĆĈĊČ", "C"), ("çćĉċč", "c"),
    ("ÐĎĐ", "D"), ("ðďđ", "d"),
    ("ÈÉÊËĒĔĖĘĚ", "E"), ("èéêëēĕėęě", "e"),
    ("ĜĞĠĢ", "G"), ("ĝğġģ", "g"),
    ("ĤĦ", "H"), ("ĥħ", "h"),
    ("ÌÍÎÏĨĪĬĮİ", "I"), ("ìíîïĩīĭįı", "i"),
    ("Ĵ", "J"), ("ĵ", "j"),
    ("Ķ", "K"), ("ķ", "k"),
    ("ĹĻĽĿŁ", "L"), ("ĺļľŀł", "l"),
    ("ÑŃŅŇ", "N"), ("ñńņň", "n"),
    ("ÒÓÔÕÖØŌŎŐ", "O"), ("òóôõöøōŏő", "o"),
    ("ŔŖŘ", "R"), ("ŕŗř", "r"),
    ("ŚŜŞŠ", "S"), ("śŝşš", "s"),
    ("ŢŤŦ", "T"), ("ţťŧ", "t"),
    ("ÙÚÛÜŨŪŬŮŰŲ", "U"), ("ùúûüũūŭůűų", "u"),
    ("Ŵ", "W"), ("ŵ", "w"),
    ("ÝŶŸ", "Y"), ("ýÿŷ", "y"),
    ("ŹŻŽ", "Z"), ("źżž", "z"),
)
FOLD_SRC = "".join(src for src, _ in _FOLD_1TO1)
FOLD_DST = "".join(dst * len(src) for src, dst in _FOLD_1TO1)
FOLD_MULTI: tuple[tuple[str, str], ...] = (
    ("Æ", "AE"), ("æ", "ae"), ("Œ", "OE"), ("œ", "oe"),
    ("ß", "ss"), ("Þ", "TH"), ("þ", "th"), ("Ĳ", "IJ"), ("ĳ", "ij"),
)
_FOLD_TRANS = str.maketrans(FOLD_SRC, FOLD_DST)


def fold_series(s: pd.Series) -> pd.Series:
    """ASCII-fold a pandas string series (vectorized)."""
    s = s.str.translate(_FOLD_TRANS)
    for a, b in FOLD_MULTI:
        s = s.str.replace(a, b, regex=False)
    return s


def fold_col(col: "Column") -> "Column":
    """ASCII-fold as a pure Catalyst column (whole-stage codegen)."""
    c = F.translate(col, FOLD_SRC, FOLD_DST)
    for a, b in FOLD_MULTI:
        c = F.replace(c, F.lit(a), F.lit(b))
    return c


def duckdb_fold_sql(col: str) -> str:
    """Identical fold as a DuckDB SQL fragment (oracle side)."""
    expr = f"translate({col}, '{FOLD_SRC}', '{FOLD_DST}')"
    for a, b in FOLD_MULTI:
        expr = f"replace({expr}, '{a}', '{b}')"
    return expr


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
# T7 — KStem (Krovetz 1993 "Viewing morphology as an inference
# process"). The reference wired Lucene's KStemFilter in the unused
# CustomAnalyzer.java:36 and abandoned it (MAP 0.22 vs 0.3044,
# GROUP_12.pdf §5.2.1), so no parity target exists; this is the
# algorithmic core — plural / past-tense / -ing conflation that
# returns dictionary-looking words — with a pinned exception lexicon
# standing in for Lucene's bundled 30k-headword dictionary (documented
# divergence: rare lexicon-dependent words may stem differently).
# ---------------------------------------------------------------------------

_KSTEM_EXC = {
    # irregular plurals / participles the rules below cannot derive
    "children": "child", "men": "man", "women": "woman", "feet": "foot",
    "geese": "goose", "mice": "mouse", "teeth": "tooth", "people": "person",
    "dying": "die", "lying": "lie", "tying": "tie",
    "goes": "go", "does": "do", "gases": "gas",
    # lexicon-protected words (KStem leaves words already in its dict)
    "series": "series", "species": "species", "news": "news",
    "analysis": "analysis", "basis": "basis", "bias": "bias",
    "this": "this", "is": "is", "its": "its", "as": "as", "us": "us",
    "sing": "sing", "bring": "bring", "thing": "thing", "king": "king",
    "string": "string", "spring": "spring", "during": "during",
    "seed": "seed", "feed": "feed", "speed": "speed", "need": "need",
}
# undouble these after -ed/-ing stripping ("fitted"->"fit"); l/s/z stay
# doubled ("called"->"call", "passed"->"pass", "buzzing"->"buzz")
_KSTEM_UNDOUBLE = frozenset("bdgmnprt")


@functools.lru_cache(maxsize=1 << 20)
def kstem(w: str) -> str:
    """Krovetz-style light stemmer (see block comment above). Pure
    function, memoized like :func:`porter_stem`."""
    if len(w) <= 3 or any(ch.isdigit() for ch in w):
        return w
    if w in _KSTEM_EXC:
        return _KSTEM_EXC[w]

    def _recode(stem: str) -> str:
        # after -ed/-ing removal: undouble ("planned"->"plan") or
        # e-restore CVC stems ("used"->"use", "making"->"make")
        if (len(stem) >= 2 and stem[-1] == stem[-2]
                and stem[-1] in _KSTEM_UNDOUBLE):
            return stem[:-1]
        if len(stem) <= 2 or (_measure(stem) == 1 and _cvc(stem)):
            return stem + "e"                       # "used"->"use"
        return stem

    # plural step
    if w.endswith("ies") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith("es") and len(w) > 3:
        if w.endswith(("xes", "ches", "shes", "sses", "zes")):
            return w[:-2]
        return w[:-1]
    if w.endswith("s") and not w.endswith(("ss", "us", "is")):
        return w[:-1]
    # past tense
    if w.endswith("ied") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith("eed"):
        return w[:-1] if len(w) > 5 else w          # "agreed"->"agree"
    if w.endswith("ed") and _has_vowel(w[:-2]):
        return _recode(w[:-2])
    # present participle
    if w.endswith("ying") and len(w) > 5:
        return w[:-4] + "y"
    if w.endswith("ing") and len(w) > 4 and _has_vowel(w[:-3]):
        return _recode(w[:-3])
    return w


# ---------------------------------------------------------------------------
# Implementation 1: vectorized pandas UDF (hot path)
# ---------------------------------------------------------------------------

def _tokenize_series(s: pd.Series, stem: bool, keep_stopwords: bool,
                     ascii_fold: bool = False,
                     stemmer: str = "porter") -> pd.Series:
    s = s.fillna("")
    if ascii_fold:                                  # T6 (step 0)
        s = fold_series(s)
    s = s.str.replace(RE_POSSESSIVE, "", regex=True)
    s = s.str.replace(RE_CAMEL_A, r"\1 \2", regex=True)
    s = s.str.replace(RE_CAMEL_B, r"\1 \2", regex=True)
    s = s.str.lower()
    toks = s.str.findall(RE_TOKEN)
    if keep_stopwords and not stem:
        return toks
    if stem:
        fn = porter_stem if stemmer == "porter" else kstem
        return toks.map(
            lambda ts: [fn(t) for t in ts if keep_stopwords or t not in _STOPSET]
        )
    return toks.map(lambda ts: [t for t in ts if t not in _STOPSET])


def tokenize_pandas_udf(stem: bool = False, keep_stopwords: bool = False,
                        ascii_fold: bool = False, stemmer: str = "porter"):
    """Return a pandas UDF column function: string col -> array<string>.

    Vectorized per Arrow batch (pandas ``.str`` regex kernels); the only
    per-row Python is the final stopword list-filter, which operates on
    already-split token lists.
    """

    @F.pandas_udf(ArrayType(StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        return _tokenize_series(s, stem, keep_stopwords, ascii_fold, stemmer)

    return _tok


def tokenize_texts(texts: Iterable[str], stem: bool = False,
                   keep_stopwords: bool = False, ascii_fold: bool = False,
                   stemmer: str = "porter") -> List[List[str]]:
    """Driver-side tokenization (query strings, tests). Same spec."""
    return _tokenize_series(pd.Series(list(texts), dtype=object), stem,
                            keep_stopwords, ascii_fold, stemmer).tolist()


# NOTE: a struct-returning "tokenize + per-doc tf pre-aggregation" UDF
# was tried to cut the explode volume 4×, but the Python→Arrow
# list<struct<term,tf>> conversion measured ~10× slower than exploding
# the plain array<string> and letting the JVM's partial+final hash agg
# do the combine. Keep UDF returns to Arrow-native primitive arrays.


# ---------------------------------------------------------------------------
# Implementation 2: pure Catalyst column expression (no Python at all)
# ---------------------------------------------------------------------------

def tokens_col(col: Column, keep_stopwords: bool = False,
               ascii_fold: bool = False) -> Column:
    """Tokenizer as a built-in-function column: stays in whole-stage
    codegen, no UDF. No stemming variant (stemming is parity-mode only).
    """
    if ascii_fold:
        col = fold_col(col)
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

def duckdb_clean_sql(col: str, ascii_fold: bool = False) -> str:
    """SQL expression producing the cleaned, lowercased string whose
    ``[a-z0-9]+`` runs are the tokens. RE2-safe."""
    if ascii_fold:
        col = duckdb_fold_sql(col)
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
