"""Text analysis for training-data curation: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

Pure Catalyst column expressions (portable to the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..portable import round_half_up

# tiny per-language function-word lists for the n-gram/stopword
# heuristic language ID (deterministic, pinned)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "to", "and", "in", "is", "for", "with", "on"),
    "de": ("der", "die", "das", "und", "ist", "mit", "von", "zu", "den", "ein"),
    "fr": ("le", "la", "les", "de", "et", "est", "un", "une", "pour", "dans"),
    "es": ("el", "la", "los", "de", "y", "es", "un", "una", "para", "con"),
    "zh": ("de", "shi", "zai", "he", "le", "you", "wo", "ta", "men", "zhe"),
}

_WS_TOKEN = "\\s+"
_ALNUM_TOKEN = "[^a-z0-9]+"


def _ws_tokens(col):
    return F.filter(F.split(col, _WS_TOKEN), lambda t: t != F.lit(""))


def _alnum_tokens(col):
    return F.filter(F.split(F.lower(col), _ALNUM_TOKEN),
                    lambda t: t != F.lit(""))


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_ws_tokens, n_alnum_tokens, n_chars_txt): whitespace
    tokens plus BPE-ish sub-tokenization (alnum-run splitting — the
    same regex family a byte-pair pre-tokenizer uses)."""
    c = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_ws_tokens(c)).alias("n_ws_tokens"),
        F.size(_alnum_tokens(c)).alias("n_alnum_tokens"),
        F.length(c).alias("n_chars_txt"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + a pinned combined score in [0,1]:

    stopword_ratio  — EN function words / alnum tokens
    punct_ratio     — non-alnum, non-space chars / chars
    mean_token_len  — avg alnum token length
    quality = 0.4·clamp(stopword_ratio/0.4) + 0.3·(1−clamp(punct_ratio/0.3))
            + 0.3·clamp(mean_token_len/8)
    """
    c = F.col(text_col)
    toks = _alnum_tokens(c)
    en = LANG_STOPWORDS["en"]
    stops = F.array(*[F.lit(s) for s in en])
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    n_chars = F.length(c)
    n_punct = F.length(F.regexp_replace(F.lower(c), "[a-z0-9\\s]", ""))
    mean_len = F.aggregate(toks, F.lit(0.0),
                           lambda acc, t: acc + F.length(t)) / n_tok
    sw = n_stop.cast("double") / n_tok
    pr = n_punct.cast("double") / n_chars
    q = (F.lit(0.4) * F.least(sw / 0.4, F.lit(1.0))
         + F.lit(0.3) * (F.lit(1.0) - F.least(pr / 0.3, F.lit(1.0)))
         + F.lit(0.3) * F.least(mean_len / 8.0, F.lit(1.0)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        round_half_up(sw, 6).alias("stopword_ratio"),
        round_half_up(pr, 6).alias("punct_ratio"),
        round_half_up(mean_len, 6).alias("mean_token_len"),
        round_half_up(q, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Stopword-overlap language ID: (doc_id, lang_guess, lang_score).
    Ties broken by language code ascending (deterministic)."""
    toks = _alnum_tokens(F.col(text_col))
    n = F.size(toks)
    scores = []
    for lang in sorted(LANG_STOPWORDS):
        stops = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
        cnt = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
        scores.append((lang, cnt.cast("double") /
                       F.when(n > 0, n).otherwise(F.lit(1))))
    best_score = F.greatest(*[s for _, s in scores])
    guess = F.lit(None).cast("string")
    for lang, s in reversed(scores):  # earlier langs win ties → apply last
        guess = F.when(s == best_score, F.lit(lang)).otherwise(guess)
    return docs.select(F.col(id_col).alias("doc_id"),
                       guess.alias("lang_guess"),
                       round_half_up(best_score, 6).alias("lang_score"))


def fingerprints(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", shingle_k: int = 5) -> DataFrame:
    """Document fingerprint: (doc_id, fp, n_shingles) where fp is the
    minimum md5 over word k-shingles (1-permutation MinHash — a
    winnowing-style representative hash)."""
    from .dedup import shingles_col

    sh = shingles_col(F.col(text_col), shingle_k)
    return (docs.select(F.col(id_col).alias("doc_id"), sh.alias("sh"))
            .select("doc_id",
                    F.array_min(F.transform(F.col("sh"), F.md5)).alias("fp"),
                    F.size("sh").alias("n_shingles")))
