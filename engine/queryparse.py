"""Mini query-language parser (Lucene QueryParser analog, SURVEY T9).

The reference exposes Lucene's QueryParser only to ESCAPE user text
(Searcher.java:38-42) — its queries are programmatic term bags. This
module closes the user-facing gap for anyone switching from raw
Lucene: a small, total parser for the familiar syntax, compiled onto
the engine's existing operators (no new execution paths — parsing is
a pure driver-side rewrite).

Supported syntax (one clause per whitespace-separated token):

  term          optional (SHOULD) clause
  +term         required (MUST) clause
  -term         prohibited (MUST_NOT) clause
  "a b c"       exact phrase (MUST; gap positions, stopwords count)
  pre*          prefix rewrite        (dictionary scan → SHOULD terms)
  wild*card, ?  wildcard rewrite      (LIKE dictionary scan)
  term~         fuzzy rewrite         (Levenshtein ≤ 1)

Execution semantics (documented, deliberately simple):

* all non-phrase clause text goes through the engine analyzer (a
  clause that analyzes to a stopword/empty vanishes, like Lucene's
  analyzer-dropped clauses);
* expansions (prefix/wildcard/fuzzy) enumerate vocabulary terms and
  join the SHOULD set with weight 1.0 — Lucene's scoring-boolean
  rewrite (CONSTANT_SCORE differences documented as divergence);
* scoring = Σ BM25 over MUST + SHOULD occurrences (boolean_topk);
* every phrase gates the result set via the positional index
  (phrase_match inner join), and its terms also join the SHOULD set
  so they contribute to the score — the plain-BM25 approximation of
  Lucene's phrase scorer (positions weighting documented divergence).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from .analysis import tokenize_texts

# quoted phrase | single token (with optional +/- prefix and ~ suffix)
_CLAUSE_RE = re.compile(r'([+\-]?)"([^"]*)"|([+\-]?)(\S+)')


@dataclass
class ParsedQuery:
    must: list[str] = field(default_factory=list)
    should: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    phrases: list[str] = field(default_factory=list)
    prefixes: list[str] = field(default_factory=list)
    wildcards: list[str] = field(default_factory=list)
    fuzzies: list[str] = field(default_factory=list)


def _analyze_one(text: str, stem: bool, stemmer: str = "porter",
                 ascii_fold: bool = False) -> list[str]:
    return tokenize_texts([text], stem=stem, stemmer=stemmer,
                          ascii_fold=ascii_fold)[0]


def parse_query(s: str, stem: bool = False, stemmer: str = "porter",
                ascii_fold: bool = False) -> ParsedQuery:
    """Parse one query string into clause sets (pure function).
    ``stem``/``stemmer``/``ascii_fold`` must match the target index's
    analyzer (``Index.analyzer_opts()``)."""
    _an = lambda t: _analyze_one(t, stem, stemmer, ascii_fold)  # noqa: E731
    q = ParsedQuery()
    for m in _CLAUSE_RE.finditer(s):
        if m.group(2) is not None:          # quoted phrase
            if m.group(1) == "-":
                raise ValueError("negated phrases are not supported")
            if m.group(2).strip():
                q.phrases.append(m.group(2))
            continue
        sign, tok = m.group(3), m.group(4)
        fuzzy = tok.endswith("~")
        if fuzzy:
            tok = tok[:-1]
        is_prefix = bool(re.fullmatch(r"[^*?]+\*", tok))
        is_wild = (not is_prefix) and any(ch in tok for ch in "*?")
        if is_prefix:
            base = _an(tok[:-1])
            if base:
                q.prefixes.append(base[0])
            continue
        if is_wild:
            # analyze the literal runs, keep the metacharacters
            parts = re.split(r"([*?])", tok.lower())
            q.wildcards.append("".join(
                p if p in "*?" else (_an(p)[0] if p and _an(p) else "")
                for p in parts))
            continue
        terms = _an(tok)
        if not terms:
            continue                        # analyzer-dropped clause
        bucket = (q.must if sign == "+"
                  else q.must_not if sign == "-" else
                  (q.fuzzies if fuzzy else q.should))
        bucket.extend(terms if not fuzzy else terms[:1])
    return q


def search_parsed(index, qid: str, s: str, k: int) -> DataFrame:
    """Parse ``s`` and execute it against the index (see module
    docstring for the execution semantics). Returns
    (qid, doc_id, score, rank) like the other ranked query paths."""
    from .positions import phrase_match
    from .search import (boolean_topk, expand_fuzzy_terms,
                         expand_prefix_terms, expand_wildcard_terms)

    opts = index.analyzer_opts()
    q = parse_query(s, **opts)
    should = list(q.should)
    if q.prefixes:
        should += [t for _, t, _ in expand_prefix_terms(
            index, [(qid, p) for p in q.prefixes])]
    if q.wildcards:
        should += [t for _, t, _ in expand_wildcard_terms(
            index, [(qid, w) for w in q.wildcards])]
    if q.fuzzies:
        should += [t for _, t, _ in expand_fuzzy_terms(
            index, [(qid, f) for f in q.fuzzies])]
    for p in q.phrases:
        should += _analyze_one(p, **opts)
    # phrase gating BEFORE the top-k cut (as a doc_filter), so the
    # k-th phrase-matching doc is never lost behind non-matching docs
    doc_filter = None
    for i, p in enumerate(q.phrases):
        hits = phrase_match(index, [(f"{qid}#p{i}", p)]).select("doc_id")
        doc_filter = hits if doc_filter is None else \
            doc_filter.join(hits, "doc_id", "left_semi")
    out = boolean_topk(index, [(qid, sorted(set(q.must)),
                                sorted(set(should) - set(q.must)),
                                sorted(set(q.must_not)))], k,
                       doc_filter=doc_filter)
    return out.select("qid", "doc_id", "score", "rank") \
        .orderBy("qid", "rank")
