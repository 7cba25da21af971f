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
  +pre* / +t~   required expansion: doc must match ≥1 rewritten term
                (gated BEFORE the rank cut, like phrases; the terms
                still score) — Lucene's MUST MultiTermQuery
  -pre* / -t~   prohibited expansion: every rewritten term is banned

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
    # signed expansion clauses, (kind, pattern) with kind ∈ {"prefix",
    # "wildcard", "fuzzy"} (ADVICE r2: '+pre*' / '-pre*' previously
    # dropped the sign, inverting a prohibition into a boost):
    #   must_expansions — doc must match ≥1 dictionary-rewritten term
    #     (Lucene's MUST-of-a-MultiTermQuery), enforced as a doc gate;
    #   not_expansions — every rewritten term is prohibited.
    must_expansions: list[tuple[str, str]] = field(default_factory=list)
    not_expansions: list[tuple[str, str]] = field(default_factory=list)


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

        def _expansion(kind: str, pattern: str) -> None:
            if sign == "+":
                q.must_expansions.append((kind, pattern))
            elif sign == "-":
                q.not_expansions.append((kind, pattern))
            elif kind == "prefix":
                q.prefixes.append(pattern)
            elif kind == "wildcard":
                q.wildcards.append(pattern)
            else:
                q.fuzzies.append(pattern)

        fuzzy = tok.endswith("~")
        if fuzzy:
            tok = tok[:-1]
        is_prefix = bool(re.fullmatch(r"[^*?]+\*", tok))
        is_wild = (not is_prefix) and any(ch in tok for ch in "*?")
        if is_prefix:
            base = _an(tok[:-1])
            if base:
                _expansion("prefix", base[0])
            continue
        if is_wild:
            # analyze the literal runs, keep the metacharacters
            parts = re.split(r"([*?])", tok.lower())
            _expansion("wildcard", "".join(
                p if p in "*?" else (_an(p)[0] if p and _an(p) else "")
                for p in parts))
            continue
        terms = _an(tok)
        if not terms:
            continue                        # analyzer-dropped clause
        if fuzzy:
            _expansion("fuzzy", terms[0])
        else:
            bucket = (q.must if sign == "+"
                      else q.must_not if sign == "-" else q.should)
            bucket.extend(terms)
    return q


def search_parsed(index, qid: str, s: str, k: int,
                  fuzzy_transpositions: bool = False) -> DataFrame:
    """Parse ``s`` and execute it against the index (see module
    docstring for the execution semantics). Returns
    (qid, doc_id, score, rank) like the other ranked query paths.

    ``fuzzy_transpositions=True`` rewrites ``term~`` clauses under the
    OSA metric — Lucene's classic QueryParser builds FuzzyQuery with
    transpositions=true, so that flag is the Lucene-parity mode; the
    False default keeps the repo's pinned plain-Levenshtein oracle
    semantics (engine/editdist.py documents the difference)."""
    from pyspark.sql import functions as F

    from .positions import phrase_match
    from .search import (_matched_postings, boolean_topk, decode_udf,
                         expand_fuzzy_terms, expand_prefix_terms,
                         expand_wildcard_terms)

    def _expand(kind: str, patterns: list[str]) -> list[str]:
        if kind == "fuzzy":
            return [t for _, t, _ in expand_fuzzy_terms(
                index, [(qid, p) for p in patterns],
                transpositions=fuzzy_transpositions)]
        fn = {"prefix": expand_prefix_terms,
              "wildcard": expand_wildcard_terms}[kind]
        return [t for _, t, _ in fn(index, [(qid, p) for p in patterns])]

    def _docs_matching_any(terms: list[str]) -> DataFrame:
        """Distinct doc_ids containing ≥1 of ``terms`` (bucket-pruned
        decode — the gate for a MUST expansion clause)."""
        qt = [(qid, t, 1.0) for t in sorted(set(terms))]
        dec = _matched_postings(index, qt).withColumn(
            "d", decode_udf("blob"))
        return dec.select(F.explode("d.doc_ids").alias("doc_id")) \
            .distinct()

    opts = index.analyzer_opts()
    q = parse_query(s, **opts)
    should = list(q.should)
    if q.prefixes:
        should += _expand("prefix", q.prefixes)
    if q.wildcards:
        should += _expand("wildcard", q.wildcards)
    if q.fuzzies:
        should += _expand("fuzzy", q.fuzzies)
    for p in q.phrases:
        should += _analyze_one(p, **opts)
    # prohibited expansions: every dictionary-rewritten term is banned
    must_not = list(q.must_not)
    for kind, pat in q.not_expansions:
        must_not += _expand(kind, [pat])
    # phrase gating BEFORE the top-k cut (as a doc_filter), so the
    # k-th phrase-matching doc is never lost behind non-matching docs
    doc_filter = None

    def _gate(hits: DataFrame) -> None:
        nonlocal doc_filter
        doc_filter = hits if doc_filter is None else \
            doc_filter.join(hits, "doc_id", "left_semi")

    for i, p in enumerate(q.phrases):
        _gate(phrase_match(index, [(f"{qid}#p{i}", p)]).select("doc_id"))
    # a MUST expansion (e.g. '+pre*') is Lucene's required MultiTerm-
    # Query: the doc must match ≥1 rewritten term. Gated per clause
    # BEFORE the rank cut (like phrases); the rewritten terms also
    # join the SHOULD set so they score. A clause rewriting to nothing
    # makes the query unsatisfiable (empty gate), as in Lucene.
    for kind, pat in q.must_expansions:
        expanded = _expand(kind, [pat])
        should += expanded
        _gate(_docs_matching_any(expanded) if expanded else
              index.spark.createDataFrame([], "doc_id long"))
    out = boolean_topk(index, [(qid, sorted(set(q.must)),
                                sorted(set(should) - set(q.must)
                                       - set(must_not)),
                                sorted(set(must_not)))], k,
                       doc_filter=doc_filter)
    return out.select("qid", "doc_id", "score", "rank") \
        .orderBy("qid", "rank")


def expand_synonyms(queries, synonyms, syn_weight: float = 0.5):
    """Query-time synonym expansion (the ES ``synonym`` search-time
    token filter in its weighted-expansion reading): each query term
    contributes itself at its own weight plus every synonym at
    ``weight × syn_weight``; weights SUM per (qid, term) — the
    weighted-OR contract every scorer consumes (so a synonym that is
    ALSO an original term simply scores higher, Lucene's flattened
    SynonymQuery-as-boolean rewrite).

    ``queries``: [(qid, [terms])] or [(qid, {term: weight})];
    ``synonyms``: {term: [synonyms]} — applied one-way as given (feed
    both directions for symmetric sets, the ES equivalent of listing
    both orders). Pure driver-side: queries are tiny by contract.
    Returns [(qid, term, weight)] sorted (qid, term) — QueryTerms.
    """
    out: dict[tuple[str, str], float] = {}
    for qid, terms in queries:
        items = (terms.items() if isinstance(terms, dict)
                 else [(t, 1.0) for t in terms])
        for t, w in items:
            out[(qid, t)] = out.get((qid, t), 0.0) + float(w)
            for s in synonyms.get(t, ()):  # one-way expansion
                out[(qid, s)] = out.get((qid, s), 0.0) \
                    + float(w) * syn_weight
    return [(q, t, w) for (q, t), w in sorted(out.items())]
