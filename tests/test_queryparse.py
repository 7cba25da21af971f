"""Lucene-syntax mini query parser (engine/queryparse.py): clause
parsing + end-to-end equivalence with hand-composed operators."""

import pytest

from engine.queryparse import parse_query, search_parsed


def test_parse_query_cases():
    q = parse_query('+merge sort -hash "state of the art" mer* wi?d* quer~ the')
    assert q.must == ["merge"]
    assert q.should == ["sort"]
    assert q.must_not == ["hash"]
    assert q.phrases == ["state of the art"]
    assert q.prefixes == ["mer"]
    assert q.wildcards == ["wi?d*"]
    assert q.fuzzies == ["quer"]
    # "the" is analyzer-dropped (stopword): no clause anywhere
    # camelCase in a MUST clause analyzes into its subwords
    q2 = parse_query("+getUserName other")
    assert q2.must == ["get", "user", "name"] and q2.should == ["other"]
    with pytest.raises(ValueError):
        parse_query('-"no negated phrases"')


def test_search_parsed_matches_composed(tiny_index):
    from engine.search import boolean_topk, expand_prefix_terms

    vocab = sorted(r["term"] for r in
                   tiny_index.termstats.select("term").collect())
    t_must = "merge" if "merge" in vocab else vocab[0]
    t_should = vocab[len(vocab) // 2]
    s = f"+{t_must} {t_should} mer*"
    got = [(r["doc_id"], r["rank"], round(r["score"], 9)) for r in
           search_parsed(tiny_index, "q", s, 10).collect()]
    pre = {t for _, t, _ in expand_prefix_terms(tiny_index, [("q", "mer")])}
    want = [(r["doc_id"], r["rank"], round(r["score"], 9)) for r in
            boolean_topk(tiny_index,
                         [("q", [t_must],
                           sorted(({t_should} | pre) - {t_must}), [])],
                         10).collect()]
    assert got == want and got


def test_search_parsed_phrase_gates(spark, tiny_index):
    """A quoted phrase gates the ranked result to phrase-matching docs
    and its terms still contribute to the score."""
    from engine.positions import build_positions, phrase_match

    build_positions(spark, tiny_index.index_dir)
    pos_index = tiny_index

    # find a phrase that actually occurs: take two adjacent tokens
    # from a real doc's analyzed stream
    row = pos_index.docs.select("content").first()
    from engine.analysis import tokenize_texts
    toks = tokenize_texts([row["content"]], keep_stopwords=True)[0]
    import itertools
    pair = None
    from engine.analysis import _STOPSET
    for a, b in itertools.pairwise(toks):
        if a not in _STOPSET and b not in _STOPSET:
            pair = f"{a} {b}"
            break
    assert pair
    res = search_parsed(pos_index, "q", f'"{pair}" extra', 10).collect()
    hit_ids = {r["doc_id"] for r in
               phrase_match(pos_index, [("q", pair)]).collect()}
    assert res and all(r["doc_id"] in hit_ids for r in res)
    assert [r["rank"] for r in res] == list(range(1, len(res) + 1))


def test_parse_query_never_crashes_property():
    """Property: parse_query is total over arbitrary syntax soup
    (except the documented negated-phrase error) and only ever emits
    analyzed lowercase-alnum clause terms."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from(list("abcXYZ012 +-*?~\"_."))

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=40))
    def check(s):
        try:
            q = parse_query(s)
        except ValueError as e:
            assert "negated phrases" in str(e)
            return
        for bucket in (q.must, q.should, q.must_not, q.prefixes,
                       q.fuzzies):
            for t in bucket:
                assert re.fullmatch(r"[a-z0-9]+", t), (s, t)
        for w in q.wildcards:
            assert re.fullmatch(r"[a-z0-9*?]*", w), (s, w)

    check()


def test_parse_query_signed_expansions():
    """ADVICE r2: '+'/'-' on prefix/wildcard/fuzzy clauses is honored
    (was: '-secret*' became a positive SHOULD boost; '+fuzz~' lost
    fuzziness)."""
    q = parse_query('-secret* +fuzz~ -wild*card +pre* -quer~ normal*')
    assert ("prefix", "secret") in q.not_expansions
    assert ("fuzzy", "fuzz") in q.must_expansions
    assert ("wildcard", "wild*card") in q.not_expansions
    assert ("prefix", "pre") in q.must_expansions
    assert ("fuzzy", "quer") in q.not_expansions
    assert q.prefixes == ["normal"]          # unsigned path unchanged
    assert q.must == [] and q.must_not == []


def test_search_parsed_prohibited_prefix_excludes(tiny_index):
    """'-pre*' must EXCLUDE every doc containing a term with that
    prefix (equivalent to must_not over the dictionary rewrite)."""
    from engine.search import boolean_topk, expand_prefix_terms

    vocab = sorted(r["term"] for r in
                   tiny_index.termstats.select("term").collect())
    pre = vocab[0][:3]
    other = next(t for t in vocab if not t.startswith(pre))
    expanded = sorted({t for _, t, _ in
                       expand_prefix_terms(tiny_index, [("q", pre)])})
    got = [(r["doc_id"], r["rank"], round(r["score"], 9)) for r in
           search_parsed(tiny_index, "q", f"{other} -{pre}*", 10)
           .collect()]
    want = [(r["doc_id"], r["rank"], round(r["score"], 9)) for r in
            boolean_topk(tiny_index,
                         [("q", [], [other], expanded)], 10).collect()]
    assert got == want


def test_search_parsed_required_prefix_gates(tiny_index):
    """'+pre*' requires ≥1 expanded term (Lucene MUST MultiTermQuery):
    every hit contains a term with the prefix, and the expansion still
    contributes to the score."""
    from engine.search import expand_prefix_terms

    vocab = sorted(r["term"] for r in
                   tiny_index.termstats.select("term").collect())
    pre = vocab[0][:3]
    other = next(t for t in vocab if not t.startswith(pre))
    expanded = {t for _, t, _ in
                expand_prefix_terms(tiny_index, [("q", pre)])}
    res = search_parsed(tiny_index, "q", f"{other} +{pre}*", 10).collect()
    assert res
    # every returned doc must contain ≥1 expanded term
    from engine.search import term_vectors
    tv = term_vectors(tiny_index, [r["doc_id"] for r in res]).collect()
    by_doc = {}
    for r in tv:
        by_doc.setdefault(r["doc_id"], set()).add(r["term"])
    assert all(by_doc[r["doc_id"]] & expanded for r in res)
