"""Positional index: phrase / proximity retrieval (engine/positions.py).

Brute-force Python reference: tokenize with gap positions (stopwords
consume a position, emit nothing) and check the gap pattern directly.
"""

import pytest

from engine.analysis import _STOPSET, tokenize_texts
from engine.positions import (analyze_phrase, build_positions, phrase_match,
                              proximity_match)


def _pos_map(content: str) -> dict[str, set[int]]:
    toks = tokenize_texts([content], keep_stopwords=True)[0]
    out: dict[str, set[int]] = {}
    for i, t in enumerate(toks):
        if t in _STOPSET:
            continue
        out.setdefault(t, set()).add(i)
    return out


def _brute_phrase(doc_contents: dict[int, str], phrase: str) -> set[int]:
    qt = analyze_phrase(phrase)
    assert qt
    hits = set()
    for doc_id, content in doc_contents.items():
        pm = _pos_map(content)
        t0, o0 = qt[0]
        anchors = {p - o0 for p in pm.get(t0, set()) if p - o0 >= 0}
        if any(all(a + off in pm.get(t, set()) for t, off in qt)
               for a in anchors):
            hits.add(doc_id)
    return hits


def _brute_prox(doc_contents: dict[int, str], terms: list[str],
                window: int) -> set[int]:
    an = [tokenize_texts([t])[0][0] for t in terms]
    anchor, others = an[0], sorted(set(an[1:]) - {an[0]})
    hits = set()
    for doc_id, content in doc_contents.items():
        pm = _pos_map(content)
        for p in pm.get(anchor, set()):
            if all(any(abs(q - p) <= window for q in pm.get(t, set()))
                   for t in others):
                hits.add(doc_id)
                break
    return hits


@pytest.fixture(scope="module")
def pos_index(spark, tiny_index):
    build_positions(spark, tiny_index.index_dir)
    return tiny_index


@pytest.fixture(scope="module")
def doc_contents(pos_index) -> dict[int, str]:
    rows = pos_index.docs.select("doc_id", "content").collect()
    return {int(r["doc_id"]): r["content"] for r in rows}


def test_analyze_phrase_gap_offsets():
    # stopwords consume offsets but emit no term (Lucene posIncrement)
    assert analyze_phrase("state of the art") == [("state", 0), ("art", 3)]
    assert analyze_phrase("mergeSort") == [("merge", 0), ("sort", 1)]
    assert analyze_phrase("the a of") == []


def test_positions_gap_numbering(spark, tmp_path):
    from engine.index_build import build_index
    from engine.search import Index

    corpus = spark.createDataFrame(
        [("r", "p0", "c", "py", "the quick brown fox"),
         ("r", "p1", "c", "py", "quick the quick")],
        "repo string, path string, commit string, lang string, content string")
    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, n_buckets=2, n_doc_buckets=1)
    build_positions(spark, d)
    idx = Index(spark, d)
    rows = {(r["term"], r["doc_id"]): list(r["positions"])
            for r in spark.read.parquet(d + "/positions").collect()}
    # doc_id 0 = path p0 (canonical order): "the"@0 dropped, gaps kept
    assert rows[("quick", 0)] == [1]
    assert rows[("brown", 0)] == [2]
    assert rows[("fox", 0)] == [3]
    assert rows[("quick", 1)] == [0, 2]


def test_build_positions_is_resumable(spark, pos_index):
    assert build_positions(spark, pos_index.index_dir)["resumed"] is True


@pytest.fixture(scope="module")
def real_phrases(doc_contents) -> list[tuple[str, str]]:
    """Phrases lifted from actual docs (so matches exist) + misses."""
    toks = tokenize_texts([doc_contents[0]], keep_stopwords=True)[0]
    nonstop = [t for t in toks if t not in _STOPSET]
    return [
        ("ph2", " ".join(toks[0:2])),
        ("ph3", " ".join(toks[3:7])),
        ("ph_single", nonstop[0]),
        ("ph_miss", f"{nonstop[0]} zzznope"),
        ("ph_rep", f"{nonstop[0]} {nonstop[0]}"),
    ]


def test_phrase_match_vs_bruteforce(pos_index, doc_contents, real_phrases):
    res = phrase_match(pos_index, real_phrases).collect()
    got: dict[str, set[int]] = {q: set() for q, _ in real_phrases}
    for r in res:
        got[r["qid"]].add(int(r["doc_id"]))
    for qid, phrase in real_phrases:
        if not analyze_phrase(phrase):
            continue
        expect = _brute_phrase(doc_contents, phrase)
        assert got[qid] == expect, f"{qid}: {phrase!r}"
    # at least one phrase must actually match something, else the test
    # proves nothing
    assert any(got[q] for q, _ in real_phrases)


def test_phrase_lead_gating_equivalence(pos_index, real_phrases):
    a = sorted(map(tuple, phrase_match(pos_index, real_phrases,
                                       lead_max_df=0).collect()))
    b = sorted(map(tuple, phrase_match(pos_index, real_phrases,
                                       lead_max_df=10**9).collect()))
    assert a == b and len(a) > 0


def test_proximity_vs_bruteforce(pos_index, doc_contents):
    toks = tokenize_texts([doc_contents[1]], keep_stopwords=True)[0]
    nonstop = [t for t in toks if t not in _STOPSET]
    queries = [
        ("x1", [nonstop[0], nonstop[3]]),
        ("x2", [nonstop[2], nonstop[0], nonstop[5]]),
        ("x_single", [nonstop[4]]),
        ("x_miss", [nonstop[0], "zzznope"]),
    ]
    for window in (2, 5):
        res = proximity_match(pos_index, queries, window).collect()
        got: dict[str, set[int]] = {q: set() for q, _ in queries}
        for r in res:
            got[r["qid"]].add(int(r["doc_id"]))
        for qid, terms in queries:
            if any(not tokenize_texts([t])[0] for t in terms):
                continue
            expect = _brute_prox(doc_contents, terms, window)
            assert got[qid] == expect, f"{qid} w={window}"
        assert any(got[q] for q, _ in queries)


def test_phrase_topk_gates_and_ranks(pos_index, doc_contents, real_phrases):
    """phrase_topk = BM25 over phrase terms restricted to phrase-
    matching docs; checked against brute force + exhaustive scoring."""
    import math

    from engine.positions import phrase_topk
    from engine.search import score_exhaustive

    k = 5
    out = phrase_topk(pos_index, real_phrases, k).collect()
    got: dict[str, list] = {}
    for r in out:
        got.setdefault(r["qid"], []).append(
            (r["rank"], int(r["doc_id"]), r["score"]))
    for qid, phrase in real_phrases:
        qt = analyze_phrase(phrase)
        if not qt:
            continue
        match = _brute_phrase(doc_contents, phrase)
        # expected: exhaustive scores of the phrase's term bag,
        # filtered to the match set, re-ranked on the rounded score
        weights: dict[str, float] = {}
        for t, _ in qt:
            weights[t] = weights.get(t, 0.0) + 1.0
        sc = score_exhaustive(
            pos_index, [(qid, t, w) for t, w in sorted(weights.items())],
            10 ** 6).collect()
        rows = [(math.floor(r["score"] * 1e4 + 0.5) / 1e4,
                 int(r["doc_id"])) for r in sc if int(r["doc_id"]) in match]
        rows.sort(key=lambda x: (-x[0], x[1]))
        expect = [(i + 1, d, s) for i, (s, d) in enumerate(rows[:k])]
        assert got.get(qid, []) == expect, qid


def test_snippets_window(spark, tmp_path):
    """KWIC window: ±width analyzed tokens around the first query-term
    occurrence, clamped at document edges."""
    from engine.index_build import build_index
    from engine.positions import build_positions, snippets
    from engine.search import Index

    corpus = spark.createDataFrame(
        [("r", "p0", "c", "py",
          "one two three four five target six seven eight nine ten"),
         ("r", "p1", "c", "py", "target at start of this doc")],
        "repo string, path string, commit string, lang string, content string")
    d = str(tmp_path / "sidx")
    build_index(spark, corpus, d, n_buckets=2, n_doc_buckets=1)
    build_positions(spark, d)
    idx = Index(spark, d)
    hits = spark.createDataFrame([("q", 0), ("q", 1)],
                                 "qid string, doc_id long")
    out = {int(r["doc_id"]): r for r in
           snippets(idx, hits, [("q", "target")], width=2).collect()}
    assert out[0]["first_pos"] == 5
    assert out[0]["snippet"] == "four five target six seven"
    # doc 1: "target" at position 0 → window clamps at the left edge
    assert out[1]["first_pos"] == 0
    assert out[1]["snippet"] == "target at start"  # stopwords kept in stream


def test_span_first_vs_bruteforce(pos_index, doc_contents):
    """SpanFirstQuery analog: first gap-numbered occurrence must end
    within the limit; checked against a Python position-map scan."""
    from engine.positions import span_first_match

    # pick two terms that exist in the corpus vocabulary
    vocab = [r["term"] for r in
             pos_index.termstats.select("term").orderBy("term").limit(50)
             .collect()]
    t1, t2 = vocab[0], vocab[len(vocab) // 2]
    queries = [("s1", t1, 5), ("s2", t2, 12), ("s3", t1, 1)]
    res = span_first_match(pos_index, queries).collect()
    got = {}
    for r in res:
        got.setdefault(r["qid"], {})[r["doc_id"]] = r["first_pos"]
    for qid, term, lim in queries:
        want = {}
        for doc_id, content in doc_contents.items():
            pm = _pos_map(content)
            ps = pm.get(term, set())
            if ps and min(ps) + 1 <= lim:
                want[doc_id] = min(ps)
        assert got.get(qid, {}) == want, (qid, term, lim)


def test_positional_layer_respects_analyzer_options(spark, tmp_path):
    """Regression: phrase/span/parser analysis must use the INDEX's
    full analyzer settings (kstem + ascii_fold here), not just the
    stem flag — a mismatch makes every positional query miss."""
    from engine.index_build import build_index
    from engine.positions import phrase_match, span_first_match
    from engine.queryparse import search_parsed
    from engine.search import Index

    rows = [("r", "a", "-", "py", "café running policies daily"),
            ("r", "b", "-", "py", "unrelated words here")]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    path = str(tmp_path / "kfidx")
    build_index(spark, df, path, n_buckets=2, n_doc_buckets=1,
                stem=True, stemmer="kstem", ascii_fold=True)
    build_positions(spark, path)
    idx = Index(spark, path)
    # kstem: running→run, policies→policy; fold: café→cafe — the
    # phrase only matches if query analysis follows the same chain
    hits = phrase_match(idx, [("p", "café running")]).collect()
    assert len(hits) == 1
    sf = span_first_match(idx, [("s", "Café", 1)]).collect()
    assert len(sf) == 1 and sf[0]["first_pos"] == 0
    res = search_parsed(idx, "q", '+running "café running"', 10).collect()
    assert len(res) == 1


# ---------------------------------------------------------------------------
# interval_match (ES intervals all_of ordered=true, max_gaps)
# ---------------------------------------------------------------------------

def _brute_intervals(doc_contents: dict[int, str], text: str,
                     max_gaps: int) -> set[int]:
    qt = analyze_phrase(text)
    terms = [t for t, _ in sorted(qt, key=lambda x: x[1])]
    n = len(terms)
    hits = set()
    for doc_id, content in doc_contents.items():
        pm = _pos_map(content)
        if any(t not in pm for t in terms):
            continue
        lists = [sorted(pm[t]) for t in terms]

        def chain(p):                       # greedy min chain from p
            for lst in lists[1:]:
                nxt = [x for x in lst if x > p]
                if not nxt:
                    return None
                p = nxt[0]
            return p

        for p1 in lists[0]:
            pn = chain(p1)
            if pn is not None and pn - p1 <= n - 1 + max_gaps:
                hits.add(doc_id)
                break
    return hits


def test_interval_match_vs_bruteforce(pos_index, doc_contents):
    from engine.positions import interval_match

    toks = tokenize_texts([doc_contents[0]], keep_stopwords=True)[0]
    nonstop = [t for t in toks if t not in _STOPSET]
    qs = [
        ("iv_adj", " ".join(toks[0:2])),           # adjacent pair
        ("iv_rev", " ".join(reversed(nonstop[:2]))),  # order flipped
        ("iv_far", f"{nonstop[0]} {nonstop[4]}"),  # needs gaps
        ("iv_tri", " ".join(nonstop[:3])),
        ("iv_one", nonstop[1]),
        ("iv_rep", f"{nonstop[0]} {nonstop[0]}"),  # repeated term
        ("iv_miss", f"{nonstop[0]} zzznope"),
    ]
    for g in (0, 2, 6):
        res = interval_match(pos_index, qs, max_gaps=g).collect()
        got: dict[str, set[int]] = {q: set() for q, _ in qs}
        for r in res:
            got[r["qid"]].add(int(r["doc_id"]))
        matched_any = False
        for qid, text in qs:
            expect = _brute_intervals(doc_contents, text, g)
            assert got[qid] == expect, f"{qid} g={g}: {text!r}"
            matched_any = matched_any or bool(expect)
        assert matched_any


def test_interval_ordered_semantics(spark, tmp_path):
    """Hand-built corpus pinning ordering, gap counting (stopwords
    consume positions), strict-ascent for repeated terms, and the
    max_gaps boundary."""
    from engine.index_build import build_index
    from engine.positions import interval_match
    from engine.search import Index

    docs = [
        ("d0", "alpha beta gamma"),          # alpha..gamma span 2, gaps 0
        ("d1", "alpha of the beta"),          # stopword gaps: a..b gap 2
        ("d2", "beta alpha"),                 # reversed order only
        ("d3", "alpha zz yy xx beta"),        # gap 3
        ("d4", "alpha"),                      # single occurrence
    ]
    df = spark.createDataFrame(
        [("r", k, "c", "py", v) for k, v in docs],
        "repo string, path string, commit string, lang string,"
        " content string")
    d = str(tmp_path / "iv_idx")
    build_index(spark, df, d, n_buckets=2, n_doc_buckets=1)
    idx = Index(spark, d)
    build_positions(spark, idx.index_dir)
    content_of = dict(docs)
    docno = {k: None for k, _ in docs}
    for r in idx.docs.collect():
        for k, v in content_of.items():
            if r["content"] == v:
                docno[k] = int(r["doc_id"])

    def ids(qid, rows):
        return {int(r["doc_id"]) for r in rows if r["qid"] == qid}

    qs = [("q", "alpha beta")]
    r0 = interval_match(idx, qs, max_gaps=0).collect()
    assert ids("q", r0) == {docno["d0"]}            # only the adjacent one
    r2 = interval_match(idx, qs, max_gaps=2).collect()
    assert ids("q", r2) == {docno["d0"], docno["d1"]}   # stopwords cost 2
    r3 = interval_match(idx, qs, max_gaps=3).collect()
    assert ids("q", r3) == {docno["d0"], docno["d1"], docno["d3"]}
    # d2 (reversed) never matches ordered intervals, at any gap budget
    r9 = interval_match(idx, qs, max_gaps=9).collect()
    assert docno["d2"] not in ids("q", r9)
    # repeated term needs two strictly-ascending occurrences
    rr = interval_match(idx, [("r", "alpha alpha")], max_gaps=9).collect()
    assert ids("r", rr) == set()
    # single-term query = term presence
    rs = interval_match(idx, [("s", "alpha")], max_gaps=0).collect()
    assert ids("s", rs) == {docno[k] for k in ("d0", "d1", "d2", "d3", "d4")}


def test_interval_lead_gating_equivalence(pos_index, doc_contents):
    from engine.positions import interval_match

    toks = tokenize_texts([doc_contents[0]], keep_stopwords=True)[0]
    nonstop = [t for t in toks if t not in _STOPSET]
    qs = [("g1", " ".join(nonstop[:2])), ("g2", f"{nonstop[2]} {nonstop[0]}")]
    a = sorted(map(tuple, interval_match(pos_index, qs, max_gaps=4,
                                         lead_max_df=0).collect()))
    b = sorted(map(tuple, interval_match(pos_index, qs, max_gaps=4,
                                         lead_max_df=10**9).collect()))
    assert a == b


def test_interval_all_stopword_query_in_batch(pos_index):
    """An all-stopword query in a mixed batch must yield no hits (not
    a driver ValueError from min() over an empty term set)."""
    from engine.positions import interval_match

    res = interval_match(pos_index, [("ok", "merge sort"),
                                     ("stop", "the of a")],
                         max_gaps=2).collect()
    assert not [r for r in res if r["qid"] == "stop"]


def test_span_not_vs_bruteforce(pos_index, doc_contents):
    """SpanNot: include occurrences surviving an exclude window,
    against a per-doc python reference over gap positions."""
    from engine.positions import span_not_match

    toks = tokenize_texts([doc_contents[0]], keep_stopwords=True)[0]
    nonstop = [t for t in toks if t not in _STOPSET]
    qs = [("n1", nonstop[0], nonstop[1]),
          ("n2", nonstop[1], nonstop[0]),
          ("n3", nonstop[2], "zzznope"),   # absent exclude → plain match
          ("n4", "zzznope", nonstop[0])]   # absent include → nothing
    for pre, post in ((0, 0), (2, 2), (5, 1)):
        got: dict[str, set[int]] = {q: set() for q, _, _ in qs}
        for r in span_not_match(pos_index, qs, pre=pre,
                                post=post).collect():
            got[r["qid"]].add(int(r["doc_id"]))
        for qid, inc, exc in qs:
            an_inc = tokenize_texts([inc])[0]
            expect: set[int] = set()
            if an_inc:
                ti = an_inc[0]
                te_l = tokenize_texts([exc])[0]
                te = te_l[0] if te_l else None
                for did, content in doc_contents.items():
                    pm = _pos_map(content)
                    eq = pm.get(te, set()) if te else set()
                    if any(all(not (p - pre <= q <= p + post)
                               for q in eq)
                           for p in pm.get(ti, set())):
                        expect.add(did)
            assert got[qid] == expect, (qid, pre, post)
        assert got["n3"] and not got["n4"]


def _brute_spans(doc_contents, little, big_a, big_b, slop):
    """Python reference for the pinned span algebra: big = all ordered
    (pa, pb) pairs with pb > pa and pb - pa - 1 <= slop."""
    an = [tokenize_texts([t])[0] for t in (little, big_a, big_b)]
    if not all(an):
        return {}, {}
    tl, ta, tb = (a[0] for a in an)
    within, containing = {}, {}
    for did, content in doc_contents.items():
        pm = _pos_map(content)
        L, A, B = (sorted(pm.get(t, set())) for t in (tl, ta, tb))
        pairs = [(pa, pb) for pa in A for pb in B
                 if pb > pa and pb - pa - 1 <= slop]
        w = sorted(p for p in L
                   if any(pa <= p <= pb for pa, pb in pairs))
        c = sorted((pa, pb + 1) for pa, pb in pairs
                   if any(pa <= p <= pb for p in L))
        if w:
            within[did] = w
        if c:
            containing[did] = c
    return within, containing


def test_span_within_containing_vs_bruteforce(pos_index, doc_contents):
    from engine.positions import span_containing_match, span_within_match

    toks = tokenize_texts([doc_contents[0]], keep_stopwords=True)[0]
    nonstop = [t for t in toks if t not in _STOPSET]
    qs = [("w1", nonstop[1], nonstop[0], nonstop[2], 4),
          ("w2", nonstop[0], nonstop[0], nonstop[1], 2),  # a == little
          ("w3", nonstop[0], "zzznope", nonstop[1], 3)]   # missing big
    got_w: dict[str, dict[int, list[int]]] = {q: {} for q, *_ in qs}
    for r in span_within_match(pos_index, qs).collect():
        got_w[r["qid"]].setdefault(int(r["doc_id"]), []).append(
            int(r["little_pos"]))
    got_c: dict[str, dict[int, list[tuple[int, int]]]] = {
        q: {} for q, *_ in qs}
    for r in span_containing_match(pos_index, qs).collect():
        got_c[r["qid"]].setdefault(int(r["doc_id"]), []).append(
            (int(r["big_start"]), int(r["big_end"])))
    hit_any = False
    for qid, little, ba, bb, slop in qs:
        exp_w, exp_c = _brute_spans(doc_contents, little, ba, bb, slop)
        assert got_w[qid] == exp_w, qid
        assert got_c[qid] == exp_c, qid
        hit_any = hit_any or bool(exp_w)
    assert hit_any            # the probe genuinely bites somewhere
    assert not got_w["w3"] and not got_c["w3"]
