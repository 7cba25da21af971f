"""Highlighting (engine/highlight.py): python-replica equality on the
shared tiny index, pinned passage-selection semantics on a hand-built
corpus, stemmed-index matching (the stale-analyzer rule), and the
highlight_topk index surface."""

import pytest
from pyspark.sql import functions as F

from engine.analysis import tokenize_texts
from engine.highlight import (DEFAULT_WINDOW, highlight, highlight_topk,
                              snippet_py)

DOCS = [
    # doc 1: two clusters of matches; the (a, b) cluster at 8.. beats
    # the lone early match on distinct terms
    (1, "zz aa zz zz zz zz zz zz aa bb zz zz zz zz zz zz zz"),
    # doc 2: single match mid-doc
    (2, "one two three four bb six seven"),
    # doc 3: no query term at all -> must DROP
    (3, "nothing to see here"),
    # doc 4: match in the final position (window truncates at doc end)
    (4, "x1 x2 x3 aa"),
    # doc 5: tie on (u, n) between two starts -> smallest start wins
    (5, "aa z z z z z z z z z z z z z z z aa"),
]
QUERIES = [("q1", ["aa", "bb"])]
HITS = [("q1", d) for d, _ in DOCS]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _hits_df(spark):
    return spark.createDataFrame(HITS, "qid string, doc_id long")


def test_highlight_matches_python_replica(spark):
    out = {r["doc_id"]: r for r in highlight(
        _hits_df(spark), _docs_df(spark), QUERIES, window=6).collect()}
    qs = QUERIES[0][1]
    for doc_id, text in DOCS:
        toks = tokenize_texts([text], keep_stopwords=True)[0]
        n, snip = snippet_py(toks, qs, 6)
        if n == 0:
            assert doc_id not in out
        else:
            assert out[doc_id]["n_matches"] == n
            assert out[doc_id]["snippet"] == snip


def test_pinned_passage_semantics(spark):
    out = {r["doc_id"]: r for r in highlight(
        _hits_df(spark), _docs_df(spark), QUERIES, window=6).collect()}
    # doc 1: window starting at the second 'aa' covers 'bb' too ->
    # 2 distinct terms beat the earlier lone match
    assert out[1]["snippet"] == "<em>aa</em> <em>bb</em> zz zz zz zz"
    assert out[1]["n_matches"] == 3
    # doc 2: lone mid-doc match anchors its own window
    assert out[2]["snippet"] == "<em>bb</em> six seven"
    # doc 3 dropped entirely
    assert 3 not in out
    # doc 4: final-position match -> one-token snippet (truncated)
    assert out[4]["snippet"] == "<em>aa</em>"
    # doc 5: (u, n) tie between start 0 and start 16 -> earliest start
    assert out[5]["snippet"].startswith("<em>aa</em> z")


def test_hit_columns_pass_through(spark):
    hits = spark.createDataFrame(
        [("q1", 1, 0.5, 1)], "qid string, doc_id long, score double, rank int")
    row = highlight(hits, _docs_df(spark), QUERIES).collect()[0]
    assert row["score"] == 0.5 and row["rank"] == 1
    assert "snippet" in row.asDict() and "n_matches" in row.asDict()


def test_stemmed_matching_highlights_inflections(spark):
    # index-analyzed query term 'run' must highlight 'running'/'runs'
    # when the index stems — and must NOT when it does not
    docs = spark.createDataFrame(
        [(1, "he was running and she runs daily")],
        "doc_id long, text string")
    hits = spark.createDataFrame([("q1", 1)], "qid string, doc_id long")
    queries = [("q1", ["run"])]
    stemmed = highlight(hits, docs, queries, stem=True).collect()
    assert stemmed and stemmed[0]["n_matches"] == 2
    assert "<em>running</em>" in stemmed[0]["snippet"]
    assert "<em>runs</em>" in stemmed[0]["snippet"]
    plain = highlight(hits, docs, queries, stem=False).collect()
    assert plain == []  # no surface-form 'run' present

    # replica equality for the stemmed pair of streams
    disp = tokenize_texts(["he was running and she runs daily"],
                          keep_stopwords=True)[0]
    mt = tokenize_texts(["he was running and she runs daily"],
                        stem=True, keep_stopwords=True)[0]
    n, snip = snippet_py(disp, ["run"], DEFAULT_WINDOW, match_toks=mt)
    assert stemmed[0]["n_matches"] == n
    assert stemmed[0]["snippet"] == snip


def test_highlight_topk_on_index(spark, tiny_index):
    # pick two real vocabulary terms from the tiny index
    terms = [r["term"] for r in
             tiny_index.termstats.orderBy(F.desc("df")).limit(2).collect()]
    queries = [("q1", terms)]
    out = highlight_topk(tiny_index, queries, 5, window=8).collect()
    assert out, "top-k over in-vocabulary terms must highlight"
    for r in out:
        assert r["n_matches"] >= 1
        assert "<em>" in r["snippet"]
        # snippet window bound: at most 8 display tokens
        assert len(r["snippet"].split(" ")) <= 8
    # every top-k hit carries a snippet (BM25 hits always match)
    from engine.search import score_wand
    k_hits = score_wand(tiny_index, [("q1", t, 1.0) for t in terms], 5)
    assert len(out) == k_hits.count()
