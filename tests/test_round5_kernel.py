"""Bounded-additive-feature WAND kernel path (VERDICT r4 item 3):
rank_feature (saturation/sigmoid) and distance_feature now run the
block-max kernel with every θ-comparison relaxed by the feature bound
(``ub_shift``) and an ``emit='cands'`` no-top-k-cut candidate set —
these tests pin rank identity against the exhaustive path (the dismax
equivalence pattern, tests/test_round4_closing.py), including a
forced multi-shard run, the configs where the feature genuinely
reorders the bm25 ranking, and the documented fallbacks (log /
negative boost stay exhaustive)."""

import pytest
from pyspark.sql import functions as F

import engine.search as S
from engine.search import (WAND_FEATURE_EPS, distance_feature_topk,
                           rank_feature_topk, score_wand, wand_stats)


def _qt(tiny_index):
    terms = [r["term"] for r in
             tiny_index.termstats.orderBy(F.desc("df"), "term")
             .limit(4).collect()]
    return [("q1", terms[0], 1.0), ("q1", terms[1], 1.0),
            ("q2", terms[1], 1.0), ("q2", terms[2], 2.0),
            ("q2", terms[3], 1.0)]


def _rows(df):
    return [(r["qid"], r["doc_id"], r["score"], r["rank"])
            for r in df.orderBy("qid", "rank").collect()]


RF_CASES = [
    ("saturation", dict(pivot=500.0, boost=1.0), 5),
    ("saturation", dict(pivot=100.0, boost=5.0), 3),
    ("saturation", dict(pivot=5000.0, boost=50.0), 5),   # feature-dominant
    ("sigmoid", dict(pivot=300.0, boost=2.0, exponent=3), 5),
]


def test_rank_feature_kernel_rank_identical(tiny_index):
    qt = _qt(tiny_index)
    for function, kw, k in RF_CASES:
        got = _rows(rank_feature_topk(tiny_index, qt, k,
                                      function=function, use_wand=True,
                                      **kw))
        exp = _rows(rank_feature_topk(tiny_index, qt, k,
                                      function=function, use_wand=False,
                                      **kw))
        assert got == exp, (function, kw)
        assert len(exp) > 0


def test_rank_feature_actually_reorders_bm25(tiny_index):
    """Non-vacuity probe: the feature-dominant config must produce a
    doc order DIFFERENT from plain bm25 top-k — otherwise the
    equivalence above would never exercise the no-top-k-cut emit."""
    qt = _qt(tiny_index)
    k = 5
    plain = [(r["qid"], r["doc_id"])
             for r in score_wand(tiny_index, qt, k)
             .orderBy("qid", "rank").collect()]
    feat = [(q, d) for q, d, _, _ in
            _rows(rank_feature_topk(tiny_index, qt, k, pivot=5000.0,
                                    boost=50.0))]
    assert plain != feat


def test_distance_feature_kernel_rank_identical(tiny_index):
    qt = _qt(tiny_index)
    for origin, pivot, boost, k in [(300.0, 50.0, 3.0, 5),
                                    (0.0, 200.0, 1.0, 4),
                                    (450.0, 20.0, 25.0, 3)]:
        got = _rows(distance_feature_topk(tiny_index, qt, k, origin,
                                          pivot, boost, use_wand=True))
        exp = _rows(distance_feature_topk(tiny_index, qt, k, origin,
                                          pivot, boost, use_wand=False))
        assert got == exp, (origin, pivot, boost)
        assert len(exp) > 0


def test_feature_kernel_multi_shard(tiny_index, monkeypatch):
    """Force multi-shard fan-out (tiny per-task posting budget) so the
    θ-seed sharing + shard-range slicing legs run under ub_shift."""
    monkeypatch.setattr(S, "WAND_TARGET_POSTINGS_PER_TASK", 20)
    qt = _qt(tiny_index)
    got = _rows(rank_feature_topk(tiny_index, qt, 4, pivot=100.0,
                                  boost=5.0, use_wand=True))
    exp = _rows(rank_feature_topk(tiny_index, qt, 4, pivot=100.0,
                                  boost=5.0, use_wand=False))
    assert got == exp
    got = _rows(distance_feature_topk(tiny_index, qt, 4, 300.0, 50.0,
                                      3.0, use_wand=True))
    exp = _rows(distance_feature_topk(tiny_index, qt, 4, 300.0, 50.0,
                                      3.0, use_wand=False))
    assert got == exp
    # the QUANTIZED kernel under forced sharding: flat-OR sqs rank-
    # identical to the tree plan with θ-seed sharing + slicing live
    terms = [r["term"] for r in
             tiny_index.termstats.orderBy(F.desc("df"), "term")
             .limit(3).collect()]
    flat = " | ".join(terms)
    assert _sqs_rows(tiny_index, flat, use_wand=True) == \
        _sqs_rows(tiny_index, flat, use_wand=False)


def test_log_and_negative_boost_stay_exhaustive(tiny_index):
    """The documented fallbacks: log's term is unbounded by boost (the
    sound bound needs a stored feature-max), a negative boost breaks
    the f ≥ 0 premise — both must answer identically with use_wand on
    (routing exhaustive underneath)."""
    qt = _qt(tiny_index)
    for kw in [dict(function="log", pivot=10.0, boost=2.0),
               dict(function="saturation", pivot=100.0, boost=-0.5)]:
        got = _rows(rank_feature_topk(tiny_index, qt, 5, use_wand=True,
                                      **kw))
        exp = _rows(rank_feature_topk(tiny_index, qt, 5, use_wand=False,
                                      **kw))
        assert got == exp, kw
        assert len(exp) > 0
    got = _rows(distance_feature_topk(tiny_index, qt, 5, 300.0, 50.0,
                                      -1.0, use_wand=True))
    exp = _rows(distance_feature_topk(tiny_index, qt, 5, 300.0, 50.0,
                                      -1.0, use_wand=False))
    assert got == exp


def _sqs_rows(tiny_index, s, **kw):
    from engine.queryparse import simple_query_string_topk
    return [(r["qid"], r["doc_id"], r["score"], r["rank"])
            for r in simple_query_string_topk(tiny_index, "q", s, 5,
                                              **kw)
            .orderBy("qid", "rank").collect()]


def test_sqs_flat_or_kernel_rank_identical(tiny_index, monkeypatch):
    """simple_query_string's r5 fast path: a flat pure-positive OR of
    plain term atoms pages candidates through the WAND kernel and
    re-scores them through the identical micro-unit pipeline — must
    be rank-identical to the general one-pass tree plan, and must
    ENGAGE for flat trees / NOT engage when the tree carries NOT,
    phrase, or AND structure."""
    import engine.search as S
    from engine.positions import build_positions

    build_positions(tiny_index.spark, tiny_index.index_dir)
    terms = [r["term"] for r in
             tiny_index.termstats.orderBy(F.desc("df"), "term")
             .limit(3).collect()]
    calls = {"n": 0}
    real = S.score_wand

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(S, "score_wand", counting)
    flat = " | ".join(terms)
    fast = _sqs_rows(tiny_index, flat, use_wand=True)
    assert calls["n"] == 1                       # fast path engaged
    slow = _sqs_rows(tiny_index, flat, use_wand=False)
    assert calls["n"] == 1
    assert fast == slow and len(slow) > 0
    # bare whitespace under default OR is also a flat OR tree
    fast2 = _sqs_rows(tiny_index, " ".join(terms[:2]), use_wand=True)
    assert calls["n"] == 2
    assert fast2 == _sqs_rows(tiny_index, " ".join(terms[:2]),
                              use_wand=False)
    # NOT / AND / phrase trees keep the one-pass tree plan — and the
    # answers still match with use_wand on (gate: no engagement)
    before = calls["n"]
    for q in (f"{terms[0]} + {terms[1]}",
              f"{terms[0]} | -{terms[1]}",
              f'"{terms[0]} {terms[1]}" | {terms[2]}'):
        a = _sqs_rows(tiny_index, q, use_wand=True)
        b = _sqs_rows(tiny_index, q, use_wand=False)
        assert a == b, q
    assert calls["n"] == before                  # never engaged


def test_wand_stats_with_shift(tiny_index):
    qt = _qt(tiny_index)
    rows = wand_stats(tiny_index, qt, 3,
                      ub_shift=5.0 + WAND_FEATURE_EPS).collect()
    assert rows
    for r in rows:
        assert 0 <= r["blocks_decoded"] <= r["blocks_total"]
        assert 0 <= r["postings_scored"] <= r["postings_total"]
