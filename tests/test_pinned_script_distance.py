"""script_score / distance_feature / pinned (engine/search.py):
python replicas on the shared tiny index plus the pinned ES contracts
(script REPLACES the score with the min_score gate before the cut,
distance_feature's reciprocal additive term, pinned promotion order
with dedup/unknown-id skip and the WAND-vs-exhaustive organic-path
rank identity). Engine-complete ahead of their queries() window slots
(the 50-slot driver window is at capacity with never-checked entries
— tools/check_rotation.py; entries queue for the r5 rotation, noted
in CLAUDE.md)."""

import collections
import math

import pytest
from pyspark.sql import functions as F

from engine.search import (distance_feature_topk, pinned_topk,
                           score_exhaustive, script_score_topk)


def _r(x, p):
    return math.floor(x * 10 ** p + 0.5) / 10 ** p


def _queries(tiny_index):
    terms = [r["term"] for r in
             tiny_index.termstats.orderBy(F.desc("df"), "term")
             .limit(2).collect()]
    return [("q1", [terms[0]]), ("q2", [terms[1]])]


def _base(tiny_index, qt):
    return {(r["qid"], r["doc_id"]): r["score"]
            for r in score_exhaustive(tiny_index, qt, None).collect()}


def _doc_feats(tiny_index):
    from engine.search import _doc_lengths
    nc = {r["doc_id"]: len(r["content"])
          for r in tiny_index.docs.select("doc_id", "content").collect()}
    dl = {r["doc_id"]: r["dl"]
          for r in _doc_lengths(tiny_index).collect()}
    return nc, dl


def test_script_score_vs_replica(spark, tiny_index):
    queries = _queries(tiny_index)
    qt = [(q, t, 1.0) for q, ts in queries for t in ts]
    base = _base(tiny_index, qt)
    nc, dl = _doc_feats(tiny_index)
    cases = [
        ("s * 2 + ln(1 + dl) / 10",
         lambda s, d: s * 2 + math.log(1 + dl[d]) / 10),
        ("nc / (nc + 100.0)",               # score-independent script
         lambda s, d: nc[d] / (nc[d] + 100.0)),
    ]
    k = 5
    for sql, fn in cases:
        exp = {}
        for qid in {q for q, _ in base}:
            scored = sorted(((_r(fn(s, d), 4), d)
                             for (q, d), s in base.items() if q == qid),
                            key=lambda t: (-t[0], t[1]))
            exp[qid] = [(d, s, i + 1)
                        for i, (s, d) in enumerate(scored[:k])]
        got = collections.defaultdict(list)
        for r in script_score_topk(tiny_index, qt, k, sql).collect():
            got[r["qid"]].append((r["doc_id"], r["score"], r["rank"]))
        assert dict(got) == exp, sql


def test_script_score_min_score_gates_before_cut(spark, tiny_index):
    """min_score EXCLUDES (never truncates): pick the threshold between
    the 2nd and 3rd distinct rounded script values of q1 — the result
    must contain exactly the docs above it, re-ranked densely, with
    deeper docs promoted into the page."""
    queries = _queries(tiny_index)
    qt = [(q, t, 1.0) for q, ts in queries for t in ts]
    base = _base(tiny_index, qt)
    vals = sorted({_r(s, 4) for (q, _), s in base.items() if q == "q1"},
                  reverse=True)
    assert len(vals) >= 3, "fixture needs >=3 distinct scores"
    thr = (vals[1] + vals[2]) / 2
    out = [r for r in script_score_topk(
        tiny_index, qt, 1000, "s", min_score=thr).collect()
        if r["qid"] == "q1"]
    exp = sorted(((_r(s, 4), d) for (q, d), s in base.items()
                  if q == "q1" and _r(s, 4) >= thr),
                 key=lambda t: (-t[0], t[1]))
    assert [(r["doc_id"], r["score"], r["rank"]) for r in out] == \
        [(d, s, i + 1) for i, (s, d) in enumerate(exp)]
    # every surviving row clears the gate; the gate genuinely bit
    assert all(r["score"] >= thr for r in out)
    assert len(out) < len({d for (q, d) in base if q == "q1"})


def test_distance_feature_vs_replica_and_pivot_guard(spark, tiny_index):
    ORIGIN, PIVOT, BOOST = 500.0, 200.0, 3.0
    queries = _queries(tiny_index)
    qt = [(q, t, 1.0) for q, ts in queries for t in ts]
    base = _base(tiny_index, qt)
    nc, _ = _doc_feats(tiny_index)
    k = 5
    exp = {}
    for qid in {q for q, _ in base}:
        scored = []
        for (q, d), s in base.items():
            if q != qid:
                continue
            fterm = _r(BOOST * PIVOT / (PIVOT + abs(nc[d] - ORIGIN)), 6)
            scored.append((_r(s + fterm, 4), d))
        scored.sort(key=lambda t: (-t[0], t[1]))
        exp[qid] = [(d, s, i + 1) for i, (s, d) in enumerate(scored[:k])]
    got = collections.defaultdict(list)
    for r in distance_feature_topk(tiny_index, qt, k, origin=ORIGIN,
                                   pivot=PIVOT, boost=BOOST).collect():
        got[r["qid"]].append((r["doc_id"], r["score"], r["rank"]))
    assert dict(got) == exp
    with pytest.raises(ValueError):
        distance_feature_topk(tiny_index, qt, k, origin=0.0, pivot=0.0)


def test_pinned_order_dedup_unknown_and_path_identity(spark, tiny_index):
    queries = _queries(tiny_index)
    qt = [(q, t, 1.0) for q, ts in queries for t in ts]
    base = _base(tiny_index, qt)
    org = {}
    for qid in {q for q, _ in base}:
        org[qid] = [d for _, d in sorted(
            ((_r(s, 4), d) for (q, d), s in base.items() if q == qid),
            key=lambda t: (-t[0], t[1]))]
    k = 6
    # pins: one organic-top doc (absorbed from organic), one doc from
    # the very BOTTOM of the organic ranking (promoted from far below
    # any top-k page), one unknown id (skipped), one duplicate (first
    # occurrence wins)
    deep = org["q1"][-1]
    pins = [("q1", [org["q1"][2], deep, 9999999, org["q1"][2]]),
            ("q2", [org["q2"][0]])]
    out = pinned_topk(tiny_index, qt, pins, k)
    got = collections.defaultdict(list)
    for r in out.collect():
        got[r["qid"]].append(
            (r["doc_id"], r["score"], r["pinned"], r["rank"]))
    # q1: pins first in GIVEN order (dup + unknown skipped, score
    # NULL), then organic order with pinned docs removed
    exp_q1_docs = [org["q1"][2], deep] + \
        [d for d in org["q1"] if d not in (org["q1"][2], deep)][:k - 2]
    assert [t[0] for t in got["q1"]] == exp_q1_docs
    assert [t[2] for t in got["q1"]] == [True, True] + [False] * (k - 2)
    assert got["q1"][0][1] is None and got["q1"][1][1] is None
    assert [t[3] for t in got["q1"]] == list(range(1, k + 1))
    # organic scores are the rounded exhaustive scores
    for d, s, pinned_flag, _ in got["q1"]:
        if not pinned_flag:
            assert s == _r(base[("q1", d)], 4)
    # q2: its own top doc pinned — absorbed, never shown twice
    assert [t[0] for t in got["q2"]][:1] == [org["q2"][0]]
    assert [t[0] for t in got["q2"]].count(org["q2"][0]) == 1
    assert [t[0] for t in got["q2"]][1:] == org["q2"][1:k]
    # WAND and exhaustive organic paths are rank-identical
    ex = pinned_topk(tiny_index, qt, pins, k, use_wand=False)
    assert [tuple(r) for r in out.collect()] == \
        [tuple(r) for r in ex.collect()]


def test_pinned_empty_and_overflow(spark, tiny_index):
    queries = _queries(tiny_index)
    qt = [(q, t, 1.0) for q, ts in queries for t in ts]
    base = _base(tiny_index, qt)
    org1 = [d for _, d in sorted(
        ((_r(s, 4), d) for (q, d), s in base.items() if q == "q1"),
        key=lambda t: (-t[0], t[1]))]
    # no pins at all -> plain rounded BM25 page
    out = [r for r in pinned_topk(tiny_index, qt, [], 4).collect()
           if r["qid"] == "q1"]
    assert [r["doc_id"] for r in out] == org1[:4]
    assert not any(r["pinned"] for r in out)
    # more pins than k -> the page is pins-only, truncated in order
    pins = [("q1", org1[:5])]
    out = [r for r in pinned_topk(tiny_index, qt, pins, 3).collect()
           if r["qid"] == "q1"]
    assert [r["doc_id"] for r in out] == org1[:3]
    assert all(r["pinned"] for r in out)
