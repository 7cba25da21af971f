"""constant_score (search.py), rate agg (streaming.py), rank_eval
metrics MRR/recall/ERR (evaluate.py): python replicas plus the pinned
ES contracts (filter-context constant scoring with the doc_id
tie-break, the unit≤interval refusal, Chapelle-2009 ERR with binary
grades). Engine-complete ahead of their queries() window slots (the
50-slot driver window is at capacity — entries queue for the r5
rotation, noted in CLAUDE.md)."""

import collections
import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from engine import streaming
from engine.analysis import tokenize_texts
from engine.evaluate import rank_eval_metrics
from engine.search import boolean_and, constant_score_topk


def _r(x, p):
    return math.floor(x * 10 ** p + 0.5) / 10 ** p


def _two_terms(tiny_index):
    return [r["term"] for r in
            tiny_index.termstats.orderBy(F.desc("df"), "term")
            .limit(4).collect()]


def test_constant_score_any_and_all(spark, tiny_index):
    ts = _two_terms(tiny_index)
    rows = tiny_index.docs.select("doc_id", "content").collect()
    toks = tokenize_texts([r["content"] for r in rows])
    sets = {r["doc_id"]: set(t) for r, t in zip(rows, toks)}
    queries = [("q1", [ts[0], ts[3]]), ("q2", [ts[1], ts[2]])]
    k = 7
    for mode, pred in (("any", any), ("all", all)):
        exp = {}
        for qid, terms in queries:
            docs = sorted(d for d, s in sets.items()
                          if pred(t in s for t in terms))
            exp[qid] = [(d, 1.5, i + 1) for i, d in enumerate(docs[:k])]
        got = collections.defaultdict(list)
        out = constant_score_topk(tiny_index, queries, k, boost=1.5,
                                  mode=mode)
        for r in out.collect():
            got[r["qid"]].append((r["doc_id"], r["score"], r["rank"]))
        assert dict(got) == exp, mode
    # 'all' is the boolean_and match set exactly (rank-cut aside)
    ba = {(r["qid"], r["doc_id"])
          for r in boolean_and(tiny_index, queries).collect()}
    cs = {(r["qid"], r["doc_id"]) for r in constant_score_topk(
        tiny_index, queries, 10 ** 6, mode="all").collect()}
    assert ba == cs
    with pytest.raises(ValueError):
        constant_score_topk(tiny_index, queries, k, mode="fuzzy")


def _mk_events(spark):
    base = dt.datetime(2026, 3, 1, 0, 0, 0)
    rows = []
    for h, n in enumerate([3, 6]):          # two hourly buckets
        for i in range(n):
            rows.append((base + dt.timedelta(hours=h, minutes=i),
                         "click", 0.5))
    rows.append((base, "view", 2.0))
    return spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double")


def test_rate_agg_per_minute_and_unit_guard(spark):
    out = {(r["window_start"].hour, r["event_type"]):
           (r["n"], r["doc_rate"], r["value_rate"])
           for r in streaming.rate_agg(_mk_events(spark),
                                       unit="1 minute").collect()}
    # hourly buckets, minute unit: rate = value / 60
    assert out[(0, "click")] == (3, _r(3 / 60, 6), _r(1.5 / 60, 6))
    assert out[(1, "click")] == (6, _r(6 / 60, 6), _r(3.0 / 60, 6))
    assert out[(0, "view")] == (1, _r(1 / 60, 6), _r(2.0 / 60, 6))
    # unit == interval: rate is the bucket value itself
    out2 = {(r["window_start"].hour, r["event_type"]): r["doc_rate"]
            for r in streaming.rate_agg(_mk_events(spark),
                                        unit="1 hour").collect()}
    assert out2[(1, "click")] == 6.0
    # ES refuses a unit longer than the histogram interval
    with pytest.raises(ValueError):
        streaming.rate_agg(_mk_events(spark), window="1 minute",
                           unit="1 hour")


def test_rank_eval_metrics_vs_replica(spark):
    # q1: rel docs a,b,c ; run hits a@1, b@3 (c missed)
    # q2: rel doc x      ; run has no relevant doc in top-k
    # q3: rel doc y      ; topic entirely absent from the run
    run = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "z", 2), ("q1", "b", 3), ("q1", "w", 4),
         ("q2", "n", 1), ("q2", "m", 2)],
        "qid string, docno string, rank int")
    qrels = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "b", 1), ("q1", "c", 1), ("q1", "z", 0),
         ("q2", "x", 1), ("q3", "y", 1)],
        "qid string, docno string, rel int")
    got = {r["qid"]: (r["mrr"], r["recall"], r["err"])
           for r in rank_eval_metrics(run, qrels, k=3).collect()}
    # q1 replica: first rel at rank 1 -> mrr 1; rel in top-3 = {a,b}
    # of 3 -> recall 2/3; ERR terms: a@1 m=0 -> 0.5/1, b@3 m=1 ->
    # 0.25/3 — each nano-quantized then summed
    err_q1 = (math.floor(0.5 / 1 * 1e9 + 0.5) +
              math.floor(0.25 / 3 * 1e9 + 0.5)) / 1e9
    assert got["q1"] == (1.0, _r(2 / 3, 6), _r(err_q1, 6))
    assert got["q2"] == (0.0, 0.0, 0.0)
    assert got["q3"] == (0.0, 0.0, 0.0)
    # rank-4 hit is OUTSIDE k=3 — verify the cut by widening k
    got4 = {r["qid"]: r["recall"]
            for r in rank_eval_metrics(run, qrels, k=4).collect()}
    assert got4["q1"] == _r(2 / 3, 6)  # w is not relevant: unchanged
    # MRR uses the FIRST relevant rank even when a later one exists
    run_b = spark.createDataFrame(
        [("q1", "z", 1), ("q1", "b", 2), ("q1", "a", 3)],
        "qid string, docno string, rank int")
    gb = {r["qid"]: r["mrr"]
          for r in rank_eval_metrics(run_b, qrels, k=3).collect()}
    assert gb["q1"] == 0.5
