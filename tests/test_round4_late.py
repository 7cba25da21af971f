"""rank_feature / string_stats / sibling+moving pipeline aggs
(engine/search.py, engine/streaming.py): python replicas on the shared
tiny index plus the pinned ES contracts (additive should clause with
the cut last, character-distribution entropy via int64 micro-units,
moving_fn's exclude-current window, serial_diff lag semantics)."""

import collections
import datetime as dt
import math

from pyspark.sql import functions as F

from engine import streaming
from engine.analysis import tokenize_texts
from engine.search import (rank_feature_topk, score_exhaustive,
                           string_stats_agg)

RF_PIVOT = 120.0
RF_BOOST = 7.0


def _r(x, p):
    return math.floor(x * 10 ** p + 0.5) / 10 ** p


def _queries(tiny_index):
    terms = [r["term"] for r in
             tiny_index.termstats.orderBy(F.desc("df"), "term")
             .limit(2).collect()]
    return [("q1", [terms[0]]), ("q2", [terms[1]])]


def test_rank_feature_matches_replica_and_cuts_last(spark, tiny_index):
    queries = _queries(tiny_index)
    qt = [(q, t, 1.0) for q, ts in queries for t in ts]
    # trusted base scores (exhaustive BM25 — the engine's own oracle
    # path) + the feature replica in python, cut applied LAST
    base = {(r["qid"], r["doc_id"]): r["score"]
            for r in score_exhaustive(tiny_index, qt, None).collect()}
    nc = {r["doc_id"]: len(r["content"])
          for r in tiny_index.docs.select("doc_id", "content").collect()}
    k = 5
    exp = {}
    for qid in {q for q, _ in base}:
        scored = []
        for (q, d), s in base.items():
            if q != qid:
                continue
            fterm = _r(RF_BOOST * (nc[d] / (nc[d] + RF_PIVOT)), 6)
            scored.append((_r(s + fterm, 4), d))
        scored.sort(key=lambda t: (-t[0], t[1]))
        exp[qid] = [(d, s, i + 1)
                    for i, (s, d) in enumerate(scored[:k])]
    got = collections.defaultdict(list)
    for r in rank_feature_topk(tiny_index, qt, k, pivot=RF_PIVOT,
                               boost=RF_BOOST).collect():
        got[r["qid"]].append((r["doc_id"], r["score"], r["rank"]))
    assert dict(got) == exp


def test_rank_feature_zero_boost_is_rounded_bm25(spark, tiny_index):
    """boost=0 degenerates to plain BM25 under the house float
    discipline: ranked by the 4dp-ROUNDED score (doc_id asc on rounded
    ties) — NOT score_exhaustive's exact-score order, which can flip a
    rounded tie the other way."""
    queries = _queries(tiny_index)
    qt = [(q, t, 1.0) for q, ts in queries for t in ts]
    base = {(r["qid"], r["doc_id"]): r["score"]
            for r in score_exhaustive(tiny_index, qt, None).collect()}
    exp = {}
    for qid in {q for q, _ in base}:
        scored = sorted(((_r(s, 4), d) for (q, d), s in base.items()
                         if q == qid), key=lambda t: (-t[0], t[1]))
        exp[qid] = [(d, i + 1) for i, (_, d) in enumerate(scored[:5])]
    rf = rank_feature_topk(tiny_index, qt, 5, pivot=RF_PIVOT, boost=0.0)
    got = collections.defaultdict(list)
    for r in rf.collect():
        got[r["qid"]].append((r["doc_id"], r["rank"]))
    assert dict(got) == exp


def test_rank_feature_functions_and_bad_name(spark, tiny_index):
    queries = _queries(tiny_index)
    qt = [(q, t, 1.0) for q, ts in queries for t in ts]
    nc = {r["doc_id"]: len(r["content"])
          for r in tiny_index.docs.select("doc_id", "content").collect()}
    base = {(r["qid"], r["doc_id"]): r["score"]
            for r in score_exhaustive(tiny_index, qt, None).collect()}

    def replica(fn):
        exp = {}
        for (q, d), s in base.items():
            x = float(nc[d])
            if fn == "log":
                raw = math.log(x + RF_PIVOT)
            else:  # sigmoid, exponent 2
                raw = x ** 2 / (x ** 2 + RF_PIVOT ** 2)
            exp[(q, d)] = _r(s + _r(RF_BOOST * raw, 6), 4)
        return exp

    for fn in ("log", "sigmoid"):
        out = rank_feature_topk(tiny_index, qt, 3, pivot=RF_PIVOT,
                                boost=RF_BOOST, function=fn)
        exp = replica(fn)
        for r in out.collect():
            assert r["score"] == exp[(r["qid"], r["doc_id"])]
    try:
        rank_feature_topk(tiny_index, qt, 3, function="nope")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_string_stats_matches_python_replica(spark, tiny_index):
    queries = _queries(tiny_index)
    rows = tiny_index.docs.select("doc_id", "content").collect()
    toks = tokenize_texts([r["content"] for r in rows])
    info = {r["doc_id"]: (r["content"], set(t))
            for r, t in zip(rows, toks)}
    got = {r["qid"]: tuple(r)[1:]
           for r in string_stats_agg(tiny_index, queries).collect()}
    for qid, ts in queries:
        docs = [d for d, (_, s) in info.items()
                if any(t in s for t in ts)]
        lens = [len(info[d][0]) for d in docs]
        cc = collections.Counter()
        for d in docs:
            cc.update(info[d][0])
        tot = sum(cc.values())
        micro = sum(
            math.floor(-(c / tot) * math.log2(c / tot) * 1e9 + 0.5)
            for c in cc.values())
        exp = (len(docs), min(lens), max(lens),
               _r(sum(lens) / len(docs), 6), _r(micro / 1e9, 6))
        assert got[qid] == exp
        assert got[qid][4] > 0  # entropy genuinely nonzero


def _mk_events(spark):
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    # click: hourly buckets n = 1,2,3,4,5 ; view: two buckets n = 2,1
    rows = []
    for h, n in enumerate([1, 2, 3, 4, 5]):
        for i in range(n):
            rows.append((base + dt.timedelta(hours=h, minutes=i),
                         "click", 1.0))
    rows += [(base, "view", 1.0), (base + dt.timedelta(minutes=1),
                                   "view", 1.0),
             (base + dt.timedelta(hours=3), "view", 1.0)]
    return spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double")


def test_bucket_stats_sibling_aggs(spark):
    out = {r["event_type"]: tuple(r)[1:]
           for r in streaming.windowed_bucket_stats(
               _mk_events(spark)).collect()}
    assert out["click"] == (5, 1, 5, _r(15 / 5, 6), 15)
    # view: only OCCUPIED buckets (2 of them) form the series
    assert out["view"] == (2, 1, 2, _r(3 / 2, 6), 3)


def test_moving_fn_excludes_current_and_serial_diff_lag(spark):
    out = streaming.windowed_moving_fn(_mk_events(spark),
                                       mov_window=3, lag=2)
    click = [(r["n"], r["mov_avg_n"], r["serial_diff_n"])
             for r in out.collect() if r["event_type"] == "click"]
    # n = 1,2,3,4,5; mov_avg over the PREVIOUS <=3 buckets, current
    # excluded: NULL, 1, 1.5, 2, 3; serial_diff lag 2: NULL, NULL,
    # 2, 2, 2
    assert click == [(1, None, None), (2, 1.0, None), (3, 1.5, 2),
                     (4, 2.0, 2), (5, 3.0, 2)]
    view = [(r["n"], r["mov_avg_n"], r["serial_diff_n"])
            for r in out.collect() if r["event_type"] == "view"]
    # occupied-buckets divergence (doc'd): hour-3 bucket's "previous"
    # is the hour-0 bucket
    assert view == [(2, None, None), (1, 2.0, None)]


def test_match_bool_prefix_vs_replica(spark, tiny_index):
    """match_bool_prefix: non-last terms score BM25 (weights =
    multiplicity), last term is a CONSTANT-SCORE prefix clause (+1.0),
    all SHOULD — replica composed from the engine's trusted exhaustive
    scorer + a python prefix-match over analyzed doc tokens."""
    from engine.search import match_bool_prefix_topk

    rows = tiny_index.docs.select("doc_id", "content").collect()
    toks = {r["doc_id"]: tokenize_texts([r["content"]])[0] for r in rows}
    terms = [r["term"] for r in
             tiny_index.termstats.orderBy(F.desc("df"), "term")
             .limit(3).collect()]
    t0, t1, t2 = terms
    queries = [("q1", f"{t0} {t1} {t2[:3]}"),     # 2 terms + prefix
               ("q2", t2[:2]),                    # prefix-only
               ("q3", f"{t0} {t0} {t1[:4]}"),     # duplicate term (w=2)
               ("q4", "the of a")]                # analyzes empty
    term_qt = {"q1": [(t0, 1.0), (t1, 1.0)], "q2": [],
               "q3": [(t0, 2.0)]}
    prefixes = {"q1": t2[:3], "q2": t2[:2], "q3": t1[:4]}
    qt = [(q, t, w) for q, ts in term_qt.items() for t, w in ts]
    base = {(r["qid"], r["doc_id"]): r["score"]
            for r in __import__("engine.search", fromlist=["x"])
            .score_exhaustive(tiny_index, qt, None).collect()}
    k = 7
    exp = {}
    for qid in prefixes:
        pmatch = {d for d, ts in toks.items()
                  if any(t.startswith(prefixes[qid]) for t in ts)}
        scores = {}
        for (q, d), s in base.items():
            if q == qid:
                scores[d] = s
        for d in pmatch:
            scores[d] = scores.get(d, 0.0) + 1.0
        ranked = sorted(((_r(s, 4), d) for d, s in scores.items()),
                        key=lambda t: (-t[0], t[1]))
        exp[qid] = [(d, s, i + 1)
                    for i, (s, d) in enumerate(ranked[:k])]
    got = collections.defaultdict(list)
    for r in match_bool_prefix_topk(tiny_index, queries, k).collect():
        got[r["qid"]].append((r["doc_id"], r["score"], r["rank"]))
    assert dict(got) == {q: v for q, v in exp.items() if v}
    assert "q4" not in got
    # the prefix clause genuinely bites: q2 is constant-score 1.0
    assert got["q2"] and all(s == 1.0 for _, s, _ in got["q2"])


def test_scripted_metric_vs_replica(spark, tiny_index):
    """scripted_metric: map/combine/reduce as Catalyst SQL — python
    replica over analyzed token counts and char lengths, covering an
    integer-sum map, an avg+reduce chain, and a categorical map."""
    from engine.search import scripted_metric_agg

    queries = _queries(tiny_index)
    rows = tiny_index.docs.select("doc_id", "content", "lang").collect()
    toks = tokenize_texts([r["content"] for r in rows])
    info = {r["doc_id"]: (len(t), len(r["content"]), r["lang"], set(t))
            for r, t in zip(rows, toks)}

    def matched(ts):
        return [d for d, (_, _, _, s) in info.items()
                if any(t in s for t in ts)]

    cases = [
        ("dl", "sum", None,
         lambda ds: sum(info[d][0] for d in ds)),
        ("dl * nc", "avg", "state / 100.0",
         lambda ds: _r(sum(info[d][0] * info[d][1] for d in ds)
                       / len(ds) / 100.0, 6)),
        ("case when lang = 'py' then 1 else 0 end", "sum", None,
         lambda ds: sum(1 for d in ds if info[d][2] == "py")),
        ("nc", "max", "state + n_docs",
         lambda ds: max(info[d][1] for d in ds) + len(ds)),
    ]
    for map_sql, comb, red, ref in cases:
        got = {r["qid"]: (r["n_docs"], r["value"])
               for r in scripted_metric_agg(
                   tiny_index, queries, map_sql, comb, red).collect()}
        for qid, ts in queries:
            ds = matched(ts)
            assert got[qid] == (len(ds), _r(float(ref(ds)), 6)), \
                (map_sql, comb, qid)
    try:
        scripted_metric_agg(tiny_index, queries, "dl", "median")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_moving_percentiles_type7_excludes_current(spark):
    out = streaming.windowed_moving_percentiles(_mk_events(spark),
                                                mov_window=3)
    click = [(r["n"], r["p25_n"], r["p50_n"], r["p75_n"])
             for r in out.collect() if r["event_type"] == "click"]
    # type-7 percentiles of the PREVIOUS <=3 bucket metrics, current
    # excluded (hand-computed: h = (m-1)*p indexing into the sorted
    # window): [] -> NULL; [1]; [1,2]; [1,2,3]; [2,3,4]
    assert click == [(1, None, None, None),
                     (2, 1.0, 1.0, 1.0),
                     (3, 1.25, 1.5, 1.75),
                     (4, 1.5, 2.0, 2.5),
                     (5, 2.5, 3.0, 3.5)]
    view = [(r["n"], r["p50_n"])
            for r in out.collect() if r["event_type"] == "view"]
    assert view == [(2, None), (1, 2.0)]
