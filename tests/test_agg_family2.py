"""weighted_avg / boxplot / median_absolute_deviation / multi_terms
aggs (engine/search.py): numpy/python replicas on the shared tiny
index + the pinned contracts (exact type-7 quantiles, NULL-key drop,
count-desc key-asc rank)."""

import math

import numpy as np
from pyspark.sql import functions as F

from engine.analysis import tokenize_texts
from engine.search import (boxplot_agg, mad_agg, multi_terms_agg,
                           weighted_avg_agg)


def _matched_and_fields(tiny_index, queries):
    rows = tiny_index.docs.select("doc_id", "content", "lang").collect()
    toks = tokenize_texts([r["content"] for r in rows])
    info = {r["doc_id"]: {"dl": len(t), "nc": len(r["content"]),
                          "lang": r["lang"], "set": set(t)}
            for r, t in zip(rows, toks)}
    matched = {qid: [d for d, v in info.items()
                     if any(t in v["set"] for t in ts)]
               for qid, ts in queries}
    return info, matched


def _queries(tiny_index):
    terms = [r["term"] for r in
             tiny_index.termstats.orderBy(F.desc("df"), "term")
             .limit(2).collect()]
    return [("q1", [terms[0]]), ("q2", [terms[1]])]


def _r6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_weighted_avg_matches_brute(spark, tiny_index):
    queries = _queries(tiny_index)
    info, matched = _matched_and_fields(tiny_index, queries)
    got = {r["qid"]: (r["count"], r["weight_sum"], r["weighted_avg"])
           for r in weighted_avg_agg(tiny_index, queries).collect()}
    for qid, docs in matched.items():
        vw = sum(info[d]["dl"] * info[d]["nc"] for d in docs)
        ws = sum(info[d]["nc"] for d in docs)
        assert got[qid] == (len(docs), ws, _r6(vw / ws))


def test_boxplot_and_mad_match_numpy(spark, tiny_index):
    queries = _queries(tiny_index)
    info, matched = _matched_and_fields(tiny_index, queries)
    box = {r["qid"]: tuple(r)[1:]
           for r in boxplot_agg(tiny_index, queries).collect()}
    mad = {r["qid"]: (r["median_dl"], r["mad"])
           for r in mad_agg(tiny_index, queries).collect()}
    for qid, docs in matched.items():
        dls = np.array(sorted(info[d]["dl"] for d in docs), dtype=float)
        q1, q2, q3 = (np.percentile(dls, p, method="linear")
                      for p in (25, 50, 75))
        assert box[qid] == (int(dls.min()), _r6(q1), _r6(q2), _r6(q3),
                            int(dls.max()))
        med = np.percentile(dls, 50, method="linear")
        m = np.percentile(np.abs(dls - med), 50, method="linear")
        assert mad[qid] == (_r6(med), _r6(m))


def test_multi_terms_drops_null_keys_and_ranks(spark, tiny_index):
    queries = _queries(tiny_index)
    info, matched = _matched_and_fields(tiny_index, queries)
    # fields: lang + a derived group key, with doc_id % 7 == 0 given a
    # NULL group — those docs must drop from the buckets entirely
    fields = tiny_index.docs.select(
        "doc_id", "lang",
        F.when(F.col("doc_id") % 7 != 0,
               F.pmod(F.col("doc_id"), F.lit(3))).alias("grp"))
    got = [(r["qid"], r["lang"], r["grp"], r["n_docs"], r["rank"])
           for r in multi_terms_agg(tiny_index, queries, fields,
                                    ["lang", "grp"], 4).collect()]
    exp = []
    for qid, docs in matched.items():
        counts = {}
        for d in docs:
            if d % 7 == 0:
                continue
            k = (info[d]["lang"], d % 3)
            counts[k] = counts.get(k, 0) + 1
        ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, ((lang, grp), n) in enumerate(ordered[:4], 1):
            exp.append((qid, lang, grp, n, rank))
    assert sorted(got) == sorted(exp)
    assert got, "fixture must produce buckets"
