"""rare_terms + sampler/diversified_sampler aggs (engine/search.py):
brute-force python replicas on the shared tiny index and the pinned
contract edges (exactness vs ES's cuckoo approximation, diversify
BEFORE the sample cut, rounded-score windows)."""

import pytest
from pyspark.sql import functions as F

from engine.analysis import tokenize_texts
from engine.search import rare_terms_agg, sampler_facet, score_exhaustive


def _corpus_tokens(tiny_index):
    rows = tiny_index.docs.select("doc_id", "content", "lang").collect()
    toks = tokenize_texts([r["content"] for r in rows])
    return {r["doc_id"]: (t, r["lang"]) for r, t in zip(rows, toks)}


def test_rare_terms_matches_brute(spark, tiny_index):
    by_doc = _corpus_tokens(tiny_index)
    terms = [r["term"] for r in
             tiny_index.termstats.orderBy(F.desc("df")).limit(2).collect()]
    queries = [("q1", [terms[0]]), ("q2", [terms[1]])]
    for mdc in (1, 2):
        got = [(r["qid"], r["term"], r["fg_df"], r["df"])
               for r in rare_terms_agg(tiny_index, queries,
                                       max_doc_count=mdc).collect()]
        # brute: matched set = docs containing any query term; fg_df =
        # matched docs containing the term; keep fg_df <= mdc
        df_all = {}
        for toks, _ in by_doc.values():
            for t in set(toks):
                df_all[t] = df_all.get(t, 0) + 1
        exp = []
        for qid, qts in queries:
            matched = [d for d, (toks, _) in by_doc.items()
                       if any(t in toks for t in qts)]
            fg = {}
            for d in matched:
                for t in set(by_doc[d][0]):
                    fg[t] = fg.get(t, 0) + 1
            for t in sorted(fg):
                if fg[t] <= mdc:
                    exp.append((qid, t, fg[t], df_all[t]))
        exp.sort(key=lambda r: (r[0], r[2], r[1]))
        assert got == exp


def test_sampler_facet_plain_and_diversified(spark, tiny_index):
    terms = [r["term"] for r in
             tiny_index.termstats.orderBy(F.desc("df")).limit(2).collect()]
    queries = [("q1", terms)]
    qt = [(q, t, 1.0) for q, ts in queries for t in ts]

    # python replica over the full scored match set
    scored = score_exhaustive(tiny_index, qt, k=None).collect()
    langs = {r["doc_id"]: r["lang"]
             for r in tiny_index.docs.select("doc_id", "lang").collect()}

    def replica(shard_size, dedup_mod=None, max_per_value=1):
        import math
        rows = [(r["qid"], r["doc_id"],
                 math.floor(r["score"] * 1e4 + 0.5) / 1e4) for r in scored]
        rows.sort(key=lambda x: (x[0], -x[2], x[1]))
        out = {}
        seen_per_key = {}
        taken = {}
        for qid, d, s in rows:
            if dedup_mod is not None:
                k = (qid, d % dedup_mod)
                seen_per_key[k] = seen_per_key.get(k, 0) + 1
                if seen_per_key[k] > max_per_value:
                    continue
            taken[qid] = taken.get(qid, 0) + 1
            if taken[qid] > shard_size:
                continue
            v = langs[d]
            out[(qid, v)] = out.get((qid, v), 0) + 1
        return out

    got = {(r["qid"], r["value"]): r["n_docs"]
           for r in sampler_facet(tiny_index, queries, "lang", 10).collect()}
    assert got == replica(10)

    got_div = {(r["qid"], r["value"]): r["n_docs"]
               for r in sampler_facet(
                   tiny_index, queries, "lang", 10,
                   dedup_expr=F.pmod(F.col("doc_id"), F.lit(3)),
                   max_per_value=1).collect()}
    assert got_div == replica(10, dedup_mod=3, max_per_value=1)
    # diversification bites: at most 3 distinct dedup keys x 1 each
    assert sum(got_div.values()) <= 3
    # plain sample takes the full shard_size when available
    assert sum(got.values()) == min(10, len({r["doc_id"] for r in scored}))


def test_sampler_diversify_before_cut(spark, tiny_index):
    # with max_per_value=1 and dedup = doc_id (all distinct), the
    # diversified sample equals the plain sample — the dedup window
    # must not disturb the score order
    terms = [r["term"] for r in
             tiny_index.termstats.orderBy(F.desc("df")).limit(1).collect()]
    queries = [("q1", terms)]
    a = sampler_facet(tiny_index, queries, "lang", 7).collect()
    b = sampler_facet(tiny_index, queries, "lang", 7,
                      dedup_expr=F.col("doc_id"),
                      max_per_value=1).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
