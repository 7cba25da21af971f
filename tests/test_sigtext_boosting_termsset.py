"""significant_text / boosting / terms_set (engine/search.py): brute
python replicas on the shared tiny index plus the pinned contract
edges — sigtext == significant_terms at full shard, duplicate-text
filtering on a constructed duplicate corpus, demotion-before-cut,
per-doc minimum_should_match gating."""

import math

import pytest
from pyspark.sql import functions as F

from engine.analysis import tokenize_texts
from engine.search import (boosting_topk, rare_terms_agg, score_exhaustive,
                           significant_terms, significant_text,
                           terms_set_topk)


def _tok_by_doc(index):
    rows = index.docs.select("doc_id", "content").collect()
    toks = tokenize_texts([r["content"] for r in rows],
                          **index.analyzer_opts())
    return {r["doc_id"]: set(t) for r, t in zip(rows, toks)}


def _top_terms(index, n=2):
    return [r["term"] for r in
            index.termstats.orderBy(F.desc("df"), "term").limit(n).collect()]


def test_significant_text_full_shard_equals_significant_terms(
        spark, tiny_index):
    # with shard_size >= |corpus| and no duplicate filtering, the
    # sampled foreground IS the matched set, and the re-analyzed
    # distinct terms per doc equal the tf table's — so the agg must
    # equal significant_terms exactly
    terms = _top_terms(tiny_index)
    queries = [("q1", [terms[0]]), ("q2", [terms[1]])]
    a = significant_text(tiny_index, queries, 5, shard_size=10_000,
                         filter_duplicate_text=False).collect()
    b = significant_terms(tiny_index, queries, 5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_significant_text_sampled_matches_brute(spark, tiny_index):
    terms = _top_terms(tiny_index)
    queries = [("q1", terms)]
    shard = 7
    qt = [(q, t, 1.0) for q, ts in queries for t in sorted(set(ts))]
    scored = score_exhaustive(tiny_index, qt, k=None).collect()
    by_doc = _tok_by_doc(tiny_index)
    n_docs = tiny_index.n_docs

    rows = [(r["qid"], r["doc_id"],
             math.floor(r["score"] * 1e4 + 0.5) / 1e4) for r in scored]
    rows.sort(key=lambda x: (x[0], -x[2], x[1]))
    samp = {}
    for qid, d, _s in rows:
        samp.setdefault(qid, [])
        if len(samp[qid]) < shard:
            samp[qid].append(d)
    df_all = {}
    for ts in by_doc.values():
        for t in ts:
            df_all[t] = df_all.get(t, 0) + 1
    exp = []
    for qid, docs in samp.items():
        fg = {}
        for d in docs:
            for t in by_doc[d]:
                fg[t] = fg.get(t, 0) + 1
        fg_n = len(docs)
        sc = []
        for t, fg_df in fg.items():
            fgp = fg_df / fg_n
            bgp = df_all[t] / n_docs
            if fgp > bgp:
                jlh = (fgp - bgp) * (fgp / bgp)
                sc.append((t, fg_df, df_all[t],
                           math.floor(jlh * 1e6 + 0.5) / 1e6))
        sc.sort(key=lambda x: (-x[3], x[0]))
        for rank, (t, fg_df, df, s) in enumerate(sc[:5], 1):
            exp.append((qid, t, fg_df, df, s, rank))
    got = [tuple(r) for r in significant_text(
        tiny_index, queries, 5, shard_size=shard).collect()]
    assert sorted(got) == sorted(exp)


def test_significant_text_filters_duplicate_text(spark, tmp_path):
    # corpus where one distinctive text appears 3x: without the filter
    # its terms dominate the foreground; with it they count ONCE
    from engine.index_build import build_index
    from engine.search import Index

    dup = "zebra quagga okapi unique signal"
    texts = [dup, dup, dup,
             "zebra common noise words here",
             "common words appear everywhere noise",
             "plain filler text common words",
             # filler keeps quagga's bg_pct (df/N = 3/10) below its
             # POST-dedup fg_pct (1/2) so it stays significant
             "filler alpha common words noise",
             "filler beta common words noise",
             "filler gamma common words noise",
             "filler delta common words noise"]
    corpus = spark.createDataFrame(
        [("r", f"{i:04d}", "-", "en", t) for i, t in enumerate(texts)],
        "repo string, path string, commit string, lang string, "
        "content string")
    path = str(tmp_path / "dupidx")
    build_index(spark, corpus, path, n_buckets=2, n_doc_buckets=1)
    idx = Index(spark, path)
    queries = [("q1", ["zebra"])]

    raw = {r["term"]: r["fg_df"] for r in significant_text(
        idx, queries, 20, shard_size=100,
        filter_duplicate_text=False).collect()}
    fil = {r["term"]: r["fg_df"] for r in significant_text(
        idx, queries, 20, shard_size=100,
        filter_duplicate_text=True).collect()}
    # 4 docs match 'zebra' (3 dups + 1 distinct); dedup keeps 2
    assert raw.get("quagga") == 3
    assert fil.get("quagga") == 1
    # fg_n shrank with the duplicates: quagga's fg_pct = 1/2 with the
    # filter (1 of 2 surviving docs), 3/4 without


def test_boosting_matches_brute_and_edges(spark, tiny_index):
    terms = _top_terms(tiny_index, 3)
    queries = [("b1", [terms[0]], [terms[1]]),
               ("b2", [terms[1], terms[2]], [])]
    nb = 0.25
    qt = [(q, t, 1.0) for q, pos, _n in queries for t in sorted(set(pos))]
    scored = score_exhaustive(tiny_index, qt, k=None).collect()
    by_doc = _tok_by_doc(tiny_index)

    exp = []
    for qid, _pos, neg in queries:
        rows = []
        for r in scored:
            if r["qid"] != qid:
                continue
            s = r["score"]
            if any(t in by_doc[r["doc_id"]] for t in neg):
                s = s * nb
            rows.append((r["doc_id"], s))
        rows.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, s) in enumerate(rows[:10], 1):
            exp.append((qid, d, round(s, 9), rank))
    got = [(r["qid"], r["doc_id"], round(r["score"], 9), r["rank"])
           for r in boosting_topk(tiny_index, queries, 10, nb).collect()]
    assert sorted(got) == sorted(exp)

    # negative_boost=1.0 is a no-op: equals the plain positive ranking
    plain = [(q, pos, []) for q, pos, _n in queries]
    a = boosting_topk(tiny_index, queries, 10, 1.0).collect()
    b = boosting_topk(tiny_index, plain, 10, 1.0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    # demotion-before-cut: every hit matching the negative clause must
    # rank below every non-demoted hit with a higher demoted score —
    # i.e. the result equals ranking demoted scores, already asserted
    # by the replica; additionally the demoted set is non-empty so the
    # edge actually bites on this corpus
    demoted_docs = {d for d, ts in by_doc.items() if terms[1] in ts}
    b1_hits = {g[1] for g in got if g[0] == "b1"}
    assert demoted_docs, "fixture must contain negative matches"
    assert b1_hits  # result non-empty


def test_terms_set_matches_brute(spark, tiny_index):
    terms = _top_terms(tiny_index, 4)
    queries = [("t1", terms[:3]), ("t2", terms[1:4])]
    by_doc = _tok_by_doc(tiny_index)
    # required up to 5 > |terms|=3: docs with doc_id % 5 == 4 are
    # unsatisfiable, so the gate provably bites on any corpus
    req = {d: 1 + (d % 5) for d in by_doc}
    msm_df = spark.createDataFrame(
        [(d, r) for d, r in req.items()],
        "doc_id long, required_matches long")

    qt = [(q, t, 1.0) for q, ts in queries for t in sorted(set(ts))]
    scored = score_exhaustive(tiny_index, qt, k=None).collect()
    exp = []
    for qid, qts in queries:
        rows = []
        for r in scored:
            if r["qid"] != qid:
                continue
            d = r["doc_id"]
            nm = sum(1 for t in set(qts) if t in by_doc[d])
            if nm >= max(req[d], 1):
                rows.append((d, nm, r["score"]))
        rows.sort(key=lambda x: (-x[2], x[0]))
        for rank, (d, nm, s) in enumerate(rows[:10], 1):
            exp.append((qid, d, nm, round(s, 9), rank))
    got = [(r["qid"], r["doc_id"], r["n_matched"], round(r["score"], 9),
            r["rank"]) for r in
           terms_set_topk(tiny_index, queries, msm_df, 10).collect()]
    assert sorted(got) == sorted(exp)
    # the gate bites: some matching doc was excluded
    plain = {d for d in by_doc
             if any(t in by_doc[d] for t in set(queries[0][1]))}
    kept = {g[1] for g in got if g[0] == "t1"}
    excluded = [d for d in plain
                if sum(1 for t in set(queries[0][1]) if t in by_doc[d])
                < max(req[d], 1)]
    assert excluded, "fixture must exercise the per-doc msm gate"


def test_terms_set_required_floor_and_unsatisfiable(spark, tiny_index):
    terms = _top_terms(tiny_index, 2)
    queries = [("t1", terms)]
    docs = [r["doc_id"] for r in
            tiny_index.docs.select("doc_id").collect()]
    # required=0 floors to 1 (plain OR); required=99 > |terms| matches
    # nothing
    zero = spark.createDataFrame([(d, 0) for d in docs],
                                 "doc_id long, required_matches long")
    one = spark.createDataFrame([(d, 1) for d in docs],
                                "doc_id long, required_matches long")
    huge = spark.createDataFrame([(d, 99) for d in docs],
                                 "doc_id long, required_matches long")
    a = terms_set_topk(tiny_index, queries, zero, 10).collect()
    b = terms_set_topk(tiny_index, queries, one, 10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert terms_set_topk(tiny_index, queries, huge, 10).count() == 0
