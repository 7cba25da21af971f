"""ES API surfaces (round 4): term_vectors, explain_scores,
adjacency_matrix_agg (engine/search.py) and expand_synonyms
(engine/queryparse.py) — brute-force python replicas on the shared
tiny index, plus the contract edges (tombstone mask, empty buckets,
key rules, weight summation)."""

import math

import pytest
from pyspark.sql import functions as F

from engine.analysis import tokenize_texts
from engine.queryparse import expand_synonyms
from engine.search import (adjacency_matrix_agg, explain_scores,
                           score_exhaustive, term_vectors)


def _corpus_tokens(tiny_index):
    rows = tiny_index.docs.select("doc_id", "content").collect()
    texts = [r["content"] for r in rows]
    toks = tokenize_texts(texts)
    return {r["doc_id"]: t for r, t in zip(rows, toks)}


def test_term_vectors_matches_brute(spark, tiny_index):
    by_doc = _corpus_tokens(tiny_index)
    ids = sorted(by_doc)[:4]
    got = term_vectors(tiny_index, ids, with_df=True).collect()
    # brute: tf per (doc, term); df over the whole corpus; dl = len
    df = {}
    for toks in by_doc.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    exp = []
    for d in ids:
        toks = by_doc[d]
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        for t in sorted(tf):
            exp.append((d, t, tf[t], len(toks), df[t]))
    assert [(r["doc_id"], r["term"], r["tf"], r["dl"], r["df"])
            for r in got] == exp


def test_term_vectors_masks_tombstones(spark, tmp_path):
    from engine.corpus import generate_corpus_df
    from engine.deletes import delete_docs
    from engine.index_build import build_index
    from engine.search import Index

    path = str(tmp_path / "tvdel")
    corpus = generate_corpus_df(spark, 40, partitions=2, max_tokens=60)
    build_index(spark, corpus, path, n_buckets=2, n_doc_buckets=2)
    idx = Index(spark, path)
    ids = [r["doc_id"] for r in idx.docs.limit(2).collect()]
    delete_docs(spark, path, spark.createDataFrame(
        [(ids[0],)], "doc_id long"))
    idx = Index(spark, path)
    got = term_vectors(idx, ids)
    assert got.where(F.col("doc_id") == ids[0]).count() == 0
    assert got.where(F.col("doc_id") == ids[1]).count() > 0


def test_explain_matches_formula_and_score(spark, tiny_index):
    terms = [r["term"] for r in
             tiny_index.termstats.orderBy(F.desc("df")).limit(3).collect()]
    qt = [("q1", t, 1.0 if i < 2 else 2.0) for i, t in enumerate(terms)]
    hits = score_exhaustive(tiny_index, qt, 5)
    ex = explain_scores(tiny_index, qt, hits).collect()
    n, avgdl = float(tiny_index.n_docs), float(tiny_index.avgdl)
    k1 = float(tiny_index.stats["k1"])
    b = float(tiny_index.stats["b"])

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    for row in ex:
        idf = r6(math.log1p((n - row["df"] + 0.5) / (row["df"] + 0.5)))
        norm = r6(row["tf"] / (row["tf"] + k1 * (1 - b + b * row["dl"] / avgdl)))
        assert row["idf"] == pytest.approx(idf, abs=0)
        assert row["tf_norm"] == pytest.approx(norm, abs=0)
        assert row["contribution"] == pytest.approx(
            r6(idf * norm * row["weight"]), abs=0)
    # per-doc contributions reconstruct the score (to rounding slack)
    sc = {(r["qid"], r["doc_id"]): r["score"] for r in hits.collect()}
    by_doc = {}
    for row in ex:
        key = (row["qid"], row["doc_id"])
        by_doc[key] = by_doc.get(key, 0.0) + row["contribution"]
    for key, total in by_doc.items():
        assert total == pytest.approx(sc[key], abs=1e-4 * len(ex))
    # every hit on the page is explained
    assert set(by_doc) == set(sc)


def test_adjacency_matrix_matches_brute(spark, tiny_index):
    by_doc = _corpus_tokens(tiny_index)
    terms = [r["term"] for r in
             tiny_index.termstats.orderBy(F.desc("df")).limit(3).collect()]
    filters = [("fa", [terms[0]]), ("fb", [terms[1]]),
               ("fc", [terms[2], "zzz_absent_zzz"])]
    got = {(r["key"]): r["doc_count"]
           for r in adjacency_matrix_agg(tiny_index, filters).collect()}
    exp = {}
    for d, toks in by_doc.items():
        s = set(toks)
        matched = sorted(n for n, ts in filters if any(t in s for t in ts))
        for i, a in enumerate(matched):
            exp[a] = exp.get(a, 0) + 1
            for bname in matched[i + 1:]:
                exp[f"{a}&{bname}"] = exp.get(f"{a}&{bname}", 0) + 1
    assert got == exp
    # a filter matching nothing yields NO bucket (ES omits empties)
    got2 = adjacency_matrix_agg(
        tiny_index, filters + [("fz", ["zzz_absent_zzz"])]).collect()
    assert all("fz" not in r["key"] for r in got2)


def test_adjacency_matrix_key_rules(spark, tiny_index):
    with pytest.raises(AssertionError):
        adjacency_matrix_agg(tiny_index, [("a", ["x"]), ("a", ["y"])])
    with pytest.raises(AssertionError):
        adjacency_matrix_agg(tiny_index, [("a&b", ["x"])])


def test_expand_synonyms_weights():
    qs = [("q1", ["fast", "merge"]), ("q2", {"query": 2.0})]
    syn = {"fast": ["quick"], "merge": ["join"], "query": ["scan"]}
    out = expand_synonyms(qs, syn, 0.5)
    assert ("q1", "fast", 1.0) in out and ("q1", "quick", 0.5) in out
    assert ("q1", "join", 0.5) in out
    # dict weights propagate: synonym weight = base x syn_weight
    assert ("q2", "scan", 1.0) in out and ("q2", "query", 2.0) in out
    # a synonym that is ALSO a query term SUMS
    out2 = expand_synonyms([("q1", ["fast", "quick"])],
                           {"fast": ["quick"]}, 0.5)
    assert ("q1", "quick", 1.5) in out2
    # one-way: nothing maps back
    assert all(t != "fast" or w == 1.0 for _, t, w in out2)
