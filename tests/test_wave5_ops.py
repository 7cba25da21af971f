"""Wave-5 operators: match_phrase_prefix, did-you-mean phrase
suggestion, seeded random_score ranking."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from engine.analysis import _STOPSET, tokenize_texts
from engine.positions import (analyze_phrase, build_positions,
                              phrase_prefix_expansions,
                              phrase_prefix_match, phrase_prefix_topk)
from engine.pipeline.textstats import did_you_mean
from engine.search import random_score_topk


@pytest.fixture(scope="module")
def pos_index(spark, tiny_index):
    build_positions(spark, tiny_index.index_dir)
    return tiny_index


@pytest.fixture(scope="module")
def doc_contents(pos_index):
    rows = pos_index.docs.select("doc_id", "content").collect()
    return {int(r["doc_id"]): r["content"] for r in rows}


def _pos_map(content):
    toks = tokenize_texts([content], keep_stopwords=True)[0]
    out = {}
    for i, t in enumerate(toks):
        if t in _STOPSET:
            continue
        out.setdefault(t, set()).add(i)
    return out


def _brute_phrase_prefix(doc_contents, text, expansions):
    qt = analyze_phrase(text)
    assert qt
    exact, (seed, poff) = qt[:-1], qt[-1]
    exps = expansions.get(seed, [])
    hits = set()
    for doc_id, content in doc_contents.items():
        pm = _pos_map(content)
        anchors = {p for ps in pm.values() for p in ps}
        anchors = {a for a in range(0, 1 + max(anchors, default=0))}
        for a in anchors:
            if not all(a + off in pm.get(t, set()) for t, off in exact):
                continue
            if any(a + poff in pm.get(e, set()) for e in exps):
                hits.add(doc_id)
                break
    return hits


class TestPhrasePrefix:
    def test_expansions_term_order_and_cap(self, pos_index):
        exps = phrase_prefix_expansions(pos_index, ["s"],
                                        max_expansions=3)["s"]
        assert len(exps) <= 3
        assert exps == sorted(exps)
        all_s = phrase_prefix_expansions(pos_index, ["s"],
                                         max_expansions=10_000)["s"]
        assert exps == all_s[:len(exps)]  # FIRST in term order, not df

    def test_matches_bruteforce(self, pos_index, doc_contents):
        vocab = sorted({t for c in doc_contents.values()
                        for t in _pos_map(c)})
        queries = [("q1", "merge s"), ("q2", "hash v"),
                   ("q3", "quer")]
        got = phrase_prefix_match(pos_index, queries)
        got_sets = {}
        for r in got.collect():
            got_sets.setdefault(r["qid"], set()).add(int(r["doc_id"]))
        for qid, text in queries:
            seed = analyze_phrase(text)[-1][0]
            exps = {seed: [t for t in vocab
                           if t.startswith(seed)][:50]}
            want = _brute_phrase_prefix(doc_contents, text, exps)
            assert got_sets.get(qid, set()) == want, (qid, text)

    def test_no_expansion_matches_nothing(self, pos_index):
        got = phrase_prefix_match(pos_index, [("q", "merge zzzz")])
        assert got.count() == 0

    def test_topk_gate_and_bare_prefix(self, pos_index, doc_contents):
        queries = [("q1", "merge s"), ("q4", "quer")]
        top = phrase_prefix_topk(pos_index, queries, 5).collect()
        # bare prefix has no exact tokens to score — absent from topk
        assert all(r["qid"] == "q1" for r in top)
        hits = {int(r["doc_id"])
                for r in phrase_prefix_match(
                    pos_index, [("q1", "merge s")]).collect()}
        assert {int(r["doc_id"]) for r in top} <= hits
        ranks = [r["rank"] for r in top]
        assert ranks == sorted(ranks) and len(ranks) <= 5


class TestDidYouMean:
    DOCS = [
        (1, "merge sort is fast and merge sort wins"),
        (2, "hash join beats merge join on big tables"),
        (3, "window group agg runs after hash join"),
        (4, "sort merge sort merge sort"),
    ]

    def _run(self, spark, queries, **kw):
        df = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        return {r["qid"]: r
                for r in did_you_mean(df, queries, **kw).collect()}

    def test_corrects_misspellings(self, spark):
        got = self._run(spark, [("a", "mergo sorp"), ("b", "hash joim")])
        assert got["a"]["suggestion"] == "merge sort"
        assert got["a"]["n_corrected"] == 2
        assert got["b"]["suggestion"] == "hash join"
        assert got["b"]["n_corrected"] == 1

    def test_context_drives_choice(self, spark):
        # "joXn" alone could be join; after "merge" the bigram
        # "merge join"/"merge sort" evidence decides — both exist, but
        # "merge sort" (3×) outweighs "merge join" (1×), so a candidate
        # set containing both must pick sort
        got = self._run(spark, [("c", "merge sorn")])
        assert got["c"]["suggestion"] == "merge sort"

    def test_correct_query_echoes(self, spark):
        got = self._run(spark, [("d", "hash join")])
        assert got["d"]["suggestion"] == "hash join"
        assert got["d"]["n_corrected"] == 0

    def test_score_is_deterministic_logprob(self, spark):
        got = self._run(spark, [("e", "merge")])
        # unigram: ln((c1(merge)+1)/(T+V)); corpus above: merge ×6
        toks = [t for _, txt in self.DOCS for t in txt.split()]
        T, V = len(toks), len(set(toks))
        want = math.log((toks.count("merge") + 1.0) / (T + 1.0 * V))
        want = math.floor(want * 1e6 + 0.5) / 1e6
        want = math.floor(want * 1e4 + 0.5) / 1e4
        assert got["e"]["score"] == pytest.approx(want, abs=1e-9)


class TestRandomScore:
    def test_deterministic_and_bounded(self, tiny_index):
        q = [("q1", ["merge", "sort"]), ("q2", ["hash"])]
        a = random_score_topk(tiny_index, q, 5, seed=7).collect()
        b = random_score_topk(tiny_index, q, 5, seed=7).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        assert all(0.0 <= r["score"] < 1.0 for r in a)
        per_q = {}
        for r in a:
            per_q.setdefault(r["qid"], []).append(r["rank"])
        for ranks in per_q.values():
            assert ranks == list(range(1, len(ranks) + 1))

    def test_matches_md5_replica_and_cross_query_stable(self, tiny_index):
        q = [("q1", ["merge"]), ("q2", ["merge"])]
        rows = random_score_topk(tiny_index, q, 1000, seed=42).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["qid"], {})[int(r["doc_id"])] = r["score"]
        assert by_q["q1"] == by_q["q2"]  # ES: same seed+doc → same score
        for d, s in by_q["q1"].items():
            h = int(hashlib.md5(f"42:{d}".encode()).hexdigest()[:8], 16)
            want = math.floor(h / float(1 << 32) * 1e6 + 0.5) / 1e6
            assert s == pytest.approx(want, abs=1e-12)

    def test_seed_changes_permutation(self, tiny_index):
        q = [("q1", ["merge", "sort", "fast"])]
        a = [r["doc_id"] for r in
             random_score_topk(tiny_index, q, 10, seed=1).collect()]
        b = [r["doc_id"] for r in
             random_score_topk(tiny_index, q, 10, seed=2).collect()]
        assert a != b


class TestDidYouMeanTrigramPrune:
    """Round-4: positions with len ≥ 3·(e+1) go through the pigeonhole
    trigram prune instead of the vocab×positions nested-loop DP —
    results must be identical, including mixed eligible/short queries."""

    DOCS = [
        (1, "distributed aggregation pipelines shuffle partitions"),
        (2, "distributed aggregation beats centralized aggregation"),
        (3, "partition pruning accelerates distributed scans ok go"),
        (4, "shuffle partitions dominate distributed aggregation cost"),
    ]

    def test_long_token_corrections_via_prune(self, spark):
        df = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        got = {r["qid"]: r for r in did_you_mean(
            df, [("a", "distribted aggregaton"),     # both ≥9 chars
                 ("b", "shuffle partitons ok"),      # mixed lengths
                 ("c", "centralizd scams")]).collect()}
        assert got["a"]["suggestion"] == "distributed aggregation"
        assert got["a"]["n_corrected"] == 2
        assert got["b"]["suggestion"] == "shuffle partitions ok"
        assert got["b"]["n_corrected"] == 1
        assert got["c"]["suggestion"].startswith("centralized")

    def test_prune_engages_only_when_sound(self, spark):
        from engine.trigram import fuzzy_piece_grams
        assert fuzzy_piece_grams("partitons", 2) is not None   # 9 ≥ 9
        assert fuzzy_piece_grams("scams", 2) is None           # 5 < 9
