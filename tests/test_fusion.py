"""rrf_fuse / collapse_topk (engine/fusion.py) and suggest_terms
(engine/search.py) — hand-computed truths plus the semantic
invariants each operator's contract promises."""

import pytest
from pyspark.sql import functions as F

from engine.fusion import collapse_topk, rrf_fuse


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "qid string, doc_id long, rank int")


def test_rrf_hand_computed(spark):
    # doc 1 is rank 1 + rank 2; doc 2 is rank 2 + rank 1 (tied sum);
    # doc 3 appears only in list A at rank 3.
    a = _ranking(spark, [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)])
    b = _ranking(spark, [("q", 2, 1), ("q", 1, 2)])
    out = {r["doc_id"]: r for r in rrf_fuse([a, b]).collect()}
    both = round(1 / 61 + 1 / 62, 6)
    assert out[1]["rrf"] == both and out[2]["rrf"] == both
    assert out[3]["rrf"] == round(1 / 63, 6)
    assert out[1]["n_lists"] == 2 and out[3]["n_lists"] == 1
    # tie on the rounded score breaks by doc_id asc (house rule)
    assert out[1]["rank"] == 1 and out[2]["rank"] == 2
    assert out[3]["rank"] == 3


def test_rrf_topk_and_input_order_invariance(spark):
    a = _ranking(spark, [("q", i, i) for i in range(1, 8)])
    b = _ranking(spark, [("q", i + 2, i) for i in range(1, 8)])
    fwd = [(r["doc_id"], r["rrf"]) for r in
           rrf_fuse([a, b], topk=3).orderBy("rank").collect()]
    rev = [(r["doc_id"], r["rrf"]) for r in
           rrf_fuse([b, a], topk=3).orderBy("rank").collect()]
    assert fwd == rev and len(fwd) == 3
    # the doc ranked high in BOTH lists must win overall
    assert fwd[0][0] == 3  # rank 3 in a, rank 1 in b: 1/63 + 1/61


def test_collapse_hand_computed(spark):
    scored = spark.createDataFrame(
        [("q", 1, 5.0), ("q", 2, 4.0), ("q", 3, 3.0), ("q", 4, 2.0)],
        "qid string, doc_id long, s double")
    groups = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")],
        "doc_id long, group string")
    out = collapse_topk(scored, groups, k=10).orderBy("rank").collect()
    # best of group a (doc 1) and best of group b (doc 3) survive
    assert [(r["doc_id"], r["group"], r["rank"]) for r in out] == [
        (1, "a", 1), (3, "b", 2)]


def test_collapse_per_group_and_null_group(spark):
    scored = spark.createDataFrame(
        [("q", i, float(10 - i)) for i in range(1, 6)],
        "qid string, doc_id long, s double")
    groups = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a")], "doc_id long, group string")
    out = collapse_topk(scored, groups, k=10, per_group=2).collect()
    ids = sorted(r["doc_id"] for r in out)
    # two best of group a (1, 2) + ungrouped docs 4, 5 as singletons
    assert ids == [1, 2, 4, 5]
    singles = {r["doc_id"]: r["group"] for r in out if r["doc_id"] > 3}
    assert singles == {4: "__doc__4", 5: "__doc__5"}


def test_collapse_gate_before_cut(spark):
    # group b's best doc sits at ungated rank 11: a top-10-then-collapse
    # plan would lose it — collapse_topk must keep it (gate before cut).
    rows = [("q", i, float(100 - i)) for i in range(1, 12)]
    scored = spark.createDataFrame(rows, "qid string, doc_id long, s double")
    groups = spark.createDataFrame(
        [(i, "a" if i <= 10 else "b") for i in range(1, 12)],
        "doc_id long, group string")
    out = collapse_topk(scored, groups, k=10).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 11]


def test_suggest_terms_ranking(spark, tiny_index):
    from engine.search import suggest_terms

    # pick a real vocabulary term and misspell it by one edit
    top = (tiny_index.termstats.orderBy(F.desc("df"), "term")
           .limit(1).collect()[0])
    qterm = top["term"][:-1] + ("x" if top["term"][-1] != "x" else "y")
    out = suggest_terms(tiny_index, [("s1", qterm)], max_edits=2,
                        n=5).orderBy("rank").collect()
    assert out, "expected at least the original term as a suggestion"
    # the original term is within 1 edit; nothing at distance 0 appears
    assert all(r["distance"] >= 1 for r in out)
    assert any(r["suggestion"] == top["term"] for r in out)
    # ranking: distance asc, then df desc, then term asc
    keys = [(r["distance"], -r["df"], r["suggestion"]) for r in out]
    assert keys == sorted(keys)
    # numpy reference: every dictionary term within 2 edits and a
    # length band is either in the top-5 or dominated by the 5 kept
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    vocab = {r["term"]: r["df"] for r in
             tiny_index.termstats.select("term", "df").collect()}
    cand = sorted(((lev(t, qterm), -df, t) for t, df in vocab.items()
                   if abs(len(t) - len(qterm)) <= 2
                   and 1 <= lev(t, qterm) <= 2))
    expect = [(t, d) for d, ndf, t in cand[:5]]
    assert [(r["suggestion"], r["distance"]) for r in out] == expect


def test_suggest_terms_no_candidates(spark, tiny_index):
    from engine.search import suggest_terms

    out = suggest_terms(tiny_index, [("s1", "zzzzqqqzzz")], n=5).collect()
    assert out == []
