"""significant_terms / facet_histogram / synonym_topk
(engine/search.py) — hand-computed truths on mini indexes plus the
semantic contracts: JLH over-representation gate, occupied-bucket
histogram, and SynonymQuery's tf-sum + max-df blending (absent members
drop out; blending differs from a plain OR of the members)."""

import math

from engine.index_build import build_index
from engine.search import (Index, facet_histogram, score_exhaustive,
                           significant_terms, synonym_topk)


def _mini_index(spark, tmp_path, docs, name="aggs", **kw):
    rows = [(f"org/r{i}", f"f{i}.py", "c" * 12, "python", text)
            for i, text in enumerate(docs)]
    df = spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "content string")
    path = str(tmp_path / name)
    build_index(spark, df, path, n_buckets=2, n_doc_buckets=4, **kw)
    return Index(spark, path)


def _bm25(tf, df, dl, avgdl, n, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf / (tf + k1 * (1 - b + b * dl / avgdl))


def test_significant_terms_hand_computed(spark, tmp_path):
    docs = [
        "apple banana",         # d0
        "apple banana cherry",  # d1
        "cherry date",          # d2
        "date fig",             # d3
    ]
    idx = _mini_index(spark, tmp_path, docs, name="sig")
    out = significant_terms(idx, [("q", ["apple"])], n=5).collect()
    # foreground = {d0, d1} (fg_n=2, N=4):
    #   apple  fg_df=2 df=2: fg_pct=1.0 bg=0.5 -> jlh=(0.5)*(2.0)=1.0
    #   banana fg_df=2 df=2: same 1.0
    #   cherry fg_df=1 df=2: fg_pct=0.5 == bg_pct -> NOT over-represented
    assert [(r["term"], r["fg_df"], r["df"], r["score"], r["rank"])
            for r in out] == [("apple", 2, 2, 1.0, 1),
                              ("banana", 2, 2, 1.0, 2)]


def test_significant_terms_ranks_association_over_frequency(spark, tmp_path):
    # 'rare' co-occurs ONLY with 'anchor'; 'common' is everywhere.
    docs = ["anchor rare", "anchor rare", "common filler",
            "common filler", "common mud", "common mud"]
    idx = _mini_index(spark, tmp_path, docs, name="sig2")
    out = significant_terms(idx, [("q", ["anchor"])], n=5).collect()
    terms = [r["term"] for r in out]
    assert "rare" in terms and "common" not in terms
    # perfectly-associated terms (fg_pct=1, bg_pct=1/3) share the top
    # score; tie breaks term-asc
    assert terms == sorted(terms[:2]) + terms[2:]


def test_facet_histogram_hand_computed(spark, tmp_path):
    docs = [
        "apple banana",                      # d0 dl=2 -> bucket 2
        "apple banana cherry cherry cherry", # d1 dl=5 -> bucket 4
        "date fig",                          # d2 (no match)
    ]
    idx = _mini_index(spark, tmp_path, docs, name="hist")
    out = facet_histogram(idx, [("q", ["apple"])], interval=2).collect()
    assert [(r["qid"], r["bucket"], r["n_docs"]) for r in out] == [
        ("q", 2, 1), ("q", 4, 1)]
    # only occupied buckets: nothing for the unmatched doc, no bucket 0


def test_synonym_topk_hand_computed(spark, tmp_path):
    docs = [
        "apple apple banana",   # d0 dl=3, group tf 2+1=3
        "apple cherry",         # d1 dl=2, tf 1
        "banana cherry cherry", # d2 dl=3, tf 1
    ]
    idx = _mini_index(spark, tmp_path, docs, name="syn")
    out = synonym_topk(idx, [("s", [["apple", "banana"]])], k=10).collect()
    n, avgdl = 3, 8 / 3
    df_blend = 2  # max(df(apple)=2, df(banana)=2)
    want = {0: _bm25(3, df_blend, 3, avgdl, n),
            1: _bm25(1, df_blend, 2, avgdl, n),
            2: _bm25(1, df_blend, 3, avgdl, n)}
    got = {r["doc_id"]: r["score"] for r in out}
    assert got.keys() == want.keys()
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9
    # d0 (tf-sum 3) must out-rank the single-occurrence docs
    assert out[0]["doc_id"] == 0 and out[0]["rank"] == 1


def test_synonym_absent_member_drops_out(spark, tmp_path):
    docs = ["apple banana", "apple cherry", "banana cherry"]
    idx = _mini_index(spark, tmp_path, docs, name="syn2")
    with_ghost = synonym_topk(idx, [("s", [["apple", "zzzmissing"]])], 10)
    plain = synonym_topk(idx, [("s", [["apple"]])], 10)
    a = [(r["doc_id"], round(r["score"], 9), r["rank"])
         for r in with_ghost.collect()]
    b = [(r["doc_id"], round(r["score"], 9), r["rank"])
         for r in plain.collect()]
    assert a == b and len(a) == 2


def test_synonym_blending_differs_from_plain_or(spark, tmp_path):
    # a doc containing BOTH members scores bm25(tf1+tf2, max_df) under
    # SynonymQuery — not bm25(tf1) + bm25(tf2) as a plain OR would.
    docs = ["apple banana mud", "apple fig", "banana fig", "fig date"]
    idx = _mini_index(spark, tmp_path, docs, name="syn3")
    syn = {r["doc_id"]: r["score"] for r in synonym_topk(
        idx, [("s", [["apple", "banana"]])], 10).collect()}
    plain = {r["doc_id"]: r["score"] for r in score_exhaustive(
        idx, [("s", "apple", 1.0), ("s", "banana", 1.0)], 10).collect()}
    assert abs(syn[0] - plain[0]) > 1e-6  # doc with both members
    # single-member docs agree (same tf, same df -> same score)
    assert abs(syn[1] - plain[1]) < 1e-9
