"""Query-engine semantics: BM25 vs hand-computed values, tie-breaks,
AND intersection, WAND rank-identity, parallelism invariance
(SURVEY.md §5.2 items 1-2)."""

import math

import pytest
from pyspark.sql import functions as F

from engine.corpus import generate_corpus_df
from engine.index_build import build_index, check_sha
from engine.search import Index, boolean_and, score_exhaustive, score_wand
from engine.topics import synthetic_topics, topics_to_query_terms


def _mini_index(spark, tmp_path, docs, name="mini", **kw):
    """Index over explicit (repo, path, content) rows."""
    rows = [(f"org/r{i}", f"f{i}.py", "c" * 12, "python", text)
            for i, text in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string")
    path = str(tmp_path / name)
    build_index(spark, df, path, n_buckets=2, n_doc_buckets=4, **kw)
    return Index(spark, path)


def bm25(tf, df, dl, avgdl, n, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_hand_computed(spark, tmp_path):
    docs = [
        "apple banana apple",          # dl=3, tf(apple)=2
        "apple cherry",                # dl=2
        "banana banana banana cherry", # dl=4
    ]
    idx = _mini_index(spark, tmp_path, docs)
    assert idx.n_docs == 3
    avgdl = 3.0
    assert idx.avgdl == pytest.approx(avgdl)
    res = score_exhaustive(idx, [("q", "apple", 1.0)], 10).collect()
    # doc ids are hash-bucket ordered; map docno -> expected
    id2doc = {r["doc_id"]: r["docno"] for r in
              idx.docs.select("doc_id", "docno").collect()}
    exp = {"org/r0/f0.py": bm25(2, 2, 3, avgdl, 3),
           "org/r1/f1.py": bm25(1, 2, 2, avgdl, 3)}
    got = {id2doc[r["doc_id"]]: r["score"] for r in res}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-12)


def test_weighted_multi_term_and_tiebreak(spark, tmp_path):
    docs = ["x y", "x y", "y z"]  # docs 0,1 identical → score tie
    idx = _mini_index(spark, tmp_path, docs, name="tie")
    res = score_exhaustive(idx, [("q", "x", 2.0), ("q", "y", 1.0)], 10).collect()
    # identical docs must tie and be broken by ascending doc_id
    top2 = [r for r in res if r["rank"] <= 2]
    assert top2[0]["score"] == pytest.approx(top2[1]["score"])
    assert top2[0]["doc_id"] < top2[1]["doc_id"]
    # weighted sum: score = 2*bm25(x) + 1*bm25(y)
    avgdl, n = idx.avgdl, 3
    want = 2 * bm25(1, 2, 2, avgdl, n) + 1 * bm25(1, 3, 2, avgdl, n)
    assert top2[0]["score"] == pytest.approx(want, abs=1e-12)


def test_boolean_and(spark, tmp_path):
    # NB: terms must be non-stopwords — stopwords are never indexed
    docs = ["xx yy zz", "xx zz", "yy zz", "xx yy"]
    idx = _mini_index(spark, tmp_path, docs, name="and")
    id2doc = {r["doc_id"]: r["path"] for r in
              idx.docs.select("doc_id", "path").collect()}
    hits = boolean_and(idx, [("q1", ["xx", "yy"]), ("q2", ["zz"]),
                             ("q3", ["xx", "yy", "zz"]), ("q4", ["q", "xx"])])
    got = {}
    for r in hits.collect():
        got.setdefault(r["qid"], set()).add(id2doc[r["doc_id"]])
    assert got.get("q1") == {"f0.py", "f3.py"}
    assert got.get("q2") == {"f0.py", "f1.py", "f2.py"}
    assert got.get("q3") == {"f0.py"}
    assert "q4" not in got


def test_wand_rank_identity(tiny_index):
    topics = synthetic_topics(8)
    qt = topics_to_query_terms(topics)
    ex = score_exhaustive(tiny_index, qt, 15).collect()
    wd = score_wand(tiny_index, qt, 15).collect()
    key = lambda r: (r["qid"], r["rank"])
    exs = sorted(((r["qid"], r["rank"], r["doc_id"]) for r in ex))
    wds = sorted(((r["qid"], r["rank"], r["doc_id"]) for r in wd))
    assert exs == wds
    escore = {(r["qid"], r["doc_id"]): r["score"] for r in ex}
    for r in wd:
        assert r["score"] == pytest.approx(
            escore[(r["qid"], r["doc_id"])], abs=1e-9)


def test_sha_invariant(tiny_index):
    assert check_sha(tiny_index.docs) == 0


def test_index_global_invariants(tiny_index):
    # df(term) == total posting entries for that term (I8); Σtf == tokens
    post = tiny_index.postings.groupBy("term").agg(
        F.sum("df_part").alias("n_post"))
    joined = post.join(tiny_index.termstats, "term")
    bad = joined.where(F.col("n_post") != F.col("df")).count()
    assert bad == 0
    stats = tiny_index.stats
    tf = tiny_index.spark.read.parquet(f"{tiny_index.index_dir}/tf")
    total_tf = tf.agg(F.sum("tf")).collect()[0][0]
    assert total_tf == stats["total_tokens"]
    # per-doc dl carried in tf equals that doc's Σtf
    bad = (tf.groupBy("doc_id", "dl").agg(F.sum("tf").alias("s"))
           .where(F.col("s") != F.col("dl")).count())
    assert bad == 0


def test_parallelism_invariance(spark, tmp_path):
    """Same corpus indexed at different partitioning → identical doc ids
    and identical query results (SURVEY.md §5.2 item 2)."""
    c1 = generate_corpus_df(spark, 60, partitions=2, max_tokens=100)
    c2 = generate_corpus_df(spark, 60, partitions=7, max_tokens=100)
    p1, p2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    build_index(spark, c1, p1, n_buckets=2, n_doc_buckets=4)
    build_index(spark, c2, p2, n_buckets=5, n_doc_buckets=4)
    i1, i2 = Index(spark, p1), Index(spark, p2)
    d1 = sorted((r["doc_id"], r["docno"]) for r in
                i1.docs.select("doc_id", "docno").collect())
    d2 = sorted((r["doc_id"], r["docno"]) for r in
                i2.docs.select("doc_id", "docno").collect())
    assert d1 == d2
    qt = topics_to_query_terms(synthetic_topics(4))
    r1 = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 10))
          for r in score_exhaustive(i1, qt, 10).collect()]
    r2 = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 10))
          for r in score_exhaustive(i2, qt, 10).collect()]
    assert r1 == r2


def test_boolean_and_lead_gating_identical(tiny_index):
    """Lead-term gating (broadcast rarest-list semi-join) must be a
    pure plan optimization: identical results with gating disabled."""
    qs = [("q1", ["alpha", "merge"]), ("q2", ["sort"]),
          ("q3", ["merge", "sort", "hash"])]
    # use real vocab terms from the tiny corpus
    terms = [r["term"] for r in
             tiny_index.termstats.orderBy("df").limit(50).collect()]
    qs = [("q1", terms[:2]), ("q2", [terms[-1]]), ("q3", terms[10:13])]
    gated = sorted((r["qid"], r["doc_id"]) for r in
                   boolean_and(tiny_index, qs,
                               lead_min_saved=0).collect())
    plain = sorted((r["qid"], r["doc_id"]) for r in
                   boolean_and(tiny_index, qs, lead_max_df=0).collect())
    assert gated == plain


def test_filtered_topk_exact_within_filter(tiny_index):
    """doc_filter (Lucene FILTER-clause equivalent) ranks top-k WITHIN
    the filtered doc set — verified against filtering the full score
    table and re-ranking."""
    qt = topics_to_query_terms(synthetic_topics(5))
    allowed = tiny_index.docs.where(F.col("lang") == "python")
    allowed_ids = {r["doc_id"] for r in allowed.select("doc_id").collect()}
    assert 0 < len(allowed_ids) < tiny_index.n_docs
    full = score_exhaustive(tiny_index, qt, 10 ** 6).collect()
    expect: dict[str, list] = {}
    for r in full:
        if r["doc_id"] in allowed_ids:
            expect.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    k = 7
    for q in expect:
        expect[q].sort(key=lambda x: (-x[1], x[0]))
        expect[q] = [(d, round(s, 9)) for d, s in expect[q][:k]]
    got: dict[str, list] = {}
    for r in score_exhaustive(tiny_index, qt, k, doc_filter=allowed).collect():
        got.setdefault(r["qid"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 9)))
    for q in got:
        got[q].sort()
    assert {q: [(d, s) for _, d, s in got[q]] for q in got} == expect


def test_term_expansion_rewrites(tiny_index):
    """Prefix/fuzzy rewrites enumerate exactly the matching vocabulary
    terms (checked against a Python scan of the collected dictionary)."""
    from engine.search import expand_fuzzy_terms, expand_prefix_terms

    vocab = [r["term"] for r in tiny_index.termstats.select("term").collect()]
    pre = expand_prefix_terms(tiny_index, [("p", "mer")])
    assert {t for _, t, _ in pre} == {t for t in vocab if t.startswith("mer")}
    assert pre and all(w == 1.0 for _, _, w in pre)

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    fz = expand_fuzzy_terms(tiny_index, [("f", "mergo")], max_edits=1)
    assert {t for _, t, _ in fz} == {t for t in vocab if lev(t, "mergo") <= 1}
    assert fz  # "merge" is in the corpus vocabulary


def lmd(tf, ctf, dl, total_tokens, mu=2000.0):
    p = (ctf + 1.0) / (total_tokens + 1.0)
    return max(0.0, math.log(1 + tf / (mu * p)) + math.log(mu / (dl + mu)))


def test_boolean_topk_semantics(spark, tmp_path):
    """Generic BooleanQuery (must/should/must_not): membership follows
    Lucene BooleanWeight; the score is the sum of BM25 over must+should
    occurrences, hand-checked on one doc."""
    from engine.search import boolean_topk

    docs = ["apple banana cherry", "apple banana", "apple date",
            "banana date"]
    idx = _mini_index(spark, tmp_path, docs, name="boolq")
    id2doc = {r["doc_id"]: r["path"] for r in
              idx.docs.select("doc_id", "path").collect()}
    res = boolean_topk(idx, [
        ("q1", ["apple"], ["date"], ["cherry"]),   # {0,1,2} − {0} = {1,2}
        ("q2", [], ["date", "cherry"], []),        # pure-should: {0,2,3}
        ("q3", [], [], ["apple"]),                 # pure negation: empty
        ("q4", ["apple", "banana"], [], []),       # pure must: {0,1}
    ], 10)
    got = {}
    rows = res.collect()
    for r in rows:
        got.setdefault(r["qid"], set()).add(id2doc[r["doc_id"]])
    assert got["q1"] == {"f1.py", "f2.py"}
    assert got["q2"] == {"f0.py", "f2.py", "f3.py"}
    assert "q3" not in got
    assert got["q4"] == {"f0.py", "f1.py"}
    # hand-check q1's top doc f2.py ("apple date"): apple + date both score
    n, avgdl = 4, idx.avgdl
    want = bm25(1, 3, 2, avgdl, n) + bm25(1, 2, 2, avgdl, n)
    sc = {id2doc[r["doc_id"]]: r["score"] for r in rows if r["qid"] == "q1"}
    assert sc["f2.py"] == pytest.approx(want, abs=1e-12)
    # must_not term absent from the index is a no-op, not an error
    res2 = boolean_topk(idx, [("q5", ["apple"], [], ["zzzmissing"])], 10)
    assert len(res2.collect()) == 3


def test_count_stats_and_field_sort(spark, tmp_path):
    """IndexSearcher.count / CollectionStatistics / Sort(SortField)
    analogs, hand-checked on a 3-doc corpus."""
    from engine.search import (collection_stats, count_matches,
                               field_sorted_topk)

    docs = ["xx yy", "xx", "zz"]
    idx = _mini_index(spark, tmp_path, docs, name="cnt")
    c = {r["qid"]: r["n_hits"] for r in count_matches(
        idx, [("q1", ["xx"]), ("q2", ["xx", "zz"]),
              ("q3", ["missing"])]).collect()}
    assert c == {"q1": 2, "q2": 3, "q3": 0}

    st = collection_stats(idx).collect()[0]
    assert st["n_docs"] == 3 and st["vocab_size"] == 3
    assert st["total_tokens"] == 4 and st["total_postings"] == 4
    assert st["avgdl"] == pytest.approx(4 / 3, abs=1e-6)

    field = idx.docs.select("doc_id",
                            F.length("content").alias("sort_key"))
    out = field_sorted_topk(idx, [("q1", ["xx"])], field, 10).collect()
    keys = [r["sort_key"] for r in out]
    assert keys == sorted(keys, reverse=True) and len(out) == 2


def test_search_after_pagination(tiny_index):
    """searchAfter: page1 + page2 (cursor = page1's last row) must
    equal the first 2k rows of the single-shot rounded ranking, with
    no overlap and rank restarting per page."""
    from engine.search import search_after

    qt = [("q", "merge", 1.0), ("q", "sort", 1.0)]
    k = 7
    page1 = search_after(tiny_index, qt, k, after={}).collect()
    assert [r["rank"] for r in page1] == list(range(1, k + 1))
    last = page1[-1]
    page2 = search_after(tiny_index, qt, k,
                         after={"q": (last["score"], last["doc_id"])}) \
        .collect()
    both = [(r["doc_id"], r["score"]) for r in page1 + page2]
    single = [(r["doc_id"], r["score"]) for r in
              search_after(tiny_index, qt, 2 * k, after={}).collect()]
    assert both == single
    assert len({d for d, _ in both}) == len(both)  # no overlap


def test_regexp_and_range_rewrites(tiny_index):
    """Regexp and term-range dictionary rewrites enumerate exactly the
    matching vocabulary (checked against a Python scan)."""
    import re

    from engine.search import expand_range_terms, expand_regexp_terms

    vocab = [r["term"] for r in tiny_index.termstats.select("term").collect()]
    rx = expand_regexp_terms(tiny_index, [("r", "mer.*"), ("r2", "[a-z]+[0-9]")])
    got = {}
    for q, t, w in rx:
        assert w == 1.0
        got.setdefault(q, set()).add(t)
    assert got.get("r", set()) == {t for t in vocab if re.fullmatch("mer.*", t)}
    assert got.get("r2", set()) == \
        {t for t in vocab if re.fullmatch("[a-z]+[0-9]", t)}
    rg = expand_range_terms(tiny_index, [("g", "m", "n")])
    assert {t for _, t, _ in rg} == {t for t in vocab if "m" <= t < "n"}
    assert rg


def test_lmdirichlet_hand_computed(spark, tmp_path):
    """score_lmd matches the pinned Lucene LMDirichletSimilarity formula
    (GROUP_12.pdf §5.2.2) computed by hand: ctf from the corpus, exact
    doc lengths, per-clause clamp at 0 before the SHOULD sum."""
    from engine.search import score_lmd

    docs = [
        "apple banana apple",           # dl=3, tf(apple)=2
        "apple cherry",                 # dl=2
        "banana banana banana cherry",  # dl=4
    ]
    idx = _mini_index(spark, tmp_path, docs, name="lmd")
    total = 9.0  # Σ dl
    ctf = {"apple": 3, "banana": 4, "cherry": 2}
    res = score_lmd(idx, [("q", "apple", 1.0), ("q", "banana", 2.0)], 10)
    id2doc = {r["doc_id"]: r["docno"] for r in
              idx.docs.select("doc_id", "docno").collect()}
    got = {id2doc[r["doc_id"]]: r["score"] for r in res.collect()}
    exp = {
        "org/r0/f0.py": lmd(2, ctf["apple"], 3, total)
                        + 2.0 * lmd(1, ctf["banana"], 3, total),
        "org/r1/f1.py": lmd(1, ctf["apple"], 2, total),
        "org/r2/f2.py": 2.0 * lmd(3, ctf["banana"], 4, total),
    }
    assert set(got) == set(exp)
    for key in exp:
        assert got[key] == pytest.approx(exp[key], abs=1e-12)


def test_lmdirichlet_clamps_per_clause(spark, tmp_path):
    """A clause whose raw LMD score is negative contributes exactly 0
    (Lucene clamps per TermScorer, BEFORE the boolean sum): a long doc
    where every matching term scores negative raw must surface with
    score exactly 0.0, not a negative sum."""
    from engine.search import score_lmd

    pads = " ".join("pad%d" % i for i in range(140))
    docs = [" ".join(["zzz"] * 60) + " rare " + pads,  # dl=201
            " ".join(["zzz"] * 10)]                    # dl=10
    idx = _mini_index(spark, tmp_path, docs, name="lmdclamp")
    total = float(idx.stats["total_tokens"])
    assert total == 211.0
    res = score_lmd(idx, [("q", "rare", 1.0), ("q", "zzz", 1.0)], 10)
    id2doc = {r["doc_id"]: r["docno"] for r in
              idx.docs.select("doc_id", "docno").collect()}
    got = {id2doc[r["doc_id"]]: r["score"] for r in res.collect()}
    # hand check: BOTH clauses raw-negative in the long doc (ctf_zzz=70,
    # ctf_rare=1; dl=201 drags log(mu/(dl+mu)) below the tf lift)
    for term, tf, ctf in [("zzz", 60, 70), ("rare", 1, 1)]:
        p = (ctf + 1.0) / (total + 1.0)
        raw = math.log(1 + tf / (2000.0 * p)) + math.log(2000.0 / 2201.0)
        assert raw < 0.0
    assert got["org/r0/f0.py"] == 0.0
    assert got["org/r1/f1.py"] == pytest.approx(
        lmd(10, 70, 10, total), abs=1e-12)


def test_wildcard_rewrite_matches_fnmatch(tiny_index):
    """The LIKE dictionary rewrite enumerates exactly the vocabulary
    terms a glob match would (Lucene WildcardQuery semantics)."""
    import fnmatch

    from engine.search import expand_wildcard_terms

    vocab = [r["term"] for r in
             tiny_index.termstats.select("term").collect()]
    for pat in ["mer*", "?ash", "s*m", "*ing"]:
        got = {t for _, t, _ in
               expand_wildcard_terms(tiny_index, [("w", pat)])}
        exp = {t for t in vocab if fnmatch.fnmatchcase(t, pat)}
        assert got == exp, pat
    assert {t for _, t, _ in
            expand_wildcard_terms(tiny_index, [("w", "mer*")])}


def test_more_like_this_finds_near_duplicate(spark, tmp_path):
    """A seed doc's MLT hits rank its near-duplicate first and never
    include the seed itself."""
    from engine.search import more_like_this

    docs = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon eta",   # near-dup of 0
        "totally unrelated words here none",
    ]
    idx = _mini_index(spark, tmp_path, docs, name="mlt")
    id2doc = {r["docno"]: r["doc_id"] for r in
              idx.docs.select("doc_id", "docno").collect()}
    seed = id2doc["org/r0/f0.py"]
    res = more_like_this(idx, [seed], k=5, n_terms=10).collect()
    assert all(r["doc_id"] != seed for r in res)
    assert res[0]["doc_id"] == id2doc["org/r1/f1.py"]


def test_facet_counts_hand_computed(spark, tmp_path):
    from engine.index_build import build_index
    from engine.search import facet_counts

    rows = [
        ("o/r", "a.py", "c" * 12, "python", "apple banana"),
        ("o/r", "b.py", "c" * 12, "python", "apple cherry"),
        ("o/r", "c.java", "c" * 12, "java", "apple plum"),
        ("o/r", "d.java", "c" * 12, "java", "pear plum"),
    ]
    df = spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string")
    path = str(tmp_path / "facets")
    build_index(spark, df, path, n_buckets=2, n_doc_buckets=2)
    from engine.search import Index
    idx = Index(spark, path)
    out = facet_counts(idx, [("q", ["apple"]), ("p", ["plum"])],
                       "lang", 3).collect()
    got = {(r["qid"], r["value"]): (r["n_docs"], r["rank"]) for r in out}
    assert got[("q", "python")] == (2, 1)
    assert got[("q", "java")] == (1, 2)
    assert got[("p", "java")] == (2, 1)
    assert ("p", "python") not in got


def test_score_explain_sums_to_score(tiny_index):
    """Σ pscore over a (qid, doc_id) explain group equals the
    exhaustive score exactly (same column math, float64)."""
    from engine.search import score_explain

    qt = [("q", "merge", 2.0), ("q", "sort", 1.0)]
    top = score_exhaustive(tiny_index, qt, 5).collect()
    docs = [r["doc_id"] for r in top]
    exp = score_explain(tiny_index, qt, docs).collect()
    sums = {}
    for r in exp:
        sums[r["doc_id"]] = sums.get(r["doc_id"], 0.0) + r["pscore"]
    for r in top:
        assert sums[r["doc_id"]] == pytest.approx(r["score"], abs=1e-12)
    # every row exposes consistent formula inputs
    for r in exp:
        idf = math.log(1 + (tiny_index.n_docs - r["df"] + 0.5)
                       / (r["df"] + 0.5))
        assert r["idf"] == pytest.approx(idf, abs=1e-12)


def test_term_vectors_and_min_should(spark, tmp_path):
    """TermVectors export from the forward table, and BooleanQuery
    minimumNumberShouldMatch semantics (incl. the unsatisfiable case)."""
    from engine.search import boolean_topk, term_vectors

    docs = ["aa bb cc", "aa dd", "bb dd ee"]
    idx = _mini_index(spark, tmp_path, docs, name="tv")
    id_of = {r["path"]: r["doc_id"] for r in
             idx.docs.select("doc_id", "path").collect()}
    tv = term_vectors(idx, [id_of["f0.py"]]).collect()
    assert [(r["term"], r["tf"], r["dl"]) for r in tv] == \
        [("aa", 1, 3), ("bb", 1, 3), ("cc", 1, 3)]

    # msm=2 over should=[bb, dd, ee]: only "bb dd ee" matches 2+
    res = boolean_topk(idx, [("q", [], ["bb", "dd", "ee"], [])], 10,
                       min_should=2).collect()
    assert {r["doc_id"] for r in res} == {id_of["f2.py"]}
    # msm greater than the number of should clauses matches nothing
    assert boolean_topk(idx, [("q2", ["aa"], ["bb"], [])], 10,
                        min_should=2).count() == 0
    # msm=0 leaves the plain semantics intact
    assert boolean_topk(idx, [("q3", [], ["bb"], [])], 10).count() == 2


def test_verify_index_healthy_and_corrupt(spark, tmp_path):
    """CheckIndex analog: all-zero on a fresh build; a corrupted
    dictionary df is detected."""
    import glob
    import shutil

    import pyarrow.parquet as pq

    from engine.checkindex import verify_index

    docs = ["xx yy", "xx zz", "yy zz xx"]
    idx = _mini_index(spark, tmp_path, docs, name="chk")
    rep = verify_index(spark, idx.index_dir)
    assert rep["ok"], rep

    # corrupt: bump one term's df in termstats
    ts_dir = f"{idx.index_dir}/termstats"
    import pandas as pd
    frames = [pq.read_table(f).to_pandas()
              for f in glob.glob(f"{ts_dir}/*.parquet")]
    pdf = pd.concat(frames, ignore_index=True)
    pdf.loc[pdf.index[0], "df"] += 1
    shutil.rmtree(ts_dir)
    import os
    os.makedirs(ts_dir)
    import pyarrow as pa
    pq.write_table(pa.Table.from_pandas(pdf), f"{ts_dir}/part-0.parquet")
    open(f"{ts_dir}/_SUCCESS", "w").close()

    rep2 = verify_index(spark, idx.index_dir)
    assert not rep2["ok"]
    assert rep2["df_mismatch_terms"] == 1
    assert rep2["bad_posting_len"] == 0  # postings themselves untouched


def test_federated_matches_monolithic(spark, tmp_path):
    """MultiReader analog: two shard indexes searched under global
    stats + docBase offsets produce rank- and score-identical results
    to one monolithic index over the union corpus."""
    from engine.federate import federated_topk

    corpus = generate_corpus_df(spark, 40, partitions=2, max_tokens=80)
    full_p = str(tmp_path / "full")
    build_index(spark, corpus, full_p, n_buckets=2, n_doc_buckets=1)
    full = Index(spark, full_p)
    # split by the SAME canonical order the monolithic build uses, so
    # shard-local ids + docBase == monolithic ids
    docnos = sorted(r["docno"] for r in
                    full.docs.select("docno").collect())
    cut = docnos[len(docnos) // 2]
    c1 = corpus.where(F.concat_ws("/", "repo", "path") < cut)
    c2 = corpus.where(F.concat_ws("/", "repo", "path") >= cut)
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    build_index(spark, c1, p1, n_buckets=2, n_doc_buckets=1)
    build_index(spark, c2, p2, n_buckets=3, n_doc_buckets=1)
    shards = [Index(spark, p1), Index(spark, p2)]

    qt = topics_to_query_terms(synthetic_topics(5))
    mono = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 10))
            for r in score_exhaustive(full, qt, 12).collect()]
    fed = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 10))
           for r in federated_topk(shards, qt, 12).collect()]
    assert mono == fed and mono
    # shard column maps ids to the right reader
    for r in federated_topk(shards, qt, 12).collect():
        assert (r["shard"] == 0) == (r["doc_id"] < shards[0].n_docs)


def test_fielded_topk_hand_computed(spark, tmp_path):
    """Per-field boosted BM25 (reference Searcher.java:37-43 shape):
    each clause scores against ITS field's stats; doc ids align across
    field indexes for free (deterministic (repo, path) assignment)."""
    from engine.fields import fielded_topk

    titles = ["apple pie", "banana split", "apple tart"]
    bodies = ["apple apple banana filling baked", "banana cream only",
              "cherry base with apple pieces inside"]

    def corpus(texts):
        return spark.createDataFrame(
            [(f"org/r{i}", f"f{i}.py", "c" * 12, "python", t)
             for i, t in enumerate(texts)],
            "repo string, path string, commit string, lang string, "
            "content string")

    pt, pb = str(tmp_path / "ft"), str(tmp_path / "fb")
    build_index(spark, corpus(titles), pt, n_buckets=2, n_doc_buckets=4)
    build_index(spark, corpus(bodies), pb, n_buckets=3, n_doc_buckets=4)
    it, ib = Index(spark, pt), Index(spark, pb)
    # doc ids aligned across the field indexes
    assert sorted((r["doc_id"], r["docno"]) for r in it.docs
                  .select("doc_id", "docno").collect()) == \
        sorted((r["doc_id"], r["docno"]) for r in ib.docs
               .select("doc_id", "docno").collect())
    id2 = {r["docno"]: r["doc_id"] for r in
           it.docs.select("doc_id", "docno").collect()}

    out = fielded_topk({"title": it, "body": ib},
                       [("q", "title", "apple", 3.0),
                        ("q", "body", "apple", 1.0)], 10).collect()
    got = {r["doc_id"]: r["score"] for r in out}
    # per-field hand computation
    n = 3
    t_avg, b_avg = it.avgdl, ib.avgdl
    want = {
        id2["org/r0/f0.py"]: 3 * bm25(1, 2, 2, t_avg, n)
        + 1 * bm25(2, 2, 5, b_avg, n),
        # body r2: "with" is a stopword → dl 5, not 6
        id2["org/r2/f2.py"]: 3 * bm25(1, 2, 2, t_avg, n)
        + 1 * bm25(1, 2, 5, b_avg, n),
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-12)
    # title boost dominates: both title-matching docs outrank none here,
    # and the heavier-body doc wins the tie-break on body tf
    ranks = {r["doc_id"]: r["rank"] for r in out}
    assert ranks[id2["org/r0/f0.py"]] == 1


def test_search_after_exhausted_cursor_is_empty(tiny_index):
    """ADVICE r2: a query with fewer than k total hits gets a cursor at
    its true last row; paging past it returns NOTHING (Lucene
    searchAfter semantics), never page 1 again."""
    from engine.search import search_after

    # pick a low-df term so the total hit count is small
    dfm = {r["term"]: r["df"] for r in
           tiny_index.termstats.select("term", "df").collect()}
    term = min(dfm, key=lambda t: (dfm[t], t))
    n_hits = dfm[term]
    qt = [("q", term, 1.0)]
    k = n_hits + 5                       # page size exceeds total hits
    page1 = search_after(tiny_index, qt, k, after={}).collect()
    assert len(page1) == n_hits
    last = page1[-1]
    page2 = search_after(tiny_index, qt, k,
                         after={"q": (last["score"], last["doc_id"])}) \
        .collect()
    assert page2 == []


def test_federated_rejects_heterogeneous_shards(spark, tmp_path):
    """ADVICE r2: shards disagreeing on k1/b or analyzer settings must
    raise — heterogeneous shards silently break the monolithic-score
    equivalence."""
    import pytest as _pytest

    from engine.federate import federated_topk

    corpus = generate_corpus_df(spark, 12, partitions=1, max_tokens=60)
    p1, p2, p3 = (str(tmp_path / n) for n in ("h1", "h2", "h3"))
    build_index(spark, corpus, p1, n_buckets=2, n_doc_buckets=1)
    build_index(spark, corpus, p2, n_buckets=2, n_doc_buckets=1, k1=0.9)
    build_index(spark, corpus, p3, n_buckets=2, n_doc_buckets=1,
                stem=True)
    qt = [("q", "merge", 1.0)]
    with _pytest.raises(ValueError, match="disagrees"):
        federated_topk([Index(spark, p1), Index(spark, p2)], qt, 5)
    with _pytest.raises(ValueError, match="disagrees"):
        federated_topk([Index(spark, p1), Index(spark, p3)], qt, 5)
    # homogeneous shards (even with different bucket counts) still work
    assert federated_topk([Index(spark, p1), Index(spark, p1)],
                          qt, 5).count() >= 0


def test_ib_hand_computed(spark, tmp_path):
    """score_ib matches the pinned Lucene IBSimilarity configuration
    (DistributionLL · LambdaDF · NormalizationH2, c=1) computed by
    hand: tfn = tf·log2(1 + avgdl/dl), λ = (df+1)/(N+1), score =
    log2(1 + tfn/λ); SHOULD-clause scores sum with boosts."""
    import math as _m

    from engine.search import score_ib

    def ib(tf, df, dl, avgdl, n, c=1.0):
        tfn = tf * _m.log2(1 + c * avgdl / dl)
        lam = (df + 1.0) / (n + 1.0)
        return _m.log2(1 + tfn / lam)

    docs = [
        "apple banana apple",           # dl=3, tf(apple)=2
        "apple cherry",                 # dl=2
        "banana banana banana cherry",  # dl=4
    ]
    idx = _mini_index(spark, tmp_path, docs, name="ib")
    avgdl, n = 3.0, 3
    res = score_ib(idx, [("q", "apple", 1.0), ("q", "banana", 2.0)], 10)
    id2doc = {r["doc_id"]: r["docno"] for r in
              idx.docs.select("doc_id", "docno").collect()}
    got = {id2doc[r["doc_id"]]: r["score"] for r in res.collect()}
    exp = {
        "org/r0/f0.py": ib(2, 2, 3, avgdl, n) + 2.0 * ib(1, 2, 3, avgdl, n),
        "org/r1/f1.py": ib(1, 2, 2, avgdl, n),
        "org/r2/f2.py": 2.0 * ib(3, 2, 4, avgdl, n),
    }
    assert set(got) == set(exp)
    for key in exp:
        assert got[key] == pytest.approx(exp[key], abs=1e-12)
    # every IB partial is non-negative (Lucene 8+ score contract)
    assert all(v >= 0 for v in got.values())


def test_boolean_topk_lead_gating_identical(spark, tmp_path):
    """boolean_topk's must-lead gating (broadcast rarest-must-list
    semi-join before the score shuffle) is a pure plan optimization:
    identical (doc, score, rank) output with gating forced on vs off."""
    from engine.search import boolean_topk

    corpus = generate_corpus_df(spark, 80, partitions=2, max_tokens=120)
    path = str(tmp_path / "blead")
    build_index(spark, corpus, path, n_buckets=2, n_doc_buckets=2)
    idx = Index(spark, path)
    dfm = {r["term"]: r["df"] for r in
           idx.termstats.select("term", "df").collect()}
    terms = sorted(dfm, key=lambda t: (-dfm[t], t))
    head = terms[:3]                     # frequent should terms
    rare = sorted(dfm, key=lambda t: (dfm[t], t))[0]
    qs = [("q1", [rare], head, []),      # rare must + head shoulds
          ("q2", [head[0], head[1]], [rare], []),
          ("q3", [], head[:2], [])]      # no must → no gate
    gated = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
             for r in boolean_topk(idx, qs, 10,
                                   lead_min_saved=0).collect()]
    plain = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
             for r in boolean_topk(idx, qs, 10,
                                   lead_max_df=0).collect()]
    assert gated == plain and gated


def test_lucene_norm_quantization():
    """lucene_norm_dl (Spark) == the pure-Python SmallFloat byte4
    roundtrip replica on the full interesting range, and the closed
    form matches first principles: < 24 exact, else 24 + top-4-bits."""
    from engine.scoring import lucene_norm_dl_py

    # hand checks of the closed form
    assert lucene_norm_dl_py(0) == 0
    assert lucene_norm_dl_py(23) == 23
    assert lucene_norm_dl_py(24) == 24          # x=0
    assert lucene_norm_dl_py(24 + 15) == 24 + 15  # 4-bit exact
    assert lucene_norm_dl_py(24 + 16) == 24 + 16
    assert lucene_norm_dl_py(24 + 17) == 24 + 16  # 10001 -> 10000
    assert lucene_norm_dl_py(24 + 31) == 24 + 30  # 11111 -> 11110
    assert lucene_norm_dl_py(24 + 1000) == 24 + 960  # 1111101000→1111000000
    # quantization is monotone and idempotent
    prev = -1
    for dl in list(range(0, 3000)) + [10**4, 10**5, 10**6]:
        q = lucene_norm_dl_py(dl)
        assert q <= dl and q >= prev
        assert lucene_norm_dl_py(q) == q
        prev = q


def test_lucene_norm_quantization_spark(spark):
    """The Catalyst expression matches the Python replica row-for-row
    (bin()/power-of-two truncation path)."""
    from pyspark.sql import functions as F

    from engine.scoring import lucene_norm_dl, lucene_norm_dl_py

    dls = list(range(0, 200)) + [255, 256, 1000, 4095, 4096, 10**6]
    df = spark.createDataFrame([(d,) for d in dls], "dl long")
    got = {r["dl"]: r["q"] for r in
           df.select("dl", lucene_norm_dl(F.col("dl")).alias("q"))
           .collect()}
    for d in dls:
        assert got[d] == lucene_norm_dl_py(d), d


def test_bm25_lucene_norms_changes_long_doc_scores(spark, tmp_path):
    """norms='lucene' scores equal hand-computed BM25 over the
    QUANTIZED dl (and differ from exact-dl scores on docs whose length
    quantizes)."""
    from engine.scoring import lucene_norm_dl_py

    long_doc = " ".join(["apple"] + ["filler%d" % i for i in range(40)])
    docs = ["apple pie", long_doc]      # dl=2 (exact), dl=41 → 40
    idx = _mini_index(spark, tmp_path, docs, name="ln")
    assert lucene_norm_dl_py(41) == 40
    avgdl, n = idx.avgdl, 2
    res = {r["doc_id"]: r["score"] for r in
           score_exhaustive(idx, [("q", "apple", 1.0)], 10,
                            norms="lucene").collect()}
    id2doc = {r["docno"]: r["doc_id"] for r in
              idx.docs.select("doc_id", "docno").collect()}
    assert res[id2doc["org/r0/f0.py"]] == pytest.approx(
        bm25(1, 2, 2, avgdl, n), abs=1e-12)
    assert res[id2doc["org/r1/f1.py"]] == pytest.approx(
        bm25(1, 2, 40, avgdl, n), abs=1e-12)   # quantized 41 → 40


def test_boolean_topk_pure_should_kernel_routing(spark, tmp_path):
    """Pure-should boolean queries route through the block-max kernel
    (weight-1.0 weighted OR); results identical to the explode plan,
    and mixed batches (structural + pure-should) union correctly."""
    corpus = generate_corpus_df(spark, 60, partitions=2, max_tokens=100)
    path = str(tmp_path / "bkr")
    build_index(spark, corpus, path, n_buckets=2, n_doc_buckets=2)
    idx = Index(spark, path)
    from engine.search import boolean_topk

    vocab = sorted(r["term"] for r in
                   idx.termstats.select("term").limit(40).collect())
    qs = [("p1", [], vocab[:3], []),            # pure should → kernel
          ("p2", [], [vocab[5]], []),           # pure should → kernel
          ("m1", [vocab[0]], vocab[1:3], []),   # must → explode plan
          ("n1", [], vocab[:2], [vocab[3]])]    # must_not → explode
    a = sorted((r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
               for r in boolean_topk(idx, qs, 8).collect())
    b = sorted((r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
               for r in boolean_topk(idx, qs, 8,
                                     use_kernel=False).collect())
    assert a == b and a
    assert {q for q, *_ in a} == {"p1", "p2", "m1", "n1"}


def test_boolean_wand_claused_equivalence_sharded(spark, tmp_path):
    """CLAUSED boolean queries (must / must_not) through the sharded
    kernel (boolean_wand): rank/score identity with the explode plan,
    at 1 AND 3 doc shards, covering a head-term must_not, pure-must,
    must+should+not, a term in both should and must_not (exclusion
    wins), unsatisfiable must∩not, a missing must term, and a
    tombstoned doc (liveDocs ∪ exclusion merge)."""
    from engine.deletes import delete_docs
    from engine.search import boolean_topk, boolean_wand

    corpus = generate_corpus_df(spark, 80, partitions=2, max_tokens=120)
    path = str(tmp_path / "bwq")
    build_index(spark, corpus, path, n_buckets=2, n_doc_buckets=2)
    stats = {r["term"]: r["df"] for r in
             Index(spark, path).termstats.select("term", "df").collect()}
    n_docs = 80
    by_df = sorted(stats, key=lambda t: (-stats[t], t))
    # top terms co-occur in most docs (conjunctions stay satisfiable);
    # the exclusion term hits ~half the corpus (meaningful, not total)
    top = by_df[:4]
    half = min(stats, key=lambda t: (abs(stats[t] - n_docs // 2), t))
    # tombstone one doc that matches the top term
    probe = Index(spark, path)
    victim = (score_exhaustive(probe, [("v", top[0], 1.0)], 1)
              .collect()[0]["doc_id"])
    delete_docs(spark, path, [int(victim)])
    idx = Index(spark, path)   # fresh handle: dead_ids cached per Index

    qs = [
        ("c1", [top[0]], top[1:3], []),             # must + should
        ("c2", [top[0]], [], [half]),               # must + ~half-df not
        ("c3", [], top[1:3], [half]),               # should + not (BMW branch)
        ("c4", [top[0], top[1]], [], []),           # pure conjunction
        ("c5", [top[0]], [], [top[0]]),             # must ∩ not: empty
        ("c6", [], [top[2]], [top[2]]),             # should == not: empty
        ("c7", ["zzz_not_in_vocab"], [top[0]], []),  # missing must: empty
    ]
    a = sorted((r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
               for r in boolean_topk(idx, qs, 7).collect())
    b = sorted((r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
               for r in boolean_topk(idx, qs, 7, use_kernel=False).collect())
    assert a == b and a
    assert {q for q, *_ in a} == {"c1", "c2", "c3", "c4"}
    assert victim not in {d for _, _, d, _ in a}
    # the exclusion genuinely filtered: no c2/c3 hit contains `half`
    half_docs = {r["doc_id"] for r in
                 score_exhaustive(idx, [("h", half, 1.0)], 1000).collect()}
    assert half_docs   # the not-list is non-trivial
    assert not ({d for q, _, d, _ in a if q in ("c2", "c3")} & half_docs)
    # multi-shard kernel ≡ single-shard kernel (doc-sharded eligibility
    # is decided locally; the global window merges shard top-ks)
    claused = [q for q in qs if q[0] not in ("c6",)]
    s1 = sorted((r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
                for r in boolean_wand(idx, claused, 7, n_shards=1).collect())
    s3 = sorted((r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
                for r in boolean_wand(idx, claused, 7, n_shards=3).collect())
    assert s1 == s3 and s1


def test_dictionary_range_pruning(spark, tmp_path):
    """Sorted term-dictionary layout + pushed range predicates
    (Lucene sorted-term-dict seek analog): (a) helper soundness on the
    regex corner cases (trailing quantifier binds the last head char;
    top-level alternation kills the head), (b) every termstats file is
    internally term-sorted and files are pairwise range-disjoint (the
    property parquet min/max pruning needs), (c) the range predicate
    reaches the parquet scan as a pushed filter, (d) all four
    MultiTermQuery rewrites return exactly the unpruned match set."""
    import glob as _glob

    import pyarrow.parquet as pq

    from engine.search import (_next_prefix, _prefix_range_filter,
                               _regex_literal_head, expand_prefix_terms,
                               expand_range_terms, expand_regexp_terms,
                               expand_wildcard_terms)

    assert _next_prefix("abc") == "abd"
    assert _next_prefix("az") == "b" or _next_prefix("az") == "a{"
    assert _regex_literal_head("abc.*") == "abc"   # . doesn't quantify c
    assert _regex_literal_head("abc*") == "ab"     # * quantifies c
    assert _regex_literal_head("abc+") == "ab"
    assert _regex_literal_head("abc{2}") == "ab"
    assert _regex_literal_head("abc|xyz") == ""    # top-level alternation
    assert _regex_literal_head("ab(c|d)e") == "ab" # grouped alt is fine

    corpus = generate_corpus_df(spark, 60, partitions=2, max_tokens=100)
    path = str(tmp_path / "dict")
    build_index(spark, corpus, path, n_buckets=2, n_doc_buckets=2)
    idx = Index(spark, path)

    # (b) physical layout: per-file sorted, files range-disjoint
    ranges = []
    for f in sorted(_glob.glob(f"{path}/termstats/part-*.parquet")):
        terms = pq.read_table(f, columns=["term"])["term"].to_pylist()
        if not terms:
            continue
        assert terms == sorted(terms), f"file not term-sorted: {f}"
        ranges.append((terms[0], terms[-1]))
    ranges.sort()
    assert len(ranges) >= 2   # the layout actually split the vocabulary
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert h1 <= l2, "termstats files overlap in term ranges"

    # (c) the range predicate is pushed into the parquet scan
    pruned = _prefix_range_filter(idx.termstats.select("term"), ["me"])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(term,me" in plan

    # (d) pruned rewrites == unpruned truth over the full vocabulary
    vocab = sorted(r["term"] for r in
                   idx.termstats.select("term").distinct().collect())
    pre = vocab[5][:2]
    got = {t for _, t, _ in expand_prefix_terms(idx, [("q", pre)])}
    assert got == {t for t in vocab if t.startswith(pre)} and got

    wpat = pre + "*e"
    got = {t for _, t, _ in expand_wildcard_terms(idx, [("q", wpat)])}
    import fnmatch
    assert got == {t for t in vocab if fnmatch.fnmatchcase(t, wpat)}

    import re as _re
    rpat = pre + "[a-z]*"
    got = {t for _, t, _ in expand_regexp_terms(idx, [("q", rpat)])}
    assert got == {t for t in vocab if _re.fullmatch(rpat, t)} and got
    # alternation: the head filter must NOT prune the second branch
    t1, t2 = vocab[3], vocab[-3]
    apat = f"{t1}|{t2}"
    got = {t for _, t, _ in expand_regexp_terms(idx, [("q", apat)])}
    assert got == {t1, t2}

    lo, hi = vocab[10], vocab[20]
    got = {t for _, t, _ in expand_range_terms(idx, [("q", lo, hi)])}
    assert got == {t for t in vocab if lo <= t < hi} and got
