"""HLL cardinality sketch, linear hybrid fusion, filtered ANN."""

import pytest
from pyspark.sql import functions as F

from engine.pipeline import similarity
from engine.sketches import (M_REGISTERS, hll_cardinality, hll_estimate,
                             hll_estimate_py, hll_registers)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def _vals_df(spark, key, values):
    return spark.createDataFrame([(key, v) for v in values],
                                 "k string, v string")


def test_hll_matches_python_replica_both_branches(spark):
    """Raw-estimate regime (5000 distinct) and linear-counting regime
    (10 distinct) both agree bit-for-bit with the pure-python
    replica (the same arithmetic the DuckDB oracle runs)."""
    big = [f"val_{i}" for i in range(5000)]
    small = [f"x{i}" for i in range(10)]
    df = _vals_df(spark, "a", big).union(_vals_df(spark, "b", small))
    out = {r["k"]: r["est"]
           for r in hll_cardinality(df, ["k"], "v").collect()}
    assert out["a"] == hll_estimate_py(big)
    assert out["b"] == hll_estimate_py(small)
    # accuracy: 1.04/sqrt(4096) ~ 1.6% std error; 5% is ~3 sigma
    assert abs(out["a"] - 5000) / 5000 < 0.05
    assert abs(out["b"] - 10) < 0.5


def test_hll_ignores_nulls_and_duplicates(spark):
    dup = _vals_df(spark, "a", ["x", "x", "y", "y", "y"])
    with_null = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "y")], "k string, v string")
    e1 = hll_cardinality(dup, ["k"], "v").collect()[0]["est"]
    e2 = hll_cardinality(with_null, ["k"], "v").collect()[0]["est"]
    assert e1 == e2 == hll_estimate_py(["x", "y"])


def test_hll_merge_is_register_max_and_partition_invariant(spark):
    """The scale property: registers of A∪B == register-wise max of
    registers(A) and registers(B) (the sketch merges without touching
    data), and the estimate is identical at 1 and 8 partitions."""
    a = [f"a{i}" for i in range(300)]
    b = [f"b{i}" for i in range(400)]
    df_a, df_b = _vals_df(spark, "k", a), _vals_df(spark, "k", b)
    both = df_a.union(df_b)
    regs_both = {(r["register"]): r["rho"]
                 for r in hll_registers(both, ["k"], "v").collect()}
    ra = {r["register"]: r["rho"]
          for r in hll_registers(df_a, ["k"], "v").collect()}
    rb = {r["register"]: r["rho"]
          for r in hll_registers(df_b, ["k"], "v").collect()}
    merged = {j: max(ra.get(j, 0), rb.get(j, 0))
              for j in set(ra) | set(rb)}
    assert regs_both == merged
    e1 = hll_cardinality(both.repartition(1), ["k"], "v").collect()[0]["est"]
    e8 = hll_cardinality(both.repartition(8), ["k"], "v").collect()[0]["est"]
    assert e1 == e8


def test_hll_register_count_bounded(spark):
    """However large the input, at most m=4096 register rows per key
    survive the map-side agg — the fixed-size-state contract."""
    df = _vals_df(spark, "k", [f"v{i}" for i in range(20000)])
    n = hll_registers(df, ["k"], "v").count()
    assert n <= M_REGISTERS


def test_cardinality_agg_tracks_exact_distinct(spark, tiny_index):
    """Sketch estimate within 3-sigma of the true distinct-term count
    of each query's matched doc set."""
    from engine.search import _matched_hits, _paths, cardinality_agg

    # pick real vocabulary terms (the analyzer drops stopwords, so
    # hand-picked english terms may not exist in the synthetic corpus)
    terms = [r["term"] for r in tiny_index.termstats
             .orderBy(F.desc("df"), F.asc("term")).limit(3).collect()]
    queries = [("q1", terms[:1]), ("q2", terms[1:3])]
    est = {r["qid"]: r["est"]
           for r in cardinality_agg(tiny_index, queries).collect()}
    hits = _matched_hits(tiny_index, queries)
    tf = tiny_index.spark.read.parquet(
        _paths(tiny_index.index_dir)["tf"]).select("doc_id", "term")
    exact = {r["qid"]: r["n"]
             for r in hits.join(tf, "doc_id").groupBy("qid")
             .agg(F.count_distinct("term").alias("n")).collect()}
    assert set(est) == set(exact)
    for qid, n in exact.items():
        assert abs(est[qid] - n) <= max(3.0, 0.05 * n), (qid, est[qid], n)


# ---------------------------------------------------------------------------
# percentiles + composite aggs
# ---------------------------------------------------------------------------

def _agg_index(spark, tmp_path, contents, name):
    from engine.index_build import build_index
    from engine.search import Index

    rows = [(f"org/r{i:02d}", f"f{i:02d}.py", "c" * 12, "python", text)
            for i, text in enumerate(contents)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    path = str(tmp_path / name)
    build_index(spark, df, path, n_buckets=2, n_doc_buckets=2)
    return Index(spark, path)


def test_percentiles_hand_computed(spark, tmp_path):
    """dls {3,5,7,9,100}: p50 -> nearest-rank 3 -> dl 7 (exact bucket,
    dl<16); p90/p99 -> rank 5 -> dl 100 in bucket [96,103] -> 99.5."""
    from engine.search import percentiles_agg

    def doc(dl):
        return "common " + " ".join(f"tok{dl}x{j}" for j in range(dl - 1))

    idx = _agg_index(spark, tmp_path, [doc(d) for d in (3, 5, 7, 9, 100)],
                     "pct")
    out = {(r["qid"], r["pct"]): r["est"]
           for r in percentiles_agg(idx, [("q", ["common"])]).collect()}
    assert out == {("q", 50.0): 7.0, ("q", 90.0): 99.5, ("q", 99.0): 99.5}


def test_percentiles_bucket_is_exact_below_16(spark, tmp_path):
    from engine.search import percentiles_agg

    idx = _agg_index(spark, tmp_path,
                     ["common " + " ".join(f"t{i}w{j}" for j in range(i))
                      for i in range(1, 11)], "pcte")  # dls 2..11
    out = {r["pct"]: r["est"]
           for r in percentiles_agg(idx, [("q", ["common"])],
                                    percents=(10.0, 50.0, 100.0)).collect()}
    # N=10, nearest ranks 1/5/10 over sorted dls [2..11]
    assert out == {10.0: 2.0, 50.0: 6.0, 100.0: 11.0}


def test_composite_agg_pagination_and_null_omission(spark, tmp_path):
    from engine.search import composite_agg

    idx = _agg_index(spark, tmp_path,
                     [f"common u{i}" for i in range(6)], "comp")
    # key by doc parity; one doc gets a NULL key (omitted, ES default)
    fields = idx.docs.select(
        "doc_id",
        F.when(F.col("doc_id") == 5, F.lit(None))
        .otherwise(F.concat(F.lit("g"), (F.col("doc_id") % 3)))
        .alias("grp"))
    q = [("q", ["common"])]
    p1 = composite_agg(idx, q, fields, ["grp"], 2).collect()
    assert [(r["grp"], r["n_docs"]) for r in p1] == [("g0", 2), ("g1", 2)]
    p2 = composite_agg(idx, q, fields, ["grp"], 2,
                       after=(p1[-1]["grp"],)).collect()
    # doc 5 (g2) omitted for its NULL key -> g2 counts only doc 2
    assert [(r["grp"], r["n_docs"]) for r in p2] == [("g2", 1)]
    # exhausted cursor -> empty page
    p3 = composite_agg(idx, q, fields, ["grp"], 2,
                       after=(p2[-1]["grp"],)).collect()
    assert p3 == []


# ---------------------------------------------------------------------------
# rescore window (Lucene QueryRescorer / ES rescore)
# ---------------------------------------------------------------------------

def _round4(x):
    import math
    return math.floor(x * 1e4 + 0.5) / 1e4


def test_rescore_combine_and_window_gate(spark, tmp_path):
    from engine.search import rescore_topk, score_lmd, score_wand

    docs = ["common alpha alpha", "common beta", "common alpha beta gamma",
            "common delta epsilon zeta eta", "common common alpha"]
    idx = _agg_index(spark, tmp_path, docs, "resc")
    qt = [("q", "common", 1.0), ("q", "alpha", 1.0)]

    # first-pass window: rounded BM25 top-3
    first = {r["doc_id"]: _round4(r["score"])
             for r in score_wand(idx, qt, 10).collect()}
    window = [d for d, _ in sorted(first.items(),
                                   key=lambda kv: (-kv[1], kv[0]))][:3]
    lmd = {r["doc_id"]: _round4(r["score"])
           for r in score_lmd(idx, qt, 10).collect()}
    expected = sorted(
        ((d, _round4(first[d] + lmd.get(d, 0.0))) for d in window),
        key=lambda kv: (-kv[1], kv[0]))

    out = rescore_topk(idx, qt, qt, k=3, window=3).collect()
    assert [(r["doc_id"], r["score"]) for r in out] == expected
    # window gate: every result doc came from the first-pass window
    assert {r["doc_id"] for r in out} <= set(window)


def test_rescore_weight_zero_is_first_pass(spark, tmp_path):
    from engine.search import rescore_topk, score_wand

    docs = ["common alpha", "common beta beta", "common gamma gamma gamma",
            "common alpha beta"]
    idx = _agg_index(spark, tmp_path, docs, "resc0")
    qt = [("q", "common", 1.0)]
    out = rescore_topk(idx, qt, qt, k=3, window=3,
                       rescore_weight=0.0).collect()
    first = {r["doc_id"]: _round4(r["score"])
             for r in score_wand(idx, qt, 10).collect()}
    expected = sorted(first.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r["doc_id"], r["score"]) for r in out] == expected


def test_rescore_k_must_fit_window(spark, tiny_index):
    import pytest as _pt

    from engine.search import rescore_topk

    with _pt.raises(AssertionError):
        rescore_topk(tiny_index, [("q", "x", 1.0)], [("q", "x", 1.0)],
                     k=20, window=10)


# ---------------------------------------------------------------------------
# linear (minmax) fusion
# ---------------------------------------------------------------------------

def _scored(spark, rows):
    return spark.createDataFrame(rows, "qid string, doc_id long, score double")


def test_linear_fuse_hand_computed(spark):
    from engine.fusion import linear_fuse

    # input 0: scores 10, 5, 0 -> norm 1.0, 0.5, 0.0
    # input 1: scores 0.2, 0.1 -> norm 1.0, 0.0
    a = _scored(spark, [("q", 1, 10.0), ("q", 2, 5.0), ("q", 3, 0.0)])
    b = _scored(spark, [("q", 2, 0.2), ("q", 1, 0.1)])
    out = {r["doc_id"]: (r["fused"], r["n_lists"], r["rank"])
           for r in linear_fuse([a, b], weights=[0.7, 0.3]).collect()}
    assert out[1] == (pytest.approx(0.7 * 1.0 + 0.3 * 0.0), 2, 1)
    assert out[2] == (pytest.approx(0.7 * 0.5 + 0.3 * 1.0), 2, 2)
    assert out[3] == (pytest.approx(0.0), 1, 3)


def test_linear_fuse_degenerate_tie_normalizes_to_one(spark):
    from engine.fusion import linear_fuse

    a = _scored(spark, [("q", 1, 3.0), ("q", 2, 3.0)])  # max == min
    out = {r["doc_id"]: r["fused"]
           for r in linear_fuse([a], weights=[1.0]).collect()}
    assert out == {1: pytest.approx(1.0), 2: pytest.approx(1.0)}


def test_linear_fuse_missing_doc_contributes_zero(spark):
    from engine.fusion import linear_fuse

    a = _scored(spark, [("q", 1, 2.0), ("q", 2, 1.0)])
    b = _scored(spark, [("q", 3, 9.0), ("q", 2, 4.0)])
    out = {r["doc_id"]: r["fused"]
           for r in linear_fuse([a, b]).collect()}
    # doc 1 only in a (norm 1), doc 3 only in b (norm 1), doc 2 worst
    # in a (0) and worst in b (0)
    assert out[1] == pytest.approx(1.0)
    assert out[3] == pytest.approx(1.0)
    assert out[2] == pytest.approx(0.0)


# ---------------------------------------------------------------------------
# filtered ANN (ES knn.filter pre-filter semantics)
# ---------------------------------------------------------------------------

def _emb_line(spark):
    """Vectors on a line: cosine to the query decays with index, so
    unfiltered top-k is ids 1..k and the best EVEN id can sit outside
    it — the pre-vs-post filter divergence case."""
    import math
    rows = []
    for i in range(40):
        ang = 0.03 * i
        rows.append((i, [math.cos(ang), math.sin(ang), 0.0]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_filtered_topk_is_topk_of_filtered_set(spark):
    emb = _emb_line(spark)
    allowed = emb.where(F.col("vec_id") % 7 == 0).select("vec_id")
    out = similarity.cosine_topk(emb, [0], k=3, allowed=allowed).collect()
    # nearest allowed ids to query 0 (id 0 self-excluded): 7, 14, 21
    assert [r["vec_id"] for r in out] == [7, 14, 21]


def test_pre_filter_beats_post_filter(spark):
    """The doc a post-filter would MISS: unfiltered top-5 of query 0
    is ids 1..5 (no multiples of 7) — post-filtering it returns
    nothing, while the pre-filter contract returns the true top-k of
    the filtered set."""
    emb = _emb_line(spark)
    unfiltered = similarity.cosine_topk(emb, [0], k=5).collect()
    assert {r["vec_id"] for r in unfiltered} == {1, 2, 3, 4, 5}
    allowed = emb.where(F.col("vec_id") % 7 == 0).select("vec_id")
    filtered = similarity.cosine_topk(emb, [0], k=5, allowed=allowed)
    assert [r["vec_id"] for r in filtered.collect()] == [7, 14, 21, 28, 35]


def test_filtered_ivf_matches_bruteforce_when_probing_all_cells(spark):
    emb = _emb_line(spark)
    allowed = emb.where(F.col("vec_id") % 2 == 0).select("vec_id")
    bf = similarity.cosine_topk(emb, [0, 3], k=4, allowed=allowed)
    ivf = similarity.cosine_topk_ivf(emb, [0, 3], k=4, n_centroids=4,
                                     n_probe=4, allowed=allowed)
    got_bf = sorted((r["qid"], r["rank"], r["vec_id"])
                    for r in bf.collect())
    got_ivf = sorted((r["qid"], r["rank"], r["vec_id"])
                     for r in ivf.collect())
    assert got_bf == got_ivf
    # every result passes the filter
    assert all(v % 2 == 0 for _, _, v in got_ivf)
