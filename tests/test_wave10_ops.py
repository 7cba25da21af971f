"""Wave-10 operators: Bloom-filter membership / decontamination,
extended_stats aggregation, field_value_factor function_score."""

import math

import pytest
from pyspark.sql import functions as F

from engine.sketches import (BLOOM_K, bloom_build, bloom_probe,
                             bloom_probe_py)


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

def test_bloom_matches_python_replica_and_one_sided(spark):
    members = [f"m{i}" for i in range(500)]
    probes = members[:50] + [f"x{i}" for i in range(500)]
    mdf = spark.createDataFrame([(v,) for v in members], "v string")
    pdf = spark.createDataFrame([(v,) for v in probes], "v string")
    filt = bloom_build(mdf, "v")
    got = {r["v"]: r["maybe"]
           for r in bloom_probe(pdf, "v", filt).collect()}
    exp = bloom_probe_py(probes, members)
    assert got == exp
    # one-sided: every true member tests positive
    assert all(got[v] for v in members[:50])
    # and the false-positive rate is sane (m=131072, k=4, n=500 →
    # ~(1-e^{-4*500/131072})^4 ≈ 5e-8; allow a generous margin)
    fps = sum(1 for v in probes[50:] if got[v])
    assert fps <= 2


def test_bloom_filter_is_fixed_size(spark):
    big = spark.range(0, 20000).select(
        F.concat(F.lit("v"), F.col("id")).alias("v"))
    filt = bloom_build(big, "v")
    assert filt.count() <= 4096


def test_bloom_decontaminate_flags_superset_of_exact(spark):
    """Bloom decontamination must flag every doc the exact pass flags
    (no false negatives), with n_maybe >= n_hit per doc."""
    from engine.pipeline.curation import bloom_decontaminate, decontaminate

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta"),
         (1, "one two three four five six seven eight nine ten"),
         (2, "completely different words nowhere near the eval set ok"),
         (3, "tiny")],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta"),
         (1, "five six seven eight nine")],
        "doc_id long, text string")
    exact = {r["doc_id"]: r for r in
             decontaminate(docs, ev, n=5, threshold=0.05).collect()}
    bloom = {r["doc_id"]: r for r in
             bloom_decontaminate(docs, ev, n=5, threshold=0.05).collect()}
    assert exact.keys() == bloom.keys()
    for d in exact:
        assert bloom[d]["n_grams"] == exact[d]["n_grams"]
        assert bloom[d]["n_maybe"] >= exact[d]["n_hit"]
        if exact[d]["contaminated"]:
            assert bloom[d]["contaminated"]


# ---------------------------------------------------------------------------
# extended_stats_agg
# ---------------------------------------------------------------------------

def test_extended_stats_vs_replica(spark, tiny_index):
    from engine.search import _matched_hits, extended_stats_agg

    idx = tiny_index
    terms = [r["term"] for r in
             idx.termstats.orderBy(F.desc("df")).limit(2).collect()]
    queries = [("q1", terms), ("q2", terms[:1])]
    got = {r["qid"]: r for r in
           extended_stats_agg(idx, queries).collect()}

    dls = {int(r["doc_id"]): int(r["dl"]) for r in
           idx.spark.read.parquet(idx.index_dir + "/tf")
           .groupBy("doc_id").agg(F.sum("tf").alias("dl")).collect()}
    hits = _matched_hits(idx, queries).collect()
    per_q: dict = {}
    for r in hits:
        per_q.setdefault(r["qid"], []).append(dls[int(r["doc_id"])])

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    for qid, xs in per_q.items():
        n = len(xs)
        s, s2 = sum(xs), sum(x * x for x in xs)
        var = (n * s2 - s * s) / (n * n)
        g = got[qid]
        assert (g["count"], g["min_dl"], g["max_dl"], g["sum_dl"],
                g["sum_sq"]) == (n, min(xs), max(xs), s, s2)
        assert g["avg_dl"] == pytest.approx(r6(s / n), abs=1e-9)
        assert g["variance"] == pytest.approx(r6(var), abs=1e-9)
        assert g["std_dev"] == pytest.approx(r6(math.sqrt(var)), abs=1e-9)


# ---------------------------------------------------------------------------
# field_value_factor_topk
# ---------------------------------------------------------------------------

def test_fvf_reranks_by_length_factor(spark, tiny_index):
    from engine.search import field_value_factor_topk, score_exhaustive

    idx = tiny_index
    terms = [r["term"] for r in
             idx.termstats.orderBy(F.desc("df")).limit(2).collect()]
    qt = [("q1", t, 1.0) for t in terms]
    base = {int(r["doc_id"]): r["score"]
            for r in score_exhaustive(idx, qt, 1 << 31).collect()}
    dls = {int(r["doc_id"]): int(r["dl"]) for r in
           idx.spark.read.parquet(idx.index_dir + "/tf")
           .groupBy("doc_id").agg(F.sum("tf").alias("dl")).collect()}

    def r(x, nd):
        return math.floor(x * 10 ** nd + 0.5) / 10 ** nd

    exp = sorted(
        ((r(base[d] * r(math.log1p(dls[d]), 6), 4), -d) for d in base),
        reverse=True)[:10]
    got = field_value_factor_topk(idx, qt, 10).collect()
    assert [(x["score"], -x["doc_id"]) for x in got] == exp
    assert [x["rank"] for x in got] == list(range(1, 11))


# ---------------------------------------------------------------------------
# trigram-accelerated wildcard (wave 11)
# ---------------------------------------------------------------------------

def test_trigram_wildcard_equivalence(spark, tiny_index):
    """The trigram-pruned rewrite must return EXACTLY the full-scan
    rewrite's term set for every pattern class: prefix, suffix
    (leading wildcard), infix, mixed-run, and the short-literal
    fallback."""
    from engine.search import expand_wildcard_terms
    from engine.trigram import (build_term_trigrams,
                                expand_wildcard_terms_trigram)

    idx = tiny_index
    assert build_term_trigrams(spark, idx.index_dir)["resumed"] is False
    assert build_term_trigrams(spark, idx.index_dir)["resumed"] is True
    queries = [("t1", "mer*"), ("t2", "*alue"), ("t3", "*erg*"),
               ("t4", "win*ow"), ("t5", "?as?"), ("t6", "*zzznope*")]
    full = sorted(expand_wildcard_terms(idx, queries))
    tri = sorted(expand_wildcard_terms_trigram(idx, queries))
    assert tri == full
    assert any(q == "t1" for q, _, _ in full)   # matches exist


def test_trigram_candidates_prune(spark, tiny_index):
    """The trigram scan must touch far fewer terms than the
    vocabulary for a selective infix pattern."""
    from pyspark.sql import functions as F
    from engine.trigram import (_trigrams_path, build_term_trigrams,
                                literal_trigrams)

    idx = tiny_index
    build_term_trigrams(spark, idx.index_dir)
    vocab = idx.termstats.count()
    tgs = literal_trigrams("*erge*")
    cand = (spark.read.parquet(_trigrams_path(idx.index_dir))
            .where(F.col("tg").isin(tgs))
            .select("term").distinct().count())
    assert 0 < cand < vocab / 2


def test_regex_literal_runs_are_sound():
    """Soundness: every string that fullmatches the pattern must
    contain each extracted run as a substring."""
    import re

    from engine.trigram import regex_literal_runs

    cases = [
        ("merge", ["merge"]),
        ("merges?", ["merge", "merges"]),
        ("mer.*sort", ["mersort", "merge sort", "merXYsort"]),
        ("abc*", ["ab", "abc", "abcccc"]),
        ("abc+def", ["abcdef", "abccdef"]),
        ("(abc)?def", ["def", "abcdef"]),
        ("ab\\.cd", ["ab.cd"]),
        ("[mw]erge", ["merge", "werge"]),
        ("colou?r", ["color", "colour"]),
        ("a{2,3}bcd", ["aabcd", "aaabcd"]),
        ("x(a|b)+y", ["xay", "xbay", "xabababy"]),
    ]
    for pat, matches in cases:
        runs = regex_literal_runs(pat)
        for s in matches:
            assert re.fullmatch(pat, s), (pat, s)
            for r in runs:
                assert r in s, (pat, s, r)


def test_regex_trigram_equivalence(spark, tiny_index):
    from engine.search import expand_regexp_terms
    from engine.trigram import (build_term_trigrams,
                                expand_regexp_terms_trigram)

    idx = tiny_index
    build_term_trigrams(spark, idx.index_dir)
    queries = [("r1", "mer.*"), ("r2", ".*alue"), ("r3", "w[io]ndow"),
               ("r4", "s.m"), ("r5", "merge|sort"), ("r6", "scan{1,2}")]
    full = sorted(expand_regexp_terms(idx, queries))
    tri = sorted(expand_regexp_terms_trigram(idx, queries))
    assert tri == full
    assert any(q == "r1" for q, _, _ in full)
