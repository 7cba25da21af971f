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
        # ']'-first character classes (ADVICE r3): the leading ']' is a
        # literal member, not a close — the old loop leaked ']abc' as a
        # required run and over-pruned every candidate.
        ("[^]]abc", ["xabc", "0abc"]),
        ("[]]abc", ["]abc"]),
        ("xyz[]x]abc", ["xyz]abc", "xyzxabc"]),
        ("[^^]abc", ["xabc"]),
        ("xyz[^^]a|bcd", ["bcd", "xyzza"]),
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


# ---------------------------------------------------------------------------
# reshard_index (wave 13)
# ---------------------------------------------------------------------------

def test_reshard_rank_identity(spark, tmp_path):
    """Resharding is a physical partition-key rewrite: every query
    path must return identical results at the new bucket count, stats
    must update, and the delta-compaction contract must hold."""
    import pytest as _pt

    from engine.index_build import build_index, load_stats, reshard_index
    from engine.search import Index, score_exhaustive, score_wand

    rows = [("org/r", f"f{i}.py", "c" * 12, "py",
             f"alpha beta gamma{i % 3} delta{i % 5} epsilon")
            for i in range(30)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    path = str(tmp_path / "rsidx")
    build_index(spark, df, path, n_buckets=4, n_doc_buckets=2)
    idx = Index(spark, path)
    qt = [("q", "alpha", 1.0), ("q", "delta0", 2.0),
          ("q2", "gamma1", 1.0)]
    before_w = [(r["qid"], r["doc_id"], r["score"], r["rank"])
                for r in score_wand(idx, qt, 10).collect()]
    before_e = [(r["qid"], r["doc_id"], r["rank"])
                for r in score_exhaustive(idx, qt, 10).collect()]

    out = reshard_index(spark, path, 3)
    assert out == {"resharded": True, "n_buckets": 3, "was": 4}
    assert load_stats(spark, path)["n_buckets"] == 3
    idx2 = Index(spark, path)
    after_w = [(r["qid"], r["doc_id"], r["score"], r["rank"])
               for r in score_wand(idx2, qt, 10).collect()]
    after_e = [(r["qid"], r["doc_id"], r["rank"])
               for r in score_exhaustive(idx2, qt, 10).collect()]
    assert after_w == before_w and after_e == before_e
    # driver-side pruning agrees with the rewritten partition column
    got_buckets = {r["bucket"] for r in
                   idx2.termstats.select("bucket").distinct().collect()}
    assert got_buckets <= set(range(3))
    assert set(idx2.term_buckets(["alpha", "delta0"])) <= set(range(3))
    # same count → no-op; deltas present → refuse
    assert reshard_index(spark, path, 3)["resharded"] is False
    from engine.deletes import update_docs
    update_docs(spark, path, spark.createDataFrame(
        [("org/r", "f0.py", "d" * 12, "py", "omega content")],
        "repo string, path string, commit string, lang string, "
        "content string"))
    with _pt.raises(ValueError, match="compact_deltas"):
        reshard_index(spark, path, 2)


def test_reshard_marker_guards_half_resharded_index(spark, tmp_path):
    """ADVICE r3: the four reshard swaps are not atomic as a group. A
    crash mid-sequence must leave the index REFUSING to load (marker
    present), and re-running reshard_index must complete idempotently
    and clear the marker."""
    import pytest as _pt

    from engine.index_build import (_marker_fs, build_index, load_stats,
                                    reshard_in_progress, reshard_index)
    from engine.search import Index, score_wand

    rows = [("org/r", f"g{i}.py", "c" * 12, "py",
             f"kappa lambda mu{i % 4} nu{i % 7}") for i in range(24)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    path = str(tmp_path / "rsmark")
    build_index(spark, df, path, n_buckets=4, n_doc_buckets=2)
    qt = [("q", "kappa", 1.0), ("q", "mu0", 2.0)]
    before = [(r["qid"], r["doc_id"], r["rank"])
              for r in score_wand(Index(spark, path), qt, 10).collect()]

    # simulate the crash window: marker written, stats NOT yet swapped
    fs, marker = _marker_fs(spark, path)
    fs.createNewFile(marker)
    assert reshard_in_progress(spark, path)
    with _pt.raises(RuntimeError, match="interrupted reshard"):
        Index(spark, path)
    with _pt.raises(RuntimeError, match="interrupted reshard"):
        load_stats(spark, path)
    # re-running the reshard completes and clears the marker
    out = reshard_index(spark, path, 3)
    assert out["resharded"] is True and out["n_buckets"] == 3
    assert not reshard_in_progress(spark, path)
    after = [(r["qid"], r["doc_id"], r["rank"])
             for r in score_wand(Index(spark, path), qt, 10).collect()]
    assert after == before

    # crash AFTER the stats swap but before the marker delete: the
    # same-count re-run must recognise completion and clear the marker
    fs.createNewFile(marker)
    out = reshard_index(spark, path, 3)
    assert out == {"resharded": True, "n_buckets": 3, "resumed": True}
    assert not reshard_in_progress(spark, path)
    assert load_stats(spark, path)["n_buckets"] == 3


# ---------------------------------------------------------------------------
# pipeline aggregations (wave 13)
# ---------------------------------------------------------------------------

def test_windowed_counts_pipeline_replica(spark):
    import datetime as dt

    from engine.streaming import windowed_counts_pipeline

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    counts = {("click", 0): 3, ("click", 1): 5, ("click", 3): 2,
              ("view", 0): 4, ("view", 2): 1}
    for (et, h), n in counts.items():
        for i in range(n):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=i),
                         i, et, 1.0))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    got = [(r["event_type"], r["window_start"].hour, r["n"],
            r["cum_n"], r["deriv_n"])
           for r in windowed_counts_pipeline(events).collect()]
    # occupied buckets only; cum over series; deriv vs previous
    # OCCUPIED bucket, NULL at each series head (the ES contract)
    assert got == [
        ("click", 0, 3, 3, None),
        ("click", 1, 5, 8, 2),
        ("click", 3, 2, 10, -3),
        ("view", 0, 4, 4, None),
        ("view", 2, 1, 5, -3),
    ]


# ---------------------------------------------------------------------------
# more_like_text (wave 14 — the free-text half of ES MLT)
# ---------------------------------------------------------------------------

def test_more_like_text_matches_replica(spark, tiny_index):
    import math

    from engine.analysis import tokenize_texts
    from engine.search import more_like_text, score_exhaustive

    idx = tiny_index
    seed_text = idx.docs.select("content").collect()[0]["content"]
    queries = [("m1", seed_text), ("m2", "zzznope qqqnothing")]
    got = more_like_text(idx, queries, 10, n_terms=5).collect()

    # python replica of the term selection
    toks = tokenize_texts([seed_text], **idx.analyzer_opts())[0]
    cnt: dict = {}
    for t in toks:
        cnt[t] = cnt.get(t, 0) + 1
    dfm = idx.df_map(sorted(cnt))
    n = float(idx.n_docs)
    scored = sorted(
        (-(math.floor(tf * math.log(1 + (n - dfm[t] + 0.5)
                                    / (dfm[t] + 0.5)) * 1e6 + 0.5) / 1e6),
         t)
        for t, tf in cnt.items() if t in dfm)
    top5 = [t for _, t in scored[:5]]
    exp = {(r["qid"], r["doc_id"], r["rank"]) for r in
           score_exhaustive(idx, [("m1", t, 1.0) for t in top5],
                            10).collect()}
    assert {(r["qid"], r["doc_id"], r["rank"]) for r in got} == exp
    # the seed doc itself should rank #1 for its own text
    seed_id = int(idx.docs.select("doc_id", "content").collect()[0]
                  ["doc_id"])
    assert any(r["qid"] == "m1" and r["doc_id"] == seed_id
               and r["rank"] == 1 for r in got)
    # out-of-vocabulary query → no rows
    assert not [r for r in got if r["qid"] == "m2"]


def test_bloom_large_filter_udf_path_matches_replica(spark):
    """n_words above the literal-array cap routes through the pandas
    UDF — identical bit arithmetic to the python replica."""
    from engine.sketches import bloom_build, bloom_probe, bloom_probe_py

    nw = 16384
    members = [f"m{i}" for i in range(300)]
    probes = members[:30] + [f"x{i}" for i in range(300)]
    mdf = spark.createDataFrame([(v,) for v in members], "v string")
    pdf = spark.createDataFrame([(v,) for v in probes], "v string")
    filt = bloom_build(mdf, "v", n_words=nw)
    got = {r["v"]: r["maybe"]
           for r in bloom_probe(pdf, "v", filt, n_words=nw).collect()}
    assert got == bloom_probe_py(probes, members, n_words=nw)
    assert all(got[v] for v in members[:30])


def test_bloom_size_for():
    from engine.sketches import BLOOM_WORDS, bloom_size_for

    import warnings

    assert bloom_size_for(100) == BLOOM_WORDS          # floor
    assert bloom_size_for(275_000) == 131072           # 2^ceil(log2(10n/32))
    with warnings.catch_warnings(record=True) as w:    # cap WARNS loudly
        warnings.simplefilter("always")
        assert bloom_size_for(10**9) == 1 << 24
        assert any("over-flagging" in str(x.message) for x in w)


# ---------------------------------------------------------------------------
# matrix_stats + percentile_ranks (wave 16)
# ---------------------------------------------------------------------------

def test_matrix_stats_vs_replica(spark, tiny_index):
    from engine.search import _matched_hits, matrix_stats_agg

    idx = tiny_index
    terms = [r["term"] for r in
             idx.termstats.orderBy(F.desc("df")).limit(2).collect()]
    queries = [("q1", terms), ("q2", terms[:1])]
    got = {r["qid"]: r for r in matrix_stats_agg(idx, queries).collect()}

    dls = {int(r["doc_id"]): int(r["dl"]) for r in
           idx.spark.read.parquet(idx.index_dir + "/tf")
           .groupBy("doc_id").agg(F.sum("tf").alias("dl")).collect()}
    ncs = {int(r["doc_id"]): len(r["content"]) for r in
           idx.docs.select("doc_id", "content").collect()}
    per_q: dict = {}
    for r in _matched_hits(idx, queries).collect():
        per_q.setdefault(r["qid"], []).append(int(r["doc_id"]))

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    for qid, ids in per_q.items():
        xs = [dls[d] for d in ids]
        ys = [ncs[d] for d in ids]
        n = len(ids)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        vxn, vyn = n * sxx - sx * sx, n * syy - sy * sy
        covn = n * sxy - sx * sy
        g = got[qid]
        assert g["count"] == n
        assert g["mean_dl"] == pytest.approx(r6(sx / n), abs=1e-9)
        assert g["var_chars"] == pytest.approx(r6(vyn / (n * n)), abs=1e-9)
        assert g["cov"] == pytest.approx(r6(covn / (n * n)), abs=1e-9)
        exp_corr = covn / (math.sqrt(vxn) * math.sqrt(vyn))
        assert g["corr"] == pytest.approx(r6(exp_corr), abs=2e-6)
        # longer docs have more chars: strong positive correlation
        assert g["corr"] > 0.5


def test_percentile_ranks_vs_replica(spark, tiny_index):
    from engine.search import _matched_hits, percentile_ranks_agg

    idx = tiny_index
    terms = [r["term"] for r in
             idx.termstats.orderBy(F.desc("df")).limit(1).collect()]
    queries = [("q1", terms)]
    dls = {int(r["doc_id"]): int(r["dl"]) for r in
           idx.spark.read.parquet(idx.index_dir + "/tf")
           .groupBy("doc_id").agg(F.sum("tf").alias("dl")).collect()}
    xs = sorted(dls[int(r["doc_id"])] for r in
                _matched_hits(idx, queries).collect())
    vals = [xs[0] - 1, xs[len(xs) // 2], xs[-1]]
    got = {(r["qid"], r["value"]): r["pct_rank"] for r in
           percentile_ranks_agg(idx, queries, vals).collect()}
    for v in vals:
        exp = 100.0 * sum(1 for x in xs if x <= v) / len(xs)
        exp = math.floor(exp * 1e6 + 0.5) / 1e6
        assert got[("q1", v)] == pytest.approx(exp, abs=1e-9)
    assert got[("q1", xs[0] - 1)] == 0.0
    assert got[("q1", xs[-1])] == 100.0


# ---------------------------------------------------------------------------
# trigram-pruned fuzzy / suggest (round 4 — VERDICT r3 item 2)
# ---------------------------------------------------------------------------

def test_fuzzy_piece_grams_pigeonhole():
    from engine.trigram import fuzzy_piece_grams

    # too short for the pigeonhole at the given edit budget → None
    assert fuzzy_piece_grams("merge", 1) is None     # 5 < 6
    assert fuzzy_piece_grams("mergesor", 2) is None  # 8 < 9
    g1 = fuzzy_piece_grams("mergeso", 1)             # 7 → pieces 4+3
    assert g1 == [["mer", "erg"], ["eso"]]
    g2 = fuzzy_piece_grams("mergesorts", 2)          # 10 → 4+3+3
    assert g2 == [["mer", "erg"], ["eso"], ["rts"]]


def test_fuzzy_trigram_equivalence(spark, tiny_index):
    """The trigram-pruned fuzzy rewrite must be IDENTICAL to the brute
    dictionary scan across edit distances, incl. short-term fallback
    and no-match queries."""
    from engine.search import expand_fuzzy_terms
    from engine.trigram import build_term_trigrams

    idx = tiny_index
    build_term_trigrams(spark, idx.index_dir)
    queries = [("f1", "mergo"),        # short: falls back (len 5 < 6)
               ("f2", "mergeabl"),     # pigeonhole engages (d1 of
               ("f3", "mergeing"),     #   mergeable / exact+variants)
               ("f4", "zzzzqqq"),      # engages, no matches
               ("f5", "xy")]           # very short fallback
    for e in (1, 2):
        brute = sorted(expand_fuzzy_terms(idx, queries, max_edits=e,
                                          use_trigram=False))
        tri = sorted(expand_fuzzy_terms(idx, queries, max_edits=e,
                                        use_trigram=True))
        assert tri == brute, (e, tri, brute)
    hit = expand_fuzzy_terms(idx, queries, max_edits=1,
                             use_trigram=True)
    assert ("f2", "mergeable", 1.0) in hit   # found THROUGH the prune


def test_suggest_trigram_rank_identity(spark, tiny_index):
    """suggest_terms on the pruned path must be ROW-identical to the
    brute path (same distance/df/term ranking) for both edit budgets."""
    from engine.search import suggest_terms
    from engine.trigram import build_term_trigrams

    idx = tiny_index
    build_term_trigrams(spark, idx.index_dir)
    queries = [("s1", "mergeabl"), ("s2", "searchingg"),
               ("s3", "streaming"), ("s4", "zzzzqqqzzz")]
    for e in (1, 2):
        cols = ("qid", "suggestion", "distance", "df", "rank")
        brute = sorted(tuple(r[c] for c in cols) for r in
                       suggest_terms(idx, queries, max_edits=e, n=5,
                                     use_trigram=False).collect())
        tri = sorted(tuple(r[c] for c in cols) for r in
                     suggest_terms(idx, queries, max_edits=e, n=5,
                                   use_trigram=True).collect())
        assert tri == brute, (e, tri, brute)
    assert brute, "expected suggestions at e=2"


def test_fuzzy_trigram_multi_qterm_per_qid(spark, tiny_index):
    """Regression (round-4 self-review): a qid carrying SEVERAL fuzzy
    clauses must behave identically on both paths — one weighted
    clause per (qterm, matched term) PAIR (Lucene SHOULD-sum
    multiplicity: two clauses both within an edit of the same vocab
    term contribute twice), and the per-qid trigram piece groups /
    count thresholds must not mix the two qterms' grams. The old
    path's (qid, term) distinct collapsed the duplicate and its
    qid-keyed internals polluted the prune."""
    from engine.search import expand_fuzzy_terms, suggest_terms
    from engine.trigram import build_term_trigrams

    idx = tiny_index
    build_term_trigrams(spark, idx.index_dir)
    # two qterms under ONE qid, both 1 edit from 'mergeable'
    # (pigeonhole-eligible at e=1: len 8/9 ≥ 6), plus a short
    # fallback clause under the same qid
    queries = [("q", "mergeabl"), ("q", "mergeables"), ("q", "mergo")]
    for e in (1, 2):
        brute = sorted(expand_fuzzy_terms(idx, queries, max_edits=e,
                                          use_trigram=False))
        tri = sorted(expand_fuzzy_terms(idx, queries, max_edits=e,
                                        use_trigram=True))
        assert tri == brute, (e, tri, brute)
    # the duplicate multiplicity genuinely exists (not vacuous)
    b1 = expand_fuzzy_terms(idx, queries, max_edits=1,
                            use_trigram=False)
    assert b1.count(("q", "mergeable", 1.0)) >= 2

    # suggest: row-identical incl. the duplicated suggestion rows
    cols = ("qid", "suggestion", "distance", "df", "rank")
    for e in (1, 2):
        brute = sorted(tuple(r[c] for c in cols) for r in
                       suggest_terms(idx, queries, max_edits=e, n=8,
                                     use_trigram=False).collect())
        tri = sorted(tuple(r[c] for c in cols) for r in
                     suggest_terms(idx, queries, max_edits=e, n=8,
                                   use_trigram=True).collect())
        assert tri == brute, (e, tri, brute)
