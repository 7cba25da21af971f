"""Round-4 closing wave: percentiles_bucket sibling pipeline agg,
value_count/missing/global aggs, simple_query_string, cross_fields,
span_or-near (engine-complete, r5 window queue). Python replicas plus
the pinned ES contracts for each."""

import datetime as dt
import math

from pyspark.sql import functions as F

from engine import streaming
from engine.analysis import tokenize_texts
from engine.search import value_count_missing_agg


def _r(x, p):
    return math.floor(x * 10 ** p + 0.5) / 10 ** p


def _mk_events(spark):
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    for h, n in enumerate([1, 2, 3, 4, 5]):
        for i in range(n):
            rows.append((base + dt.timedelta(hours=h, minutes=i),
                         "click", 1.0))
    rows += [(base, "view", 1.0), (base + dt.timedelta(minutes=1),
                                   "view", 1.0),
             (base + dt.timedelta(hours=3), "view", 1.0)]
    return spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double")


def test_percentiles_bucket_both_readings(spark):
    out = {r["event_type"]: r.asDict()
           for r in streaming.windowed_percentiles_bucket(
               _mk_events(spark)).collect()}
    # click buckets n = [1,2,3,4,5]: type-7 p25/p50/p75 = 2/3/4;
    # ES nearest-rank ceil(p*n)-1 indexes the same values here
    c = out["click"]
    assert c["n_buckets"] == 5
    assert (c["p25_n"], c["p50_n"], c["p75_n"]) == (2.0, 3.0, 4.0)
    assert (c["p25_nearest_n"], c["p50_nearest_n"],
            c["p75_nearest_n"]) == (2, 3, 4)
    # view buckets n = [2,1] -> sorted [1,2]: the two readings
    # genuinely DIVERGE (interpolation vs nearest-rank) — the reason
    # both columns exist
    v = out["view"]
    assert v["n_buckets"] == 2
    assert (v["p25_n"], v["p50_n"], v["p75_n"]) == (1.25, 1.5, 1.75)
    assert (v["p25_nearest_n"], v["p50_nearest_n"],
            v["p75_nearest_n"]) == (1, 1, 2)


def test_percentiles_bucket_single_bucket_and_collision(spark):
    base = dt.datetime(2026, 1, 1)
    ev = spark.createDataFrame(
        [(base, "solo", 1.0), (base + dt.timedelta(minutes=5),
                               "solo", 1.0)],
        "ts timestamp, event_type string, value double")
    row = streaming.windowed_percentiles_bucket(ev).collect()[0]
    # one bucket of n=2: every percentile of a 1-element series is it
    assert (row["p25_n"], row["p50_n"], row["p75_n"]) == (2, 2, 2)
    assert row["p50_nearest_n"] == 2
    import pytest
    with pytest.raises(ValueError, match="collide"):
        streaming.windowed_percentiles_bucket(ev, percents=(99.0, 99))


def _queries(tiny_index):
    terms = [r["term"] for r in
             tiny_index.termstats.orderBy(F.desc("df"), "term")
             .limit(2).collect()]
    return [("q1", [terms[0]]), ("q2", [terms[1]])]


def test_value_count_missing_and_global(spark, tiny_index):
    queries = _queries(tiny_index)
    rows = tiny_index.docs.select("doc_id", "content").collect()
    toks = tokenize_texts([r["content"] for r in rows])
    terms_of = {r["doc_id"]: set(t) for r, t in zip(rows, toks)}
    all_ids = sorted(terms_of)
    # field present unless doc_id % 3 == 0 (NULL) or % 5 == 0 (row
    # ABSENT from fields entirely) — both must land in `missing`
    fields = spark.createDataFrame(
        [(d, None if d % 3 == 0 else f"g{d % 2}")
         for d in all_ids if d % 5 != 0],
        "doc_id long, grp string")
    got = {r["qid"]: (r["n_docs"], r["value_count"], r["missing"])
           for r in value_count_missing_agg(
               tiny_index, queries, fields, "grp").collect()}

    def expect(ids):
        vc = sum(1 for d in ids if d % 3 != 0 and d % 5 != 0)
        return (len(ids), vc, len(ids) - vc)

    for qid, ts in queries:
        ids = [d for d in all_ids
               if any(t in terms_of[d] for t in ts)]
        assert got[qid] == expect(ids)
        n, vc, miss = got[qid]
        assert vc + miss == n and miss > 0 and vc > 0  # both bite
    assert got["_global"] == expect(all_ids)
    # global escapes the query scope: covers every live doc
    assert got["_global"][0] == len(all_ids)
    # include_global=False drops the row
    per_q = value_count_missing_agg(tiny_index, queries, fields,
                                    "grp", include_global=False)
    assert sorted(r["qid"] for r in per_q.collect()) == ["q1", "q2"]


# ------------------------------------------------------------------
# simple_query_string
# ------------------------------------------------------------------

def _doc_tokens(tiny_index):
    rows = tiny_index.docs.select("doc_id", "content").collect()
    toks = tokenize_texts([r["content"] for r in rows])
    return {r["doc_id"]: t for r, t in zip(rows, toks)}


def _atom_scores(tiny_index, terms):
    """Trusted per-atom (doc -> int64 micro-unit score) from the
    oracle-green scorer: each TERM's scalar score quantized once to
    floor(x*1e6+0.5), then integer-summed — the engine's pinned
    association-free accumulation (ADVICE r4 fix)."""
    from engine.search import score_exhaustive
    if not terms:
        return {}
    qt = [(f"t{i}", t, 1.0)
          for i, t in enumerate(sorted(set(terms)))]
    out = {}
    for r in score_exhaustive(tiny_index, qt, None).collect():
        out[r["doc_id"]] = (out.get(r["doc_id"], 0)
                            + math.floor(r["score"] * 1e6 + 0.5))
    return out


def _run_sqs(tiny_index, s, **kw):
    from engine.queryparse import simple_query_string_topk
    out = simple_query_string_topk(tiny_index, "q", s, 1000, **kw)
    return [(r["doc_id"], r["score"]) for r in out.collect()]


def test_sqs_boolean_tree_matches_replica(spark, tiny_index):
    toks = _doc_tokens(tiny_index)
    terms = [r["term"] for r in
             tiny_index.termstats.orderBy(F.desc("df"), "term")
             .limit(4).collect()]
    a, b, c, d = terms

    def replica(expr_match, scoring_atoms):
        sc = {t: _atom_scores(tiny_index, [t]) for t in terms}
        out = []
        for doc, ts in toks.items():
            ts = set(ts)
            if expr_match(ts):
                s = sum(sc[t].get(doc, 0) for t in scoring_atoms
                        if t in ts)
                out.append((doc, _r(s / 1e6, 4)))
        out.sort(key=lambda r: (-r[1], r[0]))
        return out

    # a | -b  ==  a AND NOT b (MUST_NOT binds to the level, not the |)
    got = _run_sqs(tiny_index, f"{a} | -{b}")
    assert got == replica(lambda ts: a in ts and b not in ts, [a])
    # AND binds tighter than OR: a | b + c
    got = _run_sqs(tiny_index, f"{a} | {b} + {c}")
    assert got == replica(
        lambda ts: a in ts or (b in ts and c in ts), [a, b, c])
    # parens flip it: (a | b) + c
    got = _run_sqs(tiny_index, f"({a} | {b}) + {c}")
    assert got == replica(
        lambda ts: (a in ts or b in ts) and c in ts, [a, b, c])
    # default_operator='and'
    got = _run_sqs(tiny_index, f"{a} {b}", default_operator="and")
    assert got == replica(lambda ts: a in ts and b in ts, [a, b])
    # nested negated group: a -(b c)   [group joined by default OR]
    got = _run_sqs(tiny_index, f"{a} -({b} {c})")
    assert got == replica(
        lambda ts: a in ts and not (b in ts or c in ts), [a])
    # an unmatched OR arm still contributes nothing; d arm works
    got = _run_sqs(tiny_index, f"{d} | zzzznosuchterm")
    assert got == replica(lambda ts: d in ts, [d])


def test_sqs_never_throws_and_degrades(spark, tiny_index):
    junk = ["((", "))", "a) -", '"unterminated', "-", "+", "|",
            "a | | b", "+ -", "~", "~2", "a~x", "(((b", '""',
            "\\", "a\\"]
    for s in junk:
        rows = _run_sqs(tiny_index, s)   # must not raise
        assert isinstance(rows, list)
    # pure negation matches nothing (Lucene BooleanQuery contract)
    t = tiny_index.termstats.orderBy(F.desc("df"), "term") \
        .limit(1).collect()[0]["term"]
    assert _run_sqs(tiny_index, f"-{t}") == []
    # stopword positive + negation: positives vanish -> nothing
    assert _run_sqs(tiny_index, f"the -{t}") == []
    # escaped operator is literal text (analyzer sees 'a|b' -> tokens)
    assert isinstance(_run_sqs(tiny_index, "a\\|b"), list)


def test_sqs_prefix_fuzzy_phrase_and_flags(spark, tiny_index):
    toks = _doc_tokens(tiny_index)
    # pick a term and query its 4-char prefix
    t = sorted({t for ts in toks.values() for t in ts
                if len(t) >= 5})[0]
    pre = t[:4]
    from engine.search import expand_prefix_terms
    exp = [x for _, x, _ in expand_prefix_terms(
        tiny_index, [("q", pre)])]
    got = dict(_run_sqs(tiny_index, f"{pre}*"))
    sc = _atom_scores(tiny_index, exp)
    assert got == {d: _r(s / 1e6, 4) for d, s in sc.items()}
    # PREFIX flag off: '*' becomes literal text -> plain term query
    got_off = dict(_run_sqs(
        tiny_index, f"{pre}*",
        flags={"AND", "OR", "NOT", "PHRASE", "FUZZY", "SLOP",
               "PRECEDENCE"}))
    sc_plain = _atom_scores(tiny_index, [pre])
    assert got_off == {d: _r(s / 1e6, 4) for d, s in sc_plain.items()}
    # fuzzy ~1 == the engine's fuzzy expansion (OSA default)
    from engine.search import expand_fuzzy_terms
    fexp = [x for _, x, _ in expand_fuzzy_terms(
        tiny_index, [("q", t)], max_edits=1, transpositions=True)]
    got = dict(_run_sqs(tiny_index, f"{t}~1"))
    scf = _atom_scores(tiny_index, fexp)
    assert got == {d: _r(s / 1e6, 4) for d, s in scf.items()}
    # phrase gates: pick a real bigram from some doc
    from engine.positions import build_positions
    build_positions(spark, tiny_index.index_dir)
    doc, ts = next((d, ts) for d, ts in toks.items() if len(ts) >= 2)
    bigram = f'"{ts[0]} {ts[1]}"'
    got = dict(_run_sqs(tiny_index, bigram))
    assert doc in got
    matched = {d for d, tt in toks.items()
               if any(tt[i:i + 2] == [ts[0], ts[1]]
                      for i in range(len(tt) - 1))}
    assert set(got) == matched
    # sloppy phrase is a superset of the exact phrase match set
    got_slop = dict(_run_sqs(tiny_index, bigram + "~2"))
    assert set(got) <= set(got_slop)


# ------------------------------------------------------------------
# cross_fields multi_match
# ------------------------------------------------------------------

def _bm25(tf, df, dl, avgdl, n, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf / (tf + k1 * (1 - b + b * dl / avgdl))


def _mk_field_indexes(spark, tmp_path):
    from engine.index_build import build_index
    from engine.search import Index
    titles = ["apple pie", "banana split", "apple tart"]
    bodies = ["apple apple banana filling baked", "banana cream only",
              "cherry base with apple pieces inside"]

    def corpus(texts):
        return spark.createDataFrame(
            [(f"org/r{i}", f"f{i}.py", "c" * 12, "python", t)
             for i, t in enumerate(texts)],
            "repo string, path string, commit string, lang string, "
            "content string")

    pt, pb = str(tmp_path / "xt"), str(tmp_path / "xb")
    build_index(spark, corpus(titles), pt, n_buckets=2, n_doc_buckets=4)
    build_index(spark, corpus(bodies), pb, n_buckets=3, n_doc_buckets=4)
    it, ib = Index(spark, pt), Index(spark, pb)
    id2 = {r["docno"]: r["doc_id"] for r in
           it.docs.select("doc_id", "docno").collect()}
    return it, ib, id2


def test_cross_fields_blended_df_hand_computed(spark, tmp_path):
    from engine.fields import cross_fields_topk, dismax_topk
    it, ib, id2 = _mk_field_indexes(spark, tmp_path)
    n = 3
    # banana: title df 1, body df 2 -> blended df = max = 2; the term's
    # idf is therefore LOWER in the title field than best_fields' own
    # per-field idf — the blend genuinely bites
    out = {r["doc_id"]: r["score"]
           for r in cross_fields_topk({"title": it, "body": ib},
                                      [("q", "banana", 1.0)],
                                      10).collect()}
    d0, d1 = id2["org/r0/f0.py"], id2["org/r1/f1.py"]
    t = {d1: _bm25(1, 2, 2, it.avgdl, n)}           # df blended to 2
    bdy = {d0: _bm25(1, 2, 5, ib.avgdl, n), d1: _bm25(1, 2, 3, ib.avgdl, n)}
    import pytest
    # doc1 matches both fields: per-term max (tie 0); doc0 body-only
    assert out[d1] == pytest.approx(max(t[d1], bdy[d1]), abs=1e-12)
    assert out[d0] == pytest.approx(bdy[d0], abs=1e-12)
    # best_fields with per-field df scores the title hit HIGHER (df 1)
    bf = {r["doc_id"]: r["score"]
          for r in dismax_topk({"title": it, "body": ib},
                               [("q", "title", "banana", 1.0),
                                ("q", "body", "banana", 1.0)],
                               10).collect()}
    assert bf[d1] > out[d1]          # the blend genuinely lowered idf
    # tie_breaker sums the non-max fields per TERM
    out_t = {r["doc_id"]: r["score"]
             for r in cross_fields_topk({"title": it, "body": ib},
                                        [("q", "banana", 1.0)],
                                        10, tie_breaker=0.4).collect()}
    mx, sm = max(t[d1], bdy[d1]), t[d1] + bdy[d1]
    assert out_t[d1] == pytest.approx(mx + 0.4 * (sm - mx), abs=1e-12)
    # multi-term: per-term dismax composed under the bool sum
    out2 = {r["doc_id"]: r["score"]
            for r in cross_fields_topk({"title": it, "body": ib},
                                       [("q", "apple", 1.0),
                                        ("q", "banana", 1.0)],
                                       10).collect()}
    # apple: title df 2, body df 2 -> blend = 2 (no change)
    ap_t = {id2["org/r0/f0.py"]: _bm25(1, 2, 2, it.avgdl, n),
            id2["org/r2/f2.py"]: _bm25(1, 2, 2, it.avgdl, n)}
    ap_b = {id2["org/r0/f0.py"]: _bm25(2, 2, 5, ib.avgdl, n),
            id2["org/r2/f2.py"]: _bm25(1, 2, 5, ib.avgdl, n)}
    want_d0 = max(ap_t[d0], ap_b[d0]) + max(t.get(d0, 0.0), bdy[d0])
    assert out2[d0] == pytest.approx(want_d0, abs=1e-12)


# ------------------------------------------------------------------
# span_or near (SpanNearQuery with a SpanOrQuery clause)
# ------------------------------------------------------------------

def _pos_map(content):
    from engine.analysis import _STOPSET
    toks = tokenize_texts([content], keep_stopwords=True)[0]
    out = {}
    for i, t in enumerate(toks):
        if t in _STOPSET:
            continue
        out.setdefault(t, set()).add(i)
    return out


def _brute_or_near(doc_contents, or_terms, other, slop, ordered):
    an = [tokenize_texts([t])[0] for t in or_terms]
    ots = sorted({t[0] for t in an if t})
    to = tokenize_texts([other])[0][0]
    spans = []
    for doc_id, content in doc_contents.items():
        pm = _pos_map(content)
        union = sorted(set().union(*[pm.get(t, set()) for t in ots]))
        for p in union:
            for q in sorted(pm.get(to, set())):
                if ordered:
                    ok = q > p and q - p - 1 <= slop
                else:
                    ok = q != p and abs(q - p) - 1 <= slop
                if ok:
                    spans.append((doc_id, min(p, q), max(p, q) + 1))
    return sorted(spans)


def test_span_or_near_matches_brute(spark, tiny_index):
    from engine.positions import build_positions, span_or_near_match
    build_positions(spark, tiny_index.index_dir)
    rows = tiny_index.docs.select("doc_id", "content").collect()
    contents = {int(r["doc_id"]): r["content"] for r in rows}
    # three frequent terms: OR over two, near the third
    freq = [r["term"] for r in
            tiny_index.termstats.orderBy(F.desc("df"), "term")
            .limit(3).collect()]
    a, b, c = freq
    for ordered in (True, False):
        got = [(r["doc_id"], r["span_start"], r["span_end"])
               for r in span_or_near_match(
                   tiny_index, [("q", [a, b], c, 3)],
                   ordered=ordered).collect()]
        want = _brute_or_near(contents, [a, b], c, 3, ordered)
        assert sorted(got) == want and want  # genuinely non-empty
    # position-set UNION dedups: duplicating an or-term changes nothing
    g1 = span_or_near_match(tiny_index, [("q", [a, b, a], c, 3)]) \
        .collect()
    g2 = span_or_near_match(tiny_index, [("q", [a, b], c, 3)]).collect()
    assert [tuple(r) for r in g1] == [tuple(r) for r in g2]
    # missing subqueries span nothing; analyzer-dropped or-terms leave
    # the group (stopword 'the' vanishes, group still works)
    assert span_or_near_match(
        tiny_index, [("q", ["zzznope"], c, 3)]).count() == 0
    assert span_or_near_match(
        tiny_index, [("q", [a], "zzznope", 3)]).count() == 0
    g3 = span_or_near_match(tiny_index, [("q", ["the", a, b], c, 3)]) \
        .collect()
    assert [tuple(r) for r in g3] == [tuple(r) for r in g2]


def test_percentiles_bucket_es_docs_example(spark):
    # the ES percentiles_bucket reference-docs example: monthly sales
    # 550 / 60 / 375 -> "25.0": 60, "50.0": 375, "75.0": 550
    base = dt.datetime(2026, 1, 1)
    rows = []
    for h, n in enumerate([550, 60, 375]):
        rows += [(base + dt.timedelta(hours=h, seconds=i), "sales", 1.0)
                 for i in range(n)]
    ev = spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double")
    r = streaming.windowed_percentiles_bucket(ev).collect()[0]
    assert (r["p25_nearest_n"], r["p50_nearest_n"],
            r["p75_nearest_n"]) == (60, 375, 550)


# ------------------------------------------------------------------
# variable_width_histogram
# ------------------------------------------------------------------

def _vwh_replica(values, buckets, iters):
    """Python mirror with the exact expression order of the engine."""
    import collections
    cnt = collections.Counter(values)
    xs = sorted(cnt)
    lo, hi = min(xs), max(xs)
    cents = {i: lo + ((2 * i + 1) / (2.0 * buckets)) * (hi - lo)
             for i in range(buckets)}

    def assign(cs):
        out = {}
        for x in xs:
            out[x] = min(cs, key=lambda k: (abs(x - cs[k]), k))
        return out

    def means(a):
        groups = {}
        for x, k in a.items():
            groups.setdefault(k, []).append(x)
        res = {}
        for k, g in groups.items():
            # DECIMAL(28,9) quantization of x, exact integer weights
            num = sum(round(x * 10**9) * cnt[x] for x in g)
            den = sum(cnt[x] for x in g)
            res[k] = _r((num / 10**9) / den, 9)
        return res

    for _ in range(iters):
        cents = means(assign(cents))
    a = assign(cents)
    rows = []
    for k in sorted(set(a.values())):
        g = [x for x, kk in a.items() if kk == k]
        num = sum(round(x * 10**9) * cnt[x] for x in g)
        den = sum(cnt[x] for x in g)
        rows.append((min(g), _r((num / 10**9) / den, 9), max(g), den))
    rows.sort()
    return [(i, *r) for i, r in enumerate(rows)]


def test_variable_width_histogram_replica_and_contracts(spark):
    import random
    rnd = random.Random(7)
    # tri-modal: three well-separated clumps with duplicates
    values = ([round(rnd.gauss(1.0, 0.05), 3) for _ in range(40)]
              + [round(rnd.gauss(5.0, 0.1), 3) for _ in range(30)]
              + [round(rnd.gauss(9.0, 0.2), 3) for _ in range(30)]
              + [1.0, 1.0, 5.0, 9.0])
    base = dt.datetime(2026, 1, 1)
    ev = spark.createDataFrame(
        [(base, "m", float(v)) for v in values],
        "ts timestamp, event_type string, value double")
    got = [(r["bucket"], r["min_x"], r["key"], r["max_x"],
            r["doc_count"])
           for r in streaming.variable_width_histogram(
               ev, buckets=4, iters=2).collect()]
    want = _vwh_replica(values, 4, 2)
    assert got == want
    # contracts: <= buckets, axis-partitioning, counts sum to n
    assert len(got) <= 4
    for (_, _, _, mx, _), (_, mn, _, _, _) in zip(got, got[1:]):
        assert mx < mn
    assert sum(r[4] for r in got) == len(values)
    # per-series independence: a second series with its own range
    ev2 = ev.union(spark.createDataFrame(
        [(base, "w", float(100 + i)) for i in range(10)],
        "ts timestamp, event_type string, value double"))
    out2 = streaming.variable_width_histogram(ev2, buckets=4, iters=2)
    series = {r["event_type"] for r in out2.collect()}
    assert series == {"m", "w"}
    m_rows = [(r["bucket"], r["min_x"], r["key"], r["max_x"],
               r["doc_count"])
              for r in out2.collect() if r["event_type"] == "m"]
    assert m_rows == want   # untouched by the other series
