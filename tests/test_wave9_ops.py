"""Wave-9 operators: top_hits aggregation (ES terms + top_hits
sub-agg) and CCNet-style bigram-LM cross-entropy filtering.

(interval_match tests live in tests/test_positions.py beside the
other positional operators.)
"""

import math

import pytest
from pyspark.sql import functions as F

from engine.pipeline.textstats import lm_cross_entropy


# ---------------------------------------------------------------------------
# top_hits_agg
# ---------------------------------------------------------------------------

def test_top_hits_agg_buckets_and_gating(spark, tiny_index):
    """Bucket selection = ES terms-agg order (n_docs desc, value asc);
    per-bucket hits ranked by rounded score; and the per-bucket winner
    is found even when it sits deep in the GLOBAL ranking."""
    from engine.search import score_exhaustive, top_hits_agg

    idx = tiny_index
    # pick two real terms so matches exist
    terms = [r["term"] for r in
             idx.termstats.orderBy(F.desc("df")).limit(2).collect()]
    queries = [("q1", terms), ("q2", terms[:1])]
    out = top_hits_agg(idx, queries, "lang", n_buckets=3,
                       hits_per_bucket=2).collect()
    assert out, "no buckets returned"

    # python replica from the exhaustive scorer + docs table
    qt = [(q, t, 1.0) for q, ts in queries for t in set(ts)]
    scored = {(r["qid"], int(r["doc_id"])): r["score"]
              for r in score_exhaustive(idx, qt, 1 << 31).collect()}
    langs = {int(r["doc_id"]): r["lang"] for r in
             idx.docs.select("doc_id", "lang").collect()}

    def rhu4(x):
        return math.floor(x * 1e4 + 0.5) / 1e4

    by_bucket: dict = {}
    for (qid, d), s in scored.items():
        by_bucket.setdefault((qid, langs[d]), []).append((d, s))
    # expected bucket ranking per qid
    for qid in {q for q, _ in queries}:
        counts = {v: len(ds) for (q, v), ds in by_bucket.items()
                  if q == qid}
        order = sorted(counts, key=lambda v: (-counts[v], v))[:3]
        got_rows = [r for r in out if r["qid"] == qid]
        got_order = [v for _, v in
                     sorted({(r["bucket_rank"], r["value"])
                             for r in got_rows})]
        assert got_order == order, qid
        for v in order:
            exp_hits = sorted(((rhu4(s), -d) for d, s in
                               by_bucket[(qid, v)]), reverse=True)[:2]
            exp_ids = [-nd for _, nd in exp_hits]
            got_ids = [r["doc_id"] for r in
                       sorted((r for r in got_rows if r["value"] == v),
                              key=lambda r: r["hit_rank"])]
            assert got_ids == exp_ids, (qid, v)
            got_n = {r["n_docs"] for r in got_rows if r["value"] == v}
            assert got_n == {counts[v]}


# ---------------------------------------------------------------------------
# lm_cross_entropy
# ---------------------------------------------------------------------------

def _toks(s):
    import re
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _replica(docs, ref_ids, threshold):
    """Pure-python integer-accumulation replica."""
    c_bi: dict = {}
    c_ctx: dict = {}
    vocab = set()
    for did, text in docs:
        ts = _toks(text)
        if did in ref_ids:
            vocab.update(ts)
            for a, b in zip(ts, ts[1:]):
                c_bi[(a, b)] = c_bi.get((a, b), 0) + 1
                c_ctx[a] = c_ctx.get(a, 0) + 1
    V = float(len(vocab) or 1)

    def i6(x):
        return math.floor(x * 1e6 + 0.5)

    out = {}
    for did, text in docs:
        ts = _toks(text)
        if len(ts) < 2:
            out[did] = (0, None, None)
            continue
        s = 0
        m = 0
        for a, b in zip(ts, ts[1:]):
            if (a, b) in c_bi:
                lp = i6(math.log((c_bi[(a, b)] + 1.0) / (c_ctx[a] + V)))
            elif a in c_ctx:
                lp = i6(math.log(1.0 / (c_ctx[a] + V)))
            else:
                lp = i6(math.log(1.0 / V))
            s += lp
            m += 1
        h = -s / (m * 1e6)
        h = math.floor(h * 1e6 + 0.5) / 1e6
        out[did] = (m, h, h <= threshold)
    return out


def test_lm_cross_entropy_matches_replica(spark):
    docs = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the mat again and again"),
        (2, "the dog barked at the cat"),
        (3, "zzz qqq www unseen tokens everywhere"),
        (4, "cat"),                        # <2 tokens → NULL
        (5, ""),
    ]
    ref_ids = {0, 2}
    df = spark.createDataFrame(
        [(d, t, d in ref_ids) for d, t in docs],
        "doc_id long, text string, is_ref boolean")
    got = {int(r["doc_id"]): (int(r["n_bigrams"]), r["cross_entropy"],
                              r["keep"])
           for r in lm_cross_entropy(df, "is_ref", threshold=4.0).collect()}
    exp = _replica(docs, ref_ids, 4.0)
    assert got.keys() == exp.keys()
    for did in exp:
        em, eh, ek = exp[did]
        gm, gh, gk = got[did]
        assert gm == em, did
        if eh is None:
            assert gh is None and gk is None, did
        else:
            assert gh == pytest.approx(eh, abs=2e-6), did
            assert gk == ek, did


def test_lm_cross_entropy_ref_docs_score_lower(spark):
    """In-domain docs (reference-like) must sit below out-of-domain
    gibberish — the property CCNet filtering relies on."""
    ref = [(i, "alpha beta gamma delta alpha beta gamma delta", True)
           for i in range(10)]
    indomain = [(100, "alpha beta gamma delta", False)]
    ood = [(200, "qq ww ee rr tt yy uu ii", False)]
    df = spark.createDataFrame(ref + indomain + ood,
                               "doc_id long, text string, r boolean")
    rows = {int(x["doc_id"]): x["cross_entropy"]
            for x in lm_cross_entropy(df, "r").collect()}
    assert rows[100] < rows[200]
