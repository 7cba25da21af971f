"""DSIR importance resampling (engine/pipeline/curation.py:
dsir_weights / dsir_sample) — numpy replica + semantic checks."""

import hashlib
import math

from engine.pipeline.curation import dsir_sample, dsir_weights

B = 10_000


def _grams(text):
    toks = [t for t in
            __import__("re").split(r"[^a-z0-9]+", text.lower()) if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(g):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B


def _replica_weights(raw_texts, target_texts, alpha=1.0):
    cq, cp = {}, {}
    per_doc = {}
    for i, t in raw_texts:
        for g in _grams(t):
            b = _bucket(g)
            cq[b] = cq.get(b, 0) + 1
            per_doc.setdefault(i, {})
            per_doc[i][b] = per_doc[i].get(b, 0) + 1
    for t in target_texts:
        for g in _grams(t):
            b = _bucket(g)
            cp[b] = cp.get(b, 0) + 1
    tq, tp = sum(cq.values()), sum(cp.values())
    out = {}
    for i, bs in per_doc.items():
        s = sum(c * (math.log((cp.get(b, 0) + alpha) / (tp + alpha * B))
                     - math.log((cq[b] + alpha) / (tq + alpha * B)))
                for b, c in bs.items())
        out[i] = (sum(bs.values()), s)
    return out


def test_dsir_weights_match_numpy_replica(spark):
    # equal token counts: DSIR log-weights are unnormalized
    # log-likelihood ratios, so length differences dominate topical
    # ones — the semantic comparison below is only meaningful between
    # docs with the same feature count
    raw = [(0, "the quick brown fox jumps over lazy dog"),
           (1, "spark shuffles hash partitions across executors at scale"),
           (2, "the quick red fox runs past sleepy dog"),
           (3, "catalyst optimizes logical plans into physical query trees")]
    tgt = ["a quick clever fox and a lazy dog in the field",
           "foxes and dogs play quick games"]
    docs = spark.createDataFrame(raw, "doc_id long, text string")
    target = spark.createDataFrame([(100 + i, t) for i, t in enumerate(tgt)],
                                   "doc_id long, text string")
    got = {r["doc_id"]: (r["n_feats"], r["logw"])
           for r in dsir_weights(docs, target).collect()}
    want = _replica_weights(raw, tgt)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) < 1e-9
    # semantic: fox/dog docs (0, 2) outscore the spark-jargon docs
    assert min(got[0][1], got[2][1]) > max(got[1][1], got[3][1])


def test_dsir_sample_deterministic_topk(spark):
    rows = [(i, ("fox dog quick " * (i % 5 + 1)) if i % 2 == 0
             else ("shuffle partition executor " * (i % 3 + 1)))
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(900, "quick fox lazy dog")], "doc_id long, text string")
    a = dsir_sample(docs, target, k=10).collect()
    b = dsir_sample(docs, target, k=10).collect()
    key = lambda rs: [(r["doc_id"], r["key"], r["rank"]) for r in
                      sorted(rs, key=lambda r: r["rank"])]
    assert key(a) == key(b)
    assert len(a) == 10
    assert [r["rank"] for r in sorted(a, key=lambda r: r["rank"])] == \
        list(range(1, 11))
    # keys actually ordered desc
    ks = [r["key"] for r in sorted(a, key=lambda r: r["rank"])]
    assert ks == sorted(ks, reverse=True)
