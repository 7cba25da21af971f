"""Training-data pipeline operators: dedup, similarity, text stats,
multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from engine.pipeline import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "completely different content about spark engines"),
        (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (4, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dup_groups(docs):
    out = {r["content_hash"]: (r["n_docs"], r["min_doc_id"])
           for r in dedup.exact_dup_groups(docs).collect()}
    assert (2, 0) in out.values()          # docs 0 and 3
    assert sorted(n for n, _ in out.values()) == [1, 1, 1, 2]


def test_minhash_families_are_distinct(docs):
    """Regression: the 16 hash families must differ (a PySpark lambda
    arity pitfall once made them all equal family 0)."""
    sig = dedup.minhash_signatures(docs).collect()[0]["sig"]
    assert len(set(sig)) > 1


def test_minhash_near_dups(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.minhash_near_dups(docs, threshold=0.5).collect()}
    assert pairs[(0, 3)] == pytest.approx(1.0)   # exact dup
    assert (0, 1) in pairs                        # near dup
    assert all(a < b for a, b in pairs)
    assert not any({a, b} == {0, 2} for a, b in pairs)


def test_simhash_identical_docs_equal(docs):
    out = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert out[0] == out[3]
    assert out[0] != out[2]
    assert all(0 <= v < 2 ** 32 for v in out.values())


def test_ngram_jaccard_consecutive(docs):
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in dedup.ngram_jaccard_consecutive(docs).collect()}
    assert out[(0, 1)] > 0.5
    assert out[(1, 2)] == 0.0


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    row = df.select(dedup.shingles_col(F.col("text"), 3).alias("s")).collect()[0]
    assert row["s"] == []


def test_cosine_topk(spark):
    rows = [(0, [1.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0]), (3, [0.7, 0.7, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.cosine_topk(emb, [0], k=3).collect()
    assert [r["vec_id"] for r in out] == [1, 3, 2]
    assert out[0]["cosine"] == pytest.approx(1.0)
    assert out[1]["cosine"] == pytest.approx(0.7071, abs=1e-3)
    assert out[2]["cosine"] == pytest.approx(0.0, abs=1e-9)


def test_bucketed_ann_prunes(spark):
    rows = [(i, [float(1 if i % 2 else -1)] + [0.0] * 63) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.cosine_topk_bucketed(emb, [1], k=10)
    ids = [r["vec_id"] for r in out.collect()]
    assert set(ids) == {3, 5, 7, 9}  # same sign bucket only, self excluded


def test_quality_scores_hand_computed(spark):
    df = spark.createDataFrame([(0, "the cat!!")], "doc_id long, text string")
    r = textstats.quality_scores(df).collect()[0]
    # tokens: the, cat; stopword ratio 1/2; punct: '!!' → 2/9 chars
    assert r["stopword_ratio"] == pytest.approx(0.5)
    assert r["punct_ratio"] == pytest.approx(2 / 9, abs=1e-6)
    assert r["mean_token_len"] == pytest.approx(3.0)


def test_lang_id(spark):
    df = spark.createDataFrame(
        [(0, "the cat is on the mat"), (1, "der hund ist mit der katze")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["lang_guess"] for r in textstats.lang_id(df).collect()}
    assert out[0] == "en" and out[1] == "de"


def test_token_counts(spark):
    df = spark.createDataFrame([(0, "foo bar-baz  qux")],
                               "doc_id long, text string")
    r = textstats.token_counts(df).collect()[0]
    assert r["n_ws_tokens"] == 3
    assert r["n_alnum_tokens"] == 4
    assert r["n_chars_txt"] == 16


def test_multimodal_plumbing(docs):
    media = multimodal.media_from_docs(docs)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == docs.count()
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[0]["modality"] == "image"
    assert by_id[1]["modality"] == "audio"
    r = by_id[0]
    assert r["width"] is not None and 64 <= r["width"] < 256
    assert r["duration_ms"] is None  # image has no duration
    assert len(r["feature"]) == 8
    import hashlib
    text0 = docs.where("doc_id = 0").collect()[0]["text"]
    assert r["sha"] == hashlib.sha256(text0.encode()).hexdigest()
    assert r["n_bytes"] == len(text0.encode())


def test_ivf_ann_on_separable_clusters(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    # two well-separated clusters in 16d
    for i in range(40):
        center = np.zeros(16)
        center[0 if i < 20 else 8] = 10.0
        v = center + rng.normal(0, 0.1, 16)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    bf = similarity.cosine_topk(emb, [0, 25], k=5)
    ivf = similarity.cosine_topk_ivf(emb, [0, 25], k=5,
                                     n_centroids=4, n_probe=2)
    bfs = {(r["qid"], r["vec_id"]) for r in bf.collect()}
    ivs = {(r["qid"], r["vec_id"]) for r in ivf.collect()}
    # separable clusters → the probed cells contain the true neighbors
    assert len(bfs & ivs) / len(bfs) >= 0.9
    # all results stay within the query's own cluster
    for q, v in ivs:
        assert (v < 20) == (q < 20)


def test_ann_constants_scale_with_n(spark):
    """VERDICT r01: LSH bits and IVF centroid counts must grow with n
    (fixed constants make within-bucket joins quadratic at scale).
    Checks the derivations at two data sizes and that realized bucket
    sizes stay near the target."""
    import numpy as np

    from engine.pipeline.similarity import (
        TARGET_BUCKET_SIZE, derive_n_centroids, derive_signbit_dims,
        signbit_bucket,
    )

    d_small = derive_signbit_dims(10_000, 64)
    d_big = derive_signbit_dims(10_000_000, 64)
    assert len(d_big) > len(d_small)
    # 10M vectors → 2^bits ≈ n / target
    assert 2 ** len(d_big) >= 10_000_000 / TARGET_BUCKET_SIZE
    assert derive_n_centroids(1_000_000) > derive_n_centroids(10_000) >= 16
    # at 10^9 vectors the derived bucket count keeps the expected
    # within-bucket pair join linear-ish: n/2^bits ≈ target, not n/256
    assert 2 ** len(derive_signbit_dims(10 ** 9, 64)) >= 10 ** 9 / TARGET_BUCKET_SIZE

    # realized buckets at two sizes (deterministic pseudo-embeddings)
    def emb_df(n):
        rng = np.random.default_rng(42)
        rows = [(i, rng.standard_normal(64).astype(float).tolist())
                for i in range(n)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    for n in (300, 1200):
        b = signbit_bucket(emb_df(n))  # dims=None → derived
        sizes = [r["c"] for r in
                 b.groupBy("bucket").count().withColumnRenamed("count", "c")
                 .collect()]
        assert max(sizes) <= 6 * max(TARGET_BUCKET_SIZE, n / 2 ** 8)


def test_multiprobe_recall_dominates_single_bucket(spark):
    """Multi-probe (Hamming-1) candidates are a superset of the single
    bucket's, so its recall vs exact cosine top-k is >= single-probe —
    and materially better on quasi-random data."""
    import numpy as np

    from engine.pipeline.similarity import (
        cosine_topk, cosine_topk_bucketed, cosine_topk_multiprobe,
    )

    # clustered embeddings where each cluster sits NEAR one hyperplane
    # (one probe-dim coordinate ≈ 0): neighbors split across that
    # plane's two buckets — the exact failure multi-probe exists for.
    rng = np.random.default_rng(7)
    dims = [0, 4, 8, 12, 16, 20, 24, 28]
    centers = np.where(rng.standard_normal((20, 32)) > 0, 1.0, -1.0)
    for ci in range(20):
        centers[ci, dims[ci % len(dims)]] = 0.0  # unstable hyperplane
    rows = [(i, (centers[i % 20] + 0.2 * rng.standard_normal(32)).tolist())
            for i in range(400)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qids = [0, 1, 2]
    k = 10
    exact = {(r["qid"], r["vec_id"])
             for r in cosine_topk(emb, qids, k).collect()}
    single = {(r["qid"], r["vec_id"])
              for r in cosine_topk_bucketed(emb, qids, k, dims).collect()}
    multi = {(r["qid"], r["vec_id"])
             for r in cosine_topk_multiprobe(emb, qids, k, dims).collect()}
    r_single = len(single & exact) / len(exact)
    r_multi = len(multi & exact) / len(exact)
    assert r_multi >= r_single
    assert r_multi >= 0.9     # Hamming-1 probes recover the split bucket
    assert r_single <= 0.75   # ...which single-probe provably misses


def test_connected_components_chain_and_cliques(spark):
    # chain 1-2-3 (needs >1 propagation round), pair 7-8, isolated 9-10
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (7, 8), (9, 10), (3, 4), (4, 5)],
        "doc_a long, doc_b long")
    out = {(r["doc_id"], r["component"])
           for r in dedup.connected_components(pairs).collect()}
    assert out == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
                   (7, 7), (8, 7), (9, 9), (10, 9)}


def test_connected_components_max_iter_cap(spark):
    # a long path needs ~diameter rounds; with max_iter=1 labels must
    # still be a valid partial propagation (monotone, no crash)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "doc_a long, doc_b long")
    full = {(r["doc_id"], r["component"])
            for r in dedup.connected_components(pairs).collect()}
    assert full == {(i, 1) for i in range(1, 9)}
    partial = dedup.connected_components(pairs, max_iter=1).collect()
    assert all(r["component"] <= r["doc_id"] for r in partial)


def test_pmi_bigrams_hand_computed(spark):
    import math

    # "aa bb" co-occurs exclusively; "cc" is frequent background noise
    docs = spark.createDataFrame(
        [(i, "aa bb cc cc cc cc") for i in range(6)],
        "doc_id long, text string")
    out = textstats.pmi_bigrams(docs, min_count=5, k=3).collect()
    by_rank = {r["rank"]: r for r in out}
    assert by_rank[1]["bigram"] == "aa bb"
    # hand PMI: T_uni=36, T_bi=30, n_ab=6, n_a=6, n_b=6
    expect = math.log((6 / 30) / ((6 / 36) * (6 / 36)))
    assert by_rank[1]["pmi"] == pytest.approx(expect, abs=1e-6)
    assert by_rank[1]["n_ab"] == 6


def test_unigram_logprob_hand_computed(spark):
    import math

    docs = spark.createDataFrame(
        [(0, "aa aa bb"), (1, "bb cc"), (2, "")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           textstats.unigram_logprob(docs).collect()}
    # counts: aa=2, bb=2, cc=1 → T=5, V=3; p(w) = (c+1)/8
    lp = {w: math.log((c + 1) / 8) for w, c in
          [("aa", 2), ("bb", 2), ("cc", 1)]}
    exp0 = (2 * lp["aa"] + lp["bb"]) / 3
    exp1 = (lp["bb"] + lp["cc"]) / 2
    assert out[0]["n_tokens"] == 3
    assert out[0]["mean_logprob"] == pytest.approx(exp0, abs=1e-6)
    assert out[1]["mean_logprob"] == pytest.approx(exp1, abs=1e-6)
    assert out[2]["n_tokens"] == 0 and out[2]["mean_logprob"] is None


def test_source_mix_hand_computed(spark):
    docs = spark.createDataFrame(
        [(0, "a b", "web", "en"), (1, "c", "web", "en"),
         (2, "dd ee", "book", "fr"), (3, "x y z w", "web", "fr")],
        "doc_id long, text string, source string, lang string")
    out = {(r["source"], r["lang"]): r for r in
           textstats.source_mix(docs).collect()}
    web_en = out[("web", "en")]
    assert web_en["n_docs"] == 2 and web_en["n_tokens"] == 3
    assert web_en["doc_share"] == pytest.approx(0.5)
    assert out[("book", "fr")]["mean_chars"] == pytest.approx(5.0)


def test_pq_ann_recall_and_rerank(spark):
    """PQ with exact rerank recovers the true L2 neighbors on
    separable clusters; rerank output carries EXACT (rounded)
    distances, so it must agree with a numpy brute force."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(60):
        center = np.zeros(16)
        center[0 if i < 30 else 8] = 10.0
        v = center + rng.normal(0, 0.1, 16)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    V = {i: np.array(v, dtype=np.float64) for i, v in rows}

    out = similarity.pq_topk(emb, [0, 40], k=5, m=4, n_centroids=8,
                             rerank=20).collect()
    got = {}
    for r in out:
        got.setdefault(r["qid"], []).append((r["rank"], r["vec_id"]))
    for q in (0, 40):
        exact = sorted((float(np.sum((V[q] - V[i]) ** 2)), i)
                       for i in V if i != q)[:5]
        exact_ids = [i for _, i in exact]
        ours = [v for _, v in sorted(got[q])]
        # separable clusters + rerank → exact top-5 recovered in order
        assert ours == exact_ids, (q, ours, exact_ids)

    # determinism: a second run is identical (seedless stride init)
    out2 = similarity.pq_topk(emb, [0, 40], k=5, m=4, n_centroids=8,
                              rerank=20).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_ivfpq_recall_and_determinism(spark):
    """IVF-PQ (residual-encoded IVFADC): on separable clusters the
    probed-cell ADC + exact rerank recovers the true L2 top-k; output
    is deterministic and distances match numpy brute force."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    for i in range(80):
        center = np.zeros(16)
        center[(i % 4) * 4] = 10.0     # 4 well-separated clusters
        v = center + rng.normal(0, 0.1, 16)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # the DF column is float32 — quantize the reference identically
    V = {i: np.array(v, dtype=np.float32).astype(np.float64)
         for i, v in rows}

    out = similarity.ivfpq_topk(emb, [0, 1], k=5, n_ivf=4, n_probe=2,
                                m=4, n_centroids=8, rerank=20).collect()
    got = {}
    for r in out:
        got.setdefault(r["qid"], []).append((r["rank"], r["vec_id"],
                                             r["adist"]))
    import math

    def l2(a, b):
        # same dot-product identity AND half-up rounding as the engine
        # (naive sum((a-b)^2) + banker's round() differ in the last
        # ulp and flip the 6dp boundary)
        d = float(np.dot(a, a) - 2 * np.dot(a, b) + np.dot(b, b))
        return math.floor(d * 1e6 + 0.5) / 1e6

    for q in (0, 1):
        exact = sorted((l2(V[q], V[i]), i) for i in V if i != q)[:5]
        ours = sorted(got[q])
        assert [v for _, v, _ in ours] == [i for _, i in exact], q
        for (_, _, ad), (ed, _) in zip(ours, exact):
            assert ad == pytest.approx(ed, abs=1e-9)

    out2 = similarity.ivfpq_topk(emb, [0, 1], k=5, n_ivf=4, n_probe=2,
                                 m=4, n_centroids=8, rerank=20).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


# ---------------------------------------------------------------------------
# Curation ops (engine/pipeline/curation.py)
# ---------------------------------------------------------------------------

def test_decontaminate_hand_computed(spark):
    """Doc 0 shares its one 3-gram with the eval set → contaminated;
    doc 1 shares nothing; doc 2 is too short for any 3-gram (NULL
    frac, not contaminated)."""
    from engine.pipeline import curation

    train = spark.createDataFrame(
        [(0, "alpha beta gamma delta"),      # grams: a b g, b g d
         (1, "epsilon zeta eta theta"),
         (2, "just two")],
        "doc_id long, text string")
    ev = spark.createDataFrame([(100, "alpha beta gamma")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           curation.decontaminate(train, ev, n=3, threshold=0.5).collect()}
    assert out[0]["n_grams"] == 2 and out[0]["n_hit"] == 1
    assert out[0]["hit_frac"] == pytest.approx(0.5)
    assert out[0]["contaminated"] is True
    assert out[1]["n_hit"] == 0 and out[1]["contaminated"] is False
    assert out[2]["n_grams"] == 0 and out[2]["hit_frac"] is None
    assert out[2]["contaminated"] is False


def test_repetition_scores_hand_computed(spark):
    from engine.pipeline import curation

    rows = [
        (0, "a b a b a"),   # 2-grams: ab ba ab ba → dup 0.5; top 2/4
        (1, "x y z w"),     # all distinct → dup 0, top 1/3
        (2, "solo"),        # no 2-grams → 0.0 by convention
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           curation.repetition_scores(df).collect()}
    assert out[0]["dup_2gram_frac"] == pytest.approx(0.5)
    assert out[0]["top_2gram_frac"] == pytest.approx(0.5)
    # 3-grams of doc0: aba bab aba → 1 - 2/3
    assert out[0]["dup_3gram_frac"] == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert out[1]["dup_2gram_frac"] == 0.0
    assert out[1]["top_2gram_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[2]["dup_2gram_frac"] == 0.0
    assert out[2]["top_2gram_frac"] == 0.0


def test_hash_sample_deterministic_and_stratified(spark):
    """Same input → identical kept set at any parallelism; kept rate
    tracks the per-group target; rate 0 drops the group entirely."""
    from engine.pipeline import curation

    rows = [(i, "en" if i % 3 else "de") for i in range(600)]
    df1 = spark.createDataFrame(rows, "doc_id long, lang string")
    df8 = df1.repartition(8)
    rates = {"en": 0.5, "de": 0.0}
    kept1 = sorted(r["doc_id"] for r in
                   curation.hash_sample(df1, rates).collect())
    kept8 = sorted(r["doc_id"] for r in
                   curation.hash_sample(df8, rates).collect())
    assert kept1 == kept8 and kept1
    langs = {r["grp"] for r in curation.hash_sample(df8, rates).collect()}
    assert langs == {"en"}
    n_en = sum(1 for i, l in rows if l == "en")
    assert abs(len(kept1) / n_en - 0.5) < 0.1  # u is uniform-ish


def test_pii_scrub_hand_computed(spark):
    from engine.pipeline import curation

    rows = [
        (0, "mail me at jo.doe+x@ex-corp.io or 555-123-4567, "
            "host 10.0.0.1 ok"),
        (1, "no pii here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in curation.pii_scrub(df).collect()}
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) \
        == (1, 1, 1)
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) \
        == (0, 0, 0)
    import hashlib
    clean = ("mail me at [EMAIL] or [PHONE], host [IP] ok")
    assert out[0]["clean_hash"] == hashlib.md5(clean.encode()).hexdigest()
    assert out[1]["clean_hash"] == hashlib.md5(b"no pii here").hexdigest()


def test_shared_ngram_report_hand_computed(spark):
    """Docs 0 and 1 share the window 'a b c'; doc 2 repeats a window
    internally only (not shared); doc 3 is too short (NULL frac)."""
    from engine.pipeline import curation

    rows = [
        (0, "a b c x"),        # windows: abc, bcx
        (1, "z a b c"),        # windows: zab, abc
        (2, "q r q r q"),      # windows: qrq, rqr (distinct; not shared)
        (3, "one two"),        # too short for 3-grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           curation.shared_ngram_report(df, n=3).collect()}
    assert (out[0]["n_windows"], out[0]["n_shared"]) == (2, 1)
    assert out[0]["shared_frac"] == pytest.approx(0.5)
    assert (out[1]["n_windows"], out[1]["n_shared"]) == (2, 1)
    assert (out[2]["n_windows"], out[2]["n_shared"]) == (2, 0)
    assert out[3]["n_windows"] == 0 and out[3]["shared_frac"] is None


def test_pack_sequences_hand_computed(spark):
    """Concatenate-and-split packing: offsets are exclusive cumsums in
    doc_id order per group; a doc straddling a budget boundary spans
    both sequences; zero-token docs occupy one sequence."""
    from engine.pipeline import curation

    rows = [
        (0, "en", "t " * 3),   # 3 toks: [0,3) → seq 0
        (1, "en", "t " * 4),   # [3,7) → seqs 0-1 (budget 5)
        (2, "en", ""),         # zero tokens at 7 → seq 1
        (3, "en", "t " * 5),   # [7,12) → seqs 1-2
        (4, "de", "t " * 2),   # separate group restarts at 0
    ]
    df = spark.createDataFrame([(i, g, t.strip()) for i, g, t in rows],
                               "doc_id long, lang string, text string")
    out = {r["doc_id"]: r for r in
           curation.pack_sequences(df, budget=5).collect()}
    assert (out[0]["tok_start"], out[0]["seq_start"], out[0]["seq_end"]) \
        == (0, 0, 0)
    assert (out[1]["tok_start"], out[1]["seq_start"], out[1]["seq_end"]) \
        == (3, 0, 1)
    assert out[1]["n_seqs"] == 2
    assert (out[2]["tok_start"], out[2]["n_tok"], out[2]["seq_start"],
            out[2]["seq_end"]) == (7, 0, 1, 1)
    assert (out[3]["tok_start"], out[3]["seq_start"], out[3]["seq_end"]) \
        == (7, 1, 2)
    assert (out[4]["grp"], out[4]["tok_start"], out[4]["seq_start"]) \
        == ("de", 0, 0)


def test_pack_sequences_parallelism_invariant(spark):
    from engine.pipeline import curation

    rows = [(i, "en", "w " * (i % 7 + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    a = sorted(map(tuple, curation.pack_sequences(df, 16).collect()))
    b = sorted(map(tuple,
                   curation.pack_sequences(df.repartition(8), 16).collect()))
    assert a == b


def test_url_stats_and_domain_filter(spark):
    """URL extraction, domain summary, and blocklist filtering —
    hand-computed."""
    from engine.pipeline import curation

    rows = [(0, "see http://a.com/x and https://b.org/y http://a.com/z"),
            (1, "no urls here"),
            (2, "tail https://c.net end")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    st = {r["doc_id"]: (r["n_urls"], r["domains"])
          for r in curation.url_stats(docs).collect()}
    assert st[0] == (3, "a.com,b.org")
    assert st[1] == (0, "")
    assert st[2] == (1, "c.net")
    kept = sorted(r["doc_id"] for r in
                  curation.domain_filter(docs, ["a.com"]).collect())
    assert kept == [1, 2]
    # blocklist domain that appears nowhere is a no-op
    assert curation.domain_filter(docs, ["zz.example"]).count() == 3


def test_curation_filter_hand_computed(spark):
    """Composite keep/drop filter: each rule fires on its crafted doc;
    the clean doc is kept with an empty reason list."""
    rows = [
        (0, "the cat is on the mat with a dog and it is fine here now"),
        (1, "hi"),                                         # too_short
        (2, "spam spam spam spam spam spam"),              # repetitive
        (3, "der hund ist mit der katze auf dem tisch und so weiter"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["keep"], r["reasons"])
           for r in textstats.curation_filter(docs).collect()}
    assert out[0] == (True, "")
    assert out[1][0] is False and "too_short" in out[1][1]
    assert out[2][0] is False and "repetitive" in out[2][1]
    assert out[3] == (False, "wrong_lang")


def test_media_header_parsing_real_formats(spark):
    """parse_media_header extracts REAL dimensions/durations from
    spec-constructed PNG / GIF / BMP / WAV payloads through the full
    Spark mapInPandas path (no codec libs involved)."""
    import struct

    png = (b"\x89PNG\r\n\x1a\n"
           + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00"
           + b"\x00\x00\x00\x00")
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
    bmp = (b"BM" + b"\x00" * 16 + struct.pack("<ii", 128, -256)
           + b"\x00" * 8)
    # WAV: 2 bytes/sample mono 8kHz → byte_rate 16000; 32000 data bytes
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 36 + 32000) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", 32000))
    rows = [(0, "image", bytearray(png), "image/png"),
            (1, "image", bytearray(gif), "image/gif"),
            (2, "image", bytearray(bmp), "image/bmp"),
            (3, "audio", bytearray(wav), "audio/wav"),
            (4, "image", bytearray(b"not a container"), "octet")]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in
           multimodal.extract_features(media).collect()}
    assert (out[0]["width"], out[0]["height"]) == (640, 480)
    assert (out[1]["width"], out[1]["height"]) == (320, 200)
    assert (out[2]["width"], out[2]["height"]) == (128, 256)
    assert out[3]["duration_ms"] == 2000 and out[3]["width"] is None
    # unknown magic falls back to the deterministic stub (non-null dims)
    assert out[4]["width"] is not None
    import hashlib
    assert out[0]["sha"] == hashlib.sha256(png).hexdigest()


def test_media_header_parsing_jpeg(spark):
    """JPEG SOF marker walk: baseline (SOF0) and progressive (SOF2)
    spec-constructed streams yield real dimensions; a truncated stream
    (SOS before any SOF) yields null dims without falling back to the
    stub."""
    import struct

    app0 = (b"\xff\xe0" + struct.pack(">H", 16)
            + b"JFIF\x00" + b"\x00" * 9)          # 16-byte APP0 segment
    sof = lambda m, h, w: (bytes([0xFF, m])       # noqa: E731
                           + struct.pack(">H", 17) + b"\x08"
                           + struct.pack(">HH", h, w)
                           + b"\x03" + b"\x00" * 9)
    base = b"\xff\xd8" + app0 + sof(0xC0, 480, 640)
    prog = b"\xff\xd8" + app0 + sof(0xC2, 1080, 1920)
    # DHT (C4) must be skipped, not mistaken for a SOF
    dht = b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"
    with_dht = b"\xff\xd8" + dht + sof(0xC0, 10, 20)
    trunc = b"\xff\xd8" + app0 + b"\xff\xda" + struct.pack(">H", 4)
    rows = [(0, "image", bytearray(base), "image/jpeg"),
            (1, "image", bytearray(prog), "image/jpeg"),
            (2, "image", bytearray(with_dht), "image/jpeg"),
            (3, "image", bytearray(trunc), "image/jpeg")]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in
           multimodal.extract_features(media).collect()}
    assert (out[0]["width"], out[0]["height"]) == (640, 480)
    assert (out[1]["width"], out[1]["height"]) == (1920, 1080)
    assert (out[2]["width"], out[2]["height"]) == (20, 10)
    assert out[3]["width"] is None and out[3]["height"] is None


def test_resize_plan_and_sample_frames(spark, docs):
    """Resize geometry (aspect-preserving, never upscaling) and the
    frame-sampling fan-out layout — hand-checked."""
    feats = multimodal.extract_features(multimodal.media_from_docs(docs))
    rp = {r["media_id"]: r for r in
          multimodal.resize_plan(feats, max_side=100).collect()}
    for r in rp.values():
        w, h, nw, nh = r["width"], r["height"], r["new_w"], r["new_h"]
        assert max(nw, nh) <= 100 or not r["scaled"]
        if r["scaled"]:
            s = 100 / max(w, h)
            import math
            assert nw == math.floor(w * s + 0.5)
            assert nh == math.floor(h * s + 0.5)
        else:
            assert (nw, nh) == (w, h) and max(w, h) <= 100
    fr = multimodal.sample_frames(feats, every_ms=10_000).collect()
    durs = {r["media_id"]: r["duration_ms"] for r in feats.collect()
            if r["duration_ms"] is not None}
    got = {}
    for r in fr:
        got.setdefault(r["media_id"], []).append(r["t_ms"])
        assert r["t_ms"] == r["frame_idx"] * 10_000
    assert set(got) == set(durs)
    for mid, ts in got.items():
        assert ts == list(range(0, durs[mid] + 1, 10_000))


def test_rocchio_feedback_matches_numpy_replica(spark):
    """Rocchio vector PRF: exact pipeline replica in numpy (rounded
    pilot → 9dp centroid → q' → rounded final rank) must agree."""
    import math

    import numpy as np

    rng = np.random.default_rng(23)
    rows = []
    for i in range(50):
        center = np.zeros(8)
        center[0 if i < 25 else 4] = 5.0
        v = center + rng.normal(0, 0.2, 8)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    V = {i: np.array(v, dtype=np.float32).astype(np.float64)
         for i, v in rows}

    def r(x, p):
        return math.floor(x * 10 ** p + 0.5) / 10 ** p

    def cos(a, b):
        return float(np.dot(a, b)) / (math.sqrt(float(np.dot(a, a)))
                                      * math.sqrt(float(np.dot(b, b))))

    out = similarity.rocchio_topk(emb, [0], k=8, fb_k=5).collect()
    got = [(x["vec_id"], x["cosine"]) for x in sorted(out, key=lambda x: x["rank"])]

    # numpy replica
    pil = sorted(((-r(cos(V[0], V[i]), 4), i) for i in V if i != 0))[:5]
    fb = [i for _, i in pil]
    cent = np.array([r(float(np.mean([V[i][d] for i in fb])), 9)
                     for d in range(8)])
    q2 = 1.0 * V[0] + 0.75 * cent
    want = sorted(((-r(cos(q2, V[i]), 4), i) for i in V if i != 0))[:8]
    assert got == [(i, -c) for c, i in want]
    # feedback keeps the query in its own cluster
    assert all(i < 25 for i, _ in got)
    out2 = similarity.rocchio_topk(emb, [0], k=8, fb_k=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_ngram_counts_hand_computed(spark):
    """Bigram count table with pruning — hand-checked (stopwords kept,
    cross-doc counts summed, singletons pruned)."""
    rows = [(0, "the cat sat"), (1, "the cat ran"), (2, "a dog sat")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["ngram"]: r["count"] for r in
           textstats.ngram_counts(df, n=2, min_count=2).collect()}
    assert out == {"the cat": 2}
    out1 = {r["ngram"]: r["count"] for r in
            textstats.ngram_counts(df, n=2, min_count=1).collect()}
    assert out1["cat sat"] == 1 and out1["a dog"] == 1
    assert sum(out1.values()) == 6  # 2 bigrams per 3-token doc


def test_multiprobe_radius_recall_dominance(spark):
    """Recall is monotone in max_flips (candidate superset): H<=2
    finds at least every hit H<=1 finds, and both at least the
    own-bucket variant; all subsets of the exact top-k."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    x = rng.normal(size=(600, 16)).astype("float32")
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(600, dtype=np.int64),
                      "embedding": list(x)}))
    qids = [0, 123, 456]
    dims = [0, 2, 4, 6, 8, 10]
    exact = {(r["qid"], r["vec_id"]) for r in
             similarity.cosine_topk(emb, qids, 10).collect()}
    h1 = {(r["qid"], r["vec_id"]) for r in
          similarity.cosine_topk_multiprobe(emb, qids, 10, dims=dims,
                                            max_flips=1).collect()}
    h2 = {(r["qid"], r["vec_id"]) for r in
          similarity.cosine_topk_multiprobe(emb, qids, 10, dims=dims,
                                            max_flips=2).collect()}
    assert (h1 & exact) <= (h2 & exact)
    assert len(h2 & exact) >= len(h1 & exact)
    assert len(h2 & exact) > 0


def test_semdedup_pairs_and_keep(spark):
    """SemDeDup (k-means-cell-scoped semantic dedup): with ONE cell the
    pair table equals the numpy all-pairs rounded-cosine ≥ τ truth and
    the keep filter drops exactly the vectors with a lower-id
    duplicate; with 2 cells the pair table is a subset of that truth
    (cell scoping only removes pairs, never invents them) and a planted
    same-cluster near-duplicate is still caught."""
    import math

    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(12):
        center = np.zeros(16)
        center[(i % 2) * 8] = 10.0      # two separated clusters
        v = center + rng.normal(0, 0.5, 16)
        rows.append((i, [float(x) for x in v]))
    rows.append((12, [float(x * 1.001) for x in rows[0][1]]))  # near-dup of 0
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    V = {i: np.array(v, dtype=np.float32).astype(np.float64)
         for i, v in rows}

    def rcos(a, b):
        c = float(np.dot(a, b)
                  / (math.sqrt(np.dot(a, a)) * math.sqrt(np.dot(b, b))))
        return math.floor(c * 1e4 + 0.5) / 1e4

    tau = 0.9
    want = {(a, b) for a in V for b in V
            if a < b and rcos(V[a], V[b]) >= tau}
    got = {(r["vec_a"], r["vec_b"]) for r in
           similarity.semantic_near_dups(emb, tau, n_centroids=1).collect()}
    assert got == want and (0, 12) in got
    keep = {r["vec_id"] for r in
            similarity.semdedup_keep(emb, tau, n_centroids=1).collect()}
    assert keep == set(V) - {b for _, b in want}
    assert 12 not in keep and 0 in keep

    got2 = {(r["vec_a"], r["vec_b"]) for r in
            similarity.semantic_near_dups(emb, tau, n_centroids=2).collect()}
    assert got2 <= want and (0, 12) in got2


def test_minhash_transient_mode_equivalent_and_leak_free(docs):
    """persist='transient' must return the identical pair set while
    leaving NO persisted signature blocks behind (the gate entries'
    mode: localCheckpoint the pair-sized result, unpersist the big
    signature cache before returning)."""
    base = {(r["doc_a"], r["doc_b"]): round(r["jaccard"], 6)
            for r in dedup.minhash_near_dups(
                docs, threshold=0.5).collect()}
    out = dedup.minhash_near_dups(docs, threshold=0.5,
                                  persist="transient")
    got = {(r["doc_a"], r["doc_b"]): round(r["jaccard"], 6)
           for r in out.collect()}
    assert got == base
    # the signature cache must already be unpersisted
    assert not out._minhash_sigs.storageLevel.useMemory
    assert not out._minhash_sigs.storageLevel.useDisk
    kept = dedup.drop_near_dups(docs, threshold=0.5,
                                persist="transient")
    base_kept = dedup.drop_near_dups(docs, threshold=0.5)
    assert ({r["doc_id"] for r in kept.collect()}
            == {r["doc_id"] for r in base_kept.collect()})
