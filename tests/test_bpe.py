"""BPE trainer + encoder (engine/pipeline/bpe.py).

Covers: the greedy-leftmost merge fold (python/Catalyst parity incl.
same-symbol runs and boundary non-matches), the incremental driver
trainer against a naive full-recount replica, driver vs distributed
trainer identity, the encode == training-evolution invariant, the
deterministic tie-break, and the documented sequential-vs-priority
semantics divergence on a non-trained merge table.
"""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from engine.pipeline import bpe


# ---------------------------------------------------------------------------
# merge fold
# ---------------------------------------------------------------------------

FOLD_CASES = [
    # (syms, left, right, expected)
    (["a", "b", "a", "b"], "a", "b", ["ab", "ab"]),
    (["a", "a", "a"], "a", "a", ["aa", "a"]),
    (["a", "a", "a", "a"], "a", "a", ["aa", "aa"]),
    (["a", "a", "a", "a", "a"], "a", "a", ["aa", "aa", "a"]),
    (["xa", "b"], "a", "b", ["xa", "b"]),          # boundary: no partial match
    (["a", "bc"], "a", "b", ["a", "bc"]),          # right side must be exact
    (["a"], "a", "b", ["a"]),
    ([], "a", "b", []),
    (["a", "b", "b"], "a", "b", ["ab", "b"]),      # merged ab never re-merges
    (["b", "a", "b"], "a", "b", ["b", "ab"]),
    (["ab", "c", "ab", "c"], "ab", "c", ["abc", "abc"]),
]


def test_merge_pair_py_cases():
    for syms, a, b, want in FOLD_CASES:
        assert bpe.merge_pair_py(syms, a, b) == want, (syms, a, b)


def test_merge_pair_col_matches_python(spark):
    rows = [(bpe.SEP.join(syms),) for syms, _, _, _ in FOLD_CASES if syms]
    df = spark.createDataFrame(rows, "syms string")
    for syms, a, b, want in FOLD_CASES:
        if not syms:
            continue
        got = (df.where(F.col("syms") == bpe.SEP.join(syms))
               .select(bpe.merge_pair_col(F.col("syms"), a, b).alias("m"))
               .collect()[0]["m"])
        assert got.split(bpe.SEP) == want, (syms, a, b)


def test_merge_pair_col_random_parity(spark):
    rng = random.Random(7)
    alphabet = ["a", "b", "c", "ab"]
    cases = [[rng.choice(alphabet) for _ in range(rng.randint(1, 12))]
             for _ in range(60)]
    df = spark.createDataFrame(
        [(i, bpe.SEP.join(c)) for i, c in enumerate(cases)],
        "i int, syms string")
    for a, b in [("a", "b"), ("a", "a"), ("b", "b"), ("a", "ab"),
                 ("ab", "a")]:
        got = {r["i"]: r["m"].split(bpe.SEP) for r in
               df.select("i", bpe.merge_pair_col(F.col("syms"), a, b)
                         .alias("m")).collect()}
        for i, c in enumerate(cases):
            assert got[i] == bpe.merge_pair_py(c, a, b), (c, a, b)


# ---------------------------------------------------------------------------
# trainer: naive replica vs incremental, tie-breaks
# ---------------------------------------------------------------------------

def _train_naive(word_freqs, n_merges, min_count=2, eow=bpe.EOW):
    """Full recount every round — the obviously-correct replica."""
    words = [[bpe.word_to_syms(w, eow), f] for w, f in word_freqs]
    merges = []
    for rank in range(n_merges):
        counts = Counter()
        for syms, freq in words:
            for p in zip(syms, syms[1:]):
                counts[p] += freq
        if not counts:
            break
        (left, right), cnt = min(counts.items(),
                                 key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((rank, left, right, cnt))
        for w in words:
            w[0] = bpe.merge_pair_py(w[0], left, right)
    return merges


CORPUS = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
          ("new", 2), ("wide", 1), ("aaa", 4), ("banana", 2)]


def test_incremental_trainer_matches_naive():
    for n in (1, 5, 12, 40):
        for mc in (1, 2, 5):
            got = bpe.train_bpe_py(CORPUS, n, min_count=mc)
            want = _train_naive(CORPUS, n, min_count=mc)
            assert got == want, (n, mc)


def test_tiebreak_lexicographic():
    # both pairs occur exactly once: (a,b) from 'ab', (a,c) from 'ac';
    # the winner must be the lexicographically smaller pair
    merges = bpe.train_bpe_py([("ab", 1), ("ac", 1)], 1, min_count=1)
    assert merges[0][1:3] == ("a", "b")


def test_min_count_stops_early():
    merges = bpe.train_bpe_py([("ab", 1)], 10, min_count=2)
    assert merges == []
    merges = bpe.train_bpe_py([("ab", 3)], 50, min_count=2)
    # 'a b </w>' sustains exactly two count-3 merges, then stops
    assert [m[3] for m in merges] == [3, 3]


# ---------------------------------------------------------------------------
# driver vs distributed, encode invariant (Spark)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bpe_docs(spark):
    texts = ["low lower lowest newest", "newest widest new wide",
             "banana bandana cabana", "aaa aaaa aa aaa",
             "spark sparks sparking", "low low low newest"]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_driver_equals_spark_path(bpe_docs):
    drv = bpe.bpe_train(bpe_docs, 15, min_count=1, mode="driver") \
             .orderBy("rank").collect()
    spk = bpe.bpe_train(bpe_docs, 15, min_count=1, mode="spark",
                        checkpoint_every=4).orderBy("rank").collect()
    assert [tuple(r) for r in drv] == [tuple(r) for r in spk]
    assert len(drv) == 15


def test_encode_equals_training_evolution(bpe_docs):
    """Sequential rank-order encoding of a training word reproduces
    that word's final training state exactly."""
    n = 12
    merges_df = bpe.bpe_train(bpe_docs, n, min_count=1, mode="driver")
    merges = [(r["left_sym"], r["right_sym"])
              for r in merges_df.orderBy("rank").collect()]
    # replay training on the word table
    wf = {r["word"]: r["freq"]
          for r in bpe.word_frequencies(bpe_docs).collect()}
    state = {w: bpe.word_to_syms(w) for w in wf}
    for a, b in merges:
        state = {w: bpe.merge_pair_py(s, a, b) for w, s in state.items()}
    for w in wf:
        assert bpe.apply_merges_py(bpe.word_to_syms(w), merges) == state[w]
    # and the distributed encoder agrees per doc
    enc = bpe.bpe_encode(bpe_docs, merges_df).orderBy("doc_id").collect()
    docs = bpe_docs.orderBy("doc_id").collect()
    for drow, erow in zip(docs, enc):
        want = [t for w in drow["text"].split() for t in state[w]]
        assert erow["tokens"] == want


def test_encoded_words_end_with_eow(bpe_docs):
    merges = bpe.bpe_train(bpe_docs, 8, min_count=1, mode="driver")
    enc = bpe.bpe_encode(bpe_docs, merges).collect()
    for row in enc:
        assert row["tokens"], row
        assert row["tokens"][-1].endswith(bpe.EOW)


def test_out_of_vocabulary_word_still_encodes(bpe_docs):
    merges = bpe.bpe_train(bpe_docs, 10, min_count=1, mode="driver")
    ranked = [(r["left_sym"], r["right_sym"])
              for r in merges.orderBy("rank").collect()]
    toks = bpe.apply_merges_py(bpe.word_to_syms("zzzq"), ranked)
    assert "".join(toks) == "zzzq" + bpe.EOW    # lossless fallback


# ---------------------------------------------------------------------------
# documented semantics: sequential rank-order vs subword-nmt's
# lowest-rank-present loop
# ---------------------------------------------------------------------------

def _apply_priority(syms, ranks):
    """subword-nmt apply_bpe: repeatedly merge the lowest-rank pair
    present anywhere in the word."""
    cur = list(syms)
    while len(cur) >= 2:
        pairs = set(zip(cur, cur[1:]))
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, best = min(ranked)
        cur = bpe.merge_pair_py(cur, *best)
    return cur


def test_sequential_vs_priority_divergence_case():
    """A merge table where a LATER merge creates an EARLIER merge's
    pair: rank 0 = (a, bc), rank 1 = (b, c). Sequential (the engine's
    pinned semantics) applies rank 0 while 'bc' does not yet exist;
    priority re-visits it. A TRAINED table cannot produce this shape
    (rank-0 sides are single chars by construction), which is why
    encode == training-evolution holds on trained tables."""
    merges = [("a", "bc"), ("b", "c")]
    syms = ["a", "b", "c", bpe.EOW]
    assert bpe.apply_merges_py(syms, merges) == ["a", "bc", bpe.EOW]
    ranks = {p: i for i, p in enumerate(merges)}
    assert _apply_priority(syms, ranks) == ["abc", bpe.EOW]


def test_sequential_equals_priority_on_trained_table(bpe_docs):
    merges_df = bpe.bpe_train(bpe_docs, 15, min_count=1, mode="driver")
    merges = [(r["left_sym"], r["right_sym"])
              for r in merges_df.orderBy("rank").collect()]
    ranks = {p: i for i, p in enumerate(merges)}
    for w in [r["word"] for r in bpe.word_frequencies(bpe_docs).collect()] \
            + ["lowestest", "bananarama", "zzz"]:
        syms = bpe.word_to_syms(w)
        assert bpe.apply_merges_py(syms, merges) == \
            _apply_priority(syms, ranks), w
