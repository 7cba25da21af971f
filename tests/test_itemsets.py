"""ES frequent_item_sets (engine/pipeline/itemsets.py): Apriori
lattice vs a brute-force reference, closedness semantics on a fixture
BUILT to make the equal-support prune bite, and threshold behavior."""

import math
from itertools import combinations

import pytest

from engine.pipeline.itemsets import frequent_item_sets


def _brute(docsets, min_support, sizes=(1, 2, 3)):
    """All frequent itemsets with supports, by direct enumeration."""
    n = len(docsets)
    ms = max(int(math.ceil(min_support * n)), 1)
    items = sorted({i for s in docsets for i in s})
    out = {}
    for k in sizes:
        for c in combinations(items, k):
            sup = sum(1 for s in docsets if set(c) <= s)
            if sup >= ms:
                out[c] = sup
    return out, ms


def _closed(freq):
    """Reference closedness within the mined universe (≤3)."""
    keep = {}
    for c, sup in freq.items():
        sups = [s for c2, s in freq.items()
                if len(c2) == len(c) + 1 and set(c) < set(c2)]
        if not any(s == sup for s in sups):
            keep[c] = sup
    return keep


def _run(spark, docsets, **kw):
    rows = [(" ".join(sorted(s)),) for s in docsets]
    df = spark.createDataFrame(rows, "text string")
    return {(r["items"], r["set_size"]): r["support"]
            for r in frequent_item_sets(df, **kw).collect()}


def test_matches_brute_force_on_random_sets(spark):
    import random

    rng = random.Random(11)
    universe = [f"w{i}" for i in range(12)]
    docsets = [set(rng.sample(universe, rng.randint(2, 8)))
               for _ in range(80)]
    got = _run(spark, docsets, min_support=0.25, min_set_size=2,
               max_set_size=3, top_n=10_000)
    freq, _ = _brute(docsets, 0.25)
    want = {(" ".join(c), len(c)): s
            for c, s in _closed(freq).items() if len(c) >= 2}
    # the engine reports sets of size 2..3; brute closedness for
    # size-3 considers no size-4 supersets — same bounded universe
    assert got == want


def test_closedness_prunes_equal_support_subset(spark):
    # {a,b} appears ONLY ever alongside c -> support(a,b) ==
    # support(a,b,c) and the pair must be pruned as non-closed;
    # {d,e} appears with AND without f -> stays closed
    docsets = ([{"a", "b", "c"}] * 6
               + [{"d", "e", "f"}] * 4 + [{"d", "e"}] * 3
               + [{"a", "c"}] * 2)
    got = _run(spark, docsets, min_support=0.2, min_set_size=2,
               max_set_size=3, top_n=100)
    assert ("a b c", 3) in got and got[("a b c", 3)] == 6
    assert ("a b", 2) not in got            # non-closed: pruned
    assert ("d e", 2) in got and got[("d e", 2)] == 7
    assert ("d e f", 3) in got and got[("d e f", 3)] == 4
    # closed pair with support distinct from its superset survives
    assert ("a c", 2) in got and got[("a c", 2)] == 8


def test_support_threshold_and_rank_cut(spark):
    docsets = ([{"x", "y"}] * 10 + [{"x", "z"}] * 6 + [{"y", "z"}] * 2)
    got = _run(spark, docsets, min_support=0.3, min_set_size=2,
               max_set_size=3, top_n=100)
    assert got == {("x y", 2): 10, ("x z", 2): 6}   # y,z below 0.3·18
    cut = _run(spark, docsets, min_support=0.3, min_set_size=2,
               max_set_size=3, top_n=1)
    assert cut == {("x y", 2): 10}                  # rank cut bites


def test_empty_and_degenerate_inputs(spark):
    assert _run(spark, [{"solo"}] * 5, min_support=0.5,
                min_set_size=2, max_set_size=3, top_n=10) == {}
    # nothing frequent at an impossible threshold
    assert _run(spark, [{"a", "b"}, {"c", "d"}], min_support=0.99,
                min_set_size=2, max_set_size=3, top_n=10) == {}
