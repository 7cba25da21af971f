"""ES categorize_text + ip_prefix aggs (engine/pipeline/textstats.py,
curation.py): template collapse semantics and prefix bit math, each
against a pure-Python reference."""

import pytest
from pyspark.sql import functions as F

from engine.pipeline.curation import (IP_MIX, ip_prefix_agg, with_ip32)
from engine.pipeline.textstats import categorize_text


def test_categorize_collapses_numeric_variants(spark):
    msgs = ([f"login ok user {i} session {i * 7}" for i in range(40)]
            + [f"login failed user {i}" for i in range(25)]
            + [f"disk usage {i}% warning" for i in range(10)]
            + ["heartbeat"] * 5)
    df = spark.createDataFrame([(m,) for m in msgs], "text string")
    out = {r["category"]: (r["n_docs"], r["rank"])
           for r in categorize_text(df, max_tokens=4).collect()}
    # 80 distinct raw messages -> 4 templates, counts preserved
    assert out == {
        "login ok user <num>": (40, 1),
        "login failed user <num>": (25, 2),
        "disk usage <num> warning": (10, 3),
        "heartbeat": (5, 4),
    }


def test_categorize_top_n_and_key_length(spark):
    kinds = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    msgs = [f"{kinds[i % 6]} event code {i}" for i in range(60)]
    df = spark.createDataFrame([(m,) for m in msgs], "text string")
    out = categorize_text(df, max_tokens=2, top_n=3).collect()
    assert len(out) == 3
    # max_tokens=2 keys on the first two normalized tokens only
    assert all(len(r["category"].split(" ")) == 2 for r in out)
    counts = [r["n_docs"] for r in out]
    assert counts == sorted(counts, reverse=True)
    # empty messages drop rather than forming an '' bucket
    df2 = spark.createDataFrame([("",), ("  ",), ("x 1",)],
                                "text string")
    got = categorize_text(df2).collect()
    assert [(r["category"], r["n_docs"]) for r in got] == [("x <num>", 1)]


def _ref_prefix(uid: int, plen: int) -> str:
    ip = (uid * IP_MIX) % (1 << 32)
    net = (ip >> (32 - plen)) << (32 - plen)
    return (f"{(net >> 24) & 255}.{(net >> 16) & 255}."
            f"{(net >> 8) & 255}.{net & 255}/{plen}")


def test_ip_prefix_matches_python_reference(spark):
    rows = [(i, i % 37) for i in range(200)]        # 37 users, repeats
    ev = spark.createDataFrame(rows, "event_id long, user_id long")
    for plen in (8, 16, 24, 32):
        got = {r["prefix"]: (r["n"], r["n_users"])
               for r in ip_prefix_agg(ev, prefix_len=plen).collect()}
        exp: dict = {}
        for _eid, uid in rows:
            p = _ref_prefix(uid, plen)
            n, users = exp.get(p, (0, set()))
            users = users if isinstance(users, set) else set(users)
            users.add(uid)
            exp[p] = (n + 1, users)
        exp = {p: (n, len(u)) for p, (n, u) in exp.items()}
        assert got == exp
    # /32 has one bucket per user; coarser prefixes genuinely merge
    assert len(ip_prefix_agg(ev, prefix_len=32).collect()) == 37
    assert len(ip_prefix_agg(ev, prefix_len=4).collect()) < 37


def test_ip32_is_a_permutation_slice(spark):
    # Knuth multiplier is odd -> the map is injective mod 2^32
    ev = spark.createDataFrame([(i, i) for i in range(500)],
                               "event_id long, user_id long")
    ips = [r["ip32"] for r in with_ip32(ev).collect()]
    assert len(set(ips)) == 500
    assert all(0 <= v < (1 << 32) for v in ips)


# ---------------------------------------------------------------------------
# r5 closing wave: ip_range agg
# ---------------------------------------------------------------------------

def test_ip_range_overlap_and_open_ends(spark):
    from engine.pipeline.curation import ip_range_agg

    rows = [(i, i % 23) for i in range(150)]
    ev = spark.createDataFrame(rows, "event_id long, user_id long")
    ranges = [(None, 1 << 30), (1 << 30, 1 << 31),
              (1 << 31, None),
              (1 << 29, 3 << 30)]          # overlaps its neighbours
    got = {r["key"]: (r["n"], r["n_users"])
           for r in ip_range_agg(ev, ranges).collect()}
    assert len(got) == 4
    for lo, hi in ranges:
        n, users = 0, set()
        for _eid, uid in rows:
            ip = (uid * IP_MIX) % (1 << 32)
            if (lo is None or ip >= lo) and (hi is None or ip < hi):
                n += 1
                users.add(uid)
        def dot(v):
            return ".".join(str((v >> s) & 255) for s in (24, 16, 8, 0))
        key = (f"{dot(lo) if lo is not None else '*'}-"
               f"{dot(hi) if hi is not None else '*'}")
        assert got[key] == (n, len(users)), key
    # the overlapping range double-counts by design: bucket sums
    # exceed the event count (the reason this is NOT a group-by)
    assert sum(n for n, _u in got.values()) > len(rows)


# ---------------------------------------------------------------------------
# r5 closing wave: terms agg missing/other
# ---------------------------------------------------------------------------

def test_terms_agg_missing_and_other(spark):
    from engine.pipeline.textstats import terms_agg_with_other

    rows = [(1, "a"), (2, "a"), (3, "b"), (4, None), (5, None),
            (6, None), (7, "c"), (8, "b"), (9, "a")]
    df = spark.createDataFrame(rows, "id long, f string")
    out = {r["key"]: r for r in
           terms_agg_with_other(df, "f", size=2, missing="(none)")
           .collect()}
    # buckets: a=3, (none)=3, b=2, c=1 — tie a/(none) broken key asc
    assert out["(none)"]["rank"] == 1 and out["(none)"]["n"] == 3
    assert out["a"]["rank"] == 2 and out["a"]["n"] == 3
    assert out["_other_"]["n"] == 3 and out["_other_"]["rank"] is None
    assert set(out) == {"(none)", "a", "_other_"}
    # size beyond cardinality: other bucket is exactly 0
    out2 = {r["key"]: r for r in
            terms_agg_with_other(df, "f", size=10).collect()}
    assert out2["_other_"]["n"] == 0 and len(out2) == 5
