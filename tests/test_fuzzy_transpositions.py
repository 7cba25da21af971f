"""OSA (transpositions=true) fuzzy matching — Lucene FuzzyQuery's
default metric (engine/editdist.py): reference values, the
DL <= OSA <= Lev sandwich vs DuckDB, SQL-expressibility of osa<=1
(the r5 oracle recipe), and brute/trigram path equivalence."""

import random

import duckdb
import pytest

from engine.editdist import osa


# ---------------------------------------------------------------------------
# metric reference values & properties
# ---------------------------------------------------------------------------

def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[len(b)]


def test_osa_reference_values():
    assert osa("", "") == 0
    assert osa("", "abc") == 3
    assert osa("abc", "") == 3
    assert osa("abc", "abc") == 0
    assert osa("ab", "ba") == 1            # one swap = ONE edit
    assert osa("abcdef", "abdcef") == 1    # interior swap
    assert osa("kitten", "sitting") == 3   # plain-lev case unchanged
    # the restriction: no substring edited twice — the textbook pair
    # where unrestricted Damerau gives 2 but OSA gives 3
    assert osa("ca", "abc") == 3
    # swap + one more edit
    assert osa("mergeable", "megreable") == 1
    assert osa("mergeable", "megreablz") == 2


def test_osa_sandwich_vs_duckdb():
    """dl_unrestricted <= osa <= lev on random pairs — DuckDB ships
    the unrestricted flavor, pinning that its builtin is NOT this
    metric (it under-counts) while plain levenshtein over-counts."""
    rng = random.Random(42)
    pairs = []
    for _ in range(300):
        n1, n2 = rng.randint(0, 8), rng.randint(0, 8)
        a = "".join(rng.choice("abc") for _ in range(n1))
        b = "".join(rng.choice("abc") for _ in range(n2))
        pairs.append((a, b))
    con = duckdb.connect()
    saw_strict = False
    for a, b in pairs:
        dl, lev = con.execute(
            "select damerau_levenshtein(?, ?), levenshtein(?, ?)",
            [a, b, a, b]).fetchone()
        o = osa(a, b)
        assert dl <= o <= lev, (a, b, dl, o, lev)
        assert o == osa(b, a)
        saw_strict = saw_strict or (dl < o or o < lev)
    assert saw_strict  # the three metrics genuinely separated


def test_osa_le1_sql_expressible():
    """The r5 oracle recipe: osa(a,b) <= 1 is EXACTLY
    levenshtein(a,b) <= 1 OR one adjacent swap — verified against a
    pure-SQL DuckDB predicate over random pairs (list comprehension,
    not a correlated lateral — the CLAUDE.md generate_series rule)."""
    rng = random.Random(7)
    rows = []
    for _ in range(250):
        a = "".join(rng.choice("ab") for _ in range(rng.randint(0, 6)))
        b = "".join(rng.choice("ab") for _ in range(rng.randint(0, 6)))
        rows.append((a, b))
    # guaranteed interesting cases
    rows += [("ab", "ba"), ("abcd", "abdc"), ("ca", "abc"),
             ("trial", "trail"), ("x", "x"), ("", "a")]
    con = duckdb.connect()
    con.execute("create table p(a varchar, b varchar)")
    con.executemany("insert into p values (?, ?)", rows)
    got = con.execute("""
        select a, b,
               levenshtein(a, b) <= 1
               or (length(a) >= 2 and length(a) = length(b)
                   and list_contains(
                       [a[1:i-1] || a[i+1] || a[i] || a[i+2:]
                        for i in generate_series(1, length(a) - 1)],
                       b))
        from p
    """).fetchall()
    for a, b, pred in got:
        assert bool(pred) == (osa(a, b) <= 1), (a, b, pred, osa(a, b))


# ---------------------------------------------------------------------------
# engine paths
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def osa_index(spark, tmp_path_factory):
    """Index whose vocabulary contains adjacent-swap neighbors at
    fallback length (trial/trail), prune-engaged e=1 length
    (mergeable, 9), and prune-engaged e=2 length
    (acknowledgements, 16)."""
    from engine.index_build import build_index
    from engine.search import Index
    from engine.trigram import build_term_trigrams

    docs = ["trial mergeable acknowledgements weight",
            "trail mergeable streams cluster",
            "trial trail margeable acknowledgements",
            "weight cluster streams mergeable"]
    rows = [(f"org/r{i}", f"f{i}.py", "c" * 12, "python", t)
            for i, t in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    path = str(tmp_path_factory.mktemp("osa") / "idx")
    build_index(spark, df, path, n_buckets=2, n_doc_buckets=2)
    build_term_trigrams(spark, path)
    return Index(spark, path)


def test_fuzzy_transpositions_match_set(spark, osa_index):
    """A swap-neighbor matches at e=1 ONLY in transpositions mode,
    and the engine's match set equals the python OSA reference over
    the full vocabulary (brute path)."""
    from engine.search import expand_fuzzy_terms

    queries = [("q1", "megreable"),   # swap of mergeable (len 9)
               ("q2", "trail")]       # swap-neighbor of trial (len 5)
    plain = set(expand_fuzzy_terms(osa_index, queries, max_edits=1,
                                   use_trigram=False))
    with_t = set(expand_fuzzy_terms(osa_index, queries, max_edits=1,
                                    use_trigram=False,
                                    transpositions=True))
    assert ("q1", "mergeable", 1.0) not in plain   # lev = 2
    assert ("q1", "mergeable", 1.0) in with_t      # osa = 1
    assert ("q2", "trial", 1.0) not in plain
    assert ("q2", "trial", 1.0) in with_t
    assert ("q2", "trail", 1.0) in with_t          # exact match too
    vocab = [r["term"] for r in osa_index.termstats.select("term")
             .collect()]
    ref = {(q, t, 1.0) for q, s in queries for t in vocab
           if osa(s, t) <= 1}
    assert with_t == ref


def test_fuzzy_trigram_equivalence_osa(spark, osa_index):
    """Trigram-pruned OSA fuzzy must be IDENTICAL to the brute scan
    across edit budgets, incl. the 2e+1-piece fallback lengths and
    no-match queries."""
    from engine.search import expand_fuzzy_terms

    queries = [("f1", "megreable"),          # e1 prune engages (9)
               ("f2", "trail"),              # fallback (5 < 9)
               ("f3", "acknowledgemetns"),   # swap in a 16-char term
               ("f4", "acknowledgemetnz"),   # swap + sub → osa 2
               ("f5", "zzzzqqqzzzzqqqzz"),   # engages, no matches
               ("f6", "xy")]                 # very short fallback
    for e in (1, 2):
        brute = sorted(expand_fuzzy_terms(
            osa_index, queries, max_edits=e, use_trigram=False,
            transpositions=True))
        tri = sorted(expand_fuzzy_terms(
            osa_index, queries, max_edits=e, use_trigram=True,
            transpositions=True))
        assert tri == brute, (e, tri, brute)
    hit = expand_fuzzy_terms(osa_index, queries, max_edits=1,
                             use_trigram=True, transpositions=True)
    assert ("f3", "acknowledgements", 1.0) in hit  # through the prune
    e2 = expand_fuzzy_terms(osa_index, queries, max_edits=2,
                            use_trigram=True, transpositions=True)
    assert ("f4", "acknowledgements", 1.0) in e2


def test_suggest_transpositions_rank_identity(spark, osa_index):
    """suggest_terms in OSA mode: pruned path row-identical to brute,
    distances are OSA (swap-neighbor at distance 1), exact matches
    still excluded."""
    from engine.search import suggest_terms

    queries = [("s1", "megreable"), ("s2", "trail"),
               ("s3", "acknowledgemetns")]
    cols = ("qid", "suggestion", "distance", "df", "rank")
    for e in (1, 2):
        brute = sorted(tuple(r[c] for c in cols) for r in
                       suggest_terms(osa_index, queries, max_edits=e,
                                     n=5, use_trigram=False,
                                     transpositions=True).collect())
        tri = sorted(tuple(r[c] for c in cols) for r in
                     suggest_terms(osa_index, queries, max_edits=e,
                                   n=5, use_trigram=True,
                                   transpositions=True).collect())
        assert tri == brute, (e, tri, brute)
    got = {(r["qid"], r["suggestion"]): r["distance"] for r in
           suggest_terms(osa_index, queries, max_edits=2, n=5,
                         transpositions=True).collect()}
    assert got[("s1", "mergeable")] == 1       # OSA, not lev 2
    assert got[("s3", "acknowledgements")] == 1
    assert ("s2", "trail") not in got          # exact match excluded
    assert got[("s2", "trial")] == 1


def test_parser_fuzzy_transpositions(spark, osa_index):
    """search_parsed('megreable~') finds the swap-neighbor doc only
    under fuzzy_transpositions=True (the Lucene QueryParser default
    semantics; the engine default stays pinned to plain lev)."""
    from engine.queryparse import search_parsed

    plain = search_parsed(osa_index, "p1", "megreable~", k=10).collect()
    assert plain == []
    hits = search_parsed(osa_index, "p1", "megreable~", k=10,
                         fuzzy_transpositions=True).collect()
    assert len(hits) >= 3  # mergeable appears in 3 docs
