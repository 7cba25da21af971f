"""Trigram term-dictionary index: candidate pruning for infix /
leading-wildcard dictionary rewrites (the Google Code Search trick,
Cox 2012 "Regular Expression Matching with a Trigram Index" — public
writeup of the technique Zoekt and GitHub code search build on).

Lucene walks a single-node FST term dictionary with an automaton, so
a leading wildcard degrades to a full dictionary walk; the engine's
distributed LIKE scan (engine/search.py:expand_wildcard_terms) has
the same O(|vocabulary|) shape. This sidecar inverts the dictionary
itself: one row per (trigram, term). A pattern's literal runs of ≥3
chars yield trigrams that every matching term MUST contain, so the
candidate set is the intersection of a few trigram posting lists —
O(Σ |terms containing tg|) instead of O(|vocabulary|) — followed by
an exact LIKE verify (the rewrite is therefore EXACT, never
approximate; patterns with no ≥3-char literal run fall back to the
full scan unchanged).

Scale shape: the sidecar is dictionary-sized (Σ (len(term)−2) rows),
written term-range-sorted so the trigram equality predicates push
into parquet row-group pruning; the per-query intersection is one
hash agg (count distinct trigram == n) over the pruned scan; the
verify join is against the broadcast pattern list. Build is resumable
(gated on _SUCCESS like every index stage).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .index_build import _exists, _paths
from .search import Index, QueryTerms, wildcard_to_like

TRIGRAMS_DIRNAME = "term_trigrams"


def _trigrams_path(index_dir: str) -> str:
    return f"{index_dir}/{TRIGRAMS_DIRNAME}"


def build_term_trigrams(spark: SparkSession, index_dir: str) -> dict:
    """Materialize the (trigram, term) sidecar from termstats.
    Terms shorter than 3 chars contain no trigram and are correctly
    absent: no pattern WITH a ≥3-char literal run can match them."""
    out = _trigrams_path(index_dir)
    if _exists(spark, out):
        return {"resumed": True}
    terms = (spark.read.parquet(_paths(index_dir)["termstats"])
             .select("term").where(F.length("term") >= 3))
    tg = (terms
          .select(F.col("term"),
                  F.explode(F.expr(
                      "transform(sequence(1, length(term) - 2),"
                      " i -> substring(term, i, 3))")).alias("tg"))
          .distinct())
    (tg.select("tg", "term").sort("tg")
     .write.mode("overwrite").parquet(out))
    return {"resumed": False}


def literal_trigrams(pattern: str, meta: str = "*?") -> list[str]:
    """Distinct trigrams of the pattern's literal runs (segments
    between wildcards) — the necessary-containment set."""
    runs, cur = [], []
    for ch in pattern:
        if ch in meta:
            if cur:
                runs.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        runs.append("".join(cur))
    out: list[str] = []
    for r in runs:
        for i in range(len(r) - 2):
            t = r[i:i + 3]
            if t not in out:
                out.append(t)
    return out


def _trigram_prune_expand(index: Index,
                          queries: Sequence[tuple[str, str]],
                          extract_fn, fallback_fn,
                          pat_fn, verify_op: str) -> QueryTerms:
    """Shared candidate-pruning core for the wildcard and regexp
    rewrites: per-query trigrams from ``extract_fn`` intersect the
    sidecar (pruned scan + one hash agg), ``pat_fn``-built patterns
    verify with ``verify_op`` (LIKE / RLIKE); trigram-less queries go
    through ``fallback_fn`` (the full dictionary scan) unchanged."""
    spark = index.spark
    trig: list[tuple[str, str]] = []      # (qid, trigram)
    n_tg: dict[str, int] = {}
    fallback: list[tuple[str, str]] = []
    for qid, pat in queries:
        tgs = extract_fn(pat)
        if tgs:
            n_tg[qid] = len(tgs)
            trig.extend((qid, t) for t in tgs)
        else:
            fallback.append((qid, pat))

    out: QueryTerms = []
    if fallback:
        out.extend(fallback_fn(index, fallback))
    if not trig:
        return out

    tgt = (spark.read.parquet(_trigrams_path(index.index_dir))
           .where(F.col("tg").isin(sorted({t for _, t in trig}))))
    qdf = spark.createDataFrame(trig, "qid string, tg string")
    ndf = spark.createDataFrame(list(n_tg.items()),
                                "qid string, n_tg int")
    cand = (tgt.join(F.broadcast(qdf), "tg")
            .groupBy("qid", "term")
            .agg(F.count_distinct("tg").alias("nm"))
            .join(F.broadcast(ndf), "qid")
            .where(F.col("nm") == F.col("n_tg")))
    pats = spark.createDataFrame(
        [(q, pat_fn(p)) for q, p in queries if q in n_tg],
        "qid string, pat string")
    rows = (cand.join(F.broadcast(pats), "qid")
            .where(F.expr(f"term {verify_op} pat"))
            .select("qid", "term").collect())
    out.extend((r["qid"], r["term"], 1.0) for r in rows)
    return out


def expand_wildcard_terms_trigram(index: Index,
                                  queries: Sequence[tuple[str, str]]
                                  ) -> QueryTerms:
    """Exact wildcard rewrite via trigram candidate pruning: terms
    containing ALL of the pattern's literal trigrams (one pruned scan
    + one hash agg) verified with LIKE. Queries without a ≥3-char
    literal run fall back to the full-dictionary scan — the result is
    ALWAYS identical to expand_wildcard_terms (equivalence-tested)."""
    from .search import expand_wildcard_terms

    return _trigram_prune_expand(index, queries, literal_trigrams,
                                 expand_wildcard_terms,
                                 wildcard_to_like, "LIKE")


def wildcard_topk_trigram(index: Index,
                          queries: Sequence[tuple[str, str]],
                          k: int) -> DataFrame:
    """BM25 top-k for wildcard queries via the trigram-pruned rewrite
    (exact; falls back per-query when no literal trigram exists)."""
    from .search import score_exhaustive

    return score_exhaustive(
        index, expand_wildcard_terms_trigram(index, queries), k)


def has_trigrams(index: Index) -> bool:
    """True when the trigram sidecar exists (complete) for the index."""
    return _exists(index.spark, _trigrams_path(index.index_dir))


def fuzzy_piece_grams(qterm: str, max_edits: int,
                      transpositions: bool = False) -> list[list[str]] | None:
    """Pigeonhole filter grams for edit-distance candidate pruning
    (the Ed-Join / q-samples partition signature): split ``qterm``
    into ``max_edits + 1`` contiguous pieces — any term within
    ``max_edits`` edits must contain at least ONE piece unchanged as a
    contiguous substring (≤ max_edits ops over max_edits+1 pieces:
    some piece is untouched, and boundary insertions don't break its
    interior). Returns one trigram AND-group per piece (term must
    contain all of a group's trigrams to contain the piece), or None
    when any piece would be shorter than 3 chars (len < 3·(e+1)) —
    the prune cannot engage and the caller falls back to the full
    dictionary scan for that query. Whenever the prune engages, every
    true candidate has length ≥ len(q) − e ≥ 2e + 3 ≥ 3, so the
    trigram sidecar's ≥3-char floor excludes no candidate.

    ``transpositions=True`` (OSA distance — engine/editdist.py) needs
    ``2·max_edits + 1`` pieces instead: an adjacent swap straddling a
    piece boundary damages TWO pieces with one edit, so e ops damage
    up to 2e pieces and only a 2e+1-way split still guarantees an
    untouched one. The shorter-query fallback threshold moves to
    len < 3·(2e+1) accordingly."""
    k = (2 * max_edits if transpositions else max_edits) + 1
    if len(qterm) < 3 * k:
        return None
    base, rem = divmod(len(qterm), k)
    groups, i = [], 0
    for j in range(k):
        ln = base + (1 if j < rem else 0)
        p = qterm[i:i + ln]
        i += ln
        groups.append([p[m:m + 3] for m in range(len(p) - 2)])
    return groups


def fuzzy_candidate_pairs(index: Index,
                          queries: Sequence[tuple[str, str]],
                          max_edits: int,
                          transpositions: bool = False) -> DataFrame:
    """(qid, qterm, term) candidate pairs — a SUPERSET of the true
    fuzzy matches {(qid, q, t) : lev(t, q) ≤ max_edits} — via the
    trigram sidecar: per query piece, terms containing ALL of the
    piece's trigrams (one pruned sidecar scan + one hash agg), OR'd
    across the query's pieces. Queries too short for the pigeonhole
    (len < 3·(max_edits+1)) fall back to the full dictionary scan
    under the |len| pre-filter, exactly the brute path's shape. The
    caller verifies with the exact Levenshtein, so downstream results
    are ALWAYS identical to the brute scan (equivalence-tested).

    The pigeonhole is CONJOINED with the classic count bound: an edit
    destroys at most 3 positional trigram occurrences, so a distinct
    gram of q vanishes from t only when its last occurrence dies —
    ≤ 3 distinct grams per edit — hence every true candidate shares
    ≥ max(1, g − 3e) of q's g distinct trigrams. Both filters come
    from ONE pruned sidecar scan (the count agg over all of q's
    grams, the piece agg over the pid-tagged subset); the count bound
    is what keeps e=2 candidate sets small when the pieces degrade to
    single trigrams (len 9-11 → 3-char pieces).

    ``transpositions=True`` weakens both filters to stay sound for
    OSA (engine/editdist.py): 2e+1 pieces (a boundary-straddling swap
    damages two), and a swap rewrites two adjacent positions touching
    up to 4 trigram starts, so the count bound becomes g − 4e. The
    superset contract is unchanged — callers verify with the exact
    OSA DP."""
    spark = index.spark
    per_edit = 4 if transpositions else 3
    trig: list[tuple[str, int, str]] = []      # (qid, piece_id, tg)
    n_tg: list[tuple[str, int, int]] = []
    cnt: list[tuple[str, str]] = []            # (qid, tg) — ALL grams
    thr: list[tuple[str, int]] = []            # (qid, count threshold)
    fallback: list[tuple[str, str]] = []
    for qid, q in queries:
        groups = fuzzy_piece_grams(q, max_edits, transpositions)
        if groups is None:
            fallback.append((qid, q))
            continue
        for pid, g in enumerate(groups):
            trig.extend((qid, pid, t) for t in sorted(set(g)))
            n_tg.append((qid, pid, len(set(g))))
        all_g = sorted({q[m:m + 3] for m in range(len(q) - 2)})
        cnt.extend((qid, t) for t in all_g)
        thr.append((qid, max(1, len(all_g) - per_edit * max_edits)))

    qdf = spark.createDataFrame(list(queries), "qid string, qterm string")
    parts: list[DataFrame] = []
    if fallback:
        fdf = spark.createDataFrame(fallback, "qid string, qterm string")
        parts.append(
            index.termstats.select("term")
            .join(F.broadcast(fdf),
                  F.abs(F.length("term") - F.length("qterm"))
                  <= max_edits)
            .select("qid", "qterm", "term"))
    if trig:
        cdf = spark.createDataFrame(cnt, "qid string, tg string")
        matched = (spark.read.parquet(_trigrams_path(index.index_dir))
                   .where(F.col("tg").isin(sorted({t for _, t in cnt})))
                   .join(F.broadcast(cdf), "tg"))
        tdf = spark.createDataFrame(thr, "qid string, thresh int")
        by_count = (matched.groupBy("qid", "term")
                    .agg(F.count_distinct("tg").alias("nm_all"))
                    .join(F.broadcast(tdf), "qid")
                    .where(F.col("nm_all") >= F.col("thresh"))
                    .select("qid", "term"))
        gdf = spark.createDataFrame(trig,
                                    "qid string, pid int, tg string")
        ndf = spark.createDataFrame(n_tg,
                                    "qid string, pid int, n_tg int")
        by_piece = (matched.join(F.broadcast(gdf), ["qid", "tg"])
                    .groupBy("qid", "pid", "term")
                    .agg(F.count_distinct("tg").alias("nm"))
                    .join(F.broadcast(ndf), ["qid", "pid"])
                    .where(F.col("nm") == F.col("n_tg"))
                    .select("qid", "term").distinct())
        cand = (by_piece.join(by_count, ["qid", "term"])
                .join(F.broadcast(qdf), "qid")
                .select("qid", "qterm", "term"))
        parts.append(cand)
    if not parts:
        return spark.createDataFrame(
            [], "qid string, qterm string, term string")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _fuzzy_dist_col(max_edits: int, transpositions: bool):
    """The exact verify predicate for a (term, qterm) candidate pair.
    Plain mode is the JVM levenshtein; OSA mode sandwiches the Python
    DP behind the JVM ``levenshtein <= 2e`` prefilter (osa <= e
    implies lev <= 2e — engine/editdist.py bounds)."""
    if not transpositions:
        return F.levenshtein("term", "qterm") <= max_edits
    from .editdist import osa_udf
    return ((F.levenshtein("term", "qterm") <= 2 * max_edits)
            & (osa_udf("term", "qterm") <= max_edits))


def expand_fuzzy_terms_trigram(index: Index,
                               queries: Sequence[tuple[str, str]],
                               max_edits: int = 1,
                               transpositions: bool = False) -> QueryTerms:
    """Exact fuzzy rewrite via trigram candidate pruning: pigeonhole
    candidates verified with the exact Levenshtein DP (OSA DP when
    ``transpositions`` — the Lucene FuzzyQuery default flavor) —
    always identical to :func:`engine.search.expand_fuzzy_terms`.

    The candidate machinery is keyed by a synthetic PER-PAIR id, not
    the caller's qid: a qid carrying several qterms (two fuzzy
    clauses in one query) must contribute one weighted clause per
    (qterm, matched term) PAIR — the brute path's (and Lucene's
    SHOULD-sum) multiplicity — and the per-qid piece groups /
    count thresholds must never mix grams of different qterms
    (regression: test_fuzzy_trigram_multi_qterm_per_qid)."""
    uq = [(str(i), q) for i, (_, q) in enumerate(queries)]
    cand = fuzzy_candidate_pairs(index, uq, max_edits, transpositions)
    rows = (cand.where(_fuzzy_dist_col(max_edits, transpositions))
            .select("qid", "term").distinct().collect())
    return [(queries[int(r["qid"])][0], r["term"], 1.0)
            for r in sorted(rows, key=lambda r: (int(r["qid"]),
                                                 r["term"]))]


def suggest_terms_trigram(index: Index,
                          queries: Sequence[tuple[str, str]],
                          max_edits: int = 2, n: int = 5,
                          transpositions: bool = False) -> DataFrame:
    """DirectSpellChecker suggestions on trigram-pruned candidates —
    rank-identical to :func:`engine.search.suggest_terms` (same
    distance asc / df desc / term asc window; the prune is exact).
    The df lookup joins the small verified candidate set back to
    termstats instead of scanning it. Internals key on a synthetic
    per-pair id (see :func:`expand_fuzzy_terms_trigram`): the brute
    path emits one candidate row per (qid, qterm, term) triple, so a
    qid with several qterms ranks duplicate suggestions exactly as
    many times as clauses produce them."""
    from pyspark.sql import Window

    spark = index.spark
    uq = [(str(i), q) for i, (_, q) in enumerate(queries)]
    pid_map = spark.createDataFrame(
        [(str(i), qid) for i, (qid, _) in enumerate(queries)],
        "pid string, out_qid string")
    if transpositions:
        from .editdist import osa_udf
        dist = F.when(F.levenshtein("term", "qterm") <= 2 * max_edits,
                      osa_udf("term", "qterm")).otherwise(
                          F.lit(2 * max_edits + 1))
    else:
        dist = F.levenshtein("term", "qterm")
    # materialize the distance ONCE before filtering: Catalyst does
    # not CSE a pandas UDF across Filter and Project, so referencing
    # `dist` in both ran the O(|a|·|b|) OSA DP twice per candidate
    cand = (fuzzy_candidate_pairs(index, uq, max_edits, transpositions)
            .withColumn("_dist", dist)
            .where((F.col("_dist") <= max_edits) & (F.col("_dist") >= 1))
            .select(F.col("qid").alias("pid"),
                    F.col("term").alias("suggestion"),
                    F.col("_dist").cast("int").alias("distance"))
            .distinct())
    cand = (cand.join(F.broadcast(pid_map), "pid")
            .select(F.col("out_qid").alias("qid"), "suggestion",
                    "distance"))
    cand = cand.join(
        index.termstats.select(F.col("term").alias("suggestion"), "df"),
        "suggestion")
    w = Window.partitionBy("qid").orderBy(
        F.asc("distance"), F.desc("df"), F.asc("suggestion"))
    return (cand.select("qid", "suggestion", "distance", "df")
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= n))


def regex_literal_runs(pattern: str) -> list[str]:
    """CONSERVATIVE required-literal runs of an (implicitly anchored)
    regex: every string matching the pattern must contain each
    returned run as a contiguous substring. Sound under-approximation
    rules (fewer runs is always safe — candidates only grow):

    * top-level alternation → no required literals at all;
    * group ``(...)`` / class ``[...]`` contents are skipped entirely;
    * an escape breaks the run (``\\.`` could be extracted, isn't);
    * a quantifier (``* + ? {``) drops the char (or group) it
      quantifies from the run — ``abc*`` only requires ``ab``.
    """
    # top-level alternation: nothing is required
    # cls_pos: 0 = right after '[', 1 = right after '[^'; the char at
    # either position is a literal member even if it is ']' (POSIX /
    # RE2 / Python rule — ADVICE r3: '[^]]abc' leaked run ']abc' and
    # over-pruned to zero candidates).
    depth, esc, in_class, cls_pos = 0, False, False, 0
    for ch in pattern:
        if esc:
            esc = False
            continue
        if ch == "\\":
            esc = True
            continue
        if in_class:
            if cls_pos == 0:
                cls_pos = 1 if ch == "^" else 2
                continue
            if cls_pos == 1:
                cls_pos = 2
                continue
            in_class = ch != "]"
            continue
        if ch == "[":
            in_class = True
            cls_pos = 0
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "|" and depth == 0:
            return []

    runs: list[str] = []
    cur: list[str] = []
    depth, esc, in_class, in_brace = 0, False, False, False
    cls_pos = 0

    def flush() -> None:
        if cur:
            runs.append("".join(cur))
            cur.clear()

    for ch in pattern:
        if esc:
            esc = False
            flush()
            continue
        if ch == "\\":
            esc = True
            continue
        if in_class:
            if cls_pos == 0:            # ']'-first is a literal member
                cls_pos = 1 if ch == "^" else 2
                continue
            if cls_pos == 1:
                cls_pos = 2
                continue
            in_class = ch != "]"
            continue
        if in_brace:
            in_brace = ch != "}"
            continue
        if ch == "[":
            in_class = True
            cls_pos = 0
            flush()
        elif ch == "(":
            depth += 1
            flush()
        elif ch == ")":
            depth -= 1
        elif depth > 0:
            continue
        elif ch == "{":
            in_brace = True
            if cur:                 # quantifier binds the previous char
                cur.pop()
            flush()
        elif ch in "*+?":
            if cur:
                cur.pop()
            flush()
        elif ch in ".^$|":
            flush()
        else:
            cur.append(ch)
    flush()
    return [r for r in runs if r]


def regex_trigrams(pattern: str) -> list[str]:
    """Distinct trigrams of the pattern's required-literal runs."""
    out: list[str] = []
    for r in regex_literal_runs(pattern):
        for i in range(len(r) - 2):
            t = r[i:i + 3]
            if t not in out:
                out.append(t)
    return out


def expand_regexp_terms_trigram(index: Index,
                                queries: Sequence[tuple[str, str]]
                                ) -> QueryTerms:
    """Exact regexp rewrite via trigram candidate pruning (the shared
    core; verify = the anchored RLIKE). Queries whose required-literal
    runs yield no trigram fall back to the full-dictionary scan —
    always identical to expand_regexp_terms."""
    from .search import expand_regexp_terms

    return _trigram_prune_expand(index, queries, regex_trigrams,
                                 expand_regexp_terms,
                                 lambda p: f"^(?:{p})$", "RLIKE")
