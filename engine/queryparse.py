"""Mini query-language parser (Lucene QueryParser analog, SURVEY T9).

The reference exposes Lucene's QueryParser only to ESCAPE user text
(Searcher.java:38-42) — its queries are programmatic term bags. This
module closes the user-facing gap for anyone switching from raw
Lucene: a small, total parser for the familiar syntax, compiled onto
the engine's existing operators (no new execution paths — parsing is
a pure driver-side rewrite).

Supported syntax (one clause per whitespace-separated token):

  term          optional (SHOULD) clause
  +term         required (MUST) clause
  -term         prohibited (MUST_NOT) clause
  "a b c"       exact phrase (MUST; gap positions, stopwords count)
  pre*          prefix rewrite        (dictionary scan → SHOULD terms)
  wild*card, ?  wildcard rewrite      (LIKE dictionary scan)
  term~         fuzzy rewrite         (Levenshtein ≤ 1)
  +pre* / +t~   required expansion: doc must match ≥1 rewritten term
                (gated BEFORE the rank cut, like phrases; the terms
                still score) — Lucene's MUST MultiTermQuery
  -pre* / -t~   prohibited expansion: every rewritten term is banned

Execution semantics (documented, deliberately simple):

* all non-phrase clause text goes through the engine analyzer (a
  clause that analyzes to a stopword/empty vanishes, like Lucene's
  analyzer-dropped clauses);
* expansions (prefix/wildcard/fuzzy) enumerate vocabulary terms and
  join the SHOULD set with weight 1.0 — Lucene's scoring-boolean
  rewrite (CONSTANT_SCORE differences documented as divergence);
* scoring = Σ BM25 over MUST + SHOULD occurrences (boolean_topk);
* every phrase gates the result set via the positional index
  (phrase_match inner join), and its terms also join the SHOULD set
  so they contribute to the score — the plain-BM25 approximation of
  Lucene's phrase scorer (positions weighting documented divergence).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from .analysis import tokenize_texts

# quoted phrase | single token (with optional +/- prefix and ~ suffix)
_CLAUSE_RE = re.compile(r'([+\-]?)"([^"]*)"|([+\-]?)(\S+)')


@dataclass
class ParsedQuery:
    must: list[str] = field(default_factory=list)
    should: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    phrases: list[str] = field(default_factory=list)
    prefixes: list[str] = field(default_factory=list)
    wildcards: list[str] = field(default_factory=list)
    fuzzies: list[str] = field(default_factory=list)
    # signed expansion clauses, (kind, pattern) with kind ∈ {"prefix",
    # "wildcard", "fuzzy"} (ADVICE r2: '+pre*' / '-pre*' previously
    # dropped the sign, inverting a prohibition into a boost):
    #   must_expansions — doc must match ≥1 dictionary-rewritten term
    #     (Lucene's MUST-of-a-MultiTermQuery), enforced as a doc gate;
    #   not_expansions — every rewritten term is prohibited.
    must_expansions: list[tuple[str, str]] = field(default_factory=list)
    not_expansions: list[tuple[str, str]] = field(default_factory=list)


def _analyze_one(text: str, stem: bool, stemmer: str = "porter",
                 ascii_fold: bool = False) -> list[str]:
    return tokenize_texts([text], stem=stem, stemmer=stemmer,
                          ascii_fold=ascii_fold)[0]


def parse_query(s: str, stem: bool = False, stemmer: str = "porter",
                ascii_fold: bool = False) -> ParsedQuery:
    """Parse one query string into clause sets (pure function).
    ``stem``/``stemmer``/``ascii_fold`` must match the target index's
    analyzer (``Index.analyzer_opts()``)."""
    _an = lambda t: _analyze_one(t, stem, stemmer, ascii_fold)  # noqa: E731
    q = ParsedQuery()
    for m in _CLAUSE_RE.finditer(s):
        if m.group(2) is not None:          # quoted phrase
            if m.group(1) == "-":
                raise ValueError("negated phrases are not supported")
            if m.group(2).strip():
                q.phrases.append(m.group(2))
            continue
        sign, tok = m.group(3), m.group(4)

        def _expansion(kind: str, pattern: str) -> None:
            if sign == "+":
                q.must_expansions.append((kind, pattern))
            elif sign == "-":
                q.not_expansions.append((kind, pattern))
            elif kind == "prefix":
                q.prefixes.append(pattern)
            elif kind == "wildcard":
                q.wildcards.append(pattern)
            else:
                q.fuzzies.append(pattern)

        fuzzy = tok.endswith("~")
        if fuzzy:
            tok = tok[:-1]
        is_prefix = bool(re.fullmatch(r"[^*?]+\*", tok))
        is_wild = (not is_prefix) and any(ch in tok for ch in "*?")
        if is_prefix:
            base = _an(tok[:-1])
            if base:
                _expansion("prefix", base[0])
            continue
        if is_wild:
            # analyze the literal runs, keep the metacharacters
            parts = re.split(r"([*?])", tok.lower())
            _expansion("wildcard", "".join(
                p if p in "*?" else (_an(p)[0] if p and _an(p) else "")
                for p in parts))
            continue
        terms = _an(tok)
        if not terms:
            continue                        # analyzer-dropped clause
        if fuzzy:
            _expansion("fuzzy", terms[0])
        else:
            bucket = (q.must if sign == "+"
                      else q.must_not if sign == "-" else q.should)
            bucket.extend(terms)
    return q


def search_parsed(index, qid: str, s: str, k: int,
                  fuzzy_transpositions: bool = False) -> DataFrame:
    """Parse ``s`` and execute it against the index (see module
    docstring for the execution semantics). Returns
    (qid, doc_id, score, rank) like the other ranked query paths.

    ``fuzzy_transpositions=True`` rewrites ``term~`` clauses under the
    OSA metric — Lucene's classic QueryParser builds FuzzyQuery with
    transpositions=true, so that flag is the Lucene-parity mode; the
    False default keeps the repo's pinned plain-Levenshtein oracle
    semantics (engine/editdist.py documents the difference)."""
    from pyspark.sql import functions as F

    from .positions import phrase_match
    from .search import (_matched_postings, boolean_topk, decode_udf,
                         expand_fuzzy_terms, expand_prefix_terms,
                         expand_wildcard_terms)

    def _expand(kind: str, patterns: list[str]) -> list[str]:
        if kind == "fuzzy":
            return [t for _, t, _ in expand_fuzzy_terms(
                index, [(qid, p) for p in patterns],
                transpositions=fuzzy_transpositions)]
        fn = {"prefix": expand_prefix_terms,
              "wildcard": expand_wildcard_terms}[kind]
        return [t for _, t, _ in fn(index, [(qid, p) for p in patterns])]

    def _docs_matching_any(terms: list[str]) -> DataFrame:
        """Distinct doc_ids containing ≥1 of ``terms`` (bucket-pruned
        decode — the gate for a MUST expansion clause)."""
        qt = [(qid, t, 1.0) for t in sorted(set(terms))]
        dec = _matched_postings(index, qt).withColumn(
            "d", decode_udf("blob"))
        return dec.select(F.explode("d.doc_ids").alias("doc_id")) \
            .distinct()

    opts = index.analyzer_opts()
    q = parse_query(s, **opts)
    should = list(q.should)
    if q.prefixes:
        should += _expand("prefix", q.prefixes)
    if q.wildcards:
        should += _expand("wildcard", q.wildcards)
    if q.fuzzies:
        should += _expand("fuzzy", q.fuzzies)
    for p in q.phrases:
        should += _analyze_one(p, **opts)
    # prohibited expansions: every dictionary-rewritten term is banned
    must_not = list(q.must_not)
    for kind, pat in q.not_expansions:
        must_not += _expand(kind, [pat])
    # phrase gating BEFORE the top-k cut (as a doc_filter), so the
    # k-th phrase-matching doc is never lost behind non-matching docs
    doc_filter = None

    def _gate(hits: DataFrame) -> None:
        nonlocal doc_filter
        doc_filter = hits if doc_filter is None else \
            doc_filter.join(hits, "doc_id", "left_semi")

    for i, p in enumerate(q.phrases):
        _gate(phrase_match(index, [(f"{qid}#p{i}", p)]).select("doc_id"))
    # a MUST expansion (e.g. '+pre*') is Lucene's required MultiTerm-
    # Query: the doc must match ≥1 rewritten term. Gated per clause
    # BEFORE the rank cut (like phrases); the rewritten terms also
    # join the SHOULD set so they score. A clause rewriting to nothing
    # makes the query unsatisfiable (empty gate), as in Lucene.
    for kind, pat in q.must_expansions:
        expanded = _expand(kind, [pat])
        should += expanded
        _gate(_docs_matching_any(expanded) if expanded else
              index.spark.createDataFrame([], "doc_id long"))
    out = boolean_topk(index, [(qid, sorted(set(q.must)),
                                sorted(set(should) - set(q.must)
                                       - set(must_not)),
                                sorted(set(must_not)))], k,
                       doc_filter=doc_filter)
    return out.select("qid", "doc_id", "score", "rank") \
        .orderBy("qid", "rank")


# --------------------------------------------------------------------
# simple_query_string — the ES/Lucene SimpleQueryParser analog
# --------------------------------------------------------------------

_SQS_ALL_FLAGS = frozenset(
    {"AND", "OR", "NOT", "PHRASE", "PREFIX", "FUZZY", "SLOP",
     "PRECEDENCE"})


def _tokenize_sqs(s: str, flags: frozenset) -> list[tuple]:
    """Lenient tokenizer — NEVER raises. Emits ('word', text),
    ('phrase', text, slop), ('(',), (')',), ('|',), ('+',), ('-',).
    ``\\`` escapes the next char into the current word; a disabled
    flag's syntax char falls through as a word char; an unterminated
    quote is dropped and the remainder parses as plain text."""
    toks: list[tuple] = []
    word: list[str] = []
    i, n = 0, len(s)

    def flush() -> None:
        if word:
            toks.append(("word", "".join(word)))
            word.clear()

    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            word.append(s[i + 1])
            i += 2
            continue
        if c.isspace():
            flush()
            i += 1
            continue
        if c == '"' and "PHRASE" in flags:
            j, buf = i + 1, []
            while j < n and s[j] != '"':
                if s[j] == "\\" and j + 1 < n:
                    buf.append(s[j + 1])
                    j += 2
                else:
                    buf.append(s[j])
                    j += 1
            if j >= n:          # unterminated: drop the quote char
                i += 1
                continue
            flush()
            slop, j = 0, j + 1
            if j < n and s[j] == "~" and "SLOP" in flags:
                m = re.match(r"~(\d+)", s[j:])
                if m:
                    slop = int(m.group(1))
                    j += m.end()
            if buf and "".join(buf).strip():
                toks.append(("phrase", "".join(buf), slop))
            i = j
            continue
        if c == "(" and "PRECEDENCE" in flags:
            flush()
            toks.append(("(",))
        elif c == ")" and "PRECEDENCE" in flags:
            flush()
            toks.append((")",))
        elif c == "|" and "OR" in flags:
            flush()
            toks.append(("|",))
        elif c == "+" and "AND" in flags:
            flush()
            toks.append(("+",))
        elif (c == "-" and "NOT" in flags and not word):
            toks.append(("-",))       # negation only at word start
        else:
            word.append(c)
        i += 1
    flush()
    return toks


def _parse_sqs(toks: list[tuple], i: int, default_op: str,
               depth: int = 0) -> tuple:
    """Parse one parenthesized level. Returns (node | None, next_i).
    Node shapes: ('level', op, positives, nots) | ('word', t) |
    ('phrase', t, slop). Lucene-parity pins: ``-x`` attaches as a
    MUST_NOT of the CURRENT level regardless of surrounding ``|``
    (so ``a | -b`` means a AND NOT b, the BooleanQuery reading);
    AND binds tighter than OR among positives; a dangling operator
    or negation is silently dropped (never throws); an unmatched
    '(' auto-closes at end of input, a stray ')' closes its level."""
    pos: list = []          # positive items in order
    joins: list[str] = []   # op between consecutive positives
    nots: list = []
    pending: str | None = None
    neg = False
    while i < len(toks):
        t = toks[i]
        kind = t[0]
        if kind == ")":
            i += 1
            if depth == 0:      # stray ')' at top level: ignore
                pending, neg = None, False
                continue
            break
        if kind == "|":
            pending, neg, i = "or", False, i + 1
            continue
        if kind == "+":
            pending, neg, i = "and", False, i + 1
            continue
        if kind == "-":
            neg, i = True, i + 1
            continue
        if kind == "(":
            node, i = _parse_sqs(toks, i + 1, default_op, depth + 1)
        else:
            node, i = t, i + 1
        if node is not None:
            if neg:
                nots.append(node)       # level-scoped MUST_NOT
            else:
                if pos:
                    joins.append(pending or default_op)
                pos.append(node)
        pending, neg = None, False
    # group positives: AND binds tighter than OR
    groups: list[list] = [[]]
    for j, item in enumerate(pos):
        if j > 0 and joins[j - 1] == "or":
            groups.append([])
        groups[-1].append(item)
    groups = [g for g in groups if g]
    if not groups and not nots:
        return None, i
    if len(groups) <= 1:
        inner = groups[0] if groups else []
        return ("level", "and", inner, nots), i

    def _wrap(g: list):
        return g[0] if len(g) == 1 else ("level", "and", g, [])

    return ("level", "or", [_wrap(g) for g in groups], nots), i


SQS_WAND_MARGIN = 50    # overfetch before the quantized re-rank (the
# house recipe: the kernel pages by exact float sums, the final rank
# reads 4 dp-rounded micro-unit sums — the margin absorbs boundary
# rounding/quantization flips, same constant as the other WAND pages)


def simple_query_string_topk(index, qid: str, s: str, k: int,
                             default_operator: str = "or",
                             flags: frozenset | set | None = None,
                             fuzzy_transpositions: bool = True,
                             use_wand: bool = True):
    """ES ``simple_query_string`` (Lucene SimpleQueryParser): the
    LENIENT user-facing query language — ``+`` AND, ``|`` OR, ``-``
    NOT, ``"..."`` phrase (``~N`` slop), trailing-``*`` prefix,
    ``~N`` fuzzy (default 2 edits, OSA — the FuzzyQuery default;
    capped at 2 like Lucene), ``( )`` precedence, ``\\`` escape —
    that NEVER throws: malformed syntax degrades to literal text
    (the parser's whole contract, and why ES exposes it to end
    users where ``query_string`` is dev-only). ``flags`` disables
    feature subsets (any of AND/OR/NOT/PHRASE/PREFIX/FUZZY/SLOP/
    PRECEDENCE — a disabled flag's syntax char becomes plain text,
    the ES flags contract); ``default_operator`` joins bare
    whitespace-adjacent clauses.

    Pinned semantics (each the Lucene SimpleQueryParser reading):
    ``-x`` attaches as MUST_NOT of its enclosing level regardless of
    ``|`` (``a | -b`` = a AND NOT b); AND binds tighter than OR; a
    level whose positives all vanish (analyzer-dropped) but keeps
    prohibitions matches NOTHING (pure-negation BooleanQuery); an
    empty prefix/fuzzy expansion is an unmatchable clause (Lucene's
    MatchNoDocsQuery rewrite) — harmless under OR, fatal under AND;
    a multi-token analyzed word scores as its weighted-OR (the
    flattened SynonymQuery reading). Sloppy phrases gate via the
    unordered-proximity superset window N + len − 1 (every true
    Lucene slop-N occurrence qualifies; some reorderings Lucene's
    transposition-cost model rejects also pass — one-sided,
    documented divergence).

    Execution (Spark-first): ONE exhaustive weighted-OR scoring pass
    over ALL atoms' terms (atom id rides the qid channel — the
    engine's oracle-green scorer, bucket-pruned decode, tombstones
    masked), phrase gates semi-join their atom's rows, then a
    per-doc pivot (|atoms| columns) evaluates the boolean tree as
    ONE Catalyst expression — no per-clause query, no driver loop;
    the rank window orders by the ROUNDED summed score (4 dp) then
    doc_id asc and cuts AFTER the root-match filter (gate-before-
    cut). Scale: cost is one decode of the atom term set + one
    (doc_id) agg bounded by the matched-docs union; the tree is
    column math. Kernel fast path (r5, ``use_wand``): a FLAT
    pure-positive OR of plain term atoms — the common user query —
    is exactly weighted-OR BM25, so ONE pass through the sharded
    block-max kernel with IN-KERNEL int64-µu quantization
    (``score_wand(..., quantize=True)``) pages k + SQS_WAND_MARGIN
    candidates whose exact integer sums are bit-identical to the
    tree plan's micro-unit accumulation; a rounded re-rank cuts to
    k — rank-identical to the general plan (equivalence-tested,
    incl. forced multi-shard); any NOT / phrase / nesting keeps the
    one-pass tree plan. Returns (qid, doc_id, score, rank).
    Reference: the ES/Lucene stack the reference delegates search to
    ships this parser (GROUP_12 Searcher.java:38-42 uses the classic
    parser only to escape text — this is the user-facing sibling).
    """
    from functools import reduce

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .portable import round_half_up
    from .positions import phrase_match, proximity_match
    from .search import (expand_fuzzy_terms, expand_prefix_terms,
                         score_exhaustive)

    if default_operator not in ("or", "and"):
        raise ValueError(f"default_operator must be 'or'/'and', got "
                         f"{default_operator!r}")
    fl = frozenset(flags) if flags is not None else _SQS_ALL_FLAGS
    unknown = fl - _SQS_ALL_FLAGS
    if unknown:
        raise ValueError(f"unknown flags {sorted(unknown)}")
    opts = index.analyzer_opts()
    spark = index.spark
    empty = spark.createDataFrame(
        [], "qid string, doc_id long, score double, rank int")

    root, _ = _parse_sqs(_tokenize_sqs(s, fl), 0, default_operator)
    if root is None:
        return empty

    # resolve leaf tokens to atoms: (aid, terms, gate_df|None);
    # a None return from _resolve drops the clause (analyzer-empty)
    atoms: list[tuple[int, list[str], object]] = []

    def _resolve(node):
        if node[0] == "level":
            pos = [r for r in (_resolve(c) for c in node[2])
                   if r is not None]
            nots = [r for r in (_resolve(c) for c in node[3])
                    if r is not None]
            if not pos and not nots:
                return None
            return ("level", node[1], pos, nots)
        aid = len(atoms)
        if node[0] == "phrase":
            terms = _analyze_one(node[1], **opts)
            if not terms:
                return None
            slop = node[2]
            if slop and len(terms) > 1:
                gate = proximity_match(
                    index, [(f"a{aid}", terms)],
                    window=slop + len(terms) - 1)
            else:
                gate = phrase_match(index, [(f"a{aid}", node[1])])
            atoms.append((aid, sorted(set(terms)), gate))
            return ("atom", aid)
        w = node[1]
        m = re.search(r"~(\d*)$", w)
        edits = None
        if m and "FUZZY" in fl and m.start() > 0:
            edits = min(int(m.group(1) or 2), 2)
            w = w[:m.start()]
        if ("PREFIX" in fl and w.endswith("*") and len(w) > 1
                and "*" not in w[:-1]):
            base = _analyze_one(w[:-1], **opts)
            if not base:
                return None
            terms = [t for _, t, _ in expand_prefix_terms(
                index, [(f"a{aid}", base[0])])]
        else:
            terms = _analyze_one(w.replace("*", "").replace("?", ""),
                                 **opts)
            if not terms:
                return None
            if edits:
                terms = [t for _, t, _ in expand_fuzzy_terms(
                    index, [(f"a{aid}", terms[0])], max_edits=edits,
                    transpositions=fuzzy_transpositions)]
        # empty expansion: keep as an UNMATCHABLE atom (MatchNoDocs)
        atoms.append((aid, sorted(set(terms)), None))
        return ("atom", aid)

    root = _resolve(root)
    if root is None:
        return empty
    # Per-(atom, term) pseudo-qids so each TERM's scalar BM25 score is
    # quantized ONCE to int64 micro-units before ANY summation (the
    # round-3 cross-engine determinism recipe): per-row scalar BM25 is
    # IEEE-identical across engines, so the quantized per-term values
    # match exactly, and integer accumulation makes both the
    # within-atom prefix-expansion sum and the cross-atom boolean-tree
    # sum association-free — no addition-order ulp can flip the 4 dp
    # rank boundary (ADVICE r4: engine nested s0+(s1+s2), oracle
    # flattened (s0+s1)+s2). Terms never contain '|' (analyzer strips
    # punctuation), so the separator is unambiguous.
    qt = [(f"a{aid}|{t}", t, 1.0)
          for aid, terms, _ in atoms for t in terms]
    if not qt:
        return empty

    def _flat_or_plain(node) -> bool:
        if node[0] == "atom":
            return atoms[node[1]][2] is None        # plain, ungated
        _, op, pos, nots = node
        return (not nots and bool(pos)
                and (op == "or" or len(pos) == 1)
                and all(c[0] == "atom" and atoms[c[1]][2] is None
                        for c in pos))

    if use_wand and _flat_or_plain(root):
        # ONE pass through the quantized block-max kernel: under a
        # flat positive OR the tree total is exactly the sum of every
        # (atom, term) µu-quantized score — which is what the kernel
        # computes with quantize=True (a term in j atoms appears as j
        # weight-1 rows, j·floor(c·1e6+0.5), matching the tree plan
        # bit-for-bit). Page k+margin by the exact quantized sum,
        # rounded re-rank last (house recipe). An early driver-side
        # measurement of the naive two-pass form (WAND page →
        # doc_filter re-score) was 0.77× — the re-score still decodes
        # every matched posting — hence the in-kernel quantization.
        from .search import score_wand
        page = score_wand(index,
                          [(qid, t, 1.0)
                           for _aid, terms, _g in atoms for t in terms],
                          int(k) + SQS_WAND_MARGIN, quantize=True)
        r = round_half_up(F.col("score"), 4)
        w = Window.partitionBy("qid").orderBy(r.desc(), F.asc("doc_id"))
        return (page.select("qid", "doc_id", "score")
                .withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= int(k))
                .select("qid", "doc_id", r.alias("score"), "rank")
                .orderBy("qid", "rank"))

    scored = (score_exhaustive(index, qt, k=None)
              .select(F.substring_index("qid", "|", 1).alias("qid"),
                      "doc_id",
                      F.floor(F.col("score") * 1e6 + 0.5)
                      .cast("long").alias("score"))
              .groupBy("qid", "doc_id")
              .agg(F.sum("score").alias("score")))
    plain = [f"a{aid}" for aid, _, g in atoms if g is None]
    parts = []
    if plain:
        parts.append(scored.where(F.col("qid").isin(plain)))
    for aid, _, gate in atoms:
        if gate is not None:
            parts.append(scored.where(F.col("qid") == f"a{aid}").join(
                gate.select("doc_id"), "doc_id", "left_semi"))
    if not parts:
        return empty
    rows = reduce(lambda a, b: a.unionByName(b), parts)
    agg = rows.groupBy("doc_id").agg(
        *[F.max(F.when(F.col("qid") == f"a{aid}", F.col("score")))
          .alias(f"s_{aid}") for aid, _, _ in atoms])

    def _m(node):
        if node[0] == "atom":
            return F.col(f"s_{node[1]}").isNotNull()
        _, op, pos, nots = node
        if not pos:
            e = F.lit(False)        # pure negation matches nothing
        else:
            ms = [_m(c) for c in pos]
            e = reduce((lambda a, b: a & b) if op == "and"
                       else (lambda a, b: a | b), ms)
        for c in nots:
            e = e & ~F.coalesce(_m(c), F.lit(False))
        return e

    def _sc(node):
        # integer micro-unit accumulation end-to-end (see qt comment)
        if node[0] == "atom":
            return F.coalesce(F.col(f"s_{node[1]}"),
                              F.lit(0).cast("long"))
        _, op, pos, _nots = node
        if not pos:
            return F.lit(0).cast("long")
        return reduce(lambda a, b: a + b,
                      [F.when(F.coalesce(_m(c), F.lit(False)), _sc(c))
                       .otherwise(F.lit(0).cast("long")) for c in pos])

    out = (agg.where(F.coalesce(_m(root), F.lit(False)))
           .select(F.lit(qid).alias("qid"), "doc_id",
                   round_half_up(_sc(root).cast("double") / F.lit(1e6),
                                 4).alias("score")))
    w = Window.partitionBy("qid").orderBy(F.desc("score"),
                                          F.asc("doc_id"))
    return (out.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(k))
            .orderBy("qid", "rank"))


def expand_synonyms(queries, synonyms, syn_weight: float = 0.5):
    """Query-time synonym expansion (the ES ``synonym`` search-time
    token filter in its weighted-expansion reading): each query term
    contributes itself at its own weight plus every synonym at
    ``weight × syn_weight``; weights SUM per (qid, term) — the
    weighted-OR contract every scorer consumes (so a synonym that is
    ALSO an original term simply scores higher, Lucene's flattened
    SynonymQuery-as-boolean rewrite).

    ``queries``: [(qid, [terms])] or [(qid, {term: weight})];
    ``synonyms``: {term: [synonyms]} — applied one-way as given (feed
    both directions for symmetric sets, the ES equivalent of listing
    both orders). Pure driver-side: queries are tiny by contract.
    Returns [(qid, term, weight)] sorted (qid, term) — QueryTerms.
    """
    out: dict[tuple[str, str], float] = {}
    for qid, terms in queries:
        items = (terms.items() if isinstance(terms, dict)
                 else [(t, 1.0) for t in terms])
        for t, w in items:
            out[(qid, t)] = out.get((qid, t), 0.0) + float(w)
            for s in synonyms.get(t, ()):  # one-way expansion
                out[(qid, s)] = out.get((qid, s), 0.0) \
                    + float(w) * syn_weight
    return [(q, t, w) for (q, t), w in sorted(out.items())]
