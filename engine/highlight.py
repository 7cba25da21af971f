"""Search-result highlighting: best-passage snippet extraction.

The ES/Lucene feature the engine still lacked on the serving side: given
a page of hits, return a fragment of each document with the query terms
wrapped in ``<em>`` tags. The reference's Lucene stack ships this as the
*plain highlighter* (re-analyze the stored field for the handful of
docs on the result page, pick the best-scoring passage); the unified
highlighter differs only in using indexed offsets. We implement the
plain-highlighter shape because it is the scale-correct one for Spark:
highlighting touches ONLY the ``n_queries × k`` hit rows, so the
re-analysis cost is bounded by the page size, never the corpus — no
index change, no extra build stage.

Pinned semantics (cross-engine deterministic, DuckDB-oracle-checked):

* The display token stream is the engine analyzer's stopword-KEEPING,
  unstemmed stream (``tokens_col(keep_stopwords=True)``) — stopwords
  must stay visible in a human-readable snippet.
* A token at position i matches iff its ANALYZED form (identity for
  unstemmed indexes; the index's stem/fold otherwise, threaded via a
  parallel match-token stream) equals one of the query's terms.
* Candidate passages are the ``window``-token slices STARTING at each
  match position (Lucene SimpleFragmenter-style anchoring; slices
  truncate at the document end).
* Passage scoring: distinct matched terms desc, total matches desc,
  start position asc — a deterministic pin of Lucene's passage scorer
  (which breaks ties by internal order).
* Output keeps only hits with ≥ 1 match (inner-join semantics — a
  BM25/WAND hit always has one; a rescored/function-scored hit list may
  not, mirroring ES where such docs simply return no fragment).

Everything is Catalyst higher-order functions over the token array —
no UDF, no explode, no shuffle beyond the two broadcast-sized joins
(hits → docs by doc_id, hits → query-term arrays by qid). Per-row cost
is O(matches × window).

Reference parity: Searcher.java returns raw stored fields only; this is
part of the beyond-reference serving family (SURVEY.md §6), matching
the ES ``highlight`` API surface.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from engine.analysis import tokens_col

DEFAULT_WINDOW = 12


def _match(qt: Column, tok: Column) -> Column:
    return F.array_contains(qt, tok)


def snippet_cols(toks: Column, qt: Column, window: int,
                 match_toks: Optional[Column] = None,
                 pre: str = "<em>", post: str = "</em>",
                 ) -> Tuple[Column, Column]:
    """(n_matches, snippet) columns over a token array.

    ``toks``: display tokens; ``match_toks``: same-length analyzed
    stream to match against (defaults to ``toks`` — the unstemmed
    case); ``qt``: array of query terms.
    """
    mt = match_toks if match_toks is not None else toks
    # positions of matching tokens; empty-array guard: sequence(0, -1)
    # yields a DESCENDING [0, -1] (CLAUDE.md pitfall)
    idxs = F.when(F.size(mt) > 0,
                  F.sequence(F.lit(0), F.size(mt) - 1)
                  ).otherwise(F.array().cast("array<int>"))
    flags = F.zip_with(mt, idxs,
                       lambda t, i: F.struct(_match(qt, t).alias("m"),
                                             i.alias("i")))
    mpos = F.transform(F.filter(flags, lambda p: p["m"]),
                       lambda p: p["i"])
    n_matches = F.size(mpos).cast("long")

    def win_of(s: Column) -> Column:
        return F.slice(mt, s + 1, window)

    def matched_in(s: Column) -> Column:
        return F.filter(win_of(s), lambda t: _match(qt, t))

    # candidate = (u, n, -s, s): struct comparison gives max by
    # distinct-matched desc, matches desc, then SMALLEST start
    cands = F.transform(
        mpos,
        lambda s: F.struct(
            F.size(F.array_distinct(matched_in(s))).alias("u"),
            F.size(matched_in(s)).alias("n"),
            (-s).alias("negs"),
            s.alias("s")))
    best_s = F.array_max(cands)["s"]
    # display window renders from toks; match decision from mt — zip
    # keeps the streams aligned
    disp = F.zip_with(
        F.slice(toks, best_s + 1, window),
        F.slice(mt, best_s + 1, window),
        lambda t, m: F.when(_match(qt, m),
                            F.concat(F.lit(pre), t, F.lit(post))
                            ).otherwise(t))
    snippet = F.array_join(disp, " ")
    return n_matches, snippet


def highlight(hits: DataFrame, docs: DataFrame,
              queries: Sequence[tuple], *, window: int = DEFAULT_WINDOW,
              text_col: str = "text", stem: bool = False,
              stemmer: str = "porter", ascii_fold: bool = False,
              pre: str = "<em>", post: str = "</em>") -> DataFrame:
    """Attach (n_matches, snippet) to a page of hits.

    ``hits``: (qid, doc_id, ...) — every column passes through;
    ``docs``: (doc_id, <text_col>); ``queries``: (qid, [terms]) with
    ANALYZED terms (what every query path in the engine consumes).
    Hits whose doc contains no query term drop (inner-join semantics).

    The hits side is broadcast (page-sized by contract), so the docs
    scan is one broadcast-hash semi-join — the stored-field fetch shape
    (engine/expand.py Q8) with the snippet math fused into the same
    stage.
    """
    spark = hits.sparkSession
    qt = spark.createDataFrame(
        [(q, sorted(set(ts))) for q, ts in queries],
        "qid string, qt array<string>")
    base = (docs.select("doc_id", F.col(text_col))
            .join(F.broadcast(hits), "doc_id")
            .join(F.broadcast(qt), "qid"))
    # materialize the token arrays in their OWN projection before the
    # HOF math: snippet_cols references them inside transform() lambdas,
    # where an inlined tokenize expression would re-evaluate per
    # candidate (the element_at-in-transform O(n²) pitfall, CLAUDE.md);
    # a UDF match stream additionally must sit below the consumer
    # projection (the builder pattern — ArrowEvalPython evals once)
    proj = [F.col(c) for c in base.columns]
    proj.append(tokens_col(F.col(text_col), keep_stopwords=True)
                .alias("_toks"))
    if stem or ascii_fold:
        from engine.analysis import tokenize_pandas_udf
        tok_udf = tokenize_pandas_udf(stem=stem, keep_stopwords=True,
                                      ascii_fold=ascii_fold,
                                      stemmer=stemmer)
        proj.append(tok_udf(F.col(text_col)).alias("_mt"))
        mt_col = F.col("_mt")
    else:
        mt_col = None
    base = base.select(*proj)
    n_matches, snippet = snippet_cols(
        F.col("_toks"), F.col("qt"), window, match_toks=mt_col,
        pre=pre, post=post)
    out_cols = [c for c in hits.columns] + ["n_matches", "snippet"]
    return (base.withColumn("n_matches", n_matches)
            .withColumn("snippet", snippet)
            .where(F.col("n_matches") > 0)
            .select(*out_cols))


def highlight_topk(index, queries: Sequence[tuple], k: int,
                   *, window: int = DEFAULT_WINDOW,
                   pre: str = "<em>", post: str = "</em>") -> DataFrame:
    """WAND top-k + snippets off the index's stored fields, matching
    with the INDEX's analyzer opts (the stale-analyzer rule: a stemmed
    index must highlight stemmed matches)."""
    from engine.search import score_wand

    hits = score_wand(index, [(q, t, w) for q, ts in queries
                              for t, w in (ts.items() if isinstance(ts, dict)
                                           else [(t, 1.0) for t in ts])], k)
    opts = index.analyzer_opts()
    docs = index.docs.select("doc_id", F.col("content").alias("text"))
    qpairs = [(q, list(ts)) for q, ts in queries]
    return highlight(hits, docs, qpairs, window=window,
                     stem=opts.get("stem", False),
                     stemmer=opts.get("stemmer", "porter"),
                     ascii_fold=opts.get("ascii_fold", False),
                     pre=pre, post=post)


# ---------------------------------------------------------------------------
# python reference replica (tests)
# ---------------------------------------------------------------------------

def snippet_py(toks: Sequence[str], qterms: Sequence[str], window: int,
               match_toks: Optional[Sequence[str]] = None,
               pre: str = "<em>", post: str = "</em>",
               ) -> Tuple[int, Optional[str]]:
    mt = list(match_toks) if match_toks is not None else list(toks)
    qs = set(qterms)
    mpos = [i for i, t in enumerate(mt) if t in qs]
    if not mpos:
        return 0, None
    best = None
    for s in mpos:
        win = mt[s:s + window]
        matched = [t for t in win if t in qs]
        key = (len(set(matched)), len(matched), -s)
        if best is None or key > best[0]:
            best = (key, s)
    s = best[1]
    disp = [f"{pre}{t}{post}" if m in qs else t
            for t, m in zip(toks[s:s + window], mt[s:s + window])]
    return len(mpos), " ".join(disp)
