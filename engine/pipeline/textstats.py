"""Text analysis for training-data curation: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

Pure Catalyst column expressions (portable to the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..portable import round_half_up

# tiny per-language function-word lists for the n-gram/stopword
# heuristic language ID (deterministic, pinned)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "to", "and", "in", "is", "for", "with", "on"),
    "de": ("der", "die", "das", "und", "ist", "mit", "von", "zu", "den", "ein"),
    "fr": ("le", "la", "les", "de", "et", "est", "un", "une", "pour", "dans"),
    "es": ("el", "la", "los", "de", "y", "es", "un", "una", "para", "con"),
    "zh": ("de", "shi", "zai", "he", "le", "you", "wo", "ta", "men", "zhe"),
}

_WS_TOKEN = "\\s+"
_ALNUM_TOKEN = "[^a-z0-9]+"


def _ws_tokens(col):
    return F.filter(F.split(col, _WS_TOKEN), lambda t: t != F.lit(""))


def _alnum_tokens(col):
    return F.filter(F.split(F.lower(col), _ALNUM_TOKEN),
                    lambda t: t != F.lit(""))


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_ws_tokens, n_alnum_tokens, n_chars_txt): whitespace
    tokens plus BPE-ish sub-tokenization (alnum-run splitting — the
    same regex family a byte-pair pre-tokenizer uses)."""
    c = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_ws_tokens(c)).alias("n_ws_tokens"),
        F.size(_alnum_tokens(c)).alias("n_alnum_tokens"),
        F.length(c).alias("n_chars_txt"),
    )


def _quality_cols(c):
    """The quality component columns (sw, pr, mean_len, q) — shared by
    :func:`quality_scores` and the single-pass :func:`curation_filter`."""
    toks = _alnum_tokens(c)
    en = LANG_STOPWORDS["en"]
    stops = F.array(*[F.lit(s) for s in en])
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    n_chars = F.length(c)
    n_punct = F.length(F.regexp_replace(F.lower(c), "[a-z0-9\\s]", ""))
    mean_len = F.aggregate(toks, F.lit(0.0),
                           lambda acc, t: acc + F.length(t)) / n_tok
    sw = n_stop.cast("double") / n_tok
    pr = n_punct.cast("double") / n_chars
    q = (F.lit(0.4) * F.least(sw / 0.4, F.lit(1.0))
         + F.lit(0.3) * (F.lit(1.0) - F.least(pr / 0.3, F.lit(1.0)))
         + F.lit(0.3) * F.least(mean_len / 8.0, F.lit(1.0)))
    return sw, pr, mean_len, q


def _lang_cols(c):
    """(lang_guess, best_score) columns — shared by :func:`lang_id`
    and :func:`curation_filter`."""
    toks = _alnum_tokens(c)
    n = F.size(toks)
    scores = []
    for lang in sorted(LANG_STOPWORDS):
        stops = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
        cnt = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
        scores.append((lang, cnt.cast("double") /
                       F.when(n > 0, n).otherwise(F.lit(1))))
    best_score = F.greatest(*[s for _, s in scores])
    guess = F.lit(None).cast("string")
    for lang, s in reversed(scores):  # earlier langs win ties → apply last
        guess = F.when(s == best_score, F.lit(lang)).otherwise(guess)
    return guess, best_score


def quality_scores(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + a pinned combined score in [0,1]:

    stopword_ratio  — EN function words / alnum tokens
    punct_ratio     — non-alnum, non-space chars / chars
    mean_token_len  — avg alnum token length
    quality = 0.4·clamp(stopword_ratio/0.4) + 0.3·(1−clamp(punct_ratio/0.3))
            + 0.3·clamp(mean_token_len/8)
    """
    from engine.session import fan_out

    c = F.col(text_col)
    sw, pr, mean_len, q = _quality_cols(c)
    return fan_out(docs).select(
        F.col(id_col).alias("doc_id"),
        round_half_up(sw, 6).alias("stopword_ratio"),
        round_half_up(pr, 6).alias("punct_ratio"),
        round_half_up(mean_len, 6).alias("mean_token_len"),
        round_half_up(q, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Stopword-overlap language ID: (doc_id, lang_guess, lang_score).
    Ties broken by language code ascending (deterministic)."""
    from engine.session import fan_out

    guess, best_score = _lang_cols(F.col(text_col))
    return fan_out(docs).select(F.col(id_col).alias("doc_id"),
                       guess.alias("lang_guess"),
                       round_half_up(best_score, 6).alias("lang_score"))


def curation_filter(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    min_tokens: int = 5, max_tokens: int = 100_000,
                    min_quality: float = 0.3, max_dup2: float = 0.5,
                    langs: tuple[str, ...] = ("en",)) -> DataFrame:
    """End-stage document filter (the RefinedWeb/Gopher-style keep/drop
    decision): combines the engine's length, quality, language, and
    2-gram-repetition signals IN ONE PASS over the text — every signal
    is a Catalyst column, so the whole filter is a single projection:
    no joins, no shuffles, no re-reads of the corpus.

    Returns (doc_id, keep, reasons) where ``reasons`` lists every
    violated rule comma-joined in a fixed order (empty string = kept).
    Thresholds are pinned defaults in the Gopher/C4 neighborhood —
    arguments, not policy. At 100 TB this runs as a map-only stage and
    the kept set is a pushed-down predicate for every consumer."""
    c = F.col(text_col)
    toks = _alnum_tokens(c)
    n = F.size(toks)
    _sw, _pr, _ml, q = _quality_cols(c)
    guess, _best = _lang_cols(c)
    sh2 = F.filter(
        F.zip_with(toks, F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
                   lambda a, b: F.concat(a, F.lit(" "), b)),
        lambda x: x.isNotNull())
    dup2 = F.when(F.size(sh2) > 0,
                  F.lit(1.0) - F.size(F.array_distinct(sh2))
                  .cast("double") / F.size(sh2)).otherwise(F.lit(0.0))
    lang_arr = F.array(*[F.lit(lg) for lg in sorted(langs)])
    rules = [
        ("too_short", n < min_tokens),
        ("too_long", n > max_tokens),
        ("low_quality", q < min_quality),
        ("repetitive", dup2 > max_dup2),
        ("wrong_lang", ~F.array_contains(lang_arr, guess)),
    ]
    reasons = F.concat_ws(",", F.flatten(F.array(*[
        F.when(cond, F.array(F.lit(name))).otherwise(
            F.array().cast("array<string>"))
        for name, cond in rules])))
    return docs.select(F.col(id_col).alias("doc_id"),
                       (reasons == F.lit("")).alias("keep"),
                       reasons.alias("reasons"))


def fingerprints(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", shingle_k: int = 5) -> DataFrame:
    """Document fingerprint: (doc_id, fp, n_shingles) where fp is the
    minimum md5 over word k-shingles (1-permutation MinHash — a
    winnowing-style representative hash)."""
    from .dedup import shingles_col

    sh = shingles_col(F.col(text_col), shingle_k)
    return (docs.select(F.col(id_col).alias("doc_id"), sh.alias("sh"))
            .select("doc_id",
                    F.array_min(F.transform(F.col("sh"), F.md5)).alias("fp"),
                    F.size("sh").alias("n_shingles")))


def pmi_bigrams(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", min_count: int = 5,
                k: int = 20) -> DataFrame:
    """Collocation mining: top-k adjacent-token bigrams by pointwise
    mutual information — phrase discovery for training-data curation
    (e.g. tokenizer merge candidates, entity phrases).

    pmi(a,b) = ln( (n_ab / T_bi) / ((n_a / T_uni) · (n_b / T_uni)) )
    over lowercase alnum tokens (stopwords kept — PMI's marginals
    penalize them naturally). ``min_count`` filters noise bigrams.
    Returns (bigram, n_ab, pmi, rank), rank over (pmi_rounded desc,
    bigram asc).

    Scale shape: bigram construction is a per-row zip_with (narrow);
    the only shuffles are two hash-aggs (bigram counts, unigram
    counts) and the unigram side broadcasts when the vocabulary fits —
    all map-side-combinable. The final top-k window runs on the
    min_count-filtered bigram set.
    """
    from pyspark.sql import Window

    from ..portable import round_half_up

    toks = _alnum_tokens(F.col(text_col))
    n = F.size(toks)
    big = F.filter(
        F.zip_with(toks, F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
                   lambda a, b: F.concat(a, F.lit(" "), b)),
        lambda x: x.isNotNull())
    bi = (docs.select(F.explode(big).alias("bigram"))
          .groupBy("bigram").agg(F.count(F.lit(1)).alias("n_ab")))
    uni = (docs.select(F.explode(toks).alias("tok"))
           .groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok")))
    t_uni = uni.agg(F.sum("n_tok")).collect()[0][0]
    t_bi = bi.agg(F.sum("n_ab")).collect()[0][0]
    parts = F.split(F.col("bigram"), " ")
    scored = (bi.where(F.col("n_ab") >= min_count)
              .withColumn("w_a", parts.getItem(0))
              .withColumn("w_b", parts.getItem(1))
              .join(uni.withColumnRenamed("tok", "w_a")
                    .withColumnRenamed("n_tok", "n_a"), "w_a")
              .join(uni.withColumnRenamed("tok", "w_b")
                    .withColumnRenamed("n_tok", "n_b"), "w_b")
              .withColumn(
                  "pmi",
                  F.log((F.col("n_ab") / F.lit(float(t_bi)))
                        / ((F.col("n_a") / F.lit(float(t_uni)))
                           * (F.col("n_b") / F.lit(float(t_uni)))))))
    r = round_half_up(F.col("pmi"), 6)
    w = Window.orderBy(r.desc(), F.asc("bigram"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("bigram", "n_ab", r.alias("pmi"), "rank"))


def unigram_logprob(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Perplexity-style quality signal: per-doc mean log-probability
    under the corpus's own add-one-smoothed unigram LM — the cheap
    first-stage of a CCNet/Gopher-style perplexity filter (docs far
    below the corpus mean are boilerplate/noise candidates).

    p(w) = (c(w) + 1) / (T + V) over lowercase alnum tokens;
    returns (doc_id, n_tokens, mean_logprob) — mean_logprob NULL for
    token-less docs. Scale shape: one explode + two hash-aggs (token
    counts, per-doc mean); the vocabulary join broadcasts when it
    fits, and T/V are two driver scalars.
    """
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(_alnum_tokens(F.col(text_col))).alias("tok"))
    uc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_w"))
    tv = uc.agg(F.sum("n_w").alias("T"),
                F.count(F.lit(1)).alias("V")).collect()[0]
    t_tot, vocab = float(tv["T"] or 0), float(tv["V"] or 0)
    lp = F.log((F.col("n_w") + 1.0) / F.lit(t_tot + vocab))
    per_doc = (toks.join(uc, "tok")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_tokens"),
                    F.avg(lp).alias("mlp")))
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
                    round_half_up(F.col("mlp"), 6).alias("mean_logprob")))


def source_mix(docs: DataFrame, text_col: str = "text",
               source_col: str = "source", lang_col: str = "lang"
               ) -> DataFrame:
    """Data-mixture report: per (source, lang) corpus composition —
    what a training-data pipeline checks before fixing sampling
    weights. Returns (source, lang, n_docs, n_tokens, mean_chars,
    doc_share); one hash-agg plus a broadcast total."""
    base = docs.select(
        F.col(source_col).alias("source"), F.col(lang_col).alias("lang"),
        F.size(_alnum_tokens(F.col(text_col))).cast("long").alias("n_tok"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"))
    total = base.count()
    g = (base.groupBy("source", "lang")
         .agg(F.count(F.lit(1)).alias("n_docs"),
              F.sum("n_tok").alias("n_tokens"),
              F.avg("n_chars").alias("mc")))
    return g.select(
        "source", "lang", "n_docs", "n_tokens",
        round_half_up(F.col("mc"), 6).alias("mean_chars"),
        round_half_up(F.col("n_docs") / F.lit(float(total)), 6)
        .alias("doc_share"))


def ngram_counts(docs: DataFrame, n: int = 2, min_count: int = 2,
                 text_col: str = "text") -> DataFrame:
    """Corpus-level n-gram count table with count pruning — the
    canonical web-scale LM-prep job (Brants et al. 2007 built stupid-
    backoff LMs from exactly this shape at 2T tokens): explode n-grams
    (O(tokens) rows via the zip-with-shifted-slices build — never the
    element_at O(n²) trap), one partial+final hash aggregation, prune
    ``count < min_count`` (the pruning is what keeps the result table
    bounded at scale). Returns (ngram, count) over lowercase alnum
    tokens, stopwords kept (LMs want surface text).
    """
    toks = _alnum_tokens(F.col(text_col))
    size = F.size(toks)
    out = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(size - j, F.lit(0)))
        out = F.zip_with(out, shifted,
                         lambda a, b: F.concat(a, F.lit(" "), b))
    grams = F.filter(out, lambda x: x.isNotNull())
    return (docs.select(F.explode(grams).alias("ngram"))
            .groupBy("ngram")
            .agg(F.count(F.lit(1)).alias("count"))
            .where(F.col("count") >= min_count))


def did_you_mean(docs: DataFrame, queries, max_edits: int = 2,
                 alpha: float = 1.0, text_col: str = "text",
                 ndigits: int = 6) -> DataFrame:
    """Whole-query spelling correction — the Elasticsearch ``phrase``
    suggester's mechanic (candidate generation + language-model
    rescoring over a shingle field), distilled to a deterministic
    single pass: per query position, vocabulary terms within
    ``max_edits`` Levenshtein edits (plus the original token itself)
    are rescored by an add-``alpha`` bigram LM conditioned on the
    OBSERVED previous token, and the best candidate per position is
    emitted (score-rounded desc, then distance asc, then term asc).

    score(cand at 0)   = ln((c1(cand) + α) / (T + α·V))
    score(cand at i>0) = ln((c2(prev_i, cand) + α) / (c1(prev_i) + α·V))
                         when prev_i occurs in the corpus, else the
                         unigram score (an UNSEEN context — typically
                         itself a misspelling — carries no signal, and
                         without the backoff every candidate ties and
                         the distance-0 original wins vacuously).

    Documented divergences from ES: a single forward pass with the
    observed left context (no beam search over corrected sequences)
    and add-α smoothing with unseen-context unigram backoff (instead
    of stupid backoff) — both so the DuckDB oracle replicates the
    arithmetic exactly; ln() outputs are rounded (house rule) before
    any comparison.

    Scale shape: the uni/bigram tables are the standard one-explode
    hash aggs; candidate generation is a vocabulary-sized scan against
    a broadcast query list under a length pre-filter (the
    DirectSpellChecker enumeration); the bigram/context joins are
    pre-pruned by the driver-known previous-token literals, so the
    big tables never shuffle — only literal-pruned slivers broadcast.

    Returns one row per qid: (qid, suggestion, n_corrected, score).
    """
    import re

    spark = docs.sparkSession
    qpos = []
    for qid, text in queries:
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        for i, t in enumerate(toks):
            qpos.append((qid, i, t, toks[i - 1] if i else None))
    if not qpos:
        return spark.createDataFrame(
            [], "qid string, suggestion string, n_corrected long, "
                "score double")
    qdf = spark.createDataFrame(
        qpos, "qid string, i int, orig string, prev string")
    prevs = sorted({p for _, _, _, p in qpos if p is not None})

    toks_all = docs.select(
        F.explode(_alnum_tokens(F.col(text_col))).alias("tok"))
    uni = toks_all.groupBy("tok").agg(F.count(F.lit(1)).alias("c1"))
    tot = uni.agg(F.sum("c1").cast("double").alias("T"),
                  F.count(F.lit(1)).cast("double").alias("V"))

    t = _alnum_tokens(F.col(text_col))
    nxt = F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0)))
    pairs = F.filter(
        F.zip_with(t, nxt, lambda a, b: F.struct(a.alias("p"),
                                                 b.alias("w"))),
        lambda s: s["w"].isNotNull())
    bi = (docs.select(F.explode(pairs).alias("pr"))
          .select("pr.p", "pr.w")
          .where(F.col("p").isin(prevs))     # literal pushdown prune
          .groupBy("p", "w").agg(F.count(F.lit(1)).alias("c2")))

    # candidate generation: positions whose token is long enough for
    # the pigeonhole trigram prune (len ≥ 3·(max_edits+1), see
    # engine.trigram.fuzzy_piece_grams) intersect an on-the-fly vocab
    # trigram table — one linear explode pass + an equi-join + hash
    # agg — instead of the vocabulary × positions nested-loop DP;
    # shorter tokens keep the brute join. Exact-equivalent either way
    # (the prune is verified with the same Levenshtein).
    from ..trigram import fuzzy_piece_grams

    lev = F.levenshtein("tok", "orig")
    gram_rows, ntg_rows, elig_keys = [], [], set()
    for qid, i, t, _prev in qpos:
        groups = fuzzy_piece_grams(t, max_edits)
        if groups is None:
            continue
        elig_keys.add((qid, i))
        for pid, g in enumerate(groups):
            gram_rows.extend((qid, i, pid, tg) for tg in sorted(set(g)))
            ntg_rows.append((qid, i, pid, len(set(g))))
    qdf_fb = qdf.join(
        spark.createDataFrame(
            [(q, i) for q, i in sorted(elig_keys)] or
            [("", -1)], "qid string, i int"),
        ["qid", "i"], "left_anti")
    cand_parts = [
        uni.join(
            F.broadcast(qdf_fb),
            (F.abs(F.length("tok") - F.length("orig")) <= max_edits)
            & (lev <= max_edits) & (lev >= 1))
        .select("qid", "i", "orig", "prev", F.col("tok").alias("cand"),
                lev.cast("int").alias("distance"),
                F.col("c1").alias("c_cand"))]
    if gram_rows:
        vocab_tg = (uni.where(F.length("tok") >= 3)
                    .select("tok", F.explode(F.expr(
                        "transform(sequence(1, length(tok) - 2),"
                        " i -> substring(tok, i, 3))")).alias("tg")))
        gdf = spark.createDataFrame(
            gram_rows, "qid string, i int, pid int, tg string")
        ndf = spark.createDataFrame(
            ntg_rows, "qid string, i int, pid int, n_tg int")
        cand_terms = (vocab_tg.join(F.broadcast(gdf), "tg")
                      .groupBy("qid", "i", "pid", "tok")
                      .agg(F.count_distinct("tg").alias("nm"))
                      .join(F.broadcast(ndf), ["qid", "i", "pid"])
                      .where(F.col("nm") == F.col("n_tg"))
                      .select("qid", "i", "tok").distinct())
        cand_parts.append(
            cand_terms.join(F.broadcast(qdf), ["qid", "i"])
            .where((lev <= max_edits) & (lev >= 1))
            .join(uni, "tok")
            .select("qid", "i", "orig", "prev",
                    F.col("tok").alias("cand"),
                    lev.cast("int").alias("distance"),
                    F.col("c1").alias("c_cand")))
    cand_e = cand_parts[0]
    for part in cand_parts[1:]:
        cand_e = cand_e.unionByName(part)
    cand_0 = (qdf.join(uni, qdf["orig"] == uni["tok"], "left")
              .select("qid", "i", "orig", "prev",
                      F.col("orig").alias("cand"),
                      F.lit(0).alias("distance"),
                      F.coalesce("c1", F.lit(0)).alias("c_cand")))
    cand = cand_0.unionByName(cand_e)

    c_prev = (uni.where(F.col("tok").isin(prevs))
              .select(F.col("tok").alias("prev"),
                      F.col("c1").alias("c_prev")))
    cand = (cand.join(F.broadcast(c_prev), "prev", "left")
            .join(F.broadcast(
                bi.select(F.col("p").alias("prev"),
                          F.col("w").alias("cand"), "c2")),
                ["prev", "cand"], "left")
            .crossJoin(F.broadcast(tot)))
    a = F.lit(float(alpha))
    unigram = F.log((F.col("c_cand") + a)
                    / (F.col("T") + a * F.col("V")))
    seen_ctx = F.coalesce(F.col("c_prev"), F.lit(0)) > 0
    sc = F.when(
        (F.col("i") == 0) | ~seen_ctx, unigram
    ).otherwise(
        F.log((F.coalesce(F.col("c2"), F.lit(0)) + a)
              / (F.col("c_prev") + a * F.col("V"))))
    cand = cand.withColumn("sc", round_half_up(sc, ndigits))
    w = Window.partitionBy("qid", "i").orderBy(
        F.desc("sc"), F.asc("distance"), F.asc("cand"))
    best = (cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1))
    return (best.groupBy("qid")
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("i", "cand"))),
                         lambda s: s["cand"]), " ").alias("suggestion"),
                 F.sum(F.when(F.col("distance") > 0, 1)
                       .otherwise(0)).cast("long").alias("n_corrected"),
                 round_half_up(F.sum("sc"), 4).alias("score")))


def nb_classifier(docs: DataFrame, positive_col: str,
                  text_col: str = "text", id_col: str = "doc_id",
                  n_features: int = 1 << 18,
                  ndigits: int = 6) -> DataFrame:
    """Classifier-based quality filtering — the GPT-3 / LLaMA / CCNet
    pipeline stage (Brown et al. 2020 §A; Touvron et al. 2023: a
    linear classifier over hashed bag-of-words features scores every
    crawl document against a trusted reference slice) — as a
    closed-form multinomial Naive Bayes, so fit AND inference are
    deterministic single-pass aggregations with no SGD anywhere:

      w(f)  = ln((c⁺(f)+1)/(T⁺+F)) − ln((c⁻(f)+1)/(T⁻+F))
      bias  = ln((n⁺+1)/(n⁻+1))
      score = bias + Σ_tokens w(hash(token))     (log-odds; pred = >0)

    Features are md5-hashed token buckets (``n_features`` = F) — the
    fastText/VW hashing trick that caps the weight table at a fixed,
    broadcastable size regardless of corpus vocabulary.

    Scale shape: fit = one explode + one (feature, class) hash agg
    (≤ 2F rows) + a 2-row totals agg; inference = the same explode
    joined to the BROADCAST weight table, one per-doc sum.  Nothing
    is collected; the totals ride a 1-row crossJoin.  Determinism:
    counts stay integer, each ln() output is quantized ONCE to int64
    micro-units (house integer-accumulation recipe — float sums of
    rounded values still carry addition-order ulps across engines),
    per-doc accumulation is exact integer, and one final division +
    4 dp round produces the score.

    Returns (doc_id, n_tokens, score, pred).
    """
    from engine.session import fan_out

    docs = fan_out(docs)   # the tokenize passes below must not serialize
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(positive_col).cast("boolean").alias("y"),
                       F.explode_outer(_alnum_tokens(F.col(text_col)))
                       .alias("tok"))
    feat = (F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10)
            .cast("long") % n_features)
    ft = toks.where(F.col("tok").isNotNull()) \
             .select("doc_id", "y", feat.alias("f"))
    counts = (ft.groupBy("f")
              .agg(F.sum(F.when(F.col("y"), 1).otherwise(0))
                   .alias("cp"),
                   F.sum(F.when(F.col("y"), 0).otherwise(1))
                   .alias("cn")))
    tot = (docs.select(
        F.col(positive_col).cast("boolean").alias("y"),
        F.size(_alnum_tokens(F.col(text_col))).alias("nt"))
        .agg(F.sum(F.when(F.col("y"), F.col("nt")).otherwise(0))
             .cast("double").alias("TP"),
             F.sum(F.when(F.col("y"), 0).otherwise(F.col("nt")))
             .cast("double").alias("TN"),
             F.sum(F.when(F.col("y"), 1).otherwise(0))
             .cast("double").alias("NP"),
             F.sum(F.when(F.col("y"), 1 - 1).otherwise(1))
             .cast("double").alias("NN")))
    fl = F.lit(float(n_features))

    def _i6(col):
        # house integer-accumulation recipe: ln() outputs quantized to
        # int64 micro-units ONCE, all downstream sums exact integer
        return F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("long")

    w = _i6(F.log((F.col("cp") + 1.0) / (F.col("TP") + fl))
            - F.log((F.col("cn") + 1.0) / (F.col("TN") + fl)))
    weights = (counts.crossJoin(F.broadcast(tot))
               .select("f", w.alias("w")))
    # unseen-bucket weight (c⁺ = c⁻ = 0) and the class-prior bias —
    # constants per fit, same micro-unit quantization
    w0 = _i6(F.log((F.col("TN") + fl) / (F.col("TP") + fl)))
    bias = _i6(F.log((F.col("NP") + 1.0) / (F.col("NN") + 1.0)))
    per_tok = (ft.join(F.broadcast(weights), "f", "left")
               .crossJoin(F.broadcast(tot))
               .select("doc_id", F.coalesce(F.col("w"), w0).alias("w")))
    per_doc = (per_tok.groupBy("doc_id")
               .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                    F.sum("w").alias("sw")))
    base = docs.select(F.col(id_col).alias("doc_id")) \
        .crossJoin(F.broadcast(tot))
    score = ((F.coalesce(F.col("sw"), F.lit(0).cast("long")) + bias)
             .cast("double") / F.lit(1e6))
    out = (base.join(per_doc, "doc_id", "left")
           .select("doc_id",
                   F.coalesce("n_tokens", F.lit(0).cast("long"))
                   .alias("n_tokens"),
                   round_half_up(score, 4).alias("score")))
    return out.withColumn("pred", F.col("score") > 0)


def lm_cross_entropy(docs: DataFrame, ref_col: str,
                     threshold: float = 7.0,
                     text_col: str = "text", id_col: str = "doc_id",
                     ndigits: int = 6) -> DataFrame:
    """CCNet-style LM perplexity filtering (Wenzek et al. 2020 §3.3:
    score every crawl document by its perplexity under an LM trained
    on a trusted reference corpus; keep the low-perplexity side), with
    the KenLM 5-gram replaced by a deterministic add-one-smoothed
    BIGRAM LM fit on the ``ref_col == true`` slice — the exact,
    oracle-reproducible form of the same mechanic (the n-gram order is
    a dial, not a structural change).

      P(w₂|w₁) = (c(w₁w₂)+1) / (c₁(w₁)+V)       c, c₁, V from the ref
      H(doc)   = −(1/m) Σ ln P  over the doc's m consecutive bigrams
      keep     = H ≤ threshold  (nats; low H ≈ low perplexity)

    Unseen bigram with seen context backs off to ln(1/(c₁(w₁)+V));
    fully-unseen context degrades to ln(1/V) — the add-one formula's
    own limits, no special cases.

    Scale shape: fit = one explode + two hash aggs (bigram counts,
    context totals) over the REFERENCE slice only; inference = the
    doc-bigram explode joined to the count tables (broadcast when they
    fit; at 100 TB the bigram table is count-pruned and the pruned
    mass rides the context backoff — stupid-backoff territory, Brants
    et al. 2007 — documented divergence from this exact small-scale
    form). Determinism: every ln() is quantized ONCE to int64
    micro-units (house integer recipe, see :func:`nb_classifier`),
    per-doc accumulation is exact integer, one final division.

    Returns (doc_id, n_bigrams, cross_entropy, keep) — NULL
    cross_entropy/keep for docs with <2 tokens.
    """
    # tokenize ONCE into a materialized column; bigrams AND the ref
    # vocabulary both derive from it (a separate _alnum_tokens for the
    # vocab count re-ran the dominant lower+regexp-split pass over
    # every reference doc — the tokenize-subtree-runs-N× trap the
    # build pipeline documents at index_build.py)
    size = F.size(F.col("toks"))
    big = F.when(size >= 2, F.zip_with(
        F.slice(F.col("toks"), 1, size - 1),
        F.slice(F.col("toks"), 2, size - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))))
    from engine.session import fan_out

    toked = fan_out(docs).select(
        F.col(id_col).alias("doc_id"),
        F.col(ref_col).cast("boolean").alias("is_ref"),
        _alnum_tokens(F.col(text_col)).alias("toks"))
    base = toked.select("doc_id", "is_ref", big.alias("bigrams"))
    ref_bi = (base.where("is_ref")
              .select(F.explode("bigrams").alias("b"))
              .select("b.w1", "b.w2"))
    c_bi = ref_bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    c_ctx = ref_bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    ref_toks = (toked.where("is_ref")
                .select(F.explode("toks").alias("tok")))
    vocab = float(ref_toks.distinct().count() or 1)

    def _i6(col):
        return F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("long")

    vl = F.lit(vocab)
    w_bi = c_bi.join(c_ctx, "w1").select(
        "w1", "w2",
        _i6(F.log((F.col("c") + 1.0) / (F.col("c1") + vl))).alias("lp"))
    w_ctx = c_ctx.select(
        "w1", _i6(F.log(1.0 / (F.col("c1") + vl))).alias("lp0"))
    lp_unseen = _i6(F.log(1.0 / vl))

    db = (base.select("doc_id", F.explode("bigrams").alias("b"))
          .select("doc_id", "b.w1", "b.w2"))
    per_doc = (db.join(w_bi, ["w1", "w2"], "left")
               .join(w_ctx, "w1", "left")
               .select("doc_id",
                       F.coalesce("lp", "lp0", lp_unseen).alias("lp"))
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                    F.sum("lp").alias("slp")))
    h = (-F.col("slp").cast("double")
         / (F.col("n_bigrams") * F.lit(1e6)))
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_bigrams", F.lit(0).cast("long"))
                    .alias("n_bigrams"),
                    round_half_up(h, ndigits).alias("cross_entropy"))
            .withColumn("keep", F.col("cross_entropy") <= threshold))


def categorize_text(docs: DataFrame, text_col: str = "text",
                    max_tokens: int = 4, top_n: int = 20) -> DataFrame:
    """ES ``categorize_text`` aggregation, as a DETERMINISTIC template
    grouper: semi-structured log-like messages collapse into pattern
    buckets by (1) lowercase alnum tokenization, (2) normalizing every
    digit-bearing token to the ``<num>`` placeholder — the step that
    folds "k 69" / "k 7" into one category — and (3) keying on the
    first ``max_tokens`` normalized tokens. ES's own implementation is
    a heuristic token-weight tree whose buckets are version-dependent
    (the docs say so); this pins the reproducible core — number
    neutralization + leading-token template — so the result is exact,
    engine-portable and oracle-checkable. Buckets rank by (doc count
    desc, category asc), top-N via TakeOrderedAndProject.

    Scale: one per-row Catalyst projection (no UDF) + one map-side-
    combinable count agg on the category key + a heap-merged top-N —
    bounded output, no corpus-sized shuffle beyond the key agg.
    Reference scope: the Lucene stack the reference wraps ships this
    agg family (GROUP_12 SearchFiles.java:1).
    """
    from pyspark.sql import Window

    toks = F.expr(
        f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x <> '')")
    norm = F.transform(
        F.slice(toks, 1, int(max_tokens)),
        lambda t: F.when(t.rlike("[0-9]"), F.lit("<num>")).otherwise(t))
    cat = F.array_join(norm, " ")
    cells = (docs.select(cat.alias("category"))
             .where(F.col("category") != "")
             .groupBy("category").agg(F.count(F.lit(1)).alias("n_docs")))
    top = cells.orderBy(F.desc("n_docs"), F.asc("category")).limit(top_n)
    w = Window.orderBy(F.desc("n_docs"), F.asc("category"))
    return top.withColumn("rank", F.row_number().over(w))


def categorize_text_sql(table_expr: str, text_col: str = "text",
                        max_tokens: int = 4, top_n: int = 20) -> str:
    """DuckDB twin of :func:`categorize_text` (same token pipeline)."""
    return f"""
WITH toks AS (
  SELECT [CASE WHEN regexp_matches(x, '[0-9]') THEN '<num>' ELSE x END
          for x in list_slice(
            [x for x in regexp_split_to_array(lower({text_col}),
                                              '[^a-z0-9]+')
             if x <> ''], 1, {int(max_tokens)})] AS t
  FROM {table_expr}),
c AS (SELECT array_to_string(t, ' ') AS category FROM toks
      WHERE len(t) > 0),
a AS (SELECT category, count(*)::BIGINT AS n_docs FROM c GROUP BY 1),
r AS (SELECT category, n_docs,
             row_number() OVER (ORDER BY n_docs DESC, category ASC)
               AS rank
      FROM a)
SELECT category, n_docs, rank FROM r WHERE rank <= {int(top_n)}
"""


def terms_agg_with_other(df: DataFrame, field_col: str, size: int,
                         missing: str = "(none)") -> DataFrame:
    """ES ``terms`` aggregation with the two response pieces the
    simpler facet entries skip: the ``missing`` parameter (NULL field
    values become a named bucket competing like any other) and
    ``sum_other_doc_count`` (docs in buckets beyond the ``size`` cut
    — emitted here as a ``_other_`` sentinel row with NULL rank, the
    value_count_missing _global-row convention). Single-engine exact,
    so doc_count_error_upper_bound ≡ 0 and is omitted.

    Plan: one map-side-combinable (key → count) agg; the size cut is
    orderBy+limit = TakeOrderedAndProject (per-partition heap, never
    a global window over all buckets — the top-k lesson), rank via
    row_number over the ``size`` survivors, and the other-sum is
    total − top-sum from two 1-row frames. Ties break (count desc,
    key asc) — deterministic cross-engine. Reference scope: the ES
    agg family of the Lucene stack the reference wraps (GROUP_12
    SearchFiles.java:1)."""
    g = df.select(F.coalesce(F.col(field_col), F.lit(missing))
                  .alias("key"))
    counts = g.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.desc("n"), F.asc("key")).limit(size)
    w = Window.orderBy(F.desc("n"), F.asc("key"))
    top = top.withColumn("rank", F.row_number().over(w))
    total = g.agg(F.count(F.lit(1)).alias("t"))
    topsum = top.agg(F.sum("n").alias("s"))
    other = (total.crossJoin(topsum)
             .select(F.lit("_other_").alias("key"),
                     (F.col("t") - F.col("s")).cast("long").alias("n"),
                     F.lit(None).cast("int").alias("rank")))
    return (top.select("key", F.col("n").cast("long").alias("n"), "rank")
            .unionAll(other))


def terms_agg_with_other_sql(table_expr: str, field_expr: str,
                             size: int,
                             missing: str = "(none)") -> str:
    """DuckDB twin of :func:`terms_agg_with_other`."""
    return f"""
WITH g AS (
  SELECT coalesce(({field_expr}), '{missing}') AS key
  FROM {table_expr}),
c AS (SELECT key, count(*)::BIGINT AS n FROM g GROUP BY key),
r AS (SELECT key, n,
             row_number() OVER (ORDER BY n DESC, key ASC)::INT AS rank
      FROM c),
top AS (SELECT * FROM r WHERE rank <= {size})
SELECT key, n, rank FROM top
UNION ALL
SELECT '_other_' AS key,
       ((SELECT count(*) FROM g) - (SELECT sum(n) FROM top))::BIGINT
         AS n,
       NULL::INT AS rank
"""
