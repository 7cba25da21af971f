"""Training-data curation operators beyond dedup/stats: benchmark
decontamination, Gopher-style repetition filters, deterministic
stratified sampling, PII scrubbing.

All pure Catalyst column expressions / hash-agg plans (portable to the
DuckDB oracle; no Python on the hot path). Scale notes inline — every
op is a narrow per-row transform plus at most one map-side-combinable
hash aggregation; the only join (decontamination) broadcasts the small
eval side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..portable import round_half_up

_ALNUM_TOKEN = "[^a-z0-9]+"


def _tokens(col):
    return F.filter(F.split(F.lower(col), _ALNUM_TOKEN),
                    lambda t: t != F.lit(""))


def ngrams_col(toks, n: int):
    """Consecutive word n-grams (NON-distinct, order-preserving) as an
    array column — zip_with against 1..n-1 shifted slices, O(len) per
    row (the element_at-in-transform trap re-evaluates the tokenize
    subtree per element: O(len²); see CLAUDE.md)."""
    size = F.size(toks)
    out = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(size - j, F.lit(0)))
        out = F.zip_with(out, shifted,
                         lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(out, lambda x: x.isNotNull())


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap against an eval set)
# ---------------------------------------------------------------------------

def decontaminate(docs: DataFrame, eval_docs: DataFrame, n: int = 5,
                  threshold: float = 0.05, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Flag training docs that overlap an evaluation benchmark — the
    standard n-gram decontamination pass (GPT-3 appx C / PaLM-style:
    a doc is contaminated when a fraction of its n-grams appears
    verbatim in any eval document).

    Returns (doc_id, n_grams, n_hit, hit_frac, contaminated) where
    n_grams counts the doc's DISTINCT word n-grams, n_hit how many of
    them occur anywhere in ``eval_docs``, hit_frac their ratio (NULL
    when the doc has no n-gram), contaminated = hit_frac >= threshold.

    Scale shape: the eval n-gram set is benchmark-sized (thousands of
    docs) → distinct + broadcast left join; the corpus side is one
    explode over distinct per-doc n-grams and one (doc_id) hash-agg.
    At 100 TB the corpus explode shuffles nothing — the join is
    map-side against the broadcast eval set, and the agg combines
    map-side. Grams compare as md5 hashes (8-byte join keys, not raw
    strings) — collision odds at benchmark scale are negligible and
    identical cross-engine.
    """
    grams = F.array_distinct(ngrams_col(_tokens(F.col(text_col)), n))
    ev = (eval_docs
          .select(F.explode(F.array_distinct(
              ngrams_col(_tokens(F.col(text_col)), n))).alias("gram"))
          .select(F.md5("gram").alias("h")).distinct()
          .withColumn("_hit", F.lit(1)))
    doc_grams = (docs.select(F.col(id_col).alias("doc_id"),
                             F.explode_outer(grams).alias("gram"))
                 .withColumn("h", F.md5("gram")))
    per_doc = (doc_grams
               .join(F.broadcast(ev), "h", "left")
               .groupBy("doc_id")
               .agg(F.count("gram").alias("n_grams"),
                    F.count("_hit").alias("n_hit")))
    hf = F.when(F.col("n_grams") > 0,
                F.col("n_hit").cast("double") / F.col("n_grams"))
    return per_doc.select(
        "doc_id", "n_grams", "n_hit",
        round_half_up(hf, 6).alias("hit_frac"),
        F.coalesce(hf >= threshold, F.lit(False)).alias("contaminated"))


# ---------------------------------------------------------------------------
# Gopher-style repetition filters
# ---------------------------------------------------------------------------

def repetition_scores(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-doc repetition signals (Gopher §A1.1 repetition rules,
    adapted to word n-grams):

    dup_2gram_frac / dup_3gram_frac — fraction of n-gram OCCURRENCES
        that are repeats: 1 − distinct/total (0 when total = 0);
    top_2gram_frac — occurrences of the single most frequent 2-gram
        over all 2-gram occurrences (Gopher's top-n-gram rule; ties on
        count don't matter — the max count is unique by value).

    Pure per-row array math — no shuffle at all; at 100 TB this is a
    single narrow pass over the corpus.
    """
    toks = _tokens(F.col(text_col))
    out = docs.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
    cols = ["doc_id"]
    for n in (2, 3):
        g = ngrams_col(F.col("t"), n)
        tot = F.size(g)
        dup = F.when(tot > 0,
                     F.lit(1.0) - F.size(F.array_distinct(g)) / tot
                     .cast("double")).otherwise(F.lit(0.0))
        out = out.withColumn(f"dup_{n}gram_frac", round_half_up(dup, 6))
        cols.append(f"dup_{n}gram_frac")
    # materialize the 2-gram array FIRST: an expression referenced
    # inside transform() re-evaluates its whole subtree per element
    # (the repo's documented O(n²)→O(n³) trap); a column reference is
    # evaluated once per row
    out = out.withColumn("g2", ngrams_col(F.col("t"), 2))
    g2 = F.col("g2")
    # max occurrence count of any 2-gram: for each element, count its
    # occurrences in the array, take the max (O(len²) element compares
    # inside ONE row's array — arrays are document-sized, not corpus-
    # sized, and it stays whole-stage-codegen JVM work)
    topc = F.array_max(F.transform(
        g2, lambda x: F.size(F.filter(g2, lambda y: y == x))))
    top = F.when(F.size(g2) > 0,
                 topc.cast("double") / F.size(g2)).otherwise(F.lit(0.0))
    out = out.withColumn("top_2gram_frac", round_half_up(top, 6))
    cols.append("top_2gram_frac")
    return out.select(*cols)


def shared_ngram_report(docs: DataFrame, n: int = 10,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Cross-document exact-substring duplication signal (the window-
    hash form of Lee et al.'s "Deduplicating Training Data Makes
    Language Models Better": an n-token window occurring verbatim in
    ≥2 documents marks duplicated text that near-dup doc-level methods
    miss — boilerplate, licenses, quoted passages).

    Returns (doc_id, n_windows, n_shared, shared_frac): distinct
    n-token windows per doc, how many of them occur in at least one
    OTHER doc, and their ratio (NULL when the doc is shorter than n).

    Scale shape: windows explode once (distinct per doc), aggregate by
    window hash counting distinct docs (map-side combinable), join the
    shared flag back on the hash — two shuffles, both on 8-byte md5
    prefixes, nothing quadratic; the standard 100 TB exact-substring
    pass."""
    grams = F.array_distinct(ngrams_col(_tokens(F.col(text_col)), n))
    dg = (docs.select(F.col(id_col).alias("doc_id"),
                      F.explode_outer(grams).alias("gram"))
          .withColumn("h", F.md5("gram")))
    per_gram = (dg.where(F.col("h").isNotNull())
                .groupBy("h")
                .agg(F.count_distinct("doc_id").alias("n_docs_g")))
    joined = dg.join(per_gram, "h", "left")
    out = (joined.groupBy("doc_id")
           .agg(F.count("gram").alias("n_windows"),
                F.count(F.when(F.col("n_docs_g") >= 2, 1)).alias("n_shared")))
    sf = F.when(F.col("n_windows") > 0,
                F.col("n_shared").cast("double") / F.col("n_windows"))
    return out.select("doc_id", "n_windows", "n_shared",
                      round_half_up(sf, 6).alias("shared_frac"))


def pack_sequences(docs: DataFrame, budget: int = 512,
                   group_col: str = "lang", text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """GPT-style sequence packing layout: within each group, documents
    are concatenated in doc_id order and split into fixed ``budget``-
    token training sequences (documents straddle sequence boundaries —
    the standard causal-LM packing, not first-fit binning).

    Returns (doc_id, grp, n_tok, tok_start, seq_start, seq_end,
    n_seqs): the exclusive cumulative token offset and the first/last
    sequence index the doc lands in. Zero-token docs occupy the
    sequence at their offset (seq_end = seq_start, n_seqs = 1).

    Scale shape: one window cumsum per group — at 100 TB the group key
    would include a time/shard component so no single group's sort
    dominates; the layout stays deterministic because offsets depend
    only on (grp, doc_id) order, not partitioning."""
    from pyspark.sql import Window

    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(group_col).alias("grp"),
                       F.size(_tokens(F.col(text_col)))
                       .cast("long").alias("n_tok"))
    w = Window.partitionBy("grp").orderBy("doc_id") \
              .rowsBetween(Window.unboundedPreceding, -1)
    start = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    out = base.withColumn("tok_start", start)
    seq_start = F.floor(F.col("tok_start") / budget)
    seq_end = F.floor(
        (F.col("tok_start") + F.greatest(F.col("n_tok") - 1, F.lit(0)))
        / budget)
    return out.select(
        "doc_id", "grp", "n_tok", "tok_start",
        seq_start.cast("long").alias("seq_start"),
        seq_end.cast("long").alias("seq_end"),
        (seq_end - seq_start + 1).cast("long").alias("n_seqs"))


# ---------------------------------------------------------------------------
# Deterministic stratified sampling (data mixing)
# ---------------------------------------------------------------------------

def hash_sample(docs: DataFrame, rates: dict[str, float],
                group_col: str = "lang", id_col: str = "doc_id",
                default_rate: float = 1.0) -> DataFrame:
    """Deterministic per-group downsampling to target mixture rates:
    keep a row iff u(doc) < rate(group), where u is a uniform-ish
    [0,1) hash of the doc id — md5's first 8 hex digits / 2³²
    (reproducible across engines AND across runs/partitionings, unlike
    DataFrame.sample whose outcome depends on partition layout).

    Returns the kept rows (doc_id, group, u) with u rounded. Narrow
    per-row filter — zero shuffle; rebalancing a 100 TB mixture is one
    scan. Rates outside [0,1] clamp naturally (u < rate).
    """
    u = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                16, 10).cast("double") / F.lit(4294967296.0))
    rate = F.lit(float(default_rate))
    for g_val, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == g_val, F.lit(float(r))) \
                .otherwise(rate)
    return (docs.select(F.col(id_col).alias("doc_id"),
                        F.col(group_col).alias("grp"), u.alias("u"))
            .where(F.col("u") < rate)
            .select("doc_id", "grp", round_half_up(F.col("u"), 6).alias("u")))


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (Xie et al. 2023,
# arXiv:2302.03169 — the hashed n-gram feature recipe behind
# domain-targeted pre-training data selection)
# ---------------------------------------------------------------------------

def _hashed_gram_features(docs: DataFrame, n_buckets: int,
                          text_col: str, id_col: str) -> DataFrame:
    """(doc_id, b): one row per unigram/bigram OCCURRENCE, hashed into
    ``n_buckets`` via md5's first 8 hex digits (the engine's
    cross-engine-reproducible hash; same recipe as hash_sample)."""
    toks = _tokens(F.col(text_col))
    grams = F.concat(toks, ngrams_col(toks, 2))
    return (docs
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(grams).alias("g"))
            .select("doc_id",
                    (F.conv(F.substring(F.md5("g"), 1, 8), 16, 10)
                     .cast("long") % n_buckets).alias("b")))


def dsir_weights(docs: DataFrame, target: DataFrame,
                 n_buckets: int = 10_000, alpha: float = 1.0,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """DSIR importance log-weights: fit bag-of-hashed-ngrams
    multinomials on the target set (p) and the raw corpus (q), then
    score every raw doc by ``logw = Σ_grams (log p[h(g)] − log q[h(g)])``
    — docs distributionally close to the target get high weight.

    Divergence from the paper, documented: add-``alpha`` Laplace
    smoothing over the bucket vocabulary instead of the paper's
    uniform-mixture smoothing — same support-covering purpose, exactly
    replicable in the DuckDB oracle.

    Scale shape: two feature scans (raw + target), two bucket hash
    aggs, and a per-(doc, bucket) agg joined against the ≤``n_buckets``-row
    broadcast log-ratio table — nothing keyed wider than the bucket
    space except the per-doc agg, which is map-side combinable. The
    target side is the small one by construction (a hand-curated
    domain sample), so at 100 TB the cost is one pass over the raw
    corpus. Docs with zero features (empty text) emit no row.

    Returns (doc_id, n_feats, logw) — logw UNROUNDED (callers rank on
    a rounded copy per the house determinism rule).
    """
    raw = _hashed_gram_features(docs, n_buckets, text_col, id_col)
    tgt = _hashed_gram_features(target, n_buckets, text_col, id_col)
    cq = raw.groupBy("b").agg(F.count(F.lit(1)).cast("double").alias("cq"))
    cp = tgt.groupBy("b").agg(F.count(F.lit(1)).cast("double").alias("cp"))
    tots = (cq.agg(F.sum("cq").alias("tq"))
            .crossJoin(cp.agg(F.sum("cp").alias("tp"))))
    a, ab = float(alpha), float(alpha) * n_buckets
    lr = (cq.join(cp, "b", "left").crossJoin(F.broadcast(tots))
          .select("b",
                  (F.log((F.coalesce(F.col("cp"), F.lit(0.0)) + a)
                         / (F.col("tp") + ab))
                   - F.log((F.col("cq") + a) / (F.col("tq") + ab)))
                  .alias("lr")))
    per_doc = raw.groupBy("doc_id", "b").agg(
        F.count(F.lit(1)).cast("double").alias("cnt"))
    return (per_doc.join(F.broadcast(lr), "b")
            .groupBy("doc_id")
            .agg(F.sum("cnt").cast("long").alias("n_feats"),
                 F.sum(F.col("cnt") * F.col("lr")).alias("logw")))


def dsir_sample(docs: DataFrame, target: DataFrame, k: int,
                n_buckets: int = 10_000, alpha: float = 1.0,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """DSIR's selection step: Gumbel top-k over the importance
    weights (equivalent to sampling k docs without replacement with
    probability ∝ exp(logw) — the paper's resampling), made
    deterministic by drawing each doc's uniform from the md5 id hash.

    The rank cut is ``orderBy(...).limit(k)`` — Catalyst compiles it
    to TakeOrderedAndProject (per-partition heaps + driver merge of k
    rows), so the global top-k never funnels the corpus through one
    partition. Returns (doc_id, n_feats, key, rank) with the Gumbel
    key rounded for cross-engine stability.
    """
    w = dsir_weights(docs, target, n_buckets, alpha, text_col, id_col)
    u = ((F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                 16, 10).cast("double") + F.lit(0.5))
         / F.lit(4294967296.0))
    key = round_half_up(F.col("logw") - F.log(-F.log(u)), 6)
    ranked = (w.select("doc_id", "n_feats", key.alias("key"))
              .orderBy(F.desc("key"), F.asc("doc_id")).limit(k))
    from pyspark.sql import Window

    # unpartitioned window is safe HERE: it runs on the k rows that
    # survived the TakeOrderedAndProject, not on the corpus
    wn = Window.orderBy(F.desc("key"), F.asc("doc_id"))
    return ranked.withColumn("rank", F.row_number().over(wn))


# ---------------------------------------------------------------------------
# PII scrubbing (regex redaction)
# ---------------------------------------------------------------------------

# RE2-safe (no lookaround/backreferences) so the DuckDB oracle runs the
# IDENTICAL patterns; applied in this order (email first — an email
# contains digit runs a later rule could half-match)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}",
     "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}[ \-]\d{3,4}[ \-]\d{4}\b", "[PHONE]"),
]


def pii_scrub(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Redact emails / IPv4s / phone-shaped numbers; returns
    (doc_id, n_email, n_ipv4, n_phone, clean_hash) where clean_hash is
    md5 of the redacted text (the scrubbed corpus itself would be
    written at scale; the hash keeps the oracle row narrow). Counting
    uses the SAME patterns as replacement, matched on the progressively
    redacted text, so overlapping rules count consistently. Narrow
    per-row transform — zero shuffle."""
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
                      .cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return docs.select(F.col(id_col).alias("doc_id"), *counts,
                       F.md5(cur).alias("clean_hash"))


# ---------------------------------------------------------------------------
# URL / domain ops — the CCNet / RefinedWeb-style first curation stage:
# extract URLs, aggregate per-doc domains, drop docs hitting a domain
# blocklist. RE2-safe patterns shared verbatim with the DuckDB oracle.
# ---------------------------------------------------------------------------

URL_RE = r"https?://[a-z0-9._/\-]+"
DOMAIN_RE = r"https?://([a-z0-9.\-]+)"


def url_stats(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Per-doc URL extraction + domain summary: (doc_id, n_urls,
    domains) with ``domains`` the sorted distinct domain list joined
    by ',' (string form keeps the oracle hash stable across engines'
    array renderings). Narrow per-row transform — zero shuffle; at
    scale this is the column the domain-level reputation join keys on.
    """
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), 0)
    doms = F.array_sort(F.array_distinct(F.transform(
        urls, lambda u: F.regexp_extract(u, DOMAIN_RE, 1))))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(urls).cast("long").alias("n_urls"),
        F.array_join(doms, ",").alias("domains"))


def domain_filter(docs: DataFrame, blocklist: list[str],
                  text_col: str = "text") -> DataFrame:
    """Drop docs whose extracted URL domains intersect ``blocklist``
    (broadcast as an in-expression array literal — membership is a
    per-row filter, no join, no shuffle; at web scale a >100k-domain
    list becomes a broadcast left_anti join instead)."""
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), 0)
    doms = F.array_distinct(F.transform(
        urls, lambda u: F.regexp_extract(u, DOMAIN_RE, 1)))
    bl = F.array(*[F.lit(d) for d in sorted(set(blocklist))])
    return docs.where(F.size(F.array_intersect(doms, bl)) == 0)


def line_dedup(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", min_docs: int = 2,
               chunk_tokens: int | None = None) -> DataFrame:
    """Cross-document duplicate-line removal (the CCNet / RefinedWeb
    first-stage cleaner: a line that appears verbatim in ``min_docs``
    or more documents is boilerplate — headers, footers, nav bars,
    license banners — and is dropped from EVERY document; unique lines
    survive).  ``chunk_tokens`` switches the unit from newline-split
    lines to fixed-size whitespace-token chunks for corpora without
    line structure (the unit definition is the only difference — the
    dedup itself is identical).

    Plan shape at 100 TB (the published CCNet plan): explode to unit
    rows, ONE hash aggregate on the unit's md5 counting distinct
    containing docs (map-side combinable; the 8-byte digest is the
    join key, never the raw line), a join back on the digest, and ONE
    per-doc re-assembly aggregate ordered by unit position.  Two
    shuffles total, both keyed by hash — no skew beyond genuinely
    viral lines, which is exactly the boilerplate being removed.

    Within-document repeats of a unit that no OTHER doc contains are
    kept (min_docs counts DISTINCT documents, per CCNet).  Every input
    doc appears in the output, even if all its units were removed.

    Returns (id_col, n_units, n_removed, clean_hash) where clean_hash
    is md5 of the surviving text (units re-joined in original order) —
    the scrubbed corpus itself would be row-per-doc output; hashing
    keeps the oracle comparison value-stable.
    """
    sep = " " if chunk_tokens else "\n"
    if chunk_tokens:
        w = int(chunk_tokens)
        toks = docs.select(
            id_col, F.split(F.trim(F.col(text_col)), r"\s+").alias("t"))
        toks = toks.select(id_col, F.filter(
            F.col("t"), lambda x: x != F.lit("")).alias("t"))
        n = F.size("t")
        units_col = F.when(n > 0, F.transform(
            F.sequence(F.lit(0), F.ceil(n / F.lit(w)).cast("int") - 1),
            lambda i: F.array_join(
                F.slice(F.col("t"), i * w + 1, w), " "))
        ).otherwise(F.array().cast("array<string>"))
        base = toks.select(id_col, units_col.alias("units"))
    else:
        base = docs.select(
            id_col,
            F.filter(F.split(F.col(text_col), r"\n"),
                     lambda x: F.trim(x) != F.lit("")).alias("units"))
    rows = base.select(id_col, F.size("units").alias("n_units"),
                       F.posexplode("units").alias("pos", "unit"))
    rows = rows.withColumn("h", F.md5("unit"))
    counts = (rows.groupBy("h")
              .agg(F.count_distinct(F.col(id_col)).alias("nd")))
    kept = (rows.join(counts, "h")
            .where(F.col("nd") < min_docs))
    rebuilt = (kept.groupBy(id_col)
               .agg(F.count(F.lit(1)).cast("long").alias("n_kept"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "unit"))),
                            lambda s: s["unit"]),
                        sep).alias("clean")))
    out = (base.select(id_col, F.size("units").cast("long")
                       .alias("n_units"))
           .join(rebuilt, id_col, "left")
           .select(
               id_col, "n_units",
               (F.col("n_units")
                - F.coalesce(F.col("n_kept"), F.lit(0))).alias("n_removed"),
               F.md5(F.coalesce(F.col("clean"), F.lit("")))
               .alias("clean_hash")))
    return out


def exact_substring_dedup(docs: DataFrame, n: int = 10,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Exact duplicated-SPAN removal — the ExactSubstr dedup of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better" (arXiv:2107.06499): a span of ≥ n tokens occurring verbatim
    in more than one document is excised from every document except
    one, so boilerplate/licenses/quotations are trained on once while
    both documents' unique text survives (doc-level dedup would either
    keep both copies or drop a whole document).

    Distributed form: instead of the paper's monolithic suffix array,
    duplicated spans are found as n-token windows whose hash occurs in
    ≥ 2 documents (every duplicated span of length ≥ n is a union of
    such windows, so the two methods remove the same text up to the
    n-1-token span boundary; divergences documented below).  The KEEP
    copy is the lowest ``doc_id`` containing the window (the paper
    keeps an arbitrary one).  Within-document repeats are kept — the
    owner doc keeps ALL its copies (documented divergence; the paper's
    suffix array also collapses those).

    Scale shape (the 100 TB pass): windows posexplode once (O(total
    tokens) rows carrying only (doc_id, pos, 16-byte hash prefix)), one
    map-side-combinable min-agg per window hash, one hash join back,
    one per-doc collect of removal starts (bounded by the document's
    own length).  Interval merging and text rebuild are per-row array
    ops inside whole-stage codegen — nothing quadratic in the corpus,
    no Python.

    Output: (doc_id, n_tokens, n_removed, cleaned_text) where
    cleaned_text re-joins the surviving analyzer tokens with single
    spaces (lowercased alnum tokens — the same normalization every
    other curation signal uses; NULL when no tokens survive).
    """
    t = _tokens(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc_id"), t.alias("t"))
    grams = ngrams_col(F.col("t"), n)  # non-distinct, position-ordered
    dg = base.select("doc_id",
                     F.posexplode_outer(grams).alias("pos", "gram"))
    dg = dg.select("doc_id", "pos", F.md5("gram").alias("h"))
    owner = (dg.where(F.col("h").isNotNull())
             .groupBy("h").agg(F.min("doc_id").alias("owner")))
    rem = (dg.join(owner, "h")
           .where(F.col("owner") < F.col("doc_id"))
           .groupBy("doc_id")
           .agg(F.collect_set("pos").alias("starts")))
    joined = base.join(rem, "doc_id", "left")
    starts = F.coalesce(F.col("starts"),
                        F.array().cast("array<int>"))
    removed = F.array_distinct(F.flatten(F.transform(
        starts, lambda s: F.sequence(s, s + F.lit(n - 1)))))
    # sequence(0, -1) yields a DESCENDING [0, -1] in Spark — guard the
    # empty-doc case explicitly
    idx = F.when(F.size("t") > 0,
                 F.sequence(F.lit(0), F.size("t") - 1)) \
        .otherwise(F.array().cast("array<int>"))
    kept = F.filter(
        F.zip_with(F.col("t"), idx,
                   lambda tok, i: F.struct(tok.alias("tok"),
                                           i.alias("i"))),
        lambda s: ~F.array_contains(removed, s["i"]))
    out = joined.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.size(removed).cast("long").alias("n_removed"),
        F.when(F.size(kept) > 0,
               F.array_join(F.transform(kept, lambda s: s["tok"]),
                            " ")).alias("cleaned_text"))
    return out


def bloom_decontaminate(docs: DataFrame, eval_docs: DataFrame,
                        n: int = 5, threshold: float = 0.05,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        n_words: int | None = None) -> DataFrame:
    """Space-bounded decontamination: the same GPT-3-style n-gram
    overlap pass as :func:`decontaminate`, but the eval set is
    compressed into a FIXED 16 KB Bloom filter instead of a
    benchmark-sized distinct+broadcast join — the shape that still
    works when the 'benchmark' is itself huge (e.g. held-out shards,
    multi-benchmark unions) or when thousands of training shards each
    probe the same filter: build once, broadcast 4096 rows, zero
    eval-side reshuffles. One-sided by construction: every truly
    overlapping n-gram tests positive (no false negatives → no
    contamination escapes); false positives inflate n_maybe at rate
    ≈ (1 − e^{−k·x/m})^k, so ``contaminated`` is a conservative
    OVER-flag relative to :func:`decontaminate` — the right failure
    direction for decontamination. Returns (doc_id, n_grams, n_maybe,
    maybe_frac, contaminated).
    """
    from ..sketches import bloom_build, bloom_probe, bloom_size_for

    grams = F.array_distinct(ngrams_col(_tokens(F.col(text_col)), n))
    ev = (eval_docs
          .select(F.explode(F.array_distinct(
              ngrams_col(_tokens(F.col(text_col)), n))).alias("gram"))
          .select(F.md5("gram").alias("h")).distinct())
    if n_words is None:
        # size the filter to the eval set (~10 bits/element for ~1%
        # FP): one count() over the benchmark-sized gram set — an
        # UNDERSIZED filter saturates and flags everything (measured:
        # 275k grams into the 131k-bit default → FP ≈ 1 on the real
        # corpus), which stays one-sided but useless. Persist around
        # the count+build pair or the tokenize+distinct eval pipeline
        # (the dominant cost) runs twice.
        ev = ev.persist()
        sized = True
        n_words = bloom_size_for(ev.count())
    else:
        sized = False
    filt = bloom_build(ev, "h", n_words=n_words)
    doc_grams = (docs.select(F.col(id_col).alias("doc_id"),
                             F.explode_outer(grams).alias("gram"))
                 .withColumn("h", F.md5("gram")))
    # bloom_probe COLLECTS the filter eagerly (reading the persisted
    # ev once more), so the cache can be released right after
    probed = bloom_probe(doc_grams, "h", filt, n_words=n_words)
    if sized:
        ev.unpersist()
    per_doc = (probed.groupBy("doc_id")
               .agg(F.count("gram").alias("n_grams"),
                    F.sum(F.when(F.col("maybe"), 1).otherwise(0))
                    .cast("long").alias("n_maybe")))
    mf = F.when(F.col("n_grams") > 0,
                F.col("n_maybe").cast("double") / F.col("n_grams"))
    return per_doc.select(
        "doc_id", "n_grams", "n_maybe",
        round_half_up(mf, 6).alias("maybe_frac"),
        F.coalesce(mf >= threshold, F.lit(False)).alias("contaminated"))


# ---------------------------------------------------------------------------
# ES ip_prefix aggregation (over deterministically derived client IPs)
# ---------------------------------------------------------------------------

IP_MIX = 2654435761          # Knuth multiplicative hash (golden ratio 2^32)


def with_ip32(events: DataFrame, id_col: str = "user_id") -> DataFrame:
    """Attach a deterministic synthetic client IPv4 (as uint32 in an
    int64 column) per user: the Knuth multiplicative mix spreads the
    dense user_id space across the address space — pure integer
    arithmetic, bit-identical in any engine."""
    ip = (F.col(id_col) * F.lit(IP_MIX)) % F.lit(4294967296)
    return events.withColumn("ip32", ip.cast("long"))


def ip32_sql(id_col: str = "user_id") -> str:
    """DuckDB twin of :func:`with_ip32`'s expression."""
    return f"((({id_col}) * {IP_MIX}) % 4294967296)"


def ip_prefix_agg(events: DataFrame, prefix_len: int = 8,
                  id_col: str = "user_id") -> DataFrame:
    """ES ``ip_prefix`` bucket aggregation: events bucketed by the
    /``prefix_len`` network of the client IP, with event and distinct-
    user counts per bucket. All-integer shifts and masks → exact in
    both engines; output bounded by 2^prefix_len buckets (the agg's
    own contract — ES caps prefix_len at 32 the same way).
    Reference scope: the Lucene stack the reference wraps ships this
    agg family (GROUP_12 SearchFiles.java:1)."""
    assert 1 <= prefix_len <= 32
    g = with_ip32(events, id_col)
    net = F.shiftleft(F.shiftright(F.col("ip32"), 32 - prefix_len),
                      32 - prefix_len)
    prefix = F.concat_ws(
        ".",
        F.shiftright(net, 24).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(net, 16).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(net, 8).bitwiseAND(F.lit(255)).cast("string"),
        net.bitwiseAND(F.lit(255)).cast("string"))
    return (g.withColumn("prefix",
                         F.concat(prefix, F.lit(f"/{prefix_len}")))
            .groupBy("prefix")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count_distinct(F.col(id_col)).alias("n_users")))


def ip_prefix_sql(table_expr: str, prefix_len: int = 8,
                  id_col: str = "user_id") -> str:
    """DuckDB twin of :func:`ip_prefix_agg`."""
    net = (f"(({ip32_sql(id_col)} >> {32 - prefix_len}) "
           f"<< {32 - prefix_len})")
    prefix = (f"(CAST(({net} >> 24) & 255 AS VARCHAR) || '.' || "
              f"CAST(({net} >> 16) & 255 AS VARCHAR) || '.' || "
              f"CAST(({net} >> 8) & 255 AS VARCHAR) || '.' || "
              f"CAST({net} & 255 AS VARCHAR) || '/{prefix_len}')")
    return (f"SELECT {prefix} AS prefix, count(*)::BIGINT AS n, "
            f"count(DISTINCT {id_col})::BIGINT AS n_users "
            f"FROM {table_expr} GROUP BY 1")


def _ip_dotted(ip: int) -> str:
    return ".".join(str((ip >> s) & 255) for s in (24, 16, 8, 0))


def _ip_range_key(lo: int | None, hi: int | None) -> str:
    """ES ip_range bucket key: ``from-to`` with ``*`` for open ends."""
    return (f"{_ip_dotted(lo) if lo is not None else '*'}-"
            f"{_ip_dotted(hi) if hi is not None else '*'}")


def ip_range_agg(events: DataFrame,
                 ranges: list[tuple[int | None, int | None]],
                 id_col: str = "user_id") -> DataFrame:
    """ES ``ip_range`` bucket aggregation: per range [from, to) —
    ``from`` inclusive, ``to`` exclusive, either end open — the event
    count and distinct-user count. Ranges MAY OVERLAP (each bucket is
    an independent filter, the ES contract), so this is deliberately
    NOT a group-by: one conditional-aggregation pass computes every
    bucket's pair in a single scan (map-side combinable counts; the
    per-range distincts are the agg's own cost, same as ES's
    per-bucket cardinality), then a ``stack`` unpivots the 1-row
    wide result — output is |ranges| rows, corpus-independent.
    All-integer uint32 comparisons: bit-identical cross-engine.
    Reference scope: the ES agg family shipped by the Lucene stack
    the reference wraps (GROUP_12 SearchFiles.java:1)."""
    g = with_ip32(events, id_col)
    aggs, stack_args = [], []
    for i, (lo, hi) in enumerate(ranges):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("ip32") >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col("ip32") < F.lit(hi))
        aggs.append(F.sum(F.when(cond, 1).otherwise(0))
                    .cast("long").alias(f"n_{i}"))
        aggs.append(F.count_distinct(F.when(cond, F.col(id_col)))
                    .alias(f"u_{i}"))
        key = _ip_range_key(lo, hi)
        stack_args.append(f"'{key}', n_{i}, u_{i}")
    wide = g.agg(*aggs)
    return wide.selectExpr(
        f"stack({len(ranges)}, {', '.join(stack_args)}) "
        f"AS (key, n, n_users)")


def ip_range_sql(table_expr: str,
                 ranges: list[tuple[int | None, int | None]],
                 id_col: str = "user_id") -> str:
    """DuckDB twin of :func:`ip_range_agg` — one SELECT per range
    UNION ALLed (the oracle may rescan; the engine side is the
    single-pass plan)."""
    parts = []
    for lo, hi in ranges:
        conds = []
        if lo is not None:
            conds.append(f"{ip32_sql(id_col)} >= {lo}")
        if hi is not None:
            conds.append(f"{ip32_sql(id_col)} < {hi}")
        cond = " AND ".join(conds) if conds else "TRUE"
        key = _ip_range_key(lo, hi)
        parts.append(
            f"SELECT '{key}' AS key, "
            f"count(CASE WHEN {cond} THEN 1 END)::BIGINT AS n, "
            f"count(DISTINCT CASE WHEN {cond} THEN {id_col} END)::BIGINT "
            f"AS n_users FROM {table_expr}")
    return " UNION ALL ".join(parts)


SAMPLER_MIX = 2246822519     # xxhash64 prime2 — distinct from IP_MIX
                             # so the sample gate never correlates
                             # with the synthetic IP buckets


def random_sampler_agg(events: DataFrame, probability: float,
                       id_col: str = "event_id",
                       group_col: str = "event_type") -> DataFrame:
    """ES ``random_sampler`` aggregation (8.2+): sub-aggregations run
    on a random subset of documents and doc counts are scaled back up
    by 1/probability — the agg that makes exploratory aggs O(p·N).
    ES gates each doc on a hash of its id given a seed; the
    deterministic twin here gates on the Knuth-style multiplicative
    mix ``(id·SAMPLER_MIX) mod 2^32 < floor(p·2^32)`` — the same
    inclusion law, reproducible bit-for-bit in any engine (the seed
    is the constant). ES pins probability ∈ (0, 0.5] ∪ {1}; same
    check here.

    Per group the sampled count, the ES-scaled estimate
    ``floor(n/p + 0.5)`` (ONE float division of an exact integer —
    deterministic), and the µu-exact sampled mean of ``value``.
    Scale shape: the gate is a pure narrow filter on the scan (p·N
    rows survive into ONE map-side-combinable agg) — exactly why ES
    built the agg."""
    from engine.portable import round_half_up

    if not (0.0 < probability <= 0.5 or probability == 1.0):
        raise ValueError("random_sampler probability must be in "
                         "(0, 0.5] or exactly 1 (the ES contract)")
    lim = int(probability * 4294967296)
    h = (F.col(id_col) * F.lit(SAMPLER_MIX)) % F.lit(4294967296)
    s = events.where(h < F.lit(lim))
    v_mu = F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")
    n = F.count(F.lit(1)).cast("long")
    return (s.groupBy(group_col)
            .agg(n.alias("n_sampled"),
                 F.floor(n.cast("double") / F.lit(float(probability))
                         + F.lit(0.5)).cast("long").alias("n_est"),
                 round_half_up(F.sum(v_mu) / n / F.lit(1e6), 4)
                 .alias("avg_value")))


def random_sampler_sql(table_expr: str, probability: float,
                       id_col: str = "event_id",
                       group_col: str = "event_type") -> str:
    """DuckDB twin of :func:`random_sampler_agg`."""
    from engine.portable import round_half_up_sql

    lim = int(probability * 4294967296)
    gate = f"((({id_col}) * {SAMPLER_MIX}) % 4294967296) < {lim}"
    avg = round_half_up_sql(
        "sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT))::DOUBLE "
        "/ count(*) / 1e6", 4)
    return (f"SELECT {group_col}, count(*)::BIGINT AS n_sampled, "
            f"CAST(floor(count(*)::DOUBLE / CAST({probability!r} AS "
            f"DOUBLE) + 0.5) AS BIGINT) AS n_est, "
            f"{avg} AS avg_value "
            f"FROM {table_expr} WHERE {gate} GROUP BY 1")
