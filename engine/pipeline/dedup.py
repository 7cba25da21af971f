"""Document deduplication at corpus scale.

Four families, all pure Catalyst column expressions (no UDFs — every
hash is ``md5`` so the DuckDB oracle reproduces results exactly):

* exact:        hash-groupBy on md5(text)
* MinHash+LSH:  word-shingles → n min-hashes → banded signatures →
                bucket self-join → exact-Jaccard verification
* SimHash:      tf-weighted sign-sum over per-term hash bits
* n-gram Jaccard: exact shingle-set Jaccard for candidate pairs

Scale notes: signatures are per-row array expressions (narrow, no
shuffle); the only shuffles are the LSH band self-join (equi-join on
(band_idx, band_hash) — AQE-skew-safe because bucket sizes are tiny
under any reasonable banding) and the final pair dedup. At 100 TB the
band join is the standard MinHash-LSH plan; nothing is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def _tokens(col):
    """Simple shingle tokens: lowercase alnum runs, stopwords KEPT
    (dedup wants raw surface similarity, not analyzed terms)."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT), lambda t: t != F.lit(""))


def shingles_col(text_col, k: int = 3):
    """Word k-shingles as an array column (deduplicated).

    Built by zipping the token array with its own 1..k-1 shifted
    slices — O(n) per row. (An element_at(tokens, i+j) lambda looks
    natural but re-evaluates the whole tokenize subtree per element:
    O(n²) per document — measured 10× slower on real docs.)

    zip_with pads the shorter side with null and concat propagates
    null, so trailing (and too-short-doc) positions drop out in the
    final null-filter.
    """
    toks = _tokens(text_col)
    n = F.size(toks)
    out = toks
    for j in range(1, k):
        shifted = F.slice(toks, j + 1, F.greatest(n - j, F.lit(0)))
        out = F.zip_with(out, shifted,
                         lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(F.filter(out, lambda x: x.isNotNull()))


def exact_dup_groups(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: (content_hash, n_docs, min_doc_id)."""
    return (docs
            .select(F.md5(F.col(text_col)).alias("content_hash"), id_col)
            .groupBy("content_hash")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min(id_col).alias("min_doc_id")))


# MinHash universe: integer hashes mod a Mersenne prime, mixed per
# family with small odd multipliers — one md5 per shingle total, the
# 16 family mins are cheap integer transforms (engine-portable).
MINHASH_P = 2_147_483_647  # 2^31 - 1; (2^20)·P < 2^63, no overflow


def _mh_a(i: int) -> int:
    return 1 + 2 * i


def _mh_b(i: int) -> int:
    return 7919 * i


def _shingle_table(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", shingle_k: int = 3
                   ) -> DataFrame:
    """(doc_id, shingles) with the signature pipeline's exact filter
    and shingle expression — the verify stage's payload source (r6:
    recomputing this narrow map pass is cheaper than building and
    caching a columnar array<string> cache of it; see
    minhash_near_dups)."""
    from engine.session import fan_out

    return (fan_out(docs)
            .where(F.size(_tokens(F.col(text_col))) >= shingle_k)
            .select(F.col(id_col).alias("doc_id"),
                    shingles_col(F.col(text_col), shingle_k)
                    .alias("shingles")))


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n_hashes: int = 16,
                       shingle_k: int = 3) -> DataFrame:
    """(doc_id, shingles, sig: array<long>[n_hashes]).

    Base hash h(s) = int(md5(s)[:8], 16) % P; family i takes
    min((a_i·h + b_i) % P) over shingles.
    """
    sh = shingles_col(F.col(text_col), shingle_k)
    base = F.transform(
        F.col("shingles"),
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10)
        .cast("long") % MINHASH_P)
    def _family(i: int):
        # NB: must close over i via a factory — a `lambda h, i=i:` default
        # arg makes PySpark treat the lambda as the (element, index)
        # two-arg form and silently bind i to the array position.
        a, b = _mh_a(i), _mh_b(i)
        return lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P

    sig = F.array(*[
        F.array_min(F.transform(F.col("hs"), _family(i)))
        for i in range(n_hashes)
    ])
    from engine.session import fan_out

    # the shingle+md5+16-min map side is the pipeline's dominant cost
    # and must not serialize on a one-row-group input (r6 measurement:
    # 11.6 s single-task at sf1.0). Two parts to that:
    # * fan_out parallelizes the projection;
    # * the non-empty filter must NOT mention the shingle column — the
    #   optimizer pushes the filter below the exchange, duplicating
    #   the entire shingle expression onto the single scan task (r6
    #   plan audit: the pushed Filter node carried the full
    #   zip_with/array_distinct tree). size(tokens) >= k is exactly
    #   equivalent (a k-shingle exists iff the doc has >= k tokens)
    #   and cheap enough to evaluate scan-side.
    return (fan_out(docs)
            .where(F.size(_tokens(F.col(text_col))) >= shingle_k)
            .select(F.col(id_col).alias("doc_id"),
                    sh.alias("shingles"))
            .withColumn("hs", base)
            .withColumn("sig", sig)
            .drop("hs"))


def band_table(sigs: DataFrame, bands: int = 4,
               rows_per_band: int = 4) -> DataFrame:
    """Banded signature table (doc_id, band_idx, band_hash) — the LSH
    join key set; also the accumulated state of the streaming near-dup
    filter (engine/streaming.py:streaming_dedup_filter)."""
    band_arr = F.array(*[
        F.md5(F.concat_ws("|", *[
            F.element_at("sig", b * rows_per_band + r + 1)
            for r in range(rows_per_band)]))
        for b in range(bands)
    ])
    return (sigs.select("doc_id", band_arr.alias("bands"))
            .select("doc_id",
                    F.posexplode("bands").alias("band_idx", "band_hash")))


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 4,
                        rows_per_band: int = 4) -> DataFrame:
    """Banded LSH: docs sharing any band hash → candidate pairs
    (doc_a < doc_b), distinct."""
    banded = band_table(sigs, bands, rows_per_band)
    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, ["band_idx", "band_hash"])
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())


def jaccard_verify(sigs: DataFrame, pairs: DataFrame,
                   threshold: float = 0.5) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; keep >= threshold.
    Returns (doc_a, doc_b, jaccard)."""
    sh = sigs.select("doc_id", "shingles")
    j = (pairs
         .join(sh.withColumnRenamed("doc_id", "doc_a")
               .withColumnRenamed("shingles", "sh_a"), "doc_a")
         .join(sh.withColumnRenamed("doc_id", "doc_b")
               .withColumnRenamed("shingles", "sh_b"), "doc_b")
         .withColumn("jaccard",
                     F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                     / F.size(F.array_union("sh_a", "sh_b"))))
    return (j.where(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def minhash_near_dups(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n_hashes: int = 16,
                      shingle_k: int = 3, bands: int = 4,
                      threshold: float = 0.5,
                      persist: bool | str = True) -> DataFrame:
    """Full MinHash→LSH→verify near-dup pipeline.

    The signature table is persisted: it feeds the band self-join (both
    sides) and the two verify joins, and recomputing the 16-hash
    signature subtree per consumer is O(6×) wasted work. At 100 TB this
    persist becomes a parquet checkpoint of the signature table.

    What gets cached (r6): only the NARROW (doc_id, sig) projection —
    16 longs per doc — ever enters the cache. The verify stage's
    shingle arrays come from a fresh :func:`_shingle_table` map pass
    instead of the cached signature table: building Spark's columnar
    cache over the array<string> shingle column cost more than the
    whole signature computation (measured r6 at 50 k docs: full-table
    persist 7.4 s vs 5.0 s for sig-only persist + shingle recompute,
    identical pair set — the guide §5 point that caching is only worth
    it when recomputing is more expensive than the memory pressure,
    applied column by column).

    ``persist`` modes:

    * ``True`` — persist the narrow signature table; the handle is
      exposed as ``out._minhash_sigs`` so a long-lived caller can
      ``unpersist()`` after materializing the result (otherwise each
      invocation leaks cached blocks until the session ends). NB: the
      attribute lives on the RETURNED DataFrame object only — any
      further transformation drops it.
    * ``"transient"`` — persist the narrow signatures, EAGERLY
      ``localCheckpoint`` the verified pairs (the result is pair-sized,
      orders of magnitude smaller than the signature table), and
      unpersist the signatures before returning: persisted-path speed
      with nothing left referencing the cache — the mode for
      callers that cannot keep the cleanup handle (the oracle-gate
      entries measured 30 s → 3 s-class at sf0.1 vs persist=False).
      Local-checkpoint blocks are executor-lifetime-unreliable, which
      a single-session gate/bench run is fine with.
    * ``False`` — no caching at all: the ORIGINAL single-subtree
      pipeline, every consumer recomputing the signature subtree (the
      leak-proof worst case)."""
    if not persist:
        sigs = minhash_signatures(docs, text_col, id_col, n_hashes,
                                  shingle_k)
        pairs = lsh_candidate_pairs(sigs, bands, n_hashes // bands)
        out = jaccard_verify(sigs, pairs, threshold)
        out._minhash_sigs = sigs
        return out
    sig_small = (minhash_signatures(docs, text_col, id_col, n_hashes,
                                    shingle_k)
                 .select("doc_id", "sig").persist())
    pairs = lsh_candidate_pairs(sig_small, bands, n_hashes // bands)
    sh = _shingle_table(docs, text_col, id_col, shingle_k)
    out = jaccard_verify(sh, pairs, threshold)
    if persist == "transient":
        out = out.localCheckpoint(eager=True)
        sig_small.unpersist()
    out._minhash_sigs = sig_small  # cleanup handle for long sessions
    return out


def _hash32(col):
    """Portable 32-bit unsigned int hash: first 8 hex chars of md5."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32) -> DataFrame:
    """tf-weighted SimHash: (doc_id, simhash:long).

    bit k of simhash = 1 iff Σ_terms tf(term)·(2·bit_k(h(term))−1) > 0.

    One aggregation with ``bits`` conditional sums per (doc, term) row —
    NOT an explode of bit positions: the explode variant multiplied the
    shuffle by ``bits`` (32×) for identical results (VERDICT r01)."""
    from engine.session import fan_out

    toks = _tokens(F.col(text_col))
    tf = (fan_out(docs)
          .select(F.col(id_col).alias("doc_id"),
                  F.explode(toks).alias("term"))
          .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
          .withColumn("h", _hash32(F.col("term"))))
    bit_sums = [
        F.sum(F.col("tf") * (F.expr(f"shiftright(h, {k}) & 1") * 2 - 1))
        .alias(f"s{k}")
        for k in range(bits)
    ]
    agg = tf.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for k in range(bits):
        term = F.when(F.col(f"s{k}") > 0,
                      F.lit(1 << k).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.alias("simhash"))


def drop_near_dups(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", **minhash_kw) -> DataFrame:
    """Dedup-keep selection: drop every doc that near-duplicates a
    LOWER-id doc (the standard keep-first policy). One pass of pair
    pruning — for transitive chains a, b, c where only (a,b),(b,c)
    matched, c survives via b's removal only after a fixpoint; at
    pipeline scale one pass removes the overwhelming mass and the
    operation is idempotent, so re-running converges."""
    pairs = minhash_near_dups(docs, text_col, id_col, **minhash_kw)
    losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    out = docs.join(losers, id_col, "left_anti")
    out._minhash_sigs = pairs._minhash_sigs  # propagate cleanup handle
    return out


def ngram_jaccard_consecutive(docs: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id", shingle_k: int = 3
                              ) -> DataFrame:
    """Exact n-gram Jaccard for the deterministic pair set
    (doc_id, doc_id+1) — a bounded, oracle-checkable slice of exact
    pairwise similarity. Returns (doc_a, doc_b, jaccard)."""
    from engine.session import fan_out

    sh = fan_out(docs).select(
        F.col(id_col).alias("doc_id"),
        shingles_col(F.col(text_col), shingle_k).alias("shingles"))
    a = sh.select(F.col("doc_id").alias("doc_a"),
                  F.col("shingles").alias("sh_a"))
    b = sh.select((F.col("doc_id") - 1).alias("doc_a"),
                  F.col("doc_id").alias("doc_b"),
                  F.col("shingles").alias("sh_b"))
    return (a.join(b, "doc_a")
            .withColumn("jaccard",
                        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                        / F.size(F.array_union("sh_a", "sh_b")))
            .select("doc_a", "doc_b", "jaccard"))


def connected_components(pairs: DataFrame, a_col: str = "doc_a",
                         b_col: str = "doc_b", max_iter: int = 25
                         ) -> DataFrame:
    """Near-dup CLUSTERING: connected components over a pair graph,
    (doc_id, component) where component = min doc_id in the cluster.

    A transitive-closure keep-one policy needs clusters, not pairs: the
    keep-first pair filter drops c in a chain a-b-c only after a
    fixpoint, while the component label makes every cluster's survivor
    explicit in one result.

    Algorithm: distributed hash-min label propagation — every node
    starts labeled with itself; each round every node takes the min of
    its own and its neighbors' labels (one equi-join + groupBy-min per
    round, all shuffle-partitioned on the node key, nothing driver-
    side except the converged? count). Rounds needed = graph diameter;
    near-dup graphs are unions of small cliques (diameter ≤ ~3 per LSH
    banding), so this converges in a handful of rounds. For adversarial
    long-chain graphs at cluster scale, switch to the large-star/
    small-star variant (Kiveris et al., "Connected Components in
    MapReduce"), which squares the label-jump distance per round; the
    hash-min form is kept here because dedup graphs are clique-shaped
    and each round is one shuffle.

    Each round's labels are ``persist()``-ed and the previous round
    unpersisted, so the lineage (and thus task recomputation) stays
    one round deep.
    """
    edges = (pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
             .unionByName(
                 pairs.select(F.col(b_col).alias("u"),
                              F.col(a_col).alias("v")))
             .distinct())
    labels = (edges.select(F.col("u").alias("node"))
              .distinct()
              .withColumn("label", F.col("node"))
              .persist())
    labels.count()
    for _ in range(max_iter):
        from_nbrs = (edges.join(labels,
                                edges["v"] == labels["node"])
                     .select(edges["u"].alias("node"),
                             F.col("label")))
        new = (labels.select("node", "label").unionByName(from_nbrs)
               .groupBy("node").agg(F.min("label").alias("label"))
               .persist())
        changed = (new.join(labels.withColumnRenamed("label", "old"),
                            "node")
                   .where(F.col("label") != F.col("old")).count())
        labels.unpersist()
        labels = new
        if changed == 0:
            break
    out = labels.select(F.col("node").alias("doc_id"),
                        F.col("label").alias("component"))
    out._cc_labels = labels  # cleanup handle (caller may unpersist)
    return out


def winnow_fingerprints(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 5,
                        window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every word ``k``-gram,
    slide a ``window``-hash window over the sequence, and keep each
    window's MINIMUM hash.  The guarantee: any shared run of
    ``k + window − 1`` tokens between two documents yields at least
    one shared fingerprint, so fingerprint overlap detects LOCAL
    copied passages (code plagiarism, boilerplate, quoted blocks) that
    whole-document MinHash dilutes away.  Divergence from the paper's
    "robust winnowing" (rightmost-minimum, skip-if-same-as-previous):
    we keep the DISTINCT set of window minima — same selection
    guarantee and density bound 2/(window+1), but stateless, so the
    plan is a pure window-function aggregate both here and in the SQL
    oracle.

    Plan shape at 100 TB: token/k-gram construction is the O(tokens)
    shifted-slice zip (never element_at — CLAUDE.md trap), the window
    min shuffles once on ``id_col``, and output is ≤ 2/(window+1) ·
    tokens rows per doc.  Documents shorter than ``k`` tokens have no
    k-grams and emit no fingerprints (both engines agree).  Docs with
    fewer than ``window`` k-grams emit their global minimum (the
    backward-looking window at the last gram covers the whole doc).

    Returns distinct (id_col, fp:long).
    """
    from pyspark.sql import Window as W

    from .curation import ngrams_col

    from engine.session import fan_out

    toks = fan_out(docs).select(id_col, _tokens(F.col(text_col)).alias("t"))
    # materialize the gram array BEFORE size/posexplode (builder
    # pattern: a combined select re-plants the construction above the
    # Generate — CLAUDE.md round-3 pitfall)
    grams = toks.select(id_col, ngrams_col(F.col("t"), k).alias("g"))
    rows = grams.select(
        id_col, F.size("g").alias("ng"),
        F.posexplode("g").alias("pos", "gram"))
    h = rows.select(id_col, "ng", "pos",
                    _hash32(F.col("gram")).alias("hv"))
    wspec = (W.partitionBy(id_col).orderBy("pos")
             .rowsBetween(-(window - 1), 0))
    wm = h.withColumn("wmin", F.min("hv").over(wspec))
    sel = wm.where((F.col("pos") >= window - 1)
                   | (F.col("pos") == F.col("ng") - 1))
    return sel.select(id_col, F.col("wmin").alias("fp")).distinct()


def winnow_pairs(fps: DataFrame, id_col: str = "doc_id",
                 min_jaccard: float = 0.5,
                 max_fp_docs: int | None = None) -> DataFrame:
    """Near-dup pairs from winnowing fingerprints: equi-join documents
    on shared fingerprints, then exact Jaccard over fingerprint sets.
    The MOSS pair-detection stage, shaped like the banded-LSH join —
    candidates come only from hash-equal buckets, nothing quadratic
    across the corpus.

    ``max_fp_docs`` drops fingerprints appearing in more documents
    than the cap before the self-join — MOSS deployments do exactly
    this to stop boilerplate fingerprints from creating O(n²) bucket
    blowups; at 100 TB this cap is what bounds the join (same role as
    LSH band-bucket size limits).

    Returns (doc_a, doc_b, shared, jaccard) with doc_a < doc_b,
    jaccard unrounded (callers round per the house oracle rule).
    """
    if max_fp_docs is not None:
        hot = (fps.groupBy("fp")
               .agg(F.count(F.lit(1)).alias("nd"))
               .where(F.col("nd") > max_fp_docs)
               .select("fp"))
        fps = fps.join(F.broadcast(hot), "fp", "left_anti")
    sizes = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = fps.select(F.col(id_col).alias("doc_a"), "fp")
    b = fps.select(F.col(id_col).alias("doc_b"), "fp")
    pairs = (a.join(b, "fp")
             .where(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).alias("shared")))
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    out = (pairs.join(sa, "doc_a").join(sb, "doc_b")
           .withColumn("jaccard",
                       F.col("shared")
                       / (F.col("na") + F.col("nb") - F.col("shared"))))
    return (out.where(F.col("jaccard") >= min_jaccard)
            .select("doc_a", "doc_b", "shared", "jaccard"))
