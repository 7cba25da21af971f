#!/usr/bin/env python
"""Physical-plan audit: dump .explain("formatted") for the engine's
key plans and grep for the properties that matter at 100 TB —
PushedFilters / partition pruning on postings reads, broadcast joins
on the query side, whole-stage codegen around the BM25 arithmetic,
no unexpected sort-merge joins or cartesian products.

Writes PLANS.md. Run: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
        df.explain()  # simple mode carries the *(n) codegen markers
    return buf.getvalue()


CHECKS = {
    "broadcast join": "Broadcast",
    "whole-stage codegen": "*(",
    "parquet pushdown": "PushedFilters",
}
# CartesianProduct is always wrong here. BroadcastNestedLoopJoin is
# EXPECTED for brute-force cosine (tiny broadcast query side, non-equi
# self-exclusion predicate) and for the IVF-PQ probe step (n_queries ×
# n_centroids cross join against the broadcast centroid table — both
# sides tiny by construction); flagged everywhere else.
RED_FLAGS = ["CartesianProduct"]
# single-table aggs/filters have NO join anywhere in the plan — a
# missing Broadcast marker is the plan being right, not a gap; same
# for full-corpus aggs whose scan has no filter to push
JOINLESS_OK = {"geo_shape relations (one conditional-agg pass)",
               "geo_distance top-k (rounded haversine gate)",
               "geohash_grid (top-N cells, integer interleave)",
               "geo_polygon (int64 even-odd ray cast filter)",
               "ip_range agg (one conditional-agg pass + stack)",
               "frequent_item_sets (Apriori, broadcast L1/L3)",
               "bucket_correlation (Pearson vs bucket-index ramp)",
               "change_point (max between-group SS split)",
               "random_sampler agg (hash-gated sample, scaled)"}
NO_PUSHDOWN_OK = {"frequent_item_sets (Apriori, broadcast L1/L3)",
                  "bucket_correlation (Pearson vs bucket-index ramp)",
                  "change_point (max between-group SS split)",
                  "random_sampler agg (hash-gated sample, scaled)"}
BNLJ_OK = {"brute-force cosine top-k",
           "IVF-PQ ANN (coarse cells + residual ADC + rerank)",
           # Rocchio is exact-rerank by design: the broadcast side is
           # the handful of (possibly feedback-shifted) query vectors
           "Rocchio vector PRF",
           # the on-the-fly _bm25_scored oracle path crossJoins a
           # 1-ROW broadcast stats relation (n, avgdl) — a BNLJ by
           # plan shape, O(rows) by cost; the index path carries the
           # same scalars in Index.stats instead. RRF additionally
           # contains the whitelisted brute-force cosine sub-plan.
           "RRF hybrid fusion (BM25 + dense cosine)",
           "field collapsing (best per group, gate before cut)",
           # DSIR crossJoins the 1-row (tq, tp) totals relation
           "DSIR importance weights (broadcast log-ratio table)",
           # the suggester's join is NON-EQUI by nature (length band +
           # edit distance), against a broadcast of the FEW misspelled
           # query terms — the distributed form of Lucene's per-query
           # dictionary automaton walk
           "spell suggestion (dictionary scan)",
           # completion: startswith is non-equi against a broadcast of
           # the handful of prefixes, over a RANGE-PRUNED dictionary
           # scan (the [p, next(p)) predicates are pushed first)
           "completion suggester (sorted-dictionary prefix walk)",
           # decay composes over the on-the-fly _bm25_scored oracle
           # path (the 1-row broadcast stats relation, as with RRF)
           "function_score gauss decay × BM25",
           # linear fusion contains the whitelisted brute-force cosine
           # sub-plan plus the 1-row stats relation, exactly like RRF
           "linear hybrid fusion (minmax CombSUM)",
           # highlight's hit page comes from the on-the-fly
           # _bm25_scored path (the 1-row broadcast stats relation,
           # as with RRF); the snippet stage itself is one
           # broadcast-hash join of the page against docs
           "highlighting (best-passage snippets over the hit page)",
           # IVF paths crossJoin the tiny broadcast centroid table
           # (n_queries × n_centroids / n_vectors × n_centroids —
           # broadcast side bounded by the cell count)
           "filtered ANN (IVF + knn.filter pre-filter)",
           "cluster-balanced diversity subsampling",
           # percentiles crossJoins the ≤|percents|-row (3 here)
           # broadcast percent list against the FIXED-SIZE bucket
           # table (≤ ~8·log2(max_dl) rows per qid by construction)
           "percentiles agg (HDR power-of-two buckets)",
           # did-you-mean's candidate join is NON-EQUI by nature
           # (length band + levenshtein) against a broadcast of the
           # few query positions — the spell-suggestion shape — plus
           # the 1-row (T, V) totals relation
           "did-you-mean (edit candidates × bigram LM)",
           # the HLL prefix-max densify is an EXPLICIT crossJoin of
           # the bucket list against the broadcast ≤4096 touched
           # registers — bounded by the CALENDAR × register count,
           # never by event volume (docstring pins the bound)
           "cumulative_cardinality (HLL prefix-max)"}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as em
    from engine.search import boolean_and, score_exhaustive, score_wand
    from engine.session import get_spark

    spark = get_spark(app="plans", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    # AQE wraps plans in AdaptiveSparkPlan(isFinalPlan=false), hiding
    # codegen markers until execution — disable for the static audit
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    idx = em._cached_index(spark, sf_dir)
    qt = [(q, t, 1.0) for q, ts in em.BM25_QUERIES for t in ts]

    plans = {
        "exhaustive BM25 top-k (index path)":
            score_exhaustive(idx, qt, 10),
        "block-max WAND top-k (index path)":
            score_wand(idx, qt, 10),
        "boolean AND intersection":
            boolean_and(idx, em.AND_QUERIES),
        "tf aggregation (build stage 2 shape)":
            em._tf(spark, sf_dir),
        "MinHash near-dup pipeline": __import__(
            "engine.pipeline.dedup", fromlist=["dedup"]).minhash_near_dups(
                em._docs(spark, sf_dir), threshold=0.3),
        "brute-force cosine top-k": __import__(
            "engine.pipeline.similarity", fromlist=["similarity"]).cosine_topk(
                em._emb(spark, sf_dir), em.ANN_QUERY_IDS, 10),
    }

    from engine.pipeline.textstats import pmi_bigrams
    from engine.positions import build_positions, phrase_match, proximity_match
    from engine.search import Index as _I  # noqa: F401 (doc only)

    build_positions(spark, idx.index_dir)
    plans["phrase match (positional index)"] = phrase_match(
        idx, em.PHRASE_QUERIES)
    plans["proximity match (positional index)"] = proximity_match(
        idx, em.PROX_QUERIES, em.PROX_WINDOW)
    plans["filtered BM25 top-k (doc_filter semi-join)"] = score_exhaustive(
        idx, qt, 10, doc_filter=idx.docs.where(
            __import__("pyspark.sql.functions", fromlist=["F"])
            .col("lang") == "en"))
    plans["PMI bigram collocations"] = pmi_bigrams(
        em._docs(spark, sf_dir), min_count=5, k=20)
    from engine.pipeline.similarity import pq_topk
    plans["PQ ANN (ADC + exact rerank)"] = pq_topk(
        em._emb(spark, sf_dir), em.ANN_QUERY_IDS, 10,
        m=16, n_centroids=16, rerank=60)

    from pyspark.sql import functions as F

    from engine.pipeline import curation
    from engine.search import score_lmd
    plans["LMDirichlet top-k (index path)"] = score_lmd(idx, qt, 10)
    docs = em._docs(spark, sf_dir)
    plans["decontamination (broadcast eval n-grams)"] = \
        curation.decontaminate(docs, docs.where(F.col("doc_id") % 97 == 0),
                               n=5)
    plans["shared-substring report (window hash)"] = \
        curation.shared_ngram_report(docs, n=10)
    plans["sequence-packing layout (window cumsum)"] = \
        curation.pack_sequences(docs, budget=512)
    plans["stratified hash sampling"] = curation.hash_sample(
        docs, em.MIX_RATES)

    from engine.positions import span_first_match
    from engine.pipeline.similarity import ivfpq_topk
    from engine.search import (boolean_topk, count_matches,
                               field_sorted_topk)
    plans["generic BooleanQuery (must/should/must_not)"] = boolean_topk(
        idx, em.BOOLEAN_QUERIES, 10)
    plans["IVF-PQ ANN (coarse cells + residual ADC + rerank)"] = ivfpq_topk(
        em._emb(spark, sf_dir), em.ANN_QUERY_IDS, 10)
    plans["span-first match (positional, shuffle-free)"] = span_first_match(
        idx, em.SPANFIRST_QUERIES)
    plans["field-sorted search (doc-values sort)"] = field_sorted_topk(
        idx, em.BM25_QUERIES,
        em._docs(spark, sf_dir).select(
            "doc_id", F.col("n_chars").alias("sort_key")), 10)
    plans["hit counting (no scoring)"] = count_matches(idx, em.BM25_QUERIES)
    from engine.queryparse import search_parsed
    plans["parsed query (+must -not phrase prefix*)"] = search_parsed(
        idx, "pp", '+merge sort -hash mer*', 10)
    from engine.pipeline.similarity import rocchio_topk
    plans["Rocchio vector PRF"] = rocchio_topk(
        em._emb(spark, sf_dir), em.ANN_QUERY_IDS, 10)
    from engine.fields import fielded_topk
    plans["fielded search (per-field stats, boosted sum)"] = fielded_topk(
        em._cached_field_indexes(spark, sf_dir),
        [(q, f, t, w) for q, ts in em.BM25_QUERIES for t in ts
         for f, w in (("title", 3.0), ("body", 1.0))], 10)
    from engine.federate import federated_topk
    plans["federated search (2 shards, global stats)"] = federated_topk(
        em._cached_shard_indexes(spark, sf_dir), qt, 10)
    # round-3: generalized-kernel paths (scorer dispatch + per-list
    # block bounds) and the norm-parity mode
    plans["WAND LMDirichlet (generalized kernel)"] = score_wand(
        idx, qt, 10, scorer="lmd")
    plans["WAND IB (generalized kernel)"] = score_wand(
        idx, qt, 10, scorer="ib")
    from engine.fields import fielded_topk_wand
    plans["fielded WAND (per-field stats in kernel params)"] = \
        fielded_topk_wand(
            em._cached_field_indexes(spark, sf_dir),
            [(q, f, t, w) for q, ts in em.BM25_QUERIES for t in ts
             for f, w in (("title", 3.0), ("body", 1.0))], 10)
    plans["BM25 with Lucene 1-byte norms (parity mode)"] = \
        score_exhaustive(idx, qt, 10, norms="lucene")

    # round-3 late additions: fusion / collapsing / suggestion / DSIR
    from engine.fusion import collapse_topk, rrf_fuse
    from engine.search import suggest_terms
    qs = em.queries()
    plans["RRF hybrid fusion (BM25 + dense cosine)"] = qs[
        "hybrid_rrf_topk"](spark, sf_dir)
    plans["field collapsing (best per group, gate before cut)"] = qs[
        "collapsed_topk"](spark, sf_dir)
    plans["spell suggestion (dictionary scan)"] = suggest_terms(
        idx, em.SUGGEST_QUERIES)
    plans["DSIR importance weights (broadcast log-ratio table)"] = \
        curation.dsir_weights(docs, docs.where(F.col("source") == "src7"))

    # round-3 late additions (second wave): DisMax / combined_fields /
    # completion / decay / line dedup / winnowing
    from engine.fields import combined_fields_topk, dismax_topk
    from engine.pipeline.dedup import winnow_fingerprints, winnow_pairs
    from engine.search import complete_prefix
    fidx = em._cached_field_indexes(spark, sf_dir)
    plans["DisMax (per-field max + tie_breaker)"] = dismax_topk(
        fidx, [(q, f, t, 1.0) for q, ts in em.BM25_QUERIES for t in ts
               for f in ("title", "body")], 10, tie_breaker=0.3)
    plans["combined_fields / BM25F (pre-saturation merge)"] = \
        combined_fields_topk(fidx, em.BM25_QUERIES,
                             {"title": 2.0, "body": 1.0}, 10)
    plans["completion suggester (sorted-dictionary prefix walk)"] = \
        complete_prefix(idx, em.COMPLETION_QUERIES, n=5)
    plans["function_score gauss decay × BM25"] = qs[
        "decayed_topk"](spark, sf_dir)
    plans["cross-doc duplicate-line removal (CCNet)"] = qs[
        "line_dedup"](spark, sf_dir)
    plans["winnowing near-dup pairs (MOSS)"] = winnow_pairs(
        winnow_fingerprints(docs), min_jaccard=0.5)

    # round-3 third wave: percolation, diversity subsampling, HLL
    # cardinality, linear fusion, filtered ANN
    plans["percolation (broadcast saved-search store)"] = qs[
        "percolate_hits"](spark, sf_dir)
    plans["cluster-balanced diversity subsampling"] = qs[
        "cluster_sample"](spark, sf_dir)
    plans["HLL cardinality agg (register max-agg)"] = qs[
        "cardinality_terms"](spark, sf_dir)
    plans["linear hybrid fusion (minmax CombSUM)"] = qs[
        "hybrid_linear_topk"](spark, sf_dir)
    plans["filtered ANN (IVF + knn.filter pre-filter)"] = qs[
        "ann_filtered_topk"](spark, sf_dir)

    # round-3 fourth wave: percentiles/composite/rescore aggs plus the
    # ExactSubstr / CMS / JL-projection training-data ops
    plans["percentiles agg (HDR power-of-two buckets)"] = qs[
        "percentiles_dl"](spark, sf_dir)
    plans["composite agg (after-key pagination)"] = qs[
        "composite_page2"](spark, sf_dir)
    plans["query rescoring (kernel pass + windowed LMD)"] = qs[
        "rescored_topk"](spark, sf_dir)
    plans["ExactSubstr span dedup (window-hash owner/excise)"] = qs[
        "substring_dedup"](spark, sf_dir)
    plans["Count-Min sketch term counts (register grid)"] = qs[
        "cms_term_counts"](spark, sf_dir)
    plans["JL random projection (literal ±1 matrix)"] = qs[
        "rp_embed"](spark, sf_dir)

    # round-3 fifth wave: match_phrase_prefix / did-you-mean / random
    plans["match_phrase_prefix (anchor join + capped expansions)"] = qs[
        "phrase_prefix_hits"](spark, sf_dir)
    plans["did-you-mean (edit candidates × bigram LM)"] = qs[
        "did_you_mean"](spark, sf_dir)
    plans["seeded random_score ranking"] = qs[
        "random_topk"](spark, sf_dir)

    # round-3 tenth wave: bloom / extended_stats / field_value_factor
    plans["Bloom-filter decontamination (bit_or agg + probe)"] = qs[
        "bloom_decontam"](spark, sf_dir)
    plans["extended_stats agg (exact integer accumulators)"] = qs[
        "extended_stats_dl"](spark, sf_dir)
    plans["field_value_factor function_score (ln1p rerank)"] = qs[
        "fvf_topk"](spark, sf_dir)

    # round-3 eleventh/twelfth wave: trigram pruning + windowed HH
    # (the entries build the sidecar themselves before returning)
    plans["trigram-pruned wildcard rewrite"] = qs[
        "wildcard_trigram_topk"](spark, sf_dir)
    plans["trigram-pruned regexp rewrite"] = qs[
        "regexp_trigram_topk"](spark, sf_dir)
    plans["windowed heavy hitters (CMS registers)"] = qs[
        "event_window_heavy"](spark, sf_dir)
    plans["resharded WAND (bucket-count retune)"] = qs[
        "resharded_search"](spark, sf_dir)
    plans["pipeline aggs (cumulative_sum + derivative)"] = qs[
        "event_window_pipeline"](spark, sf_dir)

    # round-3 ninth wave: intervals / top_hits / LM perplexity
    plans["ES intervals (ordered chain, nested HOF)"] = qs[
        "interval_hits"](spark, sf_dir)
    plans["SpanNot (exclude-window survival)"] = qs[
        "span_not_hits"](spark, sf_dir)
    plans["matrix_stats agg (integer-numerator corr)"] = qs[
        "matrix_stats"](spark, sf_dir)
    plans["percentile_ranks (exact inverse quantiles)"] = qs[
        "percentile_ranks_dl"](spark, sf_dir)
    plans["top_hits agg (terms buckets + per-bucket window)"] = qs[
        "top_hits_by_lang"](spark, sf_dir)
    plans["CCNet bigram-LM cross-entropy filter"] = qs[
        "lm_perplexity"](spark, sf_dir)

    # round-4: BPE subword trainer + encoder. The trainer's plan of
    # record is the single O(corpus) word-frequency agg (everything
    # after runs on the vocabulary-bounded table); the encoded-counts
    # entry shows the zero-shuffle pandas-UDF encode + one count agg.
    from engine.pipeline import bpe as bpe_mod
    plans["BPE trainer word-frequency stage (the one O(corpus) agg)"] = (
        bpe_mod.word_frequencies(
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))))
    plans["BPE encode (zero-shuffle pandas UDF) + token counts"] = qs[
        "bpe_encoded"](spark, sf_dir)
    plans["highlighting (best-passage snippets over the hit page)"] = qs[
        "highlighted_topk"](spark, sf_dir)
    plans["term_vectors API (page semi-join on forward tf)"] = qs[
        "term_vectors_docs"](spark, sf_dir)
    plans["_explain API (per-term BM25 breakdown rows)"] = qs[
        "explain_hits"](spark, sf_dir)
    plans["adjacency_matrix agg (in-row pair expansion)"] = qs[
        "adjacency_counts"](spark, sf_dir)
    plans["synonym-expanded weighted-OR BM25"] = qs[
        "synonym_expand_topk"](spark, sf_dir)
    plans["rare_terms agg (exact long-tail buckets)"] = qs[
        "rare_terms"](spark, sf_dir)
    plans["diversified_sampler (dedup window + sample cut)"] = qs[
        "diversified_sampler_lang"](spark, sf_dir)
    plans["significant_text (sampled re-analysis JLH)"] = qs[
        "significant_text_topn"](spark, sf_dir)
    plans["boosting query (demote-before-cut)"] = qs[
        "boosting_topk"](spark, sf_dir)
    plans["terms_set query (per-doc msm gate)"] = qs[
        "terms_set_topk"](spark, sf_dir)
    plans["weighted_avg agg (DECIMAL accumulators)"] = qs[
        "weighted_avg_dl"](spark, sf_dir)
    plans["boxplot + MAD (exact type-7 quantiles)"] = qs[
        "mad_dl"](spark, sf_dir)
    plans["multi_terms agg (composite count-desc buckets)"] = qs[
        "multi_terms_buckets"](spark, sf_dir)
    plans["rank_feature query (additive saturation boost)"] = qs[
        "rank_feature_topk"](spark, sf_dir)
    plans["string_stats agg (char-distribution entropy)"] = qs[
        "string_stats_dl"](spark, sf_dir)
    plans["stats_bucket sibling pipeline agg"] = qs[
        "event_window_bucket_stats"](spark, sf_dir)
    plans["moving_fn + serial_diff pipeline aggs"] = qs[
        "event_window_moving"](spark, sf_dir)

    # round-4 tail: engine-complete ops queued for the r5 driver
    # window — audited directly from the engine surfaces (no
    # queries() entry yet; the 50-slot window is at capacity)
    from engine import streaming as st_mod
    from engine.positions import span_containing_match, span_within_match
    from engine.search import (filters_agg, fuzzy_topk,
                               match_bool_prefix_topk,
                               scripted_metric_agg, t_test_agg)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ta, tb = em.BM25_QUERIES[0][1][0], em.BM25_QUERIES[1][1][0]
    plans["t_test agg (Welch + pooled sufficient stats)"] = t_test_agg(
        idx, [("t1", [ta], [tb])])
    plans["filters agg (named overlapping buckets + other)"] = \
        filters_agg(idx, [("fa", [ta]), ("fb", [tb])], other_bucket=True)
    plans["scripted_metric agg (Catalyst map/combine/reduce)"] = \
        scripted_metric_agg(idx, [("s1", [ta])], "dl * nc", "avg",
                            "state / 1000.0")
    plans["match_bool_prefix (search_as_you_type query)"] = \
        match_bool_prefix_topk(idx, [("m1", f"{ta} {tb[:3]}")], 10)
    plans["OSA fuzzy top-k (transpositions=true rewrite)"] = fuzzy_topk(
        idx, [("f1", ta[:-1] + "x")], 10, max_edits=1,
        transpositions=True)
    plans["span_within (little inside ordered near pair)"] = \
        span_within_match(idx, [("sw", ta, ta, tb, 6)])
    plans["span_containing (near pairs holding a little)"] = \
        span_containing_match(idx, [("sc", ta, ta, tb, 6)])
    plans["bucket_script/selector/sort pipeline aggs"] = \
        st_mod.windowed_bucket_script(ev, min_n=1, size=5)
    plans["normalize pipeline agg (z_score)"] = st_mod.windowed_normalize(
        ev, method="z_score")
    plans["cumulative_cardinality (HLL prefix-max)"] = \
        st_mod.windowed_cumulative_cardinality(ev)
    plans["top_metrics agg (latest reading per bucket)"] = \
        st_mod.windowed_top_metrics(ev, size=2)
    plans["auto_date_histogram (rung-derived interval)"] = \
        st_mod.windowed_auto_histogram(ev)
    plans["range agg (overlapping from/to buckets, one scan)"] = \
        st_mod.range_agg(ev, "value", [("lo", None, 0.5),
                                       ("hi", 0.5, None)])
    plans["moving_percentiles (sliding type-7 quantiles)"] = \
        st_mod.windowed_moving_percentiles(ev)
    from engine.search import (distance_feature_topk, pinned_topk,
                               script_score_topk)
    plans["script_score (script replaces the score + min_score gate)"] = \
        script_score_topk(idx, qt, 10, "s + ln(1 + dl) / 10",
                          min_score=0.1)
    plans["distance_feature (additive reciprocal boost)"] = \
        distance_feature_topk(idx, qt, 10, origin=500.0, pivot=200.0,
                              boost=2.0)
    plans["pinned query (promotion overlay on the WAND page)"] = \
        pinned_topk(idx, qt, [("q1", [3, 5])], 10)
    from engine.evaluate import rank_eval_metrics
    from engine.search import constant_score_topk
    plans["constant_score (filter context, no scoring anywhere)"] = \
        constant_score_topk(idx, em.BM25_QUERIES, 10, boost=1.2)
    plans["rate agg (per-unit re-expression of bucket counts)"] = \
        st_mod.rate_agg(ev)
    qrels_df = spark.createDataFrame(
        [("q1", "d1", 1), ("q1", "d2", 0)],
        "qid string, docno string, rel int")
    run_df = spark.createDataFrame(
        [("q1", "d1", 1), ("q1", "d2", 2)],
        "qid string, docno string, rank int")
    plans["rank_eval metrics (MRR / recall / ERR)"] = \
        rank_eval_metrics(run_df, qrels_df, k=10)
    plans["percentiles_bucket (sibling percentile pipeline agg)"] = \
        st_mod.windowed_percentiles_bucket(ev)
    from pyspark.sql import functions as _F

    from engine.search import value_count_missing_agg
    _fields = em._docs(spark, sf_dir).select(
        "doc_id", _F.nullif(_F.regexp_extract(
            "text", r"\b(customer|vector|stream)\b", 1),
            _F.lit("")).alias("marker"))
    plans["value_count / missing / global aggs"] = \
        value_count_missing_agg(idx, em.BM25_QUERIES, _fields, "marker")
    from engine.queryparse import simple_query_string_topk
    plans["simple_query_string (boolean tree via per-doc pivot)"] = \
        simple_query_string_topk(idx, "q1",
                                 'table + (scan | merge) -customer', 10)
    from engine.positions import span_or_near_match
    plans["span_or near (SpanNear with a SpanOr clause)"] = \
        span_or_near_match(idx, [("q1", ["scan", "merge"], "table", 2)])
    from engine.fields import cross_fields_topk
    plans["cross_fields (blended-df term-centric multi_match)"] = \
        cross_fields_topk(em._cached_field_indexes(spark, sf_dir),
                          [(q, t, 1.0) for q, ts in em.BM25_QUERIES
                           for t in ts], 10, tie_breaker=0.3)

    # ---- r5 closing waves: geo / join-field / itemsets / ip ----
    from engine import geo as geo_mod
    from engine.joinfield import children_agg, has_child
    from engine.pipeline.curation import ip_range_agg
    from engine.pipeline.itemsets import frequent_item_sets

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plans["geo_distance top-k (rounded haversine gate)"] = \
        geo_mod.geo_distance_query(ev, *em.GEO_CENTER_A,
                                   em.GEO_RADIUS_KM, em.GEO_TOPK)
    plans["geohash_grid (top-N cells, integer interleave)"] = \
        geo_mod.geohash_grid(ev, em.GEOHASH_GRID_TOPN,
                             precision=em.GEOHASH_GRID_PRECISION)
    plans["geo_polygon (int64 even-odd ray cast filter)"] = \
        geo_mod.geo_polygon(ev, em.GEO_POLYGON_M)
    plans["geo_line (per-group ordered track, pre-truncated)"] = \
        geo_mod.geo_line(ev, em.GEO_LINE_SIZE)
    plans["ip_range agg (one conditional-agg pass + stack)"] = \
        ip_range_agg(ev, em.IP_RANGES)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    from pyspark.sql import functions as F
    plans["has_child (fold children before the parent join)"] = \
        has_child(cust, orders, "c_custkey", "o_custkey",
                  F.col("o_totalprice") >= F.lit(em.HAS_CHILD_PRICE_FLOOR),
                  F.floor(F.col("o_totalprice") * F.lit(1e6) + F.lit(0.5)),
                  score_mode="sum",
                  min_children=em.HAS_CHILD_MIN_CHILDREN,
                  k=em.HAS_CHILD_K)
    plans["children agg (parent buckets in child context)"] = \
        children_agg(cust, orders, "c_custkey", "o_custkey",
                     "c_mktsegment",
                     F.floor(F.col("o_totalprice") * F.lit(1e6)
                             + F.lit(0.5)))
    plans["frequent_item_sets (Apriori, broadcast L1/L3)"] = \
        frequent_item_sets(em._docs(spark, sf_dir),
                           min_support=em.FIS_MIN_SUPPORT,
                           top_n=em.FIS_TOPN)
    from engine.pipeline.curation import random_sampler_agg
    from engine.streaming import bucket_correlation, change_point_agg
    plans["random_sampler agg (hash-gated sample, scaled)"] = \
        random_sampler_agg(ev, em.RANDOM_SAMPLER_P)
    plans["geo_shape relations (one conditional-agg pass)"] = \
        geo_mod.geo_shape_counts(ev, em.GEO_ENV_Q, em.GEO_ENV_DW_MOD,
                                 em.GEO_ENV_DH_MOD)
    plans["bucket_correlation (Pearson vs bucket-index ramp)"] = \
        bucket_correlation(ev)
    plans["change_point (max between-group SS split)"] = \
        change_point_agg(ev)

    out = ["# PLANS — physical-plan audit (`.explain(\"formatted\")`)",
           "",
           f"Generated by `python tools/explain_audit.py {sf_dir}`. "
           "Properties audited: broadcast joins on the (tiny) query "
           "side, parquet filter pushdown + partition pruning on "
           "postings reads, wide WholeStageCodegen spans around the "
           "scoring arithmetic, and absence of cartesian products.",
           ""]
    for name, df in plans.items():
        txt = plan_text(df)
        marks = []
        for label, needle in CHECKS.items():
            ok = needle in txt
            if not ok and label == "broadcast join" and name in JOINLESS_OK:
                marks.append("– join-free plan (no broadcast expected)")
                continue
            if (not ok and label == "parquet pushdown"
                    and name in NO_PUSHDOWN_OK):
                marks.append("– full-scan agg (no filter to push)")
                continue
            marks.append(f"{'✓' if ok else '✗'} {label}")
        for flag in RED_FLAGS:
            if flag in txt:
                marks.append(f"⚠ RED FLAG: {flag}")
        if "BroadcastNestedLoopJoin" in txt and name not in BNLJ_OK:
            marks.append("⚠ RED FLAG: BroadcastNestedLoopJoin")
        out.append(f"## {name}")
        out.append("")
        out.append("  " + " · ".join(marks))
        out.append("")
        out.append("```")
        out.append(txt.strip()[:6000])
        out.append("```")
        out.append("")
        print(name, "→", " · ".join(marks))

    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
