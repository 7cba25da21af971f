"""Document deletes: tombstone (liveDocs) filtering across the query
paths, WAND rank-identity under deletes, and the physical purge
(forceMergeDeletes analog) with stats refresh."""

import pytest
from pyspark.sql import functions as F

from engine.deletes import delete_docs, purge_deleted
from engine.index_build import build_index
from engine.search import (Index, boolean_and, count_matches,
                           score_exhaustive, score_wand)


def test_delete_tombstones_and_purge(spark, tmp_path):
    docs = ["xx yy", "xx zz", "yy zz qq", "xx yy zz"]
    rows = [(f"org/r{i}", f"f{i}.py", "c" * 12, "python", t)
            for i, t in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    path = str(tmp_path / "delidx")
    build_index(spark, df, path, n_buckets=2, n_doc_buckets=2)
    idx = Index(spark, path)
    assert idx.tombstones is None

    qq_doc = score_exhaustive(idx, [("f", "qq", 1.0)], 10) \
        .collect()[0]["doc_id"]
    n_before = count_matches(idx, [("c", ["zz"])]).collect()[0]["n_hits"]

    delete_docs(spark, path, [qq_doc])
    idx2 = Index(spark, path)
    assert idx2.n_tombstones == 1
    # searches exclude the deleted doc; collection stats stay frozen
    # until purge (Lucene: deleted docs count in stats until merge)
    q = [("q", "zz", 1.0), ("q", "yy", 1.0)]
    hits = {r["doc_id"] for r in score_exhaustive(idx2, q, 10).collect()}
    assert qq_doc not in hits and hits
    assert idx2.n_docs == 4
    # WAND stays rank-identical to exhaustive under pending deletes
    ex = [(r["doc_id"], r["rank"])
          for r in score_exhaustive(idx2, q, 3).collect()]
    wa = [(r["doc_id"], r["rank"]) for r in score_wand(idx2, q, 3).collect()]
    assert ex == wa
    assert count_matches(idx2, [("c", ["zz"])]).collect()[0]["n_hits"] \
        == n_before - 1
    ba = {r["doc_id"] for r in
          boolean_and(idx2, [("b", ["yy", "zz"])]).collect()}
    assert qq_doc not in ba and ba

    # physical purge: postings/docs/tf/termstats rewritten, stats fresh
    m = purge_deleted(spark, path)
    assert m["purged"] == 1 and m["n_docs"] == 3
    idx3 = Index(spark, path)
    assert idx3.tombstones is None and idx3.n_docs == 3
    assert idx3.df_map(["qq"]) == {}          # vocabulary entry gone
    hits3 = {r["doc_id"] for r in score_exhaustive(idx3, q, 10).collect()}
    assert hits3 == hits
    # purged index scores == an index built WITHOUT the doc (multiset —
    # doc_ids are assignment-order-dependent across builds)
    path2 = str(tmp_path / "delidx2")
    build_index(spark, df.where(~F.col("content").contains("qq")), path2,
                n_buckets=2, n_doc_buckets=2)
    idxr = Index(spark, path2)
    s_purged = sorted(round(r["score"], 9)
                      for r in score_exhaustive(idx3, q, 10).collect())
    s_rebuilt = sorted(round(r["score"], 9)
                       for r in score_exhaustive(idxr, q, 10).collect())
    assert s_purged == s_rebuilt
    # purge with no tombstones is a no-op
    assert purge_deleted(spark, path)["purged"] == 0


def test_delete_batches_accumulate_and_dedupe(spark, tmp_path):
    docs = ["aa bb", "bb cc", "cc dd"]
    rows = [(f"org/r{i}", f"f{i}.py", "c" * 12, "python", t)
            for i, t in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    path = str(tmp_path / "delidx3")
    build_index(spark, df, path, n_buckets=2, n_doc_buckets=2)
    idx = Index(spark, path)
    ids = sorted(r["doc_id"] for r in idx.docs.select("doc_id").collect())
    delete_docs(spark, path, [ids[0]])
    delete_docs(spark, path, [ids[0], ids[1]])   # overlap across batches
    idx2 = Index(spark, path)
    assert idx2.n_tombstones == 2                # distinct
    assert purge_deleted(spark, path)["purged"] == 2
    assert Index(spark, path).n_docs == 1


def test_update_docs_nrt_cycle(spark, tmp_path):
    """updateDocument analog: replace-by-docno tombstones the old doc
    and adds the new content as a delta segment under a fresh doc_id;
    NRT search sees the update immediately; compact+purge folds it
    into a clean base index."""
    from engine.deletes import purge_deleted, update_docs
    from engine.streaming import compact_deltas, nrt_index

    rows = [("r", "a", "-", "py", "aa bb"), ("r", "b", "-", "py", "bb cc")]
    schema = ("repo string, path string, commit string, lang string, "
              "content string")
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "upidx")
    build_index(spark, df, path, n_buckets=4, n_doc_buckets=1)

    m = update_docs(spark, path,
                    spark.createDataFrame(
                        [("r", "a", "-", "py", "dd bb")], schema))
    assert m["replaced"] == 1 and m["added"] == 1

    nrt = nrt_index(spark, path)
    assert nrt.n_tombstones == 1
    assert score_exhaustive(nrt, [("q", "aa", 1.0)], 10).count() == 0
    dd = score_exhaustive(nrt, [("q", "dd", 1.0)], 10).collect()
    assert len(dd) == 1 and dd[0]["doc_id"] == 2   # fresh id above max
    assert score_exhaustive(nrt, [("q", "bb", 1.0)], 10).count() == 2

    # a docno NOT in the index is a plain add
    m2 = update_docs(spark, path,
                     spark.createDataFrame(
                         [("r", "z", "-", "py", "ee")], schema))
    assert m2["replaced"] == 0 and m2["added"] == 1 and m2["epoch"] == 1
    nrt2 = nrt_index(spark, path)
    assert score_exhaustive(nrt2, [("q", "ee", 1.0)], 10).count() == 1

    # fold in + reclaim: clean base index, refreshed stats
    compact_deltas(spark, path)
    purge_deleted(spark, path)
    idx = Index(spark, path)
    assert idx.tombstones is None and idx.n_docs == 3
    assert idx.df_map(["aa"]) == {}
    assert idx.df_map(["dd", "bb", "ee"]) == {"dd": 1, "bb": 2, "ee": 1}
    assert score_exhaustive(idx, [("q", "dd", 1.0)], 10).count() == 1


def test_update_docs_respects_stemmed_analyzer(spark, tmp_path):
    """Regression: the delta writer must use the BASE index's analyzer
    settings — an update to a stem=True index must land stemmed terms
    in the same vocabulary (was: always unstemmed)."""
    from engine.deletes import update_docs
    from engine.streaming import nrt_index

    rows = [("r", "a", "-", "py", "running policies"),
            ("r", "b", "-", "py", "other words")]
    schema = ("repo string, path string, commit string, lang string, "
              "content string")
    path = str(tmp_path / "stemidx")
    build_index(spark, spark.createDataFrame(rows, schema), path,
                n_buckets=2, n_doc_buckets=1, stem=True)
    update_docs(spark, path,
                spark.createDataFrame([("r", "b", "-", "py",
                                        "connected stories")], schema))
    nrt = nrt_index(spark, path)
    # porter: connected→connect, stories→stori — searchable ONLY if the
    # delta was stemmed with the base analyzer
    assert score_exhaustive(nrt, [("q", "connect", 1.0)], 10).count() == 1
    assert score_exhaustive(nrt, [("q", "stori", 1.0)], 10).count() == 1
    # the unstemmed surface form must NOT be in the vocabulary
    assert score_exhaustive(nrt, [("q", "connected", 1.0)], 10).count() == 0


def test_purge_rerun_is_idempotent(spark, tmp_path):
    """Crash-recovery contract: tombstones referencing already-purged
    docs (the state after a crash between swaps and the tombstone
    clear) make a re-run a clean no-op-mask that completes safely."""
    from engine.deletes import delete_docs, purge_deleted

    rows = [("r", "a", "-", "py", "aa bb"), ("r", "b", "-", "py", "bb cc"),
            ("r", "c", "-", "py", "cc dd")]
    schema = ("repo string, path string, commit string, lang string, "
              "content string")
    path = str(tmp_path / "idem")
    build_index(spark, spark.createDataFrame(rows, schema), path,
                n_buckets=2, n_doc_buckets=1)
    idx = Index(spark, path)
    dead = idx.docs.where("docno = 'r/b'").select("doc_id").collect()[0][0]
    delete_docs(spark, path, [dead])
    m1 = purge_deleted(spark, path)
    assert m1["purged"] == 1 and m1["n_docs"] == 2
    before = sorted(map(tuple, score_exhaustive(
        Index(spark, path), [("q", "bb", 1.0), ("q", "cc", 1.0)],
        10).collect()))
    # simulate the post-crash state: tombstones for the PURGED id exist
    delete_docs(spark, path, [dead])
    m2 = purge_deleted(spark, path)
    assert m2["purged"] == 1 and m2["n_docs"] == 2   # masks nothing real
    after = sorted(map(tuple, score_exhaustive(
        Index(spark, path), [("q", "bb", 1.0), ("q", "cc", 1.0)],
        10).collect()))
    assert before == after
    assert Index(spark, path).tombstones is None


def test_purge_masks_delta_segments(spark, tmp_path):
    """ADVICE r2 (medium): a tombstoned doc whose postings live in a
    DELTA segment (docno updated twice) must not resurrect in
    nrt_index searches after purge_deleted runs before compact_deltas
    — purge now masks the delta segments too."""
    from engine.deletes import purge_deleted, update_docs
    from engine.streaming import nrt_index

    rows = [("r", "a", "-", "py", "aa bb"), ("r", "b", "-", "py", "bb cc")]
    schema = ("repo string, path string, commit string, lang string, "
              "content string")
    path = str(tmp_path / "deltapurge")
    build_index(spark, spark.createDataFrame(rows, schema), path,
                n_buckets=4, n_doc_buckets=1)
    # update the SAME docno twice: the first update's replacement doc
    # lives only in delta epoch 0 and is tombstoned by the second
    update_docs(spark, path, spark.createDataFrame(
        [("r", "a", "-", "py", "dd bb")], schema))
    update_docs(spark, path, spark.createDataFrame(
        [("r", "a", "-", "py", "ee bb")], schema))
    nrt = nrt_index(spark, path)
    assert score_exhaustive(nrt, [("q", "dd", 1.0)], 10).count() == 0
    assert score_exhaustive(nrt, [("q", "ee", 1.0)], 10).count() == 1

    # purge BEFORE compacting: tombstones clear, deltas masked
    m = purge_deleted(spark, path)
    assert m["purged"] == 2
    nrt2 = nrt_index(spark, path)
    assert nrt2.tombstones is None
    # the twice-replaced doc must NOT reappear (was: resurrected)
    assert score_exhaustive(nrt2, [("q", "dd", 1.0)], 10).count() == 0
    assert score_exhaustive(nrt2, [("q", "aa", 1.0)], 10).count() == 0
    assert score_exhaustive(nrt2, [("q", "ee", 1.0)], 10).count() == 1
    assert score_exhaustive(nrt2, [("q", "bb", 1.0)], 10).count() == 2
    # and the surviving delta doc still compacts cleanly afterwards
    from engine.streaming import compact_deltas
    compact_deltas(spark, path)
    idx = Index(spark, path)
    assert score_exhaustive(idx, [("q", "ee", 1.0)], 10).count() == 1


def test_purge_preserves_skew_split_salts(spark, tmp_path):
    """ADVICE r2 (low): purge groups by (bucket, term, salt), so a
    skew-split head term keeps its salted sub-postings (per-task
    memory bound + WAND task sizing survive purge) and results stay
    identical to a fresh build without the deleted doc."""
    from engine.corpus import generate_corpus_df
    from engine.deletes import delete_docs, purge_deleted

    corpus = generate_corpus_df(spark, 120, partitions=4, max_tokens=200)
    path = str(tmp_path / "saltpurge")
    build_index(spark, corpus, path, n_buckets=4, n_doc_buckets=4,
                split_threshold=10)
    idx = Index(spark, path)
    salted_terms_before = {
        r["term"] for r in idx.postings.where(F.col("salt") > 0)
        .select("term").distinct().collect()}
    assert salted_terms_before
    dead = [r["doc_id"] for r in idx.docs.limit(2).collect()]
    delete_docs(spark, path, dead)
    purge_deleted(spark, path)
    idx2 = Index(spark, path)
    salted_terms_after = {
        r["term"] for r in idx2.postings.where(F.col("salt") > 0)
        .select("term").distinct().collect()}
    # head terms keep their split (dropping a couple of docs can empty
    # at most a few tiny sub-postings, never the whole salted family)
    assert salted_terms_after == salted_terms_before
    # correctness after the salted purge: WAND stays rank-identical to
    # exhaustive over the rewritten salted sub-postings
    q = [("q", t, 1.0) for t in sorted(salted_terms_before)[:3]]
    ex = [(r["doc_id"], r["rank"], round(r["score"], 9))
          for r in score_exhaustive(idx2, q, 15).collect()]
    wa = [(r["doc_id"], r["rank"], round(r["score"], 9))
          for r in score_wand(idx2, q, 15).collect()]
    assert ex == wa and ex
    assert all(d not in dead for d, _, _ in ex)


def test_wand_mass_deletes_bounded_k(spark, tmp_path):
    """VERDICT r2: with |tombstones| >> k the WAND kernel must stay a
    plain top-k (liveDocs masked at decode, no k+|tombstones|
    overfetch) and remain rank-identical to exhaustive."""
    from engine.corpus import generate_corpus_df

    corpus = generate_corpus_df(spark, 120, partitions=4, max_tokens=150)
    path = str(tmp_path / "massdel")
    build_index(spark, corpus, path, n_buckets=4, n_doc_buckets=4)
    idx = Index(spark, path)
    # delete HALF the corpus — far more tombstones than k
    dead = [r["doc_id"] for r in
            idx.docs.select("doc_id").collect()][::2]
    delete_docs(spark, path, dead)
    idx2 = Index(spark, path)
    k = 5
    assert idx2.n_tombstones > 10 * k
    from engine.topics import synthetic_topics, topics_to_query_terms
    qt = topics_to_query_terms(synthetic_topics(5))
    ex = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
          for r in score_exhaustive(idx2, qt, k).collect()]
    wa = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
          for r in score_wand(idx2, qt, k).collect()]
    assert ex == wa and ex
    dead_set = set(dead)
    assert all(d not in dead_set for _, _, d, _ in wa)
    # multi-shard path under mass deletes too (θ seeds + slices)
    wa3 = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
           for r in score_wand(idx2, qt, k, n_shards=3).collect()]
    assert ex == wa3


def test_update_docs_appends_long_doc_ids(spark, tmp_path):
    """Regression (real-corpus lifecycle bench): update_docs must
    append docs/tf rows with int64 doc_id — int32 appends poison the
    parquet dirs with mixed physical types and later scans fail."""
    import pyarrow.parquet as pq

    from engine.deletes import update_docs

    rows = [("r", "a", "-", "py", "aa bb"), ("r", "b", "-", "py", "bb cc")]
    schema = ("repo string, path string, commit string, lang string, "
              "content string")
    path = str(tmp_path / "longid")
    build_index(spark, spark.createDataFrame(rows, schema), path,
                n_buckets=2, n_doc_buckets=1)
    update_docs(spark, path, spark.createDataFrame(
        [("r", "a", "-", "py", "dd bb")], schema))
    import glob
    import os
    for table in ("docs", "tf"):
        for f in glob.glob(os.path.join(path, table, "**", "*.parquet"),
                           recursive=True):
            t = pq.read_schema(f)
            assert str(t.field("doc_id").type) == "int64", (table, f)


def test_lifecycle_invalidates_sidecars(spark, tmp_path):
    """Stale-sidecar regression: positional and trigram sidecars are
    views of docs/tf/termstats — update_docs / purge_deleted /
    compact_deltas must drop them so the next build refreshes.
    Without invalidation, (a) a phrase/interval search misses content
    updated into the index, and (b) a wildcard rewrite misses NEW
    dictionary terms."""
    import os

    from engine.deletes import update_docs
    from engine.positions import build_positions, phrase_match
    from engine.streaming import compact_deltas
    from engine.trigram import (build_term_trigrams,
                                expand_wildcard_terms_trigram)

    rows = [("org/r", "a.py", "c" * 12, "python", "alpha beta gamma"),
            ("org/r", "b.py", "c" * 12, "python", "delta epsilon")]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    path = str(tmp_path / "scidx")
    build_index(spark, df, path, n_buckets=2, n_doc_buckets=1)
    build_positions(spark, path)
    build_term_trigrams(spark, path)
    assert os.path.exists(path + "/positions")
    assert os.path.exists(path + "/term_trigrams")

    # update a.py with NEW phrase content and a NEW dictionary term
    upd = spark.createDataFrame(
        [("org/r", "a.py", "d" * 12, "python",
          "omega zebrafish alpha")],
        "repo string, path string, commit string, lang string, "
        "content string")
    update_docs(spark, path, upd)
    # sidecars must be gone (stale views dropped)
    assert not os.path.exists(path + "/positions")
    assert not os.path.exists(path + "/term_trigrams")

    compact_deltas(spark, path)
    idx = Index(spark, path)
    # rebuilt sidecars see the new content and the new term
    build_positions(spark, path)
    got = {r["doc_id"] for r in
           phrase_match(idx, [("p", "omega zebrafish")]).collect()}
    assert len(got) == 1
    build_term_trigrams(spark, path)
    terms = expand_wildcard_terms_trigram(idx, [("w", "*ebrafis*")])
    assert [t for _, t, _ in terms] == ["zebrafish"]


def test_selective_purge_equivalence_and_bounds(spark, tmp_path):
    """Round 4 (VERDICT r3 item 3): the selective purge must produce
    the same index CONTENT as the full re-encode — identical query
    results, identical decoded postings — while rewriting only the
    dirty (bucket, term) groups; clean groups keep their blobs with a
    WAND-sound block_max_w (≥ the true max weight under the new
    avgdl). Includes the post-compact case (salts merged to 0 while tf
    keeps build salts) where salt-level matching would silently miss
    dirty groups."""
    import shutil

    import numpy as np

    from engine.deletes import update_docs
    from engine.postings import bm25_weight, decode_postings
    from engine.streaming import compact_deltas

    # corpus where one rare term ('unique7') lives only in live docs —
    # its group must stay clean — and common terms hit the dead docs
    rows = [("org/r", f"f{i}.py", "c" * 12, "py",
             " ".join(["common"] * (3 + i % 4)
                      + [f"mid{i % 6}"] * 2
                      + (["unique7"] if i in (1, 5) else [])
                      + ["tail" + str(i)]))
            for i in range(24)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    path_a = str(tmp_path / "sel")
    build_index(spark, df, path_a, n_buckets=3, n_doc_buckets=2)
    # an update batch creates deltas; compaction merges dirty salts→0
    update_docs(spark, path_a, spark.createDataFrame(
        [("org/r", "f0.py", "d" * 12, "py", "common replaced body")],
        "repo string, path string, commit string, lang string, "
        "content string"))
    compact_deltas(spark, path_a)
    # path_b = identical copy for the full-rewrite reference
    path_b = str(tmp_path / "full")
    shutil.copytree(path_a, path_b)

    idx = Index(spark, path_a)
    dead = [r["doc_id"] for r in
            idx.docs.where(F.col("content").contains("mid1"))
            .select("doc_id").limit(3).collect()]
    for p in (path_a, path_b):
        delete_docs(spark, p, dead)
    ma = purge_deleted(spark, path_a, selective=True)
    mb = purge_deleted(spark, path_b, selective=False)
    # +1: update_docs' replaced doc stays tombstoned through compaction
    assert ma["purged"] == mb["purged"] == len(dead) + 1
    assert ma["groups_rewritten"] is not None
    ia, ib = Index(spark, path_a), Index(spark, path_b)
    n_groups_total = ia.postings.count()
    assert 0 < ma["groups_rewritten"] < n_groups_total  # some stay clean

    # decoded postings identical group-by-group
    def dump(ix):
        out = {}
        for r in ix.postings.collect():
            d, t, dl = decode_postings(bytes(r["blob"]))
            out.setdefault((r["term"], r["salt"]), []).append(
                (list(d), list(t), list(dl), r["df_part"]))
        return {k: sorted(v) for k, v in out.items()}

    assert dump(ia) == dump(ib)
    # query results identical (scores use live stats, not baked bounds)
    q = [("q", "common", 1.0), ("q", "mid0", 2.0), ("q2", "unique7", 1.0)]
    ra = [(r["qid"], r["doc_id"], round(r["score"], 9), r["rank"])
          for r in score_wand(ia, q, 10).collect()]
    rb = [(r["qid"], r["doc_id"], round(r["score"], 9), r["rank"])
          for r in score_wand(ib, q, 10).collect()]
    assert ra == rb and ra
    # WAND soundness: every stored block_max_w on the selective index
    # dominates the true max bm25 weight under the POST-purge avgdl
    avgdl = ia.avgdl
    k1, b = ia.stats["k1"], ia.stats["b"]
    for r in ia.postings.collect():
        d, t, dl = decode_postings(bytes(r["blob"]))
        true_w = bm25_weight(np.asarray(t), np.asarray(dl), avgdl, k1, b)
        stored = np.asarray(r["block_max_w"], dtype=float)
        bsz = ia.stats.get("block_size", 128)
        for bi in range(len(stored)):
            blk = true_w[bi * bsz:(bi + 1) * bsz]
            if blk.size:
                assert stored[bi] >= blk.max() - 1e-12


def test_selective_purge_rare_term_group_skips_decode(spark, tmp_path):
    """The affected list must contain exactly the dead docs' terms —
    a term absent from every dead doc is never rewritten."""
    rows = [("org/r", f"g{i}.py", "c" * 12, "py",
             "shared words here " + ("rareterm only alive" if i == 0
                                     else f"filler{i}"))
            for i in range(8)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    path = str(tmp_path / "skip")
    build_index(spark, df, path, n_buckets=2, n_doc_buckets=2)
    idx = Index(spark, path)
    dead = [r["doc_id"] for r in
            idx.docs.where(F.col("path") == "g3.py").collect()]
    before = {(r["term"], r["salt"]): bytes(r["blob"])
              for r in idx.postings.collect()}
    delete_docs(spark, path, dead)
    m = purge_deleted(spark, path, selective=True)
    after = {(r["term"], r["salt"]): bytes(r["blob"])
             for r in Index(spark, path).postings.collect()}
    # rareterm (only in live g0) keeps its exact original blob bytes
    assert after[("rareterm", 0)] == before[("rareterm", 0)]
    # the dead doc's unique term is gone entirely
    assert ("filler3", 0) not in after
    # rewritten-group count == the dead doc's distinct term count
    n_dead_terms = 4  # shared, words, here, filler3
    assert m["groups_rewritten"] == n_dead_terms


def test_selective_purge_after_compact_salt_collapse(spark, tmp_path):
    """Regression (round-4 self-review): the dirty flag must join on
    (bucket, term) — NEVER (bucket, term, salt). With a genuinely
    skew-SPLIT head term (split_threshold=4 here), compact_deltas
    collapses its postings to one salt=0 row while tf keeps the
    build-lineage salts (pmod(doc_id, n_splits)); a salt-level join
    finds no posting row at the tf salts, streams the group through
    as "clean", and the deleted doc RESURRECTS in every query for
    that term once the tombstones clear."""
    import shutil

    from engine.deletes import update_docs
    from engine.postings import decode_postings
    from engine.streaming import compact_deltas

    rows = [("org/r", f"s{i}.py", "c" * 12, "py",
             "headterm " + f"only{i}")
            for i in range(12)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    path_a = str(tmp_path / "salted")
    build_index(spark, df, path_a, n_buckets=2, n_doc_buckets=2,
                split_threshold=4)
    idx0 = Index(spark, path_a)
    salts = sorted(r["salt"] for r in idx0.postings
                   .where(F.col("term") == "headterm").collect())
    assert len(salts) > 1  # the split genuinely exists pre-compact

    # a delta touching headterm, then compaction → salts collapse to 0
    update_docs(spark, path_a, spark.createDataFrame(
        [("org/r", "s0.py", "d" * 12, "py", "headterm refreshed")],
        "repo string, path string, commit string, lang string, "
        "content string"))
    compact_deltas(spark, path_a)
    idx1 = Index(spark, path_a)
    assert [r["salt"] for r in idx1.postings
            .where(F.col("term") == "headterm").collect()] == [0]

    path_b = str(tmp_path / "saltedfull")
    shutil.copytree(path_a, path_b)

    # delete a doc whose tf build salt is NON-zero so the stale
    # salt-level join could never flag the compacted salt=0 group
    tf = spark.read.parquet(f"{path_a}/tf")
    victim = (tf.where((F.col("term") == "headterm") &
                       (F.col("salt") != 0))
              .select("doc_id").limit(1).collect()[0]["doc_id"])
    for p in (path_a, path_b):
        delete_docs(spark, p, [victim])
    purge_deleted(spark, path_a, selective=True)
    purge_deleted(spark, path_b, selective=False)

    def headterm_docs(path):
        out = []
        for r in (Index(spark, path).postings
                  .where(F.col("term") == "headterm").collect()):
            out.extend(decode_postings(bytes(r["blob"]))[0])
        return sorted(int(d) for d in out)

    a, b = headterm_docs(path_a), headterm_docs(path_b)
    assert victim not in a  # the resurrection bug
    assert a == b           # selective == full, byte-for-byte content
