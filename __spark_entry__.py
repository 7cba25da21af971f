"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: tokenize → build inverted index → block-max
WAND BM25 top-k over sf0.001 documents.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 plus the training-data pipeline ops; the driver runs
each Spark query against the matching DuckDB SQL at sf=0.01.

Column-name + value alignment rules used throughout:
* every computed column is aliased identically in Spark and SQL;
* floating-point outputs are rounded to a fixed precision on BOTH
  sides (per-row scalar math is IEEE-identical across engines; sums
  differ by ~1e-15, far below the rounding grain);
* rank windows order by (score desc, id asc) in BOTH engines.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.analysis import (
    duckdb_clean_sql, duckdb_stoplist_sql, tokenize_pandas_udf, tokens_col,
)
from engine.portable import round_half_up, round_half_up_sql
from engine.scoring import B, K1, bm25_col, bm25_sql, ib_sql, lmd_sql

# ---------------------------------------------------------------------------
# Fixed query sets (terms drawn from the driver testdata vocabulary)
# ---------------------------------------------------------------------------

# Tracked rotation queue (VERDICT r3 item 5's allowance): entries
# listed here sit BEYOND the driver's first-50 window AND have never
# been driver-checked; they are oracle-checked by the local gate
# (tools/check_oracles.py) meanwhile. EMPTY as of round 5: the r4
# backlog of 26 rotated into the first-50 window (CORRECTNESS_r04
# showed every displaced r4 entry green), so every queries() entry
# either sits in-window or carries the hard driver signal.
# tests/test_rotation_policy.py enforces all legs of this.
ROTATION_QUEUE: list[str] = []

BM25_QUERIES: list[tuple[str, list[str]]] = [
    ("q1", ["merge", "sort"]),
    ("q2", ["hash", "join", "table"]),
    ("q3", ["window", "group", "agg"]),
    ("q4", ["dup", "stream"]),
    ("q5", ["spark", "fast", "query", "vector"]),
]
AND_QUERIES: list[tuple[str, list[str]]] = [
    ("a1", ["merge", "sort", "fast"]),
    ("a2", ["hash", "join"]),
    ("a3", ["dup", "key"]),
    ("a4", ["vector", "column", "row", "scan", "batch"]),
]
ANN_QUERY_IDS = [0, 1, 2, 3, 4]
TOPK = 10

# Spell-suggestion inputs (Lucene DirectSpellChecker): misspellings
# of real vocabulary terms at edit distance 1-2, plus one ("sparkk")
# whose neighborhood probes multi-candidate df tie-breaking.
SUGGEST_QUERIES: list[tuple[str, str]] = [
    ("sg1", "mergo"), ("sg2", "windoe"), ("sg3", "tabel"),
    ("sg4", "sparkk"),
]

# Positional retrieval (engine/positions.py): phrases analyze with
# gap-preserving offsets — p3/p5 span a stopword ("a"/"by"), exercising
# Lucene-style position increments across both engines.
PHRASE_QUERIES: list[tuple[str, str]] = [
    ("p1", "merge sort"),
    ("p2", "hash value"),
    ("p3", "value a table"),
    ("p4", "sort key"),
    ("p5", "group by window"),
]
PROX_QUERIES: list[tuple[str, list[str]]] = [
    ("x1", ["merge", "sort"]),
    ("x2", ["vector", "scan", "batch"]),
    ("x3", ["customer"]),
]
PROX_WINDOW = 4

# ES intervals query (all_of ordered=true, max_gaps): iv2 reverses iv1
# (ordering must gate), iv3 carries a query-side stopword (dropped by
# the analyzer, costless) while doc-side stopwords still cost gaps,
# iv5 is single-term presence
INTERVAL_QUERIES: list[tuple[str, str]] = [
    ("iv1", "merge sort"),
    ("iv2", "sort merge"),
    ("iv3", "hash a table"),
    ("iv4", "group window"),
    ("iv5", "customer"),
]
INTERVAL_MAX_GAPS = 2

# Lucene SpanNotQuery inputs: include term occurrences surviving a
# +-SPAN_NOT_WINDOW exclude window; sn3's exclude is absent from the
# vocabulary -> plain term match
SPAN_NOT_QUERIES: list[tuple[str, str, str]] = [
    ("sn1", "merge", "sort"),
    ("sn2", "hash", "value"),
    ("sn3", "customer", "zzznope"),
]
SPAN_NOT_WINDOW = 3

# percentile_ranks probe values (analyzed-dl thresholds)
PCT_RANK_VALUES = [50, 120, 400]

# ES geo family (engine/geo.py): points derive deterministically from
# event_id; the distance query centre/radius keep ~1/8 of the sphere
# in range so the radius gate genuinely bites, and the ring edges
# split the in-range mass across every bucket at sf0.01.
GEO_CENTER_A = (48.8566, 2.3522)     # geo_distance query centre
GEO_CENTER_B = (40.7128, -74.0060)   # ring aggregation centre
GEO_RADIUS_KM = 2500.0
GEO_TOPK = 50
GEO_RING_EDGES = [0.0, 2500.0, 6000.0, 11000.0]
GEO_BBOX = {"top": 55.0, "bottom": 20.0, "left": -30.0, "right": 60.0}
GEOHASH_GRID_PRECISION = 2           # 1,024 cells — counts vary at sf0.01
GEOHASH_GRID_TOPN = 25
GEOTILE_ZOOM = 5

# geo_polygon: a NON-CONVEX dart ((lon_m, lat_m) integer millidegree
# vertices) so the even-odd parity rule is load-bearing — at sf0.01
# the polygon's bbox holds 741 events but only 245 are inside, and 78
# of the excluded sit in the concave notch below (40000, 20000): the
# parity branch genuinely bites, not just the bbox.
GEO_POLYGON_M = [(0, 0), (40000, 60000), (80000, 0), (40000, 20000)]

# geo_shape (envelope relations): per-event rectangles with WIDELY
# varying half-extents (200..36199 × 200..20199 millideg) so every
# relation has satisfying docs against the fixed query envelope at
# sf0.01 — intersects 510, within 20, contains 13, disjoint 9,490
# (distribution probed per the threshold-picking lesson; within needs
# small doc boxes inside Q, contains needs huge ones around it).
GEO_ENV_Q = (0, 36000, 0, 24000)         # (qx1, qx2, qy1, qy2)
GEO_ENV_DW_MOD = 36000
GEO_ENV_DH_MOD = 20000

# geo_line: size placed INSIDE the sf0.01 group-size band
# (1981..2017 events per event_type) so BOTH output branches bite at
# the driver scale: purchase/view (≤1982) come back complete=true,
# click/error/signup are truncated to exactly 2000 points
# (threshold-picking lesson: probe the distribution first).
GEO_LINE_SIZE = 2000

# ip_range: uint32 quartile edges + one deliberately OVERLAPPING
# middle range — overlap is the reason the agg is a conditional-agg
# pass rather than a group-by, so the fixture must exercise it; every
# bucket is non-empty at sf0.01 (2.4-2.6k events each quartile).
IP_RANGES = [(None, 1 << 30), (1 << 30, 1 << 31),
             (1 << 31, 3 << 30), (3 << 30, None),
             (1 << 29, 3 << 30)]

# ES categorize_text / ip_prefix aggs (engine/pipeline/textstats.py,
# curation.py): template buckets over event_type+props messages (every
# props carries a digit token, so the <num> normalization bites on
# every row); /8 client-IP prefixes over the Knuth-mixed user space.
CATEGORIZE_TOPN = 20
IP_PREFIX_LEN = 8

# ES frequent_item_sets (engine/pipeline/itemsets.py): 0.57 ⇒ abs
# support 285 at sf0.01 — sits between the triple ceiling (290) and
# the pair floor (292), so the L1 prune (the df=25 tail term), the
# size-3 support filter (40 of 4,060 mined triples survive) and the
# rank cut (450 < 475 sets) all genuinely bite; the closedness
# anti-join runs (no equal-support superset exists in this data — the
# closedness branch itself is regression-tested on synthetic sets in
# tests/test_itemsets.py).
FIS_MIN_SUPPORT = 0.57
FIS_TOPN = 450

# ES terms agg missing/other (engine/pipeline/textstats.py): size=2
# over the marker field's 4 buckets (customer 176 / stream 153 /
# vector 151 / missing 20 at sf0.01) — missing bucket, size cut and
# other-sum all bite.
TERMS_OTHER_SIZE = 2

# ES random_sampler (engine/pipeline/curation.py): p=0.35 keeps the
# gate inside the ES-pinned (0, 0.5] band and passes ~3.5k of 10k
# events at sf0.01 — both the include and the exclude branch bite.
RANDOM_SAMPLER_P = 0.35

# ES join-field family (engine/joinfield.py) over the TPC-H
# customer⋈orders 1-N relation: the 430k price floor keeps 2,089 of
# 15,000 orders, min_children=2 then drops 539 of 1,142 matching
# parents and the k=50 cut bites on the surviving 603 (all probed at
# sf0.01); the BUILDING+positive-balance parent filter keeps 276 of
# 302 segment customers.
HAS_CHILD_PRICE_FLOOR = 430000.0
HAS_CHILD_MIN_CHILDREN = 2
HAS_CHILD_K = 50
HAS_PARENT_SEGMENT = "BUILDING"

# ES terms agg + top_hits sub-agg (buckets by stored lang field)
TOP_HITS_BUCKETS = 3
TOP_HITS_PER_BUCKET = 4

# CCNet bigram-LM cross-entropy keep threshold (nats)
LM_CE_THRESHOLD = 7.0

# match_phrase_prefix inputs: exact tokens + a trailing prefix; mp3
# spans a stopword gap ("by"), mp4 is a bare prefix (no exact tokens —
# present in the hit-set entry, absent by construction from topk)
PHRASE_PREFIX_QUERIES: list[tuple[str, str]] = [
    ("mp1", "merge s"),
    ("mp2", "hash v"),
    ("mp3", "group by win"),
    ("mp4", "quer"),
]

# phrase-suggester inputs (ES "did you mean"): misspellings at edit
# distance 1-2 with a correct context token (dm2), multi-error (dm3),
# and an already-correct query (dm4 — suggestion must echo the input)
DYM_QUERIES: list[tuple[str, str]] = [
    ("dm1", "mergo sorp"),
    ("dm2", "windoe group"),
    ("dm3", "hash tabel scanx"),
    ("dm4", "spark"),
]

RANDOM_SEED = 42

# Term-expansion queries (Lucene PrefixQuery / FuzzyQuery rewrites)
PREFIX_QUERIES: list[tuple[str, str]] = [
    ("pre1", "mer"), ("pre2", "win"), ("pre3", "cust"),
]
# completion-suggester prefixes: 's' has 6 dictionary candidates (so
# the top-5 cut engages), 'zz' has none (empty-result qid)
COMPLETION_QUERIES: list[tuple[str, str]] = [
    ("c1", "s"), ("c2", "b"), ("c3", "mer"), ("c4", "zz"),
]
FUZZY_QUERIES: list[tuple[str, str]] = [
    ("fz1", "mergo"), ("fz2", "windoe"), ("fz3", "batch"),
]
WILDCARD_QUERIES: list[tuple[str, str]] = [
    ("w1", "mer*"), ("w2", "?ash"), ("w3", "s*m"), ("w4", "valu?"),
]

# trigram-accelerated wildcard inputs: infix / leading-wildcard
# patterns (the full-dictionary-scan killers) plus a short-literal
# fallback (?as? has no 3-char run -> full-scan path)
WILDCARD_TRIGRAM_QUERIES: list[tuple[str, str]] = [
    ("wt1", "*erg*"), ("wt2", "*alue"), ("wt3", "win*ow"), ("wt4", "?as?"),
]
MLT_SEEDS = [0, 1, 2]
MLT_TERMS = 10

# free-text MLT inputs (the ES `like: "raw text"` form); mt2 is fully
# out-of-vocabulary -> zero rows by contract
MLT_TEXT_QUERIES: list[tuple[str, str]] = [
    ("mt1", "merge sort joins a hash table scan with window groups"),
    ("mt2", "zzznope qqqnothing"),
]
MLT_TEXT_TERMS = 5

# SynonymQuery groups (qid, [[group members]]): 'quick' and 'tabel'
# are absent from the vocabulary — Lucene df-0 terms that must drop
# out of both the per-doc tf sum and the blended df max.
SYNONYM_QUERIES: list[tuple[str, list[list[str]]]] = [
    ("sy1", [["merge", "join"], ["fast", "quick"]]),
    ("sy2", [["window"], ["group", "agg"]]),
    ("sy3", [["hash"], ["table", "tabel"]]),
]
SIGTERMS_N = 5       # significant_terms: top-n per query
HIST_INTERVAL = 16   # facet_histogram: dl bucket width
RARE_MDC = 40         # rare_terms mdc: the synthetic vocab has no df<=2
#   tail at sf0.01 (every term repeats); 40 yields a real non-empty
#   bucket set for the driver hash (ES allows max_doc_count<=100)
SAMPLER_SHARD = 25    # sampler: top-N scored hits feeding the facet
SAMPLER_DEDUP_MOD = 7  # diversified_sampler: dedup key = doc_id % mod
SAMPLER_MAX_PER = 2    # diversified_sampler: max docs per dedup key
SIGTEXT_SHARD = 25     # significant_text: sampler size (re-analysis cap)
NEG_BOOST = 0.3        # boosting query: negative_boost demotion factor
BOOSTING_QUERIES: list[tuple[str, list[str], list[str]]] = [
    ("b1", ["merge", "sort"], ["hash"]),
    ("b2", ["spark", "query"], ["table", "scan"]),
    ("b3", ["window", "agg"], []),   # no negative clause — pure positive
]
TERMS_SET_QUERIES: list[tuple[str, list[str]]] = [
    ("t1", ["merge", "sort", "fast", "hash"]),
    ("t2", ["vector", "column", "row", "scan", "batch"]),
]
TERMS_SET_MOD = 3      # required_matches = 1 + n_chars % mod (per-doc msm)
MULTI_TERMS_N = 5      # multi_terms: top-n composite buckets per query
RF_PIVOT = 300.0       # rank_feature saturation pivot ~ median char len
RF_BOOST = 10.0        # rank_feature boost: sat spread ~0.5 x 10 = 5 pts,
                       # enough to genuinely reorder the BM25 ranking
MOV_WINDOW = 3         # moving_fn window (last 3 buckets, excl. current)
SERIAL_LAG = 2         # serial_diff lag (lag-1 is derivative's column)
BSC_MIN_N = 4          # bucket_selector gate: drops ~2/3 of sf0.01 buckets
BSC_SIZE = 50          # bucket_sort page (213-234 surviving buckets -> 50)
MOVP_WINDOW = 5        # moving_percentiles window (excl. current)
CS_BOOST = 1.2         # constant_score boost literal
SS_SCRIPT = "s + ln(1 + dl) / 10"   # script_score: the bound script
SS_MIN = 0.8           # script_score min_score gate (on ROUNDED value)
DF_ORIGIN = 400.0      # distance_feature origin over n_chars
DF_PIVOT = 100.0       # distance at which the feature term halves
DF_BOOST = 2.0
MARKER_RE = r"\b(customer|vector|stream)\b"  # 480/20 split at sf0.01
MBP_QUERIES = [("mb1", "merge sor"), ("mb2", "hash tab"), ("mb3", "val")]
SM_MAP = "dl * nc"     # scripted_metric map script (decimal-quantized)
SM_REDUCE = "state / n_docs"
TT_PAIRS = [("t1", ["merge", "sort"], ["hash", "join"]),
            ("t2", ["window"], ["stream"]),
            ("t3", ["spark"], ["zzznomatch"])]  # NULL-stats side
FILTERS_BUCKETS = [("merge_sort", ["merge", "sort"]),
                   ("hashy", ["hash"]),
                   ("nomatch", ["zzznomatch"])]  # empty bucket
PIN_DOCS = [("q1", [7, 3, 7, 99999]),  # dup + unknown id
            ("q3", [0])]
TM_SIZE = 2            # top_metrics page per bucket
AH_TARGET = 10         # auto_date_histogram bucket target
SPAN_WB_QUERIES = [("sw1", "fast", "merge", "sort", 3),
                   ("sw2", "table", "hash", "join", 4)]
SPAN_OR_QUERIES = [("so1", ["merge", "hash"], "table", 3),
                   ("so2", ["window", "group"], "agg", 2)]
SQS_QUERY = "merge + (sort | hash) -window tabl*"
SQS_FLAT_QUERY = "merge | sort | hash"  # flat pure-positive OR — the
# r5 quantized-kernel fast path (engine/queryparse.py use_wand)
VWH_BUCKETS = 4        # variable_width_histogram target buckets
VWH_ITERS = 2          # fixed Lloyd passes
RANGE_BUCKETS = [      # ES range agg: from-incl/to-excl, overlap allowed
    ("lo", None, 25.0), ("mid", 25.0, 150.0), ("hi", 150.0, None),
    ("all", None, None)]

# Generic BooleanQuery clauses (qid, must, should, must_not) and the
# remaining MultiTermQuery rewrites (RegexpQuery, TermRangeQuery)
BOOLEAN_QUERIES: list[tuple[str, list[str], list[str], list[str]]] = [
    ("b1", ["merge"], ["sort", "fast"], ["hash"]),
    ("b2", ["hash", "join"], [], ["window"]),
    ("b3", [], ["vector", "batch"], ["merge", "sort"]),
    ("b4", ["customer"], ["table"], []),
]
REGEXP_QUERIES: list[tuple[str, str]] = [
    ("rx1", "mer[a-z]*"), ("rx2", "[a-z]+[0-9]+"), ("rx3", "wind(ow)?s?"),
]

# trigram-accelerated regexp inputs: leading-metachar patterns (the
# full-scan killers) with required-literal runs, plus an alternation
# (rt4) whose run extraction is empty -> fallback full-scan path
REGEXP_TRIGRAM_QUERIES: list[tuple[str, str]] = [
    ("rt1", ".*erge.*"), ("rt2", "[a-z]*alue"), ("rt3", "wind.*w"),
    ("rt4", "merge|sort"),
]
RANGE_QUERIES: list[tuple[str, str, str]] = [
    ("rg1", "merge", "mergf"), ("rg2", "win", "wio"), ("rg3", "zz", "zzzz"),
]
SPANFIRST_QUERIES: list[tuple[str, str, int]] = [
    ("sp1", "merge", 6), ("sp2", "customer", 4), ("sp3", "window", 2),
]
TV_DOC_IDS = [0, 5, 17]
PARSED_QUERIES: list[tuple[str, str]] = [
    ("pq1", '+merge sort -hash'),
    ("pq2", 'mer* table'),
    ("pq3", '"merge sort" fast'),
]
BOOLEAN_MSM = 1  # minimumNumberShouldMatch for boolean_msm_topk

# Registered saved searches for percolation (reverse search): musts
# conjoin, must_nots exclude, 'absentterm' matches nothing (df-0 alert)
PERCOLATE_QUERIES: list[tuple[str, list[str], list[str]]] = [
    ("al1", ["merge", "sort"], ["hash"]),
    ("al2", ["hash", "join"], []),
    ("al3", ["window"], ["merge"]),
    ("al4", ["absentterm"], []),
]

# BPE trainer entry: merge rounds (min_count=1 so the fixed-round
# unrolled oracle and the engine always run the same number of rounds)
BPE_N_MERGES = 30

# Highlighter passage window (display tokens per snippet)
HL_WINDOW = 12

# ES-API-surface entry inputs: _termvectors doc page, adjacency_matrix
# named filters (names sorted; '&' is the ES key separator), and the
# query-time synonym table (one-way, ES search-time filter reading)
TV_DOC_IDS = [7, 123, 321]
ADJ_FILTERS: list[tuple[str, list[str]]] = [
    ("hashf", ["hash"]), ("joinf", ["join"]), ("sortf", ["sort", "merge"]),
]
SYNONYMS: dict[str, list[str]] = {
    "fast": ["quick", "speed"], "merge": ["join"], "query": ["scan"],
}
SYN_WEIGHT = 0.5

INDEX_VERSION = "v4"  # v4: doc_id pinned int64 in docs/tf parquet
                      # (v3: block-framed blobs + block_off)

# target per-lang mixture rates for the deterministic sampling op
MIX_RATES = {"en": 0.5, "de": 0.25, "zh": 0.0}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# Shared on-the-fly FTS stats over the documents table (full analyzer)
# ---------------------------------------------------------------------------

def _tf(spark, sf_dir) -> DataFrame:
    """(doc_id, term, tf) with the engine's code-aware analyzer."""
    docs = _docs(spark, sf_dir)
    return (docs.select("doc_id",
                        F.explode(tokens_col(F.col("text"))).alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf")))


def _dl(spark, sf_dir) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id",
                       F.size(tokens_col(F.col("text"))).cast("long").alias("dl"))


def _bm25_scored(spark, sf_dir, queries) -> DataFrame:
    """(qid, doc_id, score) summed weighted BM25 over matching docs."""
    tf = _tf(spark, sf_dir)
    dl = _dl(spark, sf_dir)
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(F.count(F.lit(1)).alias("n"),
                   F.avg("dl").alias("avgdl"))
    qt = spark.createDataFrame(
        [(q, t) for q, terms in queries for t in terms],
        "qid string, term string")
    rows = (tf.join(F.broadcast(qt), "term")
            .join(dfs, "term").join(dl, "doc_id")
            .crossJoin(F.broadcast(stats)))
    scored = rows.withColumn(
        "pscore", bm25_col(F.col("tf"), F.col("df"), F.col("dl"),
                           F.col("avgdl"), F.col("n")))
    return scored.groupBy("qid", "doc_id").agg(F.sum("pscore").alias("s"))


def _topk(scored: DataFrame, k: int = TOPK) -> DataFrame:
    # rank on the ROUNDED score: summed floats differ ~1e-15 between
    # engines, so exact-score ordering can flip near-ties cross-engine;
    # rounding first makes (score desc, doc_id asc) engine-stable
    r = round_half_up(F.col("s"), 4)
    w = Window.partitionBy("qid").orderBy(r.desc(), F.asc("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", r.alias("score"), "rank"))


# ---------------------------------------------------------------------------
# SQL oracle building blocks (DuckDB; views: documents, embeddings, ...)
# ---------------------------------------------------------------------------

def _sql_fts_ctes() -> str:
    """Tokenize/tf/dl/df/stats CTEs replicating the analyzer exactly."""
    clean = duckdb_clean_sql("text")
    stops = duckdb_stoplist_sql()
    return f"""
tok AS (
  SELECT doc_id, unnest(regexp_split_to_array({clean}, '[^a-z0-9]+')) AS term
  FROM documents),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
  WHERE term <> '' AND term NOT IN {stops}
  GROUP BY doc_id, term),
dl AS (
  SELECT d.doc_id, coalesce(sum(tf.tf), 0)::BIGINT AS dl
  FROM documents d LEFT JOIN tf ON d.doc_id = tf.doc_id
  GROUP BY d.doc_id),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl)::DOUBLE AS avgdl FROM dl)
""".strip()


def _sql_values(queries) -> str:
    vals = ", ".join(f"('{q}', '{t}')" for q, terms in queries for t in terms)
    return f"(VALUES {vals}) AS q(qid, term)"


def _sql_bm25_topk(queries, k: int = TOPK, doc_where: str = "") -> str:
    """``doc_where``: optional SQL predicate over the documents row
    aliased ``docf`` — the FILTER-clause oracle (filtered_topk)."""
    score = bm25_sql("tf.tf", "dfs.df", "dl.dl", "stats.avgdl", "stats.n")
    r4 = round_half_up_sql("s", 4)
    fjoin = (f"JOIN documents docf ON docf.doc_id = tf.doc_id "
             f"AND ({doc_where})" if doc_where else "")
    return f"""
WITH {_sql_fts_ctes()},
matched AS (
  SELECT q.qid, tf.doc_id, sum({score}) AS s
  FROM {_sql_values(queries)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  {fjoin}, stats
  GROUP BY q.qid, tf.doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM matched) t
WHERE rank <= {k}
"""


def _sql_positions_ctes() -> str:
    """Positional tokenizer CTEs (gap positions: stopwords consume a
    position, emit no term) — mirrors engine/positions.py exactly."""
    clean = duckdb_clean_sql("text")
    stops = duckdb_stoplist_sql()
    return f"""
fulltok AS (
  SELECT doc_id, list_filter(regexp_split_to_array({clean}, '[^a-z0-9]+'),
                             x -> x <> '') AS toks
  FROM documents),
ptok AS (
  SELECT doc_id, unnest(toks) AS term, unnest(range(len(toks))) AS pos
  FROM fulltok),
pt AS (SELECT * FROM ptok WHERE term NOT IN {stops})
""".strip()


def _sql_phrase(phrases) -> str:
    from engine.positions import analyze_phrase

    qv, nv = [], []
    for qid, ph in phrases:
        qt = analyze_phrase(ph)
        nv.append(f"('{qid}', {len(qt)})")
        for t, off in qt:
            qv.append(f"('{qid}', '{t}', {off})")
    return f"""
WITH {_sql_positions_ctes()},
q(qid, term, off) AS (VALUES {', '.join(qv)}),
n(qid, n_offs) AS (VALUES {', '.join(nv)}),
a AS (
  SELECT q.qid, p.doc_id, p.pos - q.off AS anchor, q.off
  FROM q JOIN pt p USING (term) WHERE p.pos - q.off >= 0),
g AS (SELECT qid, doc_id, anchor, count(DISTINCT off) AS c
      FROM a GROUP BY 1, 2, 3)
SELECT DISTINCT g.qid, g.doc_id FROM g JOIN n USING (qid)
WHERE g.c = n.n_offs
"""


def _sql_intervals(queries, max_gaps: int) -> str:
    """Ordered-intervals oracle: per query, assemble the per-doc sorted
    position list of each ordered term and run the same greedy
    next-position chain as engine/positions.py:interval_match as nested
    DuckDB list lambdas (list_filter(...)[1] = smallest position > p,
    NULL-propagating off the end)."""
    from engine.positions import analyze_phrase

    parts = []
    for qid, text in queries:
        qt = analyze_phrase(text)
        terms = [t for t, _ in sorted(qt, key=lambda x: x[1])]
        n = len(terms)
        if n == 0:
            continue
        dterms = sorted(set(terms))
        in_list = ", ".join(f"'{t}'" for t in dterms)
        lists = ",\n         ".join(
            f"list_sort(list(pos) FILTER (WHERE term = '{t}')) AS l{i + 1}"
            for i, t in enumerate(terms))
        if n == 1:
            cond = "len(l1) > 0"
        else:
            inner = "p1"
            for i in range(2, n + 1):
                inner = f"(list_filter(l{i}, x{i} -> x{i} > {inner})[1])"
            cond = (f"len(list_filter(l1, p1 -> coalesce(({inner} - p1) <= "
                    f"{n - 1 + max_gaps}, false))) > 0")
        parts.append(f"""
SELECT '{qid}' AS qid, doc_id FROM (
  SELECT doc_id, {lists}
  FROM pt WHERE term IN ({in_list})
  GROUP BY doc_id
  HAVING count(DISTINCT term) = {len(dterms)})
WHERE {cond}""")
    body = "\nUNION ALL".join(parts)
    return f"WITH {_sql_positions_ctes()}\n{body}"


def _sql_span_not(queries, window: int) -> str:
    """SpanNot oracle: per-doc include/exclude position lists from the
    positional CTEs, survival = exists p in include with no exclude
    position in [p-w, p+w] (nested DuckDB list lambdas, NULL exclude
    list coalesced empty)."""
    from engine.analysis import tokenize_texts

    parts = []
    for qid, inc, exc in queries:
        ti_l = tokenize_texts([inc])[0]
        if not ti_l:
            continue
        ti = ti_l[0]
        te_l = tokenize_texts([exc])[0]
        te = te_l[0] if te_l else None
        # list() over an empty FILTER group is NULL in DuckDB, not []
        # — coalesce, or every doc lacking the exclude term drops out
        exc_sel = (f"coalesce(list_sort(list(pos) FILTER (WHERE term = "
                   f"'{te}')), []::BIGINT[])" if te else "[]::BIGINT[]")
        parts.append(f"""
SELECT '{qid}' AS qid, doc_id FROM (
  SELECT doc_id,
         list_sort(list(pos) FILTER (WHERE term = '{ti}')) AS li,
         {exc_sel} AS le
  FROM pt WHERE term IN ('{ti}'{f", '{te}'" if te else ""})
  GROUP BY doc_id
  HAVING len(list_filter(li, x -> x IS NOT NULL)) > 0)
WHERE len(list_filter(li, p -> len(list_filter(le,
        q -> q >= p - {window} AND q <= p + {window})) = 0)) > 0""")
    if not parts:                     # every include term analyzed empty
        return ("SELECT NULL::VARCHAR AS qid, NULL::BIGINT AS doc_id "
                "WHERE FALSE")
    return (f"WITH {_sql_positions_ctes()}\n"
            + "\nUNION ALL".join(parts))


def _sql_phrase_prefix_parts(queries, max_expansions: int):
    """Shared decomposition + CTE text for the match_phrase_prefix
    oracles: exact (qid, term, off) rows, per-qid prefix seeds, and
    the capped in-term-order dictionary expansion CTEs."""
    from engine.positions import analyze_phrase

    qv, sv, nv = [], [], []
    for qid, ph in queries:
        toks = analyze_phrase(ph)
        if not toks:
            continue
        nv.append(f"('{qid}', {len(toks)})")
        for t, off in toks[:-1]:
            qv.append(f"('{qid}', '{t}', {off})")
        p, poff = toks[-1]
        sv.append(f"('{qid}', '{p}', {poff})")
    qe = (f"qe(qid, term, off) AS (VALUES {', '.join(qv)})" if qv else
          "qe(qid, term, off) AS (SELECT NULL::VARCHAR, NULL::VARCHAR,"
          " NULL::INT WHERE false)")
    ctes = f"""
{qe},
ps(qid, prefix, poff) AS (VALUES {', '.join(sv)}),
n(qid, n_offs) AS (VALUES {', '.join(nv)}),
vocab AS (SELECT DISTINCT term FROM pt),
exp AS (
  SELECT pp.prefix, v.term,
         row_number() OVER (PARTITION BY pp.prefix ORDER BY v.term)
           AS rn
  FROM (SELECT DISTINCT prefix FROM ps) pp
  JOIN vocab v ON v.term LIKE pp.prefix || '%'),
expq AS (
  SELECT ps.qid, e.term, ps.poff AS off
  FROM ps JOIN exp e ON e.prefix = ps.prefix
  WHERE e.rn <= {max_expansions}),
q AS (SELECT * FROM qe UNION ALL SELECT * FROM expq),
a AS (
  SELECT q.qid, p.doc_id, p.pos - q.off AS anchor, q.off
  FROM q JOIN pt p USING (term) WHERE p.pos - q.off >= 0),
g AS (SELECT qid, doc_id, anchor, count(DISTINCT off) AS c
      FROM a GROUP BY 1, 2, 3),
m AS (SELECT DISTINCT g.qid, g.doc_id FROM g JOIN n USING (qid)
      WHERE g.c = n.n_offs)
""".strip()
    return ctes


def _sql_phrase_prefix(queries, max_expansions: int = 50) -> str:
    return f"""
WITH {_sql_positions_ctes()},
{_sql_phrase_prefix_parts(queries, max_expansions)}
SELECT qid, doc_id FROM m ORDER BY qid, doc_id
"""


def _sql_phrase_prefix_topk(queries, k: int,
                            max_expansions: int = 50) -> str:
    """Prefix-phrase-gated BM25 top-k oracle: the match closure joined
    against the EXACT tokens' term-bag BM25 before the rank window
    (the prefix position gates, never scores — mirrors
    engine/positions.py:phrase_prefix_topk)."""
    from engine.positions import analyze_phrase

    wv = []
    for qid, ph in queries:
        toks = analyze_phrase(ph)
        weights: dict[str, float] = {}
        for t, _ in toks[:-1]:
            weights[t] = weights.get(t, 0.0) + 1.0
        for t, w in sorted(weights.items()):
            wv.append(f"('{qid}', '{t}', {w})")
    score = bm25_sql("tf.tf", "dfs.df", "dl.dl", "stats.avgdl", "stats.n")
    r4 = round_half_up_sql("s", 4)
    return f"""
WITH {_sql_fts_ctes()},
{_sql_positions_ctes()},
{_sql_phrase_prefix_parts(queries, max_expansions)},
qw(qid, term, weight) AS (VALUES {', '.join(wv)}),
sc AS (
  SELECT qw.qid, tf.doc_id, sum(qw.weight * {score}) AS s
  FROM qw JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY qw.qid, tf.doc_id),
j AS (SELECT sc.qid, sc.doc_id, sc.s
      FROM sc JOIN m ON m.qid = sc.qid AND m.doc_id = sc.doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM j) t
WHERE rank <= {k}
ORDER BY qid, rank
"""


def _sql_phrase_topk(phrases, k: int) -> str:
    """Phrase-gated BM25 top-k oracle: the phrase-match closure joined
    against the summed weighted BM25 scores before the rank window."""
    from engine.positions import analyze_phrase

    qv, nv, wv = [], [], []
    for qid, ph in phrases:
        qt = analyze_phrase(ph)
        nv.append(f"('{qid}', {len(qt)})")
        weights: dict[str, float] = {}
        for t, off in qt:
            qv.append(f"('{qid}', '{t}', {off})")
            weights[t] = weights.get(t, 0.0) + 1.0
        for t, w in sorted(weights.items()):
            wv.append(f"('{qid}', '{t}', {w})")
    score = bm25_sql("tf.tf", "dfs.df", "dl.dl", "stats.avgdl", "stats.n")
    r4 = round_half_up_sql("s", 4)
    return f"""
WITH {_sql_fts_ctes()},
{_sql_positions_ctes()},
q(qid, term, off) AS (VALUES {', '.join(qv)}),
n(qid, n_offs) AS (VALUES {', '.join(nv)}),
a AS (
  SELECT q.qid, p.doc_id, p.pos - q.off AS anchor, q.off
  FROM q JOIN pt p USING (term) WHERE p.pos - q.off >= 0),
g AS (SELECT qid, doc_id, anchor, count(DISTINCT off) AS c
      FROM a GROUP BY 1, 2, 3),
m AS (SELECT DISTINCT g.qid, g.doc_id FROM g JOIN n USING (qid)
      WHERE g.c = n.n_offs),
qw(qid, term, weight) AS (VALUES {', '.join(wv)}),
sc AS (
  SELECT qw.qid, tf.doc_id, sum(qw.weight * {score}) AS s
  FROM qw JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY qw.qid, tf.doc_id),
j AS (SELECT sc.qid, sc.doc_id, sc.s
      FROM sc JOIN m ON m.qid = sc.qid AND m.doc_id = sc.doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM j) t
WHERE rank <= {k}
"""


def _sql_proximity(queries, window: int) -> str:
    from engine.analysis import tokenize_texts

    qa, qo, nv, singles = [], [], [], []
    for qid, terms in queries:
        ts = [tokenize_texts([t])[0][0] for t in terms]
        qa.append(f"('{qid}', '{ts[0]}')")
        others = sorted(set(ts[1:]) - {ts[0]})
        if not others:
            singles.append(qid)
        nv.append(f"('{qid}', {len(others)})")
        for t in others:
            qo.append(f"('{qid}', '{t}')")
    single_sql = ""
    if singles:
        inlist = ", ".join(f"'{s}'" for s in singles)
        single_sql = (f"UNION SELECT DISTINCT qid, doc_id FROM anchors "
                      f"WHERE qid IN ({inlist})")
    return f"""
WITH {_sql_positions_ctes()},
qa(qid, term) AS (VALUES {', '.join(qa)}),
qo(qid, term) AS (VALUES {', '.join(qo)}),
n(qid, n_other) AS (VALUES {', '.join(nv)}),
anchors AS (SELECT qa.qid, p.doc_id, p.pos AS p FROM qa JOIN pt p USING (term)),
others AS (SELECT qo.qid, qo.term, p.doc_id, p.pos AS q
           FROM qo JOIN pt p USING (term)),
j AS (SELECT a.qid, a.doc_id, a.p, o.term FROM anchors a
      JOIN others o ON a.qid = o.qid AND a.doc_id = o.doc_id
      WHERE abs(o.q - a.p) <= {window}),
g AS (SELECT qid, doc_id, p, count(DISTINCT term) AS c FROM j GROUP BY 1, 2, 3)
SELECT DISTINCT g.qid, g.doc_id FROM g JOIN n USING (qid)
WHERE g.c = n.n_other
{single_sql}
"""


# ---------------------------------------------------------------------------
# Index-backed flagship path (build → persist → WAND)
# ---------------------------------------------------------------------------

def _documents_as_corpus(docs: DataFrame) -> DataFrame:
    """Adapter: documents → input_hint corpus schema. repo is constant
    and path zero-pads doc_id, so with n_doc_buckets=1 the engine's
    dense internal doc_id EQUALS the original doc_id (canonical order
    (bucket, repo, path) = ascending doc_id) — making the index path
    directly oracle-comparable."""
    return docs.select(
        F.lit("docs").alias("repo"),
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("path"),
        F.lit("-").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def _cached_resharded_index(spark: SparkSession, sf_dir: str):
    """A third cached index exercising RESHARD (the ES shrink/split
    analog): built at 8 term buckets, resharded to 5 — a pure
    partition-key rewrite, so every query result must equal SQL over
    the unchanged corpus (the same oracles as the 8-bucket index)."""
    from engine.index_build import build_index, load_stats, reshard_index
    from engine.search import Index

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    idx_dir = f"/tmp/sfts_{INDEX_VERSION}_rs_{tag}"
    corpus = _documents_as_corpus(_docs(spark, sf_dir))
    build_index(spark, corpus, idx_dir, n_buckets=8, n_doc_buckets=1)
    if load_stats(spark, idx_dir)["n_buckets"] != 5:
        reshard_index(spark, idx_dir, 5)
    return Index(spark, idx_dir)


def _cached_index(spark: SparkSession, sf_dir: str):
    from engine.index_build import build_index
    from engine.search import Index

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    idx_dir = f"/tmp/sfts_{INDEX_VERSION}_{tag}"
    corpus = _documents_as_corpus(_docs(spark, sf_dir))
    build_index(spark, corpus, idx_dir, n_buckets=8, n_doc_buckets=1)
    return Index(spark, idx_dir)


def _cached_deleted_index(spark: SparkSession, sf_dir: str):
    """A second cached index exercising the DELETE lifecycle: docs with
    doc_id % 11 == 5 are tombstoned (engine/deletes.py) and physically
    purged, so searches over it must equal SQL over the corpus WITHOUT
    those docs — stats (n_docs/avgdl/df) refreshed by the purge."""
    from engine.deletes import delete_docs, purge_deleted
    from engine.index_build import build_index
    from engine.search import Index

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    idx_dir = f"/tmp/sfts_{INDEX_VERSION}_del_{tag}"
    marker = f"{idx_dir}/_PURGED"
    corpus = _documents_as_corpus(_docs(spark, sf_dir))
    build_index(spark, corpus, idx_dir, n_buckets=8, n_doc_buckets=1)
    if not os.path.exists(marker):
        dead = _docs(spark, sf_dir).where(
            F.col("doc_id") % 11 == 5).select("doc_id")
        delete_docs(spark, idx_dir, dead)
        purge_deleted(spark, idx_dir)
        with open(marker, "w") as f:
            f.write("ok")
    return Index(spark, idx_dir)


def _cached_field_indexes(spark: SparkSession, sf_dir: str):
    """Per-field indexes over the documents table (title = first 5
    whitespace words, body = the rest) — the fielded-search surface.
    Same deterministic doc ids in both (assignment is by repo/path)."""
    from engine.index_build import build_index
    from engine.search import Index

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    docs = _docs(spark, sf_dir)
    ws = F.split(F.col("text"), "\\s+")
    fields = {
        "title": F.concat_ws(" ", F.slice(ws, 1, 5)),
        "body": F.concat_ws(" ", F.slice(
            ws, 6, F.greatest(F.size(ws) - 5, F.lit(0)))),
    }
    out = {}
    for fname, expr in fields.items():
        idx_dir = f"/tmp/sfts_{INDEX_VERSION}_f{fname}_{tag}"
        corpus = _documents_as_corpus(
            docs.select("doc_id", "lang", expr.alias("text")))
        build_index(spark, corpus, idx_dir, n_buckets=8, n_doc_buckets=1)
        out[fname] = Index(spark, idx_dir)
    return out


def _cached_combined_index(spark: SparkSession, sf_dir: str):
    """Index-time combined_fields pseudo-field over the title/body
    split (title×2 + body×1, the entry's weights): serves
    combined_fields queries on the standard WAND kernel
    (engine/fields.py:build_combined_field_index)."""
    from engine.fields import build_combined_field_index
    from engine.search import Index

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    idx_dir = f"/tmp/sfts_{INDEX_VERSION}_fcomb_{tag}"
    docs = _docs(spark, sf_dir)
    ws = F.split(F.col("text"), "\\s+")
    fields = {
        "title": F.concat_ws(" ", F.slice(ws, 1, 5)),
        "body": F.concat_ws(" ", F.slice(
            ws, 6, F.greatest(F.size(ws) - 5, F.lit(0)))),
    }
    corpora = {
        fname: _documents_as_corpus(
            docs.select("doc_id", "lang", expr.alias("text")))
        for fname, expr in fields.items()}
    from engine.index_build import _exists
    if not _exists(spark, f"{idx_dir}/stats"):
        build_combined_field_index(spark, corpora,
                                   {"title": 2.0, "body": 1.0}, idx_dir,
                                   n_buckets=8, n_doc_buckets=1)
    return Index(spark, idx_dir)


def _cached_shard_indexes(spark: SparkSession, sf_dir: str):
    """Two shard indexes over the documents table split at n/2 —
    the federation (MultiReader) driver surface. The split follows the
    canonical docno order, so shard-local ids + docBase equal the
    monolithic ids and the oracle is the plain global-BM25 SQL."""
    from engine.index_build import build_index
    from engine.search import Index

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    docs = _docs(spark, sf_dir)
    cut = docs.count() // 2
    out = []
    for i, pred in enumerate((F.col("doc_id") < cut,
                              F.col("doc_id") >= cut)):
        idx_dir = f"/tmp/sfts_{INDEX_VERSION}_shard{i}_{tag}"
        corpus = _documents_as_corpus(docs.where(pred))
        build_index(spark, corpus, idx_dir, n_buckets=8, n_doc_buckets=1)
        out.append(Index(spark, idx_dir))
    return out


def _wand_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from engine.search import score_wand

    idx = _cached_index(spark, sf_dir)
    qt = [(q, t, 1.0) for q, terms in BM25_QUERIES for t in terms]
    # overfetch then re-rank on the rounded score (see _topk note)
    res = score_wand(idx, qt, TOPK + 50)
    r = round_half_up(F.col("score"), 4)
    w = Window.partitionBy("qid").orderBy(r.desc(), F.asc("doc_id"))
    return (res.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= TOPK)
            .select("qid", "doc_id", r.alias("score"), "rank"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full index build + block-max WAND BM25 over sf0.001."""
    return _wand_topk_query(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# queries() / oracle_sql()
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from engine import fusion
    from engine.pipeline import dedup, similarity, textstats

    def tokenize_tf(spark, sf_dir):
        return _tf(spark, sf_dir).orderBy("doc_id", "term")

    def doc_lengths(spark, sf_dir):
        return _dl(spark, sf_dir).orderBy("doc_id")

    def term_stats(spark, sf_dir):
        tf = _tf(spark, sf_dir)
        return (tf.groupBy("term")
                .agg(F.count(F.lit(1)).alias("df"),
                     F.sum("tf").alias("cf"))
                .orderBy("term"))

    def bm25_topk(spark, sf_dir):
        return _topk(_bm25_scored(spark, sf_dir, BM25_QUERIES))

    def bm25_scores_all(spark, sf_dir):
        return (_bm25_scored(spark, sf_dir, BM25_QUERIES)
                .select("qid", "doc_id", round_half_up(F.col("s"), 4).alias("score"))
                .orderBy("qid", "doc_id"))

    def boolean_and(spark, sf_dir):
        tf = _tf(spark, sf_dir)
        qt = spark.createDataFrame(
            [(q, t) for q, terms in AND_QUERIES for t in terms],
            "qid string, term string")
        nterms = spark.createDataFrame(
            [(q, len(set(ts))) for q, ts in AND_QUERIES],
            "qid string, n_terms int")
        return (tf.join(F.broadcast(qt), "term")
                .groupBy("qid", "doc_id")
                .agg(F.count_distinct("term").alias("nmatch"))
                .join(F.broadcast(nterms), "qid")
                .where(F.col("nmatch") == F.col("n_terms"))
                .select("qid", "doc_id")
                .orderBy("qid", "doc_id"))

    def index_wand_topk(spark, sf_dir):
        return _wand_topk_query(spark, sf_dir)

    def resharded_search(spark, sf_dir):
        """WAND top-k over a RESHARDED index (8 -> 5 term buckets via
        engine/index_build.py:reshard_index — the ES shrink/split
        analog): bucketing is physical only, so the oracle is the
        plain BM25 SQL, identical to index_wand_topk's."""
        from engine.search import score_wand

        idx = _cached_resharded_index(spark, sf_dir)
        qt = [(q, t, 1.0) for q, terms in BM25_QUERIES for t in terms]
        res = score_wand(idx, qt, TOPK + 50)
        return _rounded_rerank(res, TOPK)

    def event_window_pipeline(spark, sf_dir):
        """ES pipeline aggregations (cumulative_sum + derivative
        sibling aggs) over the hourly date_histogram per event_type;
        derivative vs the previous OCCUPIED bucket, NULL at series
        heads (engine/streaming.py:windowed_counts_pipeline)."""
        from engine.streaming import windowed_counts_pipeline

        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = windowed_counts_pipeline(events, window="1 hour")
        return (out.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"), "event_type", "n", "cum_n",
            "deriv_n")
            .orderBy("event_type", "window_start"))

    def dedup_exact(spark, sf_dir):
        return (dedup.exact_dup_groups(_docs(spark, sf_dir))
                .orderBy("content_hash"))

    def minhash_near_dups(spark, sf_dir):
        # persist="transient": persisted-path speed (the sig cache
        # feeds 6 consumers), but the big cache is unpersisted before
        # return — only the pair-sized localCheckpoint outlives the
        # call, so nothing leaks across the gate's query sequence
        # (unpersist discipline, VERDICT r2 #9; 30 s → 3 s-class at
        # sf0.1 vs the previous persist=False recompute)
        out = dedup.minhash_near_dups(_docs(spark, sf_dir), threshold=0.3,
                                      persist="transient")
        return (out.select("doc_a", "doc_b",
                           round_half_up(F.col("jaccard"), 6).alias("jaccard"))
                .orderBy("doc_a", "doc_b"))

    def simhash(spark, sf_dir):
        return dedup.simhash(_docs(spark, sf_dir)).orderBy("doc_id")

    def ngram_jaccard(spark, sf_dir):
        out = dedup.ngram_jaccard_consecutive(_docs(spark, sf_dir))
        return (out.select("doc_a", "doc_b",
                           round_half_up(F.col("jaccard"), 6).alias("jaccard"))
                .orderBy("doc_a"))

    def cosine_topk(spark, sf_dir):
        out = similarity.cosine_topk(_emb(spark, sf_dir), ANN_QUERY_IDS,
                                     TOPK + 20)
        rc = round_half_up(F.col("cosine"), 4)
        w = Window.partitionBy("qid").orderBy(rc.desc(), F.asc("vec_id"))
        return (out.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= TOPK)
                .select("qid", "vec_id", rc.alias("cosine"), "rank"))

    def ann_buckets(spark, sf_dir):
        # explicit dims pin the oracle; production default (dims=None)
        # derives the bit count from n — tested in test_pipeline
        return (similarity.signbit_bucket(
            _emb(spark, sf_dir), dims=[0, 8, 16, 24, 32, 40, 48, 56])
            .orderBy("vec_id"))

    def ann_ivf_topk(spark, sf_dir):
        # IVF scale path: k-means cells + n_probe rerank. The k-means
        # is deterministic (stride init, 2 Lloyd iterations, centroids
        # rounded to 9 dp after each mean) so a full DuckDB oracle
        # replicates it exactly; recall vs exact cosine_topk is
        # additionally asserted in pytest. Overfetch, then re-rank on
        # the rounded cosine (house rounded-rank-window rule).
        out = similarity.cosine_topk_ivf(_emb(spark, sf_dir),
                                         ANN_QUERY_IDS, TOPK + 20,
                                         n_centroids=16, n_probe=4)
        rc = round_half_up(F.col("cosine"), 4)
        w = Window.partitionBy("qid").orderBy(rc.desc(), F.asc("vec_id"))
        return (out.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= TOPK)
                .select("qid", "vec_id", rc.alias("cosine"), "rank"))

    def ann_pq_topk(spark, sf_dir):
        """Product-quantization ANN (ADC over 16×16 codebooks) with
        exact rerank of the 60-candidate shortlist."""
        return (similarity.pq_topk(_emb(spark, sf_dir), ANN_QUERY_IDS,
                                   TOPK, m=16, n_centroids=16, rerank=60)
                .orderBy("qid", "rank"))

    def ann_ivfpq_topk(spark, sf_dir):
        """IVF-PQ composed ANN (Jégou IVFADC): 16 coarse cells probe 4,
        residual-encoded 16×16 PQ codebooks, per-cell ADC, exact rerank
        of the 60-candidate shortlist. Fully deterministic (stride init
        + 9dp Lloyd means + 6dp distance ranks) → full DuckDB replica
        oracle."""
        return (similarity.ivfpq_topk(_emb(spark, sf_dir), ANN_QUERY_IDS,
                                      TOPK, n_ivf=16, n_probe=4, m=16,
                                      n_centroids=16, rerank=60)
                .orderBy("qid", "rank"))

    def ann_rocchio_topk(spark, sf_dir):
        """Rocchio pseudo-relevance feedback in embedding space (the
        vector sibling of RM3): 4dp-rounded cosine pilot top-5 →
        9dp-rounded feedback centroid → q' = q + 0.75·centroid →
        exact rounded-cosine rerank. Fully deterministic replica
        oracle."""
        return (similarity.rocchio_topk(_emb(spark, sf_dir),
                                        ANN_QUERY_IDS, TOPK, fb_k=5)
                .orderBy("qid", "rank"))

    def ann_multiprobe_topk(spark, sf_dir):
        """Multi-probe LSH ANN (own bucket + all Hamming-1 flips),
        exact rerank; deterministic → full oracle. Overfetch + rounded
        re-rank per the house rule."""
        out = similarity.cosine_topk_multiprobe(
            _emb(spark, sf_dir), ANN_QUERY_IDS, TOPK + 20,
            dims=[0, 8, 16, 24, 32, 40, 48, 56])
        rc = round_half_up(F.col("cosine"), 4)
        w = Window.partitionBy("qid").orderBy(rc.desc(), F.asc("vec_id"))
        return (out.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= TOPK)
                .select("qid", "vec_id", rc.alias("cosine"), "rank"))

    def token_counts(spark, sf_dir):
        return textstats.token_counts(_docs(spark, sf_dir)).orderBy("doc_id")

    def quality_scores(spark, sf_dir):
        return textstats.quality_scores(_docs(spark, sf_dir)).orderBy("doc_id")

    def lang_id(spark, sf_dir):
        return textstats.lang_id(_docs(spark, sf_dir)).orderBy("doc_id")

    def fingerprints(spark, sf_dir):
        return textstats.fingerprints(_docs(spark, sf_dir)).orderBy("doc_id")

    def multimodal_features(spark, sf_dir):
        from engine.pipeline import multimodal

        media = multimodal.media_from_docs(_docs(spark, sf_dir))
        out = multimodal.extract_features(media)
        return out.select("media_id", "modality", "n_bytes", "sha",
                          "width", "height").orderBy("media_id")

    def media_resize_plan(spark, sf_dir):
        """Aspect-preserving resize geometry over the decode stage's
        dimensions (images/videos; never upscales)."""
        from engine.pipeline import multimodal

        feats = multimodal.extract_features(
            multimodal.media_from_docs(_docs(spark, sf_dir)))
        return multimodal.resize_plan(feats, max_side=128) \
            .orderBy("media_id")

    def media_frames(spark, sf_dir):
        """Frame-sampling fan-out: one row per 10s timestamp of every
        item with a duration (executor-side explode, no driver loop)."""
        from engine.pipeline import multimodal

        feats = multimodal.extract_features(
            multimodal.media_from_docs(_docs(spark, sf_dir)))
        return multimodal.sample_frames(feats, every_ms=10_000)

    def expansion_weights(spark, sf_dir):
        """Entity-RM3 expansion mining (SURVEY.md Q9-Q10) over the
        pilot top-20 of each BM25 query."""
        from engine.expand import ENTITY_BOOST, mine_terms_udf

        # the reference's df <= 0.15*N band prunes EVERY term in this
        # tiny-vocab testdata (all df ~ 0.8*N); use a relaxed band here
        # so the oracle exercises the weighting math (engine default
        # stays at the reference's 0.15 — see engine/expand.py)
        df_max_frac = 0.95

        scored = _bm25_scored(spark, sf_dir, BM25_QUERIES)
        # pilot rank on the ROUNDED score (repo rounded-rank-window rule:
        # exact summed floats differ ~1e-15 cross-engine and can flip the
        # rank-20 cutoff, changing the whole downstream expansion set)
        w20 = Window.partitionBy("qid").orderBy(
            round_half_up(F.col("s"), 4).desc(), F.asc("doc_id"))
        pilot = (scored.withColumn("rk", F.row_number().over(w20))
                 .where(F.col("rk") <= 20)
                 .select("qid", "doc_id", F.col("s").alias("hit_score")))
        docs = _docs(spark, sf_dir).select(
            "doc_id", F.col("text").alias("content"))
        mined = (pilot.join(docs, "doc_id")
                 .withColumn("tm", F.explode(mine_terms_udf()("content")))
                 .select("qid", "doc_id", "hit_score",
                         F.col("tm.term").alias("term"),
                         F.col("tm.entity").alias("entity")))
        orig = spark.createDataFrame(
            [(q, t) for q, ts in BM25_QUERIES for t in ts],
            "qid string, term string")
        mined = mined.join(orig, ["qid", "term"], "left_anti")
        tf = _tf(spark, sf_dir)
        dfs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        nstats = _dl(spark, sf_dir).agg(F.count(F.lit(1)).alias("n"))
        filt = (mined.join(dfs, "term")
                .crossJoin(F.broadcast(nstats))
                .where((F.col("df") >= 2)
                       & (F.col("df") <= F.col("n") * df_max_frac)))
        wgt = filt.withColumn(
            "w",
            (F.log(F.col("n").cast("double") / (F.col("df") + 1)) + 1.0)
            * F.col("hit_score")
            * F.when(F.col("entity"), F.lit(ENTITY_BOOST)).otherwise(1.0))
        agg = wgt.groupBy("qid", "term").agg(F.sum("w").alias("w"))
        rw = round_half_up(F.col("w"), 4)
        w40 = Window.partitionBy("qid").orderBy(rw.desc(), F.asc("term"))
        return (agg.withColumn("rk", F.row_number().over(w40))
                .where(F.col("rk") <= 40)
                .select("qid", "term", rw.alias("weight"), "rk")
                .orderBy("qid", "rk"))

    def eval_metrics(spark, sf_dir):
        """MAP/P@5/P@20/nDCG@20 per topic (SURVEY.md E1-E4; the
        reference leaderboard's metric set) on a derived
        run (BM25 top-20) + derived qrels (docs matching ALL query
        terms)."""
        from engine.evaluate import evaluate_run

        scored = _bm25_scored(spark, sf_dir, BM25_QUERIES)
        w = Window.partitionBy("qid").orderBy(
            round_half_up(F.col("s"), 4).desc(), F.asc("doc_id"))
        run = (scored.withColumn("rank", F.row_number().over(w))
               .where(F.col("rank") <= 20)
               .select("qid", F.col("doc_id").cast("string").alias("docno"),
                       "rank"))
        tf = _tf(spark, sf_dir)
        qt = spark.createDataFrame(
            [(q, t) for q, ts in BM25_QUERIES for t in set(ts)],
            "qid string, term string")
        nt = spark.createDataFrame(
            [(q, len(set(ts))) for q, ts in BM25_QUERIES],
            "qid string, n_terms int")
        qrels = (tf.join(F.broadcast(qt), "term")
                 .groupBy("qid", "doc_id")
                 .agg(F.count_distinct("term").alias("nm"))
                 .join(F.broadcast(nt), "qid")
                 .where(F.col("nm") == F.col("n_terms"))
                 .select("qid", F.col("doc_id").cast("string").alias("docno"),
                         F.lit(1).alias("rel")))
        per = evaluate_run(run, qrels, k=20, p_at_ks=(5,))
        return per.select(
            "qid", round_half_up(F.col("ap"), 6).alias("ap"),
            round_half_up(F.col("p_at_5"), 6).alias("p_at_5"),
            round_half_up(F.col("p_at_k"), 6).alias("p_at_20"),
            round_half_up(F.col("ndcg_at_k"), 6).alias("ndcg_at_20"),
        ).orderBy("qid")

    def embedding_near_dups(spark, sf_dir):
        """Embedding-cosine near-dup pairs (bucketed candidates + exact
        verify). Threshold 0.4 (on the 4-dp-rounded cosine, both
        engines): this testdata's max pairwise cosine is ~0.51, so a
        realistic 0.95 would be vacuous here; 4 bucket dims keep the
        candidate set non-empty on quasi-random data."""
        out = similarity.embedding_near_dups(_emb(spark, sf_dir),
                                             threshold=0.4,
                                             dims=[0, 8, 16, 24])
        return (out.select("vec_a", "vec_b",
                           round_half_up(F.col("cosine"), 4).alias("cosine"))
                .orderBy("vec_a", "vec_b"))

    def semdedup_pairs(spark, sf_dir):
        """SemDeDup semantic-duplicate pairs (Abbas et al. 2023):
        deterministic 16-cell k-means scopes the pairwise cosine to
        within-cell joins (engine/pipeline/similarity.py:
        semantic_near_dups). Threshold 0.35 on the 4-dp-rounded
        cosine — this testdata's pairwise cosines top out ~0.45, so
        the paper's 0.95+ would be vacuous here."""
        out = similarity.semantic_near_dups(_emb(spark, sf_dir),
                                            threshold=0.35,
                                            n_centroids=16)
        return (out.select("vec_a", "vec_b",
                           round_half_up(F.col("cosine"), 4).alias("cosine"))
                .orderBy("vec_a", "vec_b"))

    def semdedup_keep(spark, sf_dir):
        """SemDeDup keep filter: drop every vector with a lower-id
        semantic duplicate in its k-means cell; returns survivors."""
        kept = similarity.semdedup_keep(_emb(spark, sf_dir),
                                        threshold=0.35, n_centroids=16)
        return kept.select("vec_id").orderBy("vec_id")

    def dedup_keep(spark, sf_dir):
        """Near-dup filtering: keep-lowest-id policy over the MinHash
        pairs; returns the surviving doc ids."""
        kept = dedup.drop_near_dups(_docs(spark, sf_dir), threshold=0.3,
                                    persist="transient")
        return kept.select("doc_id").orderBy("doc_id")

    def tfidf_top_terms(spark, sf_dir):
        """Per-doc top-3 TF-IDF terms (featurization op): smooth idf
        ln(1 + n/df), ties by term asc."""
        tf = _tf(spark, sf_dir)
        dfs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        n = _docs(spark, sf_dir).count()
        scored = (tf.join(dfs, "term")
                  .withColumn("tfidf",
                              F.col("tf") * F.log(1.0 + F.lit(float(n))
                                                  / F.col("df"))))
        rt = round_half_up(F.col("tfidf"), 6)
        w = Window.partitionBy("doc_id").orderBy(rt.desc(), F.asc("term"))
        return (scored.withColumn("rk", F.row_number().over(w))
                .where(F.col("rk") <= 3)
                .select("doc_id", "term", rt.alias("tfidf"), "rk")
                .orderBy("doc_id", "rk"))

    def event_window_counts(spark, sf_dir):
        """Hourly event-type rollup (the batch form of the streaming
        windowed aggregation — engine/streaming.py)."""
        from engine.streaming import windowed_event_counts

        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = windowed_event_counts(events, window="1 hour")
        return (out.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            "event_type", "n",
            round_half_up(F.col("total_value"), 4).alias("total_value"))
            .orderBy("window_start", "event_type"))

    def event_window_cardinality(spark, sf_dir):
        """Windowed distinct-count sketch (unique users per hour):
        HLL registers keyed by the tumbling window — the streaming-
        safe distinct plan (engine/streaming.py; register max is the
        one stateful agg, estimate is a batch post-pass)."""
        from engine.streaming import windowed_cardinality

        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = windowed_cardinality(events, window="1 hour")
        return (out.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"), "v_zero", "est")
            .orderBy("window_start"))

    def event_window_heavy(spark, sf_dir):
        """Windowed heavy hitters (dominant users per hour): CMS
        registers keyed by the tumbling window — register ADD is the
        one stateful agg (streaming-safe, 4x1024 state per window);
        extraction flags est >= ceil(phi*window_n), one-sided: no true
        heavy hitter missed (engine/streaming.py:
        windowed_heavy_hitters)."""
        from engine.streaming import windowed_heavy_hitters

        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = windowed_heavy_hitters(events, window="1 hour", phi=0.08)
        return (out.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"), "value", "est", "window_n", "hh")
            .orderBy("window_start", "value"))

    def event_sessions(spark, sf_dir):
        """Gap-based sessionization (batch form of the custom stateful
        streaming operator engine/streaming.py:sessionize_stream)."""
        from engine.streaming import sessionize

        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = sessionize(events, gap="30 minutes")
        return (out.select(
            "user_id",
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("session_start"),
            F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("session_end"),
            "n_events",
            round_half_up(F.col("total_value"), 4).alias("total_value"))
            .orderBy("user_id", "session_start"))

    def unigram_logprob(spark, sf_dir):
        """Perplexity-style filter signal: per-doc mean log-prob under
        the corpus's add-one unigram LM."""
        return (textstats.unigram_logprob(_docs(spark, sf_dir))
                .orderBy("doc_id"))

    def source_mix(spark, sf_dir):
        """Data-mixture report per (source, lang)."""
        return (textstats.source_mix(_docs(spark, sf_dir))
                .orderBy("source", "lang"))

    def dedup_components(spark, sf_dir):
        """Near-dup clusters: connected components (hash-min label
        propagation) over the MinHash-LSH pair graph."""
        pairs = dedup.minhash_near_dups(_docs(spark, sf_dir), threshold=0.3)
        out = dedup.connected_components(pairs)
        pairs._minhash_sigs.unpersist()
        return out.orderBy("doc_id")

    def pmi_bigrams(spark, sf_dir):
        """Collocation mining: top-20 adjacent bigrams by PMI."""
        return (textstats.pmi_bigrams(_docs(spark, sf_dir),
                                      min_count=5, k=20)
                .orderBy("rank"))

    def phrase_topk(spark, sf_dir):
        """Phrase-gated BM25 ranking (PhraseQuery analog): docs
        containing the exact phrase, ranked by the phrase terms' BM25."""
        from engine.positions import build_positions
        from engine.positions import phrase_topk as _pt

        idx = _cached_index(spark, sf_dir)
        build_positions(spark, idx.index_dir)
        return _pt(idx, PHRASE_QUERIES, TOPK)

    def snippets(spark, sf_dir):
        """KWIC snippets (Lucene highlighter analog): ±5 analyzed
        tokens around the first query-term occurrence in each BM25
        top-10 hit."""
        from engine.positions import build_positions
        from engine.positions import snippets as _sn

        idx = _cached_index(spark, sf_dir)
        build_positions(spark, idx.index_dir)
        hits = _topk(_bm25_scored(spark, sf_dir, BM25_QUERIES))
        qv = [(q, t) for q, ts in BM25_QUERIES for t in ts]
        return _sn(idx, hits, qv, width=5)

    def filtered_topk(spark, sf_dir):
        """BM25 top-k restricted to lang='en' docs via the index's
        doc_filter (Lucene FILTER clause): exact top-k WITHIN the
        filtered set, not a post-filter of the global top-k."""
        from engine.search import score_exhaustive

        idx = _cached_index(spark, sf_dir)
        allowed = idx.docs.where(F.col("lang") == "en")
        qt = [(q, t, 1.0) for q, terms in BM25_QUERIES for t in terms]
        res = score_exhaustive(idx, qt, TOPK + 50, doc_filter=allowed)
        r = round_half_up(F.col("score"), 4)
        w = Window.partitionBy("qid").orderBy(r.desc(), F.asc("doc_id"))
        return (res.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= TOPK)
                .select("qid", "doc_id", r.alias("score"), "rank"))

    def _rounded_rerank(res, k):
        r = round_half_up(F.col("score"), 4)
        w = Window.partitionBy("qid").orderBy(r.desc(), F.asc("doc_id"))
        return (res.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select("qid", "doc_id", r.alias("score"), "rank"))

    def deleted_search(spark, sf_dir):
        """Delete + purge lifecycle (IndexWriter.deleteDocuments →
        forceMergeDeletes): BM25 top-k over the purged index equals
        SQL over the corpus without the deleted docs."""
        from engine.search import score_exhaustive

        idx = _cached_deleted_index(spark, sf_dir)
        qt = [(q, t, 1.0) for q, terms in BM25_QUERIES for t in terms]
        return _rounded_rerank(score_exhaustive(idx, qt, TOPK + 50), TOPK)

    def search_after_page2(spark, sf_dir):
        """Deep pagination (IndexSearcher.searchAfter): page 2 via the
        cursor taken from page 1's last row — must equal rows 11..20
        of the single-shot rounded ranking."""
        from engine.search import search_after

        idx = _cached_index(spark, sf_dir)
        qt = [(q, t, 1.0) for q, terms in BM25_QUERIES for t in terms]
        p1 = search_after(idx, qt, TOPK, after={}).collect()
        # cursor = each qid's LAST page-1 row regardless of rank
        # (ADVICE r2: a query with < TOPK total hits must get an
        # exhausted cursor — page 2 is then empty, like Lucene's
        # searchAfter — not re-page from the top). p1 is ordered by
        # (qid, rank) so the last row per qid wins.
        cur = {}
        for r in p1:
            cur[r["qid"]] = (r["score"], r["doc_id"])
        return search_after(idx, qt, TOPK, after=cur)

    def count_matches(spark, sf_dir):
        """IndexSearcher.count analog: distinct matching docs per
        query, no scoring (TotalHitCountCollector)."""
        from engine.search import count_matches as _cm

        idx = _cached_index(spark, sf_dir)
        return _cm(idx, BM25_QUERIES)

    def collection_stats(spark, sf_dir):
        """Lucene CollectionStatistics: maxDoc / sumTotalTermFreq /
        avgdl / vocabulary size / total postings from the index's own
        stats tables."""
        from engine.search import collection_stats as _cs

        return _cs(_cached_index(spark, sf_dir))

    def field_sorted_topk(spark, sf_dir):
        """Lucene Sort(SortField) analog: match set ranked by the
        stored n_chars field (descending), not by score."""
        from engine.search import field_sorted_topk as _fs

        idx = _cached_index(spark, sf_dir)
        field = _docs(spark, sf_dir).select(
            "doc_id", F.col("n_chars").alias("sort_key"))
        return _fs(idx, BM25_QUERIES, field, TOPK)

    def boolean_query_topk(spark, sf_dir):
        """Generic Lucene BooleanQuery (MUST/SHOULD/MUST_NOT) with BM25
        scoring over must+should occurrences; gate and score share one
        postings decode (engine/search.py:boolean_topk)."""
        from engine.search import boolean_topk as _bt

        idx = _cached_index(spark, sf_dir)
        return _rounded_rerank(_bt(idx, BOOLEAN_QUERIES, TOPK + 50), TOPK)

    def fielded_search(spark, sf_dir):
        """Per-field boosted BM25 (the reference's BooleanQuery-of-
        BoostQuery shape, Searcher.java:37-43, with REAL per-field
        statistics): title^3 + body^1 over field-split indexes."""
        from engine.fields import fielded_topk as _ft

        idxs = _cached_field_indexes(spark, sf_dir)
        fq = [(q, f, t, w) for q, terms in BM25_QUERIES for t in terms
              for f, w in (("title", 3.0), ("body", 1.0))]
        return _rounded_rerank(_ft(idxs, fq, TOPK + 50), TOPK)

    def federated_search(spark, sf_dir):
        """Multi-shard federation (Lucene MultiReader): two shard
        indexes searched under global stats + docBase offsets —
        results equal the monolithic index / plain global-BM25 SQL."""
        from engine.federate import federated_topk as _ft

        idxs = _cached_shard_indexes(spark, sf_dir)
        qt = [(q, t, 1.0) for q, terms in BM25_QUERIES for t in terms]
        res = _ft(idxs, qt, TOPK + 50)
        r = round_half_up(F.col("score"), 4)
        w = Window.partitionBy("qid").orderBy(r.desc(), F.asc("doc_id"))
        return (res.withColumn("rk", F.row_number().over(w))
                .where(F.col("rk") <= TOPK)
                .select("qid", "shard", "doc_id", r.alias("score"),
                        F.col("rk").alias("rank"))
                .orderBy("qid", "rank"))

    def fielded_search_wand(spark, sf_dir):
        """Fielded retrieval through the generalized sharded kernel
        (fielded_topk_wand: per-field stats ride in the per-list
        params, one kernel prunes across all fields' lists); same
        DuckDB oracle as the exhaustive fielded_search."""
        from engine.fields import fielded_topk_wand as _ftw

        idxs = _cached_field_indexes(spark, sf_dir)
        fq = [(q, f, t, w) for q, terms in BM25_QUERIES for t in terms
              for f, w in (("title", 3.0), ("body", 1.0))]
        return _rounded_rerank(_ftw(idxs, fq, TOPK + 50), TOPK)

    def parsed_query_topk(spark, sf_dir):
        """Lucene-syntax query strings (SURVEY T9 closed): +must /
        -must_not / "phrase" / prefix* / bare-should clauses parsed
        and compiled onto the engine's boolean/phrase/dictionary
        operators (engine/queryparse.py)."""
        from functools import reduce

        from engine.positions import build_positions
        from engine.queryparse import search_parsed

        idx = _cached_index(spark, sf_dir)
        build_positions(spark, idx.index_dir)
        parts = [search_parsed(idx, qid, s, TOPK + 50)
                 for qid, s in PARSED_QUERIES]
        return _rounded_rerank(
            reduce(lambda a, b: a.unionByName(b), parts), TOPK)

    def boolean_msm_topk(spark, sf_dir):
        """BooleanQuery with minimumNumberShouldMatch=1: docs must
        additionally match ≥1 should term; the clause set with no
        should terms (b2) becomes unsatisfiable, per Lucene."""
        from engine.search import boolean_topk as _bt

        idx = _cached_index(spark, sf_dir)
        return _rounded_rerank(
            _bt(idx, BOOLEAN_QUERIES, TOPK + 50, min_should=BOOLEAN_MSM),
            TOPK)

    def term_vectors(spark, sf_dir):
        """Lucene TermVectors: per-doc (term, tf, dl) from the forward
        tf table (doc_id filter pushed to the parquet scan)."""
        from engine.search import term_vectors as _tv

        idx = _cached_index(spark, sf_dir)
        return _tv(idx, TV_DOC_IDS)

    def regexp_topk(spark, sf_dir):
        """Lucene RegexpQuery rewrite: full-match dictionary scan →
        bucket-pruned BM25 scoring (RE2-safe patterns only)."""
        from engine.search import regexp_topk as _rt

        idx = _cached_index(spark, sf_dir)
        return _rounded_rerank(_rt(idx, REGEXP_QUERIES, TOPK + 50), TOPK)

    def term_range_topk(spark, sf_dir):
        """Lucene TermRangeQuery rewrite: [lo, hi) dictionary scan →
        BM25 scoring (rg3 matches nothing — empty-result path)."""
        from engine.search import term_range_topk as _tr

        idx = _cached_index(spark, sf_dir)
        return _rounded_rerank(_tr(idx, RANGE_QUERIES, TOPK + 50), TOPK)

    def prefix_topk(spark, sf_dir):
        """Lucene PrefixQuery rewrite: BM25 over all vocabulary terms
        with the prefix."""
        from engine.search import prefix_topk as _pt

        idx = _cached_index(spark, sf_dir)
        return _rounded_rerank(_pt(idx, PREFIX_QUERIES, TOPK + 50), TOPK)

    def fuzzy_topk(spark, sf_dir):
        """Lucene FuzzyQuery rewrite: BM25 over vocabulary terms within
        1 Levenshtein edit."""
        from engine.search import fuzzy_topk as _ft

        idx = _cached_index(spark, sf_dir)
        return _rounded_rerank(_ft(idx, FUZZY_QUERIES, TOPK + 50), TOPK)

    def score_explain(spark, sf_dir):
        """IndexSearcher.explain analog: per-term score breakdown for
        the first 10 docs under every BM25 query."""
        from engine.search import score_explain as _se

        idx = _cached_index(spark, sf_dir)
        qt = [(q, t, 1.0) for q, terms in BM25_QUERIES for t in terms]
        res = _se(idx, qt, list(range(10)))
        return res.select(
            "qid", "doc_id", "term", "weight", "tf", "df", "dl",
            round_half_up(F.col("idf"), 6).alias("idf"),
            round_half_up(F.col("pscore"), 6).alias("pscore"))

    def wildcard_topk(spark, sf_dir):
        """Lucene WildcardQuery rewrite: distributed LIKE dictionary
        scan ('*'→'%', '?'→'_'), then bucket-pruned BM25 scoring."""
        from engine.search import wildcard_topk as _wt

        idx = _cached_index(spark, sf_dir)
        return _rounded_rerank(_wt(idx, WILDCARD_QUERIES, TOPK + 50), TOPK)

    def regexp_trigram_topk(spark, sf_dir):
        """Trigram-pruned regexp rewrite: CONSERVATIVE required-
        literal runs (sound under alternation/quantifiers/groups)
        intersect the trigram sidecar, anchored RLIKE verifies —
        EXACT (engine/trigram.py:expand_regexp_terms_trigram)."""
        from engine.trigram import (build_term_trigrams,
                                    expand_regexp_terms_trigram)
        from engine.search import score_exhaustive

        idx = _cached_index(spark, sf_dir)
        build_term_trigrams(spark, idx.index_dir)
        return _rounded_rerank(score_exhaustive(
            idx, expand_regexp_terms_trigram(idx, REGEXP_TRIGRAM_QUERIES),
            TOPK + 50), TOPK)

    def mlt_text_topk(spark, sf_dir):
        """ES More-Like-This with free TEXT as the like-input:
        index-analyzer parity, tf.idf term selection (rounded, term
        asc tiebreak), weight-1.0 weighted-OR BM25
        (engine/search.py:more_like_text)."""
        from engine.search import more_like_text

        idx = _cached_index(spark, sf_dir)
        return _rounded_rerank(
            more_like_text(idx, MLT_TEXT_QUERIES, TOPK + 50,
                           n_terms=MLT_TEXT_TERMS), TOPK)

    def wildcard_trigram_topk(spark, sf_dir):
        """Trigram-pruned wildcard rewrite (the Code Search / Zoekt
        technique): literal-run trigrams intersect the (trigram, term)
        sidecar to bound candidates, LIKE verifies — EXACT, so the
        oracle is the plain full-dictionary LIKE semantics
        (engine/trigram.py:expand_wildcard_terms_trigram)."""
        from engine.trigram import (build_term_trigrams,
                                    wildcard_topk_trigram)

        idx = _cached_index(spark, sf_dir)
        build_term_trigrams(spark, idx.index_dir)
        return _rounded_rerank(
            wildcard_topk_trigram(idx, WILDCARD_TRIGRAM_QUERIES,
                                  TOPK + 50), TOPK)

    def more_like_this(spark, sf_dir):
        """Lucene MoreLikeThis analog: seed docs become queries via
        their top tf·idf terms; the seed is excluded from its hits."""
        from engine.search import more_like_this as _mlt

        idx = _cached_index(spark, sf_dir)
        return _rounded_rerank(
            _mlt(idx, MLT_SEEDS, TOPK + 50, n_terms=MLT_TERMS), TOPK)

    def facet_counts(spark, sf_dir):
        """Faceting analog: top lang values (distinct-doc counts) over
        each query's matched doc set."""
        from engine.search import facet_counts as _fc

        idx = _cached_index(spark, sf_dir)
        return _fc(idx, BM25_QUERIES, "lang", 3)

    def significant_terms(spark, sf_dir):
        """ES significant_terms agg (JLH): terms over-represented in
        each query's matched doc set vs the corpus background."""
        from engine.search import significant_terms as _st

        idx = _cached_index(spark, sf_dir)
        return _st(idx, BM25_QUERIES, SIGTERMS_N)

    def rare_terms(spark, sf_dir):
        """ES rare_terms bucket agg: terms whose doc count WITHIN each
        query's matched set is <= RARE_MDC, with the corpus df beside
        it (exact on Spark, vs ES's cuckoo-sieve approximation)."""
        from engine.search import rare_terms_agg

        idx = _cached_index(spark, sf_dir)
        return rare_terms_agg(idx, BM25_QUERIES, RARE_MDC)

    def sampler_lang(spark, sf_dir):
        """ES sampler bucket agg: lang terms-facet over only the top
        SAMPLER_SHARD scored hits per query (4dp-rounded rank cut)."""
        from engine.search import sampler_facet

        idx = _cached_index(spark, sf_dir)
        return sampler_facet(idx, BM25_QUERIES, "lang", SAMPLER_SHARD)

    def diversified_sampler_lang(spark, sf_dir):
        """ES diversified_sampler: at most SAMPLER_MAX_PER docs per
        dedup key (doc_id % SAMPLER_DEDUP_MOD) survive, in score
        order, BEFORE the shard_size cut fills."""
        from engine.search import sampler_facet

        idx = _cached_index(spark, sf_dir)
        return sampler_facet(
            idx, BM25_QUERIES, "lang", SAMPLER_SHARD,
            dedup_expr=F.pmod(F.col("doc_id"), F.lit(SAMPLER_DEDUP_MOD)),
            max_per_value=SAMPLER_MAX_PER)

    def significant_text_topn(spark, sf_dir):
        """ES significant_text agg: JLH significance over RE-ANALYZED
        stored content of the top SIGTEXT_SHARD sampled hits (the
        index's own analyzer opts — the stale-analyzer rule), with
        exact-duplicate texts filtered (filter_duplicate_text)."""
        from engine.search import significant_text as _st

        idx = _cached_index(spark, sf_dir)
        return _st(idx, BM25_QUERIES, SIGTERMS_N, SIGTEXT_SHARD,
                   filter_duplicate_text=True)

    def boosting_topk(spark, sf_dir):
        """ES boosting compound query: positive-clause BM25 matching,
        with hits also matching the negative clause demoted by
        NEG_BOOST BEFORE the rank cut (demotion, not exclusion)."""
        from engine.search import boosting_topk as _bq

        idx = _cached_index(spark, sf_dir)
        return _rounded_rerank(
            _bq(idx, BOOSTING_QUERIES, TOPK + 50, NEG_BOOST), TOPK)

    def terms_set_topk(spark, sf_dir):
        """ES terms_set query (Lucene CoveringQuery): doc matches iff
        it contains >= required_matches(doc) distinct query terms,
        the minimum read per-doc from a field (1 + n_chars % mod);
        score = BM25 sum over the matched terms."""
        from engine.search import terms_set_topk as _tsq

        idx = _cached_index(spark, sf_dir)
        req = _docs(spark, sf_dir).select(
            "doc_id",
            (F.lit(1) + F.pmod(F.col("n_chars"),
                               F.lit(TERMS_SET_MOD)))
            .alias("required_matches"))
        res = _tsq(idx, TERMS_SET_QUERIES, req, TOPK + 50)
        r = round_half_up(F.col("score"), 4)
        w = Window.partitionBy("qid").orderBy(r.desc(), F.asc("doc_id"))
        return (res.withColumn("rrank", F.row_number().over(w))
                .where(F.col("rrank") <= TOPK)
                .select("qid", "doc_id", "n_matched", r.alias("score"),
                        F.col("rrank").alias("rank"))
                .orderBy("qid", "rank"))

    def weighted_avg_dl(spark, sf_dir):
        """ES weighted_avg agg: Σ(dl·chars)/Σ(chars) per match set,
        exact DECIMAL(38,0) accumulators, one final division."""
        from engine.search import weighted_avg_agg

        idx = _cached_index(spark, sf_dir)
        return weighted_avg_agg(idx, BM25_QUERIES)

    def boxplot_dl(spark, sf_dir):
        """ES boxplot agg over analyzed dl: min/q1/q2/q3/max with
        EXACT type-7 quantiles where ES estimates via t-digest."""
        from engine.search import boxplot_agg

        idx = _cached_index(spark, sf_dir)
        return boxplot_agg(idx, BM25_QUERIES)

    def mad_dl(spark, sf_dir):
        """ES median_absolute_deviation agg over analyzed dl:
        median(|dl − median(dl)|), both medians exact type-7."""
        from engine.search import mad_agg

        idx = _cached_index(spark, sf_dir)
        return mad_agg(idx, BM25_QUERIES)

    def multi_terms_buckets(spark, sf_dir):
        """ES multi_terms agg: (lang, source) composite buckets per
        match set, count-desc ordered, top MULTI_TERMS_N."""
        from engine.search import multi_terms_agg

        idx = _cached_index(spark, sf_dir)
        fields = _docs(spark, sf_dir).select("doc_id", "lang", "source")
        return multi_terms_agg(idx, BM25_QUERIES, fields,
                               ["lang", "source"], MULTI_TERMS_N)

    def rank_feature_topk(spark, sf_dir):
        """ES rank_feature query (saturation function over the raw
        char-length feature): score = bm25 + RF_BOOST x nc/(nc+pivot),
        additive should clause. Runs the bounded-additive-feature
        WAND kernel path (r5: ub_shift = boost + eps, emit='cands' —
        rank-identical to exhaustive, equivalence-tested in
        tests/test_round5_kernel.py; engine/search.py:
        rank_feature_topk)."""
        from engine.search import rank_feature_topk as _rf

        idx = _cached_index(spark, sf_dir)
        qt = [(q, t, 1.0) for q, ts in BM25_QUERIES for t in ts]
        return _rf(idx, qt, TOPK, pivot=RF_PIVOT, boost=RF_BOOST)

    def string_stats_dl(spark, sf_dir):
        """ES string_stats agg (show_distribution): per match set the
        count/min/max/avg char length of stored content plus the
        Shannon entropy of the character distribution, int64
        micro-unit accumulation (engine/search.py:string_stats_agg)."""
        from engine.search import string_stats_agg

        idx = _cached_index(spark, sf_dir)
        return string_stats_agg(idx, BM25_QUERIES)

    def event_window_bucket_stats(spark, sf_dir):
        """ES sibling pipeline aggs (stats_bucket / avg_bucket /
        min_bucket / max_bucket / sum_bucket) over the hourly
        date_histogram per event_type: one row per series
        (engine/streaming.py:windowed_bucket_stats)."""
        from engine.streaming import windowed_bucket_stats

        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        return windowed_bucket_stats(events, window="1 hour")

    def event_window_moving(spark, sf_dir):
        """ES moving_fn (unweightedAvg, shift=0: the last MOV_WINDOW
        buckets EXCLUDING current) + serial_diff (lag SERIAL_LAG)
        pipeline aggs over the hourly date_histogram
        (engine/streaming.py:windowed_moving_fn)."""
        from engine.streaming import windowed_moving_fn

        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = windowed_moving_fn(events, window="1 hour",
                                 mov_window=MOV_WINDOW, lag=SERIAL_LAG)
        return (out.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"), "event_type", "n", "mov_avg_n",
            "serial_diff_n")
            .orderBy("event_type", "window_start"))

    def _hourly(spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/events.parquet")

    def event_window_bucket_script(spark, sf_dir):
        """ES bucket_script + bucket_selector + bucket_sort over the
        hourly date_histogram: per_event = total_value/n, buckets
        with n < BSC_MIN_N dropped (selector BEFORE sort), survivors
        re-ordered n desc / window_start asc and cut to BSC_SIZE
        (engine/streaming.py:windowed_bucket_script)."""
        from engine.streaming import windowed_bucket_script

        out = windowed_bucket_script(_hourly(spark, sf_dir),
                                     min_n=BSC_MIN_N, size=BSC_SIZE)
        return (out.select(
            "event_type",
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"), "n",
            round_half_up(F.col("total_value"), 4).alias("total_value"),
            "per_event", "pos")
            .orderBy("event_type", "pos"))

    def event_window_normalize(spark, sf_dir):
        """ES normalize pipeline agg (percent_of_sum) over the hourly
        date_histogram per event_type
        (engine/streaming.py:windowed_normalize)."""
        from engine.streaming import windowed_normalize

        out = windowed_normalize(_hourly(spark, sf_dir),
                                 method="percent_of_sum")
        return (out.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"), "event_type", "n", "normalized")
            .orderBy("event_type", "window_start"))

    def event_value_ranges(spark, sf_dir):
        """ES range agg over event value: from-INCLUSIVE /
        to-EXCLUSIVE independent buckets (overlap allowed — the
        catch-all range overlaps every other), given order preserved
        (engine/streaming.py:range_agg)."""
        from engine.streaming import range_agg

        return range_agg(_hourly(spark, sf_dir), "value", RANGE_BUCKETS)

    def event_window_rate(spark, sf_dir):
        """ES rate agg inside the hourly date_histogram: bucket count
        and value sum per minute — x unit/interval = 1/60
        (engine/streaming.py:rate_agg)."""
        from engine.streaming import rate_agg

        out = rate_agg(_hourly(spark, sf_dir), unit="1 minute")
        return (out.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"), "event_type", "n",
            "doc_rate", "value_rate")
            .orderBy("window_start", "event_type"))

    def event_window_moving_percentiles(spark, sf_dir):
        """ES moving_percentiles-style sliding exact type-7
        percentiles of the bucket metric n (moving_fn window model:
        last MOVP_WINDOW buckets EXCLUDING current; empty -> NULL)
        (engine/streaming.py:windowed_moving_percentiles)."""
        from engine.streaming import windowed_moving_percentiles

        out = windowed_moving_percentiles(_hourly(spark, sf_dir),
                                          mov_window=MOVP_WINDOW)
        return (out.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"), "event_type", "n",
            "p25_n", "p50_n", "p75_n")
            .orderBy("event_type", "window_start"))

    def event_window_percentiles_bucket(spark, sf_dir):
        """ES percentiles_bucket sibling pipeline agg per event_type:
        BOTH readings — ES nearest-rank (ceil(p*n)-1 over the sorted
        bucket list) and type-7 interpolation
        (engine/streaming.py:windowed_percentiles_bucket)."""
        from engine.streaming import windowed_percentiles_bucket

        return windowed_percentiles_bucket(_hourly(spark, sf_dir))

    def constant_score_hits(spark, sf_dir):
        """ES constant_score / filter context: every match scores
        exactly CS_BOOST, NO score agg in the plan, doc_id-asc
        tie-break (engine/search.py:constant_score_topk)."""
        from engine.search import constant_score_topk

        idx = _cached_index(spark, sf_dir)
        return constant_score_topk(idx, BM25_QUERIES, TOPK,
                                   boost=CS_BOOST)

    def script_scored_topk(spark, sf_dir):
        """ES script_score: the Catalyst-SQL script REPLACES the
        query score; the min_score gate reads the ROUNDED value
        BEFORE the rank cut (engine/search.py:script_score_topk)."""
        from engine.search import script_score_topk

        idx = _cached_index(spark, sf_dir)
        qt = [(q, t, 1.0) for q, ts in BM25_QUERIES for t in ts]
        return script_score_topk(idx, qt, TOPK, SS_SCRIPT,
                                 min_score=SS_MIN)

    def distance_feature_hits(spark, sf_dir):
        """ES distance_feature: boost·pivot/(pivot+|nc−origin|) ADDED
        to the BM25 sum as a should clause, rank cut last. Runs the
        bounded-additive-feature WAND kernel path (r5: ub_shift =
        boost + eps, emit='cands' — rank-identical to exhaustive,
        equivalence-tested; engine/search.py:distance_feature_topk)."""
        from engine.search import distance_feature_topk

        idx = _cached_index(spark, sf_dir)
        qt = [(q, t, 1.0) for q, ts in BM25_QUERIES for t in ts]
        return distance_feature_topk(idx, qt, TOPK, origin=DF_ORIGIN,
                                     pivot=DF_PIVOT, boost=DF_BOOST)

    def value_count_missing(spark, sf_dir):
        """ES value_count + missing + global bucket over the derived
        marker-word field (480/20 split at sf0.01 — both branches
        bite) (engine/search.py:value_count_missing_agg)."""
        from engine.search import value_count_missing_agg

        idx = _cached_index(spark, sf_dir)
        fields = _docs(spark, sf_dir).select(
            "doc_id", F.nullif(F.regexp_extract(
                "text", MARKER_RE, 1), F.lit("")).alias("marker"))
        return value_count_missing_agg(idx, BM25_QUERIES, fields,
                                       "marker")

    def match_bool_prefix(spark, sf_dir):
        """ES match_bool_prefix (search_as_you_type): BM25 term
        clauses + CONSTANT-score last-term prefix clause, full-outer
        sum, cut last; mb3 is the single-token degenerate case
        (engine/search.py:match_bool_prefix_topk)."""
        from engine.search import match_bool_prefix_topk

        idx = _cached_index(spark, sf_dir)
        return match_bool_prefix_topk(idx, MBP_QUERIES, TOPK)

    def scripted_metric_dl(spark, sf_dir):
        """ES scripted_metric: map = dl·nc per matched doc
        (DECIMAL(38,9)), combine = sum (the map-side partial IS the
        shard combine), reduce = state/n_docs
        (engine/search.py:scripted_metric_agg)."""
        from engine.search import scripted_metric_agg

        idx = _cached_index(spark, sf_dir)
        return scripted_metric_agg(idx, BM25_QUERIES, map_sql=SM_MAP,
                                   combine="sum", reduce_sql=SM_REDUCE)

    def fuzzy_osa_topk(spark, sf_dir):
        """Lucene/ES FuzzyQuery DEFAULT metric (transpositions=true,
        OSA): BM25 over vocabulary terms within 1 OSA edit — at
        max_edits=1, osa<=1 ⟺ lev<=1 OR one adjacent swap (the
        pinned DuckDB-expressible identity)
        (engine/search.py:fuzzy_topk(transpositions=True))."""
        from engine.search import fuzzy_topk as _ft

        idx = _cached_index(spark, sf_dir)
        return _rounded_rerank(
            _ft(idx, FUZZY_QUERIES, TOPK + 50, transpositions=True),
            TOPK)

    def pinned_hits(spark, sf_dir):
        """ES pinned query: curated ids promoted in given order
        (dedup, unknown-id skip), organic = rounded-re-ranked page
        with pins anti-joined out, pin rows NULL-scored
        (engine/search.py:pinned_topk)."""
        from engine.search import pinned_topk

        idx = _cached_index(spark, sf_dir)
        qt = [(q, t, 1.0) for q, ts in BM25_QUERIES for t in ts]
        return pinned_topk(idx, qt, PIN_DOCS, TOPK)

    def t_test_dl(spark, sf_dir):
        """ES t_test agg: Welch + pooled t over the analyzed dl of
        two term-filtered populations; exact integer moment sums, the
        no-match side yields the documented NULL statistics
        (engine/search.py:t_test_agg)."""
        from engine.search import t_test_agg

        idx = _cached_index(spark, sf_dir)
        return t_test_agg(idx, TT_PAIRS)

    def filters_agg_counts(spark, sf_dir):
        """ES filters agg: named OVERLAPPING buckets + other_bucket
        (live-corpus complement of the union), count + avg dl metric,
        empty bucket -> NULL avg (engine/search.py:filters_agg)."""
        from engine.search import filters_agg

        idx = _cached_index(spark, sf_dir)
        return filters_agg(idx, FILTERS_BUCKETS, other_bucket=True)

    def event_window_top_metrics(spark, sf_dir):
        """ES top_metrics per hourly bucket x event_type: the
        TM_SIZE latest readings (sort ts desc, value desc)
        (engine/streaming.py:windowed_top_metrics)."""
        from engine.streaming import windowed_top_metrics

        out = windowed_top_metrics(_hourly(spark, sf_dir),
                                   size=TM_SIZE)
        return (out.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"), "event_type", "pos",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("ts"), "value")
            .orderBy("event_type", "window_start", "pos"))

    def event_window_auto_histogram(spark, sf_dir):
        """ES auto_date_histogram: interval chosen from the rounding
        ladder as the finest whose epoch-aligned bucket count fits
        AH_TARGET (engine/streaming.py:windowed_auto_histogram)."""
        from engine.streaming import windowed_auto_histogram

        out = windowed_auto_histogram(_hourly(spark, sf_dir),
                                      target_buckets=AH_TARGET)
        return (out.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"), "interval", "n")
            .orderBy("window_start"))

    def event_window_cum_cardinality(spark, sf_dir):
        """ES cumulative_cardinality: register-wise HLL prefix max
        over the hourly windows — est is monotone nondecreasing
        (engine/streaming.py:windowed_cumulative_cardinality)."""
        from engine.streaming import windowed_cumulative_cardinality

        out = windowed_cumulative_cardinality(_hourly(spark, sf_dir))
        return (out.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"), "v_zero", "est")
            .orderBy("window_start"))

    def rank_eval(spark, sf_dir):
        """ES _rank_eval's metric set beside the reference's four:
        MRR@20 / recall@20 / ERR@20 (Chapelle 2009 binary grades,
        nano-quantized term sums) on the derived run + derived qrels
        of eval_metrics (engine/evaluate.py:rank_eval_metrics)."""
        from engine.evaluate import rank_eval_metrics

        scored = _bm25_scored(spark, sf_dir, BM25_QUERIES)
        w = Window.partitionBy("qid").orderBy(
            round_half_up(F.col("s"), 4).desc(), F.asc("doc_id"))
        run = (scored.withColumn("rank", F.row_number().over(w))
               .where(F.col("rank") <= 20)
               .select("qid",
                       F.col("doc_id").cast("string").alias("docno"),
                       "rank"))
        tf = _tf(spark, sf_dir)
        qt = spark.createDataFrame(
            [(q, t) for q, ts in BM25_QUERIES for t in set(ts)],
            "qid string, term string")
        nt = spark.createDataFrame(
            [(q, len(set(ts))) for q, ts in BM25_QUERIES],
            "qid string, n_terms int")
        qrels = (tf.join(F.broadcast(qt), "term")
                 .groupBy("qid", "doc_id")
                 .agg(F.count_distinct("term").alias("nm"))
                 .join(F.broadcast(nt), "qid")
                 .where(F.col("nm") == F.col("n_terms"))
                 .select("qid",
                         F.col("doc_id").cast("string").alias("docno"),
                         F.lit(1).alias("rel")))
        return rank_eval_metrics(run, qrels, k=20)

    def span_within_hits(spark, sf_dir):
        """Lucene SpanWithinQuery: little-term occurrences inside an
        ordered (a ... b) near span, all-pairs enumeration
        (engine/positions.py:span_within_match)."""
        from engine.positions import build_positions, span_within_match

        idx = _cached_index(spark, sf_dir)
        build_positions(spark, idx.index_dir)
        return span_within_match(idx, SPAN_WB_QUERIES)

    def span_containing_hits(spark, sf_dir):
        """Lucene SpanContainingQuery: ordered near pairs holding at
        least one little occurrence, end exclusive
        (engine/positions.py:span_containing_match)."""
        from engine.positions import (build_positions,
                                      span_containing_match)

        idx = _cached_index(spark, sf_dir)
        build_positions(spark, idx.index_dir)
        return span_containing_match(idx, SPAN_WB_QUERIES)

    def span_or_hits(spark, sf_dir):
        """SpanNear with a SpanOrQuery clause: position-set UNION of
        the or-group terms near the other term, ordered pairs
        (engine/positions.py:span_or_near_match)."""
        from engine.positions import build_positions, span_or_near_match

        idx = _cached_index(spark, sf_dir)
        build_positions(spark, idx.index_dir)
        return span_or_near_match(idx, SPAN_OR_QUERIES)

    def sqs_topk(spark, sf_dir):
        """ES simple_query_string: the lenient user-facing language
        over a mixed tree — AND + OR group + level-scoped NOT + a
        trailing-* prefix atom, the whole boolean tree one Catalyst
        pivot (engine/queryparse.py:simple_query_string_topk)."""
        from engine.queryparse import simple_query_string_topk

        idx = _cached_index(spark, sf_dir)
        return simple_query_string_topk(idx, "sq1", SQS_QUERY, TOPK)

    def sqs_flat_or_topk(spark, sf_dir):
        """ES simple_query_string, flat pure-positive OR — the r5
        QUANTIZED block-max kernel fast path (score_wand with
        in-kernel int64-µu quantization; the mixed-tree sibling
        sqs_topk keeps the one-pass tree plan)
        (engine/queryparse.py:simple_query_string_topk)."""
        from engine.queryparse import simple_query_string_topk

        idx = _cached_index(spark, sf_dir)
        return simple_query_string_topk(idx, "sqf1", SQS_FLAT_QUERY,
                                        TOPK)

    def cross_fields_search(spark, sf_dir):
        """ES multi_match cross_fields over the title/body field
        indexes: blended df = max_f df_f (BlendedTermQuery), per-term
        dismax (tie 0.3) under the bool sum
        (engine/fields.py:cross_fields_topk)."""
        from engine.fields import cross_fields_topk

        idxs = _cached_field_indexes(spark, sf_dir)
        cq = [(q, t, 1.0) for q, ts in BM25_QUERIES for t in ts]
        return _rounded_rerank(
            cross_fields_topk(idxs, cq, TOPK + 50, tie_breaker=0.3),
            TOPK)

    def event_value_width_histogram(spark, sf_dir):
        """ES variable_width_histogram: deterministic rendering —
        equal-width seeds + 2 Lloyd passes over the distinct-value
        table, DECIMAL centroid means
        (engine/streaming.py:variable_width_histogram)."""
        from engine.streaming import variable_width_histogram

        return variable_width_histogram(_hourly(spark, sf_dir),
                                        buckets=VWH_BUCKETS,
                                        iters=VWH_ITERS)

    def facet_histogram(spark, sf_dir):
        """ES histogram agg over analyzed doc length (occupied
        buckets, width HIST_INTERVAL) per query's matched set."""
        from engine.search import facet_histogram as _fh

        idx = _cached_index(spark, sf_dir)
        return _fh(idx, BM25_QUERIES, HIST_INTERVAL)

    def synonym_topk(spark, sf_dir):
        """Lucene SynonymQuery: per-group tf-sum + max-df blending,
        groups OR-combined; absent members drop out."""
        from engine.search import synonym_topk as _syn

        idx = _cached_index(spark, sf_dir)
        return _rounded_rerank(_syn(idx, SYNONYM_QUERIES, TOPK + 50), TOPK)

    def phrase_hits(spark, sf_dir):
        """Exact-phrase retrieval over the positional index
        (engine/positions.py; anchor-alignment plan, lead-gated)."""
        from engine.positions import build_positions, phrase_match

        idx = _cached_index(spark, sf_dir)
        build_positions(spark, idx.index_dir)
        return phrase_match(idx, PHRASE_QUERIES)

    def matrix_stats(spark, sf_dir):
        """ES matrix_stats agg over (analyzed dl, char length) per
        query match set: means/variances/covariance/correlation with
        exact int64 accumulators and the doubled extended_stats
        determinism recipe (engine/search.py:matrix_stats_agg)."""
        from engine.search import matrix_stats_agg

        idx = _cached_index(spark, sf_dir)
        return matrix_stats_agg(idx, BM25_QUERIES)

    def percentile_ranks_dl(spark, sf_dir):
        """ES percentile_ranks agg (inverse percentiles) over analyzed
        doc length: EXACT ranks (integer count / one division) where
        ES t-digests — exactness is free here since the probe values
        are query constants (engine/search.py:percentile_ranks_agg)."""
        from engine.search import percentile_ranks_agg

        idx = _cached_index(spark, sf_dir)
        return percentile_ranks_agg(idx, BM25_QUERIES, PCT_RANK_VALUES)

    def span_not_hits(spark, sf_dir):
        """Lucene SpanNotQuery analog: docs with an include-term
        occurrence no exclude-term occurrence falls within +-window of
        (engine/positions.py:span_not_match — per-doc array
        left-join + nested-HOF check, positions never exploded)."""
        from engine.positions import build_positions, span_not_match

        idx = _cached_index(spark, sf_dir)
        build_positions(spark, idx.index_dir)
        return span_not_match(idx, SPAN_NOT_QUERIES,
                              pre=SPAN_NOT_WINDOW, post=SPAN_NOT_WINDOW)

    def interval_hits(spark, sf_dir):
        """ES intervals query (all_of ordered=true, max_gaps) over the
        positional index: positions p1<…<pn, one per analyzed query
        term IN ORDER, with (pn−p1)−(n−1) ≤ max_gaps — greedy-chain
        existence in one Catalyst nested higher-order expression,
        positions never exploded (engine/positions.py:interval_match)."""
        from engine.positions import build_positions, interval_match

        idx = _cached_index(spark, sf_dir)
        build_positions(spark, idx.index_dir)
        return interval_match(idx, INTERVAL_QUERIES, INTERVAL_MAX_GAPS)

    def top_hits_by_lang(spark, sf_dir):
        """ES terms aggregation with a top_hits sub-aggregation: the
        top langs of each query's matched set (n_docs desc, value asc)
        and the best docs per bucket — per-bucket window over the FULL
        scored match set, never a post-filter of a global top-k
        (engine/search.py:top_hits_agg)."""
        from engine.search import top_hits_agg

        idx = _cached_index(spark, sf_dir)
        return top_hits_agg(idx, BM25_QUERIES, "lang",
                            TOP_HITS_BUCKETS, TOP_HITS_PER_BUCKET)

    def lm_perplexity(spark, sf_dir):
        """CCNet perplexity filtering (Wenzek et al. 2020): add-one
        bigram LM fit on the lang=='en' reference slice, per-doc
        cross-entropy in nats + keep flag; integer micro-unit
        accumulation (engine/pipeline/textstats.py:lm_cross_entropy)."""
        from engine.pipeline.textstats import lm_cross_entropy

        return (lm_cross_entropy(
            _docs(spark, sf_dir).withColumn("r", F.col("lang") == "en"),
            "r", threshold=LM_CE_THRESHOLD)
            .orderBy("doc_id"))

    def phrase_prefix_hits(spark, sf_dir):
        """match_phrase_prefix retrieval (ES match_phrase_prefix /
        Lucene MultiPhraseQuery with a prefix-expanded last position):
        anchor-alignment with the last offset satisfied by ANY of the
        prefix's first-50-in-term-order dictionary expansions."""
        from engine.positions import build_positions, phrase_prefix_match

        idx = _cached_index(spark, sf_dir)
        build_positions(spark, idx.index_dir)
        return phrase_prefix_match(idx, PHRASE_PREFIX_QUERIES)

    def phrase_prefix_topk(spark, sf_dir):
        """match_phrase_prefix top-k: prefix-phrase-gated BM25 over
        the exact tokens (gate BEFORE the rank cut; the prefix
        position matches but does not score — divergence doc'd)."""
        from engine.positions import (build_positions,
                                      phrase_prefix_topk as _ppt)

        idx = _cached_index(spark, sf_dir)
        build_positions(spark, idx.index_dir)
        return _ppt(idx, PHRASE_PREFIX_QUERIES, TOPK)

    def did_you_mean(spark, sf_dir):
        """Whole-query spell correction (ES phrase suggester mechanic):
        per-position edit-distance candidates rescored by an add-1
        bigram LM on the observed left context; one suggestion per
        query."""
        from engine.pipeline.textstats import did_you_mean as _dym

        return (_dym(_docs(spark, sf_dir), DYM_QUERIES, max_edits=2)
                .orderBy("qid"))

    def nb_quality_scores(spark, sf_dir):
        """Classifier-based quality filtering (the GPT-3/LLaMA/CCNet
        linear-classifier stage) as closed-form multinomial Naive
        Bayes over md5-hashed token features: fit on the lang=='en'
        slice as the trusted reference, log-odds score per doc."""
        from engine.pipeline.textstats import nb_classifier

        return (nb_classifier(
            _docs(spark, sf_dir).withColumn(
                "pos", F.col("lang") == "en"), "pos")
            .orderBy("doc_id"))

    def random_topk(spark, sf_dir):
        """function_score random_score in replace mode (ES seeded
        deterministic random ranking): reproducible k-doc sample of
        each query's match set, gate before the rank cut."""
        from engine.search import random_score_topk

        idx = _cached_index(spark, sf_dir)
        return random_score_topk(idx, BM25_QUERIES, TOPK,
                                 seed=RANDOM_SEED)

    def span_first(spark, sf_dir):
        """Lucene SpanFirstQuery analog: first gap-numbered occurrence
        of the term must end within the per-query limit (shuffle-free:
        scan → broadcast join → per-row filter)."""
        from engine.positions import build_positions, span_first_match

        idx = _cached_index(spark, sf_dir)
        build_positions(spark, idx.index_dir)
        return span_first_match(idx, SPANFIRST_QUERIES)

    def proximity_hits(spark, sf_dir):
        """Unordered proximity retrieval (first term anchors; all other
        terms within |Δpos| ≤ PROX_WINDOW)."""
        from engine.positions import build_positions, proximity_match

        idx = _cached_index(spark, sf_dir)
        build_positions(spark, idx.index_dir)
        return proximity_match(idx, PROX_QUERIES, PROX_WINDOW)

    def bloom_decontam(spark, sf_dir):
        """Space-bounded decontamination: the eval slice compressed
        into a fixed 16 KB Bloom filter (4096×32-bit words, k=4
        md5-salted hashes, bitwise-OR agg build) probed by every doc
        n-gram — one-sided, no false negatives
        (engine/sketches.py:bloom_build/bloom_probe,
        engine/pipeline/curation.py:bloom_decontaminate)."""
        from engine.pipeline import curation

        docs = _docs(spark, sf_dir)
        ev = docs.where(F.col("doc_id") % 97 == 0)
        # n_words pinned so the oracle's bit table is static (the
        # auto-sizer would pick the same 4096 floor at this sf)
        return (curation.bloom_decontaminate(docs, ev, n=5,
                                             n_words=4096)
                .orderBy("doc_id"))

    def extended_stats_dl(spark, sf_dir):
        """ES extended_stats agg over analyzed doc length per query
        match set: exact int64 accumulators, variance via the exact
        integer numerator (n·Σx² − (Σx)²)/n² with one final division
        (engine/search.py:extended_stats_agg)."""
        from engine.search import extended_stats_agg

        idx = _cached_index(spark, sf_dir)
        return extended_stats_agg(idx, BM25_QUERIES)

    def fvf_topk(spark, sf_dir):
        """ES function_score field_value_factor (ln1p over doc length,
        boost_mode multiply): factor reorders the ranking → exhaustive
        scoring with the rank cut last; 6dp-quantized factor
        (engine/search.py:field_value_factor_topk)."""
        from engine.search import field_value_factor_topk

        idx = _cached_index(spark, sf_dir)
        qt = [(q, t, 1.0) for q, ts in BM25_QUERIES for t in ts]
        return field_value_factor_topk(idx, qt, TOPK)

    def decontam_report(spark, sf_dir):
        """Benchmark decontamination: flag docs whose distinct 5-grams
        overlap the eval slice (doc_id % 97 == 0 — a deterministic
        stand-in benchmark drawn from the same table)."""
        from engine.pipeline import curation

        docs = _docs(spark, sf_dir)
        ev = docs.where(F.col("doc_id") % 97 == 0)
        return curation.decontaminate(docs, ev, n=5).orderBy("doc_id")

    def repetition_scores(spark, sf_dir):
        """Gopher-style repetition quality signals (dup n-gram fracs,
        top-2-gram frac) — pure per-row array math, zero shuffle."""
        from engine.pipeline import curation

        return (curation.repetition_scores(_docs(spark, sf_dir))
                .orderBy("doc_id"))

    def mixture_sample(spark, sf_dir):
        """Deterministic stratified downsampling to target per-lang
        mixture rates (md5-hash uniform, reproducible across engines
        and partitionings — unlike DataFrame.sample)."""
        from engine.pipeline import curation

        return (curation.hash_sample(_docs(spark, sf_dir), MIX_RATES)
                .orderBy("doc_id"))

    def shared_ngrams(spark, sf_dir):
        """Cross-doc exact-substring duplication (Lee et al. window-
        hash form): fraction of each doc's 10-token windows occurring
        verbatim in another doc."""
        from engine.pipeline import curation

        return (curation.shared_ngram_report(_docs(spark, sf_dir), n=10)
                .orderBy("doc_id"))

    def substring_dedup(spark, sf_dir):
        """Exact duplicated-SPAN removal (Lee et al. 2022 ExactSubstr,
        arXiv:2107.06499, window-hash form): 10-token spans occurring
        verbatim in ≥2 docs are excised from every doc except the
        lowest-doc_id owner; each doc's unique text survives."""
        from engine.pipeline import curation

        return (curation.exact_substring_dedup(_docs(spark, sf_dir),
                                               n=10)
                .orderBy("doc_id"))

    def cms_term_counts(spark, sf_dir):
        """Count-Min sketch frequency estimation (Cormode &
        Muthukrishnan 2005): estimated vs exact counts for the 20 most
        frequent corpus terms from a fixed 4×1024 integer register
        grid — the fixed-state plan that replaces the vocabulary-sized
        groupBy(token) shuffle at 100 TB (one-sided est ≥ true)."""
        from pyspark.sql import Window

        from engine import sketches
        from engine.pipeline.curation import _tokens

        toks = _docs(spark, sf_dir).select(
            F.explode(_tokens(F.col("text"))).alias("term"))
        regs = sketches.cms_registers(toks, [], "term")
        exact = toks.groupBy("term").agg(
            F.count(F.lit(1)).alias("cnt"))
        top = (exact.withColumn(
            "rn", F.row_number().over(
                Window.orderBy(F.desc("cnt"), F.asc("term"))))
            .where(F.col("rn") <= 20).drop("rn"))
        est = sketches.cms_lookup(regs, top.select("term"), [], "term")
        return (top.join(est, "term").select("term", "cnt", "est")
                .orderBy(F.desc("cnt"), "term"))

    def rp_embed(spark, sf_dir):
        """Johnson-Lindenstrauss Rademacher random projection 64→16
        (Achlioptas 2003): the embedding-shrink pass that cuts every
        downstream ANN/dedup shuffle 4× while preserving pairwise
        distances to (1±ε); md5-derived ±1 matrix, zero shuffles."""
        from engine.pipeline.similarity import rp_project

        return (rp_project(_emb(spark, sf_dir), d_in=64, d_out=16)
                .orderBy("id", "dim"))

    def pack_layout(spark, sf_dir):
        """GPT-style packing layout: per-lang concatenate-and-split
        into 512-token training sequences (window cumsum)."""
        from engine.pipeline import curation

        return (curation.pack_sequences(_docs(spark, sf_dir), budget=512)
                .orderBy("doc_id"))

    def ngram_lm_counts(spark, sf_dir):
        """Corpus trigram count table with count-pruning (the classic
        web-scale LM-prep aggregation, Brants et al. 2007)."""
        return (textstats.ngram_counts(_docs(spark, sf_dir),
                                       n=3, min_count=3)
                .orderBy("ngram"))

    def curation_report(spark, sf_dir):
        """End-stage keep/drop filter (RefinedWeb/Gopher-style):
        length + quality + language + 2-gram repetition combined in
        ONE Catalyst projection (no joins/shuffles); per-doc keep flag
        and comma-joined violated-rule reasons."""
        return (textstats.curation_filter(_docs(spark, sf_dir))
                .orderBy("doc_id"))

    def url_domains(spark, sf_dir):
        """URL/domain curation stage (CCNet/RefinedWeb-style): URLs are
        injected deterministically (the synthetic corpus has none),
        then per-doc URL count, sorted distinct domains, and a
        blocklist flag are computed — the identical injection runs on
        the oracle side."""
        from engine.pipeline import curation

        docs = _docs(spark, sf_dir).select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" http://d"), (F.col("doc_id") % 7).cast("string"),
                F.lit(".example.com/p"), (F.col("doc_id") % 3).cast("string"),
                F.lit(" https://www.site"), (F.col("doc_id") % 5).cast("string"),
                F.lit(".org/q")).alias("text"))
        st = curation.url_stats(docs)
        bl = F.array(F.lit("d3.example.com"), F.lit("www.site2.org"))
        return (st.withColumn(
            "blocked",
            F.size(F.array_intersect(F.split("domains", ","), bl)) > 0)
            .orderBy("doc_id"))

    def pii_scrub(spark, sf_dir):
        """PII redaction counts + scrubbed-text hash. The synthetic
        corpus carries no PII, so a deterministic email+IP suffix is
        appended per doc (identically in the SQL oracle) to exercise
        the redaction for real."""
        from engine.pipeline import curation

        docs = _docs(spark, sf_dir).select(
            "doc_id",
            F.concat(F.col("text"), F.lit(" mail u"),
                     F.col("doc_id").cast("string"),
                     F.lit("@ex.com ip 10.0.0."),
                     (F.col("doc_id") % 256).cast("string")).alias("text"))
        return curation.pii_scrub(docs).orderBy("doc_id")

    def lmdirichlet_topk(spark, sf_dir):
        """LMDirichlet (μ=2000) top-k via the index-backed
        ``score_lmd`` — the reference's published alternative
        similarity (GROUP_12.pdf §5.2.2, Lucene LMDirichletSimilarity;
        formula pinned in engine/scoring.py). ctf is recovered from the
        decoded postings themselves; total_tokens from the index stats."""
        from engine.search import score_lmd

        idx = _cached_index(spark, sf_dir)
        qt = [(q, t, 1.0) for q, terms in BM25_QUERIES for t in terms]
        return _rounded_rerank(score_lmd(idx, qt, TOPK + 50), TOPK)

    def ib_topk(spark, sf_dir):
        """Information-Based similarity top-k (the reference's §5.2.2
        'BM25 + IB Hybrid' component; Lucene IBSimilarity pinned to
        DistributionLL·LambdaDF·NormalizationH2 — engine/scoring.py)
        via the index-backed ``score_ib``."""
        from engine.search import score_ib

        idx = _cached_index(spark, sf_dir)
        qt = [(q, t, 1.0) for q, terms in BM25_QUERIES for t in terms]
        return _rounded_rerank(score_ib(idx, qt, TOPK + 50), TOPK)

    def bm25_lucene_norms_topk(spark, sf_dir):
        """BM25 with Lucene's 1-byte SmallFloat length quantization
        (the parity mode that isolates the engine's exact-dl vs Lucene
        norm delta; engine/scoring.py:lucene_norm_dl with a closed-form
        byte4 roundtrip: dl < 24 exact, else 24 + top-4-bits(dl-24))."""
        from engine.search import score_exhaustive

        idx = _cached_index(spark, sf_dir)
        qt = [(q, t, 1.0) for q, terms in BM25_QUERIES for t in terms]
        return _rounded_rerank(
            score_exhaustive(idx, qt, TOPK + 50, norms="lucene"), TOPK)

    def wand_lmd_topk(spark, sf_dir):
        """LMDirichlet through the GENERALIZED sharded block-max
        kernel (scorer='lmd'): same DuckDB oracle as the exhaustive
        lmdirichlet_topk — the driver gate certifies the kernel's
        LMD bound + contribution dispatch, not just pytest."""
        from engine.search import score_wand

        idx = _cached_index(spark, sf_dir)
        qt = [(q, t, 1.0) for q, terms in BM25_QUERIES for t in terms]
        return _rounded_rerank(
            score_wand(idx, qt, TOPK + 50, scorer="lmd"), TOPK)

    def wand_ib_topk(spark, sf_dir):
        """IB through the generalized kernel (scorer='ib'); oracle
        shared with the exhaustive ib_topk."""
        from engine.search import score_wand

        idx = _cached_index(spark, sf_dir)
        qt = [(q, t, 1.0) for q, terms in BM25_QUERIES for t in terms]
        return _rounded_rerank(
            score_wand(idx, qt, TOPK + 50, scorer="ib"), TOPK)

    def ascii_fold_tf(spark, sf_dir):
        """T6 ASCII folding (Lucene ASCIIFoldingFilter analog;
        reference CustomAnalyzer.java:31). The documents table is pure
        ASCII, so accents are injected deterministically first
        (translate + 'th'→'þ'), then the fold+tokenize chain runs —
        both engines perform the identical injection, so the oracle
        genuinely exercises the fold's 1:1 table, multi-char
        expansions, and case-restoring camel interaction."""
        docs = _docs(spark, sf_dir)
        injected = F.replace(F.translate(F.col("text"), "aeoAEO", "áèøÀÉØ"),
                             F.lit("th"), F.lit("þ"))
        toks = tokens_col(injected, ascii_fold=True)
        return (docs.select("doc_id", F.explode(toks).alias("term"))
                .groupBy("doc_id", "term")
                .agg(F.count(F.lit(1)).alias("tf"))
                .orderBy("doc_id", "term"))

    def trec_run(spark, sf_dir):
        """TREC run-file rows (SURVEY.md S6; Searcher.java:79 format)."""
        hits = _topk(_bm25_scored(spark, sf_dir, BM25_QUERIES))
        return (hits.select(
            "qid", "rank",
            F.format_string("%s Q0 %s %d %.4f %s", F.col("qid"),
                            F.col("doc_id").cast("string"), F.col("rank"),
                            F.col("score"), F.lit("SPARK_FTS")).alias("line"))
            .orderBy("qid", "rank"))

    def hybrid_rrf_topk(spark, sf_dir):
        """Hybrid sparse+dense retrieval via Reciprocal Rank Fusion
        (Cormack et al. 2009; the Elasticsearch `rrf` retriever
        formula with the standard k=60): each BM25 text query is
        paired with an ANN query vector (BM25_QUERIES[i] ↔
        ANN_QUERY_IDS[i]; embeddings are document-level, vec_id ==
        doc_id), both rankings overfetch to TOPK+20, and the fused
        top-10 is ranked by the rounded rrf score. No score
        normalization anywhere — RRF fuses ranks, which is the whole
        point of the method."""
        bm25 = _topk(_bm25_scored(spark, sf_dir, BM25_QUERIES),
                     TOPK + 20).select("qid", "doc_id", "rank")
        emb = _emb(spark, sf_dir)
        cos = similarity.cosine_topk(emb, ANN_QUERY_IDS, TOPK + 40)
        rc = round_half_up(F.col("cosine"), 4)
        wv = Window.partitionBy("qid").orderBy(rc.desc(), F.asc("vec_id"))
        cosr = (cos.withColumn("rank", F.row_number().over(wv))
                .where(F.col("rank") <= TOPK + 20))
        pair = spark.createDataFrame(
            [(vid, q) for (q, _), vid in zip(BM25_QUERIES, ANN_QUERY_IDS)],
            "qid long, text_qid string")
        dense = (cosr.join(F.broadcast(pair), "qid")
                 .select(F.col("text_qid").alias("qid"),
                         F.col("vec_id").alias("doc_id"), "rank"))
        return (fusion.rrf_fuse([bm25, dense], topk=TOPK)
                .orderBy("qid", "rank"))

    def collapsed_topk(spark, sf_dir):
        """Field collapsing (Lucene grouping module /
        CollapsingTopDocsCollector; ES `collapse`): best doc per
        `source` group under each BM25 query, top-10 of the
        collapsed ranking. Collapses the FULL scored set (a group's
        winner can sit below any fixed rank cut — gate before cut)."""
        scored = _bm25_scored(spark, sf_dir, BM25_QUERIES)
        groups = (_docs(spark, sf_dir)
                  .select("doc_id", F.col("source").alias("group")))
        return (fusion.collapse_topk(scored, groups, TOPK)
                .orderBy("qid", "rank"))

    def suggest_terms(spark, sf_dir):
        """Spell suggestion (Lucene DirectSpellChecker): top-5
        vocabulary corrections within 2 edits, distance-then-df
        ranked, over the real index's term dictionary."""
        from engine.search import suggest_terms as _sg

        idx = _cached_index(spark, sf_dir)
        return (_sg(idx, SUGGEST_QUERIES, max_edits=2, n=5)
                .orderBy("qid", "rank"))

    def dsir_weights(spark, sf_dir):
        """DSIR importance weights (Xie et al. 2023): hashed
        unigram+bigram multinomials, target = the src7 slice of the
        corpus, add-1 smoothing over 10k buckets. logw rounded 6dp
        (per-doc sums cross buckets in engine-dependent order)."""
        from engine.pipeline import curation

        docs = _docs(spark, sf_dir)
        out = curation.dsir_weights(docs,
                                    docs.where(F.col("source") == "src7"))
        return (out.select("doc_id", "n_feats",
                           round_half_up(F.col("logw"), 6).alias("logw"))
                .orderBy("doc_id"))

    def dsir_sample(spark, sf_dir):
        """DSIR Gumbel top-k selection over the same weights
        (deterministic md5-hash uniforms; k=50)."""
        from engine.pipeline import curation

        docs = _docs(spark, sf_dir)
        return curation.dsir_sample(
            docs, docs.where(F.col("source") == "src7"), k=50)

    def dismax_topk(spark, sf_dir):
        """Lucene DisjunctionMaxQuery / ES multi_match best_fields on
        the generalized block-max KERNEL (engine/fields.py:
        dismax_topk_wand; r4): per-field BM25 over the title/body
        field indexes (REAL per-field stats), doc score = max field
        score + 0.3 · (Σ other matching fields), combined in-kernel as
        tie·Σ + (1−tie)·max with monotone-sound block bounds.
        Rank-identical to the exhaustive dismax_topk
        (tests/test_round3_ext.py)."""
        from engine.fields import dismax_topk_wand as _dm

        idxs = _cached_field_indexes(spark, sf_dir)
        fq = [(q, f, t, 1.0) for q, terms in BM25_QUERIES for t in terms
              for f in ("title", "body")]
        return _rounded_rerank(_dm(idxs, fq, TOPK + 50, tie_breaker=0.3),
                               TOPK)

    def combined_fields_topk(spark, sf_dir):
        """ES combined_fields — the principled BM25F simplification
        (Robertson, Zaragoza & Taylor, CIKM 2004): tf/dl merge across
        fields BEFORE saturation (title×2 + body×1), df = any-field
        doc count, one avgdl over the weighted pseudo-field. Served
        from the INDEX-TIME pseudo-field (text repeated w_f times) on
        the standard block-max kernel (r4; engine/fields.py:
        build_combined_field_index) — score-identical to the
        query-time merge for integer weights (equivalence-tested)."""
        from engine.fields import combined_fields_topk_wand as _cf

        pseudo = _cached_combined_index(spark, sf_dir)
        return _rounded_rerank(_cf(pseudo, BM25_QUERIES, TOPK + 50),
                               TOPK)

    def completion_topk(spark, sf_dir):
        """Completion suggester (ES completion / Lucene suggest
        module): top-5 dictionary terms under each prefix ranked by
        df, served from the sorted range-pruned term dictionary —
        never touches postings."""
        from engine.search import complete_prefix

        idx = _cached_index(spark, sf_dir)
        return (complete_prefix(idx, COMPLETION_QUERIES, n=5)
                .orderBy("qid", "rank"))

    def decayed_topk(spark, sf_dir):
        """ES function_score gauss decay composed with BM25
        (engine/fusion.py:decay_multiply): relevance × gauss decay on
        the stored n_chars doc value (the recency-boost shape —
        n_chars stands in for a timestamp in this corpus)."""
        from engine.fusion import decay_multiply

        scored = _bm25_scored(spark, sf_dir, BM25_QUERIES) \
            .withColumnRenamed("s", "s0")
        vals = _docs(spark, sf_dir).select(
            "doc_id", F.col("n_chars").cast("double").alias("value"))
        out = decay_multiply(scored, vals, origin=0.0, scale=500.0,
                             offset=0.0, decay=0.5, kind="gauss",
                             score_col="s0")
        return _rounded_rerank(out, TOPK)

    def line_dedup(spark, sf_dir):
        """CCNet / RefinedWeb cross-document duplicate-line removal
        (engine/pipeline/curation.py:line_dedup) with 10-token chunk
        units (this corpus has no newline structure): per-doc unit
        counts + md5 of the scrubbed text."""
        from engine.pipeline.curation import line_dedup as _ld

        return (_ld(_docs(spark, sf_dir), min_docs=2, chunk_tokens=10)
                .orderBy("doc_id"))

    def winnow_near_dups(spark, sf_dir):
        """MOSS winnowing near-dup pairs (Schleimer et al. 2003;
        engine/pipeline/dedup.py): word 5-gram hashes, window-4
        minima fingerprints, exact Jaccard ≥ 0.5 over shared-
        fingerprint candidate pairs."""
        from engine.pipeline.dedup import (winnow_fingerprints,
                                           winnow_pairs)

        fps = winnow_fingerprints(_docs(spark, sf_dir), k=5, window=4)
        out = winnow_pairs(fps, min_jaccard=0.5)
        return (out.select("doc_a", "doc_b", "shared",
                           round_half_up(F.col("jaccard"), 6)
                           .alias("jaccard"))
                .orderBy("doc_a", "doc_b"))

    def winnow_fps(spark, sf_dir):
        """The winnowing fingerprint sets themselves (doc_id, fp) —
        the store a plagiarism/boilerplate service would index."""
        from engine.pipeline.dedup import winnow_fingerprints

        return (winnow_fingerprints(_docs(spark, sf_dir), k=5, window=4)
                .orderBy("doc_id", "fp"))

    def percolate_hits(spark, sf_dir):
        """Reverse search (ES percolate / Lucene Monitor;
        engine/percolate.py): which registered saved searches does
        each document match — must conjunction + must_not exclusion
        under the analyzer. r4: served from the INDEXED query store
        (anchor presearch → verify, the Monitor design) — exact-
        equivalent to the broadcast plan, candidate pairs bounded by
        anchor sharing instead of store size."""
        from engine.percolate import percolate_indexed, register_queries

        tag = hashlib.md5(os.path.abspath(sf_dir).encode()) \
            .hexdigest()[:10]
        store = f"/tmp/sfts_{INDEX_VERSION}_qstore_{tag}"
        register_queries(spark, store, PERCOLATE_QUERIES)
        return (percolate_indexed(_docs(spark, sf_dir), store)
                .orderBy("doc_id", "qid"))

    def cluster_sample(spark, sf_dir):
        """Cluster-balanced diversity subsampling (SemDeDup /
        SSL-prototypes lineage): ≤3 survivors per deterministic
        k-means cell, chosen by the partition-invariant md5-uniform
        key (engine/pipeline/similarity.py:cluster_sample)."""
        out = similarity.cluster_sample(_emb(spark, sf_dir),
                                        per_cell=3, n_centroids=16)
        return out.orderBy("vec_id")

    def eval_extra(spark, sf_dir):
        """R-precision + bpref (trec_eval's judged-aware companions,
        Buckley & Voorhees 2004; engine/evaluate.py:extra_metrics)
        over the derived run: judged pool = docs matching >= 1 query
        term (rel=1 when ALL terms match, rel=0 = judged
        nonrelevant)."""
        from engine.evaluate import extra_metrics

        scored = _bm25_scored(spark, sf_dir, BM25_QUERIES)
        w = Window.partitionBy("qid").orderBy(
            round_half_up(F.col("s"), 4).desc(), F.asc("doc_id"))
        run = (scored.withColumn("rank", F.row_number().over(w))
               .where(F.col("rank") <= 20)
               .select("qid",
                       F.col("doc_id").cast("string").alias("docno"),
                       "rank"))
        tf = _tf(spark, sf_dir)
        qt = spark.createDataFrame(
            [(q, t) for q, ts in BM25_QUERIES for t in set(ts)],
            "qid string, term string")
        nt = spark.createDataFrame(
            [(q, len(set(ts))) for q, ts in BM25_QUERIES],
            "qid string, n_terms int")
        qrels = (tf.join(F.broadcast(qt), "term")
                 .groupBy("qid", "doc_id")
                 .agg(F.count_distinct("term").alias("nm"))
                 .join(F.broadcast(nt), "qid")
                 .select("qid",
                         F.col("doc_id").cast("string").alias("docno"),
                         F.when(F.col("nm") == F.col("n_terms"),
                                F.lit(1)).otherwise(F.lit(0))
                         .alias("rel")))
        per = extra_metrics(run, qrels)
        return (per.select("qid",
                           round_half_up(F.col("r_prec"), 6)
                           .alias("r_prec"),
                           round_half_up(F.col("bpref"), 6)
                           .alias("bpref"))
                .orderBy("qid"))

    def cardinality_terms(spark, sf_dir):
        """ES `cardinality` agg (Lucene HyperLogLogPlusPlus) via the
        deterministic HLL sketch (engine/sketches.py): per query, the
        approximate distinct count of analyzed terms over the matched
        doc set. m=4096 md5-keyed registers, integer register sum —
        the DuckDB oracle replicates the sketch bit-for-bit."""
        from engine.search import cardinality_agg

        idx = _cached_index(spark, sf_dir)
        return cardinality_agg(idx, BM25_QUERIES)

    def hybrid_linear_topk(spark, sf_dir):
        """Score-based hybrid fusion (ES 8.18 `linear` retriever,
        minmax normalizer; CombSUM of Fox & Shaw 1994): per-query
        min-max-normalized BM25 (weight 0.7) + dense cosine (0.3),
        same pairing as hybrid_rrf_topk. Normalization consumes the
        ROUNDED 4dp scores both engines agree on."""
        bm25 = _topk(_bm25_scored(spark, sf_dir, BM25_QUERIES),
                     TOPK + 20).select("qid", "doc_id", "score")
        emb = _emb(spark, sf_dir)
        cos = similarity.cosine_topk(emb, ANN_QUERY_IDS, TOPK + 40)
        rc = round_half_up(F.col("cosine"), 4)
        wv = Window.partitionBy("qid").orderBy(rc.desc(), F.asc("vec_id"))
        cosr = (cos.withColumn("rank", F.row_number().over(wv))
                .where(F.col("rank") <= TOPK + 20))
        pair = spark.createDataFrame(
            [(vid, q) for (q, _), vid in zip(BM25_QUERIES, ANN_QUERY_IDS)],
            "qid long, text_qid string")
        dense = (cosr.join(F.broadcast(pair), "qid")
                 .select(F.col("text_qid").alias("qid"),
                         F.col("vec_id").alias("doc_id"),
                         rc.alias("score")))
        return (fusion.linear_fuse([bm25, dense], weights=[0.7, 0.3],
                                   topk=TOPK)
                .orderBy("qid", "rank"))

    def ann_filtered_topk(spark, sf_dir):
        """Filtered ANN (the ES `knn.filter` contract): IVF search
        restricted to vectors with label % 3 == 0, gated INSIDE the
        probed cells before the rank cut (pre-filter — the top-k of
        the filtered set, not a post-filtered page). Same pinned
        16-cell / 4-probe deterministic k-means as ann_ivf_topk."""
        emb = _emb(spark, sf_dir)
        allowed = emb.where(F.col("label") % 3 == 0).select("vec_id")
        out = similarity.cosine_topk_ivf(emb, ANN_QUERY_IDS, TOPK + 20,
                                         n_centroids=16, n_probe=4,
                                         allowed=allowed)
        rc = round_half_up(F.col("cosine"), 4)
        w = Window.partitionBy("qid").orderBy(rc.desc(), F.asc("vec_id"))
        return (out.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= TOPK)
                .select("qid", "vec_id", rc.alias("cosine"), "rank"))

    def percentiles_dl(spark, sf_dir):
        """ES `percentiles` agg over analyzed doc length with a
        deterministic HDR-style power-of-two bucket sketch (4 mantissa
        bits; midpoint nearest-rank estimates — t-digest's role with
        a merge-order-free state the DuckDB oracle replicates
        exactly)."""
        from engine.search import percentiles_agg

        idx = _cached_index(spark, sf_dir)
        return percentiles_agg(idx, BM25_QUERIES)

    def composite_page2(spark, sf_dir):
        """ES `composite` agg with after-key pagination: (source,
        lang) buckets of the first query's matched set in key order,
        page 2 (the page after the first 5 buckets). The after-key is
        taken from page 1's LAST row regardless of page fullness (the
        exhausted-cursor rule from search_after)."""
        from engine.search import composite_agg

        idx = _cached_index(spark, sf_dir)
        fields = _docs(spark, sf_dir).select("doc_id", "source", "lang")
        q1 = [BM25_QUERIES[0]]
        page1 = composite_agg(idx, q1, fields, ["source", "lang"],
                              5).collect()
        if not page1:
            return composite_agg(idx, q1, fields, ["source", "lang"], 5
                                 ).limit(0)
        last = page1[-1]
        return composite_agg(idx, q1, fields, ["source", "lang"], 5,
                             after=(last["source"], last["lang"]))

    def rescored_topk(spark, sf_dir):
        """Query rescoring (Lucene QueryRescorer / ES `rescore`):
        WAND BM25 selects a top-30 window per query, LMDirichlet
        re-scores ONLY the window pairs (ctf stays collection-wide),
        and the final top-10 ranks 1.0·bm25 + 1.0·lmd — the
        windowed-expensive-scorer recipe."""
        from engine.search import rescore_topk

        idx = _cached_index(spark, sf_dir)
        qt = [(q, t, 1.0) for q, ts in BM25_QUERIES for t in ts]
        return rescore_topk(idx, qt, qt, TOPK, window=30)

    def bpe_merges(spark, sf_dir):
        """BPE subword trainer (Sennrich 2016 learn_bpe semantics,
        engine/pipeline/bpe.py): the rank-ordered merge table with
        deterministic tie-breaks (count desc, pair lexicographic asc).
        min_count=1 so the fixed-round oracle unrolls exactly
        BPE_N_MERGES rounds."""
        from engine.pipeline import bpe

        return bpe.bpe_train(_docs(spark, sf_dir), BPE_N_MERGES,
                             min_count=1, mode="driver").orderBy("rank")

    def bpe_encoded(spark, sf_dir):
        """Corpus token frequencies after encoding with the learned
        merges (sequential rank-order application — exactly the
        training evolution, which is what the oracle replays)."""
        from engine.pipeline import bpe

        docs = _docs(spark, sf_dir)
        merges = bpe.bpe_train(docs, BPE_N_MERGES, min_count=1,
                               mode="driver")
        enc = bpe.bpe_encode(docs, merges)
        return (enc.select(F.explode("tokens").alias("token"))
                .groupBy("token")
                .agg(F.count(F.lit(1)).cast("long").alias("n"))
                .orderBy("token"))

    def highlighted_topk(spark, sf_dir):
        """ES highlight API (engine/highlight.py, plain-highlighter
        shape): BM25 top-k + best-passage snippet per hit — window-
        token slices anchored at match positions, scored by distinct
        matched terms desc / matches desc / start asc, matched tokens
        wrapped in <em></em>. Only the page's qid×k rows re-analyze."""
        from engine.highlight import highlight

        hits = _topk(_bm25_scored(spark, sf_dir, BM25_QUERIES))
        return (highlight(hits, _docs(spark, sf_dir), BM25_QUERIES,
                          window=HL_WINDOW)
                .orderBy("qid", "rank"))

    def term_vectors_docs(spark, sf_dir):
        """ES _termvectors with term_statistics (engine/search.py
        term_vectors): per requested doc, every indexed term with its
        in-doc tf, the doc's analyzed length, and the dictionary df."""
        from engine.search import term_vectors

        idx = _cached_index(spark, sf_dir)
        return term_vectors(idx, TV_DOC_IDS, with_df=True)

    def explain_hits(spark, sf_dir):
        """ES _explain / Lucene Explanation flattened to rows
        (engine/search.py explain_scores): per-term BM25 breakdown
        (tf, dl, df, idf, tf-saturation, weight, contribution) for
        every doc on the WAND top-k page. idf and tf_norm round 6dp
        FIRST, contribution multiplies the rounded values (ln() may
        differ in the last ulp between engines)."""
        from engine.search import explain_scores

        idx = _cached_index(spark, sf_dir)
        qt = [(q, t, 1.0) for q, ts in BM25_QUERIES for t in ts]
        return explain_scores(idx, qt, _wand_topk_query(spark, sf_dir))

    def adjacency_counts(spark, sf_dir):
        """ES adjacency_matrix bucket agg (engine/search.py
        adjacency_matrix_agg): doc counts for each named term filter
        and each pair intersection, ES 'A&B' keys, empty buckets
        omitted; pairs expand in-row from one sorted per-doc
        filter-name array — never a matched x matched self-join."""
        from engine.search import adjacency_matrix_agg

        idx = _cached_index(spark, sf_dir)
        return adjacency_matrix_agg(idx, ADJ_FILTERS)

    def synonym_expand_topk(spark, sf_dir):
        """Query-time WEIGHTED synonym expansion (engine/queryparse.py
        expand_synonyms: each term adds its synonyms at weight x 0.5,
        weights SUM per (qid, term) — ES's boosted search-time synonym
        reading; the sibling synonym_topk entry is the OTHER published
        semantics, Lucene SynonymQuery with blended df) feeding
        weighted-OR BM25; the oracle derives the expansion
        independently in SQL (base UNION synonym join, summed
        weights)."""
        from engine.queryparse import expand_synonyms
        from engine.search import score_exhaustive

        idx = _cached_index(spark, sf_dir)
        qt = expand_synonyms(BM25_QUERIES, SYNONYMS, SYN_WEIGHT)
        res = score_exhaustive(idx, qt, TOPK + 50)
        r = round_half_up(F.col("score"), 4)
        w = Window.partitionBy("qid").orderBy(r.desc(), F.asc("doc_id"))
        return (res.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= TOPK)
                .select("qid", "doc_id", r.alias("score"), "rank")
                .orderBy("qid", "rank"))

    # Dict ORDER is load-bearing: the driver's CORRECTNESS gate checks
    # only the FIRST 50 entries. Round 3 rotates the operators that
    # were outside round 2's window (everything from url_domains
    # through term_range_topk — driver-unverified until now) plus the
    # new ib_topk INTO the window, and moves mechanically-similar
    # entries whose siblings are already driver-green (the five ANN
    # rerank variants, per-row textstats, media geometry) to the tail.
    # The local gate (tools/check_oracles.py) still verifies ALL
    # entries every round.
    # ---- ES geo family (engine/geo.py, NEW r5) -----------------------

    def _events_geo(spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/events.parquet")

    def geo_bbox_hits(spark, sf_dir):
        """ES geo_bounding_box query: pure-comparison filter on the
        deterministic point columns (exact arithmetic, no libm)."""
        from engine import geo

        out = geo.geo_bounding_box(_events_geo(spark, sf_dir), **GEO_BBOX)
        return (out.select("event_id", "event_type",
                           round_half_up(F.col("lat"), 6).alias("lat"),
                           round_half_up(F.col("lon"), 6).alias("lon"))
                .orderBy("event_id"))

    def geo_distance_topk(spark, sf_dir):
        """ES geo_distance query + _geo_distance sort: k nearest
        events within the radius, ranked by the 3 dp-rounded
        haversine distance (libm guard), event_id asc."""
        from engine import geo

        out = geo.geo_distance_query(_events_geo(spark, sf_dir),
                                     *GEO_CENTER_A, GEO_RADIUS_KM,
                                     GEO_TOPK)
        return out.select("event_id", "dist_km", "rank").orderBy("rank")

    def geo_distance_rings(spark, sf_dir):
        """ES geo_distance aggregation: ring buckets over the rounded
        distance with count + micro-unit-exact mean(value)."""
        from engine import geo

        out = geo.geo_distance_rings(_events_geo(spark, sf_dir),
                                     *GEO_CENTER_B, GEO_RING_EDGES)
        return out.orderBy("ring")

    def geohash_grid_cells(spark, sf_dir):
        """ES geohash_grid aggregation: top-N base-32 cells by doc
        count — all-integer bit interleave, exact in both engines."""
        from engine import geo

        out = geo.geohash_grid(_events_geo(spark, sf_dir),
                               GEOHASH_GRID_TOPN,
                               precision=GEOHASH_GRID_PRECISION)
        return out.select("cell", "n", "rank").orderBy("rank")

    def geotile_grid_cells(spark, sf_dir):
        """ES geotile_grid aggregation: doc count per z/x/y
        web-mercator cell (mercator fraction rounded to 9 dp before
        the tile floor — ln/tan libm guard)."""
        from engine import geo

        out = geo.geotile_grid(_events_geo(spark, sf_dir), GEOTILE_ZOOM)
        return out.select("cell", "n").orderBy("cell")

    def geo_bounds_centroid(spark, sf_dir):
        """ES geo_bounds + geo_centroid metric aggs per event_type:
        exact min/max corners + micro-unit-exact centroid."""
        from engine import geo

        out = geo.geo_bounds_centroid(_events_geo(spark, sf_dir))
        return out.orderBy("event_type")

    def geo_polygon_hits(spark, sf_dir):
        """ES geo_polygon query: even-odd integer ray cast against the
        non-convex dart (engine/geo.py point_in_polygon_m) — the
        parity rule bites (78 bbox events sit in the notch and are
        excluded), all-int64, bitwise-equal cross-engine."""
        from engine import geo

        out = geo.geo_polygon(_events_geo(spark, sf_dir), GEO_POLYGON_M)
        return (out.select("event_id", "event_type", "lat_m", "lon_m")
                .orderBy("event_id"))

    def geo_lines(spark, sf_dir):
        """ES geo_line agg: per event_type the (ts, event_id)-ordered
        millidegree track truncated to GEO_LINE_SIZE + the ES
        complete flag; size sits inside the sf0.01 group-size band so
        both the truncated and the complete branch bite
        (engine/geo.py geo_line)."""
        from engine import geo

        out = geo.geo_line(_events_geo(spark, sf_dir), GEO_LINE_SIZE)
        return out.orderBy("event_type")

    def ip_range_counts(spark, sf_dir):
        """ES ip_range bucket agg over the Knuth-mixed client IPs:
        possibly-OVERLAPPING [from, to) ranges as one conditional-agg
        pass + stack unpivot (engine/pipeline/curation.py
        ip_range_agg); the overlap fixture range is why this is not a
        group-by."""
        from engine.pipeline.curation import ip_range_agg

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = ip_range_agg(ev, IP_RANGES)
        return out.orderBy("key")

    def terms_with_other(spark, sf_dir):
        """ES terms agg with the missing parameter + the
        sum_other_doc_count response piece (sentinel '_other_' row):
        size=2 over the 4-bucket marker field, so the missing bucket
        materializes (20 docs), the size cut bites and the other sum
        folds two buckets (171)
        (engine/pipeline/textstats.py terms_agg_with_other)."""
        from engine.pipeline.textstats import terms_agg_with_other

        docs = _docs(spark, sf_dir).select(
            "doc_id", F.nullif(F.regexp_extract(
                "text", MARKER_RE, 1), F.lit("")).alias("marker"))
        out = terms_agg_with_other(docs, "marker",
                                   size=TERMS_OTHER_SIZE)
        return out.orderBy(F.asc_nulls_last("rank"), "key")

    def geo_shape_relations(spark, sf_dir):
        """ES geo_shape query (envelope vs envelope), all four
        spatial relations in ONE conditional-agg pass: count + min
        matching event_id per relation; every relation genuinely
        bites at sf0.01 (engine/geo.py geo_shape_counts)."""
        from engine import geo

        out = geo.geo_shape_counts(_events_geo(spark, sf_dir),
                                   GEO_ENV_Q, GEO_ENV_DW_MOD,
                                   GEO_ENV_DH_MOD)
        return out.orderBy("relation")

    def random_sampler_counts(spark, sf_dir):
        """ES random_sampler agg (8.2+): hash-gated deterministic
        sample (p=0.35), per-type sampled count, 1/p-scaled estimate
        and µu-exact sampled mean
        (engine/pipeline/curation.py random_sampler_agg)."""
        from engine.pipeline.curation import random_sampler_agg

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = random_sampler_agg(ev, RANDOM_SAMPLER_P)
        return out.orderBy("event_type")

    def bucket_trend_corr(spark, sf_dir):
        """ES bucket_correlation pipeline agg (count_correlation vs
        the bucket-index ramp): per-type Pearson r of the hourly
        count series, exact integer moments + one final float
        expression (engine/streaming.py bucket_correlation)."""
        from engine.streaming import bucket_correlation

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return bucket_correlation(ev, window="1 hour")

    def change_points(spark, sf_dir):
        """ES change_point agg (deterministic step_change core): the
        argmax between-group-SS split of each hourly count series,
        integer prefix sums, score rounded before the argmax
        (engine/streaming.py change_point_agg)."""
        from engine.streaming import change_point_agg

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = change_point_agg(ev, window="1 hour")
        return (out.select(
            "event_type", "split_after",
            F.date_format("change_at", "yyyy-MM-dd HH:mm:ss")
            .alias("change_at"), "score", "mean_before",
            "mean_after", "type")
            .orderBy("event_type"))

    def categorized_messages(spark, sf_dir):
        """ES categorize_text agg over the log-like event messages
        (event_type + props): digit-token normalization collapses the
        ~10k distinct messages into a handful of template buckets —
        the branch that IS the operator (engine/pipeline/textstats.py
        categorize_text)."""
        from engine.pipeline.textstats import categorize_text

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        msgs = ev.select(F.concat_ws(" ", "event_type", "props")
                         .alias("msg"))
        out = categorize_text(msgs, text_col="msg", max_tokens=4,
                              top_n=CATEGORIZE_TOPN)
        return out.orderBy("rank")

    def ip_prefix_counts(spark, sf_dir):
        """ES ip_prefix bucket agg over the deterministic per-user
        client IPs (engine/pipeline/curation.py ip_prefix_agg)."""
        from engine.pipeline.curation import ip_prefix_agg

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = ip_prefix_agg(ev, prefix_len=IP_PREFIX_LEN)
        return out.orderBy("prefix")

    def frequent_item_sets(spark, sf_dir):
        """ES frequent_item_sets agg: closed frequent itemsets over
        per-doc distinct token sets, Apriori-mined
        (engine/pipeline/itemsets.py; thresholds chosen so every
        lattice stage bites — see FIS_MIN_SUPPORT)."""
        from engine.pipeline import itemsets

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = itemsets.frequent_item_sets(
            docs, min_support=FIS_MIN_SUPPORT, top_n=FIS_TOPN)
        return out.orderBy("rank")

    def _cust_orders(spark, sf_dir):
        return (spark.read.parquet(f"{sf_dir}/customer.parquet"),
                spark.read.parquet(f"{sf_dir}/orders.parquet"))

    def has_child_topk(spark, sf_dir):
        """ES has_child query (join field): customers ranked by the
        µu-exact SUM of their ≥price-floor orders, min_children
        gated (engine/joinfield.py has_child)."""
        from engine.joinfield import has_child

        cust, orders = _cust_orders(spark, sf_dir)
        out = has_child(
            cust, orders, "c_custkey", "o_custkey",
            F.col("o_totalprice") >= F.lit(HAS_CHILD_PRICE_FLOOR),
            F.floor(F.col("o_totalprice") * F.lit(1e6) + F.lit(0.5)),
            score_mode="sum", min_children=HAS_CHILD_MIN_CHILDREN,
            k=HAS_CHILD_K)
        return out.orderBy("rank")

    def has_parent_hits(spark, sf_dir):
        """ES has_parent query: orders whose customer is a positive-
        balance HAS_PARENT_SEGMENT account, parent score propagated
        (engine/joinfield.py has_parent)."""
        from engine.joinfield import has_parent

        cust, orders = _cust_orders(spark, sf_dir)
        out = has_parent(
            orders, cust, "c_custkey", "o_custkey",
            (F.col("c_mktsegment") == F.lit(HAS_PARENT_SEGMENT))
            & (F.col("c_acctbal") > F.lit(0.0)),
            F.col("c_acctbal"))
        return (out.select("o_orderkey", "o_custkey", "parent_score")
                .orderBy("o_orderkey"))

    def children_by_segment(spark, sf_dir):
        """ES children aggregation: market-segment parent buckets
        switched to order context — child count + µu-exact order
        value sum/avg (engine/joinfield.py children_agg)."""
        from engine.joinfield import children_agg

        cust, orders = _cust_orders(spark, sf_dir)
        out = children_agg(
            cust, orders, "c_custkey", "o_custkey", "c_mktsegment",
            F.floor(F.col("o_totalprice") * F.lit(1e6) + F.lit(0.5)))
        return out.orderBy("c_mktsegment")

    return {
        # ---- driver window (first 50 dict slots) ----
        # r5 rotation (VERDICT r4 item 1, pre-staged in r4): the 26
        # ROTATION_QUEUE entries — the only keys never seen by the
        # hard driver signal (union of CORRECTNESS_r01-r04 green
        # keys) — occupy the front of the window this round. Once
        # CORRECTNESS_r05 lands green, every queries() entry has
        # carried the driver signal at least once.
        "event_window_bucket_script": event_window_bucket_script,
        "event_window_normalize": event_window_normalize,
        "event_value_ranges": event_value_ranges,
        "event_window_rate": event_window_rate,
        "event_window_moving_percentiles": event_window_moving_percentiles,
        "event_window_percentiles_bucket": event_window_percentiles_bucket,
        "constant_score_hits": constant_score_hits,
        "script_scored_topk": script_scored_topk,
        "distance_feature_hits": distance_feature_hits,
        "value_count_missing": value_count_missing,
        "match_bool_prefix": match_bool_prefix,
        "scripted_metric_dl": scripted_metric_dl,
        "fuzzy_osa_topk": fuzzy_osa_topk,
        "pinned_hits": pinned_hits,
        "t_test_dl": t_test_dl,
        "filters_agg_counts": filters_agg_counts,
        "event_window_top_metrics": event_window_top_metrics,
        "event_window_auto_histogram": event_window_auto_histogram,
        "event_window_cum_cardinality": event_window_cum_cardinality,
        "rank_eval": rank_eval,
        "span_within_hits": span_within_hits,
        "span_containing_hits": span_containing_hits,
        "span_or_hits": span_or_hits,
        "sqs_topk": sqs_topk,
        # sqs_flat_or_topk: NEW r5 — the quantized-kernel fast path
        # itself under the driver signal (sqs_topk's mixed tree keeps
        # the tree plan, so it alone would never exercise the kernel
        # path); takes the window slot event_window_pipeline held for
        # an r4-green periodic re-check (now in the tail, unchanged).
        "sqs_flat_or_topk": sqs_flat_or_topk,
        "cross_fields_search": cross_fields_search,
        "event_value_width_histogram": event_value_width_histogram,
        # ---- ES geo family (NEW r5): never driver-checked, so they
        # take window slots per the rotation rule; six r4-green
        # entries (phrase_prefix_hits, extended_stats_dl, fvf_topk,
        # wildcard_trigram_topk, regexp_trigram_topk,
        # event_window_heavy) rotate to the tail to make room.
        "geo_bbox_hits": geo_bbox_hits,
        "geo_distance_topk": geo_distance_topk,
        "geo_distance_rings": geo_distance_rings,
        "geohash_grid_cells": geohash_grid_cells,
        "geotile_grid_cells": geotile_grid_cells,
        "geo_bounds_centroid": geo_bounds_centroid,
        # ---- r5 closing wave (NEW): geo_polygon / geo_line /
        # ip_range — never driver-checked, so in-window per the
        # rotation rule; three more r4-green entries (semdedup_keep,
        # winnow_fps, dsir_sample) slide past the window boundary
        # into the tail.
        "geo_polygon_hits": geo_polygon_hits,
        "geo_lines": geo_lines,
        "ip_range_counts": ip_range_counts,
        # ---- r5 closing wave 2 (NEW): the ES 8 ML-agg family —
        # random_sampler / bucket_correlation / change_point — same
        # rotation rule, three more r4-green entries slide to the
        # tail.
        "terms_with_other": terms_with_other,
        "geo_shape_relations": geo_shape_relations,
        "random_sampler_counts": random_sampler_counts,
        "bucket_trend_corr": bucket_trend_corr,
        "change_points": change_points,
        # ---- ES categorize_text + ip_prefix aggs (NEW r5): same
        # rule — never driver-checked, so in-window; two more
        # r4-green entries (composite_page2, rescored_topk) slide
        # past the window boundary into the tail.
        "categorized_messages": categorized_messages,
        "ip_prefix_counts": ip_prefix_counts,
        "frequent_item_sets": frequent_item_sets,
        "has_child_topk": has_child_topk,
        "has_parent_hits": has_parent_hits,
        "children_by_segment": children_by_segment,
        # remaining 15 window slots: r4-green entries rotating back
        # through (kernel-adjacent paths worth a periodic re-check);
        # each is CORRECTNESS_r04-green so no never-checked entry is
        # displaced.
        "count_matches": count_matches,
        "shared_ngrams": shared_ngrams,
        "facet_counts": facet_counts,
        "url_domains": url_domains,
        "fielded_search": fielded_search,
        "term_range_topk": term_range_topk,
        "event_window_cardinality": event_window_cardinality,
        "ib_topk": ib_topk,
        "semdedup_keep": semdedup_keep,
        "winnow_fps": winnow_fps,
        "dsir_sample": dsir_sample,
        "cardinality_terms": cardinality_terms,
        "hybrid_linear_topk": hybrid_linear_topk,
        "ann_filtered_topk": ann_filtered_topk,
        "percentiles_dl": percentiles_dl,
        "composite_page2": composite_page2,
        "rescored_topk": rescored_topk,
        # ---- driver window boundary (entry 50) ----
        # event_window_pipeline + the six entries below it: r4-green
        # and unchanged — rotated to the tail to make room for
        # sqs_flat_or_topk and the geo family above.
        "event_window_pipeline": event_window_pipeline,
        "phrase_prefix_hits": phrase_prefix_hits,
        "extended_stats_dl": extended_stats_dl,
        "fvf_topk": fvf_topk,
        "wildcard_trigram_topk": wildcard_trigram_topk,
        "regexp_trigram_topk": regexp_trigram_topk,
        "event_window_heavy": event_window_heavy,
        # tail: every entry below is driver-green in some
        # CORRECTNESS_r*.json and unchanged, or certified by an
        # in-window sibling (tests/test_rotation_policy.py enforces it)
        "eval_extra": eval_extra,
        "mlt_text_topk": mlt_text_topk,
        "span_not_hits": span_not_hits,
        "matrix_stats": matrix_stats,
        "percentile_ranks_dl": percentile_ranks_dl,
        # rank_feature_topk: code path CHANGED r5 (bounded-additive-
        # feature WAND kernel) while driver-green from r4 — stays in
        # the tail per the rotation rule because the change carries
        # rank-identity equivalence tests vs the old exhaustive path
        # (tests/test_round5_kernel.py, incl. forced multi-shard) AND
        # its in-window sibling distance_feature_hits exercises the
        # exact same kernel path under the driver signal this round.
        "rank_feature_topk": rank_feature_topk,
        "string_stats_dl": string_stats_dl,
        "event_window_bucket_stats": event_window_bucket_stats,
        "event_window_moving": event_window_moving,
        "rare_terms": rare_terms,
        "sampler_lang": sampler_lang,
        "diversified_sampler_lang": diversified_sampler_lang,
        "significant_text_topn": significant_text_topn,
        "boosting_topk": boosting_topk,
        "terms_set_topk": terms_set_topk,
        "weighted_avg_dl": weighted_avg_dl,
        "boxplot_dl": boxplot_dl,
        "mad_dl": mad_dl,
        "multi_terms_buckets": multi_terms_buckets,
        "bpe_merges": bpe_merges,
        "bpe_encoded": bpe_encoded,
        "highlighted_topk": highlighted_topk,
        "term_vectors_docs": term_vectors_docs,
        "explain_hits": explain_hits,
        "adjacency_counts": adjacency_counts,
        "synonym_expand_topk": synonym_expand_topk,
        "fuzzy_topk": fuzzy_topk,
        "suggest_terms": suggest_terms,
        "dismax_topk": dismax_topk,
        "combined_fields_topk": combined_fields_topk,
        # did_you_mean/percolate_hits/deleted_search/resharded_search
        # changed engine paths this round (trigram prune, indexed
        # percolate, selective purge, reshard marker) but rotate out:
        # each is r1-r3 driver-green AND the new path carries an
        # equivalence test vs the old one (trigram-vs-brute,
        # indexed-vs-broadcast percolate, selective-vs-full purge
        # byte-identity, reshard rank-identity)
        "did_you_mean": did_you_mean,
        "percolate_hits": percolate_hits,
        "deleted_search": deleted_search,
        "resharded_search": resharded_search,
        "eval_metrics": eval_metrics,
        "index_wand_topk": index_wand_topk,
        "bm25_topk": bm25_topk,
        "substring_dedup": substring_dedup,
        "nb_quality_scores": nb_quality_scores,
        "lm_perplexity": lm_perplexity,
        "bloom_decontam": bloom_decontam,
        "cms_term_counts": cms_term_counts,
        "dsir_weights": dsir_weights,
        "minhash_near_dups": minhash_near_dups,
        "ann_ivfpq_topk": ann_ivfpq_topk,
        "parsed_query_topk": parsed_query_topk,
        "interval_hits": interval_hits,
        "cluster_sample": cluster_sample,
        "top_hits_by_lang": top_hits_by_lang,
        "wand_lmd_topk": wand_lmd_topk,
        "wand_ib_topk": wand_ib_topk,
        "bm25_lucene_norms_topk": bm25_lucene_norms_topk,
        "semdedup_pairs": semdedup_pairs,
        "hybrid_rrf_topk": hybrid_rrf_topk,
        "collapsed_topk": collapsed_topk,
        "significant_terms": significant_terms,
        "facet_histogram": facet_histogram,
        "synonym_topk": synonym_topk,
        "completion_topk": completion_topk,
        "decayed_topk": decayed_topk,
        "line_dedup": line_dedup,
        "winnow_near_dups": winnow_near_dups,
        "rp_embed": rp_embed,
        "phrase_prefix_topk": phrase_prefix_topk,
        "random_topk": random_topk,
        "curation_report": curation_report,
        "ngram_lm_counts": ngram_lm_counts,
        "pack_layout": pack_layout,
        "wildcard_topk": wildcard_topk,
        "more_like_this": more_like_this,
        "score_explain": score_explain,
        "ascii_fold_tf": ascii_fold_tf,
        "boolean_query_topk": boolean_query_topk,
        "search_after_page2": search_after_page2,
        "boolean_msm_topk": boolean_msm_topk,
        "federated_search": federated_search,
        "fielded_search_wand": fielded_search_wand,
        "term_vectors": term_vectors,
        "collection_stats": collection_stats,
        "field_sorted_topk": field_sorted_topk,
        "regexp_topk": regexp_topk,
        "tokenize_tf": tokenize_tf,
        "bm25_scores_all": bm25_scores_all,
        "boolean_and": boolean_and,
        "event_window_counts": event_window_counts,
        "lmdirichlet_topk": lmdirichlet_topk,
        "expansion_weights": expansion_weights,
        "dedup_exact": dedup_exact,
        "cosine_topk": cosine_topk,
        "ann_buckets": ann_buckets,
        "trec_run": trec_run,
        "embedding_near_dups": embedding_near_dups,
        "phrase_hits": phrase_hits,
        "span_first": span_first,
        "proximity_hits": proximity_hits,
        "filtered_topk": filtered_topk,
        "phrase_topk": phrase_topk,
        "snippets": snippets,
        "pii_scrub": pii_scrub,
        "multimodal_features": multimodal_features,
        "simhash": simhash,
        "ngram_jaccard": ngram_jaccard,
        "ann_ivf_topk": ann_ivf_topk,
        "ann_multiprobe_topk": ann_multiprobe_topk,
        "ann_pq_topk": ann_pq_topk,
        "ann_rocchio_topk": ann_rocchio_topk,
        "token_counts": token_counts,
        "quality_scores": quality_scores,
        "lang_id": lang_id,
        "fingerprints": fingerprints,
        "media_resize_plan": media_resize_plan,
        "media_frames": media_frames,
        "dedup_keep": dedup_keep,
        "tfidf_top_terms": tfidf_top_terms,
        "dedup_components": dedup_components,
        "pmi_bigrams": pmi_bigrams,
        "unigram_logprob": unigram_logprob,
        "source_mix": source_mix,
        "prefix_topk": prefix_topk,
        "decontam_report": decontam_report,
        "repetition_scores": repetition_scores,
        "mixture_sample": mixture_sample,
        "doc_lengths": doc_lengths,
        "term_stats": term_stats,
        "event_sessions": event_sessions,
    }


def oracle_sql() -> dict[str, str]:
    from engine.pipeline.curation import PII_PATTERNS

    clean = duckdb_clean_sql("text")
    stops = duckdb_stoplist_sql()
    fts = _sql_fts_ctes()

    # simple lowercase-alnum tokens (stopwords kept) used by dedup/stats
    raw_tok = ("[x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+')"
               " if x <> '']")

    and_vals = ", ".join(f"('{q}', '{t}')"
                         for q, ts in AND_QUERIES for t in set(ts))
    and_n = ", ".join(f"('{q}', {len(set(ts))})" for q, ts in AND_QUERIES)

    sql: dict[str, str] = {}

    sql["tokenize_tf"] = f"WITH {fts} SELECT doc_id, term, tf FROM tf"
    fold_clean = duckdb_clean_sql(
        "replace(translate(text, 'aeoAEO', 'áèøÀÉØ'), 'th', 'þ')",
        ascii_fold=True)
    sql["ascii_fold_tf"] = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array({fold_clean},
         '[^a-z0-9]+')) AS term
  FROM documents)
SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
WHERE term <> '' AND term NOT IN {stops}
GROUP BY doc_id, term
"""
    sql["doc_lengths"] = f"WITH {fts} SELECT doc_id, dl FROM dl"
    sql["term_stats"] = (
        f"WITH {fts} SELECT term, count(*)::BIGINT AS df, "
        f"sum(tf)::BIGINT AS cf FROM tf GROUP BY term")
    sql["bm25_topk"] = _sql_bm25_topk(BM25_QUERIES, TOPK)
    score = bm25_sql("tf.tf", "dfs.df", "dl.dl", "stats.avgdl", "stats.n")
    r4sum = round_half_up_sql("sum(" + score + ")", 4)
    sql["bm25_scores_all"] = f"""
WITH {fts}
SELECT q.qid, tf.doc_id, {r4sum} AS score
FROM {_sql_values(BM25_QUERIES)}
JOIN tf USING (term) JOIN dfs USING (term)
JOIN dl ON tf.doc_id = dl.doc_id, stats
GROUP BY q.qid, tf.doc_id
"""
    sql["boolean_and"] = f"""
WITH {fts},
q(qid, term) AS (VALUES {and_vals}),
nt(qid, n_terms) AS (VALUES {and_n})
SELECT q.qid, tf.doc_id
FROM q JOIN tf USING (term)
GROUP BY q.qid, tf.doc_id
HAVING count(DISTINCT tf.term) = (SELECT n_terms FROM nt WHERE nt.qid = q.qid)
"""
    # the index-backed WAND path must equal the pure-SQL BM25 oracle
    sql["index_wand_topk"] = _sql_bm25_topk(BM25_QUERIES, TOPK)
    # bucketing is physical: the resharded index answers the same SQL
    sql["resharded_search"] = _sql_bm25_topk(BM25_QUERIES, TOPK)

    # LMDirichlet: ctf = Σ tf per term, C = Σ dl; formula in lmd_sql
    # mirrors engine/scoring.py lmd_col expression-for-expression
    lmd = lmd_sql("tf.tf", "ctfs.ctf", "dl.dl", "coll.c")
    r4lmd = round_half_up_sql("s", 4)
    sql["lmdirichlet_topk"] = f"""
WITH {fts},
ctfs AS (SELECT term, sum(tf)::DOUBLE AS ctf FROM tf GROUP BY term),
coll AS (SELECT sum(dl)::DOUBLE AS c FROM dl),
matched AS (
  SELECT q.qid, tf.doc_id, sum({lmd}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN ctfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, coll
  GROUP BY q.qid, tf.doc_id)
SELECT qid, doc_id, {r4lmd} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4lmd} DESC, doc_id)::INT AS rank
  FROM matched) t
WHERE rank <= {TOPK}
"""

    # IB (LL·DF·H2): formula in ib_sql mirrors engine/scoring.py
    # ib_col expression-for-expression (same fts stats as BM25)
    ib = ib_sql("tf.tf", "dfs.df", "dl.dl", "stats.avgdl", "stats.n")
    r4ib = round_half_up_sql("s", 4)
    sql["ib_topk"] = f"""
WITH {fts},
matched AS (
  SELECT q.qid, tf.doc_id, sum({ib}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id)
SELECT qid, doc_id, {r4ib} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4ib} DESC, doc_id)::INT AS rank
  FROM matched) t
WHERE rank <= {TOPK}
"""
    # the generalized-kernel WAND paths must equal the SAME oracles as
    # their exhaustive scorers (rank identity is the claim)
    sql["wand_lmd_topk"] = sql["lmdirichlet_topk"]
    sql["wand_ib_topk"] = sql["ib_topk"]

    # --- rescored_topk (QueryRescorer window: BM25 top-30 + LMD) ------------
    # Window membership by rounded BM25 rank <= 30; LMD rescore scores
    # rounded before the 1.0/1.0 combine; ctf/C stay collection-wide.
    sql["rescored_topk"] = f"""
WITH {fts},
ctfs AS (SELECT term, sum(tf)::DOUBLE AS ctf FROM tf GROUP BY term),
coll AS (SELECT sum(dl)::DOUBLE AS c FROM dl),
m1 AS (
  SELECT q.qid, tf.doc_id, sum({score}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id),
win AS (
  SELECT qid, doc_id, s1 FROM (
    SELECT qid, doc_id, {round_half_up_sql('s', 4)} AS s1,
           row_number() OVER (PARTITION BY qid
               ORDER BY {round_half_up_sql('s', 4)} DESC,
                        doc_id)::INT AS rank
    FROM m1) t
  WHERE rank <= 30),
m2 AS (
  SELECT q.qid, tf.doc_id, sum({lmd}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN ctfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, coll
  GROUP BY q.qid, tf.doc_id),
comb AS (
  SELECT w.qid, w.doc_id,
         w.s1 + coalesce({round_half_up_sql('x.s', 4)}, 0.0) AS c
  FROM win w LEFT JOIN m2 x USING (qid, doc_id))
SELECT qid, doc_id, {round_half_up_sql('c', 4)} AS score, rank FROM (
  SELECT qid, doc_id, c,
         row_number() OVER (PARTITION BY qid
             ORDER BY {round_half_up_sql('c', 4)} DESC, doc_id)::INT AS rank
  FROM comb) t
WHERE rank <= {TOPK}
ORDER BY qid, rank
"""

    # BM25 under Lucene's SmallFloat 1-byte norms: same plan as
    # bm25_topk with dl routed through the byte4 roundtrip
    from engine.scoring import lucene_norm_dl_sql
    score_ln = bm25_sql("tf.tf", "dfs.df", lucene_norm_dl_sql("dl.dl"),
                        "stats.avgdl", "stats.n")
    r4ln = round_half_up_sql("s", 4)
    sql["bm25_lucene_norms_topk"] = f"""
WITH {fts},
matched AS (
  SELECT q.qid, tf.doc_id, sum({score_ln}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id)
SELECT qid, doc_id, {r4ln} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4ln} DESC, doc_id)::INT AS rank
  FROM matched) t
WHERE rank <= {TOPK}
"""

    # -- curation ops (engine/pipeline/curation.py) --------------------
    r6 = round_half_up_sql
    sql["bloom_decontam"] = f"""
WITH tokd AS (
  SELECT doc_id, {raw_tok} AS t FROM documents),
grams AS (
  SELECT doc_id, list_distinct([array_to_string(t[i:i+4], ' ')
                 for i in generate_series(1, len(t) - 4)]) AS gs
  FROM tokd),
evh AS (SELECT DISTINCT md5(gram) AS h
        FROM (SELECT unnest(gs) AS gram FROM grams WHERE doc_id % 97 = 0)),
evh2 AS (SELECT h,
                ('0x' || substr(md5(h), 1, 8))::BIGINT AS h1,
                (('0x' || substr(md5(h), 9, 8))::BIGINT | 1) AS h2
         FROM evh),
evpos AS (SELECT ((h1 + i * h2) % 131072) AS pos
          FROM evh2, generate_series(0, 3) AS s(i)),
filt AS (SELECT pos // 32 AS word_idx,
                bit_or(1::BIGINT << (pos % 32)::INT) AS bits
         FROM evpos GROUP BY pos // 32),
dg AS (SELECT doc_id, md5(gram) AS h
       FROM (SELECT doc_id, unnest(gs) AS gram FROM grams)),
dk AS (SELECT DISTINCT h FROM dg),
dk2 AS (SELECT h,
               ('0x' || substr(md5(h), 1, 8))::BIGINT AS h1,
               (('0x' || substr(md5(h), 9, 8))::BIGINT | 1) AS h2
        FROM dk),
probes AS (SELECT h, ((h1 + i * h2) % 131072) AS pos
           FROM dk2, generate_series(0, 3) AS s(i)),
member AS (SELECT p.h,
                  min(CASE WHEN (coalesce(f.bits, 0)
                                 & (1::BIGINT << (p.pos % 32)::INT)) <> 0
                           THEN 1 ELSE 0 END) AS allset
           FROM probes p LEFT JOIN filt f ON f.word_idx = p.pos // 32
           GROUP BY p.h),
hits AS (SELECT dg.doc_id, sum(m.allset)::BIGINT AS n_maybe
         FROM dg JOIN member m USING (h) GROUP BY dg.doc_id)
SELECT g.doc_id, len(gs)::BIGINT AS n_grams,
       coalesce(h.n_maybe, 0)::BIGINT AS n_maybe,
       CASE WHEN len(gs) > 0
            THEN {r6("coalesce(h.n_maybe, 0) / len(gs)::DOUBLE", 6)} END
         AS maybe_frac,
       coalesce(CASE WHEN len(gs) > 0
                THEN coalesce(h.n_maybe, 0) / len(gs)::DOUBLE >= 0.05 END,
                FALSE) AS contaminated
FROM grams g LEFT JOIN hits h USING (doc_id)
"""

    es_var = ("(agg.n * agg.sum_sq - agg.sum_dl * agg.sum_dl)::DOUBLE"
              " / (agg.n * agg.n)::DOUBLE")
    sql["extended_stats_dl"] = f"""
WITH {fts},
matched AS (
  SELECT DISTINCT q.qid, tf.doc_id
  FROM {_sql_values(BM25_QUERIES)} JOIN tf USING (term)),
agg AS (
  SELECT qid, count(*)::BIGINT AS n,
         min(dl.dl)::BIGINT AS min_dl, max(dl.dl)::BIGINT AS max_dl,
         sum(dl.dl)::BIGINT AS sum_dl,
         sum(dl.dl * dl.dl)::BIGINT AS sum_sq
  FROM matched JOIN dl USING (doc_id) GROUP BY qid)
SELECT qid, n AS count, min_dl, max_dl, sum_dl, sum_sq,
       {r6("agg.sum_dl::DOUBLE / agg.n", 6)} AS avg_dl,
       {r6(es_var, 6)} AS variance,
       {r6(f"sqrt({es_var})", 6)} AS std_dev
FROM agg
"""

    ms_vxn = "(a.n * a.sxx - a.sx * a.sx)::DOUBLE"
    ms_vyn = "(a.n * a.syy - a.sy * a.sy)::DOUBLE"
    ms_cov = "(a.n * a.sxy - a.sx * a.sy)::DOUBLE"
    sql["matrix_stats"] = f"""
WITH {fts},
matched AS (
  SELECT DISTINCT q.qid, tf.doc_id
  FROM {_sql_values(BM25_QUERIES)} JOIN tf USING (term)),
nc AS (SELECT doc_id, length(text)::BIGINT AS nc FROM documents),
a AS (
  SELECT qid, count(*)::BIGINT AS n,
         sum(dl.dl)::BIGINT AS sx, sum(nc.nc)::BIGINT AS sy,
         sum(dl.dl * dl.dl)::BIGINT AS sxx,
         sum(nc.nc * nc.nc)::BIGINT AS syy,
         sum(dl.dl * nc.nc)::BIGINT AS sxy
  FROM matched JOIN dl USING (doc_id) JOIN nc USING (doc_id)
  GROUP BY qid)
SELECT qid, n AS count,
       {r6("a.sx::DOUBLE / a.n", 6)} AS mean_dl,
       {r6("a.sy::DOUBLE / a.n", 6)} AS mean_chars,
       {r6(f"{ms_vxn} / (a.n * a.n)::DOUBLE", 6)} AS var_dl,
       {r6(f"{ms_vyn} / (a.n * a.n)::DOUBLE", 6)} AS var_chars,
       {r6(f"{ms_cov} / (a.n * a.n)::DOUBLE", 6)} AS cov,
       CASE WHEN {ms_vxn} > 0 AND {ms_vyn} > 0 THEN
         {r6(f"{ms_cov} / (sqrt({ms_vxn}) * sqrt({ms_vyn}))", 6)} END
         AS corr
FROM a
"""
    pr_cols = ",\n         ".join(
        f"sum(CASE WHEN dl.dl <= {v} THEN 1 ELSE 0 END)::BIGINT AS le_{v}"
        for v in PCT_RANK_VALUES)
    pr_parts = "\nUNION ALL\n".join(
        f"SELECT qid, {v}::BIGINT AS value, "
        + r6(f"le_{v}::DOUBLE * 100.0 / n", 6) + " AS pct_rank FROM a"
        for v in sorted(PCT_RANK_VALUES))
    sql["percentile_ranks_dl"] = f"""
WITH {fts},
matched AS (
  SELECT DISTINCT q.qid, tf.doc_id
  FROM {_sql_values(BM25_QUERIES)} JOIN tf USING (term)),
a AS (
  SELECT qid, count(*)::BIGINT AS n,
         {pr_cols}
  FROM matched JOIN dl USING (doc_id) GROUP BY qid)
{pr_parts}
"""
    fvf_score = bm25_sql("tf.tf", "dfs.df", "dl.dl", "stats.avgdl",
                         "stats.n")
    fvf_factor = r6("ln(dl.dl + 1.0)", 6)
    fvf_r4 = round_half_up_sql(f"s * {fvf_factor}", 4)
    sql["fvf_topk"] = f"""
WITH {fts},
matched AS (
  SELECT q.qid, tf.doc_id, sum({fvf_score}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id)
SELECT qid, doc_id, score, rank FROM (
  SELECT m.qid, m.doc_id, {fvf_r4} AS score,
         row_number() OVER (PARTITION BY m.qid
             ORDER BY {fvf_r4} DESC, m.doc_id)::INT AS rank
  FROM matched m JOIN dl ON m.doc_id = dl.doc_id) t
WHERE rank <= {TOPK}
"""

    rf_term = r6(f"{RF_BOOST} * (nc.nc / (nc.nc + {RF_PIVOT}))", 6)
    rf_r4 = round_half_up_sql(f"s + {rf_term}", 4)
    sql["rank_feature_topk"] = f"""
WITH {fts},
nc AS (SELECT doc_id, length(text)::DOUBLE AS nc FROM documents),
matched AS (
  SELECT q.qid, tf.doc_id, sum({fvf_score}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id)
SELECT qid, doc_id, score, rank FROM (
  SELECT m.qid, m.doc_id, {rf_r4} AS score,
         row_number() OVER (PARTITION BY m.qid
             ORDER BY {rf_r4} DESC, m.doc_id)::INT AS rank
  FROM matched m JOIN nc ON m.doc_id = nc.doc_id) t
WHERE rank <= {TOPK}
"""

    sql["constant_score_hits"] = f"""
WITH {fts},
matched AS (
  SELECT DISTINCT q.qid, tf.doc_id
  FROM {_sql_values(BM25_QUERIES)} JOIN tf USING (term))
SELECT qid, doc_id, {CS_BOOST!r}::DOUBLE AS score, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY doc_id)::INT
           AS rank
  FROM matched) t
WHERE rank <= {TOPK}
"""
    _ss_fs = round_half_up_sql("m.s + ln(1 + dl.dl) / 10", 4)
    sql["script_scored_topk"] = f"""
WITH {fts},
matched AS (
  SELECT q.qid, tf.doc_id, sum({score}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id),
gated AS (
  SELECT m.qid, m.doc_id, {_ss_fs} AS fs
  FROM matched m JOIN dl ON m.doc_id = dl.doc_id
  WHERE {_ss_fs} >= {SS_MIN!r})
SELECT qid, doc_id, fs AS score, rank FROM (
  SELECT qid, doc_id, fs,
         row_number() OVER (PARTITION BY qid
             ORDER BY fs DESC, doc_id)::INT AS rank
  FROM gated) t
WHERE rank <= {TOPK}
"""
    _df_term = round_half_up_sql(
        f"{DF_BOOST!r} * {DF_PIVOT!r} / "
        f"({DF_PIVOT!r} + abs(nc.nc - {DF_ORIGIN!r}))", 6)
    _df_fs = round_half_up_sql(f"m.s + {_df_term}", 4)
    sql["distance_feature_hits"] = f"""
WITH {fts},
nc AS (SELECT doc_id, length(text)::DOUBLE AS nc FROM documents),
matched AS (
  SELECT q.qid, tf.doc_id, sum({score}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id)
SELECT qid, doc_id, fs AS score, rank FROM (
  SELECT m.qid, m.doc_id, {_df_fs} AS fs,
         row_number() OVER (PARTITION BY m.qid
             ORDER BY {_df_fs} DESC, m.doc_id)::INT AS rank
  FROM matched m JOIN nc ON m.doc_id = nc.doc_id) t
WHERE rank <= {TOPK}
"""
    sql["value_count_missing"] = f"""
WITH {fts},
matched AS (
  SELECT DISTINCT q.qid, tf.doc_id
  FROM {_sql_values(BM25_QUERIES)} JOIN tf USING (term)),
allm AS (
  SELECT qid, doc_id FROM matched
  UNION ALL SELECT '_global' AS qid, doc_id FROM documents),
fld AS (
  SELECT doc_id,
         nullif(regexp_extract(text,
             '\\b(customer|vector|stream)\\b', 1), '') AS marker
  FROM documents)
SELECT a.qid, count(*)::BIGINT AS n_docs,
       count(f.marker)::BIGINT AS value_count,
       sum(CASE WHEN f.marker IS NULL THEN 1 ELSE 0 END)::BIGINT
         AS missing
FROM allm a LEFT JOIN fld f USING (doc_id)
GROUP BY a.qid ORDER BY a.qid
"""
    from engine.analysis import tokenize_texts as _mbp_tok
    _mbp_terms, _mbp_prefs = [], []
    for _q, _text in MBP_QUERIES:
        _toks = _mbp_tok([_text])[0]
        if not _toks:
            continue
        _mbp_prefs.append((_q, _toks[-1]))
        _w: dict = {}
        for _t in _toks[:-1]:
            _w[_t] = _w.get(_t, 0.0) + 1.0
        _mbp_terms += [(_q, _t, _wt) for _t, _wt in sorted(_w.items())]
    _tq_vals = ", ".join(f"('{q}', '{t}', {w!r})"
                         for q, t, w in _mbp_terms)
    _pq_vals = ", ".join(f"('{q}', '{p}')" for q, p in _mbp_prefs)
    _mbp_r4 = round_half_up_sql(
        "coalesce(ts.s_term, 0) + CASE WHEN ps.doc_id IS NOT NULL "
        "THEN 1.0 ELSE 0 END", 4)
    sql["match_bool_prefix"] = f"""
WITH {fts},
tq(qid, term, wt) AS (VALUES {_tq_vals}),
pq(qid, prefix) AS (VALUES {_pq_vals}),
ts AS (
  SELECT tq.qid, tf.doc_id, sum(wt * {score}) AS s_term
  FROM tq JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY tq.qid, tf.doc_id),
ps AS (
  SELECT DISTINCT pq.qid, tf.doc_id
  FROM pq JOIN tf ON tf.term LIKE pq.prefix || '%')
SELECT qid, doc_id, score, rank FROM (
  SELECT coalesce(ts.qid, ps.qid) AS qid,
         coalesce(ts.doc_id, ps.doc_id) AS doc_id,
         {_mbp_r4} AS score,
         row_number() OVER (PARTITION BY coalesce(ts.qid, ps.qid)
             ORDER BY {_mbp_r4} DESC,
                      coalesce(ts.doc_id, ps.doc_id))::INT AS rank
  FROM ts FULL OUTER JOIN ps
    ON ts.qid = ps.qid AND ts.doc_id = ps.doc_id) t
WHERE rank <= {TOPK}
"""
    sql["scripted_metric_dl"] = f"""
WITH {fts},
ncl AS (SELECT doc_id, length(text)::BIGINT AS nc FROM documents),
matched AS (
  SELECT DISTINCT q.qid, tf.doc_id
  FROM {_sql_values(BM25_QUERIES)} JOIN tf USING (term)),
rows_m AS (
  SELECT m.qid, (dl.dl * ncl.nc)::DECIMAL(38,9) AS mval
  FROM matched m JOIN dl ON m.doc_id = dl.doc_id
  JOIN ncl ON m.doc_id = ncl.doc_id),
agg AS (
  SELECT qid, count(*)::BIGINT AS n_docs, sum(mval) AS st
  FROM rows_m GROUP BY qid)
SELECT qid, n_docs,
       {round_half_up_sql('st::DOUBLE / n_docs', 6)} AS value
FROM agg ORDER BY qid
"""
    _r4s = round_half_up_sql("s", 4)
    _osa_fv = ", ".join(f"('{q}', '{t}')" for q, t in FUZZY_QUERIES)
    _osa_swaps = ("[qf.qterm[1:i-1] || qf.qterm[i+1] || qf.qterm[i] "
                  "|| qf.qterm[i+2:] "
                  "for i in generate_series(1, length(qf.qterm) - 1)]")
    sql["fuzzy_osa_topk"] = f"""
WITH {fts},
qf(qid, qterm) AS (VALUES {_osa_fv}),
matched AS (
  SELECT qf.qid, tf.doc_id, sum({score}) AS s
  FROM qf JOIN tf ON abs(length(tf.term) - length(qf.qterm)) <= 1
                 AND (levenshtein(tf.term, qf.qterm) <= 1
                      OR (length(qf.qterm) >= 2
                          AND length(qf.qterm) = length(tf.term)
                          AND list_contains({_osa_swaps}, tf.term)))
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY qf.qid, tf.doc_id)
SELECT qid, doc_id, {_r4s} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {_r4s} DESC, doc_id)::INT AS rank
  FROM matched) t
WHERE rank <= {TOPK}
"""
    _pin_rows = []
    for _q, _ids in PIN_DOCS:
        _seen = set()
        for _d in _ids:
            if _d not in _seen:
                _seen.add(_d)
                _pin_rows.append((_q, _d, len(_seen)))
    _pin_vals = ", ".join(f"('{q}', {d}, {o})" for q, d, o in _pin_rows)
    sql["pinned_hits"] = f"""
WITH {fts},
matched AS (
  SELECT q.qid, tf.doc_id, sum({score}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id),
pins AS (
  SELECT p.qid, p.doc_id, p.pin_order
  FROM (VALUES {_pin_vals}) AS p(qid, doc_id, pin_order)
  JOIN documents d ON d.doc_id = p.doc_id),
together AS (
  SELECT qid, doc_id, NULL::DOUBLE AS score, pin_order, TRUE AS pinned
  FROM pins
  UNION ALL
  SELECT m.qid, m.doc_id, {_r4s} AS score, NULL::INT, FALSE
  FROM matched m
  WHERE NOT EXISTS (SELECT 1 FROM pins p
                    WHERE p.qid = m.qid AND p.doc_id = m.doc_id))
SELECT qid, doc_id, score, pinned, rank FROM (
  SELECT qid, doc_id, score, pinned,
         row_number() OVER (PARTITION BY qid
             ORDER BY pin_order ASC NULLS LAST,
                      score DESC NULLS LAST, doc_id)::INT AS rank
  FROM together) t
WHERE rank <= {TOPK}
"""
    _tt_qids = ", ".join(f"('{q}')" for q, _, _ in TT_PAIRS)
    _tt_a = ", ".join(f"('{q}', '{t}')" for q, ta, _ in TT_PAIRS
                      for t in ta)
    _tt_b = ", ".join(f"('{q}', '{t}')" for q, _, tb in TT_PAIRS
                      for t in tb)

    def _tt_mom(tag, vals):
        return f"""
h_{tag} AS (
  SELECT DISTINCT v.qid, tf.doc_id
  FROM (VALUES {vals}) AS v(qid, term) JOIN tf USING (term)),
m_{tag} AS (
  SELECT h.qid, count(*)::BIGINT AS n_{tag},
         sum(dl.dl)::BIGINT AS s_{tag},
         sum(dl.dl * dl.dl)::BIGINT AS ss_{tag}
  FROM h_{tag} h JOIN dl ON h.doc_id = dl.doc_id GROUP BY h.qid)"""

    _va = ("((n_a * ss_a - s_a * s_a)::DOUBLE"
           " / (n_a::DOUBLE * (n_a::DOUBLE - 1.0)))")
    _vb = ("((n_b * ss_b - s_b * s_b)::DOUBLE"
           " / (n_b::DOUBLE * (n_b::DOUBLE - 1.0)))")
    _tt_exprs = f"""
CASE WHEN n_a >= 2 THEN {_va} END AS va,
CASE WHEN n_b >= 2 THEN {_vb} END AS vb,
s_a::DOUBLE / n_a::DOUBLE AS ma, s_b::DOUBLE / n_b::DOUBLE AS mb,
n_a::DOUBLE AS dna, n_b::DOUBLE AS dnb"""
    sql["t_test_dl"] = f"""
WITH {fts},
{_tt_mom('a', _tt_a).strip()},
{_tt_mom('b', _tt_b).strip()},
j AS (
  SELECT q.qid,
         coalesce(m_a.n_a, 0) AS n_a, coalesce(m_b.n_b, 0) AS n_b,
         m_a.s_a, m_a.ss_a, m_b.s_b, m_b.ss_b
  FROM (VALUES {_tt_qids}) AS q(qid)
  LEFT JOIN m_a ON m_a.qid = q.qid
  LEFT JOIN m_b ON m_b.qid = q.qid),
e AS (SELECT qid, n_a, n_b, {_tt_exprs} FROM j),
f AS (
  SELECT qid, n_a, n_b, ma, mb,
         va / dna + vb / dnb AS se2,
         (dna - 1.0) * va + (dnb - 1.0) * vb AS spnum,
         dna, dnb, va, vb
  FROM e)
SELECT qid, n_a, n_b,
       {round_half_up_sql('ma', 6)} AS mean_a,
       {round_half_up_sql('mb', 6)} AS mean_b,
       {round_half_up_sql(
           'CASE WHEN se2 > 0 THEN (ma - mb) / sqrt(se2) END', 6)}
         AS t_welch,
       {round_half_up_sql(
           'CASE WHEN se2 > 0 THEN (se2 * se2) / '
           '((va / dna) * (va / dna) / (dna - 1.0) + '
           '(vb / dnb) * (vb / dnb) / (dnb - 1.0)) END', 6)}
         AS df_welch,
       {round_half_up_sql(
           'CASE WHEN spnum / (dna + dnb - 2.0) > 0 THEN (ma - mb) / '
           'sqrt((spnum / (dna + dnb - 2.0)) * '
           '(1.0 / dna + 1.0 / dnb)) END', 6)}
         AS t_pooled
FROM f ORDER BY qid
"""
    _flt_vals = ", ".join(f"('{k}', '{t}', {i})"
                          for i, (k, ts) in enumerate(FILTERS_BUCKETS)
                          for t in ts)
    _flt_keys = ", ".join(f"('{k}', {i})"
                          for i, (k, _) in enumerate(FILTERS_BUCKETS))
    sql["filters_agg_counts"] = f"""
WITH {fts},
fv(key, term, i) AS (VALUES {_flt_vals}),
hits AS (
  SELECT DISTINCT fv.key, fv.i, tf.doc_id
  FROM fv JOIN tf USING (term)),
per AS (
  SELECT key, i, count(*)::BIGINT AS n_docs,
         sum(dl.dl)::BIGINT AS dl_sum
  FROM hits JOIN dl USING (doc_id) GROUP BY key, i),
named AS (
  SELECT k.key, k.i, coalesce(per.n_docs, 0)::BIGINT AS n_docs,
         coalesce(per.dl_sum, 0)::BIGINT AS dl_sum
  FROM (VALUES {_flt_keys}) AS k(key, i)
  LEFT JOIN per ON per.key = k.key),
uni AS (SELECT DISTINCT doc_id FROM hits),
oth AS (
  SELECT '_other_' AS key, {len(FILTERS_BUCKETS)} AS i,
         ((SELECT count(*) FROM documents)
          - (SELECT count(*) FROM uni))::BIGINT AS n_docs,
         ((SELECT sum(dl) FROM dl)
          - coalesce((SELECT sum(dl.dl) FROM uni
                      JOIN dl USING (doc_id)), 0))::BIGINT AS dl_sum),
allb AS (SELECT * FROM named UNION ALL SELECT * FROM oth)
SELECT key, n_docs,
       {round_half_up_sql(
           'CASE WHEN n_docs > 0 THEN dl_sum::DOUBLE / n_docs::DOUBLE '
           'END', 6)} AS avg_dl
FROM allb ORDER BY i
"""
    sql["event_window_top_metrics"] = f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       event_type, pos, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       value
FROM (
  SELECT ts, event_type, value,
         row_number() OVER (PARTITION BY date_trunc('hour', ts),
                                         event_type
             ORDER BY ts DESC, value DESC)::INT AS pos
  FROM events) t
WHERE pos <= {TM_SIZE}
ORDER BY event_type, window_start, pos
"""
    from engine.streaming import AUTO_HISTOGRAM_LADDER as _LADDER
    _ah_sec = "CASE " + " ".join(
        f"WHEN mx // {s_} - mn // {s_} + 1 <= {AH_TARGET} THEN {s_}"
        for _, s_ in _LADDER[:-1]) + f" ELSE {_LADDER[-1][1]} END"
    _ah_lab = "CASE " + " ".join(
        f"WHEN mx // {s_} - mn // {s_} + 1 <= {AH_TARGET} "
        f"THEN '{lab}'" for lab, s_ in _LADDER[:-1]) \
        + f" ELSE '{_LADDER[-1][0]}' END"
    sql["event_window_auto_histogram"] = f"""
WITH mm AS (
  SELECT min(epoch_us(ts) // 1000000)::BIGINT AS mn,
         max(epoch_us(ts) // 1000000)::BIGINT AS mx
  FROM events),
lad AS (SELECT ({_ah_sec}) AS sec, ({_ah_lab}) AS lab FROM mm)
SELECT strftime(to_timestamp(((epoch_us(ts) // 1000000) // sec) * sec),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       lab AS interval, count(*)::BIGINT AS n
FROM events, lad
GROUP BY 1, 2 ORDER BY 1
"""
    sql["event_window_cum_cardinality"] = """
WITH vals AS (
  SELECT date_trunc('hour', ts) AS ws, user_id AS value FROM events),
hx AS (SELECT ws, ('0x'||substr(md5(value::VARCHAR),1,8))::BIGINT AS h32
       FROM vals WHERE value IS NOT NULL),
reg AS (SELECT ws, h32 >> 20 AS register,
         max(CASE WHEN (h32 & 1048575) = 0 THEN 21
                  ELSE 21 - length(bin(h32 & 1048575)) END) AS rho
        FROM hx GROUP BY ws, register),
wins AS (SELECT DISTINCT ws FROM reg),
cum AS (
  SELECT w.ws, r.register, max(r.rho) AS rho
  FROM wins w JOIN reg r ON r.ws <= w.ws
  GROUP BY w.ws, r.register),
agg AS (SELECT ws, count(*)::BIGINT AS occ,
               sum(1::BIGINT << (21 - rho))::BIGINT AS s_occ
        FROM cum GROUP BY ws),
es AS (SELECT ws, (4096 - occ)::BIGINT AS v_zero,
        ((0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0 * 2097152.0)
         / (s_occ + (4096 - occ) * 2097152)::DOUBLE AS raw
       FROM agg)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, v_zero,
  (floor((CASE WHEN raw <= 10240.0 AND v_zero > 0
               THEN 4096.0 * ln(4096.0 / v_zero::DOUBLE)
               WHEN raw > 4294967296.0 / 30.0
               THEN -4294967296.0 * ln(1.0 - raw / 4294967296.0)
               ELSE raw END) * 1e4 + 0.5) / 1e4) AS est
FROM es ORDER BY window_start
"""
    sql["decontam_report"] = f"""
WITH tokd AS (
  SELECT doc_id, {raw_tok} AS t FROM documents),
grams AS (
  SELECT doc_id, list_distinct([array_to_string(t[i:i+4], ' ')
                 for i in generate_series(1, len(t) - 4)]) AS gs
  FROM tokd),
ev AS (SELECT DISTINCT unnest(gs) AS gram FROM grams WHERE doc_id % 97 = 0),
ex AS (SELECT doc_id, unnest(gs) AS gram FROM grams),
hits AS (SELECT ex.doc_id, count(*)::BIGINT AS n_hit
         FROM ex JOIN ev USING (gram) GROUP BY ex.doc_id)
SELECT g.doc_id, len(gs)::BIGINT AS n_grams,
       coalesce(h.n_hit, 0)::BIGINT AS n_hit,
       CASE WHEN len(gs) > 0
            THEN {r6("coalesce(h.n_hit, 0) / len(gs)::DOUBLE", 6)} END
         AS hit_frac,
       coalesce(CASE WHEN len(gs) > 0
                THEN coalesce(h.n_hit, 0) / len(gs)::DOUBLE >= 0.05 END,
                FALSE) AS contaminated
FROM grams g LEFT JOIN hits h USING (doc_id)
"""
    sql["repetition_scores"] = f"""
WITH tokd AS (SELECT doc_id, {raw_tok} AS t FROM documents),
g AS (SELECT doc_id,
        [array_to_string(t[i:i+1], ' ')
         for i in generate_series(1, len(t) - 1)] AS g2,
        [array_to_string(t[i:i+2], ' ')
         for i in generate_series(1, len(t) - 2)] AS g3
      FROM tokd),
c2 AS (SELECT doc_id, gg, count(*)::BIGINT AS c
       FROM (SELECT doc_id, unnest(g2) AS gg FROM g) GROUP BY doc_id, gg),
m2 AS (SELECT doc_id, max(c) AS topc, sum(c) AS tot, count(*) AS dist
       FROM c2 GROUP BY doc_id),
c3 AS (SELECT doc_id, gg, count(*)::BIGINT AS c
       FROM (SELECT doc_id, unnest(g3) AS gg FROM g) GROUP BY doc_id, gg),
m3 AS (SELECT doc_id, max(c) AS topc, sum(c) AS tot, count(*) AS dist
       FROM c3 GROUP BY doc_id)
SELECT g.doc_id,
  {r6("coalesce(1.0 - m2.dist / m2.tot::DOUBLE, 0.0)", 6)} AS dup_2gram_frac,
  {r6("coalesce(1.0 - m3.dist / m3.tot::DOUBLE, 0.0)", 6)} AS dup_3gram_frac,
  {r6("coalesce(m2.topc / m2.tot::DOUBLE, 0.0)", 6)} AS top_2gram_frac
FROM g LEFT JOIN m2 USING (doc_id) LEFT JOIN m3 USING (doc_id)
"""
    # wildcard: same scoring shape as prefix_topk, LIKE-matched terms
    from engine.search import wildcard_to_like
    score = bm25_sql("tf.tf", "dfs.df", "dl.dl", "stats.avgdl", "stats.n")
    r4 = round_half_up_sql("s", 4)
    wv = ", ".join(f"('{q}', '{wildcard_to_like(p)}')"
                   for q, p in WILDCARD_QUERIES)
    sql["wildcard_topk"] = f"""
WITH {fts},
qw(qid, pat) AS (VALUES {wv}),
matched AS (
  SELECT qw.qid, tf.doc_id, sum({score}) AS s
  FROM qw JOIN tf ON tf.term LIKE qw.pat
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY qw.qid, tf.doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM matched) t
WHERE rank <= {TOPK}
"""
    wtv = ", ".join(f"('{q}', '{wildcard_to_like(p)}')"
                    for q, p in WILDCARD_TRIGRAM_QUERIES)
    sql["wildcard_trigram_topk"] = f"""
WITH {fts},
qw(qid, pat) AS (VALUES {wtv}),
matched AS (
  SELECT qw.qid, tf.doc_id, sum({score}) AS s
  FROM qw JOIN tf ON tf.term LIKE qw.pat
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY qw.qid, tf.doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM matched) t
WHERE rank <= {TOPK}
"""
    rtv = ", ".join(f"('{q}', '{p}')" for q, p in REGEXP_TRIGRAM_QUERIES)
    sql["regexp_trigram_topk"] = f"""
WITH {fts},
qr(qid, pat) AS (VALUES {rtv}),
matched AS (
  SELECT qr.qid, tf.doc_id, sum({score}) AS s
  FROM qr JOIN tf ON regexp_matches(tf.term, '^(?:' || qr.pat || ')$')
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY qr.qid, tf.doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM matched) t
WHERE rank <= {TOPK}
"""
    from engine.analysis import tokenize_texts as _tok_texts
    mtv = []
    for _q, _t in MLT_TEXT_QUERIES:
        _cnt = {}
        for _w in _tok_texts([_t])[0]:
            _cnt[_w] = _cnt.get(_w, 0) + 1
        mtv.extend(f"('{_q}', '{_w}', {_c})" for _w, _c in sorted(_cnt.items()))
    sql["mlt_text_topk"] = f"""
WITH {fts},
qtf(qid, term, qf) AS (VALUES {", ".join(mtv)}),
cand AS (
  SELECT q.qid, q.term,
         floor(q.qf * ln(1.0 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
               * 1e6 + 0.5) / 1e6 AS sel_s
  FROM qtf q JOIN dfs USING (term), stats),
sel AS (SELECT qid, term FROM (
  SELECT qid, term, row_number() OVER (PARTITION BY qid
      ORDER BY sel_s DESC, term) AS rn FROM cand)
  WHERE rn <= {MLT_TEXT_TERMS}),
matched AS (
  SELECT sel.qid, tf.doc_id, sum({score}) AS s
  FROM sel JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY sel.qid, tf.doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM matched) t
WHERE rank <= {TOPK}
"""
    idf6 = round_half_up_sql(
        "ln(1.0 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))", 6)
    p6 = round_half_up_sql(score, 6)
    sql["score_explain"] = f"""
WITH {fts}
SELECT q.qid, tf.doc_id, tf.term, 1.0::DOUBLE AS weight,
       tf.tf, dfs.df, dl.dl, {idf6} AS idf, {p6} AS pscore
FROM {_sql_values(BM25_QUERIES)}
JOIN tf USING (term) JOIN dfs USING (term)
JOIN dl ON tf.doc_id = dl.doc_id, stats
WHERE tf.doc_id < 10
"""
    seeds_v = ", ".join(f"({s})" for s in MLT_SEEDS)
    tfidf6 = round_half_up_sql(
        "tf.tf * ln(1.0 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))", 6)
    sql["more_like_this"] = f"""
WITH {fts},
seeds(sid) AS (VALUES {seeds_v}),
interesting AS (
  SELECT sid, term FROM (
    SELECT seeds.sid, tf.term,
           row_number() OVER (PARTITION BY seeds.sid
               ORDER BY {tfidf6} DESC, tf.term) AS rnk
    FROM seeds JOIN tf ON tf.doc_id = seeds.sid
    JOIN dfs USING (term), stats) t
  WHERE rnk <= {MLT_TERMS}),
matched AS (
  SELECT i.sid::VARCHAR AS qid, tf.doc_id, sum({score}) AS s
  FROM interesting i JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  WHERE tf.doc_id <> i.sid
  GROUP BY i.sid, tf.doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM matched) t
WHERE rank <= {TOPK}
"""
    sql["facet_counts"] = f"""
WITH {fts},
hits AS (
  SELECT DISTINCT q.qid, tf.doc_id
  FROM {_sql_values(BM25_QUERIES)} JOIN tf USING (term)),
agg AS (
  SELECT h.qid, d.lang AS value, count(DISTINCT h.doc_id)::BIGINT AS n_docs
  FROM hits h JOIN documents d ON d.doc_id = h.doc_id
  GROUP BY h.qid, d.lang)
SELECT qid, value, n_docs, rank FROM (
  SELECT qid, value, n_docs,
         row_number() OVER (PARTITION BY qid
             ORDER BY n_docs DESC, value)::INT AS rank
  FROM agg) t
WHERE rank <= 3
"""
    _fgp = "(fg.fg_df::DOUBLE / fgn.fg_n::DOUBLE)"
    _bgp = "(dfs.df::DOUBLE / stats.n)"
    jlh6 = round_half_up_sql(f"({_fgp} - {_bgp}) * ({_fgp} / {_bgp})", 6)
    sql["significant_terms"] = f"""
WITH {fts},
hits AS (
  SELECT DISTINCT q.qid, tf.doc_id
  FROM {_sql_values(BM25_QUERIES)} JOIN tf USING (term)),
fgn AS (SELECT qid, count(DISTINCT doc_id)::BIGINT AS fg_n
        FROM hits GROUP BY qid),
fg AS (
  SELECT h.qid, t.term, count(DISTINCT t.doc_id)::BIGINT AS fg_df
  FROM hits h JOIN tf t ON t.doc_id = h.doc_id
  GROUP BY h.qid, t.term),
sc AS (
  SELECT fg.qid, fg.term, fg.fg_df, dfs.df, {jlh6} AS score
  FROM fg JOIN fgn USING (qid) JOIN dfs USING (term), stats
  WHERE {_fgp} > {_bgp})
SELECT qid, term, fg_df, df, score, rank FROM (
  SELECT qid, term, fg_df, df, score,
         row_number() OVER (PARTITION BY qid
             ORDER BY score DESC, term)::INT AS rank
  FROM sc) t
WHERE rank <= {SIGTERMS_N}
ORDER BY qid, rank
"""
    sql["rare_terms"] = f"""
WITH {fts},
hits AS (
  SELECT DISTINCT q.qid, tf.doc_id
  FROM {_sql_values(BM25_QUERIES)} JOIN tf USING (term)),
fg AS (
  SELECT h.qid, t.term, count(DISTINCT t.doc_id)::BIGINT AS fg_df
  FROM hits h JOIN tf t ON t.doc_id = h.doc_id
  GROUP BY h.qid, t.term)
SELECT fg.qid, fg.term, fg.fg_df, dfs.df
FROM fg JOIN dfs USING (term)
WHERE fg.fg_df <= {RARE_MDC}
ORDER BY qid, fg_df, term
"""
    _sampler_score = bm25_sql("tf.tf", "dfs.df", "dl.dl",
                              "stats.avgdl", "stats.n")
    _sampler_ranked = f"""
matched AS (
  SELECT q.qid, tf.doc_id, sum({_sampler_score}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id),
ranked AS (
  SELECT qid, doc_id, {round_half_up_sql('s', 4)} AS rs FROM matched)
""".strip()
    sql["sampler_lang"] = f"""
WITH {fts},
{_sampler_ranked},
sampled AS (
  SELECT qid, doc_id FROM (
    SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
           ORDER BY rs DESC, doc_id) AS rn
    FROM ranked) t
  WHERE rn <= {SAMPLER_SHARD})
SELECT s.qid, d.lang AS value, count(*)::BIGINT AS n_docs
FROM sampled s JOIN documents d USING (doc_id)
GROUP BY s.qid, d.lang
ORDER BY qid, value
"""
    sql["diversified_sampler_lang"] = f"""
WITH {fts},
{_sampler_ranked},
dedup AS (
  SELECT qid, doc_id, rs FROM (
    SELECT qid, doc_id, rs, row_number() OVER (
           PARTITION BY qid, doc_id % {SAMPLER_DEDUP_MOD}
           ORDER BY rs DESC, doc_id) AS dr
    FROM ranked) t
  WHERE dr <= {SAMPLER_MAX_PER}),
sampled AS (
  SELECT qid, doc_id FROM (
    SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
           ORDER BY rs DESC, doc_id) AS rn
    FROM dedup) t
  WHERE rn <= {SAMPLER_SHARD})
SELECT s.qid, d.lang AS value, count(*)::BIGINT AS n_docs
FROM sampled s JOIN documents d USING (doc_id)
GROUP BY s.qid, d.lang
ORDER BY qid, value
"""
    sql["significant_text_topn"] = f"""
WITH {fts},
{_sampler_ranked},
sigsamp AS (
  SELECT qid, doc_id, rn AS srank FROM (
    SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
           ORDER BY rs DESC, doc_id) AS rn
    FROM ranked) t
  WHERE rn <= {SIGTEXT_SHARD}),
samp AS (
  SELECT qid, doc_id FROM (
    SELECT s.qid, s.doc_id, row_number() OVER (
           PARTITION BY s.qid, d.text ORDER BY s.srank) AS dup
    FROM sigsamp s JOIN documents d USING (doc_id)) t
  WHERE dup = 1),
fgn AS (SELECT qid, count(*)::BIGINT AS fg_n FROM samp GROUP BY qid),
fg AS (
  SELECT s.qid, t.term, count(*)::BIGINT AS fg_df
  FROM samp s JOIN tf t ON t.doc_id = s.doc_id
  GROUP BY s.qid, t.term),
sc AS (
  SELECT fg.qid, fg.term, fg.fg_df, dfs.df, {jlh6} AS score
  FROM fg JOIN fgn USING (qid) JOIN dfs USING (term), stats
  WHERE {_fgp} > {_bgp})
SELECT qid, term, fg_df, df, score, rank FROM (
  SELECT qid, term, fg_df, df, score,
         row_number() OVER (PARTITION BY qid
             ORDER BY score DESC, term)::INT AS rank
  FROM sc) t
WHERE rank <= {SIGTERMS_N}
ORDER BY qid, rank
"""
    _boost_pos = [(q, pos) for q, pos, _n in BOOSTING_QUERIES]
    _boost_neg = [(q, neg) for q, _p, neg in BOOSTING_QUERIES if neg]
    sql["boosting_topk"] = f"""
WITH {fts},
matched AS (
  SELECT q.qid, tf.doc_id, sum({_sampler_score}) AS s
  FROM {_sql_values(_boost_pos)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id),
neg AS (
  SELECT DISTINCT n.qid, tf.doc_id
  FROM {_sql_values(_boost_neg).replace('q(qid, term)',
                                        'n(qid, term)')}
  JOIN tf USING (term)),
dem AS (
  SELECT m.qid, m.doc_id,
         CASE WHEN n.doc_id IS NOT NULL THEN m.s * {NEG_BOOST}
              ELSE m.s END AS s
  FROM matched m LEFT JOIN neg n
    ON n.qid = m.qid AND n.doc_id = m.doc_id)
SELECT qid, doc_id, {round_half_up_sql('s', 4)} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {round_half_up_sql('s', 4)} DESC, doc_id)::INT
             AS rank
  FROM dem) t
WHERE rank <= {TOPK}
ORDER BY qid, rank
"""
    sql["terms_set_topk"] = f"""
WITH {fts},
req AS (
  SELECT doc_id, 1 + (n_chars % {TERMS_SET_MOD}) AS required
  FROM documents),
m AS (
  SELECT q.qid, tf.doc_id,
         count(DISTINCT q.term)::BIGINT AS n_matched,
         sum({_sampler_score}) AS s
  FROM {_sql_values(TERMS_SET_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id),
ok AS (
  SELECT m.* FROM m JOIN req USING (doc_id)
  WHERE m.n_matched >= greatest(req.required, 1))
SELECT qid, doc_id, n_matched, {round_half_up_sql('s', 4)} AS score,
       rank FROM (
  SELECT qid, doc_id, n_matched, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {round_half_up_sql('s', 4)} DESC, doc_id)::INT
             AS rank
  FROM ok) t
WHERE rank <= {TOPK}
ORDER BY qid, rank
"""
    _hits_cte = f"""
hits AS (
  SELECT DISTINCT q.qid, tf.doc_id
  FROM {_sql_values(BM25_QUERIES)} JOIN tf USING (term))
""".strip()
    sql["weighted_avg_dl"] = f"""
WITH {fts},
{_hits_cte},
nc AS (SELECT doc_id, length(text)::BIGINT AS nc FROM documents),
a AS (
  SELECT qid, count(*)::BIGINT AS count,
         sum(dl.dl * nc.nc) AS vw, sum(nc.nc) AS wsum
  FROM hits JOIN dl USING (doc_id) JOIN nc USING (doc_id)
  GROUP BY qid)
SELECT qid, count, wsum::BIGINT AS weight_sum,
       {round_half_up_sql('vw::DOUBLE / wsum::DOUBLE', 6)}
       AS weighted_avg
FROM a ORDER BY qid
"""
    sql["boxplot_dl"] = f"""
WITH {fts},
{_hits_cte},
a AS (
  SELECT qid, min(dl.dl)::BIGINT AS min_dl,
         quantile_cont(dl.dl, 0.25) AS q1x,
         quantile_cont(dl.dl, 0.5) AS q2x,
         quantile_cont(dl.dl, 0.75) AS q3x,
         max(dl.dl)::BIGINT AS max_dl
  FROM hits JOIN dl USING (doc_id) GROUP BY qid)
SELECT qid, min_dl, {round_half_up_sql('q1x', 6)} AS q1,
       {round_half_up_sql('q2x', 6)} AS q2,
       {round_half_up_sql('q3x', 6)} AS q3, max_dl
FROM a ORDER BY qid
"""
    sql["mad_dl"] = f"""
WITH {fts},
{_hits_cte},
med AS (
  SELECT qid, quantile_cont(dl.dl, 0.5) AS med
  FROM hits JOIN dl USING (doc_id) GROUP BY qid),
dev AS (
  SELECT h.qid, abs(dl.dl::DOUBLE - med.med) AS adev
  FROM hits h JOIN dl USING (doc_id) JOIN med ON med.qid = h.qid),
a AS (
  SELECT qid, quantile_cont(adev, 0.5) AS madx
  FROM dev GROUP BY qid)
SELECT a.qid, {round_half_up_sql('med.med', 6)} AS median_dl,
       {round_half_up_sql('a.madx', 6)} AS mad
FROM a JOIN med ON med.qid = a.qid ORDER BY a.qid
"""
    sql["string_stats_dl"] = f"""
WITH {fts},
{_hits_cte},
lens AS (
  SELECT h.qid, count(*)::BIGINT AS count,
         min(length(d.text))::BIGINT AS min_length,
         max(length(d.text))::BIGINT AS max_length,
         sum(length(d.text))::BIGINT AS tot
  FROM hits h JOIN documents d USING (doc_id) GROUP BY h.qid),
chars AS (
  SELECT h.qid, unnest(split(d.text, '')) AS ch
  FROM hits h JOIN documents d USING (doc_id)),
cc AS (
  SELECT qid, ch, count(*)::BIGINT AS c FROM chars
  WHERE ch <> '' GROUP BY qid, ch),
tc AS (SELECT qid, sum(c)::BIGINT AS totc FROM cc GROUP BY qid),
ent AS (
  SELECT cc.qid,
         sum(floor(-((cc.c::DOUBLE / tc.totc::DOUBLE) *
                     log2(cc.c::DOUBLE / tc.totc::DOUBLE)) * 1e9
                   + 0.5)::BIGINT) AS msum
  FROM cc JOIN tc ON tc.qid = cc.qid GROUP BY cc.qid)
SELECT l.qid, l.count, l.min_length, l.max_length,
       {round_half_up_sql('l.tot::DOUBLE / l.count::DOUBLE', 6)}
         AS avg_length,
       {round_half_up_sql('e.msum::DOUBLE / 1e9', 6)} AS entropy
FROM lens l JOIN ent e ON e.qid = l.qid ORDER BY l.qid
"""
    sql["multi_terms_buckets"] = f"""
WITH {fts},
{_hits_cte},
a AS (
  SELECT h.qid, d.lang, d.source, count(*)::BIGINT AS n_docs
  FROM hits h JOIN documents d USING (doc_id)
  WHERE d.lang IS NOT NULL AND d.source IS NOT NULL
  GROUP BY h.qid, d.lang, d.source)
SELECT qid, lang, source, n_docs, rank FROM (
  SELECT qid, lang, source, n_docs,
         row_number() OVER (PARTITION BY qid
             ORDER BY n_docs DESC, lang, source)::INT AS rank
  FROM a) t
WHERE rank <= {MULTI_TERMS_N}
ORDER BY qid, rank
"""
    sql["facet_histogram"] = f"""
WITH {fts},
hits AS (
  SELECT DISTINCT q.qid, tf.doc_id
  FROM {_sql_values(BM25_QUERIES)} JOIN tf USING (term)),
bk AS (
  SELECT h.qid,
         ((dl.dl // {HIST_INTERVAL}) * {HIST_INTERVAL})::BIGINT AS bucket
  FROM hits h JOIN dl ON dl.doc_id = h.doc_id)
SELECT qid, bucket, count(*)::BIGINT AS n_docs
FROM bk GROUP BY qid, bucket
ORDER BY qid, bucket
"""
    syn_v = ", ".join(f"('{q}', {gi}, '{t}')"
                      for q, groups in SYNONYM_QUERIES
                      for gi, g in enumerate(groups) for t in sorted(set(g)))
    syn_score = bm25_sql("g.tfs", "gdf.df", "dl.dl", "stats.avgdl", "stats.n")
    sql["synonym_topk"] = f"""
WITH {fts},
syn(qid, gid, term) AS (VALUES {syn_v}),
gdf AS (
  SELECT s.qid, s.gid, max(dfs.df) AS df
  FROM syn s JOIN dfs USING (term) GROUP BY s.qid, s.gid),
gtf AS (
  SELECT s.qid, s.gid, tf.doc_id, sum(tf.tf)::BIGINT AS tfs
  FROM syn s JOIN tf USING (term) GROUP BY s.qid, s.gid, tf.doc_id),
matched AS (
  SELECT g.qid, g.doc_id, sum({syn_score}) AS s
  FROM gtf g JOIN gdf USING (qid, gid)
  JOIN dl ON g.doc_id = dl.doc_id, stats
  GROUP BY g.qid, g.doc_id)
SELECT qid, doc_id, {round_half_up_sql('s', 4)} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {round_half_up_sql('s', 4)} DESC, doc_id)::INT AS rank
  FROM matched) t
WHERE rank <= {TOPK}
ORDER BY qid, rank
"""
    sql["shared_ngrams"] = f"""
WITH tokd AS (SELECT doc_id, {raw_tok} AS t FROM documents),
grams AS (
  SELECT doc_id, list_distinct([array_to_string(t[i:i+9], ' ')
                 for i in generate_series(1, len(t) - 9)]) AS gs
  FROM tokd),
ex AS (SELECT doc_id, unnest(gs) AS gram FROM grams),
pg AS (SELECT gram, count(DISTINCT doc_id) AS n_docs_g FROM ex GROUP BY gram),
per AS (
  SELECT ex.doc_id, count(*)::BIGINT AS n_windows,
         count(CASE WHEN pg.n_docs_g >= 2 THEN 1 END)::BIGINT AS n_shared
  FROM ex JOIN pg USING (gram) GROUP BY ex.doc_id)
SELECT g.doc_id, coalesce(p.n_windows, 0)::BIGINT AS n_windows,
       coalesce(p.n_shared, 0)::BIGINT AS n_shared,
       CASE WHEN coalesce(p.n_windows, 0) > 0
            THEN {round_half_up_sql("p.n_shared / p.n_windows::DOUBLE", 6)}
       END AS shared_frac
FROM grams g LEFT JOIN per p USING (doc_id)
"""
    sql["substring_dedup"] = f"""
WITH tokd AS (SELECT doc_id, {raw_tok} AS t FROM documents),
grams AS (
  SELECT doc_id, t,
         [md5(array_to_string(t[i:i+9], ' '))
          for i in generate_series(1, len(t) - 9)] AS gs
  FROM tokd),
w0 AS (SELECT doc_id,
              unnest([{{'pos': i - 1, 'h': gs[i]}}
                      for i in generate_series(1, len(gs))]) AS u
       FROM grams),
w AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM w0),
own AS (SELECT h, min(doc_id) AS owner FROM w GROUP BY h),
rem0 AS (SELECT w.doc_id,
                unnest([w.pos + j for j in generate_series(0, 9)]) AS rp
         FROM w JOIN own USING (h)
         WHERE own.owner < w.doc_id),
rem AS (SELECT DISTINCT doc_id, rp FROM rem0),
toks0 AS (SELECT doc_id,
                 unnest([{{'pos': i - 1, 'tok': t[i]}}
                         for i in generate_series(1, len(t))]) AS u
          FROM tokd),
toks AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM toks0),
keptagg AS (
  SELECT toks.doc_id,
         string_agg(tok, ' ' ORDER BY pos) AS cleaned_text
  FROM toks LEFT JOIN rem
    ON rem.doc_id = toks.doc_id AND rem.rp = toks.pos
  WHERE rem.rp IS NULL GROUP BY toks.doc_id),
remagg AS (SELECT doc_id, count(*)::BIGINT AS n_removed
           FROM rem GROUP BY doc_id)
SELECT d.doc_id, len(d.t)::BIGINT AS n_tokens,
       coalesce(r.n_removed, 0)::BIGINT AS n_removed,
       k.cleaned_text
FROM tokd d LEFT JOIN remagg r USING (doc_id)
LEFT JOIN keptagg k USING (doc_id)
ORDER BY doc_id
"""
    sql["cms_term_counts"] = f"""
WITH toks AS (SELECT unnest({raw_tok}) AS term FROM documents),
exact AS (SELECT term, count(*)::BIGINT AS cnt FROM toks GROUP BY term),
top AS (SELECT term, cnt FROM (
  SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rn
  FROM exact) WHERE rn <= 20),
regs AS (
  SELECT r, ('0x'||substr(md5(r::VARCHAR || ':' || term),1,8))::BIGINT
             % 1024 AS c, count(*)::BIGINT AS cnt
  FROM toks, generate_series(0, 3) AS g(r) GROUP BY 1, 2),
probes AS (
  SELECT t.term, g.r,
    ('0x'||substr(md5(g.r::VARCHAR || ':' || t.term),1,8))::BIGINT
      % 1024 AS c
  FROM top t, generate_series(0, 3) AS g(r)),
ests AS (
  SELECT p.term, min(coalesce(regs.cnt, 0))::BIGINT AS est
  FROM probes p LEFT JOIN regs ON regs.r = p.r AND regs.c = p.c
  GROUP BY p.term)
SELECT t.term, t.cnt, e.est FROM top t JOIN ests e USING (term)
ORDER BY t.cnt DESC, t.term
"""
    # the identical md5-derived ±1 matrix the Spark op bakes into its
    # plan, inlined as SQL literals; 0.25 = 1/sqrt(16) is exact binary
    from engine.pipeline.similarity import rp_signs as _rp_signs

    _rp_rows = ",\n  ".join(
        f"({j}, {s}::DOUBLE[])" for j, s in enumerate(_rp_signs(64, 16)))
    sql["rp_embed"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
d(dim, sgn) AS (VALUES {_rp_rows})
SELECT e.vec_id AS id, d.dim::INT AS dim,
       {round_half_up_sql('list_dot_product(e.v, d.sgn) * 0.25', 6)}
         AS val
FROM e, d ORDER BY id, dim
"""
    sql["pack_layout"] = f"""
WITH base AS (
  SELECT doc_id, lang AS grp,
         len({raw_tok})::BIGINT AS n_tok
  FROM documents),
off AS (
  SELECT doc_id, grp, n_tok,
         coalesce(sum(n_tok) OVER (PARTITION BY grp ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS tok_start
  FROM base)
SELECT doc_id, grp, n_tok, tok_start,
       (tok_start // 512)::BIGINT AS seq_start,
       ((tok_start + greatest(n_tok - 1, 0)) // 512)::BIGINT AS seq_end,
       ((tok_start + greatest(n_tok - 1, 0)) // 512
        - tok_start // 512 + 1)::BIGINT AS n_seqs
FROM off
"""
    mix_case = " ".join(f"WHEN '{g}' THEN {r}"
                        for g, r in sorted(MIX_RATES.items()))
    sql["mixture_sample"] = f"""
SELECT doc_id, grp, {r6("u", 6)} AS u FROM (
  SELECT doc_id, lang AS grp,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents) t
WHERE u < CASE grp {mix_case} ELSE 1.0 END
"""
    em, ip, ph = (p for _, p, _ in PII_PATTERNS)
    after_em = f"regexp_replace(text, '{em}', '[EMAIL]', 'g')"
    after_ip = f"regexp_replace({after_em}, '{ip}', '[IP]', 'g')"
    after_ph = f"regexp_replace({after_ip}, '{ph}', '[PHONE]', 'g')"
    sql["url_domains"] = r"""
WITH t AS (
  SELECT doc_id,
         text || ' http://d' || (doc_id % 7)::VARCHAR || '.example.com/p'
              || (doc_id % 3)::VARCHAR || ' https://www.site'
              || (doc_id % 5)::VARCHAR || '.org/q' AS text
  FROM documents),
u AS (SELECT doc_id,
             regexp_extract_all(text, 'https?://[a-z0-9._/\-]+') AS urls
      FROM t),
d AS (SELECT doc_id, len(urls)::BIGINT AS n_urls,
             list_sort(list_distinct(
               [regexp_extract(x, 'https?://([a-z0-9.\-]+)', 1)
                for x in urls])) AS doms
      FROM u)
SELECT doc_id, n_urls, array_to_string(doms, ',') AS domains,
       len(list_filter(doms,
           x -> x IN ('d3.example.com', 'www.site2.org'))) > 0 AS blocked
FROM d
"""
    sql["pii_scrub"] = f"""
WITH aug AS (
  SELECT doc_id, text || ' mail u' || doc_id::VARCHAR ||
         '@ex.com ip 10.0.0.' || (doc_id % 256)::VARCHAR AS text
  FROM documents)
SELECT doc_id,
  len(regexp_extract_all(text, '{em}'))::BIGINT AS n_email,
  len(regexp_extract_all({after_em}, '{ip}'))::BIGINT AS n_ipv4,
  len(regexp_extract_all({after_ip}, '{ph}'))::BIGINT AS n_phone,
  md5({after_ph}) AS clean_hash
FROM aug
"""

    sql["phrase_hits"] = _sql_phrase(PHRASE_QUERIES)
    sql["interval_hits"] = _sql_intervals(INTERVAL_QUERIES,
                                          INTERVAL_MAX_GAPS)
    sql["span_not_hits"] = _sql_span_not(SPAN_NOT_QUERIES,
                                         SPAN_NOT_WINDOW)

    th_score = bm25_sql("tf.tf", "dfs.df", "dl.dl", "stats.avgdl", "stats.n")
    th_r4 = round_half_up_sql("s", 4)
    sql["top_hits_by_lang"] = f"""
WITH {fts},
matched AS (
  SELECT q.qid, tf.doc_id, sum({th_score}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id),
vals AS (SELECT m.qid, m.doc_id, m.s, d.lang AS value
         FROM matched m JOIN documents d USING (doc_id)),
b AS (SELECT qid, value, count(*)::BIGINT AS n_docs,
             row_number() OVER (PARTITION BY qid
                 ORDER BY count(*) DESC, value)::INT AS bucket_rank
      FROM vals GROUP BY qid, value),
h AS (SELECT v.qid, v.value, b.n_docs, b.bucket_rank, v.doc_id,
             {th_r4} AS score,
             row_number() OVER (PARTITION BY v.qid, v.value
                 ORDER BY {th_r4} DESC, v.doc_id)::INT AS hit_rank
      FROM vals v JOIN b USING (qid, value)
      WHERE b.bucket_rank <= {TOP_HITS_BUCKETS})
SELECT qid, value, n_docs, bucket_rank, doc_id, score, hit_rank
FROM h WHERE hit_rank <= {TOP_HITS_PER_BUCKET}
"""

    lm_i6 = "floor(ln({x}) * 1e6 + 0.5)::BIGINT"
    lm_ce = round_half_up_sql("-(pd.s::DOUBLE) / (pd.m * 1e6)", 6)
    sql["lm_perplexity"] = f"""
WITH base AS (
  SELECT doc_id, (lang = 'en') AS r, {raw_tok} AS t FROM documents),
rows_ AS (
  SELECT doc_id, r, b.w1 AS w1, b.w2 AS w2
  FROM (SELECT doc_id, r,
               unnest([{{'w1': t[i], 'w2': t[i + 1]}}
                       for i in generate_series(1, len(t) - 1)]) AS b
        FROM base)),
cbi AS (SELECT w1, w2, count(*)::BIGINT AS c FROM rows_ WHERE r
        GROUP BY w1, w2),
cctx AS (SELECT w1, count(*)::BIGINT AS c1 FROM rows_ WHERE r
         GROUP BY w1),
voc AS (SELECT count(DISTINCT tok)::DOUBLE AS v
        FROM (SELECT unnest(t) AS tok FROM base WHERE r)),
j AS (SELECT rows_.doc_id,
        coalesce(
          {lm_i6.format(x="(cbi.c + 1.0) / (cctx.c1 + voc.v)")},
          {lm_i6.format(x="1.0 / (cctx.c1 + voc.v)")},
          {lm_i6.format(x="1.0 / voc.v")}) AS lp
      FROM rows_ LEFT JOIN cbi USING (w1, w2)
      LEFT JOIN cctx USING (w1), voc),
pd AS (SELECT doc_id, count(*)::BIGINT AS m, sum(lp) AS s
       FROM j GROUP BY doc_id),
o AS (SELECT d.doc_id, coalesce(pd.m, 0)::BIGINT AS n_bigrams,
             {lm_ce} AS cross_entropy
      FROM documents d LEFT JOIN pd USING (doc_id))
SELECT doc_id, n_bigrams, cross_entropy,
       (cross_entropy <= {LM_CE_THRESHOLD}) AS keep
FROM o
"""
    sql["phrase_prefix_hits"] = _sql_phrase_prefix(PHRASE_PREFIX_QUERIES)
    sql["phrase_prefix_topk"] = _sql_phrase_prefix_topk(
        PHRASE_PREFIX_QUERIES, TOPK)

    u6 = round_half_up_sql(
        f"(('0x'||substr(md5('{RANDOM_SEED}:' || doc_id::VARCHAR),1,8))"
        f"::BIGINT)::DOUBLE / 4294967296.0", 6)
    sql["random_topk"] = f"""
WITH {fts},
hits AS (
  SELECT DISTINCT q.qid, tf.doc_id
  FROM {_sql_values(BM25_QUERIES)} JOIN tf USING (term)),
scored AS (SELECT qid, doc_id, {u6} AS score FROM hits)
SELECT qid, doc_id, score, rank FROM (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid
             ORDER BY score DESC, doc_id)::INT AS rank
  FROM scored) t
WHERE rank <= {TOPK}
ORDER BY qid, rank
"""

    _FT = 1 << 18
    sql["nb_quality_scores"] = f"""
WITH lab AS (SELECT doc_id, (lang = 'en') AS y, {raw_tok} AS t
             FROM documents),
ftr AS (SELECT doc_id, y,
              ('0x'||substr(md5(unnest(t)),1,8))::BIGINT % {_FT} AS f
        FROM lab),
counts AS (SELECT f,
                  sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS cp,
                  sum(CASE WHEN y THEN 0 ELSE 1 END)::BIGINT AS cn
           FROM ftr GROUP BY f),
tot AS (SELECT
    sum(CASE WHEN y THEN len(t) ELSE 0 END)::DOUBLE AS TP,
    sum(CASE WHEN y THEN 0 ELSE len(t) END)::DOUBLE AS TN,
    sum(CASE WHEN y THEN 1 ELSE 0 END)::DOUBLE AS NP,
    sum(CASE WHEN y THEN 0 ELSE 1 END)::DOUBLE AS NN
  FROM lab),
weights AS (SELECT f,
    floor((ln((cp + 1.0) / (t.TP + {_FT}.0))
           - ln((cn + 1.0) / (t.TN + {_FT}.0))) * 1e6 + 0.5)::BIGINT AS w
  FROM counts, tot t),
ptok AS (SELECT ftr.doc_id,
    coalesce(w.w, (SELECT floor(ln((TN + {_FT}.0) / (TP + {_FT}.0))
                                * 1e6 + 0.5)::BIGINT FROM tot)) AS w
  FROM ftr LEFT JOIN weights w USING (f)),
perdoc AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
                  sum(w)::BIGINT AS sw
           FROM ptok GROUP BY doc_id),
nbbias AS (SELECT floor(ln((NP + 1.0) / (NN + 1.0)) * 1e6 + 0.5)::BIGINT
                  AS b FROM tot)
SELECT l.doc_id,
       coalesce(p.n_tokens, 0)::BIGINT AS n_tokens,
       (floor(((coalesce(p.sw, 0) + nbbias.b)::DOUBLE / 1e6) * 1e4
              + 0.5) / 1e4) AS score,
       ((floor(((coalesce(p.sw, 0) + nbbias.b)::DOUBLE / 1e6) * 1e4
               + 0.5) / 1e4) > 0) AS pred
FROM lab l LEFT JOIN perdoc p USING (doc_id), nbbias
ORDER BY l.doc_id
"""

    # did-you-mean: query positions tokenized with the same python twin
    # of the alnum tokenizer the Spark op uses
    import re as _re

    _dym_rows = []
    for _qid, _text in DYM_QUERIES:
        _toks = [t for t in _re.split("[^a-z0-9]+", _text.lower()) if t]
        for _i, _t in enumerate(_toks):
            _p = f"'{_toks[_i - 1]}'" if _i else "NULL"
            _dym_rows.append(f"('{_qid}', {_i}, '{_t}', {_p})")
    _dym_prevs = sorted({f"'{_toks}'" for _q, _text in DYM_QUERIES
                         for _toks in [t for t in _re.split(
                             "[^a-z0-9]+", _text.lower()) if t][:-1]})
    _prev_in = ", ".join(_dym_prevs) if _dym_prevs else "''"
    _s6 = round_half_up_sql("raw", 6)
    _s4 = round_half_up_sql("sum(s)", 4)
    sql["did_you_mean"] = f"""
WITH tokd AS (SELECT doc_id, {raw_tok} AS t FROM documents),
toksq AS (SELECT unnest(t) AS tok FROM tokd),
uni AS (SELECT tok, count(*)::BIGINT AS c1 FROM toksq GROUP BY tok),
tot AS (SELECT sum(c1)::DOUBLE AS T, count(*)::DOUBLE AS V FROM uni),
bi0 AS (SELECT unnest([{{'p': t[i], 'w': t[i+1]}}
                       for i in generate_series(1, len(t) - 1)]) AS u
        FROM tokd),
bi AS (SELECT u.p AS p, u.w AS w, count(*)::BIGINT AS c2 FROM bi0
       WHERE u.p IN ({_prev_in}) GROUP BY 1, 2),
q(qid, i, orig, prev) AS (VALUES {', '.join(_dym_rows)}),
cand_e AS (
  SELECT q.qid, q.i, q.orig, q.prev, u.tok AS cand,
         levenshtein(u.tok, q.orig)::INT AS distance, u.c1 AS c_cand
  FROM uni u JOIN q
    ON abs(length(u.tok) - length(q.orig)) <= 2
   AND levenshtein(u.tok, q.orig) BETWEEN 1 AND 2),
cand_0 AS (
  SELECT q.qid, q.i, q.orig, q.prev, q.orig AS cand, 0 AS distance,
         coalesce(u.c1, 0) AS c_cand
  FROM q LEFT JOIN uni u ON u.tok = q.orig),
cand AS (SELECT * FROM cand_0 UNION ALL SELECT * FROM cand_e),
ctx AS (SELECT tok AS prev, c1 AS c_prev FROM uni
        WHERE tok IN ({_prev_in})),
sc0 AS (
  SELECT c.qid, c.i, c.cand, c.distance,
         CASE WHEN c.i = 0 OR coalesce(x.c_prev, 0) = 0
              THEN ln((c.c_cand + 1.0) / (t.T + 1.0 * t.V))
              ELSE ln((coalesce(b.c2, 0) + 1.0)
                      / (x.c_prev + 1.0 * t.V)) END AS raw
  FROM cand c
  LEFT JOIN ctx x ON x.prev = c.prev
  LEFT JOIN bi b ON b.p = c.prev AND b.w = c.cand, tot t),
sc AS (SELECT qid, i, cand, distance, {_s6} AS s FROM sc0),
best AS (SELECT * FROM (
  SELECT sc.*, row_number() OVER (PARTITION BY qid, i
      ORDER BY s DESC, distance, cand) AS rn FROM sc) WHERE rn = 1)
SELECT qid, string_agg(cand, ' ' ORDER BY i) AS suggestion,
       sum(CASE WHEN distance > 0 THEN 1 ELSE 0 END)::BIGINT
         AS n_corrected,
       {_s4} AS score
FROM best GROUP BY qid ORDER BY qid
"""
    sql["proximity_hits"] = _sql_proximity(PROX_QUERIES, PROX_WINDOW)
    sql["filtered_topk"] = _sql_bm25_topk(BM25_QUERIES, TOPK,
                                          doc_where="docf.lang = 'en'")
    sql["phrase_topk"] = _sql_phrase_topk(PHRASE_QUERIES, TOPK)

    score = bm25_sql("tf.tf", "dfs.df", "dl.dl", "stats.avgdl", "stats.n")
    r4 = round_half_up_sql("s", 4)
    pv = ", ".join(f"('{q}', '{p}')" for q, p in PREFIX_QUERIES)
    sql["prefix_topk"] = f"""
WITH {fts},
qp(qid, prefix) AS (VALUES {pv}),
matched AS (
  SELECT qp.qid, tf.doc_id, sum({score}) AS s
  FROM qp JOIN tf ON tf.term LIKE qp.prefix || '%'
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY qp.qid, tf.doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM matched) t
WHERE rank <= {TOPK}
"""
    bq_score = ", ".join(f"('{q}', '{t}')" for q, m, s, _n in BOOLEAN_QUERIES
                         for t in sorted(set(m) | set(s)))
    bq_must = ", ".join(f"('{q}', '{t}')" for q, m, _s, _n in BOOLEAN_QUERIES
                        for t in sorted(set(m)))
    bq_not = ", ".join(f"('{q}', '{t}')" for q, _m, _s, n in BOOLEAN_QUERIES
                       for t in sorted(set(n)))
    bq_nm = ", ".join(f"('{q}', {len(set(m))})"
                      for q, m, _s, _n in BOOLEAN_QUERIES)
    sql["boolean_query_topk"] = f"""
WITH {fts},
sq(qid, term) AS (VALUES {bq_score}),
mq(qid, term) AS (VALUES {bq_must}),
nq(qid, term) AS (VALUES {bq_not}),
nm(qid, n_must) AS (VALUES {bq_nm}),
cand AS (SELECT DISTINCT sq.qid, tf.doc_id FROM sq JOIN tf USING (term)),
mhit AS (SELECT mq.qid, tf.doc_id, count(DISTINCT tf.term) AS n_hit
         FROM mq JOIN tf USING (term) GROUP BY mq.qid, tf.doc_id),
elig AS (
  SELECT c.qid, c.doc_id FROM cand c
  JOIN nm ON nm.qid = c.qid
  LEFT JOIN mhit m ON m.qid = c.qid AND m.doc_id = c.doc_id
  WHERE coalesce(m.n_hit, 0) = nm.n_must
    AND NOT EXISTS (SELECT 1 FROM nq JOIN tf t2 USING (term)
                    WHERE nq.qid = c.qid AND t2.doc_id = c.doc_id)),
matched AS (
  SELECT sq.qid, tf.doc_id, sum({score}) AS s
  FROM sq JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY sq.qid, tf.doc_id),
gated AS (SELECT m.* FROM matched m
          JOIN elig e ON e.qid = m.qid AND e.doc_id = m.doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM gated) t
WHERE rank <= {TOPK}
"""
    sql["deleted_search"] = f"""
WITH documents AS (SELECT * FROM main.documents WHERE doc_id % 11 <> 5),
{fts},
matched AS (
  SELECT q.qid, tf.doc_id, sum({score}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM matched) t
WHERE rank <= {TOPK}
"""
    sql["search_after_page2"] = f"""
WITH {fts},
matched AS (
  SELECT q.qid, tf.doc_id, sum({score}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id)
SELECT qid, doc_id, {r4} AS score, (rank - {TOPK})::INT AS rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM matched) t
WHERE rank > {TOPK} AND rank <= {2 * TOPK}
"""
    def _field_ctes(p: str, src: str) -> str:
        """Per-field tokenize/tf/dl/dfs/stats CTEs (prefix ``p``)."""
        return f"""
{p}tok AS (
  SELECT doc_id, unnest(regexp_split_to_array({duckdb_clean_sql('text')},
         '[^a-z0-9]+')) AS term
  FROM {src}),
{p}tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM {p}tok
  WHERE term <> '' AND term NOT IN {stops}
  GROUP BY doc_id, term),
{p}dl AS (
  SELECT d.doc_id, coalesce(sum(t.tf), 0)::BIGINT AS dl
  FROM documents d LEFT JOIN {p}tf t ON d.doc_id = t.doc_id
  GROUP BY d.doc_id),
{p}dfs AS (SELECT term, count(*)::BIGINT AS df FROM {p}tf GROUP BY term),
{p}stats AS (SELECT count(*)::DOUBLE AS n, avg(dl)::DOUBLE AS avgdl
             FROM {p}dl)""".strip()

    tscore = bm25_sql("t.tf", "tdfs.df", "tdl.dl", "tstats.avgdl",
                      "tstats.n")
    bscore = bm25_sql("t.tf", "bdfs.df", "bdl.dl", "bstats.avgdl",
                      "bstats.n")
    sql["fielded_search"] = f"""
WITH tsrc AS (SELECT doc_id,
    array_to_string((regexp_split_to_array(text, '\\s+'))[1:5], ' ')
      AS text FROM documents),
bsrc AS (SELECT doc_id,
    array_to_string((regexp_split_to_array(text, '\\s+'))[6:], ' ')
      AS text FROM documents),
{_field_ctes('t', 'tsrc')},
{_field_ctes('b', 'bsrc')},
tm AS (
  SELECT q.qid, t.doc_id, sum(3.0 * {tscore}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN ttf t USING (term) JOIN tdfs USING (term)
  JOIN tdl ON t.doc_id = tdl.doc_id, tstats
  GROUP BY q.qid, t.doc_id),
bm AS (
  SELECT q.qid, t.doc_id, sum(1.0 * {bscore}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN btf t USING (term) JOIN bdfs USING (term)
  JOIN bdl ON t.doc_id = bdl.doc_id, bstats
  GROUP BY q.qid, t.doc_id),
m AS (SELECT qid, doc_id, sum(s) AS s
      FROM (SELECT * FROM tm UNION ALL SELECT * FROM bm) u
      GROUP BY qid, doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM m) t
WHERE rank <= {TOPK}
"""
    # fielded WAND must equal the SAME oracle as the exhaustive path
    sql["fielded_search_wand"] = sql["fielded_search"]

    # DisMax (best_fields): per-field sums at weight 1.0, then
    # max + tie·(sum − max) over the matching fields per (qid, doc)
    sql["dismax_topk"] = f"""
WITH tsrc AS (SELECT doc_id,
    array_to_string((regexp_split_to_array(text, '\\s+'))[1:5], ' ')
      AS text FROM documents),
bsrc AS (SELECT doc_id,
    array_to_string((regexp_split_to_array(text, '\\s+'))[6:], ' ')
      AS text FROM documents),
{_field_ctes('t', 'tsrc')},
{_field_ctes('b', 'bsrc')},
tm AS (
  SELECT q.qid, t.doc_id, sum(1.0 * {tscore}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN ttf t USING (term) JOIN tdfs USING (term)
  JOIN tdl ON t.doc_id = tdl.doc_id, tstats
  GROUP BY q.qid, t.doc_id),
bm AS (
  SELECT q.qid, t.doc_id, sum(1.0 * {bscore}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN btf t USING (term) JOIN bdfs USING (term)
  JOIN bdl ON t.doc_id = bdl.doc_id, bstats
  GROUP BY q.qid, t.doc_id),
m AS (SELECT qid, doc_id, max(s) + 0.3 * (sum(s) - max(s)) AS s
      FROM (SELECT * FROM tm UNION ALL SELECT * FROM bm) u
      GROUP BY qid, doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM m) t
WHERE rank <= {TOPK}
"""

    # combined_fields (simplified BM25F): merge tf/dl BEFORE
    # saturation (title×2 + body×1), df = any-field doc count
    cf_score = bm25_sql("c.tfc", "cdf.dfc", "cdl.dlc",
                        "cstats.avgdl", "cstats.n")
    sql["combined_fields_topk"] = f"""
WITH tsrc AS (SELECT doc_id,
    array_to_string((regexp_split_to_array(text, '\\s+'))[1:5], ' ')
      AS text FROM documents),
bsrc AS (SELECT doc_id,
    array_to_string((regexp_split_to_array(text, '\\s+'))[6:], ' ')
      AS text FROM documents),
{_field_ctes('t', 'tsrc')},
{_field_ctes('b', 'bsrc')},
ctf AS (
  SELECT term, doc_id, sum(w) AS tfc FROM (
    SELECT term, doc_id, 2.0 * tf AS w FROM ttf
    UNION ALL SELECT term, doc_id, 1.0 * tf FROM btf) u
  GROUP BY term, doc_id),
cdf AS (SELECT term, count(*)::BIGINT AS dfc FROM ctf GROUP BY term),
cdl AS (SELECT t.doc_id, 2.0 * t.dl + 1.0 * b.dl AS dlc
        FROM tdl t JOIN bdl b ON t.doc_id = b.doc_id),
cstats AS (SELECT count(*)::DOUBLE AS n, avg(dlc)::DOUBLE AS avgdl
           FROM cdl),
matched AS (
  SELECT q.qid, c.doc_id, sum({cf_score}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN ctf c USING (term) JOIN cdf USING (term)
  JOIN cdl ON c.doc_id = cdl.doc_id, cstats
  GROUP BY q.qid, c.doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM matched) t
WHERE rank <= {TOPK}
"""

    # completion suggester: dictionary terms under each prefix,
    # df desc then term asc, top-5
    cpl_pv = ", ".join(f"('{q}', '{p}')" for q, p in COMPLETION_QUERIES)
    sql["completion_topk"] = f"""
WITH {fts},
qp(qid, prefix) AS (VALUES {cpl_pv}),
cand AS (SELECT qp.qid, dfs.term, dfs.df
         FROM qp JOIN dfs ON dfs.term LIKE qp.prefix || '%')
SELECT qid, term, df, rank FROM (
  SELECT qid, term, df,
         row_number() OVER (PARTITION BY qid
             ORDER BY df DESC, term)::INT AS rank
  FROM cand) t
WHERE rank <= 5
"""

    # function_score gauss decay on n_chars composed with BM25;
    # the constant replicates engine/fusion.py decay_multiply's
    # python-computed ln(decay)/scale² bit-for-bit
    import math as _math
    gauss_c = repr(_math.log(0.5) / (500.0 * 500.0))
    sql["decayed_topk"] = f"""
WITH {fts},
matched AS (
  SELECT q.qid, tf.doc_id, sum({score}) AS s0
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id),
dec AS (
  SELECT m.qid, m.doc_id,
         m.s0 * exp(greatest(0.0, abs(d.n_chars::DOUBLE - 0.0) - 0.0)
                    * greatest(0.0, abs(d.n_chars::DOUBLE - 0.0) - 0.0)
                    * {gauss_c}) AS s
  FROM matched m JOIN documents d ON m.doc_id = d.doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM dec) t
WHERE rank <= {TOPK}
"""

    # CCNet-style cross-doc duplicate-chunk removal (10-token units)
    sql["line_dedup"] = """
WITH ldtoks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             x -> x <> '') AS t
  FROM documents),
units AS (
  SELECT doc_id, i::INT AS pos,
         array_to_string(list_slice(t, i*10 + 1, i*10 + 10), ' ') AS unit
  FROM ldtoks, unnest(range(0, CAST(ceil(len(t)/10.0) AS BIGINT)))
       AS u(i)),
counts AS (SELECT md5(unit) AS h, count(DISTINCT doc_id) AS nd
           FROM units GROUP BY 1),
kept AS (SELECT u.doc_id, u.pos, u.unit
         FROM units u JOIN counts c ON md5(u.unit) = c.h
         WHERE c.nd < 2),
reb AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
               string_agg(unit, ' ' ORDER BY pos) AS clean
        FROM kept GROUP BY doc_id),
base AS (SELECT d.doc_id, count(u.unit)::BIGINT AS n_units
         FROM documents d LEFT JOIN units u ON d.doc_id = u.doc_id
         GROUP BY d.doc_id)
SELECT b.doc_id, b.n_units,
       (b.n_units - coalesce(r.n_kept, 0))::BIGINT AS n_removed,
       md5(coalesce(r.clean, '')) AS clean_hash
FROM base b LEFT JOIN reb r ON b.doc_id = r.doc_id
ORDER BY b.doc_id
"""

    # MOSS winnowing (k=5 grams, window=4): shared CTE chain for the
    # fingerprint sets and the near-dup pairs
    _winnow_ctes = """
wtoks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
                             '[^a-z0-9]+'), x -> x <> '') AS t
  FROM documents),
grams AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(list_slice(t, i, i + 4), ' ') AS g,
         len(t) - 4 AS ng
  FROM wtoks, unnest(range(1, greatest(len(t) - 4, 0) + 1)) AS u(i)),
gh AS (SELECT doc_id, pos, ng,
              ('0x' || substr(md5(g), 1, 8))::BIGINT AS hv FROM grams),
wm AS (SELECT doc_id, pos, ng,
              min(hv) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS wmin
       FROM gh),
fp AS (SELECT DISTINCT doc_id, wmin AS fp FROM wm
       WHERE pos >= 3 OR pos = ng - 1)
""".strip()
    sql["winnow_fps"] = f"""
WITH {_winnow_ctes}
SELECT doc_id, fp FROM fp ORDER BY doc_id, fp
"""
    # percolation: distinct analyzed doc terms vs the broadcast query
    # store — must count equality, then must_not anti-join
    pm = ", ".join(f"('{q}', '{t}')" for q, m, _ in PERCOLATE_QUERIES
                   for t in sorted(set(m)))
    pn = ", ".join(f"('{q}', {len(set(m))})"
                   for q, m, _ in PERCOLATE_QUERIES)
    px = ", ".join(f"('{q}', '{t}')" for q, _, mn in PERCOLATE_QUERIES
                   for t in sorted(set(mn)))
    sql["percolate_hits"] = f"""
WITH {fts},
dterms AS (SELECT DISTINCT doc_id, term FROM tf),
qm(qid, term) AS (VALUES {pm}),
qn(qid, n_must) AS (VALUES {pn}),
qx(qid, term) AS (VALUES {px}),
hits AS (SELECT d.doc_id, q.qid, count(*) AS c
         FROM qm q JOIN dterms d USING (term) GROUP BY 1, 2),
fullm AS (SELECT h.doc_id, h.qid
          FROM hits h JOIN qn ON h.qid = qn.qid AND h.c = qn.n_must),
bad AS (SELECT DISTINCT d.doc_id, q.qid
        FROM qx q JOIN dterms d USING (term))
SELECT f.doc_id, f.qid FROM fullm f
LEFT JOIN bad b ON f.doc_id = b.doc_id AND f.qid = b.qid
WHERE b.qid IS NULL
ORDER BY f.doc_id, f.qid
"""

    sql["winnow_near_dups"] = f"""
WITH {_winnow_ctes},
sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM fp GROUP BY doc_id),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*)::BIGINT AS shared
          FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
j AS (SELECT doc_a, doc_b, shared,
             shared::DOUBLE / (sa.n + sb.n - shared) AS jac
      FROM pairs JOIN sz sa ON sa.doc_id = doc_a
      JOIN sz sb ON sb.doc_id = doc_b)
SELECT doc_a, doc_b, shared, {round_half_up_sql('jac', 6)} AS jaccard
FROM j WHERE jac >= 0.5 ORDER BY doc_a, doc_b
"""

    sql["federated_search"] = f"""
WITH {fts},
matched AS (
  SELECT q.qid, tf.doc_id, sum({score}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id)
SELECT qid,
       CASE WHEN doc_id >= (SELECT CAST(floor(count(*) / 2) AS BIGINT)
                            FROM documents) THEN 1 ELSE 0 END::INT AS shard,
       doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM matched) t
WHERE rank <= {TOPK}
"""
    qidvals = ", ".join(f"('{q}')" for q, _ in BM25_QUERIES)
    sql["count_matches"] = f"""
WITH {fts},
qs(qid) AS (VALUES {qidvals}),
c AS (SELECT q.qid, count(DISTINCT tf.doc_id)::BIGINT AS n_hits
      FROM {_sql_values(BM25_QUERIES)} JOIN tf USING (term)
      GROUP BY q.qid)
SELECT qs.qid, coalesce(c.n_hits, 0)::BIGINT AS n_hits
FROM qs LEFT JOIN c USING (qid)
"""
    sql["collection_stats"] = f"""
WITH {fts},
tot AS (SELECT coalesce(sum(tf), 0)::BIGINT AS total_tokens FROM tf),
nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
SELECT nd.n_docs, tot.total_tokens,
       (floor(tot.total_tokens::DOUBLE / nd.n_docs * 1e6 + 0.5) / 1e6)
         AS avgdl,
       (SELECT count(*) FROM dfs)::BIGINT AS vocab_size,
       (SELECT coalesce(sum(df), 0) FROM dfs)::BIGINT AS total_postings
FROM nd, tot
"""
    sql["field_sorted_topk"] = f"""
WITH {fts},
hits AS (SELECT DISTINCT q.qid, tf.doc_id
         FROM {_sql_values(BM25_QUERIES)} JOIN tf USING (term))
SELECT qid, doc_id, sort_key, rank FROM (
  SELECT h.qid, h.doc_id, d.n_chars AS sort_key,
         row_number() OVER (PARTITION BY h.qid
             ORDER BY d.n_chars DESC, h.doc_id)::INT AS rank
  FROM hits h JOIN documents d USING (doc_id)) t
WHERE rank <= {TOPK}
"""
    spv = ", ".join(f"('{q}', '{t}', {lim})"
                    for q, t, lim in SPANFIRST_QUERIES)
    sql["span_first"] = f"""
WITH {_sql_positions_ctes()},
qv(qid, term, lim) AS (VALUES {spv}),
fp AS (SELECT qv.qid, pt.doc_id, qv.lim, min(pt.pos)::BIGINT AS first_pos
       FROM qv JOIN pt USING (term)
       GROUP BY qv.qid, pt.doc_id, qv.lim)
SELECT qid, doc_id, first_pos FROM fp WHERE first_pos + 1 <= lim
"""
    from engine.positions import analyze_phrase as _ap
    pq_ph = _ap("merge sort")
    phv = ", ".join(f"('{t}', {off})" for t, off in pq_ph)
    sql["parsed_query_topk"] = f"""
WITH {fts},
{_sql_positions_ctes()},
pq(term, off) AS (VALUES {phv}),
pa AS (SELECT p.doc_id, p.pos - pq.off AS anchor, pq.off
       FROM pq JOIN pt p USING (term) WHERE p.pos - pq.off >= 0),
ph AS (SELECT DISTINCT doc_id FROM (
         SELECT doc_id, anchor, count(DISTINCT off) AS c
         FROM pa GROUP BY 1, 2) g WHERE c = {len(pq_ph)}),
sq AS (
  SELECT 'pq1' AS qid, unnest(['merge', 'sort']) AS term
  UNION ALL SELECT 'pq2', term FROM dfs WHERE term LIKE 'mer%'
  UNION ALL SELECT 'pq2', 'table'
  UNION ALL SELECT 'pq3', unnest(['merge', 'sort', 'fast'])),
sqd AS (SELECT DISTINCT qid, term FROM sq),
matched AS (
  SELECT q2.qid, tf.doc_id, sum({score}) AS s
  FROM sqd q2 JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q2.qid, tf.doc_id),
gated AS (
  SELECT m.* FROM matched m
  WHERE (m.qid = 'pq1'
         AND m.doc_id IN (SELECT doc_id FROM tf WHERE term = 'merge')
         AND m.doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'hash'))
     OR m.qid = 'pq2'
     OR (m.qid = 'pq3' AND m.doc_id IN (SELECT doc_id FROM ph)))
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM gated) t
WHERE rank <= {TOPK}
"""
    bq_should = ", ".join(f"('{q}', '{t}')" for q, _m, s, _n in BOOLEAN_QUERIES
                          for t in sorted(set(s)))
    sql["boolean_msm_topk"] = f"""
WITH {fts},
sq(qid, term) AS (VALUES {bq_score}),
mq(qid, term) AS (VALUES {bq_must}),
nq(qid, term) AS (VALUES {bq_not}),
shq(qid, term) AS (VALUES {bq_should}),
nm(qid, n_must) AS (VALUES {bq_nm}),
cand AS (SELECT DISTINCT sq.qid, tf.doc_id FROM sq JOIN tf USING (term)),
mhit AS (SELECT mq.qid, tf.doc_id, count(DISTINCT tf.term) AS n_hit
         FROM mq JOIN tf USING (term) GROUP BY mq.qid, tf.doc_id),
shit AS (SELECT shq.qid, tf.doc_id, count(DISTINCT tf.term) AS n_sh
         FROM shq JOIN tf USING (term) GROUP BY shq.qid, tf.doc_id),
elig AS (
  SELECT c.qid, c.doc_id FROM cand c
  JOIN nm ON nm.qid = c.qid
  LEFT JOIN mhit m ON m.qid = c.qid AND m.doc_id = c.doc_id
  LEFT JOIN shit s ON s.qid = c.qid AND s.doc_id = c.doc_id
  WHERE coalesce(m.n_hit, 0) = nm.n_must
    AND coalesce(s.n_sh, 0) >= {BOOLEAN_MSM}
    AND NOT EXISTS (SELECT 1 FROM nq JOIN tf t2 USING (term)
                    WHERE nq.qid = c.qid AND t2.doc_id = c.doc_id)),
matched AS (
  SELECT sq.qid, tf.doc_id, sum({score}) AS s
  FROM sq JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY sq.qid, tf.doc_id),
gated AS (SELECT m.* FROM matched m
          JOIN elig e ON e.qid = m.qid AND e.doc_id = m.doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM gated) t
WHERE rank <= {TOPK}
"""
    sql["term_vectors"] = f"""
WITH {fts}
SELECT tf.doc_id, tf.term, tf.tf, dl.dl
FROM tf JOIN dl ON tf.doc_id = dl.doc_id
WHERE tf.doc_id IN ({", ".join(str(i) for i in TV_DOC_IDS)})
"""
    rxv = ", ".join(f"('{q}', '{p}')" for q, p in REGEXP_QUERIES)
    sql["regexp_topk"] = f"""
WITH {fts},
qr(qid, pat) AS (VALUES {rxv}),
matched AS (
  SELECT qr.qid, tf.doc_id, sum({score}) AS s
  FROM qr JOIN tf ON regexp_matches(tf.term, '^(?:' || qr.pat || ')$')
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY qr.qid, tf.doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM matched) t
WHERE rank <= {TOPK}
"""
    rgv = ", ".join(f"('{q}', '{lo}', '{hi}')" for q, lo, hi in RANGE_QUERIES)
    sql["term_range_topk"] = f"""
WITH {fts},
qg(qid, lo, hi) AS (VALUES {rgv}),
matched AS (
  SELECT qg.qid, tf.doc_id, sum({score}) AS s
  FROM qg JOIN tf ON tf.term >= qg.lo AND tf.term < qg.hi
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY qg.qid, tf.doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM matched) t
WHERE rank <= {TOPK}
"""
    qv_sn = ", ".join(f"('{q}', '{t}')"
                      for q, ts in BM25_QUERIES for t in ts)
    r4s = round_half_up_sql("s", 4)
    sql["snippets"] = f"""
WITH {fts},
{_sql_positions_ctes()},
matched AS (
  SELECT q.qid, tf.doc_id, sum({score}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id),
topk AS (
  SELECT qid, doc_id FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid
               ORDER BY {r4s} DESC, doc_id) AS rank
    FROM matched) t
  WHERE rank <= {TOPK}),
qv(qid, term) AS (VALUES {qv_sn}),
fp AS (SELECT q.qid, p.doc_id, min(p.pos) AS first_pos
       FROM qv q JOIN pt p USING (term) GROUP BY 1, 2),
sn AS (SELECT t.qid, t.doc_id, fp.first_pos, f.toks
       FROM topk t JOIN fp ON fp.qid = t.qid AND fp.doc_id = t.doc_id
       JOIN fulltok f ON f.doc_id = t.doc_id)
SELECT qid, doc_id, first_pos,
       array_to_string(
         toks[greatest(first_pos + 1 - 5, 1):least(first_pos + 1 + 5,
                                                   len(toks))],
         ' ') AS snippet
FROM sn
"""

    fv = ", ".join(f"('{q}', '{t}')" for q, t in FUZZY_QUERIES)
    sql["fuzzy_topk"] = f"""
WITH {fts},
qf(qid, qterm) AS (VALUES {fv}),
matched AS (
  SELECT qf.qid, tf.doc_id, sum({score}) AS s
  FROM qf JOIN tf ON abs(length(tf.term) - length(qf.qterm)) <= 1
                 AND levenshtein(tf.term, qf.qterm) <= 1
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY qf.qid, tf.doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM matched) t
WHERE rank <= {TOPK}
"""

    sql["dedup_exact"] = """
SELECT md5(text) AS content_hash, count(*)::BIGINT AS n_docs,
       min(doc_id) AS min_doc_id
FROM documents GROUP BY md5(text)
"""
    minhash_ctes = f"""
t AS (SELECT doc_id, {raw_tok} AS t FROM documents),
sh AS (SELECT doc_id,
              list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                             for i in generate_series(1, len(t) - 2)]) AS shingles
       FROM t WHERE len(t) >= 3),
base AS (SELECT doc_id, shingles,
                [('0x' || substr(md5(s), 1, 8))::BIGINT % 2147483647
                 for s in shingles] AS hs
         FROM sh),
sig AS (SELECT doc_id, shingles,
               [list_min([((1 + 2*h) * x + 7919*h) % 2147483647 for x in hs])
                for h in generate_series(0, 15)] AS sig
        FROM base),
bands AS (SELECT doc_id, b,
                 md5(sig[b*4+1]::VARCHAR || '|' || sig[b*4+2]::VARCHAR || '|' ||
                     sig[b*4+3]::VARCHAR || '|' || sig[b*4+4]::VARCHAR) AS bh
          FROM sig, generate_series(0, 3) g(b)),
pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh
                                   AND a.doc_id < b.doc_id),
ver AS (SELECT doc_a, doc_b,
               len(list_intersect(x.shingles, y.shingles))::DOUBLE
               / len(list_distinct(x.shingles || y.shingles)) AS j
        FROM pairs JOIN sh x ON x.doc_id = doc_a
                   JOIN sh y ON y.doc_id = doc_b)
""".strip()
    sql["minhash_near_dups"] = f"""
WITH {minhash_ctes}
SELECT doc_a, doc_b, (floor(j * 1e6 + 0.5) / 1e6) AS jaccard FROM ver WHERE j >= 0.3
"""
    # connected components over the same near-dup pair graph:
    # recursive min-label closure (walk enumerates reachable nodes;
    # min over the reachable set == the converged hash-min label)
    sql["dedup_components"] = f"""
WITH RECURSIVE {minhash_ctes},
np AS (SELECT doc_a, doc_b FROM ver WHERE j >= 0.3),
edges AS (SELECT doc_a AS u, doc_b AS v FROM np
          UNION SELECT doc_b, doc_a FROM np),
walk(u, label) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) s
  UNION
  SELECT e.u, w.label FROM edges e JOIN walk w ON w.u = e.v)
SELECT u AS doc_id, min(label)::BIGINT AS component FROM walk GROUP BY u
"""
    sql["simhash"] = f"""
WITH t AS (
  SELECT doc_id, unnest({raw_tok}) AS term FROM documents),
tf2 AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM t GROUP BY doc_id, term),
h AS (SELECT doc_id, term, tf,
             ('0x' || substr(md5(term), 1, 8))::BIGINT AS h FROM tf2),
bits AS (SELECT doc_id, g.k,
                sum(tf * (((h >> g.k) & 1) * 2 - 1)) AS s
         FROM h, generate_series(0, 31) g(k) GROUP BY doc_id, g.k)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << k) ELSE 0 END)::BIGINT AS simhash
FROM bits GROUP BY doc_id
"""
    sql["ngram_jaccard"] = f"""
WITH t AS (SELECT doc_id, {raw_tok} AS t FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(t) >= 3 THEN
                list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                               for i in generate_series(1, len(t) - 2)])
              ELSE [] END AS shingles
       FROM t)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       (floor((len(list_intersect(a.shingles, b.shingles))::DOUBLE
             / len(list_distinct(a.shingles || b.shingles))) * 1e6 + 0.5) / 1e6) AS jaccard
FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
"""
    r6m = round_half_up_sql("mlp", 6)
    sql["unigram_logprob"] = f"""
WITH tok AS (
  SELECT doc_id, unnest({raw_tok}) AS tok FROM documents),
uc AS (SELECT tok, count(*)::BIGINT AS n_w FROM tok GROUP BY tok),
tv AS (SELECT sum(n_w)::DOUBLE AS t_tot, count(*)::DOUBLE AS vocab FROM uc),
pd AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
              avg(ln((n_w + 1.0) / (t_tot + vocab))) AS mlp
       FROM tok JOIN uc USING (tok) CROSS JOIN tv
       GROUP BY doc_id)
SELECT d.doc_id, coalesce(pd.n_tokens, 0)::BIGINT AS n_tokens,
       {r6m} AS mean_logprob
FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
"""
    r6c = round_half_up_sql("mc", 6)
    r6s = round_half_up_sql("n_docs / tot", 6)
    sql["source_mix"] = f"""
WITH base AS (
  SELECT source, lang, len({raw_tok})::BIGINT AS n_tok,
         length(text)::BIGINT AS n_chars
  FROM documents),
tot AS (SELECT count(*)::DOUBLE AS tot FROM base),
g AS (SELECT source, lang, count(*)::BIGINT AS n_docs,
             sum(n_tok)::BIGINT AS n_tokens, avg(n_chars) AS mc
      FROM base GROUP BY source, lang)
SELECT source, lang, n_docs, n_tokens, {r6c} AS mean_chars,
       {r6s} AS doc_share
FROM g CROSS JOIN tot
"""

    r6p = round_half_up_sql("p", 6)
    sql["pmi_bigrams"] = f"""
WITH tok AS (SELECT doc_id, {raw_tok} AS t FROM documents),
uc AS (SELECT tok, count(*)::BIGINT AS n_tok
       FROM (SELECT unnest(t) AS tok FROM tok) GROUP BY tok),
bc AS (SELECT bigram, count(*)::BIGINT AS n_ab FROM
        (SELECT unnest([t[i] || ' ' || t[i + 1]
                        for i in generate_series(1, len(t) - 1)]) AS bigram
         FROM tok WHERE len(t) >= 2)
       GROUP BY bigram),
tots AS (SELECT (SELECT sum(n_tok) FROM uc)::DOUBLE AS t_uni,
                (SELECT sum(n_ab) FROM bc)::DOUBLE AS t_bi),
sc AS (SELECT bigram, n_ab,
              ln((n_ab / t_bi) / ((a.n_tok / t_uni) * (b.n_tok / t_uni))) AS p
       FROM bc CROSS JOIN tots
       JOIN uc a ON a.tok = split_part(bc.bigram, ' ', 1)
       JOIN uc b ON b.tok = split_part(bc.bigram, ' ', 2)
       WHERE n_ab >= 5)
SELECT bigram, n_ab, {r6p} AS pmi, rank FROM (
  SELECT bigram, n_ab, p,
         row_number() OVER (ORDER BY {r6p} DESC, bigram)::INT AS rank
  FROM sc) q
WHERE rank <= 20
"""

    qids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    sql["cosine_topk"] = f"""
WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN ({qids})),
sc AS (SELECT q.qid, e.vec_id,
              list_dot_product(q.qv, e.v)
              / (sqrt(list_dot_product(q.qv, q.qv))
                 * sqrt(list_dot_product(e.v, e.v))) AS c
       FROM q JOIN e ON e.vec_id <> q.qid)
SELECT qid, vec_id, (floor(c * 1e4 + 0.5) / 1e4) AS cosine, rank FROM (
  SELECT qid, vec_id, c,
         row_number() OVER (PARTITION BY qid
             ORDER BY (floor(c * 1e4 + 0.5) / 1e4) DESC, vec_id)::INT AS rank
  FROM sc) t
WHERE rank <= {TOPK}
"""
    bucket_expr = " + ".join(
        f"(CASE WHEN embedding[{d + 1}] > 0 THEN {1 << j} ELSE 0 END)"
        for j, d in enumerate([0, 8, 16, 24, 32, 40, 48, 56]))
    sql["ann_buckets"] = (
        f"SELECT vec_id, ({bucket_expr}) AS bucket FROM embeddings")

    # --- ann_multiprobe_topk -------------------------------------------------
    probe_list = ", ".join(["bucket"] + [f"xor(bucket, {1 << j})"
                                         for j in range(8)])
    sql["ann_multiprobe_topk"] = f"""
WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
eb AS (SELECT vec_id, v, ({bucket_expr.replace('embedding', 'v')}) AS bucket FROM e),
qp AS (SELECT vec_id AS qid, v AS qv, unnest([{probe_list}]) AS bucket
       FROM eb WHERE vec_id IN ({qids})),
sc AS (SELECT qp.qid, eb.vec_id,
              list_dot_product(qp.qv, eb.v)
              / (sqrt(list_dot_product(qp.qv, qp.qv))
                 * sqrt(list_dot_product(eb.v, eb.v))) AS c
       FROM qp JOIN eb USING (bucket) WHERE eb.vec_id <> qp.qid)
SELECT qid, vec_id, (floor(c * 1e4 + 0.5) / 1e4) AS cosine, rank FROM (
  SELECT qid, vec_id, c,
         row_number() OVER (PARTITION BY qid
             ORDER BY (floor(c * 1e4 + 0.5) / 1e4) DESC, vec_id)::INT AS rank
  FROM sc) t
WHERE rank <= {TOPK}
"""

    # --- ann_ivf_topk: full deterministic k-means replica ------------------
    def _cos(a: str, b: str) -> str:
        return (f"(list_dot_product({a}, {b}) / "
                f"(sqrt(list_dot_product({a}, {a})) * "
                f"sqrt(list_dot_product({b}, {b}))))")

    def _assign_cte(name: str, cents: str) -> str:
        return f"""
{name} AS (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {_cos('e.v', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM e CROSS JOIN {cents} c) t WHERE rn = 1)"""

    def _mean_cte(name: str, assign: str) -> str:
        # per-dim mean rounded to 9 dp — mirrors engine ivf_centroids
        return f"""
{name} AS (
  SELECT centroid_id, list(m ORDER BY d) AS cv FROM (
    SELECT {assign}.centroid_id, g.d,
           (floor(avg(e.v[g.d]) * 1e9 + 0.5) / 1e9) AS m
    FROM {assign} JOIN e USING (vec_id), generate_series(1, 64) g(d)
    GROUP BY {assign}.centroid_id, g.d) s
  GROUP BY centroid_id)"""

    sql["ann_ivf_topk"] = f"""
WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
params AS (SELECT CAST(ceil(count(*) / 16.0) AS BIGINT) AS stride FROM e),
c0 AS (
  SELECT CAST(floor(vec_id / stride) AS INT) AS centroid_id, v AS cv
  FROM e, params WHERE vec_id % stride = 0
  ORDER BY vec_id LIMIT 16),
{_assign_cte('a1', 'c0')},
{_mean_cte('c1', 'a1')},
{_assign_cte('a2', 'c1')},
{_mean_cte('c2', 'a2')},
{_assign_cte('af', 'c2')},
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN ({qids})),
probes AS (
  SELECT qid, qv, centroid_id FROM (
    SELECT q.qid, q.qv, c.centroid_id,
           row_number() OVER (PARTITION BY q.qid
               ORDER BY {_cos('q.qv', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM q CROSS JOIN c2 c) t WHERE rn <= 4),
sc AS (
  SELECT p.qid, af.vec_id, {_cos('p.qv', 'e.v')} AS c
  FROM probes p JOIN af USING (centroid_id)
  JOIN e ON e.vec_id = af.vec_id
  WHERE af.vec_id <> p.qid)
SELECT qid, vec_id, (floor(c * 1e4 + 0.5) / 1e4) AS cosine, rank FROM (
  SELECT qid, vec_id, c,
         row_number() OVER (PARTITION BY qid
             ORDER BY (floor(c * 1e4 + 0.5) / 1e4) DESC, vec_id)::INT AS rank
  FROM sc) t
WHERE rank <= {TOPK}
"""

    # --- semdedup: same deterministic k-means, within-cell pairs ----------
    _semdedup_cells = f"""
WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
params AS (SELECT CAST(ceil(count(*) / 16.0) AS BIGINT) AS stride FROM e),
c0 AS (
  SELECT CAST(floor(vec_id / stride) AS INT) AS centroid_id, v AS cv
  FROM e, params WHERE vec_id % stride = 0
  ORDER BY vec_id LIMIT 16),
{_assign_cte('a1', 'c0')},
{_mean_cte('c1', 'a1')},
{_assign_cte('a2', 'c1')},
{_mean_cte('c2', 'a2')},
{_assign_cte('af', 'c2')},
d AS (SELECT af.vec_id, af.centroid_id, e.v FROM af JOIN e USING (vec_id)),
pr AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         {_cos('a.v', 'b.v')} AS c
  FROM d a JOIN d b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id)"""

    sql["semdedup_pairs"] = f"""{_semdedup_cells}
SELECT vec_a, vec_b, (floor(c * 1e4 + 0.5) / 1e4) AS cosine
FROM pr WHERE (floor(c * 1e4 + 0.5) / 1e4) >= 0.35
ORDER BY vec_a, vec_b
"""

    sql["semdedup_keep"] = f"""{_semdedup_cells}
SELECT vec_id FROM e
WHERE vec_id NOT IN (
  SELECT vec_b FROM pr WHERE (floor(c * 1e4 + 0.5) / 1e4) >= 0.35)
ORDER BY vec_id
"""

    sql["cluster_sample"] = f"""{_semdedup_cells},
samp AS (
  SELECT vec_id, centroid_id::INT AS centroid_id,
         row_number() OVER (PARTITION BY centroid_id
             ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT,
                      vec_id)::INT AS rank
  FROM af)
SELECT vec_id, centroid_id, rank FROM samp WHERE rank <= 3
ORDER BY vec_id
"""

    sql["ann_rocchio_topk"] = f"""
WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN ({qids})),
pil AS (SELECT qid, vec_id FROM (
  SELECT q.qid, e.vec_id,
         row_number() OVER (PARTITION BY q.qid
             ORDER BY (floor({_cos('q.qv', 'e.v')} * 1e4 + 0.5) / 1e4) DESC,
                      e.vec_id) AS rn
  FROM q CROSS JOIN e WHERE e.vec_id <> q.qid) t WHERE rn <= 5),
cent AS (SELECT qid, list(m ORDER BY d) AS cv FROM (
  SELECT pil.qid, g.d, (floor(avg(e.v[g.d]) * 1e9 + 0.5) / 1e9) AS m
  FROM pil JOIN e USING (vec_id), generate_series(1, 64) g(d)
  GROUP BY pil.qid, g.d) s GROUP BY qid),
q2 AS (SELECT qid, list(x ORDER BY d) AS qv FROM (
  SELECT q.qid, g.d, 1.0 * q.qv[g.d] + 0.75 * c.cv[g.d] AS x
  FROM q JOIN cent c USING (qid), generate_series(1, 64) g(d)) t
  GROUP BY qid),
sc AS (SELECT q2.qid, e.vec_id, {_cos('q2.qv', 'e.v')} AS c
       FROM q2 CROSS JOIN e WHERE e.vec_id <> q2.qid)
SELECT qid, vec_id, (floor(c * 1e4 + 0.5) / 1e4) AS cosine, rank FROM (
  SELECT qid, vec_id, c,
         row_number() OVER (PARTITION BY qid
             ORDER BY (floor(c * 1e4 + 0.5) / 1e4) DESC, vec_id)::INT AS rank
  FROM sc) t
WHERE rank <= {TOPK}
"""

    # --- ann_pq_topk: full deterministic PQ replica ------------------------
    # (16 subspaces × 4 dims, 16 centroids each, 2 Lloyd iterations,
    #  ADC scan + exact rerank of the 60-candidate shortlist — mirrors
    #  engine/pipeline/similarity.py pq_* exactly; L2 is computed as
    #  dot(a,a) − 2·dot(a,b) + dot(b,b) on BOTH engines so the fold
    #  order matches bitwise)
    def _l2s(a: str, b: str) -> str:
        return (f"(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
                f" + list_dot_product({b}, {b}))")

    def _pq_assign_cte(name: str, cents: str) -> str:
        return f"""
{name} AS (
  SELECT vec_id, sub_id, centroid_id FROM (
    SELECT s.vec_id, s.sub_id, c.centroid_id,
           row_number() OVER (PARTITION BY s.vec_id, s.sub_id
               ORDER BY {_l2s('s.sv', 'c.cv')} ASC, c.centroid_id) AS rn
    FROM sub s JOIN {cents} c USING (sub_id)) t WHERE rn = 1)"""

    def _pq_mean_cte(name: str, assign: str) -> str:
        return f"""
{name} AS (
  SELECT sub_id, centroid_id, list(mn ORDER BY d) AS cv FROM (
    SELECT {assign}.sub_id, {assign}.centroid_id, g.d,
           (floor(avg(s.sv[g.d]) * 1e9 + 0.5) / 1e9) AS mn
    FROM {assign} JOIN sub s ON s.vec_id = {assign}.vec_id
                           AND s.sub_id = {assign}.sub_id,
         generate_series(1, 4) g(d)
    GROUP BY {assign}.sub_id, {assign}.centroid_id, g.d) t
  GROUP BY sub_id, centroid_id)"""

    r6a = "(floor(ad * 1e6 + 0.5) / 1e6)"
    r6e = "(floor(ed * 1e6 + 0.5) / 1e6)"
    sql["ann_pq_topk"] = f"""
WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
sub AS (SELECT vec_id, s.s AS sub_id, v[s.s * 4 + 1 : s.s * 4 + 4] AS sv
        FROM e, generate_series(0, 15) s(s)),
params AS (SELECT CAST(ceil(count(*) / 16.0) AS BIGINT) AS stride FROM e),
c0 AS (
  SELECT sub_id, centroid_id, cv FROM (
    SELECT sub_id, CAST(floor(vec_id / stride) AS INT) AS centroid_id,
           sv AS cv,
           row_number() OVER (PARTITION BY sub_id ORDER BY vec_id) AS rn
    FROM sub, params WHERE vec_id % stride = 0) t
  WHERE rn <= 16),
{_pq_assign_cte('a1', 'c0')},
{_pq_mean_cte('c1', 'a1')},
{_pq_assign_cte('a2', 'c1')},
{_pq_mean_cte('c2', 'a2')},
{_pq_assign_cte('af', 'c2')},
qsub AS (SELECT vec_id AS qid, sub_id, sv AS qsv FROM sub
         WHERE vec_id IN ({qids})),
tbl AS (SELECT q.qid, c.sub_id, c.centroid_id AS code,
               {_l2s('q.qsv', 'c.cv')} AS d2
        FROM qsub q JOIN c2 c USING (sub_id)),
cand AS (SELECT t.qid, af.vec_id, sum(t.d2) AS ad
         FROM af JOIN tbl t ON t.sub_id = af.sub_id
                           AND t.code = af.centroid_id
         WHERE af.vec_id <> t.qid
         GROUP BY t.qid, af.vec_id),
short AS (SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
               ORDER BY {r6a} ASC, vec_id) AS rn
    FROM cand) t WHERE rn <= 60),
qv AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN ({qids})),
ex AS (SELECT s.qid, s.vec_id, {_l2s('q.qv', 'e.v')} AS ed
       FROM short s JOIN e ON e.vec_id = s.vec_id
       JOIN qv q ON q.qid = s.qid)
SELECT qid, vec_id, {r6e} AS adist, rank FROM (
  SELECT qid, vec_id, ed,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r6e} ASC, vec_id)::INT AS rank
  FROM ex) t
WHERE rank <= {TOPK}
"""

    # --- ann_ivfpq_topk: coarse IVF + residual PQ, full replica ------------
    # composes the ann_ivf_topk coarse k-means CTEs with the ann_pq_topk
    # codebook CTEs, retrained over RESIDUALS (v − assigned coarse
    # centroid); ADC joins are restricted to each query's 4 probed cells.
    sql["ann_ivfpq_topk"] = f"""
WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
params AS (SELECT CAST(ceil(count(*) / 16.0) AS BIGINT) AS stride FROM e),
c0 AS (
  SELECT CAST(floor(vec_id / stride) AS INT) AS centroid_id, v AS cv
  FROM e, params WHERE vec_id % stride = 0
  ORDER BY vec_id LIMIT 16),
{_assign_cte('a1', 'c0')},
{_mean_cte('c1', 'a1')},
{_assign_cte('a2', 'c1')},
{_mean_cte('c2', 'a2')},
{_assign_cte('af', 'c2')},
rlong AS (
  SELECT e.vec_id, af.centroid_id AS cell, g.d, e.v[g.d] - c.cv[g.d] AS rv
  FROM e JOIN af USING (vec_id)
  JOIN c2 c ON c.centroid_id = af.centroid_id,
       generate_series(1, 64) g(d)),
sub AS (
  SELECT vec_id, CAST(floor((d - 1) / 4) AS INT) AS sub_id,
         list(rv ORDER BY d) AS sv
  FROM rlong GROUP BY vec_id, sub_id),
pc0 AS (
  SELECT sub_id, centroid_id, cv FROM (
    SELECT sub_id, CAST(floor(vec_id / stride) AS INT) AS centroid_id,
           sv AS cv,
           row_number() OVER (PARTITION BY sub_id ORDER BY vec_id) AS rn
    FROM sub, params WHERE vec_id % stride = 0) t
  WHERE rn <= 16),
{_pq_assign_cte('pa1', 'pc0')},
{_pq_mean_cte('pc1', 'pa1')},
{_pq_assign_cte('pa2', 'pc1')},
{_pq_mean_cte('pc2', 'pa2')},
{_pq_assign_cte('paf', 'pc2')},
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN ({qids})),
probes AS (
  SELECT qid, qv, centroid_id FROM (
    SELECT q.qid, q.qv, c.centroid_id,
           row_number() OVER (PARTITION BY q.qid
               ORDER BY {_cos('q.qv', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM q CROSS JOIN c2 c) t WHERE rn <= 4),
qrlong AS (
  SELECT p.qid, p.centroid_id AS cell, g.d, p.qv[g.d] - c.cv[g.d] AS rv
  FROM probes p JOIN c2 c USING (centroid_id),
       generate_series(1, 64) g(d)),
qsub AS (
  SELECT qid, cell, CAST(floor((d - 1) / 4) AS INT) AS sub_id,
         list(rv ORDER BY d) AS qsv
  FROM qrlong GROUP BY qid, cell, sub_id),
tbl AS (SELECT q.qid, q.cell, c.sub_id, c.centroid_id AS code,
               {_l2s('q.qsv', 'c.cv')} AS d2
        FROM qsub q JOIN pc2 c USING (sub_id)),
cand AS (
  SELECT t.qid, paf.vec_id, sum(t.d2) AS ad
  FROM paf JOIN af ON af.vec_id = paf.vec_id
  JOIN tbl t ON t.cell = af.centroid_id AND t.sub_id = paf.sub_id
            AND t.code = paf.centroid_id
  WHERE paf.vec_id <> t.qid
  GROUP BY t.qid, paf.vec_id),
short AS (SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
               ORDER BY {r6a} ASC, vec_id) AS rn
    FROM cand) t WHERE rn <= 60),
ex AS (SELECT s.qid, s.vec_id, {_l2s('q.qv', 'e.v')} AS ed
       FROM short s JOIN e ON e.vec_id = s.vec_id
       JOIN q ON q.qid = s.qid)
SELECT qid, vec_id, {r6e} AS adist, rank FROM (
  SELECT qid, vec_id, ed,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r6e} ASC, vec_id)::INT AS rank
  FROM ex) t
WHERE rank <= {TOPK}
"""

    sql["token_counts"] = """
SELECT doc_id,
       len([x for x in regexp_split_to_array(text, '\\s+') if x <> '']) AS n_ws_tokens,
       len([x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+') if x <> '']) AS n_alnum_tokens,
       length(text)::BIGINT AS n_chars_txt
FROM documents
"""
    en = ", ".join(f"'{w}'" for w in
                   ("the", "a", "of", "to", "and", "in", "is", "for",
                    "with", "on"))
    sql["quality_scores"] = f"""
WITH t AS (SELECT doc_id, text, {raw_tok} AS toks FROM documents),
m AS (SELECT doc_id,
             len([x for x in toks if x IN ({en})])::DOUBLE / len(toks) AS sw,
             length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))::DOUBLE
               / length(text) AS pr,
             list_sum([length(x) for x in toks])::DOUBLE / len(toks) AS ml
      FROM t)
SELECT doc_id, (floor(sw * 1e6 + 0.5) / 1e6) AS stopword_ratio,
       (floor(pr * 1e6 + 0.5) / 1e6) AS punct_ratio,
       (floor(ml * 1e6 + 0.5) / 1e6) AS mean_token_len,
       (floor((0.4 * least(sw / 0.4, 1.0) + 0.3 * (1.0 - least(pr / 0.3, 1.0))
             + 0.3 * least(ml / 8.0, 1.0)) * 1e6 + 0.5) / 1e6) AS quality
FROM m
"""
    lang_scores = []
    from engine.pipeline.textstats import LANG_STOPWORDS
    for lang in sorted(LANG_STOPWORDS):
        words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        lang_scores.append(
            f"len([x for x in toks if x IN ({words})])::DOUBLE"
            f" / greatest(len(toks), 1) AS s_{lang}")
    case = "CASE " + " ".join(
        f"WHEN s_{lang} = best THEN '{lang}'"
        for lang in sorted(LANG_STOPWORDS)) + " END"
    best = "greatest(" + ", ".join(f"s_{lang}"
                                   for lang in sorted(LANG_STOPWORDS)) + ")"
    sql["lang_id"] = f"""
WITH t AS (SELECT doc_id, {raw_tok} AS toks FROM documents),
m AS (SELECT doc_id, {", ".join(lang_scores)} FROM t),
mb AS (SELECT *, {best} AS best FROM m)
SELECT doc_id, {case} AS lang_guess, (floor(best * 1e6 + 0.5) / 1e6) AS lang_score FROM mb
"""
    sql["curation_report"] = f"""
WITH t AS (SELECT doc_id, text, {raw_tok} AS toks FROM documents),
m AS (SELECT doc_id, toks, len(toks) AS n,
             len([x for x in toks if x IN ({en})])::DOUBLE / len(toks) AS sw,
             length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))::DOUBLE
               / length(text) AS pr,
             list_sum([length(x) for x in toks])::DOUBLE / len(toks) AS ml,
             {", ".join(lang_scores)}
      FROM t),
mb AS (SELECT *, {best} AS best,
              0.4 * least(sw / 0.4, 1.0) + 0.3 * (1.0 - least(pr / 0.3, 1.0))
              + 0.3 * least(ml / 8.0, 1.0) AS q,
              CASE WHEN n > 1 THEN
                [toks[i] || ' ' || toks[i+1] for i in generate_series(1, n - 1)]
              ELSE [] END AS sh2
       FROM m),
mc AS (SELECT doc_id, n, q, {case} AS lang,
              CASE WHEN len(sh2) > 0 THEN
                1.0 - len(list_distinct(sh2))::DOUBLE / len(sh2)
              ELSE 0.0 END AS dup2
       FROM mb),
r AS (SELECT doc_id, coalesce(array_to_string([x for x in [
        CASE WHEN n < 5 THEN 'too_short' END,
        CASE WHEN n > 100000 THEN 'too_long' END,
        CASE WHEN q < 0.3 THEN 'low_quality' END,
        CASE WHEN dup2 > 0.5 THEN 'repetitive' END,
        CASE WHEN lang <> 'en' THEN 'wrong_lang' END]
        if x IS NOT NULL], ','), '') AS reasons
      FROM mc)
SELECT doc_id, reasons = '' AS keep, reasons FROM r
"""
    sql["ngram_lm_counts"] = f"""
WITH t AS (SELECT {raw_tok} AS toks FROM documents),
g AS (SELECT unnest(CASE WHEN len(toks) >= 3 THEN
        [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         for i in generate_series(1, len(toks) - 2)]
      ELSE [] END) AS ngram
      FROM t)
SELECT ngram, count(*)::BIGINT AS count FROM g
GROUP BY ngram HAVING count(*) >= 3
"""
    sql["fingerprints"] = f"""
WITH t AS (SELECT doc_id, {raw_tok} AS t FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(t) >= 5 THEN
                list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                               || t[i+3] || ' ' || t[i+4]
                               for i in generate_series(1, len(t) - 4)])
              ELSE [] END AS shingles
       FROM t)
SELECT doc_id, list_min([md5(s) for s in shingles]) AS fp,
       len(shingles) AS n_shingles
FROM sh
"""
    sql["multimodal_features"] = """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                       ELSE 'video' END AS modality,
       octet_length(encode(text))::BIGINT AS n_bytes,
       sha256(text) AS sha,
       CASE WHEN doc_id % 3 IN (0, 2) THEN
         64 + (('0x' || substr(sha256(text), 1, 2))::INT % 192)
       END AS width,
       CASE WHEN doc_id % 3 IN (0, 2) THEN
         64 + (('0x' || substr(sha256(text), 3, 2))::INT % 192)
       END AS height
FROM documents
"""

    sql["media_resize_plan"] = """
WITH f AS (
  SELECT doc_id AS media_id,
         64 + (('0x' || substr(sha256(text), 1, 2))::INT % 192) AS width,
         64 + (('0x' || substr(sha256(text), 3, 2))::INT % 192) AS height
  FROM documents WHERE doc_id % 3 IN (0, 2)),
s AS (SELECT *, least(128.0 / greatest(width, height), 1.0) AS sc FROM f)
SELECT media_id, width, height,
       floor(width * sc + 0.5)::INT AS new_w,
       floor(height * sc + 0.5)::INT AS new_h,
       sc < 1.0 AS scaled
FROM s
"""
    sql["media_frames"] = """
WITH f AS (
  SELECT doc_id AS media_id,
         1000 + ('0x' || substr(sha256(text), 5, 4))::INT AS dur
  FROM documents WHERE doc_id % 3 IN (1, 2))
SELECT media_id, frame_idx, (frame_idx * 10000)::BIGINT AS t_ms FROM (
  SELECT media_id,
         unnest(generate_series(0, CAST(floor(dur / 10000) AS BIGINT)))::INT
           AS frame_idx
  FROM f) t
"""

    # --- expansion_weights -------------------------------------------------
    score = bm25_sql("tf.tf", "dfs.df", "dl.dl", "stats.avgdl", "stats.n")
    qvals = _sql_values(BM25_QUERIES)
    from engine.expand import ENTITY_BOOST
    df_max_frac = 0.95  # must match the queries() expansion_weights entry
    sql["expansion_weights"] = f"""
WITH {fts},
matched AS (
  SELECT q.qid, tf.doc_id, sum({score}) AS s
  FROM {qvals}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id),
pilot AS (
  SELECT qid, doc_id, s FROM (
    SELECT qid, doc_id, s,
           row_number() OVER (PARTITION BY qid
               ORDER BY (floor(s * 1e4 + 0.5) / 1e4) DESC, doc_id) AS rk
    FROM matched) t WHERE rk <= 20),
ptoks AS (
  SELECT p.qid, p.doc_id, p.s,
         list_slice([x for x in regexp_split_to_array({clean}, '[^a-z0-9]+')
                     if x <> '' and x not in {stops}], 1, 200) AS toks,
         [lower(regexp_replace(w, '[^a-zA-Z]', '', 'g'))
          for w in list_slice([w for w in regexp_split_to_array(text, '\\s+')
                               if w <> ''], 1, 200)
          if regexp_matches(w, '^[A-Z]')] AS caps
  FROM pilot p JOIN documents USING (doc_id)),
mined AS (
  SELECT DISTINCT qid, doc_id, s, term, list_contains(caps, term) AS entity
  FROM ptoks, unnest(toks) AS u(term)
  WHERE length(term) > 3 AND NOT regexp_matches(term, '[0-9]')),
origq(qid, term) AS (VALUES {", ".join(f"('{q}', '{t}')" for q, ts in BM25_QUERIES for t in ts)}),
filt AS (
  SELECT m.qid, m.term, m.s, m.entity, dfs.df
  FROM mined m JOIN dfs USING (term)
  WHERE NOT EXISTS (SELECT 1 FROM origq o
                    WHERE o.qid = m.qid AND o.term = m.term)
    AND dfs.df >= 2
    AND dfs.df <= (SELECT n FROM stats) * {df_max_frac}),
wgt AS (
  SELECT qid, term,
         sum((ln((SELECT n FROM stats) / (df + 1)) + 1.0) * s
             * CASE WHEN entity THEN {ENTITY_BOOST} ELSE 1.0 END) AS w
  FROM filt GROUP BY qid, term)
SELECT qid, term, (floor(w * 1e4 + 0.5) / 1e4) AS weight, rk FROM (
  SELECT qid, term, w,
         row_number() OVER (PARTITION BY qid
             ORDER BY (floor(w * 1e4 + 0.5) / 1e4) DESC, term)::INT AS rk
  FROM wgt) t
WHERE rk <= 40
"""

    # --- eval_metrics --------------------------------------------------------
    nt_vals = ", ".join(f"('{q}', {len(set(ts))})" for q, ts in BM25_QUERIES)
    q_uniq = ", ".join(f"('{q}', '{t}')"
                       for q, ts in BM25_QUERIES for t in set(ts))
    sql["eval_metrics"] = f"""
WITH {fts},
matched AS (
  SELECT q.qid, tf.doc_id, sum({score}) AS s
  FROM {qvals}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id),
run AS (
  SELECT qid, doc_id, rank FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid
               ORDER BY (floor(s * 1e4 + 0.5) / 1e4) DESC, doc_id) AS rank
    FROM matched) t WHERE rank <= 20),
qu(qid, term) AS (VALUES {q_uniq}),
nt(qid, n_terms) AS (VALUES {nt_vals}),
rel AS (
  SELECT qu.qid, tf.doc_id
  FROM qu JOIN tf USING (term)
  GROUP BY qu.qid, tf.doc_id
  HAVING count(DISTINCT tf.term) = (SELECT n_terms FROM nt WHERE nt.qid = qu.qid)),
nrel AS (SELECT qid, count(*)::BIGINT AS n_rel FROM rel GROUP BY qid),
hits AS (
  SELECT r.qid, r.rank,
         CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_rel
  FROM run r LEFT JOIN rel ON rel.qid = r.qid AND rel.doc_id = r.doc_id),
c AS (SELECT qid, rank, is_rel,
             sum(is_rel) OVER (PARTITION BY qid ORDER BY rank) AS cum
      FROM hits),
apn AS (SELECT qid, sum(CASE WHEN is_rel = 1 THEN cum::DOUBLE / rank
                             ELSE 0 END) AS sp FROM c GROUP BY qid),
p20 AS (SELECT qid, sum(is_rel)::DOUBLE / 20 AS p FROM c GROUP BY qid),
p5 AS (SELECT qid, sum(is_rel)::DOUBLE / 5 AS p FROM c
       WHERE rank <= 5 GROUP BY qid),
dcg AS (SELECT qid, sum(CASE WHEN rank = 1 THEN is_rel::DOUBLE
                             ELSE is_rel / log2(rank) END) AS d
        FROM c GROUP BY qid),
idcg AS (SELECT n.qid,
                sum(CASE WHEN g.i = 1 THEN 1.0 ELSE 1.0 / log2(g.i) END) AS id
         FROM nrel n, unnest(generate_series(1, least(n.n_rel, 20))) AS g(i)
         GROUP BY n.qid)
SELECT n.qid,
       (floor((coalesce(apn.sp, 0) / n.n_rel) * 1e6 + 0.5) / 1e6) AS ap,
       (floor(coalesce(p5.p, 0) * 1e6 + 0.5) / 1e6) AS p_at_5,
       (floor(coalesce(p20.p, 0) * 1e6 + 0.5) / 1e6) AS p_at_20,
       (floor((coalesce(dcg.d, 0) / idcg.id) * 1e6 + 0.5) / 1e6) AS ndcg_at_20
FROM nrel n
LEFT JOIN apn ON apn.qid = n.qid
LEFT JOIN p20 ON p20.qid = n.qid
LEFT JOIN p5 ON p5.qid = n.qid
LEFT JOIN dcg ON dcg.qid = n.qid
JOIN idcg ON idcg.qid = n.qid
"""

    sql["eval_extra"] = f"""
WITH {fts},
matched AS (
  SELECT q.qid, tf.doc_id, sum({score}) AS s
  FROM {qvals}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id),
run AS (
  SELECT qid, doc_id, rank FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid
               ORDER BY (floor(s * 1e4 + 0.5) / 1e4) DESC, doc_id) AS rank
    FROM matched) t WHERE rank <= 20),
qu(qid, term) AS (VALUES {q_uniq}),
nt(qid, n_terms) AS (VALUES {nt_vals}),
pool AS (
  SELECT qu.qid, tf.doc_id, count(DISTINCT tf.term) AS nm
  FROM qu JOIN tf USING (term)
  GROUP BY qu.qid, tf.doc_id),
rel AS (SELECT p.qid, p.doc_id FROM pool p JOIN nt ON nt.qid = p.qid
        WHERE p.nm = nt.n_terms),
nonrel AS (SELECT p.qid, p.doc_id FROM pool p JOIN nt ON nt.qid = p.qid
           WHERE p.nm < nt.n_terms),
nrel AS (SELECT qid, count(*)::BIGINT AS r FROM rel GROUP BY qid),
nnon AS (SELECT qid, count(*)::BIGINT AS nn FROM nonrel GROUP BY qid),
hits AS (
  SELECT ru.qid, ru.rank,
         CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_rel,
         CASE WHEN nonrel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_non
  FROM run ru
  LEFT JOIN rel ON rel.qid = ru.qid AND rel.doc_id = ru.doc_id
  LEFT JOIN nonrel ON nonrel.qid = ru.qid AND nonrel.doc_id = ru.doc_id),
c AS (SELECT qid, rank, is_rel, is_non,
             sum(is_non) OVER (PARTITION BY qid ORDER BY rank) AS cum_non
      FROM hits),
rp AS (SELECT c.qid, sum(c.is_rel)::DOUBLE / max(n.r) AS r_prec
       FROM c JOIN nrel n ON n.qid = c.qid
       WHERE c.rank <= n.r GROUP BY c.qid),
bp AS (
  SELECT c.qid,
         sum(1.0 - least(c.cum_non::DOUBLE,
                         greatest(least(n.r, coalesce(nn.nn, 0)), 1))
                   / greatest(least(n.r, coalesce(nn.nn, 0)), 1))
         / max(n.r) AS bpref
  FROM c JOIN nrel n ON n.qid = c.qid
  LEFT JOIN nnon nn ON nn.qid = c.qid
  WHERE c.is_rel = 1 GROUP BY c.qid)
SELECT n.qid,
       (floor(coalesce(rp.r_prec, 0) * 1e6 + 0.5) / 1e6) AS r_prec,
       (floor(coalesce(bp.bpref, 0) * 1e6 + 0.5) / 1e6) AS bpref
FROM nrel n
LEFT JOIN rp ON rp.qid = n.qid
LEFT JOIN bp ON bp.qid = n.qid
ORDER BY n.qid
"""

    # --- embedding_near_dups ----------------------------------------------------
    bucket_e = " + ".join(
        f"(CASE WHEN v[{d + 1}] > 0 THEN {1 << j} ELSE 0 END)"
        for j, d in enumerate([0, 8, 16, 24]))
    sql["embedding_near_dups"] = f"""
WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
eb AS (SELECT vec_id, v, ({bucket_e}) AS bucket FROM e),
sc AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))) AS c
       FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT vec_a, vec_b, (floor(c * 1e4 + 0.5) / 1e4) AS cosine
FROM sc WHERE (floor(c * 1e4 + 0.5) / 1e4) >= 0.4
"""

    # --- dedup_keep ----------------------------------------------------------
    sql["dedup_keep"] = f"""
WITH t AS (SELECT doc_id, {raw_tok} AS t FROM documents),
sh AS (SELECT doc_id,
              list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                             for i in generate_series(1, len(t) - 2)]) AS shingles
       FROM t WHERE len(t) >= 3),
base AS (SELECT doc_id, shingles,
                [('0x' || substr(md5(s), 1, 8))::BIGINT % 2147483647
                 for s in shingles] AS hs
         FROM sh),
sig AS (SELECT doc_id, shingles,
               [list_min([((1 + 2*h) * x + 7919*h) % 2147483647 for x in hs])
                for h in generate_series(0, 15)] AS sig
        FROM base),
bands AS (SELECT doc_id, b,
                 md5(sig[b*4+1]::VARCHAR || '|' || sig[b*4+2]::VARCHAR || '|' ||
                     sig[b*4+3]::VARCHAR || '|' || sig[b*4+4]::VARCHAR) AS bh
          FROM sig, generate_series(0, 3) g(b)),
pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh
                                   AND a.doc_id < b.doc_id),
losers AS (SELECT DISTINCT doc_b FROM pairs
           JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b
           WHERE len(list_intersect(x.shingles, y.shingles))::DOUBLE
                 / len(list_distinct(x.shingles || y.shingles)) >= 0.3)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_b FROM losers)
"""

    # --- tfidf_top_terms -------------------------------------------------------
    sql["tfidf_top_terms"] = f"""
WITH {fts},
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln(1.0 + stats.n / dfs.df) AS tfidf
  FROM tf JOIN dfs USING (term), stats)
SELECT doc_id, term, (floor(tfidf * 1e6 + 0.5) / 1e6) AS tfidf, rk FROM (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
             ORDER BY (floor(tfidf * 1e6 + 0.5) / 1e6) DESC, term)::INT AS rk
  FROM scored) t
WHERE rk <= 3
"""

    # --- event_window_counts ---------------------------------------------------
    sql["event_window_cardinality"] = """
WITH vals AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS ws,
         user_id AS value
  FROM events),
hx AS (SELECT ws, ('0x'||substr(md5(value::VARCHAR),1,8))::BIGINT AS h32
       FROM vals WHERE value IS NOT NULL),
reg AS (SELECT ws, h32 >> 20 AS register,
         max(CASE WHEN (h32 & 1048575) = 0 THEN 21
                  ELSE 21 - length(bin(h32 & 1048575)) END) AS rho
        FROM hx GROUP BY ws, register),
agg AS (SELECT ws, count(*)::BIGINT AS occ,
               sum(1::BIGINT << (21 - rho))::BIGINT AS s_occ
        FROM reg GROUP BY ws),
es AS (SELECT ws, (4096 - occ)::BIGINT AS v_zero,
        ((0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0 * 2097152.0)
         / (s_occ + (4096 - occ) * 2097152)::DOUBLE AS raw
       FROM agg)
SELECT ws AS window_start, v_zero,
  (floor((CASE WHEN raw <= 10240.0 AND v_zero > 0
               THEN 4096.0 * ln(4096.0 / v_zero::DOUBLE)
               WHEN raw > 4294967296.0 / 30.0
               THEN -4294967296.0 * ln(1.0 - raw / 4294967296.0)
               ELSE raw END) * 1e4 + 0.5) / 1e4) AS est
FROM es ORDER BY window_start
"""
    sql["event_window_heavy"] = """
WITH vals AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS ws,
         user_id AS value
  FROM events WHERE user_id IS NOT NULL),
regs AS (
  SELECT ws, r, ('0x'||substr(md5(r::VARCHAR || ':' || value::VARCHAR),1,8))
               ::BIGINT % 1024 AS c, count(*)::BIGINT AS cnt
  FROM vals, generate_series(0, 3) AS g(r) GROUP BY 1, 2, 3),
totals AS (SELECT ws, count(*)::BIGINT AS window_n FROM vals GROUP BY ws),
cands AS (SELECT DISTINCT ws, value FROM vals),
probes AS (
  SELECT cd.ws, cd.value, g.r,
    ('0x'||substr(md5(g.r::VARCHAR || ':' || cd.value::VARCHAR),1,8))
      ::BIGINT % 1024 AS c
  FROM cands cd, generate_series(0, 3) AS g(r)),
ests AS (
  SELECT p.ws, p.value, min(coalesce(regs.cnt, 0))::BIGINT AS est
  FROM probes p LEFT JOIN regs ON regs.ws = p.ws AND regs.r = p.r
                               AND regs.c = p.c
  GROUP BY p.ws, p.value)
SELECT e.ws AS window_start, e.value, e.est, t.window_n,
       (e.est >= ceil(0.08 * t.window_n)::BIGINT) AS hh
FROM ests e JOIN totals t USING (ws)
ORDER BY window_start, value
"""
    sql["event_window_pipeline"] = """
WITH c AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
         event_type, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2)
SELECT window_start, event_type, n,
       sum(n) OVER (PARTITION BY event_type ORDER BY window_start)
         ::BIGINT AS cum_n,
       (n - lag(n) OVER (PARTITION BY event_type ORDER BY window_start))
         ::BIGINT AS deriv_n
FROM c ORDER BY event_type, window_start
"""
    sql["event_window_bucket_stats"] = f"""
WITH c AS (
  SELECT date_trunc('hour', ts) AS w, event_type,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2)
SELECT event_type, count(*)::BIGINT AS n_buckets,
       min(n)::BIGINT AS min_n, max(n)::BIGINT AS max_n,
       {round_half_up_sql('sum(n)::DOUBLE / count(*)::DOUBLE', 6)}
         AS avg_n,
       sum(n)::BIGINT AS sum_n
FROM c GROUP BY event_type ORDER BY event_type
"""
    sql["event_window_moving"] = f"""
WITH c AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
         event_type, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2)
SELECT window_start, event_type, n,
       {round_half_up_sql(
           'sum(n) OVER w3::DOUBLE / count(n) OVER w3::DOUBLE', 6)}
         AS mov_avg_n,
       (n - lag(n, {SERIAL_LAG})
              OVER (PARTITION BY event_type ORDER BY window_start))
         ::BIGINT AS serial_diff_n
FROM c
WINDOW w3 AS (PARTITION BY event_type ORDER BY window_start
              ROWS BETWEEN {MOV_WINDOW} PRECEDING AND 1 PRECEDING)
ORDER BY event_type, window_start
"""
    sql["event_window_bucket_script"] = f"""
WITH c AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
         count(*)::BIGINT AS n, sum(value) AS tv
  FROM events GROUP BY 1, 2),
kept AS (SELECT * FROM c WHERE n >= {BSC_MIN_N}),
ranked AS (
  SELECT event_type, window_start, n,
         {round_half_up_sql('tv', 4)} AS total_value,
         {round_half_up_sql('tv / n::DOUBLE', 6)} AS per_event,
         row_number() OVER (PARTITION BY event_type
             ORDER BY n DESC, window_start)::INT AS pos
  FROM kept)
SELECT * FROM ranked WHERE pos <= {BSC_SIZE}
ORDER BY event_type, pos
"""
    sql["event_window_normalize"] = f"""
WITH c AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
         event_type, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2)
SELECT window_start, event_type, n,
       {round_half_up_sql(
           'n::DOUBLE / (sum(n) OVER (PARTITION BY event_type))::DOUBLE',
           6)} AS normalized
FROM c ORDER BY event_type, window_start
"""
    _rng_rows = ", ".join(
        f"({i}, '{k}', "
        f"{'NULL' if lo is None else repr(float(lo))}, "
        f"{'NULL' if hi is None else repr(float(hi))})"
        for i, (k, lo, hi) in enumerate(RANGE_BUCKETS))
    _rng_counts = ", ".join(
        "sum(CASE WHEN value IS NOT NULL"
        + ("" if lo is None else f" AND value >= {float(lo)!r}")
        + ("" if hi is None else f" AND value < {float(hi)!r}")
        + f" THEN 1 ELSE 0 END)::BIGINT AS n_{i}"
        for i, (_, lo, hi) in enumerate(RANGE_BUCKETS))
    _rng_unpivot = " UNION ALL ".join(
        f"SELECT {i} AS i, n_{i} AS n FROM counts"
        for i in range(len(RANGE_BUCKETS)))
    sql["event_value_ranges"] = f"""
WITH meta(i, key, range_from, range_to) AS (VALUES {_rng_rows}),
counts AS (SELECT {_rng_counts} FROM events),
u AS ({_rng_unpivot})
SELECT key, range_from::DOUBLE AS range_from,
       range_to::DOUBLE AS range_to, n
FROM meta JOIN u USING (i) ORDER BY i
"""
    sql["event_window_rate"] = f"""
WITH c AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
         event_type, count(*)::BIGINT AS n, sum(value) AS tv
  FROM events GROUP BY 1, 2)
SELECT window_start, event_type, n,
       {round_half_up_sql('n::DOUBLE * (60.0 / 3600.0)', 6)}
         AS doc_rate,
       {round_half_up_sql('tv * (60.0 / 3600.0)', 6)} AS value_rate
FROM c ORDER BY window_start, event_type
"""
    sql["event_window_moving_percentiles"] = f"""
WITH c AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
         event_type, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2)
SELECT window_start, event_type, n,
       {round_half_up_sql('quantile_cont(n, 0.25) OVER wp', 6)} AS p25_n,
       {round_half_up_sql('quantile_cont(n, 0.5) OVER wp', 6)} AS p50_n,
       {round_half_up_sql('quantile_cont(n, 0.75) OVER wp', 6)} AS p75_n
FROM c
WINDOW wp AS (PARTITION BY event_type ORDER BY window_start
              ROWS BETWEEN {MOVP_WINDOW} PRECEDING AND 1 PRECEDING)
ORDER BY event_type, window_start
"""
    _pb_cols = []
    for p in (25, 50, 75):
        frac = p / 100.0
        _pb_cols.append(
            f"{round_half_up_sql(f'quantile_cont(n, {frac!r})', 6)} "
            f"AS p{p}_n")
        _pb_cols.append(
            f"list_sort(list(n))[greatest(ceil({frac!r} * "
            f"count(*)::DOUBLE), 1)::INT] AS p{p}_nearest_n")
    sql["event_window_percentiles_bucket"] = f"""
WITH c AS (
  SELECT date_trunc('hour', ts) AS w, event_type,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2)
SELECT event_type, count(*)::BIGINT AS n_buckets, {', '.join(_pb_cols)}
FROM c GROUP BY event_type ORDER BY event_type
"""
    sql["event_window_counts"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*)::BIGINT AS n,
       (floor(sum(value) * 1e4 + 0.5) / 1e4) AS total_value
FROM events
GROUP BY 1, 2
"""

    # --- event_sessions --------------------------------------------------------
    sql["event_sessions"] = """
WITH f AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts) AS idx
      FROM f)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       count(*)::BIGINT AS n_events,
       (floor(sum(value) * 1e4 + 0.5) / 1e4) AS total_value
FROM s GROUP BY user_id, idx
"""

    # --- trec_run ------------------------------------------------------------
    sql["trec_run"] = f"""
WITH {fts},
matched AS (
  SELECT q.qid, tf.doc_id, sum({score}) AS s
  FROM {qvals}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id),
topk AS (
  SELECT qid, doc_id, (floor(s * 1e4 + 0.5) / 1e4) AS score, rank FROM (
    SELECT qid, doc_id, s,
           row_number() OVER (PARTITION BY qid
               ORDER BY (floor(s * 1e4 + 0.5) / 1e4) DESC, doc_id)::INT AS rank
    FROM matched) t
  WHERE rank <= {TOPK})
SELECT qid, rank,
       printf('%s Q0 %s %d %.4f %s', qid, doc_id::VARCHAR, rank, score,
              'SPARK_FTS') AS line
FROM topk
"""

    # --- hybrid_rrf_topk (sparse BM25 + dense cosine fused by RRF) -----------
    r4s = round_half_up_sql("s", 4)
    r4c = round_half_up_sql("c", 4)
    r6s = round_half_up_sql("s", 6)
    rrf_pairs = ", ".join(
        f"({vid}, '{q}')"
        for (q, _), vid in zip(BM25_QUERIES, ANN_QUERY_IDS))
    ann_ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    sql["hybrid_rrf_topk"] = f"""
WITH {fts},
matched AS (
  SELECT q.qid, tf.doc_id, sum({score}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id),
bmr AS (
  SELECT qid, doc_id, rank FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid
               ORDER BY {r4s} DESC, doc_id)::INT AS rank
    FROM matched) t
  WHERE rank <= {TOPK + 20}),
e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
qv AS (SELECT vec_id AS vqid, v AS qvec FROM e WHERE vec_id IN ({ann_ids})),
sc AS (SELECT qv.vqid, e.vec_id,
              list_dot_product(qv.qvec, e.v)
              / (sqrt(list_dot_product(qv.qvec, qv.qvec))
                 * sqrt(list_dot_product(e.v, e.v))) AS c
       FROM qv JOIN e ON e.vec_id <> qv.vqid),
cor AS (
  SELECT vqid, vec_id, rank FROM (
    SELECT vqid, vec_id,
           row_number() OVER (PARTITION BY vqid
               ORDER BY {r4c} DESC, vec_id)::INT AS rank
    FROM sc) t
  WHERE rank <= {TOPK + 20}),
pair(vqid, qid) AS (VALUES {rrf_pairs}),
contrib AS (
  SELECT qid, doc_id, 1.0 / (60 + rank) AS c FROM bmr
  UNION ALL
  SELECT p.qid, cor.vec_id AS doc_id, 1.0 / (60 + cor.rank) AS c
  FROM cor JOIN pair p ON p.vqid = cor.vqid),
fused AS (
  SELECT qid, doc_id, sum(c) AS s, count(*)::INT AS n_lists
  FROM contrib GROUP BY qid, doc_id)
SELECT qid, doc_id, {r6s} AS rrf, n_lists, rank FROM (
  SELECT qid, doc_id, s, n_lists,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r6s} DESC, doc_id)::INT AS rank
  FROM fused) t
WHERE rank <= {TOPK}
"""

    # --- cardinality_terms (deterministic HLL, full register replica) --------
    # 32-bit hash = first 8 md5 hex digits; j = top 12 bits, rho over
    # the 20-bit suffix via binary string length (exact integers);
    # register sum kept integer (<= 2^33) so the single final division
    # is the only float op before the ln() corrections.
    sql["cardinality_terms"] = f"""
WITH {fts},
hits AS (
  SELECT DISTINCT q.qid, tf.doc_id
  FROM {_sql_values(BM25_QUERIES)} JOIN tf USING (term)),
vals AS (
  SELECT h.qid, t.term AS value
  FROM hits h JOIN tf t ON t.doc_id = h.doc_id),
hx AS (SELECT qid, ('0x'||substr(md5(value),1,8))::BIGINT AS h32 FROM vals),
reg AS (SELECT qid, h32 >> 20 AS register,
         max(CASE WHEN (h32 & 1048575) = 0 THEN 21
                  ELSE 21 - length(bin(h32 & 1048575)) END) AS rho
        FROM hx GROUP BY qid, register),
agg AS (SELECT qid, count(*)::BIGINT AS occ,
               sum(1::BIGINT << (21 - rho))::BIGINT AS s_occ
        FROM reg GROUP BY qid),
es AS (SELECT qid, (4096 - occ)::BIGINT AS v_zero,
        ((0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0 * 2097152.0)
         / (s_occ + (4096 - occ) * 2097152)::DOUBLE AS raw
       FROM agg)
SELECT qid, v_zero,
  (floor((CASE WHEN raw <= 10240.0 AND v_zero > 0
               THEN 4096.0 * ln(4096.0 / v_zero::DOUBLE)
               WHEN raw > 4294967296.0 / 30.0
               THEN -4294967296.0 * ln(1.0 - raw / 4294967296.0)
               ELSE raw END) * 1e4 + 0.5) / 1e4) AS est
FROM es ORDER BY qid
"""

    # --- hybrid_linear_topk (minmax-normalized weighted CombSUM) -------------
    # Inputs are the ROUNDED 4dp scores both engines agree on; minmax
    # and the weighted sum are then deterministic float ops; degenerate
    # max==min inputs normalize to 1.0 (documented divergence from ES).
    sql["hybrid_linear_topk"] = f"""
WITH {fts},
matched AS (
  SELECT q.qid, tf.doc_id, sum({score}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id),
bmr AS (
  SELECT qid, doc_id, s4 FROM (
    SELECT qid, doc_id, {r4s} AS s4,
           row_number() OVER (PARTITION BY qid
               ORDER BY {r4s} DESC, doc_id)::INT AS rank
    FROM matched) t
  WHERE rank <= {TOPK + 20}),
e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
qv AS (SELECT vec_id AS vqid, v AS qvec FROM e WHERE vec_id IN ({ann_ids})),
sc AS (SELECT qv.vqid, e.vec_id,
              list_dot_product(qv.qvec, e.v)
              / (sqrt(list_dot_product(qv.qvec, qv.qvec))
                 * sqrt(list_dot_product(e.v, e.v))) AS c
       FROM qv JOIN e ON e.vec_id <> qv.vqid),
cor AS (
  SELECT vqid, vec_id, c4 FROM (
    SELECT vqid, vec_id, {r4c} AS c4,
           row_number() OVER (PARTITION BY vqid
               ORDER BY {r4c} DESC, vec_id)::INT AS rank
    FROM sc) t
  WHERE rank <= {TOPK + 20}),
pair(vqid, qid) AS (VALUES {rrf_pairs}),
inputs AS (
  SELECT qid, doc_id, 0 AS src, s4 AS sv FROM bmr
  UNION ALL
  SELECT p.qid, cor.vec_id AS doc_id, 1 AS src, cor.c4 AS sv
  FROM cor JOIN pair p ON p.vqid = cor.vqid),
ext AS (SELECT qid, src, min(sv) AS lo, max(sv) AS hi
        FROM inputs GROUP BY qid, src),
contrib AS (
  SELECT i.qid, i.doc_id,
         (CASE WHEN i.src = 0 THEN 0.7 ELSE 0.3 END)
         * (CASE WHEN x.hi = x.lo THEN 1.0
                 ELSE (i.sv - x.lo) / (x.hi - x.lo) END) AS c
  FROM inputs i JOIN ext x USING (qid, src)),
fused AS (
  SELECT qid, doc_id, sum(c) AS s, count(*)::INT AS n_lists
  FROM contrib GROUP BY qid, doc_id)
SELECT qid, doc_id, {r6s} AS fused, n_lists, rank FROM (
  SELECT qid, doc_id, s, n_lists,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r6s} DESC, doc_id)::INT AS rank
  FROM fused) t
WHERE rank <= {TOPK}
ORDER BY qid, rank
"""

    # --- ann_filtered_topk (IVF with ES knn.filter pre-filter) ---------------
    sql["ann_filtered_topk"] = f"""
WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
params AS (SELECT CAST(ceil(count(*) / 16.0) AS BIGINT) AS stride FROM e),
c0 AS (
  SELECT CAST(floor(vec_id / stride) AS INT) AS centroid_id, v AS cv
  FROM e, params WHERE vec_id % stride = 0
  ORDER BY vec_id LIMIT 16),
{_assign_cte('a1', 'c0')},
{_mean_cte('c1', 'a1')},
{_assign_cte('a2', 'c1')},
{_mean_cte('c2', 'a2')},
{_assign_cte('af', 'c2')},
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN ({ann_ids})),
probes AS (
  SELECT qid, qv, centroid_id FROM (
    SELECT q.qid, q.qv, c.centroid_id,
           row_number() OVER (PARTITION BY q.qid
               ORDER BY {_cos('q.qv', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM q CROSS JOIN c2 c) t WHERE rn <= 4),
sc AS (
  SELECT p.qid, af.vec_id, {_cos('p.qv', 'e.v')} AS c
  FROM probes p JOIN af USING (centroid_id)
  JOIN e ON e.vec_id = af.vec_id
  WHERE af.vec_id <> p.qid
    AND af.vec_id IN (SELECT vec_id FROM embeddings WHERE label % 3 = 0))
SELECT qid, vec_id, (floor(c * 1e4 + 0.5) / 1e4) AS cosine, rank FROM (
  SELECT qid, vec_id, c,
         row_number() OVER (PARTITION BY qid
             ORDER BY (floor(c * 1e4 + 0.5) / 1e4) DESC, vec_id)::INT AS rank
  FROM sc) t
WHERE rank <= {TOPK}
"""

    # --- percentiles_dl (deterministic HDR-bucket percentiles) ---------------
    # Power-of-two buckets with 4 mantissa bits: pure integer shifts
    # (exact cross-engine), midpoint at nearest-rank ceil(p/100 * N).
    sql["percentiles_dl"] = f"""
WITH {fts},
hits AS (
  SELECT DISTINCT q.qid, tf.doc_id
  FROM {_sql_values(BM25_QUERIES)} JOIN tf USING (term)),
v AS (SELECT h.qid, dl.dl FROM hits h JOIN dl ON dl.doc_id = h.doc_id),
bk AS (SELECT qid,
         ((dl >> s) << s)::BIGINT AS lo,
         ((((dl >> s) + 1) << s) - 1)::BIGINT AS hi
       FROM (SELECT qid, dl,
                    greatest(length(bin(dl)) - 4, 0) AS s FROM v)),
counts AS (SELECT qid, lo, hi, count(*)::BIGINT AS cnt
           FROM bk GROUP BY qid, lo, hi),
cum AS (SELECT qid, lo, hi, cnt,
               sum(cnt) OVER (PARTITION BY qid ORDER BY lo) AS cum,
               sum(cnt) OVER (PARTITION BY qid) AS n
        FROM counts),
p AS (SELECT unnest([50.0, 90.0, 99.0])::DOUBLE AS pct)
SELECT qid, pct, ((lo + hi) / 2.0)::DOUBLE AS est
FROM cum CROSS JOIN p
WHERE cum >= ceil(pct / 100.0 * n) AND (cum - cnt) < ceil(pct / 100.0 * n)
ORDER BY qid, pct
"""

    # --- composite_page2 (ES composite agg, after-key pagination) ------------
    # Page 2 == buckets ranked 6..10 in (source, lang) key order over
    # the FIRST query's matched set (the Spark side derives the
    # after-key from page 1's last row; both formulations agree for
    # full, short and exhausted first pages).
    sql["composite_page2"] = f"""
WITH {fts},
hits AS (
  SELECT DISTINCT q.qid, tf.doc_id
  FROM {_sql_values(BM25_QUERIES[:1])} JOIN tf USING (term)),
b AS (
  SELECT h.qid, d.source, d.lang,
         count(DISTINCT h.doc_id)::BIGINT AS n_docs
  FROM hits h JOIN documents d ON d.doc_id = h.doc_id
  WHERE d.source IS NOT NULL AND d.lang IS NOT NULL
  GROUP BY h.qid, d.source, d.lang),
r AS (SELECT *, row_number() OVER (PARTITION BY qid
          ORDER BY source, lang) AS rn FROM b)
SELECT qid, source, lang, n_docs FROM r
WHERE rn > 5 AND rn <= 10
ORDER BY qid, source, lang
"""

    # --- collapsed_topk (field collapsing by documents.source) ---------------
    sql["collapsed_topk"] = f"""
WITH {fts},
matched AS (
  SELECT q.qid, tf.doc_id, sum({score}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id),
g AS (SELECT m.qid, m.doc_id, d.source AS grp, {round_half_up_sql('m.s', 4)} AS score
      FROM matched m JOIN documents d ON d.doc_id = m.doc_id),
b AS (SELECT qid, doc_id, grp, score,
             row_number() OVER (PARTITION BY qid, grp
                 ORDER BY score DESC, doc_id) AS gr
      FROM g)
SELECT qid, doc_id, grp AS "group", score, rank FROM (
  SELECT qid, doc_id, grp, score,
         row_number() OVER (PARTITION BY qid
             ORDER BY score DESC, doc_id)::INT AS rank
  FROM b WHERE gr = 1) t
WHERE rank <= {TOPK}
"""

    # --- DSIR weights / Gumbel top-k sample ----------------------------------
    _dsir_ctes = f"""
t AS (SELECT doc_id, {raw_tok} AS toks FROM documents),
g AS (SELECT doc_id, unnest(toks || CASE WHEN len(toks) >= 2 THEN
        [toks[i] || ' ' || toks[i + 1]
         for i in generate_series(1, len(toks) - 1)]
      ELSE [] END) AS g
      FROM t),
f AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT % 10000 AS b
      FROM g),
cq AS (SELECT b, count(*)::DOUBLE AS cq FROM f GROUP BY b),
cp AS (SELECT f.b, count(*)::DOUBLE AS cp
       FROM f JOIN documents d USING (doc_id)
       WHERE d.source = 'src7' GROUP BY f.b),
tot AS (SELECT (SELECT sum(cq) FROM cq) AS tq,
               (SELECT sum(cp) FROM cp) AS tp),
lr AS (SELECT cq.b,
              ln((coalesce(cp.cp, 0) + 1.0) / (tp + 10000.0))
              - ln((cq.cq + 1.0) / (tq + 10000.0)) AS lr
       FROM cq LEFT JOIN cp USING (b), tot),
db AS (SELECT doc_id, b, count(*)::DOUBLE AS cnt FROM f
       GROUP BY doc_id, b),
w AS (SELECT db.doc_id, sum(db.cnt)::BIGINT AS n_feats,
             sum(db.cnt * lr.lr) AS s
      FROM db JOIN lr USING (b) GROUP BY db.doc_id)
""".strip()
    sql["dsir_weights"] = f"""
WITH {_dsir_ctes}
SELECT doc_id, n_feats, {round_half_up_sql('s', 6)} AS logw FROM w
"""
    sql["dsir_sample"] = f"""
WITH {_dsir_ctes},
keyed AS (
  SELECT doc_id, n_feats,
         {round_half_up_sql(
             "s - ln(-ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))"
             "::BIGINT + 0.5) / 4294967296.0))", 6)} AS key
  FROM w)
SELECT doc_id, n_feats, key,
       row_number() OVER (ORDER BY key DESC, doc_id)::INT AS rank
FROM keyed ORDER BY key DESC, doc_id LIMIT 50
"""

    # --- suggest_terms (DirectSpellChecker over the term dictionary) ---------
    sgv = ", ".join(f"('{q}', '{t}')" for q, t in SUGGEST_QUERIES)
    sql["suggest_terms"] = f"""
WITH {fts},
qs(qid, qterm) AS (VALUES {sgv}),
cand AS (
  SELECT qs.qid, dfs.term AS suggestion,
         levenshtein(dfs.term, qs.qterm)::INT AS distance, dfs.df
  FROM qs JOIN dfs ON abs(length(dfs.term) - length(qs.qterm)) <= 2
                  AND levenshtein(dfs.term, qs.qterm) BETWEEN 1 AND 2)
SELECT qid, suggestion, distance, df, rank FROM (
  SELECT qid, suggestion, distance, df,
         row_number() OVER (PARTITION BY qid
             ORDER BY distance, df DESC, suggestion)::INT AS rank
  FROM cand) t
WHERE rank <= 5
"""

    # --- BPE subword trainer + encoder (engine/pipeline/bpe.py) -------------
    # fully unrolled oracle: one CTE block per merge round, the greedy
    # leftmost merge as a list_reduce string fold identical to the
    # engine's Catalyst fold
    from engine.pipeline import bpe as bpe_mod

    sql["bpe_merges"] = bpe_mod.duckdb_bpe_merges_sql(BPE_N_MERGES)
    sql["bpe_encoded"] = bpe_mod.duckdb_bpe_token_counts_sql(BPE_N_MERGES)

    # --- highlighting (engine/highlight.py): BM25 top-k + best passage -----
    # display stream = stopword-KEEPING tokens; candidate passages are
    # the HL_WINDOW-token slices anchored at each match position;
    # scoring: distinct matched terms desc, matches desc, start asc.
    # DuckDB list slice l[a:b] is 1-based inclusive-truncating, so
    # toks[s+1 : s+W] == Spark slice(toks, s+1, W).
    hl_clean = duckdb_clean_sql("text")
    sql["highlighted_topk"] = f"""
WITH topk AS ({_sql_bm25_topk(BM25_QUERIES, TOPK)}),
hqt AS (
  SELECT qid, list(DISTINCT term) AS terms
  FROM {_sql_values(BM25_QUERIES)} GROUP BY qid),
htok AS (
  SELECT doc_id,
         [t FOR t IN regexp_split_to_array({hl_clean}, '[^a-z0-9]+')
          IF t <> ''] AS toks
  FROM documents WHERE doc_id IN (SELECT doc_id FROM topk)),
hbase AS (
  SELECT t.qid, t.doc_id, t.score, t.rank, d.toks, q.terms
  FROM topk t JOIN htok d USING (doc_id) JOIN hqt q USING (qid)),
hm AS (
  SELECT *, [i - 1 FOR i IN generate_series(1, len(toks))
             IF list_contains(terms, toks[i])] AS mpos
  FROM hbase),
hc AS (SELECT *, unnest(mpos) AS s FROM hm WHERE len(mpos) > 0),
hw AS (SELECT *, toks[s + 1 : s + {HL_WINDOW}] AS win FROM hc),
hsc AS (
  SELECT *,
         len(list_distinct([t FOR t IN win
                            IF list_contains(terms, t)])) AS u,
         len([t FOR t IN win IF list_contains(terms, t)]) AS n
  FROM hw),
hbest AS (
  SELECT *, row_number() OVER (PARTITION BY qid, doc_id
      ORDER BY u DESC, n DESC, s ASC) AS rn
  FROM hsc)
SELECT qid, doc_id, score, rank, len(mpos)::BIGINT AS n_matches,
       array_to_string([CASE WHEN list_contains(terms, t)
                             THEN '<em>' || t || '</em>' ELSE t END
                        FOR t IN win], ' ') AS snippet
FROM hbest WHERE rn = 1 ORDER BY qid, rank
"""

    # --- term_vectors (engine/search.py term_vectors) -----------------------
    tv_ids = ", ".join(str(d) for d in TV_DOC_IDS)
    sql["term_vectors_docs"] = f"""
WITH {_sql_fts_ctes()}
SELECT tf.doc_id, tf.term, tf.tf::BIGINT AS tf, dl.dl::BIGINT AS dl,
       dfs.df::BIGINT AS df
FROM tf JOIN dl USING (doc_id) JOIN dfs USING (term)
WHERE tf.doc_id IN ({tv_ids})
ORDER BY tf.doc_id, tf.term
"""

    # --- explain (engine/search.py explain_scores) ---------------------------
    # idf and tf_norm round 6dp FIRST; contribution multiplies the two
    # ROUNDED doubles (x weight) in the same order as the engine and
    # rounds once more — no unrounded ln() product crosses engines
    ex_idf = round_half_up_sql(
        "ln(1.0 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))", 6)
    ex_norm = round_half_up_sql(
        f"(tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl)))",
        6)
    sql["explain_hits"] = f"""
WITH {_sql_fts_ctes()},
topk AS ({_sql_bm25_topk(BM25_QUERIES, TOPK)}),
exr AS (
  SELECT q.qid, tf.doc_id, q.term, tf.tf::BIGINT AS tf,
         dl.dl::BIGINT AS dl, dfs.df::BIGINT AS df,
         {ex_idf} AS idf, {ex_norm} AS tf_norm, 1.0::DOUBLE AS weight
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats)
SELECT e.qid, e.doc_id, e.term, e.tf, e.dl, e.df, e.idf, e.tf_norm,
       e.weight, {round_half_up_sql("e.idf * e.tf_norm * e.weight", 6)}
         AS contribution
FROM exr e JOIN topk t ON t.qid = e.qid AND t.doc_id = e.doc_id
ORDER BY e.qid, e.doc_id, e.term
"""

    # --- adjacency_matrix (engine/search.py adjacency_matrix_agg) -----------
    adj_vals = ", ".join(f"('{n}', '{t}')"
                         for n, terms in ADJ_FILTERS for t in terms)
    sql["adjacency_counts"] = f"""
WITH {_sql_fts_ctes()},
af(fid, term) AS (VALUES {adj_vals}),
am AS (SELECT DISTINCT af.fid, tf.doc_id FROM af JOIN tf USING (term)),
ap AS (
  SELECT CASE WHEN a.fid = b.fid THEN a.fid
         ELSE a.fid || '&' || b.fid END AS key
  FROM am a JOIN am b ON a.doc_id = b.doc_id AND a.fid <= b.fid)
SELECT key, count(*)::BIGINT AS doc_count FROM ap
GROUP BY key ORDER BY key
"""

    # --- synonym expansion (engine/queryparse.py expand_synonyms) -----------
    # the oracle derives the expansion INDEPENDENTLY: base terms at
    # weight 1 UNION synonyms at SYN_WEIGHT, weights summed per
    # (qid, term), then the standard weighted-OR BM25 top-k
    syn_vals = ", ".join(f"('{t}', '{s}')"
                         for t, ss in sorted(SYNONYMS.items()) for s in ss)
    score = bm25_sql("tf.tf", "dfs.df", "dl.dl", "stats.avgdl", "stats.n")
    r4 = round_half_up_sql("s", 4)
    sql["synonym_expand_topk"] = f"""
WITH {_sql_fts_ctes()},
syn(term, syn) AS (VALUES {syn_vals}),
qbase AS (SELECT qid, term, 1.0::DOUBLE AS weight
          FROM {_sql_values(BM25_QUERIES)}),
qexp AS (
  SELECT qid, term, weight FROM qbase
  UNION ALL
  SELECT q.qid, s.syn AS term, {SYN_WEIGHT}::DOUBLE AS weight
  FROM qbase q JOIN syn s USING (term)),
qw AS (SELECT qid, term, sum(weight) AS weight FROM qexp GROUP BY 1, 2),
sc AS (
  SELECT qw.qid, tf.doc_id, sum(qw.weight * {score}) AS s
  FROM qw JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY qw.qid, tf.doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM sc) t
WHERE rank <= {TOPK}
ORDER BY qid, rank
"""

    # --- r5 rotation-queue wave 4 ------------------------------------------
    _re_qu = ", ".join(f"('{q}', '{t}')" for q, ts in BM25_QUERIES
                       for t in sorted(set(ts)))
    _re_nt = ", ".join(f"('{q}', {len(set(ts))})"
                       for q, ts in BM25_QUERIES)
    sql["rank_eval"] = f"""
WITH {fts},
matched AS (
  SELECT q.qid, tf.doc_id, sum({score}) AS s
  FROM {_sql_values(BM25_QUERIES)}
  JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY q.qid, tf.doc_id),
run AS (
  SELECT qid, doc_id, rank FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid
               ORDER BY (floor(s * 1e4 + 0.5) / 1e4) DESC, doc_id)
             AS rank
    FROM matched) t WHERE rank <= 20),
qu(qid, term) AS (VALUES {_re_qu}),
nt(qid, n_terms) AS (VALUES {_re_nt}),
rel AS (
  SELECT qu.qid, tf.doc_id
  FROM qu JOIN tf USING (term)
  GROUP BY qu.qid, tf.doc_id
  HAVING count(DISTINCT tf.term) =
         (SELECT n_terms FROM nt WHERE nt.qid = qu.qid)),
nrel AS (SELECT qid, count(*)::BIGINT AS n_rel FROM rel GROUP BY qid),
rk AS (
  SELECT r.qid, r.rank,
         CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_rel
  FROM run r LEFT JOIN rel ON rel.qid = r.qid
                          AND rel.doc_id = r.doc_id),
c AS (SELECT qid, rank, is_rel,
             sum(is_rel) OVER (PARTITION BY qid ORDER BY rank)
               AS cum
      FROM rk),
h AS (SELECT * FROM c WHERE is_rel = 1),
mr AS (SELECT qid, 1.0 / min(rank) AS mrr_raw,
              count(*)::BIGINT AS rel_in_k,
              sum(floor((pow(0.5, cum) / rank) * 1e9 + 0.5)::BIGINT)
                AS tsum
       FROM h GROUP BY qid)
SELECT n.qid,
       {round_half_up_sql('coalesce(mr.mrr_raw, 0.0)', 6)} AS mrr,
       {round_half_up_sql(
           'coalesce(mr.rel_in_k, 0)::DOUBLE / n.n_rel::DOUBLE', 6)}
         AS recall,
       {round_half_up_sql(
           'coalesce(mr.tsum, 0)::DOUBLE / 1e9', 6)} AS err
FROM nrel n LEFT JOIN mr ON mr.qid = n.qid ORDER BY n.qid
"""

    from engine.analysis import tokenize_texts as _an_tok

    def _an1(t):
        toks = _an_tok([t])[0]
        return toks[0] if toks else None

    _sw_parts, _sc_parts = [], []
    for _q, _tl, _ta, _tb, _slop in SPAN_WB_QUERIES:
        tl, ta, tb = _an1(_tl), _an1(_ta), _an1(_tb)
        if not (tl and ta and tb):
            continue
        base = f"""
  SELECT doc_id,
         list_sort(list(pos) FILTER (WHERE term = '{tl}')) AS li,
         list_sort(list(pos) FILTER (WHERE term = '{ta}')) AS la,
         list_sort(list(pos) FILTER (WHERE term = '{tb}')) AS lb
  FROM pt WHERE term IN ('{tl}', '{ta}', '{tb}')
  GROUP BY doc_id
  HAVING li IS NOT NULL AND la IS NOT NULL AND lb IS NOT NULL"""
        _sw_parts.append(f"""
SELECT '{_q}' AS qid, doc_id, unnest(list_filter(li,
    p -> len(list_filter(la, pa -> pa <= p AND len(list_filter(lb,
         pb -> pb > pa AND pb - pa - 1 <= {_slop} AND pb >= p)) > 0))
         > 0))::BIGINT AS little_pos
FROM ({base})""")
        _sc_parts.append(f"""
SELECT '{_q}' AS qid, doc_id,
       sp['s']::BIGINT AS big_start, sp['e']::BIGINT AS big_end
FROM (
  SELECT doc_id, unnest(flatten([[{{'s': pa, 'e': pb + 1}}
      for pb in lb
      if pb > pa AND pb - pa - 1 <= {_slop}
         AND len([p for p in li if pa <= p AND p <= pb]) > 0]
      for pa in la])) AS sp
  FROM ({base})) t""")
    sql["span_within_hits"] = (
        f"WITH {_sql_positions_ctes()}\n"
        + "\nUNION ALL".join(_sw_parts))
    sql["span_containing_hits"] = (
        f"WITH {_sql_positions_ctes()}\n"
        + "\nUNION ALL".join(_sc_parts))

    _so_parts = []
    for _q, _ors, _oth, _slop in SPAN_OR_QUERIES:
        ots = sorted({t for t in (_an1(x) for x in _ors) if t})
        to = _an1(_oth)
        if not ots or not to:
            continue
        in_list = ", ".join(f"'{t}'" for t in ots)
        _so_parts.append(f"""
SELECT '{_q}' AS qid, doc_id,
       sp['s']::BIGINT AS span_start, sp['e']::BIGINT AS span_end
FROM (
  SELECT doc_id, unnest(flatten([[{{'s': p, 'e': q + 1}}
      for q in lb if q > p AND q - p - 1 <= {_slop}] for p in lo]))
    AS sp
  FROM (
    SELECT doc_id,
           list_sort(list_distinct(list(pos)
               FILTER (WHERE term IN ({in_list})))) AS lo,
           list_sort(list(pos) FILTER (WHERE term = '{to}')) AS lb
    FROM pt WHERE term IN ({in_list}, '{to}')
    GROUP BY doc_id
    HAVING lo IS NOT NULL AND lb IS NOT NULL) b) t""")
    sql["span_or_hits"] = (
        f"WITH {_sql_positions_ctes()}\n"
        + "\nUNION ALL".join(_so_parts))

    # sqs tree 'merge + (sort | hash) -window tabl*': per-atom
    # conditional sums, match = (merge AND (sort OR hash)) OR tabl*,
    # AND NOT window; score sums the MATCHED arms only (the engine's
    # pivot semantics re-stated). Each per-TERM score is quantized
    # ONCE to int64 micro-units (floor(x*1e6+0.5)) before any sum and
    # the tree accumulates integers — association-free, mirroring the
    # engine (ADVICE r4: float tree nesting vs the flattened CASE).
    _sqs_q = f"floor(({score}) * 1e6 + 0.5)::BIGINT"
    _sqs_r4 = round_half_up_sql("s / 1e6", 4)
    sql["sqs_topk"] = f"""
WITH {fts},
pa AS (
  SELECT tf.doc_id,
         sum(CASE WHEN tf.term = 'merge' THEN {_sqs_q} END) AS s0,
         sum(CASE WHEN tf.term = 'sort' THEN {_sqs_q} END) AS s1,
         sum(CASE WHEN tf.term = 'hash' THEN {_sqs_q} END) AS s2,
         sum(CASE WHEN tf.term LIKE 'tabl%' THEN {_sqs_q} END) AS s3,
         max(CASE WHEN tf.term = 'window' THEN 1 END) AS m4
  FROM tf JOIN dfs ON dfs.term = tf.term
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  WHERE tf.term IN ('merge', 'sort', 'hash', 'window')
     OR tf.term LIKE 'tabl%'
  GROUP BY tf.doc_id),
g AS (
  SELECT doc_id,
         CASE WHEN s0 IS NOT NULL
                   AND (s1 IS NOT NULL OR s2 IS NOT NULL)
              THEN coalesce(s0, 0) + coalesce(s1, 0) + coalesce(s2, 0)
              ELSE 0 END + coalesce(s3, 0) AS s,
         ((s0 IS NOT NULL AND (s1 IS NOT NULL OR s2 IS NOT NULL))
          OR s3 IS NOT NULL) AND m4 IS NULL AS m
  FROM pa)
SELECT 'sq1' AS qid, doc_id, {_sqs_r4} AS score, rank FROM (
  SELECT doc_id, s,
         row_number() OVER (ORDER BY {_sqs_r4} DESC, doc_id)::INT
           AS rank
  FROM g WHERE m) t
WHERE rank <= {TOPK}
"""

    # sqs flat OR 'merge | sort | hash' — the r5 quantized-kernel
    # fast path: under a flat pure-positive OR the tree total is
    # exactly the per-term µu-quantized sum, so the oracle is the
    # plain integer accumulation over the union match set (identical
    # quantization recipe to sqs_topk's, no tree CASE needed).
    sql["sqs_flat_or_topk"] = f"""
WITH {fts},
pa AS (
  SELECT tf.doc_id, sum({_sqs_q}) AS s
  FROM tf JOIN dfs ON dfs.term = tf.term
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  WHERE tf.term IN ('merge', 'sort', 'hash')
  GROUP BY tf.doc_id)
SELECT 'sqf1' AS qid, doc_id, {_sqs_r4} AS score, rank FROM (
  SELECT doc_id, s,
         row_number() OVER (ORDER BY {_sqs_r4} DESC, doc_id)::INT
           AS rank
  FROM pa) t
WHERE rank <= {TOPK}
"""

    _xf_t = bm25_sql("t.tf", "blend.df", "tdl.dl", "tstats.avgdl",
                     "tstats.n")
    _xf_b = bm25_sql("t.tf", "blend.df", "bdl.dl", "bstats.avgdl",
                     "bstats.n")
    sql["cross_fields_search"] = f"""
WITH tsrc AS (SELECT doc_id,
    array_to_string((regexp_split_to_array(text, '\\s+'))[1:5], ' ')
      AS text FROM documents),
bsrc AS (SELECT doc_id,
    array_to_string((regexp_split_to_array(text, '\\s+'))[6:], ' ')
      AS text FROM documents),
{_field_ctes('t', 'tsrc')},
{_field_ctes('b', 'bsrc')},
blend AS (
  SELECT term, max(df) AS df FROM (
    SELECT term, df FROM tdfs UNION ALL SELECT term, df FROM bdfs) u
  GROUP BY term),
xt AS (
  SELECT q.qid, t.doc_id, q.term, {_xf_t} AS ps
  FROM {_sql_values(BM25_QUERIES)}
  JOIN ttf t USING (term) JOIN blend USING (term)
  JOIN tdl ON t.doc_id = tdl.doc_id, tstats),
xb AS (
  SELECT q.qid, t.doc_id, q.term, {_xf_b} AS ps
  FROM {_sql_values(BM25_QUERIES)}
  JOIN btf t USING (term) JOIN blend USING (term)
  JOIN bdl ON t.doc_id = bdl.doc_id, bstats),
pt2 AS (
  SELECT qid, term, doc_id, max(ps) AS mx, sum(ps) AS sm
  FROM (SELECT * FROM xt UNION ALL SELECT * FROM xb) u
  GROUP BY qid, term, doc_id),
m AS (SELECT qid, doc_id, sum(mx + 0.3 * (sm - mx)) AS s
      FROM pt2 GROUP BY qid, doc_id)
SELECT qid, doc_id, {r4} AS score, rank FROM (
  SELECT qid, doc_id, s,
         row_number() OVER (PARTITION BY qid
             ORDER BY {r4} DESC, doc_id)::INT AS rank
  FROM m) t
WHERE rank <= {TOPK}
"""

    _vwh_seeds = ", ".join(
        f"({i}, {(2 * i + 1) / (2.0 * VWH_BUCKETS)!r})"
        for i in range(VWH_BUCKETS))
    _vwh_mean = round_half_up_sql(
        "sum(x::DECIMAL(28,9) * n::DECIMAL(10,0))::DOUBLE"
        " / sum(n)::DOUBLE", 9)

    def _vwh_assign(csrc: str) -> str:
        # nearest centroid, ties -> lower k (the engine's min_by
        # struct(d, k) order re-stated as a row_number window)
        return (f"SELECT event_type, x, n, k FROM ("
                f"SELECT v.event_type, v.x, v.n, c.k, "
                f"row_number() OVER (PARTITION BY v.event_type, v.x "
                f"ORDER BY abs(v.x - c.c), c.k) AS rn "
                f"FROM vals v JOIN {csrc} c USING (event_type)) z "
                f"WHERE rn = 1")

    sql["event_value_width_histogram"] = f"""
WITH vals AS (
  SELECT event_type, value::DOUBLE AS x, count(*)::BIGINT AS n
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
mm AS (SELECT event_type, min(x) AS lo, max(x) AS hi
       FROM vals GROUP BY 1),
seeds AS (
  SELECT event_type, s.k, lo + s.f * (hi - lo) AS c
  FROM mm, (VALUES {_vwh_seeds}) AS s(k, f)),
a1 AS ({_vwh_assign('seeds')}),
c1 AS (SELECT event_type, k, {_vwh_mean} AS c FROM a1
       GROUP BY event_type, k),
a2 AS ({_vwh_assign('c1')}),
c2 AS (SELECT event_type, k, {_vwh_mean} AS c FROM a2
       GROUP BY event_type, k),
a3 AS ({_vwh_assign('c2')}),
agg AS (
  SELECT event_type, k, min(x) AS min_x, {_vwh_mean} AS key,
         max(x) AS max_x, sum(n)::BIGINT AS doc_count
  FROM a3 GROUP BY event_type, k)
SELECT event_type,
       (row_number() OVER (PARTITION BY event_type ORDER BY min_x)
        - 1)::INT AS bucket,
       min_x, key, max_x, doc_count
FROM agg ORDER BY event_type, bucket
"""

    # ---- ES geo family (engine/geo.py twins — identical op order) ----
    from engine import geo as _geo

    _geo_cte = _geo.geo_sql_cte("events")
    sql["geo_bbox_hits"] = f"""
WITH g AS ({_geo_cte})
SELECT event_id, event_type,
       {round_half_up_sql('lat', 6)} AS lat,
       {round_half_up_sql('lon', 6)} AS lon
FROM g
WHERE lat <= {GEO_BBOX['top']!r} AND lat >= {GEO_BBOX['bottom']!r}
  AND lon >= {GEO_BBOX['left']!r} AND lon <= {GEO_BBOX['right']!r}
"""

    _hav_a = _geo.haversine_km_sql("lat", "lon", *GEO_CENTER_A)
    sql["geo_distance_topk"] = f"""
WITH g AS ({_geo_cte}),
d AS (SELECT event_id, {round_half_up_sql(_hav_a, 3)} AS dist_km FROM g),
r AS (SELECT event_id, dist_km,
             row_number() OVER (ORDER BY dist_km ASC, event_id ASC)
               AS rank
      FROM d WHERE dist_km <= {GEO_RADIUS_KM!r})
SELECT event_id, dist_km, rank FROM r WHERE rank <= {GEO_TOPK}
"""

    _hav_b = _geo.haversine_km_sql("lat", "lon", *GEO_CENTER_B)
    _e = GEO_RING_EDGES
    _ring_case = " ".join(
        f"WHEN dist_km < {hi!r} THEN '{lo:g}-{hi:g}'"
        for lo, hi in zip(_e, _e[1:]))
    sql["geo_distance_rings"] = f"""
WITH g AS ({_geo_cte}),
d AS (SELECT value, {round_half_up_sql(_hav_b, 3)} AS dist_km FROM g),
r AS (SELECT CASE WHEN dist_km < {_e[0]!r} THEN NULL {_ring_case}
                  ELSE '{_e[-1]:g}-*' END AS ring,
             CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v_mu
      FROM d)
SELECT ring, count(*)::BIGINT AS n,
       {round_half_up_sql('sum(v_mu)::DOUBLE / count(*) / 1e6', 4)}
         AS avg_value
FROM r WHERE ring IS NOT NULL GROUP BY ring
"""

    _gh = _geo.geohash_sql("lat", "lon", GEOHASH_GRID_PRECISION)
    sql["geohash_grid_cells"] = f"""
WITH g AS ({_geo_cte}),
c AS (SELECT {_gh} AS cell FROM g),
a AS (SELECT cell, count(*)::BIGINT AS n FROM c GROUP BY cell),
r AS (SELECT cell, n,
             row_number() OVER (ORDER BY n DESC, cell ASC) AS rank
      FROM a)
SELECT cell, n, rank FROM r WHERE rank <= {GEOHASH_GRID_TOPN}
"""

    _gt = _geo.geotile_sql("lat", "lon", GEOTILE_ZOOM)
    sql["geotile_grid_cells"] = f"""
WITH g AS ({_geo_cte}),
c AS (SELECT {_gt} AS cell FROM g)
SELECT cell, count(*)::BIGINT AS n FROM c GROUP BY cell
"""

    sql["geo_bounds_centroid"] = f"""
WITH g AS ({_geo_cte}),
q AS (SELECT event_type, lat, lon,
             CAST(floor(lat * 1e6 + 0.5) AS BIGINT) AS lat_mu,
             CAST(floor(lon * 1e6 + 0.5) AS BIGINT) AS lon_mu
      FROM g)
SELECT event_type,
       {round_half_up_sql('min(lat)', 6)} AS min_lat,
       {round_half_up_sql('max(lat)', 6)} AS max_lat,
       {round_half_up_sql('min(lon)', 6)} AS min_lon,
       {round_half_up_sql('max(lon)', 6)} AS max_lon,
       {round_half_up_sql('sum(lat_mu)::DOUBLE / count(*) / 1e6', 6)}
         AS centroid_lat,
       {round_half_up_sql('sum(lon_mu)::DOUBLE / count(*) / 1e6', 6)}
         AS centroid_lon,
       count(*)::BIGINT AS n
FROM q GROUP BY event_type
"""

    from engine.pipeline.textstats import terms_agg_with_other_sql
    sql["terms_with_other"] = terms_agg_with_other_sql(
        "documents",
        r"nullif(regexp_extract(text, '\b(customer|vector|stream)\b',"
        r" 1), '')",
        size=TERMS_OTHER_SIZE)

    sql["geo_shape_relations"] = _geo.geo_shape_counts_sql(
        GEO_ENV_Q, GEO_ENV_DW_MOD, GEO_ENV_DH_MOD)

    _geom_cte = _geo.geo_m_sql_cte("events")
    _pip = _geo.point_in_polygon_m_sql("lat_m", "lon_m", GEO_POLYGON_M)
    sql["geo_polygon_hits"] = f"""
WITH g AS ({_geom_cte})
SELECT event_id, event_type, lat_m, lon_m
FROM g WHERE {_pip}
"""

    sql["geo_lines"] = f"""
WITH g AS ({_geom_cte})
SELECT event_type,
       (list(lon_m ORDER BY ts ASC, event_id ASC))[1:{GEO_LINE_SIZE}]
         AS lons_m,
       (list(lat_m ORDER BY ts ASC, event_id ASC))[1:{GEO_LINE_SIZE}]
         AS lats_m,
       least(count(*), {GEO_LINE_SIZE})::BIGINT AS n_points,
       count(*)::BIGINT AS n_total,
       (count(*) <= {GEO_LINE_SIZE}) AS complete
FROM g GROUP BY event_type
"""

    # ---- categorize_text / ip_prefix / ip_range (module twins) ----
    from engine.pipeline.curation import (ip_prefix_sql, ip_range_sql,
                                          random_sampler_sql)
    from engine.pipeline.textstats import categorize_text_sql

    sql["ip_range_counts"] = ip_range_sql("events", IP_RANGES)
    sql["random_sampler_counts"] = random_sampler_sql(
        "events", RANDOM_SAMPLER_P)

    sql["bucket_trend_corr"] = f"""
WITH c AS (
  SELECT date_trunc('hour', ts) AS w, event_type,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
b AS (SELECT event_type, n,
        (row_number() OVER (PARTITION BY event_type ORDER BY w)
         - 1)::BIGINT AS t
      FROM c),
a AS (SELECT event_type, count(*)::BIGINT AS k,
        sum(n)::BIGINT AS sn, sum(t)::BIGINT AS st,
        sum(n * t)::BIGINT AS snt, sum(n * n)::BIGINT AS snn,
        sum(t * t)::BIGINT AS stt
      FROM b GROUP BY 1)
SELECT event_type, k,
  CASE WHEN (k * snn - sn * sn) > 0 AND (k * stt - st * st) > 0
       THEN {round_half_up_sql(
           '(k * snt - sn * st)::DOUBLE '
           '/ sqrt((k * snn - sn * sn)::DOUBLE '
           '* (k * stt - st * st)::DOUBLE)', 6)}
  END AS r
FROM a ORDER BY event_type
"""

    sql["change_points"] = f"""
WITH c AS (
  SELECT date_trunc('hour', ts) AS w, event_type,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
b AS (SELECT event_type, w, n,
        row_number() OVER (PARTITION BY event_type ORDER BY w)
          ::BIGINT AS k,
        sum(n) OVER (PARTITION BY event_type ORDER BY w)
          ::BIGINT AS sk,
        count(*) OVER (PARTITION BY event_type)::BIGINT AS B,
        sum(n) OVER (PARTITION BY event_type)::BIGINT AS S
      FROM c),
cand AS (
  SELECT event_type, w, k, sk, B, S,
         (sk * (B - k) - (S - sk) * k)::BIGINT AS num
  FROM b WHERE k < B),
scored AS (
  SELECT event_type, w, k, sk, B, S,
         {round_half_up_sql(
             'num::DOUBLE * num::DOUBLE / (B * k * (B - k))::DOUBLE',
             6)} AS score
  FROM cand),
pick AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY score DESC, k ASC) AS rn
  FROM scored)
SELECT event_type, k AS split_after,
       strftime(w, '%Y-%m-%d %H:%M:%S') AS change_at, score,
       {round_half_up_sql('sk::DOUBLE / k::DOUBLE', 6)}
         AS mean_before,
       {round_half_up_sql('(S - sk)::DOUBLE / (B - k)::DOUBLE', 6)}
         AS mean_after,
       'step_change' AS type
FROM pick WHERE rn = 1 ORDER BY event_type
"""

    sql["categorized_messages"] = categorize_text_sql(
        "(SELECT event_type || ' ' || props AS msg FROM events)",
        text_col="msg", max_tokens=4, top_n=CATEGORIZE_TOPN)
    sql["ip_prefix_counts"] = ip_prefix_sql(
        "events", prefix_len=IP_PREFIX_LEN)

    from engine.pipeline.itemsets import frequent_item_sets_sql
    sql["frequent_item_sets"] = frequent_item_sets_sql(
        "documents", min_support=FIS_MIN_SUPPORT, top_n=FIS_TOPN)

    # ---- ES join-field family (engine/joinfield.py twins) ----
    sql["has_child_topk"] = f"""
WITH m AS (
  SELECT o_custkey AS c_custkey,
         CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT) AS s_mu
  FROM orders WHERE o_totalprice >= {HAS_CHILD_PRICE_FLOOR!r}),
f AS (SELECT c_custkey, count(*)::BIGINT AS n_children,
             sum(s_mu) AS sum_mu
      FROM m GROUP BY 1
      HAVING count(*) >= {HAS_CHILD_MIN_CHILDREN}),
g AS (SELECT c.c_custkey, f.n_children,
             {round_half_up_sql('f.sum_mu::DOUBLE / 1e6', 2)} AS score
      FROM customer c JOIN f USING (c_custkey)),
r AS (SELECT c_custkey, n_children, score,
             row_number() OVER (ORDER BY score DESC, c_custkey ASC)
               AS rank
      FROM g)
SELECT c_custkey, n_children, score, rank
FROM r WHERE rank <= {HAS_CHILD_K}
"""
    sql["has_parent_hits"] = f"""
WITH p AS (
  SELECT c_custkey AS o_custkey,
         {round_half_up_sql('c_acctbal', 2)} AS parent_score
  FROM customer
  WHERE c_mktsegment = '{HAS_PARENT_SEGMENT}' AND c_acctbal > 0.0)
SELECT o.o_orderkey, o.o_custkey, p.parent_score
FROM orders o JOIN p USING (o_custkey)
"""
    sql["children_by_segment"] = f"""
WITH f AS (
  SELECT o_custkey AS c_custkey, count(*)::BIGINT AS n,
         sum(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT)) AS mu
  FROM orders GROUP BY 1)
SELECT c.c_mktsegment, sum(f.n)::BIGINT AS n_children,
       {round_half_up_sql('sum(f.mu)::DOUBLE / 1e6', 2)} AS sum_value,
       {round_half_up_sql('sum(f.mu)::DOUBLE / sum(f.n) / 1e6', 2)}
         AS avg_value
FROM customer c JOIN f USING (c_custkey)
GROUP BY 1
"""
    return sql
