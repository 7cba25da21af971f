"""Byte-pair-encoding subword tokenizer: distributed trainer + encoder.

The standard LLM-training-data operator the engine still lacked: learn a
subword merge table from a corpus (Sennrich, Haddow & Birch 2016 — the
``learn_bpe`` word-frequency formulation every production trainer uses),
then encode text with it.

Semantics (pinned, cross-engine deterministic):

* **Pre-tokenization** uses the engine's raw analyzer (lowercase +
  camelCase split + possessive strip, NO stopword removal, NO stemming):
  BPE wants surface words.
* **Initial symbols** = the word's characters plus a terminal
  end-of-word marker ``</w>`` as its own symbol (Sennrich §3.2).
* **Pair counting** sums, over the word-frequency table, every adjacent
  symbol position weighted by word frequency — including overlapping
  occurrences inside same-symbol runs, exactly like subword-nmt's
  ``get_stats``.
* **Pair selection** is deterministic: count desc, then (left, right)
  lexicographic asc (subword-nmt leaves ties to dict order; we pin them).
* **Merge application** is greedy leftmost non-overlapping: scan the
  symbol list once, merging at position i iff (s[i], s[i+1]) is the pair
  and s[i] was not consumed by the previous merge. Within one round the
  merged output ``left+right`` can never equal ``left`` (right is
  non-empty), so the one-pass fold needs no "just merged" flag — the
  property both engine folds rely on.
* **Encoding** applies the learned merges to each word sequentially in
  rank order (the order described in the paper). This makes
  ``encode(training word) == that word's final training state`` an exact
  invariant (training applies exactly those merges in that order), which
  is what the cross-engine oracle checks. (subword-nmt's ``apply_bpe``
  instead re-scans for the lowest-rank pair present after every merge;
  the two published variants diverge only when a later merge re-creates
  an earlier merge's pair — e.g. merge 2 building the left half of merge
  1 — a case pinned in tests to document the chosen semantics.)

Scale design (100 TB corpus):

* ``word_frequencies`` is the only O(corpus) stage: one map-side
  combinable hash aggregation. Everything after operates on the
  word-frequency table, which is vocabulary-bounded (Heap's law: ~50M
  distinct words at 100 TB, ~MBs to GBs — the reason subword-nmt,
  HuggingFace tokenizers and SentencePiece all train in memory).
* The **driver path** (default when the vocabulary fits) collects the
  word-freq table and trains with incremental pair-count maintenance: a
  merge touches only the words containing the chosen pair (tracked by an
  inverted pair→words map), with a lazy-invalidation max-heap for the
  argmax — per-round cost O(affected words), not O(vocabulary).
* The **spark path** (``mode="spark"``) keeps the word table
  distributed: per round one pair-explode aggregation over the word
  table + a 1-row argmax collect + a Catalyst fold to apply the merge;
  ``localCheckpoint`` every few rounds truncates the growing expression
  lineage (on a real cluster, use a reliable checkpoint dir instead).
  Cost: n_merges × O(vocabulary) shuffles — correct at any vocabulary
  size, the fallback when the vocab table cannot sit on the driver.
* The **encoder** is zero-shuffle: one Arrow-batched pandas UDF over
  each doc's word array with a per-process word→tokens memo (hot words
  hit the cache), the merge table broadcast by closure (n_merges rows).

Reference parity: the reference repo has no subword layer (its analyzer
is Lucene's EnglishAnalyzer, Indexer.java:23); this module is part of
the beyond-reference training-data pipeline family (SURVEY.md §6).
"""

from __future__ import annotations

import heapq
from collections import Counter, defaultdict
from typing import Iterable, List, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from engine.analysis import duckdb_clean_sql, tokens_col

SEP = "\x1f"          # symbol delimiter inside a packed word; the raw
                      # analyzer emits [a-z0-9]+ tokens, so chr(31) can
                      # never appear inside a symbol
EOW = "</w>"          # end-of-word marker symbol (Sennrich §3.2)

Merge = Tuple[int, str, str, int]   # (rank, left_sym, right_sym, pair_count)


# ---------------------------------------------------------------------------
# Python reference fold (also the encoder core)
# ---------------------------------------------------------------------------

def merge_pair_py(syms: Sequence[str], left: str, right: str) -> List[str]:
    """Greedy leftmost non-overlapping application of one merge."""
    out: List[str] = []
    for s in syms:
        # out[-1] == left can only be an unconsumed symbol: a merge this
        # round writes left+right, and right is non-empty
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


def apply_merges_py(syms: Sequence[str], merges: Sequence[Tuple[str, str]],
                    ) -> List[str]:
    """Apply merges sequentially in rank order (encoder semantics).

    The symbol-set presence check is a pure skip optimization: a merge
    can only fire if both sides are present, so absent-side merges are
    O(1) instead of an O(len) fold — same output by construction.
    """
    cur = list(syms)
    present = set(cur)
    for left, right in merges:
        if left not in present or right not in present:
            continue
        new = merge_pair_py(cur, left, right)
        if len(new) != len(cur):
            cur = new
            present = set(cur)
    return cur


def word_to_syms(word: str, eow: str = EOW) -> List[str]:
    return list(word) + [eow]


# ---------------------------------------------------------------------------
# Spark columns
# ---------------------------------------------------------------------------

def init_syms_col(word_col: Column, eow: str = EOW) -> Column:
    """word -> SEP-packed initial symbol string (chars + EOW)."""
    return F.concat_ws(
        SEP, F.concat(F.split(word_col, ""), F.array(F.lit(eow))))


def merge_pair_col(syms_col: Column, left: str, right: str) -> Column:
    """One-round greedy merge as a Catalyst string fold (no UDF)."""
    lcol = F.split(syms_col, SEP)
    la, lb = F.lit(left), F.lit(right)
    sep_l = F.concat(F.lit(SEP), la)
    return F.when(F.size(lcol) < 2, syms_col).otherwise(
        F.aggregate(
            F.slice(lcol, 2, F.size(lcol) - 1),
            F.element_at(lcol, 1),
            lambda acc, y: F.when(
                ((acc == la) | acc.endswith(sep_l)) & (y == lb),
                F.concat(acc, lb),
            ).otherwise(F.concat(acc, F.lit(SEP), y))))


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus with the raw (stopword-keeping,
    unstemmed) analyzer — the single O(corpus) stage."""
    from engine.session import fan_out

    return (fan_out(docs)
            .select(F.explode(
                tokens_col(F.col(text_col), keep_stopwords=True))
                .alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("long").alias("freq")))


# ---------------------------------------------------------------------------
# Trainer — driver path (incremental pair counts, lazy-invalidation heap)
# ---------------------------------------------------------------------------

def _adjacent(syms: Sequence[str]) -> Iterable[Tuple[str, str]]:
    return zip(syms, syms[1:])


def train_bpe_py(word_freqs: Sequence[Tuple[str, int]], n_merges: int,
                 min_count: int = 2, eow: str = EOW) -> List[Merge]:
    """In-memory BPE trainer over a (word, freq) table.

    Incremental maintenance: ``pair_words`` inverts pair -> word ids so a
    round recounts only words containing the chosen pair; the heap holds
    (-count, pair) entries with lazy invalidation against the live
    ``counts`` map (stale entries are popped and dropped).
    """
    words: List[List] = [[word_to_syms(w, eow), int(f)] for w, f in word_freqs]
    counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for wid, (syms, freq) in enumerate(words):
        for p in _adjacent(syms):
            counts[p] += freq
            pair_words[p].add(wid)
    heap = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)

    merges: List[Merge] = []
    for rank in range(n_merges):
        best = None
        while heap:
            negc, p = heap[0]
            if counts.get(p, 0) != -negc or -negc <= 0:
                heapq.heappop(heap)     # stale or exhausted entry
                continue
            best = (p, -negc)
            break
        if best is None or best[1] < min_count:
            break
        (left, right), cnt = best
        merges.append((rank, left, right, cnt))
        for wid in list(pair_words[(left, right)]):
            syms, freq = words[wid]
            old = Counter(_adjacent(syms))
            new_syms = merge_pair_py(syms, left, right)
            new = Counter(_adjacent(new_syms))
            words[wid][0] = new_syms
            for p in old.keys() | new.keys():
                delta = new.get(p, 0) - old.get(p, 0)
                if delta:
                    counts[p] += delta * freq
                    heapq.heappush(heap, (-counts[p], p))
                if new.get(p, 0):
                    pair_words[p].add(wid)
                elif p in pair_words:
                    pair_words[p].discard(wid)
    return merges


# ---------------------------------------------------------------------------
# Trainer — distributed path
# ---------------------------------------------------------------------------

def _train_spark(words: DataFrame, n_merges: int, min_count: int,
                 eow: str, checkpoint_every: int) -> List[Merge]:
    cur = (words.select(init_syms_col(F.col("word"), eow).alias("syms"),
                        "freq")
           .localCheckpoint(eager=True))
    merges: List[Merge] = []
    for rank in range(n_merges):
        l = F.split("syms", SEP)
        pairs = F.zip_with(
            F.slice(l, 1, F.size(l) - 1), F.slice(l, 2, F.size(l) - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")))
        pc = (cur.where(F.size(l) >= 2)
              .select(F.explode(pairs).alias("p"), "freq")
              .groupBy(F.col("p.l").alias("left_sym"),
                       F.col("p.r").alias("right_sym"))
              .agg(F.sum("freq").alias("cnt")))
        top = (pc.orderBy(F.desc("cnt"), F.asc("left_sym"),
                          F.asc("right_sym"))
               .limit(1).collect())
        if not top or top[0]["cnt"] < min_count:
            break
        left, right, cnt = (top[0]["left_sym"], top[0]["right_sym"],
                            int(top[0]["cnt"]))
        merges.append((rank, left, right, cnt))
        cur = cur.withColumn("syms", merge_pair_col(F.col("syms"),
                                                    left, right))
        if (rank + 1) % checkpoint_every == 0:
            # truncate the growing fold lineage (cluster deployments:
            # reliable checkpoint dir)
            cur = cur.localCheckpoint(eager=True)
    return merges


def bpe_train(docs: DataFrame, n_merges: int, *, min_count: int = 2,
              eow: str = EOW, text_col: str = "text", mode: str = "auto",
              driver_max_words: int = 2_000_000,
              checkpoint_every: int = 6) -> DataFrame:
    """Learn a BPE merge table from a documents table.

    Returns (rank int, left_sym, right_sym, pair_count long), rank-
    ordered; may hold fewer than ``n_merges`` rows if the best pair
    falls under ``min_count`` (or no pair remains).

    ``mode``: "driver" collects the vocabulary-bounded word-frequency
    table and trains in memory (the path every production BPE trainer
    takes); "spark" keeps the word table distributed (n_merges small
    aggregations); "auto" picks driver iff the distinct-word count fits
    ``driver_max_words``. Both paths are output-identical (tested).
    """
    spark = docs.sparkSession
    words = word_frequencies(docs, text_col)
    if mode == "auto":
        mode = ("driver" if words.count() <= driver_max_words else "spark")
    if mode == "driver":
        rows = words.collect()
        merges = train_bpe_py([(r["word"], r["freq"]) for r in rows],
                              n_merges, min_count, eow)
    elif mode == "spark":
        merges = _train_spark(words, n_merges, min_count, eow,
                              checkpoint_every)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return spark.createDataFrame(
        merges or [],
        "rank int, left_sym string, right_sym string, pair_count long")


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _merges_list(merges) -> List[Tuple[str, str]]:
    """Accept a bpe_train DataFrame, a list of (rank, left, right,
    count) Merge tuples, or a bare list of (left, right) pairs."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("rank").collect()
        return [(r["left_sym"], r["right_sym"]) for r in rows]
    out: List[Tuple[str, str]] = []
    for m in merges:
        if len(m) == 4:
            out.append((m[1], m[2]))
        elif len(m) == 2:
            out.append((m[0], m[1]))
        else:
            raise ValueError(f"unrecognized merge row shape: {m!r}")
    return out


def bpe_encode(docs: DataFrame, merges, *, text_col: str = "text",
               eow: str = EOW) -> DataFrame:
    """Encode each doc's text into BPE subword tokens.

    Zero-shuffle: per-row pandas UDF over the doc's word array with a
    per-process word->tokens memo; the merge table rides the closure
    (n_merges rows — driver-bounded by the trained vocabulary size).
    Output: every input column plus ``tokens array<string>``.
    """
    ranked = _merges_list(merges)

    @F.pandas_udf(ArrayType(StringType()))
    def _enc(word_lists: pd.Series) -> pd.Series:
        memo: dict = {}

        def enc_doc(wl):
            out: List[str] = []
            for w in wl:
                toks = memo.get(w)
                if toks is None:
                    toks = apply_merges_py(word_to_syms(w, eow), ranked)
                    memo[w] = toks
                out.extend(toks)
            return out

        return word_lists.map(enc_doc)

    from engine.session import fan_out

    return fan_out(docs).withColumn(
        "tokens",
        _enc(tokens_col(F.col(text_col), keep_stopwords=True)))


# ---------------------------------------------------------------------------
# DuckDB oracle generators (fully unrolled — one CTE block per round)
# ---------------------------------------------------------------------------

def duckdb_bpe_ctes(n_merges: int, docs_table: str = "documents",
                    text_col: str = "text", eow: str = EOW) -> str:
    """WITH-clause body: bpe_w0..bpe_w{n}, bpe_best0..bpe_best{n-1}.

    ``bpe_w{r}`` is the word table after r merges; ``bpe_best{r}`` the
    (left_sym, right_sym, cnt) argmax of round r with the engine's
    deterministic tie-break. Precondition: the corpus sustains
    ``n_merges`` full rounds (some adjacent pair always remains) — the
    engine side trains with min_count=1 under the same contract.
    """
    clean = duckdb_clean_sql(text_col)
    sep = "chr(31)"
    parts = [f"""
bpe_w0 AS MATERIALIZED (
  SELECT array_to_string(
           list_append(regexp_extract_all(word, '.'), '{eow}'), {sep})
           AS syms,
         count(*)::BIGINT AS freq
  FROM (SELECT unnest(regexp_split_to_array({clean}, '[^a-z0-9]+')) AS word
        FROM {docs_table})
  WHERE word <> ''
  GROUP BY word)"""]
    for r in range(n_merges):
        parts.append(f"""
bpe_pc{r} AS MATERIALIZED (
  SELECT t.p.lft AS left_sym, t.p.rgt AS right_sym, sum(freq)::BIGINT AS cnt
  FROM (SELECT string_split(syms, {sep}) AS l, freq FROM bpe_w{r}),
       unnest([{{'lft': l[i], 'rgt': l[i+1]}}
               for i in generate_series(1, len(l) - 1)]) AS t(p)
  GROUP BY 1, 2),
bpe_best{r} AS MATERIALIZED (
  SELECT left_sym, right_sym, cnt FROM bpe_pc{r}
  ORDER BY cnt DESC, left_sym, right_sym LIMIT 1),
bpe_w{r + 1} AS MATERIALIZED (
  SELECT CASE WHEN len(string_split(syms, {sep})) < 2 THEN syms
         ELSE list_reduce(string_split(syms, {sep}), (acc, y) ->
           CASE WHEN (acc = b.left_sym
                      OR ends_with(acc, {sep} || b.left_sym))
                     AND y = b.right_sym
                THEN acc || b.right_sym
                ELSE acc || {sep} || y END) END AS syms,
         freq
  FROM bpe_w{r}, bpe_best{r} b)""")
    return ",".join(parts)


def duckdb_bpe_merges_sql(n_merges: int, docs_table: str = "documents",
                          text_col: str = "text", eow: str = EOW) -> str:
    """Full SELECT: the rank-ordered merge table (matches bpe_train)."""
    union = "\nUNION ALL\n".join(
        f"SELECT {r} AS rank, left_sym, right_sym, cnt AS pair_count "
        f"FROM bpe_best{r}" for r in range(n_merges))
    return (f"WITH {duckdb_bpe_ctes(n_merges, docs_table, text_col, eow)}\n"
            f"SELECT * FROM ({union}) ORDER BY rank")


def duckdb_bpe_token_counts_sql(n_merges: int,
                                docs_table: str = "documents",
                                text_col: str = "text",
                                eow: str = EOW) -> str:
    """Full SELECT: corpus token frequencies after encoding with the
    learned merges — equals the final training word states expanded by
    word frequency (the encode == training-evolution invariant)."""
    return (f"WITH {duckdb_bpe_ctes(n_merges, docs_table, text_col, eow)}\n"
            f"SELECT token, sum(freq)::BIGINT AS n\n"
            f"FROM (SELECT unnest(string_split(syms, chr(31))) AS token,"
            f" freq FROM bpe_w{n_merges})\n"
            f"GROUP BY token ORDER BY token")
