"""End-to-end retrieval-quality check on a planted-relevance corpus
(FIXTURES.md §3): docs relevant to a topic contain a rare marker
phrase; a correct BM25 engine must rank them at the very top, making
AP/P@k/nDCG hand-predictable. Also exercises the full reference
lifecycle: anchor → RM3 expansion → re-score → run file → evaluate →
standings (SURVEY.md §3.2-3.3)."""

import pytest
from pyspark.sql import functions as F

from engine.evaluate import macro_metrics, standings
from engine.expand import search_topics
from engine.index_build import build_index
from engine.runfile import format_run
from engine.search import Index
from engine.topics import Topic


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    """60 noise docs + 3 relevant docs per topic for 2 topics."""
    rows = []
    fillers = ["merge", "sort", "batch", "stream", "cache", "shard"]
    for i in range(60):
        words = [fillers[(i + j) % len(fillers)] for j in range(30)]
        rows.append(("noise", f"n{i:03d}", "-", "py", " ".join(words)))
    for t, marker in (("401", "zebraquark"), ("402", "quuxgluon")):
        for j in range(3):
            body = [marker] * 3 + ["merge", "sort"] * 5
            rows.append((f"rel{t}", f"d{j}", "-", "py", " ".join(body)))
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string")
    path = str(tmp_path_factory.mktemp("planted") / "idx")
    build_index(spark, corpus, path, n_buckets=4, n_doc_buckets=8)
    idx = Index(spark, path)
    topics = [
        Topic("401", "zebraquark", "find zebraquark files", None),
        Topic("402", "quuxgluon", "find quuxgluon files", None),
    ]
    qrels = spark.createDataFrame(
        [(t, f"rel{t}/d{j}", 1) for t in ("401", "402") for j in range(3)],
        "qid string, docno string, rel int")
    return idx, topics, qrels


def _run_df(idx, topics, expand):
    res = search_topics(idx, topics, num_docs=20, expand=expand)
    return res.select("qid", "docno", "rank")


def test_planted_relevance_perfect_ranking(planted):
    idx, topics, qrels = planted
    m = macro_metrics(_run_df(idx, topics, expand=False), qrels, k=20)
    # rare marker terms → the 3 relevant docs must be ranks 1-3 → AP=1
    assert m["MAP"] == pytest.approx(1.0)
    assert m["P@20"] == pytest.approx(3 / 20)
    assert m["nDCG@20"] == pytest.approx(1.0)


def test_rm3_expansion_lifecycle(planted):
    idx, topics, qrels = planted
    m = macro_metrics(_run_df(idx, topics, expand=True), qrels, k=20)
    # expansion adds corpus-common terms at 0.5 boost; the anchor marker
    # dominates, so relevant docs must stay on top
    assert m["MAP"] == pytest.approx(1.0)


def test_run_file_and_standings(planted, spark):
    idx, topics, qrels = planted
    run = search_topics(idx, topics, num_docs=10, expand=False)
    lines = [r["line"] for r in format_run(run, tag="T").collect()]
    # only the 3 relevant docs match each topic's terms → 3 hits/topic
    assert len(lines) == 6
    first = lines[0].split(" ")
    assert first[0] == "401" and first[1] == "Q0" and first[3] == "1"
    assert first[2].startswith("rel401/")
    # E5 standings: anchor-only vs expanded, sorted by MAP desc
    table = standings({
        "anchor": _run_df(idx, topics, False),
        "rm3": _run_df(idx, topics, True),
    }, qrels)
    assert [r["MAP"] for r in table] == sorted(
        (r["MAP"] for r in table), reverse=True)
