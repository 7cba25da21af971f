"""Topic parsing, narrative filter, anchor weights, RM3 expansion
semantics (SURVEY.md P6-P7, Q9-Q11; Searcher.java:37-75, 88-128)."""

import pytest
from pyspark.sql import functions as F

from engine.expand import mine_terms_udf, search_topics
from engine.topics import (
    Topic, anchor_weights, filter_narrative, original_terms, parse_topics,
)

SAMPLE = """
<top>

<num> Number: 401
<title> foreign minorities, Germany

<desc> Description:
What language and cultural differences impede the integration
of foreign minorities in Germany?

<narr> Narrative:
A relevant document will focus on the causes; the mere mention of
immigration difficulties is not relevant.

</top>
"""


def test_parse_topics():
    ts = parse_topics(SAMPLE)
    assert len(ts) == 1
    t = ts[0]
    assert t.number == "401"
    assert t.title == "foreign minorities, Germany"
    assert t.description.startswith("What language and cultural")
    assert "immigration difficulties" in t.narrative


def test_filter_narrative_word_level():
    # drops words whose letters-only lowercase form CONTAINS not/irrelevant
    n = "This is not relevant; knots appear. Importantly, keep irrelevant-ish words out."
    kept = filter_narrative(n).split()
    assert "not" not in kept
    assert "knots" not in kept           # contains "not"
    assert "irrelevant-ish" not in kept  # contains "irrelevant"
    assert "Importantly," in kept        # "importantly" has no "not"
    assert "relevant" in kept            # ';' is a split char, so stripped


def test_anchor_weights_boosts():
    t = Topic("1", "alpha beta alpha", "beta gamma", "delta is not relevant")
    w = anchor_weights(t)
    assert w["alpha"] == pytest.approx(2 * 3.0)
    assert w["beta"] == pytest.approx(3.0 + 1.3)
    assert w["gamma"] == pytest.approx(1.3)
    assert w["delta"] == pytest.approx(0.5)
    assert w["relevant"] == pytest.approx(0.5)  # survives the word filter
    assert "not" not in w  # dropped by narrative filter AND stopword list
    assert "is" not in w   # stopword


def test_original_terms_excludes_narrative():
    t = Topic("1", "alpha", "beta", "gamma")
    assert original_terms(t) == {"alpha", "beta"}


def test_mine_terms_udf(spark):
    df = spark.createDataFrame(
        [("The QuickSort algorithm beats BubbleSort for bigArrays42 here",)],
        "content string")
    rows = df.select(F.explode(mine_terms_udf()("content")).alias("e")) \
        .select("e.term", "e.entity").collect()
    got = {r["term"]: r["entity"] for r in rows}
    # len>3, no digits → 'bigarrays42' and 'arrays42' excluded, 'here' ok
    assert "quick" in got and "sort" in got and "algorithm" in got
    assert not any(any(ch.isdigit() for ch in t) for t in got)
    assert all(len(t) > 3 for t in got)
    # entity: 'quicksort'/'bubblesort' start uppercase in raw text, but the
    # tokenizer splits them; subtokens are entities only if the letters-only
    # whole word matches ('quicksort' not in token set). 'algorithm' is
    # lowercase in text → not entity.
    assert got["algorithm"] is False


def test_end_to_end_search_topics(tiny_index):
    from engine.topics import synthetic_topics

    topics = synthetic_topics(3)
    res = search_topics(tiny_index, topics, num_docs=25, expand=True)
    rows = res.collect()
    assert len(rows) > 0
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    for q, rs in by_q.items():
        ranks = [r["rank"] for r in rs]
        assert ranks == sorted(ranks)
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_poisoned_topic_is_isolated(tiny_index):
    """Q12 (reference Searcher.java:82): one malformed topic must not
    fail the batch — it drops with a warning and the rest are served."""
    import warnings

    from engine.expand import drop_malformed_topics
    from engine.topics import Topic, synthetic_topics

    good = synthetic_topics(2)
    poisoned = [
        good[0],
        Topic(number="999", title=None, description=None, narrative=None),
        Topic(number=None, title=123, description=object(), narrative=None),
        good[1],
    ]
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        kept = drop_malformed_topics(poisoned)
    assert [t.number for t in kept] == [good[0].number, good[1].number]
    skips = [w for w in caught
             if "skipping malformed topic" in str(w.message)]
    assert len(skips) == 2

    res = search_topics(tiny_index, poisoned, num_docs=10, expand=False)
    qids = {r["qid"] for r in res.collect()}
    assert qids == {good[0].number, good[1].number}
