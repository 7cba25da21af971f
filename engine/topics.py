"""TREC-style topic (query) handling (SURVEY.md §2.2 P6-P7, §2.3 T8;
reference TopicParser.java:25-76, Searcher.java:37-43, 110-128).

Topics are tiny (50 rows) so parsing and query assembly are
driver-side Python; only the scoring fans out to the cluster.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .analysis import tokenize_texts

# Reference field boosts (Searcher.java:38, 39, 42, 74)
BOOST_TITLE = 3.0
BOOST_DESC = 1.3
BOOST_NARR = 0.5
BOOST_EXPANSION = 0.5


@dataclass
class Topic:
    number: str
    title: str | None
    description: str | None
    narrative: str | None


def _extract(block: str, tag: str, is_num: bool) -> str:
    """Substring after ``tag`` up to the next line / next ``\\n<``
    (TopicParser.java:52-76 semantics, incl. whitespace normalization)."""
    start = block.find(tag)
    if start == -1:
        return ""
    start += len(tag)
    end = block.find("\n", start) if is_num else block.find("\n<", start)
    if end == -1:
        end = block.find("</top>", start)
        if end == -1:
            end = len(block)
    return re.sub(r"\s+", " ", block[start:end].strip().replace("\n", " "))


def parse_topics(content: str) -> list[Topic]:
    """Parse a TREC topics file (TopicParser.java:25-50)."""
    topics: list[Topic] = []
    for block in re.split(r"(?m)^<top>$", content):
        if not block.strip():
            continue
        num = _extract(block, "<num> Number: ", True)
        title = _extract(block, "<title> ", False)
        desc = _extract(block, "<desc> Description:", False)
        narr = _extract(block, "<narr> Narrative:", False)
        num = re.sub(r"[^0-9]", "", num) if num else num
        if num and title:
            topics.append(Topic(num, title, desc, narr))
    return topics


def filter_narrative(narr: str) -> str:
    """Word-level negation filter (Searcher.java:121-128): drop any
    whitespace/./;-separated word whose lowercase letters-only form
    contains 'not' or 'irrelevant'. (Reference semantics are WORD-level,
    not sentence-level — SURVEY.md P7.)"""
    out = []
    for s in re.split(r"[\s.;\n]+", narr):
        low = re.sub(r"[^a-z]", "", s.lower())
        if low and "not" not in low and "irrelevant" not in low:
            out.append(s)
    return " ".join(out)


def anchor_weights(topic: Topic, stem: bool = False,
                   boosts: tuple[float, float, float] | None = None,
                   *, stemmer: str = "porter", ascii_fold: bool = False
                   ) -> dict[str, float]:
    """Flatten the reference's anchor BooleanQuery into term weights:
    weight(t) = 3.0·count_title(t) + 1.3·count_desc(t)
              + 0.5·count_filtered_narr(t)   (Searcher.java:37-43).
    ``boosts`` overrides (title, desc, narr) — the sweep harness's
    knob (reference sweep_greedy.sh:53-55). ``stemmer``/``ascii_fold``
    must match the target index's analyzer (Index.analyzer_opts())."""
    bt, bd, bn = boosts if boosts is not None else (
        BOOST_TITLE, BOOST_DESC, BOOST_NARR)
    weights: dict[str, float] = {}
    fields: list[tuple[str, float]] = []
    if topic.title:
        fields.append((topic.title, bt))
    if topic.description:
        fields.append((topic.description, bd))
    if topic.narrative:
        n = filter_narrative(topic.narrative)
        if n:
            fields.append((n, bn))
    for text, boost in fields:
        for tok in tokenize_texts([text], stem=stem, stemmer=stemmer,
                                  ascii_fold=ascii_fold)[0]:
            weights[tok] = weights.get(tok, 0.0) + boost
    return weights


def original_terms(topic: Topic, stem: bool = False, *,
                   stemmer: str = "porter",
                   ascii_fold: bool = False) -> set[str]:
    """Analyzed title+description terms — excluded from expansion
    (Searcher.java:110-118; narrative NOT included)."""
    text = f"{topic.title or ''} {topic.description or ''}"
    return set(tokenize_texts([text], stem=stem, stemmer=stemmer,
                              ascii_fold=ascii_fold)[0])


def topics_to_query_terms(topics: list[Topic], stem: bool = False,
                          boosts: tuple[float, float, float] | None = None,
                          *, stemmer: str = "porter",
                          ascii_fold: bool = False
                          ) -> list[tuple[str, str, float]]:
    """Batch anchor queries → (qid, term, weight) rows for the engine."""
    rows = []
    for t in topics:
        for term, w in sorted(anchor_weights(t, stem, boosts,
                                             stemmer=stemmer,
                                             ascii_fold=ascii_fold).items()):
            rows.append((t.number, term, w))
    return rows


# ---------------------------------------------------------------------------
# Deterministic synthetic topics over the synthetic corpus (FIXTURES.md §2)
# ---------------------------------------------------------------------------

def synthetic_topics(n: int = 50, seed: int = 7) -> list[Topic]:
    import numpy as np

    from .corpus import _vocab_and_probs

    vocab, probs = _vocab_and_probs()
    rng = np.random.default_rng(seed)
    topics = []
    for i in range(n):
        k = int(rng.integers(2, 5))
        title_terms = vocab[rng.choice(len(vocab), size=k, p=probs)]
        desc_terms = vocab[rng.choice(len(vocab), size=int(rng.integers(4, 9)), p=probs)]
        narr_terms = vocab[rng.choice(len(vocab), size=int(rng.integers(6, 12)), p=probs)]
        narr = ("A relevant document mentions " + " ".join(narr_terms[:3])
                + ". Documents about " + " ".join(narr_terms[3:5])
                + " are not relevant; knots and irrelevantly-named files too. "
                + " ".join(narr_terms[5:]))
        topics.append(Topic(
            number=str(401 + i),
            title=" ".join(title_terms),
            description="What files use " + " ".join(desc_terms) + "?",
            narrative=narr,
        ))
    return topics
