import pytest

from engine.session import get_spark


@pytest.fixture(scope="session")
def spark():
    sp = get_spark(app="engine-tests", master="local[4]", shuffle_partitions=4)
    sp.sparkContext.setLogLevel("ERROR")
    yield sp
    sp.stop()


@pytest.fixture(scope="session")
def tiny_index(spark, tmp_path_factory):
    """Shared tiny index over the deterministic synthetic corpus."""
    from engine.corpus import generate_corpus_df
    from engine.index_build import build_index
    from engine.search import Index

    path = str(tmp_path_factory.mktemp("idx") / "tiny")
    corpus = generate_corpus_df(spark, 120, partitions=4, max_tokens=150)
    build_index(spark, corpus, path, n_buckets=4, n_doc_buckets=8)
    return Index(spark, path)
