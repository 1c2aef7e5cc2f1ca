from __future__ import annotations

import pytest

from kg.session import get_spark
from kg.synth import corpus_vocab, load_reference_sentences


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="kg-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sentences():
    return load_reference_sentences()


@pytest.fixture(scope="session")
def vocab(sentences):
    return corpus_vocab(sentences)
