"""Incremental append pipeline: append(A then B) == fresh(A∪B), per-doc
stages appended not recomputed, idempotent repeat, resume coherence."""

import pytest

from kg.pipeline import run_pipeline, run_pipeline_append
from kg.synth import docs_to_df, synth_docs


def _rows(df):
    return sorted(map(str, df.collect()))


@pytest.fixture(scope="module")
def split_corpus():
    docs = synth_docs(150)
    return docs[:100], docs[100:], docs


def test_append_equals_fresh(spark, vocab, tmp_path, split_corpus):
    old, new, full = split_corpus
    fresh = run_pipeline(
        spark, docs_to_df(spark, full), str(tmp_path / "fresh"),
        vocab=vocab, input_token="t150",
    )
    base = str(tmp_path / "inc")
    run_pipeline(
        spark, docs_to_df(spark, old), base, vocab=vocab, input_token="t100"
    )
    res = run_pipeline_append(
        spark, docs_to_df(spark, new), base, vocab=vocab, input_token="b2"
    )
    for name in fresh.tables:
        assert _rows(res.tables[name]) == _rows(fresh.tables[name]), name
    # the per-document heavy stages were appended, never recomputed
    for stage in ("documents", "extract", "mentions", "triples",
                  "keyphrases", "documents_out"):
        assert f"{stage}+append" in res.executed
        assert stage not in res.executed
    # only the shared tail was recomputed
    assert {"linked", "nodes", "edges"} <= set(res.executed)


def test_append_is_idempotent(spark, vocab, tmp_path, split_corpus):
    old, new, _ = split_corpus
    base = str(tmp_path / "idem")
    run_pipeline(
        spark, docs_to_df(spark, old), base, vocab=vocab, input_token="t100"
    )
    res1 = run_pipeline_append(
        spark, docs_to_df(spark, new), base, vocab=vocab, input_token="b2"
    )
    golden = _rows(res1.tables["edges"])
    # same batch again: no-op — nothing appended, nothing recomputed
    res2 = run_pipeline_append(
        spark, docs_to_df(spark, new), base, vocab=vocab, input_token="b2"
    )
    assert res2.executed == []
    assert _rows(res2.tables["edges"]) == golden


def test_plain_rerun_after_append_skips_everything(
    spark, vocab, tmp_path, split_corpus
):
    old, new, full = split_corpus
    base = str(tmp_path / "rerun")
    run_pipeline(
        spark, docs_to_df(spark, old), base, vocab=vocab, input_token="t100"
    )
    run_pipeline_append(
        spark, docs_to_df(spark, new), base, vocab=vocab, input_token="b2"
    )
    res = run_pipeline(
        spark, docs_to_df(spark, full), base, vocab=vocab,
        input_token="t100+b2",
    )
    assert res.executed == []


def test_append_requires_completed_run(spark, vocab, tmp_path, split_corpus):
    _, new, _ = split_corpus
    with pytest.raises(ValueError, match="completed prior run"):
        run_pipeline_append(
            spark, docs_to_df(spark, new), str(tmp_path / "empty"),
            vocab=vocab, input_token="b2",
        )
