"""Append-only linking signature table (round 5).

The 100-TB growth shape: on append, the only Python in the linking tail —
the Arrow signature kernel — must run over NEVER-BEFORE-SEEN mention
strings only, not the full distinct mention set.  Signatures are pure
per-row functions, so the persisted table stays exactly equal to a fresh
kernel pass; a catalog dir reused for a DIFFERENT (non-superset) corpus
must detect the stale rows and rebuild from scratch.
"""

import pytest

import kg.linking as L
from kg.pipeline import run_pipeline, run_pipeline_append
from kg.synth import docs_to_df, synth_docs


def _rows(df):
    return sorted(map(str, df.collect()))


@pytest.fixture()
def kernel_spy(monkeypatch):
    """Record the input row count of every signature-kernel invocation."""
    calls = []
    real = L.mention_shingle_buckets

    def spy(df):
        calls.append(df.count())
        return real(df)

    monkeypatch.setattr(L, "mention_shingle_buckets", spy)
    return calls


def test_append_kernel_runs_only_on_new_mentions(
    spark, vocab, tmp_path, kernel_spy
):
    docs = synth_docs(160)
    old, new = docs[:120], docs[120:]
    base = str(tmp_path / "inc")
    res_old = run_pipeline(
        spark, docs_to_df(spark, old), base, vocab=vocab, input_token="a"
    )
    m_old = {
        r["mention"]
        for r in res_old.tables["mentions"].select("mention").distinct().collect()
    }
    n_fresh_calls = len(kernel_spy)
    res = run_pipeline_append(
        spark, docs_to_df(spark, new), base, vocab=vocab, input_token="b"
    )
    m_all = {
        r["mention"]
        for r in res.tables["mentions"].select("mention").distinct().collect()
    }
    expected_new = len(m_all) - len(m_old)
    assert expected_new > 0, "fixture must introduce new mentions"
    appended_kernel_rows = sum(kernel_spy[n_fresh_calls:])
    assert appended_kernel_rows == expected_new  # kernel saw ONLY the delta
    # the signature stage was appended, not rebuilt, and says so
    assert "linked_cc_sigs+append" in res.executed
    assert "linked_cc_sigs" not in res.executed
    # persisted signature table covers exactly the full distinct mention set
    assert res.catalog.manifest("linked_cc_sigs")["rows"] == len(m_all)


def test_changed_corpus_rebuilds_stale_signature_table(spark, vocab, tmp_path):
    """A fresh run over a DIFFERENT, non-superset corpus into the same
    base_dir must not let stale signature rows leak into linking: stale
    mentions could bridge CC components and change canonical labels."""
    docs = synth_docs(140)
    base = str(tmp_path / "reused")
    run_pipeline(
        spark, docs_to_df(spark, docs[:120]), base, vocab=vocab, input_token="a"
    )
    res = run_pipeline(
        spark, docs_to_df(spark, docs[60:140]), base, vocab=vocab,
        input_token="c",
    )
    clean = run_pipeline(
        spark, docs_to_df(spark, docs[60:140]), str(tmp_path / "clean"),
        vocab=vocab, input_token="c",
    )
    for name in clean.tables:
        assert _rows(res.tables[name]) == _rows(clean.tables[name]), name
    # the stale table was rebuilt (full write), not appended to
    assert "linked_cc_sigs" in res.executed
    assert res.catalog.manifest("linked_cc_sigs")["rows"] == (
        clean.catalog.manifest("linked_cc_sigs")["rows"]
    )


def test_noop_reappend_never_touches_kernel(
    spark, vocab, tmp_path, kernel_spy
):
    docs = synth_docs(130)
    base = str(tmp_path / "idem")
    run_pipeline(
        spark, docs_to_df(spark, docs[:100]), base, vocab=vocab, input_token="a"
    )
    run_pipeline_append(
        spark, docs_to_df(spark, docs[100:]), base, vocab=vocab, input_token="b"
    )
    n_before = len(kernel_spy)
    res2 = run_pipeline_append(
        spark, docs_to_df(spark, docs[100:]), base, vocab=vocab, input_token="b"
    )
    assert res2.executed == []
    assert len(kernel_spy) == n_before  # idempotent no-op: zero kernel work
