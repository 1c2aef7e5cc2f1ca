"""kg/oracle_tables.py: the driver-side dimension parquets the DuckDB
oracles read must be deterministic, complete, and idempotent (no Spark)."""

import os

import pyarrow.parquet as pq

from kg.oracle import parse_segments
from kg.oracle_tables import ensure_kg_oracle_tables
from kg.synth import synth_docs


def test_flat_docs_match_driver_synth(tmp_path, vocab):
    paths = ensure_kg_oracle_tables(60, seed=42, fingerprint="t1", vocab=vocab)
    flat = pq.read_table(paths["flat"]).to_pylist()
    want = []
    for doc in synth_docs(60):
        for span in doc["spans"]:
            if span["kind"] == "text" and span["text"].strip():
                want.append(
                    {"doc_id": doc["doc_id"], "sent_offset": span["offset"], "text": span["text"]}
                )
    assert flat == want


def test_words_dim_complete_and_consistent(vocab):
    paths = ensure_kg_oracle_tables(60, seed=42, fingerprint="t1", vocab=vocab)
    words = {r["word"]: r for r in pq.read_table(paths["words"]).to_pylist()}
    flat = pq.read_table(paths["flat"]).to_pylist()
    seen = set()
    for row in flat:
        for w, _t in parse_segments(row["text"]):
            seen.add(w)
    assert seen <= set(words), "every corpus word must be in the dim table"
    for w in sorted(seen)[:200]:
        toks = vocab.tokenize(w)
        assert words[w]["n_tok"] == len(toks)
        assert words[w]["surface"] == "".join(
            t[2:] if t.startswith("##") else t for t in toks
        )


def test_idempotent_reuse(vocab):
    paths1 = ensure_kg_oracle_tables(60, seed=42, fingerprint="t1", vocab=vocab)
    m1 = {k: os.path.getmtime(v) for k, v in paths1.items()}
    paths2 = ensure_kg_oracle_tables(60, seed=42, fingerprint="t1", vocab=vocab)
    assert paths1 == paths2
    assert m1 == {k: os.path.getmtime(v) for k, v in paths2.items()}
    # a different fingerprint gets its own directory (stale-code isolation)
    paths3 = ensure_kg_oracle_tables(60, seed=42, fingerprint="t2", vocab=vocab)
    assert paths3["flat"] != paths1["flat"]


def test_simhash_dim_table_covers_corpus_and_tracks_content():
    """ADVICE r2: the simhash oracle inner-joins words against the dim
    table, silently dropping any missing word — assert full coverage via an
    anti-join; and the cache key must track file content (size+mtime), so
    a regenerated file at the same path gets a fresh table."""
    import duckdb

    from kg.oracle_tables import ensure_simhash_words

    src = "/root/testdata/sf0.01/documents.parquet"
    path = ensure_simhash_words(src)
    missing = duckdb.sql(
        f"""
        SELECT count(*) FROM (
          SELECT DISTINCT unnest(list_filter(string_split(text, ' '),
                                             x -> x <> '')) AS word
          FROM read_parquet('{src}')) w
        ANTI JOIN read_parquet('{path}') d USING (word)
        """
    ).fetchone()[0]
    assert missing == 0

    # content evidence in the key: same path, different mtime -> new table
    import os
    import shutil
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        cp = os.path.join(td, "documents.parquet")
        shutil.copy(src, cp)
        p1 = ensure_simhash_words(cp)
        os.utime(cp, ns=(os.stat(cp).st_atime_ns, os.stat(cp).st_mtime_ns + 10**9))
        p2 = ensure_simhash_words(cp)
        assert p1 != p2
