import json
import time

from pyspark.sql import functions as F

from kg.keyphrase import keyphrases_table
from kg.oracle import doc_keyphrases
from kg.sources import load_tag_queries, read_tagged_corpus
from kg.streaming import windowed_event_counts
from kg.synth import docs_to_df, synth_docs

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_read_tagged_corpus_shape(spark, tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text("中共中央/nt 致/o 贺词/o\n\n北京/ns 上海/ns\n", encoding="utf-8")
    docs = read_tagged_corpus(spark, str(p))
    rows = docs.collect()
    assert len(rows) == 2  # blank line dropped
    for r in rows:
        assert r.doc_id.startswith("line-")
        assert len(r.spans) == 1 and r.spans[0].kind == "text" and r.spans[0].offset == 0
    # pipes straight into the extract path
    from kg.mention import explode_text_spans

    assert explode_text_spans(docs).count() == 2


def test_load_tag_queries_reference_format(tmp_path):
    # data/questions.json format (keys lowercased, ner/dataset.py:31)
    p = tmp_path / "questions.json"
    p.write_text(
        json.dumps({"0": {"tag": "NS", "query": "q1"}, "1": {"tag": "NT", "query": "q2"}}),
        encoding="utf-8",
    )
    assert load_tag_queries(str(p)) == {"ns": "q1", "nt": "q2"}
    got = load_tag_queries("/root/reference/data/questions.json")
    assert sorted(got) == ["nr", "ns", "nt"]


def test_keyphrases_match_oracle(spark):
    docs = synth_docs(50)
    want = []
    for d in docs:
        want.extend(
            (k["doc_id"], k["phrase"], k["freq"], k["rank"]) for k in doc_keyphrases(d)
        )
    got = [
        (r.doc_id, r.phrase, r.freq, r.rank)
        for r in keyphrases_table(docs_to_df(spark, docs)).collect()
    ]
    assert sorted(got) == sorted(want)


def test_windowed_event_counts_stream_equals_batch(spark, tmp_path):
    batch = spark.read.parquet(EVENTS)
    want = sorted(map(str, windowed_event_counts(batch).collect()))

    # file-source streams need a directory; stage the single parquet file
    import shutil

    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(EVENTS, stream_dir / "part-0.parquet")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(map(str, spark.sql("select * from wincounts").collect()))
    finally:
        q.stop()
    assert got == want
