"""Structured Streaming surface.

The reference has NO streaming semantics (static corpus file,
ner/dataset.py:36; SURVEY.md §2.9) — batch + resume ledger is the primary
design.  This module provides the incremental-ingestion path a production
deployment would bolt on, built from the same kernels:

- ``stream_extract``: file-source stream of interleaved docs -> the SAME
  fused extract kernel (kg/mention.py) -> append-mode parquet sink with a
  streaming checkpoint.  Stateless, so exactly-once comes from the file
  source + sink commit log.
- ``windowed_event_counts``: watermarked sliding-window aggregation over an
  event stream (late data handled by the watermark) — the standard
  Structured Streaming stateful pattern, tested against its batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg.mention import EXTRACT_SCHEMA, explode_text_spans, extract_sentences
from kg.synth import DOCS_SCHEMA
from kg.tokenizer import Vocab


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    vocab: Vocab,
    max_files_per_trigger: int = 4,
):
    """Incremental mention/relation extraction over arriving doc files."""
    docs = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    extracted = extract_sentences(explode_text_spans(docs), vocab)
    return (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def windowed_event_counts(events: DataFrame, watermark: str = "1 hour", window: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window counts per event_type (works on both a
    streaming and a batch DataFrame — the batch run is the test oracle)."""
    # watermarks require TIMESTAMP (with tz); parquet NTZ timestamps are cast
    # (session tz is pinned to UTC in kg/session.py, so the cast is lossless)
    df = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )
