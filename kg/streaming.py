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
- ``stateful_sessionize_stream``: CUSTOM stateful operator via
  ``applyInPandasWithState`` — per-user session assignment whose state
  (last event time, running session counter, per-session aggregates)
  survives across micro-batches, so sessions spanning trigger boundaries
  are stitched correctly.  Its fixed point equals the batch
  ``kg.relational.sessionize`` (asserted in tests).
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


SESSION_OUT_SCHEMA = (
    "user_id long, session_id long, n_events long, first_event_id long"
)
SESSION_STATE_SCHEMA = (
    "last_ts_us long, session_id long, n_events long, first_event_id long"
)


def stateful_sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user streaming sessionization with explicit GroupState.

    Semantics match the batch twin ``kg.relational.sessionize`` exactly
    (events ordered by (ts, event_id) per user; a gap > ``gap_minutes``
    opens a new session; ``first_event_id`` is the min event id in the
    session), under the standard streaming assumption that each user's
    events arrive in order across triggers (within a trigger the kernel
    sorts).  Each trigger emits the updated aggregate row of every session
    it touched — the LAST emission per (user_id, session_id) is the final
    value, so an update-mode sink converges to the batch result.

    State per user is four longs — O(users) state store, no window buffer:
    this is the applyInPandasWithState shape that scales to 10^9 users
    (state store is partitioned by the group key and checkpointed by the
    streaming engine; resuming from the checkpoint resumes the counters).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            last_ts, sid, n, first = state.get
        else:
            last_ts, sid, n, first = None, 0, 0, None
        touched: dict[int, tuple[int, int]] = {}
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, eid in zip(pdf["ts"], pdf["event_id"]):
                ts_us = int(ts.value // 1_000)  # pandas ns -> us
                if last_ts is None or ts_us - last_ts > gap_us:
                    sid += 1
                    n = 0
                    first = int(eid)
                n += 1
                first = min(first, int(eid))
                last_ts = ts_us
                touched[sid] = (n, first)
        state.update((last_ts, sid, n, first))
        yield pd.DataFrame(
            [(int(user_id), s, cnt, f) for s, (cnt, f) in sorted(touched.items())],
            columns=["user_id", "session_id", "n_events", "first_event_id"],
        )

    df = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return df.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
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
