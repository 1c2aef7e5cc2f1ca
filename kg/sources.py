"""Sources (SURVEY.md §2.1): line-corpus scan, tag-query config scan.

S1 — the reference iterates a UTF-8 text file of tagged sentences
(ner/dataset.py:36-37); here that becomes ``spark.read.text`` feeding the
same downstream pipeline, one document per line.
S2 — the tag→query JSON config (data/questions.json, loaded+lowercased at
ner/dataset.py:23-32) becomes a driver-side load broadcast as a 3-row map.
S3 — the vocab-file scan (tokenization.py:5-10) is Vocab.load in
kg/tokenizer.py.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg.synth import SPANS_SCHEMA  # noqa: F401  (shape documentation)


def read_tagged_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented tagged corpus -> interleaved-docs shape (S1).

    One document per distinct non-empty line; doc_id is a content hash
    (line order is not meaningful to the reference pipeline — every
    sentence is an independent example, ner/dataset.py:37 — and duplicate
    lines would collide on the content-addressed doc_id).
    """
    lines = (
        spark.read.text(path)
        .select(F.trim("value").alias("text"))
        .where(F.col("text") != "")
        .distinct()
    )
    return lines.select(
        F.concat(F.lit("line-"), F.substring(F.sha2("text", 256), 1, 16)).alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )


def load_tag_queries(path: str) -> dict[str, str]:
    """questions.json-format config -> {tag(lower): query} (S2;
    mirrors get_tag2query's key lowercasing, ner/dataset.py:31)."""
    with open(path, encoding="utf-8") as f:
        tags = json.load(f)
    return {entry["tag"].lower(): entry["query"] for entry in tags.values()}
