"""Keyphrase stage over the interleaved corpus (north_star "keyphrase stack").

Deterministic per-doc top-k 'o'-tagged words by term frequency (semantics
defined by kg/oracle.py:doc_keyphrases — the reference ships no keyphrase
code).  Entirely JVM-side: explode text spans -> whitespace segments ->
rsplit-once word/tag (reference ner/dataset.py:38,44 parse) -> filter
non-entity words of length >= 2 -> TF -> windowed top-k with deterministic
ties (freq desc, phrase asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kg.config import KEYPHRASE_TOP_K, TAGS


def keyphrases_table(docs: DataFrame, top_k: int = KEYPHRASE_TOP_K) -> DataFrame:
    # ONE shuffle total: repartition the compact doc rows by doc_id BEFORE
    # exploding — HashPartitioning(doc_id) satisfies both the (doc_id,
    # phrase) TF aggregation (subset clustering) and the per-doc top-k
    # window, and explode/filter preserve it, so neither re-shuffles the
    # ~60x-larger word rows.  (Previously: two word-row shuffles.)
    # r6 (guide §2.3 "project before the exchange"): only the text strings
    # cross the shuffle — media spans, media_refs, kinds and offsets are
    # dropped by the transform/filter projection first (the repartition of
    # the full span payload alone measured 2.7s at 1M docs).
    texts = F.expr(
        "transform(filter(spans, s -> s.kind = 'text' AND trim(s.text) <> ''),"
        " s -> s.text)"
    )
    sents = (
        docs.select("doc_id", texts.alias("ts"))
        .repartition("doc_id")
        .select("doc_id", F.explode("ts").alias("text"))
    )
    seg = F.explode(F.split(F.trim("text"), r"\s+")).alias("seg")
    segs = sents.select("doc_id", seg).where(F.col("seg") != "")
    tag = F.substring_index("seg", "/", -1)
    word = F.expr("substring(seg, 1, length(seg) - length(substring_index(seg, '/', -1)) - 1)")
    words = segs.select(
        "doc_id", word.alias("phrase"), tag.alias("tag")
    ).where(~F.col("tag").isin(*TAGS) & (F.length("phrase") >= 2))
    tf = words.groupBy("doc_id", "phrase").agg(F.count("*").alias("freq"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("freq"), F.asc("phrase"))
    return (
        tf.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("doc_id", "phrase", "freq", "rank")
    )
