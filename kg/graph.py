"""Graph materialization: partitioned node/edge tables (SURVEY.md §7.1 step 8).

nodes(entity_id, canonical_text, kind, n_mentions)
edges(subj, pred, obj, doc_id, weight)   — subj/obj are entity_ids

entity_id is a content hash of the canonical surface (sha2/256, 16 hex) so
ids are stable across runs and cluster sizes (no monotonically_increasing_id,
which is partition-layout-dependent and would break resume byte-identity).
``kind`` is the modal mention tag with deterministic ties (count desc, tag asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def entity_id(col):
    return F.substring(F.sha2(col, 256), 1, 16)


def build_nodes(mentions: DataFrame, mention_map: DataFrame) -> DataFrame:
    m = mentions.join(mention_map, "mention")
    by_tag = m.groupBy("canonical", "tag").agg(F.count("*").alias("tag_cnt"))
    w = Window.partitionBy("canonical").orderBy(F.desc("tag_cnt"), F.asc("tag"))
    modal = (
        by_tag.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("canonical", F.col("tag").alias("kind"))
    )
    counts = m.groupBy("canonical").agg(F.count("*").alias("n_mentions"))
    return (
        counts.join(modal, "canonical")
        .select(
            entity_id(F.col("canonical")).alias("entity_id"),
            F.col("canonical").alias("canonical_text"),
            "kind",
            "n_mentions",
        )
    )


def build_edges(triples: DataFrame, mention_map: DataFrame) -> DataFrame:
    subj_map = mention_map.select(
        F.col("mention").alias("subj"), F.col("canonical").alias("subj_canonical")
    )
    obj_map = mention_map.select(
        F.col("mention").alias("obj"), F.col("canonical").alias("obj_canonical")
    )
    return (
        triples.join(subj_map, "subj")
        .join(obj_map, "obj")
        .groupBy("subj_canonical", "pred", "obj_canonical", "doc_id")
        .agg(F.count("*").cast("double").alias("weight"))
        .select(
            entity_id(F.col("subj_canonical")).alias("subj"),
            "pred",
            entity_id(F.col("obj_canonical")).alias("obj"),
            "doc_id",
            "weight",
        )
    )
