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
    # ONE scan of the mentions table (r6; guide §1.2 "don't compute things
    # twice"): every mention row carries exactly one tag, so n_mentions per
    # canonical is the sum of its per-tag counts — the counts aggregation
    # derives from by_tag instead of re-scanning + re-joining mentions.
    # Shuffle payload is also pre-collapsed map-side: groupBy(mention, tag)
    # reduces the explode-scale mention rows to the (surface x tag)
    # vocabulary BEFORE the (broadcast) map join and the canonical agg.
    return build_nodes_from_counts(mention_tag_counts(mentions), mention_map)


def mention_tag_counts(mentions: DataFrame) -> DataFrame:
    """(mention, tag, cnt) — the vocabulary-sized sufficient statistic the
    nodes table derives from.  Additive under corpus growth, so the append
    path maintains it incrementally (run_pipeline_append's nodes_mtc
    stage) instead of re-scanning all mentions per append."""
    return mentions.groupBy("mention", "tag").agg(
        F.count("*").cast("long").alias("cnt")
    )


def build_nodes_from_counts(counts: DataFrame, mention_map: DataFrame) -> DataFrame:
    m = counts.join(mention_map, "mention")
    by_tag = m.groupBy("canonical", "tag").agg(F.sum("cnt").alias("tag_cnt"))
    w = Window.partitionBy("canonical").orderBy(F.desc("tag_cnt"), F.asc("tag"))
    modal = (
        by_tag.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("canonical", F.col("tag").alias("kind"))
    )
    counts = by_tag.groupBy("canonical").agg(
        F.sum("tag_cnt").cast("long").alias("n_mentions")
    )
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


def entity_pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iters: int = 3,
    catalog=None,
    stage_prefix: str = "pagerank",
    checkpoint_every: int = 1,
) -> DataFrame:
    """PageRank over the entity graph -> (entity_id, pagerank).

    Pregel-style power iteration expressed as DataFrame joins (the same
    shape GraphX/GraphFrames compile to): per iteration one shuffle keyed
    by destination (the contribution groupBy) plus a broadcast of the
    1-row dangling-mass aggregate — no driver-side collection of the rank
    vector at any point, so the operator scales with the edge table.
    Dangling nodes (no out-links) donate their mass uniformly, the
    standard stochastic-completion fix, so total rank stays 1.0 every
    iteration (asserted in tests/test_graph.py).

    ``n_iters`` is a FIXED unrolled count (no convergence probe): rank
    after k iterations is a closed-form function of the graph, which is
    what makes the operator independently replayable as unrolled SQL by
    the DuckDB oracle (entity_pagerank in __spark_entry__.py).  Output is
    rounded to 6 SIGNIFICANT figures on both sides (round at scale
    floor(log10(pr))-5): ranks are sums in different orders on different
    engines, so values land ~1e-15 RELATIVE off — a relative quantum of
    ~1e-6 keeps the boundary-straddle probability negligible at every
    graph size, where a fixed 6-DECIMAL quantum (ADVICE r3) collapsed to
    0.000000/one-ulp ties beyond ~10^6 nodes where ranks sit at or below
    1e-6 (ADVICE r4).  Ranks are strictly positive ((1-d)/n floor), so
    log10 is total.

    Fault tolerance (VERDICT r3 item 3, same argument as CC —
    kg/linking.py): ``localCheckpoint`` truncates lineage but dies with an
    executor.  With a ``StageCatalog``, every ``checkpoint_every``-th
    iteration is durably committed keyed by a content fingerprint of the
    link set (+ damping + n_iters), so a killed job resumes the power
    iteration from the last committed round; a completed run is returned
    straight from the final stage (tests/test_graph.py).

    Scale notes (100 TB): ``links``/``outdeg`` are computed once and
    reused every iteration (localCheckpoint; on a cluster: persist).
    """
    links = (
        edges.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    token = None
    final_stage = f"{stage_prefix}_final"
    if catalog is not None:
        # order-insensitive link-set fingerprint (same construction as CC's)
        row = links.select(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("hx"),
            F.sum(F.xxhash64("src", "dst").cast("decimal(28,0)")).alias("hs"),
        ).collect()[0]
        token = f"{row['n']}:{row['hx']}:{row['hs']}:d{damping}:k{n_iters}"
        if catalog.is_complete(final_stage, extra_inputs={"edges": token}):
            return catalog.read(final_stage)
    nodes = (
        links.select(F.col("src").alias("node"))
        .union(links.select("dst"))
        .distinct()
        .localCheckpoint()
    )
    outdeg = links.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    n = nodes.select(F.count("*").cast("double").alias("n"))

    # state: (node, deg nullable, pr); deg carried so the dangling aggregate
    # and the contribution join never re-join outdeg
    state = (
        nodes.join(outdeg, nodes["node"] == outdeg["src"], "left")
        .crossJoin(F.broadcast(n))
        .select("node", "deg", (F.lit(1.0) / F.col("n")).alias("pr"), "n")
        .localCheckpoint()
    )
    start_iter = 0
    if catalog is not None:
        from kg.linking import _committed_cc_iters

        done = [
            d
            for d in _committed_cc_iters(catalog, stage_prefix, token)
            if d <= n_iters
        ]
        if done:
            start_iter = done[-1]
            state = catalog.read(f"{stage_prefix}_iter{done[-1]:03d}")
    for it in range(start_iter, n_iters):
        dangling = state.where(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dang")
        )
        contribs = (
            links.join(state, links["src"] == state["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("contrib"))
            .select(F.col("dst").alias("node"), "contrib")
        )
        state = (
            state.select("node", "deg", "n")
            .join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "deg",
                (
                    (1.0 - damping) / F.col("n")
                    + damping
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dang") / F.col("n")
                    )
                ).alias("pr"),
                "n",
            )
            .localCheckpoint()
        )
        if (
            catalog is not None
            and (it + 1) < n_iters
            and (it + 1) % checkpoint_every == 0
        ):
            frozen = state
            state = catalog.run(
                f"{stage_prefix}_iter{it + 1:03d}",
                lambda: frozen,
                extra_inputs={"edges": token},
            )
    # 6 significant figures: quantum = 10^(floor(log10(pr)) - 5).  The
    # round-scale argument must be foldable in Spark, so the per-row scale
    # is expressed arithmetically: round(pr/q) * q — identical double ops
    # in the DuckDB twin (_pagerank_ctes in __spark_entry__.py).
    q = F.pow(F.lit(10.0), F.floor(F.log10("pr")) - F.lit(5))
    result = state.select(
        F.col("node").alias("entity_id"),
        (F.round(F.col("pr") / q, 0) * q).alias("pagerank"),
    )
    if catalog is not None:
        return catalog.run(
            final_stage, lambda: result, extra_inputs={"edges": token}
        )
    return result
