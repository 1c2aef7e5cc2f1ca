"""End-to-end KG-construction pipeline with checkpointed, resumable stages.

Stage DAG (each stage is a committed parquet checkpoint via kg/catalog.py;
a resumed run recomputes only stages whose inputs changed):

    documents ──> extract ──> mentions ──> linked ──> nodes
        │            └──────> triples ───────┴─────> edges
        └──────> documents_out (span-sequence invariant proof)

Shuffle budget at scale (SURVEY.md §4): documents→extract is shuffle-free
(narrow explode + mapInPandas over input splits); mentions/triples are
narrow explodes of the extract checkpoint; the first shuffles appear at
entity linking (distinct + LSH bucket join) and the grouping aggregations of
nodes/edges — all keyed, AQE-coalesced, skew-join protected.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg.catalog import StageCatalog
from kg.graph import build_edges, build_nodes
from kg.invariant import passthrough_docs, span_violations
from kg.keyphrase import keyphrases_table
from kg.linking import link_mentions
from kg.mention import explode_text_spans, extract_sentences, mentions_table, triples_table
from kg.synth import corpus_vocab
from kg.tokenizer import Vocab


def input_fingerprint(docs: DataFrame) -> str:
    """Order-independent content fingerprint of the input corpus.

    One scan (bit_xor of per-row xxhash64 + count — xor, not sum: ANSI mode
    makes long sums overflow) so a resumed run detects a changed input and
    recomputes from the top; callers that already version their input
    (Iceberg snapshot id) can pass that instead via the stage's
    ``extra_inputs`` and skip the scan.
    """
    row = docs.select(
        F.bit_xor(F.xxhash64("doc_id", F.to_json("spans"))).alias("h"),
        F.count("*").alias("n"),
    ).collect()[0]
    return f"{row['n']}:{row['h']}"


@dataclass
class PipelineResult:
    tables: dict[str, DataFrame]
    catalog: StageCatalog
    executed: list[str] = field(default_factory=list)
    invariant_violations: int = 0
    timings: dict[str, float] = field(default_factory=dict)

    def counts(self) -> dict[str, int]:
        return {name: self.catalog.manifest(name)["rows"] for name in self.tables}


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    base_dir: str,
    vocab: Vocab | None = None,
    check_invariant: bool = True,
    input_token: str | None = None,
) -> PipelineResult:
    """``input_token``: caller-supplied input version (Iceberg snapshot id,
    synth parameters, ...).  When given, the change-detection scan of the
    input is skipped — the token is the fingerprint."""
    cat = StageCatalog(spark, base_dir)
    if vocab is None:
        vocab = corpus_vocab()

    timings: dict[str, float] = {}

    def timed(name: str, fn, **kw):
        t0 = time.perf_counter()
        out = cat.run(name, fn, **kw)
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    documents = timed(
        "documents",
        lambda: docs,
        extra_inputs={"__input__": input_token or input_fingerprint(docs)},
    )

    extract = timed(
        "extract",
        lambda: extract_sentences(explode_text_spans(cat.read("documents")), vocab),
        inputs=["documents"],
    )
    mentions = timed(
        "mentions", lambda: mentions_table(cat.read("extract")), inputs=["extract"]
    )
    triples = timed(
        "triples", lambda: triples_table(cat.read("extract")), inputs=["extract"]
    )
    # CC iterations inside linking checkpoint through the same catalog
    # (stage names linked_cc_iter*/linked_cc_final): a job killed mid-CC
    # resumes label propagation from the last durable round when the
    # "linked" stage itself re-runs.
    linked = timed(
        "linked",
        lambda: link_mentions(
            cat.read("mentions"), catalog=cat, stage_prefix="linked_cc"
        ),
        inputs=["mentions"],
    )
    # Published tables are hive-partitioned on their dominant access key
    # (VERDICT r2 item 6): nodes by entity kind, edges by predicate —
    # low-cardinality columns (|TAGS| and |TAGS|^2), so file counts stay
    # bounded while kind-/pred-selective readers get partition pruning at
    # the scan (tests/test_plans.py::test_published_tables_prune_partitions).
    # At the 10^12-doc design point: ~4*10^12 mention rows -> 3 kinds x
    # O(10k) files per kind for nodes; 9 preds for edges — pruning cuts a
    # one-pred consumer's scan 9x before a single row is read.
    nodes = timed(
        "nodes",
        lambda: build_nodes(cat.read("mentions"), cat.read("linked")),
        inputs=["mentions", "linked"],
        partition_by=["kind"],
    )
    edges = timed(
        "edges",
        lambda: build_edges(cat.read("triples"), cat.read("linked")),
        inputs=["triples", "linked"],
        partition_by=["pred"],
    )
    keyphrases = timed(
        "keyphrases",
        lambda: keyphrases_table(cat.read("documents")),
        inputs=["documents"],
    )
    documents_out = timed(
        "documents_out",
        lambda: passthrough_docs(cat.read("documents")),
        inputs=["documents"],
    )

    violations = 0
    if check_invariant:
        t0 = time.perf_counter()
        violations = span_violations(documents, documents_out).count()
        timings["invariant_check"] = round(time.perf_counter() - t0, 3)
        if violations:
            raise AssertionError(
                f"span-sequence invariant violated for {violations} docs"
            )

    tables = {
        "documents": documents,
        "extract": extract,
        "mentions": mentions,
        "triples": triples,
        "linked": linked,
        "nodes": nodes,
        "edges": edges,
        "keyphrases": keyphrases,
        "documents_out": documents_out,
    }
    return PipelineResult(
        tables=tables,
        catalog=cat,
        executed=list(cat.executed),
        invariant_violations=violations,
        timings=timings,
    )


def top_entity_pairs(edges: DataFrame, nodes: DataFrame, k: int = 20) -> DataFrame:
    """Flagship query: top canonical entity pairs by distinct-doc frequency."""
    pair_freq = (
        edges.groupBy("subj", "pred", "obj")
        .agg(
            F.countDistinct("doc_id").alias("doc_freq"),
            F.sum("weight").alias("total_weight"),
        )
    )
    subj_names = nodes.select(
        F.col("entity_id").alias("subj"), F.col("canonical_text").alias("subj_text")
    )
    obj_names = nodes.select(
        F.col("entity_id").alias("obj"), F.col("canonical_text").alias("obj_text")
    )
    return (
        pair_freq.join(F.broadcast(subj_names), "subj")
        .join(F.broadcast(obj_names), "obj")
        .select("subj_text", "pred", "obj_text", "doc_freq", "total_weight")
        .orderBy(F.desc("doc_freq"), F.desc("total_weight"), "subj_text", "obj_text", "pred")
        .limit(k)
    )
