"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG query end-to-end on sf0.001.
``queries()`` exposes every implemented operator (SURVEY.md §2 + the
training-data ops).  Every deterministic query — including the full KG
pipeline: mention extraction, REL_WINDOW triple pairing, MinHash/LSH/CC
entity linking, node/edge materialization, keyphrases — has a DuckDB oracle
in ``oracle_sql()`` (the KG ones read driver-side dimension parquets, see
kg/oracle_tables.py).  All queries are hash-checked against an independent
SQL replay — even ``simhash``/``simhash_neardup`` (pure-Python XXH64
dimension table, kg/xxh64.py) and the hyperplane-LSH paths (plane weights
as a dimension parquet; sign margins are ten orders above float noise, so
the buckets replay engine-independently) — with exactly two exceptions:

- ``approx_distinct_users``: rows-only (HLL sketch internals are
  engine-specific); gated by a <=5% realized-error test instead.
- ``kg_span_invariant``: the oracle is a constant empty SELECT — a
  ZERO-EXPECTATION check, not an independent derivation (ADVICE r2).  The
  violation set compares pipeline input against pipeline OUTPUT, which the
  SQL oracle cannot see by construction; the non-trivial evidence lives in
  tests/test_invariant.py (mutation tests prove the check fires on real
  sequence damage).
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg import relational as R
from kg.ops import dedup as D
from kg.ops import similarity as S
from kg.ops import textstats as TS
from kg.ops.multimodal import extract_features, media_table
from kg.graph import entity_pagerank
from kg.pipeline import run_pipeline, top_entity_pairs
from kg.synth import corpus_vocab, sf_to_n_docs, synth_docs_df

# ---------------------------------------------------------------------------
# KG pipeline memo: one checkpointed run per scale, shared by all kg_* queries
# (the resume catalog makes repeat calls free).
# ---------------------------------------------------------------------------

_VOCAB = None


def _vocab():
    global _VOCAB
    if _VOCAB is None:
        _VOCAB = corpus_vocab()
    return _VOCAB


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.01


def _oracle_sf_dir() -> str:
    """The sf_dir the oracle SQL is generated against (ADVICE r2): the
    driver compares at sf0.01, but tools/check_oracles.py threads any other
    sf through this env var so the dimension-table builders, probe keys and
    corpus sizing stay consistent with the Spark side instead of silently
    mismatching."""
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


_CODE_FP = None


def _code_fingerprint() -> str:
    """Hash of the shipped kg package: stale /tmp checkpoints from an older
    code version must not satisfy a newer run's correctness checks."""
    global _CODE_FP
    if _CODE_FP is None:
        import hashlib

        from kg.session import make_pyfiles_zip

        with open(make_pyfiles_zip(), "rb") as f:
            _CODE_FP = hashlib.sha256(f.read()).hexdigest()[:10]
    return _CODE_FP


def _kg_result(spark: SparkSession, sf_dir: str):
    sf = _sf_of(sf_dir)
    n_docs = sf_to_n_docs(sf)
    base = os.path.join("/tmp", f"kg_ckpt_sf{sf}_{_code_fingerprint()}")
    docs = synth_docs_df(spark, n_docs)
    return run_pipeline(
        spark,
        docs,
        base,
        vocab=_vocab(),
        input_token=f"synth:{n_docs}:42",
        check_invariant=False,  # kg_span_invariant exposes the check itself
    )


def _kg_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return _kg_result(spark, sf_dir).tables


def _q_entity_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The entry query runs THROUGH the stage catalog (VERDICT r4 item 5):
    the oracle-checked artifact is the same durable-rounds code path the
    resilience tests exercise, not a localCheckpoint-only variant."""
    res = _kg_result(spark, sf_dir)
    return entity_pagerank(res.tables["edges"], catalog=res.catalog)


# ---------------------------------------------------------------------------
# entry — flagship query on sf0.001
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    tables = _kg_tables(spark, "/root/testdata/sf0.001")
    return top_entity_pairs(tables["edges"], tables["nodes"], k=20)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_embedding_query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        R.load(spark, sf_dir, "embeddings").where(F.col("vec_id") == 0).collect()[0]
    )
    return [float(x) for x in row["embedding"]]


import functools


@functools.lru_cache(maxsize=None)
def _lsh_geometry(sf_dir: str) -> tuple[int, int]:
    """(n_planes, n_tables) for the LSH entry queries, derived from the
    embedding cardinality at ``sf_dir`` with the SAME auto_lsh_config the
    library defaults use — computed driver-side (duckdb metadata count, no
    Spark job) so the Spark query and its SQL replay derive identical
    geometry at every sf.  This makes the auto-sizing itself
    oracle-checked: at sf1 the pair family runs at 12x8, at sf0.01 at 5x3,
    both hash-compared.  Memoized per sf_dir (ADVICE r4): one DuckDB count
    total, however many query/oracle builders ask."""
    import duckdb as _duckdb

    n = (
        _duckdb.connect()
        .execute(
            f"SELECT count(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
        )
        .fetchone()[0]
    )
    return S.auto_lsh_config(n)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # SURVEY.md §2 relational operators (SQL-checked)
        "seg_wordcount": R.seg_wordcount,
        "word_tag_split": R.word_tag_split,
        "tag_filter": R.tag_filter,
        "threshold_filter": R.threshold_filter,
        "range_self_join": R.range_self_join,
        "cross_expand": R.cross_expand,
        "span_conjunction": R.span_conjunction,
        "tp_fp_fn": R.tp_fp_fn,
        "prf1": R.prf1,
        "lineitem_agg": R.lineitem_agg,
        "revenue_by_nation": R.revenue_by_nation,
        "order_window": R.order_window,
        "union_nation_parties": R.union_nation_parties,
        "keyphrases_top5": R.keyphrases_top5,
        "asof_join": R.asof_join,
        "sessionize": R.sessionize,
        "lineitem_rollup": R.lineitem_rollup,
        "events_cube": R.events_cube,
        "events_pivot": R.events_pivot,
        "value_percentiles": R.value_percentiles,
        "distinct_users": R.distinct_users,
        "approx_distinct_users": R.approx_distinct_users,  # HLL: rows-only
        "masked_loss": R.masked_loss,  # A2: masked-mean BCE-with-logits agg
        # training-data ops (SQL-checked)
        "dedup_exact": lambda s, d: D.exact_duplicates(
            R.load(s, d, "documents").select(
                F.col("doc_id").cast("bigint").alias("doc_id"), "text"
            )
        ),
        "word_jaccard_pairs": lambda s, d: D.word_jaccard_pairs(
            R.load(s, d, "documents"), min_jaccard=0.5, same_key="source"
        ),
        "lang_id": lambda s, d: TS.lang_id(R.load(s, d, "documents")),
        "quality_score": lambda s, d: TS.quality_score(R.load(s, d, "documents")),
        "token_counts": lambda s, d: TS.token_counts(R.load(s, d, "documents")),
        "fingerprint": lambda s, d: TS.fingerprint(R.load(s, d, "documents")),
        "embedding_nn_pairs": lambda s, d: S.embedding_nn_pairs(
            R.load(s, d, "embeddings"), threshold=0.4
        ),
        # geometry derives from the embedding cardinality via auto_lsh_config
        # on BOTH sides (_lsh_geometry drives the plane dim table too), so
        # the auto-sizing is itself SQL-checked at every sf
        "embedding_nn_pairs_lsh": lambda s, d: S.embedding_nn_pairs_lsh(
            R.load(s, d, "embeddings"), dim=64, threshold=0.4,
            n_planes=_lsh_geometry(d)[0], n_tables=1,
        ),  # bucketed-approximate vs exact pairs, SQL-checked (plane dim table)
        # OR-construction recall path (auto planes x tables; recall >= 0.9 on
        # planted near-dups gated in tests/test_ops.py); SQL-checked too
        "embedding_nn_pairs_lsh_multi": lambda s, d: S.embedding_nn_pairs_lsh(
            R.load(s, d, "embeddings"), dim=64, threshold=0.4,
            n_planes=_lsh_geometry(d)[0], n_tables=_lsh_geometry(d)[1],
        ),
        "cosine_topk": lambda s, d: S.cosine_topk(
            R.load(s, d, "embeddings"), _q_embedding_query_vec(s, d), k=10
        ),
        # SQL-checked via dimension parquets / generated SQL (module doc)
        "simhash": lambda s, d: D.simhash64(R.load(s, d, "documents")),
        # banded-hamming join has perfect recall at radius 3 (pigeonhole),
        # so the oracle is the clean brute-force predicate — exact equality
        "simhash_neardup": lambda s, d: D.simhash_neardup(
            R.load(s, d, "documents"), max_hamming=3
        ),
        "minhash_clusters": lambda s, d: D.minhash_clusters(
            R.load(s, d, "documents")
        ),
        # approximate vs exact NN by design, but deterministic: SQL-checked
        # via the plane-weight dim table; recall@10 >= 0.9 pytest gate too
        "ann_lsh": lambda s, d: S.lsh_ann(
            R.load(s, d, "embeddings"), _q_embedding_query_vec(s, d), k=10,
            n_planes=_lsh_geometry(d)[0], n_tables=_lsh_geometry(d)[1],
        ),
        "cosine_topk_np": lambda s, d: S.cosine_topk_np(
            R.load(s, d, "embeddings"), _q_embedding_query_vec(s, d), k=10
        ),
        # KG pipeline (all SQL-checked; plus exact-parity pytest gates)
        "kg_mentions": lambda s, d: _kg_tables(s, d)["mentions"],
        "kg_triples": lambda s, d: _kg_tables(s, d)["triples"],
        "kg_linked": lambda s, d: _kg_tables(s, d)["linked"],
        "kg_nodes": lambda s, d: _kg_tables(s, d)["nodes"],
        "kg_edges": lambda s, d: _kg_tables(s, d)["edges"],
        "kg_keyphrases": lambda s, d: _kg_tables(s, d)["keyphrases"],
        "kg_top_pairs": lambda s, d: top_entity_pairs(
            _kg_tables(s, d)["edges"], _kg_tables(s, d)["nodes"], k=20
        ),
        "kg_span_invariant": lambda s, d: _kg_invariant(s, d),
        # iterative graph analytics over the published entity graph:
        # fixed-iteration PageRank (pregel-shaped joins, kg/graph.py) with
        # durable rounds through the pipeline's StageCatalog, replayed by
        # the oracle as closed-form unrolled SQL
        "entity_pagerank": _q_entity_pagerank,
        # features posexploded to scalar rows: the driver's canonicalizer
        # sorts columns and cannot order an array<float> column (VERDICT r1).
        # SQL-checked via media dimension parquets (decode itself remains a
        # declared stub; the plumbing is what the oracle replays).
        "media_features": lambda s, d: extract_features(
            media_table(_kg_tables(s, d)["documents"])
        ).select(
            "media_ref", "kind", F.posexplode("features").alias("i", "feature")
        ),
    }
    return q


def _kg_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kg.invariant import span_violations

    t = _kg_tables(spark, sf_dir)
    return span_violations(t["documents"], t["documents_out"]).select("doc_id")


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect; same parquet tables pre-registered as views)
# ---------------------------------------------------------------------------


def tolerance_oracles() -> dict[str, tuple[str, list[str], float]]:
    """Bounded-delta witnesses for queries that are approximate BY DESIGN
    and therefore have no hash oracle (VERDICT r4 item 7).  Not part of
    the driver contract (the driver hash-compares ``oracle_sql`` only —
    registering these there would mis-flag engine-specific sketch noise as
    a correctness failure); tools/check_oracles.py runs them and asserts
    every approximate cell lands within ``rtol`` of DuckDB's independent
    estimate, joined on the exact key columns.

    Value: (sql, key_columns, rtol).  rtol 0.10: each engine's HLL is
    gated at <=5% realized error vs exact (tests/test_relational_ops.py),
    so engine-vs-engine agrees within ~10%."""
    return {
        "approx_distinct_users": (
            """
            SELECT event_type,
                   approx_count_distinct(user_id)::bigint AS approx_users
            FROM events GROUP BY event_type
            """,
            ["event_type"],
            0.10,
        ),
    }


def oracle_sql() -> dict[str, str]:
    o = _oracle_sql_static()
    # identical semantics, different execution strategy (Arrow/NumPy kernel
    # vs JVM higher-order functions): same oracle applies to both.
    o["cosine_topk_np"] = o["cosine_topk"]
    o["minhash_clusters"] = _minhash_clusters_sql()
    o["simhash"] = _simhash_sql()
    o["simhash_neardup"] = _simhash_neardup_sql()
    o["embedding_nn_pairs_lsh"] = _nn_pairs_lsh_sql()
    o["embedding_nn_pairs_lsh_multi"] = _nn_pairs_lsh_multi_sql()
    o["ann_lsh"] = _ann_lsh_sql()
    o["media_features"] = _media_features_sql()
    o.update(_kg_oracle_sqls())
    return o


def _media_features_sql() -> str:
    """DuckDB replay of media_features: per-ref feature vectors are a pure
    scalar of media_ref shipped as a dimension parquet (same rule as the
    tokenizer words table — kg/oracle_tables.py ensure_media_tables); the
    SQL independently re-derives the distributed plumbing: media-span
    enumeration, ref dedup, the feature join, posexplode indexing."""
    from kg.oracle_tables import ensure_media_tables

    n_docs = sf_to_n_docs(_sf_of(_oracle_sf_dir()))
    paths = ensure_media_tables(n_docs, seed=42, fingerprint=_code_fingerprint())
    return f"""
        WITH refs AS (
          SELECT DISTINCT media_ref, kind
          FROM read_parquet('{paths["spans"]}'))
        SELECT r.media_ref, r.kind, f.i, f.feature
        FROM refs r JOIN read_parquet('{paths["feats"]}') f USING (media_ref)
    """


_EMB_FLAT_CTE = """
        f AS (
          SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                 unnest(embedding)::double AS v
          FROM embeddings),
        n AS (SELECT vec_id, sum(v * v) AS n2 FROM f GROUP BY vec_id)"""


def _nn_pairs_lsh_sql() -> str:
    """DuckDB replay of embedding_nn_pairs_lsh (dim=64, auto-sized planes,
    single table, seed 13, threshold 0.4): plane weights come from a
    driver-side dimension parquet sized by the SAME _lsh_geometry the Spark
    query uses; the sign-pattern bucket, bucket-equal candidate pairs, and
    the rounded cosine verify are plain SQL.  Sign margins are ~4e-4 on
    this data — engine-independent (kg/oracle_tables.py
    ensure_plane_weights)."""
    from kg.oracle_tables import ensure_plane_weights

    n_planes, _ = _lsh_geometry(_oracle_sf_dir())
    planes = ensure_plane_weights(64, n_planes, 1, 13, fingerprint=_code_fingerprint())
    return f"""
        WITH {_EMB_FLAT_CTE},
        proj AS (
          SELECT f.vec_id, pw.p, sum(f.v * pw.w) AS s
          FROM f JOIN read_parquet('{planes}') pw USING (i)
          GROUP BY f.vec_id, pw.p),
        bkt AS (
          SELECT vec_id,
                 string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, ''
                            ORDER BY p) AS bucket
          FROM proj GROUP BY vec_id),
        cand AS (
          SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
          FROM bkt a JOIN bkt b
            ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
        d AS (
          SELECT c.vec_id_a, c.vec_id_b, sum(fa.v * fb.v) AS dot
          FROM cand c
          JOIN f fa ON fa.vec_id = c.vec_id_a
          JOIN f fb ON fb.vec_id = c.vec_id_b AND fb.i = fa.i
          GROUP BY c.vec_id_a, c.vec_id_b)
        SELECT vec_id_a, vec_id_b,
               round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 4) AS cosine
        FROM d
        JOIN n na ON na.vec_id = vec_id_a
        JOIN n nb ON nb.vec_id = vec_id_b
        WHERE round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 4) >= 0.4
    """


def _nn_pairs_lsh_multi_sql() -> str:
    """DuckDB replay of the OR-construction pair path (auto-sized planes x
    tables, from the same _lsh_geometry as the Spark query): per-table
    sign-pattern buckets from the multi-table plane-weight dim parquet,
    DISTINCT candidate pairs colliding in ANY table, rounded cosine verify
    at 0.4 (same engine-independence argument as _nn_pairs_lsh_sql)."""
    from kg.oracle_tables import ensure_plane_weights

    n_planes, n_tables = _lsh_geometry(_oracle_sf_dir())
    planes = ensure_plane_weights(
        64, n_planes, n_tables, 13, fingerprint=_code_fingerprint()
    )
    return f"""
        WITH {_EMB_FLAT_CTE},
        proj AS (
          SELECT pw.tbl, f.vec_id, pw.p, sum(f.v * pw.w) AS s
          FROM f JOIN read_parquet('{planes}') pw USING (i)
          GROUP BY pw.tbl, f.vec_id, pw.p),
        keys AS (
          SELECT tbl, vec_id,
                 string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, ''
                            ORDER BY p) AS bucket
          FROM proj GROUP BY tbl, vec_id),
        cand AS (
          SELECT DISTINCT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
          FROM keys a JOIN keys b
            ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        d AS (
          SELECT c.vec_id_a, c.vec_id_b, sum(fa.v * fb.v) AS dot
          FROM cand c
          JOIN f fa ON fa.vec_id = c.vec_id_a
          JOIN f fb ON fb.vec_id = c.vec_id_b AND fb.i = fa.i
          GROUP BY c.vec_id_a, c.vec_id_b)
        SELECT vec_id_a, vec_id_b,
               round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 4) AS cosine
        FROM d
        JOIN n na ON na.vec_id = vec_id_a
        JOIN n nb ON nb.vec_id = vec_id_b
        WHERE round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 4) >= 0.4
    """


def _ann_lsh_sql() -> str:
    """DuckDB replay of lsh_ann (auto-sized tables x planes, Hamming-radius-2
    multi-probe, k=10): per-vector bucket keys are re-derived in SQL from
    the plane-weight dimension parquet; the query's probe-key set (computed
    driver-side with the same NumPy planes) is inlined as VALUES; the final
    top-k matches the cosine_topk oracle's rounded ranking."""
    import duckdb as _duckdb
    import numpy as np

    from kg.ops.similarity import _planes, _probe_keys
    from kg.oracle_tables import ensure_plane_weights

    n_planes, n_tables = _lsh_geometry(_oracle_sf_dir())
    planes_path = ensure_plane_weights(
        64, n_planes, n_tables, 13, fingerprint=_code_fingerprint()
    )
    emb_path = os.path.join(_oracle_sf_dir(), "embeddings.parquet")
    q = (
        _duckdb.connect()
        .execute(
            f"SELECT embedding FROM read_parquet('{emb_path}') WHERE vec_id = 0"
        )
        .fetchone()[0]
    )
    qv = np.asarray(q, dtype=np.float64)
    probe_rows = []
    for t in range(n_tables):
        qsigns = (_planes(64, n_planes, 13 + t) @ qv) >= 0
        probe_rows += [(t, key) for key in _probe_keys(qsigns, 2)]
    probes = ", ".join(f"({t}, '{k}')" for t, k in probe_rows)
    return f"""
        WITH {_EMB_FLAT_CTE},
        proj AS (
          SELECT pw.tbl, f.vec_id, pw.p, sum(f.v * pw.w) AS s
          FROM f JOIN read_parquet('{planes_path}') pw USING (i)
          GROUP BY pw.tbl, f.vec_id, pw.p),
        keys AS (
          SELECT tbl, vec_id,
                 string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, ''
                            ORDER BY p) AS bucket
          FROM proj GROUP BY tbl, vec_id),
        probes(tbl, bucket) AS (VALUES {probes}),
        cand AS (SELECT DISTINCT vec_id FROM keys JOIN probes USING (tbl, bucket)),
        qf AS (SELECT i, v FROM f WHERE vec_id = 0),
        qn AS (SELECT sum(v * v) AS qn2 FROM qf),
        dots AS (
          SELECT f.vec_id, sum(f.v * qf.v) AS dot
          FROM f JOIN cand USING (vec_id) JOIN qf USING (i)
          GROUP BY f.vec_id)
        SELECT d.vec_id, round(d.dot / (sqrt(n.n2) * sqrt(qn.qn2)), 4) AS cosine
        FROM dots d JOIN n ON n.vec_id = d.vec_id, qn
        ORDER BY round(d.dot / (sqrt(n.n2) * sqrt(qn.qn2)), 4) DESC, d.vec_id ASC
        LIMIT 10
    """


def _simhash_sig_ctes() -> str:
    """Shared WITH-body deriving ``sigs(doc_id, simhash)`` in DuckDB:
    per-word xxhash64 comes from a driver-side dimension parquet
    (pure-Python XXH64, kg/xxh64.py — equivalence with Spark pinned in
    tests); the SQL re-derives the 64 term-weighted bit votes and composes
    the signed signature (bit 63 wraps through hugeint arithmetic)."""
    from kg.oracle_tables import ensure_simhash_words

    dim = ensure_simhash_words(
        os.path.join(_oracle_sf_dir(), "documents.parquet"),
        fingerprint=_code_fingerprint(),
    )
    votes = ",\n                 ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(64)
    )
    sig = " + ".join(
        f"CASE WHEN v{b} >= 0 THEN {1 << b}::hugeint ELSE 0::hugeint END"
        for b in range(64)
    )
    return f"""w AS (
          SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                            x -> x <> '')) AS word
          FROM documents),
        h AS (SELECT w.doc_id, d.h FROM w
              JOIN read_parquet('{dim}') d USING (word)),
        votes AS (
          SELECT doc_id,
                 {votes}
          FROM h GROUP BY doc_id),
        sraw AS (SELECT doc_id, ({sig}) AS s FROM votes),
        sigs AS (
          SELECT doc_id,
                 (CASE WHEN s >= 9223372036854775808::hugeint
                       THEN s - 18446744073709551616::hugeint
                       ELSE s END)::bigint AS simhash
          FROM sraw)"""


def _simhash_sql() -> str:
    return f"WITH {_simhash_sig_ctes()} SELECT doc_id, simhash FROM sigs"


def _simhash_neardup_sql() -> str:
    """Oracle for simhash_neardup: the banded hamming join has PERFECT
    recall at radius <= 3 (4 chunks, pigeonhole), so the independent replay
    is the clean brute-force all-pairs predicate over the signatures."""
    return f"""
        WITH {_simhash_sig_ctes()}
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               bit_count(xor(a.simhash, b.simhash))::int AS hamming
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


def _cc_label_prop_ctes(n_rounds: int = 8) -> str:
    """Connected components over the ``sym`` edge CTE as UNROLLED
    min-label-propagation rounds with pointer jumping, every round a
    MATERIALIZED CTE over the (small) label table — the same
    temp-table-per-round trick the PageRank oracle uses (VERDICT r4
    item 4).  The old recursive-CTE transitive closure materialized every
    (node, reachable-node) pair — quadratic per component, and it
    exhausted DuckDB's temp disk at sf1; label propagation carries one row
    per node per round.  Each round is hash-to-min (lbl <- min over self +
    neighbors) then one pointer jump (lbl <- lbl(lbl)), so ``n_rounds``
    covers component diameters >= 2^n_rounds — near-dup clusters are
    near-cliques (diameter a few hops), and the Spark/SQL hash equality at
    every sf is the convergence witness.  Final labels: ``cclast(node,
    lbl)`` = component minimum, one row per edge-set node."""
    ctes = """cn AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
        cc0 AS MATERIALIZED (SELECT node, node AS lbl FROM cn)"""
    for k in range(1, n_rounds + 1):
        ctes += f""",
        ccs{k} AS MATERIALIZED (
          SELECT c.node, least(c.lbl, coalesce(nm.m, c.lbl)) AS lbl
          FROM cc{k - 1} c LEFT JOIN (
            SELECT e.src AS node, min(l.lbl) AS m
            FROM sym e JOIN cc{k - 1} l ON l.node = e.dst
            GROUP BY e.src) nm USING (node)),
        cc{k} AS MATERIALIZED (
          SELECT s.node, least(s.lbl, coalesce(p.lbl, s.lbl)) AS lbl
          FROM ccs{k} s LEFT JOIN ccs{k} p ON p.node = s.lbl)"""
    return ctes + f""",
        cclast AS MATERIALIZED (SELECT node, lbl FROM cc{n_rounds})"""


def _minhash_clusters_sql() -> str:
    """DuckDB replay of kg/ops/dedup.py minhash_clusters on ``documents``:
    word-2-gram shingles (char-polynomial hash via list_reduce — iterated
    (acc*131+cp) % P, identical to the Python fold), 32 MinHashes (seed 11),
    8-band LSH keys, bucket cap 100, exact-Jaccard verify >= 0.6, and
    connected components as unrolled materialized label-propagation rounds
    (_cc_label_prop_ctes — the recursive-closure version exhausted DuckDB
    temp disk at sf1, VERDICT r4 item 4).

    The 32 MinHashes are 32 ``min()`` expressions in ONE GROUP BY over the
    shingle table, not a shingles x params CROSS JOIN: the join form
    materialized ~0.5G intermediate rows at sf1 (~20 GB of DuckDB temp
    spill, measured) for the identical modular arithmetic."""
    from kg.linking import _hash_params

    a_params, b_params = _hash_params(num_hashes=32, seed=11)
    min_cols = ",\n                 ".join(
        f"min(({int(a_params[i])} * h + {int(b_params[i])})"
        f" % 2147483647) AS v{i}"
        for i in range(32)
    )
    two61 = 1 << 61

    def band_expr(b: int) -> str:
        i0 = 4 * b
        return (
            f"'{b}:' || printf('%x', (("
            f"(v{i0}::hugeint * 1000003 * 1000003 * 1000003) % {two61}"
            f" + (v{i0 + 1}::hugeint * 1000003 * 1000003) % {two61}"
            f" + (v{i0 + 2}::hugeint * 1000003) % {two61}"
            f" + v{i0 + 3}::hugeint"
            f") % {two61})::bigint)"
        )

    keys_union = "\n          UNION ALL ".join(
        f"SELECT doc_id, {band_expr(b)} AS bucket FROM sig" for b in range(8)
    )
    return f"""
        WITH
        words AS (
          SELECT doc_id::varchar AS doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS ws
          FROM documents),
        grams AS (
          SELECT DISTINCT doc_id,
                 CASE WHEN len(ws) >= 2 THEN ws[i] || ' ' || ws[i + 1]
                      ELSE ws[i] END AS gram
          FROM (SELECT doc_id, ws,
                       unnest(range(1, CASE WHEN len(ws) >= 2 THEN len(ws)
                                            ELSE len(ws) + 1 END)) AS i
                FROM words)),
        sh AS MATERIALIZED (
          SELECT DISTINCT doc_id,
                 list_reduce(
                   list_transform(regexp_split_to_array(gram, ''),
                                  c -> unicode(c)::bigint),
                   (acc, c) -> (acc * 131 + c) % 2147483647) AS h
          FROM grams),
        sig AS MATERIALIZED (
          SELECT doc_id,
                 {min_cols}
          FROM sh GROUP BY doc_id),
        keys AS (
          {keys_union}),
        sized AS (
          SELECT k.doc_id, k.bucket FROM keys k
          JOIN (SELECT bucket, count(*) AS bsz FROM keys GROUP BY bucket) s
            USING (bucket)
          WHERE s.bsz <= 100),
        cand AS (
          SELECT DISTINCT a.doc_id AS m1, b.doc_id AS m2
          FROM sized a JOIN sized b USING (bucket)
          WHERE a.doc_id < b.doc_id),
        shc AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        common AS (
          SELECT p.m1, p.m2, count(*) AS n_common
          FROM cand p
          JOIN sh s1 ON s1.doc_id = p.m1
          JOIN sh s2 ON s2.doc_id = p.m2 AND s1.h = s2.h
          GROUP BY p.m1, p.m2),
        jedges AS (
          SELECT c.m1, c.m2
          FROM common c
          JOIN shc c1 ON c1.doc_id = c.m1
          JOIN shc c2 ON c2.doc_id = c.m2
          WHERE n_common::double / (c1.n + c2.n - n_common) >= 0.6),
        sym AS MATERIALIZED (SELECT m1 AS src, m2 AS dst FROM jedges
                UNION SELECT m2, m1 FROM jedges),
        {_cc_label_prop_ctes()}
        SELECT node AS doc_id, lbl AS cluster_id FROM cclast
    """


def _pagerank_ctes(damping: float = 0.85, n_iters: int = 3) -> str:
    """Closed-form unrolled PageRank CTE chain over the ``eg`` edge CTE —
    the SQL twin of kg/graph.py entity_pagerank (fixed iteration count,
    uniform dangling-mass redistribution; the final SELECT quantizes to 6
    significant figures — coarse enough that cross-engine summation-order
    noise ~1e-15 relative cannot straddle a rounding boundary, at any
    graph size, ADVICE r3/r4)."""
    # AS MATERIALIZED: DuckDB inlines CTEs by default, and each iteration
    # references its predecessor 3x — without materialization the whole
    # upstream pipeline replay expands 3^k times (observed: fd exhaustion).
    ctes = f"""plinks AS MATERIALIZED (
              SELECT DISTINCT substring(sha256(subj_c), 1, 16) AS src,
                              substring(sha256(obj_c), 1, 16) AS dst
              FROM eg WHERE subj_c <> obj_c),
            pnodes AS MATERIALIZED (
              -- DISTINCT over UNION ALL, not bare UNION: inside a WITH
              -- RECURSIVE block DuckDB 1.0 does not dedup a CTE-body UNION
              SELECT DISTINCT node FROM (
                SELECT src AS node FROM plinks
                UNION ALL SELECT dst FROM plinks)),
            pn AS MATERIALIZED (SELECT count(*)::double AS n FROM pnodes),
            pdeg AS MATERIALIZED (SELECT src, count(*)::double AS deg
                     FROM plinks GROUP BY src),
            pr0 AS MATERIALIZED (SELECT p.node, d.deg, 1.0 / (SELECT n FROM pn) AS pr
                    FROM pnodes p LEFT JOIN pdeg d ON d.src = p.node)"""
    for k in range(1, n_iters + 1):
        ctes += f""",
            dang{k} AS MATERIALIZED (SELECT coalesce(sum(pr), 0.0) AS dang
                        FROM pr{k - 1} WHERE deg IS NULL),
            ctr{k} AS MATERIALIZED (SELECT l.dst AS node, sum(q.pr / q.deg) AS contrib
                       FROM plinks l JOIN pr{k - 1} q ON q.node = l.src
                       GROUP BY l.dst),
            pr{k} AS MATERIALIZED (SELECT p.node, p.deg,
                             (1.0 - {damping}) / (SELECT n FROM pn)
                             + {damping} * (coalesce(c.contrib, 0.0)
                                 + (SELECT dang FROM dang{k})
                                   / (SELECT n FROM pn)) AS pr
                      FROM pr{k - 1} p LEFT JOIN ctr{k} c USING (node))"""
    return ctes


def _kg_oracle_sqls() -> dict[str, str]:
    """DuckDB oracles for the KG stages (VERDICT r1 item 3).

    The synthetic corpus and the per-word tokenization are materialized as
    parquet dimension tables by kg/oracle_tables.py (driver-side Python +
    pyarrow — no Spark); the SQL below then independently re-derives the
    relational heart of the extract stage: whitespace segment parse,
    rsplit-once word/tag split (reference ner/dataset.py:38,44), cumulative
    context-token offsets, the truncation guard
    ctx_limit = min(|context|, MAX_LEN-1-|query|) with spans whose end
    crosses it silently dropped (ner/dataset.py:57,65-66,74-75), the
    REL_WINDOW in-sentence pairing rule (kg/config.py), and the keyphrase
    TF/top-k.  The driver compares at sf=0.01 — these oracles are pinned to
    that corpus size.
    """
    from kg.config import (
        LINK_JACCARD,
        LSH_BANDS,
        MAX_LEN,
        NUM_HASHES,
        REL_WINDOW,
        TAGS,
    )
    from kg.linking import _hash_params
    from kg.oracle import build_tag2query
    from kg.oracle_tables import ensure_kg_oracle_tables

    n_docs = sf_to_n_docs(_sf_of(_oracle_sf_dir()))  # the correctness sf
    paths = ensure_kg_oracle_tables(
        n_docs, seed=42, fingerprint=_code_fingerprint(), vocab=_vocab()
    )
    t2q = build_tag2query(_vocab())
    qlen_values = ", ".join(f"('{t}', {len(ids)})" for t, ids in sorted(t2q.items()))
    tags_in = ", ".join(f"'{t}'" for t in TAGS)

    # shared parse: text -> ordered (word, tag) segments with token counts
    parse_cte = f"""
        segs AS (
          SELECT doc_id, sent_offset,
                 unnest(regexp_split_to_array(trim(text), '\\s+')) AS seg,
                 generate_subscripts(regexp_split_to_array(trim(text), '\\s+'), 1) AS seg_idx
          FROM read_parquet('{paths["flat"]}')),
        parsed AS (
          SELECT doc_id, sent_offset, seg_idx,
                 CASE WHEN contains(seg, '/')
                      THEN regexp_extract(seg, '^(.*)/[^/]*$', 1)
                      ELSE '' END AS word,
                 regexp_extract(seg, '([^/]*)$', 1) AS tag
          FROM segs WHERE seg <> '')"""

    mentions_ctes = f"""{parse_cte},
        toks AS (
          SELECT p.*, w.n_tok, w.surface
          FROM parsed p JOIN read_parquet('{paths["words"]}') w USING (word)),
        pos AS (
          SELECT doc_id, sent_offset, tag, n_tok, surface,
                 coalesce(sum(n_tok) OVER (
                     PARTITION BY doc_id, sent_offset ORDER BY seg_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start,
                 sum(n_tok) OVER (PARTITION BY doc_id, sent_offset) AS ctx_len
          FROM toks),
        m AS (
          SELECT doc_id, sent_offset, tag,
                 tok_start::int AS start, (tok_start + n_tok - 1)::int AS "end",
                 surface AS mention
          FROM pos JOIN (VALUES {qlen_values}) AS q(tag, qlen) USING (tag)
          WHERE n_tok >= 1
            AND tok_start + n_tok - 1 < least(ctx_len, {MAX_LEN} - 1 - qlen))"""

    triples_select = f"""
          SELECT a.mention AS subj,
                 'rel_' || a.tag || '_' || b.tag AS pred,
                 b.mention AS obj,
                 a.doc_id, a.sent_offset
          FROM m a JOIN m b
            ON a.doc_id = b.doc_id AND a.sent_offset = b.sent_offset
           AND b.start > a."end" AND b.start - a."end" <= {REL_WINDOW}"""

    # --- entity-linking replay (kg/linking.py semantics, closed-form SQL) ---
    # All hash constants are explicit modular arithmetic shared with the
    # Spark kernels; with SHINGLE_K=3 the char-polynomial hash expands to a
    # fixed 3-term expression, the MinHash (a*h+b) % P fits bigint, and the
    # band fold fits hugeint — so the whole LSH+verify+CC stage is exact SQL.
    a_params, b_params = _hash_params()
    hash_values = ", ".join(
        f"({i}, {int(a_params[i])}::bigint, {int(b_params[i])}::bigint)"
        for i in range(NUM_HASHES)
    )
    rows_per_band = NUM_HASHES // LSH_BANDS
    two61 = 1 << 61
    gram_hash = """
          (unicode(substring(gram, 1, 1))::bigint
             * (CASE length(gram) WHEN 3 THEN 17161 WHEN 2 THEN 131 ELSE 1 END)
           + CASE WHEN length(gram) >= 2
                  THEN unicode(substring(gram, 2, 1))::bigint
                       * (CASE WHEN length(gram) = 3 THEN 131 ELSE 1 END)
                  ELSE 0 END
           + CASE WHEN length(gram) = 3
                  THEN unicode(substring(gram, 3, 1))::bigint ELSE 0 END)
          % 2147483647"""
    linking_ctes = f"""
        dm AS (SELECT DISTINCT mention FROM m),
        grams AS (
          SELECT mention,
                 CASE WHEN length(mention) >= 3
                      THEN substring(mention, i, 3) ELSE mention END AS gram
          FROM (SELECT mention,
                       unnest(range(1, CASE WHEN length(mention) >= 3
                                            THEN length(mention) - 1 ELSE 2 END)) AS i
                FROM dm)),
        sh AS (SELECT DISTINCT mention, ({gram_hash}) AS h FROM grams),
        params(i, ha, hb) AS (VALUES {hash_values}),
        sig AS (
          SELECT mention, i, min((ha * h + hb) % 2147483647) AS v
          FROM sh CROSS JOIN params GROUP BY mention, i),
        bandv AS (
          SELECT mention, i // {rows_per_band} AS band,
                 i % {rows_per_band} AS pos, v
          FROM sig),
        keys AS (
          SELECT mention, band,
                 band || ':' || printf('%x', ((
                   (max(CASE WHEN pos = 0 THEN v END)::hugeint
                      * 1000003 * 1000003 * 1000003) % {two61}
                   + (max(CASE WHEN pos = 1 THEN v END)::hugeint
                      * 1000003 * 1000003) % {two61}
                   + (max(CASE WHEN pos = 2 THEN v END)::hugeint * 1000003) % {two61}
                   + max(CASE WHEN pos = 3 THEN v END)::hugeint
                 ) % {two61})::bigint) AS bucket
          FROM bandv GROUP BY mention, band),
        sized AS (
          SELECT k.mention, k.bucket FROM keys k
          JOIN (SELECT bucket, count(*) AS bsz FROM keys GROUP BY bucket) s
            USING (bucket)
          WHERE s.bsz <= 200),
        cand AS (
          SELECT DISTINCT a.mention AS m1, b.mention AS m2
          FROM sized a JOIN sized b USING (bucket)
          WHERE a.mention < b.mention),
        shc AS (SELECT mention, count(*) AS n FROM sh GROUP BY mention),
        common AS (
          SELECT p.m1, p.m2, count(*) AS n_common
          FROM cand p
          JOIN sh s1 ON s1.mention = p.m1
          JOIN sh s2 ON s2.mention = p.m2 AND s1.h = s2.h
          GROUP BY p.m1, p.m2),
        jedges AS (
          SELECT c.m1, c.m2
          FROM common c
          JOIN shc c1 ON c1.mention = c.m1
          JOIN shc c2 ON c2.mention = c.m2
          WHERE n_common::double / (c1.n + c2.n - n_common) >= {LINK_JACCARD}),
        sym AS (SELECT m1 AS src, m2 AS dst FROM jedges
                UNION SELECT m2, m1 FROM jedges),
        reach AS (
          SELECT src, dst FROM sym
          UNION
          SELECT r.src, e.dst FROM reach r JOIN sym e ON r.dst = e.src),
        comp AS (
          SELECT src AS mention, least(src, min(dst)) AS canonical
          FROM reach GROUP BY src),
        linked AS (
          SELECT d.mention, coalesce(c.canonical, d.mention) AS canonical
          FROM dm d LEFT JOIN comp c USING (mention))"""

    edges_ctes = f"""{mentions_ctes}, {linking_ctes},
        t AS ({triples_select}),
        ecan AS (
          SELECT ls.canonical AS subj_c, t.pred, lo.canonical AS obj_c, t.doc_id
          FROM t
          JOIN linked ls ON ls.mention = t.subj
          JOIN linked lo ON lo.mention = t.obj),
        eg AS (
          SELECT subj_c, pred, obj_c, doc_id, count(*)::double AS weight
          FROM ecan GROUP BY subj_c, pred, obj_c, doc_id)"""

    return {
        "kg_mentions": f"""
            WITH {mentions_ctes}
            SELECT doc_id, sent_offset, tag, start, "end", mention FROM m
        """,
        "kg_triples": f"""
            WITH {mentions_ctes}
            {triples_select}
        """,
        "kg_linked": f"""
            WITH RECURSIVE {mentions_ctes}, {linking_ctes}
            SELECT mention, canonical FROM linked
        """,
        "kg_nodes": f"""
            WITH RECURSIVE {mentions_ctes}, {linking_ctes},
            mm AS (SELECT m.mention, m.tag, l.canonical
                   FROM m JOIN linked l USING (mention)),
            by_tag AS (SELECT canonical, tag, count(*) AS tag_cnt
                       FROM mm GROUP BY canonical, tag),
            modal AS (
              SELECT canonical, tag AS kind FROM (
                SELECT canonical, tag,
                       row_number() OVER (PARTITION BY canonical
                                          ORDER BY tag_cnt DESC, tag ASC) AS rn
                FROM by_tag)
              WHERE rn = 1),
            cnts AS (SELECT canonical, count(*) AS n_mentions
                     FROM mm GROUP BY canonical)
            SELECT substring(sha256(c.canonical), 1, 16) AS entity_id,
                   c.canonical AS canonical_text, modal.kind, c.n_mentions
            FROM cnts c JOIN modal USING (canonical)
        """,
        "kg_edges": f"""
            WITH RECURSIVE {edges_ctes}
            SELECT substring(sha256(subj_c), 1, 16) AS subj, pred,
                   substring(sha256(obj_c), 1, 16) AS obj, doc_id, weight
            FROM eg
        """,
        "kg_top_pairs": f"""
            WITH RECURSIVE {edges_ctes}
            SELECT subj_c AS subj_text, pred, obj_c AS obj_text,
                   count(DISTINCT doc_id) AS doc_freq,
                   sum(weight) AS total_weight
            FROM eg GROUP BY subj_c, pred, obj_c
            ORDER BY doc_freq DESC, total_weight DESC,
                     subj_text, obj_text, pred
            LIMIT 20
        """,
        "kg_keyphrases": f"""
            WITH {parse_cte},
            tf AS (
              SELECT doc_id, word AS phrase, count(*) AS freq
              FROM parsed
              WHERE tag NOT IN ({tags_in}) AND length(word) >= 2
              GROUP BY doc_id, word)
            SELECT doc_id, phrase, freq, rank FROM (
              SELECT doc_id, phrase, freq,
                     (row_number() OVER (PARTITION BY doc_id
                                         ORDER BY freq DESC, phrase ASC))::int AS rank
              FROM tf)
            WHERE rank <= 5
        """,
        # 6 SIGNIFICANT figures, same arithmetic as kg/graph.py: quantum
        # q = 10^(floor(log10(pr))-5), output round(pr/q)*q (ADVICE r4 —
        # a fixed 6-decimal quantum is useless beyond ~1e6 nodes)
        "entity_pagerank": f"""
            WITH RECURSIVE {edges_ctes},
            {_pagerank_ctes()}
            SELECT node AS entity_id,
                   round(pr / power(10, floor(log10(pr)) - 5))
                     * power(10, floor(log10(pr)) - 5) AS pagerank
            FROM pr3
        """,
        # ZERO-EXPECTATION check, not an independent replay (module doc):
        # the violation set diffs pipeline input vs pipeline OUTPUT, which
        # SQL over the input tables cannot derive; the expected value IS
        # the empty set, and mutation tests (tests/test_invariant.py) prove
        # the Spark-side check fires on genuinely damaged sequences.
        "kg_span_invariant": """
            SELECT CAST(NULL AS VARCHAR) AS doc_id WHERE 1 = 0
        """,
    }


def _oracle_sql_static() -> dict[str, str]:
    return {
        "seg_wordcount": """
            SELECT word, count(*) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE word <> '' GROUP BY word
        """,
        "word_tag_split": """
            SELECT split_part(lang || '/' || source, '/', 1) AS word,
                   split_part(lang || '/' || source, '/', 2) AS tag,
                   count(*) AS cnt
            FROM documents GROUP BY 1, 2
        """,
        "tag_filter": """
            SELECT event_type, count(*) AS cnt FROM events
            WHERE event_type IN ('click', 'view') GROUP BY event_type
        """,
        "threshold_filter": """
            SELECT event_id, user_id, value FROM events WHERE value > 50
        """,
        "range_self_join": """
            SELECT a.l_orderkey, count(*) AS n_pairs
            FROM (SELECT l_orderkey, l_linenumber FROM lineitem) a
            JOIN (SELECT l_orderkey, l_linenumber FROM lineitem) b
              ON a.l_orderkey = b.l_orderkey AND a.l_linenumber <= b.l_linenumber
            GROUP BY a.l_orderkey
        """,
        "cross_expand": """
            SELECT t.tag, count(*) AS cnt
            FROM documents CROSS JOIN (VALUES ('ns'), ('nt'), ('nr')) AS t(tag)
            GROUP BY t.tag
        """,
        "span_conjunction": """
            SELECT s.user_id, count(*) AS n_spans
            FROM (SELECT user_id, event_id AS start_id FROM events
                  WHERE value > 40 AND event_type = 'click') s
            JOIN (SELECT user_id, event_id AS end_id FROM events
                  WHERE value > 40 AND event_type = 'view') e
              ON s.user_id = e.user_id
             AND s.start_id < e.end_id AND e.end_id - s.start_id <= 100
            GROUP BY s.user_id
        """,
        "tp_fp_fn": """
            SELECT
              sum(CASE WHEN value > 50 AND event_type = 'click' THEN 1 ELSE 0 END)::bigint AS tp,
              sum(CASE WHEN value > 50 AND event_type <> 'click' THEN 1 ELSE 0 END)::bigint AS fp,
              sum(CASE WHEN value <= 50 AND event_type = 'click' THEN 1 ELSE 0 END)::bigint AS fn
            FROM events
        """,
        "prf1": """
            WITH c AS (
              SELECT
                sum(CASE WHEN value > 50 AND event_type = 'click' THEN 1 ELSE 0 END)::bigint AS tp,
                sum(CASE WHEN value > 50 AND event_type <> 'click' THEN 1 ELSE 0 END)::bigint AS fp,
                sum(CASE WHEN value <= 50 AND event_type = 'click' THEN 1 ELSE 0 END)::bigint AS fn
              FROM events)
            SELECT tp / (tp + fp + 1e-10) AS precision,
                   tp / (tp + fn + 1e-10) AS recall,
                   2 * (tp / (tp + fn + 1e-10)) * (tp / (tp + fp + 1e-10))
                     / ((tp / (tp + fn + 1e-10)) + (tp / (tp + fp + 1e-10)) + 1e-10) AS f1
            FROM c
        """,
        "lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "order_window": """
            SELECT user_id, first_event_id FROM (
              SELECT user_id, event_id AS first_event_id,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events) WHERE rn = 1
        """,
        "union_nation_parties": """
            SELECT nationkey, count(*) AS n_parties FROM (
              SELECT c_nationkey::int AS nationkey FROM customer
              UNION ALL
              SELECT s_nationkey::int AS nationkey FROM supplier)
            GROUP BY nationkey
        """,
        "keyphrases_top5": """
            SELECT doc_id, phrase, freq, rank FROM (
              SELECT doc_id, phrase, freq,
                     (row_number() OVER (PARTITION BY doc_id
                                         ORDER BY freq DESC, phrase ASC))::int AS rank
              FROM (
                SELECT doc_id, word AS phrase, count(*) AS freq
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                      FROM documents)
                WHERE word <> '' GROUP BY doc_id, word))
            WHERE rank <= 5
        """,
        "asof_join": """
            WITH u AS (
              SELECT user_id, ts, event_id, NULL::bigint AS err_id, 1 AS k
              FROM events WHERE event_type = 'click'
              UNION ALL
              SELECT user_id, ts, event_id, event_id, 0
              FROM events WHERE event_type = 'error')
            SELECT event_id, user_id, asof_error_id FROM (
              SELECT event_id, user_id, k,
                     last_value(err_id IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, k, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS asof_error_id
              FROM u)
            WHERE k = 1
        """,
        "sessionize": """
            WITH lagged AS (
              SELECT user_id, ts, event_id,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_ts
              FROM events),
            flagged AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag_ts IS NULL
                               OR epoch_us(ts) - epoch_us(lag_ts) > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM lagged),
            sess AS (
              SELECT user_id, event_id,
                     (sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::bigint AS session_id
              FROM flagged)
            SELECT user_id, session_id, count(*) AS n_events,
                   min(event_id) AS first_event_id
            FROM sess GROUP BY user_id, session_id
        """,
        "lineitem_rollup": """
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "events_cube": """
            SELECT event_type, hr, count(*) AS n, round(sum(value), 2) AS total_value
            FROM (SELECT event_type, hour(ts) AS hr, value FROM events)
            GROUP BY CUBE (event_type, hr)
        """,
        "events_pivot": """
            SELECT user_id,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::bigint AS click,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::bigint AS error,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::bigint AS purchase,
                   sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::bigint AS signup,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::bigint AS view
            FROM events GROUP BY user_id
        """,
        "value_percentiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS p50,
                   round(quantile_cont(value, 0.9), 6) AS p90,
                   round(min(value), 6) AS vmin,
                   round(max(value), 6) AS vmax
            FROM events GROUP BY event_type
        """,
        "distinct_users": """
            SELECT event_type, count(DISTINCT user_id) AS n_users,
                   count(*) AS n_events
            FROM events GROUP BY event_type
        """,
        "masked_loss": """
            SELECT round(sum((greatest(x, 0) - x * t + ln(1 + exp(-abs(x)))) * m)
                         / sum(m), 6) AS masked_bce,
                   sum(m)::bigint AS n_masked
            FROM (SELECT (value - 50.0) / 10.0 AS x,
                         CASE WHEN event_type = 'click' THEN 1.0 ELSE 0.0 END AS t,
                         CASE WHEN value > 10.0 THEN 1.0 ELSE 0.0 END AS m
                  FROM events)
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, count(*) AS n_copies,
                   min(doc_id) AS rep_doc_id
            FROM documents GROUP BY md5(text)
        """,
        "word_jaccard_pairs": """
            WITH words AS (
              SELECT doc_id, source AS blk,
                     unnest(list_distinct(list_filter(string_split(text, ' '),
                                                      x -> x <> ''))) AS word
              FROM documents),
            -- adaptive DF-prefilter mirrors kg/ops/dedup.py
            -- word_jaccard_pairs: cap = min(1000, max(16, floor(|blk|/20)));
            -- capped words leave the join AND the sizes
            blks AS (
              SELECT source AS blk, count(*) AS blk_docs
              FROM documents GROUP BY source),
            rare AS (
              SELECT w.* FROM words w
              JOIN (SELECT blk, word, count(*) AS df FROM words GROUP BY blk, word) d
                ON w.blk = d.blk AND w.word = d.word
              JOIN blks k ON w.blk = k.blk
              WHERE d.df <= least(1000, greatest(16, floor(k.blk_docs / 20)))),
            sizes AS (SELECT doc_id, count(*) AS n_words FROM rare GROUP BY doc_id),
            common AS (
              SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS n_common
              FROM rare a JOIN rare b
                ON a.blk = b.blk AND a.word = b.word AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
            SELECT doc_id_a, doc_id_b, n_common,
                   sa.n_words AS n_a, sb.n_words AS n_b,
                   n_common / (sa.n_words + sb.n_words - n_common) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc_id = doc_id_a
            JOIN sizes sb ON sb.doc_id = doc_id_b
            WHERE n_common / (sa.n_words + sb.n_words - n_common) >= 0.5
        """,
        "lang_id": """
            SELECT doc_id,
              CASE
                WHEN length(text) = 0 THEN 'other'
                WHEN length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g'))::double
                     / length(text) > 0.3 THEN 'zh'
                WHEN length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::double
                     / length(text) > 0.8 THEN 'en'
                ELSE 'other'
              END AS lang_pred
            FROM documents
        """,
        "quality_score": """
            WITH base AS (
              SELECT doc_id,
                     len(list_filter(string_split(text, ' '), x -> x <> ''))::int AS n_words,
                     len(list_distinct(list_filter(string_split(text, ' '), x -> x <> '')))::int AS n_distinct,
                     length(text) AS n_chars,
                     length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
              FROM documents)
            SELECT doc_id, n_words, n_distinct,
              round(CASE WHEN n_words > 0
                         THEN (n_chars - (n_words - 1))::double / n_words
                         ELSE 0.0 END, 4) AS avg_word_len,
              round(CASE WHEN n_chars > 0
                         THEN n_punct::double / n_chars ELSE 0.0 END, 4) AS punct_ratio,
              round(
                least(n_words / 100.0::double, 1.0::double) * 0.4::double
                + (CASE WHEN n_words > 0 THEN n_distinct::double / n_words ELSE 0.0 END) * 0.4::double
                + (1.0::double - least((CASE WHEN n_chars > 0 THEN n_punct::double / n_chars ELSE 0.0 END) * 10,
                                       1.0::double)) * 0.2::double, 4) AS quality
            FROM base
        """,
        "token_counts": """
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '), x -> x <> ''))::int AS ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))::int AS bpe_tokens
            FROM documents
        """,
        "fingerprint": """
            SELECT doc_id,
                   (sum((ascii(word) * 131 + length(word) * 31 + 7)
                        * (((i - 1) % 16) + 1)) % 1000000007)::bigint AS fingerprint
            FROM (
              SELECT doc_id,
                     unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word,
                     generate_subscripts(list_filter(string_split(text, ' '), x -> x <> ''), 1) AS i
              FROM documents)
            GROUP BY doc_id
        """,
        "embedding_nn_pairs": """
            WITH f AS (
              SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                     unnest(embedding)::double AS v
              FROM embeddings),
            n AS (SELECT vec_id, sum(v * v) AS n2 FROM f GROUP BY vec_id),
            d AS (
              SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
                     sum(a.v * b.v) AS dot
              FROM f a JOIN f b ON a.i = b.i AND a.vec_id < b.vec_id
              GROUP BY 1, 2)
            SELECT vec_id_a, vec_id_b,
                   round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 4) AS cosine
            FROM d
            JOIN n na ON na.vec_id = vec_id_a
            JOIN n nb ON nb.vec_id = vec_id_b
            WHERE dot / (sqrt(na.n2) * sqrt(nb.n2)) >= 0.4
        """,
        "cosine_topk": """
            WITH q AS (
              SELECT generate_subscripts(embedding, 1) AS i,
                     unnest(embedding)::double AS v
              FROM embeddings WHERE vec_id = 0),
            e AS (
              SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                     unnest(embedding)::double AS v
              FROM embeddings),
            dots AS (
              SELECT e.vec_id,
                     sum(e.v * q.v) AS dot,
                     sum(e.v * e.v) AS n2
              FROM e JOIN q USING (i) GROUP BY e.vec_id),
            qn AS (SELECT sum(v * v) AS qn2 FROM q)
            SELECT vec_id, round(dot / (sqrt(n2) * sqrt(qn2)), 4) AS cosine
            FROM dots, qn
            ORDER BY round(dot / (sqrt(n2) * sqrt(qn2)), 4) DESC, vec_id ASC
            LIMIT 10
        """,
    }
