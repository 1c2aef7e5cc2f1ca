"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG query end-to-end on sf0.001.
``queries()`` exposes every implemented operator (SURVEY.md §2 + the
training-data ops); each SQL-expressible one has a matching DuckDB oracle in
``oracle_sql()``; genuinely non-SQL ops (tokenizing mention detection,
MinHash clustering, LSH ANN, SimHash, media kernels) are rows-only checks
backed by exact-parity pytest gates against the single-node oracle
(tests/test_parity.py).
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


def _kg_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    sf = _sf_of(sf_dir)
    n_docs = sf_to_n_docs(sf)
    base = os.path.join("/tmp", f"kg_ckpt_sf{sf}_{_code_fingerprint()}")
    docs = synth_docs_df(spark, n_docs)
    res = run_pipeline(
        spark,
        docs,
        base,
        vocab=_vocab(),
        input_token=f"synth:{n_docs}:42",
        check_invariant=False,  # kg_span_invariant exposes the check itself
    )
    return res.tables


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
        "embedding_nn_pairs_lsh": lambda s, d: S.embedding_nn_pairs_lsh(
            R.load(s, d, "embeddings"), dim=64, threshold=0.4, n_planes=4
        ),  # approximate by design: rows-only
        "cosine_topk": lambda s, d: S.cosine_topk(
            R.load(s, d, "embeddings"), _q_embedding_query_vec(s, d), k=10
        ),
        # non-SQL-expressible (rows-only; exact-parity pytest gates instead)
        "simhash": lambda s, d: D.simhash64(R.load(s, d, "documents")),
        "minhash_clusters": lambda s, d: D.minhash_clusters(
            R.load(s, d, "documents")
        ),
        "ann_lsh": lambda s, d: S.lsh_ann(
            R.load(s, d, "embeddings"), _q_embedding_query_vec(s, d), k=10
        ),
        "cosine_topk_np": lambda s, d: S.cosine_topk_np(
            R.load(s, d, "embeddings"), _q_embedding_query_vec(s, d), k=10
        ),
        # KG pipeline (rows-only; parity vs single-node oracle in tests/)
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
        # features posexploded to scalar rows: the driver's canonicalizer
        # sorts columns and cannot order an array<float> column (VERDICT r1).
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


def oracle_sql() -> dict[str, str]:
    o = _oracle_sql_static()
    # identical semantics, different execution strategy (Arrow/NumPy kernel
    # vs JVM higher-order functions): same oracle applies to both.
    o["cosine_topk_np"] = o["cosine_topk"]
    return o


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
            sizes AS (SELECT doc_id, count(*) AS n_words FROM words GROUP BY doc_id),
            -- df cap mirrors kg/ops/dedup.py word_jaccard_pairs(max_df=1000)
            rare AS (
              SELECT w.* FROM words w
              JOIN (SELECT blk, word, count(*) AS df FROM words GROUP BY blk, word) d
                ON w.blk = d.blk AND w.word = d.word
              WHERE d.df <= 1000),
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
