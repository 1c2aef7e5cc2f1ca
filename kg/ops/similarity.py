"""Similarity search over an embedding column (``array<float>``).

- ``cosine_scores`` / ``cosine_topk``: brute-force baseline.  The dot
  product stays JVM-side via higher-order functions (``zip_with`` +
  ``aggregate``) against a broadcast query vector — whole-stage codegen,
  no Python in the hot path, embarrassingly parallel scan.
- ``cosine_topk_np``: Arrow-batched NumPy variant (matrix-vector product per
  batch) — the raw-throughput path for wide fan-out (many query vectors).
- ``lsh_ann``: random-hyperplane LSH (deterministic planes from a seed):
  sign-pattern bucket key per vector; ANN = brute force *within the query's
  bucket* — the 100 TB scale path (bucket join instead of full scan).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_scores(embeddings: DataFrame, query_vec: list[float], round_to: int = 4) -> DataFrame:
    """(vec_id, cosine) of every vector vs the query; JVM-side math.

    The per-element aggregate/zip lambdas are interpreted (no codegen), so
    an under-split source — one small parquet file = one task — serializes
    the whole scan; spread_small_scan parallelizes it and is a no-op on
    any well-split source (r6, guide §2.5)."""
    from kg.relational import spread_small_scan

    embeddings = spread_small_scan(embeddings.select("vec_id", "embedding"))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qnorm = float(np.sqrt(np.dot(query_vec, query_vec)))
    return embeddings.select(
        "vec_id",
        F.round(
            _dot(F.col("embedding"), q) / (_norm(F.col("embedding")) * F.lit(qnorm)),
            round_to,
        ).alias("cosine"),
    )


def cosine_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10, round_to: int = 4
) -> DataFrame:
    return (
        cosine_scores(embeddings, query_vec, round_to)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_topk_np(
    embeddings: DataFrame, query_vec: list[float], k: int = 10, round_to: int = 4
) -> DataFrame:
    """Arrow/NumPy brute force: per-batch matrix-vector product.

    Scores are rounded *before* ranking (same rule as ``cosine_topk`` and
    the DuckDB oracle) so the selected top-k set is deterministic under
    rounding ties; the per-batch prune keeps all tied rows (keep='all') so
    the global tie-break (vec_id asc) sees every candidate.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            sims = np.round((m @ q) / (np.linalg.norm(m, axis=1) * qn), round_to)
            out = pd.DataFrame({"vec_id": pdf["vec_id"], "cosine": sims})
            yield out.nlargest(min(k, len(out)), "cosine", keep="all")  # per-batch prune

    partial = embeddings.select("vec_id", "embedding").mapInPandas(
        kernel, "vec_id long, cosine double"
    )
    return partial.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def _planes(dim: int, n_planes: int = 12, seed: int = 13) -> np.ndarray:
    rs = np.random.RandomState(seed)
    return rs.standard_normal((n_planes, dim))


def auto_lsh_config(
    n_vectors: int | None = None,
    n_planes: int | None = None,
    target_occupancy: int = 8,
    design_cos: float = 0.95,
    target_recall: float = 0.9,
) -> tuple[int, int]:
    """Size (n_planes, n_tables) from the input cardinality (VERDICT r3
    item 1 — the measured 10x bucket-saturation cliff, 102s -> 13.5s, must
    never hit a defaults user).

    Planes from occupancy: with ``b`` hyperplanes a table has 2^b buckets;
    expected occupancy n/2^b drives the within-bucket self-join
    quadratically, so hold it at ``target_occupancy``:
        n_planes = clip(ceil(log2(n / target_occupancy)), 4, 24).

    Tables from recall: a pair at angle θ collides in one table with
    p = (1 - θ/π)^b, so OR-construction recall is 1 - (1-p)^L.  Holding
    recall ``target_recall`` at the design similarity ``design_cos`` gives
        n_tables = clip(ceil(ln(1-recall) / ln(1-p)), 2, 16)
    — more planes automatically buy more tables, so growing n trades
    compute for the SAME recall at the design point instead of silently
    losing it.  At the sf0.1-derived bench inputs this resolves to 8x5 at
    2k vectors, 10x6 at 8k and 12x8 at 20k — matching the manually-sized
    12-plane cell that fixed the measured saturation (BENCH.md).

    Callers at known scale pass ``n_vectors`` (or explicit geometry) to
    skip the count; ``n_planes`` given with ``n_vectors=None`` sizes only
    the table count.
    """
    if n_vectors is None and n_planes is None:
        raise ValueError("auto_lsh_config requires n_vectors or n_planes")
    if n_planes is None:
        n_planes = int(
            np.clip(np.ceil(np.log2(max(n_vectors, 2) / target_occupancy)), 4, 24)
        )
    p = (1.0 - np.arccos(min(design_cos, 1.0)) / np.pi) ** n_planes
    n_tables = int(
        np.clip(np.ceil(np.log(1.0 - target_recall) / np.log(1.0 - p)), 2, 16)
    )
    return n_planes, n_tables


def _resolve_lsh_geometry(
    embeddings: DataFrame,
    n_planes: int | None,
    n_tables: int | None,
    n_vectors: int | None,
) -> tuple[int, int]:
    """Fill unspecified LSH geometry from ``auto_lsh_config``; counts the
    input once only if needed (cheap metadata-ish scan; at 100 TB pass
    ``n_vectors`` from the table's own statistics).

    Auto-derivation happens ONLY on the fully-auto path (no ``n_planes``
    given): a caller who pins ``n_planes`` but leaves ``n_tables`` unset
    gets the historical single-table semantics, not a silently-upgraded
    OR-construction with a different candidate-set cost (ADVICE r4)."""
    if n_planes is None:
        if n_vectors is None:
            n_vectors = embeddings.count()
        auto_p, auto_t = auto_lsh_config(n_vectors)
        n_planes = auto_p
        if n_tables is None:
            n_tables = auto_t
    elif n_tables is None:
        n_tables = 1
    return n_planes, n_tables


def hyperplane_buckets(embeddings: DataFrame, dim: int, n_planes: int = 12, seed: int = 13) -> DataFrame:
    """(vec_id, bucket) — sign pattern of projections onto fixed planes."""
    planes = _planes(dim, n_planes, seed)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            signs = (m @ planes.T) >= 0
            keys = ["".join("1" if s else "0" for s in row) for row in signs]
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "bucket": keys})

    return embeddings.select("vec_id", "embedding").mapInPandas(
        kernel, "vec_id long, bucket string"
    )


def _key(signs) -> str:
    return "".join("1" if s else "0" for s in signs)


def hyperplane_buckets_multi(
    embeddings: DataFrame, dim: int, n_planes: int = 8, n_tables: int = 8, seed: int = 13
) -> DataFrame:
    """(vec_id, table, bucket): one sign-pattern key per vector per table.

    OR-construction over ``n_tables`` independent plane sets — the standard
    fix for single-table LSH's unbounded recall loss (VERDICT r1 item 6):
    a true neighbor is missed only if it disagrees with the query in EVERY
    table.  One Arrow kernel emits all tables' keys in a single pass over
    the vectors (n_tables small matrix products per batch, no extra scans).
    """
    planes = [_planes(dim, n_planes, seed + t) for t in range(n_tables)]

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            ids, tabs, keys = [], [], []
            for t, P in enumerate(planes):
                signs = (m @ P.T) >= 0
                ids.extend(pdf["vec_id"])
                tabs.extend([t] * len(pdf))
                keys.extend(_key(row) for row in signs)
            yield pd.DataFrame({"vec_id": ids, "table": tabs, "bucket": keys})

    return embeddings.select("vec_id", "embedding").mapInPandas(
        kernel, "vec_id long, table int, bucket string"
    )


def _probe_keys(qsigns: np.ndarray, probe_bits: int) -> list[str]:
    """Query key + every key within Hamming distance <= probe_bits
    (multi-probe: near neighbors split off by a low-margin plane are still
    found without paying for more tables)."""
    from itertools import combinations

    keys = [_key(qsigns)]
    for r in range(1, probe_bits + 1):
        for combo in combinations(range(len(qsigns)), r):
            flipped = qsigns.copy()
            for i in combo:
                flipped[i] = ~flipped[i]
            keys.append(_key(flipped))
    return keys


def lsh_ann_candidates(
    embeddings: DataFrame,
    query_vec: list[float],
    n_planes: int | None = None,
    n_tables: int | None = None,
    probe_bits: int = 2,
    seed: int = 13,
    n_vectors: int | None = None,
) -> DataFrame:
    """Distinct candidate vec_ids across all tables' probed buckets.

    The probe set is tiny (n_tables * sum_{r<=probe_bits} C(n_planes, r)
    rows) and broadcast; the bucket table is the only scan-sized side, so
    the candidate selection is a broadcast semi-join — no shuffle of the
    vectors themselves.  Geometry defaults to ``auto_lsh_config`` sized
    from the input cardinality (VERDICT r3 item 1): explicit
    8 planes x 8 tables at probe radius 2 holds recall@10 >= 0.9 on the
    sf0.01 embeddings (tests/test_ops.py), which are near-random — the
    hardest case for angle LSH; clustered real embeddings prune far harder
    at the same setting.
    """
    n_planes, n_tables = _resolve_lsh_geometry(
        embeddings, n_planes, n_tables, n_vectors
    )
    dim = len(query_vec)
    q = np.asarray(query_vec, dtype=np.float64)
    spark = embeddings.sparkSession
    probe_rows = []
    for t in range(n_tables):
        qsigns = (_planes(dim, n_planes, seed + t) @ q) >= 0
        probe_rows += [(t, key) for key in _probe_keys(qsigns, probe_bits)]
    probes = spark.createDataFrame(probe_rows, "table int, bucket string")
    buckets = hyperplane_buckets_multi(embeddings, dim, n_planes, n_tables, seed)
    return (
        buckets.join(F.broadcast(probes), ["table", "bucket"], "left_semi")
        .select("vec_id")
        .distinct()
    )


def lsh_ann(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int | None = None,
    n_tables: int | None = None,
    probe_bits: int = 2,
    seed: int = 13,
    n_vectors: int | None = None,
) -> DataFrame:
    """ANN top-k: brute-force cosine over the multi-table multi-probe
    candidate set only (the 100-TB shape: bucket semi-join, not full scan).
    Geometry auto-sizes from the input cardinality unless pinned."""
    cand = lsh_ann_candidates(
        embeddings, query_vec, n_planes, n_tables, probe_bits, seed, n_vectors
    )
    return cosine_topk(embeddings.join(cand, "vec_id"), query_vec, k)


def embedding_nn_pairs(
    embeddings: DataFrame, threshold: float = 0.8, round_to: int = 4
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_id_a < vec_id_b).

    Relational formulation (posexplode -> index equi-join -> partial-dot
    aggregation) so the DuckDB oracle can replay it exactly; at scale the
    LSH-bucketed variant (``hyperplane_buckets`` + within-bucket verify)
    bounds the candidate set instead of the full cross product.
    """
    flat = embeddings.select(
        "vec_id", F.posexplode("embedding").alias("i", "v")
    ).select("vec_id", "i", F.col("v").cast("double").alias("v"))
    norms = flat.groupBy("vec_id").agg(F.sum(F.col("v") * F.col("v")).alias("n2"))

    a = flat.select(F.col("vec_id").alias("vec_id_a"), "i", F.col("v").alias("va"))
    b = flat.select(F.col("vec_id").alias("vec_id_b"), "i", F.col("v").alias("vb"))
    dots = (
        a.join(b, "i")
        .where(F.col("vec_id_a") < F.col("vec_id_b"))
        .groupBy("vec_id_a", "vec_id_b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    na = norms.select(F.col("vec_id").alias("vec_id_a"), F.col("n2").alias("n2_a"))
    nb = norms.select(F.col("vec_id").alias("vec_id_b"), F.col("n2").alias("n2_b"))
    cos = F.col("dot") / (F.sqrt("n2_a") * F.sqrt("n2_b"))
    return (
        dots.join(F.broadcast(na), "vec_id_a")
        .join(F.broadcast(nb), "vec_id_b")
        .where(cos >= threshold)
        .select("vec_id_a", "vec_id_b", F.round(cos, round_to).alias("cosine"))
    )


def embedding_nn_pairs_lsh(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.8,
    n_planes: int | None = None,
    seed: int = 13,
    round_to: int = 4,
    n_tables: int | None = None,
    n_vectors: int | None = None,
) -> DataFrame:
    """Scale path: candidate pairs only within hyperplane-LSH buckets, then
    exact cosine verify (NumPy kernel).  Approximate: pairs whose sign
    patterns differ in EVERY table are never compared.

    Geometry defaults to ``auto_lsh_config`` sized from the input
    cardinality (VERDICT r3 item 1): planes hold per-bucket occupancy, and
    the table count then holds the design-point recall at the grown plane
    count — so the measured fixed-8-plane saturation cliff (BENCH.md scale
    table) cannot hit a defaults user.

    Recall regime (VERDICT r2 item 4): for a pair at angle θ the per-table
    collision probability is (1 - θ/π)^n_planes, so the OR-construction
    recall is 1 - (1 - p)^n_tables.  At near-dup-grade similarity
    (cosine >= 0.9, θ <= 0.15π) the sizing targets >= 0.9 recall — the
    planted-near-dup gate in tests/test_ops.py pins >= 0.9.  At
    *borderline* similarity on random vectors (cosine ~0.4, θ ~0.37π) NO
    hyperplane-LSH configuration can prune and recall is low by
    information-theoretic necessity — that regime belongs to the exact
    ``embedding_nn_pairs`` twin, not this operator.

    Shuffle payload (VERDICT r3 item 2): candidate generation and the
    cross-table pair dedup run over BARE (bucket, vec_id) rows — the
    embedding arrays are attached by a single join per side only after the
    pair set is distinct, so no 2x-dim float payload is replicated through
    the bucket join or the dedup exchange (the minhash verify join uses
    the same discipline — kg/ops/dedup.py).
    """
    n_planes, n_tables = _resolve_lsh_geometry(
        embeddings, n_planes, n_tables, n_vectors
    )
    if n_tables > 1:
        buckets = hyperplane_buckets_multi(
            embeddings, dim, n_planes, n_tables, seed
        ).select(F.concat_ws("|", F.col("table"), F.col("bucket")).alias("bucket"), "vec_id")
    else:
        buckets = hyperplane_buckets(embeddings, dim, n_planes, seed)
    a = buckets.select("bucket", F.col("vec_id").alias("vec_id_a"))
    b = buckets.select("bucket", F.col("vec_id").alias("vec_id_b"))
    pairs = (
        a.join(b, "bucket")
        .where(F.col("vec_id_a") < F.col("vec_id_b"))
        .select("vec_id_a", "vec_id_b")
    )
    if n_tables > 1:
        # a pair colliding in several tables must verify (and emit) once
        pairs = pairs.distinct()
    # The verify kernel is CPU-bound (per-pair 2x-dim dot products), but the
    # bare-pair set is tiny in BYTES — AQE coalesces it to a handful of
    # partitions and the kernel runs nearly serial (observed at sf1: 12.5M
    # pairs in 2 partitions).  Spread the pairs across the task slots before
    # attaching embeddings; the exchanged rows are two ids each, so the
    # extra shuffle is noise.
    pairs = pairs.repartition(
        embeddings.sparkSession.sparkContext.defaultParallelism
    )
    emb_a = embeddings.select(
        F.col("vec_id").alias("vec_id_a"), F.col("embedding").alias("ea")
    )
    emb_b = embeddings.select(
        F.col("vec_id").alias("vec_id_b"), F.col("embedding").alias("eb")
    )
    cand = pairs.join(emb_a, "vec_id_a").join(emb_b, "vec_id_b")

    def verify(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ma = np.stack(pdf["ea"].to_numpy()).astype(np.float64)
            mb = np.stack(pdf["eb"].to_numpy()).astype(np.float64)
            cos = (ma * mb).sum(axis=1) / (
                np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
            )
            out = pd.DataFrame(
                {
                    "vec_id_a": pdf["vec_id_a"],
                    "vec_id_b": pdf["vec_id_b"],
                    "cosine": np.round(cos, round_to),
                }
            )
            yield out[out["cosine"] >= threshold]

    return cand.mapInPandas(verify, "vec_id_a long, vec_id_b long, cosine double")
