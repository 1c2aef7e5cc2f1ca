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
    """(vec_id, cosine) of every vector vs the query; JVM-side math."""
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


def cosine_topk_np(embeddings: DataFrame, query_vec: list[float], k: int = 10) -> DataFrame:
    """Arrow/NumPy brute force: per-batch matrix-vector product."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            sims = (m @ q) / (np.linalg.norm(m, axis=1) * qn)
            out = pd.DataFrame({"vec_id": pdf["vec_id"], "cosine": sims})
            yield out.nlargest(min(k, len(out)), "cosine")  # per-batch prune

    partial = embeddings.select("vec_id", "embedding").mapInPandas(
        kernel, "vec_id long, cosine double"
    )
    return partial.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def _planes(dim: int, n_planes: int = 12, seed: int = 13) -> np.ndarray:
    rs = np.random.RandomState(seed)
    return rs.standard_normal((n_planes, dim))


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


def lsh_ann(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    seed: int = 13,
) -> DataFrame:
    """ANN top-k: brute-force cosine *within the query's LSH bucket only*."""
    dim = len(query_vec)
    planes = _planes(dim, n_planes, seed)
    qkey = "".join("1" if s else "0" for s in (planes @ np.asarray(query_vec)) >= 0)
    buckets = hyperplane_buckets(embeddings, dim, n_planes, seed)
    candidates = embeddings.join(
        buckets.where(F.col("bucket") == qkey).select("vec_id"), "vec_id"
    )
    return cosine_topk(candidates, query_vec, k)
