"""Scale bench for the dedup/ANN family (VERDICT r2 item 7): time the
bucketed paths against their exact twins as the input grows, to show the
crossover empirically instead of by plan argument.

Inputs are derived from the driver-provided sf0.1 parquet (never
synthesized from scratch): documents/embeddings are replicated K times
with deterministic per-copy perturbation — a copy-marker word appended to
each text (so copies are NEAR-duplicates, jaccard ~ n/(n+1)) and a
deterministic sinusoidal nudge on each embedding (cosine ~0.999) — which
reproduces the duplicate-heavy structure these operators exist for.

Usage: python tools/bench_scale_dedup.py
Writes bench_scale.json at the repo root; bench.py --scaling folds it into
BENCH.md when present.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scaled_docs(spark, k: int):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if k == 1:
        return docs.select("doc_id", "text", "source")
    copies = spark.range(k).select(F.col("id").alias("copy"))
    return (
        docs.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") + F.col("copy") * F.lit(10_000_000)).alias("doc_id"),
            # copy 0 keeps the original text; others append a marker word ->
            # the k copies of a doc are near-duplicates, not exact ones
            F.when(F.col("copy") == 0, F.col("text"))
            .otherwise(F.concat_ws(" ", "text", F.concat(F.lit("cpy"), "copy")))
            .alias("text"),
            "source",
        )
    )


def scaled_embeddings(spark, k: int):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    if k == 1:
        return emb.select("vec_id", "embedding")
    copies = spark.range(k).select(F.col("id").alias("copy"))
    # deterministic JVM-side perturbation: cos ~0.999 vs the original
    return (
        emb.crossJoin(F.broadcast(copies))
        .select(
            (F.col("vec_id") + F.col("copy") * F.lit(10_000_000)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + F.when(F.col("copy") == 0, F.lit(0.0)).otherwise(
                    0.02 * F.sin(F.col("vec_id") * (i + 1) + F.col("copy"))
                ).cast("float"),
            ).alias("embedding"),
        )
    )


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    from kg.ops import dedup as D
    from kg.ops import similarity as S
    from kg.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="kg-scale-dedup",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, int(cpus)),
    )
    qvec = [
        float(x)
        for x in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .where(F.col("vec_id") == 0)
        .collect()[0]["embedding"]
    ]

    # untimed warm-up: Python workers, codegen, CC path — so the 1x cells
    # measure the operator, not session cold-start
    warm = scaled_docs(spark, 1).limit(500).localCheckpoint()
    D.minhash_clusters(warm).write.format("noop").mode("overwrite").save()
    D.simhash_neardup(warm).write.format("noop").mode("overwrite").save()
    D.word_jaccard_pairs(warm).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    # document family: bucketed paths only (there is no exact twin that is
    # even runnable past 1x — all-pairs jaccard is O(n^2))
    for k in (1, 4, 10):
        docs = scaled_docs(spark, k).localCheckpoint()
        n = docs.count()
        row = {
            "n_docs": n,
            "minhash_clusters": timed(lambda: D.minhash_clusters(docs)),
            "simhash_neardup": timed(lambda: D.simhash_neardup(docs)),
            "word_jaccard_pairs": timed(
                lambda: D.word_jaccard_pairs(docs, min_jaccard=0.5)
            ),
        }
        out[f"docs_{k}x"] = row
        print("docs", k, row, flush=True)

    # embedding family: exact all-pairs twin vs LSH; exact is quadratic so
    # it runs only at 1x/4x and is projected at 10x (documented, not hidden)
    for k in (1, 4, 10):
        emb = scaled_embeddings(spark, k).localCheckpoint()
        n = emb.count()
        row = {
            "n_vectors": n,
            "auto_geometry": list(S.auto_lsh_config(n)),
            # fixed 8x8 cell: kept to SHOW the saturation cliff the auto
            # sizing exists to avoid (BENCH.md observations)
            "nn_pairs_lsh_8x8_fixed": timed(
                lambda: S.embedding_nn_pairs_lsh(
                    emb, dim=64, threshold=0.9, n_planes=8, n_tables=8
                )
            ),
            # the DEFAULT path: geometry auto-sized from cardinality
            "nn_pairs_lsh_auto": timed(
                lambda: S.embedding_nn_pairs_lsh(emb, dim=64, threshold=0.9)
            ),
            "ann_lsh": timed(lambda: S.lsh_ann(emb, qvec, k=10)),
            "cosine_topk_full_scan": timed(lambda: S.cosine_topk(emb, qvec, k=10)),
        }
        if k <= 4:
            row["nn_pairs_exact"] = timed(
                lambda: S.embedding_nn_pairs(emb, threshold=0.9)
            )
        else:
            # production plane sizing at the grown n (n_planes ~
            # log2(n/occupancy)): the 8-plane cell above shows bucket
            # saturation, this one shows sizing it away
            row["nn_pairs_lsh_multi_12planes"] = timed(
                lambda: S.embedding_nn_pairs_lsh(
                    emb, dim=64, threshold=0.9, n_planes=12, n_tables=8
                )
            )
        out[f"emb_{k}x"] = row
        print("emb", k, row, flush=True)

    spark.stop()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_scale.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
