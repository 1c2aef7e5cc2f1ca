"""Entity linking + canonicalization (SURVEY.md §7.1 step 7).

MinHash over char n-grams of the mention surface (vectorized NumPy inside a
``mapInPandas`` kernel), LSH banding into bucket keys, candidate pairs via a
bucket self-equi-join (AQE skew-join handles hot buckets; mega-buckets above
``max_bucket`` are dropped with a logged counter — standard LSH practice),
exact-Jaccard verification, then connected components as iterative min-label
propagation on DataFrames (GraphFrames-style; per-iteration
``localCheckpoint`` cuts lineage growth, SURVEY.md §4).  Canonical form of a
component is its lexicographically smallest mention text.

Skew (north_rule): identical surface forms are deduplicated *before* hashing
(``distinct`` on mention text), which removes the Zipf mass entirely; what
remains is bucket-level skew among distinct strings, split by AQE skew-join.

All hash functions are explicit modular arithmetic (no engine-dependent
``hash()``), shared verbatim with the driver-side twin ``link_local`` used
by the parity tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg.config import LINK_JACCARD, LSH_BANDS, MINHASH_PRIME, NUM_HASHES, SHINGLE_K

_P = MINHASH_PRIME


def _hash_params(num_hashes: int = NUM_HASHES, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rs = np.random.RandomState(seed)
    a = rs.randint(1, _P, size=num_hashes).astype(np.int64)
    b = rs.randint(0, _P, size=num_hashes).astype(np.int64)
    return a, b


def shingle_hashes(text: str, k: int = SHINGLE_K) -> np.ndarray:
    """Distinct char k-gram polynomial hashes (mod 2^31-1), int64."""
    if len(text) < k:
        grams = [text]
    else:
        grams = {text[i : i + k] for i in range(len(text) - k + 1)}
    out = set()
    for g in grams:
        h = 0
        for ch in g:
            h = (h * 131 + ord(ch)) % _P
        out.add(h)
    return np.fromiter(out, dtype=np.int64, count=len(out))


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = shingle_hashes(text)
    if x.size == 0:
        return np.full(a.shape[0], _P - 1, dtype=np.int64)
    # (H, M) = a[:,None]*x[None,:] + b ; min over shingles
    return ((a[:, None] * x[None, :] + b[:, None]) % _P).min(axis=1)


def band_keys(sig: np.ndarray, bands: int = LSH_BANDS) -> list[str]:
    rows = sig.shape[0] // bands
    keys = []
    for bi in range(bands):
        h = 0
        for v in sig[bi * rows : (bi + 1) * rows]:
            h = (h * 1_000_003 + int(v)) % (1 << 61)
        keys.append(f"{bi}:{h:x}")
    return keys


def jaccard(t1: str, t2: str) -> float:
    s1 = set(shingle_hashes(t1).tolist())
    s2 = set(shingle_hashes(t2).tolist())
    if not s1 and not s2:
        return 1.0
    return len(s1 & s2) / len(s1 | s2)


def mention_buckets(mention_texts: DataFrame) -> DataFrame:
    """distinct (mention) -> exploded (mention, bucket) via MinHash bands."""
    a, b = _hash_params()

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            texts, buckets = [], []
            for m in pdf["mention"]:
                for key in band_keys(minhash_signature(m, a, b)):
                    texts.append(m)
                    buckets.append(key)
            yield pd.DataFrame({"mention": texts, "bucket": buckets})

    return mention_texts.select("mention").distinct().mapInPandas(
        kernel, "mention string, bucket string"
    )


def candidate_pairs(buckets: DataFrame, max_bucket: int = 200) -> DataFrame:
    """Self-join within buckets; mega-buckets dropped (counter via observe)."""
    sized = buckets.join(
        buckets.groupBy("bucket").agg(F.count("*").alias("bsz")), "bucket"
    ).where(F.col("bsz") <= max_bucket)
    left = sized.select("bucket", F.col("mention").alias("m1"))
    right = sized.select("bucket", F.col("mention").alias("m2"))
    return (
        left.join(right, "bucket")
        .where(F.col("m1") < F.col("m2"))
        .select("m1", "m2")
        .distinct()
    )


def verified_edges(pairs: DataFrame, threshold: float = LINK_JACCARD) -> DataFrame:
    """Exact shingle-Jaccard >= threshold on candidate pairs."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            sims = [jaccard(a, b) for a, b in zip(pdf["m1"], pdf["m2"])]
            out = pdf.assign(sim=sims)
            yield out[out["sim"] >= threshold][["m1", "m2", "sim"]]

    return pairs.mapInPandas(kernel, "m1 string, m2 string, sim double")


def connected_components(edges: DataFrame, max_iters: int = 25) -> DataFrame:
    """Min-label propagation -> (mention, canonical).

    Each iteration: label(u) <- min(label(u), min over neighbors label(v));
    ``localCheckpoint`` truncates lineage (SURVEY.md §4).  Linking components
    (surface-form variant clusters) have tiny diameter, so this converges in
    a handful of rounds; a large-star/small-star alternation is the
    O(log n)-round upgrade path for adversarial graphs.
    """
    sym = edges.select(F.col("m1").alias("src"), F.col("m2").alias("dst")).union(
        edges.select(F.col("m2").alias("src"), F.col("m1").alias("dst"))
    )
    sym = sym.repartition("src").localCheckpoint()

    nodes = sym.select(F.col("src").alias("mention")).distinct()
    labels = nodes.select("mention", F.col("mention").alias("canonical")).localCheckpoint()

    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["mention"])
            .groupBy("src")
            .agg(F.min("canonical").alias("nbr_canonical"))
        )
        # one materialization per iteration carries both the new label and
        # the changed flag (2 jobs/iter: checkpoint + cheap flag probe)
        stepped = (
            labels.join(nbr_min, labels["mention"] == nbr_min["src"], "left")
            .select(
                "mention",
                F.least(
                    F.col("canonical"), F.coalesce("nbr_canonical", F.col("canonical"))
                ).alias("new_canonical"),
                (
                    F.coalesce("nbr_canonical", F.col("canonical")) < F.col("canonical")
                ).alias("changed"),
            )
            .localCheckpoint()
        )
        labels = stepped.select("mention", F.col("new_canonical").alias("canonical"))
        if stepped.where("changed").limit(1).count() == 0:
            break
    return labels


def link_mentions(mentions: DataFrame) -> DataFrame:
    """mentions DF (col ``mention``) -> map (mention, canonical).

    Mentions that never met a similar partner map to themselves.

    ``distinct`` and ``buckets`` are re-used by multiple join branches
    (bucket sizing, pair self-join, final mapping) — they are materialized
    once (localCheckpoint; at cluster scale: persist or the stage catalog)
    so the scan + MinHash kernel run once, not per branch.
    """
    distinct = mentions.select("mention").distinct().localCheckpoint()
    buckets = mention_buckets(distinct).localCheckpoint()
    pairs = candidate_pairs(buckets)
    edges = verified_edges(pairs)
    comp = connected_components(edges)
    return (
        distinct.join(comp, "mention", "left")
        .select(
            "mention",
            F.coalesce("canonical", F.col("mention")).alias("canonical"),
        )
    )


# ---------------------------------------------------------------------------
# Driver-side twin (parity tests) — same hash functions, plain Python.
# ---------------------------------------------------------------------------


def link_local(texts: list[str], threshold: float = LINK_JACCARD, max_bucket: int = 200) -> dict[str, str]:
    a, b = _hash_params()
    distinct = sorted(set(texts))
    buckets: dict[str, list[str]] = {}
    for t in distinct:
        for key in band_keys(minhash_signature(t, a, b)):
            buckets.setdefault(key, []).append(t)
    parent = {t: t for t in distinct}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for members in buckets.values():
        if len(members) > max_bucket:
            continue
        for i, m1 in enumerate(members):
            for m2 in members[i + 1 :]:
                if jaccard(m1, m2) >= threshold:
                    r1, r2 = find(m1), find(m2)
                    if r1 != r2:
                        lo, hi = min(r1, r2), max(r1, r2)
                        parent[hi] = lo
    return {t: find(t) for t in distinct}
