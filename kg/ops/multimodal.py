"""Multimodal column plumbing: media as opaque ``binary`` + typed metadata.

The image/audio/video decode libraries are not present in this container, so
the *decode* step is stubbed (clearly marked), while everything Spark-side —
schema, partitioning, Arrow batch shape, UDF signatures — is real and tested:

- ``media_table``: deterministic synthetic media rows (binary payload +
  metadata struct) derived from the interleaved corpus's media spans.
- ``extract_features``: ``mapInPandas`` over binary columns producing a
  fixed-width float feature vector per asset.  The real implementation would
  decode with PIL/ffmpeg inside the same kernel; here a deterministic
  byte-hash projection stands in (STUB), keeping batch shapes honest.
- ``decode_image``: the genuinely-impossible step, gated behind
  ``NotImplementedError`` with the intended signature.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 16

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("bytes", T.IntegerType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)


def fake_payload(media_ref: str) -> bytes:
    """Deterministic 256-byte blob per ref (sha256 stretched) — the
    stand-in for reading the object store.  Pure scalar function: shared
    by the distributed kernel AND the driver-side oracle dimension table
    (kg/oracle_tables.py), like the tokenizer's words table."""
    seed = hashlib.sha256(media_ref.encode()).digest()
    return (seed * 8)[:256]


def payload_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Byte-hash projection (STUB for decode+CNN): mean of ``dim`` chunks,
    L2-normalized, float32.  Pure scalar function — see ``fake_payload``."""
    raw = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    chunks = np.resize(raw, (dim, max(1, raw.size // dim)))
    v = chunks.mean(axis=1)
    norm = np.linalg.norm(v)
    return (v / norm if norm else v).astype(np.float32).tolist()


def media_table(docs: DataFrame) -> DataFrame:
    """Media spans -> opaque binary assets with typed metadata.

    Payload is a deterministic function of media_ref (``fake_payload``) —
    a stand-in for reading the object store; the Spark plumbing (binary
    column, struct metadata, distinct refs) is the real thing.
    """
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") != "text")
        .select(F.col("s.media_ref").alias("media_ref"), F.col("s.kind").alias("kind"))
        .distinct()
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            payloads, metas = [], []
            for ref, kind in zip(pdf["media_ref"], pdf["kind"]):
                payload = fake_payload(ref)
                payloads.append(payload)
                metas.append({"bytes": len(payload), "mime": f"{kind}/x-synthetic"})
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "content": payloads,
                    "meta": metas,
                }
            )

    return refs.mapInPandas(kernel, MEDIA_SCHEMA)


def decode_image(content: bytes) -> "np.ndarray":
    """STUB: real decode requires PIL/libjpeg, absent in this container.

    Intended contract: content (encoded bytes) -> HxWx3 uint8 array.
    """
    raise NotImplementedError(
        "image decode requires PIL/libjpeg which are not installed; "
        "extract_features uses the deterministic byte-hash stand-in instead"
    )


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """(media_ref, kind, features float[dim]) via an Arrow-batched kernel.

    Deterministic byte-hash projection stands in for a real decoder+CNN; the
    batch shape (NumPy matrix per Arrow batch) matches what the real kernel
    would do after decode.
    """

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            feats = [payload_features(bytes(c), dim) for c in pdf["content"]]
            yield pd.DataFrame(
                {"media_ref": pdf["media_ref"], "kind": pdf["kind"], "features": feats}
            )

    return media.mapInPandas(
        kernel, "media_ref string, kind string, features array<float>"
    )
