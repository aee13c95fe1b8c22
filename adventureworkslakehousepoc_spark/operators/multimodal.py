"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the *decode* step is a
deterministic stub (clearly marked); everything Spark-side — schema, the
binary column plumbing, batch shapes, partition-parallel UDF execution — is
real and tested. Swap ``_decode_stub`` for a PIL/torchaudio call in prod.

Scale posture: payloads never pass through the driver; ``mapInPandas``
streams Arrow batches per partition, and metadata extraction before decode
lets partition pruning / predicate pushdown skip undecodable or oversized
payloads at the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["attach_binary_payload", "payload_metadata", "decode_features"]


def attach_binary_payload(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque binary column + typed metadata from text (the
    testdata has no real media; the plumbing is the point). Schema mirrors a
    real multimodal table: (doc_id, payload binary, media_type, byte_len)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.when((F.col(id_col) % 3) == 0, "image/png")
        .when((F.col(id_col) % 3) == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.length(F.encode(F.col(text_col), "UTF-8")).alias("byte_len"),
    )


def payload_metadata(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Metadata-only pass (no decode): digest + size + type. Pure built-ins —
    this is the cheap scan that gates the expensive decode stage."""
    payloads = attach_binary_payload(docs, text_col, id_col)
    return payloads.select(
        "doc_id",
        "media_type",
        "byte_len",
        F.md5(F.col("payload")).alias("payload_md5"),
    )


def _decode_stub(payload: bytes, media_type: str) -> dict:
    """Deterministic fake decode. A real deployment replaces this with the
    codec call; the surrounding Spark plumbing is unchanged.

    Raises ``NotImplementedError`` for media types the stub doesn't model,
    exactly as a real decoder would for unsupported codecs."""
    if media_type not in ("image/png", "audio/wav", "video/mp4"):
        raise NotImplementedError(f"no decoder for {media_type}")
    checksum = sum(payload) % 65536
    return {
        "width": 16 + checksum % 64,          # fake: derived from payload bytes
        "height": 16 + (checksum // 64) % 64,
        "n_frames": 1 if media_type == "image/png" else 1 + checksum % 30,
        "checksum": checksum,
    }


def decode_features(payloads: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched decode + feature extraction over the binary column.
    Input: (doc_id, payload, media_type, ...). Output one typed feature row
    per payload. Runs partition-parallel; nothing touches the driver."""
    import pandas as pd

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [
                _decode_stub(bytes(p), m) for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out

    schema = "doc_id bigint, media_type string, width bigint, height bigint, n_frames bigint, checksum bigint"
    return payloads.select("doc_id", "payload", "media_type").mapInPandas(decode_batches, schema)
