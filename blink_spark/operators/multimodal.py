"""Multimodal asset handling: opaque binary payloads + typed metadata.

Extends the engine to image/audio/video training data: assets are rows
with an opaque ``binary`` payload and a typed metadata struct; decode
/ feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` stages. The decode step itself is STUBBED in this
container (no image/audio libraries): ``decode_real`` raises
NotImplementedError, while ``byte_features`` is a deterministic
payload-derived fake with the exact same Spark-side plumbing — schema,
partitioning, UDF signature, and batch shape are real and tested.

Mirrors the reference's treatment of tokenized tensors as opaque
fixed-width payloads moved between stages
(/root/reference/blink/biencoder/data_process_mult.py:200-211).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id bigint, kind string, payload binary, "
    "meta struct<mime:string, n_bytes:bigint, width:int, height:int, "
    "sample_rate:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "asset_id bigint, kind string, n_bytes bigint, sha256 string, "
    "features array<double>"
)

N_FEATURES = 16  # byte-histogram bins for the deterministic fake


def assets_from_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Wrap a text table as binary assets (deterministic fixture: the
    payload is the utf-8 encoded text; metadata typed like a real
    image/audio catalog row)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit("text/blob").alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def asset_metadata(assets: DataFrame) -> DataFrame:
    """Typed-metadata projection + payload integrity columns — all
    JVM-side (pushdown-friendly: never decodes the payload)."""
    return assets.select(
        "asset_id",
        "kind",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("payload_sha256"),
    )


def decode_real(payload: bytes, kind: str):
    """Real decode (image/audio/video). STUB: the decode libraries
    (PIL / torchaudio / av) are not installed in this container."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "container; byte_features provides the deterministic test fake"
    )


def byte_features(payload: bytes) -> np.ndarray:
    """Deterministic fake feature extractor: L1-normalized 16-bin byte
    histogram. Same signature/shape a real embedding would have."""
    if payload is None or len(payload) == 0:
        return np.zeros(N_FEATURES, dtype=np.float64)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=N_FEATURES).astype(np.float64)
    return hist / hist.sum()


def extract_features(assets: DataFrame, use_real_decode: bool = False) -> DataFrame:
    """mapInPandas feature-extraction stage: one Arrow batch in, one
    out; partitioning preserved (no shuffle). Flip use_real_decode
    once decode libraries exist — the plumbing is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats, shas, sizes = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload) if payload is not None else b""
                if use_real_decode:
                    decode_real(raw, kind)  # pragma: no cover - stub
                feats.append(byte_features(raw).tolist())
                shas.append(hashlib.sha256(raw).hexdigest())
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "sha256": shas,
                    "features": feats,
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling plumbing: explode each payload into fixed-stride
    "frames" (offset + slice) — the partition/explode shape of real
    video frame sampling, with byte slices standing in for frames."""
    n_frames = F.greatest(
        F.ceil(F.octet_length("payload") / F.lit(every_n_bytes)).cast("int"), F.lit(1)
    )
    return assets.select(
        "asset_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no", "frame_idx"),
        F.octet_length("payload").alias("n_bytes"),
    ).select(
        "asset_id",
        "frame_no",
        (F.col("frame_idx") * every_n_bytes).cast("long").alias("byte_offset"),
        "n_bytes",
    )
