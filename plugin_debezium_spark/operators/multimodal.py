"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs
over mapInPandas.

The actual codec work (PIL/ffmpeg/librosa) is NOT available in this
container, so the decode kernels are stubbed: ``decode_mode="fake"``
derives deterministic pseudo-features from the bytes (so the Spark
plumbing — schema, batching, partitioning, UDF signatures — is real
and tested end-to-end), and ``decode_mode="real"`` raises
NotImplementedError at the exact point a codec library would slot in.

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low for large blobs
(10k rows × 5 MB images = 50 GB batches otherwise). Feature extraction
is embarrassingly parallel — mapInPandas, no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "width int, height int, channels int, mean_luma double"
)


def attach_binary_payload(
    df: DataFrame, src_col: str, media_id_col: str, kind: str = "image"
) -> DataFrame:
    """Demo/bootstrap: treat an existing string column as the encoded
    media payload (binary), with typed metadata columns alongside —
    the shape a real ingest would produce from object-store pointers."""
    return df.select(
        F.col(media_id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(src_col), "utf-8").alias("payload"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for an image decode: dimensions and mean
    luma derived from the bytes. Replace with PIL.Image.open in a real
    deployment."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    channels = 3
    mean_luma = (sum(payload[:256]) % 2560) / 10.0 if n else 0.0
    return width, height, channels, mean_luma


def extract_media_features(
    df: DataFrame, decode_mode: str = "fake"
) -> DataFrame:
    """media rows (media_id, kind, payload) → typed metadata. One
    mapInPandas pass; no shuffle; Arrow-batched."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if decode_mode == "real":
                raise NotImplementedError(
                    "real image/audio decode needs PIL/ffmpeg — not "
                    "available in this environment; plug the codec in "
                    "here (signature stays identical)"
                )
            feats = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "sha256": [
                        hashlib.sha256(p).hexdigest() for p in pdf["payload"]
                    ],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "channels": [f[2] for f in feats],
                    "mean_luma": [f[3] for f in feats],
                }
            )

    return df.mapInPandas(_extract, schema=MEDIA_META_SCHEMA)


def frame_sample(
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """'Video' frame sampling stand-in: emit byte-slices as frames
    (media_id, frame_idx, frame_bytes). Real ffmpeg keyframe sampling
    slots into the same explode-shaped plan."""
    idx = F.explode(F.sequence(F.lit(0), F.lit(max_frames - 1))).alias(
        "frame_idx"
    )
    out = df.select("media_id", "payload", idx)
    return (
        out.withColumn("off", F.col("frame_idx") * every_n_bytes)
        .filter(F.col("off") < F.length("payload"))
        .select(
            "media_id",
            "frame_idx",
            F.expr(f"substring(payload, off + 1, {every_n_bytes})").alias(
                "frame_bytes"
            ),
        )
    )
