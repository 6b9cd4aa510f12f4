"""Multimodal columns: opaque binary payloads + typed metadata.

Design per the build brief: image/audio/video are `binary` columns with
a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched kernels over mapInPandas. The actual
media codecs are NOT in this container, so the decode step is STUBBED:

  - decode_media(..., strict=True)  raises NotImplementedError at the
    kernel boundary (the documented production integration point for a
    real codec, e.g. PIL/ffmpeg shipped via --py-files), and
  - strict=False substitutes a DETERMINISTIC fake decode (blake2b-seeded
    pixel/PCM synthesis) so the Spark-side plumbing — schema,
    partitioning, UDF signature, batch shape — is real and tested.

Everything around the stub (schemas, batching, partition strategy) is
production-shaped: payloads never pass through Python row-at-a-time,
metadata is JVM-prunable, and frame sampling happens before feature
extraction so only sampled bytes cross into the kernel.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<format:string, width:int, height:int, "
    "duration_ms:int, sample_rate:int>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, sha bigint, "
    "features array<float>"
)

RESIZE_SCHEMA = (
    "media_id bigint, width int, height int, payload binary"
)

FRAME_SCHEMA = (
    "media_id bigint, frame_idx int, frame_ms int, payload binary"
)


def synth_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.blake2b(
            f"{seed}:{i}".encode(), digest_size=32
        ).digest() * (4 + i % 5)
        meta = {
            "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
            "width": 64 + (i % 8) * 16 if kind != "audio" else None,
            "height": 48 + (i % 8) * 12 if kind != "audio" else None,
            "duration_ms": 1000 * (1 + i % 30) if kind != "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, kind: str):
    """Deterministic stand-in for a real codec: derives a fixed-length
    float feature vector purely from payload bytes. Replace with real
    decode at the marked integration point."""
    import numpy as np

    h = hashlib.blake2b(payload, digest_size=64).digest()
    arr = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    return arr / 255.0


def decode_media(df: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas).

    strict=True: the honest production stub — raises
    NotImplementedError("media codecs not available in this container")
    from inside the kernel, proving the plumbing end-to-end.
    strict=False: deterministic fake decode for tests/benchmarks.
    """

    def _kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media codecs not available in this container; "
                    "ship PIL/ffmpeg via --py-files and replace "
                    "_fake_decode at this integration point"
                )
            feats = []
            shas = []
            nbytes = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                nbytes.append(len(b))
                shas.append(
                    int.from_bytes(
                        hashlib.blake2b(b, digest_size=4).digest(), "little"
                    )
                )
                feats.append([float(x) for x in _fake_decode(b, "any")])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": nbytes,
                "sha": shas,
                "features": feats,
            })

    return df.select("media_id", "kind", "payload").mapInPandas(
        _kernel, FEATURE_SCHEMA
    )


def resize_images(df: DataFrame, width: int = 32,
                  height: int = 32) -> DataFrame:
    """Resize plumbing: filter to images JVM-side (partition pruning
    friendly), then a batched kernel producing the resized payload.
    The resize itself is the deterministic fake (byte resampling)."""

    def _kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                need = width * height
                rep = (b * (need // max(len(b), 1) + 1))[:need]
                out.append(bytearray(rep))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": [width] * len(pdf),
                "height": [height] * len(pdf),
                "payload": out,
            })

    imgs = df.where(F.col("kind") == "image")
    return imgs.select("media_id", "payload").mapInPandas(
        _kernel, RESIZE_SCHEMA
    )


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  max_frames: int = 8) -> DataFrame:
    """Frame sampling for video: JVM-side explode of the sample GRID
    (timestamps from metadata — no payload touched), then one batched
    kernel slicing payload bytes per sampled frame. At scale the
    pre-explode keeps Python traffic proportional to sampled frames,
    not to video bytes."""
    vids = df.where(F.col("kind") == "video").select(
        "media_id", "payload",
        F.least(
            (F.col("meta.duration_ms") / every_ms).cast("int") + 1,
            F.lit(max_frames),
        ).alias("n_frames"),
    )
    grid = vids.select(
        "media_id", "payload",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1)
        ).alias("frame_idx"),
    ).withColumn("frame_ms", F.col("frame_idx") * every_ms)

    def _kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = []
            for payload, idx in zip(pdf["payload"], pdf["frame_idx"]):
                b = bytes(payload)
                chunk = max(len(b) // max_frames, 1)
                start = int(idx) * chunk
                payloads.append(bytearray(b[start:start + chunk]))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "frame_idx": pdf["frame_idx"],
                "frame_ms": pdf["frame_ms"],
                "payload": payloads,
            })

    return grid.mapInPandas(_kernel, FRAME_SCHEMA)
