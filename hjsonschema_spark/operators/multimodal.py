"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed with Arrow-batched
``mapInPandas``.

The decode step itself is STUBBED (no image/audio libraries in this
runtime): ``decoder='fake'`` produces a deterministic pseudo-decode
from the bytes (so the Spark-side plumbing — schema, batching,
partitioning — is fully real and testable), and ``decoder='real'``
raises NotImplementedError at the exact integration point where
PIL/libav would plug in.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, payload binary, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, byte_mean double, "
    "byte_entropy double, phash long"
)


def synth_media(spark, n: int = 64, seed: int = 42, n_partitions: int = 8) -> DataFrame:
    """Deterministic synthetic media table (binary payloads derived
    from xxhash64 — stands in for real image/audio bytes)."""
    df = spark.range(0, n, 1, n_partitions).withColumnRenamed("id", "media_id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("media_id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    mime = F.when(kind == "image", "image/png").when(kind == "audio", "audio/wav").otherwise("video/mp4")
    n_chunks = (F.pmod(F.xxhash64("media_id", F.lit(seed), F.lit("len")), F.lit(48)) + 16).cast("int")
    payload = F.to_binary(
        F.sha2(F.concat(F.lit("payload"), F.col("media_id").cast("string"), F.lit(seed)), 256), F.lit("hex")
    )
    payload = F.concat(*[payload] * 4)  # ~128 bytes
    return df.select(
        "media_id",
        kind.alias("kind"),
        mime.alias("mime"),
        payload.alias("payload"),
        F.when(kind == "image", F.lit(64)).cast("int").alias("width"),
        F.when(kind == "image", F.lit(64)).cast("int").alias("height"),
        F.when(kind != "image", (F.pmod(F.xxhash64("media_id", F.lit("dur")), F.lit(60000))).cast("int")).alias("duration_ms"),
    )


def _decode_fake(payload: bytes) -> np.ndarray:
    """Deterministic pseudo-decode: bytes -> uint8 'pixel' array."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    return arr


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    plumbing (Arrow batches, per-partition streaming, typed output
    schema); only the decode call is faked."""
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if decoder == "real":
                    raise NotImplementedError(
                        "real decoders (PIL/libav) are not available in this "
                        "runtime; plug them in here"
                    )
                arr = _decode_fake(bytes(payload))
                n = len(arr)
                counts = np.bincount(arr, minlength=256)
                probs = counts[counts > 0] / n
                entropy = float(-(probs * np.log2(probs)).sum())
                # perceptual-hash stand-in: sign bits of mean-centered chunks
                chunks = arr[: (n // 64) * 64].reshape(64, -1).mean(axis=1)
                bits = (chunks > chunks.mean()).astype(np.uint64)
                phash = int(((bits << np.arange(64, dtype=np.uint64)).sum()).astype(np.uint64).view(np.int64))
                out.append((mid, kind, n, float(arr.mean()), entropy, phash))
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "n_bytes", "byte_mean", "byte_entropy", "phash"]
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per
    sampled timestamp (real frame extraction would decode at these
    offsets). Pure column ops — the sampling grid is computed JVM-side."""
    vids = df.filter(F.col("kind") == "video")
    grid = F.sequence(F.lit(0), F.greatest(F.lit(0), F.col("duration_ms") - 1), F.lit(every_ms))
    return vids.select("media_id", F.explode(grid).alias("frame_ts_ms"))
