"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed by Arrow-batched pandas stages.

The decode step is STUBBED (image/audio libraries are not in this
container): `decode_image` raises NotImplementedError unless a
deterministic fake decoder is requested. Everything Spark-side — schema,
partitioning, mapInPandas batch shape, metadata propagation — is real and
tested; a real PIL/ffmpeg decode drops into `_decode_bytes` unchanged.

Scale notes: binary payloads ride the Arrow stream in bounded batches
(spark.sql.execution.arrow.maxRecordsPerBatch); feature rows are tiny, so
the stage is a pure narrow map — decode fan-out never shuffles payloads.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, width int, height int, payload binary"
)

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes int, byte_mean double, "
    "byte_std double, phash string"
)


def synth_media_df(spark, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table: payload bytes = sha256(text) digest,
    metadata columns typed. Stands in for an Iceberg table with a binary
    column at scale. Every derived value is md5/sha256-based so a DuckDB
    oracle can rebuild the whole feature table byte-for-byte (the reason
    sha256, not sha512: DuckDB ships no sha512)."""
    return docs.select(
        F.col(id_col).cast("string").alias("media_id"),
        (
            F.when(F.conv(F.substring(F.md5(F.col(text_col)), 1, 1), 16, 10).cast("int") % 2 == 0, "image")
            .otherwise("audio")
        ).alias("kind"),
        F.lit(32).alias("width"),
        F.lit(32).alias("height"),
        F.to_binary(F.sha2(F.col(text_col).cast("binary"), 256), F.lit("hex")).alias("payload"),
    )


def _decode_bytes(payload: bytes, kind: str, fake: bool) -> np.ndarray:
    """Real decoders (PIL.Image.open / soundfile.read) slot in here."""
    if not fake:
        raise NotImplementedError(
            "real image/audio decode requires PIL/soundfile — not available "
            "in this environment; pass fake_decode=True for the "
            "deterministic stand-in"
        )
    return np.frombuffer(payload, dtype=np.uint8)


def extract_media_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """media -> per-item features via mapInPandas (one Arrow batch of binary
    payloads in, one small feature frame out)."""

    def _round4(x: float) -> float:
        # explicit HALF-UP at 4 decimals: byte means over 32 bytes land on
        # exact 5s at the 5th decimal for half the inputs (odd/32), where
        # Python's banker's round and SQL ROUND diverge — floor(x*1e4+0.5)
        # is the same arithmetic the DuckDB oracle runs
        import math

        return math.floor(x * 10000.0 + 0.5) / 10000.0

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = {k: [] for k in ("media_id", "kind", "n_bytes", "byte_mean", "byte_std", "phash")}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                arr = _decode_bytes(bytes(payload), kind, fake_decode)
                feats["media_id"].append(mid)
                feats["kind"].append(kind)
                feats["n_bytes"].append(len(arr))
                feats["byte_mean"].append(_round4(float(arr.mean())) if len(arr) else 0.0)
                feats["byte_std"].append(_round4(float(arr.std())) if len(arr) else 0.0)
                # perceptual-hash stand-in: md5 over the decimal-joined
                # 8x-downsampled (truncated-mean) bytes — string-keyed so
                # any engine can recompute it without binary plumbing
                ds = arr[: (len(arr) // 8) * 8].reshape(-1, 8).mean(axis=1) if len(arr) >= 8 else arr
                key = "-".join(str(int(v)) for v in ds.astype(np.uint8))
                feats["phash"].append(hashlib.md5(key.encode()).hexdigest()[:16])
            yield pd.DataFrame(feats)

    return media.mapInPandas(run, FEATURE_SCHEMA)
