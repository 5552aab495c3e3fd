"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The reference routes modalities through string aliases (ImageBase64 etc.,
``core/lib/schemas.py:20-57``) and converts files to base64 rows
(``iter_dataset.py:284-323, 472-511``). Here a modal asset is a real
``binary`` column plus typed metadata, and all processing is Arrow-batched
``mapInPandas`` over those bytes.

This container has no image/audio libraries, so the actual byte decoders are
STUBBED: ``decode=fake`` produces a deterministic feature vector from the
bytes (so the distributed plumbing — schema, partition sizing, UDF batch
shape — is real and tested end-to-end); ``decode=real`` raises
``NotImplementedError`` with the dependency it needs. Swapping in a real
decoder changes ONE function, not the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def read_binary_assets(spark: SparkSession, path: str, modality: str) -> DataFrame:
    """Ingest a directory of media files: one row per file, bytes + metadata.
    (``spark.read.format("binaryFile")`` — the ImageFileDataset analogue.)"""
    df = spark.read.format("binaryFile").load(path)
    return df.select(
        F.xxhash64("path").alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.col("content"),
        F.element_at(F.split("path", r"\."), -1).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def _fake_features(buf: bytes | None, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: hash bytes → unit vector."""
    if buf is None:
        return [0.0] * dim
    seed = int.from_bytes(bytes(buf[:8]).ljust(8, b"\0"), "little") % (2**32)
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).tolist()


def extract_features(
    df: DataFrame,
    dim: int = 16,
    decode: str = "fake",
    content_col: str = "content",
) -> DataFrame:
    """binary → feature vector via Arrow-batched ``mapInPandas``.

    ``decode="real"`` is the integration point for PIL/librosa/ffmpeg — not
    installed in this container, so it raises with guidance.
    """
    if decode == "real":
        raise NotImplementedError(
            "real media decoding needs PIL/librosa/ffmpeg, none of which are "
            "in this container; use decode='fake' for plumbing tests and "
            "swap this branch on a cluster image that ships them"
        )

    out_fields = df.schema.fieldNames()

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_features(None if b is None else bytes(b), dim)
                for b in pdf[content_col]
            ]
            yield pdf.assign(features=pd.Series(feats, index=pdf.index))

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("features", T.ArrayType(T.DoubleType()))]
    )
    return df.mapInPandas(compute, schema=schema)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, content_col: str = "content"
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame with
    ``frame_idx``/``frame_ts_ms`` (fan-out via Arrow batches; the frame bytes
    themselves come from the stubbed decoder — deterministic slices here)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                raw_dur = r.get("duration_ms")
                dur = 3000 if raw_dur is None or pd.isna(raw_dur) else int(raw_dur)
                n = max(dur // every_ms, 1)
                content = b"" if r[content_col] is None else bytes(r[content_col])
                for i in range(n):
                    chunk = content[i::n][:64] if content else b""
                    rows.append(
                        {
                            "asset_id": r["asset_id"],
                            "frame_idx": i,
                            "frame_ts_ms": i * every_ms,
                            "frame_bytes": chunk,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "frame_ts_ms", "frame_bytes"]
            )

    return df.mapInPandas(
        compute,
        schema="asset_id long, frame_idx int, frame_ts_ms long, frame_bytes binary",
    )
