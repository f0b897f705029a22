"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns alongside a
metadata struct; heavy per-item work (decode, resize, feature extraction,
frame sampling) runs in Arrow-batched ``mapInPandas`` so executors process
thousands of items per Python call.  The actual media decode is STUBBED —
codec libraries are not available in this container — behind deterministic
fakes / NotImplementedError, while the Spark-side contract (schema,
batching, partitioning) is real and tested.

Greenfield Spark work (no reference counterpart).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_entropy", T.DoubleType(), True),
        T.StructField("head_hex", T.StringType(), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table from a text corpus (for pipeline tests):
    content = utf-8 bytes of the text, metadata derived from its length."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            (F.length(text_col) % 1920).cast("int").alias("width"),
            (F.length(text_col) % 1080).cast("int").alias("height"),
            (F.length(text_col) * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_image(content: bytes) -> object:
    """STUB: real deployments plug Pillow/torchvision here."""
    raise NotImplementedError(
        "image decoding requires an image library (e.g. Pillow); not available "
        "in this environment — the mapInPandas plumbing around it is real"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Byte-level features per media item via Arrow-batched mapInPandas.

    Stands in for a real decode+featurize stage: the batch shape, schema
    contract and partition-parallelism are exactly what a CNN/whisper
    feature extractor would use.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    rows.append((media_id, 0, 0.0, ""))
                    continue
                data = bytes(content)
                n = len(data)
                if n:
                    # vectorized histogram — a per-byte Python loop would be
                    # the batch bottleneck at real media sizes
                    counts = np.bincount(np.frombuffer(data, dtype=np.uint8), minlength=256)
                    p = counts[counts > 0] / n
                    entropy = float(-(p * np.log2(p)).sum())
                else:
                    entropy = 0.0
                rows.append((media_id, n, round(entropy, 6), data[:8].hex()))
            yield pd.DataFrame(rows, columns=["media_id", "n_bytes", "byte_entropy", "head_hex"])

    return df.select("media_id", "content").mapInPandas(_batches, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Deterministic fake frame sampler: one "frame" (byte slice) per period.

    Real video decode would replace the slice with an actual frame decode;
    the explode-based fan-out (one row per frame, repartitionable) is the
    scale-relevant part and is real.
    """
    frame_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_bytes", T.BinaryType(), True),
        ]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                duration = (meta["duration_ms"] if meta is not None else 0) or 0
                n_frames = max(int(duration // every_ms), 1)
                data = bytes(content) if content is not None else b""
                step = max(len(data) // n_frames, 1)
                for i in range(n_frames):
                    rows.append((media_id, i, data[i * step : (i + 1) * step]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_bytes"])

    return df.select("media_id", "content", "meta").mapInPandas(_batches, frame_schema)
