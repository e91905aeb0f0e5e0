"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with Arrow-batched decode/feature stages.

Image/audio/video payloads are carried as ``binary`` columns next to typed
metadata (mime, width/height, duration, …). Decoding real media needs
codec libraries that are NOT in this environment, so the decode kernel is
stubbed: ``decode_image_features(real_decode=False)`` runs a deterministic
fake decoder (byte-statistics) through the exact production plumbing —
``mapInPandas`` with Arrow batches, binary in / struct out — and
``real_decode=True`` raises ``NotImplementedError`` where a PIL/ffmpeg
call would go. Swapping in the real kernel changes one function body, not
the plan.

Scale notes: payload columns are large — the schemas keep metadata in
separate (pruned-away) columns so metadata-only queries never read bytes;
decode stages are map-only (no shuffle) and batch through Arrow.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal record schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
    ]
)

#: Output of the image feature stage.
IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_sum", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Adapter used in tests: treat UTF-8 bytes of a text column as an
    opaque payload so the binary plumbing can be exercised without real
    media files."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
    )


def decode_image_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched decode/feature stage over binary payloads.

    The production shape: ``mapInPandas`` over (media_id, payload) with
    column pruning keeping only those two columns at the scan. The fake
    kernel computes deterministic byte statistics and a synthetic
    width/height from the payload length, standing in for a PIL decode.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "real image decode requires PIL/ffmpeg, not available "
                    "in this environment — wire the codec call here"
                )
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            byte_sum = payloads.map(lambda b: sum(b) if len(b) else 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "byte_sum": byte_sum.astype("int64"),
                    # fake decode: pretend square-ish frames from byte length
                    "width": (n_bytes % 512).astype("int32"),
                    "height": (n_bytes // 512 + 1).astype("int32"),
                }
            )

    pruned = media.select("media_id", "payload")
    return pruned.mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Video-style frame sampling plumbing: explode one row per sampled
    offset (a real decoder would emit one decoded frame per offset).

    JVM-side explode of an offset sequence — the expensive decode is left
    to a downstream Arrow stage, so sampling itself never leaves the JVM.
    """
    n = F.length("payload")
    offsets = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes))
    return media.select(
        "media_id",
        F.explode(offsets).alias("frame_offset"),
        (n - F.col("frame_offset")).alias("remaining_bytes"),
    )
