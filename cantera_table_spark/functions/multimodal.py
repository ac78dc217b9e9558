"""Multimodal column plumbing (north star, BASELINE.json).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas UDFs over ``mapInPandas``.  The decode step itself
is STUBBED (image/audio libraries are not in this container): the
deterministic fake below extracts real byte-level features so the
Spark-side plumbing — schema, batch shape, partitioning — is exercised
and oracle-checkable; ``decode_image_real`` marks where a codec plugs
in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("data", T.BinaryType(), True),        # opaque payload
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

DECODED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("header_hex", T.StringType(), True),
    T.StructField("byte_checksum", T.LongType(), False),
])


def decode_image_real(data: bytes):  # pragma: no cover - container stub
    """Plug a real codec (PIL / libvips / ffmpeg) in here."""
    raise NotImplementedError(
        "image/audio codecs are not available in this container; "
        "decode_media uses the deterministic byte-level fake instead")


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic media table from the documents fixture: the
    text bytes stand in for an opaque payload (deterministic)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("data"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("meta"))


def decode_media(media: DataFrame) -> DataFrame:
    """'Decode' each payload with an Arrow-batched Pandas UDF: byte
    length, first-4-bytes hex header, and a per-payload checksum
    (sum of byte values mod 2^31).  Shape and batching are exactly what
    a real decoder would use; only the math inside is the fake."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in it:
            # data is nullable in MEDIA_SCHEMA — decode NULL payloads to
            # empty-payload rows instead of crashing the task
            data = pdf["data"].map(lambda b: b if b is not None else b"")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": data.map(len).astype("int32"),
                "header_hex": data.map(lambda b: bytes(b[:4]).hex()),
                "byte_checksum": data.map(
                    lambda b: int(np.frombuffer(b, dtype=np.uint8)
                                  .sum(dtype=np.int64)) % 2_147_483_648
                ).astype("int64"),
            })

    return media.mapInPandas(batches, DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: emit one row per sampled window of the
    payload (media_id, frame_idx, frame_hex) — the row-explosion shape
    of real video frame extraction, with deterministic fake contents."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                b = bytes(data) if data is not None else b""
                for i in range(0, len(b), every_n_bytes):
                    ids.append(mid)
                    idxs.append(i // every_n_bytes)
                    frames.append(b[i:i + 4].hex())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "frame_hex": frames})

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_hex", T.StringType(), True),
    ])
    return media.mapInPandas(batches, schema)
