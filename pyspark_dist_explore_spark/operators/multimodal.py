"""Multimodal column plumbing (SURVEY.md §2.2 X6).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing — schema, Arrow batch shape, ``mapInPandas``
UDF signatures, partition sizing — is real and tested; the actual
decode step is STUBBED (``decode=None`` → deterministic metadata-only
features) because no image/audio libraries ship in this container.
Plug a real decoder in via the ``decode`` callable; the distributed
plan is unchanged.

100 TB notes: binary payloads never cross a shuffle here — features are
extracted map-side (``mapInPandas``) and only the small feature frame
aggregates.  ``spark.sql.files.maxPartitionBytes`` governs batch size;
Arrow moves the bytes to Python in columnar batches, never per-row.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: schema of the extracted feature frame
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("modality", StringType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Materialize an opaque binary column (+ typed metadata) from text.

    The testdata has no real media files, so the payload is the UTF-8
    encoding of the text column — the plumbing (binary type, metadata
    struct, partition behavior) is identical to a real media table.
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload").cast(BinaryType()),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.col(text_col)).cast("bigint").alias("size"),
        ).alias("meta"),
    )


def extract_features(
    binary_df: DataFrame,
    *,
    decode: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decode`` receives raw bytes and returns a feature dict; the default
    (None) computes deterministic metadata features only.  A real decoder
    (image resize, audio resample, frame sampling) raises
    ``NotImplementedError`` here by design — container has no codecs.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if decode is not None:
                raise NotImplementedError(
                    "real media decoding is stubbed in this environment; "
                    "plug in a decoder where codecs are installed"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_hash": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                    "modality": "text",
                }
            )

    return binary_df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


#: (doc_id, width, height, pixels_hash) — what a real image-resize emits
RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("pixels_hash", StringType()),
    ]
)

#: (doc_id, frame_idx, frame_hash) — what a real frame-sampler emits
FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_hash", StringType()),
    ]
)


def resize_images(
    binary_df: DataFrame,
    *,
    width: int = 224,
    height: int = 224,
    decoder: Callable[[bytes], object] | None = None,
) -> DataFrame:
    """Image resize plumbing (STUBBED decode — no codecs in container).

    With ``decoder=None`` a deterministic fake runs: the "pixels" are the
    md5 of (payload, width, height) — schema, Arrow batch shape, and
    partition behavior are identical to a real PIL/cv2 decoder, which
    plugs in via ``decoder`` and raises here by design.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is not None:
                raise NotImplementedError(
                    "image decoding requires codec libraries not present here"
                )
            fake = pdf["payload"].map(
                lambda b: hashlib.md5(bytes(b) + f"|{width}x{height}".encode()).hexdigest()
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "pixels_hash": fake,
                }
            )

    return binary_df.mapInPandas(_resize, schema=RESIZE_SCHEMA)


def sample_frames(
    binary_df: DataFrame,
    *,
    every_n: int = 10,
    max_frames: int = 3,
    decoder: Callable[[bytes], object] | None = None,
) -> DataFrame:
    """Video frame-sampling plumbing (STUBBED decode).

    The deterministic fake emits ``max_frames`` rows per doc with hashes
    derived from (payload, frame index) — exercising the one-to-many
    mapInPandas shape (each input row fans out to several output rows)
    that a real ffmpeg-backed sampler produces.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is not None:
                raise NotImplementedError(
                    "video decoding requires codec libraries not present here"
                )
            out = {"doc_id": [], "frame_idx": [], "frame_hash": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(max_frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i * every_n)
                    out["frame_hash"].append(
                        hashlib.md5(bytes(payload) + f"|frame{i * every_n}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(_sample, schema=FRAMES_SCHEMA)
