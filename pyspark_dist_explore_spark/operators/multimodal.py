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
